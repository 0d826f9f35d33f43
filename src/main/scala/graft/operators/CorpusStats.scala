package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level lexical statistics for LLM-data curation (SURVEY.md §2.9):
  * vocabulary-growth (Heaps'-law) profiling and bigram-LM document scoring.
  * Both follow the q43/q72 scale discipline — per-(doc, term) counts are
  * the base relation, corpus totals DERIVE from it, log-probs are
  * quantized to exact integers so sums are aggregation-order-invariant.
  */
object CorpusStats {

  /** Vocabulary growth (Heaps' law): new distinct words per doc-id bucket
    * plus the cumulative vocabulary size — the diminishing-returns curve a
    * data-mixing team reads before buying more of a source.
    *
    * Scale shape: one word explode → `groupBy(word).min(doc_id)` (Zipf hot
    * keys like "the" are plain agg keys — partial aggregation collapses
    * them map-side) → per-bucket agg. The trailing cumulative window is
    * single-partition BUT runs on the bucket relation (corpus-size /
    * `bucketWidth` rows, bounded by construction), never on words or docs.
    * Bucket arithmetic is integer `div` — exact in both engines at any id
    * magnitude (double division would lose precision past 2^53).
    */
  def vocabGrowth(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bucketWidth: Long = 100L): DataFrame = {
    val words = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
    val cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    words
      .groupBy("w")
      .agg(min(col("doc_id")).as("first_doc"))
      .groupBy(expr(s"first_doc div $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n_new_words"))
      .withColumn("vocab_size", sum(col("n_new_words")).over(cum))
      .orderBy("bucket")
  }

  /** Corpus-bigram-LM document scoring: mean log P(w_i | w_{i-1}) per doc,
    * with the LM's bigram and context counts taken from the corpus itself —
    * the conditional-probability upgrade of the q72 unigram filter (a doc
    * of common words in impossible ORDER now scores low).
    *
    * Scale shape: bigrams hash to 48-bit keys at the explode (8-byte
    * shuffle rows, q71 discipline; the context word hashes separately
    * BEFORE the bigram string is discarded). Bigram TOKEN rows are the
    * base relation — no per-(doc, bigram) pre-aggregation layer: on real
    * text that key is nearly unique (measured ×1.04 compression at sf0.1),
    * so the layer costs a full extra shuffle+agg and collapses nothing.
    * The counting branch `groupBy(sk, wk)` shuffles PARTIALLY-AGGREGATED
    * rows (Zipf-hot bigrams collapse map-side); the scoring branch
    * shuffles raw 16-byte token rows into the ⋈log-prob join, deliberately
    * left to ENSURE_REQUIREMENTS so AQE can skew-split the hot-bigram key
    * (a pre-`repartition` would pin the hot key to one partition AND lose
    * the map-side collapse — the q60 lesson). Per-bigram log-probs are
    * quantized to exact 1e-6 integers (q61/q72 pattern) so per-doc sums
    * are partition-order-invariant and hash-match DuckDB (`ln` ≡ Spark
    * `log`, bit-for-bit on identical doubles). Docs with fewer than two
    * words have no bigram and are absent, mirrored by the oracle.
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the skinny (doc, bigram, context) hash relation feeds BOTH the count
    // side and the score-back join; un-checkpointed, each consumer re-scans
    // and re-explodes the corpus (the q136/q216 lesson) — materialize once
    val bg = Dedup
      .shingleRows(
        docs.filter(size(split(col(textCol), " ", -1)) >= 2),
        idCol, textCol, 2)
      .select(
        col("doc_id"),
        Dedup.md5Long(col("s"), 12).as("sk"),
        Dedup.md5Long(substring_index(col("s"), " ", 1), 12).as("wk"))
      .localCheckpoint(false)
    val bc = bg.groupBy("sk", "wk").agg(count(lit(1)).as("cb"))
    val ctx = bc.groupBy("wk").agg(sum(col("cb")).as("cw"))
    val lp = bc
      .join(ctx, "wk")
      .withColumn(
        "lp",
        round(log(col("cb").cast("double") / col("cw").cast("double")) * 1000000, 0).cast("long"))
      .select(col("sk"), col("wk"), col("lp"))
    bg
      .join(lp, Seq("sk", "wk"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("_slp"))
      .select(
        col("doc_id"),
        col("n_bigrams"),
        round(col("_slp").cast("double") / col("n_bigrams") / 1000000.0, 6).as("mean_logprob"))
      .orderBy("doc_id")
  }

  /** Distinctive terms per group (source) by log-odds ratio with add-one
    * smoothing and the Monroe et al. (2008, "Fightin' Words") variance —
    * z = δ / √σ², δ = ln-odds(term in group) − ln-odds(term in rest).
    * The "what does this source talk about that others don't" readout a
    * mixing team reads per ingest source; raw counts would surface "the",
    * tf-idf (q43) is per-DOC — this contrasts a group against the rest of
    * the corpus with a significance weight.
    *
    * Determinism: every ln argument is a ratio of exact integers (IEEE
    * division, bit-identical cross-engine) and each ln is quantized to a
    * 1e-6 integer BEFORE the subtraction (q72 discipline — ln is the only
    * libm call, Spark `log` ≡ DuckDB `ln` on identical doubles); the
    * variance term is reciprocal sums of integers (pure IEEE ops). Scale
    * shape: one word explode → hash-agg keyed (group, word); group and
    * corpus totals DERIVE from that relation (one exchange, reused); the
    * top-k filter is a rank over per-group word rows — Spark inserts a
    * map-side WindowGroupLimit, so only ~k·partitions rows reach the
    * window sort (the q73 plan shape).
    */
  def logOddsTerms(
      docs: DataFrame,
      textCol: String,
      groupCol: String,
      topK: Int = 5): DataFrame = {
    val wc = docs
      .select(col(groupCol).as("grp"), explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("grp", "w")
      .agg(count(lit(1)).as("y"))
    // corpus-wide totals derive from wc: per-word, per-group, vocabulary
    val wTot = wc.groupBy("w").agg(sum(col("y")).as("yw"))
    val gTot = wc.groupBy("grp").agg(sum(col("y")).as("ng"))
    val nAll = wc.agg(
      sum(col("y")).as("nn"),
      countDistinct(col("w")).as("vv"))
    val qln: Column => Column = x => round(log(x) * 1000000, 0).cast("long")
    val scored = wc
      .join(wTot, "w")
      .join(broadcast(gTot), "grp")
      .crossJoin(broadcast(nAll))
      .withColumn("yRest", col("yw") - col("y"))
      .withColumn("nRest", col("nn") - col("ng"))
      // add-one prior: +1 per word, +V on the group total
      .withColumn(
        "deltaQ",
        qln((col("y") + 1).cast("double") / (col("ng") + col("vv") - col("y") - 1).cast("double"))
          - qln((col("yRest") + 1).cast("double") / (col("nRest") + col("vv") - col("yRest") - 1).cast("double")))
      .withColumn(
        "sigma2",
        lit(1.0) / (col("y") + 1).cast("double") + lit(1.0) / (col("yRest") + 1).cast("double"))
      .withColumn("z", round(col("deltaQ").cast("double") / 1000000.0 / sqrt(col("sigma2")), 6))
    val w = Window.partitionBy("grp").orderBy(col("z").desc, col("w"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("grp").as(groupCol), col("rk"), col("w").as("term"), col("y").as("n_occurrences"), col("z"))
      .orderBy(groupCol, "rk")
  }

  /** Per-group Shannon entropy of the word distribution (nats) — the
    * diversity readout that separates a templated/boilerplate source
    * (entropy ≪ ln vocab) from genuine text BEFORE near-dup pays for
    * pairwise comparisons. H = ln n − (Σ_w y_w ln y_w)/n over term
    * frequencies y_w.
    *
    * Determinism: each y·ln(y) term is quantized to a 1e-6 integer and
    * summed exactly (q72 discipline — partition-order-invariant, `ln`
    * bit-matches across engines on identical doubles); the closing
    * ln(n) − Σ/1e6/n is a fixed IEEE op sequence, rounded to 6. Scale
    * shape: one word explode → hash-agg keyed (group, word) with
    * map-side collapse of Zipf-hot terms → per-group roll-up; no windows,
    * no joins.
    */
  def wordEntropy(docs: DataFrame, textCol: String, groupCol: String): DataFrame =
    docs
      .select(col(groupCol).as("grp"), explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("grp", "w")
      .agg(count(lit(1)).as("y"))
      .withColumn("t", round(col("y").cast("double") * log(col("y").cast("double")) * 1000000, 0).cast("long"))
      .groupBy("grp")
      .agg(
        sum(col("y")).as("n_tokens"),
        count(lit(1)).as("n_vocab"),
        sum(col("t")).as("_st"))
      .select(
        col("grp").as(groupCol),
        col("n_tokens"),
        col("n_vocab"),
        round(
          log(col("n_tokens").cast("double"))
            - col("_st").cast("double") / 1000000.0 / col("n_tokens").cast("double"),
          6).as("entropy_nats"))
      .orderBy(groupCol)

  /** Jensen–Shannon divergence of each group's unigram distribution from
    * the REST of the corpus — the "how different is this source, really"
    * number behind mixture decisions (entropy q90 says how diverse a
    * source is; this says how redundant it is given everything else).
    * Computed in the KL form JSD = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m) with
    * m = (p+q)/2, p the group's word distribution, q the rest-of-corpus
    * distribution (derived, not re-counted). Symmetric, bounded by ln 2.
    *
    * Determinism: p, q, m are IEEE doubles computed from exact integer
    * counts in a fixed expression order, each per-word term is quantized
    * to a 1e-9 integer before summation (q72 ln discipline, finer grain
    * because terms are probability-weighted), so group sums are
    * aggregation-order-invariant and DuckDB-replayable.
    *
    * Scale shape: one word explode → (group, word) hash agg; corpus
    * per-word totals DERIVE from that relation (exchange reused); the
    * vocab × groups grid is a broadcast cross of the bounded group-totals
    * row set against the per-word relation, then a co-partitioned left
    * join back — vocab·|groups| rows, distributed, never collected. The
    * grid is what makes words ABSENT from a group still contribute their
    * q-side term (a one-sided join would silently drop them and
    * underestimate the divergence).
    */
  def jsDivergence(docs: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val sw = docs
      .select(col(groupCol).as("grp"), explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("grp", "w")
      .agg(count(lit(1)).as("c"))
    val cw = sw.groupBy("w").agg(sum(col("c")).as("cw"))
    val everything = Window.partitionBy()
    val gt = sw.groupBy("grp").agg(sum(col("c")).as("np"))
      .withColumn("nn", sum(col("np")).over(everything))
    val grid = cw
      .crossJoin(broadcast(gt))
      .join(sw, Seq("grp", "w"), "left")
      .withColumn("cq", coalesce(col("c"), lit(0L)))
    val p = col("cq").cast("double") / col("np").cast("double")
    // single-group corpus: rest is empty → q ≡ 0 (guards the 0/0 in m)
    val q = when(col("nn") > col("np"),
      (col("cw") - col("cq")).cast("double") / (col("nn") - col("np")).cast("double"))
      .otherwise(lit(0.0))
    val m = lit(0.5) * (p + q)
    val tp = when(col("cq") > 0, round(p * log(p / m) * 1000000000L, 0).cast("long")).otherwise(0L)
    val tq = when(col("cw") > col("cq"), round(q * log(q / m) * 1000000000L, 0).cast("long")).otherwise(0L)
    grid
      .select(col("grp"), col("np"), tp.as("_tp"), tq.as("_tq"))
      .groupBy("grp")
      .agg(max(col("np")).as("n_tokens"), sum(col("_tp")).as("_sp"), sum(col("_tq")).as("_sq"))
      .select(
        col("grp").as(groupCol),
        col("n_tokens"),
        round((col("_sp") + col("_sq")).cast("double") * 0.5 / 1000000000.0, 6).as("jsd_nats"))
      .orderBy(groupCol)
  }

  /** Zipf exponent per group: the least-squares slope of ln(frequency)
    * against ln(rank) over the `topK` most frequent words — natural text
    * sits near −1; templated, machine-generated, or heavily boilerplated
    * sources flatten or steepen the curve, making this a one-number
    * naturalness check per ingest source.
    *
    * Exactness: ln(rank) and ln(freq) quantize to 1e-6 integers (the only
    * libm calls), then the regression runs entirely in decimal38 integer
    * algebra (q54 discipline — n·Σxy − Σx·Σy over n·Σxx − Σx², exact and
    * aggregation-order-invariant), one final double division rounded to 6.
    * Scale shape: the (group, word) count relation feeds a per-group rank
    * window whose `rk ≤ topK` filter plans as a map-side WindowGroupLimit
    * (q73 shape), so the full vocabulary never sorts through one
    * partition; the regression is a hash aggregation over group·topK rows.
    */
  def zipfSlope(
      docs: DataFrame,
      textCol: String,
      groupCol: String,
      topK: Int = 500): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val w = Window.partitionBy("grp").orderBy(col("y").desc, col("w"))
    val qln: Column => Column = c => round(log(c.cast("double")) * 1000000, 0).cast("long")
    docs
      .select(col(groupCol).as("grp"), explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("grp", "w")
      .agg(count(lit(1)).as("y"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("grp"), qln(col("rk")).as("x"), qln(col("y")).as("yl"))
      .groupBy("grp")
      .agg(
        count(lit(1)).cast(dec38).as("n"),
        sum(col("x").cast(dec38)).as("sx"),
        sum(col("yl").cast(dec38)).as("sy"),
        sum((col("x") * col("yl")).cast(dec38)).as("sxy"),
        sum((col("x") * col("x")).cast(dec38)).as("sxx"))
      .select(
        col("grp").as(groupCol),
        col("n").cast("long").as("n_terms"),
        round(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
          6).as("zipf_slope"))
      .orderBy(groupCol)
  }

  /** Source-pair content-overlap matrix: exact Jaccard similarity of the
    * word n-gram SETS of every pair of sources — the corpus-level
    * complement of q78's doc-level cross-source dup pairs ("how much of
    * source A's content space does source B share"), the number a mixing
    * team reads before deciding two crawls are redundant.
    *
    * Scale shape: grams hash to 48-bit keys at the explode (8-byte rows,
    * q71 discipline), then ONE shuffle keyed on the gram — `collect_set`
    * of sources is bounded by the source count, so the hottest Zipf gram
    * costs the same as any other key (no skew lever needed). Source pairs
    * are generated MAP-SIDE from each gram's sorted source set (the q45
    * PMI pattern — a gram-key self-join would re-exchange the full gram
    * relation twice for the same Σ-pairs output); set sizes derive from
    * the same aggregate (exchange reused). Output is (#sources choose 2)
    * rows — bounded.
    */
  def sourceNgramJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      srcCol: String,
      n: Int = 3): DataFrame = {
    // spread on the doc id, NOT the handful-valued source column (a
    // repartition keyed by 5 sources would collapse the corpus onto 5
    // partitions before the most expensive stage)
    val spread = Dedup.spreadByKey(
      docs.select(col(idCol).as("_id"), col(srcCol).as("src"), col(textCol).as("_t")),
      col("_id"))
    val perGram = spread
      .select(col("src"), explode(graft.plans.WordShingles(col("_t"), n)).as("s"))
      .select(col("src"), Dedup.md5Long(col("s"), 12).as("g"))
      .groupBy("g")
      .agg(sort_array(collect_set(col("src"))).as("srcs"))
    val sizes = perGram
      .select(explode(col("srcs")).as("src"))
      .groupBy("src")
      .agg(count(lit(1)).as("sz"))
    // ordered pairs of each gram's (sorted, bounded) source set, built in
    // the projection — the array lambdas run per gram row over ≤|sources|
    // elements, and single-source grams contribute nothing
    val combos = flatten(transform(
      col("srcs"),
      (x, i) => transform(
        slice(col("srcs"), i + 2, size(col("srcs"))),
        y => struct(x.as("source_x"), y.as("source_y")))))
    val inter = perGram
      .filter(size(col("srcs")) > 1)
      .select(explode(combos).as("p"))
      .groupBy(col("p.source_x").as("source_x"), col("p.source_y").as("source_y"))
      .agg(count(lit(1)).as("n_shared_grams"))
    inter
      .join(broadcast(sizes.select(col("src").as("source_x"), col("sz").as("szx"))), "source_x")
      .join(broadcast(sizes.select(col("src").as("source_y"), col("sz").as("szy"))), "source_y")
      .select(
        col("source_x"),
        col("source_y"),
        col("n_shared_grams"),
        round(col("n_shared_grams").cast("double") /
          (col("szx") + col("szy") - col("n_shared_grams")), 6).as("jaccard"))
      .orderBy("source_x", "source_y")
  }

  /** Heavy-hitter word bigrams — every bigram occurring in more than a
    * 1/`phiDenom` fraction of the corpus's bigram stream (the standard
    * φ-heavy-hitter definition; these are the boilerplate phrases a
    * curation pipeline strips or caps). The result is EXACT — the
    * count-min sketch below is a prefilter only, never the answer.
    *
    * Two-pass count-min-sketch shape (Cormode & Muthukrishnan, J.Alg '05),
    * the reason this survives 100 TB where a plain
    * `groupBy(gram).count()` does not: a web-scale corpus has ~10¹⁰
    * distinct n-grams, so the plain plan shuffles the full vocabulary to
    * count a handful of heavy keys.
    *
    *  - Pass 1 sketches the stream into `depth × width` counters — the
    *    groupBy key space is CAPPED at depth·width regardless of corpus
    *    size, so map-side partial aggregation collapses each task's
    *    contribution to ≤ depth·width rows and the shuffle is a few MB
    *    from any input. The driver collect is the sketch itself
    *    (depth·width longs — bounded by construction, not by data).
    *  - Pass 2 re-scans, looks each occurrence up in the broadcast
    *    counters (a literal array in codegen — `least` of `depth`
    *    `element_at`s, no join), and ONLY survivors of `est ≥ T` reach
    *    the exact groupBy. CMS never undercounts, so the candidate set is
    *    a superset of the true heavy hitters and the final exact
    *    `count ≥ T` filter makes the output exact; width controls the
    *    false-candidate rate (E[overcount] ≤ stream/width per row), not
    *    correctness.
    *
    * The threshold T = ⌈N/phiDenom⌉ is integer arithmetic
    * (`(N + phiDenom − 1) / phiDenom`) — no double 1/1000 whose rounding
    * could disagree across engines. Cell hashes are md5-prefix
    * ([[graft.operators.Dedup.md5Long]]) — portable, seed-stable.
    * Bigrams via [[graft.plans.WordShingles]] (texts under 2 words count
    * as one whole-text gram, q23 convention).
    */
  /** The word-bigram occurrence stream (q23 shingle convention). */
  private def gramRows(docs: DataFrame, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(explode(graft.plans.WordShingles(col(textCol), 2)).as("g"))

  /** Cell hash `i` of a gram: disjoint 32-bit chunks of ONE md5 digest
    * (subexpression elimination computes the digest once per row however
    * many cells are derived).
    */
  private[graft] def cellOf(g: Column, i: Int, width: Int): Column =
    pmod(conv(substring(md5(g), i * 8 + 1, 8), 16, 10).cast("long"), lit(width.toLong))
      .cast("int")

  /** (d, cell) occurrence rows of the bigram stream — the sketch substrate
    * shared by [[heavyHitters]]' batch pass 1 and its streaming twin
    * ([[graft.streaming.SketchStream]]). Pure map (shingle explode → md5
    * chunks), no shuffle; works unchanged on a streaming DataFrame.
    */
  def sketchCellRows(docs: DataFrame, textCol: String, depth: Int, width: Int): DataFrame = {
    require(width <= (1 << 30), "width must fit a 32-bit hash chunk")
    require(depth >= 1 && depth <= 4, "one md5 digest yields at most four 32-bit cell hashes")
    gramRows(docs, textCol)
      .select(posexplode(array((0 until depth).map(i => cellOf(col("g"), i, width)): _*))
        .as(Seq("d", "cell")))
  }

  /** BPE merge training (Sennrich et al. 2016, "Neural Machine Translation
    * of Rare Words with Subword Units"): learn `numMerges` byte-pair
    * merges from the corpus — the tokenizer-TRAINING side of the q18/q29
    * tokenizer-APPLY operators. Classic formulation: train on the
    * weighted VOCABULARY (distinct word, count), not the token stream —
    * the corpus collapses to |vocab| rows in one aggregation and every
    * merge iteration then runs on that small relation (10⁷ rows at web
    * scale, not 10¹²; this is why real BPE trainers are feasible at all).
    *
    * Per iteration: explode adjacent symbol pairs weighted by word count
    * (one hash agg), take the argmax pair — count desc, then lexicographic
    * pair order, a total order so both engines pick the SAME pair — and
    * apply the merge with plain left-to-right non-overlapping `replace`
    * (Java and DuckDB agree on those semantics, including the
    * consumed-space edge on runs like "a a a"). The chosen pair is the
    * bounded driver-side state (one row per step — the kmeansFit
    * discipline); the evolving vocab stays distributed as narrow
    * projections over ONE checkpointed aggregation (merge application
    * cannot collide two vocab rows, so iterations need no shuffle and no
    * re-materialization).
    *
    * Returns the merge table (step, pair, merged, weighted count) — the
    * artifact a tokenizer ships.
    */
  def bpeTrain(
      docs: DataFrame,
      textCol: String,
      numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    val merges = bpeLoop(docs, textCol, numMerges)._1
    import spark.implicits._
    merges.toDF("step", "pair", "merged", "weighted_count")
      .select(col("step").cast("long").as("step"), col("pair"), col("merged"),
        col("weighted_count"))
      .orderBy("step")
  }

  /** The shared training loop: returns the merge list AND the final
    * per-word segmentation (w, sym, cnt) — the vocab the APPLY side
    * ([[bpeSegmentation]]) joins against.
    */
  private def bpeLoop(
      docs: DataFrame,
      textCol: String,
      numMerges: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    // One corpus aggregation, checkpointed: every merge iteration reads
    // THIS, never the corpus again. The iterations themselves add only
    // narrow maps on top (see below), so no further checkpoints needed —
    // 8 merges cost 8 argmax jobs over the vocab relation, not 8
    // materializations.
    var vocab = docs
      .select(explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("w"),
        trim(regexp_replace(col("w"), "(.)", "$1 ")).as("sym"),
        col("cnt"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val best = vocab
        .select(col("cnt"), split(col("sym"), " ", -1).as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(slice(ss, 1, size(ss) - 1), (x, i) -> concat(x, ' ', ss[i + 1]))")).as("pair"))
        .groupBy("pair")
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("pair"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val c = best(0).getLong(1)
        val merged = pair.replace(" ", "")
        merges += ((step, pair, merged, c))
        // merge application is a NARROW map: distinct words keep distinct
        // symbol strings under any merge (the de-spaced string is the
        // word itself, and different words stay different), so no
        // re-aggregation and no shuffle — the iteration lineage is 8
        // stacked projections over the one checkpointed vocab.
        vocab = vocab
          .select(
            col("w"),
            trim(org.apache.spark.sql.functions.replace(
              concat(lit(" "), col("sym"), lit(" ")),
              lit(s" $pair "), lit(s" $merged "))).as("sym"),
            col("cnt"))
        step += 1
      }
    }
    (merges.result(), vocab)
  }

  /** Apply the learned merges back to the corpus: per `groupCol`, how
    * many BPE symbols the tokenizer emits and the chars-per-symbol
    * compression — the "did training the tokenizer on THIS corpus pay
    * off" readout, closing the train ([[bpeTrain]]) → apply loop. One
    * word-explode joined to the final |vocab|-row segmentation (AQE
    * broadcasts it while it is small; at web scale it is an equi-join on
    * the word, exactly how fast tokenizers batch-apply a merge table).
    */
  def bpeSegmentation(
      docs: DataFrame,
      textCol: String,
      groupCol: String,
      numMerges: Int): DataFrame = {
    val vocab = bpeLoop(docs, textCol, numMerges)._2
      .select(col("w"), size(split(col("sym"), " ", -1)).cast("long").as("nsym"))
    docs
      .filter(col(textCol).isNotNull)
      .select(col(groupCol), explode(split(col(textCol), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .join(vocab, "w")
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("nsym")).as("n_symbols"),
        sum(length(col("w")).cast("long")).as("n_chars_total"))
      .withColumn(
        "chars_per_symbol",
        round(col("n_chars_total").cast("double") / col("n_symbols"), 6))
      .orderBy(groupCol)
  }

  def heavyHitters(
      docs: DataFrame,
      textCol: String,
      phiDenom: Long = 1000L,
      depth: Int = 2,
      width: Int = 16384): DataFrame = {
    val grams = gramRows(docs, textCol)
    def cell(i: Int): Column = cellOf(col("g"), i, width)
    val sketchRows = sketchCellRows(docs, textCol, depth, width)
      .groupBy("d", "cell")
      .agg(count(lit(1)).as("cnt"))
      .collect()
    val counters = Array.fill(depth * width)(0L)
    sketchRows.foreach(r => counters(r.getInt(0) * width + r.getInt(1)) = r.getLong(2))
    val total = (0 until width).map(counters(_)).sum // depth-0 row sums the whole stream
    val threshold = (total + phiDenom - 1L) / phiDenom
    val countersLit = lit(counters)
    val est = (0 until depth)
      .map(i => element_at(countersLit, cell(i) + lit(i * width + 1)))
      .reduce(least(_, _))
    grams
      .filter(est >= threshold)
      .groupBy(col("g").as("gram"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .select(
        col("gram"),
        col("n"),
        round(col("n").cast("double") / total, 6).as("share"))
      .orderBy("gram")
  }
}
