package graft
package queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{EsmTokenizer, TextFunctions}
import graft.operators.{AsOfJoin, Cooccurrence, CorpusStats, Curation, Dedup, EventWindows, GraphMetrics, Indexing, Multimodal, NaiveBayes, RangeJoin, Similarity, SnapshotDiff}
import graft.plans.JaroWinkler
import graft.ops.{ClassWeights, LabelEncode, Stats, StratifiedSplit}
import Shared._

/** Query-registry shard (insertion-order slice) — moved verbatim out of
  * the former SparkEntry monolith (round-7 split; the driver contract
  * `SparkEntry.queries` is unchanged, shards concatenate in order).
  */
private[graft] object Shard02 {
  val defs: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

    // contamination detection: eval-set docs (source src0) sharing an LSH
    // band with ANY training doc — the benchmark-decontamination check an
    // LLM-data pipeline runs before training. Scale shape: signature the
    // (small) eval set, equi-join it against the training signature store
    // (see Dedup.incrementalCandidates) — never signatures×corpus re-scans.
    "q65_contamination" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.contamination(
        d.filter(col("source") === "src0").select(col("doc_id"), col("text")),
        d.filter(col("source") =!= "src0").select(col("doc_id"), col("text")),
        "doc_id", "text")
    }),

    // temperature-flattened language resampling (multilingual corpus
    // balancing, α = 0.5): keep doc with p_lang = sqrt(n_min / n_lang),
    // decided by the EXACT integer comparison u²·n_lang < n_min·2^96 over
    // the 48-bit md5 uniform u — no doubles, no pow(), engine-independent,
    // and scale-invariant (doubling the corpus doubles both sides' counts).
    // Rates are a tiny per-lang aggregate → broadcast; the corpus is
    // touched once (scan → broadcast join → final per-lang agg).
    "q68_temperature_sample" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val rates = d.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      val nMin = rates.agg(min(col("n_docs")).as("n_min"))
      val u = Dedup.md5Long(concat(lit("samp#"), col("doc_id").cast("string")), 12).cast(dec38)
      d.select(col("doc_id"), col("lang"))
        .join(broadcast(rates), "lang")
        .crossJoin(broadcast(nMin))
        .withColumn(
          "keep",
          u * u * col("n_docs").cast(dec38) <
            col("n_min").cast(dec38) * lit("79228162514264337593543950336").cast(dec38))
        .groupBy("lang")
        .agg(
          min(col("n_docs")).as("n_docs"), // constant within the group
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy("lang")
    }),

    // ordered view→click→purchase funnel; see EventWindows.funnel scale note
    "q69_event_funnel" -> ((s, dir) =>
      EventWindows.funnel(Tables.events(s, dir), Seq("view", "click", "purchase"))),

    // dup CLUSTERS from near-dup pairs: alternating large-star/small-star
    // connected components (O(log) rounds, no adjacency-list collect) —
    // pair-wise dropping over-deletes transitive chains; curation keeps
    // one doc per cluster. Oracle: DuckDB recursive CTE reachability.
    "q66_dup_clusters" -> ((s, dir) =>
      graft.operators.ConnectedComponents.clusters(
        Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
          .select("doc_a", "doc_b"),
        "doc_a", "doc_b")),

    // cross-doc n-gram repetition (Lee et al., "Deduplicating Training Data
    // Makes Language Models Better"): fraction of a doc's distinct 3-grams
    // that also appear in ANOTHER doc — the repeated-substring signal,
    // complementing q55 (within-doc) and q60 (line-level). Same skew-safe
    // shape as q60: shingle → distinct → groupBy + equi-join back (a hot
    // boilerplate shingle is an AQE-splittable JOIN key, not a window key).
    "q71_crossdoc_ngrams" -> ((s, dir) => {
      // shingles become 48-bit md5 hashes AT THE EXPLODE, so every
      // downstream exchange (distinct, count, join) shuffles 8-byte keys
      // instead of ~25-byte shingle strings; the oracle replays the same
      // hash, so a (vanishingly rare, 2^-48) collision stays consistent
      val sh = Dedup.shingleRows(Tables.documents(s, dir), "doc_id", "text", 3)
        .select(col("doc_id"), Dedup.md5Long(col("s"), 12).as("sk"))
        .distinct()
      val nd = sh.groupBy("sk").agg(count(lit(1)).as("nd"))
      sh.join(nd, "sk")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_grams_uniq"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
        .select(
          col("doc_id"),
          col("n_grams_uniq"),
          col("n_shared"),
          round(col("n_shared").cast("double") / col("n_grams_uniq"), 6).as("shared_ratio"))
        .orderBy("doc_id")
    }),

    // corpus-unigram-LM document scoring — the perplexity-filter shape
    // (CCNet/Gopher quality signal) with the LM trained on the corpus
    // itself. Scale shape mirrors q43: per-(doc, word) counts are the base
    // relation, word totals DERIVE from it (one corpus explode, exchange
    // reused), the grand total is a 1-row broadcast, and the vocab join is
    // a plain equi-join whose Zipf hot keys ("the") AQE can split. Per-word
    // log-probs are quantized to exact 1e-6 integers (q61 pattern) so the
    // per-doc sum is aggregation-order-invariant and hash-matches.
    "q72_unigram_logprob" -> ((s, dir) => {
      val words = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
      val dw = words.groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
      val wc = dw.groupBy("w").agg(sum(col("n")).as("cnt"))
      val tot = wc.agg(sum(col("cnt")).as("total"))
      dw.join(wc, "w")
        .crossJoin(broadcast(tot))
        .withColumn("lp",
          round(log(col("cnt").cast("double") / col("total")) * 1000000, 0).cast("long"))
        .groupBy("doc_id")
        .agg(sum(col("n")).as("n_words"), sum(col("n") * col("lp")).as("_slp"))
        .select(
          col("doc_id"),
          col("n_words"),
          round(col("_slp").cast("double") / col("n_words") / 1000000.0, 6).as("mean_logprob"))
        .orderBy("doc_id")
    }),

    // per-group deterministic fixed-size sample (the "K docs per language"
    // curation cap): md5-uniform order + row_number ≤ K. Scale: Spark
    // rewrites the rank filter to WindowGroupLimit — each map task keeps
    // only its local top-K per group BEFORE the shuffle, so a 10^8-doc
    // language shuffles K rows per task, not 10^8 (plan-asserted in
    // PlanGuardSpec).
    "q73_group_sample" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy(col("_u"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"))
        .withColumn("_u", Dedup.md5Long(concat(lit("gs#"), col("doc_id").cast("string")), 12))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 20)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy("lang", "rk")
    }),

    // exact-then-near composition (the production default — see the Dedup
    // class doc): collapse exact duplicates to their min-id keeper, then
    // MinHash/LSH over DISTINCT texts only — the order that keeps band
    // buckets bounded by distinct content on a dup-heavy corpus
    "q70_neardup_uniques" -> ((s, dir) =>
      Dedup.nearDupOnUniques(Tables.documents(s, dir), "doc_id", "text")),

    // exact n-gram decontamination (GPT-3-style benchmark overlap): train
    // docs sharing an exact word 5-gram with any eval (src0) doc — the
    // zero-false-negative complement of q65's LSH contamination pass
    "q74_exact_decontam" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.exactNgramContamination(
        d.filter(col("source") === "src0").select(col("doc_id"), col("text")),
        d.filter(col("source") =!= "src0").select(col("doc_id"), col("text")),
        "doc_id", "text", 5)
    }),

    // MinHash Jaccard ESTIMATE per candidate pair — signature-position
    // agreement, computed inside the banding self-join itself (one
    // signature pass; see Dedup.jaccardEstimates scale note)
    "q75_jaccard_estimate" -> ((s, dir) =>
      Dedup.jaccardEstimates(Tables.documents(s, dir), "doc_id", "text")),

    // vocabulary growth (Heaps' law): new words + cumulative vocab per
    // doc-id bucket — the source-saturation curve; cumulative window runs
    // on the bounded bucket relation only
    "q76_vocab_growth" -> ((s, dir) =>
      CorpusStats.vocabGrowth(Tables.documents(s, dir), "doc_id", "text")),

    // corpus-bigram-LM scoring: mean log P(w_i | w_{i-1}) per doc — the
    // conditional-probability upgrade of q72's unigram filter
    "q77_bigram_logprob" -> ((s, dir) =>
      CorpusStats.bigramLogProb(Tables.documents(s, dir), "doc_id", "text")),

    // cross-source duplication matrix: near-dup candidate pairs rolled up
    // by unordered source pair — which feeds duplicate which (the overlap
    // diagnostic a data-mixing team reads before weighting sources)
    "q78_crosssource_dups" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val src = d.select(col("doc_id"), col("source"))
      Dedup.minhashCandidates(d, "doc_id", "text")
        .select("doc_a", "doc_b")
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
        .select(least(col("sa"), col("sb")).as("source_x"), greatest(col("sa"), col("sb")).as("source_y"))
        .groupBy("source_x", "source_y")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_x", "source_y")
    }),

    // dup-cluster size distribution: components per size + docs removable
    // at that size — the "what will dedup save" histogram; bounded output
    // (a mega-cluster is ONE row here)
    "q79_cluster_sizes" -> ((s, dir) =>
      graft.operators.ConnectedComponents.sizeDistribution(
        Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text"),
        "doc_a", "doc_b")),

    // semantic decontamination: train vectors within cosine 0.4 of any
    // eval (label 0) vector via random-hyperplane LSH bands — catches the
    // paraphrased benchmark leakage q74's exact n-grams can't see
    "q80_semantic_decontam" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.semanticContamination(
        e.filter(col("label") === 0).select(col("vec_id"), col("embedding")),
        e.filter(col("label") =!= 0).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", dim = 64)
    }),

    // quality-threshold survival curve: docs per quality decile + docs
    // surviving a cut at that decile — the filter-calibration readout;
    // the cumulative window runs on the ≤11-row decile relation only
    "q81_quality_survival" -> ((s, dir) => {
      val deciles = TextFunctions.withQualityColumns(Tables.documents(s, dir), "text")
        .select(least(floor(col("quality") * 10), lit(9L)).as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"))
      val fromAbove = Window
        .orderBy(col("decile").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deciles
        .withColumn("n_surviving", sum(col("n_docs")).over(fromAbove))
        .orderBy("decile")
    }),

    // S1/S3 beyond-reference format: round-trip documents through the
    // JSONL zone sink/scan (the LLM-corpus interchange staple) and
    // aggregate the read-back frame — JSON escaping of quotes/newlines/
    // unicode is what's being proven lossless; the oracle reads parquet
    "q82_jsonl_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tmp = graft.io.Zones.tempDir(s"graft_jsonl_zone_${new java.io.File(dir).getName}")
      graft.io.Zones.writeJsonl(docs, tmp)
      graft.io.Zones.readJsonl(s, docs.schema, Seq(tmp))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          sum(length(col("text"))).cast("long").as("sum_text_len"),
          countDistinct(col("doc_id")).as("n_ids"))
        .orderBy("source")
    }),

    // one k-means (Lloyd) iteration: IVF assignment + exact quantized
    // component means = refined centroids (the index-build step the q25
    // IVF search assumes; iterate by feeding the output back)
    "q83_kmeans_step" -> ((s, dir) =>
      Similarity.lloydStep(Tables.embeddings(s, dir), "vec_id", "embedding", nCentroids = 8)),

    // kNN majority-vote label prediction over embeddings — the
    // label-propagation primitive (annotate the pool from its nearest
    // labeled examples); ties → smaller label
    "q84_knn_classify" -> ((s, dir) =>
      Similarity.knnClassify(Tables.embeddings(s, dir), "vec_id", "embedding", "label",
        nQueries = 25, k = 10)),

    // robust per-lang length outliers: median/MAD flags (mean/stddev
    // would let outliers drag their own threshold)
    "q85_mad_outliers" -> ((s, dir) =>
      Stats.madOutliers(Tables.documents(s, dir), "lang", "n_chars")),

    // distinctive terms per source: add-one log-odds ratio with the
    // Fightin'-Words variance, top-5 by z — "what does this source talk
    // about that the rest don't"
    "q86_logodds_terms" -> ((s, dir) =>
      CorpusStats.logOddsTerms(Tables.documents(s, dir), "text", "source")),

    // source-pair content-overlap matrix: exact Jaccard of hashed 3-gram
    // sets — the corpus-level complement of q78's doc-level dup pairs
    "q87_source_jaccard" -> ((s, dir) =>
      CorpusStats.sourceNgramJaccard(Tables.documents(s, dir), "doc_id", "text", "source")),

    // weekly retention cohorts over events: users by first-event Monday ×
    // week offset — the triangular retention matrix
    "q88_retention_cohorts" -> ((s, dir) =>
      EventWindows.retentionCohorts(Tables.events(s, dir))),

    // deterministic WEIGHTED sampling (Efraimidis–Spirakis A-ES): key =
    // ln(u)/w with md5-uniform u and quality weight w; top-5 keys per
    // lang = a quality-biased sample reproducible across engines/runs
    // (the md5 twin of weighted reservoir sampling; key quantized to a
    // 1e-6 integer, q72 ln discipline). Map-side WindowGroupLimit keeps
    // the rank filter off the shuffle.
    "q89_weighted_sample" -> ((s, dir) =>
      ops.Sampling.weightedTopKPerGroup(
        TextFunctions.withQualityColumns(Tables.documents(s, dir), "text")
          .select(col("doc_id"), col("lang"), col("quality")),
        "doc_id", "quality", "lang", k = 5)
        .select(col("lang"), col("rk"), col("doc_id"), col("quality"), col("skey"))
        .orderBy("lang", "rk")),

    // per-source word-distribution Shannon entropy — the diversity
    // readout separating templated/boilerplate sources from genuine text
    "q90_source_entropy" -> ((s, dir) =>
      CorpusStats.wordEntropy(Tables.documents(s, dir), "text", "source")),

    // character-level exact decontamination: train docs sharing any
    // 32-char sliding window with the eval set (source src0) — catches
    // leakage that word 5-grams (q74) miss when only tokenization differs
    "q91_char_decontam" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.charShingleContamination(
        d.filter(col("source") === "src0").select(col("doc_id"), col("text")),
        d.filter(col("source") =!= "src0").select(col("doc_id"), col("text")),
        "doc_id", "text")
    }),

    // dedup × quality interplay: which quality deciles do the near-dup
    // LOSERS concentrate in — the readout that tells a curation team
    // whether dedup is eating boilerplate (low deciles) or real content
    "q92_dedup_quality" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val losers = Dedup.clusterLosers(
        Dedup.minhashCandidates(d, "doc_id", "text").select("doc_a", "doc_b"))
        .select(col("node").as("doc_id"), lit(1L).as("lost"))
      TextFunctions.withQualityColumns(d, "text")
        .select(col("doc_id"), least(floor(col("quality") * 10), lit(9L)).as("decile"))
        .join(losers, Seq("doc_id"), "left")
        .groupBy("decile")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(coalesce(col("lost"), lit(0L))).as("n_removed"))
        .select(
          col("decile"),
          col("n_docs"),
          col("n_removed"),
          round(col("n_removed").cast("double") / col("n_docs"), 6).as("removal_rate"))
        .orderBy("decile")
    }),

    // Zipf exponent per source: ln-freq vs ln-rank regression slope over
    // the top-500 words — natural text ≈ −1; templated sources deviate
    "q93_zipf_slope" -> ((s, dir) =>
      CorpusStats.zipfSlope(Tables.documents(s, dir), "text", "source")),

    // IVF index-balance profile: per-bucket population and share — the
    // "is my ANN index balanced or does one Voronoi cell eat the corpus"
    // readout before paying for a multi-probe search plan. The share
    // window runs on the ≤nCentroids-row bucket relation only.
    "q94_ivf_profile" -> ((s, dir) => {
      val counts = Similarity.assignBuckets(Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_vecs"))
      counts
        .withColumn("frac", round(col("n_vecs").cast("double") /
          sum(col("n_vecs")).over(Window.partitionBy()), 6))
        .orderBy("bucket")
    }),

    // Gopher-rule quality battery: per-source pass rates of the six
    // MassiveText-style filters — the threshold-calibration readout a
    // curation team inspects before committing a keep/drop rule; pure
    // per-row map (no shuffle before the bounded per-source agg)
    "q95_gopher_rules" -> ((s, dir) => {
      val flagged = TextFunctions.gopherFlags(
        Tables.documents(s, dir).filter(col("text").isNotNull), "text")
      val allPass = col("r_wordcount") && col("r_meanlen") && col("r_alpha") &&
        col("r_stopwords") && col("r_repetition") && col("r_distinct")
      flagged
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("r_wordcount").cast("long")).as("n_wordcount"),
          sum(col("r_meanlen").cast("long")).as("n_meanlen"),
          sum(col("r_alpha").cast("long")).as("n_alpha"),
          sum(col("r_stopwords").cast("long")).as("n_stopwords"),
          sum(col("r_repetition").cast("long")).as("n_repetition"),
          sum(col("r_distinct").cast("long")).as("n_distinct"),
          sum(allPass.cast("long")).as("n_pass_all"))
        .withColumn("pass_rate", round(col("n_pass_all").cast("double") / col("n_docs"), 6))
        .orderBy("source")
    }),

    // bloom-prefiltered decontamination, rolled up per source: the eval
    // n-gram set ships as ONE broadcast bitset and the corpus side is
    // pruned map-side before any shuffle; the exact confirm join makes
    // the bloom invisible in the result (oracled against plain exact SQL)
    "q96_bloom_decontam" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val train = d.filter(col("source") =!= "src0")
      val hits = Dedup.bloomDecontamination(
        d.filter(col("source") === "src0").select(col("doc_id"), col("text")),
        train.select(col("doc_id"), col("text")),
        "doc_id", "text", n = 5)
      train.select(col("doc_id"), col("source"))
        .join(hits, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("n_shared_grams").isNotNull, 1L).otherwise(0L)).as("n_contaminated"),
          sum(coalesce(col("n_shared_grams"), lit(0L))).as("total_shared_grams"))
        .withColumn("contam_rate",
          round(col("n_contaminated").cast("double") / col("n_docs"), 6))
        .orderBy("source")
    }),

    // overlapping char-window chunking (context-window / RAG passage
    // prep): gapless 128-char windows every 96 chars, tail clamped —
    // chunk ids derive from offsets, so the whole operator is one
    // shuffle-free posexplode map
    "q97_doc_chunks" -> ((s, dir) =>
      graft.operators.Chunking.charChunks(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id", "chunk_id")),

    // exact embedding covariance (upper triangle): the PCA/whitening/
    // anisotropy input — quantized integer sums (partition-invariant),
    // pair terms generated map-side from each vector's suffix, one
    // exchange of ≤ d(d+1)/2 partial rows
    "q98_embed_covariance" -> ((s, dir) =>
      graft.operators.EmbeddingStats.covarianceUpperTriangle(
        Tables.embeddings(s, dir), "embedding")),

    // source-mixture reweighting: per-source token shares vs a uniform
    // target mixture → sampling weight (the DoReMi-style "how hard do I
    // up/down-sample each source" readout); global shares via a window
    // over the bounded per-source relation only
    "q99_mixture_weights" -> ((s, dir) => {
      val bySource = Tables.documents(s, dir)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(coalesce(TextFunctions.bpeEstimate(col("text")), lit(0L))).as("n_tokens"))
      val everything = Window.partitionBy()
      bySource
        .withColumn("token_share",
          round(col("n_tokens").cast("double") / sum(col("n_tokens")).over(everything), 6))
        .withColumn("weight",
          round((lit(1.0) / count(lit(1)).over(everything))
            / (col("n_tokens").cast("double") / sum(col("n_tokens")).over(everything)), 6))
        .orderBy("source")
    }),

    // dup-rate curve: LSH candidate pairs bucketed by estimated Jaccard
    // decile, with the from-above cumulative = pairs actioned at each
    // threshold — the dedup threshold-calibration readout (q81's survival
    // curve, for pairs); cumulative window on the ≤11-row relation only
    "q100_dup_curve" -> ((s, dir) => {
      val deciles = Dedup.jaccardEstimates(Tables.documents(s, dir), "doc_id", "text")
        .select(least(floor(col("est_jaccard") * 10), lit(9L)).as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_pairs"))
      val fromAbove = Window
        .orderBy(col("decile").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deciles
        .withColumn("n_pairs_at_or_above", sum(col("n_pairs")).over(fromAbove))
        .orderBy("decile")
    }),

    // per-source Jensen–Shannon divergence from the rest of the corpus:
    // the redundancy readout behind mixture decisions (q90's entropy
    // says how diverse a source is; this says how much it adds)
    "q101_source_jsd" -> ((s, dir) =>
      CorpusStats.jsDivergence(Tables.documents(s, dir), "text", "source")),

    // PII audit rollup: per-source detector hit counts + docs-with-PII —
    // the compliance readout (zero on this synthetic corpus, which the
    // oracle verifies structurally; the detectors themselves are
    // spec-tested on crafted fixtures in PiiScrubSpec)
    "q102_pii_audit" -> ((s, dir) =>
      graft.operators.PiiScrub.withPiiColumns(
        Tables.documents(s, dir).filter(col("text").isNotNull), "text")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_email")).as("n_emails"),
          sum(col("n_ssn")).as("n_ssns"),
          sum(col("n_ip")).as("n_ips"),
          sum(col("n_phone")).as("n_phones"),
          sum(when(col("n_pii") > 0, 1L).otherwise(0L)).as("n_docs_with_pii"))
        .orderBy("source")),

    // semi-structured extraction: typed from_json over the events props
    // payload (PERMISSIVE: malformed/missing → null, counted as
    // unparsed) → per-type stats on the extracted field — the
    // schema-on-read staple for instrumented-event lakes
    "q103_json_extract" -> ((s, dir) => {
      val kSchema = org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")
      Tables.events(s, dir)
        .withColumn("k", from_json(col("props"), kSchema).getField("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("n_parsed"),
          sum(coalesce(col("k"), lit(0L))).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .withColumn("mean_k",
          round(col("sum_k").cast("double") / col("n_parsed").cast("double"), 6))
        .orderBy("event_type")
    }),

    // mixture-weight APPLY: deterministic per-doc keep test u·G·ntok_s <
    // Ntok·2^48 — i.e. keep with probability min(w_s, 1) for q99's
    // uniform-target weight w_s, entirely in exact integer algebra
    // (q68's cross-multiply discipline; no doubles, no rand()); the
    // per-source relation is bounded and broadcast
    "q104_mixture_apply" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("_tok", coalesce(TextFunctions.bpeEstimate(col("text")), lit(0L)))
      val bySource = d.groupBy("source").agg(sum(col("_tok")).as("ntok"))
      val everything = Window.partitionBy()
      val totals = bySource
        .withColumn("ntok_all", sum(col("ntok")).over(everything))
        .withColumn("n_sources", count(lit(1)).over(everything))
      val u = Dedup.md5Long(concat(lit("mix#"), col("doc_id").cast("string")), 12).cast(dec38)
      d.select(col("doc_id"), col("source"))
        .join(broadcast(totals), "source")
        .withColumn(
          "keep",
          u * col("n_sources").cast(dec38) * col("ntok").cast(dec38) <
            col("ntok_all").cast(dec38) * lit(Dedup.MinhashMod).cast(dec38))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .withColumn("keep_rate", round(col("n_kept").cast("double") / col("n_docs"), 6))
        .orderBy("source")
    }),

    // heavy-hitter bigrams: exact φ=1/1000 heavy hitters via a count-min
    // sketch prefilter — the bounded-key sketch pass replaces the full
    // vocabulary shuffle; exact recount only on sketch survivors
    "q105_heavy_hitters" -> ((s, dir) =>
      CorpusStats.heavyHitters(Tables.documents(s, dir), "text")),

    // deterministic training-shard assignment: md5(doc_id) % 64 → per-shard
    // doc/token/char loads + load ratio vs the mean — the output-bucketing
    // balance readout; the global window runs on the 64-row relation only
    "q106_shard_assignment" -> ((s, dir) => {
      val everything = Window.partitionBy()
      Tables.documents(s, dir)
        .select(
          pmod(Dedup.md5Long(col("doc_id").cast("string"), 12), lit(64L)).as("shard"),
          TextFunctions.regexPieces(col("text")).as("_pieces"),
          col("n_chars"))
        .groupBy("shard")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("_pieces")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars_total"))
        .withColumn(
          "load_ratio",
          round(col("n_tokens").cast("double") * 64 / sum(col("n_tokens")).over(everything), 6))
        .orderBy("shard")
    }),

    // LSH calibration: MinHash estimate vs exact Jaccard per
    // signature-agreement bucket — banding precision readout (≤9 rows out)
    "q107_lsh_calibration" -> ((s, dir) =>
      Dedup.lshCalibration(Tables.documents(s, dir), "doc_id", "text")),

    // tokenizer fertility per language: regex-pieces per whitespace word and
    // chars per piece — the "how expensive is this language to tokenize"
    // readout that sizes a token budget per source
    "q108_fertility" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextFunctions.regexPieces(col("text"))).as("n_pieces"),
          sum(TextFunctions.wordCount(col("text"))).as("n_words"),
          sum(col("n_chars")).as("n_chars_total"))
        .select(
          col("lang"),
          col("n_docs"),
          col("n_pieces"),
          col("n_words"),
          round(col("n_pieces").cast("double") / col("n_words"), 6).as("fertility"),
          round(col("n_chars_total").cast("double") / col("n_pieces"), 6).as("chars_per_piece"))
        .orderBy("lang")),

    // snapshot diff (CDC over a versioned lake): two simulated corpus
    // versions — old lacks doc_id%11==3 (those are "added"), new lacks
    // doc_id%17==2 ("removed"), old's doc_id%13==5 texts differ
    // ("changed") — hash-diffed per source; only digests shuffle
    "q109_snapshot_diff" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val oldSnap = d.filter(pmod(col("doc_id"), lit(11)) =!= 3)
        .select(
          col("doc_id"), col("source"),
          when(pmod(col("doc_id"), lit(13)) === 5, concat(col("text"), lit(" v0")))
            .otherwise(col("text")).as("text"))
      val newSnap = d.filter(pmod(col("doc_id"), lit(17)) =!= 2)
        .select(col("doc_id"), col("source"), col("text"))
      SnapshotDiff.summary(oldSnap, newSnap, "doc_id", "source", Seq("text"))
    }),

    // normalization-then-exact dedup (CCNet first pass): case/punct/space
    // insensitive dup rate per source at exact-dedup cost
    "q110_normalized_dedup" -> ((s, dir) =>
      Dedup.normalizedExact(Tables.documents(s, dir), "doc_id", "text", "source")),

    // temporal distribution drift: JS divergence of each month's event-type
    // mix vs the rest of the stream — the "did my pipeline's input shift
    // this month" monitor (q101 machinery on a time axis)
    "q111_temporal_jsd" -> ((s, dir) =>
      CorpusStats.jsDivergence(
        Tables.events(s, dir)
          .select(date_format(col("ts"), "yyyy-MM").as("month"), col("event_type")),
        "event_type", "month")),

    // intra-document repetition: per-source share of self-repeated 20-char
    // windows + docs with any window recurring ≥3× (Gopher repetition
    // signal at char granularity; doc id in the agg key → skew-proof)
    "q112_intra_doc_repetition" -> ((s, dir) =>
      Dedup.intraDocRepetition(Tables.documents(s, dir), "doc_id", "text", "source")),

    // robust per-language length stats: winsorized vs raw mean — the gap
    // IS the outlier signal (clipped values quantize to 1e-6 ints before
    // the sum, so the aggregation is order-invariant)
    "q113_winsorized_stats" -> ((s, dir) =>
      Stats.winsorizedStats(Tables.documents(s, dir), "n_chars", "lang")),

    // corpus concentration: Herfindahl index of per-source token shares +
    // effective source count (1/HHI) — the one-number "is my mixture
    // dominated by a single source" diagnostic; all heavy lifting is one
    // per-source agg, the index itself runs on the bounded relation
    "q114_source_concentration" -> ((s, dir) => {
      val per = Tables.documents(s, dir)
        .groupBy("source")
        .agg(sum(TextFunctions.regexPieces(col("text"))).as("ntok"))
      val tot = per.agg(sum(col("ntok")).as("total"), count(lit(1)).as("n_sources"))
      val share = col("ntok").cast("double") / col("total")
      per.crossJoin(broadcast(tot))
        .select(
          col("n_sources"),
          col("total"),
          round(share * share * lit(1000000000000.0), 0).cast("long").as("q"))
        .groupBy("n_sources", "total")
        .agg(sum(col("q")).as("qq"))
        .select(
          col("n_sources"),
          col("total").as("total_tokens"),
          round(col("qq").cast("double") / 1000000000000.0, 6).as("hhi"),
          round(lit(1000000000000.0) / col("qq").cast("double"), 6).as("effective_sources"))
    }),

    // token-budget truncation: keep each source's docs in doc_id order
    // until a 5k-token budget — how much of the planned mixture the budget
    // actually realizes; the cumulative window partitions by source
    "q115_token_budget" -> ((s, dir) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), TextFunctions.regexPieces(col("text")).as("tok"))
        .withColumn("cum", sum(col("tok")).over(w))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("cum") <= 5000L, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("cum") <= 5000L, col("tok")).otherwise(0L)).as("tokens_kept"))
        .withColumn("keep_rate", round(col("n_kept").cast("double") / col("n_docs"), 6))
        .orderBy("source")
    }),

    // full k-means fit: 3 driver-looped Lloyd iterations from the
    // deterministic seeds, then per-cluster size + mean member cosine —
    // the clustering-quality readout (q83 is one iteration of this)
    "q116_kmeans_fit" -> ((s, dir) =>
      Similarity.kmeansFit(Tables.embeddings(s, dir), "vec_id", "embedding",
        nCentroids = 8, iters = 3)),

    // label purity of the fitted clusters: does unsupervised structure
    // recover the labels — the semantic-balance readout before using
    // clusters as sampling strata; purity uses the same integer
    // half-away division as the k-means means (no round() boundary)
    "q117_cluster_purity" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.kmeansAssignments(e, "vec_id", "embedding", nCentroids = 8, iters = 3)
        .join(e.select(col("vec_id").as("vid"), col("label")), "vid")
        .groupBy("bucket", "label")
        .agg(count(lit(1)).as("c"))
        .groupBy(col("bucket").as("cent_id"))
        .agg(
          sum(col("c")).as("n_members"),
          max(struct(col("c"), (-col("label")).as("neg"), col("label").as("lbl"))).as("best"))
        .select(
          col("cent_id"),
          col("n_members"),
          col("best.lbl").cast("long").as("majority_label"),
          col("best.c").as("n_majority"),
          (expr("(2 * best.c * 1000000 + n_members) div (2 * n_members)").cast("double")
            / 1000000.0).as("purity"))
        .orderBy("cent_id")
    }),

    // per-user event transition matrix (first-order Markov readout): how
    // users move between event types, with transition probabilities by the
    // integer half-away division (no round() boundary); the lag window
    // partitions by user — distributed by construction
    "q118_event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("n_from", sum(col("n")).over(Window.partitionBy("prev_type")))
        .select(
          col("prev_type"),
          col("event_type"),
          col("n"),
          (expr("(2 * n * 1000000 + n_from) div (2 * n_from)").cast("double") / 1000000.0)
            .as("p"))
        .orderBy("prev_type", "event_type")
    }),

    // lang × source independence: chi-square cell contributions — which
    // (language, source) cells are over/under-represented vs independence;
    // the corpus-balance QA a mixing team runs before reweighting
    "q119_lang_source_indep" -> ((s, dir) => {
      val cells = Tables.documents(s, dir).groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val rowT = Window.partitionBy("lang")
      val colT = Window.partitionBy("source")
      val all = Window.partitionBy()
      cells
        .withColumn("rl", sum(col("o")).over(rowT))
        .withColumn("cl", sum(col("o")).over(colT))
        .withColumn("nn", sum(col("o")).over(all))
        .withColumn("e", col("rl").cast("double") * col("cl") / col("nn"))
        .select(
          col("lang"),
          col("source"),
          col("o").as("observed"),
          round(col("e"), 6).as("expected"),
          round((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 6).as("contrib"))
        .orderBy("lang", "source")
    }),

    // ORC zone round-trip: write documents to an ORC zone, read back with
    // the explicit schema, aggregate — oracled against the parquet
    // original (q57/q82 discipline for the third columnar zone format)
    "q120_orc_roundtrip" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tmp = graft.io.Zones.tempDir(s"graft_orc_zone_${new java.io.File(dir).getName}")
      graft.io.Zones.writeOrc(docs, tmp)
      graft.io.Zones.readOrc(s, docs.schema, Seq(tmp))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          countDistinct(col("doc_id")).as("n_ids"))
        .orderBy("lang")
    }),

    // Poisson-bootstrap CI for the per-language mean length: deterministic
    // md5-uniform weights against exact integer Poisson(1) thresholds —
    // the uncertainty readout behind any corpus-metric comparison
    "q121_bootstrap_ci" -> ((s, dir) =>
      Stats.bootstrapMeanCI(Tables.documents(s, dir), "n_chars", "doc_id", "lang")),

    // BPE merge training (tokenizer-TRAIN side of the q18/q29 appliers):
    // 8 merges learned from the weighted vocab relation — the corpus
    // collapses to |vocab| rows once, each merge iterates on that
    "q122_bpe_merges" -> ((s, dir) =>
      CorpusStats.bpeTrain(Tables.documents(s, dir), "text", numMerges = 8)),

    // apply the learned merges back to the corpus: per-source symbol
    // counts + chars-per-symbol compression — the train→apply loop closed
    "q123_bpe_apply" -> ((s, dir) =>
      CorpusStats.bpeSegmentation(Tables.documents(s, dir), "text", "source", numMerges = 8)),

    // sorted-neighborhood blocking (record-linkage family): pairs within a
    // rank window of the normalized sort key, per block — catches
    // same-prefix near-dups LSH scores low; complementary candidate source
    "q124_sorted_neighborhood" -> ((s, dir) =>
      Dedup.sortedNeighborhoodPairs(Tables.documents(s, dir), "doc_id", "text")),

    // blocking-family agreement: LSH vs sorted-neighborhood candidate
    // sets — pair counts, intersection, and pair-set Jaccard; the "do my
    // candidate generators see the same dups" audit (1-row output, three
    // bounded aggregates cross-joined)
    "q125_blocking_overlap" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val lsh = Dedup.minhashCandidates(d, "doc_id", "text").select("doc_a", "doc_b")
      val snm = Dedup.sortedNeighborhoodPairs(d, "doc_id", "text")
        .select(
          least(col("doc_a"), col("doc_b")).as("doc_a"),
          greatest(col("doc_a"), col("doc_b")).as("doc_b"))
        .distinct()
      val both = lsh.intersect(snm)
      lsh.agg(count(lit(1)).as("n_lsh"))
        .crossJoin(snm.agg(count(lit(1)).as("n_snm")))
        .crossJoin(both.agg(count(lit(1)).as("n_both")))
        .select(
          col("n_lsh"),
          col("n_snm"),
          col("n_both"),
          round(
            col("n_both").cast("double") / (col("n_lsh") + col("n_snm") - col("n_both")),
            6).as("pair_jaccard"))
    }),

    // keeper-policy comparison: min-id vs highest-quality keeper per dup
    // cluster — how the survivorship policy shifts the per-source mix
    "q126_keeper_policy" -> ((s, dir) =>
      Curation.keeperPolicyComparison(Tables.documents(s, dir), "doc_id", "text", "source")),

    // dup-graph degree distribution: how hub-y the candidate-pair graph is
    // (the "will CC see mega-components" diagnostic, read before the apply)
    "q127_dup_degree" -> ((s, dir) => {
      val pairs = Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
      pairs.select(col("doc_a").as("node"))
        .unionByName(pairs.select(col("doc_b").as("node")))
        .groupBy("node")
        .agg(count(lit(1)).as("deg"))
        .groupBy(col("deg").as("degree"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")
    }),

    // time-series gap-fill: per-user hourly series densified onto the full
    // hour grid with forward-fill — the resample step downstream
    // time-series consumers assume; everything partitions by user
    "q128_gap_fill" -> ((s, dir) =>
      EventWindows.gapFillHourly(Tables.events(s, dir))),

    // classic shipping-priority query (TPC-H Q3 shape): unshipped revenue
    // of BUILDING-segment orders placed before / shipped after the cutoff
    // — selective date + segment predicates push to all three scans, the
    // customer dim broadcasts, top-10 by exact cents revenue
    "q129_shipping_priority" -> ((s, dir) => {
      val cutoff = "1998-07-01"
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit(cutoff))
        .join(
          Tables.orders(s, dir).filter(col("o_orderdate") < lit(cutoff)),
          col("l_orderkey") === col("o_orderkey"))
        .join(
          broadcast(Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(
          col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority"))
        .agg(sum(centsOf(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }),
  )
}
