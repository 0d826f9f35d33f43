package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`Array[Float]`, SURVEY.md §2.9).
  *
  * Two tiers:
  *   - [[bruteForceTopK]] — exact cosine top-k, query set broadcast against
  *     a streamed corpus scan (the baseline; cost |Q|·N, fine for small Q).
  *   - [[ivfTopK]] — IVF-style bucketed search: corpus assigned to nearest
  *     centroid (one broadcast join), queries probe only their bucket —
  *     the 100 TB path (cost |Q|·N/K per probe).
  *
  * Determinism: dot products use `zip_with`+`aggregate` (sequential fold in
  * doubles, identical in DuckDB's `list_sum`/`list_transform`); ranking
  * orders by the *rounded* similarity with id tie-breaks, so both engines
  * rank identically even at float boundaries.
  */
object Similarity {

  /** Sequential-fold dot product — the native codegen'd
    * [[graft.plans.VecDot]] expression (per-element double cast + multiply,
    * summation order identical to a left fold, so values match the
    * interpreted HOF formulation and the DuckDB oracle bit-for-bit).
    */
  def dot(a: Column, b: Column): Column = graft.plans.VecDot(a, b)

  /** Adds `emb_d` (the embedding as passed; VecDot casts elements) and
    * `nrm` (L2 norm).
    */
  def withNorm(df: DataFrame, embCol: String): DataFrame =
    df.withColumn("emb_d", col(embCol))
      .withColumn("nrm", sqrt(dot(col("emb_d"), col("emb_d"))))

  def cosine(qv: Column, qn: Column, cv: Column, cn: Column): Column =
    round(dot(qv, cv) / (qn * cn), 6)

  /** Normed corpus view (vid, emb_d, nrm) — the shared base of every
    * search/assignment path. Deliberately NOT spread off the single-task
    * local scan (r13 A/B): the |N|·k assignment fan-out with native
    * VecDot is light enough that a pinned vid repartition measured
    * +0.3–0.6 s across q116/q117/q25/q83 — the spread pays only for
    * ≥100× fan-outs or expensive per-row functions (q500/q112/q310/q163
    * class), not k=8 dot products.
    */
  private def normed(emb: DataFrame, idCol: String, embCol: String): DataFrame =
    withNorm(emb, embCol).select(col(idCol).as("vid"), col("emb_d"), col("nrm"))

  /** The deterministic centroid set (vid < nCentroids), single source of
    * truth for both bucket assignment and query probe ranking — a drifted
    * copy would silently disagree and corrupt ANN results.
    */
  private def centroidSet(v: DataFrame, nCentroids: Int): DataFrame =
    v.filter(col("vid") < nCentroids)
      .select(col("vid").as("cent_id"), col("emb_d").as("cv"), col("nrm").as("cn"))

  /** Exact cosine top-k for queries `id < nQueries` over the whole corpus. */
  def bruteForceTopK(emb: DataFrame, idCol: String, embCol: String, nQueries: Int, k: Int): DataFrame = {
    val v = withNorm(emb, embCol).select(col(idCol).as("cand_id"), col("emb_d"), col("nrm"))
    val q = withNorm(emb, embCol)
      .filter(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col("emb_d").as("qv"), col("nrm").as("qn"))
    val sims = v
      .join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("qn"), col("emb_d"), col("nrm")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id").as("neighbor_id"), col("sim"), col("rk"))
      .orderBy("query_id", "rk")
  }

  /** Hard-example mining for contrastive training: for each query vector
    * (`id < nQueries`), the most-similar SAME-label candidate (the
    * positive) and the most-similar DIFFERENT-label candidate (the hard
    * negative), plus the margin between them — negative margins flag label
    * noise or impossible anchors before a training run wastes epochs on
    * them.
    *
    * One corpus scan against the bounded broadcast query set; both argmaxes
    * are conditional `max(struct)` aggregations (ties → lowest candidate id
    * on the rounded similarity), so nothing ever sorts |corpus|·|queries|
    * rows and the shuffle carries one row per (query, side).
    */
  def hardExamples(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      labelCol: String,
      nQueries: Int): DataFrame = {
    val v = withNorm(emb, embCol)
      .select(col(idCol).as("cand_id"), col(labelCol).as("cand_label"),
        col("emb_d"), col("nrm"))
    val q = withNorm(emb, embCol)
      .filter(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col(labelCol).as("q_label"),
        col("emb_d").as("qv"), col("nrm").as("qn"))
    val best = struct(col("sim"), (-col("cand_id")).as("neg"), col("cand_id").as("cid"))
    v.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("qn"), col("emb_d"), col("nrm")))
      .groupBy("query_id")
      .agg(
        first(col("q_label")).as("label"),
        max(when(col("cand_label") === col("q_label"), best)).as("bp"),
        max(when(col("cand_label") =!= col("q_label"), best)).as("bn"))
      .select(col("query_id"), col("label").cast("long").as("label"),
        col("bp.cid").as("pos_id"), col("bp.sim").as("pos_sim"),
        col("bn.cid").as("neg_id"), col("bn.sim").as("neg_sim"),
        round(col("bp.sim") - col("bn.sim"), 6).as("margin"))
      .orderBy("query_id")
  }

  /** Assign every vector to its max-cosine centroid (vectors `id <
    * nCentroids` are the deterministic centroids). One broadcast of the
    * centroid set; ties broken by centroid id on the rounded similarity.
    *
    * The argmax is a hash aggregation over `max(struct(csim, -cent_id))` —
    * lexicographic struct ordering picks highest similarity, then lowest
    * centroid id — instead of a row_number window, which would sort
    * |vectors|·|centroids| rows (measured 5× slower at 100k×64).
    */
  def assignBuckets(emb: DataFrame, idCol: String, embCol: String, nCentroids: Int): DataFrame = {
    val v = normed(emb, idCol, embCol)
    val cents = centroidSet(v, nCentroids)
    v.crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("cv"), col("cn"), col("emb_d"), col("nrm")))
      .groupBy("vid")
      .agg(
        max(struct(col("csim"), (-col("cent_id")).as("neg"), col("cent_id").as("cid"))).as("best"),
        first(col("emb_d")).as("emb_d"), // constant within the group
        first(col("nrm")).as("nrm"))
      .select(col("vid"), col("emb_d"), col("nrm"), col("best.cid").as("bucket"))
  }

  /** One Lloyd (k-means) iteration over the embedding corpus: assign every
    * vector to its max-cosine centroid ([[assignBuckets]], the IVF
    * assignment), then emit the component-wise MEAN of each bucket as the
    * refined centroid — the index-building step that turns the arbitrary
    * seed centroids into actual cluster centers (iterate to taste; each
    * iteration is this operator on the previous output).
    *
    * Exactness (q61 discipline): components quantize to 1e-6 integers and
    * sum as longs — the mean is aggregation-order-invariant, so the result
    * hash-matches any engine regardless of partitioning. Scale shape: the
    * assignment is |N|·|centroids| broadcast dot products (no shuffle),
    * then ONE hash aggregation keyed (bucket, pos) — |N|·dim skinny rows
    * with map-side partial aggregation; output is |centroids|·dim rows,
    * bounded.
    */
  def lloydStep(emb: DataFrame, idCol: String, embCol: String, nCentroids: Int): DataFrame =
    assignBuckets(emb, idCol, embCol, nCentroids)
      .select(col("bucket"), posexplode(col("emb_d")).as(Seq("pos", "v")))
      .groupBy("bucket", "pos")
      .agg(
        sum(round(col("v").cast("double") * 1000000, 0).cast("long")).as("sq"),
        count(lit(1)).as("n_members"))
      .select(
        col("bucket").as("cent_id"),
        col("pos").cast("long").as("pos"),
        col("n_members"),
        round(col("sq").cast("double") / (col("n_members") * 1000000.0), 6).as("mean_val"))
      .orderBy("cent_id", "pos")

  /** Full k-means fit: `iters` Lloyd iterations from the deterministic
    * seed set (vid < nCentroids), then the converged clustering readout —
    * per final centroid, member count and mean member-to-centroid cosine
    * (the clustering-quality number). [[lloydStep]] is ONE iteration of
    * this; here the driver loops, because the per-iteration result (k·dim
    * component means) is bounded by construction — collecting it is the
    * legitimate driver-side step of iterative ML (k·dim doubles, not
    * data), exactly how a parameter server treats model state.
    *
    * Exactness end-to-end: component means quantize to 1e-6 integers
    * before summing (lloydStep discipline) and round to 6dp; similarity
    * re-quantizes per row before the final mean — every aggregation is
    * order-invariant, every libm call (sqrt for the centroid norm,
    * sequential over components) bit-matches the oracle's chained-CTE
    * replay of the same iterations. Scale shape per iteration: one
    * broadcast of k·dim centroid literals against the corpus scan (no
    * shuffle for assignment), one hash agg keyed (bucket, pos). The
    * corpus view persists across iterations (iterative ML's standard
    * cache; unpersisted before the final pass so the returned plan owns
    * no executor memory).
    */
  /** Mean of 1e-6-quantized integers, rounded HALF AWAY FROM ZERO by pure
    * integer arithmetic — `round(sum/(n*1e6), 6)` would hit the classic
    * cross-engine boundary bug here: quantized-cosine sums divided by
    * member counts land EXACTLY on half-microunit boundaries (whenever
    * 2·sum ≡ n mod 2n), where Spark's BigDecimal HALF_UP (decimal
    * string) and DuckDB's binary-double round disagree by one ulp. The
    * integer formula `(2·|s| + n) div (2n)` has no rounding function at
    * all; the final division by 10⁶ maps the exact integer to an exact
    * double identically in both engines. Requires `s`/`n` as LONG columns
    * named in scope (expr-based for SQL `div`).
    */
  private def meanMicros(s: String, n: String): Column =
    (expr(s"CASE WHEN $s < 0 THEN -((2 * (-$s) + $n) div (2 * $n)) " +
      s"ELSE (2 * $s + $n) div (2 * $n) END").cast("double") / 1000000.0)

  /** The fitted assignment behind [[kmeansFit]]: (vid, bucket, csim)
    * against the centroids of the FINAL iteration — exposed so downstream
    * rollups (cluster purity, per-cluster sampling) compose with the same
    * exact iteration replay the summary uses.
    */
  def kmeansAssignments(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      nCentroids: Int,
      iters: Int): DataFrame = {
    val spark = emb.sparkSession
    val v = normed(emb, idCol, embCol)
    def assign(cents: DataFrame): DataFrame =
      v.crossJoin(broadcast(cents))
        .withColumn("csim", cosine(col("cv"), col("cn"), col("emb_d"), col("nrm")))
        .groupBy("vid")
        .agg(
          max(struct(col("csim"), (-col("cent_id")).as("neg"), col("cent_id").as("cid"))).as("best"),
          first(col("emb_d")).as("emb_d"))
        .select(col("vid"), col("best.cid").as("bucket"), col("best.csim").as("csim"), col("emb_d"))
    v.persist()
    var cents = centroidSet(v, nCentroids)
    var t = 0
    while (t < iters) {
      val meanRows = assign(cents)
        .select(col("bucket"), posexplode(col("emb_d")).as(Seq("pos", "vv")))
        .groupBy("bucket", "pos")
        .agg(
          sum(round(col("vv").cast("double") * 1000000, 0).cast("long")).as("sq"),
          count(lit(1)).as("n"))
        .select(col("bucket"), col("pos"), meanMicros("sq", "n").as("m"))
        .collect()
      val byCent = meanRows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (cid, rows) =>
        val vec = rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        var s = 0.0
        vec.foreach(x => s += x * x) // sequential, mirrors the oracle's list_sum
        (cid, vec, math.sqrt(s))
      }
      cents = spark.createDataFrame(byCent).toDF("cent_id", "cv", "cn")
      t += 1
    }
    v.unpersist(false)
    assign(cents).select(col("vid"), col("bucket"), col("csim"))
  }

  def kmeansFit(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      nCentroids: Int,
      iters: Int): DataFrame =
    kmeansAssignments(emb, idCol, embCol, nCentroids, iters)
      .groupBy(col("bucket").as("cent_id"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(round(col("csim") * 1000000, 0).cast("long")).as("_ss"))
      .select(
        col("cent_id"),
        col("n_members"),
        meanMicros("_ss", "n_members").as("mean_cosine"))
      .orderBy("cent_id")

  /** kNN majority-vote classification: for each query vector (`id <
    * nQueries`), find its k max-cosine neighbors in the corpus and predict
    * the label most common among them (ties → smaller label). The
    * label-propagation / weak-annotation primitive of an embedding
    * pipeline ("label my unlabeled pool from its nearest labeled
    * examples").
    *
    * Scale shape: the bounded query set broadcasts against the corpus
    * scan ([[bruteForceTopK]] shape — labels ride the candidate side, so
    * no post-hoc join back to the corpus); the vote is a hash aggregation
    * over the nQueries·k ranked rows with the argmax as `max(struct)`,
    * not a second window. Swap the candidate generation for the IVF path
    * when the corpus is indexed ([[ivfTopK]]); the vote is unchanged.
    */
  def knnClassify(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      labelCol: String,
      nQueries: Int,
      k: Int): DataFrame = {
    val v = withNorm(emb, embCol)
      .select(col(idCol).as("cand_id"), col(labelCol).as("cand_label"), col("emb_d"), col("nrm"))
    val q = withNorm(emb, embCol)
      .filter(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col("emb_d").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    v.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("qn"), col("emb_d"), col("nrm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy("query_id", "cand_label")
      .agg(count(lit(1)).as("n_votes"), max(col("sim")).as("top_sim"))
      .groupBy("query_id")
      .agg(max(struct(
        col("n_votes"),
        (-col("cand_label")).cast("long").as("neg"),
        col("cand_label").cast("long").as("lbl"),
        col("top_sim").as("ts"))).as("best"))
      .select(
        col("query_id"),
        col("best.lbl").as("pred_label"),
        col("best.n_votes").as("n_votes"),
        col("best.ts").as("top_sim"))
      .orderBy("query_id")
  }

  /** IVF-bucketed ANN: each query searches its `multiProbe` nearest
    * centroids' buckets (default 1 = classic IVF). Multi-probe is the
    * standard recall/skew lever: a query sitting on a Voronoi boundary
    * recovers neighbors assigned to the adjacent centroid, and when one
    * centroid's bucket is pathologically hot (clustered corpus), raising
    * the centroid count + probing P buckets keeps per-bucket probe cost at
    * ~P·N/K instead of one giant bucket. Skew in the bucket equi-join
    * itself is handled at runtime by AQE skew-join splitting (the join is
    * a plain equi-join on `bucket`, so Spark can split a hot bucket's
    * partitions freely).
    *
    * Cost note (measured, 100k×64-dim): building the bucket assignment
    * costs |N|·|centroids| dot products — more than a small query batch's
    * |N|·|Q| brute-force cost. IVF pays off when the assignment is
    * materialized once (persist [[assignBuckets]] output to the lake) and
    * amortized over many query batches; for one-shot small-Q lookups,
    * prefer [[bruteForceTopK]].
    */
  def ivfTopK(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      nCentroids: Int,
      nQueries: Int,
      k: Int,
      multiProbe: Int = 1): DataFrame = {
    val assigned = assignBuckets(emb, idCol, embCol, nCentroids)
    val v = normed(emb, idCol, embCol)
    val cents = centroidSet(v, nCentroids)
    // Rank every query's centroids; probe the top `multiProbe` buckets.
    // The window sorts only |Q|·|centroids| rows (both bounded).
    val wq = Window.partitionBy("query_id").orderBy(col("csim").desc, col("cent_id"))
    val q = v
      .filter(col("vid") < nQueries)
      .select(col("vid").as("query_id"), col("emb_d").as("qv"), col("nrm").as("qn"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("cv"), col("cn"), col("qv"), col("qn")))
      .withColumn("prb", row_number().over(wq))
      .filter(col("prb") <= multiProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cent_id").as("bucket"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vid"))
    assigned
      .join(broadcast(q), Seq("bucket"))
      .filter(col("vid") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("qn"), col("emb_d"), col("nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"), col("sim"), col("rk"))
      .orderBy("query_id", "rk")
  }

  /** ANN search for an external QUERY BATCH against a persisted bucket
    * assignment ([[assignBuckets]] output written to the lake once per
    * corpus snapshot) — the production flow that amortizes the index build
    * over many query batches: neither the corpus embeddings nor their
    * centroid dot products are recomputed per batch (the ANN twin of
    * [[Dedup.incrementalCandidates]] against the LSH signature store).
    * Centroids are recovered from the store itself (vid < nCentroids, the
    * same single-source-of-truth rule as [[centroidSet]]; the projection
    * is deduplicated so a multi-probe store — [[assignBucketsMulti]], one
    * row per (vector, bucket) — contributes each centroid once). Candidate
    * rows are likewise deduplicated before ranking: a corpus vector
    * assigned to two probed buckets must occupy ONE of the k slots, not
    * two. The query batch is NOT broadcast-hinted — a nightly embedding
    * batch is unbounded; AQE still broadcasts small batches.
    *
    * `excludeSelf` drops candidates whose store id equals the query id —
    * correct ONLY when the queries are corpus members sharing the store's
    * id space (the [[ivfTopK]] flow). For an external batch with its own
    * id space leave it false: an accidental id collision would silently
    * drop an unrelated corpus vector from that query's results.
    */
  def incrementalTopK(
      queries: DataFrame,
      bucketStore: DataFrame,
      idCol: String,
      embCol: String,
      nCentroids: Int,
      k: Int,
      multiProbe: Int = 1,
      excludeSelf: Boolean = false): DataFrame = {
    val cents = centroidSet(
      bucketStore.select(col("vid"), col("emb_d"), col("nrm")).distinct(), nCentroids)
    val wq = Window.partitionBy("query_id").orderBy(col("csim").desc, col("cent_id"))
    val q = normed(queries, idCol, embCol)
      .select(col("vid").as("query_id"), col("emb_d").as("qv"), col("nrm").as("qn"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("cv"), col("cn"), col("qv"), col("qn")))
      .withColumn("prb", row_number().over(wq))
      .filter(col("prb") <= multiProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cent_id").as("bucket"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vid"))
    bucketStore
      .join(q, Seq("bucket"))
      .filter(if (excludeSelf) col("vid") =!= col("query_id") else lit(true))
      .withColumn("sim", cosine(col("qv"), col("qn"), col("emb_d"), col("nrm")))
      .select(col("query_id"), col("vid"), col("sim"))
      .distinct()
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"), col("sim"), col("rk"))
      .orderBy("query_id", "rk")
  }

  /** Assign every vector to its `probes` nearest centroids (multi-probe
    * assignment for recall). Top-P is computed WITHOUT a global sort: per
    * vector, `collect_list` gathers the (bounded) centroid set into one
    * array, `sort_array` orders those ≤|centroids| elements locally, and
    * `slice` keeps P — a hash aggregation, never a row_number window over
    * |N|·|centroids| rows (measured 5× slower for the argmax case).
    */
  def assignBucketsMulti(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      nCentroids: Int,
      probes: Int): DataFrame = {
    val v = normed(emb, idCol, embCol)
    val cents = centroidSet(v, nCentroids)
    v.crossJoin(broadcast(cents))
      .withColumn("csim", cosine(col("cv"), col("cn"), col("emb_d"), col("nrm")))
      .groupBy("vid")
      .agg(
        slice(
          sort_array(collect_list(struct((-col("csim")).as("neg"), col("cent_id").as("cid")))),
          1, probes).as("top"),
        first(col("emb_d")).as("emb_d"),
        first(col("nrm")).as("nrm"))
      .select(col("vid"), col("emb_d"), col("nrm"), explode(col("top.cid")).as("bucket"))
  }

  /** Deterministic Rademacher hyperplane coefficient: ±1 from the parity
    * of the first hex nibble of md5("hp-<p>-<d>") — a constant per (plane,
    * dim), computed driver-side and shipped as a literal array, and
    * replayed bit-for-bit by the DuckDB oracle from the same md5 string.
    * Sign-random ±1 projections satisfy the Johnson-Lindenstrauss /
    * random-hyperplane LSH guarantees (Achlioptas 2001) without needing a
    * portable Gaussian sampler.
    */
  private def planeCoef(p: Int, d: Int): Double = {
    val b0 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp-$p-$d".getBytes("UTF-8"))(0)
    if (((b0 >> 4) & 1) == 0) 1.0 else -1.0
  }

  /** Random-hyperplane (SimHash-for-cosine) LSH near-dup pairs: the
    * centroid-free counterpart of [[embedNearDupPairs]] — no k-means-style
    * assignment pass, so it works on a corpus with no meaningful cluster
    * structure and needs no persisted centroid state.
    *
    * Scale shape: the `numPlanes`-bit signature is a PURE MAP (one codegen'd
    * [[graft.plans.VecDot]] per plane against a literal ±1 array — no
    * shuffle, no UDF); candidates come from the banded equi-join (cost
    * Σ bucket², never N²); exact cosine verifies only candidate pairs via
    * joins back to the normed corpus (band rows stay skinny — vectors are
    * not carried through the band shuffle). P[same band | angle θ] =
    * (1−θ/π)^bandBits per band.
    */
  /** Random-hyperplane band rows (vid, b, bv) for a normed corpus view —
    * the shared candidate-generation base of [[cosineLshPairs]] (self-join)
    * and [[semanticContamination]] (cross-set join). The signature is a
    * pure codegen map (one [[graft.plans.VecDot]] per plane against a
    * literal ±1 array); band rows stay skinny — vectors are never carried
    * through the band shuffle.
    */
  private def lshBandRows(v: DataFrame, dim: Int, numPlanes: Int, bandBits: Int): DataFrame = {
    require(numPlanes % bandBits == 0 && numPlanes <= 62,
      s"numPlanes ($numPlanes) must be a multiple of bandBits ($bandBits) and fit a long")
    val numBands = numPlanes / bandBits
    val sig = (0 until numPlanes).map { p =>
      val plane = typedLit((0 until dim).map(d => planeCoef(p, d)))
      when(dot(col("emb_d"), plane) >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ + _)
    v.select(col("vid"), sig.as("sig"))
      .select(col("vid"), explode(array((0 until numBands).map { b =>
        struct(
          lit(b).as("b"),
          shiftright(col("sig"), b * bandBits).bitwiseAND(lit((1 << bandBits) - 1)).as("bv"))
      }: _*)).as("bb"))
      .select(col("vid"), col("bb.b").as("b"), col("bb.bv").as("bv"))
  }

  def cosineLshPairs(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      numPlanes: Int = 32,
      bandBits: Int = 8,
      threshold: Double = 0.4): DataFrame = {
    val v = normed(emb, idCol, embCol)
    val bands = lshBandRows(v, dim, numPlanes, bandBits)
    val cand = bands.as("x")
      .hint("shuffle_merge") // identical shuffles on both sides → ReusedExchange
      .join(
        bands.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("vec_a"), col("y.vid").as("vec_b"))
      .distinct()
    cand
      .join(v.select(col("vid").as("vec_a"), col("emb_d").as("ea"), col("nrm").as("na")), "vec_a")
      .join(v.select(col("vid").as("vec_b"), col("emb_d").as("eb"), col("nrm").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"), cosine(col("ea"), col("na"), col("eb"), col("nb")).as("sim"))
      .filter(col("sim") >= threshold)
      .orderBy("vec_a", "vec_b")
  }

  /** Semantic (embedding-level) decontamination: for each TRAIN vector,
    * how many EVAL vectors share a random-hyperplane LSH band AND clear
    * the exact-cosine threshold — the embedding twin of
    * [[graft.operators.Dedup.exactNgramContamination]] (q74): it catches
    * paraphrased benchmark leakage that no n-gram overlap can see.
    *
    * Scale shape: signatures are pure maps on BOTH sides (no shuffle);
    * candidates come from the banded eval⋈train equi-join — cost
    * Σ_bucket |eval ∩ bucket|·|train ∩ bucket|, never |E|·|T| — and exact
    * cosine verifies candidates only, via skinny-row joins back to each
    * normed side. The eval side is benchmark-sized but unbounded across
    * suites → no broadcast hint; AQE broadcasts it when actually small.
    * Returns (vec_id, n_eval_matches, max_sim) per contaminated train vec.
    */
  def semanticContamination(
      evalEmb: DataFrame,
      trainEmb: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      numPlanes: Int = 32,
      bandBits: Int = 8,
      threshold: Double = 0.4): DataFrame = {
    val ve = normed(evalEmb, idCol, embCol)
    val vt = normed(trainEmb, idCol, embCol)
    val cand = lshBandRows(ve, dim, numPlanes, bandBits).as("e")
      .join(
        lshBandRows(vt, dim, numPlanes, bandBits).as("t"),
        col("e.b") === col("t.b") && col("e.bv") === col("t.bv"))
      .select(col("e.vid").as("eval_id"), col("t.vid").as("train_id"))
      .distinct()
    cand
      .join(ve.select(col("vid").as("eval_id"), col("emb_d").as("ee"), col("nrm").as("ne")), "eval_id")
      .join(vt.select(col("vid").as("train_id"), col("emb_d").as("et"), col("nrm").as("nt")), "train_id")
      .select(col("train_id"), cosine(col("ee"), col("ne"), col("et"), col("nt")).as("sim"))
      .filter(col("sim") >= threshold)
      .groupBy(col("train_id").as("vec_id"))
      .agg(count(lit(1)).as("n_eval_matches"), max(col("sim")).as("max_sim"))
      .orderBy("vec_id")
  }

  /** Embedding-cosine near-dup pairs: pairs sharing ANY of their `probes`
    * nearest-centroid buckets, with cosine ≥ `threshold`. The bucket
    * equi-join bounds cost at Σ bucket² instead of the N² all-pairs
    * product — the dedup counterpart of [[ivfTopK]]. `probes = 1` is
    * classic single-bucket IVF; higher values recover near-dup pairs that
    * straddle a Voronoi boundary at ~P× the join volume.
    */
  def embedNearDupPairs(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      nCentroids: Int,
      threshold: Double,
      probes: Int = 1): DataFrame = {
    val a =
      if (probes == 1) assignBuckets(emb, idCol, embCol, nCentroids)
      else assignBucketsMulti(emb, idCol, embCol, nCentroids, probes)
    a.as("x")
      .join(a.as("y"), col("x.bucket") === col("y.bucket") && col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("vec_a"), col("y.vid").as("vec_b"),
        cosine(col("x.emb_d"), col("x.nrm"), col("y.emb_d"), col("y.nrm")).as("sim"))
      .distinct() // a pair sharing several probed buckets appears once
      .filter(col("sim") >= threshold)
      .orderBy("vec_a", "vec_b")
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98): greedy top-k that trades relevance against redundancy —
    * step t picks `argmax λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`. The
    * diversity-aware readout of a retrieval stack: plain top-k returns k
    * near-copies of the best hit; MMR returns the best hit plus its k−1
    * most-informative complements.
    *
    * Determinism discipline: relevance and pairwise cosines are
    * micro-quantized to integers FIRST (one rounding boundary, the q72
    * discipline), then the greedy score is the pure integer
    * `lamNum·rel_u − (lamDen−lamNum)·pen_u` (λ as a rational) with min-id
    * tie-break — both engines rank identically even at float boundaries.
    *
    * Scale shape: the greedy loop is inherently sequential in k, but each
    * step is one distributed argmax (`max(struct)`, no sort) over the
    * corpus with the selected set carried as k literal vectors — the same
    * driver-paced-rounds pattern as [[kmeansFit]]. Relevance is computed
    * once and cached; step t adds exactly one new penalty column. For
    * k beyond ~100 the selected set should move from literals to a
    * broadcast relation.
    */
  def mmrRerank(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      queryId: Long = 0L,
      k: Int = 5,
      lamNum: Int = 7,
      lamDen: Int = 10): DataFrame = {
    require(k >= 1 && lamNum >= 0 && lamNum <= lamDen)
    val spark = emb.sparkSession
    val v = normed(emb, idCol, embCol)
    val q = v.filter(col("vid") === queryId).select("emb_d", "nrm").head()
    val qv = q.getSeq[Float](0).toArray
    val qn = q.getDouble(1)
    def microSim(toVec: Array[Float], toNrm: Double): Column =
      round(dot(col("emb_d"), typedLit(toVec)) / (col("nrm") * lit(toNrm)) * 1e6, 0)
        .cast("long")
    val rel = v.filter(col("vid") =!= queryId)
      .select(col("vid"), microSim(qv, qn).as("rel_u"), col("emb_d"), col("nrm"))
      .persist()
    try {
      val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[(Array[Float], Double)]
      while (picked.length < k) {
        val remaining = picked.map(_._1) match {
          case ids if ids.isEmpty => rel
          case ids => rel.filter(!col("vid").isin(ids.toSeq: _*))
        }
        val penU =
          if (pickedVecs.isEmpty) lit(0L)
          else if (pickedVecs.length == 1) microSim(pickedVecs(0)._1, pickedVecs(0)._2)
          else greatest(pickedVecs.toSeq.map { case (e, n) => microSim(e, n) }: _*)
        val best = remaining
          .select(col("vid"), col("rel_u"), col("emb_d"), col("nrm"),
            (lit(lamNum.toLong) * col("rel_u") - lit((lamDen - lamNum).toLong) * penU)
              .as("score_u"))
          .select(max(struct(col("score_u"), (-col("vid")).as("ni"), col("vid"),
            col("rel_u"), col("emb_d"), col("nrm"))).as("b"))
          .select(col("b.vid"), col("b.rel_u"), col("b.score_u"), col("b.emb_d"), col("b.nrm"))
          .head()
        picked += ((best.getLong(0), best.getLong(1), best.getLong(2)))
        pickedVecs += ((best.getSeq[Float](3).toArray, best.getDouble(4)))
      }
      import spark.implicits._
      picked.toSeq.zipWithIndex
        .map { case ((vid, relU, scoreU), i) =>
          (i + 1L, vid, relU / 1e6, scoreU)
        }
        .toDF("pos", "vec_id", "rel", "score_u")
    } finally rel.unpersist()
  }

  /** Int8 scalar quantization recall audit — the compressed-index
    * evaluation loop. Each vector is quantized per-vector symmetric:
    * `q_i = round(127 · x_i / max|x|)` (the max-abs scale every int8 ANN
    * index family uses), which shrinks the corpus 4× and makes the dot
    * product pure integer arithmetic. The audit ranks the corpus for each
    * query twice — exact float cosine (the [[bruteForceTopK]] ordering)
    * and integer quantized cosine `qdot·1e6 div (⌊√Σq_a²⌋·⌊√Σq_b²⌋)` —
    * and reports, per query, how many of the exact top-k the quantized
    * ranking recovers (recall@k) plus the mean rank displacement of the
    * exact top-k under the quantized ranking (milli-positions).
    *
    * Scale shape: identical to brute-force search — the bounded query set
    * broadcasts, the corpus streams; the quantized rank needs no extra
    * shuffle (both rankings come from the same per-(query, candidate) row
    * in one window pass). At index-build scale the quantized corpus would
    * be materialized once; the audit's point is deciding whether recall
    * survives the compression before committing to it.
    */
  def quantizedRecall(emb: DataFrame, idCol: String, embCol: String,
      nQueries: Int, k: Int): DataFrame = {
    // quantized view: int8 codes, exact integer squared norm, and its
    // EXACT integer sqrt (floor(√double) plus ±1 fix-ups — qn2 is far
    // below 2^52 so the double estimate is within one) — so the quantized
    // similarity `qdot·1e6 div (sa·sb)` is pure integer arithmetic, no
    // float rounding boundary for the oracle to disagree on. Negative
    // dots divide as -((-a) div b): both engines floor toward zero.
    val quant = emb
      .select(col(idCol).as("vid"), col(embCol).cast("array<double>").as("v"))
      .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
      .withColumn("q",
        when(col("mx") === 0d, transform(col("v"), _ => lit(0L)))
          .otherwise(transform(col("v"),
            x => round(x * 127d / col("mx")).cast("long"))))
      .withColumn("qn2",
        aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))
      .withColumn("t", floor(sqrt(col("qn2").cast("double"))).cast("long"))
      .withColumn("s",
        when((col("t") + 1) * (col("t") + 1) <= col("qn2"), col("t") + 1)
          .when(col("t") * col("t") > col("qn2"), col("t") - 1)
          .otherwise(col("t")))
      .select(col("vid"), col("q"), col("s"))
    val base = normed(emb, idCol, embCol)
      .join(quant, "vid")
    val queries = base
      .filter(col("vid") < nQueries)
      .select(col("vid").as("query_id"), col("emb_d").as("qv"), col("nrm").as("qn"),
        col("q").as("qq"), col("s").as("qs"))
    val scored = base
      .join(broadcast(queries), col("vid") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("qn"), col("emb_d"), col("nrm")))
      .withColumn("qdot",
        aggregate(zip_with(col("qq"), col("q"), (a, b) => a * b), lit(0L),
          (acc, x) => acc + x))
      .withColumn("qsim_u", expr(
        "CASE WHEN qs * s = 0 THEN 0" +
          " WHEN qdot >= 0 THEN (qdot * 1000000) div (qs * s)" +
          " ELSE -((-qdot * 1000000) div (qs * s)) END"))
      .select(col("query_id"), col("vid"), col("sim"), col("qsim_u"))
    val exactRk = row_number()
      .over(Window.partitionBy("query_id").orderBy(col("sim").desc, col("vid")))
    val quantRk = row_number()
      .over(Window.partitionBy("query_id").orderBy(col("qsim_u").desc, col("vid")))
    scored
      .withColumn("erk", exactRk.cast("long"))
      .withColumn("qrk", quantRk.cast("long"))
      .filter(col("erk") <= k || col("qrk") <= k)
      .groupBy("query_id")
      .agg(
        sum(when(col("erk") <= k && col("qrk") <= k, 1L).otherwise(0L)).as("n_overlap"),
        sum(when(col("erk") <= k, abs(col("qrk") - col("erk"))).otherwise(0L))
          .as("disp_sum"))
      .select(col("query_id"), col("n_overlap"),
        expr(s"n_overlap * 100 div $k").as("recall_pct"),
        expr(s"disp_sum * 1000 div $k").as("mean_disp_milli"))
      .orderBy("query_id")
  }

  /** Product-quantization codebook audit — the IVF-PQ building block: the
    * vector splits into dim/`subDim` contiguous subspaces, each quantized
    * against its own `nCodes`-entry codebook (here the deterministic seed
    * vectors `id < nCodes`, the [[assignBuckets]] convention). Per
    * subspace the audit reports codebook utilization and the exact total
    * squared quantization error in 1e-6-quantized units — the
    * distortion-per-subspace readout that decides nSub/nCodes before
    * committing to a compressed index.
    *
    * Exactness: components quantize to 1e-6 longs first; squared
    * distances and the argmin tie-break (lowest code id) are pure integer
    * arithmetic, so any engine reproduces the assignment bit-for-bit.
    * Scale shape: the codebook (nSub·nCodes·subDim values) broadcasts;
    * distances accumulate in ONE hash aggregation over |N|·dim skinny
    * exploded rows (map-side combine on (vid, sub, code)), then two
    * bounded aggregations — no window ever sees more than nCodes rows per
    * (vector, subspace).
    *
    * Preconditions (guarded, not assumed): ids must be dense from 0 (the
    * codebook is the rows with `idCol < nCodes`) and `subDim` must divide
    * the embedding dimension (otherwise the last subspace is partial).
    * The output's `codes_defined` column reports the codebook rows
    * actually found per subspace — a degraded audit (sparse ids, short
    * codebook) shows `codes_defined < nCodes` instead of silently
    * producing undersized-codebook numbers.
    */
  def pqCodebookAudit(emb: DataFrame, idCol: String, embCol: String,
      subDim: Int, nCodes: Int): DataFrame = {
    val q = emb.select(col(idCol).as("vid"),
        posexplode(col(embCol).cast("array<double>")).as(Seq("pos", "x")))
      .select(col("vid"), expr(s"pos div $subDim").as("sub"), col("pos"),
        round(col("x") * 1000000, 0).cast("long").as("qv"))
    val codes = q.filter(col("vid") < nCodes)
      .select(col("vid").as("cid"), col("sub").as("csub"),
        col("pos").as("cpos"), col("qv").as("qc"))
    val dist = q.join(broadcast(codes),
        col("sub") === col("csub") && col("pos") === col("cpos"))
      .groupBy("vid", "sub", "cid")
      .agg(sum(expr("(qv - qc) * (qv - qc)")).as("d2"))
    val defined = codes.groupBy(col("csub").as("sub"))
      .agg(countDistinct(col("cid")).as("codes_defined"))
    dist.groupBy("vid", "sub")
      .agg(min(struct(col("d2"), col("cid"))).as("best"))
      .groupBy("sub")
      .agg(count(lit(1)).as("n_vectors"),
        countDistinct(col("best.cid")).as("codes_used"),
        // per-vector d2 is bounded (~4e12·subDim) but the corpus-wide sum
        // grows with the vector count — accumulate in decimal, report long
        sum(col("best.d2").cast("decimal(38,0)")).as("sum_dec"))
      .withColumn("avg_sqerr_q", expr("sum_dec div n_vectors"))
      .join(defined, Seq("sub"))
      .select(col("sub").cast("long").as("subspace"), col("n_vectors"),
        col("codes_defined"), col("codes_used"),
        // report the corpus-wide sum as the DECIMAL'S DIGITS: per-vector
        // d2 is ~3e13, so a long report would wrap near 3e5 vectors —
        // the accumulation stays decimal(38,0), but the REPORTED column
        // is its canonical string form, because engines canonicalize
        // decimal values differently at the wire (round 8's only red:
        // values byte-identical cross-engine, hashes diverged on the
        // decimal representation). Digits of an exact integer are
        // engine-independent; the oracle mirrors with CAST(.. AS VARCHAR)
        col("sum_dec").cast("string").as("sum_sqerr_q"),
        col("avg_sqerr_q"))
      .orderBy("subspace")
  }
}
