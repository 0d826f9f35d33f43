package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact second-moment statistics over an embedding column — the input to
  * PCA/whitening/anisotropy diagnostics a training-data team runs on a
  * corpus's embedding space (q61's centroid algebra extended to cross
  * dimensions).
  *
  * Determinism discipline (matches q54/q61): components are quantized to
  * 1e-6 integers at the scan; per-row arithmetic runs in long (codegen),
  * cross-partition merges in DECIMAL(38,0), so the aggregates are exact
  * integers — partition-count-invariant and bit-replayable by DuckDB
  * HUGEINT sums; doubles appear only in the final closed-form division.
  *
  * Scale shape: pair terms are generated MAP-SIDE — `posexplode` of the
  * quantized vector, then a second `posexplode` of its remaining suffix
  * (`slice`) — so no self-join and no shuffle of vector data; partial
  * aggregation collapses each partition to at most d(d+1)/2 rows before
  * the single exchange. Map-side blowup is d²/2 terms per vector (the
  * price of one-pass exactness), bounded by the embedding width, never by
  * corpus size.
  */
object EmbeddingStats {

  private val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

  /** Upper-triangle exact second-moment sums (i ≤ j, 0-based dims): one
    * row per dim pair with the 1e-6-quantized integer sums — the shared
    * relation under both the covariance readout and the power-iteration
    * eigenvector (both derive from THESE sums, so they can never
    * silently diverge).
    */
  def secondMomentSums(
      embeddings: DataFrame,
      vecCol: String,
      quantScale: Long = 1000000L): DataFrame = {
    val q: Column => Column = x => round(x.cast("double") * quantScale).cast("long")
    // (i, xi, suffix from i): one row per dim, carrying only the tail.
    // The d²/2-per-vector pair fan-out below would otherwise run inside
    // the ONE scan task of a single-row-group input — pinned spread by
    // the vector bytes first (r13, the q500 shape; partials are grouped
    // by spark_partition_id, and the final decimal merge makes the sums
    // partitioning-independent)
    val byDim = Dedup.spreadByKeyPinned(
        embeddings.filter(col(vecCol).isNotNull).select(col(vecCol)),
        col(vecCol))
      .select(posexplode(col(vecCol)).as(Seq("i", "_xi")), col(vecCol).as("_v"))
      .select(
        col("i"), q(col("_xi")).as("xq"),
        slice(col("_v"), col("i") + 1, greatest(size(col("_v")) - col("i"), lit(0))).as("_tail"))
    val pairs = byDim
      .select(col("i"), col("xq"), posexplode(col("_tail")).as(Seq("k", "_xj")))
      .select(
        col("i").cast("long").as("i"),
        (col("i") + col("k")).cast("long").as("j"),
        col("xq"),
        q(col("_xj")).as("yq"))
    // Every PER-ROW operation stays in long codegen: the d²/2-per-vector
    // hot path never touches a BigDecimal (the all-decimal first cut of
    // this aggregation was 13× slower at sf0.1). Exactness survives via a
    // 2^30 hi/lo split of the product and a two-level aggregation — long
    // partials per (pair, input partition), then a tiny decimal merge over
    // |pairs|·|partitions| rows. Bounds (documented, not hoped): with
    // |x| ≤ 30 the product |xq·yq| ≤ 9·10^14, so hi ≤ 2^20 and a
    // partition would need > 2^43 pair rows (≫ 4·10^9 vectors at d = 64)
    // to overflow a long partial; the decimal merge is overflow-free by
    // construction.
    val partial = pairs
      .withColumn("_prod", col("xq") * col("yq"))
      .withColumn("_plo", pmod(col("_prod"), lit(1073741824L)))
      .groupBy(col("i"), col("j"), spark_partition_id().as("_p"))
      .agg(
        count(lit(1)).as("_n"),
        sum(col("xq")).as("_sx"),
        sum(col("yq")).as("_sy"),
        sum(expr("(_prod - _plo) div 1073741824")).as("_hi"),
        sum(col("_plo")).as("_lo"))
    partial
      .groupBy("i", "j")
      .agg(
        sum(col("_n")).as("n_vecs"),
        sum(col("_sx").cast(dec38)).as("sx"),
        sum(col("_sy").cast(dec38)).as("sy"),
        (sum(col("_hi").cast(dec38)) * lit(1073741824L) + sum(col("_lo").cast(dec38)))
          .as("sxy"))
  }

  /** Upper-triangle covariance entries (i ≤ j, 0-based dims): one row per
    * dim pair with `cov_e6` = the population covariance in exact 1e-6
    * units (a long).
    *
    * Exactness end-to-end: cov = (n·Sxy − Sx·Sy)/(n²·q²), and cov_e6 is
    * its half-away-from-zero rounding at 1e-6 — computed entirely in
    * decimal integer arithmetic (`(2·|num| + den) div (2·den)` with the
    * sign re-applied), so there is NO final double division to land on a
    * rounding boundary; any engine's exact-integer replay bit-matches.
    * Requires quantScale² divisible by 1e6 (true for the 1e-6 default).
    */
  def covarianceUpperTriangle(
      embeddings: DataFrame,
      vecCol: String,
      quantScale: Long = 1000000L): DataFrame = {
    val denFactor = quantScale * quantScale / 1000000L
    require(denFactor * 1000000L == quantScale * quantScale,
      s"quantScale^2 must be divisible by 1e6, got $quantScale")
    secondMomentSums(embeddings, vecCol, quantScale)
      .withColumn("_num",
        col("n_vecs").cast(dec38) * col("sxy") - col("sx") * col("sy"))
      .withColumn("_den",
        col("n_vecs").cast(dec38) * col("n_vecs").cast(dec38) * lit(denFactor).cast(dec38))
      .select(
        col("i"), col("j"), col("n_vecs"),
        expr("CASE WHEN _num >= 0 THEN (2 * _num + _den) div (2 * _den)" +
          " ELSE -((2 * (-_num) + _den) div (2 * _den)) END").as("cov_e6"))
      .orderBy("i", "j")
  }

  /** Top principal direction by power iteration over the EXACT scaled
    * covariance A = n·Sxy − Sx·Sy (same eigenvectors as the covariance,
    * no division — every entry an exact integer).
    *
    * Scale shape: the distributed part is one pass over the corpus (the
    * [[secondMomentSums]] aggregation); what reaches the driver is the
    * d(d+1)/2 sum rows — bounded by the embedding width squared, never
    * by corpus size (the same bounded-state license as kmeansFit's k·d
    * centroid means). The iteration itself is d² integer work per round.
    *
    * Determinism: v₀ = quantScale (all dims), each round computes
    * w = A·v in BigInt and renormalizes by max|w| with the half-away
    * integer rounding (2|w|·s + m) div (2m) — no doubles anywhere, so a
    * DuckDB HUGEINT CTE chain replays it bit-for-bit.
    */
  def powerIteration(
      spark: org.apache.spark.sql.SparkSession,
      embeddings: DataFrame,
      vecCol: String,
      iters: Int = 4,
      quantScale: Long = 1000000L): DataFrame = {
    import spark.implicits._
    val sums = secondMomentSums(embeddings, vecCol, quantScale)
      .select(col("i"), col("j"), col("n_vecs"), col("sx"), col("sy"), col("sxy"))
      .collect()
    val d = sums.iterator.map(r => r.getLong(1)).max.toInt + 1
    val a = Array.ofDim[BigInt](d, d)
    sums.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val n = BigInt(r.getLong(2))
      val sx: BigInt = r.getDecimal(3).toBigInteger
      val sy: BigInt = r.getDecimal(4).toBigInteger
      val sxy: BigInt = r.getDecimal(5).toBigInteger
      val v = n * sxy - sx * sy
      a(i)(j) = v
      a(j)(i) = v
    }
    var v = Array.fill(d)(BigInt(quantScale))
    (1 to iters).foreach { _ =>
      val w = Array.tabulate(d)(i => (0 until d).foldLeft(BigInt(0))((s, j) => s + a(i)(j) * v(j)))
      val wm = w.iterator.map(_.abs).max
      v = w.map { wi =>
        val r = (2 * wi.abs * quantScale + wm) / (2 * wm)
        if (wi.signum < 0) -r else r
      }
    }
    v.zipWithIndex
      .map { case (vq, i) => (i.toLong, vq.toLong, vq.toDouble / quantScale.toDouble) }
      .toSeq
      .toDF("dim", "v_q", "loading")
      .orderBy("dim")
  }
}
