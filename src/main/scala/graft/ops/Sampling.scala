package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Deterministic sampling primitives (SURVEY.md §2.9): md5-based uniforms
  * instead of `rand()` — reproducible across engines, runs, and partition
  * layouts, which is what makes the q46/q68/q89 oracles possible at all.
  */
object Sampling {

  /** Uniform in (0, 1] derived from the md5 of a stable row key — the
    * portable stand-in for `rand()` (48-bit precision; +1 keeps ln(u)
    * finite at the zero hash).
    */
  def md5Uniform(key: Column): Column =
    (Dedup.md5Long(key.cast("string"), 12) + 1).cast("double") / lit(Dedup.MinhashMod.toDouble)

  /** Efraimidis–Spirakis A-ES sampling key, log-domain: ln(u)/w for
    * weight w > 0 — taking the top-k keys draws a without-replacement
    * sample where selection probability is proportional to weight.
    * Quantized to a 1e-6 integer (q72 ln discipline) so the rank order is
    * identical in any engine.
    */
  def aesKey(u: Column, w: Column): Column =
    round(log(u) / w * 1000000, 0).cast("long")

  /** Top-k weighted sample per group: deterministic weighted reservoir
    * sampling as one window. The rank filter plans as a map-side
    * WindowGroupLimit (q73 shape), so only ~k rows per partition reach
    * the window sort — the 100 TB path for "give me 1k quality-biased
    * docs per language".
    */
  def weightedTopKPerGroup(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      groupCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col("skey").desc, col(idCol))
    df.withColumn("skey", aesKey(md5Uniform(col(idCol)), col(weightCol)))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }
}
