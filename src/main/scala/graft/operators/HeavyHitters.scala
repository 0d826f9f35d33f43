package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-pass exact heavy hitters over an unbounded token domain.
  *
  * The naive `groupBy(token)` shuffles the FULL vocabulary — at corpus
  * scale that is billions of distinct keys moved for an answer that only
  * involves the few hundred tokens above the support threshold. The
  * classic two-pass shape avoids it:
  *
  *   - '''Pass 1 (sketch):''' every partition runs a Misra–Gries summary
  *     with `k` counters over its local token stream — a pure map-side
  *     pass, nothing shuffled but the ≤ `k` surviving keys per partition.
  *     Guarantee (averaging argument): any token with global count
  *     `> N/k` has local count `> N_p/k` in at least one partition, and a
  *     Misra–Gries summary with `k` counters retains every item whose
  *     local count exceeds `N_p/(k+1)` — so the union of per-partition
  *     survivors is a SUPERSET of the true heavy hitters.
  *   - '''Pass 2 (exact):''' re-scan, keep only candidate tokens (a
  *     bounded broadcast semi-join — ≤ `k·numPartitions` keys), and
  *     exact-count those. The shuffle carries candidate tokens only.
  *
  * False positives from pass 1 are eliminated by the exact threshold
  * filter in pass 2, so the result is EXACTLY the tokens with
  * `count · k > N` — which is why the whole operator can be oracled
  * against a plain `GROUP BY … HAVING` in DuckDB.
  *
  * The Misra–Gries step is amortized O(1) per token: a decrement round
  * only fires when the map is full and consumes `k` units of stored
  * count, and total increments are bounded by the partition size.
  *
  * Reference behavior: the reference engine has no sketch path (it
  * value_counts eagerly in pandas, `preprocess_to_staging.py:100-117`);
  * this is the scale-path generalization of that readout.
  */
object HeavyHitters {

  /** Pass 1: per-partition Misra–Gries survivors (distinct tokens). */
  def candidates(tokens: DataFrame, tokenCol: String, k: Int): DataFrame = {
    import tokens.sparkSession.implicits._
    require(k > 1, s"Misra-Gries needs k > 1, got $k")
    tokens
      .select(col(tokenCol).cast("string"))
      .as[String]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { t =>
          if (t != null) {
            m.get(t) match {
              case Some(c) => m.update(t, c + 1)
              case None =>
                if (m.size < k) m.update(t, 1L)
                else {
                  // classic MG decrement round: all counters −1, drop zeros
                  // (the arriving token's own count of 1 vanishes with them)
                  val dead = scala.collection.mutable.ArrayBuffer.empty[String]
                  m.foreach { case (key, c) =>
                    if (c == 1L) dead += key else m.update(key, c - 1)
                  }
                  dead.foreach(m.remove)
                }
            }
          }
        }
        m.keysIterator
      }
      .toDF(tokenCol)
      .distinct()
  }

  /** Both passes: exact counts of every token with `count · k > N`.
    * Output: (token, n, freq_ppm), ordered by count desc then token.
    */
  def heavyHitters(tokens: DataFrame, tokenCol: String, k: Int): DataFrame = {
    val cand = candidates(tokens, tokenCol, k)
    val total = tokens.agg(count(lit(1)).as("n_total"))
    tokens
      .join(broadcast(cand), Seq(tokenCol), "left_semi")
      .groupBy(tokenCol)
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * k > col("n_total"))
      .select(col(tokenCol), col("n"),
        expr("n * 1000000 div n_total").as("freq_ppm"))
      .orderBy(col("n").desc, col(tokenCol))
  }

  /** The q56-convention token stream of a text column: split on single
    * spaces, empty fragments dropped (mirrors DuckDB `string_split`).
    */
  def tokenStream(docs: DataFrame, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
}
