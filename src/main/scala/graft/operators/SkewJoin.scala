package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins (SURVEY.md scale posture; complements AQE's
  * runtime skew-join splitting with a plan-level guarantee).
  *
  * A hot join key sends all its rows to one reducer. Salting appends a
  * deterministic salt in [0, factor) to the big side — derived by hashing a
  * distinguishing column, so results are reproducible — and replicates the
  * small side `factor` times, joining on (key, salt). The hot key's rows
  * spread over `factor` reducers at the cost of `factor`× the small side.
  */
object SkewJoin {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      bigDistinctCol: String): DataFrame = {
    val salted = big.withColumn("_salt", pmod(hash(col(bigDistinctCol)), lit(saltFactor)))
    val replicated = small.withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
