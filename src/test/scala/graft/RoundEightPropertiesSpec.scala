package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Round-8 analytic pins — properties the oracle equivalence can't see. */
class RoundEightPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q235's exact pair relation is dictionary-bounded at ANY corpus size") {
    // the exact Theil–Sen path pairs per-(brand, size) AGGREGATED points,
    // so n_pairs must equal C(k_b, 2) for k_b = |distinct sizes in brand|
    // — a function of the p_size dictionary (≤ 50), NOT of the row count.
    // Until round 8 this was C(n_b, 2) over raw rows: the pair relation
    // grew quadratically with SF (the registry's last scale-killer)
    val r = SparkEntry.queries("q235_theilsen_slope")(spark, sfDir)
      .collect().map(x => x.getAs[String]("p_brand") -> x.getAs[Long]("n_pairs")).toMap
    val k = Tables.part(spark, sfDir)
      .groupBy("p_brand").agg(countDistinct(col("p_size")).as("k"))
      .collect().map(x => x.getAs[String]("p_brand") -> x.getAs[Long]("k")).toMap
    assert(r.nonEmpty && r.keySet === k.keySet)
    r.foreach { case (b, n) =>
      assert(n === k(b) * (k(b) - 1) / 2, s"brand $b: n_pairs $n != C(${k(b)},2)")
      assert(n <= 50L * 49 / 2, s"brand $b exceeds the p_size dictionary bound")
    }
  }

  test("q235's aggregated exact slope is outlier-resistant within a size cell") {
    import spark.implicits._
    // y = 3000·x cents at every size; one size cell holds a huge outlier
    // row. The cell MEAN moves, but the median over C(50,2) pair slopes
    // still lands on the clean 3000-milli slope — the robustness the
    // query claims survives the per-cell aggregation
    val rows = (1 to 50).flatMap { x =>
      val clean = Seq.fill(9)(("Brand#1", x.toLong, 3000L * x))
      val dirty = if (x == 25) Seq(("Brand#1", 25L, 900000000L)) else Seq(("Brand#1", x.toLong, 3000L * x))
      clean ++ dirty
    }.toDF("p_brand", "x", "y")
    val pts = rows.groupBy(col("p_brand"), col("x"))
      .agg(expr("CAST(sum(CAST(y AS DECIMAL(38,0))) div count(1) AS BIGINT)").as("y"))
      .withColumnRenamed("p_brand", "pb")
    val pairs = pts.as("a").join(pts.as("b"),
        col("a.pb") === col("b.pb") && col("a.x") < col("b.x"))
      .select(col("a.pb").as("p_brand"),
        expr("CASE WHEN (b.x - a.x) <= 0 THEN NULL WHEN (b.y - a.y) >= 0" +
          " THEN (2 * (b.y - a.y) * 1000 + (b.x - a.x)) div (2 * (b.x - a.x))" +
          " ELSE -((2 * (a.y - b.y) * 1000 + (b.x - a.x)) div (2 * (b.x - a.x))) END")
          .as("slope_milli"))
    val slopes = pairs.orderBy("slope_milli").collect().map(_.getLong(1))
    val median = slopes((slopes.length + 1) / 2 - 1)
    assert(median === 3000000L, s"median pair slope $median != clean 3000000 milli-cents")
  }
}
