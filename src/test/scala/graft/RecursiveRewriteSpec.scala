package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import Tables.{events, orders}

/** r12 optimization guard: q359 / q426 / q431 replaced their WITH
  * RECURSIVE execution (one sequential Spark job per level — 24 jobs for
  * 24 rows) with a single `aggregate`-HOF left fold over the sorted grid
  * array. The DuckDB oracle still replays the recursion level-by-level;
  * this spec replays it through SPARK's recursive CTE (keeping that
  * Spark-4 surface exercised) and pins the rewrite row-for-row equal —
  * including the anchor semantics (q431's full first bucket, q426's
  * mi = 0 seed) and gap termination (consumption stops when the
  * month/hour join would empty).
  */
class RecursiveRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def centsOf(c: org.apache.spark.sql.Column) =
    graft.queries.Shared.centsOf(c)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  test("q359 array fold ≡ recursive CTE") {
    orders(spark, sfDir)
      .groupBy(expr("CAST((year(o_orderdate) - 1995) * 12" +
        " + month(o_orderdate) - 1 AS BIGINT)").as("mi"))
      .agg(sum(centsOf(col("o_totalprice"))).as("rev_c"))
      .filter(col("mi") < 24)
      .localCheckpoint()
      .createOrReplaceTempView("rrs_q359")
    val cte = spark.sql(
      """WITH RECURSIVE bal(mi, b) AS (
        |  SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT r.mi, bal.b - bal.b div 10 + r.rev_c
        |  FROM bal JOIN rrs_q359 r ON r.mi = bal.mi + 1
        |)
        |SELECT mi AS month_index, b AS balance_cents
        |FROM bal WHERE mi >= 0 ORDER BY mi""".stripMargin)
    val got = SparkEntry.queries("q359_recursive_projection")(spark, sfDir)
    assert(got.count() > 0)
    assert(rows(got) === rows(cte))
  }

  test("q426 array fold ≡ recursive CTE") {
    orders(spark, sfDir)
      .groupBy(expr("CAST((year(o_orderdate) - 1995) * 12" +
        " + month(o_orderdate) - 1 AS BIGINT)").as("mi"))
      .agg(sum(centsOf(col("o_totalprice"))).as("rev_c"))
      .filter(col("mi") >= 0 && col("mi") < 24)
      .localCheckpoint()
      .createOrReplaceTempView("rrs_q426")
    val cte = spark.sql(
      """WITH RECURSIVE hw(mi, l, b) AS (
        |  SELECT CAST(0 AS BIGINT), r.rev_c, CAST(0 AS BIGINT)
        |  FROM rrs_q426 r WHERE r.mi = 0
        |  UNION ALL
        |  SELECT r.mi,
        |         (300 * r.rev_c + 700 * (hw.l + hw.b)) div 1000,
        |         (200 * (((300 * r.rev_c + 700 * (hw.l + hw.b)) div 1000) - hw.l)
        |          + 800 * hw.b) div 1000
        |  FROM hw JOIN rrs_q426 r ON r.mi = hw.mi + 1
        |)
        |SELECT mi AS month_index, l AS level_cents, b AS trend_cents,
        |       l + b AS forecast_next_cents
        |FROM hw ORDER BY mi""".stripMargin)
    val got = SparkEntry.queries("q426_holt_linear")(spark, sfDir)
    assert(got.count() > 0)
    assert(rows(got) === rows(cte))
  }

  test("q431 array fold ≡ recursive CTE") {
    val ev = events(spark, sfDir)
    val mn = ev.agg(min(unix_micros(col("ts"))).as("t0"))
    val hours = ev.crossJoin(broadcast(mn))
      .select(expr("(unix_micros(ts) - t0) div 3600000000").as("hi"))
      .filter(col("hi") < 24)
      .groupBy("hi").agg(count(lit(1)).as("arr"))
    val grid = spark.range(24).select(col("id").as("hi"))
      .join(hours, Seq("hi"), "left").na.fill(0L, Seq("arr"))
    val tot = grid.agg(expr("(sum(arr) + 23) div 24").as("r"))
    grid.crossJoin(broadcast(tot))
      .select(col("hi"), col("arr"), col("r"), (col("r") * 2).as("cap"))
      .localCheckpoint()
      .createOrReplaceTempView("rrs_q431")
    val cte = spark.sql(
      """WITH RECURSIVE tb(hi, arr, served, dropped, b) AS (
        |  SELECT g.hi, g.arr, least(g.arr, g.cap), g.arr - least(g.arr, g.cap),
        |         g.cap - least(g.arr, g.cap)
        |  FROM rrs_q431 g WHERE g.hi = 0
        |  UNION ALL
        |  SELECT g.hi, g.arr,
        |         least(g.arr, least(g.cap, tb.b + g.r)),
        |         g.arr - least(g.arr, least(g.cap, tb.b + g.r)),
        |         least(g.cap, tb.b + g.r) - least(g.arr, least(g.cap, tb.b + g.r))
        |  FROM tb JOIN rrs_q431 g ON g.hi = tb.hi + 1
        |)
        |SELECT hi AS hour_index, arr AS arrivals, served, dropped,
        |       b AS bucket_end
        |FROM tb ORDER BY hi""".stripMargin)
    val got = SparkEntry.queries("q431_token_bucket")(spark, sfDir)
    assert(got.count() === 24)
    assert(rows(got) === rows(cte))
  }

  test("gap termination: the fold stops at the first missing level, like the CTE join") {
    import spark.implicits._
    // months 0,1,2 then a gap then 4,5 — the CTE consumes 0..2 only
    Seq((0L, 100L), (1L, 200L), (2L, 300L), (4L, 400L), (5L, 500L))
      .toDF("mi", "rev_c").localCheckpoint()
      .createOrReplaceTempView("rrs_gap")
    val cte = spark.sql(
      """WITH RECURSIVE bal(mi, b) AS (
        |  SELECT CAST(-1 AS BIGINT), CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT r.mi, bal.b - bal.b div 10 + r.rev_c
        |  FROM bal JOIN rrs_gap r ON r.mi = bal.mi + 1
        |)
        |SELECT mi, b FROM bal WHERE mi >= 0 ORDER BY mi""".stripMargin)
    val fold = spark.table("rrs_gap")
      .agg(sort_array(collect_list(struct(col("mi"), col("rev_c")))).as("g"))
      .select(explode(expr(
        """aggregate(g,
          |  struct(CAST(-1 AS BIGINT) AS prev, CAST(0 AS BIGINT) AS b,
          |    CAST(array() AS ARRAY<STRUCT<mi: BIGINT, b: BIGINT>>) AS out),
          |  (acc, x) -> IF(x.mi = acc.prev + 1,
          |    named_struct('prev', x.mi,
          |      'b', acc.b - acc.b div 10 + x.rev_c,
          |      'out', array_append(acc.out, named_struct('mi', x.mi,
          |        'b', acc.b - acc.b div 10 + x.rev_c))),
          |    acc),
          |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col("r.mi").as("mi"), col("r.b").as("b"))
      .orderBy("mi")
    assert(rows(fold) === rows(cte))
    assert(fold.count() === 3)
  }
}
