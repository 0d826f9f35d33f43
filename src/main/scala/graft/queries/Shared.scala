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

/** Relations and exact-arithmetic fragments shared by many query shards
  * (moved verbatim from SparkEntry's "shared fragments" block).
  */
private[graft] object Shared {

  /** Stratified split over orders: class = o_custkey (sizes 1..25 at sf0.01
    * — exercises all four SP1 branches), file order = o_orderkey (unique;
    * lineitem lacks a unique natural key in this synthetic data, which would
    * make row_number tie-breaks engine-dependent).
    */
  private[graft] def splitDf(s: SparkSession, dir: String): DataFrame =
    StratifiedSplit.withSplit(Tables.orders(s, dir), "o_custkey", "o_orderkey")

  /** ESM-2 tokenization of part names (FIXTURES.md §A), max_length=32. */
  private[graft] def tokensDf(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey"),
      EsmTokenizer.tokenizeCol(upper(col("p_name")), 32).as("tokens"))

  private[graft] def centsOf(x: Column): Column = EventWindows.cents(x)

  /** Per-customer total spend (cents) restricted to two market segments,
    * `ga` = 1 for segment `a` — the shared two-sample relation under the
    * q574–q577 rank dispersion/location tests. One hash aggregation,
    * bounded by |customer|; the tests' global rank windows run over THIS
    * relation, never over raw orders (RankStats discipline).
    */
  private[graft] def twoSegSpend(s: SparkSession, dir: String, a: String, b: String): DataFrame = {
    val seg = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin(a, b))
      .select(col("c_custkey"), (col("c_mktsegment") === a).cast("long").as("ga"))
    Tables.orders(s, dir)
      .join(seg, col("o_custkey") === col("c_custkey"))
      .groupBy("o_custkey", "ga")
      .agg(sum(centsOf(col("o_totalprice"))).as("v"))
  }

  /** Complete (source × global-lang) count grid: `c1` = docs of lang in
    * source (0-filled where absent — divergences need the union support),
    * `n1` = source total, `c2` = global lang count, `ng` = corpus total.
    * Shared by the q579–q581 divergence panel; langs and sources are both
    * bounded dictionaries, so the grid is tiny and broadcast-built.
    */
  private[graft] def sourceLangGrid(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.documents(s, dir)
      .filter(col("lang").isNotNull && col("source").isNotNull)
      .groupBy("source", "lang").agg(count(lit(1)).as("c1raw"))
      .localCheckpoint(false)
    val ns = c.groupBy("source").agg(sum(col("c1raw")).as("n1"))
    val g = c.groupBy("lang").agg(sum(col("c1raw")).as("c2"))
    val ngv = c.agg(sum(col("c1raw")).as("ng"))
    ns.crossJoin(broadcast(g)).crossJoin(broadcast(ngv))
      .join(c, Seq("source", "lang"), "left")
      .select(col("source"), col("lang"),
        coalesce(col("c1raw"), lit(0L)).as("c1"),
        col("n1"), col("c2"), col("ng"))
  }

  /** Daily mean order value: one row per order day with x = days since
    * 1992-01-01 and y = integer-mean cents (sum div count — the MEAN, not
    * the total, so magnitudes stay SF-invariant and the q585/q586 SSR
    * decimals never overflow). Shared regression base for the
    * structural-break tests.
    */
  private[graft] def dailyMeanSpend(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderdate"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))" +
        " div count(1)").as("y"))
      .select(datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
        .cast("long").as("x"), col("y"))

  /** Per-group OLS sum-of-squared-residuals (whole cents², keeping the
    * SF-grown magnitudes inside BIGINT) from (g, x, y) rows:
    * SSR = (A·C − B²̃)/(C·n) with A = nΣy²−(Σy)², C = nΣx²−(Σx)²,
    * B = (nΣxy−ΣxΣy)² — the closed form that never materializes per-row
    * residuals; every sum decimal(38,0), numerator ≥ 0 by Cauchy–Schwarz
    * so div == //. Shared by q585 (Chow) and q586 (Goldfeld–Quandt).
    */
  private[graft] def olsSsrMilli(rows: DataFrame, g: Column): DataFrame =
    rows.groupBy(g.as("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec38)).as("sx"),
        sum(col("y").cast(dec38)).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .select(col("g"), col("n"),
        expr("CAST(((n * syy - sy * sy) * (n * sxx - sx * sx)" +
          " - (n * sxy - sx * sy) * (n * sxy - sx * sy))" +
          " div ((n * sxx - sx * sx) * n) AS BIGINT)").as("ssr"))

  /** Undirected nation-pair trade revenue (a < b, cents): ONE
    * lineitem⋈orders pass with broadcast supplier/customer dims — the
    * shared graph base under q590/q601/q603. Output bounded by |nation|².
    */
  private[graft] def nationTradeRev(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, dir)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .select(least(col("s_nationkey"), col("c_nationkey")).as("a"),
        greatest(col("s_nationkey"), col("c_nationkey")).as("b"),
        centsOf(col("l_extendedprice")).as("w"))
      .groupBy("a", "b").agg(sum(col("w")).as("w"))

  /** Above-mean edge set of [[nationTradeRev]], doubled to both
    * directions — the thinned undirected adjacency q590/q601 walk.
    */
  private[graft] def nationTradeEdges(s: SparkSession, dir: String): DataFrame = {
    val rev = nationTradeRev(s, dir).localCheckpoint(false)
    val tot = rev.agg(sum(col("w").cast(dec38)).as("tw"),
      count(lit(1)).as("np"))
    val e0 = rev.crossJoin(broadcast(tot))
      .filter(expr("CAST(w AS DECIMAL(38,0)) * np > tw"))
      .select("a", "b").localCheckpoint(false)
    e0.union(e0.select(col("b").as("a"), col("a").as("b")))
  }

  /** Wilcoxon rank-sum z² in milli from (n_a, n_b, nn, w_a) — the exact
    * rational 3000·(2W − n_a(N+1))² / (n_a·n_b·(N+1)); numerator is a
    * square so Spark `div` and DuckDB `//` agree. Shared by q574/q576.
    */
  private[graft] val wilcoxonZsqMilli: String =
    // exact decimal SUMS feed one final double ratio in literal-identical
    // op order on both engines (q577's discipline). An all-integer
    // rational is impossible at scale: the numerator is O(nn⁴), past
    // decimal(38)/HUGEINT on a ~1e10-row two-sample relation, while the
    // one-row double ratio is deterministic and loses < 1 milli
    "CAST(round(3000 * (2 * CAST(w_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (nn + 1))" +
      " * (2 * CAST(w_a AS DOUBLE) - CAST(n_a AS DOUBLE) * (nn + 1))" +
      " / (CAST(n_a AS DOUBLE) * n_b * (nn + 1))) AS BIGINT)"

  /** Ansari–Bradley z² in milli from (n_a, n_b, nn, a_sum) — exact
    * even/odd moment branches (scipy's closed forms made integral by the
    * doubled-numerator trick). Shared by q575/q576.
    */
  private[graft] val abZsqMilli: String =
    // same decimal-sums + double-final-ratio shape as [[wilcoxonZsqMilli]]
    "CASE WHEN nn % 2 = 0 THEN CAST(round(" +
      "3000 * (nn - 1)" +
      " * (4 * CAST(a_sum AS DOUBLE) - CAST(n_a AS DOUBLE) * (nn + 2))" +
      " * (4 * CAST(a_sum AS DOUBLE) - CAST(n_a AS DOUBLE) * (nn + 2))" +
      " / (CAST(n_a AS DOUBLE) * n_b * (nn + 2) * (nn - 2))) AS BIGINT)" +
      " ELSE CAST(round(3000" +
      " * (4 * CAST(nn AS DOUBLE) * a_sum - CAST(n_a AS DOUBLE) * (nn + 1) * (nn + 1))" +
      " * (4 * CAST(nn AS DOUBLE) * a_sum - CAST(n_a AS DOUBLE) * (nn + 1) * (nn + 1))" +
      " / (CAST(n_a AS DOUBLE) * n_b * (nn + 1) * (CAST(nn AS DOUBLE) * nn + 3))) AS BIGINT) END"

  private[graft] def hllAlphaM2Scaled: Double = OracleShared.hllAlphaM2Scaled

  /** Exact-integer accumulator type (≡ DuckDB HUGEINT) for the
    * order-independent stddev/corr/norm algebra.
    */
  private[graft] val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)

}
