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
private[graft] object Shard09 {
  val defs: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

    // ε-differential-privacy Laplace mechanism on per-source counts,
    // deterministically replayed: uniform u from the 48-bit md5 grid,
    // noise = −(1/ε)·sgn(u−½)·ln(1−2|u−½|) in exact micro-nat algebra
    // (the inverse-CDF identity; one ln per cell, zero-argument guarded),
    // swept over ε ∈ {0.1, 1, 10} — the "how much utility does each
    // privacy budget cost" readout completing the q219/q281/q421
    // anonymity suite
    "q514_dp_noise" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(Seq(100L, 1000L, 10000L).toDF("eps_milli")))
        .withColumn("u48", Dedup.md5Long(concat(lit("dp#"), col("source"),
          lit("#"), col("eps_milli")), 12))
        .withColumn("lnm", expr(
          "CAST(round(ln(CAST(greatest(281474976710656 - abs(2 * u48" +
            " - 281474976710656), 1) AS DOUBLE) / 281474976710656e0)" +
            " * 1000000) AS BIGINT)"))
        .withColumn("noise_milli", expr(
          "-(CASE WHEN u48 >= 140737488355328 THEN 1 ELSE -1 END)" +
            " * lnm div eps_milli"))
        .select(col("source"), col("eps_milli"), col("n"), col("noise_milli"),
          expr("n * 1000 + noise_milli").as("noisy_milli"),
          abs(col("noise_milli")).as("abs_err_milli"))
        .orderBy("source", "eps_milli")
    }),

    // Burrows' Delta stylometry between sources: z-scores of the top-20
    // corpus words' per-source frequencies (ppm), Δ(a,b) = mean |z_a−z_b|
    // — the authorship-attribution distance; close pairs are "same
    // boilerplate generator" candidates BEFORE any doc-level dedup
    // fires. The zero cells materialize (a source MISSING a common word
    // is signal); z via the cross-multiplied integer form with an exact
    // isqrt, every relation bounded by sources × 20 words
    "q515_burrows_delta" -> ((s, dir) => {
      val wc = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val ns = wc.groupBy("source").agg(sum(col("c")).as("ntok"))
      val top = wc.groupBy("w").agg(sum(col("c")).as("ct"))
        .orderBy(col("ct").desc, col("w")).limit(20).select("w")
      val grid = ns.crossJoin(broadcast(top))
        .join(wc, Seq("source", "w"), "left")
        .select(col("source"), col("w"),
          expr("coalesce(c, 0) * 1000000 div ntok").as("f"))
        .localCheckpoint(false)
      val st = grid.groupBy("w")
        .agg(count(lit(1)).as("sct"), sum(col("f")).as("sf"),
          sum(expr("f * f")).as("sff"))
        .withColumn("vn", expr("sct * sff - sf * sf"))
        .withColumn("t0", floor(sqrt(col("vn").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + vn div t0) div 2 ELSE 0 END"))
        .withColumn("sd", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= vn THEN t1 + 1" +
            " WHEN t1 * t1 > vn THEN t1 - 1 ELSE t1 END"))
      val z = grid.join(broadcast(st.select("w", "sct", "sf", "sd")), "w")
        .select(col("source"), col("w"),
          expr("CASE WHEN sd > 0 THEN (sct * f - sf) * 1000 div sd" +
            " ELSE 0 END").as("z_milli"))
      z.select(col("source").as("source_a"), col("w"), col("z_milli").as("za"))
        .join(z.select(col("source").as("source_b"), col("w"),
          col("z_milli").as("zb")), "w")
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(sum(abs(col("za") - col("zb"))).as("sabs"))
        .select(col("source_a"), col("source_b"),
          expr("sabs div 20").as("delta_milli"))
        .orderBy(col("delta_milli"), col("source_a"), col("source_b"))
        .limit(5)
    }),

    // UMass topic coherence of each source's top-5 terms: Σ_{i<j}
    // ln((D(wᵢ,wⱼ)+1)/D(wⱼ)) over rank-ordered pairs — the standard "is
    // this word cluster actually a topic" score (near 0 = the terms
    // co-occur; very negative = the "topic" is an artifact). Doc
    // co-occurrence counted only for the ≤|vocab| top words (semi-gated
    // distinct postings), pairs bounded at 10 per source
    "q516_topic_coherence" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .localCheckpoint(false)
      val topw = docs.groupBy("source", "w").agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(Window.partitionBy("source")
          .orderBy(col("c").desc, col("w"))).cast("long"))
        .filter(col("rk") <= 5).select("source", "w", "rk")
        .localCheckpoint(false)
      val dwt = docs.select("doc_id", "w").distinct()
        .join(topw.select("w").distinct(), Seq("w"), "left_semi")
        .localCheckpoint(false)
      val df = dwt.groupBy("w").agg(count(lit(1)).as("dfw"))
      val co = dwt.select(col("doc_id"), col("w").as("wa"))
        .join(dwt.select(col("doc_id"), col("w").as("wb")), "doc_id")
        .filter(col("wa") =!= col("wb"))
        .groupBy("wa", "wb").agg(count(lit(1)).as("cod"))
      topw.select(col("source"), col("w").as("wa"), col("rk").as("ra"))
        .join(topw.select(col("source"), col("w").as("wb"), col("rk").as("rb")),
          "source")
        .filter(col("ra") < col("rb"))
        .join(co, Seq("wa", "wb"), "left")
        .join(broadcast(df.select(col("w").as("wb"), col("dfw"))), "wb")
        .select(col("source"),
          expr("CAST(round(ln(CAST(coalesce(cod, 0) + 1 AS DOUBLE) / dfw)" +
            " * 1000000) AS BIGINT)").as("t6"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_pairs"), sum(col("t6")).as("coherence_micro"))
        .orderBy("source")
    }),

    // Grubbs' max-normed-residual outlier test on customer balances:
    // G = max|x−x̄|/s — "is the single most extreme balance more extreme
    // than n draws should produce" (the per-point verdict q85's MAD
    // flags and q238's ensemble only rank). Cross-multiplied integer
    // form: G² in milli² as one decimal division, G via the isqrt
    // discipline; the argmax row is a TakeOrdered, never a sort
    "q517_grubbs_test" -> ((s, dir) => {
      val x = Tables.customer(s, dir)
        .select(col("c_custkey"), centsOf(col("c_acctbal")).as("x"))
        .localCheckpoint(false)
      val stats = x.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
      val out = x.crossJoin(broadcast(stats))
        .select(col("c_custkey"), col("x"), col("n"), col("sx"), col("sxx"),
          abs(expr("n * x - sx")).as("num"))
        .orderBy(col("num").desc, col("c_custkey")).limit(1)
      out.select(col("n").as("n_customers"),
          col("c_custkey").as("outlier_custkey"), col("x").as("outlier_cents"),
          expr("CAST(num AS DECIMAL(38,0)) * num * 1000000 * (n - 1)" +
            " div (CAST(n AS DECIMAL(38,0))" +
            " * (CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx))").as("g2"))
        .withColumn("t0", floor(sqrt(col("g2").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + g2 div t0) div 2 ELSE 0 END"))
        .withColumn("g_milli", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= g2 THEN t1 + 1" +
            " WHEN t1 * t1 > g2 THEN t1 - 1 ELSE t1 END"))
        .select("n_customers", "outlier_custkey", "outlier_cents", "g_milli")
    }),

    // two-sample log-rank test (AUTOMOBILE vs HOUSEHOLD customer
    // "lifetimes" = first-to-last-order spans): at each distinct event
    // time, observed group-1 deaths vs the risk-set expectation
    // d·n₁/n, hypergeometric variance summed the same way — THE
    // survival-curve comparison test behind q284's single-group KM
    // curve. Risk sets as reverse-cumulative windows on the bounded
    // distinct-time relation; E and V quantized to micro before summing
    "q518_logrank_test" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
        .select(col("c_custkey"),
          (col("c_mktsegment") === "AUTOMOBILE").cast("long").as("g1"))
      val life = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .groupBy("o_custkey", "g1")
        .agg(datediff(max(col("o_orderdate")), min(col("o_orderdate"))).as("t"))
      val et = life.groupBy("t")
        .agg(sum(col("g1")).as("d1"), count(lit(1)).as("d"))
        .localCheckpoint(false)
      val after = Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val risk = et
        .withColumn("n1t", sum(col("d1")).over(after))
        .withColumn("nt", sum(col("d")).over(after))
      risk
        .select(col("d1"), col("d"), col("n1t"), col("nt"),
          expr("d * n1t * 1000000 div nt").as("e1_micro"),
          expr("CASE WHEN nt > 1 THEN CAST(d AS DECIMAL(38,0)) * n1t" +
            " * (nt - n1t) * (nt - d) * 1000000" +
            " div (CAST(nt AS DECIMAL(38,0)) * nt * (nt - 1))" +
            " ELSE 0 END").as("v_micro"))
        .agg(sum(col("d1")).as("o1"), sum(expr("d - d1")).as("o2"),
          sum(col("e1_micro")).as("e1_micro_total"),
          sum(col("v_micro")).as("v_micro_total"))
        .select(col("o1"), col("o2"), col("e1_micro_total"),
          col("v_micro_total"),
          expr("CAST((CAST(o1 AS DECIMAL(38,0)) * 1000000 - e1_micro_total)" +
            " * (CAST(o1 AS DECIMAL(38,0)) * 1000000 - e1_micro_total)" +
            " div (v_micro_total * 1000000) AS BIGINT)").as("chi2_micro"))
    }),

    // Jonckheere–Terpstra ordered-alternative test: do prices trend
    // MONOTONICALLY with the priority ordinal (1-URGENT … 5-LOW) — the
    // sharper cousin of q494's any-difference H when the alternative is
    // ordered. 2·JT = Σ_{g<h} Σ_v n_hv·(2·cb_g(v) + n_gv) computed in
    // ONE window pass over the distinct-value relation with the five
    // priority counts as pinned columns; normalized against the exact
    // pair total (500000 ppm ≡ no trend)
    "q519_jonckheere" -> ((s, dir) => {
      val vg = Tables.orders(s, dir)
        .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g"),
          centsOf(col("o_totalprice")).as("v"))
        .groupBy("v")
        .agg(sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1"),
          (2 to 5).map(g =>
            sum(when(col("g") === g, 1L).otherwise(0L)).as(s"n$g")): _*)
      val before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val cum = vg.select(col("v") +: (1 to 5).flatMap(g => Seq(
        col(s"n$g"),
        coalesce(sum(col(s"n$g")).over(before), lit(0L)).as(s"cb$g"))): _*)
      val pairTerms = (for (g <- 1 to 4; h <- (g + 1) to 5)
        yield s"n$h * (2 * cb$g + n$g)").mkString(" + ")
      cum.agg(sum(expr(pairTerms)).as("jt2"),
          (1 to 5).map(g => sum(col(s"n$g")).as(s"t$g")): _*)
        .select(col("jt2"),
          expr((for (g <- 1 to 4; h <- (g + 1) to 5)
            yield s"t$g * t$h").mkString("(", " + ", ") * 2")).as("jt2_max"))
        .select(col("jt2"), col("jt2_max"),
          expr("jt2 * 1000000 div jt2_max").as("jt_ppm"))
    }),

    // temperature-flattened mixture sweep: source sampling shares
    // ∝ (n_s/N)^(1/T) for T ∈ {1, 2, 4} — the "how much does each
    // temperature actually flatten the mix" readout behind q68's single-
    // temperature resampler and q99's weights. One ln + one exp per
    // (source, T), both quantized at the call (micro-nat convention);
    // the effective-source-count is the integer participation ratio of
    // the quantized weights — no further libm calls
    "q520_temperature_sweep" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).groupBy("source")
        .agg(count(lit(1)).as("ns"))
        .crossJoin(broadcast(Tables.documents(s, dir)
          .agg(count(lit(1)).as("nt"))))
        .crossJoin(broadcast(Seq(1L, 2L, 4L).toDF("t")))
        .select(col("t"),
          expr("CAST(round(exp(CAST(CAST(round(ln(CAST(ns AS DOUBLE) / nt)" +
            " * 1000000) AS BIGINT) div t AS DOUBLE) / 1000000) * 1000000)" +
            " AS BIGINT)").as("w"))
        .groupBy("t")
        .agg(count(lit(1)).as("n_sources"), sum(col("w")).as("sw"),
          sum(expr("w * w")).as("sww"), max(col("w")).as("wmax"))
        .select(col("t"), col("n_sources"),
          expr("1000 * CAST(sw AS DECIMAL(38,0)) * sw div sww")
            .as("n_eff_milli"),
          expr("wmax * 1000000 div sw").as("top_share_ppm"))
        .orderBy("t")
    }),

    // Friedman test + Kendall's W across the five priorities, blocked by
    // month: within every month the priorities are RANKED by revenue
    // (blocking removes the month-to-month level shifts q448's raw ANOVA
    // absorbs into noise), χ²_F from the rank sums, W = χ²/(n(k−1)) the
    // agreement strength. The month×priority grid zero-fills absent
    // cells (pinned); ranks are per-block row_numbers tie-broken by the
    // priority ordinal
    "q521_friedman_w" -> ((s, dir) => {
      import s.implicits._
      val mp = Tables.orders(s, dir)
        .select(expr("date_trunc('month', o_orderdate)").as("m"),
          expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g"),
          centsOf(col("o_totalprice")).as("c"))
        .groupBy("m", "g").agg(sum(col("c")).as("rev"))
      val grid = mp.select("m").distinct()
        .crossJoin(broadcast((1L to 5L).toDF("g")))
        .join(mp, Seq("m", "g"), "left")
        .select(col("m"), col("g"), coalesce(col("rev"), lit(0L)).as("rev"))
      val rk = grid.withColumn("r", row_number().over(Window.partitionBy("m")
        .orderBy(col("rev").desc, col("g"))).cast("long"))
      rk.groupBy("g").agg(sum(col("r")).as("rg"),
          count(lit(1)).as("n"))
        .agg(max(col("n")).as("n_blocks"),
          sum(expr("rg * rg")).as("srr"))
        .select(col("n_blocks"),
          expr("12 * srr * 1000000 div (n_blocks * 5 * 6)" +
            " - 3 * n_blocks * 6 * 1000000").as("chi2_micro"))
        .withColumn("w_ppm", expr("chi2_micro div (n_blocks * 4)"))
    }),

    // upper-tail dependence λ_U(q) = P(quantity exceeds its q-quantile |
    // price exceeds its q-quantile) at q ∈ {0.90, 0.95, 0.99} — do the
    // two order dimensions go extreme TOGETHER (λ→share of exceeders)
    // or independently (λ→1−q)? Pure rank arithmetic: both margins
    // ranked once, exceedance = rank > ⌊N·q⌋, no quantile VALUES ever
    // extracted — the copula-style readout q54's global corr can't see
    "q522_tail_dependence" -> ((s, dir) => {
      import s.implicits._
      val qty = Tables.lineitem(s, dir).groupBy("l_orderkey")
        .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("y"))
      val xy = Tables.orders(s, dir)
        .join(qty, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey").as("k"), centsOf(col("o_totalprice")).as("x"),
          col("y"))
        .withColumn("rx", row_number().over(
          Window.orderBy(col("x"), col("k"))).cast("long"))
        .withColumn("ry", row_number().over(
          Window.orderBy(col("y"), col("k"))).cast("long"))
        .crossJoin(broadcast(Seq(900L, 950L, 990L).toDF("q_mille")))
        .localCheckpoint(false)
      xy.withColumn("n", count(lit(1)).over(
          Window.partitionBy("q_mille")))
        .withColumn("kq", expr("n * q_mille div 1000"))
        .groupBy("q_mille")
        .agg(max(col("n")).as("n_orders"),
          sum(when(col("rx") > col("kq"), 1L).otherwise(0L)).as("n_exceed_x"),
          sum(when(col("rx") > col("kq") && col("ry") > col("kq"), 1L)
            .otherwise(0L)).as("n_joint"))
        .withColumn("lambda_ppm",
          expr("n_joint * 1000000 div n_exceed_x"))
        .orderBy("q_mille")
    }),

    // linearly-weighted Cohen's kappa between the two automated quality
    // "raters" (n_chars quintile vs word-count quintile): off-by-one
    // disagreements cost 1/4, opposite-corner ones cost 1 — the ordinal
    // agreement q420's unweighted kappa throws away. κ_w = 1 −
    // N·Σw·O / Σᵢⱼ w·rᵢ·cⱼ in exact integers on the bounded 5×5
    // confusion + margins
    "q523_weighted_kappa" -> ((s, dir) => {
      val base = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars"),
          size(filter(split(col("text"), " ", -1), x => length(x) > 0))
            .cast("long").as("nw"))
        .withColumn("ra", ntile(5).over(
          Window.orderBy(col("n_chars"), col("doc_id"))).cast("long"))
        .withColumn("rb", ntile(5).over(
          Window.orderBy(col("nw"), col("doc_id"))).cast("long"))
        .localCheckpoint(false)
      val conf = base.groupBy("ra", "rb").agg(count(lit(1)).as("o"))
      val num = conf.agg(sum(expr("abs(ra - rb) * o")).as("wo"),
        sum(col("o")).as("n"))
      val ri = base.groupBy("ra").agg(count(lit(1)).as("r_i"))
      val cj = base.groupBy("rb").agg(count(lit(1)).as("c_j"))
      val den = ri.crossJoin(broadcast(cj))
        .agg(sum(expr("abs(ra - rb) * r_i * c_j")).as("wrc"))
      num.crossJoin(broadcast(den))
        .select(col("n").as("n_docs"), col("wo").as("weighted_disagreement"),
          expr("1000000 - CAST(n AS DECIMAL(38,0)) * wo * 1000000 div wrc")
            .as("kappa_w_ppm"))
    }),

    // Wilcoxon signed-rank test on paired 1997→1998 customer revenue —
    // q492's sign test upgraded with magnitude ranks (same pairs, more
    // power): |d| ranked via the value-grouped doubled-rank identity,
    // W⁺ from the positive-sign counts per tied block, tie-corrected
    // variance, z via the isqrt discipline on the cross-multiplied form
    // 3·num²/var48 — every step exact integers
    "q524_wilcoxon_signed_rank" -> ((s, dir) => {
      val per = Tables.orders(s, dir)
        .filter(expr("year(o_orderdate) IN (1997, 1998)"))
        .groupBy("o_custkey")
        .agg(sum(when(expr("year(o_orderdate) = 1997"),
          centsOf(col("o_totalprice"))).otherwise(0L)).as("r97"),
          sum(when(expr("year(o_orderdate) = 1998"),
            centsOf(col("o_totalprice"))).otherwise(0L)).as("r98"))
        .filter(col("r97") > 0 && col("r98") > 0 && col("r97") =!= col("r98"))
        .select((col("r98") - col("r97")).as("d"))
      val before = Window.orderBy("a").rowsBetween(Window.unboundedPreceding, -1)
      per.select(abs(col("d")).as("a"), (col("d") > 0).cast("long").as("p"))
        .groupBy("a")
        .agg(count(lit(1)).as("cnt"), sum(col("p")).as("pos"))
        .withColumn("cb", coalesce(sum(col("cnt")).over(before), lit(0L)))
        .agg(sum(expr("pos * (2 * cb + cnt + 1)")).as("w2"),
          sum(col("cnt")).as("n"),
          sum(expr("cnt * cnt * cnt - cnt")).as("ties"))
        .select(col("n").as("n_pairs"), col("w2").as("w2_plus"),
          expr("2 * w2 - n * (n + 1)").as("num4"),
          expr("2 * CAST(n AS DECIMAL(38,0)) * (n + 1) * (2 * n + 1) - ties")
            .as("var48"))
        .withColumn("z2", expr(
          "3 * CAST(num4 AS DECIMAL(38,0)) * num4 * 1000000 div var48"))
        .withColumn("t0", floor(sqrt(col("z2").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + z2 div t0) div 2 ELSE 0 END"))
        .select(col("n_pairs"), col("w2_plus"),
          expr("(CASE WHEN num4 >= 0 THEN 1 ELSE -1 END)" +
            " * (CASE WHEN (t1 + 1) * (t1 + 1) <= z2 THEN t1 + 1" +
            " WHEN t1 * t1 > z2 THEN t1 - 1 ELSE t1 END)").as("z_milli"))
    }),

    // Page's L trend test on the q521 month-blocked priority ranks: is
    // revenue rank MONOTONE in the priority ordinal across blocks (the
    // ordered alternative Friedman's any-difference χ² dilutes)? For
    // k=5 the variance collapses to exactly 25n, so z = (L−45n)/(5√n)
    // — integer algebra + one isqrt on n·10⁶
    "q525_page_trend" -> ((s, dir) => {
      import s.implicits._
      val mp = Tables.orders(s, dir)
        .select(expr("date_trunc('month', o_orderdate)").as("m"),
          expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g"),
          centsOf(col("o_totalprice")).as("c"))
        .groupBy("m", "g").agg(sum(col("c")).as("rev"))
      val rk = mp.select("m").distinct()
        .crossJoin(broadcast((1L to 5L).toDF("g")))
        .join(mp, Seq("m", "g"), "left")
        .select(col("m"), col("g"), coalesce(col("rev"), lit(0L)).as("rev"))
        .withColumn("r", row_number().over(Window.partitionBy("m")
          .orderBy(col("rev").desc, col("g"))).cast("long"))
      rk.groupBy("g").agg(sum(col("r")).as("rg"), count(lit(1)).as("n"))
        .agg(max(col("n")).as("n_blocks"), sum(expr("g * rg")).as("l_stat"))
        .withColumn("nq", expr("n_blocks * 1000000"))
        .withColumn("t0", floor(sqrt(col("nq").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + nq div t0) div 2 ELSE 0 END"))
        .withColumn("rtn", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= nq THEN t1 + 1" +
            " WHEN t1 * t1 > nq THEN t1 - 1 ELSE t1 END"))
        .select(col("n_blocks"), col("l_stat"),
          expr("(l_stat - 45 * n_blocks) * 1000000 div (5 * rtn)")
            .as("z_milli"))
    }),

    // Cochran–Armitage trend-in-proportions: does the RETURN RATE trend
    // monotonically with priority (scores 1..5) — the binary-outcome
    // sibling of q519's rank trend, sharper than q119-style independence
    // when the alternative is ordered. Exact integer cross-multiplied
    // z², one isqrt; the per-order return flag is one max() over the
    // lineitem join, aggregated once
    "q526_cochran_armitage" -> ((s, dir) => {
      val ret = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("rf"))
      val g = Tables.orders(s, dir)
        .join(ret, col("o_orderkey") === col("l_orderkey"))
        .groupBy(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("w"))
        .agg(count(lit(1)).as("ng"), sum(col("rf")).as("rg"))
      g.agg(sum(col("ng")).as("n"), sum(col("rg")).as("r"),
          sum(expr("w * rg")).as("swr"), sum(expr("w * ng")).as("swn"),
          sum(expr("w * w * ng")).as("swwn"))
        .select(col("n").as("n_orders"), col("r").as("n_returned"),
          expr("CAST(n AS DECIMAL(38,0)) * swr - CAST(r AS DECIMAL(38,0)) * swn")
            .as("tnum"),
          expr("CAST(r AS DECIMAL(38,0)) * (n - r)" +
            " * (CAST(n AS DECIMAL(38,0)) * swwn" +
            " - CAST(swn AS DECIMAL(38,0)) * swn)").as("tden"))
        .withColumn("z2", expr(
          "CAST(tnum AS DECIMAL(38,0)) * tnum * n_orders * 1000000 div tden"))
        .withColumn("t0", floor(sqrt(col("z2").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + z2 div t0) div 2 ELSE 0 END"))
        .select(col("n_orders"), col("n_returned"),
          expr("(CASE WHEN tnum >= 0 THEN 1 ELSE -1 END)" +
            " * (CASE WHEN (t1 + 1) * (t1 + 1) <= z2 THEN t1 + 1" +
            " WHEN t1 * t1 > z2 THEN t1 - 1 ELSE t1 END)").as("z_milli"))
    }),

    // Jarque–Bera normality test on order prices: skewness + excess
    // kurtosis from the EXACT central-moment identities (M2/M3/M4 as
    // pure integer polynomials in the power sums — prices rescaled to
    // hundreds-of-dollars so n³·Σx⁴ stays inside decimal38), the two shape
    // stats quantized to milli through one sqrt-only double formula
    // each, and JB reassembled from the quantized pair in integers
    "q527_jarque_bera" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT) div 10000")
          .as("x"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("s2"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x * x")).as("s3"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x * x * x")).as("s4"))
        .select(col("n"),
          expr("CAST(n AS DECIMAL(38,0)) * s2" +
            " - CAST(s1 AS DECIMAL(38,0)) * s1").as("m2"),
          expr("CAST(n AS DECIMAL(38,0)) * n * s3" +
            " - 3 * CAST(n AS DECIMAL(38,0)) * s1 * s2" +
            " + 2 * CAST(s1 AS DECIMAL(38,0)) * s1 * s1").as("m3"),
          expr("CAST(n AS DECIMAL(38,0)) * n * n * s4" +
            " - 4 * CAST(n AS DECIMAL(38,0)) * n * s1 * s3" +
            " + 6 * CAST(n AS DECIMAL(38,0)) * s1 * s1 * s2" +
            " - 3 * CAST(s1 AS DECIMAL(38,0)) * s1 * s1 * s1").as("m4"))
        .select(col("n").as("n_orders"),
          expr("CAST(round(CAST(m3 AS DOUBLE)" +
            " / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE))) * 1000)" +
            " AS BIGINT)").as("skew_milli"),
          expr("CAST(round((CAST(m4 AS DOUBLE)" +
            " / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) - 3) * 1000)" +
            " AS BIGINT)").as("kurt_excess_milli"))
        .withColumn("jb_milli", expr(
          "(4 * n_orders * skew_milli * skew_milli" +
            " + n_orders * kurt_excess_milli * kurt_excess_milli)" +
            " div 24000"))),

    // best-of-n selection value: the expected MAX quality (n_chars) of
    // n md5-uniform draws, n ∈ {1,2,4,8} — how much quality does each
    // doubling of the candidate pool buy (the data-curation twin of
    // RLHF's best-of-n readout). CLOSED FORM from the empirical CDF:
    // E[max] = Σ_q q·(F_qⁿ − F_{q−}ⁿ)/Nⁿ — exact integer powers on the
    // bounded distinct-quality relation, no sampling at all
    "q528_best_of_n" -> ((s, dir) => {
      val before = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("n_chars").as("q"))
        .groupBy("q").agg(count(lit(1)).as("cnt"))
        .withColumn("fp", coalesce(sum(col("cnt")).over(before), lit(0L)))
        .withColumn("f", expr("fp + cnt"))
        .withColumn("nn", sum(col("cnt")).over(Window.partitionBy()))
        // CDF on a 1e4 grid: raw F^8 is O(nn⁸) — past decimal(38)/HUGEINT
        // already at ~56k docs — while G^8 ≤ 1e32 always fits. The grid
        // costs ≤ ~1e-3 relative error on the readout (telescoping keeps
        // Σ q·(G^k − Gp^k) ≤ q_max·1e4ᵏ exactly), and the oracle replays
        // the identical quantization, so the hash gate stays exact
        .withColumn("g", expr("10000 * CAST(f AS DECIMAL(38,0)) div nn"))
        .withColumn("gp", expr("10000 * CAST(fp AS DECIMAL(38,0)) div nn"))
        .agg(max(col("nn")).as("nn"),
          sum(expr("q * cnt")).as("e1n"),
          sum(expr("q * (CAST(g AS DECIMAL(38,0)) * g" +
            " - CAST(gp AS DECIMAL(38,0)) * gp)")).as("e2n"),
          sum(expr("q * (CAST(g AS DECIMAL(38,0)) * g * g * g" +
            " - CAST(gp AS DECIMAL(38,0)) * gp * gp * gp)")).as("e4n"),
          sum(expr("q * (CAST(g AS DECIMAL(38,0)) * g * g * g * g * g * g * g" +
            " - CAST(gp AS DECIMAL(38,0)) * gp * gp * gp * gp * gp * gp * gp)"))
            .as("e8n"))
        .selectExpr(
          "stack(4," +
            " 1L, CAST(1000 * CAST(e1n AS DECIMAL(38,0)) div nn AS BIGINT)," +
            " 2L, CAST(1000 * e2n div CAST(100000000 AS DECIMAL(38,0)) AS BIGINT)," +
            " 4L, CAST(1000 * e4n div CAST(10000000000000000 AS DECIMAL(38,0))" +
            " AS BIGINT)," +
            // 1e32 in two stages so 1000·e8n never has to exist as one
            // decimal(38) value at a large q_max
            " 8L, CAST(1000 * (e8n div CAST(100000000000000000000 AS DECIMAL(38,0)))" +
            " div 1000000000000 AS BIGINT)) AS (n_draws, e_max_milli)")
        .orderBy("n_draws")
    }),

    // exact M/D/1-style queueing delay per event type WITHOUT a
    // sequential scan: Lindley's recursion W_i = max(0, W_{i−1}+s−gap)
    // unrolls to W_i = max(0, c_i − min_{j<i} c_j) with c_j = j·s − t_j
    // — ONE running-min window computes every event's queueing delay.
    // Service time s is pinned at 80% of the type's mean interarrival
    // (utilization 0.8), so the readout is "how bursty is this stream
    // relative to its own rate" — all exact integer microseconds
    "q529_queueing_delay" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy(col("us"), col("event_id"))
      val e = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("i", row_number().over(w).cast("long"))
      val svc = e.groupBy("event_type")
        .agg(expr("((max(us) - min(us)) * 4 div 5) div count(1)").as("svc"))
      val runMin = Window.partitionBy("event_type").orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
      e.join(broadcast(svc), "event_type")
        .withColumn("c", expr("i * svc - us"))
        .withColumn("cmin", min(col("c")).over(runMin))
        .withColumn("wdelay", greatest(lit(0L),
          expr("c - coalesce(cmin, c)")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), max(col("svc")).as("svc_us"),
          expr("sum(wdelay) div count(1)").as("mean_delay_us"),
          max(col("wdelay")).as("max_delay_us"),
          expr("sum(CASE WHEN wdelay > 0 THEN 1 ELSE 0 END) * 1000000" +
            " div count(1)").as("wait_share_ppm"))
        .orderBy("event_type")
    }),

    // optimizer-stats quality audit: 16-bucket equi-WIDTH vs equi-DEPTH
    // histograms on order price, scored by their range-cardinality
    // estimates against the exact counts on five pinned ranges — the
    // "which histogram should the planner keep" readout behind q345's
    // construction. Uniform-within-bucket interpolation pinned as
    // integer division; every relation after the scan is ≤ 16 rows
    "q530_histogram_error" -> ((s, dir) => {
      import s.implicits._
      val x = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), centsOf(col("o_totalprice")).as("x"))
        .localCheckpoint(false)
      val mm = broadcast(x.agg(min(col("x")).as("mn"),
        (max(col("x")) - min(col("x")) + 1).as("span"), count(lit(1)).as("n")))
      val ranges = broadcast(Seq((10L, 35L), (20L, 60L), (50L, 55L),
        (80L, 99L), (0L, 50L)).toDF("a", "b"))
      val xr = x.crossJoin(mm)
        .select(col("x"), col("mn"), col("span"), col("n"),
          expr("(x - mn) * 16 div span").as("wb"),
          row_number().over(Window.orderBy(col("x"), col("k"))).cast("long")
            .as("rk"))
        .withColumn("db", expr("(rk - 1) * 16 div n"))
        .localCheckpoint(false)
      val exact = xr.crossJoin(ranges)
        .groupBy("a", "b")
        .agg(sum(when(col("x") >= expr("mn + span * a div 100") &&
          col("x") < expr("mn + span * b div 100"), 1L).otherwise(0L))
          .as("n_exact"))
      val wbuck = xr.groupBy("wb", "mn", "span").agg(count(lit(1)).as("cnt"))
        .select(col("cnt"), expr("mn + span * wb div 16").as("lo"),
          expr("mn + span * (wb + 1) div 16").as("hi"))
      val dbuck = xr.groupBy("db").agg(count(lit(1)).as("cnt"),
        min(col("x")).as("lo"), (max(col("x")) + 1).as("hi"))
      def est(buck: DataFrame, name: String): DataFrame = buck
        .crossJoin(ranges).crossJoin(mm)
        .select(col("a"), col("b"), col("cnt"), col("lo"), col("hi"),
          expr("greatest(0, least(hi, mn + span * b div 100)" +
            " - greatest(lo, mn + span * a div 100))").as("ov"))
        .groupBy("a", "b")
        .agg(sum(expr("cnt * ov div greatest(hi - lo, 1)")).as(name))
      exact.join(est(wbuck, "est_width"), Seq("a", "b"))
        .join(est(dbuck, "est_depth"), Seq("a", "b"))
        .select(col("a").as("range_lo_pct"), col("b").as("range_hi_pct"),
          col("n_exact"), col("est_width"), col("est_depth"),
          expr("abs(est_width - n_exact) * 1000000" +
            " div greatest(n_exact, 1)").as("err_width_ppm"),
          expr("abs(est_depth - n_exact) * 1000000" +
            " div greatest(n_exact, 1)").as("err_depth_ppm"))
        .orderBy("range_lo_pct", "range_hi_pct")
    }),

    // learned-index error bound: OLS of rank on key (price cents) in
    // exact cross-multiplied integers — ε = max |true rank − linear
    // prediction| is the binary-search window a learned index needs
    // (the recursive-model-index readout); mean |error| says how tight
    // the typical probe is. No division until the final scaled readouts
    "q531_learned_index" -> ((s, dir) => {
      val xr = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), centsOf(col("o_totalprice")).as("x"))
        .withColumn("y", row_number().over(
          Window.orderBy(col("x"), col("k"))).cast("long"))
        .localCheckpoint(false)
      val st = broadcast(xr.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
        .select(col("n"), col("sx"), col("sy"),
          expr("CAST(n AS DECIMAL(38,0)) * sxy" +
            " - CAST(sx AS DECIMAL(38,0)) * sy").as("bnum"),
          expr("CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx").as("d")))
      xr.crossJoin(st)
        .select(col("n"), col("bnum"), col("d"),
          expr("abs(CAST(n AS DECIMAL(38,0)) * d * y" +
            " - (d * sy + n * bnum * x - bnum * sx))").as("e"))
        .groupBy("n", "bnum", "d")
        .agg(max(col("e")).as("emax"), sum(col("e")).as("esum"))
        .select(col("n").as("n_keys"),
          expr("CAST(bnum * 1000000000 div d AS BIGINT)").as("slope_ppb"),
          expr("CAST(emax div (CAST(n AS DECIMAL(38,0)) * d) AS BIGINT)")
            .as("eps_rows"),
          expr("CAST(1000 * (esum div (CAST(n AS DECIMAL(38,0)) * d))" +
            " div n AS BIGINT)").as("mean_abs_err_milli"))
    }),

    // result-cache TTL tuning: a (user, event_type) re-request within
    // TTL is a cache hit — hit ratios for TTL ∈ {60 s, 10 min, 1 h}
    // from ONE lag pass over the per-user streams (the "what TTL buys
    // what hit rate" readout behind q324's debounce and q497's LRU
    // depth profile)
    "q532_cache_ttl" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .crossJoin(broadcast(Seq(60L, 600L, 3600L).toDF("ttl_s")))
        .groupBy("ttl_s")
        .agg(count(lit(1)).as("n_requests"),
          sum(when(col("gap").isNotNull, 1L).otherwise(0L)).as("n_repeats"),
          sum(when(col("gap") <= col("ttl_s") * 1000000L, 1L).otherwise(0L))
            .as("n_hits"))
        .withColumn("hit_ppm", expr("n_hits * 1000000 div n_requests"))
        .orderBy("ttl_s")
    }),

    // median-of-means robust mean of doc lengths: 16 md5 buckets, the
    // bucket-mean median (doubled-order-stat convention) and the
    // min/max-trimmed bucket mean vs the plain mean — the estimator
    // heavy-tail pipelines use when a single shard of garbage must not
    // move the metric; everything after the one scan is 16 rows
    "q533_median_of_means" -> ((s, dir) => {
      val b = Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy((Dedup.md5Long(concat(lit("mom#"),
          col("doc_id").cast("string")), 12) % 16).as("bkt"))
        .agg(count(lit(1)).as("nb"), sum(col("n_chars")).as("sb"))
        .select(expr("1000 * sb div nb").as("m_milli"), col("nb"), col("sb"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("m_milli"), col("nb"))).cast("long"))
      b.agg(sum(col("sb")).as("stot"), sum(col("nb")).as("ntot"),
          sum(when(col("rk") === 8, col("m_milli")).otherwise(0L)).as("m8"),
          sum(when(col("rk") === 9, col("m_milli")).otherwise(0L)).as("m9"),
          sum(col("m_milli")).as("msum"),
          max(col("m_milli")).as("mmax"), min(col("m_milli")).as("mmin"))
        .select(col("ntot").as("n_docs"),
          expr("1000 * stot div ntot").as("mean_milli"),
          expr("(m8 + m9) div 2").as("mom_milli"),
          expr("(msum - mmax - mmin) div 14").as("trimmed_milli"))
    }),

    // join-order cost enumeration audit: the three left-deep orders of
    // customer ⋈ orders ⋈ lineitem costed with the textbook estimate
    // |R⋈S| = |R|·|S|/max(d_R, d_S) from base-table distinct counts —
    // including the customer×lineitem cartesian the greedy optimizer
    // must avoid — with ESTIMATED cost (Σ intermediate sizes) laid
    // beside the ACTUAL sizes. The readout a cost-based optimizer's
    // regression test wants: does the estimate still rank plans right?
    "q534_join_order_costs" -> ((s, dir) => {
      import s.implicits._
      val st = Tables.orders(s, dir).agg(count(lit(1)).as("no"),
          countDistinct(col("o_custkey")).as("doc"))
        .crossJoin(broadcast(Tables.customer(s, dir)
          .agg(count(lit(1)).as("nc"))))
        .crossJoin(broadcast(Tables.lineitem(s, dir)
          .agg(count(lit(1)).as("nl"),
            countDistinct(col("l_orderkey")).as("dlo"))))
      val aco = Tables.orders(s, dir).join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey")).agg(count(lit(1)).as("a_co"))
      val aol = Tables.orders(s, dir).join(Tables.lineitem(s, dir),
        col("o_orderkey") === col("l_orderkey")).agg(count(lit(1)).as("a_ol"))
      val afull = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("a_col"))
      st.crossJoin(broadcast(aco)).crossJoin(broadcast(aol))
        .crossJoin(broadcast(afull))
        .selectExpr(
          "stack(3," +
            " '1_co_then_l'," +
            "   CAST(CAST(nc AS DECIMAL(38,0)) * no div greatest(nc, doc)" +
            "   + (CAST(nc AS DECIMAL(38,0)) * no div greatest(nc, doc))" +
            "     * nl div greatest(no, dlo) AS BIGINT)," +
            "   CAST(a_co + a_col AS BIGINT)," +
            " '2_ol_then_c'," +
            "   CAST(CAST(no AS DECIMAL(38,0)) * nl div greatest(no, dlo)" +
            "   + (CAST(no AS DECIMAL(38,0)) * nl div greatest(no, dlo))" +
            "     * nc div greatest(doc, nc) AS BIGINT)," +
            "   CAST(a_ol + a_col AS BIGINT)," +
            " '3_cl_cross_then_o'," +
            "   CAST(CAST(nc AS DECIMAL(38,0)) * nl" +
            "   + (CAST(nc AS DECIMAL(38,0)) * nl) * no div greatest(no, dlo)" +
            "     AS BIGINT)," +
            "   CAST(CAST(nc AS DECIMAL(38,0)) * nl + a_col AS BIGINT)" +
            ") AS (plan, est_cost, actual_cost)")
        .orderBy("plan")
    }),

    // priority load-shedding model: per second of arrivals, keep events
    // in pinned business-priority order (purchase > signup > click >
    // view > error) until the capacity — set at mean+1 events/sec —
    // is spent; everything lower sheds. ONE 5-row window per second
    // (cumulative of higher priorities), the per-type shed rates are
    // the capacity-planning readout behind q431's token bucket
    "q535_load_shedding" -> ((s, dir) => {
      val pri = expr("CASE event_type WHEN 'purchase' THEN 1" +
        " WHEN 'signup' THEN 2 WHEN 'click' THEN 3 WHEN 'view' THEN 4" +
        " ELSE 5 END")
      val arr = Tables.events(s, dir)
        .select(col("ts"), col("event_type"), pri.as("p"))
        .select(expr("unix_micros(ts) div 1000000").as("sec"),
          col("event_type"), col("p"))
        .groupBy("sec", "event_type", "p").agg(count(lit(1)).as("arr"))
        .localCheckpoint(false)
      val cap = broadcast(arr.agg(
        expr("sum(arr) div count(DISTINCT sec) + 1").as("cap")))
      val cum = Window.partitionBy("sec").orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
      arr.crossJoin(cap)
        .withColumn("cb", coalesce(sum(col("arr")).over(cum), lit(0L)))
        .withColumn("kept",
          greatest(lit(0L), least(col("arr"), col("cap") - col("cb"))))
        .groupBy("event_type", "p")
        .agg(sum(col("arr")).as("n_arrivals"), sum(col("kept")).as("n_kept"))
        .select(col("event_type"), col("p").cast("long").as("priority_rank"),
          col("n_arrivals"), col("n_kept"),
          expr("(n_arrivals - n_kept) * 1000000 div n_arrivals")
            .as("shed_ppm"))
        .orderBy("p")
    }),

    // exact Shapley attribution over the three non-purchase channels
    // (click/view/signup exposure → purchase conversion): coalition
    // value v(S) = conversion rate of users exposed to EXACTLY S, the
    // 3-player Shapley sum with ×6 integer weights (2,1,1,2) — the
    // principled split q339's last-touch/linear heuristics approximate;
    // everything reduces to the 8-row exposure-set relation
    "q536_shapley_attribution" -> ((s, dir) => {
      val u = Tables.events(s, dir).groupBy("user_id")
        .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
          max(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
          max(when(col("event_type") === "signup", 1L).otherwise(0L)).as("g"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
      val rates = u.groupBy("c", "v", "g")
        .agg(expr("sum(conv) * 1000000 div count(1)").as("r"))
      val rateCols = (for (c <- 0 to 1; v <- 0 to 1; g <- 0 to 1) yield
        sum(when(col("c") === c && col("v") === v && col("g") === g,
          col("r")).otherwise(0L)).as(s"r$c$v$g")).toSeq
      val wide = rates.agg(rateCols.head, rateCols.tail: _*)
      wide.selectExpr(
          "stack(3," +
            " 'click', 2*(r100 - r000) + (r110 - r010) + (r101 - r001)" +
            " + 2*(r111 - r011)," +
            " 'view', 2*(r010 - r000) + (r110 - r100) + (r011 - r001)" +
            " + 2*(r111 - r101)," +
            " 'signup', 2*(r001 - r000) + (r101 - r100) + (r011 - r010)" +
            " + 2*(r111 - r110)" +
            ") AS (channel, phi6_ppm)")
        .select(col("channel"), col("phi6_ppm"),
          expr("phi6_ppm div 6").as("phi_ppm"))
        .orderBy("channel")
    }),

    // hierarchical forecast reconciliation: naive last-month forecasts
    // per region (bottom-up) vs the total forecast split by trailing
    // 12-month revenue shares (top-down) — the coherence gap between
    // the two is the reconciliation error a grouped-time-series system
    // must resolve before publishing. Exact cents; every relation after
    // the star join is ≤ n_regions rows
    "q537_forecast_reconciliation" -> ((s, dir) => {
      val mr = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), expr("date_trunc('month', o_orderdate)").as("m"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev"))
        .localCheckpoint(false)
      val last = broadcast(mr.agg(max(col("m")).as("mx")))
      val bu = mr.crossJoin(last).filter(col("m") === col("mx"))
        .select(col("r_name"), col("rev").as("bu_cents"))
      val tot = broadcast(bu.agg(sum(col("bu_cents")).as("tot_last")))
      val share = mr.groupBy("r_name").agg(sum(col("rev")).as("rev_all"))
        .crossJoin(broadcast(mr.agg(sum(col("rev")).as("rev_tot"))))
        .select(col("r_name"),
          expr("rev_all * 1000000 div rev_tot").as("share_ppm"))
      bu.join(share, "r_name").crossJoin(tot)
        .select(col("r_name"), col("bu_cents"),
          expr("tot_last * share_ppm div 1000000").as("td_cents"))
        .withColumn("gap_ppm", expr(
          "abs(bu_cents - td_cents) * 1000000 div greatest(bu_cents, 1)"))
        .orderBy("r_name")
    }),

    // training-epoch shuffle quality: Spearman ρ between the md5 orders
    // of consecutive epochs, and between epoch 1 and raw corpus order —
    // a correct shuffle shows |ρ| ≈ 0 both ways (residual correlation
    // means curriculum leakage across epochs). Exact: ρ = 1 −
    // 6Σd²/(n(n²−1)) in integer ppm from the two rank windows
    "q538_epoch_shuffle" -> ((s, dir) => {
      val base = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"))
        .withColumn("r0", row_number().over(
          Window.orderBy("doc_id")).cast("long"))
        .withColumn("r1", row_number().over(Window.orderBy(
          Dedup.md5Long(concat(lit("ep#1#"), col("doc_id").cast("string")), 12),
          col("doc_id"))).cast("long"))
        .withColumn("r2", row_number().over(Window.orderBy(
          Dedup.md5Long(concat(lit("ep#2#"), col("doc_id").cast("string")), 12),
          col("doc_id"))).cast("long"))
        .localCheckpoint(false)
      def rho(a: String, b: String, label: String): DataFrame = base
        .agg(count(lit(1)).as("n"),
          sum(expr(s"CAST(($a - $b) AS DECIMAL(38,0)) * ($a - $b)")).as("sd2"))
        .select(lit(label).as("pair"), col("n").as("n_docs"),
          expr("CAST(1000000 - 6 * sd2 * 1000000" +
            " div (CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * n - 1))" +
            " AS BIGINT)").as("rho_ppm"))
      rho("r1", "r2", "epoch1_vs_epoch2")
        .unionAll(rho("r0", "r1", "corpus_vs_epoch1"))
        .orderBy("pair")
    }),

    // two-sample Cramér–von Mises on BUILDING vs MACHINERY order prices:
    // the whole-CDF distance (sensitive everywhere, where q289's
    // Mann–Whitney sees only location) — T = (6U − nm(4nm−1))/(6nmN)
    // with U from midrank deviations, the per-tied-block square sums in
    // CLOSED FORM (Σ(c−2k)² expands to three integer series), so one
    // value-grouped pass with two per-group cumulatives computes it
    // exactly
    "q539_cramer_von_mises" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), (col("c_mktsegment") === "BUILDING")
          .cast("long").as("ga"))
      val vg = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .select(col("ga"), centsOf(col("o_totalprice")).as("v"))
        .groupBy("v")
        .agg(sum(col("ga")).as("na"), sum(lit(1L) - col("ga")).as("nb"))
      val before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val cum = vg
        .withColumn("cb", coalesce(sum(expr("na + nb")).over(before), lit(0L)))
        .withColumn("ca", coalesce(sum(col("na")).over(before), lit(0L)))
        .withColumn("cb2", coalesce(sum(col("nb")).over(before), lit(0L)))
        .withColumn("cblk", expr("2 * cb + na + nb + 1"))
      def s12(nc: String, cc: String): Column = sum(expr(
        s"CASE WHEN $nc > 0 THEN 3 * $nc" +
          s" * CAST((cblk - 2 * $cc) AS DECIMAL(38,0)) * (cblk - 2 * $cc)" +
          s" - 6 * CAST((cblk - 2 * $cc) AS DECIMAL(38,0)) * $nc * ($nc + 1)" +
          s" + 2 * CAST($nc AS DECIMAL(38,0)) * ($nc + 1) * (2 * $nc + 1)" +
          s" ELSE 0 END"))
      cum.agg(sum(col("na")).as("n"), sum(col("nb")).as("m"),
          s12("na", "ca").as("sa12"), s12("nb", "cb2").as("sb12"))
        .select(col("n").as("n_building"), col("m").as("n_machinery"),
          expr("CAST((6 * (CAST(n AS DECIMAL(38,0)) * sa12" +
            " + CAST(m AS DECIMAL(38,0)) * sb12)" +
            " - 12 * CAST(n AS DECIMAL(38,0)) * m" +
            " * (4 * CAST(n AS DECIMAL(38,0)) * m - 1)) * 1000000" +
            " div (72 * CAST(n AS DECIMAL(38,0)) * m * (n + m)) AS BIGINT)")
            .as("t_micro"))
    }),

    // hypergeometric enrichment: are near-dup docs (q21 candidate
    // members) OVER-represented among long docs (≥ the exact median
    // n_chars) — fold change + the mean/variance z against drawing
    // without replacement, the GSEA-style readout that says whether
    // duplication concentrates in a quality stratum. Exact integer
    // cross-multiplied z², one isqrt
    "q540_enrichment_test" -> ((s, dir) => {
      val d = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars")).localCheckpoint(false)
      val before = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
      val med = d.select(col("n_chars").as("q")).groupBy("q")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cb", coalesce(sum(col("cnt")).over(before), lit(0L)))
        .crossJoin(broadcast(d.agg(count(lit(1)).as("nn"))))
        .filter(col("cb") < expr("(nn + 1) div 2") &&
          expr("cb + cnt") >= expr("(nn + 1) div 2"))
        .select(col("q").as("med"))
      val cand = Dedup.minhashCandidates(
          Tables.documents(s, dir), "doc_id", "text")
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      d.crossJoin(broadcast(med))
        .join(cand.withColumn("dup", lit(1L)), Seq("doc_id"), "left")
        .agg(count(lit(1)).as("nn"),
          sum(when(col("n_chars") >= col("med"), 1L).otherwise(0L)).as("kk"),
          sum(coalesce(col("dup"), lit(0L))).as("nd"),
          sum(when(col("n_chars") >= col("med"), coalesce(col("dup"), lit(0L)))
            .otherwise(0L)).as("k"))
        .select(col("nn").as("n_docs"), col("kk").as("n_long"),
          col("nd").as("n_dup"), col("k").as("n_overlap"),
          expr("k * nn * 1000000 div greatest(nd * kk, 1)").as("fold_ppm"),
          expr("CAST((CAST(k AS DECIMAL(38,0)) * nn" +
            " - CAST(nd AS DECIMAL(38,0)) * kk)" +
            " * (CAST(k AS DECIMAL(38,0)) * nn - CAST(nd AS DECIMAL(38,0)) * kk)" +
            " * (nn - 1) * 1000000" +
            " div greatest(CAST(nd AS DECIMAL(38,0)) * kk * (nn - kk)" +
            " * (nn - nd), 1) AS BIGINT)").as("z2_micro"))
        .withColumn("t0", floor(sqrt(col("z2_micro").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + z2_micro div t0) div 2 ELSE 0 END"))
        .select(col("n_docs"), col("n_long"), col("n_dup"), col("n_overlap"),
          col("fold_ppm"),
          expr("(CASE WHEN fold_ppm >= 1000000 THEN 1 ELSE -1 END)" +
            " * (CASE WHEN (t1 + 1) * (t1 + 1) <= z2_micro THEN t1 + 1" +
            " WHEN t1 * t1 > z2_micro THEN t1 - 1 ELSE t1 END)").as("z_milli"))
    }),

    // Bradley–Terry preference strengths from monthly region-revenue
    // duels — the pairwise-comparison model behind every RLHF reward
    // fit, here ranking regions from ~960 month-level head-to-heads:
    // two minorization–maximization updates from the uniform start,
    // every division a pinned integer quotient on the bounded 5×5
    // win matrix, scores renormalized to Σ = k·10⁶ each round
    "q541_bradley_terry" -> ((s, dir) => {
      val mr = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), expr("date_trunc('month', o_orderdate)").as("m"))
        .agg(sum(centsOf(col("o_totalprice"))).as("rev"))
        .localCheckpoint(false)
      val grid = mr.select("m").distinct()
        .crossJoin(broadcast(mr.select("r_name").distinct()))
        .join(mr, Seq("m", "r_name"), "left")
        .select(col("m"), col("r_name"), coalesce(col("rev"), lit(0L)).as("rev"))
      val duels = grid.select(col("m"), col("r_name").as("ra"), col("rev").as("va"))
        .join(grid.select(col("m"), col("r_name").as("rb"), col("rev").as("vb")),
          "m")
        .filter(col("ra") =!= col("rb"))
        .groupBy("ra", "rb")
        .agg(sum(when(col("va") > col("vb"), 1L).otherwise(0L)).as("w"),
          count(lit(1)).as("ngames"))
        .localCheckpoint(false)
      val wins = duels.groupBy("ra").agg(sum(col("w")).as("wi"))
      // every per-iteration relation is |regions| rows — broadcast them
      // all: the un-hinted form nested 62 SortMergeJoins (2 exchanges +
      // 2 sorts each) across the two MM steps' reference fan-out
      def mmStep(pi: DataFrame): DataFrame = {
        val den = duels
          .join(broadcast(pi.select(col("r_name").as("ra"), col("p").as("pa"))), "ra")
          .join(broadcast(pi.select(col("r_name").as("rb"), col("p").as("pb"))), "rb")
          .groupBy("ra")
          .agg(sum(expr("ngames * 1000000 div (pa + pb)")).as("den"))
        val raw = wins.join(broadcast(den), "ra")
          .select(col("ra").as("r_name"),
            expr("wi * 1000000 * 1000000 div greatest(den, 1)").as("praw"))
        raw.crossJoin(broadcast(raw.agg(sum(col("praw")).as("ptot"),
            count(lit(1)).as("k"))))
          .select(col("r_name"),
            expr("CAST(praw AS DECIMAL(38,0)) * k * 1000000 div ptot").as("p"))
      }
      val p0 = wins.select(col("ra").as("r_name"), lit(1000000L).as("p"))
      val p2 = mmStep(mmStep(p0))
      wins.select(col("ra").as("r_name"), col("wi").as("n_wins"))
        .join(broadcast(p2), "r_name")
        .select(col("r_name"), col("n_wins"), col("p").as("bt_score_micro"))
        .orderBy("r_name")
    }),

    // A/B power analysis: the minimum detectable effect on doc length
    // at n ∈ {1000, 10000, full} per arm — MDE = (z_{α/2}+z_β)·σ·√(2/n)
    // with the z-sum pinned at 2.802 milli-units (α=5%, power 80%),
    // σ² the exact sample variance of the corpus; one isqrt per n.
    // The "is this experiment even worth running" readout
    "q542_power_mde" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sx"),
          sum(expr("CAST(n_chars AS DECIMAL(38,0)) * n_chars")).as("sxx"))
        .select(col("n"), col("sx"),
          expr("CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx").as("vnum"))
        .crossJoin(broadcast(Seq(1000L, 10000L, 0L).toDF("narm")))
        .select(col("n"), col("sx"), col("vnum"),
          when(col("narm") === 0L, col("n")).otherwise(col("narm")).as("narm"))
        .withColumn("mde2", expr(
          "CAST(2 * 2802 * 2802 * vnum" +
            " div (CAST(n AS DECIMAL(38,0)) * (n - 1) * narm) AS BIGINT)"))
        .withColumn("t0", floor(sqrt(col("mde2").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + mde2 div t0) div 2 ELSE 0 END"))
        .select(col("narm").as("n_per_arm"), col("n"), col("sx"),
          expr("CASE WHEN (t1 + 1) * (t1 + 1) <= mde2 THEN t1 + 1" +
            " WHEN t1 * t1 > mde2 THEN t1 - 1 ELSE t1 END").as("mde_milli"))
        .select(col("n_per_arm"), col("mde_milli"),
          expr("mde_milli * 1000 * n div sx").as("mde_rel_ppm"))
        .orderBy("n_per_arm")
    }),

    // Davies–Bouldin clustering validity over the 8 IVF buckets: the
    // worst-pair ratio (sᵢ+sⱼ)/d(cᵢ,cⱼ) per cluster and its mean — low
    // = compact, well-separated (the companion to q182's silhouette
    // that needs only k² centroid distances, not row pairs). Centroids
    // as pinned truncated integer means on the 1e-6 grid; every
    // distance an exact integer isqrt
    "q543_davies_bouldin" -> ((s, dir) => {
      val asg = Similarity.assignBuckets(
          Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .select(col("vid").as("vec_id"), col("bucket"),
          posexplode(col("emb_d").cast("array<double>")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("bucket"), col("pos"),
          round(col("x") * 1000000, 0).cast("long").as("qv"))
        .localCheckpoint(false)
      val cent = asg.groupBy("bucket", "pos")
        .agg(sum(col("qv")).as("sq"), count(lit(1)).as("nb"))
        .select(col("bucket"), col("pos"), expr("sq div nb").as("cq"))
        .localCheckpoint(false)
      def isqrtCols(df: DataFrame, in: String, out: String): DataFrame = df
        .withColumn("_t0", floor(sqrt(col(in).cast("double"))).cast("long"))
        .withColumn("_t1", expr(
          s"CASE WHEN _t0 > 0 THEN (_t0 + $in div _t0) div 2 ELSE 0 END"))
        .withColumn(out, expr(
          s"CASE WHEN (_t1 + 1) * (_t1 + 1) <= $in THEN _t1 + 1" +
            s" WHEN _t1 * _t1 > $in THEN _t1 - 1 ELSE _t1 END"))
        .drop("_t0", "_t1")
      val si = isqrtCols(
          asg.join(cent, Seq("bucket", "pos"))
            .groupBy("vec_id", "bucket")
            .agg(sum(expr("(qv - cq) * (qv - cq)")).as("d2")), "d2", "dist")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_members"),
          expr("sum(dist) div count(1)").as("s_q"))
        .localCheckpoint(false)
      val cd = isqrtCols(
          cent.select(col("bucket").as("bi"), col("pos"), col("cq").as("ci"))
            .join(cent.select(col("bucket").as("bj"), col("pos"),
              col("cq").as("cj")), "pos")
            .filter(col("bi") =!= col("bj"))
            .groupBy("bi", "bj")
            .agg(sum(expr("(ci - cj) * (ci - cj)")).as("c2")), "c2", "dc")
      val r = cd
        .join(si.select(col("bucket").as("bi"), col("s_q").as("si")), "bi")
        .join(si.select(col("bucket").as("bj"), col("s_q").as("sj")), "bj")
        .groupBy("bi")
        .agg(max(expr("(si + sj) * 1000 div greatest(dc, 1)")).as("r_milli"))
      si.select(col("bucket"), col("n_members"), col("s_q"))
        .join(r.select(col("bi").as("bucket"), col("r_milli")), "bucket")
        .crossJoin(broadcast(r.agg(
          expr("sum(r_milli) div count(1)").as("db_milli"))))
        .orderBy("bucket")
    }),

    // Cliff's delta + Vargha–Delaney A between two customer segments'
    // order prices — the EFFECT-SIZE readout the q289 Mann–Whitney p-value
    // doesn't give: δ = (P(a>b) − P(a<b)) and A = P(a>b) + P(a=b)/2, both
    // exact integer ppm from the same value-grouped cumulative scaffold
    // (U_gt = Σ na·cumB<, U_lt = Σ nb·cumA<, ties = Σ na·nb — one window,
    // no pair materialization, Σbucket never squared)
    "q544_cliffs_delta" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("FURNITURE", "HOUSEHOLD"))
        .select(col("c_custkey"), (col("c_mktsegment") === "FURNITURE")
          .cast("long").as("ga"))
      val vg = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .select(col("ga"), centsOf(col("o_totalprice")).as("v"))
        .groupBy("v")
        .agg(sum(col("ga")).as("na"), sum(lit(1L) - col("ga")).as("nb"))
      val before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      vg.withColumn("cb", coalesce(sum(col("nb")).over(before), lit(0L)))
        .withColumn("ca", coalesce(sum(col("na")).over(before), lit(0L)))
        .agg(sum(col("na")).as("n"), sum(col("nb")).as("m"),
          sum(expr("na * cb")).as("ugt"),
          sum(expr("nb * ca")).as("ult"),
          sum(expr("na * nb")).as("ties"))
        .select(col("n").as("n_furniture"), col("m").as("n_household"),
          expr("(ugt - ult) * 1000000 div (n * m)").as("delta_ppm"),
          expr("(2 * ugt + ties) * 1000000 div (2 * n * m)").as("vda_ppm"))
    }),

    // two-sample Kuiper test on order prices, 1993 vs 1994: V = D⁺ + D⁻
    // — the cyclic-sensitive cousin of q206's KS (equal sensitivity in
    // both tails, detects scale+location shifts KS's single sup misses).
    // CDFs stay cross-multiplied integers (ca·m − cb·n), the full-frame
    // window supplies n,m without a crossJoin
    "q545_kuiper_test" -> ((s, dir) => {
      val vg = Tables.orders(s, dir)
        .filter(year(col("o_orderdate")).isin(1993, 1994))
        .select((year(col("o_orderdate")) === 1993).cast("long").as("ga"),
          centsOf(col("o_totalprice")).as("v"))
        .groupBy("v")
        .agg(sum(col("ga")).as("na"), sum(lit(1L) - col("ga")).as("nb"))
      val upto = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
      val full = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      vg.withColumn("ca", sum(col("na")).over(upto))
        .withColumn("cb", sum(col("nb")).over(upto))
        .withColumn("n", sum(col("na")).over(full))
        .withColumn("m", sum(col("nb")).over(full))
        .agg(max(col("n")).as("n"), max(col("m")).as("m"),
          max(expr("ca * m - cb * n")).as("dp"),
          max(expr("cb * n - ca * m")).as("dm"))
        .select(col("n").as("n_1993"), col("m").as("n_1994"),
          expr("dp * 1000000 div (n * m)").as("dplus_ppm"),
          expr("dm * 1000000 div (n * m)").as("dminus_ppm"),
          expr("(dp + dm) * 1000000 div (n * m)").as("v_ppm"))
    }),

    // two-sample Anderson–Darling (Scholz–Stephens midrank/tie form) on
    // AUTOMOBILE vs MACHINERY order prices — the tail-weighted whole-CDF
    // test (CvM q539 weights uniformly; AD's 1/(F(1−F)) weight catches
    // tail divergence). Doubled midranks keep every term integer:
    // per distinct value, term_g = 10⁶·l·(N·Mg2 − n_g·B2)² div (N·D'),
    // D' = B2(2N−B2) − N·l; A²_micro = (N−1)(Sa/n + Sb/m) div N. The
    // 10⁶ numerator rides DECIMAL(38,0); each quotient ≤ ~4·10⁶·l·N so
    // the long-narrowing div is safe through sf1
    "q546_anderson_darling" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"))
        .select(col("c_custkey"), (col("c_mktsegment") === "AUTOMOBILE")
          .cast("long").as("ga"))
      val vg = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .select(col("ga"), centsOf(col("o_totalprice")).as("v"))
        .groupBy("v")
        .agg(sum(col("ga")).as("na"), sum(lit(1L) - col("ga")).as("nb"))
      val before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val full = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      vg.withColumn("ca", coalesce(sum(col("na")).over(before), lit(0L)))
        .withColumn("cp", coalesce(sum(expr("na + nb")).over(before), lit(0L)))
        .withColumn("n", sum(col("na")).over(full))
        .withColumn("m", sum(col("nb")).over(full))
        .withColumn("bign", expr("n + m"))
        .withColumn("l", expr("na + nb"))
        .withColumn("ma2", expr("2 * ca + na"))
        .withColumn("mb2", expr("2 * (cp - ca) + nb"))
        .withColumn("b2", expr("2 * cp + l"))
        .withColumn("dd", expr("b2 * (2 * bign - b2) - bign * l"))
        .withColumn("ta", expr(
          "CASE WHEN dd > 0 THEN CAST(1000000 AS DECIMAL(38,0)) * l" +
            " * CAST((bign * ma2 - n * b2) AS DECIMAL(38,0))" +
            " * (bign * ma2 - n * b2)" +
            " div (CAST(bign AS DECIMAL(38,0)) * dd) ELSE 0 END"))
        .withColumn("tb", expr(
          "CASE WHEN dd > 0 THEN CAST(1000000 AS DECIMAL(38,0)) * l" +
            " * CAST((bign * mb2 - m * b2) AS DECIMAL(38,0))" +
            " * (bign * mb2 - m * b2)" +
            " div (CAST(bign AS DECIMAL(38,0)) * dd) ELSE 0 END"))
        .agg(max(col("n")).as("n"), max(col("m")).as("m"),
          max(col("bign")).as("bign"),
          sum(col("ta").cast(dec38)).as("sa"),
          sum(col("tb").cast(dec38)).as("sb"))
        .select(col("n").as("n_automobile"), col("m").as("n_machinery"),
          expr("CAST((CAST(bign - 1 AS DECIMAL(38,0))" +
            " * (sa div n + sb div m)) div bign AS BIGINT)").as("a2_micro"))
    }),

    // Mann–Kendall trend test on the monthly-revenue series: S counts
    // later-month revenue wins minus losses over all month pairs (the
    // nonparametric twin of q235's Theil–Sen slope), tie-corrected
    // 18·Var exact, continuity-corrected z via the isqrt chain. The
    // month dictionary is bounded (~84 rows) so the pair join broadcasts
    "q547_mann_kendall" -> ((s, dir) => {
      val mo = Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("t"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
        .localCheckpoint(false)
      val pairs = mo.select(col("t").as("t1"), col("v").as("v1"))
        .join(broadcast(mo.select(col("t").as("t2"), col("v").as("v2"))),
          col("t1") < col("t2"))
        .agg(sum(signum(col("v2") - col("v1")).cast("long")).as("s_stat"))
      val ties = mo.groupBy("v").agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("nm"),
          sum(expr("c * (c - 1) * (2 * c + 5)")).as("tcorr"))
      pairs.crossJoin(broadcast(ties))
        .withColumn("var18", expr("nm * (nm - 1) * (2 * nm + 5) - tcorr"))
        .withColumn("k", expr(
          "18000000 * greatest(abs(s_stat) - 1, 0) * greatest(abs(s_stat) - 1, 0)" +
            " div var18"))
        .withColumn("t0", floor(sqrt(col("k").cast("double"))).cast("long"))
        .withColumn("t1", expr("CASE WHEN t0 > 0 THEN (t0 + k div t0) div 2 ELSE 0 END"))
        .withColumn("rt", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= k THEN t1 + 1" +
            " WHEN t1 * t1 > k THEN t1 - 1 ELSE t1 END"))
        .select(col("nm").as("n_months"), col("s_stat"), col("var18"),
          expr("CASE WHEN s_stat < 0 THEN -rt ELSE rt END").as("z_milli"))
    }),

    // Conover squared-ranks test: do FURNITURE and BUILDING order prices
    // have equal DISPERSION? Deviations from each segment's mean enter
    // on a common integer scale (d = n_other·|n_g·v − S_g|), pooled
    // doubled midranks give integer scores (2R)² quantized by div 4N,
    // and the exact conditional moments give a cross-multiplied z² —
    // the variance-sensitive complement of the q289/q544 location tests
    "q548_conover_scale" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("FURNITURE", "BUILDING"))
        .select(col("c_custkey"), (col("c_mktsegment") === "FURNITURE")
          .cast("long").as("ga"))
      val rows = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .select(col("ga"), centsOf(col("o_totalprice")).as("v"))
        .localCheckpoint(false)
      val gs = rows.groupBy("ga")
        .agg(count(lit(1)).as("ng"), sum(col("v")).as("sg"))
      val tot = gs.agg(sum(col("ng")).as("bign"),
        min(when(col("ga") === 1, col("ng"))).as("n"),
        min(when(col("ga") === 0, col("ng"))).as("m"))
      val dv = rows.join(broadcast(gs), "ga")
        .crossJoin(broadcast(tot))
        .select(col("ga"), col("bign"), col("n"), col("m"),
          expr("(bign - ng) * abs(ng * v - sg)").as("d"))
      val vg = dv.groupBy("d", "bign", "n", "m")
        .agg(sum(col("ga")).as("na"), sum(lit(1L) - col("ga")).as("nb"))
      val before = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
      vg.withColumn("cp", coalesce(sum(expr("na + nb")).over(before), lit(0L)))
        .withColumn("l", expr("na + nb"))
        .withColumn("r2", expr("2 * cp + l + 1"))
        .withColumn("sc", expr(
          "CAST(r2 AS DECIMAL(38,0)) * r2 div (4 * bign)"))
        .agg(max(col("bign")).as("bign"), max(col("n")).as("n"),
          max(col("m")).as("m"),
          sum(expr("na * sc").cast(dec38)).as("t4a"),
          sum(expr("l * sc").cast(dec38)).as("m1"),
          sum(expr("CAST(l AS DECIMAL(38,0)) * sc * sc")).as("m2"))
        .select(col("n").as("n_furniture"), col("m").as("n_building"),
          col("t4a").cast("long").as("t4_scaled"),
          expr("CAST((1000 * CAST(bign - 1 AS DECIMAL(38,0))" +
            " * (bign * t4a - n * m1) * (bign * t4a - n * m1))" +
            " div (CAST(n AS DECIMAL(38,0)) * m * (bign * m2 - m1 * m1))" +
            " AS BIGINT)").as("zsq_milli"))
    }),

    // Calinski–Harabasz (variance-ratio) index over the IVF bucket
    // assignment — q543's Davies–Bouldin asks "are clusters compact vs
    // their nearest rival"; CH asks the global ANOVA question
    // (between-SS / within-SS, df-adjusted). Coordinates quantize to
    // 1e-6 longs, centroids are integer means (div), so W/B are exact
    // integer sums both engines reproduce bit-for-bit
    "q549_calinski_harabasz" -> ((s, dir) => {
      val asg = Similarity.assignBuckets(
          Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .select(col("vid").as("vec_id"), col("bucket"),
          posexplode(col("emb_d").cast("array<double>")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("bucket"), col("pos"),
          round(col("x") * 1000000, 0).cast("long").as("qv"))
        .localCheckpoint(false)
      val cent = asg.groupBy("bucket", "pos")
        .agg(sum(col("qv")).as("sq"), count(lit(1)).as("nb"))
        .select(col("bucket"), col("pos"), expr("sq div nb").as("cq"),
          col("nb"))
        .localCheckpoint(false)
      val glob = asg.groupBy("pos")
        .agg(sum(col("qv")).as("sq"), count(lit(1)).as("cnt"))
        .select(col("pos"), expr("sq div cnt").as("gq"))
      val w = asg.join(cent.select("bucket", "pos", "cq"), Seq("bucket", "pos"))
        .agg(sum(expr("(qv - cq) * (qv - cq)").cast(dec38)).as("wss"))
      val b = cent.join(glob, "pos")
        .agg(sum(expr("nb * (cq - gq) * (cq - gq)").cast(dec38)).as("bss"))
      val nk = asg.agg(countDistinct(col("vec_id")).as("nv"),
        countDistinct(col("bucket")).as("k"))
      w.crossJoin(broadcast(b)).crossJoin(broadcast(nk))
        .select(col("nv").as("n_vectors"), col("k").as("k_clusters"),
          col("wss").cast("long").as("w_ssq"),
          col("bss").cast("long").as("b_ssq"),
          expr("(1000 * bss * (nv - k)) div (wss * (k - 1))").as("ch_milli"))
    }),

    // Dunn index (centroid form) over the same IVF assignment: worst-case
    // separation — min inter-centroid distance² over max cluster
    // diameter² (4·max radius²) — the pessimist's counterpart to q549's
    // average-case ratio; all-squared so no roots are needed at all
    "q550_dunn_index" -> ((s, dir) => {
      val asg = Similarity.assignBuckets(
          Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .select(col("vid").as("vec_id"), col("bucket"),
          posexplode(col("emb_d").cast("array<double>")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("bucket"), col("pos"),
          round(col("x") * 1000000, 0).cast("long").as("qv"))
        .localCheckpoint(false)
      val cent = asg.groupBy("bucket", "pos")
        .agg(expr("sum(qv) div count(1)").as("cq"))
        .localCheckpoint(false)
      val maxr = asg.join(cent, Seq("bucket", "pos"))
        .groupBy("vec_id", "bucket")
        .agg(sum(expr("(qv - cq) * (qv - cq)")).as("r2"))
        .agg(max(col("r2")).as("max_r2"))
      val minc = cent.select(col("bucket").as("bi"), col("pos"), col("cq").as("ci"))
        .join(cent.select(col("bucket").as("bj"), col("pos"), col("cq").as("cj")), "pos")
        .filter(col("bi") < col("bj"))
        .groupBy("bi", "bj")
        .agg(sum(expr("(ci - cj) * (ci - cj)")).as("c2"))
        .agg(min(col("c2")).as("min_c2"), count(lit(1)).as("n_pairs"))
      minc.crossJoin(broadcast(maxr))
        .select(col("n_pairs"), col("min_c2"), col("max_r2"),
          expr("1000 * min_c2 div (4 * max_r2)").as("dunn_milli"))
    }),

    // adjusted Rand index: does the UNSUPERVISED IVF bucketing recover
    // the embeddings' true `label` partition? Pair-counting on the
    // bounded label×bucket contingency, chance-corrected in one exact
    // integer formula (doubled pair counts P/A/B, ×2T common
    // denominator — no division until the final ppm)
    "q551_adjusted_rand" -> ((s, dir) => {
      val asg = Similarity.assignBuckets(
          Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .select(col("vid").as("vec_id"), col("bucket"))
      val cont = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"))
        .join(asg, "vec_id")
        .groupBy("label", "bucket").agg(count(lit(1)).as("nij"))
        .localCheckpoint(false)
      // pair-count sums are O(n²) per term and the ARI ratio is O(n⁴)
      // over O(n⁴) — decimal sums (order-invariant), then ONE double
      // ratio on the 1-row aggregate in literal-identical op order on
      // both engines (the rank-test discipline; no fixed-precision
      // integer holds n⁴ at corpus scale)
      val p = cont.agg(
        sum(expr("CAST(nij AS DECIMAL(38,0)) * (nij - 1)")).as("pp"),
        sum(col("nij")).as("n"))
      val a = cont.groupBy("label").agg(sum(col("nij")).as("ai"))
        .agg(sum(expr("CAST(ai AS DECIMAL(38,0)) * (ai - 1)")).as("aa"),
          count(lit(1)).as("n_labels"))
      val b = cont.groupBy("bucket").agg(sum(col("nij")).as("bj"))
        .agg(sum(expr("CAST(bj AS DECIMAL(38,0)) * (bj - 1)")).as("bb"),
          count(lit(1)).as("k_buckets"))
      p.crossJoin(broadcast(a)).crossJoin(broadcast(b))
        .select(col("n").as("n_vectors"), col("n_labels"), col("k_buckets"),
          expr("CAST(round(1000000" +
            " * (2 * CAST(n AS DOUBLE) * (n - 1) * pp" +
            " - 2 * CAST(aa AS DOUBLE) * bb)" +
            " / (CAST(n AS DOUBLE) * (n - 1) * (aa + bb)" +
            " - 2 * CAST(aa AS DOUBLE) * bb)) AS BIGINT)")
            .as("ari_ppm"))
    }),

    // Fowlkes–Mallows index from the same label×bucket contingency: the
    // geometric mean of pair precision and pair recall — reported with
    // both components so the ARI's chance correction (q551) can be read
    // against the raw pair-confusion trade-off; one isqrt, else integers
    "q552_fowlkes_mallows" -> ((s, dir) => {
      val asg = Similarity.assignBuckets(
          Tables.embeddings(s, dir), "vec_id", "embedding", 8)
        .select(col("vid").as("vec_id"), col("bucket"))
      val cont = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"))
        .join(asg, "vec_id")
        .groupBy("label", "bucket").agg(count(lit(1)).as("nij"))
        .localCheckpoint(false)
      // same O(n²)-per-term sums as q551: decimal accumulation, and the
      // geometric mean via double sqrt (pp² is O(n⁴) — past any fixed
      // precision at corpus scale; IEEE sqrt is engine-identical)
      val p = cont.agg(
        sum(expr("CAST(nij AS DECIMAL(38,0)) * (nij - 1)")).as("pp"))
      val a = cont.groupBy("label").agg(sum(col("nij")).as("ai"))
        .agg(sum(expr("CAST(ai AS DECIMAL(38,0)) * (ai - 1)")).as("aa"))
      val b = cont.groupBy("bucket").agg(sum(col("nij")).as("bj"))
        .agg(sum(expr("CAST(bj AS DECIMAL(38,0)) * (bj - 1)")).as("bb"))
      p.crossJoin(broadcast(a)).crossJoin(broadcast(b))
        // fm as the integer isqrt of prec·rec: each ratio is ≤ 1e6 so the
        // product fits LONG at ANY corpus size, and the all-integer path
        // has no double rounding boundary (a raw round(1e6·pp/√(aa·bb))
        // landed exactly on a .5 where the engines' round() diverge)
        .withColumn("x", expr(
          "(1000000 * pp div bb) * (1000000 * pp div aa)"))
        .withColumn("t0", floor(sqrt(col("x").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + x div t0) div 2 ELSE 0 END"))
        .select(col("pp").cast("long").as("pair_tp2"),
          expr("CAST(1000000 * pp div bb AS BIGINT)").as("prec_ppm"),
          expr("CAST(1000000 * pp div aa AS BIGINT)").as("rec_ppm"),
          expr("CAST(CASE WHEN (t1 + 1) * (t1 + 1) <= x THEN t1 + 1" +
            " WHEN t1 * t1 > x THEN t1 - 1 ELSE t1 END AS BIGINT)")
            .as("fm_ppm"))
    }),

    // mean-average-precision eval of the IVF retrieval against the exact
    // top-10 (the order-sensitive companion to q294's nDCG and q322's
    // MRR): per query, precision accumulates at each hit position —
    // cumulative-hit window, per-term micro floor-div, R = 10
    "q553_map_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rk").as("rk_exact"))
      val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
          nCentroids = 8, nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rk").as("p"))
      val wcum = Window.partitionBy("query_id").orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
      approx.join(exact, Seq("query_id", "neighbor_id"), "left")
        .withColumn("hit", when(col("rk_exact").isNotNull, 1L).otherwise(0L))
        .withColumn("ch", sum(col("hit")).over(wcum))
        .groupBy("query_id")
        .agg(sum(col("hit")).as("n_hits"),
          sum(when(col("hit") === 1, expr("ch * 1000000 div p"))
            .otherwise(0L)).as("psum_micro"))
        .withColumn("ap_micro", expr("psum_micro div 10"))
        .orderBy("query_id")
    }),

    // top-p (nucleus) truncation of each language's unigram distribution:
    // the smallest count-descending vocab prefix holding ≥90% of token
    // mass — the sampling-time cutoff readout (how many types survive
    // top-p per language). Strict-integer keep test 10·cum< < 9·total,
    // per-lang window, no doubles anywhere
    "q554_nucleus_cutoff" -> ((s, dir) => {
      val wc = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("lang"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
      val byFreq = Window.partitionBy("lang")
        .orderBy(col("cnt").desc, col("w"))
      val full = Window.partitionBy("lang")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      wc.withColumn("cumb", coalesce(sum(col("cnt"))
          .over(byFreq.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("total", sum(col("cnt")).over(full))
        .withColumn("keep", when(expr("10 * cumb < 9 * total"), 1L).otherwise(0L))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_vocab"), max(col("total")).as("total_tokens"),
          sum(col("keep")).as("nucleus_k"),
          expr("sum(keep * cnt)").as("kept"))
        .select(col("lang"), col("n_vocab"), col("total_tokens"),
          col("nucleus_k"),
          expr("kept * 1000000 div total_tokens").as("nucleus_mass_ppm"))
        .orderBy("lang")
    }),

    // speculative-decoding acceptance rate between a draft LM (src0's
    // unigram distribution) and the target LM (src1's): α = Σ_w
    // min(p_draft, p_target) — exactly 1 − TV distance — cross-multiplied
    // to integers (min(ca·Nb, cb·Na)/(Na·Nb)); plus the expected accepted
    // run length for k=4 drafts, Σ_{i=0..4} αⁱ in pinned ppm powers
    "q555_speculative_accept" -> ((s, dir) => {
      val wc = Tables.documents(s, dir)
        .filter(col("text").isNotNull && col("source").isin("src0", "src1"))
        .select((col("source") === "src0").cast("long").as("ga"),
          explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w")
        .agg(sum(col("ga")).as("ca"), sum(lit(1L) - col("ga")).as("cb"))
      val full = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      wc.withColumn("na", sum(col("ca")).over(full))
        .withColumn("nb", sum(col("cb")).over(full))
        .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
          sum(expr("least(ca * nb, cb * na)")).as("overlap"))
        .withColumn("a", expr("overlap * 1000000 div (na * nb)"))
        .select(col("na").as("draft_tokens"), col("nb").as("target_tokens"),
          col("a").as("accept_ppm"),
          expr("1000 + a div 1000" +
            " + CAST(a AS DECIMAL(38,0)) * a div 1000000000" +
            " + CAST(a AS DECIMAL(38,0)) * a * a div 1000000000000000" +
            " + CAST(a AS DECIMAL(38,0)) * a * a * a div 1000000000000000000000")
            .as("exp_len_milli"))
    }),

    // one DoReMi-style domain-reweighting step: each source's mean NLL
    // under the corpus unigram LM (q72's micro-nat convention), excess
    // over the best source, multiplicative-weights update
    // w ∝ exp(η·excess) with η = 0.1 — ONE pinned libm exp per source
    // (20 rows), integer algebra before and after; the normalized
    // new_w_ppm is the next epoch's sampling mixture
    "q556_doremi_step" -> ((s, dir) => {
      val words = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
      val wc = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      val tot = wc.agg(sum(col("cnt")).as("total"))
      val sw = words.groupBy("source", "w").agg(count(lit(1)).as("n"))
        .join(wc, "w").crossJoin(broadcast(tot))
        .withColumn("lp", round(log(col("cnt").cast("double") / col("total"))
          * 1000000, 0).cast("long"))
        .groupBy("source")
        .agg(sum(col("n")).as("n_tokens"),
          expr("-sum(n * lp)").as("snll"))
        .withColumn("nll_micro", expr("snll div n_tokens"))
      val full = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      sw.withColumn("best", min(col("nll_micro")).over(full))
        .withColumn("excess_micro", expr("nll_micro - best"))
        .withColumn("fac", expr(
          "CAST(round(exp(CAST(excess_micro div 10 AS DOUBLE) / 1000000.0)" +
            " * 1000000) AS BIGINT)"))
        .withColumn("fsum", sum(col("fac")).over(full))
        .select(col("source"), col("n_tokens"), col("nll_micro"),
          col("excess_micro"),
          expr("fac * 1000000 div fsum").as("new_w_ppm"))
        .orderBy("source")
    }),

    // expected reciprocal rank of the IVF retrieval against exact top-10
    // (q294/q553's scaffold, cascade-model readout): dyadic relevance
    // R = (2^g − 1)/16 with g = min(11−rk_exact, 4) makes every survival
    // product an integer ≤ 16⁹ — exact in both engines (the DuckDB
    // product() double is integer-exact below 2⁵³)
    "q557_err_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rk").as("rk_exact"))
      val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
          nCentroids = 8, nQueries = 5, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rk").as("p"))
      val wprev = Window.partitionBy("query_id").orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
      approx.join(exact, Seq("query_id", "neighbor_id"), "left")
        .withColumn("g", least(greatest(coalesce(lit(11L) - col("rk_exact"),
          lit(0L)), lit(0L)), lit(4L)))
        .withColumn("r16", expr("CAST(pow(2, g) AS BIGINT) - 1"))
        .withColumn("surv", coalesce(expr(
          "aggregate(collect_list(16 - r16) OVER (PARTITION BY query_id" +
            " ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)," +
            " 1L, (acc, x) -> acc * x)"), lit(1L)))
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_ranked"),
          sum(expr("1000000 * r16 * surv" +
            " * CAST(pow(16, 10 - p) AS BIGINT)" +
            " div (p * 1099511627776)")).as("err_micro"))
        .orderBy("query_id")
    }),

    // continuous vs static batching of LLM generation: 1024 requests with
    // deterministic generation lengths, static batches of 32 pay the
    // batch MAX while token-level (continuous) batching pays total/32 —
    // the padding-waste (q212) story at serving time, exact integers
    "q558_continuous_batching" -> ((s, dir) => {
      val req = Tables.orders(s, dir)
        .select(col("o_orderkey"))
        .orderBy("o_orderkey").limit(1024)
        .withColumn("glen", expr("o_orderkey * 7 % 96 + 32"))
        .withColumn("rn", row_number().over(Window.orderBy("o_orderkey")))
        .withColumn("batch", expr("(rn - 1) div 32"))
      req.groupBy("batch").agg(max(col("glen")).as("bmax"),
          sum(col("glen")).as("bsum"))
        .agg(count(lit(1)).as("n_batches"), sum(col("bmax")).as("static_cost"),
          sum(col("bsum")).as("total_tokens"))
        .select(col("n_batches"),
          col("static_cost"), col("total_tokens"),
          expr("(total_tokens + 31) div 32").as("packed_cost"),
          expr("1000 * static_cost div ((total_tokens + 31) div 32)")
            .as("speedup_milli"))
    }),

    // Pettitt change-point test on the monthly-revenue series: the
    // rank-based CUSUM U_t = Σ_{i≤t}(2R̄_i) − t(N+1) peaks at the most
    // likely break month (q214's CUSUM assumes a known mean; Pettitt is
    // distribution-free). Midranks come from the value-grouped window,
    // the time cumulative from a second window — no pair join at all,
    // and the significance exponent 6K²/(n³+n²) stays integer milli
    "q559_pettitt_changepoint" -> ((s, dir) => {
      val mo = Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("t"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
        .localCheckpoint(false)
      val byV = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val vg = mo.groupBy("v").agg(count(lit(1)).as("l"))
        .withColumn("cumb", coalesce(sum(col("l")).over(byV), lit(0L)))
        .select(col("v"), expr("2 * cumb + l + 1").as("r2"))
      val byT = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
      val full = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      mo.join(vg, "v")
        .withColumn("tn", row_number().over(Window.orderBy("t")))
        .withColumn("nm", sum(lit(1L)).over(full))
        .withColumn("u", sum(col("r2")).over(byT) - col("tn") * (col("nm") + 1))
        .filter(col("tn") < col("nm"))
        .withColumn("mx", max(abs(col("u"))).over(full))
        .filter(abs(col("u")) === col("mx"))
        .agg(max(col("nm")).as("nm"), max(col("mx")).as("k_stat"),
          min(col("t")).as("cp_month"))
        .select(col("nm").as("n_months"), col("k_stat"), col("cp_month"),
          expr("6000 * k_stat * k_stat div (nm * nm * nm + nm * nm)")
            .as("exponent_milli"))
    }),

    // KPSS level-stationarity statistic on monthly revenue (k$ units):
    // the null here is STATIONARY — the complement of q487's
    // Durbin–Watson / unit-root view. Residuals scale by ×n to stay
    // integer (e = n·x − Σx), the Bartlett q=4 long-run variance is a
    // 5×-scaled integer sum of lag products, and the n-powers cancel to
    // KPSS_micro = 5·10⁶·ΣS² div (n·lrv5) exactly
    "q560_kpss_level" -> ((s, dir) => {
      val mo = Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("t"))
        .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000")
          .as("v"))
        .localCheckpoint(false)
      val byT = Window.orderBy("t")
      val full = byT.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      mo.withColumn("nm", sum(lit(1L)).over(full))
        .withColumn("sv", sum(col("v")).over(full))
        .withColumn("e", expr("nm * v - sv"))
        .withColumn("st", sum(col("e")).over(
          byT.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("e1", lag(col("e"), 1).over(byT))
        .withColumn("e2", lag(col("e"), 2).over(byT))
        .withColumn("e3", lag(col("e"), 3).over(byT))
        .withColumn("e4", lag(col("e"), 4).over(byT))
        .agg(max(col("nm")).as("nm"),
          sum(expr("CAST(st AS DECIMAL(38,0)) * st")).as("ssq"),
          sum(expr("e * e")).as("g0"),
          sum(expr("e * coalesce(e1, 0)")).as("g1"),
          sum(expr("e * coalesce(e2, 0)")).as("g2"),
          sum(expr("e * coalesce(e3, 0)")).as("g3"),
          sum(expr("e * coalesce(e4, 0)")).as("g4"))
        .withColumn("lrv5", expr("5 * g0 + 2 * (4 * g1 + 3 * g2 + 2 * g3 + g4)"))
        .select(col("nm").as("n_months"), col("g0"), col("lrv5"),
          expr("CAST((5000000 * ssq) div (nm * CAST(lrv5 AS DECIMAL(38,0)))" +
            " AS BIGINT)").as("kpss_micro"))
    }),

    // semivariogram of daily revenue at row-order lags 1/2/4/8 — the
    // spatial-statistics readout of temporal structure (γ(h) rising with
    // h = persistence; flat = white noise). One ordered window pass,
    // four lag columns, quantized k$ units; pinned to OBSERVED-day
    // row lags so gaps don't create nulls beyond the series head
    "q561_variogram" -> ((s, dir) => {
      val day = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d"))
        .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000")
          .as("v"))
      val byD = Window.orderBy("d")
      day.withColumn("v1", lag(col("v"), 1).over(byD))
        .withColumn("v2", lag(col("v"), 2).over(byD))
        .withColumn("v4", lag(col("v"), 4).over(byD))
        .withColumn("v8", lag(col("v"), 8).over(byD))
        .agg(count(lit(1)).as("n_days"),
          count(col("v1")).as("n1"),
          sum(expr("(v - v1) * (v - v1)")).as("s1"),
          count(col("v2")).as("n2"),
          sum(expr("(v - v2) * (v - v2)")).as("s2"),
          count(col("v4")).as("n4"),
          sum(expr("(v - v4) * (v - v4)")).as("s4"),
          count(col("v8")).as("n8"),
          sum(expr("(v - v8) * (v - v8)")).as("s8"))
        .select(col("n_days"),
          expr("s1 div (2 * n1)").as("gamma1_q"),
          expr("s2 div (2 * n2)").as("gamma2_q"),
          expr("s4 div (2 * n4)").as("gamma4_q"),
          expr("s8 div (2 * n8)").as("gamma8_q"))
    }),

    // Allan variance of daily revenue at block sizes m = 1/2/4: the
    // clock-stability metric repurposed for pipeline-throughput drift
    // (white noise → AVAR halves per doubling; drift → it grows).
    // Block sums keep means exact (ȳ diffs ×m), full blocks only
    "q562_allan_variance" -> ((s, dir) => {
      val day = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d"))
        .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000")
          .as("v"))
        .withColumn("rn", row_number().over(Window.orderBy("d")))
        .localCheckpoint(false)
      def avar(m: Int): DataFrame = {
        val byB = Window.orderBy("b")
        day.withColumn("b", expr(s"(rn - 1) div $m"))
          .groupBy("b")
          .agg(sum(col("v")).as("bs"), count(lit(1)).as("c"))
          .filter(col("c") === m)
          .withColumn("prev", lag(col("bs"), 1).over(byB))
          .agg(count(col("prev")).as("npairs"),
            sum(expr("(bs - prev) * (bs - prev)")).as("sd2"))
          .select(lit(m.toLong).as("m"), col("npairs"),
            expr(s"sd2 div (2 * npairs * $m * $m)").as("avar_q"))
      }
      avar(1).union(avar(2)).union(avar(4)).orderBy("m")
    }),

    // Hurst exponent via rescaled range: R/S per full block at window
    // sizes 16/64/256 (all-integer: range of ×w cumulative deviations,
    // one isqrt per block), then H from the log-log endpoints — the
    // long-memory readout (H≈0.5 random walk increments, H>0.5
    // persistent). One ln per window size, q72's micro-nat convention
    "q563_hurst_rs" -> ((s, dir) => {
      val day = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d"))
        .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000")
          .as("v"))
        .withColumn("rn", row_number().over(Window.orderBy("d")))
        .localCheckpoint(false)
      def rsRows(w: Int): DataFrame = {
        val inB = Window.partitionBy("b").orderBy("rn")
          .rowsBetween(Window.unboundedPreceding, 0)
        val overB = Window.partitionBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        day.withColumn("b", expr(s"(rn - 1) div $w"))
          .withColumn("c", sum(lit(1L)).over(overB))
          .filter(col("c") === w)
          .withColumn("bs", sum(col("v")).over(overB))
          .withColumn("e", expr(s"$w * v - bs"))
          .withColumn("cd", sum(col("e")).over(inB))
          .groupBy("b")
          .agg((max(col("cd")) - min(col("cd"))).as("rw"),
            sum(expr("e * e")).as("se2"))
          .filter(col("se2") > 0)
          .withColumn("k", expr(
            s"CAST(1000000 AS DECIMAL(38,0)) * rw * rw * $w div se2"))
          .withColumn("t0", floor(sqrt(col("k").cast("double"))).cast("long"))
          .withColumn("t1", expr(
            "CASE WHEN t0 > 0 THEN (t0 + k div t0) div 2 ELSE 0 END"))
          .withColumn("rs", expr(
            "CASE WHEN (t1 + 1) * (t1 + 1) <= k THEN t1 + 1" +
              " WHEN t1 * t1 > k THEN t1 - 1 ELSE t1 END"))
          .agg(count(lit(1)).as("n_blocks"), sum(col("rs")).as("srs"))
          .select(lit(w.toLong).as("w"), col("n_blocks"),
            expr("srs div n_blocks").as("mean_rs_milli"))
      }
      val rs = rsRows(16).union(rsRows(64)).union(rsRows(256))
      val full = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      rs.withColumn("l16", max(when(col("w") === 16,
          round(log(col("mean_rs_milli").cast("double")) * 1000000, 0)
            .cast("long"))).over(full))
        .withColumn("l256", max(when(col("w") === 256,
          round(log(col("mean_rs_milli").cast("double")) * 1000000, 0)
            .cast("long"))).over(full))
        .select(col("w"), col("n_blocks"), col("mean_rs_milli"),
          expr("1000 * (l256 - l16) div 2772589").as("hurst_milli"))
        .orderBy("w")
    }),

    // newsvendor stocking decision from the empirical daily-order-count
    // distribution: Q* = the cu/(cu+co) = 3/4 critical fractile
    // (value-grouped CDF, strict-integer 4·cum ≥ 3·N test) vs the naive
    // mean-demand stock, with both EXACT expected-cost numerators (×N
    // units: Σ cnt·[co·(Q−d)⁺ + cu·(d−Q)⁺]) — the inventory twin of
    // q350's quantile machinery
    "q564_newsvendor" -> ((s, dir) => {
      val vg = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d"))
        .agg(count(lit(1)).as("dem"))
        .groupBy("dem").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(false)
      val upto = Window.orderBy("dem").rowsBetween(Window.unboundedPreceding, 0)
      val qs = vg.withColumn("cum", sum(col("cnt")).over(upto))
        .withColumn("tot", sum(col("cnt")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("tdem", sum(expr("dem * cnt")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(expr("4 * cum >= 3 * tot"))
        .agg(min(col("dem")).as("qstar"), max(col("tot")).as("n_days"),
          max(expr("tdem div tot")).as("qmean"))
      vg.crossJoin(broadcast(qs))
        .agg(max(col("n_days")).as("n_days"), max(col("qstar")).as("qstar"),
          max(col("qmean")).as("qmean"),
          sum(expr("cnt * (greatest(qstar - dem, 0)" +
            " + 3 * greatest(dem - qstar, 0))")).as("cost_qstar_num"),
          sum(expr("cnt * (greatest(qmean - dem, 0)" +
            " + 3 * greatest(dem - qmean, 0))")).as("cost_qmean_num"))
    }),

    // EOQ (economic order quantity) per brand: √(2DS/h) with the radical
    // kept a PURE product — isqrt(2·D·S·h) div h — q427's chain, so the
    // classic closed form stays exact integers; D = annual demand units,
    // S = 10000¢ fixed ordering cost, h = 20% of the brand's mean retail
    // price in cents (floor). The replenishment-planning readout
    "q565_eoq_plan" -> ((s, dir) => {
      val pb = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"),
          centsOf(col("p_retailprice")).as("pc"))
      val d = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity"))
        .join(pb, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("dunits"),
          count(lit(1)).as("nl"), sum(col("pc")).as("spc"))
        .withColumn("h", expr("spc div (5 * nl)"))
        .withColumn("rad", expr("2 * dunits * 10000 * h"))
        .withColumn("t0", floor(sqrt(col("rad").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + rad div t0) div 2 ELSE 0 END"))
        .withColumn("rt", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= rad THEN t1 + 1" +
            " WHEN t1 * t1 > rad THEN t1 - 1 ELSE t1 END"))
      d.select(col("p_brand").as("brand"), col("dunits"), col("h").as("h_cents"),
          expr("rt div h").as("eoq_units"),
          expr("CASE WHEN rt div h > 0 THEN dunits div (rt div h)" +
            " ELSE 0 END").as("orders_per_cycle"))
        .orderBy("brand")
    }),

    // forced-response randomized survey (Warner-style privacy mechanism):
    // each customer answers honestly with p=1/2 else answers a forced
    // md5 coin — the aggregate UNBIASES to p̂ = (4·yes − n)/(2n) without
    // any row revealing its true bit (acctbal < 0). Both coins are md5
    // parities (portable), the estimate and truth compare in exact ppm —
    // the mechanism-level counterpart of q514's DP noise
    "q566_randomized_response" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          (col("c_acctbal") < 0).cast("long").as("truth"),
          Dedup.md5Long(concat(lit("rr#"), col("c_custkey").cast("string")), 12)
            .as("u"))
        .select(col("truth"),
          when(col("u") % 2 === 0, col("truth"))
            .otherwise(expr("(u div 2) % 2")).as("yes"))
        .agg(count(lit(1)).as("n_respondents"),
          sum(col("yes")).as("ny"), sum(col("truth")).as("nt"))
        .select(col("n_respondents"),
          expr("ny * 1000000 div n_respondents").as("yes_ppm"),
          expr("(4 * ny - n_respondents) * 1000000 div (2 * n_respondents)")
            .as("est_ppm"),
          expr("nt * 1000000 div n_respondents").as("true_ppm"),
          expr("(4 * ny - n_respondents) * 1000000 div (2 * n_respondents)" +
            " - nt * 1000000 div n_respondents").as("err_ppm"))
    }),

    // Cochran–Mantel–Haenszel test: BUILDING-segment exposure vs
    // order-status-F outcome, STRATIFIED by the customer's region — the
    // confounder-adjusted 2×2 that q290's pooled Cramér's V can't give
    // (q246 shows why pooling flips). Per-stratum deviation/variance
    // quantize to micro once (single div each), plus the Mantel–Haenszel
    // common odds ratio from the same five 2×2 tables
    "q567_cmh_test" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .join(Tables.nation(s, dir),
          col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name"),
          (col("c_mktsegment") === "BUILDING").cast("long").as("ex"))
      val tab = Tables.orders(s, dir)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n"), sum(col("ex")).as("r1"),
          sum((col("o_orderstatus") === "F").cast("long")).as("c1"),
          sum(expr("ex * CAST(o_orderstatus = 'F' AS LONG)")).as("a"))
        .select(col("r_name"), col("n"), col("r1"), col("c1"), col("a"),
          expr("1000000 * (a * n - r1 * c1) div n").as("d_micro"),
          expr("CAST(1000000 AS DECIMAL(38,0)) * r1 * (n - r1) * c1 * (n - c1)" +
            " div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))").as("v_micro"),
          expr("1000000 * (a * (n - r1 - c1 + a)) div n").as("ad_micro"),
          expr("1000000 * ((r1 - a) * (c1 - a)) div n").as("bc_micro"))
      tab.agg(count(lit(1)).as("n_strata"),
          sum(col("d_micro")).as("sd"), sum(col("v_micro")).as("sv"),
          sum(col("ad_micro")).as("mhn"), sum(col("bc_micro")).as("mhd"))
        .select(col("n_strata"), col("sd").as("sum_dev_micro"),
          col("sv").as("sum_var_micro"),
          expr("CAST((1000 * CAST(sd AS DECIMAL(38,0)) * sd)" +
            " div (1000000 * CAST(sv AS DECIMAL(38,0))) AS BIGINT)")
            .as("chi2_milli"),
          expr("1000 * mhn div mhd").as("or_milli"))
    }),

    // Hodges–Lehmann shift estimate between EUROPE and ASIA monthly
    // revenues: the median of ALL pairwise differences — the robust
    // "how much more does Europe sell per month" number whose breakdown
    // point q289-style rank tests only imply. Bounded 84×84 month-pair
    // grid, doubled-order-stat median so ties stay exact
    "q568_hodges_lehmann" -> ((s, dir) => {
      val mo = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin("EUROPE", "ASIA"))
        .groupBy(col("r_name"),
          date_format(col("o_orderdate"), "yyyy-MM").as("t"))
        .agg(sum(centsOf(col("o_totalprice"))).as("v"))
        .localCheckpoint(false)
      val e = mo.filter(col("r_name") === "EUROPE")
        .select(col("t").as("te"), col("v").as("ve"))
      val a = mo.filter(col("r_name") === "ASIA")
        .select(col("t").as("ta"), col("v").as("va"))
      val diffs = e.crossJoin(broadcast(a))
        .select((col("ve") - col("va")).as("dd"), col("te"), col("ta"))
        .withColumn("rk", row_number()
          .over(Window.orderBy("dd", "te", "ta")).cast("long"))
      diffs.withColumn("np", count(lit(1)).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(col("rk") === expr("(np + 1) div 2") ||
          col("rk") === expr("(np + 2) div 2"))
        .withColumn("mult", when(expr("np % 2 = 1"), 2L).otherwise(1L))
        .agg(max(col("np")).as("n_pairs"),
          sum(expr("dd * mult")).as("hl2_cents"))
        .select(col("n_pairs"), col("hl2_cents"),
          expr("hl2_cents div 2").as("hl_cents"))
    }),

    // truncated Katz centrality (4 attenuated steps, α = 1/4) on the
    // directed supplier→customer nation trade graph (q501's edges): how
    // much 1/2/3/4-hop trade flows INTO each nation, geometric damping —
    // the path-counting view beside q501's mutually-recursive HITS. The
    // 25-node dictionary iterates as four bounded broadcast joins;
    // floor-div damping is pinned identically in both engines
    "q569_katz_centrality" -> ((s, dir) => {
      val cn = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey").as("cnat"))
      val sn = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("s_nationkey").as("snat"))
        .distinct()
      val edges = cn.join(sn, col("o_orderkey") === col("l_orderkey"))
        .select("snat", "cnat").distinct().localCheckpoint(false)
      val nations = Tables.nation(s, dir)
        .select(col("n_nationkey").as("node"), col("n_name"))
      def step(x: DataFrame): DataFrame = {
        val sin = edges.join(x, col("snat") === col("node"))
          .groupBy(col("cnat")).agg(sum(col("xv")).as("insum"))
        nations.join(broadcast(sin), col("node") === col("cnat"), "left")
          .select(col("node"), col("n_name"),
            expr("1000 + coalesce(insum, 0) div 4").as("xv"))
      }
      val x0 = nations.withColumn("xv", lit(1000L))
      val x4 = step(step(step(step(x0))))
      x4.select(col("n_name").as("nation"), col("xv").as("katz_milli"))
        .orderBy("nation")
    }),

    // resource-allocation link-prediction index on q292's brand
    // co-occurrence graph: RA = Σ_z 1/deg(z) over common neighbors of
    // non-adjacent pairs — the pure-integer cousin of Adamic–Adar
    // (1e6 div deg, no logarithm) that punishes hub intermediaries
    // harder; same median-thresholded edge set, same bounded two-hop
    "q570_resource_allocation" -> ((s, dir) => {
      val ob = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("p_brand")).as("bs"))
        .select(explode(col("bs")).as("u"), col("bs"))
        .select(col("u"), explode(col("bs")).as("v"))
        .filter(col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("w"))
        .localCheckpoint(false)
      val m2 = ob
        .withColumn("rk", row_number().over(Window.orderBy(col("w"), col("u"), col("v"))))
        .withColumn("np", count(lit(1)).over(Window.partitionBy()))
        .agg((sum(when(col("rk") === expr("(np + 1) div 2"), col("w"))) +
          sum(when(col("rk") === expr("(np + 2) div 2"), col("w")))).as("m2"))
      val edges = ob.crossJoin(broadcast(m2)).filter(col("w") * 2 > col("m2"))
        .select("u", "v").localCheckpoint(false)
      val ed = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val deg = ed.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
      val twoHop = ed.select(col("u").as("a"), col("v").as("wnode"))
        .join(ed.select(col("u").as("wnode"), col("v").as("b")), "wnode")
        .filter(col("a") < col("b"))
        .join(edges.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"), "left_anti")
      twoHop
        .join(broadcast(deg), col("wnode") === col("node"))
        .groupBy(col("a").as("brand_a"), col("b").as("brand_b"))
        .agg(count(lit(1)).as("n_common"),
          sum(expr("1000000 div deg")).as("ra_micro"))
        .orderBy(col("ra_micro").desc, col("brand_a"), col("brand_b"))
        .limit(25)
    }),

    // Elias–Fano posting-list size audit: per brand, the EF space bound
    // n·(2 + ⌊log₂(U/n)⌋) vs the measured delta-gap bits Σ|bin(gap)| of
    // its sorted orderkey postings — which brands' postings compress and
    // by how much (q311/q373's postings, storage-planning view). log₂
    // comes from binary-string LENGTH so both engines stay exact
    "q571_elias_fano" -> ((s, dir) => {
      val post = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"), col("l_orderkey").as("k"))
        .distinct()
      val byK = Window.partitionBy("brand").orderBy("k")
      post.withColumn("gap", col("k") - coalesce(lag(col("k"), 1).over(byK),
          lit(0L)))
        .filter(col("gap") > 0)
        .groupBy("brand")
        .agg(count(lit(1)).as("n_postings"), max(col("k")).as("universe"),
          sum(length(bin(col("gap"))).cast("long")).as("delta_bits"))
        .withColumn("ef_bits", expr(
          "n_postings * (2 + length(bin(universe div n_postings)) - 1)"))
        .select(col("brand"), col("n_postings"), col("universe"),
          col("delta_bits"), col("ef_bits"),
          expr("ef_bits * 1000000 div delta_bits").as("ef_vs_delta_ppm"))
        .orderBy("brand")
    }),

    // weighted log-rank family on q518's AUTOMOBILE-vs-HOUSEHOLD customer
    // lifetimes: Gehan–Breslow (w = n at risk, early-difference
    // sensitive) and Tarone–Ware (w = isqrt(n), the compromise) beside
    // the plain log-rank — one risk-set pass computes all three χ²,
    // per-stratum micro quantization, one isqrt per event time
    "q572_weighted_logrank" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
        .select(col("c_custkey"),
          (col("c_mktsegment") === "AUTOMOBILE").cast("long").as("g1"))
      val life = Tables.orders(s, dir)
        .join(seg, col("o_custkey") === col("c_custkey"))
        .groupBy("o_custkey", "g1")
        .agg(datediff(max(col("o_orderdate")), min(col("o_orderdate"))).as("t"))
      val et = life.groupBy("t")
        .agg(sum(col("g1")).as("d1"), count(lit(1)).as("d"))
        .localCheckpoint(false)
      val after = Window.orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val risk = et
        .withColumn("n1t", sum(col("d1")).over(after))
        .withColumn("nt", sum(col("d")).over(after))
        .withColumn("t0", floor(sqrt(col("nt").cast("double"))).cast("long"))
        .withColumn("t1", expr(
          "CASE WHEN t0 > 0 THEN (t0 + nt div t0) div 2 ELSE 0 END"))
        .withColumn("sq", expr(
          "CASE WHEN (t1 + 1) * (t1 + 1) <= nt THEN t1 + 1" +
            " WHEN t1 * t1 > nt THEN t1 - 1 ELSE t1 END"))
        .select(col("d1"), col("d"), col("n1t"), col("nt"), col("sq"),
          expr("d1 * 1000000 - d * n1t * 1000000 div nt").as("dev_micro"),
          expr("CASE WHEN nt > 1 THEN CAST(d AS DECIMAL(38,0)) * n1t" +
            " * (nt - n1t) * (nt - d) * 1000000" +
            " div (CAST(nt AS DECIMAL(38,0)) * nt * (nt - 1))" +
            " ELSE 0 END").as("v_micro"))
      def chi2(wNum: String, wVar: String, out: String): Column = expr(
        s"CAST((sum(CAST($wNum AS DECIMAL(38,0)) * dev_micro)" +
          s" * sum(CAST($wNum AS DECIMAL(38,0)) * dev_micro))" +
          s" div (1000000 * sum(CAST($wVar AS DECIMAL(38,0)) * v_micro))" +
          s" AS BIGINT)").as(out)
      risk.agg(count(lit(1)).as("n_times"),
        chi2("1", "1", "logrank_chi2_micro"),
        chi2("nt", "nt * nt", "gehan_chi2_micro"),
        chi2("sq", "nt", "tw_chi2_micro"))
    }),

    // inequality panel over per-customer total spend: Theil T (micro-nat
    // entropy form, one pinned ln per customer), Hoover/Robin-Hood index
    // (exact integer Σ|n·x − S| / 2nS), and Atkinson(ε=1) via the
    // geometric mean (mean micro-nat, ONE exp) — the decomposable
    // complements of q204's Gini on the same concentration question
    "q573_inequality_panel" -> ((s, dir) => {
      val sp = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(centsOf(col("o_totalprice"))).as("x"))
        .filter(col("x") > 0)
        .withColumn("lx", round(log(col("x").cast("double")) * 1000000, 0)
          .cast("long"))
        .localCheckpoint(false)
      val tot = sp.agg(count(lit(1)).as("n"), sum(col("x")).as("st"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * lx")).as("sxl"),
        sum(col("lx")).as("sl"))
      val hoover = sp.crossJoin(broadcast(tot.select(col("n"), col("st"))))
        .agg(sum(expr("abs(CAST(n AS DECIMAL(38,0)) * x - st)")).as("sad"))
      tot.crossJoin(broadcast(hoover))
        .withColumn("lnn", round(log(col("n").cast("double")) * 1000000, 0)
          .cast("long"))
        .withColumn("lns", round(log(col("st").cast("double")) * 1000000, 0)
          .cast("long"))
        .withColumn("geo", expr(
          "CAST(round(exp(CAST(sl div n AS DOUBLE) / 1000000.0)) AS BIGINT)"))
        .select(col("n").as("n_customers"), col("st").as("total_cents"),
          expr("(sxl + CAST(lnn - lns AS DECIMAL(38,0)) * st) div st")
            .as("theil_micro"),
          col("geo").as("geomean_cents"),
          expr("1000000 - CAST(geo AS DECIMAL(38,0)) * n * 1000000 div st")
            .as("atkinson1_ppm"),
          expr("CAST(1000000 AS DECIMAL(38,0)) * sad div (2 * n * st)")
            .as("hoover_ppm"))
    }),

    // Siegel–Tukey dispersion test on per-customer spend, MACHINERY vs
    // FURNITURE: alternating-extreme ranks (lowest→1, two highest→2,3,
    // next two lowest→4,5 …) turn a rank-sum difference into a SPREAD
    // difference; Wilcoxon moments on the ST ranks give the exact-rational
    // z². Deterministic custkey tie-break; an odd N's middle value takes
    // rank N (the conventional discard-free assignment)
    "q574_siegel_tukey" -> ((s, dir) => {
      val sp = twoSegSpend(s, dir, "MACHINERY", "FURNITURE")
      sp.withColumn("i",
          row_number().over(Window.orderBy("v", "o_custkey")).cast("long"))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
        .withColumn("st", expr(
          "CASE WHEN 2 * i - 1 = nn THEN nn" +
            " WHEN i <= nn - i + 1 THEN" +
            " CASE WHEN i % 2 = 1 THEN 2 * i - 1 ELSE 2 * i END" +
            " ELSE CASE WHEN (nn - i + 1) % 2 = 1 THEN 2 * (nn - i + 1)" +
            " ELSE 2 * (nn - i + 1) - 1 END END"))
        // rank sums grow O(nn²): decimal accumulation (the output casts
        // back to BIGINT — a readout; the statistic uses the exact sum)
        .agg(sum(col("ga")).as("n_a"), sum(lit(1L) - col("ga")).as("n_b"),
          sum(when(col("ga") === 1, col("st")).otherwise(0L).cast(dec38))
            .as("w_a"))
        .withColumn("nn", col("n_a") + col("n_b"))
        .select(col("n_a"), col("n_b"), col("w_a").cast("long").as("w_a"),
          expr(wilcoxonZsqMilli).as("zsq_milli"))
    }),

    // Ansari–Bradley scale test on the same two-sample spend: center-out
    // scores min(i, N+1−i) concentrate small scores at the extremes, so a
    // low group score-sum reads as WIDER dispersion; exact even/odd
    // moments (the N-parity branch scipy uses), all-integer z²
    "q575_ansari_bradley" -> ((s, dir) => {
      val sp = twoSegSpend(s, dir, "MACHINERY", "FURNITURE")
      sp.withColumn("i",
          row_number().over(Window.orderBy("v", "o_custkey")).cast("long"))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
        .withColumn("ab", least(col("i"), col("nn") - col("i") + 1))
        // center-out score sum grows O(nn²): decimal accumulation
        .agg(sum(col("ga")).as("n_a"), sum(lit(1L) - col("ga")).as("n_b"),
          sum(when(col("ga") === 1, col("ab")).otherwise(0L).cast(dec38))
            .as("a_sum"))
        .withColumn("nn", col("n_a") + col("n_b"))
        .select(col("n_a"), col("n_b"), col("a_sum").cast("long").as("a_sum"),
          expr(abZsqMilli).as("zsq_milli"))
    }),

    // Lepage location-AND-scale test: the sum of the Wilcoxon z² (plain
    // ranks, location) and the Ansari–Bradley z² (center-out ranks,
    // scale) — the standard omnibus for "did the distribution move OR
    // widen". Both components from ONE rank window over the bounded
    // per-customer relation; each exact-rational in milli
    "q576_lepage" -> ((s, dir) => {
      val sp = twoSegSpend(s, dir, "MACHINERY", "FURNITURE")
      sp.withColumn("i",
          row_number().over(Window.orderBy("v", "o_custkey")).cast("long"))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
        .withColumn("ab", least(col("i"), col("nn") - col("i") + 1))
        .agg(sum(col("ga")).as("n_a"), sum(lit(1L) - col("ga")).as("n_b"),
          sum(when(col("ga") === 1, col("i")).otherwise(0L).cast(dec38))
            .as("w_a"),
          sum(when(col("ga") === 1, col("ab")).otherwise(0L).cast(dec38))
            .as("a_sum"))
        .withColumn("nn", col("n_a") + col("n_b"))
        .withColumn("zw2", expr(wilcoxonZsqMilli))
        .withColumn("zab2", expr(abZsqMilli))
        .select(col("n_a"), col("n_b"),
          col("zw2").as("wilcoxon_zsq_milli"), col("zab2").as("ab_zsq_milli"),
          (col("zw2") + col("zab2")).as("lepage_milli"))
    }),

    // Cucconi location-scale test: squared ranks (U) and squared CONTRARY
    // ranks (V) of group a, combined through their exact correlation
    // ρ = (2(N²−4) − b)/b, b = (2N+1)(8N+11). Rank sums NU/NV are exact
    // longs; only the final quadratic form runs in doubles — in the SAME
    // literal op order as the oracle (q61 discipline), C ≥ 0 so the
    // half-away milli rounding agrees
    "q577_cucconi" -> ((s, dir) => {
      val sp = twoSegSpend(s, dir, "MACHINERY", "FURNITURE")
      sp.withColumn("i",
          row_number().over(Window.orderBy("v", "o_custkey")).cast("long"))
        .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
        // squared ranks are O(nn²) per TERM and O(nn³) summed — decimal
        // from the first multiply; nu/nv/bb likewise (n_a·nn² wraps LONG
        // at ~2e6 two-segment customers)
        .agg(sum(col("ga")).as("n_a"), sum(lit(1L) - col("ga")).as("n_b"),
          sum(when(col("ga") === 1, col("i").cast(dec38) * col("i"))
            .otherwise(lit(0).cast(dec38))).as("sr2"),
          sum(when(col("ga") === 1, (col("nn") - col("i") + 1).cast(dec38)
            * (col("nn") - col("i") + 1))
            .otherwise(lit(0).cast(dec38))).as("sc2"))
        .withColumn("nn", col("n_a") + col("n_b"))
        .withColumn("nu", expr(
          "6 * sr2 - CAST(n_a AS DECIMAL(38,0)) * (nn + 1) * (2 * nn + 1)"))
        .withColumn("nv", expr(
          "6 * sc2 - CAST(n_a AS DECIMAL(38,0)) * (nn + 1) * (2 * nn + 1)"))
        .withColumn("bb", expr(
          "CAST(2 * nn + 1 AS DECIMAL(38,0)) * (8 * nn + 11)"))
        .withColumn("dd", expr("CAST(n_a AS DOUBLE) * n_b * (nn + 1)" +
          " * (2 * nn + 1) * (8 * nn + 11) / 5.0"))
        .withColumn("u2", expr("CAST(nu AS DOUBLE) * nu / dd"))
        .withColumn("v2", expr("CAST(nv AS DOUBLE) * nv / dd"))
        .withColumn("uv", expr("CAST(nu AS DOUBLE) * nv / dd"))
        .withColumn("rho", expr(
          "(2 * (CAST(nn AS DOUBLE) * nn - 4) - CAST(bb AS DOUBLE))" +
            " / CAST(bb AS DOUBLE)"))
        .select(col("n_a"), col("n_b"),
          col("nu").cast("long").as("nu"), col("nv").cast("long").as("nv"),
          expr("CAST(round((u2 + v2 - 2 * rho * uv)" +
            " / (2 * (1 - rho * rho)) * 1000) AS BIGINT)").as("cucconi_milli"))
    }),
  )
}
