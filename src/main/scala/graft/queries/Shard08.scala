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
private[graft] object Shard08 {
  val defs: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

    // per-user behavioral entropy: event-type distribution entropy per
    // user (single-ln micro-nats, q429's convention), histogrammed in
    // 0.1-nat buckets — the "bots repeat one action, humans mix"
    // segmentation readout; all libm work happens on the per-(user,
    // type) count relation
    "q450_user_entropy" -> ((s, dir) => {
      val lnq: Column => Column = x =>
        round(log(x.cast("double")) * 1000000, 0).cast("long")
      Tables.events(s, dir)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(sum(col("c")).as("nu"), sum(col("c") * lnq(col("c"))).as("sl"))
        .select(col("user_id"),
          (lnq(col("nu")) - expr("sl div nu")).as("h_micro"))
        .groupBy(expr("h_micro div 100000").as("bucket"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("bucket")
    }),

    // quantile treatment effect: per-decile order-statistic difference
    // of n_chars between the md5 experiment arms — where in the
    // distribution the arms differ, which the mean-based q314/q443
    // readouts can't localize. Order stats picked exactly at rank
    // (d·n) div 10 via per-arm rank windows (at 100 TB the same ranks
    // come from approx-quantile + verify); the decile join is bounded
    "q451_qte_deciles" -> ((s, dir) => {
      import s.implicits._
      val base = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select((Dedup.md5Long(concat(lit("qte#"),
          col("doc_id").cast("string")), 12) % 2).as("arm"),
          col("n_chars"), col("doc_id"))
      val wa = Window.partitionBy("arm").orderBy(col("n_chars"), col("doc_id"))
      val ranked = base
        .withColumn("rn", row_number().over(wa).cast("long"))
        .withColumn("na", count(lit(1)).over(Window.partitionBy("arm")))
        .localCheckpoint(false)
      val ds = ranked
        .join(broadcast((1L to 9L).toDF("d")),
          col("rn") === expr("greatest(1, d * na div 10)"))
        .groupBy("d")
        .agg(max(when(col("arm") === 0, col("n_chars"))).as("v_ctrl"),
          max(when(col("arm") === 1, col("n_chars"))).as("v_treat"))
      ds.select(col("d").as("decile"), col("v_ctrl"), col("v_treat"),
          (col("v_treat") - col("v_ctrl")).as("qte"))
        .orderBy("decile")
    }),

    // cross-modal sanity: Pearson correlation (milli, exact integer
    // sums + isqrt) between a doc's n_chars and its embedding's
    // quantized squared norm — a cheap "are these embeddings actually
    // of these documents" alignment check before any retrieval build
    // trusts the id join
    "q452_text_embed_corr" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id").as("doc_id"),
          expr("aggregate(transform(embedding," +
            " v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))," +
            " CAST(0 AS BIGINT), (acc, q) -> acc + q * q) div 1000000").as("y"))
      val j = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars").as("x"))
        .join(emb, Seq("doc_id"))
      j.agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec38)).as("sx"), sum(col("y").cast(dec38)).as("sy"),
          sum((col("x") * col("y")).cast(dec38)).as("sxy"),
          sum((col("x") * col("x")).cast(dec38)).as("sxx"),
          sum((col("y").cast(dec38) * col("y"))).as("syy"))
        .withColumn("num", expr("n * sxy - sx * sy"))
        .withColumn("dd", expr("(n * sxx - sx * sx) * (n * syy - sy * sy)"))
        .withColumn("t0", floor(sqrt(col("dd").cast("double"))).cast(dec38))
        .withColumn("t1", expr("(t0 + dd div t0) div 2"))
        .withColumn("t2", expr("(t1 + dd div t1) div 2"))
        .withColumn("rt", expr(
          "CASE WHEN CAST(t2 + 1 AS DECIMAL(38,0)) * (t2 + 1) <= dd THEN t2 + 1" +
            " WHEN CAST(t2 AS DECIMAL(38,0)) * t2 > dd THEN t2 - 1 ELSE t2 END"))
        .select(col("n").as("n_docs"),
          expr("CASE WHEN num >= 0 THEN (1000 * num) div rt" +
            " ELSE -((1000 * (-num)) div rt) END").as("pearson_milli"))
    }),

    // moving-block bootstrap SE of mean monthly revenue — the honest
    // uncertainty for an AUTOCORRELATED series (q121's iid bootstrap
    // understates it): 50 deterministic md5 replicates × contiguous
    // 4-month blocks, replicate means in exact k$, SE via the
    // B·Σm²−(Σm)² identity + isqrt; the block/replicate grid is bounded
    // and joins the month dictionary by index
    "q453_block_bootstrap" -> ((s, dir) => {
      import s.implicits._
      val rev = Tables.orders(s, dir)
        .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        // k$ units keep every variance term far inside long range (the
        // q438 trade): cents-scale v2 would wrap the div's long quotient
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))" +
          " div 100000 AS BIGINT)").as("y"))
        .withColumn("rn", row_number().over(Window.orderBy("mi")).cast("long"))
        .localCheckpoint(false)
      val nrow = rev.agg(count(lit(1)).as("n"))
      val grid = s.range(50).select(col("id").as("r"))
        .crossJoin(s.range(20).select(col("id").as("j")))
        .crossJoin(broadcast(nrow))
        .filter(col("j") < expr("n div 4"))
        .withColumn("start", expr("1 + CAST(conv(substring(md5(" +
          "concat('bb#', r, '#', j)), 1, 12), 16, 10) AS BIGINT) % (n - 3)"))
      val reps = grid
        .crossJoin(broadcast((0L to 3L).toDF("o")))
        .withColumn("rn", col("start") + col("o"))
        .join(rev.select("rn", "y"), Seq("rn"))
        .groupBy("r")
        .agg(count(lit(1)).as("len"), sum(col("y")).as("ssum"))
        .select(col("r"), expr("ssum div len").as("m"))
      reps.agg(count(lit(1)).as("b"),
          sum(col("m").cast(dec38)).as("sm"),
          sum((col("m").cast(dec38) * col("m"))).as("smm"))
        .withColumn("v2", expr("(b * smm - sm * sm) div (CAST(b AS DECIMAL(38,0)) * b)"))
        .withColumn("t0", floor(sqrt(col("v2").cast("double"))).cast("long"))
        .withColumn("t1", expr("CASE WHEN t0 > 0 THEN (t0 + v2 div t0) div 2 ELSE 0 END"))
        .select(col("b").as("n_replicates"),
          expr("sm div b").cast("long").as("boot_mean_kusd"),
          expr("CASE WHEN (t1 + 1) * (t1 + 1) <= v2 THEN t1 + 1" +
            " WHEN t1 * t1 > v2 THEN t1 - 1 ELSE t1 END").as("boot_se_kusd"))
    }),

    // chunk-stitch detection: doc A's trailing 3 words == doc B's
    // leading 3 words — the boundary-overlap artifact a fixed-width
    // chunker (q97) leaves behind, invisible to whole-doc dedup. Affixes
    // are map-side per-row slices; the only shuffle is the
    // suffix = prefix equi-join
    "q454_chunk_stitch" -> ((s, dir) => {
      val affix = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          filter(split(col("text"), " ", -1), x => length(x) > 0).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"),
          concat_ws(" ", slice(col("ws"), 1, 3)).as("pre"),
          concat_ws(" ", expr("slice(ws, size(ws) - 2, 3)")).as("suf"))
        .localCheckpoint(false)
      affix.as("a").join(affix.as("b"),
          col("a.suf") === col("b.pre") && col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.suf").as("affix"))
        .orderBy("doc_a", "doc_b")
    }),

    // float-drift audit: the numerics-honesty check behind the
    // everything-in-integer-cents discipline — each engine sums the raw
    // doubles ITS OWN way (order-dependent, not comparable) and asserts
    // the drift against the exact cents sum stays under a cent per
    // thousand rows; only the exact sum and the bound verdict cross
    // engines (q38's bound-check pattern)
    "q455_float_drift_audit" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
          col("c_custkey") === col("o_custkey"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_orders"),
          sum(centsOf(col("o_totalprice"))).as("revenue_cents"),
          sum(col("o_totalprice")).as("_dsum"))
        .select(col("segment"), col("n_orders"), col("revenue_cents"),
          (abs(col("_dsum") * 100 - col("revenue_cents")) <
            greatest(lit(1.0), col("n_orders") * lit(0.001))).as("drift_within_bound"))
        .orderBy("segment")),

    // BM25 k1 sensitivity sweep: the q209 scorer at k1 ∈ {0.8, 1.2, 2.0}
    // (b = 3/4), each as exact integer rationals with per-config
    // coefficients (num, tf·L, L, len·N) derived from k1 = p/q — the
    // term-saturation tuning readout: does the ranking CARE about k1 on
    // this corpus? Shared tf/idf/lens relations computed once
    "q456_bm25_k1_sweep" -> ((s, dir) => {
      val words = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .localCheckpoint(false)
      val lens = words.groupBy("doc_id").agg(count(lit(1)).as("len"))
      val totals = lens.agg(sum(col("len")).as("big_l"), count(lit(1)).as("big_n"))
      val tf = words.filter(col("w").isin("vector", "stream", "filter"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val idf = tf.groupBy("w").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(totals))
        .select(col("w"), round(log(lit(1.0) +
          ((col("big_n") - col("df")).cast("double") + 0.5) /
            (col("df").cast("double") + 0.5)) * 1000000, 0).cast("long")
          .as("idf_micro"))
      val base = tf.join(broadcast(idf), "w").join(lens, "doc_id")
        .crossJoin(broadcast(totals))
        .localCheckpoint(false)
      // k1 = p/q, b = 3/4 ⇒ score term = idf·4(p+q)·tf·L over
      // 4qL·tf + pL + 3p·len·N (q209's 44/20/6/18 is the (6,5) row)
      def config(k1Milli: Long, num: Long, ctf: Long, cl: Long, clen: Long) = base
        .withColumn("_num", col("idf_micro").cast(dec38) * num * col("tf")
          * col("big_l"))
        .withColumn("_den", lit(ctf).cast(dec38) * col("tf") * col("big_l")
          + lit(cl).cast(dec38) * col("big_l")
          + lit(clen).cast(dec38) * col("len") * col("big_n"))
        .withColumn("_c", expr("(2 * _num + _den) div (2 * _den)"))
        .groupBy("doc_id").agg(sum(col("_c")).as("bm25_micro"))
        .withColumn("k1_milli", lit(k1Milli))
      val all = config(800L, 36, 20, 4, 12)
        .union(config(1200L, 44, 20, 6, 18))
        .union(config(2000L, 12, 4, 2, 6))
      all.withColumn("rk", row_number().over(Window.partitionBy("k1_milli")
          .orderBy(col("bm25_micro").desc, col("doc_id"))).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("k1_milli"), col("rk"), col("doc_id"), col("bm25_micro"))
        .orderBy("k1_milli", "rk")
    }),

    // zero-order entropy coding bound per source: char-frequency entropy
    // → bits/char → the best any dictionary-free entropy coder could do
    // on this source (the storage-planning twin of q326's encoding
    // planner, from first principles); one char explosion, single-ln
    // micro-nat terms on the bounded (source, char) relation
    "q457_entropy_coding_bound" -> ((s, dir) => {
      val lnq: Column => Column = x =>
        round(log(x.cast("double")) * 1000000, 0).cast("long")
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("source"), explode(sequence(lit(1), length(col("text")))).as("i"),
          col("text"))
        .select(col("source"), expr("substring(text, i, 1)").as("ch"))
        .groupBy("source", "ch").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum(col("c")).as("n_chars_total"),
          count(lit(1)).as("n_distinct_chars"),
          sum((col("c") * lnq(col("c"))).cast(dec38)).as("sl"))
        .withColumn("h_char_micro", expr(
          "CAST(CAST(round(ln(CAST(n_chars_total AS DOUBLE)) * 1000000) AS BIGINT)" +
            " - sl div n_chars_total AS BIGINT)"))
        .select(col("source"), col("n_chars_total"), col("n_distinct_chars"),
          col("h_char_micro"),
          expr("h_char_micro * 1000000000 div 693147181").as("bits_per_char_micro"),
          expr("CAST(n_chars_total AS DECIMAL(38,0))" +
            " * (h_char_micro * 1000000000 div 693147181) div 8000000")
            .as("est_bytes"))
        .orderBy("source")
    }),

    // intraclass correlation + design effect: how much do orders within
    // a customer resemble each other, and how much does that inflate the
    // variance of cluster sampling — DEFF = 1 + (m̄−1)·ICC, the survey
    // statistic that justifies q419's cluster jackknife. One-way ANOVA
    // components as exact integers with the q448 floor-div convention;
    // the (k−1)(m₀−1) term collapses to N − Σn² div N − k + 1 exactly
    "q458_icc_design_effect" -> ((s, dir) => {
      val per = Tables.orders(s, dir)
        .select(col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT) div 1000").as("y"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("ng"), sum(col("y")).as("sg"),
          sum(expr("y * y")).as("ssg"))
        .withColumn("ug", expr("CAST(sg AS DECIMAL(38,0)) * sg div ng"))
      per.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
          sum(col("sg").cast(dec38)).as("st"), sum(col("ssg").cast(dec38)).as("sst"),
          sum(col("ug").cast(dec38)).as("su"),
          sum((col("ng") * col("ng")).cast(dec38)).as("sn2"))
        .withColumn("ssb", expr("su - st * st div n"))
        .withColumn("ssw", expr("sst - su"))
        .withColumn("icc_milli", expr(
          "1000 * ((n - k) * CAST(ssb AS DECIMAL(38,0)) - (k - 1) * ssw)" +
            " div ((n - k) * CAST(ssb AS DECIMAL(38,0))" +
            " + (n - sn2 div n - k + 1) * ssw)"))
        .select(col("k").as("k_clusters"), col("n").as("n_obs"),
          col("icc_milli"),
          expr("1000 + (n div k - 1) * icc_milli").as("deff_milli"))
    }),

    // nonparametric median CI: the order-statistic interval at ranks
    // (n ± 1.96√n)/2 — distribution-free, exact integer ranks with the
    // isqrt(n) radical (seed + fix-ups; n < 2⁵² so the double seed is
    // already exact), order stats picked by one rank window. The
    // "how sure is my median" readout q33/q58's point estimates lack
    "q459_median_ci" -> ((s, dir) => {
      val v = Tables.orders(s, dir)
        .select(centsOf(col("o_totalprice")).as("v"), col("o_orderkey"))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("v"), col("o_orderkey"))).cast("long"))
        .localCheckpoint(false)
      val st = v.agg(count(lit(1)).as("n"))
        .withColumn("t0", floor(sqrt(col("n").cast("double"))).cast("long"))
        .withColumn("s", expr(
          "CASE WHEN (t0 + 1) * (t0 + 1) <= n THEN t0 + 1" +
            " WHEN t0 * t0 > n THEN t0 - 1 ELSE t0 END"))
        .withColumn("rad", expr("196 * s div 100"))
        .select(col("n"),
          expr("greatest(1, (n - rad) div 2)").as("lo_rank"),
          expr("least(n, (n + rad) div 2 + 1)").as("hi_rank"),
          expr("(n + 1) div 2").as("med_rank"))
      v.crossJoin(broadcast(st))
        .filter(col("rn") === col("lo_rank") || col("rn") === col("hi_rank") ||
          col("rn") === col("med_rank"))
        .groupBy("n")
        .agg(max(when(col("rn") === col("med_rank"), col("v"))).as("median_cents"),
          max(when(col("rn") === col("lo_rank"), col("v"))).as("lo_cents"),
          max(when(col("rn") === col("hi_rank"), col("v"))).as("hi_cents"))
        .select(col("n").as("n_orders"), col("median_cents"),
          col("lo_cents"), col("hi_cents"))
    }),

    // Ljung–Box portmanteau test on monthly revenue (lags 1..6): is the
    // series white noise at all, the gate before q438 fits an AR(2) —
    // Q = n(n+2)·Σ r_k²/(n−k) from the same exact N·y−S autocovariances,
    // each term one floor-div (C_k²·1e6 div (C_0²·(n−k))), identical on
    // both engines; the verdict compares against χ²₆ at 95%
    "q460_ljung_box" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000" +
          " AS BIGINT)").as("y"))
        .localCheckpoint(false)
      val st = rev.agg(count(lit(1)).as("nm"), sum("y").as("sy2"))
      val w = Window.orderBy("mi")
      val z = rev.crossJoin(broadcast(st))
        .withColumn("z", expr("nm * y - sy2"))
      val withLags = (1 to 6).foldLeft(z) { (df, k) =>
        df.withColumn(s"z$k", lag(col("z"), k).over(w))
      }
      val agg = withLags.agg(
        max(col("nm")).as("n"),
        // cast BEFORE the square: z grows with SF (q438's fix applied)
        sum(col("z").cast(dec38) * col("z")).as("c0") +:
          (1 to 6).map(k =>
            sum(col("z").cast(dec38) * col(s"z$k")).as(s"c$k")): _*)
      val terms = (1 to 6).map(k =>
        s"(c$k * c$k * 1000000) div (c0 * c0 * (n - $k))").mkString(" + ")
      agg.select(col("n").as("n_months"),
          expr(s"n * (n + 2) * ($terms)").as("q_micro"))
        .withColumn("reject_white_noise", col("q_micro") > 12591587L)
    }),

    // consistent-hashing ring placement: 4 nodes × 8 md5 vnodes, every
    // part key assigned to the first vnode clockwise (wraparound = the
    // global min) — the alternative to q276's rendezvous hashing, with
    // the balance readout that shows WHY vnodes exist (raw ring arcs are
    // uneven; 8 vnodes/node tighten the spread). The 32-row vnode table
    // broadcasts; assignment is a bounded min-struct aggregation per key
    "q461_hash_ring" -> ((s, dir) => {
      import s.implicits._
      val vnodes = (for (nd <- 0 to 3; vn <- 0 to 7) yield (nd.toLong, vn.toLong))
        .toDF("node", "vn")
        .withColumn("vpos", Dedup.md5Long(concat(lit("ring#"), col("node"),
          lit("#"), col("vn")), 12))
      val keys = Tables.part(s, dir)
        .select(col("p_partkey"),
          Dedup.md5Long(concat(lit("key#"), col("p_partkey").cast("string")), 12)
            .as("kpos"))
      keys.crossJoin(broadcast(vnodes))
        .groupBy("p_partkey")
        .agg(
          min(when(col("vpos") >= col("kpos"),
            struct(col("vpos"), col("node")))).as("nxt"),
          min(struct(col("vpos"), col("node"))).as("wrap"))
        .select(col("p_partkey"),
          coalesce(col("nxt.node"), col("wrap.node")).as("node"))
        .groupBy("node")
        .agg(count(lit(1)).as("n_keys"))
        .withColumn("share_ppm", expr(
          "n_keys * 1000000 div sum(n_keys) OVER ()"))
        .orderBy("node")
    }),

    // SRE error budget / burn rate: rolling 6-hour error share against a
    // 1% SLO over the 48-hour zero-filled grid — burn 1000 milli = the
    // budget burning exactly at allowance, the multi-window paging rule
    // (the q431 limiter's observability twin); windows on the bounded
    // hour dictionary only
    "q462_error_budget" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val mn = ev.agg(min(unix_micros(col("ts"))).as("t0"))
      val hours = ev.crossJoin(broadcast(mn))
        .select(expr("(unix_micros(ts) - t0) div 3600000000").as("hi"),
          col("event_type"))
        .filter(col("hi") < 48)
        .groupBy("hi")
        .agg(count(lit(1)).as("tot"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("err"))
      val grid = s.range(48).select(col("id").as("hi"))
        .join(hours, Seq("hi"), "left").na.fill(0L, Seq("tot", "err"))
      val w6 = Window.orderBy("hi").rowsBetween(-5, 0)
      grid
        .withColumn("tot6", sum(col("tot")).over(w6))
        .withColumn("err6", sum(col("err")).over(w6))
        .select(col("hi").as("hour_index"), col("tot"), col("err"),
          expr("CASE WHEN tot6 > 0 THEN err6 * 100000 div tot6 ELSE 0 END")
            .as("burn_milli_6h"))
        .withColumn("page", col("burn_milli_6h") > 10000L)
        .orderBy("hour_index")
    }),

    // RANGE vs ROWS running frames, made visible: the cumulative revenue
    // of 1995's orders under the default RANGE frame (date peers share
    // the cum value) vs a ROWS frame with a key tiebreak — per month, how
    // many rows diverge and by how much. The frame-semantics pitfall
    // every windowed metric silently steps on with tied order keys
    "q463_range_vs_rows" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(expr("year(o_orderdate) = 1995"))
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"),
          centsOf(col("o_totalprice")).as("v"))
      val rowsW = Window.orderBy(col("d"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val rangeW = Window.orderBy(col("d"))
      o.withColumn("cum_rows", sum(col("v")).over(rowsW))
        .withColumn("cum_range", sum(col("v")).over(rangeW))
        .groupBy(expr("CAST(month(d) AS BIGINT)").as("m"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("cum_rows") =!= col("cum_range"), 1L).otherwise(0L))
            .as("n_diverging"),
          max(abs(col("cum_rows") - col("cum_range"))).as("max_gap_cents"))
        .orderBy("m")
    }),

    // two-factor ANOVA with interaction (weekday × order priority, daily
    // order counts as the response): does the weekday effect DEPEND on
    // priority — the q448 one-way test can't ask that. All four sums of
    // squares from the shared U = S² div n floor convention
    // (cells/rows/cols/total), interaction by inclusion–exclusion; the
    // cell grid is 7×5 — everything past the first agg is bounded
    "q464_anova_interaction" -> ((s, dir) => {
      val cells = Tables.orders(s, dir)
        .groupBy(expr("CAST(dayofweek(o_orderdate) AS BIGINT)").as("wd"),
          col("o_orderpriority").as("pr"),
          col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("y"))
        .groupBy("wd", "pr")
        .agg(count(lit(1)).as("nc"), sum(col("y")).as("sc"),
          sum(expr("y * y")).as("ssc"))
        .localCheckpoint(false)
      val byA = cells.groupBy("wd").agg(sum("nc").as("na"), sum("sc").as("sa"))
        .agg(sum(expr("CAST(sa AS DECIMAL(38,0)) * sa div na")).as("ua"),
          count(lit(1)).as("a"))
      val byB = cells.groupBy("pr").agg(sum("nc").as("nb"), sum("sc").as("sb"))
        .agg(sum(expr("CAST(sb AS DECIMAL(38,0)) * sb div nb")).as("ub"),
          count(lit(1)).as("b"))
      cells.agg(sum("nc").as("n"), sum("sc").as("st"), sum("ssc").as("sst"),
          sum(expr("CAST(sc AS DECIMAL(38,0)) * sc div nc")).as("uc"),
          count(lit(1)).as("ncells"))
        .crossJoin(broadcast(byA)).crossJoin(broadcast(byB))
        .withColumn("ut", expr("CAST(st AS DECIMAL(38,0)) * st div n"))
        .select(col("a"), col("b"), col("n").as("n_days_cells"),
          expr("CAST(uc - ua - ub + ut AS BIGINT)").as("ss_interaction"),
          expr("CAST(CAST(sst AS DECIMAL(38,0)) - uc AS BIGINT)").as("ss_within"),
          expr("CAST(1000 * (n - a * b) * (uc - ua - ub + ut)" +
            " div (CAST((a - 1) * (b - 1) AS DECIMAL(38,0))" +
            " * (CAST(sst AS DECIMAL(38,0)) - uc)) AS BIGINT)").as("f_int_milli"))
    }),

    // stratified average treatment effect: per-lang arm contrast of
    // n_chars (md5 arms), each stratum's ATE an exact cross-multiplied
    // milli ratio — the Cochran-style adjustment that stops a lang-mix
    // imbalance from masquerading as a treatment effect (q443 checks
    // balance; this estimates THROUGH imbalance)
    "q465_stratified_ate" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("lang"),
          (Dedup.md5Long(concat(lit("qte#"), col("doc_id").cast("string")), 12) % 2)
            .as("arm"),
          col("n_chars"))
        .groupBy("lang")
        .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nc"),
          sum(when(col("arm") === 1, col("n_chars")).otherwise(0L)).as("st"),
          sum(when(col("arm") === 0, col("n_chars")).otherwise(0L)).as("sc"))
        .withColumn("ate_milli", expr(
          "CAST(1000 * (CAST(st AS DECIMAL(38,0)) * nc - CAST(sc AS DECIMAL(38,0)) * nt)" +
            " div (CAST(nt AS DECIMAL(38,0)) * nc) AS BIGINT)"))
        .select(col("lang"), col("nt"), col("nc"), col("ate_milli"))
        .orderBy("lang")),

    // L-moments of the order-total distribution: L-scale (half the Gini
    // mean difference) and the L-skewness ratio τ₃ — the robust shape
    // measures that exist for ANY distribution with a mean (unlike
    // classical skewness) and come straight from rank-weighted sums:
    // λ₂ ∝ Σ(2i−n−1)x₍ᵢ₎, λ₃ ∝ Σ[C(i−1,2) − 2(i−1)(n−i) + C(n−i,2)]x₍ᵢ₎,
    // τ₃ exact via cross-multiplied integers. One global rank window
    // (the documented at-scale trade), then pure integer reduction
    "q466_l_moments" -> ((s, dir) => {
      val v = Tables.orders(s, dir)
        .select(centsOf(col("o_totalprice")).as("x"), col("o_orderkey"))
        .withColumn("i", row_number().over(
          Window.orderBy(col("x"), col("o_orderkey"))).cast("long"))
      v.crossJoin(broadcast(v.agg(count(lit(1)).as("n"))))
        .agg(max(col("n")).as("n"),
          sum(col("x").cast(dec38)).as("sx"),
          sum(expr("CAST(i * 2 - n - 1 AS DECIMAL(38,0)) * x")).as("l2n"),
          // the rank binomials are O(n²) per TERM: widen i before the
          // products (they wrap LONG past ~3e9 orders). l3n itself is
          // O(n³·x) — within decimal(38) to ~9e10 rows; past that the
          // τ₃ formulation needs the normalized-double path, documented
          sum(expr("((CAST(i AS DECIMAL(38,0)) - 1) * (i - 2)) div 2" +
            " - 2 * (CAST(i AS DECIMAL(38,0)) - 1) * (n - i)" +
            " + ((CAST(n AS DECIMAL(38,0)) - i) * (n - i - 1)) div 2")
            .cast(dec38) * col("x")).as("l3n"))
        .select(col("n").as("n_orders"),
          expr("CAST(sx div n AS BIGINT)").as("l1_mean_cents"),
          expr("CAST(l2n div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)")
            .as("l2_cents"),
          expr("CAST(1000 * l3n * n * (n - 1)" +
            " div (CAST(n AS DECIMAL(38,0)) * (n - 1) * (n - 2) div 2 * l2n)" +
            " AS BIGINT)").as("t3_milli"))
    }),

    // time-weighted average value per event type (TWAP): each reading
    // weighted by its holding interval to the next same-type event —
    // the irregular-sampling average a plain mean gets wrong when
    // readings cluster; Σ v·Δt div ΣΔt in exact cents×µs, intervals
    // from one lead window per type
    "q467_twap" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"), centsOf(col("value")).as("v"))
        .withColumn("dt", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("dt").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("dt")).as("span_us"),
          sum((col("v") * col("dt")).cast(dec38)).as("vw"))
        .select(col("event_type"), col("n_intervals"), col("span_us"),
          expr("CAST(vw div span_us AS BIGINT)").as("twap_cents"))
        .orderBy("event_type")
    }),

    // LSH family comparison: which near-dup candidates MinHash (word
    // 3-gram Jaccard geometry) and SimHash (Hamming geometry) each see
    // on the same corpus — the overlap census that picks the family (or
    // says "run both") before a signature store is built. Two existing
    // operator outputs, one full-outer pair join
    "q468_lsh_overlap" -> ((s, dir) => {
      val mh = Dedup.minhashCandidates(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_a"), col("doc_b")).withColumn("m", lit(1L))
      val sh = Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_a"), col("doc_b")).withColumn("h", lit(1L))
      mh.join(sh, Seq("doc_a", "doc_b"), "full_outer")
        .agg(sum(coalesce(col("m"), lit(0L))).as("n_minhash"),
          sum(coalesce(col("h"), lit(0L))).as("n_simhash"),
          sum(when(col("m").isNotNull && col("h").isNotNull, 1L).otherwise(0L))
            .as("n_both"))
        .select(col("n_minhash"), col("n_simhash"), col("n_both"),
          (col("n_minhash") - col("n_both")).as("n_only_minhash"),
          (col("n_simhash") - col("n_both")).as("n_only_simhash"))
    }),

    // RangePartitioner simulation: split points from a deterministic
    // 1-in-20 md5 sample (rank picks at ⌈i·m/32⌉, exactly Spark's
    // sampled range partitioning), then the EXACT balance of the full
    // relation under those 31 splits — the "how wrong is the sample"
    // readout behind every sorted write; the split dictionary broadcasts,
    // the flag-sum assignment is map-side
    "q469_range_partitioner_sim" -> ((s, dir) => {
      import s.implicits._
      val v = Tables.orders(s, dir)
        .select(col("o_orderkey"), centsOf(col("o_totalprice")).as("v"))
        .localCheckpoint(false)
      val samp = v.filter(Dedup.md5Long(concat(lit("rps#"),
          col("o_orderkey").cast("string")), 12) % 20 === 0)
        .withColumn("rn", row_number().over(
          Window.orderBy(col("v"), col("o_orderkey"))).cast("long"))
        .localCheckpoint(false)
      val m = samp.agg(count(lit(1)).as("m"))
      val splits = (1L to 31L).toDF("i").crossJoin(broadcast(m))
        .join(samp, col("rn") === expr("(i * m + 31) div 32"))
        .select(col("i"), col("v").as("s"))
      val tot = v.agg(count(lit(1)).as("n"))
      v.crossJoin(broadcast(splits))
        .groupBy("o_orderkey")
        .agg(sum(when(col("v") > col("s"), 1L).otherwise(0L)).as("pid"))
        .groupBy("pid").agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(tot))
        .select(col("pid"), col("n_rows"),
          expr("n_rows * 32000000 div n").as("fill_ppm"))
        .orderBy("pid")
    }),

    // point-in-time-correct feature assembly: features strictly BEFORE
    // the 1999-01-01 cutoff, the label strictly AFTER (any order in
    // 1999) — the leakage discipline every churn/LTV table needs, read
    // out as per-label feature means so a leak (post-cutoff data in a
    // feature) would show up as an implausible separation
    "q470_pit_features" -> ((s, dir) => {
      val cutoff = lit("1999-01-01").cast("timestamp")
      val horizon = lit("2000-01-01").cast("timestamp")
      val o = Tables.orders(s, dir)
      val feat = o.filter(col("o_orderdate") < cutoff)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_pre"),
          sum(centsOf(col("o_totalprice"))).as("rev_pre"),
          min(expr("CAST(datediff(TIMESTAMP '1999-01-01', o_orderdate) AS BIGINT)"))
            .as("recency_days"))
      val lab = o.filter(col("o_orderdate") >= cutoff && col("o_orderdate") < horizon)
        .select(col("o_custkey")).distinct().withColumn("label", lit(1L))
      feat.join(lab, Seq("o_custkey"), "left")
        .withColumn("label", coalesce(col("label"), lit(0L)))
        .groupBy("label")
        .agg(count(lit(1)).as("n_customers"),
          expr("CAST(sum(n_pre) div count(1) AS BIGINT)").as("avg_n_pre"),
          expr("CAST(sum(rev_pre) div count(1) AS BIGINT)").as("avg_rev_pre_cents"),
          expr("CAST(sum(recency_days) div count(1) AS BIGINT)")
            .as("avg_recency_days"))
        .orderBy("label")
    }),

    // negative-binomial moment fit of per-user event counts: p = m/v and
    // r = m²/(v−m) as exact cross-multiplied milli ratios — the
    // overdispersion diagnosis (r < 0 ⇒ not NB, counts are
    // under-dispersed) behind bot-vs-human activity modeling; one user
    // aggregation, then closed form on the 1-row moment relation
    "q471_nb_moments" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("k"))
        // one hot bot user can push k toward corpus scale — widen k²
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
          sum(expr("CAST(k AS DECIMAL(38,0)) * k")).as("skk"))
        .select(col("n").as("n_users"),
          expr("1000 * sk div n").as("mean_milli"),
          expr("CAST(1000 * (CAST(n AS DECIMAL(38,0)) * skk - CAST(sk AS DECIMAL(38,0)) * sk)" +
            " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)").as("var_milli"),
          expr("CAST(1000 * CAST(sk AS DECIMAL(38,0)) * n" +
            " div (CAST(n AS DECIMAL(38,0)) * skk - CAST(sk AS DECIMAL(38,0)) * sk)" +
            " AS BIGINT)").as("p_milli"),
          expr("CAST(1000 * CAST(sk AS DECIMAL(38,0)) * sk" +
            " div (CAST(n AS DECIMAL(38,0)) * skk - CAST(sk AS DECIMAL(38,0)) * sk" +
            " - CAST(sk AS DECIMAL(38,0)) * n) AS BIGINT)").as("r_milli"))),

    // PII masking APPLY (q102 audits, this redacts): digits in the event
    // props payload replaced with '#', per-type census of changed rows
    // and masked characters — the pure-transform shape of a redaction
    // pass (one scan, two regexp evaluations, no shuffle before the
    // roll-up)
    "q472_pii_mask_apply" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), col("props"),
          regexp_replace(col("props"), "[0-9]", "#").as("masked"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("props") =!= col("masked"), 1L).otherwise(0L))
            .as("n_changed"),
          sum((length(col("props")) -
            length(regexp_replace(col("props"), "[0-9]", ""))).cast("long"))
            .as("chars_masked"))
        .orderBy("event_type")),

    // Fleiss' κ for THREE deterministic raters (length, word-count, and
    // vocab-richness rules): multi-rater agreement beyond q420's
    // pairwise Cohen — per item the agreeing-pair count C(x,2)+C(3−x,2),
    // κ_ppm = (3N·A − X² − (3N−X)²)·1e6 div ((3N)² − X² − (3N−X)²),
    // all exact integers per lang
    "q473_fleiss_kappa" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("lang"),
          (col("n_chars") >= 300).cast("long").as("a"),
          (size(split(col("text"), " ", -1)) >= 55).cast("long").as("b"),
          (size(array_distinct(filter(split(col("text"), " ", -1),
            x => length(x) > 0))) >= 28).cast("long").as("c"))
        .withColumn("x", expr("a + b + c"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("xs"),
          sum(expr("(x * (x - 1) + (3 - x) * (2 - x)) div 2")).as("ap"))
        .select(col("lang"), col("n").as("n_docs"),
          expr("xs * 1000000 div (3 * n)").as("p_pos_ppm"),
          expr("CAST(CASE WHEN CAST(3 * n AS DECIMAL(38,0)) * (3 * n)" +
            " - CAST(xs AS DECIMAL(38,0)) * xs" +
            " - CAST(3 * n - xs AS DECIMAL(38,0)) * (3 * n - xs) = 0 THEN 0" +
            " ELSE (CAST(3 * n AS DECIMAL(38,0)) * ap" +
            " - CAST(xs AS DECIMAL(38,0)) * xs" +
            " - CAST(3 * n - xs AS DECIMAL(38,0)) * (3 * n - xs)) * 1000000" +
            " div (CAST(3 * n AS DECIMAL(38,0)) * (3 * n)" +
            " - CAST(xs AS DECIMAL(38,0)) * xs" +
            " - CAST(3 * n - xs AS DECIMAL(38,0)) * (3 * n - xs)) END AS BIGINT)")
            .as("kappa_fleiss_ppm"))
        .orderBy("lang")),

    // Brown–Forsythe test (variance homogeneity across priorities):
    // ANOVA on |y − group median| — the robust Levene variant whose
    // verdict gates every pooled-variance test upstream (q232/q448
    // assume it); group medians are exact lower-median order stats, the
    // F ratio reuses the q448 floor-div convention on the deviations
    "q474_brown_forsythe" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("g"), centsOf(col("o_totalprice")).as("y"),
          col("o_orderkey"))
      val wg = Window.partitionBy("g").orderBy(col("y"), col("o_orderkey"))
      val ranked = o.withColumn("rn", row_number().over(wg).cast("long"))
        .withColumn("ng", count(lit(1)).over(Window.partitionBy("g")))
        .localCheckpoint(false)
      val med = ranked.filter(col("rn") === expr("(ng + 1) div 2"))
        .select(col("g"), col("y").as("med"))
      // deviations in tens-of-dollars units (div 1000): at cents scale
      // the S² div n terms overflow long past sf0.05 (the q458 trade)
      val z = ranked.join(broadcast(med), Seq("g"))
        .select(col("g"), expr("abs(y - med) div 1000").as("z"))
      val grp = z.groupBy("g")
        .agg(count(lit(1)).as("n"), sum(col("z")).as("sz"),
          sum(expr("z * z")).as("szz"))
        .withColumn("u", expr("CAST(sz AS DECIMAL(38,0)) * sz div n"))
      grp.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
          sum(col("sz").cast(dec38)).as("st"), sum(col("szz").cast(dec38)).as("sst"),
          sum(col("u").cast(dec38)).as("su"))
        .select(col("k"), col("nn").as("n_orders"),
          expr("CAST(su - st * st div nn AS BIGINT)").as("ssb"),
          expr("CAST(sst - su AS BIGINT)").as("ssw"),
          expr("CAST(1000 * (nn - k) * (su - st * st div nn)" +
            " div (CAST(k - 1 AS DECIMAL(38,0)) * (sst - su)) AS BIGINT)")
            .as("f_milli"))
    }),

    // rolling-origin forecast evaluation: six consecutive origins, each
    // forecasting its next month with naive (lag 1) and seasonal-naive
    // (lag 12) — the per-origin error table behind q439's aggregate MASE
    // (one bad month can hide in an aggregate; this shows WHICH)
    "q475_rolling_origin" -> ((s, dir) => {
      val w = Window.orderBy("mi")
      Tables.orders(s, dir)
        .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(sum(centsOf(col("o_totalprice"))).as("y"))
        .withColumn("y1", lag(col("y"), 1).over(w))
        .withColumn("y12", lag(col("y"), 12).over(w))
        .filter(col("mi") >= 18 && col("mi") <= 23)
        .select(col("mi").cast("long").as("target_month"), col("y").as("actual_cents"),
          abs(col("y") - col("y1")).as("naive_err_cents"),
          abs(col("y") - col("y12")).as("snaive_err_cents"),
          (abs(col("y") - col("y12")) < abs(col("y") - col("y1")))
            .cast("long").as("seasonal_wins"))
        .orderBy("target_month")
    }),

    // capture–recapture population estimation: two independent md5
    // "sightings" of the ordering-customer population, Lincoln–Petersen
    // n₁n₂/m and the bias-corrected Chapman estimator vs the TRUE count
    // — the mark-recapture sanity check for dedup-rate estimation from
    // samples; everything from three semi-join-free hash aggregations
    "q476_capture_recapture" -> ((s, dir) => {
      val cust = Tables.orders(s, dir).select(col("o_custkey")).distinct()
        .withColumn("ina",
          (Dedup.md5Long(concat(lit("capA#"), col("o_custkey").cast("string")), 12)
            % 5 === 0).cast("long"))
        .withColumn("inb",
          (Dedup.md5Long(concat(lit("capB#"), col("o_custkey").cast("string")), 12)
            % 5 === 0).cast("long"))
      cust.agg(count(lit(1)).as("n_true"),
          sum(col("ina")).as("n1"), sum(col("inb")).as("n2"),
          sum(col("ina") * col("inb")).as("m"))
        .select(col("n_true"), col("n1"), col("n2"), col("m"),
          // n1·n2 is capture-count² — reaches the LONG edge (9e18) at
          // ~3e9 captures per sample; widen the product
          expr("CASE WHEN m > 0 THEN CAST(n1 AS DECIMAL(38,0)) * n2 div m" +
            " ELSE NULL END").as("est_lp"),
          expr("CAST(n1 + 1 AS DECIMAL(38,0)) * (n2 + 1) div (m + 1) - 1")
            .as("est_chapman"))
        .withColumn("chapman_err_ppm",
          expr("abs(est_chapman - n_true) * 1000000 div n_true"))
    }),

    // Wald–Wolfowitz runs test on daily revenue direction: are up/down
    // days random, the sign-based serial check beside q364's von
    // Neumann ratio and q460's Ljung–Box — R runs vs E[R] = 2n₁n₂/n + 1,
    // z from the exact cross-multiplied variance with one isqrt; the
    // sign chain is two lag windows on the day dictionary
    "q477_runs_test" -> ((s, dir) => {
      val w = Window.orderBy("day")
      val signs = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000" +
          " AS BIGINT)").as("y"))
        .withColumn("yp", lag(col("y"), 1).over(w))
        .filter(col("yp").isNotNull)
        .withColumn("s", (col("y") > col("yp")).cast("long"))
        .withColumn("sp", lag(col("s"), 1).over(w))
      signs.agg(count(lit(1)).as("n"),
          sum(col("s")).as("n1"),
          sum(lit(1L) - col("s")).as("n2"),
          (sum(when(col("sp").isNotNull && col("s") =!= col("sp"), 1L)
            .otherwise(0L)) + 1).as("runs"))
        .withColumn("aa", expr("runs * n - 2 * n1 * n2 - n"))
        .withColumn("x2", expr(
          "CAST(1000000 * CAST(aa AS DECIMAL(38,0)) * aa * (n - 1)" +
            " div (CAST(2 AS DECIMAL(38,0)) * n1 * n2 * (2 * n1 * n2 - n))" +
            " AS BIGINT)"))
        .withColumn("t0", floor(sqrt(col("x2").cast("double"))).cast("long"))
        .withColumn("rt", expr(
          "CASE WHEN (t0 + 1) * (t0 + 1) <= x2 THEN t0 + 1" +
            " WHEN t0 * t0 > x2 THEN t0 - 1 ELSE t0 END"))
        .select(col("n").as("n_days"), col("n1").as("n_up"), col("n2").as("n_down"),
          col("runs"),
          expr("CASE WHEN aa >= 0 THEN rt ELSE -rt END").as("z_milli"))
    }),

    // broadcast-join planner audit: per-table row counts × declared row
    // widths → which side of each core FK join clears the 10 MB
    // autoBroadcastJoinThreshold — the cost-based strategy table Spark
    // itself consults, externalized (q334's estimate audit for
    // cardinality; this one for strategy). Nine 1-row counts, a 5-row
    // join-spec dictionary, zero data movement
    "q478_broadcast_planner" -> ((s, dir) => {
      import s.implicits._
      def cnt(name: String, df: DataFrame, width: Long) =
        df.agg(count(lit(1)).as("rows")).select(lit(name).as("t"), col("rows"),
          (col("rows") * width).as("bytes"))
      val stats = cnt("customer", Tables.customer(s, dir), 64L)
        .union(cnt("orders", Tables.orders(s, dir), 56L))
        .union(cnt("lineitem", Tables.lineitem(s, dir), 88L))
        .union(cnt("part", Tables.part(s, dir), 72L))
        .union(cnt("supplier", Tables.supplier(s, dir), 48L))
        .localCheckpoint(false)
      val joins = Seq(
        ("orders_customer", "orders", "customer"),
        ("lineitem_orders", "lineitem", "orders"),
        ("lineitem_part", "lineitem", "part"),
        ("lineitem_supplier", "lineitem", "supplier"),
        ("part_supplier", "part", "supplier"))
        .toDF("join_name", "probe", "build")
      joins
        .join(broadcast(stats.select(col("t").as("build"),
          col("rows").as("build_rows"), col("bytes").as("build_bytes"))), Seq("build"))
        .join(broadcast(stats.select(col("t").as("probe"),
          col("rows").as("probe_rows"))), Seq("probe"))
        .select(col("join_name"), col("probe_rows"), col("build_rows"),
          col("build_bytes"),
          when(col("build_bytes") < 10485760L, lit("broadcast_hash"))
            .otherwise(lit("sort_merge")).as("strategy"))
        .orderBy("join_name")
    }),

    // iterative proportional fitting (raking), two passes: reweight the
    // lang×source cell grid toward uniform margins — the survey/corpus
    // rebalancing step behind "equal lang share AND equal source share"
    // mixing targets that one-axis temperature sampling (q68) can't hit.
    // Row factors then column factors, each an exact ppm integer div;
    // everything runs on the bounded 5×20 grid
    "q479_ipf_raking" -> ((s, dir) => {
      val cells = Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
        .localCheckpoint(false)
      val tot = cells.agg(sum(col("n")).as("nn"),
        countDistinct(col("lang")).as("nl"),
        countDistinct(col("source")).as("ns"))
      val g = cells.crossJoin(broadcast(tot))
        .withColumn("rs", sum(col("n")).over(Window.partitionBy("lang")))
        .withColumn("w1", expr("(1000000 * (nn div nl)) div rs"))
        .withColumn("cs1", sum(col("n") * col("w1"))
          .over(Window.partitionBy("source")))
        .withColumn("w2", expr(
          "w1 * ((1000000 * (nn div ns) * 1000000) div cs1) div 1000000"))
      g.select(col("lang"), col("source"), col("n").as("n_docs"),
          col("w2").as("w_ppm"))
        .orderBy("lang", "source")
    }),

    // sequential probability ratio test (SPRT) on the daily error rate:
    // H0 p=1%, H1 p=2%, α=β=5% — the cumulative log-likelihood walk
    // with ±ln 19 boundaries, read out as the first crossing day and
    // verdict. The always-valid monitoring rule fixed-horizon tests
    // (q415/q232) can't give; ln constants are single libm calls, the
    // walk is one cumsum window on the day dictionary
    "q480_sprt" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(expr("CAST(date_trunc('DAY', ts) AS DATE)").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"))
        .withColumn("llr", expr(
          "e * CAST(round(ln(2.0D) * 1000000) AS BIGINT)" +
            " + (n - e) * CAST(round(ln(CAST(0.98 AS DOUBLE) / 0.99) * 1000000)" +
            " AS BIGINT)"))
        .withColumn("cum", sum(col("llr")).over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rn", row_number().over(Window.orderBy("day")).cast("long"))
        .localCheckpoint(false)
      val a = 2944439L // round(ln(19)·1e6)
      daily.agg(count(lit(1)).as("n_days"),
          max(col("cum")).as("max_cum_micro"),
          min(col("cum")).as("min_cum_micro"),
          min(when(col("cum") >= a, col("rn"))).as("cross_h1_day"),
          min(when(col("cum") <= -a, col("rn"))).as("cross_h0_day"))
        .select(col("n_days"), col("max_cum_micro"), col("min_cum_micro"),
          coalesce(col("cross_h1_day"), lit(0L)).as("cross_h1_day"),
          coalesce(col("cross_h0_day"), lit(0L)).as("cross_h0_day"),
          expr("CASE WHEN coalesce(cross_h1_day, 0) > 0" +
            " AND (coalesce(cross_h0_day, 0) = 0 OR cross_h1_day < cross_h0_day)" +
            " THEN 'accept_h1'" +
            " WHEN coalesce(cross_h0_day, 0) > 0 THEN 'accept_h0'" +
            " ELSE 'continue' END").as("decision"))
    }),

    // Dirichlet-smoothed query-likelihood retrieval (μ = 2000): the LM
    // alternative to q209's BM25 — score = Σ ln((tf·|C| + μ·cf) /
    // ((len+μ)·cf)), one quantized ln per (doc, term), absent terms
    // included (their doc-length penalty is the model's point). The
    // 3-term × collection-frequency dictionary broadcasts; top-10
    "q481_dirichlet_lm" -> ((s, dir) => {
      import s.implicits._
      val words = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .localCheckpoint(false)
      val lens = words.groupBy("doc_id").agg(count(lit(1)).as("len"))
      val ctot = words.agg(count(lit(1)).as("ct"))
      val terms = Seq("vector", "stream", "filter").toDF("w")
      val cf = words.join(broadcast(terms), Seq("w"))
        .groupBy("w").agg(count(lit(1)).as("cf"))
      val tf = words.join(broadcast(terms), Seq("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      lens.crossJoin(broadcast(cf)).crossJoin(broadcast(ctot))
        .join(tf, Seq("doc_id", "w"), "left").na.fill(0L, Seq("tf"))
        .withColumn("sc", expr(
          "CAST(round(ln((CAST(tf AS DOUBLE) * ct + 2000.0D * cf)" +
            " / ((CAST(len AS DOUBLE) + 2000.0D) * cf)) * 1000000) AS BIGINT)"))
        .groupBy("doc_id").agg(sum(col("sc")).as("score_micro"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("rk"), col("doc_id"), col("score_micro"))
        .orderBy("rk")
    }),

    // weak-supervision label model: majority vote of the three q473
    // raters against the near-dup "gold" label — the Snorkel-style
    // question "do my cheap labeling functions, combined, actually
    // track the expensive label", per lang with exact ppm accuracy
    "q482_weak_labels" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("text").isNotNull)
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      val dupIds = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
        .withColumn("gold1", lit(1L))
      docs.select(col("doc_id"), col("lang"),
          (col("n_chars") >= 300).cast("long").as("a"),
          (size(split(col("text"), " ", -1)) >= 55).cast("long").as("b"),
          (size(array_distinct(filter(split(col("text"), " ", -1),
            x => length(x) > 0))) >= 28).cast("long").as("c"))
        .withColumn("pred", (expr("a + b + c") >= 2).cast("long"))
        .join(dupIds, Seq("doc_id"), "left")
        .withColumn("gold", coalesce(col("gold1"), lit(0L)))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("pred")).as("n_pred_pos"),
          sum(col("gold")).as("n_gold_pos"),
          sum(when(col("pred") === col("gold"), 1L).otherwise(0L)).as("n_agree"))
        .withColumn("acc_ppm", expr("n_agree * 1000000 div n_docs"))
        .orderBy("lang")
    }),

    // Holm–Bonferroni multiple-testing correction over the five
    // segment-mean contrasts: z² per segment from exact cross-multiplied
    // sums (k$ units), ranked most-significant-first against the
    // step-down χ²₁ critical ladder (α=5%), rejections stop at the
    // first failure — the family-wise control a per-segment q232 lacks
    "q483_holm_correction" -> ((s, dir) => {
      import s.implicits._
      val per = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
          col("c_custkey") === col("o_custkey"))
        .select(col("segment"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100000").as("y"))
        .groupBy("segment")
        .agg(count(lit(1)).as("ns"), sum(col("y")).as("ss"),
          sum(expr("y * y")).as("sss"))
        .localCheckpoint(false)
      val tot = per.agg(sum(col("ns")).as("nn"), sum(col("ss")).as("st"),
        sum(col("sss")).as("sst"))
      val crit = Seq(1L -> 6635L, 2L -> 6239L, 3L -> 5731L, 4L -> 5024L,
        5L -> 3841L).toDF("rnk", "crit_milli")
      val z2 = per.crossJoin(broadcast(tot))
        .withColumn("z2_milli", expr(
          "CAST(1000 * (CAST(ss AS DECIMAL(38,0)) * nn - CAST(st AS DECIMAL(38,0)) * ns)" +
            " * (CAST(ss AS DECIMAL(38,0)) * nn - CAST(st AS DECIMAL(38,0)) * ns)" +
            " div (CAST(ns AS DECIMAL(38,0)) * nn" +
            " * (CAST(nn AS DECIMAL(38,0)) * sst - CAST(st AS DECIMAL(38,0)) * st))" +
            " AS BIGINT)"))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("z2_milli").desc, col("segment"))).cast("long"))
        .join(broadcast(crit), Seq("rnk"))
        .withColumn("pass", (col("z2_milli") >= col("crit_milli")).cast("long"))
      z2.withColumn("n_fail_before",
          sum(lit(1L) - col("pass")).over(Window.orderBy("rnk")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("rnk"), col("segment"), col("z2_milli"), col("crit_milli"),
          when(col("n_fail_before") === 0, 1L).otherwise(0L).as("rejected"))
        .orderBy("rnk")
    }),

    // empirical-Bayes shrinkage of per-brand mean prices toward the
    // grand mean: weight n/(n+κ) with κ = within-variance over
    // between-variance from the exact ANOVA components (floor-div at
    // the defined points) — the hierarchical-model fix for small-n
    // group means that q252's raw per-brand aggregates over-trust
    "q484_eb_shrinkage" -> ((s, dir) => {
      val per = Tables.part(s, dir)
        .select(col("p_brand"), centsOf(col("p_retailprice")).as("y"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(expr("y * y")).as("syy"))
        .withColumn("u", expr("CAST(sy AS DECIMAL(38,0)) * sy div n"))
        .localCheckpoint(false)
      val tot = per.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
        sum(col("sy").cast(dec38)).as("st"), sum(col("syy").cast(dec38)).as("sst"),
        sum(col("u").cast(dec38)).as("su"))
      per.crossJoin(broadcast(tot))
        // κ = MSW/MSB = ((k−1)·SSW)/((N−k)·SSB), SSW/SSB the q448 sums
        .withColumn("kap", expr(
          "CAST((k - 1) * (sst - su) div" +
            " ((nn - k) * (su - st * st div nn)) AS BIGINT)"))
        .select(col("p_brand"), col("n"),
          expr("sy div n").as("raw_mean_cents"),
          // (n·m_g + κ·m)/(n+κ) = (sy·N + κ·S_tot) / (N·(n+κ))
          expr("CAST((CAST(sy AS DECIMAL(38,0)) * nn + CAST(kap AS DECIMAL(38,0)) * st)" +
            " div (CAST(nn AS DECIMAL(38,0)) * (n + kap)) AS BIGINT)")
            .as("shrunk_mean_cents"))
        .orderBy("p_brand")
    }),

    // standardized Pearson residuals of the lang×source contingency
    // table: which CELLS drive the q119 independence verdict —
    // r = (o−e)/√e as sign·isqrt(1e6·(oN−rc)² div (N·rc)) in milli,
    // flagged at |r| > 2; margins via two windows on the bounded grid
    "q485_pearson_residuals" -> ((s, dir) => {
      val cells = Tables.documents(s, dir).filter(col("text").isNotNull)
        .groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val tot = cells.agg(sum(col("o")).as("nn"))
      cells.crossJoin(broadcast(tot))
        .withColumn("rsum", sum(col("o")).over(Window.partitionBy("lang")))
        .withColumn("csum", sum(col("o")).over(Window.partitionBy("source")))
        .withColumn("dev", expr("o * nn - rsum * csum"))
        .withColumn("q2", expr(
          "CAST(1000000 * CAST(dev AS DECIMAL(38,0)) * dev" +
            " div (CAST(nn AS DECIMAL(38,0)) * nn * rsum * csum) AS BIGINT)"))
        .withColumn("t0", floor(sqrt(col("q2").cast("double"))).cast("long"))
        .withColumn("rt", expr(
          "CASE WHEN (t0 + 1) * (t0 + 1) <= q2 THEN t0 + 1" +
            " WHEN t0 * t0 > q2 THEN t0 - 1 ELSE t0 END"))
        .select(col("lang"), col("source"), col("o"),
          expr("CASE WHEN dev >= 0 THEN rt ELSE -rt END").as("resid_milli"))
        .withColumn("outlier_cell", (abs(col("resid_milli")) > 2000L).cast("long"))
        .orderBy("lang", "source")
    }),

    // coupon-collector coverage: walking the corpus in deterministic
    // md5 order, at which position has every SOURCE been seen — the
    // "how much do I must sample to cover all sources" readout, with
    // the n·H_n expectation (harmonic sum as shared integer micro
    // terms) beside the observed value
    "q486_coupon_collector" -> ((s, dir) => {
      val ordered = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          Dedup.md5Long(concat(lit("cc#"), col("doc_id").cast("string")), 12).as("h"))
        .withColumn("pos", row_number().over(
          Window.orderBy(col("h"), col("doc_id"))).cast("long"))
        .withColumn("first_of_src", (row_number().over(
          Window.partitionBy("source").orderBy(col("h"), col("doc_id"))) === 1)
          .cast("long"))
      val ns = ordered.agg(countDistinct(col("source")).as("ns"))
      ordered.filter(col("first_of_src") === 1)
        .agg(count(lit(1)).as("n_sources"), max(col("pos")).as("cover_position"))
        .crossJoin(broadcast(ns))
        .select(col("n_sources"), col("cover_position"),
          expr("aggregate(sequence(CAST(1 AS BIGINT), ns), CAST(0 AS BIGINT)," +
            " (acc, i) -> acc + 1000000 div i)").as("harmonic_micro"),
          expr("CAST(ns * aggregate(sequence(CAST(1 AS BIGINT), ns), CAST(0 AS BIGINT)," +
            " (acc, i) -> acc + 1000000 div i) div 1000 AS BIGINT)")
            .as("expected_draws_milli"))
    }),

    // Durbin–Watson statistic on seasonally-adjusted monthly revenue
    // (24-month window, residual e = 2y − same-calendar-month sum so
    // every residual shares one exact scale): DW = Σ(Δe)²/Σe² in milli
    // — the serial-correlation-of-residuals check after removing the
    // seasonal mean, complementing q460/q477 on the raw series
    "q487_durbin_watson" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .groupBy(expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1")
          .as("mi"))
        .agg(expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div 100000" +
          " AS BIGINT)").as("y"))
        .filter(col("mi") >= 0 && col("mi") < 24)
        .withColumn("moy", expr("mi % 12"))
        .withColumn("sm", sum(col("y")).over(Window.partitionBy("moy")))
        .withColumn("e", expr("2 * y - sm"))
        .withColumn("ep", lag(col("e"), 1).over(Window.orderBy("mi")))
      rev.agg(count(lit(1)).as("n_months"),
          sum(expr("CASE WHEN ep IS NOT NULL THEN (e - ep) * (e - ep) ELSE 0 END")
            .cast(dec38)).as("sd"),
          sum(expr("e * e").cast(dec38)).as("se"))
        .select(col("n_months"),
          expr("CAST(1000 * sd div se AS BIGINT)").as("dw_milli"))
    }),

    // Benjamini–Hochberg FDR (step-UP) over the same five segment
    // contrasts as q483's Holm (step-down): reject every rank ≤ the
    // LARGEST rank whose z² clears its α·r/k ladder value — the two
    // procedures bracket multiplicity control (FWER vs FDR) on one
    // exact-integer statistic set
    "q488_bh_fdr" -> ((s, dir) => {
      import s.implicits._
      val per = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
          col("c_custkey") === col("o_custkey"))
        .select(col("segment"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100000").as("y"))
        .groupBy("segment")
        .agg(count(lit(1)).as("ns"), sum(col("y")).as("ss"),
          sum(expr("y * y")).as("sss"))
        .localCheckpoint(false)
      val tot = per.agg(sum(col("ns")).as("nn"), sum(col("ss")).as("st"),
        sum(col("sss")).as("sst"))
      val crit = Seq(1L -> 6635L, 2L -> 5412L, 3L -> 4709L, 4L -> 4218L,
        5L -> 3841L).toDF("rnk", "crit_milli")
      val z2 = per.crossJoin(broadcast(tot))
        .withColumn("z2_milli", expr(
          "CAST(1000 * (CAST(ss AS DECIMAL(38,0)) * nn - CAST(st AS DECIMAL(38,0)) * ns)" +
            " * (CAST(ss AS DECIMAL(38,0)) * nn - CAST(st AS DECIMAL(38,0)) * ns)" +
            " div (CAST(ns AS DECIMAL(38,0)) * nn" +
            " * (CAST(nn AS DECIMAL(38,0)) * sst - CAST(st AS DECIMAL(38,0)) * st))" +
            " AS BIGINT)"))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("z2_milli").desc, col("segment"))).cast("long"))
        .join(broadcast(crit), Seq("rnk"))
        .withColumn("pass", (col("z2_milli") >= col("crit_milli")).cast("long"))
      z2.withColumn("max_pass_rank",
          max(when(col("pass") === 1, col("rnk"))).over(
            Window.partitionBy()))
        .select(col("rnk"), col("segment"), col("z2_milli"), col("crit_milli"),
          when(col("rnk") <= coalesce(col("max_pass_rank"), lit(0L)), 1L)
            .otherwise(0L).as("rejected"))
        .orderBy("rnk")
    }),

    // McNemar's paired test between the two q420 raters: only the
    // DISCORDANT cells carry information about which rater is stricter
    // — χ² = (n01−n10)²/(n01+n10) plus the continuity-corrected form,
    // exact milli per lang; the paired complement to Cohen's κ
    // (agreement) on the same rater pair
    "q489_mcnemar" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("lang"),
          (col("n_chars") >= 300).cast("long").as("a"),
          (size(split(col("text"), " ", -1)) >= 55).cast("long").as("b"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("a") === 1 && col("b") === 0, 1L).otherwise(0L)).as("n10"),
          sum(when(col("a") === 0 && col("b") === 1, 1L).otherwise(0L)).as("n01"))
        .select(col("lang"), col("n_docs"), col("n10"), col("n01"),
          expr("CASE WHEN n01 + n10 = 0 THEN 0" +
            " ELSE 1000 * (n01 - n10) * (n01 - n10) div (n01 + n10) END")
            .as("chi2_milli"),
          expr("CASE WHEN n01 + n10 = 0 THEN 0" +
            " ELSE 1000 * (abs(n01 - n10) - 1) * (abs(n01 - n10) - 1)" +
            " div (n01 + n10) END").as("chi2_cc_milli"))
        .orderBy("lang")),

    // Poisson goodness-of-fit of per-(user, day) event counts (zero
    // days included via the user×day grid): expected bin masses from
    // ONE quantized pmf evaluation per k (exp·pow/k!, k ≤ 9 + tail
    // complement — so the e's sum exactly to N), χ² contributions as
    // exact integers after that quantization — the "is activity really
    // Poisson or is it bursty" verdict behind q471's NB fit
    "q490_poisson_gof" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select(col("user_id"), expr("CAST(date_trunc('DAY', ts) AS DATE)").as("day"))
        .localCheckpoint(false)
      val users = ev.select("user_id").distinct()
      val days = ev.select("day").distinct()
      val grid = users.crossJoin(days)
        .join(ev.groupBy("user_id", "day").agg(count(lit(1)).as("k")),
          Seq("user_id", "day"), "left").na.fill(0L, Seq("k"))
        .withColumn("kb", least(col("k"), lit(10L)))
        .groupBy("kb").agg(count(lit(1)).as("o"))
        .localCheckpoint(false)
      val tot = grid.agg(sum(col("o")).as("nn"),
        sum(col("kb") * col("o")).as("sk"))
      val fact = Seq(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 6L, 4L -> 24L,
        5L -> 120L, 6L -> 720L, 7L -> 5040L, 8L -> 40320L, 9L -> 362880L)
        .toDF("kb", "f")
      val bins = s.range(11).select(col("id").as("kb"))
        .join(grid, Seq("kb"), "left").na.fill(0L, Seq("o"))
        .join(fact, Seq("kb"), "left")
        .crossJoin(broadcast(tot))
        .withColumn("e_milli", expr(
          "CAST(round(CASE WHEN kb <= 9 THEN nn * exp(-(CAST(sk AS DOUBLE) / nn))" +
            " * pow(CAST(sk AS DOUBLE) / nn, kb) / f * 1000 ELSE 0.0D END)" +
            " AS BIGINT)"))
        .localCheckpoint(false)
      val tailE = bins.agg((max(col("nn")) * 1000 - sum(col("e_milli"))).as("te"))
      bins.crossJoin(broadcast(tailE))
        .withColumn("e2", when(col("kb") === 10, col("te")).otherwise(col("e_milli")))
        .filter(col("e2") > 0)
        .select(col("kb").as("k_bin"), col("o"), col("e2").as("e_milli"),
          expr("(o * 1000 - e2) * (o * 1000 - e2) div e2").as("contrib_milli"))
        .orderBy("k_bin")
    }),

    // Cochran's Q across the THREE q473 raters: do the raters have the
    // same marginal positive rate — the k-rater generalization of
    // McNemar, Q = (k−1)(kΣC²−T²)/(kΣR−ΣR²) in exact integers per lang
    // (κ says "do they agree per item"; Q says "are they equally
    // strict" — both needed before pooling rater votes)
    "q491_cochran_q" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("lang"),
          (col("n_chars") >= 300).cast("long").as("a"),
          (size(split(col("text"), " ", -1)) >= 55).cast("long").as("b"),
          (size(array_distinct(filter(split(col("text"), " ", -1),
            x => length(x) > 0))) >= 28).cast("long").as("c"))
        .withColumn("r", expr("a + b + c"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("a")).as("ca"), sum(col("b")).as("cb"), sum(col("c")).as("cc2"),
          sum(col("r")).as("sr"), sum(expr("r * r")).as("srr"))
        .select(col("lang"), col("n_docs"),
          expr("CASE WHEN 3 * sr - srr = 0 THEN 0" +
            " ELSE CAST(1000 * 2 * (3 * (CAST(ca AS DECIMAL(38,0)) * ca" +
            " + CAST(cb AS DECIMAL(38,0)) * cb + CAST(cc2 AS DECIMAL(38,0)) * cc2)" +
            " - CAST(sr AS DECIMAL(38,0)) * sr)" +
            " div (CAST(3 AS DECIMAL(38,0)) * sr - srr) AS BIGINT) END")
            .as("q_milli"))
        .orderBy("lang")),

    // paired sign test: did per-customer revenue rise from 1997 to 1998
    // — medians-free, distribution-free, just the sign of each paired
    // difference (ties dropped), z = (2S−n)/√n via the exact isqrt; the
    // paired counterpart to q289's independent-samples Mann–Whitney
    "q492_sign_test" -> ((s, dir) => {
      val per = Tables.orders(s, dir)
        .filter(expr("year(o_orderdate) IN (1997, 1998)"))
        .groupBy("o_custkey")
        .agg(sum(when(expr("year(o_orderdate) = 1997"),
          centsOf(col("o_totalprice"))).otherwise(0L)).as("r97"),
          sum(when(expr("year(o_orderdate) = 1998"),
            centsOf(col("o_totalprice"))).otherwise(0L)).as("r98"))
        .filter(col("r97") > 0 && col("r98") > 0 && col("r97") =!= col("r98"))
      per.agg(count(lit(1)).as("n"),
          sum(when(col("r98") > col("r97"), 1L).otherwise(0L)).as("s"))
        .withColumn("aa", expr("2 * s - n"))
        .withColumn("x2", expr("1000000 * aa * aa div n"))
        .withColumn("t0", floor(sqrt(col("x2").cast("double"))).cast("long"))
        .withColumn("rt", expr(
          "CASE WHEN (t0 + 1) * (t0 + 1) <= x2 THEN t0 + 1" +
            " WHEN t0 * t0 > x2 THEN t0 - 1 ELSE t0 END"))
        .select(col("n").as("n_pairs"), col("s").as("n_up"),
          expr("CASE WHEN aa >= 0 THEN rt ELSE -rt END").as("z_milli"))
    }),

    // deterministic half-sample bootstrap CI for the A/B mean difference
    // (md5 arms × 50 md5 half-samples): replicate arm-mean differences
    // in exact milli, the 2.5%/97.5% order statistics as the interval —
    // q453's block bootstrap handles autocorrelation; this one handles
    // the two-sample design (does the CI cover zero?)
    "q493_bootstrap_ab_ci" -> ((s, dir) => {
      import s.implicits._
      val base = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          (Dedup.md5Long(concat(lit("qte#"), col("doc_id").cast("string")), 12) % 2)
            .as("arm"),
          col("n_chars"))
        .localCheckpoint(false)
      val reps = base.crossJoin(broadcast((0L until 50L).toDF("r")))
        .filter(Dedup.md5Long(concat(lit("bs#"), col("r"), lit("#"),
          col("doc_id")), 12) % 2 === 0)
        .groupBy("r", "arm")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sx"))
        .groupBy("r")
        .agg(expr("CAST(1000 * max(CASE WHEN arm = 1 THEN sx END)" +
          " div max(CASE WHEN arm = 1 THEN n END)" +
          " - 1000 * max(CASE WHEN arm = 0 THEN sx END)" +
          " div max(CASE WHEN arm = 0 THEN n END) AS BIGINT)").as("diff_milli"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("diff_milli"), col("r"))).cast("long"))
        .localCheckpoint(false)
      val full = base.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sx"))
        .agg(expr("CAST(1000 * max(CASE WHEN arm = 1 THEN sx END)" +
          " div max(CASE WHEN arm = 1 THEN n END)" +
          " - 1000 * max(CASE WHEN arm = 0 THEN sx END)" +
          " div max(CASE WHEN arm = 0 THEN n END) AS BIGINT)").as("diff_full_milli"))
      reps.agg(count(lit(1)).as("n_reps"),
          max(when(col("rk") === 2, col("diff_milli"))).as("lo_milli"),
          max(when(col("rk") === 49, col("diff_milli"))).as("hi_milli"))
        .crossJoin(broadcast(full))
        .select(col("n_reps"), col("diff_full_milli"), col("lo_milli"),
          col("hi_milli"),
          (col("lo_milli") <= 0L && col("hi_milli") >= 0L).cast("long")
            .as("covers_zero"))
    }),

    // Kruskal–Wallis H across the five order priorities (does at least
    // one priority's price distribution differ): rank sums via the same
    // value-grouped cumulative-count identity as q289 (never a per-row
    // rank — the window runs over the bounded distinct-value relation),
    // tie-corrected, every step exact integer/decimal arithmetic — the
    // k-group generalization of q289's two-sample Mann–Whitney
    "q494_kruskal_wallis" -> ((s, dir) => {
      val j = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("g"), centsOf(col("o_totalprice")).as("v"))
      val before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val vstats = j.groupBy("v").agg(count(lit(1)).as("cnt"))
        .withColumn("cb", coalesce(sum(col("cnt")).over(before), lit(0L)))
        .localCheckpoint(false)
      val tot = vstats.agg(sum(col("cnt")).as("n"),
        sum(expr("cnt * cnt * cnt - cnt")).as("ties"))
      val tg = j.groupBy("g", "v").agg(count(lit(1)).as("n_gv"))
        .join(vstats, "v")
        .groupBy("g")
        .agg(sum(expr("n_gv * (2 * cb + cnt + 1)")).as("t2"),
          sum(col("n_gv")).as("n_g"))
      tg.agg(count(lit(1)).as("n_groups"),
          sum(expr("CAST(t2 AS DECIMAL(38,0)) * t2 div n_g")).as("s4"))
        .crossJoin(broadcast(tot))
        .withColumn("h_micro", expr(
          "3 * CAST(s4 AS DECIMAL(38,0)) * 1000000 div (n * (n + 1))" +
            " - 3 * (n + 1) * 1000000"))
        .select(col("n_groups"), col("n"), col("h_micro"),
          expr("CAST(h_micro AS DECIMAL(38,0))" +
            " * (CAST(n AS DECIMAL(38,0)) * n * n - n)" +
            " div (CAST(n AS DECIMAL(38,0)) * n * n - n - ties)")
            .as("h_adj_micro"))
    }),

    // Good–Turing unseen mass + Chao1 richness per source over char
    // 4-grams: coverage = 1 − N1/N is the probability the NEXT token is
    // a known type (the "is this source mined out" readout) and Chao1 =
    // V + N1²/(2·N2) lower-bounds the total type count — the pair that
    // decides whether a source repays further crawling. Exact integers;
    // the only shuffle is the (source, gram) count
    "q495_unseen_mass" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(col("text")) >= 4)
        .select(col("source"),
          explode(expr("sequence(1, length(text) - 3)")).as("i"), col("text"))
        .select(col("source"), expr("substring(text, i, 4)").as("g"))
        .groupBy("source", "g").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("v_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
        .select(col("source"), col("n_tokens"), col("v_types"), col("n1"),
          col("n2"),
          expr("1000000 - n1 * 1000000 div n_tokens").as("coverage_ppm"),
          expr("v_types + CASE WHEN n2 > 0 THEN n1 * n1 div (2 * n2)" +
            " ELSE n1 * (n1 - 1) div 2 END").as("chao1_types"))
        .orderBy("source")),

    // lexical-richness panel per source: Yule's K = 10⁴·(Σm²−N)/N² and
    // the Simpson repeat rate Σm(m−1)/(N(N−1)) — both length-invariant
    // repetitiveness characteristics (q295's hapax share measures the
    // tail; these measure the head's concentration). All integer-exact
    "q496_lexical_richness" -> ((s, dir) =>
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("source", "w").agg(count(lit(1)).as("m"))
        .groupBy("source")
        .agg(sum(col("m")).as("n_tokens"), count(lit(1)).as("v_types"),
          sum(expr("CAST(m AS DECIMAL(38,0)) * m")).as("m2"),
          sum(expr("CAST(m AS DECIMAL(38,0)) * (m - 1)")).as("rep"))
        .select(col("source"), col("n_tokens"), col("v_types"),
          expr("CAST(10000000 * (m2 - n_tokens)" +
            " div (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) AS BIGINT)")
            .as("yules_k_milli"),
          expr("CAST(1000000 * rep" +
            " div (CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1)) AS BIGINT)")
            .as("simpson_ppm"))
        .orderBy("source")),

    // LRU stack-distance profile over per-user event_type access
    // streams: depth d = 1 + |distinct other items touched since this
    // item's previous access| is the Mattson stack distance — ONE pass
    // yields the hit ratio of EVERY cache size at once (hits(C) =
    // Σ_{0<d≤C} n_d). The between-accesses distinct count is a per-user
    // equi-join bounded by the re-reference gap (≤ the item vocabulary
    // on average), ordering pinned to event_id (engine-portable total
    // order — never the nanos-vs-micros timestamp)
    "q497_lru_stack_distance" -> ((s, dir) => {
      val seqd = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .withColumn("seq", row_number().over(
          Window.partitionBy("user_id").orderBy("event_id")).cast("long"))
        .localCheckpoint(false)
      val prev = seqd.withColumn("pseq", lag(col("seq"), 1).over(
        Window.partitionBy("user_id", "event_type").orderBy("seq")))
      val mid = seqd.select(col("user_id").as("u2"), col("seq").as("s2"),
        col("event_type").as("t2"))
      val depth = prev.filter(col("pseq").isNotNull)
        .join(mid, col("user_id") === col("u2") &&
          col("s2") > col("pseq") && col("s2") < col("seq"), "left")
        .groupBy(col("user_id"), col("seq"))
        .agg((countDistinct(col("t2")) + lit(1L)).as("depth"))
      val hist = depth.groupBy("depth").agg(count(lit(1)).as("n"))
        .unionAll(prev.filter(col("pseq").isNull)
          .agg(count(lit(1)).as("n")).select(lit(0L).as("depth"), col("n")))
      hist.crossJoin(broadcast(hist.agg(sum(col("n")).as("n_total"))))
        .withColumn("cum_hits",
          sum(when(col("depth") > 0, col("n")).otherwise(0L)).over(
            Window.orderBy("depth").rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("depth"), col("n").as("n_accesses"),
          expr("CASE WHEN depth > 0 THEN cum_hits * 1000000 div n_total" +
            " ELSE 0 END").as("hit_ratio_ppm"))
        .orderBy("depth")
    }),

    // K-minimum-values distinct-count sketch, exactly replayed: the k-th
    // smallest 48-bit md5 of the key estimates |D| ≈ (k−1)·2⁴⁸/h_(k)
    // (uniform order statistics), compared against the exact distinct on
    // the same column — the mergeable-sketch alternative to q162's HLL
    // whose ESTIMATE (not just its bound) is engine-portable integers;
    // top-k is a TakeOrderedAndProject, never a global sort
    "q498_kmv_distinct" -> ((s, dir) => {
      val hk = Tables.orders(s, dir).select(col("o_orderkey")).distinct()
        .select(Dedup.md5Long(
          concat(lit("kmv#"), col("o_orderkey").cast("string")), 12).as("h"))
        .orderBy("h").limit(256)
        .agg(max(col("h")).as("hk"), count(lit(1)).as("k"))
      hk.crossJoin(broadcast(Tables.orders(s, dir)
          .agg(countDistinct(col("o_orderkey")).as("exact_distinct"))))
        .withColumn("est", expr("(k - 1) * 281474976710656 div hk"))
        .select(col("k"), col("exact_distinct"), col("est").as("kmv_estimate"),
          expr("abs(est - exact_distinct) * 1000000 div exact_distinct")
            .as("err_ppm"))
    }),

    // greedy k-center (farthest-point) seeding over embeddings — the
    // kmeans++-family initializer that maximizes coverage: 3 rounds of
    // "pick the vector farthest from everything chosen", distances as
    // 1e-6-quantized integer squared euclidean (q83 discipline), the
    // running min-distance relation updated incrementally (one join per
    // round against the ONE new centroid, never re-scanning the chosen
    // set). Driver state is 4 (id, dist) rows — the bounded iterative-ML
    // license kmeansFit documents; ties → lowest vec_id
    "q499_kcenter_seeding" -> ((s, dir) => {
      import s.implicits._
      val q = Tables.embeddings(s, dir)
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos"),
          round(col("x") * 1000000, 0).cast("long").as("qv"))
        .localCheckpoint(false)
      def distTo(id: Long) = q.join(
          broadcast(q.filter(col("vec_id") === id)
            .select(col("pos").as("cpos"), col("qv").as("qc"))),
          col("pos") === col("cpos"))
        .groupBy("vec_id")
        .agg(sum(expr("(qv - qc) * (qv - qc)")).as("mind"))
      val seed = q.agg(min(col("vec_id"))).collect()(0).getLong(0)
      var picks = Vector((0L, seed, 0L))
      var mind = distTo(seed).localCheckpoint(false)
      (1 to 3).foreach { r =>
        val p = mind.filter(!col("vec_id").isin(picks.map(_._2): _*))
          .orderBy(col("mind").desc, col("vec_id")).limit(1).collect()(0)
        picks = picks :+ ((r.toLong, p.getLong(0), p.getLong(1)))
        if (r < 3)
          mind = mind.join(distTo(p.getLong(0)).withColumnRenamed("mind", "d2"),
              "vec_id")
            .select(col("vec_id"), least(col("mind"), col("d2")).as("mind"))
            .localCheckpoint(false)
      }
      picks.toDF("sel_order", "vec_id", "mind2_q").orderBy("sel_order")
    }),

    // winnowing fingerprints (the MOSS plagiarism-detector selection):
    // per doc, the minimum 48-bit 5-gram hash of every width-4 window —
    // guarantees any ≥8-char match shares a fingerprint while storing
    // ~2/(w+1) of the grams. Readout per source: windows, distinct
    // fingerprints kept (the density the guarantee costs), and
    // fingerprints shared across ≥2 docs (the dup signal). Leading
    // partial frames included — pinned, identical frame semantics in
    // both engines; all per-doc windows, never a global sort
    "q500_winnowing" -> ((s, dir) => {
      // repartition the DOC rows by doc_id BEFORE the position explode:
      // the shuffle moves one skinny text row per doc instead of the
      // ~position-count hash rows the per-doc window would otherwise
      // exchange (the explode multiplies rows ~250×), and the gram-hash
      // CPU runs across the cluster instead of inside the scan task
      // (single-row-group inputs scan as ONE task). hash(doc_id) then
      // satisfies the window and the (source, doc_id, m) aggregate
      // alike. The partition count is pinned to the session's shuffle
      // parallelism (scale-adaptive conf, never a constant): AQE sizes
      // coalescing by the exchange's BYTES, which here are ~250× smaller
      // than the exploded rows the stage actually processes — left
      // advisory it collapses the whole gram pipeline onto one core
      val fp = Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(col("text")) >= 5)
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
        .select(col("source"), col("doc_id"),
          explode(expr("sequence(1, length(text) - 4)")).as("i"), col("text"))
        .select(col("source"), col("doc_id"), col("i"),
          Dedup.md5Long(expr("substring(text, i, 5)"), 12).as("h"))
        .withColumn("m", min(col("h")).over(Window.partitionBy("doc_id")
          .orderBy("i").rowsBetween(-3, 0)))
        .groupBy("source", "doc_id", "m")
        .agg(count(lit(1)).as("n_windows"))
        .localCheckpoint(false)
      val shared = fp.groupBy("source", "m")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .groupBy("source")
        .agg(sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared_fp"))
      fp.groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          sum(col("n_windows")).as("n_windows"),
          count(lit(1)).as("n_fingerprints"))
        .join(shared, "source")
        .withColumn("density_ppm",
          expr("n_fingerprints * 1000000 div n_windows"))
        .orderBy("source")
    }),

    // HITS hubs & authorities on the supplier-nation → customer-nation
    // trade graph (edge weight = cents revenue): hubs = nations whose
    // suppliers ship to authoritative buyers, authorities = nations
    // whose customers buy from hub sellers — the mutually-recursive pair
    // PageRank's single score conflates. Two normalized iterations in
    // exact integer algebra (max-normalized, half-away rounding — the
    // q163 power-iteration discipline); the edge relation is ≤ n²
    // nation pairs, every score join broadcasts
    "q501_hits_trade" -> ((s, dir) => {
      val cn = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey").as("cnat"),
          centsOf(col("o_totalprice")).as("cents"))
      val sn = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("s_nationkey").as("snat"))
        .distinct()
      val edges = cn.join(sn, col("o_orderkey") === col("l_orderkey"))
        .groupBy("snat", "cnat").agg(sum(col("cents")).as("w"))
        .localCheckpoint(false)
      def normed(raw: DataFrame, key: String, v: String): DataFrame =
        raw.crossJoin(broadcast(raw.agg(max(col(v)).as("mx"))))
          .select(col(key), expr(
            s"CAST((2 * CAST($v AS DECIMAL(38,0)) * 1000000 + mx)" +
              s" div (2 * mx) AS BIGINT)").as(v))
      val h1 = normed(edges.groupBy("snat")
        .agg(sum(expr("CAST(w AS DECIMAL(38,0)) * 1000000")).as("h")), "snat", "h")
      val a1 = normed(edges.join(broadcast(h1), "snat")
        .groupBy("cnat").agg(sum(expr("CAST(w AS DECIMAL(38,0)) * h")).as("a")),
        "cnat", "a")
      val h2 = normed(edges.join(broadcast(a1), "cnat")
        .groupBy("snat").agg(sum(expr("CAST(w AS DECIMAL(38,0)) * a")).as("h")),
        "snat", "h")
      h2.join(a1, col("snat") === col("cnat"), "full_outer")
        .select(coalesce(col("snat"), col("cnat")).cast("long").as("nationkey"),
          coalesce(col("h"), lit(0L)).as("hub_u"),
          coalesce(col("a"), lit(0L)).as("auth_u"))
        .orderBy("nationkey")
    }),

    // price elasticity of demand from the discount-level demand curve:
    // OLS of ln(total quantity) on ln(price factor 1−d) across the 11
    // discrete discount levels — the "how much does a 1% price cut lift
    // volume" readout. Quantized-log micro-nats (q72 convention), the
    // regression over 11 bounded rows in exact integer algebra, slope
    // and R² as integer-scaled divisions (never a final double)
    "q502_price_elasticity" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(expr("CAST(round(l_discount * 100) AS BIGINT)").as("dc"))
        .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("qty"))
        .select(
          expr("CAST(round(ln(1.0D - CAST(dc AS DOUBLE) / 100) * 1000000)" +
            " AS BIGINT)").as("x"),
          expr("CAST(round(ln(CAST(qty AS DOUBLE)) * 1000000) AS BIGINT)")
            .as("y"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
        .select(col("n").as("n_levels"),
          expr("CAST((CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)" +
            " * 1000000 div (CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)").as("elasticity_micro"),
          expr("CAST((CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)" +
            " * (CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)" +
            " * 1000000 div ((CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx)" +
            " * (CAST(n AS DECIMAL(38,0)) * syy" +
            " - CAST(sy AS DECIMAL(38,0)) * sy)) AS BIGINT)").as("r2_ppm"))),

    // ANSI-safety census with the try_* family (Spark 4 runs ANSI mode
    // by default — plain div-by-zero and overflow THROW): try_divide's
    // NULL on the zero-discount rows and try_multiply's NULL past the
    // int64 boundary (ep·10¹² overflows exactly when ep > 9 223 372),
    // counted and summed; the oracle replays the same boundaries with
    // explicit CASE guards — proving the nulls land where int64 says
    // they must, not where the engine feels like it
    "q503_try_arithmetic" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(centsOf(col("l_extendedprice")).as("ep"),
          expr("CAST(round(l_discount * 100) AS BIGINT)").as("dc"))
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(expr("try_divide(ep, dc)"))).as("n_div_by_zero"),
          (count(lit(1)) - count(expr("try_multiply(ep, 1000000000000L)")))
            .as("n_mul_overflow"),
          // Σ(ep·10¹²)/10¹² telescopes back to the exact cents sum of the
          // non-overflowing rows — a long, never a >2⁵³ integer (those
          // lose exactness crossing DuckDB's HUGEINT→float64 bridge)
          expr("CAST(sum(CAST(try_multiply(ep, 1000000000000L) AS DECIMAL(38,0)))" +
            " div 1000000000000 AS BIGINT)").as("sum_safe_cents"),
          sum(when(col("dc") > 0, expr("ep div dc"))).as("sum_ratio"))),

    // interpolated Kneser–Ney bigram smoothing (D = 3/4 kept exact as a
    // ×4 rational): max(c−D,0)/c(v) + λ(v)·P_cont(w), the continuation-
    // probability backoff that beats Stupid Backoff (q432) and
    // Dirichlet (q481) on re-used contexts — each factor quantized to
    // micro BEFORE combining (pinned), top-20 smoothed bigrams. One
    // corpus explode feeds bigram counts; contexts/continuations derive
    // from the bigram-type relation, never a second scan
    "q504_kneser_ney" -> ((s, dir) => {
      val bc = Dedup.shingleRows(
          Tables.documents(s, dir)
            .filter(col("text").isNotNull &&
              size(split(col("text"), " ", -1)) >= 2),
          "doc_id", "text", 2)
        .select(substring_index(col("s"), " ", 1).as("v"),
          substring_index(col("s"), " ", -1).as("w"))
        .groupBy("v", "w").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val cv = bc.groupBy("v").agg(sum(col("c")).as("cv"),
        count(lit(1)).as("nv"))
      val nw = bc.groupBy("w").agg(count(lit(1)).as("nw"))
      bc.join(cv, "v").join(nw, "w")
        .crossJoin(broadcast(bc.agg(count(lit(1)).as("n11"))))
        .select(col("v"), col("w"), col("c").as("c_vw"),
          expr("(4 * c - 3) * 1000000 div (4 * cv)" +
            " + (3 * nv * 1000000 div (4 * cv)) * (nw * 1000000 div n11)" +
            " div 1000000").as("kn_micro"))
        .orderBy(col("kn_micro").desc, col("v"), col("w")).limit(20)
    }),

    // participation ratio (effective rank) of the embedding cloud from
    // per-dimension variances: PR = (Σv)²/Σv² — 64 means "isotropic",
    // ~1 means "one direction owns the cloud" (the global readout behind
    // q191's per-dim variance table and q442's anisotropy). Variances as
    // exact n·Σx²−(Σx)² integers on the 1e-6 grid, rescaled once (div
    // 1e6, pinned) so the squares stay inside decimal38/HUGEINT
    "q505_participation_ratio" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "x")))
        .select(col("pos"), round(col("x") * 1000000, 0).cast("long").as("qv"))
        .groupBy("pos")
        .agg(count(lit(1)).as("n"),
          sum(col("qv")).as("sx"),
          sum(expr("CAST(qv AS DECIMAL(38,0)) * qv")).as("sxx"))
        .select(col("n"),
          expr("(CAST(n AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx) div 1000000").as("vr"))
        .agg(max(col("n")).as("n_vecs"), count(lit(1)).as("dim"),
          sum(col("vr")).as("sv"),
          sum(expr("CAST(vr AS DECIMAL(38,0)) * vr")).as("svv"),
          max(col("vr")).as("v_max_r"), min(col("vr")).as("v_min_r"))
        .select(col("n_vecs"), col("dim"),
          expr("CAST(1000 * CAST(sv AS DECIMAL(38,0)) * sv div svv AS BIGINT)")
            .as("pr_milli"),
          col("v_max_r"), col("v_min_r"))),

    // speculative-execution model per priority "stage": task duration =
    // order dollars, stragglers past the exact P99 order statistic get a
    // speculative copy that finishes at P99 + median — makespan before
    // vs after, the "is speculation worth the duplicate work" readout.
    // Order statistics as row_number ranks tie-broken by key (engine-
    // portable), windows partitioned by the 5 bounded stages
    "q506_speculative_tasks" -> ((s, dir) => {
      val t = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("stage"), col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100").as("d"))
        .withColumn("rk", row_number().over(Window.partitionBy("stage")
          .orderBy(col("d"), col("o_orderkey"))).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("stage")))
        .localCheckpoint(false)
      val stats = t
        .groupBy("stage")
        .agg(max(col("n")).as("n_tasks"),
          max(when(col("rk") === expr("(99 * n + 99) div 100"), col("d")))
            .as("p99_ms"),
          max(when(col("rk") === expr("(n + 1) div 2"), col("d")))
            .as("median_ms"),
          max(col("d")).as("makespan_ms"))
      t.join(stats, "stage")
        .groupBy("stage")
        .agg(max(col("n_tasks")).as("n_tasks"), max(col("p99_ms")).as("p99_ms"),
          max(col("median_ms")).as("median_ms"),
          max(col("makespan_ms")).as("makespan_ms"),
          max(least(col("d"), col("p99_ms") + col("median_ms")))
            .as("spec_makespan_ms"))
        .withColumn("saving_ppm", expr(
          "(makespan_ms - spec_makespan_ms) * 1000000 div makespan_ms"))
        .orderBy("stage")
    }),

    // ROUGE-1/ROUGE-2 set recall over the q21 near-dup candidate pairs
    // (reference = doc_a): the "HOW similar, in n-gram terms" drill-down
    // the binary candidate flag hides — MinHash says maybe, ROUGE says
    // how much. The corpus never explodes: candidate doc ids semi-gate
    // the unigram/bigram set build, every join an equi-join on bounded
    // pair rows
    "q507_rouge_overlap" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val cand = Dedup.minhashCandidates(d, "doc_id", "text")
        .select("doc_a", "doc_b").localCheckpoint(false)
      val ids = cand.select(col("doc_a").as("doc_id"))
        .unionAll(cand.select(col("doc_b").as("doc_id"))).distinct()
      val base = d.join(ids, Seq("doc_id"), "left_semi")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
        .localCheckpoint(false)
      val uni = base.select(col("doc_id"), explode(col("ws")).as("g"))
        .filter(length(col("g")) > 0).distinct().localCheckpoint(false)
      val bi = base.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws) - 1)," +
            " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
          .as("g")).distinct().localCheckpoint(false)
      def recall(sets: DataFrame, cnt: String, ppm: String): DataFrame = {
        val na = sets.groupBy("doc_id").agg(count(lit(1)).as("n_ref"))
        cand
          .join(sets.select(col("doc_id").as("doc_a"), col("g")), "doc_a")
          .join(sets.select(col("doc_id"), col("g").as("g2")),
            col("doc_b") === col("doc_id") && col("g") === col("g2"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as(cnt))
          .join(na.select(col("doc_id").as("doc_a"), col("n_ref")), "doc_a")
          .select(col("doc_a"), col("doc_b"), col(cnt),
            expr(s"$cnt * 1000000 div n_ref").as(ppm))
      }
      cand
        .join(recall(uni, "n_uni_common", "r1_ppm"), Seq("doc_a", "doc_b"),
          "left")
        .join(recall(bi, "n_bi_common", "r2_ppm"), Seq("doc_a", "doc_b"),
          "left")
        .select(col("doc_a"), col("doc_b"),
          coalesce(col("n_uni_common"), lit(0L)).as("n_uni_common"),
          coalesce(col("r1_ppm"), lit(0L)).as("r1_ppm"),
          coalesce(col("n_bi_common"), lit(0L)).as("n_bi_common"),
          coalesce(col("r2_ppm"), lit(0L)).as("r2_ppm"))
        .orderBy("doc_a", "doc_b")
    }),

    // Bartlett's variance-homogeneity test across the five priorities —
    // the parametric sharp-nosed sibling of q474's Brown–Forsythe (which
    // stays valid under non-normality; run both, believe Bartlett only
    // when q474 agrees): (N−k)·ln Sp² − Σ(nᵢ−1)·ln Sᵢ², corrected by
    // C = 1 + (Σ1/(nᵢ−1) − 1/(N−k))/(3(k−1)). Variance ratios exact
    // integer; ONE ln per group (micro-nats) + one for the pooled term;
    // the correction in nano-reciprocals — all engine-portable
    "q508_bartlett_test" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderpriority").as("g"), centsOf(col("o_totalprice")).as("x"))
        .groupBy("g")
        .agg(count(lit(1)).as("ng"), sum(col("x")).as("sx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
        .select(col("ng"),
          expr("CAST(ng AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx").as("a"),
          expr("CAST(round(ln(CAST(CAST(ng AS DECIMAL(38,0)) * sxx" +
            " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)" +
            " / (CAST(ng AS DOUBLE) * (ng - 1))) * 1000000) AS BIGINT)")
            .as("lnv"),
          expr("1000000000 div (ng - 1)").as("recip"))
        .agg(count(lit(1)).as("k_groups"), sum(col("ng")).as("n"),
          sum(expr("(ng - 1) * lnv")).as("sl"),
          // a div ng ≈ (nᵢ−1)Sᵢ² in cents² reaches 6e18 per group at sf0.1 —
          // the 5-group sum overflows long; keep the pooled term in
          // kilo-cents² (pinned, ×1000 restored inside the ln)
          sum(expr("a div ng div 1000")).as("p"),
          sum(col("recip")).as("sr"))
        .select(col("k_groups"), col("n"),
          expr("(n - k_groups) * CAST(round(ln(CAST(p AS DOUBLE) * 1000" +
            " / (n - k_groups)) * 1000000) AS BIGINT) - sl").as("t_micro"),
          expr("1000000000 + (sr - 1000000000 div (n - k_groups))" +
            " div (3 * (k_groups - 1))").as("c_nano"))
        .withColumn("t_adj_micro",
          expr("CAST(CAST(t_micro AS DECIMAL(38,0)) * 1000000000" +
            " div c_nano AS BIGINT)"))),

    // Somers' D and Goodman–Kruskal gamma between order priority (its
    // leading digit is the ordinal) and the price quartile: ordinal
    // association from concordant/discordant pair counts — computed on
    // the 5×4 CONTINGENCY CELLS (a 20×20 bounded pair join), never the
    // N² row pairs; gamma ignores ties, Somers' D charges the
    // y-tied pairs to the denominator (the asymmetric "does priority
    // predict price band" readout)
    "q509_somers_gamma" -> ((s, dir) => {
      val cells = Tables.orders(s, dir)
        .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("x"),
          centsOf(col("o_totalprice")).as("v"), col("o_orderkey"))
        .withColumn("y", ntile(4).over(
          Window.orderBy(col("v"), col("o_orderkey"))).cast("long"))
        .groupBy("x", "y").agg(count(lit(1)).as("n"))
        .localCheckpoint(false)
      cells.select(col("x").as("xa"), col("y").as("ya"), col("n").as("na"))
        .join(cells.select(col("x").as("xb"), col("y").as("yb"),
          col("n").as("nb")), col("xa") < col("xb"))
        .agg(
          sum(when(col("ya") < col("yb"), col("na") * col("nb")).otherwise(0L))
            .as("c_pairs"),
          sum(when(col("ya") > col("yb"), col("na") * col("nb")).otherwise(0L))
            .as("d_pairs"),
          sum(when(col("ya") === col("yb"), col("na") * col("nb")).otherwise(0L))
            .as("t_y"))
        .select(col("c_pairs"), col("d_pairs"), col("t_y"),
          expr("(c_pairs - d_pairs) * 1000000 div (c_pairs + d_pairs)")
            .as("gamma_ppm"),
          expr("(c_pairs - d_pairs) * 1000000 div (c_pairs + d_pairs + t_y)")
            .as("somers_d_ppm"))
    }),

    // Theil's uncertainty coefficient U(lang|source) and U(source|lang):
    // the NORMALIZED asymmetric cousins of q249's mutual information —
    // "what fraction of lang's entropy does knowing source remove".
    // Entropies summed from per-term 1e-9-quantized contributions (q90
    // discipline: one ln per observed cell, partition-order invariant)
    "q510_theils_u" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("lang", "source")
        .localCheckpoint(false)
      val nTot = broadcast(d.agg(count(lit(1)).as("nt")))
      def ent(cols: Column*): DataFrame =
        d.groupBy(cols: _*).agg(count(lit(1)).as("c"))
          .crossJoin(nTot)
          .select(expr("CAST(round(-(CAST(c AS DOUBLE)/nt)" +
            " * ln(CAST(c AS DOUBLE)/nt) * 1e9) AS BIGINT)").as("t9"))
          .agg(sum(col("t9")).as("h"))
      ent(col("lang")).select(col("h").as("h_lang_nano"))
        .crossJoin(broadcast(ent(col("source")).select(col("h").as("h_source_nano"))))
        .crossJoin(broadcast(ent(col("lang"), col("source"))
          .select(col("h").as("h_joint_nano"))))
        .select(col("h_lang_nano"), col("h_source_nano"), col("h_joint_nano"),
          expr("(h_lang_nano + h_source_nano - h_joint_nano) * 1000000" +
            " div h_lang_nano").as("u_lang_given_source_ppm"),
          expr("(h_lang_nano + h_source_nano - h_joint_nano) * 1000000" +
            " div h_source_nano").as("u_source_given_lang_ppm"))
    }),

    // Gram–Schmidt orthogonalization of vector 1 against vector 0 in
    // exact quantized arithmetic: projection coefficient ⟨v1,v0⟩/⟨v0,v0⟩
    // in micro, residual components on the 1e-12 grid — the readout
    // proves ⟨r,v0⟩ collapses to rounding noise (|·| ≤ ‖v0‖₁/2 from the
    // coefficient truncation alone) without a single double. The 2-vector
    // primitive behind QR/whitening; everything joins on the 64 dims
    "q511_gram_schmidt" -> ((s, dir) => {
      val q = Tables.embeddings(s, dir).filter(col("vec_id") <= 1)
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos"),
          round(col("x") * 1000000, 0).cast("long").as("qv"))
      val v0 = q.filter(col("vec_id") === 0)
        .select(col("pos"), col("qv").as("q0"))
      val v1 = q.filter(col("vec_id") === 1)
        .select(col("pos"), col("qv").as("q1"))
      val dots = v0.join(v1, "pos")
        .agg(sum(expr("CAST(q1 AS DECIMAL(38,0)) * q0")).as("dot01"),
          sum(expr("CAST(q0 AS DECIMAL(38,0)) * q0")).as("n0"),
          sum(expr("CAST(q1 AS DECIMAL(38,0)) * q1")).as("n1"))
        .withColumn("c_micro", expr("dot01 * 1000000 div n0"))
      v0.join(v1, "pos").crossJoin(broadcast(dots))
        .select(col("dot01"), col("n0"), col("n1"), col("c_micro"),
          expr("q1 * 1000000 - c_micro * q0").as("r"), col("q0"))
        .groupBy("dot01", "n0", "n1", "c_micro")
        .agg(
          sum(expr("CAST(r AS DECIMAL(38,0)) * r")).as("rn2"),
          sum(expr("CAST(r AS DECIMAL(38,0)) * q0")).as("rdot0"))
        .select(col("dot01").cast("long").as("dot01_q"),
          col("n0").cast("long").as("norm0_q"),
          col("n1").cast("long").as("norm1_q"), col("c_micro"),
          expr("CAST(rn2 div 1000000000000 AS BIGINT)").as("resid_norm2_q"),
          expr("CAST(rdot0 div 1000000 AS BIGINT)").as("resid_dot0_micro"),
          expr("CAST(CASE WHEN dot01 >= 0 THEN dot01 * dot01 * 1000000" +
            " div (n0 * n1) ELSE -(dot01 * dot01 * 1000000 div (n0 * n1))" +
            " END AS BIGINT)").as("cos2_signed_ppm"))
    }),

    // Mood's median test across the five priorities: does any priority's
    // price distribution sit above/below the GLOBAL median more than its
    // share — the coarsest, most outlier-proof of the k-group location
    // tests (q494 ranks everything; this only asks "above or not"). The
    // median is the exact (N+1)/2 order statistic from the value-grouped
    // cumulative relation (q289 discipline); χ² via the zero-cell-free
    // O²/E identity (q290 discipline)
    "q512_moods_median" -> ((s, dir) => {
      val j = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("g"), centsOf(col("o_totalprice")).as("v"))
        .localCheckpoint(false)
      val before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
      val med = j.groupBy("v").agg(count(lit(1)).as("cnt"))
        .withColumn("cb", coalesce(sum(col("cnt")).over(before), lit(0L)))
        .crossJoin(broadcast(j.agg(count(lit(1)).as("n"))))
        .filter(col("cb") < expr("(n + 1) div 2") &&
          expr("cb + cnt") >= expr("(n + 1) div 2"))
        .select(col("v").as("med"), col("n"))
      val cells = j.crossJoin(broadcast(med))
        .select(col("g"), (col("v") > col("med")).cast("long").as("above"),
          col("med"), col("n"))
        .groupBy("g", "above", "med", "n").agg(count(lit(1)).as("o"))
        .localCheckpoint(false)
      val ng = cells.groupBy("g").agg(sum(col("o")).as("n_g"))
      val ca = cells.groupBy("above").agg(sum(col("o")).as("n_a"))
      cells.join(broadcast(ng), "g").join(broadcast(ca), "above")
        .select(col("med"), col("n"),
          expr("CAST(round(CAST(o AS DOUBLE) * o / (CAST(n_g AS DOUBLE) * n_a)" +
            " * 1000000000) AS BIGINT)").as("t9"))
        .groupBy("med", "n").agg(sum(col("t9")).as("s9"))
        .select(col("n").as("n_orders"), col("med").as("median_cents"),
          expr("n * (s9 - 1000000000)").as("chi2_nano"))
    }),

    // Lo–MacKinlay variance-ratio test on daily revenue: VR(q) =
    // Var(q-day change)/(q·Var(1-day change)) — 1 under a random walk,
    // >1 under momentum, <1 under mean reversion. Exact integer variance
    // numerators on the bounded per-day relation (one window pass
    // supplies all three lags), ratio as one decimal division per q
    "q513_variance_ratio" -> ((s, dir) => {
      val day = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").as("d"))
        .agg(sum(centsOf(col("o_totalprice"))).as("r"))
      val w = Window.orderBy("d")
      val diffs = day
        .select(col("d"), col("r"),
          (col("r") - lag(col("r"), 1).over(w)).as("d1"),
          (col("r") - lag(col("r"), 2).over(w)).as("d2"),
          (col("r") - lag(col("r"), 4).over(w)).as("d4"),
          (col("r") - lag(col("r"), 8).over(w)).as("d8"))
        .localCheckpoint(false)
      val base = broadcast(diffs.filter(col("d1").isNotNull)
        .agg(count(lit(1)).as("n1"), sum(col("d1")).as("s1"),
          sum(expr("CAST(d1 AS DECIMAL(38,0)) * d1")).as("ss1")))
      def vr(qq: Int): DataFrame = diffs.filter(col(s"d$qq").isNotNull)
        .agg(count(lit(1)).as("nq"), sum(col(s"d$qq")).as("sq"),
          sum(expr(s"CAST(d$qq AS DECIMAL(38,0)) * d$qq")).as("ssq"))
        .crossJoin(base)
        .select(lit(qq.toLong).as("q"), col("nq").as("n_diffs"),
          expr(s"CAST((CAST(nq AS DECIMAL(38,0)) * ssq" +
            s" - CAST(sq AS DECIMAL(38,0)) * sq)" +
            s" * n1 * n1 * 1000000" +
            s" div ($qq * (CAST(n1 AS DECIMAL(38,0)) * ss1" +
            s" - CAST(s1 AS DECIMAL(38,0)) * s1)" +
            s" * nq * nq) AS BIGINT)").as("vr_ppm"))
      vr(2).unionAll(vr(4)).unionAll(vr(8)).orderBy("q")
    }),
  )
}
