package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** r13 optimization scratch probe: decompose this round's heavy
  * steady-state queries into stages and time each (`runMain
  * graft.tools.ProfileR13 <sfDir> [probe...]`). Noop-sink timings;
  * every probe runs twice so rep2 is the steady-state number (guide
  * §1.4/§1.1).
  */
object ProfileR13 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).toSet
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def on(p: String): Boolean = which.isEmpty || which(p)

    def noop(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }
    def time(name: String)(f: => Long): Unit =
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime(); val n = f
        println(f"[p] rep$r $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      }

    if (on("q500")) {
      val nsp = spark.sessionState.conf.numShufflePartitions
      val base = Tables.documents(spark, sfDir)
        .filter(col("text").isNotNull && length(col("text")) >= 5)
        .repartition(nsp, col("doc_id"))
      time("q500 repartitioned docs")(base.count())
      val grams = base
        .select(col("source"), col("doc_id"),
          explode(expr("sequence(1, length(text) - 4)")).as("i"), col("text"))
        .select(col("source"), col("doc_id"), col("i"),
          Dedup.md5Long(expr("substring(text, i, 5)"), 12).as("h"))
      time("q500 explode+md5 noop")(noop(grams))
      val win = grams.withColumn("m",
        min(col("h")).over(Window.partitionBy("doc_id")
          .orderBy("i").rowsBetween(-3, 0)))
      time("q500 +window-min noop")(noop(win))
      val fp = win.groupBy("source", "doc_id", "m")
        .agg(count(lit(1)).as("n_windows"))
      time("q500 +fp agg count")(fp.count())
      val fpC = fp.localCheckpoint(false)
      time("q500 fp checkpoint count")(fpC.count())
      val shared = fpC.groupBy("source", "m")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .groupBy("source")
        .agg(sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared_fp"))
      time("q500 shared agg")(shared.count())
      time("q500 full")(
        graft.SparkEntry.queries("q500_winnowing")(spark, sfDir).count())
    }

    if (on("tail")) {
      // where does the sub-1s tail's per-query cost go? Decompose a
      // representative sample: DataFrame construction (analysis),
      // physical planning (optimization+strategies), first execution
      // (codegen+jobs), second execution (warm jobs only).
      val sample = Seq("q03_group_size_stats", "q15_filter_events",
        "q150_order_count_dist", "q199_partition_balance",
        "q223_seasonal_index", "q257_rank_panel", "q290_cramers_v",
        "q308_hill_tail_index", "q355_stickiness", "q436_abc_xyz",
        "q509_somers_gamma", "q617_price_endings")
      for (r <- 1 to 2; n <- sample) {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        df.count()
        val t4 = System.nanoTime()
        println(f"[p] rep$r tail $n%-26s analyze=${(t1 - t0) / 1e9}%5.2f " +
          f"plan=${(t2 - t1) / 1e9}%5.2f exec1=${(t3 - t2) / 1e9}%5.2f " +
          f"exec2=${(t4 - t3) / 1e9}%5.2f")
      }
    }

    if (on("ccsort")) {
      // does minhashCandidates' trailing orderBy survive under CC's
      // canonical() distinct (a wasted range exchange + sampling job per
      // round-0), or does EliminateSorts drop it?
      val cand = Dedup.minhashCandidates(
        Tables.documents(spark, sfDir), "doc_id", "text").select("doc_a", "doc_b")
      val canonical = cand
        .filter(col("doc_a").isNotNull && col("doc_b").isNotNull &&
          col("doc_a") =!= col("doc_b"))
        .select(greatest(col("doc_a"), col("doc_b")).as("src"),
          least(col("doc_a"), col("doc_b")).as("dst"))
        .distinct()
      val p = canonical.queryExecution.executedPlan.toString
      println(s"[p] ccsort rangepartitioning=${p.contains("rangepartitioning")} " +
        s"sorts=${"Sort ".r.findAllIn(p).size}")
    }

    if (on("q436")) {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val pm = Tables.lineitem(spark, sfDir)
          .join(Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderdate")),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_partkey"),
            expr("(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1").as("mi"))
          .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("q"),
            sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev"))
          .filter(col("mi") >= 0 && col("mi") < 24)
        val t1 = System.nanoTime()
        val per0 = pm.groupBy("l_partkey")
          .agg(sum(col("q")).as("sq"), sum(expr("q * q")).as("sqq"),
            sum(col("rev")).as("rev"))
          .filter(col("sq") > 0)
        val t2 = System.nanoTime()
        val per = per0.localCheckpoint(false)
        val t3 = System.nanoTime()
        println(f"[p] rep$r q436 pm=${(t1 - t0) / 1e9}%5.2f per=${(t2 - t1) / 1e9}%5.2f " +
          f"ckpt=${(t3 - t2) / 1e9}%5.2f")
      }
    }

    if (on("q216")) {
      val (tauNum, tauDen) = (9, 10)
      val toks = Tables.documents(spark, sfDir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          explode(array_distinct(graft.plans.WordShingles(col("text"), 2))).as("w"))
        .localCheckpoint(false)
      time("q216 toks ckpt")(toks.count())
      val dfreq = toks.groupBy("w").agg(count(lit(1)).as("df"))
      time("q216 dfreq")(dfreq.count())
      val wDoc = Window.partitionBy("doc_id")
      val ranked = toks.join(dfreq, "w")
        .select(col("doc_id"), col("w"),
          count(lit(1)).over(wDoc).as("n"),
          row_number().over(wDoc.orderBy("df", "w")).as("rn"))
      time("q216 ranked noop")(noop(ranked))
      val prefix = ranked
        .filter(col("rn") <= col("n") - expr(s"($tauNum * n + ${tauDen - 1}) div $tauDen") + 1)
        .select("doc_id", "w", "n", "rn")
      val cand = prefix.as("a")
        .join(prefix.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id")
            && col("a.n") * tauNum <= col("b.n") * tauDen
            && col("b.n") * tauNum <= col("a.n") * tauDen
            && (least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) + 1) *
              (tauNum + tauDen) >= (col("a.n") + col("b.n")) * tauNum)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("sz_a"), col("b.n").as("sz_b"))
        .distinct()
      time("q216 cand")(cand.count())
      val docSets = toks.groupBy("doc_id").agg(collect_set(col("w")).as("ws"))
      time("q216 docSets noop")(noop(docSets))
      val inter = cand
        .join(docSets.select(col("doc_id").as("doc_a"), col("ws").as("ws_a")), "doc_a")
        .join(docSets.select(col("doc_id").as("doc_b"), col("ws").as("ws_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"),
          size(array_intersect(col("ws_a"), col("ws_b"))).cast("long").as("inter"))
      time("q216 inter noop")(noop(inter))
      time("q216 full")(
        graft.SparkEntry.queries("q216_prefix_filter_join")(spark, sfDir).count())
    }

    if (on("spread")) {
      // one-JVM A/B of the spreadByKey shapes feeding the LSH pipeline:
      // none vs advisory repartition (AQE-coalescable) vs pinned
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      def bands(spreadMode: String): DataFrame = {
        val base = spreadMode match {
          case "none"     => docs
          case "advisory" => docs.repartition(col("doc_id"))
          case "pinned"   => docs.repartition(
            spark.sessionState.conf.numShufflePartitions, col("doc_id"))
        }
        val mh = base.filter(col("text").isNotNull)
          .select(col("doc_id"), graft.plans.MinHashExpr(col("text"), 8).as("m"))
        val bandCols = (0 until 2).map { b =>
          struct(lit(b).as("b"),
            md5(concat_ws("-", (0 until 4).map(i =>
              element_at(col("m"), b * 4 + i + 1).cast("string")): _*)).as("bsig"))
        }
        val bb = mh.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
          .select(col("doc_id"), col("bb.b").as("b"), col("bb.bsig").as("bsig"))
        bb.as("x").hint("shuffle_merge").join(bb.as("y"),
            col("x.b") === col("y.b") && col("x.bsig") === col("y.bsig") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_bands"))
      }
      for (r <- 1 to 3; m <- Seq("none", "advisory", "pinned")) {
        val t0 = System.nanoTime(); val n = bands(m).count()
        println(f"[p] rep$r spread=$m%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      }
    }

    if (on("q382pin")) {
      // does AQE coalesce the advisory repartition(cust) to ~1 partition
      // and serialize the 7M-row fan-out? A/B the pinned variant.
      def basketsBy(pin: Boolean): DataFrame = {
        val base = Tables.lineitem(spark, sfDir)
          .join(broadcast(Tables.part(spark, sfDir).select("p_partkey", "p_brand")),
            col("p_partkey") === col("l_partkey"))
          .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("cust"), col("p_brand").as("b")).distinct()
          .localCheckpoint(false)
        if (pin) base.repartition(spark.sessionState.conf.numShufflePartitions,
          col("cust"))
        else base.repartition(col("cust"))
      }
      for (pin <- Seq(false, true)) {
        val baskets = basketsBy(pin)
        val ni = baskets.groupBy("b").agg(count(lit(1)).as("n"))
        val pr = baskets.as("a").join(baskets.as("c"),
            col("a.cust") === col("c.cust") && col("a.b") < col("c.b"))
          .groupBy(col("a.b").as("ba"), col("c.b").as("bb"))
          .agg(count(lit(1)).as("n_ab"))
        val sims = pr
          .join(broadcast(ni.select(col("b").as("ba"), col("n").as("na"))), Seq("ba"))
          .join(broadcast(ni.select(col("b").as("bb"), col("n").as("nb"))), Seq("bb"))
          .select(col("ba"), col("bb"),
            expr("n_ab * 1000000 div CAST(floor(sqrt(CAST(na AS DOUBLE) * nb)) AS BIGINT)")
              .as("sim_u"))
        val simsBoth = sims.unionByName(sims.select(col("bb").as("ba"),
          col("ba").as("bb"), col("sim_u"))).localCheckpoint(false)
        val scoresRaw = baskets.join(broadcast(simsBoth), col("b") === col("ba"))
          .groupBy(col("cust"), col("bb").as("rec"))
          .agg(sum(col("sim_u")).as("score_u"))
        time(s"q382 pin=$pin fanout-agg noop")(noop(scoresRaw))
      }
    }

    if (on("q382")) {
      val baskets = Tables.lineitem(spark, sfDir)
        .join(broadcast(Tables.part(spark, sfDir).select("p_partkey", "p_brand")),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("p_brand").as("b")).distinct()
        .localCheckpoint(false)
        .repartition(col("cust"))
      time("q382 baskets build+repart")(baskets.count())
      val ni = baskets.groupBy("b").agg(count(lit(1)).as("n"))
      val pr = baskets.as("a").join(baskets.as("c"),
          col("a.cust") === col("c.cust") && col("a.b") < col("c.b"))
        .groupBy(col("a.b").as("ba"), col("c.b").as("bb"))
        .agg(count(lit(1)).as("n_ab"))
      time("q382 pair self-join agg")(pr.count())
      val sims = pr
        .join(broadcast(ni.select(col("b").as("ba"), col("n").as("na"))), Seq("ba"))
        .join(broadcast(ni.select(col("b").as("bb"), col("n").as("nb"))), Seq("bb"))
        .select(col("ba"), col("bb"),
          expr("n_ab * 1000000 div CAST(floor(sqrt(CAST(na AS DOUBLE) * nb)) AS BIGINT)")
            .as("sim_u"))
      val simsBoth = sims.unionByName(sims.select(col("bb").as("ba"),
        col("ba").as("bb"), col("sim_u"))).localCheckpoint(false)
      time("q382 simsBoth ckpt")(simsBoth.count())
      val fanout = baskets.join(broadcast(simsBoth), col("b") === col("ba"))
      time("q382 fan-out noop")(noop(fanout))
      val scoresRaw = fanout.groupBy(col("cust"), col("bb").as("rec"))
        .agg(sum(col("sim_u")).as("score_u"))
      time("q382 fan-out agg noop")(noop(scoresRaw))
      val scores = scoresRaw
        .join(broadcast(baskets.select(col("cust"), col("b").as("rec"))),
          Seq("cust", "rec"), "left_anti")
      time("q382 +anti noop")(noop(scores))
      val ranked = scores.withColumn("rk", row_number().over(
          Window.partitionBy("cust").orderBy(col("score_u").desc, col("rec"))))
        .filter(col("rk") <= 3)
      time("q382 +window noop")(noop(ranked))
      time("q382 full")(
        graft.SparkEntry.queries("q382_recommendations")(spark, sfDir).count())
    }

    // q500's localCheckpoint hides the gram pipeline from the final
    // query's explain — dump the PRE-checkpoint segment for both shapes
    // (old: explode in the scan task, exchange AFTER the fan-out; new:
    // pinned repartition BEFORE the explode) so the plan claim is
    // checkable: plans/r13/q500_winnowing_prefp_{before,after}.txt
    if (on("q500plan")) {
      def fpPlan(repartitionFirst: Boolean): String = {
        val docs = Tables.documents(spark, sfDir)
          .filter(col("text").isNotNull && length(col("text")) >= 5)
        val base =
          if (repartitionFirst)
            docs.repartition(spark.sessionState.conf.numShufflePartitions,
              col("doc_id"))
          else docs
        base
          .select(col("source"), col("doc_id"),
            explode(expr("sequence(1, length(text) - 4)")).as("i"), col("text"))
          .select(col("source"), col("doc_id"), col("i"),
            Dedup.md5Long(expr("substring(text, i, 5)"), 12).as("h"))
          .withColumn("m", min(col("h")).over(Window.partitionBy("doc_id")
            .orderBy("i").rowsBetween(-3, 0)))
          .groupBy("source", "doc_id", "m")
          .agg(count(lit(1)).as("n_windows"))
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
      }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(
        "/root/repo/plans/r13/q500_winnowing_prefp_before.txt"), fpPlan(false))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(
        "/root/repo/plans/r13/q500_winnowing_prefp_after.txt"), fpPlan(true))
      println("[p] q500 pre-checkpoint plans dumped")
    }

    spark.stop()
  }
}
