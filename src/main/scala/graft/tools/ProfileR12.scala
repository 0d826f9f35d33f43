package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup
import graft.plans.JaroWinkler

/** r12 optimization scratch probe: decompose the heavy steady-state
  * queries into stages and time each (`runMain graft.tools.ProfileR12
  * <sfDir> [probe...]`). Noop-style counts; every probe is run twice so
  * rep2 is the steady-state number (guide §1.4/§1.1).
  */
object ProfileR12 {
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

    def time(name: String)(f: => Long): Unit =
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime(); val n = f
        println(f"[p] rep$r $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
      }

    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def centsOf(c: org.apache.spark.sql.Column) =
      expr(s"CAST(round((${c}) * 100) AS BIGINT)")

    if (on("q338")) {
      val b = Tables.part(spark, sfDir).select(col("p_partkey").as("k"),
        col("p_brand"), col("p_type"), col("p_name"),
        centsOf(col("p_retailprice")).as("price_c"),
        col("p_size").cast("long").as("psize"))
      val names = b.select(col("p_name").as("na")).distinct()
      time("q338 names distinct")(names.count())
      val simNames = names
        .join(broadcast(names.select(col("na").as("nb"))), col("na") <= col("nb"))
        .filter(round(JaroWinkler(col("na"), col("nb")), 6) >= 0.88)
        .select("na", "nb")
      time("q338 simNames (JW all-pairs)")(simNames.count())
      val edges = b.select(col("k").as("doc_a"), col("p_brand").as("brand"),
          col("p_type").as("ptype"), col("p_name").as("name_a"))
        .join(b.select(col("k").as("doc_b"), col("p_brand").as("brand_b"),
          col("p_type").as("ptype_b"), col("p_name").as("name_b")),
          col("brand") === col("brand_b") && col("ptype") === col("ptype_b")
            && col("doc_a") < col("doc_b"))
        .withColumn("na", least(col("name_a"), col("name_b")))
        .withColumn("nb", greatest(col("name_a"), col("name_b")))
        .join(broadcast(simNames), Seq("na", "nb"))
        .select("doc_a", "doc_b")
      time("q338 edges")(edges.count())
      time("q338 CC labels")(
        graft.operators.ConnectedComponents.labels(edges, "doc_a", "doc_b").count())
      time("q338 full")(
        graft.SparkEntry.queries("q338_golden_record")(spark, sfDir).count())
    }

    if (on("q382")) {
      val baskets = Tables.lineitem(spark, sfDir)
        .join(broadcast(Tables.part(spark, sfDir).select("p_partkey", "p_brand")),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("p_brand").as("b")).distinct()
      time("q382 baskets distinct")(baskets.count())
      val bk = baskets.localCheckpoint()
      val ni = bk.groupBy("b").agg(count(lit(1)).as("n"))
      val pr = bk.as("a").join(bk.as("c"),
          col("a.cust") === col("c.cust") && col("a.b") < col("c.b"))
        .groupBy(col("a.b").as("ba"), col("c.b").as("bb"))
        .agg(count(lit(1)).as("n_ab"))
      time("q382 pair self-join")(pr.count())
      val sims = pr
        .join(broadcast(ni.select(col("b").as("ba"), col("n").as("na"))), Seq("ba"))
        .join(broadcast(ni.select(col("b").as("bb"), col("n").as("nb"))), Seq("bb"))
        .select(col("ba"), col("bb"),
          expr("n_ab * 1000000 div CAST(floor(sqrt(CAST(na AS DOUBLE) * nb)) AS BIGINT)")
            .as("sim_u"))
      val simsBoth = sims.unionByName(sims.select(col("bb").as("ba"),
        col("ba").as("bb"), col("sim_u"))).localCheckpoint()
      val scores = bk.join(broadcast(simsBoth), col("b") === col("ba"))
        .groupBy(col("cust"), col("bb").as("rec"))
        .agg(sum(col("sim_u")).as("score_u"))
        .join(bk.select(col("cust"), col("b").as("rec")),
          Seq("cust", "rec"), "left_anti")
      time("q382 scores+anti")(scores.count())
      time("q382 full")(
        graft.SparkEntry.queries("q382_recommendations")(spark, sfDir).count())
    }

    if (on("q136")) {
      val d = Tables.documents(spark, sfDir)
      val base = d.filter(col("text").isNotNull)
        .select(col("doc_id"), col("source").as("actual"), col("text"))
      val words = base
        .select(col("doc_id"), col("actual"), explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) > 0)
      time("q136 words explode")(words.count())
      val dw = words.groupBy("doc_id", "actual", "w").agg(count(lit(1)).as("n"))
      time("q136 dw groupBy")(dw.count())
      val dwc = dw.localCheckpoint()
      val lw = dwc.groupBy(col("actual").as("lbl"), col("w")).agg(sum(col("n")).as("c"))
      time("q136 lw")(lw.count())
      time("q136 adjSum-ish join")(
        dwc.join(lw.select(col("w"), col("lbl"), col("c")), "w")
          .groupBy("doc_id", "actual", "lbl").agg(sum(col("n") * col("c")).as("x")).count())
      time("q136 full")(
        graft.SparkEntry.queries("q136_nb_attribution")(spark, sfDir).count())
    }

    if (on("q300")) {
      time("q300 full")(
        graft.SparkEntry.queries("q300_pipeline_card")(spark, sfDir).count())
    }

    if (on("q343")) {
      val docs = Tables.documents(spark, sfDir)
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
        .select("doc_a", "doc_b")
      time("q343 cand")(cand.count())
      val candc = cand.localCheckpoint()
      time("q343 labels(old half)")(
        graft.operators.ConnectedComponents.labels(
          candc.limit(200), "doc_a", "doc_b").count())
      time("q343 full")(
        graft.SparkEntry.queries("q343_incremental_clusters")(spark, sfDir).count())
    }

    if (on("q500")) {
      val fp0 = Tables.documents(spark, sfDir)
        .filter(col("text").isNotNull && length(col("text")) >= 5)
        .select(col("source"), col("doc_id"),
          explode(expr("sequence(1, length(text) - 4)")).as("i"), col("text"))
        .select(col("source"), col("doc_id"), col("i"),
          Dedup.md5Long(expr("substring(text, i, 5)"), 12).as("h"))
      time("q500 explode+md5")(fp0.count())
      val fp = fp0
        .withColumn("m", min(col("h")).over(Window.partitionBy("doc_id")
          .orderBy("i").rowsBetween(-3, 0)))
        .groupBy("source", "doc_id", "m")
        .agg(count(lit(1)).as("n_windows"))
      time("q500 window-min + groupBy")(fp.count())
      time("q500 full")(
        graft.SparkEntry.queries("q500_winnowing")(spark, sfDir).count())
    }

    spark.stop()
  }
}
