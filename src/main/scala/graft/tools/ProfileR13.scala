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
