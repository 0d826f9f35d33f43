package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev utility: dump `.explain("formatted")` for inventory queries —
  * `runMain graft.tools.ExplainDump <sfDir> <outDir> <name>[,<name>...] [suffix]`.
  * Writes one `<outDir>/<name>_<suffix>.txt` per query (suffix defaults to
  * "before"); the optimization-round deliverable for plan claims.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val outDir = args(1)
    val names  = args(2).split(",").toSeq
    val suffix = args.lift(3).getOrElse("before")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      val t0 = System.nanoTime()
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
        val nEx = "Exchange".r.findAllIn(plan).length
        println(f"[explain] $n%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
          f"exchanges=$nEx  -> $outDir/${n}_$suffix.txt")
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[explain] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
