package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual inventory queries end-to-end (collect) —
  * `runMain graft.tools.TimeQuery <sfDir> <name>[,<name>...] [reps]`.
  * Prints one line per run; use reps=2+ to separate plan/JIT warmup from
  * steady-state cost.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps  = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, sfDir).collect().length
      println(f"[time] rep$r $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$cnt")
    }
    spark.stop()
  }
}
