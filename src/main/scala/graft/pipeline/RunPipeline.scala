package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.io.Zones

/** CLI entry mirroring the reference's three stage scripts (`dvc.yaml`
  * stages unpack → preprocess → process, SURVEY.md §3.4) as one driver:
  *
  * `runMain graft.pipeline.RunPipeline <lakeRoot> <shardDir> [<shardDir>...]`
  *
  * Stage boundaries remain observable on disk (raw/staging/curated sinks),
  * but each stage is a single lazy Spark plan — no temp files, no driver
  * data movement, no subprocess orchestration.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunPipeline <lakeRoot> <shardDir> [<shardDir>...]")
    val lakeRoot  = args.head
    val shardDirs = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val zones = Zones(lakeRoot)
    zones.ensure(spark)
    val raw = Stages.unpackToRaw(spark, shardDirs, zones)
    // raw zone carries no stable row key; synthesize one from the natural
    // unique column for split determinism (SURVEY.md §2.5 SP1)
    val out = Stages.preprocessToStaging(raw, zones, orderCol = "sequence_name")
    Seq("train" -> out.train, "dev" -> out.dev, "test" -> out.test).foreach {
      case (name, df) => Stages.processToCurated(df, zones, name)
    }
    println(s"[pipeline] raw=${raw.count()} train=${out.train.count()} " +
      s"dev=${out.dev.count()} test=${out.test.count()} classes=${out.labelMapping.count()}")
    spark.stop()
  }
}
