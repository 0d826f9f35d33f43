package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.io.Zones

/** Thin per-stage CLI mains mirroring the reference's three scripts
  * (`unpack_to_raw.py`, `preprocess_to_staging.py`, `process_to_curated.py`
  * — SURVEY.md §3, §7 item 8). `RunPipeline` chains all three; these run a
  * stage in isolation against an existing lake, communicating through the
  * zone sinks exactly as the reference stages communicate through S3.
  */
object StageMains {
  private[pipeline] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** `runMain graft.pipeline.UnpackToRaw <lakeRoot> <shardDir> [<shardDir>...]` */
object UnpackToRaw {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: UnpackToRaw <lakeRoot> <shardDir>...")
    val spark = StageMains.session()
    val zones = Zones(args.head)
    zones.ensure(spark)
    val raw = Stages.unpackToRaw(spark, args.drop(1).toSeq, zones)
    println(s"[unpack] rows=${raw.count()}")
    spark.stop()
  }
}

/** `runMain graft.pipeline.PreprocessToStaging <lakeRoot>` — reads the raw
  * zone written by [[UnpackToRaw]].
  */
object PreprocessToStaging {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: PreprocessToStaging <lakeRoot>")
    val spark = StageMains.session()
    val zones = Zones(args.head)
    val raw = Zones.readCsv(spark, Stages.RawSchema, header = true, Seq(s"${zones.raw}/combined"))
    val out = Stages.preprocessToStaging(raw, zones, orderCol = "sequence_name")
    println(s"[preprocess] train=${out.train.count()} dev=${out.dev.count()} " +
      s"test=${out.test.count()} classes=${out.labelMapping.count()}")
    spark.stop()
  }
}

/** `runMain graft.pipeline.ProcessToCurated <lakeRoot> <split>` — tokenizes
  * one staging split (the reference runs this once per split, `dvc.yaml:13-17`).
  */
object ProcessToCurated {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ProcessToCurated <lakeRoot> <split>")
    val spark = StageMains.session()
    val zones = Zones(args.head)
    val split = args(1)
    // schema'd read: an inferless CSV read would type class_encoded as
    // string and diverge from the RunPipeline path's long
    val staging = Zones.readCsv(
      spark, Stages.StagingSchema, header = true, Seq(s"${zones.staging}/preprocessed_$split"))
    val out = Stages.processToCurated(staging, zones, split)
    println(s"[process] split=$split rows=${out.count()}")
    spark.stop()
  }
}
