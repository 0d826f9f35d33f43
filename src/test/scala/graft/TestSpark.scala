package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (session startup dominates test
  * wall-clock otherwise).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // in-process object store (CAS put, paged LIST, no rename) — the
    // txlog protocol specs run tables end-to-end on mem:// roots
    .config("spark.hadoop.fs.mem.impl", "graft.io.MemFileSystem")
    .getOrCreate()
}
