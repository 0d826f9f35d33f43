package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One entry per operator row in SURVEY.md §2 (parity) and §2.9
  * (north-star). Every query is a pure function of the sf directory, built
  * from the graft library, ending in a total-order `orderBy`; `OracleSql`
  * holds the matching DuckDB SQL for every query.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_stats_summary")(spark, "/root/testdata/sf0.001")

  /** The full registry: per-range shards concatenated in insertion order
    * (ListMap ++ preserves it). Built once — 633 closures live in ten
    * shard initializers instead of one oversized static init.
    */
  private lazy val all: ListMap[String, (SparkSession, String) => DataFrame] =
    Shard01.defs ++
      Shard02.defs ++
      Shard03.defs ++
      Shard04.defs ++
      Shard05.defs ++
      Shard06.defs ++
      Shard07.defs ++
      Shard08.defs ++
      Shard09.defs ++
      Shard10.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] = all

  def oracleSql: Map[String, String] = OracleSql.sql
}
