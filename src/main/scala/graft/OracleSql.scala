package graft

import graft.queries._

/** DuckDB oracle SQL for every SQL-expressible `SparkEntry.queries` entry.
  *
  * Contract (SURVEY.md §5.1): the driver runs these against the same parquet
  * tables at sf0.01 and hash-compares with the Spark output, columns sorted
  * by name. Discipline for bitwise agreement:
  *   - integer outputs everywhere possible (`CAST(... AS BIGINT)` mirrors
  *     Spark `.cast("long")`); money sums as integer cents (associative);
  *   - doubles only where derived from exact integers or identical
  *     elementwise double ops, always `round(_, 6)`;
  *   - md5-based pseudo-randomness (portable across engines);
  *   - `0.33` forced to DOUBLE (DuckDB would otherwise use exact DECIMAL
  *     arithmetic while numpy/Spark use IEEE doubles — different floors);
  *   - every query ends in a total-order ORDER BY.
  */
object OracleSql {

  val sql: Map[String, String] =
    OracleShard01.defs ++
      OracleShard02.defs ++
      OracleShard03.defs ++
      OracleShard04.defs ++
      OracleShard05.defs ++
      OracleShard06.defs ++
      OracleShard07.defs ++
      OracleShard08.defs ++
      OracleShard09.defs ++
      OracleShard10.defs
}
