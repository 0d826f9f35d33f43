package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, expr, input_file_name, lit, max, min}

/** Minimal lakehouse transaction log over parquet — the append/overwrite
  * commit protocol of Delta Lake (Armbrust et al., VLDB 2020) re-derived at
  * its smallest useful size, with snapshot isolation and time travel.
  *
  * Layout:
  * {{{
  *   <root>/data/<txn-uuid>/part-*.parquet    immutable data files
  *   <root>/_txlog/v00000001.json             one manifest per version
  * }}}
  *
  * The manifest chain is the source of truth. A reader lists `_txlog`,
  * pins a version (head by default), and replays manifests v1..vN in
  * order: `append` adds the manifest's files to the live set, `overwrite`
  * resets the live set to them. Data files are never rewritten in place,
  * so a resolved file list stays readable forever — that is what makes
  * snapshot reads repeatable and time travel free.
  *
  * Commit protocol (optimistic concurrency):
  *   1. write the data files under a fresh uuid dir — invisible to every
  *      reader because no manifest references them yet;
  *   2. write the FULL manifest to a temp file and fsync it;
  *   3. claim version N by hard-linking the temp file to `vN.json` —
  *      link(2) fails atomically with EEXIST if someone else claimed N
  *      first, in which case re-read the head and retry with N+1.
  * The loser never damages the winner (its data dir is simply unreferenced
  * garbage until a vacuum), and readers can never observe a partial
  * manifest because the link publishes fully-written bytes or nothing.
  *
  * 100 TB shape: a commit's cost is one manifest write — independent of
  * table size; readers touch only the manifest chain (KBs) plus the data
  * files their snapshot actually lists. The log's I/O goes through the
  * [[LogStore]] interface: schemeless roots use the local hard-link
  * claim, `scheme://` roots the Hadoop FileSystem store (HDFS-atomic
  * rename claim, proven end-to-end on `file:///` by LogStoreSpec); an
  * object store slots in as one more [[LogStore]] whose claim is a
  * conditional PUT (`If-None-Match: *`) — see the per-scheme consistency
  * contract on [[LogStore]]. The
  * replay cost of a long chain is bounded by checkpoint manifests: every
  * [[TxLog.CheckpointEvery]] commits the full live set — file list AND
  * per-file zone-map stats — is written as `cNNNNNNNN.json` (best-effort,
  * derived state) and readers replay only the suffix after the newest
  * checkpoint at or below their pin. That one-replay bound covers BOTH
  * the file list and the data-skipping stats: a range read of a
  * 10k-commit table reads ≤ CheckpointEvery+1 manifests, not 10k
  * (round 7 shipped stats that replayed from v1 — fixed here, and
  * TxLogSpec counts the reads).
  */
object TxLog {

  sealed trait Action { def name: String }
  case object Append extends Action { val name = "append" }
  case object Overwrite extends Action { val name = "overwrite" }

  /** A read-modify-write commit observed a head it didn't base itself on
    * — the caller must re-read and recompute (see [[merge]]).
    */
  final class CommitConflict(msg: String) extends RuntimeException(msg)

  /** A commit's rows (or, at ADD CONSTRAINT time, the existing table)
    * fail a CHECK constraint — the commit is refused before its manifest
    * publishes, so the table never holds the bad rows.
    */
  final class ConstraintViolation(msg: String) extends RuntimeException(msg)

  final case class Manifest(
      version: Long,
      action: String,
      files: Seq[String],
      cdf: Option[String] = None,
      ts: Option[Long] = None,
      dvRefs: Set[String] = Set.empty,
      op: Option[String] = None)

  /** Per-file, per-column zone map carried by a manifest entry: min/max
    * of each stats column for data skipping (the Delta/Iceberg per-file
    * stats idea). Serialized inline as
    * `{"p":path,"s":{"col":[lo,hi],...}}` next to plain-string entries,
    * so stats-free and stats-bearing commits interleave freely and a 2-D
    * clustered table (see [[graft.io.ZOrder]]) can carry both range
    * columns at once.
    */
  type ColStats = Map[String, (Long, Long)]

  /** String-column zone map: [lo, hi] in UTF-8 binary order (Spark's own
    * string ordering, so min/max computed by the commit's stats job and
    * the pruning comparison agree byte for byte). Values longer than
    * [[StrStatMaxLen]] truncate: `lo` to a prefix (a prefix is byte-wise
    * ≤ the full value, so it remains a valid lower bound) and `hi` to
    * None — "unbounded above" — because no finite truncated upper bound
    * exists without a sentinel past every code point (Delta appends
    * U+10FFFF and accepts the same caveat; this keeps the log exact).
    * The LLM-pipeline's hottest predicates are string equality
    * (`lang = 'en'`, `source = 'web'`, date strings) — integral-only
    * zone maps pruned nothing on exactly those columns before round 9.
    */
  type StrColStats = Map[String, (String, Option[String])]

  /** Per-file bloom-filter index declaration: column → the column's
    * WRITE-TIME Spark type (`catalogString`). The bitset itself is a
    * sidecar file at `<data path>.bloom` (Spark's `sketch.BloomFilter`
    * serialized form, which self-describes its bit count and hash
    * count) — manifests stay skinny while the index scales with the
    * data it covers, the Parquet/Iceberg-Puffin layout rather than
    * Delta's deprecated in-log stats blobs. The recorded type is the
    * hash-reconciliation authority: values were hashed AS that type
    * (`xxhash64` is width-sensitive), so a reader whose filter literal
    * arrives widened by schema evolution must down-convert
    * value-preservingly before probing — or, when the value provably
    * can't fit the write-time type, skip the file outright.
    */
  type BloomCols = Map[String, String]

  /** One live-file entry: relative path, byte size (carried in the
    * manifest so readers never stat data files — Delta stores sizes in
    * the log for the same reason; absent only in hand-written legacy
    * entries), per-column zone maps (integral and string), and the
    * bloom-indexed columns (bitsets live in sidecars).
    */
  final case class Entry(
      path: String,
      bytes: Option[Long],
      stats: ColStats,
      strStats: StrColStats = Map.empty,
      blooms: BloomCols = Map.empty,
      dvs: Vector[String] = Vector.empty,
      rows: Option[Long] = None,
      dvRows: Long = 0L)

  /** The resolved state of a version: live entries (relative paths with
    * sizes + zone maps) plus the snapshot's schema — produced by ONE
    * checkpoint-bounded replay, shared by every read API so no path pays
    * more than ≤ CheckpointEvery+1 manifest reads.
    *
    * `schema` is the additive union of the schemas the contributing
    * manifests recorded at commit time (overwrite resets it, matching
    * the live set); `None` when any contributing manifest predates
    * schema recording — readers then fall back to footer inference.
    */
  final case class Replay(
      entries: Vector[Entry],
      schema: Option[org.apache.spark.sql.types.StructType],
      txns: Map[String, Long],
      partitionBy: Option[Seq[String]] = Some(Nil),
      constraints: Map[String, String] = Map.empty,
      dvBytes: Map[String, Long] = Map.empty,
      colMap: Map[String, String] = Map.empty,
      droppedPhys: Set[String] = Set.empty,
      clusterBy: Seq[String] = Nil) {
    /** Physical (file) column name of logical `name` — identity unless a
      * RENAME/re-add mapped it (Delta's column mapping, at txlog size).
      */
    def physName(name: String): String = colMap.getOrElse(name, name)
    def files: Vector[String] = entries.map(_.path)
    def stats: Map[String, ColStats] =
      entries.iterator.filter(_.stats.nonEmpty).map(e => e.path -> e.stats).toMap
    def strStats: Map[String, StrColStats] =
      entries.iterator.filter(_.strStats.nonEmpty)
        .map(e => e.path -> e.strStats).toMap
  }

  private val versionFile: Regex = """v(\d{8})\.json""".r
  // a manifest entry is either a bare "rel/path.parquet" or an object
  // {"p":"rel/path.parquet","b":bytes,"s":{"col":[lo,hi],...},
  //  "t":{"col":["lo","hi"],...},"m":{"col":"type",...},"d":[dvRef,...]}
  // with "b"/"s"/"t"/"m"/"d" independently optional — group 1 = bare
  // path, group 2 = obj path, group 3 = bytes, group 4 = integral stats
  // body, group 5 = string stats body, group 6 = bloom column body,
  // group 7 = deletion-vector refs
  private val entryField: Regex =
    """(?:"([^"{]+\.parquet)")|(?:\{"p":"([^"]+\.parquet)"(?:,"b":(\d+))?(?:,"s":\{([^}]*)\})?(?:,"t":\{([^}]*)\})?(?:,"m":\{([^}]*)\})?(?:,"d":\[([^\]]*)\])?(?:,"r":(\d+))?(?:,"x":(\d+))?\})""".r
  private val bloomColField: Regex = """"([^"]+)":"([^"]*)"""".r
  private val dvRefField: Regex = """"([^"]+)"""".r
  private val colStatField: Regex = """"([^"]+)":\[(-?\d+),(-?\d+)\]""".r
  // string stat: "col":["lo","hi"] — truncated-max entries carry null;
  // values are \uXXXX-escaped (see escStr), so a raw quote/brace can
  // never terminate the stats object early
  private val strStatField: Regex =
    """"([^"]+)":\["([^"]*)",(?:"([^"]*)"|null)\]""".r

  /** Truncation bound for string zone maps (chars). */
  val StrStatMaxLen: Int = 64

  private def truncLo(s: String): String =
    if (s.length <= StrStatMaxLen) s
    else {
      val t = s.substring(0, StrStatMaxLen)
      // never split a surrogate pair: an unpaired high surrogate would
      // re-encode as U+FFFD and could break the lower-bound property
      if (Character.isHighSurrogate(t.last)) t.dropRight(1) else t
    }
  private def truncHi(s: String): Option[String] =
    if (s.length <= StrStatMaxLen) Some(s) else None

  /** Manifest string-value escaping: every char that could confuse the
    * manifest's line-oriented regexes (quote, backslash, braces,
    * brackets) and all control chars become JSON \\uXXXX escapes — all
    * of which are valid JSON string escapes, so the manifest stays
    * parseable by any strict JSON reader too. The DOT escapes as well:
    * a quoted escStr'd value can then never end in the literal
    * `.parquet`, so no metadata string (a txnId, a touched path, a
    * column name) can impersonate a bare file entry to the entry regex.
    */
  private def escStr(s: String): String = s.flatMap {
    case c @ ('"' | '\\' | '{' | '}' | '[' | ']' | '.') => f"\\u${c.toInt}%04x"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  private val uEscField: Regex = """\\u([0-9a-fA-F]{4})""".r
  private def unescStr(s: String): String =
    uEscField.replaceAllIn(s, m => Regex.quoteReplacement(
      Integer.parseInt(m.group(1), 16).toChar.toString))

  private val schemaField: Regex = """"schemaB64":"([A-Za-z0-9+/=]*)"""".r

  private def schemaToB64(s: org.apache.spark.sql.types.StructType): String =
    java.util.Base64.getEncoder.encodeToString(
      s.json.getBytes(StandardCharsets.UTF_8))

  private def schemaOfLog(txt: String): Option[org.apache.spark.sql.types.StructType] =
    schemaField.findFirstMatchIn(txt).map { m =>
      org.apache.spark.sql.types.DataType.fromJson(new String(
        java.util.Base64.getDecoder.decode(m.group(1)), StandardCharsets.UTF_8))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }

  /** Value-preserving upcasts the parquet readers evaluate natively
    * (Spark 4 reads an int32 file column as LongType and a float column
    * as DoubleType), so a same-name change along these edges is safe
    * additive evolution — the recorded schema takes the WIDER type and
    * old files keep reading.
    */
  private def widen(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType)
      : Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    def rank(dt: DataType): Int = dt match {
      case ByteType => 1; case ShortType => 2
      case IntegerType => 3; case LongType => 4
      case _ => 0
    }
    if (a == b) Some(a)
    else if (rank(a) > 0 && rank(b) > 0) Some(if (rank(a) >= rank(b)) a else b)
    else (a, b) match {
      case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
      case _ => None
    }
  }

  /** Additive union of two recorded schemas: fields joined by name, new
    * columns appended, same-name types resolved by [[widen]]. A
    * non-widenable type conflict is not additive evolution — resolve to
    * None so the reader falls back to footer inference rather than
    * guessing (round 8 poisoned on ANY type change, so an int→long
    * evolution condemned every later read to inference forever).
    */
  private def mergeSchemas(
      a: Option[org.apache.spark.sql.types.StructType],
      b: Option[org.apache.spark.sql.types.StructType])
      : Option[org.apache.spark.sql.types.StructType] =
    (a, b) match {
      case (Some(x), Some(y)) =>
        val byName = x.fields.map(f => f.name -> f).toMap
        var ok = true
        val merged = x.fields.map { f =>
          y.fields.find(_.name == f.name) match {
            case Some(g) if g.dataType != f.dataType =>
              widen(f.dataType, g.dataType) match {
                case Some(dt) => f.copy(dataType = dt)
                case None     => ok = false; f
              }
            case _ => f
          }
        }
        if (!ok) None
        else Some(org.apache.spark.sql.types.StructType(
          merged ++ y.fields.filterNot(f => byName.contains(f.name))))
      case _ => None
    }

  /** Zone maps are long-valued, so only integral columns carry them —
    * a non-integral stats/merge-key column degrades gracefully (no
    * skipping / whole-table copy-on-write) instead of failing an ANSI
    * cast mid-job.
    */
  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
  }

  /** The long-valued image of a column for its zone map, chosen so it
    * EQUALS the Catalyst-internal value a pushed-down literal of that
    * type carries — the file index then compares apples to apples with
    * no reader-side conversion: integral → the value itself, date → days
    * since epoch (a DateType literal IS an Int day count), timestamp →
    * microseconds since epoch (a TimestampType literal IS a Long micros
    * instant, timezone-independent). `o_orderdate BETWEEN date'..' AND
    * date'..'` — the fact-table predicate shape — pruned nothing while
    * zone maps were integral-only.
    */
  private def zoneMapExpr(
      c: String,
      dt: org.apache.spark.sql.types.DataType)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{datediff, to_date, unix_micros}
    dt match {
      case _ if isIntegral(dt) => Some(col(c).cast("long"))
      case DateType => Some(datediff(col(c), to_date(lit("1970-01-01"))).cast("long"))
      case TimestampType => Some(unix_micros(col(c)))
      case _ => None
    }
  }

  /** The recorded schema is normalized deep-nullable: parquet reads
    * surface every column nullable, and the recorded schema must match
    * what a reader would have inferred.
    */
  private def deepNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = deepNullable(f.dataType), nullable = true)))
      case a: ArrayType => a.copy(elementType = deepNullable(a.elementType))
      case m: MapType => m.copy(valueType = deepNullable(m.valueType))
      case o => o
    }
  }

  private def renderEntry(e: Entry): String =
    if (e.bytes.isEmpty && e.stats.isEmpty && e.strStats.isEmpty &&
      e.blooms.isEmpty && e.dvs.isEmpty && e.rows.isEmpty && e.dvRows == 0L)
      "\"" + e.path + "\""
    else {
      val b = e.bytes.map(n => s""","b":$n""").getOrElse("")
      val s = if (e.stats.isEmpty) "" else e.stats.toSeq.sortBy(_._1)
        .map { case (c, (lo, hi)) => s""""$c":[$lo,$hi]""" }
        .mkString(""","s":{""", ",", "}")
      val t = if (e.strStats.isEmpty) "" else e.strStats.toSeq.sortBy(_._1)
        .map { case (c, (lo, hi)) =>
          val hiR = hi.map(h => "\"" + escStr(h) + "\"").getOrElse("null")
          s""""${escStr(c)}":["${escStr(lo)}",$hiR]"""
        }
        .mkString(""","t":{""", ",", "}")
      val m = if (e.blooms.isEmpty) "" else e.blooms.toSeq.sortBy(_._1)
        .map { case (c, dt) => s""""${escStr(c)}":"${escStr(dt)}"""" }
        .mkString(""","m":{""", ",", "}")
      val d = if (e.dvs.isEmpty) "" else e.dvs
        .map(r => "\"" + escStr(r) + "\"").mkString(""","d":[""", ",", "]")
      val rc = e.rows.map(n => s""","r":$n""").getOrElse("")
      val xc = if (e.dvRows == 0L) "" else s""","x":${e.dvRows}"""
      s"""{"p":"${e.path}"$b$s$t$m$d$rc$xc}"""
    }
  private val actionField: Regex = """"action":"(append|overwrite|checkpoint)"""".r
  private val txnField: Regex = """"txnId":"([^"]*)"""".r
  // an overwrite manifest's row-level delta: "" = content-preserving
  // rewrite (optimize/compact — the delta is EMPTY by construction), a
  // dir name = change rows persisted under _change_data/<dir> (merge);
  // absent = delta unknown (plain overwrite, restore, legacy manifests)
  private val cdfField: Regex = """"cdf":"([^"]*)"""".r
  // commit wall-clock, for TIMESTAMP AS OF / DESCRIBE HISTORY (absent in
  // pre-round-9 manifests)
  private val tsField: Regex = """"ts":(\d+)""".r
  // the OPERATION that produced the commit (MERGE, OPTIMIZE, CLONE, ...)
  // — DESCRIBE HISTORY's audit column; plain append/overwrite carry none
  // and render as their action (Delta's operation field, ignorable by
  // any reader so not fmt-gated)
  private val opField: Regex = """"op":"([^"]*)"""".r
  // hive-style partition spec of the commit's files (data lands under
  // k=v dirs and the partition columns are NOT in the data files);
  // absent/empty = unpartitioned
  private val partitionByField: Regex = """"partitionBy":\[([^\]]*)\]""".r
  private val partitionByItem: Regex = """"([^"]+)"""".r
  private def partitionByOfLog(txt: String): Seq[String] =
    partitionByDeclOf(txt).getOrElse(Nil)
  // presence-aware: Some(Nil) = the commit EXPLICITLY declared a flat
  // layout (partition evolution to unpartitioned), None = no declaration
  // — the distinction keeps a blind statsless append from silently
  // flipping a partitioned table's current spec
  private def partitionByDeclOf(txt: String): Option[Seq[String]] =
    partitionByField.findFirstMatchIn(txt)
      .map(m => partitionByItem.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
  // checkpoint-carried txnId→version map (exactly-once bookkeeping must
  // survive checkpoint-bounded replay — and rewrites, so it never resets)
  private val txnsField: Regex = """"txns":\{([^}]*)\}""".r
  private val txnsEntry: Regex = """"([^"]+)":(\d+)""".r
  // table CHECK constraints: name → base64(SQL expression). Add/drop
  // commits and checkpoints write the FULL current map; replay keeps the
  // most recent field seen (absent = no change, present-empty = reset
  // after the last drop). Base64 because expressions contain exactly the
  // characters the line-oriented manifest regexes key on.
  private val constraintsField: Regex = """"constraints":\{([^}]*)\}""".r
  private val constraintEntry: Regex = """"([^"]+)":"([A-Za-z0-9+/=]*)"""".r
  private def constraintsOfLog(txt: String): Option[Map[String, String]] =
    constraintsField.findFirstMatchIn(txt).map(m =>
      constraintEntry.findAllMatchIn(m.group(1)).map(e =>
        unescStr(e.group(1)) -> new String(
          java.util.Base64.getDecoder.decode(e.group(2)),
          StandardCharsets.UTF_8)).toMap)
  // deletion-vector dir byte sizes, recorded by the commit that wrote
  // the dir so the read path's broadcast-vs-shuffle decision is
  // metadata-only (no LIST per dv dir per planning). Accumulative across
  // manifests — dir names are uuid-unique, an overwrite never reuses one
  // — and checkpoints persist the map restricted to live refs. Free
  // metadata, NOT fmt-gated: an older reader falls back to walking.
  private val dvbField: Regex = """"dvb":\{([^}]*)\}""".r
  private val dvbEntry: Regex = """"([^"]+)":(\d+)""".r
  private def dvbOfLog(txt: String): Map[String, Long] =
    dvbField.findFirstMatchIn(txt).map(m =>
      dvbEntry.findAllMatchIn(m.group(1)).map(e =>
        unescStr(e.group(1)) -> e.group(2).toLong).toMap).getOrElse(Map.empty)
  private def renderDvb(m: Map[String, Long]): String =
    if (m.isEmpty) ""
    else m.toSeq.sortBy(_._1).map { case (d, b) => s""""${escStr(d)}":$b""" }
      .mkString(""","dvb":{""", ",", "}")

  // COLUMN MAPPING (RENAME/DROP COLUMN): the recorded schema carries
  // LOGICAL names; data files carry PHYSICAL names; `colmap` maps the
  // non-identity pairs. Replay folds the fields: `colunmap` removals
  // apply first, then `colmap` additions, and `coldrop` (retired
  // physical names — a re-added logical column must get a FRESH
  // physical, or old files' dropped data would resurface) unions.
  // Checkpoints write the full folded state. Gated at fmt 5: a reader
  // without the map would hand a renamed column's old bytes to the new
  // logical name — wrong results, not degraded metadata.
  private val colmapField: Regex = """"colmap":\{([^}]*)\}""".r
  private val colmapEntry: Regex = """"([^"]+)":"([^"]*)"""".r
  private val colunmapField: Regex = """"colunmap":\[([^\]]*)\]""".r
  private val coldropField: Regex = """"coldrop":\[([^\]]*)\]""".r
  private val quotedItem: Regex = """"([^"]*)"""".r
  private def colmapOfLog(txt: String): Map[String, String] =
    colmapField.findFirstMatchIn(txt).map(m =>
      colmapEntry.findAllMatchIn(m.group(1)).map(e =>
        unescStr(e.group(1)) -> unescStr(e.group(2))).toMap)
      .getOrElse(Map.empty)
  private def colunmapOfLog(txt: String): Set[String] =
    colunmapField.findFirstMatchIn(txt).map(m =>
      quotedItem.findAllMatchIn(m.group(1)).map(e => unescStr(e.group(1))).toSet)
      .getOrElse(Set.empty)
  private def coldropOfLog(txt: String): Set[String] =
    coldropField.findFirstMatchIn(txt).map(m =>
      quotedItem.findAllMatchIn(m.group(1)).map(e => unescStr(e.group(1))).toSet)
      .getOrElse(Set.empty)
  private def renderColmap(m: Map[String, String]): String =
    if (m.isEmpty) ""
    else m.toSeq.sortBy(_._1)
      .map { case (l, p) => s""""${escStr(l)}":"${escStr(p)}"""" }
      .mkString(""","colmap":{""", ",", "}")
  private def renderStrList(field: String, s: Set[String]): String =
    if (s.isEmpty) ""
    else s.toSeq.sorted.map(x => "\"" + escStr(x) + "\"")
      .mkString(s""","$field":[""", ",", "]")

  /** Fast-path hint that this table has (ever had) a column mapping —
    * same contract as the constraints marker: the LOG is the authority,
    * the marker only spares unmapped tables the per-commit replay.
    */
  private def colmapMarker(root: String): String = logPath(root, "_colmap")

  // the table's declared CLUSTERING KEYS (liquid-clustering style):
  // pure layout metadata recorded in the log so maintenance runs need no
  // out-of-band configuration, replace-ruled like constraints (an
  // explicit field replaces, checkpoints persist, present-empty resets).
  // Changing the keys is a METADATA commit — no rewrite: old files keep
  // their old-key zone maps (which keep pruning old-key predicates),
  // and incremental compaction clusters new backlog by the new keys.
  // Not fmt-gated: a reader ignoring it loses nothing but layout hints.
  private val clusterField: Regex = """"cluster":\[([^\]]*)\]""".r
  private def clusterOfLog(txt: String): Option[Seq[String]] =
    clusterField.findFirstMatchIn(txt).map(m =>
      quotedItem.findAllMatchIn(m.group(1)).map(e => unescStr(e.group(1))).toSeq)
  private def renderSeqField(field: String, s: Seq[String]): String =
    s.map(x => "\"" + escStr(x) + "\"").mkString(s""","$field":[""", ",", "]")

  // the set of pre-existing files whose DV state a row-level commit
  // changed — advisory metadata (not fmt-gated: ignoring it only costs
  // rebase opportunities, never correctness) that lets a RACING
  // row-level op on DISJOINT files fold instead of conflict
  private val touchedField: Regex = """"touched":\[([^\]]*)\]""".r
  private def touchedOfLog(txt: String): Option[Set[String]] =
    touchedField.findFirstMatchIn(txt).map(m =>
      quotedItem.findAllMatchIn(m.group(1)).map(e => unescStr(e.group(1))).toSet)

  /** The path of a rendered manifest entry (bare string or object form). */
  private def pathOfRendered(e: String): String =
    entryField.findFirstMatchIn(e)
      .map(m => Option(m.group(1)).getOrElse(m.group(2)))
      .getOrElse(throw new IllegalStateException(s"txlog: unparseable entry $e"))

  /** Conflict-retry count across all read-modify-write ops — specs
    * assert a disjoint-file DV race commits in ONE attempt (fold, not
    * retry), the way Delta's conflict checker admits disjoint row-level
    * ops.
    */
  private[io] val rmwConflicts = new AtomicLong(0L)

  private def renderConstraints(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (n, ex) =>
      s""""${escStr(n)}":"${java.util.Base64.getEncoder
        .encodeToString(ex.getBytes(StandardCharsets.UTF_8))}""""
    }.mkString(""","constraints":{""", ",", "}")

  /** A checkpoint manifest (full live set) is written every K commits so
    * reader replay cost is O(K), not O(total versions) — the Delta
    * `_last_checkpoint` idea at this size.
    */
  val CheckpointEvery: Long = 10L

  /** Count of log-file reads (vN/cN json), for specs that prove the
    * checkpoint actually bounds replay cost.
    */
  private[io] val manifestReads = new AtomicLong(0L)

  /** Count of `_txlog` directory LISTs — on an object store each one is
    * a paged, billed O(V) call, so the steady state must be zero per
    * commit/read (specs assert it).
    */
  private[io] val dirLists = new AtomicLong(0L)

  /** Every log-side byte this object touches goes through a [[LogStore]]
    * resolved from the ROOT's scheme — schemeless paths keep the original
    * fully-atomic `java.nio` hard-link store, `scheme://` roots route to
    * the Hadoop FileSystem store (HDFS-atomic rename claim; see
    * [[LogStore]] for the per-scheme consistency contract). Data files
    * were always Hadoop-pathed via Spark; this closes the gap that bound
    * the commit protocol itself to the local filesystem.
    */
  private def store(root: String): LogStore = LogStore.forRoot(root)

  private def logDir(root: String): String = s"$root/_txlog"
  private def logPath(root: String, name: String): String =
    s"$root/_txlog/$name"

  /** Resolve a manifest entry path against the table root. Entries are
    * root-relative (`data/txn-.../file.parquet`) except EXTERNAL entries
    * written by a shallow clone, which are absolute — plain-absolute or
    * scheme-ful — and fmt-gated so a pre-clone reader never mis-resolves
    * them against its own root.
    */
  private[io] def absPath(root: String, p: String): String =
    if (p.startsWith("/") || p.contains("://") || p.startsWith("file:")) p
    else s"$root/$p"

  /** Highest manifest format this reader understands. Manifests carry
    * `"fmt":N`; a HIGHER N means a future writer used features this
    * reader would silently misparse — refuse loudly instead (Delta's
    * protocol-version action). Absent fmt (pre-round-8 logs) reads as 1.
    *
    * The fmt each manifest WRITES is feature-gated (Delta's
    * minReaderVersion): 4 only when the manifest carries bloom-index
    * declarations or external (absolute-path) entries — a v3 reader
    * would drop a "m"-bearing entry's stats and mis-resolve an external
    * path against its own root; 3 only when it carries string zone maps
    * or a partition layout — a v2 reader's entry regex would silently
    * DROP a "t"-bearing entry from the live set, and would read a
    * partitioned table without its partition column — otherwise 2, so
    * plain commits stay readable by older readers. 5 only when the
    * manifest carries COLUMN-MAPPING state (colmap/colunmap/coldrop): a
    * v4 reader would hand a renamed column's old physical bytes to the
    * wrong logical name.
    */
  val FormatVersion: Long = 5L
  // NOT fmt-gated: "r" (per-file row count) — an older reader's entry
  // regex degrades an "r"-bearing object entry to its bare path, losing
  // stats/size for that entry but never a file or a row (rowCount simply
  // doesn't exist below v4); "x" (deleted-row count) only ever co-occurs
  // with the gated "d". Correctness-bearing fields gate; free metadata
  // doesn't condemn plain tables to a version bump.
  private def manifestFmt(entries: Seq[String], partitionBy: Seq[String]): Long =
    if (entries.exists(e => e.contains("\"m\":{") || e.contains("\"p\":\"/") ||
      e.contains("\"d\":["))) 4L
    else if (partitionBy.nonEmpty || entries.exists(_.contains("\"t\":{"))) 3L
    else 2L
  private val fmtField: Regex = """"fmt":(\d+)""".r

  private def readLogFile(root: String, name: String): String = {
    manifestReads.incrementAndGet()
    val txt = store(root).readText(logPath(root, name))
    fmtField.findFirstMatchIn(txt).map(_.group(1).toLong).foreach { f =>
      if (f > FormatVersion)
        throw new java.io.IOException(
          s"txlog: $name uses format v$f but this reader supports ≤ v$FormatVersion — upgrade before reading")
    }
    txt
  }

  /** All committed versions, ascending (empty for a fresh table).
    * Versions are DENSE by construction — every claim links head+1 — so
    * the list is just 1..head, resolved through the head pointer without
    * an O(V) directory LIST per call.
    */
  def versions(root: String): Seq[Long] = {
    val h = headVersion(root)
    if (h <= 0) Seq.empty else 1L to h
  }

  private def listedHead(root: String): Long = {
    val s = store(root)
    if (!s.isDir(logDir(root))) 0L
    else {
      dirLists.incrementAndGet()
      s.list(logDir(root)).iterator
        .flatMap(n => versionFile.findFirstMatchIn(n).map(_.group(1).toLong))
        .foldLeft(0L)(math.max)
    }
  }

  /** The current head version. A best-effort `_txlog/_head` pointer
    * (Delta's `_last_checkpoint` idea) gives a verified floor and the
    * suffix is PROBED by existence — a stale pointer costs a few extra
    * existence checks, never a wrong answer, and only a pointer-less
    * legacy chain pays a directory LIST (its next commit writes one).
    */
  def headVersion(root: String): Long = {
    val s = store(root)
    val hinted: Option[Long] =
      try {
        val ptr = logPath(root, "_head")
        if (!s.exists(ptr)) None
        else {
          val v = s.readText(ptr).trim.toLong
          if (v >= 1 && s.exists(logPath(root, f"v$v%08d.json"))) Some(v)
          else None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    var v = hinted.getOrElse(listedHead(root))
    while (s.exists(logPath(root, f"v${v + 1}%08d.json"))) v += 1
    v
  }

  /** Best-effort head pointer update after a successful claim: written
    * atomically (temp + rename), and a concurrent regression is harmless
    * — readers probe forward past any stale value.
    */
  private def writeHeadPointer(root: String, v: Long): Unit =
    try store(root).putReplace(logPath(root, "_head"),
      v.toString.getBytes(StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(_) => () }

  /** Entries of one log file. */
  private def parseEntries(txt: String): Seq[Entry] =
    entryField.findAllMatchIn(txt).map { m =>
      if (m.group(1) != null) Entry(m.group(1), None, Map.empty)
      else Entry(
        m.group(2),
        Option(m.group(3)).map(_.toLong),
        Option(m.group(4)).map(s => colStatField.findAllMatchIn(s)
          .map(c => c.group(1) -> (c.group(2).toLong, c.group(3).toLong)).toMap)
          .getOrElse(Map.empty),
        Option(m.group(5)).map(s => strStatField.findAllMatchIn(s)
          .map(c => unescStr(c.group(1)) ->
            (unescStr(c.group(2)), Option(c.group(3)).map(unescStr))).toMap)
          .getOrElse(Map.empty),
        Option(m.group(6)).map(s => bloomColField.findAllMatchIn(s)
          .map(c => unescStr(c.group(1)) -> unescStr(c.group(2))).toMap)
          .getOrElse(Map.empty),
        Option(m.group(7)).map(s => dvRefField.findAllMatchIn(s)
          .map(c => unescStr(c.group(1))).toVector)
          .getOrElse(Vector.empty),
        Option(m.group(8)).map(_.toLong),
        Option(m.group(9)).map(_.toLong).getOrElse(0L))
    }.toSeq

  private def readManifest(root: String, v: Long): Manifest = {
    val txt = readLogFile(root, f"v$v%08d.json")
    val action = actionField.findFirstMatchIn(txt)
      .map(_.group(1))
      .getOrElse(throw new java.io.IOException(s"txlog: bad manifest v$v"))
    val es = parseEntries(txt)
    Manifest(v, action, es.map(_.path),
      cdfField.findFirstMatchIn(txt).map(_.group(1)),
      tsField.findFirstMatchIn(txt).map(_.group(1).toLong),
      es.iterator.flatMap(_.dvs).toSet,
      opField.findFirstMatchIn(txt).map(_.group(1)))
  }

  /** Newest checkpoint ≤ `upTo`, probed by existence: checkpoints land
    * only at multiples of [[CheckpointEvery]], so walking the multiples
    * downward needs no directory LIST — each miss is a (rare) failed
    * best-effort checkpoint write.
    */
  private def baseCheckpoint(root: String, upTo: Long): Option[Long] = {
    val s = store(root)
    var c = (upTo / CheckpointEvery) * CheckpointEvery
    while (c >= CheckpointEvery) {
      if (s.exists(logPath(root, f"c$c%08d.json"))) return Some(c)
      c -= CheckpointEvery
    }
    None
  }

  /** THE replay: start from the newest checkpoint ≤ `upTo` (skipping
    * every older manifest), then apply the ≤ CheckpointEvery manifests
    * after it. Files and stats advance together — `append` adds the
    * manifest's entries, `overwrite` resets both to them — so reader
    * cost for EVERY read API (plain snapshot, range read, CDF) is
    * bounded by the checkpoint interval, not the table's commit count.
    */
  def replay(root: String, upTo: Long): Replay = {
    val base = baseCheckpoint(root, upTo)
    var entries = Vector.empty[Entry]
    // empty-known start: the first append's recorded schema becomes the
    // table's; any contributing manifest WITHOUT one poisons to None
    // (footer-inference fallback) so a recorded schema is never partial
    var schema: Option[org.apache.spark.sql.types.StructType] =
      Some(org.apache.spark.sql.types.StructType(Nil))
    var txns = Map.empty[String, Long]
    // CHECK constraints: table metadata, so rewrites never reset it —
    // only an explicit constraints field (add/drop commit, checkpoint)
    // replaces the map
    var constraints = Map.empty[String, String]
    // dv-dir byte ledger: accumulative (uuid dirs never collide)
    var dvBytes = Map.empty[String, Long]
    // column mapping: fold removals, then additions; retirements union
    var colMap = Map.empty[String, String]
    var droppedPhys = Set.empty[String]
    // clustering keys: explicit field replaces
    var clusterBy: Seq[String] = Nil
    // partition layout: the CURRENT spec is the latest entries-bearing
    // commit's EXPLICIT declaration (Iceberg's partition-spec evolution)
    // — new writes and rewrites use it, while the READ derives each
    // file's own layout from its k=v path segments, so mixed generations
    // read correctly instead of refusing (pre-round-10 behavior). An
    // append WITHOUT a declaration never changes the spec: a blind flat
    // append onto a partitioned table adds a flat generation (read
    // correctly, migrated by the next compact) but must not silently
    // unpartition the table's future rewrites.
    var partitionBy: Option[Seq[String]] = Some(Nil)
    def foldPartitionBy(decl: Option[Seq[String]], isOverwrite: Boolean,
        hasEntries: Boolean, liveWasEmpty: Boolean): Unit =
      if (isOverwrite || liveWasEmpty) partitionBy = Some(decl.getOrElse(Nil))
      else if (hasEntries && decl.isDefined) partitionBy = decl
    base.foreach { cv =>
      val txt = readLogFile(root, f"c$cv%08d.json")
      entries = parseEntries(txt).toVector
      partitionBy = Some(partitionByOfLog(txt))
      schema = schemaOfLog(txt)
      // a checkpoint is full state: an absent field means NO constraints
      // (every checkpoint written since constraints exist records them)
      constraints = constraintsOfLog(txt).getOrElse(Map.empty)
      dvBytes = dvbOfLog(txt)
      colMap = colmapOfLog(txt)
      droppedPhys = coldropOfLog(txt)
      clusterBy = clusterOfLog(txt).getOrElse(Nil)
      txns = txnsField.findFirstMatchIn(txt).map(m =>
        txnsEntry.findAllMatchIn(m.group(1))
          .map(e => unescStr(e.group(1)) -> e.group(2).toLong).toMap).getOrElse {
        // a pre-fmt-2 checkpoint carries no txns map: absent there means
        // UNKNOWN, not empty — replaying from it would silently forget
        // every txnId committed at or below it, and a recovered streaming
        // sink's appendOnce could double-land a microbatch. Reconstruct
        // once from the pre-checkpoint manifests (the pre-round-8 cost,
        // paid only on legacy chains; the next checkpoint write records
        // the map and retires this path). A fmt-2 checkpoint omits the
        // field only when the map is genuinely empty.
        val legacy = fmtField.findFirstMatchIn(txt)
          .map(_.group(1).toLong).getOrElse(1L) < 2L
        if (!legacy) Map.empty[String, Long]
        else versions(root).filter(_ <= cv).flatMap { v =>
          val vtxt = readLogFile(root, f"v$v%08d.json")
          txnField.findFirstMatchIn(vtxt).map(m => unescStr(m.group(1)) -> v)
        }.toMap
      }
    }
    versions(root)
      .filter(v => v <= upTo && v > base.getOrElse(0L))
      .foreach { v =>
        val txt = readLogFile(root, f"v$v%08d.json")
        val action = actionField.findFirstMatchIn(txt).map(_.group(1))
          .getOrElse(throw new java.io.IOException(s"txlog: bad manifest v$v"))
        val es = parseEntries(txt)
        foldPartitionBy(partitionByDeclOf(txt), action == Overwrite.name,
          es.nonEmpty, entries.isEmpty)
        if (action == Overwrite.name) {
          entries = es.toVector
          schema = schemaOfLog(txt)
        } else {
          entries = entries ++ es
          schema = mergeSchemas(schema, schemaOfLog(txt))
        }
        // exactly-once bookkeeping is monotone: a rewrite must NOT reset
        // it, or a replayed microbatch could double-land after an OPTIMIZE
        txnField.findFirstMatchIn(txt).foreach(m =>
          txns += (unescStr(m.group(1)) -> v))
        constraintsOfLog(txt).foreach(m => constraints = m)
        dvBytes ++= dvbOfLog(txt)
        colMap = (colMap -- colunmapOfLog(txt)) ++ colmapOfLog(txt)
        droppedPhys ++= coldropOfLog(txt)
        clusterOfLog(txt).foreach(c => clusterBy = c)
      }
    Replay(entries, schema.filter(_.fields.nonEmpty), txns, partitionBy,
      constraints, dvBytes, colMap, droppedPhys, clusterBy)
  }

  /** Live file list at `upTo` (absolute paths). */
  def liveFiles(root: String, upTo: Long): Seq[String] =
    replay(root, upTo).files.map(f => absPath(root, f))

  /** Zone-map stats of every live file at `upTo` that HAS them (absolute
    * paths → column → [lo, hi]). Files committed without stats are absent
    * — callers must treat them as "may contain anything".
    */
  def liveStats(root: String, upTo: Long): Map[String, ColStats] =
    replay(root, upTo).stats.map { case (p, cs) => absPath(root, p) -> cs }

  /** String zone maps of every live file at `upTo` that has them
    * (absolute paths → column → (lo, truncated-aware hi)).
    */
  def liveStrStats(root: String, upTo: Long): Map[String, StrColStats] =
    replay(root, upTo).strStats.map { case (p, cs) => absPath(root, p) -> cs }

  /** The txnId each committed version carries — checkpoint-bounded like
    * every other replay (checkpoints persist the full monotone map), so
    * an [[appendOnce]] streaming sink pays O(CheckpointEvery) manifest
    * reads per microbatch, not O(stream lifetime).
    */
  private def committedTxnIds(root: String): Map[String, Long] =
    replay(root, headVersion(root)).txns

  /** Commit `df` and return the version it landed as.
    *
    * `statsCols`: integral columns to zone-map per written file — ONE
    * Spark job over the written directory computes every file × column
    * min/max (grouped by `input_file_name`), so an N-file commit costs
    * one write job plus one stats job, never N footer jobs.
    *
    * `carry`: pre-existing live entries (path + size + stats) to
    * re-reference in this manifest WITHOUT rewriting their data — the
    * file-granular MERGE uses it to keep untouched files (and their zone
    * maps) live across an overwrite commit.
    *
    * Written entries carry their BYTE SIZE in the manifest, so the read
    * path plans scans without ever statting a data file (the log is the
    * only metadata a reader touches before the footers of the files it
    * actually opens).
    *
    * An in-flight marker (`_txlog/inflight/txn-*`) brackets the
    * data-write → manifest-link window so a concurrent [[vacuum]] can
    * tell "being committed right now" from aborted residue.
    *
    * `bloomCols`: column → expected distinct values PER FILE to
    * bloom-index. Each written file gets a sidecar bitset
    * (`<file>.bloom`) built in the SAME single stats job, and the
    * manifest entry records the indexed columns — point lookups
    * (`id = X`, `id IN (...)`) on a NON-clustering column then prune at
    * plan time where min/max zone maps are provably useless (a secondary
    * key's per-file range spans the whole table). Sized at write by the
    * caller's estimate (Delta's bloom index and Parquet's bloom take the
    * same parameter) and capped at [[Bloom.MaxBits]].
    */
  def commit(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      action: Action,
      txnId: Option[String] = None,
      statsCols: Seq[String] = Nil,
      carry: Seq[Entry] = Nil,
      carrySchema: Option[org.apache.spark.sql.types.StructType] = None,
      expectHead: Option[Long] = None,
      cdf: Option[String] = None,
      partitionBy: Seq[String] = Nil,
      bloomCols: Map[String, Long] = Map.empty,
      rebaseAppends: Boolean = false,
      op: Option[String] = None,
      dvb: Map[String, Long] = Map.empty,
      touched: Set[String] = Set.empty,
      rebaseDvTouched: Option[Set[String]] = None,
      evolvePartitions: Boolean = false,
      cluster: Option[Seq[String]] = None): Long = {
    // an APPEND manifest's files ARE the commit's row-level delta — the
    // change-data-feed depends on that — so re-referencing pre-existing
    // files is an overwrite-only affordance
    require(carry.isEmpty || action == Overwrite,
      "txlog: carry entries are only valid on an overwrite commit")
    // hive-style partition values must be parseable back from dir names:
    // string and integral columns only (the types the reader casts)
    partitionBy.foreach { c =>
      val dt = df.schema.fields.find(_.name == c).map(_.dataType)
        .getOrElse(throw new IllegalArgumentException(
          s"txlog: partition column $c is not in the commit's schema"))
      require(isIntegral(dt) || dt == org.apache.spark.sql.types.StringType,
        s"txlog: partition column $c must be integral or string, got $dt")
    }
    val s = store(root)
    s.mkdirs(logDir(root))
    val txn = java.util.UUID.randomUUID().toString.take(12)
    val dataDir = s"$root/data/txn-$txn"
    val marker = s"${inflightDir(root)}/txn-$txn"
    s.mkdirs(inflightDir(root))
    s.createMarker(marker)
    try {
      commitInner(spark, root, df, action, txnId, statsCols, carry,
        carrySchema, expectHead, cdf, partitionBy, txn, dataDir, bloomCols,
        rebaseAppends, op, dvb, touched, rebaseDvTouched, cluster,
        evolvePartitions)
    } finally {
      // marker gone ⇒ either the manifest published (files referenced)
      // or the attempt aborted (files are ordinary vacuumable residue)
      try s.delete(marker) catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  private def inflightDir(root: String): String = s"$root/_txlog/inflight"

  /** Fast-path hint that this table has (ever had) CHECK constraints.
    * Created BEFORE the add's manifest publishes, never removed — purely
    * an optimization gate (the LOG is the authority), so a stale marker
    * on a dropped-to-empty table costs one checkpoint-bounded replay per
    * commit, and an absent marker is only possible on a table where no
    * constraint was ever added.
    */
  private def constraintsMarker(root: String): String =
    logPath(root, "_constraints")

  private def commitInner(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      action: Action,
      txnId: Option[String],
      statsCols: Seq[String],
      carry: Seq[Entry],
      carrySchema: Option[org.apache.spark.sql.types.StructType],
      expectHead: Option[Long],
      cdf: Option[String],
      partitionBy: Seq[String],
      txn: String,
      dataDir: String,
      bloomCols: Map[String, Long] = Map.empty,
      rebaseAppends: Boolean = false,
      op: Option[String] = None,
      dvb: Map[String, Long] = Map.empty,
      touched: Set[String] = Set.empty,
      rebaseDvTouched: Option[Set[String]] = None,
      cluster: Option[Seq[String]] = None,
      evolvePartitions: Boolean = false): Long = {
    // ONE head resolution + (at most) ONE checkpoint-bounded replay
    // serves every pre-write consumer below: the partition-layout
    // agreement check, the column mapping, and the CHECK-constraint map.
    // Tables needing none of them (unpartitioned commits on unmapped,
    // constraint-free tables — the hot path) never force the replay.
    val consReadHead = headVersion(root)
    lazy val headReplay = replay(root, consReadHead)
    // a PARTITIONED append must agree with the table's current layout
    // unless the caller EXPLICITLY evolves the spec — evolution is a
    // legitimate layout change at a commit boundary (each generation's
    // files read under their own k=v layout; a later compact migrates
    // them), while a silent disagreement is almost always a bug
    if (partitionBy.nonEmpty && action == Append && !evolvePartitions &&
      consReadHead > 0) {
      require(headReplay.entries.isEmpty ||
        headReplay.partitionBy.contains(partitionBy),
        s"txlog: table is partitioned by ${headReplay.partitionBy} but the " +
          s"commit declares $partitionBy (pass evolvePartitions = true " +
          "to change the layout at this commit boundary)")
    }
    // COLUMN MAPPING write path: files of a mapped table carry PHYSICAL
    // names (the recorded schema stays logical). A column the table
    // doesn't know whose name is RETIRED (renamed away or dropped) gets
    // a fresh physical name recorded in this manifest, so re-adding a
    // dropped column never resurfaces the old files' bytes. Unmapped
    // tables skip all of it (one marker existence probe).
    val (colMap: Map[String, String], droppedPhys: Set[String]) =
      if (!store(root).exists(colmapMarker(root)))
        (Map.empty[String, String], Set.empty[String])
      else (headReplay.colMap, headReplay.droppedPhys)
    val takenPhys = droppedPhys ++ colMap.values
    // a taken name is exempt when the CURRENT recorded schema already
    // carries it unmapped: that logical is being read identity-physical
    // from the live files right now (a RESTORE below a DROP resurrects
    // columns into exactly this state), so a fresh physical would orphan
    // them — NULLing a live column to "protect" dead bytes is backwards
    val liveIdentity: String => Boolean =
      c => headReplay.schema.exists(_.fieldNames.contains(c))
    val freshAssign: Map[String, String] = df.columns.toSeq
      .filter(c => !colMap.contains(c) && takenPhys(c) && !liveIdentity(c))
      .map(c => c -> s"c_${java.util.UUID.randomUUID().toString.take(8)}")
      .toMap
    require(freshAssign.keySet.intersect(partitionBy.toSet).isEmpty,
      s"txlog: partition column cannot reuse a retired column name")
    val effMap = colMap ++ freshAssign
    def phys(c: String): String = effMap.getOrElse(c, c)
    val physDf =
      if (effMap.isEmpty) df
      else df.select(df.columns.toSeq.map(c => col(c).as(phys(c))): _*)
    // step 1: data files land first, unreferenced by any manifest —
    // hive-layout (k=v dirs) when partitioned, flat otherwise. Partition
    // DIRECTORIES use PHYSICAL names (like every other file byte): a
    // renamed partition column keeps writing the directory name every
    // older generation already has, so the layout stays physically
    // uniform and the read resolves it back through the mapping.
    if (partitionBy.isEmpty) physDf.write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    else physDf.write.mode(SaveMode.ErrorIfExists)
      .partitionBy(partitionBy.map(phys): _*).parquet(dataDir)
    // ONE recursive store walk returns every written file with its size
    // (on an object store that is one paged LIST, never stat-per-file)
    val writtenSizes: Map[String, Long] = store(root).walk(dataDir).iterator
      .filter(_.relPath.endsWith(".parquet"))
      .map(m => s"data/txn-$txn/${m.relPath}" -> m.size)
      .toMap
    val written = writtenSizes.keys.toSeq.sorted
    // CHECK constraints: a read-back scan of the commit's OWN files —
    // proportional to the commit, never to the table (carried files were
    // validated when written, and [[addConstraint]] validates the whole
    // table once at add time). The `_constraints` marker keeps
    // constraint-free tables at ZERO extra replay on the append hot
    // path; with it present the lookup is checkpoint-bounded. SQL CHECK
    // semantics: a row fails only when the expression is provably FALSE
    // (NULL passes).
    def validateConstraints(cons: Map[String, String]): Unit =
      if (cons.nonEmpty) {
        // read back physical, alias to logical — constraint expressions
        // are written against logical names
        val backPhys = spark.read
          .schema(deepNullable(physDf.schema)
            .asInstanceOf[org.apache.spark.sql.types.StructType])
          .parquet(dataDir)
        val back =
          if (effMap.isEmpty) backPhys
          else backPhys.select(df.columns.toSeq.map(c =>
            col(phys(c)).as(c)): _*)
        val anyBad = cons.values.map(ex => expr(ex) <=> lit(false))
          .reduce(_ || _)
        if (!back.filter(anyBad).isEmpty) {
          val which = cons.keys.toSeq.sorted.filter(n =>
            !back.filter(expr(cons(n)) <=> lit(false)).isEmpty)
          throw new ConstraintViolation(
            s"txlog: commit to $root violates CHECK constraint(s) " +
              which.mkString(", ") +
              " — no manifest published, the rejected files are vacuumable residue")
        }
      }
    // constraint enforcement is a two-phase check: validate against the
    // map as of the head read at commit start, and remember that head —
    // publish re-scans any manifest that lands in the lookup-to-claim
    // window for a constraints field and re-validates against the newest
    // map, so an ADD CONSTRAINT racing this commit can never let
    // violating rows slip in unvalidated (the add itself cannot see
    // these files: they are unreferenced until our manifest links). The
    // same window scan guards the COLUMN MAPPING this commit's physical
    // names assumed: a RENAME/DROP landing mid-window conflicts loudly
    // (retrying re-reads the mapping) instead of letting retired bytes
    // resurface under a re-merged logical name.
    val consValidated: Map[String, String] =
      if (written.nonEmpty && store(root).exists(constraintsMarker(root))) {
        val cons = headReplay.constraints
        validateConstraints(cons)
        cons
      } else Map.empty
    val consRecheck: Option[(Long, Map[String, String] => Unit)] =
      if (written.isEmpty) None
      else Some((consReadHead,
        m => if (m != consValidated) validateConstraints(m)))
    // optional per-file zone maps: min/max of each stats column per
    // written file, serialized into the manifest so readers can skip
    // files whose range can't match. ONE aggregation job over the
    // written directory (grouped by input_file_name) covers integral AND
    // string columns — proportional to the commit, never to the table,
    // and never one-job-per-file
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // stats/bloom columns resolve through the mapping: manifests key
    // zone maps and bloom declarations by PHYSICAL name — exactly the
    // attribute names pushed-down filters carry once the optimizer has
    // rewritten them through the logical-alias projection
    // long-valued zone maps: integral columns, plus date/timestamp via
    // their Catalyst-internal day/micros image (see zoneMapExpr)
    val intCols: Seq[(String, org.apache.spark.sql.Column)] =
      statsCols.flatMap(c => byName.get(c).flatMap(dt => zoneMapExpr(phys(c), dt))
        .map(e => phys(c) -> e))
    val strCols = statsCols.filter(c =>
      byName.get(c).contains(org.apache.spark.sql.types.StringType)).map(phys)
    // bloom-indexed columns present in this commit's schema, with the
    // caller's per-file distinct estimate (bitset sizing)
    val bloomSpecs: Seq[(String, Long)] = bloomCols.toSeq
      .filter { case (c, _) => byName.contains(c) }
      .map { case (c, n) => phys(c) -> n }.sortBy(_._1)
    // the stats pass runs for EVERY commit that wrote files — even with no
    // zone-map/bloom column requested it still records per-file row
    // counts, so metadata-only COUNT(*)/DESCRIBE DETAIL never degrade to
    // a scan just because one caller forgot statsCols (the reference
    // lakehouse engines always record numRecords for the same reason).
    //
    // Integral/date zone maps come straight out of the just-written
    // parquet FOOTERS driver-side (r13: one fewer Spark job per commit —
    // the write job's own chunk statistics ARE the min/max the agg
    // computed; exact for INT32/INT64 physical types, and the date image
    // is the footer's INT32 day count verbatim). Strings (writer-side
    // truncation semantics), timestamps (INT96 default carries no
    // stats), blooms (need the values) and partition-valued stats
    // columns (not in the file bytes) keep the one-job read-back, as do
    // >32-file commits where the job amortizes better than sequential
    // driver round-trips.
    val footerZoneMaps = intCols.nonEmpty && strCols.isEmpty &&
      bloomSpecs.isEmpty &&
      statsCols.flatMap(byName.get).forall(dt =>
        isIntegral(dt) || dt == org.apache.spark.sql.types.DateType) &&
      statsCols.map(phys).toSet
        .intersect(partitionBy.map(phys).toSet).isEmpty
    val statsJobRuns = written.nonEmpty &&
      (strCols.nonEmpty || bloomSpecs.nonEmpty || written.size > 32 ||
        (intCols.nonEmpty && !footerZoneMaps))
    def viaFooters(): (Map[String, ColStats], Map[String, StrColStats],
        Set[String], Map[String, Long]) = {
      val conf = spark.sparkContext.hadoopConfiguration
      val wanted = intCols.map(_._1).toSet
      val perFile = written.map { p =>
        val f = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(absPath(root, p)), conf))
        try {
          val acc = scala.collection.mutable.Map[String, (Long, Long)]()
          if (wanted.nonEmpty) {
            f.getFooter.getBlocks.forEach { blk =>
              blk.getColumns.forEach { ch =>
                val c = ch.getPath.toDotString
                if (wanted(c)) {
                  val st = ch.getStatistics
                  // a chunk whose statistics were never written can't
                  // prove anything — bail to the aggregation job
                  require(st != null && (st.hasNonNullValue || st.isNumNullsSet),
                    s"txlog: footer stats absent for $c in $p")
                  if (st.hasNonNullValue) {
                    val lo = st.genericGetMin.asInstanceOf[Number].longValue
                    val hi = st.genericGetMax.asInstanceOf[Number].longValue
                    val cur = acc.get(c)
                    acc(c) = (cur.fold(lo)(v => math.min(v._1, lo)),
                      cur.fold(hi)(v => math.max(v._2, hi)))
                  }
                }
              }
            }
          }
          // an all-null column contributes no chunk stats → omitted,
          // exactly like the aggregation path's null-lo/hi skip
          (p, acc.toMap: ColStats, f.getRecordCount)
        } finally f.close()
      }
      (perFile.map(t => t._1 -> t._2).toMap,
        Map.empty[String, StrColStats], Set.empty[String],
        perFile.map(t => t._1 -> t._3).toMap)
    }
    def viaAggJob(): (Map[String, ColStats], Map[String, StrColStats],
        Set[String], Map[String, Long]) = {
        // row counts ride the same job for free — Delta's numRecords;
        // with every live entry counted, COUNT(*) resolves from the log
        // alone (see rowCount)
        val aggs = Seq(org.apache.spark.sql.functions.count(lit(1)).as("_rc")) ++
          intCols.flatMap { case (c, e) => Seq(
            min(e).as(s"lo_$c"),
            max(e).as(s"hi_$c")) } ++
          strCols.flatMap(c => Seq(
            min(col(c)).as(s"slo_$c"),
            max(col(c)).as(s"shi_$c"))) ++
          bloomSpecs.map { case (c, n) => Bloom.agg(col(c), n).as(s"bf_$c") }
        // pin the commit's own schema: partition-value type INFERENCE
        // could otherwise re-type a numeric-looking string partition
        // column and break the stats extraction
        val rows = spark.read
          .schema(deepNullable(physDf.schema)
            .asInstanceOf[org.apache.spark.sql.types.StructType])
          .parquet(dataDir)
          .groupBy(input_file_name().as("_f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
        // key stats by the file's path RELATIVE to the txn dir, so a
        // partitioned commit's k=v subdirs key identically to manifests
        // (tail extraction off the uuid dir works for local paths and
        // scheme-ful URIs alike — the uuid cannot recur inside the path)
        def rel(uri: String): String = {
          val p = try new java.net.URI(uri).getPath catch { case scala.util.control.NonFatal(_) => uri }
          val tag = s"data/txn-$txn/"
          val i = p.lastIndexOf(tag)
          require(i >= 0, s"txlog: unexpected written-file uri $uri")
          p.substring(i)
        }
        val ints = rows.map { r =>
          val cs: ColStats = intCols.flatMap { case (c, _) =>
            val lo = r.getAs[Any](s"lo_$c"); val hi = r.getAs[Any](s"hi_$c")
            if (lo == null || hi == null) None // all-null file: no stats
            else Some(c -> (lo.asInstanceOf[Long], hi.asInstanceOf[Long]))
          }.toMap
          rel(r.getString(0)) -> cs
        }.toMap
        val strs = rows.map { r =>
          val cs: StrColStats = strCols.flatMap { c =>
            val lo = r.getAs[String](s"slo_$c"); val hi = r.getAs[String](s"shi_$c")
            if (lo == null || hi == null) None // all-null file: no stats
            else Some(c -> (truncLo(lo), truncHi(hi)))
          }.toMap
          rel(r.getString(0)) -> cs
        }.toMap
        // sidecar bitsets land next to their data files BEFORE the
        // manifest references them (same ordering discipline as the data
        // itself) — a driver round-trip bounded by the commit's file
        // count × capped bitset size, never by the table
        val bloomed: Set[String] =
          if (bloomSpecs.isEmpty) Set.empty
          else rows.flatMap { r =>
            val p = rel(r.getString(0))
            val wrote = bloomSpecs.forall { case (c, _) =>
              val bytes = r.getAs[Array[Byte]](s"bf_$c")
              if (bytes == null) false
              else {
                store(root).putReplace(s"$root/${Bloom.sidecar(p, c)}", bytes)
                true
              }
            }
            if (wrote) Some(p) else None
          }.toSet
        val rcs = rows.map(r => rel(r.getString(0)) -> r.getAs[Long]("_rc")).toMap
        (ints, strs, bloomed, rcs)
      }
    val (fileStats: Map[String, ColStats],
      fileStrStats: Map[String, StrColStats],
      fileBloomed: Set[String],
      fileRows: Map[String, Long]) =
      if (written.isEmpty)
        (Map.empty[String, ColStats], Map.empty[String, StrColStats],
          Set.empty[String], Map.empty[String, Long])
      else if (!statsJobRuns) {
        // footer extraction is conservative: any chunk with absent
        // statistics bails out to the one aggregation job
        try viaFooters()
        catch { case scala.util.control.NonFatal(_) => viaAggJob() }
      } else viaAggJob()
    val bloomTypes: BloomCols = bloomCols.toSeq
      .filter { case (c, _) => byName.contains(c) }
      .map { case (c, _) => phys(c) -> byName(c).catalogString }.toMap
    val entries: Seq[String] =
      carry.map(renderEntry) ++ written.map(p =>
        renderEntry(Entry(p, writtenSizes.get(p),
          fileStats.getOrElse(p, Map.empty),
          fileStrStats.getOrElse(p, Map.empty),
          // a file the stats job never saw (a zero-row part file) gets
          // no sidecar and therefore declares no bloom — readers keep it
          if (fileBloomed.contains(p)) bloomTypes else Map.empty,
          // a written file the stats job saw no rows for is a zero-row
          // part file: its count is exactly 0, not unknown (the footer
          // path counts every file directly)
          rows = fileRows.get(p)
            .orElse(if (written.nonEmpty) Some(0L) else None))))
    // record the commit's schema so readers resolve theirs from the
    // LOG, never from O(live files) footer reads; a carry-bearing
    // commit must cover the carried files' columns too, so it merges
    // the caller-supplied carry schema (unknown carry schema → omit,
    // and readers of this range fall back to inference)
    val recorded: Option[org.apache.spark.sql.types.StructType] = {
      val own = Some(deepNullable(df.schema)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      if (carry.isEmpty) own
      else mergeSchemas(carrySchema.map(s => deepNullable(s)
        .asInstanceOf[org.apache.spark.sql.types.StructType]), own)
    }
    publish(root, entries, action, txnId, recorded, expectHead, txn, cdf,
      partitionBy, rebaseAppends = rebaseAppends, op = op,
      consRecheck = consRecheck, dvb = dvb,
      // a schema-evolving commit re-adding a retired name records its
      // fresh physical assignment in the same manifest (fold-merged, so
      // a racing rename's mapping is never clobbered)
      colMapAdd = freshAssign,
      touched = touched, rebaseDvTouched = rebaseDvTouched,
      cluster = cluster,
      declareFlatLayout = evolvePartitions && partitionBy.isEmpty)
  }

  /** Test-only race injection: invoked once at the next publish attempt
    * (self-resetting), so specs can land a commit deterministically
    * inside another commit's compute→publish window — the interleaving
    * chaos tests can only hit probabilistically.
    */
  private[io] var testRaceHook: () => Unit = () => ()

  /** Steps 2+3 of the protocol: write the full manifest to a temp file,
    * fsync, and claim the next version by atomic hard link — retrying
    * lost races unless the caller pinned `expectHead`.
    *
    * `rebaseAppends` (content-preserving rewrites only — optimize /
    * compact / their z-order variants): when the head moved past
    * `expectHead` but every interleaved commit is a PLAIN APPEND in the
    * same layout, fold those appends' entries (and recorded schemas)
    * into this manifest by reference and publish anyway — equivalent to
    * serializing the rewrite FIRST and the appends after it, which is
    * exactly Delta's write-serializable reordering for blind appends.
    * Without this, a compaction racing a continuous ingest stream
    * re-reads and re-writes its whole input per lost round and can
    * starve — the one maintenance behavior a 100 TB table cannot
    * afford. Anything other than a plain append (a rewrite, a layout
    * change, a constraint edit) still conflicts and the caller re-reads.
    */
  private def publish(
      root: String,
      entries: Seq[String],
      action: Action,
      txnId: Option[String],
      recorded: Option[org.apache.spark.sql.types.StructType],
      expectHead: Option[Long],
      txn: String,
      cdf: Option[String] = None,
      partitionBy: Seq[String] = Nil,
      constraints: Option[Map[String, String]] = None,
      rebaseAppends: Boolean = false,
      op: Option[String] = None,
      consRecheck: Option[(Long, Map[String, String] => Unit)] = None,
      dvb: Map[String, Long] = Map.empty,
      colMapAdd: Map[String, String] = Map.empty,
      colUnmap: Set[String] = Set.empty,
      colDrop: Set[String] = Set.empty,
      touched: Set[String] = Set.empty,
      rebaseDvTouched: Option[Set[String]] = None,
      cluster: Option[Seq[String]] = None,
      declareFlatLayout: Boolean = false): Long = {
    val hook = testRaceHook
    testRaceHook = () => ()
    hook()
    var attempt = 0
    var curEntries = entries
    var curRecorded = recorded
    var curBase = expectHead
    var curDvb = dvb
    // CHECK-race closure: the version up to which interleaved manifests
    // have been scanned for a constraints change (see commitInner)
    var consScanned = consRecheck.map(_._1).getOrElse(Long.MaxValue)
    while (true) {
      val next = headVersion(root) + 1
      // before claiming: if anything committed since the constraint map
      // was read, look for a constraints-bearing manifest among the
      // interleaved versions and re-validate this commit's files against
      // the newest map — zero reads in the uncontended case
      consRecheck.foreach { case (_, fn) =>
        if (next - 1 > consScanned) {
          var latest: Option[Map[String, String]] = None
          ((consScanned + 1) to (next - 1)).foreach { v =>
            val txt = readLogFile(root, f"v$v%08d.json")
            constraintsOfLog(txt).foreach(m => latest = Some(m))
            // a COLUMN-MAPPING change in the window invalidates the
            // physical names this commit's files were written under —
            // conflict loudly (a read-modify-write caller retries with
            // the new mapping; a plain append surfaces the error and its
            // files are vacuumable residue) rather than letting replay
            // merge the old logical name back in over retired bytes
            if (colmapOfLog(txt).nonEmpty || colunmapOfLog(txt).nonEmpty ||
              coldropOfLog(txt).nonEmpty)
              throw new CommitConflict(
                s"txlog: the column mapping changed at v$v inside this " +
                  "commit's write window — retry the commit against the " +
                  "new mapping")
          }
          consScanned = next - 1
          latest.foreach(fn)
        }
      }
      // serializable read-modify-write: a caller that derived its state
      // FROM a snapshot declares the head it read; if anything committed
      // since, blindly claiming next would silently drop that commit's
      // effect (lost update) — conflict instead, so the caller re-reads
      curBase.foreach { h =>
        if (next - 1 != h) {
          if (!rebaseAppends && rebaseDvTouched.isEmpty)
            throw new CommitConflict(
              s"txlog: based on v$h but head is v${next - 1}")
          // DV-mode folding works at ENTRY granularity (path-keyed), so
          // a racing row-level op on disjoint files can hand over its
          // entries' dv state without conflicting
          lazy val entryMap: scala.collection.mutable.LinkedHashMap[String, String] = {
            val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
            curEntries.foreach(e => m(pathOfRendered(e)) = e)
            m
          }
          var usedMap = false
          (h + 1 to next - 1).foreach { v =>
            val txt = readLogFile(root, f"v$v%08d.json")
            val act = actionField.findFirstMatchIn(txt).map(_.group(1))
            if (partitionByOfLog(txt) != partitionBy)
              throw new CommitConflict(
                s"txlog: based on v$h but v$v declares a different layout")
            if (act.contains(Append.name)) {
              // fold by reference: the append's entries (stats, blooms,
              // sizes — a parse→render round trip preserves every
              // field) and its recorded schema, merged exactly as
              // replay would have merged them. For a row-level op this
              // is write-serializable reordering too: the op serializes
              // FIRST, the blind append after it (its rows are not
              // subject to the op's predicate — Delta's semantics)
              if (rebaseDvTouched.isEmpty)
                curEntries = curEntries ++ parseEntries(txt).map(renderEntry)
              else {
                usedMap = true
                parseEntries(txt).foreach(e => entryMap(e.path) = renderEntry(e))
              }
              curRecorded = mergeSchemas(curRecorded, schemaOfLog(txt))
              curDvb ++= dvbOfLog(txt)
            } else if (rebaseDvTouched.nonEmpty && act.contains(Overwrite.name) &&
              touchedOfLog(txt).exists(_.intersect(rebaseDvTouched.get).isEmpty)) {
              // a racing row-level op that touched DISJOINT files: adopt
              // its entry state for exactly the files IT touched, plus
              // any file it added (MoR post-images) — equivalent to
              // serializing it before this commit, which is what Delta's
              // conflict checker admits for disjoint row-level ops. An
              // overlapping touched set (or any commit without a touched
              // declaration) still conflicts and the caller re-reads.
              usedMap = true
              val theirT = touchedOfLog(txt).get
              parseEntries(txt).foreach { e =>
                if (theirT.contains(e.path) || !entryMap.contains(e.path))
                  entryMap(e.path) = renderEntry(e)
              }
              curRecorded = mergeSchemas(curRecorded, schemaOfLog(txt))
              curDvb ++= dvbOfLog(txt)
            } else throw new CommitConflict(
              s"txlog: based on v$h but v$v is not foldable " +
                s"(${act.getOrElse("?")}${touchedOfLog(txt).map(t => s", touched=${t.size}").getOrElse("")})")
          }
          if (usedMap) curEntries = entryMap.values.toSeq
          curBase = Some(next - 1)
        }
      }
      // escaped like every other user-supplied string: a quote or
      // backslash in a caller's txnId (streaming txnPrefix flows here
      // verbatim) must not be able to corrupt the manifest line
      val txnPart = txnId.map(t => s""","txnId":"${escStr(t)}"""").getOrElse("")
      val opPart = op.map(o => s""","op":"${escStr(o)}"""").getOrElse("")
      val cdfPart = cdf.map(d => s""","cdf":"$d"""").getOrElse("")
      val partPart =
        if (partitionBy.nonEmpty)
          partitionBy.map(c => "\"" + c + "\"")
            .mkString(""","partitionBy":[""", ",", "]")
        // an EXPLICIT evolution to a flat layout declares the empty spec
        // (present-empty ≠ absent: replay's fold only moves the current
        // spec on a declaration)
        else if (declareFlatLayout) ""","partitionBy":[]"""
        else ""
      val schemaPart = curRecorded
        .map(s => s""","schemaB64":"${schemaToB64(s)}"""").getOrElse("")
      val consPart = constraints.map(renderConstraints).getOrElse("")
      val dvbPart = renderDvb(curDvb)
      val touchedPart = renderStrList("touched", touched)
      val clusterPart = cluster.map(renderSeqField("cluster", _)).getOrElse("")
      val mapPart = renderColmap(colMapAdd) +
        renderStrList("colunmap", colUnmap) +
        renderStrList("coldrop", colDrop)
      // constraints-bearing manifests are fmt 4: an older writer's
      // checkpoint would silently DROP the field (derived state), losing
      // enforcement for every later reader; column-mapping state gates 5,
      // and so does a txnId that ESCAPES differently than it reads — an
      // older reader would store the escaped bytes and fail the
      // exactly-once lookup, double-landing a replayed microbatch
      val fmt = math.max(manifestFmt(curEntries, partitionBy),
        math.max(if (consPart.nonEmpty) 4L else 0L,
          math.max(if (mapPart.nonEmpty) 5L else 0L,
            if (txnId.exists(t => escStr(t) != t)) 5L else 0L)))
      val body = curEntries.mkString(
        s"""{"version":$next,"fmt":$fmt,"ts":${System.currentTimeMillis()},"action":"${action.name}"$txnPart$opPart$cdfPart$partPart$schemaPart$consPart$dvbPart$touchedPart$clusterPart$mapPart,"files":[""", ",", "]}")
      // the atomic claim: complete durable bytes at vN or nothing — the
      // store's contract (hard link locally, exclusive rename on HDFS)
      if (store(root).putIfAbsent(logPath(root, f"v$next%08d.json"),
        body.getBytes(StandardCharsets.UTF_8))) {
        writeHeadPointer(root, next)
        if (next % CheckpointEvery == 0) writeCheckpoint(root, next)
        return next
      } else {
        attempt += 1 // lost the race for `next`; re-read head, retry
        if (attempt > 1000)
          throw new java.io.IOException(
            s"txlog: gave up claiming a version after $attempt attempts")
      }
    }
    -1L // unreachable
  }

  /** RESTORE the table to the state of `version`: ONE metadata-only
    * overwrite commit that re-references that version's entries (files,
    * sizes, zone maps, schema) — data files are immutable, so restoring
    * a 100 TB table costs one manifest write, no data movement (Delta's
    * RESTORE). History is preserved: the restore is a NEW version, every
    * intermediate state stays time-travelable, and vacuum semantics are
    * unchanged (the restored files are live again, so no retention
    * window can collect them).
    */
  def restore(spark: SparkSession, root: String, version: Long): Long = {
    val head0 = headVersion(root)
    require(version >= 1 && version <= head0,
      s"txlog: cannot restore $root to v$version (head is v$head0)")
    val r = replay(root, version)
    require(r.entries.nonEmpty, s"txlog: v$version of $root lists no files")
    // the COLUMN MAPPING is table state too: a restore below a RENAME
    // must rewind it, or the next append under the restored (old) name
    // sees its physical as "taken" (colMap.values), takes a fresh one,
    // and every restored file reads that column as NULL. Unmap the
    // head's stale keys and re-add the restored map; retirements
    // (droppedPhys) stay monotone — a restored colMap entry overrides
    // the taken-check for its own logical name, so resurrected columns
    // keep reading, while the retired physicals still can never be
    // REASSIGNED to a different logical.
    //
    // Serializable read-modify-write with the claim PINNED to the head
    // the current mapping was read at: a RENAME committing between the
    // head read and the claim would otherwise leave its colMap entry out
    // of colUnmap — the stale mapping survives the restore and a later
    // write of that renamed logical lands in the restored column's
    // physical bytes (silent column collision). The conflict retry
    // recomputes cur.colMap per attempt, like rename/drop.
    readModifyWrite(root, "restore") { (head, cur) =>
      publish(root, r.entries.map(renderEntry), Overwrite, txnId = None,
        recorded = r.schema, expectHead = Some(head),
        txn = java.util.UUID.randomUUID().toString.take(12),
        partitionBy = r.partitionBy.getOrElse(Nil), op = Some("RESTORE"),
        colMapAdd = r.colMap,
        colUnmap = cur.colMap.keySet.diff(r.colMap.keySet))
    }
  }

  /** Shallow CLONE: a metadata-only fork of `srcRoot`'s snapshot at
    * `version` (head when None) into `dstRoot` — ONE manifest write
    * whose entries reference the source's files by ABSOLUTE path
    * (external entries, fmt-gated to 4), carrying their sizes, zone
    * maps, string stats, and bloom declarations, plus the recorded
    * schema and partition layout. At 100 TB a dev/test fork costs
    * kilobytes of metadata and zero data movement — Delta's SHALLOW
    * CLONE, Iceberg's snapshot-ref idea. Data files are immutable, so
    * the fork is a consistent snapshot forever.
    *
    * Writes to the clone are ordinary commits into its OWN data dirs;
    * the rewrite ops (merge/delete/update/compact/optimize) read
    * external files through the shared [[TxLogFileIndex]] path and
    * copy-on-write the touched ones INTO the clone — the source is never
    * modified, and untouched external entries keep being carried by
    * reference. The clone's own [[vacuum]] never deletes external files
    * (it only walks `dstRoot/data`). The flip side is Delta's documented
    * shallow-clone caveat: a vacuum ON THE SOURCE can delete files a
    * clone still references — the source's retention policy must cover
    * its clones' lifetimes.
    */
  def cloneTable(
      srcRoot: String,
      dstRoot: String,
      version: Option[Long] = None): Long = {
    val v = version.getOrElse(headVersion(srcRoot))
    val r = replay(srcRoot, v)
    require(r.entries.nonEmpty, s"txlog: clone of $srcRoot v$v lists no files")
    require(headVersion(dstRoot) == 0L,
      s"txlog: clone target $dstRoot already has a log")
    val srcAbs =
      if (srcRoot.contains("://") || srcRoot.startsWith("file:")) srcRoot
      else Paths.get(srcRoot).toAbsolutePath.toString
    // data paths AND deletion-vector refs absolutize against the source
    val ext = r.entries.map(e => e.copy(
      path = absPath(srcAbs, e.path),
      dvs = e.dvs.map(d => absPath(srcAbs, d))))
    store(dstRoot).mkdirs(logDir(dstRoot))
    // FULL metadata state rides along, not just entries: the source's
    // column mapping (external files carry PHYSICAL names — a clone
    // without the map would look logical names up directly and read
    // every renamed column as NULL), its retired physicals (so a re-add
    // in the clone can never resurface old bytes), its CHECK
    // constraints, and its clustering keys. The hint markers land
    // BEFORE the manifest, same ordering as rename/addConstraint.
    if (r.colMap.nonEmpty || r.droppedPhys.nonEmpty)
      try store(dstRoot).createMarker(colmapMarker(dstRoot))
      catch { case scala.util.control.NonFatal(_) => () } // already hinted: fine
    if (r.constraints.nonEmpty)
      try store(dstRoot).createMarker(constraintsMarker(dstRoot))
      catch { case scala.util.control.NonFatal(_) => () } // already hinted: fine
    // the source's dv-byte ledger rides along, keyed by the absolutized
    // refs the clone's entries now carry
    val extDvb = r.dvBytes.map { case (d, b) => absPath(srcAbs, d) -> b }
    publish(dstRoot, ext.map(renderEntry), Overwrite, txnId = None,
      recorded = r.schema, expectHead = None,
      txn = java.util.UUID.randomUUID().toString.take(12),
      partitionBy = layoutOf(srcRoot, r), op = Some("CLONE"), dvb = extDvb,
      colMapAdd = r.colMap, colDrop = r.droppedPhys,
      constraints = if (r.constraints.isEmpty) None else Some(r.constraints),
      cluster = if (r.clusterBy.isEmpty) None else Some(r.clusterBy))
  }

  /** Metadata-only COUNT(*): Σ per-file recorded row counts minus each
    * file's deleted-position count, resolved from the LOG alone — the
    * signature takes no SparkSession because no data file (or even
    * footer) is touched, which at 100 TB is the difference between an
    * instant answer and a full scan (Delta answers `count(*)` from
    * numRecords the same way). `None` when any live entry predates
    * row-count recording or was committed without a stats job — the
    * caller falls back to `snapshot(...).count()`, never to a wrong
    * number. Row counts ride the commit's existing stats job for free;
    * deletion vectors maintain per-file deleted counts at delete time.
    */
  def rowCount(root: String, version: Option[Long] = None): Option[Long] = {
    val r = replay(root, version.getOrElse(headVersion(root)))
    if (r.entries.isEmpty || r.entries.exists(_.rows.isEmpty)) None
    else Some(r.entries.iterator.map(e => e.rows.get - e.dvRows).sum)
  }

  /** Current CHECK constraints (name → SQL expression). */
  def constraintsOf(root: String): Map[String, String] =
    if (headVersion(root) == 0L) Map.empty
    else replay(root, headVersion(root)).constraints

  /** ADD a CHECK constraint: validates the EXISTING table in one scan
    * (Delta's ADD CONSTRAINT semantics — a constraint is a guarantee, so
    * it must hold retroactively or be refused), then publishes a
    * metadata commit carrying the current entries by reference plus the
    * updated constraint map. Every later commit's rows are validated
    * against it (SQL semantics: NULL passes, only provably-FALSE rows
    * violate) with a read-back scan proportional to the commit.
    * Serializable like every rewrite: a racing commit conflicts and the
    * add re-validates against the new head. Content-preserving
    * (`cdf = ""`), so change-feed subscribers read straight through it.
    */
  def addConstraint(
      spark: SparkSession,
      root: String,
      name: String,
      sqlExpr: String): Long = {
    require(name.nonEmpty, "txlog: constraint name must be non-empty")
    readModifyWrite(root, "addConstraint") { (base, r) =>
      require(!r.constraints.contains(name),
        s"txlog: constraint $name already exists on $root")
      if (r.entries.nonEmpty) {
        val bad = TxLogFileIndex.read(spark, root, r)
          .filter(expr(sqlExpr) <=> lit(false))
        if (!bad.isEmpty)
          throw new ConstraintViolation(
            s"txlog: existing rows of $root violate CHECK $name ($sqlExpr); not added")
      }
      // marker BEFORE the manifest: any commit racing past the publish
      // already sees the hint and resolves constraints from the log
      store(root).mkdirs(logDir(root))
      try store(root).createMarker(constraintsMarker(root))
      catch { case scala.util.control.NonFatal(_) => () } // already hinted: fine
      publish(root, r.entries.map(renderEntry), Overwrite, txnId = None,
        recorded = r.schema, expectHead = Some(base),
        txn = java.util.UUID.randomUUID().toString.take(12),
        cdf = Some(""), partitionBy = layoutOf(root, r),
        constraints = Some(r.constraints + (name -> sqlExpr)),
        op = Some("ADD CONSTRAINT"))
    }
  }

  /** DROP a CHECK constraint: a metadata commit writing the full updated
    * (possibly empty) map — replay treats present-empty as reset, so the
    * drop survives checkpoints.
    */
  def dropConstraint(root: String, name: String): Long =
    readModifyWrite(root, "dropConstraint") { (base, r) =>
      require(r.constraints.contains(name),
        s"txlog: no constraint $name on $root")
      publish(root, r.entries.map(renderEntry), Overwrite, txnId = None,
        recorded = r.schema, expectHead = Some(base),
        txn = java.util.UUID.randomUUID().toString.take(12),
        cdf = Some(""), partitionBy = layoutOf(root, r),
        constraints = Some(r.constraints - name),
        op = Some("DROP CONSTRAINT"))
    }

  /** Column names a CHECK constraint expression references (unresolved
    * parse — no session needed), so RENAME/DROP can refuse to orphan one.
    */
  private def constraintRefs(ex: String): Set[String] =
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(ex)
      .collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.nameParts.head
      }.toSet

  /** RENAME COLUMN — metadata only, zero data movement. The logical name
    * changes in the recorded schema; the files' PHYSICAL column keeps
    * its name via a `colmap` entry (Delta's column mapping), so every
    * pre-rename file reads through the new name and every pre-rename
    * zone map / bloom index keeps pruning (stats are keyed physical).
    * PARTITION columns rename too (Iceberg's semantics): the layout
    * declaration moves with the logical name while the k=v directories
    * keep the physical one — old generations, new writes, and directory
    * pruning all resolve through the mapping. Refused only for columns
    * a CHECK constraint references. Content-preserving
    * (`cdf = ""`): change-feed subscribers read through it, surfacing
    * the new name from this version on. Serializable like every
    * metadata commit.
    */
  def renameColumn(root: String, oldName: String, newName: String): Long =
    readModifyWrite(root, "renameColumn") { (base, r) =>
      val schema = r.schema.getOrElse(throw new IllegalStateException(
        s"txlog: $root has no recorded schema — column mapping needs one"))
      require(schema.fieldNames.contains(oldName),
        s"txlog: no column $oldName on $root")
      require(!schema.fieldNames.contains(newName),
        s"txlog: column $newName already exists on $root")
      val layout = layoutOf(root, r)
      r.constraints.foreach { case (n, ex) =>
        require(!constraintRefs(ex).contains(oldName),
          s"txlog: CHECK constraint $n references $oldName; drop it first")
      }
      val physOld = r.physName(oldName)
      // a PARTITION column renames too (Iceberg allows it): the layout
      // declaration moves to the new logical name in the same commit,
      // while the k=v directories — physical bytes, like file columns —
      // keep the physical name, which new writes keep using (see the
      // commit write path) and the read resolves back through the map
      val newLayout = layout.map(c => if (c == oldName) newName else c)
      val newSchema = org.apache.spark.sql.types.StructType(schema.fields.map(
        f => if (f.name == oldName) f.copy(name = newName) else f))
      store(root).mkdirs(logDir(root))
      try store(root).createMarker(colmapMarker(root))
      catch { case scala.util.control.NonFatal(_) => () } // already hinted: fine
      // recorded clustering keys follow the rename in the SAME commit,
      // so a keyless compactZOrder after the rename resolves — and can
      // never cluster by a stranger re-added under the old name
      val newCluster =
        if (!r.clusterBy.contains(oldName)) None
        else Some(r.clusterBy.map(c => if (c == oldName) newName else c))
      publish(root, r.entries.map(renderEntry), Overwrite, txnId = None,
        recorded = Some(newSchema), expectHead = Some(base),
        txn = java.util.UUID.randomUUID().toString.take(12),
        cdf = Some(""), partitionBy = newLayout, op = Some("RENAME COLUMN"),
        colMapAdd = Map(newName -> physOld), colUnmap = Set(oldName),
        cluster = newCluster)
    }

  /** DROP COLUMN — metadata only: the field leaves the recorded schema
    * and its physical name RETIRES (`coldrop`), so a later re-add of the
    * same logical name gets a fresh physical and the old files' bytes
    * never resurface. Time travel below the drop still sees the column.
    * Same refusals as rename (partition / constraint-referenced).
    */
  def dropColumn(root: String, name: String): Long =
    readModifyWrite(root, "dropColumn") { (base, r) =>
      val schema = r.schema.getOrElse(throw new IllegalStateException(
        s"txlog: $root has no recorded schema — column mapping needs one"))
      require(schema.fieldNames.contains(name),
        s"txlog: no column $name on $root")
      require(schema.fields.length > 1,
        s"txlog: cannot drop the last column of $root")
      val layout = layoutOf(root, r)
      require(!layout.contains(name),
        s"txlog: cannot drop partition column $name")
      require(!r.clusterBy.contains(name),
        s"txlog: $name is a recorded clustering key; clusterBy without " +
          "it (or compact) first")
      r.constraints.foreach { case (n, ex) =>
        require(!constraintRefs(ex).contains(name),
          s"txlog: CHECK constraint $n references $name; drop it first")
      }
      val physOld = r.physName(name)
      val newSchema = org.apache.spark.sql.types.StructType(
        schema.fields.filterNot(_.name == name))
      store(root).mkdirs(logDir(root))
      try store(root).createMarker(colmapMarker(root))
      catch { case scala.util.control.NonFatal(_) => () } // already hinted: fine
      publish(root, r.entries.map(renderEntry), Overwrite, txnId = None,
        recorded = Some(newSchema), expectHead = Some(base),
        txn = java.util.UUID.randomUUID().toString.take(12),
        cdf = Some(""), partitionBy = layout, op = Some("DROP COLUMN"),
        colUnmap = Set(name), colDrop = Set(physOld))
    }

  /** Best-effort: a checkpoint is pure derived state, so a failure (or a
    * concurrent winner) must never fail the commit that triggered it —
    * readers just replay a longer manifest suffix. Stats entries are
    * carried INTO the checkpoint (same serialization as manifests), so
    * the data-skipping read path is checkpoint-bounded too.
    */
  private def writeCheckpoint(root: String, v: Long): Unit =
    try {
      val r = replay(root, v)
      // a MIXED partition layout checkpoints fine: the record carries the
      // CURRENT declared spec, while each entry's own k=v path segments
      // carry its generation's layout — exactly what the read derives
      // them from — so an evolved table's replay stays checkpoint-bounded
      // instead of replaying an ever-growing manifest suffix
      // (TxLogPartitionSpec's mixed-layout case proves the bound)
      val partCols = r.partitionBy.getOrElse(Nil)
      val partPart =
        if (partCols.isEmpty) ""
        else partCols.map(c => "\"" + c + "\"")
          .mkString(""","partitionBy":[""", ",", "]")
      val schemaPart = r.schema
        .map(s => s""","schemaB64":"${schemaToB64(s)}"""").getOrElse("")
      val txnsPart =
        if (r.txns.isEmpty) ""
        else r.txns.toSeq.sortBy(_._2)
          .map { case (t, tv) => s""""${escStr(t)}":$tv""" }
          .mkString(""","txns":{""", ",", "}")
      val consPart =
        if (r.constraints.isEmpty) "" else renderConstraints(r.constraints)
      // the dv-byte ledger survives checkpoint-bounded replay, pruned to
      // the refs the live set still subtracts
      val dvbPart = {
        val live = r.entries.iterator.flatMap(_.dvs).toSet
        renderDvb(r.dvBytes.filter { case (d, _) => live(d) })
      }
      // full folded column-mapping state (replay-from-checkpoint resets)
      val mapPart = renderColmap(r.colMap) +
        renderStrList("coldrop", r.droppedPhys)
      val clusterPart =
        if (r.clusterBy.isEmpty) ""
        else renderSeqField("cluster", r.clusterBy)
      val rendered = r.entries.map(renderEntry)
      val fmt = math.max(manifestFmt(rendered, partCols),
        math.max(if (consPart.nonEmpty) 4L else 0L,
          math.max(if (mapPart.nonEmpty) 5L else 0L,
            if (r.txns.keys.exists(t => escStr(t) != t)) 5L else 0L)))
      val body = rendered
        .mkString(s"""{"version":$v,"fmt":$fmt,"action":"checkpoint"$partPart$schemaPart$txnsPart$consPart$dvbPart$mapPart$clusterPart,"files":[""", ",", "]}")
      store(root).putIfAbsent(logPath(root, f"c$v%08d.json"),
        body.getBytes(StandardCharsets.UTF_8)) // concurrent winner: fine
      ()
    } catch { case scala.util.control.NonFatal(_) => () }

  def append(spark: SparkSession, root: String, df: DataFrame): Long =
    commit(spark, root, df, Append)

  /** Append with zone maps and/or bloom indexes — the per-batch ingest
    * wrapper (`bloomCols`: column → expected distinct values per file).
    */
  def append(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      statsCols: Seq[String],
      bloomCols: Map[String, Long]): Long =
    commit(spark, root, df, Append, statsCols = statsCols,
      bloomCols = bloomCols)

  def overwrite(spark: SparkSession, root: String, df: DataFrame): Long =
    commit(spark, root, df, Overwrite)

  /** Atomically replace exactly the hive partitions named by `spec`
    * (logical partition column → value) with `df`'s rows — SQL
    * `INSERT OVERWRITE ... PARTITION (k=v)` / Delta's partition-scoped
    * `replaceWhere`, as ONE overwrite commit: the spec-matching live
    * entries are dropped, every other live file is carried BY REFERENCE
    * (stats intact, zero data reads to decide — files are
    * partition-homogeneous so entry paths answer membership exactly),
    * and the new files land under the same layout. Readers never see an
    * intermediate state, and a concurrent append rebases on top
    * (serializable as append-after-replace).
    *
    * `df` must already be confined to the replaced partitions — guarded
    * by one column-pruned pass over the spec columns (for the SQL path
    * the spec values are injected literals, so the optimizer folds the
    * guard to a no-op). The written files inherit the table's recorded
    * zone-map columns, so routine SQL overwrites keep data skipping
    * alive without the caller re-declaring anything.
    */
  def replacePartitions(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      spec: Map[String, String]): Long = {
    require(spec.nonEmpty, "txlog: replacePartitions needs a non-empty spec")
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    readModifyWrite(root, "replacePartitions") { (base, r) =>
      val layout = layoutOf(root, r)
      val bad = spec.keys.filterNot(layout.contains)
      require(bad.isEmpty,
        s"txlog: replacePartitions spec names non-partition columns " +
          s"${bad.mkString(", ")} (layout: ${layout.mkString(", ")})")
      val schema = r.schema.getOrElse(throw new IllegalStateException(
        s"txlog: $root has no recorded schema; cannot type the partition spec"))
      // dir segment per spec column: PHYSICAL name (k=v dirs keep
      // physical names through a column rename), value canonicalized
      // through the recorded type so "07" and "7" name the same partition
      val typed: Map[String, (org.apache.spark.sql.types.DataType, String)] =
        spec.map { case (k, v) =>
          val dt = schema.fields.find(_.name == k).map(_.dataType)
            .getOrElse(throw new IllegalArgumentException(
              s"txlog: partition column $k missing from the recorded schema"))
          val canon = dt match {
            case org.apache.spark.sql.types.StringType => v
            case _ => v.trim.toLong.toString
          }
          k -> (dt, canon)
        }
      val segs = typed.map { case (k, (_, canon)) =>
        s"${escapePathName(r.physName(k))}=${escapePathName(canon)}"
      }.toSet
      def hit(e: Entry): Boolean =
        segs.subsetOf(e.path.split("/").dropRight(1).toSet)
      val keep = r.entries.filterNot(hit)
      val confined = typed.map { case (k, (dt, canon)) =>
        col(k) <=> lit(canon).cast(dt)
      }.reduce(_ && _)
      require(df.filter(!confined).isEmpty,
        s"txlog: replacePartitions data contains rows outside " +
          s"${spec.map { case (k, v) => s"$k=$v" }.mkString(", ")}")
      commit(spark, root, df, Overwrite,
        statsCols = ledgerStatsCols(r), carry = keep, carrySchema = r.schema,
        expectHead = Some(base), partitionBy = layout, rebaseAppends = true,
        op = Some("REPLACE PARTITIONS"))
    }
  }

  /** The zone-map columns the table's live files already carry, mapped
    * to logical names — what a routine write should declare as
    * `statsCols` so it lands as prunable as the data around it (the SQL
    * INSERT path's default; [[maintain]] uses the same ledger-derived
    * set for its rewrites).
    */
  def recordedStatsCols(root: String): Seq[String] = {
    val head = headVersion(root)
    if (head == 0L) Nil else ledgerStatsCols(replay(root, head))
  }

  /** Exactly-once append: a replay of the same `txnId` (a Structured
    * Streaming batchId after failure recovery, an orchestrator retry) is a
    * no-op returning the original version. This is the idempotence contract
    * a streaming sink needs — wire it as
    * `ds.writeStream.foreachBatch((df, id) => TxLog.appendOnce(spark, root,
    * s"stream#$id", df))` and a re-delivered microbatch can't double-land.
    * Assumes replays are sequential (a failed writer restarts; two LIVE
    * writers racing the same txnId is an orchestration bug this does not
    * solve — the check-then-commit window is documented, same stance as
    * Delta's txn appId/version userMetadata).
    */
  def appendOnce(
      spark: SparkSession,
      root: String,
      txnId: String,
      df: DataFrame,
      partitionBy: Seq[String] = Nil,
      statsCols: Seq[String] = Nil,
      bloomCols: Map[String, Long] = Map.empty): Long =
    committedTxnIds(root).get(txnId) match {
      case Some(v) => v
      case None    => commit(spark, root, df, Append, Some(txnId),
        statsCols = statsCols, partitionBy = partitionBy,
        bloomCols = bloomCols)
    }

  /** Logical→physical column rename for a mapped table's SIDE files
    * (change data): every file under the root then shares the physical
    * naming, and [[changes]] reverse-maps once at the end. Identity for
    * unmapped tables. Tag columns (`_change_type`) are never mapped.
    */
  private def toPhysical(df: DataFrame, r: Replay): DataFrame =
    if (r.colMap.isEmpty) df
    else df.select(df.columns.toSeq.map(c =>
      col(c).as(r.colMap.getOrElse(c, c))): _*)

  /** Serializable read-modify-write driver shared by every rewrite op
    * (merge/delete/update/optimize/zorder/compact): resolve the head,
    * hand `body` its replay, and rerun on a [[CommitConflict]] — the
    * body's `commit(expectHead = Some(base))` turns a lost update into
    * a retry instead of a silent erase; an abandoned attempt's files
    * are unreferenced garbage until a vacuum.
    */
  private def readModifyWrite(root: String, op: String)(
      body: (Long, Replay) => Long): Long = {
    var attempts = 0
    while (true) {
      val base = headVersion(root)
      val r = replay(root, base)
      try return body(base, r)
      catch {
        case _: CommitConflict =>
          rmwConflicts.incrementAndGet()
          attempts += 1
          if (attempts > 50)
            throw new java.io.IOException(
              s"txlog: $op lost $attempts conflicts in a row; giving up")
      }
    }
    -1L // unreachable
  }

  /** The declared partition layout of a replay, refusing a mixed one
    * (a rewrite over a mixed layout would bake the corruption in).
    */
  private def layoutOf(root: String, r: Replay): Seq[String] =
    r.partitionBy.getOrElse(throw new IllegalStateException(
      s"txlog: $root has a mixed partition layout; restore a clean version first"))

  /** File-granular copy-on-write MERGE (upsert): rows of `updates`
    * replace current rows sharing `keyCol`; unmatched update rows
    * insert. Only files whose `keyCol` zone map can intersect the
    * updates' key range are rewritten — every other live file is carried
    * into the new manifest BY REFERENCE (data files are immutable, so
    * re-listing is free), keeping its stats. Files without `keyCol`
    * stats are conservatively rewritten. The commit cost is therefore
    * proportional to the files the batch TOUCHES, not to the table — the
    * difference between a bounded CDC-apply commit and an O(table)
    * commit (round 7 rewrote the whole table; the design it documented
    * as "noted, not built" is built here, and TxLogSpec asserts the
    * manifest diff). Rewritten and inserted files get fresh `keyCol`
    * zone maps so the NEXT merge stays file-granular.
    *
    * Serializable read-modify-write: the commit pins the version the
    * rewrite was based on; if anything commits in between, the
    * conditional commit throws and the whole read-modify-write reruns
    * against the new head — a blind overwrite would silently drop the
    * interleaved commit (lost update). The abandoned attempt's files are
    * unreferenced garbage until a vacuum.
    */
  def merge(spark: SparkSession, root: String, updates: DataFrame, keyCol: String): Long = {
    val keyL = col(keyCol).cast("long")
    // zone maps are long-valued: only an integral key gets file-granular
    // matching; any other key type is a classic whole-table copy-on-write
    val keyIsIntegral = updates.schema.fields
      .find(_.name == keyCol).exists(f => isIntegral(f.dataType))
    // the updates' key span: one tiny agg job, reused across retries
    val kr = if (keyIsIntegral) Some(updates.agg(min(keyL), max(keyL)).head()) else None
    readModifyWrite(root, "merge") { (base, r) =>
      // zone maps are keyed by the key's PHYSICAL name (identity unless
      // the column was renamed)
      val physKey = r.physName(keyCol)
      val (statted, unstatted) =
        r.files.partition(p => r.stats.get(p).exists(_.contains(physKey)))
      val touched: Vector[String] =
        if (!keyIsIntegral) r.files // no zone maps possible: rewrite all
        else if (kr.get.isNullAt(0)) Vector.empty // no non-null update keys: pure insert
        else {
          val krr = kr.get
          // coarse pass: zone maps intersecting the batch's [min, max]
          // span — cheap, but a single outlier insert key would widen the
          // span over the whole table, so refine each span candidate with
          // an EXACT hit test: one broadcast interval join of the update
          // keys against the candidates' [lo, hi] ranges (Delta's
          // file-matching join). A file is rewritten iff SOME update key
          // actually lands inside its range; `keyCol`-stats-free files
          // are conservatively always rewritten.
          val spanC = statted.filter { p =>
            val (lo, hi) = r.stats(p)(physKey)
            hi >= krr.getLong(0) && lo <= krr.getLong(1)
          }
          val hit: Set[String] =
            if (spanC.isEmpty) Set.empty
            else {
              val ranges = spark.createDataFrame(spanC.map { p =>
                val (lo, hi) = r.stats(p)(physKey); (p, lo, hi)
              }).toDF("_p", "_flo", "_fhi")
              updates.select(keyL.as("_k"))
                .join(org.apache.spark.sql.functions.broadcast(ranges),
                  col("_k") >= col("_flo") && col("_k") <= col("_fhi"))
                .select("_p").distinct().collect().map(_.getString(0)).toSet
            }
          unstatted ++ spanC.filter(hit)
        }
      val layout = layoutOf(root, r)
      if (touched.isEmpty)
          // no live file can hold a matched key: the merge is a pure
          // insert — ONE append commit, no rewrite, smallest manifest
          // (an append's files ARE its row-level delta, so no change
          // files are needed for the CDF to read through it)
          commit(spark, root, updates, Append,
            statsCols = Seq(keyCol), expectHead = Some(base),
            partitionBy = layout, op = Some("MERGE"))
        else {
          val untouched = {
            val t = touched.toSet
            r.entries.filterNot(e => t(e.path))
          }
          // read the touched files THROUGH the file index: the table's
          // recorded (union) schema backfills columns they lack — the
          // mergeSchema behavior, resolved from the log — and hive
          // partition values attach from the k=v dirs, so a merge on a
          // partitioned table round-trips the layout
          val old = TxLogFileIndex.read(spark, root, r.copy(entries =
            r.entries.filter(e => touched.contains(e.path))))
          val updKeys = updates.select(keyCol).distinct()
          val rewritten = old
            .join(updKeys, Seq(keyCol), "left_anti")
            .unionByName(updates, allowMissingColumns = true)
          // the merge KNOWS its row-level delta right here — persist it
          // under _change_data/ so changes() and the streaming source
          // survive the rewrite (Delta's CDF): pre/post images for
          // matched keys, inserts for the rest. Cost: one more pass over
          // the TOUCHED files only — proportional to the batch, and the
          // one moment the delta is computable at all
          val matched = old.join(updKeys, Seq(keyCol), "left_semi")
            .select(keyCol).distinct()
          val pre = old.join(matched, Seq(keyCol), "left_semi")
            .withColumn("_change_type", lit("update_preimage"))
          val post = updates.join(matched, Seq(keyCol), "left_semi")
            .withColumn("_change_type", lit("update_postimage"))
          val ins = updates.join(matched, Seq(keyCol), "left_anti")
            .withColumn("_change_type", lit("insert"))
          val cdfDir = s"txn-${java.util.UUID.randomUUID().toString.take(12)}"
          toPhysical(pre.unionByName(post, allowMissingColumns = true)
            .unionByName(ins, allowMissingColumns = true), r)
            .write.mode(SaveMode.ErrorIfExists)
            .parquet(s"$root/_change_data/$cdfDir")
          commit(spark, root, rewritten, Overwrite,
            statsCols = Seq(keyCol), carry = untouched,
            carrySchema = r.schema, expectHead = Some(base),
            cdf = Some(cdfDir), partitionBy = layout, op = Some("MERGE"))
        }
    }
  }

  /** OPTIMIZE: rewrite the current live set into `targetFiles` files —
    * the compaction a long-lived table needs once incremental appends
    * accumulate small files (footer reads + task-per-file scheduling
    * dominate scan cost at 100 TB; see Zones.compact for the raw-prefix
    * variant). With `sortCol`, rows are range-repartitioned on it first
    * so the rewritten files' zone maps become near-disjoint and a range
    * read's pruning approaches one-file-per-range — the OPTIMIZE ZORDER
    * story in one dimension (pass both range columns of a
    * [[graft.io.ZOrder]]-clustered layout via `statsCols` on a manual
    * commit for the 2-D case). Committed as one overwrite; data files
    * are immutable, so every pre-optimize snapshot keeps reading its own
    * files untouched (time travel across an OPTIMIZE is free, unlike an
    * in-place rewrite).
    */
  def optimize(
      spark: SparkSession,
      root: String,
      targetFiles: Int,
      sortCol: Option[String] = None): Long = {
    readModifyWrite(root, "optimize") { (base, r) =>
      require(r.entries.nonEmpty, s"txlog: optimize of $root found no files")
      val cur = TxLogFileIndex.read(spark, root, r)
      val laid = sortCol match {
        case Some(c) => cur.repartitionByRange(
          targetFiles, org.apache.spark.sql.functions.col(c))
        case None => cur.repartition(targetFiles)
      }
      // cdf = "": an optimize's row-level delta is EMPTY by
      // construction, so the change feed and the streaming source pass
      // through it instead of dying on "rewrite in range"
      commit(spark, root, laid, Overwrite,
        statsCols = sortCol.toSeq, expectHead = Some(base),
        cdf = Some(""), partitionBy = layoutOf(root, r),
        rebaseAppends = true, op = Some("OPTIMIZE"))
    }
  }

  /** Copy-on-write DELETE: remove the rows matching `predicate`,
    * rewriting ONLY the files that can contain one — candidates are
    * selected at PLAN time by running the predicate's optimized
    * conjuncts through the same zone-map + partition pruning an ordinary
    * scan uses, so a `lang = 'x'` or key-range delete (the GDPR shape)
    * touches its files, not the table. Untouched files carry by
    * reference. Rows where the predicate is NULL are KEPT (Delta/ANSI
    * DELETE semantics). The deleted rows persist as `delete`-typed
    * change rows, so `changes(withChangeType = true)` and a changeTypes
    * stream read straight through the rewrite. The predicate must be
    * deterministic — it is evaluated twice (keep-set and preimages).
    * Serializable read-modify-write like merge. Returns the committed
    * version, or the head untouched when no file can match.
    */
  def delete(
      spark: SparkSession,
      root: String,
      predicate: org.apache.spark.sql.Column,
      statsCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.{coalesce, not}
    readModifyWrite(root, "delete") { (base, r) =>
      val touched =
        if (r.entries.isEmpty) Vector.empty
        else candidateEntries(spark, root, r, predicate)
      if (touched.isEmpty) base // provably no matching row anywhere: no-op
      else {
        val untouched = {
          val t = touched.map(_.path).toSet
          r.entries.filterNot(e => t(e.path))
        }
        val old = TxLogFileIndex.read(spark, root, r.copy(entries = touched))
        // NULL predicate ⇒ not deleted: both branches coalesce to false
        val hit = coalesce(predicate, lit(false))
        val cdfDir = s"txn-${java.util.UUID.randomUUID().toString.take(12)}"
        toPhysical(old.filter(hit).withColumn("_change_type", lit("delete")), r)
          .write.mode(SaveMode.ErrorIfExists)
          .parquet(s"$root/_change_data/$cdfDir")
        commit(spark, root, old.filter(not(hit)), Overwrite,
          statsCols = statsCols, carry = untouched, carrySchema = r.schema,
          expectHead = Some(base), cdf = Some(cdfDir),
          partitionBy = layoutOf(root, r), op = Some("DELETE"))
      }
    }
  }

  /** Merge-on-read DELETE via deletion vectors: instead of rewriting
    * every file that holds a matching row ([[delete]]'s copy-on-write,
    * O(touched data)), write only the matched rows' PHYSICAL POSITIONS
    * — `(file, row_index)` pairs under `_dv/` — and re-reference every
    * data file untouched, the matched ones with a deletion-vector ref
    * appended to their manifest entry. Readers subtract the positions
    * with one broadcast anti-join above the scan (Delta's deletion
    * vectors / Iceberg's positional deletes). Commit cost is O(matched
    * rows): deleting 0.1% of a 100 TB table writes megabytes, not the
    * terabytes copy-on-write would — the difference between a routine
    * GDPR pass and a weekend job. The trade is read-side: each read pays
    * the (broadcast, position-only) anti-join until a rewrite op
    * (compact / optimize / merge touching the file) materializes the
    * deletes — rewrites read through the DV-applied view, so their
    * output files drop the refs naturally and carried files keep theirs.
    *
    * Positions come from the scan's `_metadata.row_index` (physical row
    * position, stable because data files are immutable), computed over
    * the CURRENT DV-applied view so a twice-deleted row is neither
    * re-reported to the change feed nor double-counted. Plan-time
    * pruning bounds the scan to candidate files exactly as [[delete]]'s.
    * Deleted rows persist to `_change_data/` tagged `delete`, so the
    * typed CDF reads through this commit identically to a copy-on-write
    * delete. Zone maps and blooms of a DV-bearing file stay valid
    * (conservative: they may keep a file whose matches are all deleted —
    * never the reverse). NULL predicate rows are not deleted (SQL
    * DELETE semantics).
    */
  def deleteVectors(
      spark: SparkSession,
      root: String,
      predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{broadcast, coalesce}
    readModifyWrite(root, "deleteVectors") { (base, r) =>
      val touched =
        if (r.entries.isEmpty) Vector.empty
        else candidateEntries(spark, root, r, predicate)
      if (touched.isEmpty) base // provably no matching row anywhere: no-op
      else {
        val tagged = TxLogFileIndex.readTagged(spark, root,
          r.copy(entries = touched))
        val hit = coalesce(predicate, lit(false))
        val matched = tagged.filter(hit)
        // the positions, keyed by the file's manifest path — resolved by
        // EXACT txn-tail equality against the candidate entry list
        // (relative, external, and URI forms all share the tail; a
        // suffix test could alias under a tail collision, which
        // readTagged refuses loudly), written as one compact dir
        val paths = spark.createDataFrame(touched.map(e =>
          (e.path, TxLogFileIndex.pathTail(e.path)))).toDF("p", "tail")
        val dvDir = s"_dv/txn-${java.util.UUID.randomUUID().toString.take(12)}"
        // position writes parallelize BY FILE, task count bounded — a
        // billion-row GDPR pass must not funnel its whole vector through
        // one writer (readers read the dir as a unit either way)
        matched
          .select(TxLogFileIndex.pathTailCol(col(TxLogFileIndex.FpCol))
            .as("ftail"), col(TxLogFileIndex.PosCol).as("pos"))
          .join(broadcast(paths), col("ftail") === col("tail"))
          .select("p", "pos")
          .repartition(math.max(1, math.min(64, touched.size)), col("p"))
          .write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$dvDir")
        // which files actually hold a match (and how many rows): read
        // the (tiny) vector back — the per-file deleted counts keep
        // metadata-only COUNT(*) exact (see rowCount)
        val dvCounts: Map[String, Long] = spark.read.parquet(s"$root/$dvDir")
          .groupBy("p").count().collect()
          .map(r0 => r0.getString(0) -> r0.getLong(1)).toMap
        if (dvCounts.isEmpty) {
          // no row matched: a clean no-op — remove the empty vector dir
          // rather than leaving vacuum-bait residue, and write no change
          // data at all (the delta is empty by construction)
          deleteDirRecursive(s"$root/$dvDir")
          base
        } else {
          // the delta is provably non-empty: NOW persist it for the CDF
          val cdfDir = s"txn-${java.util.UUID.randomUUID().toString.take(12)}"
          toPhysical(matched.drop(TxLogFileIndex.FpCol, TxLogFileIndex.PosCol)
            .withColumn("_change_type", lit("delete")), r)
            .write.mode(SaveMode.ErrorIfExists)
            .parquet(s"$root/_change_data/$cdfDir")
          val entries = r.entries.map(e => dvCounts.get(e.path) match {
            case Some(n) => e.copy(dvs = e.dvs :+ dvDir, dvRows = e.dvRows + n)
            case None    => e
          })
          // record the vector's byte size in the manifest, so readers
          // size the broadcast-vs-shuffle decision from the log alone
          val dvSize = store(root).walk(s"$root/$dvDir").iterator
            .map(_.size).sum
          publish(root, entries.map(renderEntry), Overwrite, txnId = None,
            recorded = r.schema, expectHead = Some(base),
            txn = java.util.UUID.randomUUID().toString.take(12),
            cdf = Some(cdfDir), partitionBy = layoutOf(root, r),
            op = Some("DELETE VECTORS"), dvb = Map(dvDir -> dvSize),
            touched = dvCounts.keySet,
            rebaseDvTouched = Some(dvCounts.keySet))
        }
      }
    }
  }

  /** Merge-on-read UPDATE: the old row images become deletion-vector
    * positions (no data file rewritten) and the post-images land as ONE
    * appended file in the same commit — write cost O(matched rows),
    * where [[update]]'s copy-on-write rewrites every row of every
    * touched file. Same SQL semantics as [[update]]: every SET
    * right-hand side evaluates against the OLD row (`SET a = b, b = a`
    * swaps), a NULL predicate leaves the row untouched, assignments must
    * target existing columns. Pre/post images persist to the typed
    * change feed identically to the copy-on-write path; CHECK
    * constraints validate the post-images (the commit's read-back covers
    * exactly the new rows); updating a hive partition column re-lands
    * each post-image row in its new k=v dir. Matched-position
    * bookkeeping is [[deleteVectors]]'s, so composition, rewrite
    * materialization, vacuum lifetime, and clone resolution all hold.
    */
  def updateVectors(
      spark: SparkSession,
      root: String,
      predicate: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column],
      statsCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.{broadcast, coalesce}
    require(set.nonEmpty, "txlog: UPDATE needs at least one SET assignment")
    readModifyWrite(root, "updateVectors") { (base, r) =>
      val touched =
        if (r.entries.isEmpty) Vector.empty
        else candidateEntries(spark, root, r, predicate)
      if (touched.isEmpty) base // provably no matching row anywhere: no-op
      else {
        val tagged = TxLogFileIndex.readTagged(spark, root,
          r.copy(entries = touched))
        val dataCols = tagged.columns.filterNot(c =>
          c == TxLogFileIndex.FpCol || c == TxLogFileIndex.PosCol).toSeq
        val unknown = set.keySet -- dataCols.toSet
        require(unknown.isEmpty,
          s"txlog: UPDATE SET targets unknown columns ${unknown.mkString(", ")}")
        val matched = tagged.filter(coalesce(predicate, lit(false)))
        // only matched rows are rewritten, so every RHS reads the old
        // row directly — no hit-flag gymnastics needed here
        val post = matched.select(dataCols.map(c =>
          set.get(c).map(_.as(c)).getOrElse(col(c))): _*)
        // positions first (exact txn-tail identity, see deleteVectors);
        // the change images land only once a match is proven, so a
        // no-match update leaves no residue behind
        val paths = spark.createDataFrame(touched.map(e =>
          (e.path, TxLogFileIndex.pathTail(e.path)))).toDF("p", "tail")
        val dvDir = s"_dv/txn-${java.util.UUID.randomUUID().toString.take(12)}"
        matched
          .select(TxLogFileIndex.pathTailCol(col(TxLogFileIndex.FpCol))
            .as("ftail"), col(TxLogFileIndex.PosCol).as("pos"))
          .join(broadcast(paths), col("ftail") === col("tail"))
          .select("p", "pos")
          .repartition(math.max(1, math.min(64, touched.size)), col("p"))
          .write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$dvDir")
        val dvCounts: Map[String, Long] = spark.read.parquet(s"$root/$dvDir")
          .groupBy("p").count().collect()
          .map(r0 => r0.getString(0) -> r0.getLong(1)).toMap
        if (dvCounts.isEmpty) {
          deleteDirRecursive(s"$root/$dvDir") // clean no-op, no residue
          base
        } else {
          val cdfDir = s"txn-${java.util.UUID.randomUUID().toString.take(12)}"
          toPhysical(matched.select(dataCols.map(col): _*)
            .withColumn("_change_type", lit("update_preimage"))
            .unionByName(post.withColumn("_change_type", lit("update_postimage"))), r)
            .write.mode(SaveMode.ErrorIfExists)
            .parquet(s"$root/_change_data/$cdfDir")
          val carried = r.entries.map(e => dvCounts.get(e.path) match {
            case Some(n) => e.copy(dvs = e.dvs :+ dvDir, dvRows = e.dvRows + n)
            case None    => e
          })
          val dvSize = store(root).walk(s"$root/$dvDir").iterator
            .map(_.size).sum
          commit(spark, root, post, Overwrite,
            statsCols = statsCols, carry = carried, carrySchema = r.schema,
            expectHead = Some(base), cdf = Some(cdfDir),
            partitionBy = layoutOf(root, r), op = Some("UPDATE VECTORS"),
            dvb = Map(dvDir -> dvSize), touched = dvCounts.keySet,
            rebaseDvTouched = Some(dvCounts.keySet))
        }
      }
    }
  }

  /** Driver-side recursive delete of a small abandoned side dir (an
    * empty deletion vector after a no-match DML) — bounded by the dir's
    * own file count, best-effort (anything left is ordinary vacuumable
    * residue, so a failure here costs nothing).
    */
  private def deleteDirRecursive(dir: String): Unit =
    try {
      val s = LogStore.forRoot(dir)
      if (s.isDir(dir)) {
        s.walk(dir).foreach(f =>
          try s.delete(s"$dir/${f.relPath}") catch { case scala.util.control.NonFatal(_) => () })
        (s.walkDirs(dir).map(r => s"$dir/$r") :+ dir)
          .sortBy(-_.count(_ == '/'))
          .foreach(d => try s.delete(d) catch { case scala.util.control.NonFatal(_) => () })
        // and the now-maybe-empty parent (`_dv`/`_change_data`) — delete
        // refuses a non-empty dir, so this is safe — keeping a no-op DML
        // from leaving any trace in the table tree
        val cut = dir.lastIndexOf('/')
        if (cut > 0) {
          val parent = dir.substring(0, cut)
          try s.delete(parent) catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  private def splitAnds(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitAnds(l) ++ splitAnds(r)
    case other => Seq(other)
  }

  /** Plan-time candidate selection for predicate-driven rewrites
    * (delete/update): run the predicate's optimized conjuncts through
    * the snapshot's own index pruning — zone maps AND partition dirs —
    * with zero jobs and zero footer reads, returning the entries that
    * could hold a matching row.
    */
  private def candidateEntries(
      spark: SparkSession,
      root: String,
      r: Replay,
      predicate: org.apache.spark.sql.Column): Vector[Entry] = {
    // a live set spanning partition-layout GENERATIONS (mid-evolution)
    // reads as a union of scans — plan-time pruning below assumes one
    // index, so fall back to "every file is a candidate" (conservative,
    // correct; the state is transitional until a compact migrates it)
    if (r.entries.map(e => TxLogFileIndex.layoutOfPath(e.path)).distinct.size > 1)
      return r.entries
    val snap = TxLogFileIndex.read(spark, root, r)
    val index = TxLogFileIndex.of(snap)
    val conjuncts = snap.filter(predicate).queryExecution.optimizedPlan
      .collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          splitAnds(f.condition)
      }.flatten
    val partCols = index.partitionSchema.fieldNames.toSet
    val (pf, df) = conjuncts.partition(e =>
      e.references.nonEmpty && e.references.forall(a => partCols(a.name)))
    index.listFiles(pf, df)
    val kept = index.lastListed.toSet
    r.entries.filter(e =>
      kept(TxLogFileIndex.canonKey(absPath(root, e.path))))
  }

  /** Copy-on-write UPDATE: apply the SET assignments to the rows
    * matching `predicate`, rewriting only the files that can contain a
    * match (same plan-time candidate selection as [[delete]]). SQL
    * UPDATE semantics throughout: every SET right-hand side evaluates
    * against the OLD row (so `SET a = b, b = a` swaps), a NULL predicate
    * leaves the row untouched, and assignments must target existing
    * columns (evolution goes through merge). Pre/post images persist as
    * change rows, so the typed CDF reads through the rewrite. Rows of a
    * touched file that don't match are rewritten verbatim. Updating a
    * hive partition column is fine — the rewrite re-lands each row in
    * its new k=v dir. Returns the committed version, or the head
    * untouched when no file can match.
    */
  def update(
      spark: SparkSession,
      root: String,
      predicate: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column],
      statsCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.{coalesce, when}
    require(set.nonEmpty, "txlog: UPDATE needs at least one SET assignment")
    readModifyWrite(root, "update") { (base, r) =>
      val touched =
        if (r.entries.isEmpty) Vector.empty
        else candidateEntries(spark, root, r, predicate)
      if (touched.isEmpty) base // provably no matching row anywhere: no-op
      else {
        val untouched = {
          val t = touched.map(_.path).toSet
          r.entries.filterNot(e => t(e.path))
        }
        val old = TxLogFileIndex.read(spark, root, r.copy(entries = touched))
        val unknown = set.keySet -- old.columns.toSet
        require(unknown.isEmpty,
          s"txlog: UPDATE SET targets unknown columns ${unknown.mkString(", ")}")
        // materialize the hit flag FIRST so every assignment and both
        // change images evaluate against the old row, even when the
        // predicate or a RHS references a column another assignment changes
        val flagged = old.withColumn("__hit", coalesce(predicate, lit(false)))
        val newCols = old.columns.toSeq.map(c => set.get(c)
          .map(e => when(col("__hit"), e).otherwise(col(c)).as(c))
          .getOrElse(col(c)))
        val cdfDir = s"txn-${java.util.UUID.randomUUID().toString.take(12)}"
        toPhysical(flagged.filter(col("__hit")).drop("__hit")
          .withColumn("_change_type", lit("update_preimage"))
          .unionByName(flagged.filter(col("__hit")).select(newCols: _*)
            .withColumn("_change_type", lit("update_postimage"))), r)
          .write.mode(SaveMode.ErrorIfExists)
          .parquet(s"$root/_change_data/$cdfDir")
        commit(spark, root, flagged.select(newCols: _*), Overwrite,
          statsCols = statsCols, carry = untouched, carrySchema = r.schema,
          expectHead = Some(base), cdf = Some(cdfDir),
          partitionBy = layoutOf(root, r), op = Some("UPDATE"))
      }
    }
  }

  /** OPTIMIZE ZORDER: rewrite the live set clustered along the Morton
    * curve of TWO columns, committing per-file zone maps on both — each
    * file then covers a small rectangle of the (a, b) plane, so range
    * predicates on EITHER column prune (a 1-D sort makes the second
    * column's zone maps useless; see [[graft.io.ZOrder]]). The Delta
    * `OPTIMIZE ... ZORDER BY (a, b)` command as a first-class API; q642
    * proves the pruning shape on a manually laid-out commit, this makes
    * the layout a one-call maintenance op. Empty-delta (cdf = "") like
    * optimize, so subscribers read through it.
    */
  def optimizeZOrder(
      spark: SparkSession,
      root: String,
      targetFiles: Int,
      colA: String,
      colB: String,
      bits: Int = 8): Long =
    readModifyWrite(root, "optimizeZOrder") { (base, r) =>
      require(r.entries.nonEmpty, s"txlog: optimize of $root found no files")
      val cur = TxLogFileIndex.read(spark, root, r)
      val zv = ZOrder.zvalue(cur, colA, colB, bits)
      val laid = cur.repartitionByRange(targetFiles, zv).sortWithinPartitions(zv)
      commit(spark, root, laid, Overwrite,
        statsCols = Seq(colA, colB), expectHead = Some(base),
        cdf = Some(""), partitionBy = layoutOf(root, r),
        rebaseAppends = true, op = Some("OPTIMIZE ZORDER"),
        cluster = Some(Seq(colA, colB)))
    }

  /** File-selective compaction: rewrite ONLY the live files smaller than
    * `smallBytes`, carrying every full-size file (and its zone maps) by
    * reference — [[merge]]'s carry mechanism pointed at the small-file
    * backlog. [[optimize]] stays the full re-layout (global re-sort /
    * re-cluster); this is the routine maintenance op, because at 100 TB
    * an all-table rewrite is an O(table) write nobody schedules, while
    * compaction cost must be proportional to the backlog the appends
    * actually created. Entries without a manifest-carried size are
    * conservatively treated as small (legacy chains). Content-preserving,
    * so the commit carries an empty change-data marker and the CDF reads
    * straight through it. Serializable read-modify-write like merge and
    * optimize. Returns the committed version — or the current head,
    * untouched, when fewer than two files qualify.
    */
  /** Incremental clustered compaction: [[compact]]'s file-selectivity
    * composed with [[optimizeZOrder]]'s layout — ONLY the small-file
    * backlog rewrites, laid out along the Morton curve of `(colA, colB)`
    * with fresh 2-D zone maps, while every full-size file (typically the
    * output of earlier clustered compactions, zone maps intact) is
    * carried by reference. This is the maintenance loop a continuously
    * ingested 100 TB table actually runs: a full OPTIMIZE ZORDER is an
    * O(table) rewrite nobody schedules, while the append backlog must
    * keep joining the clustered layout incrementally (the gap Delta's
    * liquid clustering exists to close; this is that idea at txlog
    * size). Each incremental pass covers only its backlog's value range
    * — global clustering quality converges over passes rather than being
    * perfect per pass, the documented trade. Serializable
    * read-modify-write; content-preserving (`cdf = ""`), so change-feed
    * subscribers read straight through it. Returns the committed
    * version, or the head untouched when fewer than two files qualify.
    */
  def compactZOrder(
      spark: SparkSession,
      root: String,
      colA: String,
      colB: String,
      smallBytes: Long = 64L * 1024 * 1024,
      bits: Int = 8,
      statsCols: Seq[String] = Nil): Long =
    readModifyWrite(root, "compactZOrder") { (base, r) =>
      val (small, big) = r.entries.partition(_.bytes.forall(_ < smallBytes))
      if (small.size <= 1) base // nothing worth rewriting: no-op
      else {
        val totalSmall = math.max(small.flatMap(_.bytes).sum, 1L)
        val nOut = math.max(1L, (totalSmall + smallBytes - 1) / smallBytes).toInt
        val backlog = TxLogFileIndex.read(spark, root, r.copy(entries = small))
        val zv = ZOrder.zvalue(backlog, colA, colB, bits)
        commit(spark, root,
          backlog.repartitionByRange(nOut, zv).sortWithinPartitions(zv),
          // the cluster keys always get zone maps; extra statsCols (e.g.
          // maintain's ledger-derived set) survive the rewrite too, so
          // routine maintenance never REGRESSES data skipping on a
          // non-key column the live files already carried stats for
          Overwrite, statsCols = (Seq(colA, colB) ++ statsCols).distinct,
          carry = big,
          carrySchema = r.schema, expectHead = Some(base), cdf = Some(""),
          partitionBy = layoutOf(root, r), rebaseAppends = true,
          op = Some("COMPACT ZORDER"),
          // every clustered pass records its keys, so the maintenance
          // loop is self-describing from then on (see clusterKeysOf)
          cluster = Some(Seq(colA, colB)))
      }
    }

  /** Declare (or CHANGE) the table's clustering keys — ONE metadata
    * commit, no rewrite (the liquid-clustering idea: the key is table
    * metadata, not a property baked into every file). Already-clustered
    * files keep their old-key zone maps — which keep pruning old-key
    * predicates exactly as before — while every subsequent keyless
    * [[compactZOrder]] pass clusters the ingest backlog by the NEW keys,
    * so the layout converges generation by generation without the
    * O(table) rewrite a key change classically costs.
    */
  def setClusterKeys(root: String, cols: Seq[String]): Long = {
    require(cols.size == 2,
      s"txlog: clustering is 2-D (Morton curve) — got ${cols.size} keys")
    readModifyWrite(root, "setClusterKeys") { (base, r) =>
      publish(root, r.entries.map(renderEntry), Overwrite, txnId = None,
        recorded = r.schema, expectHead = Some(base),
        txn = java.util.UUID.randomUUID().toString.take(12),
        cdf = Some(""), partitionBy = layoutOf(root, r),
        op = Some("SET CLUSTER"), cluster = Some(cols))
    }
  }

  /** The table's recorded clustering keys (empty when never declared). */
  def clusterKeysOf(root: String): Seq[String] =
    if (headVersion(root) == 0L) Nil
    else replay(root, headVersion(root)).clusterBy

  /** Keyless incremental clustered compaction: the keys come from the
    * LOG (recorded by [[setClusterKeys]] or a previous keyed pass), so
    * the routine maintenance job needs zero configuration and
    * automatically follows a key change.
    */
  def compactZOrder(
      spark: SparkSession,
      root: String,
      smallBytes: Long): Long = {
    val keys = clusterKeysOf(root)
    require(keys.size == 2,
      s"txlog: $root has no recorded clustering keys — declare them with " +
        "setClusterKeys or run a keyed compactZOrder/optimizeZOrder once")
    compactZOrder(spark, root, keys.head, keys(1), smallBytes)
  }

  def compactZOrder(spark: SparkSession, root: String): Long =
    compactZOrder(spark, root, 64L * 1024 * 1024)

  /** DV PURGE: rewrite ONLY the files whose deleted fraction
    * `dvRows / rows` exceeds `threshold`, materializing their deletion
    * vectors; every other file — including lightly-deleted ones — is
    * carried by reference, refs intact. This is the maintenance op the
    * merge-on-read trade requires: a large file that is 90% deleted
    * never qualifies for the small-file COMPACT backlog, so without a
    * deleted-fraction selector it pays its read-side anti-join forever.
    * Cost is O(selected live rows); a file with unknown row counts but
    * live DV refs is conservatively selected. Content-preserving
    * (`cdf = ""`) and append-rebase-safe like compact, so it survives
    * racing ingest without recompute. Returns the committed version, or
    * the head untouched when nothing crosses the threshold.
    */
  def purge(
      spark: SparkSession,
      root: String,
      threshold: Double = 0.3,
      statsCols: Seq[String] = Nil,
      targetBytes: Long = 64L * 1024 * 1024): Long =
    readModifyWrite(root, "purge") { (base, r) =>
      val (hot, cold) = r.entries.partition(e => e.dvs.nonEmpty &&
        (e.rows match {
          case Some(n) if n > 0L => e.dvRows.toDouble / n > threshold
          case _                 => true // unknown counts + live refs: rewrite
        }))
      if (hot.isEmpty) base
      else {
        // read the selected files DV-APPLIED (the index subtracts the
        // positions), sized to the surviving fraction
        val liveBytes = hot.iterator.map { e =>
          val b = e.bytes.getOrElse(targetBytes)
          e.rows match {
            case Some(n) if n > 0L => (b * (n - e.dvRows).toDouble / n).toLong
            case _                 => b
          }
        }.sum
        val nOut = math.max(1L, (liveBytes + targetBytes - 1) / targetBytes).toInt
        val rewritten = TxLogFileIndex
          .read(spark, root, r.copy(entries = hot))
          .repartition(nOut)
        commit(spark, root, rewritten, Overwrite,
          statsCols = statsCols, carry = cold, carrySchema = r.schema,
          expectHead = Some(base), cdf = Some(""),
          partitionBy = layoutOf(root, r), rebaseAppends = true,
          op = Some("PURGE"))
      }
    }

  def compact(
      spark: SparkSession,
      root: String,
      smallBytes: Long = 64L * 1024 * 1024,
      statsCols: Seq[String] = Nil): Long =
    readModifyWrite(root, "compact") { (base, r) =>
      val (small, big) = r.entries.partition(_.bytes.forall(_ < smallBytes))
      if (small.size <= 1) base // nothing worth rewriting: no-op
      else {
        val totalSmall = math.max(small.flatMap(_.bytes).sum, 1L)
        val nOut = math.max(1L, (totalSmall + smallBytes - 1) / smallBytes).toInt
        // index-read of JUST the small entries: the recorded union schema
        // backfills evolved columns and partition values attach, so a
        // compaction of a partitioned table round-trips the layout
        val rewritten = TxLogFileIndex
          .read(spark, root, r.copy(entries = small))
          .repartition(nOut)
        commit(spark, root, rewritten, Overwrite,
          statsCols = statsCols, carry = big, carrySchema = r.schema,
          expectHead = Some(base), cdf = Some(""),
          partitionBy = layoutOf(root, r), rebaseAppends = true,
          op = Some("COMPACT"))
      }
    }

  /** Logical stats columns worth preserving across a maintenance
    * rewrite, FROM THE LOG: the distinct zone-map keys the live entries
    * already carry (physical), mapped back to logical names and
    * filtered to the current schema — so [[maintain]]'s rewrites keep
    * the data-skipping the original commits paid for, without the
    * caller re-declaring anything.
    */
  private def ledgerStatsCols(r: Replay): Seq[String] = {
    val inv = r.colMap.map(_.swap) // physical → logical
    r.entries.iterator
      .flatMap(e => e.stats.keysIterator ++ e.strStats.keysIterator)
      .toSeq.distinct
      .map(p => inv.getOrElse(p, p))
      .filter(c => r.schema.forall(_.fieldNames.contains(c)))
  }

  /** ONE-CALL maintenance policy, decided entirely from the LOG's own
    * ledger (manifest file sizes, per-file row/deleted counts, recorded
    * clustering keys) — zero data reads to DECIDE, data jobs only for
    * the rewrites it actually chooses. In dependency order:
    *
    *  1. [[purge]] when any live file's deleted fraction crosses
    *     `dvThreshold` — materializing heavy deletion vectors FIRST so
    *     the compaction below never re-carries their positions;
    *  2. [[compactZOrder]] through the log-recorded clustering keys
    *     when the table has them and ≥ 2 small files exist (a plain
    *     compact would destroy the clustering a prior zorder paid
    *     for); plain [[compact]] otherwise;
    *  3. [[vacuum]] retaining the last `retainVersions` snapshots.
    *
    * Stats columns for the rewrites come from the ledger too
    * ([[ledgerStatsCols]]): whatever zone maps the live files already
    * carry survive the rewrite. Returns the (op, result) pairs actually
    * performed; a healthy table is all-skips and ZERO Spark jobs, so
    * the operator's whole maintenance loop is `TxLog.maintain(spark,
    * root)` on a schedule — Delta's OPTIMIZE + VACUUM cron in one call.
    */
  def maintain(
      spark: SparkSession,
      root: String,
      smallBytes: Long = 64L * 1024 * 1024,
      dvThreshold: Double = 0.3,
      retainVersions: Long = 10L,
      inflightGraceMs: Long = 24L * 3600 * 1000): Seq[(String, Long)] = {
    val head0 = headVersion(root)
    if (head0 == 0L) return Nil
    val out = Seq.newBuilder[(String, Long)]
    val r0 = replay(root, head0)
    val needsPurge = r0.entries.exists(e => e.dvs.nonEmpty && (e.rows match {
      case Some(n) if n > 0L => e.dvRows.toDouble / n > dvThreshold
      case _                 => true // unknown counts + live refs: rewrite
    }))
    if (needsPurge)
      out += ("PURGE" -> purge(spark, root, dvThreshold,
        statsCols = ledgerStatsCols(r0), targetBytes = smallBytes))
    // re-resolve: the purge may have rewritten (or folded) entries
    val r1 = replay(root, headVersion(root))
    if (r1.entries.count(_.bytes.forall(_ < smallBytes)) >= 2) {
      val keys = r1.clusterBy
      if (keys.size == 2)
        out += ("ZORDER" -> compactZOrder(spark, root, keys.head, keys(1),
          smallBytes, statsCols = ledgerStatsCols(r1)))
      else
        out += ("COMPACT" -> compact(spark, root, smallBytes,
          statsCols = ledgerStatsCols(r1)))
    }
    val horizon = math.max(1L, headVersion(root) - retainVersions + 1)
    val reclaimed = vacuum(root, retainFrom = horizon,
      inflightGraceMs = inflightGraceMs)
    if (reclaimed > 0) out += ("VACUUM" -> reclaimed.toLong)
    out.result()
  }

  /** Snapshot read: the table as of `version` (head when None). The file
    * list is resolved ONCE here; later commits only add files this list
    * never mentions, so the returned DataFrame is a consistent snapshot no
    * matter when (or how often) it is executed.
    *
    * The read goes through [[TxLogFileIndex]], so any pushed-down range/
    * equality predicate on a zone-mapped column prunes files at PLAN time
    * — `snapshot(...).filter($"d".between(31, 58))` opens only the files
    * whose manifest stats can match, without the caller knowing a
    * special range API exists (the way Delta/Iceberg surface data
    * skipping). Schema: the union of all live files' schemas (parquet
    * mergeSchema), so additive evolution reads with nulls backfilled and
    * time travel below the evolution sees only the old columns.
    */
  def snapshot(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(headVersion(root))
    val r = replay(root, v)
    require(r.files.nonEmpty, s"txlog: snapshot v$v of $root lists no files")
    TxLogFileIndex.read(spark, root, r)
  }

  /** Range read with data skipping — [[snapshot]] + a between filter.
    * Kept as an explicit API for callers that want the pruning stated in
    * the code (and for pre-round-8 call sites); the plain snapshot path
    * now prunes identically through [[TxLogFileIndex]]. The residual
    * filter still applies (zone maps prune files, they don't evaluate
    * predicates); files committed WITHOUT `col` stats are conservatively
    * always read.
    *
    * The filter column is cast to long FIRST — the legacy contract: a
    * non-integral column truncates toward zero before the bound check
    * (a double 58.9 is kept by between(31, 58)). Pruning is unaffected:
    * zone maps exist only for integral columns, where the upcast is
    * value-preserving and [[TxLogFileIndex.mayMatch]] unwraps it.
    */
  def snapshotRange(
      spark: SparkSession,
      root: String,
      col: String,
      lo: Long,
      hi: Long,
      version: Option[Long] = None): DataFrame =
    snapshot(spark, root, version)
      .filter(org.apache.spark.sql.functions.col(col).cast("long").between(lo, hi))

  /** The file list a `[lo, hi]` range read of `col` opens — exposed so
    * specs can assert the PRUNING, not just the result.
    */
  def prunedFiles(root: String, v: Long, col: String, lo: Long, hi: Long): Seq[String] = {
    val r = replay(root, v)
    r.files.filter { p =>
      r.stats.get(p).flatMap(_.get(col)) match {
        case Some((flo, fhi)) => fhi >= lo && flo <= hi
        case None             => true // no zone map for col: cannot skip
      }
    }.map(p => absPath(root, p))
  }

  /** Change-data-feed read: the row-level delta between `from`
    * (exclusive) and `to` (inclusive), each row tagged with the
    * `_commit_version` that landed it — the incremental-consumer
    * subscription surface (`snapshot(to) ≡ snapshot(from) ∪
    * changes(from, to)` for an append-only range; TxLogSpec proves it,
    * and TxLogCdfSpec proves the typed equivalent ACROSS a merge).
    *
    * Rewrite commits in range, by kind:
    *   - empty-delta rewrites (optimize/compact mark `"cdf":""`):
    *     contribute nothing and the read passes through — a compaction
    *     must never kill a subscriber;
    *   - merges persist their delta under `_change_data/` at commit time
    *     (the one moment it is computable); with `withChangeType = true`
    *     those rows flow tagged `update_preimage` / `update_postimage` /
    *     `insert` (appends tag `insert`), Delta's CDF row types;
    *   - rewrites with NO recorded delta (plain overwrite, restore,
    *     legacy manifests) refuse unless `skipRewrites` (Delta's
    *     skipChangeCommits: the subscriber knowingly misses them), since
    *     silently returning rewritten files would double-count.
    * A merge in range without `withChangeType` also refuses — its delta
    * includes updates a plain "appended rows" reader would misapply.
    *
    * Cost: the manifests in (from, to] plus ONLY the appended/change
    * files — independent of table size, which is what makes a 100 TB
    * table subscribable.
    */
  def changes(
      spark: SparkSession,
      root: String,
      from: Long,
      to: Long,
      skipRewrites: Boolean = false,
      withChangeType: Boolean = false): DataFrame = {
    require(from <= to, s"txlog: changes range v$from..v$to is inverted")
    val head = headVersion(root)
    require(to <= head, s"txlog: changes upper bound v$to exceeds head v$head")
    import scala.jdk.CollectionConverters._
    val perVersion: Seq[(Long, Seq[String])] = ((from + 1) to to).flatMap { v =>
      val txt = readLogFile(root, f"v$v%08d.json")
      val action = actionField.findFirstMatchIn(txt).map(_.group(1))
        .getOrElse(throw new java.io.IOException(s"txlog: bad manifest v$v"))
      if (action == Append.name) Some(v -> parseEntries(txt).map(_.path))
      else (cdfField.findFirstMatchIn(txt).map(_.group(1)), skipRewrites) match {
        case (Some(""), _) => None // content-preserving rewrite: empty delta
        case (_, true)     => None // subscriber opted out of rewrite effects
        case (Some(dir), _) if withChangeType =>
          val fs = store(root).list(s"$root/_change_data/$dir")
            .filter(_.endsWith(".parquet"))
            .map(n => s"_change_data/$dir/$n")
          Some(v -> fs)
        case (Some(_), _) => throw new IllegalArgumentException(
          s"txlog: changes(v$from, v$to) crosses a $action at v$v that " +
            "persisted change data — read it with withChangeType = true " +
            "(or skipRewrites = true to ignore it)")
        case (None, _) => throw new IllegalArgumentException(
          s"txlog: changes(v$from, v$to) crosses a $action at v$v — " +
            "row-level deltas don't exist across a rewrite; diff snapshots instead")
      }
    }
    val nonEmpty = perVersion.filter(_._2.nonEmpty)
    val tagged =
      if (nonEmpty.isEmpty) // empty range: the table's schema + tags, zero rows
        snapshot(spark, root, Some(to)).filter(lit(false))
          .withColumn("_commit_version", lit(from))
      else {
        // ONE scan over all appended/change files, the version derived
        // map-side from each file's txn-dir component (every commit and
        // every change set writes under its own uuid dir) — a per-version
        // read unioned N times would bloat the plan linearly with the
        // catch-up range
        import org.apache.spark.sql.functions.{coalesce, element_at, regexp_extract, when}
        val all = nonEmpty.flatMap(_._2).map(f => s"$root/$f")
        val dirToV = nonEmpty.flatMap { case (v, fs) =>
          fs.map(f => f.split("/")(1) -> v)
        }.distinct
        val mapCol = org.apache.spark.sql.functions.map(
          dirToV.flatMap { case (d, v) => Seq(lit(d), lit(v)) }: _*)
        val scanned = spark.read.option("mergeSchema", "true").parquet(all: _*)
          .withColumn("_commit_version",
            element_at(mapCol, regexp_extract(input_file_name(), "/(txn-[^/]+)/", 1)))
        // hive-partitioned tables keep partition values in k=v DIRS, not
        // in the leaf files this one-scan read lists — re-derive them
        // from the path (change files carry the full row, so coalesce)
        val rp = replay(root, to)
        val withParts = rp.partitionBy.getOrElse(Nil).foldLeft(scanned) { (df, c) =>
          val dt = rp.schema.flatMap(_.fields.find(_.name == c))
            .map(_.dataType)
            .getOrElse(org.apache.spark.sql.types.StringType)
          // the k=v DIRECTORIES carry the PHYSICAL name (a renamed
          // partition column's declaration is logical, its dirs are
          // not) — extract physical, create the column physical, and
          // let the mapped-table select below surface it logical
          val physC = rp.colMap.getOrElse(c, c)
          val raw = regexp_extract(input_file_name(),
            "/" + java.util.regex.Pattern.quote(physC) + "=([^/]+)/", 1)
          val typed = when(raw === "", lit(null)).otherwise(raw).cast(dt)
          if (df.columns.contains(physC))
            df.withColumn(physC, coalesce(col(physC), typed))
          else df.withColumn(physC, typed)
        }
        // mapped tables' data + change files carry PHYSICAL names —
        // surface the logical schema as of `to` (a pre-rename file's
        // column flows out under its post-rename name, Delta's CDF
        // column-mapping behavior)
        val inv = rp.colMap.map(_.swap)
        if (inv.isEmpty) withParts
        else withParts.select(withParts.columns.toSeq.map(c =>
          col(c).as(inv.getOrElse(c, c))): _*)
      }
    if (!withChangeType) tagged
    else {
      // append files carry no _change_type column: they ARE inserts
      val typed =
        if (tagged.columns.contains("_change_type"))
          tagged.withColumn("_change_type",
            org.apache.spark.sql.functions.coalesce(
              col("_change_type"), lit("insert")))
        else tagged.withColumn("_change_type", lit("insert"))
      // pin the tag columns last, data columns in table order first
      val dataCols = typed.columns.toSeq
        .filterNot(c => c == "_change_type" || c == "_commit_version")
      typed.select((dataCols.map(col) :+ col("_change_type") :+
        col("_commit_version")): _*)
    }
  }

  /** Commit history as a DataFrame — the audit surface (DESCRIBE HISTORY). */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    versions(root).map { v =>
      val m = readManifest(root, v)
      (m.version, m.action, m.op.getOrElse(m.action.toUpperCase),
        m.files.size.toLong, m.ts.getOrElse(0L))
    }.toDF("version", "action", "operation", "n_files", "commit_ts")
  }

  /** One-row table summary — the DESCRIBE DETAIL surface: head version,
    * live file count, manifest-carried total bytes, the declared
    * partition layout, and the recorded column count (zero jobs — every
    * number comes from the checkpoint-bounded replay).
    */
  def detail(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val head = headVersion(root)
    val r = replay(root, head)
    // n_rows: the metadata-only ledger, -1 when any entry predates
    // counting (same degradation contract as rowCount)
    val nRows =
      if (r.entries.isEmpty || r.entries.exists(_.rows.isEmpty)) -1L
      else r.entries.iterator.map(e => e.rows.get - e.dvRows).sum
    Seq((head, r.entries.size.toLong, r.entries.flatMap(_.bytes).sum,
      r.partitionBy.map(_.mkString(",")).getOrElse("MIXED"),
      r.schema.map(_.fields.length.toLong).getOrElse(-1L),
      nRows,
      r.entries.count(_.dvs.nonEmpty).toLong,
      r.entries.iterator.map(_.dvRows).sum,
      r.constraints.size.toLong,
      r.entries.iterator.flatMap(_.blooms.keys).toSet.size.toLong))
      .toDF("version", "n_files", "total_bytes", "partition_by", "n_columns",
        "n_rows", "n_dv_files", "n_deleted_rows", "n_constraints",
        "n_bloom_cols")
  }

  /** The newest version whose commit timestamp is ≤ `tsMillis` —
    * resolved by binary search over the dense version range, O(log V)
    * manifest reads (commit timestamps are monotone up to clock skew
    * between writers, the Delta caveat; a pre-round-9 manifest without a
    * timestamp reads as 0 = always eligible). Refuses a timestamp before
    * the first commit.
    */
  def versionAsOf(root: String, tsMillis: Long): Long = {
    val head = headVersion(root)
    require(head >= 1, s"txlog: $root has no committed version yet")
    def ts(v: Long): Long = readManifest(root, v).ts.getOrElse(0L)
    require(ts(1L) <= tsMillis,
      s"txlog: no version of $root exists at or before timestamp $tsMillis")
    var lo = 1L; var hi = head
    while (lo < hi) { // invariant: ts(lo) <= tsMillis
      val mid = lo + (hi - lo + 1) / 2
      if (ts(mid) <= tsMillis) lo = mid else hi = mid - 1
    }
    lo
  }

  /** TIMESTAMP AS OF: the snapshot at [[versionAsOf]] `tsMillis`. */
  def snapshotAsOf(spark: SparkSession, root: String, tsMillis: Long): DataFrame =
    snapshot(spark, root, Some(versionAsOf(root, tsMillis)))

  /** Garbage-collect data files no snapshot ≥ `retainFrom` can reach:
    * aborted-commit residue (data dirs whose manifest never published) and
    * files dropped by an overwrite at or before the retention horizon.
    * Time travel BELOW `retainFrom` stops working afterwards — the same
    * contract as Delta's VACUUM retention window, and why the default
    * retains everything (`retainFrom = 1`).
    *
    * Safe under concurrent readers of retained versions (their files are
    * kept) AND under concurrent committers, by two ordered checks:
    * every commit brackets its data-write → manifest-link window with an
    * in-flight marker (`_txlog/inflight/txn-*`), and vacuum re-lists the
    * markers AFTER listing the data dirs — a commit's marker exists
    * before its data dir does, so any dir vacuum can see either has a
    * visible marker in one of the two scans or has already published its
    * manifest, and the head is re-read after the second scan to fold
    * such just-published commits into the keep-set (round 8 scanned
    * markers once, before the slow keep-set replay: a commit starting in
    * that window could lose its files — the TOCTOU the second scan
    * closes). A crashed committer's marker goes stale after
    * `inflightGraceMs` and its files become ordinary garbage (markers
    * are GC'd with them) — Delta VACUUM's file-age double-check.
    *
    * Cost: the keep-set is ONE forward replay — a checkpoint-bounded
    * resolve at the horizon, then one manifest read per later version,
    * accumulating the union of retained live sets as it rolls (round 8
    * replayed per retained version: O(versions · CheckpointEvery)
    * manifest reads; TxLogScaleSpec counts the bound).
    *
    * @return number of data files deleted
    */
  def vacuum(
      root: String,
      retainFrom: Long = 1L,
      inflightGraceMs: Long = 24L * 3600 * 1000,
      dryRun: Boolean = false): Int = {
    val vs = versions(root)
    if (vs.isEmpty) return 0
    val s = store(root)
    // txn dirs currently inside a commit window: skip them wholesale
    val now = System.currentTimeMillis()
    def listInflight(gcStale: Boolean): Set[String] =
      s.list(inflightDir(root)).flatMap { n =>
        val m = s"${inflightDir(root)}/$n"
        val fresh = try now - s.mtimeMillis(m) < inflightGraceMs
        catch { case scala.util.control.NonFatal(_) => false }
        if (fresh) Some(n)
        else if (gcStale) {
          try s.delete(m) catch { case scala.util.control.NonFatal(_) => () }; None
        } else None
      }.toSet
    // dryRun previews the reclaim count with ZERO filesystem mutation
    // (Delta's VACUUM DRY RUN) — the operator's what-if before committing
    // to a retention horizon; stale-marker GC is a mutation too, so it
    // is equally gated
    val inflight1 = listInflight(gcStale = !dryRun)
    // clamp the horizon to the head: retainFrom > headVersion would
    // otherwise produce an EMPTY keep-set and delete the current
    // snapshot's own files — Delta's VACUUM never deletes current-head
    // files no matter the retention window, and neither does this
    val horizon = math.min(retainFrom, vs.last)
    // every file any retained snapshot lists, in ONE forward pass: the
    // horizon's live set (checkpoint-bounded), then roll version by
    // version, folding each intermediate live set into the union
    val horizonReplay = replay(root, horizon)
    var cur: Set[String] = horizonReplay.files.map(f => absPath(root, f)).toSet
    var keep: Set[String] = cur
    // change-data dirs any retained changes() read can still reference
    var keepCdf: Set[String] =
      if (horizon >= 1) readManifest(root, horizon).cdf.toSet - "" else Set.empty
    // deletion-vector dirs any retained snapshot still subtracts
    var keepDv: Set[String] = horizonReplay.entries.iterator.flatMap(_.dvs).toSet
    def roll(fromV: Long, toV: Long): Unit = (fromV to toV).foreach { v =>
      val m = readManifest(root, v)
      val fs = m.files.map(f => absPath(root, f)).toSet
      cur = if (m.action == Overwrite.name) fs else cur ++ fs
      keep ++= cur
      keepCdf ++= m.cdf.toSet - ""
      keepDv ++= m.dvRefs
    }
    var upper = vs.last
    roll(horizon + 1, upper)
    val dataRoot = s"$root/data"
    if (!s.isDir(dataRoot)) return 0
    var deleted = 0
    val dirs = s.list(dataRoot)
    // TOCTOU closure, in this order: (1) data dirs listed above, (2)
    // markers re-listed — any commit whose dir we can see created its
    // marker first, so it is visible here unless it already published —
    // (3) head re-read, folding commits that published since the replay
    // into the keep-set
    val inflight = inflight1 ++ listInflight(gcStale = false)
    val h2 = headVersion(root)
    if (h2 > upper) { roll(upper + 1, h2); upper = h2 }
    dirs.foreach { d =>
      if (inflight.contains(d)) ()
      else {
        val dirPath = s"$dataRoot/$d"
        // recursive walk: a partitioned commit nests its files under k=v
        // subdirs, so a flat listing would try to delete non-empty dirs
        val all = s.walk(dirPath)
        def canonical(rel: String) = s"$dataRoot/$d/$rel"
        val anyKept = all.exists(f => keep.contains(canonical(f.relPath)))
        all.foreach { f =>
          val cp = canonical(f.relPath)
          if (f.relPath.endsWith(".parquet")) {
            if (!keep.contains(cp)) {
              if (!dryRun) s.delete(cp)
              deleted += 1
            }
          } else Bloom.sidecarOf(cp) match {
            case Some(dataPath) =>
              // a bloom sidecar lives exactly as long as its data file
              if (!keep.contains(dataPath) && !dryRun) s.delete(cp)
            case None if !anyKept =>
              // write markers (_SUCCESS, .crc) go when nothing in the dir is kept
              if (!dryRun) s.delete(cp)
            case None => ()
          }
        }
        // drop now-empty dirs bottom-up (deepest first; delete refuses a
        // non-empty dir) — a mutation, so dry runs skip it
        if (!dryRun) {
          (s.walkDirs(dirPath).map(r0 => s"$dirPath/$r0") :+ dirPath)
            .sortBy(-_.count(_ == '/'))
            .foreach(sd => try s.delete(sd) catch { case scala.util.control.NonFatal(_) => () })
        }
      }
    }
    // GC change-data dirs no retained changes() read can reference. A
    // dir younger than the grace may belong to a merge whose commit
    // window is still open (change data lands BEFORE the commit's
    // in-flight marker exists), so unreferenced change dirs are
    // age-gated exactly like crashed-committer residue
    def gcSideDirs(sub: String, keepNames: String => Boolean): Unit = {
      val dirRoot = s"$root/$sub"
      if (!s.isDir(dirRoot)) return
      s.list(dirRoot).foreach { n =>
        val d = s"$dirRoot/$n"
        val fresh = try now - s.mtimeMillis(d) < inflightGraceMs
        catch { case scala.util.control.NonFatal(_) => true }
        if (!keepNames(n) && !fresh) {
          s.walk(d).foreach(f =>
            try s.delete(s"$d/${f.relPath}") catch { case scala.util.control.NonFatal(_) => () })
          try s.delete(d) catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    }
    if (!dryRun) {
      gcSideDirs("_change_data", keepCdf.contains)
      // deletion-vector dirs follow the same rule (a dv lands BEFORE its
      // commit publishes, so unreferenced young dirs may be in-window)
      gcSideDirs("_dv", n => keepDv.contains(s"_dv/$n"))
    }
    deleted
  }
}
