package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
  * files their snapshot actually lists. On an object store the atomic
  * claim in step 3 becomes a conditional PUT (`If-None-Match: *`) and the
  * local fsync/link pair disappears; everything else is unchanged. The
  * replay cost of a long chain is bounded by checkpoint manifests: every
  * [[TxLog.CheckpointEvery]] commits the full live set is written as
  * `cNNNNNNNN.json` (best-effort, derived state) and readers replay only
  * the suffix after the newest checkpoint at or below their pin.
  */
object TxLog {

  sealed trait Action { def name: String }
  case object Append extends Action { val name = "append" }
  case object Overwrite extends Action { val name = "overwrite" }

  /** A read-modify-write commit observed a head it didn't base itself on
    * — the caller must re-read and recompute (see [[merge]]).
    */
  final class CommitConflict(msg: String) extends RuntimeException(msg)

  final case class Manifest(version: Long, action: String, files: Seq[String])

  private val versionFile: Regex = """v(\d{8})\.json""".r
  private val checkpointFile: Regex = """c(\d{8})\.json""".r
  private val fileField: Regex = """"([^"]+\.parquet)"""".r
  private val fileStatsField: Regex =
    """\{"p":"([^"]+\.parquet)","lo":(-?\d+),"hi":(-?\d+)\}""".r
  private val actionField: Regex = """"action":"(append|overwrite)"""".r
  private val txnField: Regex = """"txnId":"([^"]*)"""".r

  /** A checkpoint manifest (full live set) is written every K commits so
    * reader replay cost is O(K), not O(total versions) — the Delta
    * `_last_checkpoint` idea at this size.
    */
  val CheckpointEvery: Long = 10L

  private def logDir(root: String): Path = Paths.get(root, "_txlog")

  /** All committed versions, ascending (empty for a fresh table). */
  def versions(root: String): Seq[Long] = {
    val dir = logDir(root)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val it = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala
          .flatMap(p => versionFile.findFirstMatchIn(p.getFileName.toString)
            .map(_.group(1).toLong))
          .toSeq.sorted
      } finally it.close()
    }
  }

  def headVersion(root: String): Long = versions(root).lastOption.getOrElse(0L)

  private def readManifest(root: String, v: Long): Manifest = {
    val txt = new String(
      Files.readAllBytes(logDir(root).resolve(f"v$v%08d.json")),
      StandardCharsets.UTF_8)
    val action = actionField.findFirstMatchIn(txt)
      .map(_.group(1))
      .getOrElse(throw new java.io.IOException(s"txlog: bad manifest v$v"))
    Manifest(v, action, fileField.findAllMatchIn(txt).map(_.group(1)).toSeq)
  }

  /** Committed checkpoint versions, ascending. */
  private def checkpointVersions(root: String): Seq[Long] = {
    val dir = logDir(root)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val it = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala
          .flatMap(p => checkpointFile.findFirstMatchIn(p.getFileName.toString)
            .map(_.group(1).toLong))
          .toSeq.sorted
      } finally it.close()
    }
  }

  /** Replay into the live file list (absolute paths): start from the
    * newest checkpoint ≤ upTo (skipping every older manifest), then apply
    * the ≤ CheckpointEvery manifests after it — reader cost is bounded by
    * the checkpoint interval, not the table's commit count.
    */
  def liveFiles(root: String, upTo: Long): Seq[String] = {
    val base = checkpointVersions(root).filter(_ <= upTo).lastOption
    var live: Vector[String] = base match {
      case Some(cv) =>
        val txt = new String(
          Files.readAllBytes(logDir(root).resolve(f"c$cv%08d.json")),
          StandardCharsets.UTF_8)
        fileField.findAllMatchIn(txt).map(_.group(1)).toVector
      case None => Vector.empty
    }
    versions(root)
      .filter(v => v <= upTo && v > base.getOrElse(0L))
      .foreach { v =>
        val m = readManifest(root, v)
        live = if (m.action == Overwrite.name) m.files.toVector
               else live ++ m.files
      }
    live.map(f => s"$root/$f")
  }

  /** Per-file column stats carried by a manifest: min/max of the stats
    * column for data skipping (the Delta/Iceberg per-file zone-map idea).
    * Stored inline as `{"p":path,"lo":L,"hi":H}` next to plain-string
    * entries, so stats-free and stats-bearing commits interleave freely.
    */
  final case class FileStat(path: String, lo: Long, hi: Long)

  /** Stats of every live file at `upTo` that HAS stats (absolute paths).
    * Files committed without stats are absent — callers must treat them
    * as "may contain anything" (see [[snapshotRange]]).
    */
  def liveStats(root: String, upTo: Long): Map[String, (Long, Long)] = {
    val vs = versions(root).filter(_ <= upTo)
    var acc = Map.empty[String, (Long, Long)]
    vs.foreach { v =>
      val txt = new String(
        Files.readAllBytes(logDir(root).resolve(f"v$v%08d.json")),
        StandardCharsets.UTF_8)
      val action = actionField.findFirstMatchIn(txt).map(_.group(1))
      if (action.contains(Overwrite.name)) acc = Map.empty
      fileStatsField.findAllMatchIn(txt).foreach { m =>
        acc += (s"$root/${m.group(1)}" -> (m.group(2).toLong, m.group(3).toLong))
      }
    }
    acc
  }

  /** The txnId each committed version carries (empty when none). */
  private def committedTxnIds(root: String): Map[String, Long] =
    versions(root).flatMap { v =>
      val txt = new String(
        Files.readAllBytes(logDir(root).resolve(f"v$v%08d.json")),
        StandardCharsets.UTF_8)
      txnField.findFirstMatchIn(txt).map(_.group(1) -> v)
    }.toMap

  /** Commit `df` and return the version it landed as. */
  def commit(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      action: Action,
      txnId: Option[String] = None,
      statsCol: Option[String] = None,
      expectHead: Option[Long] = None): Long = {
    Files.createDirectories(logDir(root))
    val txn = java.util.UUID.randomUUID().toString.take(12)
    val dataDir = s"$root/data/txn-$txn"
    // step 1: data files land first, unreferenced by any manifest
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir)
    import scala.jdk.CollectionConverters._
    val written = {
      val it = Files.list(Paths.get(dataDir))
      try it.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
      finally it.close()
    }.map(n => s"data/txn-$txn/$n")
    // optional per-file zone map: min/max of `statsCol` per written file,
    // serialized into the manifest so readers can skip files whose range
    // can't match (the Delta/Iceberg data-skipping idea). One footer-sized
    // job per file at COMMIT time — proportional to the commit, never to
    // the table; readers pay nothing until they prune.
    val entries: Seq[String] = statsCol match {
      case Some(c) =>
        written.map { rel =>
          val r = spark.read.parquet(s"$root/$rel")
            .agg(org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.col(c).cast("long")),
              org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.col(c).cast("long")))
            .head()
          if (r.isNullAt(0)) "\"" + rel + "\"" // empty/all-null file: no stats
          else s"""{"p":"$rel","lo":${r.getLong(0)},"hi":${r.getLong(1)}}"""
        }
      case None => written.map("\"" + _ + "\"")
    }
    // steps 2+3: publish, retrying the version claim on lost races
    var attempt = 0
    while (true) {
      val next = headVersion(root) + 1
      // serializable read-modify-write: a caller that derived `df` FROM a
      // snapshot declares the head it read; if anything committed since,
      // blindly claiming next would silently drop that commit's effect
      // (lost update) — conflict instead, so the caller re-reads
      expectHead.foreach { h =>
        if (next - 1 != h)
          throw new CommitConflict(
            s"txlog: based on v$h but head is v${next - 1}")
      }
      val txnPart = txnId.map(t => s""","txnId":"$t"""").getOrElse("")
      val body = entries.mkString(
        s"""{"version":$next,"action":"${action.name}"$txnPart,"files":[""", ",", "]}")
      val tmp = logDir(root).resolve(s".tmp-$txn-$attempt")
      val ch = java.nio.channels.FileChannel.open(tmp,
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      try {
        ch.write(java.nio.ByteBuffer.wrap(body.getBytes(StandardCharsets.UTF_8)))
        ch.force(true) // the link below must publish durable, complete bytes
      } finally ch.close()
      try {
        Files.createLink(logDir(root).resolve(f"v$next%08d.json"), tmp)
        Files.delete(tmp)
        if (next % CheckpointEvery == 0) writeCheckpoint(root, next)
        return next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.delete(tmp) // lost the race for `next`; re-read head, retry
          attempt += 1
          if (attempt > 1000)
            throw new java.io.IOException(s"txlog: gave up claiming a version after $attempt attempts")
      }
    }
    -1L // unreachable
  }

  /** Best-effort: a checkpoint is pure derived state, so a failure (or a
    * concurrent winner) must never fail the commit that triggered it —
    * readers just replay a longer manifest suffix.
    */
  private def writeCheckpoint(root: String, v: Long): Unit =
    try {
      val files = liveFiles(root, v).map(_.stripPrefix(s"$root/"))
      val body = files.map("\"" + _ + "\"").mkString(
        s"""{"version":$v,"action":"checkpoint","files":[""", ",", "]}")
      val tmp = logDir(root).resolve(s".ckpt-tmp-$v-${java.util.UUID.randomUUID().toString.take(8)}")
      val ch = java.nio.channels.FileChannel.open(tmp,
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      try {
        ch.write(java.nio.ByteBuffer.wrap(body.getBytes(StandardCharsets.UTF_8)))
        ch.force(true)
      } finally ch.close()
      try Files.createLink(logDir(root).resolve(f"c$v%08d.json"), tmp)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      Files.delete(tmp)
    } catch { case _: Throwable => () }

  def append(spark: SparkSession, root: String, df: DataFrame): Long =
    commit(spark, root, df, Append)

  def overwrite(spark: SparkSession, root: String, df: DataFrame): Long =
    commit(spark, root, df, Overwrite)

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
  def appendOnce(spark: SparkSession, root: String, txnId: String, df: DataFrame): Long =
    committedTxnIds(root).get(txnId) match {
      case Some(v) => v
      case None    => commit(spark, root, df, Append, Some(txnId))
    }

  /** Copy-on-write MERGE (upsert): rows of `updates` replace current rows
    * sharing `keyCol`; unmatched update rows insert. One overwrite commit
    * of (current ⟕anti update-keys) ∪ updates — correct because data files
    * are immutable, so the read side of the rewrite can never see its own
    * writes. This is Delta's copy-on-write MERGE without a file-level match
    * index: at scale you'd first join the update keys against per-file
    * min/max key ranges (the manifest would carry them) and rewrite ONLY
    * matching files, appending the rest — noted, not built, at this size.
    */
  def merge(spark: SparkSession, root: String, updates: DataFrame, keyCol: String): Long = {
    // serializable read-modify-write: pin the version the rewrite is based
    // on; if anything commits in between, the conditional commit throws
    // and the WHOLE read-modify-write reruns against the new head — a
    // blind overwrite would silently drop the interleaved commit (lost
    // update). The retry rewrites the data files (same copy-on-write
    // conflict cost as Delta); the abandoned attempt's files are
    // unreferenced garbage until a vacuum.
    var attempts = 0
    while (true) {
      val base = headVersion(root)
      val merged = snapshot(spark, root, Some(base))
        .join(updates.select(keyCol).distinct(), Seq(keyCol), "left_anti")
        .unionByName(updates)
      try {
        return commit(spark, root, merged, Overwrite, expectHead = Some(base))
      } catch {
        case _: CommitConflict =>
          attempts += 1
          if (attempts > 50)
            throw new java.io.IOException(
              s"txlog: merge lost $attempts conflicts in a row; giving up")
      }
    }
    -1L // unreachable
  }

  /** OPTIMIZE: rewrite the current live set into `targetFiles` files —
    * the compaction a long-lived table needs once incremental appends
    * accumulate small files (footer reads + task-per-file scheduling
    * dominate scan cost at 100 TB; see Zones.compact for the raw-prefix
    * variant). With `sortCol`, rows are range-repartitioned on it first
    * so the rewritten files' zone maps become near-disjoint and
    * [[snapshotRange]] pruning approaches one-file-per-range — the
    * OPTIMIZE ZORDER story in one dimension. Committed as one overwrite;
    * data files are immutable, so every pre-optimize snapshot keeps
    * reading its own files untouched (time travel across an OPTIMIZE is
    * free, unlike an in-place rewrite).
    */
  def optimize(
      spark: SparkSession,
      root: String,
      targetFiles: Int,
      sortCol: Option[String] = None): Long = {
    val cur = snapshot(spark, root)
    val laid = sortCol match {
      case Some(c) => cur.repartitionByRange(
        targetFiles, org.apache.spark.sql.functions.col(c))
      case None => cur.repartition(targetFiles)
    }
    commit(spark, root, laid, Overwrite, statsCol = sortCol)
  }

  /** Snapshot read: the table as of `version` (head when None). The file
    * list is resolved ONCE here; later commits only add files this list
    * never mentions, so the returned DataFrame is a consistent snapshot no
    * matter when (or how often) it is executed.
    */
  def snapshot(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(headVersion(root))
    val files = liveFiles(root, v)
    require(files.nonEmpty, s"txlog: snapshot v$v of $root lists no files")
    // mergeSchema: a table that GAINED a column mid-history reads as the
    // union schema with nulls backfilled in pre-evolution files; a
    // time-travel read below the evolution sees only the old columns
    // (its file list predates them) — additive schema evolution for free
    spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** Range read with data skipping: only files whose [lo, hi] zone map
    * can intersect [lo, hi] are opened; files committed WITHOUT stats are
    * conservatively always read. The residual filter still applies (zone
    * maps prune files, they don't evaluate predicates). At 100 TB this is
    * the difference between listing a snapshot and scanning it — commits
    * that range-partition or sort by the stats column make the zone maps
    * disjoint and pruning near-perfect (see io.ZOrder for the 2-D case).
    */
  def snapshotRange(
      spark: SparkSession,
      root: String,
      col: String,
      lo: Long,
      hi: Long,
      version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(headVersion(root))
    val live = liveFiles(root, v)
    require(live.nonEmpty, s"txlog: no live files at v$v of $root")
    val files = prunedFiles(root, v, lo, hi)
    // every zone map misses the range: correct answer is EMPTY, with the
    // table's schema (read one live file, keep no rows)
    val base =
      if (files.nonEmpty) spark.read.parquet(files: _*)
      else spark.read.parquet(live.head)
        .filter(org.apache.spark.sql.functions.lit(false))
    base.filter(org.apache.spark.sql.functions.col(col).cast("long")
      .between(lo, hi))
  }

  /** The file list [[snapshotRange]] would read — exposed so specs can
    * assert the PRUNING, not just the result.
    */
  def prunedFiles(root: String, v: Long, lo: Long, hi: Long): Seq[String] = {
    val stats = liveStats(root, v)
    liveFiles(root, v).filter { f =>
      stats.get(f) match {
        case Some((flo, fhi)) => fhi >= lo && flo <= hi
        case None             => true // stats-free commit: cannot skip
      }
    }
  }

  /** Commit history as a DataFrame — the audit surface (DESCRIBE HISTORY). */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    versions(root).map { v =>
      val m = readManifest(root, v)
      (m.version, m.action, m.files.size.toLong)
    }.toDF("version", "action", "n_files")
  }

  /** Garbage-collect data files no snapshot ≥ `retainFrom` can reach:
    * aborted-commit residue (data dirs whose manifest never published) and
    * files dropped by an overwrite at or before the retention horizon.
    * Time travel BELOW `retainFrom` stops working afterwards — the same
    * contract as Delta's VACUUM retention window, and why the default
    * retains everything (`retainFrom = 1`).
    *
    * Safe under concurrent readers of retained versions (their files are
    * kept) but NOT under a concurrent committer whose data dir is written
    * and unpublished at scan time — run vacuum from a maintenance window or
    * track in-flight txn ids; documented, not solved, at this size.
    *
    * @return number of data files deleted
    */
  def vacuum(root: String, retainFrom: Long = 1L): Int = {
    import scala.jdk.CollectionConverters._
    val vs = versions(root)
    if (vs.isEmpty) return 0
    // every file any retained snapshot lists (replay includes pre-horizon
    // appends that survive into retained live sets)
    val keep: Set[String] =
      vs.filter(_ >= retainFrom).flatMap(v => liveFiles(root, v)).toSet
    val dataRoot = Paths.get(root, "data")
    if (!Files.isDirectory(dataRoot)) return 0
    var deleted = 0
    val dirs = {
      val it = Files.list(dataRoot)
      try it.iterator().asScala.toList finally it.close()
    }
    dirs.foreach { d =>
      val files = {
        val it = Files.list(d)
        try it.iterator().asScala.toList finally it.close()
      }
      files.foreach { f =>
        val canonical = s"$root/data/${d.getFileName}/${f.getFileName}"
        if (f.getFileName.toString.endsWith(".parquet") && !keep.contains(canonical)) {
          Files.delete(f); deleted += 1
        } else if (!f.getFileName.toString.endsWith(".parquet") &&
                   !files.exists(g => keep.contains(s"$root/data/${d.getFileName}/${g.getFileName}"))) {
          // write markers (_SUCCESS, .crc) go with their dir when nothing in it is kept
          Files.delete(f)
        }
      }
      val remaining = {
        val it = Files.list(d)
        try it.iterator().asScala.toList finally it.close()
      }
      if (remaining.isEmpty) Files.delete(d)
    }
    deleted
  }
}
