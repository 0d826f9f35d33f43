package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Storage abstraction for the transaction log's OWN I/O — manifests,
  * checkpoints, the head pointer, in-flight markers, bloom sidecars, and
  * vacuum's walks. Data files always went through Spark's Hadoop paths;
  * this interface is the missing half that lets the commit protocol run
  * where 100 TB actually lives instead of being bound to `java.nio`.
  *
  * The one semantically loaded operation is [[putIfAbsent]] — the atomic
  * version claim of the commit protocol (TxLog step 3). Its contract:
  * publish COMPLETE durable bytes at `path` iff nothing exists there,
  * return false when the slot was already taken, and never let a reader
  * observe partial content. Consistency per implementation:
  *
  *  - [[LocalLogStore]] (schemeless paths): write temp + fsync + hard
  *    link (`link(2)` fails atomically with EEXIST) — fully atomic, the
  *    implementation every spec races deterministically.
  *  - [[FileSchemeLogStore]] (`file:` paths): the same hard-link claim
  *    with the scheme stripped. Routed here rather than through Hadoop
  *    because Hadoop's LOCAL FileSystem maps rename onto `rename(2)`,
  *    which can OVERWRITE an existing destination — two committers
  *    racing a `file://` root through the Hadoop store could both claim
  *    the same version and silently lose one commit.
  *  - [[HadoopLogStore]] (`hdfs://` and other rename-atomic schemes):
  *    write temp (+ hsync where the FS supports it) +
  *    `FileSystem.rename(tmp, dst)` — on HDFS a rename onto an existing
  *    destination FAILS, so the claim is atomic and exclusive.
  *  - [[ObjectStoreLogStore]] (`mem://`, and the S3 port): object
  *    stores have NO rename (s3a/gcs "rename" is copy+delete — never a
  *    claim), so the claim is a conditional PUT (`If-None-Match: *`,
  *    supported by S3 and GCS). [[InMemoryObjectStore]] is the
  *    in-process implementation the protocol specs race under exactly
  *    these semantics (CAS put, paged LIST, no directories);
  *    [[S3ObjectStore]] is the SigV4-signed REST implementation for a
  *    real endpoint when a network exists.
  *
  * Everything else is plain metadata I/O (read/list/walk/delete) with
  * object-store-shaped signatures: one recursive [[walk]] instead of
  * stat-per-file (a LIST page on S3 returns size+mtime for 1000 keys),
  * and no API requires listing `_txlog` to resolve the head (TxLog
  * probes by existence).
  */
trait LogStore {
  import LogStore.FileMeta

  def readBytes(path: String): Array[Byte]
  def exists(path: String): Boolean
  def isDir(path: String): Boolean

  /** Child NAMES of `dir` (files and dirs), empty when missing. */
  def list(dir: String): Seq[String]

  /** Every regular file under `dir` recursively, with size + mtime,
    * paths RELATIVE to `dir`; empty when missing.
    */
  def walk(dir: String): Seq[FileMeta]

  /** Every descendant directory of `dir` (not `dir` itself), relative
    * paths, deepest-last order not guaranteed.
    */
  def walkDirs(dir: String): Seq[String]

  def mtimeMillis(path: String): Long
  def mkdirs(dir: String): Unit

  /** Atomic durable claim: complete bytes at `path` or nothing; false
    * when the slot was already taken (see class doc for per-scheme
    * guarantees).
    */
  def putIfAbsent(path: String, bytes: Array[Byte]): Boolean

  /** Atomic best-effort replace (the head pointer): readers must see the
    * old or the new complete content, never a partial write.
    */
  def putReplace(path: String, bytes: Array[Byte]): Unit

  /** Create an empty marker file; error if it exists. */
  def createMarker(path: String): Unit

  /** Delete a file or EMPTY dir; false when absent or (dir) non-empty. */
  def delete(path: String): Boolean

  final def readText(path: String): String =
    new String(readBytes(path), StandardCharsets.UTF_8)
}

object LogStore {

  /** File metadata as one walk/list row — size and mtime ride along so
    * callers never pay a per-file stat round trip.
    */
  final case class FileMeta(relPath: String, size: Long, mtimeMillis: Long)

  /** Deployment-registered per-scheme stores — how a real bucket plugs
    * in: `LogStore.registerScheme("s3", new ObjectStoreLogStore(p =>
    * (s3Client, keyOf(p))))` routes every `s3://` root's log I/O through
    * the conditional-PUT claim instead of Hadoop's rename (which on an
    * object store is copy+delete — never a claim). `mem://` is
    * pre-registered to the in-process fake.
    */
  private val schemeStores =
    scala.collection.concurrent.TrieMap[String, LogStore](
      "mem" -> ObjectStoreLogStore.Mem)

  def registerScheme(scheme: String, store: LogStore): Unit = {
    schemeStores.put(scheme, store); ()
  }

  /** Per-scheme routing (see the trait doc for each store's claim
    * semantics): registered schemes (`mem://`, deployment-added object
    * stores) to their store, `file:` to the local hard-link store with
    * the scheme stripped (Hadoop's local rename can overwrite — not a
    * claim), other schemes to the Hadoop store, plain paths to the
    * local store.
    */
  def forRoot(root: String): LogStore =
    if (root.startsWith("file:")) FileSchemeLogStore
    else {
      val i = root.indexOf("://")
      if (i > 0) schemeStores.getOrElse(root.substring(0, i), HadoopLogStore)
      else LocalLogStore
    }
}

/** `file:`-scheme adapter over [[LocalLogStore]]: strips the scheme and
  * keeps the fully atomic hard-link claim. See [[LogStore.forRoot]] —
  * routing `file:` through the Hadoop store would ride the local FS's
  * overwriting `rename(2)` and lose a racing commit.
  */
object FileSchemeLogStore extends LogStore {
  import LogStore.FileMeta

  private[io] def strip(p: String): String = {
    // Hadoop Path/URI semantics, which these roots previously rode:
    // a file: URI carries PERCENT-ENCODED octets, so `file:/a/my%20table`
    // names the `/a/my table` directory. Decode through java.net.URI
    // when the string parses as one; a root with raw reserved characters
    // (spaces, ...) fails URI parsing and falls back to the literal
    // prefix-strip, so unencoded paths keep working byte-for-byte.
    def rawStrip: String = {
      val s = p.stripPrefix("file:")
      if (s.startsWith("//")) {
        val rest = s.drop(2)
        require(rest.startsWith("/"),
          s"file: URI with a non-empty authority is not local: $p")
        rest
      } else s
    }
    try {
      val u = new java.net.URI(p)
      val auth = u.getAuthority
      require(auth == null || auth.isEmpty,
        s"file: URI with a non-empty authority is not local: $p")
      val path = u.getPath // decoded
      if (path != null && path.nonEmpty) path else rawStrip
    } catch { case _: java.net.URISyntaxException => rawStrip }
  }

  override def readBytes(path: String): Array[Byte] =
    LocalLogStore.readBytes(strip(path))
  override def exists(path: String): Boolean = LocalLogStore.exists(strip(path))
  override def isDir(path: String): Boolean = LocalLogStore.isDir(strip(path))
  override def list(dir: String): Seq[String] = LocalLogStore.list(strip(dir))
  override def walk(dir: String): Seq[FileMeta] = LocalLogStore.walk(strip(dir))
  override def walkDirs(dir: String): Seq[String] =
    LocalLogStore.walkDirs(strip(dir))
  override def mtimeMillis(path: String): Long =
    LocalLogStore.mtimeMillis(strip(path))
  override def mkdirs(dir: String): Unit = LocalLogStore.mkdirs(strip(dir))
  override def putIfAbsent(path: String, bytes: Array[Byte]): Boolean =
    LocalLogStore.putIfAbsent(strip(path), bytes)
  override def putReplace(path: String, bytes: Array[Byte]): Unit =
    LocalLogStore.putReplace(strip(path), bytes)
  override def createMarker(path: String): Unit =
    LocalLogStore.createMarker(strip(path))
  override def delete(path: String): Boolean = LocalLogStore.delete(strip(path))
}

/** `java.nio` implementation for schemeless local paths — the original
  * TxLog I/O, with the hard-link claim (fully atomic on every POSIX FS).
  */
object LocalLogStore extends LogStore {
  import scala.jdk.CollectionConverters._
  import LogStore.FileMeta

  override def readBytes(path: String): Array[Byte] =
    Files.readAllBytes(Paths.get(path))
  override def exists(path: String): Boolean = Files.exists(Paths.get(path))
  override def isDir(path: String): Boolean = Files.isDirectory(Paths.get(path))

  override def list(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val it = Files.list(p)
      try it.iterator().asScala.map(_.getFileName.toString).toList
      finally it.close()
    }
  }

  override def walk(dir: String): Seq[FileMeta] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val w = Files.walk(p)
      try w.iterator().asScala
        .filter(f => Files.isRegularFile(f))
        .map(f => FileMeta(p.relativize(f).toString, Files.size(f),
          Files.getLastModifiedTime(f).toMillis))
        .toList
      finally w.close()
    }
  }

  override def walkDirs(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val w = Files.walk(p)
      try w.iterator().asScala
        .filter(f => Files.isDirectory(f) && f != p)
        .map(f => p.relativize(f).toString)
        .toList
      finally w.close()
    }
  }

  override def mtimeMillis(path: String): Long =
    Files.getLastModifiedTime(Paths.get(path)).toMillis

  override def mkdirs(dir: String): Unit =
    Files.createDirectories(Paths.get(dir))

  override def putIfAbsent(path: String, bytes: Array[Byte]): Boolean = {
    val dst = Paths.get(path)
    val tmp = dst.getParent.resolve(
      s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
    val ch = java.nio.channels.FileChannel.open(tmp,
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    try {
      ch.write(java.nio.ByteBuffer.wrap(bytes))
      ch.force(true) // the link below must publish durable, complete bytes
    } finally ch.close()
    try {
      Files.createLink(dst, tmp) // atomic: EEXIST when the slot is taken
      Files.delete(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.delete(tmp)
        false
    }
  }

  override def putReplace(path: String, bytes: Array[Byte]): Unit = {
    val dst = Paths.get(path)
    val tmp = dst.getParent.resolve(
      s".rep-${java.util.UUID.randomUUID().toString.take(12)}")
    Files.write(tmp, bytes)
    Files.move(tmp, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  override def createMarker(path: String): Unit = {
    Files.createFile(Paths.get(path)); ()
  }

  override def delete(path: String): Boolean =
    try Files.deleteIfExists(Paths.get(path))
    catch { case _: java.nio.file.DirectoryNotEmptyException => false }
}

/** Hadoop `FileSystem` implementation for rename-atomic scheme-ful
  * roots (`hdfs://`, ...) — the claim is temp-write + rename (atomic
  * and exclusive on HDFS; see [[LogStore]] for the per-scheme
  * contract; `file:` and `mem://` roots route elsewhere).
  * The configuration comes from the active Spark session when one
  * exists (so `fs.*` settings apply), else a vanilla Hadoop default.
  */
object HadoopLogStore extends LogStore {
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}
  import LogStore.FileMeta

  private def conf: org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def fsOf(p: HPath): FileSystem = p.getFileSystem(conf)

  override def readBytes(path: String): Array[Byte] = {
    val p = new HPath(path)
    val in = fsOf(p).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  override def exists(path: String): Boolean = {
    val p = new HPath(path); fsOf(p).exists(p)
  }

  override def isDir(path: String): Boolean = {
    val p = new HPath(path)
    val f = fsOf(p)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  override def list(dir: String): Seq[String] = {
    val p = new HPath(dir)
    val f = fsOf(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
  }

  override def walk(dir: String): Seq[FileMeta] = {
    val p = new HPath(dir)
    val f = fsOf(p)
    if (!f.exists(p)) Seq.empty
    else {
      val base = f.getFileStatus(p).getPath.toUri.getPath
      val it = f.listFiles(p, true) // one recursive LIST, size+mtime inline
      val out = scala.collection.mutable.ListBuffer.empty[FileMeta]
      while (it.hasNext) {
        val st = it.next()
        val rel = st.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
        out += FileMeta(rel, st.getLen, st.getModificationTime)
      }
      out.toList
    }
  }

  override def walkDirs(dir: String): Seq[String] = {
    val p = new HPath(dir)
    val f = fsOf(p)
    if (!f.exists(p)) Seq.empty
    else {
      val base = f.getFileStatus(p).getPath.toUri.getPath
      def rec(d: HPath): Seq[String] =
        f.listStatus(d).toSeq.filter(_.isDirectory).flatMap { st =>
          st.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/") +:
            rec(st.getPath)
        }
      rec(p)
    }
  }

  override def mtimeMillis(path: String): Long = {
    val p = new HPath(path); fsOf(p).getFileStatus(p).getModificationTime
  }

  override def mkdirs(dir: String): Unit = {
    val p = new HPath(dir); fsOf(p).mkdirs(p); ()
  }

  override def putIfAbsent(path: String, bytes: Array[Byte]): Boolean = {
    val dst = new HPath(path)
    val f = fsOf(dst)
    val tmp = new HPath(dst.getParent,
      s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
    val out = f.create(tmp, false)
    try {
      out.write(bytes)
      try out.hsync() catch { case _: UnsupportedOperationException => () }
    } finally out.close()
    // narrow the local-FS overwrite window; on HDFS the rename itself is
    // the atomic exclusive claim (rename onto an existing path fails)
    if (f.exists(dst)) { f.delete(tmp, false); return false }
    if (f.rename(tmp, dst)) true
    else { f.delete(tmp, false); false }
  }

  override def putReplace(path: String, bytes: Array[Byte]): Unit = {
    val dst = new HPath(path)
    val f = fsOf(dst)
    val tmp = new HPath(dst.getParent,
      s".rep-${java.util.UUID.randomUUID().toString.take(12)}")
    val out = f.create(tmp, false)
    try out.write(bytes) finally out.close()
    // FileContext rename with OVERWRITE is the atomic replace the trait
    // contract requires (readers see old or new content, never an absent
    // window); delete-then-rename is only the fallback for filesystems
    // without a FileContext binding
    try org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch {
      case scala.util.control.NonFatal(_) =>
        f.delete(dst, false)
        if (!f.rename(tmp, dst)) f.delete(tmp, false)
    }
  }

  override def createMarker(path: String): Unit = {
    val p = new HPath(path)
    fsOf(p).create(p, false).close()
  }

  override def delete(path: String): Boolean = {
    val p = new HPath(path)
    val f = fsOf(p)
    if (!f.exists(p)) false
    else if (f.getFileStatus(p).isDirectory && f.listStatus(p).nonEmpty) false
    else f.delete(p, false)
  }
}
