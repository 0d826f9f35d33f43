package graft.io

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileAlreadyExistsException, FileStatus, FileSystem, FSDataInputStream, FSDataOutputStream, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Hadoop `FileSystem` over ANY [[ObjectStoreApi]] bucket — the s3a
  * shape re-derived at the trait's six calls, so Spark's parquet data
  * I/O can live wherever the transaction log does (the in-process fake
  * via [[MemFileSystem]], or an HTTP S3 endpoint via a subclass that
  * resolves its buckets to [[S3ObjectStore]] clients). OBJECT-STORE
  * semantics throughout:
  *
  *  - `create` buffers and the object appears ONLY at close (a PUT);
  *  - `rename` is per-key copy+delete, NOT atomic, NOT exclusive —
  *    exactly why the commit claim must be a conditional PUT, never a
  *    rename (the committer's task/job renames tolerate this, as they
  *    do on s3a);
  *  - directories are key prefixes; `mkdirs` writes s3a-style zero-byte
  *    `key/` markers so empty staging dirs survive listing;
  *  - `listStatus`/`getFileStatus` derive children from paged LISTs.
  */
abstract class ObjectStoreFileSystem extends FileSystem {
  private var fsUri: URI = _
  private var store: ObjectStoreApi = _
  private var workDir: Path = _

  /** The store client of a named bucket (the URI authority). */
  protected def resolveBucket(bucket: String): ObjectStoreApi

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    require(name.getAuthority != null && name.getAuthority.nonEmpty,
      s"$getScheme:// URIs need a bucket authority: $name")
    fsUri = URI.create(s"$getScheme://${name.getAuthority}")
    store = resolveBucket(name.getAuthority)
    workDir = new Path(fsUri.toString + "/")
    setConf(conf)
  }

  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  /** Bucket-relative key of a path ("" for the bucket root). */
  private def keyOf(f: Path): String =
    makeQualified(f).toUri.getPath.stripPrefix("/").stripSuffix("/")

  private def status(key: String, f: Path): FileStatus =
    store.head(key) match {
      case Some(m) =>
        new FileStatus(m.size, false, 1, 128L * 1024 * 1024, m.mtimeMillis,
          makeQualified(f))
      case None =>
        val isDir = key.isEmpty || store.head(key + "/").isDefined ||
          store.listPage(key + "/", "", 1)._1.nonEmpty
        if (!isDir) throw new FileNotFoundException(f.toString)
        new FileStatus(0, true, 1, 0, 0, makeQualified(f))
    }

  override def getFileStatus(f: Path): FileStatus = status(keyOf(f), f)

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = keyOf(f)
    if (store.head(key).isDefined) return Array(status(key, f))
    val prefix = if (key.isEmpty) "" else key + "/"
    val children = scala.collection.mutable.LinkedHashMap.empty[String, FileStatus]
    ObjectStoreApi.listAll(store, prefix).foreach { m =>
      val rel = m.key.stripPrefix(prefix)
      if (rel.nonEmpty) {
        val name = rel.takeWhile(_ != '/')
        val childPath = new Path(makeQualified(f), name)
        if (rel == name) // a direct child object = a file
          children(name) = new FileStatus(m.size, false, 1,
            128L * 1024 * 1024, m.mtimeMillis, childPath)
        else if (!children.contains(name)) // deeper key or marker = a dir
          children(name) = new FileStatus(0, true, 1, 0, 0, childPath)
      }
    }
    if (children.isEmpty && key.nonEmpty && store.head(key + "/").isEmpty)
      throw new FileNotFoundException(f.toString)
    children.values.toArray
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    // s3a-style zero-byte markers for the dir and every absent ancestor,
    // so empty staging dirs (the committer's _temporary) list correctly
    var p = makeQualified(f)
    while (p != null && keyOf(p).nonEmpty) {
      val k = keyOf(p)
      if (store.head(k).isDefined)
        throw new FileAlreadyExistsException(s"$p exists as a file")
      store.putIfNoneMatch(k + "/", Array.emptyByteArray)
      p = p.getParent
    }
    true
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = store.get(keyOf(f))
      .getOrElse(throw new FileNotFoundException(f.toString))
    new FSDataInputStream(new ObjectStoreFileSystem.SeekableBytes(bytes))
  }

  override def create(
      f: Path,
      permission: FsPermission,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    if (!overwrite && store.head(key).isDefined)
      throw new FileAlreadyExistsException(f.toString)
    // buffer locally; the object appears only at close — PUT semantics
    val buf = new ByteArrayOutputStream()
    new FSDataOutputStream(new java.io.FilterOutputStream(buf) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = store.put(key, buf.toByteArray)
    }, statistics)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable)
      : FSDataOutputStream =
    throw new IOException(s"$getScheme:// objects are immutable; append unsupported")

  /** Copy+delete per key — the object-store truth (s3a does the same).
    * POSIX-ish surface for the committer: renaming onto an existing
    * directory moves the source INTO it.
    */
  override def rename(src: Path, dst: Path): Boolean = {
    val srcKey = keyOf(src)
    val dstStatus = try Some(getFileStatus(dst)) catch {
      case _: FileNotFoundException => None
    }
    val target = dstStatus match {
      case Some(st) if st.isDirectory => keyOf(new Path(dst, src.getName))
      case Some(_)                    => return false // onto an existing file
      case None                       => keyOf(dst)
    }
    if (store.head(srcKey).isDefined) { // file rename
      store.put(target, store.get(srcKey).get)
      store.delete(srcKey)
      true
    } else { // directory rename: every key under the prefix moves
      val moved = ObjectStoreApi.listAll(store, srcKey + "/").toList
      if (moved.isEmpty) return false // absent source
      moved.foreach { m =>
        val relTail = m.key.stripPrefix(srcKey)
        if (m.key.endsWith("/")) // dir marker
          store.putIfNoneMatch(target + relTail, Array.emptyByteArray)
        else store.put(target + relTail, store.get(m.key).get)
        store.delete(m.key)
      }
      true
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val key = keyOf(f)
    if (store.head(key).isDefined) { store.delete(key); true }
    else {
      val under = ObjectStoreApi.listAll(store, key + "/").toList
      if (under.isEmpty) false
      else if (!recursive && under.exists(_.key != key + "/"))
        throw new IOException(s"$f is a non-empty directory")
      else { under.foreach(m => store.delete(m.key)); true }
    }
  }
}

/** The `mem://` instance: buckets resolve to the process-wide
  * [[InMemoryObjectStore]] fakes. Registered in a session via
  * `spark.hadoop.fs.mem.impl = graft.io.MemFileSystem`; lets the
  * chaos/model/rebase/vacuum specs run whole tables end-to-end under
  * the semantics S3/GCS impose. Test-fake by intent, but a faithful
  * one: thread-safe, instantly consistent across the JVM's threads
  * (S3's post-2020 read-after-write model).
  */
final class MemFileSystem extends ObjectStoreFileSystem {
  override def getScheme: String = "mem"
  override protected def resolveBucket(bucket: String): ObjectStoreApi =
    InMemoryObjectStore.bucket(bucket)
}

object ObjectStoreFileSystem {
  /** Seekable in-memory byte stream (parquet footers seek backwards). */
  private final class SeekableBytes(bytes: Array[Byte])
      extends java.io.ByteArrayInputStream(bytes)
      with Seekable with PositionedReadable {
    override def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length) throw new java.io.EOFException(s"seek($p)")
      pos = p.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new java.io.EOFException(
          s"readFully past end: $position+$length > ${bytes.length}")
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
