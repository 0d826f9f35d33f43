package graft.io

import java.nio.charset.StandardCharsets

/** The narrow object-store surface the transaction log's commit protocol
  * needs, shaped EXACTLY like S3/GCS: a flat key space (no directories,
  * no rename), GET/HEAD/PUT/DELETE on whole objects, a conditional PUT
  * (`If-None-Match: *` — the atomic version claim), an unconditional PUT
  * (last-write-wins — the head pointer), and a PAGED lexicographic LIST
  * (`ListObjectsV2`: prefix + start-after + max-keys). Everything the
  * [[LogStore]] trait promises is derivable from these six calls, which
  * is the point: proving the protocol against this interface proves it
  * against the store 100 TB actually lives on.
  *
  * Implementations: [[InMemoryObjectStore]] (the in-process fake the
  * chaos/model/rebase specs race, honest about paging and the absence of
  * rename) and [[S3ObjectStore]] (SigV4-signed REST against real S3 or
  * any compatible endpoint — the conditional-PUT port the TxLog design
  * note specified).
  */
trait ObjectStoreApi {
  import ObjectStoreApi.ObjMeta

  /** Whole-object read; None when the key doesn't exist. */
  def get(key: String): Option[Array[Byte]]

  /** Size + mtime without the body (HEAD); None when absent. */
  def head(key: String): Option[ObjMeta]

  /** Conditional PUT (`If-None-Match: *`): publish complete bytes at
    * `key` iff no object exists there; false when the slot was taken.
    * This is the commit protocol's atomic claim.
    */
  def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean

  /** Unconditional PUT — last-write-wins, object-store semantics. */
  def put(key: String, bytes: Array[Byte]): Unit

  /** One LIST page: keys with `prefix`, strictly after `startAfter`,
    * ascending lexicographic, at most `maxKeys`; `_2` = truncated
    * (more pages follow). Sizes and mtimes ride along, as S3's do.
    */
  def listPage(prefix: String, startAfter: String, maxKeys: Int)
      : (Seq[ObjMeta], Boolean)

  /** Idempotent delete (S3 DeleteObject: deleting an absent key is OK). */
  def delete(key: String): Unit
}

object ObjectStoreApi {
  final case class ObjMeta(key: String, size: Long, mtimeMillis: Long)

  /** Drain every page of a LIST — the one loop all callers share, so no
    * caller can accidentally read just the first page and call it "all".
    */
  def listAll(api: ObjectStoreApi, prefix: String, pageSize: Int = 1000)
      : Iterator[ObjMeta] = new Iterator[ObjMeta] {
    private var page: Seq[ObjMeta] = Nil
    private var i = 0
    private var more = true
    private var after = ""
    private def fill(): Unit =
      while (i >= page.size && more) {
        val (p, t) = api.listPage(prefix, after, pageSize)
        page = p; i = 0; more = t
        if (p.nonEmpty) after = p.last.key else more = false
      }
    override def hasNext: Boolean = { fill(); i < page.size }
    override def next(): ObjMeta = { fill(); val m = page(i); i += 1; m }
  }
}

/** In-process object store with REAL object-store semantics — the fake
  * the commit-protocol specs (chaos, randomized model, rebase, vacuum)
  * run against so the protocol is proven under the semantics S3/GCS
  * will actually impose: CAS put-if-absent, last-write-wins replace,
  * paged LIST (deliberately TINY pages so multi-page walks are
  * exercised, not just possible), no rename, no directories. Keys are
  * globally visible to every thread instantly (S3 is read-after-write
  * consistent since 2020 — the model here).
  *
  * One instance per named bucket via [[InMemoryObjectStore.bucket]];
  * `mem://<bucket>/...` paths route here from [[LogStore.forRoot]] and
  * from Spark's data I/O via [[MemFileSystem]], so a whole table —
  * data files AND log — lives in the fake.
  */
final class InMemoryObjectStore(
    val bucket: String,
    val pageSize: Int = 7) extends ObjectStoreApi {
  import ObjectStoreApi.ObjMeta

  // sorted so LIST pages are lexicographic like S3's
  private val objects =
    new java.util.concurrent.ConcurrentSkipListMap[String, (Array[Byte], Long)]()

  /** LIST pages served — the read-count meter for the protocol's
    * object-store cost specs (LIST is the expensive, rate-limited call
    * on real stores; a steady-state commit must pay O(1) pages, never
    * O(history)).
    */
  val listPageCalls = new java.util.concurrent.atomic.AtomicLong(0L)

  override def get(key: String): Option[Array[Byte]] =
    Option(objects.get(key)).map(_._1.clone())

  override def head(key: String): Option[ObjMeta] =
    Option(objects.get(key)).map { case (b, t) => ObjMeta(key, b.length.toLong, t) }

  override def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean =
    objects.putIfAbsent(
      key, (bytes.clone(), System.currentTimeMillis())) == null

  override def put(key: String, bytes: Array[Byte]): Unit =
    objects.put(key, (bytes.clone(), System.currentTimeMillis()))

  override def listPage(prefix: String, startAfter: String, maxKeys: Int)
      : (Seq[ObjMeta], Boolean) = {
    listPageCalls.incrementAndGet()
    val from = if (startAfter > prefix) startAfter else prefix
    val it = objects.tailMap(from, /*inclusive=*/ startAfter < prefix)
      .entrySet().iterator()
    val out = Vector.newBuilder[ObjMeta]
    var n = 0
    var truncated = false
    val cap = math.min(maxKeys, pageSize) // the fake's page bound bites
    while (it.hasNext && !truncated) {
      val e = it.next()
      if (!e.getKey.startsWith(prefix)) return (out.result(), false)
      if (n >= cap) truncated = true
      else {
        out += ObjMeta(e.getKey, e.getValue._1.length.toLong, e.getValue._2)
        n += 1
      }
    }
    (out.result(), truncated)
  }

  override def delete(key: String): Unit = { objects.remove(key); () }
}

object InMemoryObjectStore {
  private val buckets =
    scala.collection.concurrent.TrieMap.empty[String, InMemoryObjectStore]

  /** The process-wide store of a named bucket (created on first use). */
  def bucket(name: String): InMemoryObjectStore =
    buckets.getOrElseUpdate(name, new InMemoryObjectStore(name))
}

/** [[LogStore]] over an [[ObjectStoreApi]] — how the transaction log
  * runs where rename does not exist. Every trait operation maps to the
  * six object calls: the atomic claim IS the conditional PUT (no
  * temp-file dance — a PUT is already all-or-nothing at the key),
  * "directories" are key prefixes (mkdirs is a no-op, isDir is a 1-key
  * LIST probe), walks are paged LISTs that return size+mtime inline
  * (never a HEAD per file), and empty-marker objects (`key + "/"`,
  * zero bytes — the s3a convention) written by [[MemFileSystem]] are
  * recognized and skipped as non-files.
  */
final class ObjectStoreLogStore(
    resolve: String => (ObjectStoreApi, String)) extends LogStore {
  import LogStore.FileMeta
  import ObjectStoreApi.{listAll, ObjMeta}

  private def withKey[A](path: String)(f: (ObjectStoreApi, String) => A): A = {
    val (api, key) = resolve(path)
    f(api, key)
  }

  override def readBytes(path: String): Array[Byte] =
    withKey(path)((api, k) => api.get(k).getOrElse(
      throw new java.io.FileNotFoundException(path)))

  override def exists(path: String): Boolean = withKey(path) { (api, k) =>
    api.head(k).isDefined || api.listPage(k + "/", "", 1)._1.nonEmpty
  }

  override def isDir(path: String): Boolean = withKey(path) { (api, k) =>
    api.head(k).isEmpty && api.listPage(k + "/", "", 1)._1.nonEmpty
  }

  override def list(dir: String): Seq[String] = withKey(dir) { (api, k) =>
    val prefix = k + "/"
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    listAll(api, prefix).foreach { m =>
      val rel = m.key.stripPrefix(prefix)
      if (rel.nonEmpty) seen += rel.takeWhile(_ != '/')
    }
    seen.toSeq
  }

  override def walk(dir: String): Seq[FileMeta] = withKey(dir) { (api, k) =>
    val prefix = k + "/"
    listAll(api, prefix)
      .filter(m => !m.key.endsWith("/")) // skip dir markers
      .map(m => FileMeta(m.key.stripPrefix(prefix), m.size, m.mtimeMillis))
      .toList
  }

  override def walkDirs(dir: String): Seq[String] = withKey(dir) { (api, k) =>
    val prefix = k + "/"
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    listAll(api, prefix).foreach { m =>
      val rel = m.key.stripPrefix(prefix)
      // every proper ancestor prefix of the key is an implied directory
      val parts = rel.split("/", -1).toSeq.dropRight(1)
      parts.indices.foreach(i => seen += parts.take(i + 1).mkString("/"))
      if (rel.nonEmpty && rel.endsWith("/")) seen += rel.stripSuffix("/")
    }
    seen.toSeq.filter(_.nonEmpty)
  }

  override def mtimeMillis(path: String): Long =
    withKey(path)((api, k) => api.head(k).getOrElse(
      throw new java.io.FileNotFoundException(path)).mtimeMillis)

  /** Object stores have no directories to make — keys imply them. */
  override def mkdirs(dir: String): Unit = ()

  override def putIfAbsent(path: String, bytes: Array[Byte]): Boolean =
    withKey(path)((api, k) => api.putIfNoneMatch(k, bytes))

  override def putReplace(path: String, bytes: Array[Byte]): Unit =
    withKey(path)((api, k) => api.put(k, bytes))

  override def createMarker(path: String): Unit = withKey(path) { (api, k) =>
    if (!api.putIfNoneMatch(k, Array.emptyByteArray))
      throw new java.nio.file.FileAlreadyExistsException(path)
  }

  override def delete(path: String): Boolean = withKey(path) { (api, k) =>
    if (api.head(k).isDefined) { api.delete(k); true }
    else {
      // a "directory": deletable only when empty — i.e. nothing under it
      // except its own marker object
      val under = api.listPage(k + "/", "", 2)._1
      under match {
        case Seq(ObjMeta(only, _, _)) if only == k + "/" =>
          api.delete(only); true
        case _ => false
      }
    }
  }
}

object ObjectStoreLogStore {
  val MemScheme = "mem://"

  /** `mem://<bucket>/<key>` → the named in-memory bucket. */
  val Mem: ObjectStoreLogStore = new ObjectStoreLogStore(path => {
    val rest = path.stripPrefix(MemScheme)
    val i = rest.indexOf('/')
    require(i > 0, s"mem:// path needs a bucket and a key: $path")
    (InMemoryObjectStore.bucket(rest.substring(0, i)), rest.substring(i + 1))
  })
}
