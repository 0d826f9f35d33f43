package graft.io

/** The two [[LogStore]] substrates every commit-protocol spec should run
  * over: the fully atomic local hard-link store, and the in-process
  * OBJECT store (conditional-PUT claim, paged LIST, no rename, no
  * directories — [[InMemoryObjectStore]] via `mem://` roots, data files
  * included via [[MemFileSystem]]). Parameterizing the chaos/model/
  * rebase/vacuum specs over both proves the protocol under the
  * semantics 100 TB actually lives on, not just the dev filesystem's.
  */
object StoreFlavors {
  /** (label, fresh-root factory) per flavor. */
  def flavors(prefix: String): Seq[(String, () => String)] = Seq(
    "local" -> (() => Zones.tempDir(prefix)),
    "object-store" -> (() =>
      s"mem://$prefix-${java.util.UUID.randomUUID().toString.take(8)}/tbl"))
}
