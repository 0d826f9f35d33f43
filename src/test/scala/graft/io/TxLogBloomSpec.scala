package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Per-file bloom-filter data skipping: point lookups on a column the
  * table is NOT clustered by must prune at plan time — the exact shape
  * where min/max zone maps are provably useless (every file's range
  * spans the whole key domain). Proven mechanically: the planned file
  * set via `lastListed`, the sidecar-read bound via `bloomReads`,
  * checkpoint survival, vacuum liveness, and the hash-reconciliation
  * rules for widened literals.
  */
class TxLogBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 8 appends; file f holds ids {8i : i ≡ f (mod 8)} — every file's
    * [min, max] spans essentially the whole domain, so zone maps keep
    * all 8 files for any in-range lookup; only the blooms can prune.
    */
  private def interleavedTable(): String = {
    import spark.implicits._
    val root = Zones.tempDir("txbloom")
    (0 until 8).foreach { f =>
      val df = (0 until 1000).map(i => (8L * (i * 8 + f), s"row-$f-$i"))
        .toDF("id", "payload")
      TxLog.commit(spark, root, df.coalesce(1), TxLog.Append,
        statsCols = Seq("id"), bloomCols = Map("id" -> 1000L))
    }
    root
  }

  test("point lookup on a non-clustering column prunes via blooms where zone maps keep everything") {
    val root = interleavedTable()
    // id = 8*(502*8+6) lives in file 6; its zone map [48, ~63k] overlaps
    // every file's — only the bloom isolates it
    val present = 8L * (502 * 8 + 6)
    val hit = TxLog.snapshot(spark, root).filter(col("id") === present)
    val rows = hit.collect()
    assert(rows.length === 1 && rows(0).getString(1) === "row-6-502")
    val kept = TxLogFileIndex.of(hit).lastListed
    assert(kept.size < 8, s"blooms pruned nothing: kept ${kept.size}/8 files")
    assert(kept.size <= 3, s"expected ~1 file (+fp slack), kept ${kept.size}")

    // absent id INSIDE every file's [min, max]: zone maps keep all 8,
    // blooms prove absence — the scan should plan (almost) no files
    val miss = TxLog.snapshot(spark, root).filter(col("id") === 4013L)
    assert(miss.count() === 0L)
    assert(TxLogFileIndex.of(miss).lastListed.size <= 1,
      "absent-key lookup should prune essentially everything")
  }

  test("IN-list probes each literal and keeps the union of matching files") {
    val root = interleavedTable()
    val ids = Seq(0, 1, 2).map(f => 8L * (100 * 8 + f)) // files 0, 1, 2
    val q = TxLog.snapshot(spark, root).filter(col("id").isin(ids: _*))
    assert(q.count() === 3L)
    val kept = TxLogFileIndex.of(q).lastListed
    assert(kept.size >= 3 && kept.size <= 5,
      s"expected the 3 matching files (+fp slack), kept ${kept.size}")
  }

  test("planning pays at most one sidecar read per (surviving file, probed column)") {
    val root = interleavedTable()
    val q = TxLog.snapshot(spark, root).filter(col("id") === 48L)
    TxLogFileIndex.bloomReads.set(0L)
    q.collect()
    val reads = TxLogFileIndex.bloomReads.get()
    assert(reads <= 8L, s"one lookup read $reads sidecars; bound is 8 (files × 1 col)")
    assert(reads > 0L, "lookup never consulted a bloom")
  }

  test("blooms survive checkpoint-bounded replay") {
    import spark.implicits._
    val root = Zones.tempDir("txbloomck")
    (0 until 12).foreach { f =>
      val df = (0 until 500).map(i => (12L * (i * 12 + f), f)).toDF("id", "src")
      TxLog.commit(spark, root, df.coalesce(1), TxLog.Append,
        statsCols = Seq("id"), bloomCols = Map("id" -> 500L))
    }
    // the c10 checkpoint carries the bloom declarations; destroy every
    // pre-checkpoint manifest — pruning must not care
    (1 to 9).foreach { k =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, "_txlog", f"v$k%08d.json"),
        "garbage".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val present = 12L * (77 * 12 + 3)
    val q = TxLog.snapshot(spark, root).filter(col("id") === present)
    assert(q.count() === 1L)
    assert(TxLogFileIndex.of(q).lastListed.size <= 3,
      "checkpoint replay lost the bloom declarations")
  }

  test("a merge carries untouched files' blooms by reference; rewritten files degrade to keep-all") {
    import spark.implicits._
    // range-clustered so the merge's interval hit-test stays narrow:
    // file f holds ids [1000f, 1000f+999], bloom-indexed
    val root = Zones.tempDir("txbloomm")
    (0 until 4).foreach { f =>
      val df = (0 until 1000).map(i => (1000L * f + i, s"row-$f-$i"))
        .toDF("id", "payload")
      TxLog.commit(spark, root, df.coalesce(1), TxLog.Append,
        statsCols = Seq("id"), bloomCols = Map("id" -> 1000L))
    }
    TxLog.merge(spark, root, Seq((1500L, "patched")).toDF("id", "payload"), "id")
    val r = TxLog.replay(root, TxLog.headVersion(root))
    val (bloomed, bare) = r.entries.partition(_.blooms.nonEmpty)
    // 3 carried entries keep their bloom declaration (and sidecar);
    // the merge's rewritten file(s) honestly declare none
    assert(bloomed.size === 3, s"carry lost bloom declarations: ${r.entries.map(_.blooms)}")
    assert(bare.nonEmpty, "merge should have rewritten the touched file without a bloom")
    bloomed.foreach { e =>
      assert(java.nio.file.Files.isRegularFile(
        java.nio.file.Paths.get(root).resolve(Bloom.sidecar(e.path, "id"))),
        s"carried sidecar missing for ${e.path}")
    }
    // the patched row reads back (no false skip of the bloom-less rewrite)
    assert(TxLog.snapshot(spark, root).filter(col("id") === 1500L)
      .head().getString(1) === "patched")
    // and a carried file's bloom still answers: absent key inside the
    // carried files' ranges plans only the bloom-less rewrite
    val miss = TxLog.snapshot(spark, root).filter(col("id") === 250L)
    assert(miss.count() === 1L) // 250 lives in carried file 0 — a HIT, kept
    val q = TxLog.snapshot(spark, root).filter(col("id") === 999999L)
    assert(q.count() === 0L)
  }

  test("vacuum deletes a dead file's sidecar and keeps live ones") {
    import spark.implicits._
    val root = interleavedTable()
    def sidecars(): Seq[java.nio.file.Path] = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "data"))
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.filter(_.getFileName.toString.endsWith(".bloom")).toList
      } finally w.close()
    }
    assert(sidecars().size === 8)
    // overwrite the table: all 8 original files (and sidecars) go dead
    TxLog.commit(spark, root,
      Seq((1L, "fresh")).toDF("id", "payload").coalesce(1), TxLog.Overwrite,
      bloomCols = Map("id" -> 10L))
    TxLog.vacuum(root, retainFrom = TxLog.headVersion(root))
    val left = sidecars()
    assert(left.size === 1, s"expected only the live file's sidecar, got ${left.size}")
    // the survivor still prunes
    val q = TxLog.snapshot(spark, root).filter(col("id") === 2L)
    assert(q.count() === 0L)
  }

  test("string-keyed blooms prune point lookups — the url/doc-id shape of an LLM corpus") {
    import spark.implicits._
    val root = Zones.tempDir("txbloomstr")
    // interleave by hash so every file's string [min, max] spans the
    // whole key domain — only the bloom can isolate a key
    (0 until 8).foreach { f =>
      val df = (0 until 1000).map { i =>
        val k = f"doc-${i * 8 + f}%06d"
        (k, s"payload-$k")
      }.toDF("key", "payload")
      TxLog.commit(spark, root, df.coalesce(1), TxLog.Append,
        statsCols = Seq("key"), bloomCols = Map("key" -> 1000L))
    }
    // present key: i*8+f = 4022 → i=502, f=6
    val hit = TxLog.snapshot(spark, root).filter(col("key") === "doc-004022")
    assert(hit.count() === 1L)
    assert(TxLogFileIndex.of(hit).lastListed.size <= 3,
      "string bloom pruned nothing on a present-key lookup")
    // absent key inside every file's [min, max] lexicographic range
    val miss = TxLog.snapshot(spark, root).filter(col("key") === "doc-004021x")
    assert(miss.count() === 0L)
    assert(TxLogFileIndex.of(miss).lastListed.size <= 1,
      "string bloom should prove absence")
  }

  test("a bloom stays conservatively correct after a DV delete of its only match") {
    val root = interleavedTable()
    // delete the single row the bloom would route a lookup to: the
    // (unchanged) bloom still KEEPS the file — a false keep, never a
    // false skip — and the DV subtraction returns zero rows
    val present = 8L * (502 * 8 + 6)
    TxLog.deleteVectors(spark, root, col("id") === present)
    val q = TxLog.snapshot(spark, root).filter(col("id") === present)
    assert(q.count() === 0L, "deleted row must not resurrect through the bloom path")
    // a different key in the same file still reads
    assert(TxLog.snapshot(spark, root)
      .filter(col("id") === 8L * (501 * 8 + 6)).count() === 1L)
  }

  test("probeHash reconciles widened literals against the write-time type") {
    import org.apache.spark.sql.types._
    // long literal probing an int-typed bloom hashes the INT image
    val viaLong = Bloom.probeHash(java.lang.Long.valueOf(5L), LongType, "int")
    val direct = Bloom.probeHash(java.lang.Integer.valueOf(5), IntegerType, "int")
    assert(viaLong === direct && viaLong.exists(_.isRight))
    // same width: identity
    assert(Bloom.probeHash(java.lang.Long.valueOf(5L), LongType, "bigint").exists(_.isRight))
    // a literal that cannot fit the write-time type is a PROVEN skip
    assert(Bloom.probeHash(java.lang.Long.valueOf(Long.MaxValue), LongType, "int")
      === Some(Left(())))
    // unreconcilable types keep the file
    assert(Bloom.probeHash(java.lang.Double.valueOf(1.5), DoubleType, "int") === None)
  }
}
