package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Adversarial duplication fixture: ONE text repeated 100,000× alongside a
  * small distinct tail — the worst case for LSH banding, where every copy
  * lands in the same band buckets and a naive self-join materializes
  * Σ bucket² ≈ 10¹⁰ pairs. The chain stays bounded because of the
  * EXACT-FIRST composition: exact dedup collapses the clones to one keeper
  * before any band signature is computed. This spec pins each link.
  */
class MegaClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 100000
  private val mega = "the same exact document text repeated everywhere forever"

  private lazy val corpus = {
    val clones = (1 to N).map(i => (i.toLong, mega, "web"))
    val tail = (1 to 200).map(i =>
      (N + i.toLong, s"distinct document number $i with its own words here", "books"))
    (clones ++ tail).toDF("doc_id", "text", "source")
      .repartition(4)
      .localCheckpoint(false) // fixture built once, probed many times
  }

  test("banding the raw corpus WOULD be unbounded: one band bucket holds all 100k clones") {
    val buckets = Dedup.bandSignatures(corpus, "doc_id", "text")
      .groupBy("b", "bsig").agg(count(lit(1)).as("c"))
    val worst = buckets.agg(max(col("c"))).head.getLong(0)
    // the hazard is real: Σ bucket² over this bucket alone is 10^10 pairs
    assert(worst === N.toLong, s"expected the mega-cluster bucket, got $worst")
  }

  test("exact-first composition keeps band buckets bounded by DISTINCT content") {
    val uniques = corpus.groupBy("text").agg(min(col("doc_id")).as("doc_id"))
    val worst = Dedup.bandSignatures(uniques, "doc_id", "text")
      .groupBy("b", "bsig").agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head.getLong(0)
    assert(worst <= 201L, s"band bucket exceeded distinct-content bound: $worst")
    // and the candidate-pair relation over uniques is at most C(201,2),
    // not C(100200,2) — the join is actually executable
    val pairs = Dedup.nearDupOnUniques(corpus, "doc_id", "text").count()
    assert(pairs <= 201L * 200 / 2, s"pair relation not bounded by uniques: $pairs")
  }

  test("exact dedup collapses the 100k clones to one keeper without driver-side state") {
    val kept = Dedup.exact(corpus, "doc_id", "text")
    assert(kept.count() === 201L)
    val megaRow = kept.orderBy(desc("n_dups")).head()
    assert(megaRow.getAs[Long]("n_dups") === N.toLong)
    assert(megaRow.getAs[Long]("keeper_id") === 1L,
      "keeper must be the deterministic min id")
  }

  test("cluster roll-up over the mega component stays capped (no unbounded collect_list)") {
    // the exact-dup pair graph of the mega cluster: star on the keeper —
    // 99,999 edges, one component; the q66-style roll-up caps member ids
    val pairs = corpus.filter(col("text") === mega)
      .filter(col("doc_id") > 1L)
      .select(lit(1L).as("doc_a"), col("doc_id").as("doc_b"))
    val labels = ConnectedComponents.labels(pairs, "doc_a", "doc_b")
    assert(labels.agg(countDistinct(col("cluster_id"))).head.getLong(0) === 1L)
    val rolled = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("sz"),
        slice(sort_array(collect_set(col("node"))), 1, 20).as("members"))
      .head()
    assert(rolled.getAs[Long]("sz") === N.toLong)
    assert(rolled.getSeq[Long](2).length === 20, "roll-up must cap, not enumerate 100k ids")
  }

  test("the full curation funnel runs bounded end-to-end on the adversarial corpus") {
    // quality gate passes everything here (threshold 0); the funnel's
    // near-dup stage must still complete because its pair generation runs
    // over the quality-surviving set whose banding is dominated by the
    // mega bucket ONLY IF composed wrong — funnel uses minhashCandidates
    // directly, so feed it the exact-deduped survivors, which is the
    // documented composition (q300's pipeline card does the same)
    val uniques = corpus.groupBy("text")
      .agg(min(col("doc_id")).as("doc_id"), min(col("source")).as("source"))
    val out = Curation.funnel(uniques, "doc_id", "text", "source", qualityThreshold = 0.0)
      .collect()
    val total = out.map(_.getAs[Long]("n_final")).sum
    assert(total >= 1L && total <= 201L)
  }
}
