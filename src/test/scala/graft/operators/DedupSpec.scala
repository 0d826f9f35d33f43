package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),  // near dup
    (4L, "completely different words entirely here now today")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts; keeper is min id") {
    val got = Dedup.exact(docs, "doc_id", "text")
      .select("keeper_id", "n_dups").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("minhash: exact duplicates share all bands; disjoint docs share none") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toMap2
    assert(pairs.get((1L, 2L)) === Some(2L)) // identical → both bands
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)) && !pairs.contains((3L, 4L)))
  }

  test("simhash: identical docs pair at hamming 0") {
    val got = Dedup.simhashPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toMap2
    assert(got.get((1L, 2L)) === Some(0L))
  }

  test("jaccard on minhash candidates: identical docs score 1.0") {
    val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toMap2
    assert(got.get((1L, 2L)) === Some(1.0))
    got.get((1L, 3L)).foreach(j => assert(j > 0.5 && j < 1.0)) // near-dup, if candidate
  }

  test("shingleRows produces the same shingle multiset as the shingles3 column form") {
    import org.apache.spark.sql.functions.{col, explode}
    val fromRows = Dedup.shingleRows(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().sorted.toSeq
    val fromCol = docs.select(col("doc_id"), explode(Dedup.shingles3(col("text"))).as("s"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(fromRows === fromCol)
  }

  test("exact-then-near equals full-corpus candidates with dup ids collapsed to keepers") {
    val onUniques = Dedup.nearDupOnUniques(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // map full-corpus pairs through keeper(2) = 1, drop self/exact pairs
    val keeper = Map(2L -> 1L).withDefault(identity)
    val expected = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .map { case (a, b) => (keeper(a) min keeper(b), keeper(a) max keeper(b)) }
      .filter { case (a, b) => a != b }.toSet
    assert(onUniques === expected)
    assert(!onUniques.exists { case (a, b) => a == 2L || b == 2L }) // 2 collapsed into 1
  }

  test("null texts produce no band signatures and no candidate pairs") {
    val withNulls = docs.unionByName(
      Seq((10L, null: String), (11L, null: String)).toDF("doc_id", "text"))
    val pairs = Dedup.minhashCandidates(withNulls, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // the r1 explode formulation dropped null rows; the null-text docs must
    // NOT pair with each other via a shared md5("") signature
    assert(!pairs.exists { case (a, b) => a >= 10L || b >= 10L })
    assert(pairs === Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet)
  }

  test("native MinHashExpr equals the shingle-explode + min-aggregation formulation") {
    import org.apache.spark.sql.functions._
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000))
    // reference: the r1 formulation, verbatim
    val h = Dedup.shingleRows(corpus, "doc_id", "text", 3)
      .select(
        col("doc_id"),
        conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long").as("h1"),
        conv(substring(md5(col("s")), 13, 12), 16, 10).cast("long").as("h2"))
    val minAggs = (0 until 8).map(k =>
      min((col("h1") + lit(k.toLong) * col("h2")) % lit(Dedup.MinhashMod)).as(s"m$k"))
    val reference = h.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"), array((0 until 8).map(k => col(s"m$k")): _*).as("m"))
      .as[(Long, Seq[Long])].collect().toMap
    val native = corpus
      .select(col("doc_id"), graft.plans.MinHashExpr(col("text"), 8).as("m"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native === reference)
  }

  test("native SimHashExpr equals the explode + bit-majority aggregation formulation") {
    import org.apache.spark.sql.functions._
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000))
    // reference: the r1 aggregation formulation, verbatim
    val bitSums = (0 until 32).map(j =>
      sum(when(shiftrightunsigned(col("h"), j) % 2 === 1, lit(1L)).otherwise(lit(-1L))).as(s"s$j"))
    val reference = corpus
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("word"))
      .withColumn("h", Dedup.md5Long(col("word"), 8))
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val native = corpus
      .select(col("doc_id"), graft.plans.SimHashExpr(col("text")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(native === reference)
  }

  test("cluster-based apply keeps exactly one doc per transitive component") {
    val d = (1L to 6L).map(i => (i, "g")).toDF("doc_id", "lang")
    // chain 1~2~3 (no direct 1~3 pair) + pair 4~5; 6 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = Dedup.survivorsFromPairs(d, pairs, "doc_id", "lang")
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("g", 3L))) // keepers 1 and 4, plus unpaired 6
  }

  test("cluster-based apply drops same-cluster docs that pair-wise dropping keeps") {
    val d = (1L to 4L).map(i => (i, "g")).toDF("doc_id", "lang")
    // pairs (2,4),(3,4): {2,3,4} are ONE component. Pair-wise losers =
    // {doc_b} = {4} would keep both 2 and 3; the cluster rule keeps only 2.
    val pairs = Seq((2L, 4L), (3L, 4L)).toDF("doc_a", "doc_b")
    val got = Dedup.survivorsFromPairs(d, pairs, "doc_id", "lang")
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("g", 2L))) // unpaired 1 + keeper 2
  }

  test("mega-dup guard: exact-then-near collapses 10^4 copies before LSH") {
    import org.apache.spark.sql.functions.{col, lit}
    // One boilerplate text duplicated 10^4× + one unrelated doc. Full-corpus
    // LSH would put all 10^4 ids in each band bucket (Σ bucket² ≈ 10^8
    // pairs); exact-first collapses them to ONE keeper before signaturing.
    val dup = spark.range(0, 10000)
      .select(col("id").as("doc_id"),
        lit("same boilerplate text repeated over and over again everywhere").as("text"))
      .unionByName(
        Seq((20000L, "completely different words entirely here now today")).toDF("doc_id", "text"))
    val uniques = dup.groupBy("text").agg(org.apache.spark.sql.functions.min(col("doc_id")).as("doc_id"))
    assert(Dedup.bandSignatures(uniques, "doc_id", "text").count() === 4L) // 2 docs × 2 bands
    assert(Dedup.nearDupOnUniques(dup, "doc_id", "text").count() === 0L)   // unrelated texts
  }

  test("incremental candidates against a signature store match the full-corpus pairs") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val old    = corpus.filter(col("doc_id") % 2 === 0)
    val fresh  = corpus.filter(col("doc_id") % 2 === 1)

    val store = Dedup.bandSignatures(old, "doc_id", "text")
    val incremental = Dedup.incrementalCandidates(fresh, store, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet

    // ground truth: full-corpus candidates restricted to pairs touching a new doc
    val full = Dedup.minhashCandidates(corpus, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .filter { case (a, b, _) => a % 2 == 1 || b % 2 == 1 }.toSet

    assert(incremental === full)
    assert(incremental.nonEmpty) // sf0.001 documents contain near-dups across the split
  }

  test("exact n-gram decontamination flags only the train doc sharing a 5-gram") {
    import spark.implicits._
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix alpha beta gamma delta epsilon suffix"), // shares "alpha beta gamma delta epsilon"
      (2L, "totally unrelated training document words here"),
      (3L, "alpha beta gamma unrelated tail words")          // shares only a 3-gram, not a 5-gram
    ).toDF("doc_id", "text")
    val got = Dedup.exactNgramContamination(eval, train, "doc_id", "text", 5)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L))
  }

  test("bloom decontamination ≡ exact n-gram decontamination on sf0.001 docs") {
    import spark.implicits._
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val eval  = d.filter($"doc_id" % 7 === 0)
    val train = d.filter($"doc_id" % 7 =!= 0)
    val viaBloom = Dedup.bloomDecontamination(eval, train, "doc_id", "text", 5)
      .as[(Long, Long)].collect().toSet
    val viaExact = Dedup.exactNgramContamination(eval, train, "doc_id", "text", 5)
      .as[(Long, Long)].collect().toSet
    assert(viaBloom === viaExact)
    assert(viaBloom.nonEmpty) // the synthetic corpus shares 5-grams across any split
  }

  test("bloom decontamination: empty eval set contaminates nothing") {
    import spark.implicits._
    val eval  = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val train = Seq((1L, "some training words here that are long enough")).toDF("doc_id", "text")
    assert(Dedup.bloomDecontamination(eval, train, "doc_id", "text", 5).count() === 0L)
  }

  test("jaccard estimate: identical docs estimate 1.0 and match the banding pairs") {
    val est = Dedup.jaccardEstimates(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toMap2
    assert(est.get((1L, 2L)) === Some(1.0)) // identical texts → all 8 positions agree
    val candPairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(est.keySet === candPairs) // estimate covers exactly the LSH candidates
    assert(est.values.forall(e => e >= 0.0 && e <= 1.0))
  }

  test("char-shingle decontamination counts exactly the shared 32-char windows") {
    val evalText = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEF" // 42 chars
    val eval = Seq((1L, evalText)).toDF("doc_id", "text")
    val train = Seq(
      // embeds chars 5..39 of the eval text (a 35-char verbatim span →
      // 35−31 = 4 shared windows), wrapped in foreign context
      (10L, "XX" + evalText.substring(5, 40) + "YY"),
      (11L, "completely different content with no shared span present here")
    ).toDF("doc_id", "text")
    val got = Dedup.charShingleContamination(eval, train, "doc_id", "text", trainStride = 1)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((10L, 4L)))
  }

  test("char-shingle stride guarantee: a 47-char shared span is detected at every offset") {
    // width 32, train stride 16 → any verbatim span ≥ 32+16−1 = 47 chars
    // contains an aligned train window no matter where it starts.
    val span = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJK" // 47+1 chars? use first 47
    val eval = Seq((1L, span.take(47))).toDF("doc_id", "text")
    val train = (0 until 20).map { off =>
      (100L + off, ("Z" * off) + span.take(47) + ("Q" * 30))
    }.toDF("doc_id", "text")
    val flagged = Dedup.charShingleContamination(eval, train, "doc_id", "text")
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(flagged === (100L until 120L).toSet)
  }

  test("char-shingle decontamination: short texts fall back to whole-text windows") {
    val eval  = Seq((1L, "tiny")).toDF("doc_id", "text")
    val train = Seq((10L, "tiny"), (11L, "tinyx")).toDF("doc_id", "text")
    val got = Dedup.charShingleContamination(eval, train, "doc_id", "text")
      .as[(Long, Long)].collect().toSeq
    // only the EXACT short text matches ("tinyx"'s single window is itself)
    assert(got === Seq((10L, 1L)))
  }

  test("normalized dedup: case/punct/space variants collapse; distinct texts don't") {
    val d = Seq(
      (1L, "Hello, World!", "A"),
      (2L, "hello   world", "A"),
      (3L, "HELLO WORLD.", "A"),
      (4L, "different text", "A"),
      (5L, "x", "B")
    ).toDF("doc_id", "text", "src")
    val got = Dedup.normalizedExact(d, "doc_id", "text", "src")
      .as[(String, Long, Long, Double)].collect()
      .map { case (g, a, b, r) => g -> ((a, b, r)) }.toMap
    assert(got("A") === ((4L, 2L, 0.5)))
    assert(got("B") === ((1L, 1L, 0.0)))
  }

  test("intra-doc repetition: cyclic text flags, unique text scores zero") {
    // 20-char block ×5 → 81 windows over exactly 20 distinct values, max
    // multiplicity 5; the 36-char pangram-ish doc has 17 distinct windows
    val d = Seq(
      (1L, "ABCDEFGHIJKLMNOPQRST" * 5, "loop"),
      (2L, "abcdefghijklmnopqrstuvwxyz0123456789", "uniq")
    ).toDF("doc_id", "text", "src")
    val got = Dedup.intraDocRepetition(d, "doc_id", "text", "src")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("loop") === ((1L, 81L, 20L, 1L, 0.753086)))
    assert(got("uniq") === ((1L, 17L, 17L, 0L, 0.0)))
  }

  test("sorted neighborhood pairs same-prefix docs within the rank window, blocks isolate") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),   // same 24-char key as 1
      (3L, "alpha beta gamma DIFFERENT tail here"), // same block, different key
      (4L, "omega psi chi phi")                     // different block — never paired
    ).toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhoodPairs(d, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 1L), (1L, 3L, 0L), (2L, 3L, 0L)))
  }

  test("lsh calibration: buckets tally jaccardEstimates; dup pairs count as true positives") {
    val cal = Dedup.lshCalibration(docs, "doc_id", "text").collect()
    val est = Dedup.jaccardEstimates(docs, "doc_id", "text")
      .groupBy("n_match").count()
      .as[(Long, Long)].collect().toMap
    assert(cal.nonEmpty)
    cal.foreach { r =>
      val nm = r.getAs[Long]("n_match")
      assert(r.getAs[Long]("n_pairs") === est(nm), s"bucket $nm")
      assert(r.getAs[Long]("n_true") <= r.getAs[Long]("n_pairs"))
      assert(r.getAs[Double]("min_jaccard") <= r.getAs[Double]("max_jaccard"))
      assert(r.getAs[Double]("est_jaccard") === nm / 8.0)
    }
    assert(cal.map(_.getAs[Long]("n_pairs")).sum === est.values.sum)
    // the exact-dup pair (1,2) sits in the all-match bucket with exact 1.0
    val full = cal.find(_.getAs[Long]("n_match") === 8L).get
    assert(full.getAs[Long]("n_true") >= 1L && full.getAs[Double]("max_jaccard") === 1.0)
  }

  test("bbitEstimates: parity agreement dominates full agreement; exact dups read 1.0 both ways") {
    val bb = Dedup.bbitEstimates(docs, "doc_id", "text").collect()
    val full = Dedup.jaccardEstimates(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "n_match").as[(Long, Long, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(bb.nonEmpty && bb.length === full.size)
    bb.foreach { r =>
      val (nm, nb) = (r.getAs[Long]("n_match"), r.getAs[Long]("n_bit"))
      // equal minhash values force equal parities, never the reverse
      assert(nb >= nm && nb <= 8L)
      assert(nm === full((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))))
      assert(r.getAs[Long]("est_full_ppm") === nm * 125000L)
      assert(r.getAs[Long]("est_1bit_ppm") === (nb * 2 - 8) * 125000L)
      assert(r.getAs[Long]("err_ppm") ===
        math.abs(r.getAs[Long]("est_1bit_ppm") - r.getAs[Long]("est_full_ppm")))
    }
    // the exact-dup pair agrees on every hash, so both estimates read 1.0
    val exact = bb.find(r => r.getAs[Long]("n_match") === 8L).get
    assert(exact.getAs[Long]("est_1bit_ppm") === 1000000L)
  }

  test("editDistanceVerify: exact Levenshtein on normalized prefixes, threshold verdict") {
    val d = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma DELTA!"), // normalizes identically → dist 0
      (3L, "alpha beta gampa delta"),  // one substitution → dist 1
      (4L, "omega psi chi phi")        // different block — never paired
    ).toDF("doc_id", "text")
    val got = Dedup.editDistanceVerify(d, "doc_id", "text")
      .select("doc_a", "doc_b", "edit_dist").as[(Long, Long, Long)].collect().toMap2
    assert(got === Map((1L, 2L) -> 0L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
    val matches = Dedup.editDistanceVerify(d, "doc_id", "text", maxDist = 0)
      .select("doc_a", "doc_b", "is_match").as[(Long, Long, Long)].collect().toMap2
    assert(matches === Map((1L, 2L) -> 1L, (1L, 3L) -> 0L, (2L, 3L) -> 0L))
  }

  test("containmentPairs: identical docs contain each other fully; asymmetric otherwise") {
    val got = Dedup.containmentPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "contain_a", "contain_b")
      .as[(Long, Long, Double, Double)].collect()
      .map { case (a, b, ca, cb) => (a, b) -> ((ca, cb)) }.toMap
    assert(got((1L, 2L)) === ((1.0, 1.0)))
    // near-dup pair, if it survives LSH: one bigram of 8 differs → 7/8 each way
    got.get((1L, 3L)).foreach { case (ca, cb) => assert(ca === 0.875 && cb === 0.875) }
    assert(!got.contains((1L, 4L)) && !got.contains((3L, 4L)))
  }

  test("prefixFilterPairs: exact recall at tau — identical docs found, sub-tau pairs cut") {
    val got = Dedup.prefixFilterPairs(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toMap2
    // (1,2) identical → jaccard 1.0; (1,3) shares 7 of 9 bigrams (0.778 < 0.9) → cut
    assert(got === Map((1L, 2L) -> 1.0))
    // at tau = 7/10 the near-dup pair qualifies too (7/9 ≥ 0.7 ⇔ 17·7 ≥ 9·16... exact check below)
    val loose = Dedup.prefixFilterPairs(docs, "doc_id", "text", tauNum = 7, tauDen = 10)
      .as[(Long, Long, Double)].collect().toMap2
    assert(loose.contains((1L, 2L)) && loose.contains((1L, 3L)))
    assert(loose((1L, 3L)) === 0.777778)
  }

  implicit private class Pairs[V](rows: Array[(Long, Long, V)]) {
    def toMap2: Map[(Long, Long), V] = rows.map { case (a, b, v) => (a, b) -> v }.toMap
  }
}
