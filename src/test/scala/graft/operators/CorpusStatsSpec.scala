package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vocab growth: words bucket at first occurrence; cumulative sum is total vocab") {
    val docs = Seq(
      (0L, "a b c"),
      (1L, "a b d"),     // d is new
      (150L, "a e"),     // e is new, bucket 1
      (250L, "b f g")    // f g new, bucket 2
    ).toDF("doc_id", "text")
    val got = CorpusStats.vocabGrowth(docs, "doc_id", "text", bucketWidth = 100L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 4L, 4L), (1L, 1L, 5L), (2L, 2L, 7L)))
  }

  test("vocab growth: cumulative column is monotone and ends at the distinct word count") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = CorpusStats.vocabGrowth(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.map(_._3) === rows.map(_._2).scanLeft(0L)(_ + _).tail)
    val vocab = docs
      .selectExpr("explode(split(text, ' ')) AS w")
      .where("length(w) > 0").select("w").distinct().count()
    assert(rows.last._3 === vocab)
  }

  test("bigram log-prob matches the hand-computed LM on a 3-doc corpus") {
    // corpus bigrams: "a b" ×2, "a c" ×1; context a ×3
    // lp(a b) = ln(2/3), lp(a c) = ln(1/3), quantized to 1e-6 integers
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo")).toDF("doc_id", "text")
    val got = CorpusStats.bigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toMap2
    def q(x: Double) = math.round(math.log(x) * 1e6)
    assert(got(1L) === (1L, q(2.0 / 3.0) / 1e6))
    assert(got(2L) === got(1L))
    assert(got(3L) === (1L, q(1.0 / 3.0) / 1e6))
    assert(!got.contains(4L)) // one-word doc has no bigram
  }

  test("bigram log-prob: repeated bigram within one doc weights its count") {
    // doc 1 has "x y" twice and "y x" once; corpus counts: "x y"×2 (ctx x=2), "y x"×1 (ctx y=1)
    val docs = Seq((1L, "x y x y")).toDF("doc_id", "text")
    val got = CorpusStats.bigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toMap2
    // P(y|x) = 2/2 = 1 and P(x|y) = 1/1 = 1 → every bigram surprisal is 0
    assert(got(1L) === (3L, 0.0))
  }

  test("log-odds terms: a group-exclusive word tops its group with positive z") {
    val docs = Seq(
      (1L, "alpha beta gamma", "g1"),
      (2L, "alpha beta xonly", "g1"),
      (3L, "alpha beta gamma", "g2"),
      (4L, "alpha beta delta", "g2")
    ).toDF("doc_id", "text", "source")
    val got = CorpusStats.logOddsTerms(docs, "text", "source", topK = 2)
      .as[(String, Long, String, Long, Double)].collect().toSeq
    val byGroup = got.groupBy(_._1)
    assert(byGroup("g1").head === (("g1", 1L, "xonly", 1L, byGroup("g1").head._5)))
    assert(byGroup("g1").head._5 > 0.0)
    assert(byGroup("g2").head._3 === "delta")
    assert(got.forall(_._2 <= 2L))
  }

  test("word entropy: uniform distribution gives ln(vocab); constant text gives zero") {
    val docs = Seq(
      (1L, "a b c d", "uniform"),   // 4 words once each → H = ln 4
      (2L, "x x x x", "constant")   // one word → H = 0
    ).toDF("doc_id", "text", "source")
    val got = CorpusStats.wordEntropy(docs, "text", "source")
      .as[(String, Long, Long, Double)].collect().toMap2k
    assert(got("constant") === ((4L, 1L, 0.0)))
    assert(got("uniform")._1 === 4L && got("uniform")._2 === 4L)
    assert(math.abs(got("uniform")._3 - math.log(4)) < 1e-5)
  }

  implicit private class Rows3[V](rows: Array[(String, Long, Long, V)]) {
    def toMap2k: Map[String, (Long, Long, V)] =
      rows.map { case (k, a, b, v) => k -> ((a, b, v)) }.toMap
  }

  test("zipf slope: an exactly 1/rank frequency profile regresses to -1") {
    // counts 12, 6, 4, 3 = 12/rank → ln y = ln 12 − ln rank exactly,
    // so the quantized regression slope is −1 up to 1e-6 rounding.
    val words = Seq("aa" -> 12, "bb" -> 6, "cc" -> 4, "dd" -> 3)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val docs = Seq((1L, text, "z")).toDF("doc_id", "text", "source")
    val got = CorpusStats.zipfSlope(docs, "text", "source")
      .as[(String, Long, Double)].collect().toSeq
    assert(got.length === 1)
    assert(got.head._2 === 4L)
    assert(math.abs(got.head._3 - (-1.0)) < 1e-4, s"slope was ${got.head._3}")
  }

  test("source n-gram Jaccard: shared shingle sets give exact ratios; short texts shingle whole") {
    // A: {"a b c","b c d"}; B: {"a b c"}; inter 1, union 2 → 0.5
    // C: single word → whole-text shingle {"zz"}, shares nothing → no row
    val docs = Seq(
      (1L, "a b c d", "A"),
      (2L, "a b c", "B"),
      (3L, "zz", "C")
    ).toDF("doc_id", "text", "source")
    val got = CorpusStats.sourceNgramJaccard(docs, "doc_id", "text", "source")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === Seq(("A", "B", 1L, 0.5)))
  }

  test("jsd: identical distributions diverge 0; disjoint vocabularies diverge ln 2") {
    val same = Seq(
      (1L, "x x y", "A"),
      (2L, "x x y", "B")).toDF("doc_id", "text", "source")
    val gotSame = CorpusStats.jsDivergence(same, "text", "source")
      .select("source", "jsd_nats").as[(String, Double)].collect().toMap
    assert(gotSame.values.forall(v => math.abs(v) < 1e-6))

    val disjoint = Seq(
      (1L, "x x y", "A"),
      (2L, "p q q", "B")).toDF("doc_id", "text", "source")
    val gotDisj = CorpusStats.jsDivergence(disjoint, "text", "source")
      .select("source", "jsd_nats").as[(String, Double)].collect().toMap
    assert(gotDisj.values.forall(v => math.abs(v - math.log(2.0)) < 1e-5))
  }

  test("jsd matches an unquantized double reference on a mixed fixture") {
    val docs = Seq(
      (1L, "a a b c", "A"),
      (2L, "a b b b d", "B"),
      (3L, "a c c", "C")).toDF("doc_id", "text", "source")
    val got = CorpusStats.jsDivergence(docs, "text", "source")
      .select("source", "jsd_nats").as[(String, Double)].collect().toMap
    // reference: plain-double JSD of each source vs the other two pooled
    val counts = Map(
      "A" -> Map("a" -> 2L, "b" -> 1L, "c" -> 1L),
      "B" -> Map("a" -> 1L, "b" -> 3L, "d" -> 1L),
      "C" -> Map("a" -> 1L, "c" -> 2L))
    val vocab = counts.values.flatMap(_.keys).toSet
    counts.keys.foreach { g =>
      val np = counts(g).values.sum.toDouble
      val rest = counts.filter(_._1 != g).values
      val nq = rest.map(_.values.sum).sum.toDouble
      val jsd = vocab.toSeq.map { w =>
        val p = counts(g).getOrElse(w, 0L) / np
        val q = rest.map(_.getOrElse(w, 0L)).sum / nq
        val m = 0.5 * (p + q)
        (if (p > 0) 0.5 * p * math.log(p / m) else 0.0) +
          (if (q > 0) 0.5 * q * math.log(q / m) else 0.0)
      }.sum
      assert(math.abs(got(g) - jsd) < 1e-5, s"source $g: got ${got(g)}, want $jsd")
    }
  }

  test("jsd: single-group corpus is finite (rest treated as the empty distribution)") {
    // q ≡ 0 ⇒ m = p/2 ⇒ JSD degenerates to ½·Σ p·ln 2 = ½·ln 2, not NaN
    val docs = Seq((1L, "a b c", "A")).toDF("doc_id", "text", "source")
    val got = CorpusStats.jsDivergence(docs, "text", "source")
      .select("jsd_nats").as[Double].collect()
    assert(got.length === 1 && math.abs(got(0) - 0.5 * math.log(2.0)) < 1e-6)
  }

  test("heavy hitters: exact vs plain groupBy formulation, even with forced CMS collisions") {
    // 40 docs of boilerplate phrase + unique tails: "spam ham" occurs 40×
    // (> 1/10 of the bigram stream), tails are singletons.
    val docs = (0 until 40).map(i => (i.toLong, s"spam ham u$i v$i")).toDF("doc_id", "text")
    def plain(phiDenom: Long): Map[String, Long] = {
      val grams = docs.select(
        org.apache.spark.sql.functions.explode(
          graft.plans.WordShingles(org.apache.spark.sql.functions.col("text"), 2)).as("g"))
      val total = grams.count()
      val thr = (total + phiDenom - 1) / phiDenom
      grams.groupBy("g").count().where(s"count >= $thr")
        .as[(String, Long)].collect().toMap
    }
    for (width <- Seq(4, 8192)) { // width=4 forces heavy collision overcounting
      val got = CorpusStats.heavyHitters(docs, "text", phiDenom = 10L, width = width)
        .select("gram", "n").as[(String, Long)].collect().toMap
      assert(got === plain(10L), s"width=$width")
    }
  }

  test("heavy hitters: share sums the bucket counts over the exact stream total") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // bigram stream: "a b","b a","a b" + "a b","b c" → total 5; thr(φ=1/2)=3 → only "a b" (3)
    val got = CorpusStats.heavyHitters(docs, "text", phiDenom = 2L)
      .as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(("a b", 3L, 0.6)))
  }

  test("bpe merges replay the classic low/lower example, ties break lexicographically") {
    // vocab: low ×2, lower ×1. Pair counts: (l o)=3, (o w)=3, (w e)=1, (e r)=1.
    // Tie at 3 → lexicographic "l o" first; then "lo w"; then "e r" < "low e".
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val got = CorpusStats.bpeTrain(docs, "text", numMerges = 5)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "l o", "lo", 3L),
      (2L, "lo w", "low", 3L),
      (3L, "e r", "er", 1L),
      (4L, "low er", "lower", 1L)))
  }

  implicit private class Rows[V](rows: Array[(Long, Long, V)]) {
    def toMap2: Map[Long, (Long, V)] = rows.map { case (a, b, v) => a -> ((b, v)) }.toMap
  }
}
