package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.TestSpark
import graft.GenSampling.forAllSampled

/** SP1 branch semantics (reference `preprocess_to_staging.py:14-74`):
  * golden expectations for n = 1, 2, 3, 4, 7 plus the partition property
  * over arbitrary class-size multisets.
  */
class StratifiedSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def splitsFor(sizes: Seq[Int]): Map[(String, String), Long] = {
    val rows = sizes.zipWithIndex.flatMap { case (n, ci) =>
      (0 until n).map(i => (s"class_$ci", ci * 1000 + i))
    }
    StratifiedSplit
      .withSplit(rows.toDF("cls", "ord"), "cls", "ord")
      .groupBy("cls", "split")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
  }

  test("n=1 goes to test") {
    assert(splitsFor(Seq(1)) === Map(("class_0", "test") -> 1L))
  }

  test("n=2: first row (file order) to dev, second to test") {
    val df = Seq(("c", 1), ("c", 2)).toDF("cls", "ord")
    val got = StratifiedSplit.withSplit(df, "cls", "ord")
      .select("ord", "split").as[(Int, String)].collect().toMap
    assert(got === Map(1 -> "dev", 2 -> "test"))
  }

  test("n=3: rows 1,2,3 in file order to train, dev, test") {
    val df = Seq(("c", 10), ("c", 20), ("c", 30)).toDF("cls", "ord")
    val got = StratifiedSplit.withSplit(df, "cls", "ord")
      .select("ord", "split").as[(Int, String)].collect().toMap
    assert(got === Map(10 -> "train", 20 -> "dev", 30 -> "test"))
  }

  test("n=4: int(4*.33)=1 test, int(3*.33)=0 dev, 3 train") {
    val got = splitsFor(Seq(4))
    assert(got.getOrElse(("class_0", "test"), 0L) === 1L)
    assert(got.getOrElse(("class_0", "dev"), 0L) === 0L)
    assert(got.getOrElse(("class_0", "train"), 0L) === 3L)
  }

  test("n=7: 2 test, 1 dev, 4 train") {
    val got = splitsFor(Seq(7))
    assert(got.getOrElse(("class_0", "test"), 0L) === 2L)
    assert(got.getOrElse(("class_0", "dev"), 0L) === 1L)
    assert(got.getOrElse(("class_0", "train"), 0L) === 4L)
  }

  test("property: per-class counts follow the four branches exactly") {
    val sizesGen = Gen.listOfN(6, Gen.choose(1, 12))
    forAllSampled(sizesGen, 5) { sizes =>
      val got = splitsFor(sizes)
      sizes.zipWithIndex.foreach { case (n, ci) =>
        val c = s"class_$ci"
        val (t, d, tr) = (
          got.getOrElse((c, "test"), 0L),
          got.getOrElse((c, "dev"), 0L),
          got.getOrElse((c, "train"), 0L))
        assert(t + d + tr === n.toLong, s"partition for n=$n")
        n match {
          case 1 => assert((tr, d, t) === ((0L, 0L, 1L)))
          case 2 => assert((tr, d, t) === ((0L, 1L, 1L)))
          case 3 => assert((tr, d, t) === ((1L, 1L, 1L)))
          case _ =>
            val nTest = math.floor(n * 0.33).toLong
            val nDev  = math.floor((n - nTest) * 0.33).toLong
            assert((t, d, tr) === ((nTest, nDev, n - nTest - nDev)))
        }
      }
    }
  }
}
