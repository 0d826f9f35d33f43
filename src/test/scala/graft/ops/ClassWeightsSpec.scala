package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.TestSpark
import graft.GenSampling.forAllSampled

/** A10: the reference's 3-step normalize (1/n → /sum → /max) collapses to
  * w_c = n_min/n_c; both forms implemented, proven equal here.
  */
class ClassWeightsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def trainDf(counts: Map[String, Int]) =
    counts.toSeq.flatMap { case (c, n) => Seq.fill(n)(c) }.toDF("cls")

  test("closed form w_c = n_min / n_c") {
    val got = ClassWeights.weights(trainDf(Map("a" -> 4, "b" -> 2, "c" -> 8)), "cls")
      .as[(String, Double)].collect().toMap
    assert(got === Map("a" -> 0.5, "b" -> 1.0, "c" -> 0.25))
  }

  test("property: closed form equals the literal 3-step normalize; max weight is 1; all in (0,1]") {
    val countsGen = Gen.mapOfN(4, Gen.zip(Gen.identifier.map(_.take(6)), Gen.choose(1, 20)))
      .suchThat(_.nonEmpty)
    forAllSampled(countsGen, 5) { counts =>
      val df      = trainDf(counts)
      val closed  = ClassWeights.weights(df, "cls").as[(String, Double)].collect().toMap
      val literal = ClassWeights.weightsLiteral(df, "cls").as[(String, Double)].collect().toMap
      assert(closed === literal)
      assert(closed.values.max === 1.0)
      assert(closed.values.forall(w => w > 0.0 && w <= 1.0))
    }
  }
}
