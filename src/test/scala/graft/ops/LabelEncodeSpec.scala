package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** E1-E3: sklearn LabelEncoder semantics — lexicographic sort, dense codes
  * 0..K-1 (reference `preprocess_to_staging.py:124-129`).
  */
class LabelEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codes are dense 0..K-1 in lexicographic order") {
    val df = Seq("banana", "apple", "cherry", "apple", "banana").toDF("k")
    val got = LabelEncode.mapping(df, "k").as[(String, Long)].collect().toMap
    assert(got === Map("apple" -> 0L, "banana" -> 1L, "cherry" -> 2L))
  }

  test("encode attaches codes to every fact row") {
    val df  = Seq("b", "a", "b", "c").toDF("k")
    val got = LabelEncode.encode(df, "k").as[(String, Long)].collect()
    assert(got.length === 4)
    assert(got.toSet === Set(("a", 0L), ("b", 1L), ("c", 2L)))
  }
}
