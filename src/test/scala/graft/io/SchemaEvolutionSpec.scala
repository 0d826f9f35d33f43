package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Schema evolution across a parquet prefix: older files lack a column
  * added later (the normal life of a lake table). `mergeSchema` must
  * union the schemas and null-fill the missing column — and the default
  * (cheap) read must still work off a single footer.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mergeSchema unions old and new file schemas, null-filling the added column") {
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v1").write.parquet(s"$dir/batch=old")
    Seq((3L, "c", 9.5), (4L, "d", 7.5)).toDF("id", "v1", "v2").write.parquet(s"$dir/batch=new")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "v1", "v2", "batch"))
    assert(merged.count() === 4)
    val nullsInOld = merged.filter($"batch" === "old" && $"v2".isNull).count()
    assert(nullsInOld === 2) // old files surface the new column as null
  }
}
