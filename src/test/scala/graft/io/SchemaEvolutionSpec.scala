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

  test("txlog type-widening evolution: int→long and float→double keep the recorded schema") {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val root = Zones.tempDir("txlog_widen")
    TxLog.append(spark, root,
      Seq((1, 1.5f), (2, 2.5f)).toDF("k", "x"))        // v1: int, float
    TxLog.append(spark, root,
      Seq((3L, 3.5d), (4L, 4.5d)).toDF("k", "x"))      // v2: long, double
    // the recorded schema widened instead of poisoning to None — every
    // later read still plans from the LOG, no footer-inference fallback
    val r = TxLog.replay(root, 2L)
    assert(r.schema.isDefined, "a widenable type change must not poison the schema")
    assert(r.schema.get("k").dataType === LongType)
    assert(r.schema.get("x").dataType === DoubleType)
    // and the OLD int32/float files read through the widened schema
    val rows = TxLog.snapshot(spark, root).orderBy("k").collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getAs[Double]("x")).toSeq === Seq(1.5, 2.5, 3.5, 4.5))
    // time travel below the widening still sees the narrow types
    val r1 = TxLog.replay(root, 1L)
    assert(r1.schema.get("k").dataType === org.apache.spark.sql.types.IntegerType)
    // a NON-widenable change (string over long) still poisons to
    // inference fallback rather than guessing
    TxLog.append(spark, root, Seq(("five", 5.0d)).toDF("k", "x")) // v3
    assert(TxLog.replay(root, 3L).schema.isEmpty)
  }
}
