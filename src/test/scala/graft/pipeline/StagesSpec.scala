package graft.pipeline

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.io.Zones

/** End-to-end pipeline fixture (SURVEY.md §5.4, FIXTURES.md §B): mini
  * Pfam-shaped CSV shards through all three stages; asserts zone outputs'
  * schemas and invariants (dense lexicographic codes, SP1 branch counts,
  * w = n_min/n_c, curated token shape).
  */
class StagesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seqOf(n: Int, c: Char = 'A'): String = c.toString * n

  /** Classes of sizes 1,2,3,4,7 (every SP1 branch) + one malformed row. */
  private def writeFixture(root: Path): Seq[String] = {
    val fams = Seq("FAM1" -> 1, "FAM2" -> 2, "FAM3" -> 3, "FAM4" -> 4, "FAM5" -> 7)
    var i = 0
    val rows = fams.flatMap { case (fam, n) =>
      (0 until n).map { _ =>
        i += 1
        s"${seqOf(4 + i)},$fam,name_${f"$i%03d"},${seqOf(4 + i, 'G')},${fam}_id"
      }
    } :+ s"${seqOf(5)},FAM1,name_999,," // empty aligned_sequence → dropna
    val dirs = Seq("train", "dev", "test").map(d => root.resolve(d))
    dirs.foreach(Files.createDirectories(_))
    // spread rows over shards to exercise the multi-path union read (S1/S2)
    rows.grouped((rows.size + 2) / 3).zipWithIndex.foreach { case (chunk, si) =>
      Files.writeString(dirs(si % 3).resolve(s"shard_$si.csv"), chunk.mkString("", "\n", "\n"))
    }
    dirs.map(_.toString)
  }

  test("three stages end-to-end on the Pfam-shaped fixture") {
    val root  = Files.createTempDirectory("graft_fixture")
    val dirs  = writeFixture(root)
    val zones = Zones(root.resolve("lake").toString)
    zones.ensure(spark)

    // stage 1: ingest (S1/S2/S3)
    val raw = Stages.unpackToRaw(spark, dirs, zones)
    assert(raw.count() === 18) // 17 clean + 1 malformed

    // stage 2: clean/encode/split/weights
    val out = Stages.preprocessToStaging(raw, zones, orderCol = "sequence_name")

    val mapping = out.labelMapping.as[(String, Long)].collect().toMap
    assert(mapping === Map("FAM1" -> 0L, "FAM2" -> 1L, "FAM3" -> 2L, "FAM4" -> 3L, "FAM5" -> 4L))

    assert(out.train.columns.toSet === Set("sequence", "aligned_sequence", "class_encoded"))
    val trainPerClass = out.train.groupBy("class_encoded").count()
      .as[(Long, Long)].collect().toMap
    // sizes 1,2,3,4,7 → train 0,0,1,3,4 / dev 0,1,1,0,1 / test 1,1,1,1,2
    assert(trainPerClass === Map(2L -> 1L, 3L -> 3L, 4L -> 4L))
    assert(out.dev.count() === 3)
    assert(out.test.count() === 6)
    assert(out.train.count() + out.dev.count() + out.test.count() === 17)

    val weights = out.classWeights.as[(Long, Double)].collect().toMap
    assert(weights === Map(2L -> 1.0, 3L -> 0.333333, 4L -> 0.25))

    // stage 3: tokenize (F2/F3)
    val curated = Stages.processToCurated(out.train, zones, "train", maxLength = 16)
    assert(curated.columns.toSet === Set("aligned_sequence", "class_encoded", "tokens"))
    val tokens = curated.select("tokens").as[Seq[Int]].collect()
    assert(tokens.forall(_.length === 16))
    assert(tokens.forall(_.head === 0))
    assert(tokens.forall(_.count(_ == 2) === 1))

    // sinks exist on disk (S3/S5 shape)
    assert(Files.list(root.resolve("lake/staging")).count() >= 5)
  }
}
