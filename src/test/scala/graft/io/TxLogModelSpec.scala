package graft.io

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Model-based check: a seeded random program of append / overwrite /
  * merge / delete / update / DV-delete / MoR-update / purge / RENAME
  * COLUMN / optimize / compact / restore / vacuum runs against BOTH the
  * real log and a trivial in-memory reference model (a Map, the payload
  * column's current logical name, and a version-indexed history of
  * both). After every operation the table must equal the model under
  * the CURRENT name, and at the end every historical version must equal
  * the model's history under the name THAT version recorded — the whole
  * API surface composed in random orders, including the schema-op
  * interleavings (rename-then-restore, rename-across-purge) that
  * hand-picked orders miss. Runs over both store flavors
  * ([[StoreFlavors]]).
  */
class TxLogModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def toDf(m: Map[Long, String], payloadName: String = "payload") = {
    import spark.implicits._
    m.toSeq.toDF("id", payloadName)
  }

  private def tableState(root: String, payloadName: String,
      v: Option[Long] = None): Map[Long, String] =
    TxLog.snapshot(spark, root, v).collect()
      .map(r => r.getLong(0) -> r.getAs[String](payloadName)).toMap

  for ((flavor, mkRoot) <- StoreFlavors.flavors("txlog_model"))
  test(s"random append/overwrite/merge/delete/update/DV-delete/MoR-update/purge/rename/optimize/compact/restore/vacuum programs match the model [$flavor]") {
    val rnd = new Random(20260815L)
    val root = mkRoot()

    var model = Map(1L -> "init-1", 2L -> "init-2")
    // the payload column's CURRENT logical name — RENAME COLUMN moves it,
    // RESTORE rewinds it (schema + column mapping are table state too)
    var payloadName = "payload"
    TxLog.append(spark, root, toDf(model))
    // version → (model state, payload name), for the time-travel sweep
    var history = Map(1L -> (model, payloadName))
    var nextKey = 100L

    def freshKeys(n: Int): Seq[Long] = {
      val ks = nextKey until (nextKey + n); nextKey += n; ks
    }

    (1 to 48).foreach { step =>
      rnd.nextInt(13) match {
        case 0 => // append disjoint fresh rows
          val rows = freshKeys(1 + rnd.nextInt(4)).map(k => k -> s"a$step-$k").toMap
          val v = TxLog.append(spark, root, toDf(rows, payloadName))
          model = model ++ rows
          history += (v -> (model, payloadName))
        case 1 => // overwrite with a fresh small table
          val rows = freshKeys(1 + rnd.nextInt(3)).map(k => k -> s"o$step-$k").toMap
          val v = TxLog.overwrite(spark, root, toDf(rows, payloadName))
          model = rows
          history += (v -> (model, payloadName))
        case 2 => // merge: update up to 2 existing keys, insert 1 fresh
          val upd = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(3))
            .map(k => k -> s"u$step-$k").toMap
          val ins = freshKeys(1).map(k => k -> s"i$step-$k").toMap
          val v = TxLog.merge(spark, root, toDf(upd ++ ins, payloadName), "id")
          model = model ++ upd ++ ins
          history += (v -> (model, payloadName))
        case 3 => // optimize: content-neutral rewrite
          val v = TxLog.optimize(spark, root,
            targetFiles = 1 + rnd.nextInt(3), sortCol = Some("id"))
          history += (v -> (model, payloadName))
        case 4 => // restore to a random historical version
          val target = history.keys.toSeq(rnd.nextInt(history.size))
          val v = TxLog.restore(spark, root, target)
          // restore rewinds CONTENT and the column's logical name (the
          // recorded schema and the mapping both ride the restore)
          model = history(target)._1
          payloadName = history(target)._2
          history += (v -> (model, payloadName))
        case 5 => // full-retention vacuum: must never change any state
          TxLog.vacuum(root)
        case 6 => // delete a random key range (possibly matching nothing)
          val keys = model.keys.toSeq.sorted
          val lo = keys(rnd.nextInt(keys.size))
          val hi = lo + rnd.nextInt(5)
          val surviving = model.filterNot { case (k, _) => k >= lo && k <= hi }
          if (surviving.nonEmpty) { // an empty table has no snapshot to compare
            val v = TxLog.delete(spark, root, col("id").between(lo, hi))
            model = surviving
            // a provably-no-match delete commits nothing
            if (!history.contains(v)) history += (v -> (model, payloadName))
          }
        case 7 => // update up to 2 existing keys in place
          val targets = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(2))
          val v = TxLog.update(spark, root,
            col("id").isin(targets: _*),
            Map(payloadName -> concat(col(payloadName), lit(s"+u$step"))))
          model = model.map { case (k, p) =>
            k -> (if (targets.contains(k)) s"$p+u$step" else p)
          }
          if (!history.contains(v)) history += (v -> (model, payloadName))
        case 8 => // compact: content-neutral small-file rewrite
          val v = TxLog.compact(spark, root)
          if (!history.contains(v)) history += (v -> (model, payloadName))
        case 9 => // merge-on-read DELETE (deletion vectors)
          val keys = model.keys.toSeq.sorted
          val lo = keys(rnd.nextInt(keys.size))
          val hi = lo + rnd.nextInt(5)
          val surviving = model.filterNot { case (k, _) => k >= lo && k <= hi }
          if (surviving.nonEmpty) {
            val v = TxLog.deleteVectors(spark, root, col("id").between(lo, hi))
            model = surviving
            if (!history.contains(v)) history += (v -> (model, payloadName))
          }
        case 10 => // merge-on-read UPDATE (old positions vectorized)
          val targets = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(2))
          val v = TxLog.updateVectors(spark, root,
            col("id").isin(targets: _*),
            Map(payloadName -> concat(col(payloadName), lit(s"+m$step"))))
          model = model.map { case (k, p) =>
            k -> (if (targets.contains(k)) s"$p+m$step" else p)
          }
          if (!history.contains(v)) history += (v -> (model, payloadName))
        case 11 => // purge: content-neutral DV materialization
          val v = TxLog.purge(spark, root, threshold = rnd.nextDouble() * 0.8)
          if (!history.contains(v)) history += (v -> (model, payloadName))
        case 12 => // RENAME COLUMN: metadata-only, content identical
          val newName = s"p$step"
          val v = TxLog.renameColumn(root, payloadName, newName)
          payloadName = newName
          history += (v -> (model, payloadName))
      }
      assert(tableState(root, payloadName) === model,
        s"state diverged after step $step")
    }

    // time travel: EVERY recorded version still equals the model's
    // history — read under the payload name THAT version recorded
    history.foreach { case (v, (m, n)) =>
      assert(tableState(root, n, Some(v)) === m, s"time travel to v$v diverged")
    }
    // version chain is contiguous and fully parseable
    val vs = TxLog.versions(root)
    assert(vs === (1L to vs.last))
    assert(TxLog.history(spark, root).count() === vs.last)
    // retention vacuum from the newest restore-reachable point keeps head
    TxLog.vacuum(root, retainFrom = vs.last)
    assert(tableState(root, payloadName) === model,
      "head must survive max-retention vacuum")
  }
}
