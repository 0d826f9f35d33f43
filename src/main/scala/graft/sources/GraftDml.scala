package graft.sources

import scala.util.control.NonFatal

import org.apache.spark.SparkContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

import graft.io.{TxLog, TxLogFileIndex}
import graft.plans.GraftExtensions

/** SQL DML over the transaction log: `DELETE FROM` / `UPDATE` /
  * `MERGE INTO` statements on `USING graft` tables, rewritten during
  * analysis into commands that drive the existing serializable
  * row-level APIs — [[TxLog.deleteVectors]] (merge-on-read deletes:
  * position vectors, no data rewrite), [[TxLog.updateVectors]]
  * (post-image files + vectors over the pre-images), and
  * [[TxLog.merge]] (file-granular copy-on-write upsert). The rewrite
  * happens in the RESOLUTION phase, after the target table and the
  * condition are resolved but before `CheckAnalysis` would reject the
  * statement ("DELETE is only supported with v2 tables" — the v1
  * relation path these tables scan through has no DML of its own).
  *
  * Registration is session-build-time (analyzer rules cannot be added
  * to a live session), so [[GraftSession.withDml]] derives a SIBLING
  * session — same `SparkContext`, same `SharedState` (one catalog, one
  * cache), fresh `SessionState` carrying the rule — for callers handed
  * an extension-less session by a driver. Cluster deployments set
  * `spark.sql.extensions=graft.sources.GraftDmlExtensions` instead and
  * use their main session directly.
  */
class GraftDmlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    new GraftExtensions().apply(ext) // functions + TVFs ride along
    ext.injectResolutionRule(s => new GraftDmlRule(s))
  }
}

/** The analysis-time rewrite (see [[GraftDmlExtensions]]). Conditions
  * and SET values are re-rendered to SQL text and re-resolved against
  * the fresh snapshot each API plans internally — attribute identities
  * from THIS statement's relation instance would not resolve there.
  */
final class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {
  import GraftDml._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case DeleteFromTable(GraftTarget(root), cond) if cond.resolved =>
      GraftDeleteCommand(root, renderSql(cond))

    case UpdateTable(GraftTarget(root), assignments, cond)
        if assignments.forall(a => a.key.resolved && a.value.resolved) &&
          cond.forall(_.resolved) =>
      val set = assignments.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => stripBackticks(other.sql)
        }
        name -> renderSql(a.value)
      }
      GraftUpdateCommand(root, set, cond.map(renderSql).getOrElse("true"))

    // matched BEFORE condition/action resolution: Spark's analyzer
    // expands star actions and resolves merge conditions only for V2
    // targets, so a V1-relation merge would otherwise sit unresolved
    // until CheckAnalysis rejects it — the key is extracted from the
    // raw equi-condition's name parts instead
    case m @ MergeIntoTable(GraftTarget(root), source, mergeCond,
        matched, notMatched, notMatchedBySource, withSchemaEvolution)
        if source.resolved =>
      val keyCol = equiKeyOf(mergeCond).getOrElse(fail(
        "MERGE INTO a graft table needs ON target.k = source.k (one equi-key)"))
      val shapeOk =
        matched.forall(_.isInstanceOf[UpdateStarAction]) && matched.size <= 1 &&
          notMatched.forall(_.isInstanceOf[InsertStarAction]) &&
          notMatched.size <= 1 && notMatchedBySource.isEmpty &&
          (matched.nonEmpty || notMatched.nonEmpty) &&
          matched.forall(_.condition.isEmpty) &&
          notMatched.forall(_.condition.isEmpty) &&
          !withSchemaEvolution // never silently ignore an asked-for behavior
      if (!shapeOk) fail(
        "MERGE INTO a graft table supports WHEN MATCHED THEN UPDATE SET * " +
          "and/or WHEN NOT MATCHED THEN INSERT * (unconditional); " +
          s"got ${m.matchedActions} / ${m.notMatchedActions}")
      GraftMergeCommand(root, keyCol, source,
        allowUpdate = matched.nonEmpty, allowInsert = notMatched.nonEmpty)
  }

  /** `t.k = s.k` (either side order, resolved or not) → the shared key
    * name; None for any other condition shape.
    */
  private def equiKeyOf(cond: Expression): Option[String] = {
    def nameOf(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        Some(u.nameParts.last)
      case _ => None
    }
    cond match {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(l, r) =>
        for (ln <- nameOf(l); rn <- nameOf(r) if ln == rn) yield ln
      case _ => None
    }
  }

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(s"graft DML: $msg")
}

object GraftDml {

  /** The transaction-log root behind any resolved shape a `USING graft`
    * target can take: the bare file-source relation (its location IS the
    * [[TxLogFileIndex]]) or the merge-on-read wrapper relation.
    */
  object GraftTarget {
    def unapply(plan: LogicalPlan): Option[String] = plan match {
      case SubqueryAlias(_, child) => unapply(child)
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation if h.location.isInstanceOf[TxLogFileIndex] =>
          Some(h.location.asInstanceOf[TxLogFileIndex].root)
        case g: GraftSnapshotRelation => Some(g.root)
        case _ => None
      }
      case _ => None
    }
  }

  private[sources] def stripBackticks(s: String): String =
    s.stripPrefix("`").stripSuffix("`").replace("``", "`")

  /** Render an expression as SQL that re-resolves against a FRESH scan
    * of the same table: qualifiers (`spark_catalog.default.t.c`) name
    * THIS statement's relation instance and would not resolve there, so
    * attributes render bare.
    */
  private[sources] def renderSql(e: Expression): String =
    e.transform {
      case a: AttributeReference => a.withQualifier(Nil)
    }.sql
}

/** `DELETE FROM t WHERE cond` → merge-on-read deletion vectors: one
  * positions commit, zero data rewritten — the 100 TB default (Delta
  * with DVs enabled). Returns the committed version.
  */
final case class GraftDeleteCommand(root: String, condSql: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxLog.deleteVectors(spark, root, expr(condSql))))
}

/** `UPDATE t SET a = v, ... WHERE cond` → merge-on-read update:
  * post-image files for the matched rows, deletion vectors over their
  * pre-images. SET values re-resolve against the snapshot (so they may
  * reference other columns).
  */
final case class GraftUpdateCommand(
    root: String,
    set: Seq[(String, String)],
    condSql: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(TxLog.updateVectors(spark, root, expr(condSql),
      set.map { case (k, v) => k -> expr(v) }.toMap)))
}

/** `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED THEN INSERT *` → [[TxLog.merge]]'s file-granular
  * upsert. The restricted-action variants drop the suppressed half by
  * pre-joining the source against the target's key set — the join is on
  * the target's zone-mapped key column, so the probe prunes files the
  * source's key range cannot touch.
  */
final case class GraftMergeCommand(
    root: String,
    keyCol: String,
    source: LogicalPlan,
    allowUpdate: Boolean,
    allowInsert: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftSession.ofRows(spark, source)
    val updates =
      if (allowUpdate && allowInsert) src
      else {
        val keys = TxLog.snapshot(spark, root).select(keyCol).distinct()
        if (allowUpdate) // matched-only: drop source rows with new keys
          src.join(keys, Seq(keyCol), "left_semi")
        else // insert-only: drop source rows that would update
          src.join(keys, Seq(keyCol), "left_anti")
      }
    Seq(Row(TxLog.merge(spark, root, updates, keyCol)))
  }
}

/** Sibling-session factory: the same `SparkContext` and `SharedState`
  * (one catalog, one block manager, one cache) with a fresh
  * `SessionState` built from [[GraftDmlExtensions]] — the only way to
  * give a session handed in WITHOUT extensions (a driver's) an analyzer
  * rule, since resolution rules are fixed at session build. The two
  * private hops (`classic.SparkSession`'s constructor, `sharedState`)
  * go through reflection to stay out of Spark's namespace — the
  * established `ofRelationWithStats` stance.
  */
object GraftSession {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[SparkContext, SparkSession]

  def withDml(spark: SparkSession): SparkSession =
    cache.getOrElseUpdate(spark.sparkContext, build(spark))

  private def build(spark: SparkSession): SparkSession = {
    val ext = new SparkSessionExtensions
    new GraftDmlExtensions().apply(ext)
    val cls = Class.forName("org.apache.spark.sql.classic.SparkSession")
    val shared = spark.getClass.getMethod("sharedState").invoke(spark)
    val ctor = cls.getConstructors.find(_.getParameterCount == 6).getOrElse(
      throw new IllegalStateException(
        "classic.SparkSession's 6-arg constructor not found"))
    val s2 = ctor.newInstance(spark.sparkContext, Some(shared), None, ext,
      Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[SparkSession]
    // align runtime conf (shuffle partitions, session timezone, ...) —
    // static/immutable keys refuse the set harmlessly
    spark.conf.getAll.foreach { case (k, v) =>
      try s2.conf.set(k, v) catch { case NonFatal(_) => () }
    }
    s2
  }

  /** `Dataset.ofRows` (private[sql]) via the classic module — a
    * DataFrame over an already-resolved logical plan.
    */
  private[sources] def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame = {
    val dsMod = Class.forName("org.apache.spark.sql.classic.Dataset$")
    val ds = dsMod.getField("MODULE$").get(null)
    val ofRows = dsMod.getMethods.find(m =>
      m.getName == "ofRows" && m.getParameterCount == 2).get
    ofRows.invoke(ds, spark, plan).asInstanceOf[DataFrame]
  }
}
