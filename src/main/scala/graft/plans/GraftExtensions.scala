package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL surface for graft's custom expressions.
  *
  * Two registration paths:
  *   - cluster-wide: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *     (applied when the session is built);
  *   - per-session: `GraftExtensions.register(spark)` for sessions that
  *     already exist (e.g. handed in by a driver).
  *
  * After either, `SELECT graft_rolling_hash(text)` works in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.rollingHashFunction)
    ext.injectFunction(GraftExtensions.esmTokenizeFunction)
    ext.injectFunction(GraftExtensions.wordShinglesFunction)
    ext.injectFunction(GraftExtensions.vecDotFunction)
    ext.injectFunction(GraftExtensions.simHashFunction)
    ext.injectFunction(GraftExtensions.minHashFunction)
    ext.injectFunction(GraftExtensions.jaroWinklerFunction)
    ext.injectFunction(GraftExtensions.damerauFunction)
    ext.injectTableFunction(GraftExtensions.txlogTableFunction)
    ext.injectTableFunction(GraftExtensions.txlogChangesFunction)
    ext.injectTableFunction(GraftExtensions.txlogHistoryFunction)
    ext.injectTableFunction(GraftExtensions.txlogDetailFunction)
  }
}

object GraftExtensions {
  private val rollingHashBuilder: Seq[Expression] => Expression = {
    case Seq(child)      => RollingHash(child)
    case Seq(child, mod) => RollingHash(child, mod.eval().asInstanceOf[Number].longValue())
    case other =>
      throw new IllegalArgumentException(
        s"graft_rolling_hash expects 1 or 2 arguments, got ${other.size}")
  }

  val rollingHashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
    rollingHashBuilder)

  private val esmTokenizeBuilder: Seq[Expression] => Expression = {
    case Seq(child) => EsmTokenizeExpr(child, graft.functions.EsmTokenizer.DefaultMaxLength)
    case Seq(child, len) => EsmTokenizeExpr(child, len.eval().asInstanceOf[Number].intValue())
    case other =>
      throw new IllegalArgumentException(
        s"graft_esm_tokenize expects 1 or 2 arguments, got ${other.size}")
  }

  val esmTokenizeFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_esm_tokenize"),
    new ExpressionInfo(classOf[EsmTokenizeExpr].getName, "graft_esm_tokenize"),
    esmTokenizeBuilder)

  private val wordShinglesBuilder: Seq[Expression] => Expression = {
    case Seq(child)    => WordShingles(child, 3)
    case Seq(child, n) => WordShingles(child, n.eval().asInstanceOf[Number].intValue())
    case other =>
      throw new IllegalArgumentException(
        s"graft_word_shingles expects 1 or 2 arguments, got ${other.size}")
  }

  val wordShinglesFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
    wordShinglesBuilder)

  private val vecDotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => VecDot(a, b)
    case other =>
      throw new IllegalArgumentException(
        s"graft_vec_dot expects 2 arguments, got ${other.size}")
  }

  val vecDotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "graft_vec_dot"),
    vecDotBuilder)

  private val simHashBuilder: Seq[Expression] => Expression = {
    case Seq(child) => SimHashExpr(child)
    case other =>
      throw new IllegalArgumentException(
        s"graft_simhash expects 1 argument, got ${other.size}")
  }

  val simHashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
    simHashBuilder)

  private val minHashBuilder: Seq[Expression] => Expression = {
    case Seq(child)    => MinHashExpr(child, 8)
    case Seq(child, n) => MinHashExpr(child, n.eval().asInstanceOf[Number].intValue())
    case other =>
      throw new IllegalArgumentException(
        s"graft_minhash expects 1 or 2 arguments, got ${other.size}")
  }

  val minHashFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashExpr].getName, "graft_minhash"),
    minHashBuilder)

  private val jaroWinklerBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => JaroWinkler(a, b)
    case other =>
      throw new IllegalArgumentException(
        s"graft_jaro_winkler expects 2 arguments, got ${other.size}")
  }

  val jaroWinklerFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
    jaroWinklerBuilder)

  private val damerauBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => DamerauLevenshtein(a, b)
    case other =>
      throw new IllegalArgumentException(
        s"graft_damerau_levenshtein expects 2 arguments, got ${other.size}")
  }

  val damerauFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_damerau_levenshtein"),
    new ExpressionInfo(classOf[DamerauLevenshtein].getName, "graft_damerau_levenshtein"),
    damerauBuilder)

  // ---- lakehouse table-valued functions ---------------------------------
  // SQL surface for graft.io.TxLog: `SELECT * FROM graft_txlog('/t')`,
  // time travel `graft_txlog('/t', 2)`, the change-data-feed
  // `graft_txlog_changes('/t', 1, 3)`, and `graft_txlog_history('/t')` —
  // the DESCRIBE HISTORY / VERSION AS OF story without a catalog plugin.
  // Builders resolve at ANALYSIS time on the active session; arguments
  // must be literals (the usual TVF contract).

  private def evalString(e: Expression, fn: String): String = {
    require(e.foldable, s"$fn expects literal arguments")
    String.valueOf(e.eval())
  }
  private def evalLong(e: Expression, fn: String): Long = {
    require(e.foldable, s"$fn expects literal arguments")
    e.eval().asInstanceOf[Number].longValue()
  }

  private val txlogBuilder: Seq[Expression] => LogicalPlan = { args =>
    val spark = SparkSession.active
    args match {
      case Seq(root) =>
        graft.io.TxLog.snapshot(spark, evalString(root, "graft_txlog"))
          .queryExecution.logical
      case Seq(root, v) if v.dataType ==
          org.apache.spark.sql.types.TimestampType =>
        // TIMESTAMP AS OF: a TimestampType literal evaluates to its
        // Catalyst-internal micros instant
        graft.io.TxLog.snapshotAsOf(spark, evalString(root, "graft_txlog"),
          evalLong(v, "graft_txlog") / 1000L).queryExecution.logical
      case Seq(root, v) =>
        graft.io.TxLog.snapshot(spark, evalString(root, "graft_txlog"),
          Some(evalLong(v, "graft_txlog"))).queryExecution.logical
      case other =>
        throw new IllegalArgumentException(
          s"graft_txlog expects (root [, version | timestamp]), got ${other.size} arguments")
    }
  }

  val txlogTableFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_txlog"),
    new ExpressionInfo("graft.io.TxLog", "graft_txlog"),
    txlogBuilder)

  private val txlogChangesBuilder: Seq[Expression] => LogicalPlan = { args =>
    val spark = SparkSession.active
    args match {
      case Seq(root, from, to) =>
        graft.io.TxLog.changes(spark, evalString(root, "graft_txlog_changes"),
          evalLong(from, "graft_txlog_changes"), evalLong(to, "graft_txlog_changes"))
          .queryExecution.logical
      case Seq(root, from, to, skip) =>
        graft.io.TxLog.changes(spark, evalString(root, "graft_txlog_changes"),
          evalLong(from, "graft_txlog_changes"), evalLong(to, "graft_txlog_changes"),
          skipRewrites = skip.eval().asInstanceOf[Boolean])
          .queryExecution.logical
      case Seq(root, from, to, skip, typed) =>
        graft.io.TxLog.changes(spark, evalString(root, "graft_txlog_changes"),
          evalLong(from, "graft_txlog_changes"), evalLong(to, "graft_txlog_changes"),
          skipRewrites = skip.eval().asInstanceOf[Boolean],
          withChangeType = typed.eval().asInstanceOf[Boolean])
          .queryExecution.logical
      case other =>
        throw new IllegalArgumentException(
          s"graft_txlog_changes expects (root, from, to [, skipRewrites [, withChangeType]]), got ${other.size} arguments")
    }
  }

  val txlogChangesFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_txlog_changes"),
    new ExpressionInfo("graft.io.TxLog", "graft_txlog_changes"),
    txlogChangesBuilder)

  private val txlogHistoryBuilder: Seq[Expression] => LogicalPlan = {
    case Seq(root) =>
      graft.io.TxLog.history(SparkSession.active,
        evalString(root, "graft_txlog_history")).queryExecution.logical
    case other =>
      throw new IllegalArgumentException(
        s"graft_txlog_history expects (root), got ${other.size} arguments")
  }

  val txlogHistoryFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_txlog_history"),
    new ExpressionInfo("graft.io.TxLog", "graft_txlog_history"),
    txlogHistoryBuilder)

  private val txlogDetailBuilder: Seq[Expression] => LogicalPlan = {
    case Seq(root) =>
      graft.io.TxLog.detail(SparkSession.active,
        evalString(root, "graft_txlog_detail")).queryExecution.logical
    case other =>
      throw new IllegalArgumentException(
        s"graft_txlog_detail expects (root), got ${other.size} arguments")
  }

  val txlogDetailFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("graft_txlog_detail"),
    new ExpressionInfo("graft.io.TxLog", "graft_txlog_detail"),
    txlogDetailBuilder)

  /** Imperative registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", rollingHashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_esm_tokenize", esmTokenizeBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_word_shingles", wordShinglesBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_dot", vecDotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", simHashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", minHashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler", jaroWinklerBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_damerau_levenshtein", damerauBuilder, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_txlog", txlogBuilder, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_txlog_changes", txlogChangesBuilder, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_txlog_history", txlogHistoryBuilder, "built-in")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "graft_txlog_detail", txlogDetailBuilder, "built-in")
  }
}
