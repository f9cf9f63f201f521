package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, FloatType, TimestampType}

import graft.functions.{DotProductF, L2NormF, MonthsInInterval}

/** SQL-surface registration for the engine's native Catalyst
  * expressions, via the public `SparkSessionExtensions` hook — the
  * idiomatic way to add functions without forking the session builder.
  *
  * Parity: the reference installs `months_in_interval` as a SQL
  * function in the database so any SQL can call it
  * (/root/reference/pedsnetdcc/age_transform.py:10-46 creates the
  * function; transforms then reference it by name). Registering the
  * codegen expressions here gives `spark.sql(...)` users the same
  * by-name access — `SELECT months_in_interval(a, b)` — on top of the
  * Column API in [[graft.functions]].
  *
  * Usable two ways: `GraftSession` applies it programmatically, and
  * spark-submit users pass `--conf spark.sql.extensions=
  * graft.core.GraftExtensions` (the class-name form Spark instantiates
  * reflectively).
  *
  * ==Why no custom Strategy / SparkPlan==
  *
  * The extension ladder's last rung — a custom `LogicalPlan` +
  * `Rule[LogicalPlan]` + planner `Strategy` + `SparkPlan` — is
  * deliberately unused. Every operator in this engine, reference-side
  * and pipeline-side, decomposes into Catalyst-optimizable relational
  * algebra: the as-of join is a tolerance-bucketed equi-join plus an
  * argmin (`operators.AsOfJoin`), eras are windows over one shared
  * partitioning, global order statistics are two-level scans (bucket
  * windows + constant-size offset frames), and ANN/dedup candidate
  * generation is always an equi-join on a compact key. Expressed this
  * way, AQE (skew splitting, exchange reuse, runtime join re-planning)
  * and whole-stage codegen apply for free; a bespoke physical operator
  * would opt out of all three unless it reimplemented them, and its
  * inputs/outputs would be opaque to every downstream rule. Where the
  * built-ins genuinely end — scalar kernels with cross-engine
  * determinism contracts — the engine drops exactly one rung, to
  * native codegen expressions ([[graft.functions.MonthsInInterval]],
  * [[graft.functions.DotProductF]], the hash kernels), which stay
  * INSIDE whole-stage codegen rather than around it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("months_in_interval"),
      info("months_in_interval",
        "_FUNC_(start, end) - PG age()-compatible fractional months"),
      (args: Seq[Expression]) => MonthsInInterval(
        Cast(args(0), TimestampType), Cast(args(1), TimestampType))))
    ext.injectFunction((
      FunctionIdentifier("dot_product_f"),
      info("dot_product_f",
        "_FUNC_(a, b) - index-order float dot product as double"),
      (args: Seq[Expression]) => DotProductF(
        Cast(args(0), ArrayType(FloatType)), Cast(args(1), ArrayType(FloatType)))))
    ext.injectFunction((
      FunctionIdentifier("l2_norm_f"),
      info("l2_norm_f", "_FUNC_(a) - index-order float L2 norm as double"),
      (args: Seq[Expression]) => L2NormF(Cast(args(0), ArrayType(FloatType)))))
  }
}
