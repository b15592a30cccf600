package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.LongAccumulator

/** Boolean pass-through that counts TRUE evaluations into a
  * [[LongAccumulator]] — the round-15 fusion of iterative-fixpoint
  * change detection into the materialization job that already runs.
  *
  * [[graft.ops.ScaleDedup.connectedComponents]] previously detected
  * convergence with a separate `filter(changed).count()` action every
  * couple of rounds — on a 6-round fixpoint at sf0.1 that is 3 extra
  * scheduled jobs whose latency dominates the (small) per-round data
  * (round-14 VERDICT perf audit: q10's cost is JOB COUNT). Projecting
  * `CountTrueExpr(label =!= old)` into the frame the loop ALREADY
  * eager-checkpoints makes every materialization job tally the round's
  * label changes as a side effect: change detection becomes free, every
  * round, and the count jobs disappear.
  *
  * Semantics: the accumulator value is an OVERCOUNT under retries,
  * speculative execution, or a reliable checkpoint's compute+write
  * double evaluation — callers may only branch on `value == 0` vs
  * `> 0`, which is retry-safe (a task that observed changes reports
  * > 0 on every re-run; a changeless round adds 0 every time). The
  * column itself must stay in the materialized output schema — an
  * unprojected side-effect column would be pruned by Catalyst along
  * with its side effect. Stays inside whole-stage codegen (static call
  * on the referenced accumulator, no boxing). */
case class CountTrueExpr(child: Expression, acc: LongAccumulator)
    extends UnaryExpression {
  // A foldable child would be constant-folded by Catalyst — the
  // expression (and its side effect) silently disappears (round-16
  // ADVICE: enforce the scaladoc contract where it can be enforced).
  require(!child.foldable,
    "CountTrueExpr over a foldable child would be constant-folded away " +
      "with its side-effecting tally")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "count_true"
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Boolean]
    if (b) acc.add(1L)
    b
  }
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val accRef = ctx.addReferenceObj("acc", acc,
      classOf[LongAccumulator].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($c) $accRef.add(1L);
         |${ev.value} = $c;""".stripMargin)
  }
  override protected def withNewChildInternal(
      newChild: Expression): CountTrueExpr = copy(child = newChild)
}
