package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite anchored-LITERAL regex predicates into their
  * string-predicate equivalents —
  *
  *   - `x RLIKE '^abc$'`  →  `x = 'abc'`
  *   - `x RLIKE '^abc'`   →  `startswith(x, 'abc')`
  *   - `x RLIKE 'abc$'`   →  `endswith(x, 'abc')`
  *   - `x RLIKE 'abc'`    →  `contains(x, 'abc')`
  *
  * — ONLY when the anchored body is metacharacter-free, so the rewrite
  * is semantics-exact under Spark's find()-anywhere RLIKE contract.
  *
  * Why a Rule and not a coding guideline: RLIKE predicates are opaque to
  * every data source, so a 100 TB scan evaluates the regex on EVERY row;
  * `StartsWith`/`EqualTo` translate to `StringStartsWith`/`EqualTo`
  * pushed filters that parquet/ORC prune with row-group statistics and
  * dictionary pages BEFORE decoding. The rewrite turns "regex over the
  * whole lake" into "skip most of the lake" for the anchored-literal
  * patterns ETL configs are full of (`'^ERROR'`, `'^src1$'`, ...), and
  * `NOT rlike` masks benefit the same way (the negation translates
  * around the rewritten child). Plan-asserted in RegexRewriteSpec: the
  * pushed filter list is the proof, not this comment.
  *
  * Scope guards: the pattern must be a foldable string literal;
  * non-literal bodies (any of `.[]{}()*+?\\|` or an interior `^`/`$`)
  * are left for the regex engine. The rewrite preserves null semantics
  * (all three targets are null-in/null-out, like RLike).
  */
object RegexAnchorSimplification extends Rule[LogicalPlan] {

  private val Meta = ".[]{}()*+?\\|^$".toSet

  private def isLiteral(body: String): Boolean =
    body.nonEmpty && body.forall(c => !Meta.contains(c))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case r @ RLike(e, Literal(p: UTF8String, StringType)) =>
        val s = p.toString
        if (s.length >= 3 && s.startsWith("^") && s.endsWith("$") &&
          isLiteral(s.substring(1, s.length - 1))) {
          EqualTo(e, Literal(UTF8String.fromString(s.substring(1, s.length - 1)), StringType))
        } else if (s.length >= 2 && s.startsWith("^") &&
          isLiteral(s.substring(1))) {
          StartsWith(e, Literal(UTF8String.fromString(s.substring(1)), StringType))
        } else if (s.length >= 2 && s.endsWith("$") &&
          isLiteral(s.substring(0, s.length - 1))) {
          EndsWith(e, Literal(UTF8String.fromString(s.substring(0, s.length - 1)), StringType))
        } else if (isLiteral(s)) {
          // no anchors at all: find()-anywhere over a literal IS contains
          Contains(e, Literal(UTF8String.fromString(s), StringType))
        } else r
    }
}
