package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{
  Coalesce, ConcatWs, ElementAt, Expression, Literal, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Workload-specific optimizer rule (SURVEY.md §4, custom-work item 2).
  *
  * The reference serializes rows to `"v1^v2^…"` strings only because LLMs
  * consume text (`utils/data_utils.py:82-95`); synthesized programs routinely
  * begin by splitting that string back apart
  * (`input.split("^")[i]` — the shape the prompts teach). Composed in one
  * plan, that is `element_at(split(concat_ws(sep, c1…cn), quote(sep)), i)` —
  * a build-a-string-then-reparse round trip per row.
  *
  * This rule collapses the round trip to the direct column `c_i`. It fires
  * only when provably safe under the engine's serialization contract:
  *  - separator and index are foldable literals, index positive and in range;
  *  - the split pattern is exactly `Pattern.quote(sep)` (what
  *    [[graft.transform.TransformProgram.SplitIndex]] emits);
  *  - every serialized child is a non-nullable string (the serializers'
  *    `coalesce(cast, nanTok)` guarantees this) — `concat_ws` SKIPS null
  *    children, which would shift positions;
  *  - values are separator-free, which is the serialization contract the
  *    reference itself relies on for round-tripping (SURVEY §2.2 P2).
  *
  * CONTRACT, not a proof: if a serialized value DOES contain the separator,
  * the un-rewritten expression returns a shifted token while the rewrite
  * returns the intended column — i.e. the rewrite gives the answer the
  * reference's own split-based programs MEAN but also get wrong on such
  * rows. Register this rule only for workloads that honor the
  * separator-free serialization contract (the engine's own serializers +
  * synthesized SplitIndex programs); it is deliberately not in the default
  * session for arbitrary user SQL.
  *
  * Wired either via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or
  * `spark.experimental.extraOptimizations`.
  */
object SerializeResplitRule extends Rule[LogicalPlan] {

  private def quoted(sep: String): String = Pattern.quote(sep)

  private def litString(e: Expression): Option[String] = e match {
    case Literal(s: UTF8String, StringType) => Some(s.toString)
    case _ => None
  }

  private def litInt(e: Expression): Option[Int] = e match {
    case Literal(i: Int, _) => Some(i)
    case Literal(l: Long, _) if l.isValidInt => Some(l.toInt)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ea @ ElementAt(
          StringSplit(cw @ ConcatWs(sepExpr +: cols), regexExpr, limitExpr),
          idxExpr, _, _) =>
        val rewritten = for {
          sep <- litString(sepExpr)
          regex <- litString(regexExpr)
          if regex == quoted(sep) && sep.nonEmpty
          limit <- litInt(limitExpr)
          if limit == -1
          idx <- litInt(idxExpr)
          if idx >= 1 && idx <= cols.length
          target = cols(idx - 1)
          if target.dataType == StringType && !target.nullable
          if cols.forall(c => c.dataType == StringType && !c.nullable)
        } yield target
        rewritten.getOrElse(ea)
    }
}

/** Session-extension hook: `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectOptimizerRule(_ => SerializeResplitRule)
}
