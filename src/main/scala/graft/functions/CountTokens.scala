package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Size, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Token COUNT without token materialization.
  *
  * `size(tokenize_words(text))` builds the whole token array only to
  * take its length. At 100 TB token counting is a headline pipeline
  * op, so [[FuseTokenCount]] (an optimizer `Rule`) rewrites that
  * expression tree to this one: a single code-point walk that counts
  * letter-run starts and allocates nothing.
  */
case class CountTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    CountTokens.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CountTokens$$.MODULE$$.count($c)")

  override protected def withNewChildInternal(newChild: Expression): CountTokens =
    copy(child = newChild)
}

object CountTokens {
  /** Number of maximal letter runs (== TokenizeWords output length). */
  def count(s: UTF8String): Int = {
    val str = s.toString
    val n = str.length
    var i = 0
    var c = 0
    var inTok = false
    while (i < n) {
      val cp = str.codePointAt(i)
      if (Character.isLetter(cp)) {
        if (!inTok) { c += 1; inTok = true }
      } else inTok = false
      i += Character.charCount(cp)
    }
    c
  }
}

/** Optimizer rule: `Size(TokenizeWords(x))` → `CountTokens(x)`.
  * Injected via GraftExtensions (or `spark.experimental
  * .extraOptimizations` on a live session).
  */
object FuseTokenCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(TokenizeWords(c), _) => CountTokens(c)
    }
}
