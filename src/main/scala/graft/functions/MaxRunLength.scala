package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd longest equal-adjacent run over an array<string> —
  * applied to a SORTED array this is the maximum multiplicity of any
  * element, i.e. the hottest-n-gram count of the repetition score.
  *
  * The `aggregate()` higher-order-function fold that computed this
  * first is interpreted: one closure call and a boxed struct
  * allocation per element (measured: txt_repetition 4.0 s at sf0.1
  * with the fold — the whole query is this fold). This expression is
  * a tight generated loop over the unsafe array data comparing
  * adjacent UTF8Strings — no allocation, stays inside whole-stage
  * codegen. Empty arrays yield 0.
  */
case class MaxRunLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"max_run_length requires array<string>, got ${other.simpleString}")
    }

  // Null ELEMENTS (containsNull arrays): two adjacent nulls count as
  // the same element (the run extends); null next to a value breaks
  // the run — explicit in both paths so interpreted and generated
  // code agree (getUTF8String on a null slot NPEs in generated code).
  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var best = 0L
    var run = 0L
    var i = 0
    while (i < n) {
      val same = i > 0 && {
        val curNull = arr.isNullAt(i)
        val prevNull = arr.isNullAt(i - 1)
        (curNull && prevNull) ||
          (!curNull && !prevNull &&
            arr.getUTF8String(i) == arr.getUTF8String(i - 1))
      }
      if (same) run += 1 else run = 1
      if (run > best) best = run
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val run = ctx.freshName("run")
      val best = ctx.freshName("best")
      val curNull = ctx.freshName("curNull")
      val prevNull = ctx.freshName("prevNull")
      val same = ctx.freshName("same")
      s"""
         |int $n = $a.numElements();
         |long $best = 0L;
         |long $run = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $same = false;
         |  if ($i > 0) {
         |    boolean $curNull = $a.isNullAt($i);
         |    boolean $prevNull = $a.isNullAt($i - 1);
         |    $same = ($curNull && $prevNull) ||
         |      (!$curNull && !$prevNull &&
         |       $a.getUTF8String($i).equals($a.getUTF8String($i - 1)));
         |  }
         |  if ($same) { $run += 1L; } else { $run = 1L; }
         |  if ($run > $best) $best = $run;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaxRunLength =
    copy(child = newChild)
}

object MaxRunLength {
  /** Column-API entry point (pass a sorted array for multiplicity). */
  def max_run_length(a: Column): Column =
    ColumnBridge.column(MaxRunLength(ColumnBridge.expression(a)))
}
