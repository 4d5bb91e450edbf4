package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** One codegen'd pass over a SORTED array<long> producing BOTH run
  * statistics the repetition score needs:
  *   - `n_distinct`: the number of equal-adjacent runs — on a sorted
  *     array, exactly the count of distinct elements;
  *   - `max_rep`: the longest run — the maximum multiplicity.
  *
  * This replaces the `array_distinct` + [[MaxRunLength]] pair on gram
  * STRINGS in `txt_repetition`: hashing each gram to a long first
  * (xxhash64, codegen'd) makes the sort an order of magnitude cheaper
  * than UTF8String comparisons, and folding the distinct count into
  * the same run-length walk deletes the second array scan entirely.
  * The per-element cost is the term that grows with document length,
  * so this is the 100 TB shape of the metric.
  *
  * Null elements follow [[MaxRunLength]] semantics (adjacent nulls
  * extend a run and count as one distinct value) — sorted arrays
  * group nulls together, so the walk stays a single comparison per
  * element. Empty arrays yield (0, 0).
  */
case class SortedRunStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_rep", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_run_stats requires array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var best = 0L
    var run = 0L
    var distinct = 0L
    var i = 0
    while (i < n) {
      val same = i > 0 && {
        val curNull = arr.isNullAt(i)
        val prevNull = arr.isNullAt(i - 1)
        (curNull && prevNull) ||
          (!curNull && !prevNull && arr.getLong(i) == arr.getLong(i - 1))
      }
      if (same) run += 1 else { run = 1; distinct += 1 }
      if (run > best) best = run
      i += 1
    }
    val out = new GenericInternalRow(2)
    out.setLong(0, distinct)
    out.setLong(1, best)
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val run = ctx.freshName("run")
      val best = ctx.freshName("best")
      val distinct = ctx.freshName("distinct")
      val same = ctx.freshName("same")
      val curNull = ctx.freshName("curNull")
      val prevNull = ctx.freshName("prevNull")
      val row = ctx.freshName("row")
      val rowCls = classOf[GenericInternalRow].getName
      s"""
         |int $n = $a.numElements();
         |long $best = 0L;
         |long $run = 0L;
         |long $distinct = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $same = false;
         |  if ($i > 0) {
         |    boolean $curNull = $a.isNullAt($i);
         |    boolean $prevNull = $a.isNullAt($i - 1);
         |    $same = ($curNull && $prevNull) ||
         |      (!$curNull && !$prevNull && $a.getLong($i) == $a.getLong($i - 1));
         |  }
         |  if ($same) { $run += 1L; } else { $run = 1L; $distinct += 1L; }
         |  if ($run > $best) $best = $run;
         |}
         |$rowCls $row = new $rowCls(2);
         |$row.setLong(0, $distinct);
         |$row.setLong(1, $best);
         |${ev.value} = $row;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SortedRunStats =
    copy(child = newChild)
}

object SortedRunStats {
  /** Column-API entry point (pass a SORTED array<long>). */
  def sorted_run_stats(a: Column): Column =
    ColumnBridge.column(SortedRunStats(ColumnBridge.expression(a)))
}
