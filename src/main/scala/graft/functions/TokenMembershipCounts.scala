package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token-profile counts as ONE map-side expression: the
  * token total plus, for each configured word set, how many tokens'
  * LOWERCASE form is in the set — the stopword-ratio and
  * language-marker numbers of the quality/langid/cleanse queries.
  *
  * The explode + groupBy form these queries started with shuffles
  * nothing heavy (per-doc partials), but it evaluates an interpreted
  * `lower(word) IN (...)` chain per token per set inside a generated
  * aggregate whose code size grows with every set — most of
  * `pipe_clean`'s bench cost was whole-stage-codegen COMPILATION of
  * that fused plan, not execution. This expression is one hash-set
  * probe per token per set in plain JVM code, the aggregation
  * disappears from the plan, and per-document metrics become a
  * projection in the scan stage — the same shape-over-shuffle move
  * as GramRunStats. Output counts are integers, bit-identical to the
  * aggregate form (the DuckDB oracles keep the unnest/GROUP BY
  * derivation).
  *
  * Null tokens count toward n_tokens and no set (tokenizers here
  * never emit null, but the expression is a general surface).
  */
case class TokenMembershipCounts(child: Expression,
                                 setNames: Seq[String],
                                 sets: Seq[Seq[String]])
    extends UnaryExpression {

  require(setNames.length == sets.length, "one name per word set")

  override def dataType: DataType = StructType(
    StructField("n_tokens", LongType, nullable = false) +:
      setNames.map(n => StructField(n, LongType, nullable = false)))

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_membership_counts requires array<string>, got ${other.simpleString}")
    }

  @transient private lazy val lookups: Array[java.util.HashSet[UTF8String]] =
    sets.map { ws =>
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w.toLowerCase)))
      s
    }.toArray

  def compute(a: Object): org.apache.spark.sql.catalyst.InternalRow = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = lookups.length
    val counts = new Array[Long](k)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val lower = arr.getUTF8String(i).toLowerCase
        var j = 0
        while (j < k) {
          if (lookups(j).contains(lower)) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    val out = new GenericInternalRow(k + 1)
    out.setLong(0, n.toLong)
    var j = 0
    while (j < k) { out.setLong(j + 1, counts(j)); j += 1 }
    out
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[Object])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("tokenMembershipCounts", this,
        classOf[TokenMembershipCounts].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : TokenMembershipCounts = copy(child = newChild)
}

object TokenMembershipCounts {
  /** Column-API entry point: `namedSets` maps output field name →
    * word set; field order follows the given sequence.
    */
  def token_membership_counts(tokens: Column,
                              namedSets: Seq[(String, Seq[String])]): Column =
    ColumnBridge.column(TokenMembershipCounts(
      ColumnBridge.expression(tokens), namedSets.map(_._1), namedSets.map(_._2)))
}
