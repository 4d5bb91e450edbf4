package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (log2) of a per-row value distribution, computed
  * map-side in one pass — the entropy quality signal of a pretraining
  * cleanse (near-zero character entropy = fill/boilerplate, low token
  * entropy = repetition the [[MaxRunLength]] run detector misses when
  * the repeats are shuffled).
  *
  * The declarative form is explode → groupBy(doc, value) → groupBy(doc)
  * — two shuffles keyed by doc_id carrying every character of the
  * corpus. At 100 TB that is a corpus-sized exchange for a per-row
  * scalar; this expression keeps the whole computation inside the scan
  * stage's whole-stage codegen (same shape-over-shuffle move as
  * [[GramRunStats]]), so `txt_entropy` shuffles nothing at all.
  *
  * H = log2(n) - (Σ c·log2(c))/n over value counts c — one log2 per
  * DISTINCT value rather than per occurrence, and exactly the identity
  * DuckDB's `entropy()` aggregate computes, so the oracle can mirror
  * it with unnest + entropy() and 4-dp pround absorbs libm ulps.
  *
  * [[CodepointEntropy]] walks code points (surrogate pairs count once,
  * combining marks separately — verified equal to DuckDB's
  * `string_split(text, '')` splitting); empty input → 0.0, matching
  * entropy() over DuckDB's single-''-element split of ''.
  * [[ArrayEntropy]] counts array elements (null elements skipped; the
  * tokenizers here never emit null, but the expression is a general
  * surface); empty array → 0.0.
  */
object EntropyOf {

  def codepoint_entropy(c: Column): Column =
    ColumnBridge.column(CodepointEntropy(ColumnBridge.expression(c)))

  def array_entropy(c: Column): Column =
    ColumnBridge.column(ArrayEntropy(ColumnBridge.expression(c)))

  private val LOG2 = math.log(2.0)

  /** H from a value→count table: log2(n) - Σ c·log2(c) / n. */
  def fromCounts(counts: java.util.HashMap[_, Long]): Double = {
    var n = 0L
    var s = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      n += c
      s += c * math.log(c.toDouble)
    }
    if (n == 0L) 0.0 else (math.log(n.toDouble) - s / n) / LOG2
  }

  def ofCodepoints(s: UTF8String): Double = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
    }
    fromCounts(counts)
  }

  def ofArray(a: ArrayData): Double = {
    val counts = new java.util.HashMap[UTF8String, Long]()
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) counts.merge(a.getUTF8String(i), 1L, (x, y) => x + y)
      i += 1
    }
    fromCounts(counts)
  }
}

case class CodepointEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"codepoint_entropy requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    EntropyOf.ofCodepoints(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.EntropyOf$$.MODULE$$.ofCodepoints($c)")

  override protected def withNewChildInternal(newChild: Expression): CodepointEntropy =
    copy(child = newChild)
}

case class ArrayEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_entropy requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    EntropyOf.ofArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.EntropyOf$$.MODULE$$.ofArray($c)")

  override protected def withNewChildInternal(newChild: Expression): ArrayEntropy =
    copy(child = newChild)
}
