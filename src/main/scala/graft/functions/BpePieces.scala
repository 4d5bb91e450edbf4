package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE subword ENCODE as one JVM pass: the same rank-ordered leftmost
  * non-overlapping merges as [[BpeTokenizer]]'s sentinel-wrapped
  * replace chain, over an explicit piece list instead of 26 full-text
  * string materializations (wrap + 24 merges + unwrap — measured as
  * most of `txt_chunk_bpe`'s cost; each chain step allocates a new
  * ~3×len sentinel-wrapped string).
  *
  * Semantics pinned to the chain: initial pieces are CODE POINTS
  * (`regexp_replace(clean, "(?s)(.)", …)` matches per code point in
  * both Java regex and RE2, so surrogate pairs stay one piece), the
  * sentinel characters U+0002/U+0003 are scrubbed first, and each
  * merge rule does one left-to-right non-overlapping pass.
  * BpeTokenizerSpec proves expression ≡ chain on the corpus and on
  * random text; the DuckDB oracle keeps the replace-chain SQL, so
  * the gate re-checks equivalence at every run.
  */
case class BpePieces(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis
        .TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_pieces requires string, got ${other.simpleString}")
    }

  def compute(a: Object): ArrayData = {
    val s = a.asInstanceOf[UTF8String].toString
    // initial pieces: code points, sentinels scrubbed
    var pieces = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      if (cp != 0x02 && cp != 0x03) pieces.add(s.substring(i, i + w))
      i += w
    }
    val merges = BpePieces.mergeRules
    var m = 0
    while (m < merges.length) {
      val a0 = merges(m)._1
      val b0 = merges(m)._2
      val out = new java.util.ArrayList[String](pieces.size)
      var j = 0
      val n = pieces.size
      while (j < n) {
        if (j + 1 < n && pieces.get(j) == a0 && pieces.get(j + 1) == b0) {
          out.add(a0 + b0); j += 2
        } else { out.add(pieces.get(j)); j += 1 }
      }
      pieces = out
      m += 1
    }
    val arr = new Array[Any](pieces.size)
    var k = 0
    while (k < pieces.size) { arr(k) = UTF8String.fromString(pieces.get(k)); k += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[Object])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("bpePieces", this, classOf[BpePieces].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpePieces =
    copy(child = newChild)
}

object BpePieces {
  private[functions] val mergeRules: Array[(String, String)] =
    BpeTokenizer.merges.toArray

  /** Column-API entry point: text → subword piece array. */
  def bpe_pieces(c: Column): Column =
    ColumnBridge.column(BpePieces(ColumnBridge.expression(c)))
}
