package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd tokenizer with the reference's exact semantics
  * (wc/wc.go:26-39): maximal runs of Unicode letters, everything else
  * a separator, case preserved, no empty tokens.
  *
  * Replaces `filter(split(text, "[^\\p{L}]+"), length(_) > 0)`: one
  * code-point walk per row instead of an NFA regex pass plus an
  * empties filter, and the generated code is a single static call —
  * no per-row regex state. `Character.isLetter(int)` covers exactly
  * the Unicode L* categories, the same set `\p{L}` matches and the
  * same predicate Go's `unicode.IsLetter` uses; parity is enforced by
  * a differential spec and the byte-level golden test.
  */
case class TokenizeWords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TokenizeWords.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenizeWords$$.MODULE$$.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenizeWords =
    copy(child = newChild)
}

object TokenizeWords {

  /** Single pass over code points (surrogate-pair aware). Called from
    * generated code — keep the signature Java-friendly.
    */
  def tokenize(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    val n = str.length
    var i = 0
    var start = -1
    while (i < n) {
      val cp = str.codePointAt(i)
      val w = Character.charCount(cp)
      if (Character.isLetter(cp)) {
        if (start < 0) start = i
      } else if (start >= 0) {
        out += UTF8String.fromString(str.substring(start, i))
        start = -1
      }
      i += w
    }
    if (start >= 0) out += UTF8String.fromString(str.substring(start))
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point. */
  def tokenize_words(c: Column): Column =
    ColumnBridge.column(TokenizeWords(ColumnBridge.expression(c)))
}
