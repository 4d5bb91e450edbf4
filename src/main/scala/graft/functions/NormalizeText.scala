package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text normalization for fuzzy-exact dedup: case-fold
  * letters, keep digits, collapse every other run to a single space,
  * trim. Semantically identical to
  * `trim(regexp_replace(lower(text), "[^\\p{L}\\p{N}]+", " "))`
  * (the oracle form) — `Character.isLetter/isDigit` over code points
  * match `\p{L}`/`\p{N}`, and `Character.toLowerCase(int)` matches
  * `lower()`'s per-code-point mapping for the 1:1 case folds — but as
  * one code-point walk instead of a lowercase materialization plus a
  * Unicode-class NFA pass (measured ~3 s of the 4 s dedup_norm spent
  * in the regex at sf0.1).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormalizeText$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  /** `\p{N}` is Nd ∪ Nl ∪ No; Character.isDigit covers only Nd. */
  private def isNumberCategory(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }

  /** Single code-point pass: alphanumerics (L* ∪ N*) kept and
    * case-folded (lower() maps even Nl code points like Ⅻ→ⅻ), any
    * other run becomes one space; leading/trailing space suppressed.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val cp = str.codePointAt(i)
      val w = Character.charCount(cp)
      if (Character.isLetter(cp) || isNumberCategory(cp)) {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.appendCodePoint(Character.toLowerCase(cp))
      } else if (sb.length() > 0) {
        pendingSpace = true
      }
      i += w
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column-API entry point. */
  def normalize_text(c: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c)))
}
