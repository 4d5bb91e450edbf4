package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Generator (the native UDTF form): distinct word
  * n-gram shingles of a token array, one output row per shingle —
  * `explode(array_distinct(transform(sequence(...), ...)))` as a
  * single streaming operator that never materializes the shingle
  * array per row.
  *
  * When to use which: the array+explode composition stays inside
  * whole-stage codegen and wins on short documents (the shipped
  * `Dedup.shingles` path — test corpus rows are <500 chars); this
  * generator is the long-document form, where the O(tokens) per-row
  * array materialization dominates and streaming emission with a
  * bounded dedup set is worth dropping out of codegen for
  * (Generators run via GenerateExec; a custom one is CodegenFallback
  * by construction). `WordNGramsSpec` pins output equality between
  * the two forms, so swapping is a pure plan choice.
  */
case class WordNGrams(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("g", StringType) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Iterator.empty
    else {
      val m = arr.numElements()
      val seen = mutable.HashSet.empty[UTF8String]
      (0 to m - n).iterator.flatMap { i =>
        val parts = (i until i + n).map(j => arr.getUTF8String(j))
        val g = UTF8String.concatWs(UTF8String.fromString(" "), parts: _*)
        if (seen.add(g)) Iterator.single(InternalRow(g)) else Iterator.empty
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  /** Column-API entry point: token array → shingle rows. */
  def word_ngrams(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(tokens), n))
}
