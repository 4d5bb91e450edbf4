package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** The whole word-n-gram repetition statistic as ONE expression over
  * the token array: per-token xxhash64, ordered n-gram hash combine,
  * primitive `long[]` sort, and a single equal-adjacent run scan
  * yielding `(n_grams, n_distinct, max_rep)`. `n = 3` is the
  * repetition-score shape; `n = 13` gives the decontamination scan
  * its per-document distinct-gram denominator without shuffling a
  * single gram row.
  *
  * Why not compose it from built-ins: the gram array built with
  * `transform(sequence(...), i -> ...)` is a higher-order function —
  * HOFs are CodegenFallback in Spark, so every element evaluates an
  * INTERPRETED expression tree (boxing, virtual dispatch, per-call
  * allocation), and measurement showed that interpreted per-position
  * work dominating `txt_repetition` (~6 s of a 4.5-9 s query at
  * sf0.1) no matter what the lambda computed. This expression runs
  * the same logic as a tight JVM loop: each token hashed once
  * (XXH64 over its UTF-8 bytes), each gram three `hashLong` mixes,
  * `java.util.Arrays.sort` on primitives, one run scan — no
  * per-element expression evaluation anywhere.
  *
  * Gram identity is the ordered token triple: per-position hashes are
  * combined with three seeded `hashLong` steps, so ("ab","c") and
  * ("a","bc") stay distinct. Counts agree with exact string grams
  * unless two distinct grams of ONE document collide in 64 bits
  * (P ≈ grams² / 2⁶⁵ per doc ≈ 10⁻¹⁵) — the DuckDB oracle keeps the
  * exact string-keyed GROUP BY form and re-checks at every gate run.
  *
  * Fewer than `n` tokens (no grams) yields (0, 0, 0); null tokens
  * hash to a fixed sentinel, so they behave as one distinct value.
  */
case class GramRunStats(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram width must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_rep", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_run_stats requires array<string> tokens, got ${other.simpleString}")
    }

  def compute(a: Object): org.apache.spark.sql.catalyst.InternalRow = {
    val arr = a.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val out = new GenericInternalRow(3)
    if (m < n) {
      out.setLong(0, 0L); out.setLong(1, 0L); out.setLong(2, 0L)
      return out
    }
    // one hash per token, reused by the (up to) n grams it joins
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      th(i) =
        if (arr.isNullAt(i)) GramRunStats.NullToken
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes,
            GramRunStats.Seed)
        }
      i += 1
    }
    val g = m - n + 1
    val gh = new Array[Long](g)
    i = 0
    while (i < g) {
      var h = GramRunStats.Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      gh(i) = h
      i += 1
    }
    java.util.Arrays.sort(gh)
    var best = 0L
    var run = 0L
    var distinct = 0L
    i = 0
    while (i < g) {
      if (i > 0 && gh(i) == gh(i - 1)) run += 1
      else { run = 1; distinct += 1 }
      if (run > best) best = run
      i += 1
    }
    out.setLong(0, g.toLong)
    out.setLong(1, distinct)
    out.setLong(2, best)
    out
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[Object])

  // one call into [[compute]] per row: the loop work is O(tokens log
  // tokens) inside plain JVM code, so the call overhead is noise and
  // the surrounding projection stays in whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("gramRunStats", this, classOf[GramRunStats].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): GramRunStats =
    copy(child = newChild)
}

object GramRunStats {
  private[functions] val Seed = 42L
  // xxhash64 of nothing at seed 42 — shared with DistinctGramHashes
  // so both derive the SAME gram identity for the same token tuple
  private[functions] val NullToken = -7046029254386353131L

  /** Column-API entry point over a token array<string>. */
  def gram_run_stats(tokens: Column, n: Int = 3): Column =
    ColumnBridge.column(GramRunStats(ColumnBridge.expression(tokens), n))
}
