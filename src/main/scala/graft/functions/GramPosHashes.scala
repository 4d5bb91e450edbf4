package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Custom Generator: EVERY word-n-gram of a token array with its
  * 1-based start position — the positional twin of
  * [[DistinctGramHashes]] (which dedups and drops position). One row
  * per window, (pos, gh), no gram string materialized: the rolling
  * substring-duplication scan needs every occurrence, because a gram
  * repeated twice inside one document is itself a duplicated span.
  *
  * Gram identity is the identical XXH64 chain as
  * [[DistinctGramHashes]]/[[GramRunStats]] (per-token hash once, n
  * seeded mixing steps), so hashes are comparable across the two
  * generators and equal iff the token tuples are equal — modulo the
  * accepted 64-bit collision risk (~grams²/2⁶⁵; the string-keyed
  * DuckDB oracle re-checks every gate run). Fewer than n tokens
  * emits nothing.
  */
case class GramPosHashes(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"gram width must be >= 1, got $n")

  override def elementSchema: StructType = StructType(
    StructField("pos", LongType, nullable = false) ::
    StructField("gh", LongType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) return Iterator.empty
    val m = arr.numElements()
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
    (0 to m - n).iterator.map { p =>
      var h = GramRunStats.Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(p + j), h); j += 1 }
      InternalRow((p + 1).toLong, h)
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : GramPosHashes = copy(child = newChild)
}

object GramPosHashes {
  /** Column-API entry point: token array → (pos, gh) rows, 1-based. */
  def gram_pos_hashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(GramPosHashes(ColumnBridge.expression(tokens), n))
}
