package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Custom Generator: one row per DISTINCT word-n-gram of a token
  * array, as an 8-byte gram HASH plus the document's total distinct
  * gram count riding on every row — the exact input the n-gram
  * Jaccard join needs, produced in ONE pass with no gram string
  * materialized and no per-doc window shuffle for the set size.
  *
  * Gram identity is the ordered token tuple via the same XXH64
  * chain as [[GramRunStats]] (hash each token once, mix n seeded
  * steps), so ("ab","c") and ("a","bc") stay distinct and two docs
  * produce equal hashes iff their grams are equal — modulo the
  * accepted 64-bit within-join collision risk (~grams²/2⁶⁵; the
  * string-keyed DuckDB oracle re-checks every gate run). Fewer than
  * n tokens emits nothing, matching the shingle explode.
  */
case class DistinctGramHashes(child: Expression, n: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"gram width must be >= 1, got $n")

  override def elementSchema: StructType = StructType(
    StructField("gh", LongType, nullable = false) ::
    StructField("n", LongType, nullable = false) :: Nil)

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
    // primitive open-addressing set: at 50x data the boxed
    // LinkedHashSet allocated ~one java.lang.Long + entry per gram
    // occurrence and measured ~2x on the whole df-capped query
    val seen = new LongHashSet(m - n + 1)
    i = 0
    while (i <= m - n) {
      var h = GramRunStats.Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      seen.add(h)
      i += 1
    }
    val total = seen.size.toLong
    val keys = seen.keysIterator
    new Iterator[InternalRow] {
      override def hasNext: Boolean = keys.hasNext
      override def next(): InternalRow = InternalRow(keys.next(), total)
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : DistinctGramHashes = copy(child = newChild)
}

object DistinctGramHashes {
  /** Column-API entry point: token array → (gh, n) rows. */
  def distinct_gram_hashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(DistinctGramHashes(ColumnBridge.expression(tokens), n))
}

/** Minimal primitive long set: open addressing, linear probing,
  * power-of-2 capacity, load ≤ 0.5. Zero-allocation per element
  * (one long[] total) — the boxed alternative costs an object per
  * DISTINCT key plus a box per ADD, which dominates at gram volume.
  * The reserved empty slot value is re-mapped to a sentinel key, so
  * any long can be stored.
  */
private[functions] final class LongHashSet(expected: Int) {
  // 0 marks an empty slot; the actual value 0 is tracked separately
  private var cap = java.lang.Integer.highestOneBit(
    math.max(8, expected * 2 - 1)) << 1
  private var keys = new Array[Long](cap)
  private var n = 0
  private var hasZero = false

  def size: Int = n + (if (hasZero) 1 else 0)

  def add(k: Long): Unit = {
    if (k == 0L) { hasZero = true; return }
    var i = (java.lang.Long.hashCode(k) & (cap - 1))
    while (keys(i) != 0L) {
      if (keys(i) == k) return
      i = (i + 1) & (cap - 1)
    }
    keys(i) = k
    n += 1
    if (n * 2 > cap) grow()
  }

  private def grow(): Unit = {
    val old = keys
    cap <<= 1
    keys = new Array[Long](cap)
    val saved = n
    n = 0
    var i = 0
    while (i < old.length) {
      if (old(i) != 0L) add(old(i))
      i += 1
    }
    assert(n == saved)
  }

  def keysIterator: Iterator[Long] = {
    val zero = if (hasZero) Iterator.single(0L) else Iterator.empty
    zero ++ keys.iterator.filter(_ != 0L)
  }
}
