package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** TRUE iff any word-n-gram of the token array probes positive in a
  * pre-built Bloom filter of gram hashes — the map-side contamination
  * gate of a STREAMING ingest: the eval set's gram sketch is built
  * once at pipeline start, embedded in the plan as bytes, and every
  * arriving document is admitted or dropped in the scan stage with
  * zero state and zero joins.
  *
  * Gram hashing is the [[DistinctGramHashes]] XXH64 chain, so a
  * sketch built from that generator's `gh` column probes exactly the
  * same key space. Bloom semantics decide the gate's error direction:
  * a contaminated document can NEVER pass (no false negatives), and
  * a clean document is wrongly dropped at the sketch's fpp — the
  * right trade for a live gate, with the exact batch scan
  * (`txt_decontam`) as the reconciliation path.
  */
case class HasGramInBloom(child: Expression, n: Int, bloomBytes: Array[Byte])
    extends UnaryExpression {

  require(n >= 1, s"gram width must be >= 1, got $n")

  override def dataType: DataType = BooleanType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"has_gram_in_bloom requires array<string> tokens, got ${other.simpleString}")
    }

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  // The case-class defaults compare the multi-MiB sketch array by
  // REFERENCE, so two semantically identical probes would never be
  // semanticEquals — defeating CSE/canonicalization for an expression
  // that is re-analyzed every streaming micro-batch. Compare content,
  // and cache the (expensive) content hash.
  @transient private lazy val bloomBytesHash: Int =
    java.util.Arrays.hashCode(bloomBytes)

  override def equals(other: Any): Boolean = other match {
    case that: HasGramInBloom =>
      n == that.n && child == that.child &&
        java.util.Arrays.equals(bloomBytes, that.bloomBytes)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(classOf[HasGramInBloom], child,
      Integer.valueOf(n), Integer.valueOf(bloomBytesHash))

  def compute(a: Object): Boolean = {
    val arr = a.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return false
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
    i = 0
    while (i <= m - n) {
      var h = GramRunStats.Seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      if (bf.mightContainLong(h)) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[Object])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("hasGramInBloom", this,
        classOf[HasGramInBloom].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): HasGramInBloom =
    copy(child = newChild)
}

object HasGramInBloom {
  /** Column-API entry point over a token array<string>. */
  def has_gram_in_bloom(tokens: Column, n: Int, bloomBytes: Array[Byte]): Column =
    ColumnBridge.column(HasGramInBloom(ColumnBridge.expression(tokens), n, bloomBytes))
}
