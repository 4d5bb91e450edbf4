package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 64-bit tf-weighted SimHash fingerprint of a document in ONE
  * map-side pass over its token array — replacing a per-word explode,
  * a (doc, word) tf aggregation and a 64-conditional-sum aggregation
  * (whose generated code footprint alone was a compile-time cost).
  *
  * Bit-identical to the relational chain and the DuckDB oracle by
  * construction: term frequencies from an in-loop hash map, 64 hash
  * bits per distinct word from the two md5 halves (digest bytes 0-3 →
  * the cross-engine `portableHash`, bits 32..63; bytes 4-7 →
  * `portableHashLo`, bits 0..31), sum ±tf per bit, bit set iff its
  * sum is positive. The md5 per distinct word is the cross-engine
  * contract's inherent cost and all that remains.
  *
  * Docs with no tokens: callers filter `size(tokens) > 0` first — the
  * relational form emitted no row for them, while an all-negative sum
  * legitimately yields 0L here, so the empty case must not be read as
  * a fingerprint. Null tokens are skipped (the tokenizer never emits
  * them).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string> tokens, got ${other.simpleString}")
    }

  def compute(a: Object): Long = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val tf = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        val c = tf.get(w)
        tf.put(w, if (c == null) 1 else c + 1)
      }
      i += 1
    }
    val sums = new Array[Long](64)
    val md = SimHash64.digests.get()
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      md.reset()
      md.update(e.getKey.getBytes)
      val d = md.digest()
      // hex 1..8 → bits 32..63 (h1), hex 9..16 → bits 0..31 (h0)
      val h1 = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
               ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      val h0 = ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
               ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
      val w = e.getValue.longValue()
      var b = 0
      while (b < 64) {
        val bit = if (b < 32) (h0 >> b) & 1L else (h1 >> (b - 32)) & 1L
        sums(b) += (if (bit == 1L) w else -w)
        b += 1
      }
    }
    var res = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) res |= 1L << b
      b += 1
    }
    res
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[Object])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("simHash64", this, classOf[SimHash64].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column-API entry point over a token array<string>. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
