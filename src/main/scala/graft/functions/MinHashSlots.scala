package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All 16 MinHash slots of a document in ONE map-side pass over its
  * token array — the signature that previously took an n-gram
  * explode plus a 16-column groupBy aggregation per document.
  *
  * Bit-identical to the relational chain (and therefore to the
  * DuckDB oracle) by construction: for each word-3-gram position the
  * gram string "w1 w2 w3" is md5-hashed (the cross-engine
  * `portableHash`: first 8 hex digits as a long) and slot k keeps
  * min((h·(2k+1) + (k²+7)) mod (2³¹−1)). Two exactnesses make the
  * fusion legal: min() is insensitive to duplicate grams, so the
  * distinct step of the shingle table can be skipped outright; and
  * the md5 runs over exactly the bytes of the same gram string the
  * SQL form builds. Fewer than 3 tokens → EMPTY array (the explode
  * form emits no row; callers filter on size).
  *
  * Scale shape: used by the batch signature/pair/drop-list queries
  * AND the per-row streaming form ([[graft.operators.Dedup.withBandKeys]])
  * — one implementation, so batch ≡ stream signatures stay
  * spec-enforced. Null tokens are skipped along with their separator,
  * because the relational form builds grams with `concat_ws`, which
  * drops null arguments AND the separator next to them — hashing a
  * null as "" with the separator kept would diverge from the oracle
  * on arrays with containsNull=true.
  */
case class MinHashSlots(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_slots requires array<string> tokens, got ${other.simpleString}")
    }

  def compute(a: Object): ArrayData = {
    val arr = a.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < 3) return new GenericArrayData(Array.empty[Long])
    val md = MinHashSlots.digests.get()
    val space = ' '.toByte
    val mins = Array.fill(MinHashSlots.K)(Long.MaxValue)
    var i = 0
    while (i <= m - 3) {
      md.reset()
      var wrote = false
      var j = 0
      while (j < 3) {
        if (!arr.isNullAt(i + j)) {
          if (wrote) md.update(space)
          md.update(arr.getUTF8String(i + j).getBytes)
          wrote = true
        }
        j += 1
      }
      val d = md.digest()
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
              ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      var k = 0
      while (k < MinHashSlots.K) {
        val v = (h * (2 * k + 1) + (k * k + 7)) % MinHashSlots.MersennePrime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[Object])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("minHashSlots", this,
        classOf[MinHashSlots].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSlots =
    copy(child = newChild)
}

object MinHashSlots {
  val K = 16
  val MersennePrime = 2147483647L // 2^31-1

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column-API entry point over a token array<string>. */
  def minhash_slots(tokens: Column): Column =
    ColumnBridge.column(MinHashSlots(ColumnBridge.expression(tokens)))
}
