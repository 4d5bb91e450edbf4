package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.HasGramInBloom

/** Expression-identity contract for the streaming contamination gate:
  * the sketch payload is a multi-MiB byte array, and the expression is
  * re-analyzed every micro-batch — equality must compare sketch
  * CONTENT, not array reference, or CSE/canonicalization never fires.
  */
class HasGramInBloomSpec extends AnyFunSuite {

  private def sketchBytes(keys: Seq[Long]): Array[Byte] = {
    val bf = BloomFilter.create(1000, 0.01)
    keys.foreach(bf.putLong)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  private val tokens =
    Literal.create(Seq("a", "b", "c"), ArrayType(StringType))

  test("equal-content sketches make equal (and semanticEquals) expressions") {
    val b1 = sketchBytes(Seq(1L, 2L, 3L))
    val b2 = b1.clone()
    assert(!(b1 eq b2))
    val e1 = HasGramInBloom(tokens, 3, b1)
    val e2 = HasGramInBloom(tokens, 3, b2)
    assert(e1 == e2)
    assert(e1.hashCode == e2.hashCode)
    assert(e1.semanticEquals(e2))
  }

  test("different sketch content or gram width breaks equality") {
    val e1 = HasGramInBloom(tokens, 3, sketchBytes(Seq(1L, 2L, 3L)))
    assert(e1 != HasGramInBloom(tokens, 3, sketchBytes(Seq(9L))))
    assert(e1 != HasGramInBloom(tokens, 2, sketchBytes(Seq(1L, 2L, 3L))))
  }
}
