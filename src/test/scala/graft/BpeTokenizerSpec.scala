package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeTokenizer

/** The string-replacement BPE must BE byte-pair encoding: checked
  * against an independent piece-LIST implementation of rank-ordered
  * leftmost non-overlapping merges, on hand cases and on the real
  * corpus.
  */
class BpeTokenizerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Reference implementation over an explicit piece list: for each
    * merge rule in rank order, one left-to-right pass merging
    * non-overlapping adjacent (a, b) pairs.
    */
  private def refEncode(text: String): Vector[String] = {
    var pieces = text.map(_.toString).toVector
    for ((a, b) <- BpeTokenizer.merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < pieces.length) {
        if (i + 1 < pieces.length && pieces(i) == a && pieces(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += pieces(i); i += 1 }
      }
      pieces = out.result()
    }
    pieces
  }

  test("known merge chains") {
    assert(refEncode("the") == Vector("the"))
    assert(refEncode("thing") == Vector("th", "ing"))
    assert(refEncode("and") == Vector("and"))
    assert(refEncode("another") == Vector("an", "o", "the", "r"))
    // leftmost-greedy on overlapping candidates: t|h|h -> th|h
    assert(refEncode("thh") == Vector("th", "h"))
    // case-sensitive: no uppercase merges in the vocabulary
    assert(refEncode("The") == Vector("T", "h", "e"))
  }

  test("expression pieces and count equal the reference on hand cases") {
    import spark.implicits._
    val cases = Seq("the", "thing", "another", "thh", "The quick brown fox",
      "it's 2024, and testing!", "", "a", "weird input",
      "line\nbreaks and\ttabs", "ingingING", "chesterton")
    val df = cases.toDF("text")
      .select(col("text"), BpeTokenizer.subwordCount(col("text")).as("n"),
              BpeTokenizer.subwordPieces(col("text")).as("pieces"))
    df.collect().foreach { r =>
      val text = r.getString(0)
      // sentinel scrub mirrors the expression's defensive clean
      val ref = refEncode(text.replace("\u0002", "").replace("\u0003", ""))
      assert(r.getLong(1) == ref.length.toLong, s"count for '$text'")
      // empty input included: pieces is an EMPTY array (not [""]),
      // agreeing with count = 0
      assert(r.getSeq[String](2) == ref, s"pieces for '$text'")
    }
  }

  test("property: expression pieces equal the reference on random inputs") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // weighted toward merge-relevant letters so chains actually fire,
    // plus digits/punct/whitespace/unicode to stress the wrapper
    val charGen = Gen.frequency(
      (8, Gen.oneOf("theinganrdolsucf".toSeq)),
      (2, Gen.oneOf('A', 'Z', '0', '9', ' ', '\n', '.', ',', '!', 'é', '中')))
    val textGen = for {
      n <- Gen.choose(0, 120)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    val texts = (1L to 60L).map(s =>
      textGen.apply(Gen.Parameters.default, Seed(s)).get)
    val got = texts.toDF("text")
      .select(col("text"), BpeTokenizer.subwordCount(col("text")).as("n"),
              BpeTokenizer.subwordPieces(col("text")).as("pieces"))
      .collect()
    got.foreach { r =>
      val ref = refEncode(r.getString(0))
      assert(r.getLong(1) == ref.length.toLong, s"count for '${r.getString(0)}'")
      assert(r.getSeq[String](2) == ref)
    }
  }

  test("JVM expression equals the replace chain across the real corpus") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sf)
    val viaExpr = docs.select(col("doc_id"),
      BpeTokenizer.subwordPieces(col("text")).as("p"),
      BpeTokenizer.subwordCount(col("text")).as("n"))
    val viaChain = docs.select(col("doc_id"),
      BpeTokenizer.subwordPiecesChain(col("text")).as("p"),
      BpeTokenizer.subwordCountChain(col("text")).as("n"))
    assert(viaExpr.except(viaChain).isEmpty && viaChain.except(viaExpr).isEmpty)
  }

  test("expression count equals the reference across the real corpus") {
    import spark.implicits._
    val got = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"),
              BpeTokenizer.subwordCount(col("text")).as("n"))
      .as[(Long, String, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, text, n) =>
      assert(n == refEncode(text).length.toLong, s"doc $id")
    }
    // merges do real work: strictly fewer pieces than characters
    assert(got.forall { case (_, text, n) => text.isEmpty || n < text.length })
  }
}
