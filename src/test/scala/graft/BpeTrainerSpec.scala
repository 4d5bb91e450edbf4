package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrainer

/** The distributed BPE trainer vs a sequential reference: same word
  * frequencies, same argmax tiebreak, same leftmost merge — the
  * learned merge lists must be identical.
  */
class BpeTrainerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Sequential reference: word-type counts → iterate (most frequent
    * adjacent pair, ties by (a, b) ascending; merge leftmost
    * non-overlapping everywhere).
    */
  private def refTrain(texts: Seq[String], nMerges: Int): Seq[(String, String)] = {
    val words = texts
      .flatMap(t => "[^\\p{L}]+".r.split(t.toLowerCase).filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong)
    var state: Map[Vector[String], Long] = words.toSeq
      .map { case (w, n) => w.map(_.toString).toVector -> n }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val out = Seq.newBuilder[(String, String)]
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (ps, n) =>
        ps.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (a, b) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head._1
        out += ((a, b))
        state = state.toSeq.map { case (ps, n) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < ps.length) {
            if (i + 1 < ps.length && ps(i) == a && ps(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += ps(i); i += 1 }
          }
          merged.result() -> n
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    out.result()
  }

  test("learned merges equal the sequential reference on a small corpus") {
    import spark.implicits._
    val texts = Seq(
      "the thin thing sang another anthem",
      "in the ring the king was singing",
      "thin things ring true in the end",
      "sing a song of singing kings")
    val got = BpeTrainer.train(texts.toDF("text"), nMerges = 10)
    val want = refTrain(texts, 10)
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty && got.forall { case (a, b) => (a + b).nonEmpty })
  }

  test("learned merges equal the reference on the real corpus (first 8)") {
    import spark.implicits._
    val texts = graft.sources.Tables.documents(spark, sf)
      .select("text").as[String].collect().toSeq
    val got = BpeTrainer.train(
      graft.sources.Tables.documents(spark, sf), nMerges = 8)
    val want = refTrain(texts, 8)
    assert(got == want, s"got $got\nwant $want")
    info(s"learned: ${got.map { case (a, b) => s"$a+$b" }.mkString(", ")}")
  }

  /** Expand a word-frequency map into texts (one word per doc). */
  private def corpus(words: (String, Int)*): Seq[String] =
    words.flatMap { case (w, n) => Seq.fill(n)(w) }

  test("regression: self-pair merges do not batch past their created pairs") {
    // Adversarial corpus found by randomized search against a pure
    // simulator of the batch rule: accepting ('x','x') creates the
    // pair ('xx','x') out of the accepted candidate's own occurrences
    // (count 19, tying ('z','y') and winning the lexicographic
    // tiebreak), so a batch that accepts anything after a self-pair
    // diverges from sequential.
    import spark.implicits._
    val texts = corpus("xyxy" -> 3, "xxxzy" -> 12, "zyx" -> 5,
                       "xyz" -> 10, "xxx" -> 7, "yzy" -> 2)
    val got = BpeTrainer.train(texts.toDF("text"), nMerges = 10, batchK = 8)
    assert(got == refTrain(texts, 10), s"got $got\nwant ${refTrain(texts, 10)}")
  }

  test("regression: a merge recreating a prior round's piece stops the batch") {
    // Second searched pin: here a candidate's result string equals a
    // piece merged in an earlier round, so applying it grows counts
    // of pre-existing pairs touching that piece — the batch must stop
    // at it rather than accept later candidates at stale counts.
    import spark.implicits._
    val texts = corpus("yxyzy" -> 11, "xz" -> 3, "xzyxz" -> 11,
                       "yyy" -> 4, "zyzzyz" -> 2, "yyxx" -> 1, "zy" -> 11)
    val got = BpeTrainer.train(texts.toDF("text"), nMerges = 10, batchK = 4)
    assert(got == refTrain(texts, 10), s"got $got\nwant ${refTrain(texts, 10)}")
  }

  test("training exhausts gracefully when words fully fuse") {
    import spark.implicits._
    val got = BpeTrainer.train(Seq("ab ab ab").toDF("text"), nMerges = 10)
    // "ab" fuses in one merge; nothing left after
    assert(got == Seq(("a", "b")))
  }

  test("batched merges are identical to sequential at every batch width") {
    import spark.implicits._
    val texts = Seq(
      "the thin thing sang another anthem",
      "in the ring the king was singing",
      "thin things ring true in the end",
      "sing a song of singing kings",
      "pack my box with five dozen liquor jugs",
      "sphinx of black quartz judge my vow")
    val df = texts.toDF("text")
    val (sequential, seqRounds) =
      BpeTrainer.trainWithRounds(df, nMerges = 16, batchK = 1)
    for (k <- Seq(4, 8, 16)) {
      val (batched, rounds) =
        BpeTrainer.trainWithRounds(df, nMerges = 16, batchK = k)
      assert(batched == sequential, s"batchK=$k diverged:\n$batched\n$sequential")
      assert(rounds <= seqRounds, s"batchK=$k took $rounds > $seqRounds rounds")
      info(s"batchK=$k: $rounds rounds vs $seqRounds sequential")
    }
  }

  test("batched merges equal sequential on the real corpus, in fewer rounds") {
    val df = graft.sources.Tables.documents(spark, sf)
    val (sequential, seqRounds) =
      BpeTrainer.trainWithRounds(df, nMerges = 16, batchK = 1)
    val (batched, rounds) =
      BpeTrainer.trainWithRounds(df, nMerges = 16, batchK = 8)
    assert(batched == sequential, s"got $batched\nwant $sequential")
    assert(rounds < seqRounds,
      s"batching saved nothing: $rounds vs $seqRounds rounds")
    info(f"real corpus: $rounds rounds vs $seqRounds sequential " +
      f"(${seqRounds.toDouble / rounds}%.1fx)")
  }
}
