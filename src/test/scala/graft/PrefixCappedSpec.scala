package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Pins for `dedup_ngram_prefix_capped` (df-capped exact-Jaccard
  * twin of the prefix join). The twin's contract:
  *  - where the distinct-text df cap does NOT bind, its output equals
  *    the uncapped prefix join's (asserted on the real sf0.001 corpus
  *    and via cap = Long.MaxValue differential replay);
  *  - where it binds, the output is a SUBSET of the uncapped pair set
  *    and every returned pair carries its exact full-set Jaccard —
  *    so ranking among returned pairs is preserved (asserted on a
  *    planted corpus with a hot boilerplate gram).
  */
class PrefixCappedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("capped twin equals the uncapped prefix join where the cap does not bind") {
    val capped = pairs(Dedup.ngramPrefixCapped(spark, sf))
    val uncapped = pairs(Dedup.ngramPrefixJoin(spark, sf))
    assert(capped == uncapped,
      s"\nonly-uncapped ${uncapped -- capped}\nonly-capped ${capped -- uncapped}")
    assert(uncapped.nonEmpty, "corpus must contain >=0.8 pairs for this pin to bite")
  }

  test("cap = MaxValue replays the full shared-gram candidate set") {
    val s = spark
    import s.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"),
      (3L, "totally unrelated words about catalyst whole stage codegen")
    ).toDF("doc_id", "text")
    val g = Dedup.gramHashRowsOf(docs)
    val unbounded = pairs(Dedup.ngramDfCappedJoinOf(g, Long.MaxValue))
    val reference = pairs(Dedup.ngramPrefixJoinOf(g))
    assert(unbounded == reference)
    assert(unbounded.map(p => (p._1, p._2)) == Set((1L, 2L)))
  }

  test("binding cap: subset with exact scores, ranking preserved") {
    val s = spark
    import s.implicits._
    // Every doc shares the hot boilerplate prefix (df = 6 > cap = 5);
    // docs 1/2 and 3/4 additionally share rare tails (df = 2).
    val boiler = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val docs = Seq(
      (1L, boiler + " red green blue"),
      (2L, boiler + " red green blue extra"),
      (3L, boiler + " cyan magenta yellow"),
      (4L, boiler + " cyan magenta yellow extra"),
      (5L, boiler),                                // only boilerplate grams
      (6L, boiler + " solitary unique ending")     // rare tail, no partner
    ).toDF("doc_id", "text")
    val g = Dedup.gramHashRowsOf(docs)
    val capped = pairs(Dedup.ngramDfCappedJoinOf(g, 5L))
    val uncapped = pairs(Dedup.ngramPrefixJoinOf(g))
    // subset: the cap can only drop pairs, never add or rescore
    assert(capped.subsetOf(uncapped),
      s"capped pairs not in uncapped: ${capped -- uncapped}")
    // every returned pair carries the identical exact Jaccard, so the
    // score ranking among returned pairs is the uncapped ranking
    val uncappedScores = uncapped.map(p => (p._1, p._2) -> p._3).toMap
    capped.foreach { case (a, b, j) => assert(uncappedScores((a, b)) == j) }
    // the pairs joined by rare tails survive the cap; doc 5 (pure
    // boilerplate, J >= 0.8 with everything sharing the boiler) loses
    // its pairs — exactly the documented semantics change
    val cappedIds = capped.map(p => (p._1, p._2))
    assert(cappedIds.contains((1L, 2L)) && cappedIds.contains((3L, 4L)))
    assert(!cappedIds.exists(p => p._1 == 5L || p._2 == 5L))
    assert(uncapped.exists(p => p._1 == 5L || p._2 == 5L),
      "pin requires the uncapped join to actually pair doc 5")
  }

  test("clone-heavy corpus takes the collapse side; output matches a plain reference") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu",
      "one two three four five six seven eight nine ten eleven twelve",
      "ab",                                         // gram-less clone group
      "totally different content about catalyst plans and shuffles here")
    // 4 clones per text -> n = 20 >= 2 * nd = 10: the collapse side fires
    val docs = texts.zipWithIndex.flatMap { case (t, i) =>
      (0 until 4).map(c => ((i * 4 + c).toLong, t))
    }.toDF("doc_id", "text")
    val got = pairs(graft.operators.Dedup.ngramPrefixCappedOf(docs))

    // plain-Scala reference of the collapsed capped pipeline
    def gramsOf(t: String): Set[String] =
      t.split("[^\\p{L}]+").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val rep = texts.indices.map(i => i -> (i * 4).toLong).toMap // min doc_id per text
    val g = texts.indices.map(i => i -> gramsOf(texts(i))).toMap
    val df = g.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    def pr4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val repPairs = (for {
      a <- texts.indices; b <- texts.indices if a < b
      shared = g(a) & g(b)
      if shared.exists(df(_) <= 50)
      c = shared.size
      if 5 * c >= 4 * (g(a) | g(b)).size
    } yield (rep(a), rep(b), pr4(c.toDouble / (g(a) | g(b)).size))).toSet
    val within = (for {
      i <- texts.indices if g(i).nonEmpty
      a <- 0 until 4; b <- 0 until 4 if a < b
    } yield ((i * 4 + a).toLong, (i * 4 + b).toLong, 1.0)).toSet
    val cross = for {
      (ra, rb, j) <- repPairs
      ia = (ra / 4).toInt; ib = (rb / 4).toInt
      a <- 0 until 4; b <- 0 until 4
    } yield {
      val (x, y) = ((ia * 4 + a).toLong, (ib * 4 + b).toLong)
      (math.min(x, y), math.max(x, y), j)
    }
    assert(got == within ++ cross)
    assert(within.nonEmpty && got.nonEmpty)
  }
}
