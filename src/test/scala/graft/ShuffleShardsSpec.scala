package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** Pins for `smp_shuffle_shards` (Sampling.shuffleShardsOf): the
  * per-shard audit is recomputed independently with `MessageDigest`
  * (not the portableHash column under test), and the result must be
  * identical at 1 and 7 input partitions — the whole point of
  * hash-assigned shards is that physical partitioning can't change
  * the assignment.
  */
class ShuffleShardsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def h32(key: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(key.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  test("per-shard audit matches an independent MessageDigest recompute") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val rows = docs.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    val expected = rows
      .map { case (id, nc) => (h32(s"shuffle:$id") % 16, id, nc, h32(s"shuffle:$id")) }
      .groupBy(_._1)
      .map { case (shard, xs) =>
        val firstDoc = xs.minBy { case (_, id, _, h) => (h, id) }._2
        shard -> ((xs.length.toLong, xs.map(_._3).sum, firstDoc,
                   xs.map(_._4).min, xs.map(_._4).max))
      }

    val got = Sampling.shuffleShardsOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
                                  r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == expected)
    assert(got.values.map(_._1).sum == rows.length.toLong, "every doc in exactly one shard")
  }

  test("assignment is invariant to physical partitioning") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val one = Sampling.shuffleShardsOf(docs.repartition(1)).collect().toSeq
    val seven = Sampling.shuffleShardsOf(docs.repartition(7)).collect().toSeq
    assert(one == seven)
  }

  test("doc_ids beyond 2^31 audit exactly (the 100x-rung envelope)") {
    // the hex-string tie-break key has no doc_id ceiling: the 100x
    // replicated rung offsets ids by up to 99*10^8 (~10^10 > 2^31),
    // which the retired integer packing h*2^31+doc_id could not carry
    val s = spark
    import s.implicits._
    val ids = (0 until 200).map(i => i.toLong * 100000000L + 9900000000L)
    val docs = ids.map(id => (id, 100L + id % 7)).toDF("doc_id", "n_chars")
    val expected = ids
      .map(id => (h32(s"shuffle:$id") % 16, id, 100L + id % 7, h32(s"shuffle:$id")))
      .groupBy(_._1)
      .map { case (shard, xs) =>
        val firstDoc = xs.minBy { case (_, id, _, h) => (h, id) }._2
        shard -> ((xs.length.toLong, xs.map(_._3).sum, firstDoc,
                   xs.map(_._4).min, xs.map(_._4).max))
      }
    val got = Sampling.shuffleShardsOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
                                  r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == expected)
  }

  test("negative doc_id fails loudly (engines render %x differently)") {
    val s = spark
    import s.implicits._
    val docs = Seq((-1L, 10L)).toDF("doc_id", "n_chars")
    val e = intercept[Exception] {
      Sampling.shuffleShardsOf(docs).collect()
    }
    assert(e.getMessage.contains("shuffleShards"))
  }
}
