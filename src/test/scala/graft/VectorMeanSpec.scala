package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorMean.vector_mean

/** The imperative vector-mean aggregate vs the relational
  * posexplode + per-dim aggregation it replaced in k-means training:
  * values must be bit-identical (integerized sums are order-exact).
  */
class VectorMeanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Scale = 1048576.0

  test("equals the posexplode + per-dim mean on grouped random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 400).map { i =>
      (i % 7, Seq.fill(16)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("cid", "v")
    val viaAgg = df
      .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cid"), col("dim"))
      .agg((sum(floor(col("x") * Scale + lit(0.5))).cast("double")
            / count(lit(1)) / Scale).as("m"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
      .select(col("cid"), expr("transform(pairs, p -> p.m)").as("cv"))
      .as[(Int, Seq[Double])].collect().toMap
    val viaExpr = df.groupBy(col("cid"))
      .agg(vector_mean(col("v"), Scale).as("cv"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(viaExpr.keySet == viaAgg.keySet)
    viaExpr.foreach { case (cid, cv) =>
      assert(cv == viaAgg(cid), s"cid $cid")
    }
  }

  test("ragged vector dimensions throw instead of silently truncating") {
    // The buffer dimension is set by whichever vector a partition
    // sees first, so truncating to min length would make the result
    // partition-order-dependent; ragged inputs must fail loudly.
    import spark.implicits._
    val df = Seq((1, Seq(1.0, 2.0)), (1, Seq(1.0, 2.0, 3.0)),
                 (1, Seq(4.0, 5.0))).toDF("cid", "v")
    val e = intercept[Exception] {
      df.groupBy("cid").agg(vector_mean(col("v"), Scale)).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(msgs.contains("dimension mismatch"), msgs)
  }

  test("partition-count invariance (order-exact integer sums)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val rows = (1 to 300).map(i => (1, Seq.fill(8)(rnd.nextDouble())))
    val one = rows.toDF("cid", "v").repartition(1)
      .groupBy("cid").agg(vector_mean(col("v"), Scale).as("cv"))
      .as[(Int, Seq[Double])].head()
    val many = rows.toDF("cid", "v").repartition(17)
      .groupBy("cid").agg(vector_mean(col("v"), Scale).as("cv"))
      .as[(Int, Seq[Double])].head()
    assert(one == many)
  }
}
