package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.functions.MaxRunLength.max_run_length

/** The codegen'd longest-run expression vs a Scala reference, plus
  * the codegen assertion that keeps it out of the interpreted path.
  */
class MaxRunLengthSpec extends AnyFunSuite with TableDrivenPropertyChecks {
  lazy val spark = SparkTestSession.spark

  private def ref(xs: Seq[String]): Long = {
    var best = 0L; var run = 0L; var prev: String = null
    xs.foreach { x =>
      run = if (prev != null && x == prev) run + 1 else 1
      if (run > best) best = run
      prev = x
    }
    best
  }

  test("matches the reference on hand and random cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cases: Seq[Seq[String]] =
      Seq(Seq.empty, Seq("a"), Seq("a", "a", "b", "b", "b", "c"),
          Seq("x", "y", "x"), Seq.fill(100)("same")) ++
      (1 to 50).map(_ => Seq.fill(rnd.nextInt(40))(rnd.nextInt(5).toString))
    val got = cases.toDF("xs")
      .select(max_run_length(col("xs")).as("n")).as[Long].collect()
    cases.zip(got).foreach { case (xs, n) =>
      assert(n == ref(xs), s"for $xs")
    }
  }

  test("sorted-array multiplicity equals the groupBy count it replaces") {
    import spark.implicits._
    val docs = Seq(
      Seq("b", "a", "b", "c", "b", "a"),
      Seq("q"), Seq("z", "z", "z"))
    val viaExpr = docs.toDF("xs")
      .select(max_run_length(array_sort(col("xs"))).as("n"))
      .as[Long].collect().toSeq
    val viaGroup = docs.map(xs =>
      if (xs.isEmpty) 0L else xs.groupBy(identity).values.map(_.size).max.toLong)
    assert(viaExpr == viaGroup)
  }

  test("null elements: adjacent nulls extend a run, null breaks a value run") {
    import spark.implicits._
    // codegen path (via collect) and interpreted path (via eval) must
    // agree: null==null extends, null vs value resets
    val got = spark.range(1)
      .selectExpr(
        "array('a', null, null, null, 'a', 'a') as xs1",
        "array(null, 'b', 'b', null) as xs2",
        "array(cast(null as string)) as xs3")
      .select(max_run_length(col("xs1")), max_run_length(col("xs2")),
              max_run_length(col("xs3")))
      .as[(Long, Long, Long)].collect().head
    assert(got == ((3L, 2L, 1L)))
    // interpreted path directly
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val e = graft.functions.MaxRunLength(
      org.apache.spark.sql.catalyst.expressions.Literal.create(null,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
    val arr = new GenericArrayData(Array[Any](
      UTF8String.fromString("a"), null, null, null,
      UTF8String.fromString("a"), UTF8String.fromString("a")))
    assert(e.nullSafeEval(arr) == 3L)
  }

  test("stays inside whole-stage codegen") {
    // a literal input constant-folds to a LocalTableScan; range keeps
    // the projection live so the asterisked codegen stage is visible
    val plan = spark.range(3)
      .selectExpr("array(cast(id as string), 'a') as xs")
      .select(max_run_length(col("xs")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
