package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bin-bucketed range join vs the naive theta join it replaces: exact
  * result equivalence on randomized data across bin widths, the interval
  * boundary contract, and the no-nested-loop plan guarantee. */
class RangeJoinSpec extends SparkSpec {

  private def randomFixture(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val points = df("k STRING, p BIGINT, pid INT",
      Seq.tabulate(400)(i => Row(s"k${rnd.nextInt(5)}", rnd.nextLong() % 1000L, i)))
    val ranges = df("k STRING, lo BIGINT, hi BIGINT, rid INT",
      Seq.tabulate(120) { i =>
        val lo = rnd.nextLong() % 1000L
        Row(s"k${rnd.nextInt(5)}", lo, lo + rnd.nextInt(200) - 20, i)
      })
    (points, ranges)
  }

  private def naive(points: org.apache.spark.sql.DataFrame,
                    ranges: org.apache.spark.sql.DataFrame) =
    points.join(ranges, Seq("k"))
      .where(col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "rid")

  test("equivalent to the theta join on randomized data, any bin width") {
    for (seed <- Seq(1, 2); width <- Seq(1L, 13L, 64L, 1000L, 100000L)) {
      val (points, ranges) = randomFixture(seed)
      val expected = rowSet(naive(points, ranges))
      val got = rowSet(RangeJoin.joinPointInRange(
        points, ranges, Seq("k"), "p", "lo", "hi", width).select("pid", "rid"))
      assert(got === expected, s"seed=$seed width=$width")
    }
  }

  test("boundary contract: lo inclusive, hi exclusive, empty never matches") {
    val points = df("k STRING, p BIGINT, pid INT",
      Seq(Row("a", 10L, 0), Row("a", 19L, 1), Row("a", 20L, 2), Row("a", 9L, 3)))
    val ranges = df("k STRING, lo BIGINT, hi BIGINT, rid INT",
      Seq(Row("a", 10L, 20L, 0), Row("a", 15L, 15L, 1), Row("a", 16L, 15L, 2)))
    val got = rowSet(RangeJoin.joinPointInRange(
      points, ranges, Seq("k"), "p", "lo", "hi", 7L).select("pid", "rid"))
    assert(got === Set(Seq(0, 0), Seq(1, 0))) // p=10 and p=19 in [10,20) only
  }

  test("an interval spanning many bins matches a point exactly once") {
    val points = df("k STRING, p BIGINT, pid INT", Seq(Row("a", 500L, 0)))
    val ranges = df("k STRING, lo BIGINT, hi BIGINT, rid INT",
      Seq(Row("a", -1000L, 10000L, 0)))
    val got = RangeJoin.joinPointInRange(
      points, ranges, Seq("k"), "p", "lo", "hi", 10L)
    assert(got.count() === 1L)
  }

  test("negative coordinates bin correctly (floor, not truncate)") {
    val points = df("k STRING, p BIGINT, pid INT",
      Seq(Row("a", -5L, 0), Row("a", -15L, 1)))
    val ranges = df("k STRING, lo BIGINT, hi BIGINT, rid INT",
      Seq(Row("a", -10L, 0L, 0)))
    val got = rowSet(RangeJoin.joinPointInRange(
      points, ranges, Seq("k"), "p", "lo", "hi", 10L).select("pid", "rid"))
    assert(got === Set(Seq(0, 0)))
  }

  test("the plan is an equi-join — no nested loop, no cartesian product") {
    val (points, ranges) = randomFixture(3)
    def nestedLoops(p: SparkPlan): Int = p.collect {
      case _: BroadcastNestedLoopJoinExec => 1
      case _: CartesianProductExec => 1
    }.size
    val rewritten = RangeJoin.joinPointInRange(
      points, ranges, Seq("k"), "p", "lo", "hi", 64L)
    assert(nestedLoops(rewritten.queryExecution.executedPlan) === 0)
    // and the shape it replaces really is the nested loop (keyless form)
    val theta = points.crossJoin(ranges.drop("k"))
      .where(col("p") >= col("lo") && col("p") < col("hi"))
    assert(nestedLoops(theta.queryExecution.executedPlan) > 0)
  }
}
