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

  private def intervalFixture(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    def side(idName: String, n: Int) = {
      val rows = Seq.tabulate(n) { i =>
        val lo = rnd.nextLong() % 1000L
        Row(s"k${rnd.nextInt(4)}", lo, lo + rnd.nextInt(150) - 10, i)
      }
      (rows, idName)
    }
    val (a, _) = side("aid", 150)
    val (b, _) = side("bid", 150)
    (df("k STRING, alo BIGINT, ahi BIGINT, aid INT", a),
     df("k STRING, blo BIGINT, bhi BIGINT, bid INT", b))
  }

  test("interval overlap equivalent to the theta join, each pair once") {
    for (seed <- Seq(5, 6); width <- Seq(1L, 17L, 128L, 100000L)) {
      val (a, b) = intervalFixture(seed)
      // the raw theta predicate alone would also "match" empty intervals
      // ([5,5) against [0,10) satisfies alo<bhi AND blo<ahi) — the
      // operator's half-open semantics exclude them, so the reference must
      val expected = rowSet(a.join(b, Seq("k"))
        .where(col("alo") < col("ahi") && col("blo") < col("bhi") &&
          col("alo") < col("bhi") && col("blo") < col("ahi"))
        .select("aid", "bid"))
      val joined = RangeJoin.joinIntervalOverlap(
        a, b, Seq("k"), "alo", "ahi", "blo", "bhi", width)
      // exact pair set AND exactly one row per pair (the first-shared-bin
      // filter must kill every duplicate without dropping a pair)
      assert(rowSet(joined.select("aid", "bid")) === expected, s"$seed/$width")
      assert(joined.count() === expected.size, s"$seed/$width dup rows")
    }
  }

  test("touching intervals do not overlap (half-open semantics)") {
    val a = df("k STRING, alo BIGINT, ahi BIGINT, aid INT", Seq(Row("a", 0L, 10L, 0)))
    val b = df("k STRING, blo BIGINT, bhi BIGINT, bid INT",
      Seq(Row("a", 10L, 20L, 0), Row("a", 9L, 10L, 1), Row("a", 5L, 5L, 2)))
    val got = rowSet(RangeJoin.joinIntervalOverlap(
      a, b, Seq("k"), "alo", "ahi", "blo", "bhi", 4L).select("aid", "bid"))
    assert(got === Set(Seq(0, 1))) // only [9,10) overlaps [0,10)
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
