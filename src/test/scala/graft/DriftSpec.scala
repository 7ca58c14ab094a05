package graft

import org.apache.spark.sql.functions._

import graft.operators.Drift

/** CUSUM fixtures: the closed prefix form against the textbook
  * recursion, plus alarm/reset behavior. */
class DriftSpec extends SparkSpec {

  private def run(vals: Seq[Double], target: Double, slack: Double,
      threshold: Double): Seq[(Long, Boolean)] = {
    import spark.implicits._
    Drift.cusum(
        vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
          .toDF("k", "i", "v"),
        "k", col("i"), col("i"), col("v"), target, slack, threshold)
      .orderBy("i")
      .collect().map(r => (r.getAs[Long]("cusum"), r.getAs[Boolean]("alarm")))
      .toSeq
  }

  private def textbook(vals: Seq[Double], target: Double, slack: Double): Seq[Long] =
    vals.scanLeft(0L) { (s, x) =>
      math.max(0L, s + math.round(x * 100) - math.round((target + slack) * 100))
    }.tail

  test("closed prefix form equals the textbook max(0, ...) recursion") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 5) {
      val vals = Seq.fill(40)(rnd.nextDouble() * 20)
      val got = run(vals, target = 8.0, slack = 1.0, threshold = 10.0).map(_._1)
      assert(got === textbook(vals, 8.0, 1.0))
    }
  }

  test("a level shift alarms; recovery drains the statistic back to zero") {
    // 10 in-control points (x = target+slack: dev 0), 5 shifted by +10,
    // then 10 points far below target drain S back to 0
    val vals = Seq.fill(10)(6.0) ++ Seq.fill(5)(16.0) ++ Seq.fill(10)(0.0)
    val out = run(vals, target = 5.0, slack = 1.0, threshold = 25.0)
    assert(out.take(10).forall { case (s, a) => s == 0L && !a })
    // after 3 shifted points S = 3000 cents > 2500: alarm
    assert(out(12)._2 && out(14)._1 === 5000L)
    assert(out.last._1 === 0L && !out.last._2)
  }

  test("series are independent across keys") {
    import spark.implicits._
    val df = Seq((1L, 0L, 100.0), (2L, 0L, 0.0), (1L, 1L, 100.0), (2L, 1L, 0.0))
      .toDF("k", "i", "v")
    val out = Drift.cusum(df, "k", col("i"), col("i"), col("v"),
        target = 5.0, slack = 0.0, threshold = 50.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("cusum")).toMap
    assert(out((1L, 1L)) === 19000L) // 2 x 9500
    assert(out((2L, 1L)) === 0L)
  }
}
