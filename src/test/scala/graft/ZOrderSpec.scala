package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.ZOrder60
import graft.operators.TileMath

/** [[ZOrder60]]: the magic-number spread against a literal bit loop, the
  * parent-prefix property the tile pyramid relies on, codegen/interpreted
  * parity, and the locality the layout key exists to deliver.
  */
class ZOrderSpec extends SparkSpec {

  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 30) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave matches the bit-loop reference on edge and random coords") {
    val edge = Seq(0L, 1L, 2L, 3L, 1023L, 16383L, (1L << 30) - 1)
    val rnd = new scala.util.Random(7)
    val coords = (for (x <- edge; y <- edge) yield (x, y)) ++
      Seq.fill(200)((rnd.nextLong().abs % (1L << 30), rnd.nextLong().abs % (1L << 30)))
    coords.foreach { case (x, y) =>
      assert(ZOrder60.interleave(x, y) === mortonRef(x, y), s"($x, $y)")
    }
  }

  test("high bits beyond 30 are masked, result stays non-negative") {
    assert(ZOrder60.interleave(-1L, -1L) === mortonRef((1L << 30) - 1, (1L << 30) - 1))
    assert(ZOrder60.interleave(Long.MaxValue, Long.MaxValue) >= 0L)
  }

  test("parent prefix: zorder(x >> d, y >> d) == zorder(x, y) >> 2d") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 100; d <- Seq(1, 3, 6)) {
      val x = rnd.nextLong().abs % (1L << 30)
      val y = rnd.nextLong().abs % (1L << 30)
      assert(ZOrder60.interleave(x >> d, y >> d) ===
        (ZOrder60.interleave(x, y) >> (2 * d)))
    }
  }

  private def parityOn(wholeStage: Boolean): Unit = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, wholeStage.toString)
    try {
      val rnd = new scala.util.Random(13)
      val rows = Seq.fill(64)(Row(rnd.nextInt(1 << 14).toLong, rnd.nextInt(1 << 14).toLong))
      val out = df("x LONG, y LONG", rows)
        .select(col("x"), col("y"), TileMath.zorder(col("x"), col("y")).as("z"))
        .collect()
      out.foreach(r => assert(r.getLong(2) === mortonRef(r.getLong(0), r.getLong(1))))
    } finally spark.conf.set(key, prev)
  }

  test("column wrapper parity (whole-stage codegen)") { parityOn(true) }
  test("column wrapper parity (interpreted)") { parityOn(false) }

  test("z-sorted order keeps quadrant blocks contiguous (layout locality)") {
    // all 16x16 coords z-sorted: every 4x4-aligned quadrant must occupy one
    // contiguous run — the row-group-pruning property the key exists for.
    val all = for (x <- 0 until 16; y <- 0 until 16) yield (x, y)
    val sorted = all.sortBy { case (x, y) => ZOrder60.interleave(x, y) }
    val quadrantRuns = sorted.map { case (x, y) => (x / 4, y / 4) }
    // count transitions between distinct quadrants: contiguous runs => 15
    val transitions = quadrantRuns.sliding(2).count { case Seq(a, b) => a != b }
    assert(transitions === 15)
  }
}
