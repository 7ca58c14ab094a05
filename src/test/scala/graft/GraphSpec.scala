package graft

import graft.operators.Graph

/** Hand-computed PageRank fixtures: cycle fixed point, star dynamics,
  * probability conservation, duplicate-edge dedup. */
class GraphSpec extends SparkSpec {

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Double)] = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
  }

  test("a directed cycle is the uniform fixed point") {
    // 0.15/3 + 0.85·(1/3) = 1/3 every iteration
    val out = ranks(Seq((0L, 1L), (1L, 2L), (2L, 0L)), iters = 5)
    out.values.foreach { case (deg, r) =>
      assert(deg === 1L)
      assert(math.abs(r - 1.0 / 3) < 1e-6)
    }
  }

  test("symmetric star matches two hand-computed iterations") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L))
    val it1 = ranks(star, iters = 1)
    // center: 0.15/4 + 0.85·(3·0.25/1); leaf: 0.15/4 + 0.85·(0.25/3)
    assert(math.abs(it1(0L)._2 - 0.675) < 1e-6)
    assert(math.abs(it1(1L)._2 - 0.108333) < 1e-6)
    val it2 = ranks(star, iters = 2)
    assert(math.abs(it2(0L)._2 - 0.31375) < 1e-6)
    assert(math.abs(it2(2L)._2 - 0.22875) < 1e-6)
    assert(it2(0L)._1 === 3L) // center outdeg
  }

  test("rank mass is conserved on symmetric graphs") {
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val out = ranks(edges, iters = 4)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("non-default damping uses (1-d)/N teleport") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L))
    val out = Graph.pageRank(star.toDF("src", "dst"), "src", "dst",
        iters = 1, damping = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // center: 0.5/4 + 0.5·(3·0.25/1) = 0.5; leaf: 0.125 + 0.5·(0.25/3)
    assert(math.abs(out(0L) - 0.5) < 1e-6)
    assert(math.abs(out(1L) - 0.166667) < 1e-6)
  }

  test("odd iteration counts checkpoint-batch correctly") {
    // iters=3 exercises the every-other-pass localCheckpoint with a
    // trailing unbatched iteration; values must match the 2-iter fixture
    // continued one more hand-computed step
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L))
    val it3 = ranks(star, iters = 3)
    // center: 0.0375 + 0.85·(3·0.22875/1); leaf: 0.0375 + 0.85·(0.31375/3)
    assert(math.abs(it3(0L)._2 - 0.620813) < 2e-6)
    assert(math.abs(it3(1L)._2 - 0.126396) < 2e-6)
  }

  test("duplicate input edges collapse before degree counting") {
    val dup = Seq((0L, 1L), (0L, 1L), (1L, 0L))
    val out = ranks(dup, iters = 3)
    assert(out(0L)._1 === 1L)
    // two-node symmetric pair: uniform 1/2 fixed point
    assert(math.abs(out(0L)._2 - 0.5) < 1e-6)
    assert(math.abs(out(1L)._2 - 0.5) < 1e-6)
  }

  test("collected, driver-held, and partitioned PageRank paths are bit-identical") {
    import spark.implicits._
    // an asymmetric-degree graph (star + chain + cycle tail) run for
    // enough iterations to cross the partitioned path's every-third-pass
    // checkpoint cadence, including its skipped final pass. The q12
    // integer-quantization contract says all THREE implementations produce
    // the exact same doubles — assert row-set equality, not approximate
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L),
      (3L, 4L), (4L, 3L), (4L, 5L), (5L, 4L), (5L, 6L), (6L, 5L),
      (6L, 0L), (0L, 6L)).toDF("src", "dst")
    for (iters <- Seq(3, 5, 7)) {
      def run(driverHeldLimit: Long, edgeCollectLimit: Long) = Graph
        .pageRankWithLimit(edges, "src", "dst", iters, 0.85,
          driverHeldLimit, edgeCollectLimit)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val collected = run(Long.MaxValue, Long.MaxValue)
      val driverHeld = run(Long.MaxValue, 0L)
      val partitioned = run(0L, 0L)
      assert(driverHeld === collected, s"driver-held diverged at iters=$iters")
      assert(partitioned === collected, s"partitioned diverged at iters=$iters")
    }
  }

  test("triangleCounts: K4 minus an edge, with dup/reversed/self edges collapsed") {
    import spark.implicits._
    // K4 on {1,2,3,4} minus (3,4): triangles {1,2,3} and {1,2,4} ->
    // nodes 1,2 in two each, 3,4 in one each; node 5 hangs off 1 (zero);
    // reversed duplicates (2,1), a repeat (1,3) and a self-loop (2,2)
    // must not change anything
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (5L, 1L), (2L, 2L))
    val out = Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("triangleCounts: a triangle-free bipartite graph is all zeros") {
    import spark.implicits._
    val edges = for (a <- 0L to 2L; b <- 10L to 12L) yield (a, b)
    val out = Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 6)
    assert(out.values.forall(_ === 0L))
  }

  test("degreeProfile: hand-computed degrees, reciprocity, source/sink flags") {
    import spark.implicits._
    // 1→2 (reciprocated), 1→3 (one-way), 4→1 (4 is a pure source),
    // 3 is a sink-free node with only in+out asymmetry; self-loop 2→2
    // and a duplicate 1→2 must both vanish
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L), (4L, 1L), (2L, 2L))
    val out = Graph.degreeProfile(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out(1L) === ((2L, 2L, 1L, false, false))) // out: 2,3; in: 2,4; recip: 2
    assert(out(2L) === ((1L, 1L, 1L, false, false))) // self-loop dropped
    assert(out(3L) === ((0L, 1L, 0L, false, true)))  // sink
    assert(out(4L) === ((1L, 0L, 0L, true, false)))  // source
  }
}
