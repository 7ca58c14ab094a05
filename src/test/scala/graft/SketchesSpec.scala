package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** HyperLogLog sketch: estimate accuracy against exact distinct counts,
  * the merge law (sketch of a union == merged sketches), the
  * linear-counting small-range branch, and determinism. */
class SketchesSpec extends SparkSpec {

  private def idCorpus(k: String, n: Int, offset: Int = 0) =
    df("k STRING, v STRING",
      Seq.tabulate(n)(i => Row(k, s"val-${i + offset}")))

  test("estimate within 3 standard errors of the exact count (p=12)") {
    // m=4096 -> se = 1.04/sqrt(4096) ~ 1.6%; 50k distinct exercises the
    // raw-estimator branch (E > 2.5m), 1k the linear-counting branch
    for (n <- Seq(1000, 50000)) {
      val est = Sketches.hllDistinct(idCorpus("a", n), Seq("k"), "v", p = 12)
        .collect().head.getDouble(1)
      assert(math.abs(est - n) / n < 3 * 0.0163,
        s"n=$n est=$est off by ${math.abs(est - n) / n}")
    }
  }

  test("duplicated values do not move the estimate") {
    val once = idCorpus("a", 5000)
    val thrice = once.unionByName(once).unionByName(once)
    val e1 = Sketches.hllDistinct(once, Seq("k"), "v").collect().head.getDouble(1)
    val e3 = Sketches.hllDistinct(thrice, Seq("k"), "v").collect().head.getDouble(1)
    assert(e1 === e3)
  }

  test("merge law: registers(A union B) == merge(registers(A), registers(B))") {
    val a = idCorpus("g", 3000)
    val b = idCorpus("g", 3000, offset = 1500) // overlaps a by half
    val whole = Sketches.hllRegisters(a.unionByName(b), Seq("k"), "v")
    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(a, Seq("k"), "v"),
      Sketches.hllRegisters(b, Seq("k"), "v"), Seq("k"))
    assert(rowSet(whole) === rowSet(merged))
    // and the estimate sees 4500 distinct, not 6000
    val est = Sketches.hllEstimate(merged, Seq("k")).collect().head.getDouble(1)
    assert(math.abs(est - 4500) / 4500.0 < 3 * 0.0163)
  }

  test("linear counting keeps tiny cardinalities near-exact") {
    for (n <- Seq(1, 10, 100)) {
      val est = Sketches.hllDistinct(idCorpus("a", n), Seq("k"), "v")
        .collect().head.getDouble(1)
      assert(math.abs(est - n) / n < 0.02, s"n=$n est=$est")
    }
  }

  test("per-key isolation and null values ignored") {
    val mixed = idCorpus("a", 2000)
      .unionByName(idCorpus("b", 40))
      .unionByName(df("k STRING, v STRING", Seq(Row("b", null))))
    val ests = Sketches.hllDistinct(mixed, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ests("a") - 2000) / 2000.0 < 3 * 0.0163)
    assert(math.abs(ests("b") - 40) / 40.0 < 0.02)
  }

  test("registers carry only occupied buckets, rho within [1, w+1]") {
    val regs = Sketches.hllRegisters(idCorpus("a", 300), Seq("k"), "v", p = 12)
      .collect()
    assert(regs.length <= 300) // never the full 4096 register table
    assert(regs.forall { r =>
      val b = r.getLong(1); val rho = r.getInt(2)
      b >= 0 && b < 4096 && rho >= 1 && rho <= 49
    })
  }

  test("determinism: two runs produce identical rows") {
    val d = idCorpus("a", 1234)
    assert(rowSet(Sketches.hllDistinct(d, Seq("k"), "v")) ===
      rowSet(Sketches.hllDistinct(d, Seq("k"), "v")))
  }

  test("intersection estimate tracks the true overlap by inclusion-exclusion") {
    val a = Sketches.hllRegisters(idCorpus("g", 30000), Seq("k"), "v")
    val b = Sketches.hllRegisters(idCorpus("g", 30000, offset = 20000), Seq("k"), "v")
    val row = Sketches.hllIntersectEstimate(a, b, Seq("k")).collect().head
    val (ea, eb, eu, ei) = (row.getDouble(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4))
    // a = ids [0, 30000), b = [20000, 50000): union 50000, overlap 10000
    assert(math.abs(eu - 50000) / 50000.0 < 3 * 0.0163) // union exact at sketch level
    // intersection (true 10000) compounds three sketch errors — bound loosely
    assert(math.abs(ei - 10000) / 10000.0 < 0.2, s"ei=$ei")
    assert(math.abs(ea + eb - eu - ei) < 1e-4) // inclusion-exclusion identity
  }

  test("estimateRegisters is bit-identical to the column-plan estimate") {
    for (n <- Seq(5, 1000, 50000)) {
      val d = idCorpus("a", n)
      val batch = Sketches.hllDistinct(d, Seq("k"), "v").collect().head.getDouble(1)
      val regs = Sketches.hllRegisters(d, Seq("k"), "v").collect()
        .map(r => r.getLong(1).toInt -> r.getInt(2)).toMap
      assert(Sketches.estimateRegisters(regs) === batch, s"n=$n")
    }
  }

  // ---- count-min sketch ---------------------------------------------------

  /** Zipf-ish stream: token i appears ~1000/i times. */
  private def zipfStream = df("t STRING",
    (1 to 60).flatMap(i => Seq.fill(1000 / i)(Row(s"tok-$i"))))

  test("CMS estimates never under-count, and are exact sans collisions") {
    val exact = zipfStream.groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // w=2048 >> 60 distinct values: collisions essentially impossible in
    // all 4 rows at once -> min over rows recovers the exact count
    val wide = Sketches.cmsTopK(zipfStream, "t", k = 60, d = 4, w = 2048)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide === exact)
    // w=8 forces collisions: estimates only ever OVER-count
    val tight = Sketches.cmsTopK(zipfStream, "t", k = 60, d = 4, w = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tight.forall { case (t, est) => est >= exact(t) })
  }

  test("CMS counter frames are d*w-bounded and merge by addition") {
    val a = zipfStream.filter(col("t") =!= "tok-1")
    val b = zipfStream.filter(col("t") === "tok-1")
    val whole = Sketches.cmsCounters(zipfStream, "t", d = 4, w = 64)
    assert(whole.count() <= 4 * 64)
    val merged = Sketches.cmsMerge(
      Sketches.cmsCounters(a, "t", d = 4, w = 64),
      Sketches.cmsCounters(b, "t", d = 4, w = 64))
    assert(rowSet(whole) === rowSet(merged))
  }

  test("CMS top-k ranks heavy hitters first on a skewed stream") {
    val top5 = Sketches.cmsTopK(zipfStream, "t", k = 5, d = 4, w = 1024)
      .collect().map(_.getString(0)).toSet
    assert(top5 === Set("tok-1", "tok-2", "tok-3", "tok-4", "tok-5"))
  }
}
