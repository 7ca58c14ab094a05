package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Salted

/** Equivalence of the skew-safe (salted) holistic aggregations with their
  * single-reducer counterparts. */
class SaltedSpec extends SparkSpec {

  // a hot key ("hot") with many distinct values plus small keys
  private def input = {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(5000)(i => Row("hot", s"v${rnd.nextInt(800)}")) ++
      Seq.tabulate(50)(i => Row("cold", s"w${i % 9}")) ++
      Seq(Row("one", "only"))
    df("k STRING, v STRING", rows)
  }

  test("saltedCollectSet equals collect_set") {
    val expected = input.groupBy("k")
      .agg(sort_array(collect_set(col("v"))).as("values"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val salted = Salted.saltedCollectSet(input, Seq("k"), "v", buckets = 8)
      .select(col("k"), sort_array(col("values")).as("values"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(salted === expected)
  }

  test("saltedCountDistinct equals countDistinct") {
    val expected = input.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salted.saltedCountDistinct(input, Seq("k"), "v", buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === expected)
  }
}
