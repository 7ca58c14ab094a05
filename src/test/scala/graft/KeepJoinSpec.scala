package graft.pipeline

import org.apache.spark.sql.functions._

/** The size-gated kept-id semi-join both orchestrators end on: the three
  * tiers (broadcast / bloom-prefilter + exact / plain sort-merge) must be
  * result-identical, the broadcast tier must actually broadcast, and the
  * bloom tier must keep its prefilter UPSTREAM of the exact join. */
class KeepJoinSpec extends graft.SparkSpec {

  private def fixture = {
    val corpus = spark.range(0, 2000)
      .select(col("id").as("k"), (col("id") * 31 % 97).as("payload"))
    val ids = spark.range(0, 2000).filter(col("id") % 3 === 0)
      .select(col("id").as("_id"))
    (corpus, ids, ids.count())
  }

  test("all three tiers keep the identical set") {
    val (corpus, ids, n) = fixture
    def keys(d: org.apache.spark.sql.DataFrame) =
      d.select("k").collect().map(_.getLong(0)).toSet
    val bcast = keys(KeepJoin.semi(corpus, col("k"), ids, "_id", n))
    val bloom = keys(KeepJoin.semi(corpus, col("k"), ids, "_id", n,
      broadcastLimit = 0L))
    val plain = keys(KeepJoin.semi(corpus, col("k"), ids, "_id", n,
      broadcastLimit = 0L, bloomLimit = 0L))
    val expected = (0L until 2000L).filter(_ % 3 == 0).toSet
    assert(bcast === expected)
    assert(bloom === expected)
    assert(plain === expected)
  }

  test("tier plans: broadcast broadcasts; bloom prefilters before the exact join") {
    val (corpus, ids, n) = fixture
    val bcastPlan = KeepJoin.semi(corpus, col("k"), ids, "_id", n)
      .queryExecution.executedPlan.toString
    assert(bcastPlan.contains("BroadcastHashJoin") ||
      bcastPlan.contains("BroadcastExchange"),
      s"broadcast tier did not broadcast:\n$bcastPlan")
    val bloomPlan = KeepJoin.semi(corpus, col("k"), ids, "_id", n,
      broadcastLimit = 0L).queryExecution.executedPlan.toString
    assert(bloomPlan.contains("bloom_probe"),
      s"bloom tier lost its prefilter:\n$bloomPlan")
    // a non-integral id type cannot probe the long-keyed bloom: the
    // mid tier falls through to the exact join rather than miscasting
    val sCorpus = corpus.select(concat(lit("u"), col("k")).as("k"),
      col("payload"))
    val sIds = ids.select(concat(lit("u"), col("_id")).as("_id"))
    val sKeys = KeepJoin.semi(sCorpus, col("k"), sIds, "_id", n,
        broadcastLimit = 0L)
      .select("k").collect().map(_.getString(0)).toSet
    assert(sKeys === (0L until 2000L).filter(_ % 3 == 0)
      .map("u" + _).toSet)
  }
}
