package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BestCentroid, BestCentroidProbe, BloomProbe, BucketPairs, DeflateLen, DeflateRoundtrip, FixMojibake, JaroWinklerSim, LshBuckets, LuhnScrub, MinHash64, NfcNormalize, PhraseCount, ShingleHash60, SimHash60, StripAccents, VectorDot, Winnow60, ZOrder60}

/** Session extensions registering the engine's native Catalyst functions.
  * Install with `spark.sql.extensions=graft.plans.GraftExtensions`, or call
  * [[GraftExtensions.register]] on an existing session (idempotent) — the
  * operator library does the latter automatically where it needs them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDot)
    ext.injectFunction(GraftExtensions.simHash60)
    ext.injectFunction(GraftExtensions.zOrder60)
    ext.injectFunction(GraftExtensions.deflateLen)
    ext.injectFunction(GraftExtensions.deflateRoundtrip)
    ext.injectFunction(GraftExtensions.minHash64)
    ext.injectFunction(GraftExtensions.winnow60)
    ext.injectFunction(GraftExtensions.shingleHash60)
    ext.injectFunction(GraftExtensions.bucketPairs)
    ext.injectFunction(GraftExtensions.bestCentroid)
    ext.injectFunction(GraftExtensions.nfcNormalize)
    ext.injectFunction(GraftExtensions.stripAccentsFn)
    ext.injectFunction(GraftExtensions.fixMojibake)
    ext.injectFunction(GraftExtensions.luhnScrub)
    ext.injectFunction(GraftExtensions.phraseCount)
    ext.injectFunction(GraftExtensions.jaroWinkler)
    ext.injectFunction(GraftExtensions.bloomProbe)
    ext.injectFunction(GraftExtensions.bestCentroidProbe)
    ext.injectFunction(GraftExtensions.lshBucketsFn)
  }
}

object GraftExtensions {
  private val vecDot = (
    new FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "vec_dot takes exactly 2 arguments")
      VectorDot(children.head, children(1))
    }
  )

  private val phraseCount = (
    new FunctionIdentifier("phrase_count"),
    new ExpressionInfo(classOf[PhraseCount].getName, "phrase_count"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "phrase_count takes exactly 2 arguments")
      PhraseCount(children.head, children(1))
    }
  )

  private val jaroWinkler = (
    new FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "jaro_winkler takes exactly 2 arguments")
      JaroWinklerSim(children.head, children(1))
    }
  )

  private val lshBucketsFn = (
    new FunctionIdentifier("lsh_buckets"),
    new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 4,
        "lsh_buckets takes exactly 4 arguments (vec, dims, tables, planes)")
      // geometry is plan-time constant
      val dims = children(1).eval().asInstanceOf[Number].intValue()
      val tables = children(2).eval().asInstanceOf[Number].intValue()
      val planes = children(3).eval().asInstanceOf[Number].intValue()
      LshBuckets(children.head, dims, tables, planes)
    }
  )

  private val bestCentroidProbe = (
    new FunctionIdentifier("best_centroid_probe"),
    new ExpressionInfo(classOf[BestCentroidProbe].getName, "best_centroid_probe"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 4,
        "best_centroid_probe takes exactly 4 arguments (vec, packed, n_probe, normalize)")
      // probe count / comparison mode are plan-time constants
      val np = children(2).eval().asInstanceOf[Number].intValue()
      val nm = children(3).eval().asInstanceOf[Boolean]
      BestCentroidProbe(children.head, children(1), np, nm)
    }
  )

  private val bloomProbe = (
    new FunctionIdentifier("bloom_probe"),
    new ExpressionInfo(classOf[BloomProbe].getName, "bloom_probe"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2,
        "bloom_probe takes exactly 2 arguments (key, serialized_filter)")
      BloomProbe(children.head, children(1))
    }
  )

  private val nfcNormalize = (
    new FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "nfc_normalize takes exactly 1 argument")
      NfcNormalize(children.head)
    }
  )

  private val stripAccentsFn = (
    new FunctionIdentifier("strip_accents"),
    new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "strip_accents takes exactly 1 argument")
      StripAccents(children.head)
    }
  )

  private val luhnScrub = (
    new FunctionIdentifier("luhn_scrub"),
    new ExpressionInfo(classOf[LuhnScrub].getName, "luhn_scrub"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "luhn_scrub takes exactly 1 argument")
      LuhnScrub(children.head)
    }
  )

  private val fixMojibake = (
    new FunctionIdentifier("fix_mojibake"),
    new ExpressionInfo(classOf[FixMojibake].getName, "fix_mojibake"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "fix_mojibake takes exactly 1 argument")
      FixMojibake(children.head)
    }
  )

  private val simHash60 = (
    new FunctionIdentifier("simhash60"),
    new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "simhash60 takes exactly 1 argument")
      SimHash60(children.head)
    }
  )

  private val zOrder60 = (
    new FunctionIdentifier("zorder60"),
    new ExpressionInfo(classOf[ZOrder60].getName, "zorder60"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "zorder60 takes exactly 2 arguments")
      ZOrder60(children.head, children(1))
    }
  )

  private val deflateLen = (
    new FunctionIdentifier("deflate_len"),
    new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "deflate_len takes exactly 1 argument")
      DeflateLen(children.head)
    }
  )

  private val deflateRoundtrip = (
    new FunctionIdentifier("deflate_roundtrip"),
    new ExpressionInfo(classOf[DeflateRoundtrip].getName, "deflate_roundtrip"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "deflate_roundtrip takes exactly 1 argument")
      DeflateRoundtrip(children.head)
    }
  )

  private val minHash64 = (
    new FunctionIdentifier("minhash64"),
    new ExpressionInfo(classOf[MinHash64].getName, "minhash64"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 3,
        "minhash64 takes exactly 3 arguments (tokens, n, num_hashes)")
      // shingle width / signature length are plan-time constants
      val n = children(1).eval().asInstanceOf[Number].intValue()
      val k = children(2).eval().asInstanceOf[Number].intValue()
      MinHash64(children.head, n, k)
    }
  )

  private val winnow60 = (
    new FunctionIdentifier("winnow60"),
    new ExpressionInfo(classOf[Winnow60].getName, "winnow60"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 3,
        "winnow60 takes exactly 3 arguments (tokens, n, window)")
      // shingle width / window size are plan-time constants
      val n = children(1).eval().asInstanceOf[Number].intValue()
      val w = children(2).eval().asInstanceOf[Number].intValue()
      Winnow60(children.head, n, w)
    }
  )

  private val shingleHash60 = (
    new FunctionIdentifier("shingle_hash60"),
    new ExpressionInfo(classOf[ShingleHash60].getName, "shingle_hash60"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 3,
        "shingle_hash60 takes exactly 3 arguments (tokens, n, dedup_hashes)")
      // shingle width / dedup mode are plan-time constants
      val n = children(1).eval().asInstanceOf[Number].intValue()
      val d = children(2).eval().asInstanceOf[Boolean]
      ShingleHash60(children.head, n, d)
    }
  )

  private val bucketPairs = (
    new FunctionIdentifier("bucket_pairs"),
    new ExpressionInfo(classOf[BucketPairs].getName, "bucket_pairs"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2,
        "bucket_pairs takes exactly 2 arguments (bucket, min_cosine)")
      // the threshold is a plan-time constant
      val m = children(1).eval().asInstanceOf[Number].doubleValue()
      BucketPairs(children.head, m)
    }
  )

  private val bestCentroid = (
    new FunctionIdentifier("best_centroid"),
    new ExpressionInfo(classOf[BestCentroid].getName, "best_centroid"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 3,
        "best_centroid takes exactly 3 arguments (vec, centroids, normalize)")
      // the comparison mode is a plan-time constant
      val nm = children(2).eval().asInstanceOf[Boolean]
      BestCentroid(children.head, children(1), nm)
    }
  )

  private val scriptProfileFn = (
    new FunctionIdentifier("script_profile"),
    new ExpressionInfo(classOf[graft.functions.ScriptProfile].getName, "script_profile"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "script_profile takes exactly 1 argument")
      graft.functions.ScriptProfile(children.head)
    }
  )

  private val all =
    Seq(vecDot, simHash60, zOrder60, deflateLen, deflateRoundtrip, minHash64,
      winnow60, shingleHash60, bucketPairs, bestCentroid, nfcNormalize,
      stripAccentsFn, fixMojibake, luhnScrub,
      phraseCount, jaroWinkler, bloomProbe, bestCentroidProbe, lshBucketsFn,
      scriptProfileFn)

  /** Idempotently register the functions on a live session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      if (!registry.functionExists(id)) {
        registry.registerFunction(id, info, builder)
      }
    }
  }
}
