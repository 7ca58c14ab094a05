package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketches for corpus-scale statistics.
  *
  * At 100 TB an exact `COUNT(DISTINCT x)` per group means shuffling every
  * distinct value; the skew-safe salted form ([[Salted.saltedCountDistinct]])
  * bounds reducer memory but still moves the full distinct set once. A
  * HyperLogLog register frame is the sublinear alternative: each group
  * collapses to at most `2^p` (bucket, rho) rows — built map-side by the
  * partial `max` aggregation, so the shuffle carries registers, not values —
  * and register frames from different corpus slices merge by `max` again,
  * which is what makes the sketch usable incrementally (sketch each daily
  * batch, merge, estimate — no re-scan of the standing corpus).
  *
  * Design constraints shared with the dedup family (see
  * `Dedup.shingleHash60`): the hash is the engine-wide 60-bit md5 prefix, so
  * the DuckDB oracle replays the IDENTICAL sketch bit-for-bit — bucket, rho,
  * and the scaled harmonic sum are all integer-exact in both engines
  * (`length(bin(x))` is the MSB position; the sum is kept scaled by
  * `2^(w+1)` so every addend is an integer). Only the final
  * estimate touches floating point, under the repo's ROUND(x,4) convention.
  *
  * Estimator: Flajolet–Fuchs–Gandouet–Meunier 2007 (the standard
  * HyperLogLog): `E = alpha_m * m^2 / sum_j 2^-M_j`, with the
  * linear-counting fallback `m * ln(m/V)` when `E <= 2.5m` and some
  * register is still zero. No large-range correction is needed: the hash
  * space is 2^60 per group.
  */
object Sketches {

  /** Engine-wide 60-bit hash (15 md5 hex digits) — the same hash the
    * shingle/contamination family joins on; its DuckDB mirror is the
    * shared `hash60Sql` fragment in the oracle battery. */
  private def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  private def checkP(p: Int): Unit =
    require(p >= 7 && p <= 16,
      s"precision p must be in [7,16] (m=2^p registers, alpha formula assumes m>=128), got $p")

  /** The non-zero HLL registers of `valueCol` per `keys` group:
    * `(keys..., hll_bucket, hll_rho)` with one row per OCCUPIED bucket —
    * absent buckets are register 0, carried implicitly (a 100 TB corpus
    * never materializes `m` rows for a group that holds two values).
    *
    * Bucket = top `p` bits of the 60-bit hash; rho = leading-zero count of
    * the remaining `w = 60-p` bits + 1 (so rho ∈ [1, w+1]). Register
    * frames are mergeable: union two frames and re-aggregate
    * `max(hll_rho)` per (keys, bucket) — [[hllMerge]].
    *
    * One shuffle, on (keys, bucket): the map-side partial `max` compacts
    * each input partition to ≤ m rows per group before the exchange. */
  def hllRegisters(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      p: Int = 12
  ): DataFrame =
    hllProject(df, keys, valueCol, p)
      .groupBy((keys :+ "hll_bucket").map(col): _*)
      .agg(max("hll_rho").cast("int").as("hll_rho"))

  /** The pre-aggregation projection: one `(keys..., hll_bucket, hll_rho)`
    * row per input value — shared by the batch register aggregation and
    * the streaming state operator, so both faces hash/bucket identically. */
  def hllProject(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      p: Int = 12
  ): DataFrame = {
    checkP(p)
    val w = 60 - p
    val mask = (1L << w) - 1
    val h = hash60(col(valueCol))
    df.where(col(valueCol).isNotNull)
      .select(keys.map(col) :+ shiftright(h, w).as("hll_bucket")
        :+ h.bitwiseAND(lit(mask)).as("_rem"): _*)
      // length(bin(x)) = floor(log2(x)) + 1 exactly (string length of the
      // minimal binary repr — integer-exact, unlike float log2, and the
      // same builtin exists in DuckDB for the oracle replay)
      .withColumn("hll_rho",
        when(col("_rem") === 0, lit(w + 1))
          .otherwise(lit(w + 1) - length(bin(col("_rem")))))
      .drop("_rem")
  }

  /** Merge two register frames over the same keys (e.g. yesterday's corpus
    * sketch + today's batch sketch): max per (keys, bucket). */
  def hllMerge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keys :+ "hll_bucket").map(col): _*)
      .agg(max("hll_rho").cast("int").as("hll_rho"))

  /** Cardinality estimate from a register frame:
    * `(keys..., hll_distinct)` with the estimate ROUND(,4).
    *
    * The harmonic sum is computed scaled by `2^(w+1)` so every addend —
    * `2^(w+1-rho)` for occupied buckets, `2^(w+1)` for each of the
    * `m - present` implicit zero registers — is an integer; the sum fits a
    * long (≤ m * 2^(w+1) = 2^61) and both engines reach the IDENTICAL
    * value before the single division that leaves integer space. */
  def hllEstimate(registers: DataFrame, keys: Seq[String], p: Int = 12): DataFrame = {
    checkP(p)
    val w = 60 - p
    val m = 1 << p
    // alpha_m * m^2 * 2^(w+1): one driver-side double, embedded as the same
    // literal in the Spark plan and the generated oracle SQL (Double
    // toString round-trips exactly, so both engines parse the same bits)
    val cFactor = hllCFactor(p)
    val grouped = registers
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("_present"),
        sum(expr(s"shiftleft(cast(1 as bigint), ${w + 1} - hll_rho)")).as("_ssum"))
    val sint = col("_ssum") +
      (lit(m.toLong) - col("_present")) * lit(1L << (w + 1))
    val rawE = lit(cFactor) / sint.cast("double")
    val v = lit(m.toLong) - col("_present")
    val est = when(rawE <= lit(2.5 * m) && v > lit(0L),
      lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double"))).otherwise(rawE)
    grouped.select(keys.map(col) :+ round(est, 4).as("hll_distinct"): _*)
  }

  /** Driver/executor-side estimate from an occupied-register map
    * (bucket → rho) — the SAME arithmetic as [[hllEstimate]], operation
    * for operation (integer scaled sum, one double division, HALF_UP
    * rounding via BigDecimal exactly as Spark's `round`), so the
    * streaming state operator's emitted estimates are bit-identical to
    * the batch column plan's. SketchesSpec pins the parity. */
  def estimateRegisters(rhoByBucket: scala.collection.Map[Int, Int], p: Int = 12): Double = {
    checkP(p)
    val w = 60 - p
    val m = 1 << p
    val present = rhoByBucket.size
    var ssum = 0L
    rhoByBucket.valuesIterator.foreach(r => ssum += 1L << (w + 1 - r))
    val sint = ssum + (m - present).toLong * (1L << (w + 1))
    val rawE = hllCFactor(p) / sint.toDouble
    val v = m - present
    val est =
      if (rawE <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v)
      else rawE
    java.math.BigDecimal.valueOf(est)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** `alpha_m * m^2 * 2^(w+1)` — the constant factor of the scaled
    * estimator, exposed so the oracle SQL generator embeds the identical
    * double literal. */
  def hllCFactor(p: Int): Double = {
    checkP(p)
    val w = 60 - p
    val m = 1 << p
    0.7213 / (1 + 1.079 / m) * m.toDouble * m.toDouble * math.pow(2.0, w + 1)
  }

  /** One-call form: distinct-count estimate of `valueCol` per `keys`.
    * Plan: one (keys, bucket) exchange with map-side register compaction,
    * then a tiny per-key aggregation of ≤ m register rows. */
  def hllDistinct(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      p: Int = 12
  ): DataFrame =
    hllEstimate(hllRegisters(df, keys, valueCol, p), keys, p)

  /** Set algebra over two register frames on the same keys: per key,
    * `(hll_a, hll_b, hll_union, hll_intersection)` — union by register
    * max (exact at sketch level), intersection by inclusion–exclusion
    * `max(0, A + B − A∪B)` (an ESTIMATE of an estimate: its error is the
    * sum of three sketch errors, so it is only meaningful when the true
    * overlap is not far below the sketch resolution — audience-overlap
    * arithmetic, not an exact operator; SketchesSpec bounds it). */
  def hllIntersectEstimate(
      a: DataFrame, b: DataFrame, keys: Seq[String], p: Int = 12
  ): DataFrame = {
    def ren(df: DataFrame, s: String) = hllEstimate(df, keys, p)
      .withColumnRenamed("hll_distinct", s)
    ren(a, "hll_a")
      .join(ren(b, "hll_b"), keys.toSeq)
      .join(ren(hllMerge(a, b, keys), "hll_union"), keys.toSeq)
      .withColumn("hll_intersection",
        greatest(lit(0.0), round(col("hll_a") + col("hll_b") - col("hll_union"), 4)))
  }

  // ---- count-min sketch ---------------------------------------------------

  /** Count-min sketch counters of `valueCol` occurrences: `(cms_row,
    * cms_bucket, cms_count)` — `d` hash rows × `w` buckets (Cormode &
    * Muthukrishnan 2005). The frequency table of a 100 TB token stream
    * collapses to `d*w` integers: the map-side partial sum compacts each
    * input partition to ≤ d*w rows before the one exchange, and counter
    * frames from corpus slices merge by ADDING counts ([[cmsMerge]]).
    * Estimates only ever over-count (collisions add, never subtract), by
    * at most `2*N/w` with probability `1 - 2^-d` — choose `w` against the
    * stream size, `d` against the failure odds.
    *
    * Row hashes are the engine-wide 60-bit hash of `"cms<row>:<value>"`,
    * so the oracle replays the identical counters. */
  def cmsCounters(
      df: DataFrame,
      valueCol: String,
      d: Int = 4,
      w: Int = 512
  ): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 2, s"need 1<=d<=8, w>=2, got d=$d w=$w")
    df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("_v"),
        explode(sequence(lit(0), lit(d - 1))).as("cms_row"))
      .select(col("cms_row"), cmsBucket(col("_v"), col("cms_row"), w))
      .groupBy("cms_row", "cms_bucket")
      .agg(count(lit(1)).as("cms_count"))
  }

  private def cmsBucket(v: Column, row: Column, w: Int): Column =
    pmod(hash60(concat(lit("cms"), row.cast("string"), lit(":"), v)), lit(w.toLong))
      .as("cms_bucket")

  /** [[cmsCounters]] from a PRE-AGGREGATED `(value, count)` frame: per-value
    * counts ADD into cells, so the result is bit-identical to counting raw
    * occurrences (integer sums re-sum exactly). A caller that already pays a
    * per-value aggregation (distinct candidates, exact counts) feeds it here
    * instead of re-scanning the corpus, and the `d` string hashes of the
    * bucket projection run once per VOCABULARY entry instead of once per
    * occurrence. */
  def cmsCountersFromCounts(
      counts: DataFrame,
      valueCol: String,
      countCol: String,
      d: Int = 4,
      w: Int = 512
  ): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 2, s"need 1<=d<=8, w>=2, got d=$d w=$w")
    counts.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("_v"),
        col(countCol).cast("long").as("_c"),
        explode(sequence(lit(0), lit(d - 1))).as("cms_row"))
      .select(col("cms_row"), cmsBucket(col("_v"), col("cms_row"), w), col("_c"))
      .groupBy("cms_row", "cms_bucket")
      .agg(sum("_c").as("cms_count"))
  }

  /** Merge counter frames from two corpus slices: counts ADD per cell. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("cms_row", "cms_bucket")
      .agg(sum("cms_count").as("cms_count"))

  /** Point-estimate the frequency of each candidate value against a
    * counter frame: `(candidates..., cms_count)` — min over the `d` row
    * counters, the classic CMS query. The counter frame is `d*w` rows, so
    * the lookup join broadcasts; per candidate this costs `d` exploded
    * rows + one tiny-side join, no corpus re-scan. */
  def cmsEstimate(
      counters: DataFrame,
      candidates: DataFrame,
      valueCol: String,
      d: Int = 4,
      w: Int = 512
  ): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 2, s"need 1<=d<=8, w>=2, got d=$d w=$w")
    val keyed = candidates
      .withColumn("cms_row", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("cms_bucket", cmsBucket(col(valueCol).cast("string"), col("cms_row"), w))
    val outCols = candidates.columns.toSeq
    keyed
      .join(broadcast(counters), Seq("cms_row", "cms_bucket"))
      .groupBy(outCols.map(col): _*)
      .agg(min("cms_count").as("cms_count"))
  }

  /** Heavy hitters: the top `k` values of `valueCol` by CMS-estimated
    * frequency (ties broken by value — a strict total order, so both
    * engines cut the identical prefix). The counter build rides the same
    * per-value aggregation the candidate set already requires (one corpus
    * pass, one vocabulary-sized exchange — the exact counts are free on
    * that exchange), and ranking runs on the estimate. */
  def cmsTopK(
      df: DataFrame,
      valueCol: String,
      k: Int,
      d: Int = 4,
      w: Int = 512
  ): DataFrame = {
    // ONE corpus pass (r20 opt): the distinct-candidate aggregation the
    // answer needs anyway also carries each value's exact count, and the
    // counters ADD those counts — bit-identical to counting occurrences
    // (integer sums), with the corpus scanned once instead of twice and
    // the d bucket hashes computed per vocabulary entry, not per
    // occurrence. Spark's ReuseExchange serves both consumers from the
    // single vocabulary shuffle.
    val counts = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as(valueCol))
      .groupBy(valueCol).agg(count(lit(1)).as("_graft_vc"))
    val counters = cmsCountersFromCounts(counts, valueCol, "_graft_vc", d, w)
    cmsEstimate(counters, counts.select(col(valueCol)), valueCol, d, w)
      .orderBy(col("cms_count").desc, col(valueCol))
      .limit(k)
  }
}
