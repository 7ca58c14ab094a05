package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign documents, in deterministic id order
  * within a group, to fixed-capacity context windows ("packs") — the
  * standard LLM-pretraining step that concatenates short documents into
  * full training sequences to avoid padding waste.
  *
  * Contract (first-fit-in-order): docs of a group are visited in ascending
  * id; a doc goes into the current pack at offset = tokens already packed,
  * unless it would overflow `capacity`, in which case it opens the next
  * pack at offset 0. A doc longer than `capacity` occupies its own pack
  * (callers chunk oversized docs beforehand if that matters).
  *
  * Scale shape: packing is inherently sequential WITHIN a group (each
  * assignment depends on the running total) but embarrassingly parallel
  * ACROSS groups, so the plan is one hash-repartition on the group column
  * + an in-partition sort + a single streaming pass (`mapPartitions`,
  * O(1) state) — no window, no driver collect. At 100 TB the group must
  * be finer than "language" for parallelism AND for bounded per-task
  * input: derive a shard key first (e.g. `hash(id) % k` per language, k
  * sized so a shard is a few GB) and pack per (lang, shard) — packing
  * quality is unaffected since packs never straddle shards by design.
  */
object Packing {

  /** Pack (groupCol, idCol, tokens) into capacity-bounded sequences.
    * Returns (group, id, n_tokens, pack_id, pack_offset) with the input's
    * column names preserved for the first three. */
  def packSequences(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      tokensCol: String,
      capacity: Int
  ): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._

    val prepared = df
      .select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        col(tokensCol).cast("int").as("n"))
      .as[(String, Long, Int)]
      // one partition owns a whole group; sorted, so the scan below sees
      // each group contiguously in id order
      .repartition(col("g"))
      .sortWithinPartitions(col("g"), col("id"))

    prepared.mapPartitions { it =>
      var curGroup: String = null
      var pack = 0L
      var filled = 0
      it.map { case (g, id, n) =>
        if (g != curGroup) { curGroup = g; pack = 0L; filled = 0 }
        val offset =
          if (filled == 0 || filled + n <= capacity) filled
          else { pack += 1; 0 }
        filled = offset + n
        (g, id, n, pack, offset)
      }
    }.toDF(groupCol, idCol, tokensCol, "pack_id", "pack_offset")
  }
}
