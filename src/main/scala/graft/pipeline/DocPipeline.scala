package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling}

/** Stage toggles + knobs of [[DocPipeline]]. Every stage is opt-out so a
  * recipe can run any prefix/subset, mirroring the skip matrix the
  * datacube [[Pipeline]] exposes. */
final case class DocPipelineConfig(
    dedupExact: Boolean = true,
    qualityGate: Boolean = true,
    decontaminate: Boolean = true,
    contaminationN: Int = 3,
    contaminationMaxFrac: Double = 0.05,
    tokenBudget: Option[Long] = None)

final case class DocPipelineResult(kept: DataFrame, summary: DataFrame)

/** The LLM-side counterpart of the datacube [[Pipeline]]: one entry
  * point that runs a curation RECIPE — exact dedup → quality gate →
  * decontamination → token-budget selection — over a document corpus,
  * composed entirely from the oracle-gated operators, and returns both
  * the kept corpus and a per-stage funnel summary (stage, n_in, n_out).
  *
  * Execution contract: each enabled stage's output is eagerly
  * `localCheckpoint`ed before the next stage reads it — the stages are
  * individually shuffle-bounded (a window, an anti-join, a range
  * exchange), so the checkpoint bounds lineage the way an orchestrated
  * multi-job pipeline would persist between stages, and the per-stage
  * counts the summary reports are read off the materialized frames
  * rather than recomputing prefixes. At 100 TB each stage is the same
  * plan it is standalone; the orchestrator adds no extra corpus passes
  * beyond the one count per stage.
  *
  * Stage semantics (all identical to their standalone operators):
  *  - exact dedup: keep the min-id document per normalized content hash
  *    ([[Dedup.exactDedup]]);
  *  - quality gate: [[TextFunctions.qualityFilter]]'s composite keep;
  *  - decontamination: drop documents whose contaminated-shingle
  *    fraction against `evalDocs` exceeds `contaminationMaxFrac`
  *    ([[Dedup.decontaminate]] — doc-local fractions, so the decision
  *    is independent of what earlier stages dropped);
  *  - token budget: greedy max-quality selection under a global token
  *    budget ([[Sampling.selectByBudget]] on (quality_score, n_tokens)).
  */
object DocPipeline {

  def run(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      evalDocs: Option[DataFrame],
      cfg: DocPipelineConfig = DocPipelineConfig()
  ): DocPipelineResult = {
    val spark = docs.sparkSession
    val stages = Seq.newBuilder[(String, Long, Long)]
    var cur = docs
    var n = cur.count()
    stages += (("00_input", n, n))
    def stage(name: String, enabled: Boolean)(f: DataFrame => DataFrame): Unit =
      if (enabled) {
        val before = n
        cur = f(cur).localCheckpoint()
        n = cur.count()
        stages += ((name, before, n))
      }
    stage("10_exact_dedup", cfg.dedupExact) { d =>
      Dedup.exactDedup(d, idCol, textCol)
        .filter(!col("is_duplicate"))
        .drop("content_hash", "cluster_size", "canonical_id", "is_duplicate")
    }
    stage("20_quality_gate", cfg.qualityGate) { d =>
      d.filter(TextFunctions.qualityFilter(textCol).getField("keep"))
    }
    stage("30_decontaminate", cfg.decontaminate && evalDocs.nonEmpty) { d =>
      Dedup.decontaminate(d, evalDocs.get, idCol, textCol,
        cfg.contaminationN, cfg.contaminationMaxFrac)
    }
    cfg.tokenBudget.foreach { budget =>
      stage("40_token_budget", enabled = true) { d =>
        val st = d.select(col(idCol),
          TextFunctions.textStats(textCol).as("_st"))
          .select(col(idCol), col("_st.quality_score").as("_q"),
            col("_st.n_tokens").as("_nt"))
        val picked = Sampling.selectByBudget(st, idCol, "_q", "_nt", budget)
          .select(col(idCol).as("_keep_id"))
        d.join(picked, d(idCol) === col("_keep_id"), "left_semi")
      }
    }
    val summary = spark.createDataFrame(stages.result())
      .toDF("stage", "n_in", "n_out")
    DocPipelineResult(cur, summary)
  }
}
