package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Product-quantization family ([[Similarity.pqCodebooks]] /
  * [[Similarity.pqEncode]] / [[Similarity.pqTopK]]): codebook shape and
  * determinism, code ranges, exact retrieval on a separable fixture, and
  * the Euclidean-argmin-via-augmented-dot contract.
  */
class PqSpec extends SparkSpec {

  test("codebooks are deterministic and shaped [m][codes][dims/m]") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val b1 = Similarity.pqCodebooks(emb, "vec_id", "embedding", dims = 64, m = 4, codes = 8)
    val b2 = Similarity.pqCodebooks(emb, "vec_id", "embedding", dims = 64, m = 4, codes = 8)
    assert(b1.length === 4)
    assert(b1.forall(_.length === 8))
    assert(b1.forall(_.forall(_.length === 16)))
    assert(b1.map(_.map(_.toSeq).toSeq).toSeq === b2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("encode emits one in-range code per subspace; zero-norm rows drop") {
    val rows = Seq(
      Row(1L, Seq.fill(8)(1.0)), Row(2L, Seq.fill(8)(-1.0)),
      Row(3L, Seq.fill(8)(0.0)), Row(4L, 0.5 +: Seq.fill(7)(-0.5)))
    val d = df("vec_id LONG, embedding ARRAY<DOUBLE>", rows)
    val books = Similarity.pqCodebooks(d, "vec_id", "embedding", dims = 8, m = 2, codes = 2)
    val enc = Similarity.pqEncode(d, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(!enc.contains(3L))
    assert(enc.size === 3)
    assert(enc.values.forall(cs => cs.length == 2 && cs.forall(c => c >= 0 && c < 2)))
  }

  test("ADC retrieval separates orthogonal families") {
    // two orthogonal families with intra-family jitter: a lossy quantizer
    // may reorder WITHIN a family (that is the point of quantization), but
    // with ample code capacity it must never rank a cross-family vector
    // (ADC score near 0) above a same-family one (score near 1) — every
    // retrieved neighbor belongs to the query's family
    val rows = (0 until 20).map { i =>
      val fam = i % 2
      val base = Array.tabulate(16)(j =>
        if (j < 8) (if (fam == 0) 1.0 else 0.0) else (if (fam == 0) 0.0 else 1.0))
      base(i % 16) += 0.05 * (1 + i / 4)
      Row(i.toLong, base.toSeq)
    }
    val d = df("vec_id LONG, embedding ARRAY<DOUBLE>", rows)
    val q = d.filter(col("vec_id") < 4)
    val got = Similarity.pqTopK(d, q, "vec_id", "embedding",
        k = 3, dims = 16, m = 2, codes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length === 12)
    assert(got.forall { case (query, neighbor) => query % 2 == neighbor % 2 })
  }

  test("ivfPqTopK agrees with plain PQ when every cell is probed") {
    // nProbe = nCentroids means cell pruning removes nothing: the
    // composed index must return exactly the plain-PQ ranking (same
    // codebooks, same ADC sums, same tie-breaks)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    def collect(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val full = collect(Similarity.ivfPqTopK(emb, q, "vec_id", "embedding",
      k = 3, dims = 64, nCentroids = 8, nProbe = 8, m = 4, codes = 8))
    val plain = collect(Similarity.pqTopK(emb, q, "vec_id", "embedding",
      k = 3, dims = 64, m = 4, codes = 8))
    assert(full === plain)
    // pruned probing returns a subset-or-equal quality result: same row
    // count, every (query, neighbor) it returns scored identically
    val pruned = collect(Similarity.ivfPqTopK(emb, q, "vec_id", "embedding",
      k = 3, dims = 64, nCentroids = 8, nProbe = 2, m = 4, codes = 8))
    assert(pruned.size === plain.size)
    val plainScores = plain.map(t => (t._1, t._3) -> t._4).toMap
    assert(pruned.forall(t => plainScores.get((t._1, t._3)).forall(_ == t._4)))
  }

  test("residual IVFADC separates orthogonal families and is deterministic") {
    // same two-family fixture as the plain-ADC test: with 2 Lloyd-refined
    // cells the families land in separate cells, residuals to the cell
    // MEAN are the small intra-family jitters, and retrieval must stay
    // family-pure; two runs must agree bit-for-bit (deterministic seeds,
    // exact aggregation contract)
    val rows = (0 until 20).map { i =>
      val fam = i % 2
      val base = Array.tabulate(16)(j =>
        if (j < 8) (if (fam == 0) 1.0 else 0.0) else (if (fam == 0) 0.0 else 1.0))
      base(i % 16) += 0.05 * (1 + i / 4)
      Row(i.toLong, base.toSeq)
    }
    val d = df("vec_id LONG, embedding ARRAY<DOUBLE>", rows)
    val q = d.filter(col("vec_id") < 4)
    def run() = Similarity.ivfPqResidualTopK(d, q, "vec_id", "embedding",
        k = 3, dims = 16, nCentroids = 2, nProbe = 1, m = 2, codes = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val a = run()
    assert(a === run())
    assert(a.length === 12)
    assert(a.forall { case (query, _, neighbor, _) => query % 2 == neighbor % 2 })
  }

  test("residual scores approach the true cosine when codes cover the cell") {
    // with enough codes that Lloyd can give every residual its own
    // codeword, ADC reconstruction q·μ + q·r̂ must land within the
    // quantization-free bound of the exact cosine
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val approx = Similarity.ivfPqResidualTopK(emb, q, "vec_id", "embedding",
        k = 3, dims = 64, nCentroids = 4, nProbe = 4, m = 4, codes = 32, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 60)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val errs = approx.flatMap { case (k2, s) => exact.get(k2).map(e => math.abs(s - e)) }
    assert(errs.nonEmpty)
    assert(errs.max < 0.2, s"max ADC error ${errs.max}")
  }

  test("pqTopK is deterministic and ranks by the ADC score") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    def run() = Similarity.pqTopK(emb, q, "vec_id", "embedding",
        k = 3, dims = 64, m = 4, codes = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val a = run()
    assert(a === run())
    assert(a.groupBy(_._1).forall { case (_, rs) =>
      rs.sortBy(_._2).sliding(2).forall {
        case Seq(x, y) => x._4 >= y._4
        case _ => true
      }
    })
  }

  test("PQ training fails loudly when asked for more codes than sample vectors") {
    // The strided-seed fix surfaced this edge: seeds used to silently
    // truncate (take(codes) on a shorter sample) and then crash
    // mid-Lloyd with an index error; now the contract is named.
    import spark.implicits._
    val tiny = (0L until 6L).map(i =>
      (i, (0 until 8).map(j => math.sin(i + j * 1.0)))).toDF("vec_id", "v")
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(tiny, tiny.filter(col("vec_id") < 2), "vec_id", "v",
        k = 2, dims = 8, m = 2, codes = 16)
    }
    assert(e.getMessage.contains("codes"),
      s"must name the knob, got: ${e.getMessage}")
  }
}
