package graft.tools

import org.apache.spark.sql.functions._

import graft.BenchCore
import graft.ops.Similarity

/** Recall-vs-nProbe sweep for the persisted IVF index — the ANN analogue
  * of the reference's quality tables: for each nProbe, recall@k of
  * `ivfSearch` against exact brute-force cosine over the same deterministic
  * synthetic vectors, plus the probe's wall time and the fraction of cell
  * partitions it reads. Backs the BASELINE.md IVF quality table.
  *
  * Vectors: `nClusters` well-separated hash-derived centers with small
  * deterministic jitter (no RNG state) — clustered like real embedding
  * corpora, where IVF recall is meaningful.
  *
  * Env: GRAFT_IVF_N (default 200000), GRAFT_IVF_DIMS (64),
  * GRAFT_IVF_CELLS (256), GRAFT_IVF_QUERIES (200), GRAFT_IVF_K (10).
  */
object IvfRecall {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_IVF_N", "200000").toInt
    val dims = sys.env.getOrElse("GRAFT_IVF_DIMS", "64").toInt
    val nCells = sys.env.getOrElse("GRAFT_IVF_CELLS", "256").toInt
    val nQ = sys.env.getOrElse("GRAFT_IVF_QUERIES", "200").toInt
    val k = sys.env.getOrElse("GRAFT_IVF_K", "10").toInt
    val nClusters = 64
    val spark = BenchCore.probeSession(32, "ivfrecall")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    import spark.implicits._

    // deterministic clustered vectors: center(c)[d] from the splitmix hash,
    // point = center + per-point jitter (~10% of the center scale)
    def center(c: Long, d: Int): Double =
      (graft.util.SynthCorpus.mix(c * 1315423911L + d) >>> 11).toDouble / (1L << 53) - 0.5
    def vec(i: Long): Array[Float] = {
      val c = i % nClusters
      Array.tabulate(dims) { d =>
        (center(c, d) + 0.1 * ((graft.util.SynthCorpus.mix(
          i * 2654435761L + d + 7) >>> 11).toDouble / (1L << 53) - 0.5)).toFloat
      }
    }
    val corpus = spark.range(0, n, 1, 64).as[Long]
      .map(i => (i, vec(i))).toDF("id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val queries = spark.range(0, nQ.toLong).as[Long]
      .map(i => (i, vec(i * 37 + 13))).toDF("qid", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    queries.count()

    val dir = s"${BenchCore.workBase}/ivfrecall-$n-$nCells"
    graft.util.Dirs.deleteRecursively(new java.io.File(dir))
    val (idx, tBuild) = BenchCore.time(Similarity.ivfBuild(corpus, dir, nCells))
    println(f"[ivfrecall] n=$n dims=$dims nCells=$nCells built in $tBuild%.1f s")

    val exact = Similarity.bruteForceTopK(corpus, queries, k)
      .select(col("qid"), col("id")).persist()
    val nExact = exact.count()

    for (nProbe <- Seq(1, 2, 4, 8, 16, 32)) {
      val (got, sec) = BenchCore.time {
        val g = Similarity.ivfSearch(idx, queries, k, nProbe)
          .select(col("qid"), col("id")).persist()
        g.count()
        g
      }
      val hit = got.join(exact, Seq("qid", "id"), "left_semi").count()
      val recall = hit.toDouble / nExact
      println(f"[ivfrecall] nProbe=$nProbe%3d: recall@$k = $recall%.4f " +
        f"(${sec}%.2f s, reads ${nProbe * 100.0 / nCells}%.1f%% of cells)")
      got.unpersist()
    }
    exact.unpersist()
    spark.stop()
  }
}
