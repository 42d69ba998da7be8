package graft.tools

import org.apache.spark.sql.SparkSession

import graft.query.{BM25Index, QueryEngine}
import graft.util.SynthCorpus

/** Throughput probe for the OVER-CHUNK large-batch query path — the
  * training-pipeline workload shape (batches far beyond the reference's
  * largest query set, cqadupstack's 13,145: README.md:154-170) that
  * streams driver-bounded query chunks and spills per-chunk results under
  * the index filesystem (`QueryEngine.chunkSpillRoot`).
  *
  * Reports end-to-end q/s for a batch of `nQueries` forced through
  * `nChunks` chunks, so the chunking + spill + read-back overhead is
  * measured against the same batch run single-chunk.
  *
  * Usage: runMain graft.tools.BatchProbe [cpus nDocs nQueries k nChunks]
  */
object BatchProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val a = f
    println(f"[bprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val nDocs = if (args.length > 1) args(1).toInt else 480000
    val nQueries = if (args.length > 2) args(2).toInt else 60000
    val k = if (args.length > 3) args(3).toInt else 10
    val nChunks = if (args.length > 4) args(4).toInt else 3
    val spark = graft.BenchCore.probeSession(cpus, "bprobe")

    // share QueryProbe's cached index for the same corpus size
    val idx = t("open/build index")(graft.BenchCore.probeIndex(spark, nDocs))
    println(s"[bprobe] numDocs=${idx.numDocs} nQueries=$nQueries k=$k chunks=$nChunks")

    val baseQ = SynthCorpus.queries
    val queries = spark.range(0, nQueries, 1, cpus * 2)
      .select(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("q"),
          org.apache.spark.sql.functions.col("id")).as("qid"),
        org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.typedLit(baseQ.map(_._2)),
          (org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.lit(baseQ.size)) + 1).cast("int")).as("query"))
    queries.cache().count()

    QueryEngine.searchWand(idx, queries.limit(200), k).count() // warm

    for (rep <- 1 to 2) {
      spark.conf.set("spark.graft.wandQueryChunkRows", nQueries.toString)
      val s1 = t(s"rep$rep single-chunk") {
        QueryEngine.searchWand(idx, queries, k).count()
      }
      spark.conf.set("spark.graft.wandQueryChunkRows",
        ((nQueries + nChunks - 1) / nChunks).toString)
      val sN = t(s"rep$rep $nChunks-chunk (spill+readback)") {
        QueryEngine.searchWand(idx, queries, k).count()
      }
      require(s1 == sN, s"row counts diverge: $s1 vs $sN")
    }
    spark.stop()
  }
}
