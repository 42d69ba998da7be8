package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.BenchCore
import graft.index.IndexBuilder
import graft.query.BM25Index

/** Candidate-scan read fraction across postings bucket counts — the
  * evidence behind IndexBuilder.autoBuckets (r6 VERDICT #4): with the
  * term-contiguous 1 MB-row-group + term-bloom layout, the records read
  * for a query batch's In(term) filter should stay ∝ nTerms × rowGroup at
  * EVERY bucket count, so the bucket knob only has to keep file/dir counts
  * sane, not carry the pruning.
  *
  * Builds one index per bucket count over the same staged synthetic corpus
  * and measures records read / scan time for the bench query-term set.
  *
  * Env: GRAFT_PROBE_DOCS (default 480000), GRAFT_SWEEP_BUCKETS
  * (default "4,16,64").
  */
object BucketSweep {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_PROBE_DOCS", "480000").toInt
    val bucketCounts = sys.env.getOrElse("GRAFT_SWEEP_BUCKETS", "4,16,64")
      .split(',').map(_.trim.toInt).toSeq
    val spark = BenchCore.probeSession(32, "bsweep")
    import spark.implicits._

    val corpusDir = s"${BenchCore.workBase}/bsweep-corpus-$nDocs"
    if (!new java.io.File(s"$corpusDir/_SUCCESS").exists()) {
      spark.range(0, nDocs, 1, spark.sparkContext.defaultParallelism * 2)
        .as[Long]
        .map(i => graft.util.SynthCorpus.docOf((i / 100).toInt, (i % 100).toInt))
        .write.mode("overwrite").parquet(corpusDir)
    }
    val corpus = spark.read.parquet(corpusDir)
      .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")

    for (nb <- bucketCounts) {
      val idxDir = s"${BenchCore.workBase}/bsweep-index-$nDocs-b$nb"
      if (!new graft.store.IcebergLikeStore(idxDir).isComplete)
        IndexBuilder.build(spark, corpus, idxDir,
          IndexBuilder.Config(numSegmentGroups = 1, numBuckets = nb))
      val idx = new BM25Index(spark, idxDir)
      val terms = graft.util.SynthCorpus.queries.flatMap { case (_, q) =>
        graft.tokenize.Tokenizer.tokenizeScalar(q, idx.tokenPattern, idx.stem)
      }.distinct
      val buckets = terms
        .map(t => graft.util.Hashing.bucketOfTerm(t, idx.numBuckets)).distinct
      val path = s"$idxDir/postings"
      val total = spark.read.parquet(path).count()
      def du(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(du).sum else f.length()
      val cand = spark.read.parquet(path)
        .where(col("bucket").isInCollection(buckets))
        .where(col("term").isInCollection(terms))
      cand.count() // warm
      val recs = new java.util.concurrent.atomic.AtomicLong()
      val l = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          recs.addAndGet(t.taskMetrics.inputMetrics.recordsRead): Unit
      }
      spark.sparkContext.addSparkListener(l)
      val (got, sec) = BenchCore.time(
        cand.select(col("term"), size(col("blocks")).as("nb"))
          .agg(count(lit(1)), sum("nb")).head())
      spark.sparkContext.removeSparkListener(l)
      println(f"[bsweep] buckets=$nb%-4d: ${got.getLong(0)} matching rows " +
        f"of $total (${du(new java.io.File(path)) / 1e6}%.1f MB, " +
        f"${buckets.size}/$nb bucket dirs scanned); read ${recs.get} " +
        f"records = ${recs.get * 100.0 / total}%.1f%% in $sec%.2f s " +
        f"(autoBuckets would pick ${IndexBuilder.autoBuckets(
          spark.read.parquet(s"$idxDir/termstats").count())})")
    }
    spark.stop()
  }
}
