package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.BenchCore

/** IO diagnostic for the candidate postings scan (the query path's first
  * stage): records read for a query batch's In(term) filter vs total
  * posting rows, under (a) the current layout and (b) a rewrite with a
  * term bloom filter + smaller row groups — the docvecs point-lookup
  * analysis (DocvecIo) applied to the postings side: a query batch's
  * distinct terms are SCATTERED in term-sorted row groups, so min/max
  * stats alone degrade to a full scan once every row group spans many
  * terms.
  *
  * Env: GRAFT_PROBE_DOCS (default 480000).
  */
object PostingsIo {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_PROBE_DOCS", "480000").toInt
    val spark = BenchCore.probeSession(32, "pio")
    val idx = BenchCore.probeIndex(spark, nDocs)
    import spark.implicits._

    val baseQ = graft.util.SynthCorpus.queries
    val terms = baseQ.flatMap { case (_, q) =>
      graft.tokenize.Tokenizer.tokenizeScalar(q, idx.tokenPattern, idx.stem)
    }.distinct
    val buckets = terms.map(t =>
      graft.util.Hashing.bucketOfTerm(t, idx.numBuckets)).distinct
    println(s"[pio] ${terms.size} distinct query terms over " +
      s"${buckets.size}/${idx.numBuckets} buckets")

    def du(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(du).sum else f.length()

    def measure(name: String, path: String): Unit = {
      val total = spark.read.parquet(path).count()
      val cand = spark.read.parquet(path)
        .where(col("bucket").isInCollection(buckets))
        .where(col("term").isInCollection(terms))
      cand.count() // warm
      val recs = new java.util.concurrent.atomic.AtomicLong()
      val l = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          recs.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(l)
      // sum over block metadata defeats column pruning of the fat column,
      // so the measurement covers the real scan shape (blocks read too)
      val (got, sec) = BenchCore.time(
        cand.select(col("term"), size(col("blocks")).as("nb"))
          .agg(count(lit(1)), sum("nb")).head())
      spark.sparkContext.removeSparkListener(l)
      println(f"[pio] $name%-10s: ${got.getLong(0)} matching rows of $total " +
        f"(${du(new java.io.File(path)) / 1e6}%.1f MB); read ${recs.get} " +
        f"records = ${recs.get * 100.0 / total}%.1f%% in $sec%.2f s")
    }

    val orig = s"${BenchCore.workBase}/qprobe-index-$nDocs/postings"
    measure("current", orig)

    val bloomDir = s"${BenchCore.workBase}/pio-bloom-$nDocs"
    if (!new java.io.File(s"$bloomDir/_SUCCESS").exists()) {
      spark.read.parquet(orig)
        .repartition(32, col("bucket"))
        .sortWithinPartitions("bucket", "term", "salt")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#term", "true")
        .option("parquet.bloom.filter.expected.ndv#term", "65536")
        .option("parquet.block.size", (4 << 20).toString)
        .partitionBy("bucket")
        .parquet(bloomDir)
    }
    measure("bloom-4mb", bloomDir)
    val bloom1Dir = s"${BenchCore.workBase}/pio-bloom1-$nDocs"
    if (!new java.io.File(s"$bloom1Dir/_SUCCESS").exists()) {
      spark.read.parquet(orig)
        .repartition(32, col("bucket"))
        .sortWithinPartitions("bucket", "term", "salt")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#term", "true")
        .option("parquet.bloom.filter.expected.ndv#term", "16384")
        .option("parquet.block.size", (1 << 20).toString)
        .partitionBy("bucket")
        .parquet(bloom1Dir)
    }
    measure("bloom-1mb", bloom1Dir)
    spark.stop()
  }
}
