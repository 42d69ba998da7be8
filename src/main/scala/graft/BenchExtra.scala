package graft

import org.apache.spark.sql.functions._

import graft.index.IndexBuilder
import graft.query.{BM25Index, QueryEngine}
import graft.util.SynthCorpus

/** Supplementary benchmarks — round-7 measurement evidence. graft.Bench is
  * the FROZEN driver contract and is untouched; everything here is extra
  * instrumentation cited from OPTIMIZATION_r07.md:
  *
  *  1. k sweep on ONE headline-size index: Bench measures its k=10
  *     secondary on a `benchDocs / 10` corpus (a 10× smaller index), so
  *     `query_qps_k10` conflates retrieval depth with corpus size (r6
  *     VERDICT "What's missing" #2). Here k=1000 and k=10 run against the
  *     SAME index, so the depth effect is isolated.
  *  2. Production vs oracle hash families: the three md5 driver entries
  *     (dedup_minhash / dedup_simhash / text_winnow) time the
  *     SQL-recomputable md5 family; the xxhash64 / rolling-hash defaults
  *     users get are timed here side by side (r6 VERDICT "Next round" #6).
  *  3. noop-sink isolation (optimization guide §1.4) of the most expensive
  *     entries: computes every column of every row and discards it, so the
  *     numbers time the computation without the count()'s column pruning.
  *
  * Output: `EXTRA ...` lines (not part of the driver JSON contract).
  * Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_BENCH_DOCS /
  * SPARK_GRAFT_EXTRA_REPS as in Bench.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "480000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "3").toInt
    val sections = if (args.nonEmpty) args(0).split(',').toSet
                   else Set("ksweep", "family", "noop")
    val spark = BenchCore.session(cpus)
    import spark.implicits._

    if (sections("ksweep")) {
      spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUF", "64"))
      val tmp = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(BenchCore.workBase), "benchx").toString
      spark.range(0, benchDocs, 1, spark.sparkContext.defaultParallelism * 2)
        .as[Long].map(i => SynthCorpus.docOf((i / 100).toInt, (i % 100).toInt))
        .write.parquet(s"$tmp/corpus")
      val corpus = spark.read.parquet(s"$tmp/corpus")
        .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")
      IndexBuilder.build(spark, corpus, s"$tmp/index", IndexBuilder.Config(
        numSegmentGroups = 1, numBuckets = 16, docmapPartitions = 64))
      val idx = new BM25Index(spark, s"$tmp/index")
      val base = SynthCorpus.queries
      val batch = (0 until 1200).map { i =>
        val (qid, q) = base(i % base.size); (f"$qid-rep$i%04d", q)
      }
      val qdf = batch.toDF("qid", "query")
      QueryEngine.searchWand(idx, Seq(batch.head).toDF("qid", "query"), 10).count()
      for (k <- Seq(1000, 10)) {
        val secs = (1 to reps).map(_ =>
          BenchCore.time { QueryEngine.searchWand(idx, qdf, k).count() }._2)
        println(f"EXTRA ksweep docs=$benchDocs k=$k " +
          f"qps_best=${batch.size / secs.min}%.1f " +
          s"secs=${secs.map(s => f"$s%.2f").mkString(",")}")
      }
      graft.util.Dirs.deleteRecursively(new java.io.File(tmp))
    }

    // timing sink for computations: noop write evaluates every column of
    // every row (guide §1.4) — count() would let the optimizer prune the
    // very columns (signatures, fingerprints) these twins exist to time
    def noopTime(label: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val xs = (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(s"benchextra: $label")
        val (_, s) = BenchCore.time {
          df.write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(null)
        s
      }
      println(f"EXTRA $label best=${xs.min}%.3f " +
        s"samples=${xs.map(s => f"$s%.2f").mkString(",")}")
    }

    if (sections("family")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val toks = graft.tokenize.Tokenizer.splitTokens(
        col("text"), graft.tokenize.Tokenizer.AsciiTokenPattern)
      noopTime("family minhash_xxh64", graft.ops.Dedup.minhashLsh(
        docs, toks, "doc_id", n = 3, m = 32, bands = 8, threshold = 0.5))
      noopTime("family minhash_md5", graft.ops.Dedup.minhashLshMd5(
        docs, toks, "doc_id", n = 3, m = 32, bands = 8, threshold = 0.5))
      noopTime("family simhash_xxh64", graft.ops.Dedup.simhashNearDups(
        docs, toks, "doc_id", maxDist = 3))
      noopTime("family simhash_md5", graft.ops.Dedup.simhashNearDupsMd5(
        docs, toks, "doc_id", maxDist = 3))
      noopTime("family winnow_roll", graft.ops.TextAnalysis.fingerprints(
        docs, "doc_id", "text", k = 8, w = 4))
      noopTime("family winnow_md5", graft.ops.TextAnalysis.fingerprintsMd5(
        docs, "doc_id", "text", k = 8, w = 4))
    }

    if (sections("noop")) {
      for (name <- Seq("bm25_topk", "bm25_rm3", "hybrid_combmnz",
          "eval_metrics", "dedup_clusters", "dedup_minhash", "dedup_simhash",
          "text_winnow"))
        noopTime(s"noop $name", SparkEntry.queries(name)(spark, sfDir))
    }
    spark.stop()
  }
}
