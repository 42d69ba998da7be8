package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.BenchCore
import graft.query.{QueryEngine, Rm3}
import graft.util.SynthCorpus

/** Scale probe for BM25+RM3 over stored doc vectors: at N docs (default
  * 2.4M — 5× the bench corpus), measures (a) plain vs RM3 batch retrieval
  * wall time, and (b) the BYTES the pruned docvec fetch actually reads vs
  * the docvecs table's total size — the evidence that the relevance model
  * touches a bounded byte range, not the token table.
  *
  * Env: GRAFT_PROBE_DOCS (default 2400000), GRAFT_PROBE_QUERIES (1200),
  * GRAFT_TMPDIR (probe index location, tmpfs recommended).
  */
object Rm3Probe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_PROBE_DOCS", "2400000").toInt
    val nQ = sys.env.getOrElse("GRAFT_PROBE_QUERIES", "1200").toInt
    val spark = BenchCore.probeSession(32, "rm3probe")
    // probe indexes cached by older rounds predate the docvecs stage (or
    // carry the pre-r6 row-per-term layout) — rebuild so the probe measures
    // the current packed format
    val idxDir = s"${BenchCore.workBase}/qprobe-index-$nDocs"
    var idx = BenchCore.probeIndex(spark, nDocs)
    if (!idx.hasDocVectors || idx.docvecsFormat != "packed") {
      graft.util.Dirs.deleteRecursively(new java.io.File(idxDir))
      idx = BenchCore.probeIndex(spark, nDocs)
    }

    import spark.implicits._
    val base = SynthCorpus.queries
    val qdf = (0 until nQ).map { i =>
      val (qid, q) = base(i % base.size); (f"$qid-rep$i%04d", q)
    }.toDF("qid", "query")
    // warm: docs-dimension cache + codegen
    QueryEngine.searchWand(idx, qdf.limit(5), 10).count()

    def time[A](f: => A): (A, Double) = BenchCore.time(f)
    // the corpus the probe index was built from — for the retokenize
    // contrast (the pre-r5 RM3 path: corpus semi-join + re-tokenize)
    val corpus = spark.read.parquet(s"${BenchCore.workBase}/qprobe-corpus-$nDocs")
      .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")

    // --- first-call breakdown (fresh-JVM cost attribution): the stages of
    // searchIndexed, timed separately
    if (sys.env.getOrElse("GRAFT_PROBE_BREAKDOWN", "1") == "1") {
      import org.apache.spark.sql.functions.{col, count, explode, lit}
      val (fb, tFb) = time {
        val f = QueryEngine.searchWand(idx, qdf, 10)
          .select(col("qid"), col("docId"), col("score"))
        f.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        f.count()
        f
      }
      val ((docTf, dl), tFetch) = time {
        val v = Rm3.feedbackVectors(idx, fb.select("docId"))
        v._1.count()
        v
      }
      val (weights, tExpand) = time {
        val qtf = qdf.select(col("qid"),
          explode(graft.tokenize.Tokenizer.tokens(col("query"),
            idx.tokenPattern, idx.stem)).as("term"))
          .groupBy("qid", "term").agg(count(lit(1)).as("qtf"))
        val w = Rm3.expandWeights(fb, docTf, dl, qtf, 10, 0.5, docCol = "docId")
        w.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        w.count()
        w
      }
      val (_, tPass2) = time(
        QueryEngine.searchWandWeighted(idx, weights, 100).count())
      weights.unpersist(); fb.unpersist()
      println(f"[rm3probe] first-call breakdown: pass1 $tFb%.1f s, " +
        f"docvec-fetch $tFetch%.1f s, expand $tExpand%.1f s, pass2 $tPass2%.1f s")
    }
    for (r <- 1 to sys.env.getOrElse("GRAFT_PROBE_REPS", "2").toInt) {
      val (_, tPlain) = time(QueryEngine.searchWand(idx, qdf, 100).count())
      val (_, tRm3) = time(Rm3.searchIndexed(idx, qdf, 100).count())
      val (_, tRetok) = time(
        Rm3.searchIndexedRetokenize(idx, corpus, qdf, 100).count())
      println(f"[rm3probe] rep$r: plain ${tPlain}%.1f s (${nQ / tPlain}%.1f q/s), " +
        f"rm3-stored ${tRm3}%.1f s (${nQ / tRm3}%.1f q/s, ${tRm3 / tPlain}%.2fx), " +
        f"rm3-retokenize ${tRetok}%.1f s (${tRetok / tRm3}%.2fx stored)")
    }

    // --- the part that actually differs between the two RM3 variants,
    // isolated (the retrieval passes are identical code): model-estimation
    // inputs for a realistic nQ×fbDocs feedback set, interleaved reps,
    // min reported (the noise-robust protocol)
    val fetchReps = sys.env.getOrElse("GRAFT_PROBE_FETCH_REPS", "5").toInt
    val fbBig = idx.docs.select("docId")
      .limit(nQ * 10).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fbBig.count()
    val storedT = scala.collection.mutable.ArrayBuffer.empty[Double]
    val retokT = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to fetchReps) {
      storedT += time {
        val (docTf, _) = Rm3.feedbackVectors(idx, fbBig)
        docTf.count()
      }._2
      retokT += time {
        corpus.join(fbBig.select("docId").distinct(), Seq("docId"), "left_semi")
          .select(org.apache.spark.sql.functions.col("docId"),
            org.apache.spark.sql.functions.explode(
              graft.tokenize.Tokenizer.tokens(
                org.apache.spark.sql.functions.col("content"),
                idx.tokenPattern, idx.stem)).as("term"))
          .groupBy("docId", "term").count().count()
      }._2
    }
    fbBig.unpersist()
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.1f").mkString("/")
    if (storedT.nonEmpty)
      println(f"[rm3probe] model-estimation fetch, ${nQ * 10} feedback docs: " +
        f"stored-vectors min ${storedT.min}%.1f s (reps ${fmt(storedT.toSeq)}), " +
        f"retokenize min ${retokT.min}%.1f s (reps ${fmt(retokT.toSeq)}), " +
        f"speedup ${retokT.min / storedT.min}%.2fx")

    // --- pruned-fetch read volume, RECORDS read vs table records (the
    // valid observable: FileScanRDD's bytesRead on local files is split-
    // size accounting, ~100% regardless of pruning — see DocvecIo). Seed
    // ids are materialized in-memory and the docs dimension warmed first,
    // so the listener window attributes records to the docvecs scan alone.
    // Both fetch shapes measured: CONTIGUOUS ids (min/max row-group stats
    // prune) and SCATTERED ids (the realistic RM3 shape — top-k feedback
    // docs land anywhere; pruning here rides the docIntId bloom filter +
    // 1 MB row groups the docvecs writer configures).
    import spark.implicits._
    idx.docs.count() // docs dimension cache warm (it is persisted)
    val allIds = idx.docs.select("docId", "docIntId").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    val totalRecs = spark.read.parquet(s"$idxDir/docvecs").count()
    def du(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(du).sum else f.length()
    val total = du(new java.io.File(s"$idxDir/docvecs"))
    for ((shape, ids) <- Seq(
        ("contiguous", allIds.slice(1000, 2000).map(_._1).toSeq),
        ("scattered", (0 until 1000).map(i =>
          allIds((i.toLong * allIds.length / 1000).toInt)._1)))) {
      val fbIds = ids.toDF("docId")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fbIds.count()
      locally { // warm run outside the listener window: footer caches
        val (w, _) = Rm3.feedbackVectors(idx, fbIds); w.count()
      }
      val rows = new java.util.concurrent.atomic.AtomicLong()
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          rows.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(listener)
      val (nVec, tFetch) = time {
        val (docTf, _) = Rm3.feedbackVectors(idx, fbIds)
        docTf.count()
      }
      spark.sparkContext.removeSparkListener(listener)
      fbIds.unpersist()
      println(f"[rm3probe] docvec fetch ($shape%10s): 1000 seeds -> $nVec " +
        f"tf rows in $tFetch%.2f s; read ${rows.get} of $totalRecs packed " +
        f"records (${rows.get * 100.0 / math.max(1, totalRecs)}%.1f%%; " +
        f"table ${total / 1e6}%.1f MB on disk)")
    }
    spark.stop()
  }
}
