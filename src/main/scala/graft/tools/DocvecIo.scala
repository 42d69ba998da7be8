package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.BenchCore
import graft.query.{BM25Index, Rm3}

/** IO diagnostic for the pruned docvecs fetch: bytes/records read per
  * fetch shape (contiguous vs scattered seed sets, varying sizes) against
  * the table's on-disk size — isolates which pruning layer (salt
  * partition, row-group stats, page column-index) actually bounds the
  * READ VOLUME, not just the record count.
  *
  * Env: GRAFT_PROBE_DOCS (default 480000).
  */
object DocvecIo {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_PROBE_DOCS", "480000").toInt
    val spark = BenchCore.probeSession(32, "dvio")
    val idx = BenchCore.probeIndex(spark, nDocs)
    import spark.implicits._
    idx.docs.count() // warm the cached dimension

    def du(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(du).sum else f.length()
    val total = du(new java.io.File(s"${BenchCore.workBase}/qprobe-index-$nDocs/docvecs"))
    println(f"[dvio] numDocs=${idx.numDocs} docvecs on disk ${total / 1e6}%.1f MB")

    val allIds = idx.docs.select("docId", "docIntId")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)

    def measure(name: String, ids: Seq[String]): Unit = {
      val fb = ids.toDF("docId")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fb.count()
      locally { val (w, _) = Rm3.feedbackVectors(idx, fb); w.count() } // warm
      val bytes = new java.util.concurrent.atomic.AtomicLong()
      val recs = new java.util.concurrent.atomic.AtomicLong()
      val l = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
          recs.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        }
      }
      spark.sparkContext.addSparkListener(l)
      val (n, sec) = BenchCore.time {
        val (docTf, _) = Rm3.feedbackVectors(idx, fb); docTf.count()
      }
      spark.sparkContext.removeSparkListener(l)
      fb.unpersist()
      println(f"[dvio] $name%-28s ${ids.size}%6d seeds -> $n%8d tf rows, " +
        f"read ${bytes.get / 1e6}%8.1f MB (${bytes.get * 100.0 / total}%5.1f%%) " +
        f"/ ${recs.get}%8d records in $sec%.2f s")
    }

    def sweep(tag: String): Unit = {
      measure(s"$tag contiguous-1000", allIds.slice(1000, 2000).map(_._1))
      measure(s"$tag scattered-1000", (0 until 1000).map(i =>
        allIds((i.toLong * allIds.length / 1000).toInt)._1))
      measure(s"$tag contiguous-100", allIds.slice(5000, 5100).map(_._1))
      measure(s"$tag scattered-100", (0 until 100).map(i =>
        allIds((i.toLong * allIds.length / 100).toInt)._1))
    }
    locally { // what does the scan actually push for a scattered set?
      val fb = (0 until 100).map(i =>
        allIds((i.toLong * allIds.length / 100).toInt)._1).toDF("docId")
      val (docTf, _) = Rm3.feedbackVectors(idx, fb)
      val plan = docTf.queryExecution.executedPlan.toString
      val push = plan.linesIterator.filter(_.contains("PushedFilters")).take(2).toList
      println(s"[dvio] pushed: ${push.map(_.trim.take(300))}")
    }
    sweep("dflt")
    // push the FULL id set to parquet (In -> or-chain / native IN) instead
    // of Spark's default min/max range collapse above 10 values
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "100000")
    sweep("inpush")
    spark.conf.unset("spark.sql.parquet.pushdown.inFilterThreshold")

    // --- bloom-filter experiment: rewrite the docvecs table with a parquet
    // bloom filter on docIntId and measure record pruning for SCATTERED id
    // sets with native IN pushdown (row-group min/max stats cannot skip
    // scattered ids; bloom membership can).
    val bloomDir = s"${BenchCore.workBase}/dvio-bloom-$nDocs"
    if (!new java.io.File(s"$bloomDir/_SUCCESS").exists()) {
      spark.read.parquet(s"${BenchCore.workBase}/qprobe-index-$nDocs/docvecs")
        .repartition(64, col("salt"))
        .sortWithinPartitions("salt", "docIntId")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#docIntId", "true")
        .option("parquet.bloom.filter.expected.ndv#docIntId", "20000")
        .option("parquet.block.size", (256 << 10).toString)
        .partitionBy("salt")
        .parquet(bloomDir)
    }
    def measureRaw(name: String, ids: Seq[Long], thresh: String): Unit = {
      spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", thresh)
      val recs = new java.util.concurrent.atomic.AtomicLong()
      val l = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          recs.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
      val df = spark.read.parquet(bloomDir)
        .where(col("docIntId").isInCollection(ids))
      spark.sparkContext.addSparkListener(l)
      val (n, sec) = BenchCore.time(df.count())
      spark.sparkContext.removeSparkListener(l)
      spark.conf.unset("spark.sql.parquet.pushdown.inFilterThreshold")
      println(f"[dvio] bloom/$name%-24s ${ids.size}%6d ids -> $n%6d rows, " +
        f"read ${recs.get}%8d records in $sec%.2f s")
    }
    def scat(k: Int) = (0 until k).map(i =>
      allIds((i.toLong * allIds.length / k).toInt)._2)
    measureRaw("scattered-100-range", scat(100), "10")
    measureRaw("scattered-32-in", scat(32), "100000")
    measureRaw("scattered-100-in", scat(100), "100000")
    measureRaw("scattered-1000-in", scat(1000), "100000")
    spark.stop()
  }
}
