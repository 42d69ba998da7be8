package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.expr.CodecExprs
import graft.query.{BM25Index, QueryEngine}
import graft.util.SynthCorpus

/** Stage-by-stage probe of the QUERY path at the reference's k=1000 depth:
  * separates candidate scan + block decode, the WAND kernel fan-out, and
  * the finish (heap merge + docId-resolution join) so optimization targets
  * the measured bottleneck, not a guessed one.
  *
  * Usage: runMain graft.tools.QueryProbe [cpus nDocs nQueries k]
  * Env: GRAFT_WAND_GROUPS to pin the query-group fan-out G.
  */
object QueryProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val a = f
    println(f"[qprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val nDocs = if (args.length > 1) args(1).toInt else 480000
    val nQueries = if (args.length > 2) args(2).toInt else 1200
    val k = if (args.length > 3) args(3).toInt else 1000
    val spark = graft.BenchCore.probeSession(cpus, "qprobe")
    import spark.implicits._

    // build-or-reuse the probes' shared cached index for this nDocs
    val idx = t("open/build index")(graft.BenchCore.probeIndex(spark, nDocs))
    println(s"[qprobe] numDocs=${idx.numDocs} numSalts=${idx.numSalts} k=$k")
    sys.env.get("GRAFT_WAND_GROUPS").foreach { g =>
      spark.conf.set("spark.graft.wandGroups", g)
      println(s"[qprobe] wandGroups pinned to $g")
    }
    // arbitrary conf overrides, e.g. GRAFT_SPARK_CONF="spark.graft.broadcastHitsMaxRows=4000000"
    sys.env.get("GRAFT_SPARK_CONF").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(ck, cv) = kv.split("=", 2)
        spark.conf.set(ck, cv)
        println(s"[qprobe] conf $ck=$cv")
      }

    val baseQ = SynthCorpus.queries
    val batch = (0 until nQueries).map { i =>
      val (qid, q) = baseQ(i % baseQ.size); (f"$qid-rep$i%04d", q)
    }
    val qdf = batch.toDF("qid", "query").cache()
    qdf.count()

    // distinct terms of the batch (what candidates() scans for)
    val terms = qdf
      .select(explode(graft.tokenize.Tokenizer.tokens(col("query"), idx.tokenPattern)).as("term"))
      .distinct().as[String].collect().toSeq
    println(s"[qprobe] distinct query terms: ${terms.length}")

    // 1. candidate postings scan only (no decode): bytes off parquet
    val buckets = terms.map(tm => graft.util.Hashing.bucketOfTerm(tm, idx.numBuckets)).distinct
    def cand = idx.postings
      .where(col("bucket").isInCollection(buckets))
      .where(col("term").isInCollection(terms))
    t("warm fs cache: candidates scan")(cand.count())
    t("candidates scan (no decode)")(cand.count())
    val nPostings = cand.agg(sum("count")).head().getLong(0)
    println(s"[qprobe] candidate posting entries: $nPostings")

    // 2. scan + full block decode at G=1 (sum over decoded ids defeats DCE)
    t("scan + decode all blocks once") {
      // element_at is a cheap codegen consumer that still forces the decode
      // (an interpreted HOF like aggregate() would dominate the timing)
      cand.select(explode(col("blocks")).as("b"))
        .select(CodecExprs.varbyteDecode(col("b.ids"), col("b.n")).as("ids"),
          CodecExprs.floatsDecode(col("b.imps")).as("imps"))
        .select((element_at(col("ids"), -1) + element_at(col("imps"), -1)).as("s"))
        .agg(sum("s")).head()
    }

    // 2b. kernel + emission WITHOUT the top-k merge / docId join: counts
    // the raw per-(query,salt) partial candidates
    val qArr = QueryEngine.queryChunks(idx, qdf, nQueries).next()
    for (r <- 1 to 2) {
      t(s"wandPartials only run$r") {
        val n = QueryEngine.wandPartials(idx, qArr, k).count()
        if (r == 1) println(s"[qprobe] partial candidate rows: $n")
      }
    }
    if (sys.env.get("GRAFT_QDIAG").contains("3")) {
      // replicate wandPartials' cand shuffle shape and inspect partitions
      val S = 8; val G = 4; val nP = S * G
      val dbg2 = idx.postings.where(col("term").isInCollection(terms))
        .select(col("term"), col("salt"), col("maxImpact"), col("blocks"))
        .crossJoin(broadcast(spark.range(G).select(col("id").cast("int").as("qgrp"))))
        .withColumn("sbucket", pmod(col("salt"), lit(S)))
        .repartition(nP, col("sbucket"), col("qgrp"))
        .sortWithinPartitions("salt", "qgrp")
        .drop("sbucket")
        .select(spark_partition_id().as("p"), col("salt"), col("qgrp"))
      dbg2.groupBy("p").agg(countDistinct("salt").as("nsalt"),
        countDistinct("qgrp").as("ng")).orderBy("p").show(40, false)
      dbg2.groupBy("qgrp").agg(countDistinct("p").as("nparts")).show(false)
      println(dbg2.queryExecution.executedPlan.toString.take(6000))
    }
    if (sys.env.get("GRAFT_QDIAG").contains("2")) {
      // partitioner behavior check: does repartition(n, sbucket, qgrp)
      // actually spread sbuckets across partitions?
      val dbg = spark.range(0, 16).select(col("id").cast("int").as("salt"))
        .crossJoin(spark.range(5).select(col("id").cast("int").as("qgrp")))
        .withColumn("sbucket", pmod(col("salt"), lit(8)))
        .repartition(40, col("sbucket"), col("qgrp"))
        .select(spark_partition_id().as("p"), col("sbucket"), col("qgrp"))
      println("[qprobe] occupied partitions: " +
        dbg.select("p").distinct().count())
      dbg.groupBy("p").agg(countDistinct("sbucket").as("nsb"),
        countDistinct("qgrp").as("ng")).agg(max("nsb"), max("ng")).show(false)
    }
    if (sys.env.get("GRAFT_QDIAG").contains("1")) {
      spark.conf.set("spark.graft.taskHeapMaxRows", "0")
      println(s"[qprobe] per-group-drain partials: " +
        QueryEngine.wandPartials(idx, qArr, k).count())
      spark.conf.unset("spark.graft.taskHeapMaxRows")
      val p = QueryEngine.wandPartials(idx, qArr, k)
      p.groupBy("qid").agg(count(lit(1)).as("n"), countDistinct("docIntId").as("nd"))
        .agg(min("n"), max("n"), avg("n"), min("nd"), max("nd")).show(false)
      val full = QueryEngine.searchWand(idx, qdf, k)
      println(s"[qprobe] searchWand row count: ${full.count()}")
      full.groupBy("qid").count().agg(min("count"), max("count"), avg("count")).show(false)
    }

    // 3..5. full paths, several reps (first run = codegen-cold)
    for (r <- 1 to 4) {
      t(s"searchWand run$r")(QueryEngine.searchWand(idx, qdf, k).count())
    }
    if (!sys.env.get("GRAFT_SKIP_EXACT").contains("1"))
      t("searchExact run1")(QueryEngine.searchExact(idx, qdf, k).count())

    // 6. WAND without the finish stage: count partial candidates via a
    //    qid-grouped count only (exercises kernel + shuffle, no heap merge,
    //    no docs join). Approximated by k=small finish? No — instead time
    //    searchWand at k=10 for the k-dependence of the finish.
    t("searchWand k=10")(QueryEngine.searchWand(idx, qdf, 10).count())

    spark.stop()
  }
}
