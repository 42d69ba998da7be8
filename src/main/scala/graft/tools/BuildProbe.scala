package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer
import graft.util.SynthCorpus

/** Stage-by-stage probe of the index-build pipeline to locate
  * non-scaling steps. Usage: runMain graft.tools.BuildProbe [cpus nDocs]
  */
object BuildProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val a = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val nDocs = if (args.length > 1) args(1).toInt else 120000
    val shufP = if (args.length > 2) args(2).toInt else cpus
    val aqe = if (args.length > 3) args(3).toBoolean else false
    val base = sys.env.getOrElse("GRAFT_TMPDIR", System.getProperty("java.io.tmpdir"))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufP)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.local.dir", s"$base/spark-local")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("GRAFT_BYPASS", "200"))
      .config("spark.shuffle.file.buffer",
        sys.env.getOrElse("GRAFT_SHUFFLE_BUF", "32k"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(base), "graft-probe").toString
    t("gen+write corpus") {
      spark.range(0, nDocs, 1, cpus * 2).as[Long]
        .map(i => SynthCorpus.docOf((i / 100).toInt, (i % 100).toInt))
        .write.parquet(s"$tmp/corpus")
    }
    val corpus = spark.read.parquet(s"$tmp/corpus")
      .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")
    println(s"[probe] corpus input partitions: ${corpus.rdd.getNumPartitions}")
    if (sys.env.get("GRAFT_PROBE_FULL_ONLY").contains("1")) {
      t("FULL IndexBuilder.build (fresh)") {
        graft.index.IndexBuilder.build(spark, corpus, s"$tmp/index",
          graft.index.IndexBuilder.Config(numSegmentGroups = 1, numBuckets = 16,
            cacheSegments = !sys.env.get("GRAFT_NO_SEG_CACHE").contains("1")))
      }
      val st = new graft.store.IcebergLikeStore(s"$tmp/index")
      st.readCommits().foreach(c =>
        println(f"[probe]   stage ${c.group}: ${c.elapsedSec}%.2f s"))
      spark.stop()
      return
    }
    t("corpus count")(corpus.count())
    val rep = corpus.repartition(cpus, col("docId"))
    t("repartition+count")(rep.count())
    t("tokenize nostem") {
      rep.select(explode(Tokenizer.tokensNoStem(col("content"))).as("t"))
        .count()
    }
    t("tokenize stem") {
      rep.select(explode(Tokenizer.tokens(col("content"))).as("t")).count()
    }
    t("tokenize stem + tf agg") {
      rep.select(col("docId"), explode(Tokenizer.tokens(col("content"))).as("t"))
        .groupBy("docId", "t").agg(count(lit(1))).count()
    }
    t("tokenize stem + tf agg + write") {
      rep.select(col("docId"), explode(Tokenizer.tokens(col("content"))).as("t"))
        .groupBy("docId", "t").agg(count(lit(1)).as("tf"))
        .write.parquet(s"$tmp/seg")
    }
    // --- bisect the postings stage over the seg output just written
    locally {
      val segments = spark.read.parquet(s"$tmp/seg")
        .withColumnRenamed("docId", "docIntIdStr")
        .selectExpr("pmod(xxhash64(docIntIdStr), 100000000) as docIntId",
          "t as term", "tf",
          "tf as len") // shape stand-in: same row count/types as real segments
      val ts = segments.groupBy("term").agg(count(lit(1)).as("df"))
      t("post: join termstats")(segments.join(ts, "term").count())
      val grouped = segments
        .withColumn("salt", graft.index.IndexBuilder.saltOf(col("docIntId")))
        .join(ts, "term")
        .groupBy("term", "salt")
        .agg(collect_list(col("docIntId")).as("pids"),
          collect_list(col("tf")).as("ptfs"),
          collect_list(col("len")).as("plens"),
          count(lit(1)).as("partialDf"), first(col("df")).as("df"))
      t("post: groupBy collect_list count")(grouped.count())
      t("post: groupBy collect_list write") {
        grouped.write.parquet(s"$tmp/probe-grouped")
      }
    }
    t("FULL IndexBuilder.build") {
      graft.index.IndexBuilder.build(spark, corpus, s"$tmp/index",
        graft.index.IndexBuilder.Config(numSegmentGroups = 1, numBuckets = 16))
    }
    val store = new graft.store.IcebergLikeStore(s"$tmp/index")
    store.readCommits().foreach(c =>
      println(f"[probe]   stage ${c.group}: ${c.elapsedSec}%.2f s"))

    // --- bisect the REAL postings pipeline over the built segments
    locally {
      val segments = spark.read.parquet(s"$tmp/index/segments")
        .select("docIntId", "len", "term", "tf")
      val termstats = spark.read.parquet(s"$tmp/index/termstats")
      val props = store.readProperties()
      val sorted = segments
        .withColumn("salt", graft.index.IndexBuilder.saltOf(col("docIntId")))
        .join(termstats.select("term", "df"), "term")
        .withColumn("bucket", graft.index.IndexBuilder.bucketOf(col("term"), 16))
        .select(col("term"), col("salt"), col("docIntId"), col("tf"),
          col("len"), col("df"), col("bucket"))
        .repartition(col("bucket"), col("salt"))
        .withColumn("termHash", xxhash64(col("term")))
        .sortWithinPartitions("termHash", "term", "salt", "docIntId")
        .drop("termHash")
      t("real-post: shuffle+sort count")(sorted.count())
      implicit val encE =
        org.apache.spark.sql.Encoders.product[graft.index.IndexBuilder.PostingListRow]
      val encoded = sorted.mapPartitions(rows => new graft.index.IndexBuilder.RunEncoder(
        graft.score.BM25Params(), props("numDocs").toLong, props("avgdl").toDouble, rows))
      t("real-post: +encode count")(encoded.toDF().count())
      t("real-post: +write partitionBy") {
        encoded.toDF().write.partitionBy("bucket").parquet(s"$tmp/pp2")
      }
    }
    spark.stop()
  }
}
