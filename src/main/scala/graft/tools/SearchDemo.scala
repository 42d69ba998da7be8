package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.IndexBuilder
import graft.query.{BM25Index, QueryEngine}
import graft.util.SynthCorpus

/** Runnable end-to-end surface: build an index over the deterministic
  * synthetic source-code corpus and run a few queries through both physical
  * paths. Usage:
  *
  *   sbt "runMain graft.tools.SearchDemo [nRepos filesPerRepo k]"
  */
object SearchDemo {
  def main(args: Array[String]): Unit = {
    val nRepos = if (args.length > 0) args(0).toInt else 8
    val filesPerRepo = if (args.length > 1) args(1).toInt else 25
    val k = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-search-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-demo-index").toString
    val corpus = spark.createDataset(SynthCorpus.gen(nRepos, filesPerRepo)).toDF()
      .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")
    println(s"[demo] building index over ${nRepos * filesPerRepo} docs -> $dir")
    val store = IndexBuilder.build(spark, corpus, dir)
    println(s"[demo] properties: ${store.readProperties().toSeq.sortBy(_._1).mkString(", ")}")

    val idx = new BM25Index(spark, dir)
    val queries = Seq(
      ("q1", "binary search tree"),
      ("q2", "hash index merge"),
      ("q3", "running runner")).toDF("qid", "query")

    println(s"[demo] exact path top-$k:")
    QueryEngine.searchExact(idx, queries, k)
      .orderBy("qid", "rank").show(3 * k, truncate = false)
    println(s"[demo] block-max WAND path top-$k:")
    QueryEngine.searchWand(idx, queries, k)
      .orderBy("qid", "rank").show(3 * k, truncate = false)
    spark.stop()
  }
}
