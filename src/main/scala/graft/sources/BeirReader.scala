package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BEIR-format ingestion — the reference's actual input format
  * (`GenericDataLoader(data_folder).load(split)`, benchmark/on_bm25s.py:51;
  * file schemas at utils/beir.py:96-111):
  *
  *   corpus.jsonl   one JSON object per line: `_id`, `title`, `text`
  *   queries.jsonl  one JSON object per line: `_id`, `text`
  *   qrels/<split>.tsv  TSV WITH header: `query-id  corpus-id  score`
  *
  * Schemas are EXPLICIT (never inferred): a schema-inference pass over a
  * 100-TB corpus would double the read, and silent schema drift (e.g. a
  * numeric-looking `_id` column inferred as BIGINT) would corrupt joins.
  * Extra JSON fields (BEIR's optional `metadata`) are simply not read —
  * column pruning applies from the scan on.
  */
object BeirReader {

  val corpusSchema: StructType = StructType(Seq(
    StructField("_id", StringType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("text", StringType, nullable = true)))

  val queriesSchema: StructType = StructType(Seq(
    StructField("_id", StringType, nullable = false),
    StructField("text", StringType, nullable = true)))

  val qrelsSchema: StructType = StructType(Seq(
    StructField("query-id", StringType, nullable = false),
    StructField("corpus-id", StringType, nullable = false),
    StructField("score", IntegerType, nullable = true)))

  /** corpus.jsonl → (docId, title, text). */
  def readCorpus(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(corpusSchema).json(path)
      .select(col("_id").as("docId"), col("title"), col("text"))

  /** The harness's document-text projection: `title + " " + text`, single
    * space, title first (benchmark/on_bm25s.py:57; missing title = empty
    * string, so the join degrades to " " + text exactly as in Python).
    */
  def contentCol(title: Column, text: Column): Column =
    concat(coalesce(title, lit("")), lit(" "), coalesce(text, lit("")))

  /** corpus.jsonl → (docId, content) ready for IndexBuilder. */
  def readCorpusContent(spark: SparkSession, path: String): DataFrame =
    readCorpus(spark, path)
      .select(col("docId"), contentCol(col("title"), col("text")).as("content"))

  /** queries.jsonl → (qid, query) ready for QueryEngine. */
  def readQueries(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(queriesSchema).json(path)
      .select(col("_id").as("qid"), col("text").as("query"))

  /** qrels TSV (with header) → (qid, docId, grade) ready for TrecEval. */
  def readQrels(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t").option("header", "true")
      .schema(qrelsSchema)
      .csv(path)
      .select(col("`query-id`").as("qid"), col("`corpus-id`").as("docId"),
        col("score").as("grade"))
}
