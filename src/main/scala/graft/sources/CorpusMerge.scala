package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-corpus ingestion: union N named sub-corpora into one table with
  * namespaced ids — the Spark-native re-expression of the reference's
  * cqadupstack merge (utils/beir.py:38-112), which rewrites every corpus /
  * query / qrel `_id` to `"<subcorpus>_<id>"` so ids colliding across
  * sub-corpora stay distinct in the union.
  *
  * Pure narrow ops (projection + unionByName): no shuffle, arbitrarily many
  * parts, any additional columns pass through untouched.
  */
object CorpusMerge {

  /** Union `parts` (name → table), prefixing each of `idCols` with
    * `"<name>_"`. Columns are matched by name; all parts must share a
    * schema (the reference's corpus files do).
    */
  def merge(parts: Seq[(String, DataFrame)],
            idCols: Seq[String] = Seq("_id")): DataFrame = {
    require(parts.nonEmpty, "merge of zero corpora")
    parts.map { case (name, df) =>
      idCols.foldLeft(df) { (d, c) =>
        d.withColumn(c, concat(lit(s"${name}_"), col(c).cast("string")))
      }
    }.reduce(_.unionByName(_))
  }

  /** Qrels variant: both the query id and the corpus id are rewritten
    * (utils/beir.py:89-112).
    */
  def mergeQrels(parts: Seq[(String, DataFrame)],
                 queryIdCol: String = "query-id",
                 corpusIdCol: String = "corpus-id"): DataFrame =
    merge(parts, Seq(queryIdCol, corpusIdCol))
}
