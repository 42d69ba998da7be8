package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion operators for hybrid retrieval — combining several ranked
  * runs over the same query set (BM25 variants, lexical + embedding ANN,
  * multiple field indexes) into one ranking. The training-pipeline shape:
  * each retriever emits its top-k long-form run (qid, doc, rank) and the
  * fusion is a pure relational job over those bounded runs.
  */
object Fusion {

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * rrf(d) = Σ_runs 1 / (c + rank_run(d)), summed over the runs that
    * retrieved d. Rank-only fusion needs no score normalization, so runs
    * with incomparable score scales (BM25 vs cosine) fuse soundly.
    *
    * Inputs are top-k runs, so every (qid, doc) group holds ≤ runs.size
    * rows and every qid group ≤ runs.size × input-k rows: the groupBy is a
    * partial+final hash agg and the ranking window is bounded-group with
    * WindowGroupLimit pushdown (gated in PlanSpec) — no unbounded
    * single-task group exists at any corpus scale.
    *
    * Output: (qid, docCol, rrf, rank) — top `k` per qid, rrf rounded to
    * `roundTo` dp with ranking computed on the ROUNDED value and a
    * (rrf DESC, doc ASC) tie-break (the repo-wide determinism convention).
    */
  def rrf(runs: Seq[DataFrame], k: Int, c: Int = 60,
          docCol: String = "doc_id", roundTo: Int = 6): DataFrame = {
    require(runs.nonEmpty, "rrf needs at least one run")
    require(k > 0 && c >= 0)
    val slim = runs.map(_.select(col("qid"), col(docCol), col("rank")))
    val fused = slim.reduce(_ unionAll _)
      .groupBy("qid", docCol)
      .agg(round(sum(lit(1.0) / (lit(c) + col("rank"))), roundTo).as("rrf"))
    val w = Window.partitionBy("qid").orderBy(col("rrf").desc, col(docCol).asc)
    fused
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col(docCol), col("rrf"), col("rank").cast("int").as("rank"))
  }
}
