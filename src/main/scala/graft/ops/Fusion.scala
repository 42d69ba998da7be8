package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion operators for hybrid retrieval — combining several ranked
  * runs over the same query set (BM25 variants, lexical + embedding ANN,
  * multiple field indexes) into one ranking. The training-pipeline shape:
  * each retriever emits its top-k long-form run (qid, doc, rank) and the
  * fusion is a pure relational job over those bounded runs.
  *
  * PRECONDITION (both operators): each input run holds AT MOST ONE row per
  * (qid, doc) — the natural shape of a ranked top-k run. Duplicate rows
  * within one run are NOT deduped here and would inflate the RRF sum /
  * CombMNZ agreement count as if extra runs had retrieved the doc; dedup
  * per run (`dropDuplicates("qid", docCol)`) before fusing if a source can
  * emit duplicates.
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

  /** Score-based fusion (Fox & Shaw, TREC-2 1994): per run, min-max
    * normalize scores within each query to [0,1] (a run whose top-k scores
    * are all equal maps to 1.0), then combine per (qid, doc):
    * CombSUM = Σ nscore; CombMNZ = |runs retrieving d| × Σ nscore.
    * Unlike [[rrf]] this uses the score magnitudes, so a run's confidence
    * gap between rank 1 and rank 2 survives fusion.
    *
    * Per-run extrema come from a groupBy(qid) hash agg joined back on qid —
    * runs are top-k bounded (≤ k rows per qid per run) and the extrema
    * table is one row per qid, so both the normalize join and the fusion
    * agg shuffle only rank-bounded data at any corpus scale. Same output
    * conventions as [[rrf]]: round to `roundTo` dp, rank on the rounded
    * value, (fused DESC, doc ASC) tie-break, top `k` per qid.
    */
  def combSum(runs: Seq[DataFrame], k: Int, mnz: Boolean = false,
              scoreCol: String = "score", docCol: String = "doc_id",
              roundTo: Int = 6): DataFrame = {
    require(runs.nonEmpty, "combSum needs at least one run")
    require(k > 0)
    val normed = runs.map { r =>
      val slim = r.select(col("qid"), col(docCol),
        col(scoreCol).cast("double").as("s"))
      val ext = slim.groupBy("qid").agg(min("s").as("lo"), max("s").as("hi"))
      slim.join(ext, "qid")
        .select(col("qid"), col(docCol),
          when(col("hi") === col("lo"), lit(1.0))
            .otherwise((col("s") - col("lo")) / (col("hi") - col("lo")))
            .as("nscore"))
    }
    val weight = if (mnz) count(lit(1)).cast("double") else lit(1.0)
    val fused = normed.reduce(_ unionAll _)
      .groupBy("qid", docCol)
      .agg(round(weight * sum(col("nscore")), roundTo).as("fused"))
    val w = Window.partitionBy("qid").orderBy(col("fused").desc, col(docCol).asc)
    fused
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col(docCol), col("fused"), col("rank").cast("int").as("rank"))
  }
}
