package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** BEIR-style retrieval evaluation — NDCG / MAP / Recall / P at cutoffs —
  * over long-form results (qid, docId, score) and qrels (qid, docId, grade).
  * Reproduces the metrics the reference computes via
  * `EvaluateRetrieval.evaluate(qrels, results, [1,10,100,1000])`
  * (benchmark/on_bm25s.py:214-216; pytrec_eval semantics):
  *
  *  - NDCG@k: DCG with gain 2^grade − 1, discount 1/log2(rank+1),
  *    normalized by the ideal DCG from qrels;
  *  - MAP@k: Σ P@i·rel_i / R (R = total relevant, uncapped denominator);
  *  - Recall@k: |relevant ∩ top-k| / R;
  *  - P@k: |relevant ∩ top-k| / k.
  *
  * Means are over all queries that have ≥1 qrel row (pytrec_eval evaluates
  * exactly the qrels' query set). Ranking tie-break: (score DESC, docId ASC)
  * — fixed, documented (SURVEY.md §5.2).
  *
  * Implementation is one window + joins — no collect; scales with
  * |results| + |qrels|.
  */
object TrecEval {

  val DefaultCutoffs: Seq[Int] = Seq(1, 10, 100, 1000)

  /** @return (cutoff INT, ndcg, map, recall, p DOUBLE) — means over queries. */
  def evaluate(results: DataFrame, qrels: DataFrame,
               cutoffs: Seq[Int] = DefaultCutoffs, roundTo: Int = 5): DataFrame = {
    // duplicates would mint duplicate dcg_$k/... aggregate column names and
    // break the by-name reshape below; a duplicate cutoff adds nothing
    val cuts = cutoffs.distinct
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("docId").asc)
    val cw = Window.partitionBy("qid").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The caller's qrels lineage is persisted exactly ONCE (it feeds the
    // ranked join and the R/ideal derivations — unpersisted it re-ran per
    // consumer, measured 3× the entry cost on eval_metrics, whose qrels
    // derive from a full corpus tokenization) and released before
    // returning. `ranked`/`ideal` need NO cache: every cutoff is computed
    // in a single aggregation pass via conditional sums, so each table is
    // scanned once — at corpus scale this also avoids materializing a
    // |queries|×k-row columnar cache just to scan it |cutoffs| times.
    val q = qrels.select(col("qid"), col("docId"), col("grade"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranked = results
      .withColumn("rank", row_number().over(w))
      .join(q, Seq("qid", "docId"), "left")
      .select(col("qid"), col("rank"),
        coalesce(col("grade"), lit(0)).as("grade"))
      .withColumn("rel", when(col("grade") > 0, 1).otherwise(0))
      .withColumn("prec", sum(col("rel")).over(cw).cast("double") / col("rank"))

    // per-query relevant count R and ideal gains by rank
    val rels = q.where(col("grade") > 0)
    val r = rels.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val iw = Window.partitionBy("qid").orderBy(col("grade").desc, col("docId").asc)
    val ideal = rels.withColumn("irank", row_number().over(iw))

    def gain(g: Column): Column = pow(lit(2.0), g.cast("double")) - 1.0
    def disc(rk: Column): Column = lit(1.0) / log2(rk.cast("double") + 1.0)

    // ONE pass over ranked computes dcg/hits/ap_num for EVERY cutoff
    // (conditional aggregation), one pass over ideal computes every idcg
    val rankedCols = cuts.flatMap { k =>
      Seq(
        sum(when(col("rank") <= k, gain(col("grade")) * disc(col("rank"))))
          .as(s"dcg_$k"),
        sum(when(col("rank") <= k, col("rel"))).as(s"hits_$k"),
        // AP numerator: Σ_{i≤k, rel_i} P@i (P@i precomputed by window)
        sum(when(col("rank") <= k && col("rel") === 1, col("prec")))
          .as(s"ap_$k"))
    }
    val rankedAgg = ranked.groupBy("qid").agg(rankedCols.head, rankedCols.tail: _*)
    val idealCols = cuts.map { k =>
      sum(when(col("irank") <= k, gain(col("grade")) * disc(col("irank"))))
        .as(s"idcg_$k")
    }
    val idealAgg = ideal.groupBy("qid").agg(idealCols.head, idealCols.tail: _*)
    val joined = r
      .join(rankedAgg, Seq("qid"), "left")
      .join(idealAgg, Seq("qid"), "left")

    // Means stay in WIDE form — one avg per (metric, cutoff) column in a
    // single aggregation over the per-query rows — and are reshaped to
    // (cutoff, ndcg, map, recall, p) on the driver after the collect. A
    // cutoff-wise union-then-groupBy would re-execute `joined`'s whole
    // lineage once per cutoff; this plan is strictly linear: every input
    // is scanned exactly once no matter how many cutoffs are evaluated.
    val meanCols = cuts.flatMap { k =>
      Seq(
        round(avg(when(coalesce(col(s"idcg_$k"), lit(0.0)) > 0.0,
            coalesce(col(s"dcg_$k"), lit(0.0)) / col(s"idcg_$k"))
          .otherwise(0.0)), roundTo).as(s"ndcg_$k"),
        round(avg(coalesce(col(s"ap_$k"), lit(0.0)) / col("n_rel")), roundTo)
          .as(s"ap_$k"),
        round(avg(coalesce(col(s"hits_$k"), lit(0L)).cast("double") / col("n_rel")),
          roundTo).as(s"recall_$k"),
        round(avg(coalesce(col(s"hits_$k"), lit(0L)).cast("double") / k), roundTo)
          .as(s"p_$k"))
    }
    // Materialized eagerly (≤ 1 row) so the persisted input can be
    // released HERE — library callers looping evaluate()/run() must not
    // accumulate pinned cache entries for the JVM lifetime. The returned
    // frame is a local relation.
    val wide = joined.agg(meanCols.head, meanCols.tail: _*).collect()
    q.unpersist(blocking = false)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("cutoff", IntegerType), StructField("ndcg", DoubleType),
      StructField("map", DoubleType), StructField("recall", DoubleType),
      StructField("p", DoubleType)))
    val out: Seq[org.apache.spark.sql.Row] =
      if (wide.isEmpty || wide.head.isNullAt(0)) Seq.empty // no evaluable queries
      else cuts.sorted.map { k =>
        val r0 = wide.head
        org.apache.spark.sql.Row(k,
          r0.getAs[Double](s"ndcg_$k"), r0.getAs[Double](s"ap_$k"),
          r0.getAs[Double](s"recall_$k"), r0.getAs[Double](s"p_$k"))
      }
    qrels.sparkSession.createDataFrame(
      java.util.Arrays.asList(out: _*), schema)
  }
}
