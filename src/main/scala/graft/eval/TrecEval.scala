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
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("docId").asc)
    val cw = Window.partitionBy("qid").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // `ranked` and `ideal` feed EVERY cutoff branch below — persist them so
    // the upstream lineage (including the caller's whole scoring pipeline)
    // runs once, not once per cutoff (measured ~2x on eval_metrics); both
    // are unpersisted before returning (the result is computed eagerly).
    val ranked = results
      .withColumn("rank", row_number().over(w))
      .join(qrels.select(col("qid"), col("docId"), col("grade")),
        Seq("qid", "docId"), "left")
      .select(col("qid"), col("rank"),
        coalesce(col("grade"), lit(0)).as("grade"))
      .withColumn("rel", when(col("grade") > 0, 1).otherwise(0))
      .withColumn("prec", sum(col("rel")).over(cw).cast("double") / col("rank"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // per-query relevant count R and ideal gains by rank
    val rels = qrels.where(col("grade") > 0)
    val r = rels.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val iw = Window.partitionBy("qid").orderBy(col("grade").desc, col("docId").asc)
    val ideal = rels.withColumn("irank", row_number().over(iw))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def gain(g: Column): Column = pow(lit(2.0), g.cast("double")) - 1.0
    def disc(rk: Column): Column = lit(1.0) / log2(rk.cast("double") + 1.0)

    val perCut = cutoffs.map { k =>
      val dcg = ranked.where(col("rank") <= k)
        .groupBy("qid")
        .agg(sum(gain(col("grade")) * disc(col("rank"))).as("dcg"),
          sum(col("rel")).as("hits"),
          // AP numerator: Σ_{i≤k, rel_i} P@i (P@i precomputed by window)
          sum(when(col("rel") === 1, col("prec")).otherwise(0.0)).as("ap_num"))
      val idcg = ideal.where(col("irank") <= k)
        .groupBy("qid").agg(sum(gain(col("grade")) * disc(col("irank"))).as("idcg"))
      r
        .join(dcg, Seq("qid"), "left")
        .join(idcg, Seq("qid"), "left")
        .select(
          lit(k).as("cutoff"), col("qid"),
          when(coalesce(col("idcg"), lit(0.0)) > 0.0,
            coalesce(col("dcg"), lit(0.0)) / col("idcg")).otherwise(0.0).as("ndcg"),
          (coalesce(col("ap_num"), lit(0.0)) / col("n_rel")).as("ap"),
          (coalesce(col("hits"), lit(0L)).cast("double") / col("n_rel")).as("recall"),
          (coalesce(col("hits"), lit(0L)).cast("double") / k).as("p"))
    }
    val agg = perCut.reduce(_ unionByName _)
      .groupBy("cutoff")
      .agg(round(avg("ndcg"), roundTo).as("ndcg"),
        round(avg("ap"), roundTo).as("map"),
        round(avg("recall"), roundTo).as("recall"),
        round(avg("p"), roundTo).as("p"))
      .orderBy("cutoff")
    // The final aggregate is ≤ |cutoffs| rows: materialize it eagerly so
    // the persisted intermediates can be released HERE — library callers
    // looping evaluate()/run() must not accumulate pinned cache entries
    // for the JVM lifetime. The returned frame is a local relation.
    val rows = agg.collect()
    ranked.unpersist(blocking = false)
    ideal.unpersist(blocking = false)
    agg.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), agg.schema)
  }
}
