package graft.query

import graft.SparkTestBase
import graft.index.IndexBuilder
import graft.util.SynthCorpus

/** Physical-plan quality gates (the `.explain` checks, kept as tests so
  * regressions in pushdown / pruning / join strategy fail loudly):
  *
  *  - query-term candidate scan prunes postings bucket partitions and
  *    pushes the term predicate into the parquet scan;
  *  - the composed driver queries keep their scans column-pruned;
  *  - dimension joins broadcast.
  */
class PlanSpec extends SparkTestBase {

  /** The driver-query plan gates read the sandbox fixture dir; skip (not
    * error) on machines without it.
    */
  private val sfDir = "/root/testdata/sf0.001"
  private def assumeFixtures(): Unit =
    assume(new java.io.File(sfDir).isDirectory, s"fixture dir $sfDir absent")

  private lazy val indexDir = {
    val dir = tmpDir("graft-planspec")
    import spark.implicits._
    val df = spark.createDataset(SynthCorpus.gen(4, 25)).toDF()
      .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")
    IndexBuilder.build(spark, df, dir,
      IndexBuilder.Config(numSegmentGroups = 1, numBuckets = 8))
    dir
  }

  test("candidate postings scan: bucket partition pruning + term pushdown") {
    val idx = new BM25Index(spark, indexDir)
    import spark.implicits._
    val q = Seq(("q1", "binary search tree")).toDF("qid", "query")
    // searchExact's candidate scan — reproduce its filters and inspect
    val terms = Seq("binari", "search", "tree") // stemmed
    val buckets = terms.map(t => graft.util.Hashing.bucketOfTerm(t, idx.numBuckets)).distinct
    val cand = idx.postings
      .where(org.apache.spark.sql.functions.col("bucket").isInCollection(buckets))
      .where(org.apache.spark.sql.functions.col("term").isInCollection(terms))
    val physical = cand.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.contains("bucket"), s"no bucket partition pruning:\n$physical")
    assert(physical.contains("PushedFilters") && physical.contains("In(term"),
      s"term predicate not pushed to parquet:\n$physical")
    // and the full query path actually returns rows
    assert(QueryEngine.searchExact(idx, q, 5).count() > 0)
  }

  test("composed BM25 driver query: column-pruned document scan") {
    assumeFixtures()
    val df = graft.entry.DriverQueries.tokDoclen(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
    // only doc_id and text should be read from the documents table
    assert(scan.contains("ReadSchema"), scan)
    assert(!scan.contains("n_chars"), s"unpruned column in scan:\n$scan")
  }

  test("grouped-top-k windows get WindowGroupLimit pushdown (Spark 4)") {
    assumeFixtures()
    // rank <= k over row_number windows must plan a WindowGroupLimit:
    // each task then keeps only k rows per group BEFORE the shuffle, so
    // the per-group window is not a single-task scale hazard
    for ((name, df) <- Seq(
        "bm25_topk" -> graft.entry.DriverQueries.bm25TopkComposed(spark, sfDir),
        "q3_window_topk" -> graft.entry.DriverQueries.q3WindowTopk(spark, sfDir))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("WindowGroupLimit"),
        s"$name: no WindowGroupLimit pushdown in plan:\n${p.take(4000)}")
    }
  }

  test("every row_number window in ANY entry plan gets WindowGroupLimit") {
    assumeFixtures()
    // the generalized grouped-top-k gate: no driver entry may introduce a
    // row_number window whose per-group rows are not task-side limited
    // before the shuffle (the single-task-per-group scale hazard). Entries
    // with no window pass vacuously; a future entry regressing to an
    // ungated grouped sort fails here by name.
    // Known blind spot: entries returning an eagerly-computed local
    // relation (eval_metrics — TrecEval collects internally) execute their
    // windows inside fn(), so this plan check never sees them. Those
    // windows partition by qid with per-group rows bounded by k / the
    // per-query qrel count — bounded-group windows are not the hazard this
    // gate exists for (unbounded per-group row counts on one task).
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        spark.catalog.clearCache() // entries persist intermediates
        if (plan.contains("row_number") && !plan.contains("WindowGroupLimit"))
          Some(name)
        else None
    }
    assert(offenders.isEmpty,
      s"entries with un-limited row_number windows: $offenders")
  }

  test("dimension joins broadcast (q2_join_agg)") {
    assumeFixtures()
    val df = graft.entry.DriverQueries.q2JoinAgg(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), physical)
  }

  test("finish join never broadcasts hits above the row bound") {
    val idx = new BM25Index(spark, indexDir)
    import spark.implicits._
    val q = Seq(("q1", "binary search tree"), ("q2", "hash index merge"))
      .toDF("qid", "query")
    // Above the bound: nQueries*k=2000 > 1000 -> shuffled hash join, hits
    // as build side; docs must be neither broadcast nor sort-merged. qid
    // resolution is an element_at into the chunk's literal qid array — no
    // join, so NO hash broadcast belongs in this plan at all.
    spark.conf.set("spark.graft.broadcastHitsMaxRows", "1000")
    try {
      val big = QueryEngine.searchWand(idx, q, 1000)
      val physBig = big.queryExecution.executedPlan.toString
      assert(physBig.contains("ShuffledHashJoin"),
        s"no shuffled hash join for large hit sets:\n$physBig")
      assert(!physBig.contains("SortMergeJoin"),
        s"docs side sorted for the finish join:\n$physBig")
      // any hash-relation broadcast here would mean the hit set or the
      // docs dimension is being broadcast despite the row bound
      val nBroadcasts = "BroadcastExchange HashedRelationBroadcastMode".r
        .findAllIn(physBig).size
      assert(nBroadcasts == 0,
        s"$nBroadcasts hash broadcasts (expected none):\n$physBig")
      assert(big.count() > 0)
      // Below the bound: broadcast resolution join as before.
      val small = QueryEngine.searchWand(idx, q, 10)
      assert(small.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    } finally spark.conf.unset("spark.graft.broadcastHitsMaxRows")
  }
}
