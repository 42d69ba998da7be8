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
    val df = graft.entry.DriverQueries.tokDoclen(spark, "/root/testdata/sf0.001")
    val scan = df.queryExecution.executedPlan.toString
    // only doc_id and text should be read from the documents table
    assert(scan.contains("ReadSchema"), scan)
    assert(!scan.contains("n_chars"), s"unpruned column in scan:\n$scan")
  }

  test("dimension joins broadcast (q2_join_agg)") {
    val df = graft.entry.DriverQueries.q2JoinAgg(spark, "/root/testdata/sf0.001")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), physical)
  }
}
