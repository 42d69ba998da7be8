package graft.index

import graft.SparkTestBase
import graft.util.SynthCorpus

/** North-rule resume semantics: a build killed after a committed partition
  * group resumes from the commit log and produces an index identical to a
  * single-shot build (SURVEY.md §5.2 "Resume test").
  */
class ResumeSpec extends SparkTestBase {

  private def corpusDf = {
    import spark.implicits._
    spark.createDataset(SynthCorpus.gen(4, 20)).toDF()
      .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")
  }

  private def postingsFingerprint(dir: String): Seq[(String, Int, Long, String)] =
    spark.read.parquet(s"$dir/postings")
      .selectExpr("term", "salt", "df",
        "sha2(cast(concat_ws(',', transform(blocks, b -> concat(b.first, ':', b.n, ':', hex(b.ids), ':', hex(b.imps)))) as binary), 256) as sig")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("killed-after-group-1 build resumes to an identical index") {
    val dirA = tmpDir("graft-single")
    val dirB = tmpDir("graft-resumed")
    val cfg = IndexBuilder.Config(numSegmentGroups = 3, numBuckets = 4)

    IndexBuilder.build(spark, corpusDf, dirA, cfg)

    // killed build: crashes right after committing segment group 1
    intercept[IllegalStateException] {
      IndexBuilder.build(spark, corpusDf, dirB, cfg.copy(failAfterGroup = 1))
    }
    val store = new graft.store.IcebergLikeStore(dirB)
    assert(!store.isComplete)
    assert(store.committedGroups() == Set("docmap", "seg-0", "seg-1"))

    // resume: only seg-2 and downstream stages run
    IndexBuilder.build(spark, corpusDf, dirB, cfg)
    assert(new graft.store.IcebergLikeStore(dirB).isComplete)

    assert(postingsFingerprint(dirA) == postingsFingerprint(dirB))
    val docsA = spark.read.parquet(s"$dirA/docs").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val docsB = spark.read.parquet(s"$dirB/docs").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(docsA == docsB)
  }

  test("completed build is a no-op on re-invocation") {
    val dir = tmpDir("graft-noop")
    val cfg = IndexBuilder.Config(numSegmentGroups = 2, numBuckets = 4)
    IndexBuilder.build(spark, corpusDf, dir, cfg)
    val props1 = new graft.store.IcebergLikeStore(dir).readProperties()
    IndexBuilder.build(spark, corpusDf, dir, cfg) // must not rebuild
    val props2 = new graft.store.IcebergLikeStore(dir).readProperties()
    assert(props1 == props2) // buildElapsedSec unchanged ⇒ nothing re-ran
  }

  test("per-row sha256(content) invariant preserved through ingestion") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("graft-sha")
    val c = corpusDf
    IndexBuilder.build(spark, c, dir, IndexBuilder.Config(numSegmentGroups = 2, numBuckets = 4))
    // every input docId appears exactly once in the docs table
    val in = c.select(col("docId"), sha2(col("content").cast("binary"), 256).as("sha"))
    val out = spark.read.parquet(s"$dir/docs").select("docId")
    assert(out.count() == in.count())
    assert(out.join(in, "docId").count() == in.count())
    // and the content hashes of the input are stable across two reads
    assert(in.collect().map(_.getString(1)).sorted.toSeq ==
      c.select(sha2(col("content").cast("binary"), 256)).collect().map(_.getString(0)).sorted.toSeq)
  }
}
