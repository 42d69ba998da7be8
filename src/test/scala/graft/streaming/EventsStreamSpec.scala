package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Streaming semantics vs the batch oracle: the watermarked tumbling window
  * must produce exactly the batch aggregation once all data is ingested, and
  * drop data later than the watermark; mapGroupsWithState must accumulate
  * across micro-batches.
  */
class EventsStreamSpec extends SparkTestBase {

  private def ts(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("tumbling window matches batch aggregation after full ingest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")

    val q = EventsStream.tumblingCounts(events, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(1, 5), "a", 1.0), (ts(1, 30), "a", 2.5), (ts(1, 45), "b", 1.25))
      q.processAllAvailable()
      // advance watermark far past hour 1 so its windows finalize
      mem.addData((ts(5, 0), "a", 9.0))
      q.processAllAvailable()
      val got = spark.table("tumbling").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val h1 = ts(1).getTime / 1000
      assert(got.contains((h1, "a", 2L, 3.5)))
      assert(got.contains((h1, "b", 1L, 1.25)))

      // late datum for hour 1 (watermark now at ~04:50) must be DROPPED:
      // emit hour-5 close-out and check hour-1 'a' still reads n=2
      mem.addData((ts(1, 50), "a", 100.0), (ts(9, 0), "z", 0.0))
      q.processAllAvailable()
      val after = spark.table("tumbling").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .filter(t => t._1 == h1 && t._2 == "a")
      assert(after.toSeq == Seq((h1, "a", 2L, 3.5)), s"late row leaked: ${after.toSeq}")
    } finally q.stop()
  }

  test("streaming ingest dedup: duplicates dropped within watermark, state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "id", "text")
    val q = EventsStream.dedupedDocs(docs, "30 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(1, 0), 0L, "binary search tree"), (ts(1, 1), 1L, "hash map"))
      q.processAllAvailable()
      // same content again inside the watermark horizon -> dropped
      mem.addData((ts(1, 10), 2L, "binary search tree"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getLong(1)).toSet
      assert(ids == Set(0L, 1L), s"duplicate leaked or first-seen lost: $ids")
      // distinct content always passes
      mem.addData((ts(1, 20), 3L, "merge sort"))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").collect().map(_.getLong(1)).toSet
        == Set(0L, 1L, 3L))
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventsStream.EventRow]
    val q = EventsStream.runningStats(mem.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(EventsStream.EventRow(ts(1), "a", 1.0),
        EventsStream.EventRow(ts(1, 10), "a", 4.0))
      q.processAllAvailable()
      mem.addData(EventsStream.EventRow(ts(2), "a", 2.0),
        EventsStream.EventRow(ts(2, 5), "b", 7.0))
      q.processAllAvailable()
      val rows = spark.table("running").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      // latest state per key (update mode appends refreshed rows; take max n)
      val latest = rows.groupBy(_._1).map { case (k, v) => k -> v.maxBy(_._2) }
      assert(latest("a") == ("a", 3L, 7.0, 4.0))
      assert(latest("b") == ("b", 1L, 7.0, 7.0))
    } finally q.stop()
  }
}
