package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (ts TIMESTAMP, event_type STRING, value DOUBLE, ...).
  *
  * The reference harness is batch-only (SURVEY.md §2.9) — these operators
  * are the streaming-native re-expression of its aggregation/report stage
  * for a pipeline that ingests events continuously: the tumbling-window
  * aggregate computes exactly what the batch `events_tumbling` driver query
  * computes, plus watermark-based late-data handling; the stateful op keeps
  * per-key running stats via mapGroupsWithState.
  *
  * All functions accept any streaming (or batch) DataFrame with the right
  * columns, so tests drive them with MemoryStream.
  */
object EventsStream {

  /** Watermarked tumbling-window counts/sums per event_type.
    * Batch-equivalent: DriverQueries.eventsTumbling (hour windows).
    */
  def tumblingCounts(events: DataFrame,
                     watermarkDelay: String = "1 hour",
                     window: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window average value per event_type (window/slide). */
  def slidingAvg(events: DataFrame,
                 watermarkDelay: String = "1 hour",
                 window: String = "2 hours",
                 slide: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide),
        col("event_type"))
      .agg(round(avg(col("value")), 6).as("avg_value"), count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("avg_value"), col("n"))

  final case class EventRow(ts: Timestamp, event_type: String, value: Double)
  final case class TypeState(n: Long, sum: Double, max: Double)
  final case class TypeStats(event_type: String, n: Long, sum: Double, max: Double)

  /** Custom per-key state via mapGroupsWithState: running (count, sum, max)
    * per event_type across micro-batches (ProcessingTimeTimeout-free,
    * update-mode output of the refreshed state each batch).
    */
  def runningStats(events: Dataset[EventRow]): Dataset[TypeStats] = {
    implicit val se = Encoders.product[TypeState]
    implicit val so = Encoders.product[TypeStats]
    implicit val ks = Encoders.STRING
    events
      .groupByKey(_.event_type)
      .mapGroupsWithState[TypeState, TypeStats](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[EventRow], state: GroupState[TypeState]) =>
          var s = state.getOption.getOrElse(TypeState(0L, 0.0, Double.MinValue))
          rows.foreach { r =>
            s = TypeState(s.n + 1, s.sum + r.value, math.max(s.max, r.value))
          }
          state.update(s)
          TypeStats(key, s.n, s.sum, s.max)
      }
  }

  /** Streaming exact dedup at ingest — the continuous twin of
    * graft.ops.Dedup.exact for a pipeline that receives documents as a
    * stream: keyed by content hash, state bounded by the watermark
    * (dropDuplicatesWithinWatermark keeps a key only until the watermark
    * passes its event time, so state does NOT grow with the corpus — the
    * property that matters for an unbounded ingest).
    *
    * Expects (ts TIMESTAMP, id, text); emits first-seen rows with their
    * content hash.
    */
  def dedupedDocs(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("grp", md5(col("text").cast("binary")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("grp")

  /** Canonical sink wiring: append-mode parquet with checkpointing. */
  def writeParquet(df: DataFrame, path: String, checkpoint: String,
                   outputMode: OutputMode = OutputMode.Append()) =
    df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", path)
}
