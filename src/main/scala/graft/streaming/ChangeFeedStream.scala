package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row
import graft.Tables

/** Structured-Streaming half of the change feed: checkpointed ingest with
  * offset resume (the LSN standby-status analogue, reference
  * src/cdc/replication.rs:95-282) and watermarked tumbling-window
  * aggregation (SURVEY.md §2 rows 1, 10, 12).
  *
  * The batch-equivalent `streamWindowCounts` below is what the DuckDB
  * oracle checks; the streaming path itself (file source → synthesized
  * wal2json decode → watermark + window → checkpointed sink) is exercised
  * by ScalaTest (ChangeFeedStreamSpec), including a stop/restart that must
  * resume from checkpointed offsets without reprocessing.
  */
object ChangeFeedStream {

  val WindowUs: Long = 3600L * 1000 * 1000 // 1 hour in microseconds

  // ---- batch equivalent (oracle-checked) ----------------------------------

  /** Tumbling 1-hour event counts per event_type, window keyed by its
    * start in epoch microseconds (pure int64 both sides). */
  def streamWindowCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(expr("ts div 1000").as("ts_us"), col("event_type"))
      .withColumn("win_start_us", expr(s"ts_us div $WindowUs") * WindowUs)
      .groupBy("win_start_us", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("win_start_us", "event_type")

  val streamWindowCountsSql: String =
    s"""SELECT (epoch_us(ts) // $WindowUs) * $WindowUs AS win_start_us,
       |       event_type, count(*) AS n
       |FROM events
       |GROUP BY win_start_us, event_type
       |ORDER BY win_start_us, event_type""".stripMargin

  // ---- streaming path -----------------------------------------------------

  /** Streaming read of an events-parquet directory. The schema is pinned
    * from a batch read of the files already present (streaming sources
    * require an explicit schema). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.tune(spark).read.parquet(dir).schema
    spark.readStream
      .schema(schema)
      .parquet(dir)
  }

  /** Watermarked tumbling-window counts over a (possibly streaming) events
    * frame — the streaming twin of `streamWindowCounts`. events.ts is raw
    * nanoseconds (Tables.nanosAsLong), rebuilt into a proper timestamp for
    * Spark's event-time machinery. */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .count()

  /** Checkpointed writer: complete-mode in-memory sink, AvailableNow (drain
    * everything present, then stop) — window/count state and file offsets
    * both live in the checkpoint, so a restart resumes instead of
    * reprocessing. */
  def checkpointedQuery(counts: DataFrame, checkpointDir: String,
    tableName: String): DataStreamWriter[Row] =
    counts.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(tableName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
}
