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

  // ---- events_hopping: sliding-window counts ------------------------------

  /** Hopping (sliding) 1-hour windows every 30 minutes, via Spark's native
    * `window(col, duration, slide)` — the overlapping-window shape trend
    * dashboards ask of the change feed (each event lands in
    * duration/slide = 2 windows). The native operator expands the slide
    * memberships BEFORE the aggregation, so the shuffle carries
    * (window, type) partial counts, never duplicated events; the oracle
    * states the same expansion arithmetically (window starts are
    * epoch-aligned slide multiples, exact integer µs on both engines).
    * Unmodified, this frame also runs under readStream + watermark — the
    * streaming twin of the tumbling path above. */
  val SlideUs: Long = 1800L * 1000 * 1000 // 30 min in microseconds

  def eventsHopping(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(timestamp_micros(expr("ts div 1000")).as("et"), col("event_type"))
      .groupBy(window(col("et"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"))
      .orderBy("win_start_us", "event_type")

  val eventsHoppingSql: String =
    s"""SELECT ((epoch_us(ts) // $SlideUs) - j) * $SlideUs AS win_start_us,
       |       event_type, count(*) AS n
       |FROM events
       |CROSS JOIN (SELECT unnest(range(0, ${WindowUs / SlideUs})) AS j) js
       |GROUP BY win_start_us, event_type
       |ORDER BY win_start_us, event_type""".stripMargin

  // ---- streaming path -----------------------------------------------------

  /** Streaming read of an events-parquet directory. The schema is pinned
    * from a batch read of the files already present (streaming sources
    * require an explicit schema).
    *
    * `maxFilesPerTrigger` is the file-source backpressure knob: on a
    * backlogged directory (a 100 TB replay, a resumed checkpoint far
    * behind the head) the default source admits EVERY pending file into
    * one catch-up micro-batch — unbounded batch state, shuffle, and
    * commit latency. With the cap, the backlog drains in bounded batches
    * whose size the deployment chooses to fit executor memory;
    * BackpressureSpec pins the bound. */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = Tables.tune(spark).read.parquet(dir).schema
    var r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n.toString))
    // same long-ns ts contract as the batch reader — scan-level projection,
    // valid on a streaming frame
    Tables.normalizeEventsTs(r.parquet(dir))
  }

  /** Watermarked tumbling-window counts over a (possibly streaming) events
    * frame — the streaming twin of `streamWindowCounts`. events.ts is raw
    * nanoseconds (the Tables.events normalized contract), rebuilt into a proper timestamp for
    * Spark's event-time machinery. */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .count()

  // ---- exactly-once delivery ----------------------------------------------

  /** At-least-once → exactly-once: a redelivered replication message (same
    * LSN re-sent after a reconnect, which the reference tolerates because
    * its LSN feedback is only periodic, src/cdc/replication.rs:255-282) is
    * dropped by keyed dedup within the event-time watermark. State is
    * bounded: an LSN older than the watermark can no longer reappear and
    * its dedup entry is evicted.
    *
    * Contract: the source is a replication stream, so LSNs are monotone
    * and a redelivery can only replay from the last confirmed offset —
    * i.e. it arrives within the dedup horizon (the 2h watermark delay).
    * An LSN further than the horizon behind the stream head is treated as
    * already delivered and dropped; feeding this operator non-monotone
    * backfills would need the horizon widened to their maximum lateness. */
  def dedupedChanges(events: DataFrame): DataFrame =
    graft.cdc.ChangeFeed.decodedFrom(events)
      // one-day base offset: lsn 0 must sit above the initial watermark
      // (epoch 0) or it would be discarded as late before dedup sees it
      .withColumn("event_time", timestamp_micros(col("lsn") * 1000L + 86400000000L))
      .withWatermark("event_time", "2 hours")
      // a change is (lsn, idx): statements of one transaction document
      // share the LSN, so keying on lsn alone would "dedup" them away
      .dropDuplicatesWithinWatermark("lsn", "idx")

  // ---- stateful sessionization -------------------------------------------

  case class SessEvent(user_id: Long, ts_us: Long, event_id: Long)
  case class SessState(start_us: Long, end_us: Long, n_events: Long,
    first_event_id: Long, session_seq: Long)
  case class SessClosed(user_id: Long, session_seq: Long, n_events: Long,
    start_us: Long, end_us: Long, first_event_id: Long)

  val SessionGapUs: Long = 30L * 60 * 1000 * 1000

  /** Streaming gap-sessionizer: custom per-user state via
    * flatMapGroupsWithState — the Spark-native form of the reference's
    * per-client session lifetime. Each batch folds that user's new events
    * in time order into the open session, emitting a session whenever a
    * gap closes it; the still-open session rides in the group state (and
    * the checkpoint) across batches and restarts. */
  /** Pure per-batch fold (unit-tested in SessionFoldSpec): sort the
    * batch's events, walk gaps against the open session, emit closed
    * sessions, return the still-open state. Lateness rules: an event
    * within the gap of the open session widens it (never shrinks); an
    * event older than the open session's start by more than the gap
    * belongs to an earlier (possibly already-emitted) session and is
    * dropped — the same call a watermark makes for too-late data. */
  def foldSession(uid: Long, prev: Option[SessState], events: Seq[SessEvent])
    : (Seq[SessClosed], Option[SessState]) = {
    val sorted = events.sortBy(e => (e.ts_us, e.event_id))
    var cur = prev.orNull
    val closed = Seq.newBuilder[SessClosed]
    sorted.foreach { e =>
      if (cur == null) {
        cur = SessState(e.ts_us, e.ts_us, 1L, e.event_id, 1L)
      } else if (e.ts_us - cur.end_us > SessionGapUs) {
        closed += SessClosed(uid, cur.session_seq, cur.n_events,
          cur.start_us, cur.end_us, cur.first_event_id)
        cur = SessState(e.ts_us, e.ts_us, 1L, e.event_id, cur.session_seq + 1)
      } else if (e.ts_us < cur.start_us - SessionGapUs) {
        // beyond the lateness horizon — drop
      } else {
        cur = cur.copy(
          start_us = math.min(cur.start_us, e.ts_us),
          end_us = math.max(cur.end_us, e.ts_us),
          n_events = cur.n_events + 1,
          first_event_id = math.min(cur.first_event_id, e.event_id))
      }
    }
    (closed.result(), Option(cur))
  }

  def sessionize(events: DataFrame): org.apache.spark.sql.Dataset[SessClosed] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .selectExpr("user_id", "ts div 1000 as ts_us", "event_id")
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessClosed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[SessState]) =>
          val (closed, next) = foldSession(uid, state.getOption, it.toSeq)
          next.foreach(state.update)
          closed.iterator
      }
  }

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
