package graft

import graft.streaming.ChangeFeedStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermarked stream-stream interval join: signups joined to the same
  * user's purchases within one hour — the attribution join a live feed
  * runs with BOTH sides unbounded, which forces Spark to keep watermark-
  * bounded state for each side instead of a static build table. The
  * drained streaming result must equal the identical batch join. */
class StreamStreamJoinSpec extends SparkSpec {

  /** The same declarative join over any pair of (possibly streaming)
    * event frames — the batch/streaming-equivalence pattern the cdc
    * chain uses (`*From` transforms). */
  private def attributed(ev1: DataFrame, ev2: DataFrame): DataFrame = {
    val signups = ev1.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), expr("ts div 1000").as("s_us"),
        col("event_id").as("s_id"),
        expr("timestamp_micros(ts div 1000)").as("s_t"))
      .withWatermark("s_t", "1 hour")
    val purchases = ev2.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), expr("ts div 1000").as("p_us"),
        col("event_id").as("p_id"),
        expr("timestamp_micros(ts div 1000)").as("p_t"))
      .withWatermark("p_t", "1 hour")
    signups.join(purchases,
      col("s_user") === col("p_user") &&
        col("p_t") >= col("s_t") && col("p_t") <= col("s_t") + expr("INTERVAL 1 HOUR"))
      .select(col("s_user").as("user_id"), col("s_id"), col("p_id"),
        (col("p_us") - col("s_us")).as("lag_us"))
  }

  test("watermarked stream-stream interval join equals the batch join") {
    val work = stageEventsDir()
    val stream = ChangeFeedStream.readEvents(spark, work)
    val q = attributed(stream, stream).writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ssj_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), r.getAs[Long]("s_id"),
        r.getAs[Long]("p_id"), r.getAs[Long]("lag_us"))
    val ev = Tables.events(spark, Sf0001)
    val batch = attributed(ev, ev).collect().map(key).sorted
    val streamed = spark.table("ssj_stream").collect().map(key).sorted
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }
}
