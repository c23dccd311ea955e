package graft

import graft.streaming.ChangeFeedStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming stateful dedup: `dropDuplicates` over the event stream must
  * surface exactly the batch-distinct key set once the stream drains —
  * the streaming twin of the exact-dedup family (state-store keyed
  * dedup is how "seen before" runs on a live feed instead of a corpus
  * pass). */
class StreamingDedupSpec extends SparkSpec {

  test("streaming dropDuplicates equals batch distinct") {
    val work = stageEventsDir()
    val stream = ChangeFeedStream.readEvents(spark, work)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id")
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("dedup_stream")
      .select("user_id").collect().map(_.getLong(0)).sorted
    val batch = Tables.events(spark, Sf0001)
      .select("user_id").distinct().collect().map(_.getLong(0)).sorted
    // exactly one row per distinct key, and exactly the batch key set
    assert(streamed.length === streamed.distinct.length)
    assert(streamed === batch)
  }
}
