package graft

import graft.ops.Sketches
import graft.streaming.ChangeFeedStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming HLL: the SAME register declaration the batch merge
  * certification aggregates (Sketches.hllUserRegisters) must run
  * unmodified under readStream and converge to identical register
  * maxima — `max` is a streaming-safe aggregate with bounded state
  * (≤ types × buckets rows), so a live feed maintains the
  * distinct-count sketch incrementally and any checkpoint's registers
  * merge with any other shard's by the hll_merge identity. */
class HllStreamSpec extends SparkSpec {

  test("streaming register maxima equal the batch sketch registers") {
    val work = stageEventsDir()
    val stream = ChangeFeedStream.readEvents(spark, work)
    val q = Sketches.hllUserRegisters(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hll_regs_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("hll_regs_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    val batch = Sketches.hllUserRegisters(Tables.events(spark, Sf0001))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }
}
