package graft

import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{ChangeFeedStream, KmvStream}

/** Streaming KMV maintenance (row 222): the per-key bottom-K state fed
  * one micro-batch at a time must converge to EXACTLY the batch window's
  * bottom-K — including under duplicate delivery (the fixture stages the
  * same events file twice, so every hash arrives at least twice and the
  * distinct-union fold is what keeps the sketch correct). The ≥ 2
  * batch-version assertion is data-derived: two staged files with
  * maxFilesPerTrigger=1 ARE two micro-batches. */
class KmvStreamSpec extends SparkSpec {

  test("streaming bottom-K state equals the batch bottom-K, across batches") {
    val work = stageEventsDir()
    // second copy: same rows again -> a second micro-batch of pure dupes
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$work/events-part2.parquet"))

    val stream = ChangeFeedStream.readEvents(spark, work, Some(1))
    val q = KmvStream.bottomK(stream).writeStream
      .outputMode("append")
      .format("memory")
      .queryName("kmv_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val emitted = spark.table("kmv_stream").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getSeq[Long](2)))
    assert(emitted.nonEmpty)
    val maxVer = emitted.map(_._2).max
    assert(maxVer >= 2, s"expected >=2 micro-batches, saw $maxVer")
    val finalState = emitted.groupBy(_._1).view
      .mapValues(_.maxBy(_._2)._3.toSeq).toMap

    val batch = KmvStream.batchBottomK(Tables.events(spark, Sf0001))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(batch.nonEmpty)
    assert(finalState === batch,
      "streaming bottom-K state diverged from the batch bottom-K")
  }
}
