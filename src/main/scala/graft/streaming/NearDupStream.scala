package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Dedup

/** Streaming MinHash-LSH near-duplicate flagging — the near-dup twin of
  * the exact streaming dedup (StreamingDedupSpec's dropDuplicates): a
  * live document feed is banded with EXACTLY the batch pipeline's
  * shingle → minhash → band chain (Dedup.bandsOfDocs — same codegen'd
  * hash expressions, so a document lands in bit-identical buckets
  * whether it arrives by stream or by corpus pass), and per band bucket
  * a state store keeps the keeper (smallest doc_id seen so far). Every
  * arriving document that shares ≥ 1 bucket with the keeper of that
  * bucket is emitted as a near-dup candidate — the streaming analogue of
  * the batch rule "candidate iff it shares a band bucket with a smaller
  * doc_id". With id-ordered ingestion (a change feed's natural order)
  * the two are provably equal; NearDupStreamSpec pins that equality
  * across single- and multi-micro-batch replays.
  *
  * Scale shape: state is ONE long per occupied band bucket (the keeper),
  * not per document pair — bucket cardinality is bounded by corpus
  * distinct-content size, and the stream shuffles only (doc_id, band_id,
  * band_key) rows, never text or shingle arrays. Emitted candidates are
  * per (doc, bucket) and may repeat across buckets; consumers dedup
  * downstream (exactly how the batch candidate frame is distinct()-ed
  * before verification).
  */
object NearDupStream {

  /** Raw parquet document stream (the file-source staging fixture);
    * maxFilesPerTrigger bounds each micro-batch for replay tests. */
  def readDocs(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    var r = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
    maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n.toString))
    r.parquet(dir)
  }

  /** Must stay non-private: the Dataset encoder's generated projection
    * cannot access a private member class. */
  case class BandRow(doc_id: Long, band_id: Int, band_key: Long)

  /** Append-mode stream of near-dup candidate doc_ids (one row per
    * flagged (doc, bucket); distinct downstream).
    *
    * State growth contract: with the default (no TTL), state is bounded
    * by DISTINCT-CONTENT band-bucket cardinality — it grows with the
    * corpus's distinct documents, never with duplicate volume or feed
    * length, but on a feed whose distinct content grows forever it grows
    * forever too. `stateTtl` bounds it: a keeper entry idle longer than
    * the TTL is dropped (processing-time timeout), at the documented
    * price that a duplicate arriving after a quiet period re-admits its
    * content as a fresh keeper — the standard recall-vs-state trade of
    * windowed streaming dedup. Exact batch parity (NearDupStreamSpec)
    * additionally requires id-ordered ingestion: a later-arriving
    * smaller doc_id becomes keeper without retro-flagging the earlier
    * doc. Both limits are part of the operator contract. */
  def flagNearDups(docs: DataFrame,
      stateTtl: Option[java.time.Duration] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    Dedup.bandsOfDocs(docs)
      .as[BandRow]
      .groupByKey(r => (r.band_id, r.band_key))
      .flatMapGroupsWithState(
        OutputMode.Append, timeoutConf)(
        (_: (Int, Long), rows: Iterator[BandRow], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ids = rows.map(_.doc_id).toArray.sorted
            val keeper = math.min(state.getOption.getOrElse(Long.MaxValue), ids.head)
            state.update(keeper)
            stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
            ids.iterator.filter(_ != keeper)
          }
        })
      .toDF("doc_id")
  }
}
