package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.{Sketches, TextStats}

/** Streaming KMV (bottom-k) sketch maintenance — the incremental twin of
  * the kmv_overlap family's per-source sketches (SURVEY §2 row 222; the
  * row-170 streaming-HLL pattern applied to an order-statistic sketch).
  *
  * Bottom-k is not a built-in streaming aggregate (min-k is an order
  * statistic, not an algebraic fold Spark ships), but its STATE is tiny
  * and its merge is associative: state = the ≤ K smallest distinct
  * hashes seen; merging a new batch = distinct-union then take-K.
  * flatMapGroupsWithState keeps exactly that per key, so a live feed
  * maintains the same sketch the batch bottom-K window computes — the
  * serving path for cross-shard distinct/overlap estimates at 100 TB
  * (per-shard streaming sketches, KMV set algebra across them).
  *
  * Keys here are event types over the events stream (the streaming
  * fixture corpus); the state/merge contract is key-agnostic — the
  * batch kmv_overlap's per-source shingle sketches fold identically.
  */
object KmvStream {

  case class KmvState(ver: Int, hs: Seq[Long])
  case class KmvEmit(key: String, ver: Int, hs: Seq[Long])

  /** Per-key bottom-K maintenance; emits the post-batch state each
    * micro-batch with a monotone version so a consumer (or the spec)
    * can pick each key's latest. */
  def bottomK(ev: DataFrame): Dataset[KmvEmit] = {
    import ev.sparkSession.implicits._
    val hashed = ev.select(col("event_type"),
      expr(s"user_id % ${TextStats.FpMod} * ${graft.functions.HashExprs.Mix1} " +
        s"% ${TextStats.FpMod}").as("h"))
      .as[(String, Long)]
    hashed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[KmvState]) =>
          val prev = state.getOption.getOrElse(KmvState(0, Seq.empty))
          // Incremental bounded fold: a max-heap of the K smallest with a
          // membership set — per-key memory stays O(K) however large the
          // micro-batch is (materializing the batch's rows before take(K)
          // would make state updates O(batch) and undercut the serving
          // claim above). Equivalent to (prev ++ batch).distinct.sorted
          // .take(K): an evicted hash is >= every later heap max, so the
          // strict < test can never readmit it.
          val heap = scala.collection.mutable.PriorityQueue.empty[Long]
          val seen = scala.collection.mutable.HashSet.empty[Long]
          prev.hs.foreach { h => if (seen.add(h)) heap.enqueue(h) }
          rows.foreach { r =>
            val h = r._2
            if (!seen.contains(h)) {
              if (heap.size < Sketches.KmvK) { seen.add(h); heap.enqueue(h) }
              else if (h < heap.head) {
                seen.remove(heap.dequeue()); seen.add(h); heap.enqueue(h)
              }
            }
          }
          val merged = heap.toSeq.sorted
          val next = KmvState(prev.ver + 1, merged)
          state.update(next)
          Iterator.single(KmvEmit(key, next.ver, merged))
      }
  }

  /** Batch reference: the same bottom-K by window rank. */
  def batchBottomK(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ev.select(col("event_type"),
        expr(s"user_id % ${TextStats.FpMod} * ${graft.functions.HashExprs.Mix1} " +
          s"% ${TextStats.FpMod}").as("h"))
      .distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .where(col("rk") <= Sketches.KmvK)
      .groupBy("event_type")
      .agg(sort_array(collect_list("h")).as("hs"))
  }
}
