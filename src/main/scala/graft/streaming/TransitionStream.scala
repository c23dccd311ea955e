package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch event_transitions matrix: per-user
  * session-scoped (from_type, to_type) transition emission over a live
  * feed, with the LAST event of each user carried in the state store so
  * a transition straddling two micro-batches (or a restart) is still
  * emitted exactly once.
  *
  * State per user is ONE (ts, event_id, type) triple — constant-size,
  * independent of history length; the 30-minute session gap means a
  * cross-batch pair only forms when the stored event is recent, but the
  * triple is kept regardless (cheap) so late-but-in-gap arrivals in the
  * next batch still pair. Within a batch the group iterator is sorted
  * (a micro-batch is bounded, and per-user volume within one batch is
  * session-scale); across batches ordering is the source's arrival
  * contract, same as every stateful operator here. */
object TransitionStream {

  /** (last ts µs, last event_id, last event_type). */
  case class LastEvent(ts: Long, eventId: Long, typ: String)

  val GapUs: Long = 30L * 60 * 1000 * 1000

  /** events: the Tables.events contract (ts long ns). Returns the
    * transition stream (from_type, to_type), one row per in-session
    * consecutive pair. */
  def transitions(events: DataFrame): Dataset[(String, String)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), expr("ts div 1000").as("ts_us"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[(Long, Long, Long, String)],
         state: GroupState[LastEvent]) => {
          val sorted = it.toVector.sortBy(e => (e._2, e._3))
          val out = Vector.newBuilder[(String, String)]
          var last = state.getOption
          sorted.foreach { e =>
            last match {
              case Some(p) if e._2 - p.ts <= GapUs => out += ((p.typ, e._4))
              case _ => ()
            }
            last = Some(LastEvent(e._2, e._3, e._4))
          }
          last.foreach(state.update)
          out.result().iterator
        })
  }
}
