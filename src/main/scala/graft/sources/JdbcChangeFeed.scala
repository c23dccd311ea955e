package graft.sources

import java.sql.DriverManager
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** JDBC polling change-feed source — the BASELINE-declared ingest path
  * ("Structured Streaming + JDBC source with change-feed polling") as a
  * real DataSource-V2 micro-batch stream, replacing the synthesized
  * parquet feed the other streaming twins read.
  *
  * The reference tails a logical-replication slot and resumes from the
  * subscriber-confirmed LSN (src/cdc/replication.rs:95-282). The Spark
  * re-expression: a change TABLE `(lsn BIGINT, payload VARCHAR)` written
  * by the database side (a trigger/outbox or wal2json dump), polled by
  * LSN high-water — each micro-batch reads the half-open window
  * (confirmed, latest] exactly like `replay_window`
  * (cdc/ChangeFeed.scala), and the confirmed LSN lives in the stream's
  * CHECKPOINT offset log, so kill/restart resumes without re-delivery
  * (the standby-status feedback loop, with Spark's offset log as the
  * durable confirmed position).
  *
  * Scale shape: latestOffset is one `max(lsn)` probe per trigger
  * (index-backed upstream); each batch's window is split into
  * `numPartitions` contiguous LSN ranges so executors fetch in parallel
  * with disjoint range predicates — pushdown-friendly on an LSN-indexed
  * or LSN-partitioned change table, no full scans, no overlap. Payload
  * decode (wal2json JSON → typed change) stays in the DataFrame layer
  * downstream, exactly like the batch feed.
  *
  * Usage: `spark.readStream.format("graft.sources.JdbcChangeFeed")
  * .option("url", jdbcUrl).option("table", "changes")...`; options:
  * `url` (required), `table` (default `changes`), `startLsn` (default 0,
  * exclusive), `numPartitions` (default 1), `progressTable` (optional —
  * multi-writer outbox mode, below).
  *
  * MULTI-WRITER OUTBOX (round 15): one writer connection saturates long
  * before the consumer does (measured: the r14 knee at ~48k rows/s was
  * the single-connection ingest path, with the consumer at 82k), so a
  * high-rate deployment shards the outbox across N writer connections.
  * `max(lsn)` is then UNSAFE as the high-water: writer B can commit
  * lsn 1002 while writer A's 1001 is still in flight, and a window read
  * up to 1002 would skip 1001 forever once the offset advances. With
  * `progressTable` set, each writer transactionally publishes its own
  * committed position (same transaction as its row commit) and the
  * source's high-water is the MIN over writers — safe by construction:
  * every uncommitted row belongs to some writer and carries an lsn
  * above that writer's published position, so nothing at or below the
  * min can still be in flight. A finished writer publishes Long.Max's
  * practical stand-in (the feed's known end, or simply a value above
  * any future lsn) so it never holds the watermark back.
  */
class JdbcChangeFeed extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JdbcChangeFeed.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JdbcChangeFeedTable(new CaseInsensitiveStringMap(properties))
}

object JdbcChangeFeed {
  val Schema: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)))
}

private[sources] class JdbcChangeFeedTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  override def name(): String =
    s"jdbc_change_feed(${options.get("table")})"
  override def schema(): StructType = JdbcChangeFeed.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = JdbcChangeFeed.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new JdbcChangeFeedStream(
            url = Option(opts.get("url")).getOrElse(
              throw new IllegalArgumentException("jdbc_change_feed: url option is required")),
            table = Option(opts.get("table")).getOrElse("changes"),
            startLsn = Option(opts.get("startLsn")).map(_.toLong).getOrElse(0L),
            numPartitions = Option(opts.get("numPartitions")).map(_.toInt).getOrElse(1),
            maxLsnPerTrigger = Option(opts.get("maxLsnPerTrigger")).map(_.toLong),
            progressTable = Option(opts.get("progressTable")))
      }
    }
}

/** LSN high-water offset: the stream's checkpointed "confirmed" position.
  * Everything at or below it has been delivered; a batch is the half-open
  * (start, end] window, the replay_window contract. */
private[sources] case class LsnOffset(lsn: Long) extends Offset {
  override def json(): String = lsn.toString
}

private[sources] case class LsnRangePartition(
    url: String, table: String, lo: Long, hi: Long) extends InputPartition

private[sources] class JdbcChangeFeedStream(
    url: String, table: String, startLsn: Long, numPartitions: Int,
    maxLsnPerTrigger: Option[Long] = None,
    progressTable: Option[String] = None)
  extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = LsnOffset(startLsn)

  override def deserializeOffset(json: String): Offset = LsnOffset(json.toLong)

  /** One probe per trigger — the feed's high-water. Single-writer mode:
    * max(lsn) over the change table. Multi-writer mode (`progressTable`
    * set): min(committed_lsn) over the writers' published positions —
    * max(lsn) would race in-flight commits with smaller lsns (see class
    * doc). Either way an empty/absent table keeps the prior position
    * (no regression of the confirmed LSN, ever). */
  private def highWater(): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val sql = progressTable match {
        case Some(pt) => s"SELECT MIN(committed_lsn) FROM $pt"
        case None => s"SELECT MAX(lsn) FROM $table"
      }
      val rs = conn.createStatement().executeQuery(sql)
      val hi = if (rs.next()) { val v = rs.getLong(1); if (rs.wasNull()) startLsn else v }
        else startLsn
      math.max(hi, startLsn)
    } finally conn.close()
  }

  override def latestOffset(): Offset = LsnOffset(highWater())

  /** Bounded admission (the row-161 backpressure contract on the JDBC
    * path): with `maxLsnPerTrigger` set, a backlogged change table
    * drains in bounded (confirmed, confirmed + max] windows instead of
    * one unbounded catch-up batch — the replay posture a 100 TB feed
    * needs after downtime. LSNs are dense in the synthesized feed, so an
    * LSN bound IS a row bound; on a sparse production feed it bounds the
    * scanned key range, which is the quantity the upstream index prices. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[LsnOffset].lsn
    val hi = highWater()
    val bounded = limit match {
      case m: ReadMaxRows => math.min(hi, lo + m.maxRows())
      case _ => maxLsnPerTrigger.fold(hi)(m => math.min(hi, lo + m))
    }
    LsnOffset(math.max(bounded, lo))
  }

  override def getDefaultReadLimit: ReadLimit =
    maxLsnPerTrigger.fold(ReadLimit.allAvailable())(m => ReadLimit.maxRows(m))

  override def reportLatestOffset(): Offset = LsnOffset(highWater())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[LsnOffset].lsn
    val hi = end.asInstanceOf[LsnOffset].lsn
    if (hi <= lo) Array.empty
    else {
      // contiguous, disjoint LSN ranges: each executor fetch carries its
      // own range predicate (index/partition-prunable upstream)
      val n = math.max(1, math.min(numPartitions.toLong, hi - lo)).toInt
      val step = (hi - lo) / n
      val rem = (hi - lo) % n
      var cur = lo
      (0 until n).map { i =>
        val w = step + (if (i < rem) 1 else 0)
        val p = LsnRangePartition(url, table, cur, cur + w)
        cur += w
        p
      }.toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
        val p = partition.asInstanceOf[LsnRangePartition]
        new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
          private val conn = DriverManager.getConnection(p.url)
          private val stmt = {
            val s = conn.prepareStatement(
              s"SELECT lsn, payload FROM ${p.table} WHERE lsn > ? AND lsn <= ? ORDER BY lsn")
            s.setLong(1, p.lo); s.setLong(2, p.hi); s
          }
          private val rs = stmt.executeQuery()
          override def next(): Boolean = rs.next()
          override def get(): org.apache.spark.sql.catalyst.InternalRow = {
            val payload = rs.getString(2)
            org.apache.spark.sql.catalyst.InternalRow(
              rs.getLong(1),
              if (payload == null) null else UTF8String.fromString(payload))
          }
          override def close(): Unit = { rs.close(); stmt.close(); conn.close() }
        }
      }
    }

  /** The engine's confirmed-LSN feedback is the offset log itself; there
    * is nothing to acknowledge upstream (a trimming deployment would
    * DELETE ≤ end here — deliberately not done by default: multiple
    * independent subscribers may tail one change table). */
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
