package graft

import java.sql.DriverManager

import graft.cdc.{ChangeFeed, Forwarder, HyperRemap}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The COMPOSED change-data pipeline over the JDBC polling source —
  * SURVEY §2 rows 1/2/8/9/50 chained as one checkpointed stream
  * (round-12 verdict ask #7; previously each stage's twin was proven
  * separately):
  *
  *   JdbcChangeFeed poll → wal2json decode (+cmap) → hypertable remap →
  *   per-subscriber fan-out (append sink) + incremental LWW snapshot
  *
  * driven through a KILL and RESTART from the same checkpoint, with the
  * drained result asserted EQUAL to the batch chain over the full feed:
  * deliveries match Forwarder.fanoutFromDecoded, snapshot state matches
  * Forwarder.snapshotFromDecoded (the cdc_snapshot logic).
  *
  * Exactly-once posture: foreachBatch keys every side effect by batchId —
  * deliveries land in an overwrite-mode per-batch dir, and the snapshot
  * state is a chain of cumulative per-batch versions (state_N = merge of
  * state_{N-1} and batch N), so a replayed batch overwrites its own
  * output instead of double-applying (the production pattern for
  * multi-sink CDC apply; Spark replays a batch only with identical
  * content). */
class JdbcPipelineSpec extends SparkSpec {

  private def exec(url: String, sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().execute(sql) } finally c.close()
  }

  private def insertMsgs(url: String, rows: Array[Row]): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      c.setAutoCommit(false)
      val ps = c.prepareStatement("INSERT INTO changes VALUES (?, ?)")
      rows.foreach { r =>
        ps.setLong(1, r.getLong(0)); ps.setString(2, r.getString(1))
        ps.addBatch()
      }
      ps.executeBatch(); c.commit()
    } finally c.close()
  }

  test("jdbc poll → decode → remap → fan-out → snapshot survives kill/restart") {
    val work = java.nio.file.Files.createTempDirectory("graft-jdbc-pipe-").toString
    val url = s"jdbc:derby:$work/db;create=true"
    val ckpt = s"$work/ckpt"
    val dlv = s"$work/deliveries"
    val snap = s"$work/snapshot"
    exec(url, "CREATE TABLE changes (lsn BIGINT PRIMARY KEY, payload VARCHAR(4000))")

    // real wal2json documents (multi-statement transactions, _hyper_
    // chunk tables, delete tombstones with oldkeys) from the synthesized
    // feed — 600 keeps the Derby insert fast while covering every shape
    val msgs = ChangeFeed.messages(spark, Sf0001).orderBy("lsn").limit(600).collect()
    val (phase1, phase2) = msgs.splitAt(400)
    insertMsgs(url, phase1)

    def latestStateId(): Option[Long] = {
      val d = new java.io.File(snap)
      Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        .map(_.getName).filter(_.startsWith("state_"))
        .map(_.stripPrefix("state_").toLong).sorted.lastOption
    }

    def applyBatch(batch: DataFrame, batchId: Long): Unit = {
      // fan-out deliveries, idempotent per batch
      Forwarder.fanoutFromDecoded(spark, batch)
        .write.mode("overwrite").parquet(s"$dlv/batch_$batchId")
      // incremental snapshot: merge this batch's per-entity LWW delta
      // into the previous cumulative state (max-(lsn,idx) + count sum)
      val delta = HyperRemap.remap(spark, batch)
        .withColumn("uid", Forwarder.entityCol)
        .groupBy("base", "uid")
        .agg(max(struct(col("lsn"), col("idx"))).as("last"),
          expr("max_by(kind, struct(lsn, idx))").as("last_kind"),
          count(lit(1)).as("n_changes"))
        .select(col("base"), col("uid"), col("last.lsn").as("last_lsn"),
          col("last.idx").as("last_idx"), col("last_kind"), col("n_changes"))
      val prior = latestStateId().filter(_ < batchId)
        .map(id => spark.read.parquet(s"$snap/state_$id"))
      val merged = prior.fold(delta)(p =>
        p.unionByName(delta)
          .groupBy("base", "uid")
          .agg(max(struct(col("last_lsn"), col("last_idx"))).as("last"),
            expr("max_by(last_kind, struct(last_lsn, last_idx))").as("last_kind"),
            sum("n_changes").as("n_changes"))
          .select(col("base"), col("uid"), col("last.last_lsn").as("last_lsn"),
            col("last.last_idx").as("last_idx"), col("last_kind"),
            col("n_changes")))
      merged.write.mode("overwrite").parquet(s"$snap/state_$batchId")
    }

    def runOnce(): Unit = {
      val raw = spark.readStream
        .format("graft.sources.JdbcChangeFeed")
        .option("url", url).option("table", "changes")
        // the feed's first commit is lsn 0 and startLsn is EXCLUSIVE
        .option("startLsn", "-1")
        .option("numPartitions", "2")
        .load()
      val q = ChangeFeed.decodedWithMapFromRaw(raw).writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(applyBatch _)
        .start()
      q.awaitTermination()
    }

    runOnce() // delivers phase 1

    // pipeline is DOWN; more transactions commit (incl. the tombstones)
    insertMsgs(url, phase2)

    runOnce() // restart from the checkpoint: exactly the missed window

    // batch reference over the FULL feed as it now stands in the database
    val rawAll = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "changes").load()
      .select(col("LSN").as("lsn"), col("PAYLOAD").as("payload"))
    val withMapAll = ChangeFeed.decodedWithMapFromRaw(rawAll)

    def dkey(r: Row) = (r.getAs[String]("sub_id"), r.getAs[Long]("lsn"),
      r.getAs[Long]("idx"), r.getAs[String]("base"), r.getAs[String]("kind"))
    val streamedDlv = spark.read.parquet(s"$dlv/batch_*")
      .select("sub_id", "lsn", "idx", "base", "kind")
      .collect().map(dkey).sorted
    val batchDlv = Forwarder.fanoutFromDecoded(spark, withMapAll)
      .select("sub_id", "lsn", "idx", "base", "kind")
      .collect().map(dkey).sorted
    assert(streamedDlv.nonEmpty)
    // EQUALITY is the whole contract: every change delivered exactly once
    // across the kill/restart — no loss, no re-delivery
    assert(streamedDlv === batchDlv)

    def skey(r: Row) = (r.getAs[String]("base"), r.getAs[Long]("uid"),
      r.getAs[Long]("last_lsn"), r.getAs[String]("last_kind"),
      r.getAs[Long]("n_changes"))
    val sid = latestStateId().getOrElse(fail("no snapshot state written"))
    val streamedSnap = spark.read.parquet(s"$snap/state_$sid")
      .where(col("last_kind") =!= "delete")
      .collect().map(skey).sorted
    val batchSnap = Forwarder.snapshotFromDecoded(spark, withMapAll)
      .collect().map(skey).sorted
    assert(streamedSnap.nonEmpty)
    assert(streamedSnap === batchSnap)
  }
}
