package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize a physical layout for the events table — the execution
  * half of the layout DECISION operators (`zorder_layout` /
  * `compaction_plan`, SURVEY rows 193-194, graft.ops.Layout): those
  * audit which clustering a 100 TB table owner should pick; this main
  * actually rewrites the table in that clustering, the way Delta
  * OPTIMIZE ZORDER / Iceberg rewrite_data_files executes the plan its
  * optimizer chose.
  *
  * Motivation (round-16 verdict ask #3): the r15 stress-corpus
  * regeneration wrote events with `preserve_insertion_order=false` —
  * row order shuffled, so every parquet row group spans the whole
  * (user, time) domain and the interval-bucket range join
  * (`events_range_join`) lost its zone locality: same plan, 29.5 s →
  * 81.8 s at the 1000× point. The production answer is not "hope the
  * ingest was ordered" but the engine's own layout pass, demonstrated
  * here and measured in BENCH_stress_r17_rangejoin_layout.json.
  *
  * Layouts:
  *  - `user_ts`: repartitionByRange(user_id, ts) + sortWithinPartitions —
  *    clusters BOTH range-join keys; each shuffle-map task of the join
  *    reads rows whose (user_id, bucket) keys are already adjacent, so
  *    exchange input compresses (RLE/dict runs) and the sort inside the
  *    join's partitions sees presorted runs.
  *  - `ts`: repartitionByRange(ts) + sortWithinPartitions(ts) — linear
  *    time clustering, the de-facto layout of any append-by-time ingest
  *    (what the r13 corpus had by accident of generation order).
  *
  * Usage: runMain graft.LayoutApply <srcSfDir> <dstDir> <user_ts|ts> [files]
  * Writes <dstDir>/events.parquet (a parquet directory — Tables.events
  * reads files and directories alike); other tables are the caller's
  * symlinks. `files` (default 128) sizes the rewrite: at the 1000×
  * point (600 M rows) 128 range files ≈ 4.7 M rows/file, the
  * row-group-sized shard a real compactor emits. */
object LayoutApply {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: LayoutApply <srcSfDir> <dstDir> <user_ts|ts> [files]")
    val (src, dst, layout) = (args(0), args(1), args(2))
    val files = if (args.length > 3) args(3).toInt else 128
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "1800s")
      .config("spark.executor.heartbeatInterval", "300s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Knobs.noteDir(src)
    val ev = Tables.events(spark, src)
    val t0 = System.nanoTime()
    val laid = layout match {
      case "user_ts" => ev.repartitionByRange(files, col("user_id"), col("ts"))
        .sortWithinPartitions("user_id", "ts")
      case "ts" => ev.repartitionByRange(files, col("ts"))
        .sortWithinPartitions("ts")
      case other => sys.error(s"unknown layout '$other' (user_ts|ts)")
    }
    laid.write.mode(SaveMode.Overwrite).parquet(s"$dst/events.parquet")
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"layout_rewrite","layout":"$layout","files":$files,"rewrite_sec":$wall%.1f,"src":"$src","dst":"$dst"}""")
    spark.stop()
  }
}
