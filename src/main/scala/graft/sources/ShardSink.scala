package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Pipeline

/** The training-shard write path (SURVEY.md §2 row 66): the corpus is
  * routed with the deterministic shard hash (same formula the
  * shard_assign audit certifies), repartitioned ON the shard key so each
  * task writes exactly one shard's files, and committed as
  * `partitionBy(shard)` parquet.
  *
  * Scale notes:
  *  - `repartition(NumShards, shard)` before `partitionBy` is the
  *    write-amplification guard: without it every task holds an open
  *    writer per shard (tasks × shards small files); with it, files per
  *    shard = 1 regardless of input parallelism, and the shuffle is the
  *    same hash the router already defined.
  *  - The shard column lands in the directory structure (`shard=N/`), so
  *    a downstream trainer reading one shard gets partition PRUNING —
  *    the scan's PartitionFilters, not a data filter (ShardWriteSpec
  *    pins this on the plan).
  *  - At a real corpus scale NumShards is thousands and the repartition
  *    count matches; the constant here follows the shard_assign audit. */
object ShardSink {

  /** Shard-routed projection of the documents table. */
  def routed(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        (col("doc_id") % Pipeline.HashModPrime * Pipeline.HashMult
          % Pipeline.HashModPrime % Pipeline.NumShards).as("shard"))

  /** Write the routed corpus as partitioned parquet; returns the routed
    * frame for verification. */
  def writeShards(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    val r = routed(spark, dir)
    r.repartition(Pipeline.NumShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    r
  }
}
