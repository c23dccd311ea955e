package graft

import graft.ops.{Multimodal, TextStats}
import org.apache.spark.sql.functions._

/** The mapPartitions fake-decode checksum (JVM byte loop) must equal the
  * Catalyst fingerprint expression over the same text — the two
  * implementations of the rolling hash may never diverge. */
class MultimodalSpec extends SparkSpec {

  test("payload checksum equals the fingerprint expression per document") {
    val viaExpr = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaMapPartitions = Multimodal.mmFeatures(spark, Sf0001)
      .select("doc_id", "checksum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaMapPartitions === viaExpr)
  }
}
