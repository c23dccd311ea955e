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

  test("mm_header_fields runs fully codegen'd — no mapPartitions barrier") {
    // the round-12 contract: the multimodal family's header probe is a
    // native expression inside whole-stage codegen, unlike the row-28
    // decode stand-in (which is object-boundary plumbing by design)
    val df = Multimodal.mmHeaderFields(spark, Sf0001)
    df.collect() // materialize THIS queryExecution so AQE reports the FINAL plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions"), s"barrier in plan:\n$plan")
    assert(!plan.contains("DeserializeToObject"), s"barrier in plan:\n$plan")
    // the final-plan tree renders whole-stage-codegen spans as "*(n)"
    assert(plan.contains("*("), s"no codegen span:\n$plan")
    assert(plan.contains("binary_be_field"), s"expression missing:\n$plan")
  }

  test("binary_be_field matches a byte-loop reference, incl. short payloads") {
    val rows = Tables.documents(spark, Sf0001).limit(200)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("p"))
      .select(col("doc_id"), col("p"),
        graft.functions.HashExprs.binaryBeField(col("p"), 0, 4).as("m4"),
        graft.functions.HashExprs.binaryBeField(col("p"), 4, 2).as("d2"),
        // offset far past any real payload: must be NULL, never a throw
        graft.functions.HashExprs.binaryBeField(col("p"), 1 << 20, 1).as("far"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Array[Byte]]("p")
      def ref(o: Int, w: Int): Option[Long] =
        if (b.length < o + w) None
        else Some((o until o + w).foldLeft(0L)((a, i) => (a << 8) | (b(i) & 0xffL)))
      def got(name: String): Option[Long] =
        if (r.isNullAt(r.fieldIndex(name))) None else Some(r.getAs[Long](name))
      assert(got("m4") === ref(0, 4), s"doc ${r.getLong(0)}")
      assert(got("d2") === ref(4, 2), s"doc ${r.getLong(0)}")
      assert(got("far") === None)
    }
  }
}
