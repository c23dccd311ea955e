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

  test("binary_cdc_chunks: chunker runs codegen'd, pre-aggregation plan is barrier-free") {
    // pin the plan of the chunk frame itself (the query's aggregation
    // stages shuffle count-only rows — the contract is that CHUNKING
    // never leaves whole-stage codegen)
    val df = Tables.documents(spark, Sf0001)
      .where(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("p"))
      .select(col("doc_id"),
        explode(graft.functions.HashExprs.binaryCdcChunks(col("p"),
          Multimodal.CdcK, Multimodal.CdcBoundaryMod, TextStats.FpPrime,
          TextStats.FpMod, graft.ops.Pipeline.HashModPrime,
          graft.functions.HashExprs.Mix3)).as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions"), s"barrier in plan:\n$plan")
    assert(!plan.contains("DeserializeToObject"), s"barrier in plan:\n$plan")
    assert(plan.contains("binary_cdc_chunks"), s"expression missing:\n$plan")
    assert(plan.contains("*("), s"no codegen span:\n$plan")
  }

  test("binary_cdc_chunks: chunks tile the payload and cuts are content-defined") {
    val rows = Tables.documents(spark, Sf0001).limit(300)
      .where(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("p"),
        graft.functions.HashExprs.binaryCdcChunks(col("p"),
          Multimodal.CdcK, Multimodal.CdcBoundaryMod, TextStats.FpPrime,
          TextStats.FpMod, graft.ops.Pipeline.HashModPrime,
          graft.functions.HashExprs.Mix3).as("cs"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]]("p")
      val cs = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("cs"))
      // tiling: starts are contiguous, lens sum to the payload length
      var expectStart = 0L
      cs.foreach { c =>
        assert(c.getLong(0) == expectStart, s"gap at doc ${r.getLong(0)}")
        assert(c.getLong(1) >= 1)
        expectStart += c.getLong(1)
      }
      assert(expectStart == payload.length.toLong, s"doc ${r.getLong(0)} not tiled")
      // per-chunk fp equals a fresh polynomial hash of the chunk bytes
      cs.take(3).foreach { c =>
        val (s, l) = (c.getLong(0).toInt, c.getLong(1).toInt)
        val ref = (s until s + l).foldLeft(0L)((h, i) =>
          (h * TextStats.FpPrime + (payload(i) & 0xff)) % TextStats.FpMod)
        assert(c.getLong(2) == ref, s"fp mismatch at doc ${r.getLong(0)}")
      }
    }

    // the CDC property: prepending bytes re-synchronizes — all but the
    // first few chunk fingerprints of the shifted payload recur
    val base = rows.map(r => r.getAs[Array[Byte]]("p")).maxBy(_.length)
    import spark.implicits._
    def chunkFps(b: Array[Byte]): Seq[Long] = {
      val bdf = Seq(Tuple1(b)).toDF("p")
        .select(graft.functions.HashExprs.binaryCdcChunks(col("p"),
          Multimodal.CdcK, Multimodal.CdcBoundaryMod, TextStats.FpPrime,
          TextStats.FpMod, graft.ops.Pipeline.HashModPrime,
          graft.functions.HashExprs.Mix3).as("cs"))
      bdf.collect().head.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(2))
    }
    val orig = chunkFps(base)
    val shifted = chunkFps("INSERTED-PREFIX-BYTES ".getBytes("UTF-8") ++ base)
    assert(orig.size >= 4, "fixture doc must chunk several times")
    val recurring = orig.toSet.intersect(shifted.toSet).size
    assert(recurring >= orig.size - 2,
      s"insertion must re-synchronize: only $recurring of ${orig.size} fps recur")
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
