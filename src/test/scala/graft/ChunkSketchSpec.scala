package graft

import graft.cdc.ChangeFeed
import graft.ops.{Chunks, Dedup, Sketches}
import org.apache.spark.sql.functions._

/** Properties of the chunking / sketching / redaction operators that the
  * batch oracle can't express: coverage and overlap invariants, the Bloom
  * no-false-negative guarantee, the HLL error envelope, and that
  * redaction actually removes every digit it counts. */
class ChunkSketchSpec extends SparkSpec {

  test("chunks tile every document with stride overlap") {
    val rows = Chunks.docChunks(spark, Sf0001).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, cs) =>
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      // starts advance by exactly the stride, beginning at 0
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("start_tok") === i.toLong * Chunks.ChunkStride)
      }
      // widths follow min(width, n_tok - start); the doc's token count is
      // recoverable from the last chunk, and every start is < n_tok so the
      // windows tile [0, n_tok) with stride-width overlap
      val nTok = sorted.last.getAs[Long]("start_tok") +
        sorted.last.getAs[Long]("n_chunk_tokens")
      sorted.foreach { r =>
        assert(r.getAs[Long]("start_tok") < nTok)
        assert(r.getAs[Long]("n_chunk_tokens") ===
          math.min(Chunks.ChunkTokens.toLong, nTok - r.getAs[Long]("start_tok")))
      }
    }
  }

  test("bloom prefilter has no false negatives") {
    val chunks = Chunks.chunkFrame(spark, Sf0001)
    val evalFps = chunks.where(col("source") === Dedup.EvalSource)
      .select("chunk_fp").distinct().collect().map(_.getLong(0)).toSet
    val mustFlag = chunks.where(col("source") =!= Dedup.EvalSource)
      .select("doc_id", "chunk_idx", "chunk_fp").collect()
      .filter(r => evalFps.contains(r.getAs[Long]("chunk_fp")))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"))).toSet
    val flagged = Chunks.bloomDecontaminate(spark, Sf0001).collect()
    val flaggedKeys = flagged
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"))).toSet
    assert(mustFlag.subsetOf(flaggedKeys))
    // and every flagged row marked exact really is in the eval fp set
    flagged.filter(_.getAs[Long]("exact_hit") == 1L).foreach { r =>
      assert(evalFps.contains(r.getAs[Long]("chunk_fp")))
    }
  }

  test("hll estimate lands inside the 3-sigma envelope") {
    // m=64 buckets -> relative std error ~1.04/sqrt(64) = 13%. The raw
    // estimator is only unbiased above ~2.5m distinct values (the
    // operator deliberately omits the float-ln linear-counting branch),
    // so the envelope applies only past that documented threshold.
    val rows = Sketches.hllDistinct(spark, Sf0001).collect()
    val inRange = rows.filter(_.getAs[Long]("n_exact") >= 160L)
    assert(inRange.nonEmpty)
    inRange.foreach { r =>
      assert(r.getAs[Long]("err_e4") < 3900L,
        s"${r.getAs[String]("event_type")} err ${r.getAs[Long]("err_e4")}")
    }
  }

  test("hll sketches merge: max-combining half sketches equals the whole") {
    // the property that makes HLL incremental at 100 TB: sketch(A ∪ B) =
    // bucketwise max(sketch(A), sketch(B)). Recompute the bucket/rho
    // pipeline over the two event halves and over the whole table; the
    // merged per-bucket maxima must be identical to the whole-table
    // sketch, so estimates computed from merged partial sketches match
    // a from-scratch pass exactly.
    import org.apache.spark.sql.DataFrame
    val mix1 = s"event_id % ${Sketches.HllP} * ${Sketches.HllM1} % ${Sketches.HllP}"
    val mix2 = s"event_id % ${Sketches.HllP} * ${Sketches.HllM2} % ${Sketches.HllP}"
    def sketch(df: DataFrame) = df
      .selectExpr("event_type", s"$mix1 % ${Sketches.HllBuckets} AS bucket",
        s"${Sketches.rhoSql(mix2)} AS rho")
      .groupBy("event_type", "bucket").agg(max("rho").as("rho_max"))
    val ev = Tables.events(spark, Sf0001)
    val whole = sketch(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val merged = sketch(ev.where(col("event_id") % 2 === 0))
      .union(sketch(ev.where(col("event_id") % 2 === 1)))
      .groupBy("event_type", "bucket").agg(max("rho_max").as("rho_max"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(whole.nonEmpty)
    assert(merged === whole)
  }

  test("redaction strips every digit it counts from sensitive columns") {
    val rows = ChangeFeed.cdcRedact(spark, Sf0001).collect()
    val nonDel = rows.filter(_.getAs[String]("kind") != "delete")
    assert(nonDel.nonEmpty)
    nonDel.foreach { r =>
      val parts = r.getAs[String]("vals_redacted").split('|')
      if (r.getAs[Long]("idx") == 1L) {
        // balance statement: user_id|balance_cents — balance masked
        assert(parts.length === 2)
        assert(!parts(1).exists(_.isDigit))
        assert(parts(1).count(_ == '#').toLong === r.getAs[Long]("n_redacted"))
        assert(parts(0).forall(_.isDigit)) // key field forwarded untouched
      } else {
        // layout: event_id|user_id|event_type|value_cents|k — last two masked
        assert(parts.length === 5)
        assert(!parts(3).exists(_.isDigit) && !parts(4).exists(_.isDigit))
        val masked = parts(3).count(_ == '#') + parts(4).count(_ == '#')
        assert(masked.toLong === r.getAs[Long]("n_redacted"))
        // key/type fields are forwarded untouched
        assert(parts(0).forall(_.isDigit) && parts(1).forall(_.isDigit))
      }
    }
    rows.filter(_.getAs[String]("kind") == "delete").foreach { r =>
      assert(r.getAs[String]("vals_redacted") === "")
      assert(r.getAs[Long]("n_redacted") === 0L)
    }
  }
}
