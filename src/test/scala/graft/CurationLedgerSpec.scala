package graft

import graft.ops.{Clean, Dedup, Ngrams, Pipeline}
import org.apache.spark.sql.functions._

/** Conservation and ordering invariants for the round-8 planner/ledger
  * operators — properties the per-operator oracles check only at one
  * data point, pinned here as algebraic facts:
  *   - token_budget_plan's allocation sums EXACTLY to the budget (the
  *     whole point of largest-remainder over floor quotas);
  *   - segment_keep_k conserves segment/token mass against the shared
  *     segment frame and never keeps more than K per group;
  *   - ngram_coverage_curve is monotone and terminates at 10000 ticks,
  *     with type counts summing to the distinct-token count;
  *   - curriculum_plan covers every document once with ordered,
  *     non-overlapping stage boundaries;
  *   - pii_audit's per-source sums equal pii_scrub's per-doc ledger;
  *   - dup_pagerank scores never fall below the teleport floor. */
class CurationLedgerSpec extends SparkSpec {

  test("token_budget_plan allocations sum exactly to the budget") {
    val rows = Pipeline.tokenBudgetPlan(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("alloc_tokens")).sum
    assert(total === Pipeline.TokenBudget,
      s"largest-remainder apportionment missed the budget: $total")
  }

  test("segment_keep_k conserves mass and respects the K cap") {
    val rows = Clean.segmentKeepK(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, g) = (r.getAs[Long]("n_copies"), r.getAs[Long]("n_groups"))
      val (kept, dropped) = (r.getAs[Long]("n_kept_segs"), r.getAs[Long]("n_dropped_segs"))
      assert(kept + dropped === n * g, "segment mass not conserved")
      assert(kept <= Clean.KeepK * g, "cap exceeded")
      assert(kept === g * math.min(n, Clean.KeepK), "keep rule wrong")
    }
    val totalSegs = rows.map(r => r.getAs[Long]("n_copies") * r.getAs[Long]("n_groups")).sum
    val expected = Clean.segmentDedup(spark, Sf0001)
      .agg(sum("n_segs")).head.getLong(0)
    assert(totalSegs === expected, "ledger does not cover the segment frame")
  }

  test("ngram_coverage_curve is monotone and complete") {
    val rows = Ngrams.ngramCoverageCurve(spark, Sf0001).collect()
    assert(rows.length >= 2)
    val cov = rows.map(_.getAs[Long]("coverage_e4"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b }, "coverage not monotone")
    assert(cov.last === 10000L, s"curve does not terminate at full coverage: ${cov.last}")
    val types = rows.map(_.getAs[Long]("n_types")).sum
    val distinctToks = Tables.documents(spark, Sf0001)
      .select(explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .agg(countDistinct("tok")).head.getLong(0)
    assert(types === distinctToks, "bucket type counts miss tokens")
  }

  test("curriculum_plan stages cover the corpus with ordered boundaries") {
    val rows = Pipeline.curriculumPlan(spark, Sf0001).collect().sortBy(_.getAs[Long]("stage"))
    val nDocs = Tables.documents(spark, Sf0001).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("max_tokens") <= b.getAs[Long]("min_tokens"),
        s"stage ${a.getAs[Long]("stage")} overlaps ${b.getAs[Long]("stage")}")
    }
  }

  test("pii_audit totals equal the pii_scrub per-doc ledger") {
    val fromAudit = Clean.piiAudit(spark, Sf0001)
      .agg(sum("n_emails"), sum("n_phones"), sum("n_num_runs"), sum("chars_removed"))
      .head
    val fromScrub = Clean.piiScrub(spark, Sf0001)
      .agg(sum("n_emails"), sum("n_phones"), sum("n_num_runs"),
        sum(col("orig_len") - col("scrub_len")))
      .head
    (0 until 4).foreach { i =>
      assert(fromAudit.getLong(i) === fromScrub.getLong(i), s"column $i diverged")
    }
  }

  test("dup_pagerank scores never fall below the teleport floor") {
    val rows = Dedup.dupPagerank(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("pr_e6") >= Dedup.PrTeleportE6,
        s"doc ${r.getAs[Long]("doc_id")} below teleport floor")
    }
  }
}
