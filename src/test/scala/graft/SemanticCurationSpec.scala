package graft

import graft.ops.Similarity

/** Pins the round-8 embedding-curation trio against each other and
  * against the rest of the similarity family — cross-detector agreement
  * the per-operator oracles cannot see:
  *   - dedup_semantic's keeper rule (dup_of < vec_id, τ respected) and
  *     score agreement with embed_cosine_dup on every pair both
  *     detectors surface (same τ, same cosine — a score mismatch means
  *     the cell-scoped and LSH-scoped scans diverged);
  *   - embed_prune's cut arithmetic (n_pruned = n·PruneNum div PruneDen)
  *     and boundary ordering (last pruned >= first kept, per cell);
  *   - ann_hard_neg_shortlist's exact side ≡ ann_hard_negatives' negative
  *     columns row-for-row (shared acceptance baseline), and its agree
  *     flag true exactly when mined == exact. */
class SemanticCurationSpec extends SparkSpec {

  test("dedup_semantic respects keeper rule, τ, and agrees with embed_cosine_dup scores") {
    val sem = Similarity.dedupSemantic(spark, Sf0001)
      .select("vec_id", "dup_of", "cos_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sem.nonEmpty, "dedup_semantic found nothing on the test corpus")
    sem.foreach { case (vid, keeper, cos) =>
      assert(keeper < vid, s"keeper $keeper not smaller than dropped $vid")
      assert(cos >= Similarity.DupThresholdE6, s"pair ($keeper,$vid) below τ: $cos")
    }
    // the expanded member-level report (row 180): the agreement check is
    // about per-PAIR scores, which the rep-level default carries only at
    // distinct-content granularity
    val lsh = Similarity.embedCosineDupPairsFull(spark, Sf0001)
      .select("aid", "bid", "cos_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val shared = sem.filter { case (vid, keeper, _) => lsh.contains((keeper, vid)) }
    assert(shared.nonEmpty, "no pair surfaced by both detectors — τ families diverged")
    shared.foreach { case (vid, keeper, cos) =>
      assert(lsh((keeper, vid)) === cos,
        s"cell-scoped and LSH-scoped cosine disagree on ($keeper,$vid)")
    }
  }

  test("embed_prune cut arithmetic and boundary ordering hold per cell") {
    val rows = Similarity.embedPrune(spark, Sf0001).collect()
    assert(rows.nonEmpty, "embed_prune returned no cells")
    rows.foreach { r =>
      val (n, pruned) = (r.getAs[Long]("n_members"), r.getAs[Long]("n_pruned"))
      assert(pruned === n * Similarity.PruneNum / Similarity.PruneDen,
        s"cell ${r.getAs[Long]("cell")}: n_pruned $pruned != $n div ${Similarity.PruneDen}")
      if (pruned > 0 && pruned < n)
        assert(r.getAs[Long]("cut_cos_e6") >= r.getAs[Long]("keep_max_cos_e6"),
          s"cell ${r.getAs[Long]("cell")}: prune boundary out of order")
    }
  }

  test("shortlist mining's exact side matches ann_hard_negatives; agree flag is honest") {
    val exact = Similarity.annHardNegatives(spark, Sf0001)
      .select("qid", "neg_id", "neg_cos_e6").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sl = Similarity.annHardNegShortlist(spark, Sf0001).collect()
    assert(sl.length === exact.size, "query coverage differs between passes")
    sl.foreach { r =>
      val qid = r.getAs[Long]("qid")
      assert((r.getAs[Long]("exact_neg_id"), r.getAs[Long]("exact_neg_cos_e6")) === exact(qid),
        s"query $qid: certification baseline diverged from ann_hard_negatives")
      val agreeBit = !r.isNullAt(r.fieldIndex("neg_id")) &&
        r.getAs[Long]("neg_id") == r.getAs[Long]("exact_neg_id")
      assert(r.getAs[Long]("agree") === (if (agreeBit) 1L else 0L),
        s"query $qid: agree flag inconsistent with ids")
    }
  }
}
