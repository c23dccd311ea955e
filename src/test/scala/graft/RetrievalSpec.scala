package graft

import org.apache.spark.sql.functions._
import graft.ops.{Ngrams, Retrieval, Similarity}

/** Pins the round-8 retrieval/tokenizer operators against independent
  * in-memory recomputations (the oracle proves Spark ≡ DuckDB; these
  * prove both ≡ the published algorithm on real data):
  *
  *   - bpe_merges vs a direct canonical greedy left-to-right BPE trainer
  *     over the collected vocabulary — this is the spec that would catch
  *     a divergence in the two-pass replace() rewrite trick (shared-
  *     delimiter adjacency, "a b a b" chains) that the engine relies on;
  *   - retrieval_rrf vs a recomputed reciprocal-rank fusion of the two
  *     collected source lists;
  *   - bm25_topk structural invariants (no self-retrieval, contiguous
  *     ranks, positive scores).
  */
class RetrievalSpec extends SparkSpec {

  /** Numeric accessor tolerant of int vs long columns (row_number emits
    * IntegerType; ids and scores are LongType). */
  private def num(r: org.apache.spark.sql.Row, i: Int): Long =
    r.get(i).asInstanceOf[Number].longValue

  // ---- canonical BPE reference trainer ------------------------------------

  /** Straightforward Sennrich-style trainer: count adjacent symbol pairs
    * weighted by word frequency (self-pairs excluded, the operator
    * contract), pick (max freq, lexicographically smallest pair), merge
    * every occurrence greedily left-to-right. No string replace tricks —
    * an explicit symbol-walk, so it cannot share a bug with the engine's
    * delimiter-based rewrite. */
  private def canonicalMerges(
      words: Seq[(String, Long)], rounds: Int): Seq[(String, String, Long)] = {
    var ws = words.map { case (w, n) => (w.map(_.toString).toVector, n) }
    (1 to rounds).map { _ =>
      val freq = scala.collection.mutable.Map[(String, String), Long]()
      for {
        (syms, n) <- ws
        i <- 0 until syms.length - 1
        if syms(i) != syms(i + 1)
      } freq((syms(i), syms(i + 1))) =
        freq.getOrElse((syms(i), syms(i + 1)), 0L) + n
      val ((a, b), f) = freq.toSeq
        .minBy { case ((x, y), c) => (-c, x + " " + y) }
      ws = ws.map { case (syms, n) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toVector, n)
      }
      (s"$a $b", a + b, f)
    }
  }

  test("bpe_merges equals a canonical greedy BPE trainer on sf0.001") {
    val engine = Ngrams.bpeMerges(spark, Sf0001)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val vocab = Ngrams.tokenCounts(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = canonicalMerges(vocab, Ngrams.BpeRounds)
    assert(engine === expected)
  }

  test("canonical reference resolves the adjacent-chain case correctly") {
    // "ababab" has three (a, b) merge sites in a chain — the case where
    // the engine's single-pass replace would miss alternating sites and
    // the two-pass contract must not. Round 1 merges all three (freq
    // 3·10 + 5 = 35); round 2 then sees ONLY (ab ab ab)'s self-pairs
    // (excluded) and "ba"'s (b, a) — so the round-2 winner being
    // ("b a", 1) proves every chain site merged in round 1.
    val words = Seq(("ababab", 10L), ("ab", 5L), ("ba", 1L))
    val expected = canonicalMerges(words, 2)
    assert(expected === Seq(("a b", "ab", 35L), ("b a", "ba", 1L)))
  }

  // ---- RRF fusion ----------------------------------------------------------

  test("retrieval_rrf equals recomputed fusion of its two source lists") {
    val ann = Similarity.annTopk(spark, Sf0001)
      .select("qid", "cid", "rnk").collect()
      .map(r => (num(r, 0), num(r, 1), num(r, 2)))
    val bm = Retrieval.bm25Topk(spark, Sf0001)
      .select("qid", "doc_id", "rnk").collect()
      .map(r => (num(r, 0), num(r, 1), num(r, 2)))
    val contribs = (ann ++ bm).map { case (q, id, r) =>
      ((q, id), 1000000L / (Retrieval.RrfC + r))
    }
    val fused = contribs.groupBy(_._1).map { case ((q, id), cs) =>
      (q, id, cs.map(_._2).sum, cs.size.toLong)
    }.toSeq
    val expected = fused.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy { case (_, id, s, _) => (-s, id) }
        .zipWithIndex.filter(_._2 < Retrieval.FuseTopK)
        .map { case ((q, id, s, nl), i) => (q, i + 1L, id, s, nl) }
    }.toSet
    val got = Retrieval.retrievalRrf(spark, Sf0001)
      .collect()
      .map(r => (num(r, 0), num(r, 1), num(r, 2), num(r, 3), num(r, 4)))
      .toSet
    assert(got === expected)
  }

  // ---- BM25 structural invariants ------------------------------------------

  test("bm25_topk never retrieves the query doc, ranks contiguously, scores positive") {
    val rows = Retrieval.bm25Topk(spark, Sf0001).collect()
      .map(r => (num(r, 0), num(r, 1), num(r, 2), num(r, 3)))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, _, docId, score) =>
      assert(docId !== qid, s"query $qid retrieved itself")
      assert(score > 0L, s"non-positive score for ($qid, $docId)")
    }
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks === (1L to ranks.length).toSeq, s"ranks not contiguous for $qid")
    }
  }
}
