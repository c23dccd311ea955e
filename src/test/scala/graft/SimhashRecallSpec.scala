package graft

import graft.ops.Dedup

/** The multi-probe banding's recall guarantee, checked against brute
  * force: every pair within Hamming distance MpMaxHamming must be found.
  * (The DuckDB oracle mirrors the banding itself, so it cannot catch a
  * recall gap — this spec can.) Also pins that the single-probe variant
  * is a subset of brute force (precision, trivially) and genuinely lossy
  * or equal on this data. */
class SimhashRecallSpec extends SparkSpec {

  test("multi-probe finds every pair within the guaranteed distance") {
    val fps = Dedup.dedupSimhash(spark, Sf0001)
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1))

    val brute = (for {
      (ida, sa) <- fps
      (idb, sb) <- fps
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= Dedup.MpMaxHamming
    } yield (ida, idb)).toSet

    // the expanded member-level report (row 182): the recall guarantee is
    // about every DOC pair, which the rep-level default carries only as
    // implied counts
    val found = Dedup.dedupSimhashMultiprobeFull(spark, Sf0001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(found === brute,
      s"multiprobe must equal brute force at distance <= ${Dedup.MpMaxHamming}: " +
        s"missing ${(brute -- found).take(5)}, extra ${(found -- brute).take(5)}")
  }
}
