package graft

import graft.functions.HashExprs
import graft.ops.{Dedup, TextStats}
import org.apache.spark.sql.functions._

/** Winnowed fingerprinting (Schleimer et al. 2003) and the canonical-pick
  * rewrite plan.
  *
  * 1. The one-pass rolling WinnowHashExpr is pinned against a brute-force
  *    per-position recompute (rehash every K-gram from scratch, slice
  *    windows, take minima) across the edge lengths: below K, exactly K,
  *    fewer grams than W, exactly W grams, and long random ASCII.
  * 2. winnow_overlap is pinned row-for-row against a plain-Scala
  *    reference computed from the per-doc fingerprint sets (rep grouping,
  *    df cap, pair counting, coverage arithmetic).
  * 3. dedup_canonical invariants against the converged cluster labels:
  *    the keeper is a member with maximal n_chars (min doc_id tiebreak)
  *    and the drop accounting sums exactly.
  */
class WinnowSpec extends SparkSpec {

  private val P = TextStats.FpMod
  private val Prime = TextStats.FpPrime
  private val K = Dedup.WinnowK
  private val W = Dedup.WinnowW

  private def winnowRef(text: String): Seq[Long] = {
    val bytes = text.getBytes("UTF-8")
    val nh = bytes.length - K + 1
    if (nh <= 0) return Seq.empty
    val hs = (0 until nh).map { i =>
      var h = 0L
      var j = 0
      while (j < K) { h = (h * Prime + (bytes(i + j) & 0xff)) % P; j += 1 }
      h
    }
    val win = math.min(W, nh)
    hs.sliding(win).map(_.min).toSeq.distinct.sorted
  }

  test("winnow_fingerprints matches the brute-force recompute on edge lengths") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(42)
    def rand(n: Int) =
      (0 until n).map(_ => (32 + rng.nextInt(95)).toChar).mkString
    val texts = Seq(
      "", "short", "exactly8", "ninechars", // nh <= 0, 1, 2 grams
      "elevenchars", // nh = 4 = W exactly (len 11 → nh 4)
      "abcdabcdabcdabcd", // repeated grams → hash ties
      rand(K + W - 2), // one gram short of a full window
      rand(200), rand(1000))
    val got = texts.toDF("t")
      .select(HashExprs.winnowFingerprints(col("t"), K, W, Prime, P).as("f"))
      .collect().map(_.getSeq[Long](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g === winnowRef(t), s"text of length ${t.length}")
    }
  }

  test("winnow_overlap equals the plain-Scala reference at sf0.001") {
    val sets = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"),
        HashExprs.winnowFingerprints(col("text"), K, W, Prime, P).as("f"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector)
      .filter(_._2.nonEmpty)
    // rep grouping on the set value
    val groups = sets.groupBy(_._2).map { case (fps, ms) =>
      (ms.map(_._1).min, ms.length.toLong, fps)
    }.toSeq
    val df = groups.flatMap(g => g._3.map(f => (f, g._1)))
      .groupBy(_._1).map { case (f, rs) => f -> rs.length.toLong }
    val retained = groups.map { g =>
      g._1 -> g._3.filter(f => df(f) <= Dedup.WinnowMaxDf).toSet
    }.toMap
    val sizes = groups.map(g => g._1 -> g._2).toMap
    val reps = groups.map(_._1).sorted
    val expected = scala.collection.mutable.ArrayBuffer[
      (Long, Long, Long, Long, Long, Long, Long)]()
    for (a <- reps; b <- reps if a < b) {
      val shared = (retained(a) & retained(b)).size.toLong
      if (shared >= Dedup.WinnowMinShared) {
        val cov = math.floor(10000.0 * shared /
          math.min(retained(a).size, retained(b).size)).toLong
        if (cov >= Dedup.WinnowMinCovE4)
          expected += ((a, b, shared, cov, sizes(a), sizes(b),
            sizes(a) * sizes(b)))
      }
    }
    for (a <- reps if sizes(a) > 1 && retained(a).size >= Dedup.WinnowMinShared)
      expected += ((a, a, retained(a).size.toLong, 10000L, sizes(a), sizes(a),
        sizes(a) * (sizes(a) - 1) / 2))
    val want = expected.sortBy(t => (t._1, t._2)).toSeq
    val got = Dedup.winnowOverlap(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === want)
    assert(got.nonEmpty, "sf0.001 should produce at least one overlap pair")
  }

  test("dedup_canonical keeps the longest member and accounts for the rest") {
    val labels = Dedup.dedupClusters(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val chars = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = labels.groupBy(_._2).map { case (cid, ms) =>
      val members = ms.map(_._1)
      val keep = members.minBy(d => (-chars(d), d))
      (cid, keep, members.length.toLong, members.length.toLong - 1,
        members.filterNot(_ == keep).map(chars).sum)
    }.toSeq.sortBy(_._1)
    val got = Dedup.dedupCanonical(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }
}
