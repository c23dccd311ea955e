package graft

import graft.ops.{Dedup, TextStats}

/** Sorted-neighborhood dedup (Hernández & Stolfo 1995) pinned row-for-row
  * against a plain-Scala reference at sf0.001: normalized-prefix sort
  * order, two-phase global rank, window-W neighbor pairing, exact
  * shingle-Jaccard verification at the family threshold.
  */
class SnmSpec extends SparkSpec {

  private val P = TextStats.FpMod
  private val Prime = TextStats.FpPrime

  private def strHash(s: String): Long = {
    var h = 0L
    s.getBytes("UTF-8").foreach(b => h = (h * Prime + (b & 0xff)) % P)
    h
  }

  test("dedup_snm equals the plain-Scala reference at sf0.001") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase))
    val domain = docs.map { case (id, n) => (id, n, n.split(" ", -1)) }
      .filter(_._3.length >= 2)
    val sh = domain.map { case (id, _, t) =>
      id -> (0 until t.length - 1).map(i => strHash(t(i) + " " + t(i + 1))).toSet
    }.toMap
    val ranked = domain.map { case (id, n, _) => (n.take(Dedup.SnmKeyLen), id) }
      .sorted.zipWithIndex.map { case ((_, id), i) => (id, i.toLong + 1) }
    val byRank = ranked.map(_.swap).toMap
    val expected = ranked.flatMap { case (a, r) =>
      (1L to Dedup.SnmWindow).flatMap { g =>
        byRank.get(r + g).flatMap { b =>
          val (sa, sb) = (sh(a), sh(b))
          val isz = (sa & sb).size.toLong
          val j = math.floor(10000.0 * isz / (sa.size + sb.size - isz)).toLong
          if (j >= Dedup.ClusterMinJaccardE4) Some((a, b, g, j)) else None
        }
      }
    }.sortBy(t => (t._1, t._2))
    val got = Dedup.dedupSnm(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "sf0.001 should produce at least one SNM pair")
  }
}
