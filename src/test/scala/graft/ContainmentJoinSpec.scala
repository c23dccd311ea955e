package graft

import org.apache.spark.sql.functions._
import graft.ops.SetJoin

/** Pins the probe-prefix containment join's defining claim: the ordered
  * pair set equals a brute-force shared-shingle join at C(a→b) ≥ τc —
  * no recall hole from pruning the probe side to its df-prefix, no
  * direction mix-up in the representative expansion. */
class ContainmentJoinSpec extends SparkSpec {

  /** Brute-force truth: every ORDERED pair sharing ≥1 trigram, exact
    * |A∩B|/|A|. */
  private def bruteForce(dir: String) = {
    val sets = SetJoin.triSets(spark, dir)
      .select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("sz"))
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("s"))
    ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .join(sets.select(col("doc_id"), col("sh").as("sh_a"), col("sz").as("sz_a")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sets.select(col("doc_id"), col("sh").as("sh_b")),
        col("doc_b") === col("doc_id"))
      .withColumn("isz", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("containment_e4",
        floor(lit(10000.0) * col("isz") / col("sz_a")).cast("long"))
      .where(col("containment_e4") >= SetJoin.TauCE4)
      .select("doc_a", "doc_b", "containment_e4")
  }

  test("expanded variant equals ordered brute force at sf0.001") {
    val got = SetJoin.containmentJoinPairsFull(spark, Sf0001).collect().map(_.toSeq).toSet
    val want = bruteForce(Sf0001).collect().map(_.toSeq).toSet
    assert(got === want)
    assert(want.nonEmpty, "test corpus has no contained pairs — spec is vacuous")
  }

  test("rep-level default: sum of n_pairs equals the expanded row count") {
    val rep = SetJoin.containmentJoin(spark, Sf0001).collect()
    val full = SetJoin.containmentJoinPairsFull(spark, Sf0001).count()
    assert(rep.map(_.getAs[Long]("n_pairs")).sum === full)
  }

  test("containment is asymmetric and the symmetric subset matches Jaccard=1 groups") {
    val rows = SetJoin.containmentJoinPairsFull(spark, Sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows.keys.forall { case (a, b) => a != b }, "self-pair emitted")
    // C(a→b) = C(b→a) = 1 ⟺ identical sets ⟹ the Jaccard join sees them too
    val mutualFull = rows.collect {
      case ((a, b), c) if c == 10000L && rows.get((b, a)).contains(10000L) && a < b => (a, b)
    }.toSet
    val jac1 = SetJoin.jaccardPrefixPairsFull(spark, Sf0001).collect()
      .filter(_.getLong(2) == 10000L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mutualFull === jac1)
  }
}
