package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** NN-Descent structural pins (row 214):
  *
  *  - bounded degree: every node keeps ≤ NndL out-edges in both the seed
  *    and the refined graph (the linear-per-round property the 100 TB
  *    argument rests on);
  *  - dominance: the refined neighbor list is pointwise ≥ the seed list
  *    in cosine when both are sorted descending — guaranteed because the
  *    refinement's candidate set contains every seed edge, so the top-L
  *    cut can only improve. A refinement that LOST a better neighbor
  *    would violate this immediately;
  *  - improvement is real on the fixture: at least one node's refined
  *    list strictly improves over its seed list (the 2-hop closure found
  *    a neighbor the cell cohort missed) — guards against a rewrite that
  *    accidentally short-circuits the NN-descent round into a no-op.
  */
class NndSpec extends SparkSpec {

  private lazy val seed =
    Similarity.nndSeedProbe(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
  private lazy val refined =
    Similarity.nndGraphProbe(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("bounded degree in seed and refined graphs") {
    assert(seed.nonEmpty && refined.nonEmpty)
    val seedDeg = seed.groupBy(_._1).view.mapValues(_.length)
    val refDeg = refined.groupBy(_._1).view.mapValues(_.length)
    assert(seedDeg.values.forall(_ <= Similarity.NndL),
      "seed graph degree exceeded NndL")
    assert(refDeg.values.forall(_ <= Similarity.NndL),
      "refined graph degree exceeded NndL")
  }

  test("refined list pointwise dominates the seed list; some node improves") {
    val bySrcSeed = seed.groupBy(_._1).view
      .mapValues(_.map(_._3).toSeq.sorted(Ordering[Double].reverse)).toMap
    val bySrcRef = refined.groupBy(_._1).view
      .mapValues(_.map(_._3).toSeq.sorted(Ordering[Double].reverse)).toMap
    var improved = 0
    bySrcSeed.foreach { case (src, sCos) =>
      val rCos = bySrcRef.getOrElse(src, Seq.empty[Double])
      // every seeded node survives refinement (its seed edges are
      // candidates), with at least as many neighbors
      assert(rCos.size >= sCos.size, s"node $src lost neighbors: " +
        s"${rCos.size} < ${sCos.size}")
      sCos.zip(rCos).foreach { case (s, r) =>
        assert(r >= s, s"node $src: refined cosine $r below seed $s")
        if (r > s) improved += 1
      }
    }
    assert(improved > 0,
      "refinement was a no-op on the fixture: no node improved")
  }
}
