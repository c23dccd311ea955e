package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Flat→hierarchical IVF routing switch (round-10 verdict #6): the one
  * cell-assignment frame every IVF consumer reads delegates to the
  * two-level router above Knobs.ivfRouteHierCells. This spec pins (a)
  * that every gate corpus resolves FLAT (so the switch cannot silently
  * change the byte-stable gate artifacts), (b) the mode is a visible
  * knob_report row, and (c) the two modes' rank-1 assignments cover the
  * same vectors with bounded disagreement. The modes are NOT
  * bit-identical — single-super routing is a documented approximation
  * (measured 77% rank-1 agreement at the 8-cell/3-super floor, priced
  * at scale by ann_ivf_hier_recall against exact truth). The
  * CORRECTNESS certification of the switch is therefore not this
  * agreement number but the forced-mode oracle gate: with
  * GRAFT_IVF_ROUTE_CELLS at/below the corpus cells, BOTH the Spark
  * plans and the generated oracle SQL resolve hierarchical, and all 14
  * IVF-family queries must stay hash-green (run + recorded in
  * EXPLAIN_AUDIT each round the switch logic changes). */
class IvfRouteSwitchSpec extends SparkSpec {

  test("gate corpora resolve flat and the mode is a knob_report row") {
    Knobs.noteDir(Sf0001)
    assert(!Knobs.ivfRouteHier, "test corpora must stay below the route knee")
    val row = Knobs.knobReport(spark, Sf0001)
      .where(col("knob") === "ivf_route_hier").collect()
    assert(row.length == 1 && row(0).getLong(1) == 0L)
  }

  test("both modes assign every vector, with bounded routing divergence") {
    def r1(df: org.apache.spark.sql.DataFrame, cellCol: String): Map[Long, Long] =
      df.where(col("rnk") === 1)
        .select(col("avid"), col(cellCol))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flat = r1(Similarity.flatAssignmentsProbe(spark, Sf0001), "seed_id")
    val hier = r1(Similarity.hierAssignmentsProbe(spark, Sf0001), "cell")
    // no vector may vanish or duplicate across the switch (the silent
    // failure mode of a memberless-super route)
    assert(flat.keySet === hier.keySet, "both modes must assign every vector")
    // hier may only assign REAL cells (a subset of the flat target set)
    assert(hier.values.toSet.subsetOf(flat.values.toSet))
    // routing divergence is bounded: the 8-cell/3-super floor measures
    // ~77% agreement; a drop below 70% means the router broke, not that
    // the corpus drifted
    val agree = flat.count { case (k, v) => hier(k) == v }
    assert(agree * 10 >= flat.size * 7,
      s"rank-1 agreement $agree/${flat.size} fell below 70%")
  }
}
