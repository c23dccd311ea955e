package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.relational.Queries

/** events_rollup (SURVEY §2 row 185) and embed_trunc_audit (row 186):
  * the algebraic invariants each level of the rollup lattice and each
  * truncation depth must satisfy — properties the oracle hash can agree
  * with but cannot by itself explain. */
class RollupTruncSpec extends SparkSpec {

  test("rollup levels reconcile: leaf sums equal subtotals equal grand total") {
    val rows = Queries.eventsRollup(spark, Sf0001).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 3L)) // (type,dow), (type), ()
    val grand = byGid(3L)
    assert(grand.length == 1)
    assert(grand.head.getAs[String]("event_type") == "ALL")
    assert(grand.head.getAs[Long]("dow") == -1L)
    // events / cents are additive up the lattice; distinct users are NOT
    // (a user can act in several dows), only bounded by the level above.
    def sumBy(gid: Long, c: String) = byGid(gid).map(_.getAs[Long](c)).sum
    assert(sumBy(0L, "n_events") == grand.head.getAs[Long]("n_events"))
    assert(sumBy(1L, "n_events") == grand.head.getAs[Long]("n_events"))
    assert(sumBy(0L, "sum_cents") == grand.head.getAs[Long]("sum_cents"))
    val leafUsersByType = byGid(0L).groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(_.getAs[Long]("n_users")).sum).toMap
    byGid(1L).foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("dow") == -1L)
      assert(r.getAs[Long]("n_users") <= leafUsersByType(t))
      assert(r.getAs[Long]("n_users") >= byGid(0L)
        .filter(_.getAs[String]("event_type") == t)
        .map(_.getAs[Long]("n_users")).max)
    }
  }

  test("truncation audit: energy is monotone in depth and exact at full width") {
    val rows = Similarity.embedTruncAudit(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("trunc_dim")).toSeq ==
      Similarity.TruncDims.map(_.toLong))
    val energies = rows.map(_.getAs[Long]("mean_energy_e6")).toSeq
    assert(energies == energies.sorted,
      s"captured energy must be non-decreasing in depth: $energies")
    val full = rows.last
    // at d = 64 the prefix IS the vector: all energy captured, zero
    // cosine distortion on every chain pair
    assert(full.getAs[Long]("mean_energy_e6") == 1000000L)
    assert(full.getAs[Long]("mean_abs_delta_e6") == 0L)
    assert(full.getAs[Long]("max_abs_delta_e6") == 0L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") > 0)
      assert(r.getAs[Long]("n_pairs") > 0)
      assert(r.getAs[Long]("mean_abs_delta_e6") <=
        r.getAs[Long]("max_abs_delta_e6"))
    }
  }

  test("decay score is bounded by full weight and zero beyond the shift horizon") {
    val rows = Queries.userDecayScore(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val s = r.getAs[Long]("decay_score")
      val age = r.getAs[Long]("last_age_days")
      assert(n > 0 && s >= 0 && age >= 0)
      // every event weighs at most 1e6 (age 0) and at least
      // 1e6 >> (last_age halved per 7-day half-life, capped)
      assert(s <= 1000000L * n)
      val minShift = math.min(age / Queries.DecayHalfLifeDays, 62L).toInt
      assert(s >= (1000000L >> minShift),
        s"freshest event (age $age d) must contribute its own weight: $s")
    }
  }
}
