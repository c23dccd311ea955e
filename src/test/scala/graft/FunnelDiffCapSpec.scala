package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Clean, Pipeline}
import graft.relational.Queries

/** Semantics the row-hash oracle states but doesn't explain: the funnel's
  * strict ordering, corpus_diff's key-space-derived expected counts, and
  * source_cap's equivalence between the salted two-phase plan and the
  * naive one-window-per-source formulation it replaces at scale. */
class FunnelDiffCapSpec extends SparkSpec {

  test("events_funnel: monotone counts and strict step ordering") {
    val rows = Queries.eventsFunnel(spark, Sf0001).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val ns = rows.map(_.getLong(2))
    assert(ns.sliding(2).forall { case Array(a, b) => b <= a }, s"non-monotone: ${ns.toSeq}")

    // independent recomputation of step 2: users with a click STRICTLY
    // after their first view (driven per-user, not via the operator's plan)
    val ev = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val firstView = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val step2 = firstView.filter { case (u, t1) =>
      ev.exists(e => e._1 == u && e._2 == "click" && e._3 > t1)
    }
    assert(ns(0) === firstView.size.toLong)
    assert(ns(1) === step2.size.toLong)

    // a user whose only clicks precede their first view must NOT convert:
    // strictness means step2 <= users-with-both, with equality only if
    // every such user clicked after viewing
    val withBoth = firstView.keySet.intersect(
      ev.filter(_._2 == "click").map(_._1).toSet)
    assert(step2.size <= withBoth.size)
  }

  test("corpus_diff: ledger matches the key-space expectation exactly") {
    val m = Clean.DiffMod
    val expected = Tables.documents(spark, Sf0001)
      .groupBy("source")
      .agg(
        sum(when(col("doc_id") % m === 7, 1L).otherwise(0L)).as("e_added"),
        sum(when(col("doc_id") % m === 3, 1L).otherwise(0L)).as("e_removed"),
        sum(when(col("doc_id") % m === 5, 1L).otherwise(0L)).as("e_changed"),
        sum(when(col("doc_id") % m =!= 3 && col("doc_id") % m =!= 5, 1L)
          .otherwise(0L)).as("e_same"))
    val got = Clean.corpusDiff(spark, Sf0001)
    val joined = got.join(expected, "source").collect()
    assert(joined.length > 0)
    joined.foreach { r =>
      assert(r.getLong(1) === r.getLong(5), s"${r.getString(0)} added")
      assert(r.getLong(2) === r.getLong(6), s"${r.getString(0)} removed")
      assert(r.getLong(3) === r.getLong(7), s"${r.getString(0)} changed")
      assert(r.getLong(4) === r.getLong(8), s"${r.getString(0)} same")
    }
  }

  test("source_cap: salted two-phase selection ≡ naive per-source window") {
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("source"),
        graft.ops.TextStats.fingerprint(col("text")).as("fp"))
    val naive = docs
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("fp", "doc_id")))
      .where(col("rn") <= Pipeline.CapK)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept_naive"), sum("fp").as("fp_sum_naive"))
    val got = Pipeline.sourceCap(spark, Sf0001)
    val joined = got.join(naive, "source").collect()
    assert(joined.length > 0)
    joined.foreach { r =>
      val (nDocs, nKept) = (r.getLong(1), r.getLong(2))
      assert(nKept === math.min(Pipeline.CapK.toLong, nDocs))
      assert(nKept === r.getLong(6), s"${r.getString(0)}: kept count differs")
      assert(r.getLong(4) === r.getLong(7), s"${r.getString(0)}: kept SET differs")
    }
  }
}
