package graft

import org.apache.spark.sql.functions._

/** Global total order at scale: `repartitionByRange + sortWithinPartitions`
  * is THE way to write a globally sorted 100 TB output — a range exchange
  * samples the key distribution and gives every task a disjoint key slice,
  * where a naive `orderBy` into one output would funnel everything through
  * a single reducer. The proof is three-part: the plan carries a
  * rangepartitioning exchange (and no SinglePartition collapse), every
  * partition is internally sorted, and the partitions' [min, max] key
  * spans are pairwise disjoint and ordered — so concatenating partition
  * files 0..N-1 IS the global sort, no merge step needed. */
class RangeSortSpec extends SparkSpec {

  private lazy val sorted = Tables.documents(spark, Sf0001)
    .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
    .repartitionByRange(8, col("n_chars"), col("doc_id"))
    .sortWithinPartitions("n_chars", "doc_id")

  test("plan shows a range exchange, not a single-partition sort") {
    val plan = sorted.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan.take(400))
    assert(!plan.contains("SinglePartition"), plan.take(400))
  }

  test("every partition is internally sorted on the range key") {
    val unsortedParts = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val keys = it.map(r => (r.getLong(1), r.getLong(0))).toSeq
      if (keys == keys.sorted) Iterator.empty else Iterator.single(pid)
    }.collect()
    assert(unsortedParts.isEmpty, s"unsorted partitions: ${unsortedParts.toSeq}")
  }

  test("partition key spans are disjoint and ordered — concatenation is the global sort") {
    val bounds = sorted
      .select(spark_partition_id().as("pid"), col("n_chars"), col("doc_id"))
      .groupBy("pid")
      .agg(min(struct(col("n_chars"), col("doc_id"))).as("mn"),
        max(struct(col("n_chars"), col("doc_id"))).as("mx"),
        count(lit(1)).as("n"))
      .orderBy("pid")
      .collect()
      .map { r =>
        val mn = r.getStruct(1); val mx = r.getStruct(2)
        (r.getInt(0), (mn.getLong(0), mn.getLong(1)), (mx.getLong(0), mx.getLong(1)), r.getLong(3))
      }
    assert(bounds.map(_._4).sum === Tables.documents(spark, Sf0001).count())
    assert(bounds.length > 1, "range exchange degenerated to one partition")
    bounds.foreach { case (pid, mn, mx, _) =>
      assert(Ordering[(Long, Long)].lteq(mn, mx), s"p$pid inverted")
    }
    bounds.sliding(2).foreach {
      case Array((p1, _, mx1, _), (p2, mn2, _, _)) =>
        assert(Ordering[(Long, Long)].lt(mx1, mn2),
          s"p$p1 max $mx1 overlaps p$p2 min $mn2")
      case _ =>
    }
  }
}
