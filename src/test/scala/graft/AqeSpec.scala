package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Runtime re-planning proofs: the 100 TB story leans on AQE twice —
  * coalescing the fixed shuffle-partition count down to the data's actual
  * volume (so a 32-partition config doesn't mean 32 tiny tasks per tiny
  * stage), and converting a planned sort-merge join to broadcast when the
  * build side's RUNTIME size (unknowable at planning time behind an
  * aggregation) turns out small. Both must be observed in the executed
  * plan, not assumed from config. */
class AqeSpec extends SparkSpec {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    val plan = finalPlan(
      Tables.documents(spark, Sf0001).groupBy("source").count())
    assert(plan.contains("AQEShuffleRead"), plan.take(600))
    assert(plan.contains("coalesced"), plan.take(600))
  }

  test("AQE converts a planned shuffle join to broadcast on runtime stats") {
    // the build side is an aggregation output — its size is unknown until
    // runtime, so only AQE (not the static planner) can pick broadcast
    val smallAgg = Tables.documents(spark, Sf0001)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val joined = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("source"))
      .join(smallAgg, "source")
    val plan = finalPlan(joined)
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }
}
