package graft

import graft.cdc.SpecificFilter
import org.apache.spark.sql.functions._

/** eq/in predicate semantics, including the missing-column → no-match rule
  * (reference src/utils/specific_filter.rs:21-50). */
class SpecificFilterSpec extends SparkSpec {

  private def df = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Map("user_id" -> "7", "k" -> "42")),
      (2L, Map("user_id" -> "8")),
      (3L, Map("event_id" -> "3")) // delete-shaped: no user_id at all
    ).toDF("id", "cmap")
  }

  test("eq matches only the exact value") {
    val ids = df.where(SpecificFilter.eqFilter(col("cmap"), lit("user_id"), lit("7")))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L))
  }

  test("missing column never matches eq") {
    val ids = df.where(SpecificFilter.eqFilter(col("cmap"), lit("missing"), lit("7")))
      .count()
    assert(ids === 0L)
  }

  test("in matches any CSV member, missing column still excluded") {
    val ids = df.where(SpecificFilter.inFilter(col("cmap"), lit("user_id"), lit("7,8,9")))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L))
  }
}
