package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-subscription row predicates.
  *
  * The reference walks `columnnames` to locate the filter column, then
  * compares the value against a scalar (`eq`) or a set (`in`); a column
  * absent from the change never matches (reference
  * src/utils/specific_filter.rs:21-50). Here the per-message interpreter
  * loop becomes one Catalyst expression over the name→value map:
  * `try_element_at` yields NULL for a missing key and NULL comparisons are
  * filtered, reproducing the no-match semantics — and the whole predicate
  * stays inside whole-stage codegen.
  */
object SpecificFilter {

  /** col.eq.val — missing column ⇒ NULL ⇒ no match. */
  def eqFilter(cmap: Column, colName: Column, value: Column): Column =
    try_element_at(cmap, colName) === value

  /** col.in.v1,v2,... — CSV set, same missing-column semantics
    * (reference src/utils/specific_filter.rs:44-47). */
  def inFilter(cmap: Column, colName: Column, csv: Column): Column =
    array_contains(split(csv, ","), try_element_at(cmap, colName))

  // ---- queries ------------------------------------------------------------

  /** eq probe on user_id=7. Deletes expose no columns at all (empty
    * columnnames, mirroring wal2json oldkeys), so they are excluded by the
    * missing-column rule, not by an explicit kind test. */
  def filterEq(spark: SparkSession, dir: String): DataFrame = {
    val d = ChangeFeed.decodedWithMap(spark, dir)
    d.where(eqFilter(col("cmap"), lit("user_id"), lit("7")))
      .select(col("lsn"), col("kind"), col("tbl"))
      .orderBy("lsn")
  }

  /** in probe on k ∈ {10,20,30,42,77}. */
  def filterIn(spark: SparkSession, dir: String): DataFrame = {
    val d = ChangeFeed.decodedWithMap(spark, dir)
    d.where(inFilter(col("cmap"), lit("k"), lit("10,20,30,42,77")))
      .select(col("lsn"), try_element_at(col("cmap"), lit("k")).as("k"))
      .orderBy("lsn")
  }

  // ---- oracle -------------------------------------------------------------

  val filterEqSql: String =
    s"""WITH ${ChangeFeed.FeedCte}
       |SELECT lsn, kind, tbl FROM feed
       |WHERE kind <> 'delete' AND CAST(user_id AS VARCHAR) = '7'
       |ORDER BY lsn""".stripMargin

  val filterInSql: String =
    s"""WITH ${ChangeFeed.FeedCte}
       |SELECT lsn, k FROM feed
       |WHERE kind <> 'delete' AND k IN ('10','20','30','42','77')
       |ORDER BY lsn""".stripMargin
}
