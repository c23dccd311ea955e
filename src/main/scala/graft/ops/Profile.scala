package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Table introspection: the profiling / frontier passes a data engine runs
  * before trusting a new corpus drop (SURVEY.md §2 rows 194-195).
  *
  * Scale notes (100 TB): table_profile melts rows into (col, value)
  * pairs with Catalyst's Expand — ONE scan per table, one shuffle keyed
  * by column name whose reduce side holds at most |columns| groups
  * (distinct counts are partial-aggregated map-side); skyline_docs is a
  * single shuffle on source with two frames over one window sort — the
  * textbook O(n log n) windowed skyline, never the O(n²) NOT EXISTS. */
object Profile {

  // ---- table_profile: per-column null/distinct/min-max profile -----------

  /** One profile row per column of documents + events: row count, null
    * count, exact distinct count, lexicographic min/max — the schema
    * health check run on every new corpus snapshot.
    *
    * Every value crosses into ONE canonical string domain so the profile
    * is engine-portable: int64 as decimal digits, the event timestamp as
    * epoch-microsecond digits, money as integer cents (the corpus-wide
    * determinism contract), strings as-is. The melt is `stack` — a
    * single Expand over one scan, NOT a per-column pass: profiling 11
    * columns costs one read of each table plus a |columns|-key shuffle. */
  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    def melt(table: String, df: DataFrame, cols: Seq[(String, String)]): DataFrame = {
      val branches = cols
        .map { case (n, e) => s"'$n', CAST(($e) AS STRING)" }
        .mkString(", ")
      df.select(lit(table).as("table_name"),
        expr(s"stack(${cols.size}, $branches)").as(Seq("col_name", "value")))
    }
    val docs = melt("documents", Tables.documents(spark, dir), Seq(
      "doc_id" -> "doc_id", "lang" -> "lang", "n_chars" -> "n_chars",
      "source" -> "source", "text" -> "text"))
    val evs = melt("events", Tables.events(spark, dir), Seq(
      "event_id" -> "event_id", "event_type" -> "event_type",
      "props" -> "props", "ts_us" -> "ts div 1000",
      "user_id" -> "user_id", "value_cents" -> "CAST(round(value * 100) AS LONG)"))
    docs.unionByName(evs)
      .groupBy("table_name", "col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct("value").as("n_distinct"),
        min("value").as("min_val"),
        max("value").as("max_val"))
      .orderBy("table_name", "col_name")
  }

  val tableProfileSql: String = {
    def branch(table: String, colName: String, e: String): String =
      s"""SELECT '$table' AS table_name, '$colName' AS col_name,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(sum(CASE WHEN ($e) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |       CAST(count(DISTINCT ($e)) AS BIGINT) AS n_distinct,
         |       min(CAST(($e) AS VARCHAR)) AS min_val,
         |       max(CAST(($e) AS VARCHAR)) AS max_val
         |FROM $table""".stripMargin
    val docCols = Seq("doc_id" -> "doc_id", "lang" -> "lang",
      "n_chars" -> "n_chars", "source" -> "source", "text" -> "text")
    val evCols = Seq("event_id" -> "event_id", "event_type" -> "event_type",
      "props" -> "props", "ts_us" -> "epoch_us(ts)",
      "user_id" -> "user_id", "value_cents" -> "CAST(round(value * 100) AS BIGINT)")
    val branches =
      docCols.map { case (n, e) => branch("documents", n, e) } ++
        evCols.map { case (n, e) => branch("events", n, e) }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY table_name, col_name")
  }

  // ---- skyline_docs: per-source Pareto frontier ---------------------------

  /** The skyline operator (Börzsönyi et al. 2001) over (quality, length):
    * per source, the documents no other same-source document dominates —
    * dominated means the other is ≥ on both quality_e4 and n_chars and
    * strictly greater on at least one. The frontier is what a curation
    * pass inspects first: the best-available quality at every length.
    *
    * Windowed formulation, not NOT-EXISTS: after ONE sort per source the
    * two dominance cases are (a) some row with strictly higher quality
    * has chars ≥ mine — a running max over a value-range frame — and
    * (b) a same-quality row has chars > mine — a per-(source, quality)
    * max. O(n log n) per source, one shuffle total. */
  def skylineDocs(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        TextStats.qualityE4OfText(col("text")).as("quality_e4"))
    val higherQ = Window.partitionBy("source").orderBy("quality_e4")
      .rangeBetween(1L, Window.unboundedFollowing)
    val sameQ = Window.partitionBy("source", "quality_e4")
    scored
      .withColumn("max_chars_above", max("n_chars").over(higherQ))
      .withColumn("max_chars_same", max("n_chars").over(sameQ))
      .where((col("max_chars_above").isNull ||
          col("max_chars_above") < col("n_chars")) &&
        col("max_chars_same") === col("n_chars"))
      .select("source", "doc_id", "quality_e4", "n_chars")
      .orderBy("source", "doc_id")
  }

  val skylineDocsSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, source, n_chars, ${TextStats.qualityE4Sql("text")} AS quality_e4
       |  FROM documents),
       |w AS (
       |  SELECT source, doc_id, quality_e4, n_chars,
       |         max(n_chars) OVER (PARTITION BY source ORDER BY quality_e4
       |           RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
       |           AS max_chars_above,
       |         max(n_chars) OVER (PARTITION BY source, quality_e4)
       |           AS max_chars_same
       |  FROM scored)
       |SELECT source, doc_id, quality_e4, n_chars
       |FROM w
       |WHERE (max_chars_above IS NULL OR max_chars_above < n_chars)
       |  AND max_chars_same = n_chars
       |ORDER BY source, doc_id""".stripMargin
}
