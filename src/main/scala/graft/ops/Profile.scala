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
    * TWO-PHASE formulation: dominance over a 2-D set is fully decided by
    * the per-(source, quality) max-chars envelope, so the doc-level pass
    * is ONE map-side-combined aggregate onto the ≤ |sources|×|quality
    * values| envelope; the "max chars at strictly higher quality" suffix
    * max is a value-range window over THAT envelope frame — never over
    * the documents. A naive Window.partitionBy(source) serializes every
    * source through one task (measured: 22.9 s at the 100× point, ~10
    * sources × 600k docs each); here the only doc-scale operations are
    * a scan-side aggregate and a broadcast envelope join, both fully
    * parallel. Docs never shuffle at all. */
  def skylineDocs(spark: SparkSession, dir: String): DataFrame = {
    // memoized: the quality tokenization is the dominant cost and the
    // frame feeds BOTH the envelope aggregate and the probe side — an
    // unmaterialized DataFrame would re-tokenize all documents twice
    // (measured 15.2 s → 8.5 s at the 100× point)
    val scored = Tables.memoPersist(spark, s"profile.scored:$dir") {
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("n_chars"),
          TextStats.qualityE4OfText(col("text")).as("quality_e4"))
    }
    val envelope = scored.groupBy("source", "quality_e4")
      .agg(max("n_chars").as("max_chars_same"))
    val higherQ = Window.partitionBy("source").orderBy("quality_e4")
      .rangeBetween(1L, Window.unboundedFollowing)
    val env = envelope.withColumn("max_chars_above",
      max("max_chars_same").over(higherQ))
    scored.join(broadcast(env), Seq("source", "quality_e4"))
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
