package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** wal2json change-feed synthesis + decode.
  *
  * The reference consumes a PostgreSQL logical-replication stream whose
  * payloads are wal2json documents `{"change":[{"kind","table",
  * "columnnames","columnvalues"},...]}` and explodes each document into
  * per-table change records (reference src/forwarder/mod.rs:82-126). Here
  * the same payloads are synthesized deterministically from the events
  * table (SURVEY.md §3) and then decoded with `from_json` + `explode` —
  * the decode side is the exact machinery an external wal2json feed would
  * hit, and it is a single narrow projection: no shuffle, fully
  * whole-stage-codegen, parquet scan reads only the five event columns.
  *
  * Deletes carry EMPTY `columnnames`/`columnvalues`: real wal2json emits
  * deletes with an `oldkeys` object instead of the column arrays, and the
  * reference's specific-filter walk over `columnnames` therefore never
  * matches a delete (reference src/utils/specific_filter.rs:21-50,
  * src/forwarder/mod.rs:97-126). Synthesizing empty arrays reproduces that
  * never-match behavior exactly through the same missing-column ⇒ NULL path
  * the filters already implement.
  */
object ChangeFeed {

  /** wal2json document schema (reference src/forwarder/mod.rs:11-13, 82-96).
    * `oldkeys` is wal2json's delete/update-identity object — the reference
    * ignores it (its filters walk columnnames only), but the snapshot
    * materializer needs the deleted row's key to tombstone it.
    * `columntypes` is wal2json's declared-type array; here it carries the
    * JSON value type ("text" = a JSON string, "bigint" = a JSON number) so
    * the decode can reproduce the reference's string-only filter matching
    * (src/utils/specific_filter.rs:37-46 `as_str`) without losing the
    * type distinction to the string-typed `columnvalues` array. */
  val ChangeSchema: StructType = StructType(Seq(
    StructField("change", ArrayType(StructType(Seq(
      StructField("kind", StringType),
      StructField("table", StringType),
      StructField("columnnames", ArrayType(StringType)),
      StructField("columnvalues", ArrayType(StringType)),
      StructField("columntypes", ArrayType(StringType)),
      StructField("oldkeys", StructType(Seq(
        StructField("keynames", ArrayType(StringType)),
        StructField("keyvalues", ArrayType(StringType)))))))))))

  /** event_type → wal2json kind (SURVEY.md §3 mapping). */
  private val kindCol: Column =
    when(col("event_type").isin("signup", "purchase"), "insert")
      .when(col("event_type").isin("click", "view"), "update")
      .otherwise("delete")

  /** event_id → table, cycling through Timescale chunk + base names so the
    * hypertable remap (reference src/forwarder/mod.rs:15-41) is exercised. */
  private val tblCol: Column = expr(
    """CASE event_id % 5
      |  WHEN 0 THEN '_hyper_1_3_chunk'
      |  WHEN 1 THEN '_hyper_2_7_chunk'
      |  WHEN 2 THEN 'cpustats'
      |  WHEN 3 THEN 'memstats'
      |  ELSE 'swapstats' END""".stripMargin)

  /** The base table the purchase-transaction balance update targets: the
    * busiest subscribed table, so multi-element documents genuinely flow
    * through routing and fan-out (not just decode). */
  val BalanceTable = "cpustats"

  /** Raw replication messages: (lsn, payload) with payload a wal2json JSON
    * string. event_id stands in for the WAL LSN (monotone, unique per
    * DOCUMENT — statements inside one document share it, like statements
    * in one transaction share the commit LSN). Takes ANY events frame —
    * batch or streaming — so the whole decode / route / fan-out chain
    * applies unchanged to a Structured Streaming source
    * (see ForwarderStreamSpec).
    *
    * Multi-statement transactions: wal2json emits ONE document per
    * transaction whose `change` array holds every statement, and the
    * reference iterates that array (src/forwarder/mod.rs:96-126). Here a
    * purchase is a two-statement transaction — the event-row insert plus
    * an update of the buyer's running balance — so `change` arrays carry
    * more than one element through decode/explode/route/fan-out. Deriving
    * the second statement from the same source row (instead of grouping
    * neighboring events) keeps the synthesis a narrow stateless projection:
    * no shuffle in the feed, and the identical expression works under
    * Structured Streaming.
    *
    * Value typing: real wal2json emits typed JSON values and the
    * reference's specific filter matches only string-typed ones
    * (src/utils/specific_filter.rs:37-46 `as_str`). `columntypes` carries
    * that distinction: identifier/text columns (user_id — the host_uuid
    * analogue —, event_type, k) are "text" = JSON strings; measures
    * (event_id, value_cents, balance_cents) are "bigint" = JSON numbers,
    * which the filters must never match. */
  def messagesFrom(ev: DataFrame): DataFrame = {
    val isDel = kindCol === "delete"
    val k = regexp_extract(col("props"), "[0-9]+", 0)
    val valueCents = expr("cast(round(value * 100) as bigint)")
    val emptyArr = typedLit(Seq.empty[String])
    val names = when(isDel, emptyArr)
      .otherwise(array(lit("event_id"), lit("user_id"), lit("event_type"),
        lit("value_cents"), lit("k")))
    val vals = when(isDel, emptyArr)
      .otherwise(array(col("event_id").cast("string"),
        col("user_id").cast("string"), col("event_type"),
        valueCents.cast("string"), k))
    val types = when(isDel, emptyArr)
      .otherwise(array(lit("bigint"), lit("text"), lit("text"),
        lit("bigint"), lit("text")))
    // deletes identify the removed row via oldkeys (the wal2json REPLICA
    // IDENTITY payload); to_json omits the null struct on insert/update,
    // matching real wal2json documents
    val nullKeys = lit(null).cast(
      "struct<keynames:array<string>,keyvalues:array<string>>")
    val okeys = when(isDel, struct(
      array(lit("user_id")).as("keynames"),
      array(col("user_id").cast("string")).as("keyvalues")))
      .otherwise(nullKeys)
    val primary = struct(
      kindCol.as("kind"), tblCol.as("table"),
      names.as("columnnames"), vals.as("columnvalues"),
      types.as("columntypes"), okeys.as("oldkeys"))
    val balance = struct(
      lit("update").as("kind"), lit(BalanceTable).as("table"),
      array(lit("user_id"), lit("balance_cents")).as("columnnames"),
      array(col("user_id").cast("string"), valueCents.cast("string"))
        .as("columnvalues"),
      array(lit("text"), lit("bigint")).as("columntypes"),
      nullKeys.as("oldkeys"))
    val changes = when(col("event_type") === "purchase",
      array(primary, balance)).otherwise(array(primary))
    ev.select(
      col("event_id").as("lsn"),
      to_json(struct(changes.as("change"))).as("payload"))
  }

  def messages(spark: SparkSession, dir: String): DataFrame =
    messagesFrom(Tables.events(spark, dir))

  /** Decoded change records: one row per element of each document's
    * `change` array (reference src/forwarder/mod.rs:97-126). A change is
    * identified by (lsn, idx): statements inside one transaction document
    * share the commit LSN and are ordered by their array position, which
    * every consumer that cares about write order (LWW snapshots, ordered
    * dumps) must use as the LSN tiebreak. */
  def decodedFrom(ev: DataFrame): DataFrame =
    decodeRawFrom(messagesFrom(ev))

  /** Decode a raw `(lsn, payload)` change feed — the shape the JDBC
    * polling source (graft.sources.JdbcChangeFeed) delivers — into one
    * row per change element. [[decodedFrom]] is this decode over the
    * synthesized batch feed; the composed streaming pipeline
    * (JdbcPipelineSpec) runs it directly over the polled stream. */
  def decodeRawFrom(raw: DataFrame): DataFrame =
    raw
      .select(col("lsn"), from_json(col("payload"), ChangeSchema).as("doc"))
      .select(col("lsn"), posexplode(col("doc.change")).as(Seq("idx", "c")))
      .select(col("lsn"), col("idx").cast("long").as("idx"),
        col("c.kind").as("kind"), col("c.table").as("tbl"),
        col("c.columnnames").as("columnnames"),
        col("c.columnvalues").as("columnvalues"),
        col("c.columntypes").as("columntypes"),
        col("c.oldkeys.keynames").as("keynames"),
        col("c.oldkeys.keyvalues").as("keyvalues"))

  /** Batch decode is persisted (memory+disk) and memoized per (session,
    * dir): the reference decodes each message ONCE and fans it to every
    * consumer (src/forwarder/mod.rs:82-96 runs ahead of the per-session
    * loop); here the decoded feed is likewise materialized once per session
    * and shared by all CDC queries instead of re-running the JSON decode
    * per query. The streaming path (decodedFrom over a stream) is
    * unaffected. */
  def decoded(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"cdc.decoded:$dir") {
      decodedFrom(Tables.events(spark, dir))
    }

  /** Partition-pruned view of the decoded feed for the per-table routed
    * consumers: when the build cache holds the (tbl, kind)-partitioned
    * layout, read it DIRECTLY — a static table/kind predicate then
    * prunes at the FILE level (PartitionFilters on the scan; other
    * tables' files are never opened), which is the scan the reference's
    * route-before-filter order implies (src/forwarder/mod.rs:106-126).
    * Cold cache: fall through to [[decoded]] (which writes the layout
    * when the cache is enabled) and retry, so the first routed query of
    * a cold session still ends on the pruned scan. Cache off (the
    * Verify posture): the memoized in-memory frame — same rows, the
    * predicate filters in memory. */
  def decodedPruned(spark: SparkSession, dir: String): DataFrame = {
    val key = s"cdc.decoded:$dir"
    graft.BuildCache.layoutFor(spark, key).getOrElse {
      val d = decoded(spark, dir)
      graft.BuildCache.layoutFor(spark, key).getOrElse(d)
    }
  }

  /** [[decodedPruned]] + the string-match column map. */
  def decodedPrunedWithMap(spark: SparkSession, dir: String): DataFrame =
    decodedPruned(spark, dir).withColumn("cmap", textValueMap)

  /** The name→value map the specific filters probe, built from TEXT-typed
    * entries only: the reference locates the column by walking
    * `columnnames`, then matches via `as_str`, so a JSON-number value
    * behaves exactly like an absent column — no match, for any probe value
    * (src/utils/specific_filter.rs:21-50). Dropping non-text entries from
    * the map routes numeric values through the same missing-column ⇒ NULL
    * ⇒ no-match path the filters already implement, instead of smuggling
    * their decimal rendering into string equality. */
  private val textValueMap: Column =
    map_from_entries(transform(
      filter(arrays_zip(col("columnnames"), col("columnvalues"), col("columntypes")),
        e => e("columntypes") === lit("text")),
      e => struct(e("columnnames"), e("columnvalues"))))

  /** Decoded records + the string-match column map (see [[textValueMap]]). */
  def decodedWithMapFrom(ev: DataFrame): DataFrame =
    decodedFrom(ev).withColumn("cmap", textValueMap)

  /** [[decodeRawFrom]] + the string-match column map — the decode stage
    * of the composed JDBC streaming pipeline. */
  def decodedWithMapFromRaw(raw: DataFrame): DataFrame =
    decodeRawFrom(raw).withColumn("cmap", textValueMap)

  /** Batch variant rides the memoized persisted decode — the map column is
    * one cheap projection over the cached frame, so filter_eq / filter_in /
    * batch fan-out share the decode instead of re-running the JSON path. */
  def decodedWithMap(spark: SparkSession, dir: String): DataFrame =
    decoded(spark, dir).withColumn("cmap", textValueMap)

  /** insert=1, update=2, delete=4 — reference src/api/ws_utils.rs:10-12. */
  val kindFlag: Column =
    expr("CASE kind WHEN 'insert' THEN 1 WHEN 'update' THEN 2 ELSE 4 END")

  // ---- queries ------------------------------------------------------------

  def changeDecode(spark: SparkSession, dir: String): DataFrame =
    decoded(spark, dir).select(
      col("lsn"), col("idx"), col("kind"), col("tbl"),
      array_join(col("columnnames"), "|").as("cols"),
      array_join(col("columnvalues"), "|").as("vals"),
      array_join(col("columntypes"), "|").as("types"))
      .orderBy("lsn", "idx")

  /** Flag filter with mask INSERT|DELETE=5 — the bit test the forwarder
    * applies per session (reference src/api/ws_utils.rs:38-57,
    * src/forwarder/mod.rs:106-126). */
  def changeTypeFilter(spark: SparkSession, dir: String): DataFrame =
    decoded(spark, dir)
      .where(kindFlag.bitwiseAND(lit(5)) =!= 0)
      .groupBy("kind", "tbl").agg(count(lit(1)).as("n"))
      .orderBy("kind", "tbl")

  // ---- replay_window ------------------------------------------------------

  /** Bounded replay: the read path a reconnecting subscriber drives — it
    * presents its last confirmed LSN and receives only the half-open
    * window (lo, hi] of changes it missed (the reference resumes its
    * replication slot from the confirmed LSN the standby status loop fed
    * back, src/cdc/replication.rs:95-282). The LSN predicate is applied
    * to the RAW feed before the JSON decode — lsn is the message key, so
    * the range filter reaches the source scan (parquet row-group pruning
    * here; LSN-partition pruning on a partitioned production feed) and
    * only the missed window is ever decoded. Filtering the shared
    * memoized decoded frame instead would scan every decoded change on
    * the cache tier — linear in feed size for a bounded-output read
    * (measured 29.9 s at 1000×, fitted exponent 1.8/decade, because the
    * 100M-row decoded frame no longer fits in executor memory); this
    * shape is sub-second at every scale. The per-(base, kind) summary is
    * one map-side-combined groupBy over the ≤(hi-lo) decoded rows. */
  val ReplayLo = 100L
  val ReplayHi = 700L

  def replayWindow(spark: SparkSession, dir: String): DataFrame =
    HyperRemap.remap(spark,
      decodedFrom(Tables.events(spark, dir)
        .where(col("event_id") > ReplayLo && col("event_id") <= ReplayHi)))
      .groupBy("base", "kind")
      .agg(count(lit(1)).as("n"), min("lsn").as("first_lsn"),
        max("lsn").as("last_lsn"))
      .orderBy("base", "kind")

  def replayWindowSql: String =
    s"""WITH $FeedCte,
       |${HyperRemap.RoutedCte}
       |SELECT base, kind, count(*) AS n,
       |       min(lsn) AS first_lsn, max(lsn) AS last_lsn
       |FROM routed
       |WHERE lsn > $ReplayLo AND lsn <= $ReplayHi
       |GROUP BY base, kind ORDER BY base, kind""".stripMargin

  // ---- cdc_redact ---------------------------------------------------------

  /** PII redaction in the delivery path: digits in the values of sensitive
    * columns are masked before the change leaves the forwarder, and each
    * change reports how many characters were redacted. The reference
    * forwards raw `columnvalues` to every subscriber
    * (src/forwarder/mod.rs:43-143); a compliance deployment interposes
    * exactly this scrub between decode and fan-out. Column-targeted via
    * `zip_with` over the parallel name/value arrays — one narrow
    * codegen'd projection, no shuffle, order-preserving — and deletes pass
    * through untouched (their column arrays are empty; oldkeys are key
    * material, not payload). */
  val SensitiveCols = Seq("value_cents", "balance_cents", "k")

  def cdcRedact(spark: SparkSession, dir: String): DataFrame = {
    val sensitive = (n: Column) => n.isin(SensitiveCols.map(_.asInstanceOf[Any]): _*)
    val red = zip_with(col("columnnames"), col("columnvalues"), (n, v) =>
      when(sensitive(n), regexp_replace(v, "[0-9]", "#")).otherwise(v))
    val nRed = aggregate(
      zip_with(col("columnnames"), col("columnvalues"), (n, v) =>
        when(sensitive(n), size(regexp_extract_all(v, lit("[0-9]"), lit(0))))
          .otherwise(lit(0))),
      lit(0), (acc, x) => acc + x)
    decoded(spark, dir)
      .select(col("lsn"), col("idx"), col("kind"), col("tbl"),
        array_join(red, "|").as("vals_redacted"),
        nRed.cast("long").as("n_redacted"))
      .orderBy("lsn", "idx")
  }

  // ---- cdc_schema_drift ---------------------------------------------------

  /** Schema-drift ledger over the live feed: wal2json declares each
    * change's columns per STATEMENT (`columnnames`), so a consumer's
    * registered schema can silently diverge from what the stream actually
    * carries — new columns appear mid-stream the moment a producer runs
    * ALTER TABLE. The reference walks columnnames per change and would
    * simply start forwarding the new column (src/forwarder/mod.rs:96-126);
    * a production consumer needs the drift surfaced, not absorbed. Per
    * (table, kind, exact column signature): how many changes carry it and
    * which of its columns are outside the registered set (here the
    * event-row schema, so the purchase transaction's `balance_cents`
    * update is the planted drift). One narrow map-side-combined groupBy
    * on a signature whose cardinality is bounded by the schema history,
    * not the stream: drift detection costs nothing extra at 100 TB/day. */
  val RegisteredCols = Seq("event_id", "user_id", "event_type", "value_cents", "k")

  def cdcSchemaDrift(spark: SparkSession, dir: String): DataFrame = {
    val reg = typedLit(RegisteredCols)
    decoded(spark, dir)
      .select(col("tbl"), col("kind"),
        array_join(col("columnnames"), "|").as("signature"),
        array_join(filter(col("columnnames"),
          n => !array_contains(reg, n)), "|").as("new_cols"))
      .groupBy("tbl", "kind", "signature", "new_cols")
      .agg(count(lit(1)).as("n_changes"))
      .withColumn("n_new_cols",
        when(col("new_cols") === "", 0L)
          .otherwise(size(split(col("new_cols"), "\\|")).cast("long")))
      .select("tbl", "kind", "signature", "new_cols", "n_changes", "n_new_cols")
      .orderBy("tbl", "kind", "signature")
  }

  // def, not val: FeedCte is declared below (object init order)
  def cdcSchemaDriftSql: String =
    s"""WITH $FeedCte
       |SELECT tbl, kind,
       |  CASE WHEN kind = 'delete' THEN ''
       |       WHEN idx = 1 THEN 'user_id|balance_cents'
       |       ELSE 'event_id|user_id|event_type|value_cents|k' END AS signature,
       |  CASE WHEN kind <> 'delete' AND idx = 1 THEN 'balance_cents'
       |       ELSE '' END AS new_cols,
       |  count(*) AS n_changes,
       |  CAST(CASE WHEN kind <> 'delete' AND idx = 1 THEN 1 ELSE 0 END AS BIGINT)
       |    AS n_new_cols
       |FROM feed
       |GROUP BY tbl, kind, signature, new_cols, n_new_cols
       |ORDER BY tbl, kind, signature""".stripMargin

  // ---- oracle -------------------------------------------------------------

  /** Relational mirror of the feed synthesis, shared by every CDC oracle:
    * one row per CHANGE, identified by (lsn, idx). idx=0 is the event-row
    * statement; idx=1 is the purchase transaction's balance-update
    * statement. The value columns are row metadata the per-query CTEs
    * consult under the change's own column-membership rules — a balance
    * row (idx=1) carries ONLY user_id + balance_cents (= value_cents) in
    * its wal2json column arrays, and a delete carries none (its key rides
    * in oldkeys) — so any lookup of event_type/k on idx=1, or of anything
    * on a delete, must yield NULL exactly as the engine-side map does. */
  val FeedCte: String =
    s"""feed0 AS (
      |  SELECT event_id AS lsn,
      |         CASE WHEN event_type IN ('signup','purchase') THEN 'insert'
      |              WHEN event_type IN ('click','view') THEN 'update'
      |              ELSE 'delete' END AS kind,
      |         CASE event_id % 5
      |              WHEN 0 THEN '_hyper_1_3_chunk'
      |              WHEN 1 THEN '_hyper_2_7_chunk'
      |              WHEN 2 THEN 'cpustats'
      |              WHEN 3 THEN 'memstats'
      |              ELSE 'swapstats' END AS tbl,
      |         user_id,
      |         event_type,
      |         CAST(round(value * 100) AS BIGINT) AS value_cents,
      |         regexp_extract(props, '[0-9]+', 0) AS k
      |  FROM events),
      |feed AS (
      |  SELECT lsn, CAST(0 AS BIGINT) AS idx, kind, tbl,
      |         user_id, event_type, value_cents, k
      |  FROM feed0
      |  UNION ALL
      |  SELECT lsn, CAST(1 AS BIGINT) AS idx, 'update' AS kind,
      |         '$BalanceTable' AS tbl, user_id, event_type, value_cents, k
      |  FROM feed0 WHERE event_type = 'purchase')""".stripMargin

  val changeDecodeSql: String =
    s"""WITH $FeedCte
       |SELECT lsn, idx, kind, tbl,
       |  CASE WHEN kind = 'delete' THEN ''
       |       WHEN idx = 1 THEN 'user_id|balance_cents'
       |       ELSE 'event_id|user_id|event_type|value_cents|k' END AS cols,
       |  CASE WHEN kind = 'delete' THEN ''
       |       WHEN idx = 1 THEN concat_ws('|', CAST(user_id AS VARCHAR),
       |                                   CAST(value_cents AS VARCHAR))
       |       ELSE concat_ws('|', CAST(lsn AS VARCHAR), CAST(user_id AS VARCHAR),
       |                      event_type, CAST(value_cents AS VARCHAR), k) END AS vals,
       |  CASE WHEN kind = 'delete' THEN ''
       |       WHEN idx = 1 THEN 'text|bigint'
       |       ELSE 'bigint|text|text|bigint|text' END AS types
       |FROM feed ORDER BY lsn, idx""".stripMargin

  val cdcRedactSql: String =
    s"""WITH $FeedCte
       |SELECT lsn, idx, kind, tbl,
       |  CASE WHEN kind = 'delete' THEN ''
       |       WHEN idx = 1 THEN concat_ws('|', CAST(user_id AS VARCHAR),
       |            regexp_replace(CAST(value_cents AS VARCHAR), '[0-9]', '#', 'g'))
       |       ELSE concat_ws('|', CAST(lsn AS VARCHAR), CAST(user_id AS VARCHAR),
       |                      event_type,
       |                      regexp_replace(CAST(value_cents AS VARCHAR), '[0-9]', '#', 'g'),
       |                      regexp_replace(k, '[0-9]', '#', 'g')) END AS vals_redacted,
       |  CASE WHEN kind = 'delete' THEN CAST(0 AS BIGINT)
       |       WHEN idx = 1 THEN CAST(len(regexp_extract_all(CAST(value_cents AS VARCHAR), '[0-9]')) AS BIGINT)
       |       ELSE CAST(len(regexp_extract_all(CAST(value_cents AS VARCHAR), '[0-9]'))
       |            + len(regexp_extract_all(k, '[0-9]')) AS BIGINT) END AS n_redacted
       |FROM feed ORDER BY lsn, idx""".stripMargin

  val changeTypeFilterSql: String =
    s"""WITH $FeedCte
       |SELECT kind, tbl, count(*) AS n
       |FROM feed
       |WHERE ((CASE kind WHEN 'insert' THEN 1 WHEN 'update' THEN 2 ELSE 4 END) & 5) <> 0
       |GROUP BY kind, tbl ORDER BY kind, tbl""".stripMargin

  // ---- cdc_dlq: malformed-payload dead-letter accounting ------------------

  /** Dead-letter accounting for the tolerant decode path: the reference
    * skips documents it cannot parse instead of aborting the stream
    * (src/forwarder/mod.rs:82-96 silently drops on decode failure); a
    * production consumer additionally needs to COUNT what it dropped and
    * over which LSN range, or corruption goes unnoticed. Every DlqEvery-th
    * message is deterministically truncated to half length (always
    * invalid JSON — the closing braces are gone), the REAL `from_json`
    * decode runs over the damaged stream, and rows are classified by
    * whether the parse produced a document. The oracle reproduces the
    * classification arithmetically (it knows which LSNs were damaged);
    * the Spark side must agree through the actual parser — a decoder
    * that crashed, or "successfully" parsed garbage, would split the
    * mirror. Stateless per-row work in the scan; one tiny groupBy. */
  val DlqEvery = 97L

  def cdcDlq(spark: SparkSession, dir: String): DataFrame = {
    val damaged = messages(spark, dir)
      .withColumn("payload",
        when(col("lsn") % DlqEvery === 0,
          substring(col("payload"), 1, 40)).otherwise(col("payload")))
    damaged
      .withColumn("doc", from_json(col("payload"), ChangeSchema))
      .withColumn("reason",
        when(col("doc").isNull || col("doc.change").isNull, "parse_error")
          .otherwise("ok"))
      .groupBy("reason")
      .agg(count(lit(1)).as("n_msgs"),
        min("lsn").as("min_lsn"), max("lsn").as("max_lsn"))
      .orderBy("reason")
  }

  val cdcDlqSql: String =
    s"""SELECT CASE WHEN event_id % $DlqEvery = 0 THEN 'parse_error' ELSE 'ok' END AS reason,
       |       count(*) AS n_msgs,
       |       min(event_id) AS min_lsn, max(event_id) AS max_lsn
       |FROM events
       |GROUP BY reason ORDER BY reason""".stripMargin
}
