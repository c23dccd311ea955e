package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text analysis over the documents table: token/quality statistics,
  * language-ID heuristic, and rolling-hash document fingerprints
  * (SURVEY.md §2 rows 25-27).
  *
  * Everything is a codegen'd `functions._` composition — token lists via
  * `split`, counts via higher-order `filter`/`aggregate` — so the whole
  * stats pass is one narrow projection over the scan: no shuffle, no UDFs,
  * embarrassingly parallel at 100 TB. Ratios are emitted as floor'd 1e-4
  * fixed-point ints (single IEEE division then floor), so results are
  * bit-exact against the DuckDB oracle.
  */
object TextStats {

  val Stopwords = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "que", "por"),
    "fr" -> Seq("le", "les", "des", "est", "dans"))

  private val toks: Column = split(col("text"), " ")

  def hits(words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))

  /** floor(1e4 * num / den) as int64; 0 when den is 0. */
  def ratioE4(num: Column, den: Column): Column =
    when(den === 0, 0L)
      .otherwise(floor(lit(10000.0) * num / den).cast("long"))

  /** The text_stats quality score as a standalone expression over any text
    * column (stopword-ratio e4 + token-band bonus − punctuation penalty) —
    * ONE definition shared by consumers that need the score without the
    * full stats row (Profile.skylineDocs), kept in lockstep with the
    * quality_e4 column textStats emits. */
  def qualityE4OfText(text: Column): Column = {
    val tk = split(text, " ")
    val nTok = size(tk).cast("long")
    val nStop = size(filter(tk,
      t => t.isin(Stopwords("en").map(_.asInstanceOf[Any]): _*))).cast("long")
    val nPunct = (length(text) - length(translate(text, ".,!?;:", ""))).cast("long")
    ratioE4(nStop, nTok) +
      when(nTok.between(20L, 60L), 1000L).otherwise(0L) -
      when(nPunct * 10L > nTok, 500L).otherwise(0L)
  }

  /** DuckDB rendering of [[qualityE4OfText]] over a column reference. */
  def qualityE4Sql(textCol: String): String = {
    val stops = Stopwords("en").map(s => s"'$s'").mkString(", ")
    s"""(CASE WHEN len(string_split($textCol, ' ')) = 0 THEN 0
       |      ELSE CAST(floor(10000.0
       |             * len(list_filter(string_split($textCol, ' '), t -> t IN ($stops)))
       |             / len(string_split($textCol, ' '))) AS BIGINT) END
       |   + CASE WHEN len(string_split($textCol, ' ')) BETWEEN 20 AND 60
       |          THEN 1000 ELSE 0 END
       |   - CASE WHEN (length($textCol) - length(translate($textCol, '.,!?;:', ''))) * 10
       |              > len(string_split($textCol, ' '))
       |          THEN 500 ELSE 0 END)""".stripMargin
  }

  // ---- text_stats ---------------------------------------------------------

  /** BPE-ish subword segmentation: alpha runs, digit runs, and single
    * other non-space chars — the usual pre-tokenizer regex shape. */
  val SubtokRe = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(toks)
    val nPunct = length(col("text")) - length(translate(col("text"), ".,!?;:", ""))
    val nDigit = length(col("text")) - length(translate(col("text"), "0123456789", ""))
    val nStop = hits(Stopwords("en"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(col("text")).as("n_chars_txt"),
        nTok.cast("long").as("n_tokens"),
        size(regexp_extract_all(lower(col("text")), lit(SubtokRe), lit(0)))
          .cast("long").as("n_subtokens"),
        nStop.cast("long").as("n_stop"),
        nPunct.cast("long").as("n_punct"),
        nDigit.cast("long").as("n_digit"),
        ratioE4(length(col("text")) - (nTok - 1), nTok).as("avg_tok_len_e4"),
        ratioE4(nStop, nTok).as("stop_ratio_e4"))
      .withColumn("quality_e4",
        col("stop_ratio_e4")
          + when(col("n_tokens").between(20, 60), 1000L).otherwise(0L)
          - when(col("n_punct") * 10 > col("n_tokens"), 500L).otherwise(0L))
      .orderBy("doc_id")
  }

  val textStatsSql: String = {
    val stops = Stopwords("en").map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         length(text) AS n_chars_txt,
       |         len(string_split(text, ' ')) AS n_tokens,
       |         len(regexp_extract_all(lower(text), '$SubtokRe')) AS n_subtokens,
       |         len(list_filter(string_split(text, ' '), t -> t IN ($stops))) AS n_stop,
       |         length(text) - length(translate(text, '.,!?;:', '')) AS n_punct,
       |         length(text) - length(translate(text, '0123456789', '')) AS n_digit
       |  FROM documents)
       |SELECT doc_id, n_chars_txt,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(n_subtokens AS BIGINT) AS n_subtokens,
       |  CAST(n_stop AS BIGINT) AS n_stop,
       |  CAST(n_punct AS BIGINT) AS n_punct,
       |  CAST(n_digit AS BIGINT) AS n_digit,
       |  CASE WHEN n_tokens = 0 THEN 0
       |       ELSE CAST(floor(10000.0 * (n_chars_txt - (n_tokens - 1)) / n_tokens) AS BIGINT)
       |  END AS avg_tok_len_e4,
       |  CASE WHEN n_tokens = 0 THEN 0
       |       ELSE CAST(floor(10000.0 * n_stop / n_tokens) AS BIGINT)
       |  END AS stop_ratio_e4,
       |  (CASE WHEN n_tokens = 0 THEN 0
       |        ELSE CAST(floor(10000.0 * n_stop / n_tokens) AS BIGINT) END
       |   + CASE WHEN n_tokens BETWEEN 20 AND 60 THEN 1000 ELSE 0 END
       |   - CASE WHEN n_punct * 10 > n_tokens THEN 500 ELSE 0 END) AS quality_e4
       |FROM t ORDER BY doc_id""".stripMargin
  }

  // ---- lang_id ------------------------------------------------------------

  /** Stopword-hit argmax across language profiles; ties resolve in fixed
    * en > de > es > fr order, zero hits → 'und' (undetermined). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val hitCols = Stopwords.toSeq.sortBy(_._1).map { case (l, ws) =>
      hits(ws).cast("long").as(s"hits_$l")
    }
    val best = greatest(col("hits_en"), col("hits_de"), col("hits_es"), col("hits_fr"))
    Tables.documents(spark, dir)
      .select(col("doc_id") +: col("lang").as("label_lang") +: hitCols: _*)
      .withColumn("pred_lang",
        when(best === 0, "und")
          .when(col("hits_en") === best, "en")
          .when(col("hits_de") === best, "de")
          .when(col("hits_es") === best, "es")
          .otherwise("fr"))
      .orderBy("doc_id")
  }

  /** Shared oracle prefix: per-doc stopword hits + argmax prediction
    * (CTEs `h`, `p`) — ONE definition of the classifier CASE serves the
    * per-doc report and the confusion matrix, so an edit to the stopword
    * lists or tie-break cannot desynchronize them. */
  private def predCtes: String = {
    def stops(l: String) = Stopwords(l).map(s => s"'$s'").mkString(", ")
    s"""h AS (
       |  SELECT doc_id, lang AS label_lang,
       |    CAST(len(list_filter(string_split(text,' '), t -> t IN (${stops("en")}))) AS BIGINT) AS hits_en,
       |    CAST(len(list_filter(string_split(text,' '), t -> t IN (${stops("de")}))) AS BIGINT) AS hits_de,
       |    CAST(len(list_filter(string_split(text,' '), t -> t IN (${stops("es")}))) AS BIGINT) AS hits_es,
       |    CAST(len(list_filter(string_split(text,' '), t -> t IN (${stops("fr")}))) AS BIGINT) AS hits_fr
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, label_lang, hits_de, hits_en, hits_es, hits_fr,
       |    CASE WHEN greatest(hits_en, hits_de, hits_es, hits_fr) = 0 THEN 'und'
       |         WHEN hits_en = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'en'
       |         WHEN hits_de = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'de'
       |         WHEN hits_es = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'es'
       |         ELSE 'fr' END AS pred_lang
       |  FROM h)""".stripMargin
  }

  val langIdSql: String =
    s"""WITH $predCtes
       |SELECT doc_id, label_lang, hits_de, hits_en, hits_es, hits_fr, pred_lang
       |FROM p ORDER BY doc_id""".stripMargin

  // ---- lang_confusion -----------------------------------------------------

  /** Confusion matrix of the language-ID heuristic against the corpus
    * labels, with per-cell counts and the truth-row share in e4 — the
    * evaluation report that decides whether the classifier's thresholds
    * are fit to route 100 TB. Rides [[langId]] unchanged (the classifier
    * under test IS the production expression); one tiny groupBy on the
    * (label, prediction) pair, output bounded by #languages². */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cells = langId(spark, dir)
      .groupBy("label_lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
    val rows = cells.groupBy("label_lang").agg(sum("n").as("row_n"))
    cells.join(rows, Seq("label_lang"))
      .select(col("label_lang"), col("pred_lang"), col("n"),
        expr("CAST(floor(1.0e4 * n / row_n) AS BIGINT)").as("row_share_e4"))
      .orderBy("label_lang", "pred_lang")
  }

  val langConfusionSql: String =
    s"""WITH $predCtes,
       |cells AS (
       |  SELECT label_lang, pred_lang, count(*) AS n
       |  FROM p GROUP BY label_lang, pred_lang),
       |rows_ AS (
       |  SELECT label_lang, CAST(sum(n) AS BIGINT) AS row_n
       |  FROM cells GROUP BY label_lang)
       |SELECT c.label_lang, c.pred_lang, c.n,
       |       CAST(floor(1.0e4 * c.n / r.row_n) AS BIGINT) AS row_share_e4
       |FROM cells c JOIN rows_ r ON c.label_lang = r.label_lang
       |ORDER BY c.label_lang, c.pred_lang""".stripMargin

  // ---- repetition_filter --------------------------------------------------

  /** Within-document repetition removal (the Gopher/RefinedWeb "repetition"
    * rule re-expressed on whole tokens): rep_ratio = 1 − distinct/total
    * tokens; documents at or above RepMaxE4 are dropped as
    * boilerplate/degenerate. A narrow projection over the scan — the
    * distinct count is `array_distinct` inside codegen, no shuffle, no
    * per-doc state — so it runs at scan speed on 100 TB. */
  val RepMaxE4 = 6000L

  def repetitionFilter(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(toks)
    val nDist = size(array_distinct(toks))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        nTok.cast("long").as("n_tokens"),
        nDist.cast("long").as("n_distinct"),
        ratioE4(nTok - nDist, nTok).as("rep_ratio_e4"))
      .where(col("rep_ratio_e4") < RepMaxE4)
      .orderBy("doc_id")
  }

  val repetitionFilterSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
       |  FROM documents)
       |SELECT doc_id, n_tokens, n_distinct,
       |       CASE WHEN n_tokens = 0 THEN 0
       |            ELSE CAST(floor(10000.0 * (n_tokens - n_distinct) / n_tokens) AS BIGINT)
       |       END AS rep_ratio_e4
       |FROM t
       |WHERE (CASE WHEN n_tokens = 0 THEN 0
       |            ELSE CAST(floor(10000.0 * (n_tokens - n_distinct) / n_tokens) AS BIGINT)
       |       END) < $RepMaxE4
       |ORDER BY doc_id""".stripMargin

  // ---- doc_fingerprint ----------------------------------------------------

  /** Rolling polynomial hash over the character stream:
    * h := (h * 1000003 + ascii(c)) mod (2^31 - 1). Pure int64 arithmetic
    * (max intermediate ~2^51), reproduced verbatim by the oracle. */
  val FpPrime = 1000003L
  val FpMod = 2147483647L

  def fingerprint(text: Column): Column =
    graft.functions.HashExprs.byteRollHash(text, FpPrime, FpMod)

  /** THE DuckDB text of the rolling fingerprint over a string expression —
    * textually identical math to `HashExprs.byteRollHash`. Every oracle
    * that fingerprints text (doc/chunk fingerprints, shingle and token
    * hashes) must interpolate this one definition; a lone inline copy
    * would let the engines desynchronize. */
  def fpSql(e: String): String =
    s"""list_reduce(
       |        list_prepend(CAST(0 AS BIGINT),
       |          list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))),
       |        (h, c) -> (h * $FpPrime + c) % $FpMod)""".stripMargin

  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .withColumn("fp_bucket", col("fp") % 1024)
      .orderBy("doc_id")

  val docFingerprintSql: String =
    s"""SELECT doc_id,
       |  ${fpSql("text")} AS fp,
       |  ${fpSql("text")} % 1024 AS fp_bucket
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- gopher_quality -----------------------------------------------------

  /** Gopher-rule quality gate (Rae et al. 2021, "Scaling Language Models",
    * Appendix A): the published per-document heuristics, rolled up per
    * source as a rule-by-rule failure ledger so a curator can see WHICH
    * rule removes mass from which source before gating. Four rules,
    * thresholds adapted to this corpus' profile so each genuinely splits
    * (the published symbol/bullet/ellipsis rules are degenerate on the
    * synthetic punctuation-free text and are omitted):
    *   wordcount  — token count within [GopherMinTokens, GopherMaxTokens]
    *   wordlen    — mean word length (e4) within the fluency envelope
    *   stopword   — at least GopherMinStop stopword hits
    *   dominance  — top single token ≤ GopherMaxDomE4 of occurrences
    *                (the "most common word" repetition rule)
    * All counts are integer-exact; the per-doc mean word length and
    * dominance share are single floor'd e4 divisions.
    *
    * Scale shape: the dominance statistic rides the memoized
    * [[Ngrams.tfFrame]] (doc, tok, tf) build the TF-IDF/vocab family
    * shares — one map-side-combined groupBy(doc) for (max tf, Σtf) — and
    * joins back on doc_id; everything else is a narrow single-pass
    * projection. The rollup is a ≤|sources|-key groupBy. No new
    * full-text scan, no new shuffle family at 100 TB. */
  val GopherMinTokens = 30L
  val GopherMaxTokens = 80L
  val GopherMinWlenE4 = 42000L
  val GopherMaxWlenE4 = 46000L
  val GopherMinStop = 2L
  val GopherMaxDomE4 = 1500L

  /** Per-document Gopher rule flags (doc_id, source, f_wc, f_wlen,
    * f_stop, f_dom) — the rollup (gopherQuality) and the cross-gate
    * ablation (Pipeline.filterAblation) read the SAME per-doc frame, so
    * the rule arithmetic cannot drift between them.
    *
    * Also carries `n_tokens` (the raw-split docTokens definition) and
    * `flesch_e3` so the ablation's other gates ride the SAME documents
    * scan instead of three more doc_id joins; consumers that ignore them
    * (gopherQuality) pay nothing — Catalyst prunes unused projection
    * columns before the scan. */
  private[ops] def gopherFlags(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"text.gopherFlags:$dir") {
      gopherFlagsBuild(spark, dir)
    }

  private def gopherFlagsBuild(spark: SparkSession, dir: String): DataFrame = {
    val dom = Ngrams.tfFrame(spark, dir)
      .groupBy("doc_id")
      .agg(max("tf").as("top_c"), sum("tf").as("tf_sum"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_tok"),
        length(col("text")).as("n_chars_t"),
        hits(Stopwords("en")).cast("long").as("n_stop"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        fleschE3Col.as("flesch_e3"))
      .join(dom, "doc_id")
      .withColumn("wlen_e4",
        ratioE4(col("n_chars_t") - (col("n_tok") - 1), col("n_tok")))
      .withColumn("dom_e4", ratioE4(col("top_c"), col("tf_sum")))
      .withColumn("f_wc",
        (!col("n_tok").between(GopherMinTokens, GopherMaxTokens)).cast("long"))
      .withColumn("f_wlen",
        (!col("wlen_e4").between(GopherMinWlenE4, GopherMaxWlenE4)).cast("long"))
      .withColumn("f_stop", (col("n_stop") < GopherMinStop).cast("long"))
      .withColumn("f_dom", (col("dom_e4") > GopherMaxDomE4).cast("long"))
  }

  def gopherQuality(spark: SparkSession, dir: String): DataFrame = {
    gopherFlags(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("f_wc").as("fail_wordcount"),
        sum("f_wlen").as("fail_wordlen"),
        sum("f_stop").as("fail_stopword"),
        sum("f_dom").as("fail_dominance"),
        sum(when(col("f_wc") + col("f_wlen") + col("f_stop") + col("f_dom") === 0, 1L)
          .otherwise(0L)).as("n_pass"))
      .orderBy("source")
  }

  /** Oracle CTE chain ending in `gf` = per-doc Gopher flags (doc_id,
    * source, f_wc, f_wlen, f_stop, f_dom) — shared verbatim by the
    * gopher_quality rollup and the filter_ablation composition. */
  private[ops] val GopherFlagsCtes: String = {
    val stops = Stopwords("en").map(s => s"'$s'").mkString(", ")
    s"""gt AS (
       |  SELECT doc_id, source, text,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |         length(text) AS n_chars_t,
       |         CAST(len(list_filter(string_split(text, ' '),
       |              t -> t IN ($stops))) AS BIGINT) AS n_stop
       |  FROM documents),
       |gx AS (
       |  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
       |  FROM documents),
       |gtf AS (SELECT doc_id, tok, count(*) AS tf FROM gx GROUP BY doc_id, tok),
       |gd AS (
       |  SELECT doc_id, CAST(max(tf) AS BIGINT) AS top_c,
       |         CAST(sum(tf) AS BIGINT) AS tf_sum
       |  FROM gtf GROUP BY doc_id),
       |gr AS (
       |  SELECT gt.doc_id, gt.source,
       |         CASE WHEN n_tok = 0 THEN 0
       |              ELSE CAST(floor(10000.0 * (n_chars_t - (n_tok - 1)) / n_tok) AS BIGINT)
       |         END AS wlen_e4,
       |         CASE WHEN tf_sum = 0 THEN 0
       |              ELSE CAST(floor(10000.0 * top_c / tf_sum) AS BIGINT)
       |         END AS dom_e4,
       |         n_tok, n_stop
       |  FROM gt JOIN gd USING (doc_id)),
       |gf AS (
       |  SELECT doc_id, source,
       |         CASE WHEN n_tok BETWEEN $GopherMinTokens AND $GopherMaxTokens THEN 0 ELSE 1 END AS f_wc,
       |         CASE WHEN wlen_e4 BETWEEN $GopherMinWlenE4 AND $GopherMaxWlenE4 THEN 0 ELSE 1 END AS f_wlen,
       |         CASE WHEN n_stop < $GopherMinStop THEN 1 ELSE 0 END AS f_stop,
       |         CASE WHEN dom_e4 > $GopherMaxDomE4 THEN 1 ELSE 0 END AS f_dom
       |  FROM gr)""".stripMargin
  }

  val gopherQualitySql: String = {
    s"""WITH $GopherFlagsCtes
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(f_wc) AS BIGINT) AS fail_wordcount,
       |       CAST(sum(f_wlen) AS BIGINT) AS fail_wordlen,
       |       CAST(sum(f_stop) AS BIGINT) AS fail_stopword,
       |       CAST(sum(f_dom) AS BIGINT) AS fail_dominance,
       |       CAST(sum(CASE WHEN f_wc + f_wlen + f_stop + f_dom = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
       |FROM gf GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- char_collision_audit ----------------------------------------------

  /** Per-source character-repetitiveness ledger (SURVEY §2 row 186): the
    * integer collision index floor(1e6·Σc(c−1)/(n(n−1))) per document —
    * the log-free twin of character entropy (see
    * [[graft.functions.CharCollisionExpr]]) — rolled up per source with
    * a fixed junk flag at [[CollisionFlagPpm]] ppm. A wall of repeated
    * characters scores ~1e6; normal word text in this corpus sits near
    * 70k ppm, so the flag threshold marks the degenerate tail a
    * perplexity filter would cut, without a model or a logarithm.
    *
    * Scale shape: one narrow codegen'd projection over the scan (the
    * expression is O(n) per row, no explode of text into a char table —
    * the declarative per-char histogram would shuffle |corpus| rows per
    * CHARACTER) feeding a partial-aggregated groupBy on the low-card
    * source key. Docs with n < 2 chars carry no collision signal and are
    * excluded on BOTH sides of the gate. */
  val CollisionFlagPpm = 80000L

  def charCollisionAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // gate on the CHEAP length probe, not isNotNull(ppm): the latter
      // pushes below the projection and evaluates the O(n) expression
      // twice per row (once in the Filter, once in the Project). The two
      // gates are equivalent by the expression's null contract (NULL iff
      // text is null or under 2 chars) — the audited plan computes ppm
      // exactly once.
      .where(length(col("text")) >= 2)
      .select(col("source"),
        graft.functions.HashExprs.charCollisionPpm(col("text")).as("ppm"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ppm") >= CollisionFlagPpm, 1L).otherwise(0L))
          .as("n_flagged"),
        expr("sum(ppm) div count(1)").as("avg_ppm"),
        min("ppm").as("min_ppm"),
        max("ppm").as("max_ppm"))
      .orderBy("source")

  /** Oracle twin: the per-character histogram spelled out relationally
    * (unnest chars → counts → Σc(c−1)), the naive form the expression
    * replaces. Character granularity matches the UTF-16 count through
    * the BMP; the corpus contract is ASCII. */
  val charCollisionAuditSql: String =
    s"""WITH cch AS (
       |  SELECT doc_id, source, unnest(string_split(text, '')) AS ch
       |  FROM documents WHERE length(text) >= 2),
       |ccc AS (
       |  SELECT doc_id, source, ch, count(*) AS c
       |  FROM cch GROUP BY doc_id, source, ch),
       |ccd AS (
       |  SELECT doc_id, source, sum(c * (c - 1)) AS pairs2, sum(c) AS n
       |  FROM ccc GROUP BY doc_id, source),
       |ccp AS (
       |  SELECT source, (1000000 * pairs2) // (n * (n - 1)) AS ppm FROM ccd)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN ppm >= $CollisionFlagPpm THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |       CAST(sum(ppm) // count(*) AS BIGINT) AS avg_ppm,
       |       CAST(min(ppm) AS BIGINT) AS min_ppm,
       |       CAST(max(ppm) AS BIGINT) AS max_ppm
       |FROM ccp GROUP BY source ORDER BY source""".stripMargin

  // ---- readability: Flesch-band histogram per source ------------------------

  /** Flesch reading-ease per document, integer-exact: syllables proxied
    * by vowel groups (the standard regex heuristic), sentences by
    * terminal-punctuation count (floor 1), and the score assembled from
    * two floored single divisions of exact int64 counts —
    * 206835 − floor(1015·W/S) − floor(84600·V/W), the published
    * 206.835 − 1.015(W/S) − 84.6(V/W) scaled e3. Band edges at 90/70/
    * 50/30 (very_easy…very_hard). Output: per (source, band) doc count,
    * mean/min/max score — the reading-level profile of each source.
    *
    * Scale: one scan, three codegen'd regex/translate counters per row,
    * one map-side-combined groupBy on ≤ |sources|×5 keys. */
  /** Flesch reading-ease score (e3 fixed point) as a column expression
    * over a documents row — shared by the readability banding and the
    * filter_ablation composition (same arithmetic, no drift). */
  private[ops] def fleschE3Col: Column = {
    val w = greatest(size(toks).cast("long"), lit(1L))
    val s = greatest(
      (length(col("text")) - length(translate(col("text"), ".!?", ""))).cast("long"),
      lit(1L))
    val v = greatest(
      size(regexp_extract_all(lower(col("text")), lit("[aeiou]+"), lit(0))).cast("long"),
      lit(0L))
    lit(206835L) -
      floor(lit(1015.0) * w / s).cast("long") -
      floor(lit(84600.0) * v / w).cast("long")
  }

  /** Oracle twin of [[fleschE3Col]]: per-doc CTE chain ending in `fsc`
    * (doc_id, source, flesch_e3). */
  private[ops] val FleschCtes: String =
    """fr AS (
      |  SELECT doc_id, source,
      |         greatest(len(string_split(text, ' ')), 1) AS w,
      |         greatest(length(text) - length(translate(text, '.!?', '')), 1) AS s,
      |         len(regexp_extract_all(lower(text), '[aeiou]+')) AS v
      |  FROM documents),
      |fsc AS (
      |  SELECT doc_id, source,
      |         206835 - CAST(floor(1015.0 * w / s) AS BIGINT)
      |                - CAST(floor(84600.0 * v / w) AS BIGINT) AS flesch_e3
      |  FROM fr)""".stripMargin

  def readability(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("source"), fleschE3Col.as("flesch_e3"))
      .withColumn("band",
        when(col("flesch_e3") >= 90000L, "1_very_easy")
          .when(col("flesch_e3") >= 70000L, "2_easy")
          .when(col("flesch_e3") >= 50000L, "3_medium")
          .when(col("flesch_e3") >= 30000L, "4_hard")
          .otherwise("5_very_hard"))
      .groupBy("source", "band")
      .agg(count(lit(1)).as("n_docs"),
        // Flesch goes NEGATIVE on vowel-dense text, and Spark's integer
        // `div` truncates toward zero while DuckDB's `//` floors — so the
        // mean is an explicit double-floor, identical IEEE on both sides
        expr("CAST(floor(CAST(sum(flesch_e3) AS DOUBLE) / count(1)) AS LONG)")
          .as("avg_e3"),
        min("flesch_e3").as("min_e3"),
        max("flesch_e3").as("max_e3"))
      .orderBy("source", "band")
  }

  val readabilitySql: String =
    """WITH r AS (
      |  SELECT source,
      |         greatest(len(string_split(text, ' ')), 1) AS w,
      |         greatest(length(text) - length(translate(text, '.!?', '')), 1) AS s,
      |         len(regexp_extract_all(lower(text), '[aeiou]+')) AS v
      |  FROM documents),
      |sc AS (
      |  SELECT source,
      |         206835 - CAST(floor(1015.0 * w / s) AS BIGINT)
      |                - CAST(floor(84600.0 * v / w) AS BIGINT) AS flesch_e3
      |  FROM r),
      |b AS (
      |  SELECT source, flesch_e3,
      |         CASE WHEN flesch_e3 >= 90000 THEN '1_very_easy'
      |              WHEN flesch_e3 >= 70000 THEN '2_easy'
      |              WHEN flesch_e3 >= 50000 THEN '3_medium'
      |              WHEN flesch_e3 >= 30000 THEN '4_hard'
      |              ELSE '5_very_hard' END AS band
      |  FROM sc)
      |SELECT source, band, count(*) AS n_docs,
      |       CAST(floor(CAST(sum(flesch_e3) AS DOUBLE) / count(*)) AS BIGINT) AS avg_e3,
      |       CAST(min(flesch_e3) AS BIGINT) AS min_e3,
      |       CAST(max(flesch_e3) AS BIGINT) AS max_e3
      |FROM b GROUP BY source, band ORDER BY source, band""".stripMargin
}
