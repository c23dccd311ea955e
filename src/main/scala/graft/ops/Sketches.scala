package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Cardinality sketching (SURVEY.md §2 row 55): a deterministic
  * HyperLogLog re-expressed as two partial-aggregating groupBys.
  *
  * At 100 TB, "how many distinct X per group" is the first question every
  * corpus report asks, and exact distinct is a full shuffle of the key
  * space. HLL is the standard answer: per (group, bucket) keep only the
  * max rank — fixed sketch memory per group (m buckets), both
  * aggregations map-side combine, and the merge is associative so the
  * same plan computes incrementally over new partitions.
  *
  * Engine-portable hashing: production Spark would use `xxhash64`, but no
  * other engine reproduces it bit-for-bit, so the driver's DuckDB gate
  * could not verify it. Instead the hash family is the same
  * prime-modulus affine mix the shard router and LSH stages use
  * (pairwise-independent; Mersenne prime 2^31−1), and the geometric rank
  * is the trailing-zero count of the mixed value, extracted with pure
  * int64 ops: t = h & −h isolates the lowest set bit, and t mod 37 is a
  * perfect hash of the 31 possible powers of two (2 generates the
  * multiplicative group mod 37), decoded by a generated CASE — identical
  * SQL text runs on both engines.
  *
  * The estimator is the raw HLL harmonic mean with α_64 fixed at
  * AlphaE6·1e-6 (709337e-6); no small-range (linear counting) correction, because
  * that needs ln(), whose last-ulp rounding is not guaranteed identical
  * across engines — the bias below ~2.5·m distinct values is accepted
  * and visible in the emitted err_e4 column. All power-of-2 terms are
  * exact int64 (2^(40−rho)), and the one float division sequence is
  * written with identical literal text on both sides.
  */
object Sketches {

  val HllP: Long = TextStats.FpMod // 2^31 − 1, same modulus as the fingerprints
  val HllM1: Long = graft.functions.HashExprs.Mix1 // bucket mix
  val HllM2: Long = graft.functions.HashExprs.Mix2 // rank mix
  val HllBuckets = 64
  val AlphaE6 = 709337L   // 0.7213 / (1 + 1.079/64), e6 fixed point

  /** Generated CASE decoding 2^k → k for k in [0, 30] via t mod 37. */
  def tzCaseSql(e: String): String = {
    val whens = (0 to 30)
      .map(k => s"WHEN ${(BigInt(2).pow(k) % 37)} THEN $k").mkString(" ")
    s"CASE (($e) & -($e)) % 37 $whens END"
  }

  /** Geometric rank: trailing zeros of the 31-bit mix + 1; all-zero → 32. */
  def rhoSql(e: String): String =
    s"CASE WHEN ($e) = 0 THEN 32 ELSE (${tzCaseSql(e)}) + 1 END"

  // identical float math on both engines: alpha * m^2 * 2^40 / S, e6
  // scaled. Scientific notation, NOT decimal-point literals: both engines
  // parse `4.5e15` as DOUBLE, while DuckDB types `4503599627370496.0` as
  // DECIMAL(18,1) and overflows multiplying it.
  private val estSql =
    s"CAST(floor($AlphaE6 * 4.503599627370496e15 / s_total / 1.0e6) AS BIGINT)"
  private val errSql =
    "CAST(floor(1.0e4 * abs(hll_est - n_exact) / n_exact) AS BIGINT)"

  // ---- hll_distinct -------------------------------------------------------

  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val mix2 = s"event_id % $HllP * $HllM2 % $HllP"
    val sketch = ev
      .select(col("event_type"),
        expr(s"event_id % $HllP * $HllM1 % $HllP % $HllBuckets").as("bucket"),
        expr(rhoSql(mix2)).as("rho"))
      .groupBy("event_type", "bucket")
      .agg(max("rho").as("rho_max"))
      .groupBy("event_type")
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(40 - rho_max AS INT))"))
        .as("s_present"),
        count(lit(1)).as("n_buckets"))
      .withColumn("s_total",
        col("s_present") + (lit(HllBuckets.toLong) - col("n_buckets")) * lit(1L << 40))
      .withColumn("hll_est", expr(estSql))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("event_id").as("n_exact"))
    sketch.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact"), col("hll_est"),
        expr(errSql).as("err_e4"))
      .orderBy("event_type")
  }

  // ---- cms_topk -----------------------------------------------------------

  /** Count-min sketch over the token stream, read back for the exact
    * top-K tokens. Depth 3 (one row per shared mix multiplier), width
    * 1024: the sketch is AT MOST 3×1024 cells no matter the corpus size —
    * that bound is the whole point at 100 TB, where an exact token count
    * table has vocabulary cardinality but the sketch stays resident in
    * one broadcast. Build = union of the three (row, position, weight)
    * projections → one map-side-combined groupBy on (row, pos); reading
    * an estimate = min over the three cells, always ≥ the true count, so
    * the emitted over_n column is provably non-negative and shows the
    * collision overcount directly. Token weights come from the memoized
    * tf frame the TF-IDF pass already shares. */
  val CmsWidth = 1024L
  val CmsTopK = 20

  private val CmsMixes = Seq(
    1L -> graft.functions.HashExprs.Mix1,
    2L -> graft.functions.HashExprs.Mix2,
    3L -> graft.functions.HashExprs.Mix3)

  /** Global token counts + fingerprint, memoized (shared by the sketch
    * build, both readbacks, and the top-K). */
  private def tokN(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.memoPersist(spark, s"sketches.tokn:$dir") {
      Ngrams.tokenCounts(spark, dir)
        .withColumn("th", TextStats.fingerprint(col("tok")))
    }

  /** Top-K exact tokens read back against a (row_idx, pos, cell) sketch:
    * estimate = min over the three row cells, always ≥ exact. */
  private def cmsReadback(spark: SparkSession, dir: String,
      cells: DataFrame): DataFrame = {
    val top = tokN(spark, dir).orderBy(col("n").desc, col("tok")).limit(CmsTopK)
    val joined = CmsMixes.foldLeft(top) { case (acc, (j, m)) =>
      acc.join(broadcast(
        cells.where(col("row_idx") === j)
          .select((col("pos")).as(s"p$j"), col("cell").as(s"c$j"))),
        col("th") * m % TextStats.FpMod % CmsWidth === col(s"p$j"))
    }
    joined
      .withColumn("cms_n", least(col("c1"), col("c2"), col("c3")))
      .select(col("tok"), col("n").as("exact_n"), col("cms_n"),
        (col("cms_n") - col("n")).as("over_n"))
      .orderBy(col("exact_n").desc, col("tok"))
  }

  def cmsTopk(spark: SparkSession, dir: String): DataFrame = {
    val cells = CmsMixes.map { case (j, m) =>
      tokN(spark, dir).select(lit(j).as("row_idx"),
        (col("th") * m % TextStats.FpMod % CmsWidth).as("pos"), col("n"))
    }.reduce(_ union _)
      .groupBy("row_idx", "pos").agg(sum("n").as("cell"))
    cmsReadback(spark, dir, cells)
  }

  // ---- cms_merge: count-min-sketch linearity certification ----------------

  /** Cell-wise SUM-merge of per-source count-min sketches into the
    * global sketch — the third member of the sketch-algebra trilogy
    * (hll_merge: register max; quantile_merge: histogram sum; here: CMS
    * is LINEAR, Σ_sources CMS(source) = CMS(corpus) cell for cell, so
    * per-shard sketches re-aggregate and even subtract for corpus
    * diffs). The SPARK side builds one sketch per source from
    * source-scoped token counts and merges them; the ORACLE is the
    * direct global build (cms_topk's own SQL verbatim) — hash equality
    * on the top-K readback through the MERGED sketch is the numeric
    * proof of linearity.
    *
    * Scale shape: the per-source sketch frame is ≤ sources × 3 × 1024
    * rows; everything upstream is the map-side-combined token
    * aggregation the CMS family already pays. */
  def cmsMerge(spark: SparkSession, dir: String): DataFrame = {
    val srcTok = Ngrams.tfFrame(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
      .groupBy("source", "tok").agg(sum("tf").as("n"))
      .withColumn("th", TextStats.fingerprint(col("tok")))
    val srcCells = CmsMixes.map { case (j, m) =>
      srcTok.select(col("source"), lit(j).as("row_idx"),
        (col("th") * m % TextStats.FpMod % CmsWidth).as("pos"), col("n"))
    }.reduce(_ union _)
      .groupBy("source", "row_idx", "pos").agg(sum("n").as("cell"))
    // THE merge: cell-wise sum of the per-source sketches
    val merged = srcCells.groupBy("row_idx", "pos").agg(sum("cell").as("cell"))
    cmsReadback(spark, dir, merged)
  }

  /** Oracle: the DIRECT global sketch (cms_topk's SQL, verbatim) — the
    * Spark side must reproduce it from the per-source merge exactly. */
  def cmsMergeSql: String = cmsTopkSql

  val cmsTopkSql: String = {
    val posOf = (m: Long) => s"th * $m % ${TextStats.FpMod} % $CmsWidth"
    val rows = CmsMixes.map { case (j, m) =>
      s"SELECT n, $j AS row_idx, ${posOf(m)} AS pos FROM h"
    }.mkString("\n    UNION ALL ")
    s"""WITH ${Ngrams.TokenCountsCtes},
       |h AS (
       |  SELECT tok, n, ${TextStats.fpSql("tok")} AS th FROM tn),
       |cells AS (
       |  SELECT row_idx, pos, CAST(sum(n) AS BIGINT) AS cell FROM (
       |    $rows) u
       |  GROUP BY row_idx, pos),
       |top AS (SELECT tok, n, th FROM h ORDER BY n DESC, tok LIMIT $CmsTopK)
       |SELECT t.tok, t.n AS exact_n,
       |       least(c1.cell, c2.cell, c3.cell) AS cms_n,
       |       least(c1.cell, c2.cell, c3.cell) - t.n AS over_n
       |FROM top t
       |JOIN cells c1 ON c1.row_idx = 1 AND c1.pos = t.${posOf(CmsMixes(0)._2)}
       |JOIN cells c2 ON c2.row_idx = 2 AND c2.pos = t.${posOf(CmsMixes(1)._2)}
       |JOIN cells c3 ON c3.row_idx = 3 AND c3.pos = t.${posOf(CmsMixes(2)._2)}
       |ORDER BY exact_n DESC, tok""".stripMargin
  }

  val hllDistinctSql: String = {
    val mix2 = s"event_id % $HllP * $HllM2 % $HllP"
    s"""WITH b AS (
       |  SELECT event_type,
       |         event_id % $HllP * $HllM1 % $HllP % $HllBuckets AS bucket,
       |         ${rhoSql(mix2)} AS rho
       |  FROM events),
       |m AS (
       |  SELECT event_type, bucket, max(rho) AS rho_max
       |  FROM b GROUP BY event_type, bucket),
       |s AS (
       |  SELECT event_type,
       |         CAST(sum(CAST(1 AS BIGINT) << CAST(40 - rho_max AS INT)) AS BIGINT) AS s_present,
       |         count(*) AS n_buckets
       |  FROM m GROUP BY event_type),
       |e AS (
       |  SELECT event_type,
       |         s_present + ($HllBuckets - n_buckets) * (CAST(1 AS BIGINT) << 40) AS s_total
       |  FROM s),
       |est AS (
       |  SELECT event_type, $estSql AS hll_est FROM e),
       |x AS (
       |  SELECT event_type, count(DISTINCT event_id) AS n_exact
       |  FROM events GROUP BY event_type)
       |SELECT est.event_type, x.n_exact, est.hll_est, $errSql AS err_e4
       |FROM est JOIN x ON est.event_type = x.event_type
       |ORDER BY est.event_type""".stripMargin
  }

  // ---- hll_merge: sketch mergeability certification -----------------------

  /** Register-wise MERGE of per-group HLL sketches, certified against a
    * directly-built global sketch — the property that makes HLL the
    * 100 TB distinct-count answer: per-partition/per-shard/per-day
    * sketches combine by bucket-wise max into exactly the sketch a
    * single global pass would build (max is associative/commutative/
    * idempotent), so distinct counts distribute, re-aggregate across
    * time windows, and never double-count.
    *
    * The certification is cross-engine: the SPARK side computes the
    * 'ALL' row by MERGING the per-event_type registers (groupBy bucket,
    * max of per-group maxima — never touching raw rows again), while
    * the ORACLE builds the 'ALL' registers directly from the base table.
    * Hash equality between the two IS the numeric proof of the merge
    * identity. Per-type rows (elements = user_id, which overlap heavily
    * across types) ride along, so the output also shows why naive
    * per-group estimate SUMS over-count while the merge does not.
    *
    * Scale shape: one scan → (type, bucket) partial maxima with map-side
    * combine (≤ types × 64 rows shuffle); the merge is a second groupBy
    * over that tiny frame. The exact countDistinct columns are the
    * verification affordance, not the scale path. */
  /** Per-(event_type, bucket) HLL register maxima over user_id — the
    * sketch state itself, factored so the BATCH merge certification
    * (hll_merge) and the STREAMING twin (HllStreamSpec) aggregate the
    * selfsame frame: `max` is a streaming-safe aggregate, so this exact
    * declaration runs unmodified under readStream with bounded state
    * (≤ types × HllBuckets rows), which is the incremental-sketch
    * serving path at 100 TB. */
  private[graft] def hllUserRegisters(ev: DataFrame): DataFrame = {
    val mix2 = s"user_id % $HllP * $HllM2 % $HllP"
    ev.select(col("event_type"),
        expr(s"user_id % $HllP * $HllM1 % $HllP % $HllBuckets").as("bucket"),
        expr(rhoSql(mix2)).as("rho"))
      .groupBy("event_type", "bucket")
      .agg(max("rho").as("rho_max"))
  }

  def hllMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val regs = hllUserRegisters(ev)
    def estimate(byGroup: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
      byGroup
        .groupBy(key.as("scope"))
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(40 - rho_max AS INT))"))
          .as("s_present"),
          count(lit(1)).as("n_buckets"))
        .withColumn("s_total",
          col("s_present") + (lit(HllBuckets.toLong) - col("n_buckets")) * lit(1L << 40))
        .withColumn("hll_est", expr(estSql))
        .select("scope", "hll_est")
    val perType = estimate(regs, col("event_type"))
      .join(ev.groupBy(col("event_type").as("scope"))
        .agg(countDistinct("user_id").as("n_exact")), Seq("scope"))
    // THE merge: bucket-wise max of the per-group registers
    val mergedRegs = regs.groupBy("bucket").agg(max("rho_max").as("rho_max"))
    val merged = estimate(mergedRegs, lit("ALL"))
      // bounded-cross: 1-row merged estimate x 1-row exact count
      .crossJoin(ev.agg(countDistinct("user_id").as("n_exact")))
    perType.unionByName(merged)
      .select(col("scope"), col("n_exact"), col("hll_est"),
        expr(errSql).as("err_e4"))
      .orderBy("scope")
  }

  val hllMergeSql: String = {
    val mix2 = s"user_id % $HllP * $HllM2 % $HllP"
    s"""WITH b AS (
       |  SELECT event_type,
       |         user_id % $HllP * $HllM1 % $HllP % $HllBuckets AS bucket,
       |         ${rhoSql(mix2)} AS rho
       |  FROM events),
       |m AS (
       |  SELECT event_type AS scope, bucket, max(rho) AS rho_max
       |  FROM b GROUP BY event_type, bucket),
       |mall AS (
       |  SELECT 'ALL' AS scope, bucket, max(rho) AS rho_max
       |  FROM b GROUP BY bucket),
       |mu AS (SELECT * FROM m UNION ALL SELECT * FROM mall),
       |s AS (
       |  SELECT scope,
       |         CAST(sum(CAST(1 AS BIGINT) << CAST(40 - rho_max AS INT)) AS BIGINT) AS s_present,
       |         count(*) AS n_buckets
       |  FROM mu GROUP BY scope),
       |e AS (
       |  SELECT scope,
       |         s_present + ($HllBuckets - n_buckets) * (CAST(1 AS BIGINT) << 40) AS s_total
       |  FROM s),
       |est AS (
       |  SELECT scope, $estSql AS hll_est FROM e),
       |x AS (
       |  SELECT event_type AS scope, count(DISTINCT user_id) AS n_exact
       |  FROM events GROUP BY event_type
       |  UNION ALL
       |  SELECT 'ALL' AS scope, count(DISTINCT user_id) AS n_exact FROM events)
       |SELECT est.scope, x.n_exact, est.hll_est, $errSql AS err_e4
       |FROM est JOIN x ON est.scope = x.scope
       |ORDER BY est.scope""".stripMargin
  }
}
