package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Lexical retrieval + hybrid fusion + data-selection weighting — the
  * three retrieval-adjacent passes a training-data pipeline runs beside
  * the ANN family (SURVEY.md §2 rows 122-124):
  *
  *   - `bm25_topk`: BM25 "more-like-this" document retrieval (Robertson &
  *     Walker's Okapi BM25, the published probabilistic relevance
  *     framework) — the lexical complement to ann_topk's dense retrieval.
  *   - `retrieval_rrf`: reciprocal-rank fusion (Cormack, Clarke &
  *     Buettcher, SIGIR 2009) of the dense and lexical lists — the
  *     standard score-free hybrid, robust to incomparable score scales.
  *   - `dsir_weights`: hashed n-gram importance weights for data
  *     selection (the DSIR recipe of Xie et al., 2023: hashed unigram
  *     bucket distributions of a target corpus vs the raw pool), made
  *     log-free with the integer lift ratio the collocation miner
  *     (ngram_pmi) already uses, so both engines compute bit-identical
  *     fixed-point weights.
  *
  * Scale shape (100 TB): BM25's candidate generation is a broadcast of
  * the query-term set (queries × terms rows — thousands, not billions)
  * joined against the token-partitioned tf frame, so only postings of
  * query terms are ever touched; df/dl ride co-partitioned joins keyed
  * on token / doc_id and the two corpus scalars ride a 1-row broadcast.
  * Per-term scores are floor-quantized to int64 BEFORE the per-document
  * sum, making the aggregate order-independent (cross-engine and
  * cross-partitioning determinism — a double sum would depend on
  * reduction order). RRF is pure arithmetic over two queries×k lists.
  * DSIR's bucket statistics are a fixed-width (DsirBuckets-row) frame
  * broadcast back over the token stream; everything else is map-side-
  * combined aggregation, flat in corpus size.
  */
object Retrieval {

  // ---- bm25_topk: Okapi BM25 more-like-this retrieval ---------------------

  /** Query set: the first BmQueries documents (aligned with the ANN
    * family's NumQueries so the fusion below is a true hybrid of the
    * same query ids); each query's terms are its distinct tokens. */
  val BmQueries: Int = Similarity.NumQueries
  val BmTopK = 10

  /** BM25 with k1 = 1.2, b = 0.75 carried as exact rationals. For
    * tf' = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) multiply numerator
    * and denominator by 10·tot (tot = N·avgdl = total token count):
    *
    *   contrib = idf · 22·tf·tot / (10·tf·tot + 3·tot + 9·dl·N)
    *
    * — every factor an exact integer, so the double division is the only
    * rounding site and both engines evaluate the identical IEEE
    * expression tree. The idf is the repo's portable integer surrogate
    * of the Robertson–Sparck Jones form with the 0.5 shifts doubled
    * into integers: floor(1e6·(2N − 2df + 1)/(2df + 1)) — positive for
    * every df ≤ N (no negative-idf clamp needed). Per-term contributions
    * are floored to int64 before summation. */
  private val BmContribExpr =
    "CAST(floor(floor(1.0e6 * (2 * n - 2 * df + 1) / (2 * df + 1))" +
      " * (22.0 * tf * tot)" +
      " / (10.0 * tf * tot + 3.0 * tot + 9.0 * dl * n)) AS BIGINT)"

  /** Ranked-and-cut BM25 lists, memoized: consumed by bm25_topk and by
    * the RRF fusion below (queries × BmTopK rows — trivially small). */
  private def bm25Ranked(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"retr.bm25:$dir") {
      val tf = Ngrams.tfFrame(spark, dir)
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("tot"))
      val dfr = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val q = tf.where(col("doc_id") < BmQueries)
        .select(col("doc_id").as("qid"), col("tok")).distinct()
      // broadcast the query-term set: the postings join touches only
      // documents sharing at least one query term, never the full corpus
      broadcast(q)
        .join(tf, Seq("tok"))
        .where(col("doc_id") =!= col("qid"))
        .join(dfr, Seq("tok"))
        .join(dl, Seq("doc_id"))
        // bounded-cross: broadcast 1-row corpus stats
        .crossJoin(broadcast(stats))
        .withColumn("c", expr(BmContribExpr))
        .groupBy("qid", "doc_id")
        .agg(sum("c").as("score_e6"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("qid").orderBy(col("score_e6").desc, col("doc_id"))))
        .where(col("rnk") <= BmTopK)
        .select("qid", "rnk", "doc_id", "score_e6")
    }

  def bm25Topk(spark: SparkSession, dir: String): DataFrame =
    bm25Ranked(spark, dir).orderBy("qid", "rnk")

  /** Oracle CTE chain ending in `bm_topk` (requires Ngrams.TokenCountsCtes'
    * `tf` CTE in scope). The arithmetic is textually the Spark expression
    * with table aliases. */
  private def Bm25Ctes: String =
    s"""bmdl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
       |bmstats AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS tot FROM bmdl),
       |bmdf AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
       |bmq AS (SELECT DISTINCT doc_id AS qid, tok FROM tf WHERE doc_id < $BmQueries),
       |bmcontrib AS (
       |  SELECT q.qid, t.doc_id,
       |    CAST(floor(floor(1.0e6 * (2 * s.n - 2 * f.df + 1) / (2 * f.df + 1))
       |      * (22.0 * t.tf * s.tot)
       |      / (10.0 * t.tf * s.tot + 3.0 * s.tot + 9.0 * l.dl * s.n)) AS BIGINT) AS c
       |  FROM bmq q
       |  JOIN tf t ON t.tok = q.tok AND t.doc_id <> q.qid
       |  JOIN bmdf f ON f.tok = q.tok
       |  JOIN bmdl l ON l.doc_id = t.doc_id
       |  CROSS JOIN bmstats s),
       |bmsc AS (SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS score_e6
       |  FROM bmcontrib GROUP BY qid, doc_id),
       |bm_topk AS (
       |  SELECT qid, rnk, doc_id, score_e6 FROM (
       |    SELECT qid, doc_id, score_e6,
       |           row_number() OVER (PARTITION BY qid ORDER BY score_e6 DESC, doc_id) AS rnk
       |    FROM bmsc) r WHERE rnk <= $BmTopK)""".stripMargin

  def bm25TopkSql: String =
    s"""WITH ${Ngrams.TokenCountsCtes},
       |$Bm25Ctes
       |SELECT qid, rnk, doc_id, score_e6 FROM bm_topk ORDER BY qid, rnk""".stripMargin

  // ---- retrieval_rrf: reciprocal-rank fusion of dense + lexical -----------

  /** The published constant (Cormack et al. use 60); contribution of a
    * rank-r hit is the exact integer 1e6 div (RrfC + r). */
  val RrfC = 60
  val FuseTopK = 5

  /** Fuses the exact dense list (ann_topk over the embeddings table) with
    * the BM25 lexical list at the shared query ids 0..BmQueries-1 (the
    * synthetic corpus aligns vec_id with doc_id). Score-free: only ranks
    * cross between the two retrievers, so a miscalibrated score scale on
    * either side cannot dominate the fusion — the reason RRF is the
    * production default for hybrid search. All-integer, order-independent
    * aggregation; both lists are queries×k rows. */
  def retrievalRrf(spark: SparkSession, dir: String): DataFrame = {
    val ann = Similarity.annTopk(spark, dir)
      .select(col("qid"), col("cid").as("id"), col("rnk"))
    val bm = bm25Ranked(spark, dir)
      .select(col("qid"), col("doc_id").as("id"), col("rnk"))
    ann.unionByName(bm)
      .withColumn("c", expr(s"CAST(1000000 div ($RrfC + rnk) AS BIGINT)"))
      .groupBy("qid", "id")
      .agg(sum("c").as("rrf_e6"), count(lit(1)).as("n_lists"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("rrf_e6").desc, col("id"))))
      .where(col("rnk") <= FuseTopK)
      .select("qid", "rnk", "id", "rrf_e6", "n_lists")
      .orderBy("qid", "rnk")
  }

  def retrievalRrfSql: String =
    s"""WITH ${Similarity.VecCte},
       |${Similarity.BruteScoredCte},
       |${Ngrams.TokenCountsCtes},
       |$Bm25Ctes,
       |annl AS (
       |  SELECT qid, cid AS id, rnk FROM (
       |    SELECT qid, cid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |    FROM bscored) r WHERE rnk <= ${Similarity.TopK}),
       |bml AS (SELECT qid, doc_id AS id, rnk FROM bm_topk),
       |fused AS (
       |  SELECT qid, id, CAST(1000000 // ($RrfC + rnk) AS BIGINT) AS c
       |  FROM (SELECT * FROM annl UNION ALL SELECT * FROM bml)),
       |fsc AS (
       |  SELECT qid, id, CAST(sum(c) AS BIGINT) AS rrf_e6,
       |         CAST(count(*) AS BIGINT) AS n_lists
       |  FROM fused GROUP BY qid, id),
       |fr AS (
       |  SELECT qid, id, rrf_e6, n_lists,
       |         row_number() OVER (PARTITION BY qid ORDER BY rrf_e6 DESC, id) AS rnk
       |  FROM fsc)
       |SELECT qid, rnk, id, rrf_e6, n_lists FROM fr WHERE rnk <= $FuseTopK
       |ORDER BY qid, rnk""".stripMargin

  // ---- dsir_weights: hashed-n-gram importance weights for data selection --

  val DsirBuckets = 256

  /** The "target domain" the selection is steered toward: in production
    * this is a curated high-quality corpus (the DSIR paper uses
    * Wikipedia+books); here source src0 stands in and the remaining
    * sources are the raw pool. */
  val DsirTarget = "src0"

  /** Per-document importance weight: tokens hash into DsirBuckets buckets
    * (the same portable byte-roll hash every other text operator uses);
    * each bucket's Laplace-smoothed target/raw frequency ratio becomes an
    * integer lift, and a document's weight is its token-count-weighted
    * mean lift (e6 fixed-point). Log-free by design — DSIR's
    * log-likelihood ratio needs ln(), which is not bit-portable across
    * engines; the lift ratio preserves the per-bucket ordering and keeps
    * every arithmetic step exact or IEEE-identical. Downstream, these
    * weights feed sample_weighted — selection itself is already an
    * operator. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val bt = Ngrams.tfFrame(spark, dir)
      .withColumn("b", graft.functions.HashExprs
        .byteRollHash(col("tok"), TextStats.FpPrime, TextStats.FpMod) % DsirBuckets)
      .join(docs, "doc_id")
    val agg = bt.groupBy("b").agg(
      sum(when(col("source") === DsirTarget, col("tf")).otherwise(0L)).as("tgt_n"),
      sum(when(col("source") =!= DsirTarget, col("tf")).otherwise(0L)).as("raw_n"))
    val tots = agg.agg(sum("tgt_n").as("tgt_tot"), sum("raw_n").as("raw_tot"))
    // bounded-cross: broadcast 1-row totals
    val lift = agg.crossJoin(broadcast(tots))
      .withColumn("lift_e6", expr(
        s"CAST(floor(1.0e6 * (tgt_n + 1) * (raw_tot + $DsirBuckets)" +
          s" / ((raw_n + 1) * 1.0 * (tgt_tot + $DsirBuckets))) AS BIGINT)"))
      .select("b", "lift_e6")
    // the bucket table is DsirBuckets rows however large the corpus —
    // broadcast it back over the token stream; per-doc reduce is one
    // map-side-combined aggregation
    bt.join(broadcast(lift), "b")
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("lift_e6")).as("s"), sum("tf").as("n_toks"))
      .join(docs, "doc_id")
      .select(col("doc_id"), col("source"), col("n_toks"),
        expr("CAST(s div n_toks AS BIGINT)").as("imp_e6"))
      .orderBy("doc_id")
  }

  def dsirWeightsSql: String =
    s"""WITH ${Ngrams.TokenCountsCtes},
       |bt AS (
       |  SELECT t.doc_id, ${TextStats.fpSql("t.tok")} % $DsirBuckets AS b, t.tf, d.source
       |  FROM tf t JOIN documents d ON d.doc_id = t.doc_id),
       |bagg AS (
       |  SELECT b,
       |    CAST(sum(CASE WHEN source = '$DsirTarget' THEN tf ELSE 0 END) AS BIGINT) AS tgt_n,
       |    CAST(sum(CASE WHEN source <> '$DsirTarget' THEN tf ELSE 0 END) AS BIGINT) AS raw_n
       |  FROM bt GROUP BY b),
       |btots AS (SELECT CAST(sum(tgt_n) AS BIGINT) AS tgt_tot,
       |                 CAST(sum(raw_n) AS BIGINT) AS raw_tot FROM bagg),
       |blift AS (
       |  SELECT b, CAST(floor(1.0e6 * (tgt_n + 1) * (raw_tot + $DsirBuckets)
       |    / ((raw_n + 1) * 1.0 * (tgt_tot + $DsirBuckets))) AS BIGINT) AS lift_e6
       |  FROM bagg CROSS JOIN btots),
       |bsc AS (
       |  SELECT bt.doc_id, CAST(sum(bt.tf * l.lift_e6) AS BIGINT) AS s,
       |         CAST(sum(bt.tf) AS BIGINT) AS n_toks
       |  FROM bt JOIN blift l ON l.b = bt.b GROUP BY bt.doc_id)
       |SELECT c.doc_id, d.source, c.n_toks, CAST(c.s // c.n_toks AS BIGINT) AS imp_e6
       |FROM bsc c JOIN documents d ON d.doc_id = c.doc_id
       |ORDER BY c.doc_id""".stripMargin
}
