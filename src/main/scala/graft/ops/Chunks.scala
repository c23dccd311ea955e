package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Document chunking and chunk-level corpus hygiene (SURVEY.md §2 rows
  * 52-54): overlapping token-window chunks, cross-document boilerplate
  * detection, and a Bloom-filter eval-set membership prefilter.
  *
  * Chunking is the unit step of a context-window training pipeline: long
  * documents become overlapping token windows, each fingerprinted with the
  * same rolling polynomial hash the document fingerprints use, so chunk
  * identity is comparable corpus-wide. The chunk frame is a narrow
  * projection + one generator (`posexplode`) over the scan — no shuffle —
  * and is memoized per (session, dir) because its four consumers
  * (chunk report, boilerplate, Bloom prefilter, incremental dedup)
  * share it.
  *
  * Scale: chunks-per-doc is n_tokens/stride, so the frame is a small
  * constant factor over the corpus and partitions exactly like the scan.
  * The 31-bit chunk fingerprint can conflate distinct chunks (~n²/2^32
  * expected collisions); at real corpus scale the same plan runs with the
  * 63-bit SimHash-style widening — the width is a constant here, chosen to
  * stay bit-reproducible in the DuckDB oracle.
  */
object Chunks {

  val ChunkTokens = 32
  val ChunkStride = 24

  /** One row per (doc, chunk): overlapping ChunkTokens-wide windows every
    * ChunkStride tokens. Chunk text is dropped after fingerprinting so the
    * persisted shared frame stays lean. */
  def chunkFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"chunks.frame:$dir") {
      val toks = split(col("text"), " ")
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), toks.as("toks"),
          size(toks).as("n_tok"))
        .where(col("n_tok") > 0)
        .select(col("doc_id"), col("source"), col("toks"), col("n_tok"),
          posexplode(sequence(lit(0), col("n_tok") - 1, lit(ChunkStride))))
        .withColumn("chunk",
          array_join(slice(col("toks"), col("col") + 1, lit(ChunkTokens)), " "))
        .select(col("doc_id"), col("source"),
          col("pos").cast("long").as("chunk_idx"),
          col("col").cast("long").as("start_tok"),
          least(lit(ChunkTokens), col("n_tok") - col("col"))
            .cast("long").as("n_chunk_tokens"),
          graft.functions.HashExprs
            .byteRollHash(col("chunk"), TextStats.FpPrime, TextStats.FpMod)
            .as("chunk_fp"))
    }

  /** Shared DuckDB CTE mirroring [[chunkFrame]]. */
  val ChunksCte: String =
    s"""chunks AS (
       |  SELECT doc_id, source,
       |         CAST(s // $ChunkStride AS BIGINT) AS chunk_idx,
       |         CAST(s AS BIGINT) AS start_tok,
       |         CAST(least($ChunkTokens, n_tok - s) AS BIGINT) AS n_chunk_tokens,
       |         ${TextStats.fpSql(s"array_to_string(list_slice(toks, s + 1, s + $ChunkTokens), ' ')")} AS chunk_fp
       |  FROM (SELECT doc_id, source,
       |               string_split(text, ' ') AS toks,
       |               len(string_split(text, ' ')) AS n_tok,
       |               unnest(range(0, len(string_split(text, ' ')), $ChunkStride)) AS s
       |        FROM documents
       |        WHERE len(string_split(text, ' ')) > 0) t)""".stripMargin

  // ---- doc_chunks ---------------------------------------------------------

  def docChunks(spark: SparkSession, dir: String): DataFrame =
    chunkFrame(spark, dir)
      .select("doc_id", "chunk_idx", "start_tok", "n_chunk_tokens", "chunk_fp")
      .orderBy("doc_id", "chunk_idx")

  val docChunksSql: String =
    s"""WITH $ChunksCte
       |SELECT doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_fp
       |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin

  // ---- chunk_boilerplate --------------------------------------------------

  /** Chunks repeated across ≥2 distinct documents — the boilerplate /
    * template detector (headers, navigation, license blocks at web scale).
    * One groupBy on the chunk fingerprint; the distinct-doc count is a
    * partial-aggregated count over the already-shuffled group, and output
    * size is bounded by the number of REPEATED chunks, which is tiny
    * relative to the corpus. */
  def chunkBoilerplate(spark: SparkSession, dir: String): DataFrame =
    chunkFrame(spark, dir)
      .groupBy("chunk_fp")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_occ"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .where(col("n_docs") >= 2)
      .orderBy("chunk_fp")

  val chunkBoilerplateSql: String =
    s"""WITH $ChunksCte
       |SELECT chunk_fp, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM chunks GROUP BY chunk_fp
       |HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY chunk_fp""".stripMargin

  // ---- dedup_incremental --------------------------------------------------

  /** Incremental ingest dedup at chunk granularity: documents of the new
    * batch (doc_id ≡ 3 mod 4 stands in for "this ingest") are scored by
    * how many of their chunks already exist in the historical corpus
    * (everything else); a batch document is kept only when ALL its chunks
    * are unseen. This is the per-ingest step a continuously-fed corpus
    * runs instead of re-deduping 100 TB from scratch. The join is
    * fp-keyed and co-partitioned; at scale history is the huge side and
    * the day's batch the small one, so AQE picks a broadcast or a shuffle
    * join from actual sizes — neither side is ever crossed. */
  val BatchMod = 4L

  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val ch = chunkFrame(spark, dir)
    val hist = ch.where(col("doc_id") % BatchMod =!= BatchMod - 1)
      .select(col("chunk_fp").as("h_fp")).distinct()
    ch.where(col("doc_id") % BatchMod === BatchMod - 1)
      .join(hist, col("chunk_fp") === col("h_fp"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("h_fp").isNotNull, 1L).otherwise(0L)).as("n_seen"))
      .withColumn("keep", when(col("n_seen") === 0, 1L).otherwise(0L))
      .orderBy("doc_id")
  }

  val dedupIncrementalSql: String =
    s"""WITH $ChunksCte,
       |hist AS (
       |  SELECT DISTINCT chunk_fp AS h_fp FROM chunks
       |  WHERE doc_id % $BatchMod <> ${BatchMod - 1})
       |SELECT c.doc_id, count(*) AS n_chunks,
       |       CAST(sum(CASE WHEN h.h_fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
       |       CAST(CASE WHEN sum(CASE WHEN h.h_fp IS NOT NULL THEN 1 ELSE 0 END) = 0
       |            THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM chunks c
       |LEFT JOIN hist h ON c.chunk_fp = h.h_fp
       |WHERE c.doc_id % $BatchMod = ${BatchMod - 1}
       |GROUP BY c.doc_id
       |ORDER BY c.doc_id""".stripMargin

  // ---- source_overlap -----------------------------------------------------

  /** Cross-source contamination matrix: for every ordered source pair,
    * how many distinct chunk fingerprints they share — the corpus-level
    * view the per-document decontaminators drill into. The join runs on
    * the per-SOURCE distinct fp set (not per-document), so fan-out per
    * fp is bounded by the source count, and fps present in more than
    * [[MaxChunkDf]] sources are dropped first (decontaminate's
    * hot-shingle rationale: ubiquitous boilerplate carries no pairing
    * signal, and at a catalog with thousands of sources it would
    * dominate the self-join). Output is at most #sources² rows. */
  val MaxChunkDf = 100L

  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val perSrc = chunkFrame(spark, dir)
      .select("source", "chunk_fp").distinct()
    val cool = perSrc.groupBy("chunk_fp")
      .agg(count(lit(1)).as("df"))
      .where(col("df") <= MaxChunkDf)
      .select("chunk_fp")
    val sp = perSrc.join(cool, Seq("chunk_fp"))
    sp.select(col("chunk_fp"), col("source").as("src_a"))
      .join(sp.select(col("chunk_fp"), col("source").as("src_b")), Seq("chunk_fp"))
      .where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared_fps"))
      .orderBy("src_a", "src_b")
  }

  val sourceOverlapSql: String =
    s"""WITH $ChunksCte,
       |per_src AS (
       |  SELECT DISTINCT source, chunk_fp FROM chunks),
       |cool AS (
       |  SELECT chunk_fp FROM per_src
       |  GROUP BY chunk_fp HAVING count(*) <= $MaxChunkDf)
       |SELECT a.source AS src_a, b.source AS src_b,
       |       count(*) AS n_shared_fps
       |FROM per_src a
       |JOIN cool c ON a.chunk_fp = c.chunk_fp
       |JOIN per_src b ON a.chunk_fp = b.chunk_fp
       |WHERE a.source < b.source
       |GROUP BY src_a, src_b
       |ORDER BY src_a, src_b""".stripMargin

  // ---- bloom_decontaminate ------------------------------------------------

  /** Bloom-filter eval-set membership prefilter: the eval corpus (source
    * 'src0', same held-out convention as [[Dedup.decontaminate]]) sets
    * k=3 bit positions per chunk fingerprint in an m=8192-bit filter;
    * every train chunk whose 3 positions are all set is flagged, then
    * exact fp membership labels it true hit vs Bloom false positive.
    *
    * This is the scale pattern for "have we seen this before" against a
    * reference set: the bit table is AT MOST m rows no matter how large
    * the eval corpus grows, so the probe side is three broadcast
    * left-semi joins over a narrow scan — the train corpus is never
    * shuffled. The verification join broadcasts the distinct eval
    * fingerprints (bounded by the eval set, which is small by
    * definition). False positives are the expected Bloom behavior and are
    * labeled, not hidden: at fill ratio p the FP rate is p³.
    *
    * Positions use the shard-router trick (prime reduction before the
    * power-of-two modulus) so fingerprint low-bit structure cannot leak
    * into bit positions. */
  val BloomBits = 8192L
  val BloomM1: Long = graft.functions.HashExprs.Mix1
  val BloomM2: Long = graft.functions.HashExprs.Mix2
  val BloomM3: Long = graft.functions.HashExprs.Mix3

  private def pos(m: Long): Column =
    col("chunk_fp") * m % TextStats.FpMod % BloomBits

  /** Oracle twin of [[pos]] — one definition for all six SQL uses. */
  private def posSql(m: Long): String =
    s"chunk_fp * $m % ${TextStats.FpMod} % $BloomBits"

  def bloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val chunks = chunkFrame(spark, dir)
    val evalFps = chunks.where(col("source") === Dedup.EvalSource)
      .select("chunk_fp").distinct()
    val bits = evalFps
      .select(explode(array(pos(BloomM1), pos(BloomM2), pos(BloomM3))).as("bit"))
      .distinct()
    // one broadcast bit table probed three times: identical right-side
    // subtrees let Spark plan a single BroadcastExchange + ReusedExchange
    // instead of three copies (renamed frames would defeat the reuse)
    val b = broadcast(bits)
    chunks.where(col("source") =!= Dedup.EvalSource)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_fp"),
        pos(BloomM1).as("p1"), pos(BloomM2).as("p2"), pos(BloomM3).as("p3"))
      .join(b, col("p1") === b("bit"), "left_semi")
      .join(b, col("p2") === b("bit"), "left_semi")
      .join(b, col("p3") === b("bit"), "left_semi")
      .join(broadcast(evalFps.withColumnRenamed("chunk_fp", "efp")),
        col("chunk_fp") === col("efp"), "left")
      .select(col("doc_id"), col("chunk_idx"), col("chunk_fp"),
        when(col("efp").isNotNull, 1L).otherwise(0L).as("exact_hit"))
      .orderBy("doc_id", "chunk_idx")
  }

  val bloomDecontaminateSql: String =
    s"""WITH $ChunksCte,
       |efps AS (
       |  SELECT DISTINCT chunk_fp FROM chunks WHERE source = '${Dedup.EvalSource}'),
       |bits AS (
       |  SELECT DISTINCT bit FROM (
       |    SELECT unnest([${posSql(BloomM1)},
       |                   ${posSql(BloomM2)},
       |                   ${posSql(BloomM3)}]) AS bit
       |    FROM efps) u),
       |probes AS (
       |  SELECT doc_id, chunk_idx, chunk_fp,
       |         ${posSql(BloomM1)} AS p1,
       |         ${posSql(BloomM2)} AS p2,
       |         ${posSql(BloomM3)} AS p3
       |  FROM chunks WHERE source <> '${Dedup.EvalSource}')
       |SELECT p.doc_id, p.chunk_idx, p.chunk_fp,
       |       CAST(CASE WHEN e.chunk_fp IS NULL THEN 0 ELSE 1 END AS BIGINT) AS exact_hit
       |FROM probes p
       |JOIN bits b1 ON p.p1 = b1.bit
       |JOIN bits b2 ON p.p2 = b2.bit
       |JOIN bits b3 ON p.p3 = b3.bit
       |LEFT JOIN efps e ON p.chunk_fp = e.chunk_fp
       |ORDER BY p.doc_id, p.chunk_idx""".stripMargin

  // ---- content_chunks: content-defined chunking ---------------------------

  /** Content-defined chunking at token granularity: a chunk boundary
    * falls wherever the TOKEN's own hash lands in a fixed residue class
    * (1-in-BoundaryMod tokens on average), so boundaries are a function
    * of CONTENT, not position. That is the property the fixed-stride
    * chunker above cannot give: insert one token near the front of a
    * document and every stride window after it shifts (all fingerprints
    * change), while content-defined boundaries re-synchronize at the
    * next boundary token and every later chunk fingerprint survives —
    * the dedup-robustness trick of CDC storage systems (LBFS/rsync
    * lineage), applied to corpus chunking.
    *
    * Scale shape: boundary flags are stateless per-token math in the
    * scan; the chunk index is a per-document running sum (window
    * partitioned by doc_id — one document per partition group, the same
    * shape as sessionize), and chunk assembly is a per-(doc, chunk)
    * groupBy whose groups are bounded by chunk length. No corpus-global
    * state anywhere. */
  val BoundaryMod = 8

  def contentChunks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val P = Pipeline.HashModPrime
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val tokFp = graft.functions.HashExprs
      .byteRollHash(col("tok"), TextStats.FpPrime, TextStats.FpMod)
    val wex = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("flag",
        when(tokFp % P * graft.functions.HashExprs.Mix3 % P % BoundaryMod === 0, 1L)
          .otherwise(0L))
      .withColumn("chunk_idx", coalesce(sum("flag").over(wex), lit(0L)))
      .groupBy("doc_id", "chunk_idx")
      .agg(
        min(col("pos")).cast("long").as("start_tok"),
        count(lit(1)).as("n_toks"),
        graft.functions.HashExprs.byteRollHash(
          array_join(
            transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
              s => s.getField("tok")), " "),
          TextStats.FpPrime, TextStats.FpMod).as("chunk_fp"))
      .orderBy("doc_id", "chunk_idx")
  }

  val contentChunksSql: String = {
    val P = Pipeline.HashModPrime
    val mix = graft.functions.HashExprs.Mix3
    s"""WITH tk AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |px AS (
       |  SELECT doc_id, tk, unnest(range(0, len(tk))) AS pos FROM tk),
       |t AS (
       |  SELECT doc_id, CAST(pos AS BIGINT) AS pos, tk[pos + 1] AS tok FROM px),
       |f AS (
       |  SELECT doc_id, pos, tok,
       |         CASE WHEN (${TextStats.fpSql("tok")} % $P * $mix) % $P % $BoundaryMod = 0
       |              THEN 1 ELSE 0 END AS flag
       |  FROM t),
       |c AS (
       |  SELECT doc_id, pos, tok,
       |         CAST(coalesce(sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk_idx
       |  FROM f)
       |SELECT doc_id, chunk_idx,
       |       CAST(min(pos) AS BIGINT) AS start_tok,
       |       count(*) AS n_toks,
       |       ${TextStats.fpSql("string_agg(tok, ' ' ORDER BY pos)")} AS chunk_fp
       |FROM c GROUP BY doc_id, chunk_idx
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }
}
