package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the embeddings table: brute-force cosine top-k,
  * random-hyperplane LSH top-k, and bucketed near-duplicate pairs
  * (SURVEY.md §2 rows 22-24).
  *
  * Determinism: components are quantized to 1e-4 ticks (floor(x*1e4+0.5),
  * identical IEEE double math in Spark and DuckDB), so dot products and
  * squared norms are exact int64 sums; cosine is then ONE deterministic
  * double expression dot/(sqrt(na)*sqrt(nb)) — bit-identical on both
  * engines — and is emitted floor'd to 1e-6 fixed point.
  *
  * Scale shape (100 TB): the brute-force path exists only for a bounded,
  * broadcast query set (k×N scan, no shuffle of the candidate side); the
  * scale path is banded multi-table hyperplane LSH — NumTables
  * independent tables of PlanesPerTable hyperplanes each. Candidate
  * pairs come ONLY from same-(table, bucket) equi-joins over a NARROW
  * signature frame (vec_id, tbl, bucket), deduped BEFORE the 64-dim
  * scoring join — never an all-pairs cross join, and each surviving
  * pair is scored exactly once however many tables it collides in.
  *
  * Sizing rule (the knob that must move with N): expected bucket
  * population is N/2^p, so candidate pairs ≈ L·N²/2^(p+1) — pick
  * p ≈ log2(N/B) for a target per-bucket population B (keeps the
  * pair count ≈ L·N·B/2, linear in N), then pick L for recall
  * (per-table collision for angle θ is (1−θ/π)^p; union over L
  * tables gives 1−(1−(1−θ/π)^p)^L — raising p for scale is paid
  * back by raising L, and `ann_recall` certifies the trade on the
  * actual corpus). Defaults p=6, L=8 spend the SAME candidate budget
  * as a single 16-bucket table (L·N²/2^(p+1) = N²/16) with a far
  * better recall curve for genuinely-near neighbors (at per-table
  * collision 0.8^p the union reaches 0.91 vs 0.41 single-table);
  * the 5-query test corpus is too small to resolve that curve, which
  * is exactly why `ann_recall` exists as a harness to re-run at the
  * deployment's own N and query load before trusting a setting. A
  * 100 TB corpus (N≈1e9, B≈4k) wants p≈18, L≈16 — override via
  * GRAFT_LSH_PLANES / GRAFT_LSH_TABLES, which both the Spark plan
  * and the generated oracle SQL read, so the mirror never splits.
  */
object Similarity {

  val Dim = 64
  // defs, not vals: a re-configured environment must never be pinned by a
  // stale object initialization (the knobs are still env-stable within one
  // JVM — the memo keys below carry their values so cached frames can't
  // outlive a setting)
  def PlanesPerTable: Int = graft.Knobs.lshPlanes
  def NumTables: Int = graft.Knobs.lshTables

  /** Deterministic ±1 hyperplane weights, w(j)(i) for i in 0..63: the sign
    * bit of a splitmix64 finalizer over the (plane, component) pair. The
    * weights are computed ONCE at plan-build time and embedded as literals
    * in both the Spark plan and the generated oracle SQL, so the two sides
    * cannot diverge. A full-width integer mix (multiply-xor-shift) is
    * required here: the previous modular-arithmetic generator was periodic
    * in j with period 97, so any sizing past 97 total planes (the 100 TB
    * override is 18×16 = 288) silently produced duplicate/correlated
    * tables — HyperplaneSpec now pins all 288 planes distinct and
    * non-degenerate. */
  def wVec(j: Int): Seq[Long] =
    (1 to Dim).map { i =>
      var z = j.toLong * 0x9E3779B97F4A7C15L + i.toLong
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= (z >>> 31)
      if (z < 0L) -1L else 1L
    }

  /** Quantize float components to int64 1e-4 ticks (shared with the
    * streaming router, so stream-side quantization is bit-identical). */
  private[graft] val quant: Column =
    transform(col("embedding"), x => floor(x * lit(10000.0) + lit(0.5)))

  private def dot(a: Column, b: Column): Column =
    graft.functions.HashExprs.longDot(a, b)

  /** vec_id, qv (quantized), n2 (squared norm), buckets (one hyperplane
    * signature per LSH table). Persisted (memory+disk): every similarity
    * query self-joins this frame, and quantization + L·p signature dot
    * products per row are the dominant per-vector cost — the
    * materialize-signatures step of distributed ANN. */
  private def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.vectors:$PlanesPerTable:$NumTables:$dir") {
      val base = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label").cast("long").as("label"), quant.as("qv"))
        .withColumn("n2", dot(col("qv"), col("qv")))
        // a vector whose components all quantize to zero has no direction:
        // keep it out rather than let cos = 0/0 produce NaN (which Spark
        // would floor to 0 while DuckDB errors on the BIGINT cast)
        .where(col("n2") > 0)
      // one fused expression for ALL tables×planes signature dots: the
      // per-plane `when(dot > 0, 1<<p)` sum form is hundreds of separate
      // dot expressions at derived 100 TB sizings, which overflows the
      // codegen method budget and drops the build to interpreted eval
      // (same integer math either way — see LshSignaturesExpr)
      val flat = Array.tabulate(NumTables * PlanesPerTable * Dim) { x =>
        wVec(x / Dim)(x % Dim)
      }
      base.withColumn("buckets",
        graft.functions.HashExprs.lshSignatures(
          col("qv"), flat, NumTables, PlanesPerTable))
        // qs: the int16-packed twin of qv (128 B vs 512 B + offsets) for
        // the pair paths that re-shuffle a vector payload per CANDIDATE —
        // same integers, so every dot/cosine is bit-identical
        .withColumn("qs", graft.functions.HashExprs.packShorts(col("qv")))
    }

  private def cosine(dotC: Column, na2: Column, nb2: Column): Column =
    dotC.cast("double") / (sqrt(na2.cast("double")) * sqrt(nb2.cast("double")))

  private def cosE6(c: Column): Column = floor(c * lit(1000000.0)).cast("long")

  import org.apache.spark.sql.expressions.Window

  // ---- identical-vector collapse (round 11) --------------------------------
  //
  // The round-8 rep collapse, applied to the EMBEDDING side: every pair
  // operator below used to join at MEMBER level, so byte-identical
  // vectors (the 100 TB reality the stress sets model at 100-1000 copies
  // per vector: re-crawls, mirrors, template pages embed identically)
  // made every bucket/cell join quadratic in duplicate multiplicity —
  // the 1000× point spilled >45 GB of candidate shuffle and aborted.
  // All similarity statistics (dot, n2, buckets, cells) are pure
  // functions of the quantized vector, so the candidate space collapses
  // to DISTINCT quantized vectors and member-level results are restored
  // by id arithmetic afterwards — outputs bit-identical to the naive
  // member-level joins (DupCollapseSpec proves it on a copy-heavy
  // corpus; the oracles, which still compute the naive member-level
  // form, prove it per query at the correctness gate).

  /** (vec_id, gid): member → group-representative (min vec_id over the
    * identical-qv group). One shuffle on the quantized vector. */
  private def vecMembers(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.vecMembers:$dir") {
      vectors(spark, dir).select(col("vec_id"), col("qv"))
        .withColumn("gid", min("vec_id").over(Window.partitionBy("qv")))
        .select("vec_id", "gid")
    }

  /** One row per DISTINCT quantized vector: the rep's payload columns
    * plus the member count. qs/n2/buckets are functions of qv, so the
    * rep row carries them for the whole group. */
  private def vecGroups(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.vecGroups:$PlanesPerTable:$NumTables:$dir") {
      val cnt = vecMembers(spark, dir).groupBy("gid").agg(count(lit(1)).as("cnt"))
      vectors(spark, dir).join(cnt, col("vec_id") === col("gid"))
        .select(col("gid"), col("qv"), col("qs"), col("n2"), col("buckets"), col("cnt"))
    }

  /** The self-cosine through the SAME IEEE expression the pair paths
    * use: n2/(sqrt(n2)·sqrt(n2)) is NOT exactly 1.0 for every n2 (sqrt
    * rounds), and the collapse must reproduce the naive member-pair
    * value bit-for-bit — never substitute a 1.0 literal. */
  private def selfCos(n2: Column): Column = cosine(n2, n2, n2)

  // ---- ann_topk: brute-force cosine top-k for a bounded query set ---------

  val NumQueries = 5
  val TopK = 5

  /** Shared brute-force neighbor scan: every vector scored against the
    * broadcast query set, ranked per query by (cos desc, vec_id), cut at
    * k. Both ann_topk and knn_classify derive from this one definition so
    * the scoring/tie-break rule cannot silently diverge between them. */
  private def scoredNeighbors(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val v = vectors(spark, dir)
    val q = v.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qa"), col("n2").as("qn2"))
    // bounded-cross: broadcast query table, <= NumQueries rows (N-independent seed set)
    v.crossJoin(broadcast(q))
      .where(col("qid") =!= col("vec_id"))
      .withColumn("cos", cosine(dot(col("qa"), col("qv")), col("qn2"), col("n2")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rnk") <= k)
  }

  /** Test probe into the shared neighbor scan (Dedup.shingleSetsProbe
    * pattern): specs recompute the vote from this exact frame. */
  def scoredNeighborsProbe(spark: SparkSession, dir: String, k: Int): DataFrame =
    scoredNeighbors(spark, dir, k)

  /** The brute-force ranked list as a shared memoized frame (round 12):
    * ann_topk serves it, and ann_agreement re-reads it instead of
    * re-running the scan — on a cluster the serving lists are a shared
    * query-time artifact exactly like the index frames below them.
    * NumQueries×TopK rows; the persist is bookkeeping, not storage. */
  private def listExact(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.listExact:$dir") {
      scoredNeighbors(spark, dir, TopK)
        .select(col("qid"), col("rnk"), col("vec_id").as("cid"), cosE6(col("cos")).as("cos_e6"))
    }

  def annTopk(spark: SparkSession, dir: String): DataFrame =
    listExact(spark, dir).orderBy("qid", "rnk")

  // ---- banded LSH candidate generation (shared by ann_lsh, cosine dup,
  //      ann_recall) ---------------------------------------------------------

  val LshK = 3

  /** Scored undirected candidate pairs, the heart of the LSH index.
    * Three deliberate moves for the 100 TB shape:
    *   1. the self-join runs over the NARROW (vec_id, tbl, bucket)
    *      signature frame — the 64-dim payload never rides the
    *      candidate shuffle;
    *   2. pairs are deduped (groupBy aid, bid) BEFORE scoring, so a
    *      pair colliding in k tables is scored once, not k times —
    *      n_tbl keeps the collision count as an audit column;
    *   3. the payload is fetched by two hash joins against the
    *      persisted vectors frame only for pairs that survived dedup.
    * Persisted: annLsh ranks it directed, embedCosineDup thresholds it,
    * annRecall re-reads it through annLsh. */
  /** DISTINCT-vector scored candidate pairs (ga < gb): the same three
    * moves as ever — narrow signature self-join, dedup before scoring,
    * packed payload fetch — but over [[vecGroups]], so the bucket join
    * is flat in duplicate multiplicity. Within-group "pairs" are
    * implicit (identical buckets collide in every table: n_tbl =
    * NumTables, cos = [[selfCos]]) and are re-attached arithmetically
    * by the consumers that need member-level rows. */
  private def repScoredPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.repScored:$PlanesPerTable:$NumTables:$dir") {
      val g = vecGroups(spark, dir)
      val s = g.select(col("gid"),
        posexplode(col("buckets")).as(Seq("tbl", "bucket")))
      val a = s.select(col("gid").as("ga"), col("tbl"), col("bucket"))
      val b = s.select(col("gid").as("gb"), col("tbl").as("tbl_b"),
        col("bucket").as("bucket_b"))
      val cand = a.join(b,
          col("tbl") === col("tbl_b") && col("bucket") === col("bucket_b")
            && col("ga") < col("gb"))
        .groupBy("ga", "gb").agg(count(lit(1)).as("n_tbl"))
      // ship the PACKED vector through the per-candidate shuffles: the
      // candidate side re-shuffles one payload per pair, so payload
      // width IS the build cost — 128 B packed vs 512 B + offsets as
      // array<long>, bit-identical dots
      val pa = g.select(col("gid").as("ga"), col("qs").as("qa"), col("n2").as("na2"))
      val pb = g.select(col("gid").as("gb"), col("qs").as("qb"), col("n2").as("nb2"))
      cand.join(pa, "ga").join(pb, "gb")
        .withColumn("cos", cosine(
          graft.functions.HashExprs.shortDot(col("qa"), col("qb")),
          col("na2"), col("nb2")))
        .select("ga", "gb", "n_tbl", "cos")
    }

  /** The member-level expansion of [[repScoredPairs]] — EXACTLY the frame
    * the old member-level bucket join produced (a member pair is a
    * candidate iff its group pair is, with the same n_tbl and cos; an
    * identical pair collides in every table at the self-cosine), but the
    * quadratic term is now only the OUTPUT rows, never the join. Consumed
    * by the expanded-contract opt-in report alone. */
  private def scoredPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.scoredPairs:$PlanesPerTable:$NumTables:$dir") {
      val m = vecMembers(spark, dir)
      val cross = repScoredPairs(spark, dir)
        .join(m.select(col("gid").as("ga"), col("vec_id").as("da")), "ga")
        .join(m.select(col("gid").as("gb"), col("vec_id").as("db")), "gb")
        .select(least(col("da"), col("db")).as("aid"),
          greatest(col("da"), col("db")).as("bid"), col("n_tbl"), col("cos"))
      val within = m.as("x")
        .join(m.as("y"),
          col("x.gid") === col("y.gid") && col("x.vec_id") < col("y.vec_id"))
        .join(vecGroups(spark, dir).select(col("gid").as("wgid"), col("n2")),
          col("x.gid") === col("wgid"))
        .select(col("x.vec_id").as("aid"), col("y.vec_id").as("bid"),
          lit(NumTables.toLong).as("n_tbl"), selfCos(col("n2")).as("cos"))
      cross.unionByName(within)
    }

  // ---- ann_lsh: banded-LSH top-k for every vector --------------------------

  def annLsh(spark: SparkSession, dir: String): DataFrame =
    listLsh(spark, dir).orderBy("aid", "rnk")

  /** The full directed LSH top-k list, memoized ([[listExact]] note):
    * ann_lsh serves it; ann_recall and ann_agreement re-read it. N×k
    * rows — the size of the query's own output, already paid once. */
  private def listLsh(spark: SparkSession, dir: String): DataFrame =
   Tables.memoPersist(spark, s"sim.listLsh:$PlanesPerTable:$NumTables:$dir") {
    // Collapsed top-k (round 11): every member of a group has the SAME
    // ranked neighbor list except for the exclusion of itself — cos and
    // n_tbl are functions of the group pair, and ties rank by bid. So
    // the per-member top-k is the group's top-(k+1) entry prefix (built
    // over directed rep pairs + the group's own members at the
    // self-cosine, each target group contributing only its k+1 smallest
    // member ids — any group puts at most k+1 entries in the prefix,
    // and they are its smallest ids) with the member itself dropped and
    // the list cut at k. Every join is prefix- or output-sized; nothing
    // scales with duplicate multiplicity squared.
    val kp = LshK + 1
    val m = vecMembers(spark, dir)
    val prefix = m
      .withColumn("pos", row_number().over(
        Window.partitionBy("gid").orderBy("vec_id")))
      .where(col("pos") <= kp)
      .select(col("gid").as("dst"), col("vec_id").as("bid"))
    val rp = repScoredPairs(spark, dir)
    val directed = rp
      .select(col("ga").as("src"), col("gb").as("dst"), col("n_tbl"), col("cos"))
      .unionByName(rp
        .select(col("gb").as("src"), col("ga").as("dst"), col("n_tbl"), col("cos")))
      .unionByName(vecGroups(spark, dir)
        .select(col("gid").as("src"), col("gid").as("dst"),
          lit(NumTables.toLong).as("n_tbl"), selfCos(col("n2")).as("cos")))
    val groupPrefix = directed.join(prefix, "dst")
      .withColumn("gr", row_number().over(
        Window.partitionBy("src").orderBy(col("cos").desc, col("bid"))))
      .where(col("gr") <= kp)
      .select(col("src").as("gid"), col("bid"), col("n_tbl"), col("cos"))
    m.join(groupPrefix, "gid")
      .where(col("bid") =!= col("vec_id"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos").desc, col("bid"))))
      .where(col("rnk") <= LshK)
      .select(col("vec_id").as("aid"), col("rnk"), col("bid"), col("n_tbl"),
        cosE6(col("cos")).as("cos_e6"))
  }

  // ---- mutual_knn: reciprocity audit of the LSH neighbor graph ------------

  /** Mutual-kNN degree histogram: how many of each vector's LSH top-k
    * neighbors rank IT back — the symmetrized-graph density check run
    * before trusting a kNN graph for clustering or SemDeDup-style
    * curation (an asymmetric hub-dominated graph fragments under
    * symmetrization). Output: mutual-degree d ∈ [0, k] → vector count +
    * e4 share.
    *
    * Scale: rides the memoized [[listLsh]] frame (N×k rows, already
    * paid by ann_lsh) — one self-equi-join on the reversed (aid, bid)
    * key, one output-sized degree aggregate, one |k|+1-row histogram;
    * nothing touches the 64-dim payload. */
  def mutualKnn(spark: SparkSession, dir: String): DataFrame = {
    val l = listLsh(spark, dir).select(col("aid"), col("bid"))
    val rev = l.select(col("bid").as("aid"), col("aid").as("bid"))
    val mutual = l.join(rev, Seq("aid", "bid")).where(col("aid") < col("bid"))
    val deg = mutual.select(col("aid").as("vid"))
      .unionByName(mutual.select(col("bid").as("vid")))
      .groupBy("vid").agg(count(lit(1)).as("deg"))
    val hist = Tables.embeddings(spark, dir).select(col("vec_id").as("vid"))
      .join(deg, Seq("vid"), "left")
      .select(coalesce(col("deg"), lit(0L)).as("mutual_degree"))
      .groupBy("mutual_degree").agg(count(lit(1)).as("n_vecs"))
    hist
      .withColumn("total", sum("n_vecs").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("mutual_degree"), col("n_vecs"),
        expr("(10000 * n_vecs) div total").as("share_e4"))
      .orderBy("mutual_degree")
  }

  /** The ORIGINAL member-level bucket join (pre-round-11 scoredPairs
    * verbatim) — the ground-truth reference DupCollapseSpec compares
    * the rep-level expansion against, since no testdata corpus carries
    * duplicate embeddings and the oracle gate therefore never
    * exercises the within-group paths. NEVER registered as a query. */
  private[graft] def scoredPairsMemberProbe(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val s = v.select(col("vec_id"),
      posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val a = s.select(col("vec_id").as("aid"), col("tbl"), col("bucket"))
    val b = s.select(col("vec_id").as("bid"), col("tbl").as("tbl_b"),
      col("bucket").as("bucket_b"))
    val cand = a.join(b,
        col("tbl") === col("tbl_b") && col("bucket") === col("bucket_b")
          && col("aid") < col("bid"))
      .groupBy("aid", "bid").agg(count(lit(1)).as("n_tbl"))
    val pa = v.select(col("vec_id").as("aid"), col("qs").as("qa"), col("n2").as("na2"))
    val pb = v.select(col("vec_id").as("bid"), col("qs").as("qb"), col("n2").as("nb2"))
    cand.join(pa, "aid").join(pb, "bid")
      .withColumn("cos", cosine(
        graft.functions.HashExprs.shortDot(col("qa"), col("qb")),
        col("na2"), col("nb2")))
      .select("aid", "bid", "n_tbl", "cos")
  }

  /** The rep-level expansion under test (the [[scoredPairs]] frame). */
  private[graft] def scoredPairsExpandedProbe(spark: SparkSession, dir: String): DataFrame =
    scoredPairs(spark, dir)

  /** The pre-collapse member-level ranking, kept as the equivalence
    * reference for DupCollapseSpec — NEVER registered as a query. */
  private[graft] def annLshNaiveProbe(spark: SparkSession, dir: String): DataFrame = {
    val sp = scoredPairs(spark, dir)
    val directed = sp.union(
      sp.select(col("bid").as("aid"), col("aid").as("bid"), col("n_tbl"), col("cos")))
    directed
      .withColumn("rnk", row_number().over(
        Window.partitionBy("aid").orderBy(col("cos").desc, col("bid"))))
      .where(col("rnk") <= LshK)
      .select(col("aid"), col("rnk"), col("bid"), col("n_tbl"), cosE6(col("cos")).as("cos_e6"))
      .orderBy("aid", "rnk")
  }

  // ---- lsh_bucket_stats: LSH sizing-rule health audit ----------------------

  /** Per-table LSH bucket statistics — the observable behind the
    * self-sizing rule (Knobs.lshPlanes/lshTables target bucket
    * population B ≈ 32): per table, the occupied-bucket count, maximum
    * and mean population, singleton count, and — the number the whole
    * family budgets by — `cand_pairs` = Σ_buckets C(pop, 2), the EXACT
    * per-table candidate-join size scoredPairs will generate. Read this
    * before trusting an LSH run at a new corpus size: a max_pop in the
    * thousands or a cand_pairs far above N·B/2 means the plane
    * derivation knee was missed (skewed/duplicated vectors) and the
    * pair join below will pay for it.
    *
    * Scale shape: one posexplode of the already-memoized signature
    * column → a (tbl, bucket) count with map-side combine → a
    * NumTables-row rollup. Nothing vector-sized shuffles. */
  def lshBucketStats(spark: SparkSession, dir: String): DataFrame =
    vectors(spark, dir)
      .select(posexplode(col("buckets")).as(Seq("tbl", "bucket")))
      .groupBy("tbl", "bucket").agg(count(lit(1)).as("pop"))
      .groupBy(col("tbl").cast("long").as("tbl"))
      .agg(sum("pop").as("n_vectors"),
        count(lit(1)).as("n_buckets"),
        max("pop").as("max_pop"),
        sum(when(col("pop") === 1, 1L).otherwise(0L)).as("singletons"),
        sum(expr("pop * (pop - 1) div 2")).as("cand_pairs"))
      .withColumn("mean_pop_e4", expr(
        "CAST(floor(1.0e4 * CAST(n_vectors AS DOUBLE) / CAST(n_buckets AS DOUBLE)) AS BIGINT)"))
      .orderBy("tbl")

  def lshBucketStatsSql: String = {
    val perTable = (0 until NumTables)
      .map(t => s"SELECT $t AS tbl, bucket$t AS bucket FROM vecs")
      .mkString("\n  UNION ALL ")
    s"""WITH $VecCte,
       |lbx AS (
       |  $perTable),
       |lbp AS (
       |  SELECT tbl, bucket, CAST(count(*) AS BIGINT) AS pop
       |  FROM lbx GROUP BY tbl, bucket),
       |lbs AS (
       |  SELECT CAST(tbl AS BIGINT) AS tbl,
       |         CAST(sum(pop) AS BIGINT) AS n_vectors,
       |         CAST(count(*) AS BIGINT) AS n_buckets,
       |         CAST(max(pop) AS BIGINT) AS max_pop,
       |         CAST(sum(CASE WHEN pop = 1 THEN 1 ELSE 0 END) AS BIGINT) AS singletons,
       |         CAST(sum(pop * (pop - 1) // 2) AS BIGINT) AS cand_pairs
       |  FROM lbp GROUP BY tbl)
       |SELECT tbl, n_vectors, n_buckets, max_pop, singletons, cand_pairs,
       |  CAST(floor(1.0e4 * CAST(n_vectors AS DOUBLE) / CAST(n_buckets AS DOUBLE)) AS BIGINT) AS mean_pop_e4
       |FROM lbs ORDER BY tbl""".stripMargin
  }

  // ---- embed_cosine_dup: banded-LSH near-dup pairs --------------------------

  val DupThresholdE6 = 300000L // cos >= 0.30

  /** REP-level default (round 11 — the dedup_minhash contract split
    * applied to the embedding near-dup report): one row per
    * DISTINCT-vector qualifying pair with group sizes and the implied
    * member-pair count; within-group rows carry the self-cosine and
    * C(cnt, 2). The expanded per-copy report is the opt-in
    * [[embedCosineDupPairsFull]] — quadratic in duplicate multiplicity
    * BY CONSTRUCTION (every copy pair of a near-dup group qualifies). */
  def embedCosineDup(spark: SparkSession, dir: String): DataFrame = {
    val g = vecGroups(spark, dir)
    val cross = repScoredPairs(spark, dir)
      .withColumn("cos_e6", cosE6(col("cos")))
      .where(col("cos_e6") >= DupThresholdE6)
      .join(g.select(col("gid").as("ga"), col("cnt").as("size_a")), "ga")
      .join(g.select(col("gid").as("gb"), col("cnt").as("size_b")), "gb")
      .select(col("ga").as("rep_a"), col("gb").as("rep_b"), col("n_tbl"),
        col("cos_e6"), col("size_a"), col("size_b"),
        (col("size_a") * col("size_b")).as("n_pairs"))
    val within = g.where(col("cnt") >= 2)
      .withColumn("cos_e6", cosE6(selfCos(col("n2"))))
      .where(col("cos_e6") >= DupThresholdE6)
      .select(col("gid").as("rep_a"), col("gid").as("rep_b"),
        lit(NumTables.toLong).as("n_tbl"), col("cos_e6"),
        col("cnt").as("size_a"), col("cnt").as("size_b"),
        expr("cnt * (cnt - 1) div 2").as("n_pairs"))
    cross.unionByName(within).orderBy("rep_a", "rep_b")
  }

  /** Expanded per-copy near-dup pair report — the pre-round-11
    * embed_cosine_dup contract, opt-in (SURVEY row 180). */
  def embedCosineDupPairsFull(spark: SparkSession, dir: String): DataFrame =
    scoredPairs(spark, dir)
      .withColumn("cos_e6", cosE6(col("cos")))
      .where(col("cos_e6") >= DupThresholdE6)
      .select("aid", "bid", "n_tbl", "cos_e6")
      .orderBy("aid", "bid")

  // ---- decontaminate_semantic: eval-set leakage by embedding ---------------

  /** Semantic eval-set decontamination (SURVEY §2 row 185): label 0
    * stands in for the held-out benchmark (the embedding-side twin of
    * Dedup.EvalSource = 'src0'), and a TRAINING vector is contaminated
    * when its cosine to ANY eval vector reaches [[DupThresholdE6]] among
    * the LSH candidate pairs — the n-gram `decontaminate` pass re-run in
    * embedding space, where a paraphrased benchmark item that shares no
    * 13-gram still lands on its source. Output is the per-label audit
    * ledger (counts + worst leak), not the flag list: the decision a
    * data owner makes is "which slices are compromised".
    *
    * Scale shape: EXISTENCE, not enumeration — the flag is a max over a
    * group's eval-adjacent candidates, so the work is one narrow
    * bucket-join per the shared [[repScoredPairs]] frame (flat in
    * duplicate multiplicity) + an aggregate; no member-level pair ever
    * rides a shuffle. Within-group leakage (an identical copy of an
    * eval vector in the training set) is attached arithmetically at the
    * self-cosine, the same move as embed_cosine_dup's `within` leg. */
  val EvalLabel = 0L

  def decontaminateSemantic(spark: SparkSession, dir: String): DataFrame = {
    val mem = vecMembers(spark, dir)
      .join(vectors(spark, dir).select("vec_id", "label"), "vec_id")
    val gEval = mem.where(col("label") === EvalLabel)
      .select(col("gid")).distinct()
    val pairs = repScoredPairs(spark, dir)
    // best eval-adjacent cosine per group: cross-group via the candidate
    // frame (both directions), within-group at the self-cosine
    val cross = pairs
      .join(gEval.withColumnRenamed("gid", "gb"), "gb")
      .select(col("ga").as("gid"), col("cos"))
      .unionByName(pairs
        .join(gEval.withColumnRenamed("gid", "ga"), "ga")
        .select(col("gb").as("gid"), col("cos")))
    val self = vecGroups(spark, dir)
      .join(gEval, "gid")
      .select(col("gid"), selfCos(col("n2")).as("cos"))
    val flagged = cross.unionByName(self)
      .groupBy("gid").agg(max("cos").as("best"))
      .where(cosE6(col("best")) >= DupThresholdE6)
    mem.where(col("label") =!= EvalLabel)
      .join(flagged, Seq("gid"), "left")
      .groupBy("label")
      .agg(count(lit(1)).as("n_train"),
        sum(when(col("best").isNotNull, 1L).otherwise(0L)).as("n_flagged"),
        max(when(col("best").isNotNull, cosE6(col("best"))).otherwise(lit(-1L)))
          .as("max_cos_e6"))
      .orderBy("label")
  }

  /** Oracle twin: the naive member-level form — every training vector's
    * best cosine over its eval-side candidate pairs (identical-vector
    * pairs are ordinary candidates at member level: they share every
    * bucket), flagged at the shared τ, rolled up per label. */
  def decontaminateSemanticSql: String =
    s"""WITH $VecCte,
       |$ScoredPairsCte,
       |dsev AS (SELECT vec_id FROM vecs WHERE label = $EvalLabel),
       |dshit AS (
       |  SELECT t, max(cos) AS best FROM (
       |    SELECT s.aid AS t, s.cos FROM spaired s
       |    JOIN dsev e ON s.bid = e.vec_id
       |    UNION ALL
       |    SELECT s.bid AS t, s.cos FROM spaired s
       |    JOIN dsev e ON s.aid = e.vec_id) u
       |  GROUP BY t),
       |dsfl AS (
       |  SELECT t, best FROM dshit
       |  WHERE CAST(floor(best * 1000000.0) AS BIGINT) >= $DupThresholdE6)
       |SELECT v.label, count(*) AS n_train,
       |       CAST(sum(CASE WHEN f.best IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |       CAST(max(CASE WHEN f.best IS NOT NULL
       |                THEN CAST(floor(f.best * 1000000.0) AS BIGINT)
       |                ELSE -1 END) AS BIGINT) AS max_cos_e6
       |FROM vecs v LEFT JOIN dsfl f ON v.vec_id = f.t
       |WHERE v.label <> $EvalLabel
       |GROUP BY v.label ORDER BY v.label""".stripMargin

  // ---- ann_ivf: inverted-file index with nprobe cell search ---------------

  /** IVF parameters: NumCells centroids TRAINED by one Lloyd iteration
    * (deterministic init from the first NumCells vectors, assign every
    * vector to its nearest init centroid, then per-cell element-wise
    * floor-quantized mean — the same update step embed_centroids
    * implements per label), queries probe their NProbe nearest cells.
    * The scale story: cells partition the candidate set, a query scans
    * only nprobe cells instead of the full index, and the centroid
    * table is a broadcast — the fact side shuffles once on cell id.
    * Sizing: SELF-DERIVED from the corpus row count (see Knobs.ivfCells:
    * cells = ⌈N/256⌉ capped at ⌈4√N⌉, floor 8) so the cell-scoped pair
    * family (dedup_semantic / label_noise / embed_prune) stays linear in
    * N at DEFAULTS; the Lloyd update is one map-side-combined groupBy
    * over cells×Dim rows per partition however big N gets. Override via
    * GRAFT_IVF_CELLS — the derived-or-overridden value is read by both
    * the Spark plan and the oracle SQL, so the mirror never splits. */
  def NumCells: Int = graft.Knobs.ivfCells
  val NProbe = 2

  /** Lloyd iteration count for the IVF coarse quantizer (and GRAFT_PQ_ITERS
    * for the PQ codebooks below). One iteration is the engine's historical
    * convention; more iterations tighten the cells/codebooks at the price
    * of one extra broadcast-assign + map-side-combined mean pass each —
    * per-iteration cost is flat in N, so the knob is a pure quality dial
    * at 100 TB. LloydSpec pins the k-means objective monotone in this knob
    * on the test corpus; both the Spark plans and the generated oracle SQL
    * read it, so the mirror never splits. */
  def IvfIters: Int = sys.env.getOrElse("GRAFT_IVF_ITERS", "1").toInt

  /** One Lloyd step: assign every vector to its nearest (by cosine) seed,
    * then rebuild each cell's centroid as the per-dim floor-quantized mean.
    * The per-dim mean is rebuilt into a vector with collect_list of
    * (pos, mean) structs sorted by pos — per-cell rows are exactly Dim
    * wide, so the rebuild never concentrates more than cells×Dim rows
    * regardless of corpus size. A cell whose trained centroid quantizes to
    * the zero vector is dropped (no direction — same guard as the vectors
    * frame). */
  /** Nearest-centroid id per vector — (avid, seed_id) with the
    * (cos desc, seed_id asc) tie-break — via map-side-combined argmax
    * (max of struct(cos, −seed_id)) instead of a row_number window: the
    * window form shuffles and sorts the full N×cells scored frame
    * (156M rows at the 100× point's derived 782 cells), while the argmax
    * reduces per partition and shuffles one partial row per vector. Same
    * rank-1 choice by construction: struct max is lexicographic, so the
    * largest cos wins and a cos tie falls to the smallest seed_id. */
  /** Nearest-centroid assignment as ONE fused codegen argmax
    * (NearestCellExpr): the centroid table — a bounded, plan-time frame
    * (≤ ⌈4√N⌉ rows by the ivfCells cap) — is collected once and embedded
    * as a reference object, and each vector row emits only its winning
    * seed id. The former crossJoin(broadcast)+max-struct form
    * materialized N×cells joined rows (156M at the 100× point) for what
    * is one loop per vector; the expression computes the IDENTICAL
    * IEEE cosine chain and smaller-id tie-break, so assignments —
    * including rounding-created ties — are bit-identical to the join
    * form and to the oracle. The collect here is the same data movement
    * the broadcast already did, one hop earlier. */
  private def nearestCell(v: DataFrame, seeds: DataFrame): DataFrame = {
    // bounded-collect: ≤ ⌈4√N⌉ centroid rows (ivfCells cap) — the same
    // data movement broadcast() did, one hop earlier; also serves the
    // Lloyd training pulls (k×Dim centroid sums). CollectGateSpec-audited.
    val rows = seeds.select("seed_id", "sv", "sn2").collect()
    // Degenerate-input contract (round-10 advice): the replaced
    // crossJoin(broadcast(seeds)) form lazily produced an EMPTY
    // assignment for an empty corpus/seed sample; preserve that instead
    // of throwing at plan-build time.
    if (rows.isEmpty)
      return v.select(col("vec_id").as("avid"), lit(null).cast("long").as("seed_id"))
        .where(lit(false))
    val ids = rows.map(_.getLong(0))
    val norms = rows.map(_.getLong(2))
    val flat = new Array[Long](rows.length * Dim)
    rows.zipWithIndex.foreach { case (r, c) =>
      val sv = r.getSeq[Long](1)
      var i = 0
      while (i < Dim && i < sv.length) { flat(c * Dim + i) = sv(i); i += 1 }
    }
    v.select(col("vec_id").as("avid"),
      graft.functions.HashExprs
        .nearestCell(col("qv"), col("n2"), ids, flat, norms, Dim)
        .as("seed_id"))
  }

  private def lloydStep(v: DataFrame, seeds: DataFrame): DataFrame = {
    val members = nearestCell(v, seeds)
      .select(col("avid"), col("seed_id").as("cell"))
    members.join(v, col("avid") === col("vec_id"))
      .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "q")))
      .groupBy("cell", "pos")
      .agg(count(lit(1)).as("n"), sum("q").as("sum_q"))
      .withColumn("cq", floor(col("sum_q").cast("double") / col("n")).cast("long"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("cq")))).as("pc"))
      .select(col("cell").as("seed_id"),
        transform(col("pc"), x => x("cq")).as("sv"))
      .withColumn("sn2", dot(col("sv"), col("sv")))
      .where(col("sn2") > 0)
  }

  /** `iters` Lloyd steps over the deterministic init (the first NumCells
    * vectors): (seed_id, sv, sn2) per surviving cell. The loop is
    * plan-build-time only — `iters` is small and each step's output is a
    * bounded NumCells-row frame, so the lineage stays shallow. */
  private def trainedCentroidsIter(spark: SparkSession, dir: String, iters: Int): DataFrame =
    Tables.memoPersist(spark, s"sim.centroids:$NumCells:$iters:$dir") {
      val v = vectors(spark, dir)
      var seeds = v.where(col("vec_id") < NumCells)
        .select(col("vec_id").as("seed_id"), col("qv").as("sv"), col("n2").as("sn2"))
      for (_ <- 1 to iters) seeds = lloydStep(v, seeds)
      seeds
    }

  private def trainedCentroids(spark: SparkSession, dir: String): DataFrame =
    trainedCentroidsIter(spark, dir, IvfIters)

  /** The trained coarse quantizer, exposed for the streaming router (and
    * its spec): batch-train, stream-assign — the serving split. */
  private[graft] def centroidsFor(spark: SparkSession, dir: String): DataFrame =
    trainedCentroids(spark, dir)

  /** Test probe (LloydSpec): the spherical-k-means objective after `iters`
    * training steps — Σ_v floor(1e6 · cos(v, nearest trained centroid)).
    * Lloyd's assign/mean alternation is non-decreasing in this objective;
    * the spec pins that it survives the engine's floor quantization. */
  def ivfTrainCostProbe(spark: SparkSession, dir: String, iters: Int): Long = {
    val v = vectors(spark, dir)
    val seeds = trainedCentroidsIter(spark, dir, iters)
    v.select(col("vec_id").as("avid"), col("qv").as("av"), col("n2").as("an2"))
      // bounded-cross: broadcast centroid table, <= NumCells rows
      .crossJoin(broadcast(seeds))
      .withColumn("cos", cosine(dot(col("av"), col("sv")), col("an2"), col("sn2")))
      .groupBy("avid").agg(max("cos").as("best"))
      .agg(sum(floor(col("best") * lit(1000000.0)).cast("long")).as("cost"))
      .head.getLong(0)
  }

  /** The one cell-assignment frame every IVF consumer reads — flat exact
    * argmax below [[graft.Knobs.ivfRouteHierCells]] cells, the two-level
    * router (row 162) at or above it (round-10 verdict #6: the flat
    * codegen centroid table and the N×cells assignment cost both grow
    * unguarded with the derived cell count; the router holds assignment
    * to ~2N√cells and its reference tables to ~√cells rows). The oracle
    * CTEs switch on the SAME knob (see [[IvfAssignCtes]]), so the whole
    * IVF family stays hash-checkable in either mode; IvfRouteSwitchSpec
    * pins the two modes' rank-1 assignments against each other on the
    * test corpus and the gate proves the hier mode end-to-end under
    * GRAFT_IVF_ROUTE_CELLS override. */
  private def cellAssignments(spark: SparkSession, dir: String): DataFrame =
    if (graft.Knobs.ivfRouteHier)
      hierAssignments(spark, dir)
        .select(col("avid"), col("cell").as("seed_id"), col("rnk"))
    else flatCellAssignments(spark, dir)

  private def flatCellAssignments(spark: SparkSession, dir: String): DataFrame =
    // referenced by both the cells and the probes branch — materialize
    // the k×NumCells assignment once (one small row per vector×seed)
    Tables.memoPersist(spark, s"sim.cellAssignments:$NumCells:$IvfIters:$dir") {
      val v = vectors(spark, dir)
      val seeds = trainedCentroids(spark, dir)
      // every consumer reads either rnk = 1 (cell membership, all
      // vectors) or rnk <= nprobe for the bounded query set — so the
      // frame holds rank-1 rows for everyone (argmax, no N×cells
      // shuffle; see nearestCell) plus the FULL ranking only for the
      // NumQueries probe side (queries×cells rows, window is trivial
      // there). Materializing all N×cells ranks was the single biggest
      // persisted frame at the 100× point (156M rows) and pure waste
      // beyond rank 1.
      val top1 = nearestCell(v, seeds).withColumn("rnk", lit(1))
      val queryRanks = v.where(col("vec_id") < NumQueries)
        .select(col("vec_id").as("avid"), col("qv").as("av"), col("n2").as("an2"))
        // bounded-cross: broadcast centroid table, <= NumCells rows
        .crossJoin(broadcast(seeds))
        .withColumn("cos", cosine(dot(col("av"), col("sv")), col("an2"), col("sn2")))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("avid").orderBy(col("cos").desc, col("seed_id"))))
        .select("avid", "seed_id", "rnk")
      queryRanks.unionByName(
        top1.where(col("avid") >= NumQueries).select("avid", "seed_id", "rnk"))
    }

  /** Test probe into the memoized assignment frame (IvfRouteStreamSpec
    * pins the streaming router against the rank-1 rule here). */
  def cellAssignmentsProbe(spark: SparkSession, dir: String): DataFrame =
    cellAssignments(spark, dir)

  /** Mode-pinned probes for IvfRouteSwitchSpec: the two routing modes'
    * assignment frames regardless of which one the knob resolves. */
  private[graft] def flatAssignmentsProbe(spark: SparkSession, dir: String): DataFrame =
    flatCellAssignments(spark, dir)
  private[graft] def hierAssignmentsProbe(spark: SparkSession, dir: String): DataFrame =
    hierAssignments(spark, dir)

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val assign = cellAssignments(spark, dir)
    val cells = assign.where(col("rnk") === 1)
      .select(col("avid").as("cid"), col("seed_id").as("cell"))
      .join(v, col("cid") === col("vec_id"))
      .select(col("cid"), col("cell"), col("qv").as("cv"), col("n2").as("cn2"))
    val probes = assign.where(col("avid") < NumQueries && col("rnk") <= NProbe)
      .select(col("avid").as("qid"), col("seed_id").as("pcell"))
    val q = vectors(spark, dir).where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qvid"), col("qv").as("qqv"), col("n2").as("qn2"))
    probes.join(q, col("qid") === col("qvid"))
      .join(cells, col("pcell") === col("cell") && col("cid") =!= col("qid"))
      .withColumn("cos", cosine(dot(col("qqv"), col("cv")), col("qn2"), col("cn2")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))))
      .where(col("rnk") <= TopK)
      .select(col("qid"), col("rnk"), col("cid"), col("cell"), cosE6(col("cos")).as("cos_e6"))
      .orderBy("qid", "rnk")
  }

  // ---- knn_classify: label vote over brute-force neighbors ----------------

  /** kNN classification: each query vector takes the majority label of its
    * KnnK nearest neighbors by cosine (vote ties resolve to the smaller
    * label; neighbor ties to the smaller vec_id). The candidate scan is
    * the same bounded broadcast k×N pattern as ann_topk — the label vote
    * adds one tiny aggregation over k×KnnK rows, nothing at fact scale. */
  val KnnK = 7

  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val pred = scoredNeighbors(spark, dir, KnnK).groupBy("qid", "label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(
        Window.partitionBy("qid").orderBy(col("votes").desc, col("label"))))
      .where(col("vr") === 1)
      .select(col("qid"), col("label").as("pred_label"), col("votes"))
    pred.join(v.select(col("vec_id"), col("label").as("true_label")),
        col("qid") === col("vec_id"))
      .select("qid", "pred_label", "votes", "true_label")
      .orderBy("qid")
  }

  // ---- embed_centroids: per-label element-wise centroid --------------------

  /** Per-label centroids of the quantized vectors — the update step of a
    * distributed k-means / class-prototype pass. posexplode fans each
    * vector into (label, dim, component); the groupBy then map-side
    * combines to labels×Dim partial sums per partition, so the shuffle
    * carries only #labels × Dim rows per task regardless of corpus size.
    * centroid_q = floor(sum/n) via one double division (sums stay far
    * under 2^53, so the division is exact-input IEEE on both engines). */
  def embedCentroids(spark: SparkSession, dir: String): DataFrame =
    vectors(spark, dir)
      .select(col("label"), posexplode(col("qv")).as(Seq("pos", "q")))
      .groupBy(col("label"), (col("pos") + 1).cast("long").as("dim"))
      .agg(count(lit(1)).as("n"), sum("q").as("sum_q"))
      .withColumn("centroid_q",
        floor(col("sum_q").cast("double") / col("n")).cast("long"))
      .select("label", "dim", "n", "sum_q", "centroid_q")
      .orderBy("label", "dim")

  // ---- ann_hard_negatives: contrastive pair mining -------------------------

  /** Hard-negative mining for contrastive embedding training: per query,
    * the nearest SAME-label vector (the positive) and the nearest
    * DIFFERENT-label vector (the hard negative), with the cosine margin
    * between them — the standard triplet-construction pass run over a
    * labeled corpus before fine-tuning (hard negatives are the
    * highest-cosine wrong-label items, exactly what a random negative
    * sampler misses). A query label absent from the rest of the corpus
    * yields NULL positive columns (no pair to form — both engines agree).
    *
    * Scale shape: identical to the brute-force truth scans — the bounded
    * query set rides a broadcast over the vector table, and the per-query
    * top-1 per (same/different) partition is a window over the scan's
    * local rows. At production scale the same mining runs over the
    * IVFADC shortlist instead of the full scan; the exact pass is the
    * acceptance baseline. */
  def annHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val q = v.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("qv").as("qa"), col("n2").as("qn2"))
    // bounded-cross: broadcast query table, <= NumQueries rows
    v.crossJoin(broadcast(q))
      .where(col("qid") =!= col("vec_id"))
      .withColumn("cos", cosine(dot(col("qa"), col("qv")), col("qn2"), col("n2")))
      .withColumn("same", (col("label") === col("qlabel")).cast("int"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid", "same").orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rnk") === 1)
      .groupBy("qid")
      .agg(max("qlabel").as("label"),
        max(when(col("same") === 1, col("vec_id"))).as("pos_id"),
        max(when(col("same") === 1, cosE6(col("cos")))).as("pos_cos_e6"),
        max(when(col("same") === 0, col("vec_id"))).as("neg_id"),
        max(when(col("same") === 0, cosE6(col("cos")))).as("neg_cos_e6"))
      .withColumn("margin_e6", col("pos_cos_e6") - col("neg_cos_e6"))
      .orderBy("qid")
  }

  def annHardNegativesSql: String =
    s"""WITH $VecCte,
       |hn AS (
       |  SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS cid,
       |         CASE WHEN b.label = a.label THEN 1 ELSE 0 END AS same,
       |         $CosSql AS cos
       |  FROM vecs a JOIN vecs b
       |    ON a.vec_id < $NumQueries AND a.vec_id <> b.vec_id),
       |hr AS (
       |  SELECT qid, qlabel, cid, same, cos,
       |         row_number() OVER (PARTITION BY qid, same
       |                            ORDER BY cos DESC, cid) AS rnk
       |  FROM hn)
       |SELECT qid, CAST(max(qlabel) AS BIGINT) AS label,
       |  CAST(max(CASE WHEN same = 1 THEN cid END) AS BIGINT) AS pos_id,
       |  max(CASE WHEN same = 1
       |      THEN CAST(floor(cos * 1000000.0) AS BIGINT) END) AS pos_cos_e6,
       |  CAST(max(CASE WHEN same = 0 THEN cid END) AS BIGINT) AS neg_id,
       |  max(CASE WHEN same = 0
       |      THEN CAST(floor(cos * 1000000.0) AS BIGINT) END) AS neg_cos_e6,
       |  max(CASE WHEN same = 1 THEN CAST(floor(cos * 1000000.0) AS BIGINT) END)
       |    - max(CASE WHEN same = 0 THEN CAST(floor(cos * 1000000.0) AS BIGINT) END)
       |    AS margin_e6
       |FROM hr WHERE rnk = 1
       |GROUP BY qid ORDER BY qid""".stripMargin

  // ---- embed_drift: per-label centroid shift between corpus halves --------

  /** Embedding-space drift per label between the even/odd vec_id halves
    * (token_drift's snapshot convention, applied to vectors): each
    * half's vector count and the L2 distance between the two half
    * centroids, in 1e-4 tick units scaled e4 — the monitor that catches
    * an embedding model change or a source shift moving a class's
    * centroid between corpus snapshots. Only labels present in both
    * halves are comparable (and reported). Exactness: per-dim sums are
    * int64; the per-dim centroid difference is formed as the INTEGER
    * cross product sum_a·n_b − sum_b·n_a (exact under 2^53), squared and
    * folded in FIXED dim order into a double (both engines fold the
    * identical sequence; sqrt is IEEE-correctly-rounded), so the e4
    * output is bit-identical.
    *
    * Scale shape: posexplode → map-side-combined (label, half, dim) sums
    * — labels × 2 × Dim rows cross the shuffle regardless of corpus
    * size; everything downstream is labels × Dim arithmetic. */
  def embedDrift(spark: SparkSession, dir: String): DataFrame = {
    val sums = vectors(spark, dir)
      .select(col("label"), (col("vec_id") % 2).as("half"),
        posexplode(col("qv")).as(Seq("pos", "q")))
      .groupBy("label", "half", "pos")
      .agg(count(lit(1)).as("n"), sum("q").as("s"))
    val a = sums.where(col("half") === 0)
      .select(col("label"), col("pos"), col("n").as("n_a"), col("s").as("s_a"))
    val b = sums.where(col("half") === 1)
      .select(col("label"), col("pos"), col("n").as("n_b"), col("s").as("s_b"))
    a.join(b, Seq("label", "pos"))
      .withColumn("diff", col("s_a") * col("n_b") - col("s_b") * col("n_a"))
      .groupBy("label")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        sort_array(collect_list(struct(col("pos"), col("diff")))).as("ds"))
      .select(col("label"), col("n_a"), col("n_b"), expr(
        "CAST(floor(sqrt(aggregate(ds, CAST(0.0 AS DOUBLE)," +
          " (acc, x) -> acc + CAST(x.diff AS DOUBLE) * CAST(x.diff AS DOUBLE)))" +
          " * 10000.0 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS BIGINT)")
        .as("shift_ticks_e4"))
      .orderBy("label")
  }

  def embedDriftSql: String =
    s"""WITH $VecCte,
       |esums AS (
       |  SELECT label, vec_id % 2 AS half, dim, count(*) AS n,
       |         CAST(sum(qv[dim]) AS BIGINT) AS s
       |  FROM vecs CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS dim) d
       |  GROUP BY label, half, dim),
       |ej AS (
       |  SELECT a.label, a.dim, a.n AS n_a, b.n AS n_b,
       |         a.s * b.n - b.s * a.n AS diff
       |  FROM esums a JOIN esums b ON a.label = b.label AND a.dim = b.dim
       |  WHERE a.half = 0 AND b.half = 1),
       |eg AS (
       |  SELECT label, CAST(max(n_a) AS BIGINT) AS n_a,
       |         CAST(max(n_b) AS BIGINT) AS n_b,
       |         list(CAST(diff AS DOUBLE) ORDER BY dim) AS ds
       |  FROM ej GROUP BY label)
       |SELECT label, n_a, n_b,
       |  CAST(floor(sqrt(list_reduce(list_transform(ds, x -> x * x), (x, y) -> x + y))
       |       * 10000.0 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS BIGINT)
       |    AS shift_ticks_e4
       |FROM eg ORDER BY label""".stripMargin

  // ---- oracle -------------------------------------------------------------

  /** ONE definition of the oracle's 1e-4 quantization (CTE `qvecs`) and
    * squared-norm reduce — shared by the similarity family and the
    * hygiene audit, so the zero-norm population the audit counts is BY
    * CONSTRUCTION the population the similarity CTEs filter. */
  private val QvecsCte: String =
    """qvecs AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label,
      |         list_transform(embedding,
      |           x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)) AS qv
      |  FROM embeddings)""".stripMargin

  private val N2Sql: String =
    "list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y)"

  /** Shared CTE: quantized vectors + norms + one hyperplane signature
    * column per LSH table (bucket0..bucket{L-1}), mirroring the Spark
    * `buckets` array element-for-element. */
  private[ops] def VecCte: String = {
    def bucketTerms(t: Int): String = (0 until PlanesPerTable).map { p =>
      val w = wVec(t * PlanesPerTable + p).mkString("[", ", ", "]")
      s"""CASE WHEN list_reduce(list_transform(range(1, ${Dim + 1}),
         |       i -> qv[i] * ($w)[i]), (x, y) -> x + y) > 0
         |     THEN ${1L << p} ELSE 0 END""".stripMargin
    }.mkString("\n    + ")
    val bucketCols = (0 until NumTables)
      .map(t => s"    ${bucketTerms(t)} AS bucket$t").mkString(",\n")
    s"""$QvecsCte,
       |vecs0 AS (
       |  SELECT vec_id, label, qv,
       |    $N2Sql AS n2,
       |$bucketCols
       |  FROM qvecs),
       |vecs AS (
       |  SELECT * FROM vecs0 WHERE n2 > 0)""".stripMargin
  }

  /** Narrow signature frame: one (vec_id, tbl, bucket) row per table —
    * the oracle twin of the Spark posexplode. */
  private def SigsCte: String =
    "sigs AS (\n  " + (0 until NumTables).map { t =>
      s"SELECT vec_id, $t AS tbl, bucket$t AS bucket FROM vecs"
    }.mkString("\n  UNION ALL\n  ") + ")"

  /** Deduped undirected candidate pairs + per-pair score (oracle twin of
    * the Spark scoredPairs frame). */
  private def ScoredPairsCte: String =
    s"""$SigsCte,
       |cand AS (
       |  SELECT s1.vec_id AS aid, s2.vec_id AS bid, count(*) AS n_tbl
       |  FROM sigs s1 JOIN sigs s2
       |    ON s1.tbl = s2.tbl AND s1.bucket = s2.bucket AND s1.vec_id < s2.vec_id
       |  GROUP BY 1, 2),
       |spaired AS (
       |  SELECT c.aid, c.bid, c.n_tbl,
       |         $CosSql AS cos
       |  FROM cand c
       |  JOIN vecs a ON c.aid = a.vec_id
       |  JOIN vecs b ON c.bid = b.vec_id)""".stripMargin

  private val DotSql =
    s"list_reduce(list_transform(range(1, ${Dim + 1}), i -> a.qv[i] * b.qv[i]), (x, y) -> x + y)"

  /** ONE definition of the oracle cosine over joined vecs aliases a/b —
    * every scored CTE interpolates this, so the scoring rule cannot
    * silently diverge between the production queries and the recall
    * evaluation (mirrors the Spark-side shared `cosine`/`dot`). */
  private val CosSql =
    s"""CAST($DotSql AS DOUBLE)
       |           / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))""".stripMargin

  /** Shared brute-force truth CTE (`bscored`): query set × all vectors. */
  private[ops] def BruteScoredCte =
    s"""bscored AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS cid,
       |         $CosSql AS cos
       |  FROM vecs a JOIN vecs b ON a.vec_id < $NumQueries AND a.vec_id <> b.vec_id)""".stripMargin

  def annTopkSql: String =
    s"""WITH $VecCte,
       |$BruteScoredCte,
       |ranked AS (
       |  SELECT qid, cid, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |  FROM bscored)
       |SELECT qid, rnk, cid, CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
       |FROM ranked WHERE rnk <= $TopK
       |ORDER BY qid, rnk""".stripMargin

  def annLshSql: String =
    s"""WITH $VecCte,
       |$ScoredPairsCte,
       |directed AS (
       |  SELECT aid, bid, n_tbl, cos FROM spaired
       |  UNION ALL
       |  SELECT bid AS aid, aid AS bid, n_tbl, cos FROM spaired),
       |ranked AS (
       |  SELECT aid, bid, n_tbl, cos,
       |         row_number() OVER (PARTITION BY aid ORDER BY cos DESC, bid) AS rnk
       |  FROM directed)
       |SELECT aid, rnk, bid, CAST(n_tbl AS BIGINT) AS n_tbl,
       |       CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
       |FROM ranked WHERE rnk <= $LshK
       |ORDER BY aid, rnk""".stripMargin

  def mutualKnnSql: String =
    s"""WITH $VecCte,
       |$ScoredPairsCte,
       |directed AS (
       |  SELECT aid, bid, cos FROM spaired
       |  UNION ALL
       |  SELECT bid AS aid, aid AS bid, cos FROM spaired),
       |l AS (
       |  SELECT aid, bid FROM (
       |    SELECT aid, bid,
       |           row_number() OVER (PARTITION BY aid ORDER BY cos DESC, bid) AS rnk
       |    FROM directed)
       |  WHERE rnk <= $LshK),
       |m AS (
       |  SELECT x.aid, x.bid FROM l x
       |  JOIN l y ON x.aid = y.bid AND x.bid = y.aid
       |  WHERE x.aid < x.bid),
       |d AS (
       |  SELECT vid, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT aid AS vid FROM m UNION ALL SELECT bid AS vid FROM m)
       |  GROUP BY vid),
       |alldeg AS (
       |  SELECT coalesce(d.deg, 0) AS mutual_degree
       |  FROM vecs v LEFT JOIN d ON v.vec_id = d.vid),
       |h AS (
       |  SELECT mutual_degree, CAST(count(*) AS BIGINT) AS n_vecs
       |  FROM alldeg GROUP BY mutual_degree)
       |SELECT mutual_degree, n_vecs,
       |       (10000 * n_vecs) // CAST(sum(n_vecs) OVER () AS BIGINT) AS share_e4
       |FROM h ORDER BY mutual_degree""".stripMargin

  /** Oracle cosine between `vecs` alias `$a` (qv, n2) and a seeds alias
    * `$s` (sv, sn2) — one definition for every training/assignment CTE. */
  private def cosToSeedSql(a: String, s: String): String =
    s"""CAST(list_reduce(list_transform(range(1, ${Dim + 1}), i -> $a.qv[i] * $s.sv[i]), (x, y) -> x + y) AS DOUBLE)
       |             / (sqrt(CAST($a.n2 AS DOUBLE)) * sqrt(CAST($s.sn2 AS DOUBLE)))""".stripMargin

  /** Oracle twin of [[trainedCentroidsIter]]: iv_seeds0 (deterministic
    * init) → IvfIters × (rank-1 assign → floor-quantized mean) →
    * `seeds`. Generated per-iteration so the knob and the SQL cannot
    * drift.
    *
    * REP-LEVEL (round 15): the member-level form ranked vecs × seeds
    * rows per iteration — ~1.6B cos evaluations at the 100× stress
    * point, which OOM'd DuckDB after 4 CPU-hours (the r14 oracle
    * blocker). Every training statistic is a pure function of the
    * quantized vector, so the Lloyd recurrence collapses EXACTLY to the
    * distinct-qv frame with integer count weights: the rank-1 cell of a
    * member equals the rank-1 cell of its rep (same qv ⇒ same cos ⇒
    * same argmax), member count(*) = Σ gcnt, and member Σ qv[dim] =
    * Σ gcnt·qv[dim] — the engine's round-11 collapse applied to the
    * oracle's own CTEs, bit-identical output by construction. */
  private def IvfTrainCtes: String = {
    val gw =
      s"""iv_gw AS (
         |  SELECT min(vec_id) AS gid, qv, n2, CAST(count(*) AS BIGINT) AS gcnt
         |  FROM vecs GROUP BY qv, n2)""".stripMargin
    val init =
      s"""iv_seeds0 AS (
         |  SELECT vec_id AS seed_id, qv AS sv, n2 AS sn2 FROM vecs WHERE vec_id < $NumCells)""".stripMargin
    val steps = (1 to IvfIters).map { it =>
      s"""iv_mem$it AS (
         |  SELECT gid, gcnt, seed_id AS cell FROM (
         |    SELECT a.gid, a.gcnt, s.seed_id,
         |           row_number() OVER (PARTITION BY a.gid ORDER BY
         |             ${cosToSeedSql("a", "s")} DESC,
         |             s.seed_id) AS rnk
         |    FROM iv_gw a CROSS JOIN iv_seeds${it - 1} s) r WHERE rnk = 1),
         |iv_upd$it AS (
         |  SELECT m.cell, d.dim, sum(m.gcnt) AS n, sum(m.gcnt * v.qv[d.dim]) AS sum_q
         |  FROM iv_mem$it m JOIN iv_gw v ON m.gid = v.gid
         |  CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS dim) d
         |  GROUP BY m.cell, d.dim),
         |iv_seeds$it AS (
         |  SELECT seed_id, sv,
         |         list_reduce(list_transform(sv, x -> x * x), (x, y) -> x + y) AS sn2
         |  FROM (
         |    SELECT cell AS seed_id,
         |           array_agg(CAST(floor(CAST(sum_q AS DOUBLE) / n) AS BIGINT) ORDER BY dim) AS sv
         |    FROM iv_upd$it GROUP BY cell) c
         |  WHERE list_reduce(list_transform(sv, x -> x * x), (x, y) -> x + y) > 0)""".stripMargin
    }
    val fin = s"seeds AS (SELECT * FROM iv_seeds$IvfIters)"
    (gw +: init +: steps :+ fin).mkString(",\n")
  }

  /** Oracle twin of [[cellAssignments]] + the cells / probes split —
    * shared by ann_ivf and the IVFADC pair. Mirrors the flat→hier route
    * switch: in hier mode the assign/cells/probes names are aliases over
    * the two-level router's CTEs (safe: no registry SQL composes this
    * with [[HierCtes]] — only the always-hier row-162 pair uses those
    * directly). */
  private def IvfAssignCtes: String =
    if (graft.Knobs.ivfRouteHier)
      s"""$HierCtes,
         |assign AS (SELECT avid, cell AS seed_id, rnk FROM hassign),
         |cells AS (SELECT cid, cell, cv, cn2 FROM hcells),
         |probes AS (SELECT qid, pcell FROM hprobes)""".stripMargin
    else FlatAssignCtes

  /** Rep-level flat assignment (round 15, same collapse as the train
    * CTEs): the vecs × seeds ranking — 156M rows at the 100× point —
    * runs once per DISTINCT quantized vector (iv_gasgn), then fans back
    * to members by the qv-equality map (iv_vgrp). cells/probes derive
    * from the group ranking directly so neither forces a full
    * member × seeds materialization; `assign` keeps the member-level
    * contract for the two consumers that filter it (embed_prune rnk=1,
    * nprobe sweep's bounded query set) — the filters push into the
    * joins, and the per-member cos is never re-evaluated. */
  private def FlatAssignCtes: String =
    s"""iv_vgrp AS (
       |  SELECT v.vec_id, v.qv, v.n2, g.gid
       |  FROM vecs v JOIN iv_gw g ON v.qv = g.qv),
       |iv_gasgn AS (
       |  SELECT g.gid, s.seed_id,
       |         row_number() OVER (PARTITION BY g.gid ORDER BY
       |           ${cosToSeedSql("g", "s")} DESC,
       |           s.seed_id) AS rnk
       |  FROM iv_gw g CROSS JOIN seeds s),
       |assign AS (
       |  SELECT v.vec_id AS avid, a.seed_id, a.rnk
       |  FROM iv_vgrp v JOIN iv_gasgn a ON v.gid = a.gid),
       |cells AS (
       |  SELECT v.vec_id AS cid, a.seed_id AS cell, v.qv AS cv, v.n2 AS cn2
       |  FROM iv_vgrp v JOIN iv_gasgn a ON v.gid = a.gid AND a.rnk = 1),
       |probes AS (
       |  SELECT v.vec_id AS qid, a.seed_id AS pcell
       |  FROM iv_vgrp v JOIN iv_gasgn a ON v.gid = a.gid
       |  WHERE v.vec_id < $NumQueries AND a.rnk <= $NProbe)""".stripMargin

  def annIvfSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |scored AS (
       |  SELECT p.qid, c.cid, c.cell,
       |         CAST(list_reduce(list_transform(range(1, ${Dim + 1}), i -> q.qv[i] * c.cv[i]), (x, y) -> x + y) AS DOUBLE)
       |           / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS cos
       |  FROM probes p
       |  JOIN vecs q ON p.qid = q.vec_id
       |  JOIN cells c ON p.pcell = c.cell AND c.cid <> p.qid),
       |ranked AS (
       |  SELECT qid, cid, cell, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |  FROM scored)
       |SELECT qid, rnk, cid, cell, CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
       |FROM ranked WHERE rnk <= $TopK
       |ORDER BY qid, rnk""".stripMargin

  // ---- ann_ivf_hier: hierarchical (two-level) coarse quantizer ------------

  /** Super-centroid count K₂ = ⌈√cells⌉: routing a vector costs
    * K₂ + cells/K₂ ≈ 2√cells distance evaluations instead of the flat
    * quantizer's `cells` — the assignment-cost answer the Knobs.ivfCells
    * cap comment defers to ("at ≥1e8 vectors exact assignment wants a
    * hierarchical coarse quantizer"). At the derived 100 TB operating
    * point (1e9 vectors → ~125k linear-rule cells, √N-capped ~126k)
    * two-level routing cuts per-vector assignment from ~126k to ~700
    * dot products; recall impact is certified by ann_ivf_hier_recall
    * against the same exact truth the flat family uses. */
  def NumSupers: Int = math.ceil(math.sqrt(NumCells.toDouble)).toInt

  /** Super-centroids: one Lloyd step over the TRAINED CELL CENTROIDS
    * (init = first K₂ surviving centroids by seed id) — training cost is
    * cells×K₂ rows however big N gets, because the super level never
    * sees raw vectors. Reuses [[lloydStep]] verbatim: the cell-centroid
    * frame plays the vector role. */
  private def superCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.supers:$NumCells:$IvfIters:$dir") {
      val cents = trainedCentroids(spark, dir)
      val centsAsV = cents.select(
        col("seed_id").as("vec_id"), col("sv").as("qv"), col("sn2").as("n2"))
      // bounded global window: the frame is ≤ NumCells rows by contract
      val init = cents
        .withColumn("r", row_number().over(Window.orderBy("seed_id")))
        .where(col("r") <= NumSupers)
        .select("seed_id", "sv", "sn2")
      lloydStep(centsAsV, init)
    }

  /** (cell, super_id): every trained cell routed to its nearest updated
    * super — the fan-out map of the two-level quantizer (bounded:
    * NumCells rows). */
  private def cellSuper(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.cellSuper:$NumCells:$IvfIters:$dir") {
      val cents = trainedCentroids(spark, dir)
      nearestCell(
        cents.select(col("seed_id").as("vec_id"), col("sv").as("qv"), col("sn2").as("n2")),
        superCentroids(spark, dir))
        .select(col("avid").as("cell"), col("seed_id").as("super_id"))
    }

  /** Two-level cell assignment, same frame contract as
    * [[cellAssignments]] (avid, cell, rnk): rank-1 rows for every vector
    * via super-route + within-super argmax, full within-super ranking
    * only for the NumQueries probe side. Routing is restricted to supers
    * that OWN at least one cell (an updated super can end memberless;
    * a vector routed there would silently vanish from the index). The
    * scored frame is N×(cells/K₂) rows vs the flat N×cells — the
    * approximation ann_ivf_hier_recall prices. */
  private def hierAssignments(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.hierAssign:$NumCells:$IvfIters:$dir") {
      val v = vectors(spark, dir)
      val cs = cellSuper(spark, dir)
      val eligible = superCentroids(spark, dir).as("s")
        .join(cs.select(col("super_id")).distinct().as("e"),
          col("s.seed_id") === col("e.super_id"))
        .select("s.seed_id", "s.sv", "s.sn2")
      val vSuper = nearestCell(v, eligible)
        .select(col("avid"), col("seed_id").as("super_id"))
      val cents = trainedCentroids(spark, dir)
        .select(col("seed_id").as("cell"), col("sv").as("csv"), col("sn2").as("csn2"))
      val scored = v
        .select(col("vec_id").as("avid"), col("qv").as("av"), col("n2").as("an2"))
        .join(vSuper, "avid")
        .join(broadcast(cs), "super_id")
        .join(broadcast(cents), "cell")
        .withColumn("cos", cosine(dot(col("av"), col("csv")), col("an2"), col("csn2")))
      val top1 = scored.groupBy("avid")
        .agg(max(struct(col("cos"), (-col("cell")).as("neg"))).as("m"))
        .select(col("avid"), (-col("m").getField("neg")).as("cell"), lit(1).as("rnk"))
      val queryRanks = scored.where(col("avid") < NumQueries)
        .withColumn("rnk", row_number().over(
          Window.partitionBy("avid").orderBy(col("cos").desc, col("cell"))))
        .select("avid", "cell", "rnk")
      queryRanks.unionByName(
        top1.where(col("avid") >= NumQueries).select("avid", "cell", "rnk"))
    }

  /** IVF search through the two-level quantizer — identical output
    * contract to [[annIvf]] (qid, rnk, cid, cell, cos_e6), differing
    * only in HOW cells/probes were chosen: member cells come from the
    * super-routed assignment, and a query's nprobe cells are ranked
    * within its routed super only (a super owning fewer than nprobe
    * cells probes them all — the documented edge of single-super
    * routing). */
  def annIvfHier(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val assign = hierAssignments(spark, dir)
    val cells = assign.where(col("rnk") === 1)
      .select(col("avid").as("cid"), col("cell"))
      .join(v, col("cid") === col("vec_id"))
      .select(col("cid"), col("cell"), col("qv").as("cv"), col("n2").as("cn2"))
    val probes = assign.where(col("avid") < NumQueries && col("rnk") <= NProbe)
      .select(col("avid").as("qid"), col("cell").as("pcell"))
    val q = v.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qvid"), col("qv").as("qqv"), col("n2").as("qn2"))
    probes.join(q, col("qid") === col("qvid"))
      .join(cells, col("pcell") === col("cell") && col("cid") =!= col("qid"))
      .withColumn("cos", cosine(dot(col("qqv"), col("cv")), col("qn2"), col("cn2")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))))
      .where(col("rnk") <= TopK)
      .select(col("qid"), col("rnk"), col("cid"), col("cell"), cosE6(col("cos")).as("cos_e6"))
      .orderBy("qid", "rnk")
  }

  /** Recall@TopK of the hierarchical route against the same exact-cosine
    * truth the LSH recall uses — read next to ann_ivf's own retrieval to
    * price the single-super routing approximation. */
  def annIvfHierRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = scoredNeighbors(spark, dir, TopK)
      .select(col("qid"), col("vec_id").as("cid"))
    val retrieved = annIvfHier(spark, dir).select(col("qid"), col("cid"))
    exact.join(
        retrieved.select(col("qid").as("r_qid"), col("cid").as("r_cid")),
        col("qid") === col("r_qid") && col("cid") === col("r_cid"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("r_cid").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      .withColumn("recall_e4", expr("n_hits * 10000 div n_exact"))
      .orderBy("qid")
  }

  /** Generalized cosine SQL (same expression tree as [[cosToSeedSql]],
    * free column names) for the hierarchical CTEs. */
  private def cosSqlGen(av: String, an2: String, bv: String, bn2: String): String =
    s"""CAST(list_reduce(list_transform(range(1, ${Dim + 1}), i -> $av[i] * $bv[i]), (x, y) -> x + y) AS DOUBLE)
       |             / (sqrt(CAST($an2 AS DOUBLE)) * sqrt(CAST($bn2 AS DOUBLE)))""".stripMargin

  /** Oracle twin of the two-level quantizer: supers (one Lloyd step over
    * `seeds`, init = first K₂ by seed id), cell→super map, eligible
    * supers, vector routing, within-super assignment + query ranking —
    * mirrors superCentroids / cellSuper / hierAssignments. */
  private def HierCtes: String =
    s"""hs_init AS (
       |  SELECT seed_id AS super_id, sv AS hv, sn2 AS hn2 FROM (
       |    SELECT seed_id, sv, sn2, row_number() OVER (ORDER BY seed_id) AS r
       |    FROM seeds) i
       |  WHERE r <= $NumSupers),
       |hs_mem AS (
       |  SELECT cell, super_id FROM (
       |    SELECT c.seed_id AS cell, s.super_id,
       |           row_number() OVER (PARTITION BY c.seed_id ORDER BY
       |             ${cosSqlGen("c.sv", "c.sn2", "s.hv", "s.hn2")} DESC,
       |             s.super_id) AS rnk
       |    FROM seeds c CROSS JOIN hs_init s) r WHERE rnk = 1),
       |hs_upd AS (
       |  SELECT m.super_id, d.dim, count(*) AS n, sum(c.sv[d.dim]) AS sum_q
       |  FROM hs_mem m JOIN seeds c ON m.cell = c.seed_id
       |  CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS dim) d
       |  GROUP BY m.super_id, d.dim),
       |supers AS (
       |  SELECT super_id, hv,
       |         list_reduce(list_transform(hv, x -> x * x), (x, y) -> x + y) AS hn2
       |  FROM (
       |    SELECT super_id,
       |           array_agg(CAST(floor(CAST(sum_q AS DOUBLE) / n) AS BIGINT) ORDER BY dim) AS hv
       |    FROM hs_upd GROUP BY super_id) u
       |  WHERE list_reduce(list_transform(hv, x -> x * x), (x, y) -> x + y) > 0),
       |csup AS (
       |  SELECT cell, super_id FROM (
       |    SELECT c.seed_id AS cell, s.super_id,
       |           row_number() OVER (PARTITION BY c.seed_id ORDER BY
       |             ${cosSqlGen("c.sv", "c.sn2", "s.hv", "s.hn2")} DESC,
       |             s.super_id) AS rnk
       |    FROM seeds c CROSS JOIN supers s) r WHERE rnk = 1),
       |esup AS (SELECT DISTINCT super_id FROM csup),
       |vsup AS (
       |  SELECT avid, super_id FROM (
       |    SELECT a.vec_id AS avid, s.super_id,
       |           row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |             ${cosSqlGen("a.qv", "a.n2", "s.hv", "s.hn2")} DESC,
       |             s.super_id) AS rnk
       |    FROM vecs a CROSS JOIN (
       |      SELECT s.super_id, s.hv, s.hn2 FROM supers s
       |      JOIN esup e ON s.super_id = e.super_id) s) r
       |  WHERE rnk = 1),
       |hscored AS (
       |  SELECT w.avid, c2.seed_id AS cell,
       |         ${cosSqlGen("a.qv", "a.n2", "c2.sv", "c2.sn2")} AS cos
       |  FROM vsup w
       |  JOIN vecs a ON w.avid = a.vec_id
       |  JOIN csup x ON w.super_id = x.super_id
       |  JOIN seeds c2 ON x.cell = c2.seed_id),
       |hassign AS (
       |  SELECT avid, cell,
       |         row_number() OVER (PARTITION BY avid ORDER BY cos DESC, cell) AS rnk
       |  FROM hscored),
       |hcells AS (
       |  SELECT v.vec_id AS cid, h.cell, v.qv AS cv, v.n2 AS cn2
       |  FROM hassign h JOIN vecs v ON h.avid = v.vec_id WHERE h.rnk = 1),
       |hprobes AS (
       |  SELECT avid AS qid, cell AS pcell FROM hassign
       |  WHERE avid < $NumQueries AND rnk <= $NProbe)""".stripMargin

  def annIvfHierSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$HierCtes,
       |hsearch AS (
       |  SELECT p.qid, c.cid, c.cell,
       |         ${cosSqlGen("q.qv", "q.n2", "c.cv", "c.cn2")} AS cos
       |  FROM hprobes p
       |  JOIN vecs q ON p.qid = q.vec_id
       |  JOIN hcells c ON p.pcell = c.cell AND c.cid <> p.qid),
       |hranked AS (
       |  SELECT qid, cid, cell, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |  FROM hsearch)
       |SELECT qid, rnk, cid, cell, CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
       |FROM hranked WHERE rnk <= $TopK
       |ORDER BY qid, rnk""".stripMargin

  def annIvfHierRecallSql: String =
    s"""WITH $VecCte,
       |$BruteScoredCte,
       |$IvfTrainCtes,
       |$HierCtes,
       |ex AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |    FROM bscored) r WHERE rnk <= $TopK),
       |hsearch AS (
       |  SELECT p.qid, c.cid,
       |         ${cosSqlGen("q.qv", "q.n2", "c.cv", "c.cn2")} AS cos
       |  FROM hprobes p
       |  JOIN vecs q ON p.qid = q.vec_id
       |  JOIN hcells c ON p.pcell = c.cell AND c.cid <> p.qid),
       |ret AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |    FROM hsearch) r WHERE rnk <= $TopK)
       |SELECT e.qid, count(*) AS n_exact,
       |       CAST(sum(CASE WHEN r.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(sum(CASE WHEN r.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         * 10000 // count(*) AS recall_e4
       |FROM ex e
       |LEFT JOIN ret r ON e.qid = r.qid AND e.cid = r.cid
       |GROUP BY e.qid ORDER BY e.qid""".stripMargin

  def knnClassifySql: String =
    s"""WITH $VecCte,
       |scored AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS cid, b.label AS label,
       |         $CosSql AS cos
       |  FROM vecs a JOIN vecs b ON a.vec_id < $NumQueries AND a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT qid, cid, label,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |  FROM scored),
       |votes AS (
       |  SELECT qid, label, count(*) AS votes
       |  FROM ranked WHERE rnk <= $KnnK GROUP BY qid, label),
       |pred AS (
       |  SELECT qid, label, votes,
       |         row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS vr
       |  FROM votes)
       |SELECT p.qid, p.label AS pred_label, CAST(p.votes AS BIGINT) AS votes,
       |       q.label AS true_label
       |FROM pred p JOIN vecs q ON p.qid = q.vec_id
       |WHERE p.vr = 1
       |ORDER BY p.qid""".stripMargin

  def embedCentroidsSql: String =
    s"""WITH $VecCte
       |SELECT label, CAST(dim AS BIGINT) AS dim, count(*) AS n,
       |       CAST(sum(qv[dim]) AS BIGINT) AS sum_q,
       |       CAST(floor(CAST(sum(qv[dim]) AS DOUBLE) / count(*)) AS BIGINT) AS centroid_q
       |FROM vecs CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS dim) d
       |GROUP BY label, dim
       |ORDER BY label, dim""".stripMargin

  /** Oracle twin of the rep-level default: groups = identical quantized
    * vectors (a rep pair is a candidate in full banding iff it is in rep
    * banding — identical vectors share every table bucket), within rows
    * carry the SAME IEEE self-cosine expression the member pair would
    * produce (n2/(sqrt(n2)·sqrt(n2)) — not a 1.0 literal). */
  def embedCosineDupSql: String = {
    val selfCosSql =
      "CAST(n2 AS DOUBLE) / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)))"
    s"""WITH $VecCte,
       |$ScoredPairsCte,
       |egroups AS (
       |  SELECT min(vec_id) AS gid, count(*) AS cnt, min(n2) AS n2
       |  FROM vecs GROUP BY qv),
       |ecx AS (
       |  SELECT s.aid AS rep_a, s.bid AS rep_b, CAST(s.n_tbl AS BIGINT) AS n_tbl,
       |         CAST(floor(s.cos * 1000000.0) AS BIGINT) AS cos_e6,
       |         ga.cnt AS size_a, gb.cnt AS size_b, ga.cnt * gb.cnt AS n_pairs
       |  FROM spaired s
       |  JOIN egroups ga ON s.aid = ga.gid
       |  JOIN egroups gb ON s.bid = gb.gid
       |  WHERE CAST(floor(s.cos * 1000000.0) AS BIGINT) >= $DupThresholdE6),
       |ewi AS (
       |  SELECT gid AS rep_a, gid AS rep_b, CAST($NumTables AS BIGINT) AS n_tbl,
       |         CAST(floor(($selfCosSql) * 1000000.0) AS BIGINT) AS cos_e6,
       |         cnt AS size_a, cnt AS size_b, cnt * (cnt - 1) // 2 AS n_pairs
       |  FROM egroups
       |  WHERE cnt >= 2
       |    AND CAST(floor(($selfCosSql) * 1000000.0) AS BIGINT) >= $DupThresholdE6)
       |SELECT * FROM ecx UNION ALL SELECT * FROM ewi
       |ORDER BY rep_a, rep_b""".stripMargin
  }

  /** Oracle for the expanded opt-in report — the pre-round-11 SQL. */
  def embedCosineDupPairsFullSql: String =
    s"""WITH $VecCte,
       |$ScoredPairsCte
       |SELECT aid, bid, CAST(n_tbl AS BIGINT) AS n_tbl,
       |       CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
       |FROM spaired
       |WHERE CAST(floor(cos * 1000000.0) AS BIGINT) >= $DupThresholdE6
       |ORDER BY aid, bid""".stripMargin

  // ---- ann_recall ---------------------------------------------------------

  /** Recall of the LSH index against the brute-force truth for the query
    * set: per query, how many of the exact top-LshK neighbors the banded
    * multi-table retrieval also returns — the index-quality report that
    * certifies a (PlanesPerTable, NumTables) setting before the index
    * serves 100 TB (completing the evaluation family with lang_confusion
    * and minhash_est). BOTH sides reuse the production operators unchanged:
    * the truth is the shared scoredNeighbors scan, the retrieval is
    * annLsh filtered to the query ids (Catalyst pushes the filter into
    * the bucket join). recall_e4 is exact integer arithmetic. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = scoredNeighbors(spark, dir, LshK)
      .select(col("qid"), col("vec_id").as("cid"))
    val retrieved = annLsh(spark, dir)
      .where(col("aid") < NumQueries)
      .select(col("aid").as("r_qid"), col("bid").as("r_cid"))
    exact.join(retrieved,
        col("qid") === col("r_qid") && col("cid") === col("r_cid"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("r_cid").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      .withColumn("recall_e4", expr("n_hits * 10000 div n_exact"))
      .orderBy("qid")
  }

  def annRecallSql: String =
    s"""WITH $VecCte,
       |$BruteScoredCte,
       |$ScoredPairsCte,
       |ex AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |    FROM bscored) r WHERE rnk <= $LshK),
       |lscored AS (
       |  SELECT aid AS qid, bid AS cid, cos FROM spaired
       |  UNION ALL
       |  SELECT bid AS qid, aid AS cid, cos FROM spaired),
       |ret AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |    FROM lscored WHERE qid < $NumQueries) r
       |  WHERE rnk <= $LshK)
       |SELECT e.qid, count(*) AS n_exact,
       |       CAST(sum(CASE WHEN l.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(sum(CASE WHEN l.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         * 10000 // count(*) AS recall_e4
       |FROM ex e
       |LEFT JOIN ret l ON e.qid = l.qid AND e.cid = l.cid
       |GROUP BY e.qid ORDER BY e.qid""".stripMargin

  // ---- ann_mrr ------------------------------------------------------------

  /** Mean-reciprocal-rank probe of the LSH index: for each query, WHERE in
    * the banded retrieval's ranked list the true nearest neighbor lands
    * (recall says whether the truth set is covered; MRR says whether the
    * single answer a serving path would return is the right one, and how
    * far down it sits when it isn't). rank 0 = the true NN was not
    * retrieved at all. Reuses the production operators unchanged — truth
    * from the shared scoredNeighbors scan at k=1, retrieval from annLsh
    * with its own ranking — so the metric certifies the exact frames the
    * serving queries run, and the reciprocal rank is pure integer
    * division (1e6 div rank), exact on both engines. */
  def annMrr(spark: SparkSession, dir: String): DataFrame = {
    val truth = scoredNeighbors(spark, dir, 1)
      .select(col("qid"), col("vec_id").as("nn"))
    val retrieved = annLsh(spark, dir)
      .where(col("aid") < NumQueries)
      .select(col("aid").as("r_qid"), col("bid").as("r_cid"),
        col("rnk").cast("long").as("lsh_rnk"))
    truth.join(retrieved,
        col("qid") === col("r_qid") && col("nn") === col("r_cid"), "left")
      .select(col("qid"), col("nn"),
        coalesce(col("lsh_rnk"), lit(0L)).as("lsh_rank"),
        when(col("lsh_rnk").isNotNull, expr("1000000 div lsh_rnk"))
          .otherwise(0L).as("rr_e6"))
      .orderBy("qid")
  }

  def annMrrSql: String =
    s"""WITH $VecCte,
       |$BruteScoredCte,
       |$ScoredPairsCte,
       |truth AS (
       |  SELECT qid, cid AS nn FROM (
       |    SELECT qid, cid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |    FROM bscored) r WHERE rnk = 1),
       |lscored AS (
       |  SELECT aid AS qid, bid AS cid, cos FROM spaired
       |  UNION ALL
       |  SELECT bid AS qid, aid AS cid, cos FROM spaired),
       |ret AS (
       |  SELECT qid, cid, rnk FROM (
       |    SELECT qid, cid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |    FROM lscored WHERE qid < $NumQueries) r
       |  WHERE rnk <= $LshK)
       |SELECT t.qid, t.nn,
       |       CAST(coalesce(l.rnk, 0) AS BIGINT) AS lsh_rank,
       |       CAST(CASE WHEN l.rnk IS NOT NULL THEN 1000000 // l.rnk
       |                 ELSE 0 END AS BIGINT) AS rr_e6
       |FROM truth t
       |LEFT JOIN ret l ON t.qid = l.qid AND t.nn = l.cid
       |ORDER BY t.qid""".stripMargin

  // ---- embed_norm_audit ---------------------------------------------------

  /** Per-label vector hygiene report: counts, zero-norm (direction-less)
    * vectors, and the quantized squared-norm envelope — the audit a
    * pipeline runs BEFORE trusting cosine math on a new embedding drop
    * (the zero-norm count is exactly the population the similarity
    * operators exclude to keep cos out of 0/0). One map-side-combined
    * groupBy over a narrow projection; the squared-norm sum accumulates
    * in DECIMAL(38,0) (a Long sum wraps at ~1e9 vectors × the 6.4e9
    * per-vector bound) and only the bounded per-label mean is emitted. */
  def embedNormAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"), quant.as("qv"))
      .withColumn("n2", dot(col("qv"), col("qv")))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("n2") === 0, 1L).otherwise(0L)).as("n_zero"),
        min("n2").as("min_n2"), max("n2").as("max_n2"),
        sum(col("n2").cast("decimal(38,0)")).as("sum_n2"))
      .select(col("label"), col("n_vecs"), col("n_zero"),
        col("min_n2"), col("max_n2"),
        expr("CAST(floor(CAST(sum_n2 AS DOUBLE) / n_vecs) AS BIGINT)").as("mean_n2"))
      .orderBy("label")

  val embedNormAuditSql: String =
    s"""WITH $QvecsCte,
       |n AS (
       |  SELECT label, $N2Sql AS n2
       |  FROM qvecs),
       |s AS (
       |  SELECT label, count(*) AS n_vecs,
       |         CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       |         min(n2) AS min_n2, max(n2) AS max_n2,
       |         sum(n2) AS sum_n2
       |  FROM n GROUP BY label)
       |SELECT label, n_vecs, n_zero, min_n2, max_n2,
       |       CAST(floor(CAST(sum_n2 AS DOUBLE) / n_vecs) AS BIGINT) AS mean_n2
       |FROM s ORDER BY label""".stripMargin

  // ---- embed_quant: int8 quantization audit -------------------------------

  /** Per-dimension int8 quantization audit: affine min/max quantization of
    * each embedding dimension to 256 levels, with the reconstruction-error
    * envelope a pipeline checks BEFORE committing a 4×-smaller quantized
    * index at scale. All arithmetic is the engine's portable
    * int64-plus-correctly-rounded-double chain: components are first
    * quantized to e4 ticks (the similarity family's shared `quant`), the
    * per-dim (min, max) comes from a 64-row map-side-combined groupBy
    * that is BROADCAST back (never a window partitioned by dim — at 1e9
    * vectors a per-dim window partition would funnel 1/64th of the corpus
    * through one task), q8 = floor((v−min)·255/(max−min)), and the
    * reconstruction r = min + floor(q8·(max−min)/255). Errors are exact
    * tick integers; only bounded aggregates leave the executors. */
  def embedQuant(spark: SparkSession, dir: String): DataFrame = {
    val ticks = Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(quant))
      .select((col("pos") + 1).cast("long").as("dim"), col("col").cast("long").as("v"))
    val stats = ticks.groupBy("dim")
      .agg(min("v").as("mn"), max("v").as("mx"))
    ticks.join(broadcast(stats), "dim")
      .withColumn("q8",
        when(col("mx") > col("mn"),
          floor((col("v") - col("mn")) * lit(255.0) / (col("mx") - col("mn"))))
          .otherwise(lit(0L)).cast("long"))
      .withColumn("rec",
        col("mn") + floor(col("q8") * (col("mx") - col("mn")) / lit(255.0)).cast("long"))
      .withColumn("err", abs(col("v") - col("rec")))
      .groupBy("dim")
      .agg(min("v").as("min_tick"), max("v").as("max_tick"),
        max("err").as("max_abs_err"), sum("err").as("sum_abs_err"),
        floor(lit(100.0) * sum("err") / count(lit(1))).cast("long").as("mean_err_e2"))
      .orderBy("dim")
  }

  val embedQuantSql: String =
    s"""WITH t AS (
       |  SELECT d.dim AS dim,
       |         CAST(floor(CAST(embedding[d.dim] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS v
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS dim) d),
       |s AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM t GROUP BY dim),
       |q AS (
       |  SELECT t.dim, v, mn, mx,
       |         CASE WHEN mx > mn
       |              THEN CAST(floor((v - mn) * 255.0 / (mx - mn)) AS BIGINT)
       |              ELSE 0 END AS q8
       |  FROM t JOIN s ON t.dim = s.dim),
       |r AS (
       |  SELECT dim, v, mn + CAST(floor(q8 * (mx - mn) / 255.0) AS BIGINT) AS rec
       |  FROM q)
       |SELECT dim, min(v) AS min_tick, max(v) AS max_tick,
       |       max(abs(v - rec)) AS max_abs_err,
       |       CAST(sum(abs(v - rec)) AS BIGINT) AS sum_abs_err,
       |       CAST(floor(100.0 * sum(abs(v - rec)) / count(*)) AS BIGINT) AS mean_err_e2
       |FROM r GROUP BY dim ORDER BY dim""".stripMargin

  // ---- ann_pq: product quantization -------------------------------------

  /** Product quantization (Jégou/Douze/Schmid, PAMI'11): the 64-dim space
    * splits into PqM = 8 orthogonal 8-dim subspaces, each with its own
    * PqK = 8-entry codebook, so a vector compresses to 8 3-bit codes
    * (one int64 `pq_code` here) — the memory layout that makes
    * billion-vector ANN indexes fit in RAM, with `sq_err` the exact
    * integer reconstruction error a deployment checks before trusting
    * ADC distances at scale.
    *
    * Codebooks are TRAINED per subspace with the engine's deterministic
    * one-Lloyd-iteration recipe (the ann_ivf convention): init from the
    * first PqK vectors' subvectors, assign every subvector by EXACT
    * int64 squared-L2 on e4 ticks (no float anywhere in assignment —
    * ties break to the smaller code), update by per-component
    * floor-quantized mean, then re-assign against the trained books.
    *
    * Scale shape: both assignment passes join against a BROADCAST
    * codebook (PqM·PqK = 64 rows); the per-(vector, subspace) argmin is
    * a bounded window over PqK candidates; the Lloyd update is a
    * map-side-combined groupBy over (subspace, code, component) — at
    * most PqM·PqK·SubDim = 512 cells regardless of N. Empty cells drop
    * consistently on both sides. */
  val PqM = 8
  val PqSubDim = 8
  val PqK = 8

  /** Lloyd iteration count for the PQ codebooks — see [[IvfIters]]. */
  def PqIters: Int = sys.env.getOrElse("GRAFT_PQ_ITERS", "1").toInt

  /** Exact integer squared L2 between two equal-length int64 arrays —
    * the codegen'd expression (HashExprs.LongL2Expr), not the interpreted
    * aggregate/zip_with lambda pair: this sits inside the N·queries truth
    * scans and every ADC LUT build, where a per-row lambda interpreter is
    * the hot-path cost at scale. */
  private def l2sq(a: Column, b: Column): Column =
    graft.functions.HashExprs.longL2(a, b)

  /** Per-(vector, subspace) rows: subspace id, code-packing multiplier,
    * and the 8-dim tick subvector. */
  private def pqSubs(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).select(col("vec_id"), quant.as("qv"))
    val subStructs = array((0 until PqM).map { m =>
      struct(lit(m.toLong).as("m"), lit(1L << (3 * m)).as("mult"),
        slice(col("qv"), m * PqSubDim + 1, PqSubDim).as("sv"))
    }: _*)
    base.select(col("vec_id"), explode(subStructs).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.mult").as("mult"),
        col("s.sv").as("sv"))
  }

  private def pqNearest(subs: DataFrame, books: DataFrame): DataFrame =
    subs.join(broadcast(books), "m")
      .withColumn("d", l2sq(col("sv"), col("cv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id", "m").orderBy(col("d"), col("j"))))
      .where(col("rn") === 1)

  /** One PQ Lloyd step: assign every subvector to its nearest codeword by
    * exact int64 squared-L2, rebuild each codeword as the per-component
    * floor-quantized mean. At most PqM·PqK·SubDim = 512 update cells
    * regardless of N; empty codewords drop consistently on both engines. */
  private def pqLloydStep(subs: DataFrame, books: DataFrame): DataFrame =
    pqNearest(subs, books)
      .select(col("m"), col("j"), posexplode(col("sv")).as(Seq("pos", "q")))
      .groupBy("m", "j", "pos")
      .agg(count(lit(1)).as("n"), sum("q").as("sum_q"))
      .withColumn("cq", floor(col("sum_q").cast("double") / col("n")).cast("long"))
      .groupBy("m", "j")
      .agg(array_sort(collect_list(struct(col("pos"), col("cq")))).as("pc"))
      .select(col("m"), col("j"), transform(col("pc"), x => x("cq")).as("cv"))

  /** Codebooks after `iters` Lloyd steps (m, j, cv), memoized: shared by
    * the code assignment and both ADC search paths. */
  private def pqBooksIter(spark: SparkSession, dir: String, iters: Int): DataFrame =
    Tables.memoPersist(spark, s"sim.pqBooks:$iters:$dir") {
      val subs = pqSubs(spark, dir)
      var books = subs.where(col("vec_id") < PqK)
        .select(col("m"), col("vec_id").as("j"), col("sv").as("cv"))
      for (_ <- 1 to iters) books = pqLloydStep(subs, books)
      books
    }

  private def pqBooks(spark: SparkSession, dir: String): DataFrame =
    pqBooksIter(spark, dir, PqIters)

  /** Test probe (LloydSpec): total quantization error Σ d (exact int64
    * squared-L2 to the assigned codeword) after `iters` training steps. */
  def pqTrainCostProbe(spark: SparkSession, dir: String, iters: Int): Long =
    pqNearest(pqSubs(spark, dir), pqBooksIter(spark, dir, iters))
      .agg(sum("d").as("cost")).head.getLong(0)

  /** Final per-(vector, subspace) code assignment against the trained
    * books, memoized: the PQ "index" both the code report and the ADC
    * search read. */
  private def pqCodes(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.pqCodes:$PqIters:$dir") {
      pqNearest(pqSubs(spark, dir), pqBooks(spark, dir))
        .select("vec_id", "m", "mult", "j", "d")
    }

  def annPq(spark: SparkSession, dir: String): DataFrame =
    pqCodes(spark, dir)
      .groupBy("vec_id")
      .agg(sum(col("j") * col("mult")).as("pq_code"), sum("d").as("sq_err"))
      .orderBy("vec_id")

  private def pqL2Sql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, ${PqSubDim + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y)"

  /** Generated oracle CTE chain for PQ codebook training + final code
    * assignment over any subvector CTE `sub` (vec_id, m, mult, sv, …):
    * init from the first PqK vectors → PqIters Lloyd rounds → books CTE
    * `${p}tc` → final assignment CTE `${p}r2` (vec_id, m, mult, j, d,
    * plus `extraCols` carried through from `sub`). Generated
    * per-iteration so the GRAFT_PQ_ITERS knob and the SQL cannot drift;
    * `p` prefixes every CTE name so two trainings (raw + residual)
    * compose in one query. */
  private def pqTrainSql(sub: String, p: String, extraCols: Seq[String] = Nil): String = {
    val extraSel = extraCols.map(c => s", s.$c").mkString
    val extraOut = extraCols.map(c => s", $c").mkString
    val head =
      s"""${p}bk0 AS (SELECT m, vec_id AS j, sv AS cv FROM $sub WHERE vec_id < $PqK)""".stripMargin
    val steps = (1 to PqIters).map { it =>
      s"""${p}a$it AS (
         |  SELECT s.vec_id, s.m, s.sv, b.j, ${pqL2Sql("s.sv", "b.cv")} AS d
         |  FROM $sub s JOIN ${p}bk${it - 1} b ON s.m = b.m),
         |${p}r$it AS (
         |  SELECT vec_id, m, sv, j FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
         |    FROM ${p}a$it) t WHERE rn = 1),
         |${p}u$it AS (
         |  SELECT m, j, p.pos AS pos,
         |         CAST(floor(CAST(sum(sv[p.pos]) AS DOUBLE) / count(*)) AS BIGINT) AS cq
         |  FROM ${p}r$it CROSS JOIN (SELECT unnest(range(1, ${PqSubDim + 1})) AS pos) p
         |  GROUP BY m, j, p.pos),
         |${p}bk$it AS (SELECT m, j, list(cq ORDER BY pos) AS cv FROM ${p}u$it GROUP BY m, j)""".stripMargin
    }
    val fin =
      s"""${p}tc AS (SELECT * FROM ${p}bk$PqIters),
         |${p}af AS (
         |  SELECT s.vec_id, s.m, s.mult$extraSel, t.j, ${pqL2Sql("s.sv", "t.cv")} AS d
         |  FROM $sub s JOIN ${p}tc t ON s.m = t.m),
         |${p}r2 AS (
         |  SELECT vec_id, m, mult$extraOut, j, d FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn
         |    FROM ${p}af) t WHERE rn = 1)""".stripMargin
    (head +: steps :+ fin).mkString(",\n")
  }

  /** Raw-subvector PQ chain with the historical CTE names (`sub`, `tc`,
    * `r2`), WITHOUT the leading qvecs CTE — composable after [[VecCte]]
    * (which already brings qvecs) for the IVFADC queries. */
  private def PqCtesBody: String =
    s"""sub AS (
       |  SELECT vec_id, mm.m AS m,
       |         CAST(1 AS BIGINT) << (3 * mm.m) AS mult,
       |         qv[mm.m * $PqSubDim + 1 : mm.m * $PqSubDim + $PqSubDim] AS sv
       |  FROM qvecs CROSS JOIN (SELECT unnest(range(0, $PqM)) AS m) mm),
       |${pqTrainSql("sub", "pq_")},
       |tc AS (SELECT * FROM pq_tc),
       |r2 AS (SELECT * FROM pq_r2)""".stripMargin

  private def PqCtes: String = s"$QvecsCte,\n$PqCtesBody"

  def annPqSql: String =
    s"""WITH $PqCtes
       |SELECT vec_id,
       |       CAST(sum(j * mult) AS BIGINT) AS pq_code,
       |       CAST(sum(d) AS BIGINT) AS sq_err
       |FROM r2 GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---- ann_pq_search: asymmetric-distance (ADC) top-k ---------------------

  /** The PQ QUERY path: asymmetric distance computation. Each query keeps
    * its exact (un-quantized) tick subvectors; every database vector is
    * represented ONLY by its 8 codes, so a query-vector distance is the
    * sum over subspaces of ‖q_m − centroid(code_m)‖² — 8 lookups into a
    * per-query table of PqM·PqK = 64 precomputed partial distances, the
    * constant-time-per-vector scan that makes PQ indexes fast. Here the
    * lookup table is the broadcast (books ⋈ query-subvectors) product and
    * the scan is one co-partitioned join on (m, j) against the memoized
    * code assignment — no vector data moves, only codes. Top-k per query
    * by (ADC distance, vec_id), self-match excluded. Exact int64
    * arithmetic end to end. */
  val PqTopK = 5

  def annPqSearch(spark: SparkSession, dir: String): DataFrame =
    listPq(spark, dir).orderBy("qid", "rnk")

  /** The ADC ranked list, memoized ([[listExact]] note): ann_pq_search
    * serves it; ann_agreement re-reads it. NumQueries×PqTopK rows. */
  private def listPq(spark: SparkSession, dir: String): DataFrame =
   Tables.memoPersist(spark, s"sim.listPq:$PqIters:$dir") {
    val qsubs = pqSubs(spark, dir).where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("m"), col("sv").as("qsv"))
    // per-(query, subspace, code) partial distances: the ADC lookup table
    val lut = qsubs.join(broadcast(pqBooks(spark, dir)), "m")
      .withColumn("pd", l2sq(col("qsv"), col("cv")))
      .select("qid", "m", "j", "pd")
    pqCodes(spark, dir)
      .join(broadcast(lut), Seq("m", "j"))
      .groupBy("qid", "vec_id")
      .agg(sum("pd").as("adc_d"))
      .where(col("qid") =!= col("vec_id"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("adc_d"), col("vec_id"))))
      .where(col("rnk") <= PqTopK)
      .select(col("qid"), col("rnk").cast("long").as("rnk"), col("vec_id"), col("adc_d"))
   }

  /** Shared ADC-retrieval CTEs on top of [[PqCtes]] (`qsub` → `lut` →
    * `adc` → `ranked`), consumed by both the search and its recall
    * evaluation. */
  private def PqSearchCtes: String =
    s"""qsub AS (
       |  SELECT vec_id AS qid, m, sv AS qsv FROM sub WHERE vec_id < $NumQueries),
       |lut AS (
       |  SELECT q.qid, q.m, t.j, ${pqL2Sql("q.qsv", "t.cv")} AS pd
       |  FROM qsub q JOIN tc t ON q.m = t.m),
       |adc AS (
       |  SELECT l.qid, c.vec_id, CAST(sum(l.pd) AS BIGINT) AS adc_d
       |  FROM r2 c JOIN lut l ON c.m = l.m AND c.j = l.j
       |  GROUP BY l.qid, c.vec_id),
       |ranked AS (
       |  SELECT qid, vec_id, adc_d,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY adc_d, vec_id) AS BIGINT) AS rnk
       |  FROM adc WHERE qid <> vec_id)""".stripMargin

  def annPqSearchSql: String =
    s"""WITH $PqCtes,
       |$PqSearchCtes
       |SELECT qid, rnk, vec_id, adc_d
       |FROM ranked WHERE rnk <= $PqTopK
       |ORDER BY qid, rnk""".stripMargin

  // ---- ann_pq_recall: ADC retrieval vs exact-L2 truth ---------------------

  /** Recall@k of the PQ index against the EXACT full-vector squared-L2
    * truth — the ann_recall twin for the PQ family, certifying how much
    * ranking fidelity the 24-bit compression costs before a deployment
    * trusts ADC ordering at scale. Truth is a bounded broadcast-query
    * scan (5 × N int64 distance evaluations, the scoredNeighbors shape
    * with L2 instead of cosine); retrieval is the production
    * annPqSearch, unchanged. recall_e4 is exact integer arithmetic. */
  /** Shared exact-L2 truth set for the PQ recall family: per query the
    * PqTopK nearest vectors by exact full-vector int64 squared L2 (the
    * scoredNeighbors shape with L2 instead of cosine) — ONE definition so
    * ann_pq_recall and ann_ivfpq_recall certify against the same truth
    * and their recall delta isolates the IVF cell-miss loss. */
  private def exactL2TopK(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).select(col("vec_id"), quant.as("qv"))
    val qs = base.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qqv"))
    // bounded-cross: broadcast query table, <= NumQueries rows
    base.crossJoin(broadcast(qs))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("d", l2sq(col("qv"), col("qqv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("d"), col("vec_id"))))
      .where(col("rn") <= PqTopK)
      .select(col("qid"), col("vec_id").as("cid"))
  }

  /** Recall@k join shared by the PQ recall family: exact truth set LEFT
    * JOIN a (qid, cid) retrieval, integer recall_e4 per query. */
  private def recallAgainstTruth(truth: DataFrame, retrieved: DataFrame): DataFrame =
    truth.join(
        retrieved.select(col("qid").as("r_qid"), col("cid").as("r_cid")),
        col("qid") === col("r_qid") && col("cid") === col("r_cid"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("r_cid").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      .withColumn("recall_e4", expr("n_hits * 10000 div n_exact"))
      .orderBy("qid")

  def annPqRecall(spark: SparkSession, dir: String): DataFrame =
    recallAgainstTruth(exactL2TopK(spark, dir),
      annPqSearch(spark, dir).select(col("qid"), col("vec_id").as("cid")))

  /** Oracle twin of [[exactL2TopK]] (`truth` → `ex`), plus the recall
    * SELECT over an already-defined `ret(qid, cid)` CTE. */
  private def PqTruthCtes: String =
    s"""truth AS (
       |  SELECT q.vec_id AS qid, a.vec_id AS cid,
       |         row_number() OVER (
       |           PARTITION BY q.vec_id
       |           ORDER BY list_reduce(list_transform(range(1, ${Dim + 1}),
       |                     i -> (a.qv[i] - q.qv[i]) * (a.qv[i] - q.qv[i])),
       |                   (x, y) -> x + y), a.vec_id) AS rn
       |  FROM qvecs a
       |  CROSS JOIN (SELECT vec_id, qv FROM qvecs WHERE vec_id < $NumQueries) q
       |  WHERE a.vec_id <> q.vec_id),
       |ex AS (SELECT qid, cid FROM truth WHERE rn <= $PqTopK)""".stripMargin

  private def RecallSelectSql: String =
    s"""SELECT e.qid, count(*) AS n_exact,
       |       CAST(sum(CASE WHEN r.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(sum(CASE WHEN r.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         * 10000 // count(*) AS recall_e4
       |FROM ex e
       |LEFT JOIN ret r ON e.qid = r.qid AND e.cid = r.cid
       |GROUP BY e.qid ORDER BY e.qid""".stripMargin

  def annPqRecallSql: String =
    s"""WITH $PqCtes,
       |$PqSearchCtes,
       |$PqTruthCtes,
       |ret AS (SELECT qid, vec_id AS cid FROM ranked WHERE rnk <= $PqTopK)
       |$RecallSelectSql""".stripMargin

  // ---- ann_ivfpq_search: IVF-routed ADC (IVFADC) ---------------------------

  /** IVFADC composition (Jégou/Douze/Schmid PAMI'11 §IV-B): the IVF coarse
    * quantizer routes each query to its NProbe nearest cells, and the ADC
    * scan runs ONLY over the PQ codes of vectors assigned to those cells —
    * the standard composition that turns the exhaustive ann_pq_search scan
    * (every code row, per query) into an N·NProbe/NumCells-row scan. This
    * is the residual-free variant: codes are the GLOBAL PQ codes (no
    * per-cell re-encoding), so the memoized code index is shared verbatim
    * with ann_pq / ann_pq_search and the recall delta between
    * ann_pq_recall and ann_ivfpq_recall isolates pure cell-miss loss.
    *
    * Scale shape: the routed lookup table (query × probed cell ×
    * PqM·PqK partial distances) is a bounded broadcast build — queries ×
    * NProbe·64 rows; the scan side is ONE broadcast hash join against the
    * memoized (vector, cell) + code index, so codes never shuffle and
    * full vectors never move. At 1e9 vectors with √N cells and nprobe=2
    * the per-query candidate set is ~2√N ≈ 64k code rows vs 1e9 — the
    * 100 TB gap VERDICT r7 flagged against the exhaustive ADC scan. */
  /** Full IVFADC ranking (no top-k cut): shared by the production cut
    * (annIvfPqSearch) and the exact re-rank's wider shortlist. */
  private def ivfPqRankedAll(spark: SparkSession, dir: String): DataFrame = {
    val assign = cellAssignments(spark, dir)
    val members = assign.where(col("rnk") === 1)
      .select(col("avid").as("vec_id"), col("seed_id").as("cell"))
    val probes = assign.where(col("avid") < NumQueries && col("rnk") <= NProbe)
      .select(col("avid").as("qid"), col("seed_id").as("pcell"))
    val qsubs = pqSubs(spark, dir).where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("m"), col("sv").as("qsv"))
    // per-(query, subspace, code) ADC partial distances, routed to the
    // query's probed cells — the broadcast side of the scan join
    val lut = qsubs.join(pqBooks(spark, dir), "m")
      .withColumn("pd", l2sq(col("qsv"), col("cv")))
      .select(col("qid"), col("m"), col("j"), col("pd"))
    val routedLut = probes.join(lut, "qid")
      .select(col("qid"), col("pcell"), col("m").as("lm"), col("j").as("lj"), col("pd"))
    pqCodes(spark, dir)
      .join(members, "vec_id")
      .join(broadcast(routedLut),
        col("cell") === col("pcell") && col("m") === col("lm") && col("j") === col("lj"))
      .where(col("qid") =!= col("vec_id"))
      .groupBy("qid", "vec_id", "cell")
      .agg(sum("pd").as("adc_d"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("adc_d"), col("vec_id"))))
  }

  def annIvfPqSearch(spark: SparkSession, dir: String): DataFrame =
    listIvfPq(spark, dir).orderBy("qid", "rnk")

  /** The IVFADC shortlist (rnk ≤ PqShortR), memoized: the widest slice of
    * [[ivfPqRankedAll]] any consumer reads. Before round 17 only the
    * top-PqTopK search list was memoized, so the exact re-rank
    * (ann_ivfpq_rerank, + its recall cert) and the shortlist
    * hard-negative miner (ann_hard_neg_shortlist) each re-derived the
    * whole ADC ranking chain — codes⋈members⋈broadcast-LUT, partial-sum
    * aggregate, per-query window — per query (guide §2.4: two operations
    * keyed the same way share one exchange; here they share the whole
    * subtree). NumQueries×PqShortR rows; every consumer is a filter of
    * this frame, so results are unchanged by construction. */
  private def ivfPqShortlist(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark,
        s"sim.ivfpqShort:$NumCells:$IvfIters:$PqIters:$PqShortR:$dir") {
      ivfPqRankedAll(spark, dir)
        .where(col("rnk") <= PqShortR)
        .select(col("qid"), col("rnk"), col("vec_id"), col("cell"), col("adc_d"))
    }

  /** The IVFADC ranked list, memoized ([[listExact]] note): the search
    * serves it; ann_agreement re-reads it. NumQueries×PqTopK rows — a
    * prefix filter of the memoized [[ivfPqShortlist]] (PqTopK ≤ PqShortR). */
  private def listIvfPq(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.listIvfPq:$NumCells:$IvfIters:$PqIters:$dir") {
      ivfPqShortlist(spark, dir)
        .where(col("rnk") <= PqTopK)
        .select(col("qid"), col("rnk").cast("long").as("rnk"), col("vec_id"),
          col("cell"), col("adc_d"))
    }

  /** Shared IVFADC retrieval CTEs: requires [[VecCte]] + [[IvfTrainCtes]]
    * + [[IvfAssignCtes]] + [[PqCtesBody]] in scope; defines `ivranked`
    * (qid, vec_id, cell, adc_d, rnk) over the probed cells only. */
  private def IvfPqRetrievalCtes: String =
    s"""ivqsub AS (
       |  SELECT vec_id AS qid, m, sv AS qsv FROM sub WHERE vec_id < $NumQueries),
       |ivlut AS (
       |  SELECT q.qid, q.m, t.j, ${pqL2Sql("q.qsv", "t.cv")} AS pd
       |  FROM ivqsub q JOIN tc t ON q.m = t.m),
       |ivadc AS (
       |  SELECT l.qid, c.vec_id, cl.cell, CAST(sum(l.pd) AS BIGINT) AS adc_d
       |  FROM r2 c
       |  JOIN cells cl ON c.vec_id = cl.cid
       |  JOIN probes p ON cl.cell = p.pcell
       |  JOIN ivlut l ON l.qid = p.qid AND c.m = l.m AND c.j = l.j
       |  WHERE p.qid <> c.vec_id
       |  GROUP BY 1, 2, 3),
       |ivranked AS (
       |  SELECT qid, vec_id, cell, adc_d,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY adc_d, vec_id) AS BIGINT) AS rnk
       |  FROM ivadc)""".stripMargin

  def annIvfPqSearchSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |$PqCtesBody,
       |$IvfPqRetrievalCtes
       |SELECT qid, rnk, vec_id, cell, adc_d
       |FROM ivranked WHERE rnk <= $PqTopK
       |ORDER BY qid, rnk""".stripMargin

  // ---- ann_ivfpq_rerank: IVFADC shortlist + exact re-rank ------------------

  /** Shortlist width for the exact re-rank stage (R in Jégou §VII's
    * "re-ranking with source coding" recipe): the ADC pass keeps R ≫ k
    * candidates, the exact pass re-scores only those R. */
  val PqShortR = 20

  /** The composition a production deployment actually ships: IVFADC
    * produces a cheap R-candidate shortlist from codes alone, then the
    * exact full-vector distance re-ranks just those R rows — ADC
    * quantization error can reorder or drop true neighbors near the cut,
    * and the re-rank recovers every case where the true neighbor made the
    * shortlist (certified by ann_ivfpq_rerank_recall vs the same exact-L2
    * truth the whole recall family shares; the residual gap vs 10000 is
    * pure shortlist miss — tune PqShortR/NProbe against it).
    *
    * Scale shape: the shortlist (queries × R ids) is an explicit
    * `broadcast()` against the vector table, so fetching candidate
    * payloads is a broadcast hash join touching R·queries full vectors —
    * the corpus never shuffles and the exhaustive-scan cost the ADC stage
    * avoided is not reintroduced. The re-rank itself is queries × R
    * arithmetic. */
  def annIvfPqRerank(spark: SparkSession, dir: String): DataFrame = {
    val shortlist = ivfPqShortlist(spark, dir)
      .select(col("qid"), col("vec_id"))
    val base = Tables.embeddings(spark, dir).select(col("vec_id"), quant.as("qv"))
    val qs = base.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("qv").as("qqv"))
    base.join(broadcast(shortlist), "vec_id")
      .join(broadcast(qs), "qid")
      .withColumn("l2_d", l2sq(col("qv"), col("qqv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("l2_d"), col("vec_id"))))
      .where(col("rnk") <= PqTopK)
      .select(col("qid"), col("rnk").cast("long").as("rnk"), col("vec_id"),
        col("l2_d"))
      .orderBy("qid", "rnk")
  }

  /** Oracle re-rank CTEs over an in-scope `ivranked` + `qvecs`; defines
    * `ivrranked` (qid, vec_id, l2_d, rnk). */
  private def IvfPqRerankCtes: String =
    s"""ivshort AS (SELECT qid, vec_id FROM ivranked WHERE rnk <= $PqShortR),
       |ivrr AS (
       |  SELECT s.qid, s.vec_id,
       |         CAST(list_reduce(list_transform(range(1, ${Dim + 1}),
       |                i -> (b.qv[i] - q.qv[i]) * (b.qv[i] - q.qv[i])),
       |              (x, y) -> x + y) AS BIGINT) AS l2_d
       |  FROM ivshort s
       |  JOIN qvecs b ON b.vec_id = s.vec_id
       |  JOIN qvecs q ON q.vec_id = s.qid),
       |ivrranked AS (
       |  SELECT qid, vec_id, l2_d,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY l2_d, vec_id) AS BIGINT) AS rnk
       |  FROM ivrr)""".stripMargin

  def annIvfPqRerankSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |$PqCtesBody,
       |$IvfPqRetrievalCtes,
       |$IvfPqRerankCtes
       |SELECT qid, rnk, vec_id, l2_d
       |FROM ivrranked WHERE rnk <= $PqTopK
       |ORDER BY qid, rnk""".stripMargin

  /** Recall@k of the re-ranked retrieval vs the shared exact-L2 truth:
    * read against ann_ivfpq_recall, the delta is what exact re-ranking
    * buys back at the same NProbe/NumCells routing. */
  def annIvfPqRerankRecall(spark: SparkSession, dir: String): DataFrame =
    recallAgainstTruth(exactL2TopK(spark, dir),
      annIvfPqRerank(spark, dir).select(col("qid"), col("vec_id").as("cid")))

  def annIvfPqRerankRecallSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |$PqCtesBody,
       |$IvfPqRetrievalCtes,
       |$IvfPqRerankCtes,
       |$PqTruthCtes,
       |ret AS (SELECT qid, vec_id AS cid FROM ivrranked WHERE rnk <= $PqTopK)
       |$RecallSelectSql""".stripMargin

  // ---- ann_ivfpq_recall: IVFADC retrieval vs exact-L2 truth ----------------

  /** Recall@k of the composed IVFADC retrieval against the same exact-L2
    * truth ann_pq_recall certifies against — the acceptance gate for the
    * nprobe/NumCells setting: recall here < recall there is pure coarse-
    * quantizer miss (the true neighbor's cell was not probed), the cost a
    * deployment tunes NProbe against before shipping the routed index. */
  def annIvfPqRecall(spark: SparkSession, dir: String): DataFrame =
    recallAgainstTruth(exactL2TopK(spark, dir),
      annIvfPqSearch(spark, dir).select(col("qid"), col("vec_id").as("cid")))

  def annIvfPqRecallSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |$PqCtesBody,
       |$IvfPqRetrievalCtes,
       |$PqTruthCtes,
       |ret AS (SELECT qid, vec_id AS cid FROM ivranked WHERE rnk <= $PqTopK)
       |$RecallSelectSql""".stripMargin

  // ---- ann_ivfpq_res_search: residual-encoding IVFADC ----------------------

  /** Residual per-(vector, subspace) rows: each indexed vector's offset
    * from its OWN cell centroid, split into PQ subspaces — the encoding
    * the canonical IVFADC quantizes (Jégou/Douze/Schmid PAMI'11 §IV-A).
    * Residuals are far more concentrated than raw vectors (the coarse
    * quantizer has already explained the cell-level structure), so the
    * same 3-bit-per-subspace budget buys strictly more precision; the
    * ADC estimate ‖(q−c) − (v−c)‖² cancels the cell centroid and
    * approximates the TRUE inter-vector distance, not distance-to-code.
    * All arithmetic stays int64 tick-exact (residual = qv − sv,
    * component-wise). Restricted to vectors with a cell (n2 > 0), like
    * every IVF path. */
  private def residualSubs(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.resSubs:$NumCells:$IvfIters:$dir") {
      val v = vectors(spark, dir)
      val cells1 = cellAssignments(spark, dir).where(col("rnk") === 1)
        .select(col("avid"), col("seed_id"))
      val seeds = trainedCentroids(spark, dir)
        .select(col("seed_id"), col("sv").as("csv"))
      val res = v.join(cells1, col("vec_id") === col("avid"))
        .join(broadcast(seeds), "seed_id")
        .select(col("vec_id"), col("seed_id").as("cell"),
          zip_with(col("qv"), col("csv"), (x, y) => x - y).as("rv"))
      val subStructs = array((0 until PqM).map { m =>
        struct(lit(m.toLong).as("m"), lit(1L << (3 * m)).as("mult"),
          slice(col("rv"), m * PqSubDim + 1, PqSubDim).as("sv"))
      }: _*)
      res.select(col("vec_id"), col("cell"), explode(subStructs).as("s"))
        .select(col("vec_id"), col("cell"), col("s.m").as("m"),
          col("s.mult").as("mult"), col("s.sv").as("sv"))
    }

  /** Residual codebooks: the same deterministic init + Lloyd convention
    * as [[pqBooksIter]], trained on residual subvectors. */
  private def resBooks(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.resBooks:$NumCells:$IvfIters:$PqIters:$dir") {
      val subs = residualSubs(spark, dir)
      var books = subs.where(col("vec_id") < PqK)
        .select(col("m"), col("vec_id").as("j"), col("sv").as("cv"))
      for (_ <- 1 to PqIters) books = pqLloydStep(subs, books)
      books
    }

  /** Residual code index (vec_id, cell, m, mult, j, d), memoized. */
  private def resCodes(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.resCodes:$NumCells:$IvfIters:$PqIters:$dir") {
      pqNearest(residualSubs(spark, dir), resBooks(spark, dir))
        .select("vec_id", "cell", "m", "mult", "j", "d")
    }

  /** Canonical (residual-encoding) IVFADC search: identical routing to
    * [[annIvfPqSearch]], but the query's lookup table is built per
    * PROBED CELL from the query's own residual against that cell —
    * ‖(q−c)_m − codeword‖² — so the broadcast stays queries × nprobe ×
    * PqM·PqK rows and the scan side is still one broadcast hash join
    * against the memoized code index. */
  def annIvfPqResSearch(spark: SparkSession, dir: String): DataFrame = {
    val assign = cellAssignments(spark, dir)
    val probes = assign.where(col("avid") < NumQueries && col("rnk") <= NProbe)
      .select(col("avid").as("qid"), col("seed_id").as("pcell"))
    val seeds = trainedCentroids(spark, dir)
      .select(col("seed_id"), col("sv").as("csv"))
    val q = vectors(spark, dir).where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("qv"))
    // per-(query, probed cell) residual, split into subspaces
    val qres = probes.join(q, "qid")
      .join(broadcast(seeds), col("pcell") === col("seed_id"))
      .select(col("qid"), col("pcell"),
        zip_with(col("qv"), col("csv"), (x, y) => x - y).as("rv"))
    val qsubStructs = array((0 until PqM).map { m =>
      struct(lit(m.toLong).as("m"), slice(col("rv"), m * PqSubDim + 1, PqSubDim).as("qsv"))
    }: _*)
    val lut = qres.select(col("qid"), col("pcell"), explode(qsubStructs).as("s"))
      .select(col("qid"), col("pcell"), col("s.m").as("m"), col("s.qsv").as("qsv"))
      .join(resBooks(spark, dir), "m")
      .withColumn("pd", l2sq(col("qsv"), col("cv")))
      .select(col("qid"), col("pcell"), col("m").as("lm"), col("j").as("lj"), col("pd"))
    resCodes(spark, dir)
      .join(broadcast(lut),
        col("cell") === col("pcell") && col("m") === col("lm") && col("j") === col("lj"))
      .where(col("qid") =!= col("vec_id"))
      .groupBy("qid", "vec_id", "cell")
      .agg(sum("pd").as("adc_d"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("adc_d"), col("vec_id"))))
      .where(col("rnk") <= PqTopK)
      .select(col("qid"), col("rnk").cast("long").as("rnk"), col("vec_id"),
        col("cell"), col("adc_d"))
      .orderBy("qid", "rnk")
  }

  /** Recall@k of the residual IVFADC retrieval against the shared
    * exact-L2 truth: with identical routing, recall here minus
    * ann_ivfpq_recall isolates what residual encoding buys back of the
    * quantization loss — the acceptance comparison a deployment runs
    * before choosing which code layout to build at 1e9 vectors. */
  def annIvfPqResRecall(spark: SparkSession, dir: String): DataFrame =
    recallAgainstTruth(exactL2TopK(spark, dir),
      annIvfPqResSearch(spark, dir).select(col("qid"), col("vec_id").as("cid")))

  /** Shared residual-IVFADC oracle CTEs: residual subvectors off the
    * `cells`/`seeds` chain, PQ training over them (prefix `rq_`), the
    * per-(query, probed-cell) residual LUT, and the ranked retrieval. */
  private def IvfPqResRetrievalCtes: String =
    s"""rsub AS (
       |  SELECT cl.cid AS vec_id, cl.cell AS cell, mm.m AS m,
       |         CAST(1 AS BIGINT) << (3 * mm.m) AS mult,
       |         list_transform(range(1, ${PqSubDim + 1}),
       |           i -> cl.cv[mm.m * $PqSubDim + i] - s.sv[mm.m * $PqSubDim + i]) AS sv
       |  FROM cells cl JOIN seeds s ON cl.cell = s.seed_id
       |  CROSS JOIN (SELECT unnest(range(0, $PqM)) AS m) mm),
       |${pqTrainSql("rsub", "rq_", Seq("cell"))},
       |rqres AS (
       |  SELECT p.qid, p.pcell, mm.m AS m,
       |         list_transform(range(1, ${PqSubDim + 1}),
       |           i -> q.qv[mm.m * $PqSubDim + i] - s.sv[mm.m * $PqSubDim + i]) AS qsv
       |  FROM probes p
       |  JOIN vecs q ON p.qid = q.vec_id
       |  JOIN seeds s ON p.pcell = s.seed_id
       |  CROSS JOIN (SELECT unnest(range(0, $PqM)) AS m) mm),
       |rlut AS (
       |  SELECT r.qid, r.pcell, r.m, t.j, ${pqL2Sql("r.qsv", "t.cv")} AS pd
       |  FROM rqres r JOIN rq_tc t ON r.m = t.m),
       |radc AS (
       |  SELECT l.qid, c.vec_id, c.cell, CAST(sum(l.pd) AS BIGINT) AS adc_d
       |  FROM rq_r2 c
       |  JOIN rlut l ON c.cell = l.pcell AND c.m = l.m AND c.j = l.j
       |  WHERE l.qid <> c.vec_id
       |  GROUP BY 1, 2, 3),
       |rranked AS (
       |  SELECT qid, vec_id, cell, adc_d,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY adc_d, vec_id) AS BIGINT) AS rnk
       |  FROM radc)""".stripMargin

  def annIvfPqResSearchSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |$IvfPqResRetrievalCtes
       |SELECT qid, rnk, vec_id, cell, adc_d
       |FROM rranked WHERE rnk <= $PqTopK
       |ORDER BY qid, rnk""".stripMargin

  def annIvfPqResRecallSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |$IvfPqResRetrievalCtes,
       |$PqTruthCtes,
       |ret AS (SELECT qid, vec_id AS cid FROM rranked WHERE rnk <= $PqTopK)
       |$RecallSelectSql""".stripMargin

  // ---- ann_agreement: retrieval method-agreement matrix --------------------

  /** Top-k agreement matrix across the engine's four retrieval paths —
    * exact cosine, banded LSH, exhaustive ADC, and IVFADC — the retrieval
    * twin of dedup_agreement: before trusting a cheaper index at scale, a
    * deployment reads how much of each method's answer set the others
    * reproduce ON ITS OWN CORPUS (recall certs score against one truth;
    * this scores every pair of paths against each other, which also
    * exposes when two approximations agree with each other but not with
    * the truth — correlated error that recall alone can't separate).
    * All four lists reuse the production operators unchanged at a common
    * k = LshK; n_common/n_a/n_b are exact integers and the overlap is
    * integer fixed-point against the smaller list. Each source frame is
    * queries×k rows, so every join here is broadcast-trivial however big
    * the corpus — the cost is building the four retrievals, each already
    * audited. */
  def annAgreement(spark: SparkSession, dir: String): DataFrame = {
    val k = LshK
    // Each leg is a retrieval list of at most NumQueries×k rows (5×3 = 15
    // here) — bounded by knobs, N-independent, so the union (≤ 60 rows)
    // falls under SURVEY §5's bounded-collect rule. The four retrieval
    // jobs still run sequentially (one index family in flight at a time,
    // the round-11 peak-memory bound), but the overlap matrix over those
    // ≤ 60 rows is computed on the driver: the previous shape paid four
    // eager localCheckpoints plus a shuffled self-join + two aggregations
    // to intersect 60 rows, which is why ann_agreement cost 5.4 s at
    // sf0.1 while its four legs cost ~2.0 s run standalone (the round-11
    // verdict's one real perf residual).
    def leg(name: String, df: DataFrame): Array[(String, Long, Long)] =
      // bounded-collect: ≤ NumQueries×k rows per leg (knob product,
      // N-independent). CollectGateSpec-audited.
      df.collect().map(r => (name, r.getLong(0), r.getLong(1)))
    val lists =
      leg("exact", listExact(spark, dir).where(col("rnk") <= k)
        .select(col("qid"), col("cid"))) ++
      leg("lsh", listLsh(spark, dir).where(col("aid") < NumQueries && col("rnk") <= k)
        .select(col("aid"), col("bid"))) ++
      leg("pq_adc", listPq(spark, dir).where(col("rnk") <= k)
        .select(col("qid"), col("vec_id"))) ++
      leg("ivfpq", listIvfPq(spark, dir).where(col("rnk") <= k)
        .select(col("qid"), col("vec_id")))
    val byMethod = lists.groupBy(_._1)
    val sets = byMethod.map { case (m, rs) => m -> rs.map(t => (t._2, t._3)).toSet }
    // every ordered method pair appears even at zero overlap; a top-k
    // list has distinct (qid, cid) rows by construction, so |list| =
    // |set| and intersection size IS the old self-join's n_common
    val methods = sets.keys.toSeq.sorted
    val rows = for { a <- methods; b <- methods if a < b } yield {
      val (na, nb) = (sets(a).size.toLong, sets(b).size.toLong)
      val nc = (sets(a) & sets(b)).size.toLong
      (a, b, na, nb, nc, nc * 10000L / math.min(na, nb))
    }
    import spark.implicits._
    rows.toDF("method_a", "method_b", "n_a", "n_b", "n_common", "overlap_e4")
      .orderBy("method_a", "method_b")
  }

  def annAgreementSql: String =
    s"""WITH $VecCte,
       |$BruteScoredCte,
       |$ScoredPairsCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |$PqCtesBody,
       |$PqSearchCtes,
       |$IvfPqRetrievalCtes,
       |exact_l AS (
       |  SELECT 'exact' AS method, qid, cid FROM (
       |    SELECT qid, cid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |    FROM bscored) r WHERE rnk <= $LshK),
       |lsh_l AS (
       |  SELECT 'lsh' AS method, qid, cid FROM (
       |    SELECT aid AS qid, bid AS cid,
       |           row_number() OVER (PARTITION BY aid ORDER BY cos DESC, bid) AS rnk
       |    FROM (SELECT aid, bid, cos FROM spaired
       |          UNION ALL
       |          SELECT bid, aid, cos FROM spaired) d
       |    WHERE aid < $NumQueries) r WHERE rnk <= $LshK),
       |pq_l AS (
       |  SELECT 'pq_adc' AS method, qid, vec_id AS cid FROM ranked WHERE rnk <= $LshK),
       |ivf_l AS (
       |  SELECT 'ivfpq' AS method, qid, vec_id AS cid FROM ivranked WHERE rnk <= $LshK),
       |lists AS (
       |  SELECT * FROM exact_l UNION ALL SELECT * FROM lsh_l
       |  UNION ALL SELECT * FROM pq_l UNION ALL SELECT * FROM ivf_l),
       |sizes AS (SELECT method, count(*) AS n FROM lists GROUP BY method),
       |common AS (
       |  SELECT a.method AS method_a, b.method AS method_b, count(*) AS n_common
       |  FROM lists a JOIN lists b
       |    ON a.qid = b.qid AND a.cid = b.cid AND a.method < b.method
       |  GROUP BY 1, 2)
       |SELECT sa.method AS method_a, sb.method AS method_b,
       |       sa.n AS n_a, sb.n AS n_b,
       |       CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
       |       CAST(coalesce(c.n_common, 0) AS BIGINT) * 10000
       |         // least(sa.n, sb.n) AS overlap_e4
       |FROM sizes sa JOIN sizes sb ON sa.method < sb.method
       |LEFT JOIN common c ON c.method_a = sa.method AND c.method_b = sb.method
       |ORDER BY method_a, method_b""".stripMargin

  // ---- dedup_semantic: cluster-scoped semantic dedup (SemDeDup) ------------

  /** Semantic deduplication in embedding space, cluster-then-dedup shape
    * (SemDeDup, Abbas et al. 2023, arXiv:2303.09540 — public): vectors are
    * first routed to their IVF cell (the trained coarse quantizer the whole
    * ANN family shares), then exact cosine runs ONLY within each cell; a
    * vector is dropped when a smaller-id cell-mate scores >= the corpus
    * near-dup threshold (DupThresholdE6 — same τ as embed_cosine_dup, so
    * the two monitors agree on what "near-dup" means), reporting the
    * highest-cosine such keeper as dup_of (ties to the smaller keeper id).
    *
    * vs embed_cosine_dup: that pass finds pairs the LSH index surfaces
    * (probabilistic recall, global scope); this pass is exhaustive WITHIN a
    * cell and blind across cells — the SemDeDup trade: candidate cost drops
    * from LSH-bucket collisions to cell-bounded all-pairs, and cross-cell
    * near-dups (rare by construction: near-dups co-assign under the same
    * quantizer) are the accepted miss.
    *
    * Scale shape: members shuffle ONCE on cell id; the self-join is
    * cell-co-partitioned so no second exchange, and the pair space is
    * Σ_c |cell_c|² — at 100 TB NumCells scales as N/k (fixed target cell
    * size k, the published SemDeDup operating point), keeping per-cell
    * pairs flat while the cells themselves stay an embarrassingly parallel
    * scan. The keeper window partitions by the dropped id, whose candidate
    * rows are bounded by its own cell population. */
  /** Directed within-cell group-pair exact cosines (cell, src, dst, cos),
    * memoized: the cell-cohort pair scan is the shared kernel of the
    * cell-scoped family — SemDeDup (dedup_semantic), the kNN label vote
    * (label_noise) and the NN-Descent seed graph (ann_nn_graph's build)
    * each re-derived the identical cohort join + cosine subtree per query
    * before round 17 (guide §2.4: share the subtree, §5: recompute vs
    * reuse). Self-pairs stay per-consumer: they are LINEAR in groups and
    * each consumer wants a different projection of them.
    *
    * Footprint (r17 advice): rows = Σ_c g_c·(g_c−1) over cells (g_c =
    * DISTINCT-vector groups in cell c, both directions), 4 narrow columns
    * — quadratic in cell cohort size but group-level, never member-level.
    * At the SemDeDup operating point NumCells tracks N/k (fixed target
    * cell size k), so rows/cell stay ~k² and the frame scales LINEARLY
    * with groups; MEMORY_AND_DISK spills rather than evicting other
    * memos. If a stress point ever shows this frame dominating the store,
    * persist only the union of consumer slices (threshold-filtered +
    * per-src top-max(NndL, LnK+1)) instead of the full directed frame. */
  private def cellPairCos(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.cellPairCos:$NumCells:$IvfIters:$dir") {
      val cellOf = cellAssignments(spark, dir).where(col("rnk") === 1)
        .select(col("avid").as("gid"), col("seed_id").as("cell"))
      val cg = vecGroups(spark, dir).join(cellOf, "gid")
        .select(col("cell"), col("gid"), col("qv"), col("n2"))
      val a = cg.select(col("cell"), col("gid").as("src"),
        col("qv").as("qa"), col("n2").as("na2"))
      val b = cg.select(col("cell").as("cell_b"), col("gid").as("dst"),
        col("qv").as("qb"), col("n2").as("nb2"))
      a.join(b, col("cell") === col("cell_b") && col("src") =!= col("dst"))
        .select(col("cell"), col("src"), col("dst"),
          cosine(dot(col("qa"), col("qb")), col("na2"), col("nb2")).as("cos"))
    }

  def dedupSemantic(spark: SparkSession, dir: String): DataFrame = {
    // Collapsed SemDeDup (round 11): the naive within-cell member join is
    // quadratic in duplicate multiplicity (identical vectors share a
    // cell BY CONSTRUCTION — the exact situation SemDeDup exists for).
    // Collapse: a member b's best candidate from any group G is always
    // G's MIN member id when that id is below b (candidates from G tie
    // on cos, ties rank by id; and if min(G) ≥ b no member of G is
    // below b) — so per member the candidate list is its group's
    // DIRECTED qualifying group pairs filtered to gid < b, with the
    // group's own gid standing in for the within-group candidates. The
    // group-pair join is flat in multiplicity; the expansion is
    // members × (few qualifying groups) — output-sized.
    val cellOf = cellAssignments(spark, dir).where(col("rnk") === 1)
      .select(col("avid").as("gid"), col("seed_id").as("cell"))
    val cg = vecGroups(spark, dir).join(cellOf, "gid")
      .select(col("cell"), col("gid"), col("qv"), col("n2"))
    val cross = cellPairCos(spark, dir)
      .select(col("cell"), col("src"), col("dst"), cosE6(col("cos")).as("cos_e6"))
    val self = cg.select(col("cell"), col("gid").as("src"), col("gid").as("dst"),
      cosE6(selfCos(col("n2"))).as("cos_e6"))
    val cand = cross.unionByName(self).where(col("cos_e6") >= DupThresholdE6)
    vecMembers(spark, dir).join(cand, col("gid") === col("src"))
      .where(col("dst") < col("vec_id"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos_e6").desc, col("dst"))))
      .where(col("rnk") === 1)
      .select(col("cell"), col("vec_id"), col("dst").as("dup_of"), col("cos_e6"))
      .orderBy("vec_id")
  }

  /** The pre-collapse member-level SemDeDup, kept as the equivalence
    * reference for DupCollapseSpec — NEVER registered as a query. */
  private[graft] def dedupSemanticNaiveProbe(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val members = cellAssignments(spark, dir).where(col("rnk") === 1)
      .select(col("avid"), col("seed_id").as("cell"))
      .join(v, col("avid") === col("vec_id"))
      .select(col("cell"), col("vec_id"), col("qv"), col("n2"))
    val a = members.select(col("cell"), col("vec_id").as("aid"),
      col("qv").as("qa"), col("n2").as("na2"))
    val b = members.select(col("cell").as("cell_b"), col("vec_id").as("bid"),
      col("qv").as("qb"), col("n2").as("nb2"))
    a.join(b, col("cell") === col("cell_b") && col("aid") < col("bid"))
      .withColumn("cos_e6", cosE6(cosine(dot(col("qa"), col("qb")), col("na2"), col("nb2"))))
      .where(col("cos_e6") >= DupThresholdE6)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("bid").orderBy(col("cos_e6").desc, col("aid"))))
      .where(col("rnk") === 1)
      .select(col("cell"), col("bid").as("vec_id"), col("aid").as("dup_of"), col("cos_e6"))
      .orderBy("vec_id")
  }

  def dedupSemanticSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |sdp AS (
       |  SELECT a.cell, a.cid AS aid, b.cid AS bid,
       |         CAST(floor(
       |           CAST(list_reduce(list_transform(range(1, ${Dim + 1}), i -> a.cv[i] * b.cv[i]), (x, y) -> x + y) AS DOUBLE)
       |             / (sqrt(CAST(a.cn2 AS DOUBLE)) * sqrt(CAST(b.cn2 AS DOUBLE)))
       |           * 1000000.0) AS BIGINT) AS cos_e6
       |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.cid < b.cid),
       |sdr AS (
       |  SELECT cell, aid, bid, cos_e6,
       |         row_number() OVER (PARTITION BY bid ORDER BY cos_e6 DESC, aid) AS rnk
       |  FROM sdp WHERE cos_e6 >= $DupThresholdE6)
       |SELECT cell, bid AS vec_id, aid AS dup_of, cos_e6
       |FROM sdr WHERE rnk = 1
       |ORDER BY vec_id""".stripMargin

  // ---- embed_prune: prototypicality-ranked data pruning --------------------

  /** Keep-hard data pruning by cluster prototypicality (Sorscher et al.
    * 2022, "Beyond neural scaling laws", arXiv:2206.14486 — public): within
    * each trained IVF cell, members rank by cosine to their OWN cell
    * centroid (most prototypical = most redundant first), and the top
    * PruneNum/PruneDen fraction is marked pruned — the abundant-data
    * regime's selection rule, where dropping the easiest/most-typical
    * examples beats random subsampling. Emits the per-cell audit a curation
    * run reviews before committing the cut: population, pruned count, and
    * the cosine at the keep boundary on each side (cut_cos_e6 = last pruned
    * row, keep_max_cos_e6 = first kept row).
    *
    * Scale shape: the centroid table is a NumCells-row broadcast; ranking
    * is one window partitioned by cell over the single cell-routed shuffle
    * the dedup pass already pays; output is NumCells rows. */
  val PruneNum = 1
  val PruneDen = 4

  def embedPrune(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val seeds = trainedCentroids(spark, dir)
    val ranked = cellAssignments(spark, dir).where(col("rnk") === 1)
      .select(col("avid"), col("seed_id").as("cell"))
      .join(v, col("avid") === col("vec_id"))
      .join(broadcast(seeds), col("cell") === col("seed_id"))
      .withColumn("cos_e6", cosE6(cosine(dot(col("qv"), col("sv")), col("n2"), col("sn2"))))
      .withColumn("prnk", row_number().over(
        Window.partitionBy("cell").orderBy(col("cos_e6").desc, col("vec_id"))))
      .withColumn("n_members", count(lit(1)).over(Window.partitionBy("cell")))
      .withColumn("pruned",
        (col("prnk") <= expr(s"(n_members * $PruneNum) div $PruneDen")).cast("long"))
    ranked.groupBy("cell")
      .agg(max("n_members").as("n_members"),
        sum("pruned").as("n_pruned"),
        min(when(col("pruned") === 1, col("cos_e6"))).as("cut_cos_e6"),
        max(when(col("pruned") === 0, col("cos_e6"))).as("keep_max_cos_e6"))
      .orderBy("cell")
  }

  def embedPruneSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |epr AS (
       |  SELECT a.seed_id AS cell, v.vec_id,
       |         CAST(floor(${cosToSeedSql("v", "s")} * 1000000.0) AS BIGINT) AS cos_e6
       |  FROM assign a
       |  JOIN vecs v ON a.avid = v.vec_id
       |  JOIN seeds s ON a.seed_id = s.seed_id
       |  WHERE a.rnk = 1),
       |epw AS (
       |  SELECT cell, vec_id, cos_e6,
       |         row_number() OVER (PARTITION BY cell ORDER BY cos_e6 DESC, vec_id) AS prnk,
       |         count(*) OVER (PARTITION BY cell) AS n_members
       |  FROM epr),
       |epm AS (
       |  SELECT cell, cos_e6, n_members,
       |         CASE WHEN prnk <= (n_members * $PruneNum) // $PruneDen
       |              THEN 1 ELSE 0 END AS pruned
       |  FROM epw)
       |SELECT cell, CAST(max(n_members) AS BIGINT) AS n_members,
       |       CAST(sum(pruned) AS BIGINT) AS n_pruned,
       |       min(CASE WHEN pruned = 1 THEN cos_e6 END) AS cut_cos_e6,
       |       max(CASE WHEN pruned = 0 THEN cos_e6 END) AS keep_max_cos_e6
       |FROM epm GROUP BY cell ORDER BY cell""".stripMargin

  // ---- embed_label_margin: class-separability audit ------------------------

  /** Per-label separability margin — the Fisher-style audit run before
    * trusting the labels for classifier training or hard-negative
    * mining: every vector's cosine to its OWN label centroid vs its best
    * WRONG-label centroid, rolled up per label as the mean margin (1e-6
    * ticks, floor(Σmargin/n) over already-floored per-vector values —
    * pure integer once quantized) and the count of vectors sitting
    * closer to another label's centroid (the confusable mass label_noise
    * then itemizes vector-by-vector). A label with near-zero mean margin
    * and high confusable count is either mislabeled wholesale or
    * genuinely entangled — both change the curation plan.
    *
    * Scale shape: label centroids are a #labels-row broadcast (rebuilt
    * with the lloydStep posexplode→mean→collect pattern, map-side
    * combined); the margin scan is one broadcast pass over the vectors
    * with a #labels-wide local max — no shuffle of the vector side; the
    * rollup is #labels rows. */
  def embedLabelMargin(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val cents = v
      .select(col("label").as("clabel"), posexplode(col("qv")).as(Seq("pos", "q")))
      .groupBy("clabel", "pos")
      .agg(count(lit(1)).as("n"), sum("q").as("sum_q"))
      .withColumn("cq", floor(col("sum_q").cast("double") / col("n")).cast("long"))
      .groupBy("clabel")
      .agg(array_sort(collect_list(struct(col("pos"), col("cq")))).as("pc"))
      .select(col("clabel"), transform(col("pc"), x => x("cq")).as("cv"))
      .withColumn("cn2", dot(col("cv"), col("cv")))
      .where(col("cn2") > 0)
    // bounded-cross: broadcast per-label centroids, <= |labels| rows
    val scored = v.crossJoin(broadcast(cents))
      .withColumn("cos_e6", cosE6(cosine(dot(col("qv"), col("cv")), col("n2"), col("cn2"))))
    val perVec = scored.groupBy("vec_id", "label")
      .agg(max(when(col("label") === col("clabel"), col("cos_e6"))).as("own_e6"),
        max(when(col("label") =!= col("clabel"), col("cos_e6"))).as("other_e6"))
      .where(col("own_e6").isNotNull && col("other_e6").isNotNull)
      .withColumn("margin_e6", col("own_e6") - col("other_e6"))
    // floor over ONE double division (not integer div: Spark `div`
    // truncates toward zero while DuckDB `//` floors, and margins go
    // negative — floor() agrees on both engines for either sign)
    perVec.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        expr("CAST(floor(CAST(sum(margin_e6) AS DOUBLE) / count(1)) AS BIGINT)")
          .as("mean_margin_e6"),
        sum(when(col("margin_e6") < 0, 1L).otherwise(0L)).as("n_confusable"))
      .orderBy("label")
  }

  def embedLabelMarginSql: String =
    s"""WITH $QvecsCte,
       |lmv AS (SELECT vec_id, label, qv, $N2Sql AS n2 FROM qvecs WHERE $N2Sql > 0),
       |lmu AS (
       |  SELECT label AS clabel, d.pos, count(*) AS n, sum(qv[d.pos]) AS sum_q
       |  FROM lmv CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS pos) d
       |  GROUP BY label, d.pos),
       |lmc0 AS (
       |  SELECT clabel,
       |         array_agg(CAST(floor(CAST(sum_q AS DOUBLE) / n) AS BIGINT) ORDER BY pos) AS cv
       |  FROM lmu GROUP BY clabel),
       |lmc AS (
       |  SELECT clabel, cv,
       |         list_reduce(list_transform(cv, x -> x * x), (x, y) -> x + y) AS cn2
       |  FROM lmc0
       |  WHERE list_reduce(list_transform(cv, x -> x * x), (x, y) -> x + y) > 0),
       |lms AS (
       |  SELECT v.vec_id, v.label, c.clabel,
       |         CAST(floor(
       |           CAST(list_reduce(list_transform(range(1, ${Dim + 1}), i -> v.qv[i] * c.cv[i]), (x, y) -> x + y) AS DOUBLE)
       |             / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE)))
       |           * 1000000.0) AS BIGINT) AS cos_e6
       |  FROM lmv v CROSS JOIN lmc c),
       |lmp0 AS (
       |  SELECT vec_id, label,
       |         max(CASE WHEN label = clabel THEN cos_e6 END) AS own_e6,
       |         max(CASE WHEN label <> clabel THEN cos_e6 END) AS other_e6
       |  FROM lms GROUP BY vec_id, label),
       |lmp AS (
       |  SELECT vec_id, label, own_e6 - other_e6 AS margin_e6 FROM lmp0
       |  WHERE own_e6 IS NOT NULL AND other_e6 IS NOT NULL)
       |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       |       CAST(floor(CAST(sum(margin_e6) AS DOUBLE) / count(*)) AS BIGINT)
       |         AS mean_margin_e6,
       |       CAST(sum(CASE WHEN margin_e6 < 0 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_confusable
       |FROM lmp GROUP BY label ORDER BY label""".stripMargin

  // ---- ann_nprobe_sweep: recall-vs-routing tuning curve --------------------

  /** Recall@k as a function of nprobe (1..NProbeSweepMax) against the
    * shared brute-force cosine truth — the tuning curve behind the IVF
    * routing knob, the ANN analogue of dedup_threshold_sweep: a
    * deployment reads where the curve plateaus before paying more
    * probed cells per query. Reuses the memoized assignment frame for
    * every sweep point (the per-point delta is WHICH ranked cells count
    * as probes, not new scans), scores candidates with the family's one
    * cosine definition, and reports per (nprobe, query) hits so query-
    * level routing misses stay visible next to the mean.
    *
    * Scale shape: per sweep point the scan touches only the probed
    * cells' members (the annIvf shape); the truth side is the bounded
    * brute-force query scan every recall cert already shares; output is
    * NProbeSweepMax × queries rows. */
  val NProbeSweepMax = 4

  def annNprobeSweep(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val assign = cellAssignments(spark, dir)
    val cells = assign.where(col("rnk") === 1)
      .select(col("avid").as("cid"), col("seed_id").as("cell"))
      .join(v, col("cid") === col("vec_id"))
      .select(col("cid"), col("cell"), col("qv").as("cv"), col("n2").as("cn2"))
    val q = v.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qvid"), col("qv").as("qqv"), col("n2").as("qn2"))
    val truth = scoredNeighbors(spark, dir, TopK)
      .select(col("qid").as("tqid"), col("vec_id").as("tcid"))
    // One candidate pass for every sweep point (round 17): a base vector
    // belongs to exactly ONE cell, so a (qid, cid) candidate is produced
    // by exactly one probe — the one whose cell holds cid — and the
    // np-point shortlist is just "candidates whose probe rank ≤ np".
    // The former per-np loop re-ran the probes→query→cells join chain,
    // the scoring, and the truth join once per sweep point (4× the
    // joins for identical candidate work); now the chain runs once at
    // rnk ≤ NProbeSweepMax carrying the probe rank, each candidate
    // explodes to the sweep points it participates in (prnk..MAX), and
    // ONE (nprobe, qid) window + truth join + aggregate serves the whole
    // curve. Per-point shortlists, ranks, and counts are unchanged.
    val perNpAll = {
      val probes = assign.where(col("avid") < NumQueries &&
          col("rnk") <= NProbeSweepMax)
        .select(col("avid").as("qid"), col("seed_id").as("pcell"),
          col("rnk").cast("long").as("prnk"))
      probes.join(q, col("qid") === col("qvid"))
        .join(cells, col("pcell") === col("cell") && col("cid") =!= col("qid"))
        .withColumn("cos", cosine(dot(col("qqv"), col("cv")), col("qn2"), col("cn2")))
        .select(col("qid"), col("cid"), col("cos"),
          explode(sequence(col("prnk"), lit(NProbeSweepMax.toLong))).as("nprobe"))
        .withColumn("rrnk", row_number().over(
          Window.partitionBy("nprobe", "qid").orderBy(col("cos").desc, col("cid"))))
        .where(col("rrnk") <= TopK)
        .join(truth, col("qid") === col("tqid") && col("cid") === col("tcid"))
        .groupBy("nprobe", "qid").agg(count(lit(1)).as("n_hits"))
    }
    // Left-join from the full probes × queries domain: a (nprobe, qid)
    // point whose shortlist hits NOTHING in the truth set must appear as
    // an explicit n_hits = 0 row — dropping it would leave silent gaps
    // in the tuning curve exactly where routing fails hardest (the
    // output contract is NProbeSweepMax × queries rows, always).
    val domain = (1 to NProbeSweepMax).map { np =>
      q.select(col("qvid").as("qid")).withColumn("nprobe", lit(np.toLong))
    }.reduce(_.unionByName(_))
    domain.join(perNpAll, Seq("nprobe", "qid"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("recall_e4", expr(s"(10000 * n_hits) div $TopK"))
      .select("nprobe", "qid", "n_hits", "recall_e4")
      .orderBy("nprobe", "qid")
  }

  def annNprobeSweepSql: String = {
    val points = (1 to NProbeSweepMax).map { np =>
      s"""swp$np AS (
         |  SELECT p.qid, c.cid,
         |         row_number() OVER (PARTITION BY p.qid ORDER BY
         |           CAST(list_reduce(list_transform(range(1, ${Dim + 1}), i -> q.qv[i] * c.cv[i]), (x, y) -> x + y) AS DOUBLE)
         |             / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC,
         |           c.cid) AS rrnk
         |  FROM (SELECT avid AS qid, seed_id AS pcell FROM assign
         |        WHERE avid < $NumQueries AND rnk <= $np) p
         |  JOIN vecs q ON p.qid = q.vec_id
         |  JOIN cells c ON p.pcell = c.cell AND c.cid <> p.qid),
         |swh$np AS (
         |  SELECT $np AS nprobe, s.qid, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM swp$np s JOIN struth t ON s.qid = t.qid AND s.cid = t.cid
         |  WHERE s.rrnk <= $TopK
         |  GROUP BY s.qid)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to NProbeSweepMax).map(np => s"SELECT * FROM swh$np")
      .mkString("\n  UNION ALL ")
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |$BruteScoredCte,
       |struth AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rnk
       |    FROM bscored) r WHERE rnk <= $TopK),
       |$points,
       |swall AS (
       |  $unions),
       |sdom AS (
       |  SELECT CAST(np AS BIGINT) AS nprobe, v.vec_id AS qid
       |  FROM (SELECT unnest(range(1, ${NProbeSweepMax + 1})) AS np) n
       |  CROSS JOIN (SELECT vec_id FROM vecs WHERE vec_id < $NumQueries) v)
       |SELECT d.nprobe, d.qid,
       |       COALESCE(w.n_hits, 0) AS n_hits,
       |       (10000 * COALESCE(w.n_hits, 0)) // $TopK AS recall_e4
       |FROM sdom d LEFT JOIN swall w ON d.nprobe = w.nprobe AND d.qid = w.qid
       |ORDER BY d.nprobe, d.qid""".stripMargin
  }

  // ---- embed_covariance: exact dimension covariance audit ------------------

  /** Upper-triangle covariance matrix of the quantized embedding
    * dimensions — the anisotropy/collinearity audit read before any
    * whitening, PCA, or dimension-drop decision (a near-rank-deficient
    * embedding space silently degrades every cosine in the family). Per
    * (i ≤ j): exact int64 sums Σxᵢ, Σxⱼ, Σxᵢxⱼ (order-independent,
    * long-safe to ~1e9 vectors at 1e4-tick components), then the
    * population covariance in 1e-4 tick² units through ONE shared
    * double chain (the source_lang_gini convention: floor(1e4·(n·Σxy −
    * Σx·Σy)/n²) with textually identical casts on both engines).
    *
    * Scale shape: the classic distributed Xᵀ X accumulation, done as ONE
    * imperative aggregate (graft.functions.GramSumsAgg): each partition
    * folds its rows into a single `[n, Σxᵢ, Σxᵢxⱼ]` long buffer, the
    * shuffle carries one ~17 KB array per partition regardless of N, and
    * the 2080 output rows are unpacked from the single aggregated buffer
    * by index arithmetic. The earlier declarative form (explode into
    * dim·(dim+1)/2 structs per row, then hash-aggregate) paid 2080 row
    * objects per vector and measured 65 s at the 100× point for ~4e8
    * multiply-adds of actual work; the buffer form is the flop cost
    * itself. Exact int64 either way — identical output. */
  def embedCovariance(spark: SparkSession, dir: String): DataFrame =
    vectors(spark, dir)
      .agg(graft.functions.GramAgg.gramSums(col("qv"), Dim).as("g"))
      .select(explode(expr(
        s"""flatten(transform(sequence(0, ${Dim - 1}), i ->
           |  transform(sequence(i, ${Dim - 1}), j ->
           |    named_struct('i', i, 'j', j))))""".stripMargin)).as("p"), col("g"))
      // buffer layout [n, Σx(dim), Σxy(upper triangle row-major)]:
      // tri(i, j) = i·Dim − i·(i−1)/2 + (j − i); element_at is 1-based
      .select(col("p.i").cast("long").as("dim_i"), col("p.j").cast("long").as("dim_j"),
        element_at(col("g"), lit(1)).as("n"),
        element_at(col("g"), col("p.i") + 2).as("sum_x"),
        element_at(col("g"), col("p.j") + 2).as("sum_y"),
        element_at(col("g"),
          expr(s"CAST(2 + $Dim + p.i * $Dim - (p.i * (p.i - 1)) div 2 + (p.j - p.i) AS INT)"))
          .as("sum_xy"))
      .withColumn("cov_e4", expr(
        """CAST(floor(1.0e4 * (CAST(n AS DOUBLE) * sum_xy - CAST(sum_x AS DOUBLE) * sum_y)
          | / (CAST(n AS DOUBLE) * n)) AS BIGINT)""".stripMargin))
      .orderBy("dim_i", "dim_j")

  /** Shared oracle CTE chain `qvecs → cvv → cvp → cvg` producing the
    * exact int64 Gram sums per (dim_i ≤ dim_j) — the oracle twin of one
    * GramSumsAgg buffer, shared by embed_covariance, embed_whiten_audit
    * and embed_pca_power so the three read BY CONSTRUCTION from the same
    * sums. */
  private def CovCtes: String =
    s"""$QvecsCte,
       |cvv AS (SELECT vec_id, qv FROM qvecs WHERE $N2Sql > 0),
       |cvp AS (
       |  SELECT d.i, d2.j, v.qv[d.i + 1] AS x, v.qv[d2.j + 1] AS y
       |  FROM cvv v
       |  CROSS JOIN (SELECT unnest(range(0, $Dim)) AS i) d
       |  CROSS JOIN (SELECT unnest(range(0, $Dim)) AS j) d2
       |  WHERE d2.j >= d.i),
       |cvg AS (
       |  SELECT CAST(i AS BIGINT) AS dim_i, CAST(j AS BIGINT) AS dim_j,
       |         CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
       |         CAST(sum(x * y) AS BIGINT) AS sum_xy
       |  FROM cvp GROUP BY i, j)""".stripMargin

  def embedCovarianceSql: String =
    s"""WITH $CovCtes
       |SELECT dim_i, dim_j, n, sum_x, sum_y, sum_xy,
       |  CAST(floor(1.0e4 * (CAST(n AS DOUBLE) * sum_xy - CAST(sum_x AS DOUBLE) * sum_y)
       |   / (CAST(n AS DOUBLE) * n)) AS BIGINT) AS cov_e4
       |FROM cvg ORDER BY dim_i, dim_j""".stripMargin

  // ---- embed_trunc_audit: Matryoshka truncation-fidelity audit -------------

  /** Prefix-truncation depths audited: how much of each vector's energy
    * and pairwise-cosine structure survives keeping only the first d of
    * the 64 components (the Matryoshka-representation question a
    * pipeline answers BEFORE committing a truncated index that is
    * 64/d× smaller). */
  val TruncDims: Seq[Int] = Seq(8, 16, 32, 64)

  /** Per truncation depth d: the captured-energy ratio (per-vector
    * integer floor of 1e6·‖v[1..d]‖²/‖v‖², then the floored mean) and
    * the cosine-fidelity envelope over the consecutive-id pair chain
    * (|cos_d − cos_full| in 1e-6 ticks, mean + max). The chain is the
    * bounded deterministic pair sample: N−1 pairs, never quadratic, and
    * id-adjacency is corpus-order-stable so the audit is reproducible
    * across runs and engines. Zero-norm vectors are excluded up front
    * (the similarity-family contract) and pairs whose TRUNCATED norm
    * vanishes are excluded per depth — cos_d would be 0/0.
    *
    * Scale shape: one explode(4)×scan for the energy term (map-side
    * combine onto 4 keys), one co-partitioned self-join on vec_id±1 for
    * the chain (linear, key cardinality = N), then the same 4-key
    * reduction — nothing wider than the input crosses a shuffle, and
    * the output is 4 rows regardless of N. All arithmetic is the
    * portable int64 + correctly-rounded-double chain the rest of the
    * family hash-matches DuckDB with. */
  def embedTruncAudit(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir).where(col("n2") > 0)
      .select(col("vec_id"), col("qv"), col("n2"))
    val dimsCol = explode(array(TruncDims.map(d => lit(d)): _*)).as("trunc_dim")
    val en = v.select(col("qv"), col("n2"), dimsCol)
      .withColumn("qd", slice(col("qv"), lit(1), col("trunc_dim")))
      .withColumn("n2d", dot(col("qd"), col("qd")))
      .groupBy("trunc_dim")
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("(1000000 * n2d) div n2")).as("sum_e"))
      .select(col("trunc_dim").cast("long").as("trunc_dim"), col("n_vecs"),
        expr("sum_e div n_vecs").as("mean_energy_e6"))
    val chain = v.as("a").join(v.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.qv").as("qa"), col("a.n2").as("na2"),
        col("b.qv").as("qb"), col("b.n2").as("nb2"))
      .withColumn("cos_full_e6", cosE6(cosine(dot(col("qa"), col("qb")), col("na2"), col("nb2"))))
    val pr = chain.select(col("qa"), col("qb"), col("cos_full_e6"), dimsCol)
      .withColumn("da", slice(col("qa"), lit(1), col("trunc_dim")))
      .withColumn("db", slice(col("qb"), lit(1), col("trunc_dim")))
      .withColumn("na2d", dot(col("da"), col("da")))
      .withColumn("nb2d", dot(col("db"), col("db")))
      .where(col("na2d") > 0 && col("nb2d") > 0)
      .withColumn("cos_d_e6", cosE6(cosine(dot(col("da"), col("db")), col("na2d"), col("nb2d"))))
      .withColumn("delta", abs(col("cos_d_e6") - col("cos_full_e6")))
      .groupBy("trunc_dim")
      .agg(count(lit(1)).as("n_pairs"), sum("delta").as("sum_d"),
        max("delta").as("max_abs_delta_e6"))
      .select(col("trunc_dim").cast("long").as("trunc_dim"), col("n_pairs"),
        expr("sum_d div n_pairs").as("mean_abs_delta_e6"), col("max_abs_delta_e6"))
    en.join(pr, "trunc_dim").orderBy("trunc_dim")
  }

  private val TruncDotSql =
    "list_reduce(list_transform(range(1, len(%s) + 1), i -> %s[i] * %s[i]), (x, y) -> x + y)"

  val embedTruncAuditSql: String = {
    def dotS(a: String, b: String) = TruncDotSql.format(a, a, b)
    s"""WITH $QvecsCte,
       |v0 AS (SELECT vec_id, qv, $N2Sql AS n2 FROM qvecs),
       |v AS (SELECT vec_id, qv, n2 FROM v0 WHERE n2 > 0),
       |dims AS (SELECT unnest([${TruncDims.mkString(", ")}]) AS trunc_dim),
       |en0 AS (
       |  SELECT d.trunc_dim, e.n2,
       |         list_reduce(list_transform(list_slice(e.qv, 1, d.trunc_dim),
       |           x -> x * x), (x, y) -> x + y) AS n2d
       |  FROM v e, dims d),
       |en AS (
       |  SELECT CAST(trunc_dim AS BIGINT) AS trunc_dim,
       |         CAST(count(*) AS BIGINT) AS n_vecs,
       |         CAST(sum((1000000 * n2d) // n2) // count(*) AS BIGINT)
       |           AS mean_energy_e6
       |  FROM en0 GROUP BY trunc_dim),
       |ch AS (
       |  SELECT a.qv AS qa, a.n2 AS na2, b.qv AS qb, b.n2 AS nb2
       |  FROM v a JOIN v b ON a.vec_id + 1 = b.vec_id),
       |pr0 AS (
       |  SELECT d.trunc_dim,
       |         CAST(floor(1000000.0 * CAST(${dotS("qa", "qb")} AS DOUBLE)
       |           / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)))) AS BIGINT)
       |           AS cos_full_e6,
       |         list_slice(qa, 1, d.trunc_dim) AS da,
       |         list_slice(qb, 1, d.trunc_dim) AS db
       |  FROM ch, dims d),
       |pr1 AS (
       |  SELECT trunc_dim, cos_full_e6,
       |         ${dotS("da", "db")} AS dd,
       |         ${dotS("da", "da")} AS na2d,
       |         ${dotS("db", "db")} AS nb2d
       |  FROM pr0),
       |pr2 AS (
       |  SELECT trunc_dim,
       |         abs(CAST(floor(1000000.0 * CAST(dd AS DOUBLE)
       |           / (sqrt(CAST(na2d AS DOUBLE)) * sqrt(CAST(nb2d AS DOUBLE)))) AS BIGINT)
       |           - cos_full_e6) AS delta
       |  FROM pr1 WHERE na2d > 0 AND nb2d > 0),
       |pr AS (
       |  SELECT CAST(trunc_dim AS BIGINT) AS trunc_dim,
       |         CAST(count(*) AS BIGINT) AS n_pairs,
       |         CAST(sum(delta) // count(*) AS BIGINT) AS mean_abs_delta_e6,
       |         max(delta) AS max_abs_delta_e6
       |  FROM pr2 GROUP BY trunc_dim)
       |SELECT en.trunc_dim, en.n_vecs, en.mean_energy_e6,
       |       pr.n_pairs, pr.mean_abs_delta_e6, pr.max_abs_delta_e6
       |FROM en JOIN pr ON en.trunc_dim = pr.trunc_dim
       |ORDER BY en.trunc_dim""".stripMargin
  }

  // ---- embed_whiten_audit: per-dim standardization parameters --------------

  /** Whitening/standardization parameter table — per dimension: exact
    * n/Σx/Σx², the 1e-4-tick mean and population variance, and the
    * inverse standard deviation in 1e-6 ticks (NULL for a zero-variance
    * dimension, which a whitening step must drop rather than divide by).
    * This is the table a `(x - mean) * inv_std` normalization pass and
    * the PCA audit below both consume; a near-zero inv_std row is the
    * collapsed-dimension signal that silently degrades every cosine.
    *
    * Scale shape: the diagonal unpacked from the SAME one-buffer
    * GramSumsAgg pass as embed_covariance — one ~17 KB partial per
    * partition, N-independent shuffle, 64 output rows. Double math is
    * the shared floor(1e4·…) chain (IEEE *, /, sqrt, floor are
    * correctly rounded, so Spark and DuckDB agree bit-for-bit). */
  def embedWhitenAudit(spark: SparkSession, dir: String): DataFrame = {
    // variance in tick² through ONE textually shared double chain
    val varD = "(CAST(n AS DOUBLE) * sum_xx - CAST(sum_x AS DOUBLE) * sum_x)" +
      " / (CAST(n AS DOUBLE) * n)"
    vectors(spark, dir)
      .agg(graft.functions.GramAgg.gramSums(col("qv"), Dim).as("g"))
      .select(explode(expr(s"sequence(0, ${Dim - 1})")).as("i"), col("g"))
      .select(col("i").cast("long").as("dim_i"),
        element_at(col("g"), lit(1)).as("n"),
        element_at(col("g"), col("i") + 2).as("sum_x"),
        // diagonal entry of the triangle: tri(i, i) = i·Dim − i·(i−1)/2
        element_at(col("g"),
          expr(s"CAST(2 + $Dim + i * $Dim - (i * (i - 1)) div 2 AS INT)")).as("sum_xx"))
      .withColumn("mean_e4",
        expr("CAST(floor(1.0e4 * CAST(sum_x AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)"))
      .withColumn("var_e4", expr(s"CAST(floor(1.0e4 * $varD) AS BIGINT)"))
      .withColumn("inv_std_e6", expr(
        s"CASE WHEN $varD > 0 THEN CAST(floor(1.0e6 / sqrt($varD)) AS BIGINT) ELSE NULL END"))
      .orderBy("dim_i")
  }

  def embedWhitenAuditSql: String = {
    val varD = "(CAST(n AS DOUBLE) * sum_xx - CAST(sum_x AS DOUBLE) * sum_x)" +
      " / (CAST(n AS DOUBLE) * n)"
    s"""WITH $CovCtes,
       |whd AS (SELECT dim_i, n, sum_x, sum_xy AS sum_xx FROM cvg WHERE dim_i = dim_j)
       |SELECT dim_i, n, sum_x, sum_xx,
       |  CAST(floor(1.0e4 * CAST(sum_x AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS mean_e4,
       |  CAST(floor(1.0e4 * $varD) AS BIGINT) AS var_e4,
       |  CASE WHEN $varD > 0 THEN CAST(floor(1.0e6 / sqrt($varD)) AS BIGINT) ELSE NULL END AS inv_std_e6
       |FROM whd ORDER BY dim_i""".stripMargin
  }

  // ---- embed_pca_power: top principal component by power iteration ---------

  /** Top principal component of the embedding space by PcaIters rounds of
    * power iteration on the covariance matrix — the anisotropy direction
    * the covariance audit (row above) only hints at. The dominant
    * direction is what an ABTT-style "remove the top component(s)" postfix
    * (Mu & Viswanath, ICLR'18 — public) subtracts to de-bias anisotropic
    * embeddings, and its Rayleigh quotient is the variance it explains.
    *
    * Determinism without floating point: the iteration runs on the
    * `cov_e4` INTEGER matrix both engines already agree on bit-for-bit
    * (it is embed_covariance's triple-green output), with truncating
    * integer division — `Long./`, Spark `div` and DuckDB `//` all
    * truncate toward zero, so every intermediate is identical. Rescaling
    * divides by `maxAbs div 1e4 + 1` (division only — a multiply-first
    * form would overflow int64 at |cov_e4| ≈ 4e12), keeping components
    * in ±1e4; matvec magnitude ≤ 64 · 4e12 · 1e4 ≈ 2.6e18 < 2^63.
    * Start vector = all-ones (1e4): deterministic, and non-orthogonal to
    * the top component for any realistic covariance.
    *
    * Scale shape: ONE distributed pass (the shared GramSumsAgg buffer)
    * then O(Dim²) driver arithmetic on the N-INDEPENDENT 2080-value
    * aggregate — the same rule that lets Lloyd training pull k×Dim
    * centroid sums. Output is Dim rows; nothing else leaves the
    * executors. Cov magnitude does not grow with N (it is a population
    * covariance), so the int64 headroom holds at any corpus size. */
  val PcaIters = 3

  def embedPcaPower(spark: SparkSession, dir: String): DataFrame = {
    val m = Array.ofDim[Long](Dim, Dim)
    // bounded-collect: the 2080-value upper-triangle Gram aggregate —
    // N-independent by construction. CollectGateSpec-audited.
    embedCovariance(spark, dir).select("dim_i", "dim_j", "cov_e4").collect()
      .foreach { r =>
        val i = r.getLong(0).toInt
        val j = r.getLong(1).toInt
        m(i)(j) = r.getLong(2)
        m(j)(i) = r.getLong(2)
      }
    def matvec(v: Array[Long]): Array[Long] = Array.tabulate(Dim) { i =>
      var s = 0L
      var j = 0
      while (j < Dim) { s += m(i)(j) * v(j); j += 1 }
      s
    }
    var v = Array.fill(Dim)(10000L)
    for (_ <- 1 to PcaIters) {
      val w = matvec(v)
      val s = w.map(math.abs).max / 10000L + 1L
      v = w.map(_ / s)
    }
    val w4 = matvec(v)
    val num = (0 until Dim).map(i => v(i) * (w4(i) / 1000000L)).sum
    val den = v.map(x => x * x).sum / 1000000L
    val ray = if (den == 0L) 0L else num / den
    import spark.implicits._
    (0 until Dim).map(i => (i.toLong, v(i), ray))
      .toDF("dim_i", "pc1_e4", "rayleigh_cov_e4")
  }

  def embedPcaPowerSql: String = {
    val matvec = (vk: String, wk: String) =>
      s"""$wk AS (
         |  SELECT mf.i AS i, CAST(SUM(mf.m * v.val) AS BIGINT) AS w
         |  FROM mfull mf JOIN $vk v ON mf.j = v.j GROUP BY mf.i)""".stripMargin
    val step = (k: Int) =>
      s"""${matvec(s"v${k - 1}", s"w$k")},
         |s$k AS (SELECT MAX(ABS(w)) // 10000 + 1 AS s FROM w$k),
         |v$k AS (SELECT w$k.i AS j, w$k.w // s$k.s AS val FROM w$k, s$k)""".stripMargin
    val steps = (1 to PcaIters).map(step).mkString(",\n")
    s"""WITH $CovCtes,
       |covm AS (
       |  SELECT dim_i, dim_j,
       |    CAST(floor(1.0e4 * (CAST(n AS DOUBLE) * sum_xy - CAST(sum_x AS DOUBLE) * sum_y)
       |     / (CAST(n AS DOUBLE) * n)) AS BIGINT) AS m
       |  FROM cvg),
       |mfull AS (
       |  SELECT dim_i AS i, dim_j AS j, m FROM covm
       |  UNION ALL
       |  SELECT dim_j AS i, dim_i AS j, m FROM covm WHERE dim_i <> dim_j),
       |v0 AS (SELECT CAST(unnest(range(0, $Dim)) AS BIGINT) AS j,
       |              CAST(10000 AS BIGINT) AS val),
       |$steps,
       |${matvec(s"v$PcaIters", "wf")},
       |rayn AS (SELECT CAST(SUM(v.val * (w.w // 1000000)) AS BIGINT) AS num
       |         FROM v$PcaIters v JOIN wf w ON v.j = w.i),
       |rayd AS (SELECT CAST(SUM(val * val) AS BIGINT) // 1000000 AS den FROM v$PcaIters)
       |SELECT v.j AS dim_i, v.val AS pc1_e4,
       |       CASE WHEN rayd.den = 0 THEN 0 ELSE rayn.num // rayd.den END AS rayleigh_cov_e4
       |FROM v$PcaIters v, rayn, rayd
       |ORDER BY dim_i""".stripMargin
  }

  // ---- label_noise: cell-scoped kNN label audit ----------------------------

  /** Label-noise audit by neighborhood vote (the confident-learning
    * signal, computed geometrically): every vector takes the majority
    * label of its LnK nearest CELL-MATES by cosine (vote ties to the
    * smaller label, neighbor ties to the smaller vec_id), and the output
    * is the full (true_label, voted_label) confusion matrix — off-diagonal
    * mass is the mislabel suspect pool a curation run re-annotates first.
    * Restricting neighbors to the vector's own trained IVF cell is the
    * SemDeDup trade again: exhaustive-within-cell, blind-across-cell,
    * which is exactly the regime where a wrong label is detectable (a
    * mislabeled vector sits among near-identical neighbors of the true
    * class).
    *
    * Scale shape: identical to dedup_semantic — one cell-routed shuffle,
    * within-cell pairs bounded by cell population (NumCells ∝ N/k at
    * scale), per-vector top-LnK and the vote as windows over co-located
    * rows; output is ≤ labels² confusion rows. */
  val LnK = 5

  def labelNoise(spark: SparkSession, dir: String): DataFrame = {
    // Collapsed cell-scoped kNN (round 11, the annLsh prefix argument):
    // cos is a function of the (group, group) pair and ties rank by
    // neighbor id, so every member of a group shares one ranked
    // neighbor list except for the exclusion of itself. Build per
    // group the top-(LnK+1) entry prefix over its cell's groups (self
    // included at the self-cosine), each contributing its LnK+1
    // smallest member ids WITH their labels; per member drop itself,
    // cut at LnK, and vote. The cell join is flat in multiplicity;
    // the expansion is members × (LnK+1) rows.
    val kp = LnK + 1
    val v = vectors(spark, dir)
    val m = vecMembers(spark, dir)
    val cellOf = cellAssignments(spark, dir).where(col("rnk") === 1)
      .select(col("avid").as("gid"), col("seed_id").as("cell"))
    val cg = vecGroups(spark, dir).join(cellOf, "gid")
      .select(col("cell"), col("gid"), col("qv"), col("n2"))
    val directed = cellPairCos(spark, dir)
      .select(col("src"), col("dst"), col("cos"))
      .unionByName(cg.select(col("gid").as("src"), col("gid").as("dst"),
        selfCos(col("n2")).as("cos")))
    val prefix = m
      .join(v.select(col("vec_id"), col("label")), "vec_id")
      .withColumn("pos", row_number().over(
        Window.partitionBy("gid").orderBy("vec_id")))
      .where(col("pos") <= kp)
      .select(col("gid").as("dst"), col("vec_id").as("bid"), col("label").as("blabel"))
    val groupPrefix = directed.join(prefix, "dst")
      .withColumn("gr", row_number().over(
        Window.partitionBy("src").orderBy(col("cos").desc, col("bid"))))
      .where(col("gr") <= kp)
      .select(col("src").as("gid"), col("bid"), col("blabel"), col("cos"))
    val voted = m
      .join(v.select(col("vec_id"), col("label")), "vec_id")
      .join(groupPrefix, "gid")
      .where(col("bid") =!= col("vec_id"))
      .withColumn("nrnk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos").desc, col("bid"))))
      .where(col("nrnk") <= LnK)
      .groupBy("vec_id", "label", "blabel")
      .agg(count(lit(1)).as("votes"))
      .withColumn("vrnk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("votes").desc, col("blabel"))))
      .where(col("vrnk") === 1)
    voted.groupBy(col("label").as("true_label"), col("blabel").as("voted_label"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("true_label", "voted_label")
  }

  /** The pre-collapse member-level kNN vote, kept as the equivalence
    * reference for DupCollapseSpec — NEVER registered as a query. */
  private[graft] def labelNoiseNaiveProbe(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val members = cellAssignments(spark, dir).where(col("rnk") === 1)
      .select(col("avid"), col("seed_id").as("cell"))
      .join(v, col("avid") === col("vec_id"))
      .select(col("cell"), col("vec_id"), col("label"), col("qv"), col("n2"))
    val a = members.select(col("cell"), col("vec_id"), col("label"),
      col("qv").as("qa"), col("n2").as("na2"))
    val b = members.select(col("cell").as("cell_b"), col("vec_id").as("bid"),
      col("label").as("blabel"), col("qv").as("qb"), col("n2").as("nb2"))
    val voted = a.join(b, col("cell") === col("cell_b") && col("vec_id") =!= col("bid"))
      .withColumn("cos", cosine(dot(col("qa"), col("qb")), col("na2"), col("nb2")))
      .withColumn("nrnk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos").desc, col("bid"))))
      .where(col("nrnk") <= LnK)
      .groupBy("vec_id", "label", "blabel")
      .agg(count(lit(1)).as("votes"))
      .withColumn("vrnk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("votes").desc, col("blabel"))))
      .where(col("vrnk") === 1)
    voted.groupBy(col("label").as("true_label"), col("blabel").as("voted_label"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("true_label", "voted_label")
  }

  def labelNoiseSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |lnm AS (
       |  SELECT c.cell, c.cid AS vec_id, v.label, c.cv, c.cn2
       |  FROM cells c JOIN vecs v ON c.cid = v.vec_id),
       |lnp AS (
       |  SELECT a.vec_id, a.label, b.label AS blabel, b.vec_id AS bid,
       |         CAST(list_reduce(list_transform(range(1, ${Dim + 1}), i -> a.cv[i] * b.cv[i]), (x, y) -> x + y) AS DOUBLE)
       |           / (sqrt(CAST(a.cn2 AS DOUBLE)) * sqrt(CAST(b.cn2 AS DOUBLE))) AS cos
       |  FROM lnm a JOIN lnm b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
       |lnn AS (
       |  SELECT vec_id, label, blabel,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, bid) AS nrnk
       |  FROM lnp),
       |lnv AS (
       |  SELECT vec_id, label, blabel, count(*) AS votes
       |  FROM lnn WHERE nrnk <= $LnK GROUP BY vec_id, label, blabel),
       |lnw AS (
       |  SELECT vec_id, label, blabel,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY votes DESC, blabel) AS vrnk
       |  FROM lnv)
       |SELECT label AS true_label, blabel AS voted_label,
       |       CAST(count(*) AS BIGINT) AS n_vecs
       |FROM lnw WHERE vrnk = 1
       |GROUP BY label, blabel
       |ORDER BY true_label, voted_label""".stripMargin

  // ---- ann_hard_neg_shortlist: shortlist-mined hard negatives --------------

  /** The production variant ann_hard_negatives' doc promises: hard
    * negatives mined from the IVFADC retrieval shortlist instead of the
    * exhaustive scan, certified row-by-row against the exact pass. Per
    * query: the highest-exact-cosine WRONG-label vector among its PqShortR
    * ADC-shortlisted candidates (re-scored with the exact cosine, so ADC
    * quantization error cannot reorder the final pick), beside the exact
    * scan's negative and an agree flag. A query whose shortlist holds no
    * wrong-label candidate keeps NULL mined columns and agree=0 — the miss
    * a deployment widens PqShortR/NProbe against.
    *
    * Scale shape: mining cost drops from queries × N (exact scan) to the
    * IVFADC retrieval the index already serves plus queries × PqShortR
    * exact re-scores on broadcast-fetched payloads; the exact side here is
    * the acceptance baseline, priced only at certification time (same
    * contract as the recall certs). */
  def annHardNegShortlist(spark: SparkSession, dir: String): DataFrame = {
    val v = vectors(spark, dir)
    val q = v.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("qv").as("qa"), col("n2").as("qn2"))
    val mined = ivfPqShortlist(spark, dir)
      .select(col("qid").as("sqid"), col("vec_id"))
      .join(v, "vec_id")
      .join(broadcast(q), col("sqid") === col("qid"))
      .where(col("label") =!= col("qlabel"))
      .withColumn("cos", cosine(dot(col("qa"), col("qv")), col("qn2"), col("n2")))
      .withColumn("mrnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .where(col("mrnk") === 1)
      .select(col("qid"), col("vec_id").as("neg_id"), cosE6(col("cos")).as("neg_cos_e6"))
    // bounded-cross: broadcast query table, <= NumQueries rows
    val exact = v.crossJoin(broadcast(q))
      .where(col("qid") =!= col("vec_id") && col("label") =!= col("qlabel"))
      .withColumn("cos", cosine(dot(col("qa"), col("qv")), col("qn2"), col("n2")))
      .withColumn("ernk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .where(col("ernk") === 1)
      .select(col("qid"), col("qlabel").as("label"),
        col("vec_id").as("exact_neg_id"), cosE6(col("cos")).as("exact_neg_cos_e6"))
    exact.join(mined, Seq("qid"), "left")
      .withColumn("agree",
        when(col("neg_id") === col("exact_neg_id"), 1L).otherwise(0L))
      .select("qid", "label", "neg_id", "neg_cos_e6",
        "exact_neg_id", "exact_neg_cos_e6", "agree")
      .orderBy("qid")
  }

  def annHardNegShortlistSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |$PqCtesBody,
       |$IvfPqRetrievalCtes,
       |hsl AS (SELECT qid, vec_id FROM ivranked WHERE rnk <= $PqShortR),
       |hm0 AS (
       |  SELECT s.qid, b.vec_id AS cid,
       |         $CosSql AS cos
       |  FROM hsl s
       |  JOIN vecs b ON s.vec_id = b.vec_id
       |  JOIN vecs a ON s.qid = a.vec_id
       |  WHERE b.label <> a.label),
       |hmr AS (
       |  SELECT qid, cid, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS mrnk
       |  FROM hm0),
       |hm AS (
       |  SELECT qid, cid AS neg_id,
       |         CAST(floor(cos * 1000000.0) AS BIGINT) AS neg_cos_e6
       |  FROM hmr WHERE mrnk = 1),
       |he0 AS (
       |  SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS cid,
       |         $CosSql AS cos
       |  FROM vecs a JOIN vecs b
       |    ON a.vec_id < $NumQueries AND a.vec_id <> b.vec_id AND b.label <> a.label),
       |her AS (
       |  SELECT qid, qlabel, cid, cos,
       |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS ernk
       |  FROM he0),
       |he AS (
       |  SELECT qid, qlabel, cid AS exact_neg_id,
       |         CAST(floor(cos * 1000000.0) AS BIGINT) AS exact_neg_cos_e6
       |  FROM her WHERE ernk = 1)
       |SELECT e.qid, e.qlabel AS label, m.neg_id, m.neg_cos_e6,
       |       e.exact_neg_id, e.exact_neg_cos_e6,
       |       CASE WHEN m.neg_id = e.exact_neg_id THEN 1 ELSE 0 END AS agree
       |FROM he e LEFT JOIN hm m ON e.qid = m.qid
       |ORDER BY e.qid""".stripMargin

  // ---- ann_nn_graph: NN-Descent bounded-degree kNN graph (graph ANN) ------

  /** Graph degree: out-neighbors kept per distinct vector, both in the
    * seed graph and after refinement. */
  val NndL = 6
  /** Hash-ring partition count for the cross-cell seed diversifier. */
  val NndRingBuckets = 32L

  /** NN-Descent kNN-graph build (Dong, Moses & Li, WWW'11 "Efficient
    * k-nearest neighbor graph construction for generic similarity
    * measures") — the GRAPH-ANN family (the class HNSW serves from) next
    * to the IVF/PQ/LSH stack: seed each DISTINCT vector's neighbor list
    * from its trained IVF cell cohort (top-L by cosine within the cell)
    * PLUS two deterministic hash-ring edges (successors in a
    * hash-ordered ring, windowed within hash buckets so no global
    * sort) — the ring is the paper's random seeding made deterministic,
    * and it is load-bearing: seed edges that never leave a cell compose
    * into 2-hop candidates that never leave a cell either, so a purely
    * cell-seeded round cannot improve anything. Then ONE NN-descent
    * refinement round on the principle "a neighbor of a neighbor is
    * likely a neighbor": candidates are the 2-hop closure of the
    * SYMMETRIZED traversal graph (cell top-L ∪ ring, out-edges plus
    * reverses), re-scored exactly and cut back to top-L per node.
    * Rep-level by the round-11 collapse — identical quantized vectors
    * share one node, so the graph is over distinct content.
    *
    * Scale shape: the seed stage is the cell-bucketed pair search every
    * cell-scoped operator already pays (cohort² at rep level inside each
    * cell); the refinement is LINEAR in nodes with a ≤ (2L)² candidate
    * constant per node — no global structure, no unbounded join. That
    * linearity per round is what lets graph methods build
    * billion-vector indexes; NndSpec pins the structural bounds (degree
    * ≤ L) and the dominance property (the refined list is pointwise ≥
    * the seed list in cosine, because the candidate set contains the
    * seed edges). The memoized graph is nodes × L edges. */
  private def nndGraph(spark: SparkSession, dir: String): DataFrame =
    Tables.memoPersist(spark, s"sim.nndGraph:$NndL:$NumCells:$IvfIters:$dir") {
      val cellOf = cellAssignments(spark, dir).where(col("rnk") === 1)
        .select(col("avid").as("gid"), col("seed_id").as("cell"))
      val cg = vecGroups(spark, dir).join(cellOf, "gid")
        .select(col("cell"), col("gid"), col("qv"), col("n2"))
      val seed = cellPairCos(spark, dir)
        .withColumn("srnk", row_number().over(
          Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))))
        .where(col("srnk") <= NndL)
        .select("src", "dst")
      val ring = nndRing(cg)
      val trav = seed.unionByName(ring).distinct()
      val sym = trav.unionByName(
        trav.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      val cand = sym.as("e1")
        .join(sym.as("e2"),
          col("e1.dst") === col("e2.src") && col("e1.src") =!= col("e2.dst"))
        .select(col("e1.src").as("src"), col("e2.dst").as("dst"))
        .unionByName(trav)
        .distinct()
      val gv = cg.select(col("gid"), col("qv"), col("n2"))
      cand
        .join(gv.select(col("gid").as("src"),
          col("qv").as("qa"), col("n2").as("na2")), Seq("src"))
        .join(gv.select(col("gid").as("dst"),
          col("qv").as("qb"), col("n2").as("nb2")), Seq("dst"))
        .withColumn("cos", cosine(dot(col("qa"), col("qb")), col("na2"), col("nb2")))
        .withColumn("grnk", row_number().over(
          Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))))
        .where(col("grnk") <= NndL)
        .select("src", "dst", "cos")
    }

  /** Two deterministic ring edges per node: successors in the
    * (hash, gid)-ordered ring, windowed within hash buckets — bounded
    * window partitions regardless of node count, cross-cell by
    * construction (the mix is uncorrelated with the quantizer). */
  private def nndRing(cg: DataFrame): DataFrame = {
    val ringW = Window
      .partitionBy(pmod(col("h"), lit(NndRingBuckets)))
      .orderBy("h", "gid")
    val hashed = cg.select(col("gid"))
      .withColumn("h", expr(
        s"gid % ${TextStats.FpMod} * ${graft.functions.HashExprs.Mix1} % ${TextStats.FpMod}"))
      .withColumn("d1", lead("gid", 1).over(ringW))
      .withColumn("d2", lead("gid", 2).over(ringW))
    hashed.where(col("d1").isNotNull)
      .select(col("gid").as("src"), col("d1").as("dst"))
      .unionByName(hashed.where(col("d2").isNotNull)
        .select(col("gid").as("src"), col("d2").as("dst")))
  }

  /** Structural probes for NndSpec: the seed graph (scored) and the
    * refined graph, both rep-level (src, dst, cos). */
  private[graft] def nndSeedProbe(spark: SparkSession, dir: String): DataFrame = {
    val cellOf = cellAssignments(spark, dir).where(col("rnk") === 1)
      .select(col("avid").as("gid"), col("seed_id").as("cell"))
    val cg = vecGroups(spark, dir).join(cellOf, "gid")
      .select(col("cell"), col("gid"), col("qv"), col("n2"))
    val a = cg.select(col("cell"), col("gid").as("src"),
      col("qv").as("qa"), col("n2").as("na2"))
    val b = cg.select(col("cell").as("cell_b"), col("gid").as("dst"),
      col("qv").as("qb"), col("n2").as("nb2"))
    a.join(b, col("cell") === col("cell_b") && col("src") =!= col("dst"))
      .withColumn("cos", cosine(dot(col("qa"), col("qb")), col("na2"), col("nb2")))
      .withColumn("srnk", row_number().over(
        Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))))
      .where(col("srnk") <= NndL)
      .select("src", "dst", "cos")
  }
  private[graft] def nndGraphProbe(spark: SparkSession, dir: String): DataFrame =
    nndGraph(spark, dir)

  /** Per-query readout of the refined graph: the query's group node, its
    * top-TopK refined neighbors by exact cosine. */
  def annNnGraph(spark: SparkSession, dir: String): DataFrame = {
    val qg = vecMembers(spark, dir).where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("gid"))
    qg.join(nndGraph(spark, dir), col("gid") === col("src"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("dst"))))
      .where(col("rnk") <= TopK)
      .select(col("qid"), col("rnk"), col("dst").as("nbr_gid"),
        cosE6(col("cos")).as("cos_e6"))
      .orderBy("qid", "rnk")
  }

  /** Recall@TopK of the refined graph's neighbor lists against the exact
    * rep-level cosine truth for the query set — the certification row
    * that makes the graph build a measured index, not a hopeful one
    * (the ann_recall pattern applied to the graph family). Both sides
    * are group-level: exact truth ranks ALL distinct vectors for each
    * query group (bounded broadcast: ≤ NumQueries rows fan the group
    * frame), retrieval reads the memoized graph. */
  def annNnGraphRecall(spark: SparkSession, dir: String): DataFrame = {
    val qg = vecMembers(spark, dir).where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("gid"))
    val gv = vecGroups(spark, dir).select(col("gid"), col("qv"), col("n2"))
    // bounded non-equi side: ≤ NumQueries query groups broadcast
    val truth = qg
      .join(gv.select(col("gid"), col("qv").as("qqv"), col("n2").as("qn2")), "gid")
      .join(gv.select(col("gid").as("cgid"),
        col("qv").as("cv"), col("n2").as("cn2")), col("cgid") =!= col("gid"))
      .withColumn("cos", cosine(dot(col("qqv"), col("cv")), col("qn2"), col("cn2")))
      .withColumn("ernk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cgid"))))
      .where(col("ernk") <= TopK)
      .select(col("qid"), col("cgid"))
    val got = annNnGraph(spark, dir)
      .select(col("qid").as("g_qid"), col("nbr_gid"))
    truth
      .join(got, col("qid") === col("g_qid") && col("cgid") === col("nbr_gid"),
        "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("nbr_gid").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      .withColumn("recall_e4", expr("(n_hits * 10000) div n_exact"))
      .orderBy("qid")
  }

  // ---- embed_jl_audit: Johnson-Lindenstrauss projection distortion --------

  /** JL target dimensionality and the wVec j-offset that keeps the JL
    * sign planes disjoint from every LSH table's hyperplanes. */
  val JlDim = 16
  val JlPlaneOffset = 640

  /** Johnson–Lindenstrauss random-projection distortion audit: project
    * every distinct vector from Dim=64 to JlDim=16 with a deterministic
    * ±1 sign matrix (the Achlioptas 2003 database-friendly construction;
    * signs from the shared wVec splitmix at a disjoint j-range), then
    * measure, over the LSH candidate pairs the index already scores,
    * how far the 16-dim cosine drifts from the 64-dim cosine — banded by
    * the full-precision cosine decile, with exact integer count /
    * sum-abs-delta / max-abs-delta per band (one readout row per band).
    * This is the measurement a 100 TB deployment needs BEFORE swapping
    * its ANN candidate scoring to a 4× narrower vector: the JL lemma
    * bounds the distortion in expectation, the audit certifies it on
    * the actual corpus (completing the embedding-hygiene series:
    * norm / quantization / truncation / whitening / PCA audits).
    *
    * Everything stays exact-int64 until the two cosine divisions
    * (projections are int dot products; delta is a difference of the
    * SAME floor-e6 quantization both engines apply); the pair set is
    * the memoized rep-level candidate frame — no new pair search. */
  def embedJlAudit(spark: SparkSession, dir: String): DataFrame = {
    val g = vecGroups(spark, dir)
    val projCols = (0 until JlDim).map { p =>
      graft.functions.HashExprs.longDot(col("qv"),
        typedLit(wVec(JlPlaneOffset + p))).as(s"j$p")
    }
    val pj = array((0 until JlDim).map(p => col(s"j$p")): _*)
    val proj = g.select((col("gid") +: projCols): _*)
      .withColumn("pj", pj)
      .withColumn("pn2", graft.functions.HashExprs.longDot(col("pj"), col("pj")))
      .select("gid", "pj", "pn2")
    repScoredPairs(spark, dir)
      .join(proj.select(col("gid").as("ga"),
        col("pj").as("pja"), col("pn2").as("pna")), Seq("ga"))
      .join(proj.select(col("gid").as("gb"),
        col("pj").as("pjb"), col("pn2").as("pnb")), Seq("gb"))
      // a projection collapsed to the zero vector has no direction —
      // same guard as the base quantization (n2 > 0)
      .where(col("pna") > 0 && col("pnb") > 0)
      .withColumn("cos_p",
        cosine(dot(col("pja"), col("pjb")), col("pna"), col("pnb")))
      .withColumn("band", floor(col("cos") * lit(10.0)).cast("long"))
      .withColumn("ad", abs(cosE6(col("cos_p")) - cosE6(col("cos"))))
      .groupBy("band")
      .agg(count(lit(1)).as("n_pairs"),
        sum("ad").as("sum_abs_delta_e6"),
        max("ad").as("max_abs_delta_e6"))
      .withColumn("mean_abs_delta_e6", expr("sum_abs_delta_e6 div n_pairs"))
      .orderBy("band")
  }

  def embedJlAuditSql: String = {
    val projExprs = (0 until JlDim).map { p =>
      val w = wVec(JlPlaneOffset + p).mkString("[", ", ", "]")
      s"""list_reduce(list_transform(range(1, ${Dim + 1}),
         |       i -> qv[i] * ($w)[i]), (x, y) -> x + y) AS j$p""".stripMargin
    }.mkString(",\n    ")
    val pn2 = (0 until JlDim).map(p => s"j$p * j$p").mkString(" + ")
    val dot16 = (0 until JlDim).map(p => s"a.j$p * b.j$p").mkString(" + ")
    s"""WITH $VecCte,
       |$ScoredPairsCte,
       |egroups AS (SELECT qv, min(vec_id) AS gid FROM vecs GROUP BY qv),
       |jl AS (
       |  SELECT vec_id,
       |    $projExprs
       |  FROM vecs),
       |jln AS (SELECT *, $pn2 AS pn2 FROM jl),
       |rp AS (
       |  SELECT s.aid, s.bid, s.cos FROM spaired s
       |  JOIN egroups ga ON s.aid = ga.gid
       |  JOIN egroups gb ON s.bid = gb.gid),
       |scoredp AS (
       |  SELECT r.cos,
       |         CAST(($dot16) AS DOUBLE)
       |           / (sqrt(CAST(a.pn2 AS DOUBLE)) * sqrt(CAST(b.pn2 AS DOUBLE))) AS cos_p
       |  FROM rp r
       |  JOIN jln a ON r.aid = a.vec_id
       |  JOIN jln b ON r.bid = b.vec_id
       |  WHERE a.pn2 > 0 AND b.pn2 > 0),
       |banded AS (
       |  SELECT CAST(floor(cos * 10.0) AS BIGINT) AS band,
       |         abs(CAST(floor(cos_p * 1000000.0) AS BIGINT)
       |             - CAST(floor(cos * 1000000.0) AS BIGINT)) AS ad
       |  FROM scoredp)
       |SELECT band, CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(sum(ad) AS BIGINT) AS sum_abs_delta_e6,
       |       CAST(max(ad) AS BIGINT) AS max_abs_delta_e6,
       |       CAST(sum(ad) AS BIGINT) // count(*) AS mean_abs_delta_e6
       |FROM banded GROUP BY band ORDER BY band""".stripMargin
  }

  /** Shared oracle CTE chain: groups → cells → seeded graph → one
    * NN-descent round → refined graph + query-group map. Rides the SAME
    * IvfTrainCtes/IvfAssignCtes the IVF family uses, so the flat→hier
    * route switch covers this family too. */
  private def NndCtes: String =
    s"""egroups AS (SELECT qv, min(vec_id) AS gid FROM vecs GROUP BY qv),
       |gids AS (SELECT gid FROM egroups),
       |gv AS (SELECT g.gid, v.qv, v.n2 FROM gids g JOIN vecs v ON v.vec_id = g.gid),
       |cg AS (
       |  SELECT c.cell, g.gid, v.qv, v.n2
       |  FROM gids g
       |  JOIN (SELECT avid, seed_id AS cell FROM assign WHERE rnk = 1) c
       |    ON c.avid = g.gid
       |  JOIN vecs v ON v.vec_id = g.gid),
       |sd0 AS (
       |  SELECT a.gid AS src, b.gid AS dst, $CosSql AS cos
       |  FROM cg a JOIN cg b ON a.cell = b.cell AND a.gid <> b.gid),
       |seed AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |           row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk
       |    FROM sd0) r WHERE rnk <= $NndL),
       |ring0 AS (
       |  SELECT gid,
       |         gid % ${TextStats.FpMod} * ${graft.functions.HashExprs.Mix1}
       |           % ${TextStats.FpMod} AS h
       |  FROM gids),
       |ring1 AS (
       |  SELECT gid AS src,
       |         lead(gid, 1) OVER (PARTITION BY h % $NndRingBuckets ORDER BY h, gid) AS d1,
       |         lead(gid, 2) OVER (PARTITION BY h % $NndRingBuckets ORDER BY h, gid) AS d2
       |  FROM ring0),
       |ring AS (
       |  SELECT src, d1 AS dst FROM ring1 WHERE d1 IS NOT NULL
       |  UNION ALL
       |  SELECT src, d2 AS dst FROM ring1 WHERE d2 IS NOT NULL),
       |trav AS (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM seed UNION ALL SELECT src, dst FROM ring) u),
       |sym AS (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM trav UNION ALL SELECT dst, src FROM trav) u),
       |cand AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT e1.src, e2.dst FROM sym e1
       |    JOIN sym e2 ON e1.dst = e2.src AND e1.src <> e2.dst
       |    UNION ALL SELECT src, dst FROM trav) u),
       |sc AS (
       |  SELECT c.src, c.dst, $CosSql AS cos
       |  FROM cand c JOIN gv a ON c.src = a.gid JOIN gv b ON c.dst = b.gid),
       |graph AS (
       |  SELECT src, dst, cos FROM (
       |    SELECT src, dst, cos,
       |           row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk
       |    FROM sc) r WHERE rnk <= $NndL),
       |qm AS (
       |  SELECT v.vec_id AS qid, e.gid FROM vecs v
       |  JOIN egroups e ON v.qv = e.qv
       |  WHERE v.vec_id < $NumQueries)""".stripMargin

  def annNnGraphSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |$NndCtes
       |SELECT qid, rnk, dst AS nbr_gid,
       |       CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
       |FROM (
       |  SELECT q.qid, g.dst, g.cos,
       |         row_number() OVER (PARTITION BY q.qid ORDER BY g.cos DESC, g.dst) AS rnk
       |  FROM qm q JOIN graph g ON g.src = q.gid) r
       |WHERE rnk <= $TopK
       |ORDER BY qid, rnk""".stripMargin

  def annNnGraphRecallSql: String =
    s"""WITH $VecCte,
       |$IvfTrainCtes,
       |$IvfAssignCtes,
       |$NndCtes,
       |truth AS (
       |  SELECT qid, cgid FROM (
       |    SELECT q.qid, b.gid AS cgid,
       |           row_number() OVER (PARTITION BY q.qid ORDER BY ($CosSql) DESC, b.gid) AS ernk
       |    FROM qm q JOIN gv a ON a.gid = q.gid
       |    JOIN gv b ON b.gid <> q.gid) r WHERE ernk <= $TopK),
       |got AS (
       |  SELECT qid, dst FROM (
       |    SELECT q.qid, g.dst,
       |           row_number() OVER (PARTITION BY q.qid ORDER BY g.cos DESC, g.dst) AS rnk
       |    FROM qm q JOIN graph g ON g.src = q.gid) r WHERE rnk <= $TopK)
       |SELECT t.qid, count(*) AS n_exact,
       |       CAST(sum(CASE WHEN g.dst IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       (CAST(sum(CASE WHEN g.dst IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         * 10000) // count(*) AS recall_e4
       |FROM truth t LEFT JOIN got g ON t.qid = g.qid AND t.cgid = g.dst
       |GROUP BY t.qid ORDER BY t.qid""".stripMargin
}
