package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once persisted layout for the shared index builds.
  *
  * Round-10 measurement: at the 100× stress point the memoized build
  * family (decoded CDC feed, shingle/rep frames, quantized vectors,
  * LSH pair scores, BM25 postings, IVF/PQ codebooks) costs 212.9 s of
  * the 360.7 s registry wall — and every new session pays it again,
  * because [[Tables.memoPersist]] caches per-JVM only. On a production
  * cluster the same frames would be rebuilt per job over the same
  * immutable corpus snapshot. The fix is the classic warehouse answer:
  * build ONCE, write as BUCKETED parquet, and let every later session
  * re-read the layout — with the bucket metadata letting Catalyst plan
  * co-partitioned joins with ZERO exchange (the row-96 BucketedJoinSpec
  * proof, now applied to the engine's own intermediates).
  *
  * Layout: `<root>/<fingerprint>/<key-slug>/` per memo key, where the
  * fingerprint hashes the corpus directory identity — every table
  * file's (name, length, mtime) — plus every GRAFT_* env override and
  * a format version. Any data regen or knob flip yields a new
  * fingerprint, so staleness is structural, not policed. A `_meta.json`
  * sidecar records the bucket spec so a FRESH JVM can re-register the
  * external bucketed table (`CREATE TABLE … CLUSTERED BY … LOCATION`)
  * without rewriting a byte; stale fingerprints of the same corpus dir
  * are pruned on first touch.
  *
  * Bucket key: the first id-like column present in the frame
  * (doc_id / vec_id / aid / doc_a / rep / qid / …). Frames with no such
  * column (tiny codebooks, global histograms) are written as plain
  * parquet — their cost is O(knobs), not O(N), so re-read is free
  * anyway. One file per bucket (the frame is repartitioned by the
  * bucket key before the write), so the scan also reports the sortBy
  * ordering and sort-merge joins skip their sorts.
  *
  * Enablement: `GRAFT_BUILD_CACHE=<dir>` env, or the
  * `graft.build.cache` system property (Bench defaults it on; Verify
  * leaves it off so the correctness gate always exercises the real
  * compute path). Any cache-layer failure falls back to the plain
  * in-memory build — the cache is an accelerator, never a correctness
  * dependency.
  */
object BuildCache {
  // v3: cdc.decoded became a (tbl, kind)-partitioned layout (round 13) —
  // the version is part of the fingerprint, so pre-partition layouts
  // invalidate structurally instead of being silently read unpartitioned
  private val FormatVersion = 3

  def root: Option[String] =
    sys.env.get("GRAFT_BUILD_CACHE")
      .orElse(Option(System.getProperty("graft.build.cache")))
      .map(_.trim).filter(s => s.nonEmpty && s != "off")

  /** Monotone counters for the bench artifact's cache-state line. */
  @volatile var hits: Int = 0
  @volatile var writes: Int = 0

  private def hadoopFs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(new org.apache.hadoop.conf.Configuration())

  /** Corpus + knob-env fingerprint (memoized per corpus dir). */
  private val fps = scala.collection.concurrent.TrieMap.empty[String, String]

  def fingerprint(dir: String): String = fps.getOrElseUpdate(dir, {
    val sb = new StringBuilder(s"v$FormatVersion|$dir|")
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = hadoopFs(p)
      val files = fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)
      files.foreach { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).sortBy(_.getPath.getName).foreach { f =>
            sb.append(f.getPath.getName).append(':').append(f.getLen)
              .append(':').append(f.getModificationTime).append('|')
          }
        else
          sb.append(st.getPath.getName).append(':').append(st.getLen)
            .append(':').append(st.getModificationTime).append('|')
      }
    } catch { case scala.util.control.NonFatal(_) => sb.append("nofs|") }
    // every GRAFT_* env EXCEPT the ones that cannot affect a built
    // frame's content (cache location, bench artifact plumbing) — an
    // unknown future env lands in the hash, which errs toward rebuild
    val NonPlan = Set("GRAFT_BUILD_CACHE", "GRAFT_BENCH_OUT", "GRAFT_BENCH_PREV")
    sys.env.toSeq.filter(_._1.startsWith("GRAFT_"))
      .filterNot(kv => NonPlan(kv._1)).sorted
      .foreach { case (k, v) => sb.append(k).append('=').append(v).append('|') }
    // FNV-1a 64-bit over the description — stable across JVMs
    var h = 0xcbf29ce484222325L
    sb.toString.getBytes("UTF-8").foreach { b =>
      h ^= (b & 0xffL); h *= 0x100000001b3L
    }
    f"$h%016x"
  })

  /** Bucket-file count: ~256k rows per bucket of the largest corpus
    * table, power-of-two, clamped to [32, 1024]. One global value per
    * run so every cached frame co-buckets with every other (equal
    * numBuckets is what lets two bucketed sides join exchange-free). */
  def cacheBuckets(dir: String): Int =
    sys.env.get("GRAFT_CACHE_BUCKETS").map(_.trim.toInt).getOrElse {
      val n = Seq("documents", "embeddings", "events")
        .map(t => Knobs.rowCount(dir, t)).max
      val want = math.max(32L, n / (256L * 1024L))
      var b = 32
      while (b < want && b < 1024) b *= 2
      b
    }

  private val IdCandidates =
    Seq("doc_id", "vec_id", "aid", "doc_a", "rep", "qid", "event_id",
      "user_id", "tok")

  private def bucketColOf(df: DataFrame): Option[String] = {
    val names = df.schema.fieldNames.toSet
    IdCandidates.find(names.contains)
  }

  /** Keys whose layout is PARTITIONED (hive-style dirs) instead of
    * bucketed: the decoded CDC feed partitions by (tbl, kind) so the
    * per-table routed filter family (the reference routes every change
    * per (table, change-kind) BEFORE specific filters —
    * src/forwarder/mod.rs:106-126) reads only its tables' files. A
    * partition column must be low-cardinality and lead every hot
    * predicate; (tbl, kind) is ≤ #tables × 3 dirs at any corpus size. */
  private val PartitionRules: Seq[(String, Seq[String])] =
    Seq("cdc.decoded" -> Seq("tbl", "kind"))

  private def partitionColsFor(key: String, df: DataFrame): Seq[String] =
    PartitionRules.collectFirst {
      case (p, cols) if (key == p || key.startsWith(p + ":")) &&
        cols.forall(df.schema.fieldNames.contains) => cols
    }.getOrElse(Nil)

  private def slug(key: String): String =
    key.toLowerCase.map(c => if (c.isLetterOrDigit) c else '_')
      .replaceAll("_+", "_").stripPrefix("_").stripSuffix("_").take(48)

  /** All memo keys end in ":<corpus dir>" by convention (Tables). */
  private def dirOf(key: String): String = key.substring(key.lastIndexOf(':') + 1)

  private def shortHash(s: String): String = {
    var h = 0xcbf29ce484222325L
    s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
    f"$h%016x".take(10)
  }

  /** A fingerprint dir's lease file: touched by every session that
    * registers or writes a layout under it, so prune can tell "stale
    * and abandoned" from "stale for ME but a live session still reads
    * it" (two sessions over different corpus generations of the same
    * dir are both legitimate until the older one exits). */
  val LeaseTtlMs: Long = sys.env.get("GRAFT_CACHE_LEASE_MS").map(_.toLong)
    .getOrElse(60L * 60 * 1000)

  private def touchLease(fs: org.apache.hadoop.fs.FileSystem,
      fpDir: String): Unit =
    try {
      val p = new org.apache.hadoop.fs.Path(fpDir, "_lease")
      val os = fs.create(p, true)
      try os.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
      finally os.close()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Remove sibling fingerprint dirs of the SAME corpus dir (a regen or
    * knob flip made them unreachable); other corpora cached under the
    * same root are untouched, and so is any sibling whose lease is
    * younger than [[LeaseTtlMs]] — a live session may still be reading
    * its registered tables out of that layout. */
  private def pruneStale(fs: org.apache.hadoop.fs.FileSystem,
      rootP: org.apache.hadoop.fs.Path, dir: String, keepFp: String): Unit =
    try {
      if (fs.exists(rootP)) fs.listStatus(rootP).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name != keepFp) {
          val src = new org.apache.hadoop.fs.Path(st.getPath, "_source.txt")
          val matches = fs.exists(src) && {
            val in = fs.open(src)
            try {
              val buf = new Array[Byte](4096)
              val n = in.read(buf)
              n > 0 && new String(buf, 0, n, "UTF-8").trim == dir
            } finally in.close()
          }
          val lease = new org.apache.hadoop.fs.Path(st.getPath, "_lease")
          val leased = fs.exists(lease) &&
            System.currentTimeMillis() - fs.getFileStatus(lease).getModificationTime < LeaseTtlMs
          if (matches && !leased) fs.delete(st.getPath, true)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  private val prunedRoots = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** The cache layer proper: return the frame for `key`, reading the
    * persisted layout when present, writing it when absent. Any failure
    * degrades to the plain in-memory `build`. */
  def throughCache(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    root match {
      case None => build
      case Some(r) =>
        try throughCache0(spark, r, key)(build)
        catch {
          case scala.util.control.NonFatal(e) =>
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"build cache bypassed for $key: ${e.getMessage}")
            build
        }
    }

  private def throughCache0(spark: SparkSession, r: String, key: String)(
      build: => DataFrame): DataFrame = {
    val dir = dirOf(key)
    val fp = fingerprint(dir)
    val fpDir = s"$r/$fp"
    val path = s"$fpDir/${slug(key)}_${shortHash(key)}"
    val tbl = s"graft_cache_${slug(key)}_${shortHash(key + fp)}"
    val fs = hadoopFs(new org.apache.hadoop.fs.Path(r))
    if (prunedRoots.putIfAbsent(s"$r|$dir|$fp", true).isEmpty)
      pruneStale(fs, new org.apache.hadoop.fs.Path(r), dir, fp)

    def metaP = new org.apache.hadoop.fs.Path(path, "_meta.json")
    def okP = new org.apache.hadoop.fs.Path(path, "_SUCCESS")

    if (spark.catalog.tableExists(tbl)) { hits += 1; spark.table(tbl) }
    else if (fs.exists(okP) && fs.exists(metaP)) {
      // fresh JVM over a warm layout: re-register, zero bytes rewritten
      hits += 1
      touchLease(fs, fpDir)
      registerLayout(spark, fs, path, tbl)
    } else {
      // Legacy/garbage final dir without the rename protocol's
      // _SUCCESS+_meta pair (pre-round-12 partial write): clear it.
      // Under the rename protocol a visible final dir is always
      // complete, so this never races a live writer's output.
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val df = build
      writeLayout(spark, fs, path, df, cacheBuckets(dir), key)
      val srcP = new org.apache.hadoop.fs.Path(fpDir, "_source.txt")
      if (!fs.exists(srcP)) {
        val os = fs.create(srcP, true)
        try os.write(dir.getBytes("UTF-8")) finally os.close()
      }
      touchLease(fs, fpDir)
      writes += 1
      registerLayout(spark, fs, path, tbl)
    }
  }

  /** Register the completed layout at `path` as external table `tbl`
    * (bucket spec from the `_meta.json` sidecar) and return it.
    * PARTITIONED layouts skip the catalog: a schema-pinned path read
    * gives hive-style partition discovery + pruning directly, and the
    * stored build-order DDL re-imposes original column order and types
    * (partition reads would otherwise move partition columns last and
    * string-type them). `marker` tags the read with an inert option so
    * its plan is NOT sameResult with the memoPersist-cached read — the
    * pruned view must reach the FILE scan, not the in-memory cache. */
  private def registerLayout(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String, tbl: String,
      marker: Boolean = false): DataFrame = {
    val metaP = new org.apache.hadoop.fs.Path(path, "_meta.json")
    val in = fs.open(metaP)
    val metaTxt =
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toString("UTF-8")
      } finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(metaTxt)
    val bucketCol = Option(node.get("bucket")).map(_.asText).filter(_.nonEmpty)
    val nBuckets = Option(node.get("n_buckets")).map(_.asInt).getOrElse(0)
    val partDdl = Option(node.get("schema_ddl")).map(_.asText).filter(_.nonEmpty)
    partDdl match {
      case Some(d) =>
        val schema = org.apache.spark.sql.types.StructType.fromDDL(d)
        val rd = spark.read.schema(schema)
        (if (marker) rd.option("graft.layout.view", "pruned") else rd)
          .parquet(path)
          .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      case None =>
        val schema = spark.read.parquet(path).schema
        val ddl = bucketCol match {
          case Some(c) if nBuckets > 0 =>
            s"CREATE TABLE $tbl (${schema.toDDL}) USING PARQUET " +
              s"CLUSTERED BY ($c) SORTED BY ($c) INTO $nBuckets BUCKETS " +
              s"LOCATION '$path'"
          case _ =>
            s"CREATE TABLE $tbl (${schema.toDDL}) USING PARQUET LOCATION '$path'"
        }
        spark.sql(ddl)
        spark.table(tbl)
    }
  }

  /** Read-only view of an already-persisted layout for `key`, bypassing
    * both the build and the in-memory persist: None when the cache is
    * off, the layout absent, or any cache-layer failure occurs. The
    * routed CDC filter family reads the tbl/kind-partitioned decoded
    * feed through this — a static table predicate then becomes a
    * PartitionFilters entry on the file scan (files of other tables are
    * never opened), where the memoPersist view would scan the whole
    * in-memory relation. */
  def layoutFor(spark: SparkSession, key: String): Option[DataFrame] =
    root.flatMap { r =>
      try {
        val dir = dirOf(key)
        val fp = fingerprint(dir)
        val path = s"$r/$fp/${slug(key)}_${shortHash(key)}"
        val tbl = s"graft_cache_${slug(key)}_${shortHash(key + fp)}"
        val fs = hadoopFs(new org.apache.hadoop.fs.Path(r))
        val okP = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
        val metaP = new org.apache.hadoop.fs.Path(path, "_meta.json")
        // A session reading ONLY through this path must still renew the
        // fingerprint dir's lease, or a sibling session's pruneStale can
        // delete the files out from under a long-lived reader mid-query
        // (same liveness contract as throughCache0's hit path).
        if (spark.catalog.tableExists(tbl)) {
          touchLease(fs, s"$r/$fp")
          Some(spark.table(tbl))
        } else if (fs.exists(okP) && fs.exists(metaP)) {
          touchLease(fs, s"$r/$fp")
          Some(registerLayout(spark, fs, path, tbl, marker = true))
        } else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Concurrent-writer protocol (round 12): build the layout in a
    * UNIQUE hidden tmp dir next to the final path, write `_meta.json`
    * into it, then atomically `rename` into place. Two cold sessions
    * racing the same key each write their own tmp; exactly one rename
    * wins (rename-to-existing fails on HDFS and local fs), the loser
    * deletes its tmp and reads the winner's — which is byte-equivalent
    * by construction (same corpus fingerprint, same knobs). A reader
    * can never observe a half-written final dir: the dir appears with
    * `_SUCCESS` and `_meta.json` already inside. Returns true if this
    * call's rename won. */
  private[graft] def writeLayout(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String, df: DataFrame,
      nBuckets: Int, key: String): Boolean = {
    // Hive-style partition dirs do not round-trip empty strings (Spark
    // reads the "" partition value back as null), and null values land in
    // __HIVE_DEFAULT_PARTITION__ — either would break the documented
    // byte-equality between cache-on and cache-off builds if a malformed
    // wal2json change carried tbl='' or kind=''. Demote such a build to
    // the unpartitioned layout: correctness (byte-equality) outranks
    // pruning, and the probe is a one-time cost on the cold build.
    val partCols = {
      val want = partitionColsFor(key, df)
      if (want.isEmpty) want
      else {
        import org.apache.spark.sql.functions.col
        val dirty = df.where(want.map(c =>
          col(c).isNull || col(c) === "").reduce(_ || _)).limit(1)
        if (dirty.isEmpty) want else Seq.empty
      }
    }
    val bucketCol = if (partCols.nonEmpty) None else bucketColOf(df)
    val uniq = java.util.UUID.randomUUID().toString.take(8)
    val tmp = s"$path.tmp-$uniq"
    if (partCols.nonEmpty) {
      // Hive-style partition dirs. Row-to-file salting: hash over the
      // full row spreads each partition's rows across ~nBuckets/8 write
      // tasks, so the write parallelizes at any corpus size while the
      // file count stays ~nBuckets (a bare partitionBy would emit
      // one file per (upstream task × partition) — thousands at 1000×).
      import org.apache.spark.sql.functions.{col, lit, pmod, struct, xxhash64}
      val salt = math.max(1, nBuckets / 8)
      val saltCol = pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salt))
      df.repartition(nBuckets, partCols.map(col) :+ saltCol: _*)
        .write.partitionBy(partCols: _*).mode("overwrite").parquet(tmp)
    } else bucketCol match {
      case Some(c) =>
        // bucketBy requires a table write; stage under a throwaway name,
        // then drop the catalog entry (external table: files stay put)
        val tmpTbl = s"graft_cache_stage_$uniq"
        df.repartition(nBuckets, org.apache.spark.sql.functions.col(c))
          .write.format("parquet").option("path", tmp)
          .bucketBy(nBuckets, c).sortBy(c)
          .mode("overwrite").saveAsTable(tmpTbl)
        spark.sql(s"DROP TABLE IF EXISTS $tmpTbl")
      case None =>
        df.write.mode("overwrite").parquet(tmp)
    }
    // partitioned layouts record the build-order schema DDL: a partition
    // read surfaces partition columns LAST and as path strings, so the
    // re-read must re-impose the original order and types to stay
    // byte-identical with the cache-off build
    val partsJson = partCols.map(JsonUtil.q).mkString("[", ",", "]")
    val ddlJson =
      if (partCols.nonEmpty) s""","partitions":$partsJson,"schema_ddl":${JsonUtil.q(df.schema.toDDL)}"""
      else ""
    val meta =
      s"""{"key":${JsonUtil.q(key)},"bucket":${JsonUtil.q(bucketCol.getOrElse(""))},"n_buckets":${if (bucketCol.isDefined) nBuckets else 0}$ddlJson}"""
    val om = fs.create(new org.apache.hadoop.fs.Path(tmp, "_meta.json"), true)
    try om.write(meta.getBytes("UTF-8")) finally om.close()
    // FileContext.rename, NOT FileSystem.rename: the latter "helpfully"
    // moves src INSIDE an existing destination directory (and its local
    // fallback silently degrades to a copy), which would nest the
    // loser's layout inside the winner's. FileContext without OVERWRITE
    // throws on an existing destination — the semantics a race needs.
    val won =
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          fs.getUri, fs.getConf)
        fc.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(path))
        true
      } catch { case scala.util.control.NonFatal(_) => false }
    if (!won) {
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      // the winner's layout must be complete, or this key is broken
      require(fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS")),
        s"lost the layout race for $key but no winner layout at $path")
    }
    won
  }
}
