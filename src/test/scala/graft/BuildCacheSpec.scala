package graft

import org.apache.spark.sql.functions._

/** The write-once persisted build layout (BuildCache under
  * Tables.memoPersist): cold write → warm same-JVM reuse → fresh-JVM
  * re-register, bit-identical rows throughout, co-bucketed cached
  * frames joining with ZERO exchange, and structural staleness via the
  * corpus fingerprint. */
class BuildCacheSpec extends SparkSpec {
  private def withCache[T](root: String)(body: => T): T = {
    val prev = System.getProperty("graft.build.cache")
    System.setProperty("graft.build.cache", root)
    try body
    finally {
      if (prev == null) System.clearProperty("graft.build.cache")
      else System.setProperty("graft.build.cache", prev)
    }
  }

  /** A disposable corpus dir (so /root/testdata is never written) with
    * a real documents.parquet copied from sf0.001. */
  private def tempCorpus(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-corpus-").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/documents.parquet"),
      java.nio.file.Paths.get(s"$d/documents.parquet"))
    d
  }

  test("cold write, warm catalog reuse, fresh-JVM re-register: identical rows") {
    val root = java.nio.file.Files.createTempDirectory("graft-bc-").toString
    val corpus = tempCorpus()
    withCache(root) {
      val key = s"test.cache.roundtrip:$corpus"
      def build = Tables.documents(spark, corpus)
        .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      val cold = Tables.memoPersist(spark, key)(build)
      val expect = cold.orderBy("doc_id").collect().map(_.toSeq).toSeq
      val w0 = BuildCache.writes

      // second session, same JVM: the catalog still has the table
      val s2 = spark.newSession()
      Tables.tune(s2)
      val warm = Tables.memoPersist(s2, key)(build)
      assert(warm.orderBy("doc_id").collect().map(_.toSeq).toSeq == expect)
      assert(BuildCache.writes == w0, "warm reuse must not rewrite")

      // simulate a fresh JVM: drop the catalog entry (files stay), use
      // a third session — the layout must re-register via DDL
      val tbls = spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_cache_test_cache_roundtrip"))
      assert(tbls.nonEmpty, "cold write must register a catalog table")
      tbls.foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
      val s3 = spark.newSession()
      Tables.tune(s3)
      val re = Tables.memoPersist(s3, key)(
        sys.error("fresh-JVM path must not rebuild"): org.apache.spark.sql.DataFrame)
      assert(re.orderBy("doc_id").collect().map(_.toSeq).toSeq == expect)
      assert(BuildCache.writes == w0, "re-register must not rewrite")
    }
  }

  test("co-bucketed cached frames join with zero exchange") {
    val root = java.nio.file.Files.createTempDirectory("graft-bc-").toString
    val corpus = tempCorpus()
    withCache(root) {
      val a = Tables.memoPersist(spark, s"test.cache.za:$corpus") {
        Tables.documents(spark, corpus)
          .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      }
      val b = Tables.memoPersist(spark, s"test.cache.zb:$corpus") {
        Tables.documents(spark, corpus)
          .select(col("doc_id"), col("lang"))
      }
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = a.join(b, "doc_id").groupBy("lang").agg(sum("len").as("s"))
        assert(j.count() > 0)
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning(doc_id"),
          s"cached co-bucketed join must not shuffle on the bucket key:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("frames without an id-like column fall back to plain parquet") {
    val root = java.nio.file.Files.createTempDirectory("graft-bc-").toString
    val corpus = tempCorpus()
    withCache(root) {
      val key = s"test.cache.nobucket:$corpus"
      val f = Tables.memoPersist(spark, key) {
        Tables.documents(spark, corpus)
          .groupBy("lang").agg(count(lit(1)).as("n"))
      }
      val expect = f.orderBy("lang").collect().map(_.toSeq).toSeq
      val s2 = spark.newSession()
      Tables.tune(s2)
      val again = Tables.memoPersist(s2, key)(
        sys.error("must reuse"): org.apache.spark.sql.DataFrame)
      assert(again.orderBy("lang").collect().map(_.toSeq).toSeq == expect)
    }
  }

  test("corpus fingerprint is sensitive to file identity, not just names") {
    val c1 = tempCorpus()
    val c2 = java.nio.file.Files.createTempDirectory("graft-corpus-").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$c1/documents.parquet"),
      java.nio.file.Paths.get(s"$c2/documents.parquet"))
    // same file name + byte length; mtime and dir differ
    assert(BuildCache.fingerprint(c1) != BuildCache.fingerprint(c2))
    assert(BuildCache.fingerprint(c1) == BuildCache.fingerprint(c1))
  }

  test("two racing writers: one rename wins, no tmp residue, layout intact") {
    // The round-11 verdict's concurrency hole: two cold sessions over the
    // same corpus snapshot both failed the _SUCCESS check and raced
    // mode("overwrite") onto ONE path. The round-12 protocol stages each
    // writer in a unique hidden tmp dir and atomically renames into
    // place — emulate the two-JVM race with two threads driving
    // writeLayout at the same final path.
    val root = java.nio.file.Files.createTempDirectory("graft-bc-").toString
    val corpus = tempCorpus()
    val path = s"$root/race_layout"
    val df = Tables.documents(spark, corpus)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    val expect = df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val ts = (1 to 2).map { _ =>
      new Thread(() => {
        gate.await()
        try outcomes.add(BuildCache.writeLayout(spark, fs, path, df, 4, "race.key"))
        catch { case t: Throwable => errs.add(t); () }
      })
    }
    ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join(120000))
    assert(errs.isEmpty, s"writer threw: ${errs.peek()}")
    import scala.jdk.CollectionConverters._
    assert(outcomes.asScala.count(identity) == 1,
      s"exactly one rename must win, got $outcomes")
    // final layout is complete and correct; no .tmp- residue anywhere
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "_meta.json")))
    val residue = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.contains(".tmp-"))
    assert(residue.isEmpty, s"tmp dirs left behind: ${residue.toSeq}")
    val nested = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.isDirectory).map(_.getPath.getName)
    assert(nested.isEmpty, s"loser nested inside winner: ${nested.toSeq}")
    val got = spark.read.parquet(path).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == expect)
  }

  test("prune spares a stale sibling with a live lease, removes it once expired") {
    val corpus = tempCorpus()
    def sibling(root: String, leaseAgeMs: Long): java.nio.file.Path = {
      val d = java.nio.file.Paths.get(root, "deadbeefdeadbeef")
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve("_source.txt"),
        corpus.getBytes("UTF-8"))
      val lease = java.nio.file.Files.write(d.resolve("_lease"),
        "0".getBytes("UTF-8"))
      java.nio.file.Files.setLastModifiedTime(lease,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - leaseAgeMs))
      d
    }
    // fresh lease: a live session may still read that layout — spared
    val rootA = java.nio.file.Files.createTempDirectory("graft-bc-").toString
    val live = sibling(rootA, leaseAgeMs = 0L)
    withCache(rootA) {
      Tables.memoPersist(spark, s"test.cache.pruneA:$corpus") {
        Tables.documents(spark, corpus).select(col("doc_id")).limit(3)
      }.count()
    }
    assert(java.nio.file.Files.exists(live),
      "stale sibling with a live lease must survive prune")
    // expired lease (2× TTL): abandoned — pruned on first touch
    val rootB = java.nio.file.Files.createTempDirectory("graft-bc-").toString
    val dead = sibling(rootB, leaseAgeMs = 2 * BuildCache.LeaseTtlMs)
    withCache(rootB) {
      Tables.memoPersist(spark, s"test.cache.pruneB:$corpus") {
        Tables.documents(spark, corpus).select(col("doc_id")).limit(3)
      }.count()
    }
    assert(!java.nio.file.Files.exists(dead),
      "expired-lease sibling of the same corpus must be pruned")
  }

  test("cache failure degrades to the plain build") {
    // unwritable root: the cache layer must bypass, not break the query
    val corpus = tempCorpus()
    withCache("/proc/invalid-root/x") {
      val f = Tables.memoPersist(spark, s"test.cache.degrade:$corpus") {
        Tables.documents(spark, corpus)
          .select(col("doc_id")).limit(5)
      }
      assert(f.count() == 5)
    }
  }
}
