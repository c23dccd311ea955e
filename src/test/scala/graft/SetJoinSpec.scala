package graft

import org.apache.spark.sql.functions._
import graft.ops.SetJoin

/** Pins the prefix-filter join's defining claim: EXACTNESS. The operator
  * must return precisely the pairs a brute-force shared-shingle join
  * returns at Jaccard ≥ τ — no recall hole from the prefix pruning (the
  * driver's DuckDB oracle is itself brute-force, so this is the same
  * check run in-engine, plus structural assertions the oracle can't
  * express). */
class SetJoinSpec extends SparkSpec {

  /** Brute-force truth: every pair sharing ≥1 trigram, exact Jaccard. */
  private def bruteForce(dir: String) = {
    val sets = SetJoin.triSets(spark, dir)
      .select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("sz"))
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("s"))
    ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .join(sets.select(col("doc_id"), col("sh").as("sh_a"), col("sz").as("sz_a")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sets.select(col("doc_id"), col("sh").as("sh_b"), col("sz").as("sz_b")),
        col("doc_b") === col("doc_id"))
      .withColumn("isz", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard_e4",
        floor(lit(10000.0) * col("isz") / (col("sz_a") + col("sz_b") - col("isz")))
          .cast("long"))
      .where(col("jaccard_e4") >= SetJoin.TauE4)
      .select("doc_a", "doc_b", "jaccard_e4")
  }

  test("expanded variant equals brute force at sf0.001 (completeness + precision)") {
    val got = SetJoin.jaccardPrefixPairsFull(spark, Sf0001).collect().map(_.toSeq).toSet
    val want = bruteForce(Sf0001).collect().map(_.toSeq).toSet
    assert(got === want)
    assert(want.nonEmpty, "test corpus has no planted near-dup pairs — spec is vacuous")
  }

  test("rep-level default: sum of n_pairs equals the expanded row count") {
    val rep = SetJoin.jaccardPrefix(spark, Sf0001).collect()
    val full = SetJoin.jaccardPrefixPairsFull(spark, Sf0001).count()
    assert(rep.map(_.getAs[Long]("n_pairs")).sum === full)
    // cross rows carry the same Jaccard as the expanded report's rep pair
    rep.foreach { r =>
      assert(r.getAs[Long]("jaccard_e4") >= SetJoin.TauE4)
      assert(r.getAs[Long]("size_a") >= 1L && r.getAs[Long]("size_b") >= 1L)
    }
  }

  test("expanded pairs are ordered, deduplicated, and above threshold") {
    val rows = SetJoin.jaccardPrefixPairsFull(spark, Sf0001).collect()
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.toSeq === keys.toSeq.sorted, "output not ordered by (doc_a, doc_b)")
    assert(keys.distinct.length === keys.length, "duplicate pairs in output")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not canonicalized doc_a < doc_b")
      assert(r.getLong(2) >= SetJoin.TauE4)
    }
  }

  test("prefix pruning actually prunes (candidate side smaller than full explode)") {
    // Structural, not timing: the prefix frame must carry strictly fewer
    // (doc, shingle) rows than the full inverted index it replaces —
    // otherwise the operator degenerates to the brute-force join.
    val sets = SetJoin.triSets(spark, Sf0001)
    val full = sets.select(explode(col("sh"))).count()
    // replicate the operator's prefix selection size
    val sized = sets.select(col("doc_id"), size(col("sh")).cast("long").as("sz"),
      explode(col("sh")).as("s"))
    val dfreq = sized.groupBy("s").agg(count(lit(1)).as("df"))
    val pref = sized.join(dfreq, "s")
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("df"), col("s"))))
      .where(col("pos") <=
        col("sz") - ceil(col("sz") * lit(SetJoin.TauE4 / 10000.0)).cast("long") + 1)
      .count()
    assert(pref < full, s"prefix ($pref) does not prune the inverted index ($full)")
    assert(pref <= full / 2 + sets.count(), "τ=0.5 prefix should be ≈ half + 1 per doc")
  }
}
