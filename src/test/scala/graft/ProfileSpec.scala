package graft

import graft.ops.{Profile, Similarity}
import org.apache.spark.sql.functions._

/** Pins for the round-12 seventh pass: the windowed skyline must equal
  * the O(n²) dominance definition, and the mutual-kNN degrees must equal
  * a naive reciprocity check over the same LSH lists — both on sf0.001,
  * where the brute-force references stay cheap. */
class ProfileSpec extends SparkSpec {

  test("windowed skyline equals the quadratic dominance definition") {
    Knobs.noteDir(Sf0001)
    val fast = Profile.skylineDocs(spark, Sf0001)
    // naive: doc dominated iff some same-source doc is >= on both axes
    // and > on at least one
    val scored = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"),
        graft.ops.TextStats.qualityE4OfText(col("text")).as("q"))
    val a = scored.select(col("source"), col("doc_id"), col("q"), col("n_chars"))
    val b = scored.select(col("source").as("s2"), col("q").as("q2"),
      col("n_chars").as("c2"))
    val dominated = a.join(b,
      col("source") === col("s2") &&
        col("q2") >= col("q") && col("c2") >= col("n_chars") &&
        (col("q2") > col("q") || col("c2") > col("n_chars")),
      "left_semi")
    val naive = a.except(dominated)
      .select(col("source"), col("doc_id"),
        col("q").as("quality_e4"), col("n_chars"))
      .orderBy("source", "doc_id")
    assert(fast.collect().toSeq == naive.collect().toSeq)
  }

  test("mutual-kNN degrees equal naive reciprocity over the LSH lists") {
    Knobs.noteDir(Sf0001)
    val hist = Similarity.mutualKnn(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive: collect the LSH lists, compute reciprocity in plain Scala
    val l = Similarity.annLsh(spark, Sf0001)
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = l.filter { case (a, b) => a < b && l.contains((b, a)) }
    val deg = (mutual.toSeq.map(_._1) ++ mutual.toSeq.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val vecIds = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0))
    val naiveHist = vecIds
      .map(v => deg.getOrElse(v, 0L))
      .groupBy(identity).map { case (d, vs) => d -> vs.length.toLong }
    assert(hist == naiveHist)
    assert(hist.values.sum == vecIds.length.toLong)
  }

  test("table_profile reports zero nulls and full distincts on key columns") {
    Knobs.noteDir(Sf0001)
    val p = Profile.tableProfile(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nd, nullsD, distD) = p(("documents", "doc_id"))
    assert(nullsD == 0L && distD == nd) // primary key: no nulls, all distinct
    val (ne, nullsE, distE) = p(("events", "event_id"))
    assert(nullsE == 0L && distE == ne)
    assert(p.keys.count(_._1 == "documents") == 5)
    assert(p.keys.count(_._1 == "events") == 6)
  }
}
