package graft

import graft.ops.{Similarity, TextStats}
import org.apache.spark.sql.functions._

/** Round-12 additions: the char-collision expression (SURVEY §2 row 186)
  * and the semantic decontamination ledger (row 185). */
class CharCollisionSpec extends SparkSpec {

  test("char_collision_ppm matches a per-doc histogram reference, NULL under 2 chars") {
    val rows = Tables.documents(spark, Sf0001).limit(300)
      .select(col("doc_id"), col("text"),
        graft.functions.HashExprs.charCollisionPpm(col("text")).as("ppm"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getString(1)
      val n = s.length
      val got = if (r.isNullAt(2)) None else Some(r.getLong(2))
      if (n < 2) assert(got === None, s"doc ${r.getLong(0)}")
      else {
        val pairs2 = s.groupBy(identity).values
          .map(g => g.size.toLong * (g.size - 1)).sum
        assert(got === Some(1000000L * pairs2 / (n.toLong * (n - 1))),
          s"doc ${r.getLong(0)}")
      }
    }
  }

  test("char_collision_ppm handles the degenerate and boundary strings") {
    import spark.implicits._
    val got = Seq("", "a", "aa", "ab", "aab", "aaaa")
      .toDF("text")
      .select(graft.functions.HashExprs.charCollisionPpm(col("text")).as("ppm"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    // "aa": 1 colliding pair of 1 -> 1e6; "ab": 0; "aab": pairs2=2 over
    // n(n-1)=6 -> 333333; "aaaa": 12/12 -> 1e6
    assert(got.toSeq === Seq(None, None, Some(1000000L), Some(0L),
      Some(333333L), Some(1000000L)))
  }

  test("char_collision_audit plan: one codegen'd projection, no char explode") {
    val df = TextStats.charCollisionAudit(spark, Sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the naive form explodes text into a char table (Generate) — the
    // expression must keep the per-doc pass inside whole-stage codegen
    assert(!plan.contains("Generate"), s"char explode in plan:\n$plan")
    assert(plan.contains("char_collision_ppm"), s"expression missing:\n$plan")
    assert(plan.contains("*("), s"no codegen span:\n$plan")
  }

  test("decontaminate_semantic ledger equals a recompute from the expanded pair report") {
    // Independent reconstruction from PUBLIC frames only: the expanded
    // per-copy pair report carries exactly the qualifying pairs at the
    // shared τ, so the ledger must equal "train members with an
    // eval-side partner, worst cosine" rolled up per label.
    val labels = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        aggregate(transform(col("embedding"),
            x => floor(x * lit(10000.0) + lit(0.5)).cast("long")),
          lit(0L), (acc, x) => acc + x * x).as("n2"))
      .where(col("n2") > 0)
      .select("vec_id", "label")
    val pairs = Similarity.embedCosineDupPairsFull(spark, Sf0001)
    val directed = pairs.select(col("aid").as("t"), col("bid").as("o"), col("cos_e6"))
      .unionByName(pairs.select(col("bid").as("t"), col("aid").as("o"), col("cos_e6")))
    val hits = directed
      .join(labels.select(col("vec_id").as("o"), col("label").as("olab")), "o")
      .where(col("olab") === Similarity.EvalLabel)
      .groupBy("t").agg(max("cos_e6").as("best_e6"))
    val expected = labels.where(col("label") =!= Similarity.EvalLabel)
      .join(hits.withColumnRenamed("t", "vec_id"), Seq("vec_id"), "left")
      .groupBy("label")
      .agg(count(lit(1)).as("n_train"),
        sum(when(col("best_e6").isNotNull, 1L).otherwise(0L)).as("n_flagged"),
        max(coalesce(col("best_e6"), lit(-1L))).as("max_cos_e6"))
      .orderBy("label")
      .collect().map(_.toSeq).toSeq
    val got = Similarity.decontaminateSemantic(spark, Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got === expected)
    // and the ledger is non-trivial on this corpus: every label present
    assert(got.size === 9)
  }
}
