package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** GramSumsAgg (the one-buffer XᵀX aggregate behind embed_covariance)
  * must be bit-identical to the declarative explode+groupBy covariance
  * it replaced — the imperative buffer is a performance rewrite, not a
  * semantics change.
  *
  * Precondition for the equivalence (round-10 advice): every input array
  * has EXACTLY Dim elements. GramSumsAgg skips a shorter-than-Dim row
  * entirely (n not incremented), while the declarative form counts such
  * rows in `n` with NULL-skipped sums — identical here only because
  * `Similarity.quant` always emits exactly Dim elements. The claim is
  * input-shape-dependent, not a general short-row equivalence. */
class GramAggSpec extends SparkSpec {

  test("gram_sums covariance equals the declarative explode formulation") {
    val dim = Similarity.Dim
    val got = Similarity.embedCovariance(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))

    // the pre-round-10 declarative form, verbatim
    val v = Tables.embeddings(spark, Sf0001)
      .select(Similarity.quant.as("qv"))
      .withColumn("n2",
        graft.functions.HashExprs.longDot(col("qv"), col("qv")))
      .where(col("n2") > 0)
    val want = v
      .select(explode(expr(
        s"""flatten(transform(sequence(0, ${dim - 1}), i ->
           |  transform(sequence(i, ${dim - 1}), j ->
           |    named_struct('i', i, 'j', j,
           |      'x', element_at(qv, i + 1), 'y', element_at(qv, j + 1)))))""".stripMargin))
        .as("p"))
      .select(col("p.i").cast("long").as("dim_i"), col("p.j").cast("long").as("dim_j"),
        col("p.x").as("x"), col("p.y").as("y"))
      .groupBy("dim_i", "dim_j")
      .agg(count(lit(1)).as("n"), sum("x").as("sum_x"), sum("y").as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"))
      .withColumn("cov_e4", expr(
        """CAST(floor(1.0e4 * (CAST(n AS DOUBLE) * sum_xy - CAST(sum_x AS DOUBLE) * sum_y)
          | / (CAST(n AS DOUBLE) * n)) AS BIGINT)""".stripMargin))
      .orderBy("dim_i", "dim_j")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))

    assert(got.length === dim * (dim + 1) / 2)
    assert(got === want)
  }
}
