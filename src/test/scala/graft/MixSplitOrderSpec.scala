package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Pipeline

/** Invariants of the mixing / split / ordering planners beyond the
  * row-hash oracle: the two-phase distributed rank must equal the global
  * window rank it replaces, the split must be leak-free and exhaustive,
  * and temperature scaling must actually compress shares toward uniform. */
class MixSplitOrderSpec extends SparkSpec {

  test("epoch_order two-phase rank equals a global row_number per epoch") {
    val out = Pipeline.epochOrder(spark, Sf0001)
    val global = out
      .withColumn("rn", row_number().over(
        Window.partitionBy("epoch").orderBy("pos")))
      .where(col("rn") =!= col("pos"))
    assert(global.count() === 0L, "two-phase pos has gaps or duplicates")
    // each epoch must order ALL documents
    val docs = graft.Tables.documents(spark, Sf0001).count()
    val per = out.groupBy("epoch").count().collect().map(_.getLong(1)).toSeq
    assert(per === Seq.fill(Pipeline.Epochs)(docs))
  }

  test("epoch orders genuinely differ between epochs") {
    val out = Pipeline.epochOrder(spark, Sf0001)
    val e0 = out.where(col("epoch") === 0).select("pos", "doc_id")
    val e1 = out.where(col("epoch") === 1).select("pos", "doc_id")
    val agree = e0.as("a").join(e1.as("b"),
      col("a.pos") === col("b.pos") && col("a.doc_id") === col("b.doc_id")).count()
    assert(agree < e0.count() / 2, s"epochs nearly identical ($agree matching positions)")
  }

  test("split_assign: leak-free, exhaustive, train-dominant") {
    val rows = Pipeline.splitAssign(spark, Sf0001).collect()
    val bySplit = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    rows.foreach(r => assert(r.getLong(3) === 0L, "content key leaked across splits"))
    val docs = graft.Tables.documents(spark, Sf0001).count()
    assert(bySplit.values.sum === docs)
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("mix_temperature compresses shares toward uniform (α=0.5 property)") {
    val rows = Pipeline.mixTemperature(spark, Sf0001).collect()
    val raw = rows.map(_.getLong(4))
    val temp = rows.map(_.getLong(5))
    // temperature shares must have strictly smaller spread than raw shares
    assert(temp.max - temp.min <= raw.max - raw.min)
    // rates are valid probabilities in e6, and the sparsest source runs at ~1.0
    rows.foreach(r => assert(r.getLong(6) >= 0 && r.getLong(6) <= 1000000L))
    assert(rows.map(_.getLong(6)).max >= 999999L - 1)
  }
}
