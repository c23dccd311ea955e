package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Streaming IVF cell routing — the serving half of the batch-train /
  * stream-assign split a production vector pipeline runs: the coarse
  * quantizer is trained in batch (Similarity.trainedCentroids, the same
  * centroids every batch ANN query uses), then arriving embeddings are
  * routed to their nearest cell as a STATELESS per-row projection, so the
  * stream needs no aggregation state, no watermark, and works in append
  * mode at any rate.
  *
  * The centroid table is compiled INTO the routing expression at plan
  * build (a bounded NumCells-row collect — config-sized, the same
  * discipline as the subscription map and the hyperplane literals): each
  * arriving vector evaluates its cosine against every centroid literal
  * and takes the argmax with ties to the smaller seed_id via one
  * array_max over (cos, -seed_id) structs — bit-identical semantics to
  * the batch row_number assignment rule, which IvfRouteStreamSpec pins.
  *
  * At 100 TB-rate streams this is the right shape: routing cost is
  * NumCells dot products per row with zero shuffle; the downstream
  * per-cell fan-out (writing routed vectors to cell-partitioned storage)
  * is the ShardSink pattern. */
object IvfRouteStream {

  /** File-source stream over an embeddings parquet directory. */
  def readEmbeddings(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
      .parquet(dir)
  }

  /** Route each arriving embedding to its nearest trained cell:
    * (vec_id, cell). Zero-direction vectors (all components quantize to
    * 0) are dropped — the batch vectors-frame guard. */
  def routeToCells(stream: DataFrame, centroids: Array[Row]): DataFrame = {
    val qv = Similarity.quant
    val n2 = graft.functions.HashExprs.longDot(qv, qv)
    val cands: Seq[Column] = centroids.toSeq.map { r =>
      val seedId = r.getAs[Long]("seed_id")
      val sv = r.getSeq[Long](r.fieldIndex("sv"))
      val sn2 = r.getAs[Long]("sn2")
      val cos = graft.functions.HashExprs.longDot(qv, array(sv.map(lit): _*))
        .cast("double") / (sqrt(n2.cast("double")) * sqrt(lit(sn2).cast("double")))
      struct(cos.as("cos"), lit(-seedId).as("neg_seed"))
    }
    stream
      .where(n2 > 0)
      .withColumn("best", array_max(array(cands: _*)))
      .select(col("vec_id"), (-col("best.neg_seed")).as("cell"))
  }
}
