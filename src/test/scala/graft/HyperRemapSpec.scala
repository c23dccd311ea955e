package graft

import graft.cdc.HyperRemap

/** Chunk-name remap semantics (reference src/forwarder/mod.rs:15-41,
  * src/cdc/mod.rs:12-18): a `_hyper_<idx>_*` chunk maps through the
  * catalog; an idx missing from the catalog, a non-chunk name, or a
  * malformed chunk name all fall back to the raw table name. */
class HyperRemapSpec extends SparkSpec {

  test("remap: catalog hit, catalog miss, non-chunk, malformed") {
    val s = spark
    import s.implicits._
    val changes = Seq(
      "_hyper_1_3_chunk", // idx 1 → cpustats
      "_hyper_2_9_chunk", // idx 2 → memstats
      "_hyper_9_1_chunk", // idx 9 not in catalog → raw name
      "cpustats",         // not a chunk → raw name
      "_hyper_x_chunk"    // malformed idx → raw name
    ).toDF("tbl")
    val got = HyperRemap.remap(spark, changes)
      .select("tbl", "base").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "_hyper_1_3_chunk" -> "cpustats",
      "_hyper_2_9_chunk" -> "memstats",
      "_hyper_9_1_chunk" -> "_hyper_9_1_chunk",
      "cpustats" -> "cpustats",
      "_hyper_x_chunk" -> "_hyper_x_chunk"))
  }
}
