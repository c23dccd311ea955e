package graft

import graft.functions.HashExprs
import org.apache.spark.sql.functions._

/** Native expression semantics pinned against plain-Scala references —
  * exercises the codegen path (DataFrame eval) for dot product, rolling
  * hash, and the one-pass minhash signature. */
class HashExprsSpec extends SparkSpec {

  private val P = 2147483647L
  private val Prime = 1000003L

  test("long_dot matches a plain Scala dot product") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(-2L, 7L), Array(3L, 3L)),
      (Array.empty[Long], Array.empty[Long]))
    val got = rows.toDF("a", "b")
      .select(HashExprs.longDot(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    val want = rows.map { case (a, b) => a.zip(b).map { case (x, y) => x * y }.sum }
    assert(got === want)
  }

  test("long_l2 matches a plain Scala squared L2 distance") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
      (Array(-2L, 7L), Array(3L, -3L)),
      (Array(10000L, -10000L), Array(-10000L, 10000L)),
      (Array.empty[Long], Array.empty[Long]))
    val got = rows.toDF("a", "b")
      .select(HashExprs.longL2(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    val want = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    }
    assert(got === want)
  }

  test("byte_roll_hash matches the per-char fold for ASCII") {
    val s = spark
    import s.implicits._
    val texts = Seq("hello world", "", "a", "the quick brown fox 42!")
    val got = texts.toDF("t")
      .select(HashExprs.byteRollHash(col("t"), Prime, P).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val want = texts.map(_.foldLeft(0L)((h, c) => (h * Prime + c.toLong) % P))
    assert(got === want)
  }

  test("minhash_affine matches per-perm min over affine hashes") {
    val s = spark
    import s.implicits._
    val a = Seq(3L, 5L, 7L)
    val b = Seq(11L, 13L, 17L)
    val sets = Seq(Array(100L, 200L, 300L), Array(42L))
    val got = sets.toDF("sh")
      .select(HashExprs.minHash(col("sh"), a, b, P).as("m"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    val want = sets.map(set =>
      a.indices.map(j => set.map(x => (a(j) * x + b(j)) % P).min).toSeq)
    assert(got === want)
  }

  test("short_dot over pack_shorts equals long_dot over the arrays") {
    val s = spark
    import s.implicits._
    val vs = Seq(
      (Array(1L, -2L, 3L, 10000L), Array(-4L, 5L, -6L, -10000L)),
      (Array(0L, 0L, 0L, 0L), Array(7L, 8L, 9L, 10L)),
      (Array(32767L, -32768L, 1L, -1L), Array(1L, 1L, 1L, 1L)))
    val df = vs.toDF("a", "b")
    val got = df.select(
      HashExprs.shortDot(HashExprs.packShorts(col("a")),
        HashExprs.packShorts(col("b"))).as("d"))
      .collect().map(_.getLong(0)).toSeq
    val want = df.select(HashExprs.longDot(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === want)
  }

  test("pack_shorts throws on out-of-int16-range input") {
    val s = spark
    import s.implicits._
    val ex = intercept[Exception] {
      Seq(Array(40000L)).toDF("a")
        .select(HashExprs.packShorts(col("a"))).collect()
    }
    assert(ex.getMessage.contains("pack_shorts") ||
      ex.getCause != null && ex.getCause.getMessage.contains("pack_shorts"))
  }
}
