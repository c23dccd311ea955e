package graft

import graft.functions.GraftExtensions

/** SQL access to the native expressions after runtime registration. */
class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions compute the native-expression results") {
    GraftExtensions.register(spark)
    val dot = spark.sql("SELECT long_dot(array(1L,2L,3L), array(4L,5L,6L))")
      .head().getLong(0)
    assert(dot === 32L)

    val l2 = spark.sql("SELECT long_l2(array(1L,2L,3L), array(4L,6L,3L))")
      .head().getLong(0)
    assert(l2 === 9L + 16L + 0L)

    val h = spark.sql("SELECT byte_roll_hash('ab')").head().getLong(0)
    assert(h === (97L * 1000003L + 98L) % 2147483647L)

    val mh = spark.sql("SELECT minhash_affine(array(5L))").head().getSeq[Long](0)
    assert(mh.length === 16)
    assert(mh === graft.ops.Dedup.PermA.zip(graft.ops.Dedup.PermB)
      .map { case (a, b) => (a * 5L + b) % 2147483647L })

    val sh = spark.sql("SELECT shingle_hash_set(array('x','y','x','y'))")
      .head().getSeq[Long](0)
    assert(sh.length === 2) // bigrams "x y","y x","x y" → 2 distinct
  }
}
