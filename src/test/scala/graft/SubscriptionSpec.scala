package graft

import graft.cdc.Subscription
import org.apache.spark.sql.Row

/** Parser + validation semantics of the subscription DSL
  * (reference src/api/query.rs:9-85, src/cdc/mod.rs:29-47). */
class SubscriptionSpec extends SparkSpec {

  private def parsedMap: Map[String, Row] =
    Subscription.parsed(spark).collect().map(r => r.getString(0) -> r).toMap

  private def validatedMap: Map[String, (Boolean, Boolean)] =
    Subscription.validated(spark).collect()
      .map(r => r.getString(0) ->
        (r.getBoolean(r.fieldIndex("table_known")), r.getBoolean(r.fieldIndex("routable"))))
      .toMap

  private def flagOf(r: Row): Int = r.getAs[Number]("flag").intValue

  test("wildcard flag parses to all-bits mask") {
    val r = parsedMap("s1")
    assert(flagOf(r) === 7)
    assert(r.getAs[Boolean]("valid"))
  }

  test("comma-combined change types OR their flags, unknown tokens ignored") {
    val r = parsedMap("s9") // insert,delete,bogus
    assert(flagOf(r) === 5)
    assert(r.getAs[Boolean]("valid"))
  }

  test("malformed filter op leaves the subscription live and unfiltered") {
    val r = parsedMap("s10") // k.gt.5 — gt is not a known op
    assert(r.getAs[String]("fop") === "")
    assert(r.getAs[String]("fcol") === "")
    assert(r.getAs[Boolean]("valid"))
  }

  test("filter value truncates at a further colon (reference split(':'))") {
    val r = parsedMap("s14") // k.eq.a:b — split(':') yields segment "k.eq.a"
    assert(r.getAs[String]("fop") === "eq")
    assert(r.getAs[String]("fval") === "a")
  }

  test("filter value keeps dots past the op separator") {
    val r = parsedMap("s11") // k.in.1.5,2.5
    assert(r.getAs[String]("fop") === "in")
    assert(r.getAs[String]("fval") === "1.5,2.5")
  }

  test("filter clause splits into col/op/val") {
    val r = parsedMap("s2")
    assert(r.getAs[String]("fcol") === "k")
    assert(r.getAs[String]("fop") === "eq")
    assert(r.getAs[String]("fval") === "42")
    assert(r.getAs[Boolean]("valid"))
  }

  test("unknown change flag invalidates the subscription") {
    assert(!parsedMap("s5").getAs[Boolean]("valid"))
  }

  test("unknown table is parse-valid but not routable") {
    val (known, routable) = validatedMap("s4")
    assert(!known && !routable)
    assert(parsedMap("s4").getAs[Boolean]("valid"))
  }

  test("bad flag on a known table is not routable") {
    val (known, routable) = validatedMap("s5")
    assert(known && !routable)
  }

  test("chunk-table subscription is routable (catalog lists chunks)") {
    val (known, routable) = validatedMap("s8")
    assert(known && routable)
  }
}
