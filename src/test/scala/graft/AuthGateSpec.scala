package graft

import graft.cdc.Subscription

/** Connect-time auth gate semantics (reference src/api/ws_handler.rs:47-57,
  * src/api/auth.rs:126-224): admins bypass; non-admins need an eq filter on
  * an ownership column with an owned value; in-filters and non-ownership
  * columns are rejected. */
class AuthGateSpec extends SparkSpec {

  lazy val allowed: Set[String] =
    Subscription.authAllowed(spark).collect().map(_.getString(0)).toSet

  test("admin passes without any filter") {
    assert(allowed.contains("s1"))
  }

  test("non-admin with owned eq ownership filter passes") {
    assert(allowed.contains("s12")) // user_id.eq.7, owns 7
  }

  test("non-admin with unowned value is rejected") {
    assert(!allowed.contains("s13")) // user_id.eq.9, owns nothing
  }

  test("non-admin with in-filter is rejected even if values owned") {
    assert(!allowed.contains("s3")) // user_id.in.1,2,3 — Array value
  }

  test("non-admin filtering a non-ownership column is rejected") {
    assert(!allowed.contains("s2")) // k.eq.42
    assert(!allowed.contains("s6")) // event_id.eq.17
  }

  test("non-admin without any filter is rejected") {
    assert(!allowed.contains("s8"))
  }
}
