package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the weak per-session memo store (Sessions.sessionMemo,
  * r13 — VERDICT r12 What's-wrong #3): within a session, hits return
  * the identical instance and compute runs once; a FRESH session
  * recomputes; and a dropped session's entries do not pin memory —
  * once the session object is unreachable its whole memo map is
  * collectable (the old identity-hash global map kept every stopped
  * session's centroid models alive for the life of the JVM, and a
  * reused identity hash could alias a stale entry).
  */
class SessionMemoSpec extends AnyFunSuite with SparkFixture {

  test("same session: one compute, identical instance on every hit") {
    var computes = 0
    def get(): AnyRef =
      Sessions.sessionMemo(spark, ("memo-spec", "same-session")) {
        computes += 1; new Array[Long](4)
      }
    val a = get()
    val b = get()
    assert(a eq b, "memo hit must return the identical instance")
    assert(computes === 1)
  }

  test("a fresh session recomputes (invalidation granularity)") {
    var computes = 0
    def get(s: org.apache.spark.sql.SparkSession): AnyRef =
      Sessions.sessionMemo(s, ("memo-spec", "fresh-session")) {
        computes += 1; new Array[Long](4)
      }
    val first = get(spark)
    // newSession shares the SparkContext but is a distinct session
    // object — the library's cache-invalidation boundary
    val fresh = spark.newSession()
    val second = get(fresh)
    assert(computes === 2, "a fresh session must re-run the compute")
    assert(!(first eq second))
  }

  test("a dropped session's memo entries are collectable") {
    // track the throwaway session AND its memo payload with weak refs
    // (not the global live count, which parallel suites perturb);
    // scope them in a method so no local slot in THIS frame keeps the
    // session reachable after the call returns
    var sessionRef: java.lang.ref.WeakReference[AnyRef] = null
    var payloadRef: java.lang.ref.WeakReference[AnyRef] = null
    def populate(): Unit = {
      val s = spark.newSession()
      val payload = Sessions.sessionMemo(s, ("memo-spec", "collectable")) {
        new Array[Long](1024)
      }
      sessionRef = new java.lang.ref.WeakReference(s)
      payloadRef = new java.lang.ref.WeakReference(payload)
    }
    populate()
    // weak keys: once the session object is unreachable, GC may clear
    // the entry at any time; poll with explicit GCs (bounded)
    var tries = 0
    while ((sessionRef.get != null || payloadRef.get != null) && tries < 50) {
      System.gc()
      Thread.sleep(50)
      // size() expunges cleared entries, releasing the VALUE map too
      Sessions.liveMemoSessionCount
      tries += 1
    }
    assert(sessionRef.get == null,
      "a dropped session must be collectable despite its memo entries")
    assert(payloadRef.get == null,
      "a collected session's memo payloads must be collectable with it")
  }
}
