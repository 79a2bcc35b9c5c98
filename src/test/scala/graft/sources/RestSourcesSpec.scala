package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import RestSources._

/** Retry/backoff and pagination semantics with injected fakes —
  * the 429 loop of `scripts/probe_news_api.py:89-109` and the
  * next_url / short-page loops of `ingestion/massive_api.py:66-82`
  * and `ingestion/finlight_api.py:96-118`.
  */
class RestSourcesSpec extends AnyFunSuite {

  test("429 retries with exponential backoff, then succeeds") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val fetch: Fetch = _ => {
      calls += 1
      if (calls <= 2) Response(429, "rate limited") else Response(200, "ok")
    }
    val r = fetchWithRetry(fetch, Request("u"), maxRetries = 3,
      backoffMs = 100, sleep = sleeps.append)
    assert(r.status == 200 && calls == 3)
    assert(sleeps.toSeq == Seq(100L, 200L))     // 1x, 2x
  }

  test("gives up after maxRetries and surfaces the last status") {
    var calls = 0
    val fetch: Fetch = _ => { calls += 1; Response(503, "down") }
    val r = fetchWithRetry(fetch, Request("u"), maxRetries = 2,
      backoffMs = 1, sleep = _ => ())
    assert(r.status == 503 && calls == 3)       // initial + 2 retries
  }

  test("4xx other than 429 is not retried") {
    var calls = 0
    val fetch: Fetch = _ => { calls += 1; Response(401, "no") }
    val r = fetchWithRetry(fetch, Request("u"), sleep = _ => ())
    assert(r.status == 401 && calls == 1)
  }

  test("next_url pagination follows the chain and stops at the end") {
    val pages = Map(
      "u0" -> """{"results":[1],"next_url":"u1"}""",
      "u1" -> """{"results":[2],"next_url":"u2"}""",
      "u2" -> """{"results":[3]}""")
    val fetch: Fetch = req => Response(200, pages(req.url))
    val got = fetchPaginated(fetch, "u0", sleep = _ => ())
    assert(got == Seq(pages("u0"), pages("u1"), pages("u2")))
  }

  test("pagination failing mid-chain after retries throws") {
    val fetch: Fetch = req =>
      if (req.url == "u0") Response(200, """{"next_url":"u1"}""")
      else Response(500, "boom")
    val e = intercept[java.io.IOException] {
      fetchPaginated(fetch, "u0", sleep = _ => ())
    }
    assert(e.getMessage.contains("u1"))
  }

  test("POST page loop stops on a short page (and on an empty one)") {
    def art(i: Int) = s"""{"link":"l$i"}"""
    val bodies = Map(
      1 -> s"""{"articles":[${art(1)},${art(2)}]}""",   // full (pageSize 2)
      2 -> s"""{"articles":[${art(3)}]}""")             // short → stop
    val fetch: Fetch = req => {
      val pg = "\"page\":(\\d+)".r.findFirstMatchIn(req.body).get.group(1).toInt
      Response(200, bodies.getOrElse(pg, """{"articles":[]}"""))
    }
    val got = fetchPostPages(fetch, "u", "\"q\"", pageSize = 2, sleep = _ => ())
    assert(got.size == 2)

    // exactly-full final page: the loop must fetch one extra empty page
    val full = Map(1 -> s"""{"articles":[${art(1)},${art(2)}]}""")
    val fetch2: Fetch = req => {
      val pg = "\"page\":(\\d+)".r.findFirstMatchIn(req.body).get.group(1).toInt
      Response(200, full.getOrElse(pg, """{"articles":[]}"""))
    }
    val got2 = fetchPostPages(fetch2, "u", "\"q\"", pageSize = 2, sleep = _ => ())
    assert(got2.size == 2 && got2.last == """{"articles":[]}""")
  }
}
