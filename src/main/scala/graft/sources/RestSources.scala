package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REST batch sources (S8–S10): the reference's driver-side ingestion
  * clients re-expressed for Spark.
  *
  *  - S8 Massive/Polygon news: GET with ticker + date-range params,
  *    `next_url` pagination, 429 retry with backoff
  *    (`ingestion/massive_api.py:25-90`, retry loop
  *    `scripts/probe_news_api.py:89-109`, yearly batching
  *    `scripts/02_fetch_news.py:23-40,90-104`).
  *  - S9 Finlight news: POST JSON body, page loop until a short page
  *    (`ingestion/finlight_api.py:28-123`).
  *  - S10 OHLCV daily bars, yfinance CSV shape
  *    (`scripts/01_fetch_prices.py:23-30`).
  *
  * Architecture: the HTTP exchange is driver-side by nature (paged,
  * stateful, rate-limited — exactly as in the reference), so it is
  * abstracted behind an injectable [[Fetch]] function; the fetched
  * page bodies then enter Spark as a Dataset of raw JSON/CSV strings
  * and ALL parsing runs distributed via `from_json`/`from_csv` with
  * explicit schemas (no driver-side JSON decoding, no schema
  * inference). This container has no egress, so production `Fetch`
  * impls are not constructable here; specs and the driver-gated
  * roundtrip queries inject deterministic fakes — the pagination,
  * retry, and parse layers under test are the real ones.
  */
object RestSources {

  final case class Request(url: String, method: String = "GET",
                           body: String = "")
  final case class Response(status: Int, body: String)

  /** The injectable HTTP seam. */
  type Fetch = Request => Response

  /** Retry-with-backoff around one exchange: retries 429 and 5xx with
    * exponential backoff (probe_news_api.py:89-109 semantics); other
    * statuses return immediately. `sleep` injectable for tests. */
  def fetchWithRetry(fetch: Fetch, req: Request, maxRetries: Int = 3,
                     backoffMs: Long = 1000,
                     sleep: Long => Unit = Thread.sleep): Response = {
    var attempt = 0
    var resp = fetch(req)
    while (attempt < maxRetries &&
           (resp.status == 429 || resp.status >= 500)) {
      sleep(backoffMs << attempt)          // 1x, 2x, 4x, ...
      attempt += 1
      resp = fetch(req)
    }
    resp
  }

  /** Follow `next_url` pagination until absent (massive_api.py:66-82),
    * returning the raw page bodies. Retries each page. */
  def fetchPaginated(fetch: Fetch, firstUrl: String,
                     maxPages: Int = 1000,
                     sleep: Long => Unit = Thread.sleep): Seq[String] = {
    val pages = scala.collection.mutable.ArrayBuffer.empty[String]
    var url: Option[String] = Some(firstUrl)
    while (url.isDefined && pages.size < maxPages) {
      val resp = fetchWithRetry(fetch, Request(url.get), sleep = sleep)
      if (resp.status != 200)
        throw new java.io.IOException(
          s"GET ${url.get} failed after retries: HTTP ${resp.status}")
      pages += resp.body
      // next_url is a top-level string field of the envelope; pull it
      // without materializing the whole page on the driver.
      url = nextUrlOf(resp.body)
    }
    pages.toSeq
  }

  private[sources] def nextUrlOf(body: String): Option[String] = {
    val m = "\"next_url\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(body)
    m.map(_.group(1))
  }

  /** POST page loop until a short page (finlight_api.py:96-118). */
  def fetchPostPages(fetch: Fetch, url: String, queryJson: String,
                     pageSize: Int, maxPages: Int = 1000,
                     sleep: Long => Unit = Thread.sleep): Seq[String] = {
    val pages = scala.collection.mutable.ArrayBuffer.empty[String]
    var page = 1
    var short = false
    while (!short && pages.size < maxPages) {
      val body =
        s"""{"query":$queryJson,"pageSize":$pageSize,"page":$page}"""
      val resp = fetchWithRetry(fetch, Request(url, "POST", body),
        sleep = sleep)
      if (resp.status != 200)
        throw new java.io.IOException(
          s"POST $url page $page failed after retries: HTTP ${resp.status}")
      pages += resp.body
      // a short page (fewer articles than pageSize) ends the loop
      val n = "\"link\"".r.findAllIn(resp.body).length
      short = n < pageSize
      page += 1
    }
    pages.toSeq
  }

  // ---- S8: Massive/Polygon news envelope --------------------------------

  /** The one genuinely nested schema of the reference (SURVEY §1.1):
    * publisher struct + tickers/keywords string arrays. */
  val massiveArticleSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("publisher", StructType(Seq(
      StructField("name", StringType),
      StructField("homepage_url", StringType)))),
    StructField("title", StringType),
    StructField("author", StringType),
    StructField("published_utc", StringType),
    StructField("article_url", StringType),
    StructField("tickers", ArrayType(StringType)),
    StructField("description", StringType),
    StructField("keywords", ArrayType(StringType)),
    StructField("ticker_queried", StringType)))

  private val massiveEnvelopeSchema: StructType = StructType(Seq(
    StructField("results", ArrayType(massiveArticleSchema)),
    StructField("next_url", StringType)))

  /** Fetch all pages for one (ticker, window) query and parse them
    * distributed: pages → Dataset[String] → from_json → explode. */
  def massiveNews(spark: SparkSession, fetch: Fetch, firstUrl: String,
                  sleep: Long => Unit = Thread.sleep): DataFrame = {
    import spark.implicits._
    val pages = fetchPaginated(fetch, firstUrl, sleep = sleep)
    spark.createDataset(pages)
      .select(from_json(col("value"), massiveEnvelopeSchema).as("env"))
      .select(explode(col("env.results")).as("a"))
      .select(col("a.*"))
  }

  // ---- S9: Finlight news envelope ---------------------------------------

  val finlightArticleSchema: StructType = StructType(Seq(
    StructField("link", StringType),
    StructField("source", StringType),
    StructField("title", StringType),
    StructField("summary", StringType),
    StructField("publishDate", StringType),
    StructField("language", StringType),
    StructField("images", ArrayType(StringType))))

  private val finlightEnvelopeSchema: StructType = StructType(Seq(
    StructField("status", StringType),
    StructField("articles", ArrayType(finlightArticleSchema))))

  def finlightNews(spark: SparkSession, fetch: Fetch, url: String,
                   queryJson: String, pageSize: Int,
                   sleep: Long => Unit = Thread.sleep): DataFrame = {
    import spark.implicits._
    val pages = fetchPostPages(fetch, url, queryJson, pageSize,
      sleep = sleep)
    spark.createDataset(pages)
      .select(from_json(col("value"), finlightEnvelopeSchema).as("env"))
      .select(explode(col("env.articles")).as("a"))
      .select(col("a.*"))
  }

  // ---- S10: OHLCV daily bars (yfinance CSV shape) -----------------------

  val ohlcvSchema: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType),
    StructField("ticker", StringType)))

  /** Parse CSV lines (header dropped by the schema'd reader) into the
    * per-ticker daily-bar frame of `scripts/01_fetch_prices.py:23-29`. */
  def ohlcvFromCsv(spark: SparkSession, csvLines: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.createDataset(csvLines)
      .select(from_csv(col("value"),
        ohlcvSchema, Map("dateFormat" -> "yyyy-MM-dd")).as("r"))
      .select(col("r.*"))
      .filter(col("date").isNotNull)   // drops the header line
  }
}
