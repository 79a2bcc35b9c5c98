package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Driver-gated roundtrip queries for the REST sources (S8–S10).
  *
  * No egress exists in this container, so each query SERVES the API
  * envelope itself: harness-table rows are rendered into the exact
  * wire shape the reference's APIs return (Massive `results[] +
  * next_url` pages, Finlight `articles[]` POST pages, yfinance CSV),
  * handed to the source through an injected in-memory `Fetch`, and
  * the parsed output is compared against a DuckDB oracle over the
  * original parquet — an end-to-end check of pagination, retry
  * plumbing, and the distributed `from_json`/`from_csv` parse.
  *
  * The page sets are bounded (≤ a few hundred rows) and collected on
  * the driver — faithful to the reference, where REST ingestion is
  * inherently a driver-side, rate-limited page loop
  * (`scripts/02_fetch_news.py:90-104`); everything downstream of the
  * raw page strings runs distributed.
  */
object SourceQueries {

  private val PageSize = 50

  // ---- S8: Massive/Polygon news ----------------------------------------

  /** Render documents (doc_id < 200) as 4 Massive envelope pages
    * chained by next_url. */
  private def massivePages(s: SparkSession, d: String): Map[String, String] = {
    def url(pg: Int) = s"https://api.example.com/v2/news?page=$pg"
    val art = Tables.documents(s, d).filter(col("doc_id") < 200)
      .select((col("doc_id") / PageSize).cast("int").as("pg"),
        struct(
          concat(lit("doc-"), col("doc_id")).as("id"),
          struct(col("source").as("name"),
            concat(lit("https://"), col("source"), lit(".example.com"))
              .as("homepage_url")).as("publisher"),
          substring(col("text"), 1, 40).as("title"),
          col("lang").as("author"),
          concat(lit("2024-01-01T00:00:"),
            lpad((col("doc_id") % 60).cast("string"), 2, "0"), lit("Z"))
            .as("published_utc"),
          concat(lit("https://news.example.com/"), col("doc_id"))
            .as("article_url"),
          array(upper(col("source")), col("lang")).as("tickers"),
          substring(col("text"), 1, 80).as("description"),
          split(substring(col("text"), 1, 20), " ").as("keywords"),
          upper(col("source")).as("ticker_queried")).as("a"))
    val lastPg = 200 / PageSize - 1
    art
      .withColumn("key", col("a.id"))
      .groupBy("pg")
      .agg(sort_array(collect_list(struct(col("key"), col("a")))).as("aa"))
      .select(col("pg"),
        to_json(struct(
          transform(col("aa"), x => x.getField("a")).as("results"),
          when(col("pg") < lastPg,
            concat(lit("https://api.example.com/v2/news?page="),
              col("pg") + 1)).as("next_url"))).as("body"))
      .collect()
      .map(r => url(r.getInt(0)) -> r.getString(1))
      .toMap
  }

  // ---- S9: Finlight news ------------------------------------------------

  /** Render documents (doc_id < 500 — a fixed bound like s8's, so the
    * driver-side page map never grows with the corpus) as Finlight
    * POST pages. 500 is a multiple of PageSize: every page is exactly
    * full, so the loop must terminate on the trailing empty page. */
  private def finlightPages(s: SparkSession, d: String): Map[Int, String] = {
    Tables.documents(s, d).filter(col("doc_id") < 500)
      .select((col("doc_id") / PageSize).cast("int").as("pg"),
        struct(
          concat(lit("https://example.com/a/"), col("doc_id")).as("link"),
          col("source").as("source"),
          substring(col("text"), 1, 40).as("title"),
          substring(col("text"), 1, 80).as("summary"),
          concat(lit("2024-02-0"), (col("doc_id") % 9) + 1).as("publishDate"),
          col("lang").as("language"),
          array().cast("array<string>").as("images")).as("a"))
      .withColumn("key", col("a.link"))
      .groupBy("pg")
      .agg(sort_array(collect_list(struct(col("key"), col("a")))).as("aa"))
      .select(col("pg"),
        to_json(struct(lit("ok").as("status"),
          transform(col("aa"), x => x.getField("a")).as("articles")))
          .as("body"))
      .collect()
      .map(r => (r.getInt(0) + 1) -> r.getString(1))   // pages are 1-based
      .toMap
  }

  private val EmptyFinlightPage = """{"status":"ok","articles":[]}"""

  // ---- S10: OHLCV CSV ----------------------------------------------------

  /** Per-(synthetic ticker, day) OHLCV bars from events; open/close by
    * event_id (unique → deterministic), rendered as yfinance CSV. */
  private def ohlcvCsvLines(s: SparkSession, d: String): Seq[String] = {
    val header = "date,open,high,low,close,volume,ticker"
    val lines = Tables.events(s, d)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        count(lit(1)).as("volume"))
      .select(concat_ws(",",
        date_format(col("day"), "yyyy-MM-dd"),
        // cast-to-string is shortest-roundtrip: the parsed doubles are
        // bit-identical to the originals, so the oracle can compute
        // from parquet directly with no rounding grid in between.
        col("open").cast("string"), col("high").cast("string"),
        col("low").cast("string"), col("close").cast("string"),
        col("volume").cast("string"),
        concat(lit("T"), col("user_id"))).as("line"))
      .collect().map(_.getString(0)).toSeq
    header +: lines
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S8: next_url pagination + nested-schema parse, end to end.
    "s8_massive_source" -> ((s, d) => {
      val pages = massivePages(s, d)
      val fetch: RestSources.Fetch = req =>
        pages.get(req.url)
          .map(RestSources.Response(200, _))
          .getOrElse(RestSources.Response(404, ""))
      RestSources.massiveNews(s, fetch,
          "https://api.example.com/v2/news?page=0", sleep = _ => ())
        .select(col("id"), col("publisher.name").as("publisher_name"),
          col("title"), col("author"), col("published_utc"),
          col("article_url"), element_at(col("tickers"), 1).as("ticker0"),
          size(col("keywords")).cast("long").as("n_keywords"),
          col("ticker_queried"))
        .orderBy("id")
    }),

    // S9: POST page loop (full pages → must stop on the empty page).
    "s9_finlight_source" -> ((s, d) => {
      val pages = finlightPages(s, d)
      val fetch: RestSources.Fetch = req => {
        val pg = "\"page\":(\\d+)".r.findFirstMatchIn(req.body)
          .map(_.group(1).toInt).getOrElse(-1)
        RestSources.Response(200, pages.getOrElse(pg, EmptyFinlightPage))
      }
      RestSources.finlightNews(s, fetch, "https://api.finlight.example/v2",
          "\"*\"", PageSize, sleep = _ => ())
        .select(col("link"), col("source"), col("title"), col("summary"),
          col("language"))
        .orderBy("link")
    }),

    // S10: yfinance-shaped CSV parse with an explicit schema.
    "s10_ohlcv_source" -> ((s, d) =>
      RestSources.ohlcvFromCsv(s, ohlcvCsvLines(s, d))
        .orderBy("ticker", "date"))
  )

  val oracles: Map[String, String] = Map(
    "s8_massive_source" ->
      """SELECT 'doc-' || doc_id AS id, source AS publisher_name,
                substring(text, 1, 40) AS title, lang AS author,
                '2024-01-01T00:00:' ||
                  lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || 'Z'
                  AS published_utc,
                'https://news.example.com/' || doc_id AS article_url,
                upper(source) AS ticker0,
                CAST(len(string_split(substring(text, 1, 20), ' '))
                     AS BIGINT) AS n_keywords,
                upper(source) AS ticker_queried
         FROM documents WHERE doc_id < 200 ORDER BY id""",
    "s9_finlight_source" ->
      """SELECT 'https://example.com/a/' || doc_id AS link, source,
                substring(text, 1, 40) AS title,
                substring(text, 1, 80) AS summary,
                lang AS language
         FROM documents WHERE doc_id < 500 ORDER BY link""",
    "s10_ohlcv_source" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS date,
                arg_min(value, event_id) AS open,
                max(value) AS high, min(value) AS low,
                arg_max(value, event_id) AS close,
                count(*) AS volume,
                'T' || user_id AS ticker
         FROM events GROUP BY 1, 7 ORDER BY ticker, date"""
  )
}
