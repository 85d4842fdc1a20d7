package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Common-Crawl-style web-page table: synthesis, deterministic text
  * extraction, and link extraction into an edge table.
  *
  * Input schema (BASELINE.json `input_hint`):
  * `pages(url: STRING, warc_ts: TIMESTAMP, html: BINARY, text: STRING, lang: STRING)`.
  *
  * Everything here is a pure function of (seed, i): the synthetic corpus is
  * byte-identical across runs and across parallelism levels, which is what
  * lets the end-to-end tests assert "text byte-identical per url" and lets
  * the benchmark run the same input at two parallelism levels. All hashing
  * uses Spark's built-in `xxhash64` (codegen'd, overflow-free), never a UDF.
  */
object Pages {

  val EpochBase = 1600000000L // 2020-09-13T12:26:40Z, arbitrary fixed crawl epoch

  /** Uniform (0, 1] double derived from a 64-bit hash column. */
  private def unit(h: org.apache.spark.sql.Column) =
    (shiftrightunsigned(h, 11) + lit(1L)).cast("double") / lit(9007199254740992.0) // 2^53

  /** Deterministic synthetic page corpus with a power-law out-degree link
    * structure (FIXTURES.md §A): out-degree d_i = min(maxDegree,
    * floor(u^(-1/alpha))) with alpha = 2.1, targets t_k = hash(i, k) mod n,
    * self-links dropped, duplicate links kept (exercises parallel-edge
    * aggregation). A few ids get hub-sized degree to exercise skew handling.
    *
    * Analogous to the reference's seeded random generator with POWER_LAW
    * distribution (reference: core/src/main/java/org/neo4j/gds/beta/generator/
    * RandomGraphGenerator.java:78-100, RelationshipDistribution.java:34-75).
    */
  def synth(spark: SparkSession, n: Long, seed: Long = 42L,
            hosts: Long = 100L, maxDegree: Int = 1000,
            hubCount: Int = 4, hubDegree: Int = 5000,
            density: Double = 1.0): DataFrame = {
    val i    = col("id")
    val url  = concat(lit("https://host-"), pmod(i, lit(hosts)).cast("string"),
                      lit(".example/p/"), i.cast("string"))
    val h    = xxhash64(lit(seed), i)
    // power-law out-degree (mean ~1.9·density links/page; density scales the
    // whole distribution for throughput benchmarking); first hubCount pages
    // are forced hubs (skew)
    val dRaw = floor(lit(density) * pow(unit(h), lit(-1.0 / 2.1))).cast("int")
    val deg  = when(i < lit(hubCount.toLong), lit(math.min(hubDegree, (n - 1).toInt)))
      .otherwise(least(dRaw, lit(maxDegree)))
    val targetId  = (k: org.apache.spark.sql.Column) => pmod(xxhash64(lit(seed), i, k), lit(n))
    val targetUrl = (t: org.apache.spark.sql.Column) =>
      concat(lit("https://host-"), pmod(t, lit(hosts)).cast("string"),
             lit(".example/p/"), t.cast("string"))
    val links = when(deg > 0,
        filter(transform(sequence(lit(0), deg - 1), k => targetId(k)), t => t =!= i))
      .otherwise(array().cast("array<bigint>"))
    val htmlStr = concat(
      lit("<html><head><title>page "), i.cast("string"), lit("</title></head><body>"),
      concat_ws("", transform(col("links"), t =>
        concat(lit("<a href=\""), targetUrl(t), lit("\">link "), t.cast("string"), lit("</a> ")))),
      lit("<p>body of page "), i.cast("string"), lit(" on host "),
      pmod(i, lit(hosts)).cast("string"), lit("</p></body></html>"))

    spark.range(n)
      .withColumn("links", links)
      .withColumn("url", url)
      .withColumn("warc_ts", timestamp_seconds(lit(EpochBase) + i))
      .withColumn("html_str", htmlStr)
      .withColumn("html", col("html_str").cast("binary"))
      .withColumn("text", extractText(col("html_str")))
      .withColumn("lang", lit("en"))
      .select("url", "warc_ts", "html", "text", "lang")
  }

  /** The edge table that `toGraph(synth(...))` produces, generated directly
    * from the link model without materializing html — bit-identical to the
    * extraction path (asserted in PagesSpec) and used for large benchmark
    * graphs where the html round-trip adds nothing. */
  def synthEdges(spark: SparkSession, n: Long, seed: Long = 42L,
                 hosts: Long = 100L, maxDegree: Int = 1000,
                 hubCount: Int = 4, hubDegree: Int = 5000,
                 density: Double = 1.0): DataFrame = {
    val i    = col("id")
    val h    = xxhash64(lit(seed), i)
    val dRaw = floor(lit(density) * pow(unit(h), lit(-1.0 / 2.1))).cast("int")
    val deg  = when(i < lit(hubCount.toLong), lit(math.min(hubDegree, (n - 1).toInt)))
      .otherwise(least(dRaw, lit(maxDegree)))
    val targetId = (k: org.apache.spark.sql.Column) => pmod(xxhash64(lit(seed), i, k), lit(n))
    val urlOf = (x: org.apache.spark.sql.Column) =>
      concat(lit("https://host-"), pmod(x, lit(hosts)).cast("string"),
             lit(".example/p/"), x.cast("string"))
    spark.range(n)
      .select(i, explode(when(deg > 0,
          filter(transform(sequence(lit(0), deg - 1), k => targetId(k)), t => t =!= i))
        .otherwise(array().cast("array<bigint>"))).as("t"))
      .select(xxhash64(urlOf(i)).as("src"), xxhash64(urlOf(col("t"))).as("dst"),
              lit(1.0).as("weight"))
  }

  /** Deterministic, locale/time-independent HTML→text extraction. Pure
    * column expression (whole-stage codegen, no UDF): strip tags, decode the
    * few entities we emit, collapse whitespace. MUST stay byte-stable across
    * versions — the north rule requires per-url byte-identical text. */
  def extractText(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noTags = regexp_replace(html, "<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      noTags, "&amp;", "&"), "&lt;", "<"), "&gt;", ">")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Lowercased host of a url: the authority component with userinfo and
    * port stripped; empty string when the url has no `scheme://` authority.
    * Pure single-match regexps (whole-stage codegen, and replayable
    * bit-identically by an ANSI-SQL oracle — every pattern can match at
    * most once, so Spark's replace-all and DuckDB's replace-first agree). */
  def hostOf(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val auth = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    lower(regexp_replace(regexp_replace(auth, "^[^@]*@", ""), ":[0-9]+$", ""))
  }

  /** Canonical form of an absolute url, the normalization a crawl dedup
    * keys on (cf. RFC 3986 §6.2.2-6.2.3 syntax-based normalization):
    * fragment stripped, scheme and authority lowercased, default port
    * (:80 http / :443 https) dropped, empty path replaced by "/".
    * Path/query case and encoding are preserved — they are significant.
    * Same single-match-regexp discipline as [[hostOf]]. */
  def canonicalizeUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth   = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val tail   = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val authNoPort =
      when(scheme === "http", regexp_replace(auth, ":80$", ""))
        .when(scheme === "https", regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    when(scheme === "", url) // not an absolute url: leave untouched
      .otherwise(concat(scheme, lit("://"), authNoPort,
        when(tail === "", lit("/")).otherwise(tail)))
  }

  /** Aggregate a page-level link table `(url, href)` into a host-level edge
    * table `(src_host, dst_host, weight, pages)`: weight = number of page
    * links between the host pair, pages = distinct linking pages. This is
    * the Common-Crawl "host graph" derivation (page graph -> host graph);
    * at 100 TB it is ONE map-side-combined groupBy whose key cardinality is
    * |hosts|^2-bounded (in practice ~linear in hosts), so the shuffle
    * carries host-pair partials, never page rows. */
  def hostGraph(links: DataFrame): DataFrame =
    links
      .select(hostOf(col("url")).as("src_host"),
              hostOf(col("href")).as("dst_host"),
              col("url"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "")
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("weight"),
           countDistinct(col("url")).as("pages"))

  /** All href values in raw html bytes, as an array column — THE link
    * extraction; batch (extractLinks/toGraph) and streaming
    * (StreamOps.linkEdgesStream) both go through here so they can never
    * diverge. */
  def hrefs(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(html.cast("string"), lit("href=\"([^\"]*)\""), lit(1))

  /** Extract outgoing hrefs from raw html bytes. Returns (url, href) rows. */
  def extractLinks(pages: DataFrame): DataFrame =
    pages.select(col("url"), explode(hrefs(col("html"))).as("href"))

  /** Extract anchor tags with their text from raw html bytes:
    * (url, href, anchor) per `<a href="...">text</a>` occurrence, anchor
    * whitespace-trimmed. Pure regexp expressions (the tag list per row,
    * then one capture per field) — codegen'd, no UDF, and simple enough
    * that Java and RE2 regex semantics agree. */
  def extractAnchors(pages: DataFrame): DataFrame =
    pages
      .select(col("url"), explode(regexp_extract_all(col("html").cast("string"),
        lit("<a href=\"[^\"]*\"[^>]*>[^<]*</a>"), lit(0))).as("__tag"))
      .select(col("url"),
        regexp_extract(col("__tag"), "<a href=\"([^\"]*)\"", 1).as("href"),
        trim(regexp_extract(col("__tag"), ">([^<]*)</a>", 1)).as("anchor"))

  /** Per-target anchor-text profile: for each linked url, each distinct
    * anchor string pointing at it with occurrence and distinct-source
    * counts — the classic link-graph relevance feature (anchor text
    * describes the TARGET page). One map-side-combined groupBy; shuffle
    * cardinality is |distinct (href, anchor)|, never page rows. */
  def anchorProfile(pages: DataFrame): DataFrame =
    extractAnchors(pages)
      .groupBy(col("href"), col("anchor"))
      .agg(count(lit(1)).as("n"), countDistinct(col("url")).as("pages"))

  /** Project a page table into a PropertyGraph: vertex id = xxhash64(url)
    * (stable 64-bit ids, no dense IdMap needed — Dataset joins key on the
    * original id space; the reference instead builds an IdMap,
    * core/src/main/java/org/neo4j/gds/core/loading/IdMap.java).
    * Edges carry weight = 1.0 per link occurrence.
    */
  def toGraph(pages: DataFrame): graft.core.PropertyGraph = {
    val vertices = pages.select(xxhash64(col("url")).as("id"), col("url"))
    val edges = extractLinks(pages)
      .select(xxhash64(col("url")).as("src"), xxhash64(col("href")).as("dst"),
              lit(1.0).as("weight"))
    graft.core.PropertyGraph(vertices, edges)
  }
}
