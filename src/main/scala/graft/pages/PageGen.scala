package graft.pages

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Common-Crawl-style page-table generator.
  *
  * Emits the contractual schema (BASELINE.json `input_hint`):
  * `url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING`.
  *
  * Every cell is a pure Catalyst-expression function of `(seed, page index)`,
  * so the same config regenerates byte-identical rows at any parallelism,
  * partition count, or cluster size — the property that lets correctness
  * fixtures generated at sf=tiny stand in for the 10^12-document target.
  *
  * Link structure mirrors GraphX `GraphGenerators.logNormalGraph`
  * (out-degree ~ logNormal(mu=4.0, sigma=1.3), cf. reference library
  * spark-graphx_2.13-4.1.2 `util.GraphGenerators`): hub skew on out-degree
  * by construction, plus a power-law target bias (`targetSkew`) that
  * concentrates in-links on low page ids so skew-handling code paths get
  * exercised even at small scale.
  */
object PageGen {

  /** @param numPages   number of pages (vertex count of the link graph)
    * @param seed       RNG seed; all columns derive from xxhash64(seed, ...)
    * @param mu,sigma   logNormal out-degree parameters (GraphX defaults)
    * @param maxOutDeg  hard cap on per-page outlinks
    * @param targetSkew link-target bias: target = floor(n * u^targetSkew);
    *                   1.0 = uniform, >1 concentrates on low ids (hubs)
    * @param numHosts   pages are spread over this many synthetic hosts
    */
  final case class Config(
      numPages: Long,
      seed: Long = 42L,
      mu: Double = 4.0,
      sigma: Double = 1.3,
      maxOutDeg: Int = 1000,
      targetSkew: Double = 2.0,
      numHosts: Int = 1000,
      numPartitions: Int = 0)

  private val words = Array(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "crawl", "index",
    "graph", "link", "page", "rank", "web", "spark", "scala", "data")

  /** Uniform double in (0,1) — the shared single-copy primitive
    * ([[graft.graph.HashRandom]]); determinism-critical, do not fork. */
  private def unif(seed: Long, salt: Int, cols: Column*): Column =
    graft.graph.HashRandom.unif(seed, salt, cols: _*)

  /** Canonical url of page `id` — same function for self urls and link
    * targets, so the dictionary closes over all urls in the corpus. */
  def urlOf(cfg: Config, id: Column): Column = {
    val host = pmod(xxhash64(lit(cfg.seed), lit(77), id), lit(cfg.numHosts.toLong))
    concat(lit("https://h"), host, lit(".example.com/p/"), id)
  }

  /** Out-degree of page `id`: the shared logNormal degree law
    * ([[graft.graph.HashRandom.logNormalDegree]] — Box–Muller on
    * hash-uniforms, clamped to [0, maxOutDeg]). */
  private def outDegOf(cfg: Config, id: Column): Column =
    graft.graph.HashRandom.logNormalDegree(
      cfg.seed, cfg.mu, cfg.sigma, cfg.maxOutDeg.toLong, id)

  /** Link target page id for (src page `id`, link slot `k`):
    * floor(n * u^skew) — power-law biased toward low ids. */
  private def targetOf(cfg: Config, id: Column, k: Column): Column = {
    val u = unif(cfg.seed, 3, id, k)
    least(lit(cfg.numPages - 1),
      floor(pow(u, lit(cfg.targetSkew)) * lit(cfg.numPages.toDouble)).cast("long"))
  }

  /** Target page ids of page `id` as an array column (one per link slot). */
  def targetIdsOf(cfg: Config, id: Column): Column = {
    val d = outDegOf(cfg, id)
    when(d > 0,
      transform(sequence(lit(0L), d - 1), k => targetOf(cfg, id, k)))
      .otherwise(array().cast("array<bigint>"))
  }

  /** The pages DataFrame. Columns: url, warc_ts, html (binary), text, lang
    * — plus generator-internal `page_id` (drop for the strict contract
    * schema via `.drop("page_id")`). `text` is byte-identical to
    * `Extract.textOfHtml(html)` by construction (tested). */
  def pages(spark: SparkSession, cfg: Config): DataFrame = {
    val base =
      if (cfg.numPartitions > 0) spark.range(0, cfg.numPages, 1, cfg.numPartitions)
      else spark.range(cfg.numPages)
    val id = col("id")

    val wordArr = array(words.toIndexedSeq.map(lit): _*)
    val nWords = (pmod(xxhash64(lit(cfg.seed), lit(4), id), lit(40L)) + 5L).cast("int")
    val bodyText = array_join(
      transform(sequence(lit(0), nWords - 1),
        w => element_at(wordArr, (pmod(xxhash64(lit(cfg.seed), lit(5), id, w), lit(words.length.toLong)) + 1).cast("int"))),
      " ")

    val anchors = array_join(
      transform(targetIdsOf(cfg, id), t =>
        concat(lit("<a href=\""), urlOf(cfg, t), lit("\">"),
          element_at(wordArr, (pmod(xxhash64(lit(cfg.seed), lit(6), id, t), lit(words.length.toLong)) + 1).cast("int")),
          lit("</a>"))),
      " ")

    val htmlStr = concat(
      lit("<html><head><title>p"), id, lit("</title></head><body><h1>Page "),
      id, lit("</h1><p>"), bodyText, lit("</p><div class=\"links\">"),
      anchors, lit("</div></body></html>"))

    val langU = unif(cfg.seed, 7, id)
    val lang = when(langU < 0.55, "en").when(langU < 0.70, "de")
      .when(langU < 0.82, "fr").when(langU < 0.92, "es").otherwise("it")

    // WARC-style capture timestamps across a 30-day window from 2026-01-01.
    val baseEpoch = 1767225600L
    val ts = timestamp_seconds(lit(baseEpoch) + pmod(xxhash64(lit(cfg.seed), lit(8), id), lit(30L * 86400L)))

    base.select(
      id.as("page_id"),
      urlOf(cfg, id).as("url"),
      ts.as("warc_ts"),
      encode(htmlStr, "UTF-8").as("html"),
      Extract.textOfHtmlString(htmlStr).as("text"),
      lang.as("lang"))
  }

  /** Persist a page table through the TableIO seam — the at-rest form the
    * north star ingests (parquet locally, Iceberg on a lakehouse). */
  def write(pages: DataFrame, ref: String): Unit =
    graft.sources.TableIO.forSession(pages.sparkSession).write(pages, ref)

  def read(spark: SparkSession, ref: String): DataFrame =
    graft.sources.TableIO.forSession(spark).read(spark, ref)
}
