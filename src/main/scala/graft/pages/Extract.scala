package graft.pages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure Catalyst extraction from raw page HTML.
  *
  * The per-row contract (BASELINE.json `input_hint`): extracted text must be
  * byte-identical for a given url across runs, partitionings, and cluster
  * sizes. Both functions here are pure builtin-expression pipelines
  * (whole-stage-codegen'd, no UDFs), so determinism is structural.
  */
object Extract {

  /** href capture pattern for outlink extraction. */
  val HrefPattern = "href=\"([^\"]+)\""

  /** Plain text of an HTML string: drop tags, collapse whitespace, trim.
    * Deliberately simple and total — the invariant is determinism, not
    * HTML fidelity. */
  def textOfHtmlString(html: Column): Column =
    trim(regexp_replace(regexp_replace(html, "<[^>]*>", " "), "\\s+", " "))

  /** Same, from the contractual `html BINARY` column (UTF-8). */
  def textOfHtml(htmlBinary: Column): Column =
    textOfHtmlString(decode(htmlBinary, "UTF-8"))

  /** All href targets of an HTML string, in document order. */
  def linksOfHtmlString(html: Column): Column =
    regexp_extract_all(html, lit(HrefPattern), lit(1))

  def linksOfHtml(htmlBinary: Column): Column =
    linksOfHtmlString(decode(htmlBinary, "UTF-8"))

  /** pages(url, html, ...) → one row per outlink: (src_url, dst_url).
    * Duplicate links on a page are preserved (GraphLoader keeps parallel
    * edges — reference spark-graphx 4.1.2 `GraphLoader.edgeListFile`,
    * FIXTURES.md §3.6); dedup is a separate, explicit op. */
  def outlinks(pages: DataFrame): DataFrame =
    pages.select(col("url").as("src_url"),
      explode(linksOfHtml(col("html"))).as("dst_url"))

  /** Re-derive the text column and compare with the stored one; returns
    * count of rows violating the byte-identical invariant (should be 0). */
  def textInvariantViolations(pages: DataFrame): Long =
    pages.filter(not(textOfHtml(col("html")) <=> col("text"))).count()
}
