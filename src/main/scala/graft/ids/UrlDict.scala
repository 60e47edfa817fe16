package graft.ids

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Catalyst-native url → vertex-id dictionary encoding.
  *
  * Primary encoding is `xxhash64(url)` (a single codegen'd expression —
  * no shuffle, no global state, stable across cluster sizes), per the
  * north-star's "Catalyst-native hashing/dictionary-encoding pass". At
  * 10^12 urls the 64-bit birthday bound gives ~2.7e-2 expected collisions
  * per 10^12 keys^2/2^65 — still audited explicitly: `auditCollisions`
  * is a cheap groupBy that MUST be run (and fail loudly) before trusting
  * an encoded edge table.
  *
  * `denseIds` is the optional compaction pass (ids 0..n-1 by url order)
  * for CSR-style adjacency where id density matters; it costs a global
  * sort and is meant for bounded vertex sets, not the full crawl.
  */
object UrlDict {

  def idOf(url: Column): Column = xxhash64(url)

  /** Distinct (id, url) dictionary from any url column. */
  def dict(urls: DataFrame, urlCol: String = "url"): DataFrame =
    urls.select(col(urlCol).as("url")).distinct()
      .select(idOf(col("url")).as("id"), col("url"))

  /** Number of hash-colliding ids (distinct urls sharing an id). 0 expected. */
  def collisionCount(dict: DataFrame): Long =
    dict.groupBy("id").agg(countDistinct("url").as("n"))
      .filter(col("n") > 1).count()

  /** Fail loudly on any collision — run once per corpus build. */
  def auditCollisions(dict: DataFrame): Unit = {
    val c = collisionCount(dict)
    require(c == 0L, s"xxhash64 url-id collisions detected: $c ids affected")
  }

  /** Dense re-map: (id 0..n-1 by url sort order, url). Global sort —
    * use only when a compact id space is worth one pass. */
  def denseDict(urls: DataFrame, urlCol: String = "url"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    urls.select(col(urlCol).as("url")).distinct()
      .withColumn("id", row_number().over(Window.orderBy("url")).cast("long") - 1)
      .select("id", "url")
  }
}
