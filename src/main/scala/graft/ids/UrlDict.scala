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

  /** Dense re-map: (id 0..n-1 by url sort order, url).
    *
    * Two-phase distributed rank — NOT `row_number` over an unpartitioned
    * window (which executes as one task holding the whole dictionary):
    * range-repartition by url, sort within partitions, take the local
    * index from `monotonically_increasing_id` (partition id in the high
    * bits), then add per-partition offsets (a driver-side cumsum over the
    * tiny partition-count table). The result is the global url rank and is
    * independent of where the sampled range boundaries land. */
  def denseDict(urls: DataFrame, urlCol: String = "url",
      numPartitions: Int = 0): DataFrame = {
    val spark = urls.sparkSession
    val d = urls.select(col(urlCol).as("url")).distinct()
    val p = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val local = d.repartitionByRange(p, col("url"))
      .sortWithinPartitions("url")
      .select(col("url"), monotonically_increasing_id().as("mid"))
      .select(col("url"),
        shiftright(col("mid"), 33).as("pid"),
        col("mid").bitwiseAND((1L << 33) - 1).as("idx"))
      .localCheckpoint(true) // counted once, ranked once — never recomputed
    val counts = local.groupBy("pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // cumulative start offset per partition id (driver-side: one row per
    // partition, never per url)
    val offsets = {
      var acc = 0L
      counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    }
    val offsetDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "off")
    val out = local.join(broadcast(offsetDf), Seq("pid"))
      .select((col("off") + col("idx")).as("id"), col("url"))
      .localCheckpoint(true) // caller owns the result blocks
    graft.runtime.IterationHygiene.releaseLocal(local)
    out
  }
}
