package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** A link graph prepared for iterative computation: the analog of the
  * reference's materialized `GraphImpl` (edge partitions + routing tables,
  * spark-graphx 4.1.2 `impl.GraphImpl`; SURVEY.md §3.1) — built once,
  * iterated many times.
  *
  * - `adjacency`: CSR-style per-source blocks (src, degree, dsts),
  *   hash-partitioned by src and cached. Joining per-vertex state against
  *   this (|V|-row ⋈ |V|-row, broadcast or shuffled-hash) then exploding
  *   replaces joining state against |E| edge rows — the same
  *   vertex-attrs-to-edge-partitions shipping GraphX's
  *   ReplicatedVertexView does, expressed relationally.
  * - `vertices`: distinct ids, hash-partitioned by id and cached; every
  *   per-vertex state Dataset inherits this partitioning so the
  *   final-aggregate → state-join exchange is reused.
  *
  * At rest (100 TB scale) the same layout is a bucketed/sorted-by-src
  * table, so preparation is a scan, not a shuffle.
  */
final class PreparedGraph private (
    val spark: SparkSession,
    val adjacency: DataFrame,
    val vertices: DataFrame,
    val numPartitions: Int,
    val numEdges: Long) {

  lazy val numVertices: Long = vertices.count()

  /** Flat (src, dst) view (parallel edges preserved). */
  def edges: DataFrame = adjacency.select(col("src"), explode(col("dsts")).as("dst"))

  @volatile private var revBuilt = false

  /** Reverse CSR blocks `(dst, in_degree, srcs)`, hash-partitioned by dst
    * and cached — the routing structure for src-recipient messaging
    * (`AggregateMessages` toSrc, `collectNeighborIds(In)`): joining
    * per-vertex state on dst and exploding `srcs` replaces an |E|-row
    * join, symmetric to the forward `adjacency`. Degree-capped like the
    * forward blocks — critical here: the reverse adjacency of a popular
    * page is the mega-hub case (10⁷–10⁸ sources). Built lazily on first
    * use; released by [[unpersist]]. */
  lazy val reverseAdjacency: DataFrame = {
    val r = PreparedGraph.cappedBlocks(edges, "dst", "src", "in_degree", "srcs",
        PreparedGraph.blockCap(spark))
      .repartition(numPartitions, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      r.count()
    } catch {
      // a failed build must not strand the persisted entry (revBuilt stays
      // false, so unpersist() would never reach it)
      case t: Throwable => r.unpersist(false); throw t
    }
    revBuilt = true
    r
  }

  def unpersist(): Unit = {
    adjacency.unpersist(false); vertices.unpersist(false)
    if (revBuilt) reverseAdjacency.unpersist(false)
  }
}

object PreparedGraph {

  /** Max neighbors one CSR block row may hold (conf
    * `spark.graft.adjacency.maxBlockArity`). At web scale a popular page's
    * reverse neighborhood is 10⁷–10⁸ ids — as ONE `collect_list` row that
    * is a multi-GB array a single task must aggregate and hold, and that
    * no AQE/salting can split (VERDICT r3 what's-wrong #1). Capping makes
    * hubs span multiple (key, chunk) rows whose AGGREGATION lands on
    * different reducers, bounding both the build and every downstream
    * explode's per-row footprint. */
  def blockCap(spark: SparkSession): Int =
    spark.conf.get("spark.graft.adjacency.maxBlockArity", "65536").toInt

  /** CSR blocks `(key, degName = TRUE total degree, listName)` with at
    * most ~`cap` neighbors per row. Vertices over the cap split into
    * `ceil(degree/cap)` hash-chunks — `chunk = xxhash64(nbr) mod nChunks`,
    * computed map-side, so one hub's chunks AGGREGATE on different
    * reducers (a windowed row_number would funnel the hub through one
    * task's sort first — the exact bottleneck being removed). Chunk sizes
    * are multinomial around cap (≤ ~2·cap w.h.p.); every chunk row carries
    * the true total degree, so consumers that explode + divide by degree
    * are unchanged. Fast path: when no vertex exceeds the cap (checked
    * with one cheap map-side-combined aggregate) the plan is the r3
    * single-shuffle groupBy — small graphs pay nothing.
    *
    * EAGER: the cap decision is a driver action at construction time, and
    * the returned plan references `e` once (fast path) or twice (capped) —
    * an expensive input must be cached (or cheaply re-derivable from a
    * cache, like the reverse-adjacency explode) before calling. Engine
    * call sites (PreparedGraph.apply, LPA) pre-persist; the PUBLIC
    * entry points guard themselves via [[Adjacency.materializedOnce]]
    * (ADVICE r4, re-raised r5 review). */
  private[graft] def cappedBlocks(e: DataFrame, key: String, nbr: String,
      degName: String, listName: String, cap: Int,
      sort: Boolean = false): DataFrame = {
    require(cap > 0, s"block cap must be positive, got $cap")
    def lst = {
      val l = collect_list(col(nbr))
      (if (sort) sort_array(l) else l).as(listName)
    }
    val deg = e.groupBy(key).agg(count(lit(1)).cast("long").as(degName))
    val maxDegRow = deg.agg(max(col(degName))).first()
    val maxDeg = if (maxDegRow.isNullAt(0)) 0L else maxDegRow.getLong(0)
    if (maxDeg <= cap)
      e.groupBy(key).agg(count(lit(1)).cast("long").as(degName), lst)
    else
      e.join(deg.hint("SHUFFLE_HASH"), key)
        .withColumn("__chunk", when(col(degName) <= cap, lit(0L))
          .otherwise(pmod(xxhash64(col(nbr)),
            ceil(col(degName).cast("double") / cap).cast("long"))))
        .groupBy(col(key), col("__chunk"))
        .agg(max(col(degName)).as(degName), lst)
        .select(col(key), col(degName), col(listName))
  }

  /** One-time preparation: two shuffles (adjacency groupBy, vertex
    * distinct), both cached — plus one cheap degree aggregate that
    * decides whether any hub needs block chunking (see [[cappedBlocks]]).
    * The input plan is materialized once up front so an expensive
    * upstream (generator, join, extraction) isn't re-executed per derived
    * structure. Partition count defaults to |E|-proportional
    * (AdaptivePartitions) so small graphs don't pay
    * shuffle.partitions-task stages every superstep. */
  def apply(edgesDf: DataFrame, numPartitions: Int = 0): PreparedGraph = {
    val spark = edgesDf.sparkSession
    // an already-cached input (e.g. a memoized edge frame) is read through
    // its own cache — persisting a second copy just to build from it costs
    // an extra materialization pass and duplicate storage
    val pre = edgesDf.storageLevel != StorageLevel.NONE
    val e = edgesDf.select(col("src"), col("dst"))
    if (!pre) e.persist(StorageLevel.MEMORY_AND_DISK)
    var adj: DataFrame = null
    var verts: DataFrame = null
    try {
      val edgeCount = e.count()
      val p = graft.runtime.AdaptivePartitions.forRows(spark, edgeCount, numPartitions)
      adj = cappedBlocks(e, "src", "dst", "degree", "dsts", blockCap(spark))
        .repartition(p, col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      verts = adj.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .distinct()
        .repartition(p, col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      adj.count(); verts.count()
      new PreparedGraph(spark, adj, verts, p, edgeCount)
    } catch {
      // a failed build must not strand persisted blocks: the PreparedGraph
      // was never constructed, so its unpersist() is unreachable
      case t: Throwable =>
        if (adj != null) adj.unpersist(false)
        if (verts != null) verts.unpersist(false)
        throw t
    } finally if (!pre) e.unpersist(false)
  }
}
