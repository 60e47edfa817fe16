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
    * join, symmetric to the forward `adjacency`. Built lazily on first
    * use (one groupBy over the cached forward blocks); released by
    * [[unpersist]]. */
  lazy val reverseAdjacency: DataFrame = {
    val r = edges.groupBy(col("dst"))
      .agg(count(lit(1)).cast("long").as("in_degree"), collect_list(col("src")).as("srcs"))
      .repartition(numPartitions, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    r.count()
    revBuilt = true
    r
  }

  def unpersist(): Unit = {
    adjacency.unpersist(false); vertices.unpersist(false)
    if (revBuilt) reverseAdjacency.unpersist(false)
  }
}

object PreparedGraph {

  /** One-time preparation: two shuffles (adjacency groupBy, vertex
    * distinct), both cached. The input plan is materialized once up front
    * so an expensive upstream (generator, join, extraction) isn't
    * re-executed per derived structure. Partition count defaults to
    * |E|-proportional (AdaptivePartitions) so small graphs don't pay
    * shuffle.partitions-task stages every superstep. */
  def apply(edgesDf: DataFrame, numPartitions: Int = 0): PreparedGraph = {
    val spark = edgesDf.sparkSession
    val e = edgesDf.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = e.count()
    val p = graft.runtime.AdaptivePartitions.forRows(spark, edgeCount, numPartitions)
    val adj = e.groupBy("src")
      .agg(count(lit(1)).cast("long").as("degree"), collect_list(col("dst")).as("dsts"))
      .repartition(p, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = adj.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .repartition(p, col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count(); verts.count()
    e.unpersist(false)
    new PreparedGraph(spark, adj, verts, p, edgeCount)
  }
}
