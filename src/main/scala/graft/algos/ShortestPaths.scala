package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.runtime.IterationHygiene

/** Landmark BFS hop counts (reference: spark-graphx 4.1.2
  * `lib.ShortestPaths` — vertex attr `Map[landmark -> dist]`, edges
  * traversed AGAINST their direction: a vertex's distance is to landmarks
  * reachable FORWARD along edges; messages flow dst → src).
  *
  * Long format here instead of the reference's map attr: one row per
  * (vertex, landmark) with the hop distance — relational form that joins
  * and aggregates without MapType gymnastics; `toMapFormat` converts.
  *
  * Each round: frontier ⋈ edges on dst (messages to src), min-aggregate,
  * anti-join against known distances to keep only improvements —
  * O(diameter) rounds, per-round volume shrinks with the frontier.
  */
object ShortestPaths {

  /** (id, landmark, distance) for every vertex that reaches a landmark. */
  def run(edges: DataFrame, landmarks: Seq[Long], maxIter: Int = 100): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    val verts = graft.graph.EdgeOps.vertices(e)

    // dist 0: each landmark to itself (restricted to existing vertices)
    var dists = verts.filter(col("id").isInCollection(landmarks))
      .select(col("id"), col("id").as("landmark"), lit(0).as("distance"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    dists.count()
    var frontier = dists
    var releaseFrontier: () => Unit = () => ()
    var releaseDists: () => Unit = () => ()
    var round = 0
    while (round < maxIter && !frontier.isEmpty) {
      round += 1
      // propagate dst's distances to src (reference direction)
      val candidates = e.join(frontier.hint("SHUFFLE_HASH"), e("dst") === frontier("id"))
        .select(e("src").as("id"), col("landmark"), (col("distance") + 1).as("distance"))
        .groupBy("id", "landmark").agg(min("distance").as("distance"))
      // keep only first-time (id, landmark) discoveries — BFS minimality.
      // Truncate plan+lineage every round (the union chain would otherwise
      // grow both; see runtime.StateRotator docs).
      val (improved, relF) = IterationHygiene.truncate(
        candidates.join(dists.select(col("id"), col("landmark")),
          Seq("id", "landmark"), "left_anti"))
      releaseFrontier()
      frontier = improved; releaseFrontier = relF
      if (!frontier.isEmpty) {
        val (merged, relD) = IterationHygiene.truncate(dists.union(frontier))
        dists.unpersist(false); releaseDists()
        dists = merged; releaseDists = relD
      }
    }
    e.unpersist(false); releaseFrontier()
    dists
  }

  /** Reference-shaped output: (id, map<landmark, distance>), rows only for
    * vertices with ≥1 reachable landmark (as the reference's run + filter). */
  def toMapFormat(dists: DataFrame): DataFrame =
    dists.groupBy("id")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("landmark"), col("distance"))))).as("distances"))
}
