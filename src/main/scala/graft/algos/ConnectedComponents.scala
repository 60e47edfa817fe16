package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.EdgeOps
import graft.runtime.{CheckpointConfig, Checkpoints, StateRotator}

/** Connected components via alternating small-star / large-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14 — the algorithm the north rule mandates; also what GraphFrames'
  * DataFrame CC uses). Output labels match the reference
  * (spark-graphx 4.1.2 `lib.ConnectedComponents`, FIXTURES.md §3.4)
  * exactly: every vertex labeled with the minimum vertex id reachable in
  * the undirected graph.
  *
  * Each round is two join+aggregate rewrites of the EDGE set (not |V|
  * messages over Pregel supersteps), converging in O(log n) rounds
  * regardless of component diameter — the property that makes it the
  * right choice for web-scale graphs where chains of redirects create
  * high-diameter components that would cost diameter-many Pregel rounds.
  *
  * large-star: for each u, hang every neighbor v > u onto
  *             m(u) = min(Γ(u) ∪ {u});
  * small-star: edges are oriented big→small after large-star; for each u,
  *             hang u and all its (smaller) neighbors onto min.
  * Fixed point: the edge set is a forest of stars rooted at component
  * minima.
  */
object ConnectedComponents {

  final case class Config(
      numPartitions: Int = 0,
      maxRounds: Int = 100,
      checkpoint: Option[CheckpointConfig] = None)

  /** (id, component) for every vertex appearing in `edges`. */
  def run(edges: DataFrame, cfg: Config = Config()): DataFrame = {
    val spark = edges.sparkSession
    val allVerts = EdgeOps.vertices(edges).persist(StorageLevel.MEMORY_AND_DISK)

    // start from the canonical simple undirected form, oriented big→small
    val rotator = new StateRotator(cfg.checkpoint, "cc")
    var e = rotator.rotate(
      edges.filter(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .distinct(),
      superstep = 0)

    // fixed point iff the (set-valued) edge set is unchanged between
    // rounds; both sides are distinct sets → compare (count, xor-checksum)
    var sigPrev = edgeSetSignature(e)
    var round = 0
    var converged = sigPrev._1 == 0L
    while (!converged && round < cfg.maxRounds) {
      round += 1
      val t0 = System.nanoTime()
      e = rotator.rotate(smallStar(largeStar(e)), round)
      val sig = edgeSetSignature(e)
      converged = sig == sigPrev
      sigPrev = sig
      cfg.checkpoint.foreach { c =>
        Checkpoints.logSuperstep(e, c, "cc", round, Double.NaN, sig._1,
          (System.nanoTime() - t0) / 1000000)
      }
    }

    // stars: src (member) → dst (root); roots + isolated vertices map to self
    val out = allVerts
      .join(e.select(col("src").as("id"), col("dst").as("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize before releasing iteration state
    rotator.close(); allVerts.unpersist(false)
    out
  }

  /** For each u: m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.
    * Output edges all satisfy src > dst. Neighborhoods are symmetric.
    * The |V|-sized min-neighbor table joins the |E|-sized symmetric edge
    * stream hash-to-hash (never sorting the edges); AQE upgrades to
    * broadcast when it fits. */
  private[algos] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
    val m = sym.groupBy("src").agg(least(min(col("dst")), first(col("src"))).as("m"))
      .select(col("src").as("u"), col("m"))
    sym.join(m.hint("SHUFFLE_HASH"), sym("src") === col("u"))
      .filter(col("dst") > col("u"))
      .select(col("dst").as("src"), col("m").as("dst"))
    // no distinct here: output is bounded by |sym| = 2|E|, min-aggregation
    // in the following smallStar is duplicate-insensitive, and smallStar's
    // own distinct dedups the round's result — saves one |E| shuffle/round
  }

  /** Input oriented src > dst. For each u: m = min of its dsts; emit
    * (u, m) and (v, m) for each dst v ≠ m. Output stays src > dst and
    * self-loop-free. */
  private[algos] def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("src").agg(min(col("dst")).as("m"))
      .select(col("src").as("u"), col("m"))
    val joined = e.join(m.hint("SHUFFLE_HASH"), e("src") === col("u"))
    val hangNbrs = joined.filter(col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
    val hangSelf = m.select(col("u").as("src"), col("m").as("dst"))
    hangNbrs.union(hangSelf).filter(col("src") =!= col("dst")).distinct()
  }

  /** (count, xor checksum of row hashes) — order-free, overflow-free set
    * signature; collision-safe enough at 64 bit for a convergence test
    * that only ever compares successive iterates. */
  private def edgeSetSignature(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)).as("c"),
      coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)).as("h")).first()
    (r.getLong(0), r.getLong(1))
  }
}
