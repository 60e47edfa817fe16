package graft.algos

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.EdgeOps
import graft.runtime.{CheckpointConfig, Checkpoints, IterationHygiene}

/** Pregel-free power-iteration PageRank as Dataset joins + aggregations.
  *
  * Numerics are bit-for-bit the reference's (spark-graphx 4.1.2
  * `lib.PageRank.runWithOptions` / `runUntilConvergenceWithOptions`,
  * verified against executed fixtures FIXTURES.md §3.1-3.3):
  *   - weight(src→dst) = 1 / outDeg(src), parallel edges each counted;
  *   - static mode: rank0 = 1.0; rank' = reset + (1-reset)·Σ_in rank·w;
  *   - dangling mass is LOST during iteration (no per-step redistribution),
  *     then the final vector is rescaled so Σ ranks = numVertices
  *     (reference `normalizeRankSum`);
  *   - convergence mode: delta propagation — rank0 = reset, delta0 = reset,
  *     only vertices with delta > tol send; new delta = (1-reset)·msgSum;
  *     same final normalization.
  * `danglingRedistribute = true` switches to the textbook variant that
  * redistributes sink mass uniformly each step (off in compat mode —
  * the acceptance test is allclose vs the reference, SURVEY.md §7.4).
  *
  * Scale posture: the weighted edge table is built once (one degree
  * aggregate + one join), hash-repartitioned by `src` and cached, so each
  * superstep shuffles only the rank vector (|V| rows, not |E|): contribs
  * aggregate partially map-side, the final reduce lands hash(dst) — the
  * same partitioning the vertex-side join needs, so Catalyst reuses the
  * exchange. Hub skew on dst is handled by AQE skew splitting plus the
  * two-level salted aggregate (`saltBuckets > 1`).
  */
object PageRank {

  final case class Config(
      resetProb: Double = 0.15,
      numIter: Int = 20,
      tol: Option[Double] = None,
      danglingRedistribute: Boolean = false,
      normalize: Boolean = true,
      saltBuckets: Int = 1,
      numPartitions: Int = 0,
      checkpoint: Option[CheckpointConfig] = None,
      resume: Boolean = false)

  /** (id, rank) for every vertex of `edges`. */
  def run(edges: DataFrame, cfg: Config = Config()): DataFrame = {
    val spark = edges.sparkSession
    val P = if (cfg.numPartitions > 0) cfg.numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt

    val e = edges.select(col("src"), col("dst"))
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    // weighted edges, partitioned by src once for the per-superstep join
    val wEdges = e.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("out_deg")).as("w"))
      .repartition(P, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val verts = EdgeOps.vertices(e).repartition(P, col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val numVertices = verts.count()

    val ranks = cfg.tol match {
      case None      => runStatic(wEdges, verts, cfg, numVertices)
      case Some(tol) => runConvergence(wEdges, verts, cfg, tol)
    }

    val out =
      if (!cfg.normalize) ranks
      else {
        val total = ranks.agg(sum("rank")).first().getDouble(0)
        ranks.select(col("id"), (col("rank") * lit(numVertices / total)).as("rank"))
      }
    val result = out.persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    wEdges.unpersist(false); verts.unpersist(false)
    result
  }

  /** Per-dst message sum with optional two-level salted aggregation for
    * hub in-degree skew: partial agg by (dst, salt) first, then final by
    * dst — bounds any single reducer's input to |salts| partials. */
  private def msgSums(wEdges: DataFrame, ranks: DataFrame, salt: Int): DataFrame = {
    val contribs = wEdges.join(ranks, wEdges("src") === ranks("id"))
      .select(wEdges("dst"), (col("rank") * col("w")).as("contrib"))
    if (salt <= 1)
      contribs.groupBy("dst").agg(sum("contrib").as("msg"))
    else
      contribs
        .groupBy(col("dst"), pmod(hash(col("dst"), spark_partition_id()), lit(salt)).as("s"))
        .agg(sum("contrib").as("msg"))
        .groupBy("dst").agg(sum("msg").as("msg"))
  }

  private def runStatic(wEdges: DataFrame, verts: DataFrame, cfg: Config,
      numVertices: Long): DataFrame = {
    val spark = wEdges.sparkSession
    val algo = "pagerank"
    var (startIter, ranks0) = resumeOrInit(spark, cfg, algo,
      verts.select(col("id"), lit(1.0).as("rank")))
    var ranks = ranks0
    var prev: Option[DataFrame] = None

    for (i <- (startIter + 1) to cfg.numIter) {
      val t0 = System.nanoTime()
      val msgs = msgSums(wEdges, ranks, cfg.saltBuckets)
      val withMass =
        if (!cfg.danglingRedistribute) msgs
        else {
          // sink mass this round = 1 - Σ msgs (ranks sum is known only
          // pre-normalization in static mode; compute directly)
          val total = ranks.agg(sum("rank")).first().getDouble(0)
          val carried = msgs.agg(sum("msg")).first() match {
            case r if r.isNullAt(0) => 0.0
            case r => r.getDouble(0)
          }
          val sinkShare = (total - carried) / numVertices
          msgs.select(col("dst"), (col("msg") + lit(sinkShare)).as("msg"))
        }
      val next = verts.join(withMass, verts("id") === withMass("dst"), "left")
        .select(verts("id"),
          (lit(cfg.resetProb) + lit(1.0 - cfg.resetProb) * coalesce(col("msg"), lit(0.0))).as("rank"))
      ranks = IterationHygiene.rotate(next, prev, i, cfg.checkpoint, algo)
      prev = Some(ranks)
      cfg.checkpoint.foreach { c =>
        Checkpoints.logSuperstep(ranks, c, algo, i, Double.NaN, numVertices,
          (System.nanoTime() - t0) / 1000000)
      }
    }
    ranks
  }

  /** Reference `runUntilConvergence`: delta-propagating dynamic PageRank.
    * State: (id, rank, delta, received). Senders each round are vertices
    * that received a message last round AND have delta > tol (Pregel
    * activeDirection = Out in the reference). */
  private def runConvergence(wEdges: DataFrame, verts: DataFrame, cfg: Config,
      tol: Double): DataFrame = {
    val algo = "pagerank_tol"
    var state = verts.select(col("id"),
      lit(cfg.resetProb).as("rank"), lit(cfg.resetProb).as("delta"),
      lit(true).as("received"))
    var prev: Option[DataFrame] = None
    var i = 0
    var active = 1L
    while (active > 0) {
      i += 1
      val t0 = System.nanoTime()
      val senders = state.filter(col("received") && col("delta") > tol)
        .select(col("id"), col("delta"))
      val msgs = wEdges.join(senders, wEdges("src") === senders("id"))
        .select(wEdges("dst"), (col("delta") * col("w")).as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("msg"))
      val next = state.join(msgs, state("id") === msgs("dst"), "left")
        .select(state("id"),
          when(col("msg").isNotNull, col("rank") + lit(1.0 - cfg.resetProb) * col("msg"))
            .otherwise(col("rank")).as("rank"),
          when(col("msg").isNotNull, lit(1.0 - cfg.resetProb) * col("msg"))
            .otherwise(col("delta")).as("delta"),
          col("msg").isNotNull.as("received"))
      state = IterationHygiene.rotate(next, prev, i, cfg.checkpoint, algo)
      prev = Some(state)
      active = state.filter(col("received") && col("delta") > tol).count()
      cfg.checkpoint.foreach { c =>
        Checkpoints.logSuperstep(state, c, algo, i, Double.NaN, active,
          (System.nanoTime() - t0) / 1000000)
      }
    }
    state.select("id", "rank")
  }

  private def resumeOrInit(spark: SparkSession, cfg: Config, algo: String,
      init: DataFrame): (Int, DataFrame) =
    (if (cfg.resume) cfg.checkpoint.flatMap(Checkpoints.latest(spark, _, algo)) else None)
      .map { case (step, df) => (step, df) }
      .getOrElse((0, init))
}
