package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.EdgeOps
import graft.runtime.{CheckpointConfig, Checkpoints, IterationHygiene}

/** Synchronous label propagation (reference: spark-graphx 4.1.2
  * `lib.LabelPropagation`; Raghavan et al. 2007).
  *
  * Reference semantics, reproduced: labels init to own id; every superstep
  * EVERY vertex with incident edges replaces its label by the most frequent
  * label among its neighbors over all incident directed edges (each
  * parallel edge contributes along both directions — `sendMsg` emits to
  * src and dst); runs exactly `maxSteps` supersteps, no convergence test.
  *
  * One deliberate, documented delta (SURVEY.md §2.4, FIXTURES.md §3.7):
  * the reference breaks frequency ties by Map iteration order —
  * nondeterministic across JVMs. We specify SMALLEST label among the
  * maximal-count labels, making output deterministic at any scale;
  * exact-match differential tests use tie-free graphs.
  *
  * Each superstep: two label joins (by src, by dst — both against the
  * edge table partitioned once), a (vertex, label) count aggregate with
  * map-side partial aggregation, and a `max_by` argmax — no UDAF, fully
  * codegen'd.
  */
object LabelPropagation {

  final case class Config(
      maxSteps: Int = 5,
      numPartitions: Int = 0,
      checkpoint: Option[CheckpointConfig] = None)

  /** (id, label) after `cfg.maxSteps` synchronous supersteps. */
  def run(edges: DataFrame, cfg: Config = Config()): DataFrame = {
    val spark = edges.sparkSession
    val P = if (cfg.numPartitions > 0) cfg.numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e = edges.select(col("src"), col("dst"))
      .repartition(P, col("src")).cache()
    e.count()

    val verts = EdgeOps.vertices(e).repartition(P, col("id")).cache()
    var labels = verts.select(col("id"), col("id").as("label"))
    var prev: Option[DataFrame] = None

    for (step <- 1 to cfg.maxSteps) {
      val t0 = System.nanoTime()
      // messages along both directions of every directed edge; the
      // |V|-sized label table hash-joins the cached edge stream
      val toDst = e.join(labels.hint("SHUFFLE_HASH"), e("src") === labels("id"))
        .select(e("dst").as("vid"), col("label"))
      val toSrc = e.join(labels.hint("SHUFFLE_HASH"), e("dst") === labels("id"))
        .select(e("src").as("vid"), col("label"))
      val argmax = toDst.union(toSrc)
        .groupBy(col("vid"), col("label")).agg(count(lit(1)).as("cnt"))
        // max_by over (cnt, -label): highest count, ties → smallest label
        .groupBy(col("vid"))
        .agg(max_by(col("label"), struct(col("cnt"), (-col("label")).as("nl"))).as("new_label"))
      // vertices with no incident messages keep their label (none here —
      // every vertex of an edge table has ≥1 incident edge — but keep the
      // coalesce for subgraph-restricted universes)
      val next = labels.join(argmax, labels("id") === argmax("vid"), "left")
        .select(labels("id"), coalesce(col("new_label"), col("label")).as("label"))
      labels = IterationHygiene.rotate(next, prev, step, cfg.checkpoint, "lpa")
      prev = Some(labels)
      cfg.checkpoint.foreach { c =>
        Checkpoints.logSuperstep(labels, c, "lpa", step, Double.NaN, 0L,
          (System.nanoTime() - t0) / 1000000)
      }
    }
    e.unpersist(false); verts.unpersist(false)
    labels
  }
}
