package graft.runtime

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Overhead-proportional partitioning for iterative operators.
  *
  * Iteration state is re-materialized every superstep (persist /
  * localCheckpoint — see [[StateRotator]]), and cached plans do NOT get
  * AQE partition coalescing (`spark.sql.optimizer.
  * canChangeCachedPlanOutputPartitioning` is false by default), so without
  * an explicit partition count every superstep of a 16k-row graph pays
  * `spark.sql.shuffle.partitions` tasks of pure scheduling — measured as
  * ~1 s/superstep fixed overhead at local[32]/64 partitions vs ~100 ms
  * with data-sized partitions.
  *
  * Rule: one partition per `rowsPerPartition` rows of the frame being
  * iterated (edges for graph rounds, exploded messages for superstep
  * aggregation), clamped to [1, spark.sql.shuffle.partitions]. At cluster
  * scale `shuffle.partitions` is the operator-tuned ceiling, so big inputs
  * keep full parallelism; locally small inputs stop paying 64-task stages.
  * An explicit `numPartitions` config always wins.
  */
object AdaptivePartitions {

  /** ~250k edge-sized rows ≈ tens of MB per task — small enough to stay
    * in-cache per core, large enough that task overhead is noise. */
  val DefaultRowsPerPartition: Long = 250000L

  def forRows(spark: SparkSession, rows: Long, explicitP: Int = 0,
      rowsPerPartition: Long = DefaultRowsPerPartition): Int =
    if (explicitP > 0) explicitP
    else {
      val cap = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val want = math.ceil(rows.toDouble / rowsPerPartition).toLong
      math.max(1L, math.min(cap.toLong, want)).toInt
    }

  /** Rows below which a per-vertex frame (≤ rows entries of (long, long))
    * is cheaper to broadcast than to shuffle both join sides — ~32 MB
    * serialized at the threshold, well under executor memory at any scale.
    * Above it the caller should keep a shuffle-hash join (scale path). */
  val BroadcastRowCeiling: Long = 2000000L

  /** Much tighter ceiling for PER-ITERATION broadcasts inside superstep
    * loops: each broadcast is a blocking driver job, and at ~100k-row
    * state the engine measured per-superstep broadcasting 2× SLOWER than
    * two small exchanges (PageRank.msgSums). Below this bound the frame
    * is a few hundred KB and the exchange-stage scheduling dominates
    * instead — e.g. SCC's post-trim remainder rounds, where the design
    * contract is that late rounds of a web-scale run cost small-graph
    * money. */
  val LoopBroadcastRowCeiling: Long = 65536L

  /** [[sideFor]] under the per-iteration ceiling. */
  def loopSideFor(df: DataFrame, rows: Long): DataFrame =
    if (rows <= LoopBroadcastRowCeiling) broadcast(df) else df.hint("SHUFFLE_HASH")

  /** Join-side strategy by known row count: broadcast when provably small,
    * shuffle-hash (never a per-superstep sort) otherwise. */
  def sideFor(df: DataFrame, rows: Long): DataFrame =
    if (rows <= BroadcastRowCeiling) broadcast(df) else df.hint("SHUFFLE_HASH")

  /** Spread a narrow scan across the cluster before a CPU-heavy per-row
    * stage: an input landing in fewer splits than cores SERIALIZES that
    * stage on those few tasks (measured: one small parquet file = one
    * partition running the shingle + 128-hash signature pipeline on one
    * core — 4.8 s of a 5 s query). A repartition below the parallelism
    * floor is cheap by construction (the input is small); inputs already
    * at/above the floor pass through untouched, so large scans keep their
    * splits and pay nothing. Round-robin repartition is retry-safe here
    * (Spark sorts before round-robin by default — guide §2.5). */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }
}
