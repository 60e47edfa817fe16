package graft.runtime

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Superstep checkpointing + lineage/metrics log — the engine's replacement
  * for the reference's `util.PeriodicGraphCheckpointer` (called from
  * `Pregel$` each round in spark-graphx 4.1.2; SURVEY.md §2.4), promoted
  * from an optimization to a feature: every superstep appends per-partition
  * metrics, state snapshots land every `every` supersteps, and
  * `latest()` lets a killed job resume mid-iteration.
  *
  * Locally the state store is parquet-dir-per-superstep; on a lakehouse the
  * same layout maps to an Iceberg table with a `superstep` snapshot column
  * (no Iceberg jars ship in this sandbox — SURVEY.md §2.1 — so the seam is
  * the directory scheme, not a format import).
  */
final case class CheckpointConfig(
    dir: String,
    runId: String,
    every: Int = 5,
    localEvery: Int = 2)

object Checkpoints {

  def stateDir(cfg: CheckpointConfig, algo: String, superstep: Int): String =
    s"${cfg.dir}/${cfg.runId}/$algo/superstep=$superstep"

  def logPath(cfg: CheckpointConfig, algo: String): String =
    s"${cfg.dir}/${cfg.runId}/$algo/_superstep_log"

  /** Persist a state snapshot for `superstep` and return the re-read frame
    * (lineage truncated to a parquet scan). */
  def save(state: DataFrame, cfg: CheckpointConfig, algo: String, superstep: Int): DataFrame = {
    val p = stateDir(cfg, algo, superstep)
    state.write.mode(SaveMode.Overwrite).parquet(p)
    state.sparkSession.read.parquet(p)
  }

  /** Latest complete snapshot (max superstep dir with a _SUCCESS marker). */
  def latest(spark: SparkSession, cfg: CheckpointConfig, algo: String): Option[(Int, DataFrame)] = {
    val base = new java.io.File(s"${cfg.dir}/${cfg.runId}/$algo")
    if (!base.isDirectory) return None
    val steps = base.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("superstep="))
      .filter(f => new java.io.File(f, "_SUCCESS").exists())
      .map(_.getName.stripPrefix("superstep=").toInt)
    if (steps.isEmpty) None
    else {
      val s = steps.max
      Some((s, spark.read.parquet(stateDir(cfg, algo, s))))
    }
  }

  /** Append one superstep's lineage/convergence metrics, per shuffle
    * partition of the state (schema FIXTURES.md §1.1 `superstep_log`). */
  def logSuperstep(state: DataFrame, cfg: CheckpointConfig, algo: String,
      superstep: Int, l1Delta: Double, activeCount: Long, wallMs: Long): Unit = {
    val perPart = state
      .select(spark_partition_id().as("partition_id"))
      .groupBy("partition_id").agg(count(lit(1)).as("rows"))
      .select(
        lit(cfg.runId).as("run_id"),
        lit(superstep).as("superstep"),
        col("partition_id"), col("rows"),
        lit(l1Delta).as("l1_delta"),
        lit(activeCount).as("active_count"),
        lit(wallMs).as("wall_ms"))
    perPart.write.mode(SaveMode.Append).parquet(logPath(cfg, algo))
  }

  def readLog(spark: SparkSession, cfg: CheckpointConfig, algo: String): DataFrame =
    spark.read.parquet(logPath(cfg, algo))
}

/** Driver-side iteration hygiene shared by all iterative operators: rotate
  * cached state, truncate lineage with localCheckpoint on a cadence (and
  * durable parquet checkpoints when a CheckpointConfig is given). Unbounded
  * lineage in a Dataset loop OOMs the driver — this is the one concern
  * Catalyst does not manage for us (SURVEY.md §4.1). */
object IterationHygiene {

  /** Materialize + truncate `next`, unpersist `prev`. Returns the frame to
    * carry into the next superstep. */
  def rotate(next: DataFrame, prev: Option[DataFrame], superstep: Int,
      cfg: Option[CheckpointConfig], algo: String): DataFrame = {
    val out = cfg match {
      case Some(c) if c.every > 0 && superstep % c.every == 0 =>
        Checkpoints.save(next, c, algo, superstep)
      case Some(c) if c.localEvery > 0 && superstep % c.localEvery == 0 =>
        next.localCheckpoint(true)
      case None if superstep % 2 == 0 =>
        next.localCheckpoint(true)
      case _ =>
        next.persist(StorageLevel.MEMORY_AND_DISK)
    }
    // force materialization before dropping the previous state
    out.count()
    prev.foreach(_.unpersist(false))
    out
  }
}
