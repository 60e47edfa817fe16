// Lives in the spark.sql namespace: Dataset.ofRows and LogicalRDD's
// second constructor list are private[sql] / sql-internal — the same
// packaging rationale as org.apache.spark.sql.graftvec (native
// expressions).
package org.apache.spark.sql.graftplan

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Statistics hygiene for ITERATED checkpoint leaves.
  *
  * `Dataset.localCheckpoint` stamps the truncated plan's LogicalRDD leaf
  * with the COMPUTED statistics of the plan it replaced
  * (`LogicalRDD.rewriteStatsAndConstraints`), and the default
  * size-only visitor multiplies child sizes across joins. In an iterative
  * engine the rotated state frame appears k times in each superstep's
  * plan (attr joins, active-set flags, the vprog join), so the inherited
  * leaf stat compounds as sizeⁿ⁺¹ ≈ (sizeⁿ)ᵏ — after ~8 supersteps the
  * BigInteger holds millions of bits and a single stats pass inside the
  * NEXT rotation's `localCheckpoint` Toom-Cook-multiplies the driver into
  * a stall (measured: minutes in `SizeInBytesOnlyStatsPlanVisitor`; the
  * r3 SCC "anti-fusion" note was this same failure class worked around
  * locally). Clamping the leaf stat at every rotation bounds the
  * compounding permanently: honest sub-clamp sizes stay EXACT, and a
  * clamped leaf can never re-inflate past `capᵏ` within one superstep.
  *
  * The clamp keeps sizeInBytes ≤ Long.MaxValue — far above every
  * broadcast threshold, so a clamped frame is never mistakenly broadcast
  * (the engine's iterative joins pin SHUFFLE_HASH explicitly anyway).
  */
object PlanStats {

  private val Cap = BigInt(Long.MaxValue)

  /** Re-leaf `df` (must be a just-checkpointed frame) with its inherited
    * statistics clamped. No-op when the stats are already sane; the
    * returned frame shares the SAME checkpointed RDD (release handles on
    * `LogicalRDD.rdd` keep working). */
  def clampCheckpointStats(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case lr: LogicalRDD =>
        val st = lr.computeStats()
        if (st.sizeInBytes <= Cap && st.rowCount.forall(_ <= Cap)) df
        else {
          val session = df.sparkSession.asInstanceOf[SparkSession]
          val clamped = new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            session, Some(st.copy(sizeInBytes = st.sizeInBytes.min(Cap),
              rowCount = st.rowCount.map(_.min(Cap)))), None)
          Dataset.ofRows(session, clamped)
        }
      case _ => df
    }
}
