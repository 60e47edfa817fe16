package graft.runtime

import org.apache.spark.sql.SparkSession

/** The entry points' shared local-session factory — ONE copy of the
  * determinism-critical settings every driver main depends on (UTC
  * session time zone, hash-over-sort-merge join preference for the
  * iterative state joins, AQE, proportional shuffle partitions, pinned
  * ROOT locale so every f-interpolated JSON uses dot decimals). Six
  * hand-copied builder blocks drifted one setting at a time before this
  * existed; change session policy HERE. */
private[graft] object Sessions {

  def local(cpus: Int, shufflePartitions: Int, appName: String,
      aqe: Boolean = true): SparkSession = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      // iterative state joins: hash join (broadcast/shuffled), never
      // re-sort the big cached side every superstep
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // let AQE coalesce the output partitioning of plans that get cached:
      // the memoized graph/pair frames and every algorithm-internal persist
      // otherwise freeze at spark.sql.shuffle.partitions tiny partitions
      // (cached plans are exempt from coalescing by default), and every
      // downstream pass over them pays a partition-count task storm —
      // measured ~1.5 s per 128-task stage over a 30k-row cached frame at
      // local[32]. Scale-safe: AQE's advisory size governs, so big frames
      // keep full parallelism.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
