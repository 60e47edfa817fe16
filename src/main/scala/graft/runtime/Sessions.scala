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
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
