package graft.runtime

import org.apache.spark.sql.SparkSession

/** Stable, collision-free identity keys for per-session memoization.
  *
  * `System.identityHashCode` is NOT unique: after GC a new session can
  * collide with a stopped one's hash and a memo would serve a frame bound
  * to a dead SparkContext. This helper mints one UUID per live session in
  * a weak map (stopped sessions fall out on GC), and [[purgeDead]] lets
  * memo owners drop entries whose session is gone — the frames' blocks
  * died with the context, so the entries are dropped WITHOUT unpersist. */
private[graft] object SessionKeys {

  private val keys = new java.util.WeakHashMap[SparkSession, String]

  def of(spark: SparkSession): String = keys.synchronized {
    Option(keys.get(spark)).getOrElse {
      val k = java.util.UUID.randomUUID().toString
      keys.put(spark, k); k
    }
  }

  private def alive(): Set[String] = keys.synchronized {
    import scala.jdk.CollectionConverters._
    keys.values.asScala.toSet
  }

  /** Remove entries of `memo` whose session key no longer belongs to a
    * live session. `sessionKeyOf` extracts the key from a map key. */
  def purgeDead[K, V](memo: scala.collection.concurrent.TrieMap[K, V],
      sessionKeyOf: K => String): Unit = {
    val live = alive()
    memo.keys.filterNot(k => live(sessionKeyOf(k))).foreach(memo.remove)
  }
}
