package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness: run named SparkEntry queries standalone in a
  * fresh JVM with the same session config as Bench, print per-query wall
  * time. Usage: Profile <sfDir> <query> [query...] */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.runtime.Sessions.local(cpus, 2 * cpus, "graft-profile",
      aqe = sys.env.getOrElse("GRAFT_AQE", "true").toBoolean)
    if (graft.runtime.Trace.enabled) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = for {a <- i.completionTime; b <- i.submissionTime} yield a - b
          if (ms.exists(_ > 300))
            System.err.println(f"[stage] id=${i.stageId} tasks=${i.numTasks} " +
              f"ms=${ms.get} ${i.name.takeWhile(_ != '\n').take(90)}")
        }
      })
    }
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name rows=$n sec=$dt%.2f")
    }
    spark.stop()
  }
}
