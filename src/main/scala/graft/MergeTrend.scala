package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Merge per-workload ScaleTrend captures (fresh-JVM-per-workload
  * protocol, `bin/trend-fresh-jvm.sh`) into one scale_trend.json.
  *
  * Usage: MergeTrend <out.json> <part1.json> [part2.json ...]
  *
  * Top-level fields (metric/mult/mid_factor/cpus) come from the first
  * part and must agree across parts — a mixed-mult or mixed-cpus merge
  * would report exponents fitted under different protocols as one
  * capture, so it fails loudly instead. Workload entries are
  * concatenated; a workload appearing in several parts takes the LAST
  * part's entry (re-runs override).
  */
object MergeTrend {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MergeTrend <out.json> <parts...>")
    val out = args.head
    val parts = args.tail.toSeq.map { p =>
      (p, JsonMethods.parse(new java.io.File(p)))
    }
    val header = parts.head._2
    for (key <- Seq("metric", "mult", "mid_factor", "cpus"); (p, j) <- parts.tail) {
      require((j \ key) == (header \ key),
        s"part $p disagrees with ${parts.head._1} on '$key' — refusing to " +
          "merge captures taken under different protocols")
    }
    val workloads = parts.flatMap { case (p, j) =>
      j \ "workloads" match {
        case JObject(obj) => obj
        // loud named-file protocol error (ADVICE r5) instead of an opaque
        // ClassCastException on e.g. a capture that crashed pre-checkpoint
        case other => sys.error(s"part $p has no 'workloads' object " +
          s"(found ${other.getClass.getSimpleName}) — not a trend capture?")
      }
    }
    // last entry per name wins, preserving first-seen order
    val names = workloads.map(_._1).distinct
    val byName = workloads.groupBy(_._1).map { case (k, vs) => (k, vs.last._2) }
    val merged = JObject(
      header.asInstanceOf[JObject].obj.filterNot(_._1 == "workloads") :+
        ("workloads" -> JObject(names.map(n => n -> byName(n)).toList)))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      JsonMethods.compact(JsonMethods.render(merged)) + "\n")
    println(s"merged ${parts.size} parts, ${names.size} workloads -> $out")
  }
}
