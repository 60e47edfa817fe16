package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps

/** Structured-Streaming operators driven through MemoryStream micro-batches
  * and pinned against their batch twins (same expressions ⇒ same rows). */
class StreamingSpec extends SparkTestBase {

  private def html(links: Seq[String]): Array[Byte] =
    (s"<html><body><p>text</p>" +
      links.map(l => s"""<a href="$l">x</a>""").mkString +
      "</body></html>").getBytes("UTF-8")

  test("edgeStream over micro-batches equals the batch extract+encode " +
      "pipeline; parquet sink lands the at-rest layout") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Array[Byte])]
    val pages = in.toDF().toDF("url", "html")
    val q = StreamOps.edgeStream(pages).writeStream
      .format("memory").queryName("edges_mem").outputMode("append").start()
    val b1 = Seq(
      ("http://a", html(Seq("http://b", "http://c"))),
      ("http://b", html(Seq("http://c"))))
    val b2 = Seq(
      ("http://c", html(Seq("http://a", "http://a")))) // parallel links kept
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    val streamed = spark.table("edges_mem").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    q.stop()
    val batch = StreamOps.edgeStream((b1 ++ b2).toDF("url", "html"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(streamed == batch && streamed.size == 5)

    // parquet sink: AvailableNow drains a fresh stream into the batch layout
    val dir = java.nio.file.Files.createTempDirectory("estream").toString
    val in2 = MemoryStream[(String, Array[Byte])]
    in2.addData((b1 ++ b2): _*)
    val q2 = StreamOps.writeEdgeStream(
      StreamOps.edgeStream(in2.toDF().toDF("url", "html")),
      s"$dir/edges", s"$dir/ck", Trigger.AvailableNow())
    q2.awaitTermination()
    val landed = spark.read.parquet(s"$dir/edges").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(landed == batch)
  }

  test("dedupStream keeps exactly the first occurrence of each content " +
      "hash ACROSS micro-batches (min doc_id within a batch)") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.dedupStream(in.toDF().toDF("doc_id", "text")).writeStream
      .format("memory").queryName("dedup_mem").outputMode("append").start()
    in.addData((1L, "alpha"), (2L, "beta"), (7L, "alpha")) // dup within batch
    q.processAllAvailable()
    in.addData((3L, "beta"), (4L, "gamma")) // dup across batches
    q.processAllAvailable()
    val out = spark.table("dedup_mem").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sorted.toSeq
    q.stop()
    assert(out == Seq(1L -> "alpha", 2L -> "beta", 4L -> "gamma"))
  }

  test("dedupStream with a state TTL re-admits a hash after expiry; " +
      "without one the suppression is global (VERDICT r3 stretch #8)") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    // drain-based waits (processAllAvailable / AvailableNow +
    // awaitTermination) never return once processing-time timeouts are
    // registered — the engine keeps scheduling no-data batches to fire
    // them (which is exactly what lets the TTL expire here). Poll the
    // sink with a deadline instead.
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.dedupStream(in.toDF().toDF("doc_id", "text"),
        stateTtl = Some("50 milliseconds")).writeStream
      .format("memory").queryName("dedup_ttl_mem").outputMode("append").start()
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (spark.table("dedup_ttl_mem").count() < n) {
        q.exception.foreach(throw _)
        assert(System.nanoTime() < deadline, s"timed out waiting for $n sink rows")
        Thread.sleep(50)
      }
    }
    in.addData((1L, "alpha")); awaitRows(1)
    // Probe until the state entry has DEMONSTRABLY expired (ADVICE r4: a
    // fixed sleep was flaky — on a loaded box the processing-time timeout
    // may not have fired yet when the re-arrival batch runs). Each probe
    // re-sends the same content under a FRESH doc_id: a still-live state
    // entry suppresses it (proving nothing), an expired one admits it.
    // Suppressed probes add no sink rows, so retrying is side-effect-free.
    val deadline = System.nanoTime() + 60L * 1000000000L
    var probe = 100L
    def admitted(): Long =
      spark.table("dedup_ttl_mem").filter("doc_id >= 100").count()
    while (admitted() == 0 && System.nanoTime() < deadline) {
      q.exception.foreach(throw _)
      in.addData((probe, "alpha")); probe += 1
      Thread.sleep(150)
    }
    val out = spark.table("dedup_ttl_mem").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sorted.toSeq
    q.stop()
    assert(out.headOption.contains(1L -> "alpha") &&
        out.count(_._2 == "alpha") >= 2 && out.forall(r => r._1 == 1L || r._1 >= 100L),
      s"expected re-admission of 'alpha' under a fresh doc_id after TTL, got $out")
  }

  test("windowedEventCounts: append mode emits only watermark-finalized " +
      "windows; late events beyond the watermark are dropped") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = StreamOps.windowedEventCounts(
        in.toDF().toDF("ts", "event_type", "value"),
        windowLen = "10 minutes", watermark = "30 minutes")
      .writeStream.format("memory").queryName("win_mem")
      .outputMode("append").start()
    // window [10:00,10:10): 2 clicks; then an event at 11:00 pushes the
    // watermark to 10:30, finalizing that window
    in.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0))
    q.processAllAvailable()
    in.addData((Timestamp.valueOf("2024-01-01 11:00:00"), "view", 5.0))
    q.processAllAvailable()
    // a LATE click at 10:02 — beyond the 10:30 watermark → dropped
    in.addData((ts(2), "click", 99.0))
    q.processAllAvailable()
    val rows = spark.table("win_mem").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSet
    q.stop()
    assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)),
      s"finalized click window missing from $rows")
    assert(!rows.exists(_._4 == 99.0), "late event leaked past the watermark")

    // batch twin on the driver's events table: same expressions run as a
    // plain aggregation (watermark no-op) — rows > 0 and schema stable
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val batch = StreamOps.windowedEventCounts(ev)
    assert(batch.columns.toSeq ==
      Seq("window_start", "window_end", "event_type", "n", "value_sum"))
    assert(batch.count() > 0)
  }
}
