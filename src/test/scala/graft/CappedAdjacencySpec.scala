package graft

import org.apache.spark.sql.functions._

import graft.algos.{LabelPropagation, PageRank}
import graft.graph.{Adjacency, PreparedGraph}

/** VERDICT r3 next #1: degree-capped CSR blocks. A planted mega-hub
  * (degree ≥ 5× the cap, forward AND reverse) must span multiple chunk
  * rows — each bounded, each carrying the true total degree — while every
  * algorithm's output is unchanged vs the uncapped build. */
class CappedAdjacencySpec extends SparkTestBase {

  private val CapKey = "spark.graft.adjacency.maxBlockArity"

  // hub 0 → 160 out-neighbors; 200 sources → hub 999; plus background
  private val hubOut = (1 to 160).map(d => (0L, d.toLong))
  private val hubIn = (300 to 499).map(s => (s.toLong, 999L))
  private val background = randomEdges(31, n = 80, m = 200)
    .map { case (a, b) => (a + 1000L, b + 1000L) }
  private val pairs = hubOut ++ hubIn ++ background

  private def withCap[T](cap: Int)(f: => T): T = {
    spark.conf.set(CapKey, cap.toString)
    try f finally spark.conf.unset(CapKey)
  }

  test("planted mega-hub: forward and reverse blocks chunk at the cap, " +
      "carry the true degree, and lose no edges") {
    withCap(32) {
      val g = PreparedGraph(edgesDF(pairs))
      val hubRows = g.adjacency.filter(col("src") === 0L).collect()
      assert(hubRows.length == 5, s"expected ceil(160/32)=5 chunks, got ${hubRows.length}")
      assert(hubRows.forall(_.getAs[Long]("degree") == 160L),
        "every chunk carries the TRUE total out-degree")
      assert(hubRows.forall(_.getSeq[Long](2).size <= 64),
        "chunk arity bounded by ~2×cap")
      assert(hubRows.flatMap(_.getSeq[Long](2)).sorted.toSeq ==
        (1 to 160).map(_.toLong), "chunks partition the neighbor multiset")

      val revRows = g.reverseAdjacency.filter(col("dst") === 999L).collect()
      assert(revRows.length == 7, s"expected ceil(200/32)=7 chunks, got ${revRows.length}")
      assert(revRows.forall(_.getAs[Long]("in_degree") == 200L))
      assert(revRows.forall(_.getSeq[Long](2).size <= 64))
      assert(revRows.flatMap(_.getSeq[Long](2)).sorted.toSeq ==
        (300 to 499).map(_.toLong))

      // a sub-cap vertex keeps exactly one row
      val tail = g.adjacency.filter(col("src") === 300L).collect()
      assert(tail.length == 1 && tail(0).getAs[Long]("degree") == 1L)
      g.unpersist()
    }
  }

  test("Adjacency.fromEdges chunks sorted blocks with the true degree band") {
    val blocks = Adjacency.fromEdges(edgesDF(pairs), cap = 32)
    val hub = blocks.filter(col("src") === 0L).collect()
    assert(hub.length == 5)
    // bucket from the TRUE degree (floor(log2(160)) = 7) on every chunk
    assert(hub.forall(_.getAs[Int]("bucket") == 7))
    assert(hub.forall(_.getAs[Long]("degree") == 160L))
    hub.foreach { r =>
      val d = r.getSeq[Long](3)
      assert(d == d.sorted, "dsts sorted within each chunk")
    }
    assert(hub.flatMap(_.getSeq[Long](3)).sorted.toSeq == (1 to 160).map(_.toLong))
  }

  test("PageRank / LPA / both-direction combinator outputs are unchanged " +
      "by chunking (capped vs uncapped run)") {
    val e = edgesDF(pairs)
    def pr(g: PreparedGraph) = PageRank.runPrepared(g,
      PageRank.Config(numIter = 5))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def degs(g: PreparedGraph) = graft.graph.AggregateMessages.run(
      g, g.vertices, toDst = Some(lit(1L)), toSrc = Some(lit(1L)),
      merge = Seq(sum("msg").as("d")), fields = graft.graph.TripletFields.None)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val (prCapped, degCapped) = withCap(32) {
      val g = PreparedGraph(e)
      val out = (pr(g), degs(g)); g.unpersist(); out
    }
    val (prPlain, degPlain) = withCap(1 << 20) {
      val g = PreparedGraph(e)
      val out = (pr(g), degs(g)); g.unpersist(); out
    }
    assert(degCapped == degPlain, "combinator degree sums exact-match")
    assert(prCapped.keySet == prPlain.keySet)
    prPlain.foreach { case (id, r) =>
      assert(math.abs(prCapped(id) - r) < 1e-9,
        s"id=$id capped=${prCapped(id)} plain=$r")
    }

    val lpaCapped = withCap(32) {
      LabelPropagation.run(e, LabelPropagation.Config(maxSteps = 3))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val lpaPlain = withCap(1 << 20) {
      LabelPropagation.run(e, LabelPropagation.Config(maxSteps = 3))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(lpaCapped == lpaPlain, "LPA labels exact-match under chunking")
  }
}
