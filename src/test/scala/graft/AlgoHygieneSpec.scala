package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.algos.{ConnectedComponents, LabelPropagation, ShortestPaths,
  StronglyConnectedComponents, SVDPlusPlus}

/** Regression pins for the round-5 algorithm-hygiene review: cap behavior
  * fails loudly instead of returning corrupt/partial output, results obey
  * the caller-owns-persisted-frame contract, auxiliary checkpoint block
  * sets are released, and argmax tie-breaks can't wrap on Long.MinValue. */
class AlgoHygieneSpec extends SparkTestBase {

  test("CC fails loudly when maxRounds trips before convergence " +
    "(silent duplicate-label corruption otherwise)") {
    // a 40-vertex path needs several small/large-star rounds; cap at 1
    val chain = edgesDF((0L until 39L).map(i => (i, i + 1)))
    val ex = intercept[IllegalArgumentException] {
      ConnectedComponents.run(chain, ConnectedComponents.Config(maxRounds = 1))
    }
    assert(ex.getMessage.contains("did not converge"))
    // and the same graph converges fine under the default cap
    val ok = ConnectedComponents.run(chain)
    assert(ok.select(countDistinct(col("component"))).first().getLong(0) == 1L)
    ok.unpersist(true)
  }

  test("LPA tie-break: Long.MinValue label WINS ties (negating the label " +
    "would wrap and make it lose)") {
    val lo = Long.MinValue
    // vertex 10 hears {lo, 5} — a 1-1 tie; smallest label must win
    val e = edgesDF(Seq((lo, 10L), (5L, 10L)))
    val labels = LabelPropagation.run(e, LabelPropagation.Config(maxSteps = 1))
    val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels.unpersist(true)
    assert(m(10L) == lo, s"tie involving Long.MinValue broke wrong: $m")
  }

  test("ShortestPaths result is a plain persisted frame the caller can " +
    "release (not localCheckpoint-backed)") {
    val out = ShortestPaths.run(edgesDF(Seq((1L, 2L), (2L, 3L))), Seq(3L))
    // a checkpoint-backed frame has NO CacheManager entry → level NONE;
    // the ownership contract requires a caller-releasable persist
    assert(out.storageLevel.useMemory || out.storageLevel.useDisk,
      s"result not CacheManager-persisted: ${out.storageLevel}")
    out.unpersist(true)
    assert(out.storageLevel == StorageLevel.NONE)
  }

  test("ShortestPaths finite maxIter = k-hop restriction (documented), " +
    "default runs to the fixed point") {
    val e = edgesDF(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val capped = ShortestPaths.run(e, Seq(4L), maxIter = 1)
    val got = capped.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    capped.unpersist(true)
    assert(got == Map(4L -> 0, 3L -> 1), s"k-hop cap: $got")
    val full = ShortestPaths.run(e, Seq(4L)) // default: fixed point
    assert(full.count() == 4)
    full.unpersist(true)
  }

  test("SCC releases its four auxiliary rotators' final block sets " +
    "(retains only the one contract-allowed set)") {
    val pairs = randomEdges(99, n = 30, m = 80)
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = StronglyConnectedComponents.run(edgesDF(pairs))
    out.unpersist(true)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1,
      s"stranded checkpoint sets: before=$before after=$after")
  }

  test("SVD++ rmse fails loudly on zero matched predictions") {
    import spark.implicits._
    val train = Seq((1L, 2L, 4.0)).toDF("src", "dst", "rating")
    val (state, u) = SVDPlusPlus.run(train, SVDPlusPlus.Conf(rank = 2, maxIters = 1))
    val disjoint = Seq((8L, 9L, 3.0)).toDF("src", "dst", "rating")
    val ex = intercept[IllegalArgumentException] {
      SVDPlusPlus.rmse(disjoint, state, SVDPlusPlus.Conf(rank = 2), u)
    }
    assert(ex.getMessage.contains("RMSE is undefined"))
    // matched pairs still work
    assert(!SVDPlusPlus.rmse(train, state, SVDPlusPlus.Conf(rank = 2), u).isNaN)
    state.unpersist(true)
  }
}
