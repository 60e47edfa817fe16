package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.runtime.{CheckpointConfig, Checkpoints, StateRotator}

/** Which vertex attributes the message expressions read — the relational
  * analog of the reference's `TripletFields` (spark-graphx 4.1.2
  * `TripletFields.{None,Src,Dst,All}`, the pruning hint `aggregateMessages`
  * takes so un-read vertex attrs are never shipped to edge partitions).
  * Here the pruning is structural: the triplet view only JOINS the
  * attribute sides that are declared, so a src-only messaging round never
  * pays the dst-attribute join at all.
  */
final case class TripletFields(useSrc: Boolean, useDst: Boolean)

object TripletFields {
  val None: TripletFields = TripletFields(useSrc = false, useDst = false)
  val Src: TripletFields = TripletFields(useSrc = true, useDst = false)
  val Dst: TripletFields = TripletFields(useSrc = false, useDst = true)
  val All: TripletFields = TripletFields(useSrc = true, useDst = true)
}

/** The reference's core user-facing primitive — `Graph.aggregateMessages`
  * (spark-graphx 4.1.2 `Graph.aggregateMessages[Msg](sendMsg, mergeMsg,
  * tripletFields)`; SURVEY.md §2.3 row 1) — as a public, generic
  * relational combinator. Messages are Column EXPRESSIONS over triplet
  * columns (a NULL message is "not sent"), and the merge function is what
  * it really is — an aggregation over recipients — so Catalyst gives
  * map-side partial combining, column pruning and codegen for free, where
  * the reference hand-rolls them per edge partition.
  *
  * Execution shape (the 100 TB story): vertex state (≤|V| rows) joins the
  * CACHED hash-partitioned adjacency blocks (shuffled-hash; the |E|-sized
  * side never moves), `explode` streams the per-edge message rows through
  * one codegen'd stage into a partially-aggregated groupBy on recipient —
  * the same vertex-shipping + per-partition combine the reference's
  * ReplicatedVertexView + edge-partition scan performs, expressed
  * declaratively. A dst-attrs-only round with src recipients uses the
  * cached REVERSE adjacency instead, so neither direction ever pays an
  * |E|-row-sized join against the vertex table unless the messages truly
  * read both endpoint attrs.
  */
object AggregateMessages {

  /** Triplet view of `(g, vertices)`: one row per directed edge with
    * columns `src`, `dst`, `src_degree` (out-degree of the source — free
    * from the adjacency block, the analog of the degree-joined graphs the
    * reference's algorithms build), plus `src_<a>` / `dst_<a>` for every
    * non-id column `a` of `vertices`, pruned by `fields`. */
  def triplets(g: PreparedGraph, vertices: DataFrame,
      fields: TripletFields = TripletFields.All): DataFrame =
    tripletsFrom(g, vertices, vertices, fields)

  /** Triplet view with independent attr providers per side — the hook the
    * Pregel active-set needs: restricting the SOURCE side to active
    * vertices while recipients keep full attrs is `EdgeDirection.Out`,
    * and vice versa. Joins are inner, so a side's triplets are restricted
    * to the vertices present in its provider. */
  private def tripletsFrom(g: PreparedGraph, srcVertices: DataFrame,
      dstVertices: DataFrame, fields: TripletFields): DataFrame = {
    var t: DataFrame = g.adjacency
    if (fields.useSrc) {
      val attrs = srcVertices.columns.filter(_ != "id").toSeq
      val v = srcVertices.select(
        col("id").as("__sid") +: attrs.map(a => col(a).as(s"src_$a")): _*)
      t = t.join(v.hint("SHUFFLE_HASH"), t("src") === col("__sid")).drop("__sid")
    }
    val srcAttrs =
      if (fields.useSrc) srcVertices.columns.filter(_ != "id").toSeq else Nil
    val keep = Seq(col("src"), col("degree").as("src_degree")) ++
      srcAttrs.map(a => col(s"src_$a"))
    t = t.select(keep :+ explode(col("dsts")).as("dst"): _*)
    if (fields.useDst) {
      val attrs = dstVertices.columns.filter(_ != "id").toSeq
      val v = dstVertices.select(
        col("id").as("__did") +: attrs.map(a => col(a).as(s"dst_$a")): _*)
      t = t.join(v.hint("SHUFFLE_HASH"), t("dst") === col("__did")).drop("__did")
    }
    t
  }

  /** Reverse-adjacency triplet view — columns `src`, `dst`, `dst_in_degree`
    * and `dst_<a>`: the efficient plan for src-recipient messages that read
    * only dst attrs (ShortestPaths' shape — data flows against the edges):
    * a |V|-row join against the cached reverse blocks + explode, never an
    * |E|-row join. */
  private def reverseTriplets(g: PreparedGraph, vertices: DataFrame,
      fields: TripletFields): DataFrame = {
    val attrs = vertices.columns.filter(_ != "id").toSeq
    var t: DataFrame = g.reverseAdjacency
    if (fields.useDst) {
      val v = vertices.select(
        col("id").as("__did") +: attrs.map(a => col(a).as(s"dst_$a")): _*)
      t = t.join(v.hint("SHUFFLE_HASH"), t("dst") === col("__did")).drop("__did")
    }
    val keep = Seq(col("dst"), col("in_degree").as("dst_in_degree")) ++
      (if (fields.useDst) attrs.map(a => col(s"dst_$a")) else Nil)
    t.select(keep :+ explode(col("srcs")).as("src"): _*)
  }

  /** One messaging round.
    *
    * @param g        prepared graph (cached adjacency; reverse blocks are
    *                 built lazily when a toSrc-only round needs them)
    * @param vertices per-vertex attrs (id + attr columns) the triplet view
    *                 exposes as `src_<a>` / `dst_<a>`
    * @param toDst    message delivered to each triplet's dst — an
    *                 expression over the triplet columns; NULL = not sent
    *                 (the analog of a `sendMsg` that doesn't emit)
    * @param toSrc    same, delivered to the triplet's src
    * @param merge    aggregate columns over the message column `msg`,
    *                 e.g. `Seq(sum("msg").as("m"))` — the commutative/
    *                 associative mergeMsg, map-side combined by Catalyst
    * @param fields   which vertex attrs the messages read (join pruning)
    * @return (id, merged columns) for vertices that received ≥1 message —
    *         reference semantics (`aggregateMessages`' VertexRDD contains
    *         only messaged vertices)
    */
  def run(g: PreparedGraph, vertices: DataFrame,
      toDst: Option[Column], toSrc: Option[Column], merge: Seq[Column],
      fields: TripletFields = TripletFields.All): DataFrame = {
    require(merge.nonEmpty, "at least one merge aggregate is required")
    rawMessages(g, vertices, vertices, toDst, toSrc, fields)
      .groupBy("id").agg(merge.head, merge.tail: _*)
  }

  /** Un-aggregated (id, msg) message stream with independent attr
    * providers per side (see [[Pregel]]'s active-set routing). */
  private[graph] def rawMessages(g: PreparedGraph, srcVertices: DataFrame,
      dstVertices: DataFrame, toDst: Option[Column], toSrc: Option[Column],
      fields: TripletFields): DataFrame = {
    require(toDst.isDefined || toSrc.isDefined,
      "at least one of toDst / toSrc is required")
    if (toDst.isEmpty && !fields.useSrc)
      reverseTriplets(g, dstVertices, fields)
        .select(col("src").as("id"), toSrc.get.as("msg"))
        .filter(col("msg").isNotNull)
    else {
      val t = tripletsFrom(g, srcVertices, dstVertices, fields)
      Seq(toDst.map(m => t.select(col("dst").as("id"), m.as("msg"))),
        toSrc.map(m => t.select(col("src").as("id"), m.as("msg"))))
        .flatten.reduce(_.union(_))
        .filter(col("msg").isNotNull)
    }
  }
}

/** The reference's `Pregel.apply` (spark-graphx 4.1.2 `Pregel$`; SURVEY.md
  * §2.4 row 1) as a relational driver loop: synchronous supersteps of
  * [[AggregateMessages.run]] + a vertex program, with per-superstep state
  * rotation (plan/lineage truncation + storage release —
  * `runtime.StateRotator`, the engine's `PeriodicGraphCheckpointer`),
  * optional durable checkpoints, and halting on an empty active set —
  * checked with a filter-count over the MATERIALIZED rotated state (an
  * in-memory |V|-row scan, the PageRank tol-mode pattern), never by
  * re-executing the messaging job. (A `Dataset.observe` mid-plan count
  * was measured unreliable here: any containing QueryExecution that
  * completes without the metric resolves the observation to an empty
  * row — Spark's ObservationManager completes eagerly on plan containment,
  * not metric availability.)
  *
  * Custom iterative computations (belief propagation, degree-capped BFS,
  * …) assemble from expressions; every engine algorithm's superstep shape
  * (cached adjacency ⋈ shrinking state, partial-agg message combine,
  * rotation hygiene) comes built in.
  */
object Pregel {

  final case class Config(
      maxIter: Int = Int.MaxValue,
      fields: TripletFields = TripletFields.All,
      /** Predicate over STATE columns selecting which vertices ORIGINATE
        * messages this superstep — the reference's active-set
        * (`aggregateMessagesWithActiveSet` + `activeDirection`). The
        * originator of a toDst message is the triplet's src (restricting
        * it = `EdgeDirection.Out`); of a toSrc message, the dst (= `In`);
        * with both directions each stream is restricted on its own
        * originator side (= `Either`). Recipient-side attrs always come
        * from the FULL state. None = every vertex sends (NULL messages
        * still unsent). */
      sendersPred: Option[Column] = scala.None,
      /** Halt when no state row satisfies this predicate, checked on the
        * MATERIALIZED rotated state — an in-memory |V|-row scan per
        * superstep (the same pattern as PageRank tol-mode), never a
        * re-execution of the messaging job. Defaults to `sendersPred`
        * (no senders ⇒ no further messages ⇒ fixed point — the
        * reference's zero-messages halt, one superstep earlier). When
        * neither is set the loop must be bounded by `maxIter`. */
      haltPred: Option[Column] = scala.None,
      numPartitions: Int = 0,
      checkpoint: Option[CheckpointConfig] = scala.None,
      resume: Boolean = false,
      /** Checkpoint log/state namespace (distinguishes concurrent loops). */
      algo: String = "pregel")

  /** Iterate until a superstep produces zero messages (or `maxIter`).
    *
    * @param init  initial per-vertex state (id + attr columns). The
    *              reference's `initialMsg` round is just an expression
    *              over the initial state — apply it here.
    * @param toDst / toSrc / merge / fields — see [[AggregateMessages.run]]
    * @param vprog (state, msgs) ⇒ next state (id + same attr columns):
    *              `msgs` holds (id, merged columns) ONLY for messaged
    *              vertices; the usual shape is a left join + per-column
    *              update so unmessaged vertices keep their state.
    *              CAUTION: when an output alias shadows an input column
    *              name, reference the OLD value dataframe-qualified
    *              (`state("x")`) inside higher-order-function lambdas — a
    *              bare `col("x")` there is captured by lateral-column-
    *              alias resolution and rebinds to the new sibling alias.
    * @return the final state frame (materialized; its storage lives until
    *         the session drops it, as with every engine algorithm)
    */
  def iterate(g: PreparedGraph, init: DataFrame,
      toDst: Option[Column], toSrc: Option[Column], merge: Seq[Column],
      vprog: (DataFrame, DataFrame) => DataFrame,
      cfg: Config = Config()): DataFrame = {
    require(toDst.isDefined || toSrc.isDefined,
      "at least one of toDst / toSrc is required")
    require(merge.nonEmpty, "at least one merge aggregate is required")
    val halt = cfg.haltPred.orElse(cfg.sendersPred)
    require(halt.isDefined || cfg.maxIter != Int.MaxValue,
      "unbounded Pregel loop: set sendersPred/haltPred or a finite maxIter")
    val spark = g.spark
    val rotator = new StateRotator(cfg.checkpoint, cfg.algo)
    val p = if (cfg.numPartitions > 0) cfg.numPartitions else g.numPartitions
    val resumed =
      if (cfg.resume) cfg.checkpoint.flatMap(Checkpoints.latest(spark, _, cfg.algo))
      else scala.None
    var step = resumed.map(_._1).getOrElse(0)
    var state = rotator.adopt(resumed.map(_._2).getOrElse(init))
    var active = halt.map(h => state.filter(h).count()).getOrElse(1L)
    while (active > 0 && step < cfg.maxIter) {
      step += 1
      val t0 = System.nanoTime()
      // active-set routing: each direction's ORIGINATOR side is restricted
      // to senders; the opposite (recipient) side reads full-state attrs —
      // reference EdgeDirection.Out / In / Either semantics exactly
      val senders = cfg.sendersPred.map(state.filter).getOrElse(state)
      val raw = (toDst, toSrc) match {
        case (Some(_), Some(_)) if cfg.sendersPred.isDefined =>
          AggregateMessages.rawMessages(g, senders, state, toDst, scala.None, cfg.fields)
            .union(AggregateMessages.rawMessages(g, state, senders, scala.None, toSrc, cfg.fields))
        case (Some(_), scala.None) =>
          AggregateMessages.rawMessages(g, senders, state, toDst, scala.None, cfg.fields)
        case (scala.None, Some(_)) =>
          AggregateMessages.rawMessages(g, state, senders, scala.None, toSrc, cfg.fields)
        case _ =>
          AggregateMessages.rawMessages(g, senders, senders, toDst, toSrc, cfg.fields)
      }
      val msgs = raw.groupBy("id").agg(merge.head, merge.tail: _*)
      state = rotator.rotate(vprog(state, msgs).coalesce(p), step)
      active = halt.map(h => state.filter(h).count()).getOrElse(1L)
      graft.runtime.Trace.log(
        f"${cfg.algo} superstep=$step active=$active sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      cfg.checkpoint.foreach { c =>
        Checkpoints.logSuperstep(state, c, cfg.algo, step, Double.NaN, active,
          (System.nanoTime() - t0) / 1000000)
      }
    }
    rotator.close()
    state
  }
}
