package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The remaining small vertex-set operators of the reference surface
  * (spark-graphx 4.1.2 `VertexRDD.{minus,diff}`, `GraphOps.
  * {pickRandomVertex,filter}`; SURVEY.md §2.3) — each a single
  * declarative plan. */
object VertexOps {

  /** Reference `VertexRDD.minus`: vertices of `a` whose ids are absent
    * from `b` — one anti-join, no shuffle of values beyond the key. */
  def minus(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b.select(col("id")), Seq("id"), "left_anti")

  /** Reference `VertexRDD.diff(other)`: the entries of `other` (id present
    * in BOTH frames) whose values differ from `a`'s — the changed-vertex
    * delta used to ship minimal updates. Null-safe comparison per value
    * column. */
  def diff(a: DataFrame, other: DataFrame): DataFrame = {
    val valueCols = other.columns.filter(_ != "id").toSeq
    require(valueCols.nonEmpty, "diff needs at least one value column")
    val aAliased = a.select(
      col("id") +: valueCols.map(c => col(c).as(s"__a_$c")): _*)
    other.join(aAliased, Seq("id"))
      .filter(valueCols.map(c => !(col(c) <=> col(s"__a_$c"))).reduce(_ || _))
      .select(col("id") +: valueCols.map(col): _*)
  }

  /** Reference `GraphOps.pickRandomVertex`, made deterministic-by-seed:
    * the vertex minimizing a seeded hash. Executes as a per-partition
    * top-1 + driver merge (TakeOrdered) — no global sort, no shuffle. */
  def pickRandomVertex(verts: DataFrame, seed: Long = 42L): Long =
    verts.orderBy(xxhash64(col("id"), lit(seed))).select(col("id"))
      .head().getLong(0)

  /** Reference `GraphOps.filter(preprocess, epred, vpred)`: compute
    * predicates on a PREPROCESSED view of the graph, then apply only the
    * structural result back to the original edges (subgraph on the view,
    * mask onto the original). `vpred` maps the view to the kept vertex-id
    * frame. */
  def filter(e: DataFrame,
      preprocess: DataFrame => DataFrame,
      epred: Column,
      vpred: DataFrame => DataFrame): DataFrame = {
    val view = preprocess(e)
    val kept = vpred(view)
    EdgeOps.mask(e, EdgeOps.subgraph(view.filter(epred), kept))
  }
}
