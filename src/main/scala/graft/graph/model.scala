package graft.graph

/** Core typed rows of the link-graph engine.
  *
  * Mirrors the reference data model (spark-graphx 4.1.2: `Edge[ED]` with
  * `VertexId = Long`; see SURVEY.md §1.1) re-expressed as Spark SQL
  * Datasets: vertex ids are always Long, edges are (src, dst) rows, and
  * per-vertex algorithm state is an (id, value) row.
  */
final case class EdgeRow(src: Long, dst: Long)

/** Per-vertex rank state (PageRank). */
final case class VertexRank(id: Long, rank: Double)

/** Per-vertex long-valued state (CC component / LPA label / triangles). */
final case class VertexLabel(id: Long, label: Long)

/** CSR-style per-source adjacency block: sorted destination array for one
  * source vertex, bucketed for range/degree-aware placement
  * (reference analog: `graphx.impl.EdgePartition`'s clustered edge arrays,
  * SURVEY.md §1.1). `degree` is the source's TRUE total out-degree; a
  * vertex above the block cap spans several rows that share it
  * (`Adjacency.fromEdges`). */
final case class AdjacencyBlock(bucket: Int, src: Long, degree: Long, dsts: Array[Long])
