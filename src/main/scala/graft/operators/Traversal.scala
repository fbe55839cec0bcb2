package graft.operators

import org.apache.spark.sql.GraftLineage._
import graft.graph.{Edge, GraphIO}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Frontier-based graph traversal (Pregel-style BFS) — the unweighted
  * shortest-path operator a link-graph engine owes its users alongside
  * CC/PageRank/LPA/triangles. No reference counterpart (the reference is
  * CC-only); semantics are the textbook level-synchronous BFS.
  *
  * Scale design: one shuffle equi-join per hop (frontier ⋈ adjacency),
  * a left-anti join against the visited set to keep the frontier
  * minimal, and a lineage barrier per hop (same iterative-join rules as
  * the CC loop: without the barrier the plan and its statistics double
  * every hop). The visited set accumulates as a union of per-hop
  * barriers and is compacted into one barrier every `compactEvery` hops
  * so the anti-join probe side stays a short union. Frontier and
  * adjacency joins are both key-partitioned — no broadcast inside the
  * loop (pins blocks until convergence), no driver-side state.
  */
object Traversal {

  /** Hop distance from `source` to every reachable vertex (undirected),
    * as (id, dist). `maxHops` bounds the loop (diameter guard); vertices
    * beyond it are omitted, like unreachable ones. */
  def hopDistances(edges: Dataset[Edge], source: Long,
                   maxHops: Int = 64, compactEvery: Int = 8): DataFrame =
    multiSourceHopDistances(edges, Seq(source), maxHops, compactEvery)
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("dist"))

  /** Hop distances from EVERY vertex of `sources` simultaneously, as
    * (source, id, dist) — the level-synchronous multi-source BFS that
    * backs sampled centralities ([[Centrality.harmonic]]/[[Centrality.closeness]]).
    * One shuffle join per hop regardless of |sources|: the frontier
    * carries a source column, so k sources cost one traversal whose
    * frontier is at most k× wider — not k traversals. The visited set is
    * keyed by (source, id); everything else follows the single-source
    * plan (per-hop lineage barriers, periodic visited-set compaction,
    * no broadcast or driver state in the loop). */
  def multiSourceHopDistances(edges: Dataset[Edge], sources: Seq[Long],
                              maxHops: Int = 64, compactEvery: Int = 8): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(sources.nonEmpty, "multiSourceHopDistances: empty source set")
    scopedBlocks(spark) {
      val adj = GraphIO.bidirectional(GraphIO.canonical(edges))
        .toDF("v", "nbr").cutLineage()
      var frontier = spark.createDataset(sources.distinct).toDF("source")
        .select($"source", $"source".as("id"), lit(0L).as("dist"))
      var visitedParts = List[DataFrame](frontier)
      var hop = 0
      var frontierSize = 1L
      while (frontierSize > 0 && hop < maxHops) {
        hop += 1
        val visited = visitedParts.reduce(_ union _)
        val (next, m) = barrierObserved(
          frontier.join(adj, $"id" === $"v")
            .select($"source", $"nbr".as("id"), lit(hop.toLong).as("dist"))
            .distinct()
            .join(visited.select($"source", $"id"), Seq("source", "id"), "left_anti"),
          count(lit(1)).as("n"))
        frontierSize = Option(m("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
        frontier = next
        visitedParts ::= next
        if (hop % compactEvery == 0) {
          // compact the visited union into ONE barrier (it contains the
          // live frontier's rows too, but `next` itself stays untouched
          // and remains the frontier); free the superseded hop barriers
          val merged = barrier(visitedParts.reduce(_ union _))
          visitedParts.foreach(d => if (!(d eq next)) release(d))
          visitedParts = List(merged)
        }
      }
      val out = barrier(visitedParts.reduce(_ union _))
      adj.releaseLineage()
      out
    }
  }

  /** Vertices of the k-core: the maximal subgraph in which every vertex
    * has degree ≥ k, by iterative peeling — recompute degrees, drop
    * vertices under k, drop their edges, repeat to fixpoint. One degree
    * aggregation + two semi-joins per iteration, fixpoint detected from
    * the edge count observed inside the same materialization job. The
    * iteration count is data-dependent (≤ peel depth, NOT diameter);
    * each round is a full parallel pass, nothing driver-side. */
  def kCoreVertices(edges: Dataset[Edge], k: Int, maxIter: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    scopedBlocks(spark) {
      var e = GraphIO.canonical(edges).toDF().cutLineage()
      var m = e.count()
      var changed = m > 0
      var iter = 0
      while (changed && iter < maxIter) {
        iter += 1
        val keep = e.select(explode(array($"src", $"dst")).as("id"))
          .groupBy($"id").agg(count(lit(1)).as("dg"))
          .filter($"dg" >= k).select($"id")
        val (next, obs) = barrierObserved(
          e.join(keep.as("ks"), $"src" === $"ks.id", "left_semi")
            .join(keep.as("kd"), $"dst" === $"kd.id", "left_semi"),
          count(lit(1)).as("n"))
        val m2 = Option(obs("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
        release(e)
        e = next
        changed = m2 != m
        m = m2
      }
      require(!changed, s"k-core did not converge in $maxIter iterations")
      barrier(GraphIO.vertices(e.as[Edge]).toDF("id"))
    }
  }
}
