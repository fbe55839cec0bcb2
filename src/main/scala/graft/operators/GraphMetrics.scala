package graft.operators

import graft.graph.{Edge, GraphIO}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Degree and other per-vertex structural metrics. */
object GraphMetrics {

  /** Undirected degree per vertex over a canonical (normalized, deduped)
    * edge set. One shuffle: union both directions, hash-aggregate
    * (map-side partial agg absorbs hub skew — same reason the hook agg
    * needs no salting). */
  def degrees(edges: Dataset[Edge]): DataFrame = {
    val canon = GraphIO.canonical(edges)
    canon.select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
  }

  /** Degree histogram: how many vertices have each degree (diagnostics for
    * skew planning — drives hot-vertex thresholds). */
  def degreeHistogram(edges: Dataset[Edge]): DataFrame =
    degrees(edges).groupBy(col("degree")).agg(count(lit(1)).as("n_vertices"))
      .orderBy(col("degree"))
}
