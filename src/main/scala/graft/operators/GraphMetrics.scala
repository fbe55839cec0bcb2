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

  /** A6 — per-partition edge tally (reference: MPI_Gather of slice sizes,
    * `SparseSampling.hpp:169-183`); partition-balance diagnostics. */
  def partitionHistogram(df: DataFrame): DataFrame =
    df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("partition_id"))

  /** A7 — inclusive prefix sum over an ordered column (reference: OpenMP
    * scan compaction, `cse613_utils.cpp:29-49`; in Spark a Filter compacts
    * for free — this is the literal windowed form for when a running
    * total is genuinely wanted). Scale note: a global orderBy is a range
    * shuffle; the window runs per range partition. */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("prefix_sum", sum(col(valueCol)).over(w))
  }

  /** §2.5 — dense relabel: map arbitrary component labels to dense ids
    * [0, #components) in first-seen (ascending label) order — the
    * PPoPP renumbering (`SparseSampling.hpp:297-309`). The window runs
    * over DISTINCT labels only (#components rows, not #vertices); dense
    * ids are a presentation concern, canonical max-labels remain the
    * engine's native output. */
  def denseRelabel(labels: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("label"))
    val dense = labels.select(col("label")).distinct()
      .withColumn("dense_label", row_number().over(w).cast("long") - 1)
    labels.join(dense, "label").select(col("id"), col("dense_label"))
  }
}
