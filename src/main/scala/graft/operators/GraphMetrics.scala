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

  /** A7 — inclusive prefix sum of a LONG column over a total order
    * (reference: OpenMP scan compaction, `cse613_utils.cpp:29-49`; in
    * Spark a Filter compacts for free — this is for when a running total
    * is genuinely wanted). The classic two-pass distributed scan, not a
    * global unpartitioned window (which funnels every row through ONE
    * reducer): (1) range-partition by the order column and take tiny
    * per-partition totals; (2) scan the p totals on the driver into
    * exclusive offsets; (3) per-partition running sums + the broadcast
    * offset of their partition. Both passes are p-way parallel. */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val ranged = org.apache.spark.sql.GraftLineage.barrier(
      df.repartitionByRange(p, col(orderCol)))
    val partSums = ranged.groupBy(spark_partition_id().as("pid"))
      .agg(sum(col(valueCol)).as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until p).scanLeft(0L)((acc, i) => acc + partSums.getOrElse(i, 0L))
    // per-range-partition scan: the partitionBy keeps p-way parallelism
    // (partition ids are stable — `ranged` is a materialized barrier)
    val w = Window.partitionBy(col("_pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    ranged.withColumn("_pid", spark_partition_id())
      .withColumn("prefix_sum",
        sum(col(valueCol)).over(w) +
          element_at(lit(offsets.toArray), col("_pid") + 1))
      .drop("_pid")
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
