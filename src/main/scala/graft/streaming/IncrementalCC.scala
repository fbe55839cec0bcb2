package graft.streaming

import graft.graph.Edge
import graft.operators.ConnectedComponents
import graft.operators.ConnectedComponents.Config
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.GraftLineage
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Incremental connected components: maintain a canonical label table as
  * edge batches arrive (streaming micro-batches or periodic bulk loads),
  * without ever re-reading the raw edges already ingested.
  *
  * The merge carries the FOREST, not the graph: each known component
  * re-enters the union as its star (one id → label edge per non-root
  * vertex — a connectivity certificate), so a batch costs CC over
  * |known vertices| + |batch| edges regardless of how many raw edges
  * built the current state. This is the same compression the
  * reference's label array encodes between supersteps
  * (`my_MPI_cc.cpp:176` broadcast-labels analogue), applied across
  * batches instead of iterations. Canonical max-id labels make the
  * merge associative and order-independent: folding any batch
  * partition of an edge set reproduces the full-graph CC labels —
  * that invariant is what the `cc_incremental` oracle gate checks
  * (same DuckDB oracle as the one-shot query).
  *
  * At 100 TB scale the label table is the SMALL side (|V| rows vs |E|
  * raw edges); batches shuffle against it by id exactly like one CC
  * superstep, and the hook strategy's driver tail finish applies
  * unchanged. */
object IncrementalCC {

  /** Merge one batch of new edges into the current (id, label) table;
    * returns the updated canonical labels for every vertex seen so far.
    * The caller owns lifecycle: the result is the barrier'd label table
    * from the CC run; release the previous one after the swap (see
    * [[LabelMaintainer]]). */
  def mergeBatch(labels: DataFrame, newEdges: Dataset[Edge],
                 cfg: Config = Config()): DataFrame = {
    val spark = newEdges.sparkSession
    import spark.implicits._
    val stars = labels.filter($"id" =!= $"label")
      .select($"id".as("src"), $"label".as("dst")).as[Edge]
    // singleton components (id == label, no other member) have no star
    // edge — carry them through the vertex set instead
    val known = labels.select($"id".as("value")).as[Long]
    ConnectedComponents.run(stars.union(newEdges), Some(known), cfg)
      .labels.toDF()
  }

  /** Stateful label maintainer for `foreachBatch`: holds the barrier'd
    * label table across micro-batches, swapping and releasing the
    * superseded one per ingest. Thread-safe for the single-writer
    * micro-batch loop Structured Streaming guarantees. */
  final class LabelMaintainer(spark: SparkSession, cfg: Config = Config()) {
    import spark.implicits._
    @volatile private var current: DataFrame =
      Seq.empty[(Long, Long)].toDF("id", "label")

    /** The current canonical (id, label) table. */
    def labels: DataFrame = current

    /** Merge a batch and swap the state. Returns the new label table. */
    def ingest(batch: Dataset[Edge]): DataFrame = synchronized {
      val prev = current
      current = mergeBatch(prev, batch, cfg)
      // the empty seed frame is a LocalRelation, not a barrier — only
      // release real checkpointed state
      GraftLineage.release(prev)
      current
    }

    /** foreachBatch sink over a streaming (src, dst) frame: each
      * micro-batch is merged into the label table. Start/stop the
      * returned writer like any other streaming query. */
    def sink(edgeStream: DataFrame): DataStreamWriter[Row] =
      edgeStream.writeStream.foreachBatch {
        (batch: Dataset[Row], _: Long) =>
          ingest(batch.select(col("src").cast("long"),
            col("dst").cast("long")).as[Edge])
          ()
      }
  }
}
