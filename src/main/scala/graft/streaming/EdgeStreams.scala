package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming ingestion for the link-graph engine: edges arrive
  * as an unbounded stream (file drops / message bus), the engine maintains
  * incremental graph state and periodically snapshots an edge table the
  * batch algorithms (CC / PageRank / triangles) run on.
  *
  * The reference is batch-only (SURVEY.md §2.8) — this is engine-side
  * capability for the 100 TB pipeline: continuous co-occurrence edge
  * derivation with event-time watermarks, plus always-fresh degree state.
  */
object EdgeStreams {

  /** Parse a streaming text source of "u v" lines into an edge stream
    * (loader semantics: self-loops dropped, normalized). */
  def parseEdgeLines(lines: DataFrame): DataFrame =
    lines.select(split(trim(col("value")), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
      .select(element_at(col("t"), 1).cast("long").as("a"),
        element_at(col("t"), 2).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))

  /** Running (cumulative) degree per vertex over a streaming edge source —
    * an update-mode aggregation; state is the per-vertex count. */
  def runningDegrees(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))

  /** Windowed co-occurrence edge derivation from an event stream
    * (`user_id`, `event_type`, `ts`): users co-occurring on the same
    * event_type within the same event-time window become edges. The
    * watermark bounds state and drops late events; the self-join is
    * stream-stream with both sides watermarked (Spark manages the state
    * cleanup from the watermark + window bound). */
  def windowedCooccurrence(events: DataFrame, window_ : String = "10 minutes",
                           watermark: String = "20 minutes"): DataFrame = {
    val base = events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_type"), window(col("ts"), window_).as("w"))
    base.as("a").join(base.as("b"),
        col("a.w") === col("b.w") &&
        col("a.event_type") === col("b.event_type") &&
        col("a.user_id") < col("b.user_id"))
      .select(col("a.w.start").as("window_start"),
        col("a.user_id").as("src"), col("b.user_id").as("dst"))
  }

  /** Count of distinct edges per event-time window (append-mode windowed
    * agg with watermark — the progress/metrics stream). */
  def edgesPerWindow(edges: DataFrame, tsCol: String,
                     window_ : String = "10 minutes",
                     watermark: String = "20 minutes"): DataFrame =
    edges.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_))
      .agg(count(lit(1)).as("n_edges"))
      .select(col("window.start").as("window_start"), col("n_edges"))
}
