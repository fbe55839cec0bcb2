package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
    * event_type within the same event-time window become edges, emitted
    * when the watermark closes the window (append mode).
    *
    * Skew guard: a hot (window, event_type) group is capped at
    * `maxGroupSize` participants (the smallest user_ids, deterministic) —
    * the same contract as the batch `EdgeDerivation.repoEdges` cap. The
    * earlier stream-stream self-join formulation had no such cap and went
    * quadratic in output on a hot event_type within a window (a guaranteed
    * incident at ingest scale); as a windowed aggregation the per-group
    * state is one LINEAR set of distinct participants (watermark-expired)
    * and output per group is ≤ C(maxGroupSize, 2). If even linear
    * per-group state is too much (a single group with 10^8 distinct
    * users), the escalation path is `flatMapGroupsWithState` with a
    * cap-at-insert participant set — same emission contract. */
  def windowedCooccurrence(events: DataFrame, window_ : String = "10 minutes",
                           watermark: String = "20 minutes",
                           maxGroupSize: Int = 1000): DataFrame = {
    val grouped = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(slice(sort_array(collect_set(col("user_id"))), 1, maxGroupSize)
        .as("users"))
    grouped.select(col("w.start").as("window_start"),
        explode(flatten(transform(col("users"), (u, i) =>
          transform(slice(col("users"), i + 2, size(col("users"))), v =>
            struct(u.as("src"), v.as("dst")))))).as("e"))
      .select(col("window_start"), col("e.src").as("src"), col("e.dst").as("dst"))
  }

  final case class DocKey(content_sha: String)
  final case class DocIn(content_sha: String, doc_id: Long)
  final case class DedupEmit(content_sha: String, doc_id: Long, dup_of: Option[Long])

  /** Streaming exact dedup with custom per-key state
    * (`flatMapGroupsWithState`): the first document carrying a given
    * content hash is emitted as the survivor (`dup_of = None`); every
    * later arrival is emitted tagged with the survivor's id. State per
    * key = the survivor id (a Long) — the streaming analogue of
    * `Dedup.exactDedup`, for ingest pipelines that must drop duplicates
    * before they ever land. State never expires here (NoTimeout):
    * exact dedup is by definition unbounded-lookback; bound it at the
    * source (e.g. partition the hash space or front it with a TTL'd
    * approximate filter) when the key space outgrows the state store. */
  def streamingExactDedup(docs: Dataset[DocIn]): Dataset[DedupEmit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(d => d.content_sha)
      .flatMapGroupsWithState[Long, DedupEmit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (sha: String, rows: Iterator[DocIn], state: GroupState[Long]) =>
          val batch = rows.toSeq.sortBy(_.doc_id) // deterministic within batch
          if (batch.isEmpty) Iterator.empty
          else if (state.exists) {
            val survivor = state.get
            batch.iterator.map(d => DedupEmit(sha, d.doc_id, Some(survivor)))
          } else {
            val survivor = batch.head
            state.update(survivor.doc_id)
            Iterator.single(DedupEmit(sha, survivor.doc_id, None)) ++
              batch.tail.iterator.map(d => DedupEmit(sha, d.doc_id, Some(survivor.doc_id)))
          }
      }
  }

  /** Streaming twin of [[graft.operators.Temporal.sessionize]]: per-user
    * gap sessions via Spark's native `session_window` (merging windowed
    * state, watermark-expired). Emits one row per CLOSED session:
    * (user_id, session_start, session_end, n_events, sum_value).
    * Contract difference vs the batch operator, by session_window's
    * definition: `session_end` = last event + gap (the close time), not
    * the last event's ts, and sessions only emit once the watermark
    * passes their close — the standard streaming trade. State per key is
    * one interval + two counters; no per-event retention. */
  def streamingSessions(events: DataFrame, gap: String = "30 minutes",
                        watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

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
