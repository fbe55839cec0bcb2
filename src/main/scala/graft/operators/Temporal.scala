package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch temporal analytics over an event log (event_id, ts, user_id,
  * event_type, value, props) — the sessionization / as-of / funnel /
  * rollup family every activity pipeline needs (no reference
  * counterpart; the reference is CC-only; semantics are the standard
  * ones, e.g. the session-window and as-of-join definitions Spark's
  * own streaming `session_window` and Flink/Pandas `merge_asof`
  * document).
  *
  * Scale shape shared by the whole family: ONE shuffle keyed by
  * user_id, then per-user window functions or hash aggs — no range
  * joins, no per-user quadratics (the as-of join is the union+last
  * running-value formulation, not an inequality join). Timestamps are
  * exchanged as epoch MICROS (BIGINT) so engine comparisons are exact
  * integer arithmetic, and double sums are rounded to 6 dp by the
  * usual contract.
  */
object Temporal {

  /** Parquet event logs carry TIMESTAMP_NTZ; `unix_micros` wants an
    * instant. Cast once at operator entry — under the engine's pinned
    * UTC session timezone the naive wall-clock IS the instant, which
    * is also exactly how the DuckDB oracle's epoch_us reads it. */
  private def utcTs(events: DataFrame): DataFrame =
    events.withColumn("ts", col("ts").cast("timestamp"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapMinutes`. Output is one row per
    * session: (user_id, session_id, start_us, end_us, n_events,
    * sum_value) with session_id numbered 1.. per user in time order.
    * Ties on ts break by event_id, so the split is total-ordered and
    * reproducible. Plan: one shuffle by user_id; the lag + running sum
    * share one window spec; then a partial-agg'd hash agg. */
  def sessionize(events0: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val events = utcTs(events0)
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("ns",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("ns")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"))
  }

  /** As-of join: each event of type `right` gets the latest event of
    * type `left` from the SAME user with ts ≤ its own (the
    * merge_asof("backward") contract). Emitted per right event:
    * (user_id, right_id, right_us, left_id, left_us) — left side null
    * when no prior left event exists. Equal-ts tie rule: a left event
    * at exactly the right event's ts IS visible (≤), and among
    * equal-ts left events the largest event_id wins.
    *
    * Scale: the textbook inequality-join formulation is O(n·m) per
    * user; this is the union + running `last(..., ignoreNulls)` shape
    * instead — one shuffle by user_id, one sort, linear scan. */
  def asofJoin(events0: DataFrame, left: String, right: String): DataFrame = {
    val events = utcTs(events0)
    val tagged = events
      .filter(col("event_type").isin(left, right))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    // at equal ts the left (lookup) side sorts first so it is visible
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
        when(col("event_type") === left, 0).otherwise(1),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("left_id",
        last(when(col("event_type") === left, col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn("left_us",
        last(when(col("event_type") === left, unix_micros(col("ts"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === right)
      .select(col("user_id"), col("event_id").as("right_id"),
        unix_micros(col("ts")).as("right_us"), col("left_id"), col("left_us"))
  }

  /** Ordered funnel: how many users reach each stage prefix, where a
    * user reaches stage k when there is a strictly-increasing ts chain
    * e_1 < e_2 < … < e_k through stages(0..k-1). Output (stage,
    * stage_name, users), one row per stage.
    *
    * Computed as the chained earliest-completion times (greedy):
    * t_0(u) = min ts of stage-0 events, t_k(u) = min ts of stage-k
    * events strictly after t_{k-1}(u) — greedy minimality makes this
    * equivalent to the "exists a chain" predicate. Plan: one hash agg
    * + (k−1) equi-joins, ALL keyed by user_id so after the first
    * shuffle every stage join/agg is co-partitioned; no per-user event
    * arrays anywhere (a collect_list fold would break on a hot user at
    * ingest scale). */
  def funnel(events0: DataFrame, stages: Seq[String]): DataFrame = {
    val events = utcTs(events0)
    require(stages.nonEmpty, "funnel: need at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val f = events
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
    var cur = f.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("us")).as("t"))
    var rows = cur.select(lit(0L).as("stage"), col("user_id"))
    for (i <- 1 until stages.length) {
      cur = f.filter(col("event_type") === stages(i)).as("f")
        .join(cur.as("p"),
          col("f.user_id") === col("p.user_id") && col("f.us") > col("p.t"))
        .groupBy(col("f.user_id"))
        .agg(min(col("f.us")).as("t"))
      rows = rows.union(cur.select(lit(i.toLong).as("stage"), col("user_id")))
    }
    val stageNames = stages.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("stage", "stage_name")
    // left join FROM the stage list: a stage no user reached still
    // emits its row with users = 0. The broadcast hint goes on the
    // aggregated (non-preserved) side — Spark cannot build the preserved
    // side of an outer join, so the old broadcast(stageNames) on the
    // right of a right-outer join was silently ignored and the join fell
    // back to a shuffle; the post-agg side is ≤ |stages| rows, a
    // guaranteed-legal broadcast build.
    stageNames
      .join(broadcast(rows.groupBy(col("stage")).agg(count(lit(1)).as("users"))),
        Seq("stage"), "left")
      .select(col("stage"), col("stage_name"),
        coalesce(col("users"), lit(0L)).as("users"))
  }

  /** Hour × event-type rollup: (hour_us, event_type, n, users,
    * sum_value) — the basic OLAP cube slice, all codegen'd built-ins.
    * distinct-user count is exact (expand + two-phase agg). */
  def hourlyRollup(events: DataFrame): DataFrame =
    utcTs(events)
      .groupBy(
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users"),
        round(sum(col("value")), 6).as("sum_value"))

  /** Exponential time-decay activity score per user:
    * score = Σ value_i · exp(−ln2 · age_days_i / halfLifeDays), ages
    * measured from `asOfUs` (pass a pinned epoch so runs reproduce).
    * The per-term decay is pure arithmetic on exchanged integers; the
    * 6 dp round absorbs sum-order and 1-ulp exp() noise. */
  def decayedActivity(events: DataFrame, asOfUs: Long,
                      halfLifeDays: Double = 7.0): DataFrame = {
    val lambda = math.log(2.0) / (halfLifeDays * 86400.0 * 1000000.0)
    utcTs(events)
      .groupBy(col("user_id"))
      .agg(round(sum(col("value") *
        exp(lit(-lambda) * (lit(asOfUs) - unix_micros(col("ts"))).cast("double"))), 6)
        .as("score"))
  }

  /** Distribution of an integer property extracted from the JSON props
    * column: (k, n). The extraction is Spark's codegen'd
    * get_json_object; rows whose props lack the key are dropped. */
  def propsHistogram(events: DataFrame, key: String): DataFrame =
    events
      .select(get_json_object(col("props"), s"$$.$key").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))

  /** DIRECTED co-activity edges: within each tumbling bucket, an edge
    * from the user whose FIRST `eventType` event in the bucket is
    * earlier to each later one (ties on first-event time break by
    * smaller→larger user_id). Relative order flips across buckets, so
    * unlike [[coactivityEdges]] this digraph has real cycles — the
    * input the SCC operator is gated on. Hot-bucket cap like
    * [[coactivityEdges]] but with its own deterministic keep-rule: the
    * bucket's `maxGroupSize` EARLIEST (first_us, user_id) arrivals,
    * where the undirected variant keeps the smallest user_ids — both
    * rules are replicated in the DuckDB oracles (QUALIFY), so the
    * gates stay exact past the cap. */
  def coactivityDirectedEdges(events: DataFrame, eventType: String,
                              bucketMinutes: Int = 10,
                              maxGroupSize: Int = 1000): DataFrame = {
    val bucketUs = bucketMinutes.toLong * 60L * 1000000L
    val firsts = utcTs(events)
      .filter(col("event_type") === eventType)
      .groupBy(expr(s"unix_micros(ts) div ${bucketUs}L").as("b"), col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("first_us"))
    // cap BEFORE collecting (capGroups row_number ≤ cap, ordered by the
    // same (first_us, user_id) keep-rule the oracle's QUALIFY replays) —
    // a hot bucket must never materialize its full participant set in
    // one aggregation buffer; the collect below sees ≤ maxGroupSize rows
    graft.plans.Skew.capGroups(firsts, Seq(col("b")),
        struct(col("first_us"), col("user_id")), maxGroupSize)
      .groupBy(col("b"))
      .agg(sort_array(collect_list(
        struct(col("first_us"), col("user_id")))).as("us"))
      .select(explode(flatten(transform(col("us"), (u, i) =>
        transform(slice(col("us"), i + 2, size(col("us"))), v =>
          struct(u.getField("user_id").as("src"),
            v.getField("user_id").as("dst")))))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
  }

  /** Co-activity edges: distinct (src < dst) user pairs that BOTH emit
    * an event of `eventType` inside the same `bucketMinutes` tumbling
    * window — the batch twin of
    * [[graft.streaming.EdgeStreams.windowedCooccurrence]], with the
    * same deterministic hot-group cap (smallest user_ids kept). Feed
    * the result to ConnectedComponents for co-activity communities.
    * Plan: hash agg to per-(bucket) sorted participant lists (capped),
    * pair expansion ≤ C(cap,2) per bucket, then a distinct. */
  def coactivityEdges(events: DataFrame, eventType: String,
                      bucketMinutes: Int = 10,
                      maxGroupSize: Int = 1000): DataFrame = {
    val bucketUs = bucketMinutes.toLong * 60L * 1000000L
    val participants = utcTs(events)
      .filter(col("event_type") === eventType)
      // `div` = exact integral division (a double quotient + cast would
      // round differently across engines at bucket boundaries)
      .select(expr(s"unix_micros(ts) div ${bucketUs}L").as("b"), col("user_id"))
      .distinct()
    // cap BEFORE collecting (smallest user_ids — the oracle's QUALIFY
    // keep-rule): bounded agg buffer even on a hot bucket
    graft.plans.Skew.capGroups(participants, Seq(col("b")),
        col("user_id"), maxGroupSize)
      .groupBy(col("b"))
      .agg(sort_array(collect_list(col("user_id"))).as("users"))
      .select(explode(flatten(transform(col("users"), (u, i) =>
        transform(slice(col("users"), i + 2, size(col("users"))), v =>
          struct(u.as("src"), v.as("dst")))))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
  }
}
