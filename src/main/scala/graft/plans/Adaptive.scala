package graft.plans

import org.apache.spark.sql.SparkSession

/** Scale-adaptive partition counts for the iterative operators' loop
  * tables (guide §2.2/§2.5: derive partitioning from input size instead
  * of pinning a constant tuned for one deployment).
  *
  * The iterative loops hash-partition their adjacency/state tables ONCE
  * and reuse that partitioning every iteration — but the explicit
  * `repartition(n, col)` pins `n`, and AQE never coalesces a
  * user-specified partition count. With the session default (= core
  * count locally, larger on clusters) a small derived graph pays
  * per-task scheduling overhead × partitions × iterations for
  * partitions holding a few thousand rows each (measured on the bench
  * host: the 12-iteration katz loop dropped 8.7 s → 3.0 s when its
  * ~800k-row loop tables went from 32 to 8 partitions; per-stage task
  * overhead was the floor, not compute).
  *
  * `forRows` keeps partitions at ~`rowsPerPartition` rows, clamped to
  * [1, spark.sql.shuffle.partitions] — so at scale (rows ≥
  * rowsPerPartition × configured partitions) it returns exactly the
  * session setting and changes nothing; only small inputs coalesce.
  * The target is row-based, not byte-based, because these loop rows are
  * fixed-width (8-24 B): 100k rows ≈ 1-2 MB per task keeps a stage's
  * task count proportional to its data while staying far above the
  * per-task scheduling cost. Env override:
  * SPARK_GRAFT_ROWS_PER_PARTITION. */
object Adaptive {
  val rowsPerPartition: Long =
    math.max(1L, graft.Env.long("SPARK_GRAFT_ROWS_PER_PARTITION", 100000L))

  /** Partition count for a loop table of `rows` rows: ceil(rows /
    * rowsPerPartition), clamped to [1, session shuffle partitions]. */
  def forRows(spark: SparkSession, rows: Long): Int = {
    val conf = spark.sessionState.conf.numShufflePartitions
    val want = (math.max(0L, rows) + rowsPerPartition - 1) / rowsPerPartition
    math.max(1L, math.min(conf.toLong, want)).toInt
  }

  /** Re-key an already-materialized (barrier'd) loop table down to the
    * adaptive partition count when that is smaller than the session
    * setting; at scale (adaptive == session) this returns the input
    * untouched — no second pass. The superseded barrier's blocks are
    * released. Returns the frame to use plus the effective count. */
  def rekey(df: org.apache.spark.sql.DataFrame, rows: Long,
            keys: Seq[org.apache.spark.sql.Column])
      : (org.apache.spark.sql.DataFrame, Int) = {
    val spark = df.sparkSession
    val conf = spark.sessionState.conf.numShufflePartitions
    val p = forRows(spark, rows)
    // re-keying costs one extra pass over the table — only worth it when
    // the task-count reduction is substantial (≥4×); marginal shrinks
    // (e.g. 32 → 10 on a loop that converges in 3 rounds) measured as a
    // net loss on the bench host
    if (p * 4 > conf) (df, conf)
    else {
      val re = org.apache.spark.sql.GraftLineage.barrier(
        df.repartition(p, keys: _*))
      org.apache.spark.sql.GraftLineage.release(df)
      (re, p)
    }
  }
}
