package org.apache.spark.sql

/** Lineage barrier for iterative Dataset algorithms.
  *
  * `Dataset.localCheckpoint(eager = true)` truncates the RDD lineage and
  * the logical plan, BUT the resulting `LogicalRDD` carries *origin
  * statistics* computed from the checkpointed plan. In an iterative
  * self-join loop those statistics multiply: Catalyst's size-only
  * estimation computes `sizeInBytes(join) = Π sizeInBytes(children)`, so
  * the BigInt doubles in bit-length every iteration — after ~20
  * iterations the driver spends minutes in `BigInteger.multiply` inside
  * `SizeInBytesOnlyStatsPlanVisitor` (observed: 157 s for a 2k-edge
  * superstep). This helper materializes via localCheckpoint and then
  * rewraps the checkpointed internal RDD in a fresh `LogicalRDD` with
  * default statistics, resetting the estimate chain each superstep.
  *
  * Lives in `org.apache.spark.sql` to reach the `private[sql]`
  * `internalCreateDataFrame`. Public Spark API only, no behavior patching.
  */
object GraftLineage {
  /** Eagerly materialize `df`, truncating RDD lineage, logical plan AND
    * statistics lineage. */
  def barrier(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val spark = cp.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      cp.queryExecution.toRdd, cp.schema, isStreaming = false)
  }

  /** [[barrier]] that also evaluates aggregate metrics over the rows in
    * the SAME materialization job (Dataset.observe) — saves the separate
    * count/convergence action per iteration that otherwise dominates
    * wall-clock in iterative loops (each extra action is a full job
    * round-trip). Returns the barrier'd frame plus the metric row. */
  def barrierObserved(df: DataFrame, metrics: Column*): (DataFrame, Map[String, Any]) = {
    val obs = Observation()
    val out = barrier(df.observe(obs, metrics.head, metrics.tail: _*))
    (out, obs.get) // blocks until the checkpoint job reports the metrics
  }

  /** `ds.cutLineage()` — the typed sugar for [[barrier]]. */
  implicit class GraftLineageOps[T](private val ds: Dataset[T]) extends AnyVal {
    def cutLineage(): Dataset[T] = {
      val dsC = ds.asInstanceOf[org.apache.spark.sql.classic.Dataset[T]]
      implicit val enc: Encoder[T] = dsC.encoder
      barrier(dsC.toDF()).as[T]
    }
  }
}
