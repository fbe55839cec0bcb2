package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets

/** Durable superstep checkpointing with a manifest (north rule: runs are
  * resumable mid-iteration with per-partition lineage + metrics).
  *
  * Layout (Iceberg-style snapshot emulation — the Iceberg runtime jar is
  * absent from /opt/spark/jars and the env is offline, so a partitioned
  * Parquet + JSON-manifest layout stands in; SURVEY.md §4.5):
  *
  *   <dir>/step=<k>/<table>/...parquet
  *   <dir>/manifest-<k>.json         (atomic rename from a .tmp)
  *   <dir>/_LATEST                   (points at the highest valid manifest)
  *
  * The reference has no durability at all (in-memory recursion only,
  * `CSE613-MPI/my_MPI_cc.cpp:142-230`); this is new capability mandated by
  * the north rule. Uses the Hadoop FileSystem API so the same code runs on
  * local paths here and HDFS/S3A on a real cluster.
  */
final class CheckpointManager(spark: SparkSession, dir: String) {

  private def fs: FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write `tables` under step=k, then commit a manifest atomically. */
  def save(step: Int, tables: Map[String, DataFrame], meta: Map[String, String]): Unit = {
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/step=$step/$name")
    }
    val metaJson = (meta ++ Map("step" -> step.toString))
      .map { case (k, v) => s""""${k}":"${v}"""" }.mkString("{", ",", "}")
    val tablesJson = tables.keys.map(n => s""""$n":"$dir/step=$step/$n"""").mkString("{", ",", "}")
    val manifest = s"""{"step":$step,"meta":$metaJson,"tables":$tablesJson}"""
    writeAtomic(s"$dir/manifest-$step.json", manifest)
    writeAtomic(s"$dir/_LATEST", step.toString)
  }

  /** Latest committed step, if any. */
  def latestStep(): Option[Int] = {
    val p = new Path(s"$dir/_LATEST")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(readAll(in), StandardCharsets.UTF_8).trim.toInt)
      finally in.close()
    }
  }

  /** Load a checkpointed table of a given step. */
  def load(step: Int, table: String): DataFrame =
    spark.read.parquet(s"$dir/step=$step/$table")

  /** Append per-superstep metrics rows (SURVEY §4.5: a durable
    * metrics/lineage table next to the snapshots — the in-memory
    * `Result.metrics` Seq dies with the driver; this survives it and
    * accumulates across resumes). */
  def appendMetrics(rows: Seq[graft.graph.SuperstepMetrics]): Unit = {
    import spark.implicits._
    if (rows.nonEmpty)
      spark.createDataset(rows).coalesce(1)
        .write.mode("append").parquet(s"$dir/metrics")
  }

  /** The accumulated metrics table (all runs/resumes under this dir). */
  def loadMetrics(): DataFrame = spark.read.parquet(s"$dir/metrics")

  def meta(step: Int): Map[String, String] = {
    val p = new Path(s"$dir/manifest-$step.json")
    val in = fs.open(p)
    val s = try new String(readAll(in), StandardCharsets.UTF_8) finally in.close()
    // minimal flat-JSON field extraction for the "meta" object
    val metaPart = s.split("\"meta\":\\{", 2)(1).split("\\}", 2)(0)
    metaPart.split(",").filter(_.contains(":")).map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.trim.stripPrefix("\"").stripSuffix("\"") ->
        v.trim.stripPrefix("\"").stripSuffix("\"")
    }.toMap
  }

  private def readAll(in: java.io.InputStream): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    var n = in.read(tmp)
    while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
    buf.toByteArray
  }

  private def writeAtomic(path: String, content: String): Unit = {
    val tmp = new Path(path + ".tmp")
    val dst = new Path(path)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    fs.rename(tmp, dst)
    ()
  }
}
