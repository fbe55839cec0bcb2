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
      .map { case (k, v) => s"${graft.JsonEscape.quote(k)}:${graft.JsonEscape.quote(v)}" }
      .mkString("{", ",", "}")
    val tablesJson = tables.keys
      .map(n => s"${graft.JsonEscape.quote(n)}:${graft.JsonEscape.quote(s"$dir/step=$step/$n")}")
      .mkString("{", ",", "}")
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
    val start = s.indexOf("\"meta\":{")
    require(start >= 0, s"manifest $p has no meta object")
    parseFlatStringObject(s, start + "\"meta\":".length)
  }

  /** Parse the flat `{"k":"v",...}` object starting at `from` (which must
    * point at the '{'), honoring string escapes — a value containing
    * `,`, `}` or an escaped quote round-trips correctly (the round-3
    * string-split parser silently mis-parsed those). Values here are
    * always strings; anything else fails loudly. */
  private def parseFlatStringObject(s: String, from: Int): Map[String, String] = {
    var i = from
    def fail(msg: String) =
      throw new IllegalArgumentException(s"manifest meta parse: $msg at offset $i")
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def parseString(): String = {
      if (s(i) != '"') fail("expected '\"'")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          if (i >= s.length) fail("truncated escape")
          if (s(i) == 'u' && i + 4 >= s.length) fail("truncated \\u escape")
          s(i) match {
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case '/'  => sb += '/'
            case 'n'  => sb += '\n'
            case 'r'  => sb += '\r'
            case 't'  => sb += '\t'
            case 'b'  => sb += '\b'
            case 'f'  => sb += '\f'
            case 'u'  =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => fail(s"unsupported escape '\\$other'")
          }
        } else sb += s(i)
        i += 1
      }
      if (i >= s.length) fail("unterminated string")
      i += 1 // closing quote
      sb.toString
    }
    skipWs()
    if (s(i) != '{') fail("expected '{'")
    i += 1
    val out = Map.newBuilder[String, String]
    skipWs()
    if (i < s.length && s(i) == '}') return out.result()
    var done = false
    while (!done) {
      skipWs()
      val k = parseString()
      skipWs()
      if (s(i) != ':') fail("expected ':'")
      i += 1
      skipWs()
      val v = parseString()
      out += k -> v
      skipWs()
      s(i) match {
        case ',' => i += 1
        case '}' => done = true
        case _   => fail("expected ',' or '}'")
      }
    }
    out.result()
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
