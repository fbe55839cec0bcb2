package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Supplementary benchmarks (guide §1.4 noop-sink isolation) for the
  * SparkEntry queries the frozen `graft.Bench` list does not time —
  * the strategy variants and small derived views (round-6 verdict
  * "Next #6") — using the same methodology: the driver-provided SF
  * dir, best of `SPARK_GRAFT_BENCH_QREPS` interleaved sweeps, noop
  * sink. Prints ONE JSON line and writes it to
  * BENCH/last_bench_extra.json. `Bench.scala` itself is frozen for
  * measurement, so extra coverage lives here.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (cpus, cores) = graft.Env.cpus("SPARK_GRAFT_CPUS", 32)
    val qreps = graft.Env.int("SPARK_GRAFT_BENCH_QREPS", 2)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXTRA_OUT",
      "BENCH/last_bench_extra.json")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "cc_supplier_random", "cc_supplier_sampled", "cc_supplier_star",
      "cc_dense_labels", "cc_sizes", "degree_histogram",
      "triangles_per_vertex", "text_fingerprint")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "1") == "1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val passes = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (_ <- 1 to math.max(1, qreps); name <- names) {
      spark.sparkContext.setJobDescription(s"bench-extra: $name")
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          true
        } catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(160)
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      if (ok) {
        passes.getOrElseUpdate(name,
          scala.collection.mutable.ArrayBuffer.empty) += sec
        if (sec < best.getOrElse(name, Double.MaxValue)) best(name) = sec
      }
    }
    def jstr(s: String) = graft.JsonEscape.quote(s)
    val qs = best.map { case (k, v) => jstr(k) + ":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val ps = passes.map { case (k, v) =>
      jstr(k) + ":" + v.map(s => f"$s%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val json = s"""{"kind":"bench_extra","sf":${jstr(sfDir)},""" +
      s""""parallelism":$cores,"queries":$qs,"query_passes":$ps,""" +
      s""""errors":$errJson}"""
    try {
      val p = Paths.get(outFile)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      Files.writeString(p, json + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench-extra] could not write $outFile: $e")
    }
    println(json)
    spark.stop()
  }
}
