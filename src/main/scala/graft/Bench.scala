package graft

import org.apache.spark.sql.GraftLineage._
import graft.graph.Generators
import graft.operators.ConnectedComponents
import graft.operators.ConnectedComponents.{CCStrategy, Config}
import graft.sources.EdgeDerivation
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): prints ONE JSON line.
  *
  * Headline metric (BASELINE.json): edges processed/sec summed over CC
  * supersteps to convergence, on the synthetic north-star suite
  * (chain/star/random/dense, FIXTURES.md §3) — plus per-query wall times
  * on the driver-provided SF dir.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS
  * (default 32), SPARK_GRAFT_BENCH_SCALE (vertices per shape, default
  * 400k → ~3.2M edges), SPARK_GRAFT_BENCH_STRATEGY (hook|star|sampled).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scale = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE", "400000").toLong
    val strategyName = sys.env.getOrElse("SPARK_GRAFT_BENCH_STRATEGY", "hook")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "1") == "1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val strategy = strategyName match {
      case "star"    => CCStrategy.AlternatingStar
      case "sampled" => CCStrategy.SampledContraction
      case _         => CCStrategy.HookAndContract
    }

    // Warm-up: JIT + codegen + shuffle machinery on a tiny run.
    ConnectedComponents.run(Generators.random(spark, 2000, 4000, 1L))
      .labels.count()

    // Headline: CC to convergence on the synthetic suite.
    val suite = Generators.benchSuite(spark, scale, seed = 42L)
      .cutLineage() // materialize input: time the algorithm, not the generator
    val inputEdges = suite.count()
    val t0 = System.nanoTime()
    val res = ConnectedComponents.run(suite, None, Config(strategy = strategy))
    val components = ConnectedComponents.componentCount(res.labels)
    val ccSec = (System.nanoTime() - t0) / 1e9
    val edgesProcessed = res.metrics.map(_.edgesIn).sum // Σ superstep inputs
    val edgesPerSec = edgesProcessed / ccSec

    // Per-query timings on the SF dir (headline operator set);
    // SPARK_GRAFT_BENCH_QUERIES=0 isolates the headline CC measurement.
    val runQueries = sys.env.getOrElse("SPARK_GRAFT_BENCH_QUERIES", "1") == "1"
    val queryNames = if (!runQueries) Seq.empty[String] else Seq(
      "cc_supplier", "cc_nation", "pagerank", "lpa", "triangles", "degrees",
      "edges_supplier", "dedup_exact_groups", "dedup_simhash",
      "dedup_minhash_bands", "ann_topk", "ann_topk_lsh", "text_stats",
      "text_lang", "content_sha")
    val queries = SparkEntry.queries
    val times = queryNames.flatMap { name =>
      queries.get(name).map { fn =>
        val q0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case _: Throwable => () }
        name -> (System.nanoTime() - q0) / 1e9
      }
    }
    // A larger derived-graph CC at this SF (part co-occurrence).
    val allTimes = if (!runQueries) times else {
      val pc0 = System.nanoTime()
      val partEdges = EdgeDerivation.partCooccurrence(spark, sfDir).cutLineage()
      val partRes = ConnectedComponents.run(partEdges, None, Config(strategy = strategy))
      partRes.labels.write.format("noop").mode("overwrite").save()
      times :+ ("cc_parts" -> (System.nanoTime() - pc0) / 1e9)
    }
    val qs = allTimes.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"cc_edges_per_sec","value":${edgesPerSec.toLong},"unit":"edges/sec",""" +
      s""""queries":$qs,"sf":"$sfDir",""" +
      s""""cc_input_edges":$inputEdges,"cc_edges_processed":$edgesProcessed,""" +
      s""""cc_seconds":${f"$ccSec%.3f"},"cc_supersteps":${res.metrics.size},""" +
      s""""cc_components":$components,"cc_strategy":"$strategyName",""" +
      s""""parallelism":$cpus,"bench_scale":$scale}""")
    spark.stop()
  }
}
