package graft.tools

import graft.Env
import graft.graph.Generators
import graft.operators.ConnectedComponents
import org.apache.spark.sql.GraftLineage._
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** North-rule scaling evidence (N vs 4N "executors", sandbox substitute):
  * run the SAME headline CC job at two thread counts INSIDE ONE JVM,
  * alternating, and report best-of-reps throughput at each plus the
  * scaling efficiency.
  *
  * Two modes (SPARK_GRAFT_SCALING_MODE):
  *  - strong (default): identical input at both parallelism levels;
  *    efficiency = t_N / (4 · t_4N). This is the harsher gate — the
  *    serial driver floor (constant-time jobs per round) is amortized
  *    over a FIXED amount of work, so Amdahl binds.
  *  - weak: input grows with parallelism (scale × n/n_lo) — the form
  *    that matches the cluster rule's actual intent ("same job, 4× the
  *    executors, 4× the data, same wall-clock"); efficiency =
  *    t_N / t_4N with per-config throughput alongside.
  *
  * Why one JVM: this host's wall-clock noise between identical runs
  * minutes apart is ±30-50%, so an efficiency ratio computed from two
  * separate JVM invocations inherits ~±60% error. Adjacent runs in one
  * process share JIT state and host conditions; each (N, 4N) pair is
  * temporally adjacent, and the reported efficiency uses the best pass
  * per config out of `reps` interleaved passes. Every pass is emitted in
  * the JSON (`"passes":[[n,sec],...]`) so spread is auditable.
  *
  * Env: SPARK_GRAFT_SCALING_CPUS ("2,8"), SPARK_GRAFT_BENCH_SCALE
  * (default 2000000 → 16 M edges at the low config),
  * SPARK_GRAFT_SCALING_REPS (default 2), SPARK_GRAFT_SCALING_MODE
  * (strong|weak), SPARK_GRAFT_SCALING_OUT (default
  * BENCH/last_scaling.json, relative to the working directory).
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_SCALING_CPUS", "2,8")
      .split(",").map { v =>
        try v.trim.toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"env var SPARK_GRAFT_SCALING_CPUS must be comma-separated integers, got '$v'")
        }
      }.toSeq
    val scale = Env.long("SPARK_GRAFT_BENCH_SCALE", 2000000L)
    val reps = Env.int("SPARK_GRAFT_SCALING_REPS", 2)
    val mode = sys.env.getOrElse("SPARK_GRAFT_SCALING_MODE", "strong")
    require(mode == "strong" || mode == "weak",
      s"SPARK_GRAFT_SCALING_MODE must be strong|weak, got '$mode'")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALING_OUT",
      "BENCH/last_scaling.json")

    val nLo0 = cpus.min
    /** Weak mode scales the input with the thread count. */
    def scaleFor(n: Int): Long =
      if (mode == "weak") scale * n / nLo0 else scale
    // Shuffle partitions = n in BOTH modes. In weak mode data grows ∝ n,
    // so per-partition volume stays CONSTANT across configs (4d/4n =
    // d/n) — exactly the cluster analogy (adding executors adds
    // partitions), and each hi-config task builds the same-size hash
    // relations as the lo config. (An earlier n²/nLo variant made hi
    // tasks 4× smaller than lo tasks, measuring scheduling overhead
    // instead of weak scaling.)

    val times = scala.collection.mutable.Map.empty[Int, Double]
      .withDefaultValue(Double.MaxValue)
    // edges processed on the BEST pass of each config (superstep count —
    // and thus Σ edgesIn — can differ with shuffle.partitions, so work is
    // paired with its own config's best time, never another pass's)
    val processedAt = scala.collection.mutable.Map.empty[Int, Long]
    val inputAt = scala.collection.mutable.Map.empty[Int, Long]
    val all = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]

    for (rep <- 1 to reps; n <- cpus) {
      // one SparkContext at a time; master changes per measurement
      val spark = SparkSession.builder()
        .master(s"local[$n]")
        .appName(s"graft-scaling-$n")
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // warm-up (JIT + codegen) then the measured run on a fresh suite
      ConnectedComponents.run(Generators.random(spark, 2000, 4000, 1L))
        .labels.count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val suite = Generators.benchSuite(spark, scaleFor(n), seed = 42L).cutLineage()
      inputAt(n) = suite.count()
      val t0 = System.nanoTime()
      val res = ConnectedComponents.run(suite)
      ConnectedComponents.componentCount(res.labels)
      val sec = (System.nanoTime() - t0) / 1e9
      all += n -> sec
      if (sec < times(n)) {
        times(n) = sec
        processedAt(n) = res.metrics.map(_.edgesIn).sum
      }
      System.err.println(f"[scaling] mode=$mode rep=$rep local[$n] ${sec}%.1f s")
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }

    val (nLo, nHi) = (cpus.min, cpus.max)
    val factor = nHi.toDouble / nLo
    // strong: ideal is t_hi = t_lo / factor; weak: ideal is t_hi = t_lo.
    val eff =
      if (mode == "weak") times(nLo) / times(nHi)
      else times(nLo) / (factor * times(nHi))
    val metric =
      if (mode == "weak") "cc_weak_scaling_efficiency" else "cc_scaling_efficiency"
    val unit =
      if (mode == "weak") s"t$nLo/t$nHi (input x${factor.toInt} at $nHi)"
      else s"t$nLo/(${factor.toInt}*t$nHi)"
    def fmt(d: Double) = f"$d%.3f"
    val passes = all.map { case (n, s) => s"""[$n,${fmt(s)}]""" }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"$metric","value":${fmt(eff)},"unit":"$unit","mode":"$mode",""" +
      s""""best_sec":{"$nLo":${fmt(times(nLo))},"$nHi":${fmt(times(nHi))}},""" +
      s""""edges_per_sec":{"$nLo":${(processedAt(nLo) / times(nLo)).toLong},""" +
      s""""$nHi":${(processedAt(nHi) / times(nHi)).toLong}},""" +
      s""""passes":$passes,"reps":$reps,"bench_scale":$scale,""" +
      s""""cc_input_edges":{"$nLo":${inputAt(nLo)},"$nHi":${inputAt(nHi)}},""" +
      s""""cc_edges_processed":{"$nLo":${processedAt(nLo)},"$nHi":${processedAt(nHi)}}}"""
    try {
      val p = Paths.get(outFile)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      Files.writeString(p, json + "\n")
    } catch { case e: Throwable => // best-effort, but never silent
      System.err.println(s"[scaling] could not write $outFile: $e")
    }
    Env.appendHistory(json)
    println(json)
  }
}
