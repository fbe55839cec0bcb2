package graft.tools

import graft.graph.Generators
import graft.operators.ConnectedComponents
import graft.operators.ConnectedComponents.Config
import org.apache.spark.sql.GraftLineage._
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** North-rule scaling evidence (N vs 4N "executors", sandbox substitute):
  * run the SAME headline CC job at two thread counts INSIDE ONE JVM,
  * alternating, and report best-of-reps throughput at each plus the
  * scaling efficiency t_N / (4 · t_4N).
  *
  * Why one JVM: this host's wall-clock noise between identical runs
  * minutes apart is ±30-50%, so an efficiency ratio computed from two
  * separate JVM invocations inherits ~±60% error. Adjacent runs in one
  * process share JIT state and host conditions; each (N, 4N) pair is
  * temporally adjacent, and the reported efficiency uses the best pass
  * per config out of `reps` interleaved passes.
  *
  * Env: SPARK_GRAFT_SCALING_CPUS ("2,8"), SPARK_GRAFT_BENCH_SCALE
  * (default 2000000 → 16 M edges), SPARK_GRAFT_SCALING_REPS (default 2),
  * SPARK_GRAFT_SCALING_OUT (default BENCH/last_scaling.json).
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_SCALING_CPUS", "2,8")
      .split(",").map(_.trim.toInt).toSeq
    val scale = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE", "2000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALING_REPS", "2").toInt
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALING_OUT",
      "/root/repo/BENCH/last_scaling.json")

    val times = scala.collection.mutable.Map.empty[Int, Double]
      .withDefaultValue(Double.MaxValue)
    // edges processed on the BEST pass of each config (superstep count —
    // and thus Σ edgesIn — can differ with shuffle.partitions, so work is
    // paired with its own config's best time, never another pass's)
    val processedAt = scala.collection.mutable.Map.empty[Int, Long]
    val all = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    var edgesIn = 0L

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
      val suite = Generators.benchSuite(spark, scale, seed = 42L).cutLineage()
      edgesIn = suite.count()
      val t0 = System.nanoTime()
      val res = ConnectedComponents.run(suite)
      ConnectedComponents.componentCount(res.labels)
      val sec = (System.nanoTime() - t0) / 1e9
      all += n -> sec
      if (sec < times(n)) {
        times(n) = sec
        processedAt(n) = res.metrics.map(_.edgesIn).sum
      }
      System.err.println(f"[scaling] rep=$rep local[$n] ${sec}%.1f s")
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }

    val (nLo, nHi) = (cpus.min, cpus.max)
    val factor = nHi.toDouble / nLo
    val eff = times(nLo) / (factor * times(nHi))
    def fmt(d: Double) = f"$d%.3f"
    val passes = all.map { case (n, s) => s"""[$n,${fmt(s)}]""" }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"cc_scaling_efficiency","value":${fmt(eff)},"unit":"t$nLo/(${factor.toInt}*t$nHi)",""" +
      s""""best_sec":{"$nLo":${fmt(times(nLo))},"$nHi":${fmt(times(nHi))}},""" +
      s""""edges_per_sec":{"$nLo":${(processedAt(nLo) / times(nLo)).toLong},""" +
      s""""$nHi":${(processedAt(nHi) / times(nHi)).toLong}},""" +
      s""""passes":$passes,"reps":$reps,"bench_scale":$scale,""" +
      s""""cc_input_edges":$edgesIn,""" +
      s""""cc_edges_processed":{"$nLo":${processedAt(nLo)},"$nHi":${processedAt(nHi)}}}"""
    try {
      val p = Paths.get(outFile)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      Files.writeString(p, json + "\n")
    } catch { case _: Throwable => () }
    println(json)
  }
}
