package graft.tools

import graft.Env
import graft.graph.Generators
import graft.operators.{LabelPropagation, PageRank}
import org.apache.spark.sql.GraftLineage
import org.apache.spark.sql.GraftLineage._
import org.apache.spark.sql.SparkSession

/** One-JVM A/B of the iterative operators (PageRank, LPA) with the
  * partitioning-preserving barrier vs the round-3 legacy rewrap
  * (UnknownPartitioning → full edge-table re-shuffle every iteration).
  * Interleaved passes inside one process — the only protocol this
  * host's ±30-50% cross-JVM noise permits for ratios.
  *
  * Env: SPARK_GRAFT_AB_REPS (default 3), SPARK_GRAFT_BENCH_SCALE
  * (default 500000 → 4 M edges), SPARK_GRAFT_CPUS (default 32).
  */
object ProfileIterative {
  def main(args: Array[String]): Unit = {
    val reps = Env.int("SPARK_GRAFT_AB_REPS", 3)
    val scale = Env.long("SPARK_GRAFT_BENCH_SCALE", 500000L)
    val (cpus, cores) = Env.cpus("SPARK_GRAFT_CPUS", 32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ab-iterative")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val suite = Generators.benchSuite(spark, scale, seed = 42L).cutLineage()
    val edges = suite.count()
    System.err.println(s"[ab] suite edges=$edges scale=$scale cpus=$cpus")
    val keep = GraftLineage.plannedRddIds(suite)
    def sweep(): Unit = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => keep(id) }
      .values.foreach(_.unpersist(blocking = true))

    // Wall-clock on this host is ±30-50% noise; total shuffle WRITE
    // bytes per pass is deterministic for a fixed plan — the direct
    // evidence of whether an iteration re-shuffles its inputs.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    def pass(name: String, body: => Unit): (Double, Long) = {
      Thread.sleep(300) // let straggler listener events drain
      val b0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      sweep()
      Thread.sleep(300)
      (sec, shuffleBytes.get() - b0)
    }
    // warm-up both paths (JIT + codegen), unrecorded
    for (legacy <- Seq(false, true)) {
      GraftLineage.legacyRewrap = legacy
      PageRank.run(suite, None, PageRank.Config(maxIter = 2, tol = 0.0)); sweep()
    }
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean, Double, Long)]
    for (rep <- 1 to reps; legacy <- Seq(false, true)) {
      GraftLineage.legacyRewrap = legacy
      val (prS, prB) = pass("pagerank",
        PageRank.run(suite, None, PageRank.Config(maxIter = 8, tol = 0.0)))
      val (lpS, lpB) = pass("lpa",
        LabelPropagation.run(suite, None, LabelPropagation.Config(maxIter = 5)))
      results += (("pagerank", legacy, prS, prB)); results += (("lpa", legacy, lpS, lpB))
      System.err.println(f"[ab] rep=$rep legacy=$legacy pagerank=$prS%.1f s/${prB / 1e6}%.0f MB " +
        f"lpa=$lpS%.1f s/${lpB / 1e6}%.0f MB")
    }
    GraftLineage.legacyRewrap = false
    for (n <- Seq("pagerank", "lpa"); legacy <- Seq(false, true)) {
      val rs = results.collect { case (`n`, `legacy`, s, b) => (s, b) }
      println(f"AB $n legacy=$legacy best=${rs.map(_._1).min}%.2f s " +
        f"shuffleMB=${rs.map(_._2).min / 1e6}%.0f")
    }
    spark.stop()
  }
}
