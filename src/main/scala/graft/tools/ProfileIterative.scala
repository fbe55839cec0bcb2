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

    // suite only materialized for the synthetic-operator mode
    lazy val suite = {
      val s = Generators.benchSuite(spark, scale, seed = 42L).cutLineage()
      System.err.println(s"[ab] suite edges=${s.count()} scale=$scale cpus=$cpus")
      s
    }
    lazy val keep: Set[Int] =
      if (sys.env.contains("SPARK_GRAFT_AB_QUERY")) Set.empty
      else GraftLineage.plannedRddIds(suite)
    def sweep(): Unit = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => keep(id) }
      .values.foreach(_.unpersist(blocking = true))

    // Wall-clock on this host is ±30-50% noise; the noise-free signals
    // per pass are: total shuffle WRITE bytes (plan-deterministic —
    // whether an iteration re-shuffles its inputs), driver job count
    // (actions per iteration), and whole-stage-codegen COMPILE count
    // (whether per-iteration plans hit the compiled-class cache — the
    // driver-CPU cost a changing literal inflicts).
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def compiles: Long =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount

    final case class Obs(sec: Double, bytes: Long, jobs: Long, compiles: Long)
    def pass(body: => Unit): Obs = {
      Thread.sleep(300) // let straggler listener events drain
      val b0 = shuffleBytes.get(); val j0 = jobs.get(); val c0 = compiles
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      sweep()
      Thread.sleep(300)
      Obs(sec, shuffleBytes.get() - b0, jobs.get() - j0, compiles - c0)
    }
    // Arms: stable = shipping defaults (partitioning-preserving barrier +
    // broadcast dmass); literal = round-4 shape (dmass literal → a new
    // plan + codegen compile per iteration); rewrap = round-3 shape
    // (legacy barrier, iteration inputs re-shuffled).
    // SPARK_GRAFT_AB_ARMS selects a subset (comma list) — single-arm runs
    // measure compile counts WITHOUT the other arms thrashing the
    // 100-entry compiled-class cache between passes.
    val allArms = Seq(
      ("stable", false, false), ("literal", false, true), ("rewrap", true, true))
    val arms = sys.env.get("SPARK_GRAFT_AB_ARMS") match {
      case Some(sel) =>
        val names = sel.split(',').map(_.trim).toSet
        allArms.filter(a => names(a._1))
      case None => allArms
    }
    require(arms.nonEmpty, "SPARK_GRAFT_AB_ARMS matched no arm")
    // SPARK_GRAFT_AB_QUERY=<name>: measure the ACTUAL SparkEntry query on
    // SPARK_GRAFT_SF_DIR (driver-bench conditions: AQE on, noop sink)
    // instead of the synthetic-suite operators — the repro harness for
    // driver-artifact adjudications.
    val queryName = sys.env.get("SPARK_GRAFT_AB_QUERY")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def setArm(arm: (String, Boolean, Boolean)): Unit = {
      GraftLineage.legacyRewrap = arm._2
      PageRank.legacyDmassLiteral = arm._3
    }
    val measured: Seq[(String, () => Unit)] = queryName match {
      case Some(q) =>
        val fn = graft.SparkEntry.queries(q)
        Seq(q -> (() =>
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()))
      case None => Seq(
        "pagerank" -> (() => {
          PageRank.run(suite, None, PageRank.Config(maxIter = 8, tol = 0.0)); ()
        }),
        "lpa" -> (() => {
          LabelPropagation.run(suite, None, LabelPropagation.Config(maxIter = 5)); ()
        }))
    }
    // warm-up every path (JIT + codegen), unrecorded
    for (arm <- arms) {
      setArm(arm)
      measured.foreach(_._2()); sweep()
    }
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, String, Obs)]
    for (rep <- 1 to reps; arm <- arms) {
      setArm(arm)
      val line = measured.map { case (name, body) =>
        val o = pass(body())
        results += ((name, arm._1, o))
        f"$name=${o.sec}%.1f s/${o.bytes / 1e6}%.0f MB/${o.jobs} jobs/${o.compiles} compiles"
      }.mkString(" ")
      System.err.println(s"[ab] rep=$rep arm=${arm._1} $line")
    }
    setArm(allArms.head)
    for (n <- measured.map(_._1); arm <- arms) {
      val rs = results.collect { case (`n`, a, o) if a == arm._1 => o }
      println(f"AB $n arm=${arm._1} best=${rs.map(_.sec).min}%.2f s " +
        f"shuffleMB=${rs.map(_.bytes).min / 1e6}%.0f jobs=${rs.map(_.jobs).min} " +
        f"compiles=${rs.map(_.compiles).min}")
    }
    spark.stop()
  }
}
