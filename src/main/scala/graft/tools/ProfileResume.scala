package graft.tools

import java.nio.file.Files

import graft.Env
import graft.graph.Generators
import graft.operators.{ConnectedComponents, LabelPropagation, PageRank, Traversal}
import graft.plans.CheckpointManager
import org.apache.spark.sql.{DataFrame, GraftLineage, SparkSession}
import org.apache.spark.sql.GraftLineage._
import org.apache.spark.sql.functions._

/** One-shot scale datapoint for the checkpoint/resume family (round-5
  * verdict Next #8): at the 16 M-edge bench suite, for each resumable
  * algorithm (CC hook, PageRank, LPA, seeded LPA, weighted SSSP) —
  *
  *  1. wall with checkpointing OFF vs ON at the algorithm's default
  *     `checkpointEvery` (arms interleaved in one JVM; wall here is
  *     ±30-50% host noise, so the delta is indicative, not a gate);
  *  2. a mid-run kill (rewind `_LATEST` to the first committed
  *     snapshot — the ResumeSpec pattern) followed by a resume, with
  *     the resumed output checked against the uninterrupted run
  *     (hash-exact for the all-integer algorithms, 1e-9 relative for
  *     PageRank — parquet round-trips permute row order, shifting
  *     neighbor-sum order ~1 ulp).
  *
  * SSSP/seeded-LPA seeds live in the suite's random/dense shapes (small
  * diameter); the 2 M-vertex chain would make Bellman–Ford O(n) rounds.
  *
  * Env: SPARK_GRAFT_BENCH_SCALE (default 2000000 → 16 M edges),
  * SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_RESUME_ALGOS
  * (comma list, default all of cc,pr,lpa,seeded,sssp).
  */
object ProfileResume {
  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-resume-$tag").toString

  /** Rewind `_LATEST` to the first committed snapshot (simulated kill).
    * Bounded scan: a dir with no manifest (run died pre-first-commit,
    * or a wrong path) must fail fast, not probe forever. */
  private def rewind(dir: String): Int = {
    val first = (1 to 100000).find { s =>
      Files.exists(java.nio.file.Paths.get(s"$dir/manifest-$s.json"))
    }.getOrElse(throw new IllegalStateException(
      s"no manifest-N.json under $dir — nothing to rewind to"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/_LATEST"), first.toString)
    Files.deleteIfExists(java.nio.file.Paths.get(s"$dir/._LATEST.crc"))
    first
  }

  private def hashOf(df: DataFrame, cols: String): (Long, Long) = {
    val r = df.agg(count(lit(1)),
      coalesce(expr(s"bit_xor(xxhash64($cols))"), lit(0L)))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val scale = Env.long("SPARK_GRAFT_BENCH_SCALE", 2000000L)
    val (cpus, cores) = Env.cpus("SPARK_GRAFT_CPUS", 32)
    val algos = sys.env.getOrElse("SPARK_GRAFT_RESUME_ALGOS",
      "cc,pr,lpa,seeded,sssp").split(",").map(_.trim).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-resume-scale")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val suite = Generators.benchSuite(spark, scale, seed = 42L).cutLineage()
    System.err.println(s"[resume-scale] suite edges=${suite.count()} scale=$scale cpus=$cpus")
    val keep: Set[Int] = GraftLineage.plannedRddIds(suite.toDF())
    // keepAlso: barriers that must survive the sweep (their blocks are
    // localCheckpoints — unpersisting one makes every later read throw
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND, the lineage is gone)
    def sweep(keepAlso: DataFrame*): Unit = {
      val k = keep ++ keepAlso.flatMap(df => GraftLineage.plannedRddIds(df))
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => k(id) }
        .values.foreach(_.unpersist(blocking = true))
    }
    def report(line: String): Unit = println(s"[resume-scale] $line")

    // ---- CC (hook) -----------------------------------------------------
    if (algos("cc")) {
      import ConnectedComponents.Config
      val (base, tBase) = timed(ConnectedComponents.run(suite, None, Config()))
      val baseHash = hashOf(base.labels.toDF(), "id, label")
      GraftLineage.release(base.labels, blocking = true); sweep()
      val dir = tmp("cc")
      val (ck, tCk) = timed(ConnectedComponents.run(suite, None,
        Config(checkpointDir = Some(dir), checkpointEvery = 1, runId = "rs-cc")))
      val ckSteps = ck.metrics.size
      GraftLineage.release(ck.labels, blocking = true); sweep()
      val (base2, tBase2) = timed(ConnectedComponents.run(suite, None, Config()))
      GraftLineage.release(base2.labels, blocking = true); sweep()
      val killedAt = rewind(dir)
      val (res, tRes) = timed(ConnectedComponents.resume(spark, dir,
        Config(runId = "rs-cc-resume")))
      val resHash = hashOf(res.labels.toDF(), "id, label")
      GraftLineage.release(res.labels, blocking = true); sweep()
      report(f"cc base=$tBase%.1f/$tBase2%.1f s ckptEvery1=$tCk%.1f s " +
        f"(supersteps=$ckSteps) killedAfterStep=$killedAt resume=$tRes%.1f s " +
        s"exact=${resHash == baseHash}")
      require(resHash == baseHash, s"cc resume mismatch: $resHash vs $baseHash")
    }

    // ---- PageRank ------------------------------------------------------
    if (algos("pr")) {
      import PageRank.Config
      val iters = 8
      val (base, tBase) = timed(PageRank.run(suite, cfg = Config(maxIter = iters, tol = 0.0)))
      val baseRanks = barrier(base.ranks); sweep(baseRanks)
      val dir = tmp("pr")
      val (ck, tCk) = timed(PageRank.run(suite, cfg = Config(maxIter = iters,
        tol = 0.0, checkpointDir = Some(dir), checkpointEvery = 2, runId = "rs-pr")))
      GraftLineage.release(ck.ranks, blocking = true); sweep(baseRanks)
      val killedAt = rewind(dir)
      val (res, tRes) = timed(PageRank.resume(spark, dir,
        Config(maxIter = iters, tol = 0.0, runId = "rs-pr-resume")))
      require(res.iterations == iters, s"pr resumed to ${res.iterations} != $iters")
      val maxRel = baseRanks.as("a").join(res.ranks.as("b"), "id")
        .agg(max(abs($"a.rank" - $"b.rank") /
          greatest(abs($"a.rank"), lit(1e-300)))).collect()(0).getDouble(0)
      GraftLineage.release(res.ranks, blocking = true)
      GraftLineage.release(baseRanks, blocking = true); sweep()
      report(f"pr($iters iters) base=$tBase%.1f s ckptEvery2=$tCk%.1f s " +
        f"killedAfterStep=$killedAt resume=$tRes%.1f s maxRelDiff=$maxRel%.2e")
      require(maxRel < 1e-9, s"pr resume drifted: $maxRel")
    }

    // ---- LPA -----------------------------------------------------------
    if (algos("lpa")) {
      import LabelPropagation.Config
      val iters = 8
      val (base, tBase) = timed(LabelPropagation.run(suite, cfg = Config(maxIter = iters)))
      val baseHash = hashOf(base.labels, "id, label")
      GraftLineage.release(base.labels, blocking = true); sweep()
      val dir = tmp("lpa")
      val (ck, tCk) = timed(LabelPropagation.run(suite, cfg = Config(maxIter = iters,
        checkpointDir = Some(dir), checkpointEvery = 2, runId = "rs-lpa")))
      GraftLineage.release(ck.labels, blocking = true); sweep()
      val killedAt = rewind(dir)
      val (res, tRes) = timed(LabelPropagation.resume(spark, dir,
        Config(maxIter = iters, runId = "rs-lpa-resume")))
      val resHash = hashOf(res.labels, "id, label")
      GraftLineage.release(res.labels, blocking = true); sweep()
      report(f"lpa($iters iters) base=$tBase%.1f s ckptEvery2=$tCk%.1f s " +
        f"killedAfterStep=$killedAt resume=$tRes%.1f s exact=${resHash == baseHash}")
      require(resHash == baseHash, s"lpa resume mismatch: $resHash vs $baseHash")
    }

    // ---- seeded LPA ----------------------------------------------------
    if (algos("seeded")) {
      import LabelPropagation.Config
      val iters = 8
      // 256 seeds spread over the random shape, 16 frozen labels
      val seeds = spark.range(256)
        .select((lit(2L * scale) + $"id" * 1000L).as("id"), ($"id" % 16).as("label"))
      val (base, tBase) = timed(LabelPropagation.runSeeded(suite, seeds,
        Config(maxIter = iters)))
      val baseHash = hashOf(base.labels, "id, label")
      GraftLineage.release(base.labels, blocking = true); sweep()
      val dir = tmp("seeded")
      val (ck, tCk) = timed(LabelPropagation.runSeeded(suite, seeds,
        Config(maxIter = iters, checkpointDir = Some(dir), checkpointEvery = 2,
          runId = "rs-seeded")))
      GraftLineage.release(ck.labels, blocking = true); sweep()
      val killedAt = rewind(dir)
      val (res, tRes) = timed(LabelPropagation.resumeSeeded(spark, dir,
        Config(maxIter = iters, runId = "rs-seeded-resume")))
      val resHash = hashOf(res.labels, "id, label")
      GraftLineage.release(res.labels, blocking = true); sweep()
      report(f"lpa_seeded($iters iters) base=$tBase%.1f s ckptEvery2=$tCk%.1f s " +
        f"killedAfterStep=$killedAt resume=$tRes%.1f s exact=${resHash == baseHash}")
      require(resHash == baseHash, s"seeded resume mismatch: $resHash vs $baseHash")
    }

    // ---- weighted SSSP -------------------------------------------------
    if (algos("sssp")) {
      // deterministic integer weights in [1, 10]; seeds in the dense shape
      val wedges = suite.toDF().select($"src", $"dst",
        (pmod(xxhash64($"src", $"dst"), lit(10L)) + 1L).as("weight"))
        .cutLineage()
      val seeds = Seq(3L * scale, 3L * scale + 7L)
      val (base, tBase) = timed(
        barrier(Traversal.weightedDistances(wedges, seeds)))
      val baseHash = hashOf(base, "source, id, dist")
      GraftLineage.release(base, blocking = true); sweep(wedges)
      val dir = tmp("sssp")
      val (ck, tCk) = timed(barrier(Traversal.weightedDistances(wedges, seeds,
        checkpointDir = Some(dir), checkpointEvery = 2, runId = "rs-sssp")))
      GraftLineage.release(ck, blocking = true); sweep(wedges)
      val killedAt = rewind(dir)
      val (res, tRes) = timed(barrier(
        Traversal.resumeWeightedDistances(spark, dir, runId = "rs-sssp-resume")))
      val resHash = hashOf(res, "source, id, dist")
      GraftLineage.release(res, blocking = true)
      GraftLineage.release(wedges.toDF(), blocking = true); sweep()
      report(f"sssp base=$tBase%.1f s ckptEvery2=$tCk%.1f s " +
        f"killedAfterStep=$killedAt resume=$tRes%.1f s exact=${resHash == baseHash}")
      require(resHash == baseHash, s"sssp resume mismatch: $resHash vs $baseHash")
    }

    report("ALL RESUME CHECKS PASSED")
    spark.stop()
  }
}
