package graft.operators

import org.apache.spark.sql.GraftLineage._
import org.apache.spark.sql.GraftLineage
import graft.graph.{Edge, GraphIO, SuperstepMetrics}
import graft.plans.CheckpointManager
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** PageRank by power iteration (north-rule operator; no reference
  * implementation — semantics from Page et al. 1999 with the standard
  * dangling-mass redistribution).
  *
  * Undirected link graphs are treated as symmetric directed graphs (each
  * edge contributes both directions), so out-degree = degree and dangling
  * vertices only arise from the optional isolated-vertex set.
  *
  * Scale design: the edge table is weighted once up-front
  * (`1/outdeg(src)`) and persisted — each iteration is then exactly one
  * shuffle-join (ranks ⋈ weighted edges on src) + one hash aggregation
  * (groupBy dst, partial agg absorbs in-degree skew). Convergence delta
  * AND next iteration's dangling mass are folded into the rank
  * materialization job via `Dataset.observe`, so each iteration is ONE
  * Spark job — at 100 iterations that removes ~200 driver round-trips
  * versus separate agg actions (the measured serial floor of the
  * iterative suite). Rank tables are hash-partitioned by id throughout;
  * superseded rank snapshots release their checkpoint blocks eagerly.
  */
object PageRank {

  final case class Config(
      damping: Double = 0.85,
      maxIter: Int = 100,
      /** stop when the L1 delta between iterations falls below this.
        * Set 0.0 to run exactly `maxIter` iterations (early exit only at
        * an exact fixpoint, where further iterations are no-ops) — the
        * pinned-iteration mode used by the DuckDB oracle. */
      tol: Double = 1e-10,
      /** when `checkpointDir` is set, write a durable (ranks,
        * transition-table) snapshot every this many iterations —
        * [[resume]] continues from the latest one (the north rule's
        * mid-iteration resumability, same CheckpointManager + metrics
        * table as the CC strategies). The static transition table is
        * written once, at the first snapshot. */
      checkpointEvery: Int = 8,
      checkpointDir: Option[String] = None,
      runId: String = "pagerank",
      /** A/B knob (see [[legacyDmassLiteral]]): bake the per-iteration
        * dangling mass into the plan as a literal instead of the
        * default one-row broadcast. `None` (the default) reads the
        * process-wide [[legacyDmassLiteral]] ONCE at run start, so a
        * run's arm can never flip mid-iteration even if a concurrent
        * A/B harness rewrites the global between its passes. */
      dmassLiteral: Option[Boolean] = None)

  final case class Result(ranks: DataFrame, iterations: Int, l1Delta: Double)

  /** Measurement knob (A/B): bake the per-iteration dangling mass into
    * the plan as a literal — the round-≤4 shape. A changing literal makes
    * every iteration a NEW plan: Catalyst re-optimizes it and, because
    * the literal is inlined into the generated Java, every whole-stage
    * codegen fragment misses the compiled-class cache and pays a fresh
    * Janino compile — per-iteration driver CPU that scales with driver
    * contention, not with data. The default carries the scalar as a
    * one-row broadcast so the generated code is identical across
    * iterations and only iteration 1 compiles. Mutable so a one-JVM A/B
    * harness can flip it between passes (graft.tools.ProfileIterative). */
  @volatile var legacyDmassLiteral: Boolean =
    sys.env.get("SPARK_GRAFT_PR_DMASS_LITERAL").contains("1")

  def run(edges: Dataset[Edge],
          extraVertices: Option[Dataset[Long]] = None,
          cfg: Config = Config()): Result =
    runWeighted(edges, extraVertices, None, cfg)

  /** Personalized PageRank: the restart (teleport) distribution is
    * uniform over `sources ∩ V` instead of over all of V, and dangling
    * mass redistributes to the sources — the standard random-walk-with-
    * restart ranking used for seed-relative link relevance. Same
    * iteration machinery and plan shape as [[run]]. */
  def personalized(edges: Dataset[Edge],
                   sources: Dataset[Long],
                   extraVertices: Option[Dataset[Long]] = None,
                   cfg: Config = Config()): Result =
    runWeighted(edges, extraVertices, Some(sources), cfg)

  /** PageRank over a WEIGHTED undirected graph: input rows
    * (src, dst, weight), arbitrary orientation, duplicates summed,
    * self-loops dropped. Transition probability u→v =
    * weight(u,v) / strength(u) with strength = Σ incident weights —
    * the natural random walk on a co-occurrence-counted link graph
    * (an unweighted run over the same edges ignores tie strength).
    * Same iteration machinery/plan as [[run]]; optional restart set =
    * personalized weighted PageRank. */
  def runWeightedGraph(weighted: DataFrame,
                       sources: Option[Dataset[Long]] = None,
                       extraVertices: Option[Dataset[Long]] = None,
                       cfg: Config = Config()): Result = {
    val spark = weighted.sparkSession
    import spark.implicits._
    val canonW = weighted
      .select(least($"src", $"dst").as("src"), greatest($"src", $"dst").as("dst"),
        $"weight")
      .filter($"src" =!= $"dst")
      .groupBy($"src", $"dst").agg(sum($"weight").as("weight"))
    // materialized once — three consumers below (strength, the weighted
    // join, the vertex set) each re-ran the whole weighted derivation
    val bidirW = GraftLineage.barrier(
      canonW.select(explode(array(
          struct($"src".as("src"), $"dst".as("dst"), $"weight"),
          struct($"dst".as("src"), $"src".as("dst"), $"weight"))).as("e"))
        .select($"e.src".as("src"), $"e.dst".as("dst"), $"e.weight".as("weight")))
    val strength = bidirW.groupBy($"src").agg(sum($"weight").as("st"))
    val wEdgesRaw = bidirW.join(strength, "src")
      .select($"src", $"dst",
        ($"weight".cast("double") / $"st".cast("double")).as("w"))
    val vertsRaw = bidirW.select($"src".as("id")).distinct()
    val res = iterate(spark, vertsRaw, wEdgesRaw, extraVertices, sources, cfg)
    GraftLineage.release(bidirW)
    res
  }

  private def runWeighted(edges: Dataset[Edge],
                          extraVertices: Option[Dataset[Long]],
                          restart: Option[Dataset[Long]],
                          cfg: Config): Result = {
    val spark = edges.sparkSession
    import spark.implicits._
    // canonical edges materialized ONCE: the lazy plan was re-evaluated
    // by every consumer below (bidirectional ×2 through the outdeg join,
    // vertices once more) — for derived co-occurrence inputs each
    // re-evaluation is the full upstream self-join (guide §1.2)
    val canon = GraphIO.canonical(edges).cutLineage()
    val directed = GraphIO.bidirectional(canon)
    val outDegPre = directed.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    val wEdgesRaw = directed.join(outDegPre, "src")
      .select($"src", $"dst", (lit(1.0) / $"outdeg").as("w"))
    val res = iterate(spark, GraphIO.vertices(canon).toDF("id"), wEdgesRaw,
      extraVertices, restart, cfg)
    canon.releaseLineage()
    res
  }

  /** Shared power-iteration core over a prepared transition table
    * (src, dst, w) with Σ_dst w = 1 per non-dangling src. */
  private def iterate(spark: org.apache.spark.sql.SparkSession,
                      vertsRaw: DataFrame,
                      wEdgesRaw: DataFrame,
                      extraVertices: Option[Dataset[Long]],
                      restart: Option[Dataset[Long]],
                      cfg: Config): Result = {
    import spark.implicits._
    val verts = vertsRaw
      .union(extraVertices.map(_.toDF("id")).getOrElse(spark.emptyDataset[Long].toDF("id")))
      .distinct()
      .cutLineage()
    val n = verts.count()
    if (n == 0) // empty graph → empty rank table (not an error)
      return Result(verts.select($"id", lit(0.0).as("rank")), 0, 0.0)

    // Restart weight rw(v): 1/n uniform, or 1/|S∩V| over the sources.
    // rank_{t+1} = (1-d)·rw + d·(Σ_in w·rank_t + danglingMass·rw).
    // Uniform runs keep rw as a LITERAL (constant-folded by Catalyst) —
    // carrying a constant column through every iteration's shuffle
    // would cost 8 bytes × vertices × iterations at scale for nothing;
    // only personalized runs carry a real per-vertex rw column.
    val personalized = restart.isDefined
    val vertsRw: DataFrame = restart match {
      case None => verts.select($"id")
      case Some(src) =>
        val sDf = src.toDF("sid").distinct()
        val nS = verts.join(sDf, $"id" === $"sid", "left_semi").count()
        require(nS > 0, "personalized PageRank: no source vertex is in the graph")
        verts.join(broadcast(sDf), $"id" === $"sid", "left")
          .select($"id",
            when($"sid".isNotNull, lit(1.0 / nS)).otherwise(lit(0.0)).as("rw"))
    }
    val rw: org.apache.spark.sql.Column = if (personalized) $"rw" else lit(1.0 / n)
    val rwCols = if (personalized) Seq(col("rw")) else Seq.empty[org.apache.spark.sql.Column]

    // Weighted adjacency: one row per directed edge with its transition
    // weight, hash-partitioned by src ONCE — the per-iteration join then
    // reuses this partitioning (no edge shuffle per iteration; the rank
    // side is already partitioned by id from the previous groupBy).
    // The row count is observed in the same materialization and drives
    // the adaptive loop partition count (guide §2: derive partitioning
    // from input size; at scale the rekey is a no-op, see
    // [[graft.plans.Adaptive]]).
    val (wEdges1, wObs) = barrierObserved(
      wEdgesRaw.repartition(spark.sessionState.conf.numShufflePartitions,
        $"src"),
      count(lit(1)).as("n"))
    val (wEdges, p) = graft.plans.Adaptive.rekey(wEdges1,
      Option(wObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L), Seq($"src"))

    // Dangling = vertices with no out-edges (isolated ones here). A flag
    // column on the rank table; dangling mass for iteration t+1 is
    // observed during iteration t's rank materialization — no extra job.
    // srcIds scans the barrier'd wEdges (the raw derivation was
    // re-evaluated per consumer before), and the flag is ONE left join
    // instead of the old anti+semi union (two srcIds evaluations).
    val srcIds = wEdges.select($"src".as("id")).distinct()
      .withColumn("_src", lit(true))
    val vertsFlagged = vertsRw.as("v")
      .join(srcIds, Seq("id"), "left")
      .select(Seq($"id") ++ rwCols :+ $"_src".isNull.as("dangling"): _*)

    val (ranks0, m0) = barrierObserved(
      vertsFlagged
        .select(Seq($"id", rw.as("rank")) ++ rwCols :+ $"dangling": _*)
        .repartition(p, $"id"),
      coalesce(sum(when($"dangling", $"rank")), lit(0.0)).as("dmass"),
      coalesce(sum(when($"dangling", 1L)), lit(0L)).as("dangn"))
    GraftLineage.release(verts) // ranks0 is materialized; verts is done
    val dangN = Option(m0("dangn")).map(_.asInstanceOf[Long]).getOrElse(0L)
    // Pinned-iteration fast path (guide §1.2: cut the pass count): with
    // tol = 0 there is no convergence read, and with ZERO dangling
    // vertices the dangling mass is identically 0.0, so its
    // per-iteration observation is dead weight — every iterate() caller
    // builds a bidirectional graph, so dangN == 0 also means every
    // vertex has in-edges and the contribs aggregation alone reaches the
    // full vertex set. Arithmetic per iteration is unchanged: with
    // dmass = 0.0 the old rank expression d·(contrib + 0.0·rw) is
    // bit-identical to d·contrib. Checkpointed runs keep the observed
    // loop (resume needs the per-iteration dmass state).
    if (cfg.tol == 0.0 && cfg.checkpointDir.isEmpty && dangN == 0L)
      pinnedLoop(spark, wEdges, ranks0,
        if (personalized) None else Some(1.0 / n), cfg)
    else
      loop(spark, wEdges, ranks0, m0("dmass").asInstanceOf[Double],
        if (personalized) None else Some(1.0 / n), startIter = 0, cfg,
        wedgesStep0 = None)
  }

  /** Pinned-iteration loop (tol = 0, zero dangling vertices, no durable
    * checkpoints): `SPARK_GRAFT_ITER_CHUNK` join+agg iterations compose
    * into ONE plan per lineage barrier — fewer driver actions and rank
    * materializations than one barrier per iteration, with the chunk
    * kept small so plan size and size-only estimates stay bounded.
    * l1Delta is not computed on this path (reported as NaN). */
  private def pinnedLoop(spark: org.apache.spark.sql.SparkSession,
                         wEdges: DataFrame, ranks0: DataFrame,
                         rwLit: Option[Double], cfg: Config): Result = {
    import spark.implicits._
    val personalized = rwLit.isEmpty
    val rw: org.apache.spark.sql.Column = rwLit.map(lit(_)).getOrElse($"rw")
    // personalized runs rebuild the (1-d)·rw term from the static
    // restart-weight table each iteration — a co-partitioned id join
    // against the ranks0 barrier, which therefore stays alive to the end
    val vertsRw: DataFrame =
      if (personalized) ranks0.select($"id", $"rw") else null
    var ranks: DataFrame = ranks0
    var iter = 0
    val chunk = math.max(1, graft.Env.int("SPARK_GRAFT_ITER_CHUNK", 4))
    while (iter < cfg.maxIter) {
      val steps = math.min(chunk, cfg.maxIter - iter)
      var cur: DataFrame = ranks
      var s = 0
      while (s < steps) {
        val contribs = wEdges.as("e")
          .join(cur.as("r"), $"e.src" === $"r.id")
          .groupBy($"e.dst".as("id"))
          .agg(sum($"e.w" * $"r.rank").as("contrib"))
        cur =
          if (personalized)
            contribs.join(vertsRw, Seq("id"))
              .select($"id",
                (lit(1.0 - cfg.damping) * rw +
                  lit(cfg.damping) * $"contrib").as("rank"),
                $"rw")
          else
            contribs.select($"id",
              (lit(1.0 - cfg.damping) * rw +
                lit(cfg.damping) * $"contrib").as("rank"))
        s += 1
      }
      val next = barrier(cur)
      if (!(ranks eq ranks0)) GraftLineage.release(ranks)
      ranks = next
      iter += steps
    }
    if (!(ranks eq ranks0)) GraftLineage.release(ranks0)
    GraftLineage.release(wEdges)
    Result(ranks.select($"id", $"rank"), iter, Double.NaN)
  }

  /** Continue a run from durable state written by [[Config.checkpointDir]]:
    * loads the latest rank snapshot + the once-written transition table
    * and iterates from the recorded iteration (`cfg.maxIter` counts
    * TOTAL iterations across the original run and the resume — the same
    * contract as the CC strategies' resume). */
  def resume(spark: org.apache.spark.sql.SparkSession,
             checkpointDir: String, cfg: Config = Config()): Result = {
    import spark.implicits._
    val ck = new CheckpointManager(spark, checkpointDir)
    val step = ck.latestStep().getOrElse(
      throw new IllegalStateException(s"no checkpoint under $checkpointDir"))
    val meta = ck.meta(step)
    val algo = meta.getOrElse("algo", "")
    if (algo != "pagerank")
      throw new IllegalStateException(
        s"not a pagerank checkpoint under $checkpointDir (algo='$algo')")
    val p = spark.sessionState.conf.numShufflePartitions
    val wedgesStep = meta("wedgesStep").toInt
    val wEdges = ck.load(wedgesStep, "wedges").repartition(p, $"src").cutLineage()
    val ranks = GraftLineage.barrier(ck.load(step, "ranks").repartition(p, $"id"))
    // Double.toString round-trips exactly, so the resumed STATE is
    // bit-identical; final ranks may differ from an uninterrupted run
    // in the last ulp because the parquet round-trip can permute rows
    // within partitions and per-vertex neighbor sums are
    // order-sensitive — the same noise the 1e-6 oracle contract (and
    // the 6 dp rounds elsewhere) absorb. CC's resume is exact because
    // max over longs is order-independent.
    val rwLit = meta.get("rw").filter(_.nonEmpty).map(_.toDouble)
    loop(spark, wEdges, ranks, meta("dmass").toDouble, rwLit,
      startIter = meta("iter").toInt,
      cfg.copy(checkpointDir = Some(checkpointDir)), Some(wedgesStep))
  }

  /** The power-iteration loop proper, resumable at any iteration
    * boundary: state is (ranks frame, dangling mass, iteration). */
  private def loop(spark: org.apache.spark.sql.SparkSession,
                   wEdges: DataFrame, ranks0: DataFrame, dmass0: Double,
                   rwLit: Option[Double], startIter: Int, cfg: Config,
                   wedgesStep0: Option[Int]): Result = {
    import spark.implicits._
    val personalized = rwLit.isEmpty
    val rw: org.apache.spark.sql.Column =
      rwLit.map(lit(_)).getOrElse($"rw")
    val rwCols = if (personalized) Seq(col("rw")) else Seq.empty[org.apache.spark.sql.Column]
    val ck = cfg.checkpointDir.map(new CheckpointManager(spark, _))
    var wedgesStep = wedgesStep0
    var ranks = ranks0
    var danglingMass = dmass0
    var iter = startIter
    var delta = Double.MaxValue
    // resolved ONCE per run: the plan-shape arm must be iteration-invariant
    val dmassAsLiteral = cfg.dmassLiteral.getOrElse(legacyDmassLiteral)

    while (iter < cfg.maxIter && delta > cfg.tol) {
      val t0 = System.nanoTime()
      val contribs = wEdges.as("e")
        .join(ranks.as("r"), $"e.src" === $"r.id")
        .groupBy($"e.dst".as("id"))
        .agg(sum($"e.w" * $"r.rank").as("contrib"))

      // ranks is the full vertex set → left join carries every vertex,
      // the old rank (for the delta), the restart weight and the
      // dangling flag in one pass. ONE job: materialize the new ranks
      // while observing the L1 delta and the next iteration's dangling
      // mass. The scalar dangling mass rides as a broadcast one-row
      // frame (not a literal) so the iteration plan — and its compiled
      // codegen — is IDENTICAL every iteration; arithmetic order is
      // unchanged, so ranks are bit-identical to literal mode.
      val base = ranks.as("r").join(contribs.as("c"), Seq("id"), "left")
      val joined =
        if (dmassAsLiteral)
          base.select(Seq($"id",
            (lit(1.0 - cfg.damping) * rw + lit(cfg.damping) *
              (coalesce($"contrib", lit(0.0)) + lit(danglingMass) * rw)).as("rank"),
            $"r.rank".as("prev")) ++ rwCols :+ $"dangling": _*)
        else
          base.crossJoin(broadcast(Seq(danglingMass).toDF("dmass")))
            .select(Seq($"id",
              (lit(1.0 - cfg.damping) * rw + lit(cfg.damping) *
                (coalesce($"contrib", lit(0.0)) + $"dmass" * rw)).as("rank"),
              $"r.rank".as("prev")) ++ rwCols :+ $"dangling": _*)
      val (next, m) = barrierObserved(joined,
        coalesce(sum(abs($"rank" - $"prev")), lit(0.0)).as("delta"),
        coalesce(sum(when($"dangling", $"rank")), lit(0.0)).as("dmass"))
      delta = m("delta").asInstanceOf[Double]
      danglingMass = m("dmass").asInstanceOf[Double]
      GraftLineage.release(ranks)
      ranks = next.select(Seq($"id", $"rank") ++ rwCols :+ $"dangling": _*)
      iter += 1
      ck.foreach { c =>
        c.appendMetrics(Seq(SuperstepMetrics(cfg.runId, "pagerank", iter,
          0L, 0L, -1L, 0, (System.nanoTime() - t0) / 1000000)))
        val willContinue = iter < cfg.maxIter && delta > cfg.tol
        if (iter % cfg.checkpointEvery == 0 && willContinue) {
          // the static transition table is written once, at the first
          // snapshot; later snapshots only rewrite the small rank table
          val tables = Map("ranks" -> ranks) ++
            (if (wedgesStep.isEmpty) Map("wedges" -> wEdges) else Map.empty)
          if (wedgesStep.isEmpty) wedgesStep = Some(iter)
          c.save(iter, tables, Map(
            "algo" -> "pagerank", "runId" -> cfg.runId,
            "iter" -> iter.toString, "dmass" -> danglingMass.toString,
            "rw" -> rwLit.map(_.toString).getOrElse(""),
            "wedgesStep" -> wedgesStep.get.toString))
        }
      }
    }
    GraftLineage.release(wEdges)
    Result(ranks.select($"id", $"rank"), iter, delta)
  }
}
