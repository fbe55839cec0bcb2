package graft.operators

import org.apache.spark.sql.GraftLineage._
import graft.graph.{Edge, GraphIO, SuperstepMetrics, UnionFind, VertexLabel}
import graft.plans.CheckpointManager
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable.ArrayBuffer

/** Distributed connected components over a `Dataset[Edge]`.
  *
  * Canonical output (SURVEY.md §3.5): `label(v) = max vertex id in v's
  * component` — byte-exact vs the reference's deterministic hook-to-max
  * fixpoint (`CSE613-MPI/mpi_parallel_cc_utils.cpp:25-35`).
  *
  * Three strategies, all producing identical canonical labels:
  *
  *  - [[CCStrategy.HookAndContract]] — the reference algorithm re-expressed
  *    as Dataset relational ops: hook-to-max = groupBy(src).agg(max(dst))
  *    (partial+final hash agg ≙ local hook + MPI_MAX reduce,
  *    `my_MPI_cc.cpp:193,196`), pointer jumping = iterated self-join with
  *    path doubling (`mpi_parallel_cc_utils.cpp:37-55`) over a
  *    frontier-split map (only unresolved rows are probed AND
  *    re-materialized per jump; resolved segments merge once at the
  *    fixpoint), edge contraction = relabel join + cross-component filter
  *    + normalize (`mpi_parallel_cc_utils.cpp:57-76`).
  *  - [[CCStrategy.AlternatingStar]] — small-star/large-star contraction
  *    (Kiveris et al., "Connected Components in MapReduce and Beyond",
  *    SoCC 2014), the standard Dataset-join CC named by the north star.
  *  - [[CCStrategy.SampledContraction]] — communication-avoiding sampled
  *    contraction (PPoPP 2018 semantics, `SparseSampling.hpp:53-93`):
  *    per round sample a bounded edge subset, union-find it on the driver,
  *    broadcast the contraction map.
  *
  * Scale design: relabel maps after round 1 are orders of magnitude smaller
  * than the edge set, so relabel joins broadcast once the map fits
  * (`broadcastRows` threshold); before that they are shuffle joins under
  * AQE skew handling. The hook aggregation needs no salting: Spark's
  * partial (map-side) aggregation already collapses hot src keys per
  * partition before the shuffle. Lineage is cut every round with eager
  * `localCheckpoint`; durable parquet checkpoints + manifest every
  * `checkpointEvery` rounds make runs resumable mid-iteration.
  */
object ConnectedComponents {

  sealed trait CCStrategy
  object CCStrategy {
    case object HookAndContract extends CCStrategy
    case object AlternatingStar extends CCStrategy
    case object SampledContraction extends CCStrategy
    /** G5 — coin-toss child hooking (random-mate), the randomized OpenMP
      * variant (`randomized_OPENMP_cc.cpp:164-201`), derandomized: the
      * per-round "coin" is `xxhash64(seed, round, id)`, so runs are
      * reproducible at any parallelism. */
    case object RandomizedHook extends CCStrategy
  }

  final case class Config(
      strategy: CCStrategy = CCStrategy.HookAndContract,
      maxRounds: Int = 200,
      /** relabel maps at or below this row count are broadcast. */
      broadcastRows: Long = 1L * 1000 * 1000,
      /** durable checkpoint cadence (rounds); None = no durable ckpt. */
      checkpointDir: Option[String] = None,
      checkpointEvery: Int = 5,
      runId: String = "cc",
      /** PPoPP sampling params: sample ≤ n^(1+eps/2) * (1+delta), hard cap. */
      sampleEps: Double = 0.09,
      sampleDelta: Double = 0.2,
      sampleHardCap: Long = 5L * 1000 * 1000,
      seed: Long = 17L,
      /** Per-partition union-find pre-contraction before each hook round
        * (reference analogue: master-local prefix CC,
        * `SparseSampling.hpp:275-313`, distributed to every partition).
        * Replaces each partition's subgraph by its spanning star forest —
        * connectivity-preserving, collapses local path depth to 1, so
        * pointer jumping needs O(1) jumps instead of O(log diameter).
        * Memory: one LongMap over the partition's vertex ids (bounded by
        * `spark.sql.files.maxPartitionBytes` / shuffle partition sizing). */
      preContract: Boolean = true,
      /** Per-partition vertex cap for pre-contraction: bounds each task's
        * union-find memory deterministically (~40 MB at 250k); edges past
        * the cap pass through unchanged (still correct — just contracts
        * less). ~70 B/vertex of LongMap state → 1 M ≈ 70 MB per task,
        * ≈ 2.2 GB at 32 concurrent tasks — fits the 8 GiB sandbox heap
        * and typical executor task memory. Raising 250k → 1M cut the
        * 16 M-edge suite from 3 supersteps to 2 and beat the old cap at
        * every parallelism measured (local[2/8/32]); size to
        * taskMemory / ~70 B on real executors
        * (env override: SPARK_GRAFT_PRECONTRACT_CAP). */
      preContractCap: Int = graft.Env.int("SPARK_GRAFT_PRECONTRACT_CAP", 1000000),
      /** Pointer-jump frontiers at or below this row count are resolved
        * via a broadcast probe of the lookup map + driver-side fixups
        * instead of a shuffle join: a 7-row tail frontier was paying a
        * full shuffle of the multi-million-row label map (~3 s/jump at
        * local[8] on the 16 M-edge suite; at 100 TB it would shuffle
        * terabytes to resolve a handful of stragglers). 500k rows ≈
        * 16 MB collected — the same driver-memory class as the sampled
        * strategy's bounded collect. Raising this to 1.2 M (so the 16 M
        * suite's 0.6–1.0 M jump-3 frontier takes the probe) was
        * A/B-measured in round 5: t2 77.0→75.0 s, t8 35.5→35.7 s —
        * the probe's O(frontier) driver map build cancels the saved
        * |f| lookup shuffle once threads can absorb the shuffle, so the
        * default stays 500k; the env knob remains for low-parallelism
        * deployments where the trade measured positive.
        * Env override: SPARK_GRAFT_CC_SMALL_FRONTIER. */
      smallFrontierRows: Long = graft.Env.long("SPARK_GRAFT_CC_SMALL_FRONTIER",
        500000L),
      /** Pointer-jump frontiers at or below this row count (but above
        * [[smallFrontierRows]]) pre-filter the lookup union with a
        * broadcast LEFT SEMI join on the frontier's labels before the
        * shuffle join: a jump only needs lookup rows whose id some
        * frontier label references, so the shuffle moves O(|frontier|)
        * matched rows instead of O(|f|) — the round-5 Amdahl
        * decomposition's measured non-scaling floor (jump lookups
        * re-shuffled ~8 M rows at identical ~4 s cost at 2 AND 8
        * threads). Early jumps (frontier ≈ f) keep the plain shuffle
        * join: the semi-join cannot shrink anything there and the
        * broadcast would be |f|-sized. NOTE the filter must be on the
        * FULL lookup union — restricting the lookup to the previous
        * jump's output is semantically wrong (a frontier label can
        * reference a segment resolved at ANY earlier jump: on a 9-chain,
        * vertex 4's jump-3 label 8 lives in jump-1's done segment).
        * Default 3 M rows: a hashed long-relation costs ~40 B/row, so
        * the build side stays ≈120 MB — comfortably inside the 8 GiB
        * single-JVM heap AND typical executor task memory, where the
        * old 6 M default could spike to ~240 MB per concurrent build
        * near the threshold (ADVICE r06).
        * Env override: SPARK_GRAFT_CC_REFS_BROADCAST. */
      broadcastRefsRows: Long = graft.Env.long("SPARK_GRAFT_CC_REFS_BROADCAST",
        3000000L),
      /** Tail rounds at or below this edge count finish on the driver:
        * collect the contracted edges, union-find them locally
        * (reference analogue: master-local prefix CC,
        * `SparseSampling.hpp:275-313` — the same bounded-collect shape
        * as the sampled strategy), compose the mapping with ONE
        * broadcast join. After round 0 the edge set typically shrinks
        * 2-3 orders of magnitude, but a distributed tail round still
        * costs the same ~6 constant-time driver jobs as a full round —
        * the measured serial floor of the strong-scaling gate. Never
        * applied to the FIRST round (the distributed path must do the
        * heavy lifting; also keeps small-graph tests exercising the
        * full machinery). 0 disables. Env: SPARK_GRAFT_CC_DRIVER_FINISH. */
      driverFinishEdges: Long = graft.Env.long("SPARK_GRAFT_CC_DRIVER_FINISH",
        2L * 1000 * 1000),
      /** Run the per-round contraction and mapping-composition jobs
        * concurrently (they share no dependency). Opt-in: on a single
        * memory-constrained JVM the two jobs contend for the same heap
        * and spill; on a real cluster with separate executor memory the
        * overlap removes one serial driver job from the round.
        * Env override: SPARK_GRAFT_CC_OVERLAP=1/0. */
      overlapJobs: Boolean = sys.env.get("SPARK_GRAFT_CC_OVERLAP").contains("1"),
      /** stderr progress lines per superstep/jump (diagnostics). */
      verbose: Boolean = sys.env.get("SPARK_GRAFT_VERBOSE").contains("1"))

  /** `components`: the distinct-label count, observed for free inside the
    * FINAL mapping materialization when the strategy's labels are already
    * canonical there (hook, sampled): canonical max labels mean
    * `components = count(id == label)`, so the separate `countDistinct`
    * action [[componentCount]] would otherwise pay per run is folded into
    * a job that already exists. `None` for strategies whose
    * canonicalization is composed lazily after the loop (star, random). */
  final case class Result(labels: Dataset[VertexLabel], metrics: Seq[SuperstepMetrics],
                          components: Option[Long] = None)

  /** Observation: #rows with id == label — on a canonical-max label table
    * this IS the component count (each component contains exactly one
    * vertex labeled with itself: its max). */
  private def rootsMetric =
    coalesce(sum(when(col("id") === col("label"), 1L)), lit(0L)).as("roots")

  /** CC of `edges` (+ optional isolated vertices). Input edges may be
    * dirty: self-loops, duplicates, arbitrary orientation — loader
    * semantics of the reference are applied here (P1/P3 + dedup). */
  def run(edges: Dataset[Edge],
          extraVertices: Option[Dataset[Long]] = None,
          cfg: Config = Config()): Result = {
    val spark = edges.sparkSession
    import spark.implicits._

    // Normalize + drop self-loops (P1/P3, narrow); duplicates are KEPT
    // here, exactly like the reference loaders — every strategy tolerates
    // them (hook pre-contraction and the per-step distinct()s dedup
    // structurally), and skipping the up-front distinct() saves a full
    // shuffle+materialization of the largest table in the whole job.
    // The ONE materialization of the cleaned input is written directly in
    // the layout its strategy wants: the hook path gets its CSR-style
    // range layout here (materializing `cleaned` and then a ranged copy
    // of it was two full passes over the largest table in the job —
    // measured ~14 s of the 69 s local[8] 16 M-edge run).
    val cleanedLazy = GraphIO.normalize(edges)
      .filter(col("src") =!= col("dst")).toDF()
    val p = spark.sessionState.conf.numShufflePartitions
    // The edge count is observed inside the SAME materialization job —
    // the hook loop's entry count() was one more constant-time driver
    // job per run (the strong-scaling serial floor is made of exactly
    // such jobs).
    val (cleaned1, cleanedMetrics) = barrierObserved(cfg.strategy match {
      case CCStrategy.HookAndContract if cfg.preContract =>
        // (src, dst) — not src alone — so a single-hub star spreads
        // across partitions instead of forming one straggler task
        cleanedLazy.repartitionByRange(p, $"src", $"dst")
          .sortWithinPartitions($"src", $"dst")
      case _ => cleanedLazy
    }, count(lit(1)).as("n"))
    val cleanedCount = Option(cleanedMetrics("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
    // Small derived graphs (dedup pair graphs, co-activity buckets):
    // re-range the materialized input at a data-proportional partition
    // count (guide §2, graft.plans.Adaptive — substantial shrinks only)
    // so round 0's pre-contraction and hook stages don't schedule one
    // tiny task per session partition. At bench/cluster scale the
    // condition never fires and the path is byte-identical to before.
    // Labels are graph-determined (component max), so partitioning
    // cannot change any gated output.
    // floor of 2: round 0 must stay a genuinely distributed round (a
    // 1-partition pre-contraction would union-find the whole graph in
    // one task — the driver-finish philosophy without its bounds)
    val pAd = math.max(2, graft.plans.Adaptive.forRows(spark, cleanedCount))
    val cleaned =
      if (cfg.strategy == CCStrategy.HookAndContract && cfg.preContract &&
          cleanedCount > 0 && pAd * 4 <= p) {
        val re = barrier(cleaned1.repartitionByRange(pAd, $"src", $"dst")
          .sortWithinPartitions($"src", $"dst"))
        cleaned1.releaseLineage()
        re
      } else cleaned1
    val verts = GraphIO.vertices(cleaned.as[Edge]).toDF("id")
      .union(extraVertices.map(_.toDF("id")).getOrElse(spark.emptyDataset[Long].toDF("id")))
      .distinct()
    val mapping0 = verts.select($"id", $"id".as("label"))

    val cleanedDs = cleaned.as[Edge]
    val (labels, metrics, comps) = cfg.strategy match {
      case CCStrategy.HookAndContract    =>
        hookAndContract(cleanedDs, mapping0, cfg, preRanged = true,
          initialCount = Some(cleanedCount))
      case CCStrategy.AlternatingStar    =>
        val (l, m) = alternatingStar(GraphIO.canonical(cleanedDs), mapping0, cfg)
        (l, m, None)
      case CCStrategy.SampledContraction => sampledContraction(GraphIO.canonical(cleanedDs), mapping0, cfg)
      case CCStrategy.RandomizedHook     =>
        val (l, m) = randomizedHook(GraphIO.canonical(cleanedDs), mapping0, cfg)
        (l, m, None)
    }
    cleaned.releaseLineage()
    Result(labels.select($"id", $"label").as[VertexLabel], metrics, comps)
  }

  /** Resume a run from its latest durable checkpoint. The manifest's
    * `algo` field dispatches to the strategy that wrote it — every
    * strategy checkpoints the same (edges, mapping) state shape, so all
    * four are resumable. Resumed rounds are numbered from step+1 (a
    * metrics label; convergence is driven by the edge count, and the
    * randomized strategy's per-round coin seed only needs rounds to be
    * distinct, not contiguous). */
  def resume(spark: SparkSession, checkpointDir: String, cfg: Config): Result = {
    import spark.implicits._
    val ck = new CheckpointManager(spark, checkpointDir)
    val step = ck.latestStep().getOrElse(
      throw new IllegalStateException(s"no checkpoint under $checkpointDir"))
    val algo = ck.meta(step).getOrElse("algo", "cc-hook")
    val edges = ck.load(step, "edges").as[Edge]
    val mapping = ck.load(step, "mapping")
    val cfg2 = cfg.copy(checkpointDir = Some(checkpointDir))
    val (labels, metrics, comps) = algo match {
      case "cc-hook" => hookAndContract(edges, mapping, cfg2, startRound = step + 1)
      case "cc-sampled" => sampledContraction(edges, mapping, cfg2, startRound = step + 1)
      case "cc-random" =>
        val (l, m) = randomizedHook(edges, mapping, cfg2, startRound = step + 1)
        (l, m, None)
      case "cc-star" =>
        val (l, m) = alternatingStar(edges, mapping, cfg2, startRound = step + 1)
        (l, m, None)
      case other =>
        throw new IllegalStateException(s"unknown checkpoint algo '$other' under $checkpointDir")
    }
    Result(labels.select($"id", $"label").as[VertexLabel], metrics, comps)
  }

  // ---------------------------------------------------------------------
  // Strategy 1: hook-to-max + pointer jumping + contraction (reference).
  // ---------------------------------------------------------------------
  private def hookAndContract(
      edges0: Dataset[Edge], mapping0: DataFrame, cfg: Config,
      startRound: Int = 0, preRanged: Boolean = false,
      initialCount: Option[Long] = None)
      : (DataFrame, Seq[SuperstepMetrics], Option[Long]) = {
    val spark = edges0.sparkSession
    import spark.implicits._
    val metrics = ArrayBuffer.empty[SuperstepMetrics]
    val ck = cfg.checkpointDir.map(new CheckpointManager(spark, _))

    // Range-partition the edge table by src once (CSR-style adjacency
    // layout, per the north star): graphs with id locality (chains, web
    // graphs, co-occurrence ids) then contract well per-partition. The
    // upstream dedup's hash shuffle scatters structure randomly — without
    // this, round-0 pre-contraction finds only fragments and pointer
    // jumping pays the full graph diameter (observed: 22 jumps vs 6).
    // `preRanged`: run() already materialized the input in this layout
    // (one pass instead of two); the resume path still ranges here.
    val p = spark.sessionState.conf.numShufflePartitions
    var edges = (if (cfg.preContract && !preRanged)
        edges0.toDF().repartitionByRange(p, $"src", $"dst")
          .sortWithinPartitions($"src", $"dst") // CSR layout: chunks see contiguous segments
          .cutLineage()
      else edges0.toDF())
    // mapping0 is LAZY on purpose: for a fresh run it is the identity
    // over the vertex set (a distinct over the cleaned edges) and its
    // only round-0 consumer is the composition join — computing it
    // inside that job saves one driver job + one materialization per
    // run (the strong-scaling serial floor is made of exactly such
    // jobs). Every subsequent `mapping` IS barrier'd in the loop.
    var mapping = mapping0
    var round = startRound
    var edgeCount = initialCount.getOrElse(edges.count())
    // roots observed in each round's mapping materialization; at loop
    // exit the last value IS the component count (labels final there)
    var lastRoots: Option[Long] = None

    while (edgeCount > 0 && round < cfg.maxRounds) {
      // Driver tail finish (G8): collect the small contracted remainder,
      // union-find it locally, compose the mapping in one broadcast
      // join. A distributed tail round costs ~6 constant-time driver
      // jobs for a vanishing amount of data; this costs two.
      if (round > startRound && cfg.driverFinishEdges > 0 &&
          edgeCount <= cfg.driverFinishEdges) {
        val t0 = System.nanoTime()
        val pairs = edges.select($"src", $"dst").as[(Long, Long)].collect()
        val cc = UnionFind.components(pairs.iterator)
        val mapRows = cc.iterator.filter { case (v, r) => v != r }.toSeq
        // the relabel map can approach 2×driverFinishEdges rows; only
        // force-broadcast it when it is inside the configured broadcast
        // class — past that, fall back to a shuffle join rather than
        // bypassing autoBroadcastJoinThreshold with a ~100 MB relation
        val mapDf = bcIfSmall(
          spark.createDataset(mapRows).toDF("old", "new"), mapRows.size.toLong, cfg)
        val newMapping = mapping.as("m")
          .join(mapDf.as("f"), $"m.label" === $"f.old", "left")
          .select($"m.id".as("id"), coalesce($"f.new", $"m.label").as("label"))
        val prevMapping = mapping
        val (mappedDf, mm) = barrierObserved(newMapping, rootsMetric)
        mapping = mappedDf
        lastRoots = Option(mm("roots")).map(_.asInstanceOf[Long])
        prevMapping.releaseLineage(); edges.releaseLineage()
        edges = spark.emptyDataset[Edge].toDF()
        val stepMetric = SuperstepMetrics(cfg.runId, "cc-hook", round,
          edgeCount, 0L, -1L, 0, (System.nanoTime() - t0) / 1000000)
        metrics += stepMetric
        ck.foreach(_.appendMetrics(Seq(stepMetric)))
        if (cfg.verbose)
          System.err.println(s"[cc-hook] round=$round driver-finish edgesIn=$edgeCount " +
            s"ms=${(System.nanoTime() - t0) / 1000000}")
        edgeCount = 0
        round += 1
        ck.foreach(_.save(round, Map("edges" -> edges, "mapping" -> mapping),
          Map("algo" -> "cc-hook", "edgeCount" -> "0", "runId" -> cfg.runId)))
      } else {
      val t0 = System.nanoTime()
      def ms: Long = (System.nanoTime() - t0) / 1000000

      // Per-partition pre-contraction: replace each partition's subgraph
      // by a spanning star forest toward the local component max. Pure
      // narrow transformation (no shuffle); output edges (v, rep) are
      // already normalized since rep = local max.
      // Chunked so each union-find holds ≤ cap vertices (bounded task
      // memory at any partition size): a block is contracted to its star
      // forest, the maps reset, and the next block begins. Blocks glue via
      // shared vertices in the global hook rounds.
      // Materialized (barrier) because it has TWO consumers per round —
      // the hook aggregation and the contraction relabel join; left lazy,
      // the per-partition union-find pass ran twice per round (a measured
      // ~6 s of the round-0 contraction's 12.7 s at local[8], 16 M edges).
      val chunkEdges = math.max(1, cfg.preContractCap / 2)
      val hookInput =
        if (!cfg.preContract) edges
        else barrier(edges.as[Edge].mapPartitions { it =>
          it.grouped(chunkEdges).flatMap { chunk =>
            val uf = new UnionFind
            chunk.foreach { e => uf.touch(e.src); uf.touch(e.dst); uf.union(e.src, e.dst) }
            val maxOf = scala.collection.mutable.LongMap.empty[Long]
            val all = uf.ids.toArray
            all.foreach { v =>
              val r = uf.find(v)
              maxOf(r) = math.max(maxOf.getOrElse(r, Long.MinValue), v)
            }
            all.iterator.flatMap { v =>
              val rep = maxOf(uf.find(v))
              if (v == rep) Iterator.empty else Iterator.single(Edge(v, rep))
            }
          }
        }.toDF())

      // G2 hook-to-max: each src hooks to its largest (normalized) neighbor.
      // Partial+final hash aggregation reproduces local-hook + MPI_MAX
      // reduce; no salting needed (map-side combine absorbs src skew).
      // Rows are only the non-identity part of the label function f:
      // vertices absent from `f` map to themselves (left-join + coalesce
      // at every use), which keeps f proportional to #srcs, not #vertices.
      val hooked = hookInput.groupBy($"src".as("id")).agg(max($"dst").as("label"))
        .cutLineage()
      if (cfg.verbose) System.err.println(s"[cc-hook] round=$round hook done at ${ms}ms")

      // G3 pointer jumping with path doubling: f := f ∘ f until fixpoint.
      // Hard-won rules in this loop:
      //  - cutLineage (not persist) per jump: the self-join doubles the
      //    LOGICAL plan (and the size-estimation BigInts) every jump —
      //    persist caches data but keeps lineage, and Catalyst's stats /
      //    plan-string work alone OOMs by jump ~19.
      //  - no broadcast: each broadcast pins a copy of f until round end.
      //  - frontier split: a row is `done` once its label is a root
      //    (roots have no entry in f — they never hook) or points at a
      //    done row. Each jump probes AND materializes only the shrinking
      //    undone frontier; resolved rows stay behind in their jump's
      //    barrier (per-jump checkpoint volume tracks the frontier, not
      //    |f| — measured 13M vs 30M rows across a 16M-edge round 0).
      //    The lookup side must remain ALL of f (frontier labels can
      //    point at any row): a union of the done segments + frontier.
      var frontier = hooked
      var doneParts = List.empty[DataFrame] // resolved (id, label) views
      val jumpBarriers = scala.collection.mutable.ArrayBuffer[DataFrame](hooked)
      var jumps = 0
      var undone = edgeCount // |hooked| ≤ current edge count (upper bound)
      while (undone > 0) {
        val lookup = (doneParts.map(_.withColumn("done", lit(true))) :+
            frontier.select($"id", $"label", lit(false).as("done")))
          .reduce(_ union _)
        if (undone <= cfg.smallFrontierRows) {
          // Tail fast path: the frontier fits on the driver, so probe the
          // lookup map with a BROADCAST inner join (pure scan of the
          // already-materialized barriers — no shuffle, no checkpoint
          // write) and apply the one-hop rule locally. Every done row's
          // label is already a final root (see induction note below), so
          // the fixups here are exactly the join's semantics.
          val fr = frontier.select($"id", $"label").collect()
          val labelIds = fr.map(_.getLong(1)).distinct.toSeq
          val probed = lookup
            .join(broadcast(spark.createDataset(labelIds).toDF("lid")), $"id" === $"lid")
            .select($"id", $"label", $"done").collect()
          val target = probed.map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
          val resolved = fr.map { r =>
            val (id, lbl) = (r.getLong(0), r.getLong(1))
            target.get(lbl) match {
              case None          => (id, lbl, true) // label is a root
              case Some((l2, d)) => (id, l2, d)
            }
          }.toSeq
          undone = resolved.count(!_._3)
          val next = spark.createDataset(resolved).toDF("id", "label", "done")
          // LocalRelation — nothing to barrier or release
          doneParts ::= next.filter($"done").select($"id", $"label")
          frontier = next.filter(!$"done").select($"id", $"label")
        } else {
          // Lookup-shuffle cut: when the frontier is broadcastable,
          // semi-filter the lookup on the labels the frontier actually
          // references — the shuffle side then carries O(|frontier|)
          // rows, not O(|f|). No distinct on the build side: a semi
          // join's hashed relation dedups keys itself, and the labels
          // collect once (same O(frontier) class as the tail probe).
          val lookupSide =
            if (undone <= cfg.broadcastRefsRows)
              lookup.join(broadcast(frontier.select($"label".as("_ref"))),
                $"id" === $"_ref", "left_semi")
            else lookup
          val joined = frontier.as("a")
            .join(lookupSide.as("b").hint("shuffle_hash"), $"a.label" === $"b.id", "left")
            .select($"a.id".as("id"),
              coalesce($"b.label", $"a.label").as("label"),
              ($"b.id".isNull || $"b.done").as("done"))
          val (next, m) = barrierObserved(joined,
            sum(when(!$"done", 1L).otherwise(0L)).as("undone"))
          undone = Option(m("undone")).map(_.asInstanceOf[Long]).getOrElse(0L)
          // next holds every frontier row (resolved + still-undone); the
          // barriers of earlier jumps still back doneParts — release at
          // round end, not here.
          jumpBarriers += next
          doneParts ::= next.filter($"done").select($"id", $"label")
          frontier = next.filter(!$"done").select($"id", $"label")
        }
        jumps += 1
        if (cfg.verbose)
          System.err.println(s"[cc-hook] round=$round jump=$jumps undone=$undone at ${ms}ms")
      }
      // fixpoint: frontier is empty; f = disjoint union of the resolved
      // segments, materialized ONCE into a compact barrier — contraction
      // and mapping each scan f twice, and joining against the lazy
      // union-of-filters was measured 3× slower than against one barrier
      // (one extra |f| checkpoint/round still beats the old one-per-jump).
      val f = doneParts match {
        case Nil      => hooked.select($"id", $"label")
        case p :: Nil => p
        case ps       =>
          val merged = barrier(ps.reduce(_ union _))
          // every per-jump barrier is superseded by the merged map —
          // free their blocks NOW, before the contraction joins need the
          // memory (keeping them pinned through the sort-merge was a
          // measured 2× contraction slowdown on the 8g heap); blocking:
          // the point is that the memory is back before the join starts
          jumpBarriers.foreach(_.releaseLineage(blocking = true))
          jumpBarriers.clear()
          jumpBarriers += merged
          merged
      }

      if (cfg.verbose) System.err.println(s"[cc-hook] round=$round jumps done at ${ms}ms")

      // G4 contraction: relabel endpoints through f, drop intra-component
      // edges (P2), normalize (P3), dedup (safe for CC). Contracts the
      // (connectivity-equivalent, ≤min(m,n)-edge) pre-contracted forest,
      // not the full edge set — same components, O(n) relabel volume.
      val fB = bcIfSmall(f, edgeCount, cfg)
      val contracted = hookInput.as("e")
        .join(fB.as("fs"), $"e.src" === $"fs.id", "left")
        .join(fB.as("fd"), $"e.dst" === $"fd.id", "left")
        .select(
          coalesce($"fs.label", $"e.src").as("u"),
          coalesce($"fd.label", $"e.dst").as("v"))
        .filter($"u" =!= $"v")
        .select(least($"u", $"v").as("src"), greatest($"u", $"v").as("dst"))
        .distinct()

      // G6 forward map composition (no recursion stack): orig → new rep.
      val newMapping = mapping.as("m")
        .join(fB.as("f"), $"m.label" === $"f.id", "left")
        .select($"m.id".as("id"), coalesce($"f.label", $"m.label").as("label"))

      val prevEdges = edges
      val prevMapping = mapping
      // The contraction and mapping-composition jobs share no dependency
      // (both read only the materialized f/fB and barrier'd inputs), so
      // they CAN run concurrently — cfg.overlapJobs. On a real cluster
      // that removes one serial driver job per round; on this
      // single-JVM 8g sandbox the two materializations contend for the
      // same heap (measured: local[8] 16M-edge suite regressed ~2× with
      // overlap on), so the default is sequential.
      val (newEdges, cm, newMappingDf, mm) =
        if (cfg.overlapJobs) {
          import scala.concurrent.{Await, Future}
          import scala.concurrent.duration.{Duration => SDuration}
          import scala.concurrent.ExecutionContext.Implicits.global
          val contractedF = Future(barrierObserved(contracted, count(lit(1)).as("n")))
          val mappingF = Future(barrierObserved(newMapping, rootsMetric))
          val (e, m) = Await.result(contractedF, SDuration.Inf)
          val (md, mMet) = Await.result(mappingF, SDuration.Inf)
          (e, m, md, mMet)
        } else {
          val (e, m) = barrierObserved(contracted, count(lit(1)).as("n"))
          if (cfg.verbose) System.err.println(s"[cc-hook] round=$round contraction done at ${ms}ms")
          val (md, mMet) = barrierObserved(newMapping, rootsMetric)
          (e, m, md, mMet)
        }
      edges = newEdges
      val newCount = Option(cm("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
      mapping = newMappingDf
      lastRoots = Option(mm("roots")).map(_.asInstanceOf[Long])
      if (cfg.verbose) System.err.println(s"[cc-hook] round=$round mapping done at ${ms}ms")
      jumpBarriers.foreach(_.releaseLineage())
      prevEdges.releaseLineage(); prevMapping.releaseLineage()
      if (cfg.preContract) hookInput.releaseLineage() // last read: contraction join

      val stepMetric = SuperstepMetrics(cfg.runId, "cc-hook", round,
        edgeCount, newCount, -1L, jumps, (System.nanoTime() - t0) / 1000000)
      metrics += stepMetric
      ck.foreach(_.appendMetrics(Seq(stepMetric))) // durable per-superstep append (§4.5)
      if (cfg.verbose)
        System.err.println(s"[cc-hook] round=$round edgesIn=$edgeCount " +
          s"edgesOut=$newCount jumps=$jumps ms=${(System.nanoTime() - t0) / 1000000}")
      edgeCount = newCount
      round += 1

      ck.foreach { c =>
        if (round % cfg.checkpointEvery == 0 || edgeCount == 0)
          c.save(round, Map("edges" -> edges, "mapping" -> mapping),
            Map("algo" -> "cc-hook", "edgeCount" -> edgeCount.toString,
                "runId" -> cfg.runId))
      }
      } // end distributed round (vs driver tail finish)
    }
    require(edgeCount == 0,
      s"CC did not converge in ${cfg.maxRounds} rounds ($edgeCount edges left)")
    // If the loop never ran (edge-free input) the mapping is still the
    // LAZY identity over the caller's input barrier, which run() releases
    // before the result is consumed — materialize it now (every vertex
    // its own component: roots = row count).
    if (round == startRound) {
      val (md, mm) = barrierObserved(mapping, rootsMetric)
      mapping = md
      lastRoots = Option(mm("roots")).map(_.asInstanceOf[Long])
    }
    (mapping, metrics.toSeq, lastRoots)
  }

  // ---------------------------------------------------------------------
  // Strategy 2: alternating small-star / large-star (SoCC 2014).
  // ---------------------------------------------------------------------
  private def alternatingStar(
      edges0: Dataset[Edge], mapping0: DataFrame, cfg: Config,
      startRound: Int = 0):
      (DataFrame, Seq[SuperstepMetrics]) = {
    val spark = edges0.sparkSession
    import spark.implicits._
    val metrics = ArrayBuffer.empty[SuperstepMetrics]
    val ck = cfg.checkpointDir.map(new CheckpointManager(spark, _))

    // Edges kept canonical (src < dst) between steps. The loop state is
    // (edges, vertsAll); vertsAll never changes, so the checkpoint shape
    // matches the other strategies' (edges, mapping) and resume() can
    // reload it as mapping0.
    var edges = edges0.toDF().cutLineage()
    val vertsAll = mapping0.cutLineage()
    var sig = signature(edges)
    var round = startRound
    var converged = edges.isEmpty

    while (!converged && round < cfg.maxRounds) {
      val t0 = System.nanoTime()
      val cntIn = sig._1

      // Large-star: each u attaches its larger neighbors to
      // m(u) = min(N(u) ∪ {u}).
      val bidir = edges.union(edges.select($"dst".as("src"), $"src".as("dst")))
      val minN = bidir.groupBy($"src").agg(min($"dst").as("mn"))
        .select($"src".as("u"), least($"src", $"mn").as("m"))
      val ls = bidir.as("e")
        .join(minN.as("s"), $"e.src" === $"s.u")
        .filter($"e.dst" > $"e.src")
        .select($"s.m".as("src"), $"e.dst".as("dst"))
        .filter($"src" =!= $"dst")
        .distinct()
        .cutLineage()

      // Small-star: on (v < u) pairs keyed by u, attach N(u) ∪ {u} to
      // m(u) = min(N(u)) (all neighbors here are < u).
      val minS = ls.groupBy($"dst".as("u")).agg(min($"src").as("m"))
      // convergence signature observed INSIDE the materialization job —
      // the separate signature() agg was one extra full scan per round
      val (ss, sm) = barrierObserved(
        ls.as("e")
          .join(minS.as("s"), $"e.dst" === $"s.u")
          .select($"s.m".as("src"), $"e.src".as("dst"))
          .union(minS.select($"m".as("src"), $"u".as("dst")))
          .filter($"src" =!= $"dst")
          .distinct(),
        count(lit(1)).as("c"),
        coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L)).as("h"))

      val newSig = (sm("c").asInstanceOf[Long], sm("h").asInstanceOf[Long])
      converged = newSig == sig
      edges.releaseLineage(); ls.releaseLineage()
      edges = ss
      sig = newSig
      val stepMetric = SuperstepMetrics(cfg.runId, "cc-star", round,
        cntIn, newSig._1, -1L, 0, (System.nanoTime() - t0) / 1000000)
      metrics += stepMetric
      ck.foreach(_.appendMetrics(Seq(stepMetric)))
      round += 1
      ck.foreach { c =>
        if (round % cfg.checkpointEvery == 0 || converged)
          c.save(round, Map("edges" -> edges, "mapping" -> vertsAll),
            Map("algo" -> "cc-star", "edgeCount" -> sig._1.toString,
                "runId" -> cfg.runId))
      }
    }
    require(converged, s"alternating-star did not converge in ${cfg.maxRounds} rounds")

    // Fixpoint: every non-min vertex v has exactly the edge (min, v).
    // Map to canonical component-max labels.
    val starLabels = edges.select($"dst".as("id"), $"src".as("label"))
      .union(edges.select($"src".as("id"), $"src".as("label")).distinct())
    // vertices isolated from the star set (singletons) come from mapping0
    val full = vertsAll.as("m")
      .join(starLabels.as("s"), $"m.id" === $"s.id", "left")
      .select($"m.id".as("id"), coalesce($"s.label", $"m.id").as("label"))
    val rep = full.groupBy($"label").agg(max($"id").as("rep"))
    val out = full.as("l").join(rep.as("r"), $"l.label" === $"r.label")
      .select($"l.id".as("id"), $"r.rep".as("label"))
    (out, metrics.toSeq)
  }

  /** Cheap set signature for convergence detection: (count, hash-xor).
    * Both compared edge tables are deduplicated sets, so a 64-bit
    * xxhash XOR-fold is an order-independent, overflow-free fingerprint. */
  private def signature(edges: DataFrame): (Long, Long) = {
    val row = edges.agg(
      count(lit(1)).as("c"),
      coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L)).as("h")).collect()(0)
    (row.getLong(0), row.getLong(1))
  }

  // ---------------------------------------------------------------------
  // Strategy 3: PPoPP-2018-style sampled contraction.
  // ---------------------------------------------------------------------
  private def sampledContraction(
      edges0: Dataset[Edge], mapping0: DataFrame, cfg: Config,
      startRound: Int = 0):
      (DataFrame, Seq[SuperstepMetrics], Option[Long]) = {
    val spark = edges0.sparkSession
    import spark.implicits._
    val metrics = ArrayBuffer.empty[SuperstepMetrics]
    val ck = cfg.checkpointDir.map(new CheckpointManager(spark, _))

    // Round-6 fold: the edge count AND the round's active-vertex estimate
    // ride the edge materialization job itself as observed metrics —
    // round 5 paid one extra countDistinct aggregation (a full edge scan)
    // plus one count() action per round on top of it. approx_count_distinct
    // (HLL, ±2% typical) is sound for nEst: it only sizes the sample
    // bound, which already carries (1+delta)=1.2 headroom, and prefix CC
    // is exact on ANY sample — sample size affects round count, never
    // correctness.
    val vertEst =
      (approx_count_distinct($"src") + approx_count_distinct($"dst")).as("n")
    val (edges00, m0) = barrierObserved(edges0.toDF(),
      count(lit(1)).as("c"), vertEst)
    var edges = edges00
    var mapping = mapping0.cutLineage()
    var round = startRound
    var edgeCount = Option(m0("c")).map(_.asInstanceOf[Long]).getOrElse(0L)
    var nEst = Option(m0("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
    var lastRoots: Option[Long] = None

    while (edgeCount > 0 && round < cfg.maxRounds) {
      val t0 = System.nanoTime()
      // Bound: n^(1+eps/2) * (1+delta) — `SparseSampling.hpp:117` with
      // eps=.09, delta=.2 (`SparseSampling.hpp:34-35`) — under a hard cap
      // so the driver collect stays bounded regardless of input.
      val bound = math.min(cfg.sampleHardCap.toDouble,
        math.pow(nEst.toDouble.max(2.0), 1.0 + cfg.sampleEps / 2.0) * (1.0 + cfg.sampleDelta))
      val k = math.max(1L, math.min(edgeCount, bound.toLong))
      val sampled: Array[(Long, Long)] =
        if (k >= edgeCount) edges.select($"src", $"dst").as[(Long, Long)].collect()
        else edges.sample(withReplacement = false,
            math.min(1.0, k.toDouble * 1.2 / edgeCount), cfg.seed + round)
          .limit(k.toInt).select($"src", $"dst").as[(Long, Long)].collect()

      // Driver-local prefix CC (≙ master-only union-find,
      // SparseSampling.hpp:275-313), canonical max labels.
      val cc = UnionFind.components(sampled.iterator)
      val mapRows = cc.iterator.filter { case (v, r) => v != r }
        .map { case (v, r) => (v, r) }.toSeq
      val mapDf = broadcast(spark.createDataset(mapRows).toDF("old", "new"))

      // G9: broadcast map, relabel, drop intra-component edges.
      val contracted = edges.as("e")
        .join(mapDf.as("ms"), $"e.src" === $"ms.old", "left")
        .join(mapDf.as("md"), $"e.dst" === $"md.old", "left")
        .select(coalesce($"ms.new", $"e.src").as("u"),
                coalesce($"md.new", $"e.dst").as("v"))
        .filter($"u" =!= $"v")
        .select(least($"u", $"v").as("src"), greatest($"u", $"v").as("dst"))
        .distinct()

      val newMapping = mapping.as("m")
        .join(mapDf.as("f"), $"m.label" === $"f.old", "left")
        .select($"m.id".as("id"), coalesce($"f.new", $"m.label").as("label"))

      val prevEdges = edges; val prevMapping = mapping
      // next round's count + vertex estimate observed in THIS round's
      // contraction materialization — no separate count()/agg jobs
      val (contractedB, cm) = barrierObserved(contracted,
        count(lit(1)).as("c"), vertEst)
      edges = contractedB
      val (mappedDf, mm) = barrierObserved(newMapping, rootsMetric)
      mapping = mappedDf
      lastRoots = Option(mm("roots")).map(_.asInstanceOf[Long])
      val newCount = Option(cm("c")).map(_.asInstanceOf[Long]).getOrElse(0L)
      prevEdges.releaseLineage(); prevMapping.releaseLineage()

      val stepMetric = SuperstepMetrics(cfg.runId, "cc-sampled", round,
        edgeCount, newCount, nEst, 0, (System.nanoTime() - t0) / 1000000)
      metrics += stepMetric
      ck.foreach(_.appendMetrics(Seq(stepMetric)))
      edgeCount = newCount
      nEst = Option(cm("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
      round += 1
      ck.foreach { c =>
        if (round % cfg.checkpointEvery == 0 || edgeCount == 0)
          c.save(round, Map("edges" -> edges, "mapping" -> mapping),
            Map("algo" -> "cc-sampled", "edgeCount" -> edgeCount.toString,
                "runId" -> cfg.runId))
      }
    }
    require(edgeCount == 0,
      s"sampled CC did not converge in ${cfg.maxRounds} rounds")
    // edge-free input: the loop never ran — mapping is the identity,
    // every vertex its own component
    if (round == startRound) lastRoots = Some(mapping.count())
    (mapping, metrics.toSeq, lastRoots)
  }

  // ---------------------------------------------------------------------
  // Strategy 4: G5 randomized coin-toss hooking (random-mate), seeded.
  // ---------------------------------------------------------------------
  private def randomizedHook(
      edges0: Dataset[Edge], mapping0: DataFrame, cfg: Config,
      startRound: Int = 0):
      (DataFrame, Seq[SuperstepMetrics]) = {
    val spark = edges0.sparkSession
    import spark.implicits._
    val metrics = ArrayBuffer.empty[SuperstepMetrics]
    val ck = cfg.checkpointDir.map(new CheckpointManager(spark, _))

    var edges = edges0.toDF().cutLineage()
    var mapping = mapping0.cutLineage()
    var round = startRound
    var edgeCount = edges.count()

    while (edgeCount > 0 && round < cfg.maxRounds) {
      val t0 = System.nanoTime()
      // Deterministic per-round coin: heads(v) ⟺ hash is even.
      def heads(c: org.apache.spark.sql.Column) =
        pmod(xxhash64(lit(cfg.seed), lit(round), c), lit(2)) === 0
      // Tails hook to a heads-neighbor (max for determinism); the hook
      // forest has depth 1 by construction (a head never hooks), so no
      // pointer jumping is needed — the reference resolves the same
      // races with atomics + later root finding.
      val bidir = edges.select(explode(array(
          struct($"src".as("a"), $"dst".as("b")),
          struct($"dst".as("a"), $"src".as("b")))).as("e"))
        .select($"e.a".as("a"), $"e.b".as("b"))
      val f = bidir.filter(!heads($"a") && heads($"b"))
        .groupBy($"a".as("id")).agg(max($"b").as("label"))
        .cutLineage()

      val fB = bcIfSmall(f, edgeCount, cfg)
      val contracted = edges.as("e")
        .join(fB.as("fs"), $"e.src" === $"fs.id", "left")
        .join(fB.as("fd"), $"e.dst" === $"fd.id", "left")
        .select(coalesce($"fs.label", $"e.src").as("u"),
                coalesce($"fd.label", $"e.dst").as("v"))
        .filter($"u" =!= $"v")
        .select(least($"u", $"v").as("src"), greatest($"u", $"v").as("dst"))
        .distinct()
      val newMapping = mapping.as("m")
        .join(fB.as("f"), $"m.label" === $"f.id", "left")
        .select($"m.id".as("id"), coalesce($"f.label", $"m.label").as("label"))

      val prevEdges = edges; val prevMapping = mapping
      val (newEdges, cm) = barrierObserved(contracted, count(lit(1)).as("n"))
      edges = newEdges
      mapping = newMapping.cutLineage()
      val newCount = Option(cm("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
      f.releaseLineage(); prevEdges.releaseLineage(); prevMapping.releaseLineage()
      val stepMetric = SuperstepMetrics(cfg.runId, "cc-random", round,
        edgeCount, newCount, -1L, 0, (System.nanoTime() - t0) / 1000000)
      metrics += stepMetric
      ck.foreach(_.appendMetrics(Seq(stepMetric)))
      edgeCount = newCount
      round += 1
      ck.foreach { c =>
        if (round % cfg.checkpointEvery == 0 || edgeCount == 0)
          c.save(round, Map("edges" -> edges, "mapping" -> mapping),
            Map("algo" -> "cc-random", "edgeCount" -> edgeCount.toString,
                "runId" -> cfg.runId))
      }
    }
    require(edgeCount == 0,
      s"randomized CC did not converge in ${cfg.maxRounds} rounds " +
        "(reference analogue: stall detector, randomized_OPENMP_cc.cpp:143-150)")

    // Representatives are arbitrary (coin tosses) — canonicalize to the
    // component max (every member, incl. the rep, is present in mapping).
    val rep = mapping.groupBy($"label").agg(max($"id").as("rep"))
    val out = mapping.as("m").join(rep.as("r"), $"m.label" === $"r.label")
      .select($"m.id".as("id"), $"r.rep".as("label"))
    (out, metrics.toSeq)
  }

  /** Broadcast hint for relabel maps once they are known-small. The map has
    * at most as many rows as the current edge count, which we track. */
  private def bcIfSmall(df: DataFrame, upperBound: Long, cfg: Config): DataFrame =
    if (upperBound <= cfg.broadcastRows) broadcast(df) else df

  /** Component count from a label table. */
  def componentCount(labels: Dataset[VertexLabel]): Long =
    labels.select(countDistinct(col("label"))).collect()(0).getLong(0)

  /** Per-component sizes (A5: `serial_cc.cpp:66-74`). */
  def componentSizes(labels: Dataset[VertexLabel]): DataFrame =
    labels.groupBy(col("label")).agg(count(lit(1)).as("size"))
}
