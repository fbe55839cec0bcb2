package graft.operators

import org.apache.spark.sql.GraftLineage
import org.apache.spark.sql.GraftLineage._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strongly connected components over a DIRECTED edge table (src, dst),
  * by Trim + Forward-Max-Coloring + Backward-Mark — the standard
  * distributed SCC decomposition (Slota/Rajamanickam/Madduri PPoPP'14
  * "BFS and Coloring-Based Parallel Algorithms for Strongly Connected
  * Components"; Orzan's coloring). Output: (id, label) with
  * label = MAX vertex id in the SCC — the same canonical-label contract
  * as the engine's undirected CC (SURVEY.md §3.5).
  *
  * Per outer round:
  *  1. TRIM (few sweeps): vertices with no in-edges or no out-edges in
  *     the remaining graph are singleton SCCs — peel them. Handles the
  *     long acyclic tails that make pure coloring O(V) rounds.
  *  2. COLOR: c(v) := v, then propagate c(v) = max(c(v), max_{u→v} c(u))
  *     to fixpoint — after which c(v) = r means r reaches v, and each
  *     color class is closed under the SCC of its root (c(r) = r).
  *  3. MARK: backward BFS from each root r inside color class r; the
  *     marked set is exactly {v : r→v and v→r} = SCC(r) (the classical
  *     color-closure argument: every vertex on a v→r path inside class r
  *     is itself in class r). Assign, peel, repeat.
  *
  * Scale shape: every step is an equi-join keyed by src/dst or id plus a
  * partial-agg'd max — the same join/agg loop machinery as PageRank/CC,
  * with lineage barriers per iteration and eager release of the previous
  * state. Rounds: ≤ #distinct-SCC-layers after trimming (one giant SCC +
  * noise resolves in 1-2 rounds; the adversarial worst case — a long
  * chain of nontrivial SCCs — costs a round per layer, the documented
  * trade of the coloring family). */
object StronglyConnected {

  def scc(directed: DataFrame, maxRounds: Int = 50,
          trimSweeps: Int = 3): DataFrame = {
    val spark = directed.sparkSession
    import spark.implicits._

    // adaptive loop partitioning (guide §2; graft.plans.Adaptive): the
    // edge count rides the input materialization as an observed metric
    val (edges1, eObs) = barrierObserved(
      directed.select($"src".cast("long"), $"dst".cast("long"))
        .filter($"src" =!= $"dst").distinct()
        .repartition(spark.sessionState.conf.numShufflePartitions, $"src"),
      count(lit(1)).as("n"))
    val (edges0, p) = graft.plans.Adaptive.rekey(edges1,
      Option(eObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L), Seq($"src"))
    var edges = edges0
    // vertex count observed inside the materialization job itself — a
    // separate count() is one more constant-time driver job per run
    // (the strong-scaling serial floor is made of exactly such jobs)
    val (rem0, remObs) = barrierObserved(
      edges.select($"src".as("id")).union(edges.select($"dst".as("id")))
        .distinct().repartition(p, $"id"),
      count(lit(1)).as("n"))
    var remaining = rem0
    // accumulated (id, label) assignments; unioned at the end
    var assigned = List.empty[DataFrame]
    var nRemaining =
      Option(remObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
    var round = 0

    while (nRemaining > 0 && round < maxRounds) {
      // ---- 1. trim: no-in or no-out vertices are singleton SCCs ----
      var sweep = 0
      var trimmed = true
      while (trimmed && sweep < trimSweeps && nRemaining > 0) {
        val both = barrier(
          edges.select($"src".as("id")).distinct()
            .join(edges.select($"dst".as("id")).distinct(), "id")
            .repartition(p, $"id"))
        // singleton SCCs materialized directly as their (id, label)
        // assignment, with the count folded into the same job
        val (singles, sObs) = barrierObserved(
          remaining.join(both, Seq("id"), "left_anti")
            .select($"id", $"id".as("label")),
          count(lit(1)).as("n"))
        val nSingles =
          Option(sObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
        if (nSingles > 0) {
          assigned ::= singles
          GraftLineage.release(remaining)
          remaining = both
          nRemaining -= nSingles
          val e2 = barrier(
            edges.join(remaining.withColumnRenamed("id", "src"), "src")
              .join(remaining.withColumnRenamed("id", "dst"), "dst")
              .select($"src", $"dst").repartition(p, $"src"))
          GraftLineage.release(edges)
          edges = e2
        } else {
          GraftLineage.release(both)
          GraftLineage.release(singles)
          trimmed = false
        }
        sweep += 1
      }
      if (nRemaining == 0) { round += 1 }
      else {
        // ---- 2. color: forward max propagation to fixpoint ----
        var colors = barrier(remaining.select($"id", $"id".as("c")))
        var converged = false
        while (!converged) {
          val incoming = edges.as("e")
            .join(colors.as("x"), $"e.src" === $"x.id")
            .groupBy($"e.dst".as("id"))
            .agg(max($"x.c").as("inc"))
          // one job per color iteration (round-6 fold): the repartition
          // rides the observed materialization; the unread chg column
          // stays in the barrier (8 B/row) and is pruned at every read
          val (next, obs) = barrierObserved(
            colors.as("x")
              .join(incoming.as("i"), Seq("id"), "left")
              .select($"id",
                greatest($"x.c", coalesce($"i.inc", $"x.c")).as("c"),
                ($"i.inc".isNotNull && $"i.inc" > $"x.c").cast("long").as("chg"))
              .repartition(p, $"id"),
            sum($"chg").as("nchg"))
          GraftLineage.release(colors)
          colors = next
          converged = obs("nchg") == null ||
            obs("nchg").asInstanceOf[Long] == 0L
        }
        // ---- 3. backward mark from roots inside each color class ----
        // ce: edges with both endpoint colors, kept only intra-class
        val ce = barrier(
          edges.as("e")
            .join(colors.as("cs"), $"e.src" === $"cs.id")
            .join(colors.as("cd"), $"e.dst" === $"cd.id")
            .filter($"cs.c" === $"cd.c")
            .select($"e.src", $"e.dst")
            .repartition(p, $"dst"))
        // Round-6 fold: `marked` is a LAZY union of the per-level
        // barriers (the CC doneParts shape) instead of a consolidated
        // re-barrier per level — the anti-join scans the same total
        // rows either way, but the per-level union+repartition JOB (a
        // full reshuffle of everything marked so far) disappears. One
        // job per mark level remains: the newMarks materialization.
        var markedParts =
          List(barrier(colors.filter($"c" === $"id").select($"id", $"c")))
        def markedAll: DataFrame = markedParts.reduce(_ union _)
        var frontier = markedParts.head
        var growing = true
        while (growing) {
          val (newMarks, obs) = barrierObserved(
            ce.as("e")
              .join(frontier.as("f"), $"e.dst" === $"f.id")
              .select($"e.src".as("id"), $"f.c".as("c"))
              .distinct()
              .join(markedAll, Seq("id"), "left_anti")
              .repartition(p, $"id"),
            count(lit(1)).as("n"))
          val n = if (obs("n") == null) 0L else obs("n").asInstanceOf[Long]
          if (n == 0L) { GraftLineage.release(newMarks); growing = false }
          else {
            markedParts ::= newMarks
            frontier = newMarks
            // compact every 8 levels (the betweenness visitedParts rule):
            // an uncompacted union grows the anti-join plan linearly in
            // level count — O(depth²) driver re-analysis on deep regions.
            // The current frontier stays its own barrier (the next join
            // reads it directly).
            if (markedParts.size >= 9) {
              val rest = markedParts.filter(_ ne frontier)
              val compacted =
                barrier(rest.reduce(_ union _).repartition(p, $"id"))
              rest.foreach(GraftLineage.release(_))
              markedParts = List(frontier, compacted)
            }
          }
        }
        val (asg, aObs) = barrierObserved(
          markedAll.select($"id", $"c".as("label")), count(lit(1)).as("n"))
        assigned ::= asg
        val nAssigned =
          Option(aObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
        // peel the assigned SCCs and iterate on the rest
        val r2 = barrier(
          remaining.join(asg.select($"id"), Seq("id"), "left_anti")
            .repartition(p, $"id"))
        GraftLineage.release(remaining); remaining = r2
        nRemaining -= nAssigned
        val e2 = barrier(
          edges.join(remaining.withColumnRenamed("id", "src"), "src")
            .join(remaining.withColumnRenamed("id", "dst"), "dst")
            .select($"src", $"dst").repartition(p, $"src"))
        GraftLineage.release(edges); edges = e2
        GraftLineage.release(colors); GraftLineage.release(ce)
        markedParts.foreach(GraftLineage.release(_))
        round += 1
      }
    }
    if (nRemaining != 0) { // release before throwing (block hygiene)
      (edges :: remaining :: assigned).foreach(GraftLineage.release(_))
      throw new IllegalStateException(
        s"scc: $nRemaining vertices unresolved after $maxRounds rounds")
    }
    if (assigned.isEmpty) { // empty edge set → empty label table
      GraftLineage.release(edges); GraftLineage.release(remaining)
      return spark.emptyDataFrame
        .select(lit(0L).as("id"), lit(0L).as("label")).limit(0)
    }
    val out = barrier(assigned.reduce(_ union _))
    (edges :: remaining :: assigned).foreach(GraftLineage.release(_))
    out
  }

  /** Condensation DAG: contract each SCC to its canonical label and keep
    * the distinct cross-SCC edges — acyclic by construction (a cycle of
    * SCCs would be one SCC). `labels` is [[scc]]'s (id, label) output.
    * Scale shape: two equi-joins keyed by the edge endpoints + one
    * distinct — the same relabel plan as CC's edge contraction
    * (ConnectedComponents G4), no iteration. */
  def condensation(directed: DataFrame, labels: DataFrame): DataFrame = {
    val spark = directed.sparkSession
    import spark.implicits._
    directed
      .select($"src".cast("long"), $"dst".cast("long"))
      .join(labels.select($"id".as("src"), $"label".as("src_scc")), "src")
      .join(labels.select($"id".as("dst"), $"label".as("dst_scc")), "dst")
      .filter($"src_scc" =!= $"dst_scc")
      .select($"src_scc", $"dst_scc")
      .distinct()
  }

  /** Longest-path topological levels of a DAG (e.g. the
    * [[condensation]]): level(v) = 0 for sources, else
    * 1 + max(level(u) : u → v) — the schedule depth / critical-path
    * stage of each node, and the canonical topological ordering key
    * (every edge goes strictly level-upward).
    *
    * Iterative max-propagation: one key-partitioned join + max agg per
    * round; levels only increase, so an unchanged Σlevel observed in the
    * round's own materialization job ⟺ fixpoint. Converges in
    * depth(DAG) rounds; `maxRounds` doubles as a cycle guard (a cycle
    * would increase levels forever), so the require below also certifies
    * acyclicity of the input. */
  def dagLevels(dag: DataFrame, maxRounds: Int = 64): DataFrame = {
    val spark = dag.sparkSession
    import spark.implicits._
    scopedBlocks(spark) {
      // adaptive loop partitioning — same rule as [[scc]]
      val (edges1, eObs) = barrierObserved(
        dag.select($"src".cast("long"), $"dst".cast("long"))
          .filter($"src" =!= $"dst").distinct()
          .repartition(spark.sessionState.conf.numShufflePartitions, $"src"),
        count(lit(1)).as("n"))
      val (edges, p) = graft.plans.Adaptive.rekey(edges1,
        Option(eObs("n")).map(_.asInstanceOf[Long]).getOrElse(0L), Seq($"src"))
      val sumMetric = sum($"level").as("lsum")
      var state = barrier(
        edges.select($"src".as("id")).union(edges.select($"dst".as("id")))
          .distinct().select($"id", lit(0L).as("level")))
      var prevSum = 0L
      var changed = true
      var round = 0
      while (changed && round < maxRounds) {
        round += 1
        val pushed = edges
          .join(state.select($"id".as("src"), $"level"), Seq("src"))
          .groupBy($"dst".as("id")).agg((max($"level") + 1L).as("nl"))
        val (next, obs) = barrierObserved(
          state.join(pushed.select($"id", $"nl"), Seq("id"), "left")
            .select($"id", greatest($"level", coalesce($"nl", lit(0L))).as("level")),
          sumMetric)
        val s2 = Option(obs("lsum")).map(_.asInstanceOf[Long]).getOrElse(0L)
        release(state)
        state = next
        changed = s2 != prevSum
        prevSum = s2
      }
      require(!changed,
        s"dagLevels did not converge in $maxRounds rounds — cycle in input?")
      state
    }
  }
}
