package graft

import graft.graph.{Edge, GraphIO}
import graft.operators.PageRank

/** PageRank vs a driver-side dense power-iteration oracle (allclose 1e-6,
  * the north-rule gate). Oracle mirrors the engine's published semantics:
  * symmetric directed edges, damping 0.85, dangling mass redistributed. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Dense oracle over vertex ids 0..n-1 (ids remapped). */
  private def oracle(edges: Seq[(Long, Long)], vertices: Seq[Long],
                     damping: Double = 0.85, iters: Int = 300): Map[Long, Double] = {
    val ids = (vertices ++ edges.flatMap(e => Seq(e._1, e._2))).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.size
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = Array.fill(n)(List.empty[Int])
    canon.foreach { case (u, v) =>
      adj(idx(u)) = idx(v) :: adj(idx(u))
      adj(idx(v)) = idx(u) :: adj(idx(v))
    }
    val outDeg = adj.map(_.size)
    var r = Array.fill(n)(1.0 / n)
    for (_ <- 0 until iters) {
      val nxt = Array.fill(n)((1.0 - damping) / n)
      var dangling = 0.0
      for (i <- 0 until n) {
        if (outDeg(i) == 0) dangling += r(i)
        else adj(i).foreach(j => nxt(j) += damping * r(i) / outDeg(i))
      }
      for (i <- 0 until n) nxt(i) += damping * dangling / n
      r = nxt
    }
    ids.zip(r).toMap
  }

  private def sparkPR(edges: Seq[(Long, Long)], vertices: Seq[Long]): Map[Long, Double] = {
    val ds = spark.createDataset(edges.map { case (u, v) => Edge(u, v) })
    val extra = if (vertices.isEmpty) None else Some(spark.createDataset(vertices))
    PageRank.run(ds, extra).ranks.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  private def allclose(a: Map[Long, Double], b: Map[Long, Double], tol: Double = 1e-6): Unit = {
    a.keySet shouldBe b.keySet
    a.foreach { case (k, v) =>
      math.abs(v - b(k)) should be < tol
    }
  }

  test("small.txt graph: allclose 1e-6 vs dense oracle") {
    val g = GraphIO.readTextGraph(spark, resourcePath("graphs/small.txt"))
    val edges = g.edges.collect().map(e => (e.src, e.dst)).toSeq
    val verts = (0L until g.vertexCount).toSeq
    allclose(sparkPR(edges, verts), oracle(edges, verts))
  }

  test("chain(20): symmetric ranks, allclose vs oracle") {
    val edges = (0L until 19L).map(i => (i, i + 1))
    val got = sparkPR(edges, Nil)
    allclose(got, oracle(edges, Nil))
    // symmetry of the path graph
    math.abs(got(0L) - got(19L)) should be < 1e-9
  }

  test("star(10): hub rank dominates, allclose vs oracle") {
    val edges = (1L until 10L).map(i => (0L, i))
    val got = sparkPR(edges, Nil)
    allclose(got, oracle(edges, Nil))
    got(0L) should be > got(1L)
  }

  test("dangling (isolated) vertices get redistributed mass") {
    val edges = Seq[(Long, Long)]((0, 1), (1, 2))
    val verts = Seq(0L, 1L, 2L, 99L) // 99 is isolated → dangling
    val got = sparkPR(edges, verts)
    allclose(got, oracle(edges, verts))
    // total mass conserved
    math.abs(got.values.sum - 1.0) should be < 1e-9
  }

  test("one Spark job per iteration (delta + dangling mass folded via observe)") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val edges = (0L until 19L).map(i => Edge(i, i + 1))
    val ds = spark.createDataset(edges)
    // AQE materializes every shuffle stage as its own job, which would
    // drown the signal; with it off, jobs ≈ driver actions — the thing
    // this regression test guards (1 action per iteration, not 3).
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.addSparkListener(listener)
    try {
      val res = PageRank.run(ds, None, PageRank.Config(maxIter = 10, tol = 0.0))
      res.iterations shouldBe 10
      // listener events are async; wait until the count is stable
      var prev = -1
      var spins = 0
      while (jobs.get() != prev && spins < 50) {
        prev = jobs.get(); Thread.sleep(100); spins += 1
      }
      // setup = verts barrier + count + wEdges barrier + initial ranks
      // barrier (4 jobs, possibly a few more under AQE); each iteration
      // is ONE materialization job plus the one-task collect of the
      // 1-row dangling-mass broadcast (the price of a plan — and its
      // compiled codegen — that is IDENTICAL across iterations; a
      // changing literal re-compiled every stage every iteration). The
      // pre-round-4 loop ran 3 heavy actions/iter (dangling agg + delta
      // agg + checkpoint), i.e. ≥30 full-width jobs here.
      jobs.get() should be <= (10 * 2 + 8)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
    }
  }

  test("pinned fast path (tol=0, no dangling) is bit-identical to the observed loop") {
    // Same graph, tol = 0: without a checkpoint dir the pinned fast path
    // runs (chunked iterations, no dangling-mass observation); WITH a
    // checkpoint dir the generic observed loop runs. With zero dangling
    // vertices dmass ≡ 0.0, so d·(contrib + 0.0·rw) ≡ d·contrib and the
    // UNROUNDED ranks must be bit-equal between the two paths.
    val edges = Seq(Edge(0, 1), Edge(1, 2), Edge(2, 3), Edge(0, 3),
      Edge(3, 4), Edge(4, 5), Edge(1, 5))
    val ds = spark.createDataset(edges)
    def ranksOf(cfg: PageRank.Config): Map[Long, Double] =
      PageRank.run(ds, None, cfg).ranks.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fast = ranksOf(PageRank.Config(maxIter = 9, tol = 0.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-ab").toString
    val slow = ranksOf(PageRank.Config(maxIter = 9, tol = 0.0,
      checkpointDir = Some(dir)))
    fast shouldBe slow
    // personalized variant: the rw column rides the fast-path chain
    val src = spark.createDataset(Seq(0L, 3L))
    val fastP = PageRank.personalized(ds, src,
        cfg = PageRank.Config(maxIter = 9, tol = 0.0))
      .ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dirP = java.nio.file.Files.createTempDirectory("graft-ppr-ab").toString
    val slowP = PageRank.personalized(ds, spark.createDataset(Seq(0L, 3L)),
        cfg = PageRank.Config(maxIter = 9, tol = 0.0,
          checkpointDir = Some(dirP)))
      .ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    fastP shouldBe slowP
  }

  /** Dense PPR oracle: restart uniform over `sources`, dangling mass to
    * the sources. */
  private def pprOracle(edges: Seq[(Long, Long)], vertices: Seq[Long],
                        sources: Set[Long], damping: Double = 0.85,
                        iters: Int = 300): Map[Long, Double] = {
    val ids = (vertices ++ edges.flatMap(e => Seq(e._1, e._2))).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.size
    val s = ids.filter(sources.contains)
    val rw = ids.map(id => if (sources.contains(id)) 1.0 / s.size else 0.0).toArray
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = Array.fill(n)(List.empty[Int])
    canon.foreach { case (u, v) =>
      adj(idx(u)) = idx(v) :: adj(idx(u))
      adj(idx(v)) = idx(u) :: adj(idx(v))
    }
    val outDeg = adj.map(_.size)
    var r = rw.clone()
    for (_ <- 0 until iters) {
      val nxt = Array.tabulate(n)(i => (1.0 - damping) * rw(i))
      var dangling = 0.0
      for (i <- 0 until n) {
        if (outDeg(i) == 0) dangling += r(i)
        else adj(i).foreach(j => nxt(j) += damping * r(i) / outDeg(i))
      }
      for (i <- 0 until n) nxt(i) += damping * dangling * rw(i)
      r = nxt
    }
    ids.zip(r).toMap
  }

  test("personalized: restart mass concentrates at sources, allclose vs dense PPR oracle") {
    val edges = (0L until 19L).map(i => (i, i + 1)) ++ Seq((5L, 15L))
    val sources = Set(3L, 4L)
    val ds = spark.createDataset(edges.map { case (u, v) => Edge(u, v) })
    val src = spark.createDataset(sources.toSeq)
    val got = PageRank.personalized(ds, src).ranks.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    allclose(got, pprOracle(edges, Nil, sources))
    math.abs(got.values.sum - 1.0) should be < 1e-9
    got(3L) should be > got(12L) // near the restart set beats far from it
  }

  test("personalized: dangling mass returns to the sources") {
    val edges = Seq[(Long, Long)]((0, 1), (1, 2))
    val verts = Seq(0L, 1L, 2L, 99L) // 99 isolated → dangling
    val sources = Set(0L)
    val ds = spark.createDataset(edges.map { case (u, v) => Edge(u, v) })
    val got = PageRank.personalized(ds, spark.createDataset(sources.toSeq),
        Some(spark.createDataset(verts))).ranks.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    allclose(got, pprOracle(edges, verts, sources))
    math.abs(got.values.sum - 1.0) should be < 1e-9
    got(99L) shouldBe 0.0 +- 1e-12 // unreachable from sources, no restart
  }

  /** Dense weighted oracle: transition ∝ edge weight / vertex strength. */
  private def weightedOracle(edges: Seq[(Long, Long, Long)],
                             damping: Double = 0.85, iters: Int = 300): Map[Long, Double] = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => ((math.min(e._1, e._2), math.max(e._1, e._2)), e._3))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val ids = canon.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.size
    val adj = Array.fill(n)(List.empty[(Int, Long)])
    canon.foreach { case ((u, v), w) =>
      adj(idx(u)) = (idx(v), w) :: adj(idx(u))
      adj(idx(v)) = (idx(u), w) :: adj(idx(v))
    }
    val strength = adj.map(_.map(_._2).sum.toDouble)
    var r = Array.fill(n)(1.0 / n)
    for (_ <- 0 until iters) {
      val nxt = Array.fill(n)((1.0 - damping) / n)
      for (i <- 0 until n; (j, w) <- adj(i))
        nxt(j) += damping * r(i) * w / strength(i)
      r = nxt
    }
    ids.zip(r).toMap
  }

  test("weighted: heavy edges attract rank, allclose vs dense weighted oracle") {
    // chain 0-1-2-3-4 with a heavy 1-2 tie (weight 10 vs 1)
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 10L), (2L, 3L, 1L), (3L, 4L, 1L))
    val df = spark.createDataset(edges).toDF("src", "dst", "weight")
    val got = PageRank.runWeightedGraph(df).ranks.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    allclose(got, weightedOracle(edges))
    math.abs(got.values.sum - 1.0) should be < 1e-9
    // the heavy tie pulls mass toward 1 and 2 vs the symmetric ends
    got(1L) should be > got(0L)
    got(2L) should be > got(3L)
    // all-equal weights reduce to the unweighted result
    val eq = Seq((0L, 1L, 3L), (1L, 2L, 3L), (2L, 3L, 3L))
    val gotEq = PageRank.runWeightedGraph(
        spark.createDataset(eq).toDF("src", "dst", "weight")).ranks.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    allclose(gotEq, sparkPR(eq.map(e => (e._1, e._2)), Nil))
  }

  test("ranks sum to 1 on a multi-component graph") {
    val edges = Seq[(Long, Long)]((0, 1), (2, 3), (3, 4), (2, 4))
    val got = sparkPR(edges, Nil)
    math.abs(got.values.sum - 1.0) should be < 1e-9
    allclose(got, oracle(edges, Nil))
  }
}
