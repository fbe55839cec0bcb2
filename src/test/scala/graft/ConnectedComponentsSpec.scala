package graft

import graft.graph.{Edge, Generators, GraphIO, UnionFind}
import graft.operators.ConnectedComponents
import graft.operators.ConnectedComponents.{CCStrategy, Config}

/** CC correctness vs the plain-Scala union-find oracle on the reference's
  * own fixture graphs and the north-star synthetic shapes. Canonical label
  * = component max-vertex-id (SURVEY.md §3.5). */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def oracleOf(edges: Seq[(Long, Long)], vertices: Seq[Long] = Nil): Map[Long, Long] =
    UnionFind.components(edges, vertices).toMap

  private def sparkCC(edges: Seq[(Long, Long)], strategy: CCStrategy,
                      vertices: Seq[Long] = Nil): Map[Long, Long] = {
    val ds = spark.createDataset(edges.map { case (u, v) => Edge(u, v) })
    val extra = if (vertices.isEmpty) None else Some(spark.createDataset(vertices))
    ConnectedComponents.run(ds, extra, Config(strategy = strategy))
      .labels.collect().map(l => l.id -> l.label).toMap
  }

  private val strategies = Seq(
    CCStrategy.HookAndContract, CCStrategy.AlternatingStar,
    CCStrategy.SampledContraction, CCStrategy.RandomizedHook)

  test("small.txt: labels exact vs oracle, all strategies") {
    val g = GraphIO.readTextGraph(spark, resourcePath("graphs/small.txt"))
    g.vertexCount shouldBe 6L
    val edges = g.edges.collect().map(e => (e.src, e.dst)).toSeq
    val oracle = oracleOf(edges, 0L until g.vertexCount)
    for (s <- strategies) {
      val got = sparkCC(edges, s, 0L until g.vertexCount)
      got shouldBe oracle
    }
  }

  test("slide.txt exact labels, all strategies") {
    val g = GraphIO.readTextGraph(spark, resourcePath("graphs/slide.txt"))
    val edges = g.edges.collect().map(e => (e.src, e.dst)).toSeq
    val oracle = oracleOf(edges, 0L until g.vertexCount)
    for (s <- strategies) sparkCC(edges, s, 0L until g.vertexCount) shouldBe oracle
  }

  test("medium1.txt + medium2.txt exact labels (hook strategy)") {
    for (name <- Seq("graphs/medium1.txt", "graphs/medium2.txt")) {
      val g = GraphIO.readTextGraph(spark, resourcePath(name))
      GraphIO.validateBounds(g.edges, g.vertexCount)
      val edges = g.edges.collect().map(e => (e.src, e.dst)).toSeq
      val oracle = oracleOf(edges, 0L until g.vertexCount)
      sparkCC(edges, CCStrategy.HookAndContract, 0L until g.vertexCount) shouldBe oracle
    }
  }

  test("text reader is multi-split safe: tiny maxPartitionBytes, same graph") {
    // Force Spark to split medium1.txt (23 KB) into many file splits —
    // the header must still be identified as the first line of the FILE,
    // not of whichever split a monotonically_increasing_id ordering
    // happens to rank first (the round-2 single-split assumption).
    val path = resourcePath("graphs/medium1.txt")
    val whole = GraphIO.readTextGraph(spark, path)
    val wholeEdges = whole.edges.collect().map(e => (e.src, e.dst)).sorted
    val conf = spark.conf
    val prev = conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "2048")
      val split = GraphIO.readTextGraph(spark, path)
      split.edges.rdd.getNumPartitions should be > 1 // the split actually happened
      split.vertexCount shouldBe whole.vertexCount
      split.edgeCount shouldBe whole.edgeCount
      split.edges.collect().map(e => (e.src, e.dst)).sorted shouldBe wholeEdges
    } finally conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("text reader anchors the header per file: directory of shards reads as one graph") {
    // ADVICE r3: with a directory input, every file's offset-0 split has
    // first_block=true; a single global header anchor would keep one
    // header and parse the other files' header lines as edges. Shards
    // share the id space: V = max(V_file), E = Σ E_file.
    val dir = java.nio.file.Files.createTempDirectory("graft-shards")
    val whole = GraphIO.readTextGraph(spark, resourcePath("graphs/medium1.txt"))
    val all = whole.edges.collect().map(e => (e.src, e.dst)).sorted
    val (shardA, shardB) = all.splitAt(all.length / 2)
    def write(name: String, edges: Seq[(Long, Long)]): Unit =
      java.nio.file.Files.writeString(dir.resolve(name),
        s"${whole.vertexCount} ${edges.length}\n" +
          edges.map { case (u, v) => s"$u $v" }.mkString("\n") + "\n")
    write("part-0.txt", shardA.toSeq)
    write("part-1.txt", shardB.toSeq)
    val sharded = GraphIO.readTextGraph(spark, dir.toString)
    sharded.vertexCount shouldBe whole.vertexCount
    sharded.edgeCount shouldBe all.length.toLong
    sharded.edges.collect().map(e => (e.src, e.dst)).sorted shouldBe all
  }

  test("sparse_graph.txt (10k vertices): exact labels + component count, all strategies") {
    val g = GraphIO.readTextGraph(spark, resourcePath("graphs/sparse_graph.txt"))
    val edges = g.edges.collect().map(e => (e.src, e.dst)).toSeq
    val oracle = oracleOf(edges, 0L until g.vertexCount)
    for (s <- strategies) {
      val got = sparkCC(edges, s, 0L until g.vertexCount)
      got.size shouldBe g.vertexCount
      got shouldBe oracle
    }
  }

  test("chain(50): 1 component, all labels = 49 (diameter stress)") {
    val edges = (0L until 49L).map(i => (i, i + 1))
    for (s <- strategies) {
      val got = sparkCC(edges, s)
      got.values.toSet shouldBe Set(49L)
    }
  }

  test("star(40): 1 component, all labels = 39 (skew stress)") {
    val edges = (1L until 40L).map(i => (0L, i))
    for (s <- strategies) sparkCC(edges, s).values.toSet shouldBe Set(39L)
  }

  test("forest of 4 disjoint chains: 4 components, per-copy max labels") {
    val edges = Generators.forest(spark, 4, 25, Generators.chain)
      .collect().map(e => (e.src, e.dst)).toSeq
    val oracle = oracleOf(edges)
    for (s <- strategies) sparkCC(edges, s) shouldBe oracle
  }

  test("dirty input: self-loops, duplicates, reversed edges — loader semantics") {
    val edges = Seq[(Long, Long)]((3, 1), (1, 3), (2, 2), (4, 4), (5, 6), (6, 5), (5, 6))
    // vertices present: 1..6; 2 and 4 only via self-loops → singletons
    val oracle = oracleOf(edges, Seq(1L, 2L, 3L, 4L, 5L, 6L))
    for (s <- strategies) sparkCC(edges, s, Seq(1L, 2L, 3L, 4L, 5L, 6L)) shouldBe oracle
  }

  test("random graphs match oracle for several seeds, all strategies") {
    for (seed <- 1 to 3) {
      val edges = Generators.random(spark, 300, 400, seed).collect()
        .map(e => (e.src, e.dst)).toSeq
      val oracle = oracleOf(edges)
      for (s <- strategies) sparkCC(edges, s) shouldBe oracle
    }
  }

  test("component sizes and count agree with oracle") {
    val g = GraphIO.readTextGraph(spark, resourcePath("graphs/small.txt"))
    val res = ConnectedComponents.run(g.edges,
      Some(spark.range(0, g.vertexCount).as[Long]))
    val edges = g.edges.collect().map(e => (e.src, e.dst)).toSeq
    val oracleCount = oracleOf(edges, 0L until g.vertexCount).values.toSet.size.toLong
    ConnectedComponents.componentCount(res.labels) shouldBe oracleCount
    val sizes = ConnectedComponents.componentSizes(res.labels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sizes.values.sum shouldBe 6L
  }

  test("component count is folded into the final mapping job (no extra action)") {
    // r4 verdict Next #4: Bench/CCRun paid a separate countDistinct job
    // per rep for a number the final mapping materialization already
    // knows (canonical max labels → components = count(id == label)).
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    def settled(): Int = { // listener events are async
      var prev = -1; var spins = 0
      while (jobs.get() != prev && spins < 50) { prev = jobs.get(); Thread.sleep(100); spins += 1 }
      jobs.get()
    }
    val edges = Generators.random(spark, 200, 400, seed = 5L)
      .collect().map(e => (e.src, e.dst)).toSeq
    val oracle = oracleOf(edges)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // jobs ≈ actions
    spark.sparkContext.addSparkListener(listener)
    try {
      for (s <- Seq(CCStrategy.HookAndContract, CCStrategy.SampledContraction)) {
        val ds = spark.createDataset(edges.map { case (u, v) => Edge(u, v) })
        val res = ConnectedComponents.run(ds, None, Config(strategy = s))
        val afterRun = settled()
        // the folded count is already on the driver: ZERO further jobs
        res.components shouldBe defined
        settled() shouldBe afterRun
        // and it equals the separate countDistinct action (≥1 job)
        res.components.get shouldBe ConnectedComponents.componentCount(res.labels)
        settled() should be > afterRun
        res.components.get shouldBe oracle.values.toSet.size.toLong
      }
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
    }
  }

  test("metrics are recorded per superstep and edges shrink monotonically") {
    val edges = Generators.random(spark, 500, 800, 7L)
    val res = ConnectedComponents.run(edges)
    res.metrics should not be empty
    val outs = res.metrics.map(_.edgesOut)
    outs.last shouldBe 0L
    res.metrics.map(_.edgesIn).zip(outs).foreach { case (in, out) =>
      out should be < in
    }
  }
}
