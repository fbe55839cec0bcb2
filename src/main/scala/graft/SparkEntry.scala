package graft

import graft.graph.GraphIO
import graft.operators.{ConnectedComponents, GraphMetrics, TriangleCount}
import graft.operators.ConnectedComponents.{CCStrategy, Config}
import graft.sources.EdgeDerivation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftLineage.GraftLineageOps
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query reads the driver-generated parquet under `sfDir` and has a
  * deterministic total output order (the driver hashes values after
  * sorting columns by name; rows are ordered identically in the Spark
  * query and the DuckDB oracle SQL to be safe).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * connected components of the supplier co-occurrence graph. */
  def entry(spark: SparkSession): DataFrame =
    ccLabels(spark, "/root/testdata/sf0.001", CCStrategy.HookAndContract)

  private def ccLabels(spark: SparkSession, dir: String, strategy: CCStrategy): DataFrame = {
    val edges = EdgeDerivation.supplierCooccurrence(spark, dir)
    ConnectedComponents.run(edges, None, Config(strategy = strategy))
      .labels.toDF().orderBy("id")
  }

  private def ccNationLabels(spark: SparkSession, dir: String): DataFrame = {
    val edges = EdgeDerivation.supplierCooccurrenceByNation(spark, dir)
    ConnectedComponents.run(edges, None, Config()).labels.toDF().orderBy("id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2/P1/P3 + dedup — derived canonical edge table
    "edges_supplier" -> ((s, dir) =>
      EdgeDerivation.supplierCooccurrence(s, dir).toDF().orderBy("src", "dst")),
    // A5-adjacent per-vertex degree (groupBy-count agg)
    "degrees" -> ((s, dir) =>
      GraphMetrics.degrees(EdgeDerivation.supplierCooccurrence(s, dir))
        .orderBy("id")),
    // G2-G4+G10: full CC, reference-faithful hook/jump/contract strategy
    "cc_supplier" -> ((s, dir) => ccLabels(s, dir, CCStrategy.HookAndContract)),
    // same fixpoint via small-star/large-star (SoCC'14) — same oracle
    "cc_supplier_star" -> ((s, dir) => ccLabels(s, dir, CCStrategy.AlternatingStar)),
    // same fixpoint via PPoPP'18 sampled contraction — same oracle
    "cc_supplier_sampled" -> ((s, dir) => ccLabels(s, dir, CCStrategy.SampledContraction)),
    // same fixpoint via G5 coin-toss hooking (seeded) — same oracle
    "cc_supplier_random" -> ((s, dir) => ccLabels(s, dir, CCStrategy.RandomizedHook)),
    // incremental CC: fold the SAME edge set in three batches through
    // the streaming label maintainer (star-edge merges) — must equal
    // the one-shot labels, so it shares cc_supplier's oracle
    "cc_incremental" -> ((s, dir) => {
      import s.implicits._
      // materialize the co-occurrence derivation ONCE — each batch is a
      // filter of the barrier, not a re-run of the lineitem self-join
      val edges = org.apache.spark.sql.GraftLineage.barrier(
        EdgeDerivation.supplierCooccurrence(s, dir).toDF())
      val m = new graft.streaming.IncrementalCC.LabelMaintainer(s)
      (0 until 3).foreach(i =>
        m.ingest(edges.filter(pmod(xxhash64($"src", $"dst"), lit(3L)) === i)
          .as[graft.graph.Edge]))
      org.apache.spark.sql.GraftLineage.release(edges)
      m.labels.orderBy("id")
    }),
    // multi-component CC (same-nation restriction)
    "cc_nation" -> ((s, dir) => ccNationLabels(s, dir)),
    // A4/A5: component count + sizes
    "cc_sizes" -> ((s, dir) => {
      val labels = ConnectedComponents.run(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir)).labels
      ConnectedComponents.componentSizes(labels).orderBy("label")
    }),
    // triangle count (wedge join + closing semi-join)
    "triangles" -> ((s, dir) =>
      TriangleCount.count(EdgeDerivation.supplierCooccurrenceByNation(s, dir))),
    // per-vertex triangle participation
    "triangles_per_vertex" -> ((s, dir) =>
      TriangleCount.perVertex(EdgeDerivation.supplierCooccurrenceByNation(s, dir))
        .orderBy("id")),
    // level-synchronous BFS from the smallest vertex (hop distances) —
    // over the CONNECTED supplier graph so the whole vertex set is gated
    "bfs_hops" -> ((s, dir) => {
      // derivation materialized once: the source-pick aggregate and the
      // BFS would otherwise each re-run the lineitem self-join (the
      // harnesses sweep leftover blocks after every query)
      val edges = EdgeDerivation.supplierCooccurrence(s, dir).cutLineage()
      val srcRow = edges.agg(min(least(col("src"), col("dst")))).head()
      if (srcRow.isNullAt(0)) // empty edge set → empty result, not an NPE
        s.emptyDataFrame.select(lit(0L).as("id"), lit(0L).as("dist")).limit(0)
      else graft.operators.Traversal.hopDistances(edges, srcRow.getLong(0)).orderBy("id")
    }),
    // seed-restricted harmonic centrality (one multi-source BFS from the
    // 8 lowest vertex ids; Σ 1/d, 6 dp)
    "harmonic_centrality" -> ((s, dir) => {
      // seed pick + BFS share ONE materialized derivation (same rule as
      // bfs_hops)
      val edges = EdgeDerivation.supplierCooccurrenceByNation(s, dir).cutLineage()
      graft.operators.Centrality.harmonic(edges, lowestVertexIds(edges, centralitySeedK))
        .orderBy("id")
    }),
    // seed-restricted closeness (same BFS; reached/Σd — exact division)
    "closeness_centrality" -> ((s, dir) => {
      val edges = EdgeDerivation.supplierCooccurrenceByNation(s, dir).cutLineage()
      graft.operators.Centrality.closeness(edges, lowestVertexIds(edges, centralitySeedK))
        .orderBy("id")
    }),
    // deterministic DeepWalk corpus: 2 walks × 8 steps from every vertex
    "random_walks" -> ((s, dir) =>
      graft.operators.Traversal.deterministicWalks(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir),
        nWalks = walkN, steps = walkSteps)
        .orderBy("seed", "walk", "step")),
    // skip-gram (center, context) pair counts from the walk corpus —
    // the word2vec training table a DeepWalk pipeline materializes
    "walk_pairs" -> ((s, dir) =>
      graft.operators.Traversal.walkSkipGramPairs(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir),
        nWalks = walkN, steps = walkSteps, window = walkWindow)
        .orderBy("center", "context")),
    // eigenvector centrality (pinned power iterations, L∞ normalization)
    "eigencentrality" -> ((s, dir) =>
      graft.operators.Centrality.eigenvector(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir), maxIter = eigenIters)
        .orderBy("id")),
    // seed-restricted diameter lower bound + exact integer-p90
    // effective diameter from one multi-source BFS
    "graph_diameter" -> ((s, dir) => {
      val edges = EdgeDerivation.supplierCooccurrenceByNation(s, dir).cutLineage()
      graft.operators.Traversal.distanceStats(
        edges, lowestVertexIds(edges, centralitySeedK))
    }),
    // one-row digraph health check over the purchase co-activity digraph
    // (reciprocity numerator/denominator, source/sink counts)
    "digraph_stats" -> ((s, dir) =>
      graft.operators.GraphMetrics.digraphStats(
        graft.operators.Temporal.coactivityDirectedEdges(
          readEvents(s, dir), "purchase"))),
    // multi-source weighted shortest paths (Bellman–Ford, exact longs)
    // over the weighted supplier graph, from the 8 lowest supplier ids
    "sssp_weighted" -> ((s, dir) => {
      val w = EdgeDerivation.supplierCooccurrenceWeightedByNation(s, dir)
        .cutLineage()
      import s.implicits._
      val seeds = w.select($"src".as("id")).union(w.select($"dst".as("id")))
        .distinct().orderBy($"id").limit(centralitySeedK)
        .as[Long].collect().toSeq
      graft.operators.Traversal.weightedDistances(w, seeds)
        .orderBy("source", "id")
    }),
    // seed-restricted Brandes betweenness over the SPARSE text fixture
    // (the co-occurrence graphs are near-cliques — diameter ~1 — where
    // betweenness is identically 0; same fixture rationale as fof_recs)
    "betweenness" -> ((s, dir) => {
      val g = GraphIO.readTextGraph(s, textFixturePath)
      graft.operators.Centrality.betweenness(
        g.edges, lowestVertexIds(g.edges, centralitySeedK))
        .orderBy("id")
    }),
    // Katz centrality (β=1, α=0.05 < 1/λmax on this sparse graph,
    // pinned fixed-point steps — the attenuated-paths score)
    "katz" -> ((s, dir) =>
      graft.operators.Centrality.katz(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir),
        alpha = katzAlpha, maxIter = katzIters)
        .orderBy("id")),
    // HITS hubs/authorities over the DIRECTED customer→supplier graph
    // (pinned alternating updates, per-side L∞ normalization)
    "hits" -> ((s, dir) =>
      graft.operators.Centrality.hits(
        EdgeDerivation.customerSupplierDirected(s, dir), maxIter = hitsIters)
        .orderBy("kind", "id")),
    // ---- temporal/events family (Temporal.scala) ----
    // gap-based sessionization (30-min inactivity splits)
    "sessions" -> ((s, dir) =>
      graft.operators.Temporal.sessionize(readEvents(s, dir))
        .orderBy("user_id", "session_id")),
    // as-of join: each click ↤ latest view at-or-before it, per user;
    // -1 marks "no prior view" (nulls don't survive the hash compare)
    "asof_view_click" -> ((s, dir) =>
      graft.operators.Temporal.asofJoin(readEvents(s, dir), "view", "click")
        .select(col("user_id"), col("right_id"), col("right_us"),
          coalesce(col("left_id"), lit(-1L)).as("left_id"),
          coalesce(col("left_us"), lit(-1L)).as("left_us"))
        .orderBy("user_id", "right_id")),
    // ordered view→click→purchase funnel (strict-ts chains per user)
    "event_funnel" -> ((s, dir) =>
      graft.operators.Temporal.funnel(readEvents(s, dir), funnelStages)
        .orderBy("stage")),
    // hour × type rollup with exact distinct users
    "events_hourly" -> ((s, dir) =>
      graft.operators.Temporal.hourlyRollup(readEvents(s, dir))
        .orderBy("hour_us", "event_type")),
    // exponential time-decay activity score (7-day half-life, pinned
    // as-of epoch so runs reproduce)
    "user_decay" -> ((s, dir) =>
      graft.operators.Temporal.decayedActivity(readEvents(s, dir), decayAsOfUs)
        .orderBy("user_id")),
    // histogram of the integer JSON property props.k
    "props_hist" -> ((s, dir) =>
      graft.operators.Temporal.propsHistogram(readEvents(s, dir), "k")
        .orderBy("k")),
    // CC over purchase co-activity edges (10-min tumbling buckets) —
    // the batch twin of the streaming windowed co-occurrence, fed to
    // the same CC machinery as every other graph
    "cc_coactivity" -> ((s, dir) => {
      import s.implicits._
      val edges = graft.operators.Temporal
        .coactivityEdges(readEvents(s, dir), "purchase")
        .as[graft.graph.Edge]
      ConnectedComponents.run(edges, None, Config()).labels.toDF().orderBy("id")
    }),
    // SCC over ts-ordered DIRECTED purchase co-activity (earlier first
    // buyer → later within a bucket; order flips across buckets give
    // real cycles) — trim + forward-max coloring + backward mark
    "scc_coactivity" -> ((s, dir) =>
      graft.operators.StronglyConnected.scc(
        graft.operators.Temporal.coactivityDirectedEdges(
          readEvents(s, dir), "purchase"))
        .orderBy("id")),
    // condensation DAG of that digraph: SCCs contracted to canonical
    // labels, distinct cross-SCC edges (acyclic by construction)
    "scc_condensation" -> ((s, dir) => {
      // SCC and the condensation relabel share ONE materialized
      // co-activity derivation (window + self-join over events)
      val de = graft.operators.Temporal.coactivityDirectedEdges(
        readEvents(s, dir), "purchase").cutLineage()
      graft.operators.StronglyConnected.condensation(
        de, graft.operators.StronglyConnected.scc(de))
        .orderBy("src_scc", "dst_scc")
    }),
    // longest-path topological levels of the condensation DAG (schedule
    // depth per SCC; the iterative max-propagation also certifies
    // acyclicity — a cycle would never converge)
    "condensation_levels" -> ((s, dir) => {
      val de = graft.operators.Temporal.coactivityDirectedEdges(
        readEvents(s, dir), "purchase").cutLineage()
      val dag = graft.operators.StronglyConnected.condensation(
        de, graft.operators.StronglyConnected.scc(de))
      graft.operators.StronglyConnected.dagLevels(
          dag.select(col("src_scc").as("src"), col("dst_scc").as("dst")))
        .orderBy("id")
    }),
    // 3-core of the nation graph (iterative degree peeling to fixpoint)
    "kcore3" -> ((s, dir) =>
      graft.operators.Traversal.kCoreVertices(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir), k = 3).orderBy("id")),
    // FULL core decomposition (h-index fixpoint — the distributed
    // alternative to sequential peeling; coreness ≥ 3 ⟺ kcore3)
    "coreness" -> ((s, dir) =>
      graft.operators.Traversal.coreness(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir)).orderBy("id")),
    // per-community conductance of the LPA partition (community quality
    // next to the global modularity; exact integer vol/cut alongside)
    "community_conductance" -> ((s, dir) => {
      val edges = EdgeDerivation.supplierCooccurrenceByNation(s, dir).cutLineage()
      val labels = graft.operators.LabelPropagation.run(edges,
        cfg = graft.operators.LabelPropagation.Config(maxIter = lpaIters)).labels
      GraphMetrics.communityConductance(edges, labels).orderBy("label")
    }),
    // per-vertex local clustering coefficient (dense; 6 dp)
    "clustering_coeff" -> ((s, dir) =>
      TriangleCount.clusteringCoefficient(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir)).orderBy("id")),
    // common neighbors per edge = triangles through the edge
    "common_neighbors" -> ((s, dir) =>
      TriangleCount.commonNeighborsPerEdge(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir)).orderBy("src", "dst")),
    // 4-truss: edges in ≥ 2 triangles, peeled to fixpoint (edge-level
    // cohesion — the community-core extractor)
    "ktruss4" -> ((s, dir) =>
      TriangleCount.kTruss(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir), k = 4)
        .orderBy("src", "dst")),
    // Adamic-Adar link-prediction score per edge (rarity-weighted
    // common neighbors, 6 dp)
    "adamic_adar" -> ((s, dir) =>
      TriangleCount.adamicAdar(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir)).orderBy("src", "dst")),
    // degree assortativity (Pearson r of endpoint degrees; exact
    // integer moments + one closed-form double, 6 dp)
    "assortativity" -> ((s, dir) =>
      GraphMetrics.degreeAssortativity(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir))),
    // friend-of-friend link recommendations: top-3 non-adjacent
    // distance-2 candidates per vertex by common-neighbor count — over
    // the SPARSE text-fixture graph (the co-occurrence graphs at this SF
    // are near-cliques where every distance-2 pair is already adjacent,
    // which would make this gate vacuous)
    "fof_recs" -> ((s, dir) => {
      val g = GraphIO.readTextGraph(s, textFixturePath)
      TriangleCount.fofRecommendations(g.edges, k = 3).orderBy("id", "rank")
    }),
    // neighborhood Jaccard per edge (embeddedness; 0 = local bridge)
    "neighbor_jaccard" -> ((s, dir) =>
      TriangleCount.neighborhoodJaccard(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir)).orderBy("src", "dst")),
    // WEIGHTED edge table: co-occurrence multiplicity as tie strength
    "edges_weighted" -> ((s, dir) =>
      EdgeDerivation.supplierCooccurrenceWeightedByNation(s, dir)
        .orderBy("src", "dst")),
    // weighted PageRank: random walk ∝ co-occurrence weight (pinned
    // iterations, 7 dp — same protocol as `pagerank`)
    "pagerank_weighted" -> ((s, dir) =>
      graft.operators.PageRank.runWeightedGraph(
          EdgeDerivation.supplierCooccurrenceWeightedByNation(s, dir),
          cfg = graft.operators.PageRank.Config(maxIter = prIters, tol = 0.0))
        .ranks.select(col("id"), round(col("rank"), 7).as("rank"))
        .orderBy("id")),
    // weighted LPA: heaviest-total-weight neighbor label (integer
    // votes → exact fixpoint, same protocol as `lpa`)
    "lpa_weighted" -> ((s, dir) =>
      graft.operators.LabelPropagation.runWeightedGraph(
        EdgeDerivation.supplierCooccurrenceWeightedByNation(s, dir),
        cfg = graft.operators.LabelPropagation.Config(maxIter = lpaIters))
        .labels.orderBy("id")),
    // vertex strength (weighted degree)
    "strength" -> ((s, dir) =>
      GraphMetrics.strength(
        EdgeDerivation.supplierCooccurrenceWeightedByNation(s, dir))
        .orderBy("id")),
    // Newman modularity of the LPA partition (community quality; same
    // pinned-iteration labels as `lpa`, 6 dp)
    "modularity" -> ((s, dir) => {
      // LPA and the modularity aggregation share ONE materialized
      // derivation instead of re-running the self-join each
      val edges = EdgeDerivation.supplierCooccurrenceByNation(s, dir).cutLineage()
      val labels = graft.operators.LabelPropagation.run(edges,
        cfg = graft.operators.LabelPropagation.Config(maxIter = lpaIters)).labels
      GraphMetrics.modularity(edges, labels)
    }),
    // degree histogram (skew diagnostics)
    "degree_histogram" -> ((s, dir) =>
      GraphMetrics.degreeHistogram(EdgeDerivation.supplierCooccurrenceByNation(s, dir))),
    // A7: two-pass distributed prefix scan over the degree table
    "degrees_prefix_sum" -> ((s, dir) =>
      GraphMetrics.prefixSum(
        GraphMetrics.degrees(EdgeDerivation.supplierCooccurrence(s, dir)),
        "id", "degree").orderBy("id")),
    // §2.5 dense relabel: component labels → dense ids [0, #components)
    "cc_dense_labels" -> ((s, dir) => {
      val labels = ConnectedComponents.run(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir)).labels
      GraphMetrics.denseRelabel(labels.toDF()).orderBy("id")
    }),
    // PageRank (power iteration, damping .85, dangling redistribution),
    // PINNED to prIters iterations (tol=0) so the fixed-point loop is
    // DuckDB-expressible as an unrolled CTE; ranks rounded to 7 dp on
    // both sides (fp sum-order noise ≪ 1e-7). Convergence mode (default
    // tol) is allclose-tested against a dense oracle in PageRankSpec.
    "pagerank" -> ((s, dir) =>
      graft.operators.PageRank.run(
          EdgeDerivation.supplierCooccurrenceByNation(s, dir),
          cfg = graft.operators.PageRank.Config(maxIter = prIters, tol = 0.0))
        .ranks.select(col("id"), round(col("rank"), 7).as("rank"))
        .orderBy("id")),
    // personalized PageRank: restart uniform over the low-id source set,
    // same pinned-iteration protocol as `pagerank` (tol=0, 7 dp round)
    "ppr" -> ((s, dir) => {
      // the restart-source pick and the run share one materialized
      // derivation
      val edges = EdgeDerivation.supplierCooccurrenceByNation(s, dir).cutLineage()
      val sources = GraphIO.vertices(GraphIO.canonical(edges))
        .filter(col("id") <= pprSourceMax)
      graft.operators.PageRank.personalized(edges, sources,
          cfg = graft.operators.PageRank.Config(maxIter = prIters, tol = 0.0))
        .ranks.select(col("id"), round(col("rank"), 7).as("rank"))
        .orderBy("id")
    }),
    // deterministic synchronous label propagation (ties → min label),
    // integer fixpoint → exactly reproducible by an unrolled-CTE oracle
    // at the same iteration cap (early convergence is a fixpoint, so
    // extra oracle iterations are no-ops)
    "lpa" -> ((s, dir) =>
      graft.operators.LabelPropagation.run(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir),
        cfg = graft.operators.LabelPropagation.Config(maxIter = lpaIters))
        .labels.orderBy("id")),
    // SEEDED label propagation: the 8 lowest ids carry a binary class
    // (id % 2); everyone else infers theirs by synchronous majority vote
    // among labeled neighbors — the semi-supervised label-inference
    // primitive (quality/spam class propagation through a link graph)
    "lpa_seeded" -> ((s, dir) => {
      import s.implicits._
      val edges = EdgeDerivation.supplierCooccurrenceByNation(s, dir).cutLineage()
      // same seed rule (and helper) as the sampled-centrality family
      val seeds = lowestVertexIds(edges, centralitySeedK)
        .map(id => (id, id % 2)).toDF("id", "label")
      graft.operators.LabelPropagation.runSeeded(edges, seeds,
          cfg = graft.operators.LabelPropagation.Config(maxIter = lpaIters))
        .labels.orderBy("id")
    }),
    // reference text-format ingestion (S1 header / S2 edge scan / P4
    // bounds) on the hard-signal path: CC over a committed fixture graph
    "cc_text_fixture" -> ((s, dir) => {
      val g = GraphIO.readTextGraph(s, textFixturePath)
      GraphIO.validateBounds(g.edges, g.vertexCount)
      ConnectedComponents.run(g.edges).labels.toDF().orderBy("id")
    }),
    // north-rule per-row invariant: content sha256 across a derived view
    "content_sha" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), sha2(col("text"), 256).as("content_sha"))
        .orderBy("doc_id")),
    // ---- training-data pipeline operators over documents/embeddings ----
    // text quality counters (exact integer stats)
    "text_stats" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      graft.functions.TextAnalysis.qualityStats(
          d.select(col("doc_id"), col("text")), col("text"))
        .select("doc_id", "n_chars_m", "n_tokens", "n_punct", "n_digits", "n_upper")
        .orderBy("doc_id")
    }),
    // Gopher-style repetition filters as exact integers (top token /
    // bigram counts, distinct tokens) — ratios are one division away
    "text_repetition" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      graft.functions.TextAnalysis.repetitionStats(
          d.select(col("doc_id"), col("text")), col("doc_id"), col("text"))
        .orderBy("doc_id")
    }),
    // heuristic language id (stopword argmax + CJK detection)
    "text_lang" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sessionState.conf.numShufflePartitions)
        .select(col("doc_id"),
          graft.functions.TextAnalysis.langId(col("text")).as("lang_guess"))
        .orderBy("doc_id")),
    // composite quality score + BPE-ish token budget estimate
    "text_quality" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sessionState.conf.numShufflePartitions)
      d.select(col("doc_id"),
          graft.functions.TextAnalysis.qualityScore(col("text")).as("quality"),
          graft.functions.TextAnalysis.bpeishTokenCount(col("text")).as("bpeish_tokens"))
        .orderBy("doc_id")
    }),
    // 64-bit rolling fingerprint (xxhash64-based → rows-only check;
    // determinism + collision behavior tested in PipelineSpec)
    "text_fingerprint" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          graft.functions.TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),
    // per-doc unigram cross-entropy vs the corpus distribution (the
    // distribution-level quality signal; rare-token-heavy docs high)
    "doc_xent" -> ((s, dir) =>
      graft.functions.TextAnalysis.unigramCrossEntropy(
          s.read.parquet(s"$dir/documents.parquet"), col("doc_id"), col("text"))
        .orderBy("doc_id")),
    // sequence-aware quality score: cross-entropy under the add-0.5
    // smoothed corpus BIGRAM LM — catches improbable token ORDER that
    // the unigram score cannot see (docs with <2 tokens emit no row)
    "doc_xent_bigram" -> ((s, dir) =>
      graft.functions.TextAnalysis.bigramCrossEntropy(
          s.read.parquet(s"$dir/documents.parquet"), col("doc_id"), col("text"))
        .orderBy("doc_id")),
    // TF-IDF top-3 terms per document (per-doc keyword extraction for
    // topic balancing; ranked by the 6dp-rounded score so the oracle
    // ranks identically)
    "tfidf_topk" -> ((s, dir) =>
      graft.functions.TextAnalysis.tfIdfTopK(
          s.read.parquet(s"$dir/documents.parquet"), col("doc_id"), col("text"), 3)
        .orderBy("doc_id", "rank")),
    // corpus vocabulary top-100 (Zipf-skewed token agg; map-side combine)
    "vocab_topk" -> ((s, dir) =>
      graft.functions.TextAnalysis.vocabTopK(
          s.read.parquet(s"$dir/documents.parquet"), col("text"), 100)
        .orderBy(col("cnt").desc, col("token").asc)),
    // exact distributed order statistics over per-doc token counts:
    // min / quartiles / max by global rank (two-pass, no global sort)
    "token_count_ranks" -> ((s, dir) => {
      // NULL text → 0 tokens on BOTH sides (Spark range-sorts NULLs
      // FIRST, DuckDB row_number defaults NULLS LAST — a single NULL row
      // would shift every global rank otherwise)
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          coalesce(graft.functions.TextAnalysis.tokenCount(col("text")), lit(0L))
            .as("n_tokens"))
      val n = d.count()
      graft.operators.GraphMetrics.valueAtRanks(d, "n_tokens", "doc_id",
        Seq(1L, n / 4, n / 2, 3 * n / 4, n)).orderBy("rank")
    }),
    // the skew guard itself on hard signal: deterministic per-source cap
    // (keep the 10 smallest doc_ids per source)
    "docs_per_source_cap" -> ((s, dir) =>
      graft.plans.Skew.capGroups(
          s.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), coalesce(col("source"), lit("text")).as("source")),
          Seq(col("source")), col("doc_id"), 10)
        .orderBy("source", "doc_id")),
    // exact 3-shingle Jaccard top-3 for the 5 lowest doc_ids (the
    // verification kernel of the near-dup pipeline, on hard signal;
    // integer-ratio arithmetic → bit-exact vs the SQL oracle)
    "text_jaccard_topk" -> ((s, dir) => {
      // repartition first: the docs parquet is one split, and the
      // shingle + 5×n jaccard kernel below would otherwise run in a
      // single task (the bandedSignatures rule)
      val d = s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sessionState.conf.numShufflePartitions)
        .select(col("doc_id"),
          array_distinct(graft.functions.Dedup.shingles(col("text"), 3)).as("sh"))
      val q = broadcast(d.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), col("sh").as("q_sh")))
      val scored = d.select(col("doc_id").as("nbr_id"), col("sh").as("n_sh"))
        .join(q, col("query_id") =!= col("nbr_id"))
        .select(col("query_id"), col("nbr_id"),
          round(graft.functions.Dedup.jaccard(col("q_sh"), col("n_sh")), 6).as("jaccard"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("jaccard").desc, col("nbr_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("nbr_id"), col("jaccard"))
        .orderBy("query_id", "rank")
    }),
    // END-TO-END near-dup pipeline on the hard-signal path: minhash →
    // banded LSH → bucket-join candidates → exact-Jaccard verify ≥ 0.8.
    // Deterministic vs the exact all-pairs oracle on a fixed corpus with
    // fixed xxhash64: at threshold 0.8 the 16-band/4-row LSH miss
    // probability per true pair is (1-s^4)^16 ≤ 2e-4 at s=0.8 (and the
    // actual sf0.001-1 corpora yield zero misses — checked against the
    // oracle at build time), so candidate recall is part of the gate.
    "dedup_near_pairs" -> ((s, dir) =>
      graft.functions.Dedup.nearDuplicates(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          threshold = 0.8)
        .orderBy("id_a", "id_b")),
    // substring-overlap dedup (Lee et al. 2022): pairs sharing ≥ 20
    // consecutive verbatim tokens + the distinct shared-20-gram count —
    // the modality that catches a copied paragraph inside two otherwise-
    // different documents (document-level Jaccard at 0.8 misses it)
    "substring_dup_pairs" -> ((s, dir) =>
      graft.functions.Dedup.substringDupPairs(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          k = substringK, maxPostings = substringMaxPostings)
        .orderBy("id_a", "id_b")),
    // duplicate CLUSTERS: connected components over the near-dup pair
    // graph — the step a production dedup pipeline actually ends with
    // (pick one survivor per cluster, not per pair; pairs alone
    // under-merge transitive near-dups A~B~C). Composition of two
    // hard-gated operators, itself gated by a recursive-CTE
    // reachability oracle over the exact all-pairs ground truth.
    "dedup_clusters" -> ((s, dir) => {
      import s.implicits._
      val pairs = graft.functions.Dedup.nearDuplicates(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        threshold = 0.8)
      val edges = pairs
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .as[graft.graph.Edge]
      ConnectedComponents.run(edges).labels.toDF().orderBy("id")
    }),
    // survivor selection: one canonical (max-id) survivor per near-dup
    // cluster, everything unclustered kept — the deduplicated corpus
    // (the anti-join a training-data pipeline actually materializes)
    "dedup_survivors" -> ((s, dir) =>
      survivorDocs(s, dir).select(col("doc_id")).orderBy("doc_id")),
    // the FINAL training corpus: near-dup survivors ∩ quality floor ∩
    // identified language — the three gated stages composed into the
    // one query a data pipeline actually ships
    "corpus_filtered" -> ((s, dir) => {
      val surv = survivorDocs(s, dir)
      // qualityScore is 6dp-rounded by contract, so the filter and the
      // output see the same value (the oracle rounds before comparing too)
      surv
        .withColumn("quality", graft.functions.TextAnalysis.qualityScore(col("text")))
        .withColumn("lang", graft.functions.TextAnalysis.langId(col("text")))
        .filter(col("quality") >= 0.6 && col("lang") =!= "unknown")
        .select(col("doc_id"), col("lang"), col("quality"))
        .orderBy("doc_id")
    }),
    // THE terminal product: what a training run actually reads — near-dup
    // survivors ∩ quality floor ∩ identified language ∩ train split,
    // minus the benchmark docs and every 5-gram-contaminated doc. Every
    // stage is independently gated; this composes them end-to-end.
    "corpus_final" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      // the contamination scan and the survivor pipeline share no
      // dependency until the final anti-join — submit contamination from
      // a second thread so its jobs back-fill executors freed by the
      // near-dup/CC stages' task tails (guide §2.6 overlap; scopedBlocks
      // tracking is thread-local, so the concurrent library calls are
      // safe by design)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      val contamF = Future {
        graft.functions.Corpus.contamination(
            docs, col("doc_id"), col("text"), col("doc_id") % 25 === 0)
          .filter(col("contaminated") === 1L).select(col("doc_id"))
      }
      val surv = survivorDocs(s, dir)
      val contaminatedIds =
        Await.result(contamF, scala.concurrent.duration.Duration.Inf)
      surv
        .withColumn("quality", graft.functions.TextAnalysis.qualityScore(col("text")))
        .withColumn("lang", graft.functions.TextAnalysis.langId(col("text")))
        .filter(col("quality") >= 0.6 && col("lang") =!= "unknown" &&
          graft.functions.Corpus.splitExpr(col("text")) === "train" &&
          col("doc_id") % 25 =!= 0)
        .join(contaminatedIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("quality"))
        .orderBy("doc_id")
    }),
    // ---- corpus management: deterministic split / decontamination ----
    // content-hash train/val/test assignment (pure projection, no shuffle;
    // byte-identical docs always land in the same split)
    "corpus_split" -> ((s, dir) =>
      graft.functions.Corpus.splitAssign(
          s.read.parquet(s"$dir/documents.parquet"), col("doc_id"), col("text"))
        .orderBy("doc_id")),
    // per split × lang document/token budget — the table a pipeline
    // publishes after splitting (partial-agged groupBy, codegen'd counters)
    "split_summary" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      d.select(graft.functions.Corpus.splitExpr(col("text")).as("split"),
          col("lang"),
          graft.functions.TextAnalysis.tokenCount(col("text")).as("nt"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
        .orderBy("split", "lang")
    }),
    // benchmark decontamination: distinct 5-gram overlap of every corpus
    // doc against the benchmark set (doc_id % 25 == 0 stands in for an
    // eval suite). At k=5 chance collisions vanish — only true
    // near-copies of benchmark items flag (the sf0.01 corpus flags
    // exactly its one planted benchmark near-dup).
    "decontaminate" -> ((s, dir) =>
      graft.functions.Corpus.contamination(
          s.read.parquet(s"$dir/documents.parquet"), col("doc_id"),
          col("text"), col("doc_id") % 25 === 0)
        .orderBy("doc_id")),
    // train/test leakage: near-dup pairs (LSH path, threshold 0.8) whose
    // endpoints fall in different splits — gated against the exact
    // all-pairs oracle joined to the split rule
    "split_leakage" -> ((s, dir) =>
      graft.functions.Corpus.crossSplitLeakage(
          s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
          threshold = 0.8)
        .orderBy("id_a", "id_b")),
    // deterministic stratified sample: per-lang k smallest content-sha
    // ranks — content-keyed pseudo-random order, reproducible across
    // engines AND across re-ingests under new ids
    "corpus_sample" -> ((s, dir) =>
      graft.functions.Corpus.stratifiedSample(
          s.read.parquet(s"$dir/documents.parquet"), col("doc_id"), col("text"),
          Seq("lang" -> col("lang")), k = 10)
        .orderBy("lang", "rank")),
    // deterministic sequence packing: concat-then-chunk token bins per
    // (lang, doc_id mod 4) bucket — exact integer offsets/bins, gated
    "corpus_pack" -> ((s, dir) =>
      graft.functions.Corpus.packSequences(
          s.read.parquet(s"$dir/documents.parquet"), col("doc_id"), col("text"),
          col("lang"), budget = 2048L, buckets = 4)
        .orderBy("lang", "bucket", "doc_id")),
    // exact dedup groups (hash-groupBy)
    "dedup_exact_groups" -> ((s, dir) =>
      graft.functions.Dedup.exactGroups(
          s.read.parquet(s"$dir/documents.parquet"), col("doc_id"), col("text"))
        .orderBy("content_sha")),
    // MinHash banded signatures (LSH bucketing layer). The bucket VALUES
    // are xxhash64-derived and DuckDB 1.0 has no xxhash64, so the gated
    // output is the (id, band) skeleton — "the right rows exist", not just
    // "500×16 rows exist"; the bucket values themselves are on hard signal
    // through dedup_near_pairs (whose candidates come from these buckets)
    // plus the planted-dup/bucket-flood property tests.
    "dedup_minhash_bands" -> ((s, dir) =>
      graft.functions.Dedup.bandedSignatures(
          s.read.parquet(s"$dir/documents.parquet"), col("doc_id"), col("text"))
        .select(col("id"), col("band"))
        .orderBy("id", "band")),
    // SimHash signatures (near-dup layer; xxhash64 → rows-only)
    "dedup_simhash" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      d.repartition(s.sessionState.conf.numShufflePartitions)
        .select(col("doc_id"),
          graft.functions.Dedup.simhash(col("text")).as("simhash"))
        .orderBy("doc_id")
    }),
    // exact brute-force cosine top-5 for the 10 lowest vec_ids
    "ann_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      graft.functions.Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") < 10), k = 5)
        .orderBy("query_id", "rank")
    }),
    // full-corpus kNN: top-3 cosine neighbors for EVERY vector (the
    // embedding-clustering / semantic-dedup primitive). Below the exact
    // threshold this is the exact blocked all-pairs path (hash-gated
    // here); the LSH self-join scale path's recall is measured in
    // PipelineSpec.
    "knn_all" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      graft.functions.Similarity.knnAll(emb, k = 3, dim = dim)
        .orderBy("vec_id", "rank")
    }),
    // IVF-PQ search: probe nprobe=2 of nlist=4 coarse cells, ADC-scan
    // their PQ codes (m=4 × k=4 codebooks), exact-rerank the top 32 —
    // the composed ANN index product over the gated kmeans/pq pieces
    "ivf_search" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      graft.functions.Similarity.ivfSearch(emb,
          emb.filter(col("vec_id") < 10), k = 5, dim = dim,
          nlist = kmeansK, nprobe = 2, m = pqM, kSub = kmeansK,
          rerank = ivfRerank, iters = kmeansIters)
        .orderBy("query_id", "rank")
    }),
    // k-means over the embedding corpus (k=4, 4 pinned Lloyd iterations,
    // deterministic init = k lowest vec_ids) — the semantic-clustering
    // primitive; gated on the INTEGER final assignments
    "kmeans_assign" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      graft.functions.Similarity.kMeans(emb, k = kmeansK, dim = dim,
        iters = kmeansIters)
    }),
    // product-quantization codes: m=4 subspaces × k=4 centroids over the
    // 64-dim corpus — the compressed per-vector representation an IVF-PQ
    // index stores; INTEGER codes, same determinism contract as kmeans
    "pq_codes" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      graft.functions.Similarity.pqCodes(emb, m = pqM, k = kmeansK,
          dim = dim, iters = kmeansIters)
        .orderBy("vec_id")
    }),
    // LSH-bucketed ANN (scale path; recall tested in PipelineSpec)
    "ann_topk_lsh" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      graft.functions.Similarity.lshTopK(
          emb, emb.filter(col("vec_id") < 10), k = 5, dim = dim)
        .orderBy("query_id", "rank")
    }),
    // multimodal plumbing: binary payloads + batched feature extraction.
    // A container magic number is planted per row (round-robin by id);
    // the decoder recovers sniffed_kind from the BYTES while the oracle
    // predicts it arithmetically — two independent derivations.
    "media_features" -> ((s, dir) => {
      import s.implicits._
      val magic = element_at(array(
          unhex(lit("89504E470D0A1A0A")), // png
          unhex(lit("FFD8FF")),           // jpeg
          unhex(lit("52494646"))),        // "RIFF"
        (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
      val media = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("media_id"),
          coalesce(col("source"), lit("text")).as("kind"),
          // text coalesced to '' so a NULL row degrades to a magic-only
          // payload on BOTH sides (the oracle predicts sniffed_kind
          // arithmetically and would otherwise diverge on NULLs)
          concat(magic, encode(coalesce(col("text"), lit("")), "utf-8")).as("payload"),
          struct(lit(0).as("width"), lit(0).as("height"),
            lit(0).as("sampleRate"), lit(0L).as("durationMs")).as("meta"))
        .as[graft.sources.Multimodal.MediaRow]
      graft.sources.Multimodal.extractFeatures(media)
        .toDF().select(col("media_id"), col("kind"), col("n_bytes"),
          col("sniffed_kind"))
        .orderBy("media_id")
    })
  )

  /** Documents surviving near-dup clustering (threshold 0.8): drop every
    * non-max member of a near-dup reachability cluster; full document
    * rows of the survivors. Shared by `dedup_survivors` and the
    * composed `corpus_filtered`. */
  private def survivorDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val pairs = graft.functions.Dedup.nearDuplicates(
      docs, "doc_id", "text", threshold = 0.8)
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .as[graft.graph.Edge]
    val labels = ConnectedComponents.run(edges).labels.toDF()
    val losers = labels.filter(col("id") =!= col("label")).select(col("id"))
    // repartition the survivor side: the docs parquet is one split, and
    // the downstream consumers (corpus_filtered/corpus_final) run the
    // regex-heavy quality/lang kernels over these rows — without the
    // spread they execute in a single task (the text_quality rule)
    docs.repartition(s.sessionState.conf.numShufflePartitions)
      .join(losers, docs("doc_id") === losers("id"), "left_anti")
  }

  /** Pinned iteration counts for the oracle-gated iterative queries. */
  private val prIters = 12
  private val lpaIters = 20
  private val eigenIters = 20
  private val hitsIters = 12
  private val katzIters = 12
  private val katzAlpha = 0.05
  private val funnelStages = Seq("view", "click", "purchase")
  /** pinned "now" for the decayed-activity query: 2024-02-01T00:00Z
    * (the synthetic event log starts 2024-01-01) — epoch micros. */
  private val decayAsOfUs = 1706745600000000L
  private val decayHalfLifeDays = 7.0
  private def readEvents(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
  private val centralitySeedK = 8
  private val walkN = 2
  private val walkSteps = 8
  private val walkWindow = 2

  /** The k lowest vertex ids of an edge set — the deterministic seed set
    * for the sampled-centrality queries (bounded collect: k rows). */
  private def lowestVertexIds(edges: org.apache.spark.sql.Dataset[graft.graph.Edge],
                              k: Int): Seq[Long] =
    graft.graph.GraphIO.vertices(edges).orderBy("id").limit(k)
      .collect().toSeq
  private val kmeansK = 4
  private val kmeansIters = 4
  /** substring-dup run length (tokens): 20 ≈ the Lee et al. 2022 range;
    * the sf0.01 corpus yields 24 pairs (non-vacuous, selective). */
  private val substringK = 20
  /** substring-dup per-gram postings cap, passed EXPLICITLY to the
    * engine so it can never drift from the oracle's `QUALIFY ... <= 1000`
    * literal (the frozen SQL text hard-codes 1000 — keep them equal). */
  private val substringMaxPostings = 1000
  /** ivf_search exact-rerank pool size (per query, before top-k). */
  private val ivfRerank = 32
  /** PQ subvector count over the 64-dim corpus (16 dims/subspace). */
  private val pqM = 4
  /** ppr restart set = vertices with id ≤ this (same predicate in the
    * Spark query and the oracle SQL, so S∩V agrees by construction). */
  private val pprSourceMax = 10L
  private val textFixturePath = "/root/repo/src/test/resources/graphs/medium1.txt"

  // Shared SQL fragments for the DuckDB oracle (same parquet tables).
  private val supplierEdgesSql =
    """SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey""".stripMargin

  private val nationEdgesSql =
    """SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      |FROM lineitem a
      |JOIN supplier sa ON a.l_suppkey = sa.s_suppkey
      |JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |JOIN supplier sb ON b.l_suppkey = sb.s_suppkey
      |WHERE sa.s_nationkey = sb.s_nationkey AND a.l_suppkey < b.l_suppkey""".stripMargin

  /** Directed customer→supplier order edges (mirrors
    * `EdgeDerivation.customerSupplierDirected`). */
  private val custSuppDirectedSql =
    """SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey""".stripMargin

  /** Purchase co-activity edges in 10-min tumbling buckets (mirrors
    * `Temporal.coactivityEdges`; `//` = DuckDB integral division, the
    * exact twin of Spark's `div`). The engine's 1000-user hot-bucket
    * cap is inactive at oracle scale (≤ a handful of users/bucket). */
  // Both co-activity oracles replicate the engine's hot-bucket cap
  // (maxGroupSize = 1000) via QUALIFY, each with its own deterministic
  // keep-rule: the undirected variant keeps the SMALLEST user_ids
  // (sorted collect_set), the directed one the EARLIEST
  // (first_us, user_id) arrivals — so the gates stay exact even on a
  // fixture with a bucket past the cap.
  private val coactivityEdgesSql =
    """SELECT DISTINCT a.user_id AS src, b.user_id AS dst
      |FROM (SELECT b, user_id FROM
      |        (SELECT DISTINCT epoch_us(ts) // 600000000 AS b, user_id
      |         FROM events WHERE event_type = 'purchase')
      |      QUALIFY row_number() OVER (PARTITION BY b ORDER BY user_id) <= 1000) a
      |JOIN (SELECT b, user_id FROM
      |        (SELECT DISTINCT epoch_us(ts) // 600000000 AS b, user_id
      |         FROM events WHERE event_type = 'purchase')
      |      QUALIFY row_number() OVER (PARTITION BY b ORDER BY user_id) <= 1000) b
      |  ON a.b = b.b AND a.user_id < b.user_id""".stripMargin

  /** Directed version (mirrors `Temporal.coactivityDirectedEdges`):
    * earlier first-purchase → later within a bucket, ties by user_id.
    * The strict inequalities exclude self-loops by construction. */
  private val coactivityDirectedEdgesSql =
    """SELECT DISTINCT a.user_id AS src, c.user_id AS dst
      |FROM (SELECT b, user_id, first_us FROM
      |        (SELECT epoch_us(ts) // 600000000 AS b, user_id,
      |                min(epoch_us(ts)) AS first_us
      |         FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |      QUALIFY row_number() OVER (PARTITION BY b ORDER BY first_us, user_id) <= 1000) a
      |JOIN (SELECT b, user_id, first_us FROM
      |        (SELECT epoch_us(ts) // 600000000 AS b, user_id,
      |                min(epoch_us(ts)) AS first_us
      |         FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |      QUALIFY row_number() OVER (PARTITION BY b ORDER BY first_us, user_id) <= 1000) c
      |  ON a.b = c.b AND (a.first_us < c.first_us OR
      |     (a.first_us = c.first_us AND a.user_id < c.user_id))""".stripMargin

  /** Weighted same-nation co-occurrence edges: weight = distinct shared
    * orders (mirrors `EdgeDerivation.supplierCooccurrenceWeightedByNation`). */
  private val nationEdgesWeightedSql =
    """SELECT a.s AS src, b.s AS dst, CAST(count(*) AS BIGINT) AS weight
      |FROM (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s, s_nationkey AS nk
      |      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey) a
      |JOIN (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s, s_nationkey AS nk
      |      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey) b
      |  ON a.o = b.o AND a.nk = b.nk AND a.s < b.s
      |GROUP BY a.s, b.s""".stripMargin

  /** Shared oracle fragment: 3-shingle sets per document (CTE `t`) —
    * the exact ground-truth tokenization the near-dup gate family
    * (dedup_near_pairs / dedup_clusters / dedup_survivors /
    * corpus_filtered) compares against. One copy so the four oracles
    * cannot drift from each other. */
  private val shingleCteSql =
    """t AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_distinct(CASE
      |      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |      ELSE list_transform(generate_series(1, len(tk) - 2),
      |             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END) AS sh
      |  FROM (SELECT doc_id,
      |          CASE WHEN length(trim(text)) = 0 THEN []
      |               ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
      |        FROM documents))""".stripMargin

  /** Shared oracle fragment: exact near-dup PAIRS at threshold 0.8
    * (CTEs `t` → `post` → `pairs`) — the ground truth the LSH candidate
    * path is gated against. Reused standalone by `split_leakage`.
    * Exactness: `sh` lists are distinct, so |A∪B| = |A|+|B|−|A∩B| and
    * the postings self-join enumerates every pair sharing ≥1 shingle —
    * a superset of every pair with Jaccard > 0 (`sh` is never empty:
    * blank docs shingle to ['']), with the same integer inputs and the
    * same double division as the old all-pairs form, just without the
    * O(n²) list_intersect scan (the round-5 oracle-suite DoS). */
  private val nearPairsCteSql =
    s"""$shingleCteSql,
       |post AS MATERIALIZED (SELECT doc_id, unnest(sh) AS g FROM t),
       |lens AS MATERIALIZED (SELECT doc_id, len(sh) AS n FROM t),
       |pairs AS MATERIALIZED (
       |  SELECT id_a, id_b FROM (
       |    SELECT p.doc_id AS id_a, q.doc_id AS id_b, count(*) AS i
       |    FROM post p JOIN post q ON p.g = q.g AND p.doc_id < q.doc_id
       |    GROUP BY p.doc_id, q.doc_id) c
       |  JOIN lens la ON c.id_a = la.doc_id
       |  JOIN lens lb ON c.id_b = lb.doc_id
       |  WHERE round(CAST(i AS DOUBLE) / (la.n + lb.n - i), 6) >= 0.8)""".stripMargin

  /** Shared oracle fragment: the deterministic content-hash split rule
    * (first sha256 nibble: 0-b train, c-d val, e-f test) — one copy so
    * the three split oracles cannot drift. Expects `text` in scope. */
  private val splitCaseSql =
    """CASE WHEN substr(sha256(text),1,1) IN ('c','d') THEN 'val'
      |     WHEN substr(sha256(text),1,1) IN ('e','f') THEN 'test'
      |     ELSE 'train' END""".stripMargin

  /** Shared oracle fragment: exact all-pairs near-dup clusters at
    * threshold 0.8 (CTEs `t` → `pairs` → `bidir` → `reach` → `clusters`,
    * canonical max-id labels — the engine's CC semantics). Needs
    * `WITH RECURSIVE`. */
  /** Shared oracle fragment: the distinct 5-token grams of a token-list
    * column `tk` (short docs → the whole text as one gram) — the single
    * source of the contamination gram rule, used by the `decontaminate`
    * and `corpus_final` oracles so the rule cannot drift between gates
    * (it mirrors `Corpus.contamination`'s k=5 shingle pipeline). */
  private val fiveGramListSql =
    raw"""list_distinct(CASE WHEN len(tk) < 5
      |    THEN [array_to_string(tk, ' ')]
      |    ELSE list_transform(generate_series(1, len(tk) - 4),
      |      i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]) END)""".stripMargin

  /** Shared oracle fragment: the 6-dp quality score (`q`) and language
    * id (`l`) CTEs over `documents`, mirroring
    * `TextAnalysis.qualityScore`/`langId` — used by corpus_filtered and
    * corpus_final so the two gates cannot drift. Also exposes `qt`
    * (doc_id, text, whitespace tokens) for downstream gram CTEs. */
  private val qualityLangCteSql =
    raw"""qt AS (
      |  SELECT doc_id, text,
      |    CASE WHEN length(trim(text)) = 0 THEN []
      |         ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
      |  FROM documents),
      |qm AS (
      |  SELECT doc_id,
      |    greatest(CAST(length(text) AS DOUBLE), 1.0) AS n,
      |    CAST(length(text) AS DOUBLE) AS len,
      |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS np,
      |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS nd,
      |    CASE WHEN len(tk) > 0
      |         THEN CAST(list_sum(list_transform(tk, w -> length(w))) AS DOUBLE) / len(tk)
      |         ELSE 0.0 END AS mtl
      |  FROM qt),
      |q AS (
      |  SELECT doc_id,
      |    least(len/200.0, 1.0) * 0.4 +
      |    (CASE WHEN mtl BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.2 +
      |    (CASE WHEN np/n < 0.1 THEN 1.0 ELSE 0.5 END) * 0.2 +
      |    (CASE WHEN nd/n < 0.2 THEN 1.0 ELSE 0.5 END) * 0.2 AS quality_raw
      |  FROM qm),
      |ltoks AS (
      |  SELECT doc_id,
      |    list_transform(CASE WHEN length(trim(text))=0 THEN []
      |      ELSE regexp_split_to_array(trim(text),'\s+') END, s -> lower(s)) AS ltk,
      |    length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk
      |  FROM documents),
      |lscores AS (
      |  SELECT doc_id, cjk,
      |    len(list_filter(ltk, s -> list_contains(['the','and','of','to','is','in','that','with'], s))) AS s_en,
      |    len(list_filter(ltk, s -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], s))) AS s_de,
      |    len(list_filter(ltk, s -> list_contains(['le','la','les','et','est','dans','que','une'], s))) AS s_fr,
      |    len(list_filter(ltk, s -> list_contains(['el','los','las','es','en','que','una','por'], s))) AS s_es
      |  FROM ltoks),
      |l AS (
      |  SELECT doc_id, CASE WHEN cjk > 2 THEN 'zh'
      |    WHEN greatest(s_en,s_de,s_fr,s_es) = 0 THEN 'unknown'
      |    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
      |    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
      |    WHEN s_fr >= s_es THEN 'fr'
      |    ELSE 'es' END AS lang
      |  FROM lscores)""".stripMargin

  private val dedupClustersCteSql =
    s"""$nearPairsCteSql,
       |bidir AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |reach AS (
       |  SELECT src AS id, src AS lbl FROM bidir
       |  UNION
       |  SELECT r.id, b.dst AS lbl FROM reach r JOIN bidir b ON r.lbl = b.src
       |),
       |clusters AS (SELECT id, CAST(max(lbl) AS BIGINT) AS label
       |             FROM reach GROUP BY id)""".stripMargin

  /** Reachability-closure CC over an edge CTE named `e` (canonical src<dst):
    * label(v) = max id reachable from v = component max — the exact
    * canonical semantics of the engine (SURVEY.md §3.5). */
  private def ccOracleSql(edgesSql: String): String =
    s"""WITH RECURSIVE e AS MATERIALIZED ($edgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
       |reach AS (
       |  SELECT src AS id, src AS lbl FROM bidir
       |  UNION
       |  SELECT r.id, b.dst AS lbl FROM reach r JOIN bidir b ON r.lbl = b.src
       |)
       |SELECT id, CAST(max(lbl) AS BIGINT) AS label
       |FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** Fixed-iteration PageRank as an unrolled chain of CTEs (aggregates
    * are not allowed in a recursive CTE term), mirroring the engine's
    * update rule exactly: rank_{t+1}(v) = (1-d)/n + d·Σ_{u→v}
    * rank_t(u)/outdeg(u); no dangling vertices exist in a co-occurrence
    * graph. `CAST(1.0 AS DOUBLE)` forces double arithmetic (DuckDB
    * decimal literals would otherwise compute 1-d exactly, diverging
    * from IEEE at the 1e-17 level — harmless under the 7 dp round, but
    * matching exactly costs nothing). */
  /** Shared unrolled power-iteration steps over CTEs `w` (src, dst, w),
    * `v` (id) and `nn` (n) — used by the uniform, weighted and (with a
    * different base term) personalized PageRank oracles. */
  private def prStepsSql(iters: Int, d: Double): String =
    (1 to iters).map { t =>
      s"""r$t AS (SELECT v.id,
         |  (CAST(1.0 AS DOUBLE) - $d) * (CAST(1.0 AS DOUBLE)/(SELECT n FROM nn)) + $d * coalesce(s.c, CAST(0.0 AS DOUBLE)) AS rank
         |  FROM v LEFT JOIN (
         |    SELECT w.dst AS id, sum(w.w * r.rank) AS c
         |    FROM w JOIN r${t - 1} r ON w.src = r.id GROUP BY w.dst) s USING (id))"""
        .stripMargin
    }.mkString(",\n")

  private def pagerankOracleSql(edgesSql: String, iters: Int, d: Double): String =
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
       |deg AS (SELECT src, count(*) AS od FROM bidir GROUP BY src),
       |w AS (SELECT b.src, b.dst, CAST(1.0 AS DOUBLE)/d.od AS w
       |      FROM bidir b JOIN deg d USING (src)),
       |v AS (SELECT DISTINCT src AS id FROM bidir),
       |nn AS (SELECT count(*) AS n FROM v),
       |r0 AS (SELECT id, CAST(1.0 AS DOUBLE)/(SELECT n FROM nn) AS rank FROM v),
       |${prStepsSql(iters, d)}
       |SELECT id, round(rank, 7) AS rank FROM r$iters ORDER BY id""".stripMargin

  /** Weighted PageRank oracle: transition w = weight/strength over the
    * weighted edge CTE `ew` (src, dst, weight). */
  private def pagerankWeightedOracleSql(weightedEdgesSql: String, iters: Int, d: Double): String =
    s"""WITH ew AS MATERIALIZED ($weightedEdgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst, weight FROM ew
       |          UNION ALL SELECT dst AS src, src AS dst, weight FROM ew),
       |st AS (SELECT src, sum(weight) AS st FROM bidir GROUP BY src),
       |w AS (SELECT b.src, b.dst,
       |        CAST(b.weight AS DOUBLE)/CAST(s.st AS DOUBLE) AS w
       |      FROM bidir b JOIN st s USING (src)),
       |v AS (SELECT DISTINCT src AS id FROM bidir),
       |nn AS (SELECT count(*) AS n FROM v),
       |r0 AS (SELECT id, CAST(1.0 AS DOUBLE)/(SELECT n FROM nn) AS rank FROM v),
       |${prStepsSql(iters, d)}
       |SELECT id, round(rank, 7) AS rank FROM r$iters ORDER BY id""".stripMargin

  /** Personalized PageRank (restart uniform over sources `id <= srcMax`,
    * dangling mass → sources): same unrolled-CTE shape as
    * [[pagerankOracleSql]] with a per-vertex restart weight `rw`. The
    * nation co-occurrence graph has no dangling vertices, so the
    * engine's `danglingMass·rw` term is exactly 0.0 and the oracle
    * omits it. */
  private def pprOracleSql(edgesSql: String, iters: Int, d: Double, srcMax: Long): String = {
    val steps = (1 to iters).map { t =>
      s"""r$t AS (SELECT v.id,
         |  (CAST(1.0 AS DOUBLE) - $d) * rw.rw + $d * coalesce(s.c, CAST(0.0 AS DOUBLE)) AS rank
         |  FROM v JOIN rw USING (id) LEFT JOIN (
         |    SELECT w.dst AS id, sum(w.w * r.rank) AS c
         |    FROM w JOIN r${t - 1} r ON w.src = r.id GROUP BY w.dst) s USING (id))"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
       |deg AS (SELECT src, count(*) AS od FROM bidir GROUP BY src),
       |w AS (SELECT b.src, b.dst, CAST(1.0 AS DOUBLE)/d.od AS w
       |      FROM bidir b JOIN deg d USING (src)),
       |v AS (SELECT DISTINCT src AS id FROM bidir),
       |ns AS (SELECT count(*) AS n FROM v WHERE id <= $srcMax),
       |rw AS (SELECT id, CASE WHEN id <= $srcMax
       |         THEN CAST(1.0 AS DOUBLE)/(SELECT n FROM ns)
       |         ELSE CAST(0.0 AS DOUBLE) END AS rw FROM v),
       |r0 AS (SELECT id, rw AS rank FROM rw),
       |$steps
       |SELECT id, round(rank, 7) AS rank FROM r$iters ORDER BY id""".stripMargin
  }

  /** k-means as an unrolled chain of CTEs mirroring
    * `Similarity.kMeans` exactly: init = embeddings of the k smallest
    * vec_ids, squared-L2 assignment with ties to the smaller cluster,
    * per-(cluster, dim) mean update (empty clusters keep the previous
    * centroid), `iters` pinned, final INTEGER assignments as output.
    * Float note: both engines sum doubles in different orders (~1e-13
    * relative); the gated assignments only depend on argmin, which is
    * robust at real inter-centroid distances. MATERIALIZED like the
    * other unrolled oracles (each step is referenced multiple times). */
  private def kMeansOracleSql(k: Int, iters: Int,
                              embExpr: String = "embedding"): String =
    s"""WITH ${kMeansCtesSql("", k, iters, embExpr)}
       |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster
       |FROM afinal ORDER BY vec_id""".stripMargin

  /** The k-means CTE chain with every CTE name prefixed by `pfx`, so
    * several independent clusterings (the IVF coarse quantizer + the m
    * PQ subspaces) can compose inside ONE `WITH` for the ivf_search
    * oracle. Exposes `${pfx}afinal` (assignments) and `${pfx}c$iters`
    * (the FINAL centroids the assignment was computed with). */
  private def kMeansCtesSql(pfx: String, k: Int, iters: Int,
                            embExpr: String = "embedding"): String = {
    def assignSql(cent: String, out: String) =
      s"""$out AS MATERIALIZED (
         |  SELECT vec_id, e, cluster FROM (
         |    SELECT m.vec_id, m.e, c.cluster,
         |      row_number() OVER (PARTITION BY m.vec_id ORDER BY
         |        list_sum(list_transform(list_zip(m.e, c.cent),
         |          p -> (p[1]-p[2])*(p[1]-p[2]))) ASC, c.cluster ASC) AS rn
         |    FROM ${pfx}emb m CROSS JOIN $cent c) WHERE rn = 1)""".stripMargin
    val steps = (1 to iters).map { t =>
      s"""${assignSql(s"${pfx}c${t - 1}", s"${pfx}a$t")},
         |${pfx}c$t AS MATERIALIZED (
         |  SELECT p.cluster, coalesce(n.cent, p.cent) AS cent
         |  FROM ${pfx}c${t - 1} p LEFT JOIN (
         |    SELECT cluster, list(m ORDER BY dim) AS cent FROM (
         |      SELECT cluster, i AS dim, avg(e[i]) AS m
         |      FROM ${pfx}a$t CROSS JOIN ${pfx}dims GROUP BY cluster, i)
         |    GROUP BY cluster) n USING (cluster))""".stripMargin
    }.mkString(",\n")
    s"""${pfx}emb AS MATERIALIZED (
       |  SELECT vec_id, list_transform($embExpr, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |${pfx}dims AS MATERIALIZED (
       |  SELECT unnest(range(1, (SELECT len(e) + 1 FROM ${pfx}emb LIMIT 1))) AS i),
       |${pfx}c0 AS MATERIALIZED (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, e AS cent
       |  FROM ${pfx}emb ORDER BY vec_id LIMIT $k),
       |$steps,
       |${assignSql(s"${pfx}c$iters", s"${pfx}afinal")}""".stripMargin
  }

  /** k-truss by unrolled support-peeling: per step, per-edge triangle
    * support = common-neighbor count via a bidir 3-way join; keep edges
    * with support ≥ k−2. MATERIALIZED for the same reason as the k-core
    * oracle (each step references the previous CTE three times — plain
    * CTE inlining explodes exponentially in the unroll depth), and the
    * final SELECT asserts convergence loudly via error(). */
  private def kTrussOracleSql(edgesSql: String, k: Int, iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""b$t AS MATERIALIZED (SELECT src, dst FROM e${t - 1}
         |        UNION ALL SELECT dst, src FROM e${t - 1}),
         |s$t AS MATERIALIZED (
         |  SELECT e.src, e.dst, count(*) AS sup
         |  FROM e${t - 1} e JOIN b$t n1 ON n1.src = e.src
         |                   JOIN b$t n2 ON n2.src = e.dst AND n2.dst = n1.dst
         |  GROUP BY e.src, e.dst),
         |e$t AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM e${t - 1} e
         |  JOIN s$t s ON e.src = s.src AND e.dst = s.dst
         |  WHERE s.sup >= ${k - 2})""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED ($edgesSql),
       |$steps
       |SELECT src, dst FROM e$iters
       |WHERE CASE WHEN (SELECT count(*) FROM e${iters - 1}) <>
       |                (SELECT count(*) FROM e$iters)
       |      THEN error('ktruss oracle under-peeled at $iters steps: raise iters')
       |      ELSE true END
       |ORDER BY src, dst""".stripMargin
  }

  /** k-core by unrolled peeling (like the LPA/PageRank oracles, the
    * fixed-point loop is unrolled because recursive CTE terms cannot
    * aggregate): `iters` must be ≥ the peel depth — extra iterations are
    * fixpoint no-ops, so equality is exact once converged. */
  private def kCoreOracleSql(edgesSql: String, k: Int, iters: Int): String = {
    // MATERIALIZED is load-bearing: each step references the previous CTE
    // three times, and DuckDB inlines plain CTEs — the expansion (and the
    // parquet open count) grows exponentially in `iters` without it
    // (observed as "Too many open files" at 25 steps).
    val steps = (1 to iters).map { t =>
      s"""d$t AS MATERIALIZED (SELECT id, count(*) AS dg FROM (
         |  SELECT src AS id FROM e${t - 1} UNION ALL SELECT dst AS id FROM e${t - 1})
         |  GROUP BY id),
         |v$t AS MATERIALIZED (SELECT id FROM d$t WHERE dg >= $k),
         |e$t AS MATERIALIZED (SELECT src, dst FROM e${t - 1}
         |        WHERE src IN (SELECT id FROM v$t)
         |          AND dst IN (SELECT id FROM v$t))""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED ($edgesSql),
       |$steps
       |SELECT id FROM (SELECT src AS id FROM e$iters
       |                UNION SELECT dst AS id FROM e$iters) x
       |WHERE CASE WHEN (SELECT count(*) FROM e${iters - 1}) <>
       |                (SELECT count(*) FROM e$iters)
       |      THEN error('kcore oracle under-peeled at $iters steps: raise iters')
       |      ELSE true END
       |ORDER BY id""".stripMargin
  }

  /** The unrolled synchronous-LPA step chain `l1..l$iters` (most
    * frequent neighbor label, ties → smallest; expects `bidir` and `l0`
    * in scope) — ONE copy shared by the lpa / modularity /
    * community_conductance oracles so the three cannot drift. */
  private def lpaStepsSql(iters: Int): String =
    (1 to iters).map { t =>
      s"""l$t AS MATERIALIZED (SELECT id, nl AS label FROM (
         |  SELECT b.dst AS id, l.label AS nl,
         |    row_number() OVER (PARTITION BY b.dst
         |                       ORDER BY count(*) DESC, l.label ASC) AS rn
         |  FROM bidir b JOIN l${t - 1} l ON b.src = l.id
         |  GROUP BY b.dst, l.label) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  /** Fixed-iteration synchronous LPA (most frequent neighbor label, ties
    * → smallest) as an unrolled chain of CTEs — integer state, exact. */
  private def lpaOracleSql(edgesSql: String, iters: Int): String = {
    val steps = lpaStepsSql(iters)
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
       |v AS (SELECT DISTINCT src AS id FROM bidir),
       |l0 AS (SELECT id, id AS label FROM v),
       |$steps
       |SELECT id, label FROM l$iters ORDER BY id""".stripMargin
  }

  /** Weighted LPA oracle: unrolled CTE chain with weighted votes
    * (row_number over sum(weight) DESC, label ASC). */
  private def lpaWeightedOracleSql(weightedEdgesSql: String, iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""l$t AS MATERIALIZED (SELECT id, nl AS label FROM (
         |  SELECT b.dst AS id, l.label AS nl,
         |    row_number() OVER (PARTITION BY b.dst
         |                       ORDER BY sum(b.weight) DESC, l.label ASC) AS rn
         |  FROM bidir b JOIN l${t - 1} l ON b.src = l.id
         |  GROUP BY b.dst, l.label) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ew AS MATERIALIZED ($weightedEdgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst, weight FROM ew
       |          UNION ALL SELECT dst AS src, src AS dst, weight FROM ew),
       |v AS (SELECT DISTINCT src AS id FROM bidir),
       |l0 AS (SELECT id, id AS label FROM v),
       |$steps
       |SELECT id, label FROM l$iters ORDER BY id""".stripMargin
  }

  /** Modularity of the `iters`-step LPA partition: the exact lpa CTE
    * chain, then Q = Σ_c [m_c/m − (D_c/2m)·(D_c/2m)] — the squared term
    * written as a product of the SAME quotient the engine computes, so
    * the doubles agree bit-for-bit before the 6 dp round. */
  private def modularityOracleSql(edgesSql: String, iters: Int): String = {
    val steps = lpaStepsSql(iters)
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
       |v AS (SELECT DISTINCT src AS id FROM bidir),
       |l0 AS (SELECT id, id AS label FROM v),
       |$steps,
       |-- MATERIALIZED is load-bearing: lab is referenced three times
       |-- below, and DuckDB inlines plain CTEs — the 20-step chain above
       |-- would be re-expanded per reference (exponential; the round-3
       |-- kcore lesson)
       |lab AS MATERIALIZED (SELECT id, label FROM l$iters),
       |mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM e),
       |within AS (
       |  SELECT la.label AS c, count(*) AS mc
       |  FROM e JOIN lab la ON e.src = la.id
       |         JOIN lab lb ON e.dst = lb.id AND la.label = lb.label
       |  GROUP BY la.label),
       |deg AS (SELECT src AS id, count(*) AS dg FROM bidir GROUP BY src),
       |dc AS (SELECT l.label AS c, CAST(sum(d.dg) AS DOUBLE) AS dcv
       |       FROM lab l JOIN deg d ON l.id = d.id GROUP BY l.label)
       |SELECT coalesce(round(sum(
       |    CAST(coalesce(w.mc, 0) AS DOUBLE) / (SELECT m FROM mm) -
       |    (dc.dcv / (CAST(2.0 AS DOUBLE) * (SELECT m FROM mm))) *
       |    (dc.dcv / (CAST(2.0 AS DOUBLE) * (SELECT m FROM mm)))), 6),
       |  CAST(0.0 AS DOUBLE)) AS modularity
       |FROM dc LEFT JOIN within w ON dc.c = w.c""".stripMargin
  }

  /** Seeded-LPA oracle: unrolled synchronous majority-vote steps where
    * only LABELED neighbors vote, seeds (k lowest ids, label = id % 2)
    * never change, and unlabeled vertices without labeled neighbors
    * stay NULL until reached; the output keeps labeled vertices only
    * (no NULLs cross the gate). Every l$t is referenced twice (votes +
    * carry) → MATERIALIZED. */
  private def lpaSeededOracleSql(edgesSql: String, k: Int, iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""b$t AS (SELECT id, nl FROM (
         |  SELECT b.dst AS id, l.label AS nl,
         |    row_number() OVER (PARTITION BY b.dst
         |                       ORDER BY count(*) DESC, l.label ASC) AS rn
         |  FROM bidir b JOIN l${t - 1} l ON b.src = l.id AND l.label IS NOT NULL
         |  GROUP BY b.dst, l.label) WHERE rn = 1),
         |l$t AS MATERIALIZED (
         |  SELECT l.id,
         |    CASE WHEN l.seed THEN l.label ELSE coalesce(b.nl, l.label) END AS label,
         |    l.seed
         |  FROM l${t - 1} l LEFT JOIN b$t b USING (id))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
       |v AS (SELECT DISTINCT src AS id FROM bidir),
       |seeds AS (SELECT id, id % 2 AS label FROM v ORDER BY id LIMIT $k),
       |l0 AS MATERIALIZED (
       |  SELECT v.id, s.label, s.label IS NOT NULL AS seed
       |  FROM v LEFT JOIN seeds s USING (id)),
       |$steps
       |SELECT id, CAST(label AS BIGINT) AS label FROM l$iters
       |WHERE label IS NOT NULL ORDER BY id""".stripMargin
  }

  /** Per-community conductance of the `iters`-step LPA partition: the
    * shared lpa CTE chain, then per community C (via one UNION ALL of
    * both edge endpoints, like the engine's explode): vol = row count,
    * cut = cross-community rows, φ = cut / min(vol, 2m − vol) (0 when
    * the denominator is 0). Integers until the one final division. */
  private def conductanceOracleSql(edgesSql: String, iters: Int): String = {
    val steps = lpaStepsSql(iters)
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
       |v AS (SELECT DISTINCT src AS id FROM bidir),
       |l0 AS (SELECT id, id AS label FROM v),
       |$steps,
       |lab AS MATERIALIZED (SELECT id, label FROM l$iters),
       |mm AS (SELECT count(*) AS m FROM e),
       |ann AS MATERIALIZED (
       |  SELECT la.label AS ls, lb.label AS ld
       |  FROM e JOIN lab la ON e.src = la.id
       |         JOIN lab lb ON e.dst = lb.id),
       |ends AS (
       |  SELECT ls AS c, CASE WHEN ls <> ld THEN 1 ELSE 0 END AS cut FROM ann
       |  UNION ALL
       |  SELECT ld AS c, CASE WHEN ls <> ld THEN 1 ELSE 0 END AS cut FROM ann),
       |agg AS (SELECT c AS label, CAST(count(*) AS BIGINT) AS vol,
       |               CAST(sum(cut) AS BIGINT) AS cut
       |        FROM ends GROUP BY c)
       |SELECT label, vol, cut,
       |  CASE WHEN least(vol, 2 * (SELECT m FROM mm) - vol) = 0
       |       THEN CAST(0.0 AS DOUBLE)
       |       ELSE round(CAST(cut AS DOUBLE) /
       |            CAST(least(vol, 2 * (SELECT m FROM mm) - vol) AS DOUBLE), 6)
       |  END AS conductance
       |FROM agg ORDER BY label""".stripMargin
  }

  /** Full core decomposition by h-index iteration, unrolled `iters`
    * steps (MATERIALIZED per the kcore lesson — each step is referenced
    * twice), mirroring the engine's histogram form exactly: s0 = degree;
    * s_{t+1}(v) = max over present neighbor values c of
    * min(c, #neighbors with value ≥ c). The final projection carries an
    * `error()` two-step-agreement guard (values only decrease, so equal
    * consecutive sums ⟺ fixpoint = coreness). */
  private def corenessOracleSql(edgesSql: String, iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""n$t AS MATERIALIZED (
         |  SELECT b.src AS v, s.c AS c, count(*) AS n
         |  FROM bidir b JOIN s${t - 1} s ON b.dst = s.id GROUP BY 1, 2),
         |s$t AS MATERIALIZED (
         |  SELECT v AS id, CAST(max(least(c, cum)) AS BIGINT) AS c FROM (
         |    SELECT v, c, sum(n) OVER (PARTITION BY v ORDER BY c DESC) AS cum
         |    FROM n$t)
         |  GROUP BY v)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |bidir AS MATERIALIZED (
       |  SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
       |s0 AS MATERIALIZED (
       |  SELECT src AS id, CAST(count(*) AS BIGINT) AS c FROM bidir GROUP BY src),
       |$steps
       |SELECT id, c AS coreness FROM s$iters
       |WHERE CASE WHEN (SELECT sum(c) FROM s${iters - 1}) <>
       |                (SELECT sum(c) FROM s$iters)
       |      THEN error('coreness oracle not converged at $iters steps: raise iters')
       |      ELSE true END
       |ORDER BY id""".stripMargin
  }

  /** Shared multi-source-BFS CTE prefix for the sampled-centrality
    * oracles: `dist(source, id, d)` = hop distance from each of the `k`
    * lowest vertex ids (the engine's seed rule) to every reachable
    * vertex. Same recursive-walk shape as the bfs_hops oracle. */
  private def multiSourceBfsCte(edgesSql: String, k: Int): String =
    s"""WITH RECURSIVE e AS MATERIALIZED ($edgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
       |seeds AS (SELECT id FROM (SELECT DISTINCT src AS id FROM bidir)
       |          ORDER BY id LIMIT $k),
       |walk AS (
       |  SELECT id AS source, id, 0 AS d FROM seeds
       |  UNION
       |  SELECT w.source, b.dst, w.d + 1
       |  FROM walk w JOIN bidir b ON w.id = b.src WHERE w.d < 64),
       |dist AS (SELECT source, id, min(d) AS d FROM walk GROUP BY source, id)""".stripMargin

  /** Eigenvector centrality: the engine's exact arithmetic unrolled —
    * each step divides per TERM by the previous max (so the SQL mirrors
    * `sum(v / m)` bit-for-bit), max is order-independent, and only the
    * final output rounds. MATERIALIZED on every step: x_t is referenced
    * twice (next step + its max) and DuckDB inlines plain CTEs
    * exponentially (the round-3 kcore lesson). */
  private def eigenvectorOracleSql(edgesSql: String, iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""x$t AS MATERIALIZED (
         |  SELECT b.dst AS id, sum(x.v / (SELECT m FROM m${t - 1})) AS v
         |  FROM bidir b JOIN x${t - 1} x ON b.src = x.id GROUP BY b.dst),
         |m$t AS MATERIALIZED (SELECT max(v) AS m FROM x$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
       |x0 AS MATERIALIZED (SELECT DISTINCT src AS id, CAST(1.0 AS DOUBLE) AS v FROM bidir),
       |m0 AS (SELECT CAST(1.0 AS DOUBLE) AS m),
       |$steps
       |SELECT id, round(v / (SELECT m FROM m$iters), 6) AS score
       |FROM x$iters ORDER BY id""".stripMargin
  }

  /** Text-fixture edge list as SQL (the sparse graph the fixture-bound
    * oracles share — fof_recs inlines the same read). */
  private val fixtureEdgesSql =
    s"""SELECT DISTINCT least(a, b) AS src, greatest(a, b) AS dst
       |FROM (SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
       |      FROM read_csv('$textFixturePath', sep=' ',
       |                    names=['a','b'], skip=1, header=false))
       |WHERE a <> b""".stripMargin

  /** Brandes betweenness oracle, the engine's two passes unrolled: σ by
    * level (exact BIGINTs — sig_t joins the previous level to the dag
    * via dist = t), then δ backward with the engine's per-term
    * arithmetic `CAST(σv AS DOUBLE)/σw · (1 + δw)`; only the final
    * per-vertex sum rounds. Every step CTE is referenced twice →
    * MATERIALIZED; `chk` errors loudly if the unroll is shallower than
    * the real BFS depth (kcore error() precedent). */
  private def betweennessOracleSql(edgesSql: String, k: Int, maxT: Int): String = {
    val sigs = (1 to maxT).map { t =>
      s"""sig$t AS MATERIALIZED (
         |  SELECT s.source, b.dst AS id, CAST(sum(s.sigma) AS BIGINT) AS sigma
         |  FROM sig${t - 1} s JOIN bidir b ON s.id = b.src
         |  JOIN dist d ON d.source = s.source AND d.id = b.dst AND d.d = $t
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val dels = (maxT - 1 to 0 by -1).map { t =>
      s"""del$t AS MATERIALIZED (
         |  SELECT v.source, v.id, v.sigma,
         |    coalesce(sum(CAST(v.sigma AS DOUBLE) / CAST(x.sigma AS DOUBLE)
         |      * (CAST(1.0 AS DOUBLE) + x.delta)), CAST(0.0 AS DOUBLE)) AS delta
         |  FROM sig$t v LEFT JOIN (
         |    SELECT b.src AS vid, w.source AS wsource, w.sigma, w.delta
         |    FROM bidir b JOIN del${t + 1} w ON b.dst = w.id) x
         |    ON x.vid = v.id AND x.wsource = v.source
         |  GROUP BY 1, 2, 3)""".stripMargin
    }.mkString(",\n")
    val bcUnion = (1 to maxT)
      .map(t => s"SELECT id, delta FROM del$t").mkString(" UNION ALL ")
    s"""${multiSourceBfsCte(edgesSql, k)},
       |chk AS (SELECT CASE WHEN (SELECT max(d) FROM dist) > $maxT
       |  THEN error('betweenness oracle: unroll too shallow') ELSE 1 END AS ok),
       |sig0 AS MATERIALIZED (
       |  SELECT id AS source, id, CAST(1 AS BIGINT) AS sigma FROM seeds),
       |$sigs,
       |del$maxT AS MATERIALIZED (
       |  SELECT source, id, sigma, CAST(0.0 AS DOUBLE) AS delta FROM sig$maxT),
       |$dels
       |SELECT v.id, round(coalesce(d.b, CAST(0.0 AS DOUBLE)), 6) AS betweenness
       |FROM (SELECT DISTINCT src AS id FROM bidir) v
       |LEFT JOIN (SELECT id, sum(delta) AS b FROM ($bcUnion) GROUP BY id) d
       |  USING (id)
       |CROSS JOIN chk
       |ORDER BY v.id""".stripMargin
  }

  /** Weighted-SSSP oracle: Bellman–Ford relaxations unrolled (exact
    * BIGINT arithmetic — no float anywhere), with an error() guard that
    * the last two rounds agree (rows only appear and distances only
    * decrease, so equality ⟺ fixpoint — the engine's own convergence
    * rule). Every round references its predecessor twice →
    * MATERIALIZED. */
  private def ssspOracleSql(weightedEdgesSql: String, k: Int, maxT: Int): String = {
    val steps = (1 to maxT).map { t =>
      s"""d$t AS MATERIALIZED (
         |  SELECT source, id, min(dist) AS dist FROM (
         |    SELECT source, id, dist FROM d${t - 1}
         |    UNION ALL
         |    SELECT s.source, b.dst AS id, s.dist + b.weight AS dist
         |    FROM d${t - 1} s JOIN bidir b ON s.id = b.src)
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($weightedEdgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst, weight FROM e
       |  UNION ALL SELECT dst AS src, src AS dst, weight FROM e),
       |seeds AS (SELECT DISTINCT src AS id FROM bidir ORDER BY id LIMIT $k),
       |d0 AS MATERIALIZED (
       |  SELECT id AS source, id, CAST(0 AS BIGINT) AS dist FROM seeds),
       |$steps,
       |chk AS (SELECT CASE WHEN (SELECT count(*) FROM (
       |    (SELECT * FROM d$maxT) EXCEPT (SELECT * FROM d${maxT - 1}))) > 0
       |  THEN error('sssp oracle: unroll too shallow') ELSE 1 END AS ok)
       |SELECT source, id, CAST(dist AS BIGINT) AS dist
       |FROM d$maxT CROSS JOIN chk ORDER BY source, id""".stripMargin
  }

  /** SCC ground truth by mutual reachability (v→u AND u→v): a WITH body
    * ending in `scc(id, label)` with label = max id in the SCC — the
    * engine's canonical-label contract. `e` stays visible to the caller
    * (the condensation oracle joins it back). `mut`/`scc` MATERIALIZED:
    * the condensation oracle references `scc` twice and DuckDB inlines
    * plain CTEs (round-3 kcore lesson). */
  private def sccLabelsCte(directedEdgesSql: String): String =
    s"""WITH RECURSIVE e AS ($directedEdgesSql),
       |verts AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
       |reach AS (
       |  SELECT src AS a, dst AS b FROM e
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN e ON r.b = e.src),
       |mut AS MATERIALIZED (SELECT r1.a AS v, r1.b AS u
       |       FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
       |scc AS MATERIALIZED (
       |  SELECT v.id, CAST(greatest(v.id, coalesce(max(m.u), v.id)) AS BIGINT) AS label
       |  FROM verts v LEFT JOIN mut m ON v.id = m.v GROUP BY v.id)""".stripMargin

  /** Katz oracle: the engine's fixed-point steps unrolled — z_t(v) =
    * 1 + α·Σ_{u~v} z_{t-1}(u), only the output rounds (values stay O(1)
    * at α < 1/λmax, so the 6 dp round absorbs neighbor-sum order noise).
    * α forced to IEEE double (decimal literals compute exactly in
    * DuckDB); MATERIALIZED per step out of round-3-lesson caution. */
  private def katzOracleSql(edgesSql: String, alpha: Double, iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""x$t AS MATERIALIZED (
         |  SELECT b.dst AS id,
         |    CAST(1.0 AS DOUBLE) + CAST($alpha AS DOUBLE) * sum(x.v) AS v
         |  FROM bidir b JOIN x${t - 1} x ON b.src = x.id GROUP BY b.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
       |x0 AS MATERIALIZED (SELECT DISTINCT src AS id, CAST(1.0 AS DOUBLE) AS v FROM bidir),
       |$steps
       |SELECT id, round(v, 6) AS katz FROM x$iters ORDER BY id""".stripMargin
  }

  /** HITS oracle: the engine's alternating updates verbatim — per-term
    * division by the previous side's max (order-independent), pinned
    * iterations, per-side L∞ scaling, 6 dp round. h0 is uniform 1.0
    * over distinct sources; every step CTE is referenced twice (next
    * update + possibly output) → MATERIALIZED. */
  private def hitsOracleSql(directedEdgesSql: String, iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""a$t AS MATERIALIZED (
         |  SELECT e.dst AS id, sum(h.v / (SELECT m FROM mh${t - 1})) AS v
         |  FROM e JOIN h${t - 1} h ON e.src = h.id GROUP BY e.dst),
         |ma$t AS MATERIALIZED (SELECT max(v) AS m FROM a$t),
         |h$t AS MATERIALIZED (
         |  SELECT e.src AS id, sum(a.v / (SELECT m FROM ma$t)) AS v
         |  FROM e JOIN a$t a ON e.dst = a.id GROUP BY e.src),
         |mh$t AS MATERIALIZED (SELECT max(v) AS m FROM h$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($directedEdgesSql),
       |h0 AS MATERIALIZED (SELECT DISTINCT src AS id, CAST(1.0 AS DOUBLE) AS v FROM e),
       |mh0 AS (SELECT CAST(1.0 AS DOUBLE) AS m),
       |$steps
       |SELECT id, kind, score FROM (
       |  SELECT id, 'hub' AS kind,
       |    round(v / (SELECT m FROM mh$iters), 6) AS score FROM h$iters
       |  UNION ALL
       |  SELECT id, 'auth' AS kind,
       |    round(v / (SELECT m FROM ma$iters), 6) AS score FROM a$iters)
       |ORDER BY kind, id""".stripMargin
  }

  /** Deterministic-walk oracle: the engine's hash step rule verbatim —
    * all-integer arithmetic (ids reduced mod P before multiplying, no
    * overflow, no floats), ties broken by smaller neighbor id. Every
    * step CTE is referenced twice (next step + output union) →
    * MATERIALIZED. */
  private def walksOracleSql(edgesSql: String, nWalks: Int, steps: Int): String = {
    val stepCtes = (1 to steps).map { t =>
      s"""s$t AS MATERIALIZED (SELECT seed, walk, nbr AS vertex FROM (
         |  SELECT s.seed, s.walk, b.dst AS nbr,
         |    row_number() OVER (PARTITION BY s.seed, s.walk ORDER BY
         |      ((b.dst % 1000003) * 48271 + (s.vertex % 1000003) * 16807 +
         |       s.walk * 69621 + $t * 40503) % 1000003 ASC, b.dst ASC) AS rn
         |  FROM s${t - 1} s JOIN bidir b ON s.vertex = b.src) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val out = (0 to steps)
      .map(t => s"SELECT seed, walk, CAST($t AS BIGINT) AS step, vertex FROM s$t")
      .mkString("\nUNION ALL\n")
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
       |s0 AS MATERIALIZED (
       |  SELECT v.id AS seed, w.walk, v.id AS vertex
       |  FROM (SELECT DISTINCT src AS id FROM bidir) v
       |  CROSS JOIN (SELECT CAST(range AS BIGINT) AS walk FROM range($nWalks)) w),
       |$stepCtes
       |$out
       |ORDER BY seed, walk, step""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "pagerank" -> pagerankOracleSql(nationEdgesSql, prIters, 0.85),
    "ppr" -> pprOracleSql(nationEdgesSql, prIters, 0.85, pprSourceMax),
    "pagerank_weighted" -> pagerankWeightedOracleSql(nationEdgesWeightedSql, prIters, 0.85),
    "lpa_weighted" -> lpaWeightedOracleSql(nationEdgesWeightedSql, lpaIters),
    "edges_weighted" ->
      s"""$nationEdgesWeightedSql
         |ORDER BY src, dst""".stripMargin,
    "strength" ->
      s"""WITH ew AS MATERIALIZED ($nationEdgesWeightedSql),
         |bidir AS MATERIALIZED (SELECT src, dst, weight FROM ew
         |          UNION ALL SELECT dst AS src, src AS dst, weight FROM ew)
         |SELECT src AS id, CAST(sum(weight) AS BIGINT) AS strength
         |FROM bidir GROUP BY src ORDER BY id""".stripMargin,
    "neighbor_jaccard" ->
      s"""WITH e AS MATERIALIZED ($nationEdgesSql),
         |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
         |deg AS (SELECT src AS id, count(*) AS dg FROM bidir GROUP BY src),
         |cn AS (SELECT e.src, e.dst, count(*) AS c
         |       FROM e JOIN bidir n1 ON n1.src = e.src
         |              JOIN bidir n2 ON n2.src = e.dst AND n2.dst = n1.dst
         |       GROUP BY e.src, e.dst)
         |SELECT e.src, e.dst,
         |  round(CAST(coalesce(cn.c, 0) AS DOUBLE) /
         |        (d1.dg + d2.dg - coalesce(cn.c, 0)), 6) AS nbr_jaccard
         |FROM e JOIN deg d1 ON e.src = d1.id
         |       JOIN deg d2 ON e.dst = d2.id
         |       LEFT JOIN cn ON e.src = cn.src AND e.dst = cn.dst
         |ORDER BY e.src, e.dst""".stripMargin,
    "lpa" -> lpaOracleSql(nationEdgesSql, lpaIters),
    "lpa_seeded" -> lpaSeededOracleSql(nationEdgesSql, centralitySeedK, lpaIters),
    "modularity" -> modularityOracleSql(nationEdgesSql, lpaIters),
    "harmonic_centrality" ->
      s"""${multiSourceBfsCte(nationEdgesSql, centralitySeedK)}
         |SELECT id, round(sum(CAST(1.0 AS DOUBLE) / d), 6) AS harmonic
         |FROM dist WHERE d > 0 GROUP BY id ORDER BY id""".stripMargin,
    "closeness_centrality" ->
      s"""${multiSourceBfsCte(nationEdgesSql, centralitySeedK)}
         |SELECT id, CAST(count(*) AS DOUBLE) / CAST(sum(d) AS DOUBLE) AS closeness
         |FROM dist WHERE d > 0 GROUP BY id ORDER BY id""".stripMargin,
    // byd referenced twice (total + cumulative) → MATERIALIZED; the
    // p90 compare stays in integers (cum·10 ≥ t·9) on both sides
    "graph_diameter" ->
      s"""${multiSourceBfsCte(nationEdgesSql, centralitySeedK)},
         |pos AS (SELECT d FROM dist WHERE d > 0),
         |byd AS MATERIALIZED (SELECT d, count(*) AS n FROM pos GROUP BY d),
         |tot AS MATERIALIZED (SELECT CAST(sum(n) AS BIGINT) AS t FROM byd),
         |cum AS (SELECT d, sum(n) OVER (ORDER BY d) AS c FROM byd)
         |SELECT CAST((SELECT t FROM tot) AS BIGINT) AS pairs,
         |  CAST(max(d) AS BIGINT) AS diameter,
         |  CAST(min(CASE WHEN c * 10 >= (SELECT t FROM tot) * 9 THEN d END)
         |    AS BIGINT) AS eff_d90
         |FROM cum""".stripMargin,
    "digraph_stats" ->
      s"""WITH e AS MATERIALIZED ($coactivityDirectedEdgesSql),
         |outs AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
         |ins AS MATERIALIZED (SELECT DISTINCT dst AS id FROM e)
         |SELECT
         |  CAST((SELECT count(*) FROM (SELECT id FROM outs UNION SELECT id FROM ins))
         |    AS BIGINT) AS n_vertices,
         |  CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
         |  CAST((SELECT count(*) FROM e a JOIN e b
         |        ON a.src = b.dst AND a.dst = b.src) AS BIGINT) AS n_mutual,
         |  CAST((SELECT count(*) FROM outs WHERE id NOT IN (SELECT id FROM ins))
         |    AS BIGINT) AS n_sources,
         |  CAST((SELECT count(*) FROM ins WHERE id NOT IN (SELECT id FROM outs))
         |    AS BIGINT) AS n_sinks""".stripMargin,
    "eigencentrality" -> eigenvectorOracleSql(nationEdgesSql, eigenIters),
    "katz" -> katzOracleSql(nationEdgesSql, katzAlpha, katzIters),
    "betweenness" -> betweennessOracleSql(fixtureEdgesSql, centralitySeedK, 12),
    "sssp_weighted" -> ssspOracleSql(nationEdgesWeightedSql, centralitySeedK, 16),
    "hits" -> hitsOracleSql(custSuppDirectedSql, hitsIters),
    "sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS ns
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
        |  min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 6) AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_id""".stripMargin,
    // independent formulation on purpose: argmax inequality join, not
    // the engine's union+running-last scan
    "asof_view_click" ->
      """WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS us
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id, event_id, epoch_us(ts) AS us
        |      FROM events WHERE event_type = 'view'),
        |j AS (
        |  SELECT c.user_id, c.event_id AS right_id, c.us AS right_us,
        |         v.event_id AS left_id, v.us AS left_us,
        |         row_number() OVER (PARTITION BY c.event_id
        |                            ORDER BY v.us DESC, v.event_id DESC) AS rn
        |  FROM c JOIN v ON c.user_id = v.user_id AND v.us <= c.us)
        |SELECT user_id, right_id, right_us, left_id, left_us
        |FROM j WHERE rn = 1
        |UNION ALL
        |SELECT c.user_id, c.event_id, c.us,
        |       CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
        |FROM c WHERE NOT EXISTS (
        |  SELECT 1 FROM v WHERE v.user_id = c.user_id AND v.us <= c.us)
        |ORDER BY user_id, right_id""".stripMargin,
    "event_funnel" ->
      """WITH f AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |s0 AS (SELECT user_id, min(us) AS t FROM f
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT f.user_id, min(f.us) AS t FROM f
        |       JOIN s0 ON f.user_id = s0.user_id AND f.us > s0.t
        |       WHERE f.event_type = 'click' GROUP BY f.user_id),
        |s2 AS (SELECT f.user_id, min(f.us) AS t FROM f
        |       JOIN s1 ON f.user_id = s1.user_id AND f.us > s1.t
        |       WHERE f.event_type = 'purchase' GROUP BY f.user_id)
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS stage, 'view' AS stage_name,
        |         CAST(count(*) AS BIGINT) AS users FROM s0
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), 'click', CAST(count(*) AS BIGINT) FROM s1
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM s2)
        |ORDER BY stage""".stripMargin,
    "events_hourly" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS users,
        |  round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "user_decay" -> {
      val lambda = math.log(2.0) / (decayHalfLifeDays * 86400.0 * 1000000.0)
      val negL = java.lang.Double.toString(-lambda)
      s"""SELECT user_id, round(sum(value * exp(
         |    CAST($negL AS DOUBLE) *
         |    CAST($decayAsOfUs - epoch_us(ts) AS DOUBLE))), 6) AS score
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    },
    "props_hist" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cc_coactivity" -> ccOracleSql(coactivityEdgesSql),
    "scc_coactivity" ->
      s"""${sccLabelsCte(coactivityDirectedEdgesSql)}
         |SELECT id, label FROM scc ORDER BY id""".stripMargin,
    "scc_condensation" ->
      s"""${sccLabelsCte(coactivityDirectedEdgesSql)}
         |SELECT DISTINCT ls.label AS src_scc, ld.label AS dst_scc
         |FROM e JOIN scc ls ON e.src = ls.id JOIN scc ld ON e.dst = ld.id
         |WHERE ls.label <> ld.label ORDER BY src_scc, dst_scc""".stripMargin,
    // longest-path levels over the condensation: every walk prefix ends
    // somewhere, so max(len) per node over the (node, 0) ∪ step closure
    // is the longest path from any source (the DAG is finite/acyclic —
    // certified by the engine's convergence guard — so the recursion
    // terminates)
    "condensation_levels" ->
      s"""${sccLabelsCte(coactivityDirectedEdgesSql)},
         |cond AS MATERIALIZED (
         |  SELECT DISTINCT ls.label AS s, ld.label AS d
         |  FROM e JOIN scc ls ON e.src = ls.id JOIN scc ld ON e.dst = ld.id
         |  WHERE ls.label <> ld.label),
         |nodes AS (SELECT s AS id FROM cond UNION SELECT d AS id FROM cond),
         |walk AS (
         |  SELECT id, 0 AS len FROM nodes
         |  UNION
         |  SELECT c.d AS id, w.len + 1 AS len FROM walk w JOIN cond c ON w.id = c.s)
         |SELECT id, CAST(max(len) AS BIGINT) AS level
         |FROM walk GROUP BY id ORDER BY id""".stripMargin,
    "random_walks" -> walksOracleSql(nationEdgesSql, walkN, walkSteps),
    // skip-gram pairs over the SAME unrolled walk oracle, self-joined on
    // (seed, walk) within the window; self-pairs dropped
    "walk_pairs" -> {
      val walksSub = walksOracleSql(nationEdgesSql, walkN, walkSteps)
      // ONE materialized copy of the unrolled walk chain, self-joined —
      // inlining the subquery twice would evaluate the whole steps-deep
      // recursion twice per gate run
      s"""WITH w AS MATERIALIZED ($walksSub)
         |SELECT w1.vertex AS center, w2.vertex AS context,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM w w1 JOIN w w2
         |  ON w1.seed = w2.seed AND w1.walk = w2.walk
         | AND abs(w1.step - w2.step) BETWEEN 1 AND $walkWindow
         | AND w1.vertex <> w2.vertex
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "ann_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS nbr_id, embedding AS ce FROM embeddings),
        |scored AS (
        |  SELECT query_id, nbr_id,
        |    round(CASE WHEN nq * nc = 0 THEN CAST(0.0 AS DOUBLE)
        |               ELSE d/(nq*nc) END, 8) AS cos
        |  FROM (
        |    SELECT query_id, nbr_id,
        |      list_sum(list_transform(list_zip(qe, ce),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS d,
        |      sqrt(list_sum(list_transform(qe,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq,
        |      sqrt(list_sum(list_transform(ce,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nc
        |    FROM q CROSS JOIN c WHERE query_id <> nbr_id) s)
        |SELECT query_id, CAST(rn AS BIGINT) AS rank, nbr_id, cos FROM (
        |  SELECT query_id, nbr_id, cos,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cos DESC, nbr_id ASC) AS rn
        |  FROM scored) t
        |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,
    "kmeans_assign" -> kMeansOracleSql(kmeansK, kmeansIters),
    // each subspace is the FULL kmeans oracle over a list slice (1-based
    // inclusive in DuckDB); the 64-dim harness corpus is pinned here
    "pq_codes" -> {
      val sub = 64 / pqM
      val parts = (0 until pqM).map { j =>
        s"""(${kMeansOracleSql(kmeansK, kmeansIters,
              s"embedding[${j * sub + 1}:${(j + 1) * sub}]")}) p$j"""
      }
      val joins = parts.head +
        (1 until pqM).map(j => s"\nJOIN ${parts(j)} USING (vec_id)").mkString
      val cols = (0 until pqM).map(j => s"p$j.cluster AS code_$j").mkString(", ")
      s"SELECT vec_id, $cols\nFROM $joins\nORDER BY vec_id"
    },
    // IVF-PQ search oracle: the coarse + m subspace k-means chains
    // composed in one WITH (prefixed CTE names), then probe → ADC →
    // exact rerank, mirroring Similarity.ivfSearch step for step. The
    // float surfaces (probe/ADC distances over avg'd centroids) carry
    // the kmeans_assign robustness argument; the rerank cosine is the
    // knn_all-gated bit-identical arithmetic.
    "ivf_search" -> {
      val iters = kmeansIters
      val sub = 64 / pqM
      val subChains = (0 until pqM).map { j =>
        kMeansCtesSql(s"s${j}_", kmeansK, iters,
          s"embedding[${j * sub + 1}:${(j + 1) * sub}]")
      }.mkString(",\n")
      val dtabs = (0 until pqM).map { j =>
        s"""dt$j AS MATERIALIZED (
           |  SELECT q.query_id, c.cluster AS code,
           |    list_sum(list_transform(
           |      list_zip(q.qe[${j * sub + 1}:${(j + 1) * sub}], c.cent),
           |      p -> (p[1]-p[2])*(p[1]-p[2]))) AS d
           |  FROM q CROSS JOIN s${j}_c$iters c)""".stripMargin
      }.mkString(",\n")
      val idxJoins = (0 until pqM)
        .map(j => s"JOIN s${j}_afinal s$j USING (vec_id)").mkString("\n  ")
      val idxCols = (0 until pqM).map(j => s"s$j.cluster AS code_$j").mkString(", ")
      val adcJoins = (0 until pqM)
        .map(j => s"JOIN dt$j ON dt$j.query_id = p.query_id AND dt$j.code = i.code_$j")
        .mkString("\n  ")
      val adcSum = (0 until pqM).map(j => s"dt$j.d").mkString(" + ")
      s"""WITH ${kMeansCtesSql("cq_", kmeansK, iters)},
         |$subChains,
         |q AS MATERIALIZED (
         |  SELECT vec_id AS query_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
         |  FROM embeddings WHERE vec_id < 10),
         |probe AS MATERIALIZED (
         |  SELECT query_id, cluster AS cell FROM (
         |    SELECT q.query_id, c.cluster,
         |      row_number() OVER (PARTITION BY q.query_id ORDER BY
         |        list_sum(list_transform(list_zip(q.qe, c.cent),
         |          p -> (p[1]-p[2])*(p[1]-p[2]))) ASC, c.cluster ASC) AS rn
         |    FROM q CROSS JOIN cq_c$iters c) WHERE rn <= 2),
         |idx AS MATERIALIZED (
         |  SELECT a.vec_id, a.cluster AS cell, $idxCols
         |  FROM cq_afinal a
         |  $idxJoins),
         |$dtabs,
         |cand AS MATERIALIZED (
         |  SELECT p.query_id, i.vec_id, $adcSum AS adc
         |  FROM probe p
         |  JOIN idx i ON p.cell = i.cell AND p.query_id <> i.vec_id
         |  $adcJoins),
         |pool AS MATERIALIZED (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY adc ASC, vec_id ASC) AS rn
         |    FROM cand) WHERE rn <= $ivfRerank),
         |scored AS (
         |  SELECT query_id, vec_id AS nbr_id,
         |    round(CASE WHEN nq * nc = 0 THEN CAST(0.0 AS DOUBLE)
         |               ELSE d/(nq*nc) END, 8) AS cos
         |  FROM (
         |    SELECT p.query_id, p.vec_id,
         |      list_sum(list_transform(list_zip(q.qe0, e.ce),
         |        p2 -> CAST(p2[1] AS DOUBLE) * CAST(p2[2] AS DOUBLE))) AS d,
         |      sqrt(list_sum(list_transform(q.qe0,
         |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq,
         |      sqrt(list_sum(list_transform(e.ce,
         |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nc
         |    FROM pool p
         |    JOIN (SELECT vec_id AS query_id, embedding AS qe0
         |          FROM embeddings) q USING (query_id)
         |    JOIN (SELECT vec_id, embedding AS ce FROM embeddings) e
         |      USING (vec_id)) s)
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, nbr_id, cos FROM (
         |  SELECT query_id, nbr_id, cos,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, nbr_id ASC) AS rn
         |  FROM scored) t
         |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin
    },
    // exact all-pairs ground truth for the full-corpus kNN product —
    // same list-lambda cosine arithmetic as ann_topk, no query filter
    "knn_all" ->
      """WITH q AS (SELECT vec_id, embedding AS qe FROM embeddings),
        |c AS (SELECT vec_id AS nbr_id, embedding AS ce FROM embeddings),
        |scored AS (
        |  SELECT vec_id, nbr_id,
        |    round(CASE WHEN nq * nc = 0 THEN CAST(0.0 AS DOUBLE)
        |               ELSE d/(nq*nc) END, 8) AS cos
        |  FROM (
        |    SELECT vec_id, nbr_id,
        |      list_sum(list_transform(list_zip(qe, ce),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS d,
        |      sqrt(list_sum(list_transform(qe,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq,
        |      sqrt(list_sum(list_transform(ce,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nc
        |    FROM q CROSS JOIN c WHERE vec_id <> nbr_id) s)
        |SELECT vec_id, CAST(rn AS BIGINT) AS rank, nbr_id, cos FROM (
        |  SELECT vec_id, nbr_id, cos,
        |    row_number() OVER (PARTITION BY vec_id
        |                       ORDER BY cos DESC, nbr_id ASC) AS rn
        |  FROM scored) t
        |WHERE rn <= 3 ORDER BY vec_id, rn""".stripMargin,
    "cc_text_fixture" ->
      s"""WITH RECURSIVE raw AS (
         |  SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
         |  FROM read_csv('$textFixturePath', sep=' ',
         |                names=['a','b'], skip=1, header=false)),
         |e AS (SELECT least(a,b) AS src, greatest(a,b) AS dst
         |      FROM raw WHERE a <> b),
         |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
         |reach AS (
         |  SELECT src AS id, src AS lbl FROM bidir
         |  UNION
         |  SELECT r.id, b.dst AS lbl FROM reach r JOIN bidir b ON r.lbl = b.src)
         |SELECT id, CAST(max(lbl) AS BIGINT) AS label
         |FROM reach GROUP BY id ORDER BY id""".stripMargin,
    "edges_supplier" ->
      s"""SELECT src, dst FROM ($supplierEdgesSql) ORDER BY src, dst""",
    "degrees" ->
      s"""WITH e AS ($supplierEdgesSql)
         |SELECT id, CAST(count(*) AS BIGINT) AS degree
         |FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
         |GROUP BY id ORDER BY id""".stripMargin,
    "cc_supplier" -> ccOracleSql(supplierEdgesSql),
    // incremental fold of the same edge set ⇒ identical labels
    "cc_incremental" -> ccOracleSql(supplierEdgesSql),
    "cc_supplier_star" -> ccOracleSql(supplierEdgesSql),
    "cc_supplier_sampled" -> ccOracleSql(supplierEdgesSql),
    "cc_supplier_random" -> ccOracleSql(supplierEdgesSql),
    "cc_nation" -> ccOracleSql(nationEdgesSql),
    "cc_sizes" ->
      s"""WITH RECURSIVE e AS ($nationEdgesSql),
         |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
         |reach AS (
         |  SELECT src AS id, src AS lbl FROM bidir
         |  UNION
         |  SELECT r.id, b.dst AS lbl FROM reach r JOIN bidir b ON r.lbl = b.src
         |),
         |labels AS (SELECT id, max(lbl) AS label FROM reach GROUP BY id)
         |SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS size
         |FROM labels GROUP BY label ORDER BY label""".stripMargin,
    "triangles" ->
      s"""WITH e AS ($nationEdgesSql)
         |SELECT CAST(count(*) AS BIGINT) AS triangles
         |FROM e e1
         |JOIN e e2 ON e2.src = e1.src AND e2.dst > e1.dst
         |JOIN e e3 ON e3.src = e1.dst AND e3.dst = e2.dst""".stripMargin,
    "triangles_per_vertex" ->
      s"""WITH e AS MATERIALIZED ($nationEdgesSql),
         |tri AS (
         |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |  FROM e e1
         |  JOIN e e2 ON e2.src = e1.dst
         |  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
         |)
         |SELECT id, CAST(count(*) AS BIGINT) AS triangles
         |FROM (SELECT unnest([a, b, c]) AS id FROM tri)
         |GROUP BY id ORDER BY id""".stripMargin,
    "degrees_prefix_sum" ->
      s"""WITH e AS ($supplierEdgesSql),
         |d AS (SELECT id, CAST(count(*) AS BIGINT) AS degree
         |      FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
         |      GROUP BY id)
         |SELECT id, degree,
         |  CAST(sum(degree) OVER (ORDER BY id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS prefix_sum
         |FROM d ORDER BY id""".stripMargin,
    "cc_dense_labels" ->
      s"""WITH RECURSIVE e AS ($nationEdgesSql),
         |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
         |reach AS (
         |  SELECT src AS id, src AS lbl FROM bidir
         |  UNION
         |  SELECT r.id, b.dst AS lbl FROM reach r JOIN bidir b ON r.lbl = b.src
         |),
         |labels AS (SELECT id, max(lbl) AS label FROM reach GROUP BY id)
         |SELECT id, CAST(dense_rank() OVER (ORDER BY label) - 1 AS BIGINT)
         |  AS dense_label
         |FROM labels ORDER BY id""".stripMargin,
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    greatest(CAST(length(text) AS DOUBLE), 1.0) AS n,
        |    CAST(length(text) AS DOUBLE) AS len,
        |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS np,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS nd,
        |    len(tk) AS ntok,
        |    CASE WHEN len(tk) > 0
        |         THEN CAST(list_sum(list_transform(tk, w -> length(w))) AS DOUBLE) / len(tk)
        |         ELSE 0.0 END AS mtl,
        |    coalesce(CAST(list_sum(list_transform(tk,
        |      w -> greatest(CAST(ceil(length(w)/4.0) AS BIGINT), 1))) AS BIGINT), 0)
        |      AS bpeish_tokens
        |  FROM t)
        |SELECT doc_id,
        |  round(least(len/200.0, 1.0) * 0.4 +
        |        (CASE WHEN mtl BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |        (CASE WHEN np/n < 0.1 THEN 1.0 ELSE 0.5 END) * 0.2 +
        |        (CASE WHEN nd/n < 0.2 THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality,
        |  bpeish_tokens
        |FROM m ORDER BY doc_id""".stripMargin,
    "degree_histogram" ->
      s"""WITH e AS MATERIALIZED ($nationEdgesSql),
         |d AS (
         |  SELECT id, CAST(count(*) AS BIGINT) AS degree
         |  FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
         |  GROUP BY id)
         |SELECT degree, CAST(count(*) AS BIGINT) AS n_vertices
         |FROM d GROUP BY degree ORDER BY degree""".stripMargin,
    "content_sha" ->
      """SELECT doc_id, sha256(text) AS content_sha
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_m,
        |  CAST(CASE WHEN length(trim(text))=0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text),'\s+')) END AS BIGINT) AS n_tokens,
        |  CAST(length(regexp_replace(text,'[^.,;:!?]','','g')) AS BIGINT) AS n_punct,
        |  CAST(length(regexp_replace(text,'[^0-9]','','g')) AS BIGINT) AS n_digits,
        |  CAST(length(regexp_replace(text,'[^A-Z]','','g')) AS BIGINT) AS n_upper
        |FROM documents ORDER BY doc_id""".stripMargin,
    // uni/bi referenced once each but MATERIALIZED out of caution; the
    // per-doc grams come from unnest, counts are exact integers
    "text_repetition" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, CASE WHEN length(trim(text))=0 THEN []
        |    ELSE regexp_split_to_array(trim(text),'\s+') END AS t
        |  FROM documents),
        |ug AS (SELECT doc_id, unnest(t) AS g FROM toks),
        |ugc AS (SELECT doc_id, g, count(*) AS c FROM ug GROUP BY 1, 2),
        |uni AS MATERIALIZED (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(max(c) AS BIGINT) AS top_token_n
        |  FROM ugc GROUP BY 1),
        |bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
        |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |             FROM toks WHERE len(t) >= 2)),
        |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
        |bi AS MATERIALIZED (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    CAST(max(c) AS BIGINT) AS top_bigram_n
        |  FROM bgc GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(n_distinct, 0) AS BIGINT) AS n_distinct,
        |  CAST(coalesce(top_token_n, 0) AS BIGINT) AS top_token_n,
        |  CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(top_bigram_n, 0) AS BIGINT) AS top_bigram_n
        |FROM documents d LEFT JOIN uni USING (doc_id) LEFT JOIN bi USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_lang" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_transform(CASE WHEN length(trim(text))=0 THEN []
        |      ELSE regexp_split_to_array(trim(text),'\s+') END, t -> lower(t)) AS tk,
        |    length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk
        |  FROM documents),
        |scores AS (
        |  SELECT doc_id, cjk,
        |    len(list_filter(tk, t -> list_contains(['the','and','of','to','is','in','that','with'], t))) AS s_en,
        |    len(list_filter(tk, t -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], t))) AS s_de,
        |    len(list_filter(tk, t -> list_contains(['le','la','les','et','est','dans','que','une'], t))) AS s_fr,
        |    len(list_filter(tk, t -> list_contains(['el','los','las','es','en','que','una','por'], t))) AS s_es
        |  FROM toks)
        |SELECT doc_id, CASE WHEN cjk > 2 THEN 'zh'
        |  WHEN greatest(s_en,s_de,s_fr,s_es) = 0 THEN 'unknown'
        |  WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |  WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |  WHEN s_fr >= s_es THEN 'fr'
        |  ELSE 'es' END AS lang_guess
        |FROM scores ORDER BY doc_id""".stripMargin,
    "text_jaccard_topk" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct(CASE
        |      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_transform(generate_series(1, len(tk) - 2),
        |             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END) AS sh
        |  FROM (SELECT doc_id,
        |          CASE WHEN length(trim(text)) = 0 THEN []
        |               ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
        |        FROM documents)),
        |scored AS (
        |  SELECT q.doc_id AS query_id, c.doc_id AS nbr_id,
        |    round(CASE WHEN len(list_distinct(list_concat(q.sh, c.sh))) = 0
        |          THEN CAST(1.0 AS DOUBLE)
        |          ELSE CAST(len(list_intersect(q.sh, c.sh)) AS DOUBLE) /
        |               len(list_distinct(list_concat(q.sh, c.sh))) END, 6) AS jaccard
        |  FROM t q JOIN t c ON q.doc_id < 5 AND q.doc_id <> c.doc_id)
        |SELECT query_id, CAST(rn AS BIGINT) AS rank, nbr_id, jaccard FROM (
        |  SELECT query_id, nbr_id, jaccard,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY jaccard DESC, nbr_id ASC) AS rn
        |  FROM scored) x
        |WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin,
    "media_features" ->
      """SELECT doc_id AS media_id, coalesce(source, 'text') AS kind,
        |  CAST(octet_length(encode(coalesce(text, ''))) +
        |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 3 ELSE 4 END
        |       AS BIGINT) AS n_bytes,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |       ELSE 'riff' END AS sniffed_kind
        |FROM documents ORDER BY doc_id""".stripMargin,
    "bfs_hops" ->
      s"""WITH RECURSIVE e AS ($supplierEdgesSql),
         |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
         |walk AS (
         |  SELECT (SELECT min(src) FROM bidir) AS id, 0 AS d
         |  UNION
         |  SELECT b.dst, w.d + 1
         |  FROM walk w JOIN bidir b ON w.id = b.src WHERE w.d < 64)
         |SELECT id, CAST(min(d) AS BIGINT) AS dist
         |FROM walk GROUP BY id ORDER BY id""".stripMargin,
    "kcore3" -> kCoreOracleSql(nationEdgesSql, k = 3, iters = 25),
    "coreness" -> corenessOracleSql(nationEdgesSql, iters = 8),
    "community_conductance" -> conductanceOracleSql(nationEdgesSql, lpaIters),
    "ktruss4" -> kTrussOracleSql(nationEdgesSql, k = 4, iters = 15),
    "clustering_coeff" ->
      s"""WITH e AS MATERIALIZED ($nationEdgesSql),
         |d AS (SELECT id, CAST(count(*) AS BIGINT) AS degree
         |      FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
         |      GROUP BY id),
         |tri AS (
         |  SELECT id, count(*) AS triangles FROM (
         |    SELECT unnest([e1.src, e1.dst, e2.dst]) AS id
         |    FROM e e1
         |    JOIN e e2 ON e2.src = e1.dst
         |    JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst)
         |  GROUP BY id)
         |SELECT id,
         |  CASE WHEN degree < 2 THEN CAST(0.0 AS DOUBLE)
         |       ELSE round(coalesce(triangles, 0) * CAST(2.0 AS DOUBLE) /
         |                  (degree * (degree - 1)), 6) END AS clustering
         |FROM d LEFT JOIN tri USING (id) ORDER BY id""".stripMargin,
    "common_neighbors" ->
      s"""WITH e AS MATERIALIZED ($nationEdgesSql),
         |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
         |cn AS (
         |  SELECT e.src, e.dst, count(*) AS c
         |  FROM e
         |  JOIN bidir a ON a.src = e.src
         |  JOIN bidir b ON b.src = e.dst AND b.dst = a.dst
         |  GROUP BY e.src, e.dst)
         |SELECT src, dst, CAST(coalesce(c, 0) AS BIGINT) AS common_neighbors
         |FROM e LEFT JOIN cn USING (src, dst) ORDER BY src, dst""".stripMargin,
    // friend-of-friend recommendations: distance-2 non-adjacent pairs by
    // common-neighbor count, top-3 per vertex (ties → smaller candidate)
    "fof_recs" ->
      s"""WITH raw AS (
         |  SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
         |  FROM read_csv('$textFixturePath', sep=' ',
         |                names=['a','b'], skip=1, header=false)),
         |e AS (SELECT DISTINCT least(a,b) AS src, greatest(a,b) AS dst
         |      FROM raw WHERE a <> b),
         |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
         |cn AS (
         |  SELECT x.src AS id, y.dst AS cand, count(*) AS cn
         |  FROM bidir x JOIN bidir y ON x.dst = y.src AND x.src <> y.dst
         |  GROUP BY x.src, y.dst),
         |nonadj AS (
         |  SELECT c.id, c.cand, c.cn FROM cn c
         |  LEFT JOIN bidir b ON c.id = b.src AND c.cand = b.dst
         |  WHERE b.src IS NULL)
         |SELECT id, CAST(rn AS BIGINT) AS rank, cand,
         |  CAST(cn AS BIGINT) AS common_neighbors FROM (
         |  SELECT id, cand, cn,
         |    row_number() OVER (PARTITION BY id
         |                       ORDER BY cn DESC, cand ASC) AS rn
         |  FROM nonadj) t
         |WHERE rn <= 3 ORDER BY id, rn""".stripMargin,
    // unigram cross-entropy vs corpus: same tokenizer; Σ order differs
    // across engines (~1e-15 rel) — 6 dp round is the contract
    "doc_xent" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents WHERE length(trim(text)) > 0),
        |corpus AS (SELECT token, count(*) AS cf FROM tk GROUP BY token),
        |total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tk),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY doc_id, token)
        |SELECT doc_id,
        |  round(-sum(tf * ln(cf / (SELECT n FROM total))) / sum(tf), 6) AS xent
        |FROM tf JOIN corpus USING (token)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // bigram-LM cross-entropy: same tokenizer and pairing as the
    // text_repetition bigrams; add-0.5 smoothing over V = corpus
    // distinct unigrams; 6 dp round absorbs cross-engine Σ/ln ulps
    "doc_xent_bigram" ->
      raw"""WITH tk AS MATERIALIZED (
        |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
        |    ELSE regexp_split_to_array(trim(text), '\s+') END AS t
        |  FROM documents),
        |bg AS MATERIALIZED (
        |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        |  FROM tk, unnest(range(1, len(t))) AS u(i)
        |  WHERE len(t) >= 2),
        |cbg AS MATERIALIZED (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cbg FROM bg GROUP BY 1, 2),
        |cctx AS MATERIALIZED (
        |  SELECT w1, CAST(sum(cbg) AS BIGINT) AS cctx FROM cbg GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
        |      FROM (SELECT unnest(t) AS w FROM tk)),
        |db AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS n
        |       FROM bg GROUP BY 1, 2, 3)
        |SELECT doc_id,
        |  round(-sum(n * ln((cbg + 0.5) / (cctx + 0.5 * (SELECT v FROM v))))
        |    / sum(n), 6) AS xent_bigram
        |FROM db JOIN cbg USING (w1, w2) JOIN cctx USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // TF-IDF: same tokenizer as vocab/token counts; rank by the ROUNDED
    // score (ties → token asc) exactly like the engine
    "tfidf_topk" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents WHERE length(trim(text)) > 0),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY doc_id, token),
        |dfx AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |s AS (
        |  SELECT doc_id, token,
        |    round(tf * ln((SELECT n FROM nn) / df), 6) AS tfidf
        |  FROM tf JOIN dfx USING (token))
        |SELECT doc_id, CAST(rn AS BIGINT) AS rank, token, tfidf FROM (
        |  SELECT doc_id, token, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY tfidf DESC, token ASC) AS rn
        |  FROM s) t
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "vocab_topk" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |      FROM documents WHERE length(trim(text)) > 0)
        |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 100""".stripMargin,
    "token_count_ranks" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    coalesce(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT), 0)
        |      AS n_tokens
        |  FROM documents),
        |r AS (SELECT n_tokens,
        |        row_number() OVER (ORDER BY n_tokens, doc_id) AS rank FROM d),
        |n AS (SELECT count(*) AS n FROM d)
        |SELECT CAST(rank AS BIGINT) AS rank, n_tokens FROM r, n
        |WHERE rank IN (1, n // 4, n // 2, 3 * n // 4, n) ORDER BY rank""".stripMargin,
    "docs_per_source_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, coalesce(source, 'text') AS source,
        |    row_number() OVER (PARTITION BY coalesce(source, 'text')
        |                       ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn <= 10 ORDER BY source, doc_id""".stripMargin,
    // exact all-pairs 3-shingle Jaccard ≥ 0.8 — the ground truth the
    // LSH+verify pipeline must reproduce exactly (recall included)
    // postings self-join computes |A∩B| relationally (sh lists are
    // distinct; |A∪B| = |A|+|B|−|A∩B|; pairs with no shared shingle
    // have jaccard 0 < 0.8) — same integers, same double division as
    // the old O(n²) all-pairs form, minus the oracle-suite DoS
    "dedup_near_pairs" ->
      s"""WITH $shingleCteSql,
         |post AS MATERIALIZED (SELECT doc_id, unnest(sh) AS g FROM t),
         |lens AS MATERIALIZED (SELECT doc_id, len(sh) AS n FROM t),
         |scored AS (
         |  SELECT c.id_a, c.id_b,
         |    round(CAST(c.i AS DOUBLE) / (la.n + lb.n - c.i), 6) AS jaccard
         |  FROM (SELECT p.doc_id AS id_a, q.doc_id AS id_b, count(*) AS i
         |        FROM post p JOIN post q ON p.g = q.g AND p.doc_id < q.doc_id
         |        GROUP BY p.doc_id, q.doc_id) c
         |  JOIN lens la ON c.id_a = la.doc_id
         |  JOIN lens lb ON c.id_b = lb.doc_id)
         |SELECT id_a, id_b, jaccard FROM scored
         |WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin,
    // Adamic-Adar: common neighbors of each edge weighted 1/ln(deg)
    "adamic_adar" ->
      s"""WITH e AS MATERIALIZED ($nationEdgesSql),
         |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
         |deg AS (SELECT src AS id, count(*) AS dg FROM bidir GROUP BY src),
         |cn AS (SELECT e.src, e.dst, n1.dst AS w
         |       FROM e JOIN bidir n1 ON n1.src = e.src
         |              JOIN bidir n2 ON n2.src = e.dst AND n2.dst = n1.dst),
         |aa AS (SELECT cn.src, cn.dst,
         |         round(sum(CAST(1.0 AS DOUBLE)/ln(d.dg)), 6) AS adamic_adar
         |       FROM cn JOIN deg d ON cn.w = d.id GROUP BY cn.src, cn.dst)
         |SELECT e.src, e.dst,
         |  coalesce(aa.adamic_adar, CAST(0.0 AS DOUBLE)) AS adamic_adar
         |FROM e LEFT JOIN aa ON e.src = aa.src AND e.dst = aa.dst
         |ORDER BY e.src, e.dst""".stripMargin,
    // assortativity: moment sums in DOUBLE over exact-integer terms —
    // every partial sum below 2^53 is exact, so the value is identical
    // to the engine's at any fold order (no streaming corr())
    "assortativity" ->
      s"""WITH e AS MATERIALIZED ($nationEdgesSql),
         |bidir AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
         |deg AS (SELECT src AS id, count(*) AS dg FROM bidir GROUP BY src),
         |p AS (SELECT CAST(d1.dg AS DOUBLE) AS x, CAST(d2.dg AS DOUBLE) AS y
         |      FROM bidir b JOIN deg d1 ON b.src = d1.id
         |                   JOIN deg d2 ON b.dst = d2.id),
         |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |             sum(x) AS sx, sum(y) AS sy,
         |             sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy FROM p)
         |SELECT CASE WHEN n*sxx - sx*sx <= 0 OR n*syy - sy*sy <= 0
         |       THEN CAST(0.0 AS DOUBLE)
         |       ELSE round((n*sxy - sx*sy) /
         |            (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 6)
         |       END AS assortativity
         |FROM s""".stripMargin,
    // survivors: drop every non-max member of a reachability cluster
    "dedup_survivors" ->
      s"""WITH RECURSIVE $dedupClustersCteSql
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> label)
         |ORDER BY doc_id""".stripMargin,
    // final corpus: survivors ∩ quality ≥ 0.6 ∩ identified language.
    // The engine's qualityScore ROUNDS to 6 dp by contract, so the
    // filter must compare the rounded value here too — comparing raw
    // would diverge for scores in [0.5999995, 0.6).
    "corpus_filtered" ->
      raw"""WITH RECURSIVE $dedupClustersCteSql,
        |$qualityLangCteSql
        |SELECT d.doc_id, l.lang, round(q.quality_raw, 6) AS quality
        |FROM documents d JOIN q ON d.doc_id = q.doc_id
        |                 JOIN l ON d.doc_id = l.doc_id
        |WHERE d.doc_id NOT IN (SELECT id FROM clusters WHERE id <> label)
        |  AND round(q.quality_raw, 6) >= 0.6 AND l.lang <> 'unknown'
        |ORDER BY d.doc_id""".stripMargin,
    // the terminal pipeline product: corpus_filtered's survivors further
    // restricted to the train split, minus the benchmark docs themselves
    // and minus every 5-gram-contaminated doc — the rows a training run
    // actually reads
    "corpus_final" ->
      raw"""WITH RECURSIVE $dedupClustersCteSql,
        |$qualityLangCteSql,
        |cg AS MATERIALIZED (
        |  SELECT doc_id, $fiveGramListSql AS sh
        |  FROM qt),
        |cbench AS (SELECT DISTINCT unnest(sh) AS gg FROM cg WHERE doc_id % 25 = 0),
        |chits AS (
        |  SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, unnest(sh) AS gg FROM cg WHERE doc_id % 25 <> 0) x
        |  JOIN cbench USING (gg))
        |SELECT d.doc_id, l.lang, round(q.quality_raw, 6) AS quality
        |FROM documents d JOIN q ON d.doc_id = q.doc_id
        |                 JOIN l ON d.doc_id = l.doc_id
        |WHERE d.doc_id NOT IN (SELECT id FROM clusters WHERE id <> label)
        |  AND round(q.quality_raw, 6) >= 0.6 AND l.lang <> 'unknown'
        |  AND d.doc_id % 25 <> 0
        |  AND d.doc_id NOT IN (SELECT doc_id FROM chits)
        |  AND $splitCaseSql = 'train'
        |ORDER BY d.doc_id""".stripMargin,
    // duplicate clusters: reachability closure over the SAME exact
    // all-pairs edge set, canonical max-id labels (engine CC semantics)
    "dedup_clusters" ->
      s"""WITH RECURSIVE $dedupClustersCteSql
         |SELECT id, label FROM clusters ORDER BY id""".stripMargin,
    // (id, band) skeleton of the banded signatures — bucket values are
    // xxhash64-bound (no DuckDB equivalent); see the query comment
    "dedup_minhash_bands" ->
      """SELECT doc_id AS id, CAST(range AS INT) AS band
        |FROM documents CROSS JOIN range(16)
        |ORDER BY id, band""".stripMargin,
    "dedup_exact_groups" ->
      """SELECT sha256(text) AS content_sha,
        |  CAST(min(doc_id) AS BIGINT) AS rep_id,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "corpus_split" ->
      s"""SELECT doc_id, $splitCaseSql AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "split_summary" ->
      raw"""WITH s AS (
        |  SELECT $splitCaseSql AS split, lang,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nt
        |  FROM documents)
        |SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // 5-token-gram variant of the shingle fragment (same short-doc rule:
    // fewer than 5 tokens → the whole text as one gram, like the engine)
    "decontaminate" ->
      raw"""WITH toks AS (
        |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
        |    ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, $fiveGramListSql AS sh
        |  FROM toks),
        |bench AS (SELECT DISTINCT unnest(sh) AS gg FROM g WHERE doc_id % 25 = 0),
        |hits AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(sh) AS gg FROM g WHERE doc_id % 25 <> 0) x
        |  JOIN bench USING (gg) GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(c, 0) AS BIGINT) AS n_overlap,
        |  CAST(CASE WHEN coalesce(c, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
        |FROM documents d LEFT JOIN hits USING (doc_id)
        |WHERE doc_id % 25 <> 0 ORDER BY doc_id""".stripMargin,
    // substring-overlap pairs: k-token grams (k = substringK) exploded
    // to postings, capped per gram at 1000 smallest doc_ids (QUALIFY =
    // the engine's capGroups keep-rule, inert at sf0.01 where no gram
    // has > 500 postings), self-joined, distinct-shared-gram count
    "substring_dup_pairs" -> {
      val k = substringK
      raw"""WITH toks AS (
        |  SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
        |    ELSE regexp_split_to_array(trim(text), '\s+') END AS tk
        |  FROM documents),
        |g AS MATERIALIZED (
        |  SELECT doc_id, list_distinct(CASE WHEN len(tk) < $k
        |    THEN [array_to_string(tk, ' ')]
        |    ELSE list_transform(generate_series(1, len(tk) - ${k - 1}),
        |      i -> array_to_string(tk[i:i+${k - 1}], ' ')) END) AS sh
        |  FROM toks),
        |post AS MATERIALIZED (
        |  SELECT doc_id, gg FROM (SELECT doc_id, unnest(sh) AS gg FROM g)
        |  QUALIFY row_number() OVER (PARTITION BY gg ORDER BY doc_id) <= 1000)
        |SELECT p.doc_id AS id_a, q.doc_id AS id_b,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM post p JOIN post q ON p.gg = q.gg AND p.doc_id < q.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "split_leakage" ->
      s"""WITH $nearPairsCteSql,
         |sp AS (SELECT doc_id, $splitCaseSql AS split FROM documents)
         |SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b
         |FROM pairs p JOIN sp sa ON p.id_a = sa.doc_id
         |             JOIN sp sb ON p.id_b = sb.doc_id
         |WHERE sa.split <> sb.split ORDER BY 1, 2""".stripMargin,

    "corpus_sample" ->
      """SELECT lang, doc_id, CAST(rank AS INT) AS rank FROM (
        |  SELECT lang, doc_id, row_number() OVER (
        |    PARTITION BY lang ORDER BY sha256(text), doc_id) AS rank
        |  FROM documents)
        |WHERE rank <= 10 ORDER BY lang, rank""".stripMargin,
    "corpus_pack" ->
      raw"""WITH t AS MATERIALIZED (
        |  SELECT lang, doc_id % 4 AS bucket, doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |      AS BIGINT) AS tokens
        |  FROM documents),
        |o AS MATERIALIZED (
        |  SELECT lang, bucket, doc_id, tokens,
        |    CAST(coalesce(sum(tokens) OVER (
        |      PARTITION BY lang, bucket ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS "offset"
        |  FROM t)
        |SELECT lang, bucket, doc_id, tokens, "offset",
        |  "offset" // 2048 AS bin, "offset" % 2048 AS bin_offset
        |FROM o ORDER BY lang, bucket, doc_id""".stripMargin
  )
}
