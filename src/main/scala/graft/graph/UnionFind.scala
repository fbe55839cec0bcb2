package graft.graph

import scala.collection.mutable

/** Plain-Scala disjoint-set forest with union-by-rank + path compression.
  *
  * Semantics of the reference's serial ground truth
  * (`Serial/utils/DisjointSets.hpp:13-63`, driven by
  * `Serial/serial_cc.cpp:54-58`), reimplemented from the classic published
  * algorithm. Two roles:
  *  - the test oracle every distributed CC strategy is checked against;
  *  - the driver-local contraction step of the sampling strategy
  *    (reference analogue: master-only prefix CC,
  *    `PPoPP_2018/utils/SparseSampling.hpp:275-313`).
  *
  * Ids are arbitrary Longs (hash-mapped), not a dense range — the engine's
  * vertex ids at north-rule scale are not dense.
  */
final class UnionFind {
  private val parent = mutable.LongMap.empty[Long]
  private val rank = mutable.LongMap.empty[Int]

  def find(x: Long): Long = {
    var r = x
    while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
    // path compression
    var c = x
    while (parent.getOrElse(c, c) != r) {
      val next = parent.getOrElse(c, c)
      parent(c) = r
      c = next
    }
    r
  }

  def union(a: Long, b: Long): Boolean = {
    val ra = find(a); val rb = find(b)
    if (ra == rb) return false
    val ka = rank.getOrElse(ra, 0); val kb = rank.getOrElse(rb, 0)
    if (ka < kb) parent(ra) = rb
    else if (ka > kb) parent(rb) = ra
    else { parent(rb) = ra; rank(ra) = ka + 1 }
    true
  }

  /** All ids ever touched. */
  def ids: Iterator[Long] =
    (parent.keysIterator ++ rank.keysIterator ++ singletons.keysIterator).distinct

  private val singletons = mutable.LongMap.empty[Long]

  /** Register a vertex even if it has no edges (isolated component). */
  def touch(x: Long): Unit = { singletons(x) = x; () }
}

object UnionFind {
  /** Connected components of an edge list; returns id → canonical label,
    * canonical label = max vertex id in the component (SURVEY.md §3.5:
    * the deterministic hook-to-max fixpoint the engine reproduces exactly).
    * `vertices` may add isolated ids beyond the edge endpoints. */
  def components(edges: IterableOnce[(Long, Long)],
                 vertices: IterableOnce[Long] = Nil): mutable.LongMap[Long] = {
    val uf = new UnionFind
    edges.iterator.foreach { case (u, v) =>
      uf.touch(u); uf.touch(v)
      if (u != v) uf.union(u, v)
    }
    vertices.iterator.foreach(uf.touch)
    // canonicalize: label every vertex with the max id of its root class
    val maxOf = mutable.LongMap.empty[Long]
    val all = uf.ids.toArray
    all.foreach { v =>
      val r = uf.find(v)
      maxOf(r) = math.max(maxOf.getOrElse(r, Long.MinValue), v)
    }
    val out = mutable.LongMap.empty[Long]
    all.foreach { v => out(v) = maxOf(uf.find(v)) }
    out
  }
}
