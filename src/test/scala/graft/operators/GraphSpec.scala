package graft.operators

import graft.SparkSpec

/** Pins `Graph.kcore`'s FIXPOINT contract on fixtures where a bounded
  * 3-round peel (the a19_kcore card shape) is provably not converged:
  * a chain unravels two endpoints per round, so depth scales with
  * chain length — exactly the case a fixed unroll silently gets
  * wrong. A Scala reference peel is the oracle. */
class GraphSpec extends SparkSpec {

  private def refKcore(edges: Set[(Long, Long)], k: Int): Set[(Long, Long)] = {
    var e = edges
    var changed = true
    while (changed) {
      val deg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2)).groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = e.filter(p => keep(p._1) && keep(p._2))
      changed = next != e
      e = next
    }
    e
  }

  // every run* helper executes BOTH the size-gated driver path (the
  // default — all fixtures are under the bound) and the distributed
  // loop (forced with driverMaxEdges = 0) and asserts they agree: the
  // gate must be a pure fast path, never a semantics change
  private def run(edges: Seq[(Long, Long)], k: Int): Set[(Long, Long)] = {
    val s = spark; import s.implicits._
    val df = edges.toDF("a", "b")
    def collect(drv: Long) = Graph.kcore(df, k, driverMaxEdges = drv)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaDriver = collect(Graph.DriverMaxEdges)
    assert(viaDriver == collect(0L), "driver and distributed kcore must agree")
    viaDriver
  }

  test("deep chain: 12-node path at k=2 needs 6 peels and ends empty") {
    val chain = (1L to 11L).map(i => (i, i + 1))
    assert(refKcore(chain.toSet, 2).isEmpty)
    assert(run(chain, 2).isEmpty)
    // bounded 3-round peel provably non-converged on this fixture:
    // round r removes only the two current endpoints
    var e = chain.toSet
    for (_ <- 1 to 3) {
      val deg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2)).groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= 2).keySet
      e = e.filter(p => keep(p._1) && keep(p._2))
    }
    assert(e.nonEmpty, "3 rounds must NOT reach fixpoint on the deep chain")
  }

  test("clique core survives while an attached deep chain peels away") {
    // K5 on nodes 100..104 (every degree 4) + a 10-node chain hanging
    // off node 100: at k=3 the chain (degrees ≤ 2) unravels over
    // several rounds, the clique is the exact 3-core
    val clique = for { i <- 100L to 104L; j <- (i + 1) to 104L } yield (i, j)
    val chain = (1L to 9L).map(i => (i, i + 1)) :+ (9L, 100L)
    val all = clique ++ chain
    val expected = refKcore(all.toSet, 3)
    assert(expected == clique.toSet)
    assert(run(all, 3) == expected)
  }

  test("already-converged input returns unchanged in one confirm round") {
    val clique = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    assert(run(clique, 3) == clique.toSet)
  }

  test("empty graph and all-peeled graph return empty") {
    val s = spark; import s.implicits._
    assert(Graph.kcore(Seq.empty[(Long, Long)].toDF("a", "b"), 2).count() == 0)
    assert(run(Seq((1L, 2L), (2L, 3L)), 5).isEmpty)
  }

  /** Brute-force hop distances from the min node (Dijkstra on unit
    * weights = BFS) as the bfsLevels oracle. */
  private def refBfs(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val src = edges.flatMap(e => Seq(e._1, e._2)).min
    var dist = Map(src -> 0L)
    var frontier = Seq(src)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(adj.getOrElse(_, Seq.empty)).distinct
        .filterNot(dist.contains)
      dist = dist ++ next.map(_ -> (dist(frontier.head) + 1))
      frontier = next
    }
    dist
  }

  private def runBfs(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark; import s.implicits._
    val df = edges.toDF("a", "b")
    def collect(drv: Long) = Graph.bfsLevels(df, driverMaxEdges = drv)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = collect(Graph.DriverMaxEdges)
    assert(viaDriver == collect(0L), "driver and distributed bfsLevels must agree")
    viaDriver
  }

  test("bfsLevels: 12-node chain from min node yields levels 0..11") {
    val chain = (1L to 11L).map(i => (i, i + 1))
    val got = runBfs(chain)
    assert(got == (1L to 12L).map(i => i -> (i - 1)).toMap)
  }

  test("bfsLevels: branches, a cycle shortcut, and an unreachable island") {
    // 0-1-2-3-4 path, shortcut 0-3 (so 3 is at level 1, 4 at level 2),
    // branch 1-10, island 50-51 (unreachable from 0 — must be absent)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L), (1L, 10L), (50L, 51L))
    val got = runBfs(edges)
    assert(got == refBfs(edges))
    assert(got == Map(0L -> 0L, 1L -> 1L, 3L -> 1L, 2L -> 2L, 4L -> 2L, 10L -> 2L))
    assert(!got.contains(50L) && !got.contains(51L))
  }

  test("bfsLevelsMulti: 4 shared-round pivots each match an independent BFS; islands reachable from their own pivot only") {
    val s = spark; import s.implicits._
    // chain 0-1-2-3-4 with branch 1-10; separate island 50-51-52: pivots
    // (4 smallest node ids) = 0, 1, 2, 3 — all in the chain component,
    // so the island must be absent from EVERY pivot's distances
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (1L, 10L), (50L, 51L), (51L, 52L))
    def collectMulti(drv: Long) =
      Graph.bfsLevelsMulti(edges.toDF("a", "b"), nSources = 4, driverMaxEdges = drv)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = collectMulti(Graph.DriverMaxEdges)
    assert(got == collectMulti(0L), "driver and distributed bfsLevelsMulti must agree")
    val srcs = got.keys.map(_._1).toSet
    assert(srcs == Set(0L, 1L, 2L, 3L))
    // per-pivot distances equal an independent single-source reference
    def ref(src: Long): Map[Long, Long] = {
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .map { case (u, es) => u -> es.map(_._2) }
      var dist = Map(src -> 0L)
      var frontier = Seq(src)
      var d = 0L
      while (frontier.nonEmpty) {
        d += 1
        val next = frontier.flatMap(adj.getOrElse(_, Seq.empty)).distinct
          .filterNot(dist.contains)
        dist = dist ++ next.map(_ -> d)
        frontier = next
      }
      dist
    }
    for (src <- srcs) {
      val mine = got.collect { case ((s0, n), l) if s0 == src => n -> l }
      assert(mine == ref(src), s"src=$src")
      assert(!mine.contains(50L) && !mine.contains(52L))
    }
  }

  /** Scala reference for SYNCHRONOUS label propagation: each round
    * every node takes its neighbors' most-frequent previous-round
    * label, ties toward the smallest. Mirrors Graph.labelPropagation's
    * declared semantics exactly (including period-2 oscillation stop). */
  private def refLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = adj.map { case (u, nbrs) =>
        val cnt = nbrs.map(labels).groupBy(identity).map { case (l, xs) => l -> xs.size }
        u -> cnt.toSeq.maxBy { case (l, c) => (c.toLong, -l) }._1
      }
    }
    labels
  }

  private def runLpa(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark; import s.implicits._
    val df = edges.toDF("a", "b")
    def collect(drv: Long) = Graph.labelPropagation(df, driverMaxEdges = drv)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = collect(Graph.DriverMaxEdges)
    assert(viaDriver == collect(0L), "driver and distributed labelPropagation must agree")
    viaDriver
  }

  test("labelPropagation: two cliques with one bridge resolve to two communities") {
    // K4 on 1..4 and K4 on 10..13, bridged 4-10. Fixpoint: each clique
    // keeps its own min label; the bridge is outvoted on both sides.
    val c1 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val c2 = for { i <- 10L to 13L; j <- (i + 1) to 13L } yield (i, j)
    val edges = c1 ++ c2 :+ (4L, 10L)
    val got = runLpa(edges)
    // converged labels must equal the synchronous reference at ANY
    // round count past convergence — iterate reference to stability
    var ref = refLpa(edges, 1); var r = 2
    while (ref != refLpa(edges, r) && r < 20) { ref = refLpa(edges, r); r += 1 }
    assert(got == ref)
    assert(got.view.filterKeys(_ <= 4L).values.toSet.size == 1)
    assert(got.view.filterKeys(_ >= 10L).values.toSet.size == 1)
    assert(got(1L) != got(10L), "cliques must land in different communities")
  }

  test("labelPropagation: star adopts the hub's neighborhood-majority label") {
    // hub 5 with leaves 1,2,3,9: leaves all see only the hub; the hub
    // sees four distinct leaf labels and tie-breaks to the minimum
    val edges = Seq((5L, 1L), (5L, 2L), (5L, 3L), (5L, 9L))
    val got = runLpa(edges)
    assert(got.keySet == Set(1L, 2L, 3L, 5L, 9L))
  }

  test("labelPropagation terminates on a single edge (period-2 oscillation)") {
    // {u,v} swap labels every synchronous round and never reach a
    // fixpoint — the operator must detect the 2-cycle and stop, not
    // exhaust maxIter
    val got = runLpa(Seq((7L, 8L)))
    assert(got.keySet == Set(7L, 8L))
    // the stop state is deterministic (round 2 == round 0, the
    // identity labeling, detected as a 2-cycle)
    assert(got == Map(7L -> 7L, 8L -> 8L))
  }

  /** Brute-force Dijkstra from the min node as the sssp oracle. */
  private def refSssp(edges: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    val adj = (edges.map { case (a, b, w) => (a, b, w) } ++
        edges.map { case (a, b, w) => (b, a, w) })
      .groupBy(_._1).map { case (u, es) => u -> es.map(e => (e._2, e._3)) }
    val src = edges.flatMap(e => Seq(e._1, e._2)).min
    var dist = Map(src -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, src))(
      Ordering.by[(Long, Long), Long](-_._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (dist(u) == d)
        adj.getOrElse(u, Seq.empty).foreach { case (v, w) =>
          if (!dist.contains(v) || d + w < dist(v)) {
            dist = dist.updated(v, d + w); pq.enqueue((d + w, v))
          }
        }
    }
    dist
  }

  private def runSssp(edges: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    val s = spark; import s.implicits._
    val df = edges.toDF("a", "b", "w")
    def collect(drv: Long) = Graph.sssp(df, driverMaxEdges = drv)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = collect(Graph.DriverMaxEdges)
    assert(viaDriver == collect(0L), "driver and distributed sssp must agree")
    viaDriver
  }

  test("sssp: a light multi-hop chain beats a heavy direct edge") {
    // 1→4 direct costs 10; 1-2-3-4 costs 2+2+2=6 — the weighted
    // answer differs from the BFS answer (which would take the direct
    // hop), which is exactly what the operator adds over bfsLevels.
    // Node 4's improvement arrives in a LATER round than its first
    // distance, so this also pins frontier re-entry.
    val edges = Seq((1L, 4L, 10L), (1L, 2L, 2L), (2L, 3L, 2L), (3L, 4L, 2L))
    val got = runSssp(edges)
    assert(got == refSssp(edges))
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 4L, 4L -> 6L))
  }

  test("sssp: cycles, zero weights, and an unreachable island") {
    val edges = Seq((0L, 1L, 5L), (1L, 2L, 0L), (2L, 0L, 1L), // cycle w/ zero edge
      (2L, 3L, 7L), (0L, 3L, 9L), (50L, 51L, 1L))             // island unreachable
    val got = runSssp(edges)
    assert(got == refSssp(edges))
    // 0→2 goes around the cycle backwards: 0-2 direct costs 1
    assert(got(2L) == 1L && got(3L) == 8L)
    assert(!got.contains(50L) && !got.contains(51L))
  }

  // ---- bounded-round helpers: driver gate == distributed unroll -----

  test("kcoreBounded: driver and distributed 3-round peels agree mid-peel") {
    val s = spark; import s.implicits._
    // the 12-node chain at k=2 is NOT converged after 3 rounds — the
    // parity must hold on a mid-peel state, not just at fixpoints
    val chain = (1L to 11L).map(i => (i, i + 1))
    val df = chain.toDF("a", "b")
    def collect(drv: Long) = Graph.kcoreBounded(df, k = 2, rounds = 3, driverMaxEdges = drv)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaDriver = collect(Graph.DriverMaxEdges)
    assert(viaDriver == collect(0L))
    assert(viaDriver.nonEmpty, "3 rounds must NOT finish the deep chain")
  }

  test("lpaBounded: driver and distributed fixed 2-round unrolls agree") {
    val s = spark; import s.implicits._
    val c1 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val c2 = for { i <- 10L to 13L; j <- (i + 1) to 13L } yield (i, j)
    val edges = (c1 ++ c2 :+ (4L, 10L)) :+ (7L, 8L) // cliques + a 2-cycle pair
    val df = edges.toDF("a", "b")
    def collect(drv: Long) = Graph.lpaBounded(df, rounds = 2, driverMaxEdges = drv)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = collect(Graph.DriverMaxEdges)
    assert(viaDriver == collect(0L))
    assert(viaDriver == refLpa(edges, 2), "2-round unroll must equal the synchronous reference")
  }

  test("rankPowerIteration: driver and distributed integer-ppm ranks agree (uniform + personalized)") {
    val s = spark; import s.implicits._
    // star + triangle + chain: mixed degrees so r div d varies by node
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 5L), (5L, 6L), (6L, 7L))
    val df = edges.toDF("a", "b")
    for (p <- Seq(false, true)) {
      def collect(drv: Long) =
        Graph.rankPowerIteration(df, rounds = 3, personalized = p, driverMaxEdges = drv)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val viaDriver = collect(Graph.DriverMaxEdges)
      assert(viaDriver == collect(0L), s"personalized=$p must agree")
      // degrees sanity: node 1 has degree 3
      assert(viaDriver(1L)._2 == 3L)
      if (p) // teleport mass returns only to the min node id (1)
        assert(viaDriver.filter(_._2._1 > 0).keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L, 6L, 7L)))
    }
  }
}
