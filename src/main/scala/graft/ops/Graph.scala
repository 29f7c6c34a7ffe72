package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window

/** Link-graph analytics for corpus curation. A web-crawl training corpus
  * carries a hyperlink (or citation / domain-reference) graph, and
  * graph-centrality scores are a standard quality/retention signal — e.g.
  * Common Crawl ranks hosts by centrality to decide crawl depth, and
  * "pages many curated pages point at" is a cheap quality prior for
  * keep/drop decisions at the corpus level.
  *
  * The operators here are iterative like [[Components]]: a FIXED number of
  * dataframe-only rounds (no per-round driver actions — the convergence
  * lesson of VERDICT r8 item 3 applied from the start), every per-round
  * value quantized to 6 dp so each iteration is engine-replayable (the
  * [[Similarity.kmeansLloyd]] rule: sums of 1e-6 multiples land far from
  * rounding boundaries, so unordered partial aggregation cannot flip the
  * rounded result).
  */
object Graph {

  /** PageRank with damping and uniform dangling-mass redistribution, run
    * for exactly `iters` rounds (fixed-iteration — the engine-replayable
    * determinization; production convergence loops stop on a rank-delta
    * threshold instead, same per-round plan).
    *
    * Semantics per round (the classic formulation):
    * {{{
    *   r'(v) = (1-d)/N  +  d * dangSum/N  +  Σ_{(u,v)∈E} round6(d * r(u)/out(u))
    * }}}
    * where `dangSum = Σ r(u) over out(u)=0` — mass parked on sinks is
    * redistributed uniformly, so total rank stays ≈ 1 and sinks do not
    * leak mass out of the system. Multi-edges count once per occurrence —
    * pre-`distinct` the edge list for simple-graph semantics.
    *
    * Distributed shape, per round: ONE shuffle join of ranks onto edges on
    * `src` (both sides hash-partitioned by the same key — the exchange is
    * reused across rounds' identical partitioning), ONE keyed aggregation
    * by `dst`, and a 1-row dangling aggregate that rides a broadcast
    * cross-join — never a driver action. At 100 TB the edge list dominates
    * and is scanned once per round with no resizing; rank state is one row
    * per node. Lineage is truncated every `checkpointInterval` rounds
    * ([[Components]]' localCheckpoint idiom) so long runs do not
    * re-plan a growing DAG.
    *
    * The ONE driver action is the setup `nodes.count()` for N (a graph
    * stat, computed once, amortized over all rounds — the
    * [[Scale.rangeShardAssign]] sample-collect regime).
    *
    * Every round's ranks are quantized to 6 dp: per-edge contributions are
    * rounded BEFORE the unordered sum (1e-6 multiples sum far from
    * rounding boundaries), so any engine replays the iteration bit-for-bit
    * from the same edge list — the x81/x88 iteration contract.
    *
    * @return one row per node: (node, out_deg, rank) after `iters` rounds
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               checkpointInterval: Int = 5): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    // The edge list is consumed EVERY round (contrib join) plus three
    // times at setup (nodes × 2, degrees) — materialize it once, or an
    // upstream build (a big join, a distinct) re-executes per iteration:
    // measured 13.6 → 10.1 s task on x92's orders×lineitem edges at 3
    // rounds, and the saving grows linearly in iters at 100 TB where the
    // edge build is the dominant scan
    val e = edges
      .filter(F.col(srcCol).isNotNull && F.col(dstCol).isNotNull)
      .select(F.col(srcCol).as("src"), F.col(dstCol).as("dst"))
      .localCheckpoint()
    val nodes = e.select(F.col("src").as("node"))
      .union(e.select(F.col("dst").as("node")))
      .distinct()
    val outDeg = e.groupBy(F.col("src").as("node"))
      .agg(F.count(F.lit(1)).as("out_deg"))
    val base = nodes.join(outDeg, Seq("node"), "left")
      .select(F.col("node"), F.coalesce(F.col("out_deg"), F.lit(0L)).as("out_deg"))
      .localCheckpoint() // setup frame reused every round — cut the build lineage
    // N: one setup action; (1-d)/N and 1/N precompute driver-side with the
    // same IEEE steps an oracle engine performs at runtime
    val n = base.count()
    require(n > 0, "pageRank: empty graph")
    val nD = n.toDouble
    // r0 = round6(1/N): quantized so the dangling sum (thousands of equal
    // addends) is association-order-stable; rounded IN THE PLAN by F.round
    // so both engines apply their native 6-dp rounding to the same double
    var ranks = base.withColumn("rank", F.round(F.lit(1.0 / nD), 6))
    var it = 0
    while (it < iters) {
      // 1-row dangling mass; sum of 6-dp multiples rounded to kill
      // association-order ulp drift, NULL (no sinks) → 0.0
      val dang = ranks.filter(F.col("out_deg") === 0L)
        .agg(F.round(F.sum("rank"), 6).as("__dang"))
      val contribs = e.join(
          ranks.select(F.col("node").as("src"), F.col("out_deg"), F.col("rank")),
          "src")
        .groupBy(F.col("dst").as("node"))
        // per-EDGE quantization rides the floor form (Quant.halfUp) —
        // F.round's BigDecimal per edge per round was pure overhead;
        // grid values identical, x92 re-pinned hash-green at 3 SFs
        .agg(F.round(F.sum(
          Quant.halfUp(F.lit(damping) * F.col("rank") / F.col("out_deg"), 6)), 6).as("__cs"))
      val next = base.join(contribs, Seq("node"), "left")
        .crossJoin(F.broadcast(dang))
        .select(F.col("node"), F.col("out_deg"),
          F.round(
            F.lit((1.0 - damping) / nD) +
              F.lit(damping) * F.coalesce(F.col("__dang"), F.lit(0.0)) / F.lit(nD) +
              F.coalesce(F.col("__cs"), F.lit(0.0)),
            6).as("rank"))
      ranks =
        if ((it + 1) % checkpointInterval == 0) next.localCheckpoint()
        else next
      it += 1
    }
    ranks
  }

  /** Personalized PageRank (random walk with restart, Haveliwala 2002)
    * — [[pageRank]] with the teleport concentrated on a SEED SET
    * instead of uniform: the stationary mass measures proximity TO THE
    * SEEDS, which is the graph-expansion primitive of data curation
    * ("given these known-good documents/suppliers/users, rank
    * everything by closeness") and of seed-set community detection.
    * {{{
    *   r_{t+1}(v) = (1−d)·t(v) + d·(Σ_{u→v} r_t(u)/deg(u)
    *                              + dangling·t(v))
    * }}}
    * with t = 1/k on the k seeds, 0 elsewhere (dangling mass restarts
    * at the seeds, the standard RWR convention).
    *
    * Seeds are the k smallest md5(node) hashes — deterministic,
    * engine-replayable, hash-spread (the [[landmarkDistances]] pick);
    * callers with REAL seed sets pass them via `seedFilter` instead.
    * Numerics follow [[pageRank]] verbatim: 6-dp quantized ranks per
    * round (association-order-stable sums), per-edge contributions on
    * the [[Quant.halfUp]] floor form, one regs⋈edges join + keyed
    * rollup per round, zero per-round driver actions,
    * localCheckpoint-truncated lineage.
    *
    * @param nSeeds     hash-chosen seed count (ignored when
    *                   `seedFilter` is given)
    * @param seedFilter optional predicate over `node` selecting the
    *                   seed set explicitly
    * @return (node, out_deg, seed, rank) — rank 6-dp, seed 0/1;
    *         ordered by (rank desc, node)
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
                           dstCol: String, iters: Int, nSeeds: Int = 4,
                           damping: Double = 0.85,
                           seedFilter: Option[Column] = None,
                           checkpointInterval: Int = 5): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(nSeeds >= 1 && nSeeds <= 1024,
      s"nSeeds must be in [1,1024], got $nSeeds")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    val e = edges
      .filter(F.col(srcCol).isNotNull && F.col(dstCol).isNotNull)
      .select(F.col(srcCol).as("src"), F.col(dstCol).as("dst"))
      .localCheckpoint()
    val nodes = e.select(F.col("src").as("node"))
      .union(e.select(F.col("dst").as("node")))
      .distinct()
    val outDeg = e.groupBy(F.col("src").as("node"))
      .agg(F.count(F.lit(1)).as("out_deg"))
    val seeds = seedFilter match {
      case Some(p) => nodes.filter(p).select(F.col("node"))
      case None => nodes
        .withColumn("__h", F.md5(F.col("node").cast("string")))
        .orderBy(F.col("__h"), F.col("node")).limit(nSeeds)
        .select(F.col("node"))
    }
    val base = nodes.join(outDeg, Seq("node"), "left")
      .join(F.broadcast(seeds.withColumn("__s", F.lit(1))),
        Seq("node"), "left")
      .select(F.col("node"),
        F.coalesce(F.col("out_deg"), F.lit(0L)).as("out_deg"),
        F.coalesce(F.col("__s"), F.lit(0)).as("seed"))
      .localCheckpoint()
    val k = base.filter(F.col("seed") === 1).count()
    require(k > 0, "personalizedPageRank: empty seed set")
    // t(v): 6-dp quantized seed mass, the r0 = teleport start
    val tp = F.when(F.col("seed") === 1,
      F.round(F.lit(1.0 / k.toDouble), 6)).otherwise(F.lit(0.0))
    var ranks = base.withColumn("rank", tp)
    var it = 0
    while (it < iters) {
      val dang = ranks.filter(F.col("out_deg") === 0L)
        .agg(F.round(F.sum("rank"), 6).as("__dang"))
      val contribs = e.join(
          ranks.select(F.col("node").as("src"), F.col("out_deg"),
            F.col("rank")), "src")
        .groupBy(F.col("dst").as("node"))
        .agg(F.round(F.sum(
          Quant.halfUp(F.lit(damping) * F.col("rank") / F.col("out_deg"),
            6)), 6).as("__cs"))
      val next = base.join(contribs, Seq("node"), "left")
        .crossJoin(F.broadcast(dang))
        .select(F.col("node"), F.col("out_deg"), F.col("seed"),
          F.round(
            F.lit(1.0 - damping) * tp +
              F.lit(damping) * F.coalesce(F.col("__dang"), F.lit(0.0)) * tp +
              F.coalesce(F.col("__cs"), F.lit(0.0)),
            6).as("rank"))
      ranks =
        if ((it + 1) % checkpointInterval == 0) next.localCheckpoint()
        else next
      it += 1
    }
    ranks.select("node", "out_deg", "seed", "rank")
      .orderBy(F.col("rank").desc, F.col("node"))
  }

  /** Per-node triangle counts by degree-ordered orientation (the
    * MapReduce triangle algorithm of Suri & Vassilvitskii 2011): clustering
    * structure for a co-occurrence / link graph — the local clustering
    * signal behind community-quality and spam-farm detection on crawl
    * graphs.
    *
    * Input is an undirected edge list (either direction, duplicates fine);
    * it is canonicalized to distinct a<b pairs. Each edge is then ORIENTED
    * from its lower-(degree, id) endpoint to the higher one. Orientation is
    * the whole algorithm: every wedge `u→v, u→w` is generated at a node u
    * whose oriented out-degree is bounded by O(√m) on any graph (the
    * arboricity bound), so the wedge join — the step that goes quadratic
    * in naive enumeration on a hub node — is bounded by m^1.5 TOTAL
    * regardless of degree skew. A 10M-follower hub generates ZERO wedges;
    * its triangles are counted at their two low-degree corners.
    *
    * Plan shape: one distinct (one shuffle), one degree rollup, the wedge
    * self-join on the oriented source, and one equi-join of wedges back
    * onto oriented edges; per-corner counts then roll up with a map-side
    * partial. All integer keys and counts — engine-replayable exactly.
    *
    * @return (node, n_tri) — one row per node appearing in any edge
    */
  /** Co-occurrence edge list: items sharing a group (suppliers in an
    * order, tokens in a doc, hosts in a session) become an edge when they
    * co-occur in at least `minCount` distinct groups. The `minCount`
    * support threshold is the density control that keeps the graph (and
    * any downstream wedge join) sparse when the grouping is promiscuous —
    * raising it is the first lever when [[triangleCounts]] gets expensive.
    * Shape: one distinct, one self-equi-join on the group key (bucket
    * sizes = group fan-out), one keyed rollup. */
  def cooccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        minCount: Int = 1): DataFrame = {
    // one shuffle to the per-group distinct item set (collect_set is
    // bounded by group fan-out — an order's line count, a doc's token
    // count; a promiscuous grouping belongs behind a cap upstream), pair
    // expansion as a codegen'd HOF over the sorted array (i<j, so pairs
    // are canonical src<dst by construction), then one keyed census.
    // Two shuffles total where distinct + self-join + census costs three.
    val sets = df
      .groupBy(F.col(groupCol).as("__g"))
      .agg(F.sort_array(F.collect_set(F.col(itemCol))).as("__is"))
    sets
      .select(F.explode(F.flatten(F.transform(F.col("__is"), (x, i) =>
        F.transform(
          F.slice(F.col("__is"), i + F.lit(2), F.size(F.col("__is"))),
          y => F.struct(x.as("src"), y.as("dst")))))).as("__p"))
      .groupBy(F.col("__p.src").as("src"), F.col("__p.dst").as("dst"))
      .agg(F.count(F.lit(1)).as("w"))
      .filter(F.col("w") >= minCount)
  }

  /** Canonical undirected edge list: (min, max) pairs, self-loops
    * dropped, deduped — the shared prelude of every triangle-family op. */
  private def canonicalUndirected(edges: DataFrame, srcCol: String,
                                  dstCol: String): DataFrame =
    edges
      .select(F.least(F.col(srcCol), F.col(dstCol)).as("a"),
        F.greatest(F.col(srcCol), F.col(dstCol)).as("b"))
      .filter(F.col("a") =!= F.col("b"))
      .distinct()

  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    triangleCountsCanon(canonicalUndirected(edges, srcCol, dstCol))

  /** [[triangleCounts]] body, starting from an already-canonical edge
    * list — callers that also need degrees ([[localClustering]]) pass a
    * localCheckpoint'd `und` so the upstream edge build (often a corpus
    * pair-explode) executes ONCE, not once per consumer. */
  private def triangleCountsCanon(und: DataFrame): DataFrame = {
    val tris = orientedTriangles(und)
    tris.select(F.col("u").as("node"))
      .unionAll(tris.select(F.col("v").as("node")))
      .unionAll(tris.select(F.col("w").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("n_tri"))
  }

  /** Degree-ordered oriented triangle enumeration — every triangle of
    * the canonical edge list EXACTLY ONCE as (u, v, w) with v < w (u is
    * the triangle's unique source under the (deg, id) acyclic
    * orientation). The m^1.5-bounded wedge join shared by
    * [[triangleCounts]] and [[edgeSupportCensus]]: wedges form only at
    * each edge's low-degree endpoint, so a hub generates ZERO wedges —
    * the skew-killer an unoriented Σ deg² adjacency self-join lacks
    * (VERDICT r13 #2). */
  private def orientedTriangles(und: DataFrame): DataFrame = {
    val deg = und.select(F.col("a").as("node"))
      .unionAll(und.select(F.col("b").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("deg"))
    // orient each canonical edge from its (deg, id)-smaller endpoint
    val withDeg = und
      .join(deg.select(F.col("node").as("a"), F.col("deg").as("__da")), "a")
      .join(deg.select(F.col("node").as("b"), F.col("deg").as("__db")), "b")
    // oriented is referenced FOUR times downstream (both wedge sides +
    // both closing-probe directions); without truncation Catalyst replays
    // the whole edge-build + degree join per reference — localCheckpoint
    // materializes the (tiny) oriented edge list once, the pageRank idiom
    val oriented = withDeg.select(
      F.when(F.col("__da") < F.col("__db") ||
          (F.col("__da") === F.col("__db") && F.col("a") < F.col("b")),
          F.col("a")).otherwise(F.col("b")).as("lo"),
      F.when(F.col("__da") < F.col("__db") ||
          (F.col("__da") === F.col("__db") && F.col("a") < F.col("b")),
          F.col("b")).otherwise(F.col("a")).as("hi"))
      .localCheckpoint()
    // wedges at the low-degree corner; v < w dedupes the unordered pair
    val wedges = oriented.select(F.col("lo").as("u"), F.col("hi").as("v"))
      .join(oriented.select(F.col("lo").as("u"), F.col("hi").as("w")), "u")
      .filter(F.col("v") < F.col("w"))
    // close the wedge: the (v, w) side is also oriented low→high on
    // (deg, id), but v<w is plain id order — probe both directions
    // unionAll is POSITIONAL: the reversed direction must put hi first so
    // it lands in the v slot, not silently duplicate the forward branch
    wedges
      .join(oriented.select(F.col("lo").as("v"), F.col("hi").as("w"))
          .unionAll(oriented.select(F.col("hi").as("v"), F.col("lo").as("w"))),
        Seq("v", "w"))
  }

  /** Local clustering coefficient census + global transitivity — "is
    * this node's neighborhood a clique or a star" ([[triangleCounts]]
    * says how many triangles; this normalizes by the possible wedges):
    * {{{
    *   lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)),
    *   transitivity = Σtri / Σ(deg(deg−1)/2) = 3·closed/all triads
    * }}}
    * Both are single IEEE divisions of exact longs. Degree-1 nodes get
    * lcc = 0 (the networkx convention).
    *
    * Scale shape: [[triangleCounts]]'s oriented-wedge join does the
    * heavy lifting; the census adds one degree rollup and a broadcast
    * of the 1-row global readout. The canonical edge list is
    * localCheckpoint'd once and shared by both passes — the upstream
    * edge build (a corpus pair-explode) executes exactly once.
    *
    * @return per node (node, deg, n_tri, lcc, avg_lcc, transitivity)
    *         ordered by node — 6-dp
    */
  def localClustering(edges: DataFrame, srcCol: String,
                      dstCol: String): DataFrame = {
    // materialize the canonical edge list once: the degree rollup AND
    // the triangle pass both start here, and the upstream edge build
    // (x300: the lineitem co-purchase pair-explode) must not run twice
    val und = canonicalUndirected(edges, srcCol, dstCol).localCheckpoint()
    val deg = und.select(F.col("a").as("node"))
      .unionAll(und.select(F.col("b").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("deg"))
    val tri = triangleCountsCanon(und)
    val nodes = deg.join(tri, Seq("node"), "left")
      .withColumn("n_tri", F.coalesce(F.col("n_tri"), F.lit(0L)))
      .withColumn("lcc", F.round(F.when(F.col("deg") >= 2L,
        (F.lit(2L) * F.col("n_tri")).cast("double") /
          (F.col("deg") * (F.col("deg") - 1L)).cast("double"))
        .otherwise(0.0), 6))
    val g = nodes.agg(F.round(F.avg("lcc"), 6).as("avg_lcc"),
      F.round((F.lit(2L) * F.sum("n_tri")).cast("double") /
        F.nullif(F.sum(F.col("deg") * (F.col("deg") - 1L)).cast("double"),
          F.lit(0.0)), 6).as("transitivity"))
    nodes.crossJoin(F.broadcast(g))
      .select("node", "deg", "n_tri", "lcc", "avg_lcc", "transitivity")
      .orderBy("node")
  }

  /** HITS hubs & authorities (Kleinberg 1999) on a bipartite edge list
    * — WHO aggregates broadly (hub customers touching many strong
    * parts) and WHAT is broadly demanded (authority parts held by
    * strong hubs); degree alone can't separate the two roles:
    * {{{
    *   h(u) = Σ_{(u,p)∈E} a(p),   a(p) = Σ_{(u,p)∈E} h(u)
    * }}}
    * iterated `rounds` times with MAX-normalization (the engine-exact
    * determinization: one broadcast max, one division — no Σ² ladder)
    * and 9-dp quantization per half-step.
    *
    * Scale shape: the [[pageRank]] discipline — each half-round is one
    * keyed join + one partial-aggregated rollup over the (deduped,
    * localCheckpoint'd) edge list; scores live keyed on nodes, never on
    * the driver.
    *
    * @return (kind 'hub'|'auth', id, score, rk) — per kind, `topK` rows
    *         by score desc (tie: id asc), 6-dp
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           rounds: Int = 2, topK: Int = 20): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(F.col(srcCol).as("u"), F.col(dstCol).as("p"))
      .distinct().localCheckpoint()
    def norm9(df: DataFrame, c: String): DataFrame = {
      val m = df.agg(F.max(c).as("__m"))
      df.crossJoin(F.broadcast(m))
        .select(df.columns.filter(_ != c).map(F.col) :+
          Quant.halfUp(F.col(c) / F.nullif(F.col("__m"), F.lit(0.0)), 9)
            .as(c): _*)
    }
    var auth = e.select(F.col("p")).distinct()
      .withColumn("a", F.lit(1.0))
    var hub: DataFrame = null
    var it = 0
    while (it < rounds) {
      hub = norm9(e.join(auth, Seq("p"))
        .groupBy("u").agg(F.sum("a").as("h")), "h")
        .localCheckpoint()
      auth = norm9(e.join(hub, Seq("u"))
        .groupBy("p").agg(F.sum("h").as("a")), "a")
        .localCheckpoint()
      it += 1
    }
    val hTop = hub
      .withColumn("rk", F.row_number().over(
        Window.orderBy(F.col("h").desc, F.col("u"))))
      .filter(F.col("rk") <= topK)
      .select(F.lit("hub").as("kind"), F.col("u").as("id"),
        F.round(F.col("h"), 6).as("score"), F.col("rk"))
    val aTop = auth
      .withColumn("rk", F.row_number().over(
        Window.orderBy(F.col("a").desc, F.col("p"))))
      .filter(F.col("rk") <= topK)
      .select(F.lit("auth").as("kind"), F.col("p").as("id"),
        F.round(F.col("a"), 6).as("score"), F.col("rk"))
    hTop.unionAll(aTop).orderBy("kind", "rk")
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over the (symmetrized) edge list — positive means
    * hubs link to hubs (social-graph shape), negative means hubs link to
    * leaves (hub-and-spoke / spam-farm shape). A one-number health check
    * for a crawl or co-occurrence graph next to [[triangleCounts]].
    *
    * Degrees are one keyed count over both endpoint columns; each edge
    * joins its two endpoint degrees (degree table keyed-joined twice) and
    * BOTH orientations enter the correlation (the standard undirected
    * convention — the sums are then symmetric, so dx = dy). Integer
    * degrees make every sum exact; r is the [[graft.ops.Stats.corrPairs]]
    * tree. Self-loops are dropped (they distort degree correlation).
    *
    * @return one row: (n_edges, r) — n_edges counts each undirected edge
    *         once; r NULL on a degree-regular graph (zero variance)
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val e = edges
      .select(F.col(srcCol).as("s"), F.col(dstCol).as("d"))
      .filter(F.col("s") =!= F.col("d"))
      .distinct()
    val deg = e.select(F.col("s").as("n")).unionAll(e.select(F.col("d").as("n")))
      .groupBy("n").agg(F.count(F.lit(1)).as("deg"))
    val both = e
      .join(deg.select(F.col("n").as("s"), F.col("deg").as("__da")), "s")
      .join(deg.select(F.col("n").as("d"), F.col("deg").as("__db")), "d")
      .select(F.col("__da").as("x"), F.col("__db").as("y"))
    val sym = both.unionAll(both.select(F.col("y").as("x"), F.col("x").as("y")))
    val agg = sym.agg(
      F.count(F.lit(1)).cast("double").as("__n"),
      F.sum(F.col("x").cast("double")).as("__sx"),
      F.sum(F.col("y").cast("double")).as("__sy"),
      F.sum(F.col("x").cast("double") * F.col("x").cast("double")).as("__sxx"),
      F.sum(F.col("y").cast("double") * F.col("y").cast("double")).as("__syy"),
      F.sum(F.col("x").cast("double") * F.col("y").cast("double")).as("__sxy"))
    val n = F.col("__n")
    val dx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    val dy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    val cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    agg.select((n / 2.0).cast("long").as("n_edges"),
      F.when(dx * dy > 0.0, F.round(cov / F.sqrt(dx * dy), 6)).as("r"))
  }

  /** k-core decomposition by iterative peeling — the standard "dense,
    * mutually-connected kernel" extractor (spam-farm / boilerplate-hub
    * detection on link graphs; community cores on co-occurrence graphs):
    * repeatedly delete every node with degree < k until none remains.
    * Runs EXACTLY `rounds` peels (fixed-iteration, the [[pageRank]]
    * engine-replayable convention — the oracle unrolls the same rounds);
    * peeling converges in at most the graph's degeneracy-ordering depth,
    * so a handful of rounds settles real graphs, and unconverged output
    * is still well-defined (the round-`rounds` survivor set).
    *
    * Scale shape: each round is one degree rollup (map-side partial) and
    * two semi-joins, checkpointed so round r+1 scans round r's survivor
    * edges, never the original corpus again — work SHRINKS monotonically.
    * Driver state: nothing but the loop counter.
    *
    * @return surviving (node, degree) — degree within the surviving
    *         subgraph — ordered by node
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            rounds: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1 && rounds <= 64,
      s"rounds must be in [1,64], got $rounds")
    var e = edges
      .select(F.col(srcCol).cast("long").as("__a"),
        F.col(dstCol).cast("long").as("__b"))
      .filter(F.col("__a") =!= F.col("__b"))
      .select(F.least(F.col("__a"), F.col("__b")).as("__a"),
        F.greatest(F.col("__a"), F.col("__b")).as("__b"))
      .distinct()
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      val deg = e.select(F.col("__a").as("__n"))
        .unionAll(e.select(F.col("__b").as("__n")))
        .groupBy("__n").agg(F.count(F.lit(1)).as("__d"))
      val keep = deg.filter(F.col("__d") >= k).select("__n")
      e = e
        .join(keep.select(F.col("__n").as("__a")), Seq("__a"), "left_semi")
        .join(keep.select(F.col("__n").as("__b")), Seq("__b"), "left_semi")
        .localCheckpoint()
    }
    e.select(F.col("__a").as("node"))
      .unionAll(e.select(F.col("__b").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("degree"))
      .orderBy("node")
  }

  /** Newman modularity Q of a GIVEN node partition — "how much more of
    * the graph's edge mass falls inside these communities than a random
    * rewiring with the same degrees would put there":
    * {{{
    *   Q = Σ_c e_c/m − Σ_c (d_c / 2m)²     ∈ [−½, 1)
    * }}}
    * (e_c intra-community edges, d_c total degree of community c, m
    * total edges). This is the community-QUALITY readout to pair with
    * any partitioner — connected components, an external label (domain,
    * language, nation), a clustering. Every sufficient statistic
    * (m, Σe_c, Σd_c²) is an exact long, so Q is two divisions.
    *
    * Edges whose endpoint has no community row drop (inner join) — feed
    * a complete assignment. Self-loops and duplicate/reversed edges are
    * canonicalized away.
    *
    * Scale shape: two broadcast-able dimension joins onto the edge list,
    * one community-bounded rollup, one endpoint-census rollup. No
    * windows, no iteration.
    *
    * @return one row (k_comms, m, intra, q) — q 6-dp
    */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 comm: DataFrame, nodeCol: String,
                 commCol: String): DataFrame = {
    val e = edges
      .select(F.least(F.col(srcCol), F.col(dstCol)).as("__a"),
        F.greatest(F.col(srcCol), F.col(dstCol)).as("__b"))
      .filter(F.col("__a") =!= F.col("__b"))
      .distinct()
    val cm = comm.select(F.col(nodeCol).as("__n"),
      F.col(commCol).cast("string").as("__cm"))
    val j = e
      .join(F.broadcast(cm.select(F.col("__n").as("__a"),
        F.col("__cm").as("__c1"))), Seq("__a"))
      .join(F.broadcast(cm.select(F.col("__n").as("__b"),
        F.col("__cm").as("__c2"))), Seq("__b"))
    val tot = j.agg(F.count(F.lit(1)).as("m"),
      F.sum(F.when(F.col("__c1") === F.col("__c2"), 1L).otherwise(0L))
        .as("intra"))
    val dsum = j.select(F.col("__c1").as("__cc"))
      .unionAll(j.select(F.col("__c2").as("__cc")))
      .groupBy("__cc").agg(F.count(F.lit(1)).as("__d"))
      .agg(F.count(F.lit(1)).as("k_comms"),
        F.sum(F.col("__d") * F.col("__d")).as("__sd2"))
    dsum.crossJoin(F.broadcast(tot))
      .select(F.col("k_comms"), F.col("m"), F.col("intra"),
        F.round(F.col("intra").cast("double") / F.col("m").cast("double") -
          F.col("__sd2").cast("double") /
            (F.lit(4L) * F.col("m") * F.col("m")).cast("double"), 6)
          .as("q"))
  }

  /** Moran's I — network autocorrelation of a node attribute over the
    * edge structure ("do connected suppliers have similar balances"; the
    * graph analog of lag-1 autocorrelation, and the standard spatial-
    * statistics readout with binary edge weights):
    * {{{
    *   I = (n / 2m) · Σ_{(a,b)∈E, both dirs} (x_a−x̄)(x_b−x̄) / Σ(x_a−x̄)²
    * }}}
    * Under no autocorrelation E[I] = −1/(n−1) (emitted as `e_i`).
    * Defined over the nodes that carry both an edge and an attribute
    * row; values quantized (×scale) so the cross-products are exact-long
    * sums — the centered form expands to (P − x̄·S_e + m·x̄²)/… with P,
    * S_e, T, Σx² all integers.
    *
    * Scale shape: one attribute join onto the edge list (broadcast-able
    * dim), two one-row rollups; no windows.
    *
    * @return one row (n, m, i, e_i) — 6-dp
    */
  def moransI(edges: DataFrame, srcCol: String, dstCol: String,
              attrs: DataFrame, nodeCol: String, valueCol: Column,
              scale: Long = 100L): DataFrame = {
    val e = edges
      .select(F.least(F.col(srcCol), F.col(dstCol)).as("__a"),
        F.greatest(F.col(srcCol), F.col(dstCol)).as("__b"))
      .filter(F.col("__a") =!= F.col("__b"))
      .distinct()
    val at = attrs.select(F.col(nodeCol).as("__n"),
      F.round(valueCol.cast("double") * scale).cast("long").as("__x"))
      .filter(F.col("__x").isNotNull)
    val nodesInG = e.select(F.col("__a").as("__n"))
      .unionAll(e.select(F.col("__b").as("__n"))).distinct()
    val nd = at.join(nodesInG, Seq("__n"), "left_semi")
    val one = nd.agg(F.count(F.lit(1)).as("n"), F.sum("__x").as("__t"),
      F.sum(F.col("__x") * F.col("__x")).as("__s2"))
    val je = e
      .join(F.broadcast(nd.select(F.col("__n").as("__a"),
        F.col("__x").as("__xa"))), Seq("__a"))
      .join(F.broadcast(nd.select(F.col("__n").as("__b"),
        F.col("__x").as("__xb"))), Seq("__b"))
    val pe = je.agg(F.count(F.lit(1)).as("m"),
      F.sum(F.col("__xa") * F.col("__xb")).as("__p"),
      F.sum(F.col("__xa") + F.col("__xb")).as("__se"))
    val row = one.crossJoin(F.broadcast(pe))
    val nD = F.col("n").cast("double")
    val xbar = F.col("__t").cast("double") / nD
    val den = F.col("__s2").cast("double") -
      F.col("__t").cast("double") * xbar
    val cross = F.col("__p").cast("double") - xbar *
      F.col("__se").cast("double") + F.col("m").cast("double") *
      xbar * xbar
    row.select(F.col("n"), F.col("m"),
      F.round(nD * cross /
        F.nullif(F.col("m").cast("double") * den, F.lit(0.0)), 6)
        .as("i"),
      F.round(F.lit(-1.0) /
        F.nullif(nD - 1.0, F.lit(0.0)), 6).as("e_i"))
  }

  /** Geary's C spatial autocorrelation — the LOCAL-contrast sibling of
    * [[moransI]] (Geary 1954): where Moran's I cross-multiplies
    * deviations from the mean (global clustering), Geary's C sums the
    * SQUARED DIFFERENCE across each edge, so it is dominated by
    * nearest-neighbour contrast and reacts to local pockets I smooths
    * over. Over the undirected graph with m unordered edges and the
    * usual binary weights:
    * {{{
    *   C = (n−1) · Σ_{(a,b)∈E} (x_a − x_b)² / (2m · Σ_i (x_i − x̄)²)
    * }}}
    * E[C] = 1 under no autocorrelation; C < 1 = positive autocorrelation
    * (neighbours alike), C > 1 = negative. Defined over nodes carrying
    * both an edge and an attribute row; values quantized (×scale) so the
    * edge-difference squares and Σx² are exact-long sums — only the final
    * ratio touches IEEE arithmetic, bit-identical cross-engine.
    *
    * Scale shape: identical to [[moransI]] — one attribute join onto the
    * edge list (broadcast-able dim), two one-row rollups; no windows.
    *
    * @return one row (n, m, c, e_c) — 6-dp; c NULL when the attribute is
    *         constant (zero variance) or the graph has no edges
    */
  def gearyC(edges: DataFrame, srcCol: String, dstCol: String,
             attrs: DataFrame, nodeCol: String, valueCol: Column,
             scale: Long = 100L): DataFrame = {
    val e = edges
      .select(F.least(F.col(srcCol), F.col(dstCol)).as("__a"),
        F.greatest(F.col(srcCol), F.col(dstCol)).as("__b"))
      .filter(F.col("__a") =!= F.col("__b"))
      .distinct()
    val at = attrs.select(F.col(nodeCol).as("__n"),
      F.round(valueCol.cast("double") * scale).cast("long").as("__x"))
      .filter(F.col("__x").isNotNull)
    val nodesInG = e.select(F.col("__a").as("__n"))
      .unionAll(e.select(F.col("__b").as("__n"))).distinct()
    val nd = at.join(nodesInG, Seq("__n"), "left_semi")
    val one = nd.agg(F.count(F.lit(1)).as("n"), F.sum("__x").as("__t"),
      F.sum(F.col("__x") * F.col("__x")).as("__s2"))
    val je = e
      .join(F.broadcast(nd.select(F.col("__n").as("__a"),
        F.col("__x").as("__xa"))), Seq("__a"))
      .join(F.broadcast(nd.select(F.col("__n").as("__b"),
        F.col("__x").as("__xb"))), Seq("__b"))
    val pe = je.agg(F.count(F.lit(1)).as("m"),
      F.sum((F.col("__xa") - F.col("__xb")) *
        (F.col("__xa") - F.col("__xb"))).as("__ss"))
    val row = one.crossJoin(F.broadcast(pe))
    val nD = F.col("n").cast("double")
    val xbar = F.col("__t").cast("double") / nD
    val den = F.col("__s2").cast("double") -
      F.col("__t").cast("double") * xbar
    row.select(F.col("n"), F.col("m"),
      F.round((nD - 1.0) * F.col("__ss").cast("double") /
        F.nullif(F.lit(2.0) * F.col("m").cast("double") * den,
          F.lit(0.0)), 6).as("c"),
      F.lit(1.0).as("e_c"))
  }

  /** Link-prediction scores over NON-adjacent node pairs — the classic
    * local-similarity trio (Liben-Nowell & Kleinberg 2003): common
    * neighbors, Adamic–Adar `Σ_z 1/ln(deg z)` (rare shared neighbors
    * weigh more), and resource allocation `Σ_z 1/deg z` (the stronger
    * degree-penalty variant). The "which edge appears next" primitive —
    * in a pipeline, which suppliers/documents are about to co-occur, or
    * which near-dup clusters are one step from merging.
    *
    * Candidate pairs come from the [[triangleCounts]] wedge machinery:
    * both adjacency directions joined through the shared neighbor z, so
    * only pairs with ≥ 1 common neighbor ever materialize (never
    * all-pairs); existing edges drop via one anti-join. Per-z terms
    * round 9 dp before the orderless sums; cn and the Jaccard
    * denominator are exact longs.
    *
    * Scale shape: the wedge join is bounded by Σ deg² like every
    * triangle-family op (hub guard belongs upstream in the edge build);
    * degrees ride broadcast-able dim joins; top-N by a total order.
    *
    * @return top `topN` rows (u, v, cn, jaccard, aa, ra) by (aa desc,
    *         u, v) — 6-dp
    */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
                     topN: Int = 20): DataFrame = {
    val und = canonicalUndirected(edges, srcCol, dstCol).localCheckpoint()
    val adj = und.select(F.col("a").as("__z"), F.col("b").as("__n"))
      .unionAll(und.select(F.col("b").as("__z"), F.col("a").as("__n")))
    val deg = adj.groupBy(F.col("__z").as("node"))
      .agg(F.count(F.lit(1)).as("deg"))
    // wedges u−z−v with u<v: every candidate pair shares neighbor z
    val wedges = adj.select(F.col("__z"), F.col("__n").as("u"))
      .join(adj.select(F.col("__z"), F.col("__n").as("v")), Seq("__z"))
      .filter(F.col("u") < F.col("v"))
      .join(F.broadcast(deg.select(F.col("node").as("__z"),
        F.col("deg").as("__dz"))), Seq("__z"))
    val scored = wedges.groupBy("u", "v")
      .agg(F.count(F.lit(1)).as("cn"),
        // per-WEDGE quantization on the floor form (Quant.halfUp):
        // F.round's BigDecimal at wedge scale was pure overhead; grid
        // values identical, x330 re-pinned hash-green at 3 SFs
        F.sum(Quant.halfUp(F.lit(1.0) /
          F.log(F.col("__dz").cast("double")), 9)).as("aa"),
        F.sum(Quant.halfUp(F.lit(1.0) / F.col("__dz").cast("double"), 9))
          .as("ra"))
      // drop pairs that are already edges — predict only NEW links
      .join(und.select(F.col("a").as("u"), F.col("b").as("v")),
        Seq("u", "v"), "left_anti")
      .join(F.broadcast(deg.select(F.col("node").as("u"),
        F.col("deg").as("__du"))), Seq("u"))
      .join(F.broadcast(deg.select(F.col("node").as("v"),
        F.col("deg").as("__dv"))), Seq("v"))
    scored
      .select(F.col("u"), F.col("v"), F.col("cn"),
        F.round(F.col("cn").cast("double") /
          (F.col("__du") + F.col("__dv") - F.col("cn")).cast("double"),
          6).as("jaccard"),
        F.round(F.col("aa"), 6).as("aa"),
        F.round(F.col("ra"), 6).as("ra"))
      .orderBy(F.col("aa").desc, F.col("u"), F.col("v"))
      .limit(topN)
  }

  /** Hop-bounded harmonic centrality, radius 2 —
    * {{{ H₂(v) = deg(v) + |N₂(v)| / 2 }}}
    * (distance-1 neighbors contribute 1 each, distance-exactly-2
    * contribute ½). The "how much of the graph is CLOSE to v" read
    * that degree alone misses: a node bridging two hubs out-scores a
    * leaf hanging off one. Radius 2 is the scale contract — full
    * closeness/harmonic centrality needs all-pairs BFS (quadratic
    * state at corpus scale); two hops reuse [[linkPrediction]]'s
    * wedge join and stay Σdeg²-bounded, and on small-world graphs two
    * hops already separate core from periphery.
    *
    * Determinism: every count exact (distinct 2-hop set via wedge +
    * anti-join on edges + self-drop); H₂ is one exact half-sum.
    *
    * Scale shape: one wedge join (Σ deg², the triangle-family bound),
    * one distinct, one anti-join; top-N by a total order.
    *
    * @return top `topN` rows (node, deg, n2, h2) by (h2 desc, node) —
    *         h2 exact half-integer
    */
  def harmonic2(edges: DataFrame, srcCol: String, dstCol: String,
                topN: Int = 20): DataFrame = {
    val und = canonicalUndirected(edges, srcCol, dstCol).localCheckpoint()
    val adj = und.select(F.col("a").as("__z"), F.col("b").as("__n"))
      .unionAll(und.select(F.col("b").as("__z"), F.col("a").as("__n")))
    val deg = adj.groupBy(F.col("__z").as("node"))
      .agg(F.count(F.lit(1)).as("deg"))
    // distance-exactly-2: neighbors-of-neighbors, minus self, minus
    // direct neighbors (anti-join works on canonical a<b pairs)
    val two = adj.select(F.col("__z").as("__mid"), F.col("__n").as("u"))
      .join(adj.select(F.col("__z").as("__mid"), F.col("__n").as("w")),
        Seq("__mid"))
      .filter(F.col("u") =!= F.col("w"))
      .select(F.least(F.col("u"), F.col("w")).as("a"),
        F.greatest(F.col("u"), F.col("w")).as("b"))
      .distinct()
      .join(und, Seq("a", "b"), "left_anti")
    val n2 = two.select(F.col("a").as("node"))
      .unionAll(two.select(F.col("b").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("n2"))
    deg.join(n2, Seq("node"), "left_outer")
      .withColumn("n2", F.coalesce(F.col("n2"), F.lit(0L)))
      .withColumn("h2", F.col("deg").cast("double") +
        F.col("n2").cast("double") / 2.0)
      .orderBy(F.col("h2").desc, F.col("node"))
      .limit(topN)
  }

  /** Edge-support census — for every edge, the number of triangles it
    * participates in (its SUPPORT, the k-truss quantity), rolled into
    * a support histogram with the local-bridge share. Support-0 edges
    * are LOCAL BRIDGES (endpoints share no neighbor — Granovetter's
    * weak ties): a co-occurrence graph that is mostly bridges is a
    * chain of accidents, one that is mostly high-support is dense
    * community structure — the EDGE-level texture [[triangleCounts]]'
    * node totals and [[richClub]]'s degree curve both aggregate away.
    *
    * Determinism: exact integer triangle counts per edge (each
    * triangle enumerated once, exploded to its 3 edges), exact
    * histogram; shares one IEEE division each.
    *
    * Scale shape: support(u,v) ≡ triangles containing edge (u,v), so
    * the census rides [[orientedTriangles]]' degree-ordered wedge join
    * — m^1.5-bounded, a hub generates zero wedges — then one explode
    * (3 rows per triangle), one edge-keyed rollup, one histogram
    * collapse. (The earlier unoriented adjacency self-join was
    * Σ deg²-bounded: one 10M-follower hub at 100× data would have
    * produced 10¹⁴ wedge rows — VERDICT r13 #2.)
    *
    * @return per-support rows (support, n_edges, share, bridge_share)
    *         ordered by support — 6-dp; bridge_share repeated
    */
  /** Per-edge triangle support off [[orientedTriangles]] — (a, b, __sup)
    * for every edge in at least one triangle (zero-support edges are
    * ABSENT; callers needing them left-join the edge list). Each
    * triangle (u, v, w) touches exactly 3 canonical edges: (v, w) is
    * already canonical (v < w by construction), the two u-edges
    * canonicalize by least/greatest. */
  private def edgeSupport(und: DataFrame): DataFrame =
    orientedTriangles(und)
      .select(F.explode(F.array(
        F.struct(F.least(F.col("u"), F.col("v")).as("a"),
          F.greatest(F.col("u"), F.col("v")).as("b")),
        F.struct(F.least(F.col("u"), F.col("w")).as("a"),
          F.greatest(F.col("u"), F.col("w")).as("b")),
        F.struct(F.col("v").as("a"), F.col("w").as("b")))).as("__e"))
      .select(F.col("__e.a").as("a"), F.col("__e.b").as("b"))
      .groupBy("a", "b").agg(F.count(F.lit(1)).as("__sup"))

  def edgeSupportCensus(edges: DataFrame, srcCol: String,
                        dstCol: String): DataFrame = {
    val und = canonicalUndirected(edges, srcCol, dstCol).localCheckpoint()
    val wed = edgeSupport(und)
    val perEdge = und.join(wed, Seq("a", "b"), "left_outer")
      .withColumn("__sup", F.coalesce(F.col("__sup"), F.lit(0L)))
    val hist = perEdge.groupBy(F.col("__sup").as("support"))
      .agg(F.count(F.lit(1)).as("n_edges"))
    val tot = hist.agg(F.sum("n_edges").as("__m"),
      F.round(F.coalesce(
        F.sum(F.when(F.col("support") === 0L, F.col("n_edges"))),
        F.lit(0L)).cast("double") /
        F.sum("n_edges").cast("double"), 6).as("bridge_share"))
    hist.crossJoin(F.broadcast(tot))
      .select(F.col("support"), F.col("n_edges"),
        F.round(F.col("n_edges").cast("double") /
          F.col("__m").cast("double"), 6).as("share"),
        F.col("bridge_share"))
      .orderBy("support")
  }

  /** Onnela weighted clustering coefficient (Onnela et al. 2005) — the
    * INTENSITY-aware [[localClustering]]: each triangle at node i
    * contributes the geometric mean of its normalized edge weights
    * (ŵ = w / max w), so a node whose triangles are built from strong
    * ties scores higher than one closing the same count of weak ones:
    * {{{
    *   C_w(i) = 2 / (k_i (k_i − 1)) · Σ_{tri at i} (ŵ_ij ŵ_ih ŵ_jh)^{1/3}
    * }}}
    * (C_w ≤ the unweighted lcc, equality when every edge carries max
    * weight). The readout that separates "suppliers co-purchased
    * together constantly" from "three accidental co-occurrences" —
    * weight structure [[triangleCounts]] and [[localClustering]] both
    * discard.
    *
    * Determinism: weights exact longs, ŵ exact divisions by one global
    * max; each triangle term round(cbrt(·), 9) (cbrt on both engines);
    * per-node sums of positive 9-dp terms, 6-dp result.
    *
    * Scale shape: the [[orientedTriangles]] discipline with weights
    * threaded through — wedges only at the low-degree corner
    * (m^1.5-bounded, hubs generate zero wedges), each triangle
    * enumerated ONCE and exploded to its 3 corners; degree census +
    * one keyed rollup. The 1-row max-weight rides a broadcast.
    *
    * @return per node (node, deg, n_tri, cw) ordered by node — cw 6-dp,
    *         0 for deg < 2 (the networkx convention)
    */
  def weightedClustering(edges: DataFrame, srcCol: String, dstCol: String,
                         wCol: String): DataFrame = {
    val und = edges.select(
        F.least(F.col(srcCol), F.col(dstCol)).as("a"),
        F.greatest(F.col(srcCol), F.col(dstCol)).as("b"),
        F.col(wCol).cast("long").as("__w"))
      .filter(F.col("a") =!= F.col("b"))
      .groupBy("a", "b").agg(F.max("__w").as("__w"))
      .localCheckpoint()
    val wmax = und.agg(F.max("__w").as("__wm"))
    val deg = und.select(F.col("a").as("node"))
      .unionAll(und.select(F.col("b").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("deg"))
    // (deg, id)-oriented edges carrying the normalized weight
    val withDeg = und
      .join(deg.select(F.col("node").as("a"), F.col("deg").as("__da")), "a")
      .join(deg.select(F.col("node").as("b"), F.col("deg").as("__db")), "b")
      .crossJoin(F.broadcast(wmax))
    val fwd = F.col("__da") < F.col("__db") ||
      (F.col("__da") === F.col("__db") && F.col("a") < F.col("b"))
    val oriented = withDeg.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).as("lo"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).as("hi"),
        (F.col("__w").cast("double") / F.col("__wm").cast("double"))
          .as("__wn"))
      .localCheckpoint()
    val wedges = oriented.select(F.col("lo").as("u"), F.col("hi").as("v"),
        F.col("__wn").as("__w1"))
      .join(oriented.select(F.col("lo").as("u"), F.col("hi").as("w"),
        F.col("__wn").as("__w2")), "u")
      .filter(F.col("v") < F.col("w"))
    val tris = wedges
      .join(oriented.select(F.col("lo").as("v"), F.col("hi").as("w"),
          F.col("__wn").as("__w3"))
          .unionAll(oriented.select(F.col("hi").as("v"), F.col("lo").as("w"),
            F.col("__wn").as("__w3"))),
        Seq("v", "w"))
      .withColumn("__t", F.round(F.cbrt(
        F.col("__w1") * F.col("__w2") * F.col("__w3")), 9))
    val perNode = tris.select(F.col("u").as("node"), F.col("__t"))
      .unionAll(tris.select(F.col("v").as("node"), F.col("__t")))
      .unionAll(tris.select(F.col("w").as("node"), F.col("__t")))
      .groupBy("node")
      .agg(F.count(F.lit(1)).as("n_tri"), F.sum("__t").as("__s"))
    deg.join(perNode, Seq("node"), "left_outer")
      .withColumn("n_tri", F.coalesce(F.col("n_tri"), F.lit(0L)))
      .withColumn("cw", F.round(F.when(F.col("deg") >= 2L,
        F.lit(2.0) * F.coalesce(F.col("__s"), F.lit(0.0)) /
          (F.col("deg") * (F.col("deg") - 1L)).cast("double"))
        .otherwise(0.0), 6))
      .select("node", "deg", "n_tri", "cw")
      .orderBy("node")
  }

  /** Weighted reciprocity of a DIRECTED weighted graph (Squartini et
    * al. 2013) — how much of the flow comes back:
    * {{{
    *   reciprocity      = Σ_uv min(w_uv, w_vu) / Σ_uv w_uv
    *   edge_reciprocity = |{(u,v): w_vu > 0}| / m     (unweighted share)
    * }}}
    * 1 means perfectly symmetric flow, 0 strictly one-way. The directed
    * readout the undirected triangle family cannot express: on a
    * behavior-transition graph it says whether users bounce back
    * (browse⇄search) or funnel forward (browse→buy, never back).
    *
    * Self-loops drop; parallel edges pre-sum into one weight per
    * ordered pair. Every ingredient an exact long; the two shares one
    * 6-dp IEEE division each.
    *
    * Scale shape: one ordered-pair collapse (map-side combined), one
    * self-join on the REVERSED key — both keyed shuffles of
    * (pair, long); a one-row answer.
    *
    * @return one row (n_edges, n_recip_edges, w_total, w_recip,
    *         reciprocity, edge_reciprocity)
    */
  def weightedReciprocity(edges: DataFrame, srcCol: String,
                          dstCol: String, wCol: String): DataFrame = {
    val e = edges.select(F.col(srcCol).as("__u"), F.col(dstCol).as("__v"),
        F.col(wCol).cast("long").as("__w"))
      .filter(F.col("__u") =!= F.col("__v"))
      .groupBy("__u", "__v").agg(F.sum("__w").as("__w"))
    val rev = e.select(F.col("__v").as("__u"), F.col("__u").as("__v"),
      F.col("__w").as("__wr"))
    e.join(rev, Seq("__u", "__v"), "left_outer")
      .withColumn("__wr", F.coalesce(F.col("__wr"), F.lit(0L)))
      .agg(F.count(F.lit(1)).as("n_edges"),
        F.coalesce(F.sum(F.when(F.col("__wr") > 0L, 1L)), F.lit(0L))
          .as("n_recip_edges"),
        F.sum("__w").as("w_total"),
        F.sum(F.least(F.col("__w"), F.col("__wr"))).as("w_recip"))
      .select(F.col("n_edges"), F.col("n_recip_edges"),
        F.col("w_total"), F.col("w_recip"),
        F.round(F.col("w_recip").cast("double") /
          F.nullif(F.col("w_total").cast("double"), F.lit(0.0)), 6)
          .as("reciprocity"),
        F.round(F.col("n_recip_edges").cast("double") /
          F.nullif(F.col("n_edges").cast("double"), F.lit(0.0)), 6)
          .as("edge_reciprocity"))
  }

  /** k-truss subgraph (Cohen 2008) — the EDGE-level sibling of
    * [[kCore]]: iteratively drop every edge whose support (triangles
    * containing it, recomputed on the surviving subgraph) is below
    * k−2 — the standard "keep only community-certified ties" filter
    * that survives the hub-spam and accidental co-occurrences a degree
    * cut ([[kCore]]) lets through: a k-core keeps a star hub, a
    * k-truss (k ≥ 3) never does, because star edges close no
    * triangles.
    *
    * The ROUND COUNT IS PINNED (`rounds`), not run-to-fixpoint: both
    * engines execute exactly `rounds` peels, so results are
    * well-defined (and oracle-replayable) even when more peeling would
    * still shrink the graph. AFTER `rounds` peels the result is a
    * SUPERSET of the true k-truss — "every surviving edge sits in
    * ≥ k−2 triangles" is the FIXPOINT property and only holds once a
    * peel removes nothing. Peeling is monotone (a converged graph is a
    * fixpoint; extra rounds are no-ops), so callers needing the exact
    * k-truss use [[kTrussFixpoint]] (peels to convergence, loud cap),
    * or detect convergence here cheaply: run with `rounds` and
    * `rounds+1` and compare edge counts (equal ⇒ converged). Deep
    * onion-layered graphs (long dependency chains of barely-supported
    * edges) can need many rounds; the default 3 is calibrated to
    * social/co-occurrence graphs where support collapses fast.
    *
    * Determinism: every support an exact long; the census exact.
    *
    * Scale shape: each round is one [[orientedTriangles]] pass on the
    * SHRINKING edge set (m^1.5-bounded, hubs generate zero wedges — the
    * x415 contract) + one edge-keyed semi-join; `localCheckpoint` per
    * round truncates lineage exactly like [[kCore]]'s peel. Round 1
    * dominates; later rounds run on the (typically much smaller)
    * surviving core.
    *
    * @param k      truss order (≥ 3; k−2 is the per-edge triangle
    *               threshold)
    * @param rounds pinned peel count (each a full support recompute)
    * @return per node (node, degree) within the k-truss, ordered by
    *         node — empty when the graph has no k-truss
    */
  def kTruss(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
             rounds: Int = 3): DataFrame = {
    require(k >= 3, s"k must be >= 3, got $k")
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be in [1,16], got $rounds")
    var e = canonicalUndirected(edges, srcCol, dstCol).localCheckpoint()
    (1 to rounds).foreach { _ =>
      // zero-support edges are absent from edgeSupport, so the semi-join
      // drops them without a left-outer + coalesce
      val keep = edgeSupport(e).filter(F.col("__sup") >= (k - 2).toLong)
      e = e.join(keep.select("a", "b"), Seq("a", "b"), "left_semi")
        .localCheckpoint()
    }
    e.select(F.col("a").as("node"))
      .unionAll(e.select(F.col("b").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("degree"))
      .orderBy("node")
  }

  /** [[kTruss]] run to FIXPOINT — the exact k-truss, for callers who
    * need the subset guarantee rather than oracle-replayable pinned
    * rounds: peel until a round removes nothing, up to `maxRounds`;
    * REJECTS LOUDLY (the repo convention — never silently return the
    * superset the pinned-round form documents) if the graph hasn't
    * converged by then. Each round's edge count is already materialized
    * by the peel's `localCheckpoint`, so the convergence check reads a
    * cached count — no extra scan of the corpus.
    *
    * Scale shape: identical per-round cost to [[kTruss]] (one
    * [[orientedTriangles]] pass on the shrinking edge set + an
    * edge-keyed semi-join, lineage truncated per round); the driver
    * holds one long per round. Deep onion graphs peel O(longest
    * dependency chain) rounds — the loud cap is the budget control.
    *
    * @throws IllegalStateException when `maxRounds` peels still shrink
    *         the edge set
    * @return per node (node, degree) within the exact k-truss, ordered
    */
  def kTrussFixpoint(edges: DataFrame, srcCol: String, dstCol: String,
                     k: Int, maxRounds: Int = 32): DataFrame = {
    require(k >= 3, s"k must be >= 3, got $k")
    require(maxRounds >= 1 && maxRounds <= 256,
      s"maxRounds must be in [1,256], got $maxRounds")
    var e = canonicalUndirected(edges, srcCol, dstCol).localCheckpoint()
    var prev = e.count()
    var converged = prev == 0L
    var round = 0
    while (!converged && round < maxRounds) {
      val keep = edgeSupport(e).filter(F.col("__sup") >= (k - 2).toLong)
      e = e.join(keep.select("a", "b"), Seq("a", "b"), "left_semi")
        .localCheckpoint()
      val now = e.count()
      converged = now == prev || now == 0L
      prev = now
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kTrussFixpoint: no fixpoint after $maxRounds rounds " +
          s"($prev edges still shrinking) — raise maxRounds or use " +
          "kTruss(rounds=...) for the documented superset")
    e.select(F.col("a").as("node"))
      .unionAll(e.select(F.col("b").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("degree"))
      .orderBy("node")
  }

  /** Partition quality census — grade a GIVEN community assignment
    * (a metadata field, a clustering, a label-propagation result)
    * against the graph:
    * {{{
    *   Q = Σ_c ( e_c/m − (vol_c / 2m)² )          (modularity)
    *   φ_c = cut_c / min(vol_c, 2m − vol_c)       (conductance)
    * }}}
    * Q ≈ 0 says the partition is no better than random wiring; a
    * community with φ near 1 talks mostly to outsiders — the two
    * numbers that decide whether "group by nation/source/cluster" is a
    * real structure or a label. Complements discovery ops
    * ([[graft.ops.Components]]' label propagation): this EVALUATES any
    * assignment, including theirs.
    *
    * Determinism: every count (internal, cut, volume, m) is an exact
    * long off one edge join; per-community modularity terms are 9-dp
    * O(1) IEEE values; conductance one IEEE division.
    *
    * Scale shape: two broadcast-able comm joins on the edge list, a
    * C-row census; unassigned nodes' edges count toward cut via a
    * distinct sentinel (documented).
    *
    * @param comm (node, community) assignment; a node appearing with
    *             more than one community is resolved to its
    *             lexicographically smallest (min) community — the
    *             one-row-per-node contract is ENFORCED by aggregation,
    *             never by trusting the input (a duplicate mapping
    *             would otherwise multiply edge rows in the joins and
    *             silently corrupt every count)
    * @return per-community rows (community, n_nodes, internal_edges,
    *         cut_edges, volume, conductance, modularity) ordered by
    *         community — 6-dp
    */
  def partitionQuality(edges: DataFrame, srcCol: String, dstCol: String,
                       comm: DataFrame, nodeCol: String,
                       commCol: String): DataFrame = {
    val und = canonicalUndirected(edges, srcCol, dstCol).localCheckpoint()
    // enforce one row per node (advisor r13: a node mapped to two
    // communities would survive .distinct() and MULTIPLY edge rows in
    // the joins below, silently corrupting m/internal/cut/modularity) —
    // deterministic pick: the lexicographically smallest community
    val cm = comm.select(F.col(nodeCol).as("__n"),
        F.coalesce(F.col(commCol).cast("string"), F.lit("__none"))
          .as("__c"))
      .groupBy("__n").agg(F.min("__c").as("__c"))
    val j = und
      .join(cm.select(F.col("__n").as("a"), F.col("__c").as("__ca")),
        Seq("a"), "left_outer")
      .join(cm.select(F.col("__n").as("b"), F.col("__c").as("__cb")),
        Seq("b"), "left_outer")
      .withColumn("__ca", F.coalesce(F.col("__ca"), F.lit("__none")))
      .withColumn("__cb", F.coalesce(F.col("__cb"), F.lit("__none")))
    val m = j.agg(F.count(F.lit(1)).as("__m"))
    val internal = j.filter(F.col("__ca") === F.col("__cb"))
      .groupBy(F.col("__ca").as("community"))
      .agg(F.count(F.lit(1)).as("internal_edges"))
    val cut = j.filter(F.col("__ca") =!= F.col("__cb"))
      .select(F.explode(F.array(F.col("__ca"), F.col("__cb")))
        .as("community"))
      .groupBy("community").agg(F.count(F.lit(1)).as("cut_edges"))
    val nodes = cm.unionByName(
        und.select(F.col("a").as("__n")).unionAll(
          und.select(F.col("b").as("__n")))
          .distinct()
          .join(cm, Seq("__n"), "left_anti")
          .withColumn("__c", F.lit("__none")))
      .groupBy(F.col("__c").as("community"))
      .agg(F.count(F.lit(1)).as("n_nodes"))
    val per = nodes
      .join(internal, Seq("community"), "left_outer")
      .join(cut, Seq("community"), "left_outer")
      .withColumn("internal_edges",
        F.coalesce(F.col("internal_edges"), F.lit(0L)))
      .withColumn("cut_edges", F.coalesce(F.col("cut_edges"), F.lit(0L)))
      .withColumn("volume",
        F.lit(2L) * F.col("internal_edges") + F.col("cut_edges"))
      .crossJoin(F.broadcast(m))
    val mD = F.col("__m").cast("double")
    val terms = per.withColumn("__q", F.round(
      F.col("internal_edges").cast("double") / mD -
        (F.col("volume").cast("double") / (F.lit(2.0) * mD)) *
          (F.col("volume").cast("double") / (F.lit(2.0) * mD)), 9))
    val q = terms.agg(F.round(F.sum("__q"), 6).as("modularity"))
    terms.crossJoin(F.broadcast(q))
      .select(F.col("community"), F.col("n_nodes"),
        F.col("internal_edges"), F.col("cut_edges"), F.col("volume"),
        F.round(F.col("cut_edges").cast("double") /
          F.nullif(F.least(F.col("volume").cast("double"),
            F.lit(2.0) * mD - F.col("volume").cast("double")),
            F.lit(0.0)), 6).as("conductance"),
        F.col("modularity"))
      .orderBy("community")
  }

  /** Rich-club coefficient curve (Zhou & Mondragón 2004) — do the
    * high-degree nodes form their own densely-wired club? For each
    * degree threshold k: take the N_k nodes with deg > k and the E_k
    * edges internal to them,
    * {{{
    *   φ(k) = 2·E_k / (N_k · (N_k − 1))
    * }}}
    * — the density of the subgraph the "rich" nodes induce. A rising
    * φ(k) is the hub-oligarchy signature (hubs preferentially link to
    * hubs) that degree distribution and assortativity each only hint
    * at.
    *
    * All counts are exact longs off two bounded histograms (node-degree
    * and edge-min-degree), joined to the k-grid — the corpus-sized edge
    * list collapses once and never re-scans per k.
    *
    * @return one row per k = 1..kMax (k, n_k, e_k, phi) — 6-dp; phi
    *         NULL when N_k < 2
    */
  def richClub(edges: DataFrame, srcCol: String, dstCol: String,
               kMax: Int = 10): DataFrame = {
    require(kMax >= 1, s"kMax must be >= 1, got $kMax")
    val und = canonicalUndirected(edges, srcCol, dstCol).localCheckpoint()
    val deg = und.select(F.col("a").as("node"))
      .unionAll(und.select(F.col("b").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("deg"))
    // bounded histograms: distinct degrees × kMax is the whole join
    val degHist = deg.groupBy("deg").agg(F.count(F.lit(1)).as("__cn"))
    val edgeMin = und
      .join(F.broadcast(deg.select(F.col("node").as("a"),
        F.col("deg").as("__da"))), Seq("a"))
      .join(F.broadcast(deg.select(F.col("node").as("b"),
        F.col("deg").as("__db"))), Seq("b"))
      .select(F.least(F.col("__da"), F.col("__db")).as("__md"))
      .groupBy("__md").agg(F.count(F.lit(1)).as("__ce"))
    val grid = und.sparkSession.range(1, kMax + 1L)
      .select(F.col("id").as("k"))
    val nK = grid.join(degHist, F.col("deg") > F.col("k"), "left")
      .groupBy("k").agg(F.coalesce(F.sum("__cn"), F.lit(0L)).as("n_k"))
    val eK = grid.join(edgeMin, F.col("__md") > F.col("k"), "left")
      .groupBy("k").agg(F.coalesce(F.sum("__ce"), F.lit(0L)).as("e_k"))
    nK.join(eK, Seq("k"))
      .select(F.col("k"), F.col("n_k"), F.col("e_k"),
        F.round((F.lit(2L) * F.col("e_k")).cast("double") /
          F.nullif((F.col("n_k") * (F.col("n_k") - 1L)).cast("double"),
            F.lit(0.0)), 6).as("phi"))
      .orderBy("k")
  }

  /** Katz centrality (1953) — influence as the attenuated count of ALL
    * walks arriving at a node, `c = Σ_k α^k (Aᵀ)^k·1`, run as the fixed-
    * iteration recurrence `c ← β + α·Σ_{u∈N(v)} c_u` (the resolvent
    * geometric series, convergent while α < 1/λ_max). Where [[pageRank]]
    * splits a walker's mass across out-edges (degree-normalized), Katz
    * lets a hub pass its FULL score to every neighbor — the "count the
    * endorsements" reading that promotes nodes adjacent to hubs even
    * when those hubs are promiscuous.
    *
    * Per round, per-edge contributions round to 9 dp BEFORE the
    * unordered sum and the per-node score re-rounds after adding β —
    * the [[pageRank]] iteration contract, engine-replayable from the
    * same edge list.
    *
    * Scale shape: per round ONE join of scores onto the (checkpointed)
    * doubled adjacency on the neighbor key plus one keyed rollup —
    * identical to the pageRank round; no driver actions.
    *
    * @return top `topN` rows (node, katz, rk) by (katz desc, node) —
    *         6-dp
    */
  def katzCentrality(edges: DataFrame, srcCol: String, dstCol: String,
                     alpha: Double = 0.05, beta: Double = 1.0,
                     iters: Int = 4, topN: Int = 20): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1)")
    val und = canonicalUndirected(edges, srcCol, dstCol).localCheckpoint()
    val adj = und.select(F.col("a").as("__v"), F.col("b").as("__u"))
      .unionAll(und.select(F.col("b").as("__v"), F.col("a").as("__u")))
    var c = adj.select(F.col("__v").as("node")).distinct()
      .withColumn("katz", F.lit(1.0))
    for (_ <- 1 to iters) {
      c = adj
        .join(c.select(F.col("node").as("__u"), F.col("katz")),
          Seq("__u"))
        .withColumn("__contrib", Quant.halfUp(F.lit(alpha) * F.col("katz"), 9))
        .groupBy(F.col("__v").as("node"))
        .agg(F.round(F.lit(beta) + F.sum("__contrib"), 9).as("katz"))
    }
    c.withColumn("rk", F.row_number().over(
        Window.orderBy(F.col("katz").desc, F.col("node"))))
      .filter(F.col("rk") <= topN)
      .select(F.col("node"), F.round(F.col("katz"), 6).as("katz"),
        F.col("rk"))
      .orderBy("rk")
  }

  /** Label-propagation community DETECTION (Raghavan, Albert & Kumara
    * 2007) — the discovery half that [[modularity]] and
    * [[partitionQuality]] grade: every node starts in its own community
    * (label = own id) and each round adopts the most frequent label
    * among its neighbors, ties broken toward the SMALLEST label. The
    * node's own current label casts one vote too — the standard damping
    * that keeps synchronous updates from oscillating on bipartite-ish
    * structure (plain synchronous LPA provably 2-cycles on bipartite
    * graphs; the self-vote breaks the symmetry deterministically).
    *
    * Runs EXACTLY `rounds` synchronous rounds (fixed-iteration — the
    * [[pageRank]] engine-replayable convention; LPA has no convergence
    * guarantee even in the literature, where iteration caps are the
    * standard stop). Every step is integer counting + a (count desc,
    * label asc) argmax — no floating point anywhere, so the result is
    * bit-exact across engines and partitionings.
    *
    * Distributed shape, per round: ONE keyed shuffle join of the label
    * frame onto the symmetric neighbor list (built once, checkpointed),
    * one partial-aggregable (node, label) vote census, one
    * partial-aggregable per-node argmax via max(struct(cnt, -label)) —
    * no windows, no per-node row_number shuffle. Hubs cost their degree
    * in vote rows, collapsed map-side. Labels checkpoint each round
    * (lineage truncation, the iterative-op rule). Driver state: the
    * loop counter.
    *
    * @param rounds synchronous LPA rounds (pinned; 4-6 settles most
    *               real graphs — communities form fast, refinement
    *               slows)
    * @return (node, community) — community = converged-or-round-R
    *         label, the min-tending label of the node's group; ordered
    *         by node
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int = 4): DataFrame = {
    require(rounds >= 1 && rounds <= 64,
      s"rounds must be in [1,64], got $rounds")
    val e = canonicalUndirected(
      edges.select(F.col(srcCol).cast("long").as(srcCol),
        F.col(dstCol).cast("long").as(dstCol)), srcCol, dstCol)
    // symmetric neighbor list, built once and reused every round
    val nbrs = e.select(F.col("a").as("__n"), F.col("b").as("__nb"))
      .unionAll(e.select(F.col("b").as("__n"), F.col("a").as("__nb")))
      .localCheckpoint()
    var lbl = nbrs.select(F.col("__n")).distinct()
      .select(F.col("__n"), F.col("__n").as("__l"))
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      val votes = nbrs
        .join(lbl.select(F.col("__n").as("__nb"), F.col("__l")), "__nb")
        .select(F.col("__n"), F.col("__l"))
        .unionAll(lbl) // self-vote
      lbl = votes.groupBy("__n", "__l")
        .agg(F.count(F.lit(1)).as("__c"))
        .groupBy("__n")
        .agg(F.max(F.struct(F.col("__c"), (-F.col("__l")).as("__nl")))
          .as("__m"))
        .select(F.col("__n"), (-F.col("__m.__nl")).as("__l"))
        .localCheckpoint()
    }
    lbl.select(F.col("__n").as("node"), F.col("__l").as("community"))
      .orderBy("node")
  }

  /** k-landmark BFS distances + landmark harmonic closeness (Cohen et
    * al. 2003's landmark/oracle estimation regime) — the DISTANCE
    * complement to [[neighborhoodFunction]]'s reach SIZES: exact
    * hop-limited shortest-path distances from k hash-chosen landmark
    * nodes to every node, rolled up per node as
    * {{{
    *   n_reached, min_dist, sum_dist,
    *   harmonic_milli = Σ_{landmarks at d>0} round(1000/d)
    * }}}
    * Landmark closeness ranks periphery vs core exactly like full
    * harmonic centrality ranks them, at k×E cost instead of N×E —
    * the classic scale trade. Landmarks are the k smallest
    * md5(node)-hashes: deterministic, engine-replayable, and
    * hash-spread across the graph (min node IDS would cluster wherever
    * ids were minted).
    *
    * Distances are along edge DIRECTION (landmark → node); pass both
    * directions for undirected graphs. A node unreached within `hops`
    * by any landmark reports (0, NULL, NULL, 0) — visible, not
    * dropped. All state is exact integers: min-merges and long sums
    * commute, round(1000/d) is one IEEE division per (landmark, node)
    * pair — no order-dependent accumulation anywhere.
    *
    * Scale shape: state is ≤ N·k (landmark, node, dist) rows; each
    * round one dist⋈edges join + one min collapse, both
    * partial-aggregable map-side, localCheckpoint-truncated (the
    * kCore/neighborhoodFunction convention). The full dist table (not
    * a delta frontier) joins each round — at pinned small `hops` the
    * simplicity beats frontier bookkeeping; k bounds the multiplier.
    *
    * @param nLandmarks landmark count (k ≤ 64)
    * @param hops       BFS radius (rounds), pinned
    * @return (node, n_reached, min_dist, sum_dist, harmonic_milli)
    *         ordered by node
    */
  def landmarkDistances(edges: DataFrame, srcCol: String, dstCol: String,
                        nLandmarks: Int = 4, hops: Int = 3): DataFrame = {
    require(nLandmarks >= 1 && nLandmarks <= 64,
      s"nLandmarks must be in [1,64], got $nLandmarks")
    require(hops >= 1 && hops <= 8, s"hops must be in [1,8], got $hops")
    val e = edges
      .select(F.col(srcCol).cast("long").as("__s"),
        F.col(dstCol).cast("long").as("__d"))
      .filter(F.col("__s").isNotNull && F.col("__d").isNotNull &&
        F.col("__s") =!= F.col("__d"))
      .distinct()
      .localCheckpoint()
    val nodes = e.select(F.col("__s").as("node"))
      .unionAll(e.select(F.col("__d").as("node"))).distinct()
      .localCheckpoint()
    val landmarks = nodes
      .orderBy(F.md5(F.col("node").cast("string")), F.col("node"))
      .limit(nLandmarks)
      .select(F.col("node").as("__lm"))
    var dist = landmarks
      .select(F.col("__lm"), F.col("__lm").as("node"),
        F.lit(0).as("__dd"))
      .localCheckpoint()
    (1 to hops).foreach { _ =>
      val stepped = dist.join(e, dist("node") === e("__s"))
        .select(F.col("__lm"), F.col("__d").as("node"),
          (F.col("__dd") + 1).as("__dd"))
      dist = dist.unionByName(stepped)
        .groupBy("__lm", "node").agg(F.min("__dd").as("__dd"))
        .localCheckpoint()
    }
    val perNode = dist.groupBy("node")
      .agg(F.count(F.lit(1)).as("n_reached"),
        F.min("__dd").as("min_dist"),
        F.sum(F.col("__dd").cast("long")).as("sum_dist"),
        F.sum(F.when(F.col("__dd") > 0,
            F.round(F.lit(1000.0) / F.col("__dd").cast("double"), 0)
              .cast("long"))
          .otherwise(0L)).as("harmonic_milli"))
    nodes.join(perNode, Seq("node"), "left_outer")
      .select(F.col("node"),
        F.coalesce(F.col("n_reached"), F.lit(0L)).as("n_reached"),
        F.col("min_dist"), F.col("sum_dist"),
        F.coalesce(F.col("harmonic_milli"), F.lit(0L))
          .as("harmonic_milli"))
      .orderBy("node")
  }

  /** Neighborhood function via iterated HLL sketches (Palmer et al.,
    * ANF, KDD'02; Boldi & Vigna, HyperBall, 2011) — for each hop
    * h = 0..hops, an estimate of Σ_v |ball(v, h)|: how many (node,
    * reachable-node) pairs exist within h hops. This is THE scalable
    * distance profile: exact all-pairs BFS is quadratic state, while a
    * ball is just a SET whose size an HLL sketch estimates — and the
    * HLL union is exact over sketches, so
    * {{{
    *   regs_{h+1}(v) = max-merge( regs_h(v), regs_h(w) for v→w )
    * }}}
    * propagates whole reachable sets with 2^p registers per node.
    * From the per-hop totals: avg ball size, and `frac_of_max` — the
    * effective-diameter readout (smallest h with frac ≥ 0.9 is the
    * standard 90 %-effective diameter; the caller reads it off the
    * H+1-row result).
    *
    * Edges are DIRECTED (out-reachability); pass both directions for
    * undirected balls. h = 0 is the {self} baseline (every node's ball
    * is 1; its estimate is m·ln(m/(m−1)) ≈ 1 — the linear-counting
    * value, NOT exactly 1: HLL error applies to every row, ±1.04/√m on
    * large balls).
    *
    * Determinism: registers/estimates are [[Sketches.hllRegisters]]/
    * [[Sketches.hllEstimate]] verbatim (md5 buckets, integer harmonic
    * sum, linear-counting branch — the oracled x100/x119/x135 math);
    * per-node estimates integer-ize to round(est·1000) milli-units so
    * the graph rollup is a commutative exact long sum, then one IEEE
    * division per readout column.
    *
    * Scale shape: per round ONE regs⋈edges join (≤ 2^p rows per dst
    * node stream through) + one (node, bucket) max collapse
    * (partial-aggregated map-side — a 10M-in-degree hub receives its
    * neighbors' registers pre-combined per map partition, never raw).
    * State is ≤ N·2^p register rows, localCheckpoint truncates lineage
    * per round (the kCore/labelPropagation convention). p is the
    * accuracy knob: ±1.04/√2^p relative error per ball.
    *
    * @param hops rounds to expand (output has hops+1 rows, h = 0..hops)
    * @param p    HLL precision (2^p registers/node), multiple of 4
    * @return (h, n_nodes, nf_milli, avg_ball, frac_of_max) ordered by h
    */
  def neighborhoodFunction(edges: DataFrame, srcCol: String,
                           dstCol: String, hops: Int = 3,
                           p: Int = 4): DataFrame = {
    require(hops >= 1 && hops <= 8, s"hops must be in [1,8], got $hops")
    val e = edges
      .select(F.col(srcCol).cast("long").as("__s"),
        F.col(dstCol).cast("long").as("__d"))
      .filter(F.col("__s").isNotNull && F.col("__d").isNotNull &&
        F.col("__s") =!= F.col("__d"))
      .distinct()
      .localCheckpoint()
    val nodes = e.select(F.col("__s").as("node"))
      .unionAll(e.select(F.col("__d").as("node"))).distinct()
    var regs = Sketches.hllRegisters(nodes, Seq("node"), F.col("node"), p)
      .localCheckpoint()
    def level(h: Int): DataFrame =
      Sketches.hllEstimate(regs, Seq("node"), p)
        .select(F.round(F.col("n_est") * 1000.0, 0).cast("long").as("__bm"))
        .agg(F.count(F.lit(1)).as("n_nodes"), F.sum("__bm").as("nf_milli"))
        .select(F.lit(h).as("h"), F.col("n_nodes"), F.col("nf_milli"))
    val levels = scala.collection.mutable.ListBuffer(level(0))
    (1 to hops).foreach { h =>
      val prop = e.join(regs, e("__d") === regs("node"))
        .select(F.col("__s").as("node"), F.col("bucket"), F.col("m"))
      regs = regs.select("node", "bucket", "m").unionByName(prop)
        .groupBy("node", "bucket").agg(F.max("m").as("m"))
        .localCheckpoint()
      levels += level(h)
    }
    val all = levels.reduce(_ unionByName _)
    val last = all.filter(F.col("h") === hops)
      .select(F.col("nf_milli").as("__nfH"))
    all.crossJoin(F.broadcast(last))
      .select(F.col("h"), F.col("n_nodes"), F.col("nf_milli"),
        F.round(F.col("nf_milli").cast("double") / 1000.0 /
          F.col("n_nodes").cast("double"), 6).as("avg_ball"),
        F.round(F.col("nf_milli").cast("double") /
          F.nullif(F.col("__nfH").cast("double"), F.lit(0.0)), 6)
          .as("frac_of_max"))
      .orderBy("h")
  }
}
