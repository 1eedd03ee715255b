package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GraphsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("triangle counts on a known graph: K4 plus a pendant edge") {
    // K4 on 1..4 (4 triangles, each vertex in 3) + pendant 4-5
    val edges = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)).toDF("src", "dst")
    val per = Graphs.triangleCounts(edges).as[(Int, Long)].collect().toMap
    assert(per == Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L))
    assert(Graphs.totalTriangles(edges).as[Long].head() == 4L)
  }

  test("canonicalization: duplicates, reversed edges, and self-loops do not change counts") {
    val messy = Seq((1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (3, 3)).toDF("src", "dst")
    assert(Graphs.totalTriangles(messy).as[Long].head() == 1L)
  }

  test("matches a brute-force count on a random graph") {
    val rng = new scala.util.Random(7L)
    val n = 40
    val edgeSet = (for {
      u <- 1 to n; v <- (u + 1) to n if rng.nextDouble() < 0.15
    } yield (u, v)).toSet
    val brute = (for {
      a <- 1 to n; b <- (a + 1) to n; c <- (b + 1) to n
      if edgeSet(a -> b) && edgeSet(b -> c) && edgeSet(a -> c)
    } yield 1).size.toLong
    val got = Graphs.totalTriangles(edgeSet.toSeq.toDF("src", "dst")).as[Long].head()
    assert(got == brute)
    // per-vertex sums to 3x total
    val per = Graphs.triangleCounts(edgeSet.toSeq.toDF("src", "dst"))
      .agg(sum("n_triangles")).as[Long].head()
    assert(per == 3 * brute)
  }

  test("co-occurrence edges: cap drops oversized groups, pairs are canonical-distinct") {
    val df = Seq(
      ("g1", 1), ("g1", 2), ("g1", 3),          // C(3,2) = 3 pairs
      ("g2", 2), ("g2", 3),                     // 1 pair (dedups with g1's (2,3))
      ("g3", 1), ("g3", 2), ("g3", 3), ("g3", 4), // size 4 > cap → dropped
      ("g4", 9)                                 // singleton → dropped
    ).toDF("g", "item")
    val edges = Graphs.coOccurrenceEdges(df, "g", "item", maxGroupSize = 3)
      .as[(Int, Int)].collect().toSet
    assert(edges == Set((1, 2), (1, 3), (2, 3)))
  }

  test("connected components: min-id labels match a BFS brute force, isolated nodes self-label") {
    val rng = new scala.util.Random(13L)
    val n = 60
    val edgeSeq = (for {
      u <- 1 to n; v <- (u + 1) to n if rng.nextDouble() < 0.03
    } yield (u.toLong, v.toLong))
    // brute-force components via repeated label relaxation
    val labels = scala.collection.mutable.Map((1 to n).map(i => i.toLong -> i.toLong): _*)
    var changed = true
    while (changed) {
      changed = false
      edgeSeq.foreach { case (u, v) =>
        val m = math.min(labels(u), labels(v))
        if (labels(u) != m || labels(v) != m) { labels(u) = m; labels(v) = m; changed = true }
      }
    }
    val nodes = (1 to n).map(_.toLong).toDF("id")
    // reversed + duplicated edges, plus a self-loop, must not matter
    val messy = (edgeSeq ++ edgeSeq.map(_.swap) ++ Seq((5L, 5L))).toDF("src", "dst")
    val got = Graphs.connectedComponents(nodes, messy, "id")
      .as[(Long, Long)].collect().toMap
    assert(got == labels.toMap)
    assert(got.keySet.size == n) // every node labelled, isolated ones included
  }

  test("reachable: min-depth BFS matches brute force; depth bound respected") {
    val rng = new scala.util.Random(31L)
    val n = 50
    val edgeSeq = (for {
      u <- 1 to n; v <- (u + 1) to n if rng.nextDouble() < 0.05
    } yield (u.toLong, v.toLong))
    val adj = edgeSeq.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    def bfs(root: Long, maxD: Int): Map[Long, Int] = {
      var dist = Map(root -> 0); var frontier = Set(root)
      for (d <- 1 to maxD) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
        dist ++= frontier.map(_ -> d)
      }
      dist
    }
    val roots = Seq(1L, 7L, 13L).toDF("r")
    val got = Graphs.reachable(edgeSeq.toDF("src", "dst"), roots, "r", maxDepth = 3)
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).map { case (r, rows) => r -> rows.map(t => t._2 -> t._3).toMap }
    for (r <- Seq(1L, 7L, 13L)) assert(got(r) == bfs(r, 3), s"root $r")
    assert(got.values.flatMap(_.values).forall(_ <= 3))
  }

  test("the wedge join is an equi-join plan, not a nested loop") {
    val edges = Seq((1, 2), (2, 3), (1, 3)).toDF("src", "dst")
    val plan = Graphs.triangleCounts(edges).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("appendToComponents: merge, bridge, new-node, and no-op cases") {
    // old graph: {1,2}, {5,6}, isolated 9
    val oldEdges = Seq((1L, 2L), (5L, 6L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 5L, 6L, 9L).toDF("id")
    val labels = Graphs.connectedComponents(nodes, oldEdges, "id")
    // delta: bridge 2-5 (merges two components), 6-100 (new node joins),
    // 200-201 (brand-new component), 1-2 again (pure no-op)
    val delta = Seq((2L, 5L), (6L, 100L), (200L, 201L), (1L, 2L), (2L, 1L))
      .toDF("src", "dst")
    val got = Graphs.appendToComponents(labels, delta)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 100L -> 1L,
      9L -> 9L, 200L -> 200L, 201L -> 200L))
  }

  test("LAW: append over any edge split equals the full rebuild (property sweep)") {
    val rng = new scala.util.Random(42L)
    for (trial <- 1 to 4) {
      val n = 60
      val edges = (1 to 120).map { _ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val (e1, e2) = edges.partition(_ => rng.nextBoolean())
      def nodesOf(es: Seq[(Long, Long)]) =
        es.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id")
      val full = Graphs.connectedComponents(
          nodesOf(edges), edges.toDF("src", "dst"), "id")
        .as[(Long, Long)].collect().toMap
      val base = Graphs.connectedComponents(
        nodesOf(e1), e1.toDF("src", "dst"), "id")
      val incr = Graphs.appendToComponents(base, e2.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(incr == full, s"trial $trial: incremental != full rebuild")
    }
  }

  test("LAW composes: three sequential absorptions equal the full rebuild") {
    // append's output must be a valid INPUT labeling for the next append
    // (reps are min ids, every node labeled) — the induction step that
    // makes continuous maintenance sound
    val rng = new scala.util.Random(77L)
    val n = 50
    val edges = (1 to 90).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val parts = edges.grouped(math.max(1, edges.size / 3)).toSeq
    def nodesOf(es: Seq[(Long, Long)]) =
      es.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id")
    val full = Graphs.connectedComponents(nodesOf(edges), edges.toDF("src", "dst"), "id")
      .as[(Long, Long)].collect().toMap
    var labels = Graphs.connectedComponents(
      nodesOf(parts.head), parts.head.toDF("src", "dst"), "id")
    parts.tail.foreach(p =>
      labels = Graphs.appendToComponents(labels, p.toDF("src", "dst")))
    assert(labels.as[(Long, Long)].collect().toMap == full)
  }

  test("appendToComponents with a new-node rep smaller than every old rep") {
    // component {10, 11} rep 10; new edge 0-11: merged rep must become 0
    val labels = Seq((10L, 10L), (11L, 10L)).toDF("id", "rep")
    val got = Graphs.appendToComponents(labels, Seq((0L, 11L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 10L -> 0L, 11L -> 0L))
  }

  test("pageRank: a 2-cycle is the exact fixed point (rank 1.0 each, forever)") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graphs.pageRank(edges, iters = 5).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1000000000000L, 2L -> 1000000000000L))
  }

  test("pageRank: star hand-check, exact integer units round by round") {
    // a -> b, c -> b; after round 1: b = 0.15 + 0.85*(1+1) = 1.85,
    // a = c = 0.15; after round 2: b = 0.15 + 0.85*(0.15+0.15) = 0.405
    // (all exactly representable in 1e-12 fixed point, no truncation)
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val r1 = Graphs.pageRank(edges, iters = 1).as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 150000000000L, 2L -> 1850000000000L, 3L -> 150000000000L))
    val r2 = Graphs.pageRank(edges, iters = 2).as[(Long, Long)].collect().toMap
    assert(r2(2L) == 405000000000L)
  }

  test("hits: star hand-check — the hub is the center, the authorities are the leaves") {
    // c=0 -> {1..5}: leaves' auth = scale (max-normalized), center 0;
    // center's hub = scale, leaves 0 — the exact fixed point from round 1
    val edges = (1L to 5L).map(l => (0L, l)).toDF("src", "dst")
    val got = Graphs.hits(edges, iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(0L) == ((0L, 1000000L)))
    (1L to 5L).foreach(l => assert(got(l) == ((1000000L, 0L))))
  }

  test("hits: bounded to [0, scale], max normalized, deterministic, duplicates collapse") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong)).toDF("src", "dst")
    val a = Graphs.hits(edges, iters = 2).as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = Graphs.hits(edges.unionAll(edges.limit(10)), iters = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b), "duplicate edges must collapse; runs must be deterministic")
    assert(a.forall(r => r._2 >= 0L && r._2 <= 1000000L && r._3 >= 0L && r._3 <= 1000000L))
    assert(a.map(_._2).max == 1000000L && a.map(_._3).max == 1000000L)
    // a high-in-degree target out-ranks a low-in-degree one on authority
    val skew = (Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (4L, 8L))).toDF("src", "dst")
    val s = Graphs.hits(skew, iters = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(s(9L) > s(8L))
  }

  test("pageRank: duplicate edges collapse; higher in-degree means higher rank") {
    val dup = Seq((1L, 2L), (1L, 2L), (3L, 2L), (3L, 4L)).toDF("src", "dst")
    val got = Graphs.pageRank(dup, iters = 3).as[(Long, Long)].collect().toMap
    // node 3 splits its rank across 2 out-edges, node 1 gives all to 2
    assert(got(2L) > got(4L))
    val nodup = Seq((1L, 2L), (3L, 2L), (3L, 4L)).toDF("src", "dst")
    assert(got == Graphs.pageRank(nodup, iters = 3).as[(Long, Long)].collect().toMap)
  }

  test("pageRank: truncating division is deterministic (deg 3 splits)") {
    // 1 -> {2,3,4}: each gets 1000000000000 div 3 = 333333333333
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = Graphs.pageRank(edges, iters = 1).as[(Long, Long)].collect().toMap
    // 150000000000 + (85 * 333333333333) div 100 = 150e9 + 283333333333
    assert(got(2L) == 433333333333L)
    assert(got(2L) == got(3L) && got(3L) == got(4L))
    assert(got(1L) == 150000000000L)
  }

  test("pageRank danglingRedistribute: hand-check, and leak mode is unchanged") {
    // 1 -> 2: node 2 dangles. Round 1 with redistribution:
    // D = r0(2) = 1e12, N = 2, share = 5e11;
    // r1(2) = 150e9 + (85 * (1e12 contrib + 5e11 share)) div 100
    //       = 150e9 + 1275e9 = 1425e9
    // r1(1) = 150e9 + (85 * 5e11) div 100 = 150e9 + 425e9 = 575e9
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graphs.pageRank(edges, iters = 1, danglingRedistribute = true)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 575000000000L, 2L -> 1425000000000L))
    // default (leak) semantics are byte-identical to the pre-flag op
    val leak = Graphs.pageRank(edges, iters = 1).as[(Long, Long)].collect().toMap
    assert(leak == Map(1L -> 150000000000L, 2L -> 1000000000000L))
    // no dangling vertices -> the flag is a no-op
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(Graphs.pageRank(cyc, iters = 3, danglingRedistribute = true)
      .as[(Long, Long)].collect().toMap ==
      Graphs.pageRank(cyc, iters = 3).as[(Long, Long)].collect().toMap)
  }

  test("pageRankLevels: last level equals pageRank, every level present") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val lv = Graphs.pageRankLevels(edges, iters = 3)
      .as[(Long, Int, Long)].collect()
    assert(lv.map(_._2).distinct.sorted.toSeq == Seq(1, 2, 3))
    val last = lv.filter(_._2 == 3).map(t => t._1 -> t._3).toMap
    assert(last == Graphs.pageRank(edges, iters = 3).as[(Long, Long)].collect().toMap)
  }

  /** LAW: for any edge split E = E1 ∪ E2,
    * appendToPageRank(pageRankLevels(E1), E1, E2) equals
    * pageRankLevels(E) row-for-row — the frontier-bounded incremental
    * path is EXACT, not approximate.
    */
  test("appendToPageRank law: incremental == full recompute, property-swept") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val n = 12 + rnd.nextInt(20)
      val all = (1 to (n * 2)).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n + 5).toLong)).distinct
      val cut = 1 + rnd.nextInt(math.max(1, all.size - 1))
      val (p1, p2raw) = all.splitAt(cut)
      // overlap: re-deliver some old edges in the delta batch too
      val p2 = p2raw ++ p1.take(rnd.nextInt(3))
      val full = Graphs.pageRankLevels(all.toDF("src", "dst"), iters = 3)
        .as[(Long, Int, Long)].collect().sorted.toSeq
      val incr = Graphs.appendToPageRank(
          Graphs.pageRankLevels(p1.toDF("src", "dst"), iters = 3),
          p1.toDF("src", "dst"), p2.toDF("src", "dst"), iters = 3)
        .as[(Long, Int, Long)].collect().sorted.toSeq
      assert(incr == full, s"trial $trial: split $cut of ${all.size} edges")
    }
  }

  test("appendToPageRank: empty and fully-duplicate deltas return the old levels") {
    val e1 = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val lv = Graphs.pageRankLevels(e1, iters = 2)
    val old = lv.as[(Long, Int, Long)].collect().sorted.toSeq
    val same = Graphs.appendToPageRank(lv, e1, e1.limit(2), iters = 2)
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(same == old)
  }

  test("appendToPageRank: delta introducing only new nodes ranks them correctly") {
    val e1 = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val e2 = Seq((10L, 11L)).toDF("src", "dst") // disconnected new pair
    val got = Graphs.appendToPageRank(
        Graphs.pageRankLevels(e1, iters = 3), e1, e2, iters = 3)
      .as[(Long, Int, Long)].collect().sorted.toSeq
    val full = Graphs.pageRankLevels(
        Seq((1L, 2L), (2L, 1L), (10L, 11L)).toDF("src", "dst"), iters = 3)
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(got == full)
  }

  test("trustrank: hand-checked chain, zero for seed-unreachable, all-seeds ≡ pageRank") {
    // chain 1→2→3 plus a seedless component 4→5; seed {1} (and a ghost
    // seed 99 absent from the graph, which must be ignored)
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L, 99L).toDF("id")
    val got = Graphs.personalizedPageRank(edges, seeds,
        iters = 2, dampingPct = 85, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    // base = 1000/100·15 = 150; r1 = (150, 850, 0); r2:
    //   1 → 150 + 0            = 150
    //   2 → (85·150) div 100   = 127
    //   3 → (85·850) div 100   = 722
    //   4, 5 → unreachable from any seed: exactly 0
    assert(got == Map(1L -> 150L, 2L -> 127L, 3L -> 722L, 4L -> 0L, 5L -> 0L))
    // with EVERY node seeded the teleport vector is uniform — the
    // recurrence degenerates to plain pageRank, unit for unit
    val all = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (4L, 1L)).toDF("src", "dst")
    val nodes = all.select(col("src").as("id"))
      .unionAll(all.select(col("dst").as("id"))).distinct()
    val ppr = Graphs.personalizedPageRank(all, nodes, iters = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    val pr = Graphs.pageRank(all, iters = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(ppr == pr)
  }
}
