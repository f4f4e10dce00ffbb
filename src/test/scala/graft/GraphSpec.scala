package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Gates for the quantized PageRank operator: structural correctness
  * (symmetry, hub dominance), agreement with a naive float PageRank,
  * and partition invariance of the integer arithmetic. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String)], iters: Int,
      parts: Int = 4): Map[String, Long] =
    Graph.pageRankQuantized(
        edges.toDF("src", "dst").repartition(parts), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("symmetric two-node graph: equal ranks; star: hub dominates") {
    val pair = ranksOf(Seq(("a", "b"), ("b", "a")), iters = 3)
    assert(pair("a") === pair("b"))
    // undirected 4-spoke star: the hub collects every spoke's full
    // contribution, spokes split the hub's four ways
    val star = Seq("b", "c", "d", "e").flatMap(s =>
      Seq(("hub", s), (s, "hub")))
    val r = ranksOf(star, iters = 3)
    assert(Seq("b", "c", "d", "e").forall(s => r("hub") > 2 * r(s)))
    assert(r("b") === r("c") && r("c") === r("d") && r("d") === r("e"))
  }

  test("quantized ranks track a naive float PageRank within quantization error") {
    val rnd = new scala.util.Random(42)
    val nodes = (0 until 30).map(i => s"n$i")
    val base = (0 until 120).map { _ =>
      (nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size)))
    }.filter(e => e._1 != e._2).distinct
    val edges = (base ++ base.map(_.swap)).distinct // undirected
    val got = ranksOf(edges, iters = 3)
    // naive reference in doubles
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var rank = nodes.filter(out.contains).map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      val inflow = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        rank(s) / out(s).size
      }.sum).toMap
      rank = rank.keys.map(n => n -> (0.15 + 0.85 * inflow.getOrElse(n, 0.0)))
        .toMap
    }
    for ((n, r) <- rank)
      assert(math.abs(got(n) / 1e6 - r) < 1e-3,
        s"node $n quantized ${got(n) / 1e6} vs float $r")
  }

  test("bfs levels: min hop distance, unreachable nodes excluded") {
    import graft.operators.Graph
    // path a→b→c→d→e plus a shortcut a→c and an unreachable island x→y
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("a", "c"), ("x", "y")).toDF("src", "dst")
    val got = Graph.bfsLevels(edges, Seq("a").toDF("node"), maxHops = 3)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // c is 1 hop via the shortcut, d is 2, e is 3; x/y unreachable
    assert(got === Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2, "e" -> 3))
    // maxHops truncates: e is beyond 2 hops
    val short = Graph.bfsLevels(edges, Seq("a").toDF("node"), maxHops = 2)
      .collect().map(_.getString(0)).toSet
    assert(short === Set("a", "b", "c", "d"))
  }

  test("triangle counts: goldens and naive-enumeration parity") {
    def counts(edges: Seq[(String, String)]): Map[String, Long] =
      Graph.triangleCounts(edges.toDF("src", "dst"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // K4: every node is in C(3,2)=3 triangles; direction/dup/self noise
    // must be ignored
    val k4 = (for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a != b
    } yield (a, b)) ++ Seq(("a", "a"), ("a", "b"))
    assert(counts(k4) === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    // triangle + pendant: pendant node is in no triangle → absent
    assert(counts(Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "p")))
      === Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
    // bipartite graphs have no triangles
    assert(counts(Seq(("s1", "c1"), ("s1", "c2"), ("s2", "c1"),
      ("s2", "c2"))) === Map.empty)
    // random graph (hub-heavy so degree ordering differs from
    // lexicographic): parity against naive O(n^3) enumeration
    val rnd = new scala.util.Random(11)
    val es = ((0 until 150).map { _ =>
      (s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}")
    } ++ (0 until 24).map(i => ("n0", s"n${i + 1}"))) // n0 is a hub
      .filter(e => e._1 != e._2)
    val und = es.map(e =>
      if (e._1 < e._2) e else e.swap).distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    val naive = scala.collection.mutable.Map.empty[String, Long]
    for {
      i <- nodes; j <- nodes if i < j && adj(i)(j)
      k <- nodes if j < k && adj(i)(k) && adj(j)(k)
    } Seq(i, j, k).foreach(n =>
      naive(n) = naive.getOrElse(n, 0L) + 1L)
    assert(counts(es) === naive.toMap)
  }

  test("integer arithmetic is partition-invariant") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 200).map { _ =>
      (s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}")
    }.filter(e => e._1 != e._2).distinct
    val und = (edges ++ edges.map(_.swap)).distinct
    assert(ranksOf(und, 3, parts = 1) === ranksOf(und, 3, parts = 13))
  }

  private def coreOf(edges: Seq[(String, String)], k: Int,
      rounds: Int): Map[String, Long] = {
    val und = (edges ++ edges.map(_.swap)).distinct
    Graph.kCore(und.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("2-core peels chains of tendrils, keeps cycles; cascade needs rounds") {
    // triangle with a 3-node tail: the tail peels off one node per
    // round (degree-1 end first — the cascade the synchronous rounds
    // model), the triangle survives with degree 2 everywhere
    val g = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("c", "t1"), ("t1", "t2"), ("t2", "t3"))
    assert(coreOf(g, k = 2, rounds = 4)
      === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // too few rounds: the cascade is not finished — t1 still present
    // after round 1 (t2 only lost t3)
    assert(coreOf(g, k = 2, rounds = 1).contains("t1"))
    // a pure tree has an empty 2-core
    assert(coreOf(Seq(("r", "x"), ("r", "y"), ("x", "z")),
      k = 2, rounds = 3).isEmpty)
  }

  test("g5 harness graph: 5 rounds reach the k-core fixpoint at sf0.001") {
    val s = spark
    val g5 = graft.queries.GraphQueries.queries("g5_kcore")(
      s, "/root/testdata/sf0.001")
    val got = g5.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "2-core should be non-empty on the fixture")
    // fixpoint: every member's degree within the core is >= k — the
    // defining property of the k-core; if 5 rounds were too few some
    // node would still sit below k
    assert(got.values.forall(_ >= 2L),
      s"nodes below k survived: ${got.filter(_._2 < 2L)}")
    // and one MORE round changes nothing (true fixpoint, not merely
    // all-degrees-look-right)
    import graft.Tables
    val li = Tables(s, "/root/testdata/sf0.001", "lineitem")
    val or = Tables(s, "/root/testdata/sf0.001", "orders")
    val pairs = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .groupBy(concat(lit("s"), col("l_suppkey")).as("i"),
        concat(lit("c"), col("o_custkey")).as("j"))
      .agg(countDistinct(col("o_orderkey")).as("n"))
      .filter(col("n") >= 2).select(col("i"), col("j"))
    val edges = pairs.select(col("i").as("src"), col("j").as("dst"))
      .union(pairs.select(col("j").as("src"), col("i").as("dst")))
    val more = Graph.kCore(edges, k = 2, rounds = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(more === got)
  }

  private def distsOf(edges: Seq[(String, String, Long)], rounds: Int)
      : Map[String, Long] =
    Graph.sssp(edges.toDF("src", "dst", "w"),
        Seq("a").toDF("node"), rounds)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("sssp: cheap long path beats heavy direct edge; hop bound respected") {
    // a→e direct costs 10; a→b→c→d→e costs 4 but needs 4 hops
    val g = Seq(("a", "e", 10L), ("a", "b", 1L), ("b", "c", 1L),
      ("c", "d", 1L), ("d", "e", 1L), ("x", "y", 1L))
    // round 1: only ≤1-edge paths exist — direct edge wins
    assert(distsOf(g, rounds = 1) === Map("a" -> 0L, "e" -> 10L, "b" -> 1L))
    // round 4+: the cheap 4-hop path is found; island unreachable
    val full = distsOf(g, rounds = 4)
    assert(full === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L,
      "e" -> 4L))
    // fixpoint: extra rounds change nothing
    assert(distsOf(g, rounds = 6) === full)
  }

  test("sssp matches a driver-side Dijkstra on a random weighted graph") {
    val rnd = new scala.util.Random(7)
    val nodes = ("a" +: (0 until 25).map(i => s"n$i")).toIndexedSeq
    val base = (0 until 90).map { _ =>
      (nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size)),
        1L + rnd.nextInt(9))
    }.filter(e => e._1 != e._2).distinctBy(e => (e._1, e._2))
    val edges = (base ++ base.map(e => (e._2, e._1, e._3)))
      .distinctBy(e => (e._1, e._2))
    // reference: plain Dijkstra over the same adjacency
    val adj = edges.groupBy(_._1).view
      .mapValues(_.map(e => (e._2, e._3))).toMap
    val dist = scala.collection.mutable.Map("a" -> 0L)
    val pq = scala.collection.mutable.PriorityQueue(
      (0L, "a"))(Ordering.by(-_._1))
    val settled = scala.collection.mutable.Set.empty[String]
    while (pq.nonEmpty) {
      val (d, n) = pq.dequeue()
      if (!settled(n)) {
        settled += n
        for ((m, w) <- adj.getOrElse(n, Nil)
             if dist.get(m).forall(_ > d + w)) {
          dist(m) = d + w; pq.enqueue((d + w, m))
        }
      }
    }
    // 26 nodes → any shortest path has < 26 edges: 25 rounds suffice
    assert(distsOf(edges, rounds = 25) === dist.toMap)
  }
}
