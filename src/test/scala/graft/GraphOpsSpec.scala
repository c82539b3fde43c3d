package graft

import graft.operators.GraphOps

/** G1-G6 iterative graph operators: cycle-safe BFS, cascade closure,
  * orphans, components, ancestor walk (FIXTURES B5 shapes: 2-cycle,
  * missing target, multi-level tree).
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bfs reaches transitively, records first-seen depth, survives cycles") {
    // a -> b -> c -> a (cycle) ; b -> d ; isolated e
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("x", "e")).toDF("src", "dst")
    val roots = Seq("a").toDF("node")
    val got = GraphOps.bfs(edges, roots).collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 2))
  }

  test("bfs respects maxDepth") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val got = GraphOps.bfs(edges, Seq("a").toDF("node"), maxDepth = 1)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a", "b"))
  }

  test("descendants + cascade delete: children removed recursively, others survive") {
    val pc = Seq(("root", "kid1"), ("root", "kid2"), ("kid1", "grand")).toDF("parent", "child")
    val all = Seq("root", "kid1", "kid2", "grand", "bystander").toDF("id")
    val survivors = GraphOps
      .cascadeDeleteSurvivors(all, "id", pc, Seq("root").toDF("node"))
      .as[String].collect().toSet
    assert(survivors == Set("bystander"))
  }

  test("descendantsTree equals bfs-descendants on random parent-pointer trees") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 2 + rnd.nextInt(60)
      // heap-ish random tree: node i's parent is a uniform pick below it
      val pc = (1 until n).map(i => (rnd.nextInt(i).toString, i.toString))
        .toDF("parent", "child")
      val root  = Seq("0").toDF("node")
      val viaBfs  = GraphOps.descendants(pc, root)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toSet
      val viaTree = GraphOps.descendantsTree(pc, root)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toSet
      assert(viaTree == viaBfs, s"tree walk diverged on n=$n")
    }
  }

  test("descendantsTree: a reachable parent-pointer cycle throws loudly at the cap") {
    // a -> b -> a: both have one parent, but the walk from a never drains
    val pc = Seq(("a", "b"), ("b", "a")).toDF("parent", "child")
    val ex = intercept[IllegalStateException] {
      GraphOps.descendantsTree(pc, Seq("a").toDF("node"), maxDepth = 8).count()
    }
    assert(ex.getMessage.contains("cycle"))
  }

  test("orphans: child with absent parent id") {
    val nodes = Seq(
      ("s1", null.asInstanceOf[String]),
      ("s2", "s1"),
      ("s3", "ghost")).toDF("id", "parent_id")
    val got = GraphOps.orphans(nodes, "id", "parent_id").select("id").as[String].collect().toSet
    assert(got == Set("s3"))
  }

  test("connected components: min-label over undirected edges") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val got = GraphOps.connectedComponents(edges, spark)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("nearestMarkedAncestor picks the deepest marked prefix") {
    val paths   = Seq("a/b/c/file.md", "a/x.md", "q/z.md").toDF("path")
    val markers = Seq("a", "a/b/c").toDF("marker")
    val got = GraphOps.nearestMarkedAncestor(paths, "path", markers, "marker")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a/b/c/file.md" -> "a/b/c", "a/x.md" -> "a"))
  }

  test("trianglesPerApex: orientation-invariant, dup-tolerant, exact on K4") {
    // K4 has 4 triangles; apex = smallest vertex of each: {1,2,3} {1,2,4}
    // {1,3,4} at apex 1, {2,3,4} at apex 2. Feed edges in mixed
    // orientation with duplicates — canonicalization must absorb both.
    val k4 = Seq(
      (1L, 2L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L), (3L, 4L),
      (2L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = GraphOps.trianglesPerApex(k4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L))
    // triangle-free graph (a star) -> empty result, self-loops ignored
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 2L)).toDF("src", "dst")
    assert(GraphOps.trianglesPerApex(star).count() === 0)
  }

  test("childrenByParent sorts case-insensitively inside each parent") {
    val nodes = Seq(
      ("1", "p", "beta"), ("2", "p", "Alpha"), ("3", "q", "z")).toDF("id", "parent", "name")
    val got = GraphOps.childrenByParent(nodes, "id", "parent", "name").collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(2))).toMap
    assert(got("p") == Seq("Alpha", "beta"))
  }

  test("ssspRounds equals bounded Bellman-Ford on a random weighted digraph") {
    val rnd = new scala.util.Random(7)
    val n   = 40
    val edgeList = Seq.fill(160)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, 1L + rnd.nextInt(9)))
      .filter { case (s, d, _) => s != d }.distinct
    val rounds = 4
    // JVM reference: k synchronous relaxation sweeps from node 0
    val inf  = GraphOps.Unreached
    var ref  = (0 until n).map(i => i.toLong -> (if (i == 0) 0L else inf)).toMap
    (1 to rounds).foreach { _ =>
      val relaxed = edgeList.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) => ref(s) + w }.min
      }
      ref = ref.map { case (v, d) => v -> math.min(d, relaxed.getOrElse(v, inf)) }
    }
    val got = GraphOps.ssspRounds(edgeList.toDF("src", "dst", "w"), source = 0L, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // compare over nodes that appear in the edge table (isolated JVM-side
    // nodes never enter the DataFrame's node set)
    val present = edgeList.flatMap(e => Seq(e._1, e._2)).toSet
    present.foreach { v =>
      assert(got(v) == math.min(ref(v), inf), s"node $v: got ${got(v)} want ${ref(v)}")
    }
    // a 5th round can only improve: monotone non-increasing distances
    val more = GraphOps.ssspRounds(edgeList.toDF("src", "dst", "w"), 0L, rounds + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    present.foreach(v => assert(more(v) <= got(v)))
  }
}
