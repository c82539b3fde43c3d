package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Driver-checkable queries for the graph layer (SURVEY §2.10 G1/G3/G5) —
  * the reference's headline recursive behaviors (mention-graph BFS
  * `mention_loader.py:58-129`, session-tree cascade `manager.py:422-452`)
  * oracle-checked against DuckDB `WITH RECURSIVE` over a deterministic tree
  * derived from `documents`: heap numbering, node n's parent is
  * (n-1) div 2, root 0. The derivation is one integer expression, so the
  * oracle SQL reproduces the edge set exactly; the Spark side runs the REAL
  * iterative GraphOps loops.
  */
object GraphQueries {

  /** parent->child edge table of the derived heap tree: (src, dst). */
  private def treeEdges(t: Tables): DataFrame =
    t.documents
      .filter(col("doc_id") >= 1)
      .select(expr("(doc_id - 1) div 2").as("src"), col("doc_id").as("dst"))

  val g1_bfs_reachability = Q(
    "g1_bfs_reachability",
    """WITH RECURSIVE r AS (
      |  SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
      |  UNION ALL
      |  SELECT e.dst, r.depth + 1
      |  FROM r JOIN (SELECT (doc_id-1)//2 AS src, doc_id AS dst FROM documents WHERE doc_id >= 1
      |               UNION ALL SELECT CAST(3 AS BIGINT), CAST(0 AS BIGINT)) e ON e.src = r.node
      |  WHERE r.depth < 24
      |)
      |SELECT node, CAST(min(depth) AS BIGINT) AS depth FROM r GROUP BY node ORDER BY node""".stripMargin,
  ) { t =>
    // SURVEY G1: BFS reachability with cycle tolerance (mention_loader.py:
    // 58-129 visited-set semantics): every node at its shallowest depth. A
    // back edge 3->0 closes the cycle 0->1->3->0; GraphOps.bfs terminates
    // via the visited anti-join, the oracle via the depth bound + min().
    // Both sides use the SAME depth bound (24): a heap tree over n docs has
    // depth log2(n), so 24 covers ~16M docs — and the oracle's per-path
    // expansion re-walks the whole subtree once per cycle lap, so its bound
    // must stay small anyway.
    import t.spark.implicits._
    val edges = treeEdges(t).unionByName(Seq((3L, 0L)).toDF("src", "dst"))
    GraphOps.bfs(edges, Seq(0L).toDF("node"), maxDepth = 24)
      .select(col("node"), col("depth").cast("long").as("depth"))
      .orderBy("node")
  }

  val g3_cascade_survivors = Q(
    "g3_cascade_survivors",
    """WITH RECURSIVE d AS (
      |  SELECT CAST(1 AS BIGINT) AS node
      |  UNION ALL
      |  SELECT e.dst FROM d JOIN (SELECT (doc_id-1)//2 AS src, doc_id AS dst
      |                            FROM documents WHERE doc_id >= 1) e ON e.src = d.node)
      |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT node FROM d)
      |ORDER BY doc_id""".stripMargin,
  ) { t =>
    // SURVEY G3: cascade delete of the subtree rooted at node 1
    // (routers/sessions.py delete-with-children): survivors = anti-join
    // against the transitive closure, via the REAL cascadeDeleteSurvivors.
    import t.spark.implicits._
    val parentChild = treeEdges(t)
      .select(col("src").as("parent"), col("dst").as("child"))
    GraphOps
      .cascadeDeleteSurvivors(
        t.documents.select("doc_id"), "doc_id", parentChild, Seq(1L).toDF("node"))
      .orderBy("doc_id")
  }

  val g5_ancestor_walk = Q(
    "g5_ancestor_walk",
    """WITH RECURSIVE a AS (
      |  SELECT doc_id AS start, doc_id AS node, 0 AS depth FROM documents WHERE doc_id % 97 = 0
      |  UNION ALL
      |  SELECT a.start, (a.node-1)//2, a.depth+1 FROM a WHERE a.node >= 1)
      |SELECT start, node AS ancestor, CAST(depth AS BIGINT) AS depth FROM a
      |ORDER BY start, depth""".stripMargin,
  ) { t =>
    // SURVEY G5: per-start ancestor chain to the root (manager.py:422-452)
    // via the REAL GraphOps.ancestorWalk — lineages are per-start, not
    // globally deduplicated like BFS.
    val childParent = treeEdges(t)
      .select(col("dst").as("child"), col("src").as("parent"))
    val starts = t.documents
      .filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("start"))
    GraphOps.ancestorWalk(childParent, starts)
      .select(col("start"), col("node").as("ancestor"), col("depth").cast("long").as("depth"))
      .orderBy("start", "depth")
  }

  val g2_clone_subtree = Q(
    "g2_clone_subtree",
    """WITH RECURSIVE d AS (
      |  SELECT CAST(1 AS BIGINT) AS node
      |  UNION ALL
      |  SELECT e.dst FROM d JOIN (SELECT (doc_id-1)//2 AS src, doc_id AS dst
      |                            FROM documents WHERE doc_id >= 1) e ON e.src = d.node)
      |SELECT CAST(doc_id AS VARCHAR) || '_c' AS session_id,
      |       CASE WHEN doc_id = 1 THEN CAST((doc_id-1)//2 AS VARCHAR)
      |            ELSE CAST((doc_id-1)//2 AS VARCHAR) || '_c' END AS parent_session_id,
      |       source AS amplified_dir
      |FROM documents WHERE doc_id IN (SELECT node FROM d)
      |ORDER BY session_id""".stripMargin,
  ) { t =>
    // SURVEY G2: recursive subtree clone (routers/sessions.py:368-516) via
    // the REAL SessionStore.cloneSubtree over a session tree derived from
    // the heap-numbered documents graph — ids remapped `<old>_c`, parent
    // links re-pointed into the clone, the root keeping its original
    // parent. The oracle recomputes the closure + remap in SQL.
    import graft.api.{model, SessionStore}
    import org.apache.spark.sql.Encoders
    val sessions = t.documents.select(
      col("doc_id").cast("string").as("session_id"),
      col("lang").as("name"),
      when(col("doc_id") >= 1, expr("(doc_id - 1) div 2").cast("string")).as("parent_session_id"),
      col("source").as("amplified_dir"),
      lit("active").as("status"),
      lit("2026-01-01 00:00:00").cast("timestamp").as("created_at"),
      lit(null).cast("timestamp").as("ended_at"),
      col("lang").as("profile_name"),
      (col("doc_id") % 100).as("message_count"),
      (col("doc_id") % 1000).as("token_usage"),
      lit(false).as("is_unread"),
    ).as(Encoders.product[model.Session])
    SessionStore(sessions).cloneSubtree("1", "c")(t.spark)
      .toDF()
      .select("session_id", "parent_session_id", "amplified_dir")
      .orderBy("session_id")
  }

  val g7_connected_components = Q(
    "g7_connected_components",
    """SELECT node, node - node % 7 AS component FROM (
      |  SELECT DISTINCT node FROM (
      |    SELECT doc_id AS node FROM documents WHERE doc_id % 7 <> 0
      |    UNION ALL
      |    SELECT doc_id - 1 FROM documents WHERE doc_id % 7 <> 0))
      |ORDER BY node""".stripMargin,
  ) { t =>
    // Connected components — the "cluster near-duplicate pairs" step after
    // Dedup's candidate generation (SURVEY §2.12 extension), via the REAL
    // min-label GraphOps.connectedComponents loop. Edges chain consecutive
    // doc ids within each group of 7, so the expected component label of
    // every node is its group floor (= the min id, which is what min-label
    // propagation converges to); the oracle enumerates edge-touched nodes
    // with that closed form. Converges in O(chain length) = 6 rounds.
    val edges = t.documents
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id").as("src"), (col("doc_id") - 1).as("dst"))
    GraphOps.connectedComponents(edges, t.spark)
      .orderBy("node")
  }

  val x50_pagerank = Q(
    "x50_pagerank",
    """WITH e AS (SELECT (doc_id-1)//2 AS src, doc_id AS dst FROM documents WHERE doc_id >= 1
      |           UNION ALL SELECT CAST(3 AS BIGINT), CAST(0 AS BIGINT)),
      |nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      |c AS (SELECT count(*) AS n FROM nodes),
      |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
      |r0 AS (SELECT node, CAST(1 AS DOUBLE)/c.n AS r FROM nodes, c),
      |r1 AS (SELECT nd.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))/c.n + CAST(0.85 AS DOUBLE)*coalesce(
      |         (SELECT SUM(p.r/d.outdeg) FROM e JOIN r0 p ON p.node = e.src
      |          JOIN deg d ON d.src = e.src WHERE e.dst = nd.node), 0) AS r
      |       FROM nodes nd, c),
      |r2 AS (SELECT nd.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))/c.n + CAST(0.85 AS DOUBLE)*coalesce(
      |         (SELECT SUM(p.r/d.outdeg) FROM e JOIN r1 p ON p.node = e.src
      |          JOIN deg d ON d.src = e.src WHERE e.dst = nd.node), 0) AS r
      |       FROM nodes nd, c),
      |r3 AS (SELECT nd.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))/c.n + CAST(0.85 AS DOUBLE)*coalesce(
      |         (SELECT SUM(p.r/d.outdeg) FROM e JOIN r2 p ON p.node = e.src
      |          JOIN deg d ON d.src = e.src WHERE e.dst = nd.node), 0) AS r
      |       FROM nodes nd, c)
      |SELECT node, r FROM r3 ORDER BY node""".stripMargin,
  ) { t =>
    // PageRank(3 iterations, d=0.85) over the same tree-plus-back-edge
    // graph as g1 — the oracle unrolls the recurrence as three chained
    // CTEs with a correlated inflow subquery per node. Bit-exact across
    // engines: the teleport constant is written as (1 - 0.85) on BOTH
    // sides (the parsed literal 0.15 is a DIFFERENT double than the
    // computed 1-0.85), in-degrees on this graph are 1, and every step
    // is a deterministic IEEE double op.
    import t.spark.implicits._
    val edges = treeEdges(t).unionByName(Seq((3L, 0L)).toDF("src", "dst"))
    GraphOps.pagerank(edges, iters = 3, damping = 0.85)
      .orderBy("node")
  }

  val x53_incremental_cc = Q(
    "x53_incremental_cc",
    """WITH base AS (
      |  SELECT doc_id AS src, doc_id - 1 AS dst FROM documents
      |  WHERE doc_id % 7 NOT IN (0, 4)),
      |batch AS (
      |  SELECT doc_id AS src, doc_id - 1 AS dst FROM documents
      |  WHERE doc_id % 7 = 4 AND (doc_id // 7) % 2 = 0),
      |nodes AS (
      |  SELECT DISTINCT node FROM (
      |    SELECT src AS node FROM base UNION ALL SELECT dst FROM base
      |    UNION ALL SELECT src FROM batch UNION ALL SELECT dst FROM batch))
      |SELECT node,
      |       CASE WHEN (node // 7) % 2 = 0 OR node % 7 < 4
      |            THEN (node // 7) * 7 ELSE (node // 7) * 7 + 4 END AS component
      |FROM nodes ORDER BY node""".stripMargin,
  ) { t =>
    // Incremental CC: the base labeling sees each group-of-7 chain with
    // its middle link (4 -> 3) missing — every group splits into a lower
    // {g..g+3} (label g) and upper {g+4..g+6} (label g+4) component. The
    // batch delivers the missing middle links for EVEN group indexes
    // only, so the merged labeling rejoins even groups (label g) while
    // odd groups stay split — the closed form the oracle enumerates.
    // mergeNewEdges runs the fixpoint only on the batch's label pairs;
    // the corpus labeling is touched by broadcast lookups alone.
    val base = t.documents
      .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 7 =!= 4)
      .select(col("doc_id").as("src"), (col("doc_id") - 1).as("dst"))
    val batch = t.documents
      .filter(col("doc_id") % 7 === 4 && (expr("doc_id div 7") % 2) === 0)
      .select(col("doc_id").as("src"), (col("doc_id") - 1).as("dst"))
    val baseLabels = GraphOps.connectedComponents(base, t.spark)
    GraphOps.mergeNewEdges(baseLabels, batch, t.spark).orderBy("node")
  }

  val x60_triangle_count = Q(
    "x60_triangle_count",
    """WITH e AS (
      |  SELECT d1.doc_id AS src, d2.doc_id AS dst
      |  FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
      |  UNION ALL
      |  SELECT d1.doc_id, d2.doc_id
      |  FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 2
      |  WHERE d1.doc_id % 3 = 0)
      |SELECT e1.src AS apex, count(*) AS n_triangles
      |FROM e e1 JOIN e e2 ON e2.src = e1.dst JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
      |GROUP BY e1.src ORDER BY apex""".stripMargin,
  ) { t =>
    // Triangle counting on the chain+skip graph: edges (i, i+1) for every
    // doc plus (i, i+2) when i % 3 = 0 — each skip edge closes the wedge
    // i -> i+1 -> i+2 into exactly one triangle, so apexes are the %3==0
    // nodes with both chain successors present. Both edge families are
    // built by self-joins so every endpoint exists in the corpus (the
    // oracle's join form is identical); since this derived edge set is
    // already oriented ascending and distinct, trianglesPerApex's
    // canonicalization is a no-op passthrough on it.
    val d = t.documents.select("doc_id")
    val chain = d.as("x")
      .join(d.as("y"), col("y.doc_id") === col("x.doc_id") + 1)
      .select(col("x.doc_id").as("src"), col("y.doc_id").as("dst"))
    val skip = d.as("x")
      .join(d.as("y"), col("y.doc_id") === col("x.doc_id") + 2)
      .where(col("x.doc_id") % 3 === 0)
      .select(col("x.doc_id").as("src"), col("y.doc_id").as("dst"))
    GraphOps.trianglesPerApex(chain.unionByName(skip))
  }

  /** x76: weighted single-source shortest paths, bounded-round Bellman-
    * Ford (`GraphOps.ssspRounds`) over the g1/x50 tree-plus-back-edge
    * graph with deterministic integer weights w = 1 + dst mod 7 (back
    * edge 3→0 weighs 5). Three synchronous relaxation sweeps from node 0 —
    * the Pregel-superstep form whose recurrence the oracle unrolls exactly
    * as three chained CTEs (the x50 trick, in exact integer arithmetic
    * instead of doubles). Only nodes reached within 3 hops report a
    * finite distance; the rest stay at the sentinel and are filtered.
    */
  val x76_sssp = Q(
    "x76_sssp",
    """WITH e AS (SELECT (doc_id-1)//2 AS src, doc_id AS dst, 1 + doc_id % 7 AS w
      |           FROM documents WHERE doc_id >= 1
      |           UNION ALL SELECT CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(5 AS BIGINT)),
      |nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      |d0 AS (SELECT node, CASE WHEN node = 0 THEN CAST(0 AS BIGINT)
      |                         ELSE CAST(999999999 AS BIGINT) END AS dist FROM nodes),
      |d1 AS (SELECT p.node, LEAST(p.dist, COALESCE(
      |         (SELECT MIN(q.dist + e.w) FROM e JOIN d0 q ON q.node = e.src
      |          WHERE e.dst = p.node), 999999999)) AS dist FROM d0 p),
      |d2 AS (SELECT p.node, LEAST(p.dist, COALESCE(
      |         (SELECT MIN(q.dist + e.w) FROM e JOIN d1 q ON q.node = e.src
      |          WHERE e.dst = p.node), 999999999)) AS dist FROM d1 p),
      |d3 AS (SELECT p.node, LEAST(p.dist, COALESCE(
      |         (SELECT MIN(q.dist + e.w) FROM e JOIN d2 q ON q.node = e.src
      |          WHERE e.dst = p.node), 999999999)) AS dist FROM d2 p)
      |SELECT node, dist FROM d3 WHERE dist < 999999999 ORDER BY node""".stripMargin,
  ) { t =>
    import t.spark.implicits._
    val edges = treeEdges(t)
      .withColumn("w", lit(1L) + col("dst") % 7)
      .unionByName(Seq((3L, 0L, 5L)).toDF("src", "dst", "w"))
    GraphOps.ssspRounds(edges, source = 0L, rounds = 3)
      .filter(col("dist") < GraphOps.Unreached)
      .orderBy("node")
  }

  val all: Seq[Q] = Seq(
    g1_bfs_reachability, g2_clone_subtree, g3_cascade_survivors, g5_ancestor_walk,
    g7_connected_components, x50_pagerank, x53_incremental_cc, x60_triangle_count,
    x76_sssp)
}
