package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph / recursive operators (SURVEY §2.10). Spark has no WITH RECURSIVE,
  * so these are iterative DataFrame loops: frontier -> join edges ->
  * anti-join visited -> union. Each iteration is one shuffle round;
  * `localCheckpoint` every few rounds cuts the lineage chain so plans stay
  * bounded at depth (SURVEY §7.4 "recursive queries").
  *
  * Scale: frontier/visited are (key) DataFrames partitioned by the join
  * key; BFS depth on the reference's graphs (mention docs, session trees)
  * is shallow (<= ~10), so the loop count — not the data volume — is small.
  */
object GraphOps {

  private val CheckpointEvery = 3

  /** G1: BFS reachability with cycle detection over an edge table
    * (src, dst), starting from `roots` (single column `node`). Returns
    * (node, depth) of every reached node — visited-set semantics exactly
    * like the reference's mention loader (mention_loader.py:58-129): a node
    * is visited once at its first (shallowest) depth; cycles terminate
    * because the frontier anti-joins the visited set.
    */
  def bfs(edges: DataFrame, roots: DataFrame, maxDepth: Int = 100): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    var visited  = roots.select(col("node")).distinct().withColumn("depth", lit(0))
    var frontier = visited
    var depth    = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = frontier
        .select(col("node").as("src"))
        .join(e, Seq("src"))
        .select(col("dst").as("node"))
        .distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("depth", lit(depth))
      frontier = if (depth % CheckpointEvery == 0) next.localCheckpoint() else next
      visited = (if (depth % CheckpointEvery == 0) visited.localCheckpoint() else visited)
        .unionByName(frontier)
    }
    visited
  }

  /** G2/G3 support: transitive closure of descendants under `roots` over a
    * parent->child edge table — the set a recursive clone copies or a
    * cascade delete removes (routers/sessions.py:368-516;
    * sessions/manager.py:422-452). Output: (node, depth), roots at 0.
    */
  def descendants(parentChild: DataFrame, roots: DataFrame, maxDepth: Int = 100): DataFrame =
    bfs(parentChild.select(col("parent").as("src"), col("child").as("dst")), roots, maxDepth)

  /** G3: cascade delete = anti-join survivors against the closure, then
    * overwrite (the DELETE WHERE idiom without Delta).
    */
  def cascadeDeleteSurvivors(all: DataFrame, idCol: String, parentChild: DataFrame, roots: DataFrame): DataFrame = {
    val doomed = descendants(parentChild, roots).select(col("node").as(idCol))
    all.join(doomed, Seq(idCol), "left_anti")
  }

  /** G5: nearest marked ancestor — explode each path's prefixes, join the
    * marker set, keep the deepest hit (amplified_directory_service.py:71-95).
    * The marker side is small (registry-sized) -> broadcast.
    */
  def nearestMarkedAncestor(paths: DataFrame, pathCol: String, markers: DataFrame, markerCol: String): DataFrame = {
    import graft.functions.TextFunctions.pathPrefixes
    val exploded = paths
      .select(col(pathCol), explode(pathPrefixes(col(pathCol))).as("prefix"))
    exploded
      .join(broadcast(markers.select(col(markerCol).as("prefix"))), Seq("prefix"))
      .groupBy(col(pathCol))
      .agg(max_by(col("prefix"), length(col("prefix"))).as("nearest_marker"))
  }

  /** G6/J1: materialize one tree level — children collected under each
    * parent, sorted per the reference's root-first, case-insensitive order
    * (treeUtils.ts:62-80; collect via groupBy + sort_array keeps the sort
    * inside the aggregated struct, no extra shuffle).
    */
  def childrenByParent(nodes: DataFrame, idCol: String, parentCol: String, nameCol: String): DataFrame =
    nodes
      .groupBy(col(parentCol).as("parent"))
      .agg(
        sort_array(collect_list(struct(lower(col(nameCol)).as("sort_key"),
          col(idCol).as("id"), col(nameCol).as("name")))).as("children"))

  /** J2-flavored orphan detection over the same parent-child table:
    * children whose parent id never appears as a node id.
    */
  def orphans(nodes: DataFrame, idCol: String, parentCol: String): DataFrame = {
    val ids = nodes.select(col(idCol).as("pid")).distinct()
    nodes
      .filter(col(parentCol).isNotNull)
      .join(ids, col(parentCol) === col("pid"), "left_anti")
  }

  /** Connected components over undirected edges via alternating min-label
    * propagation — the scalable "group near-duplicates into clusters" step
    * after Dedup's pair generation. Converges in O(diameter) rounds.
    */
  def connectedComponents(edges: DataFrame, spark: SparkSession, maxIter: Int = 20): DataFrame = {
    // symmetric closure, every node starts as its own component
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
    var changed = true
    var iter    = 0
    while (changed && iter < maxIter) {
      iter += 1
      val propagated = sym
        .select(col("src").as("node"), col("dst"))
        .join(labels, Seq("node"))
        .select(col("dst").as("node"), col("component"))
        .unionByName(labels.select(col("node"), col("component")))
        .groupBy("node")
        .agg(min("component").as("component"))
      val next = if (iter % CheckpointEvery == 0) propagated.localCheckpoint() else propagated
      changed = !next
        .withColumnRenamed("component", "c_new")
        .join(labels.withColumnRenamed("component", "c_old"), Seq("node"))
        .filter(col("c_new") =!= col("c_old"))
        .isEmpty
      labels = next
    }
    labels
  }
}
