package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Directory-catalog source (SURVEY S3/S4/S9, J6, G5): a recursive listing
  * job materializes the filesystem as a `files` table; every reference
  * directory endpoint then becomes a plain DataFrame query over it —
  * listing (S3), marker discovery with depth guard (S4), viewability
  * classification and size gates (S9/F6), marker<->metadata join (J6),
  * nearest-marked-ancestor (G5), autocomplete (F5).
  *
  * Scale: `scan` walks driver-side (reference trees are shallow and bounded
  * by maxDepth=10); `scanDistributed` produces the identical schema via a
  * level-synchronous BFS whose listings run as RDD tasks — the object-store
  * scale path. Consumers don't change between the two.
  */
object FileCatalog {

  /** Text/image extension sets from the reference's viewability classifier
    * (routers/directories.py:205-283) — representative subsets.
    */
  private val TextExts = Set(
    "txt", "md", "markdown", "json", "jsonl", "yaml", "yml", "toml", "xml",
    "csv", "tsv", "py", "scala", "java", "js", "ts", "tsx", "sh", "sql",
    "html", "css", "rs", "go", "c", "h", "cpp", "log", "cfg", "ini", "env")
  private val ImageExts      = Set("png", "jpg", "jpeg", "gif", "webp", "svg", "bmp", "ico")
  private val SpecialNames   = Set("makefile", "dockerfile", "license", "readme")
  private val MaxTextBytes   = 1L * 1024 * 1024  // 1 MB text cap
  private val MaxImageBytes  = 10L * 1024 * 1024 // 10 MB image cap

  /** Recursive walk -> catalog rows. Depth is relative to root (root
    * children = 1); entries deeper than maxDepth are not descended into —
    * the reference's scan guard (amplified_directory_service.py:252-257).
    */
  def scan(spark: SparkSession, root: String, maxDepth: Int = 10): DataFrame = {
    val fs       = FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val rootPath = fs.makeQualified(new Path(root))
    val rows     = scala.collection.mutable.ArrayBuffer.empty[(String, String, Boolean, Long, String, Boolean, Int)]
    def walk(p: Path, depth: Int): Unit = {
      fs.listStatus(p).foreach { st =>
        val name   = st.getPath.getName
        val rel    = st.getPath.toString.stripPrefix(rootPath.toString).stripPrefix("/")
        val hidden = name.startsWith(".")
        val ext    = if (name.contains(".") && !name.startsWith(".")) name.substring(name.lastIndexOf('.') + 1).toLowerCase else ""
        rows += ((rel, name, st.isDirectory, st.getLen, ext, hidden, depth))
        if (st.isDirectory && depth < maxDepth) walk(st.getPath, depth + 1)
      }
    }
    walk(rootPath, 1)
    import spark.implicits._
    rows.toSeq.toDF("path", "name", "is_directory", "size", "ext", "hidden", "depth")
  }

  /** One catalog row plus the absolute path needed to descend further —
    * internal to the distributed scan.
    */
  private final case class ScanEntry(
      path: String, name: String, is_directory: Boolean, size: Long,
      ext: String, hidden: Boolean, depth: Int, abs: String)

  private def entryOf(st: org.apache.hadoop.fs.FileStatus, rootQualified: String, depth: Int): ScanEntry = {
    val name   = st.getPath.getName
    val rel    = st.getPath.toString.stripPrefix(rootQualified).stripPrefix("/")
    val hidden = name.startsWith(".")
    val ext    =
      if (name.contains(".") && !name.startsWith(".")) name.substring(name.lastIndexOf('.') + 1).toLowerCase
      else ""
    ScanEntry(rel, name, st.isDirectory, st.getLen, ext, hidden, depth, st.getPath.toString)
  }

  /** Distributed listing: the same catalog as `scan` (identical schema and
    * rows, order unspecified), produced as a level-synchronous BFS where
    * each level's directory listings run as RDD tasks across the cluster —
    * the scan form that works when the tree is an object-store prefix with
    * millions of entries and a driver-side walk would never finish. One
    * Spark job per level (tree depth is bounded by maxDepth); each level's
    * result is cached so the next level lists from materialized rows.
    *
    * Executors list with the DRIVER's Hadoop configuration (broadcast via
    * `SerializableConfiguration`, the standard pattern) so `spark.hadoop.*`
    * and session-level object-store credentials — the common deployment path
    * for the object-store scale this function exists for — are honored.
    */
  def scanDistributed(spark: SparkSession, root: String, maxDepth: Int = 10): DataFrame = {
    import spark.implicits._
    val sc            = spark.sparkContext
    val rootQualified = {
      val fs = FileSystem.get(new java.net.URI(root), sc.hadoopConfiguration)
      fs.makeQualified(new Path(root)).toString
    }
    val bcConf = sc.broadcast(
      new org.apache.spark.util.SerializableConfiguration(sc.hadoopConfiguration))
    def listLevel(dirs: org.apache.spark.rdd.RDD[(String, Int)]): org.apache.spark.rdd.RDD[ScanEntry] =
      dirs.mapPartitions { it =>
        val conf = bcConf.value.value
        it.flatMap { case (dir, depth) =>
          val p  = new Path(dir)
          val fs = p.getFileSystem(conf)
          fs.listStatus(p).iterator.map(entryOf(_, rootQualified, depth))
        }
      }
    val levels   = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[ScanEntry]]
    var out: org.apache.spark.rdd.RDD[ScanEntry] = sc.emptyRDD[ScanEntry]
    var frontier = sc.parallelize(Seq((rootQualified, 1)), 1)
    var depth    = 1
    var done     = false
    while (depth <= maxDepth && !done) {
      val listed = listLevel(frontier).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      levels += listed
      out = out.union(listed)
      val subdirs = listed.filter(e => e.is_directory && e.depth < maxDepth)
        .map(e => (e.abs, e.depth + 1))
      done = subdirs.isEmpty()
      frontier = subdirs
      depth += 1
    }
    // tuple projection, not the ScanEntry product encoder: Janino fails to
    // compile the generated deserializer for this class (boolean `hidden()`
    // accessor unresolved), and the silent interpreted fallback logs a
    // compiler stack on every call.
    // localCheckpoint + count materializes the result (one cached RDD), so
    // the per-level listing RDDs can be unpersisted here instead of leaking
    // up-to-maxDepth cached RDDs per call for the SparkContext lifetime.
    val rows = out
      .map(e => (e.path, e.name, e.is_directory, e.size, e.ext, e.hidden, e.depth))
      .localCheckpoint()
    rows.count()
    levels.foreach(_.unpersist(false))
    rows.toDF("path", "name", "is_directory", "size", "ext", "hidden", "depth")
  }

  /** S3: immediate children, directories only, hidden excluded, two-key
    * sorted (dirs first, case-insensitive name — O4).
    */
  def listDirectories(catalog: DataFrame): DataFrame =
    catalog
      .filter(col("depth") === 1 && col("is_directory") && !col("hidden"))
      .orderBy(lower(col("name")))

  /** O6, ICU form: the reference's webapp sorts with
    * `localeCompare(sensitivity:'base')` (treeUtils.ts:71) — case- AND
    * accent-insensitive. `lower()` (used by the oracle-checked o4/o6
    * queries, since DuckDB has no matching ICU collation) diverges on
    * accents: lower('Éclair') still sorts after 'zebra' by code point.
    * Spark 4's UNICODE_CI_AI collation is the engine-native equivalent;
    * this is the API path for engine-only consumers.
    */
  def listDirectoriesCollated(catalog: DataFrame): DataFrame =
    catalog
      .filter(col("depth") === 1 && col("is_directory") && !col("hidden"))
      .orderBy(collate(col("name"), "UNICODE_CI_AI"))

  /** S9/F6: viewability classification — CASE WHEN over extension sets,
    * special basenames, and size caps. Pure projection, no UDF.
    */
  def classify(catalog: DataFrame): DataFrame = {
    val isText  = col("ext").isin(TextExts.toSeq: _*) || lower(col("name")).isin(SpecialNames.toSeq: _*)
    val isImage = col("ext").isin(ImageExts.toSeq: _*)
    catalog.withColumn(
      "viewability",
      when(col("is_directory"), "directory")
        .when(isText && col("size") <= MaxTextBytes, "text")
        .when(isText, "text_too_large")
        .when(isImage && col("size") <= MaxImageBytes, "image")
        .when(isImage, "image_too_large")
        .otherwise("binary"))
  }

  /** S4/J6: marker discovery — directories containing a marker file,
    * joined with their sibling metadata file's presence (metadata-less
    * markers are the reference's skip-with-warning case).
    */
  def discoverMarked(catalog: DataFrame, marker: String = ".amplified", metadataFile: String = "metadata.json"): DataFrame = {
    import graft.functions.TextFunctions.pathParent
    val markers = catalog.filter(col("name") === marker)
      .select(pathParent(col("path")).as("dir"))
    val metas = catalog.filter(col("name") === metadataFile)
      .select(pathParent(col("path")).as("dir"), lit(true).as("has_metadata"))
    markers.join(metas, Seq("dir"), "left")
      .select(col("dir"), coalesce(col("has_metadata"), lit(false)).as("has_metadata"))
      .orderBy("dir")
  }

  /** F5/O5: case-insensitive prefix autocomplete with result cap. */
  def autocomplete(catalog: DataFrame, prefix: String, maxResults: Int = 50): DataFrame =
    catalog
      .filter(!col("hidden") && lower(col("name")).startsWith(prefix.toLowerCase))
      .orderBy(col("is_directory").desc, lower(col("name")), col("path"))
      .limit(math.min(maxResults, 200))
}
