package graft
class RenameProbeSpec extends SparkSpec {
  test("probe: hadoop local fs rename onto existing target") {
    val dir = java.nio.file.Files.createTempDirectory("rn").toString
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mk(name: String, content: String) = {
      val out = fs.create(new org.apache.hadoop.fs.Path(p, name), true)
      out.write(content.getBytes("UTF-8")); out.close()
    }
    mk("src", "SRC"); mk("dst", "DST")
    val ok = fs.rename(new org.apache.hadoop.fs.Path(p, "src"), new org.apache.hadoop.fs.Path(p, "dst"))
    val in = fs.open(new org.apache.hadoop.fs.Path(p, "dst"))
    val buf = new Array[Byte](16); val n = in.read(buf); in.close()
    println(s"RENAME_PROBE ok=$ok dstContent=${new String(buf, 0, n)} srcExists=${fs.exists(new org.apache.hadoop.fs.Path(p, "src"))}")
    assert(true)
  }
}
