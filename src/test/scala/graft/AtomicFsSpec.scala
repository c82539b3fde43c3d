package graft

import graft.sources.AtomicFs

/** The atomic primitives the claim/publish protocols rest on — and the
  * local-FS behavior they exist to work around (two concurrent
  * fs.create(overwrite=false)/fs.rename calls can interleave their
  * exists() checks; see the AtomicFs scaladoc and the concurrent
  * deleteWhere race test that caught it).
  */
class AtomicFsSpec extends SparkSpec {

  private def fsAndDir() = {
    val dir = java.nio.file.Files.createTempDirectory("afs").toString
    val p   = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  test("claim: first caller wins, second loses, under heavy thread contention exactly one wins") {
    val (fs, dir) = fsAndDir()
    val p = new org.apache.hadoop.fs.Path(dir, "claim")
    assert(AtomicFs.claim(fs, p))
    assert(!AtomicFs.claim(fs, p))
    // 16 threads race a fresh claim name: exactly one winner, every time
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    (1 to 20).foreach { round =>
      val target = new org.apache.hadoop.fs.Path(dir, s"c$round")
      val wins = Await.result(
        Future.sequence((1 to 16).map(_ => Future(AtomicFs.claim(fs, target)))),
        30.seconds).count(identity)
      assert(wins == 1, s"round $round: $wins winners")
    }
  }

  test("publish: installs complete content iff target absent; loser's tmp is consumed") {
    val (fs, dir) = fsAndDir()
    def mkTmp(name: String, content: String) = {
      val p = new org.apache.hadoop.fs.Path(dir, name)
      val out = fs.create(p, true); out.write(content.getBytes("UTF-8")); out.close(); p
    }
    val target = new org.apache.hadoop.fs.Path(dir, "manifest")
    assert(AtomicFs.publish(fs, mkTmp("t1", "FIRST"), target))
    assert(!AtomicFs.publish(fs, mkTmp("t2", "SECOND"), target),
      "publish onto an existing target must lose")
    val in = fs.open(target); val buf = new Array[Byte](16); val n = in.read(buf); in.close()
    assert(new String(buf, 0, n) == "FIRST", "loser must never replace the winner's content")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "t1")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(dir, "t2")), "tmps must be consumed")
  }

  test("the hadoop local-FS rename this replaces: fails on existing target with dst intact") {
    // pins the sequential behavior AtomicFs relies on being insufficient
    // only under CONCURRENCY (the check-then-act window) — if this ever
    // starts overwriting, publish() on non-local paths needs revisiting
    val (fs, dir) = fsAndDir()
    def mk(name: String, content: String) = {
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
      out.write(content.getBytes("UTF-8")); out.close()
    }
    mk("src", "SRC"); mk("dst", "DST")
    assert(!fs.rename(new org.apache.hadoop.fs.Path(dir, "src"), new org.apache.hadoop.fs.Path(dir, "dst")))
    val in = fs.open(new org.apache.hadoop.fs.Path(dir, "dst"))
    val buf = new Array[Byte](8); val n = in.read(buf); in.close()
    assert(new String(buf, 0, n) == "DST")
  }
}
