package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftStorage

/** The timeline's publish primitives (ref: the reference's
  * HoodieActiveTimeline createImmutableFileInPath, which streams into
  * the live path — our contract is stricter: full-content-or-absent).
  *
  *  - createImmutable: create-if-absent (the OCC backstop) AND the path
  *    becomes visible only with its full content — a reader listing the
  *    meta dir must never parse a truncated instant (caught live by the
  *    concurrent two-writer model walk).
  *  - overwrite: readers see the old content or the new, never a
  *    truncated file.
  */
class StorageAtomicsSpec extends AnyFunSuite {

  private def freshStorage(): GraftStorage = {
    val dir = Files.createTempDirectory("storage_atomics_").toString
    val st = new GraftStorage(new Path(dir), new Configuration())
    st.fs.mkdirs(st.metaDir)
    st
  }

  test("createImmutable publishes full content and fails on an existing path") {
    val st = freshStorage()
    val p = new Path(st.metaDir, "0001.commit.completed")
    st.createImmutable(p, "first")
    assert(st.readString(p) === "first")
    intercept[java.nio.file.FileAlreadyExistsException](
      st.createImmutable(p, "second"))
    assert(st.readString(p) === "first", "loser must not clobber the winner")
    // staged temp file is consumed by the publish
    assert(st.fs.listStatus(st.tempDir).forall(!_.isFile),
      "staged meta temp file leaked after publish")
  }

  test("N racing createImmutable calls: exactly one wins, content never torn") {
    val st = freshStorage()
    for (round <- 1 to 20) {
      val p = new Path(st.metaDir, s"race$round.commit.completed")
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (1 to 8).map { i =>
        new Thread(() => {
          start.await()
          try { st.createImmutable(p, s"payload-from-writer-$i-" + ("x" * 512)); wins.incrementAndGet() }
          catch { case _: java.io.IOException => () } // FileAlreadyExists is an IOException
        })
      }
      threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
      assert(wins.get() === 1, s"round $round: ${wins.get()} writers claimed the create")
      val content = st.readString(p)
      assert(content.startsWith("payload-from-writer-") && content.endsWith("x" * 512),
        s"round $round: torn content '${content.take(40)}...' (${content.length} chars)")
    }
  }

  test("overwrite replaces content atomically and cleans its staging") {
    val st = freshStorage()
    val p = new Path(st.metaDir, "table_config.json")
    st.overwrite(p, "v1")
    assert(st.readString(p) === "v1")
    st.overwrite(p, "v2-" + ("y" * 256))
    assert(st.readString(p) === "v2-" + ("y" * 256))
    assert(st.fs.listStatus(st.tempDir).forall(!_.isFile),
      "staged meta temp file leaked after overwrite")
  }

  test("claim heartbeat: refreshMarker refreshes mtime and detects a lost claim") {
    val st = freshStorage()
    val p = new Path(st.metaDir, "0005.compaction.inflight")
    st.createImmutable(p, "tok-A")
    assert(st.probeSetTimes(p), "local fs supports setTimes")
    st.fs.setTimes(p, 1000L, -1)
    assert(st.refreshMarker(p, "tok-A", canSetTimes = true))
    assert(st.fs.getFileStatus(p).getModificationTime > 1000L,
      "heartbeat must advance the marker mtime")
    // foreign token: a breaker judged us crashed and re-claimed — the
    // zombie owner must observe the loss, and must NOT clobber the new
    // owner's marker
    assert(!st.refreshMarker(p, "tok-B", canSetTimes = true))
    assert(st.readString(p) === "tok-A")
    // missing marker: execution completed and cleaned it — benign
    st.delete(p)
    assert(st.refreshMarker(p, "tok-A", canSetTimes = true))
  }

  test("claim heartbeat falls back to an in-place rewrite-refresh where setTimes is unsupported") {
    val dir = Files.createTempDirectory("storage_nost_").toString
    val conf = new Configuration()
    conf.set("fs.nost.impl", classOf[NoSetTimesFileSystem].getName)
    conf.set("fs.nost.impl.disable.cache", "true")
    val st = new GraftStorage(new Path("nost:" + dir), conf)
    st.fs.mkdirs(st.metaDir)
    val p = new Path(st.metaDir, "0005.compaction.inflight")
    st.createImmutable(p, "tok-A")
    assert(!st.probeSetTimes(p), "probe must detect the unsupported setTimes")
    val m0 = st.fs.getFileStatus(p).getModificationTime
    Thread.sleep(50)
    assert(st.refreshMarker(p, "tok-A", canSetTimes = false))
    assert(st.fs.getFileStatus(p).getModificationTime > m0,
      "rewrite-refresh must advance the marker mtime")
    assert(st.readString(p) === "tok-A", "refresh must preserve the claim token")
  }

  test("rewrite-refresh never leaves a missing-marker window") {
    // the old staged-overwrite fallback deleted the marker before
    // renaming the staged copy in; a concurrent claimer polling in that
    // window reads "owner finished" and steals a healthy claim with
    // zero TTL wait. The in-place rewrite must keep the path present
    // through every beat.
    val dir = Files.createTempDirectory("storage_nost3_").toString
    val conf = new Configuration()
    conf.set("fs.nost.impl", classOf[NoSetTimesFileSystem].getName)
    conf.set("fs.nost.impl.disable.cache", "true")
    val st = new GraftStorage(new Path("nost:" + dir), conf)
    st.fs.mkdirs(st.metaDir)
    val p = new Path(st.metaDir, "0007.compaction.inflight")
    st.createImmutable(p, "tok-A")
    @volatile var missing = false
    @volatile var stop = false
    val poller = new Thread(() => {
      while (!stop) if (!st.exists(p)) missing = true
    })
    poller.start()
    try for (_ <- 1 to 200) assert(st.refreshMarker(p, "tok-A", canSetTimes = false))
    finally { stop = true; poller.join() }
    assert(!missing, "a concurrent claimer observed the marker missing mid-beat")
    assert(st.readString(p) === "tok-A")
  }

  test("read paths survive scan-only credentials: .new fallback without healing") {
    val dir = Files.createTempDirectory("storage_deny_").toString
    // fixture written through the normal local fs: only the .new sibling
    // of an interrupted overwrite survived the crash
    val local = new GraftStorage(new Path(dir), new Configuration())
    local.fs.mkdirs(local.metaDir)
    local.createImmutable(new Path(local.metaDir, "table_config.json.new"), "cfg-v2")
    local.createImmutable(new Path(local.metaDir, "0001.commit.completed"), "{}")
    val conf = new Configuration()
    conf.set("fs.denyfs.impl", classOf[DenyMutationsFileSystem].getName)
    conf.set("fs.denyfs.impl.disable.cache", "true")
    val ro = new GraftStorage(new Path("denyfs:" + dir), conf)
    // the heal rename is denied — the surviving sibling is read directly
    assert(ro.readOverwritable(new Path(ro.metaDir, "table_config.json")) === "cfg-v2")
    // the listing surfaces the orphan under its TARGET name (so loads
    // resolve it via readOverwritable) instead of failing outright
    val names = ro.listNames(ro.metaDir)
    assert(names.contains("table_config.json"))
    assert(names.contains("0001.commit.completed"))
    assert(!names.exists(_.endsWith(".new")))
    // and a marker that persists but cannot be refreshed reports loss
    assert(!ro.refreshMarker(
      new Path(ro.metaDir, "0001.commit.completed"), "{}", canSetTimes = false))
  }

  test("overwrite works via the .new-swap tier on a scheme without a FileContext binding") {
    val dir = Files.createTempDirectory("storage_nost2_").toString
    val conf = new Configuration()
    conf.set("fs.nost.impl", classOf[NoSetTimesFileSystem].getName)
    conf.set("fs.nost.impl.disable.cache", "true")
    val st = new GraftStorage(new Path("nost:" + dir), conf)
    st.fs.mkdirs(st.metaDir)
    val p = new Path(st.metaDir, "table_config.json")
    st.createImmutable(p, "v1")
    st.overwrite(p, "v2")
    assert(st.readString(p) === "v2")
  }
}

/** Local filesystem whose setTimes is unsupported — the shape of several
  * object-store connectors; drives the heartbeat's overwrite fallback and
  * the non-FileContext overwrite tier.
  */
class NoSetTimesFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "nost"
  override def getUri: java.net.URI = java.net.URI.create("nost:///")
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
    throw new UnsupportedOperationException("setTimes is not supported")
}

/** Local filesystem that denies every mutation — the shape of scan-only
  * credentials on an object store.
  */
class DenyMutationsFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "denyfs"
  override def getUri: java.net.URI = java.net.URI.create("denyfs:///")
  private def deny[T]: T =
    throw new java.io.IOException("permission denied (scan-only credentials)")
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit = deny
  override def rename(src: Path, dst: Path): Boolean = deny
  override def delete(p: Path, recursive: Boolean): Boolean = deny
  override def mkdirs(p: Path,
      perm: org.apache.hadoop.fs.permission.FsPermission): Boolean = deny
  override def create(p: Path,
      perm: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = deny
  // RawLocalFileSystem's non-permission create overload does NOT route
  // through the permission variant — deny it too, or fs.create(p, true)
  // slips past the scan-only simulation
  override def create(p: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = deny
}
