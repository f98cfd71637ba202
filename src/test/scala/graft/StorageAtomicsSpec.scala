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
}
