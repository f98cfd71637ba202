package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReadClient
import graft.services.TableServices
import graft.write.{GraftWriteClient, JdbcLockProvider, LockAcquireException, WriteConfig}

/** The JDBC lock provider against an embedded Derby database — the same
  * engine the HMS sync suite runs its metastore on. The provider's SQL
  * is engine-agnostic (primary-key INSERT + conditional DELETEs); what
  * Derby cannot give this sandbox is a network server, so the
  * cross-PROCESS face is exercised by the file provider's forked-JVM
  * suites while this one proves the provider's atomic acquire/release/
  * takeover semantics under real multi-instance contention and drives
  * the full writer/services path under lock.provider=jdbc.
  * (ref: TransactionManager.java:49-69,
  * HiveMetastoreBasedLockProvider.java:60-120)
  */
class JdbcLockSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-jdbc-lock-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft_jdbc_").toString

  private def url(dir: String): String = s"jdbc:derby:$dir/lockdb;create=true"

  private def withConn[A](u: String)(f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(u)
    try f(c) finally c.close()
  }

  private val orders: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  private def cowConfig = GraftTableConfig(
    tableName = "t", tableType = GraftTableType.Cow,
    recordKeyFields = Seq("o_orderkey"),
    partitionFields = Seq("o_orderpriority"),
    precombineField = Some("o_totalprice"))

  private val wc = WriteConfig(
    targetFileSizeBytes = 256 * 1024, smallFileLimitBytes = 200 * 1024,
    defaultRecordSizeBytes = 64, parallelism = 4,
    inlineCompactDeltaCommits = 0, bloomExpectedEntries = 2048)

  test("jdbc lock: mutual exclusion, conditional unlock, TTL takeover, self-reclaim") {
    val u = url(tmp())
    val a = new JdbcLockProvider(u, "/tables/t1", ttlMs = 60000L, pollMs = 10L)
    val b = new JdbcLockProvider(u, "/tables/t1", ttlMs = 60000L, pollMs = 10L)
    val other = new JdbcLockProvider(u, "/tables/OTHER", ttlMs = 60000L, pollMs = 10L)

    // mutual exclusion per key; distinct keys never contend
    assert(a.tryLock(1000))
    assert(!b.tryLock(300), "second holder acquired a held lock")
    assert(other.tryLock(500), "distinct lock keys must not contend")
    other.unlock()
    a.unlock()
    assert(b.tryLock(1000))
    b.unlock()

    // TTL takeover: age the held row, a waiter takes over; the broken
    // holder's unlock (conditional on its token) must not release the
    // new owner's row
    assert(a.tryLock(1000))
    withConn(u) { c =>
      val st = c.createStatement()
      try st.executeUpdate(
        s"UPDATE GRAFT_LOCKS SET ACQUIRED_AT = ${System.currentTimeMillis() - 10 * 60 * 1000L}" +
          " WHERE LOCK_KEY = '/tables/t1'")
      finally st.close()
    }
    assert(b.tryLock(2000), "waiter failed to take over a TTL-expired lock")
    a.unlock()
    val rows = withConn(u) { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(
          "SELECT COUNT(*) FROM GRAFT_LOCKS WHERE LOCK_KEY = '/tables/t1'")
        rs.next(); rs.getInt(1)
      } finally st.close()
    }
    assert(rows === 1, "stale holder's unlock deleted the new owner's lock")
    b.unlock()

    // self-reclaim: a leftover row carrying this instance's own token
    // (unlock never ran) must not block its next acquire for the TTL
    assert(a.tryLock(1000))
    val start = System.currentTimeMillis()
    assert(a.tryLock(3000), "self-token reclaim must not wait out the TTL")
    // the 3 s tryLock timeout is the real bound (it would return false
    // without reclaim); the elapsed check only needs to stay far below
    // the 10-min TTL — leave slack for suite-load scheduler stalls
    assert(System.currentTimeMillis() - start < 60000)
    a.unlock()
    assert(b.tryLock(1000))
    b.unlock()
  }

  test("jdbc lock: contended acquire is mutually exclusive and starvation-free") {
    import java.util.concurrent.atomic.AtomicInteger
    val u = url(tmp())
    val inside = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val acquired = new AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map(_ => new Thread(() => {
      try {
        val lp = new JdbcLockProvider(u, "/tables/race", ttlMs = 60000L, pollMs = 3L)
        (1 to 5).foreach { _ =>
          assert(lp.tryLock(30000), "starved out of the lock")
          val now = inside.incrementAndGet()
          maxSeen.updateAndGet(m => math.max(m, now))
          Thread.sleep(2)
          inside.decrementAndGet()
          lp.unlock()
          acquired.incrementAndGet()
        }
      } catch { case e: Throwable => failures.add(e) }
    }))
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(failures.isEmpty, s"contention failures: ${failures.peek()}")
    assert(acquired.get() === 40)
    assert(maxSeen.get() === 1, s"mutual exclusion violated: ${maxSeen.get()} inside")
  }

  test("jdbc lock drives the full writer + services path") {
    val base = tmp()
    val u = url(base)
    val path = s"$base/t"
    val jwc = wc.copy(lockProvider = "jdbc", lockJdbcUrl = u, lockTimeoutMs = 800L)
    GraftTable.create(spark, path, cowConfig)
    val w = new GraftWriteClient(GraftTable.load(spark, path), jwc)
    w.bulkInsert(orders.limit(200))
    w.upsert(orders.limit(50).withColumn("o_totalprice", col("o_totalprice") + 1.0))
    assert(new GraftReadClient(GraftTable.load(spark, path)).snapshotData().count() === 200)

    // a held lock blocks the publish loudly, nothing lands
    val t = GraftTable.load(spark, path)
    // keyFor, not basePath.toString: writers key their rows by the
    // QUALIFIED table path, and a blocker spelling the path differently
    // would land on a different row and block nothing (the r17 ADVICE
    // aliasing bug, now normalized away)
    val blocker = new JdbcLockProvider(u, JdbcLockProvider.keyFor(t.storage),
      ttlMs = 60000L, pollMs = 10L)
    assert(blocker.tryLock(1000))
    val before = t.timeline.completedData.size
    intercept[LockAcquireException] {
      w.upsert(orders.limit(10).withColumn("o_totalprice", col("o_totalprice") + 2.0))
    }
    assert(t.timeline.completedData.size === before, "blocked write published")
    assert(t.timeline.pending.isEmpty, "blocked write left a pending instant")
    blocker.unlock()
    // retry lands cleanly; services share the same lock
    w.upsert(orders.limit(10).withColumn("o_totalprice", col("o_totalprice") + 2.0))
    assert(new TableServices(GraftTable.load(spark, path), jwc).cluster().nonEmpty)
    assert(new GraftReadClient(GraftTable.load(spark, path)).snapshotData().count() === 200)
  }

  test("jdbc lock arbitrates two RACING writers + async services (model-checked)") {
    import scala.collection.mutable
    import scala.util.Random
    val base = tmp()
    val u = url(base)
    val path = s"$base/t"
    val jwc = wc.copy(lockProvider = "jdbc", lockJdbcUrl = u,
      lockTimeoutMs = 30000L)
    val cfg = GraftTableConfig(
      tableName = "t", tableType = GraftTableType.Mor,
      recordKeyFields = Seq("k"), partitionFields = Seq("p"),
      precombineField = Some("ord"), payloadClass = "event_time")
    GraftTable.create(spark, path, cfg)
    import spark.implicits._
    def toDf(rows: Seq[(Long, String, Double, Long)]): DataFrame =
      rows.toDF("k", "p", "v", "ord")
    val ordGen = new java.util.concurrent.atomic.AtomicLong(0L)
    val committed =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Long, String, Double, Long)]]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(idx: Int): Thread = new Thread(() => {
      try {
        val rnd = new Random(77L * idx + 5)
        val w = new GraftWriteClient(GraftTable.load(spark, path), jwc)
        for (_ <- 1 to 6) {
          // disjoint keys per writer: idx parity
          val rows = (0 until 3 + rnd.nextInt(6)).map { _ =>
            val k = rnd.nextInt(30); ((k - k % 2 + idx).toLong,
              Seq("a", "b")(rnd.nextInt(2)), rnd.nextInt(1000) / 10.0,
              ordGen.incrementAndGet())
          }
          var done = false
          var tries = 0
          while (!done) {
            try { val ts = w.upsert(toDf(rows)); committed.put(ts.toLong, rows); done = true }
            catch {
              case _: graft.write.ConcurrentWriteConflictException =>
                tries += 1; assert(tries <= 10, "writer starved by conflicts")
            }
          }
        }
      } catch { case e: Throwable => failures.add(e) }
    })
    val svc = new Thread(() => {
      try {
        val sv = new TableServices(GraftTable.load(spark, path), jwc)
        (1 to 4).foreach { _ =>
          try { sv.compact(); sv.clean(8) }
          catch {
            case _: LockAcquireException => ()
            case _: graft.write.ConcurrentWriteConflictException => ()
          }
          Thread.sleep(150)
        }
      } catch { case e: Throwable => failures.add(e) }
    })
    val ts = Seq(writer(0), writer(1), svc)
    ts.foreach(_.start()); ts.foreach(_.join(5 * 60 * 1000))
    assert(failures.isEmpty, s"racing failure: ${failures.peek()}")
    // model: per (p, k) the row with the highest ord among committed rows
    import scala.jdk.CollectionConverters._
    val model = mutable.Map.empty[(String, Long), (Double, Long)]
    committed.asScala.toSeq.sortBy(_._1).foreach { case (_, rows) =>
      rows.groupBy(r => (r._2, r._1)).foreach { case (pk, grp) =>
        val win = grp.maxBy(_._4)
        val cur = model.get(pk)
        if (cur.forall(_._2 < win._4)) model(pk) = (win._3, win._4)
      }
    }
    val snap = new GraftReadClient(GraftTable.load(spark, path)).snapshotData()
      .select("k", "p", "v", "ord").collect()
      .map(r => ((r.getString(1), r.getLong(0)), (r.getDouble(2), r.getLong(3))))
    assert(snap.length === snap.map(_._1).distinct.length,
      "duplicate (partition, key) in snapshot")
    assert(snap.toMap === model.toMap, "snapshot diverged from model")
  }

  test("jdbc lock key is filesystem-qualified and bounded to the column width") {
    val dir = tmp()
    val conf = spark.sessionState.newHadoopConf()
    val bare = new GraftStorage(new org.apache.hadoop.fs.Path(dir), conf)
    val qualified = new GraftStorage(new org.apache.hadoop.fs.Path("file:" + dir), conf)
    // two writers opening one table under different spellings must land
    // on ONE GRAFT_LOCKS row, or mutual exclusion silently vanishes
    assert(JdbcLockProvider.keyFor(bare) === JdbcLockProvider.keyFor(qualified))
    // an absurdly deep path still yields an insertable (<=512) key, and
    // distinct paths keep distinct keys through the hash suffix
    val deep = dir + "/x" * 300
    val deep2 = dir + "/x" * 299 + "/y"
    val k1 = JdbcLockProvider.keyFor(
      new GraftStorage(new org.apache.hadoop.fs.Path(deep), conf))
    val k2 = JdbcLockProvider.keyFor(
      new GraftStorage(new org.apache.hadoop.fs.Path(deep2), conf))
    assert(k1.length <= 512 && k2.length <= 512)
    assert(k1 !== k2)
    // and a hashed key actually acquires through Derby's VARCHAR(512)
    val u = url(tmp())
    val lp = new JdbcLockProvider(u, k1, ttlMs = 60000L, pollMs = 10L)
    assert(lp.tryLock(5000))
    lp.unlock()
  }

  test("jdbc lock misconfiguration fails loudly, never as a silent contention timeout") {
    val u = url(tmp())
    // a raw key wider than the column is a 22001 data exception on EVERY
    // attempt — the acquire loop must rethrow it immediately instead of
    // retrying it into a misleading could-not-acquire timeout (keys from
    // LockProvider.forTable are hash-bounded and never hit this; a
    // direct construction can)
    val lp = new JdbcLockProvider(u, "k" * 600, ttlMs = 60000L, pollMs = 10L)
    val t0 = System.currentTimeMillis()
    val e = intercept[java.sql.SQLException] { lp.tryLock(30000) }
    assert(Option(e.getSQLState).exists(_.startsWith("22")), e.getSQLState)
    assert(System.currentTimeMillis() - t0 < 20000,
      "non-transient SQL errors must fail fast, not burn the lock timeout")
  }
}
