package graft.write

import org.apache.hadoop.fs.Path

import graft.core.GraftStorage

/** Pluggable cross-writer lock held around [conflict check + commit
  * publish] — the reference's TransactionManager beginTransaction/
  * endTransaction seam with its lock-provider hierarchy (ref:
  * hudi-client/hudi-client-common/.../transaction/TransactionManager
  * .java:49-69, lock/ZookeeperBasedLockProvider.java,
  * lock/FileSystemBasedLockProvider.java). Two built-ins:
  *
  *  - [[NoOpLockProvider]] (default): no external lock. Correctness
  *    comes from the timeline's create-if-absent completed-instant
  *    files plus the pre-publish conflict check; the check→publish
  *    window means two writers racing on the SAME file groups within
  *    milliseconds can, in the worst case, both land — the loser-aborts
  *    guarantee is only as strong as the check's timing. Right for
  *    single-writer tables and low-contention multi-writer setups (the
  *    reference ships the same default: OCC off / in-process lock).
  *  - [[FileLockProvider]]: a create-if-absent lock FILE under the
  *    table's own `.graft/locks/`, with TTL-based breaking of locks
  *    left by crashed holders. Closes the check→publish window for any
  *    writers sharing one atomic-create filesystem (HDFS, local,
  *    most object stores with conditional puts). External services
  *    (ZooKeeper, DynamoDB, JDBC) implement the same two methods.
  *
  * Contract: `tryLock` blocks up to `timeoutMs` and returns whether the
  * lock was acquired; the caller MUST NOT publish when it returns false
  * (GraftWriteClient throws [[LockAcquireException]] — failing loudly
  * beats double-committing). `unlock` releases only a lock this
  * instance still holds: if the holder stalled past the TTL and another
  * writer legitimately broke the lock, unlock must leave the new
  * holder's lock untouched.
  */
trait LockProvider {
  def tryLock(timeoutMs: Long): Boolean
  def unlock(): Unit
}

/** Lock acquisition failed within the timeout — the write is aborted
  * BEFORE publish; retry when the current holder finishes.
  */
final class LockAcquireException(msg: String) extends RuntimeException(msg)

object NoOpLockProvider extends LockProvider {
  override def tryLock(timeoutMs: Long): Boolean = true
  override def unlock(): Unit = ()
}

/** Process-wide lock shared by every writer of one table inside a
  * single JVM (ref: hudi-client/hudi-client-common/.../transaction/
  * lock/InProcessLockProvider.java): the right provider when multiple
  * THREADS of one driver write the same table — concurrent streaming
  * queries, a writer racing inline table services. Keyed by the table
  * base path so distinct tables never contend; carries zero filesystem
  * traffic, but provides no protection against a second process (use
  * `file` for that).
  */
final class InProcessLockProvider(storage: GraftStorage) extends LockProvider {
  private val lock = InProcessLockProvider.forPath(storage.basePath.toString)
  override def tryLock(timeoutMs: Long): Boolean =
    try lock.tryLock(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    catch { case _: InterruptedException => Thread.currentThread.interrupt(); false }
  override def unlock(): Unit =
    if (lock.isHeldByCurrentThread) lock.unlock()
}

object InProcessLockProvider {
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]()
  private def forPath(p: String): java.util.concurrent.locks.ReentrantLock =
    locks.computeIfAbsent(p, _ => new java.util.concurrent.locks.ReentrantLock())
}

/** Create-if-absent lock file at `.graft/locks/writer.lock`. The file
  * body carries a unique owner token; `unlock` re-reads it and deletes
  * only when the token is still ours (a TTL-broken lock belongs to the
  * breaker). `ttlMs` bounds how long a crashed holder can block the
  * table: a waiter that finds the lock file older than the TTL deletes
  * it and re-races on the atomic create. The TTL must exceed the
  * longest [conflict check + publish] critical section by a wide
  * margin — the section is metadata-only (no data writes happen under
  * the lock), so seconds of work against a minutes-scale TTL.
  */
final class FileLockProvider(
    storage: GraftStorage,
    ttlMs: Long = 5 * 60 * 1000L,
    pollMs: Long = 50L) extends LockProvider {

  private val locksDir = new Path(storage.metaDir, "locks")
  private val lockPath = new Path(locksDir, "writer.lock")
  private val token =
    java.util.UUID.randomUUID.toString + "@" + java.lang.management.ManagementFactory
      .getRuntimeMXBean.getName
  @volatile private var held = false
  @volatile private var acquiredAtMs = 0L

  /** Atomic create-if-absent of the lock file WITH its token: the file
    * appears fully written or not at all, in one step. Hadoop's LOCAL
    * filesystem implements `create(path, overwrite=false)` as
    * exists-check + create (two racers can both pass the check and the
    * second create TRUNCATES the first's lock — found by the
    * contended-acquire stress test), and `createNewFile` + a separate
    * token write is no better: a TTL-breaker's delete landing between
    * the two steps lets the truncating token write RECREATE the file,
    * producing interleavings where each contender reads its own token
    * at its own confirm moment. GraftStorage.createImmutable avoids
    * both: the token is staged to a private temp file and hard-linked
    * into place (EEXIST-atomic on `file`; namenode-atomic rename on
    * HDFS-like schemes), so content+create is one indivisible step and
    * confirm-after-acquire reads are trustworthy.
    */
  private def atomicCreate(): Unit = storage.createImmutable(lockPath, token)

  override def tryLock(timeoutMs: Long): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    if (!storage.exists(locksDir)) storage.fs.mkdirs(locksDir)
    def win(): Boolean = { held = true; acquiredAtMs = System.currentTimeMillis(); true }
    while (System.currentTimeMillis() <= deadline) {
      try {
        atomicCreate()
        // confirm-after-acquire: a concurrent waiter that judged the
        // PREVIOUS holder stale may delete the path right as we created
        // it (its stale-check read raced our create). If the file no
        // longer carries our token, we did not really win — retry; a
        // transient read failure resolves on the next loop pass (the
        // EEXIST branch recognizes our own token).
        try {
          if (storage.readString(lockPath) == token) return win()
        } catch { case _: java.io.IOException => () }
      } catch {
        case _: java.io.IOException =>
          try {
            // A lock file carrying OUR OWN token is this instance's
            // leftover: an earlier create that landed with only the
            // confirm read failing, or a previous hold whose unlock
            // refused the delete after a stall (see unlock). Nobody else
            // ever holds a file with our token, so delete it and re-race
            // on the atomic create — reclaiming IN PLACE (win on the old
            // file) would break the protocol's one ordering invariant
            // (a fresh create only ever lands AFTER the delete that
            // freed the path, which is what makes confirm-after-acquire
            // cover every interleaving). The immediate token RE-READ
            // before the delete shrinks the window in which a TTL-breaker
            // frees our stale path and a successor's confirmed lock lands
            // to the same irreducible check→delete gap the foreign branch
            // below carries.
            if (storage.readString(lockPath) == token &&
              storage.readString(lockPath) == token) storage.delete(lockPath)
            else {
              // foreign lock: break it only when provably stale (TTL
              // expired). Before deleting, re-read status+token and
              // require BOTH to match the first observation, so we only
              // ever break the EXACT lock we judged stale — never a
              // fresh lock that replaced it between the check and the
              // delete (tokens are unique UUIDs). The irreducible window
              // between the final check and the delete is covered from
              // the other side: a victim whose fresh lock we broke fails
              // its confirm-after-acquire and retries.
              val st1 = storage.fs.getFileStatus(lockPath)
              if (System.currentTimeMillis() - st1.getModificationTime > ttlMs) {
                val t1 = storage.readString(lockPath)
                val st2 = storage.fs.getFileStatus(lockPath)
                if (st2.getModificationTime == st1.getModificationTime &&
                  storage.readString(lockPath) == t1)
                  storage.delete(lockPath) // then re-race on the atomic create
              }
            }
          } catch { case _: java.io.IOException => () /* re-race */ }
      }
      Thread.sleep(pollMs)
    }
    false
  }

  override def unlock(): Unit = {
    if (!held) return
    held = false
    try {
      // Delete only OUR lock — and only while provably inside our own
      // exclusivity window. A holder that stalled past the TTL may have
      // been legitimately broken, and a read-then-delete here could then
      // remove the SUCCESSOR's live lock. Breaking is only legal once
      // ttlMs has elapsed since the file's MTIME (storage clock); our
      // acquiredAtMs is this process's clock, so refusing from 3/4·ttl
      // keeps a ttl/4 margin against storage-vs-writer clock skew and
      // create→win gaps. Past the threshold, leave the file — it either
      // already belongs to a breaker (token check fails) or TTL-expires
      // for the next waiter, and OUR next tryLock reclaims it instantly
      // by recognizing its own token, so the availability cost of
      // refusing is one TTL for strangers and ~zero for this instance.
      val withinTtl = System.currentTimeMillis() - acquiredAtMs < ttlMs * 3 / 4
      if (withinTtl && storage.exists(lockPath) &&
          storage.readString(lockPath) == token)
        storage.delete(lockPath)
    } catch { case _: java.io.IOException => () }
  }
}

/** Cross-writer lock arbitrated by ANY JDBC database: one row per table
  * in a `GRAFT_LOCKS` table, acquired by a primary-key INSERT (atomic
  * under the database's uniqueness enforcement), released by a
  * conditional `DELETE … WHERE token = ours` — an atomic
  * compare-and-delete, so unlock needs none of the file provider's
  * stall heuristics: a TTL-broken holder's delete simply matches zero
  * rows. A waiter breaks a crashed holder by conditionally deleting the
  * EXACT row it observed stale (key + token + acquire time) and
  * re-racing on the INSERT, so a fresh lock that replaced the stale one
  * is never touched — the database's row atomicity closes the windows
  * the filesystem provider can only narrow. (ref: the reference's
  * external-service bindings behind the same two-method seam,
  * TransactionManager.java:49-69, HiveMetastoreBasedLockProvider
  * .java:60-120; ours speaks plain JDBC so a server RDBMS — or embedded
  * Derby for single-host multi-process-free setups — can arbitrate.)
  */
final class JdbcLockProvider(
    jdbcUrl: String,
    lockKey: String,
    ttlMs: Long = 5 * 60 * 1000L,
    pollMs: Long = 50L) extends LockProvider {

  require(jdbcUrl.nonEmpty,
    "lock.provider=jdbc needs lock.jdbc.url (e.g. jdbc:derby:/path;create=true)")

  private val token =
    java.util.UUID.randomUUID.toString + "@" + java.lang.management.ManagementFactory
      .getRuntimeMXBean.getName
  @volatile private var held = false

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(jdbcUrl)
    try f(c) finally c.close()
  }

  /** Create the lock table if missing; concurrent creators race benignly
    * (the loser's error is swallowed iff the table is then queryable).
    */
  private def ensureTable(c: java.sql.Connection): Unit =
    try {
      val st = c.createStatement()
      try st.executeUpdate(
        "CREATE TABLE GRAFT_LOCKS (" +
          "LOCK_KEY VARCHAR(512) PRIMARY KEY, " +
          "TOKEN VARCHAR(160) NOT NULL, " +
          "ACQUIRED_AT BIGINT NOT NULL)")
      finally st.close()
    } catch {
      case e: java.sql.SQLException =>
        val st = c.createStatement()
        try st.executeQuery("SELECT 1 FROM GRAFT_LOCKS WHERE 1=0").close()
        catch { case _: java.sql.SQLException => throw e }
        finally st.close()
    }

  /** One acquisition attempt; false on a live duplicate key. */
  private def tryInsert(c: java.sql.Connection): Boolean = {
    val ps = c.prepareStatement(
      "INSERT INTO GRAFT_LOCKS (LOCK_KEY, TOKEN, ACQUIRED_AT) VALUES (?, ?, ?)")
    try {
      ps.setString(1, lockKey); ps.setString(2, token)
      ps.setLong(3, System.currentTimeMillis())
      ps.executeUpdate(); true
    } catch {
      // 23xxx = SQL-standard integrity violation (Derby/Postgres 23505,
      // MySQL 23000) — the lock is held; anything else is a real error
      case e: java.sql.SQLException
          if Option(e.getSQLState).exists(_.startsWith("23")) => false
    } finally ps.close()
  }

  /** Conditional delete of one exact observed row; true iff it removed it. */
  private def deleteExact(
      c: java.sql.Connection, tkn: String, at: Long): Boolean = {
    val ps = c.prepareStatement(
      "DELETE FROM GRAFT_LOCKS WHERE LOCK_KEY = ? AND TOKEN = ? AND ACQUIRED_AT = ?")
    try {
      ps.setString(1, lockKey); ps.setString(2, tkn); ps.setLong(3, at)
      ps.executeUpdate() == 1
    } finally ps.close()
  }

  override def tryLock(timeoutMs: Long): Boolean = {
    // connection setup and table creation stay LOUD — a misconfigured URL
    // must fail the write immediately, not burn the timeout silently
    var c = java.sql.DriverManager.getConnection(jdbcUrl)
    try {
      ensureTable(c)
      // the timeout budgets lock CONTENTION — start it after the
      // connection is up (a cold embedded engine boots in seconds, which
      // would otherwise consume the whole budget before the first attempt)
      val deadline = System.currentTimeMillis() + timeoutMs
      var lastTransient: java.sql.SQLException = null
      while (System.currentTimeMillis() <= deadline) {
        try {
          if (tryInsert(c)) { held = true; return true }
          val ps = c.prepareStatement(
            "SELECT TOKEN, ACQUIRED_AT FROM GRAFT_LOCKS WHERE LOCK_KEY = ?")
          val row =
            try {
              ps.setString(1, lockKey)
              val rs = ps.executeQuery()
              try { if (rs.next()) Some((rs.getString(1), rs.getLong(2))) else None }
              finally rs.close()
            } finally ps.close()
          row match {
            // our own leftover (a failed unlock delete): only we could have
            // written this token, so removing it and re-racing is always safe
            case Some((t, at)) if t == token =>
              deleteExact(c, t, at)
            // crashed holder: break the EXACT observed row once TTL-stale.
            // ACQUIRED_AT is the HOLDER's clock; the comparison assumes
            // writer clocks are synced well inside the TTL (minutes) — the
            // same assumption the file provider makes of storage mtimes.
            case Some((t, at)) if System.currentTimeMillis() - at > ttlMs =>
              deleteExact(c, t, at)
            case _ => Thread.sleep(pollMs)
          }
        } catch {
          // transient failures (connection drop, deadlock victim) re-race
          // on a FRESH connection until the deadline — one DB hiccup must
          // behave like one FS hiccup in FileLockProvider, ending in the
          // contract's loud false/LockAcquireException, never a raw
          // SQLException that skips the caller's staged-file cleanup.
          // But MISCONFIGURATION is not contention: SQL-standard 22xxx
          // data exceptions (e.g. 22001 truncation when a key outgrows
          // the column), 42xxx syntax/authorization and 28xxx invalid
          // auth can never heal by retrying — rethrow them now instead
          // of burning the timeout into a misleading "retry" failure.
          case e: java.sql.SQLException =>
            val state = Option(e.getSQLState).getOrElse("")
            if (state.startsWith("22") || state.startsWith("42") ||
                state.startsWith("28")) throw e
            lastTransient = e
            try c.close() catch { case _: Exception => () }
            try c = java.sql.DriverManager.getConnection(jdbcUrl)
            catch { case _: java.sql.SQLException => () } // retry next pass
            Thread.sleep(pollMs)
        }
      }
      // contention timeouts are silent (the caller raises its loud
      // LockAcquireException); an error-riddled timeout names the last
      // failure so the operator sees WHAT kept failing, not just "retry"
      if (lastTransient != null)
        System.err.println("[graft] jdbc lock acquisition timed out after " +
          s"repeated errors; last: ${lastTransient.getMessage}")
      false
    } finally {
      try c.close() catch { case _: Exception => () }
    }
  }

  override def unlock(): Unit = {
    if (!held) return
    held = false
    try withConn { c =>
      val ps = c.prepareStatement(
        "DELETE FROM GRAFT_LOCKS WHERE LOCK_KEY = ? AND TOKEN = ?")
      try { ps.setString(1, lockKey); ps.setString(2, token); ps.executeUpdate() }
      finally ps.close()
    } catch {
      // a failed delete leaves our row for the next tryLock's self-reclaim
      // (same instance) or the TTL break (anyone else)
      case _: java.sql.SQLException => ()
    }
  }
}

object JdbcLockProvider {
  /** The GRAFT_LOCKS row key for a table: its base path QUALIFIED
    * against the table's own filesystem, so every spelling a writer can
    * open the table under (`hdfs://nn/tbl`, bare `/tbl`, a trailing
    * slash) maps to ONE row — the cross-host mutual exclusion this
    * provider exists for would silently vanish if two spellings got two
    * rows. Keys that outgrow the VARCHAR(512) column are truncated and
    * content-hashed (SHA-256 suffix) so they stay both unique and
    * insertable — a 600-char path must not surface as a 22001
    * truncation error mid-acquire.
    */
  def keyFor(storage: GraftStorage): String = {
    val q = storage.fs.makeQualified(storage.basePath).toString
    if (q.length <= 512) q
    else {
      val h = java.security.MessageDigest.getInstance("SHA-256")
        .digest(q.getBytes("UTF-8")).map("%02x".format(_)).mkString
      q.take(512 - 65) + "#" + h
    }
  }
}

object LockProvider {
  /** Resolve a WriteConfig selector to a provider instance. Selectors
    * are plain strings so configuration stays serializable and works
    * identically from any process (CLI, child JVM, executor-free
    * driver code).
    */
  def forTable(
      selector: String, storage: GraftStorage, ttlMs: Long,
      jdbcUrl: String = ""): LockProvider =
    selector match {
      case "none" | "" => NoOpLockProvider
      case "jvm"       => new InProcessLockProvider(storage)
      case "file"      => new FileLockProvider(storage, ttlMs)
      case "jdbc" =>
        new JdbcLockProvider(jdbcUrl, JdbcLockProvider.keyFor(storage), ttlMs)
      case other => throw new IllegalArgumentException(
        s"unknown lock provider '$other' (expected: none | jvm | file | jdbc)")
    }
}
