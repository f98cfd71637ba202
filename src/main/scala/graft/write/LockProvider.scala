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
            // cover every interleaving).
            if (storage.readString(lockPath) == token) storage.delete(lockPath)
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
      // remove the SUCCESSOR's live lock. Breaking a lock is only legal
      // once ttlMs has elapsed since our acquire (= the file's mtime), so
      // any critical section that finishes within the TTL may delete
      // freely; past it, leave the file — it either already belongs to a
      // breaker (token check fails) or TTL-expires for the next waiter,
      // and OUR next tryLock reclaims it instantly by recognizing its own
      // token. The residual pause-between-check-and-delete window is the
      // same irreducible class as the breaker's, accepted there too.
      val withinTtl = System.currentTimeMillis() - acquiredAtMs < ttlMs
      if (withinTtl && storage.exists(lockPath) &&
          storage.readString(lockPath) == token)
        storage.delete(lockPath)
    } catch { case _: java.io.IOException => () }
  }
}

object LockProvider {
  /** Resolve a WriteConfig selector to a provider instance. Selectors
    * are plain strings so configuration stays serializable and works
    * identically from any process (CLI, child JVM, executor-free
    * driver code).
    */
  def forTable(selector: String, storage: GraftStorage, ttlMs: Long): LockProvider =
    selector match {
      case "none" | "" => NoOpLockProvider
      case "jvm"       => new InProcessLockProvider(storage)
      case "file"      => new FileLockProvider(storage, ttlMs)
      case other => throw new IllegalArgumentException(
        s"unknown lock provider '$other' (expected: none | jvm | file)")
    }
}
