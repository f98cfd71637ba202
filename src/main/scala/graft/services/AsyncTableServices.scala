package graft.services

import scala.jdk.CollectionConverters._

import graft.GraftTable
import graft.write.WriteConfig

/** Table services running on a background thread WHILE a writer keeps
  * committing — the reference's async-service mode (ref:
  * hudi-client/hudi-client-common/.../async/AsyncCompactService.java +
  * AsyncClusteringService.java + HoodieAsyncService.java, as driven by
  * HoodieDeltaStreamer `--continuous`, which moves compaction off the
  * ingest loop so sync latency stays flat while table maintenance
  * proceeds concurrently).
  *
  * Each cycle runs the enabled services once: compact() drains pending
  * plans then schedules+executes a fresh one; cluster() likewise; clean()
  * reclaims replaced/expired file versions. No NEW coordination is
  * introduced here — safety against the racing writer comes entirely from
  * the seams every concurrent runner already goes through:
  *  - plan claims are token-confirmed, heartbeat-refreshed inflight
  *    markers (TableServices.claimInflight), so two service runners never
  *    execute one plan twice;
  *  - service publishes run their [conflict check + completed-instant
  *    transition] under the table's configured lock provider with the
  *    service OCC rules (withCommitLock + serviceConflict) — use
  *    lockProvider="jvm" when the writer shares this driver (the
  *    DeltaStreamer shape), "file" for cross-process runners;
  *  - plans invalidated by racing commits self-discard (planIsStale), and
  *    a service that loses its publish race aborts cleanly
  *    (ConcurrentWriteConflictException) leaving the plan for re-schedule.
  *
  * Benign race outcomes (lost lock, lost conflict check, stale plan) are
  * swallowed — they are the expected cost of racing a writer. Anything
  * else is collected in [[failures]] for the caller to assert on.
  *
  * Writer-side cost model: a delta commit whose instant orders ABOVE a
  * racing compaction layers freely (the conflictingInstant layering
  * exemption), so the only ingest retries are writers that began before
  * a compaction plan was scheduled AND published after that compaction
  * completed — the whole schedule+execute span must fit inside one
  * writer's in-flight window. Production compactions run minutes to
  * hours against minute-scale syncs, so the window is rare; the
  * reference instead renames log files onto the pending compaction's
  * base instant (getLatestFileSlicesIncludingPendingCompaction) to
  * close even that window, at the cost of pending-plan-aware file
  * slicing on every read — retry-on-conflict keeps reads plan-free.
  */
final class AsyncTableServices(
    table: GraftTable,
    wc: WriteConfig,
    compact: Boolean = true,
    cluster: Boolean = false,
    clean: Boolean = false,
    pollMs: Long = 50L) extends AutoCloseable {

  private val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
  private val cyclesDone = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var stopped = false

  private def cycle(): Unit = {
    val svc = new TableServices(table, wc)
    def guarded(f: => Unit): Unit =
      try f catch {
        case _: graft.write.ConcurrentWriteConflictException => ()
        case _: graft.write.LockAcquireException => ()
        case e: Throwable => errors.add(e)
      }
    if (compact) guarded(svc.compact())
    if (cluster) guarded(svc.cluster())
    if (clean) guarded(svc.clean(wc.cleanRetainCommits))
    cyclesDone.incrementAndGet()
  }

  private val thread = new Thread(() => {
    while (!stopped) {
      cycle()
      try Thread.sleep(pollMs)
      catch { case _: InterruptedException => Thread.currentThread.interrupt() }
    }
  }, s"graft-async-services-${table.basePath}")
  thread.setDaemon(true)

  def start(): this.type = { thread.start(); this }

  /** Service cycles completed so far (each = one pass over the enabled
    * services). */
  def cycles: Int = cyclesDone.get()

  /** Block until at least `n` cycles completed (test synchronization). */
  def awaitCycles(n: Int, timeoutMs: Long = 120000L): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (cyclesDone.get() < n && System.currentTimeMillis() < deadline)
      Thread.sleep(10)
    cyclesDone.get() >= n
  }

  /** Unexpected service failures (benign race losses excluded). */
  def failures: Seq[Throwable] = errors.asScala.toSeq

  /** Stop the loop and wait for the in-flight cycle to finish. */
  override def close(): Unit = {
    stopped = true
    thread.interrupt()
    thread.join(60000L)
  }
}
