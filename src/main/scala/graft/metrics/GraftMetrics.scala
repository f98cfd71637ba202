package graft.metrics

import java.io.PrintStream
import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}

import com.codahale.metrics.{
  Counter, DefaultSettableGauge, Gauge, Histogram, Meter, Metric,
  MetricRegistry, MetricRegistryListener, Timer
}

import graft.core.GraftCommitMetadata

/** Process-wide operational metrics for graft tables — the observability
  * surface a production operator needs to see commit durations, records
  * written, compaction debt and clean reclaim without scraping logs
  * (ref: hudi-client-common/.../metrics/HoodieMetrics.java — timers per
  * action + per-commit gauges computed from the commit metadata, wired
  * into every write at AbstractHoodieWriteClient.java:221-222, 574-651).
  *
  * Design differences from the reference, deliberate:
  *   - ONE global codahale `MetricRegistry` (the library Spark itself
  *     ships and uses for its own metrics system) with
  *     `<tableName>.<operation>.<metric>` names, instead of a bespoke
  *     registry wrapper per table. Everything here is driver-side
  *     planning/publish metadata — no metric is touched inside a task.
  *   - Reporters: the reference ships five bespoke reporter integrations
  *     (console/JMX/Graphite/Datadog/Prometheus,
  *     MetricsReporterFactory.java). Spark already ships sinks for all of
  *     those in its own metrics system, so the Spark-first path is
  *     [[GraftSparkPlugin]]: a public `SparkPlugin` that forwards this
  *     registry into Spark's plugin metrics namespace, where every sink
  *     the cluster operator configured (`spark.metrics.conf`) picks the
  *     metrics up with zero graft-side reporter code. The standalone
  *     `console` and `jmx` reporters below cover processes that want
  *     graft metrics without touching Spark's metrics config, and
  *     `inmemory` (the default) is just the queryable registry.
  *
  * Naming follows the reference's `table.action.metric` scheme
  * (HoodieMetrics.getMetricsName) with the OPERATION as the middle
  * segment — `orders.upsert.totalRecordsWritten` distinguishes an upsert
  * from a compaction rewrite where the reference's action-level names
  * (`commit.*`) collapse both.
  *
  * Semantics: per-operation `total*` values are GAUGES holding the most
  * recent commit's numbers (the reference's updateCommitMetrics shape —
  * a dashboard reads "last commit wrote N records in D ms"); monotonic
  * process totals are COUNTERS (`.commits`, `.totalRecordsWritten`
  * cumulative at the table level); latency distributions are codahale
  * TIMERS (`.timer` — rates + percentiles for free). All emission is
  * gated by `WriteConfig.metricsOn` AT THE CALL SITE, so the default-off
  * path costs one branch.
  */
object GraftMetrics {

  /** The process-wide registry. Public on purpose: specs, dashboards and
    * the Spark plugin bridge read it directly.
    */
  val registry: MetricRegistry = new MetricRegistry

  // codahale gauges are registered OBJECTS, not set-by-name values; keep
  // one settable gauge per name so emitters can just set(v)
  private val gauges = new ConcurrentHashMap[String, DefaultSettableGauge[Long]]()

  def name(table: String, parts: String*): String =
    (table +: parts).mkString(".")

  def setGauge(n: String, v: Long): Unit = {
    val g = gauges.computeIfAbsent(n, _ => {
      val ng = new DefaultSettableGauge[Long](0L)
      try registry.register(n, ng)
      catch { case _: IllegalArgumentException => () } // racing creator won
      ng
    })
    g.setValue(v)
  }

  def inc(n: String, delta: Long = 1L): Unit = registry.counter(n).inc(delta)

  def time(n: String, durationMs: Long): Unit =
    registry.timer(n).update(durationMs, TimeUnit.MILLISECONDS)

  /** Read a gauge or counter by name — specs and console reporting. */
  def value(n: String): Option[Long] = {
    val g = gauges.get(n)
    if (g != null) return Some(g.getValue)
    Option(registry.getCounters.get(n)).map(_.getCount)
  }

  /** All gauge/counter values under a name prefix, for specs and dumps. */
  def snapshot(prefix: String = ""): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val gs = registry.getGauges.asScala.collect {
      case (n, g: DefaultSettableGauge[_]) if n.startsWith(prefix) =>
        n -> g.getValue.asInstanceOf[Long]
    }
    val cs = registry.getCounters.asScala.collect {
      case (n, c) if n.startsWith(prefix) => n -> c.getCount
    }
    (gs ++ cs).toMap
  }

  /** Drop every metric under `<table>.` — teardown for long-lived
    * multi-tenant drivers (a service host cycling thousands of ephemeral
    * tables would otherwise accumulate ~40 dead metrics per table
    * forever; the registry itself is process-lifetime by design, like
    * the reference's). Removals propagate through [[bridgeTo]] listeners.
    */
  def removeTable(table: String): Unit = {
    val prefix = table + "."
    registry.removeMatching((n: String, _: Metric) => n.startsWith(prefix))
    gauges.keySet.removeIf(_.startsWith(prefix))
  }

  // =====================================================================
  // Emission points (each caller gates on WriteConfig.metricsOn)
  // =====================================================================

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMddHHmmssSSS")
    .withZone(java.time.ZoneOffset.UTC)

  /** Wall-clock ms since the instant timestamp was minted — the commit
    * duration measured exactly as the reference measures it
    * (AbstractHoodieWriteClient.java:222 parses the instant time with
    * COMMIT_FORMATTER and subtracts). Instant timestamps ARE begin times
    * (InstantTimeGenerator.next), except a same-millisecond collision
    * bump (+1), which skews a duration by at most the bump. Unparseable
    * (heavily bumped) timestamps report -1, never throw.
    */
  def durationSinceInstant(instantTs: String): Long =
    try {
      val t = java.time.LocalDateTime
        .parse(instantTs, tsFmt)
        .toInstant(java.time.ZoneOffset.UTC)
        .toEpochMilli
      math.max(0L, System.currentTimeMillis() - t)
    } catch { case _: Exception => -1L }

  /** Per-commit metrics from the published metadata — gauges carry THIS
    * commit's numbers, counters accumulate process totals (ref:
    * HoodieMetrics.updateCommitMetrics / updateCommitTimingMetrics).
    *
    * `durationMs` < 0 derives the duration from the instant timestamp
    * (write-client commits: instant minted at operation begin). Services
    * executing a PERSISTED plan pass their measured execution time
    * instead — the plan's instant is its SCHEDULE time, and a drained
    * plan from a crashed earlier runner would otherwise report the
    * schedule→execute gap as duration.
    */
  def onCommit(
      table: String, meta: GraftCommitMetadata, durationMs: Long = -1L): Unit = {
    val op = meta.operation
    val d = if (durationMs >= 0) durationMs else durationSinceInstant(meta.instant)
    if (d >= 0) {
      setGauge(name(table, op, "duration"), d)
      time(name(table, op, "timer"), d)
    }
    setGauge(name(table, op, "totalRecordsWritten"), meta.files.map(_.records).sum)
    setGauge(name(table, op, "totalBytesWritten"), meta.files.map(_.bytes).sum)
    setGauge(name(table, op, "totalFilesWritten"), meta.files.size.toLong)
    setGauge(name(table, op, "totalDeltaFilesWritten"),
      meta.files.count(_.isDelta).toLong)
    setGauge(name(table, op, "totalPartitionsWritten"),
      meta.files.map(_.partition).distinct.size.toLong)
    setGauge(name(table, op, "totalReplacedGroups"),
      meta.replacedFileIds.valuesIterator.map(_.size).sum.toLong)
    inc(name(table, op, "commits"))
    inc(name(table, "totalRecordsWritten"), meta.files.map(_.records).sum)
    inc(name(table, "totalBytesWritten"), meta.files.map(_.bytes).sum)
  }

  /** ref: HoodieMetrics.updateCleanMetrics (duration + numFilesDeleted);
    * clean plans persist file NAMES only, so reclaimed bytes are not
    * re-derivable at execute time and are deliberately not faked here.
    */
  def onClean(table: String, durationMs: Long, filesDeleted: Long): Unit = {
    setGauge(name(table, "clean", "duration"), durationMs)
    time(name(table, "clean", "timer"), durationMs)
    setGauge(name(table, "clean", "numFilesDeleted"), filesDeleted)
    inc(name(table, "clean", "runs"))
    inc(name(table, "clean", "totalFilesDeleted"), filesDeleted)
  }

  /** ref: HoodieMetrics.updateRollbackMetrics. */
  def onRollback(table: String, durationMs: Long, filesDeleted: Long): Unit = {
    setGauge(name(table, "rollback", "duration"), durationMs)
    setGauge(name(table, "rollback", "numFilesDeleted"), filesDeleted)
    inc(name(table, "rollback", "runs"))
  }

  def onRestore(table: String, durationMs: Long, commitsRolledBack: Long): Unit = {
    setGauge(name(table, "restore", "duration"), durationMs)
    setGauge(name(table, "restore", "commitsRolledBack"), commitsRolledBack)
    inc(name(table, "restore", "runs"))
  }

  def onArchive(table: String, durationMs: Long, instantsArchived: Long): Unit = {
    setGauge(name(table, "archive", "duration"), durationMs)
    setGauge(name(table, "archive", "instantsArchived"), instantsArchived)
    inc(name(table, "archive", "runs"))
    inc(name(table, "archive", "totalInstantsArchived"), instantsArchived)
  }

  /** Compaction-debt gauges — the "how far behind is this MOR table"
    * number an operator alarms on. Updated whenever a service pass
    * observes the file-system view (schedule/execute), since debt is a
    * property of the view, not of any single commit.
    */
  def compactionDebt(
      table: String, pendingPlans: Long, deltaFilesOutstanding: Long): Unit = {
    setGauge(name(table, "compaction", "pendingPlans"), pendingPlans)
    setGauge(name(table, "compaction", "deltaFilesOutstanding"),
      deltaFilesOutstanding)
  }

  // =====================================================================
  // Reporters
  // =====================================================================

  private val startedReporters =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Start the configured reporter once per process per kind. "inmemory"
    * (default) is the bare queryable registry; "console" dumps the
    * registry every `periodSec` (0 = on-demand via [[report]] only);
    * "jmx" exposes every metric as a live MBean under the `graft` domain
    * via the codahale JmxReporter Spark already ships (ref: the
    * reference's JmxMetricsReporter/ConsoleMetricsReporter — here they
    * are codahale's own, not re-implementations). Unknown kinds fail
    * loudly: a typo'd reporter silently reporting nowhere is the worst
    * observability outcome.
    */
  def ensureReporter(kind: String, periodSec: Int = 0): Unit = kind match {
    case "inmemory" | "" => ()
    case "console" =>
      if (startedReporters.add("console") && periodSec > 0) {
        val ex = Executors.newSingleThreadScheduledExecutor(r => {
          val t = new Thread(r, "graft-metrics-console"); t.setDaemon(true); t
        })
        ex.scheduleAtFixedRate(
          () => report(System.out), periodSec.toLong, periodSec.toLong,
          TimeUnit.SECONDS)
      }
    case "jmx" =>
      if (startedReporters.add("jmx")) {
        com.codahale.metrics.jmx.JmxReporter.forRegistry(registry)
          .inDomain("graft")
          .convertRatesTo(TimeUnit.SECONDS)
          .convertDurationsTo(TimeUnit.MILLISECONDS)
          .build()
          .start()
      }
    case other =>
      throw new IllegalArgumentException(
        s"unknown metrics reporter '$other' — one of inmemory|console|jmx " +
          "(or bridge into Spark's metrics system via " +
          "spark.plugins=graft.metrics.GraftSparkPlugin)")
  }

  /** Compact one-line-per-metric dump (gauges, counters, timer summaries),
    * sorted by name — log-grep friendly, unlike codahale's multi-line
    * ConsoleReporter blocks.
    */
  def report(out: PrintStream, prefix: String = ""): Unit = {
    import scala.jdk.CollectionConverters._
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    registry.getGauges.asScala.foreach { case (n, g) =>
      if (n.startsWith(prefix)) lines += s"$n value=${g.getValue}"
    }
    registry.getCounters.asScala.foreach { case (n, c) =>
      if (n.startsWith(prefix)) lines += s"$n count=${c.getCount}"
    }
    registry.getTimers.asScala.foreach { case (n, t) =>
      if (n.startsWith(prefix)) {
        val s = t.getSnapshot
        lines += f"$n count=${t.getCount} mean_ms=${s.getMean / 1e6}%.1f " +
          f"p99_ms=${s.get99thPercentile / 1e6}%.1f max_ms=${s.getMax / 1e6}%.1f"
      }
    }
    lines.sorted.foreach(l => out.println(s"[graft-metrics] $l"))
  }

  /** Forward every metric (existing and future) into `target`, keeping
    * the SAME metric objects so values stay live — the bridge
    * [[GraftSparkPlugin]] uses to surface graft metrics through Spark's
    * metrics system. codahale replays all existing metrics to a newly
    * added listener, so attach order doesn't matter. Name collisions in
    * the target (re-bridge, two bridges) are ignored: first registration
    * wins and it is the same live object anyway.
    */
  def bridgeTo(target: MetricRegistry): Unit = {
    def put(n: String, m: Metric): Unit =
      try { target.register(n, m); () }
      catch { case _: IllegalArgumentException => () }
    registry.addListener(new MetricRegistryListener {
      override def onGaugeAdded(n: String, g: Gauge[_]): Unit = put(n, g)
      override def onGaugeRemoved(n: String): Unit = { target.remove(n); () }
      override def onCounterAdded(n: String, c: Counter): Unit = put(n, c)
      override def onCounterRemoved(n: String): Unit = { target.remove(n); () }
      override def onHistogramAdded(n: String, h: Histogram): Unit = put(n, h)
      override def onHistogramRemoved(n: String): Unit = { target.remove(n); () }
      override def onMeterAdded(n: String, m: Meter): Unit = put(n, m)
      override def onMeterRemoved(n: String): Unit = { target.remove(n); () }
      override def onTimerAdded(n: String, t: Timer): Unit = put(n, t)
      override def onTimerRemoved(n: String): Unit = { target.remove(n); () }
    })
  }
}
