package graft.write

/** Writer tuning knobs, defaults mirroring the reference's sizing
  * invariants (see BASELINE.md):
  *  - 120 MB target base file (hoodie.parquet.max.file.size)
  *  - 100 MB small-file threshold (hoodie.parquet.small.file.limit)
  *  - compact every 5 delta commits (hoodie.compact.inline.max.delta.commits)
  *  - retain 10 commits on clean (hoodie.cleaner.commits.retained)
  */
final case class WriteConfig(
    targetFileSizeBytes: Long = 120L * 1024 * 1024,
    smallFileLimitBytes: Long = 100L * 1024 * 1024,
    defaultRecordSizeBytes: Long = 1024L,
    combineBeforeUpsert: Boolean = true,
    combineBeforeInsert: Boolean = false,
    /** bulk_insert sort: "global" | "partition" | "none"
      * (ref: BulkInsertSortMode.java:24-29) */
    bulkInsertSortMode: String = "global",
    /** Output parallelism for bulk loads; 0 = Spark default parallelism. */
    parallelism: Int = 0,
    /** MOR: run inline compaction after this many delta commits; 0 = off. */
    inlineCompactDeltaCommits: Int = 5,
    /** Run inline clustering after this many data commits since the last
      * replace-commit; 0 = off (ref: hoodie.clustering.inline +
      * hoodie.clustering.inline.max.commits, HoodieClusteringConfig).
      */
    inlineClusterCommits: Int = 0,
    /** insert(): silently drop incoming records whose key already exists
      * in the table (ref: hoodie.datasource.write.insert.drop.duplicates,
      * DataSourceOptions INSERT_DROP_DUPS — implemented as the
      * filterExists anti-join before the write).
      */
    insertDropDups: Boolean = false,
    /** Run inline clean after each commit; retains `cleanRetainCommits`. */
    inlineClean: Boolean = false,
    cleanRetainCommits: Int = 10,
    /** Active-timeline archive bounds (hoodie.keep.{min,max}.commits). */
    archiveMinCommits: Int = 20,
    archiveMaxCommits: Int = 30,
    /** Global index: record keys are unique across partitions and an
      * upsert whose partition value changed MOVES the record (tombstone in
      * the old partition + insert in the new), mirroring
      * hoodie.index.type=GLOBAL_SIMPLE with
      * hoodie.simple.index.update.partition.path=true
      * (ref: SparkHoodieGlobalSimpleIndex.java). Non-global (default):
      * keys are scoped per partition, same as the reference default.
      */
    globalIndex: Boolean = false,
    /** Optimistic concurrency check: before publishing, fail the write if
      * a commit that completed after this write began touched an
      * overlapping file group (ref:
      * SimpleConcurrentFileWritesConflictResolutionStrategy.java:44-115).
      * On by default — the check is one timeline listing; disjoint
      * writers (pure inserts, different file groups) still commit
      * concurrently, same as the reference's conflict rule.
      */
    occEnabled: Boolean = true,
    /** COW update merges avoid shuffling the OLD base-file rows when the
      * incoming update slice for the affected groups fits under this
      * broadcast budget: old rows stream straight from their parquet scan
      * into a broadcast-hash left join and back out to their rewritten
      * file — only the incoming records ever cross the network. Above the
      * budget the merge falls back to the clustered-shuffle plan.
      */
    mergeBroadcastMaxBytes: Long = 32L * 1024 * 1024,
    /** Keep every written file sorted by record key (the SortedMergeHandle
      * behavior, ref: HoodieSortedMergeHandle.java): one extra in-task
      * sort per staged file, no shuffle; sorted files tighten min/max
      * range pruning and enable merge-sorted downstream reads.
      */
    sortedWrite: Boolean = false,
    /** Per-file key bloom filters: built during the commit-stats job,
      * stored as a per-commit sidecar, consulted by the index tag scan to
      * skip files that cannot contain any incoming key — the prune that
      * still works when uniformly-distributed (UUID-like) keys defeat
      * min/max range pruning (ref: SparkHoodieBloomIndex.java:70-299,
      * bloom sizing HoodieIndexConfig.java:56-58).
      */
    bloomIndexEnabled: Boolean = true,
    /** Bloom sizing: expected keys per file / false-positive rate. An
      * undersized filter only degrades the prune rate, never correctness.
      */
    bloomExpectedEntries: Long = 60000L,
    bloomFpp: Double = 0.01,
    /** Data columns to collect per-file min/max stats for (see
      * graft.core.ColumnStats) — read-time data skipping prunes file
      * slices whose ranges cannot satisfy a pushed filter, the
      * manifest-resident equivalent of hoodie.metadata.index.column.stats
      * .column.list. Empty = off. Unsupported/missing columns are skipped
      * silently (pruning is a strict optimization).
      */
    colStatsColumns: Seq[String] = Seq.empty,
    /** Free-form entries merged into each commit's metadata `extra`
      * (streaming batch ids, ingest checkpoints). */
    commitExtra: Map[String, String] = Map.empty,
    /** Post-commit hook invoked on the driver after every successful data
      * commit of this writer, with the table base path and the commit
      * metadata (ref: HoodieWriteCommitCallback.java — the seam behind
      * the reference's HTTP/Kafka commit notifications). The commit is
      * already durable when the callback runs; a callback failure is
      * logged and swallowed, never unwinds the commit.
      */
    commitCallback: Option[(String, graft.core.GraftCommitMetadata) => Unit] = None,
    /** Emit operational metrics (commit durations, records/bytes written,
      * compaction debt, clean reclaim) to the process-wide registry
      * (ref: HoodieWriteConfig.isMetricsOn / HoodieMetrics.java). Off by
      * default: the on-path is driver-side metadata arithmetic per
      * publish, the off-path a single branch. See
      * [[graft.metrics.GraftMetrics]].
      */
    metricsOn: Boolean = false,
    /** Where metrics go: "inmemory" (queryable registry only — the
      * default), "console" (periodic dump, see metricsReportPeriodSec),
      * "jmx" (live MBeans under the `graft` domain). Cluster deployments
      * should prefer `spark.plugins=graft.metrics.GraftSparkPlugin`,
      * which surfaces the same registry through Spark's own metrics
      * sinks (the reference's Graphite/Datadog/Prometheus reporter
      * matrix, had for free). Unknown values fail loudly at client
      * construction.
      */
    metricsReporter: String = "inmemory",
    /** Console reporter period in seconds; 0 = on-demand only
      * (GraftMetrics.report). */
    metricsReportPeriodSec: Int = 0,
    /** Cross-writer lock held around [conflict check + commit publish]:
      * "none" (default — create-if-absent instant files + pre-publish
      * check, the reference's no-external-lock default), "jvm" (a
      * process-wide per-table lock for multi-threaded single-driver
      * writers, ref: InProcessLockProvider.java), or "file" (a
      * TTL-broken lock file under `.graft/locks/`, closing the
      * check→publish race for writers sharing one filesystem). See
      * [[LockProvider]] (ref: TransactionManager.java:49-69).
      */
    lockProvider: String = "none",
    /** How long a writer waits for the commit lock before failing the
      * write loudly (LockAcquireException, nothing published). */
    lockTimeoutMs: Long = 60 * 1000L,
    /** Age past which a holder's lock file counts as crashed and may be
      * broken by a waiter. Must far exceed the metadata-only critical
      * section (seconds); minutes by default. */
    lockTtlMs: Long = 5 * 60 * 1000L,
    /** JDBC URL of the lock database for lockProvider="jdbc" (e.g.
      * "jdbc:postgresql://host/db?user=…" for multi-host deployments,
      * "jdbc:derby:/path/locks;create=true" embedded for single-host).
      * Credentials travel in the URL, standard JDBC style. See
      * [[JdbcLockProvider]]. */
    lockJdbcUrl: String = "",
    /** Age past which a service plan's inflight marker counts as a
      * crashed execution and may be claimed by another runner. Unlike
      * the commit lock (metadata-only, seconds), a claim covers the
      * whole compaction/clustering EXECUTION — minutes to hours of data
      * rewriting — so it gets its own, much larger TTL, and live
      * executions heartbeat the marker (mtime refresh every TTL/5; ref:
      * HoodieHeartbeatClient.java) so a healthy run is never judged
      * crashed no matter how long it takes. */
    serviceClaimTtlMs: Long = 15 * 60 * 1000L)
