package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.read.GraftReadClient
import graft.services.TableServices
import graft.write.{GraftWriteClient, WriteConfig}

/** Driver-side planning scalability: every read plans from the
  * manifest-in-commit file-system view, so at 100 TB / ~120 MB files the
  * driver resolves latest slices over ~10⁶ file entries spread across
  * ~10⁴ partitions. These tests pin the cost model at exactly that
  * shape (synthesized in memory — no 100 TB of parquet needed):
  *
  *  - [[FileSystemView.latestSlices]] is ONE linear pass with hash-map
  *    grouping: measured ~0.45 s for 1M entries / 100k groups on this
  *    class of hardware (~0.03 s at 100k entries — linear, no
  *    quadratic term; allocation is one map entry + one buffer cell per
  *    file entry, ~200 B/entry ≈ 200 MB transient at 1M, well under
  *    any driver heap that can hold the metadata at all).
  *  - The archive-manifest JSON parse is the EXPENSIVE step (~10 s and
  *    ~250 MB of text at 1M files) — [[GraftTable.expandedManifest]]
  *    memoizes the parsed+expanded form per manifest name, so a
  *    process pays it once per archive generation, not once per view
  *    build (several view builds happen per write).
  *
  * The reference needs a timeline REST server + RocksDB/spillable view
  * (RemoteHoodieTableFileSystemView.java) or the HFile metadata table
  * (HoodieBackedTableMetadata.java) to hit the same bound; the manifest
  * + memoization reaches it with plain driver memory.
  */
class PlanningScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
    .master("local[4]")
    .appName("graft-planning-scale-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime
    val r = f
    (r, (System.nanoTime - t0) / 1e9)
  }

  /** `versions` commits, each touching every one of nParts × groups file
    * groups (alternating base/delta so MOR slice assembly is exercised):
    * nParts × groups × versions total file entries.
    */
  private def synthView(nParts: Int, groups: Int, versions: Int): FileSystemView = {
    val metas = (0 until versions).map { v =>
      val ts = f"20260101${v}%09d"
      val files = (0 until nParts).flatMap { p =>
        (0 until groups).map { g =>
          val fid = s"g${p}_$g"
          val suffix = if (v % 2 == 1) ".delta.parquet" else ".parquet"
          WriteFileInfo(s"p=$p", fid, s"${fid}_$ts$suffix",
            100000L, 120L * 1000 * 1000, isDelta = v % 2 == 1,
            minKey = "k0", maxKey = "k9")
        }
      }
      (GraftInstant(ts,
        if (v % 2 == 1) GraftAction.DeltaCommit else GraftAction.Commit,
        GraftState.Completed),
        GraftCommitMetadata(ts, GraftAction.Commit, "upsert", files = files))
    }
    new FileSystemView(metas)
  }

  test("latest-slice resolution stays linear and bounded through 1M file entries") {
    // warm the JIT on a throwaway view so the 100k sample isn't
    // measuring compilation
    synthView(100, 10, 10).latestSlices(None)

    // 100k entries: 1k partitions x 10 groups x 10 versions
    val small = synthView(1000, 10, 10)
    val (slicesS, tSmall) = time(small.latestSlices(None))
    assert(slicesS.size === 10000)

    // 1M entries: 10k partitions x 10 groups x 10 versions — the 100 TB
    // shape (10⁶ files, 10⁴ partitions)
    val big = synthView(10000, 10, 10)
    val (slicesB, tBig) = time(big.latestSlices(None))
    assert(slicesB.size === 100000)
    // every group: latest base + the deltas above it (5 bases/5 deltas
    // alternating ⇒ exactly one delta newer than the newest base... the
    // last version index 9 is a delta, 8 is the newest base)
    assert(slicesB.forall(s => s.base.nonEmpty && s.deltas.size === 1))

    // absolute bound: measured ~0.45 s; 10 s leaves an order of
    // magnitude for slow/contended CI hardware while still failing on
    // any accidental quadratic regression (which would be minutes)
    assert(tBig < 10.0, f"1M-entry latestSlices took $tBig%.2f s (bound 10 s)")
    // linearity: 10x the entries must not cost more than ~40x the 100k
    // pass (generous for timer noise + cache effects; a quadratic term
    // would push this past 100x)
    assert(tBig < math.max(0.5, tSmall * 40),
      f"1M-entry pass ($tBig%.2f s) is super-linear vs 100k ($tSmall%.3f s)")

    val (byPart, tParts) = time(big.groupsInPartitions(Set("p=5", "p=77")))
    assert(byPart.values.map(_.size).sum === 20)
    assert(tParts < 10.0, f"groupsInPartitions took $tParts%.2f s")
  }

  test("archive-manifest parse is paid once per manifest name, not per view build") {
    val dir = Files.createTempDirectory("graft_planscale_").toString + "/t"
    val cfg = GraftTableConfig(
      tableName = "ps", tableType = GraftTableType.Cow,
      recordKeyFields = Seq("o_orderkey"),
      partitionFields = Seq("o_orderpriority"),
      precombineField = Some("o_totalprice"))
    val t = GraftTable.create(spark, dir, cfg)
    val wc = WriteConfig(archiveMinCommits = 2, archiveMaxCommits = 3,
      inlineCompactDeltaCommits = 0)
    val w = new GraftWriteClient(t, wc)
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderkey") < 300)
    w.bulkInsert(orders)
    (1 to 4).foreach { i =>
      w.upsert(orders.withColumn("o_totalprice", col("o_totalprice") + i))
    }
    val svc = new TableServices(t, wc)
    assert(svc.archive(minCommits = 2, maxCommits = 3).nonEmpty,
      "archiving should have produced a manifest")

    val name = t.storage.listNames(t.storage.archiveDir)
      .filter(_.endsWith(".manifest")).sorted.last
    val first = t.expandedManifest(name)
    val second = t.expandedManifest(name)
    // memoized: the SAME expanded sequence object, no re-read/re-parse
    assert(first eq second,
      "expandedManifest must memoize the parsed manifest per name")
    assert(first.nonEmpty)

    // and the view built on top still reads the correct current state
    val snap = new GraftReadClient(t).snapshotData()
    assert(snap.count() === orders.count())
    val got = snap.agg(sum("o_totalprice")).head.getDouble(0)
    val want = orders.agg(sum(col("o_totalprice") + 4)).head.getDouble(0)
    assert(math.abs(got - want) < 1e-6)
  }

  /** 1M file entries shaped like synthView's 100 TB table. */
  private def synthManifestFiles(): Seq[WriteFileInfo] =
    (0 until 10000).flatMap { p =>
      (0 until 100).map { g =>
        val fid = s"g${p}_$g"
        WriteFileInfo(s"p=$p", fid, s"${fid}_20260101000000100.parquet",
          100000L, 120L * 1000 * 1000, isDelta = false,
          minKey = "k0", maxKey = "k9",
          colStats = Map("o_custkey" -> Seq("1", "99999")),
          colNulls = Map("o_custkey" -> 0L))
      }
    }

  test("COLD archive-manifest load at the 1M-file shape is seconds, not tens") {
    val dir = Files.createTempDirectory("graft_planscale_cold_").toString + "/t"
    val cfg = GraftTableConfig(
      tableName = "psc", tableType = GraftTableType.Cow,
      recordKeyFields = Seq("o_orderkey"),
      partitionFields = Seq("o_orderpriority"))
    val t = GraftTable.create(spark, dir, cfg)
    val ts = "20260101000000200"
    val meta = GraftCommitMetadata(ts, GraftAction.Commit, "manifest",
      files = synthManifestFiles())
    val (_, tWrite) = time(
      ArchiveManifest.write(spark, t.storage, ts, meta))
    val name = t.storage.listNames(t.storage.archiveDir)
      .filter(_.endsWith(".manifest")).sorted.last

    // HOST-IO CALIBRATION (the Bench calibration-channel pattern): the
    // same 1M-row parquet files dir read with RAW Spark — identical IO +
    // columnar decode + driver collect, zero graft code — so its time
    // moves with host/suite contention, never with this repo's manifest
    // code. The wall-clock bound below scales with it: a contended full
    // suite inflates calibration and bound together, while a structural
    // regression (the ~10 s legacy single-JSON parse) inflates ONLY the
    // graft load and still fails. (The r18 absolute 6 s bound flaked at
    // 6.21 s under full-suite IO contention — passing 7/7 in isolation.)
    val filesDir = t.storage.listNames(t.storage.archiveDir)
      .find(_.startsWith(s"$name.files"))
      .map(d => new org.apache.hadoop.fs.Path(t.storage.archiveDir, d).toString)
      .get
    val (_, tRaw) = time(spark.read.parquet(filesDir).collect())

    // the manifest memo is PROCESS-wide since r18 (keyed by table path +
    // manifest name, so per-commit consumers that load a fresh handle —
    // the RO-manifest hook — stay O(churn)); measuring a true cold load
    // needs an explicit eviction, not just a fresh handle. Best of TWO
    // memo-cold loads: one host-IO spike late in a full-suite run
    // measured 10.5 s for a load that re-measures 3.8 s in isolation — a
    // structural regression (the legacy parse) is slow on EVERY attempt,
    // so the min keeps the regression teeth while shedding one-off
    // contention.
    GraftTable.evictManifestMemo(dir)
    val t2 = GraftTable.load(spark, dir)
    val (expanded, tCold1) = time(t2.expandedManifest(name))
    assert(expanded.map(_._2.files.size).sum === 1000000)
    GraftTable.evictManifestMemo(dir)
    val t3 = GraftTable.load(spark, dir)
    val (_, tCold2) = time(t3.expandedManifest(name))
    val tCold = math.min(tCold1, tCold2)
    info(f"1M-entry manifest: write $tWrite%.2f s, raw-read calibration " +
      f"$tRaw%.2f s, cold loads $tCold1%.2f/$tCold2%.2f s")
    // bound: isolated runs measure ~2.2-3 s with the calibration around
    // ~1 s; 6 s absolute floor keeps the isolated behavior, 3x the
    // calibration lifts it only when the HOST is demonstrably slow, and
    // a regression to the ~10 s legacy parse fails either way (it is
    // ~10x the calibration, not ~3x)
    assert(tCold < math.max(6.0, 3.0 * tRaw),
      f"cold 1M-entry manifest load took $tCold%.2f s (bound " +
        f"max(6, 3x$tRaw%.2f) s; legacy JSON was ~10 s)")

    // warm: memoized process-wide, same object across fresh handles
    // (t3's reload replaced t2's entry — the memo holds ONE expansion per
    // table, shared by every handle from here on)
    assert(t2.expandedManifest(name) eq t3.expandedManifest(name))
  }

  test("a transient marker-publish failure RETHROWS — never a silent no-manifest archive") {
    // if write() swallowed a genuine create failure, the caller would
    // archive the instants off the active timeline with NO checkpoint
    // holding their file entries: silent committed-data loss
    val dir = Files.createTempDirectory("graft_planscale_fault_").toString + "/t"
    val cfg = GraftTableConfig(
      tableName = "psf", tableType = GraftTableType.Cow,
      recordKeyFields = Seq("o_orderkey"),
      partitionFields = Seq("o_orderpriority"))
    val t = GraftTable.create(spark, dir, cfg)
    val ts = "20260101000000300"
    val meta = GraftCommitMetadata(ts, GraftAction.Commit, "manifest",
      files = Seq(WriteFileInfo("p=0", "g0", "g0_x.parquet", 10L, 1000L,
        isDelta = false)))
    ArchiveManifest.markerFault =
      () => throw new java.io.IOException("simulated transient storage failure")
    try {
      intercept[java.io.IOException](
        ArchiveManifest.write(spark, t.storage, ts, meta))
    } finally ArchiveManifest.markerFault = () => ()
    val left = t.storage.listNames(t.storage.archiveDir)
    assert(!left.exists(_ == s"$ts.manifest"), "no marker may exist after the failure")
    assert(!left.exists(_.startsWith(s"$ts.manifest.files")),
      "the failed attempt's parquet dir must not be leaked")
    // a retry after the transient failure succeeds normally
    ArchiveManifest.write(spark, t.storage, ts, meta)
    assert(ArchiveManifest.read(spark, t.storage, s"$ts.manifest").files === meta.files)
  }

  test("losing the marker race to a competing archiver is swallowed; the winner's manifest survives") {
    val dir = Files.createTempDirectory("graft_planscale_race_").toString + "/t"
    val cfg = GraftTableConfig(
      tableName = "psr", tableType = GraftTableType.Cow,
      recordKeyFields = Seq("o_orderkey"),
      partitionFields = Seq("o_orderpriority"))
    val t = GraftTable.create(spark, dir, cfg)
    val ts = "20260101000000400"
    val winner = GraftCommitMetadata(ts, GraftAction.Commit, "manifest",
      files = Seq(WriteFileInfo("p=0", "gw", "gw_x.parquet", 10L, 1000L,
        isDelta = false)))
    val loser = winner.copy(files = Seq(WriteFileInfo("p=0", "gl",
      "gl_x.parquet", 10L, 1000L, isDelta = false)))
    val marker = new org.apache.hadoop.fs.Path(t.storage.archiveDir, s"$ts.manifest")
    // the competing archiver lands its marker INSIDE the race window
    // (after our exists() check, before our create)
    ArchiveManifest.markerFault = () => {
      ArchiveManifest.markerFault = () => ()
      ArchiveManifest.write(spark, t.storage, ts, winner)
    }
    try ArchiveManifest.write(spark, t.storage, ts, loser) // returns normally
    finally ArchiveManifest.markerFault = () => ()
    // the winner's manifest is what the boundary resolves to, and the
    // loser's orphan parquet dir is gone (exactly one files dir remains)
    assert(ArchiveManifest.read(spark, t.storage, s"$ts.manifest").files === winner.files)
    assert(t.storage.listNames(t.storage.archiveDir)
      .count(_.startsWith(s"$ts.manifest.files")) === 1)
  }

  test("a failure AFTER our own marker published keeps the files dir (no self-orphaning)") {
    // createImmutable can throw after the marker landed (its tmp-cleanup
    // is inside a finally); treating that as a lost race would delete
    // the parquet dir OUR published marker references — every later read
    // of the boundary fails and the archived file entries are lost. The
    // catch must recognize the surviving marker as its own and succeed.
    val dir = Files.createTempDirectory("graft_planscale_own_").toString + "/t"
    val cfg = GraftTableConfig(
      tableName = "pso", tableType = GraftTableType.Cow,
      recordKeyFields = Seq("o_orderkey"),
      partitionFields = Seq("o_orderpriority"))
    val t = GraftTable.create(spark, dir, cfg)
    val ts = "20260101000000500"
    val meta = GraftCommitMetadata(ts, GraftAction.Commit, "manifest",
      files = Seq(WriteFileInfo("p=0", "go", "go_x.parquet", 10L, 1000L,
        isDelta = false)))
    val marker = new org.apache.hadoop.fs.Path(t.storage.archiveDir, s"$ts.manifest")
    // simulate create-then-throw: land the marker with THIS attempt's
    // files-dir name (the parquet dir is already written when the fault
    // fires), so the subsequent createImmutable throws AlreadyExists
    // while the surviving marker is provably our own
    ArchiveManifest.markerFault = () => {
      val dirName = t.storage.listNames(t.storage.archiveDir)
        .find(_.startsWith(s"$ts.manifest.files")).get
      val header = meta.copy(files = Seq.empty,
        extra = meta.extra + (ArchiveManifest.FormatKey -> "parquet") +
          (ArchiveManifest.FilesDirKey -> dirName))
      t.storage.createImmutable(marker, Json.write(header))
    }
    try ArchiveManifest.write(spark, t.storage, ts, meta) // returns normally
    finally ArchiveManifest.markerFault = () => ()
    assert(t.storage.listNames(t.storage.archiveDir)
      .count(_.startsWith(s"$ts.manifest.files")) === 1,
      "our files dir must survive — the published marker references it")
    assert(ArchiveManifest.read(spark, t.storage, s"$ts.manifest").files === meta.files)
  }

  test("legacy single-JSON manifests stay readable next to the parquet format") {
    val dir = Files.createTempDirectory("graft_planscale_legacy_").toString + "/t"
    val cfg = GraftTableConfig(
      tableName = "psl", tableType = GraftTableType.Cow,
      recordKeyFields = Seq("o_orderkey"),
      partitionFields = Seq("o_orderpriority"))
    val t = GraftTable.create(spark, dir, cfg)
    val files = Seq(WriteFileInfo("p=0", "g0", "g0_20260101000000100.parquet",
      10L, 1000L, isDelta = false))
    val meta = GraftCommitMetadata("20260101000000200", GraftAction.Commit,
      "manifest", files = files, schemaJson = "")
    // a manifest written by an older version: ONE json document, files inline
    t.storage.fs.mkdirs(t.storage.archiveDir)
    t.storage.createImmutable(
      new org.apache.hadoop.fs.Path(t.storage.archiveDir,
        "20260101000000200.manifest"),
      Json.write(meta))
    val loaded = ArchiveManifest.read(spark, t.storage, "20260101000000200.manifest")
    assert(loaded.files === files)
    assert(t.expandedManifest("20260101000000200.manifest")
      .map(_._2.files.size).sum === 1)
  }
}
