package graft

import java.nio.file.Files

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.utilities.{IngestConfig, IngestRunner}

/** A row in the ingest walk (top level: Spark needs an outer-scope-free
  * encoder).
  */
case class IngestWalkRow(k: Long, p: String, v: Double, ord: Long)

/** Randomized model walk over the DFS ingest selector contract (ref:
  * DFSPathSelector / DatePartitionPathSelector semantics, DeltaSync
  * checkpoint-in-commit): seeded sequences of file drops with adversarial
  * mod-times — fresh groups, accretions onto a not-yet-ingested group,
  * late arrivals at-or-below the checkpoint (lost by the documented
  * strictly-greater contract), byte-capped drain rounds, SQL backfills
  * that must never move the checkpoint — replayed against an independent
  * model of WHICH files each round may select and what the table must
  * hold afterwards. The walks in ModelCheckSpec cover the table format;
  * this one covers the ingest layer above it.
  */
class IngestModelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
    .master("local[4]")
    .appName("graft-ingest-walk")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft_iwalk_").toString

  private def seeds(pinned: Long): Seq[Long] =
    pinned +: sys.env.get("GRAFT_MODEL_EXTRA_SEEDS").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty).map(_.toLong)

  

  private def toDf(rows: Seq[IngestWalkRow]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "p", "v", "ord")
  }

  /** One walk: `nBatches` file drops with adversarial mtimes, drained
    * through runOnce under an optional byte cap, with the model tracking
    * the selector contract independently.
    */
  private def runIngestWalk(seed: Long, capped: Boolean): Unit = {
    val rnd = new Random(seed)
    val src = tmp() + "/src"
    val tgt = tmp() + "/tgt"
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val parts = Seq("a", "b", "c")
    val ordGen = new java.util.concurrent.atomic.AtomicLong(0L)

    // dropped batches on disk, by mtime: (batch id, rows, bytes)
    case class Drop(id: Int, mtime: Long, rows: Seq[IngestWalkRow], bytes: Long)
    val onDisk = mutable.ArrayBuffer.empty[Drop]
    var ckptModel = -1L       // model of the engine's checkpoint
    // model table state: key -> row, replayed round by round
    val model = mutable.Map.empty[(String, Long), IngestWalkRow]
    var nextMtime = 1000000L
    var dropId = 0

    val cap: Option[Long] = if (capped) Some(1L) else None
    val cfg = IngestConfig(
      sourcePath = src, targetPath = tgt, maxBytesPerRound = cap,
      tableOptions = Map(
        "recordkey.field" -> "k",
        "partitionpath.field" -> "p",
        "precombine.field" -> "ord"))

    def writeDrop(mtime: Long): Drop = {
      dropId += 1
      val rows = (0 until 2 + rnd.nextInt(6)).map(_ => IngestWalkRow(
        rnd.nextInt(40).toLong, parts(rnd.nextInt(3)),
        rnd.nextInt(10000) / 10.0, ordGen.incrementAndGet()))
      val dir = s"$src/b$dropId"
      toDf(rows).coalesce(1).write.parquet(dir)
      var bytes = 0L
      fs.listStatus(new org.apache.hadoop.fs.Path(dir)).foreach { st =>
        if (st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith(".")) {
          fs.setTimes(st.getPath, mtime, mtime)
          bytes += st.getLen
        } else if (st.isFile) fs.delete(st.getPath, false) // _SUCCESS
      }
      val d = Drop(dropId, mtime, rows, bytes)
      onDisk += d
      d
    }

    /** The selector contract, independently: which drops must the next
      * round take, and what checkpoint must it record?
      */
    def expectedSelection(): Seq[Drop] = {
      val eligible = onDisk.filter(_.mtime > ckptModel).sortBy(_.mtime)
      if (eligible.isEmpty) return Seq.empty
      cap match {
        case None => eligible.toSeq
        case Some(limit) =>
          val groups = eligible.groupBy(_.mtime).toSeq.sortBy(_._1)
          val out = mutable.ArrayBuffer.empty[Drop]
          var bytes = 0L
          var stop = false
          groups.foreach { case (_, grp) =>
            val sz = grp.map(_.bytes).sum
            if (!stop && (bytes == 0L || bytes + sz <= limit)) {
              out ++= grp; bytes += sz
            } else stop = true
          }
          out.toSeq
      }
    }

    def applyToModel(selected: Seq[Drop]): Unit = {
      // one runOnce = ONE upsert batch; within it the precombine (max
      // ord) wins per key; ords are globally unique and increasing
      selected.flatMap(_.rows).groupBy(r => (r.p, r.k)).foreach {
        case (key, rs) => model(key) = rs.maxBy(_.ord)
      }
    }

    def drainOne(): Boolean = {
      val expect = expectedSelection()
      val got = IngestRunner.runOnce(spark, cfg)
      if (expect.isEmpty) {
        assert(got.isEmpty, s"(seed $seed) engine ingested from a dry source: $got")
        false
      } else {
        val wantCkpt = expect.map(_.mtime).max
        assert(got.contains(wantCkpt.toString),
          s"(seed $seed) checkpoint: engine=$got model=$wantCkpt " +
            s"(ckpt was $ckptModel, eligible=${onDisk.map(_.mtime)})")
        applyToModel(expect)
        ckptModel = wantCkpt
        true
      }
    }

    def checkTable(): Unit = {
      val got = spark.read.format("graft").load(tgt)
        .select(col("p"), col("k"), col("v"), col("ord"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      val want = model.values.map(r => (r.p, r.k, r.v, r.ord)).toSet
      assert(got == want,
        s"(seed $seed, capped=$capped) table diverged; " +
          s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
    }

    // ensure the first round exists so runOnce can create the table
    writeDrop(nextMtime)
    assert(drainOne())

    for (_ <- 1 to 14) {
      rnd.nextInt(100) match {
        case x if x < 45 =>
          // fresh drop(s), later mtime; sometimes two sharing one mtime
          nextMtime += 1000 + rnd.nextInt(5000)
          writeDrop(nextMtime)
          if (rnd.nextBoolean()) writeDrop(nextMtime)
        case x if x < 60 && onDisk.exists(_.mtime > ckptModel) =>
          // accretion: another file onto a PENDING (not yet ingested)
          // mtime group — it must ride along with its group
          val pending = onDisk.filter(_.mtime > ckptModel)
          writeDrop(pending(rnd.nextInt(pending.size)).mtime)
        case x if x < 72 =>
          // late arrival at or below the checkpoint: the documented
          // strictly-greater contract LOSES it (the boundary belongs to
          // the batch that recorded it) — the model never applies it
          val late = if (ckptModel < 0) 1L
            else ckptModel - rnd.nextInt(3) * 1000L
          writeDrop(math.max(1L, late))
        case x if x < 85 =>
          // SQL backfill between rounds: rows land, checkpoint does not
          // move (ord still increases, so the model applies it last-wins)
          val rows = (0 until 1 + rnd.nextInt(4)).map(_ => IngestWalkRow(
            rnd.nextInt(40).toLong, parts(rnd.nextInt(3)),
            rnd.nextInt(10000) / 10.0, ordGen.incrementAndGet()))
          toDf(rows).createOrReplaceTempView("graft_iwalk_backfill")
          IngestRunner.runSqlOnce(spark, cfg,
            "SELECT k, p, v, ord FROM graft_iwalk_backfill")
          rows.groupBy(r => (r.p, r.k)).foreach { case (key, rs) =>
            model(key) = rs.maxBy(_.ord)
          }
          assert(IngestRunner.lastCheckpoint(spark, tgt)
            .contains(ckptModel.toString),
            s"(seed $seed) backfill moved the checkpoint off $ckptModel")
        case _ =>
          // drain: one round, or until dry
          if (rnd.nextBoolean()) drainOne()
          else while (drainOne()) {}
      }
      if (rnd.nextInt(3) == 0) { while (drainOne()) {}; checkTable() }
    }
    while (drainOne()) {}
    checkTable()
  }

  test("ingest walk: selector contract under adversarial mod-times") {
    seeds(311L).foreach(runIngestWalk(_, capped = false))
  }

  test("ingest walk: byte-capped drain rounds") {
    seeds(313L).foreach(runIngestWalk(_, capped = true))
  }
}
