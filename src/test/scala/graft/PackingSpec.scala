package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

/** The distributed two-pass prefix sum must be BIT-IDENTICAL to the
  * naive single-partition global window it replaces — partition
  * boundaries must not be observable in the result. These tests run
  * with a small shuffle-partition count over data large enough that the
  * range layout genuinely splits every group across partitions, then
  * compare row-for-row against `Window.orderBy` with no partition spec
  * (fine at test scale; the scale-killer the operator exists to avoid).
  */
class PackingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-packing-test")
    .config("spark.sql.shuffle.partitions", "7")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // Deterministic fixture: 2000 docs, 5 domains, irregular token counts
  // (including zero-token docs), ids deliberately NOT contiguous so
  // range boundaries fall on awkward keys.
  private lazy val docs = {
    val rows = (0 until 2000).map { i =>
      val id = i * 7L + (i % 3)          // non-contiguous, still unique
      val dom = s"d${i % 5}"
      val n = if (i % 97 == 0) 0L else (i * 31 % 213).toLong
      (id, dom, n)
    }
    rows.toDF("id", "dom", "n")
  }

  test("distributedCumsum equals the global single-window cumsum") {
    val dist = Packing.distributedCumsum(docs, "n", Seq("id"))
      .select($"id", $"_cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs.withColumn("_cum", sum($"n").over(w))
      .select($"id", $"_cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist.size === 2000)
    assert(dist === naive)
  }

  test("grouped distributedCumsum equals per-group global windows") {
    val dist = Packing.distributedCumsum(docs, "n", Seq("id"), Seq("dom"))
      .select($"id", $"dom", $"_cum").collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val w = Window.partitionBy($"dom").orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs.withColumn("_cum", sum($"n").over(w))
      .select($"id", $"dom", $"_cum").collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(dist === naive)
  }

  test("packChunks assigns exact chunk ids and offsets") {
    val out = Packing.packChunks(docs, "id", $"n", budget = 1000L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val w = Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs
      .withColumn("start", sum($"n").over(w) - $"n")
      .collect().map { r =>
        val (id, n, st) = (r.getLong(0), r.getLong(2), r.getLong(3))
        (id, (n, st / 1000L, st % 1000L))
      }.toMap
    assert(out === naive)
    // offsets are always inside the chunk; chunk ids are monotone in id
    assert(out.values.forall { case (_, _, off) => off >= 0 && off < 1000L })
    val byId = out.toSeq.sortBy(_._1).map(_._2._2)
    assert(byId.zip(byId.tail).forall { case (a, b) => a <= b })
  }

  test("gatherPieces tiles every chunk to exactly the budget (except the last)") {
    val budget = 1000L
    val pieces = Packing.gatherPieces(docs, "id", $"n", budget)
    val rows = pieces.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    pieces.unpersist(false)
    val total = docs.agg(sum($"n")).head.getLong(0)
    val lastPack = (total - 1) / budget
    // every chunk present, every chunk tiles to exactly `budget` tokens
    // except the last, which holds the remainder
    val byPack = rows.groupBy(_._1)
    assert(byPack.keySet === (0L to lastPack).toSet)
    byPack.foreach { case (pid, ps) =>
      val want = if (pid == lastPack) total - lastPack * budget else budget
      assert(ps.map(_._5).sum === want, s"chunk $pid token sum")
      // pieces tile the chunk gaplessly in piece_offset order
      val sorted = ps.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"chunk $pid must start at offset 0")
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._3 + a._5 === b._3, s"gap/overlap in chunk $pid")
      }
    }
    // per-document reassembly: each doc's pieces cover [0, n) contiguously
    val byDoc = rows.groupBy(_._2)
    val nOf = docs.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    byDoc.foreach { case (id, ps) =>
      val sorted = ps.sortBy(_._4)
      assert(sorted.head._4 === 0L, s"doc $id first piece must start at 0")
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._4 + a._5 === b._4, s"doc $id pieces must be contiguous")
      }
      assert(sorted.map(_._5).sum === nOf(id), s"doc $id pieces must sum to n")
    }
    // zero-token docs contribute no pieces
    assert(!byDoc.keySet.exists(id => nOf(id) == 0L))
    // a piece never crosses its chunk boundary
    rows.foreach { case (_, _, off, _, len) =>
      assert(off >= 0 && off + len <= budget)
    }

    // the grouped form agrees with the flat one
    val packs = Packing.gatherPacks(docs, "id", $"n", budget)
    val grouped = packs.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getSeq[org.apache.spark.sql.Row](2).size)
    }
    packs.unpersist(false)
    assert(grouped.map(g => g._1 -> g._2).toMap ===
      byPack.map { case (p, ps) => p -> ps.map(_._5).sum })
    assert(grouped.map(g => g._1 -> g._3).toMap ===
      byPack.map { case (p, ps) => p -> ps.size })
  }

  test("mixtureByTokenBudget keeps hash-prefix docs up to the budget floor") {
    val budgets = Map("d0" -> 5000L, "d1" -> 0L)
    val out = Packing.mixtureByTokenBudget(docs, "id", "dom", $"n", budgets, 8000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // naive recomputation: per-domain md5 order, exclusive cumsum < budget
    val w = Window.partitionBy($"dom")
      .orderBy(md5($"id".cast("string")), $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs
      .withColumn("cum", sum($"n").over(w))
      .filter($"cum" - $"n" <
        when($"dom" === "d0", 5000L).when($"dom" === "d1", 0L).otherwise(8000L))
      .select($"id", $"dom", $"n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSet === naive.toSet)
    assert(out.length === naive.length)

    // a zero budget keeps nothing; the boundary doc is kept elsewhere:
    // each non-empty domain's kept token sum reaches >= its budget or
    // includes the whole domain
    assert(!out.exists(_._2 === "d1"))
    val keptSums = out.groupBy(_._2).map { case (d, rs) => d -> rs.map(_._3).sum }
    val totalSums = docs.groupBy($"dom").agg(sum($"n").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    keptSums.foreach { case (d, s) =>
      val b = budgets.getOrElse(d, 8000L)
      assert(s >= math.min(b, totalSums(d)))
    }
  }

  test("null groups are kept (null-safe offset join) and null values sum as 0") {
    val rows = (0 until 300).map { i =>
      val dom: Option[String] = if (i % 11 == 0) None else Some(s"d${i % 3}")
      val n: Option[Long] = if (i % 13 == 0) None else Some((i % 50).toLong)
      (i.toLong, dom, n)
    }
    val df = rows.toDF("id", "dom", "n")
    val dist = Packing.distributedCumsum(df, "n", Seq("id"), Seq("dom"))
      .select($"id", $"_cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist.size === 300) // no row dropped, null group included
    val w = Window.partitionBy($"dom").orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df.withColumn("_cum", sum(coalesce($"n", lit(0L))).over(w))
      .select($"id", $"_cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist === naive)
  }

  test("shuffleOrder ranks are dense 1..N and equal the global row_number in hash order") {
    val out = Packing.shuffleOrder(docs, "id")
    val ranks = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ranks.map(_._2).sorted.toSeq === (1L to 2000L))
    val w = Window.orderBy(md5($"id".cast("string")), $"id")
    val naive = docs.withColumn("r", row_number().over(w).cast("long"))
      .select($"id", $"r").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ranks.toMap === naive)
    out.unpersist(false)
  }

  test("one cache entry per call, released by unpersisting the RETURNED frame") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val out = Packing.packChunks(docs, "id", $"n", 1000L)
    assert(sc.getPersistentRDDs.size === before + 1,
      "exactly the returned frame may stay cached (no intermediate leak)")
    out.unpersist(blocking = true)
    assert(sc.getPersistentRDDs.size === before,
      "Dataset.unpersist on the returned frame must release the cache")
  }

  test("results are invariant to input partitioning") {
    val repartitioned = docs.repartition(13, $"dom")
    val a = Packing.packChunks(docs, "id", $"n", 777L).collect()
      .map(r => r.toSeq).toSet
    val b = Packing.packChunks(repartitioned, "id", $"n", 777L).collect()
      .map(r => r.toSeq).toSet
    assert(a === b)
  }
}
