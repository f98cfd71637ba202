package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Sequence packing and token-budget mixture for training-data
  * pipelines: assign every document its position in the concatenated
  * token stream (pretraining "concat-and-chunk" packing), and cap each
  * domain of a corpus mixture at a token budget in deterministic hash
  * order.
  *
  * Both reduce to one primitive — an EXACT GLOBAL PREFIX SUM in a total
  * order — which naively is `Window.orderBy(...)` with no partition
  * spec: Spark executes that by moving the entire dataset to a single
  * partition, the canonical 100 TB scale-killer. [[distributedCumsum]]
  * is the two-pass distributed form instead:
  *
  *   1. range-shuffle the skinny (order, value) projection so partition
  *      p holds a contiguous key range, and persist it (the range
  *      boundaries are sampled, so the SAME materialized layout must
  *      feed both passes);
  *   2. one tiny aggregate computes per-(partition, group) sums —
  *      at most `numPartitions x |groups|` rows of planning metadata on
  *      the driver, from which exclusive per-partition offsets follow;
  *   3. a within-partition window (partitioned by the captured physical
  *      partition id, so ~numPartitions independent window groups, never
  *      one global one) plus the broadcast-joined offset yields the
  *      exact global cumsum.
  *
  * The result is identical to the single-partition window — prefix sums
  * do not depend on where partition boundaries fall, only on the total
  * order, which is why every step is oracle-exact — but the largest
  * single-node obligation is one partition's sort instead of the whole
  * corpus. Callers pass a SKINNY projection (id + value columns, ~16
  * bytes/row); assignments join back to the full rows by id, so the
  * wide document data is never shuffled at all.
  */
object Packing {

  /** Exact cumulative sum of `valueCol` over the total order
    * `orderCols`, within each distinct value of `groupCols` (empty =
    * one global stream). Appends:
    *
    *   - `_cum`: inclusive prefix sum (long)
    *
    * The input should already be projected down to the columns the
    * caller needs; `finish` is the caller's final projection/filter,
    * applied before the result persist so the returned frame stays
    * caller-unpersistable. The function materializes its result eagerly
    * (the intermediate range layout must stay pinned until the offsets
    * are consumed) and returns it persisted MEMORY_AND_DISK — the
    * caller unpersists the returned frame when done. NULL values sum as
    * 0; NULL group keys form their own group (matched null-safely).
    */
  def distributedCumsum(
      df: DataFrame,
      valueCol: String,
      orderCols: Seq[String],
      groupCols: Seq[String] = Seq.empty,
      finish: DataFrame => DataFrame = identity): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val rangeKeys = (groupCols ++ orderCols).map(col)

    // Pass 0: range layout. Persist is REQUIRED for exactness, not a
    // cache hint: RangePartitioner samples its bounds per plan
    // execution, so an unpersisted frame could land rows in different
    // partitions between the stats pass and the final pass, corrupting
    // the offsets.
    val ranged = df
      .repartitionByRange(nPart, rangeKeys: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Pass 1: per-(pid, group) sums — planning metadata, <= nPart x
    // |groups| rows. Exclusive offset of (pid, group) = sum over
    // earlier pids of the same group (range partitioning keeps each
    // group's rows in ascending-pid contiguous runs). NULL values count
    // as 0 (same as a window sum, which skips them), so _psum is never
    // null even for an all-null run.
    val safeValue = coalesce(col(valueCol).cast("long"), lit(0L))
    val stats = ranged
      .groupBy(("_pid" +: groupCols).map(col): _*)
      .agg(sum(safeValue).as("_psum"))
      .collect()
    val offsets: Seq[(Int, Seq[Any], Long)] = stats
      .map(r => (r.getInt(0), groupCols.map(g => r.getAs[Any](g)), r.getLong(r.length - 1)))
      .toSeq
      .groupBy(_._2)
      .flatMap { case (grp, rows) =>
        val sorted = rows.sortBy(_._1)
        val cums = sorted.scanLeft(0L)(_ + _._3)
        sorted.zip(cums).map { case ((pid, _, _), off) => (pid, grp, off) }
      }
      .toSeq

    // Pass 2: within-partition window + broadcast offset join. The
    // window's partition key includes _pid, so no window group exceeds
    // one physical partition of the ranged layout.
    val offSchema = new org.apache.spark.sql.types.StructType()
      .add("_pid", "int")
    val offRows = offsets.map { case (pid, grp, off) =>
      org.apache.spark.sql.Row.fromSeq(pid +: grp :+ off)
    }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      groupCols.foldLeft(offSchema)((s, g) => s.add(g, df.schema(g).dataType))
        .add("_offset", "long"))

    // ROWS frame (not the default RANGE): with unique order keys the
    // results are identical, but ROWS avoids peer-group semantics and
    // Spark's RANGE restrictions on multi-column orderings.
    val w = Window
      .partitionBy(("_pid" +: groupCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL-SAFE offset join: a plain equi-join would silently drop every
    // row of a null group (null = null is never true); <=> matches them.
    val joinCond = groupCols.foldLeft(ranged("_pid") === offDf("_pid")) {
      (c, g) => c && (ranged(g) <=> offDf(g))
    }
    val joined0 = ranged.join(broadcast(offDf), joinCond).drop(offDf("_pid"))
    // `finish` (the caller's final projection/filter) applies BEFORE the
    // persist so the RETURNED frame is exactly the cached one —
    // Dataset.unpersist matches by plan, so anything layered on top
    // afterwards would make the cache unreachable to the caller.
    val result = finish(
      groupCols.foldLeft(joined0)((d, g) => d.drop(offDf(g)))
        .withColumn("_cum", sum(safeValue).over(w) + col("_offset"))
        .drop("_pid", "_offset"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Materialize the (skinny) result while the ranged layout is still
    // pinned, then release the intermediate cache: unpersisting `ranged`
    // any earlier would let a later action re-execute the range shuffle
    // with freshly sampled bounds and corrupt the offsets; never
    // unpersisting it leaks a cache entry per call that the caller
    // cannot reach. The RETURNED frame is the only cached artifact —
    // callers unpersist it directly when done.
    result.count()
    ranged.unpersist(false)
    result
  }

  /** Concat-and-chunk packing assignment: documents are concatenated in
    * ascending `idCol` order and the token stream is cut every `budget`
    * tokens; each document reports the chunk it starts in and its token
    * offset within that chunk (a doc may span into later chunks —
    * `pack_id` of the next doc tells you how far). Output:
    * `(id, n_tokens, pack_id, pack_offset)`, suitable for a downstream
    * gather that builds fixed-length training batches.
    *
    * Exact integer arithmetic throughout (`div`/`%` on longs — no
    * floating-point floor), so assignments are bit-stable across
    * engines and scales.
    */
  def packChunks(
      df: DataFrame,
      idCol: String,
      tokenCountCol: Column,
      budget: Long): DataFrame = {
    val skinny = df.select(col(idCol),
      coalesce(tokenCountCol.cast("long"), lit(0L)).as("n_tokens"))
    distributedCumsum(skinny, "n_tokens", Seq(idCol), Seq.empty, d =>
      d.withColumn("_start", col("_cum") - col("n_tokens"))
        .select(
          col(idCol),
          col("n_tokens"),
          expr(s"_start div ${budget}L").as("pack_id"),
          (col("_start") % budget).as("pack_offset")))
  }

  /** Pack GATHER: materialize the fixed-length batches [[packChunks]]
    * assigns — per chunk, the document PIECES that fill it. A document
    * spanning a chunk boundary contributes one piece per chunk it
    * crosses (`explode(sequence(first_chunk, last_chunk))` — total piece
    * count is |docs| + total_tokens/budget, linear in corpus size, never
    * quadratic; a giant document simply owns a run of whole chunks).
    * One row per piece:
    *
    *   - `pack_id`       chunk the piece belongs to
    *   - `<id>`          the source document
    *   - `piece_offset`  position of the piece inside the chunk
    *   - `doc_start`     first token of the piece within its document
    *   - `piece_len`     tokens contributed
    *
    * Exact long arithmetic throughout; every chunk's pieces sum to
    * EXACTLY `budget` tokens except the final chunk, and pieces tile
    * each chunk gaplessly in `piece_offset` order — the invariants a
    * trainer's batch builder relies on (pinned in PackingSpec). The
    * actual token concatenation is a trivial per-chunk map over these
    * rows once a tokenizer is attached; the hard part — the exact global
    * placement — is all here, on the same scale-safe prefix sum.
    * Returns the frame persisted like [[distributedCumsum]]; callers
    * unpersist when done. Use [[gatherPacks]] for the nested
    * one-row-per-chunk form.
    */
  def gatherPieces(
      df: DataFrame,
      idCol: String,
      tokenCountCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    val skinny = df.select(col(idCol),
      coalesce(tokenCountCol.cast("long"), lit(0L)).as("n_tokens"))
    distributedCumsum(skinny, "n_tokens", Seq(idCol), Seq.empty, d =>
      d.withColumn("_start", col("_cum") - col("n_tokens"))
        .filter(col("n_tokens") > 0) // empty docs occupy no chunk
        .withColumn("pack_id", explode(sequence(
          expr(s"_start div ${budget}L"),
          expr(s"(_cum - 1) div ${budget}L"))))
        .withColumn("_cstart", col("pack_id") * budget)
        .select(
          col("pack_id"),
          col(idCol),
          greatest(col("_start") - col("_cstart"), lit(0L)).as("piece_offset"),
          greatest(col("_cstart") - col("_start"), lit(0L)).as("doc_start"),
          (least(col("_cum"), col("_cstart") + budget) -
            greatest(col("_start"), col("_cstart"))).as("piece_len")))
  }

  /** One row per chunk: `(pack_id, pack_tokens, pieces)` with `pieces`
    * the `piece_offset`-ordered array of `(piece_offset, <id>,
    * doc_start, piece_len)` structs — the shape a batch builder consumes
    * directly. The shuffle moves piece METADATA keyed by pack_id (each
    * chunk's array is ≤ budget tokens of references), never document
    * content.
    */
  def gatherPacks(
      df: DataFrame,
      idCol: String,
      tokenCountCol: Column,
      budget: Long): DataFrame = {
    val pieces = gatherPieces(df, idCol, tokenCountCol, budget)
    val out = pieces
      .groupBy("pack_id")
      .agg(
        sum("piece_len").as("pack_tokens"),
        sort_array(collect_list(struct(
          col("piece_offset"), col(idCol), col("doc_start"),
          col("piece_len")))).as("pieces"))
    // hand the caller an unpersist-able frame: materialize the grouped
    // form is cheap relative to re-running the prefix sum, so just leave
    // the piece cache to the grouped plan's lineage and release it after
    val result = out.persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    pieces.unpersist(false)
    result
  }

  /** Deterministic epoch-shuffle rank: every document's position in the
    * md5-of-id order — the rerun-stable "global shuffle" a training
    * pipeline writes its corpus in (hash order is uniform, so
    * consecutive ranks are an unbiased interleave of sources/domains).
    * Output `(id, shuffle_rank)` with ranks 1..N and no gaps: a rank
    * range IS a reproducible corpus slice, so sharding an epoch across
    * trainers needs no extra pass. The rank is the same prefix-sum in
    * hash order with value 1, so it scales exactly like [[packChunks]]
    * (a bare `row_number()` global window would be the single-partition
    * scale-killer).
    */
  def shuffleOrder(df: DataFrame, idCol: String): DataFrame = {
    val skinny = df.select(
      col(idCol),
      lit(1L).as("_one"),
      md5(col(idCol).cast("string")).as("_h"))
    distributedCumsum(skinny, "_one", Seq("_h", idCol), Seq.empty, d =>
      d.select(col(idCol), col("_cum").as("shuffle_rank")))
  }

  /** Token-budget mixture: keep each domain's documents in
    * deterministic md5-of-id order until the domain's cumulative token
    * count reaches its budget (the document that crosses the boundary
    * is kept — budgets are floors, not ceilings). Unlisted domains fall
    * back to `defaultBudget`; the hash order makes the kept set an
    * unbiased, rerun-stable sample of the domain, the same determinism
    * contract as [[Sampling.hashSample]].
    *
    * This is the corpus-mixture primitive (Pile/DoReMi-style domain
    * weighting expressed as absolute token budgets): upstream decides
    * tokens-per-domain, this operator materializes the document set.
    * Returns `(id, domain, n_tokens)` of the kept documents.
    */
  def mixtureByTokenBudget(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      tokenCountCol: Column,
      budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    val skinny = df.select(
      col(idCol),
      col(domainCol),
      coalesce(tokenCountCol.cast("long"), lit(0L)).as("n_tokens"),
      md5(col(idCol).cast("string")).as("_h"))
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (dom, b)) => when(col(domainCol) === dom, lit(b)).otherwise(acc)
    }
    distributedCumsum(skinny, "n_tokens", Seq("_h", idCol), Seq(domainCol), d =>
      d.filter(col("_cum") - col("n_tokens") < budget)
        .select(col(idCol), col(domainCol), col("n_tokens")))
  }
}
