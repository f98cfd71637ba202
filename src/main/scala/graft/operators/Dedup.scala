package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard near-dup detection.
  *
  * Design for 100 TB: every variant is shuffle-bounded by banding/
  * bucketing — candidate generation is an equi-join on (band, signature)
  * buckets, never an all-pairs comparison; exact-verification joins touch
  * candidate pairs only. No UDFs and — deliberately — no higher-order
  * array functions on the hot path: Spark does not codegen HOFs, so
  * MinHash/SimHash signatures are computed RELATIONALLY (explode once,
  * aggregate with N plain codegen'd agg expressions), which also
  * guarantees the shingle/token pipeline is evaluated exactly once per
  * row instead of once per hash seed.
  */
object Dedup {

  /** Exact dedup on normalized text: keep the lowest-id row per distinct
    * content. One hash-shuffle; the window key is the 128-bit MD5 of the
    * normalized text rather than the text itself, so the shuffle-sort
    * compares fixed-width 32-byte keys instead of whole documents —
    * the standard content-hash dedup tradeoff (collision odds ~n²/2¹²⁹,
    * ~1e-20 even at 10¹² docs). Skew == true duplicate mass either way.
    *
    * Bench note (r8): the r4→r6 `doc_dedup_exact` 1.3→2.9 s drift was
    * first-execution session overhead, not a plan change — the operator
    * was byte-identical across those rounds and full-text vs digest vs
    * narrow-projected variants all converge to ~0.4 s warm at sf0.1
    * (5 000 docs); cold runs of any variant cost 2.6-4.3 s.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // ONE hash aggregate (min_by on the id) instead of a window +
    // filter: the same single shuffle, but partial aggregation combines
    // duplicates map-side and no per-partition sort runs — at corpus
    // scale the window formulation sorted every row. Reserved internal
    // names so same-named caller columns never clobber.
    val cols = df.columns.toSeq
    // ordering = (id IS NULL, id), not the bare id: min_by IGNORES rows
    // whose ordering value is null, so a duplicate group with only
    // null-id rows would return a null struct (a fabricated all-null
    // output row) and a mixed group would silently skip its null-id
    // rows. The struct is never null, non-null ids still win (false <
    // true), and for all-non-null ids the pick is identical.
    df.groupBy(md5(normText(col(textCol))).as("_g_dedup_fp"))
      .agg(min_by(struct(cols.map(col): _*),
        struct(col(idCol).isNull, col(idCol))).as("_g_dedup_row"))
      .select(cols.map(c => col("_g_dedup_row").getField(c).as(c)): _*)
  }

  /** (id, HASHED shingle-set array, set size) per document. Two
    * deliberate layout choices on the hottest pipeline in the engine:
    *
    *  - the normalized text is materialized behind its own projection
    *    BEFORE shingling: the shingle `transform` lambda re-evaluates
    *    captured non-trivial expressions per array element, so composing
    *    `normText` directly into it would run the whitespace regexp
    *    O(text length) times per doc — quadratic in document size.
    *    (CollapseProject keeps the barrier: the normalized column is
    *    non-cheap and multiply-referenced.) The normalization itself runs
    *    AFTER [[spreadWork]], so the regexp pass executes at cluster
    *    parallelism instead of inside the source's few input splits
    *    (measured: a single-split corpus serialized ~1.4 s of regexp
    *    into one task at sf0.1).
    *
    *  - shingles are hashed to LONGS here, once, in the same projection:
    *    every downstream consumer (the minhash signature explode, both
    *    sides of the exact-Jaccard verify, the inverted index) needs only
    *    xxhash64(shingle) — hashing at the source consumes the string
    *    bytes exactly once, and the persisted frame holds 8-byte longs
    *    instead of ~5-char strings (smaller cache, cheaper joins).
    *    Distinctness is taken on the STRING shingles (inside
    *    charShinglesPre) before hashing, so `n` = |distinct shingles|
    *    exactly; two distinct shingles colliding on xxhash64 inside one
    *    document pair (~1e-19) is the same caveat the verify already
    *    carries.
    */
  private def docShingles(
      df: DataFrame, textCol: String, idCol: String, shingleLen: Int): DataFrame =
    spreadWork(df.select(col(idCol).as("id"), col(textCol).as("_raw")))
      .select(col("id"), normText(col("_raw")).as("_t"))
      .select(col("id"),
        transform(charShinglesPre(col("_t"), shingleLen), s => xxhash64(s)).as("sh"))
      .withColumn("n", size(col("sh")))

  /** Ensure per-row-expensive downstream work (shingling, per-token
    * hashing) runs at cluster parallelism. Compacted corpora routinely
    * arrive in a handful of input splits — without this the whole
    * signature pipeline executes on those few tasks regardless of
    * executor count. Unconditional: the repartition shuffles only the
    * narrow projected (id, text) columns — probing the current split
    * count first would force an `.rdd` plan conversion per invocation
    * and defeat AQE coalescing on the reused frame, costing more than
    * the narrow shuffle it occasionally saves.
    */
  private def spreadWork(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Candidate-pair lists above this row count fall back from broadcast
    * to shuffled joins in the verify step.
    */
  private val BroadcastCandidateLimit = 4000000L

  /** Exact-verify path selector: total hash elements in flight
    * (Σ_pairs n_a+n_b) up to this bound use the per-pair ARRAY
    * intersect (fast — no row multiplication); beyond it the verify
    * explodes to scalar (pair, hash) rows that spill at element
    * granularity. 10⁹ elements ≈ 8 GB of long payload across the join:
    * sized so the array path's per-task sort footprint stays within a
    * 250 MB/core execution share at the sizing floor (32 cores × 8 GB —
    * measured: array OOMs the sf3 bench [2.2B elements] at that floor,
    * exploded runs it failed:[]; array is 4× faster at sf1 [0.7B]).
    */
  private def ArrayVerifyMaxElements: Long =
    // overridable so tests can force the exploded path on small corpora
    // (production selection is the measured 1e9 default)
    sys.props.get("graft.dedup.array.verify.max.elements")
      .map(_.toLong).getOrElse(1000000000L)

  /** Peak-shuffle bound of the exploded verify: above this many
    * in-flight elements the candidate pairs split into sequential
    * CHUNKS, each chunk's shuffle files reclaimed (lineage truncated +
    * ContextCleaner) before the next starts — so peak disk is bounded
    * by the chunk size no matter how cluster-quadratic the pair volume
    * gets. 2.5e9 elements ≈ 75 GB shuffle+sort-spill, measured to fit
    * this node class (the sf3 bench ran 2.2B single-shot inside it;
    * sf10's 7.3B single-shot overflowed the local disk). Nodes with
    * TB-class local disk can raise it and get the one-plan shape back;
    * overridable so tests can force multi-chunk runs on tiny corpora.
    */
  private def ExplodedChunkElements: Long =
    sys.props.get("graft.dedup.exploded.verify.chunk.elements")
      .map(_.toLong).getOrElse(2500000000L)

  /** Exact-Jaccard verification of candidate pairs: join the shingle sets
    * back and compute |A∩B| / |A∪B|. Touches candidate pairs only.
    *
    * Join strategy matters more than the set intersection here: a naive
    * candidates⋈shingles⋈shingles plan sort-merge-shuffles the (large)
    * shingle ARRAYS of the whole corpus twice. Instead:
    *  1. a size-ratio prefilter kills pairs where min(n)/max(n) < t
    *     (necessary condition for jaccard >= t) using only the narrow
    *     (id, n) projection;
    *  2. the surviving pair list is materialized eagerly (it is the small
    *     side by LSH design) and BROADCAST into two streaming passes over
    *     the cached shingle frame — the corpus arrays are never shuffled;
    *  3. |A∩B| is computed one of two EXACT ways, chosen by the
    *     in-flight volume Σ_pairs (n_a + n_b) — known for free from the
    *     prefilter's narrow stats:
    *     - ARRAY path (small/medium volume): each pair row carries the
    *       two xxhash64'd shingle arrays and `array_intersect` counts
    *       in place. One row per PAIR — no row multiplication — so the
    *       constant factors are 3-5× better than any exploded design;
    *       per-task sort footprint is bounded by sizing the pair join's
    *       partitioning off the known volume.
    *     - EXPLODED path (cluster-quadratic volume): each side explodes
    *       its matched documents' shingles to (id_a, id_b, h) scalar
    *       rows, the sides equi-join on the full (pair, hash) key, and
    *       a map-side-combinable count per pair IS the intersection.
    *       Strictly more rows (one per shingle OCCURRENCE per pair),
    *       but every row is 24 bytes and spills at element granularity
    *       with explicitly sized partitions — the only shape that
    *       survives O(clusterSize²) pairs over a replica-heavy corpus
    *       at stock executor memory (the array path OOMed the sf3
    *       bench at the default 8 GB driver; the exploded path runs it
    *       failed:[], measured this round — and the reverse holds at
    *       sf1, where the array path is 4× faster).
    * Falls back to shuffled joins if the candidate list is too large to
    * broadcast; cost is then still O(candidate-doc shingles). Shingle
    * sets are array_distinct, so the per-pair count equals |A∩B| short
    * of an xxhash64 collision between two distinct shingles inside one
    * document pair (~1e-19 per pair) — identical on both paths.
    */
  private def verifyJaccard(
      candidates: DataFrame, // (id_a, id_b)
      shingles: DataFrame,   // (id, sh, n) — expected persisted by caller
      threshold: Double): DataFrame = {
    // the two verify paths agree only for threshold > 0: the exploded
    // plan's inner join never materializes zero-intersection pairs,
    // while the array plan emits them with inter=0. A non-positive
    // threshold is also semantically meaningless for near-dup gating
    // (every candidate would qualify), so reject it loudly.
    require(threshold > 0, s"jaccard threshold must be > 0, got $threshold")
    val sizes = shingles.select(col("id"), col("n"))
    val cand = candidates
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .join(sizes.toDF("id_b", "n_b"), "id_b")
      .filter(least(col("n_a"), col("n_b")).cast("double") /
        greatest(col("n_a"), col("n_b")) >= threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = cand.select("id_a", "id_b")
    // ONE action materializes the persisted pair list and returns both
    // planning numbers: the pair count (broadcast decision) and the
    // in-flight element volume Σ_pairs (n_a + n_b) (verify-path choice).
    // Both verify paths move `expectedRows` 8-byte hashes; what differs
    // is packaging (per-pair arrays vs per-element rows) and therefore
    // memory behavior under the executor pool.
    val candStats = cand.agg(count(lit(1)),
      sum((col("n_a") + col("n_b")).cast("long"))).head
    val bcastPairs = candStats.getLong(0) < BroadcastCandidateLimit
    def hintOf(p: DataFrame): DataFrame = if (bcastPairs) broadcast(p) else p
    val hint = hintOf(pairs)
    val expectedRows = if (candStats.isNullAt(1)) 0L else candStats.getLong(1)
    val defaultPar = shingles.sparkSession.sparkContext.defaultParallelism
    val inter =
      if (expectedRows <= ArrayVerifyMaxElements) {
        // ARRAY path: hash arrays ride the pair join once; partitions
        // sized so each task's sort holds ~64 MB of array payload.
        // Shingles arrive pre-hashed from docShingles — no per-verify
        // re-hash of the corpus.
        val joinParts = math.max(defaultPar,
          math.min(65536L, expectedRows * 8L / (64L * 1024 * 1024) + 1L).toInt)
        val hashedArr = shingles.select(col("id"), col("sh"))
        val aSide = hashedArr.select(col("id").as("id_a"), col("sh").as("sh_a"))
          .join(hint, "id_a").repartition(joinParts, col("id_a"), col("id_b"))
        val bSide = hashedArr.select(col("id").as("id_b"), col("sh").as("sh_b"))
          .join(hint, "id_b").repartition(joinParts, col("id_a"), col("id_b"))
        aSide.join(bSide, Seq("id_a", "id_b"))
          .select(col("id_a"), col("id_b"),
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"))
      } else {
        // EXPLODED path: scalar rows end-to-end, partitions sized to
        // ~3M elements per task — spills gracefully where the array
        // path's per-task footprint would exhaust the execution pool
        def explodedInter(pairHint: DataFrame, vol: Long): DataFrame = {
          val joinParts = math.max(defaultPar,
            math.min(65536L, vol / 3000000L + 1L).toInt)
          val joinKeys = Seq(col("id_a"), col("id_b"), col("h"))
          val hashed = shingles.select(col("id"), explode(col("sh")).as("h"))
          val aSide = hashed.select(col("id").as("id_a"), col("h"))
            .join(pairHint, "id_a")
            .repartition(joinParts, joinKeys: _*)
          val bSide = hashed.select(col("id").as("id_b"), col("h"))
            .join(pairHint, "id_b")
            .repartition(joinParts, joinKeys: _*)
          aSide.join(bSide, Seq("id_a", "id_b", "h"))
            .groupBy("id_a", "id_b")
            .agg(count(lit(1)).as("inter"))
        }
        // the cap is a runaway guard only — it must sit far above any
        // plausible volume, or per-chunk size silently exceeds the disk
        // bound the chunking exists to hold (64 chunks capped out at
        // 64 x ExplodedChunkElements; 4096 covers ~1e13 in-flight
        // elements before the bound degrades)
        val chunks = math.min(4096L,
          (expectedRows + ExplodedChunkElements - 1) / ExplodedChunkElements).toInt
        if (chunks <= 1) explodedInter(hint, expectedRows)
        else {
          // SEQUENTIAL pair-chunks: the exploded plan's shuffle is
          // Σ(n_a+n_b) rows on local disk; past the chunk bound that
          // exceeds a node's shuffle capacity, so the pair list splits
          // by hash and each chunk materializes (checkpoint truncates
          // lineage) before the next runs — the dropped shuffle
          // dependencies become reclaimable, bounding PEAK disk at one
          // chunk. Wall-clock is the same total work serialized; results
          // are identical because pair chunks are disjoint and the
          // per-pair intersection never crosses pairs.
          //
          // Lineage cut: when the session has a RELIABLE checkpoint dir
          // (sc.setCheckpointDir — shared storage on a real cluster) the
          // chunk checkpoints there, so an executor loss mid-run recovers
          // from the checkpointed blocks instead of failing a
          // 20-minute-class query outright. localCheckpoint (executor
          // blocks, no lineage — dies with an executor) is only the
          // single-node fallback, where "executor loss" means the whole
          // JVM is gone anyway.
          //
          // Checkpoint-file lifetime: what lands on checkpoint storage
          // is each chunk's AGGREGATED output — one (id_a,id_b,inter)
          // row per candidate pair, not the exploded element volume —
          // so a single query accumulates ~the candidate-pair list, and
          // Spark only deletes those files at application exit. The
          // files cannot be deleted here (the returned frame stays lazy
          // and may replay from them); long-lived sessions running many
          // verifies should set
          // spark.cleaner.referenceTracking.cleanCheckpoints=true, which
          // lets the ContextCleaner reclaim each chunk's files as soon
          // as its RDD is unreachable (the System.gc() below already
          // forces that discovery per chunk).
          val perChunk = expectedRows / chunks + 1
          val sc = shingles.sparkSession.sparkContext
          val reliable = sc.getCheckpointDir.isDefined
          (0 until chunks).map { c =>
            val slice = hintOf(pairs.filter(
              pmod(xxhash64(col("id_a"), col("id_b")), lit(chunks)) === lit(c)))
            val chunk = explodedInter(slice, perChunk)
            val r = if (reliable) {
              // persist first: an unpersisted reliable checkpoint runs
              // the whole lineage TWICE (once for the eager count, once
              // for ReliableCheckpointRDD's write pass) — the cache makes
              // the second pass a block read, then drops immediately
              val cached = chunk.persist(
                org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              val ck = cached.checkpoint(true)
              cached.unpersist(false)
              ck
            } else chunk.localCheckpoint(true)
            // hand the chunk's now-unreferenced shuffle deps to the
            // ContextCleaner before the next chunk fills the disk
            System.gc()
            r
          }.reduce(_ unionByName _)
        }
      }
    cand.join(inter, Seq("id_a", "id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash + LSH near-duplicate pairs, exact-verified.
    * Pipeline (the standard shingle->minhash->band->bucket-join shape):
    *  1. explode shingles once; one groupBy(id) computes all `numHashes`
    *     minhashes as plain `min(xxhash64(s, seed))` agg expressions —
    *     map-side combined, whole-stage codegen'd
    *  2. band keys hash `rows` consecutive signature slots; docs sharing
    *     a (band, key) bucket become candidate pairs
    *  3. candidates are verified by EXACT shingle Jaccard >= threshold
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * Recall is THRESHOLD-DEPENDENT: a pair at true Jaccard j escapes
    * candidate generation with p_miss = (1 - j^rows)^bands. With the
    * default 16 bands x 4 rows: p_miss(0.9) ≈ 4e-8, p_miss(0.83) ≈ 3e-5,
    * but p_miss(0.6) ≈ 0.11 — pairs NEAR a 0.6 operating threshold are
    * not near-certain catches. Size bands/rows for the threshold you gate
    * on (more bands of fewer rows = higher recall, more candidates to
    * verify). All hashes are seeded xxhash64, so a given corpus always
    * produces the same pairs — the oracle comparison is deterministic,
    * and the test fixtures' true pairs sit at j >= 0.83, where recall is
    * effectively certain.
    */
  def minhashNearDups(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleLen: Int = 5,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(bands >= 1 && numHashes >= bands && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands " +
        s"($bands): rows-per-band = numHashes/bands drives the LSH recall " +
        "curve — rows = 0 would hash EVERY document into one bucket per " +
        "band (all-pairs candidate explosion), and a remainder silently " +
        "discards signature slots the caller sized for")
    val rows = numHashes / bands
    // The shingle frame feeds the signature explode AND both sides of the
    // exact-Jaccard verify — three full consumptions of the most expensive
    // scalar pipeline in the engine (normText regexp + substring explode).
    // Persist it for the run; Spark's ContextCleaner reclaims the blocks
    // when the plan is garbage-collected, and MEMORY_AND_DISK keeps large
    // corpora spill-safe.
    val shingles = docShingles(df, textCol, idCol, shingleLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the cache EAGERLY before the plan fans out: the first
    // action otherwise launches the signature aggregate and both verify
    // size branches as CONCURRENT jobs, each of which recomputes the
    // still-unpopulated cached shingle pipeline (cache population does
    // not coordinate racing jobs) — measured 4x duplicate compute and a
    // 1.5x slower query at sf0.1; one tiny count() pays a single pass
    shingles.count()
    // one STRING hash per shingle (computed once inside docShingles),
    // then derive the `numHashes` family by re-hashing the resulting
    // 8-byte long per seed — the string bytes (the dominant per-row
    // cost, O(shingle length) each) are consumed once instead of
    // numHashes times; recall characteristics are unchanged (seeded
    // xxhash64 over a 64-bit input is still a uniform independent
    // family, and candidates are exact-verified anyway)
    val exploded = shingles.select(col("id"), explode(col("sh")).as("h"))
    val minAggs = (0 until numHashes).map(i =>
      min(xxhash64(col("h"), lit(i))).as(s"_h$i"))
    val sigs = exploded.groupBy("id")
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("id") +: (0 until bands).map { b =>
        val slots = (0 until rows).map(r => col(s"_h${b * rows + r}").cast("string"))
        xxhash64(concat_ws(",", slots: _*), lit(b)).as(s"_b$b")
      }: _*)
      .select(col("id"), posexplode(
        array((0 until bands).map(b => col(s"_b$b")): _*)).as(Seq("band", "bkey")))

    val a = sigs.select(col("band"), col("bkey"), col("id").as("id_a"))
    val b = sigs.select(col("band"), col("bkey"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    verifyJaccard(candidates, shingles, threshold)
  }

  /** Cross-engine 60-bit token hash: the first 15 hex chars of md5,
    * parsed base-16. md5 is identical in every engine (unlike xxhash64),
    * so SimHash signatures — and thus near-dup pairs — are reproducible
    * bit-for-bit by the DuckDB oracle.
    */
  def tokenHash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  private val SimhashBits = 60
  private val SimhashChunks = 4 // 4 x 15-bit chunks

  /** 60-bit SimHash of the token sequence: bit i is the sign of the sum
    * of (+1/-1) votes from each token's hash bit i. Computed relationally
    * (explode tokens once, 60 codegen'd sum aggregates), no HOFs.
    */
  def simhashSigs(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // normalize/tokenize AFTER spreadWork so the regexp+split pass runs
    // at cluster parallelism, not inside the source's few input splits
    val toks = spreadWork(df.select(col(idCol).as("id"), col(textCol).as("_raw")))
      .select(col("id"), split(normText(col("_raw")), " ").as("_tk"))
      .select(col("id"), explode(col("_tk")).as("t"))
      .withColumn("h", tokenHash60(col("t")))
    val voteAggs = (0 until SimhashBits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"_v$b"))
    val packed = (0 until SimhashBits)
      .map(b => when(col(s"_v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    toks.groupBy("id")
      .agg(voteAggs.head, voteAggs.tail: _*)
      .select(col("id"), packed.as("sig"))
  }

  /** SimHash near-dups: pairs whose signatures differ in <= maxBits bits.
    * Candidate buckets = 4 x 15-bit chunks — by pigeonhole any pair
    * within hamming distance 3 shares at least one chunk, so candidate
    * generation is COMPLETE (not probabilistic) while staying an
    * equi-join, never all-pairs.
    */
  def simhashNearDups(
      df: DataFrame, textCol: String, idCol: String, maxBits: Int = 3): DataFrame = {
    require(maxBits < SimhashChunks, s"chunk bucketing is complete only for maxBits < $SimhashChunks")
    val sigs = simhashSigs(df, textCol, idCol)
      .withColumn("chunk", explode(sequence(lit(0), lit(SimhashChunks - 1))))
      .withColumn("ckey",
        call_function("shiftright", col("sig"), lit(15) * col("chunk")).bitwiseAND(0x7FFFL))
    val a = sigs.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxBits)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard pairs via an inverted-index candidate join:
    * docs sharing at least one (non-ubiquitous) shingle are candidates,
    * then exact Jaccard filters to >= threshold.
    *
    * `maxShingleDf`: shingles appearing in more than this many documents
    * are excluded from CANDIDATE GENERATION (a df(s)^2 candidate blowup
    * on boilerplate shingles is the classic quadratic scale-killer; a
    * hot-shingle cutoff is standard practice). Verification still uses
    * the full shingle sets, so reported Jaccard values are exact; a pair
    * is only missed if ALL its shared shingles are hot — impossible in
    * practice for near-identical documents at meaningful thresholds.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleLen: Int = 5,
      threshold: Double = 0.8,
      maxShingleDf: Int = 100): DataFrame = {
    // persisted for the same 3× reuse as in minhashNearDups (inverted
    // index + both sides of the verify join); `s` here is the 64-bit
    // shingle hash (see docShingles) — the df cutoff and the index join
    // operate on hash identity, the same ~1e-19 collision caveat the
    // verify carries
    val shingles = docShingles(df, textCol, idCol, shingleLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager materialization before the fan-out — same rationale as in
    // minhashNearDups (racing consumers recompute an unpopulated cache)
    shingles.count()
    val exploded = shingles.select(col("id"), explode(col("sh")).as("s"))
    val rare = exploded.groupBy("s").agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxShingleDf)
      .select("s")
    val indexed = exploded.join(rare, "s")
    val a = indexed.select(col("s"), col("id").as("id_a"))
    val b = indexed.select(col("s"), col("id").as("id_b"))
    val candidates = a.join(b, "s")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    verifyJaccard(candidates, shingles, threshold)
  }

  /** Collapse near-duplicate PAIRS into duplicate CLUSTERS — the step a
    * dedup pipeline needs to keep exactly one document per group of
    * mutual near-dups (pairs alone over-delete: {a~b, b~c} must drop two
    * docs of {a,b,c}, not three). Connected components by iterative
    * min-label propagation (the classic Pregel/GraphX formulation, here
    * as plain relational ops): every node starts labeled with itself,
    * each round takes the min of its own and its neighbors' labels, and
    * labels decrease monotonically to the component minimum in
    * O(component diameter) rounds — tiny for near-dup clusters. Each
    * round is one equi-join plus a map-side-combinable min aggregation,
    * both keyed by node — no all-pairs work at any scale; lineage is cut
    * per round with localCheckpoint so plans stay flat. localCheckpoint
    * blocks die with their executor: on a cluster with churn (spot
    * nodes, dynamic allocation) pass `checkpointDir` to materialize each
    * round as parquet instead — the same executor-churn-safe cut the CDC
    * reader uses (GraftReadClient.changes reliableCheckpoint); the
    * caller owns cleanup of the directory after draining the result.
    *
    * Returns (idCol, componentCol) for every id that appears in `pairs`:
    * componentCol = the minimum id reachable through the pair graph.
    */
  def duplicateComponents(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      idCol: String = "doc_id",
      componentCol: String = "component_id",
      maxIterations: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    var round = 0
    def cut(df: DataFrame): DataFrame = checkpointDir match {
      case None => df.localCheckpoint()
      case Some(dir) =>
        round += 1
        val spark = df.sparkSession
        val path = s"$dir/dup_cc_round_$round"
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
    }
    val edges = pairs.select(col(idA).as("_src"), col(idB).as("_dst"))
      .unionByName(pairs.select(col(idB).as("_src"), col(idA).as("_dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = cut(edges.select(col("_src").as("_node")).distinct()
      .withColumn("_label", col("_node")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      iter += 1
      val nbrMin = edges
        .join(labels.select(col("_node").as("_dst"), col("_label").as("_nl")), "_dst")
        .groupBy(col("_src").as("_node"))
        .agg(min(col("_nl")).as("_nbr"))
      val next = cut(labels
        .join(nbrMin, Seq("_node"), "left")
        .select(col("_node"), least(col("_label"), col("_nbr")).as("_label")))
      converged = next
        .join(labels.select(col("_node"), col("_label").as("_old")), "_node")
        .filter(col("_label") =!= col("_old"))
        .isEmpty
      labels = next
    }
    edges.unpersist()
    // an unconverged exit would silently report ONE true cluster as
    // several components — downstream keep-one-per-component dedup then
    // leaves real duplicates in the corpus with no signal
    require(converged,
      s"duplicate-component propagation did not converge within " +
        s"$maxIterations iterations (a component's diameter exceeds the " +
        "bound) — raise maxIterations")
    labels.select(col("_node").as(idCol), col("_label").as(componentCol))
  }

  /** Benchmark decontamination: corpus documents sharing at least
    * `minShared` DISTINCT word n-grams with an evaluation-set document —
    * the overlap check a training pipeline runs before a corpus may ship.
    * Returns (doc_id, bench_id, shared), one row per contaminated pair.
    *
    * Scale shape: the benchmark side is tiny by construction (eval sets
    * are thousands of documents, the corpus billions), so its distinct
    * n-gram set is broadcast — the corpus side joins in place and never
    * shuffles document contents; the per-pair overlap count then
    * partial-aggregates map-side. Total cost at 100 TB is one corpus
    * scan. Distinct-ing shingles per document up front makes `shared`
    * a set-overlap count, invariant to within-document repetition.
    * The broadcast size scales with the benchmark's TOKEN count, not its
    * document count, so it is guarded: the gram set is counted first
    * (benchmark side only — negligible next to the corpus scan) and a
    * set past `broadcastGramLimit` falls back to a shuffle join instead
    * of failing on Spark's broadcast limit.
    */
  def contaminationPairs(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      minShared: Int = 3,
      broadcastGramLimit: Long = 10L * 1000 * 1000): DataFrame = {
    def grams(d: DataFrame, out: String) = d.select(
      col(idCol).as(out),
      explode(array_distinct(wordNgrams(col(textCol), n))).as("_s"))
    val bGrams = grams(benchmark, "bench_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bench =
      if (bGrams.count() <= broadcastGramLimit) broadcast(bGrams) else bGrams
    grams(corpus, "doc_id")
      .join(bench, "_s")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
