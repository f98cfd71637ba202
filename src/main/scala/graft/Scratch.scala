package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only profiling entry (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def shinglesOf(): DataFrame = docs
      .select(col("doc_id").as("id"), normText(col("text")).as("_t"))
      .repartition(32)
      .select(col("id"), charShinglesPre(col("_t"), 5).as("sh"))
      .withColumn("n", size(col("sh")))

    def candidatesOf(shingles: DataFrame): DataFrame = {
      val exploded = shingles.select(col("id"), explode(col("sh")).as("s"))
      val numHashes = 64; val bands = 16; val rows = 4
      val minAggs = (0 until numHashes).map(i => min(xxhash64(col("s"), lit(i))).as(s"_h$i"))
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
      a.join(b, Seq("band", "bkey"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    }

    // variant A: current production shape, one action, shingles persisted
    time("A: current operator, one action") {
      val sh = shinglesOf().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = candidatesOf(sh)
      val sa = sh.select(col("id").as("id_a"), col("sh").as("sh_a"), col("n").as("n_a"))
      val sb = sh.select(col("id").as("id_b"), col("sh").as("sh_b"), col("n").as("n_b"))
      val v = cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
        .filter(col("jaccard") >= 0.6)
      println("A pairs=" + v.count())
      sh.unpersist()
    }

    // variant B: eager candidates + size-ratio prefilter + broadcast into
    // the shingle streams, pair-keyed final join
    time("B: eager cand + ratio prefilter + bcast streams") {
      val sh = shinglesOf().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand0 = candidatesOf(sh)
      val sizes = sh.select(col("id"), col("n"))
      val t = 0.6
      val cand = cand0
        .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
        .filter(least(col("n_a"), col("n_b")).cast("double") /
          greatest(col("n_a"), col("n_b")) >= t)
        .select("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nCand = time("  B cand count")(cand.count())
      println("B n_cand after ratio=" + nCand)
      val hint = if (nCand < 4000000L) broadcast(cand) else cand
      val aSide = sh.select(col("id").as("id_a"), col("sh").as("sh_a"), col("n").as("n_a"))
        .join(hint, "id_a")
      val bSide = sh.select(col("id").as("id_b"), col("sh").as("sh_b"), col("n").as("n_b"))
        .join(hint, "id_b")
      val v = aSide.join(bSide, Seq("id_a", "id_b"))
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
        .filter(col("jaccard") >= 0.6)
      println("B pairs=" + v.count())
      sh.unpersist(); cand.unpersist()
    }
    spark.stop()
  }
}
