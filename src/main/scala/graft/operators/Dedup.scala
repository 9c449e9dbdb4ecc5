package graft.operators

import graft.functions.text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (fingerprint groupBy), exact n-gram Jaccard via inverted-index
  * join, MinHash+LSH banding, SimHash, and embedding-cosine pairs.
  *
  * Scale shapes:
  *  - exact: one hash shuffle on the fingerprint — the cheapest op.
  *  - Jaccard: explode→distinct→self-equi-join on shingle. The join
  *    key is the shingle, so co-occurrence is computed without a
  *    cross product; skew on ultra-common shingles is the known
  *    hazard (cap or salt them at 100 TB).
  *  - MinHash LSH: signatures are one groupBy; candidates come from
  *    per-band equi-joins (bucket join), NOT an OR-join (which would
  *    be a nested loop). Bands union + distinct.
  *  - SimHash / cosine: pairwise forms here are the correctness
  *    baseline; banding / IVF prune them at scale.
  */
object Dedup {

  val P = 1000000007L
  val MinhashA = Seq(131L, 137L, 139L, 149L, 151L, 157L, 163L, 167L)
  val MinhashB = Seq(17L, 29L, 41L, 53L, 67L, 79L, 97L, 113L)
  val SimhashBits = 32

  /** Keep the first row (by `order`) of every `key` group. */
  def exactFirst(df: DataFrame, key: Column, order: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Distinct (id, shingle) pairs. Tokens are materialized into a
    * column first so the shingle lambda reads a bound array instead of
    * re-splitting the text per element.
    */
  def shingleSets(docs: DataFrame, id: String, textCol: String): DataFrame =
    docs.select(col(id), text.tokens(col(textCol)).as("__tk"))
      .select(col(id), explode(text.shinglesOfTokens(col("__tk"))).as("s"))
      .distinct()

  /** Exact pairwise n-gram Jaccard ≥ threshold via inverted index. */
  def jaccardPairs(docs: DataFrame, id: String, textCol: String,
      threshold: Double): DataFrame = {
    val ds = shingleSets(docs, id, textCol).cache()
    val sizes = ds.groupBy(id).agg(count(lit(1)).as("n"))
    val a = ds.select(col(id).as("da"), col("s"))
    val b = ds.select(col(id).as("db"), col("s"))
    val common = a.join(b, Seq("s")).filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col(id).as("da"), col("n").as("na")), "da")
      .join(sizes.select(col(id).as("db"), col("n").as("nb")), "db")
      .withColumn("jaccard",
        col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select("da", "db", "jaccard")
  }

  /** MinHash signatures: min over shingle hashes of (aᵢ·h+bᵢ) mod P. */
  def minhashSignatures(docs: DataFrame, id: String,
      textCol: String): DataFrame = {
    val sh = shingleSets(docs, id, textCol)
      .select(col(id), text.polyHash(col("s")).as("h"))
    val aggs = MinhashA.zip(MinhashB).zipWithIndex.map {
      case ((a, b), i) =>
        min((col("h") * a + b) % P).as(s"m${i + 1}")
    }
    sh.groupBy(id).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidates: equi-join per band of 2 rows, union, distinct.
    * The signature set is persisted first — its lineage (shingle +
    * hash pipeline) would otherwise be recomputed once per band side.
    */
  def minhashCandidates(sig: DataFrame, id: String): DataFrame = {
    val s = sig.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = MinhashA.indices.grouped(2).toSeq
    val perBand = bands.map { cols =>
      val key = struct(cols.map(i => col(s"m${i + 1}")): _*)
      val a = s.select(col(id).as("da"), key.as("k"))
      val b = s.select(col(id).as("db"), key.as("k"))
      a.join(b, Seq("k")).filter(col("da") < col("db")).select("da", "db")
    }
    perBand.reduce(_ unionAll _).distinct()
  }

  /** 32-bit SimHash over the token-hash multiset. */
  def simhash(docs: DataFrame, id: String, textCol: String): DataFrame = {
    val th = docs
      .select(col(id), explode(text.tokens(col(textCol))).as("t"))
      .select(col(id), text.polyHash(col("t")).as("h"))
    val bitAggs = (0 until SimhashBits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$j")
    }
    val bits = th.groupBy(id).agg(bitAggs.head, bitAggs.tail: _*)
    val sim = (0 until SimhashBits).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
    bits.select(col(id), sim.as("simhash"))
  }

  /** Connected components over a near-dup pair set: iterative min-
    * label propagation until fixpoint. Turns pairwise matches into
    * duplicate CLUSTERS (the actual dedup unit — keep one doc per
    * component, not per pair). Each iteration is one join + one
    * groupBy; localCheckpoint truncates the growing lineage. Converges
    * in ≤ graph-diameter iterations.
    */
  def connectedComponents(pairs: DataFrame, a: String = "da",
      b: String = "db", maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .unionAll(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val prop = edges.join(labels, col("dst") === col("node"))
        .select(col("src").as("node"), col("label"))
      val next = labels.unionAll(prop)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("label", "old"), "node")
        .filter(col("label") =!= col("old")).count()
      labels = next
      i += 1
    }
    edges.unpersist()
    // silent partial propagation would mis-split components — fail
    // loudly instead (min-label needs ≤ graph-diameter iterations;
    // a hit here means a pathological chain, raise maxIter)
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations " +
          s"($changed labels still changing)")
    labels.withColumnRenamed("node", a).withColumnRenamed("label", "cluster_id")
  }

  /** All pairs within `maxHamming` of each other's SimHash. */
  def simhashPairs(sim: DataFrame, id: String, maxHamming: Int): DataFrame = {
    val a = sim.select(col(id).as("da"), col("simhash").as("sa"))
    val b = sim.select(col(id).as("db"), col("simhash").as("sb"))
    a.crossJoin(b).filter(col("da") < col("db"))
      .withColumn("hd", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("bigint"))
      .filter(col("hd") <= maxHamming)
      .select("da", "db", "hd")
  }
}
