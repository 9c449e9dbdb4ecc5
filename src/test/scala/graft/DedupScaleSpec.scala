package graft

import graft.operators.{Dedup, SrpLsh}
import graft.pipeline.{SparseEmbed, SyntheticCorpus}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sf1-scale smoke for the bucketed dedup family: on a 50 000-document
  * corpus (10× the largest driver testdata) the candidate mass of each
  * sub-quadratic path must stay proportional to TRUE pairs, not
  * corpus² — the selectivity claim PERF.md makes, validated at a real
  * size. Each path also has a recall floor against the planted pairs.
  */
class DedupScaleSpec extends SparkTestBase {

  private val N = 50000L
  private val LinearCap = 10 * N // "linear" ceiling; corpus²/2 = 1.25e9

  private lazy val corpus = {
    val c = SyntheticCorpus.docs(spark, N)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    c.count()
    c
  }

  /** Σ C(bucket, 2) over band-key buckets = exact number of candidate
    * pairs the band equi-join would generate.
    */
  private def bucketMass(keys: DataFrame, cols: Seq[String]): Long =
    keys.groupBy(cols.map(col): _*).count()
      .agg(sum(col("count") * (col("count") - 1))).head().getLong(0) / 2

  test("sf1 minhash: candidates linear in n, planted pairs found") {
    val sig = Dedup.minhashSignatures(corpus, "doc_id", "text")
    val cand = Dedup.minhashCandidates(sig, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nCand = cand.count()
      assert(nCand <= LinearCap,
        s"$nCand candidate pairs at n=$N — selectivity is degrading")
      val planted = cand.filter(col("da") % 100 === 0 &&
        col("db") === col("da") + 1).count()
      val expected = SyntheticCorpus.plantedPairs(N)
      assert(planted >= expected * 8 / 10,
        s"only $planted/$expected planted near-dup pairs in candidates")
    } finally { cand.unpersist(); () }
  }

  test("sf1 simhash: 15-bit band buckets stay sub-quadratic") {
    val sim = Dedup.simhash(corpus, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sim.count()
      val mass = (0 until 4).map { bi =>
        bucketMass(sim.select(shiftright(col("simhash"),
          bi * (Dedup.SimhashBits / 4))
          .bitwiseAND(lit((1L << (Dedup.SimhashBits / 4)) - 1L)).as("k")),
          Seq("k"))
      }.sum
      assert(mass <= LinearCap,
        s"simhash band-bucket mass $mass at n=$N — bands are saturating")
    } finally { sim.unpersist(); () }
  }

  test("sf1 SRP: widened 16-bit bands stay sub-quadratic") {
    // the 12-bit default saturates here by design (measured 2.75M
    // candidate mass = n²/1024 — the log n band-width growth rule in
    // SrpLsh's scaladoc); at this scale the knob is 16-bit bands
    val dv = SparseEmbed.embedShingles(corpus, "doc_id", "text")
    val keys = SrpLsh.bandKeys(dv, "doc_id",
      bits = 128, bandBits = 16, bitsPerHash = 16)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val mass = bucketMass(keys, Seq("band", "k"))
      assert(mass <= LinearCap,
        s"SRP band-bucket mass $mass at n=$N — bands are saturating")
      // the widened bands still catch the planted near-identical pairs
      val cand = keys.select(col("doc_id").as("da"), col("band"), col("k"))
        .join(keys.select(col("doc_id").as("db"), col("band"), col("k")),
          Seq("band", "k"))
        .filter(col("da") % 100 === 0 && col("db") === col("da") + 1)
        .select("da", "db").distinct().count()
      val expected = SyntheticCorpus.plantedPairs(N)
      assert(cand >= expected * 8 / 10,
        s"only $cand/$expected planted pairs collide in widened bands")
    } finally { keys.unpersist(); () }
  }

  test("sf1 line dedup: a boilerplate line repeated across every doc " +
      "(pathological skew) still resolves via partial-agg min — one " +
      "canonical survivor, no per-group materialization") {
    import spark.implicits._
    // 50k docs, EVERY one carrying the same cookie-banner line plus
    // one unique line — the skew shape that kills a window-over-line
    // plan (one partition gets all 50k copies of the hot key's rows;
    // the agg path ships one (fp, min-struct) pair per map task)
    val docs = spark.range(N).select(col("id").as("doc_id"),
      concat(lit("accept all cookies to continue\nunique line "),
        col("id").cast("string")).as("text"))
    val occ = Dedup.lineDedup(docs, "doc_id", "text")
    val banner = occ.filter(col("line") === "accept all cookies to continue")
    assert(banner.count() == N, "every doc contributes one banner copy")
    val kept = banner.filter(col("kept"))
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(0L),
      s"exactly doc 0's copy survives (first occurrence), got $kept")
    // unique lines all survive
    assert(occ.filter(col("kept")).count() == N + 1)
    // the canonical choice is a partial-aggregable min, not a window:
    // no Window operator anywhere in the plan
    val plan = occ.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"lineDedup must not window over the line key:\n$plan")
  }
}
