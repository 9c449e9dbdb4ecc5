package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.{text, vectors}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dedup operator coverage on `documents` / `embeddings`. Every query
  * has a full DuckDB oracle — including MinHash and SimHash, whose
  * hash pipelines are replicated in SQL via list_reduce.
  */
object DedupQueries {

  import text.sql

  private def minExprs: String =
    Dedup.MinhashA.zip(Dedup.MinhashB).zipWithIndex.map {
      case ((a, b), i) => s"min((h * $a + $b) % ${Dedup.P}) AS m${i + 1}"
    }.mkString(", ")
  private val SigCte =
    s"WITH sh AS (SELECT DISTINCT doc_id, s FROM (${sql.shingleRows("doc_id")})), " +
      s"hs AS (SELECT doc_id, ${sql.polyHash("s")} AS h FROM sh), " +
      s"sig AS (SELECT doc_id, $minExprs FROM hs GROUP BY doc_id)"
  /** Shared 4×2 band-match predicate (Scala twin: minhashCandidates). */
  private val BandPredicate =
    "((a.m1 = b.m1 AND a.m2 = b.m2) OR (a.m3 = b.m3 AND a.m4 = b.m4) OR " +
      "(a.m5 = b.m5 AND a.m6 = b.m6) OR (a.m7 = b.m7 AND a.m8 = b.m8))"

  /** 60-bit shingle simhash CTE — replicates Dedup.simhash: two mixed
    * 30-bit halves (shingle hash, its square mod p) per shingle row.
    */
  private val SimhashCte = {
    val half = Dedup.SimhashBits / 2
    val bitsum = (0 until half).map(j =>
      s"sum(2*((g>>$j)&1)-1) AS b$j").mkString(", ")
    val packexpr = (0 until half).map(j =>
      s"(CASE WHEN b$j>0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"WITH ${graft.pipeline.SparseEmbed.sql.shingleHashCtes("doc_id")}, " +
      "g AS (SELECT doc_id, half, CASE WHEN half = 0 THEN sh " +
      s"ELSE (sh*sh) % ${Dedup.P} END AS g " +
      "FROM __sh CROSS JOIN (SELECT unnest(range(0, 2)) AS half)), " +
      s"bits AS (SELECT doc_id, half, $bitsum FROM g GROUP BY doc_id, half), " +
      s"halves AS (SELECT doc_id, half, cast($packexpr as bigint) AS ph FROM bits), " +
      "sim AS (SELECT doc_id, cast(sum(CASE WHEN half = 0 THEN ph " +
      s"ELSE ph * ${1L << half} END) as bigint) AS simhash FROM halves " +
      "GROUP BY doc_id)"
  }

  /** Exact dedup: first doc per md5 fingerprint. */
  private val dExact = QueryDef.sqlChecked("d_dedup_exact")(
    "SELECT doc_id FROM (SELECT doc_id, row_number() OVER " +
      "(PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM documents) " +
      "WHERE rn = 1 ORDER BY doc_id"
  ) { (s, d) =>
    Dedup.exactFirst(Tables.documents(s, d), md5(col("text")), col("doc_id"))
      .select("doc_id").orderBy("doc_id")
  }

  /** Exact 3-gram Jaccard near-dup pairs via inverted-index join,
    * over the df-capped shingle space (Dedup.DefaultMaxShingleDf,
    * applied identically on both sides — on the test corpora the cap
    * drops nothing, it bounds stop-shingle skew at scale).
    */
  private val dJaccard = QueryDef.sqlChecked("d_dedup_jaccard")(
    s"WITH ds0 AS (SELECT DISTINCT doc_id, s FROM (${sql.shingleRows("doc_id")})), " +
      "ds AS (SELECT doc_id, s FROM (SELECT doc_id, s, " +
      "count(*) OVER (PARTITION BY s) AS df FROM ds0) " +
      s"WHERE df <= ${Dedup.DefaultMaxShingleDf}), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id), " +
      "pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c " +
      "FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
      "SELECT da, db, cast(c as double) / (x.n + y.n - c) AS jaccard " +
      "FROM pairs JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id " +
      "WHERE cast(c as double) / (x.n + y.n - c) >= 0.2 ORDER BY da, db"
  ) { (s, d) =>
    Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text", 0.2)
      .orderBy("da", "db")
  }

  /** MinHash signatures (8 permutations over shingle poly-hashes). */
  private val dMinhashSig = QueryDef.sqlChecked("d_minhash_signatures")(
    s"$SigCte SELECT * FROM sig ORDER BY doc_id"
  ) { (s, d) =>
    Dedup.minhashSignatures(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** LSH candidate pairs: 4 bands × 2 rows, bucket equi-joins. */
  private val dMinhashPairs = QueryDef.sqlChecked("d_minhash_pairs")(
    s"$SigCte SELECT a.doc_id AS da, b.doc_id AS db FROM sig a " +
      s"JOIN sig b ON a.doc_id < b.doc_id AND $BandPredicate " +
      "ORDER BY da, db"
  ) { (s, d) =>
    val sig = Dedup.minhashSignatures(Tables.documents(s, d), "doc_id", "text")
    Dedup.minhashCandidates(sig, "doc_id").orderBy("da", "db")
  }

  /** MinHash banding TUNING TABLE — the (b, r) S-curve
    * P(candidate | s) = 1 − (1 − s^r)^b made driver-visible (the
    * `v_ann_recall_curve` / `v_bq_recall_curve` discipline for the
    * dedup family): one row per band width r ∈ {1, 2, 4, 8} over the
    * same 8-value signatures, with exact candidate volume, exact
    * true-candidate count (candidates at Jaccard ≥ 0.2), the exact
    * corpus-wide true-pair total, and precision/recall as one IEEE
    * division each. The table shows both failure modes at once:
    * r=1 saturates (82 672 candidates at sf0.1 — precision noise),
    * r=8 collapses recall to near-exact-dups; the production r=2
    * default sits on the knee. Engine cost note: the engine computes
    * the whole curve from ONE position-level equi-join (the r=1
    * leg's volume — its widest point) folded to per-pair match
    * bitmasks, then evaluates every width as a mask predicate in a
    * single aggregate (never the OR-join the compact oracle uses —
    * an OR of band equalities cannot hash-join).
    */
  private val dMinhashCurve = QueryDef.sqlChecked("d_minhash_curve")({
    def bandPred(r: Int): String =
      Dedup.MinhashA.indices.grouped(r).map(g =>
        g.map(i => s"a.m${i + 1} = b.m${i + 1}")
          .mkString("(", " AND ", ")")).mkString(" OR ")
    def candCte(r: Int): String =
      s"cand$r AS (SELECT a.doc_id AS da, b.doc_id AS db FROM sig a " +
        s"JOIN sig b ON a.doc_id < b.doc_id AND (${bandPred(r)}))"
    def row(r: Int): String =
      s"SELECT $r AS r, ${8 / r} AS n_bands, " +
        s"(SELECT count(*) FROM cand$r) AS n_candidates, " +
        s"(SELECT count(*) FROM cand$r JOIN tp USING (da, db)) AS n_true_cands"
    s"$SigCte, " +
      s"ds0 AS (SELECT DISTINCT doc_id, s FROM (${sql.shingleRows("doc_id")})), " +
      "ds AS (SELECT doc_id, s FROM (SELECT doc_id, s, " +
      "count(*) OVER (PARTITION BY s) AS df FROM ds0) " +
      s"WHERE df <= ${Dedup.DefaultMaxShingleDf}), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id), " +
      "jp AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c " +
      "FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "tp AS (SELECT da, db FROM jp JOIN sizes x ON da = x.doc_id " +
      "JOIN sizes y ON db = y.doc_id " +
      "WHERE cast(c as double) / (x.n + y.n - c) >= 0.2), " +
      Seq(1, 2, 4, 8).map(candCte).mkString(", ") + ", " +
      "rows AS (" + Seq(1, 2, 4, 8).map(row).mkString(" UNION ALL ") + ") " +
      "SELECT r, n_bands, n_candidates, n_true_cands, " +
      "(SELECT count(*) FROM tp) AS n_true, " +
      "CASE WHEN n_candidates = 0 THEN 0.0 ELSE " +
      "cast(n_true_cands as double) / n_candidates END AS prec, " +
      "CASE WHEN (SELECT count(*) FROM tp) = 0 THEN 0.0 ELSE " +
      "cast(n_true_cands as double) / (SELECT count(*) FROM tp) END AS recall " +
      "FROM rows ORDER BY r"
  }) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
      .localCheckpoint()
    val tp = Dedup.jaccardPairs(docs, "doc_id", "text", 0.2)
      .select(col("da"), col("db"), lit(1L).as("t"))
    val nTrue = tp.count()
    // ALL FOUR curve points from ONE join: a pair is a width-r
    // candidate iff some aligned r-block of signature positions
    // matches in full, so the per-pair MATCH-POSITION BITMASK (one
    // self-join at width-1 granularity — exactly the r=1 leg's join
    // volume, which the curve pays anyway as its widest point —
    // folded to a mask via sum(1<<pos) over the distinct matched
    // positions) decides candidacy at EVERY width as a mask
    // predicate. Replaces four banding passes (per-width join +
    // materialization + count join each) with one join + one
    // 8-counter aggregate: the curve costs its widest leg, not the
    // sum of its legs.
    def ex(as: String) = sig.select(col("doc_id").as(as),
      posexplode(array(Dedup.MinhashA.indices.map(i =>
        col(s"m${i + 1}")): _*)).as(Seq("pos", "mv")))
    val masks = ex("da").join(ex("db"), Seq("pos", "mv"))
      .filter(col("da") < col("db"))
      .groupBy("da", "db")
      .agg(sum(expr("shiftleft(cast(1 as bigint), pos)")).as("mask"))
    def candAt(r: Int) = Dedup.MinhashA.indices.grouped(r).toSeq.map { g =>
      val bm = g.map(1L << _).sum
      col("mask").bitwiseAND(lit(bm)) === lit(bm)
    }.reduce(_ || _)
    val aggCols = Seq(1, 2, 4, 8).flatMap { r => Seq(
      coalesce(sum(when(candAt(r), 1L)), lit(0L)).as(s"nc$r"),
      coalesce(sum(when(candAt(r) && col("t").isNotNull, 1L)), lit(0L))
        .as(s"ntc$r")) }
    val a = masks.join(broadcast(tp), Seq("da", "db"), "left")
      .agg(aggCols.head, aggCols.tail: _*).head()
    val rows = Seq(1, 2, 4, 8).zipWithIndex.map { case (r, i) =>
      val (nc, ntc) = (a.getLong(2 * i), a.getLong(2 * i + 1))
      (r.toLong, (8 / r).toLong, nc, ntc, nTrue,
        if (nc == 0) 0.0 else ntc.toDouble / nc,
        if (nTrue == 0) 0.0 else ntc.toDouble / nTrue)
    }
    rows.toDF("r", "n_bands", "n_candidates", "n_true_cands", "n_true",
      "prec", "recall").orderBy("r")
  }

  /** CROSS-SOURCE overlap matrix — the corpus-overlap audit run
    * before committing to a dedup strategy (which snapshots/dumps
    * duplicate each other, e.g. successive CommonCrawl crawls): per
    * source pair, the count of distinct 8-token windows present in
    * BOTH, with per-source distinct totals and the window-level
    * Jaccard. Shape: one DISTINCT (source, fp) projection (windows
    * ∝ tokens, the span-family explode), then a fingerprint-keyed
    * self-join whose per-key fan-out is bounded by |sources|² —
    * NEVER row-pairs (a window shared by all S sources contributes
    * C(S,2) rows, independent of how many documents carry it). At
    * 100 TB with tens of sources the join output is ≤ C(S,2) rows
    * per distinct window and the result is |S|² rows total.
    */
  private val dSourceOverlap = QueryDef.sqlChecked("d_source_overlap")({
    val w = 8
    val concat8 = (0 until w).map(j => s"tk[i+$j]").mkString(" || ' ' || ")
    "WITH toks AS (SELECT source, list_filter(string_split_regex(text, " +
      "'\\s+'), t -> t <> '') AS tk FROM documents), " +
      s"wins AS (SELECT source, $concat8 AS win FROM " +
      "(SELECT source, tk, unnest(range(1, len(tk) - " +
      s"${w - 2})) AS i FROM toks)), " +
      "sfp AS (SELECT DISTINCT source, md5(win) AS fp FROM wins), " +
      "tot AS (SELECT source, count(*) AS n FROM sfp GROUP BY source), " +
      "pr AS (SELECT a.source AS source_a, b.source AS source_b, " +
      "count(*) AS shared_windows FROM sfp a JOIN sfp b " +
      "ON a.fp = b.fp AND a.source < b.source GROUP BY 1, 2) " +
      "SELECT source_a, source_b, shared_windows, " +
      "ta.n AS n_a, tb.n AS n_b, " +
      "cast(shared_windows as double) / (ta.n + tb.n - shared_windows) " +
      "AS jaccard FROM pr " +
      "JOIN tot ta ON pr.source_a = ta.source " +
      "JOIN tot tb ON pr.source_b = tb.source " +
      "ORDER BY source_a, source_b"
  }) { (s, d) =>
    val sfp = Tables.documents(s, d)
      .select(col("source"), text.tokens(col("text")).as("tk"))
      .select(col("source"),
        explode(text.shinglesOfTokens(col("tk"), 8)).as("win"))
      .select(col("source"), text.md5Binary(col("win")).as("fp"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tot = sfp.groupBy("source").agg(count(lit(1)).as("n"))
      val pr = sfp.select(col("source").as("source_a"), col("fp"))
        .join(sfp.select(col("source").as("source_b"), col("fp")), "fp")
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("shared_windows"))
      pr
        .join(tot.select(col("source").as("source_a"), col("n").as("n_a")),
          "source_a")
        .join(tot.select(col("source").as("source_b"), col("n").as("n_b")),
          "source_b")
        .select(col("source_a"), col("source_b"), col("shared_windows"),
          col("n_a"), col("n_b"),
          (col("shared_windows").cast("double") /
            (col("n_a") + col("n_b") - col("shared_windows")))
            .as("jaccard"))
        .orderBy("source_a", "source_b")
        .localCheckpoint()
    } finally { sfp.unpersist(); () }
  }

  /** SimHash fingerprints (60-bit, shingle-hash multiset). */
  private val dSimhash = QueryDef.sqlChecked("d_simhash")(
    s"$SimhashCte SELECT doc_id, simhash FROM sim ORDER BY doc_id"
  ) { (s, d) =>
    Dedup.simhash(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs at hamming ≤ 3 (brute-force baseline —
    * the banded query below is the production path).
    */
  private val dSimhashPairs = QueryDef.sqlChecked("d_simhash_pairs")(
    s"$SimhashCte SELECT a.doc_id AS da, b.doc_id AS db, " +
      "cast(bit_count(xor(a.simhash, b.simhash)) as bigint) AS hd " +
      "FROM sim a JOIN sim b ON a.doc_id < b.doc_id " +
      "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3 ORDER BY da, db"
  ) { (s, d) =>
    val sim = Dedup.simhash(Tables.documents(s, d), "doc_id", "text")
    Dedup.simhashPairs(sim, "doc_id", 3).orderBy("da", "db")
  }

  /** Banded SimHash pairs at hamming ≤ 3 — the sub-quadratic candidate
    * path (4 15-bit-band equi-joins + exact verify), proven equal to
    * the brute-force pair set: the oracle computes all-pairs
    * hamming ≤ 3 and both sides aggregate to per-doc (count, Σdb,
    * Σhd) checksums, keeping the compare exact-per-doc without
    * dumping the raw pair set.
    */
  private val dSimhashBanded = QueryDef.sqlChecked("d_simhash_banded")(
    s"$SimhashCte SELECT da, count(*) AS n_pairs, " +
      "cast(sum(db) as bigint) AS sum_db, cast(sum(hd) as bigint) AS sum_hd " +
      "FROM (SELECT a.doc_id AS da, b.doc_id AS db, " +
      "cast(bit_count(xor(a.simhash, b.simhash)) as bigint) AS hd " +
      "FROM sim a JOIN sim b ON a.doc_id < b.doc_id " +
      "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3) " +
      "GROUP BY da ORDER BY da"
  ) { (s, d) =>
    val sim = Dedup.simhash(Tables.documents(s, d), "doc_id", "text")
    Dedup.simhashBandedPairs(sim, "doc_id", 3)
      .groupBy("da").agg(count(lit(1)).as("n_pairs"),
        sum("db").as("sum_db"), sum("hd").as("sum_hd"))
      .orderBy("da")
  }

  /** Embedding-cosine near-dup via SRP-LSH (Charikar sign-random-
    * projection) over hashed word-3-gram sparse INTEGER embeddings:
    * 96-bit sign signatures (squared-LCG mixer — see SrpLsh scaladoc
    * for why linear mixing correlates band bits), 8×12-bit band keys
    * joined in ONE stacked self-equi-join for candidates, and an
    * integer-exact cosine ≥ 0.9 verify (dot>0 ∧ 100·dot² ≥ 81·na·nb,
    * widened to decimal(38,0)/HUGEINT so large docs can't wrap 2⁶³)
    * — no floating point anywhere, so the oracle (which replicates
    * embedding, signatures, banding, and verify in bigint SQL)
    * hash-matches exactly. Shingle space (not unigram) because the
    * corpus shares most vocabulary: unigram background cosine ≈ 0.65
    * makes every threshold non-separable; word order separates it
    * (see SparseEmbed.embedShingles). The brute-force d_cosine_pairs
    * remains the recall baseline; this is the shape that runs at
    * 100 TB.
    */
  private val dSrpLsh = {
    val stride = graft.operators.SrpLsh.Stride
    QueryDef.sqlChecked("d_srp_lsh")(
      s"WITH ${graft.pipeline.SparseEmbed.sql.shingleEmbedCte("docvec", "doc_id")}, " +
        "mix AS (SELECT doc_id, w, m, " +
        s"(((cast(1103515245 as bigint)*(m*$stride+idx)+12345) % 2147483647) * " +
        s"((cast(1103515245 as bigint)*(m*$stride+idx)+12345) % 2147483647)) % 2147483647 AS h " +
        "FROM docvec CROSS JOIN (SELECT unnest(range(0, 4)) AS m)), " +
        "sums AS (SELECT doc_id, m, r, sum(w * (1 - 2*((h >> (7+r)) & 1))) AS s " +
        "FROM mix CROSS JOIN (SELECT unnest(range(0, 24)) AS r) GROUP BY doc_id, m, r), " +
        "bandkeys AS (SELECT doc_id, m*2 + r//12 AS band, " +
        "cast(sum(CASE WHEN s >= 0 THEN (cast(1 as bigint) << (r % 12)) ELSE 0 END) as bigint) AS k " +
        "FROM sums GROUP BY doc_id, m*2 + r//12), " +
        "cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db FROM bandkeys a " +
        "JOIN bandkeys b ON a.band = b.band AND a.k = b.k AND a.doc_id < b.doc_id), " +
        "norms AS (SELECT doc_id, cast(sum(w*w) as bigint) AS n2 FROM docvec GROUP BY doc_id), " +
        "dots AS (SELECT c.da, c.db, cast(sum(a.w*b.w) as bigint) AS dot " +
        "FROM cand c JOIN docvec a ON a.doc_id = c.da " +
        "JOIN docvec b ON b.doc_id = c.db AND b.idx = a.idx GROUP BY 1, 2) " +
        "SELECT d.da, d.db, d.dot, x.n2 AS na, y.n2 AS nb " +
        "FROM dots d JOIN norms x ON d.da = x.doc_id JOIN norms y ON d.db = y.doc_id " +
        "WHERE d.dot > 0 AND 100*cast(d.dot as hugeint)*d.dot >= " +
        "81*cast(x.n2 as hugeint)*y.n2 ORDER BY da, db"
    ) { (s, d) =>
      val dv = graft.pipeline.SparseEmbed.embedShingles(
        Tables.documents(s, d), "doc_id", "text")
      graft.operators.SrpLsh.nearDupPairs(dv, "doc_id").orderBy("da", "db")
    }
  }

  /** Embedding-cosine near-dup pairs (brute-force baseline). */
  private val dCosinePairs = QueryDef.sqlChecked("d_cosine_pairs")(
    "SELECT a.vec_id AS ida, b.vec_id AS idb, " +
      "list_cosine_similarity(cast(a.embedding as double[]), cast(b.embedding as double[])) AS score " +
      "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id AND " +
      "list_cosine_similarity(cast(a.embedding as double[]), cast(b.embedding as double[])) >= 0.4 " +
      "ORDER BY ida, idb"
  ) { (s, d) =>
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    a.crossJoin(b).filter(col("ida") < col("idb"))
      .withColumn("score", vectors.cosineSimilarity(col("ea"), col("eb")))
      .filter(col("score") >= 0.4)
      .select("ida", "idb", "score")
      .orderBy("ida", "idb")
  }

  /** Duplicate clusters: connected components over the LSH candidate
    * pairs (iterative label propagation in Spark; transitive-closure
    * recursive CTE as the oracle).
    */
  private val dClusters = QueryDef.sqlChecked("d_dedup_clusters")(
    "WITH RECURSIVE " + SigCte.stripPrefix("WITH ") + ", " +
      "pairs AS (SELECT a.doc_id AS da, b.doc_id AS db FROM sig a " +
      s"JOIN sig b ON a.doc_id < b.doc_id AND $BandPredicate), " +
      "nodes AS (SELECT da AS n FROM pairs UNION SELECT db FROM pairs), " +
      "edges AS (SELECT da AS a, db AS b FROM pairs UNION SELECT db, da FROM pairs), " +
      "reach(a, b) AS (SELECT n, n FROM nodes UNION " +
      "SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a) " +
      "SELECT a AS da, min(b) AS cluster_id FROM reach GROUP BY a ORDER BY da"
  ) { (s, d) =>
    val sig = Dedup.minhashSignatures(Tables.documents(s, d), "doc_id", "text")
    val cand = Dedup.minhashCandidates(sig, "doc_id")
    Dedup.connectedComponents(cand).orderBy("da")
  }

  /** CANONICAL SELECTION — the decision step that turns duplicate
    * clusters into an actual training corpus: per cluster keep ONE
    * representative (most content wins — max n_chars, ties to the
    * lowest doc_id, the deterministic rule a reproducible pipeline
    * needs) and mark every other member dropped. Output is the
    * keep/drop audit over cluster members (docs outside any cluster
    * are trivially kept and never enter the plan). At scale this adds
    * ONE window over the cluster assignment — partitioned by
    * cluster_id, so the shuffle is ∝ cluster members, not corpus.
    */
  private val dDedupKeep = QueryDef.sqlChecked("d_dedup_keep")(
    "WITH RECURSIVE " + SigCte.stripPrefix("WITH ") + ", " +
      "pairs AS (SELECT a.doc_id AS da, b.doc_id AS db FROM sig a " +
      s"JOIN sig b ON a.doc_id < b.doc_id AND $BandPredicate), " +
      "nodes AS (SELECT da AS n FROM pairs UNION SELECT db FROM pairs), " +
      "edges AS (SELECT da AS a, db AS b FROM pairs UNION SELECT db, da FROM pairs), " +
      "reach(a, b) AS (SELECT n, n FROM nodes UNION " +
      "SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a), " +
      "cc AS (SELECT a AS da, min(b) AS cluster_id FROM reach GROUP BY a) " +
      "SELECT cc.da AS doc_id, cc.cluster_id, d.n_chars, " +
      "row_number() OVER (PARTITION BY cc.cluster_id " +
      "ORDER BY d.n_chars DESC, cc.da) = 1 AS keep " +
      "FROM cc JOIN documents d ON d.doc_id = cc.da ORDER BY doc_id"
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    val cand = Dedup.minhashCandidates(sig, "doc_id")
    val cc = Dedup.connectedComponents(cand)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(desc("n_chars"), asc("doc_id"))
    cc.join(docs.select("doc_id", "n_chars"), cc("da") === docs("doc_id"))
      .select(col("doc_id"), col("cluster_id"), col("n_chars"))
      .withColumn("keep", row_number().over(w) === 1)
      .orderBy("doc_id")
  }

  /** INCREMENTAL near-dup — the per-batch shape of a streaming corpus:
    * the 90% "already ingested" split's MinHash signatures are written
    * to a parquet SIGNATURE STORE; the 10% "arriving" split computes
    * signatures for ITSELF ONLY, banded-joins them against the store
    * read back from disk (store×delta, never store×store again), and
    * exact-verifies just the candidate pairs. Per delta doc: how many
    * store candidates banded in, the first store doc it verifies
    * against at Jaccard ≥ 0.2, and the keep/drop decision. Cost per
    * batch ∝ batch size + candidates — corpus size only enters
    * through the (one broadcast-joined) store scan. The oracle
    * replicates signatures, banding, and the full-set Jaccard verify
    * in SQL over the same hash split.
    */
  private val dDedupIncremental = QueryDef.sqlChecked("d_dedup_incremental")(
    s"$SigCte, " +
      s"base AS (SELECT * FROM sig WHERE ${PipelineQueries.sqlBucket1000("doc_id")} < 900), " +
      s"fresh AS (SELECT * FROM sig WHERE ${PipelineQueries.sqlBucket1000("doc_id")} >= 900), " +
      "cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db " +
      s"FROM base a JOIN fresh b ON $BandPredicate), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
      "common AS (SELECT c.da, c.db, count(*) AS cc FROM cand c " +
      "JOIN sh x ON x.doc_id = c.da JOIN sh y ON y.doc_id = c.db AND y.s = x.s " +
      "GROUP BY 1, 2), " +
      "ver AS (SELECT c.da, c.db, " +
      "coalesce(cast(cm.cc as double) / (sx.n + sy.n - cm.cc), 0.0) AS j " +
      "FROM cand c LEFT JOIN common cm ON cm.da = c.da AND cm.db = c.db " +
      "JOIN sizes sx ON sx.doc_id = c.da JOIN sizes sy ON sy.doc_id = c.db), " +
      "agg AS (SELECT db, count(*) AS n_cand, " +
      "min(CASE WHEN j >= 0.2 THEN da END) AS match_id FROM ver GROUP BY db) " +
      "SELECT d.doc_id, cast(coalesce(agg.n_cand, 0) as bigint) AS n_cand, " +
      "agg.match_id, agg.match_id IS NOT NULL AS is_dup " +
      "FROM documents d LEFT JOIN agg ON agg.db = d.doc_id " +
      s"WHERE ${PipelineQueries.sqlBucket1000("d.doc_id")} >= 900 ORDER BY d.doc_id"
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val isBase = PipelineQueries.bucket1000(col("doc_id")) < 900
    val storePath = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_sigstore_" + java.lang.Integer.toHexString(d.hashCode)).toString
    Dedup.minhashSignatures(docs.filter(isBase), "doc_id", "text")
      .write.mode("overwrite").parquet(storePath)
    val store = s.read.parquet(storePath)
    val fresh =
      Dedup.minhashSignatures(docs.filter(!isBase), "doc_id", "text")
    val cand = Dedup.minhashCandidatesAgainst(store, fresh, "doc_id")
    val ver = Dedup.jaccardOfPairs(docs, "doc_id", "text", cand)
    val agg = ver.groupBy(col("db")).agg(
      count(lit(1)).as("n_cand"),
      min(when(col("jaccard") >= 0.2, col("da"))).as("match_id"))
    docs.filter(!isBase).select(col("doc_id"))
      .join(agg, col("doc_id") === col("db"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        col("match_id"),
        col("match_id").isNotNull.as("is_dup"))
      .orderBy("doc_id")
  }

  /** One verify-round of the streaming oracle: banded candidates of
    * `batchCte` against `storeCte`, exact-Jaccard verified at ≥ 0.2
    * over the full shingle sets, first (min) store match per batch
    * doc. Mirrors [[Dedup.minhashCandidatesAgainst]] +
    * [[Dedup.jaccardOfPairs]] + the per-batch decision.
    */
  private def incRound(idx: Int, storeCte: String, batchCte: String): String =
    s"cand$idx AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db " +
      s"FROM $storeCte a JOIN $batchCte b ON $BandPredicate), " +
      s"com$idx AS (SELECT c.da, c.db, count(*) AS cc FROM cand$idx c " +
      "JOIN sh x ON x.doc_id = c.da JOIN sh y ON y.doc_id = c.db AND y.s = x.s " +
      "GROUP BY 1, 2), " +
      s"dup$idx AS (SELECT c.db, min(c.da) AS match_id FROM cand$idx c " +
      s"JOIN com$idx cm ON cm.da = c.da AND cm.db = c.db " +
      "JOIN sizes sx ON sx.doc_id = c.da JOIN sizes sy ON sy.doc_id = c.db " +
      "WHERE cast(cm.cc as double) / (sx.n + sy.n - cm.cc) >= 0.2 " +
      "GROUP BY c.db)"

  /** CONTINUOUS ingest dedup — [[dDedupIncremental]] run as a real
    * Structured Stream with a SELF-GROWING store: two ordered
    * micro-batches flow through one foreachBatch that signs the
    * batch, bands it against the persisted signature store, verifies
    * candidates exactly, writes the keep/drop decision, and appends
    * the SURVIVORS' signatures back to the store — so batch 2 is
    * deduped against base ∪ batch-1-survivors, the sequential
    * semantics a streaming corpus needs (a dup of a doc that arrived
    * five minutes ago is caught, a dup of a DROPPED dup is not
    * double-counted). The oracle replays the two rounds sequentially
    * in SQL (store₂ = base ∪ survivors₁). Everything per batch is
    * ∝ batch + candidates; the store only ever appends.
    */
  private val dStreamDedupInc = QueryDef.sqlChecked("d_stream_dedup_inc")(
    s"$SigCte, " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
      s"base AS (SELECT * FROM sig WHERE ${PipelineQueries.sqlBucket1000("doc_id")} < 700), " +
      s"b1 AS (SELECT * FROM sig WHERE ${PipelineQueries.sqlBucket1000("doc_id")} >= 700 " +
      s"AND ${PipelineQueries.sqlBucket1000("doc_id")} < 850), " +
      s"b2 AS (SELECT * FROM sig WHERE ${PipelineQueries.sqlBucket1000("doc_id")} >= 850), " +
      incRound(1, "base", "b1") + ", " +
      "surv1 AS (SELECT b1.* FROM b1 LEFT JOIN dup1 ON b1.doc_id = dup1.db " +
      "WHERE dup1.db IS NULL), " +
      "store2 AS (SELECT * FROM base UNION ALL SELECT * FROM surv1), " +
      incRound(2, "store2", "b2") + " " +
      "SELECT s.doc_id, dd.match_id, dd.match_id IS NOT NULL AS is_dup " +
      "FROM (SELECT doc_id FROM b1 UNION ALL SELECT doc_id FROM b2) s " +
      "LEFT JOIN (SELECT * FROM dup1 UNION ALL SELECT * FROM dup2) dd " +
      "ON dd.db = s.doc_id ORDER BY s.doc_id"
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val bkt = PipelineQueries.bucket1000(col("doc_id"))
    val base = docs.filter(bkt < 700)
    val feed = Seq(
      docs.filter(bkt >= 700 && bkt < 850).select("doc_id", "text"),
      docs.filter(bkt >= 850).select("doc_id", "text"))

    val work = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_sdedupinc_" + java.lang.Integer.toHexString(d.hashCode))
    if (java.nio.file.Files.exists(work)) {
      java.nio.file.Files.walk(work).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.delete(p); () })
    }
    val storePath = work.toString + "/sigs"
    val decPath = work.toString + "/decisions"
    Dedup.minhashSignatures(base, "doc_id", "text")
      .write.mode("overwrite").parquet(storePath)

    val streamDir = graft.streaming.FileStreamFixture.write("sdedupinc", d,
      "docs by bucket; b1 [700,850), b2 [850,1000) vs growing store", feed)
    graft.SessionConf.withStreamShuffle(s) {
      val q = s.readStream.schema(feed.head.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(streamDir)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", work.toString + "/ckpt")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
          val fresh = Dedup.minhashSignatures(batch.toDF(), "doc_id", "text")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val store = s.read.parquet(storePath)
            val cand = Dedup.minhashCandidatesAgainst(store, fresh, "doc_id")
            val dups = Dedup.jaccardOfPairs(docs, "doc_id", "text", cand)
              .filter(col("jaccard") >= 0.2)
              .groupBy(col("db")).agg(min(col("da")).as("match_id"))
            batch.select(col("doc_id"))
              .join(dups, col("doc_id") === col("db"), "left")
              .select(col("doc_id"), col("match_id"),
                col("match_id").isNotNull.as("is_dup"))
              .write.mode("append").parquet(decPath)
            // only survivors enter the store: a dup of a dropped dup
            // must match the KEPT original, not the dropped copy
            fresh.join(dups, fresh("doc_id") === dups("db"), "left_anti")
              .write.mode("append").parquet(storePath)
          } finally { fresh.unpersist(); () }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(decPath).orderBy("doc_id")
  }

  /** STREAMING semantic dedup — `d_semdedup_inc` proven END TO END
    * on a real Structured Stream, the embedding-level sibling of
    * `d_stream_dedup_inc`: two embedding micro-batches (bucket split
    * [700, 850) then [850, 1000)) drain through foreachBatch; each
    * batch assigns itself to the store's fixed centroids, is checked
    * against same-cluster STORE members only (≥ τ cosine drops,
    * match = the smallest matching store id), writes its keep/drop
    * decisions, and appends ONLY THE SURVIVORS back — so batch 2
    * dedupes against base ∪ batch-1 survivors, and a near-dup of a
    * dropped batch-1 vector must match the KEPT original, never the
    * dropped copy. The oracle replays both rounds sequentially in
    * SQL; FULL hash check of every decision.
    */
  private val dStreamSemDedup = QueryDef.sqlChecked("d_stream_semdedup")(
    "WITH base0 AS (SELECT vec_id, cast(embedding as double[]) AS v " +
      "FROM embeddings), " +
      "cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, " +
      "cast(embedding as double[]) AS cv FROM embeddings " +
      "WHERE vec_id IN (0,64,128,192,256,320,384,448)), " +
      "assign AS (SELECT vec_id, v, cid AS leaf_id FROM (" +
      "SELECT b.vec_id, b.v, c.cid, row_number() OVER (" +
      "PARTITION BY b.vec_id ORDER BY list_inner_product(c.cv, c.cv) - " +
      "2 * list_inner_product(b.v, c.cv), c.cid) AS rn " +
      "FROM base0 b, cent c) WHERE rn = 1), " +
      s"base AS (SELECT * FROM assign WHERE ${PipelineQueries.sqlBucket1000("vec_id")} < 700), " +
      s"b1 AS (SELECT * FROM assign WHERE ${PipelineQueries.sqlBucket1000("vec_id")} >= 700 " +
      s"AND ${PipelineQueries.sqlBucket1000("vec_id")} < 850), " +
      s"b2 AS (SELECT * FROM assign WHERE ${PipelineQueries.sqlBucket1000("vec_id")} >= 850), " +
      "dup1 AS (SELECT d.vec_id AS db, min(s.vec_id) AS match_id " +
      "FROM base s JOIN b1 d ON s.leaf_id = d.leaf_id " +
      "WHERE list_cosine_similarity(s.v, d.v) >= 0.4 GROUP BY d.vec_id), " +
      "surv1 AS (SELECT b1.* FROM b1 LEFT JOIN dup1 " +
      "ON b1.vec_id = dup1.db WHERE dup1.db IS NULL), " +
      "store2 AS (SELECT * FROM base UNION ALL SELECT * FROM surv1), " +
      "dup2 AS (SELECT d.vec_id AS db, min(s.vec_id) AS match_id " +
      "FROM store2 s JOIN b2 d ON s.leaf_id = d.leaf_id " +
      "WHERE list_cosine_similarity(s.v, d.v) >= 0.4 GROUP BY d.vec_id) " +
      "SELECT s.vec_id, dd.match_id, dd.match_id IS NOT NULL AS is_dup " +
      "FROM (SELECT vec_id FROM b1 UNION ALL SELECT vec_id FROM b2) s " +
      "LEFT JOIN (SELECT * FROM dup1 UNION ALL SELECT * FROM dup2) dd " +
      "ON dd.db = s.vec_id ORDER BY s.vec_id"
  ) { (s, d) =>
    import graft.operators.IvfIndex
    val emb = Tables.embeddings(s, d)
    val base0 = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val centIds = Seq(0L, 64L, 128L, 192L, 256L, 320L, 384L, 448L)
    val cents = base0.filter(col("vec_id").isin(centIds: _*))
      .select(col("vec_id"), col("v")).collect().sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    val model = IvfIndex.Model(cents)
    def assigned(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("leaf_id", IvfIndex.probeExpr(model, col("v"), 1)(0))
    val bkt = PipelineQueries.bucket1000(col("vec_id"))
    val feed = Seq(
      base0.filter(bkt >= 700 && bkt < 850),
      base0.filter(bkt >= 850))

    val work = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_ssemdedup_" + java.lang.Integer.toHexString(d.hashCode))
    if (java.nio.file.Files.exists(work)) {
      java.nio.file.Files.walk(work).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.delete(p); () })
    }
    val storePath = work.toString + "/vecs"
    val decPath = work.toString + "/decisions"
    assigned(base0.filter(bkt < 700))
      .write.mode("overwrite").parquet(storePath)

    val streamDir = graft.streaming.FileStreamFixture.write("ssemdedup", d,
      "embeddings by bucket; b1 [700,850), b2 [850,1000) vs growing store",
      feed)
    graft.SessionConf.withStreamShuffle(s) {
      val q = s.readStream.schema(feed.head.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(streamDir)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", work.toString + "/ckpt")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
          val fresh = assigned(batch.toDF())
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val store = s.read.parquet(storePath)
            // batch broadcasts onto the leaf-co-located store; match
            // is the smallest similar STORE id
            val dups = store
              .select(col("leaf_id"), col("vec_id").as("sid"),
                col("v").as("vs"))
              .join(broadcast(fresh.select(col("leaf_id"),
                col("vec_id").as("db"), col("v").as("vd"))),
                Seq("leaf_id"))
              .filter(graft.functions.vectors
                .cosineSimilarity(col("vs"), col("vd")) >= 0.4)
              .groupBy(col("db")).agg(min(col("sid")).as("match_id"))
            batch.select(col("vec_id"))
              .join(dups, col("vec_id") === col("db"), "left")
              .select(col("vec_id"), col("match_id"),
                col("match_id").isNotNull.as("is_dup"))
              .write.mode("append").parquet(decPath)
            // only survivors enter the store (SemDeDup keep rule
            // composed over a stream)
            fresh.join(dups, fresh("vec_id") === dups("db"), "left_anti")
              .write.mode("append").parquet(storePath)
          } finally { fresh.unpersist(); () }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(decPath).orderBy("vec_id")
  }

  /** SEMANTIC dedup, SemDeDup-style (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, then look for
    * near-duplicate pairs ONLY within a cluster — the cluster bound
    * turns the all-pairs quadratic into Σ leaf-size², the same
    * economics as the IVF kNN join (`v_knn_join`), which is what
    * makes embedding-level dedup runnable on a 100 TB corpus where
    * `d_cosine_pairs` (the brute-force recall baseline) cannot be.
    * Fixed centroids (the gate's usual 8 embedding rows) keep the
    * whole operator SQL-replicable; the keep rule is SemDeDup's:
    * within a cluster, a vector drops iff some SMALLER-id vector in
    * the same cluster is ≥ τ cosine-similar (deterministic, one
    * self-join — no iteration). Output: every vector with its
    * cluster and keep flag, FULL hash oracle (cosine parity with the
    * oracle's `list_cosine_similarity` is already pinned by
    * `d_cosine_pairs` at the same τ).
    */
  private val dSemDedup = QueryDef.sqlChecked("d_semdedup")(
    "WITH base AS (SELECT vec_id, cast(embedding as double[]) AS v " +
      "FROM embeddings), " +
      "cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, " +
      "cast(embedding as double[]) AS cv FROM embeddings " +
      "WHERE vec_id IN (0,64,128,192,256,320,384,448)), " +
      "assign AS (SELECT vec_id, v, cid AS leaf_id FROM (" +
      "SELECT b.vec_id, b.v, c.cid, row_number() OVER (" +
      "PARTITION BY b.vec_id ORDER BY list_inner_product(c.cv, c.cv) - " +
      "2 * list_inner_product(b.v, c.cv), c.cid) AS rn " +
      "FROM base b, cent c) WHERE rn = 1), " +
      "drops AS (SELECT DISTINCT b.vec_id FROM assign a " +
      "JOIN assign b ON a.leaf_id = b.leaf_id AND a.vec_id < b.vec_id " +
      "WHERE list_cosine_similarity(a.v, b.v) >= 0.4) " +
      "SELECT a.vec_id, a.leaf_id, d.vec_id IS NULL AS kept " +
      "FROM assign a LEFT JOIN drops d ON a.vec_id = d.vec_id " +
      "ORDER BY a.vec_id"
  ) { (s, d) =>
    import graft.operators.IvfIndex
    val emb = Tables.embeddings(s, d)
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val centIds = Seq(0L, 64L, 128L, 192L, 256L, 320L, 384L, 448L)
    val cents = base.filter(col("vec_id").isin(centIds: _*))
      .select(col("vec_id"), col("v")).collect().sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    val model = IvfIndex.Model(cents)
    val assign = base.withColumn("leaf_id",
      IvfIndex.probeExpr(model, col("v"), 1)(0))
    // within-cluster pairs only: the join key IS the cluster — the
    // shuffle co-locates each cluster, the quadratic is per-leaf
    val a = assign.select(col("leaf_id"), col("vec_id").as("ida"),
      col("v").as("va"))
    val b = assign.select(col("leaf_id"), col("vec_id").as("idb"),
      col("v").as("vb"))
    val drops = a.join(b, Seq("leaf_id"))
      .filter(col("ida") < col("idb"))
      .filter(vectors.cosineSimilarity(col("va"), col("vb")) >= 0.4)
      .select(col("idb").as("vec_id")).distinct()
    assign.join(drops.withColumn("__drop", lit(true)),
        Seq("vec_id"), "left")
      .select(col("vec_id"), col("leaf_id"),
        col("__drop").isNull.as("kept"))
      .orderBy("vec_id")
  }

  /** INCREMENTAL semantic dedup — the embedding-level sibling of
    * `d_dedup_incremental` (the continuous-ingest shape): an already-
    * ingested STORE (vec_id % 3 ≠ 0) holds cluster-assigned
    * embeddings; the arriving DELTA batch (vec_id % 3 = 0) assigns
    * itself to the SAME fixed centroids and is checked only against
    * same-cluster store members — a delta vector drops iff a store
    * member in its cluster is ≥ τ cosine-similar. Per-batch cost ∝
    * batch + same-cluster candidates (never store × store, never
    * all-pairs); the batch side BROADCASTS onto the leaf-co-located
    * store exactly like the MinHash incremental path. Batch-internal
    * near-dups are deliberately out of scope here (that is
    * `d_semdedup`'s intra-corpus rule); a production loop appends
    * the survivors to the store, which the streaming MinHash gate
    * (`d_stream_dedup_inc`) already proves end to end for the
    * signature store. FULL hash oracle: assignment, the store/delta
    * split, and every keep/drop decision replayed in SQL.
    */
  private val dSemDedupInc = QueryDef.sqlChecked("d_semdedup_inc")(
    "WITH base AS (SELECT vec_id, cast(embedding as double[]) AS v " +
      "FROM embeddings), " +
      "cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, " +
      "cast(embedding as double[]) AS cv FROM embeddings " +
      "WHERE vec_id IN (0,64,128,192,256,320,384,448)), " +
      "assign AS (SELECT vec_id, v, cid AS leaf_id FROM (" +
      "SELECT b.vec_id, b.v, c.cid, row_number() OVER (" +
      "PARTITION BY b.vec_id ORDER BY list_inner_product(c.cv, c.cv) - " +
      "2 * list_inner_product(b.v, c.cv), c.cid) AS rn " +
      "FROM base b, cent c) WHERE rn = 1), " +
      "store AS (SELECT * FROM assign WHERE vec_id % 3 <> 0), " +
      "delta AS (SELECT * FROM assign WHERE vec_id % 3 = 0), " +
      "drops AS (SELECT DISTINCT d.vec_id FROM store s " +
      "JOIN delta d ON s.leaf_id = d.leaf_id " +
      "WHERE list_cosine_similarity(s.v, d.v) >= 0.4) " +
      "SELECT d.vec_id, d.leaf_id, x.vec_id IS NULL AS kept " +
      "FROM delta d LEFT JOIN drops x ON d.vec_id = x.vec_id " +
      "ORDER BY d.vec_id"
  ) { (s, d) =>
    import graft.operators.IvfIndex
    val emb = Tables.embeddings(s, d)
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val centIds = Seq(0L, 64L, 128L, 192L, 256L, 320L, 384L, 448L)
    val cents = base.filter(col("vec_id").isin(centIds: _*))
      .select(col("vec_id"), col("v")).collect().sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    val model = IvfIndex.Model(cents)
    val assign = base.withColumn("leaf_id",
      IvfIndex.probeExpr(model, col("v"), 1)(0))
    val store = assign.filter(col("vec_id") % 3 =!= 0)
      .select(col("leaf_id"), col("v").as("vs"))
    val delta = assign.filter(col("vec_id") % 3 === 0)
    // the BATCH broadcasts onto the leaf-co-located store: per-batch
    // cost ∝ batch + same-cluster candidates, the store never shuffles
    val drops = store.join(broadcast(delta
        .select(col("leaf_id"), col("vec_id").as("idd"),
          col("v").as("vd"))), Seq("leaf_id"))
      .filter(vectors.cosineSimilarity(col("vs"), col("vd")) >= 0.4)
      .select(col("idd").as("vec_id")).distinct()
    delta.join(drops.withColumn("__drop", lit(true)),
        Seq("vec_id"), "left")
      .select(col("vec_id"), col("leaf_id"),
        col("__drop").isNull.as("kept"))
      .orderBy("vec_id")
  }

  /** Corpus-wide line dedup ([[Dedup.lineDedup]] — the C4 span-dedup
    * algebra at line granularity: each distinct non-empty line keeps
    * its first (doc_id, position) occurrence corpus-wide), folded to
    * per-document stats. The test corpus has no newlines, so the
    * gate DERIVES a line-structured corpus deterministically from
    * `documents` (the same plant-the-evidence pattern the serving
    * gates use): each doc's whitespace tokens chunk into 10-word
    * lines, and every doc_id % 7 == 3 additionally ships a PARTIAL
    * COPY (its first two lines + one unique tail line) under
    * doc_id + 10000 — so the dedup must drop exactly the copied
    * lines (the original owns the canonical occurrence) while the
    * small vocabulary also produces natural cross-doc repeats. Docs
    * with no non-empty line report (0, 0, 0.0). The oracle replays
    * the derivation and the first-occurrence rule with a window over
    * the line text (the Scala side groups on the line's md5 — same
    * partition, smaller shuffle key); counts are exact integers,
    * `dup_frac` one IEEE division, so the row hash-gates.
    */
  private val dLineDedup = QueryDef.sqlChecked("d_line_dedup")(
    "WITH ws AS (SELECT doc_id, list_filter(string_split_regex(text, " +
      "'\\s+'), x -> x <> '') AS w FROM documents), " +
      "ln AS (SELECT doc_id, list_transform(range(0, " +
      "cast(floor((len(w)+9)/10) as bigint)), i -> " +
      "array_to_string(w[i*10+1 : i*10+10], ' ')) AS lines FROM ws), " +
      "copies AS (SELECT doc_id + 10000 AS doc_id, lines[1:2] || " +
      "['copy ' || cast(doc_id + 10000 as varchar)] AS lines FROM ln " +
      "WHERE doc_id % 7 = 3), " +
      "corpus AS (SELECT * FROM ln UNION ALL SELECT * FROM copies), " +
      "occ AS (SELECT doc_id, i AS pos, lines[i] AS line FROM " +
      "(SELECT doc_id, lines, unnest(range(1, len(lines)+1)) AS i " +
      "FROM corpus) WHERE length(lines[i]) > 0), " +
      "marked AS (SELECT doc_id, row_number() OVER (" +
      "PARTITION BY line ORDER BY doc_id, pos) AS rn FROM occ), " +
      "agg AS (SELECT doc_id, count(*) AS n_lines, " +
      "sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS kept_lines " +
      "FROM marked GROUP BY doc_id) " +
      "SELECT c.doc_id, cast(coalesce(n_lines, 0) as bigint) AS n_lines, " +
      "cast(coalesce(kept_lines, 0) as bigint) AS kept_lines, " +
      "CASE WHEN coalesce(n_lines, 0) = 0 THEN 0.0 ELSE " +
      "cast(n_lines - kept_lines as double) / n_lines END AS dup_frac " +
      "FROM corpus c LEFT JOIN agg ON c.doc_id = agg.doc_id " +
      "ORDER BY c.doc_id"
  ) { (s, d) =>
    val ws = Tables.documents(s, d)
      .select(col("doc_id"), text.tokens(col("text")).as("w"))
    // 10-word chunk lines; the empty-token guard matters (the edge
    // corpus has empty docs, and sequence(0, -1) would descend)
    val ln = ws.select(col("doc_id"),
      when(size(col("w")) === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), floor((size(col("w")) + 9) / 10).cast("int") - 1),
          i => concat_ws(" ", slice(col("w"), i * 10 + 1, lit(10)))))
        .as("lines"))
    val copies = ln.filter(col("doc_id") % 7 === 3)
      .select((col("doc_id") + 10000L).as("doc_id"),
        concat(slice(col("lines"), 1, 2),
          array(concat(lit("copy "),
            (col("doc_id") + 10000L).cast("string")))).as("lines"))
    val corpus = ln.unionByName(copies)
      .select(col("doc_id"), concat_ws("\n", col("lines")).as("text"))
    val occ = Dedup.lineDedup(corpus, "doc_id", "text")
    val agg = occ.groupBy("doc_id").agg(
      count(lit(1)).as("n_lines"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("kept_lines"))
    corpus.select("doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("kept_lines"), lit(0L)).as("kept_lines"),
        when(coalesce(col("n_lines"), lit(0L)) === 0, 0.0)
          .otherwise((col("n_lines") - col("kept_lines")).cast("double") /
            col("n_lines")).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** EXACT-SUBSTRING (token-window) duplication profile — Lee et al.
    * 2022 ExactSubstr at window granularity (see
    * [[graft.operators.Dedup.spanProfile]]): stride-1 windows of 8
    * tokens, 128-bit md5 fingerprints (collision-free at any
    * practical corpus size — see the width note on
    * [[graft.operators.Dedup.spanProfile]]), a window duplicated
    * anywhere in the corpus (within-doc repeats count, as
    * ExactSubstr) marks its doc. Per doc: window count, duplicated-
    * window count, their ratio, and an exact-integer ≤20% keep rule
    * (`dup_windows·5 ≤ n_windows` — no double-vs-literal compare, no
    * string anywhere near the hash gate). Unlike `d_line_dedup`'s
    * synthesized copies, the raw corpus genuinely contains
    * duplicated 8-token runs (8.9% of windows at sf0.01), so the
    * gate profiles real data.
    */
  private val dSpanDedup = QueryDef.sqlChecked("d_span_dedup")({
    val w = 8
    val concat8 = (0 until w).map(j => s"tk[i+$j]").mkString(" || ' ' || ")
    "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, " +
      "'\\s+'), t -> t <> '') AS tk FROM documents), " +
      s"wins AS (SELECT doc_id, $concat8 AS win FROM " +
      "(SELECT doc_id, tk, unnest(range(1, len(tk) - " +
      s"${w - 2})) AS i FROM toks)), " +
      s"fp AS (SELECT doc_id, md5(win) AS fp FROM wins), " +
      "c AS (SELECT fp, count(*) AS c FROM fp GROUP BY fp), " +
      "pd AS (SELECT doc_id, count(*) AS n_windows, " +
      "cast(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) as bigint) " +
      "AS dup_windows FROM fp JOIN c USING (fp) GROUP BY doc_id) " +
      "SELECT d.doc_id, coalesce(n_windows, 0) AS n_windows, " +
      "coalesce(dup_windows, 0) AS dup_windows, " +
      "CASE WHEN coalesce(n_windows, 0) = 0 THEN 0.0 ELSE " +
      "cast(dup_windows as double) / n_windows END AS dup_frac, " +
      "coalesce(dup_windows, 0) * 5 <= coalesce(n_windows, 0) AS keep " +
      "FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id " +
      "ORDER BY d.doc_id"
  }) { (s, d) =>
    val docs = Tables.documents(s, d)
    val pd = graft.operators.Dedup.spanProfile(docs, "doc_id", "text", 8)
    docs.select("doc_id")
      .join(pd, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        when(coalesce(col("n_windows"), lit(0L)) === 0, 0.0)
          .otherwise(col("dup_windows").cast("double") / col("n_windows"))
          .as("dup_frac"),
        (coalesce(col("dup_windows"), lit(0L)) * 5 <=
          coalesce(col("n_windows"), lit(0L))).as("keep"))
      .orderBy("doc_id")
  }

  /** EXACT-SUBSTRING CUT accounting — the removal half of
    * `d_span_dedup` ([[graft.operators.Dedup.spanCut]]): duplicated
    * 8-token windows keep one corpus-wide canonical copy (smallest
    * (doc, pos) — a `min(struct)` reduce, never a window sort over
    * the duplicate group) and every other occurrence marks its token
    * positions; overlapping marks merge by distinct counting. Per
    * doc: token count, tokens cut, fraction kept. The oracle
    * replays the identical canonicalization ordering by integers
    * only (doc ids, positions; the md5 fingerprint is used for
    * equality/partitioning, never ordered — nothing near a string
    * comparison feeds an emitted value).
    */
  private val dSpanCut = QueryDef.sqlChecked("d_span_cut")({
    val w = 8
    val concat8 = (0 until w).map(j => s"tk[i+$j]").mkString(" || ' ' || ")
    "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, " +
      "'\\s+'), t -> t <> '') AS tk FROM documents), " +
      "tc AS (SELECT doc_id, cast(len(tk) as bigint) AS n_tokens FROM toks), " +
      s"wins AS (SELECT doc_id, i, $concat8 AS win FROM " +
      "(SELECT doc_id, tk, unnest(range(1, len(tk) - " +
      s"${w - 2})) AS i FROM toks)), " +
      s"fp AS (SELECT doc_id, i, md5(win) AS f FROM wins), " +
      "r AS (SELECT doc_id, i, count(*) OVER (PARTITION BY f) AS c, " +
      "row_number() OVER (PARTITION BY f ORDER BY doc_id, i) AS rn FROM fp), " +
      s"pos AS (SELECT doc_id, unnest(range(i, i + $w)) AS p FROM r " +
      "WHERE c > 1 AND rn > 1), " +
      "cut AS (SELECT doc_id, count(DISTINCT p) AS cut_tokens FROM pos " +
      "GROUP BY doc_id) " +
      "SELECT d.doc_id, coalesce(tc.n_tokens, 0) AS n_tokens, " +
      "coalesce(cut.cut_tokens, 0) AS cut_tokens, " +
      "CASE WHEN coalesce(tc.n_tokens, 0) = 0 THEN 1.0 ELSE " +
      "cast(tc.n_tokens - coalesce(cut.cut_tokens, 0) as double) / " +
      "tc.n_tokens END AS kept_frac " +
      "FROM documents d LEFT JOIN tc ON d.doc_id = tc.doc_id " +
      "LEFT JOIN cut ON d.doc_id = cut.doc_id ORDER BY d.doc_id"
  }) { (s, d) =>
    val docs = Tables.documents(s, d)
    val tc = docs.select(col("doc_id"),
      size(text.tokens(col("text"))).cast("bigint").as("n_tokens"))
    val cut = graft.operators.Dedup.spanCut(docs, "doc_id", "text", 8)
    docs.select("doc_id")
      .join(tc, Seq("doc_id"), "left")
      .join(cut, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("cut_tokens"), lit(0L)).as("cut_tokens"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, 1.0)
          .otherwise((col("n_tokens") - coalesce(col("cut_tokens"), lit(0L)))
            .cast("double") / col("n_tokens"))
          .as("kept_frac"))
      .orderBy("doc_id")
  }

  /** EXACT-SUBSTRING REWRITE — the Lee et al. 2022 output step
    * ([[graft.operators.Dedup.spanRewrite]]): the deduplicated
    * CORPUS itself, canonical span occurrences kept, every other
    * occurrence's tokens removed, overlapping cuts merged by
    * position. FULL hash oracle over the rewritten text of all 500
    * docs: the oracle replays fingerprinting, the (doc, pos)
    * canonical rule, the w-position cut union, and the
    * order-preserving token reassembly (`string_agg ... ORDER BY`
    * over an INTEGER position — no string collation feeds the
    * order). Completes the profile → cut-accounting → rewrite
    * pipeline as driver-gated operators.
    */
  private val dSpanRewrite = QueryDef.sqlChecked("d_span_rewrite")({
    val w = 8
    val concat8 = (0 until w).map(j => s"tk[i+$j]").mkString(" || ' ' || ")
    "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, " +
      "'\\s+'), t -> t <> '') AS tk FROM documents), " +
      s"wins AS (SELECT doc_id, i, $concat8 AS win FROM " +
      "(SELECT doc_id, tk, unnest(range(1, len(tk) - " +
      s"${w - 2})) AS i FROM toks)), " +
      "fp AS (SELECT doc_id, i, md5(win) AS f FROM wins), " +
      "r AS (SELECT doc_id, i, count(*) OVER (PARTITION BY f) AS c, " +
      "row_number() OVER (PARTITION BY f ORDER BY doc_id, i) AS rn FROM fp), " +
      s"pos AS (SELECT DISTINCT doc_id, unnest(range(i, i + $w)) AS p " +
      "FROM r WHERE c > 1 AND rn > 1), " +
      "tokrows AS (SELECT doc_id, tk[i] AS t, i FROM " +
      "(SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM toks)), " +
      "kept AS (SELECT tr.doc_id, string_agg(tr.t, ' ' ORDER BY tr.i) " +
      "AS text_dedup FROM tokrows tr LEFT JOIN pos " +
      "ON tr.doc_id = pos.doc_id AND tr.i = pos.p " +
      "WHERE pos.p IS NULL GROUP BY tr.doc_id) " +
      "SELECT d.doc_id, coalesce(kept.text_dedup, '') AS text_dedup " +
      "FROM documents d LEFT JOIN kept ON d.doc_id = kept.doc_id " +
      "ORDER BY d.doc_id"
  }) { (s, d) =>
    val docs = Tables.documents(s, d)
    val rw = graft.operators.Dedup.spanRewrite(docs, "doc_id", "text", 8)
    docs.select("doc_id")
      .join(rw, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
      .orderBy("doc_id")
  }

  /** INCREMENTAL exact-substring dedup — the continuous-ingest form
    * of `d_span_dedup`, completing the batch+incremental pattern the
    * other two dedup families carry (lexical MinHash:
    * `d_dedup_incremental`; semantic: `d_semdedup_inc`): the
    * already-ingested corpus persists as a distinct window-fingerprint
    * STORE, the arriving batch fingerprints ITSELF only, and a batch
    * window is duplicated iff it exists in the store or repeats
    * within the batch. The store enters through one fingerprint-keyed
    * join with the batch side broadcast — the store never shuffles.
    * Gate: store = docs with id % 3 ≠ 0, delta = the rest; oracle
    * replays store derivation, batch counts, and the union rule —
    * integers end to end.
    */
  private val dSpanInc = QueryDef.sqlChecked("d_span_inc")({
    val w = 8
    val concat8 = (0 until w).map(j => s"tk[i+$j]").mkString(" || ' ' || ")
    "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, " +
      "'\\s+'), t -> t <> '') AS tk FROM documents), " +
      s"wins AS (SELECT doc_id, $concat8 AS win FROM " +
      "(SELECT doc_id, tk, unnest(range(1, len(tk) - " +
      s"${w - 2})) AS i FROM toks)), " +
      s"fps AS (SELECT doc_id, md5(win) AS fp FROM wins), " +
      "store AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 3 <> 0), " +
      "bw AS (SELECT doc_id, fp FROM fps WHERE doc_id % 3 = 0), " +
      "bc AS (SELECT fp, count(*) AS cb FROM bw GROUP BY fp), " +
      "dup AS (SELECT bc.fp FROM bc LEFT JOIN store s ON bc.fp = s.fp " +
      "WHERE bc.cb > 1 OR s.fp IS NOT NULL), " +
      "pd AS (SELECT doc_id, count(*) AS n_windows, " +
      "cast(sum(CASE WHEN d.fp IS NOT NULL THEN 1 ELSE 0 END) as bigint) " +
      "AS dup_windows FROM bw LEFT JOIN dup d ON bw.fp = d.fp " +
      "GROUP BY doc_id) " +
      "SELECT b.doc_id, coalesce(pd.n_windows, 0) AS n_windows, " +
      "coalesce(pd.dup_windows, 0) AS dup_windows " +
      "FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) b " +
      "LEFT JOIN pd ON b.doc_id = pd.doc_id ORDER BY b.doc_id"
  }) { (s, d) =>
    val docs = Tables.documents(s, d)
    val store = graft.operators.Dedup.spanFingerprints(
      docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", 8)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val pd = graft.operators.Dedup.spanProfileAgainst(
      store, batch, "doc_id", "text", 8)
    batch.select("doc_id")
      .join(pd, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"))
      .orderBy("doc_id")
  }

  /** STREAMING exact-substring dedup — `d_span_inc` proven END TO
    * END on a real Structured Stream, completing the 3×3 dedup
    * matrix (lexical MinHash / semantic embedding / exact substring
    * × batch / incremental / streaming): two document micro-batches
    * (bucket split [700, 850) then [850, 1000)) drain through
    * foreachBatch; each batch profiles its windows against the
    * persisted fingerprint STORE (store hit OR within-batch repeat =
    * duplicated), writes per-doc decisions, and appends its own
    * distinct fingerprints back — so batch 2's windows also
    * duplicate against batch 1's content. The oracle replays both
    * rounds sequentially; emitted values are integers end to end
    * (md5 keys join, never order), FULL hash check.
    */
  private val dStreamSpan = QueryDef.sqlChecked("d_stream_span")({
    val w = 8
    val concat8 = (0 until w).map(j => s"tk[i+$j]").mkString(" || ' ' || ")
    def round(r: Int, store: String, bw: String): String =
      s"bc$r AS (SELECT fp, count(*) AS cb FROM $bw GROUP BY fp), " +
        s"dup$r AS (SELECT bc$r.fp FROM bc$r LEFT JOIN $store st " +
        s"ON bc$r.fp = st.fp WHERE bc$r.cb > 1 OR st.fp IS NOT NULL), " +
        s"pd$r AS (SELECT doc_id, count(*) AS n_windows, " +
        s"cast(sum(CASE WHEN d.fp IS NOT NULL THEN 1 ELSE 0 END) as bigint) " +
        s"AS dup_windows FROM $bw LEFT JOIN dup$r d ON $bw.fp = d.fp " +
        "GROUP BY doc_id)"
    val bkt = PipelineQueries.sqlBucket1000("doc_id")
    "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, " +
      "'\\s+'), t -> t <> '') AS tk FROM documents), " +
      s"wins AS (SELECT doc_id, $concat8 AS win FROM " +
      "(SELECT doc_id, tk, unnest(range(1, len(tk) - " +
      s"${w - 2})) AS i FROM toks)), " +
      s"fps AS (SELECT doc_id, md5(win) AS fp FROM wins), " +
      s"store0 AS (SELECT DISTINCT fp FROM fps WHERE $bkt < 700), " +
      s"b1 AS (SELECT doc_id, fp FROM fps WHERE $bkt >= 700 AND $bkt < 850), " +
      s"b2 AS (SELECT doc_id, fp FROM fps WHERE $bkt >= 850), " +
      round(1, "store0", "b1") + ", " +
      "store1 AS (SELECT fp FROM store0 UNION SELECT fp FROM b1), " +
      round(2, "store1", "b2") + " " +
      "SELECT s.doc_id, coalesce(pd.n_windows, 0) AS n_windows, " +
      "coalesce(pd.dup_windows, 0) AS dup_windows FROM " +
      s"(SELECT doc_id FROM documents WHERE $bkt >= 700) s " +
      "LEFT JOIN (SELECT * FROM pd1 UNION ALL SELECT * FROM pd2) pd " +
      "ON s.doc_id = pd.doc_id ORDER BY s.doc_id"
  }) { (s, d) =>
    val docs = Tables.documents(s, d)
    val bkt = PipelineQueries.bucket1000(col("doc_id"))
    val base = docs.filter(bkt < 700)
    val feed = Seq(
      docs.filter(bkt >= 700 && bkt < 850).select("doc_id", "text"),
      docs.filter(bkt >= 850).select("doc_id", "text"))
    val work = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_sspan_" + java.lang.Integer.toHexString(d.hashCode))
    if (java.nio.file.Files.exists(work)) {
      java.nio.file.Files.walk(work).sorted(
        java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.delete(p); () })
    }
    val storePath = work.toString + "/fps"
    val decPath = work.toString + "/decisions"
    graft.operators.Dedup.spanFingerprints(base, "doc_id", "text", 8)
      .write.mode("overwrite").parquet(storePath)
    val streamDir = graft.streaming.FileStreamFixture.write("sspan", d,
      "docs by bucket; b1 [700,850), b2 [850,1000) vs growing fp store",
      feed)
    graft.SessionConf.withStreamShuffle(s) {
      val q = s.readStream.schema(feed.head.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(streamDir)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", work.toString + "/ckpt")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
          val pd = graft.operators.Dedup.spanProfileAgainst(
            s.read.parquet(storePath), batch.toDF(), "doc_id", "text", 8)
          batch.select(col("doc_id"))
            .join(pd, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("n_windows"), lit(0L)).as("n_windows"),
              coalesce(col("dup_windows"), lit(0L)).as("dup_windows"))
            .write.mode("append").parquet(decPath)
          // every fingerprint becomes state (the content exists once
          // regardless of duplication) — batch 2 dedupes against
          // base ∪ batch 1
          graft.operators.Dedup.spanFingerprints(
            batch.toDF(), "doc_id", "text", 8)
            .write.mode("append").parquet(storePath)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(decPath).orderBy("doc_id")
  }

  /** Semantic-dedup τ tuning table — the knob measurement for
    * `d_semdedup`'s cosine threshold, same discipline as the MinHash
    * banding curve and the BQ m-sizing table: per vector, the MAX
    * same-cluster predecessor cosine (one cluster-bounded pair pass,
    * exact max — no accumulation), then dropped/kept counts for
    * τ ∈ {0.2 … 0.6} from that single frame. On the synthetic corpus
    * the table shows the operating range outright (τ=0.2 drops 411 of
    * 500, τ=0.5 drops none at sf0.001) — the evidence an operator
    * reads before picking τ, priced at ONE pair pass for the whole
    * sweep rather than one per candidate τ.
    */
  private val dSemDedupCurve = QueryDef.sqlChecked("d_semdedup_curve")(
    "WITH base AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings), " +
      "cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, " +
      "cast(embedding as double[]) AS cv FROM embeddings " +
      "WHERE vec_id IN (0,64,128,192,256,320,384,448)), " +
      "assign AS (SELECT vec_id, v, cid AS leaf_id FROM (" +
      "SELECT b.vec_id, b.v, c.cid, row_number() OVER (" +
      "PARTITION BY b.vec_id ORDER BY list_inner_product(c.cv, c.cv) - " +
      "2 * list_inner_product(b.v, c.cv), c.cid) AS rn " +
      "FROM base b, cent c) WHERE rn = 1), " +
      "ms AS (SELECT b.vec_id AS vec_id, max(list_cosine_similarity(a.v, b.v)) AS m " +
      "FROM assign a JOIN assign b ON a.leaf_id = b.leaf_id AND a.vec_id < b.vec_id " +
      "GROUP BY b.vec_id), " +
      "taus AS (SELECT unnest([20, 30, 40, 50, 60]) AS tau), " +
      "tot AS (SELECT count(*) AS n FROM base) " +
      "SELECT cast(tau as bigint) AS tau_centi, " +
      "count(ms.vec_id) FILTER (WHERE m >= tau / 100.0) AS n_dropped, " +
      "n - count(ms.vec_id) FILTER (WHERE m >= tau / 100.0) AS n_kept " +
      "FROM taus CROSS JOIN tot LEFT JOIN ms ON true " +
      "GROUP BY tau, n ORDER BY tau_centi"
  ) { (s, d) =>
    import s.implicits._
    import graft.operators.IvfIndex
    val base = Tables.embeddings(s, d).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val centIds = Seq(0L, 64L, 128L, 192L, 256L, 320L, 384L, 448L)
    val cents = base.filter(col("vec_id").isin(centIds: _*))
      .select(col("vec_id"), col("v")).collect().sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    val model = IvfIndex.Model(cents)
    val assign = base.withColumn("leaf_id",
      IvfIndex.probeExpr(model, col("v"), 1)(0))
    val a = assign.select(col("leaf_id"), col("vec_id").as("ida"),
      col("v").as("va"))
    val b = assign.select(col("leaf_id"), col("vec_id").as("idb"),
      col("v").as("vb"))
    val ms = a.join(b, Seq("leaf_id"))
      .filter(col("ida") < col("idb"))
      .groupBy(col("idb").as("vec_id"))
      .agg(max(vectors.cosineSimilarity(col("va"), col("vb"))).as("m"))
    val taus = Seq(20, 30, 40, 50, 60).toDF("tau")
    val tot = base.agg(count(lit(1)).as("n"))
    // left-join (not crossJoin) so the five tau rows survive an empty
    // ms — a degenerate corpus where every cluster is a singleton must
    // report n_dropped=0/n_kept=n, matching the oracle's LEFT JOIN ON
    // true, instead of emitting zero rows
    broadcast(taus).crossJoin(broadcast(tot))
      .join(ms, lit(true), "left")
      .groupBy(col("tau").cast("bigint").as("tau_centi"), col("n"))
      .agg(count(when(col("m") >= col("tau") / lit(100.0), 1)).as("n_dropped"))
      .select(col("tau_centi"), col("n_dropped"),
        (col("n") - col("n_dropped")).as("n_kept"))
      .orderBy("tau_centi")
  }

  val defs: Seq[QueryDef] = Seq(dExact, dJaccard, dMinhashSig, dMinhashPairs,
    dMinhashCurve, dSourceOverlap,
    dDedupIncremental, dStreamDedupInc, dSimhash, dSimhashPairs,
    dSimhashBanded, dSrpLsh, dCosinePairs, dClusters, dDedupKeep,
    dSemDedup, dSemDedupCurve, dSemDedupInc, dStreamSemDedup, dLineDedup,
    dSpanDedup, dSpanCut, dSpanRewrite, dSpanInc, dStreamSpan)
}
