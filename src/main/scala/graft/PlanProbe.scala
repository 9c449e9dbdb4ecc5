package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan-evidence probe for the round-17 optimization record
  * (`plans/r17/`): several operators end in an eager
  * `localCheckpoint()`, so `graft.Explain` on the registered query
  * shows only a truncated `Scan ExistingRDD` — this main explains the
  * SAME frame construction minus the checkpoint, for both the
  * pre-r17 shape (labeled `*_band_union`, a faithful reconstruction
  * of the replaced operator body) and the current shape (`*_exploded`
  * / `*_mask`, the exact construction the operator now runs). Usage:
  * `runMain graft.PlanProbe <case> [sfDir]`.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir)
    def sig = Dedup.minhashSignatures(docs, "doc_id", "text")
    val bands2 = Dedup.MinhashA.indices.grouped(2).toSeq

    def minhashBandUnion: DataFrame = {
      // pre-r17 minhashCandidatesWith body (per-band joins, unioned)
      val perBand = bands2.map { cols =>
        val key = struct(cols.map(i => col(s"m${i + 1}")): _*)
        val a = sig.select(col("doc_id").as("da"), key.as("k"))
        val b = sig.select(col("doc_id").as("db"), key.as("k"))
        a.join(b, Seq("k")).filter(col("da") < col("db")).select("da", "db")
      }
      perBand.reduce(_ unionAll _).distinct()
    }
    def minhashExploded: DataFrame = {
      // current minhashCandidatesWith body minus the checkpoint
      def exploded(as: String) = sig.select(col("doc_id").as(as),
        posexplode(array(bands2.map(cols =>
          struct(cols.zipWithIndex.map { case (i, j) =>
            col(s"m${i + 1}").as(s"r$j") }: _*)): _*)).as(Seq("band", "k")))
      exploded("da").join(exploded("db"), Seq("band", "k"))
        .filter(col("da") < col("db"))
        .select("da", "db").distinct()
    }
    def curveMask: DataFrame = {
      // current d_minhash_curve engine: position-level join → mask
      def ex(as: String) = sig.select(col("doc_id").as(as),
        posexplode(array(Dedup.MinhashA.indices.map(i =>
          col(s"m${i + 1}")): _*)).as(Seq("pos", "mv")))
      ex("da").join(ex("db"), Seq("pos", "mv"))
        .filter(col("da") < col("db"))
        .groupBy("da", "db")
        .agg(sum(expr("shiftleft(cast(1 as bigint), pos)")).as("mask"))
    }
    def trep(fingerprint: Boolean): DataFrame = {
      // t_rep_ngrams occurrence → count → duplicate-occurrence join,
      // with the pre-r17 string key or the r17 md5+length key
      val words = docs.select(col("doc_id"),
        graft.functions.text.tokens(col("text")).as("ws"))
      val occG = words
        .select(col("doc_id"), col("ws"),
          explode(typedLit(Seq(5, 6, 7, 8, 9, 10))).as("n"))
        .filter(size(col("ws")) >= col("n"))
        .select(col("doc_id"), col("ws"), col("n"),
          explode(sequence(lit(0), size(col("ws")) - col("n"))).as("i"))
        .select(col("doc_id"), col("n"), col("i"),
          concat_ws(" ", slice(col("ws"), col("i") + 1, col("n"))).as("g"))
      val occ = if (!fingerprint) occG
        else occG.select(col("doc_id"), col("n"), col("i"),
          unhex(md5(col("g").cast("binary"))).as("gh"),
          length(col("g")).cast("long").as("glen"))
      val key = if (fingerprint) "gh" else "g"
      val cnt = occ.groupBy("doc_id", "n", key)
        .agg(count(lit(1)).as("c"))
      occ.join(cnt.filter(col("c") >= 2).select("doc_id", "n", key),
          Seq("doc_id", "n", key))
        .select(col("doc_id"), col("n"), col("i"))
    }
    def trepSliceHash: DataFrame = {
      // the r18 occurrence shape: xxhash64 of the token SLICE — no
      // concat_ws gram string, no md5; length from the word-length
      // array, only where used (n ≤ 4)
      val words = docs
        .select(col("doc_id"), graft.functions.text.tokens(col("text")).as("ws"))
        .withColumn("wlen", transform(col("ws"), w => length(w).cast("long")))
      def arrSum(a: org.apache.spark.sql.Column) =
        aggregate(a, lit(0L), (acc, x) => acc + x)
      val occ = words
        .select(col("doc_id"), col("ws"), col("wlen"),
          explode(typedLit(Seq(3, 4, 5, 6, 7, 8, 9, 10))).as("n"))
        .filter(size(col("ws")) >= col("n"))
        .select(col("doc_id"), col("ws"), col("wlen"), col("n"),
          explode(sequence(lit(0), size(col("ws")) - col("n"))).as("i"))
        .select(col("doc_id"), col("n"), col("i"),
          xxhash64(slice(col("ws"), col("i") + 1, col("n"))).as("gh"),
          when(col("n") <= 4,
            arrSum(slice(col("wlen"), col("i") + 1, col("n"))) +
              col("n") - 1).as("glen"))
      occ.groupBy("doc_id", "n", "gh")
        .agg(count(lit(1)).as("c"), max(col("glen")).as("len"))
    }

    // r18: the streaming-dedup per-batch VERIFY stage, text-scan form
    // (pre-r18: jaccardOfPairs re-reads the corpus text and
    // re-tokenizes every candidate's stored doc per batch) vs the
    // tokens-sidecar form (jaccardOfPairsStore: the store side scans
    // the pre-tokenized sidecar — no regexp tokenize on the store
    // side of the plan). Pairs/fresh sets are tiny local stand-ins:
    // the store-side subtree is the evidence.
    def sdedupVerify(sidecar: Boolean): DataFrame = {
      import spark.implicits._
      val pairs = Seq((1L, 2L)).toDF("da", "db").localCheckpoint()
      val freshSets = Seq((2L, "a b c")).toDF("doc_id", "s")
        .localCheckpoint()
      // the operators' own bodies minus their trailing checkpoint
      // (and minus the persist, which does not change the plan)
      val storeSh =
        if (!sidecar) {
          // pre-r18 jaccardOfPairs store side: corpus TEXT scan +
          // re-tokenize of the candidates' stored docs, every batch
          val ids = pairs.select(col("da").as("doc_id"))
            .unionAll(pairs.select(col("db").as("doc_id"))).distinct()
          Dedup.shingleSets(docs.join(ids, Seq("doc_id"), "left_semi"),
            "doc_id", "text")
        } else {
          val tokPath = java.nio.file.Files
            .createTempDirectory("graft_probe_toks").toString + "/tokens"
          docs.select(col("doc_id"),
              graft.functions.text.tokens(col("text")).as("tk"))
            .write.mode("overwrite").parquet(tokPath)
          Dedup.shingleSetsOfTokens(
            spark.read.parquet(tokPath)
              .join(pairs.select(col("da").as("doc_id")).distinct(),
                Seq("doc_id"), "left_semi"),
            "doc_id", "tk")
        }
      val freshSh =
        if (!sidecar) storeSh
        else freshSets.join(pairs.select(col("db").as("doc_id")).distinct(),
          Seq("doc_id"), "left_semi")
      val sa = storeSh.groupBy("doc_id").agg(count(lit(1)).as("na"))
      val sb = freshSh.groupBy("doc_id").agg(count(lit(1)).as("nb"))
      val common = pairs
        .join(storeSh.select(col("doc_id").as("da"), col("s")), "da")
        .join(freshSh.select(col("doc_id").as("db"), col("s")),
          Seq("db", "s"))
        .groupBy("da", "db").agg(count(lit(1)).as("c"))
      pairs.join(common, Seq("da", "db"), "left")
        .join(sa.select(col("doc_id").as("da"), col("na")), "da")
        .join(sb.select(col("doc_id").as("db"), col("nb")), "db")
        .select(col("da"), col("db"),
          coalesce(col("c").cast("double") /
            (col("na") + col("nb") - col("c")), lit(0.0)).as("jaccard"))
    }

    val df = name match {
      case "minhash_band_union" => minhashBandUnion
      case "minhash_exploded"   => minhashExploded
      case "curve_mask"         => curveMask
      case "trep_string_keys"   => trep(fingerprint = false)
      case "trep_fp_keys"       => trep(fingerprint = true)
      case "trep_slicehash"     => trepSliceHash
      case "sdedup_verify_text"    => sdedupVerify(sidecar = false)
      case "sdedup_verify_sidecar" => sdedupVerify(sidecar = true)
      case other => sys.error(s"unknown PlanProbe case: $other")
    }
    df.explain("formatted")
    spark.stop()
  }
}
