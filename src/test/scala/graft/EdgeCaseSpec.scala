package graft

import graft.functions.{quantize, text}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  test("frame sampling of an empty payload yields no frames") {
    val df = Multimodal.withPayload(
      Seq((1L, ""), (2L, "x" * 200)).toDF("doc_id", "text"), "text")
    val frames = Multimodal.sampleFrames(df, "doc_id", stride = 1)
    assert(frames.filter(col("doc_id") === 1).count() == 0)
    assert(frames.filter(col("doc_id") === 2).count() == 4) // ceil(200/64)
  }

  test("perceptualHash: a planted near-dup (one byte changed) lands " +
      "within Hamming 3 of its original, an unrelated payload does " +
      "not, and the banded join returns EXACTLY the brute-force set") {
    val base = ("The quick brown fox jumps over the lazy dog. " * 8)
    val nearDup = base.updated(17, 'X') // one byte: moves ONE grid cell
    val other = ("Completely different content with other bytes 12345 " * 7)
    val docs = Seq((1L, base), (2L, nearDup), (3L, other), (4L, ""),
      (5L, "tiny")).toDF("doc_id", "text")
    val ph = Multimodal.perceptualHash(
      Multimodal.withPayload(docs, "text"), "doc_id")
      .withColumnRenamed("id", "doc_id")
    val hashes = ph.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(2L)) <= 3,
      s"one changed byte must stay within hd 3: " +
        s"${java.lang.Long.bitCount(hashes(1L) ^ hashes(2L))}")
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(3L)) > 3,
      "unrelated payloads must not collide within hd 3")
    assert(hashes(4L) == 0L, "an empty payload hashes to 0")
    // banded == brute force, including empty/tiny payload rows
    val banded = Multimodal.phashBandedPairs(ph, "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val brute = (for {
      (a, ha) <- hashes.toSeq; (b, hb) <- hashes.toSeq if a < b
      hd = java.lang.Long.bitCount(ha ^ hb) if hd <= 3
    } yield (a, b, hd.toLong)).toSet
    assert(banded == brute,
      s"banded pairs must equal brute force:\n$banded\n$brute")
    assert(banded.exists(p => p._1 == 1L && p._2 == 2L),
      "the planted near-dup pair must be found")
  }

  test("t_repetition and t_gopher_rules survive empty, whitespace, " +
      "and single-word documents (regression: a hand-rolled " +
      "sequence(1, size-1) descends to [1, 0] below 2 words and " +
      "element_at(ws, 0) throws)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_edge_docs").toString
    Seq((1L, "", "en", "web", 0L), (2L, "   ", "en", "web", 3L),
      (3L, "word", "en", "web", 4L),
      (4L, "two words\ntwo words", "en", "web", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    for (name <- Seq("t_repetition", "t_gopher_rules")) {
      val q = graft.queries.Registry.all.find(_.name == name)
        .getOrElse(fail(s"$name not registered"))
      val rows = q.fn(spark, dir).collect()
      assert(rows.length == 4, s"$name must keep every pathological doc")
    }
    // the 4th doc exercises the real math: its one line duplicates
    val rep = graft.queries.Registry.all.find(_.name == "t_repetition").get
      .fn(spark, dir).filter(col("doc_id") === 4L).head()
    assert(rep.getAs[Double]("dup_line_frac") == 0.5)
    // tokens [two, words, two, words] → "two words" ×2 (len 9),
    // "words two" ×1: argmax count 2, coverage 2·9 = 18
    assert(rep.getAs[Long]("top_count") == 2L)
    assert(rep.getAs[Long]("top_chars") == 18L)
  }

  test("t_repetition top-bigram values are tie-independent: when two " +
      "bigrams tie on count, top_chars is the LARGEST coverage, not " +
      "the lexicographically-first bigram's (the r12 driver-red " +
      "collation exposure)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_edge_tie").toString
    // "zz bbbb" ×2 (len 7, coverage 14) ties on count with "a c" ×2
    // (len 3, coverage 6); a lexicographic tie-break picks "a c",
    // the tie-independent rule picks coverage 14
    Seq((1L, "zz bbbb x zz bbbb y a c q a c", "en", "web", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rep = graft.queries.Registry.all.find(_.name == "t_repetition").get
      .fn(spark, dir).head()
    assert(rep.getAs[Long]("top_count") == 2L)
    assert(rep.getAs[Long]("top_chars") == 14L)
    // keep: 11 bigram instances, chars = 14+6+singles; exact-integer
    // rule top_chars*5 <= bg_chars must agree with the double form
    val bg = rep.getAs[Long]("bg_chars")
    assert(rep.getAs[Boolean]("keep") == (14L * 5 <= bg))
  }

  test("t_c4_rules and d_line_dedup survive empty / whitespace / " +
      "single-word docs, and the real math holds: C4 keeps only " +
      "terminal-punctuated ≥5-word lines, line dedup keeps exactly " +
      "the first corpus-wide occurrence") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_edge_c4").toString
    Seq(
      (1L, "", "en", "web", 0L),
      (2L, "   ", "en", "web", 3L),
      (3L, "word", "en", "web", 4L),
      // two lines: one C4-keepable, one (short, no terminal punct) not;
      // the keepable line REPEATS in doc 5 → dedup keeps doc 4's copy
      (4L, "this sentence has six whole words.\nshort line", "en",
        "web", 46L),
      (5L, "this sentence has six whole words.\nuses javascript " +
        "alert framework here today.", "en", "web", 78L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // both gates derive their line corpora from the token stream (the
    // test tables carry no newlines/punctuation), so the expectations
    // below follow the derivations: C4 = 6-word lines, most
    // terminal-'.'-ed, every 7th line javascript'd; line-dedup =
    // 10-word lines + a partial copy of every doc_id % 7 == 3
    val c4 = graft.queries.Registry.all.find(_.name == "t_c4_rules").get
      .fn(spark, dir).collect()
    assert(c4.length == 5, "t_c4_rules must keep every pathological doc")
    val byId = c4.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Long]("n_lines") == 0L &&
      !byId(1L).getAs[Boolean]("keep"), "empty doc: zero lines, dropped")
    // doc 3 'word' → one 1-word line 'word.': terminal but < 5 words
    assert(byId(3L).getAs[Long]("kept_lines") == 0L &&
      !byId(3L).getAs[Boolean]("keep"))
    // doc 4: line 0 is 6 words + '.' (kept), line 1 is 2 words (not);
    // 3 terminal marks in the doc → the page survives
    assert(byId(4L).getAs[Long]("kept_lines") == 1L &&
      byId(4L).getAs[Long]("n_lines") == 2L &&
      byId(4L).getAs[Boolean]("keep"))
    // doc 5's second line mentions javascript → dropped by the line
    // rule even though it is long and terminal-punctuated
    assert(byId(5L).getAs[Long]("kept_lines") == 1L &&
      byId(5L).getAs[Long]("n_lines") == 2L)
    val ld = graft.queries.Registry.all.find(_.name == "d_line_dedup").get
      .fn(spark, dir).collect().map(r => r.getLong(0) -> r).toMap
    assert(ld.size == 6,
      "5 docs + the planted partial copy of doc 3 (10003)")
    assert(ld(1L).getAs[Long]("n_lines") == 0L &&
      ld(1L).getAs[Double]("dup_frac") == 0.0)
    assert(ld(3L).getAs[Long]("kept_lines") == 1L,
      "doc 3 owns the canonical occurrence of its line")
    assert(ld(10003L).getAs[Long]("n_lines") == 2L &&
      ld(10003L).getAs[Long]("kept_lines") == 1L &&
      ld(10003L).getAs[Double]("dup_frac") == 0.5,
      "the copy keeps only its unique tail line")
  }

  test("batched MaxSim: a query with an empty or null token array is " +
      "absent from the output; populated queries are unaffected") {
    import graft.operators.{IvfIndex, Serving}
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"),
      col("label"), col("embedding").cast("array<double>").as("v"))
    val (indexed, model) = IvfIndex.build(emb, "vec_id", "v", 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_edge_msb").toString + "/idx"
    IvfIndex.write(indexed, dir, model)
    val live = Serving.open(spark, dir, id = "vec_id", vecCol = "v")
    val qv = emb.filter(col("vec_id") === 3L)
      .select("v").head().getSeq[Double](0)
    val queries = Seq(
      (0L, Seq(qv)),
      (1L, Seq.empty[Seq[Double]]))
      .toDF("qid", "qvecs")
      .unionByName(Seq(2L).toDF("qid")
        .withColumn("qvecs", lit(null).cast("array<array<double>>")))
    val got = live.searchMaxSimBatch(queries, "qid", "qvecs",
      nProbe = 3, k = 5, docCol = "label").collect()
    assert(got.map(_.getLong(0)).distinct.toSeq == Seq(0L),
      "only the populated query returns rows; empty/null are absent")
    assert(got.length == 5)
  }

  test("resize of an empty payload is empty with zero sizes; " +
      "factor 1 is the identity") {
    import graft.operators.Multimodal
    val df = Seq((1L, ""), (2L, "abcdef")).toDF("doc_id", "text")
    val withPayload = Multimodal.withPayload(df, "text")
    val r2 = Multimodal.resize(withPayload, "doc_id", 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          new String(r.getAs[Array[Byte]](3), "UTF-8"))).toMap
    assert(r2(1L) == ((0L, 0L, "")))
    assert(r2(2L) == ((6L, 3L, "ace")))
    val r1 = Multimodal.resize(withPayload, "doc_id", 1)
      .filter(col("id") === 2L).head()
    assert(new String(r1.getAs[Array[Byte]](3), "UTF-8") == "abcdef")
    intercept[IllegalArgumentException] {
      Multimodal.resize(withPayload, "doc_id", 0)
    }
  }

  test("quality score of empty/whitespace text is 0.0, not null") {
    val got = Seq("", "   ", "real text here")
      .toDF("t").select(text.qualityScore(col("t"))).as[Double].collect()
    assert(got(0) == 0.0 && got(1) == 0.0 && got(2) > 0.0)
  }

  test("packed codes: empty arrays, length mismatch, zero vector") {
    // empty vector → empty binary → zero dot
    val empty = Seq(Seq.empty[Long]).toDF("c")
      .select(quantize.packCodes(col("c")).as("b"))
    assert(empty.select(length(col("b"))).as[Int].head() == 0)
    assert(empty.select(
      quantize.packedDot(col("b"), col("b"))).as[Long].head() == 0L)
    // mismatched lengths dot over the common prefix (same contract as
    // the float kernels)
    val mixed = Seq((Seq(127L, 127L, 127L), Seq(127L)))
      .toDF("a", "c")
      .select(quantize.packedDot(quantize.packCodes(col("a")),
        quantize.packCodes(col("c"))).as("d"))
    assert(mixed.as[Long].head() == 127L * 127L)
    // zero vector packs to the bias byte everywhere and self-dots to 0
    val zero = Seq(Seq(0.0, 0.0, 0.0)).toDF("v")
      .select(quantize.packCodes(
        quantize.codes(col("v"), quantize.maxAbs(col("v")))).as("b"))
    assert(zero.select(
      quantize.packedDot(col("b"), col("b"))).as[Long].head() == 0L)
    // a null element refuses loudly rather than masking
    val boom = intercept[Exception] {
      Seq(Tuple1(Seq(Option(1L), None))).toDF("c")
        .select(quantize.packCodes(col("c"))).collect()
    }
    assert(boom.getMessage != null)
  }

  test("matvec rotation: short input reads the common prefix, empty " +
      "basis yields an empty vector") {
    import graft.operators.ProductQuantizer
    val basis = Array(Array(1.0, 0.0, 0.0), Array(0.0, 2.0, 0.0))
    // input shorter than the basis row: forward loop stops at min(n)
    val short = Seq(Seq(3.0, 5.0)).toDF("v")
      .select(ProductQuantizer.rotateExpr(col("v"), basis).as("r"))
      .as[Seq[Double]].head()
    assert(short == Seq(3.0, 10.0))
    val none = Seq(Seq(1.0, 2.0)).toDF("v")
      .select(ProductQuantizer.rotateExpr(col("v"),
        Array.empty[Array[Double]]).as("r"))
      .as[Seq[Double]].head()
    assert(none.isEmpty)
  }

  test("redaction of empty text is empty with zero counts") {
    val got = Seq("", "customer data", "no match here")
      .toDF("text")
      .select(
        size(regexp_extract_all(col("text"),
          lit("\\b(customer|supplier|spark)\\b"), lit(0))).as("n"),
        regexp_replace(col("text"),
          lit("\\b(customer|supplier|spark)\\b"), lit("[TERM]")).as("r"))
      .as[(Int, String)].collect()
    assert(got(0) == ((0, "")))
    assert(got(1) == ((1, "[TERM] data")))
    assert(got(2) == ((0, "no match here")))
  }

  test("zero vector quantizes to all-zero codes") {
    val df = Seq(Seq(0.0, 0.0, 0.0)).toDF("v")
      .withColumn("ma", quantize.maxAbs(col("v")))
    val codes = df.select(quantize.codes(col("v"), col("ma")))
      .as[Seq[Long]].head()
    assert(codes == Seq(0L, 0L, 0L))
  }

  test("compact survives and preserves data across the swap") {
    val dir = java.nio.file.Files.createTempDirectory("cmp").toString + "/t"
    Seq((1L, "a", 1), (1L, "b", 2), (2L, "c", 1)).toDF("id", "v", "ver")
      .write.parquet(dir)
    graft.streaming.StreamUpdate.compact(spark, dir, "id", "ver")
    val got = spark.read.parquet(dir)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "b", 2L -> "c"))
    // idempotent second compact
    graft.streaming.StreamUpdate.compact(spark, dir, "id", "ver")
    assert(spark.read.parquet(dir).count() == 2)
  }
}
