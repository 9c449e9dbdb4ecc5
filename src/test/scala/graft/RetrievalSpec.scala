package graft

import graft.queries.ChunkingQueries
import org.apache.spark.sql.functions._

/** The lexical (BM25) and truncation (MRL) retrieval operators must
  * show the PROPERTIES their formulas exist for — saturation, length
  * normalization, idf discrimination, prefix≡full at full width — not
  * just match the oracle's arithmetic.
  */
class RetrievalSpec extends SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def scores(d: org.apache.spark.sql.DataFrame,
      terms: Seq[String]): Map[Long, Long] =
    ChunkingQueries.bm25(d, terms, 100).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bm25: term-frequency saturation — 10x the tf is far less than 10x the score") {
    // equal-length docs (padding with a non-query token)
    val pad = "x "
    val d = docs(
      1L -> ("spark " + pad * 19).trim,
      2L -> (("spark " * 10) + pad * 10).trim,
      3L -> (pad * 20).trim)
    val s = scores(d, Seq("spark"))
    assert(s(2) > s(1), "more occurrences must score higher")
    assert(s(2) < 3 * s(1),
      s"tf=10 vs tf=1 must saturate well under 10x (k1+1 cap): ${s(2)} vs ${s(1)}")
    assert(!s.contains(3L), "doc without the term scores nothing")
  }

  test("bm25: length normalization — same tf, longer doc scores lower") {
    val d = docs(
      1L -> ("spark " + "x " * 9).trim,
      2L -> ("spark " + "x " * 99).trim,
      3L -> "y")
    val s = scores(d, Seq("spark"))
    assert(s(1) > s(2),
      s"equal tf in a 10x longer doc must score lower: ${s(1)} vs ${s(2)}")
  }

  test("bm25: idf — a corpus-rare term outweighs a corpus-common one") {
    val common = (1L to 8L).map(i => i -> "join z z z")
    val d = docs((common :+ (9L -> "spark join z z")): _*)
    val s = scores(d, Seq("spark", "join"))
    // doc 9 has both terms; its score must be dominated by the rare
    // 'spark': strictly above any common-only doc by more than the
    // common term's own contribution
    val commonOnly = s(1L)
    assert(s(9L) > 2 * commonOnly,
      s"rare-term idf must dominate: ${s(9L)} vs common-only $commonOnly")
  }

  test("mmr: lambda=1 is pure relevance order; a duplicate of the top hit is exiled") {
    import graft.operators.Knn
    import spark.implicits._
    // candidates: c1 best, c2 = exact copy of c1 (self-sim 4 — a
    // heavy redundancy penalty), c3/c4 diverse directions
    val cand = Seq(
      (0L, 1L, Array(2.0, 0.0), 0.9),
      (0L, 2L, Array(2.0, 0.0), 0.89),
      (0L, 3L, Array(0.0, 1.0), 0.5),
      (0L, 4L, Array(0.0, 0.9), 0.45))
      .toDF("query_id", "vec_id", "v", "sq")
    val pure = Knn.mmrRerank(cand, 4, 1.0).orderBy("step")
      .collect().map(_.getLong(2)).toSeq
    assert(pure == Seq(1L, 2L, 3L, 4L), "lambda=1 must reduce to relevance order")
    val mmr = Knn.mmrRerank(cand, 4, 0.5).orderBy("step")
      .collect().map(_.getLong(2)).toSeq
    assert(mmr.head == 1L, "step 1 is pure relevance")
    assert(mmr.last == 2L,
      s"the exact duplicate of the top hit must be picked LAST, got $mmr")
    assert(mmr(1) == 3L, "step 2 prefers the diverse direction over the copy")
  }

  test("mmr: groups are independent — a second query reranks its own candidates") {
    import graft.operators.Knn
    import spark.implicits._
    val cand = Seq(
      (0L, 1L, Array(1.0, 0.0), 0.9), (0L, 2L, Array(0.0, 1.0), 0.5),
      (7L, 9L, Array(1.0, 0.0), 0.3), (7L, 8L, Array(1.0, 0.0), 0.8))
      .toDF("query_id", "vec_id", "v", "sq")
    val out = Knn.mmrRerank(cand, 2, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((0L, 1L, 1L), (0L, 2L, 2L), (7L, 1L, 8L), (7L, 2L, 9L)))
  }

  test("mrl: prefix width 64 reproduces the full-dim top-10 exactly") {
    val curve = SparkEntry.queries("v_mrl_curve")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(curve(64L) == 10L,
      s"p=64 is the full vector — overlap@10 must be 10, got ${curve(64L)}")
    assert(curve.keySet == Set(4L, 8L, 16L, 32L, 64L),
      "every width must emit a row, zero-overlap widths included")
  }

  test("mrl: the search's final scores are full-dimension dots") {
    // every (vec_id, score) the MRL search emits must equal the exact
    // full-dim dot for that vec_id (the rerank is exact; only the
    // candidate set is approximate)
    val mrl = SparkEntry.queries("v_mrl_search")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full = SparkEntry.queries("v_knn_dot")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val overlap = mrl.keySet intersect full.keySet
    assert(overlap.nonEmpty, "some exact top-10 hits should survive the coarse pass")
    overlap.foreach { id =>
      assert(mrl(id) == full(id),
        s"rerank score for $id must be the exact full-dim dot")
    }
  }
}
