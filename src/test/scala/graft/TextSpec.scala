package graft

import graft.functions.text
import org.apache.spark.sql.functions._

class TextSpec extends SparkTestBase {
  import spark.implicits._

  test("token count handles whitespace edge cases") {
    val df = Seq("a b  c", " lead", "trail ", "one", "a\tb\nc").toDF("t")
    val got = df.select(text.tokenCount($"t")).as[Long].collect().toSeq
    assert(got == Seq(3L, 1L, 1L, 1L, 3L))
  }

  test("polyHash matches a scala replica") {
    def replica(s: String): Long =
      s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toInt) % 1000000007L)
    val inputs = Seq("abc", "hello world", "x" * 600)
    val got = inputs.toDF("t").select(text.polyHash($"t")).as[Long].collect()
    assert(got.toSeq == inputs.map(replica))
  }

  test("langId picks the majority-stopword language") {
    val df = Seq(
      "the cat is on the mat",       // en
      "der hund und die katze",      // de
      "el perro y la casa es",       // es
      "le chien et les chats est",   // fr
      "xyzzy qwerty"                 // none
    ).toDF("t")
    val got = df.select(text.langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "fr", "und"))
  }

  test("quality score stays in [0,1] on real docs") {
    val bad = SparkEntry.queries("t_quality_score")(spark, sf)
      .filter(col("quality") < 0 || col("quality") > 1)
    assert(bad.count() == 0)
  }

  test("BpeTrainer.applyMerge: greedy left-to-right, consumed " +
      "occurrences cannot chain, non-matching arrays untouched") {
    import graft.operators.BpeTrainer
    val df = Seq(
      Seq("a", "a", "a"),            // -> [aa, a], NOT [aa, aa-overlap]
      Seq("a", "a", "a", "a"),       // -> [aa, aa]
      Seq("x", "a", "a", "y"),       // -> [x, aa, y]
      Seq("a", "b", "a", "b"),       // rule (a,a): untouched
      Seq("a"), Seq.empty[String]
    ).toDF("syms")
    val got = df.select(BpeTrainer.applyMerge($"syms", "a", "a"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("aa", "a"), Seq("aa", "aa"),
      Seq("x", "aa", "y"), Seq("a", "b", "a", "b"), Seq("a"), Seq.empty),
      s"$got")
  }

  test("BpeTrainer.train learns the hand-computable rules of a tiny " +
      "corpus with deterministic tie-breaks and shrinking symbol mass") {
    import graft.operators.BpeTrainer
    // "abab" x3 + "ab" x2: pairs ab=8, ba=3 -> rule1 (a,b);
    // round 2: words are [ab,ab]x3 + [ab]x2 -> pair (ab,ab)=3
    val docs = Seq((1L, "abab abab ab"), (2L, "abab ab")).toDF("doc_id", "text")
    val got = BpeTrainer.train(spark, docs, "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(got(0) == ((1L, "a", "b", 8L, 8L)),
      s"round 1 must merge (a,b) seen 8x; mass 3*2+2*1=8: ${got.toSeq}")
    assert(got(1) == ((2L, "ab", "ab", 3L, 5L)),
      s"round 2 must merge (ab,ab) seen 3x; mass 3*1+2*1=5: ${got.toSeq}")
    // monotone: each merge strictly shrinks weighted symbol mass
    assert(got(1)._5 < got(0)._5)
  }

  test("BpeTrainer.encodeWith equals rank-priority BPE encoding on a " +
      "trained-order table (later products feed on earlier ones)") {
    import graft.operators.BpeTrainer
    // trained order: (a,b) first, then its product feeds (ab,c) —
    // the case where one exhaustive pass per rule could diverge from
    // the repeatedly-merge-the-lowest-rank-pair loop for an
    // arbitrary table, but cannot for a trained one
    val rules = Seq(("a", "b"), ("ab", "c"))
    def priority(syms: List[String]): List[String] = {
      val ranked = rules.zipWithIndex
      def bestAt(s: List[String]): Option[(Int, Int)] =
        s.zip(s.drop(1)).zipWithIndex
          .flatMap { case ((x, y), i) =>
            ranked.find(_._1 == ((x, y))).map(r => (r._2, i)) }
          .sortBy(identity).headOption
      bestAt(syms) match {
        case None => syms
        case Some((r, i)) =>
          val (a, b) = rules(r)
          priority(syms.take(i) ++ List(a + b) ++ syms.drop(i + 2))
      }
    }
    val inputs = Seq("abc", "abcabc", "abcb", "cabcab", "aabbcc",
      "ababc", "abcc", "ccc", "ab", "a", "")
      .map(_.split("").filter(_.nonEmpty).toList)
    val got = inputs.map(_.toSeq).toDF("syms")
      .select(BpeTrainer.encodeWith($"syms", rules))
      .as[Seq[String]].collect().toSeq
    inputs.zip(got).foreach { case (in, enc) =>
      assert(enc == priority(in).toSeq,
        s"in=$in sequential=$enc priority=${priority(in)}")
    }
  }

  test("BPE merge table is well-formed (sides are chars or earlier products)") {
    import graft.functions.BpeCodec
    val known = scala.collection.mutable.Set.empty[String]
    BpeCodec.merges.foreach { case (a, b) =>
      Seq(a, b).foreach { s =>
        assert(s.length == 1 || known.contains(s),
          s"rule ($a, $b): '$s' is neither a base char nor an earlier product")
      }
      known += (a + b)
      ()
    }
    assert(BpeCodec.merges.map { case (a, b) => s"$a|$b" }.distinct.size ==
      BpeCodec.merges.size, "duplicate merge rules")
  }

  test("BPE encode merges known pairs and leaves unknowns as chars") {
    import graft.functions.BpeCodec
    assert(BpeCodec.encodeCount("the") == 1)   // t h -> th, th e -> the
    assert(BpeCodec.encodeCount("thin") == 2)  // th + in
    assert(BpeCodec.encodeCount("xyz") == 3)   // no rule applies
    assert(BpeCodec.encodeCount("q") == 1)
    assert(BpeCodec.encodeCount("ingesting") > 1) // partial merges still shrink
    assert(BpeCodec.encodeCount("ingesting") < 9)
  }

  test("TextClassifier.score: exact weighted sums, OOV scores 0, " +
      "integer keep decision, empty docs survive, model broadcast") {
    import graft.operators.TextClassifier
    val docs = Seq(
      (1L, "spark spark data oovword"), // 1000+1000+900+0 = 2900 / 4
      (2L, "slow dup a"),               // -400-1000-800 = -2200 / 3
      (3L, ""),                          // no tokens
      (4L, "oov1 oov2")                  // all OOV: 0 / 2
    ).toDF("doc_id", "text")
    val got = TextClassifier.score(spark, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("score_num"),
          r.getAs[Double]("score"), r.getAs[Boolean]("keep"))).toMap
    assert(got(1L) == ((4L, 2900L, 725.0, true)), s"$got")
    assert(got(2L) == ((3L, -2200L, -2200.0 / 3, false)), s"$got")
    assert(got(3L) == ((0L, 0L, 0.0, false)),
      s"an empty doc must emit a zero row, not vanish: $got")
    assert(got(4L) == ((2L, 0L, 0.0, false)),
      s"all-OOV doc scores 0 and fails a positive threshold: $got")
    // the model must join as a BROADCAST (a KB-size artifact never
    // justifies a shuffle of the token stream)
    val plan = TextClassifier.score(spark, docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"model join must broadcast:\n$plan")
    // carried columns ride the one pass (no corpus self-join) and
    // leave the per-doc values unchanged
    val withSrc = docs.withColumn("src",
      concat(lit("s"), col("doc_id") % 2))
    val carried = TextClassifier.score(spark, withSrc, "doc_id", "text",
      carry = Seq("src"))
    assert(carried.columns.toSeq ==
      Seq("doc_id", "src", "n_tokens", "score_num", "score", "keep"))
    val c = carried.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getAs[Long]("score_num"))).toMap
    assert(c(1L) == (("s1", 2900L)) && c(2L) == (("s0", -2200L)), s"$c")
    // importance-sampling algebra: bucket·n_tokens < score_num keeps
    // a p=1 doc (score 1000 milli) always and a negative-score doc
    // never, for EVERY bucket value
    val full = (1 to 40).map(i =>
      (i.toLong, Seq.fill(6)("spark").mkString(" "))) // score = 1000·6
    val neg = (41 to 80).map(i => (i.toLong, "dup dup dup"))
    val all = (full ++ neg).toDF("doc_id", "text")
    val sc2 = TextClassifier.score(spark, all, "doc_id", "text")
    val h = ((col("doc_id") % 2147483647L) * 1103515245L + 12345L) %
      2147483647L
    val bucket = ((h * h) % 2147483647L) % 1000L
    val kept = sc2.filter(bucket * col("n_tokens") < col("score_num"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (1L to 40L).toSet,
      s"p=1 docs always kept, negative never: $kept")
  }

  test("BPE column expression sums per-word counts") {
    val got = Seq("the thin xyz", "", "   ").toDF("t")
      .select(text.bpeMergeCount(col("t"))).as[Long].collect().toSeq
    assert(got == Seq(1L + 2L + 3L, 0L, 0L))
    // counts never exceed characters and are >= 1 per word
    val docs = Tables.documents(spark, sf).limit(50)
    val bad = docs.select(text.bpeMergeCount(col("t" + "ext")).as("n"),
      text.tokenCount(col("text")).as("w"),
      length(col("text")).as("c"))
      .filter(col("n") < col("w") || col("n") > col("c"))
    assert(bad.count() == 0)
  }
}
