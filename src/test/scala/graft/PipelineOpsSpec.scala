package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Dataset-preparation operators: deterministic sampling, leakage-safe
  * splits, heavy hitters (PipelineQueries).
  */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(name: String) =
    PipelineQueries.defs.find(_.name == name).get.fn(spark, sf)

  test("hash sample is deterministic and near the nominal rate") {
    val total = Tables.orders(spark, sf).count()
    val a = run("p_sample_hash").as[(Long, String, Double)].collect()
    val b = run("p_sample_hash").as[(Long, String, Double)].collect()
    assert(a.sameElements(b), "same predicate must select the same rows")
    val rate = a.length.toDouble / total
    assert(rate > 0.05 && rate < 0.15, s"10% nominal, got $rate")
  }

  test("sample predicate pushes down to the parquet scan") {
    val plan = Tables.orders(spark, sf)
      .filter(((lit(1103515245L) * col("o_orderkey") + 12345L) % 2147483647L)
        .isNotNull)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey)]"),
      s"scan-level pruning expected:\n$plan")
  }

  test("p_source_cap: every source is capped at 5, ranks are " +
      "contiguous from 1, and the rank filter compiles to a partial " +
      "per-partition top-k (WindowGroupLimit) — a skewed source " +
      "ships 5·partitions rows, never its whole group") {
    val df = run("p_source_cap")
    val rows = df.collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks.size <= 5 && ranks == (1L to ranks.size).toSeq,
        s"$src: ranks must be 1..k<=5, got $ranks")
      // quality within a source is non-increasing by rank
      val qs = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("quality"))
      assert(qs.zip(qs.tail).forall { case (a, b) => a >= b },
        s"$src: quality must be non-increasing, got ${qs.toSeq}")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=5 must compile to a partial top-k:\n$plan")
  }

  test("p_quality_quantile: keep rate is ~80% (the threshold row " +
      "itself and its ties stay), threshold is a value FROM the data") {
    val rows = run("p_quality_quantile").collect()
    val n = rows.length
    val kept = rows.count(_.getAs[Boolean]("keep"))
    // >= threshold keeps at least n - ceil(0.2n) + 1 rows; ties can
    // only add
    assert(kept >= n - math.ceil(0.2 * n).toInt + 1 && kept <= n,
      s"kept $kept of $n")
    val thr = rows.filter(_.getAs[Boolean]("keep"))
      .map(_.getAs[Double]("quality")).min
    assert(rows.map(_.getAs[Double]("quality")).contains(thr),
      "threshold must be an actual data value, not interpolated")
    assert(rows.filter(!_.getAs[Boolean]("keep"))
      .forall(_.getAs[Double]("quality") < thr))
  }

  test("train/test split never splits a user's events") {
    val ev = Tables.events(spark, sf)
      .withColumn("split", when(
        ((lit(1103515245L) * col("user_id") + 12345L) % 2147483647L)
          .multiply(((lit(1103515245L) * col("user_id") + 12345L) % 2147483647L))
          .mod(2147483647L).mod(1000L) < 800, "train").otherwise("test"))
    val straddlers = ev.groupBy("user_id")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
    assert(straddlers == 0, "split must be a pure function of user_id")
    val splits = run("p_split_train_test").select("split").as[String].collect()
    assert(splits.sorted.sameElements(Array("test", "train")))
  }

  test("top-k tokens agrees with a full sort and breaks ties totally") {
    val full = Tables.documents(spark, sf)
      .select(explode(graft.functions.text.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("t")).collect()
    val topk = run("p_topk_tokens").collect()
    assert(topk.sameElements(full.take(20)))
  }

  test("corpus clean output only contains gated, deduped languages") {
    val rows = run("p_corpus_clean")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._1 != "und"), "und must be gated out")
    assert(rows.forall(r => r._2 > 0 && r._3 > 0))
  }

  test("mixture sample: up-weights small sources, broadcasts the rate " +
      "table, rates are sane") {
    val rows = run("p_mixture_sample")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // rate sanity: per-mille in [0, 1000], sampled <= docs, and the
    // realized count tracks the target within hash noise
    rows.foreach { case (src, nDocs, permille, nSampled) =>
      assert(permille >= 0 && permille <= 1000, s"$src permille=$permille")
      assert(nSampled <= nDocs)
    }
    // the realized mix hits the global 20% target (floors and hash
    // noise aside) and rates respond to char mass, not doc count
    val total = rows.map(_._2).sum.toDouble
    val expected = rows.map(r => r._2 * r._3 / 1000.0).sum
    assert(expected / total > 0.1 && expected / total < 0.35,
      s"global target drifted: ${expected / total}")
    val sampled = rows.map(_._4).sum.toDouble
    assert(sampled / total > 0.05 && sampled / total < 0.45,
      s"realized sample rate ${sampled / total} implausible")
    // the rate table join must broadcast (a 20-row dim over the scan)
    val plan = run("p_mixture_sample").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rate table must broadcast:\n$plan")
  }

  test("redaction masks every denylist term and is count-consistent") {
    val rows = TextSpecHelpers.runText(spark, sf, "t_redact")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    // masked text can no longer match the denylist as whole words
    val deny = "\\b(customer|supplier|spark)\\b".r
    rows.foreach { case (id, nEmail, nDeny, redacted) =>
      assert(deny.findFirstIn(redacted).isEmpty,
        s"doc $id still contains a denylist term after redaction")
      assert(nEmail == 0L, "synthetic corpus carries no emails")
      val masks = "\\[TERM\\]".r.findAllIn(redacted).length
      assert(masks == nDeny,
        s"doc $id: $nDeny matches counted but $masks masks present")
    }
    assert(rows.map(_._3).sum > 0, "the denylist must actually fire")
    // the redaction itself is one scan-side projection: with the
    // gate's presentation orderBy removed, the plan holds no Exchange
    val bare = Tables.documents(spark, sf).select(
      regexp_replace(col("text"),
        lit("\\b(customer|supplier|spark)\\b"), lit("[TERM]")))
      .queryExecution.executedPlan.toString
    assert(!bare.contains("Exchange"),
      s"redaction must not shuffle:\n$bare")
  }

  test("redaction count/mask consistency survives a deny word inside an email") {
    // a deny word inside an email-shaped span is swallowed by [EMAIL];
    // n_deny counts on the email-masked text (the same input the deny
    // replacement sees), so count == masks even on such corpora
    val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val DenyRe = "\\b(customer|supplier|spark)\\b"
    val r = Seq("contact supplier@example.com, the supplier and customer")
      .toDF("text")
      .withColumn("masked", regexp_replace(col("text"), lit(EmailRe), lit("[EMAIL]")))
      .select(
        size(regexp_extract_all(col("masked"), lit(DenyRe), lit(0))).as("n_deny"),
        regexp_replace(col("masked"), lit(DenyRe), lit("[TERM]")).as("redacted"))
      .head()
    assert(r.getInt(0) == 2, "supplier-in-email must not be counted")
    assert(r.getString(1) == "contact [EMAIL], the [TERM] and [TERM]")
    val masks = "\\[TERM\\]".r.findAllIn(r.getString(1)).length
    assert(masks == r.getInt(0))
  }

  test("pipelineFunnel: each stage cuts exactly its rule — dedup " +
      "keeps the smallest id of a kept dup group, a rejected dup " +
      "group keeps nothing, decon cuts a contaminated keeper, " +
      "sampling respects the integer rule") {
    // high-score text (spark×8 = score 1000/token ⇒ always sampled
    // if it survives); dup pair 1/2 → only 1 survives dedup; doc 3
    // rejected (negative); dup pair 4/5 BOTH rejected → neither
    // survives; doc 6 high-score but contains the eval 8-run → cut
    // at decon
    val hi = Seq.fill(8)("spark").mkString(" ")
    val evalRun = (1 to 8).map(i => s"ev$i").mkString(" ")
    val train = Seq(
      (1L, "sa", hi), (2L, "sa", hi),
      (3L, "sa", "dup dup dup"),
      (4L, "sb", "slow slow slow"), (5L, "sb", "slow slow slow"),
      (6L, "sb", s"spark spark spark spark $evalRun spark spark")
    ).toDF("doc_id", "source", "text")
    val evalDocs = Seq((100L, "e", s"pre $evalRun post"))
      .toDF("doc_id", "source", "text")
    val got = PipelineQueries.pipelineFunnel(spark, train, evalDocs)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Boolean]("keep"), r.getAs[Boolean]("keep_dedup"),
          r.getAs[Boolean]("keep_clean"), r.getAs[Boolean]("keep_samp")))
      .toMap
    assert(got(1L) == ((true, true, true, true)), s"$got")
    assert(got(2L) == ((true, false, false, false)),
      s"dup copy must lose to the smaller id: $got")
    assert(got(3L) == ((false, false, false, false)), s"$got")
    assert(got(4L) == ((false, false, false, false)) &&
      got(5L) == ((false, false, false, false)),
      s"a rejected dup group keeps nothing: $got")
    assert(got(6L)._1 && got(6L)._2 && !got(6L)._3,
      s"the contaminated keeper must die at decon, not before: $got")
  }
}

private[graft] object TextSpecHelpers {
  def runText(spark: org.apache.spark.sql.SparkSession, sf: String,
      name: String): org.apache.spark.sql.DataFrame =
    graft.queries.TextAnalysis.defs.find(_.name == name).get.fn(spark, sf)
}
