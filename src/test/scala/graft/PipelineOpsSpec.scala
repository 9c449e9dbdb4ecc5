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
}
