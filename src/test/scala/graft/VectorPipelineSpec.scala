package graft

import graft.operators.{IvfIndex, VectorPipeline}
import graft.operators.VectorPipeline.AnnConfig
import org.apache.spark.sql.functions._

class VectorPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("full ANN pipeline: pruning + restricts + crowding + top-k") {
    val emb = Tables.embeddings(spark, sf).cache()
    val (indexed, model) = IvfIndex.build(emb, "vec_id", "embedding", 8)
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    val cfg = AnnConfig(nProbe = 3, k = 10, crowdingCap = Some(2),
      restrict = Some(col("vec_id") =!= 0))

    val ann = VectorPipeline.annSearch(indexed, model, query, cfg,
      "vec_id", "embedding", "label").cache()
    // crowding: at most 2 per label
    assert(ann.groupBy("label").count().filter(col("count") > 2).count() == 0)
    assert(ann.count() == 10)
    assert(ann.filter(col("vec_id") === 0).count() == 0)

    // recall vs exact search with identical restrict+crowding semantics
    // (exactSearch takes a unique-id corpus, not the spill-exploded index)
    val exact = VectorPipeline.exactSearch(emb, query, cfg,
      "vec_id", "embedding", "label")
    val annIds = ann.select("vec_id").as[Long].collect().toSet
    val exactIds = exact.select("vec_id").as[Long].collect().toSet
    val recall = annIds.intersect(exactIds).size.toDouble / exactIds.size
    assert(recall >= 0.3, s"recall = $recall")

    // probing every leaf reproduces exact search
    val full = VectorPipeline.annSearch(indexed, model, query,
      cfg.copy(nProbe = 8), "vec_id", "embedding", "label")
      .select("vec_id").as[Long].collect().toSet
    assert(full == exactIds)
  }

  test("quantized kNN approximates float kNN") {
    val qk = SparkEntry.queries("v_knn_quantized")(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    val fk = SparkEntry.queries("v_knn_dot")(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    val overlap = qk.intersect(fk).size
    assert(overlap >= 7, s"only $overlap/10 overlap between int8 and float kNN")
  }
}
