package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.{quantize, vectors}
import org.apache.spark.sql.functions._

/** Int8 quantization coverage: the quantization itself and a fully
  * exact quantized kNN (integer dot products are order-independent in
  * double, so even the ANN-ish compressed path hash-matches).
  */
object QuantizeQueries {

  private val CodesCte =
    "WITH qn AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings), " +
      "mm AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS ma FROM qn), " +
      "cc AS (SELECT vec_id, ma, list_transform(v, x -> CASE WHEN ma = 0 THEN 0 " +
      "ELSE cast(floor(x * (127.0 / ma) + 0.5) as bigint) END) AS codes FROM mm)"

  /** Quantization audit: scale, code sum, code fold. */
  private val vQuantize = QueryDef.sqlChecked("v_quantize")(
    s"$CodesCte SELECT vec_id, ma, " +
      "cast(list_reduce(list_prepend(cast(0 as bigint), codes), (a, b) -> a + b) as bigint) AS qsum, " +
      "list_reduce(list_prepend(cast(0 as bigint), " +
      "list_transform(codes, x -> x + 127)), (a, b) -> (a * 31 + b) % 1000000007) AS qhash " +
      "FROM cc ORDER BY vec_id"
  ) { (s, d) =>
    val v = col("embedding").cast("array<double>")
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), v.as("v"))
      .withColumn("ma", quantize.maxAbs(col("v")))
      .withColumn("codes", quantize.codes(col("v"), col("ma")))
    base.select(
      col("vec_id"), col("ma"),
      aggregate(col("codes"), lit(0L), (a, b) => a + b).as("qsum"),
      aggregate(transform(col("codes"), x => x + 127), lit(0L),
        (a, b) => (a * 31 + b) % 1000000007L).as("qhash"))
      .orderBy("vec_id")
  }

  /** kNN over quantized codes: integer dot products (exact in double
    * regardless of accumulation order — sums of ints < 2^53).
    */
  private val vKnnQuantized = QueryDef.sqlChecked("v_knn_quantized")(
    s"$CodesCte SELECT e.vec_id AS vec_id, " +
      "list_inner_product(cast(e.codes as double[]), cast(q.codes as double[])) AS iscore " +
      "FROM cc e, cc q WHERE q.vec_id = 0 AND e.vec_id <> 0 " +
      "ORDER BY iscore DESC, vec_id LIMIT 10"
  ) { (s, d) =>
    val v = col("embedding").cast("array<double>")
    val coded = Tables.embeddings(s, d)
      .select(col("vec_id"), v.as("v"))
      .withColumn("ma", quantize.maxAbs(col("v")))
      .select(col("vec_id"), quantize.codes(col("v"), col("ma")).as("codes"))
    val q = coded.filter(col("vec_id") === 0)
      .select(col("codes").as("qcodes"))
    coded.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        vectors.dotProduct(col("codes"), col("qcodes")).as("iscore"))
      .orderBy(col("iscore").desc, col("vec_id"))
      .limit(10)
  }

  val defs: Seq[QueryDef] = Seq(vQuantize, vKnnQuantized)
}
