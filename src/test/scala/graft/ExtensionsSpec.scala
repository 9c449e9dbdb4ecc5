package graft

import graft.operators.SaltedJoin
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("graft functions are callable from SQL text") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb")
    val row = spark.sql(
      """SELECT graft_dot(a.embedding, b.embedding) AS dot,
        |       graft_cosine(a.embedding, b.embedding) AS cos,
        |       graft_l2(a.embedding, b.embedding) AS l2,
        |       graft_norm(a.embedding) AS nrm,
        |       graft_polyhash('abc') AS ph,
        |       graft_bpe_count('the then there') AS bpe
        |FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id = 1
        |""".stripMargin).head()
    // cross-check against the Column API
    val expect = Tables.embeddings(spark, sf).filter($"vec_id" === 0)
      .select($"embedding".as("a"))
      .crossJoin(Tables.embeddings(spark, sf).filter($"vec_id" === 1)
        .select($"embedding".as("b")))
      .select(
        graft.functions.vectors.dotProduct($"a", $"b"),
        graft.functions.vectors.cosineSimilarity($"a", $"b"),
        graft.functions.vectors.l2Distance($"a", $"b"),
        graft.functions.vectors.l2Norm($"a")).head()
    assert(row.getDouble(0) == expect.getDouble(0))
    assert(row.getDouble(1) == expect.getDouble(1))
    assert(row.getDouble(2) == expect.getDouble(2))
    assert(row.getDouble(3) == expect.getDouble(3))
    assert(row.getLong(4) == 96354L) // 'abc' rolling hash
    assert(row.getLong(5) == graft.functions.BpeCodec.countText(
      org.apache.spark.unsafe.types.UTF8String.fromString("the then there")))
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, sf)
    val small = Tables.supplier(spark, sf)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val salted = SaltedJoin(li, small, "l_suppkey",
      saltSrc = col("l_orderkey"), salts = 8)
      .groupBy("l_suppkey").count()
    val plain = li.join(small, "l_suppkey").groupBy("l_suppkey").count()
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
