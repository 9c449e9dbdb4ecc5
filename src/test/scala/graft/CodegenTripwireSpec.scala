package graft

/** Tripwire against silent codegen de-compilation (round-9 verdict #1/#2).
  *
  * Spark's `CodeGeneratorWithInterpretedFallback` catches janino compile
  * failures and silently runs the projection interpreted — correctness
  * survives, performance claims don't (the round-9 `MatVec` expression
  * shipped that way: its generated call had no static forwarder, so every
  * containing plan de-compiled). This spec makes that class of failure a
  * hard error: it executes EVERY registered query at sf0.001 with
  *   spark.sql.codegen.factoryMode = CODEGEN_ONLY  (janino failure throws)
  *   spark.sql.codegen.fallback    = false         (whole-stage failure throws)
  * so any expression whose generated code doesn't compile fails the suite
  * instead of shipping interpreted.
  */
class CodegenTripwireSpec extends SparkTestBase {

  private def withCodegenOnly[A](body: => A): A = {
    val factoryKey = "spark.sql.codegen.factoryMode"
    val fallbackKey = "spark.sql.codegen.fallback"
    val prevFactory = spark.conf.getOption(factoryKey)
    val prevFallback = spark.conf.getOption(fallbackKey)
    spark.conf.set(factoryKey, "CODEGEN_ONLY")
    spark.conf.set(fallbackKey, "false")
    try body
    finally {
      prevFactory.fold(spark.conf.unset(factoryKey))(spark.conf.set(factoryKey, _))
      prevFallback.fold(spark.conf.unset(fallbackKey))(spark.conf.set(fallbackKey, _))
    }
  }

  test("MatVec compiles under CODEGEN_ONLY (regression: missing static forwarder)") {
    withCodegenOnly {
      import org.apache.spark.sql.functions._
      val basis = Array(Array(0.0, 1.0), Array(1.0, 0.0))
      val df = spark.range(4).select(
        org.apache.spark.sql.graftshim.Shims.column(
          graft.functions.MatVec(
            org.apache.spark.sql.graftshim.Shims.expression(
              array(col("id").cast("double"), lit(1.0))),
            basis)).as("rot"))
      val rows = df.collect()
      assert(rows.length == 4)
      // basis swaps the two coordinates
      assert(rows(3).getSeq[Double](0) == Seq(1.0, 3.0))
    }
  }

  test("every registered query executes with codegen mandatory (no interpreted fallback)") {
    withCodegenOnly {
      for (q <- graft.queries.Registry.all) {
        withClue(s"query ${q.name} de-compiled or failed under CODEGEN_ONLY: ") {
          val n = q.fn(spark, sf).count()
          assert(n >= 0)
        }
      }
    }
  }
}
