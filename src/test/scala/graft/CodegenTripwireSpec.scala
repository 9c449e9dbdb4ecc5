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

  /** Capture every message ≥ INFO from the two loggers that announce
    * whole-stage de-compilation. `fallback=false` makes a janino
    * FAILURE throw, but two degradation paths still only LOG and run
    * the child plans un-fused: the 64 KB method-size fallback
    * (round-11: `encodeExpr`'s 128 inlined codebook literals — plans
    * de-compiled while every individual expression still compiled,
    * so CODEGEN_ONLY stayed green) and the hugeMethodLimit JIT
    * warning. This makes the third instance of the silent
    * de-compilation class (MatVec r9, PqEncode r11) the last.
    */
  private def withCodegenWarningCapture[A](body: => A)
      : (A, Seq[String]) = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.{LogEvent, Logger => CoreLogger}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val app = new AbstractAppender("graft-codegen-tripwire", null, null,
        false, Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit = {
        captured.add(e.getMessage.getFormattedMessage); ()
      }
    }
    app.start()
    val loggers = Seq(
      "org.apache.spark.sql.execution.WholeStageCodegenExec",
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .map(n => LogManager.getLogger(n).asInstanceOf[CoreLogger])
    val prevLevels = loggers.map(_.getLevel)
    loggers.foreach { l => l.addAppender(app); l.setLevel(Level.INFO) }
    try {
      val a = body
      (a, captured.toArray(Array.empty[String]).toSeq)
    } finally {
      loggers.zip(prevLevels).foreach { case (l, lv) =>
        l.removeAppender(app); l.setLevel(lv)
      }
      app.stop()
    }
  }

  private val decompiled = java.util.regex.Pattern.compile(
    "(?i)grows beyond|whole-stage codegen disabled|" +
      "too long generated codes|failed to compile")

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
          val (_, warnings) = withCodegenWarningCapture {
            // toRdd, NOT count(): count() lets ColumnPruning drop
            // every deterministic output projection, so an expression
            // that de-compiles (or fails) would never even be planned
            // — the tripwire must execute the query's full output
            val n = q.fn(spark, sf).queryExecution.toRdd.count()
            assert(n >= 0)
          }
          val hits = warnings.filter(m => decompiled.matcher(m).find())
          assert(hits.isEmpty,
            s"whole-stage codegen silently disabled:\n${hits.mkString("\n")}")
        }
      }
    }
  }

  test("PQ encode stays inside whole-stage codegen (regression: 64 KB " +
      "method limit from 128 inlined codebook literals)") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cb = graft.operators.ProductQuantizer
      .trainCodebooks(emb, "vec_id", "v", maxSample = 200, iters = 3)
    withCodegenOnly {
      val (n, warnings) = withCodegenWarningCapture {
        // toRdd so the encode projection is EXECUTED — .count() would
        // column-prune it away and this regression test would pass
        // even with the 64 KB failure reintroduced
        emb.select(col("vec_id"),
          graft.operators.ProductQuantizer.encodeExpr(col("v"), cb)
            .as("code")).queryExecution.toRdd.count()
      }
      assert(n > 0)
      val hits = warnings.filter(m => decompiled.matcher(m).find())
      assert(hits.isEmpty,
        s"PQ encode de-compiled:\n${hits.mkString("\n")}")
    }
  }
}
