package graft

import graft.queries.ChunkingQueries
import org.apache.spark.sql.execution.ExplainMode

/** q_hybrid_rrf scan-sharing contract: the corpus is tokenized ONCE —
  * both the dense and sparse rank paths read the persisted
  * (doc_id, token) intermediate, not their own parquet scan.
  */
class HybridScanSpec extends SparkTestBase {

  test("hybrid RRF plan tokenizes the corpus once") {
    val toks = ChunkingQueries.tokenRows(spark, sf).persist()
    try {
      val plan = ChunkingQueries.hybridRrf(spark, sf, toks)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      // exactly ONE text-reading parquet scan may exist — the one
      // inside the cached token relation (formatted explain prints a
      // cached relation's plan once, however many branches read it);
      // the only other scan allowed is the column-less count-star for
      // the IDF denominator
      val textScans = plan.linesIterator
        .filter(l => l.contains("ReadSchema") && l.contains("text"))
        .size
      assert(textScans == 1,
        s"found $textScans text-reading parquet scan(s) — " +
          s"a rank path is re-tokenizing the corpus\n$plan")
      val cacheReads = "InMemoryTableScan".r.findAllIn(plan).size
      assert(cacheReads >= 2,
        s"both rank paths should read the shared cached token relation\n$plan")
    } finally { toks.unpersist(); () }
  }
}
