package graft

class EntrySpec extends SparkTestBase {
  test("driver entry smoke: flagship query returns rows at sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("doc_id", "score", "source", "n_chars"))
  }
}
