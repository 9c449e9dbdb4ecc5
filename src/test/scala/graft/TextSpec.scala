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
}
