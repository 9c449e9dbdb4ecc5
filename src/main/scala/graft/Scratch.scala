package graft

import org.apache.spark.sql.functions._

/** Temporary profiling harness — not part of the library. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    import graft.operators.Dedup
    val sim = time("simhash") {
      val s = Dedup.simhash(docs, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[scratch] sim rows = ${s.count()}")
      s
    }
    time("banded-cand") {
      val perBand = (0 until 4).map { bi =>
        val key = shiftright(col("simhash"), bi * 8).bitwiseAND(lit(255L))
        val a = sim.select(col("doc_id").as("da"), key.as("k"))
        val b = sim.select(col("doc_id").as("db"), key.as("k"))
        a.join(b, Seq("k")).filter(col("da") < col("db")).select("da", "db")
      }
      val c = perBand.reduce(_ unionAll _).distinct()
      println(s"[scratch] cand pairs = ${c.count()}")
    }
    time("banded-full") {
      val r = Dedup.simhashBandedPairs(sim, "doc_id", 3)
      println(s"[scratch] banded pairs = ${r.count()}")
    }
    // per-band hot-bucket histogram
    (0 until 4).foreach { bi =>
      val key = shiftright(col("simhash"), bi * 8).bitwiseAND(lit(255L))
      val top = sim.groupBy(key.as("k")).count().orderBy(desc("count")).limit(3)
        .collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" ")
      println(s"[scratch] band $bi top buckets: $top")
    }
    spark.stop()
  }
}
