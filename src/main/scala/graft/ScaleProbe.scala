package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc scale probe: `runMain graft.ScaleProbe <n> <leaves> <maxLeaf>`
  * times the IVF build and the kNN self-join on the synthetic corpus;
  * `runMain graft.ScaleProbe expr <n> <k>` times only a k-wide
  * fixed-centroid assignment expression (codegen-width probe);
  * `runMain graft.ScaleProbe route <L> <dim> <nProbe> <queries>`
  * times flat vs two-level routing over L synthetic leaf centroids
  * (the 65 536-leaf flat-router ceiling evidence — routing cost must
  * go sublinear in L).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args(0) == "route") {
      val L = args(1).toInt; val dim = args(2).toInt
      val nProbe = args(3).toInt; val nQ = args(4).toInt
      val rnd = new scala.util.Random(7)
      val nCl = math.max(1, L / 64) // clustered, like real centroids
      val centers = Array.fill(nCl)(Array.fill(dim)(rnd.nextGaussian() * 10))
      val cents = Array.tabulate(L) { i =>
        val c = centers(i % nCl)
        Array.tabulate(dim)(j => c(j) + rnd.nextGaussian())
      }
      var t0 = System.nanoTime()
      val router = graft.operators.IvfIndex.Router.build(cents)
      println(f"ROUTER_BUILD ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"groups=${router.superCentroids.length}")
      val flat = graft.operators.IvfIndex.Model(cents)
      val routed = graft.operators.IvfIndex.Model(cents, router = Some(router))
      val queries = Array.fill(nQ) {
        val c = centers(rnd.nextInt(nCl))
        Array.tabulate(dim)(j => c(j) + rnd.nextGaussian())
      }
      t0 = System.nanoTime()
      var agree = 0
      val flatRes = queries.map(q => flat.topLeaves(q, nProbe))
      val tFlat = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val routedRes = queries.map(q => routed.topLeaves(q, nProbe))
      val tRouted = (System.nanoTime() - t0) / 1e9
      queries.indices.foreach { i =>
        agree += flatRes(i).toSet.intersect(routedRes(i).toSet).size
      }
      val parity = agree.toDouble / (nQ * nProbe)
      println(f"ROUTE L=$L flat=$tFlat%.3f s routed=$tRouted%.3f s " +
        f"speedup=${tFlat / tRouted}%.1fx parity=$parity%.3f")
      // the DISTRIBUTED batch path: same routing as an expression over
      // a query DataFrame (IvfIndex.probeExpr), flat vs routed
      import spark.implicits._
      val qdf = queries.map(_.toSeq).toSeq.toDF("qv")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      qdf.count()
      def timeExpr(tag: String, m: graft.operators.IvfIndex.Model): Unit = {
        val t0 = System.nanoTime()
        qdf.select(graft.operators.IvfIndex.probeExpr(m, col("qv"), nProbe)
          .as("p")).agg(sum(size(col("p")))).head()
        println(f"ROUTE_EXPR $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      timeExpr("flat", flat)
      timeExpr("routed", routed)
    } else if (args(0) == "joincmp") {
      // window-rank vs heap-aggregate ranking for the kNN self-join,
      // on the same deterministic bounded layout as the bench row
      import org.apache.spark.sql.functions._
      val n = args(1).toLong
      val v = graft.pipeline.SyntheticCorpus.vectors(spark, n, 32, 25)
      val sub = pmod(xxhash64(col("vec_id")), lit(8L)).cast("int")
      val indexed = v
        .withColumn("leaf_id", explode(array(
          (col("vec_id") % 25).cast("int") * 8 + sub,
          (col("vec_id") % 25).cast("int") * 8 + (sub + 1) % 8)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      indexed.count()
      def time(tag: String)(body: => Long): Unit = {
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val c = body
          (System.nanoTime() - t0) / 1e9 -> c
        }.sortBy(_._1).apply(1) match {
          case (dt, c) => println(f"JOINCMP $tag n=$n median=$dt%.2f s out=$c")
        }
      }
      time("window") {
        graft.operators.Knn.knnJoinPerLeafWindow(indexed, "vec_id",
          "embedding", 3, graft.operators.Knn.Dot).count()
      }
      time("heap") {
        graft.operators.Knn.knnJoinPerLeaf(indexed, "vec_id",
          "embedding", 3, graft.operators.Knn.Dot).count()
      }
      // parity: identical rows between the two ranking forms
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("qid") < 2000)
        .select(col("qid").cast("long"), col("nid").cast("long"),
          col("score"), col("rn").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      val w = rows(graft.operators.Knn.knnJoinPerLeafWindow(indexed, "vec_id",
        "embedding", 3, graft.operators.Knn.Dot))
      val h = rows(graft.operators.Knn.knnJoinPerLeaf(indexed, "vec_id",
        "embedding", 3, graft.operators.Knn.Dot))
      println(s"JOINCMP diff=${(w.diff(h) ++ h.diff(w)).size} of ${w.size}")
    } else if (args(0) == "expr") {
      val n = args(1).toLong; val k = args(2).toInt
      val v = graft.pipeline.SyntheticCorpus.vectors(spark, n, 32, 25)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      v.count()
      val rnd = new scala.util.Random(7)
      val cents = Seq.fill(k)(Array.fill(32)(rnd.nextDouble() * 100))
      var t0 = System.nanoTime()
      val assigned = v.withColumn("leaf_id",
        graft.operators.IvfIndex.leafExpr(col("embedding"), cents))
      val c = assigned.groupBy("leaf_id").count().count()
      println(f"EXPR k=$k ${(System.nanoTime()-t0)/1e9}%.1f s, leaves=$c")
    } else {
      val n = args(0).toLong; val leaves = args(1).toInt; val maxLeaf = args(2).toInt
      val v = graft.pipeline.SyntheticCorpus.vectors(spark, n, 32, 25)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      v.count()
      var t0 = System.nanoTime()
      val (indexed, m) = graft.operators.IvfIndex.build(v, "vec_id", "embedding",
        numLeaves = leaves, maxLeafSize = maxLeaf, maxFitRows = 20000L)
      val idx = indexed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stored = idx.count()
      println(f"BUILD ${(System.nanoTime()-t0)/1e9}%.1f s, leaves=${m.centroids.length}, stored=$stored")
      val cand = idx.groupBy("leaf_id").count().agg(sum(col("count")*col("count"))).head().getLong(0)
      println(s"CAND_ORDERED $cand")
      t0 = System.nanoTime()
      val c = graft.operators.Knn.knnJoinPerLeaf(idx, "vec_id", "embedding", 3, graft.operators.Knn.Dot).count()
      println(f"JOIN ${(System.nanoTime()-t0)/1e9}%.1f s, out=$c")
    }
    spark.stop()
  }
}
