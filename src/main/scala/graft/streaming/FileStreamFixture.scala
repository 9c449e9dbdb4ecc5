package graft.streaming

import org.apache.spark.sql.DataFrame

/** Writes a sequence of DataFrames as ordered single-file micro-batches
  * for a file-source Structured Stream: each batch becomes exactly one
  * parquet file, named and mtime-stamped in order so
  * `maxFilesPerTrigger=1` replays them as deterministic, time-ordered
  * micro-batches. The stream dir is wiped first so reruns see exactly
  * the intended batch sequence.
  */
object FileStreamFixture {

  /** Create (or reset) `tag`'s fixture for sf dir `d`; returns the
    * stream directory to `readStream` from.
    */
  def write(tag: String, d: String, batches: Seq[DataFrame]): String = {
    val base = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_${tag}_" + java.lang.Integer.toHexString(d.hashCode))
    val streamDir = base.resolve("stream")
    if (java.nio.file.Files.exists(streamDir)) {
      java.nio.file.Files.list(streamDir).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .foreach(p => java.nio.file.Files.delete(p))
    }
    java.nio.file.Files.createDirectories(streamDir)
    val now = System.currentTimeMillis()
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = base.resolve(s"b$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dest = streamDir.resolve(f"$i%02d-batch.parquet")
      java.nio.file.Files.copy(part, dest,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(
          now - 60000L * (batches.length - i)))
      ()
    }
    streamDir.toString
  }
}
