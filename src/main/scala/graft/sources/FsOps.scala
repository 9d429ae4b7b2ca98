package graft.sources

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Object-store/file utilities (S10; io_managers.py:71-91 copy/glob/
  * delete) on the Hadoop FileSystem API — the same calls work against
  * file://, hdfs:// or s3a:// at cluster scale.
  */
object FsOps {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** Glob file paths (star patterns, e.g. dir slash star-dot-parquet). */
  def glob(spark: SparkSession, pattern: String): Seq[String] = {
    val f = fs(spark, pattern)
    Option(f.globStatus(new Path(pattern))).toSeq.flatten
      .map(_.getPath.toString)
  }

  def copy(spark: SparkSession, src: String, dst: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    FileUtil.copy(fs(spark, src), new Path(src),
      fs(spark, dst), new Path(dst), false, true, conf)
  }

  /** Compact a parquet directory's small files into ~targetBytes
    * outputs — the operational hygiene pass streaming/append sinks need
    * at scale (every micro-batch leaves part files; listing cost and
    * task overhead grow with file COUNT, not data size). Rewrites into
    * a sibling staging dir with the partition count sized from actual
    * bytes, then atomically swaps via two renames; the original is
    * removed only after the swap, so readers never observe a partial
    * directory. Content is preserved exactly (row-level equality; order
    * inside files may change, as parquet never guaranteed it anyway).
    * Returns (filesBefore, filesAfter).
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val f = fs(spark, dir)
    val listing = f.listStatus(new Path(dir))
    // flat directories only: on a hive-partitioned layout the data lives
    // in key=value subdirectories — a naive rewrite would flatten the
    // partition columns into data columns, silently destroying the layout
    // and every downstream pruning opportunity. Fail loudly instead.
    val subdirs = listing.filter(s => s.isDirectory &&
      s.getPath.getName != "_temporary")
    require(subdirs.isEmpty,
      s"compactParquet: $dir contains subdirectories " +
        s"(${subdirs.map(_.getPath.getName).mkString(", ")}) — " +
        "hive-partitioned layouts must be compacted per leaf directory")
    val parts = listing
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val staging = new Path(dir + "_compact_staging")
    val old = new Path(dir + "_compact_old")
    f.delete(staging, true); f.delete(old, true)
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(staging.toString)
    require(f.rename(new Path(dir), old), s"compact: cannot stage out $dir")
    require(f.rename(staging, new Path(dir)),
      s"compact: cannot swap in $staging (original preserved at $old)")
    f.delete(old, true)
    val after = f.listStatus(new Path(dir))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }

  def delete(spark: SparkSession, path: String, recursive: Boolean = true): Boolean =
    fs(spark, path).delete(new Path(path), recursive)
}
