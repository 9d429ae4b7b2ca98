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

  def delete(spark: SparkSession, path: String, recursive: Boolean = true): Boolean =
    fs(spark, path).delete(new Path(path), recursive)
}
