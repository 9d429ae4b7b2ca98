package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame

/** Partition-column data layout (SURVEY §1.3). The reference stores the
  * forecast as one object per lead time — 30 separate files fanned out by
  * a partition key (partitions.py:20-53, discharge.py:198-207) — and its
  * jobs open only the lead times they need. The Spark-native image of
  * that layout is a hive-partitioned directory: the partition column
  * lives in directory names (never in row payloads), and a predicate on
  * it prunes at FILE LISTING time (`PartitionFilters`), before a single
  * byte of parquet is opened. At 100 TB this is the difference between
  * touching 3/30ths of the data and scanning all of it to filter.
  */
object Layout {

  private val written = ConcurrentHashMap.newKeySet[String]()

  /** Write `df` hive-partitioned by `cols` under `path` (idempotent —
    * once per JVM per path), then return a fresh reader over the layout
    * so downstream predicates on `cols` become partition filters.
    */
  def partitionedView(df: DataFrame, path: String, cols: String*): DataFrame = {
    if (written.add(path))
      df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Content fingerprint of `df`'s SOURCE: the sorted (path, size,
    * mtime) list of its input files — a snapshot id that changes
    * whenever the backing data is rewritten, with no Spark job. Falls
    * back to a row count for in-memory frames (no input files).
    */
  private def fingerprint(df: DataFrame): String = {
    val files = df.inputFiles.sorted
    if (files.isEmpty) s"rows:${df.count()}"
    else {
      val fsconf = df.sparkSession.sparkContext.hadoopConfiguration
      val parts = files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(fsconf).getFileStatus(p)
        s"$f:${st.getLen}:${st.getModificationTime}"
      }
      java.security.MessageDigest.getInstance("MD5")
        .digest(parts.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
  }

  /** Persist `df` as a BUCKETED (and bucket-sorted) catalog table at an
    * explicit external `path` (idempotent — once per JVM per table name),
    * and return it. Two tables bucketed the same way on their join key
    * co-locate: the join needs NO shuffle and (being sortBy'd) no sort —
    * the 100 TB answer to repeated large-fact joins, where a partition
    * column is too coarse and a per-query repartition pays the shuffle
    * every time. PlanSpec pins the exchange-free plan.
    *
    * Staleness guard: a table left in the persistent warehouse by a
    * PREVIOUS JVM is reused only if the sidecar fingerprint under `path`
    * matches the current source snapshot (input file paths + sizes +
    * mtimes); on mismatch the table is dropped and rewritten, so changed
    * source data under the same table name can never serve stale rows.
    */
  def bucketedTable(df: DataFrame, table: String, path: String,
      nBuckets: Int, keyCol: String): DataFrame = {
    val s = df.sparkSession
    if (written.add(s"table:$table")) {
      val fp = fingerprint(df)
      val hp = new org.apache.hadoop.fs.Path(s"$path/_graft_fingerprint")
      val hfs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val fresh = s.catalog.tableExists(table) && hfs.exists(hp) && {
        val in = hfs.open(hp)
        try new String(in.readAllBytes(), "UTF-8") == fp
        finally in.close()
      }
      if (!fresh) {
        s.sql(s"DROP TABLE IF EXISTS $table")
        df.write.mode("overwrite")
          .bucketBy(nBuckets, keyCol).sortBy(keyCol)
          .option("path", path)
          .saveAsTable(table)
        val out = hfs.create(hp, true)
        try out.write(fp.getBytes("UTF-8")) finally out.close()
      }
    }
    s.table(table)
  }
}
