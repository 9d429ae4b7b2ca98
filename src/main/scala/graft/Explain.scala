package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Plan inspector: prints the formatted physical plan of the named
  * queries (or all headlines) so pushdown/broadcast/codegen can be
  * audited. Usage: Explain [sfDir] [query names...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.tail.toSeq else Registry.headlines.map(_.name)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Registry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
