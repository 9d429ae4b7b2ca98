package graft.operators

import org.apache.spark.sql.Dataset

/** Work-item fan-out: the Spark mapping of the reference's Dask task
  * fan-out (`client.submit` per tile, dask_resource.py:34-38, driven by
  * the sentinel GPU upscaling pipeline, upscaling.py:16-61). A table of
  * item identifiers is repartitioned to the desired parallelism and each
  * item handed to an arbitrary task body (an external binary or GPU call
  * in the reference). Failures are captured per item instead of failing
  * the job — the reference retries at the op level (jobs.py:9-11), which
  * maps to re-running the failed subset of this table.
  */
object WorkItems {

  final case class ItemResult(
      item: String, ok: Boolean, outcome: String, error: String)

  def fanOut(items: Dataset[String], parallelism: Int)(
      body: String => String): Dataset[ItemResult] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.repartition(parallelism).mapPartitions { it =>
      it.map { item =>
        try ItemResult(item, ok = true, body(item), "")
        catch {
          // NonFatal only: OutOfMemoryError and Spark's task-control
          // throwables (TaskKilledException, InterruptedException) must
          // propagate or cancellation/speculation breaks and fatal
          // executor state gets masked as a 'failed item' row.
          case e: InterruptedException =>
            Thread.currentThread().interrupt(); throw e
          case scala.util.control.NonFatal(e) =>
            ItemResult(item, ok = false, "", String.valueOf(e.getMessage))
        }
      }
    }
  }
}
