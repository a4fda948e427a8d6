package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.FileSourceScanExec

/** Scan-parallelism guard shared by the CPU-heavy per-document
  * operators (text stats, shingle/simhash builds).
  *
  * The local test parquet arrives as one unsplittable row group per
  * file, so a narrow regex/hash-heavy pass would run almost
  * single-threaded; spreading it costs one exchange of the (tiny)
  * test input. At 100 TB the scan is already thousands of splits, so
  * the guard detects healthy parallelism and passes the plan through
  * untouched — full document text never transits an exchange at
  * scale. The 2x margin means "fewer than half the cores would have
  * work": that is the degenerate case worth one small shuffle.
  */
object Scans {

  /** Input-split count read off the compiled physical plan's leaf file
    * scans — planning-time only (FileScanRDD partitioning is pure
    * file-split arithmetic; no job runs). None when some leaf is not a
    * file scan (e.g. an in-memory spec relation), where the split
    * heuristic does not apply.
    */
  private def fileSplits(df: DataFrame): Option[Int] = {
    val leaves = df.queryExecution.sparkPlan.collectLeaves()
    val scans = leaves.collect { case f: FileSourceScanExec => f }
    if (scans.nonEmpty && scans.size == leaves.size)
      Some(scans.map(_.inputRDD.getNumPartitions).sum)
    else None
  }

  def spreadIfNarrow(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    fileSplits(df) match {
      case Some(n) if n * 2 <= target => df.repartition(key)
      case Some(_)                    => df
      // Non-file input (in-memory spec data): tiny by construction, and
      // converting a general plan to an RDD to count partitions would
      // eagerly run its shuffle stages under AQE — pass through.
      case None                       => df
    }
  }
}
