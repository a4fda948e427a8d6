package graft

import org.apache.spark.sql.{Column, DataFrame}

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
  def spreadIfNarrow(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // planning-time only: builds the physical scan to count its input
    // splits, reads no data
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(key) else df
  }
}
