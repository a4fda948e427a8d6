package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed external tables; the
  * loaders keep a single entry point so a production deployment swaps
  * `spark.read.parquet(dir)` for a catalog lookup without touching any
  * operator code.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** The events table carries TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader rejects. Read nanos as raw long (`ts_ns`, the
    * exact sort key — full nanosecond precision, matching the oracle's
    * ORDER BY ts) and surface `ts` as a microsecond-truncated proper
    * timestamp for window/date functions.
    * `spark.sql.legacy.parquet.nanosAsLong` is expected from the
    * session builder (GraftSession / Verify / Bench / specs) — setting
    * it here as a loader side effect would silently change how OTHER
    * readers in the same session see nanos columns. */
  def events(s: SparkSession, d: String): DataFrame = {
    // fail fast with an actionable message instead of the cryptic
    // "Illegal Parquet type" an unconfigured external session would hit
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "Tables.events needs spark.sql.legacy.parquet.nanosAsLong=true in the session " +
        "builder (GraftSession.create sets it) — the events table carries TIMESTAMP(NANOS)")
    load(s, d, "events")
      .withColumn("ts_ns", col("ts").cast("long"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
