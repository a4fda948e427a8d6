package graft

import java.nio.file.Files
import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loader-contract pins for the driver-generated tables — above all the
  * events `ts` column, which has shipped in three parquet vintages
  * (TIMESTAMP(MICROS) tz-adjusted, TIMESTAMP(MICROS) NTZ, and
  * TIMESTAMP(NANOS) which resolves as LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`). Round 13 broke all 20
  * events queries because only the vintage that happened to be on disk
  * was ever exercised; this spec writes a tiny table in each vintage
  * and asserts the loader lands every one on the identical
  * (ts timestamp, ts_ns long) contract. */
class TablesSpec extends SparkSpecBase {

  test("events loader: all three ts vintages yield the identical (ts, ts_ns) contract") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_vintage").toString
    // micro-truncated instants (the nanos vintage was micro-truncated
    // at generation, so all vintages carry exact multiples of 1000 ns)
    val micros = Seq(1704112496789012L, 1704198896000001L)
    val instants = micros.map(m =>
      Instant.ofEpochSecond(m / 1000000L, (m % 1000000L) * 1000L))

    // vintage A — tz-adjusted TIMESTAMP(MICROS): Instant encodes as
    // TimestampType; force the micros physical type (Spark's default
    // parquet output is INT96)
    val prevOut = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try instants.zipWithIndex.map { case (i, n) => (n.toLong, i) }
      .toDF("event_id", "ts").write.parquet(s"$root/micros/events.parquet")
    finally prevOut match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }

    // vintage B — TIMESTAMP(MICROS) NTZ (the current testdata): a
    // LocalDateTime encodes as TimestampNTZType, written un-adjusted;
    // the naive value IS the UTC wall clock (the generator convention)
    instants.zipWithIndex.map { case (i, n) =>
      (n.toLong, LocalDateTime.ofInstant(i, ZoneOffset.UTC)) }
      .toDF("event_id", "ts").write.parquet(s"$root/ntz/events.parquet")

    // vintage C — TIMESTAMP(NANOS): Spark cannot WRITE nanos parquet,
    // but under nanosAsLong the nanos column RESOLVES as a plain long
    // of epoch nanos — which is exactly what a long column named ts is,
    // so this exercises the same loader branch the pyarrow vintage hits
    micros.zipWithIndex.map { case (m, n) => (n.toLong, m * 1000L) }
      .toDF("event_id", "ts").write.parquet(s"$root/nanos/events.parquet")

    for (vintage <- Seq("micros", "ntz", "nanos")) {
      val ev = Tables.events(spark, s"$root/$vintage")
      assert(ev.schema("ts").dataType == TimestampType,
        s"$vintage: ts must land as TimestampType")
      assert(ev.schema("ts_ns").dataType == LongType,
        s"$vintage: ts_ns must land as LongType")
      val rows = ev.select("event_id", "ts", "ts_ns").collect()
        .map(r => r.getLong(0) -> (r.getTimestamp(1).toInstant, r.getLong(2))).toMap
      micros.zipWithIndex.foreach { case (m, n) =>
        val (ts, tsNs) = rows(n.toLong)
        assert(tsNs == m * 1000L, s"$vintage row $n: ts_ns $tsNs != ${m * 1000L}")
        assert(ts == instants(n), s"$vintage row $n: ts $ts != ${instants(n)}")
      }
    }
  }

  test("events loader refuses a non-UTC session (the oracle's epoch contract)") {
    // the contract (naive-as-UTC epoch math, UTC date/window grains)
    // silently shifts in any other zone — the loader must fail loudly
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try intercept[IllegalArgumentException] {
      Tables.events(spark, "/root/testdata/sf0.001")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
