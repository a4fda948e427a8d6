package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sink_agg_view — an INCREMENTALLY MAINTAINED aggregate view over a
  * [[VersionedTable]]: per group the row count and cents-exact value
  * sum, kept in sync with the source by applying only the CHANGE FEED
  * of versions since the last refresh, never rescanning the source.
  * Every change row contributes ± deltas: an insert adds (+1, +cents)
  * at its group, a delete subtracts at its old group, and an update
  * subtracts at the BEFORE row's group and adds at the AFTER row's —
  * so rows migrating between groups (the case a naive "update in
  * place" maintainer corrupts) stay exact.
  *
  * Why this is a first-class 100 TB component: a full recompute of a
  * key-grain aggregate over a 100 TB table costs the table, every
  * time; the incremental refresh costs the MERGE-TOUCHED SLICE
  * (changesBetween reads only files the synced..tip versions rewrote)
  * plus a view merge that rewrites only files holding touched groups.
  * A daily-upsert table maintains its views at delta cost.
  *
  * Exactly-once: every view commit carries a [[VersionedTable.lastTxn]]
  * stamp naming the source version it consumed — the Delta
  * SetTransaction recipe — and the stamp rides the SAME atomic commit
  * as the delta application. A crashed refresh either committed (stamp
  * says tip; the re-run is a no-op) or didn't (stamp says the old
  * version; the re-run re-derives the identical delta).
  * Double-application cannot happen.
  *
  * Caveats: the source's log entries for (synced, tip] must still be
  * retained (vacuum less aggressively than you refresh); groups whose
  * count reaches zero are DELETED from the view in the same commit
  * (merge's delete side) — the view never carries tombstones. */
object AggView {

  private def appId(sourcePath: String) = s"graft-aggview:$sourcePath"

  // NULL values contribute 0 cents on BOTH the build and delta paths
  // (a bare sum would skip them at build time but poison a delta group
  // whose every contribution is null — the two sides must agree)
  private def centsOf(c: Column): Column =
    coalesce(round(c * 100).cast("long"), lit(0L))

  private def aggregate(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(centsOf(col(valueCol))).as("sum_cents"))

  /** Full build at the source tip; stamps the consumed source version. */
  def create(spark: SparkSession, sourcePath: String, viewPath: String,
             groupCols: Seq[String], valueCol: String): Long = {
    require(groupCols.nonEmpty, "AggView.create: need at least one group column")
    val srcV = VersionedTable.latestVersion(sourcePath).getOrElse(
      throw new IllegalArgumentException(s"$sourcePath is not a versioned table"))
    val snap = VersionedTable.read(spark, sourcePath, asOf = Some(srcV))
    VersionedTable.create(aggregate(snap, groupCols, valueCol), viewPath,
      txn = Some((appId(sourcePath), srcV)))
  }

  /** Apply the source change feed since the last stamped version in one
    * merge commit. `sourceKeys` is the SOURCE's row identity (what
    * changesBetween classifies on); `groupCols` the view's grain —
    * they are independent, and updates may move rows between groups. */
  def refresh(spark: SparkSession, sourcePath: String, viewPath: String,
              sourceKeys: Seq[String], groupCols: Seq[String],
              valueCol: String): Long = {
    val srcTip = VersionedTable.latestVersion(sourcePath).getOrElse(
      throw new IllegalArgumentException(s"$sourcePath is not a versioned table"))
    val viewTip = VersionedTable.latestVersion(viewPath).getOrElse(
      throw new IllegalArgumentException(s"$viewPath is not a versioned table"))
    val synced = VersionedTable.lastTxn(viewPath, appId(sourcePath)).getOrElse(
      throw new IllegalStateException(
        s"$viewPath carries no sync stamp for $sourcePath — not an AggView " +
          "of this source, or its stamped commits were vacuumed"))
    if (synced >= srcTip) return viewTip // already current: replay no-op
    val delta = VersionedTable.changesBetween(spark, sourcePath, sourceKeys, synced, srcTip)
    def side(struct: String, types: Seq[String], sign: Int): DataFrame =
      delta.filter(col("change_type").isin(types: _*))
        .select(groupCols.map(g => col(struct).getField(g).as(g)) :+
          lit(sign.toLong).as("_dn") :+
          (centsOf(col(struct).getField(valueCol)) * sign).as("_ds"): _*)
    val d = side("_before", Seq("delete", "update"), -1)
      .unionByName(side("_after", Seq("insert", "update"), 1))
      .groupBy(groupCols.map(col): _*)
      .agg(sum("_dn").as("_dn"), sum("_ds").as("_ds"))
    val view = VersionedTable.read(spark, viewPath, asOf = Some(viewTip))
    val touched = d.join(view, groupCols, "left")
      .select(groupCols.map(col) :+
        (coalesce(col("n_rows"), lit(0L)) + col("_dn")).as("n_rows") :+
        (coalesce(col("sum_cents"), lit(0L)) + col("_ds")).as("sum_cents"): _*)
    VersionedTable.merge(spark, viewPath, groupCols,
      updates = touched.filter(col("n_rows") > 0),
      deleteKeys = touched.filter(col("n_rows") <= 0).select(groupCols.map(col): _*),
      txn = Some((appId(sourcePath), srcTip)))
  }

  /** The maintained view as of its tip (an ordinary versioned read). */
  def read(spark: SparkSession, viewPath: String): DataFrame =
    VersionedTable.read(spark, viewPath)

  /** The oracle twin: what the view MUST equal — the full recompute on
    * the source tip. Spec-pinned identical after every refresh. */
  def recompute(spark: SparkSession, sourcePath: String,
                groupCols: Seq[String], valueCol: String): DataFrame =
    aggregate(VersionedTable.read(spark, sourcePath), groupCols, valueCol)
}
