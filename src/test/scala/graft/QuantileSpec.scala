package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Analytics

/** The histogram-pruned exact-quantile operator must equal the naive
  * single-window formulation row-for-row — same selection rule the DuckDB
  * oracle states, pinned here in-process at a different scale factor than
  * the driver's gate (and against Spark's own window machinery rather than
  * a second engine). */
class QuantileSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("events_quantiles equals the naive window selection") {
    val e = graft.core.Tables.loadEvents(spark, dir)
      .select(col("event_type"), col("value"), col("event_id"))
    val byKey = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    val naive = e
      .withColumn("rn", row_number().over(byKey))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(
        max(when(col("rn") === floor((col("n") - 1) * lit(0.5)) + 1, col("value"))).as("p50"),
        max(when(col("rn") === floor((col("n") - 1) * lit(0.9)) + 1, col("value"))).as("p90"),
        max(when(col("rn") === floor((col("n") - 1) * lit(0.99)) + 1, col("value"))).as("p99"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    val fast = Analytics.eventsQuantiles(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(fast == naive)
  }
}
