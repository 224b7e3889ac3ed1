package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Joins

/** Skew-join validation bench (BASELINE.md): joins a deliberately skewed
  * probe (50% of lineitem rows remapped to ONE hot orderkey, deterministic)
  * against a medium orders slice, three ways:
  *
  *   1. plain shuffle join, AQE ON  — AQE's skewedJoin should split the hot
  *      partition at runtime;
  *   2. plain shuffle join, AQE OFF — the unmitigated baseline: one task
  *      owns the hot key;
  *   3. [[graft.functions.Joins.saltedJoin]] (factor 8), AQE OFF — the
  *      explicit mitigation for engines/paths where AQE can't help.
  *
  * Broadcast is disabled throughout — at real scale the build side doesn't
  * broadcast; that's exactly when skew hurts. Prints one JSON line.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // See Bench: route >64-bucket exchanges through the sort writer
      // (bypass applies when numPartitions <= threshold).
      .config("spark.shuffle.sort.bypassMergeThreshold", "64")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hotKey = 1L
    // Half the probe rows land on one orderkey — deterministic, no rand().
    def probe: DataFrame = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_linenumber"))
      .withColumn(
        "l_orderkey",
        when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(10)) < 5, lit(hotKey))
          .otherwise(col("l_orderkey")))
    // Medium build side (~1% of orders, hot key included) — the saltedJoin
    // cost model: too big to broadcast comfortably, cheap to replicate ×8.
    def build: DataFrame = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderkey") % 100 === 1)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))

    def time(label: String, aqe: Boolean)(mk: => DataFrame): (String, Double) = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      label -> (System.nanoTime() - t0) / 1e9
    }

    // warmup scan
    probe.write.format("noop").mode("overwrite").save()
    build.write.format("noop").mode("overwrite").save()

    val results = Seq(
      time("plain_aqe", aqe = true)(probe.join(build, "l_orderkey")),
      time("plain_noaqe", aqe = false)(probe.join(build, "l_orderkey")),
      time("salted_noaqe", aqe = false)(Joins.saltedJoin(probe, build, Seq("l_orderkey"), 8)),
      // AQE skew splitting only fires above skewedPartitionThresholdInBytes
      // (256 MB default — sized for real clusters). Scale the thresholds to
      // this dataset to demonstrate the runtime split engaging, as it would
      // untouched at 100 TB partition sizes.
      {
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
        val r = time("plain_aqe_scaled_thresholds", aqe = true)(probe.join(build, "l_orderkey"))
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
        r
      }
    )
    val js = results.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"bench":"skew_join","hot_frac":0.5,"salt_factor":8,$js,"sf":"$sfDir"}""")
    spark.stop()
  }
}
