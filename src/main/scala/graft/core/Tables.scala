package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the TPC-H-ish test layout: `{dir}/{name}.parquet`. */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
