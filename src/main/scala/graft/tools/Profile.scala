package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main for bench outlier analysis (not part of the
  * library surface; driven manually while tuning). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
    // Mirror Bench's AQE exchange sizing when asked, to reproduce bench
    // behavior exactly (SPARK_GRAFT_INIT_PARTS=512 etc.).
    sys.env.get("SPARK_GRAFT_INIT_PARTS").foreach { n =>
      builder.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f; println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count()
      .write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      t(s"$name run1") { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      t(s"$name run2") { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      if (sys.env.contains("PROF_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
