package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Probe-prune validation bench (BASELINE.md "bucket-pruned probes"):
  * builds a large bucketed satellite from the scaled lineitem (one version
  * row per lineitem row, hk = md5 of the natural key), then runs the
  * satellite DELTA load probe for a SMALL staged batch two ways — full
  * vault scan (`Lake.readOr`, the pre-r16 shape) vs bucket-pruned
  * (`Lake.readOrProbe`, gate forced open) — and prints wall seconds plus
  * the file counts each scan touched. The staged batch is a realistic
  * micro-batch: a few thousand keys spanning a handful of buckets.
  * Prints one JSON line. */
object ProbePruneBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "64").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.shuffle.sort.bypassMergeThreshold", "64")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = sys.props("java.io.tmpdir").stripSuffix("/") +
      s"/graft_probe_prune_${java.lang.Long.toHexString(System.nanoTime())}"
    val lake = new graft.core.Lake(spark, root, buckets)
    val t0 = System.nanoTime()
    // one SCD2 version row per lineitem row; hk uniform by construction
    val sat = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))).as("customer_hk"),
        col("l_shipdate").cast("timestamp").as("load_dts"),
        lit(false).as("del_flag"),
        md5(concat_ws("|", col("l_partkey"), col("l_quantity"))).as("hash_diff"),
        lit("src").as("record_source"),
        col("l_linenumber").cast("long").as("run_id"),
        concat_ws("_", col("l_returnflag"), col("l_partkey")).as("payload"))
    lake.appendBucketed(sat, "dv", "sat", "customer_hk")
    val tBuild = (System.nanoTime() - t0) / 1e9

    // a micro-batch: ~4k staged keys drawn from TWO buckets' key space
    val staged = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))).as("customer_hk"),
        md5(concat_ws("|", col("l_partkey"), col("l_quantity") + 1)).as("hd"),
        concat_ws("_", col("l_returnflag"), col("l_partkey")).as("payload"))
      .filter(pmod(xxhash64(col("customer_hk")), lit(buckets.toLong)).isin(0L, 1L))
      .limit(4000)
      .cache()
    val nStaged = staged.count()

    val schema = StructType(Seq(
      StructField("customer_hk", StringType), StructField("load_dts", org.apache.spark.sql.types.TimestampType),
      StructField("del_flag", org.apache.spark.sql.types.BooleanType), StructField("hash_diff", StringType),
      StructField("record_source", StringType), StructField("run_id", org.apache.spark.sql.types.LongType),
      StructField("payload", StringType)))
    val ctx = graft.dv.LoadContext(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "src", 99L)
    def deltaRows(existing: org.apache.spark.sql.DataFrame): Long = {
      graft.dv.DvOps.satNewRows(staged, existing, "customer_hk", "hd",
        Seq("payload" -> "payload"), "customer_hk", ctx)
        .write.format("noop").mode("overwrite").save()
      0L
    }
    def time(body: => Unit): Double = {
      val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
    }
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()

    // warm both paths' codegen once off a tiny slice, then measure
    val fullScan = lake.readOr("dv", "sat", schema)
    val tFull = time(deltaRows(fullScan))
    spark.conf.set(graft.core.Confs.ProbePruneMinBytesKey, "0")
    val prunedScan = lake.readOrProbe("dv", "sat", schema, staged, col("customer_hk"))
    val tPruned = time(deltaRows(prunedScan))
    val tFull2 = time(deltaRows(lake.readOr("dv", "sat", schema)))    // order control
    val tPruned2 = time(deltaRows(lake.readOrProbe("dv", "sat", schema, staged, col("customer_hk"))))
    println(s"""{"bench":"probe_prune","buckets":$buckets,"staged_rows":$nStaged,""" +
      s""""build_s":${f"$tBuild%.1f"},"files_full":${filesRead(fullScan)},"files_pruned":${filesRead(prunedScan)},""" +
      s""""delta_full_s":[${f"$tFull%.2f"},${f"$tFull2%.2f"}],"delta_pruned_s":[${f"$tPruned%.2f"},${f"$tPruned2%.2f"}],""" +
      s""""sf":"$sfDir"}""")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
