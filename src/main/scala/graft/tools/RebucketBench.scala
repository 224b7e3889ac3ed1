package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Rebucket payoff bench (BASELINE.md "rebucket", r19): the bucket span is
  * the unit of incremental-probe cost, so a vault that outgrew its birth
  * bucket count pays 1/birthCount of the TABLE per probed bucket forever —
  * `Lake.rebucket` exists to re-derive the layout as data grows. This
  * bench builds a satellite at a SMALL count (the "born at 8 buckets"
  * vault), runs the bucket-pruned satellite DELTA probe for a one-bucket
  * staged micro-batch (files read + wall), then `rebucket`s to a larger
  * count and re-runs the SAME probe: the pruned scan should shrink from
  * 1/small to 1/large of the table. Also sanity-checks row counts across
  * the rewrite. Prints one JSON line. */
object RebucketBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val small = sys.env.getOrElse("SPARK_GRAFT_BUCKETS_SMALL", "8").toInt
    val big = sys.env.getOrElse("SPARK_GRAFT_BUCKETS_BIG", "64").toInt
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
      s"/graft_rebucket_${java.lang.Long.toHexString(System.nanoTime())}"
    val lake = new graft.core.Lake(spark, root, small)
    val t0 = System.nanoTime()
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
    val rowsBefore = lake.read("dv", "sat").count()

    // a micro-batch confined to ONE bucket at the BIG count — by bucket
    // arithmetic it also lands in one bucket at the small count, so the
    // probe spans a single bucket in both layouts and the measured delta
    // is purely that bucket's share of the table (1/small vs 1/big)
    val staged = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))).as("customer_hk"),
        md5(concat_ws("|", col("l_partkey"), col("l_quantity") + 1)).as("hd"),
        concat_ws("_", col("l_returnflag"), col("l_partkey")).as("payload"))
      .filter(pmod(xxhash64(col("customer_hk")), lit(big.toLong)) === 0L)
      .limit(4000)
      .cache()
    val nStaged = staged.count()

    val schema = StructType(Seq(
      StructField("customer_hk", StringType), StructField("load_dts", org.apache.spark.sql.types.TimestampType),
      StructField("del_flag", org.apache.spark.sql.types.BooleanType), StructField("hash_diff", StringType),
      StructField("record_source", StringType), StructField("run_id", org.apache.spark.sql.types.LongType),
      StructField("payload", StringType)))
    val ctx = graft.dv.LoadContext(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "src", 99L)
    def deltaRows(existing: org.apache.spark.sql.DataFrame): Unit =
      graft.dv.DvOps.satNewRows(staged, existing, "customer_hk", "hd",
        Seq("payload" -> "payload"), "customer_hk", ctx)
        .write.format("noop").mode("overwrite").save()
    def time(body: => Unit): Double = {
      val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
    }
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    // a bucket is ~one file in both layouts, so the probe's FILE count is 1
    // either way — the payoff is that file's SIZE (1/small vs 1/big of the
    // table). Size the files the EXECUTED scan touched (input_file_name
    // reflects partition pruning; DataFrame.inputFiles does NOT — it lists
    // the relation's whole unpruned file index).
    def bytesRead(df: org.apache.spark.sql.DataFrame): Long = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      df.select(input_file_name()).distinct().collect().map(_.getString(0))
        .map(f => fs.getFileStatus(
          new org.apache.hadoop.fs.Path(f.stripPrefix("file:"))).getLen).sum
    }

    spark.conf.set(graft.core.Confs.ProbePruneMinBytesKey, "0")
    val prunedSmall = lake.readOrProbe("dv", "sat", schema, staged, col("customer_hk"))
    val tSmall = time(deltaRows(prunedSmall))
    val tSmall2 = time(deltaRows(
      lake.readOrProbe("dv", "sat", schema, staged, col("customer_hk"))))
    val filesSmall = filesRead(prunedSmall)

    val tReb0 = System.nanoTime()
    val (fb, fa) = lake.rebucket("dv", "sat", big, sortBy = Seq("customer_hk", "load_dts"))
    val tRebucket = (System.nanoTime() - tReb0) / 1e9
    val rowsAfter = lake.read("dv", "sat").count()

    val prunedBig = lake.readOrProbe("dv", "sat", schema, staged, col("customer_hk"))
    val tBig = time(deltaRows(prunedBig))
    val tBig2 = time(deltaRows(
      lake.readOrProbe("dv", "sat", schema, staged, col("customer_hk"))))
    val filesBig = filesRead(prunedBig)

    println(s"""{"bench":"rebucket","buckets_small":$small,"buckets_big":$big,""" +
      s""""staged_rows":$nStaged,"build_s":${f"$tBuild%.1f"},"rebucket_s":${f"$tRebucket%.1f"},""" +
      s""""rows_before":$rowsBefore,"rows_after":$rowsAfter,"files_gen":[$fb,$fa],""" +
      s""""files_probe_small":$filesSmall,"files_probe_big":$filesBig,""" +
      s""""mb_probe_small":${bytesRead(prunedSmall) >> 20},"mb_probe_big":${bytesRead(prunedBig) >> 20},""" +
      s""""delta_small_s":[${f"$tSmall%.2f"},${f"$tSmall2%.2f"}],"delta_big_s":[${f"$tBig%.2f"},${f"$tBig2%.2f"}],""" +
      s""""sf":"$sfDir"}""")
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    spark.stop()
  }
}
