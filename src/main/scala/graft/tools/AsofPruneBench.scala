package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType, TimestampType}

/** As-of row-group pruning bench (BASELINE.md r18): builds the sf10
  * satellite (one SCD2 version row per scaled-lineitem row, load_dts =
  * l_shipdate — seven years of history), compacts it UNSORTED (the pre-r18
  * rewrite: hash-chunk placement randomizes row order, so every row group's
  * (hk, load_dts) min/max spans the whole bucket and parquet stats prune
  * nothing), then compacts it SORTED by (hk, load_dts) (the r18
  * `Graft.compact` satellite default) and measures what each layout lets
  * the scans SKIP:
  *
  *  - point PIT lookups (bucket-pruned `lookupBucketed` + `load_dts <=`
  *    cutoff, 16 keys): rows DECODED by the scan (the scan node's
  *    numOutputRows — parquet row-group/page stats filtering happens below
  *    it) and wall seconds. Unsorted, a key appears "anywhere" in its
  *    bucket, so every row group must decode; sorted, the key's history is
  *    one contiguous run.
  *  - the full as-of snapshot (`load_dts <=` mid-history cutoff + latest
  *    row per hk): wall seconds — every hk is needed, so pruning can't
  *    shrink it; this row guards against the sort REGRESSING the scan.
  *
  * Parquet row groups are held at 8 MiB (vs the 128 MiB default) so the
  * scaled-down bucket (~50 MB compressed) carries the SAME row-groups-per-
  * file ratio a production 1 GiB file has with default blocks — the
  * pruning geometry under test, at bench scale. Prints one JSON line.
  */
object AsofPruneBench {
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
      .config("spark.hadoop.parquet.block.size", (8L << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = sys.props("java.io.tmpdir").stripSuffix("/") +
      s"/graft_asof_prune_${java.lang.Long.toHexString(System.nanoTime())}"
    val lake = new graft.core.Lake(spark, root, buckets)

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
    val nRows = lake.read("dv", "sat").count()
    val tBuild = (System.nanoTime() - t0) / 1e9

    // 16 concrete keys + a cutoff that splits the shipdate history
    val keys = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_orderkey") % 100000 === 1)
      .select(md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))).as("k"))
      .limit(16).collect().map(_.getString(0)).toSeq
    val cutoff = "1995-06-17 00:00:00"

    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _ => p.children.flatMap(walk)
    })
    /** (rows decoded by the scans, files read, wall s, result rows).
      * Executes THIS DataFrame's physical plan (count() would plan a
      * separate query whose metrics the walk below can't see) — the
      * underlying RDD count is the same action without a collect. */
    def measure(mk: => DataFrame): (Long, Long, Double, Long) = {
      val t = System.nanoTime()
      val df = mk
      val out = df.queryExecution.toRdd.count()
      var decoded = 0L; var files = 0L
      walk(df.queryExecution.executedPlan).collect { case s: FileSourceScanExec => s }
        .foreach { s => decoded += s.metrics("numOutputRows").value; files += s.metrics("numFiles").value }
      (decoded, files, (System.nanoTime() - t) / 1e9, out)
    }

    def pointLookups(): (Long, Long, Double, Long) =
      keys.map { k =>
        measure(lake.lookupBucketed("dv", "sat", "customer_hk", k)
          .filter(col("load_dts") <= lit(cutoff).cast("timestamp")))
      }.reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))

    val satSchema = StructType(Seq(
      StructField("customer_hk", StringType), StructField("load_dts", TimestampType),
      StructField("del_flag", BooleanType), StructField("hash_diff", StringType),
      StructField("record_source", StringType), StructField("run_id", LongType),
      StructField("payload", StringType)))
    def fullAsof(): (Long, Long, Double, Long) =
      measure(graft.dv.DvOps.asOfRows(
        lake.readOr("dv", "sat", satSchema), "customer_hk",
        lit(cutoff).cast("timestamp")))

    def ms3(d: Double) = Math.round(d * 1000) / 1000.0
    def row(tag: String): String = {
      // warm codegen/readers/page cache once per layout, then measure
      pointLookups(); val p = pointLookups()
      fullAsof(); val f = fullAsof()
      s""""${tag}":{"point_decoded_rows":${p._1},"point_files":${p._2},"point_sec":${ms3(p._3)},"point_result_rows":${p._4},""" +
        s""""asof_sec":${ms3(f._3)},"asof_rows":${f._4}}"""
    }

    val tC1 = System.nanoTime()
    lake.compact("dv", "sat") // unsorted rewrite (pre-r18 ordering)
    val tCompactUnsorted = (System.nanoTime() - tC1) / 1e9
    val unsorted = row("unsorted")

    val tC2 = System.nanoTime()
    lake.compact("dv", "sat", sortBy = Seq("customer_hk", "load_dts"))
    val tCompactSorted = (System.nanoTime() - tC2) / 1e9
    val sorted = row("sorted")

    val line =
      s"""{"bench":"asof_prune","sf_dir":"$sfDir","rows":$nRows,"buckets":$buckets,""" +
        s""""build_sec":${ms3(tBuild)},"compact_unsorted_sec":${ms3(tCompactUnsorted)},""" +
        s""""compact_sorted_sec":${ms3(tCompactSorted)},"point_keys":${keys.size},$unsorted,$sorted}"""
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench/r18_asof_prune.json"), line + "\n")
    catch { case e: Exception => System.err.println(s"[bench] sidecar write failed: $e") }
    spark.stop()
  }
}
