package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** sf10 stress of the rebucket + retention machinery (r19 verdict #3):
  * a 60M-row satellite built at 16 buckets, rebucketed to 128 under a
  * bounded heap (`SPARK_DRIVER_MEM`, the verdict's 16 GiB cap), with
  *
  *  1. a CONCURRENT READER whose plan resolved before the rebucket and
  *     completes during/after it (retention keeps its files),
  *  2. a rebucket attempt with a flow-style append landing mid-stage —
  *     must abort with the typed Concurrency error from the commit-time
  *     source-unchanged guard, leaving the table untouched,
  *  3. the clean rebucket — row-count-preserving, layout re-recorded,
  *     one-bucket probe bytes shrinking by ~big/small,
  *  4. policy expire (`spark.graft.gen.retainMillis=0`) reclaiming
  *     EXACTLY the superseded root data on the next append.
  *
  * Prints one JSON line (and exits 1 on any violated expectation) —
  * captured as `bench/r20_rebucket_sf10.json`. The small-scale spec twins
  * of each step live in LakeLayoutSpec. */
object RebucketStress {
  private def fail(msg: String): Nothing = {
    System.err.println(s"[rebucket-stress] FAIL: $msg"); sys.exit(1)
  }
  private def check(cond: Boolean, msg: => String): Unit = if (!cond) fail(msg)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val small = sys.env.getOrElse("SPARK_GRAFT_BUCKETS_SMALL", "16").toInt
    val big = sys.env.getOrElse("SPARK_GRAFT_BUCKETS_BIG", "128").toInt
    // the one-bucket staged-batch premise (below) needs small | big: a key
    // with hash mod big == 0 lands in ONE small-count bucket only then
    check(big % small == 0, s"BUCKETS_SMALL=$small must divide BUCKETS_BIG=$big")
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
      s"/graft_rebucket_stress_${java.lang.Long.toHexString(System.nanoTime())}"
    val lake = new graft.core.Lake(spark, root, small)

    // ── build: a full-history satellite from sf10 lineitem at 16 buckets ──
    val t0 = System.nanoTime()
    def satRows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))).as("customer_hk"),
        col("l_shipdate").cast("timestamp").as("load_dts"),
        lit(false).as("del_flag"),
        md5(concat_ws("|", col("l_partkey"), col("l_quantity"))).as("hash_diff"),
        lit("src").as("record_source"),
        col("l_linenumber").cast("long").as("run_id"),
        concat_ws("_", col("l_returnflag"), col("l_partkey")).as("payload"))
    lake.appendBucketed(satRows, "dv", "sat", "customer_hk")
    val tBuild = (System.nanoTime() - t0) / 1e9
    val rows0 = lake.read("dv", "sat").count()
    check(lake.tableBuckets("dv", "sat") == small, "birth layout count")

    // one-bucket staged batch (same bucket under both counts — bucket
    // arithmetic: b mod big == 0 implies b mod small == 0 when small | big)
    val staged = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))).as("customer_hk"))
      .filter(pmod(xxhash64(col("customer_hk")), lit(big.toLong)) === 0L)
      .limit(4000).cache()
    check(staged.count() > 0, "staged probe batch is empty")
    val schema = StructType(Seq(
      StructField("customer_hk", StringType), StructField("hash_diff", StringType)))
    // bytes the EXECUTED probe scan touches: input_file_name reflects
    // partition pruning; DataFrame.inputFiles does NOT — it lists the
    // relation's whole unpruned file index (RebucketBench's lesson)
    def probeBytes(): Long = {
      val (pruned, span) = lake.readOrProbeWithSpan(
        "dv", "sat", schema, staged, col("customer_hk"))
      check(span.isDefined, "probe prune did not engage at sf10")
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
        .map(f => fs.getFileStatus(
          new org.apache.hadoop.fs.Path(f.stripPrefix("file:"))).getLen).sum
    }
    spark.conf.set(graft.core.Confs.ProbePruneMinBytesKey, "1")
    val bytesSmall = probeBytes()

    // ── mid-stage append → typed Concurrency abort ──
    val tAbort0 = System.nanoTime()
    graft.core.Lake.beforeCommitHook = key => if (key == "dv.sat") {
      // a contract-violating writer: rows landing in the CURRENT layout
      // while the rebucket's staged generation thinks it has everything
      lake.appendBucketed(
        satRows.limit(1000), "dv", "sat", "customer_hk")
    }
    val aborted =
      try { lake.rebucket("dv", "sat", big); false }
      catch {
        case e: graft.etl.DvException
          if e.error.isInstanceOf[graft.etl.DvError.Concurrency] => true
      }
      finally graft.core.Lake.beforeCommitHook = _ => ()
    val tAbort = (System.nanoTime() - tAbort0) / 1e9
    check(aborted, "mid-stage append did not abort the rebucket with a typed Concurrency error")
    val rowsAfterAbort = lake.read("dv", "sat").count()
    check(rowsAfterAbort == rows0 + 1000L,
      s"aborted rebucket lost rows: $rowsAfterAbort != ${rows0 + 1000L}")
    check(lake.tableBuckets("dv", "sat") == small, "aborted rebucket must not change the layout")

    // ── concurrent reader: its file listing pins NOW (pre-rebucket flat
    // layout incl. the abort-path rows); it must complete over the
    // superseded files, which retention keeps for one cycle ──
    val readerPlan = lake.read("dv", "sat")
    @volatile var readerCount = -1L
    @volatile var readerErr: Throwable = null
    val reader = new Thread(() =>
      try readerCount = readerPlan.filter(col("run_id") >= 0L).count()
      catch { case t: Throwable => readerErr = t })

    // ── clean rebucket under the heap cap, reader racing it ──
    reader.start()
    val tRe0 = System.nanoTime()
    val (filesBefore, filesAfter) = lake.rebucket("dv", "sat", big)
    val tRebucket = (System.nanoTime() - tRe0) / 1e9
    reader.join(600000)
    check(!reader.isAlive, "concurrent reader still running after 10 min — hang, not a retention failure")
    check(readerErr == null, s"concurrent reader failed: $readerErr")
    check(readerCount == rowsAfterAbort,
      s"concurrent reader saw $readerCount rows, expected $rowsAfterAbort (retention must cover it)")
    check(lake.tableBuckets("dv", "sat") == big, "rebucket must record the new count")
    val rows1 = lake.read("dv", "sat").count()
    check(rows1 == rowsAfterAbort, s"rebucket changed row count: $rows1 != $rowsAfterAbort")
    val bytesBig = probeBytes()
    check(bytesBig < bytesSmall / 2,
      s"probe bytes did not shrink with the bucket count: $bytesSmall -> $bytesBig")

    // ── policy expire reclaims EXACTLY the superseded root data ──
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tableRoot = new org.apache.hadoop.fs.Path(s"$root/dv/sat")
    def rootEntries() = fs.listStatus(tableRoot).map(_.getPath.getName).sorted.toSeq
    val beforeExpire = rootEntries()
    check(beforeExpire.exists(_.startsWith("hk_bucket=")),
      s"expected superseded flat bucket dirs pre-expire, got $beforeExpire")
    spark.conf.set(graft.core.Confs.GenRetainMillisKey, "0")
    val tExp0 = System.nanoTime()
    lake.appendBucketed(satRows.limit(500), "dv", "sat", "customer_hk")
    val tExpire = (System.nanoTime() - tExp0) / 1e9
    val afterExpire = rootEntries()
    check(!afterExpire.exists(_.startsWith("hk_bucket=")) &&
      !afterExpire.exists(_.endsWith(".parquet")),
      s"policy expire left superseded root data: $afterExpire")
    check(afterExpire.exists(_.startsWith(graft.core.Lake.GenPrefix)),
      s"policy expire deleted the current generation: $afterExpire")
    val rows2 = lake.read("dv", "sat").count()
    check(rows2 == rows1 + 500L, s"post-expire rows: $rows2 != ${rows1 + 500L}")

    val heap = Runtime.getRuntime.maxMemory() / (1L << 20)
    val line =
      s"""{"metric":"rebucket_stress_sf10","rows":$rows2,"buckets":"$small->$big",""" +
        f""""build_s":$tBuild%.1f,"abort_path_s":$tAbort%.1f,"rebucket_s":$tRebucket%.1f,""" +
        s""""files_before":$filesBefore,"files_after":$filesAfter,""" +
        s""""probe_bytes_small":$bytesSmall,"probe_bytes_big":$bytesBig,""" +
        f""""expire_append_s":$tExpire%.1f,"typed_abort":true,"reader_ok":true,""" +
        s""""heap_mb":$heap,"sf_dir":"$sfDir"}"""
    println(line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench/r20_rebucket_sf10.json"), line + "\n")
    catch { case e: Exception =>
      System.err.println(s"[rebucket-stress] sidecar write failed (run from the repo root): $e") }
    spark.stop()
  }
}
