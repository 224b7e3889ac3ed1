package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Lake

/** Measures what the r17 span-bounded counted append removes: the
  * O(vault-files) driver-side listing walked TWICE per counted append
  * (`Lake.appendIncrementBucketed` before/after diff), vs the same walk
  * bounded to the increment's `hk_bucket=` span.
  *
  * The listing cost depends only on the file TREE, so the vault is
  * simulated directly: `buckets` partition dirs × `filesPerBucket` empty
  * `.parquet`-named files (nothing reads them — the append path only lists
  * names and footer-reads the NEW files, which are identical in both arms).
  * Two measurements:
  *   1. the walk itself: full tree vs a 2-bucket span (pure fs metadata);
  *   2. end-to-end `appendIncrementBucketed` of a small 2-bucket increment,
  *      span vs no-span, alternating reps.
  * Prints ONE JSON line. Local-fs syscalls are ~µs; against a remote store
  * every listed entry is an RPC, so the measured ratio UNDERSTATES the
  * production win — the point is the slope (files-proportional vs
  * span-proportional), not the absolute ms.
  */
object AppendListingBench {
  def main(args: Array[String]): Unit = {
    val buckets = if (args.length > 0) args(0).toInt else 64
    val filesPerBucket = if (args.length > 1) args(1).toInt else 1000
    val reps = 5
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-append-listing-bench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    try {
      val root = java.nio.file.Files.createTempDirectory("graft_listing_bench_").toString
      val lake = new Lake(spark, root, buckets)
      // simulate the aged vault table's file tree
      val table = java.nio.file.Paths.get(root, "dv", "sat")
      (0 until buckets).foreach { b =>
        val dir = table.resolve(s"hk_bucket=$b")
        java.nio.file.Files.createDirectories(dir)
        (0 until filesPerBucket).foreach { i =>
          java.nio.file.Files.createFile(dir.resolve(f"part-$i%05d-seed.snappy.parquet")); ()
        }
      }
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // the same walk shape Lake.appendIncrementBucketed uses
      def walk(p: org.apache.hadoop.fs.Path): Int =
        if (!fs.exists(p)) 0
        else fs.listStatus(p).iterator.map { s =>
          if (s.isDirectory) walk(s.getPath)
          else if (s.getPath.getName.endsWith(".parquet")) 1 else 0
        }.sum
      def msOf[A](body: => A): (Double, A) = {
        val t0 = System.nanoTime(); val a = body; ((System.nanoTime() - t0) / 1e6, a)
      }
      val tablePath = new org.apache.hadoop.fs.Path(table.toString)
      val spanBuckets = Array(0L, 1L)
      val spanPaths = spanBuckets.map(b =>
        new org.apache.hadoop.fs.Path(tablePath, s"hk_bucket=$b"))
      val fullMs = (1 to reps).map(_ => msOf(walk(tablePath))).map(_._1).min
      val fullFiles = walk(tablePath)
      val spanMs = (1 to reps).map(_ => msOf(spanPaths.map(walk).sum)).map(_._1).min
      val spanFiles = spanPaths.map(walk).sum
      // end-to-end counted append: a small increment confined to 2 buckets,
      // span vs no-span, alternating. Keys are picked AFTER rep-suffixing so
      // the FINAL key values bucket into the span — the listingSpan contract
      // the span arm exercises (and both arms write the same 2-bucket file
      // shape, keeping the comparison like-for-like).
      def increment(rep: Int) = Iterator.from(0).map(i => s"k${i}_r$rep")
        .filter(k => spanBuckets.contains(lake.bucketOfValue(k)))
        .take(100).toSeq.map(k => (k, 1L)).toDF("hk", "v")
      val (noSpanSec, spanSec) = (1 to reps).map { r =>
        val (a, na) = msOf(lake.appendIncrementBucketed(increment(2 * r), "dv", "sat", "hk"))
        val (b, nb) = msOf(lake.appendIncrementBucketed(increment(2 * r + 1), "dv", "sat", "hk",
          Some(spanBuckets)))
        require(na == 100L && nb == 100L, s"counted-append counts wrong: $na / $nb")
        (a / 1000, b / 1000)
      }.unzip match { case (as, bs) => (as.min, bs.min) }
      println(
        s"""{"metric":"append_listing","buckets":$buckets,"filesPerBucket":$filesPerBucket,""" +
        s""""fullFiles":$fullFiles,"spanFiles":$spanFiles,""" +
        s""""fullWalkMs":${"%.1f".format(fullMs)},"spanWalkMs":${"%.1f".format(spanMs)},""" +
        s""""appendNoSpanSec":${"%.3f".format(noSpanSec)},"appendSpanSec":${"%.3f".format(spanSec)}}""")
    } finally spark.stop()
  }
}
