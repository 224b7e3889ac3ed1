package graft

import org.apache.spark.sql.functions._

import graft.core.Scratch
import graft.queries.Ann

/** Pins the cluster-portable scratch contract: every intermediate landing
  * (cc labels, frozen centroids, Verify aux) resolves under ONE root that
  * `spark.graft.scratch.dir` overrides, and the default root reproduces the
  * pre-Scratch local paths bit-for-bit (so oracle hashes can't move). */
class ScratchSpec extends SparkSpec {

  private def withRoot[A](root: String)(body: => A): A =
    try { spark.conf.set(Scratch.ConfKey, root); body }
    finally spark.conf.unset(Scratch.ConfKey)

  test("default root is the JVM tmpdir; conf overrides it") {
    val tmp = sys.props("java.io.tmpdir").stripSuffix("/")
    assert(Scratch.root(spark) == tmp)
    withRoot("/some/shared/store/") {
      assert(Scratch.root(spark) == "/some/shared/store")
      assert(Scratch.stablePath(spark, "x") == "/some/shared/store/x")
      assert(Scratch.tempDir(spark, "pfx_").startsWith("/some/shared/store/pfx_"))
    }
  }

  test("tempDir paths are unique and live under the root") {
    val a = Scratch.tempDir(spark, "graft_t_")
    val b = Scratch.tempDir(spark, "graft_t_")
    assert(a != b)
    assert(a.startsWith(Scratch.root(spark) + "/graft_t_"))
  }

  test("frozenCentroidsPath: injective corpus keying under the scratch root; per-run property wins") {
    val dir = "/root/testdata/sf0.001"
    // r20: the key carries a short digest of the RAW dir — two corpora
    // whose spellings sanitize identically ('/x/my corpus' vs
    // '/x/my_corpus') must not share a frozen artifact (the cross-JVM
    // reuse contract would serve one the other's merges forever)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val key = s"_root_testdata_sf0.001_$digest"
    assert(sys.props.get("graft.centroids.dir").isEmpty)
    assert(Ann.frozenCentroidsPath(spark, dir)
      == sys.props("java.io.tmpdir").stripSuffix("/") + s"/graft_knn_centroids_$key")
    withRoot("/shared/scratch") {
      assert(Ann.frozenCentroidsPath(spark, dir)
        == s"/shared/scratch/graft_knn_centroids_$key")
    }
    // sanitization-colliding spellings get DISTINCT keys
    assert(graft.core.FrozenArtifact.sharedPath(spark, "p", "/x/my corpus")
      != graft.core.FrozenArtifact.sharedPath(spark, "p", "/x/my_corpus"))
    // the Verify per-run property still wins over the scratch root (the
    // pending-DuckDB-compare isolation contract)
    try {
      System.setProperty("graft.centroids.dir", "/verify/run1")
      withRoot("/shared/scratch") {
        assert(Ann.frozenCentroidsPath(spark, dir)
          == s"/verify/run1/.graft_aux/knn_centroids_$key")
      }
    } finally System.clearProperty("graft.centroids.dir")
  }

  test("Lake bucket count: spark.graft.buckets conf applies; explicit arg wins") {
    import graft.core.Lake
    val root = tmpDir("graft_lake_conf_")
    assert(new Lake(spark, root).bucketCount == Lake.DefaultBuckets)
    try {
      spark.conf.set(Lake.BucketsKey, "32")
      assert(new Lake(spark, root).bucketCount == 32)
      assert(new Lake(spark, root, buckets = 4).bucketCount == 4)
    } finally spark.conf.unset(Lake.BucketsKey)
  }

  test("uncounted first append: rows land readable; an EMPTY first increment leaves no table") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val lake = new graft.core.Lake(spark, tmpDir("lake_unc"), buckets = 4)
    // empty first increment: the single-pass write must not leave a
    // part-file-less dir behind (readOr would then explode on read)
    val empty = Seq.empty[(String, Long)].toDF("hk", "v")
    lake.appendIncrementBucketedUncounted(empty, "dv", "t", "hk")
    assert(!lake.exists("dv", "t"), "empty first append must leave the table absent")
    val schema = empty.schema
    assert(lake.readOr("dv", "t", schema).count() == 0)
    // non-empty first increment: single pass, rows readable
    val rows = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("hk", "v")
    lake.appendIncrementBucketedUncounted(rows, "dv", "t", "hk")
    assert(lake.readOr("dv", "t", schema).as[(String, Long)].collect().sorted.toSeq
      == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
    // empty SECOND append: harmless no-op on an existing table
    lake.appendIncrementBucketedUncounted(empty, "dv", "t", "hk")
    assert(lake.readOr("dv", "t", schema).count() == 3)
  }

  test("counted append returns the footer row count of exactly the files it wrote") {
    import spark.implicits._
    val lake = new graft.core.Lake(spark, tmpDir("lake_cnt"), buckets = 4)
    val s = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("hk", "v").schema
    // first append: creates the table, rows spread over several buckets
    assert(lake.appendIncrementBucketed(
      Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("hk", "v"), "dv", "t", "hk") == 3L)
    // second append: count must cover ONLY the new files, not the table
    assert(lake.appendIncrementBucketed(
      Seq(("d", 4L), ("e", 5L)).toDF("hk", "v"), "dv", "t", "hk") == 2L)
    // empty increment on an existing table: zero, no phantom files
    assert(lake.appendIncrementBucketed(
      Seq.empty[(String, Long)].toDF("hk", "v"), "dv", "t", "hk") == 0L)
    // empty FIRST increment: zero and the table stays absent
    assert(lake.appendIncrementBucketed(
      Seq.empty[(String, Long)].toDF("hk", "v"), "dv", "t2", "hk") == 0L)
    assert(!lake.exists("dv", "t2"))
    assert(lake.readOr("dv", "t", s).count() == 5)
  }

  test("counted append with a listing span: identical counts, and the listing really is bounded to the span") {
    import spark.implicits._
    val lake = new graft.core.Lake(spark, tmpDir("lake_span"), buckets = 4)
    def spanOf(df: org.apache.spark.sql.DataFrame) = Some(
      df.select(lake.bucketOf(col("hk")).as("b")).distinct().collect().map(_.getLong(0)))
    val schema = Seq(("a", 1L)).toDF("hk", "v").schema
    // FIRST append with a span (table absent): creates the table, count exact
    val first = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("hk", "v")
    assert(lake.appendIncrementBucketed(first, "dv", "t", "hk", spanOf(first)) == 3L)
    // second append: only the new files counted, pre-existing span files excluded
    val second = Seq(("d", 4L), ("e", 5L)).toDF("hk", "v")
    assert(lake.appendIncrementBucketed(second, "dv", "t", "hk", spanOf(second)) == 2L)
    // EMPTY increment with an empty span: zero, nothing listed
    val empty = Seq.empty[(String, Long)].toDF("hk", "v")
    assert(lake.appendIncrementBucketed(empty, "dv", "t", "hk", Some(Array.empty[Long])) == 0L)
    // empty FIRST increment: zero and the table stays absent
    assert(lake.appendIncrementBucketed(empty, "dv", "t2", "hk", Some(Array.empty[Long])) == 0L)
    assert(!lake.exists("dv", "t2"))
    // bounded-listing proof: a span that does NOT cover the increment's
    // bucket leaves the diff blind to the write (row lands, count misses
    // it) — i.e. the walk really only touches the span's subtrees. This is
    // exactly the contract violation the Lake doc forbids callers.
    val zzBucket = lake.bucketOfValue("zz")
    val wrongSpan = Some(Array((zzBucket + 1) % 4))
    assert(lake.appendIncrementBucketed(
      Seq(("zz", 7L)).toDF("hk", "v"), "dv", "t", "hk", wrongSpan) == 0L)
    assert(lake.readOr("dv", "t", schema).count() == 6)
  }

  test("self-reading uncounted append: the scan's listing snapshot predates the write (no double-read, no race)") {
    import spark.implicits._
    val lake = new graft.core.Lake(spark, tmpDir("lake_selfread"), buckets = 4)
    val schema = Seq(("seed", 1L)).toDF("hk", "v").schema
    lake.appendIncrementBucketedUncounted(Seq(("seed", 1L)).toDF("hk", "v"), "dv", "t", "hk")
    // Each round's increment SCANS the target it appends to (the satellite
    // delta probe shape). The listing-snapshot invariant says every scan
    // sees exactly the pre-append file set: rows double geometrically
    // (1 → 2 → 4 → 8). A scan racing its own output would over-count
    // (re-listed new part files) or crash (FILE_NOT_EXIST on a swapped
    // file); a dropped snapshot would under-count.
    (1 to 3).foreach { round =>
      val increment = lake.readOr("dv", "t", schema)
        .withColumn("hk", concat_ws("_", col("hk"), lit(round.toString)))
      lake.appendIncrementBucketedUncounted(increment, "dv", "t", "hk")
      assert(lake.readOr("dv", "t", schema).count() == (1L << round),
        s"after self-read append $round")
    }
    val all = lake.readOr("dv", "t", schema).as[(String, Long)].collect().map(_._1).sorted
    assert(all.length == 8 && all.distinct.length == 8, all.mkString(","))
  }

  test("compact is a committed-generation swap: a concurrent reader sees old or new data, never absent or mixed") {
    import spark.implicits._
    val root = tmpDir("genswap")
    val lake = new graft.core.Lake(spark, root, buckets = 4)
    (1 to 3).foreach { g =>
      lake.appendBucketed(
        spark.range(g * 100L, g * 100L + 50L).selectExpr("cast(id as string) as hk", "id as v"),
        "dv", "t", "hk")
    }
    val expected = lake.read("dv", "t").agg(sum(col("v"))).head().getLong(0)

    // a reader whose file listing resolved BEFORE the compaction commit
    val oldReader = lake.read("dv", "t")

    val (before, after) = lake.compact("dv", "t")
    assert(after <= before)

    // post-commit: new readers resolve the committed generation
    assert(lake.dataPath("dv", "t").contains(graft.core.Lake.GenPrefix))
    assert(lake.read("dv", "t").count() == 150)
    assert(lake.read("dv", "t").agg(sum(col("v"))).head().getLong(0) == expected)

    // the pre-commit reader COMPLETES its scan: superseded data is retained
    // one compaction cycle — the old two-rename swap's absent-table window
    // is gone on every store (the commit is one marker-file create)
    assert(oldReader.agg(sum(col("v"))).head().getLong(0) == expected)

    // an UNCOMMITTED staged generation (crashed compaction) is invisible to
    // resolution — no marker, no data change
    spark.range(5).selectExpr("cast(id as string) as hk", "id as v")
      .write.parquet(s"$root/dv/t/${graft.core.Lake.GenPrefix}99")
    assert(lake.read("dv", "t").count() == 150)

    // the next compact expires the crashed leftover AND the legacy flat
    // files, then commits generation 2; generation 1 is retained one cycle
    lake.compact("dv", "t")
    assert(lake.dataPath("dv", "t").endsWith(s"${graft.core.Lake.GenPrefix}2"))
    assert(lake.read("dv", "t").count() == 150)
    val fsPath = new org.apache.hadoop.fs.Path(lake.tablePath("dv", "t"))
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def rootChildren: Set[String] = fs.listStatus(fsPath).map(_.getPath.getName).toSet
    assert(rootChildren == Set(s"${graft.core.Lake.GenPrefix}1", s"${graft.core.Lake.GenPrefix}2"),
      rootChildren.mkString(","))

    // explicit early reclaim once in-flight readers are drained
    lake.expireSuperseded("dv", "t")
    assert(rootChildren == Set(s"${graft.core.Lake.GenPrefix}2"), rootChildren.mkString(","))

    // appends after compaction land INSIDE the committed generation, read
    // back through the same resolution, and bucket-pruned lookups still work
    lake.appendBucketed(
      spark.range(1000L, 1010L).selectExpr("cast(id as string) as hk", "id as v"),
      "dv", "t", "hk")
    assert(lake.read("dv", "t").count() == 160)
    assert(lake.lookupBucketed("dv", "t", "hk", "1005").select("v").as[Long].head() == 1005L)
    assert(rootChildren == Set(s"${graft.core.Lake.GenPrefix}2"), rootChildren.mkString(","))

    // expireSuperseded is a no-op on flat (never-compacted) tables and on
    // absent tables — nothing to reclaim, nothing deleted
    lake.appendBucketed(
      spark.range(5).selectExpr("cast(id as string) as hk", "id as v"), "dv", "flat", "hk")
    assert(lake.expireSuperseded("dv", "flat") == 0L)
    assert(lake.read("dv", "flat").count() == 5)
    assert(lake.expireSuperseded("dv", "missing") == 0L)
  }

  test("dedup cc landing honors the scratch root end-to-end") {
    val root = tmpDir("graft_scratch_root_")
    val out = withRoot(root) {
      graft.queries.Dedup.dedupClusters(spark, "/root/testdata/sf0.001")
    }
    // the returned DataFrame reads parquet under the overridden root
    val files = out.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains(root)), files.take(2).mkString(", "))
    assert(out.count() > 0)
  }
}
