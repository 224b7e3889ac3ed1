package graft

import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.dv.VaultSchemas
import graft.functions.{TextFns, VectorFns}
import graft.meta.TableColumn

class FnsSpec extends SparkSpec {
  import spark.implicits._

  test("norm + shingles produce distinct 3-gram shingles") {
    val out = Seq("The  Cat, the cat SAT on the mat!")
      .toDF("text")
      .select(TextFns.shingles(TextFns.words(TextFns.norm(col("text")))).as("sh"))
      .as[Seq[String]].head()
    assert(out.contains("the cat sat"))
    assert(out.contains("sat on the"))
    assert(out.distinct == out)
    // fewer than 3 words -> empty, not null
    val empty = Seq("hi there").toDF("text")
      .select(TextFns.shingles(TextFns.words(TextFns.norm(col("text")))).as("sh"))
      .as[Seq[String]].head()
    assert(empty.isEmpty)
  }

  test("cosine: identity 1.0, orthogonal 0.0, scale-invariant") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(2.0, 4.0, 6.0), Seq(0.0, 0.0, 1.0)))
      .toDF("a", "b", "z")
    val (aa, ab, az) = df.select(
      VectorFns.cosine(col("a"), col("a")),
      VectorFns.cosine(col("a"), col("b")),
      VectorFns.cosine(col("a"), col("z"))).as[(Double, Double, Double)].head()
    assert(math.abs(aa - 1.0) < 1e-12)
    assert(math.abs(ab - 1.0) < 1e-12)
    assert(math.abs(az - 3.0 / math.sqrt(14.0)) < 1e-12)
  }

  test("lshBucket: identical directions share a bucket") {
    val planes = VectorFns.planes(16, 3)
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(2.0, 4.0, 6.0), Seq(-1.0, 5.0, 0.2)))
      .toDF("a", "b", "c")
    val (ba, bb, bc) = df.select(
      VectorFns.lshBucket(col("a"), planes),
      VectorFns.lshBucket(col("b"), planes),
      VectorFns.lshBucket(col("c"), planes)).as[(String, String, String)].head()
    assert(ba == bb)      // parallel vectors always collide
    assert(ba.length == 16 && ba.forall(c => c == '0' || c == '1'))
    assert(ba != bc)      // and a far-off direction lands elsewhere
  }

  test("vault schemas follow the reference DDL layout") {
    val hub = VaultSchemas.hub("customer", Seq(
      TableColumn("customer", "hub", "c_custkey", "BIGINT", 1, "bk")))
    assert(hub.fieldNames.toSeq ==
      Seq("customer_hk", "load_dts", "record_source", "run_id", "c_custkey_bk"))
    // composite business keys switch to the _cbk suffix
    val chub = VaultSchemas.hub("product", Seq(
      TableColumn("product", "hub", "id", "INTEGER", 1, "bk"),
      TableColumn("product", "hub", "product_type", "VARCHAR(255)", 2, "bk")))
    assert(chub.fieldNames.takeRight(2).toSeq == Seq("id_cbk", "product_type_cbk"))
    // sat payload = any non-hk mapping (demo metadata uses both c and f)
    val sat = VaultSchemas.sat("customer_hk", Seq(
      TableColumn("customer_details", "hsat", "customer", "", 0, "hk"),
      TableColumn("customer_details", "hsat", "c_name", "VARCHAR", 1, "c"),
      TableColumn("customer_details", "hsat", "c_note", "VARCHAR", 2, "f")))
    assert(sat.fieldNames.toSeq ==
      Seq("customer_hk", "load_dts", "del_flag", "hash_diff", "record_source", "run_id", "c_name", "c_note"))
    // link legs come from ll mappings; everything else is a degenerate key
    val link = VaultSchemas.link("order_customer", Seq(
      TableColumn("order_customer", "link", "customer", "", 1, "ll"),
      TableColumn("order_customer", "link", "order", "", 2, "ll"),
      TableColumn("order_customer", "link", "priority", "VARCHAR", 3, "dk")))
    assert(link.fieldNames.toSeq ==
      Seq("order_customer_hk", "load_dts", "record_source", "run_id",
        "customer_hk", "order_hk", "priority_dk"))
  }

  test("saltedJoin equals the plain join on a skewed key distribution") {
    import graft.functions.Joins
    // 10k rows of one hot key + a tail — the skew shape that melts one task.
    val probe = (Seq.fill(10000)(1L) ++ (2L to 50L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val build = (1L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val salted = Joins.saltedJoin(probe, build, Seq("k"), factor = 8)
    val plain = probe.join(build, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.agg(sum(col("v"))).head().getLong(0) == plain.agg(sum(col("v"))).head().getLong(0))
  }

  test("flow sources can be views, not just staging tables") {
    import graft.core.Lake
    import graft.etl.FlowExecutor
    import graft.meta.{MetaStore, Transition}
    val root = tmpDir("vflow")
    Seq((1L, "ann"), (2L, "bob")).toDF("id", "name").createOrReplaceTempView("curated_customers")
    val m = MetaStore(
      tables = Nil, // no stg entry -> source resolved from the catalog
      transitions = Seq(
        Transition("curated_customers", "id", "hub_customer", "id_bk", "customer", 1, raw = false, None, "bk")))
    val flow = new FlowExecutor(new Lake(spark, root, 2), m, graft.dv.HashGen.Md5)
    val r = flow.executeFlow("curated_customers", "view-src")
    assert(r.status == "success", r.errors.mkString("; "))
    assert(r.loaded == Map("hub_customer" -> 2L))
  }

  test("lake bucketed append round-trips and readOr keeps a stable column set") {
    val root = tmpDir("lake")
    val lake = new Lake(spark, root, buckets = 4)
    val df = Seq(("k1", 1L), ("k2", 2L)).toDF("hk", "v")
    lake.appendBucketed(df, "dv", "t", "hk")
    lake.appendBucketed(Seq(("k3", 3L)).toDF("hk", "v"), "dv", "t", "hk")
    assert(lake.read("dv", "t").count() == 3)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("hk", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    assert(lake.readOr("dv", "t", schema).columns.toSeq == Seq("hk", "v"))
    assert(lake.readOr("dv", "missing", schema).isEmpty)
  }

  test("compact rewrites a many-file bucketed table to one file per bucket, data intact") {
    val root = tmpDir("compactlake")
    val lake = new Lake(spark, root, buckets = 4)
    // 5 appends x several tasks -> many small files per bucket
    (1 to 5).foreach { b =>
      val df = (1 to 40).map(i => (s"key${b}_$i", i.toLong)).toDF("hk", "v")
      lake.appendBucketed(df.repartition(4), "dv", "t", "hk")
    }
    val beforeSum = lake.read("dv", "t").agg(sum(col("v"))).head().getLong(0)
    val (before, after) = lake.compact("dv", "t")
    assert(before > after, s"$before -> $after")
    assert(after == 4) // one file per bucket
    assert(lake.read("dv", "t").count() == 200)
    assert(lake.read("dv", "t").agg(sum(col("v"))).head().getLong(0) == beforeSum)
    // lookups still prune after the rewrite
    assert(lake.lookupBucketed("dv", "t", "hk", "key3_7").select("v").as[Long].head() == 7L)
  }

  test("lookupBucketed refuses a non-string key column instead of silently pruning to the wrong bucket") {
    val root = tmpDir("lookuptype")
    val lake = new Lake(spark, root, buckets = 4)
    // bucketed on a LONG key: xxhash64(long) != xxhash64('5'), so a string
    // lookup would land in the wrong bucket and return empty — must throw
    lake.appendBucketed((1L to 20L).map(i => (i, s"p$i")).toDF("id", "p"), "dv", "n", "id")
    val e = intercept[IllegalArgumentException](lake.lookupBucketed("dv", "n", "id", "5"))
    assert(e.getMessage.contains("STRING"))
    // ...but the guard resolves the column with the session's (default
    // case-insensitive) rules, like the lookup filter itself does
    lake.appendBucketed((1 to 8).map(i => (s"k$i", i.toLong)).toDF("hk", "v"), "dv", "s", "hk")
    assert(lake.lookupBucketed("dv", "s", "HK", "k3").select("v").as[Long].head() == 3L)
  }

  test("compact preserves a schema-evolved table (union of file schemas, no silent column drop)") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val root = tmpDir("compactevolve")
    val lake = new Lake(spark, root, buckets = 4)
    // generation A: (hk, v); generation B adds column w — the evolved
    // satellite shape. Plain single-footer inference could pick an A file
    // and the rewrite would DROP w's data from disk; compact must read the
    // UNION of file schemas.
    lake.appendBucketed((1 to 40).map(i => (s"a$i", i.toLong)).toDF("hk", "v"), "dv", "t", "hk")
    lake.appendBucketed((1 to 40).map(i => (s"b$i", i.toLong, s"w$i")).toDF("hk", "v", "w"),
      "dv", "t", "hk")
    val (before, after) = lake.compact("dv", "t")
    assert(before > after, s"$before -> $after")
    val schema = StructType(Seq(
      StructField("hk", StringType), StructField("v", LongType), StructField("w", StringType)))
    val out = lake.readOr("dv", "t", schema)
    assert(out.count() == 80)
    // generation B's evolved column survived the rewrite value-for-value...
    assert(out.filter(col("hk").startsWith("b") && col("w") === concat(lit("w"), col("v")))
      .count() == 40)
    // ...and generation A reads as NULL history, not garbage
    assert(out.filter(col("hk").startsWith("a") && col("w").isNull).count() == 40)
  }

  test("compact splits a bucket above compact.targetBytes into ~target-sized files") {
    val root = tmpDir("compactsplit")
    val lake = new Lake(spark, root, buckets = 2)
    // ~64 high-entropy bytes/row x 20k rows ≈ 1.3 MB incompressible parquet
    // over 2 buckets — each bucket far above a 64 KiB target.
    val df = spark.range(20000).select(
      md5(col("id").cast("string")).as("hk"),
      md5((col("id") + 1000000L).cast("string")).as("payload"),
      col("id").as("v"))
    lake.appendBucketed(df, "dv", "big", "hk")
    try {
      spark.conf.set(graft.core.Confs.CompactTargetBytesKey, (64L << 10).toString)
      val (before, after) = lake.compact("dv", "big")
      assert(after > 2, s"oversized buckets must split: $before -> $after files")
      // every bucket dir got multiple files, none wildly above target —
      // inside the committed generation dir (the r18 layout), not the root
      val base = new java.io.File(
        lake.dataPath("dv", "big").stripPrefix("file:"))
      val bucketDirs = base.listFiles().filter(f => f.isDirectory && f.getName.startsWith("hk_bucket="))
      assert(bucketDirs.length == 2)
      bucketDirs.foreach { d =>
        val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(parts.length >= 2, s"${d.getName}: ${parts.length} files")
        // hash placement may co-locate two chunk cells (doc'd) — cap at 4x
        parts.foreach(p => assert(p.length < 4L * (64L << 10), s"${p.getName}: ${p.length}B"))
      }
      // data intact + bucket pruning still works after the split rewrite
      assert(lake.read("dv", "big").count() == 20000)
      assert(lake.read("dv", "big").agg(sum(col("v"))).head().getLong(0)
        == 20000L * 19999L / 2)
      val k = java.security.MessageDigest.getInstance("MD5").digest("7".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(lake.lookupBucketed("dv", "big", "hk", k).select("v").as[Long].head() == 7L)
    } finally spark.conf.unset(graft.core.Confs.CompactTargetBytesKey)
  }

  test("lookupBucketed prunes to the key's partition") {
    val root = tmpDir("lakeprune")
    val lake = new Lake(spark, root, buckets = 8)
    val df = (1 to 100).map(i => (s"key$i", i.toLong)).toDF("hk", "v")
    lake.appendBucketed(df, "dv", "t", "hk")
    val hit = lake.lookupBucketed("dv", "t", "hk", "key42")
    assert(hit.select("v").as[Long].collect().toSeq == Seq(42L))
    // partition filter reaches the scan: only hk_bucket=N is read
    val plan = hit.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(hk_bucket"), plan)
    // and a wrong key in the right shape returns empty, not an error
    assert(lake.lookupBucketed("dv", "t", "hk", "nope").isEmpty)
  }
}
