package graft

/** The [[graft.plans.FuseDvHash]] optimizer rule: plain-SQL DV hash sites
  * must fuse to the native expression, bit-identically, and ONLY when the
  * null semantics are provably equivalent. */
class FuseDvHashSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5Ref(fields: Seq[String]): String = {
    val joined = fields.mkString("||").toUpperCase(java.util.Locale.ROOT)
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(joined.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  test("coalesce-wrapped SQL pattern fuses and matches a JVM reference digest") {
    spark.read.parquet(s"$dir/customer.parquet").createOrReplaceTempView("cust_fuse")
    val q = spark.sql(
      """SELECT c_custkey, c_name,
        |  md5(upper(concat_ws('||', coalesce(cast(c_custkey AS STRING), ''), coalesce(c_name, '')))) AS hk
        |FROM cust_fuse""".stripMargin)
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_dv_hash"),
      q.queryExecution.optimizedPlan.toString)
    q.collect().foreach { r =>
      val expect = md5Ref(Seq(r.getLong(0).toString, r.getString(1)))
      assert(r.getString(2) == expect, s"row ${r.getLong(0)}")
    }
  }

  test("sha256 variant fuses too") {
    spark.read.parquet(s"$dir/customer.parquet").createOrReplaceTempView("cust_fuse2")
    val q = spark.sql(
      "SELECT sha2(upper(concat_ws('||', coalesce(c_name, ''))), 256) AS hk FROM cust_fuse2")
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_dv_hash"),
      q.queryExecution.optimizedPlan.toString)
    assert(q.limit(1).collect().head.getString(0).length == 64)
  }

  test("nullable field WITHOUT coalesce does not fuse (concat_ws skips nulls — different bytes)") {
    spark.read.parquet(s"$dir/customer.parquet").createOrReplaceTempView("cust_fuse3")
    // c_name is nullable in the parquet schema and not coalesce-wrapped:
    // concat_ws would drop a null argument AND its separator, which DvHash's
    // null≡'' semantics would not reproduce. The rule must leave this alone.
    val q = spark.sql(
      "SELECT md5(upper(concat_ws('||', coalesce(c_name, ''), cast(c_acctbal AS STRING)))) AS hk FROM cust_fuse3")
    assert(!q.queryExecution.optimizedPlan.toString.contains("graft_dv_hash"),
      q.queryExecution.optimizedPlan.toString)
  }
}
