package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.meta.{MetaStore, TableColumn, Transition}

/** Phase decomposition of the dv_catalog_sql composite row (r21 verdict
  * #6): replays the declared query's exact body — facade init, flow
  * execution, the two compacts, the qualified bv-view join — with a timer
  * per phase, so the floor's cost splits into flow / compact / DDL / query.
  * The body mirrors DvQueries.catalogSql verbatim (same meta, same
  * load context, distinct entity name so catalog registrations cannot
  * collide with a concurrently-registered query run). Not part of the
  * library surface. */
object ProfCatalog {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "3").toInt
    val spark: SparkSession = graft.core.Sessions.localBuilder(cpus, cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 16).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().write.format("noop").mode("overwrite").save()

    val entity = "catprof_customer"
    def meta: MetaStore = MetaStore(
      tables = Seq(
        TableColumn(entity, "stg", "c_custkey", "BIGINT", 1, "c"),
        TableColumn(entity, "stg", "c_name", "VARCHAR", 2, "c"),
        TableColumn(entity, "stg", "c_mktsegment", "VARCHAR", 3, "c"),
        TableColumn(entity, "hub", "c_custkey", "BIGINT", 1, "bk"),
        TableColumn(entity, "hsat", "customer", "", 0, "hk"),
        TableColumn(entity, "hsat", "c_name", "VARCHAR", 1, "f"),
        TableColumn(entity, "hsat", "c_mktsegment", "VARCHAR", 2, "f")),
      transitions = Seq(
        Transition(entity, "c_custkey", s"hub_$entity", "c_custkey_bk", "customer", 1, raw = false, None, "bk"),
        Transition(entity, "c_name", s"hsat_$entity", "c_name", "customer_details", 1, raw = false, None, "f"),
        Transition(entity, "c_mktsegment", s"hsat_$entity", "c_mktsegment", "customer_details", 2, raw = false, None, "f"),
        Transition(entity, "customer_hk", s"hsat_$entity", "customer", "customer_details", 0, raw = false, None, "sat_delta")))

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    for (rep <- 1 to reps) {
      def phase[A](name: String)(body: => A): A = {
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        val r = body
        println(f"PROFCAT rep=$rep phase=$name%-12s ${(System.nanoTime() - t0) / 1e9}%.3f s  jobs=${jobs.get() - j0}")
        r
      }
      val wall0 = System.nanoTime()
      val root = graft.core.Scratch.streamTempDir(spark, "graft_catprof_lake_")
      val g = phase("facade") {
        new graft.Graft(spark, root, meta, None, graft.dv.HashGen.Md5)
      }
      phase("initVault")(g.initVault())
      val r = phase("flow")(g.executeFlow(
        entity, "verify", Some(s"$sfDir/customer.parquet"),
        Some(Timestamp.valueOf("2026-01-01 00:00:00"))))
      require(r.status == "success", s"flow failed: ${r.errors.mkString("; ")}")
      phase("compactHub")(g.compact("dv", s"hub_$entity"))
      phase("compactSat")(g.compact("dv", s"hsat_$entity"))
      phase("sqlJoin") {
        g.sql(
          s"""SELECT h.${entity}_hk AS customer_hk, h.c_custkey_bk, s.c_name, s.c_mktsegment
             |FROM dv.hub_$entity h
             |JOIN bv.hsat_${entity}_cv s ON h.${entity}_hk = s.customer_hk
             |WHERE NOT s.del_flag""".stripMargin)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"PROFCAT rep=$rep phase=TOTAL        ${(System.nanoTime() - wall0) / 1e9}%.3f s")
      System.out.flush()
    }
    spark.stop()
  }
}
