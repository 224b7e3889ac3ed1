package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B for the latest-row shape conf (r21): alternates
  * `spark.graft.latestShape` partial/hash WITHIN one session, several reps,
  * on the real declared queries — the only layout that survives this host's
  * 2-10x co-tenant swings (cross-process runs of identical code measured
  * 29 s and 180 s in adjacent windows). Not part of the library surface. */
object LatestProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "3").toInt
    val spark: SparkSession = graft.core.Sessions.localBuilder(cpus, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = if (args.nonEmpty) args.toSeq else Seq("dv_sat_current", "dv_pit_asof", "dv_sat_full")
    // warmup scan (page cache + codegen)
    spark.read.parquet(s"$sfDir/lineitem.parquet").write.format("noop").mode("overwrite").save()
    // NATURAL-INPUT surface (the Graft temp-view/catalog regime — no
    // clusterBy below the aggregate): real lineitem satellite projection,
    // latest-row under each shape. This is the regime BvProf's synthetic
    // narrow-payload shallow profile mis-predicted for the clustered
    // engine path — measure the real rows.
    import org.apache.spark.sql.functions._
    def natSat = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      col("l_orderkey").as("__nk"),
      col("l_shipdate").as("load_dts"),
      md5(concat_ws("||", col("l_partkey"), col("l_linenumber"))).as("hash_diff"),
      col("l_linenumber").cast("long").as("run_id"),
      col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    for (rep <- 1 to reps; shape <- Seq("partial", "hash")) {
      spark.conf.set(graft.core.Confs.LatestShapeKey, shape)
      for (q <- queries) {
        val fn = graft.SparkEntry.queries(q)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[latest] $q%-16s $shape%-8s rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      if (sys.env.contains("SPARK_GRAFT_AB_NATURAL")) {
        val t0 = System.nanoTime()
        graft.dv.DvOps.currentRows(natSat, "__nk").write.format("noop").mode("overwrite").save()
        println(f"[latest] natural_current  $shape%-8s rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
