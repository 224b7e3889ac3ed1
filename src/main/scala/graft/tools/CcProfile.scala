package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing breakdown for `dedup_clusters` (r12 verdict ask #8
  * adjudication): how much of the row's wall is edge materialization
  * (the shared minhash pipeline) vs the sequential CC rounds vs the
  * landing write. Decides whether folding pointer-jumping into every
  * round (large-star/small-star) can pay — if the rounds are a small
  * slice, no round-count reduction reaches the target. Prints one JSON
  * line; run it on an idle host (see BASELINE.md noise methodology). */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - t0) / 1e9)
    }

    // warmup: codegen/parquet-reader init on an unrelated query
    graft.queries.Dedup.dedupExact(spark, sfDir).write.format("noop").mode("overwrite").save()

    // end-to-end reference number (same code path Bench times)
    val (_, total) = t(graft.queries.Dedup.dedupClusters(spark, sfDir)
      .write.format("noop").mode("overwrite").save())

    // phase breakdown, mirroring clustersCollapsed
    val dn = graft.queries.Dedup.docNorms(spark, sfDir)
    val (c, tCollapse) = t(graft.queries.Dedup.minhashCollapsed(spark, dn, cache = true))
    val repsLite = c.members.groupBy(col("grp"))
      .agg(min(col("doc_id")).as("node"), count(lit(1)).as("gsz"))
    val self = c.sigs.select(col("doc_id"))
      .join(repsLite.filter(col("gsz") >= 2).select(col("node").as("doc_id")), "doc_id")
      .select(col("doc_id").as("src"), col("doc_id").as("dst"))
    val pairs = c.repPairs.select(col("a_id"), col("b_id"))
    val sym = pairs.select(explode(array(
        struct(col("a_id").as("src"), col("b_id").as("dst")),
        struct(col("b_id").as("src"), col("a_id").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val edges = sym.unionAll(self).persist()
    val (nEdges, tEdges) = t(edges.count())
    // Pin the distributed min-label loop: this tool exists to adjudicate
    // the ROUNDS (the small-corpus gate would otherwise route a sub-2^20
    // edge graph to the driver union-find and time that instead). The
    // gate's own dispatch cost is visible in total_s, which runs the
    // production path unpinned.
    spark.conf.set("spark.graft.cc.driverMaxEdges", "0")
    val (cc, tRounds) = t {
      val h = graft.queries.Dedup.connectedComponents(edges)
      h // all round actions run inside
    }
    spark.conf.unset("spark.graft.cc.driverMaxEdges")
    val out = graft.core.Scratch.tempDir(spark, "graft_ccprof_")
    val (_, tLand) = t {
      val labels = cc.select("node", "label")
      val withGrp = labels.join(repsLite, "node")
      val multi = withGrp.filter(col("gsz") >= 2).join(c.members, "grp")
        .select(col("doc_id"), col("label").as("cluster_id"))
      val single = withGrp.filter(col("gsz") === 1)
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      multi.unionAll(single).write.mode("overwrite").parquet(out)
    }
    cc.unpersist(); edges.unpersist(); c.release()
    println(
      f"""{"bench":"cc_profile","total_s":$total%.2f,"collapse_build_s":$tCollapse%.2f,""" +
      f""""edges_s":$tEdges%.2f,"edges":$nEdges,"cc_rounds_s":$tRounds%.2f,"cc_path":"loop",""" +
      f""""landing_s":$tLand%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
