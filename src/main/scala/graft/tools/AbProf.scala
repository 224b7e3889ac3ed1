package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic same-session interleaved conf A/B over declared queries (r21):
  * alternates BASE (no override) and CONF (`SPARK_GRAFT_AB_CONF`, the
  * `k=v;k2=v2` format Bench uses) every rep, so both sides see the same
  * noise window — the only decision-grade layout on this host (adjacent
  * same-code windows measured 29 s and 180 s). Confs are set via
  * spark.conf before each query build and restored after, so runtime-read
  * knobs (AQE thresholds, graft.* gates) flip per side. Session mirrors
  * Bench's (Sessions.localBuilder + AQE exchange sizing). Not part of the
  * library surface. */
object AbProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "3").toInt
    val confStr = sys.env.getOrElse("SPARK_GRAFT_AB_CONF",
      sys.error("SPARK_GRAFT_AB_CONF required (k=v;k2=v2)"))
    val kvs: Seq[(String, String)] = confStr.split(';').toSeq.map(_.trim).filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => k.trim -> v.trim
        case _ => sys.error(s"malformed SPARK_GRAFT_AB_CONF token '$kv' (want k=v)")
      }
    }
    require(args.nonEmpty, "usage: AbProf <query> [query ...]")
    val spark: SparkSession = graft.core.Sessions.localBuilder(cpus, cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 16).toString)
      .getOrCreate()
    // Session-wide extra confs (k=v;k2=v2), applied to BOTH sides — lets
    // an A/B be REVERSED (set the candidate here, set the old default as
    // AB_CONF) to rule out within-rep ordering bias.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').map(_.trim).filter(_.nonEmpty).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k.trim, v.trim)
        case _ => sys.error(s"malformed SPARK_GRAFT_EXTRA_CONF token '$kv'")
      }
    })
    spark.sparkContext.setLogLevel("WARN")
    // warmup (page cache + codegen first-hit)
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().write.format("noop").mode("overwrite").save()
    for (rep <- 1 to reps; side <- Seq("base", "conf")) {
      val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      if (side == "conf") kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        for (q <- args.toSeq) {
          val fn = graft.SparkEntry.queries(q)
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"[ab] $q%-22s $side%-5s rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      } finally if (side == "conf") prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    spark.stop()
  }
}
