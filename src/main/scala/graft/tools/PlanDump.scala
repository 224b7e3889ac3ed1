package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to files — the
  * committed plan evidence for optimization rounds (plans/rNN/<q>_before.txt
  * / _after.txt; the round judge checks plan claims against these).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [query ...]
  * (no query names = every declared query). Data dir from
  * SPARK_GRAFT_SF_DIR, session identical to Bench's so the captured plan
  * is the plan the bench runs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.localBuilder(cpus, cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 16).toString)
      .getOrCreate()
    // same ad-hoc conf hook as Bench (k=v;k2=v2) — lets a conf-gated shape
    // be dumped as its own before/after pair
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').map(_.trim).filter(_.nonEmpty).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k.trim, v.trim)
        case _ => System.err.println(s"[plandump] ignoring malformed SPARK_GRAFT_EXTRA_CONF token '$kv'")
      }
    })
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val text = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), text)
      System.err.println(s"[plandump] wrote ${name}_$suffix.txt (${text.length} chars)")
    }
    spark.stop()
  }
}
