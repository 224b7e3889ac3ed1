package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE train-cost decomposition at corpus scale (r19 verdict #4): the claim
  * to prove is that merge TRAINING cost follows the 32k-capped dictionary,
  * not the corpus — only the word-frequency aggregation (one
  * map-side-combined scan) scales with data volume. This tool replays the
  * production train pipeline's stages separately per input dir and times
  * each: corpus scan+agg+top-k collect (distributed, linear), driver merge
  * train over the capped dictionary (should be ~constant across scales),
  * plus the dropped-mass stats job. Prints one JSON line per dir and a
  * combined line — captured as `bench/r20_bpe_sf10.json`.
  *
  * Env: SPARK_GRAFT_BPE_DIRS (comma-separated corpus dirs, default
  * sf0.1 + /tmp/graft_sf10), SPARK_GRAFT_CPUS. */
object BpeTrainStress {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_BPE_DIRS",
      "/root/testdata/sf0.1,/tmp/graft_sf10").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dictCap = graft.core.Confs.bpeDictCap(spark.conf)
    val numMerges = graft.core.Confs.bpeNumMerges(spark.conf)
    val results = dirs.map { dir =>
      // VOCABULARY REALISM: the synthetic documents table has only ~31 word
      // types regardless of scale (MakeScaled replicates rows), which makes
      // a dict-cap stress vacuous. Append doc_id-keyed synthetic words
      // (4 per doc, mixed radixes) so the TYPE count grows with the
      // corpus — sf10's 500k shifted doc_ids yield ~2M types, far past the
      // 32k cap, while sf0.1 stays under it. The claim under test: agg cost
      // follows the corpus, train cost follows the CAPPED dict.
      val docs = graft.core.Tables.load(spark, dir, "documents")
        .select(concat(col("text"), lit(" u"),
          col("doc_id").cast("string"), lit(" v"),
          conv(col("doc_id").cast("string"), 10, 36), lit(" w"),
          pmod(col("doc_id") * 2654435761L, lit(1000003L)).cast("string"), lit(" x"),
          conv(pmod(col("doc_id") * 97L, lit(999983L)).cast("string"), 10, 16)
        ).as("text")).as[String]
      val nDocs = docs.count()
      // the PRODUCTION train-input stages, shared with ensureFrozenMerges
      // (TextOps.wordFreqStats) — the decomposition must time the pipeline
      // production actually runs, not a copy that can silently diverge
      val (wf, totalMass, totalTypes, aggS, statsS) =
        graft.queries.TextOps.wordFreqStats(spark, docs, dictCap)
      val t3 = System.nanoTime()
      val merges = graft.functions.Bpe.train(wf, numMerges)
      val trainS = (System.nanoTime() - t3) / 1e9
      val kept = wf.iterator.map(_._2).sum
      val dropped = if (totalMass > 0) 1.0 - kept.toDouble / totalMass else 0.0
      val line =
        s"""{"dir":"$dir","docs":$nDocs,"agg_s":${f"$aggS%.1f"},""" +
          s""""stats_s":${f"$statsS%.1f"},"train_s":${f"$trainS%.1f"},""" +
          s""""merges":${merges.length},"dict_types":${wf.size},"total_types":$totalTypes,""" +
          s""""total_pretokens":$totalMass,"dropped_mass_frac":${f"$dropped%.6f"}}"""
      println(line)
      line
    }
    val combined = s"""{"metric":"bpe_train_stress","dict_cap":$dictCap,""" +
      s""""num_merges":$numMerges,"runs":[${results.mkString(",")}]}"""
    println(combined)
    // stdout above already carries the line; losing the repo sidecar must
    // still be VISIBLE (cwd not the repo root, bench/ missing)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench/r20_bpe_sf10.json"), combined + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bpe-stress] sidecar write failed (run from the repo root): $e") }
    spark.stop()
  }
}
