package graft

import org.apache.spark.sql.functions._

import graft.functions.Joins

/** Skew-hardening guards for the salted-join helpers: a bursty key
  * distribution (the incident-storm shape — 90% of probe rows packed into
  * one 1-minute bucket) must produce (a) exactly the plain-join result and
  * (b) bounded per-(key,salt) join groups, which under hash partitioning
  * IS the per-task input bound. */
class JoinsSpec extends SparkSpec {

  import spark.implicits._

  // Bursty probe: 9000 rows in bucket 100 (the storm), 10 rows in each of
  // buckets 0-99 (background). Build: 40 rows per bucket, everywhere.
  private def bursty = {
    val storm = (0 until 9000).map(i => (100L, 6000000L + i.toLong)) // e_ms inside bucket 100
    val background = for (b <- 0 until 100; i <- 0 until 10) yield (b.toLong, b * 60000L + i.toLong)
    (storm ++ background).toDF("bucket", "v")
  }

  private def buildSide =
    (for (b <- 0 to 100; i <- 0 until 40) yield (b.toLong, i.toLong)).toDF("bucket", "w")

  test("hotSaltedJoin: bursty distribution — result identical to the plain join") {
    val probe = bursty
    val build = buildSide
    val plain = probe.join(build, "bucket")
      .groupBy("bucket").agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
    val salted = Joins.hotSaltedJoin(probe, build, Seq("bucket"), col("v"), hotThreshold = 1000, factor = 8)
      .groupBy("bucket").agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hotSaltedJoin: a NULL saltExpr on a hot-key row is kept, not dropped") {
    // pmod(NULL, factor) is NULL and an inner equi-join on __salt would
    // silently drop the row — breaking the identical-to-plain-join
    // contract. NULL-salt rows must take cell 0 (always replicated).
    val probe = ((0 until 2000).map(i => (1L, Some(i.toLong))) :+ (1L, Option.empty[Long]))
      .toDF("bucket", "v")
    val build = Seq((1L, 7L)).toDF("bucket", "w")
    val plain = probe.join(build, "bucket").count()
    val salted = Joins.hotSaltedJoin(probe, build, Seq("bucket"), col("v"),
      hotThreshold = 100, factor = 8).count()
    assert(salted == plain, s"salted $salted vs plain $plain — NULL-salt row lost")
  }

  test("salted joins refuse inputs carrying the reserved working columns") {
    val p = Seq((1L, 0)).toDF("bucket", "__salt")
    val b = Seq((1L, 1L)).toDF("bucket", "w")
    val e = intercept[IllegalArgumentException](Joins.saltedJoin(p, b, Seq("bucket"), 4))
    assert(e.getMessage.contains("__salt"))
    val p2 = Seq((1L, true)).toDF("bucket", "__hot")
    val e2 = intercept[IllegalArgumentException](
      Joins.hotSaltedJoin(p2, b, Seq("bucket"), lit(1L), 1, 4))
    assert(e2.getMessage.contains("__hot"))
  }

  test("hotSaltedJoin: the storm bucket's pair product spreads over `factor` bounded groups") {
    val factor = 8
    val joined = Joins.hotSaltedJoinKeepSalt(
      bursty, buildSide, Seq("bucket"), col("v"), hotThreshold = 1000, factor = factor)
    val groups = joined.groupBy(col("bucket"), col("__salt")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // Storm bucket: pairs split across all `factor` salts, each group near
    // the fair share (9000/8 probe rows x 40 build rows), never the whole
    // 360k-pair product in one group.
    val storm = groups.filter(_._1 == 100L)
    assert(storm.length == factor, s"expected $factor storm groups, got ${storm.length}")
    val fair = 9000.0 / factor * 40
    storm.foreach { case (_, _, n) => assert(n <= fair * 1.5, s"group of $n vs fair share $fair") }
    // Cold buckets: exactly one salt group each — no replication paid.
    val cold = groups.filter(_._1 != 100L)
    assert(cold.forall(_._2 == 0) && cold.map(_._1).distinct.length == cold.length)
  }

  test("hotSaltedJoin: cold data pays no build replication") {
    val probe = (0 until 100).map(i => (i.toLong % 10, i.toLong)).toDF("bucket", "v")
    val build = (0 until 50).map(i => (i.toLong % 10, i.toLong)).toDF("bucket", "w")
    // Threshold above every count -> salt is 0 everywhere; build row count
    // through the join equals the plain join's (no explode fan-out).
    val plainN = probe.join(build, "bucket").count()
    val saltedN = Joins.hotSaltedJoin(probe, build, Seq("bucket"), col("v"), 1000, 8).count()
    assert(plainN == saltedN)
  }

  test("events_interval_join via hotSaltedJoin: hashes unchanged vs unsalted shape at sf0.001") {
    // The production query (high threshold: salting never triggers on test
    // data) must equal a low-threshold run (salting triggers on EVERY
    // bucket) — partitioning must never leak into results.
    val dir = "/root/testdata/sf0.001"
    val prod = graft.queries.Analytics.eventsIntervalJoin(spark, dir)
    val forced = graft.queries.Analytics.eventsIntervalJoinImpl(spark, dir, hotThreshold = 1, factor = 4)
    assert(prod.exceptAll(forced).isEmpty && forced.exceptAll(prod).isEmpty)
  }
}
