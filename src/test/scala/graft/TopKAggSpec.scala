package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** The native bounded-heap top-k aggregate ([[graft.functions.TopKDoubles]]):
  * window-formulation equivalence, SQL registration, plan shape. */
class TopKAggSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("graft_topk equals the sort-window top-k on every group") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val viaAgg = orders.groupBy(col("o_custkey"))
      .agg(VectorFns.topK(col("o_totalprice"), 3).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(col("o_totalprice")), asc = false).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(viaAgg.keySet == viaWindow.keySet)
    viaAgg.foreach { case (k, v) => assert(v == viaWindow(k), s"cust $k") }
    // groups smaller than k return all their values
    assert(viaAgg.values.exists(_.size < 3) || viaAgg.values.forall(_.size == 3))
  }

  test("graft_topk is SQL-registered via GraftExtensions") {
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("orders_tk")
    val r = spark.sql(
      "SELECT o_custkey, graft_topk(o_totalprice, 2) AS top FROM orders_tk GROUP BY 1")
    val row = r.filter(col("o_custkey").isNotNull).limit(1).collect().head
    val top = row.getSeq[Double](1)
    assert(top.size <= 2 && top == top.sorted.reverse)
  }

  test("graft_topk over a window is non-destructive across output rows") {
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("orders_tkw")
    val rows = spark.sql(
      """SELECT o_custkey, graft_topk(o_totalprice, 2) OVER (PARTITION BY o_custkey) AS top
        |FROM orders_tkw""".stripMargin).collect()
    assert(rows.nonEmpty)
    // every row of a partition must carry the same non-empty array — a
    // destructive eval returns it only for the first row of each partition
    rows.groupBy(_.getLong(0)).foreach { case (cust, rs) =>
      val tops = rs.map(_.getSeq[Double](1)).distinct
      assert(tops.size == 1 && tops.head.nonEmpty, s"cust $cust: ${tops.toSeq}")
    }
  }

  test("NaN ranks above all doubles, matching Spark's sort-desc order") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", Double.NaN), ("a", 5.0), ("a", 3.0)).toDF("g", "v")
    val top = df.groupBy($"g").agg(VectorFns.topK($"v", 2).as("top"))
      .collect().head.getSeq[Double](1)
    assert(top.head.isNaN, top)
    assert(top(1) == 5.0, top)
  }

  test("k accepts any foldable integral expression (BIGINT literal, 1+2)") {
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("orders_tkf")
    val viaLong = spark.sql(
      "SELECT graft_topk(o_totalprice, CAST(2 AS BIGINT)) AS top FROM orders_tkf")
      .collect().head.getSeq[Double](0)
    assert(viaLong.size <= 2)
    val viaFold = spark.sql(
      "SELECT graft_topk(o_totalprice, 1 + 2) AS top FROM orders_tkf")
      .collect().head.getSeq[Double](0)
    assert(viaFold.size <= 3)
  }

  test("plan: hash-based heap aggregation over ONE key-clustered exchange") {
    // topk_spend_per_cust clusters by key first (Tables.clusterBy): on the
    // unclustered bench layouts a below-exchange partial collapses nothing
    // while allocating a heap per input row, so the intended shape is
    // exchange-then-aggregate (both partials above the one repartition),
    // hash-based (ObjectHashAggregate), wave-granular. A second exchange
    // appearing would mean the groupBy stopped reusing the clusterBy
    // distribution.
    val p = graft.queries.Analytics.topkSpendPerCust(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_graft_topk"), p)
    assert("Exchange".r.findAllIn(p).size == 1, s"one exchange expected:\n$p")
    assert(p.indexOf("Exchange") > p.lastIndexOf("ObjectHashAggregate"), p)
  }
}
