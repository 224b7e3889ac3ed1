package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(0.5, -0.5, 0.0), Seq(0.5, -0.5, 0.0))
  ).toDF("a", "b")

  test("native dot/cosine values match the HOF formulation bit-for-bit") {
    val hofDot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val hofCos = hofDot / (
      sqrt(aggregate(zip_with(col("a"), col("a"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)) *
        sqrt(aggregate(zip_with(col("b"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)))
    val rows = df.select(
      VectorFns.dot(col("a"), col("b")).as("nd"), hofDot.as("hd"),
      VectorFns.cosine(col("a"), col("b")).as("nc"), hofCos.as("hc")
    ).as[(Double, Double, Double, Double)].collect()
    rows.foreach { case (nd, hd, nc, hc) =>
      assert(java.lang.Double.doubleToLongBits(nd) == java.lang.Double.doubleToLongBits(hd))
      assert(java.lang.Double.doubleToLongBits(nc) == java.lang.Double.doubleToLongBits(hc))
    }
    assert(rows(0)._1 == 32.0)
  }

  test("expressions are registered as SQL functions via GraftExtensions") {
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT graft_dot(a, b) AS d, graft_cosine(a, a) AS c FROM vecs")
      .as[(Double, Double)].collect()
    assert(r(0)._1 == 32.0)
    assert(math.abs(r(0)._2 - 1.0) < 1e-12)
  }

  test("float-array scan casts cleanly and the plan stays in whole-stage codegen") {
    // A literal input constant-folds to LocalTableScan; use a real parquet
    // scan so the executed plan shows the codegen span.
    val fdf = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = fdf.select(
      VectorFns.cosine(
        VectorFns.toDouble(col("embedding")),
        VectorFns.toDouble(col("embedding"))).as("self_sim"))
    val sims = out.as[Double].collect()
    assert(sims.nonEmpty && sims.forall(s => math.abs(s - 1.0) < 1e-12))
    // "*(1) Project [graft_cosine(...)" — the * marks the whole-stage-codegen
    // span, i.e. doGenCode is actually used (an interpreted fallback would
    // render as a bare Project).
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_cosine"), plan)
  }
}
