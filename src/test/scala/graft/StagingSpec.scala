package graft

import org.apache.spark.sql.types._

import graft.etl.Staging
import graft.meta.{MetaStore, TableColumn}

class StagingSpec extends SparkSpec {
  import spark.implicits._

  private val meta = MetaStore(
    tables = Seq(
      TableColumn("t", "stg", "id", "BIGINT", 1, "c"),
      TableColumn("t", "stg", "name", "VARCHAR", 2, "c"),
      TableColumn("t", "stg", "amount", "DOUBLE PRECISION", 3, "c")
    ),
    transitions = Nil)

  test("loadFile: csv with explicit metadata schema (no inference)") {
    val dir = tmpDir("stg")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "in.csv"), "id,name,amount\n1,ann,1.5\n2,bob,2.5")
    val df = Staging.loadFile(spark, meta, "t", s"$dir/in.csv")
    assert(df.schema == StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("amount", DoubleType))))
    assert(df.as[(Long, String, Double)].collect().sorted.toSeq ==
      Seq((1L, "ann", 1.5), (2L, "bob", 2.5)))
  }

  test("loadFile: csv whose header order differs from metadata fails loudly, not silently transposed") {
    // With Spark's default enforceSchema=true the header row is skipped and
    // the explicit schema applies POSITIONALLY — name values would land in
    // id and vice versa, corrupting every downstream hash key. The loud
    // failure is the contract.
    val dir = tmpDir("stg")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "bad.csv"), "name,id,amount\nann,1,1.5")
    val e = intercept[Exception] {
      Staging.loadFile(spark, meta, "t", s"$dir/bad.csv").collect()
    }
    assert(e.getMessage != null)
  }

  test("loadFile: json lines and parquet round-trip through the same schema") {
    val dir = tmpDir("stg")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "in.jsonl"),
      """{"id": 1, "name": "ann", "amount": 1.5}""")
    val j = Staging.loadFile(spark, meta, "t", s"$dir/in.jsonl")
    assert(j.schema.fieldNames.toSeq == Seq("id", "name", "amount"))
    assert(j.count() == 1)

    Seq((5L, "eve", 9.0)).toDF("id", "name", "amount")
      .write.parquet(s"$dir/in.parquet")
    val p = Staging.loadFile(spark, meta, "t", s"$dir/in.parquet")
    assert(p.schema.fields.map(_.dataType).toSeq == Seq(LongType, StringType, DoubleType))
  }

  test("loadFile: orc projects and casts through the same schema") {
    val dir = tmpDir("stg")
    Seq((7L, "gil", 3.5)).toDF("id", "name", "amount").write.orc(s"$dir/in.orc")
    val o = Staging.loadFile(spark, meta, "t", s"$dir/in.orc")
    assert(o.schema.fields.map(_.dataType).toSeq == Seq(LongType, StringType, DoubleType))
    assert(o.count() == 1)
  }

  test("loadFile: unsupported extension throws") {
    intercept[IllegalArgumentException](Staging.loadFile(spark, meta, "t", "/x/in.xlsx"))
  }
}
