package graft

import graft.core.ScriptViews
import graft.meta.{MetaStore, TableColumn}

class ScriptViewsSpec extends SparkSpec {
  import spark.implicits._

  test("apply registers metadata-declared views from script files") {
    val dir = tmpDir("scripts")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "bv"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "bv", "big_customers.sql"),
      "SELECT id, name FROM src_customers WHERE id > 1;")
    Seq((1L, "ann"), (2L, "bob"), (3L, "cat")).toDF("id", "name")
      .createOrReplaceTempView("src_customers")

    val meta = MetaStore(
      Seq(TableColumn("big_customers", "bv_vw", "", "", 1, "vwdef")), Nil)
    val applied = ScriptViews.apply(spark, meta, "bv_vw", dir)
    assert(applied == Seq("big_customers"))
    assert(spark.table("big_customers").count() == 2)
  }

  test("missing script file throws with the path in the message") {
    val meta = MetaStore(Seq(TableColumn("ghost", "dm_vw", "", "", 1, "vwdef")), Nil)
    val e = intercept[IllegalArgumentException](
      ScriptViews.apply(spark, meta, "dm_vw", tmpDir("scripts")))
    assert(e.getMessage.contains("ghost.sql"))
  }

  test("unknown layer throws") {
    intercept[IllegalArgumentException](
      ScriptViews.apply(spark, MetaStore(Nil, Nil), "nope_vw", "/tmp"))
  }
}
