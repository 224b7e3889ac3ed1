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

  test("CREATE scripts headed by SQL comments run as CREATE, not as a shadowing temp view") {
    // a comment banner before CREATE used to route the script down the
    // SELECT branch: spark.sql still executed the CREATE (commands run
    // eagerly), then createOrReplaceTempView SHADOWED the created view
    // with the command's empty zero-column result
    Seq((1L, "ann"), (2L, "bob")).toDF("id", "name")
      .createOrReplaceTempView("src_people")
    ScriptViews.register(spark, "people_vw",
      """-- business view over people
        |/* generated; do not edit */
        |CREATE OR REPLACE TEMPORARY VIEW people_vw AS
        |SELECT id, name FROM src_people WHERE id > 1;""".stripMargin)
    assert(spark.table("people_vw").columns.toSeq == Seq("id", "name"))
    assert(spark.table("people_vw").count() == 1)
    // plain SELECT with a leading comment still lands as a temp view
    ScriptViews.register(spark, "people_all_vw",
      "-- all of them\nSELECT id FROM src_people")
    assert(spark.table("people_all_vw").count() == 2)
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
