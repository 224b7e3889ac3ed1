package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.dv.HashGen
import graft.meta.{MetaStore, TableColumn, Transition}

class GraftFacadeSpec extends SparkSpec {
  import spark.implicits._

  private def meta = MetaStore(
    tables = Seq(
      TableColumn("customer", "stg", "c_custkey", "BIGINT", 1, "c"),
      TableColumn("customer", "stg", "c_name", "VARCHAR", 2, "c"),
      TableColumn("customer", "hub", "c_custkey", "BIGINT", 1, "bk"),
      TableColumn("customer", "hsat", "customer", "", 0, "hk"),
      TableColumn("customer", "hsat", "c_name", "VARCHAR", 1, "f"),
      TableColumn("big_customers", "bv_vw", "", "", 1, "vwdef")
    ),
    transitions = Seq(
      Transition("customer", "c_custkey", "hub_customer", "c_custkey_bk", "customer", 1, raw = false, None, "bk"),
      Transition("customer", "c_name", "hsat_customer", "c_name", "customer_details", 1, raw = false, None, "f"),
      Transition("customer", "customer_hk", "hsat_customer", "customer", "customer_details", 0, raw = false, None, "sat_delta")
    ))

  test("facade: initVault -> executeFlow -> hashView -> currentView -> sql") {
    val root = tmpDir("graft")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "scripts", "bv"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "scripts", "bv", "big_customers.sql"),
      "SELECT customer_hk, c_name FROM hsat_customer_cv WHERE c_name LIKE 'a%'")

    val g = new Graft(spark, s"$root/lake", meta, Some(s"$root/scripts"), HashGen.Md5)

    val created = g.initVault()
    assert(created.contains("stg.customer"))
    assert(created.contains("dv.hub_customer"))
    assert(created.contains("dv.hsat_customer"))
    assert(g.table("dv", "hub_customer").isEmpty) // empty but typed

    val f = s"$root/c.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
      "c_custkey,c_name\n1,ann\n2,bob\n3,alice")
    val r = g.executeFlow("customer", "facade", Some(f), Some(Timestamp.valueOf("2026-01-01 00:00:00")))
    assert(r.status == "success")
    assert(g.table("dv", "hub_customer").count() == 3)

    val hv = g.hashView("customer")
    assert(hv.columns.contains("customer_hk") && hv.columns.contains("customer_details_hashdiff"))

    val cv = g.currentView("hsat_customer")
    assert(cv.count() == 3)

    // script view over the current view via plain SQL
    g.applyScripts("bv_vw")
    assert(g.sql("SELECT * FROM big_customers").as[(String, String)].collect()
      .map(_._2).sorted.toSeq == Seq("alice", "ann"))

    assert(g.runinfo.filter(col("status") === "success").count() == 1)

    // parameterized sql — positional `?` (reference mallarddv.py:87-98
    // sql(sql_str, sql_args)) and named `:name` binding
    assert(g.sql("SELECT c_name FROM big_customers WHERE c_name = ?", Seq("alice"))
      .as[String].collect().toSeq == Seq("alice"))
    assert(g.sql("SELECT count(*) FROM big_customers WHERE c_name LIKE :p", Map("p" -> "a%"))
      .as[Long].head() == 2L)
  }
}
