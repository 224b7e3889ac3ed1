package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.dv.HashGen

/** Run the REFERENCE'S OWN demo — its metadata CSVs, its customer file, its
  * stg view script, verbatim — through the Spark engine. This is the
  * "a reference user can switch" proof: same tables.csv/transitions.csv, same
  * data, same scripts, reference-identical vault contents.
  *
  * The demo exercises paths the synthetic tests don't: two bk groups loading
  * the SAME hub (self-referencing customer/referencer), NULL business keys,
  * a self-link with a degenerate key, a link satellite with no payload
  * fields (hashdiff falls back to the link hash key), and a stg_vw script
  * with `stg.`-qualified names.
  */
class DemoParitySpec extends SparkSpec {

  private val demo = "/root/reference/demo"

  test("reference demo runs verbatim: metadata, flow, scripts") {
    val root = tmpDir("demo")
    val g = Graft.fromCsv(
      spark, s"$root/lake",
      s"$demo/tables.csv", s"$demo/transitions.csv",
      scriptsPath = Some(s"$demo/models"),
      algo = HashGen.Md5)

    val created = g.initVault()
    assert(created.contains("dv.hub_customer"))
    assert(created.contains("dv.hub_product"))
    assert(created.contains("dv.link_customer__referencer"))
    assert(created.contains("dv.lsat_customer__referencer"))
    assert(created.contains("stg_vw.customer_vw"))
    // composite product hub got _cbk business keys
    assert(g.table("dv", "hub_product").columns.toSeq.takeRight(2) == Seq("id_cbk", "product_type_cbk"))

    val r = g.executeFlow(
      "customer", "demo-customer", Some(s"$demo/data/customer.csv"),
      Some(Timestamp.valueOf("2026-01-01 00:00:00")))
    assert(r.status == "success", r.errors.mkString("; "))

    // hub: ids 1,2 from the customer group + the NULL referenced_by key from
    // the referencer group (md5('') — the reference inserts it too); id 1
    // arrives twice and the second group's anti-join drops it.
    val hub = g.table("dv", "hub_customer")
    assert(hub.count() == 3)
    assert(hub.filter(col("id_bk").isNull).count() == 1)

    // self-link with degenerate key: 2 staged combinations, both new.
    val link = g.table("dv", "link_customer__referencer")
    assert(link.count() == 2)
    assert(link.columns.contains("customer_hk") && link.columns.contains("referencer_hk")
      && link.columns.contains("reference_code_dk"))

    // link satellite with NO payload fields: hashdiff = the link hash key.
    val lsat = g.table("dv", "lsat_customer__referencer")
    assert(lsat.count() == 2)
    assert(lsat.select(col("customer__referencer_hk") === col("hash_diff")).collect().forall(_.getBoolean(0)))

    // hub satellite payload (mapped as `c` in the demo metadata).
    assert(g.table("dv", "hsat_customer_details").count() == 2)

    // the reference's stg view script ran verbatim against stg.customer.
    val vw = g.sql("SELECT * FROM stg.customer_vw")
    assert(vw.count() == 2)
    assert(vw.columns.contains("email"))

    // idempotency on the demo file, exactly like the reference's runner.
    assert(g.executeFlow("customer", "demo-customer", Some(s"$demo/data/customer.csv")).skipped)
  }
}
