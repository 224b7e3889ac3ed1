package graft

import java.security.MessageDigest

import graft.dv.{HashGen, HashView}
import graft.meta.Transition

class HashViewSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("hub hash key matches the reference formula md5(upper(concat_ws))") {
    val df = Seq((1L, "ann"), (2L, null)).toDF("id", "name")
    val ts = Seq(
      Transition("t", "id", "hub_t", "id_bk", "t", 1, raw = false, None, "bk"),
      Transition("t", "name", "hsat_t", "name", "d", 1, raw = false, None, "f"))
    val out = HashView.build(df, ts, HashGen.Md5)
      .select("t_hk", "d_hashdiff").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out(0)._1 == md5Hex("1"))
    assert(out(0)._2 == md5Hex("ANN"))
    assert(out(1)._2 == md5Hex("")) // NULL -> ''
  }

  test("conflicting transformations for one source field throw") {
    val df = Seq((1L, "x")).toDF("id", "name")
    val ts = Seq(
      Transition("t", "name", "hsat_t", "name", "d1", 1, raw = false, Some("trim(#)"), "f"),
      Transition("t", "name", "hsat_t", "name2", "d2", 1, raw = false, Some("upper(#)"), "f"))
    val e = intercept[IllegalArgumentException](HashView.build(df, ts, HashGen.Md5))
    assert(e.getMessage.contains("conflicting transformations"))
  }

  test("link leg referencing an unknown hub group throws") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val ts = Seq(
      Transition("t", "nope", "link_x", "nope_hk", "l", 1, raw = false, None, "ll"))
    val e = intercept[IllegalArgumentException](HashView.build(df, ts, HashGen.Md5))
    assert(e.getMessage.contains("unknown hub group"))
  }

  test("link hash resolves legs to hub bk fields plus degenerate keys") {
    val df = Seq((10L, 20L, "P")).toDF("cid", "oid", "prio")
    val ts = Seq(
      Transition("t", "cid", "hub_c", "cid_bk", "c", 1, raw = false, None, "bk"),
      Transition("t", "oid", "hub_o", "oid_bk", "o", 1, raw = false, None, "bk"),
      Transition("t", "c", "link_co", "c_hk", "co", 1, raw = false, None, "ll"),
      Transition("t", "o", "link_co", "o_hk", "co", 2, raw = false, None, "ll"),
      Transition("t", "prio", "link_co", "prio_dk", "co", 3, raw = false, None, "dk"))
    val r = HashView.build(df, ts, HashGen.Md5).select("co_hk").head().getString(0)
    assert(r == md5Hex("10||20||P"))
  }
}
