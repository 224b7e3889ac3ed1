package graft

import org.apache.spark.sql.functions._

import graft.dv.HashGen

/** [[graft.functions.DvHash]] equivalence: the fused native hash must be
  * bit-identical to the composed built-in formulation
  * `hex(digest(upper(concat_ws('||', coalesce(f::string,''), …))))` it
  * replaced — including NULL fields, non-ASCII uppercasing, and both the
  * codegen and interpreted eval paths. */
class HashExprSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("plain", Some("value"), Some(42L)),
    ("null-field", None, Some(7L)),
    ("both-null", None, None),
    ("unicode ß sigma ς", Some("Ärger 中文 𝒳"), Some(1L)),
    ("empty", Some(""), Some(0L)),
    ("pipes||in||data", Some("||"), Some(-3L))
  ).toDF("a", "b", "c")

  private def composed(algo: String) = {
    val upped = upper(concat_ws("||",
      coalesce(col("a").cast("string"), lit("")),
      coalesce(col("b").cast("string"), lit("")),
      coalesce(col("c").cast("string"), lit(""))))
    algo match {
      case "md5"    => md5(upped)
      case "sha1"   => sha1(upped)
      case "sha256" => sha2(upped, 256)
    }
  }

  test("DvHash matches composed built-ins for md5/sha1/sha256 incl. nulls and unicode") {
    for (algo <- Seq("md5", "sha1", "sha256")) {
      val out = rows.select(
        HashGen.hashCols(Seq(col("a"), col("b"), col("c")), HashGen.Algo(algo)).as("fused"),
        composed(algo).as("ref"))
      val mismatches = out.filter(col("fused") =!= col("ref")).count()
      assert(mismatches == 0, s"algo=$algo")
    }
  }

  test("DvHash interpreted eval matches codegen") {
    // Force the interpreted path through a literal-only eval.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val e = graft.functions.DvHash(
      Seq(Literal(UTF8String.fromString("abc"), org.apache.spark.sql.types.StringType),
        Literal(null, org.apache.spark.sql.types.StringType)),
      graft.functions.DvHashRuntime.Md5)
    val interpreted = e.eval(null).toString
    val viaSql = rows.sparkSession.sql("SELECT md5(upper('abc||'))").head().getString(0)
    assert(interpreted == viaSql)
  }

  test("graft_dv_hash is callable from SQL") {
    rows.createOrReplaceTempView("hash_rows")
    val out = spark.sql(
      "SELECT graft_dv_hash('md5', a, b, cast(c as string)) AS h FROM hash_rows")
    assert(out.count() == 6)
    assert(out.filter(length(col("h")) === 32).count() == 6)
  }
}
