package graft

import org.apache.spark.sql.types._

import graft.meta.MetaStore

class MetaSpec extends SparkSpec {

  test("sqlType maps single- and multi-word declarations") {
    assert(MetaStore.sqlType("INTEGER") == IntegerType)
    assert(MetaStore.sqlType("bigint") == LongType)
    assert(MetaStore.sqlType("DOUBLE PRECISION") == DoubleType)
    assert(MetaStore.sqlType("double  precision") == DoubleType)
    assert(MetaStore.sqlType("CHARACTER VARYING") == StringType)
    assert(MetaStore.sqlType("VARCHAR(255)") == StringType)
    assert(MetaStore.sqlType("DECIMAL(10,2)") == DecimalType(10, 2))
    assert(MetaStore.sqlType("NUMERIC") == DecimalType(38, 18))
    assert(MetaStore.sqlType("TIMESTAMP WITHOUT TIME ZONE") == TimestampType)
    // digit-bearing bases: INT8 used to strip to INT → IntegerType, and the
    // staging cast then silently NULLed every bigint above 2^31-1
    assert(MetaStore.sqlType("INT8") == LongType)
    assert(MetaStore.sqlType("INT4") == IntegerType)
    assert(MetaStore.sqlType("INT2") == ShortType)
    assert(MetaStore.sqlType("INT1") == ByteType)
    assert(MetaStore.sqlType("FLOAT8") == DoubleType)
    assert(MetaStore.sqlType("FLOAT4") == FloatType)
    // REAL is float4 in the DuckDB/Postgres family the metadata comes from
    assert(MetaStore.sqlType("REAL") == FloatType)
  }

  test("sqlType throws on unknown types instead of degrading to string") {
    val e = intercept[IllegalArgumentException](MetaStore.sqlType("GEOGRAPHY"))
    assert(e.getMessage.contains("GEOGRAPHY"))
    intercept[IllegalArgumentException](MetaStore.sqlType(""))
  }

  test("fromCsv loads the reference CSV layout") {
    val dir = tmpDir("meta")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "tables.csv"),
      """base_name,rel_type,column_name,column_type,column_position,mapping
        |customer,stg,c_custkey,BIGINT,1,c
        |customer,stg,c_name,VARCHAR,2,c
        |customer,hub,c_custkey,BIGINT,1,bk
        |""".stripMargin)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "transitions.csv"),
      """source_table,source_field,target_table,target_field,group_name,position,raw,transformation,transfer_type
        |customer,c_custkey,hub_customer,c_custkey_bk,customer,1,false,,bk
        |customer,c_name,hsat_customer,c_name,customer_details,1,false,trim(#),f
        |""".stripMargin)
    val m = MetaStore.fromCsv(spark, s"$dir/tables.csv", s"$dir/transitions.csv")
    assert(m.stagingTables == Seq("customer"))
    assert(m.getTables(Some("customer"), Some("stg")).map(_.columnName) == Seq("c_custkey", "c_name"))
    val ts = m.getTransitions("customer")
    assert(ts.size == 2)
    assert(ts.find(_.transferType == "f").get.transformation.contains("trim(#)"))
  }
}
