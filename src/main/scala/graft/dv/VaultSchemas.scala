package graft.dv

import org.apache.spark.sql.types._

import graft.meta.{MetaStore, TableColumn}

/** Vault table schema builders — the StructType re-expression of the
  * reference's DDL templates (mallarddv/db/sql_templates.py:98-130:
  * CREATE_HUB / CREATE_LINK / CREATE_SAT).
  *
  * Layout invariants (shared with DvOps output column order):
  *   hub:  <base>_hk, load_dts, record_source, run_id, <business keys...>
  *   link: <base>_hk, load_dts, record_source, run_id, <legs + dks...>
  *   sat:  <hk>,      load_dts, del_flag, hash_diff, record_source, run_id, <fields...>
  */
object VaultSchemas {

  private val audit = Seq(
    StructField("load_dts", TimestampType, nullable = false),
    StructField("record_source", StringType, nullable = false),
    StructField("run_id", LongType, nullable = false)
  )

  private def payload(cols: Seq[TableColumn], mapping: String): Seq[StructField] =
    cols.filter(_.mapping == mapping)
      .sortBy(_.columnPosition)
      .map(c => StructField(c.columnName, MetaStore.sqlType(c.columnType), nullable = true))

  /** `dv.hub_<base>`: hash key + audit + business keys (mapping `bk`). */
  def hub(baseName: String, cols: Seq[TableColumn]): StructType =
    StructType(
      StructField(s"${baseName}_hk", StringType, nullable = false) +:
        (audit ++ payload(cols, "bk")))

  /** `dv.link_<base>` / `dv.nhl_<base>`: hash key + audit + leg hash keys
    * (mapping `hk`, stored as `<name>_hk`) + degenerate keys (mapping `dk`). */
  def link(baseName: String, cols: Seq[TableColumn]): StructType = {
    val legs = cols.filter(_.mapping == "hk").sortBy(_.columnPosition)
      .map(c => StructField(s"${c.columnName}_hk", StringType, nullable = false))
    val dks = payload(cols, "dk")
    StructType(
      StructField(s"${baseName}_hk", StringType, nullable = false) +:
        (audit ++ legs ++ dks))
  }

  /** `dv.hsat_<base>` / `dv.lsat_<base>`: parent hash key + SCD2 audit
    * (del_flag, hash_diff) + payload fields (mapping `f`). */
  def sat(hkName: String, cols: Seq[TableColumn]): StructType =
    StructType(
      Seq(
        StructField(hkName, StringType, nullable = false),
        StructField("load_dts", TimestampType, nullable = false),
        StructField("del_flag", BooleanType, nullable = false),
        StructField("hash_diff", StringType, nullable = false),
        StructField("record_source", StringType, nullable = false),
        StructField("run_id", LongType, nullable = false)
      ) ++ payload(cols, "f"))

  /** Staging schema straight from metadata `c` columns. */
  def staging(cols: Seq[TableColumn]): StructType =
    StructType(
      cols.filter(_.mapping == "c").sortBy(_.columnPosition)
        .map(c => StructField(c.columnName, MetaStore.sqlType(c.columnType), nullable = true)))
}
