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

  /** The SCD2 satellite header (hk + audit) — single source of truth for
    * VaultSchemas.sat, FlowExecutor and StreamingDv. */
  def satAudit(hkName: String): Seq[StructField] = Seq(
    StructField(hkName, StringType, nullable = false),
    StructField("load_dts", TimestampType, nullable = false),
    StructField("del_flag", BooleanType, nullable = false),
    StructField("hash_diff", StringType, nullable = false),
    StructField("record_source", StringType, nullable = false),
    StructField("run_id", LongType, nullable = false)
  )

  /** Satellite schema from (column name → type) payload pairs (used by the
    * loaders, which know target columns but have no TableColumn metadata). */
  def satFromFields(hkName: String, fields: Seq[(String, DataType)]): StructType =
    StructType(satAudit(hkName) ++ fields.map { case (n, t) => StructField(n, t, nullable = true) })

  /** `dv.hub_<base>`: hash key + audit + business keys — `_bk` suffix when
    * single, `_cbk` when composite (hub_manager.py:66-69). */
  def hub(baseName: String, cols: Seq[TableColumn]): StructType = {
    val bks = cols.filter(_.mapping == "bk").sortBy(_.columnPosition)
    val suffix = if (bks.size > 1) "_cbk" else "_bk"
    StructType(
      StructField(s"${baseName}_hk", StringType, nullable = false) +:
        (audit ++ bks.map(c =>
          StructField(s"${c.columnName}$suffix", MetaStore.sqlType(c.columnType), nullable = true))))
  }

  /** `dv.link_<base>` / `dv.nhl_<base>`: hash key + audit + leg hash keys
    * (mapping `ll` → `<name>_hk`) + degenerate keys (everything else →
    * `<name>_dk`, link_manager.py:85-95). */
  def link(baseName: String, cols: Seq[TableColumn]): StructType = {
    val sorted = cols.sortBy(_.columnPosition)
    val legs = sorted.filter(_.mapping == "ll")
      .map(c => StructField(s"${c.columnName}_hk", StringType, nullable = false))
    val dks = sorted.filter(_.mapping != "ll")
      .map(c => StructField(s"${c.columnName}_dk", MetaStore.sqlType(c.columnType), nullable = true))
    StructType(
      StructField(s"${baseName}_hk", StringType, nullable = false) +:
        (audit ++ legs ++ dks))
  }

  /** `dv.hsat_<base>` / `dv.lsat_<base>`: parent hash key + SCD2 audit
    * (del_flag, hash_diff) + payload = every non-`hk` column
    * (satellite_manager.py:165-175 — the demo metadata maps payloads as
    * both `c` and `f`). */
  def sat(hkName: String, cols: Seq[TableColumn]): StructType =
    StructType(
      satAudit(hkName) ++ cols.filter(_.mapping != "hk").sortBy(_.columnPosition)
        .map(c => StructField(c.columnName, MetaStore.sqlType(c.columnType), nullable = true)))

  /** Staging schema straight from metadata `c` columns. */
  def staging(cols: Seq[TableColumn]): StructType =
    StructType(
      cols.filter(_.mapping == "c").sortBy(_.columnPosition)
        .map(c => StructField(c.columnName, MetaStore.sqlType(c.columnType), nullable = true)))
}
