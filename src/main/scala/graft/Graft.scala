package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.{Lake, ScriptViews}
import graft.dv.{DvOps, HashGen, HashView, VaultSchemas}
import graft.etl.{FlowExecutor, FlowResult, Staging}
import graft.meta.MetaStore

/** Top-level facade — the Spark-native counterpart of the reference's
  * `MallardDataVault` entry class (mallarddv/mallarddv.py:23-430). One object
  * wires lake + metadata + flow executor + script views behind the same
  * surface a reference user drives:
  *
  *   reference                        graft
  *   ------------------------------  -------------------------------------
  *   MallardDataVault(db, scripts)   Graft(spark, lakeRoot, meta, scripts)
  *   .sql(...)                       .sql(...)           (Spark SQL)
  *   .init_mallard_db(...)           .initVault()        (lake layout + views)
  *   .compute_hash_view(stg)         .hashView(stg)
  *   .load_related_hubs/links/sats   .executeFlow(...)   (single flow call)
  *   .create_*_from_metadata         .initVault() / VaultSchemas builders
  *   .create_current_sat_*           .currentView(sat)
  *   .apply_script_from_metadata     .applyScripts(relType)
  *   .execute_flow(...)              .executeFlow(...)
  *   .overwrite_metadata_from_files  MetaStore.fromCsv + new Graft(...)
  *
  * Everything is lazy DataFrames over the lake — `sql`/`table` results
  * compose with any Spark code the user already has.
  */
final class Graft(
    val spark: SparkSession,
    val lakeRoot: String,
    val meta: MetaStore,
    val scriptsPath: Option[String] = None,
    val algo: HashGen.Algo = HashGen.Sha1,
    val buckets: Int = 16
) {

  val lake = new Lake(spark, lakeRoot, buckets)
  val flow = new FlowExecutor(lake, meta, algo)

  /** Raw SQL escape hatch (reference mallarddv.py:87). */
  def sql(sqlText: String): DataFrame = spark.sql(sqlText)

  /** Parameterized SQL with positional `?` markers (reference
    * mallarddv.py:87-98 `sql(sql_str, sql_args)`). Literals are bound by
    * the parser, not spliced into the text — the injection-safe path the
    * reference's list-args API provides on DuckDB. */
  def sql(sqlText: String, args: Seq[Any]): DataFrame =
    spark.sql(sqlText, args.toArray)

  /** Parameterized SQL with named `:name` markers (Spark-side extension —
    * same binding mechanics, friendlier for many-arg queries). */
  def sql(sqlText: String, args: Map[String, Any]): DataFrame =
    spark.sql(sqlText, args)

  /** A lake table as a DataFrame (`layer.name`). */
  def table(layer: String, name: String): DataFrame = lake.read(layer, name)

  /** Initialize the vault: materialize empty hub/link/sat/staging tables
    * from metadata so first loads and views have a schema to bind to, and
    * register script views when a scripts path is set (reference
    * init_mallard_db). Idempotent — existing tables are left alone. */
  def initVault(): Seq[String] = {
    val created = scala.collection.mutable.ArrayBuffer.empty[String]
    // Layer databases in the session catalog, so user scripts written for the
    // reference (`... from stg.customer`, `create view stg.customer_vw ...`)
    // run verbatim through spark.sql.
    Seq("stg", "dv", "bv", "dm").foreach(l => spark.sql(s"CREATE DATABASE IF NOT EXISTS $l"))
    // Data creation happens only when missing, but catalog/view registration
    // runs UNCONDITIONALLY: a new session re-opening an existing lake has an
    // empty in-memory catalog and still needs `stg.<name>` and `<sat>_cv`.
    def ensure(layer: String, name: String, schema: org.apache.spark.sql.types.StructType): Unit = {
      if (!lake.exists(layer, name)) {
        // repartition(1) forces one (empty) part file so the location carries
        // a readable schema for the catalog table below.
        lake.overwrite(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema).repartition(1), layer, name)
        created += s"$layer.$name"
      }
      // Staging tables are flat (truncate-and-load) → safe to expose as
      // catalog tables; vault tables are hk-bucketed partitioned dirs and
      // stay DataFrame/current-view surfaces. Drop-then-create so a
      // leftover registration from another lake in this session can't
      // shadow this one (the catalog holds one `stg.<name>` per session).
      if (layer == "stg") {
        spark.sql(s"DROP TABLE IF EXISTS $layer.$name")
        spark.sql(s"CREATE TABLE $layer.$name USING PARQUET LOCATION '${lake.tablePath(layer, name)}'")
      }
    }
    val byTable = meta.tables.groupBy(t => (t.relType, t.baseName))
    byTable.toSeq.sortBy(_._1).foreach { case ((relType, base), cols) =>
      relType match {
        case "stg" => ensure("stg", base, VaultSchemas.staging(cols))
        case "hub" => ensure("dv", s"hub_$base", VaultSchemas.hub(base, cols))
        case "link" => ensure("dv", s"link_$base", VaultSchemas.link(base, cols))
        case "nhl" => ensure("dv", s"nhl_$base", VaultSchemas.link(base, cols))
        case "hsat" | "lsat" =>
          ensure("dv", s"${relType}_$base", VaultSchemas.sat(satHkOf(base, cols), cols))
          // Current views exist from init (reference creates bv.<sat>_cv in
          // init_mallard_db before applying scripts); refreshed after every
          // executeFlow since the registered plan pins the file listing.
          registerCurrentView(s"${relType}_$base", satHkOf(base, cols))
        case _ => () // view layers are registered below, not materialized
      }
    }
    scriptsPath.foreach { p =>
      Seq("stg_vw", "bv_vw", "dm_vw").foreach { rt =>
        if (meta.getTables(relType = Some(rt)).nonEmpty)
          created ++= ScriptViews.apply(spark, meta, rt, p).map(v => s"$rt.$v")
      }
    }
    created.toSeq
  }

  private def satHkOf(base: String, cols: Seq[graft.meta.TableColumn]): String =
    cols.find(_.mapping == "hk").map(c => s"${c.columnName}_hk").getOrElse(s"${base}_hk")

  private def registerCurrentView(satTable: String, hk: String): Unit =
    DvOps.currentRows(lake.read("dv", satTable), hk).createOrReplaceTempView(s"${satTable}_cv")

  /** Re-register metadata-declared current views over the lake's CURRENT
    * file listing (temp-view plans pin the listing at registration). `only`
    * restricts to the named sat tables — flows refresh just what they
    * touched instead of re-listing every satellite. */
  private def refreshCurrentViews(only: Option[Set[String]] = None): Unit =
    meta.tables.groupBy(t => (t.relType, t.baseName)).foreach {
      case ((relType, base), cols) if relType == "hsat" || relType == "lsat" =>
        val table = s"${relType}_$base"
        if (only.forall(_.contains(table)) && lake.exists("dv", table))
          registerCurrentView(table, satHkOf(base, cols))
      case _ => ()
    }

  /** Compact a vault table and re-register any current view pinned to its
    * old files ([[Lake.compact]] alone would leave `<sat>_cv` chasing
    * deleted parts). */
  def compact(layer: String, name: String): (Long, Long) = {
    val r = lake.compact(layer, name)
    refreshCurrentViews(Some(Set(name)))
    r
  }

  /** Metadata-driven hash view over a staging table (reference
    * compute_hash_view; here a lazy DataFrame, not a stored view). */
  def hashView(stgTable: String): DataFrame =
    HashView.build(lake.read("stg", stgTable), meta.getTransitions(stgTable), algo)

  /** Latest-row current view of a satellite (reference
    * create_current_sat_from_metadata); registered as `<sat>_cv`. */
  def currentView(satTable: String): DataFrame = {
    val hk = lake.read("dv", satTable).columns.headOption.getOrElse(
      throw new IllegalArgumentException(s"empty satellite: $satTable"))
    val cv = DvOps.currentRows(lake.read("dv", satTable), hk)
    cv.createOrReplaceTempView(s"${satTable}_cv")
    cv
  }

  /** Apply one script-view layer (reference apply_script_from_metadata). */
  def applyScripts(relType: String): Seq[String] =
    ScriptViews.apply(spark, meta, relType,
      scriptsPath.getOrElse(throw new IllegalArgumentException("no scripts path configured")))

  /** Run a complete load flow (reference execute_flow). Catalog-registered
    * staging tables are refreshed afterwards so `stg.<table>` views see the
    * truncate-and-loaded data. */
  def executeFlow(
      sourceTable: String,
      recordSource: String,
      filePath: Option[String] = None,
      loadDts: Option[Timestamp] = None,
      forceLoad: Boolean = false
  ): FlowResult = {
    val r = flow.executeFlow(sourceTable, recordSource, filePath, loadDts, forceLoad)
    scala.util.Try(spark.catalog.refreshByPath(lake.tablePath("stg", sourceTable)))
    // Current views pin their file listing at registration — refresh the
    // ones this flow touched so `<sat>_cv` reflects the appends (reference
    // views are live).
    if (!r.skipped) refreshCurrentViews(Some(r.loaded.keySet.filter(t => t.startsWith("hsat_") || t.startsWith("lsat_"))))
    r
  }

  /** The run ledger (reference metadata.runinfo). */
  def runinfo: DataFrame = flow.runinfo
}

object Graft {
  /** Reload metadata from CSV into a new facade over the SAME lake
    * (reference overwrite_metadata_from_files — metadata evolves without
    * touching vault data). */
  def reloadMetadata(g: Graft, tablesCsv: String, transitionsCsv: String): Graft =
    new Graft(g.spark, g.lakeRoot, MetaStore.fromCsv(g.spark, tablesCsv, transitionsCsv),
      g.scriptsPath, g.algo, g.buckets)

  /** Construct from the reference's CSV metadata layout. */
  def fromCsv(
      spark: SparkSession,
      lakeRoot: String,
      tablesCsv: String,
      transitionsCsv: String,
      scriptsPath: Option[String] = None,
      algo: HashGen.Algo = HashGen.Sha1
  ): Graft =
    new Graft(spark, lakeRoot, MetaStore.fromCsv(spark, tablesCsv, transitionsCsv), scriptsPath, algo)
}
