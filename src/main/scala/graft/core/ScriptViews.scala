package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.meta.MetaStore

/** User-script view layers — the Spark re-expression of the reference's
  * apply_script_from_metadata (mallarddv/db/schema_manager.py:114-160).
  *
  * The reference walks metadata rows of rel_type `stg_vw` / `bv_vw` / `dm_vw`
  * and executes `{scripts_path}/{sub_folder}/{base_name}.sql` as CREATE VIEW
  * DDL. Spark-first: each script is a SELECT (or full CREATE) registered as a
  * temp view named `<base_name>`, evaluated lazily by Catalyst like any other
  * plan — views cost nothing until queried, and inline into consuming plans
  * (filter/column pruning straight through the view).
  */
object ScriptViews {

  private val LayerFolder = Map("stg_vw" -> "stg", "bv_vw" -> "bv", "dm_vw" -> "dm")

  /** Apply every script of `relType` from the metadata; returns view names
    * registered. Missing script files throw (reference records an error). */
  def apply(spark: SparkSession, meta: MetaStore, relType: String, scriptsPath: String): Seq[String] = {
    val folder = LayerFolder.getOrElse(relType,
      throw new IllegalArgumentException(s"unknown view layer: $relType"))
    val baseNames = meta.getTables(relType = Some(relType)).map(_.baseName).distinct
    baseNames.map { base =>
      val p = Paths.get(scriptsPath, folder, s"$base.sql")
      if (!Files.exists(p))
        throw new IllegalArgumentException(s"missing view script: $p")
      register(spark, base, Files.readString(p))
      base
    }
  }

  /** Register one view from SQL text: SELECT scripts become a temp view of
    * that name; CREATE ... scripts run as-is. The CREATE detection skips
    * leading SQL comments (`-- ...` lines, `/* ... */` blocks): a script
    * headed by a comment banner would otherwise take the SELECT branch,
    * where spark.sql() still executes the CREATE (commands run eagerly)
    * and the temp-view registration then SHADOWS the just-created object
    * with the command's empty zero-column result — every downstream read
    * of the view silently empty. */
  def register(spark: SparkSession, name: String, sql: String): DataFrame = {
    val trimmed = sql.trim.stripSuffix(";")
    if (firstKeyword(trimmed).equalsIgnoreCase("CREATE")) spark.sql(trimmed)
    else {
      val df = spark.sql(trimmed)
      df.createOrReplaceTempView(name)
      df
    }
  }

  /** First SQL keyword of a script, skipping `--` line comments and
    * `/* */` block comments. */
  private def firstKeyword(sql: String): String = {
    var i = 0; val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val end = sql.indexOf("*/", i + 2)
        i = if (end < 0) n else end + 2
      } else {
        val s = i
        while (i < n && (sql.charAt(i).isLetter || sql.charAt(i) == '_')) i += 1
        return if (i > s) sql.substring(s, i) else ""
      }
    }
    ""
  }
}
