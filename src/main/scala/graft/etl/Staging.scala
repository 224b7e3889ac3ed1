package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.meta.{MetaStore, TableColumn}

/** File → staging loading (reference: mallarddv/etl/etl_service.py:36-115).
  *
  * The reference truncate-and-loads a staging *table* from csv/parquet/json
  * with a typed column mapping from metadata. Spark-first: staging is just a
  * typed DataFrame — `spark.read` with an explicit schema (no inference pass
  * at scale), projected/cast to the metadata-declared types.
  */
object Staging {

  /** Project + cast a raw DataFrame to metadata-declared (name, sqlType) columns. */
  def project(df: DataFrame, cols: Seq[(String, String)]): DataFrame =
    df.select(cols.map { case (n, t) => col(n).cast(MetaStore.sqlType(t)).as(n) }.toIndexedSeq: _*)

  /** Schema from metadata staging columns (mapping == 'c', ordered by
    * position) — delegates to the single derivation the create path uses,
    * so load and DDL can't diverge. */
  def schemaFor(cols: Seq[TableColumn]): StructType =
    graft.dv.VaultSchemas.staging(cols)

  /** Load a file into a typed staging DataFrame. `fileType` inferred from the
    * extension when not given (reference behavior). CSV/JSON get the explicit
    * metadata schema (zero-inference, scan-once at scale); parquet is
    * projected and cast. */
  def loadFile(
      spark: SparkSession,
      meta: MetaStore,
      table: String,
      path: String,
      fileType: Option[String] = None
  ): DataFrame = {
    val cols   = meta.getTables(Some(table), Some("stg"))
    val schema = schemaFor(cols)
    val ft     = fileType.getOrElse(path.split('.').last.toLowerCase)
    ft match {
      case "csv" =>
        // enforceSchema=false: with the default (true) Spark SKIPS the
        // header row and applies the explicit schema POSITIONALLY, so a
        // file whose column order differs from metadata columnPosition
        // order silently loads values into the wrong columns — hash keys
        // over the wrong business keys, a silently corrupted vault. With
        // false, Spark validates the header names against the schema and
        // fails loudly on a mismatch (reference CSVs carry headers that
        // match the metadata names, so well-formed deliveries are
        // unaffected).
        spark.read
          .option("header", "true").option("enforceSchema", "false")
          .schema(schema).csv(path)
      case "json" | "jsonl" | "ndjson" =>
        spark.read.schema(schema).json(path)
      case "parquet" =>
        project(spark.read.parquet(path), schema.fields.map(f => f.name -> f.dataType.sql).toIndexedSeq)
      case "orc" =>
        project(spark.read.orc(path), schema.fields.map(f => f.name -> f.dataType.sql).toIndexedSeq)
      case other =>
        throw new IllegalArgumentException(s"unsupported staging file type: $other")
    }
  }
}
