package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Metadata model for the Data Vault engine.
  *
  * Re-expresses the reference's two driving tables
  * (mallarddv/db/sql_templates.py:10-40):
  *   - `tables(base_name, rel_type, column_name, column_type, column_position, mapping)`
  *   - `transitions(source_table, source_field, target_table, target_field,
  *      group_name, position, raw, transformation, transfer_type)`
  *
  * Loaded from CSV (same file format the reference consumes) into plain case
  * classes on the driver — metadata is tiny, the *data* stays distributed.
  */
final case class TableColumn(
    baseName: String,
    relType: String,      // stg | stg_vw | hub | link | nhl | hsat | lsat | *_vw
    columnName: String,
    columnType: String,   // SQL type when applicable
    columnPosition: Int,
    mapping: String       // c | bk | hk | f | ll | dk | vwdef
)

final case class Transition(
    sourceTable: String,
    sourceField: String,
    targetTable: String,
    targetField: String,
    groupName: String,
    position: Int,
    raw: Boolean,
    transformation: Option[String], // SQL with `#` placeholder for the source field
    transferType: String            // bk | ll | dk | f | sat_delta | sat_full
)

final class MetaStore(
    val tables: Seq[TableColumn],
    val transitions: Seq[Transition]
) {

  /** Table metadata, optionally filtered; ordered like the reference's
    * GET_TABLES (rel_type, base_name, mapping, column_position). */
  def getTables(baseName: Option[String] = None, relType: Option[String] = None): Seq[TableColumn] =
    tables
      .filter(t => baseName.forall(_ == t.baseName) && relType.forall(_ == t.relType))
      .sortBy(t => (t.relType, t.baseName, t.mapping, t.columnPosition))

  /** Transitions for a staging table; ordered like the reference's
    * GET_TRANSITIONS (source_table, target_table, group_name, position). */
  def getTransitions(sourceTable: String): Seq[Transition] =
    transitions
      .filter(_.sourceTable == sourceTable)
      .sortBy(t => (t.sourceTable, t.targetTable, t.groupName, t.position))

  /** Staging tables known to this vault. */
  def stagingTables: Seq[String] =
    tables.filter(_.relType == "stg").map(_.baseName).distinct
}

object MetaStore {

  /** Spark SQL type for a metadata `column_type` declaration. Multi-word
    * declarations (`DOUBLE PRECISION`, `CHARACTER VARYING`) are handled, and
    * an unrecognized type THROWS rather than silently degrading to string —
    * a wrong staging cast would corrupt every downstream hash input. */
  def sqlType(columnType: String): DataType = {
    val t = Option(columnType).getOrElse("").trim.toUpperCase
    // digits are PART of the base ("INT8", "FLOAT4") — stripping them made
    // INT8 resolve as INT → IntegerType, and the staging cast then silently
    // NULLed every bigint above 2^31-1 straight into the hash inputs; the
    // '(' of parameterized types (VARCHAR(255), DECIMAL(10,2)) still
    // terminates the base.
    val base = t.takeWhile(c => c.isLetter || c.isDigit || c == ' ' || c == '_')
      .trim.replaceAll(" +", " ")
    base match {
      case "INTEGER" | "INT" | "INT4"           => IntegerType
      case "BIGINT" | "LONG" | "INT8"           => LongType
      case "SMALLINT" | "INT2"                  => ShortType
      case "TINYINT" | "INT1"                   => ByteType
      case "DOUBLE" | "DOUBLE PRECISION" | "FLOAT8" => DoubleType
      // REAL is a 4-byte float in the DuckDB/Postgres family this metadata
      // format comes from — a double here renders different value strings
      // than the reference engine and moves every downstream hash
      case "FLOAT" | "FLOAT4" | "REAL"          => FloatType
      case "BOOLEAN" | "BOOL"                   => BooleanType
      case "DATE"                               => DateType
      case "TIMESTAMP" | "DATETIME" | "TIMESTAMP WITHOUT TIME ZONE" => TimestampType
      case "VARCHAR" | "CHAR" | "TEXT" | "STRING" | "CHARACTER VARYING" | "CHARACTER" => StringType
      case "BINARY" | "BLOB" | "BYTEA" | "VARBINARY" => BinaryType
      case "DECIMAL" | "NUMERIC" =>
        val args = t.dropWhile(_ != '(').stripPrefix("(").stripSuffix(")").split(',').map(_.trim)
        if (args.length == 2 && args.forall(a => a.nonEmpty && a.forall(_.isDigit)))
          DecimalType(args(0).toInt, args(1).toInt)
        else DecimalType(38, 18)
      case other =>
        throw new IllegalArgumentException(s"unknown metadata column_type: '$columnType' (base '$other')")
    }
  }

  private def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "false").csv(path)

  /** Load metadata from the reference CSV layout (demo/tables.csv, demo/transitions.csv). */
  def fromCsv(spark: SparkSession, tablesPath: String, transitionsPath: String): MetaStore = {
    val t = csv(spark, tablesPath).collect().toSeq.map { r =>
      TableColumn(
        baseName = r.getAs[String]("base_name"),
        relType = r.getAs[String]("rel_type"),
        columnName = r.getAs[String]("column_name"),
        columnType = Option(r.getAs[String]("column_type")).getOrElse(""),
        columnPosition = Option(r.getAs[String]("column_position")).map(_.trim).filter(_.nonEmpty).map(_.toInt).getOrElse(0),
        mapping = Option(r.getAs[String]("mapping")).getOrElse("")
      )
    }
    val tr = csv(spark, transitionsPath).collect().toSeq.map { r =>
      Transition(
        sourceTable = r.getAs[String]("source_table"),
        sourceField = r.getAs[String]("source_field"),
        targetTable = r.getAs[String]("target_table"),
        targetField = Option(r.getAs[String]("target_field")).getOrElse(""),
        groupName = r.getAs[String]("group_name"),
        position = Option(r.getAs[String]("position")).map(_.trim).filter(_.nonEmpty).map(_.toInt).getOrElse(0),
        raw = Option(r.getAs[String]("raw")).exists(v => v.trim.equalsIgnoreCase("true")),
        transformation = Option(r.getAs[String]("transformation")).map(_.trim).filter(_.nonEmpty),
        transferType = r.getAs[String]("transfer_type")
      )
    }
    new MetaStore(t, tr)
  }

  def apply(tables: Seq[TableColumn], transitions: Seq[Transition]): MetaStore =
    new MetaStore(tables, transitions)
}
