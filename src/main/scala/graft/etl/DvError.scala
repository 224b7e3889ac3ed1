package graft.etl

import org.apache.spark.sql.AnalysisException

/** Typed error taxonomy — the Spark counterpart of the reference's
  * `DVException` hierarchy (mallarddv/exceptions.py:7-36). The reference
  * raises these from its managers and also threads `(sql, error)` tuples
  * back through every `create_*` / `load_related_*` call; graft carries the
  * same information as values in [[FlowResult.errors]] (flows
  * log-and-continue rather than unwind), so callers can dispatch on the
  * error kind instead of parsing strings.
  */
sealed abstract class DvError {
  def message: String
  def cause: Option[Throwable]

  /** Human-readable one-liner (what the old `Seq[String]` carried). */
  final def render: String = {
    val kind = this match {
      case _: DvError.Sql           => "DVSQLError"
      case _: DvError.Metadata      => "DVMetadataError"
      case _: DvError.Entity        => "DVEntityError"
      case _: DvError.Configuration => "DVConfigurationError"
      case _: DvError.Etl           => "DVETLError"
      case _: DvError.Concurrency   => "DVConcurrencyError"
    }
    val c = cause.map(t => s": ${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("")}").getOrElse("")
    s"$kind: $message$c"
  }

  override def toString: String = render
}

object DvError {

  /** A plan/SQL that failed to analyze or execute, with the offending text —
    * the reference's `DVSQLError(message, sql, original_error)`
    * (exceptions.py:12-18). `sql` here is the failing SQL or a rendering of
    * the failing DataFrame plan fragment. */
  final case class Sql(message: String, sql: String, cause: Option[Throwable] = None) extends DvError

  /** Missing/inconsistent metadata rows (exceptions.py:21-23). */
  final case class Metadata(message: String, cause: Option[Throwable] = None) extends DvError

  /** A vault entity in an unusable state — absent table, wrong schema
    * (exceptions.py:26-28). */
  final case class Entity(message: String, cause: Option[Throwable] = None) extends DvError

  /** Bad facade configuration — e.g. scripts requested with no scripts path
    * (exceptions.py:31-33). */
  final case class Configuration(message: String, cause: Option[Throwable] = None) extends DvError

  /** Anything else that failed mid-ETL (exceptions.py:36-38). */
  final case class Etl(message: String, cause: Option[Throwable] = None) extends DvError

  /** Another flow holds the ingestion claim for the same (source, file) —
    * a Spark-side extension with no reference counterpart: the reference
    * inherits DuckDB's single-writer transactionality
    * (db/database_connection.py), while a lake has to claim explicitly
    * ([[FlowExecutor]] run-claim markers). */
  final case class Concurrency(message: String, cause: Option[Throwable] = None) extends DvError

  /** Classify a caught exception the way the reference's `except` blocks
    * route to DVException subclasses: analysis/parse failures are SQL
    * errors (they carry the failing plan), missing paths/tables are entity
    * errors, everything else is an ETL error. */
  def from(e: Throwable, context: String = ""): DvError = {
    val msg = if (context.isEmpty) baseMsg(e) else s"$context: ${baseMsg(e)}"
    e match {
      // already typed (e.g. the claim-store capability gate throwing a
      // Configuration error mid-flow) — carry it through instead of
      // re-wrapping a DvError as a generic Etl error; the caller's context
      // (flow/entity label) is prefixed onto the typed message rather than
      // dropped, so "which flow hit this" survives the carry
      case de: DvException =>
        if (context.isEmpty) de.error else withContext(de.error, context)
      // ParseException extends AnalysisException in Spark 4, so this one
      // case covers both parse and analysis failures.
      case ae: AnalysisException =>
        Sql(msg, Option(ae.getSimpleMessage).getOrElse(""), Some(ae))
      case _: java.io.FileNotFoundException | _: java.nio.file.NoSuchFileException =>
        Entity(msg, Some(e))
      case _: IllegalArgumentException =>
        Configuration(msg, Some(e))
      case _ =>
        Etl(msg, Some(e))
    }
  }

  /** Same typed error with `context: ` prefixed to its message — keeps the
    * kind (callers dispatch on it) while recording where it surfaced. */
  private def withContext(err: DvError, context: String): DvError = err match {
    case e: Sql           => e.copy(message = s"$context: ${e.message}")
    case e: Metadata      => e.copy(message = s"$context: ${e.message}")
    case e: Entity        => e.copy(message = s"$context: ${e.message}")
    case e: Configuration => e.copy(message = s"$context: ${e.message}")
    case e: Etl           => e.copy(message = s"$context: ${e.message}")
    case e: Concurrency   => e.copy(message = s"$context: ${e.message}")
  }

  private def baseMsg(e: Throwable): String =
    Option(e.getMessage).getOrElse(e.getClass.getName).take(4095)
}

/** Thrown form for facade methods that fail fast (the reference raises its
  * DVException subclasses directly); the flow path catches and carries the
  * same [[DvError]] as a value instead. */
final class DvException(val error: DvError)
    extends RuntimeException(error.render, error.cause.orNull)

