package graft.core

/** Minimal JSON string escaping shared by the Bench/Verify mains. Escapes
  * quote, backslash, and ALL control chars (<0x20) — a tab or CR in
  * builder-authored SQL would otherwise break the driver's json.load and
  * silently zero a round's results. */
object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
