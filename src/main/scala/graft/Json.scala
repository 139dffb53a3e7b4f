package graft

/** Minimal JSON string escaping shared by the driver-facing mains
  * (Verify's oracle_sql.json, Bench's one-line report). Escapes quote,
  * backslash, and ALL control chars; `str` also drops a trailing
  * unpaired high surrogate (truncated messages) so the output is always
  * valid JSON.
  */
object Json {
  def str(s0: String): String = {
    // a high surrogate in final position is necessarily unpaired
    val s = if (s0.nonEmpty && Character.isHighSurrogate(s0.last))
      s0.dropRight(1) else s0
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
}
