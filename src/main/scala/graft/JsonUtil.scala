package graft

/** Minimal JSON string escaping, shared by every hand-rolled JSON surface
  * (Bench's result line, Verify's oracle dump, the HTTP API) — the
  * dependency set has no JSON library, and three private copies of this
  * escaper had already started to drift.
  */
object JsonUtil {
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
