package graft

/** JSON string escaping shared by the Verify and Bench emitters: the
  * driver json.load's their single-line output, so backslash, quote, and
  * ALL control chars (<0x20) must be escaped — one unescaped byte would
  * silently zero a round's correctness or bench result. */
object JsonUtil {
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
