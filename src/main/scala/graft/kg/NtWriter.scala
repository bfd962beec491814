package graft.kg

/**
 * Serializes terms/statements back into parseable N-Triples lines, WITH
 * escaping (unlike `RdfTerm.n3`, which reproduces the reference's
 * quirky no-re-escape canonical form used only as a comparison key).
 *
 * Guarantee: `parse(write(st)) == st` for any statement whose bnode labels
 * are [A-Za-z0-9]+ and whose IRIs contain a `:`. Used by the corpus
 * synthesizer (driver tables -> N-Triples text) and the round-trip specs.
 */
object NtWriter {

  /** Escape a literal lexical value for a double-quoted N-Triples string. */
  def escapeLiteral(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\\' => sb.append("\\\\")
        case '"'  => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          if (c < 0x20) sb.append(f"\\u${c.toInt}%04X") else sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /**
   * Escape an IRI for `<...>` output: any char the grammar disallows raw
   * (controls, space, `>`, `"`, `{`, `}`, `<`, `\`, `%`) becomes a
   * `\uXXXX` escape, except `%` which stays percent-encoded as `%25`.
   */
  def escapeIri(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') sb.append("%25")
      else if (c <= 0x20 || c == '>' || c == '"' || c == '{' || c == '}' || c == '<' || c == '\\')
        sb.append(f"\\u${c.toInt}%04X")
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  def writeTerm(t: RdfTerm): String = t.kind match {
    case RdfTerm.IRI   => "<" + escapeIri(t.value) + ">"
    case RdfTerm.BNODE => "_:" + t.value
    case _ =>
      val base = "\"" + escapeLiteral(t.value) + "\""
      if (t.lang != null) base + "@" + t.lang
      else if (t.dt == RdfTerm.XsdString) base // simple form; parses back equal
      else base + "^^<" + escapeIri(t.dt) + ">"
  }

  def writeStatement(st: NtStatement): String =
    writeTerm(st.subj) + " <" + escapeIri(st.pred) + "> " + writeTerm(st.obj) + " ."
}
