package graft.kg

/**
 * Flat RDF term representation, Spark-encoder friendly.
 *
 * The reference models terms as a sealed ADT (Resource | Literal | BNode,
 * /root/reference/models/nt/src/main/scala/de/knutwalker/ntparser/model/types.scala:19-62).
 * Spark encoders do not handle sum types efficiently, so we use a flat
 * tagged struct instead: `kind` discriminates IRI / blank node / literal.
 *
 * Semantics preserved from the reference:
 *  - a simple literal `"x"` carries datatype xsd:string
 *    (types.scala:43-47, RDF 1.1: `"x"` == `"x"^^xsd:string`);
 *  - a language-tagged literal carries rdf:langString (types.scala:49-50);
 *  - `n3` re-serialization of a literal ALWAYS prints `^^<dt>`, even for
 *    simple and tagged literals (quirk of types.scala:34-38, kept verbatim
 *    because it is the canonical comparison key against reference output);
 *  - no re-escaping of decoded values on `n3` output (types.scala:26).
 */
final case class RdfTerm(kind: Byte, value: String, lang: String, dt: String) {
  def isIri: Boolean = kind == RdfTerm.IRI
  def isBNode: Boolean = kind == RdfTerm.BNODE
  def isLiteral: Boolean = kind == RdfTerm.LITERAL

  /** Canonical N-Triples-ish serialization (reference `Node.n3`). */
  def n3: String = kind match {
    case RdfTerm.IRI   => "<" + value + ">"
    case RdfTerm.BNODE => "_:" + value
    case _ =>
      val sb = new java.lang.StringBuilder(value.length + 16)
      sb.append('"').append(value).append('"')
      if (lang != null) sb.append('@').append(lang)
      sb.append("^^<").append(dt).append('>')
      sb.toString
  }
}

object RdfTerm {
  final val IRI: Byte = 0
  final val BNODE: Byte = 1
  final val LITERAL: Byte = 2

  final val XsdString = "http://www.w3.org/2001/XMLSchema#string"
  final val RdfLangString = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

  def iri(uri: String): RdfTerm = RdfTerm(IRI, uri, null, null)
  def bnode(id: String): RdfTerm = RdfTerm(BNODE, id, null, null)
  def simpleLiteral(lex: String): RdfTerm = RdfTerm(LITERAL, lex, null, XsdString)
  def taggedLiteral(lex: String, lang: String): RdfTerm = RdfTerm(LITERAL, lex, lang, RdfLangString)
  def typedLiteral(lex: String, dt: String): RdfTerm = RdfTerm(LITERAL, lex, null, dt)
}

/**
 * One parsed statement. Mirrors the reference `Triple(s, p, o)`
 * (types.scala:74) with the predicate held as a plain String because the
 * grammar forces predicates to be IRIs (reference NtParser.scala:201-203).
 */
final case class NtStatement(subj: RdfTerm, pred: String, obj: RdfTerm) {
  /** Reference `Statement.n3` == "s.n3 p.n3 o.n3 ." (types.scala:65). */
  def n3: String = subj.n3 + " <" + pred + "> " + obj.n3 + " ."
}

/**
 * Parse failure, with the exact human-readable message format of the
 * reference (NtParser.scala:539-558): first line
 * `parse error[ in line N ]at char P, <detail>`, second line the input,
 * third line a caret marker. `charPos` is the 1-based character position.
 */
final class NtParseException(val shortMessage: String, val charPos: Int, fullMessage: String)
    extends Exception(fullMessage)
