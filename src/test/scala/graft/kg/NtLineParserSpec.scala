package graft.kg

import org.scalatest.funsuite.AnyFunSuite

/**
 * Unit behavior spec, covering the same cases as the reference's
 * NtParserSpec / NtParserRegressionSpec / LenientNtParserSpec
 * (real-world DBpedia torture lines, escape semantics, percent decoding,
 * parser reuse, exact error positions, lenient long literals).
 */
class NtLineParserSpec extends AnyFunSuite {
  import RdfTerm._

  private def parse(line: String): NtStatement = NtLineParser.strict.parseStatement(line)

  test("simple line with bnode subject") {
    val s = parse("_:abc <d:ef> \"ghi\" .")
    assert(s == NtStatement(bnode("abc"), "d:ef", simpleLiteral("ghi")))
  }

  test("url encoding and language hint") {
    val s = parse("""<http://de.dbpedia.org/resource/Wiera_%22Vera%22_Gran> <http://www.w3.org/2000/01/rdf-schema#label> "Wiera \"Vera\" Gran"@de . """)
    assert(s.subj == iri("http://de.dbpedia.org/resource/Wiera_\"Vera\"_Gran"))
    assert(s.pred == "http://www.w3.org/2000/01/rdf-schema#label")
    assert(s.obj == taggedLiteral("Wiera \"Vera\" Gran", "de"))
  }

  test("unicode escape in IRI and literal") {
    val line = """<http://de.dbpedia.org/resource/Hofer_%22W""" + '\\' + """u00E4rschtlamo%22> <http://www.w3.org/2000/01/rdf-schema#label> "Hofer \"W""" + '\\' + """u00E4rschtl""" + '\\' + '\\' + """amo\""@de . """
    val s = parse(line)
    assert(s.subj == iri("http://de.dbpedia.org/resource/Hofer_\"Wärschtlamo\""))
    assert(s.obj == taggedLiteral("Hofer \"Wärschtl\\amo\"", "de"))
  }

  test("percent-escaped backslashes") {
    val line = """<http://de.dbpedia.org/resource/GIGA%5C%5CGAMES> <http://www.w3.org/2000/01/rdf-schema#label> "GIGA""" + '\\' + '\\' + '\\' + '\\' + """GAMES"@de ."""
    val s = parse(line)
    assert(s.subj == iri("http://de.dbpedia.org/resource/GIGA\\\\GAMES"))
    assert(s.obj == taggedLiteral("GIGA\\\\GAMES", "de"))
  }

  test("multi-byte \\U astral-plane escapes produce surrogate pairs") {
    val line = """<http://de.dbpedia.org/resource/\U00010332\U0001033F\U00010344> <http://www.w3.org/2000/01/rdf-schema#label> "\U00010332\U0001033F\U00010344"@de ."""
    val s = parse(line)
    val expected = new String(Array(0x10332, 0x1033F, 0x10344).flatMap(Character.toChars))
    assert(s.subj == iri("http://de.dbpedia.org/resource/" + expected))
    assert(s.obj == taggedLiteral(expected, "de"))
  }

  test("invalid UTF-8 percent run decodes to U+FFFD; raw \\uFFFF allowed") {
    val line = """<t:%B2t> <:""" + '\\' + """uFFFFy> <d:> ."""
    val s = parse(line)
    assert(s.subj == iri("t:\uFFFDt"))
    assert(s.pred == new String(Array(':', 65535.toChar, 'y')))
    assert(s.obj == iri("d:"))
  }

  test("multi-byte percent run decodes as one UTF-8 sequence") {
    // %E2%82%AC is the euro sign
    assert(parse("<u:%E2%82%AC> <p:x> <o:y> .").subj == iri("u:€"))
  }

  test("empty, whitespace-only and comment lines yield null") {
    val p = NtLineParser.strict
    assert(p.parseStatement("") == null)
    assert(p.parseStatement("   \t ") == null)
    assert(p.parseStatement("# a comment") == null)
    assert(p.parseStatement("\t # indented comment") == null)
  }

  test("parser instances are reusable across lines (incl. after errors)") {
    val p = NtLineParser.strict
    val good = "<a:b> <c:d> <e:f> ."
    assert(p.parseStatement(good) != null)
    intercept[NtParseException](p.parseStatement("nope"))
    val again = p.parseStatement(good)
    assert(again == NtStatement(iri("a:b"), "c:d", iri("e:f")))
  }

  test("exact error message format without line number") {
    val e = intercept[NtParseException](parse("<s:x> <p:y> ."))
    // object position holds '.', expected subject-of-object chars
    assert(e.getMessage.startsWith("parse error at char 13, expected [<, _, or \"], but found [.]"))
    val Array(_, echoed, caret) = e.getMessage.split("\n")
    assert(echoed == "<s:x> <p:y> .")
    assert(caret == "            ^")
  }

  test("exact error message format with line number") {
    val p = NtLineParser.strict
    val e = intercept[NtParseException](p.parseStatement("bad", 17))
    assert(e.getMessage.startsWith("parse error in line 17 at char 1, expected [<, _, or #], but found [b]"))
    assert(e.charPos == 1)
  }

  test("missing dot reports EOI") {
    val e = intercept[NtParseException](parse("<a:b> <c:d> <e:f>"))
    assert(e.getMessage.contains("expected [.], but found [EOI]"))
  }

  test("lang tag must be followed by whitespace; single subtag only") {
    val e1 = intercept[NtParseException](parse("<s:a> <p:b> \"x\"@en."))
    assert(e1.getMessage.contains("expected [language tag identifier], but found [.]"))
    val e2 = intercept[NtParseException](parse("<s:a> <p:b> \"x\"@en-us-x ."))
    assert(e2.getMessage.contains("expected [language tag identifier], but found [-]"))
    val ok = parse("<s:a> <p:b> \"x\"@en-us .")
    assert(ok.obj == taggedLiteral("x", "en-us"))
  }

  test("strict rejects long literals; lenient accepts them") {
    intercept[NtParseException](parse("<s:a> <p:b> \"\"\"baz\"\"\" ."))
    val lenient = NtLineParser.lenient
    assert(lenient.parseStatement("<s:a> <p:b> \"\"\"baz\"\"\" .").obj == simpleLiteral("baz"))
    // embedded newline when the caller passes a multi-line string
    val multi = lenient.parseStatement("<s:a> <p:b> \"\"\"baz\nqux\"\"\" .")
    assert(multi.obj == simpleLiteral("baz\nqux"))
    // single and double quotes inside
    assert(lenient.parseStatement("<s:a> <p:b> \"\"\"a\"b\"\"c\"\"\" .").obj == simpleLiteral("a\"b\"\"c"))
    // typed / tagged long literals
    assert(lenient.parseStatement("<s:a> <p:b> \"\"\"v\"\"\"@en .").obj == taggedLiteral("v", "en"))
    assert(lenient.parseStatement("<s:a> <p:b> \"\"\"v\"\"\"^^<d:t> .").obj == typedLiteral("v", "d:t"))
  }

  test("lenient parses a plain short literal too") {
    assert(NtLineParser.lenient.parseStatement("<s:a> <p:b> \"v\" .").obj == simpleLiteral("v"))
  }

  test("relative IRI validation error carries the partial scheme") {
    val e = intercept[NtParseException](parse("<s> <p:x> <o:y> ."))
    assert(e.getMessage.contains("<s> is not absolute"))
    val e2 = intercept[NtParseException](parse("<a:b> <c:d> \"x\"^^<dt> ."))
    assert(e2.getMessage.contains("<dt> is not absolute"))
  }

  test("raw control characters are legal inside literals") {
    val s = parse("<s:a> <p:b> \"a\u0001b\u001fc\" .")
    assert(s.obj == simpleLiteral("a\u0001b\u001fc"))
  }

  test("n3 round-trip serialization matches reference quirks") {
    assert(iri("a:b").n3 == "<a:b>")
    assert(bnode("x1").n3 == "_:x1")
    // dt is ALWAYS printed, even for simple/tagged literals
    assert(simpleLiteral("v").n3 == "\"v\"^^<http://www.w3.org/2001/XMLSchema#string>")
    assert(taggedLiteral("v", "en").n3 == "\"v\"@en^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>")
    assert(NtStatement(iri("a:b"), "c:d", bnode("z")).n3 == "<a:b> <c:d> _:z .")
  }

  test("whitespace invariance: tabs and spaces anywhere between terms") {
    val a = parse("<a:b>\t\t<c:d>\t \"x\"\t.")
    val b = parse("   <a:b> <c:d> \"x\" .   ")
    assert(a == b)
  }
}
