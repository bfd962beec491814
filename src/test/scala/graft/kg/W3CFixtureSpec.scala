package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Codec

/**
 * Golden-file suite over the official W3C RDF 1.1 N-Triples test fixtures
 * (copied verbatim from the reference repo's test resources). Mirrors the
 * assertions of the reference's W3CTestSpec / W3CAutomaticSpec: exact
 * triples for positive files, exact error-message substrings for the
 * `nt-syntax-bad-*` negatives, and a manifest-driven sweep (positive ==
 * parses, negative == throws).
 */
class W3CFixtureSpec extends AnyFunSuite {
  import RdfTerm._

  private def lines(name: String): List[String] = {
    val in = getClass.getResourceAsStream(s"/w3c/$name")
    require(in != null, s"fixture $name not found")
    val src = scala.io.Source.fromInputStream(in)(Codec.UTF8)
    try src.getLines().toList
    finally src.close()
  }

  /** Strict whole-file parse, 1-based line numbers, like StrictNtParser. */
  private def parseFile(name: String): List[NtStatement] = {
    val p = NtLineParser.strict
    lines(name).zipWithIndex.flatMap { case (l, i) =>
      Option(p.parseStatement(l, i + 1))
    }
  }

  private def errorOf(name: String): NtParseException =
    intercept[NtParseException](parseFile(name))

  private def st(s: RdfTerm, p: String, o: RdfTerm) = NtStatement(s, p, o)

  // --- positive files: exact triples --------------------------------------

  test("empty / comment-only files produce no triples") {
    assert(parseFile("nt-syntax-file-01.nt").isEmpty)
    assert(parseFile("nt-syntax-file-02.nt").isEmpty)
    assert(parseFile("nt-syntax-file-03.nt").isEmpty)
  }

  test("nt-syntax-uri-01: only IRIs") {
    assert(parseFile("nt-syntax-uri-01.nt") ==
      List(st(iri("http://example/s"), "http://example/p", iri("http://example/o"))))
  }

  test("nt-syntax-uri-02/03: \\u0053 and \\U00000053 decode to S") {
    val expected = List(st(iri("http://example/S"), "http://example/p", iri("http://example/o")))
    assert(parseFile("nt-syntax-uri-02.nt") == expected)
    assert(parseFile("nt-syntax-uri-03.nt") == expected)
  }

  test("nt-syntax-uri-04: all legal IRI chars, %25 percent-decodes to %") {
    assert(parseFile("nt-syntax-uri-04.nt") == List(st(
      iri("http://example/s"), "http://example/p",
      iri("scheme:!$%&'()*+,-./0123456789:/@ABCDEFGHIJKLMNOPQRSTUVWXYZ_abcdefghijklmnopqrstuvwxyz~?#"))))
  }

  test("nt-syntax-string-01/02/03: simple, @en, @en-uk literals") {
    assert(parseFile("nt-syntax-string-01.nt") ==
      List(st(iri("http://example/s"), "http://example/p", simpleLiteral("string"))))
    assert(parseFile("nt-syntax-string-02.nt") ==
      List(st(iri("http://example/s"), "http://example/p", taggedLiteral("string", "en"))))
    assert(parseFile("nt-syntax-string-03.nt") ==
      List(st(iri("http://example/s"), "http://example/p", taggedLiteral("string", "en-uk"))))
  }

  test("nt-syntax-str-esc-01/02/03: \\n, \\u0020, \\U00000020 in literals") {
    assert(parseFile("nt-syntax-str-esc-01.nt") ==
      List(st(iri("http://example/s"), "http://example/p", simpleLiteral("a\n"))))
    assert(parseFile("nt-syntax-str-esc-02.nt") ==
      List(st(iri("http://example/s"), "http://example/p", simpleLiteral("a b"))))
    assert(parseFile("nt-syntax-str-esc-03.nt") ==
      List(st(iri("http://example/s"), "http://example/p", simpleLiteral("a b"))))
  }

  test("nt-syntax-bnode-01/02/03: bnode subject/object, digit-leading label") {
    assert(parseFile("nt-syntax-bnode-01.nt") ==
      List(st(bnode("a"), "http://example/p", iri("http://example/o"))))
    assert(parseFile("nt-syntax-bnode-02.nt") == List(
      st(iri("http://example/s"), "http://example/p", bnode("a")),
      st(bnode("a"), "http://example/p", iri("http://example/o"))))
    assert(parseFile("nt-syntax-bnode-03.nt") == List(
      st(iri("http://example/s"), "http://example/p", bnode("1a")),
      st(bnode("1a"), "http://example/p", iri("http://example/o"))))
  }

  test("nt-syntax-datatypes-01/02: typed literals stay lexical") {
    assert(parseFile("nt-syntax-datatypes-01.nt") == List(st(
      iri("http://example/s"), "http://example/p",
      typedLiteral("123", "http://www.w3.org/2001/XMLSchema#byte"))))
    assert(parseFile("nt-syntax-datatypes-02.nt") == List(st(
      iri("http://example/s"), "http://example/p",
      typedLiteral("123", "http://www.w3.org/2001/XMLSchema#string"))))
  }

  test("explicit xsd:string equals simple literal (RDF 1.1)") {
    assert(typedLiteral("x", XsdString) == simpleLiteral("x"))
  }

  test("nt-syntax-subm-01: 30-triple submission torture file") {
    val ts = parseFile("nt-syntax-subm-01.nt")
    assert(ts.size == 30)
    // spot checks from the reference spec
    assert(ts.head == st(iri("http://example.org/resource1"),
      "http://example.org/property", iri("http://example.org/resource2")))
    assert(ts.exists(_.obj == simpleLiteral("simple literal")))
    assert(ts.exists(_.obj == simpleLiteral("backslash:\\")))
    assert(ts.exists(_.obj == simpleLiteral("dquote:\"")))
    assert(ts.exists(_.obj == simpleLiteral("newline:\n")))
    assert(ts.exists(_.obj == simpleLiteral("return\r")))
    assert(ts.exists(_.obj == simpleLiteral("tab:\t")))
    assert(ts.exists(_.obj == simpleLiteral("é")))
    assert(ts.exists(_.obj == simpleLiteral("€")))
  }

  test("comment_following_triple: trailing comments after '.' ignored") {
    val ts = parseFile("comment_following_triple.nt")
    assert(ts.size == 5)
    assert(ts.map(_.obj) == List(
      iri("http://example/o"), bnode("o"), simpleLiteral("o"),
      typedLiteral("o", "http://example/dt"), taggedLiteral("o", "en")))
  }

  test("minimal_whitespace: no whitespace between terms") {
    val ts = parseFile("minimal_whitespace.nt")
    assert(ts.size == 6)
    assert(ts(1) == st(iri("http://example/s"), "http://example/p", simpleLiteral("Alice")))
    assert(ts(5) == st(bnode("s"), "http://example/p", bnode("bnode1")))
  }

  test("literal quote variants") {
    assert(parseFile("literal.nt").head.obj == simpleLiteral("x"))
    assert(parseFile("literal_with_dquote.nt").head.obj == simpleLiteral("x\"y"))
    assert(parseFile("literal_with_2_dquotes.nt").head.obj == simpleLiteral("x\"\"y"))
    assert(parseFile("literal_with_squote.nt").head.obj == simpleLiteral("x'y"))
    assert(parseFile("literal_with_2_squotes.nt").head.obj == simpleLiteral("x''y"))
  }

  test("literal escape variants") {
    assert(parseFile("literal_with_BACKSPACE.nt").head.obj == simpleLiteral("\b"))
    assert(parseFile("literal_with_CARRIAGE_RETURN.nt").head.obj == simpleLiteral("\r"))
    assert(parseFile("literal_with_CHARACTER_TABULATION.nt").head.obj == simpleLiteral("\t"))
    assert(parseFile("literal_with_FORM_FEED.nt").head.obj == simpleLiteral("\f"))
    assert(parseFile("literal_with_LINE_FEED.nt").head.obj == simpleLiteral("\n"))
    assert(parseFile("literal_with_REVERSE_SOLIDUS.nt").head.obj == simpleLiteral("\\"))
    assert(parseFile("literal_with_REVERSE_SOLIDUS2.nt").head.obj == simpleLiteral("test-\\"))
    assert(parseFile("literal_with_numeric_escape4.nt").head.obj == simpleLiteral("o"))
    assert(parseFile("literal_with_numeric_escape8.nt").head.obj == simpleLiteral("o"))
  }

  test("langtagged_string / lantag_with_subtag") {
    assert(parseFile("langtagged_string.nt").head.obj == taggedLiteral("chat", "en"))
    assert(parseFile("lantag_with_subtag.nt").head.obj == taggedLiteral("Cheers", "en-UK"))
  }

  test("spec_example_01..04") {
    assert(parseFile("spec_example_01.nt") == List(
      st(iri("http://one.example/subject1"), "http://one.example/predicate1", iri("http://one.example/object1")),
      st(bnode("subject1"), "http://an.example/predicate1", simpleLiteral("object1")),
      st(bnode("subject2"), "http://an.example/predicate2", simpleLiteral("object2"))))
    assert(parseFile("spec_example_02.nt") == List(
      st(iri("http://example.org/#spiderman"),
        "http://www.perceive.net/schemas/relationship/enemyOf",
        iri("http://example.org/#green-goblin"))))
    val ex3 = parseFile("spec_example_03.nt")
    assert(ex3.size == 7)
    assert(ex3(0).obj == typedLiteral("That Seventies Show", XsdString))
    assert(ex3(1).obj == simpleLiteral("That Seventies Show"))
    assert(ex3(0).obj == ex3(1).obj)
    assert(ex3(2).obj == taggedLiteral("That Seventies Show", "en"))
    assert(ex3(3).obj == taggedLiteral("Cette Série des Années Septante", "fr-be"))
    assert(ex3(4).obj == simpleLiteral(
      "This is a multi-line\nliteral with many quotes (\"\"\"\"\")\nand two apostrophes ('')."))
    assert(ex3(5).obj == typedLiteral("2", "http://www.w3.org/2001/XMLSchema#integer"))
    assert(ex3(6).obj == typedLiteral("1.663E-4", "http://www.w3.org/2001/XMLSchema#double"))
    assert(parseFile("spec_example_04.nt") == List(
      st(bnode("alice"), "http://xmlns.com/foaf/0.1/knows", bnode("bob")),
      st(bnode("bob"), "http://xmlns.com/foaf/0.1/knows", bnode("alice"))))
  }

  test("literal_all_controls: raw control chars legal in literals") {
    val ts = parseFile("literal_all_controls.nt")
    assert(ts.size == 1)
    assert(ts.head.obj.isLiteral)
  }

  test("literal_all_punctuation / ascii boundaries / UTF8 boundaries / booleans parse") {
    assert(parseFile("literal_all_punctuation.nt").nonEmpty)
    assert(parseFile("literal_ascii_boundaries.nt").nonEmpty)
    assert(parseFile("literal_with_UTF8_boundaries.nt").nonEmpty)
    assert(parseFile("literal_true.nt").head.obj ==
      typedLiteral("true", "http://www.w3.org/2001/XMLSchema#boolean"))
    assert(parseFile("literal_false.nt").head.obj ==
      typedLiteral("false", "http://www.w3.org/2001/XMLSchema#boolean"))
  }

  // --- negative files: exact error-message substrings ----------------------

  private val negativeExpectations = List(
    "nt-syntax-bad-uri-01" -> "but found [ ]",
    "nt-syntax-bad-uri-02" -> "expected [hex character], but found [Z]",
    "nt-syntax-bad-uri-03" -> "expected [hex character], but found [Z]",
    "nt-syntax-bad-uri-04" -> "expected [u, or U], but found [n]",
    "nt-syntax-bad-uri-05" -> "expected [u, or U], but found [/]",
    "nt-syntax-bad-uri-06" -> "<s> is not absolute",
    "nt-syntax-bad-uri-07" -> "<p> is not absolute",
    "nt-syntax-bad-uri-08" -> "<o> is not absolute",
    "nt-syntax-bad-uri-09" -> "<dt> is not absolute",
    "nt-syntax-bad-prefix-01" -> "expected [<, _, or #], but found [@]",
    "nt-syntax-bad-base-01" -> "expected [<, _, or #], but found [@]",
    "nt-syntax-bad-struct-01" -> "expected [.], but found [,]",
    "nt-syntax-bad-struct-02" -> "expected [.], but found [;]",
    "nt-syntax-bad-lang-01" -> "expected [language tag identifier], but found [1]",
    "nt-syntax-bad-esc-01" -> "expected [\\, \", ', b, t, n, f, r, u, or U], but found [z]",
    "nt-syntax-bad-esc-02" -> "expected [hex character], but found [W]",
    "nt-syntax-bad-esc-03" -> "expected [hex character], but found [W]",
    "nt-syntax-bad-string-01" -> "expected [\", or \\], but found [EOI]",
    "nt-syntax-bad-string-02" -> "expected [<, _, or \"], but found [1]",
    "nt-syntax-bad-string-03" -> "expected [<, _, or \"], but found [1]",
    "nt-syntax-bad-string-04" -> "expected [<, _, or \"], but found [']",
    "nt-syntax-bad-string-05" -> "expected [.], but found [\"]",
    "nt-syntax-bad-string-06" -> "expected [\", or \\], but found [EOI]",
    "nt-syntax-bad-string-07" -> "expected [<, _, or \"], but found [a]",
    "nt-syntax-bad-num-01" -> "expected [<, _, or \"], but found [1]",
    "nt-syntax-bad-num-02" -> "expected [<, _, or \"], but found [1]",
    "nt-syntax-bad-num-03" -> "expected [<, _, or \"], but found [1]"
  )

  negativeExpectations.foreach { case (name, fragment) =>
    test(s"$name raises with: $fragment") {
      val e = errorOf(s"$name.nt")
      assert(e.getMessage.contains(fragment), s"message was: ${e.getMessage}")
    }
  }

  // --- manifest-driven sweep (replaces the reference's Jena-based harness) --

  test("manifest.ttl sweep: positives parse, negatives throw") {
    val manifest = lines("manifest.ttl").mkString("\n")
    val entry = """(?s)<#([^>]+)>\s+rdf:type\s+rdft:TestNTriples(Positive|Negative)Syntax""".r
    val cases = entry.findAllMatchIn(manifest).map(m => (m.group(1), m.group(2) == "Positive")).toList
    assert(cases.size >= 60, s"expected >=60 manifest entries, got ${cases.size}")
    cases.foreach { case (name, positive) =>
      if (positive) parseFile(s"$name.nt") // must not throw
      else {
        val e = intercept[NtParseException](parseFile(s"$name.nt"))
        assert(e.getMessage.startsWith("parse error"), s"$name: ${e.getMessage}")
      }
    }
  }
}
