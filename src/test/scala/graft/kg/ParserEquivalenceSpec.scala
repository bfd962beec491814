package graft.kg

import org.scalacheck.{Prop, Test => SC}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/**
 * Differential suite: NtBytesParser (UTF-8 byte cursor, UTF8String
 * output) must agree with NtLineParser (the reference implementation)
 * on every fixture line and on generated statements — same triples,
 * same null/skip decisions, same error messages and char positions.
 */
class ParserEquivalenceSpec extends AnyFunSuite {

  private def viaBytes(p: NtBytesParser, line: String, no: Int): Either[(Int, String), NtStatement] = {
    val bytes = line.getBytes(StandardCharsets.UTF_8)
    try {
      if (!p.parseSlice(bytes, 0, bytes.length, no)) Right(null)
      else Right(NtStatement(
        RdfTerm(p.subjKind, p.subjValue.toString, null, null),
        p.predValue.toString,
        RdfTerm(p.objKind, p.objValue.toString,
          if (p.objLang == null) null else p.objLang.toString,
          if (p.objDt == null) null else p.objDt.toString)))
    } catch { case e: NtParseException => Left((e.charPos, e.getMessage)) }
  }

  private def viaChars(p: NtLineParser, line: String, no: Int): Either[(Int, String), NtStatement] =
    try Right(p.parseStatement(line, no))
    catch { case e: NtParseException => Left((e.charPos, e.getMessage)) }

  private def assertSame(line: String, no: Int, strict: Boolean): Unit = {
    val b = viaBytes(if (strict) NtBytesParser.strict else NtBytesParser.lenient, line, no)
    val c = viaChars(new NtLineParser(strict), line, no)
    (b, c) match {
      case (Right(x), Right(y)) => assert(x == y, s"statement mismatch on: $line")
      case (Left((bp, bm)), Left((cp, cm))) =>
        assert(bp == cp, s"char position mismatch on: $line\nbytes=$bm\nchars=$cm")
        assert(bm == cm, s"error message mismatch on: $line")
      case _ => fail(s"outcome mismatch on: $line\nbytes=$b\nchars=$c")
    }
  }

  test("all W3C fixture lines parse identically in both parsers") {
    Corpus.fixtureNames.foreach { n =>
      val in = getClass.getResourceAsStream(s"/w3c/$n")
      val content = try scala.io.Source.fromInputStream(in)(scala.io.Codec.UTF8).mkString finally in.close()
      scala.io.Source.fromString(content).getLines().zipWithIndex.foreach { case (l, i) =>
        assertSame(l, i + 1, strict = true)
        assertSame(l, i + 1, strict = false)
      }
    }
  }

  test("non-ASCII prefixes keep char-accurate error positions") {
    // é before the error: byte offset differs from char offset
    assertSame("<u:caf\u00e9\u00e9\u00e9> <p:q> oops .", 3, strict = true)
    assertSame("<u:\u4e2d\u6587> x", 1, strict = true)
    assertSame("<u:\u00e9> <p:q> \"caf\u00e9\"@ .", 2, strict = true)
    // and non-ASCII values round-trip
    assertSame("<u:\u00e9x> <p:\u4e2d> \"v\u00e9\u4e2d\"@en .", 1, strict = true)
  }

  test("lenient long literals agree") {
    assertSame("<a:b> <p:q> \"\"\"x\"y\"\"z\"\"\" .", 1, strict = false)
    assertSame("<a:b> <p:q> \"\"\"with \\u0041 and %41\"\"\"@en-us .", 1, strict = false)
    assertSame("<a:b> <p:q> \"\"\"unterminated", 1, strict = false)
    // raw newlines inside the window (multi-line statement slices)
    assertSame("<a:b> <p:q> \"\"\"baz\nqux\"\"\" .", 1, strict = false)
    assertSame("<a:b> <p:q> \"\"\"c\r\nr\"\"\"@en .", 1, strict = false)
  }

  test("both parsers raise the EOI-in-unclosed-long-literal extend signal identically") {
    def flags(line: String): (Boolean, Boolean) = {
      val cp = NtLineParser.lenient
      val bp = NtBytesParser.lenient
      intercept[NtParseException] { cp.parseStatement(line, 1) }
      val bytes = line.getBytes(StandardCharsets.UTF_8)
      intercept[NtParseException] { bp.parseSlice(bytes, 0, bytes.length, 1) }
      (cp.eoiInUnclosedLongLiteral, bp.eoiInUnclosedLongLiteral)
    }
    // mid-literal EOI (raw cut, cut inside closing quotes, cut after \)
    assert(flags("<a:b> <p:q> \"\"\"open") == (true, true))
    assert(flags("<a:b> <p:q> \"\"\"open\"\"") == (true, true))
    assert(flags("<a:b> <p:q> \"\"\"open\\") == (true, true))
    // NOT raised for failures outside a long literal — no false extension
    assert(flags("<a:b> <p:q> \"open") == (false, false))
    assert(flags("<a:b> <p:q> \"\"\"done\"\"\"") == (false, false)) // missing '.'
    assert(flags("<a:b> <p:q>") == (false, false))
  }

  test("generated statements agree (property)") {
    val gen = new RoundTripGens {}
    val res = SC.check(SC.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(gen.genStatement) { st =>
        val line = NtWriter.writeStatement(st)
        val b = viaBytes(NtBytesParser.strict, line, 1)
        val c = viaChars(NtLineParser.strict, line, 1)
        b == c && b == Right(st)
      })
    assert(res.passed, res.status.toString)
  }

  test("escape-heavy and percent-run lines agree") {
    List(
      """<t:%B2t> <:%41%42y> <d:> .""",
      """<a:b> <c:d> "q\"w\\e\'r\u0041\U00010332" .""",
      """<u:%E2%82%AC> <p:x> "%" .""",
      """_:1a <p:q> "" .""",
      """<a:b> <c:d> "x"^^<dt:%ZZ> .""",
      """<a:b> <c:d> "x"@en-us-x .""",
      """<a:b><c:d>"x"@en .""",
      """   <a:b>\t<c:d> "x" . # c""".replace("\\t", "\t")
    ).zipWithIndex.foreach { case (l, i) => assertSame(l, i + 1, strict = true) }
  }
}

/** The statement generators from RoundTripSpec, shared. */
trait RoundTripGens {
  import org.scalacheck.Gen
  import RdfTerm._

  private val scheme: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(4, Gen.alphaLowerChar)
  } yield (h :: t).mkString

  private val iriBody: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('/', '#', '?', '&', '=', '~', '.', '-', '_', ':'),
      1 -> Gen.oneOf('<', '>', '"', '{', '}', '\\', '%', ' '),
      1 -> Gen.choose(0xA0.toChar, 0x2FFF.toChar)
    )).map(_.mkString)

  private val genIri: Gen[RdfTerm] =
    for { s <- scheme; b <- iriBody } yield iri(s + ":" + b)

  private val genBNode: Gen[RdfTerm] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(cs => bnode(cs.mkString))

  private val lexical: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('"', '\\', '\n', '\r', '\t', '\'', ' '),
      1 -> Gen.choose(1.toChar, 0x1f.toChar),
      1 -> Gen.choose(0xA0.toChar, 0xD700.toChar)
    )).map(_.mkString)

  private val langTag: Gen[String] = for {
    a <- Gen.nonEmptyListOf(Gen.alphaChar)
    sub <- Gen.option(Gen.nonEmptyListOf(Gen.alphaNumChar))
  } yield a.mkString + sub.fold("")("-" + _.mkString)

  private val genLiteral: Gen[RdfTerm] = for {
    lex <- lexical
    choice <- Gen.choose(0, 2)
    term <- choice match {
      case 0 => Gen.const(simpleLiteral(lex))
      case 1 => langTag.map(taggedLiteral(lex, _))
      case 2 => genIri.map(dt => typedLiteral(lex, dt.value))
    }
  } yield term

  val genStatement: Gen[NtStatement] = for {
    s <- Gen.oneOf(genIri, genBNode)
    p <- genIri
    o <- Gen.oneOf(genIri, genBNode, genLiteral)
  } yield NtStatement(s, p.value, o)
}
