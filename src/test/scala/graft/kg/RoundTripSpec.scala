package graft.kg

import org.scalacheck.{Gen, Prop, Test => SC}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based round-trip suite, the analogue of the reference's
 * NtGen + NtParserRegressionSpec: random statements are serialized to
 * N-Triples text and parsed back; whitespace and trailing comments are
 * invariant; malformed lines report exact error positions.
 */
class RoundTripSpec extends AnyFunSuite {

  /** Run a ScalaCheck property with a fixed seed-independent budget. */
  private def check(p: Prop): Unit = {
    val res = SC.check(SC.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  import RdfTerm._

  private val scheme: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(4, Gen.alphaLowerChar)
  } yield (h :: t).mkString

  // IRI bodies: printable unicode incl. chars that need \u or %25 escaping
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

  // literal lexical values: anything incl. control chars and quotes
  private val lexical: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('"', '\\', '\n', '\r', '\t', '\'', ' '),
      1 -> Gen.choose(0.toChar, 0x1f.toChar),
      1 -> Gen.choose(0xA0.toChar, 0xFFFC.toChar)
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

  private val genStatement: Gen[NtStatement] = for {
    s <- Gen.oneOf(genIri, genBNode)
    p <- genIri
    o <- Gen.oneOf(genIri, genBNode, genLiteral)
  } yield NtStatement(s, p.value, o)

  private val parser = NtLineParser.strict

  test("parse(write(statement)) == statement") {
    check(Prop.forAll(genStatement) { st =>
      parser.parseStatement(NtWriter.writeStatement(st)) == st
    })
  }

  test("whitespace padding between terms is invariant") {
    val pad = Gen.listOf(Gen.oneOf(' ', '\t')).map(_.mkString)
    check(Prop.forAll(genStatement, pad, pad) { (st, p1, p2) =>
      val line = p1 + NtWriter.writeTerm(st.subj) + p2 + "\t<" +
        NtWriter.escapeIri(st.pred) + ">  " + NtWriter.writeTerm(st.obj) + p1 + " ." + p2
      parser.parseStatement(line) == st
    })
  }

  test("trailing comments after the dot are ignored") {
    check(Prop.forAll(genStatement, Gen.asciiPrintableStr) { (st, c) =>
      parser.parseStatement(NtWriter.writeStatement(st) + " # " + c) == st
    })
  }

  test("comment and blank lines never produce statements") {
    check(Prop.forAll(Gen.asciiPrintableStr) { c =>
      parser.parseStatement("# " + c) == null
    })
  }

  test("missing dot errors at end of line") {
    check(Prop.forAll(genStatement) { st =>
      val line = NtWriter.writeStatement(st).stripSuffix(" .")
      val e = intercept[NtParseException](parser.parseStatement(line))
      // a tagged literal hitting EOI fails earlier: the grammar requires a
      // space/tab after the language tag (reference NtParser.scala:339,350)
      if (st.obj.isLiteral && st.obj.lang != null)
        e.shortMessage.contains("expected [language tag identifier]")
      else
        e.shortMessage.contains("expected [.]") && e.charPos == line.length + 1
    })
  }

  test("invalid subject start errors at char 1") {
    check(Prop.forAll(Gen.oneOf('@', '.', '1', 'x', '('), genStatement) { (c, st) =>
      val e = intercept[NtParseException](
        parser.parseStatement(c.toString + NtWriter.writeStatement(st)))
      e.charPos == 1 && e.shortMessage.contains("expected [<, _, or #]")
    })
  }

  test("serializer output is parseable by a fresh lenient parser too") {
    val lenient = NtLineParser.lenient
    check(Prop.forAll(genStatement) { st =>
      lenient.parseStatement(NtWriter.writeStatement(st)) == st
    })
  }
}
