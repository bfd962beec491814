package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The string front end must be EXACTLY the programmatic Bgp layer —
 * every test matches a parsed query against its hand-built twin, so the
 * parser can never drift from the engine's semantics.
 */
class SparqlParserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import Bgp.{AltPath, C, PlusPath, TriplePattern, V}

  private def edges(rows: (String, String, String)*) =
    rows.toDF("subj_id", "pred", "obj_id")

  private def assertSame(parsed: DataFrame, prog: DataFrame): Unit = {
    assert(parsed.columns.toSeq === prog.columns.toSeq)
    val render = (df: DataFrame) =>
      df.collect().map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
        .mkString("\u0001")).sorted.toSeq
    assert(render(parsed) === render(prog))
  }

  private val d1 = Bgp.iriId("urn:doc:1")
  private val d2 = Bgp.iriId("urn:doc:2")
  private val d3 = Bgp.iriId("urn:doc:3")
  private val en = Bgp.litId("en")
  private val fr = Bgp.litId("fr")
  private val web = Bgp.litId("web")
  private val book = Bgp.litId("book")

  private def corpus = edges(
    (d1, "urn:lang", en), (d1, "urn:src", web),
    (d2, "urn:lang", fr), (d2, "urn:src", book),
    (d3, "urn:lang", en))

  test("BGP with IRI and literal constants parses to the programmatic twin") {
    val parsed = Sparql.run(corpus,
      """SELECT * WHERE { ?d <urn:lang> "en" . ?d <urn:src> ?s }""")
    val prog = Bgp.matchPatterns(corpus, Seq(
      TriplePattern(V("d"), C("urn:lang"), C(en)),
      TriplePattern(V("d"), C("urn:src"), V("s"))))
    assertSame(parsed, prog)
  }

  test("OPTIONAL, FILTER and BOUND parse to the programmatic twin") {
    val parsed = Sparql.run(corpus,
      """SELECT ?d ?s WHERE {
        |  ?d <urn:lang> "en" .
        |  OPTIONAL { ?d <urn:src> ?s }
        |  FILTER (!BOUND(?s) || ?s = "web")
        |}""".stripMargin)
    val prog = Bgp.matchWithOptional(corpus,
      Seq(TriplePattern(V("d"), C("urn:lang"), C(en))),
      Seq(Seq(TriplePattern(V("d"), C("urn:src"), V("s")))),
      Seq(!col("s").isNotNull || col("s") === lit(web)))
      .select("d", "s")
    assertSame(parsed, prog)
    // both rows survive: d1 binds web, d3 is unbound
    assert(parsed.count() === 2)
  }

  test("UNION parses to the programmatic twin (with branch NULL-padding)") {
    val parsed = Sparql.run(corpus,
      """SELECT * WHERE {
        |  { ?d <urn:lang> "en" . ?d <urn:src> ?s }
        |  UNION { ?d <urn:lang> "fr" }
        |}""".stripMargin)
    val prog = Bgp.matchUnion(corpus, Seq(
      Seq(TriplePattern(V("d"), C("urn:lang"), C(en)),
        TriplePattern(V("d"), C("urn:src"), V("s"))),
      Seq(TriplePattern(V("d"), C("urn:lang"), C(fr)))))
    assertSame(parsed, prog)
  }

  test("property path <p>+ and the 'a' shorthand parse to the twin") {
    val cls = Bgp.iriId("urn:Class")
    val up = edges(
      (d1, "urn:up", d2), (d2, "urn:up", d3),
      (d1, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", cls))
    val parsed = Sparql.run(up,
      """SELECT ?x ?y WHERE { ?x <urn:up>+ ?y . ?x a <urn:Class> }""")
    val prog = Bgp.matchPatterns(up, Seq(
      TriplePattern(V("x"), PlusPath("urn:up"), V("y")),
      TriplePattern(V("x"), C("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), C(cls))))
      .select("x", "y")
    assertSame(parsed, prog)
    assert(parsed.count() === 2) // d1 reaches d2 and d3
  }

  test("MINUS, predicate alternatives and SELECT DISTINCT parse to the twin") {
    val spam = Bgp.iriId("urn:doc:spam")
    val e = edges(
      (d1, "urn:lang", en), (d2, "urn:lang", fr), (d3, "urn:lang", en),
      (d1, "urn:flag", spam),
      (d2, "urn:title", web), (d3, "urn:alt", web))
    val parsed = Sparql.run(e,
      """SELECT ?d WHERE {
        |  ?d <urn:lang> ?l .
        |  MINUS { ?d <urn:flag> ?f }
        |}""".stripMargin)
    val prog = Bgp.matchGroup(e,
      required = Seq(TriplePattern(V("d"), C("urn:lang"), V("l"))),
      minus = Seq(Seq(TriplePattern(V("d"), C("urn:flag"), V("f")))))
      .select("d")
    assertSame(parsed, prog)
    assert(parsed.collect().map(_.getString(0)).toSet === Set(d2, d3))

    val alt = Sparql.run(e,
      """SELECT * WHERE { ?d <urn:title>|<urn:alt> ?t }""")
    val altProg = Bgp.matchPatterns(e,
      Seq(TriplePattern(V("d"), AltPath(Seq("urn:title", "urn:alt")), V("t"))))
    assertSame(alt, altProg)
    assert(alt.count() === 2)

    // two docs share lang 'en' -> DISTINCT collapses the projection
    val dist = Sparql.run(e, """SELECT DISTINCT ?l WHERE { ?d <urn:lang> ?l }""")
    assert(dist.collect().map(_.getString(0)).sorted.toSeq === Seq(en, fr).sorted)
  }

  test("language-tagged and typed literals hash like litId") {
    val bonjour = Bgp.litId("bonjour", lang = Some("fr"))
    val five = Bgp.litId("5", dt = "http://www.w3.org/2001/XMLSchema#integer")
    val e = edges((d1, "urn:p", bonjour), (d2, "urn:p", five))
    val p1 = Sparql.run(e, """SELECT * WHERE { ?x <urn:p> "bonjour"@fr }""")
    assert(p1.collect().map(_.getString(0)).toSeq === Seq(d1))
    val p2 = Sparql.run(e,
      """SELECT * WHERE { ?x <urn:p> "5"^^<http://www.w3.org/2001/XMLSchema#integer> }""")
    assert(p2.collect().map(_.getString(0)).toSeq === Seq(d2))
  }

  test("malformed queries fail loudly, not wrongly") {
    def bad(q: String, needle: String): Unit = {
      val ex = intercept[IllegalArgumentException](Sparql.parse(q))
      assert(ex.getMessage.contains(needle), s"$q -> ${ex.getMessage}")
    }
    bad("SELECT * WHERE { ?a foaf:knows ?b }", "prefixed names")
    bad("SELECT * WHERE { { ?a <p> ?b } UNION { ?c <p> ?d } ?x <p> ?y }", "expected")
    bad("SELECT * WHERE { }", "no required triple")
    bad("SELECT * WHERE { ?a <p> ?b } ?c", "trailing")
    bad("SELECT WHERE { ?a <p> ?b }", "SELECT needs")
  }
}
