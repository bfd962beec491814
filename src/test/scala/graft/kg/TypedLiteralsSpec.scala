package graft.kg

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Value-space parity with the reference's backend literal access
 * (ModelFactorySpec.scala:52-61 `"12"^^xsd:int -> getInt == 12`, and the
 * traversal test at :85-92 reading getInt == 42 back from the model).
 */
class TypedLiteralsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val XSD = "http://www.w3.org/2001/XMLSchema#"

  private def parse(lines: String*): org.apache.spark.sql.DataFrame = {
    val corpus = Seq(CorpusRow("r", "t.nt", "c", "nt", lines.mkString("\n"))).toDS()
    TripleExtract.triples(TripleExtract.parse(corpus)).toDF()
  }

  test("\"12\"^^xsd:int reads back as value-space 12 (ModelFactorySpec:52-61)") {
    val t = parse(s"""<e:s> <p:age> "12"^^<${XSD}int> .""")
    assert(t.select(TypedLiterals.asLong($"obj")).as[Long].head() == 12L)
  }

  test("graph-traversal style: numeric facts aggregate in the value space") {
    val t = parse(
      s"""<e:a> <p:n> "40"^^<${XSD}integer> .""",
      s"""<e:b> <p:n> "2"^^<${XSD}long> .""",
      s"""<e:c> <p:other> "999" .""") // untyped: excluded from numeric space
    val total = t.agg(sum(TypedLiterals.asLong($"obj"))).as[Long].head()
    assert(total == 42L)
  }

  test("each datatype family projects its own value space, others NULL") {
    val t = parse(
      s"""<e:s> <p:d> "2.5"^^<${XSD}double> .""",
      s"""<e:s> <p:b> "true"^^<${XSD}boolean> .""",
      s"""<e:s> <p:dt> "2024-03-01"^^<${XSD}date> .""",
      s"""<e:s> <p:ts> "2024-03-01T12:30:00"^^<${XSD}dateTime> .""")
    val rows = t.select($"pred",
        TypedLiterals.asDouble($"obj").as("d"),
        TypedLiterals.asBoolean($"obj").as("b"),
        TypedLiterals.asDate($"obj").cast("string").as("dt"),
        TypedLiterals.asTimestamp($"obj").cast("string").as("ts"),
        TypedLiterals.asLong($"obj").as("l"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("p:d").getDouble(1) == 2.5 && rows("p:d").isNullAt(2) && rows("p:d").isNullAt(5))
    assert(rows("p:b").getBoolean(2))
    assert(rows("p:dt").getString(3) == "2024-03-01")
    assert(rows("p:ts").getString(4).startsWith("2024-03-01 12:30:00"))
  }

  test("unparseable lexical forms and IRIs/bnodes yield NULL, not errors") {
    val t = parse(
      s"""<e:s> <p:bad> "not-a-number"^^<${XSD}int> .""",
      s"""<e:s> <p:iri> <e:o> .""",
      s"""_:b <p:bn> _:c .""")
    assert(t.select(TypedLiterals.asLong($"obj")).collect().forall(_.isNullAt(0)))
    assert(t.select(TypedLiterals.asString($"obj")).filter($"pred" === "p:iri").collect().head.isNullAt(0))
  }

  test("decimal value space aggregates exactly at fixed scale") {
    val t = parse(
      s"""<e:a> <p:m> "10.10"^^<${XSD}decimal> .""",
      s"""<e:b> <p:m> "0.02"^^<${XSD}decimal> .""")
    val s2 = t.agg(sum(TypedLiterals.asDecimal($"obj")).cast("string")).as[String].head()
    assert(s2 == "10.12")
  }

  test("typed() struct exposes all interpretations at once") {
    val t = parse(s"""<e:s> <p:n> "7"^^<${XSD}int> .""")
    val row = t.select(TypedLiterals.typed($"obj").as("v")).select("v.*").collect().head
    assert(row.getAs[String]("string_v") == "7")
    assert(row.getAs[Long]("long_v") == 7L)
    assert(row.isNullAt(row.fieldIndex("bool_v")))
  }
}
