package graft.kg

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Typed-literal VALUE-space interpretation.
 *
 * Reference parity: the reference keeps literals lexical in its ADT and
 * delegates value access to model backends — ModelFactorySpec.scala:52-61
 * asserts `statement.getObject.asLiteral.getInt == 12` for
 * `"12"^^xsd:int`, and the graph-traversal test at :85-92 reads
 * `getInt == 42` back out of the materialized model. The Spark-native
 * equivalent is a set of typed COLUMN projections over the term struct
 * (kind, value, lang, dt): each `asX` returns the value-space column when
 * the datatype IRI matches that type family, NULL otherwise — so numeric
 * facts in the KG aggregate with ordinary `sum`/`min`/`max` and stay
 * inside whole-stage codegen (casts, no UDFs).
 *
 * Lexical forms that do not parse for their declared datatype yield NULL
 * (`try_cast` semantics — Spark 4 defaults to ANSI, where a plain cast would fail the job), mirroring the backends' lenient
 * value access rather than failing the job.
 */
object TypedLiterals {

  private val XSD = "http://www.w3.org/2001/XMLSchema#"

  /** xsd types whose value space fits a Spark LongType. */
  val integerTypes: Seq[String] = Seq(
    "integer", "long", "int", "short", "byte",
    "nonNegativeInteger", "positiveInteger", "negativeInteger",
    "nonPositiveInteger", "unsignedLong", "unsignedInt", "unsignedShort",
    "unsignedByte").map(XSD + _)

  /** xsd types read as doubles (continuous numerics). */
  val doubleTypes: Seq[String] = Seq("double", "float", "decimal").map(XSD + _)

  val booleanType: String = XSD + "boolean"
  val dateType: String = XSD + "date"
  val dateTimeType: String = XSD + "dateTime"

  private def literalOf(term: Column, dts: Seq[String]): Column =
    when(term("kind") === RdfTerm.LITERAL && term("dt").isin(dts: _*), term("value"))

  /** Value space of any integer-family literal, as long; else NULL. */
  def asLong(term: Column): Column = literalOf(term, integerTypes).try_cast("long")

  /** Value space of double/float/decimal literals, as double; else NULL. */
  def asDouble(term: Column): Column = literalOf(term, doubleTypes).try_cast("double")

  /**
   * Decimal value space at an explicit scale — use for aggregations that
   * must be exact and engine-reproducible (float sums are order-sensitive;
   * decimal sums are not).
   */
  def asDecimal(term: Column, precision: Int = 18, scale: Int = 2): Column =
    literalOf(term, doubleTypes).try_cast(s"decimal($precision,$scale)")

  /** xsd:boolean value space; else NULL. */
  def asBoolean(term: Column): Column = literalOf(term, Seq(booleanType)).try_cast("boolean")

  /** xsd:date value space; else NULL. */
  def asDate(term: Column): Column = literalOf(term, Seq(dateType)).try_cast("date")

  /** xsd:dateTime value space; else NULL. */
  def asTimestamp(term: Column): Column = literalOf(term, Seq(dateTimeType)).try_cast("timestamp")

  /** Lexical form of ANY literal (the reference's getString). */
  def asString(term: Column): Column =
    when(term("kind") === RdfTerm.LITERAL, term("value"))

  /**
   * One-stop typed projection: a struct of every interpretation, for
   * exploratory queries (`typed(obj).getField("long_v")`).
   */
  def typed(term: Column): Column = struct(
    asString(term).as("string_v"),
    asLong(term).as("long_v"),
    asDouble(term).as("double_v"),
    asBoolean(term).as("bool_v"),
    asDate(term).as("date_v"),
    asTimestamp(term).as("ts_v"))
}
