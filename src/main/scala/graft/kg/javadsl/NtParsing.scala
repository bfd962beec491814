package graft.kg.javadsl

import graft.kg.{NtLineParser, NtStatement}
import java.util.{Iterator => JIterator}
import scala.jdk.CollectionConverters._

/**
 * Java-facing parse surface (A5 parity: the reference exposes
 * Java `parse(...)` overloads next to the Scala `apply(...)` ones,
 * NtParser.scala:717-803). Iterator-in/iterator-out, strict or lenient,
 * skipping comment/blank lines and (lenient) bad lines like the
 * reference's companions.
 */
object NtParsing {

  /** Strict: throws graft.kg.NtParseException on the first bad line. */
  def parseStrict(lines: JIterator[String]): JIterator[NtStatement] =
    iterate(lines.asScala, NtLineParser.strict, failFast = true).asJava

  /** Lenient: skips bad lines (and accepts long-quote literals). */
  def parseLenient(lines: JIterator[String]): JIterator[NtStatement] =
    iterate(lines.asScala, NtLineParser.lenient, failFast = false).asJava

  /** Scala-facing equivalents. */
  def strictStatements(lines: Iterator[String]): Iterator[NtStatement] =
    iterate(lines, NtLineParser.strict, failFast = true)

  def lenientStatements(lines: Iterator[String]): Iterator[NtStatement] =
    iterate(lines, NtLineParser.lenient, failFast = false)

  private def iterate(lines: Iterator[String], p: NtLineParser,
                      failFast: Boolean): Iterator[NtStatement] = {
    lines.zipWithIndex.flatMap { case (l, i) =>
      val st = if (failFast) p.parseStatement(l, i + 1) else p.parseOrNull(l, i + 1)
      Option(st)
    }
  }
}
