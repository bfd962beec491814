package graft.kg

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus synthesis (no wall clock, no RNG state outside the
 * row id). Three sources, all producing the input_hint shape
 * `(repo, path, commit, lang, content)`:
 *
 *  1. `fromTable`    — driver parquet tables serialized row-by-row into
 *                      N-Triples docs (keeps DuckDB-oracle checkability);
 *  2. `w3cFixtures`  — the 74 W3C suite files as documents;
 *  3. `synthetic`    — arbitrarily large generated corpus with injected
 *                      predicate/subject skew for bench + salting tests.
 */
object Corpus {

  final val FixedCommit = "0000000000000000000000000000000000000042"

  /** Escape a string column for use inside an N-Triples double-quoted
    * literal. LITERAL `replace`, not `regexp_replace`: the patterns are
    * fixed single characters, and the regex engine cost ~5 interpreted
    * matcher passes per value on every corpus render (r7 bench: the
    * replace chain cut the table-corpus render stage measurably; results
    * are byte-identical — each step is a plain substring substitution). */
  def escapeLiteralCol(v: Column): Column = {
    // order matters: backslash first
    val steps: Seq[(String, String)] = Seq(
      "\\" -> "\\\\",
      "\"" -> "\\\"",
      "\n" -> "\\n",
      "\r" -> "\\r",
      "\t" -> "\\t")
    steps.foldLeft(v) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
  }

  /**
   * One N-Triples document per row of `df`: for each listed column
   * `<urn:g:TABLE:KEY> <urn:col:TABLE:COL> "value"[^^<dt>] .` — values
   * rendered with an explicit per-column string expression so the same
   * text is reconstructible in the DuckDB oracle. `dtIri = None` emits a
   * plain literal; `Some(iri)` a typed one.
   */
  private def tableCorpus(df: DataFrame, table: String, keyCol: String,
                          cols: Seq[(String, Column, Option[String])]): Dataset[CorpusRow] =
    tableCorpusSuffixed(df, table, keyCol, cols.map { case (n, v, dtIri) =>
      (n, v, lit(dtIri.fold("\" .")(iri => s"""\"^^<$iri> ."""))) })

  /** [[tableCorpus]] generalized to a COLUMN-valued literal suffix (the
    * text after the closing quote), enabling row-dependent tags like
    * `"value"@lang .`. */
  private def tableCorpusSuffixed(df: DataFrame, table: String, keyCol: String,
                                  cols: Seq[(String, Column, Column)]): Dataset[CorpusRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = cols.map { case (name, valueExpr, suffix) =>
      val triple = concat(
        lit(s"<urn:g:$table:"), col(keyCol).cast("string"), lit("> "),
        lit(s"<urn:col:$table:$name> \""), escapeLiteralCol(valueExpr.cast("string")),
        suffix)
      // NULL value guard: a NULL makes concat() NULL and concat_ws would
      // silently DROP the whole line, shifting subsequent line numbers and
      // losing the fact with no error row. Emit an intentionally invalid
      // statement instead, so the loss surfaces as a lenient error row /
      // strict job failure with exact lineage. (A NULL column-valued
      // suffix — e.g. a NULL lang tag — hits the same guard.)
      when(valueExpr.isNull || suffix.isNull,
        concat(lit(s"<urn:g:$table:"), col(keyCol).cast("string"),
          lit(s"> <urn:col:$table:$name> ?NULL")))
        .otherwise(triple)
    }
    df.select(
      lit(s"synthetic/$table").as("repo"),
      concat(lit(s"$table/"), col(keyCol).cast("string"), lit(".nt")).as("path"),
      lit(FixedCommit).as("commit"),
      lit(TripleExtract.LangStrict).as("lang"),
      concat_ws("\n", lines: _*).as("content")
    ).as[CorpusRow]
  }

  /** Plain-literal table corpus. */
  def fromTable(df: DataFrame, table: String, keyCol: String,
                cols: Seq[(String, Column)]): Dataset[CorpusRow] =
    tableCorpus(df, table, keyCol, cols.map { case (n, v) => (n, v, None) })

  /** Typed-literal table corpus — the input shape for TypedLiterals queries. */
  def fromTableTyped(df: DataFrame, table: String, keyCol: String,
                     cols: Seq[(String, Column, String)]): Dataset[CorpusRow] =
    tableCorpus(df, table, keyCol, cols.map { case (n, v, dt) => (n, v, Some(dt)) })

  /** Language-tagged table corpus: each listed column renders as
    * `"value"@lang` with the tag taken from a COLUMN (row-dependent) —
    * the input shape for LANG()/langString value-space queries. */
  def fromTableTagged(df: DataFrame, table: String, keyCol: String,
                      cols: Seq[(String, Column, Column)]): Dataset[CorpusRow] =
    tableCorpusSuffixed(df, table, keyCol, cols.map { case (n, v, langCol) =>
      (n, v, concat(lit("\"@"), langCol.cast("string"), lit(" ."))) })

  /** The W3C fixture files as corpus documents (driver-side read: 74 tiny files). */
  def w3cFixtures(spark: SparkSession, lang: String = TripleExtract.LangStrict): Dataset[CorpusRow] = {
    import spark.implicits._
    val names = fixtureNames
    val rows = names.map { n =>
      val in = getClass.getResourceAsStream(s"/w3c/$n")
      val content = try scala.io.Source.fromInputStream(in)(scala.io.Codec.UTF8).mkString finally in.close()
      CorpusRow("w3c/ntriples", n, FixedCommit, lang, content)
    }
    spark.createDataset(rows)
  }

  lazy val fixtureNames: Seq[String] = {
    val in = getClass.getResourceAsStream("/w3c/manifest.ttl")
    val manifest = try scala.io.Source.fromInputStream(in)(scala.io.Codec.UTF8).mkString finally in.close()
    """mf:action\s+<([^>]+)>""".r.findAllMatchIn(manifest).map(_.group(1)).toList.distinct
  }

  /**
   * Generated corpus: `nDocs` documents of `linesPerDoc` statements.
   * Fully distributed (seeded per doc id, generated inside mapPartitions)
   * and deterministic. Skew injection for E6: ~30% of predicates are
   * rdf:type / rdfs:label and ~10% of subjects are one of 8 hub entities,
   * mirroring real KG hot keys.
   */
  def synthetic(spark: SparkSession, nDocs: Long, linesPerDoc: Int): Dataset[CorpusRow] = {
    import spark.implicits._
    spark.range(nDocs).as[Long].mapPartitions { ids =>
      val sb = new java.lang.StringBuilder(linesPerDoc * 96)
      ids.map { id =>
        sb.setLength(0)
        var j = 0
        while (j < linesPerDoc) {
          // cheap deterministic mix (splitmix64-style) on (id, j)
          var x = id * 0x9E3779B97F4A7C15L + j * 0xBF58476D1CE4E5B9L
          x ^= (x >>> 31); x *= 0x94D049BB133111EBL; x ^= (x >>> 27)
          val r = (x & Long.MaxValue)
          val subj =
            if (r % 10 == 0) s"<http://kg.example/hub/${r % 8}>"
            else if (r % 7 == 0) s"_:b${r % 1000}"
            else s"<http://kg.example/entity/${r % 100000}>"
          val pred = (r % 10) match {
            case 0 | 1     => "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
            case 2         => "<http://www.w3.org/2000/01/rdf-schema#label>"
            case 3         => s"<http://kg.example/rel/knows>"
            case k         => s"<http://kg.example/prop/p$k>"
          }
          val obj = (r % 6) match {
            case 0 => s"<http://kg.example/entity/${(r >>> 3) % 100000}>"
            case 1 => s""""name ${r % 100000}"@en"""
            case 2 => s""""${r % 1000000}"^^<http://www.w3.org/2001/XMLSchema#integer>"""
            case 3 => s""""caf\\u00E9 %${(r % 89 + 10)}"""".replace("%", "\\u0025") // unicode-escape exercise
            case 4 => s"_:v${(r >>> 2) % 1000}"
            case _ => s""""plain value ${r % 10000}""""
          }
          sb.append(subj).append(' ').append(pred).append(' ').append(obj).append(" .")
          if (r % 13 == 0) sb.append(" # trailing comment")
          sb.append('\n')
          if (r % 17 == 0) sb.append("# full comment line\n")
          j += 1
        }
        CorpusRow(s"synthetic/gen/${id % 64}", s"doc/$id.nt", FixedCommit,
          TripleExtract.LangStrict, sb.toString)
      }
    }
  }
}
