package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/**
 * E2+E3: line slicing + triple extraction as one typed Dataset transform.
 *
 * The reference's whole workload is a per-line recursive-descent parse
 * driven by a lazy pull iterator (NtParser.scala:824-897). The Spark-native
 * equivalent is a `mapPartitions`-backed flatMap: one reusable
 * NtLineParser per partition (the reference proves parser reuse is safe,
 * NtParserRegressionSpec.scala:75-96), rows streamed through without
 * materializing a document's lines.
 *
 * Scale notes:
 *  - the stage is narrow (no shuffle); partition count is inherited from
 *    the corpus scan, so `spark.sql.files.maxPartitionBytes` controls
 *    work granularity at 100 TB;
 *  - the typed flatMap is an object-serde boundary Catalyst cannot see
 *    through, but column pruning of the corpus scan still happens because
 *    the kernel is typed on the narrow CorpusRow case class;
 *  - errors ride along in the same pass (ParseOutcome union row) instead
 *    of a second scan.
 */
object TripleExtract {

  final val LangStrict = "nt"
  final val LangLenient = "nt-lenient"

  /**
   * Split content into lines with `BufferedReader.readLine` semantics
   * (what the reference sees through `Source.getLines`): `\n`, `\r` and
   * `\r\n` all terminate a line; no trailing empty line after a final
   * terminator. Zero-copy iterator over the content string.
   */
  private[kg] def sliceLines(content: String): Iterator[String] = {
    new Iterator[String] {
      private var start = 0
      def hasNext: Boolean = start < content.length
      def next(): String = {
        var i = start
        while (i < content.length && { val c = content.charAt(i); c != '\n' && c != '\r' }) i += 1
        val s = content.substring(start, i)
        if (i < content.length) {
          // swallow \r\n as one terminator
          i = if (content.charAt(i) == '\r' && i + 1 < content.length && content.charAt(i + 1) == '\n') i + 2
              else i + 1
        }
        start = i
        s
      }
    }
  }

  /** Parse a whole corpus into triples + error rows in a single pass. */
  def parse(corpus: Dataset[CorpusRow]): Dataset[ParseOutcome] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.mapPartitions { docs =>
      // one parser pair per partition, reused across all rows
      val strictParser = NtLineParser.strict
      val lenientParser = NtLineParser.lenient
      docs.flatMap { doc =>
        val p = if (doc.lang == LangLenient) lenientParser else strictParser
        sliceLines(doc.content).zipWithIndex.flatMap { case (lineText, idx) =>
          val lineNo = idx + 1
          try {
            val st = p.parseStatement(lineText, lineNo)
            if (st eq null) Iterator.empty
            else Iterator.single(ParseOutcome(err = false,
              TripleRow(st.subj, st.pred, st.obj, doc.repo, doc.path, doc.commit, lineNo), null))
          } catch {
            case e: NtParseException =>
              Iterator.single(ParseOutcome(err = true, null,
                ParseErrorRow(doc.repo, doc.path, doc.commit, lineNo, e.charPos, e.shortMessage)))
          }
        }
      }
    }
  }

  def triples(parsed: Dataset[ParseOutcome]): Dataset[TripleRow] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.filter(!_.err).map(_.triple)
  }

  def errors(parsed: Dataset[ParseOutcome]): Dataset[ParseErrorRow] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.filter(_.err).map(_.error)
  }

  /**
   * Strict-job gate (reference C4 semantics, StrictNtParser): fail the job
   * if any strict-mode document produced a parse error. Uses `isEmpty`
   * (limit-1 under the hood), not a full count.
   */
  def failOnErrors(parsed: Dataset[ParseOutcome]): Unit = {
    val spark = parsed.sparkSession
    import spark.implicits._
    val firstErr = parsed.filter(_.err).map(_.error).take(1)
    if (firstErr.nonEmpty) {
      val e = firstErr.head
      throw new NtParseException(e.message, e.charPos,
        s"strict mode: parse error in ${e.repo}/${e.path}@${e.commit} line ${e.line}: ${e.message}")
    }
  }
}
