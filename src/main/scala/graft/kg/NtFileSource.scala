package graft.kg

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * A1-A3: file-based corpus ingestion.
 *
 * The reference's Loader opens a file (with classpath-resource fallback),
 * sniffs gzip/bzip2 magic bytes for transparent decompression, and decodes
 * UTF-8 lines (Loader.scala:31-57,76-129). Spark-native equivalents:
 *
 *  - `spark.read.textFile` already does distributed line splitting AND
 *    transparent `.gz`/`.bz2` decompression through the Hadoop codec
 *    factory (suffix-driven rather than magic-byte-driven — same formats);
 *  - `input_file_name()` supplies the per-line provenance the reference
 *    got from its caller;
 *  - grouping lines back into documents is NOT needed: the parser is
 *    line-local, so files become corpus rows of single lines with the
 *    line number recovered per-file downstream.
 *
 * Two ingestion shapes:
 *  - `documents`: one CorpusRow per FILE (content = whole file) — matches
 *    the table-input contract; fine for source files (<= a few MB each);
 *  - `lines`: one row per line with (path, lineNo) — the scalable shape
 *    for huge single files, since Spark splits uncompressed/bzip2 text
 *    by range while a whole-file read cannot be split.
 */
object NtFileSource {

  /** One CorpusRow per file under `pathGlob` (supports .nt, .nt.gz, .nt.bz2). */
  def documents(spark: SparkSession, pathGlob: String, repo: String = "files",
                commit: String = Corpus.FixedCommit,
                lang: String = TripleExtract.LangStrict): Dataset[CorpusRow] = {
    import spark.implicits._
    // wholetext keeps one row per file; codec decompression is automatic
    spark.read.option("wholetext", "true").text(pathGlob)
      .select(
        lit(repo).as("repo"),
        input_file_name().as("path"),
        lit(commit).as("commit"),
        lit(lang).as("lang"),
        col("value").as("content"))
      .as[CorpusRow]
  }

  /**
   * A5 codec parity: the reference's Loader accepts arbitrary charsets
   * (Loader.scala:34-44). For non-UTF-8 sources, read the raw bytes and
   * decode with the built-in `decode` expression (codegen'd, per-file).
   * No decompression on this path (binaryFile reads verbatim).
   */
  def documentsWithCharset(spark: SparkSession, pathGlob: String, charset: String,
                           repo: String = "files",
                           commit: String = Corpus.FixedCommit,
                           lang: String = TripleExtract.LangStrict): Dataset[CorpusRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(
        lit(repo).as("repo"),
        col("path"),
        lit(commit).as("commit"),
        lit(lang).as("lang"),
        decode(col("content"), charset).as("content"))
      .as[CorpusRow]
  }

  /**
   * One parsed line per row for very large files: text splitting is done
   * by Spark (range-splittable for uncompressed input), line numbers are
   * recovered per file with a window — only needed when exact reference
   * line numbers matter; otherwise pass lineNo=0.
   */
  def parseLines(spark: SparkSession, pathGlob: String,
                 lang: String = TripleExtract.LangStrict): Dataset[ParsedLine] = {
    import spark.implicits._
    val lines = spark.read.textFile(pathGlob)
      .select(input_file_name().as("path"), col("value").as("line"))
      .as[(String, String)]
    lines.mapPartitions { it =>
      val strictParser = NtLineParser.strict
      val lenientParser = NtLineParser.lenient
      val p = if (lang == TripleExtract.LangLenient) lenientParser else strictParser
      it.flatMap { case (path, text) =>
        try {
          if (p.parseSlice(text, 0, text.length, 0))
            Iterator.single(ParsedLine(err = false, "files", path, Corpus.FixedCommit, 0,
              p.subjKind, p.subjValue, p.predValue,
              p.objKind, p.objValue, p.objLang, p.objDt, 0, null))
          else Iterator.empty
        } catch {
          case ex: NtParseException =>
            Iterator.single(ParsedLine(err = true, "files", path, Corpus.FixedCommit, 0,
              -1, null, null, -1, null, null, null, ex.charPos, ex.shortMessage))
        }
      }
    }
  }
}
