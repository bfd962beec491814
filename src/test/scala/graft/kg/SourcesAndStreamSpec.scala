package graft.kg

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

/** File ingestion (incl. transparent gzip) and the streaming front-end. */
class SourcesAndStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parseOpt / parseTry / parseOrNull surface parity") {
    val p = NtLineParser.strict
    assert(p.parseOpt("<a:b> <c:d> <e:f> .").isDefined)
    assert(p.parseOpt("# comment").isEmpty)
    assert(p.parseOrNull("garbage") == null)
    assert(p.parseTry("garbage").isFailure)
    assert(p.parseTry("").get.isEmpty)
    assert(p.parseTry("<a:b> <c:d> \"x\" .").get.get.obj == RdfTerm.simpleLiteral("x"))
  }

  test("file source reads plain and gzipped nt files identically") {
    val dir = Files.createTempDirectory("graft-files")
    val content = "<a:b> <c:d> <e:f> .\n# comment\n<a:b> <c:d> \"x\" .\n"
    Files.writeString(dir.resolve("plain.nt"), content)
    val gz = new GZIPOutputStream(Files.newOutputStream(dir.resolve("zipped.nt.gz")))
    gz.write(content.getBytes("UTF-8")); gz.close()

    val docs = NtFileSource.documents(spark, dir.toString + "/*")
    assert(docs.count() == 2)
    val parsed = TripleExtract.parse(docs)
    val perFile = TripleExtract.triples(parsed).toDF()
      .groupBy("path").count().as[(String, Long)].collect().toMap
    assert(perFile.size == 2 && perFile.values.forall(_ == 2L))
    assert(perFile.keys.exists(_.endsWith("plain.nt")))
    assert(perFile.keys.exists(_.endsWith("zipped.nt.gz")))
    // decompressed content parses to the same triples
    val objs = TripleExtract.triples(parsed).toDF()
      .select("path", "obj.value").as[(String, String)].collect()
      .groupBy(_._1.split('/').last).view.mapValues(_.map(_._2).sorted.toList).toMap
    assert(objs("plain.nt") == objs("zipped.nt.gz"))
  }

  test("line-per-row file source parses splittable text") {
    val dir = Files.createTempDirectory("graft-lines")
    Files.writeString(dir.resolve("big.nt"),
      (1 to 100).map(i => s"<e:$i> <p:v> \"$i\" .").mkString("\n") + "\nbad line\n")
    val parsed = NtFileSource.parseLines(spark, dir.toString + "/*.nt")
    assert(parsed.filter(!_.err).count() == 100)
    val errs = parsed.filter(_.err).collect()
    assert(errs.length == 1 && errs.head.message.contains("expected [<, _, or #]"))
  }

  test("streaming kernel over a file stream matches the batch kernel") {
    val in = Files.createTempDirectory("graft-stream-in").toString
    val out = Files.createTempDirectory("graft-stream-out").toString
    val chk = Files.createTempDirectory("graft-stream-chk").toString
    // land two corpus parquet batches
    val batch1 = Seq(CorpusRow("r", "a.nt", "c", "nt", "<a:b> <c:d> <e:f> .\n<a:b> <c:d> \"x\" ."))
    val batch2 = Seq(CorpusRow("r", "b.nt", "c", "nt", "bad\n<a:b> <c:d> \"y\" ."))
    batch1.toDS().write.mode("append").parquet(in)
    batch2.toDS().write.mode("append").parquet(in)

    val q = NtStream.writer(NtStream.parsedStream(NtStream.corpusStream(spark, in)), out, chk).start()
    q.awaitTermination(60000)

    val parsed = spark.read.parquet(out)
    assert(parsed.filter(!col("err")).count() == 3)
    assert(parsed.filter(col("err")).count() == 1)
    // incremental: a third batch is picked up from the checkpoint
    Seq(CorpusRow("r", "c.nt", "c", "nt", "<a:b> <c:d> \"z\" ."))
      .toDS().write.mode("append").parquet(in)
    val q2 = NtStream.writer(NtStream.parsedStream(NtStream.corpusStream(spark, in)), out, chk).start()
    q2.awaitTermination(60000)
    assert(spark.read.parquet(out).filter(!col("err")).count() == 4)
  }
}
