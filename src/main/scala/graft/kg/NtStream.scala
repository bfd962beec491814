package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/**
 * Structured Streaming front-end for the same kernel (beyond the
 * reference, which is a pull iterator — SURVEY.md §1.4 notes the flatMap
 * kernel is stateless per line, so it lifts to `readStream` unchanged).
 *
 * Shape: a stream of CorpusRow micro-batches (files landing in a corpus
 * directory, Kafka, ...) -> parse kernel -> append-mode sink of flat
 * parsed rows; windowed per-repo triple/error rates via a processing-time
 * window over an ingest timestamp.
 */
object NtStream {

  /** Streaming corpus from parquet files landing under `dir`. */
  def corpusStream(spark: SparkSession, dir: String): Dataset[CorpusRow] = {
    import spark.implicits._
    spark.readStream
      .schema("repo STRING, path STRING, commit STRING, lang STRING, content STRING")
      .parquet(dir)
      .as[CorpusRow]
  }

  /** The SAME batch kernel applied to a streaming Dataset. */
  def parsedStream(corpus: Dataset[CorpusRow]): Dataset[ParsedLine] =
    TripleExtract.parse(corpus)

  /**
   * Windowed per-repo metrics over the parsed stream: triples/errors per
   * repo per 10-second ingest window, with a watermark so state is
   * bounded.
   */
  def windowedMetrics(parsed: Dataset[ParsedLine]): DataFrame =
    parsed.toDF()
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", "30 seconds")
      .groupBy(window(col("ingest_ts"), "10 seconds"), col("repo"))
      .agg(
        sum(when(!col("err"), 1L).otherwise(0L)).as("n_triples"),
        sum(when(col("err"), 1L).otherwise(0L)).as("n_errors"))

  /**
   * Stateful streaming exact-dedup: keep the FIRST document per content
   * fingerprint across micro-batches (KeyValueGroupedDataset +
   * flatMapGroupsWithState keyed by sha256(content); state = seen flag).
   * The streaming face of ops.Dedup.exactDedup for continuously landing
   * corpora.
   *
   * State sizing: one boolean entry per distinct fingerprint. With no
   * `stateTtl` the state store grows with the number of distinct documents
   * ever seen — acceptable for bounded backfills, NOT for an unbounded
   * feed. For continuous ingestion pass a TTL matching the window within
   * which re-uploads are expected (e.g. 24h): entries idle longer than the
   * TTL are evicted on a processing-time timeout, so a duplicate arriving
   * after the TTL is treated as new (at-least-once dedup, bounded state).
   */
  def dedupStream(corpus: Dataset[CorpusRow],
                  stateTtl: Option[java.time.Duration] = None): Dataset[CorpusRow] = {
    import corpus.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.streaming.GroupState
    val timeout = if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    corpus
      .withColumn("fp", sha2(col("content"), 256))
      .as[(String, String, String, String, String, String)]
      .groupByKey(_._6) // fingerprint is the appended last column
      .flatMapGroupsWithState[Boolean, CorpusRow](
        OutputMode.Append(), timeout) {
        case (_, rows, state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            stateTtl.foreach(t => state.setTimeoutDuration(t.toMillis)) // refresh TTL
            Iterator.empty
          } else {
            state.update(true)
            stateTtl.foreach(t => state.setTimeoutDuration(t.toMillis))
            rows.take(1).map(r => CorpusRow(r._1, r._2, r._3, r._4, r._5))
          }
      }
  }

  /** Edge view of the parsed stream: raw (subj, pred, obj) terms as the
    * id columns the Bgp layer joins on. */
  def edgeStream(parsed: Dataset[ParsedLine]): DataFrame =
    parsed.toDF().filter(!col("err"))
      .select(col("subj").as("subj_id"), col("pred"), col("obj").as("obj_id"))

  /**
   * Continuous BGP enrichment (STREAM-STATIC): match one PLAIN triple
   * pattern on the live edge stream and equi-join its bindings against
   * a BGP matched over the STATIC materialized graph — the "annotate
   * each arriving fact from the KG" shape. Stateless by construction
   * (no watermark, no state store): each micro-batch joins against the
   * static side, which Spark re-plans per batch (broadcast when small —
   * the vocabulary/dimension case this is for). Path operators are
   * rejected on the STREAM side — closures need iterative self-joins a
   * stream cannot run; put them in the static patterns, where the full
   * Bgp algebra is available.
   */
  def bgpEnrich(streamEdges: DataFrame, staticEdges: DataFrame,
                streamPattern: Bgp.TriplePattern,
                staticPatterns: Seq[Bgp.TriplePattern]): DataFrame = {
    streamPattern.pred match {
      case _: Bgp.V | _: Bgp.C => ()
      case other => throw new IllegalArgumentException(
        s"stream pattern must be plain (no path operators, got $other) — " +
          "match paths on the static side")
    }
    val s = Bgp.patternRel(streamEdges.select("subj_id", "pred", "obj_id"),
      streamPattern)
    val st = Bgp.matchPatterns(staticEdges, staticPatterns)
    val shared = s.columns.toSeq.intersect(st.columns.toSeq)
    require(shared.nonEmpty,
      "the stream pattern and the static patterns share no variable")
    s.join(st, shared, "inner")
  }

  /** Append-mode writer of parsed rows to a parquet sink directory. */
  def writer(parsed: Dataset[ParsedLine], outDir: String,
             checkpointDir: String): DataStreamWriter[Row] =
    parsed.toDF().writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
}
