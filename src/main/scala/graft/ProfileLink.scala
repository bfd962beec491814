package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.kg._

/** Scratch profiler: times each parse+link stage prefix through a noop sink. */
object ProfileLink {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val corpus = Corpus.synthetic(s, 1000, 1000).toDF().cache()
    corpus.count()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s for 1M triples")
    }

    def triples = TripleExtract.assembleTriples(TripleExtract.parseExpr(corpus))
    time("parse-only")(noop(triples))
    time("parse+skolemize")(noop(Skolemize(triples)))
    time("parse+skolemize+canonicalize")(noop(Canonicalize(Skolemize(triples))))
    time("full edges (3x sha2)")(noop(Materialize.edges(Canonicalize(Skolemize(triples)))))
    s.stop()
  }
}
