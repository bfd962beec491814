package graft
import org.apache.spark.sql.SparkSession
import graft.kg._
object GcProbe {
  def main(args: Array[String]): Unit = {
    val corpusPath = "/tmp/graft_bench_corpus.parquet"
    def run(n: Int): Unit = {
      val s = SparkSession.builder().master(s"local[$n]").appName(s"probe$n")
        .config("spark.sql.shuffle.partitions", n).config("spark.ui.enabled","false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      import s.implicits._
      def job(): Long = {
        val t =
          if (sys.env.get("PROBE_EXPR").isDefined)
            TripleExtract.assembleTriples(TripleExtract.parseExpr(s.read.parquet(corpusPath)))
          else
            TripleExtract.triples(TripleExtract.parse(s.read.parquet(corpusPath).as[CorpusRow])).toDF()
        if (sys.env.get("PROBE_PARSE_ONLY").isDefined) t.count()
        else Materialize.edges(Canonicalize(Skolemize(t))).count()
      }
      job() // warm
      val gcBefore = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      import scala.jdk.CollectionConverters._
      def gcMs = gcBefore.asScala.map(_.getCollectionTime).sum
      val g0 = gcMs; val t0 = System.nanoTime()
      val c = job()
      val wall = (System.nanoTime()-t0)/1e9; val g = (gcMs-g0)/1000.0
      println(f"[probe] n=$n triples=$c wall=$wall%.2f gc_sec=$g%.2f thr=${c/wall/1e6}%.2f M/s")
      s.stop()
    }
    run(32); run(32); run(8); run(8); run(32)
  }
}
