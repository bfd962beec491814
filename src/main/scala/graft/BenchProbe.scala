package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg._

/**
 * Component-level probes for the optimization round (guide §1: decide
 * where the time actually goes before changing anything). Times each
 * stage of the two most expensive bench queries in isolation with the
 * noop sink. Not part of the driver contract.
 */
object BenchProbe {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1L << 20).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed(name: String, reps: Int = 2)(f: => Unit): Unit = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"[probe] $name%-40s best=${ts.min}%6.3f  samples=${ts.map(t => f"$t%.3f").mkString(",")}")
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = session(cpus)
    s.read.parquet(s"$sfDir/nation.parquet").count()
    SparkEntry.queries("kg_parse_nation")(s, sfDir).count()

    val which = if (args.isEmpty) Set("bind", "er") else args.toSet

    if (which("bind")) {
      val XSD = "http://www.w3.org/2001/XMLSchema#"
      def ordersCorpus = {
        val orders = s.read.parquet(s"$sfDir/orders.parquet").repartition(cpus)
        Corpus.fromTableTyped(orders, "orders", "o_orderkey", Seq(
          ("o_custkey", col("o_custkey"), s"${XSD}long"),
          ("o_totalprice", col("o_totalprice"), s"${XSD}double")))
      }
      timed("bind: corpus render") { noop(ordersCorpus.toDF()) }
      timed("bind: + parse") { noop(TripleExtract.parse(ordersCorpus).toDF()) }
      def triples = Canonicalize(Skolemize(
        TripleExtract.triples(TripleExtract.parse(ordersCorpus)).toDF()))
      timed("bind: + skolem + canon") { noop(triples) }
      timed("bind: edges") { noop(Materialize.edges(triples)) }
      timed("bind: nodes") { noop(Materialize.nodes(triples)) }
      timed("bind: edges+nodes via checkpoints") {
        val t = triples.localCheckpoint(false)
        noop(Materialize.edges(t).localCheckpoint(false))
        noop(Materialize.nodes(t).localCheckpoint(false))
      }
      timed("bind: full query") {
        noop(SparkEntry.queries("kg_sparql_bind")(s, sfDir))
      }
    }

    if (which("er")) {
      val n = s.read.parquet(s"$sfDir/nation.parquet")
      val base = substring(sha2(col("n_name"), 256), 1, 12)
      val idb = col("n_nationkey").cast("long") * 10
      def ents = n.select(explode(array(
        struct(idb.as("id"), base.as("label")),
        struct((idb + 1).as("id"), concat(upper(base), lit(".")).as("label")),
        struct((idb + 2).as("id"), concat(base, lit("xx")).as("label")),
        struct((idb + 3).as("id"), substring(sha2(col("n_name"), 256), 2, 11).as("label")),
        struct((idb + 4).as("id"), concat(base, lit("zzz")).as("label"))
      )).as("e")).select(col("e.id").as("id"), col("e.label").as("label"))
      timed("er: ents only") { noop(ents) }
      timed("er: full resolveEntities") {
        noop(EntityResolution.resolveEntities(ents, "id", "label", maxEdit = 2))
      }
      // CC in isolation on the same-shape verified pairs
      import s.implicits._
      val pairs = (0 until 25).flatMap { k =>
        Seq((k * 10L, k * 10L + 1), (k * 10L, k * 10L + 2), (k * 10L, k * 10L + 3))
      }.toDF("a", "b")
      timed("er: cc on star pairs") {
        noop(GraphOps.connectedComponents(pairs, "a", "b"))
      }
    }

    s.stop()
  }
}
