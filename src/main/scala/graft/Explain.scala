package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.kg.Pipeline.session(master = Some("local[4]"), shufflePartitions = 4)
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"\n######## $name")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
