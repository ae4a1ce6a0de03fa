package graft
import org.apache.spark.sql.SparkSession
import graft.queries.Registry
/** Dev main: dump formatted physical plans for named queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // mirror the 32-partition bench plan shape on a small local master
    val spark = Sessions.local("4", shufflePartitions = "32",
      appName = "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"==== $name ====")
      Registry.all(name).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
