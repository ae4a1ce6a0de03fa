package graft
import org.apache.spark.sql.SparkSession
import graft.queries.Registry
/** Dev main: dump formatted physical plans for named queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"==== $name ====")
      Registry.all(name).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
