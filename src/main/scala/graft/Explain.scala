package graft
import org.apache.spark.sql.SparkSession
// scratch plan-audit main (deleted before commit if transient; kept tiny)
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    for (n <- args(0).split(",")) {
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
