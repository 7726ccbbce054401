package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the executed plan of named harness queries.
  * Lives in the TEST sourceset (it is tooling, not library surface):
  *
  * {{{
  * sbt 'Test/runMain graft.Explain x06_lsh_candidates,j03_catalog /root/testdata/sf0.001'
  * }}}
  */
object Explain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: Explain <query names, comma-separated> <sf data dir>")
      sys.exit(2)
    }
    val dir = args(1)
    require(new java.io.File(dir).isDirectory, s"not a directory: $dir")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args(0).split(",")) {
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
