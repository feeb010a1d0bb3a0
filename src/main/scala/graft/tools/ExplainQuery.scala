package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named registered queries — the
  * iterate-on-one-plan inspection complement of [[TimeQueries]].
  *
  * Usage: runMain graft.tools.ExplainQuery q_name1 q_name2 ...
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_AQE=false to see
  * the static plan PlanContractSpec pins.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
