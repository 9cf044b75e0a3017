package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: print the formatted physical plan of one registry key.
  * `runMain graft.tools.ExplainOne <sfDir> <key>` — not registered in
  * Queries; plan-shape review lives in PLANS.md / GoldenPlanSpec, this is
  * the interactive loupe for one key while iterating.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(args(1))(spark, args(0)).explain("formatted")
    spark.stop()
  }
}
