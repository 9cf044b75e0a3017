package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // fixture-scale split size (see Bench.scala)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "16m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args(1)
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(args(0))(spark, sf).write.mode("overwrite")
        .format("noop").save()
      println(f"${args(0)}: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
