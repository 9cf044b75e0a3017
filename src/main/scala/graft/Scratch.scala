package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[scratch] $l: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val texts = Tables.documents(spark, "/root/repo/target/fixtures/sf1")
      .select("text").collect().map(_.getString(0))
    def work(ss: Iterator[String]): Iterator[Long] = {
      val p1 = java.util.regex.Pattern.compile("[^a-z0-9 ]")
      val p2 = java.util.regex.Pattern.compile(" +")
      var n = 0L
      ss.foreach { s => n += p2.matcher(p1.matcher(s.toLowerCase).replaceAll(" ")).replaceAll(" ").trim.split(" ").length }
      Iterator(n)
    }
    for (np <- Seq(1, 8, 32)) {
      val rdd = spark.sparkContext.parallelize(texts.toSeq, np)
      rdd.mapPartitions(work).sum() // warm
      t(s"rdd regex $np parts") { rdd.mapPartitions(work).sum() }
    }
    // raw threads, no spark
    t("raw 16 threads") {
      val chunks = texts.grouped(math.ceil(texts.length / 16.0).toInt).toSeq
      val th = chunks.map { c => new Thread(new Runnable { def run(): Unit = work(c.iterator).foreach(_ => ()) }) }
      th.foreach(_.start()); th.foreach(_.join())
    }
    spark.stop()
  }
}
