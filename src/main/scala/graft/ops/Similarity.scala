package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding corpus.
  *
  * Brute-force exact top-k is VectorText.vecKnnTopk; this adds the scale
  * path: a sign-LSH coarse quantizer (bucket = sign bits of the leading
  * dimensions) so the candidate join is pruned to same-bucket vectors.
  * At 100 TB the corpus is hash-partitioned by bucket and each query only
  * touches its bucket's partitions — the cross join never materializes.
  */
object Similarity {

  /** 16-way sign bucket from the first 4 dimensions. */
  private def bucketCol(emb: String) =
    (0 until 4).map { i =>
      when(element_at(col(emb), i + 1) > 0f, math.pow(2, i).toInt).otherwise(0)
    }.reduce(_ + _).cast("int")

  /** ann_lsh_bucket — top-3 same-bucket neighbors for each query vector. */
  def annLshBucket(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where(col("vec_id") < 50)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        bucketCol("embedding").as("bucket"))
    val c = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
      bucketCol("embedding").as("bucket"))
    val w = Window.partitionBy(col("a_id")).orderBy(desc("sim_raw"), asc("b_id"))
    c.join(broadcast(q), Seq("bucket"))
      .where(col("a_id") =!= col("b_id"))
      .withColumn("sim_raw", expr(
        "aggregate(zip_with(a_emb, b_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("a_id"), col("bucket"), col("b_id"),
        round(col("sim_raw"), 4).as("sim"), col("rn"))
      .orderBy(col("a_id"), col("rn"))
  }
}
