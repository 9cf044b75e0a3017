package graft

import org.apache.spark.sql.functions._

/** Round-14 specs (VERDICT r13 #1): the shortlist-build cost fix — the
  * two-stage top-k cut, the corpus-relative probe-window clip, and the
  * explicit-parallelism candidate join — is pinned ROW-IDENTICAL to the
  * round-13 single-global-window form it replaced.
  */
class Round14Spec extends SparkSpec {

  private def store(name: String) =
    ops.IndexStore.read(spark, sf, name)

  test("knnShortlistFull is row-identical to the single global top-K window over the raw candidates") {
    graft.functions.DotProduct.register(spark)
    val e = Tables.embeddings(spark, sf)
    val assigned = store("ivf_assigned")
    val cent = store("ivf_centroids")
    val k = ops.IndexStore.KnnFullTopK
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a_id")).orderBy(col("dot").desc, col("b_id").asc)
    val reference = ops.Similarity.knnCandidatesFull(e, assigned, cent)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
    val fast = ops.Similarity.knnShortlistFull(e, assigned, cent, k).cache()
    try {
      assert(fast.count() === reference.count())
      // exact set equality, dots included — the pre-cut is a pure
      // execution-strategy change, never a row change
      assert(fast.except(reference).count() === 0L)
      assert(reference.except(fast).count() === 0L)
    } finally fast.unpersist()
  }

  test("the corpus-relative window clip drops no candidate: every probed bucket is inside the routing domain") {
    graft.functions.DotProduct.register(spark)
    val e = Tables.embeddings(spark, sf)
    val assigned = store("ivf_assigned")
    val m = ops.Similarity.subBuckets(assigned)
    // the routing's bucket domain is exactly 0..m-1, so a clipped row
    // could never have joined — the membership side has no bucket outside
    val routed = ops.Similarity.knnRouting(assigned, m)
    val dom = routed.agg(min(col("bucket")), max(col("bucket"))).head()
    assert(dom.getLong(0) >= 0L && dom.getLong(1) <= m - 1)
  }

  test("a forced fresh build produces the artifacts the serving queries read (marker + row counts)") {
    graft.functions.DotProduct.register(spark)
    // rebuild through the NEW shortlist pipeline and check the manifest
    // matches what the previous build left in the store
    val before = store("knn_candidates_full").count()
    val df = ops.IndexStore.indexBuildVecsearch(spark, sf)
    val counts = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("knn_candidates_full") === before)
    assert(counts("ivf_centroids") === 10L)
  }
}
