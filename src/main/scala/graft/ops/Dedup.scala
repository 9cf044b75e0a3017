package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines: exact (see
  * VectorText.textExactDedup), MinHash+LSH, SimHash, embedding-cosine
  * near-dup.
  *
  * Design: signatures are built from md5 — bit-identical in Spark and
  * DuckDB — so even the LSH pipeline is oracle-checked end-to-end (the
  * oracle replicates the *algorithm*, so LSH recall < 1 cannot cause a
  * mismatch). At 100 TB the only shuffles are groupBy(doc) for signatures
  * and the band-bucket join; candidate verification touches only bucket
  * collisions, never the full pair space.
  */
object Dedup {

  /** 3-word shingles (distinct) as one exploded (doc_id, s) relation. */
  private def shingles(spark: SparkSession, sfDir: String, bound: Int): DataFrame =
    Tables.documents(spark, sfDir)
      .where(col("doc_id") < bound)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(array_distinct(expr(
        """CASE WHEN size(t) < 3 THEN array()
          |ELSE transform(sequence(1, size(t) - 2),
          |  i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))
          |END""".stripMargin))).as("s"))

  /** MinHash signature: k=4 independent hashes h_i(s) = md5(i || '|' || s),
    * signature_i = min over shingles.
    */
  private def signatures(sh: DataFrame): DataFrame =
    sh.groupBy(col("doc_id"))
      .agg(
        min(md5(concat(lit("0|"), col("s")))).as("s0"),
        min(md5(concat(lit("1|"), col("s")))).as("s1"),
        min(md5(concat(lit("2|"), col("s")))).as("s2"),
        min(md5(concat(lit("3|"), col("s")))).as("s3"))

  /** dedup_minhash_sig — per-doc MinHash signature (k=4, 3-shingles). */
  def minhashSig(spark: SparkSession, sfDir: String): DataFrame =
    signatures(shingles(spark, sfDir, Int.MaxValue))
      .orderBy(col("doc_id"))

  /** dedup_minhash_sig_agg — identical signatures computed by the custom
    * mergeable TypedImperativeAggregate (graft.functions.MinHashSketch):
    * k hashes in ONE buffer per group; at scale the shuffle carries 4
    * strings per doc instead of 4 separate min-agg states. Oracle: the
    * same SQL as dedup_minhash_sig — results are bit-identical.
    */
  def minhashSigAgg(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.MinHashSketch.register(spark)
    shingles(spark, sfDir, Int.MaxValue)
      .groupBy(col("doc_id"))
      .agg(expr("graft_minhash(s)").as("sigs"))
      .select(col("doc_id"),
        col("sigs").getItem(0).as("s0"), col("sigs").getItem(1).as("s1"),
        col("sigs").getItem(2).as("s2"), col("sigs").getItem(3).as("s3"))
      .orderBy(col("doc_id"))
  }

  /** dedup_minhash_pairs — LSH banding (b=2 bands × r=2 rows) → candidate
    * pairs → exact shingle-Jaccard verification ≥ 0.8.
    */
  def minhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shingles(spark, sfDir, 200).cache()
    val sig = signatures(sh)
    val band = sig.select(col("doc_id"), md5(concat(col("s0"), col("s1"))).as("b"))
      .unionAll(sig.select(col("doc_id"), md5(concat(col("s2"), col("s3"))).as("b")))
    val cand = band.as("x").join(band.as("y"),
        col("x.b") === col("y.b") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("a_id"), col("s")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("s")), Seq("b_id", "s"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("ni"))
    inter
      .join(cnt.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(cnt.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .withColumn("jaccard",
        col("ni").cast("double") / (col("na") + col("nb") - col("ni")))
      .where(col("jaccard") >= 0.8)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** dedup_connected_components — near-dup CLUSTERING: the LSH-verified
    * pair list becomes an undirected graph; every document in a pair gets
    * labeled with its component's minimum doc_id (the canonical
    * representative a dedup pipeline keeps). Iterative min-label
    * propagation over distributed joins, run to convergence — each
    * iteration is one join + groupBy(min), state persisted and the
    * previous iteration unpersisted.
    *
    * 100 TB note: rounds needed = graph diameter; near-dup components are
    * small and star-like, so convergence is fast. For adversarial chains
    * the large-star/small-star rewrite (alternating) bounds rounds in
    * O(log²) with the same join-shape per round; checkpoint every few
    * rounds to cut lineage.
    */
  def connectedComponents(spark: SparkSession, sfDir: String): DataFrame = {
    // cached plans disable AQE partition coalescing by default, which makes
    // every tiny iteration schedule full-width stages; allowing the cached
    // plan's output partitioning to change restores AQE inside the loop.
    // Session-level by necessity (the conf is read at execution time);
    // set only when the user hasn't chosen a value themselves.
    val coalesceKey = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    if (spark.conf.getOption(coalesceKey).isEmpty)
      spark.conf.set(coalesceKey, "true")
    val pairs = minhashPairs(spark, sfDir).select(col("a_id"), col("b_id"))
    val edges = pairs.unionAll(
        pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .persist()
    var labels = edges.select(col("a_id").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist()
    // labels only ever decrease, so the label sum is a monotone fixpoint
    // signal — one cheap aggregate per round instead of a diff join
    def labelSum(df: DataFrame): Long = // coalesce: SUM over an empty graph is NULL
      df.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
    var prevSum = Long.MinValue // sentinel: first round always runs
    var converged = false
    var i = 0
    val maxRounds = 50 // rounds needed = graph diameter; see guard below
    while (!converged && i < maxRounds) {
      val prop = labels.join(edges, col("node") === col("a_id"))
        .select(col("b_id").as("node"), col("label"))
      val next = labels.select(col("node"), col("label")).unionAll(prop)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .persist()
      val nextSum = labelSum(next) // materializes next
      labels.unpersist()
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      i += 1
    }
    // silent non-convergence would return WRONG labels (and hash-fail the
    // exact transitive-closure oracle without explanation) — fail loudly
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxRounds rounds " +
          "(component diameter too large — switch to large-star/small-star)")
    // localCheckpoint materializes the (pair-graph-sized) result so every
    // cached iteration state can be released before returning
    val out = labels.select(col("node").as("doc_id"), col("label").as("component"))
      .orderBy(col("doc_id"))
      .localCheckpoint(true)
    labels.unpersist()
    edges.unpersist()
    out
  }

  /** dedup_simhash — 16-bit SimHash from the leading md5 nibble of each
    * token occurrence; bit j set iff Σ(±1 over tokens) > 0.
    */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", md5(col("w")))
    val hi = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val bitSums = (1 to 16).map { j =>
      sum(when(substring(col("h"), j, 1).isin(hi: _*), 1).otherwise(-1)).as(s"b$j")
    }
    val sums = toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
    val simhashCol = (1 to 16).map { j =>
      when(col(s"b$j") > 0, math.pow(2, j - 1).toInt).otherwise(0)
    }.reduce(_ + _)
    sums.select(col("doc_id"), simhashCol.cast("int").as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** dedup_exact_keep_first — the actual row-eliminating dedup: group by a
    * content fingerprint (md5 of the first 8 tokens — the corpus has no
    * full-text dups, so prefix fingerprints make collisions real), keep the
    * lowest doc_id of each group. At 100 TB this is one hash shuffle on the
    * fingerprint; WindowGroupLimit prunes each group to its first row
    * before the final sort.
    */
  def exactKeepFirst(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fp = md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8)).cast("binary"))
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    Tables.documents(spark, sfDir)
      .withColumn("fp", fp)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  /** dedup_embedding_topk — the 20 most-similar embedding pairs (cosine ≡
    * dot, unit-norm corpus): the verification stage of embedding near-dup.
    */
  def embeddingTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir).where(col("vec_id") < 300)
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("sim_raw", expr(
        "aggregate(zip_with(a_emb, b_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
      .orderBy(desc("sim_raw"), asc("a_id"), asc("b_id"))
      .limit(20)
      .select(col("a_id"), col("b_id"),
        (round(col("sim_raw"), 4) + lit(0.0)).as("sim"))
  }
}
