package graft.ops


import graft.Tables
import graft.ops.Checkpoints.CutOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting, plus the
  * bucketed ANN similarity search.
  */
object TextAnalysis {

  /** Per-language keyword lists for the overlap scorer. The corpus shares
    * one vocabulary across langs (FIXTURES), so prediction accuracy is not
    * the point — deterministic scoring + argmax semantics are.
    */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow", "big", "small"),
    "es" -> Seq("data", "table", "row", "column"),
    "de" -> Seq("key", "value", "hash", "sort"),
    "fr" -> Seq("join", "merge", "group", "agg"),
    "zh" -> Seq("scan", "filter", "query", "stream"))

  /** text_normalize — the canonical cleaning pass a corpus gets before
    * dedup/tokenization: lowercase, strip non-alphanumerics to spaces,
    * collapse whitespace, trim; emits the normalized prefix, token count,
    * and whether normalization changed the text. Per-row, no shuffle.
    */
  def normalize(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.NormalizeText.register(spark)
    Tables.documents(spark, sfDir)
      .withColumn("norm", expr("graft_norm_text(text)"))
      .select(
        col("doc_id"),
        substring(col("norm"), 1, 60).as("norm_head"),
        size(split(col("norm"), " ")).as("n_tokens_norm"),
        (col("norm") =!= col("text")).as("changed"))
      .orderBy(col("doc_id"))
  }

  /** pipeline_corpus_curation — the end-to-end curation flow a training
    * corpus actually goes through, composed from this library's operators
    * in ONE lazy plan: normalize → quality gate (≥ 10 tokens) → exact
    * dedup on the normalized fingerprint (keep lowest doc_id) → stratified
    * quota (≤ 25 docs per source by md5 order). Emits the surviving docs
    * with their stage evidence. One narrow shuffle per keyed stage;
    * everything else is per-row.
    */
  def corpusCuration(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.NormalizeText.register(spark)
    import org.apache.spark.sql.expressions.Window
    val wDedup = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val wQuota = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, sfDir)
      .withColumn("norm", expr("graft_norm_text(text)"))
      .withColumn("n_tok", size(split(col("norm"), " ")))
      .where(col("n_tok") >= 10)
      .withColumn("fp", md5(col("norm").cast("binary")))
      .withColumn("dup_rank", row_number().over(wDedup))
      .where(col("dup_rank") === 1)
      .withColumn("quota_rank", row_number().over(wQuota))
      .where(col("quota_rank") <= 25)
      .select(col("doc_id"), col("source"), col("n_tok"), col("fp"),
        col("quota_rank"))
      .orderBy(col("source"), col("quota_rank"))
  }

  /** pipeline_training_emit — the FULL training-corpus emit, one lazy
    * plan: normalize → quality gate (≥10 tokens) → exact dedup
    * keep-first on the norm fingerprint → train/eval split (doc_id mod
    * 10) → DECONTAMINATE train against eval 3-shingles (drop train docs
    * with >50% shingle overlap) → per-source quota (20) → per-source
    * corpus stats. Every stage is a keyed shuffle or a shingle-keyed
    * semi join; nothing global, nothing driver-paced — the composition
    * a 100 TB curation run executes end-to-end. Oracle mirrors it
    * stage by stage (same convention as pipeline_corpus_curation).
    */
  def trainingEmit(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.NormalizeText.register(spark)
    import org.apache.spark.sql.expressions.Window
    // The normalized+deduped corpus is consumed THREE times below (eval
    // shingles, train rows, train shingles). localCheckpoint materializes
    // it once — exactly what a 100 TB curation run does between the dedup
    // and decontamination stages — and the explicit repartition by doc_id
    // lets every downstream doc_id-keyed stage (shingle-count aggregates,
    // the contamination join) reuse one partitioning instead of
    // re-exchanging per stage (VERDICT r4 #3: was 9 exchanges).
    val base = Tables.documents(spark, sfDir)
      .withColumn("norm", expr("graft_norm_text(text)"))
      .withColumn("n_tok", size(split(col("norm"), " ")))
      .where(col("n_tok") >= 10)
      .withColumn("fp", md5(col("norm").cast("binary")))
      .withColumn("dup_rank",
        row_number().over(Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .where(col("dup_rank") === 1)
      .repartition(col("doc_id"))
      .lineageCut(true)
    def shinglesOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), split(col("norm"), " ").as("t"))
      .select(col("doc_id"), explode(array_distinct(expr(
        """CASE WHEN size(t) < 3 THEN array()
          |ELSE transform(sequence(1, size(t) - 2),
          |  i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))
          |END""".stripMargin))).as("s"))
    val evalSh = shinglesOf(base.where(col("doc_id") % 10 === 0))
      .select(col("s")).distinct()
    val train = base.where(col("doc_id") % 10 =!= 0)
    val trainSh = shinglesOf(train)
    val tot = trainSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val hit = trainSh.join(evalSh, Seq("s"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    val contam = tot.join(hit, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_sh")).as("frac"))
    train.join(contam, Seq("doc_id"), "left")
      .where(coalesce(col("frac"), lit(0.0)) <= 0.5)
      .withColumn("quota_rank", row_number().over(Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
      .where(col("quota_rank") <= 20)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"))
  }

  /** pipeline_incremental_merge — the MERGE/upsert shape every incremental
    * curation pipeline runs daily: today's crawl batch ⊕ the existing
    * curated corpus, keyed by content fingerprint (the 8-token-prefix md5
    * dedup_exact_keep_first uses, so cross-document collisions are real).
    * Per the keep-first-seen convention:
    *   - `batch_dup`: within-batch fingerprint collision (all but the
    *     lowest doc_id) — dropped before the corpus is even consulted;
    *   - `dup`: batch fingerprint already in the corpus — dropped,
    *     first-seen wins;
    *   - `insert`: unseen fingerprint — lands in the corpus;
    *   - `keep`: existing corpus row — never rewritten (insert-only merge).
    * Emits the per-action audit counts a production merge logs every run.
    * The existing corpus is modeled as even doc_ids, the new batch as
    * doc_ids divisible by 3 — overlapping on multiples of 6, so all four
    * actions occur.
    *
    * 100 TB note: the whole merge is ONE keyed shuffle per input on the
    * fingerprint — the batch side's dedup window and its membership join
    * share the same hash partitioning, and the corpus side ships only its
    * (fp)-projected distinct keys; no row of either side moves twice and
    * nothing is cartesian (PlanSpec gate). The audit aggregate is 4 rows.
    */
  /** The 8-token-prefix content fingerprint the whole exact-dedup/merge
    * family keys on (same expression as dedup_exact_keep_first).
    */
  private[graft] def contentFp =
    md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8)).cast("binary"))

  /** One MERGE round — the per-batch body shared by batch M27 and its
    * streaming foreachBatch twin (VERDICT r3 #3): classify `batch`
    * (doc_id, source, fp) against the corpus fingerprint set with
    * keep-first-seen semantics. Returns (doc_id, source, fp, action) with
    * action ∈ {batch_dup, dup, insert}; callers append the `insert` rows
    * to the corpus. One keyed window + one keyed membership join, both
    * hash-partitioned on fp.
    */
  private[graft] def classifyMergeBatch(batch: DataFrame, corpusFps: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    batch
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .join(corpusFps.select(col("fp")).distinct().withColumn("in_corpus", lit(1)),
        Seq("fp"), "left")
      .withColumn("action",
        when(col("rn") > 1, "batch_dup")
          .when(col("in_corpus").isNotNull, "dup")
          .otherwise("insert"))
      .select(col("doc_id"), col("source"), col("fp"), col("action"))
  }

  def incrementalMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), contentFp.as("fp"))
    val existing = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 3 === 0)
    val classified = classifyMergeBatch(batch, existing)
      .select(col("doc_id"), col("source"), col("action"))
      .unionAll(existing.select(col("doc_id"), col("source"), lit("keep").as("action")))
    classified
      .groupBy(col("action"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("action"))
  }

  /** M55 pipeline_dataset_diff — snapshot diff between two corpus
    * versions: the added / removed / changed / unchanged audit a lake
    * publishes alongside every new dataset release (and the precondition
    * for incremental downstream rebuilds — only `changed`+`added` need
    * reprocessing). Snapshots are simulated with the M27 modulo-slice
    * idiom: `old` = 90% of docs, `new` = 95% with every 7th doc's text
    * edited. Change detection compares md5 content fingerprints (UTF-8
    * byte-identical cross-engine, the M16 idiom) — never the full text,
    * so the join rows stay narrow. One doc_id-keyed full-outer join +
    * one 4-group aggregate: linear, one shuffle each, at any corpus
    * size; the 100 TB form reads two partitioned snapshot layouts
    * co-bucketed on doc_id and the join is exchange-free.
    */
  def datasetDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val oldSnap = docs.where(col("doc_id") % 20 < 18)
      .select(col("doc_id").as("o_id"), col("source").as("o_source"),
        md5(col("text").cast("binary")).as("o_fp"))
    val newSnap = docs.where(col("doc_id") % 20 =!= 0)
      .select(col("doc_id").as("n_id"), col("source").as("n_source"),
        md5(when(col("doc_id") % 7 === 0, upper(col("text")))
          .otherwise(col("text")).cast("binary")).as("n_fp"))
    oldSnap.join(newSnap, col("o_id") === col("n_id"), "full_outer")
      .select(
        coalesce(col("o_id"), col("n_id")).as("doc_id"),
        coalesce(col("n_source"), col("o_source")).as("source"),
        when(col("o_id").isNull, "added")
          .when(col("n_id").isNull, "removed")
          .when(col("o_fp") =!= col("n_fp"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("status"))
  }

  /** M38 pipeline_split_train_eval — the deterministic train/val/test split
    * every training pipeline runs before anything else: documents routed by
    * the first two md5 hex chars of their id (md5 is bit-identical
    * cross-engine, the G4 idiom) into ≈90/5/5 buckets ('00'-'e5' train,
    * 'e6'-'f2' val, rest test), with the per-split audit a production run
    * logs. Hash-routing is partition-independent and stable under corpus
    * growth — a doc never changes split when new data arrives, the property
    * random splits lack. Per-row hash + one keyed agg; no shuffle beyond
    * the 3-group aggregate at any scale.
    */
  def splitTrainEval(spark: SparkSession, sfDir: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string")), 1, 2)
    Tables.documents(spark, sfDir)
      .withColumn("split",
        when(h <= "e5", "train").when(h <= "f2", "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("split"))
  }

  /** M97 pipeline_eval_holdout (round 9) — fixed-SIZE eval carve, the
    * complement of M-split's fixed-RATE split (splitTrainEval): exactly
    * 100 documents form the held-out eval set, chosen as the bottom-100
    * by md5 of CONTENT (tie-break doc_id) so the holdout is stable under
    * re-crawls that renumber documents but keep their text. The global
    * bottom-k plans as TakeOrderedAndProject — each map task ships only
    * its local bottom-100, so there is no corpus-wide sort and no
    * single-partition window even at 100 TB — and the ≤100-row cut set
    * broadcasts back over the corpus for the exact per-source attrition
    * report (docs/chars held out per source). The report is what a
    * training run audits before trusting the holdout: a source with
    * eval_char_share ≈ 0 is unrepresented in eval.
    */
  def evalHoldout(spark: SparkSession, sfDir: String): DataFrame = {
    // ADVICE r9 #5: hash coalesce(text, '') — md5(NULL) is NULL, and
    // Spark sorts NULLS FIRST ascending while DuckDB sorts NULLS LAST, so
    // a null-text row would silently desynchronize the engine and oracle
    // holdout sets; coalescing makes the carve null-safe by construction
    // (both sides hash the same empty string).
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        md5(coalesce(col("text"), lit("")).cast("binary")).as("hv"))
    val eval = docs.orderBy(col("hv"), col("doc_id")).limit(100)
      .select(col("doc_id"), lit(1L).as("ev"))
    docs.join(broadcast(eval), Seq("doc_id"), "left_outer")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("ev"), lit(0L))).as("n_eval"),
        (count(lit(1)) - sum(coalesce(col("ev"), lit(0L)))).as("n_train"),
        sum(when(col("ev").isNotNull, col("n_chars")).otherwise(lit(0L)))
          .as("eval_chars"),
        (round(sum(when(col("ev").isNotNull, col("n_chars")).otherwise(lit(0L)))
            .cast("double") / sum(col("n_chars")), 6) + lit(0.0))
          .as("eval_char_share"))
      .orderBy(col("source"))
  }

  /** M39 text_zipf_slope — corpus statistics check: the log-log slope of
    * the token rank-frequency curve per language (Zipf's law predicts
    * ≈ −1; a strongly different slope flags synthetic/duplicated text).
    * Top-100 ranks per language (row_number with full tiebreak), then
    * regr_slope/regr_r2 over (ln rank, ln freq) — ≤100-term aggregates,
    * rounded 6 dp. One explode + two keyed apertures; the rank window is
    * per-language, the regression per-language — everything keyed.
    */
  def textZipfSlope(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(desc("f"), asc("w"))
    Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("f"))
      .withColumn("rk", row_number().over(w)) // "rank" is reserved in DuckDB
      .where(col("rk") <= 100)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_ranks"),
        (round(expr("regr_slope(ln(f), ln(rk))"), 6) + lit(0.0)).as("zipf_slope"),
        (round(expr("regr_r2(ln(f), ln(rk))"), 6) + lit(0.0)).as("r2"))
      .orderBy(col("lang"))
  }

  /** M43 text_source_entropy — Shannon entropy of the source mix per
    * language: the corpus-diversity diagnostic a data-mixing plan is tuned
    * against (low entropy = one source dominates the language). Float
    * determinism: the per-source terms are summed by an ORDERED running
    * window (sequential in source order on both engines — a bare SUM over
    * doubles would be addition-order-dependent), `ln` inputs are exact
    * int-ratio divisions, and the result is rounded at O(1) magnitude
    * where 6-dp rounding is portable. Group count is dimension-sized, so
    * the windows cost nothing at any scale.
    */
  def sourceEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wl = Window.partitionBy(col("lang"))
    val wCum = wl.orderBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = col("c").cast("double") / col("n_docs")
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
      .withColumn("n_docs", sum(col("c")).over(wl))
      .withColumn("k_sources", count(lit(1)).over(wl))
      .withColumn("ent", sum(-(p * log(p))).over(wCum))
      .withColumn("rn", row_number().over(wl.orderBy(desc("source"))))
      .where(col("rn") === 1)
      .select(col("lang"), col("n_docs"), col("k_sources"),
        (round(col("ent"), 6) + lit(0.0)).as("source_entropy"))
      .orderBy(col("lang"))
  }

  /** I12 fn_url_suite — URL decomposition with `parse_url` (HOST / PATH /
    * QUERY / keyed query params). The corpus has no URL column, so each doc
    * synthesizes one deterministically from its own fields; the oracle
    * constructs the expected components directly from the same fields,
    * independently validating Spark's parser against ground truth rather
    * than against another parser. Pure per-row projection — codegen'd,
    * shuffle-free.
    */
  def fnUrlSuite(spark: SparkSession, sfDir: String): DataFrame = {
    val url = concat(lit("https://ex"), (col("doc_id") % 5).cast("string"),
      lit(".example.com/p/"), col("doc_id").cast("string"),
      lit("?q="), col("source"), lit("&page="), (col("doc_id") % 7).cast("string"))
    Tables.documents(spark, sfDir)
      .withColumn("url", url)
      .select(col("doc_id"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY')").as("query"),
        expr("parse_url(url, 'QUERY', 'q')").as("q_param"),
        expr("parse_url(url, 'QUERY', 'page')").as("page_param"))
      .orderBy(col("doc_id"))
  }

  /** M47 pipeline_quality_funnel — the per-filter attrition report every
    * curation run publishes: an ORDERED battery of quality gates
    * (min-chars → min-tokens → unique-token fraction → digit-density)
    * with, for each stage, how many docs entered, failed, and survived.
    * All four conditions evaluate per-row in ONE scan; the cumulative
    * survivor counts are conjunctions inside a single aggregate, and the
    * 4-row report is shaped from that one agg row (explode of a literal
    * struct array — no second pass, no union of scans). At 100 TB this is
    * one map-side-combined aggregate over the corpus.
    */
  def qualityFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val c1 = col("n_chars") >= 100
    val c2 = size(toks) >= 20
    val c3 = size(array_distinct(toks)).cast("double") / size(toks) >= 0.4
    val c4 = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
      col("n_chars") < 0.3
    def stage(i: Int, name: String, in: Column, out: Column) =
      struct(lit(i).as("stage"), lit(name).as("filter"), in.as("n_in"),
        (in - out).as("n_fail"), out.as("n_out"))
    Tables.documents(spark, sfDir)
      .agg(
        count(lit(1)).as("total"),
        count(when(c1, 1)).as("s1"),
        count(when(c1 && c2, 1)).as("s2"),
        count(when(c1 && c2 && c3, 1)).as("s3"),
        count(when(c1 && c2 && c3 && c4, 1)).as("s4"))
      .select(explode(array(
        stage(1, "min_chars", col("total"), col("s1")),
        stage(2, "min_tokens", col("s1"), col("s2")),
        stage(3, "uniq_frac", col("s2"), col("s3")),
        stage(4, "digit_frac", col("s3"), col("s4")))).as("r"))
      .select(col("r.*"))
      .orderBy(col("stage"))
  }

  /** M40 text_repetition_stats — the repetition-based quality filters a
    * web corpus is gated on (the "repetitious text" family): per document,
    * the unique-token fraction, the mass of the single most frequent
    * token, and the fraction of 3-gram occurrences that are within-doc
    * duplicates. Tokens explode once; trigrams come from lead() chains
    * over the per-doc position window (no self-join); both stats funnels
    * are doc-keyed aggregates joined back on doc_id — every shuffle is
    * keyed by doc, so the op is embarrassingly parallel over documents at
    * 100 TB. All ratios are single int→double divisions (exact inputs,
    * one IEEE op — bit-deterministic).
    */
  def repetitionStats(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documentsSpread(spark, sfDir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val tokStats = toks.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tok"), count(lit(1)).as("n_uniq"),
        max(col("c")).as("top_cnt"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val triStats = toks
      .withColumn("w1", lead(col("w"), 1).over(wDoc))
      .withColumn("w2", lead(col("w"), 2).over(wDoc))
      .where(col("w2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("w1"), col("w2")).as("tri"))
      .groupBy(col("doc_id"), col("tri"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("tri_total"), count(lit(1)).as("tri_uniq"))
    tokStats.join(triStats, Seq("doc_id"))
      .where(col("n_tok") >= 3)
      .select(col("doc_id"), col("n_tok"),
        (col("n_uniq").cast("double") / col("n_tok")).as("uniq_token_frac"),
        (col("top_cnt").cast("double") / col("n_tok")).as("top_token_frac"),
        (lit(1.0) - col("tri_uniq").cast("double") / col("tri_total"))
          .as("dup_trigram_frac"))
      .orderBy(col("doc_id"))
  }

  /** M46 text_keywords_per_doc — per-document keyword extraction: top-3
    * terms by tf-idf (the snippet/tagging primitive). Portability trick
    * inherited from J9: the idf is ROUNDED to 6 dp BEFORE ranking, so the
    * rank key `tf * idf` is one exact-int × rounded-double multiply —
    * identical doubles on both engines, making the top-3 cut
    * deterministic. Doc-keyed rank window; df is one token-keyed agg.
    */
  def keywordsPerDoc(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir).where(col("doc_id") < 100)
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val tf = toks.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.distinct().groupBy(col("w")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id")).orderBy(desc("tfidf"), asc("w"))
    tf.join(dfreq, "w")
      .crossJoin(broadcast(n))
      .withColumn("idf", round(log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("tfidf", col("tf") * col("idf"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("w").as("term"), col("tf"),
        round(col("tfidf"), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** text_pii_redact — the PII scrubbing pass a public-web corpus gets
    * before training: regex-redact emails and phone numbers, count the
    * redactions, and emit the md5 of the redacted text (bit-exact oracle
    * check of the full output without shipping it). The corpus has no PII,
    * so deterministic synthetic PII is appended per row — each doc gains
    * one email and one phone, plus whatever the regexes find organically —
    * making the counts and the redacted text non-trivial at every SF.
    * Pure per-row projection: no shuffle, codegen'd, embarrassingly
    * parallel at 100 TB.
    */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val emailRe = "[a-z0-9]+@[a-z][a-z.]*[a-z]"
    val phoneRe = "\\+1-555-[0-9]{4}" // Java and RE2 agree on this dialect subset
    Tables.documents(spark, sfDir)
      .withColumn("enriched", concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example or +1-555-"),
        lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0")))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("enriched"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("enriched"), lit(phoneRe), lit(0))).as("n_phones"),
        md5(regexp_replace(
          regexp_replace(col("enriched"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").cast("binary")).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  /** text_chunk_split — token-window chunking with overlap (50-token
    * chunks, stride 40): the context-window packing step between curation
    * and tokenization. UDTF-shaped: one row per (doc, chunk) with the
    * chunk's token span and md5 (bit-exact oracle check). Generator over a
    * per-row sequence — no shuffle until the final presentation sort.
    */
  def chunkSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val chunk = 50
    val stride = 40
    Tables.documents(spark, sfDir)
      .withColumn("t", split(col("text"), " "))
      .withColumn("n", size(col("t")))
      .withColumn("chunk_id", explode(expr(s"sequence(0, (n - 1) div $stride)")))
      .withColumn("start_tok", col("chunk_id") * stride + 1)
      .select(
        col("doc_id"), col("chunk_id"), col("start_tok"),
        least(lit(chunk), col("n") - col("start_tok") + 1).as("n_tok"),
        md5(concat_ws(" ", expr(s"slice(t, start_tok, $chunk)")).cast("binary"))
          .as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** text_lang_id — n-gram-overlap language scorer with first-max argmax. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    def score(words: Seq[String]): Column =
      size(array_intersect(array_distinct(split(col("text"), " ")),
        array(words.map(lit): _*)))
    val scored = Tables.documents(spark, sfDir)
      .select(Seq(col("doc_id"), col("lang")) ++
        langWords.map { case (l, ws) => score(ws).as(s"score_$l") }: _*)
    val langs = langWords.map(_._1)
    // first max in fixed language order (en, es, de, fr, zh)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
      case ((l, i), rest) =>
        val geAll = langs.drop(i + 1)
          .map(o => col(s"score_$l") >= col(s"score_$o"))
          .reduce(_ && _)
        when(geAll, l).otherwise(rest)
    }
    scored
      .withColumn("pred", pred)
      .withColumn("correct", (col("pred") === col("lang")).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** text_quality_score — length / stopword-ratio heuristics, 6 dp. */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = Seq("the", "a")
    Tables.documents(spark, sfDir)
      .withColumn("t", split(col("text"), " "))
      .withColumn("n_tokens", size(col("t")))
      .withColumn("n_stop",
        size(expr(s"filter(t, x -> x IN (${stop.map(s => s"'$s'").mkString(",")}))")))
      .select(
        col("doc_id"), col("n_tokens"),
        round((col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"), 6)
          .as("avg_token_len"),
        round(col("n_stop").cast("double") / col("n_tokens"), 6).as("stop_ratio"),
        round(least(lit(1.0), col("n_tokens") / lit(50.0)) *
          (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")), 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** text_token_count — whitespace tokens, regex (BPE-ish) tokens, and the
    * chars/4 estimator.
    */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("re_tokens"),
        ceil(col("n_chars") / lit(4.0)).cast("bigint").as("est_bpe"))
      .orderBy(col("doc_id"))

  /** text_shingle_generate — (doc_id, pos, shingle) rows via the custom
    * Catalyst Generator (graft.functions.ShingleGenerator), the UDTF v2
    * path of SURVEY §2.K3. Oracle recomputes the same shingles in SQL.
    */
  def shingleGenerate(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.ShingleGenerator.register(spark)
    Tables.documents(spark, sfDir)
      .where(col("doc_id") < 15)
      .select(col("doc_id"), expr("graft_shingles(text)").as(Seq("pos", "shingle")))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** text_levenshtein_pairs — fuzzy near-dup via edit distance on bounded
    * 40-char prefixes (Levenshtein is O(n·m); real pipelines run it only
    * on blocking-survivor pairs, exactly as bounded here).
    */
  def levenshteinPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.documents(spark, sfDir).where(col("doc_id") < 8)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("prefix"))
    val a = t.select(col("doc_id").as("a_id"), col("prefix").as("a_p"))
    val b = t.select(col("doc_id").as("b_id"), col("prefix").as("b_p"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_p"), col("b_p")).as("dist"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** text_fingerprint — document fingerprints: full-text md5, head-shingle
    * md5, and the minimum 5-token rolling-window hash (winnowing-style).
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("t", split(col("text"), " "))
      .select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("fp_full"),
        md5(concat_ws(" ", slice(col("t"), 1, 8)).cast("binary")).as("fp_head"),
        expr(
          """CASE WHEN size(t) < 5 THEN md5(CAST(text AS BINARY))
            |ELSE array_min(transform(sequence(1, size(t) - 4),
            |  i -> md5(CAST(concat_ws(' ', element_at(t, i), element_at(t, i + 1),
            |    element_at(t, i + 2), element_at(t, i + 3), element_at(t, i + 4)) AS BINARY))))
            |END""".stripMargin).as("fp_min_shingle"))
      .orderBy(col("doc_id"))

  /** text_ngram_topk — corpus-wide top-20 bigrams. Bigram generation is a
    * SINGLE per-row `transform` over adjacent token pairs (no self-join,
    * no positional shuffle — the n-gram language-model counting shape),
    * then one hash aggregation and a TakeOrdered top-k. Ties at the
    * boundary are broken lexicographically so the cut is deterministic.
    * The `size >= 2` guard matters: Spark's `sequence(1, 0)` DESCENDS.
    */
  def ngramTopk(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("bigram"))
      .limit(20)

  /** M49 pipeline_pack_sequences — sequence packing, the step that turns a
    * curated corpus into fixed-budget training sequences: documents in
    * doc_id order are laid head-to-tail on a global token tape and each
    * doc joins the 512-token window its FIRST token lands in (windows may
    * overflow; the trainer truncates — standard pack-then-truncate).
    * Output is the per-sequence manifest (doc count, token load, id span).
    *
    * The global token tape is an exclusive prefix sum — computed through
    * [[GlobalRank.withGlobalRunningSum]]'s two-pass range-partitioned
    * form, NOT a single-partition window: local running sums in parallel,
    * P per-partition totals rolled into broadcast prefix offsets. At
    * 100 TB the tape costs one range shuffle; token counts are exact
    * longs, so every engine agrees on every boundary.
    */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tokens"))
    GlobalRank.withGlobalRunningSum(docs, 8, col("tokens"), col("doc_id"))
      .withColumn("seq_id", expr("cum_before div 512"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("seq_id"))
  }

  /** M53 pipeline_curriculum_phases — curriculum ordering: the corpus
    * ranked best-first by the M7 quality score and cut into 4 equal
    * phases (the highest-quality quartile trains first), with a
    * per-phase manifest. The global rank runs through
    * [[GlobalRank.withGlobalRowNumber]] + the closed-form ntile — the
    * F5v2 scale shape, never a single-partition NTILE window. The mean
    * quality per phase integerizes first (`round(q·10⁶)` as long — q is
    * already a 6-dp rounded double, so this is exact re-scaling, not new
    * rounding) and divides once: no float accumulation anywhere.
    */
  def curriculumPhases(spark: SparkSession, sfDir: String): DataFrame = {
    val q = qualityScore(spark, sfDir)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("quality"), round(col("quality") * 1e6, 0).cast("long").as("q_e6"))
    GlobalRank.withGlobalRowNumber(q, 8, desc("quality"), asc("doc_id"))
      .withColumn("phase", GlobalRank.ntileExpr(4))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("q_e6")).as("sum_q_e6"),
        min(col("quality")).as("min_quality"),
        max(col("quality")).as("max_quality"))
      .select(col("phase"), col("n_docs"), col("total_tokens"),
        (round(col("sum_q_e6").cast("double") / (lit(1e6) * col("n_docs")), 6)
          + lit(0.0)).as("avg_quality"),
        col("min_quality"), col("max_quality"))
      .orderBy(col("phase"))
  }

  /** M52 pipeline_token_budget_mix — temperature-scaled source mixing (the
    * multilingual-sampling recipe, α = 0.5): each source's share of a 30%
    * epoch token budget is proportional to √(its token count), flattening
    * the head sources; docs fill each source's allowance in md5 order (the
    * repo's deterministic "random") until the allowance is spent — a doc
    * is taken if it STARTS under budget. Per-source manifest out.
    *
    * Determinism: the whole allocation is integer arithmetic — isqrt
    * weights (floor of a correctly-rounded sqrt of an exact long),
    * integer multiply/divide for shares, long token cumsums — so both
    * engines agree on every boundary doc with no float-order hazard.
    * Scale: one keyed agg for totals (20 rows, broadcast back), one
    * hash-partitioned window per source for the fill — no global order.
    */
  def tokenBudgetMix(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("tokens"),
        md5(col("doc_id").cast("string")).as("h"))
    val srcTot = docs.groupBy(col("source")).agg(sum(col("tokens")).as("src_tokens"))
      .withColumn("w", floor(sqrt(col("src_tokens"))).cast("long"))
    val grand = srcTot.agg(sum(col("src_tokens")).as("total_tokens"),
      sum(col("w")).as("w_sum"))
    val budgets = srcTot.crossJoin(broadcast(grand))
      .withColumn("budget",
        expr("total_tokens * 3 div 10 * w div w_sum"))
      .select(col("source").as("b_source"), col("src_tokens"), col("budget"))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("cum_before", coalesce(sum(col("tokens")).over(wSrc), lit(0L)))
      .join(broadcast(budgets), col("source") === col("b_source"))
      .where(col("cum_before") < col("budget"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_taken"), sum(col("tokens")).as("tokens_taken"),
        max(col("budget")).as("budget"), max(col("src_tokens")).as("src_tokens"))
      .select(col("source"), col("n_taken"), col("tokens_taken"), col("budget"),
        col("src_tokens"),
        (round(col("tokens_taken").cast("double") / col("budget").cast("double"), 6)
          + lit(0.0)).as("fill_ratio"))
      .orderBy(col("source"))
  }

  /** M58 text_bm25_topk — BM25 ranking (k1 = 1.2, b = 0.75) of the corpus
    * against the query formed by the 3 highest-df corpus terms (a
    * deterministic in-data query: df desc, term asc — no literal
    * vocabulary assumptions). Classic inverted-index work: term
    * frequencies and document frequencies are exact integer aggregates,
    * the 3-row query relation broadcasts onto the tf list, and each
    * (doc, term) score is one fixed IEEE tree over (tf, dl, df, N,
    * avgdl). Per-doc summation is NOT a float fold: the three term scores
    * land in qrank-numbered slots (max-when pivot) and add in fixed
    * s1+s2+s3 order, so no engine aggregation order can flip a bit (the
    * E23 fixed-tree idiom). Ranking keys on the 6-dp-rounded score (J9:
    * round BEFORE rank) with a doc_id tiebreak; top-10. At 100 TB: two
    * keyed shuffles (term, then doc) — the tf-idf/M46 scale shape with a
    * different scoring tree.
    */
  def bm25Topk(spark: SparkSession, sfDir: String): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val dl = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val tf = docs.select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
    val df_ = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    // top-3 via orderBy+limit (TakeOrderedAndProject) instead of a
    // single-partition row_number window over the whole vocabulary; the
    // rank column is re-derived on the 3 surviving rows (optimization
    // round 16 — same rows under the same unique total order)
    val qterms = df_
      .orderBy(desc("df"), asc("w")).limit(3)
      .withColumn("qrank", row_number().over(
        Window.orderBy(desc("df"), asc("w"))))
    val scored = tf.join(broadcast(qterms), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("tot_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))))
      .withColumn("sc", col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
    scored.groupBy(col("doc_id"))
      .agg(
        max(when(col("qrank") === 1, col("sc"))).as("s1"),
        max(when(col("qrank") === 2, col("sc"))).as("s2"),
        max(when(col("qrank") === 3, col("sc"))).as("s3"))
      .select(col("doc_id"),
        (round(coalesce(col("s1"), lit(0.0)) + coalesce(col("s2"), lit(0.0))
          + coalesce(col("s3"), lit(0.0)), 6) + lit(0.0)).as("bm25"))
      // top-10 via orderBy+limit (TakeOrderedAndProject — the G2 shape)
      // instead of a single-partition row_number window over every scored
      // document; rk is re-derived on the 10 survivors (optimization
      // round 16 — same rows under the same unique total order)
      .orderBy(desc("bm25"), asc("doc_id")).limit(10)
      .withColumn("rk", row_number().over(
        Window.orderBy(desc("bm25"), asc("doc_id"))))
      .orderBy(col("rk"))
  }

  /** M62 text_perplexity_proxy — unigram-LM surprise score, the
    * perplexity-style quality signal curation pipelines threshold on
    * (high mean negative log-prob = token distribution far from the
    * corpus = gibberish or boilerplate candidates). The LM is the
    * corpus's own unigram distribution: p(w) = count(w)/total, both
    * exact integers, so p is one identical double division per DISTINCT
    * word. Per-token -ln(p) is integerized at 1e6 (the J17/J18
    * fixed-point protocol) BEFORE the per-doc sum, so the aggregate is
    * exact LONG math under any order; the mean is one final division
    * rounded 6 dp. Two keyed shuffles (word counts, then doc sums) —
    * the wordcount scale shape with a scoring tree on top. Top-20
    * most-surprising docs, rank on the rounded score with doc_id
    * tiebreak (J9).
    */
  def perplexityProxy(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.Checkpoints.CutOps
    // round 15 (the bpe-prefilter round's shared-relation discipline):
    // pre-aggregate the exploded tokens to (doc_id, w, cnt) ONCE and cut
    // it — the census, the grand total, and the per-doc rollup all derive
    // from it, so the corpus is exploded once (was 3×) and the unigram
    // join moves distinct (doc, word) pairs instead of raw tokens.
    // Σ cnt·nlp_int over pairs ≡ Σ nlp_int over tokens — row-identical.
    val dw = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .lineageCut(true)
    val wc = dw.groupBy(col("w")).agg(sum(col("cnt")).as("c")).lineageCut(true)
    val tot = wc.agg(sum(col("c")).as("total"))
    val nlp = wc.crossJoin(broadcast(tot))
      .select(col("w"),
        expr("CAST(round(-ln(CAST(c AS DOUBLE) / CAST(total AS DOUBLE)) * 1e6) AS BIGINT)")
          .as("nlp_int"))
    dw.join(nlp, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("nlp_int")).as("s"))
      .select(col("doc_id"), col("n_tokens"),
        (round(col("s").cast("double") / (col("n_tokens") * lit(1e6)), 6)
          + lit(0.0)).as("avg_neg_logprob"))
      // top-20 via orderBy+limit (TakeOrderedAndProject) instead of a
      // single-partition window over every scored document; rk re-derived
      // on the 20 survivors (optimization round 16)
      .orderBy(desc("avg_neg_logprob"), asc("doc_id")).limit(20)
      .withColumn("rk", row_number().over(
        Window.orderBy(desc("avg_neg_logprob"), asc("doc_id"))))
      .orderBy(col("rk"))
  }

  /** M64 pipeline_packing_efficiency — the ops report for the M49
    * sequence packer: bins used vs the information-theoretic ideal
    * (ceil(total/budget)), mean fill, and how many bins the greedy
    * prefix-split overflowed (a doc straddling a 512 boundary lands in
    * the bin its cum-prefix starts in, so a bin can exceed budget — the
    * number a packing config review asks for first). Reuses the M49
    * two-pass range-partitioned packing verbatim; the report is one more
    * aggregate over its (already tiny) per-bin relation, so the audit
    * costs nothing beyond the packing itself. All counts exact; the two
    * ratios are single rounded divisions.
    */
  def packingEfficiency(spark: SparkSession, sfDir: String): DataFrame =
    packSequences(spark, sfDir)
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("seq_tokens")).as("total_tokens"),
        sum(when(col("seq_tokens") > 512, 1L).otherwise(0L)).as("n_over_budget"),
        max(col("seq_tokens")).as("max_seq_tokens"))
      .select(col("n_seqs"), col("total_tokens"),
        expr("CAST((total_tokens + 511) div 512 AS BIGINT)").as("ideal_seqs"),
        col("n_over_budget"), col("max_seq_tokens"),
        (round(col("total_tokens").cast("double") / (col("n_seqs") * lit(512.0)), 6)
          + lit(0.0)).as("mean_fill"))

  /** M70 pipeline_epoch_shuffle — reproducible per-epoch data ordering:
    * each training epoch re-shuffles the corpus, but the permutation must
    * be a pure function of (epoch, doc_id) so any worker — or a re-run
    * months later — derives the identical order with no coordination.
    * The shuffle key is md5("ep<epoch>|<doc_id>"); the query emits each
    * epoch's manifest head (first 10 docs) as the auditable witness.
    * 100 TB: the key is map-side; the per-epoch top-10 prunes through
    * WindowGroupLimit before any sort — the full permutation is never
    * materialized, workers sort only their own shard by the same key.
    */
  def epochShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch")).orderBy(col("shuffle_key"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(expr("sequence(0, 2)")).as("epoch"))
      .withColumn("shuffle_key",
        md5(concat(lit("ep"), col("epoch").cast("string"), lit("|"),
          col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 10)
      .select(col("epoch"), col("rk"), col("doc_id"), col("shuffle_key"))
      .orderBy(col("epoch"), col("rk"))
  }

  /** M68 text_novelty_frac — per-document 5-gram novelty in ingest
    * (doc_id) order: the fraction of a document's distinct 5-grams whose
    * FIRST corpus occurrence is this document. The canonical "how much
    * new text does each arrival add" curve a streaming-ingest curation
    * pipeline watches (late documents full of already-seen n-grams are
    * crawl-duplicate suspects even when no single document matches).
    *
    * First occurrence = min(doc_id) per gram, attached as an UNBOUNDED
    * window min over the gram key — ONE gram-keyed shuffle and one gram
    * explode total (an agg + join-back formulation, which the oracle
    * uses, explodes the corpus-sized gram relation twice and shuffles it
    * twice for identical results). min is associative — no ordering
    * dependence; the shape holds at 100 TB where "ingest order" is a
    * monotone snapshot id instead of doc_id. Documents under 5 tokens
    * carry no grams and drop out (M61 convention). Counts exact; one
    * rounded division.
    */
  def textNoveltyFrac(spark: SparkSession, sfDir: String): DataFrame = {
    val grams = Tables.documentsSpread(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(array_distinct(expr(
        """CASE WHEN size(t) < 5 THEN array()
          |ELSE transform(sequence(1, size(t) - 4),
          |  i -> concat_ws(' ', slice(t, i, 5)))
          |END""".stripMargin))).as("g"))
    grams
      .withColumn("first_doc", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        (round(col("n_novel").cast("double") / col("n_grams"), 6) + lit(0.0))
          .as("novelty_frac"))
      .orderBy(col("doc_id"))
  }

  /** M69 pipeline_quality_weighted_sample — quality-weighted Bernoulli
    * downsampling (the FineWeb-style "keep with probability = quality"
    * recipe) made DETERMINISTIC: each document draws its uniform from
    * md5('qs|' || doc_id) (first 8 hex digits as a 32-bit integer) and is
    * kept iff draw < round(quality · 2³²) — an exact integer comparison,
    * so the sample is reproducible bit-for-bit on any engine and any
    * partitioning, and re-runs are idempotent (the property a 100 TB
    * curation pipeline needs to resume a half-finished sampling job).
    * Quality is the M19 score recomputed inline (same expression tree on
    * both engines → identical doubles). Per-source report: docs, kept,
    * kept fraction, kept token mass. Map-only until the final keyed agg.
    */
  def qualityWeightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = Seq("the", "a")
    Tables.documents(spark, sfDir)
      .withColumn("t", split(col("text"), " "))
      .withColumn("n_tokens", size(col("t")))
      .withColumn("quality",
        least(lit(1.0), col("n_tokens") / lit(50.0)) *
          (lit(1.0) - size(expr(s"filter(t, x -> x IN (${stop.map(s => s"'$s'").mkString(",")}))"))
            .cast("double") / col("n_tokens")))
      .withColumn("draw",
        conv(substring(md5(concat(lit("qs|"), col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long"))
      .withColumn("kept",
        col("draw") < expr("CAST(round(quality * 4294967296) AS BIGINT)"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tokens").cast("long")).otherwise(0L)).as("kept_tokens"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        (round(col("n_kept").cast("double") / col("n_docs"), 6) + lit(0.0)).as("kept_frac"),
        col("kept_tokens"))
      .orderBy(col("source"))
  }

  /** M84 text_bpe_pair_stats — the first iteration of BPE tokenizer
    * training: adjacent character-pair frequencies across the corpus's
    * words (each word contributes length−1 overlapping 2-grams), top-20
    * merge candidates by exact integer count (ties broken on the pair
    * string) — the statistic that decides the first merge rule, and the
    * audit that shows whether a tokenizer's merge table still fits a new
    * corpus. Per-row explode + ONE pair-keyed aggregate + a
    * TakeOrderedAndProject cut; linear in total characters at any scale.
    */
  def bpePairStats(spark: SparkSession, sfDir: String): DataFrame = {
    // codegen'd pair walk (optimization round 16): same semantics as the
    // transform(sequence(...), substring) HOF chain it replaces, without
    // the per-character lambda dispatch — see [[graft.functions.CharPairs]]
    graft.functions.CharPairs.register(spark)
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .select(explode(expr("graft_char_pairs(w)")).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("pair"))
      .limit(20)
  }

  /** M93 pipeline_version_hash — content-addressable dataset versioning:
    * every (doc_id, text) pair contributes a 32-bit word decoded from its
    * md5 head (the M90 nibble arithmetic ×8), and the corpus version is
    * the XOR of all words — ORDER-INDEPENDENT by construction, so the
    * same logical corpus yields the same version under any partitioning,
    * split count, engine, or shuffle plan. Per-source subversions compose
    * the same way (XOR is the mergeable aggregate), and any single-row
    * change flips the version with probability 1 − 2⁻³². This is the
    * "did the input actually change" primitive that gates incremental
    * rebuilds and pins training-data provenance.
    *
    * 100 TB: one scan, one keyed XOR aggregate (map-side combinable);
    * the version of a union of shards is the XOR of shard versions —
    * verifiable without re-reading data.
    */
  /** Per-row version words for [[versionHash]], factored over an ARBITRARY
    * (doc_id, text, source) input so the partitioning-invariance property
    * is testable against a reshuffled physical layout of the same corpus
    * (ADVICE r7: the invariance spec must route its repartitioned input
    * through the actual arithmetic, not re-read the table).
    */
  private[graft] def versionWords(docs: DataFrame): DataFrame = {
    def nib(i: Int) =
      s"(ascii(substring(h, $i, 1)) - IF(ascii(substring(h, $i, 1)) >= 97, 87, 48))"
    val wordExpr = (1 to 8)
      .map(i => s"${nib(i)} * ${1L << ((8 - i) * 4)}L").mkString(" + ")
    docs
      .withColumn("h", md5(concat(col("doc_id").cast("string"), lit("|"), col("text"))))
      .select(col("source"), expr(s"CAST($wordExpr AS BIGINT)").as("w"))
  }

  def versionHash(spark: SparkSession, sfDir: String): DataFrame = {
    val d = versionWords(Tables.documents(spark, sfDir))
    val perSource = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), expr("bit_xor(w)").as("version"))
    val all = d.agg(count(lit(1)).as("n_docs"), expr("bit_xor(w)").as("version"))
      .select(lit("ALL").as("source"), col("n_docs"), col("version"))
    perSource.unionByName(all).orderBy(col("source"))
  }

  /** M92 pipeline_license_filter — license-compliance gating, the legal
    * cut every training corpus makes before anything else: per-document
    * license tags (synthesized as a pure key function — the M28 pattern;
    * real corpora carry them as metadata) are grouped into the compliance
    * report — docs, token mass, corpus share, allowed flag per license,
    * and the attribution-required flag the release pipeline must honor.
    * The policy (allow cc-by / cc-by-sa / cc0, require attribution on
    * cc-by*) reads only the tag column. One scan, one tiny keyed
    * aggregate at any scale; the filter itself is the `allowed = 1`
    * predicate pushed into the next stage's scan.
    */
  def licenseFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val lic = expr(
      """CASE CAST(doc_id % 10 AS INT)
        |  WHEN 0 THEN 'cc-by' WHEN 1 THEN 'cc-by' WHEN 2 THEN 'cc-by'
        |  WHEN 3 THEN 'cc-by-sa' WHEN 4 THEN 'cc-by-sa' WHEN 5 THEN 'cc0'
        |  WHEN 6 THEN 'cc-by-nc' WHEN 7 THEN 'cc-by-nc'
        |  WHEN 8 THEN 'proprietary' ELSE 'unknown' END""".stripMargin)
    val d = Tables.documents(spark, sfDir)
      .select(lic.as("license"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val total = d.agg(sum(col("n_tok")).as("tt"))
    d.groupBy(col("license"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
      .crossJoin(broadcast(total))
      .select(col("license"), col("n_docs"), col("tokens"),
        expr("CAST(tokens * 10000 div tt AS BIGINT)").as("share_bp"),
        when(col("license").isin("cc-by", "cc-by-sa", "cc0"), 1).otherwise(0)
          .as("allowed"),
        when(col("license").isin("cc-by", "cc-by-sa"), 1).otherwise(0)
          .as("needs_attribution"))
      .orderBy(col("license"))
  }

  /** M87 text_gopher_gates — the Gopher-style RULE battery (pass/fail
    * gates, the complement of text_quality_score's continuous score):
    * word-count bounds, mean-word-length bounds (compared in the EXACT
    * integer domain via cross-multiplication — never a float mean),
    * minimum stopword hits, and a within-doc duplicate-segment ceiling.
    * Emitted as the per-rule violation report plus the documents-passing-
    * all row — the attrition table a curation run publishes before
    * anything is dropped. One scan, one conditional aggregate (the N2
    * shape); rules with zero violations are a normal, honest state.
    */
  def gopherGates(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and")
    val d = Tables.documents(spark, sfDir)
      .withColumn("t", split(col("text"), " "))
      .withColumn("n_tok", size(col("t")).cast("long"))
      .withColumn("n_stop", size(expr(
        s"filter(t, x -> x IN (${stop.map(s => s"'$s'").mkString(",")}))")).cast("long"))
      .withColumn("segs", expr("filter(split(text, '\\\\. '), s -> length(s) > 0)"))
      .withColumn("n_seg", size(col("segs")).cast("long"))
      .withColumn("n_seg_d", size(array_distinct(col("segs"))).cast("long"))
      // letters = chars minus the single-space separators; both bounds
      // cross-multiplied so the mean-length gate is exact integer math
      .withColumn("n_let", col("n_chars") - (col("n_tok") - 1))
      .select(
        (col("n_tok") < 50 || col("n_tok") > 100000).cast("long").as("v_wc"),
        (col("n_let") < lit(3L) * col("n_tok") ||
          col("n_let") > lit(10L) * col("n_tok")).cast("long").as("v_awl"),
        (col("n_stop") < 2).cast("long").as("v_stop"),
        // dup-segment gate: distinct/total >= 0.7 ⇔ 10·distinct >= 7·total
        (lit(10L) * col("n_seg_d") < lit(7L) * col("n_seg")).cast("long").as("v_dupseg"))
    val agg = d.agg(count(lit(1)).as("n_docs"),
      sum(col("v_wc")).as("v_wc"), sum(col("v_awl")).as("v_awl"),
      sum(col("v_stop")).as("v_stop"), sum(col("v_dupseg")).as("v_dupseg"),
      sum(when(col("v_wc") + col("v_awl") + col("v_stop") + col("v_dupseg") === 0, 0L)
        .otherwise(1L)).as("v_any"))
    agg.select(col("n_docs"), expr(
      """stack(5,
        |  'word_count_50_100k', v_wc,
        |  'mean_word_len_3_10', v_awl,
        |  'min_2_stopwords',    v_stop,
        |  'dup_segment_30pct',  v_dupseg,
        |  'ANY_RULE',           v_any) AS (rule, n_violations)""".stripMargin))
      .select(col("rule"), col("n_violations"), col("n_docs"),
        (round(col("n_violations").cast("double") / col("n_docs"), 6) + lit(0.0))
          .as("viol_frac"))
      .orderBy(col("rule"))
  }

  /** M86 text_vocab_chao1 — vocabulary-richness estimation: Chao1's
    * lower-bound estimate of the TRUE vocabulary size from the observed
    * distinct count and the singleton/doubleton frequencies
    * (D + f1²/(2·f2)), plus Good-Turing sample coverage (1 − f1/N) — the
    * pair of numbers that says whether a corpus crawl has saturated its
    * vocabulary or is still discovering new words at the margin. All
    * inputs are exact integer counts from two keyed aggregates; the two
    * estimates are single divisions rounded 6 dp.
    */
  def vocabChao1(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab_d"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("n_tokens"), col("vocab_d"), col("f1"), col("f2"),
        (round(when(col("f2") > 0,
          col("vocab_d") + (col("f1") * col("f1")).cast("double") / (lit(2L) * col("f2")))
          .otherwise(col("vocab_d") +
            (col("f1") * (col("f1") - 1)).cast("double") / 2.0), 6) + lit(0.0))
          .as("chao1"),
        (round(lit(1.0) - col("f1").cast("double") / col("n_tokens"), 6) + lit(0.0))
          .as("coverage"))

  /** M80 pipeline_shard_manifest — token-balanced output sharding: assign
    * documents (in doc_id order) to a FIXED number of shards (16) by
    * proportional splitting of the global token tape — shard =
    * cum_before·16 div total — and emit the shard manifest (doc count,
    * token mass, id range, share in basis points). The writer-side twin
    * of pipeline_pack_sequences: packing fills fixed-size windows,
    * sharding splits a fixed shard COUNT so downstream training readers
    * get near-equal token work. All-integer assignment (LONG cumsum ×
    * 16, floor division) — reproducible on any engine or partitioning.
    *
    * 100 TB: the prefix sum is GlobalRank's two-pass range-partitioned
    * form; the total is a 1-row broadcast; assignment is per-row
    * arithmetic and the manifest one keyed aggregate. No single-partition
    * window anywhere.
    */
  def shardManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tokens"))
    val cum = GlobalRank.withGlobalRunningSum(docs, 16, col("tokens"), col("doc_id"))
    val total = docs.agg(sum(col("tokens")).as("total_tokens"))
    cum.crossJoin(broadcast(total))
      .withColumn("shard", expr("CAST(cum_before * 16 div total_tokens AS BIGINT)"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("shard_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"),
        max(col("total_tokens")).as("tt"))
      .select(col("shard"), col("n_docs"), col("shard_tokens"),
        col("first_doc"), col("last_doc"),
        expr("CAST(shard_tokens * 10000 div tt AS BIGINT)").as("share_bp"))
      .orderBy(col("shard"))
  }

  /** M95 pipeline_shuffle_stripe — the full-permutation audit that
    * completes M70's epoch-shuffle story: M70 witnesses each epoch's
    * manifest HEAD; this query materializes the ENTIRE seeded
    * permutation (md5 of 'epoch7|doc_id' — engine-identical, replayable
    * from the seed alone) through the scale-safe rank and stripes it
    * round-robin into 16 worker shards by shuffled position. The audit
    * emits, per shard, the doc count (balanced to ±1 by construction —
    * the point of shuffle-then-stripe), token mass, position range, and
    * a permutation-sensitive checksum Σ rn·doc_id in exact LONG math —
    * equal checksums across engines/runs prove the IDENTICAL
    * permutation, not just the same membership.
    *
    * 100 TB: the global order runs through [[GlobalRank]]'s two-pass
    * range-partitioned rank — never a single-partition window — and the
    * striping is a per-row mod; re-running any epoch reproduces its
    * exact batch order from (seed, doc_id) with no stored state.
    */
  def shuffleStripe(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("toks"),
        md5(concat(lit("epoch7|"), col("doc_id").cast("string"))).as("h"))
    GlobalRank.withGlobalRowNumber(d, 32, col("h"), col("doc_id"))
      .withColumn("shard", expr("CAST((rn - 1) % 16 AS BIGINT)"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        min(col("rn")).as("first_pos"),
        max(col("rn")).as("last_pos"),
        sum(col("rn") * col("doc_id")).as("perm_checksum"))
      .orderBy(col("shard"))
  }

  /** M115 pipeline_softdedup_weights — soft deduplication: instead of
    * DROPPING duplicates (M27/M33), keep every copy but weight each doc by
    * 1/|its exact-duplicate cluster| so a document's total training mass is
    * independent of how many times it was crawled (the published
    * alternative when dropping loses provenance or dup-count signal).
    * Clusters = exact text-hash groups (the M27 key); the report is the
    * per-source audit a mixing stage consumes: raw docs, distinct clusters
    * touched, effective docs (Σ weights — what the corpus "really" holds),
    * raw vs effective token mass, and the deflation ratio.
    *
    * Determinism: weights are small-denominator rationals (1/cluster_size);
    * a 6-dp-rounded double sum of such terms cannot sit at a rounding
    * midpoint (midpoints are odd/2·10⁶; the sums' reduced denominators are
    * cluster-size lcms ≪ that), so engine fold order cannot flip the
    * rounding. Scale: one text-hash agg (map-side combined), the size
    * joined back on the hash key, one source agg — three keyed shuffles,
    * nothing pairwise, nothing global.
    */
  def softdedupWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        md5(col("text")).as("h"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
    val cl = d.groupBy(col("h")).agg(count(lit(1)).as("csize"))
    d.join(cl, Seq("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_clusters"),
        round(sum(lit(1.0) / col("csize")), 6).as("effective_docs"),
        sum(col("tokens")).as("tokens_raw"),
        round(sum(col("tokens").cast("double") / col("csize")), 6)
          .as("tokens_effective"))
      .select(col("source"), col("n_docs"), col("n_clusters"),
        col("effective_docs"), col("tokens_raw"), col("tokens_effective"),
        (round(col("tokens_effective") / col("tokens_raw"), 6) + lit(0.0))
          .as("retention"))
      .orderBy(col("source"))
  }

  /** M121 pipeline_dedup_funnel — the dedup IMPACT report: the corpus run
    * through three escalating doc-level dedup signals in pipeline order —
    * exact text hash (keep-first), majority-duplicated sentences (> 50%
    * of a doc's segments already owned by earlier text, the M68 protocol
    * at doc granularity, integer 2·kept < total comparison), shared
    * 50-char verbatim windows (the M113 protocol) — attributing each
    * removed doc to the FIRST stage that catches it. Per stage:
    * docs flagged by the signal at all, docs newly removed, token mass
    * removed, cumulative docs/tokens surviving, running retention. This
    * is the artifact a curation review actually reads: not whether dedup
    * fires, but how much each escalation buys on top of the previous.
    *
    * Scale: the three signals are the existing linear corpus passes
    * (text-hash agg, segment-fingerprint window, window-hash agg); the
    * funnel itself is one whole-relation aggregate + constant-width
    * unpivot. All counts exact integers; retention is one rounded
    * division per stage.
    */
  def dedupFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
    val ex = d.select(col("doc_id"), md5(col("text")).as("h"))
    val exOwn = ex.groupBy(col("h")).agg(min(col("doc_id")).as("owner"))
    val f1 = ex.join(exOwn, Seq("h"))
      .select(col("doc_id"), (col("owner") < col("doc_id")).as("flag1"))
    val segs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(split(col("text"), "\\. ")).as(Seq("pos", "seg")))
      .where(length(col("seg")) > 0)
      .withColumn("fp", md5(col("seg")))
    val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"), col("pos"))
    val f2 = segs.withColumn("rk", row_number().over(wFp))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_kept"))
      .select(col("doc_id"), (col("n_kept") * 2 < col("n_segs")).as("flag2"))
    val win = Tables.documents(spark, sfDir)
      .where(length(col("text")) >= 50)
      .select(col("doc_id"),
        explode(expr("sequence(1, length(text) - 49, 25)")).as("o"), col("text"))
      .select(col("doc_id"), md5(expr("substring(text, CAST(o AS INT), 50)")).as("wh"))
    val winOwn = win.groupBy(col("wh")).agg(min(col("doc_id")).as("owner"))
    val f3 = win.join(winOwn, Seq("wh"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("owner") < col("doc_id"), 1L).otherwise(0L)).as("ns"))
      .select(col("doc_id"), (col("ns") > 0).as("flag3"))
    val flagged = d
      .join(f1, Seq("doc_id"))
      .join(f2, Seq("doc_id"), "left")
      .join(f3, Seq("doc_id"), "left")
      .withColumn("flag2", coalesce(col("flag2"), lit(false)))
      .withColumn("flag3", coalesce(col("flag3"), lit(false)))
      .withColumn("removed_at",
        when(col("flag1"), 1).when(col("flag2"), 2).when(col("flag3"), 3)
          .otherwise(0))
    val agg = flagged.agg(
      count(lit(1)).as("total_docs"), sum(col("tokens")).as("total_tokens"),
      sum(when(col("flag1"), 1L).otherwise(0L)).as("fl1"),
      sum(when(col("flag2"), 1L).otherwise(0L)).as("fl2"),
      sum(when(col("flag3"), 1L).otherwise(0L)).as("fl3"),
      sum(when(col("removed_at") === 1, 1L).otherwise(0L)).as("rm1"),
      sum(when(col("removed_at") === 2, 1L).otherwise(0L)).as("rm2"),
      sum(when(col("removed_at") === 3, 1L).otherwise(0L)).as("rm3"),
      sum(when(col("removed_at") === 1, col("tokens")).otherwise(0L)).as("tk1"),
      sum(when(col("removed_at") === 2, col("tokens")).otherwise(0L)).as("tk2"),
      sum(when(col("removed_at") === 3, col("tokens")).otherwise(0L)).as("tk3"))
    agg.select(expr(
      """stack(3,
        |  'exact',     fl1, rm1, tk1, total_docs - rm1,             total_tokens - tk1,
        |  'paragraph', fl2, rm2, tk2, total_docs - rm1 - rm2,       total_tokens - tk1 - tk2,
        |  'substring', fl3, rm3, tk3, total_docs - rm1 - rm2 - rm3, total_tokens - tk1 - tk2 - tk3)
        |AS (stage, n_flagged, n_removed, tokens_removed, docs_kept, tokens_kept)"""
        .stripMargin), col("total_tokens"))
      .select(col("stage"), col("n_flagged"), col("n_removed"),
        col("tokens_removed"), col("docs_kept"), col("tokens_kept"),
        (round(col("tokens_kept").cast("double") / col("total_tokens"), 6)
          + lit(0.0)).as("retention"))
      .orderBy(col("stage"))
  }

  /** M119 text_bpe_merge_round — one full BPE TRAINING STEP at corpus
    * scale: find the most frequent adjacent character pair (the M96
    * census), APPLY that merge to every word with exact leftmost-first
    * greedy semantics, and emit the post-merge pair census — the inner
    * loop of byte-pair-encoding tokenizer training, distributed.
    *
    * The hard part is overlap: in "aaaa" the merge (a,a) must produce
    * (aa)(aa), not three overlapping candidates. Leftmost-first is a
    * SEQUENTIAL rule, but it factors into set-based arithmetic: merge
    * candidates at adjacent positions only occur when the pair is a
    * doubled character, so candidate runs are gaps-and-islands over
    * flagged positions, and the winners are exactly the EVEN OFFSETS
    * from each island's start (position parity — the published trick
    * for parallel greedy pairing). Three windows, all over the same
    * (doc, word) keyed shuffle; no recursion, no per-row loops.
    *
    * Output: the top-10 post-merge pairs as (left, right) token tuples
    * with counts, plus the applied merge and its corpus application
    * count as constant audit columns. 100 TB: linear in corpus chars —
    * one position explode, keyed windows, two keyed aggregates.
    *
    * Round 15 (VERDICT r14 #2): the position/window machinery runs only
    * on words that CONTAIN the winning pair. A word without the pair is
    * untouched by the merge — its post-merge token stream is exactly its
    * characters, so its contribution to the post-merge census is the
    * plain adjacent-char census, computed flat (one explode + the shared
    * keyed agg, no windows, no position join). Most of the corpus is
    * untouched by any single merge (measured ~90% of position rows at
    * sf1), so the three-window chain now runs on ~10% of the chars —
    * row-identical by construction, the sf1 warm time moved 10.4 s →
    * ~3 s (BASELINE.md round 15).
    */
  def bpeMergeRound(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.Checkpoints.CutOps
    import org.apache.spark.sql.expressions.Window
    // cut: the word relation feeds THREE arms (pair census, untouched-word
    // flat census, hit-word machinery) — materialize the split/posexplode
    // once instead of re-reading and re-splitting documents per arm
    val words = Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("wpos", "w")))
      .where(length(col("w")) >= 2)
      .select(col("doc_id"), col("wpos"), col("w"), length(col("w")).as("len"))
      .lineageCut(true)
    // Optimization round 16: the full PRE-merge pair census is
    // materialized once (a ≤|alphabet|²-row relation) and serves three
    // readers — the winner pick, the audit columns, and the UNTOUCHED-WORD
    // arm. That third reader is the structural win: a word without the
    // winning pair contributes its plain adjacent-char census post-merge,
    // and summing that over the ~90% untouched slice equals the GLOBAL
    // census minus the touched words' census — so the old corpus-scale
    // re-explode of every untouched word (a second full pass over the
    // corpus chars) collapses to a census-sized subtraction keyed on the
    // pair string; only touched words (~10%) are exploded a second time.
    // Row-identical: counts are additive over the word partition
    // {touched, untouched}, and zero-count differences are filtered (a
    // count of rows can never be 0 in the old form).
    graft.functions.CharPairs.register(spark)
    val census = words
      .select(explode(expr("graft_char_pairs(w)")).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .lineageCut(true)
    val top = census
      .orderBy(desc("n"), asc("pair")).limit(1)
      .select(col("pair").as("mpair"), col("n").as("mpair_n"))
      .lineageCut(true)
    val withTop = words.crossJoin(broadcast(top))
    // touched words (contain the winning pair), read twice: the census
    // subtraction below and the position machinery
    val hits = withTop.where(expr("instr(w, mpair) > 0")).lineageCut(true)
    val touched = hits
      .select(explode(expr("graft_char_pairs(w)")).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("tn"))
    // untouched-arm census = global − touched, as (left, right, count)
    val missAgg = census.join(touched, Seq("pair"), "left")
      .select(expr("substring(pair, 1, 1)").as("left_tok"),
        expr("substring(pair, 2, 1)").as("right_tok"),
        (col("n") - coalesce(col("tn"), lit(0L))).as("n"))
      .where(col("n") > 0)
    val wWin = Window.partitionBy(col("doc_id"), col("wpos")).orderBy(col("p"))
    val pos = hits
      .select(col("doc_id"), col("wpos"), col("w"), col("len"), col("mpair"),
        explode(expr("sequence(1, len)")).as("p"))
      .withColumn("flag",
        col("p") < col("len") &&
          expr("substring(w, CAST(p AS INT), 2)") === col("mpair"))
    // leftmost-first winners: islands of consecutive flagged positions
    // (only doubled-char pairs produce runs), even offsets win
    val fl = pos.where(col("flag"))
      .withColumn("rnf", row_number().over(wWin))
      .withColumn("grp", col("p") - col("rnf"))
    val isl = fl.groupBy(col("doc_id"), col("wpos"), col("grp"))
      .agg(min(col("p")).as("isl_start"))
    // cut: both the merge application (left join below) and the n_applied
    // audit count read the winner set — one window/join chain, not two
    val taken = fl.join(isl, Seq("doc_id", "wpos", "grp"))
      .where((col("p") - col("isl_start")) % 2 === 0)
      .select(col("doc_id"), col("wpos"), col("p"), lit(true).as("taken"))
      .lineageCut(true)
    val merged = pos
      .join(taken, Seq("doc_id", "wpos", "p"), "left")
      .withColumn("taken", coalesce(col("taken"), lit(false)))
      .withColumn("taken_prev",
        coalesce(lag(col("taken"), 1).over(wWin), lit(false)))
      .where(!col("taken_prev")) // token starts: not consumed by a merge
      .withColumn("token",
        when(col("taken"), expr("substring(w, CAST(p AS INT), 2)"))
          .otherwise(expr("substring(w, CAST(p AS INT), 1)")))
    val nApplied = taken.agg(count(lit(1)).as("n_applied"))
    merged
      .withColumn("next_token", lead(col("token"), 1).over(wWin))
      .where(col("next_token").isNotNull)
      .select(col("token").as("left_tok"), col("next_token").as("right_tok"))
      .groupBy(col("left_tok"), col("right_tok"))
      .agg(count(lit(1)).as("n"))
      .unionAll(missAgg)
      .groupBy(col("left_tok"), col("right_tok"))
      .agg(sum(col("n")).as("n"))
      .orderBy(desc("n"), asc("left_tok"), asc("right_tok")).limit(10)
      .crossJoin(broadcast(top))
      .crossJoin(broadcast(nApplied))
      .select(col("left_tok"), col("right_tok"), col("n"),
        col("mpair").as("applied_pair"), col("n_applied"))
      .orderBy(desc("n"), asc("left_tok"), asc("right_tok"))
  }

  /** M127 text_rarity_buckets (round 15) — the CCNet-style head/middle/
    * tail corpus split, integer-exact: each document scores its mean
    * token RARITY (Σ total_tokens div token_count, integer-divided per
    * token and again per doc — the published recipe ranks by a language-
    * model perplexity; this engine deliberately avoids cross-engine
    * transcendentals on the hash path, and inverse corpus frequency is
    * the same monotone signal), then each LANGUAGE is tercile-split on
    * that score: bucket 1 = head (commonest tokens, the "cleanest" slice
    * curation keeps at full weight), 2 = middle, 3 = tail.
    *
    * The per-language tercile does NOT run a per-language data-sized
    * window: ONE global range exchange over (lang, r, doc_id)
    * ([[GlobalRank.withGlobalRowNumber]]) gives a global rank; per-
    * language offsets (min rank, count — one row per language) broadcast
    * back, and the within-language rank is rank − offset + 1 with the
    * closed-form ntile on top. 100 TB: token census + keyed join + one
    * range exchange + a ≤3·|langs|-row aggregate.
    */
  def rarityBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.Checkpoints.CutOps
    // ADVICE r15 (the perplexityProxy shared-relation fix applied here):
    // pre-aggregate the exploded tokens to (doc_id, lang, w, cnt) ONCE and
    // cut it — the census and the per-doc rollup both derive from it, so
    // the corpus is exploded once (was 2×) and the rarity join moves
    // distinct (doc, word) pairs instead of raw tokens.
    // Σ cnt·rar over pairs ≡ Σ rar over tokens — row-identical.
    val toks = Tables.documentsSpread(spark, sfDir)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("lang"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .lineageCut(true)
    val wc = toks.groupBy(col("w")).agg(sum(col("cnt")).as("c"))
    val tot = wc.agg(sum(col("c")).as("total"))
    val rar = wc.crossJoin(broadcast(tot))
      .select(col("w"), expr("total div c").as("rar"))
    val perDoc = toks.join(rar, Seq("w"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("cnt")).as("n_tokens"), sum(col("cnt") * col("rar")).as("s"))
      .select(col("doc_id"), col("lang"), expr("s div n_tokens").as("r"))
    val ranked = GlobalRank.withGlobalRowNumber(
      perDoc, 8, col("lang"), col("r"), col("doc_id"))
    val langAgg = ranked.groupBy(col("lang"))
      .agg(min(col("rn")).as("off"), count(lit(1)).as("n_lang"))
    ranked.join(broadcast(langAgg), Seq("lang"))
      .withColumn("lrn", col("rn") - col("off") + lit(1L))
      .withColumn("bucket", GlobalRank.ntileExpr(3, "lrn", "n_lang"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("r")).as("lo_rarity"), max(col("r")).as("hi_rarity"))
      .select(col("lang"), col("bucket"),
        when(col("bucket") === 1, "head").when(col("bucket") === 2, "middle")
          .otherwise("tail").as("bucket_label"),
        col("n_docs"), col("lo_rarity"), col("hi_rarity"))
      .orderBy(col("lang"), col("bucket"))
  }

  /** M116 pipeline_domain_mix_kl — domain-mix audit against a uniform
    * target: each source's token share p vs the uniform target q = 1/K,
    * the per-domain KL contribution p·ln(p/q) (Σ = KL(p‖q), the standard
    * "how far is this crawl from the mix we want" number), and the
    * importance-resampling factor min(q/p, 5) a reweighting stage would
    * apply (capped at 5× so no tail domain explodes its duplication
    * count — the published epoch-repetition guardrail).
    *
    * Determinism: shares are one double division of exact long token
    * sums; ln / division trees are identical expressions on both engines,
    * 6-dp rounded. Scale: one keyed agg to ~K rows, the grand total
    * broadcast back — the M52 shape.
    */
  def domainMixKl(spark: SparkSession, sfDir: String): DataFrame = {
    val st = Tables.documents(spark, sfDir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("tokens"))
      .groupBy(col("source")).agg(sum(col("tokens")).as("src_tokens"))
    val g = st.agg(sum(col("src_tokens")).as("total_tokens"),
      count(lit(1)).as("k"))
    st.crossJoin(broadcast(g))
      .withColumn("p", col("src_tokens").cast("double") / col("total_tokens"))
      .withColumn("q", lit(1.0) / col("k"))
      .select(col("source"), col("src_tokens"),
        (round(col("p"), 6) + lit(0.0)).as("share"),
        (round(col("p") * log(col("p") / col("q")), 6) + lit(0.0)).as("kl_term"),
        (round(least(col("q") / col("p"), lit(5.0)), 6) + lit(0.0))
          .as("resample_factor"))
      .orderBy(col("source"))
  }

  /** The DSIR feature-space size: hashed unigram buckets. 512 keeps the
    * broadcast ratio table trivially small; a production run raises it
    * (the published method uses 10k hashed n-grams) — only this constant
    * and the interpolated oracle move.
    */
  private[graft] val DsirBuckets = 512

  /** M122 pipeline_dsir_weights (round 14) — Data Selection via
    * Importance Resampling, the published hashed-n-gram recipe for
    * "select corpus docs that look like the target distribution": unigram
    * tokens hash into [[DsirBuckets]] buckets (md5 digit arithmetic — the
    * agg_theta_kmv decode, mod buckets); the TARGET distribution is the
    * English slice (lang = 'en' — the stand-in for "high-quality
    * reference corpus" on this fixture); each bucket's add-one-smoothed
    * importance RATIO p_target / p_corpus is integerized at 1e6, and a
    * document's weight is its mean per-token ratio. The paper accumulates
    * LOG ratios; this implementation deliberately accumulates the ratios
    * themselves, because the ratio is exact RATIONAL arithmetic (integer
    * products under 2^53, one correctly-rounded IEEE division —
    * bit-identical on any engine) while ln is a libm call whose last-ulp
    * JVM-vs-C differences land on fixed-point rounding boundaries
    * (measured round 14: one bucket in 512 flipped the 1e6 grid and a
    * doc's 6-dp weight with it — the M62 protocol survives only because
    * its values never hit a boundary). Per-bucket monotone in the same
    * direction as the log form; the cross-doc ranking is the mean-ratio
    * variant of the published score. Top-20 most-target-like docs
    * (weight desc, doc_id tiebreak).
    *
    * 100 TB: one corpus token pass builds the ≤buckets-row ratio table
    * (broadcast); one more pass scores docs — the wordcount shape twice,
    * no global state beyond the broadcast table.
    */
  def dsirWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val b = DsirBuckets
    val toks = Tables.documentsSpread(spark, sfDir)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", md5(col("w")))
      // explicit floor: DuckDB CAST(double AS BIGINT) ROUNDS while Spark
      // truncates — floor() is the one semantics both engines share
      .withColumn("bkt", expr(s"CAST(floor((${Aggregates.KmvUExpr}) * $b) AS BIGINT)"))
      .lineageCut(true) // the corpus pass and the target pass both read it
    val corpus = toks.groupBy(col("bkt")).agg(count(lit(1)).as("cc"))
    val target = toks.where(col("lang") === "en")
      .groupBy(col("bkt")).agg(count(lit(1)).as("ct"))
    val totals = toks.agg(count(lit(1)).as("tc"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tt"))
    val ratio = corpus.join(target, Seq("bkt"), "left")
      .crossJoin(broadcast(totals))
      // CAST(1 AS DOUBLE), not `1.0`: Spark types bare decimal literals
      // in SQL text as DECIMAL (see Aggregates.KmvUExpr) — the chain must
      // stay pure IEEE double on both engines
      .select(col("bkt"), expr(
        s"CAST(round((coalesce(ct, 0) + CAST(1 AS DOUBLE)) * (tc + $b) / ((cc + CAST(1 AS DOUBLE)) * (tt + $b)) * 1e6) AS BIGINT)")
        .as("lr_int"))
    toks.join(broadcast(ratio), Seq("bkt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr_int")).as("s"))
      // the mean is taken by INTEGER division to ppm first: s/(n·1e6)
      // lands exactly on 6-dp half-boundaries whenever s ≡ n/2 (mod n) —
      // a 1-in-n event per doc — where Spark's shortest-string HALF_UP
      // and DuckDB's binary round disagree (the Cols money rule, hit
      // live at sf0.1 round 14). s div n is exact on both engines and
      // the resulting ppm/1e6 double sits ON the 6-dp grid, so the final
      // round is the identity, never a coin flip.
      .select(col("doc_id"), col("n_tokens"),
        (round(expr("s div n_tokens").cast("double") / lit(1e6), 6)
          + lit(0.0)).as("dsir_weight"))
      // top-20 via orderBy+limit (TakeOrderedAndProject) instead of a
      // single-partition window over every weighted document
      // (optimization round 16 — same rows under the same unique order)
      .orderBy(desc("dsir_weight"), asc("doc_id")).limit(20)
      .orderBy(desc("dsir_weight"), asc("doc_id"))
  }

  /** M124 text_oov_rate (round 14) — tokenizer-health audit: the share of
    * tokens per language that fall outside the corpus's own top-1000
    * vocabulary (count desc, token tiebreak — the J9 deterministic rank).
    * High OOV for a language means the shared vocabulary underserves it —
    * the number multilingual tokenizer budgets are negotiated over.
    *
    * 100 TB: the wordcount pass, a 1000-row broadcast vocabulary, one
    * more corpus pass with a broadcast anti-lookup — no corpus-sized
    * shuffle beyond the two keyed counts.
    */
  def textOovRate(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
    // top-1000 via orderBy+limit (TakeOrderedAndProject) instead of a
    // single-partition window over the whole vocabulary (optimization
    // round 16 — same rows under the same unique total order)
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w")).limit(1000)
      .select(col("w"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("n_oov"),
        (round(col("n_oov").cast("double") / col("n_tokens"), 6) + lit(0.0))
          .as("oov_rate"))
      .orderBy(col("lang"))
  }
}
