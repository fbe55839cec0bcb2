package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality statistics, language identification,
  * document fingerprinting. All pure built-in (codegen'd) expressions —
  * no UDFs — so they stay inside WholeStageCodegen and push down through
  * Catalyst.
  */
object TextAnalysis {

  /** Whitespace token array (empty array for blank text). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count as long. */
  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  /** A BPE-ish subword count: words are split at ~4-char boundaries like
    * byte-pair merges typically land for English-ish text; cheap token
    * estimator used for budget accounting (ceil(chars/4) per word, min 1). */
  def bpeishTokenCount(text: Column): Column =
    coalesce(
      aggregate(tokens(text), lit(0L),
        (acc, w) => acc + greatest(ceil(length(w) / 4.0).cast("long"), lit(1L))),
      lit(0L))

  /** Integer quality counters (exact, oracle-friendly): chars, tokens,
    * punctuation, digits, uppercase letters. */
  def qualityStats(df: DataFrame, text: Column): DataFrame = df.select(
    col("*"),
    length(text).cast("long").as("n_chars_m"),
    tokenCount(text).as("n_tokens"),
    length(regexp_replace(text, "[^.,;:!?]", "")).cast("long").as("n_punct"),
    length(regexp_replace(text, "[^0-9]", "")).cast("long").as("n_digits"),
    length(regexp_replace(text, "[^A-Z]", "")).cast("long").as("n_upper"))

  /** Composite quality score in [0,1]: penalizes extreme punctuation /
    * digit ratios and degenerate token lengths (standard web-corpus
    * filtering heuristics, cf. C4/Gopher-style rules). */
  def qualityScore(text: Column): Column = {
    val n = greatest(length(text).cast("double"), lit(1.0))
    val punctRatio = length(regexp_replace(text, "[^.,;:!?]", "")) / n
    val digitRatio = length(regexp_replace(text, "[^0-9]", "")) / n
    val toks = tokens(text)
    val meanTokLen = when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        size(toks)).otherwise(lit(0.0))
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val tokScore = when(meanTokLen.between(3.0, 12.0), lit(1.0)).otherwise(lit(0.5))
    val punctScore = when(punctRatio < 0.1, lit(1.0)).otherwise(lit(0.5))
    val digitScore = when(digitRatio < 0.2, lit(1.0)).otherwise(lit(0.5))
    round(lenScore * 0.4 + tokScore * 0.2 + punctScore * 0.2 + digitScore * 0.2, 6)
  }

  /** Tiny per-language stopword/marker sets for the n-gram/stopword
    * language-ID heuristic. Public-knowledge word lists. */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "que", "une"),
    "es" -> Seq("el", "los", "las", "es", "en", "que", "una", "por"))

  /** Heuristic language ID: CJK script detection first, else argmax of
    * stopword hits (ties → 'en' > 'de' > 'fr' > 'es' order), 'unknown'
    * when nothing matches. Deterministic, pure expressions. */
  def langId(text: Column): Column = {
    val toks = transform(tokens(text), t => lower(t))
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val arr = array(words.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(arr, t)))
    }
    val cjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", "")) > 2
    val best = scores.map { case (lang, s) =>
      struct(s.as("s"), lit(priority(lang)).as("p"), lit(lang).as("lang"))
    }
    val top = greatest(best: _*)
    when(cjk, lit("zh"))
      .when(top.getField("s") > 0, top.getField("lang"))
      .otherwise(lit("unknown"))
  }

  /** Tie-break priority: higher wins at equal score (en > de > fr > es). */
  private def priority(lang: String): Int = lang match {
    case "en" => 4; case "de" => 3; case "fr" => 2; case _ => 1
  }

  /** TF-IDF top-k terms per document — the per-doc keyword extractor a
    * curation pipeline uses for topic balancing / near-topic dedup.
    * tf = in-doc term count, idf = ln(N / df) with N = |docs| and df =
    * docs containing the term; score rounded to 6 dp and ORDERED BY THE
    * ROUNDED VALUE (ties → token asc) so a cross-engine oracle ranks
    * identically even when rounding collapses close scores.
    *
    * Scale: one explode + two hash aggs (Zipf head absorbed by map-side
    * partial aggregation) + a tf⋈df equi-join on token (df is
    * vocabulary-sized — broadcastable under the session threshold at
    * real corpus sizes it isn't, and the shuffle join partitions by
    * token) + a per-doc window (reducer parallelism = #docs). */
  def tfIdfTopK(df: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    val n = df.count()
    val tf = df.select(id.as("doc_id"), explode(tokens(text)).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "token")
      .select(col("doc_id"), col("token"),
        round(col("tf") * log(lit(n.toDouble) / col("df")), 6).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("token"), col("tfidf"))
  }

  /** Per-document unigram cross-entropy vs the corpus distribution:
    * H(d) = −Σ_t (tf_d(t)/len_d) · ln(cf(t)/total) — the
    * distribution-level quality signal next to the counter-based
    * [[qualityScore]] (garbled/boilerplate/outlier docs sit far from
    * the corpus unigram model; rare-token-heavy docs score HIGH).
    * 6 dp; docs with zero tokens produce no row (no defined entropy).
    *
    * Scale: one token explode feeding two hash aggs (per-(doc,term) tf
    * and corpus term counts — Zipf head absorbed map-side), one
    * tf⋈corpus equi-join on token, one final per-doc agg. Float note:
    * the Σ runs in different orders on different engines (~1e-15
    * relative) — harmless under the 6 dp round, same contract as
    * assortativity/adamic-adar. */
  def unigramCrossEntropy(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tk = df.select(id.as("doc_id"), explode(tokens(text)).as("token"))
    val total = tk.count()
    val corpus = tk.groupBy(col("token"))
      .agg(count(lit(1)).as("cf"))
    val tf = tk.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    tf.join(corpus, "token")
      .groupBy(col("doc_id"))
      .agg(round(-sum(col("tf") * log(col("cf") / lit(total.toDouble))) /
        sum(col("tf")), 6).as("xent"))
  }

  /** Corpus vocabulary: top-k tokens by frequency (ties → token asc) —
    * the skewed-aggregation showcase of the pipeline surface. Token
    * frequency is Zipf by nature, but explode + hash agg needs no
    * salting: map-side partial aggregation collapses the hottest token
    * to one row per input partition before the shuffle; `orderBy+limit`
    * plans as TakeOrdered (per-partition top-k merged on the driver),
    * never a global sort shuffle. */
  def vocabTopK(df: DataFrame, text: Column, k: Int): DataFrame =
    df.select(explode(tokens(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)

  /** 64-bit document fingerprint: an order-sensitive rolling mix of token
    * hashes, pure bitwise ops (no ANSI overflow): acc = rot(acc) ^ h(tok).
    * Equal normalized token streams ⇒ equal fingerprints. */
  def fingerprint(text: Column): Column =
    coalesce(
      aggregate(tokens(text), lit(0L), (acc, t) =>
        shiftleft(acc, 5).bitwiseXOR(shiftrightunsigned(acc, 59))
          .bitwiseXOR(xxhash64(t))),
      lit(0L))

  /** Per-document repetition signals — the Gopher-family quality
    * filters (Rae et al. '21, §A1: "fraction of characters in the most
    * common n-gram", "fraction of unique words"), kept as EXACT integer
    * numerators/denominators so the gate is hash-exact and the filter
    * threshold is one division downstream: token count, distinct-token
    * count, the most frequent token's count, bigram count, and the most
    * frequent bigram's count.
    *
    * Scale: two explode → hash-agg pipelines keyed by (doc, gram) then
    * doc, both map-side combined; per-key cardinality is bounded by a
    * single document's length, so there is no cross-document hot key by
    * construction. */
  def repetitionStats(df: DataFrame, id: Column, text: Column): DataFrame = {
    val base = df.select(id.as("doc_id"), tokens(text).as("t"))
    val bigrams = when(size(col("t")) >= 2,
      zip_with(slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    val uni = base.select(col("doc_id"), explode(col("t")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_token_n"))
    val bi = base.select(col("doc_id"), explode(bigrams).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bigram_n"))
    base.select(col("doc_id"))
      .join(uni, Seq("doc_id"), "left").join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("top_token_n"), lit(0L)).as("top_token_n"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"))
  }

  /** Per-document cross-entropy under an add-α smoothed corpus BIGRAM
    * language model — the sequence-aware upgrade of
    * [[unigramCrossEntropy]] (a doc of common tokens in an improbable
    * ORDER scores high here but normal there — word-salad detection):
    *
    *   xent = −Σ_bigrams ln P(w2|w1) / n_bigrams,
    *   P(w2|w1) = (c(w1,w2) + α) / (c(w1·) + α·V)
    *
    * with c(w1·) = w1's corpus count as a bigram left context and V =
    * the corpus distinct-unigram count (the add-α event space). Docs
    * with < 2 tokens emit no row (no bigram evidence to score).
    *
    * Scale: two map-side-combined count tables (corpus bigrams; their
    * per-context rollup), two equi-joins keyed by the bigram/context,
    * one per-doc agg. Per-key cardinality of the doc-level groupBy is
    * bounded by one document's length; the corpus tables are Zipf but
    * partial aggregation collapses hot bigrams per input partition
    * before the shuffle (the vocabTopK argument). V is one scalar agg
    * action — per RUN, not per iteration. */
  def bigramCrossEntropy(df: DataFrame, id: Column, text: Column,
                         alpha: Double = 0.5): DataFrame =
    org.apache.spark.sql.GraftLineage.scopedBlocks(df.sparkSession) {
      val base = df.select(id.as("doc_id"), tokens(text).as("t"))
      // same zip_with pairing as repetitionStats (both arrays evaluate
      // once — arguments, not per-element lambdas)
      val pairs = when(size(col("t")) >= 2,
        zip_with(slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
      // barrier: the tokenize+zip_with+explode chain feeds THREE
      // aggregation consumers (corpus bigrams, per-doc bigrams, and the
      // context rollup via cBg) — one materialized pass instead of three
      // full evaluations (the contamination/minhash shared-base rule)
      val bg = org.apache.spark.sql.GraftLineage.barrier(
        base.select(col("doc_id"), explode(pairs).as("p"))
          .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2")))
      val cBg = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cbg"))
      val cCtx = cBg.groupBy(col("w1")).agg(sum(col("cbg")).as("cctx"))
      // V needs the UNIGRAM vocabulary (a single-token doc's token never
      // reaches the bigram table), so this is the one remaining pass
      // over the raw text
      val v = base.select(explode(col("t")).as("w"))
        .agg(countDistinct(col("w"))).collect()(0).getLong(0)
      val docBg = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("n"))
      org.apache.spark.sql.GraftLineage.barrier(
        docBg.join(cBg, Seq("w1", "w2")).join(cCtx, Seq("w1"))
          .groupBy(col("doc_id"))
          .agg(round(-sum(col("n") *
              log((col("cbg") + lit(alpha)) / (col("cctx") + lit(alpha * v)))) /
            sum(col("n")), 6).as("xent_bigram")))
    }
}
