package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines, all as
  * pure column expressions (whole-stage codegen, no UDFs): token counting,
  * quality scoring, n-gram language-ID heuristics, document fingerprinting.
  *
  * Each formula is deliberately expressible in portable SQL so results can be
  * cross-checked against an independent engine (the DuckDB oracle in
  * SparkEntry.oracleSql).
  */
object TextOps {

  /** Whitespace token count; empty/blank text → 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Subword-style token count: the GPT-2/tiktoken pre-tokenizer convention
    * (contraction suffixes, letter runs, digit runs, punctuation runs, each
    * with an optional leading space) — the unit LLM data budgets are
    * denominated in, vs [[tokenCount]]'s whitespace words. A real BPE merges
    * within these pre-token boundaries, so this counts pre-tokens: an upper
    * bound on words, lower bound on BPE tokens, and the standard cheap
    * "token count" a pipeline filters on. Pure regexp expression
    * (codegen'd; Java and DuckDB regex agree on this pattern). */
  def subwordTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[0-9]+| ?[^\\s\\p{L}0-9]+"), lit(0)))

  /** Normalized text used for fingerprinting/dedup: lower-cased, whitespace
    * collapsed, trimmed. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Deterministic document fingerprint: md5 of the normalized text
    * (hex string — portable across engines). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** 64-bit fingerprint for joins/sketches (xxhash64 of normalized text). */
  def fingerprint64(text: Column): Column = xxhash64(normalize(text))

  /** Punctuation character ratio, 6-dp rounded; 0 for empty text. */
  def punctRatio(text: Column): Column =
    graft.core.Num.roundTo(when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^.!?,;:]", "")).cast("double") /
                 length(text).cast("double")), 6)

  private val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")

  /** Number of English stopword occurrences (word-boundary matches). */
  def stopwordCount(text: Column): Column =
    Stopwords.map(w => size(regexp_extract_all(lower(text), lit("\\b" + w + "\\b"), lit(0))))
      .reduce(_ + _)

  /** Stopword density per token, 6-dp rounded. */
  def stopwordRatio(text: Column): Column =
    graft.core.Num.roundTo(when(tokenCount(text) === 0, lit(0.0))
      .otherwise(stopwordCount(text).cast("double") / tokenCount(text).cast("double")), 6)

  /** Composite quality score in [0,1]: mean of (a) length score — tokens/256
    * capped at 1, (b) inverse punctuation-excess score, (c) stopword presence
    * score — stopwordRatio/0.4 capped at 1. A cheap, deterministic stand-in
    * for the usual fasttext-style quality models; monotone in the features a
    * web-text filter actually uses. */
  def qualityScore(text: Column): Column = {
    val lengthScore = least(tokenCount(text).cast("double") / lit(256.0), lit(1.0))
    val punctScore  = greatest(lit(0.0), lit(1.0) - punctRatio(text) * lit(5.0))
    val stopScore   = least(stopwordRatio(text) / lit(0.4), lit(1.0))
    graft.core.Num.roundTo((lengthScore + punctScore + stopScore) / lit(3.0), 6)
  }

  /** Fraction of whitespace tokens that repeat an earlier token — the
    * Gopher-style "duplicate word fraction" repetition filter (Rae et al.
    * 2021 §A1.1): 1 - distinct/total over normalized tokens; 0 for blank
    * text. Pure array expression, no shuffle. */
  def duplicateTokenFraction(text: Column): Column = {
    val toks = split(normalize(text), " ")
    graft.core.Num.roundTo(
      when(length(trim(text)) === 0, lit(0.0))
        .otherwise(lit(1.0) -
          size(array_distinct(toks)).cast("double") / size(toks).cast("double")), 6)
  }

  /** Per-document share of n-gram occurrences taken by the single most
    * frequent n-gram — the Gopher "top n-gram fraction" repetition filter.
    * Distributed shape: one explode plus two aggregations KEYED BY DOC
    * (map-side combinable, no cross-document shuffle growth), so at 100 TB
    * the shuffle carries (doc, gram) partial counts bounded by document
    * length, never corpus-wide state. Returns (id, top, total, fraction). */
  def topNgramFraction(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
      explode(Dedup.shingles(col(textCol), n)).as("gram"))
    grams.groupBy("id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max("c").as("top"), sum("c").as("total"))
      .select(col("id"), col("top"), col("total"),
        graft.core.Num.roundTo(
          col("top").cast("double") / col("total").cast("double"), 6).as("fraction"))
  }

  /** Benchmark decontamination: per-document overlap of exact word n-grams
    * with a benchmark corpus (the GPT-3/PaLM 13-gram convention — docs
    * sharing enough n-grams with an eval set are dropped from training
    * data). Scale shape: one distinct n-gram hash per (doc, gram) plus ONE
    * equi-join against the distinct benchmark gram set — the benchmark side
    * is the small one (eval sets are tiny vs a 100-TB corpus) so Spark
    * broadcasts it; the corpus side is never self-joined. Docs shorter than
    * `n` words fall back to their whole normalized text as a single gram
    * (Dedup.shingles), so short eval strings still match verbatim copies.
    * Returns (id, contaminated_ngrams, total_ngrams, contamination). */
  def contamination(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String,
                    benchmark: org.apache.spark.sql.DataFrame,
                    benchTextCol: String, n: Int = 13): org.apache.spark.sql.DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
        explode(Dedup.shingles(col(textCol), n)).as("s"))
      .distinct()
      .select(col("id"), xxhash64(col("s")).as("h"))
    val bench = benchmark
      .select(explode(Dedup.shingles(col(benchTextCol), n)).as("s"))
      .select(xxhash64(col("s")).as("h"))
      .distinct()
    val totals = grams.groupBy("id").agg(count(lit(1)).as("total_ngrams"))
    val hits = grams.join(bench, "h")
      .groupBy("id").agg(count(lit(1)).as("contaminated_ngrams"))
    totals.join(hits, Seq("id"), "left")
      .na.fill(0L, Seq("contaminated_ngrams"))
      .select(col("id"), col("contaminated_ngrams"), col("total_ngrams"),
        graft.core.Num.roundTo(col("contaminated_ngrams").cast("double") /
          col("total_ngrams").cast("double"), 6).as("contamination"))
  }

  /** C4-style heuristic line cleaning (Raffel et al. 2020 §2.2): audit each
    * line of `linesCol: array<string>` — kept iff it ends in terminal
    * punctuation, has at least `minWords` words, and contains no
    * blocklisted substring; any blocklisted line also marks the whole
    * document for removal (C4 drops pages containing "lorem ipsum" / curly
    * braces outright). Pure per-line expressions after one posexplode — no
    * shuffle at all until a caller aggregates. Returns
    * (id, line_idx, line, kept, reason) with reason precedence
    * blocklist > no_terminal_punct > too_short > kept. */
  def c4LineAudit(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  linesCol: String, minWords: Int = 5,
                  blocklist: Seq[String] = Seq("lorem ipsum", "{", "javascript"))
      : org.apache.spark.sql.DataFrame = {
    val e = docs.select(col(idCol).as("id"),
      posexplode(col(linesCol)).as(Seq("line_idx", "line")))
    val words    = size(split(trim(col("line")), "\\s+"))
    val terminal = col("line").rlike("[.!?\"]\\s*$")
    val blocked  = blocklist.map(b => col("line").contains(b)).reduce(_ || _)
    e.select(col("id"), col("line_idx"), col("line"),
      (terminal && words >= minWords && !blocked).as("kept"),
      when(blocked, "blocklist")
        .when(!terminal, "no_terminal_punct")
        .when(words < minWords, "too_short")
        .otherwise("kept").as("reason"))
  }

  /** [[c4LineAudit]] applied: kept lines reassembled in order, documents
    * with any blocklisted line dropped entirely. Returns (id, lines). */
  def c4Clean(docs: org.apache.spark.sql.DataFrame, idCol: String,
              linesCol: String, minWords: Int = 5,
              blocklist: Seq[String] = Seq("lorem ipsum", "{", "javascript"))
      : org.apache.spark.sql.DataFrame = {
    val audit = c4LineAudit(docs, idCol, linesCol, minWords, blocklist)
    val docDrop = audit.groupBy("id")
      .agg(max(when(col("reason") === "blocklist", 1).otherwise(0)).as("__blocked"))
    audit.join(docDrop, "id")
      .filter(col("__blocked") === 0 && col("kept"))
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("line_idx"), col("line")))).as("ls"))
      .select(col("id"), transform(col("ls"), e => e.getField("line")).as("lines"))
  }

  /** CCNet-style corpus language-model quality scoring (Wenzek et al. 2020
    * score docs with a KenLM n-gram model and bucket by perplexity): here
    * the n-gram model is trained ON the corpus itself, distributed, as an
    * add-k-smoothed bigram LM, and every document is scored by mean
    * per-bigram log-probability and perplexity.
    *
    * Scale shape (100 TB): the corpus tokenizes twice — once into the model
    * aggregations (bigram counts, then history counts and the vocabulary
    * size as rollups of that already-aggregated table), once into the
    * scoring stream; scoring is two hash equi-joins of the bigram stream
    * against the model tables keyed by (w1,w2) and (w1). History keys are
    * Zipf-skewed ("the" dominates) — the join is AQE-skew-splittable
    * because the model side is one row per key; nothing is ever broadcast
    * or collected except the scalar vocabulary size.
    *
    * Returns (id, bigrams, logprob_per_bigram, perplexity) — the mean is
    * per BIGRAM (bigrams = tokens - 1), named accordingly; documents with
    * fewer than two tokens are excluded (no bigram evidence), and the
    * smoothing vocabulary counts the tokens of the scoreable documents. */
  def bigramLmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Double = 0.1): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("id"), split(normalize(col(textCol)), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val bi = toks.select(col("id"), explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("g"))
      .select(col("id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
    val biCounts   = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val histCounts = biCounts.groupBy("w1").agg(sum("cb").as("ch"))
    // every token of a scoreable doc occurs as some bigram's w1 or w2, so
    // the vocabulary size comes off the already-aggregated model table —
    // no extra corpus-wide tokenize pass
    val vocab = biCounts.select(col("w1").as("tk"))
      .union(biCounts.select(col("w2"))).distinct().count()
    val lp = bi.join(biCounts, Seq("w1", "w2")).join(histCounts, Seq("w1"))
      .select(col("id"),
        log((col("cb") + lit(k)) / (col("ch") + lit(k * vocab))).as("lp"))
    lp.groupBy("id").agg(count(lit(1)).as("bigrams"), sum("lp").as("slp"))
      .select(col("id"), col("bigrams"),
        graft.core.Num.roundTo(col("slp") / col("bigrams"), 6).as("logprob_per_bigram"),
        graft.core.Num.roundTo(exp(-col("slp") / col("bigrams")), 4).as("perplexity"))
  }

  /** Hashed bag-of-n-grams features — the fastText trick (Joulin et al.
    * 2016): word unigrams + bigrams hashed into `dims` buckets, counted,
    * L1-normalized, as a dense `array<double>` column ready for
    * [[graft.ml.LogisticRegression]]. The classifier webtext pipelines
    * actually deploy for language/quality filtering is exactly this shape:
    * linear model over hashed n-grams.
    *
    * Scale shape: one explode into (doc, bucket) rows, one map-side-
    * combinable count aggregation keyed BY DOC (shuffle bounded by
    * docs × distinct buckets per doc, never corpus vocabulary), then a
    * per-row map→dense-array expression. No UDFs, no pivot, no
    * corpus-wide state. Returns (id, features). */
  def hashedNgramFeatures(docs: org.apache.spark.sql.DataFrame, idCol: String,
                          textCol: String, dims: Int = 64,
                          bigrams: Boolean = true): org.apache.spark.sql.DataFrame = {
    // split on an empty/whitespace-only doc yields [""] — filter it so empty
    // docs produce NO feature row (no n-gram evidence) instead of a phantom
    // empty-string unigram with L1 weight 1.0 entering classifier training
    val toks = filter(split(normalize(col(textCol)), " "), t => t =!= "")
    val unis = transform(toks, t => pmod(xxhash64(lit(1), t), lit(dims)))
    val bis  = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => pmod(xxhash64(lit(2), a, b), lit(dims)))
    val grams = if (bigrams) concat(unis, bis) else unis
    docs.select(col(idCol).as("id"), explode(grams).as("d"))
      .groupBy("id", "d").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        map_from_entries(collect_list(struct(col("d"), col("c")))).as("m"),
        sum("c").as("total"))
      .select(col("id"), transform(sequence(lit(0), lit(dims - 1)),
        i => coalesce(element_at(col("m"), i), lit(0L)).cast("double") /
          col("total").cast("double")).as("features"))
  }

  final case class TextClassifierResult(
    model: graft.ml.LogisticRegression.LrModel,
    trainRows: Long, testRows: Long, correct: Long) {
    def accuracy: Double = if (testRows == 0) 0.0 else correct.toDouble / testRows
  }

  /** Train a fastText-style binary text classifier (hashed n-gram features
    * + distributed logistic regression) on a deterministic md5 holdout
    * split and score it on the held-out rows. `labelCol` must be 0/1.
    * The standard use: language-ID or quality ("wikipedia-like") filtering
    * at corpus scale — training is one codegen'd aggregation per epoch over
    * rows that never leave their partitions (LogisticRegression's contract),
    * scoring one scan. */
  def trainTextClassifier(docs: org.apache.spark.sql.DataFrame, idCol: String,
                          textCol: String, labelCol: String, dims: Int = 64,
                          bigrams: Boolean = true,
                          holdout: Double = 0.2, seed: Long = 17L,
                          // L1-normalized n-gram shares are ~1/doc-length —
                          // tiny inputs need a large step for the weights to
                          // reach decision scale in bounded iterations (the
                          // loss is convex; the Hessian is bounded by the
                          // same small feature scale, so this is stable)
                          cfg: graft.ml.LogisticRegression.LrConfig =
                            graft.ml.LogisticRegression.LrConfig(
                              maxIterations = 500, learningRate = 25.0))
      : TextClassifierResult = {
    val feats = hashedNgramFeatures(docs, idCol, textCol, dims, bigrams)
      .join(docs.select(col(idCol).as("id"), col(labelCol).cast("double").as("y")), "id")
    // deterministic split: same md5 draw as Sampling.hashSample
    val inTest = substring(md5(concat_ws(":", col("id"), lit(seed))), 1, 4) <
      f"${(holdout * 65536).toInt}%04x"
    val train = feats.filter(!inTest).cache()
    val test  = feats.filter(inTest).cache()
    try {
      val model = graft.ml.LogisticRegression.train(train, "features", "y", dims, cfg)
      val scored = test.select(col("y"),
        (graft.ml.LogisticRegression.predictProb(col("features"), model) >= 0.5)
          .cast("double").as("yhat"))
      val agg = scored.agg(count(lit(1)).as("n"),
        sum(when(col("y") === col("yhat"), 1L).otherwise(0L)).as("ok")).first()
      TextClassifierResult(model, train.count(), agg.getLong(0), agg.getLong(1))
    } finally { train.unpersist(); test.unpersist() }
  }

  /** Heuristic language ID: 'en' when ASCII-alpha dominated and stopword
    * density clears a threshold; 'non_latin' when most chars are outside
    * ASCII; otherwise 'latin_other'. Deterministic n-gram/stopword heuristic
    * — a real model would plug in behind the same column contract. */
  def langIdHeuristic(text: Column): Column = {
    val total    = length(text).cast("double")
    val asciiAlpha = length(regexp_replace(lower(text), "[^a-z ]", "")).cast("double")
    val asciiShare = when(total === 0, lit(0.0)).otherwise(asciiAlpha / total)
    when(total === 0, lit("unknown"))
      .when(asciiShare < 0.5, lit("non_latin"))
      .when(stopwordRatio(text) >= 0.08, lit("en"))
      .otherwise(lit("latin_other"))
  }
}
