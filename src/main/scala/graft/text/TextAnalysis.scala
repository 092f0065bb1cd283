package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (charter
  * extension beyond the reference surface — the reference has no string
  * functions at all, SURVEY §2.4).
  *
  * Everything here is a [[Column]] composed from built-in SQL functions,
  * so the operators are narrow (per-row, no shuffle), partition-parallel,
  * and expressible identically in the DuckDB oracle. At 100 TB each of
  * these is a single pass over the text column with no wide dependency.
  */
object TextAnalysis {

  /** Canonical text normalization: trim, collapse runs of whitespace,
    * lowercase. The shared preamble for dedup hashing and tokenization. */
  def normalizeText(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column =
    split(normalizeText(c), " ")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    size(tokens(c)).cast("long")

  /** BPE-ish subword count: word characters count ~1 token per 4 chars
    * (ceil), every non-word non-space symbol counts as its own token.
    * A deterministic, library-free approximation of byte-pair tokenizer
    * budgets, computed from two length probes. */
  def approxBpeTokenCount(c: Column): Column = {
    val n = normalizeText(c)
    val wordChars = length(regexp_replace(n, "[^\\p{L}\\p{N}]", ""))
    val symbols = length(regexp_replace(n, "[\\p{L}\\p{N} ]", ""))
    (ceil(wordChars.cast("double") / 4.0) + symbols).cast("long")
  }

  /** Distinct-token ratio — low values flag repetitive/boilerplate text. */
  def uniqueTokenRatio(c: Column): Column = {
    val t = tokens(c)
    size(array_distinct(t)).cast("double") / size(t).cast("double")
  }

  /** Mean token length in characters. */
  def meanTokenLen(c: Column): Column = {
    val t = tokens(c)
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
      size(t).cast("double")
  }

  /** Fraction of tokens found in `words` (e.g. a stopword list).
    * Compiled set-membership count — see [[TokenSetCountExpr]]. */
  def wordListRatio(c: Column, words: Seq[String]): Column = {
    val t = tokens(c)
    org.apache.spark.sql.graft.VectorExpressions.tokenSetCount(t, words).cast("double") /
      size(t).cast("double")
  }

  /** Punctuation characters per character of text. */
  def punctRatio(c: Column): Column = {
    val n = normalizeText(c)
    (length(n) - length(regexp_replace(n, "[.,;:!?'\"()]", ""))).cast("double") /
      length(n).cast("double")
  }

  /** English-ish stopwords used by [[qualityScore]]; public so the oracle
    * SQL and tests can mirror the exact list. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with")

  /** Composite quality score in [0,1]: length sweet-spot, lexical
    * diversity, and a bounded stopword-presence band — the standard
    * pretraining-filter shape (length/punct/stopword heuristics).
    * Compiled to ONE fused scan ([[QualityScoreExpr]]) for the same
    * reason as [[languageId]]: quality gates live in Filter predicates,
    * where the declarative form re-evaluates its split/regexp children
    * once per reference. [[qualityScoreDeclarative]] stays as the
    * bit-compared reference implementation. */
  def qualityScore(c: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.qualityScore(normalizeText(c))

  /** The declarative twin of [[qualityScore]] — exactly the form the
    * DuckDB oracle SQL encodes; kept for the bit-equality spec, not
    * used in hot paths. */
  def qualityScoreDeclarative(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val lengthScore = least(nTok / 64.0, lit(1.0))
    val diversity = uniqueTokenRatio(c)
    val stop = wordListRatio(c, Stopwords)
    val stopScore = when(stop.between(0.01, 0.6), 1.0).otherwise(0.5)
    // No round(): Spark (BigDecimal HALF_UP) and DuckDB round doubles
    // differently; raw doubles from identical op order are bit-identical.
    lengthScore * 0.4 + diversity * 0.4 + stopScore * 0.2
  }

  /** The eight Gopher stop words — a document must contain at least two
    * (Rae et al., arXiv:2112.11446 §A1.1). Public for oracle/spec reuse. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-rule document filter (Rae et al., arXiv:2112.11446 §A1.1):
    * the canonical rule-based pretraining quality gate. Emits the raw
    * per-document statistics alongside the pass verdict so downstream
    * can re-threshold without a second scan:
    *
    *  - `n_words` in [minWords, maxWords]        (50 / 100000 in Gopher)
    *  - mean word length in [3, 10] characters
    *  - symbol-to-word ratio ('#' chars + '...' runs) ≤ 0.1
    *  - < 90% of lines start with a bullet ('-', '*', '•')
    *  - < 30% of lines end with an ellipsis ('...' or '…')
    *  - ≥ 80% of words contain at least one letter
    *  - ≥ 2 distinct [[GopherStopwords]] present
    *
    * Word stats run over normalized [[tokens]]; line stats split the RAW
    * text on '\n' (normalization collapses newlines). Ratios are
    * quantized to integer millionths with numerator×10⁶ BEFORE the
    * divide — both engines evaluate the identical double expression, so
    * the floor is bit-stable. Narrow single-pass projection: no shuffle,
    * no UDF — at 100 TB this is a map-only scan that feeds a filter. */
  def gopherStats(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minWords: Long = 50L,
      maxWords: Long = 100000L): DataFrame = {
    val staged = df.select(
      col(idCol),
      tokens(col(textCol)).as("toks"),
      normalizeText(col(textCol)).as("norm"),
      split(coalesce(col(textCol), lit("")), "\n").as("lines"))
    val nWords = size(col("toks")).cast("long")
    // zero-token docs: every per-word ratio is 0/0 — emit null stats
    // (passes stays false via the word-count band, which sits first in
    // the conjunction so FALSE AND NULL = FALSE) instead of a NaN that
    // ANSI refuses to cast to long
    def perWordQ(num: Column): Column =
      when(nWords === 0L, lit(null).cast("long"))
        .otherwise(floor(num * 1000000.0 / nWords.cast("double")).cast("long"))
    val meanLenQ = perWordQ(
      aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x)).cast("double"))
    val nHash = (length(col("norm")) - length(regexp_replace(col("norm"), "#", ""))).cast("long")
    val nEllipsis = ((length(col("norm")) -
      length(regexp_replace(col("norm"), "\\.\\.\\.", ""))) / 3).cast("long")
    val symbolQ = perWordQ((nHash + nEllipsis).cast("double"))
    val nLines = size(col("lines")).cast("long")
    val bulletCount = size(filter(col("lines"),
      l => trim(l).rlike("^[-*•]"))).cast("long")
    val ellipsisEndCount = size(filter(col("lines"),
      l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("long")
    val bulletQ = floor(bulletCount.cast("double") * 1000000.0 / nLines.cast("double")).cast("long")
    val ellipsisQ = floor(ellipsisEndCount.cast("double") * 1000000.0 / nLines.cast("double")).cast("long")
    val alphaCount = size(filter(col("toks"), t => t.rlike("\\p{L}"))).cast("long")
    val alphaQ = perWordQ(alphaCount.cast("double"))
    val stopHits = size(filter(
      array(GopherStopwords.map(lit): _*),
      w => array_contains(col("toks"), w))).cast("long")
    staged.select(
      col(idCol),
      nWords.as("n_words"),
      meanLenQ.as("mean_word_len_q"),
      symbolQ.as("symbol_ratio_q"),
      nLines.as("n_lines"),
      bulletQ.as("bullet_frac_q"),
      ellipsisQ.as("ellipsis_frac_q"),
      alphaQ.as("alpha_frac_q"),
      stopHits.as("stop_hits"),
      (nWords.between(minWords, maxWords) &&
        meanLenQ.between(3000000L, 10000000L) &&
        (symbolQ <= 100000L) &&
        (bulletQ < 900000L) &&
        (ellipsisQ < 300000L) &&
        (alphaQ >= 800000L) &&
        (stopHits >= 2L)).as("passes"))
  }

  /** C4-style cleaning (Raffel et al., "Exploring the Limits of Transfer
    * Learning…", JMLR 2020 §2.2 — arXiv:1910.10683), the other canonical
    * public web-corpus rule set next to [[gopherStats]]. Line rules:
    * keep a line only if it ends in terminal punctuation (incl. closing
    * quote), carries ≥ 3 words, and does not mention "javascript".
    * Page rules: ≥ 5 sentences must survive, and "lorem ipsum" / "{"
    * anywhere on the raw page reject it. Emits the cleaned text (kept
    * lines re-joined) plus the counters, so the verdict is auditable.
    * Single-pass narrow projection, higher-order functions only — no
    * UDF, no shuffle: a map-only scan at any corpus size. */
  def c4Filter(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val staged = df.select(
      col(idCol),
      col(textCol),
      split(coalesce(col(textCol), lit("")), "\n").as("lines"))
    val kept = filter(col("lines"), l =>
      trim(l).rlike("[.!?\"]$") &&
        (size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= 3) &&
        !lower(l).contains("javascript"))
    val withClean = staged.select(
      col(idCol), col(textCol),
      size(col("lines")).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, "\n").as("clean_text"))
    val nSentences =
      size(regexp_extract_all(col("clean_text"), lit("[.!?]"), lit(0))).cast("long")
    withClean.select(
      col(idCol),
      col("n_lines"),
      col("n_kept"),
      nSentences.as("n_sentences"),
      (nSentences >= 5L &&
        !lower(col(textCol)).contains("lorem ipsum") &&
        !col(textCol).contains("{")).as("passes_c4"),
      col("clean_text"))
  }

  /** Raw (non-distinct) word n-grams — the occurrence list the
    * repetition signals need; [[org.apache.spark.sql.graft.VectorExpressions.wordShingles]]
    * dedups and serves the join-key paths instead.
    *
    * `toks` MUST be a materialized [[tokens]] column from a prior
    * `select`, not the tokens expression inline: the transform lambda's
    * `slice` re-evaluates its child per position under interpreted eval,
    * so an inline tokenize would re-run the normalize regexp O(tokens)
    * times per row (measured at 15 s for 5000 docs at sf0.1; staged it
    * is sub-second). An attribute reference is a cheap per-row read. */
  def rawNgrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Gopher-style repetition signal: fraction of n-gram occurrences that
    * are repeats (1 − distinct/total). High values flag boilerplate and
    * degenerate loops — the standard pretraining repetition filter
    * (Rae et al., "Scaling Language Models", arXiv:2112.11446 §A1.1).
    *
    * `grams` MUST be a materialized column from [[rawNgrams]] in a prior
    * `select` — NOT the rawNgrams expression inline. Interpreted HOF
    * lambdas re-evaluate their argument expression on every element, so
    * inlining would re-run the tokenize regexp and the n-gram build
    * O(n²) times per row (measured: turned a 0.5 s scan into minutes at
    * sf0.1); a column reference is a cheap attribute read. */
  def dupNgramFraction(grams: Column): Column =
    when(size(grams) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(grams)).cast("double") / size(grams).cast("double"))

  /** Companion repetition signal: fraction of all n-gram occurrences
    * taken by the single most frequent n-gram. The max multiplicity is
    * the longest equal-run in the SORTED gram list — one O(n log n)
    * sort plus a linear fold per row, instead of the naive
    * distinct×filter scan whose O(d·n) interpreted compares dominated
    * the whole bench (16 s at sf0.1). Same staging requirement as
    * [[dupNgramFraction]]; no shuffle. */
  def topNgramFraction(grams: Column): Column = {
    val top = aggregate(
      array_sort(grams),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(grams) === 0, lit(0.0))
      .otherwise(top.cast("double") / size(grams).cast("double"))
  }

  /** Hashing-trick linear text classifier score — the fastText-style
    * model-based quality/domain filter shape every pretraining pipeline
    * runs (feature hashing: Weinberger et al., ICML 2009):
    * `score = Σ_tokens w[h(token) mod buckets]`.
    *
    * The weight table here is a deterministic integer derivation from
    * the bucket id (Knuth multiplicative hash into [−2³⁰, 2³⁰), exact
    * integer units — no float accumulation, so the DuckDB oracle
    * replays the score bit-for-bit); the token hash is the first 8 hex
    * digits of md5, which both engines compute identically over UTF-8
    * bytes. Swapping in TRAINED weights keeps the identical shape: a
    * broadcast array lookup instead of the derivation.
    *
    * `toks` must be a STAGED token column (the usual HOF contract).
    * Narrow per-row pass: no shuffle, no UDF, nothing collected — at
    * 100 TB this filter runs at scan speed. */
  def hashedLinearScore(toks: Column, buckets: Int = 1 << 20): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    aggregate(
      transform(toks, t =>
        (tokenBucket(t, buckets) * lit(2654435761L)) % lit(2147483648L) - lit(1073741824L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hashed feature bucket of a token: first 8 hex digits of md5 mod
    * `buckets` — both halves computable identically in DuckDB over the
    * same UTF-8 bytes, so a weight table keyed on this bucket id is
    * engine-portable. */
  def tokenBucket(t: Column, buckets: Int): Column =
    pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(buckets.toLong))

  /** TRAIN the feature-hashing classifier: closed-form multinomial
    * Naive-Bayes log-odds per hashed bucket over a labeled corpus
    * (`labelCol` = boolean positive-class indicator) —
    *
    *   w[b] = ⌊( ln((pos_b+1)/(posTot+B)) − ln((neg_b+1)/(negTot+B)) )·10⁶⌋,
    *
    * add-one smoothing with B = `buckets` features, quantized to exact
    * integer micro-units (the [[bigramLmScores]] convention) so any
    * engine replays the weights from the data. Closed-form NB is THE
    * deterministic stand-in for a fastText-style trained filter: same
    * feature transform, same linear form, weights genuinely estimated
    * from labeled data (a gradient-trained model would only change the
    * numbers in this table). Two aggregations, both map-side partial;
    * the table is ≤ min(vocab, B) rows — broadcastable by construction,
    * which is the point of hashing into bounded buckets. */
  def nbBucketWeights(
      df: DataFrame,
      labelCol: Column,
      textCol: String = "text",
      buckets: Int = 1 << 20): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val counts = df
      .select(labelCol.cast("int").as("y"), explode(tokens(col(textCol))).as("tok"))
      .select(col("y"), tokenBucket(col("tok"), buckets).as("bucket"))
      .groupBy("bucket")
      .agg(sum(col("y")).cast("long").as("pos"),
        sum(lit(1) - col("y")).cast("long").as("neg"))
    val totals = counts.agg(
      sum(col("pos")).as("pos_tot"), sum(col("neg")).as("neg_tot"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor((log((col("pos") + 1).cast("double") / (col("pos_tot") + lit(buckets)).cast("double"))
          - log((col("neg") + 1).cast("double") / (col("neg_tot") + lit(buckets)).cast("double"))) * 1e6)
          .cast("long").as("w_micro"))
  }

  /** SCORE with the trained table: per document,
    * `score_sum = Σ_tokens w[bucket(token)]` (unseen buckets weigh 0) —
    * the inference half of the fastText-shape filter. Token occurrences
    * pre-aggregate to (doc, bucket, cnt) before the weight join (the
    * repeated-token factor never shuffles), the weight table broadcasts,
    * and the rollup is the only doc-keyed shuffle. Returns (`idCol`,
    * n_tokens, score_sum); `score_sum > 0` ⇒ the NB model judges the doc
    * more likely positive-class than not. */
  def classifierScores(
      df: DataFrame,
      weights: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 1 << 20): DataFrame = {
    val occ = df
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .select(col(idCol), tokenBucket(col("tok"), buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
    val scored = occ.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * coalesce(col("w_micro"), lit(0L))).as("score_sum"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score_sum"), lit(0L)).as("score_sum"))
  }

  /** PII patterns for [[scrubPii]], public for oracle mirroring. Kept to
    * constructs whose semantics agree between Java regex and DuckDB's
    * RE2 (character classes, +, bounded repetition, \b, \d): email
    * addresses and NNN-NNN-NNNN phone numbers. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** PII scrubbing — the redaction pass a training corpus runs before
    * anything else sees the text: emails and phone numbers replaced by
    * typed placeholders. Pure per-row regexp_replace chain, no shuffle;
    * at 100 TB this is one narrow projection pass. */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Count of PII matches [[scrubPii]] actually redacts: emails on the
    * raw text, phones on the EMAIL-SCRUBBED text — mirroring the
    * replace order, so a phone-shaped string inside an email match
    * (e.g. `123-456-7890@x.io`, consumed whole by the email pass) is
    * counted once, not twice. */
  def piiCount(c: Column): Column =
    (size(regexp_extract_all(c, lit(EmailPattern), lit(0))) +
      size(regexp_extract_all(
        regexp_replace(c, EmailPattern, "<EMAIL>"), lit(PhonePattern), lit(0))))
      .cast("long")

  /** Marker words per (whitespace-tokenized) language for the language-ID
    * heuristic. Public for oracle mirroring. Chinese is NOT in this list:
    * zh text has no whitespace tokens, so its score is the CJK character
    * count instead (see [[langScores]]). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "de", "que", "con"),
    "de" -> Seq("der", "die", "und", "ist", "mit"),
    "fr" -> Seq("le", "la", "et", "est", "avec"))

  /** Count of tokens that belong to `words` (compiled set membership). */
  private def markerHits(t: Column, words: Seq[String]): Column =
    org.apache.spark.sql.graft.VectorExpressions.tokenSetCount(t, words)

  /** Count of CJK-ideograph characters — the zh signal (marker tokens
    * can never match unsegmented Chinese). The `\x{...}` class parses
    * identically in Java regex and DuckDB's RE2. */
  def cjkCharCount(c: Column): Column = {
    val n = normalizeText(c)
    (length(n) - length(regexp_replace(n, "[\\x{4e00}-\\x{9fff}]", ""))).cast("long")
  }

  /** Per-language score columns `score_<lang>`: marker-token hits for
    * the whitespace-tokenized languages, CJK char count for zh. */
  def langScores(c: Column): Seq[(String, Column)] = {
    val t = tokens(c)
    LangMarkers.map { case (lang, ws) => (s"score_$lang", markerHits(t, ws)) } :+
      ("score_zh" -> cjkCharCount(c))
  }

  /** Language-ID heuristic: argmax of marker hits, first-listed language
    * wins ties, `und` when nothing matches. Deterministic; at 100 TB this
    * is a narrow map with a small broadcast-free marker table baked into
    * the plan. Compiled to ONE fused byte scan ([[LangIdExpr]]): the
    * declarative cascade ([[languageIdCascade]]) is ~a dozen split/regexp
    * evaluations per row inside Filter predicates, where codegen does no
    * subexpression elimination — language gates are exactly where this
    * expression lives (curation, stratified sampling). */
  def languageId(c: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.langId(normalizeText(c))

  /** The declarative twin of [[languageId]] — greatest over the
    * [[langScores]] columns with a first-wins `when` cascade, exactly
    * the form the DuckDB oracle SQL encodes. Kept as the reference
    * implementation the spec bit-compares the fused expression against;
    * not used in hot paths. */
  def languageIdCascade(c: Column): Column = {
    val scores = langScores(c)
    val maxScore = greatest(scores.map(_._2): _*)
    // First-wins cascade on ties (folded in reverse so the first listed
    // language ends up outermost) — mirrored verbatim in the oracle SQL.
    val cascade = scores.reverse.foldLeft(lit("und")) { case (els, (name, s)) =>
      when(s === maxScore, name.stripPrefix("score_")).otherwise(els)
    }
    when(maxScore <= 0, "und").otherwise(cascade)
  }

  /** Content fingerprint: md5 of the normalized text — the exact-dedup
    * key; hex string, byte-identical to DuckDB's `md5()`. */
  def fingerprintMd5(c: Column): Column =
    md5(normalizeText(c))

  /** 64-bit content fingerprint (xxhash64 of normalized text) — the
    * cheap join/partition key form of the fingerprint. */
  def fingerprint64(c: Column): Column =
    xxhash64(normalizeText(c))

  /** Winnowing fingerprints (Karp-Rabin rolling hash over character
    * k-grams, window minima — Schleimer et al. SIGMOD'03): any shared
    * substring of length ≥ w + k − 1 between two documents produces a
    * shared fingerprint, which is what makes partial-overlap/plagiarism
    * detection work where whole-document hashing cannot. */
  def winnowFingerprints(c: Column, k: Int = 8, w: Int = 4): Column =
    org.apache.spark.sql.graft.VectorExpressions.winnow(normalizeText(c), k, w)

  /** Word n-gram shingles of the normalized text (distinct, first-
    * occurrence order), the input to MinHash/Jaccard dedup. Compiled
    * expression — the HOF transform/slice/concat_ws pipeline was the
    * dominant cost of the dedup operators because self-joins re-evaluate
    * it per branch. */
  def wordShingles(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions.shingles(tokens(c), n)

  /** Corpus-trained bigram language-model score — perplexity filtering
    * (CCNet, Wenzek et al. arXiv:1911.00359): documents whose token
    * transitions are improbable under a model trained on the corpus
    * itself score low (gibberish, boilerplate soup, wrong-language
    * fragments). Per bigram occurrence, add-one-smoothed conditional
    *
    *   p(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁) + V),   V = vocabulary size,
    *
    * quantized per term as floor(ln(p)·10⁶) (ln can differ by 1 ulp
    * between runtimes; ranking/hashing happens on the quantized
    * integer, the [[tfIdfTopTerms]] convention). Output: (id,
    * n_bigrams, lm_micro = Σ quantized ln p) — avg = lm_micro /
    * n_bigrams is the caller's perplexity knob; docs under 2 tokens
    * keep (0, 0).
    *
    * 100 TB shape: every per-occurrence row is PRE-AGGREGATED to
    * (doc, gram, cnt) before anything joins — map-side partial combine
    * collapses the repeated-gram factor (stopword bigrams dominate raw
    * text), so the join shuffles distinct (doc, gram) pairs, not every
    * token occurrence; the r6 form that shipped raw occurrences through
    * two joins was the single worst cold query of the round. The bigram
    * model itself derives from the same pre-aggregate (a second partial
    * combine, no extra scan of the text). `broadcastUnigrams` ships the
    * unigram table to every task instead of shuffling on w1 — right
    * whenever the vocabulary fits in executor memory (typical curated
    * corpora); leave false for open-vocabulary web text, where the w1
    * join rides AQE skew-split. The vocabulary size rides a 1-row
    * broadcast either way. */
  def bigramLmScores(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      broadcastUnigrams: Boolean = false): DataFrame = {
    val toksDf = df.select(col(idCol), tokens(col(textCol)).as("t"))
    val occ = toksDf.select(col(idCol), explode(rawNgrams(col("t"), 2)).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
      .withColumn("w1", substring_index(col("gram"), " ", 1))
    val uni = toksDf.select(explode(col("t")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("uc"))
    val uniJ = if (broadcastUnigrams) broadcast(uni) else uni
    val vocab = uni.select(count(lit(1)).as("v_size"))
    val bi = occ.groupBy("gram").agg(sum(col("cnt")).as("bc"))
    val scored = occ.join(bi, "gram").join(uniJ, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("lp_micro",
        floor(log((col("bc") + 1).cast("double") / (col("uc") + col("v_size")).cast("double")) * 1e6)
          .cast("long"))
    df.select(col(idCol)).join(
        scored.groupBy(col(idCol)).agg(
          sum(col("cnt")).as("n_bigrams"), sum(col("cnt") * col("lp_micro")).as("lm_micro")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_micro"), lit(0L)).as("lm_micro"))
  }

  /** [[bigramLmScores]] generalized to score one corpus under a model
    * trained on ANOTHER — the cross-corpus primitive behind
    * importance-based selection ([[dsirSelect]]) and domain-match
    * scoring. Counts come from `trainDf`; `scoreDf`'s grams LEFT-join
    * them (an out-of-vocabulary gram scores ln(1/(0+V)), the add-one
    * floor). `broadcastModel` ships both count tables — right whenever
    * the TRAINING corpus is the small curated side (the DSIR shape:
    * target = thousands of docs, corpus = the 100 TB side); set false
    * to shuffle when the model itself is web-scale. */
  def bigramLmScoresAgainst(
      scoreDf: DataFrame,
      trainDf: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      broadcastModel: Boolean = true): DataFrame = {
    val occ = scoreDf.select(col(idCol), tokens(col(textCol)).as("t"))
      .select(col(idCol), explode(rawNgrams(col("t"), 2)).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
      .withColumn("w1", substring_index(col("gram"), " ", 1))
    val toksTrain = trainDf.select(tokens(col(textCol)).as("t"))
    val uni = toksTrain.select(explode(col("t")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("uc"))
    val bi = toksTrain.select(explode(rawNgrams(col("t"), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("bc"))
    val uniJ = if (broadcastModel) broadcast(uni) else uni
    val biJ = if (broadcastModel) broadcast(bi) else bi
    // greatest(...,1): an empty training corpus degrades to uniform
    // ln(1/1)=0 scores instead of a divide-by-zero
    val vocab = uni.select(greatest(count(lit(1)), lit(1L)).as("v_size"))
    val scored = occ.join(biJ, Seq("gram"), "left").join(uniJ, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp_micro",
        floor(log((coalesce(col("bc"), lit(0L)) + 1).cast("double") /
          (coalesce(col("uc"), lit(0L)) + col("v_size")).cast("double")) * 1e6)
          .cast("long"))
    scoreDf.select(col(idCol)).join(
        scored.groupBy(col(idCol)).agg(
          sum(col("cnt")).as("n_bigrams"), sum(col("cnt") * col("lp_micro")).as("lm_micro")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_micro"), lit(0L)).as("lm_micro"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney ICASSP'95;
    * Chen & Goodman '98 eq. 4.25 — the smoothing family KenLM ships and
    * CCNet-grade quality filtering actually uses, one order down):
    *
    *   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    *            + (D · N1+(w1·)/c(w1·)) · Pcont(w2)
    *   Pcont(w2) = (N1+(·w2) + 1) / (N1+(··) + V)
    *
    * with the fixed discount D = 0.75 (Chen & Goodman's benchmark
    * setting; exactly representable in float64, so both engines
    * compute the identical literal). The continuation distribution
    * carries an add-one floor so out-of-vocabulary words score
    * ln(1/(N1+(··)+V)) instead of −∞ (KenLM reserves <unk> mass the
    * same way, by a different route). A score-side context w1 unseen
    * in training backs off entirely to Pcont(w2).
    *
    * Model statistics are FOUR aggregates over the training corpus —
    * bigram counts, context totals, and the two continuation-type
    * counts — each a map-side-combinable groupBy; the score side
    * LEFT-joins them per distinct (doc, gram) occurrence. Per-gram
    * log-probs quantize to micro-nats (floor(ln·1e6) — the engine's
    * established float-determinism device) BEFORE the per-doc sum, so
    * document scores are order-independent integer sums and replay
    * bit-identically in the DuckDB oracle.
    *
    * `broadcastModel` ships all four model tables — right when the
    * training corpus is the small curated side (the DSIR shape: target
    * = thousands of docs, corpus = the 100 TB side); set false to
    * shuffle when the model itself is web-scale. */
  /** The four bigram-KN model tables (see [[knBigramScores]]), shared
    * by the doc-level and span-level scorers. */
  private final case class KnModel(
      bi: DataFrame, cxt: DataFrame, nbw: DataFrame, consts: DataFrame)

  private def knBigramModel(trainDf: DataFrame, textCol: String): KnModel = {
    val occT = trainDf.select(tokens(col(textCol)).as("t"))
      .select(explode(rawNgrams(col("t"), 2)).as("gram"))
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .withColumn("w2", substring_index(col("gram"), " ", -1))
    val bi = occT.groupBy("gram").agg(count(lit(1)).as("bc"))
    val cxt = occT.groupBy("w1").agg(count(lit(1)).as("cw1"),
      count_distinct(col("w2")).as("nf"))
    val n1bwd = occT.groupBy("w2").agg(count_distinct(col("w1")).as("nb"))
    val uni = trainDf.select(tokens(col(textCol)).as("t"))
      .select(explode(col("t")).as("w"))
      .agg(count_distinct(col("w")).as("v_size"))
    val n1dd = occT.agg(count_distinct(col("gram")).as("n_types"))
    val consts = n1dd.crossJoin(uni)
      .select(greatest(col("n_types") + col("v_size"), lit(1L)).as("cont_den"))
    KnModel(bi, cxt, n1bwd, consts)
  }

  /** Per-gram micro-nat KN log-prob over an occurrence table carrying
    * (gram, w1, w2) — the shared score stage. */
  private def knScoreGrams(
      occ: DataFrame, m: KnModel, discount: Double,
      broadcastModel: Boolean): DataFrame = {
    def side(df: DataFrame): DataFrame = if (broadcastModel) broadcast(df) else df
    val d = lit(discount)
    val pcont = (coalesce(col("nb"), lit(0L)) + lit(1L)).cast("double") /
      col("cont_den").cast("double")
    val cw1d = col("cw1").cast("double")
    val p = when(col("cw1").isNull, pcont)
      .otherwise(
        greatest(coalesce(col("bc"), lit(0L)).cast("double") - d, lit(0.0)) / cw1d +
          ((d * col("nf").cast("double")) / cw1d) * pcont)
    occ
      .join(side(m.bi), Seq("gram"), "left")
      .join(side(m.cxt), Seq("w1"), "left")
      .join(side(m.nbw), Seq("w2"), "left")
      .crossJoin(broadcast(m.consts))
      .withColumn("lp_micro", floor(log(p) * lit(1e6)).cast("long"))
  }

  def knBigramScores(
      scoreDf: DataFrame,
      trainDf: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      discount: Double = 0.75,
      broadcastModel: Boolean = true): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val occ = scoreDf.select(col(idCol), tokens(col(textCol)).as("t"))
      .select(col(idCol), explode(rawNgrams(col("t"), 2)).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .withColumn("w2", substring_index(col("gram"), " ", -1))
    val scored = knScoreGrams(occ, knBigramModel(trainDf, textCol), discount, broadcastModel)
    scoreDf.select(col(idCol)).join(
        scored.groupBy(col(idCol)).agg(
          sum(col("cnt")).as("n_bigrams"),
          sum(col("cnt") * col("lp_micro")).as("kn_micro")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("kn_micro"), lit(0L)).as("kn_micro"))
  }

  /** SPAN-level KN scoring — quality LOCALIZATION: the doc-level score
    * says a document is bad, the span scores say WHERE (boilerplate
    * runs, encoding garbage, stitched-in navigation text score far
    * below the body — the CCNet paragraph-level scoring idea applied
    * on sliding token windows). Windows of `windowTokens` every
    * `stride` tokens (tail windows short, the token-windows
    * convention); each window's bigrams score under the SAME
    * cross-corpus KN model as [[knBigramScores]], micro-nat quantized
    * before the per-window integer sums. Output one row per (doc,
    * window): (idCol, win_idx, n_bigrams, kn_micro).
    *
    * 100 TB shape: the window explode multiplies rows by
    * ~window/stride (a small constant); everything downstream is the
    * doc-level scorer's plan with (doc, win) as the key. */
  def knSpanScores(
      scoreDf: DataFrame,
      trainDf: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      windowTokens: Int = 32,
      stride: Int = 16,
      discount: Double = 0.75,
      broadcastModel: Boolean = true): DataFrame = {
    require(windowTokens >= 2 && stride >= 1,
      s"windowTokens=$windowTokens stride=$stride out of range")
    val wins = scoreDf.select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), posexplode(
        transform(
          sequence(lit(0),
            floor((size(col("toks")) - lit(1)) / lit(stride)).cast("int")),
          k => slice(col("toks"), k * lit(stride) + lit(1), lit(windowTokens))))
        .as(Seq("win_idx", "wt")))
    val occ = wins
      .select(col(idCol), col("win_idx"), explode(rawNgrams(col("wt"), 2)).as("gram"))
      .groupBy(col(idCol), col("win_idx"), col("gram")).agg(count(lit(1)).as("cnt"))
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .withColumn("w2", substring_index(col("gram"), " ", -1))
    val scored = knScoreGrams(occ, knBigramModel(trainDf, textCol), discount, broadcastModel)
    wins.select(col(idCol), col("win_idx")).join(
        scored.groupBy(col(idCol), col("win_idx")).agg(
          sum(col("cnt")).as("n_bigrams"),
          sum(col("cnt") * col("lp_micro")).as("kn_micro")),
        Seq(idCol, "win_idx"), "left")
      .select(col(idCol), col("win_idx"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("kn_micro"), lit(0L)).as("kn_micro"))
  }

  /** Span-quality SCRUB — the action the span scores exist for: drop
    * the low-scoring windows and reassemble the survivors (the CCNet
    * move of keeping good paragraphs of mixed documents, here on
    * NON-overlapping token windows so every token belongs to exactly
    * one verdict). A window is dropped when its per-bigram mean KN
    * score falls more than `marginMicro` micro-nats below the DOC's
    * own per-bigram mean — a per-doc relative cut, so a uniformly-bad
    * document is left intact for the doc-level gate rather than
    * emptied here. The comparison is exact integer cross-
    * multiplication (kn·ΣN ≥ (ΣKN − margin·ΣN)·n — all positive
    * multipliers), never a float divide, so the verdict is
    * bit-identical across engines and partitionings. Windows with no
    * bigram (≤1 token) are kept. Output one row per input doc:
    * (idCol, n_windows, n_kept, text_scrubbed).
    *
    * Long envelope: |ΣKN| ≲ 2e13 for a 1M-token doc at the −20-nat
    * floor; the cross products stay under 9e18 for docs to ~30M
    * tokens — beyond any pretraining document.
    *
    * 100 TB shape: [[knSpanScores]]'s plan plus one doc-keyed agg that
    * carries the window token arrays for reassembly — the tokens
    * shuffle once, keyed by doc, and the model sides stay broadcast. */
  def knSpanScrub(
      scoreDf: DataFrame,
      trainDf: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      windowTokens: Int = 32,
      marginMicro: Long = 1500000L,
      discount: Double = 0.75,
      broadcastModel: Boolean = true): DataFrame = {
    require(windowTokens >= 2, s"windowTokens=$windowTokens out of range")
    require(marginMicro >= 0, s"marginMicro=$marginMicro must be >= 0")
    val wins = scoreDf.select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), posexplode(
        transform(
          sequence(lit(0),
            floor((size(col("toks")) - lit(1)) / lit(windowTokens)).cast("int")),
          k => slice(col("toks"), k * lit(windowTokens) + lit(1), lit(windowTokens))))
        .as(Seq("win_idx", "wt")))
    val occ = wins
      .select(col(idCol), col("win_idx"), explode(rawNgrams(col("wt"), 2)).as("gram"))
      .groupBy(col(idCol), col("win_idx"), col("gram")).agg(count(lit(1)).as("cnt"))
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .withColumn("w2", substring_index(col("gram"), " ", -1))
    val scored = knScoreGrams(occ, knBigramModel(trainDf, textCol), discount, broadcastModel)
      .groupBy(col(idCol), col("win_idx")).agg(
        sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * col("lp_micro")).as("kn_micro"))
    val spans = wins.join(scored, Seq(idCol, "win_idx"), "left")
      .select(col(idCol), col("win_idx"), col("wt"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("kn_micro"), lit(0L)).as("kn_micro"))
    val totals = spans.groupBy(col(idCol)).agg(
      sum(col("n_bigrams")).as("sum_n"), sum(col("kn_micro")).as("sum_kn"))
    val kept = spans.join(totals, Seq(idCol))
      .withColumn("keep",
        col("n_bigrams") === 0L ||
          col("kn_micro") * col("sum_n") >=
            (col("sum_kn") - lit(marginMicro) * col("sum_n")) * col("n_bigrams"))
    val out = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_windows"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
      array_join(
        flatten(array_sort(collect_list(
          when(col("keep"), struct(col("win_idx"), col("wt")))))
          .getField("wt")),
        " ").as("text_scrubbed"))
    scoreDf.select(col(idCol)).join(out, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_scrubbed"), lit("")).as("text_scrubbed"))
  }

  /** Interpolated Kneser–Ney TRIGRAM scoring — the full order-N
    * recursion of the KenLM family (Chen & Goodman '98 §4.1.6: highest
    * order uses raw counts, every lower order uses CONTINUATION TYPE
    * counts):
    *
    *   P(w3|w1w2) = max(c(w1w2w3)−D,0)/c(w1w2·)
    *              + (D·N1+(w1w2·)/c(w1w2·)) · P₂(w3|w2)
    *   P₂(w3|w2)  = max(N1+(·w2w3)−D,0)/N1+(·w2·)
    *              + (D·N1+(w2·)/N1+(·w2·)) · Pcont(w3)
    *   Pcont(w3)  = (N1+(·w3) + 1)/(N1+(··) + V)
    *
    * where N1+(·w2w3) counts distinct PRECEDING words of the bigram,
    * N1+(·w2·) its per-middle total, N1+(w2·) the distinct-successor
    * fan-out within the trigram types, and the bottom level is
    * [[knBigramScores]]'s add-one-floored continuation distribution
    * over bigram types. Unseen (w1w2) contexts back off fully to P₂;
    * unseen middles back off fully to Pcont — the proper cascade.
    *
    * Model statistics are SIX aggregates over the training corpus (raw
    * trigram counts + context totals, three type-count tables off the
    * DISTINCT trigram set, the bigram continuation bottom) — all
    * map-side-combinable; the score side LEFT-joins them per distinct
    * (doc, trigram). Same micro-nat quantization and broadcast/shuffle
    * seam as the bigram form. */
  def knTrigramScores(
      scoreDf: DataFrame,
      trainDf: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      discount: Double = 0.75,
      broadcastModel: Boolean = true): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    def withParts(df: DataFrame): DataFrame = df
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .withColumn("w2", element_at(split(col("gram"), " "), 2))
      .withColumn("w3", substring_index(col("gram"), " ", -1))
      .withColumn("g12", concat_ws(" ", col("w1"), col("w2")))
      .withColumn("g23", concat_ws(" ", col("w2"), col("w3")))
    val occ = withParts(
      scoreDf.select(col(idCol), tokens(col(textCol)).as("t"))
        .select(col(idCol), explode(rawNgrams(col("t"), 3)).as("gram"))
        .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt")))
    val occT3 = withParts(
      trainDf.select(tokens(col(textCol)).as("t"))
        .select(explode(rawNgrams(col("t"), 3)).as("gram")))
    val tri = occT3.groupBy("gram").agg(count(lit(1)).as("tc"))
    val ctx2 = occT3.groupBy("g12").agg(count(lit(1)).as("c12"),
      count_distinct(col("w3")).as("nf12"))
    val types3 = occT3.select("w1", "w2", "w3", "g23").distinct()
    val midT = types3.groupBy("g23").agg(count_distinct(col("w1")).as("nmid"))
    val midC = types3.groupBy("w2").agg(count(lit(1)).as("n2ctx"),
      count_distinct(col("w3")).as("nfmid"))
    // bottom level: the bigram continuation distribution
    val occT2 = trainDf.select(tokens(col(textCol)).as("t"))
      .select(explode(rawNgrams(col("t"), 2)).as("g2"))
      .withColumn("b2", substring_index(col("g2"), " ", -1))
    val nbw = occT2.select("g2", "b2").distinct()
      .groupBy(col("b2").as("w3")).agg(count(lit(1)).as("nb"))
    val uni = trainDf.select(tokens(col(textCol)).as("t"))
      .select(explode(col("t")).as("w"))
      .agg(count_distinct(col("w")).as("v_size"))
    val n2types = occT2.agg(count_distinct(col("g2")).as("n_types"))
    val consts = n2types.crossJoin(uni)
      .select(greatest(col("n_types") + col("v_size"), lit(1L)).as("cont_den"))
    def side(df: DataFrame): DataFrame = if (broadcastModel) broadcast(df) else df
    val d = lit(discount)
    val pcont = (coalesce(col("nb"), lit(0L)) + lit(1L)).cast("double") /
      col("cont_den").cast("double")
    val n2d = col("n2ctx").cast("double")
    val p2 = when(col("n2ctx").isNull, pcont)
      .otherwise(
        greatest(coalesce(col("nmid"), lit(0L)).cast("double") - d, lit(0.0)) / n2d +
          ((d * col("nfmid").cast("double")) / n2d) * pcont)
    val c12d = col("c12").cast("double")
    val p3 = when(col("c12").isNull, p2)
      .otherwise(
        greatest(coalesce(col("tc"), lit(0L)).cast("double") - d, lit(0.0)) / c12d +
          ((d * col("nf12").cast("double")) / c12d) * p2)
    val scored = occ
      .join(side(tri), Seq("gram"), "left")
      .join(side(ctx2), Seq("g12"), "left")
      .join(side(midT), Seq("g23"), "left")
      .join(side(midC), Seq("w2"), "left")
      .join(side(nbw), Seq("w3"), "left")
      .crossJoin(broadcast(consts))
      .withColumn("lp_micro", floor(log(p3) * lit(1e6)).cast("long"))
    scoreDf.select(col(idCol)).join(
        scored.groupBy(col(idCol)).agg(
          sum(col("cnt")).as("n_trigrams"),
          sum(col("cnt") * col("lp_micro")).as("kn3_micro")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("kn3_micro"), lit(0L)).as("kn3_micro"))
  }

  /** Hashing-trick document embedding (the fastText / Weinberger
    * feature-hashing construction): token occurrences hash into
    * [[tokenBucket]] buckets, and each output dimension is a ±1-signed
    * sum of bucket counts — a signed random projection of the sparse
    * bag-of-words, giving every document a cheap model-free dense
    * vector that feeds the existing ANN / near-dup operators. The sign
    * is a Knuth multiplicative hash bit of (bucket, dim), computed AT
    * RUNTIME from the data (unlike [[graft.functions.Projections]],
    * whose matrix bakes into the plan) so both engines derive the
    * identical matrix; everything is integer arithmetic — exact.
    *
    * 100 TB shape: explode → map-side pre-aggregated (doc, bucket)
    * counts → one doc-keyed groupBy producing all `outDim` sums in a
    * single pass. No UDF, no model artifact, one shuffle. */
  def hashedEmbedding(
      df: DataFrame,
      outDim: Int = 16,
      buckets: Int = 1 << 20,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(outDim >= 1 && outDim <= 64, s"outDim must be in [1,64], got $outDim")
    val occ = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .select(col(idCol), tokenBucket(col("tok"), buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
    val dims = (0 until outDim).map { i =>
      val h = (col("bucket") * lit(outDim.toLong) + lit(i.toLong)) * lit(2654435761L)
      val sign = when(shiftRight(h, 16) % 2 === 1L, lit(1L)).otherwise(lit(-1L))
      sum(col("cnt") * sign).cast("long").as(f"p$i%02d")
    }
    val proj = occ.groupBy(col(idCol)).agg(dims.head, dims.tail: _*)
    // null/absent-token docs keep their row as the zero vector
    df.select(col(idCol)).join(proj, Seq(idCol), "left")
      .select(col(idCol) +:
        (0 until outDim).map(i => coalesce(col(f"p$i%02d"), lit(0L)).as(f"p$i%02d")): _*)
  }

  /** DSIR-style importance selection (Xie et al., arXiv:2302.03169):
    * rank corpus documents by how much more likely a TARGET-domain
    * bigram LM finds them than the corpus's own LM — the importance
    * weight log p_target(x) − log p_raw(x) over hashed n-gram features,
    * here over the bigram multiset itself — and keep the top `topM`.
    * Both likelihoods sum over the SAME gram multiset, so the
    * difference of the quantized sums is the exact quantized log-ratio
    * (no length normalization needed). Deterministic tie-break on id;
    * the cut is a TakeOrdered, never a global sort.
    *
    * 100 TB shape: the target model (small curated side) broadcasts;
    * the raw model is the corpus's own pre-aggregated counts — the
    * same single-pass shape as [[bigramLmScores]]. */
  def dsirSelect(
      corpus: DataFrame,
      target: DataFrame,
      topM: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      broadcastRaw: Boolean = false): DataFrame = {
    require(topM > 0, s"topM must be positive, got $topM")
    val raw = bigramLmScoresAgainst(corpus, corpus, idCol, textCol,
        broadcastModel = broadcastRaw)
      .withColumnRenamed("lm_micro", "raw_micro")
    val tgt = bigramLmScoresAgainst(corpus, target, idCol, textCol,
        broadcastModel = true)
      .withColumnRenamed("lm_micro", "tgt_micro")
      .drop("n_bigrams")
    raw.join(tgt, Seq(idCol))
      .withColumn("weight", col("tgt_micro") - col("raw_micro"))
      .orderBy(col("weight").desc, col(idCol).asc)
      .limit(topM)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., arXiv:1911.00359
    * §4.3): rank every document within its `groupCol` (language /
    * snapshot in CCNet, `source` here) by per-token LM log-probability
    * and cut the ranking into `nBuckets` equal tiles — bucket 1 ('head')
    * is the lowest-perplexity slice that pretraining keeps, the last
    * ('tail') the one it drops or down-weights.
    *
    * The bucket assignment is exactly SQL `NTILE(k) OVER (PARTITION BY
    * group ORDER BY q DESC NULLS LAST, id)` — but computed WITHOUT a
    * per-group global sort, because at 100 TB a source is billions of
    * docs and `ntile` over that partition is a single-reducer sort.
    * Instead the counting-sort decomposition used by the exact-quantile
    * operator: (1) per-(group, score) doc counts — a partial-aggregated
    * groupBy whose cardinality is #distinct scores, not #docs; (2) a
    * cumulative-count window over that SMALL value table gives each
    * score its global rank offset; (3) a fine-grained window partitioned
    * by (group, score) — skew bounded by the largest score-tie, not the
    * group — gives the within-tie order; (4) the NTILE bucket follows
    * from the rank arithmetically (first n%k buckets get ⌈n/k⌉ rows).
    * The oracle states the plain NTILE form; matching hashes prove the
    * decomposition. Docs with no bigrams rank last (null score). */
  def perplexityBuckets(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      groupCol: String = "source",
      nBuckets: Int = 3,
      broadcastUnigrams: Boolean = false): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val lm = bigramLmScores(df, idCol, textCol, broadcastUnigrams)
    // the scored base fans out into BOTH the per-tie ranking and the
    // value-level counts; without a materialization barrier the whole
    // bigram-LM subplan (the expensive part) executes once per branch —
    // localCheckpoint pins the narrow (id, group, score) projection
    // exactly once (same discipline as connectedComponents' frontier)
    val base = df.select(col(idCol), col(groupCol)).join(lm, Seq(idCol))
      .withColumn("q",
        when(col("n_bigrams") === 0L, lit(null).cast("long"))
          .otherwise(floor(col("lm_micro").cast("double") * 1000000.0 /
            col("n_bigrams").cast("double")).cast("long")))
      .localCheckpoint()
    val tieW = Window.partitionBy(col(groupCol), col("q")).orderBy(col(idCol).asc)
    val ranked = base.withColumn("tie_rn", row_number().over(tieW))
    val counts = base.groupBy(col(groupCol), col("q")).agg(count(lit(1)).as("vc"))
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col("q").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = counts
      .withColumn("cum", sum(col("vc")).over(cumW))
      .withColumn("rank_start", col("cum") - col("vc"))
      .withColumn("n_total", sum(col("vc")).over(Window.partitionBy(col(groupCol))))
      .select(col(groupCol), col("q"), col("rank_start"), col("n_total"))
    val k = lit(nBuckets.toLong)
    // null-safe on q: the no-bigram docs carry a null score and must
    // keep their row (a Seq-join would silently drop them). The
    // offsets table is value-level (one row per distinct (group, q) —
    // always ≤ the per-doc side): broadcast it explicitly so the build
    // side is the small one AND deterministic, instead of AQE flipping
    // BuildLeft/BuildRight between runs on near-equal size estimates
    val joined = ranked.alias("l")
      .join(broadcast(offsets.alias("o")),
        col(s"l.$groupCol") === col(s"o.$groupCol") && col("l.q") <=> col("o.q"))
      .withColumn("r", col("rank_start") + col("tie_rn"))
    // Column./ on longs is DOUBLE division in Spark — floor() restores
    // integer-division semantics exactly (counts are far below 2^53)
    val big = col("n_total") % k
    val smallSize = floor(col("n_total").cast("double") / k.cast("double")).cast("long")
    val bigSize = smallSize + 1L
    val bucket = when(col("r") <= big * bigSize,
        floor((col("r") - 1L).cast("double") / bigSize.cast("double")).cast("long") + 1L)
      .otherwise(big +
        floor((col("r") - 1L - big * bigSize).cast("double") / smallSize.cast("double")).cast("long") + 1L)
      .cast("int")
    joined.select(
      col(s"l.$idCol").as(idCol), col(s"l.$groupCol").as(groupCol),
      col("n_bigrams"), col("lm_micro"),
      bucket.as("bucket"),
      when(bucket === 1, "head").when(bucket === nBuckets, "tail")
        .otherwise("middle").as("tier"))
  }

  /** Relational TF-IDF: top-`topN` terms per document ranked by
    * smoothed tf·idf (idf = ln((m+1)/(df+1)) + 1). The score is
    * quantized to micro-units (`floor(tfidf·1e6)`) because ln() can
    * differ by 1 ulp between runtimes — ranking and hashing happen on
    * the quantized integer, which the DuckDB oracle reproduces exactly.
    * Shuffles: one on (doc, term), one on term (document frequency), one
    * window on doc — all key-bucketed; n_docs is a broadcast scalar. */
  def tfIdfTopTerms(
      df: DataFrame,
      topN: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      broadcastVocab: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    // tf feeds both the df_t aggregate and the scored join — pin it
    // once (exchange reuse under AQE is timing-dependent) and
    // broadcast the always-smaller vocab-level df_t side so the build
    // side is deterministic
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val docFreq0 = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    // vocab-sized: broadcast only when opted in (default true — it
    // also pins the build side); false = shuffle join on the term
    // key for open-vocabulary web corpora (the pmiPairs
    // broadcastUnigrams convention, per the r8 advice)
    val docFreq = if (broadcastVocab) broadcast(docFreq0) else docFreq0
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val idf = log((col("n_docs").cast("double") + lit(1.0)) /
      (col("df_t").cast("double") + lit(1.0))) + lit(1.0)
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf_q").desc, col("term").asc)
    tf.join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf_q",
        floor((col("tf").cast("double") * idf) * lit(1000000.0)).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col(idCol), col("term"), col("tf"), col("df_t"), col("tfidf_q"), col("rank"))
  }

  /** MLlib TF-IDF pipeline (HashingTF + IDF) producing feature vectors
    * for ML consumers; the fitted IDFModel is reusable/persistable. */
  def tfIdfVectors(
      df: DataFrame,
      textCol: String = "text",
      numFeatures: Int = 1 << 18): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, IDF}
    val withTokens = df.withColumn("tokens", tokens(col(textCol)))
    val tfDf = new HashingTF()
      .setInputCol("tokens").setOutputCol("tf_vec").setNumFeatures(numFeatures)
      .transform(withTokens)
    new IDF().setInputCol("tf_vec").setOutputCol("tfidf_vec")
      .fit(tfDf).transform(tfDf)
      .drop("tokens", "tf_vec")
  }

  /** Overlapping token-window chunking — the context-window splitter
    * every RAG / long-doc training pipeline runs before embedding or
    * packing: windows of `window` tokens starting every `stride`
    * tokens (overlap = window − stride), last window partial. Chunk
    * count K+1 with K = ⌈(n − window)/stride⌉ (0 when n ≤ window) —
    * pure integer arithmetic, so the chunk boundaries are
    * oracle-replayable; the emitted md5 of each space-joined chunk pins
    * the actual chunk CONTENT, not just its shape. Narrow
    * select + explode (output rows ≤ n/stride + 1 per doc), no shuffle;
    * at 100 TB this is a scan-speed flatMap. */
  def docChunks(
      df: DataFrame,
      window: Int = 32,
      stride: Int = 24,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val staged = df.select(col(idCol), tokens(col(textCol)).as("t"))
      .withColumn("n", size(col("t")).cast("long"))
    staged
      .withColumn("last_k",
        when(col("n") <= window, lit(0L))
          .otherwise(floor((col("n") - window + (stride - 1)) / stride).cast("long")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("last_k"))))
      .withColumn("chunk", slice(col("t"), (col("chunk_idx") * stride + 1).cast("int"), lit(window)))
      .select(col(idCol), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
  }

  /** Corpus-wide top-`k` tokens by frequency (ties broken by token) —
    * the vocabulary-building / stopword-discovery primitive. Partial
    * (map-side) count aggregation then a bounded global top-k
    * (TakeOrderedAndProject — every partition contributes at most `k`
    * rows, no global sort), the only shape that survives an open web
    * vocabulary. */
  def topTokens(df: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)
  }

  /** BM25 retrieval scoring (Robertson/Okapi, the Lucene idf variant
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`): top documents for a fixed
    * query-term set. Occurrences filter to the query terms BEFORE the
    * first shuffle (the candidate set is |docs|·|terms| bounded, the
    * full posting space never materializes); document frequencies and
    * the corpus length stats are broadcast scalars; the final cut is a
    * TakeOrdered. Per-term components quantize to micro-units
    * (floor(score·1e6)) so the integer per-doc sum is
    * aggregation-order-independent and the oracle replays it exactly —
    * the same ln-ulp discipline as [[tfIdfTopTerms]]. */
  def bm25TopDocs(
      df: DataFrame,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topN: Int = 20,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val d = df.select(col(idCol), tokens(col(textCol)).as("t"))
      .select(col(idCol), size(col("t")).cast("long").as("dl"), col("t"))
    val occ = d
      .select(col(idCol), col("dl"), explode(col("t")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val stats = d.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    bm25ScoreOcc(occ, stats, k1, b, topN, idCol)
  }

  /** Shared BM25 scoring core: `occ` carries one row per (doc, query
    * term) with (idCol, dl, token, tf); `stats` is a one-row frame with
    * (n_docs, sum_dl) over the FULL corpus. Both [[bm25TopDocs]] (scan
    * path) and [[InvertedIndex.bm25Search]] (persisted-postings path)
    * route through this exact expression tree, so the two paths are
    * arithmetic-identical by construction — the driver proves it by
    * giving both declared queries the same oracle SQL. */
  private[text] def bm25ScoreOcc(
      occ: DataFrame,
      stats: DataFrame,
      k1: Double,
      b: Double,
      topN: Int,
      idCol: String): DataFrame = {
    val dft = occ.groupBy("token").agg(count(lit(1)).as("dft"))
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("dft")).cast("double") + lit(0.5)) /
        (col("dft").cast("double") + lit(0.5)))
    val tfNorm = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") + lit(k1) *
        (lit(1.0 - b) + lit(b) * (col("dl").cast("double") /
          (col("sum_dl").cast("double") / col("n_docs").cast("double")))))
    occ
      .join(broadcast(dft), "token")
      .crossJoin(broadcast(stats))
      .withColumn("comp", floor(idf * tfNorm * lit(1e6)).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("comp")).cast("long").as("bm25_micro"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("bm25_micro").desc, col(idCol))
      .limit(topN)
  }

  /** Batched BM25 over ONE probed occurrence set — N query term-sets
    * amortize a single posting probe (the text-side twin of the batch
    * HNSW probe): `queryTerms` (query_id, token) is broadcast, per-token
    * df is computed ONCE from the union-probed occ (a token's df does
    * not depend on which query asked), and each (query, doc) score uses
    * the IDENTICAL idf/tfNorm/floor arithmetic as [[bm25ScoreOcc]] — so
    * every query's rows equal its single-query result bit-for-bit
    * (oracle-proven). Per-query top-N via one bounded window. */
  private[text] def bm25ScoreOccBatch(
      occ: DataFrame,
      queryTerms: DataFrame,
      stats: DataFrame,
      k1: Double,
      b: Double,
      topN: Int): DataFrame = {
    val dft = occ.groupBy("token").agg(count(lit(1)).as("dft"))
    val idf = log(lit(1.0) +
      ((col("n_docs") - col("dft")).cast("double") + lit(0.5)) /
        (col("dft").cast("double") + lit(0.5)))
    val tfNorm = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") + lit(k1) *
        (lit(1.0 - b) + lit(b) * (col("dl").cast("double") /
          (col("sum_dl").cast("double") / col("n_docs").cast("double")))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("bm25_micro").desc, col("doc_id"))
    occ
      .join(broadcast(queryTerms), "token")
      .join(broadcast(dft), "token")
      .crossJoin(broadcast(stats))
      .withColumn("comp", floor(idf * tfNorm * lit(1e6)).cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("comp")).cast("long").as("bm25_micro"),
        count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Token frequency-of-frequency spectrum (the Zipf profile): how many
    * distinct tokens occur exactly c times. Two aggregations, each a
    * massive reduction — wordcount partial-aggregates the hot Zipf head
    * map-side, and the second groupBy runs over |vocabulary| rows, not
    * occurrences. The result is ≤ |distinct counts| rows, bounded and
    * tiny at any corpus size. */
  def tokenFrequencySpectrum(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("occurrences"))
      .groupBy("occurrences").agg(count(lit(1)).as("n_tokens"))
      .orderBy(col("occurrences"))

  /** Windowed PMI collocations (Church & Hanks, CL'90) — the
    * phrase-detection / word-association primitive (word2vec's phrase
    * pass scores bigrams the same way): for ordered token pairs (a, b)
    * with b at distance 1..`window` after a,
    *
    *   pmi = ln( (n_ab/P) / ((n_a/N)·(n_b/N)) ),
    *
    * N = total token occurrences, P = total pair slots, quantized to
    * micro-units (floor(pmi·10⁶), the [[tfIdfTopTerms]] convention —
    * ln can differ by 1 ulp between runtimes; ranking and hashing
    * happen on the integer). Pairs below `minCount` are noise under
    * PMI's low-frequency bias and are cut BEFORE the unigram joins.
    *
    * 100 TB shape: pair generation is MAP-ONLY — `posexplode` + a
    * slice of the following `window` tokens, no self-join — and
    * partial-aggregates map-side, so the shuffle carries distinct
    * (a, b) pairs, not occurrences. The minCount filter runs on the
    * pair aggregate before anything joins; both totals ride 1-row
    * broadcasts; the final cut is a bounded TakeOrdered.
    * `broadcastUnigrams` ships the unigram table to every task (the
    * [[bigramLmScores]] knob) — right when the vocabulary fits in
    * executor memory, and it also pins the join strategy so the
    * executed plan is identical run-to-run instead of flapping at the
    * AQE broadcast threshold; leave false for open-vocabulary text. */
  /** TextRank keyword extraction (Mihalcea & Tarau EMNLP'04): PageRank
    * over the window-co-occurrence token graph, in EXACT integer
    * micro-units so every iteration is order-independent and replays
    * bit-identically in a SQL oracle — float PageRank sums depend on
    * edge-contribution order, exactly the nondeterminism the quantized
    * k-means ([[graft.ops.QuantKMeans]]) dodges the same way.
    *
    * Graph: unordered token pairs co-occurring within `window`
    * (self-loops dropped), kept when their combined count ≥ `minCount`
    * — a VOCAB-BOUNDED edge set (the corpus-sized work is the one
    * co-occurrence aggregation; everything after runs on the bounded
    * graph, the [[pmiPairs]] discipline). Unweighted undirected edges,
    * the paper's keyword configuration.
    *
    * Iteration (damping 0.85, in micro-units):
    *   r'(v) = 150000 + Σ_{u∈N(v)} (r(u)·850000) div (deg(u)·1000000)
    * with floor division — exact int64, every node starts at 10⁶.
    * Each round is one bounded join + groupBy; lineage is cut per
    * round (localCheckpoint) so `iters` never compounds the plan. */
  def textRank(
      df: DataFrame,
      textCol: String = "text",
      window: Int = 3,
      minCount: Long = 5L,
      iters: Int = 5,
      topK: Int = 20): DataFrame = {
    require(iters >= 1 && topK >= 1, s"iters=$iters topK=$topK must be >= 1")
    val toks = df.select(tokens(col(textCol)).as("t"))
    val pairs = toks
      .select(posexplode(col("t")).as(Seq("pos", "a")), col("t"))
      .select(col("a"),
        explode(slice(col("t"), col("pos") + lit(2), lit(window))).as("b"))
      .filter(col("a") =!= col("b"))
    val edges = pairs
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .localCheckpoint()
    val adj = edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
    val deg = adj.groupBy("u").agg(count(lit(1)).as("deg")).localCheckpoint()
    var ranks = deg.select(col("u").as("node"), lit(1000000L).as("r"))
    var it = 0
    while (it < iters) {
      ranks = adj
        .join(ranks.withColumnRenamed("node", "u"), "u")
        .join(deg, "u")
        .select(col("v"), expr("(r * 850000) div (deg * 1000000)").as("c"))
        .groupBy(col("v"))
        .agg((lit(150000L) + sum(col("c"))).as("r"))
        .select(col("v").as("node"), col("r"))
        .localCheckpoint()
      it += 1
    }
    ranks
      .orderBy(col("r").desc, col("node").asc)
      .limit(topK)
      .select(col("node").as("token"), col("r").as("rank_micro"))
  }

  def pmiPairs(
      df: DataFrame,
      textCol: String = "text",
      window: Int = 3,
      minCount: Long = 5L,
      topK: Int = 30,
      broadcastUnigrams: Boolean = false): DataFrame = {
    val toks = df.select(tokens(col(textCol)).as("t"))
    val pairs = toks
      .select(posexplode(col("t")).as(Seq("pos", "a")), col("t"))
      // pos is 0-based, slice is 1-based: tokens after position i
      // start at 1-based index i + 2
      .select(col("a"),
        explode(slice(col("t"), col("pos") + lit(2), lit(window))).as("b"))
    // both aggregates fan into the totals AND the scored join —
    // localCheckpoint so every branch reads the one materialized table
    // (exchange reuse under AQE is timing-dependent, the
    // perplexityBuckets discipline); both are vocab-bounded, already
    // no larger than their own shuffle output
    val pc = pairs.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .localCheckpoint()
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
      .localCheckpoint()
    val totT = uni.agg(sum(col("n_w")).cast("double").as("n_tok"))
    val totP = pc.agg(sum(col("n_ab")).cast("double").as("n_pairs"))
    def uniSide(k: String, n: String): DataFrame = {
      val side = uni.select(col("w").as(k), col("n_w").as(n))
      if (broadcastUnigrams) broadcast(side) else side
    }
    pc.filter(col("n_ab") >= minCount)
      .join(uniSide("a", "n_a"), "a")
      .join(uniSide("b", "n_b"), "b")
      .crossJoin(broadcast(totT))
      .crossJoin(broadcast(totP))
      .withColumn("pmi_micro", floor(log(
        (col("n_ab").cast("double") / col("n_pairs")) /
          ((col("n_a").cast("double") / col("n_tok")) *
            (col("n_b").cast("double") / col("n_tok")))) * lit(1e6)).cast("long"))
      .select(col("a"), col("b"), col("n_ab"), col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Phrase rewrite from learned collocations (the word2vec phrase
    * pass, Mikolov et al. NIPS'13 §4): select the top adjacent-bigram
    * collocations by PMI ([[pmiPairs]] at window 1), then rewrite every
    * document merging each phrase occurrence into a single `a_b` token,
    * greedy left-to-right (a token consumed by one merge is not
    * available to the next — the [[graft.text.Bpe]] fold, keyed by a
    * literal phrase set instead of one pair).
    *
    * The phrase list is a bounded driver artifact (`topK` rows — the
    * BPE argmax discipline); the rewrite is a narrow map over the token
    * array, no shuffle. Output: (id, n_tokens, n_tokens_after,
    * text_md5) — the md5 makes the rewrite byte-checkable. */
  def phraseRewrite(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minCount: Long = 5L,
      topK: Int = 20,
      broadcastUnigrams: Boolean = false): DataFrame =
    phraseRewriteWith(df,
      pmiPairs(df, textCol, window = 1, minCount = minCount,
          topK = topK, broadcastUnigrams = broadcastUnigrams)
        .select("a", "b").collect()
        .map(r => r.getString(0) + " " + r.getString(1)).toSeq,
      idCol, textCol)

  private val phraseSidecar = "_graft_phrases_sidecar.json"

  /** Idempotently persist the learned phrase SET (the [[pmiPairs]]
    * window-1 top-K) at `dir` behind the fingerprint-sidecar protocol
    * ([[graft.io.Artifact.ensure]]) — the IVF/BM25/cluster/Z-order
    * build-once discipline applied to the collocation artifact, so
    * repeat rewrites pay only the narrow fold instead of re-deriving
    * the corpus-wide PMI statistics per invocation. A changed corpus
    * or changed (minCount, topK) forces a re-derive. */
  def ensurePhraseArtifact(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      dir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      minCount: Long = 5L,
      topK: Int = 20,
      broadcastUnigrams: Boolean = false): Unit = {
    val (nRows, dataHash, hashSum) =
      graft.io.Artifact.hashAgg(df, xxhash64(col(idCol), col(textCol)))
    graft.io.Artifact.ensure(dir, phraseSidecar,
      graft.io.Artifact.fingerprintJson(nRows, dataHash,
        "hsum" -> hashSum,
        "textCol" -> textCol, "minCount" -> minCount.toString,
        "topK" -> topK.toString)) {
      pmiPairs(df, textCol, window = 1, minCount = minCount,
          topK = topK, broadcastUnigrams = broadcastUnigrams)
        .select("a", "b")
        .write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** [[phraseRewrite]] against a persisted phrase artifact
    * ([[ensurePhraseArtifact]]): reads the bounded (topK-row) phrase
    * set and runs only the narrow rewrite fold — no PMI re-derivation.
    * The rewrite is a SET-membership fold, so artifact row order is
    * irrelevant. */
  def phraseRewriteWithArtifact(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      dir: String,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    phraseRewriteWith(df,
      spark.read.parquet(s"$dir/data").collect()
        .map(r => r.getString(0) + " " + r.getString(1)).toSeq,
      idCol, textCol)

  /** The narrow rewrite half of [[phraseRewrite]]: merge each
    * occurrence of a learned phrase into a single `a_b` token, greedy
    * left-to-right over the token array (the [[graft.text.Bpe]] fold
    * keyed by a literal phrase set). Map-only; no shuffle. The merge
    * runs as a FUSED codegen kernel
    * ([[org.apache.spark.sql.graft.VectorExpressions.phraseMerge]]):
    * the `aggregate`-HOF form ([[phraseMergeHof]], kept as the
    * bit-compared declarative twin) evaluates its lambda interpreted —
    * O(|phrases|) array_contains + two string concats per token — and
    * was measured at ~2.5 s warm over sf0.1 where the kernel is a
    * single hash-set probe per token. */
  def phraseRewriteWith(
      df: DataFrame,
      phrases: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val merged =
      org.apache.spark.sql.graft.VectorExpressions.phraseMerge(toks, phrases)
    df.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      size(merged).cast("long").as("n_tokens_after"),
      md5(concat_ws(" ", merged)).as("text_md5"))
  }

  /** The declarative twin of the fused phrase-merge kernel — the
    * original `aggregate` fold, kept for the kernel-equivalence spec
    * (and as the readable statement of the semantics). */
  private[graft] def phraseMergeHof(toks: Column, phrases: Seq[String]): Column = {
    val phraseLit = array(phrases.map(lit): _*)
    when(size(toks) <= 1, toks).otherwise(aggregate(
      slice(toks, lit(2), size(toks) - 1),
      array(element_at(toks, 1)),
      (acc, x) => when(
          array_contains(phraseLit,
            concat(element_at(acc, -1), lit(" "), x)),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), lit("_"), x))))
        .otherwise(concat(acc, array(x)))))
  }

  /** Full per-document stats projection used by the `doc_token_stats`
    * declared query. */
  def docStats(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    df.select(
      col(idCol),
      tokenCount(c).as("n_tokens"),
      approxBpeTokenCount(c).as("n_bpe_tokens"),
      length(normalizeText(c)).cast("long").as("n_chars_norm"),
      meanTokenLen(c).as("mean_token_len"),
      uniqueTokenRatio(c).as("unique_ratio"))
  }
}
