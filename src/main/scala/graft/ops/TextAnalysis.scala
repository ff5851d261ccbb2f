package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * token counting, quality scoring, language ID, fingerprinting.
  * All pure Column expressions (whole-stage-codegen'd, no UDFs), so
  * every one of them runs as a narrow map over the scan at any scale.
  */
object TextAnalysis {

  /** Whitespace tokens; empty string -> empty array (not [""]). */
  def tokens(text: Column): Column =
    when(trim(text) === "", array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs, single digits, single
    * non-space symbols — the shape of GPT-2's pre-tokenizer classes.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("\\p{L}+|\\p{N}|[^\\s\\p{L}\\p{N}]"))

  /** PII regex classes — an RE2-safe subset (no backreferences or
    * lookaround) so Java regex (Spark) and RE2 (the DuckDB oracle)
    * agree token for token. The standard pre-training scrub step
    * (emails / phone numbers / IPv4 addresses), applied as narrow
    * codegen'd expressions over the scan.
    */
  val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiPhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val piiIpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-document PII counts plus the redacted text: emails ->
    * `<EMAIL>`, IPv4 -> `<IP>`, phones -> `<PHONE>`. Counts are taken
    * on the ORIGINAL text (independent per class); replacements chain
    * email -> ip -> phone (the classes don't overlap textually, so
    * order only matters defensively). Pure projection — no shuffle,
    * scales as a map over the corpus scan.
    */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      regexp_count(t, lit(piiEmailRe)).as("n_email"),
      regexp_count(t, lit(piiPhoneRe)).as("n_phone"),
      regexp_count(t, lit(piiIpRe)).as("n_ip"),
      regexp_replace(regexp_replace(regexp_replace(t,
          piiEmailRe, "<EMAIL>"),
          piiIpRe, "<IP>"),
          piiPhoneRe, "<PHONE>").as("redacted"))
  }

  /** Token-budget corpus selection: keep documents in descending
    * quality order until the running token total exceeds `budget` —
    * semantically `SUM(n_tokens) OVER (ORDER BY qbin DESC, id) <=
    * budget` with qbin = quality rounded to `binDp` decimals (ranking
    * on the ROUNDED score is the engine's oracle-portability rule, and
    * is what bounds the bin domain).
    *
    * Scale shape: the naive formulation is a GLOBAL sort + running sum
    * — a single-partition window at 100 TB. Instead: (1) one grouped
    * aggregation to per-bin token totals (<= 10^binDp + 1 bins —
    * dimension-sized, collected); (2) the driver walks bins in
    * descending order to find the boundary bin and the budget consumed
    * above it; (3) bins strictly above keep everything, bins below
    * drop everything — pure filters; (4) ONLY the boundary bin's rows
    * (one bin's worth) flow through an exact per-bin cumulative-sum
    * window. Identical output to the global window, no global sort.
    *
    * Degenerate-bin caveat: the boundary bin is one window partition,
    * so a corpus whose quality mass concentrates in a single bin (all
    * docs identical score) degrades toward the global window it
    * replaces; raise `binDp` to split hot bins when a score is known
    * to be coarse.
    */
  def tokenBudgetSelect(df: DataFrame, idCol: String, textCol: String,
                        budget: Long, binDp: Int = 3): DataFrame = {
    val base = df.select(col(idCol),
        round(qualityScore(col(textCol)), 6).as("quality"),
        tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("qbin", round(col("quality"), binDp))
      .cache() // fans into the bin aggregate + both output branches
    val bins = base.groupBy("qbin")
      .agg(sum("n_tokens").as("btok"))
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(-_._1)
    var before = 0L
    var qStar = Double.NaN // boundary bin; NaN = budget never exceeded
    var beforeStar = 0L
    bins.foreach { case (q, btok) =>
      if (qStar.isNaN && before + btok > budget) { qStar = q; beforeStar = before }
      before += btok
    }
    val outCols = Seq(col(idCol), col("quality"), col("n_tokens"))
    if (qStar.isNaN) base.select(outCols :+ lit(1).as("keep"): _*)
    else {
      val rest = base.filter(col("qbin") =!= qStar)
        .select(outCols :+ (col("qbin") > qStar).cast("int").as("keep"): _*)
      val w = Window.partitionBy("qbin").orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val boundary = base.filter(col("qbin") === qStar)
        .withColumn("cum", sum("n_tokens").over(w) + lit(beforeStar))
        .select(outCols :+ (col("cum") <= budget).cast("int").as("keep"): _*)
      rest.unionByName(boundary)
    }
  }

  /** Normalize for fingerprinting: lowercase, strip non-alnum (keeping
    * spaces), collapse whitespace.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text (order-sensitive,
    * whitespace/punctuation-insensitive).
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Rolling polynomial hash over the token sequence (Karp-Rabin
    * flavor): acc = (acc * 31 + h(token)) mod P, P prime < 2^50 so the
    * accumulator never overflows a long. h(token) = first 8 hex digits
    * of md5 as an integer (< 2^32): md5 — unlike xxhash64 — has the
    * same definition in every engine, which makes the whole hash
    * replayable as a DuckDB `list_reduce` and therefore oracle-gated.
    */
  def rollingHash(text: Column): Column = {
    val P = 999999999999989L
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(
        acc * lit(31L) +
          conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("long"),
        lit(P)))
  }

  /** Word n-gram shingles (array of space-joined n-grams). Fewer than n
    * tokens -> single shingle of the whole text.
    *
    * PERFORMANCE: pass a *materialized token column* (an attribute from
    * a previous projection), never an inline `tokens(text)` expression —
    * Catalyst's CollapseProject inlines single-referenced aliases into
    * consumers, and inside a HOF lambda that re-evaluates the split per
    * array element (O(tokens^2) per row in interpreted eval).
    */
  def shinglesOf(toks: Column, n: Int): Column = {
    // zip_with over n shifted slices, not transform+slice: the naive
    // `transform(sequence(...), i => slice(toks, i+1, n))` copies an
    // n-token slice per element — O(tokens * n) array allocations per
    // row in interpreted HOF eval, which dominated the d09/d13/d15
    // profiles. Here each shifted slice is computed once per row and
    // zipped elementwise: O(n) array scans total per row.
    val m = size(toks) - (n - 1)
    val shifted = (0 until n).map(k => slice(toks, lit(k + 1), m))
    when(size(toks) <= n, array(concat_ws(" ", toks)))
      .otherwise(shifted.reduce((a, b) =>
        zip_with(a, b, (x, y) => concat_ws(" ", x, y))))
  }

  def shingles(text: Column, n: Int): Column = shinglesOf(tokens(text), n)

  // --- cleaning / PII masking --------------------------------------------
  // Web-scrape normalization, the first stage of every training-data
  // pipeline: strip markup, mask personally-identifying strings, then
  // canonicalize whitespace. Pure regexp_replace Column chains — narrow,
  // codegen'd, pushdown-friendly, and expressible 1:1 in the DuckDB
  // oracle (patterns kept to the regex subset both engines share).

  /** Replace HTML/XML tags with a space (so adjacent words don't fuse). */
  def stripHtml(text: Column): Column =
    regexp_replace(text, "<[^>]+>", " ")

  /** Mask email addresses with a typed placeholder. */
  def maskEmails(text: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", token)

  /** Mask http(s) URLs with a typed placeholder. */
  def maskUrls(text: Column, token: String = "<URL>"): Column =
    regexp_replace(text, "https?://[^\\s]+", token)

  /** Collapse runs of whitespace and trim. */
  def collapseWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Full cleaning chain: tags out, emails/URLs masked, whitespace
    * canonical. Order matters: URLs before emails would leave
    * `user@host` fragments of stripped URLs unmasked, so emails go
    * first only if URLs can't contain them — they can (userinfo), so
    * URLs are masked first, then emails.
    */
  def cleanText(text: Column): Column =
    collapseWhitespace(maskEmails(maskUrls(stripHtml(text))))

  // --- deterministic sampling / splits -----------------------------------

  /** Uniform-in-[0,1) derived from md5 of the id (+ salt): the
    * partitioning- and retry-invariant alternative to `rand()` for
    * corpus subsampling — the same row always draws the same value on
    * any cluster, any task retry, any engine (md5 is engine-portable,
    * so the draw replays exactly in the DuckDB oracle; xxhash64 would
    * not). First 8 hex digits -> 32-bit int -> /2^32.
    */
  def hashUniform(id: Column, salt: String = ""): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))
      .cast("binary")), 1, 8), 16, 10).cast("double") / lit(4294967296.0)

  /** Deterministic train/val/test assignment by hash range (e.g.
    * 0.8/0.1/0.1). Stable under re-runs and data re-partitioning —
    * every engine computing the same md5 agrees on every row's split.
    */
  def splitAssign(id: Column, trainFrac: Double = 0.8,
                  valFrac: Double = 0.1, salt: String = ""): Column = {
    val u = hashUniform(id, salt)
    when(u < trainFrac, "train")
      .when(u < trainFrac + valFrac, "val")
      .otherwise("test")
  }

  /** Deterministic source-weighted corpus mixing: given a per-stratum
    * weight and a total document budget, compute each stratum's target
    * count (floor(share * budget), capped at the stratum size), turn
    * it into an acceptance rate, and keep rows whose [[hashUniform]]
    * draw clears it — the "sampling weights per source" operation of
    * LLM corpus mixes, deterministic under retries and repartitioning
    * because the draw is content-keyed, not `rand()`.
    *
    * Scale shape: the per-stratum stats are one map-side-combinable
    * groupBy producing #strata rows; rates come back via a broadcast
    * join, and the keep decision is a narrow filter over the scan — no
    * wide shuffle of the corpus at any size. Rates are k/2^32 hash
    * comparisons, so the realized count concentrates on the target
    * (binomial) without requiring a per-stratum global sort, which is
    * what an exact-k variant would cost.
    */
  def weightedStratifiedSample(df: DataFrame, idCol: String,
                               strataCol: String, weight: Column,
                               totalBudget: Long,
                               salt: String = "mix"): DataFrame = {
    val stats = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), max(weight).as("w"))
    val tot = stats.agg(sum(col("w")).as("w_tot"))
    val rates = stats.crossJoin(broadcast(tot))
      .withColumn("n_target",
        least(floor(col("w") / col("w_tot") * totalBudget), col("n_docs")))
      .withColumn("rate", col("n_target").cast("double") / col("n_docs"))
      .select(col(strataCol), col("n_target"), col("rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .withColumn("keep", hashUniform(col(idCol), salt) < col("rate"))
  }

  /** Deterministic EXACT-k stratified sample: within each stratum keep
    * the `k` rows with the smallest content-keyed [[hashUniform]] draw
    * (ties by id) — the exact-count companion to the rate-based
    * [[weightedStratifiedSample]], for when a mix spec demands "exactly
    * k docs per source", reproducibly, on any cluster.
    *
    * Scale shape: a naive per-stratum window sorts EVERY stratum's full
    * row set (single task per hot stratum). Here a count-join prefilter
    * keeps only rows with u <= overSample*k/n per stratum, so the
    * window sorts ~overSample*k rows per stratum regardless of stratum
    * size. The prefilter is made EXACT, not whp: a per-stratum
    * candidate count check catches any stratum left short (Chernoff
    * probability < 1e-13 at overSample=8, k>=10) and reprocesses just
    * those strata without the prefilter, warning on stderr.
    */
  def stratifiedExactK(df: DataFrame, idCol: String, strataCol: String,
                       k: Int, salt: String = "exactk",
                       overSample: Double = 8.0): DataFrame = {
    val withU = df.withColumn("__u", hashUniform(col(idCol), salt))
    val counts = withU.groupBy(strataCol).agg(count(lit(1)).as("__n"))
    val joined = withU.join(counts, Seq(strataCol))
    val cand = joined.filter(
      col("__u") <= least(lit(1.0), lit(k * overSample) / col("__n")))
    // completeness gate (dimension-sized: one row per stratum)
    val short = cand.groupBy(strataCol).agg(count(lit(1)).as("__c"))
      .join(counts, Seq(strataCol))
      .filter(col("__c") < least(lit(k.toLong), col("__n")))
      .select(strataCol).collect().map(_.get(0))
    val base =
      if (short.isEmpty) cand
      else {
        System.err.println(
          s"[graft.TextAnalysis] stratifiedExactK: ${short.length} " +
            "strata under-sampled by the prefilter (astronomically " +
            "unlikely); reprocessing them unfiltered")
        cand.filter(!col(strataCol).isin(short: _*))
          .unionByName(joined.filter(col(strataCol).isin(short: _*)))
      }
    base
      .withColumn("rk", row_number().over(Window.partitionBy(strataCol)
        .orderBy(col("__u"), col(idCol))))
      .filter(col("rk") <= k)
      .drop("__u", "__n")
  }

  // --- sequence packing --------------------------------------------------

  /** Concat-and-chunk sequence packing — the step that turns a curated
    * corpus into fixed-length LM training rows (GPT-style packing:
    * documents are laid end-to-end in a deterministic order and cut
    * every `capacity` tokens, so a document may straddle a pack
    * boundary). Emits each document's pack-stream coordinates: shard,
    * the token offset where it starts, and the first/last pack
    * (training-sequence index) it occupies.
    *
    * Scale shape: packing needs a total order — inherently sequential —
    * so the corpus is first split into `shards` independent pack
    * streams by a content-keyed [[hashUniform]] (deterministic under
    * retries and repartitioning, and md5-portable so the oracle replays
    * the assignment), and the cumulative token count is a window per
    * shard ordered by id. One shuffle keyed by shard; pick `shards` so
    * one stream's rows fit a task's window sort (10^4-10^5 at 100 TB —
    * streams are independent, so the shard count changes nothing but
    * the parallelism and pack numbering).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    capacity: Int, shards: Int,
                    salt: String = "pack"): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol).as("id"), tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("shard",
        floor(hashUniform(col("id"), salt) * shards).cast("int"))
      .withColumn("tok_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // a document ending exactly on a boundary stays in its last pack
      // (offset + n - 1); an empty doc occupies its offset's pack
      .withColumn("pack_first",
        floor(col("tok_offset") / lit(capacity.toDouble)).cast("long"))
      .withColumn("pack_last",
        floor((col("tok_offset") + greatest(col("n_tokens"), lit(1L)) - 1)
          / lit(capacity.toDouble)).cast("long"))
      .select(col("id").as(idCol), col("shard"), col("n_tokens"),
        col("tok_offset"), col("pack_first"), col("pack_last"))
  }

  // --- quality scoring ---------------------------------------------------

  val enStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "are", "was", "it", "that", "for", "on", "with", "as")

  def stopwordRatioOf(tk: Column,
                      stopwords: Seq[String] = enStopwords): Column =
    when(size(tk) === 0, 0.0)
      .otherwise(size(filter(tk, t => t.isin(stopwords: _*)))
        .cast("double") / size(tk))

  def stopwordRatio(text: Column,
                    stopwords: Seq[String] = enStopwords): Column =
    stopwordRatioOf(tokens(text), stopwords)

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(regexp_count(text, lit("[^\\p{L}\\p{N}\\s]")).cast("double")
        / length(text))

  /** 1 - distinct/total tokens: high for boilerplate repetition. */
  def repetitionRatioOf(tk: Column): Column =
    when(size(tk) === 0, 0.0)
      .otherwise(lit(1.0) -
        size(array_distinct(tk)).cast("double") / size(tk))

  def repetitionRatio(text: Column): Column =
    repetitionRatioOf(tokens(text))

  /** Composite quality in [0,1]: stopword presence, lexical diversity,
    * length saturation, low punctuation noise — the standard cheap
    * pre-filter shape for LLM corpus curation (e.g., Gopher rules).
    * Token-column variant: pass a materialized token attribute.
    */
  def qualityScoreOf(tk: Column, text: Column): Column = {
    val lenScore = least(size(tk).cast("double") / 100.0, lit(1.0))
    lit(0.25) * least(stopwordRatioOf(tk) * 4.0, lit(1.0)) +
      lit(0.25) * (lit(1.0) - repetitionRatioOf(tk)) +
      lit(0.25) * lenScore +
      lit(0.25) * (lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0)))
  }

  def qualityScore(text: Column): Column =
    qualityScoreOf(tokens(text), text)

  /** Unigram-LM negative log-likelihood per document — the cheap
    * in-engine stand-in for the KenLM-perplexity quality filter of
    * CCNet-style pipelines: fit an add-one-smoothed unigram model on
    * the corpus itself, then score each document by the average
    * negative log-probability of its tokens (high = far from the
    * corpus distribution = boilerplate/noise/outlier language).
    *
    * p(t) = (c(t) + 1) / (T + V), avg_nll = mean over the doc's token
    * OCCURRENCES of -ln p(t). Returns (id, n_tokens, avg_nll);
    * avg_nll is null for empty documents.
    *
    * Scale shape: one map-side-combinable groupBy for the vocabulary,
    * a two-scalar global total broadcast, one shuffle join of the
    * exploded token stream against the vocabulary (both sides keyed by
    * term — zipfian-hot terms are probe-side only, streaming through a
    * hash lookup), and one per-doc aggregate. No corpus-sized
    * broadcast, no driver-side model state.
    */
  def unigramNll(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // cached: the exploded token stream feeds both the vocabulary
    // groupBy and the scoring join — uncached, the corpus tokenizes
    // twice (same multi-branch shape as repetitionSignals' base)
    val terms = df
      .select(col(idCol).as("id"), tokens(lower(col(textCol))).as("toks"))
      .select(col("id"), explode(col("toks")).as("term"))
      .cache()
    val vocab = terms.groupBy("term").agg(count(lit(1)).as("tc"))
    val tot = vocab.agg(sum("tc").as("t_tokens"),
      count(lit(1)).as("v_size"))
    val scored = terms.join(vocab, Seq("term"))
      .crossJoin(broadcast(tot))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        avg(-log((col("tc") + 1).cast("double") /
          (col("t_tokens") + col("v_size")))).as("avg_nll"))
    df.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("avg_nll"))
  }

  /** Bigram-LM perplexity proxy — the next-order CCNet-style quality
    * filter above [[unigramNll]]: fit add-one-smoothed bigram
    * transition probabilities on the corpus itself and score each doc
    * by the mean −ln p(w2|w1) over its bigram occurrences, with
    *
    *   p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)
    *
    * (c = corpus occurrence counts, V = unigram vocabulary size).
    * Repetitive/boilerplate docs score low (their transitions dominate
    * the model), incoherent or off-distribution docs score high —
    * unlike the unigram score, word ORDER now matters. Docs with
    * fewer than 2 tokens have no bigrams: n_bigrams = 0, avg_nll null.
    *
    * Scale shape mirrors unigramNll one order up: the cached
    * (tokens, bigrams) projection feeds the unigram-count groupBy, the
    * bigram-count groupBy, and the scoring join; both model joins are
    * term-keyed shuffles (zipfian-hot contexts stream through the
    * probe side), the vocabulary size is a broadcast scalar, and the
    * final aggregate is doc-keyed. No corpus-sized broadcast, no
    * driver-side model state.
    */
  def bigramNll(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df
      .select(col(idCol).as("id"), tokens(lower(col(textCol))).as("toks"))
      .select(col("id"), col("toks"),
        // shinglesOf degenerates to whole-text for short docs; a
        // 1-token doc is not a bigram, so gate on size >= 2 (size == 2
        // yields exactly the one true bigram)
        when(size(col("toks")) >= 2, shinglesOf(col("toks"), 2))
          .otherwise(array().cast("array<string>")).as("bgs"))
      .cache()
    val c1 = base.select(explode(col("toks")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c1"))
    val vs = c1.agg(count(lit(1)).as("v_size"))
    val bg = base.select(col("id"), explode(col("bgs")).as("bg"))
      // tokens never contain whitespace, so the context word is
      // recoverable from the space-joined shingle
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    val c2 = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
    val scored = bg.join(c2, Seq("bg"))
      .join(c1.withColumnRenamed("term", "w1"), Seq("w1"))
      .crossJoin(broadcast(vs))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        avg(-log((col("c2") + 1).cast("double")
          / (col("c1") + col("v_size")))).as("avg_nll"))
    df.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_nll"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020,
    * arXiv:1911.00359): score each document by LM perplexity (here the
    * [[bigramNll]] proxy), then split each language into `k`
    * equal-count tiers — head/middle/tail for k=3 — so downstream
    * curation can weight or drop tiers per language. Unscorable docs
    * (< 2 tokens, no bigrams) are excluded, as in CCNet.
    *
    * Semantics are EXACTLY `ntile(k) OVER (PARTITION BY lang ORDER BY
    * round(nll,4), id)`, but computed without a per-language window
    * sort — a naive ntile puts an entire language in one task, and at
    * 100 TB a corpus is usually dominated by one language. Instead:
    *
    *   1. aggregate the (lang, rounded-nll) VALUE DISTRIBUTION — a
    *      domain bounded by distinct 4-decimal scores, not by corpus
    *      size — and take a running sum over those aggregated rows
    *      (the only window over a whole language runs on the compact
    *      distribution, not the docs);
    *   2. rank(doc) = docs strictly below its score (broadcast-joined
    *      from 1) + its row_number within the (lang, score) TIE GROUP
    *      (a window partitioned by tie group — hot only if one exact
    *      rounded score dominates a language);
    *   3. bucket via ntile's integer arithmetic on (rank, n, k).
    *
    * Every step is integer/rounded arithmetic, so the DuckDB oracle can
    * check it against its NATIVE ntile — the distributed formulation is
    * hash-proven equal to the textbook window function.
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                        langCol: String, k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val scored = bigramNll(df, idCol, textCol)
      .filter(col("n_bigrams") >= 1)
      .join(df.select(col(idCol), col(langCol)), Seq(idCol))
      .select(col(idCol), col(langCol).as("lang"),
        round(col("avg_nll"), 4).as("nll"))
    // (1) compact value distribution + running count below each score
    val dist = scored.groupBy("lang", "nll").agg(count(lit(1)).as("c"))
    val wLang = Window.partitionBy("lang").orderBy("nll")
    val cum = dist
      .withColumn("below", coalesce(sum(col("c")).over(
        wLang.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_lang", sum(col("c")).over(
        Window.partitionBy("lang")))
      .select(col("lang"), col("nll"), col("below"), col("n_lang"))
    // (2) exact rank = strictly-below + position within the tie group
    val wTie = Window.partitionBy("lang", "nll").orderBy(idCol)
    val ranked = scored.join(cum, Seq("lang", "nll"))
      .withColumn("rank", col("below") + row_number().over(wTie))
    // (3) ntile arithmetic: first (n % k) buckets get (n div k)+1 rows.
    // `div` (exact integer division) throughout — Column `/` is double
    // division and would not replay exactly in the oracle
    ranked
      .withColumn("q", expr(s"n_lang div $k"))
      .withColumn("r", expr(s"n_lang % $k"))
      .withColumn("big", (col("q") + 1) * col("r"))
      .withColumn("bucket",
        when(col("rank") <= col("big"),
          expr("(rank - 1) div (q + 1) + 1"))
        .otherwise(expr("r + (rank - big - 1) div q + 1")).cast("int"))
      .select(col(idCol), col("lang"), col("nll"), col("bucket"))
  }

  /** DSIR-style data selection via importance resampling (Xie et al.
    * 2023, arXiv:2302.03169): score every RAW-pool document by how much
    * more likely its tokens are under a TARGET-corpus unigram model
    * than under the raw-pool model, then Gumbel-top-k sample on the
    * weight — equivalent to sampling without replacement with
    * probability ∝ exp(llr), so selection is importance RESAMPLING,
    * not a hard threshold. Both models are add-one-smoothed over the
    * JOINT vocabulary (same support, so no ratio is ever 0/∞):
    *
    *   llr(doc) = Σ_occurrences [ln p_t(term) − ln p_r(term)]
    *   key(doc) = round(llr + Gumbel(hashUniform(id, salt)), 4)
    *
    * The Gumbel draw is content-keyed md5 (partitioning/retry
    * invariant and replayable by any engine); ranking happens on the
    * ROUNDED key with doc-id tie-break, so float noise can't reorder
    * engines. Returns the k selected docs as (rk, id, n_tokens, llr).
    *
    * Scale shape: one cached token explode feeds (a) the joint
    * vocabulary groupBy carrying per-model counts side by side and
    * (b) the scoring join — term-keyed, zipfian-hot terms stream
    * through the probe side; then ONE doc-keyed aggregate and a
    * TakeOrdered top-k (never a global sort). The final rank window
    * orders k rows — bounded by construction. Empty raw docs score
    * llr = 0 and still compete on their Gumbel draw (they are valid
    * resampling candidates, as in the paper).
    */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, k: Int,
                 salt: String = "dsir"): DataFrame = {
    val terms = df
      .select(col(idCol).as("id"), isTarget.as("is_t"),
        tokens(lower(col(textCol))).as("toks"))
      .select(col("id"), col("is_t"), explode(col("toks")).as("term"))
      .cache() // feeds the vocabulary groupBy AND the scoring join
    val vocab = terms.groupBy("term").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("cr"))
    val tot = vocab.agg(sum("ct").as("tt"), sum("cr").as("tr"),
      count(lit(1)).as("vs"))
    val scored = terms.filter(!col("is_t"))
      .join(vocab, Seq("term"))
      .crossJoin(broadcast(tot))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(log((col("ct") + 1).cast("double") / (col("tt") + col("vs")))
          - log((col("cr") + 1).cast("double") / (col("tr") + col("vs"))))
          .as("llr"))
    // (h + 0.5)/2^32 ∈ (0,1) strictly — ln never sees 0 — and both
    // terms are exact powers-of-two arithmetic, identical everywhere
    val u = hashUniform(col("id"), salt) + lit(0.5 / 4294967296.0)
    val g = -log(-log(u))
    val top = df.filter(!isTarget).select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("llr"), lit(0.0)).as("llr"))
      .withColumn("__key", round(col("llr") + g, 4))
      .orderBy(col("__key").desc, col("id"))
      .limit(k)
    top.withColumn("rk",
        row_number().over(Window.orderBy(col("__key").desc, col("id"))))
      .select(col("rk"), col("id").as(idCol), col("n_tokens"),
        round(col("llr"), 4).as("llr"))
  }

  /** Multinomial Naive-Bayes document classification against the
    * corpus's own label column — the model-based curation primitive
    * behind domain/quality classifier filters (the fastText-classifier
    * shape of GPT-3's WebText filter and DCLM/fineweb-style quality
    * routing, reduced to the closed-form member of the family so the
    * whole train-and-score pipeline is one SQL-replayable pass, no
    * iterative optimizer).
    *
    * Model: add-one-smoothed multinomial NB over lowercase whitespace
    * tokens. score(d,c) = ln(N_c/N) + Σ_t cnt_dt · ln((cc_tc+1)/(tok_c+V));
    * prediction = argmax_c on the 4dp-ROUNDED score with class-name
    * tie-break, so a last-ulp ln() divergence between engines cannot
    * flip a prediction (the d17/d30 rank rule).
    *
    * Scale shape: tf and class counts are term-keyed groupBys; the
    * scoring join fans each DISTINCT (doc, term) row out by
    * |classes| (a bounded constant) and joins class counts by
    * (term, class) — term-keyed shuffles only, the corpus text never
    * moves after tokenization, and the class/prior/vocab tables are
    * dimension-sized broadcasts. Docs with zero tokens produce no
    * rows (no tf entry on either engine).
    *
    * Returns one row per nonempty doc: (idCol, labelCol, predicted,
    * score) with score = the winning class's rounded log-posterior.
    */
  def nbClassify(df: DataFrame, idCol: String, textCol: String,
                 labelCol: String): DataFrame = {
    val tf = df
      .select(col(idCol).as("id"), col(labelCol).as("lab"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("id", "lab", "term").agg(count(lit(1)).as("cnt"))
      .cache() // feeds the class model AND the scoring join
    val cls = df.groupBy(col(labelCol).as("c"))
      .agg(count(lit(1)).cast("double").as("nd"))
    val nTot = df.agg(count(lit(1)).cast("double").as("nn"))
    val cc = tf.groupBy(col("term"), col("lab").as("c"))
      .agg(sum("cnt").as("ccnt"))
    val tokc = cc.groupBy("c").agg(sum("ccnt").as("tok_c"))
    val vocab = cc.select("term").distinct().agg(count(lit(1)).as("v"))
    val prior = cls.crossJoin(broadcast(nTot))
      .select(col("c"), log(col("nd") / col("nn")).as("lp"))
    val cand = tf.crossJoin(broadcast(cls.select("c")))
      .join(cc, Seq("term", "c"), "left")
      .join(broadcast(tokc), Seq("c"))
      .crossJoin(broadcast(vocab))
      .groupBy("id", "lab", "c")
      .agg(sum(col("cnt")
        * log((coalesce(col("ccnt"), lit(0L)) + 1).cast("double")
          / (col("tok_c") + col("v")))).as("ll"))
    cand.join(broadcast(prior), Seq("c"))
      .select(col("id"), col("lab"),
        col("c"), round(col("ll") + col("lp"), 4).as("score"))
      .groupBy("id", "lab")
      .agg(min(struct((-col("score")).as("ns"), col("c"))).as("best"))
      .select(col("id").as(idCol), col("lab").as(labelCol),
        col("best.c").as("predicted"), (-col("best.ns")).as("score"))
  }

  // --- Gopher-style repetition signals -----------------------------------

  /** Per-document repetition quality signals in the shape of the Gopher
    * corpus-filtering rules (Rae et al. 2021, arXiv:2112.11446 §A1.1),
    * adapted to token n-grams (the harness corpus has no line
    * structure):
    *
    *   - `top2_frac`: characters covered by occurrences of the most
    *     frequent word bigram / total token characters (ties broken by
    *     lexicographically smallest bigram);
    *   - `dup3_frac`: characters inside duplicated (count >= 2) word
    *     trigrams / total token characters;
    *   - `max_run`: longest run of consecutive identical tokens;
    *   - `keep`: all three signals under their thresholds.
    *
    * Scale shape: one narrow tokenize/shingle projection (cached — it
    * feeds three aggregates), two (doc, gram) groupBys with map-side
    * partial aggregation, one per-doc window over distinct-bigram
    * counts (bounded by tokens-per-doc, never corpus-sized), and a
    * gaps-and-islands window for runs. All shuffles are keyed by doc
    * id (+ gram), so the plan partitions evenly at any corpus size.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
                        maxTop2: Double = 0.10, maxDup3: Double = 0.15,
                        maxRun: Int = 3): DataFrame = {
    val base = df
      .select(col(idCol).as("id"), tokens(lower(col(textCol))).as("toks"))
      .select(col("id"), col("toks"),
        length(concat_ws(" ", col("toks"))).as("doc_chars"),
        shinglesOf(col("toks"), 2).as("bg"),
        shinglesOf(col("toks"), 3).as("tg"))
      .cache()
    def charFrac(chars: Column): Column =
      when(col("doc_chars") === 0, 0.0)
        .otherwise(chars.cast("double") / col("doc_chars"))
    val bgc = base
      .select(col("id"), col("doc_chars"), explode(col("bg")).as("g"))
      .groupBy("id", "doc_chars", "g").agg(count(lit(1)).as("cnt"))
    val wTop = Window.partitionBy("id").orderBy(col("cnt").desc, col("g"))
    val top = bgc.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("id"),
        round(charFrac(col("cnt") * length(col("g"))), 6).as("top2_frac"))
    val dup = base
      .select(col("id"), col("doc_chars"), explode(col("tg")).as("g"))
      .groupBy("id", "doc_chars", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("id", "doc_chars")
      .agg(sum(when(col("cnt") >= 2, col("cnt") * length(col("g")))
        .otherwise(0L)).as("dupchars"))
      .select(col("id"), round(charFrac(col("dupchars")), 6).as("dup3_frac"))
    val pos = base.select(col("id"),
      posexplode(col("toks")).as(Seq("i", "t")))
    val wRun = Window.partitionBy("id", "t").orderBy("i")
    val runs = pos.withColumn("grp", col("i") - row_number().over(wRun))
      .groupBy("id", "t", "grp").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max("c").as("max_run"))
    top.join(dup, Seq("id"))
      .join(runs, Seq("id"), "left")
      .withColumn("max_run", coalesce(col("max_run"), lit(0L)))
      .withColumn("keep",
        col("top2_frac") <= maxTop2 && col("dup3_frac") <= maxDup3 &&
          col("max_run") <= maxRun)
      .select(col("id").as(idCol), col("top2_frac"), col("dup3_frac"),
        col("max_run"), col("keep"))
  }

  // --- language identification ------------------------------------------

  /** Stopword banks (public-knowledge high-frequency function words). */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it",
      "for", "was", "with", "are", "this", "have"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein",
      "ich", "auf", "sie", "den", "von", "zu", "im"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por",
      "los", "del", "las", "una", "con", "para"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est",
      "que", "dans", "pour", "qui", "sur", "pas"))

  /** CJK coverage is char-based, not token-based. */
  private def zhScore(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(regexp_count(text, lit("[\\p{IsHan}]")).cast("double")
        / length(text))

  /** Per-language scores from a materialized lowercase token column. */
  def langScoresOf(tk: Column, text: Column): Map[String, Column] = {
    val tokenScores = langStopwords.map { case (lang, sw) =>
      lang -> when(size(tk) === 0, 0.0)
        .otherwise(size(filter(tk, t => t.isin(sw: _*))).cast("double")
          / size(tk))
    }
    tokenScores + ("zh" -> zhScore(text))
  }

  def langScores(text: Column): Map[String, Column] =
    langScoresOf(tokens(lower(text)), text)

  /** Argmax language with deterministic tie-break (lexicographic) and an
    * "und" floor when no signal clears `minScore`.
    */
  def langIdOf(tk: Column, text: Column, minScore: Double = 0.05): Column = {
    val scores = langScoresOf(tk, text).toSeq.sortBy(_._1)
    val best = scores.map { case (l, s) => struct(s.as("s"), lit(l).as("l")) }
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    when(best.getField("s") < minScore, "und").otherwise(best.getField("l"))
  }

  def langId(text: Column, minScore: Double = 0.05): Column =
    langIdOf(tokens(lower(text)), text, minScore)

  // --- winnowing fingerprints --------------------------------------------

  /** Winnowed document fingerprints (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003 — the MOSS scheme): hash every k-token shingle, then
    * keep the MINIMUM hash of each w-window of consecutive shingle
    * hashes. Guarantees: any shared run of >= w+k-1 tokens yields a
    * shared fingerprint (no false negatives for long matches), and
    * ~2/(w+1) of positions are selected — a tunable, edit-robust
    * sample, unlike [[fingerprint]]'s all-or-nothing whole-doc hash.
    *
    * Returns one (id, print) row per DISTINCT selected hash. Pure
    * column machinery: the window minima ride the same
    * zip_with-over-shifted-slices chain as [[shinglesOf]] (O(w) array
    * scans per row, no per-element slice copies), and the md5-derived
    * hash is the d06 idiom — every step replays in DuckDB, so joins
    * built on these prints stay oracle-gated.
    */
  def winnowedPrints(df: DataFrame, idCol: String, textCol: String,
                     k: Int, w: Int): DataFrame = {
    val hashed = df
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), shinglesOf(col("toks"), k).as("sh"))
      .select(col(idCol), transform(col("sh"), s =>
        conv(substring(md5(s), 1, 8), 16, 10).cast("long")).as("h"))
    val len = size(col("h"))
    val m = len - lit(w - 1)
    val shifted = (0 until w).map(j => slice(col("h"), lit(j + 1), m))
    val mins = shifted.reduce((a, b) => zip_with(a, b, (x, y) => least(x, y)))
    hashed.select(col(idCol),
        explode(when(len <= w, array(array_min(col("h"))))
          .otherwise(array_distinct(mins))).as("print"))
  }

  // --- BPE merge induction -----------------------------------------------

  /** Apply [[bpeMerges]]' learned merge table to the corpus and
    * measure the segmentation: per `groupCol`, words, raw symbols
    * (characters), post-merge symbols, and the compression ratio —
    * "how much does this tokenizer shrink this slice" is the
    * acceptance metric of tokenizer induction.
    *
    * Scale shape: merges apply at the VOCABULARY grain (distinct word
    * → post-merge symbol count, the same collapse as training), then
    * one broadcast join puts per-word counts back on the exploded
    * corpus stream — the corpus is scanned once and never carries
    * symbol strings.
    */
  def bpeSegmentStats(df: DataFrame, textCol: String, groupCol: String,
                      steps: Int): DataFrame = {
    val merges = bpeMergeTable(df, textCol, steps)
      .sortBy(_._1).map(m => (m._2, m._3))
    val vocab = df
      .select(explode(tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "").distinct()
      .withColumn("sym", concat(lit(" "),
        concat_ws("  ",
          filter(split(col("word"), ""), x => x =!= lit(""))),
        lit(" ")))
    val merged = merges.foldLeft(vocab) { case (acc, (u, v)) =>
      acc.withColumn("sym",
        replace(col("sym"), lit(s" $u  $v "), lit(s" $u$v ")))
    }
    val counts = merged.select(col("word"),
      length(col("word")).cast("long").as("n_chars"),
      size(split(trim(col("sym")), "  ")).cast("long").as("n_syms"))
    df.select(col(groupCol),
        explode(tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(counts), "word")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_words"),
        sum("n_chars").as("n_chars"),
        sum("n_syms").as("n_syms"))
      .select(col(groupCol), col("n_words"), col("n_chars"),
        col("n_syms"),
        round(col("n_chars") / col("n_syms").cast("double"), 4)
          .as("compression"))
      .orderBy(groupCol)
  }

  /** First `steps` byte-pair-encoding merges over the corpus (Sennrich,
    * Haddow & Birch, "Neural Machine Translation of Rare Words with
    * Subword Units", ACL 2016 — the tokenizer-induction primitive of
    * every modern LM pipeline): per step, the most frequent adjacent
    * symbol pair (ties broken lexicographically) is fused corpus-wide
    * and counting repeats on the fused sequences.
    *
    * Scale shape: the corpus collapses to a (word, freq) VOCABULARY
    * table in one map-side-combined groupBy — every subsequent pass
    * (pair count, fuse) runs over vocab-sized data, never the corpus
    * again (the original algorithm's core trick, here as cached
    * DataFrame state). The per-step driver round-trip is ONE argmax
    * row off a partial-aggregated count — bounded regardless of SF.
    *
    * Symbol sequences ride a TWO-space-joined, single-space-padded
    * string (" h  i " for "hi"): each symbol owns
    * an unshared flanking space on both sides, so one left-to-right
    * non-overlapping `replace` of " u  v " fuses EVERY occurrence —
    * including adjacent repeats ("a a a a" → "aa aa", the correct BPE
    * greedy scan) — and can never match inside a multi-char symbol.
    * The same replace semantics hold in DuckDB, which is what makes
    * the whole iteration SQL-replayable for the oracle.
    */
  def bpeMerges(df: DataFrame, textCol: String, steps: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeMergeTable(df, textCol, steps)
      .map { case (step, u, v, cnt) => (step, s"$u+$v", cnt) }
      .toDF("step", "pair", "cnt")
  }

  /** [[bpeMerges]]' driver-side merge list with the pair kept split —
    * for appliers that must not re-parse the joined label.
    */
  def bpeMergeTable(df: DataFrame, textCol: String,
                    steps: Int): Seq[(Int, String, String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val wf = df.select(explode(tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // split(word, "") keeps a trailing "" (limit -1); drop empties so
      // no phantom symbol enters the sequence
      .select(concat(lit(" "),
          concat_ws("  ",
            filter(split(col("word"), ""), x => x =!= lit(""))),
          lit(" ")).as("sym"),
        col("freq"))
    var s = wf.cache()
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      var step = 1
      while (step <= steps) {
        val pairs = s
          .select(split(trim(col("sym")), "  ").as("a"), col("freq"))
          .select(explode(zip_with(
            slice(col("a"), lit(1), size(col("a")) - 1),
            slice(col("a"), lit(2), size(col("a")) - 1),
            (u, v) => struct(u.as("u"), v.as("v")))).as("p"), col("freq"))
          .groupBy(col("p.u").as("u"), col("p.v").as("v"))
          .agg(sum("freq").as("cnt"))
        val top = pairs.orderBy(col("cnt").desc, col("u"), col("v"))
          .limit(1).as[(String, String, Long)].collect()
        if (top.isEmpty) { step = steps + 1 }
        else {
          val (u, v, cnt): (String, String, Long) = top.head
          out += ((step, u, v, cnt))
          val next = s.select(
            replace(col("sym"), lit(s" $u  $v "), lit(s" $u$v "))
              .as("sym"), col("freq")).cache()
          s.unpersist(blocking = false)
          s = next
          step += 1
        }
      }
    } finally s.unpersist(blocking = false)
    out.toSeq
  }
}
