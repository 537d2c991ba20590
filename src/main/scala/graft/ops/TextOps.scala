package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables._

/** Text / LLM-data-pipeline operators over `documents` (SURVEY.md §2.I).
  * Tokenization is `split(text, ' ')` — the corpus is space-separated
  * lowercase tokens with no punctuation (FIXTURES.md).
  *
  * Scale: explode(split) is the canonical map-reduce flatMap; at 100 TB the
  * token stream shuffles once for the groupBy with map-side combine, which
  * is the textbook wordcount plan. */
object TextOps {

  private def tokens(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))

  /** flatMap: one-to-many tokenize (the framework's flatMap verb). */
  def flatmapExplode(s: SparkSession, d: String): DataFrame =
    tokens(s, d).orderBy("doc_id", "token")

  /** Positional flatMap (posexplode): token with its 0-based offset —
    * the generator variant that keeps provenance, needed whenever
    * downstream ops are position-sensitive (n-grams, span labeling). */
  def flatmapPosexplode(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
              posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
      .orderBy("doc_id", "pos")

  /** Canonical map-reduce word count, top-20. The flagship `entry` query. */
  def textWordcount(s: SparkSession, d: String): DataFrame =
    tokens(s, d)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(20)

  /** Corpus stats per (lang, source): doc counts, avg chars, avg tokens. */
  def textStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("n_chars")), 2).as("avg_chars_r"),
           round(avg(size(split(col("text"), " "))), 2).as("avg_tokens_r"))
      .orderBy("lang", "source")

  /** Bigram counts, top-30. Bigrams are built inside the token array with a
    * positional transform (no per-token explode → self-join — that shape
    * shuffles the whole token stream twice at scale). */
  def textNgrams(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(explode(expr(
        "transform(slice(toks, 1, size(toks) - 1), (x, i) -> concat(x, ' ', toks[i + 1]))"))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram").asc)
      .limit(30)

  /** TF-IDF per (doc, term), top-50 by score. df and N are computed as
    * aggregates and joined back — no driver-side collect (SURVEY §4:
    * driver loops are the anti-pattern). The df side is vocab-sized
    * (≪ corpus) and the natural-language `term` key is Zipf-skewed
    * ("the" is in every doc), so df is BROADCAST: the skewed shuffle
    * join disappears and tf never moves. */
  def textTfidf(s: SparkSession, d: String): DataFrame = {
    val tok = tokens(s, d).withColumnRenamed("token", "term")
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df derived FROM tf (round-16, guide §2.4): tf already holds one
    // row per distinct (doc, term), so count-per-term over tf IS the
    // distinct document frequency — and because the df branch now
    // starts from the same aggregate subplan as the join's probe side,
    // Spark reuses the tokenize-explode exchange (ReusedExchange in the
    // plan) instead of evaluating the explode twice.
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = documents(s, d).agg(count(lit(1)).as("n"))
    tf.join(broadcast(df), "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
              round(col("tf") * log(col("n").cast("double") / col("df")), 4)
                .as("tfidf_r"))
      .orderBy(col("tfidf_r").desc, col("doc_id").asc, col("term").asc)
      .limit(50)
  }

  /** Lexicon sentiment (EDBT'16-style scoring, PAPERS.md): +1 for positive
    * tokens, -1 for negative, summed per doc. The lexicon is a broadcast
    * dim — the scalable shape for dictionary joins. */
  def textSentiment(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lex = Seq(("fast", 1), ("big", 1), ("slow", -1), ("small", -1))
      .toDF("token", "w")
    tokens(s, d)
      .join(broadcast(lex), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("w"), lit(0))).as("sentiment"))
      .orderBy("doc_id")
  }

  // ---- training-data pipeline text analysis (builder brief §extensions) ----

  /** Marker-token language ID heuristic. NOTE: this corpus shares one
    * vocabulary across langs (verified — every token appears in all 5
    * langs), so accuracy is meaningless here; the query pins the operator's
    * determinism, and the marker lists are where a real profile would go. */
  def textLangid(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        when(array_contains(col("toks"), "the") ||
             array_contains(col("toks"), "a"), "en")
          .when(array_contains(col("toks"), "le") ||
                array_contains(col("toks"), "la"), "fr")
          .when(array_contains(col("toks"), "der") ||
                array_contains(col("toks"), "und"), "de")
          .when(array_contains(col("toks"), "el") ||
                array_contains(col("toks"), "los"), "es")
          .otherwise("und").as("pred_lang"))
      .orderBy("doc_id")

  /** Quality scoring: token counts, avg token length, type-token ratio,
    * stopword ratio, and a pass/fail flag — the standard pre-training
    * corpus filters (length + repetition + stopword heuristics). */
  def textQuality(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_stop", size(filter(col("toks"),
        t => t === "the" || t === "a")).cast("long"))
      .select(
        col("doc_id"), col("n_tokens"),
        round(col("n_chars").cast("double") / col("n_tokens"), 4)
          .as("avg_token_len_r"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 4)
          .as("ttr_r"),
        round(col("n_stop").cast("double") / col("n_tokens"), 4)
          .as("stop_ratio_r"),
        when(col("n_tokens").between(10, 200) &&
             col("n_distinct").cast("double") / col("n_tokens") >= 0.2, 1)
          .otherwise(0).as("quality_flag"))
      .orderBy("doc_id")

  /** Token counting two ways: whitespace split and a BPE-ish regex
    * ([a-z]+ / digit-runs / other symbols as separate tokens). */
  def textTokencount(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("re_tokens"))
      .orderBy("doc_id")

  /** End-to-end corpus-cleaning composition — the shape of a real
    * training-data prep job: quality gate (token count + type-token
    * ratio) → exact dedup (keep min doc_id per content hash) → per-lang
    * yield stats. One declarative plan; Catalyst fuses the stages. */
  def pipelineCorpusClean(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("ttr", size(array_distinct(col("toks"))).cast("double") /
                         col("n_tokens"))
    val kept = docs
      .where(col("n_tokens").between(10, 200) && col("ttr") >= 0.2)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs.join(kept, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           round(avg("n_chars"), 2).as("avg_chars_r"),
           round(avg("n_tokens"), 2).as("avg_tokens_r"))
      .orderBy("lang")
  }

  /** Document fingerprint: md5 over the sorted distinct token set —
    * order-insensitive content identity (bag-of-words canonical form). */
  def textFingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " ")))))
          .as("fp"))
      .orderBy("doc_id")

  /** Repetition scoring (the Gopher-style duplicate-n-gram filter): the
    * fraction of 3-gram instances that are repeats of an earlier 3-gram in
    * the same doc. High ratio = boilerplate/spam → drop before training.
    * Narrow per-doc map, no shuffle. */
  def textRepetition(s: SparkSession, d: String): DataFrame =
    // explode + aggregate, NOT size(g3)/size(array_distinct(g3)) column
    // math: Catalyst collapses projections, so every reference to the
    // 3-gram array re-runs the whole string-building transform (~5× per
    // row including the filter) — measured 2.7 s vs 0.4 s at sf0.1. Here
    // each gram is built exactly once; count+countDistinct partial-agg.
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """transform(slice(toks, 1, greatest(size(toks) - 2, 0)),
          |  (x, i) -> concat_ws(' ', x, toks[i + 1], toks[i + 2]))"""
          .stripMargin)).as("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
           countDistinct("g").as("n_distinct"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 4)
          .as("rep_ratio_r"))
      .orderBy("doc_id")

  /** Token-distribution entropy per doc (perplexity proxy without a
    * model): H = ln(n) − (Σ cnt·ln cnt)/n over token counts — the
    * algebraic form both engines evaluate identically from exact integer
    * counts (one explode + two aggregations, partial-combined). */
  def textEntropy(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").cast("double").as("n"),
           sum(col("cnt").cast("double") * log(col("cnt").cast("double")))
             .as("sclc"))
      .select(col("doc_id"),
        expr("ROUND(ln(n) - sclc / n, 4) + 0.0").as("entropy_r"))
      .orderBy("doc_id")

  /** Text normalization — the first stage of every corpus-cleaning job:
    * lowercase, strip non-alphanumerics, squeeze whitespace, trim. Pure
    * codegen'd string expressions; at 100 TB this is a narrow map fused
    * into the scan. The regex dialect is kept to the portable core (class,
    * +) so the oracle is byte-identical. */
  def textNormalize(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " ")).as("norm_text"))
      .orderBy("doc_id")

  /** Regex function family: anchored extract, extract-all counting,
    * rlike flag, replace — corpus cleaning's workhorse quartet. */
  def fnRegex(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        regexp_extract(col("text"), "^([a-z]+)", 1).as("first_tok"),
        size(expr("regexp_extract_all(text, 'table', 0)")).cast("long")
          .as("n_table"),
        col("text").rlike("fast (spark|scan)").as("has_fast_pair"),
        substring(regexp_replace(col("text"), "customer", "<ENT>"), 1, 40)
          .as("masked40"))
      .orderBy("doc_id")

  /** Deterministic train/test split — hash-based, not random: the split a
    * 100 TB pipeline must use so that (a) re-runs and late-arriving shards
    * land in the same fold, (b) no shuffle or sampling state is needed —
    * it is a narrow map on a content-stable key. Fold = first 8 hex chars
    * of md5(doc_id) mod 100 (engine-portable, unlike xxhash64). */
  def dataSplit(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long").mod(100).as("bucket"))
      .withColumn("fold", when(col("bucket") < 80, "train")
        .when(col("bucket") < 90, "valid").otherwise("test"))
      .orderBy("doc_id")

  /** Stratified deterministic sampling — corpus-mix rebalancing: each
    * stratum (lang) keeps its own fraction via the same content-stable
    * md5 fold as [[dataSplit]]. No RNG state, no shuffle: a narrow map
    * plus a broadcast join against the rate table, so late-arriving
    * shards of a 100 TB corpus sample consistently with re-runs. */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rates = Seq(("de", 50), ("en", 20), ("es", 75), ("fr", 100),
                    ("zh", 10)).toDF("lang", "keep_pct")
    documents(s, d)
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long").mod(100))
      .join(broadcast(rates), "lang")
      .where(col("bucket") < col("keep_pct"))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination — the train-side n-gram overlap check every
    * LLM data pipeline runs before training: flag training docs sharing
    * any 5-gram with the held-out benchmark set (here: doc_id % 50 == 0,
    * a deterministic stand-in for an external eval corpus). The benchmark
    * gram set is eval-sized (≪ corpus) → BROADCAST; the training gram
    * stream never shuffles for the probe, only for the per-doc count —
    * the shape that survives 100 TB of training text. */
  def textDecontaminate(s: SparkSession, d: String): DataFrame = {
    val grams = documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """transform(slice(toks, 1, greatest(size(toks) - 4, 0)),
          |  (x, i) -> concat_ws(' ', x, toks[i + 1], toks[i + 2],
          |                      toks[i + 3], toks[i + 4]))""".stripMargin))
        .as("g"))
      .distinct()
    val bench = grams.where(col("doc_id") % 50 === 0)
      .select("g").distinct().withColumn("hit", lit(1))
    grams.where(col("doc_id") % 50 =!= 0)
      .join(broadcast(bench), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
           sum(coalesce(col("hit"), lit(0))).as("n_overlap"))
      .select(col("doc_id"), col("n_grams"), col("n_overlap"),
        round(col("n_overlap").cast("double") / col("n_grams"), 4)
          .as("overlap_ratio_r"),
        when(col("n_overlap") > 0, 1).otherwise(0).as("contaminated"))
      .orderBy("doc_id")
  }

  /** Unigram language-model scoring — the perplexity-filter signal
    * (CCNet-style): fit token unigram MLE probabilities on the corpus
    * itself, then score each document by its average negative
    * log-likelihood (perplexity = exp of this; the monotone transform is
    * left to the consumer — exp amplifies float drift for no ranking
    * gain). In-vocab by construction since the model is fit on the same
    * corpus; at 100 TB the vocab table is the model artifact (fit once,
    * broadcast to score any slice) and scoring is one broadcast join +
    * partial-agg — no shuffle of the token stream. */
  def textPerplexity(s: SparkSession, d: String): DataFrame = {
    val tok = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum("cnt").as("n"))
    tok.join(broadcast(vocab), "t")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
           round(avg(-log(col("cnt").cast("double") / col("n"))), 4)
             .as("anll_r"))
      .orderBy("doc_id")
  }

  /** Sequence packing for pretraining: documents are concatenated in
    * doc_id order into one token stream and chunked into fixed 512-token
    * training windows; each doc reports the window its first token lands
    * in and the offset inside it (concat-then-chunk — docs may straddle
    * windows, the standard pretraining packing).
    *
    * The global running token count is a DISTRIBUTED prefix sum, not a
    * single-task global window (`Window.orderBy` with no partition key
    * funnels the entire table through one task — the canonical windowing
    * scale trap): range-repartition by doc_id (contiguous key ranges per
    * partition), cumsum per partition with an ordinary partitioned
    * window, then add each partition's starting offset — computed from
    * the P per-partition totals (a P-row aggregate, windowed in one tiny
    * task and broadcast back). Output is exactly the global cumsum for
    * ANY partition count, so the SQL oracle is the plain single-window
    * formulation. */
  def textPackSequences(s: SparkSession, d: String): DataFrame = {
    val seqLen = 512
    val t = documents(s, d)
      .select(col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // Partition count follows the session's shuffle parallelism (the 8-way
    // literal it replaced capped the heavy cumsum stage at 8 tasks no
    // matter the cluster); the offset fix-up is correct for ANY count.
    val nPart = math.max(1, s.sessionState.conf.numShufflePartitions)
    val ranged = t.repartitionByRange(nPart, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("pid", spark_partition_id())
    val w = Window.partitionBy("pid").orderBy("doc_id")
    val withCum = ranged.withColumn("pcum", sum("n_tokens").over(w))
    val wOff = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    // Partition totals from a plain partial-agg over the ranged table,
    // NOT max(pcum): reusing the window output would re-run the whole
    // cumsum subtree in this branch (no exchange reuse across the join).
    val offsets = ranged.groupBy("pid").agg(sum("n_tokens").as("ptot"))
      .withColumn("poff", coalesce(sum("ptot").over(wOff), lit(0L)))
      .select("pid", "poff")
    withCum.join(broadcast(offsets), "pid")
      .withColumn("start", col("pcum") - col("n_tokens") + col("poff"))
      .select(col("doc_id"), col("n_tokens"),
              expr(s"start DIV $seqLen").as("seq_id"),
              (col("start") % seqLen).as("seq_offset"))
      .orderBy("doc_id")
  }

  /** Overlapping fixed-window chunking — the per-document complement of
    * [[textPackSequences]]: each doc is cut into 64-token windows on a
    * 48-token stride (16-token overlap), the standard long-doc →
    * context-window preprocessing for embedding and retrieval corpora.
    * Chunk count is ceil((n-W)/S)+1 with a single chunk when n <= W, so
    * only the final window may run short. Pure generator plan — split
    * once, explode a K-element sequence per doc, slice — no shuffle
    * until the determinism sort; at 100 TB this is a narrow flatMap
    * emitting ~n/S rows per doc with no skew beyond doc length. */
  def textChunk(s: SparkSession, d: String): DataFrame = {
    val (w, st) = (64, 48)
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .withColumn("n", size(col("words")))
      .withColumn("k",
        when(col("n") <= w, lit(1L))
          .otherwise(expr(s"(n - ${w - st + 1}) DIV $st + 1")))
      .select(col("doc_id"), col("words"),
              explode(sequence(lit(0L), col("k") - 1)).as("cid"))
      .select(col("doc_id"),
              col("cid").cast("int").as("chunk_id"),
              array_join(slice(col("words"), (col("cid") * st + 1).cast("int"),
                               lit(w)), " ").as("chunk"),
              size(slice(col("words"), (col("cid") * st + 1).cast("int"),
                         lit(w))).as("n_words"))
      .orderBy("doc_id", "chunk_id")
  }

  // Shared by textPiiScrub and its oracle: lowercase-only patterns (the
  // corpus is lowercase, FIXTURES.md) valid in BOTH Java regex and RE2 —
  // no lookarounds, no \b, no possessive quantifiers.
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\+1-555-[0-9]{4}"

  /** PII scrubbing: mask emails/phones, report per-doc entity counts and a
    * digest of the scrubbed text. The corpus is synthetic word soup with no
    * real PII, so the query first DERIVES a deterministic pseudo-PII layer
    * from the row's own keys (1-2 emails + 0-1 phones per doc, varied by
    * doc_id residues) — the injection is part of the query on BOTH engines,
    * so the masking chain itself is what the oracle checks.
    *
    * Scale: a pure narrow map (regexp chain is codegen'd, no UDF); at
    * 100 TB this is the shape of every redaction pass — embarrassingly
    * parallel, zero shuffles before the sink. */
  def textPiiScrub(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("raw", concat(
        col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com"),
        when(pmod(col("doc_id"), lit(5)) === 0,
             concat(lit(" cc admin"), col("doc_id"), lit("@corp.example.org")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(3)) === 0,
             concat(lit(" call +1-555-"),
                    lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
          .otherwise(lit(""))))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("raw"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("raw"), EmailRe, "<EMAIL>"),
                           PhoneRe, "<PHONE>")).as("scrub_md5"))
      .orderBy("doc_id")

  /** Web-pipeline hygiene: per-domain doc counts with a blocklist gate.
    * URLs are derived deterministically from (source, doc_id) — the corpus
    * has no real URLs — then parsed with Spark's native `parse_url` (HOST
    * extraction), anti-joined against a broadcast blocklist, and rolled up
    * per domain.
    *
    * Scale: the blocklist is a tiny broadcast (left_anti, no shuffle); the
    * domain rollup is one partial-agg shuffle over ~|domains| groups. This
    * is the crawl-filtering shape: parse → blocklist gate → domain stats. */
  def textUrlDomains(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val blocked = Seq("src0.example.com", "src7.example.com")
      .toDF("blocked_host")
    documents(s, d)
      .withColumn("url", concat(lit("https://"), col("source"),
                                lit(".example.com/doc/"), col("doc_id")))
      .withColumn("host", expr("parse_url(url, 'HOST')"))
      .join(broadcast(blocked), col("host") === col("blocked_host"),
            "left_anti")
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy("host")
  }

  /** Deterministic class rebalancing: downsample every language class to
    * (approximately) the minority-class size with a content-stable hash
    * threshold — keep a doc iff
    * `int(md5(doc_id)[0:8]) * n_lang < n_min * 2^32`, i.e. a per-class keep
    * fraction of n_min/n_lang decided row-locally. All-integer comparison,
    * so both engines keep EXACTLY the same rows.
    *
    * Scale: this is the whole point of the hash-threshold formulation —
    * the alternative (row_number per class ≤ n_min) needs a per-class
    * ranking shuffle whose partitions are the class sizes (the largest
    * class is by construction the skew key). Here the class histogram is a
    * tiny broadcast and the filter is stateless/narrow; the trade is ±√n
    * binomial jitter around the exact quota, which a corpus mixer accepts. */
  def sampleRebalance(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val floor  = counts.agg(min(col("n_lang")).as("n_min"))
    docs.join(broadcast(counts), "lang")
      .crossJoin(broadcast(floor))
      .where(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
               .cast("long") * col("n_lang") < col("n_min") * lit(4294967296L))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  /** Paragraph-level exact dedup (the C4/RefinedWeb move): cut every doc
    * into NON-overlapping 64-token paragraphs ([[textChunk]]'s window
    * arithmetic with stride = window), fingerprint each, and keep only a
    * paragraph's FIRST occurrence corpus-wide — `min(struct(doc, chunk))`
    * per fingerprint, the deterministic tie order. Output marks every
    * paragraph keep/drop, which is what the downstream re-assembly
    * consumes.
    *
    * Scale: one shuffle on the fingerprint (md5 keys hash-balance); the
    * min-struct partial agg collapses replicas map-side. Doc-level dedup
    * misses boilerplate shared across distinct docs — this is the tier
    * that catches it. */
  def dedupParagraph(s: SparkSession, d: String): DataFrame = {
    val w = 64
    val paras = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .withColumn("k",
        expr(s"CAST((size(words) + ${w - 1}) DIV $w AS BIGINT)"))
      .select(col("doc_id"),
              explode(sequence(lit(0L), col("k") - 1)).as("cid"),
              col("words"))
      .select(col("doc_id"), col("cid"),
              md5(array_join(
                slice(col("words"), (col("cid") * w + 1).cast("int"), lit(w)),
                " ")).as("fp"))
    val first = paras.groupBy("fp")
      .agg(min(struct(col("doc_id"), col("cid"))).as("keeper"),
           count(lit(1)).as("n_copies"))
    paras.join(first, "fp")
      .select(col("doc_id"), col("cid").cast("long").as("chunk_id"),
              (col("doc_id") === col("keeper.doc_id") &&
               col("cid") === col("keeper.cid")).as("keep"),
              col("n_copies"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Distribution-derived quality gate: keep each language's docs above
    * that language's own p90 length — the dynamic-threshold filter every
    * quality pipeline ends with ("top decile by score"), as opposed to
    * the fixed-constant gates of [[textQuality]]. The per-class quantile
    * table is a tiny broadcast; the filter is then row-local.
    *
    * Scale: `percentile` here is the exact sort-based form (it IS the
    * oracle contract); at 100 TB swap in the mergeable-sketch
    * `approx_percentile` (declared as `agg_approx_percentile`) — the
    * plan shape (threshold agg → broadcast → narrow filter) is unchanged. */
  def textQualityPctl(s: SparkSession, d: String): DataFrame = {
    val thr = documents(s, d).groupBy("lang")
      .agg(expr("percentile(n_chars, 0.9)").as("thr"))
    documents(s, d).join(broadcast(thr), "lang")
      .where(col("n_chars") > col("thr"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Per-language vocabulary nucleus (top-p) truncation: keep the smallest
    * prefix of the frequency-sorted vocabulary whose cumulative mass
    * reaches 90% — the classic vocab/logit truncation rule, run corpus-side.
    * A token survives iff the mass STRICTLY BEFORE it is < 0.9 of the class
    * total (exclusive prefix sum ⇒ the crossing token is kept). The 0.9
    * comparison is cross-multiplied into integers (`cum*10 < total*9`) so
    * no floating division exists anywhere.
    *
    * Scale: the window runs over the per-class VOCABULARY (post-groupBy),
    * not the token stream — the corpus collapses at the first partial agg;
    * vocab per class is bounded (≪ corpus), so the per-class sort is safe. */
  def textVocabTopp(s: SparkSession, d: String): DataFrame = {
    val freq = documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
    val order  = Window.partitionBy("lang")
      .orderBy(col("cnt").desc, col("token").asc)
    val before = order.rowsBetween(Window.unboundedPreceding, -1)
    val whole  = Window.partitionBy("lang")
    freq
      .withColumn("rank", row_number().over(order))
      .withColumn("cum_before", coalesce(sum(col("cnt")).over(before), lit(0L)))
      .withColumn("total", sum(col("cnt")).over(whole))
      .where(col("cum_before") * 10 < col("total") * 9)
      .select(col("lang"), col("token"), col("cnt"), col("rank").cast("long").as("rank"))
      .orderBy("lang", "rank")
  }
}
