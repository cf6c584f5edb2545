package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.GraftFunctions

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID and document fingerprinting over the
  * `documents` table. All per-row scalar work — embarrassingly parallel,
  * evaluated inside the parquet scan stage (builtins + codegen'd custom
  * expressions; zero shuffles except the final presentation sort).
  */
object TextPipeline {

  type Q = (SparkSession, String) => DataFrame

  /** Token statistics via whitespace tokenization (split is codegen'd). */
  val tokenStats: Q = (spark, dir) => {
    import spark.implicits._
    val toks = split($"text", " ")
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_uniq_tokens"),
        (aggregate(transform(toks, w => length(w)), lit(0), (acc, x) => acc + x).cast(DoubleType)
          / size(toks)).as("mean_token_len"))
      .orderBy($"doc_id")
  }

  val tokenStatsSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq_tokens,
      |  CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS mean_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality heuristics: stopword ratio, alphabetic ratio, type-token
    * ratio — the usual cheap pre-training filters. */
  val qualityScore: Q = (spark, dir) => {
    import spark.implicits._
    val toks = split($"text", " ")
    val stopHits = size(filter(toks, w => w.isin("the", "a", "of", "and", "is", "to", "in")))
    val alpha = length(regexp_replace($"text", "[^a-z]", ""))
    Tables.load(spark, dir, "documents")
      .select($"doc_id", $"n_chars",
        (stopHits.cast(DoubleType) / size(toks)).as("stopword_ratio"),
        (alpha.cast(DoubleType) / length($"text")).as("alpha_ratio"),
        (size(array_distinct(toks)).cast(DoubleType) / size(toks)).as("type_token_ratio"))
      .orderBy($"doc_id")
  }

  val qualityScoreSql: String =
    """SELECT doc_id, n_chars,
      |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS stopword_ratio,
      |  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS type_token_ratio
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Heuristic language ID vs. the labeled lang column. Rows-only gate
    * (the n-gram profile is engine-specific); asserted in ScalaTest. */
  val langIdQuery: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang",
        GraftFunctions.langId(spark, $"text").as("lang_pred"))
      .withColumn("agree", $"lang" === $"lang_pred")
      .orderBy($"doc_id")
  }

  /** Document fingerprints: rolling-hash fingerprint (formatting-
    * insensitive), SimHash and the first MinHash component, all codegen'd.
    * Rows-only gate; determinism asserted in ScalaTest. */
  val fingerprints: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        GraftFunctions.fingerprint64(spark, $"text").as("fingerprint"),
        GraftFunctions.simhash64(spark, $"text", 3).as("simhash"),
        element_at(GraftFunctions.minhashSig(spark, $"text", 3, 64), 1).as("minhash_0"))
      .orderBy($"doc_id")
  }

  /** BPE-ish token estimate: letter runs, digit runs and single
    * punctuation each count as one token (match-count formulation — no
    * lookarounds, so the same regex runs on Java regex and RE2 alike). */
  val tokenBudget: Q = (spark, dir) => {
    import spark.implicits._
    val pieces = regexp_extract_all($"text", lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))
    Tables.load(spark, dir, "documents")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(pieces)).as("est_tokens"),
        sum($"n_chars").as("total_chars"))
      .orderBy($"source")
  }

  val tokenBudgetSql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS est_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Stopword-removal transform (the cleaning step of a pre-training
    * pipeline): higher-order filter + rejoin, no UDF. Cleaned text is
    * md5'd for the compare to keep the output compact. */
  val cleanText: Q = (spark, dir) => {
    import spark.implicits._
    val toks = split($"text", " ")
    val kept = filter(toks, w => !w.isin("the", "a", "of", "and", "is", "to", "in"))
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        md5(array_join(kept, " ")).as("clean_md5"),
        (size(toks) - size(kept)).as("n_removed"))
      .orderBy($"doc_id")
  }

  val cleanTextSql: String =
    """SELECT doc_id,
      |  md5(array_to_string(list_filter(string_split(text, ' '),
      |    w -> w NOT IN ('the', 'a', 'of', 'and', 'is', 'to', 'in')), ' ')) AS clean_md5,
      |  CAST(len(string_split(text, ' ')) - len(list_filter(string_split(text, ' '),
      |    w -> w NOT IN ('the', 'a', 'of', 'and', 'is', 'to', 'in'))) AS INTEGER) AS n_removed
      |FROM documents ORDER BY doc_id""".stripMargin

  final case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  final case class SourceStats(source: String, n_docs: Long, max_chars: Long, total_chars: Long)

  /** Typed Dataset surface: groupByKey + mapGroups with case-class
    * Encoders — compile-checked fields, deterministic per-group fold.
    * (The untyped twin would be a plain groupBy; this entry exists to keep
    * the typed API under the same oracle gate.) */
  val typedSourceStats: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "documents").as[Doc]
      .groupByKey(_.source)
      .mapGroups { (src, docs) =>
        var n = 0L; var mx = 0L; var tot = 0L
        docs.foreach { d => n += 1; mx = math.max(mx, d.n_chars); tot += d.n_chars }
        SourceStats(src, n, mx, tot)
      }
      .toDF()
      .orderBy(col("source"))
  }

  val typedSourceStatsSql: String =
    """SELECT source, COUNT(*) AS n_docs, MAX(n_chars) AS max_chars,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Corpus vocabulary head: top 20 words by document frequency. The
    * Zipf-head report every corpus QA pipeline runs — explode is map-side,
    * the (word, doc) dedup and the document-frequency count are ONE
    * partial-aggregated shuffle each, and the top-k is a
    * TakeOrderedAndProject, so the plan is two shuffles regardless of
    * corpus size. Normalization is the codegen'd one-pass kernel; the
    * oracle replicates it with the equivalent regex pipeline (same
    * equivalence d02 pins). */
  val topWords: Q = (spark, dir) => {
    import spark.implicits._
    val norm = graft.functions.GraftFunctions.normalizeText(spark, $"text")
    Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(split(norm, " ")).as("word"))
      .filter(length($"word") > 0)
      .distinct()
      .groupBy($"word")
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy($"doc_freq".desc, $"word")
      .limit(20)
  }

  val topWordsSql: String =
    """SELECT word, COUNT(*) AS doc_freq FROM (
      |  SELECT DISTINCT doc_id, unnest(string_split(trim(regexp_replace(
      |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ')) AS word
      |  FROM documents) t
      |WHERE length(word) > 0
      |GROUP BY word
      |ORDER BY doc_freq DESC, word
      |LIMIT 20""".stripMargin

  /** Bigram language-model head: top 20 bigrams by corpus count with the
    * conditional probability P(w2|w1). Two hash aggregations (bigram
    * counts, unigram continuation counts) + a broadcast-size join of the
    * head — the n-gram-LM statistics pass of a pretraining corpus QA
    * pipeline. The division is one IEEE double op, bit-identical across
    * engines. */
  val bigramModel: Q = (spark, dir) => {
    import spark.implicits._
    val norm = graft.functions.GraftFunctions.normalizeText(spark, $"text")
    val words = Tables.load(spark, dir, "documents")
      .select(split(norm, " ").as("ws"))
      .filter(size($"ws") >= 2)
    val bigrams = words
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))")).as("b"))
      .select($"b.w1", $"b.w2")
      .filter(length($"w1") > 0 && length($"w2") > 0)
    val counts = bigrams.groupBy($"w1", $"w2").agg(count(lit(1)).as("n"))
    // r21: continuation counts as an unordered window over the bigram
    // rollup instead of a groupBy + self-join — the join formulation
    // recomputed the whole tokenize+count subtree per side (column
    // pruning makes the two exchanges canonically different, so
    // ReusedExchange never fires); the window computes the same
    // SUM(n) per w1 in one pass over the KB-scale rollup
    counts
      .withColumn("n_ctx", sum($"n").over(Window.partitionBy($"w1")))
      .select($"w1", $"w2", $"n",
        ($"n".cast(DoubleType) / $"n_ctx".cast(DoubleType)).as("p_cond"))
      .orderBy($"n".desc, $"w1", $"w2")
      .limit(20)
  }

  val bigramModelSql: String =
    """WITH ws AS (
      |  SELECT string_split(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ') AS ws
      |  FROM documents),
      |bg AS (
      |  SELECT b[1] AS w1, b[2] AS w2 FROM (
      |    SELECT unnest([[ws[i], ws[i+1]] for i in range(1, len(ws))]) AS b
      |    FROM ws WHERE len(ws) >= 2) t
      |  WHERE length(b[1]) > 0 AND length(b[2]) > 0),
      |counts AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY w1, w2),
      |ctx AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS n_ctx FROM counts GROUP BY w1)
      |SELECT counts.w1, w2, n, CAST(n AS DOUBLE) / CAST(n_ctx AS DOUBLE) AS p_cond
      |FROM counts JOIN ctx ON counts.w1 = ctx.w1
      |ORDER BY n DESC, counts.w1, w2
      |LIMIT 20""".stripMargin

  /** PII survey: per-source counts of email-, URL- and phone-shaped
    * spans — the scrub-planning pass a pretraining pipeline runs before
    * redaction. Match-count formulation (regexp_extract_all) with
    * RE2-compatible patterns so the identical regexes run on both
    * engines; per-row scalar work, one rollup shuffle. */
  val piiSurvey: Q = (spark, dir) => {
    import spark.implicits._
    val emails = size(regexp_extract_all($"text",
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0)))
    val urls = size(regexp_extract_all($"text",
      lit("https?://[^\\s]+"), lit(0)))
    val phones = size(regexp_extract_all($"text",
      lit("\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"), lit(0)))
    Tables.load(spark, dir, "documents")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(emails.cast(LongType)).as("n_emails"),
        sum(urls.cast(LongType)).as("n_urls"),
        sum(phones.cast(LongType)).as("n_phones"),
        sum(when(emails + urls + phones > 0, 1L).otherwise(0L)).as("n_docs_with_pii"))
      .orderBy($"source")
  }

  val piiSurveySql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_emails,
      |  CAST(SUM(len(regexp_extract_all(text, 'https?://[^\s]+'))) AS BIGINT) AS n_urls,
      |  CAST(SUM(len(regexp_extract_all(text, '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}'))) AS BIGINT) AS n_phones,
      |  CAST(SUM(CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |    + len(regexp_extract_all(text, 'https?://[^\s]+'))
      |    + len(regexp_extract_all(text, '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) > 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** TF-IDF top terms: the 3 most document-distinctive terms per doc.
    * tf = in-doc term count, weighted by inverse document frequency as
    * the exact ratio `tf * N / df` (one integer product, one IEEE double
    * division — bit-identical across engines; the usual log() weighting
    * would hinge on libm rounding that Java does not guarantee). Plan:
    * explode is map-side, tf and df are each one partial-aggregated
    * shuffle, df (vocabulary-sized) broadcasts back onto tf, and the
    * per-doc top-3 is a bounded window — the same shape at 100 TB, with
    * the corpus-size scalar computed as an aggregate, not driver-side. */
  val tfidfTopTerms: Q = (spark, dir) => {
    import spark.implicits._
    val norm = graft.functions.GraftFunctions.normalizeText(spark, $"text")
    val docs = Tables.load(spark, dir, "documents")
    val nDocs = docs.agg(countDistinct($"doc_id").as("n_docs"))
    val tf = docs
      .select($"doc_id", explode(split(norm, " ")).as("term"))
      .filter(length($"term") > 0)
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))
    // r21: document frequency as an unordered window over the tf rollup
    // instead of groupBy + join back — the join formulation recomputed
    // the tokenize+tf subtree per side (column pruning made the two
    // exchanges canonically different, defeating ReusedExchange), so the
    // corpus was scanned and exploded twice. The window computes the same
    // COUNT(*) per term in one pass, shuffling only the (doc, term, tf)
    // rollup; at web scale the same plan holds — the window sorts rather
    // than materializes per-term lists, so a pathologically common term
    // spills instead of OOMing (the d11 argument).
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"term")))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", ($"tf" * $"n_docs").cast(DoubleType) / $"df")
    val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")
    scored.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"doc_id", $"term", $"score", $"rnk")
      .orderBy($"doc_id", $"rnk")
  }

  val tfidfTopTermsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(trim(regexp_replace(
      |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
      |       WHERE length(term) > 0 GROUP BY doc_id, term),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
      |scored AS (
      |  SELECT t.doc_id, t.term, CAST(t.tf * n.n_docs AS DOUBLE) / d.df AS score
      |  FROM tf t JOIN df d ON t.term = d.term CROSS JOIN n),
      |ranked AS (SELECT *, row_number() OVER (
      |    PARTITION BY doc_id ORDER BY score DESC, term) AS rnk FROM scored)
      |SELECT doc_id, term, score, CAST(rnk AS INTEGER) AS rnk
      |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  /** C4-style quality-filter funnel: four independent heuristics per doc
    * (too short, implausible mean word length, low stopword ratio, low
    * vocabulary diversity), reported per source as rule-level rejection
    * counts plus the docs passing all rules. Every ratio test is written
    * as an INTEGER cross-multiplication (`n_stop * 20 < n_tok` instead of
    * `n_stop / n_tok < 0.05`), so the funnel is bit-deterministic with no
    * float rounding anywhere. Per-row work only (array HOFs inside the
    * scan stage) until the one rollup shuffle — the shape of a filtering
    * pass over 100 TB of raw crawl. */
  val filterFunnel: Q = (spark, dir) => {
    import spark.implicits._
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    val d = Tables.load(spark, dir, "documents")
      .select($"source", split($"text", " ").as("t"))
      .withColumn("n_tok", size($"t").cast(LongType))
      .withColumn("sum_len",
        aggregate($"t", lit(0L), (acc, x) => acc + length(x)))
      .withColumn("n_stop",
        size(filter($"t", x => x.isin(stop: _*))).cast(LongType))
      .withColumn("n_distinct", size(array_distinct($"t")).cast(LongType))
      .withColumn("r_short", ($"n_tok" < 50).cast(LongType))
      .withColumn("r_wordlen",
        ($"sum_len" < $"n_tok" * 3 || $"sum_len" > $"n_tok" * 10).cast(LongType))
      .withColumn("r_lowstop", ($"n_stop" * 20 < $"n_tok").cast(LongType))
      .withColumn("r_repetitive", ($"n_distinct" * 10 < $"n_tok" * 3).cast(LongType))
    d.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"r_short").as("n_short"),
        sum($"r_wordlen").as("n_wordlen"),
        sum($"r_lowstop").as("n_lowstop"),
        sum($"r_repetitive").as("n_repetitive"),
        sum(when($"r_short" + $"r_wordlen" + $"r_lowstop" + $"r_repetitive" === 0, 1L)
          .otherwise(0L)).as("n_clean"))
      .orderBy($"source")
  }

  val filterFunnelSql: String =
    """WITH scored AS (
      |  SELECT source,
      |    CAST(len(t) AS BIGINT) AS n_tok,
      |    CAST(list_sum([len(x) for x in t]) AS BIGINT) AS sum_len,
      |    CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop,
      |    CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct
      |  FROM (SELECT source, string_split(text, ' ') AS t FROM documents)),
      |flags AS (
      |  SELECT source,
      |    CASE WHEN n_tok < 50 THEN 1 ELSE 0 END AS r_short,
      |    CASE WHEN sum_len < n_tok * 3 OR sum_len > n_tok * 10 THEN 1 ELSE 0 END AS r_wordlen,
      |    CASE WHEN n_stop * 20 < n_tok THEN 1 ELSE 0 END AS r_lowstop,
      |    CASE WHEN n_distinct * 10 < n_tok * 3 THEN 1 ELSE 0 END AS r_repetitive
      |  FROM scored)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(r_short) AS BIGINT) AS n_short,
      |  CAST(SUM(r_wordlen) AS BIGINT) AS n_wordlen,
      |  CAST(SUM(r_lowstop) AS BIGINT) AS n_lowstop,
      |  CAST(SUM(r_repetitive) AS BIGINT) AS n_repetitive,
      |  CAST(SUM(CASE WHEN r_short + r_wordlen + r_lowstop + r_repetitive = 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
      |FROM flags GROUP BY source ORDER BY source""".stripMargin

  /** Repetition metrics — the Gopher-style repetition filter signal: a
    * document whose token stream is dominated by few distinct words is
    * boilerplate/spam. Per doc: total words, distinct words, the top
    * word's count, and the duplicate-word fraction
    * (n_words - n_distinct) / n_words; top-20 most-repetitive surfaced.
    * Plan shape at 100 TB: explode → two hash aggregations, all map-side
    * partial before each shuffle, then a global top-k
    * (TakeOrderedAndProject) — no windows, no skew sensitivity (the
    * per-(doc, word) key space is near-unique). The ratio is a single
    * IEEE double division of two exact longs — bit-identical across
    * engines. */
  val repetitionMetrics: Q = (spark, dir) => {
    val words = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("c")).as("top_word_count"))
      .withColumn("dup_ratio",
        (col("n_words") - col("n_distinct_words")).cast("double") /
          col("n_words").cast("double"))
      .orderBy(col("dup_ratio").desc, col("doc_id"))
      .limit(20)
  }

  val repetitionMetricsSql: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |wc AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w)
      |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
      |  COUNT(*) AS n_distinct_words,
      |  CAST(MAX(c) AS BIGINT) AS top_word_count,
      |  CAST(CAST(SUM(c) AS BIGINT) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_ratio
      |FROM wc GROUP BY doc_id
      |ORDER BY dup_ratio DESC, doc_id LIMIT 20""".stripMargin

  /** CCNet-style LM quality filter (t14): train a bigram LM on the
    * corpus (the t09 model), score every document by how predictable its
    * bigrams are under it, and split the corpus into head/middle/tail
    * quality bands — the CCNet pipeline's perplexity gate, re-expressed
    * without transcendentals so both engines agree BIT-FOR-BIT: each
    * bigram scores the integer `(count(w1,w2) * 1e6) DIV count(w1)`
    * (a scaled conditional probability; integer division, no log), a
    * document scores the integer mean of its bigram scores, and the
    * bands are FIXED thresholds rather than corpus quantiles (quantile
    * cuts over ties are engine-order-dependent; thresholds are not).
    * Shape: two map-side-partial count aggregations build the LM, the
    * doc-bigram stream joins it on (w1,w2) then (w1) — at 100 TB the LM
    * side is vocabulary-scale, broadcastable — and one rollup per
    * source. */
  val lmQualityFilter: Q = (spark, dir) => {
    import spark.implicits._
    val norm = graft.functions.GraftFunctions.normalizeText(spark, $"text")
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source", split(norm, " ").as("ws"))
      .filter(size($"ws") >= 2)
    val bg = docs.select($"doc_id", $"source", explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))")).as("b"))
      .select($"doc_id", $"source", $"b.w1", $"b.w2")
      .filter(length($"w1") > 0 && length($"w2") > 0)
    // r21 note: a per-document (doc, w1, w2) pre-rollup (so the kernel
    // runs once via exchange reuse) was measured WARM-SLOWER here — the
    // bigram stream is near-unique per document, so the 4-column
    // pre-shuffle of the whole occurrence stream costs more than the
    // second kernel pass it saves, and at 100 TB a full-stream shuffle
    // loses to a second scan+kernel outright (guide §2.3: shuffle fewer
    // bytes; the LM side joins stay broadcastable so this formulation
    // shuffles only per-doc partial aggregates). Kept as-is, measured.
    val counts = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("n"))
    val ctx = counts.groupBy($"w1").agg(sum($"n").as("n_ctx"))
    val scored = bg.join(counts, Seq("w1", "w2")).join(ctx, Seq("w1"))
      .groupBy($"doc_id", $"source")
      .agg(sum(expr("(n * 1000000) DIV n_ctx")).as("s"), count(lit(1)).as("nb"))
      .withColumn("score", expr("s DIV nb"))
    scored.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        min($"score").as("min_score"), max($"score").as("max_score"),
        expr("SUM(score) DIV COUNT(1)").as("avg_score"),
        sum(when($"score" >= 36000L, 1L).otherwise(0L)).as("n_head"),
        sum(when($"score" < 33000L, 1L).otherwise(0L)).as("n_tail"))
      .orderBy($"source")
  }

  val lmQualityFilterSql: String =
    """WITH ws AS (
      |  SELECT doc_id, source, string_split(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ') AS ws
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, source, b[1] AS w1, b[2] AS w2 FROM (
      |    SELECT doc_id, source, unnest([[ws[i], ws[i+1]] for i in range(1, len(ws))]) AS b
      |    FROM ws WHERE len(ws) >= 2) t
      |  WHERE length(b[1]) > 0 AND length(b[2]) > 0),
      |counts AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY w1, w2),
      |ctx AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS n_ctx FROM counts GROUP BY w1),
      |scored AS (
      |  SELECT bg.doc_id, bg.source,
      |    CAST(SUM((counts.n * 1000000) // ctx.n_ctx) AS BIGINT) // COUNT(*) AS score
      |  FROM bg JOIN counts ON bg.w1 = counts.w1 AND bg.w2 = counts.w2
      |          JOIN ctx ON bg.w1 = ctx.w1
      |  GROUP BY bg.doc_id, bg.source)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(MIN(score) AS BIGINT) AS min_score,
      |  CAST(MAX(score) AS BIGINT) AS max_score,
      |  CAST(CAST(SUM(score) AS BIGINT) // COUNT(*) AS BIGINT) AS avg_score,
      |  CAST(SUM(CASE WHEN score >= 36000 THEN 1 ELSE 0 END) AS BIGINT) AS n_head,
      |  CAST(SUM(CASE WHEN score < 33000 THEN 1 ELSE 0 END) AS BIGINT) AS n_tail
      |FROM scored GROUP BY source ORDER BY source""".stripMargin

  /** t15 — GPT-style concat-and-chunk SEQUENCE PACKING: within each
    * source, documents are concatenated in doc_id order and the token
    * stream is cut into fixed context windows (budget 512 whitespace
    * tokens); a document whose tokens straddle a cut is a boundary doc
    * (the fraction a packing-aware loader would mask or split). The plan
    * is ONE window cumsum partitioned by source — every source packs in
    * parallel and nothing is global. At 100 TB the same shape holds with
    * shard-level partitions (pack within each input shard — the
    * production contract, since cross-shard order is not meaningful);
    * the cumsum stays a single keyed shuffle either way. */
  val sequencePacking: Q = (spark, dir) => {
    import spark.implicits._
    val B = 512
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = Tables.load(spark, dir, "documents")
      .select($"source", $"doc_id", size(split($"text", " ")).as("n"))
      .withColumn("off", coalesce(sum($"n").over(w), lit(0L)))
      .withColumn("first_w", ($"off" / B).cast(LongType))
      .withColumn("last_w", (($"off" + $"n" - 1) / B).cast(LongType))
    packed.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n").cast(LongType).as("total_tokens"),
        (max($"last_w") + 1).as("n_windows"),
        sum(when($"first_w" =!= $"last_w", 1).otherwise(0)).cast(LongType)
          .as("n_boundary_docs"))
      .orderBy($"source")
  }

  val sequencePackingSql: String =
    """WITH toks AS (
      |  SELECT source, doc_id, len(string_split(text, ' ')) AS n,
      |    COALESCE(SUM(len(string_split(text, ' '))) OVER (
      |      PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n) AS BIGINT) AS total_tokens,
      |  CAST(MAX((off + n - 1) // 512) + 1 AS BIGINT) AS n_windows,
      |  CAST(SUM(CASE WHEN off // 512 <> (off + n - 1) // 512 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_boundary_docs
      |FROM toks GROUP BY source ORDER BY source""".stripMargin

  /** t16 — temperature-based DOMAIN MIXTURE sampling (the Pile/LLaMA
    * corpus-mixing shape): per-source quotas follow n^(1/2) (temperature
    * flattening, here the exactly-computable integer floor(sqrt) so both
    * engines agree bit-for-bit), a fixed total budget of 200 documents is
    * apportioned by integer largest-remainder (ties by source name), and
    * each source's quota is filled by the lowest multiplicative-hash
    * ranks — a deterministic pseudo-random sample reproducible from the
    * data alone. Two passes: a KB-scale per-source count (broadcastable),
    * then rank-within-source. At 100 TB the rank pass does not sort each
    * domain: the quota threshold is found on the hash values
    * (approx-quantile or a fixed-width histogram) and kept rows are
    * filtered by hash < threshold — one scan, no per-domain total order;
    * the sum-of-ids output here pins the exact same selection. */
  val domainMixture: Q = (spark, dir) => {
    import spark.implicits._
    val T = 200
    val docs = Tables.load(spark, dir, "documents")
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
      .withColumn("wgt", floor(sqrt($"n_docs".cast(DoubleType))).cast(LongType))
    val tot = counts.agg(sum($"wgt")).head.getLong(0)
    val quotas = counts
      .withColumn("base", ($"wgt" * T / tot).cast(LongType))
      .withColumn("rem", $"wgt" * T % tot)
      .withColumn("rr", row_number().over(
        Window.orderBy($"rem".desc, $"source".asc)))
    val deficit = T - quotas.agg(sum($"base")).head.getLong(0)
    val withQuota = quotas
      .withColumn("quota", $"base" + when($"rr" <= deficit, 1L).otherwise(0L))
      .select($"source", $"n_docs", $"quota")
    val ranked = docs.select($"source", $"doc_id")
      .withColumn("h", ($"doc_id" * 2654435761L) % 4294967296L)
      .withColumn("rk", row_number().over(
        Window.partitionBy($"source").orderBy($"h", $"doc_id")))
    ranked.join(broadcast(withQuota), "source")
      .filter($"rk" <= $"quota")
      .groupBy($"source")
      .agg(max($"n_docs").as("n_docs"), max($"quota").as("quota"),
        count(lit(1)).as("n_sampled"),
        sum($"doc_id").cast(LongType).as("sum_sampled_ids"))
      .orderBy($"source")
  }

  val domainMixtureSql: String =
    """WITH counts AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS wgt
      |  FROM documents GROUP BY source),
      |tot AS (SELECT SUM(wgt) AS t FROM counts),
      |quotas AS (
      |  SELECT source, n_docs, wgt * 200 // t AS base, wgt * 200 % t AS rem,
      |    ROW_NUMBER() OVER (ORDER BY wgt * 200 % t DESC, source ASC) AS rr
      |  FROM counts, tot),
      |deficit AS (SELECT 200 - SUM(base) AS d FROM quotas),
      |q AS (SELECT source, n_docs,
      |    base + CASE WHEN rr <= (SELECT d FROM deficit) THEN 1 ELSE 0 END AS quota
      |  FROM quotas),
      |ranked AS (
      |  SELECT source, doc_id, ROW_NUMBER() OVER (PARTITION BY source
      |    ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rk
      |  FROM documents)
      |SELECT r.source, MAX(q.n_docs) AS n_docs,
      |  CAST(MAX(q.quota) AS BIGINT) AS quota,
      |  COUNT(*) AS n_sampled,
      |  CAST(SUM(r.doc_id) AS BIGINT) AS sum_sampled_ids
      |FROM ranked r JOIN q ON r.source = q.source
      |WHERE r.rk <= q.quota
      |GROUP BY r.source ORDER BY r.source""".stripMargin

  /** t17 — BENCHMARK DECONTAMINATION (the GPT-3 appendix-C shape, Brown
    * et al. 2020): a training corpus is scanned for exact 13-gram overlap
    * with an evaluation benchmark, and every training document sharing at
    * least one benchmark n-gram is flagged with its contamination extent
    * (overlapping positions, distinct shared n-grams, total positions —
    * what decides between dropping the document and surgically removing
    * the span). The benchmark here is a deterministic corpus split
    * (doc_id % 5 — a stand-in for the external eval set a production run
    * would load as its own small table).
    *
    * Scale shape: the benchmark side is SMALL BY NATURE (eval sets are
    * MBs against a 100 TB corpus), so its distinct n-gram hashes
    * broadcast and the corpus side never shuffles its text — 13-gram
    * hashing runs inside the scan via the codegen'd rolling kernel (8
    * bytes per position, same kernel as d11), the broadcast hash join
    * flags positions map-side, and the only shuffle is the per-document
    * count rollup over the (tiny) contaminated subset. Hash-collision
    * risk vs the string-exact oracle is the d03/d05/d11 argument
    * (P ≈ S²/2⁶⁵). */
  val decontamination: Q = (spark, dir) => {
    import spark.implicits._
    val K = 13
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", GraftFunctions.posShingleHashes(spark, $"text", K).as("hs"))
      .filter(size($"hs") > 0)
    val bench = docs.filter($"doc_id" % 5 === 0)
      .select(explode($"hs").as("s")).distinct()
    val train = docs.filter($"doc_id" % 5 =!= 0)
      .select($"doc_id", size($"hs").cast(LongType).as("total_positions"),
        explode($"hs").as("s"))
    train.join(broadcast(bench), Seq("s"))
      .groupBy($"doc_id", $"total_positions")
      .agg(count(lit(1)).as("contam_positions"),
        countDistinct($"s").as("contam_distinct"))
      .select($"doc_id", $"contam_positions", $"contam_distinct", $"total_positions")
      .orderBy($"doc_id")
  }

  val decontaminationSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 13),
      |sh AS (
      |  SELECT doc_id,
      |    unnest([array_to_string(t[i:i+12], ' ') for i in range(1, len(t) - 11)]) AS s
      |  FROM toks),
      |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 5 = 0),
      |hits AS (
      |  SELECT sh.doc_id, COUNT(*) AS contam_positions,
      |    COUNT(DISTINCT sh.s) AS contam_distinct
      |  FROM sh JOIN bench USING (s) WHERE sh.doc_id % 5 <> 0 GROUP BY sh.doc_id)
      |SELECT h.doc_id, h.contam_positions, h.contam_distinct,
      |  CAST(len(t.t) - 12 AS BIGINT) AS total_positions
      |FROM hits h JOIN toks t ON h.doc_id = t.doc_id
      |ORDER BY h.doc_id""".stripMargin

  /** t18 — contamination span REMOVAL (t17's surgical half — GPT-3
    * removed windows around each overlap rather than whole documents):
    * every token position covered by ANY matching 13-gram is removed,
    * and the per-source rollup reports how much survives. The union of
    * covered positions is computed exactly (distinct (doc, position)
    * after expanding each hit to its 13 token slots) — overlapping hits
    * never double-count, which is what makes removal accounting honest.
    *
    * Scale shape: same as t17 — benchmark grams broadcast, the corpus
    * hashes positions inside the scan (the positional kernel keeps the
    * gram→position mapping at 8 bytes each), and everything past the
    * broadcast join (expansion, distinct, both rollups) happens on the
    * contaminated subset only, which is orders of magnitude smaller
    * than the corpus. */
  val contaminationRemoval: Q = (spark, dir) => {
    import spark.implicits._
    val K = 13
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source",
        GraftFunctions.posShingleHashes(spark, $"text", K).as("hs"))
      .filter(size($"hs") > 0)
    val bench = docs.filter($"doc_id" % 5 === 0)
      .select(explode($"hs").as("s")).distinct()
    val train = docs.filter($"doc_id" % 5 =!= 0)
    val hits = train.select($"doc_id", posexplode($"hs").as(Seq("i", "s")))
      .join(broadcast(bench), Seq("s"))
    val removed = hits
      .select($"doc_id", explode(sequence($"i", $"i" + (K - 1))).as("j"))
      .distinct()
      .groupBy($"doc_id").agg(count(lit(1)).as("n_rm"))
    train
      .select($"doc_id", $"source",
        (size($"hs") + (K - 1)).cast(LongType).as("n_tokens"))
      .join(removed, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("n_rm"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"n_rm" > 0, 1).otherwise(0)).as("docs_cleaned"),
        sum($"n_tokens").as("tokens_total"),
        sum($"n_rm").as("tokens_removed"))
      .orderBy($"source")
  }

  val contaminationRemovalSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 13),
      |sh AS (
      |  SELECT doc_id, source, i, array_to_string(t[i:i+12], ' ') AS s
      |  FROM toks, UNNEST(generate_series(1, len(t) - 12)) AS g(i)),
      |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 5 = 0),
      |hits AS (SELECT sh.doc_id, sh.i FROM sh JOIN bench USING (s)
      |  WHERE sh.doc_id % 5 <> 0),
      |covered AS (
      |  SELECT DISTINCT doc_id, i + o AS j
      |  FROM hits, UNNEST(generate_series(0, 12)) AS oo(o)),
      |removed AS (SELECT doc_id, COUNT(*) AS n_rm FROM covered GROUP BY doc_id)
      |SELECT t.source, COUNT(*) AS n_docs,
      |  COUNT(r.doc_id) AS docs_cleaned,
      |  CAST(SUM(len(t.t)) AS BIGINT) AS tokens_total,
      |  CAST(COALESCE(SUM(r.n_rm), 0) AS BIGINT) AS tokens_removed
      |FROM toks t LEFT JOIN removed r ON t.doc_id = r.doc_id
      |WHERE t.doc_id % 5 <> 0
      |GROUP BY t.source ORDER BY t.source""".stripMargin

  val queries: Map[String, Q] = Map(
    "t18_contamination_removal" -> contaminationRemoval,
    "t17_decontamination" -> decontamination,
    "t15_sequence_packing" -> sequencePacking,
    "t16_domain_mixture" -> domainMixture,
    "t14_lm_quality_filter" -> lmQualityFilter,
    "t13_repetition" -> repetitionMetrics,
    "t12_filter_funnel" -> filterFunnel,
    "t11_tfidf_terms" -> tfidfTopTerms,
    "t10_pii_survey" -> piiSurvey,
    "t09_bigram_model" -> bigramModel,
    "t08_top_words" -> topWords,
    "t07_typed_source_stats" -> typedSourceStats,
    "t01_token_stats" -> tokenStats,
    "t02_quality_score" -> qualityScore,
    "t03_lang_id" -> langIdQuery,
    "t04_fingerprints" -> fingerprints,
    "t05_token_budget" -> tokenBudget,
    "t06_clean_text" -> cleanText)

  val oracles: Map[String, String] = Map(
    "t18_contamination_removal" -> contaminationRemovalSql,
    "t17_decontamination" -> decontaminationSql,
    "t15_sequence_packing" -> sequencePackingSql,
    "t16_domain_mixture" -> domainMixtureSql,
    "t14_lm_quality_filter" -> lmQualityFilterSql,
    "t13_repetition" -> repetitionMetricsSql,
    "t12_filter_funnel" -> filterFunnelSql,
    "t11_tfidf_terms" -> tfidfTopTermsSql,
    "t10_pii_survey" -> piiSurveySql,
    "t09_bigram_model" -> bigramModelSql,
    "t08_top_words" -> topWordsSql,
    "t07_typed_source_stats" -> typedSourceStatsSql,
    "t01_token_stats" -> tokenStatsSql,
    "t02_quality_score" -> qualityScoreSql,
    "t05_token_budget" -> tokenBudgetSql,
    "t06_clean_text" -> cleanTextSql)
}
