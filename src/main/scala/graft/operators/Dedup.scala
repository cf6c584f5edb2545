package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.GraftFunctions

/** Deduplication operators for training-data pipelines — exact, normalized,
  * MinHash+LSH, SimHash and n-gram-Jaccard, each over the `documents` table.
  *
  * Scale design: no operator here ever compares all pairs. Exact/normalized
  * dedup are hash aggregations (one shuffle on the hash). MinHash-LSH
  * shuffles only (doc_id, band_key) pairs — `bands` longs per document —
  * and meets candidates in a band-bucket join, the standard sub-quadratic
  * near-dup plan at 100 TB. Verification joins fetch shingle sets for
  * candidate pairs only. Skewed buckets (boilerplate-heavy corpora) are
  * handled by AQE skew-join (enabled in Sessions).
  */
object Dedup {

  type Q = (SparkSession, String) => DataFrame

  /** Rows one LSH band may contribute to a single self-join block before
    * [[guardedBandPairs]] grid-splits it (guide §2.5). A band of n docs
    * yields n(n-1)/2 candidate pairs no matter how the join is laid out —
    * that work is the candidate-generation contract — but without a split
    * the whole n² lands on the ONE task owning the band's hash partition
    * (AQE skew handling never splits a repartition-aligned self-join).
    * With the cap, per-block work is ≤ (2·cap)² comparisons and a hot
    * band (boilerplate duplicated across millions of docs at 100 TB)
    * spreads over ⌈n/cap⌉·(⌈n/cap⌉+1)/2 independent blocks/tasks. */
  val BandSplitCap = 256

  /** LSH band self-join with a hot-band skew guard: candidate pairs
    * (doc_a < doc_b) sharing (band_idx, band_key), exactly the classic
    * `bands ⋈ bands` — but big bands are GRID-SPLIT so no single task owns
    * a quadratic blob (guide §2.5; r21 verdict task 2).
    *
    * Shape: one exchange keyed on the band materializes the signature
    * kernel ONCE (the r21 single-kernel property — the second join side
    * stays a ReusedExchange); a window count over that same partitioning
    * (no extra exchange) sizes each band; every row then fans out to the
    * ⌈n/cap⌉ grid blocks its deterministic salt participates in, and the
    * block-keyed exchange spreads the blocks over tasks. g = 1 (the
    * overwhelmingly common case) degenerates to one block per band —
    * replication 1, identical candidate set.
    *
    * Pair-exactness (BandSkewGuardSpec pins it): a co-banded pair with
    * salts (sa, sb) meets in block (min,max)(sa,sb) — emitted by both
    * rows via t = other's salt — and in NO other block when sa ≠ sb
    * (a block (i,j) holds a row iff its salt ∈ {i,j}); equal salts
    * co-occur in every block containing sa, so the join keeps only the
    * diagonal (sa,sa). Each qualifying pair appears EXACTLY once per
    * shared band — same multiset the unsplit join produced — and the
    * caller's distinct() collapses cross-band repeats as before.
    *
    * `carry` columns ride through to the output as `<c>_a` / `<c>_b`
    * (d04 carries the simhash so the verify stage needs no re-join). */
  private[graft] def guardedBandPairs(bands: DataFrame,
      carry: Seq[String] = Nil, cap: Int = BandSplitCap): DataFrame = {
    val ss = bands.sparkSession
    import ss.implicits._
    val wBand = Window.partitionBy($"band_idx", $"band_key")
    val split = bands
      .repartition($"band_idx", $"band_key")
      .withColumn("_g",
        ceil(count(lit(1)).over(wBand) / lit(cap.toDouble)).cast("int"))
      // deterministic salt (guide §2.5: never rand() — a retried task
      // must re-derive the same placement)
      .withColumn("_s", pmod(xxhash64($"doc_id"), $"_g".cast("long")).cast("int"))
      .withColumn("_t", explode(sequence(lit(0), $"_g" - 1)))
      .select(Seq($"doc_id", $"band_idx", $"band_key", $"_s",
        least($"_s", $"_t").as("_blo"), greatest($"_s", $"_t").as("_bhi")) ++
        carry.map(col): _*)
      .repartition($"band_idx", $"band_key", $"_blo", $"_bhi")
    split.as("a")
      .join(split.as("b"),
        $"a.band_idx" === $"b.band_idx" && $"a.band_key" === $"b.band_key" &&
          $"a._blo" === $"b._blo" && $"a._bhi" === $"b._bhi" &&
          ($"a._s" =!= $"b._s" || $"a._blo" === $"a._bhi") &&
          $"a.doc_id" < $"b.doc_id")
      .select(Seq($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")) ++
        carry.flatMap(c =>
          Seq(col(s"a.$c").as(s"${c}_a"), col(s"b.$c").as(s"${c}_b"))): _*)
  }

  /** Exact dedup: group identical texts, keep the smallest doc_id.
    * A plain hash aggregation — Spark's partial aggregation dedups map-side
    * before the shuffle. */
  val exactDedup: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .groupBy(md5($"text").as("text_md5"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keep_doc_id"))
      .orderBy($"text_md5")
  }

  val exactDedupSql: String =
    """SELECT md5(text) AS text_md5, COUNT(*) AS n_copies, MIN(doc_id) AS keep_doc_id
      |FROM documents GROUP BY md5(text) ORDER BY text_md5""".stripMargin

  /** Formatting-insensitive dedup: case-fold, strip non-alphanumerics,
    * collapse whitespace, then exact-dedup the normalized text.
    * Normalization is the codegen'd one-pass `NormalizeText` kernel — the
    * double-java-regex formulation it replaces cost ~51 ms/document, which
    * at 100 TB of text is the whole pipeline's CPU budget. */
  val normalizedDedup: Q = (spark, dir) => {
    import spark.implicits._
    val norm = GraftFunctions.normalizeText(spark, $"text")
    Tables.load(spark, dir, "documents")
      .groupBy(md5(norm).as("norm_md5"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keep_doc_id"))
      .orderBy($"norm_md5")
  }

  val normalizedDedupSql: String =
    """SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_md5,
      |  COUNT(*) AS n_copies, MIN(doc_id) AS keep_doc_id
      |FROM documents GROUP BY 1 ORDER BY norm_md5""".stripMargin

  /** MinHash + LSH near-dup pairs, verified with exact shingle Jaccard.
    *
    * Plan: 64-hash signature → 16 bands × 4 rows (inside one codegen'd
    * expression, nothing materialized but 16 band keys/doc) → explode →
    * self-join on (band_idx, key) → distinct candidate pairs → exact
    * verify via array_intersect on the candidates' shingle sets → j ≥ 0.8.
    *
    * With the planted near-dups at j ≥ 0.97, P[miss] = (1-j⁴)¹⁶ < 1e-14,
    * so the LSH output equals the brute-force oracle exactly — approximate
    * recall, exact precision.
    */
  val minhashDedup: Q = (spark, dir) => {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    val withShingles = docs
      .withColumn("shingles", GraftFunctions.shingleHashes(spark, $"text", 3))
      .select($"doc_id", $"shingles")
    // skew-guarded single-kernel band self-join: the signature kernel
    // (64 minhashes per doc — the entry's dominant CPU) materializes
    // through guardedBandPairs' first exchange ONCE (second side reuses
    // it; guide §2.4), and hot bands grid-split so no task owns a
    // quadratic blob (guide §2.5). Shuffles carry 16 longs/doc — noise
    // next to the kernel.
    val bands = docs
      .select($"doc_id",
        posexplode(GraftFunctions.minhashBands(spark, $"text", 3, 64, 16)))
      .toDF("doc_id", "band_idx", "band_key")
    val candidates = guardedBandPairs(bands).distinct()
    candidates
      .join(withShingles.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
      .join(withShingles.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
      .withColumn("n_inter", size(array_intersect($"sh_a", $"sh_b")))
      // integer cross-multiplied acceptance (r21): i/(sa+sb-i) >= 0.8
      // ⟺ 9i >= 4(sa+sb) in exact integers, and the double-division
      // compare agrees at EVERY reachable cardinality (the only rational
      // within an ulp of 0.8 is 4/5 itself, which divides to the 0.8
      // literal exactly — checked exhaustively to |sa|+|sb| = 300k).
      // Filtering on the single n_inter reference keeps the pushed-down
      // join condition at ONE array_intersect evaluation; the old
      // jaccard-column filter substituted the intersect TWICE into the
      // condition plus once in the projection. Output values unchanged —
      // jaccard is still the same double division.
      // The sa+sb > 0 guard (r22) covers the one case where the integer
      // form diverges from `jaccard >= 0.8`: token-less docs have EMPTY
      // shingle sets (all-MaxValue minhash signatures ⇒ they collide on
      // every band and become candidates), where 0 >= 0 would pass the
      // filter and the jaccard projection's 0/0 then THROWS under ANSI
      // mode (Spark 4 default) — and the oracle's shingle join produces
      // no such pair at all, so dropping is the correct and the old
      // (pre-integer-filter) behavior (EmptyDocGuardSpec).
      .filter($"n_inter" * 9 >= (size($"sh_a") + size($"sh_b")) * 4 &&
        size($"sh_a") + size($"sh_b") > 0)
      .withColumn("jaccard",
        $"n_inter".cast(DoubleType) / (size($"sh_a") + size($"sh_b") - $"n_inter"))
      .select($"doc_a", $"doc_b", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  /** Brute-force exact-Jaccard oracle (the ground truth LSH must match). */
  val minhashDedupSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)])) s FROM w),
      |cnt AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT ida AS doc_a, idb AS doc_b,
      |  CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
      |FROM inter JOIN cnt ca ON ida = ca.doc_id JOIN cnt cb ON idb = cb.doc_id
      |WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** SimHash near-dup pairs: 64-bit fingerprint, banded into 4 × 16-bit
    * chunks (Hamming ≤ 3 ⇒ at least one chunk equal, pigeonhole), verified
    * by exact Hamming distance. Rows-only gate: the hash family is
    * engine-specific, so no SQL oracle — covered by ScalaTest instead. */
  val simhashPairs: Q = (spark, dir) => {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", GraftFunctions.simhash64(spark, $"text", 3).as("sh"))
    // skew-guarded single-kernel band self-join (see guardedBandPairs):
    // the simhash kernel runs once, hot chunks grid-split; the fingerprint
    // rides through as a carry column so the verify needs no re-join
    val chunks = docs.select($"doc_id", $"sh",
      posexplode(array((0 until 4).map(i =>
        $"sh".bitwiseAND(lit(0xffffL << (i * 16)))): _*)))
      .toDF("doc_id", "sh", "band_idx", "band_key")
    guardedBandPairs(chunks, carry = Seq("sh"))
      .distinct()
      .withColumn("hamming", bit_count($"sh_a".bitwiseXOR($"sh_b")))
      .filter($"hamming" <= 3)
      .select($"doc_a", $"doc_b", $"hamming")
      .orderBy($"doc_a", $"doc_b")
  }

  /** Character-n-gram Jaccard near-dups: MinHash-LSH over the 8-gram set
    * for candidate generation, exact gram-set Jaccard for verification.
    *
    * A plain inverted-index join is quadratic on repetitive corpora (every
    * frequent gram's posting list cross-joins — measured 122 s vs 3 s at
    * sf0.1 on this vocabulary); banding shuffles only 16 longs per doc
    * regardless of gram frequencies, and the exact verify keeps the output
    * equal to the brute-force oracle (planted pairs sit at j ≥ 0.97, so
    * P[LSH miss] < 1e-14). */
  val chargramJaccard: Q = (spark, dir) => {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    val grams = docs
      .select($"doc_id", GraftFunctions.chargramHashes(spark, $"text", 8).as("grams"))
    // skew-guarded single-kernel band self-join (see guardedBandPairs):
    // the chargram-minhash kernel runs once, hot bands grid-split
    val bands = docs
      .select($"doc_id", posexplode(GraftFunctions.chargramBands(spark, $"text", 8, 64, 16)))
      .toDF("doc_id", "band_idx", "band_key")
    val candidates = guardedBandPairs(bands).distinct()
    candidates
      .join(grams.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("grams", "g_a"), "doc_a")
      .join(grams.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("grams", "g_b"), "doc_b")
      .withColumn("i", size(array_intersect($"g_a", $"g_b")))
      // integer cross-multiplied acceptance — see minhashDedup: one
      // intersect evaluation in the pushed-down condition instead of two,
      // provably the same rows, identical jaccard values; the g_a+g_b > 0
      // guard covers texts shorter than 8 chars (empty gram sets collide
      // on every band), where the jaccard projection's 0/0 would THROW
      // under ANSI and the oracle emits no pair — see minhashDedup
      .filter($"i" * 9 >= (size($"g_a") + size($"g_b")) * 4 &&
        size($"g_a") + size($"g_b") > 0)
      .withColumn("jaccard", $"i".cast(DoubleType) / (size($"g_a") + size($"g_b") - $"i"))
      .select($"doc_a", $"doc_b", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  val chargramJaccardSql: String =
    """WITH sh AS (SELECT doc_id, unnest(list_distinct([text[i:i+7] for i in range(1, length(text) - 6)])) s FROM documents),
      |cnt AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) i
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT ida AS doc_a, idb AS doc_b,
      |  CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
      |FROM inter JOIN cnt ca ON ida = ca.doc_id JOIN cnt cb ON idb = cb.doc_id
      |WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** How many rows a block may hold before [[embeddingNearDup]]'s exact
    * all-pairs verify refuses to run (10k rows ⇒ ≤ 50M pair evals per
    * block — minutes of one executor core, the intended ceiling). */
  val ExactVerifyMaxBlock = 10000L

  /** Exact-verify near-dup ranking over BOUNDED blocks: top-20
    * most-similar within-block pairs by exact cosine. This operator is the
    * verify/re-rank stage of a blocked dedup pipeline — the blocking key
    * here is the label column; at 100 TB it is d07's IVF coarse-quantizer
    * bucket (which bounds block sizes geometrically) feeding this same
    * exact stage. All-pairs within a block is the contract, NOT a scale
    * accident, so the bound is enforced IN-PLAN: a raise_error filter
    * (lazy, distributed, no driver action) fails the job loudly if any
    * block exceeds [[ExactVerifyMaxBlock]] instead of silently going
    * quadratic — callers with unbounded blocks belong on d07. */
  val embeddingNearDup: Q = (spark, dir) => {
    import spark.implicits._
    // codegen'd dot kernel — same IEEE fold as the zip_with+aggregate form
    // (bit-identical, see graft.functions.DotProduct), no interpreter
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      GraftFunctions.dot(spark, a, b)
    // Hoist each row's norm out of the pair join: O(n) norms instead of
    // O(pairs) — same double values (identical computation, done once),
    // so oracle parity is preserved while flops drop ~3×.
    val emb = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"label", $"embedding",
        sqrt(dot($"embedding", $"embedding")).as("norm"))
    val guarded = boundedBlocks(emb, $"label", ExactVerifyMaxBlock, "d06")
    guarded.as("a")
      .join(guarded.as("b"), $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        (dot($"a.embedding", $"b.embedding") / ($"a.norm" * $"b.norm")).as("cosine"))
      .orderBy($"cosine".desc, $"vec_a", $"vec_b")
      .limit(20)
  }

  /** Enforce a block-size bound inside the plan: per-key counts (one
    * map-side-combined agg, KB-scale result) broadcast back onto the rows,
    * and a filter whose predicate raises when a block is over `maxBlock`
    * and passes every row otherwise. The filter USES the count column, so
    * Catalyst cannot prune the guard away, and no rows are dropped when
    * the bound holds — downstream results are unchanged (oracle-safe). */
  private[graft] def boundedBlocks(df: DataFrame, key: org.apache.spark.sql.Column,
      maxBlock: Long, tag: String): DataFrame = {
    val sizes = df.groupBy(key.as("_block_key")).agg(count(lit(1)).as("_block_n"))
    df.join(broadcast(sizes), key === col("_block_key"))
      .filter(when(col("_block_n") > maxBlock,
        raise_error(concat(lit(s"$tag: block over exact-verify bound $maxBlock rows: "),
          col("_block_key").cast("string"))))
        .otherwise(lit(true)))
      .drop("_block_key", "_block_n")
  }

  val embeddingNearDupSql: String =
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE for i in range(1, len(a.embedding) + 1)]) /
      |  (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE for i in range(1, len(a.embedding) + 1)])) *
      |   sqrt(list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE for i in range(1, len(b.embedding) + 1)]))) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
      |ORDER BY cosine DESC, vec_a, vec_b
      |LIMIT 20""".stripMargin

  /** IVF-bucketed candidate pairs: corpus hashed once into 2^nBits
    * sign-random-projection buckets (the coarse quantizer), pairs meet iff
    * their codes differ in ≤ `maxFlips` bits — a banded bucket self-join,
    * never all-pairs. Shuffles only (vec_id, bucket) plus the static probe
    * fan-out; embeddings are re-joined for the exact verify on candidates
    * only (same shape as the MinHash verify stage). */
  private[graft] def ivfCandidatePairs(
      emb: DataFrame, nBits: Int, maxFlips: Int, dim: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val planes = Similarity.hyperplanes(nBits, dim)
    val hashed = emb.select(emb("vec_id"),
      Similarity.bucketOf(emb("embedding"), planes).as("bucket"))
    val subsets = (1 to maxFlips).flatMap(sz => (0 until nBits).combinations(sz).toSeq)
    val masks: Seq[Int] = 0 +: subsets.map(_.map(1 << _).reduce(_ | _))
    val probes = hashed.select(col("vec_id").as("vec_b"),
      explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("probe"))
    hashed.join(probes, col("bucket") === col("probe") && col("vec_id") < col("vec_b"))
      .select(col("vec_id").as("vec_a"), col("vec_b"))
      .distinct()
  }

  /** Embedding near-dup, IVF-blocked (the 100 TB scale path d06's scaladoc
    * promises): coarse-quantizer bucket join generates candidates — ~56 of
    * 1024 buckets per vector ≈ 5% of the pair space here, shrinking
    * geometrically as nBits tracks log2(n) — then exact cosine re-ranks
    * and keeps the top 20. Approximate by design on the uniform-random
    * testdata (top-of-noise pairs at cosine ≈ 0.4 don't co-bucket
    * reliably); planted near-dups at cosine ≥ 0.99 are recovered with
    * recall 1.0 — asserted in SimilaritySpec — which is the semantics a
    * dedup pipeline needs. Deterministic output pinned by a golden VALUES
    * oracle; d06 keeps the exact within-label plan for exact-ranking
    * semantics. */
  val embeddingIvfNearDup: Q = (spark, dir) => {
    import spark.implicits._
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      GraftFunctions.dot(spark, a, b)
    val emb = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding", sqrt(dot($"embedding", $"embedding")).as("norm"))
    val cands = ivfCandidatePairs(emb, nBits = 10, maxFlips = 2, dim = 64)
    cands
      .join(emb.select($"vec_id".as("vec_a"), $"embedding".as("e_a"), $"norm".as("n_a")), "vec_a")
      .join(emb.select($"vec_id".as("vec_b"), $"embedding".as("e_b"), $"norm".as("n_b")), "vec_b")
      .select($"vec_a", $"vec_b", (dot($"e_a", $"e_b") / ($"n_a" * $"n_b")).as("cosine"))
      .orderBy($"cosine".desc, $"vec_a", $"vec_b")
      .limit(20)
  }

  /** Bloom pre-join pruning — the runtime-filter pattern for 100 TB
    * joins, surfaced as an operator: build a bloom sketch of the
    * reference-side keys (one mergeable aggregate → a KB-scale binary),
    * broadcast it, drop probe-side rows that cannot match BEFORE the
    * shuffle join, then an exact semi join removes the bloom's false
    * positives so the result is exactly the plain semi join (the oracle).
    * Here: customers who placed a high-value order — the bloom prunes the
    * customer scan down to ~|matches| rows pre-shuffle. */
  val bloomPrefilter: Q = (spark, dir) => {
    GraftFunctions.register(spark)
    graft.Tables.registerAll(spark, dir)
    // the bloom must reach might_contain as a scalar subquery (analyzer
    // constraint on BloomFilterMightContain); Catalyst evaluates it once
    // and broadcasts the KB-scale sketch into the probe-side scan filter
    spark.sql(
      """SELECT c_custkey, c_name,
        |  CAST(ROUND(CAST(c_acctbal AS DECIMAL(12,2)), 2) AS DOUBLE) AS c_acctbal
        |FROM customer
        |WHERE graft_might_contain(
        |    (SELECT graft_bloom_agg(xxhash64(o_custkey))
        |     FROM orders WHERE o_totalprice > 400000.0),
        |    xxhash64(c_custkey))
        |  AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  val bloomPrefilterSql: String =
    """SELECT c_custkey, c_name,
      |  CAST(ROUND(CAST(c_acctbal AS DECIMAL(12,2)), 2) AS DOUBLE) AS c_acctbal
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Near-dup CLUSTERS: connected components over the MinHash-LSH pair
    * graph, each doc labeled with its component's minimum doc_id — the
    * step that turns a pair list into canonical dedup groups (keep one
    * representative per cluster).
    *
    * Min-label propagation to fixpoint: every iteration is one
    * shuffle-join (labels ⋈ edges → min neighbor label), converging in
    * O(component diameter) rounds — near-dup components are tiny (pairs/
    * triples), so 2-3 rounds in practice. The driver loop only checks the
    * convergence count; at web scale the same loop is the large-star/
    * small-star algorithm (Kiveris et al., "Connected Components in
    * MapReduce"), identical join shape. */
  val neardupClusters: Q = (spark, dir) => {
    import spark.implicits._
    val pairs = minhashDedup(spark, dir).select($"doc_a", $"doc_b")
    val edges = pairs.union(pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      .toDF("src", "dst").cache()
    // r21: round 1 fused into the seed — with identity labels, the first
    // propagation round reduces to min-over-direct-neighbors, which is
    // one groupBy over the edge list instead of a join round (every node
    // appears as src: the edge set is symmetrized above). Result-
    // identical: min-label propagation converges to the same fixpoint
    // from any monotone prefix of itself.
    var labels = edges.groupBy($"src").agg(min($"dst").as("n0"))
      .select($"src".as("doc_id"), least($"src", $"n0").as("lbl"))
      .cache()
    // min-label propagation is monotone non-increasing, so the label sum
    // is a fixpoint detector: one cheap aggregate per round instead of a
    // join-based diff.
    // The edge set is duplicates-only (a sliver of the corpus), so the
    // iteration's joins shuffle KBs — the session's corpus-sized shuffle
    // parallelism would spend more on task scheduling than on work across
    // the O(diameter) rounds. Scoped down for the loop, restored after;
    // a production run over a trillion-doc pair graph would size this to
    // the edge count instead.
    val shufKey = "spark.sql.shuffle.partitions"
    val prevShuf = spark.conf.get(shufKey)
    spark.conf.set(shufKey, "4")
    def labelSum(df: org.apache.spark.sql.DataFrame): Long = {
      val row = df.agg(org.apache.spark.sql.functions.sum($"lbl")).head()
      if (row.isNullAt(0)) 0L else row.getLong(0) // null ⟺ no pairs at this sf
    }
    var converged = false
    var rounds = 0
    // r22: BOTH iteration caches release on every exit path — the edge
    // cache previously survived a convergence-cap throw until session end
    // (a guide-§5 leak in a long-lived session; the per-round label caches
    // were already managed). The happy path unpersists only after the
    // checkpoint below materializes the result.
    try {
      try {
      // r21 (session 2): the convergence baseline is the SEED's label sum —
      // one cheap aggregate whose action also materializes the edge cache
      // and the (now cached) seed labels exactly once. Labels are monotone
      // non-increasing under min-propagation, so sum-unchanged ⟺ no node
      // changed; comparing round 1 against the seed detects the (typical:
      // pair/triple components) already-converged case after ONE join round
      // instead of two, and the cached seed keeps the kernel pipeline out
      // of round 1's twice-referencing join plan.
        var prevSum = labelSum(labels)
        while (!converged && rounds < 20) {
          val viaNeighbor = edges
            .join(labels.withColumnRenamed("doc_id", "dst").withColumnRenamed("lbl", "n_lbl"), "dst")
            .groupBy($"src".as("doc_id")).agg(min($"n_lbl").as("n_lbl"))
          val next = labels.join(viaNeighbor, Seq("doc_id"), "left_outer")
            .select($"doc_id", least($"lbl", coalesce($"n_lbl", $"lbl")).as("lbl"))
            .cache()
          val sum = labelSum(next)
          labels.unpersist()
          labels = next
          converged = sum == prevSum
          prevSum = sum
          rounds += 1
        }
      } finally spark.conf.set(shufKey, prevShuf)
      // propagation covers one hop per round: a component with diameter
      // beyond the cap would emit wrong labels — fail loudly instead
      if (!converged) throw new IllegalStateException(
        s"neardup clustering did not converge in $rounds rounds — component diameter exceeds cap")
      // the final labels stay cached only until the plan is consumed; make
      // the result independent of the iteration caches. On a CLUSTER that
      // means a RELIABLE checkpoint (session checkpoint dir), not
      // localCheckpoint: executor-local blocks vanish with a lost executor,
      // and an iterative result must survive executor churn at scale —
      // require an explicit shared HDFS/S3 checkpoint dir. In LOCAL mode
      // there is no executor churn (one JVM, no dynamic allocation), so
      // localCheckpoint gives the same lineage cut without writing and
      // re-reading the result through the filesystem.
      val projected = labels.select($"doc_id", $"lbl".as("cluster_rep")).orderBy($"doc_id")
      if (spark.sparkContext.isLocal) projected.localCheckpoint()
      else {
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          throw new IllegalStateException(
            "neardup clustering needs a RELIABLE checkpoint on shared storage: " +
              "set spark.sparkContext.setCheckpointDir to an HDFS/S3 path")
        projected.checkpoint()
      }
    } finally {
      edges.unpersist()
      labels.unpersist()
    }
  }

  /** Oracle: transitive closure via recursive CTE over the same
    * brute-force pair graph, min reachable id per node. */
  val neardupClustersSql: String = {
    val pairBody = minhashDedupSql
      .replace("ORDER BY doc_a, doc_b", "")
    s"""WITH RECURSIVE lsh_pairs AS ($pairBody),
       |nodes AS (SELECT doc_a AS id FROM lsh_pairs UNION SELECT doc_b FROM lsh_pairs),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM lsh_pairs
       |          UNION SELECT doc_b, doc_a FROM lsh_pairs),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id)
       |SELECT id AS doc_id, MIN(r) AS cluster_rep FROM reach
       |GROUP BY id ORDER BY doc_id""".stripMargin
  }

  /** Incremental-ingest dedup: which documents of a NEW batch are novel
    * against the existing corpus, by normalized-text hash — the admission
    * check every continuously-ingesting training pipeline runs. One
    * anti-join on the hash (both sides hash-partitioned, map-side
    * pre-aggregated); at 100 TB the corpus side is a bucketed hash table
    * so only the new batch shuffles. */
  val incrementalIngest: Q = (spark, dir) => {
    import spark.implicits._
    val norm = GraftFunctions.normalizeText(spark, $"text")
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source", md5(norm).as("h"))
    val corpus = docs.filter($"doc_id" < 400).select($"h").distinct()
    docs.filter($"doc_id" >= 400)
      .join(corpus, Seq("h"), "left_anti")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_novel"), min($"doc_id").as("first_novel"))
      .orderBy($"source")
  }

  /** NOT EXISTS, not NOT IN: a NULL hash in the corpus would turn NOT IN
    * into zero rows (three-valued logic) while Spark's left_anti keeps
    * non-matching rows — NOT EXISTS matches left_anti's null semantics. */
  val incrementalIngestSql: String =
    """WITH h AS (SELECT doc_id, source,
      |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS h
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_novel, MIN(doc_id) AS first_novel
      |FROM h b
      |WHERE doc_id >= 400
      |  AND NOT EXISTS (SELECT 1 FROM h c WHERE c.doc_id < 400 AND c.h = b.h)
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- d11
  /** Duplicate-passage contamination report: positional 8-token shingles,
    * a shingle occurring in ≥2 documents is "duplicated", and each doc is
    * scored by how many of its positions sit inside duplicated passages —
    * the passage-level (CCNet-style) complement of the whole-document
    * dedups d01-d05. All output columns are integers, so the entry is
    * bit-deterministic with no float conventions needed.
    *
    * Scale shape: shingling is map-side (transform+explode inside the
    * scan), document frequency is one partial-aggregated shuffle keyed by
    * shingle, and the count-back join is shuffle-on-shingle with AQE free
    * to broadcast the (rare) duplicated-shingle side — at 100 TB the
    * duplicated subset is orders of magnitude smaller than the corpus. */
  val dupPassages: Q = (spark, dir) => {
    import spark.implicits._
    val K = 8
    // shingles come from the codegen'd rolling kernel (one static call per
    // row, no per-window array allocation) and are 64-bit hashes, so the
    // shuffle carries 8 bytes per position instead of ~50-char strings; a
    // cross-shingle hash collision (P ≈ S²/2⁶⁵) would surface as a
    // mismatch against the string-exact oracle, same argument as d03/d05
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        GraftFunctions.posShingleHashes(spark, $"text", K).as("hs"))
      .filter(size($"hs") > 0)
    val sh = docs.select($"doc_id", explode($"hs").as("s"))
    // one pass over the shingle stream: positions per (shingle, doc) in
    // one partially-aggregated shuffle, then document frequency as an
    // unordered window over the (much smaller) per-pair rollup — no
    // second corpus scan and no join back. The window sorts rather than
    // materializes per-shingle lists, so a pathologically common passage
    // (boilerplate in millions of docs) spills instead of OOMing.
    val perPair = sh.groupBy($"s", $"doc_id").agg(count(lit(1)).as("n_pos"))
    val wS = org.apache.spark.sql.expressions.Window.partitionBy($"s")
    val perDoc = perPair
      .withColumn("df", count(lit(1)).over(wS))
      .filter($"df" >= 2)
      .groupBy($"doc_id").agg(sum($"n_pos").as("dup_positions"))
    // total positions come from the same per-pair rollup — the corpus
    // (and the shingle kernel) is scanned exactly once
    val perDocTotal = perPair.groupBy($"doc_id").agg(sum($"n_pos").as("total_positions"))
    perDocTotal
      .join(perDoc, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("dup_positions"))
      .select($"doc_id", $"dup_positions", $"total_positions")
      .orderBy($"dup_positions".desc, $"doc_id")
      .limit(20)
  }

  val dupPassagesSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 8),
      |sh AS (
      |  SELECT doc_id,
      |    unnest([array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)]) AS s
      |  FROM toks),
      |dfreq AS (
      |  SELECT s FROM (SELECT DISTINCT doc_id, s FROM sh)
      |  GROUP BY s HAVING COUNT(*) >= 2),
      |per_doc AS (
      |  SELECT sh.doc_id, COUNT(*) AS dup_positions
      |  FROM sh JOIN dfreq ON sh.s = dfreq.s GROUP BY sh.doc_id)
      |SELECT t.doc_id, CAST(COALESCE(p.dup_positions, 0) AS BIGINT) AS dup_positions,
      |  CAST(len(t.t) - 7 AS BIGINT) AS total_positions
      |FROM toks t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
      |ORDER BY dup_positions DESC, t.doc_id LIMIT 20""".stripMargin

  /** SemDeDup (semantic dedup, Abbas et al. 2023's pipeline shape): an
    * embedding-space dedup pass that k-means-clusters the corpus, then
    * removes near-duplicates WITHIN each cluster only — the trick that
    * turns the O(n²) semantic-similarity dedup into k independent
    * O((n/k)²) blocks that each fit an executor. Centroids here are the
    * s03 coarse quantizer (first 8 vectors — deterministic); a document
    * drops iff some LOWER-id member of its cluster sits within cosine
    * ≥ τ (keep-min-id: the representative survives, every later
    * near-copy goes). One broadcast-centroid scan assigns, one
    * cluster-keyed self-join generates candidate pairs (shuffle on the
    * cluster id, never all-pairs), and a guard FAILS LOUDLY if any
    * cluster exceeds the exact-verify cap — at 100 TB you raise k, not
    * the cap. Output: per-cluster membership / drop counts, oracle-
    * recomputed exactly in DuckDB (the dot kernel's left-to-right double
    * fold matches list_sum, s01/s03-pinned). */
  val semDedup: Q = (spark, dir) => {
    import spark.implicits._
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      GraftFunctions.dot(spark, a, b)
    val tau = 0.35
    val emb = Tables.load(spark, dir, "embeddings")
      .select($"vec_id", $"embedding", sqrt(dot($"embedding", $"embedding")).as("norm"))
    val cents = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding".as("c_emb"), $"norm".as("c_norm"))
    val w = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"cid")
    val assigned = emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"embedding", $"norm", $"cid",
        (dot($"embedding", $"c_emb") / ($"norm" * $"c_norm")).as("sim"))
      .withColumn("rnk", row_number().over(w)).filter($"rnk" === 1)
      .select($"cid", $"vec_id", $"embedding", $"norm")
    val maxCluster = assigned.groupBy($"cid").count()
      .agg(max($"count")).head().getLong(0)
    require(maxCluster <= 100000, s"SemDeDup cluster of $maxCluster members " +
      "exceeds the exact-verify cap — raise the centroid count (k tracks n)")
    val a = assigned.select($"cid".as("cid_a"), $"vec_id".as("ia"),
      $"embedding".as("ea"), $"norm".as("na"))
    val b = assigned.select($"cid".as("cid_b"), $"vec_id".as("ib"),
      $"embedding".as("eb"), $"norm".as("nb"))
    val dropped = a.join(b, $"cid_a" === $"cid_b" && $"ia" < $"ib")
      .filter(dot($"ea", $"eb") / ($"na" * $"nb") >= tau)
      .select($"cid_b".as("cid"), $"ib".as("vec_id")).distinct()
      .withColumn("is_dup", lit(1L))
    assigned.select($"cid", $"vec_id")
      .join(dropped, Seq("cid", "vec_id"), "left_outer")
      .groupBy($"cid")
      .agg(count(lit(1)).as("n_members"),
        sum(coalesce($"is_dup", lit(0L))).as("n_dropped"),
        sum(when($"is_dup".isNotNull, $"vec_id").otherwise(lit(0L))).as("sum_dropped"))
      .orderBy($"cid")
      .select($"cid".as("centroid_id"), $"n_members", $"n_dropped", $"sum_dropped")
  }

  val semDedupSql: String =
    """WITH cents AS (
      |  SELECT vec_id AS cid, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
      |sims AS (
      |  SELECT e.vec_id, c.cid,
      |    list_sum([e.embedding[i]::DOUBLE * c.c_emb[i]::DOUBLE for i in range(1, len(e.embedding) + 1)]) /
      |    (sqrt(list_sum([e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE for i in range(1, len(e.embedding) + 1)])) *
      |     sqrt(list_sum([c.c_emb[i]::DOUBLE * c.c_emb[i]::DOUBLE for i in range(1, len(c.c_emb) + 1)]))) AS sim
      |  FROM embeddings e CROSS JOIN cents c),
      |assign AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rnk
      |    FROM sims) WHERE rnk = 1),
      |pairs AS (
      |  SELECT a.cid, b.vec_id AS ib
      |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
      |  JOIN embeddings ea ON ea.vec_id = a.vec_id
      |  JOIN embeddings eb ON eb.vec_id = b.vec_id
      |  WHERE list_sum([ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE for i in range(1, len(ea.embedding) + 1)]) /
      |    (sqrt(list_sum([ea.embedding[i]::DOUBLE * ea.embedding[i]::DOUBLE for i in range(1, len(ea.embedding) + 1)])) *
      |     sqrt(list_sum([eb.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE for i in range(1, len(eb.embedding) + 1)]))) >= 0.35),
      |dropped AS (SELECT DISTINCT cid, ib AS vec_id FROM pairs)
      |SELECT a.cid AS centroid_id, COUNT(*) AS n_members,
      |  CAST(COUNT(d.vec_id) AS BIGINT) AS n_dropped,
      |  CAST(COALESCE(SUM(d.vec_id), 0) AS BIGINT) AS sum_dropped
      |FROM assign a LEFT JOIN dropped d ON a.cid = d.cid AND a.vec_id = d.vec_id
      |GROUP BY a.cid ORDER BY a.cid""".stripMargin

  /** d13 — EDIT-DISTANCE near-dup: the character-level axis the gram/
    * token families can't see (a doc with small in-place edits keeps a
    * low Levenshtein distance even when edits land in every shingle).
    * Candidates come from the SAME chargram-minhash bands as d05 —
    * banding shuffles 16 longs per doc, never all-pairs — and each
    * candidate pair is verified by the exact codegen'd `levenshtein`
    * kernel with an INTEGER acceptance test (dist·10 ≤ max(len): relative
    * distance ≤ 0.1 with no FP division — bit-free cross-engine
    * equality). A qualifying pair always shares an 8-gram (≤0.1·L edits
    * leave an unedited run ≥ 9 chars by pigeonhole), so the oracle's
    * shared-gram candidate set covers every true pair; band recall on
    * the planted near-dups matches d05's documented P[miss] < 1e-14. At
    * 100 TB the verify cost is bounded by the candidate count, not the
    * corpus — the O(L²) kernel runs only on banded pairs. */
  val editDistanceDedup: Q = (spark, dir) => {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    // skew-guarded single-kernel band self-join (see guardedBandPairs):
    // the chargram-minhash kernel runs once, hot bands grid-split
    val bands = docs
      .select($"doc_id", posexplode(GraftFunctions.chargramBands(spark, $"text", 8, 64, 16)))
      .toDF("doc_id", "band_idx", "band_key")
    val candidates = guardedBandPairs(bands).distinct()
    candidates
      .join(docs.select($"doc_id".as("doc_a"), $"text".as("t_a")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"text".as("t_b")), "doc_b")
      .withColumn("max_len", greatest(length($"t_a"), length($"t_b")))
      // edit distance >= |length difference|: an integer prefilter kills
      // band collisions between different-length docs BEFORE the kernel
      // ever runs — the verify cost tracks true near-dups, not
      // collision noise
      .filter(abs(length($"t_a") - length($"t_b")) * 10 <= $"max_len")
      // THRESHOLDED levenshtein: the acceptance test only keeps
      // dist*10 <= max_len, i.e. dist <= max_len DIV 10, so the banded
      // O(threshold·L) algorithm (Spark's built-in 3-arg levenshtein)
      // replaces the O(L²) full matrix — it returns the EXACT distance
      // whenever dist <= threshold and -1 otherwise, so surviving rows
      // carry the identical edit_dist and the filter is equivalent
      // (EditDistanceBoundSpec pins both properties)
      .withColumn("edit_dist",
        expr("levenshtein(t_a, t_b, greatest(length(t_a), length(t_b)) DIV 10)"))
      .filter($"edit_dist" >= 0)
      .select($"doc_a", $"doc_b", $"edit_dist", $"max_len")
      .orderBy($"doc_a", $"doc_b")
  }

  val editDistanceDedupSql: String =
    """WITH sh AS (SELECT doc_id, unnest(list_distinct([text[i:i+7] for i in range(1, length(text) - 6)])) s FROM documents),
      |cand AS (SELECT a.doc_id AS ida, b.doc_id AS idb
      |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT ida AS doc_a, idb AS doc_b,
      |  CAST(levenshtein(da.text, db.text) AS INTEGER) AS edit_dist,
      |  CAST(GREATEST(length(da.text), length(db.text)) AS INTEGER) AS max_len
      |FROM cand JOIN documents da ON ida = da.doc_id
      |          JOIN documents db ON idb = db.doc_id
      |WHERE levenshtein(da.text, db.text) * 10 <= GREATEST(length(da.text), length(db.text))
      |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, Q] = Map(
    "d13_edit_distance" -> editDistanceDedup,
    "d12_semdedup" -> semDedup,
    "d11_dup_passages" -> dupPassages,
    "d10_incremental_ingest" -> incrementalIngest,
    "d09_neardup_clusters" -> neardupClusters,
    "d08_bloom_prefilter" -> bloomPrefilter,
    "d01_exact_dedup" -> exactDedup,
    "d02_normalized_dedup" -> normalizedDedup,
    "d03_minhash_dedup" -> minhashDedup,
    "d04_simhash_pairs" -> simhashPairs,
    "d05_chargram_jaccard" -> chargramJaccard,
    "d06_embedding_neardup" -> embeddingNearDup,
    "d07_embedding_ivf" -> embeddingIvfNearDup)

  val oracles: Map[String, String] = Map(
    "d13_edit_distance" -> editDistanceDedupSql,
    "d12_semdedup" -> semDedupSql,
    "d11_dup_passages" -> dupPassagesSql,
    "d10_incremental_ingest" -> incrementalIngestSql,
    "d09_neardup_clusters" -> neardupClustersSql,
    "d08_bloom_prefilter" -> bloomPrefilterSql,
    "d01_exact_dedup" -> exactDedupSql,
    "d02_normalized_dedup" -> normalizedDedupSql,
    "d03_minhash_dedup" -> minhashDedupSql,
    "d05_chargram_jaccard" -> chargramJaccardSql,
    "d06_embedding_neardup" -> embeddingNearDupSql)
}
