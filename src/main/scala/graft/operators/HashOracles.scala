package graft.operators

/** Generated DuckDB oracle SQL for the seed-dependent hash-sketch queries
  * (`minhash_pairs`, `simhash_sketch`) — round-10 verdict ask #2.
  *
  * The engine's MinHash/SimHash pipelines are deterministic functions of
  * the corpus and two fixed hash families: the FNV-1a + polynomial-combine
  * word-n-gram shingle hash (graft.functions.ShingleHash) and Spark's
  * XxHash64 expression (the XXH64 8-byte and 4-byte finalization paths).
  * Both are plain 64-bit integer arithmetic, so the oracle can recompute
  * the ENTIRE pipeline — shingles, signatures, banding, candidate join,
  * estimate — inside DuckDB and hash-compare exactly, the same technique
  * the embed_ann/embed_ivf/embed_pq oracles use for seeded hyperplanes and
  * codebooks (SimilaritySuite.fmtD et al.).
  *
  * DuckDB has no wrapping 64-bit multiply (BIGINT ops throw on overflow),
  * so every multiply/add routes through UHUGEINT with an explicit mod 2^64
  * (`wrapMul`/`wrapAdd`), values stay UBIGINT end-to-end, and the two
  * signedness-sensitive spots convert explicitly: the per-permutation
  * signature MIN (Spark's min over SIGNED longs — `toSigned`) and the
  * published simhash value. The fixture corpus is pure ASCII (max
  * codepoint 121, checked in HashOracleSpec), so FNV-1a over UTF-8 bytes
  * equals FNV-1a over `unicode()` code points; the tokenizer regex class
  * is exactly ShingleHash.isSpace's separator set.
  *
  * Expression-size discipline: each XXH64 step lives in its own chained
  * subselect column (textual inlining is exponential — rotl/xor-shift use
  * their operand twice per step), except the per-band fold where
  * `list_reduce` needs the whole 8-byte step as ONE lambda (~5 KB of
  * generated text, linear in pipeline length because the accumulator
  * appears exactly once per wrap step before the duplicating tail runs on
  * column references in follow-up CTEs).
  */
private[graft] object HashOracles {

  private val M64 = "18446744073709551616" // 2^64
  // XXH64 primes (public constants of the XXH64 algorithm)
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = BigInt("2870177450012600261")
  // ShingleHash constants (graft.functions.ShingleHash)
  private val FnvOffset = "14695981039346656037" // 0xcbf29ce484222325
  private val FnvPrime = "1099511628211" // 0x100000001b3
  private val Gold = "11400714819323198485" // 0x9e3779b97f4a7c15

  private def wrapMul(a: String, b: String): String =
    s"CAST(((($a)::UHUGEINT * ($b)::UHUGEINT) % $M64::UHUGEINT) AS UBIGINT)"
  private def wrapAdd(a: String, b: String): String =
    s"CAST(((($a)::UHUGEINT + ($b)::UHUGEINT) % $M64::UHUGEINT) AS UBIGINT)"
  private def xorShr(a: String, k: Int): String = s"xor(($a), ($a) >> $k)"
  private def rotl(x: String, r: Int): String =
    wrapAdd(wrapMul(x, s"${BigInt(1) << r}::UBIGINT"), s"($x) >> ${64 - r}")
  /** Reinterpret a UBIGINT column's bits as Spark's signed long. */
  private def toSigned(x: String): String =
    s"CAST(($x)::HUGEINT - (CASE WHEN ($x) >= 9223372036854775808::UBIGINT " +
      s"THEN $M64::HUGEINT ELSE 0::HUGEINT END) AS BIGINT)"

  /** The chained-column steps of XXH64's 8-byte path: `out` =
    * hashLong(`v`, `seed`) (Spark XxHash64 folds this per long input).
    */
  private def hashLongSteps(v: String, seed: String, out: String,
                            p: String): Seq[(String, String)] = Seq(
    s"${p}a0" -> wrapAdd(seed, s"${(P5 + 8) % (BigInt(1) << 64)}::UBIGINT"),
    s"${p}k1" -> rotl(wrapMul(v, s"$P2::UBIGINT"), 31),
    s"${p}a1" -> s"xor(${p}a0, ${wrapMul(s"${p}k1", s"$P1::UBIGINT")})",
    s"${p}a2" -> wrapAdd(wrapMul(rotl(s"${p}a1", 27), s"$P1::UBIGINT"),
      s"$P4::UBIGINT"),
    s"${p}a3" -> wrapMul(xorShr(s"${p}a2", 33), s"$P2::UBIGINT"),
    s"${p}a4" -> wrapMul(xorShr(s"${p}a3", 29), s"$P3::UBIGINT"),
    out -> xorShr(s"${p}a4", 32))

  /** XXH64's 4-byte path: `out` = hashInt(`v`, `seed`) — Spark hashes an
    * IntegerType input (the band-id literal in lshBuckets) through this.
    */
  private def hashIntSteps(v: String, seed: String, out: String,
                           p: String): Seq[(String, String)] = Seq(
    s"${p}b0" -> wrapAdd(seed, s"${(P5 + 4) % (BigInt(1) << 64)}::UBIGINT"),
    s"${p}b1" -> s"xor(${p}b0, ${wrapMul(v, s"$P1::UBIGINT")})",
    s"${p}b2" -> wrapAdd(wrapMul(rotl(s"${p}b1", 23), s"$P2::UBIGINT"),
      s"$P3::UBIGINT"),
    s"${p}b3" -> wrapMul(xorShr(s"${p}b2", 33), s"$P2::UBIGINT"),
    s"${p}b4" -> wrapMul(xorShr(s"${p}b3", 29), s"$P3::UBIGINT"),
    out -> xorShr(s"${p}b4", 32))

  /** Chain (name, expr) steps as stacked CTEs over `base`, returning the
    * final CTE's name. Each step sees every prior column by name, so no
    * expression is ever textually duplicated across steps.
    */
  private def chained(base: String, baseName: String,
                      steps: Seq[(String, String)],
                      prefix: String): (Seq[String], String) = {
    var prev = baseName
    val ctes = Seq(s"$baseName AS ($base)") ++ steps.zipWithIndex.map {
      case ((name, expr), i) =>
        val cteName = s"$prefix$i"
        val cte = s"$cteName AS (SELECT *, $expr AS $name FROM $prev)"
        prev = cteName
        cte
    }
    (ctes, prev)
  }

  /** XXH64 8-byte step as ONE inline expression (for list_reduce lambdas,
    * where chained columns aren't available). Linear size: the accumulator
    * and input each appear once inside the wrap steps; the duplicating
    * xor-shift tail operates on already-built subexpressions, which is
    * acceptable here because the whole lambda is emitted once.
    */
  private def hashLongInline(v: String, seed: String): String = {
    val a0 = wrapAdd(seed, s"${(P5 + 8) % (BigInt(1) << 64)}::UBIGINT")
    val k1 = rotl(wrapMul(v, s"$P2::UBIGINT"), 31)
    val a1 = s"xor($a0, ${wrapMul(k1, s"$P1::UBIGINT")})"
    val a2 = wrapAdd(wrapMul(rotl(a1, 27), s"$P1::UBIGINT"), s"$P4::UBIGINT")
    val a3 = wrapMul(xorShr(a2, 33), s"$P2::UBIGINT")
    val a4 = wrapMul(xorShr(a3, 29), s"$P3::UBIGINT")
    xorShr(a4, 32)
  }

  /** Shared prologue: one row per (doc_id, distinct 3-gram FNV shingle
    * hash `h0`) — the exact ShingleHash.compute(text, 3, distinct=true)
    * value set. Tokens split on ShingleHash's separator byte set; FNV-1a
    * folds per token; the window combine is g = xorshift32(g*GOLD + h)
    * over 3 consecutive token hashes.
    */
  private def shingleCtes: String = shingleCtesBase(distinct = true)

  /** Multiset form of [[shingleCtes]]: one row per shingle OCCURRENCE —
    * the exact ShingleHash.compute(text, 3, distinct=false) multiset the
    * lexical postings build (tf) explodes.
    */
  private def shingleCtesAll: String = shingleCtesBase(distinct = false)

  private def shingleCtesBase(distinct: Boolean): String = {
    def combine(elems: Seq[String]): String =
      elems.foldLeft(Option.empty[String]) { (acc, e) =>
        val step = acc.map(g =>
          wrapAdd(wrapMul(g, s"$Gold::UBIGINT"), e)).getOrElse(e)
        Some(xorShr(step, 32))
      }.get
    val comb = combine(Seq("hs[i]", "hs[i+1]", "hs[i+2]"))
    s"""toks AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(text, '[ \\t\\n\\r\\f\\x0B]+'),
       |                     t -> t <> '') AS ts
       |  FROM documents),
       |th AS (
       |  SELECT doc_id,
       |         list_transform(ts, t ->
       |           list_reduce(
       |             list_prepend($FnvOffset::UBIGINT,
       |               list_transform(range(1, length(t)+1),
       |                              i -> unicode(t[i])::UBIGINT)),
       |             (h, c) -> ${wrapMul("xor(h, c)", s"$FnvPrime::UBIGINT")})) AS hs
       |  FROM toks),
       |gl AS (
       |  SELECT doc_id, list_transform(range(1, len(hs)-1), i -> $comb) AS gs
       |  FROM th WHERE len(hs) >= 3),
       |g AS (SELECT ${if (distinct) "DISTINCT " else ""}doc_id, unnest(gs) AS h0 FROM gl)""".stripMargin
  }

  /** state_inspect_lexical's oracle — the in-DuckDB recompute of the
    * online postings index's MapState, rolled per document exactly as
    * the engine rolls the checkpoint read: tf per (doc, FNV-shingle
    * hash) from the multiset pipeline, then per doc n_terms = distinct
    * shingles (the doc's map entries across all posting lists), dl = Σtf
    * (BM25's doc length), h_sum = Σ signed hash values summed exactly in
    * HUGEINT and compared as VARCHAR (the table_checksum discipline:
    * h_sum reaches ~10¹⁹ > 2⁵³, and a DECIMAL(38,0) output column
    * fetches as pandas float64 on the DuckDB side but exact Decimal on
    * the Spark-parquet/pyarrow side — the driver hash can never match
    * that dtype split, the round-16 defect). A lost posting, a doubled
    * tf, and a mis-keyed hash move n_terms, dl, and h_sum respectively.
    */
  /** The multiset postings CTE prefix (FNV shingles → per-(doc, hash)
    * tf) shared by the lexical state audit and the index-build manifest
    * oracle: `tfh(doc_id, h0, tf)` is exactly the lex_tf artifact the
    * engine persists.
    */
  def postingsCtes: String =
    s"""$shingleCtesAll,
       |tfh AS (SELECT doc_id, h0, count(*) AS tf FROM g GROUP BY 1, 2)""".stripMargin

  def lexicalStateAuditOracle(): String =
    s"""WITH $postingsCtes
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_terms,
       |       CAST(sum(tf) AS BIGINT) AS dl,
       |       CAST(CAST(sum(CAST(${toSigned("h0")} AS HUGEINT))
       |         AS DECIMAL(38,0)) AS VARCHAR) AS h_sum
       |FROM tfh GROUP BY doc_id""".stripMargin

  /** Full minhash_pairs recompute: Dedup.minhashPairs(documents,
    * threshold = 0.05, numPerm = 64, bands = 16, seed = 42) — signatures
    * from the rotate-xor permutation family over xxhash64 base hashes, LSH
    * band buckets via the array-fold xxhash64, the (band, bucket)
    * candidate self-join, and the signature-agreement estimate.
    */
  def minhashPairsOracle(numPerm: Int = 64, bands: Int = 16,
                         threshold: Double = 0.05, seed: Long = 42L): String =
    s"""WITH ${scoredPairCtes(numPerm, bands, seed)}
       |SELECT doc_a, doc_b, est_jaccard FROM scored
       |WHERE est_jaccard >= ${threshold}e0""".stripMargin

  /** Streaming near-dup survivors recompute (`stream_neardup`): the same
    * shingles -> signatures -> band buckets -> candidate pairs -> agreement
    * chain as [[minhashPairsOracle]], then per-language counts of the docs
    * that are NOT the larger member of any pair with >= `minAgree` of
    * `numPerm` signature positions equal — the batch fixpoint the online
    * bucket index converges to. Integer agreement compare on BOTH sides
    * (no double threshold), so the boundary cannot drift between engines.
    */
  def streamNearDupOracle(minAgree: Int, numPerm: Int = 64,
                          bands: Int = 16, seed: Long = 42L): String =
    s"""WITH ${scoredPairCtes(numPerm, bands, seed)},
       |dups AS (SELECT DISTINCT doc_b FROM scored WHERE agree >= $minAgree)
       |SELECT d.lang, count(*) AS n_kept
       |FROM documents d
       |WHERE d.doc_id NOT IN (SELECT doc_b FROM dups)
       |GROUP BY d.lang""".stripMargin

  /** Trailing-window near-dup survivors recompute (`stream_neardup_ttl`):
    * [[streamNearDupOracle]]'s chain with the pair set restricted to the
    * retention window — a pair qualifies only when the two documents'
    * day-per-doc_id event times are within lookback = (hi − cutoff) days
    * of each other, i.e. doc_b − doc_a <= hi − cutoff with
    * cutoff = lo + (hi − lo)·2//5 (the engine's lexWindowCutoff, in
    * DuckDB integer arithmetic so the boundary cannot drift). Survivors
    * are counted over the WHOLE corpus: the window bounds pairing, not
    * corpus membership (every document dedups against its trailing
    * window).
    */
  def streamNearDupTtlOracle(minAgree: Int, numPerm: Int = 64,
                             bands: Int = 16, seed: Long = 42L): String =
    s"""WITH ${scoredPairCtes(numPerm, bands, seed)},
       |cutw AS (
       |  SELECT max(doc_id) - (min(doc_id) + (max(doc_id) - min(doc_id)) * 2 // 5)
       |           AS span
       |  FROM documents),
       |dups AS (
       |  SELECT DISTINCT s.doc_b FROM scored s, cutw c
       |  WHERE s.agree >= $minAgree AND s.doc_b - s.doc_a <= c.span)
       |SELECT d.lang, count(*) AS n_kept
       |FROM documents d
       |WHERE d.doc_id NOT IN (SELECT doc_b FROM dups)
       |GROUP BY d.lang""".stripMargin

  /** Pruned-store recompute (`state_inspect_neardup_ttl`): the band-bucket
    * assignment of IN-WINDOW documents (doc_id >= cutoff — exactly the
    * residents after the full-redelivery compaction at horizon
    * day(cutoff)), rolled per band to resident count, occupied buckets,
    * collision mass (Σ occupancy²) and doc_id sum.
    */
  def nearDupStateAuditOracle(numPerm: Int = 64, bands: Int = 16,
                              seed: Long = 42L): String =
    s"""WITH ${scoredPairCtes(numPerm, bands, seed)},
       |cutb AS (
       |  SELECT min(doc_id) + (max(doc_id) - min(doc_id)) * 2 // 5 AS cutoff
       |  FROM documents),
       |wb AS (
       |  SELECT b.doc_id, b.band, b.bucket
       |  FROM buckets b, cutb c WHERE b.doc_id >= c.cutoff),
       |occ AS (
       |  SELECT band, bucket, count(*) AS n, sum(doc_id) AS ids
       |  FROM wb GROUP BY band, bucket)
       |SELECT CAST(band AS INTEGER) AS band,
       |       CAST(sum(n) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_buckets,
       |       CAST(sum(n * n) AS BIGINT) AS coll_mass,
       |       CAST(sum(ids) AS BIGINT) AS id_sum
       |FROM occ GROUP BY band""".stripMargin

  /** Weighted-sample recompute (`weighted_sample`): one xxhash64(doc_id, i)
    * draw per 32-token chunk i, priority = min draw per doc (SIGNED
    * comparison, matching Spark's long min), rank per language, keep k.
    * Spark's two-long xxhash64 folds as hashLong(i, hashLong(doc_id, 42)).
    */
  def weightedSampleOracle(k: Int = 16): String = {
    val steps = hashLongSteps("doc_id::UBIGINT", "42::UBIGINT", "hbase", "x") ++
      hashLongSteps("i::UBIGINT", "hbase", "h1", "y")
    val (ctes, last) = chained("SELECT * FROM d", "d0", steps, "dx")
    s"""WITH c AS (
       |  SELECT doc_id, lang,
       |         CAST(greatest(1, ((CASE WHEN length(trim(text)) = 0 THEN 0
       |                ELSE len(string_split_regex(trim(text), '\\s+')) END)
       |               + 31) // 32) AS BIGINT) AS n_chunks
       |  FROM documents),
       |d AS (SELECT doc_id, lang, n_chunks, unnest(range(n_chunks)) AS i
       |      FROM c),
       |${ctes.mkString(",\n")},
       |m AS (SELECT doc_id, lang, n_chunks, min(${toSigned("h1")}) AS p
       |      FROM $last GROUP BY doc_id, lang, n_chunks),
       |r AS (SELECT lang, doc_id, n_chunks,
       |             row_number() OVER (PARTITION BY lang ORDER BY p, doc_id)
       |               AS rnk
       |      FROM m)
       |SELECT lang, doc_id, n_chunks, CAST(rnk AS BIGINT) AS rnk
       |FROM r WHERE rnk <= $k""".stripMargin
  }

  /** Cumulative Poisson(1) CDF cutoffs scaled to 2^64 — the resample-
    * weight table for the deterministic bootstrap (`bootstrap_ci`): a
    * uniform 64-bit hash draw u maps to weight k when
    * T_{k-1} <= u < T_k, i.e. the standard Poisson bootstrap with the
    * randomness replaced by XXH64(row, resample). ONE generator feeds
    * both engines (the Spark Column literals and the oracle SQL
    * literals), so the cutoffs cannot drift even though they come from
    * double-precision exp/factorial math. Weights truncate at `maxW`
    * (P(w > 5) ~ 6e-4 for Poisson(1)) — identically on both sides.
    */
  def poissonThresholdsUnsigned(maxW: Int = 5): Seq[BigInt] = {
    val e = math.exp(-1.0)
    val probs = (0 until maxW).map { k =>
      var f = 1.0
      var j = 1
      while (j <= k) { f *= j; j += 1 }
      e / f
    }
    val cum = probs.scanLeft(0.0)(_ + _).drop(1)
    cum.map(c => (BigDecimal(c) * BigDecimal(BigInt(1) << 64)).toBigInt)
  }

  /** The same cutoffs in Spark's SIGNED-long domain: comparing
    * `xxhash64(...) XOR Long.MinValue` (the sign-bit flip that makes
    * signed order match unsigned order) against `T_k - 2^63`.
    */
  def poissonThresholdsSigned(maxW: Int = 5): Seq[Long] =
    poissonThresholdsUnsigned(maxW).map(t => (t - (BigInt(1) << 63)).toLong)

  /** Bootstrap-CI recompute (`bootstrap_ci`): the full deterministic
    * pipeline — per (order, resample) XXH64 draw → truncated-Poisson
    * weight → weighted per-resample mean (exact DECIMAL sum, VARCHAR-
    * routed to a correctly-rounded DOUBLE, one IEEE division) → order-
    * statistic CI over the `b` resample means. Hash model: `xxhash64(
    * o_orderkey, b)` = hashLong(b, hashLong(o_orderkey, 42)), the same
    * two-fold chain weightedSampleOracle proved out.
    */
  def bootstrapCiOracle(b: Int = 40, maxW: Int = 5): String = {
    val t = poissonThresholdsUnsigned(maxW)
    val steps = hashLongSteps("o_orderkey::UBIGINT", "42::UBIGINT", "hbase", "x") ++
      hashLongSteps("b::UBIGINT", "hbase", "h1", "y")
    val (ctes, last) = chained("SELECT * FROM d", "d0", steps, "dx")
    val wcase = t.zipWithIndex
      .map { case (tk, k) => s"WHEN h1 < $tk::UBIGINT THEN $k" }
      .mkString("CASE ", " ", s" ELSE $maxW END")
    s"""WITH o AS (
       |  SELECT o_orderkey, o_orderpriority AS priority,
       |         CAST(o_totalprice AS DECIMAL(18,2)) AS p
       |  FROM orders),
       |d AS (SELECT *, unnest(range($b)) AS b FROM o),
       |${ctes.mkString(",\n")},
       |w AS (SELECT priority, b, p, $wcase AS w FROM $last),
       |m AS (SELECT priority, b,
       |        CAST(CAST(sum(w * p) AS VARCHAR) AS DOUBLE)
       |          / CAST(sum(w) AS DOUBLE) AS mean_b
       |      FROM w GROUP BY 1, 2
       |      HAVING sum(w) > 0),
       |r AS (SELECT priority, mean_b,
       |        row_number() OVER (PARTITION BY priority
       |          ORDER BY mean_b, b) AS rk,
       |        count(*) OVER (PARTITION BY priority) AS nb
       |      FROM m),
       |ci AS (SELECT priority,
       |         min(CASE WHEN rk = 2 AND nb >= 3 THEN mean_b END) AS ci_lo,
       |         min(CASE WHEN rk = nb - 1 AND nb >= 3 THEN mean_b END)
       |           AS ci_hi
       |       FROM r GROUP BY 1),
       |f AS (SELECT priority,
       |        CAST(CAST(sum(p) AS VARCHAR) AS DOUBLE)
       |          / CAST(count(*) AS DOUBLE) AS mean_full
       |      FROM o GROUP BY 1)
       |SELECT f.priority, f.mean_full, ci.ci_lo, ci.ci_hi
       |FROM f JOIN ci USING (priority)""".stripMargin
  }

  /** Two-sample bootstrap recompute (`bootstrap_diff`): bootstrapCiOracle's
    * hash→weight→resample-mean pipeline run over the before/after-fence
    * periods, finished by the order-statistic CI over per-resample mean
    * DIFFERENCES and the excludes-zero significance predicate.
    */
  def bootstrapDiffOracle(b: Int = 40, maxW: Int = 5): String = {
    val t = poissonThresholdsUnsigned(maxW)
    val steps = hashLongSteps("o_orderkey::UBIGINT", "42::UBIGINT", "hbase", "x") ++
      hashLongSteps("b::UBIGINT", "hbase", "h1", "y")
    val (ctes, last) = chained("SELECT * FROM d", "d0", steps, "dx")
    val wcase = t.zipWithIndex
      .map { case (tk, k) => s"WHEN h1 < $tk::UBIGINT THEN $k" }
      .mkString("CASE ", " ", s" ELSE $maxW END")
    s"""WITH o AS (
       |  SELECT o_orderkey,
       |         CASE WHEN o_orderdate < TIMESTAMP '1997-06-01'
       |              THEN 'base' ELSE 'new' END AS period,
       |         CAST(o_totalprice AS DECIMAL(18,2)) AS p
       |  FROM orders),
       |d AS (SELECT *, unnest(range($b)) AS b FROM o),
       |${ctes.mkString(",\n")},
       |w AS (SELECT period, b, p, $wcase AS w FROM $last),
       |m AS (SELECT period, b,
       |        CAST(CAST(sum(w * p) AS VARCHAR) AS DOUBLE)
       |          / CAST(sum(w) AS DOUBLE) AS mean_b
       |      FROM w GROUP BY 1, 2
       |      HAVING sum(w) > 0),
       |df AS (SELECT n.b, n.mean_b - bb.mean_b AS diff_b
       |       FROM (SELECT b, mean_b FROM m WHERE period = 'new') n
       |       JOIN (SELECT b, mean_b FROM m WHERE period = 'base') bb
       |         USING (b)),
       |r AS (SELECT b, diff_b,
       |        row_number() OVER (ORDER BY diff_b, b) AS rk,
       |        count(*) OVER () AS nb FROM df),
       |ci AS (SELECT min(CASE WHEN rk = 2 AND nb >= 3 THEN diff_b END)
       |                AS ci_lo,
       |              min(CASE WHEN rk = nb - 1 AND nb >= 3 THEN diff_b END)
       |                AS ci_hi
       |       FROM r),
       |f AS (SELECT period,
       |        CAST(CAST(sum(p) AS VARCHAR) AS DOUBLE)
       |          / CAST(count(*) AS DOUBLE) AS m
       |      FROM o GROUP BY 1)
       |SELECT fb.m AS mean_base, fn.m AS mean_new, fn.m - fb.m AS diff,
       |       ci.ci_lo, ci.ci_hi,
       |       (ci.ci_lo > 0.0 OR ci.ci_hi < 0.0) AS significant
       |FROM (SELECT m FROM f WHERE period = 'base') fb,
       |     (SELECT m FROM f WHERE period = 'new') fn, ci""".stripMargin
  }

  /** Truncated discrete-Laplace (two-sided-geometric) CDF cutoffs scaled
    * to 2^64 — the noise table for the deterministic differential-privacy
    * release (`dp_release`): a uniform 64-bit hash draw u maps to noise
    * k − maxK when T_{k-1} <= u < T_k over the renormalized support
    * [−maxK, maxK]. P(X = k) ∝ α^|k| with α = exp(−ε/Δ), Δ = 1 (count
    * sensitivity); truncation at maxK = 16 clips ≤ 2.5·10⁻⁴ of the mass
    * at the loosest ladder ε (0.5) and the renormalization keeps the
    * table a proper distribution. ONE generator feeds both engines (the
    * Spark literals and the oracle SQL), so the cutoffs cannot drift
    * even though they come from double exp math — the bootstrap-cutoff
    * discipline applied to the privacy mechanism.
    */
  def dLaplaceThresholdsUnsigned(epsilon: Double, maxK: Int = 16): Seq[BigInt] = {
    val a = math.exp(-epsilon)
    val raw = (-maxK to maxK).map(k => math.pow(a, math.abs(k).toDouble))
    val z = raw.sum
    // 2*maxK cutoffs: cumulative mass up to each support point except the
    // last (everything above the final cutoff is +maxK). Only the LOWER
    // half comes from the cumulative double sum; the upper half is its
    // exact mirror (cutoff_{2K-1-i} = 2^64 − cutoff_i), so the table is
    // symmetric about zero BY CONSTRUCTION — the noise is exactly
    // zero-mean, not zero-mean-up-to-float-rounding (AuditSpec pins the
    // BigInt-exact symmetry).
    val lower = raw.take(maxK).map(_ / z).scanLeft(0.0)(_ + _).drop(1)
      .map(c => (BigDecimal(c) * BigDecimal(BigInt(1) << 64)).toBigInt)
    lower ++ lower.reverse.map((BigInt(1) << 64) - _)
  }

  /** The same cutoffs in Spark's signed-long domain (the
    * [[poissonThresholdsSigned]] sign-bit-flip convention). */
  def dLaplaceThresholdsSigned(epsilon: Double, maxK: Int = 16): Seq[Long] =
    dLaplaceThresholdsUnsigned(epsilon, maxK)
      .map(t => (t - (BigInt(1) << 63)).toLong)

  /** DuckDB CASE expression mapping the unsigned hash column `h` to the
    * truncated discrete-Laplace noise for `epsilon` — the exact mirror of
    * RelationalSuite.dpNoise's Spark fold over the same generated
    * cutoffs. */
  private def dLaplaceCase(h: String, epsilon: Double, maxK: Int): String =
    dLaplaceThresholdsUnsigned(epsilon, maxK).zipWithIndex
      .map { case (tk, i) => s"WHEN $h < $tk::UBIGINT THEN ${i - maxK}" }
      .mkString("CASE ", " ", s" ELSE $maxK END")

  /** dp_release recompute: per (nation, balance-band) counts, the
    * two-fold XXH64 chain xxhash64(nation, band) = hashLong(band,
    * hashLong(nation, 42)), and the per-epsilon noise CASE from the same
    * cutoffs. `band` can be negative (acctbal floors below zero), so it
    * reinterprets to UBIGINT via two's complement before hashing —
    * matching Spark's bit-level long hash.
    */
  def dpReleaseOracle(epsilons: Seq[Double], maxK: Int = 16): String = {
    val bandU = s"CAST((CASE WHEN band < 0 THEN band::HUGEINT + $M64::HUGEINT " +
      "ELSE band::HUGEINT END) AS UBIGINT)"
    val steps = hashLongSteps("nation::UBIGINT", "42::UBIGINT", "hbase", "x") ++
      hashLongSteps(bandU, "hbase", "h1", "y")
    val (ctes, last) = chained("SELECT * FROM c", "c0", steps, "cx")
    val epsList = epsilons.map(e => s"${e}e0").mkString("[", ", ", "]")
    val dispatch = epsilons.init.map(e =>
        s"WHEN epsilon = ${e}e0 THEN ${dLaplaceCase("h1", e, maxK)}")
      .mkString("CASE ", " ", s" ELSE ${dLaplaceCase("h1", epsilons.last, maxK)} END")
    s"""WITH c AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |         CAST(floor(c_acctbal / 1000.0e0) AS BIGINT) AS band,
       |         count(*) AS n
       |  FROM customer GROUP BY 1, 2),
       |${ctes.mkString(",\n")},
       |x AS (SELECT nation, band, n, h1, unnest($epsList) AS epsilon
       |      FROM $last)
       |SELECT nation, band, epsilon,
       |       CAST(n + ($dispatch) AS BIGINT) AS released
       |FROM x""".stripMargin
  }

  /** Image-fingerprint recompute (`image_fingerprint`): the decoded PNG
    * pixel at (x, y) is the closed-form fill (doc_id + x + y) % 256, so
    * the 8x8 point-sampled aHash — samples at (i*w/8, j*h/8), bit k set
    * when sample > floor-mean — reproduces in pure SQL what the Spark
    * side reads back out of the REAL encoded bytes: a broken encoder,
    * decoder, sampler, or bit packer all fail the hash.
    */
  def imageFingerprintOracle: String =
    s"""WITH im AS (
       |  SELECT doc_id,
       |         CAST(32 + doc_id % 97 AS BIGINT) AS w,
       |         CAST(32 + (doc_id * 7) % 97 AS BIGINT) AS h
       |  FROM documents WHERE doc_id % 3 = 0),
       |s AS (
       |  SELECT doc_id, w, h, k.k,
       |         (doc_id + ((k.k % 8) * w) // 8 + ((k.k // 8) * h) // 8) % 256
       |           AS v
       |  FROM im, LATERAL (SELECT unnest(range(64)) AS k) k),
       |m AS (
       |  SELECT doc_id, sum(v) // 64 AS mean FROM s GROUP BY doc_id),
       |b AS (
       |  SELECT s.doc_id, s.w, s.h,
       |         bit_or(CASE WHEN s.v > m.mean THEN (1::UBIGINT << s.k)
       |                ELSE 0::UBIGINT END) AS ub
       |  FROM s JOIN m ON s.doc_id = m.doc_id
       |  GROUP BY s.doc_id, s.w, s.h)
       |SELECT doc_id, CAST(w AS INTEGER) AS width,
       |       CAST(h AS INTEGER) AS height, ${toSigned("ub")} AS ahash
       |FROM b""".stripMargin

  /** Audio-fingerprint recompute (`audio_fingerprint`): the decoded PCM
    * sample i is the closed form ((doc_id*31 + i*17) % 65536) - 32768, so
    * the 64-window energy-envelope hash — sample i in window i*64/n,
    * bit w set when window energy > floor-mean — reproduces in SQL what
    * the Spark side reads out of the REAL WAV bytes.
    */
  def audioFingerprintOracle: String =
    s"""WITH au AS (
       |  SELECT doc_id, CAST(400 + doc_id % 256 AS BIGINT) AS n
       |  FROM documents WHERE doc_id % 3 = 1),
       |s AS (
       |  SELECT doc_id, n, (i.i * 64) // n AS w,
       |         abs(((doc_id * 31 + i.i * 17) % 65536) - 32768) AS a
       |  FROM au, LATERAL (SELECT unnest(range(n)) AS i) i),
       |e AS (SELECT doc_id, n, w, sum(a) AS energy FROM s
       |      GROUP BY doc_id, n, w),
       |m AS (SELECT doc_id, sum(energy) // 64 AS mean FROM e
       |      GROUP BY doc_id),
       |b AS (
       |  SELECT e.doc_id, e.n,
       |         bit_or(CASE WHEN e.energy > m.mean THEN (1::UBIGINT << e.w)
       |                ELSE 0::UBIGINT END) AS ub
       |  FROM e JOIN m ON e.doc_id = m.doc_id
       |  GROUP BY e.doc_id, e.n)
       |SELECT doc_id, CAST(n AS INTEGER) AS n_samples,
       |       ${toSigned("ub")} AS ehash
       |FROM b""".stripMargin

  /** Streaming media-dedup recompute (`stream_media_dedup`): the stream
    * publishes every image TWICE (original + mirror id), so each doc
    * contributes exactly two distinct ids to its content-hash group —
    * per-hash distinct-id counts are 2x the batch fingerprint groups.
    */
  def streamMediaDedupOracle: String =
    s"""WITH fp AS ($imageFingerprintOracle)
       |SELECT ahash, CAST(2 * count(*) AS BIGINT) AS n_images
       |FROM fp GROUP BY ahash""".stripMargin

  /** Trailing-window media-dedup recompute (`stream_media_dedup_ttl`):
    * per-hash distinct uploads among IN-WINDOW image documents
    * (doc_id >= cutoff over the image subset's id span — mirrors carry
    * their original's day, so both uploads of a document are in or out
    * together): 2 × in-window docs per aHash group; groups with an
    * empty window are absent.
    */
  def streamMediaDedupTtlOracle: String =
    s"""WITH fp AS ($imageFingerprintOracle),
       |cutm AS (
       |  SELECT min(doc_id) + (max(doc_id) - min(doc_id)) * 2 // 5 AS cutoff
       |  FROM documents WHERE doc_id % 3 = 0)
       |SELECT f.ahash, CAST(2 * count(*) AS BIGINT) AS n_images
       |FROM fp f, cutm c WHERE f.doc_id >= c.cutoff
       |GROUP BY f.ahash""".stripMargin

  /** Pruned-store recompute (`state_inspect_media_ttl`): the per-hash id
    * sets after compaction at horizon day(cutoff) — for each in-window
    * document its original id d and mirror id −d−1 are resident, so
    * n_ids = 2k, orig_sum = Σd, mirror_sum = Σ(−d−1) = −Σd − k.
    */
  def mediaStateAuditOracle: String =
    s"""WITH fp AS ($imageFingerprintOracle),
       |cutm AS (
       |  SELECT min(doc_id) + (max(doc_id) - min(doc_id)) * 2 // 5 AS cutoff
       |  FROM documents WHERE doc_id % 3 = 0)
       |SELECT f.ahash, CAST(2 * count(*) AS BIGINT) AS n_ids,
       |       CAST(sum(f.doc_id) AS BIGINT) AS orig_sum,
       |       CAST(-sum(f.doc_id) - count(*) AS BIGINT) AS mirror_sum
       |FROM fp f, cutm c WHERE f.doc_id >= c.cutoff
       |GROUP BY f.ahash""".stripMargin

  /** Video frame-fingerprint recompute (`video_fingerprint`): frame f's
    * pixel (x, y) is the closed form (doc_id + 3f + x + y) % 256 over the
    * (frameW, frameH) grid, so each frame's 8x8 point-sampled aHash
    * reproduces in SQL what the Spark side reads out of the REAL GIF.
    */
  def videoFingerprintOracle: String =
    s"""WITH vx AS (
       |  SELECT doc_id,
       |         CAST(2 + doc_id % 7 AS BIGINT) AS n,
       |         CAST(16 + doc_id % 16 AS BIGINT) AS w,
       |         CAST(16 + (doc_id * 5) % 16 AS BIGINT) AS h
       |  FROM documents WHERE doc_id % 3 = 2),
       |s AS (
       |  SELECT doc_id, f.f, k.k,
       |         (doc_id + 3 * f.f + ((k.k % 8) * w) // 8
       |            + ((k.k // 8) * h) // 8) % 256 AS v
       |  FROM vx,
       |       LATERAL (SELECT unnest(range(n)) AS f) f,
       |       LATERAL (SELECT unnest(range(64)) AS k) k),
       |m AS (SELECT doc_id, f, sum(v) // 64 AS mean FROM s
       |      GROUP BY doc_id, f),
       |b AS (
       |  SELECT s.doc_id, s.f,
       |         bit_or(CASE WHEN s.v > m.mean THEN (1::UBIGINT << s.k)
       |                ELSE 0::UBIGINT END) AS ub
       |  FROM s JOIN m ON s.doc_id = m.doc_id AND s.f = m.f
       |  GROUP BY s.doc_id, s.f)
       |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
       |       ${toSigned("ub")} AS fhash
       |FROM b""".stripMargin

  /** The shared CTE chain of the minhash oracles, ending in
    * `scored(doc_a, doc_b, agree, est_jaccard)` — candidate pairs from
    * band-bucket collisions with their integer signature agreement.
    * Returned WITHOUT the leading WITH so callers can append CTEs.
    */
  private def scoredPairCtes(numPerm: Int, bands: Int, seed: Long): String = {
    require(numPerm == 64 && bands == 16, "generated for the wired defaults")
    val rows = numPerm / bands
    // h1 = xxhash64(h0, lit(42L)) = hashLong(42, hashLong(h0, 42));
    // h2 = xxhash64(h0, lit(43L)) = hashLong(43, hashLong(h0, 42)).
    // (Spark's multi-arg xxhash64 folds EVERY argument as data with fixed
    // initial seed 42 — the lit(seed) is a hashed input, not the seed.)
    val hashSteps =
      hashLongSteps("h0", "42::UBIGINT", "hbase", "x") ++
        hashLongSteps(s"$seed::UBIGINT", "hbase", "h1", "y") ++
        hashLongSteps(s"${seed + 1}::UBIGINT", "hbase", "h2", "z")
    val (hashCtes, hashed) = chained("SELECT * FROM g", "g0", hashSteps, "hx")
    // per-permutation mins over SIGNED longs: m_i = min(h1 xor rotl(h2, i))
    val sigCols = (0 until numPerm).map { i =>
      val perm = if (i == 0) "xor(h1, h2)"
        else s"xor(h1, ${rotl("h2", i % 64)})"
      s"min(${toSigned(perm)}) AS m$i"
    }
    // band buckets: xxhash64(slice(sig, b*rows+1, rows), lit(b)) — the
    // array elements fold through the 8-byte path (signature values as
    // longs), then the INT literal b through the 4-byte path
    val unsignedSig = (0 until numPerm).map(i =>
      s"CAST((m$i::HUGEINT + (CASE WHEN m$i < 0 THEN $M64::HUGEINT " +
        "ELSE 0::HUGEINT END)) AS UBIGINT)").mkString("[", ", ", "]")
    val bandFold =
      s"list_reduce(list_prepend(42::UBIGINT, vals), " +
        s"(acc, v) -> ${hashLongInline("v", "acc")})"
    val bandVals =
      s"""bandv AS (
         |  SELECT doc_id, band,
         |         list_slice($unsignedSig, band * $rows + 1, band * $rows + $rows) AS vals
         |  FROM sigs CROSS JOIN (SELECT unnest(range($bands)) AS band)),
         |bacc AS (SELECT doc_id, band, $bandFold AS acc FROM bandv)""".stripMargin
    val (hiCtes, hiLast) = chained("SELECT * FROM bacc", "bh",
      hashIntSteps("band::UBIGINT", "acc", "bucket", "w"), "bi")
    val agree = (0 until numPerm).map(i =>
      s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""$shingleCtes,
       |${hashCtes.mkString(",\n")},
       |sigs AS (
       |  SELECT doc_id, ${sigCols.mkString(",\n         ")}
       |  FROM $hashed GROUP BY doc_id),
       |$bandVals,
       |${hiCtes.mkString(",\n")},
       |buckets AS (SELECT doc_id, band, bucket FROM $hiLast),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM buckets a JOIN buckets b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |scored AS (
       |  SELECT c.doc_a, c.doc_b, ($agree) AS agree,
       |         ($agree)::DOUBLE / $numPerm AS est_jaccard
       |  FROM cand c
       |  JOIN sigs sa ON sa.doc_id = c.doc_a
       |  JOIN sigs sb ON sb.doc_id = c.doc_b)""".stripMargin
  }

  /** 17-significant-digit scientific notation: DuckDB types E-notation as
    * DOUBLE and parses to the exact nearest double (a plain decimal
    * literal would type DECIMAL — same rationale as SimilaritySuite.fmtD).
    */
  private def fmtD(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.17e", Double.box(d))

  /** CTE chain recomputing Sketches.hllDistinct(lineitem, l_returnflag,
    * `valueCol`, p) exactly: xxhash64, register maxes, the scaled-integer
    * harmonic denominator (HUGEINT — exact like Spark's DECIMAL(38,0)),
    * the VARCHAR-routed double conversion (DuckDB's direct HUGEINT->DOUBLE
    * cast can land one ulp off; the string parse is correctly rounded,
    * matching Spark's decimal cast), and the linear-counting branch.
    * Returns (ctes, finalName) with columns (g, <out>).
    */
  private def hllCtes(valueCol: String, p: Int, out: String,
                      pfx: String): (Seq[String], String) = {
    val m = 1 << p
    val a = fmtD(Sketches.hllNumerator(p))
    val base = s"SELECT l_returnflag AS g, ($valueCol)::UBIGINT AS v " +
      s"FROM lineitem WHERE $valueCol IS NOT NULL"
    val (hashCtes, hashed) =
      chained(base, s"${pfx}b", hashLongSteps("v", "42::UBIGINT", "h", s"${pfx}x"),
        s"${pfx}h")
    val denom = s"s + ($m - nreg)::HUGEINT * (1::HUGEINT << 55)"
    val rawE = s"$a / CAST(CAST($denom AS VARCHAR) AS DOUBLE)"
    val tail = Seq(
      s"""${pfx}rho AS (
         |  SELECT g, h & ${m - 1}::UBIGINT AS bucket,
         |         CASE WHEN (h >> $p) = 0::UBIGINT THEN ${64 - p + 1}
         |              ELSE ${64 - p + 1} - length(bin(CAST(h >> $p AS BIGINT)))
         |         END AS rho
         |  FROM $hashed)""".stripMargin,
      s"${pfx}regs AS (SELECT g, bucket, max(rho) AS r FROM ${pfx}rho GROUP BY 1, 2)",
      s"${pfx}agg AS (SELECT g, sum(1::HUGEINT << (55 - r)) AS s, " +
        s"count(*) AS nreg FROM ${pfx}regs GROUP BY 1)",
      s"""${pfx}est AS (
         |  SELECT g,
         |         CAST(CASE WHEN ($m - nreg) > 0 AND $rawE <= ${fmtD(2.5 * m)}
         |                   THEN round(${fmtD(m.toDouble)} *
         |                              ln(${fmtD(m.toDouble)} / ($m - nreg)))
         |                   ELSE round($rawE) END AS BIGINT) AS $out
         |  FROM ${pfx}agg)""".stripMargin)
    (hashCtes ++ tail, s"${pfx}est")
  }

  /** Full approx_sketches recompute (round 11): two HLL estimates + the
    * equi-width histogram percentiles, every arithmetic step mirroring
    * Sketches.scala operation-for-operation so the doubles match
    * bit-for-bit.
    */
  def approxSketchesOracle: String = {
    val (partCtes, partEst) = hllCtes("l_partkey", 10, "approx_parts", "pa")
    val (suppCtes, suppEst) = hllCtes("l_suppkey", 12, "approx_supp", "sb")
    val k = fmtD(256.0)
    def pct(q: Double, out: String): String = {
      val r = s"${fmtD(q)} * (n - 1)"
      s"""$out AS (
         |  SELECT g, lo + ((hi - lo) / $k) *
         |            (bucket + (($r) - (cum - cnt)) / cnt) AS $out
         |  FROM hw WHERE (cum - cnt) <= $r AND $r < cum)""".stripMargin
    }
    val hist =
      s"""hb AS (
         |  SELECT l_returnflag AS g, min(l_extendedprice) AS lo,
         |         max(l_extendedprice) AS hi, count(*) AS n
         |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
         |hx AS (
         |  SELECT b.g, b.lo, b.hi, b.n,
         |         CASE WHEN b.hi = b.lo THEN 0
         |              ELSE CAST(least(floor((l.l_extendedprice - b.lo) /
         |                                    ((b.hi - b.lo) / $k)), 255) AS INT)
         |         END AS bucket
         |  FROM lineitem l JOIN hb b ON l.l_returnflag = b.g
         |  WHERE l.l_extendedprice IS NOT NULL),
         |hc AS (SELECT g, lo, hi, n, bucket, count(*) AS cnt
         |       FROM hx GROUP BY 1, 2, 3, 4, 5),
         |hw AS (SELECT *, CAST(sum(cnt) OVER (PARTITION BY g ORDER BY bucket)
         |                      AS BIGINT) AS cum FROM hc),
         |${pct(0.5, "p50_price")},
         |${pct(0.99, "p99_price")}""".stripMargin
    s"""WITH ${partCtes.mkString(",\n")},
       |${suppCtes.mkString(",\n")},
       |$hist
       |SELECT pa.g AS l_returnflag, pa.approx_parts, sb.approx_supp,
       |       p50.p50_price, p99.p99_price
       |FROM $partEst pa
       |JOIN $suppEst sb ON sb.g = pa.g
       |JOIN p50_price p50 ON p50.g = pa.g
       |JOIN p99_price p99 ON p99.g = pa.g""".stripMargin
  }

  /** custom_agg_moments recompute (round 11): the engine pins a
    * DETERMINISTIC aggregation layout (each group hash-routed to one
    * partition, rows sorted by the unique (l_orderkey, l_linenumber) key,
    * a single partial merged into the empty buffer — see
    * RelationalSuite.customAggMoments), so the Welford doubles are a fixed
    * IEEE op sequence the oracle replays exactly: list_reduce over the
    * identically-ordered values with WelfordAggregator.reduce's literal
    * update formula (delta/n, then delta*(x - newMean) with newMean
    * recomputed textually — same ops, same bits).
    */
  def customAggMomentsOracle: String = {
    val meanNew = "(acc.mean + (e.mean - acc.mean) / (acc.n + 1))"
    // FIELD ORDER IS LOAD-BEARING: DuckDB 1.0 evaluates a list_reduce
    // struct accumulator's fields SEQUENTIALLY, each later field seeing
    // the already-updated struct (measured: a {'n', 'mean'} Welford step
    // read the NEW n inside 'mean'). Ordering m2 -> mean -> n makes every
    // field depend only on not-yet-assigned fields, which yields the SAME
    // result under both the in-place semantics and the standard
    // all-from-old-acc semantics — so the oracle is robust to either.
    s"""WITH ord AS (
       |  SELECT l_returnflag AS g,
       |         list(l_extendedprice
       |              ORDER BY l_orderkey, l_linenumber, l_extendedprice) AS xs
       |  FROM lineitem GROUP BY 1),
       |red AS (
       |  SELECT g, list_reduce(
       |    list_prepend({'m2': 0.0::DOUBLE, 'mean': 0.0::DOUBLE, 'n': 0::BIGINT},
       |      list_transform(xs, x ->
       |        {'m2': 0.0::DOUBLE, 'mean': x, 'n': 0::BIGINT})),
       |    (acc, e) -> {'m2': acc.m2 + (e.mean - acc.mean) * (e.mean - $meanNew),
       |                 'mean': $meanNew,
       |                 'n': acc.n + 1}) AS mo
       |  FROM ord)
       |SELECT g AS l_returnflag, mo.n AS n, mo.mean AS mean_price,
       |       CASE WHEN mo.n > 1 THEN mo.m2 / (mo.n - 1) ELSE 0.0::DOUBLE END
       |         AS var_price
       |FROM red""".stripMargin
  }

  /** Full simhash_sketch recompute: Dedup.simhash(documents) — per-bit
    * +1/-1 votes over the distinct shingle hashes, bit j set iff its vote
    * sum is strictly positive, published as Spark's signed long.
    */
  def simhashSketchOracle: String = {
    val votes = (0 until 64).map(j =>
      s"sum(CASE WHEN (${if (j == 0) "h0" else s"h0 >> $j"}) & 1::UBIGINT = " +
        s"1::UBIGINT THEN 1 ELSE -1 END) AS v$j")
    // signed reassembly: sum 2^j for positive-vote bits j < 63, minus 2^63
    // when bit 63 votes positive (two's complement)
    val low = (0 until 63).map(j =>
      s"(CASE WHEN v$j > 0 THEN ${BigInt(1) << j}::HUGEINT ELSE 0::HUGEINT END)")
      .mkString(" + ")
    val full = s"$low - (CASE WHEN v63 > 0 THEN 9223372036854775808::HUGEINT " +
      "ELSE 0::HUGEINT END)"
    s"""WITH $shingleCtes,
       |votes AS (
       |  SELECT doc_id,
       |         ${votes.mkString(",\n         ")}
       |  FROM g GROUP BY doc_id)
       |SELECT doc_id, CAST($full AS BIGINT) AS simhash FROM votes""".stripMargin
  }
}
