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
private[operators] object HashOracles {

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
  private def shingleCtes: String = {
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
       |g AS (SELECT DISTINCT doc_id, unnest(gs) AS h0 FROM gl)""".stripMargin
  }

  /** Full minhash_pairs recompute: Dedup.minhashPairs(documents,
    * threshold = 0.05, numPerm = 64, bands = 16, seed = 42) — signatures
    * from the rotate-xor permutation family over xxhash64 base hashes, LSH
    * band buckets via the array-fold xxhash64, the (band, bucket)
    * candidate self-join, and the signature-agreement estimate.
    */
  def minhashPairsOracle(numPerm: Int = 64, bands: Int = 16,
                         threshold: Double = 0.05, seed: Long = 42L): String = {
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
    s"""WITH $shingleCtes,
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
       |  SELECT c.doc_a, c.doc_b, ($agree)::DOUBLE / $numPerm AS est_jaccard
       |  FROM cand c
       |  JOIN sigs sa ON sa.doc_id = c.doc_a
       |  JOIN sigs sb ON sb.doc_id = c.doc_b)
       |SELECT doc_a, doc_b, est_jaccard FROM scored
       |WHERE est_jaccard >= ${threshold}e0""".stripMargin
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
