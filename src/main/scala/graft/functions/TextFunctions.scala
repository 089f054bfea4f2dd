package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality signals, language ID, fingerprinting. All pure
  * column expressions (codegen'd, pushdown-friendly) — no UDFs, no
  * collect — so every operator here distributes trivially.
  */
object TextFunctions {

  /** Whitespace tokens; blank text -> empty array. Leading/trailing
    * whitespace is stripped with a regex (trim() removes only spaces — a
    * tab-edged text would otherwise yield empty tokens and diverge from the
    * native ShingleHash tokenizer).
    */
  def tokens(c: Column): Column = {
    val stripped = regexp_replace(c, "^\\s+|\\s+$", "")
    when(length(stripped) === 0, array().cast("array<string>"))
      .otherwise(split(stripped, "\\s+"))
  }

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish pre-tokenization count: letter runs, single digits, or single
    * non-space symbols — the GPT-2-style pre-split shape, as a proxy for an
    * LLM token budget without shipping a vocab.
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[^.,;:!?]", "")).cast("double") / length(c))

  private val EnStopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Count of whitespace-delimited tokens equal (case-insensitively) to one
    * of `words`, as ONE codegen'd regex pass over the raw text instead of a
    * split + interpreted `filter` HOF. A token matches iff the word appears
    * with start-or-whitespace before and whitespace-or-end after (zero-width
    * lookarounds, so adjacent matching tokens both count) — exactly
    * `lower(token) IN words` over `tokens()`, since tokens are the maximal
    * non-whitespace runs. Array HOFs are CodegenFallback: besides being
    * interpreted (slow), their eval trees are what HotSpot's deopt cycle
    * latches onto — measured in Bench, a plan whose generated method hit the
    * recompilation cutoff ran this projection at 2 ms/row vs 0.1 ms/row
    * (see build.sbt's PerMethodRecompilationCutoff note).
    */
  private def tokenMatchCount(c: Column, words: Seq[String]): Column =
    size(regexp_extract_all(c,
      lit("(?i)(?<=^|\\s)(?:" + words.mkString("|") + ")(?=\\s|$)"), lit(0)))

  /** Fraction of tokens that are (English) stopwords — a standard
    * natural-language-ness signal.
    */
  def stopwordRatio(c: Column): Column = {
    val n = tokenCount(c)
    when(n === 0, lit(0.0))
      .otherwise(tokenMatchCount(c, EnStopwords).cast("double") / n)
  }

  /** Mean token length in characters. Total token chars = text length with
    * ALL whitespace removed (tokens are the non-whitespace runs), so this
    * stays a pure codegen'd projection — no aggregate() HOF.
    */
  def avgTokenLen(c: Column): Column = {
    val n = tokenCount(c)
    when(n === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "\\s+", "")).cast("double") / n)
  }

  /** Composite quality score in [0,1]: rewards natural token lengths and
    * some stopword presence, penalizes punctuation soup. Deliberately simple
    * and branch-free — a real pipeline swaps in a model score; the shape
    * (pure projection, no shuffle) stays the same.
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(tokenCount(c).cast("double") / 100.0, lit(1.0))
    val stopScore = least(stopwordRatio(c) * 4.0, lit(1.0))
    val punctPenalty = least(punctRatio(c) * 5.0, lit(1.0))
    greatest(lit(0.0), least(lit(1.0),
      lenScore * 0.4 + stopScore * 0.4 + (lit(1.0) - punctPenalty) * 0.2))
  }

  /** Heuristic language ID from marker tokens: CJK characters dominate ->
    * zh; otherwise the language whose stopword markers appear most, ties
    * broken in fixed order (en, de, fr, es); no markers -> und.
    */
  def langId(c: Column): Column = {
    def markers(words: Seq[String]): Column = tokenMatchCount(c, words)
    val en = markers(Seq("the", "a", "and", "of", "to", "is"))
    val de = markers(Seq("der", "die", "das", "und", "ist", "nicht"))
    val fr = markers(Seq("le", "la", "les", "et", "est", "une"))
    val es = markers(Seq("el", "los", "las", "y", "es", "una"))
    val hasCjk = length(regexp_replace(c, "[^\\x{4e00}-\\x{9fff}]", "")) > 0
    when(hasCjk, "zh")
      .when(en === 0 && de === 0 && fr === 0 && es === 0, "und")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Content fingerprint as hex MD5 of whitespace-normalized, lowercased
    * text — the exact-dedup key. (Cross-engine stable; xxhash64 is faster
    * inside Spark but not portable to the oracle.)
    */
  def contentFingerprint(c: Column): Column =
    md5(normalizeText(c).cast("binary"))

  /** Dedup normalization: lowercase + collapse whitespace. */
  def normalizeText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Word n-gram shingles (default 3) over the token array, distinct.
    * `sequence` + `transform` keeps it a single codegen'd projection.
    */
  def shingles(c: Column, n: Int = 3): Column = {
    val toks = tokens(c)
    array_distinct(
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
  }

  /** 64-bit hashes of each distinct shingle — input to MinHash / SimHash /
    * Jaccard joins. Backed by the native ShingleHash expression: the
    * composable transform(shingles, xxhash64) form profiled at ~9 s of
    * every dedup query at sf0.1, all interpreter overhead (see
    * ShingleHash's scaladoc).
    */
  def shingleHashes(c: Column, n: Int = 3): Column =
    ShingleHash.shingleHashesNative(c, n)

  /** Multiset variant: one 64-bit hash per n-gram OCCURRENCE (document
    * order preserved) — the input to gram-frequency statistics
    * (repetition signals), where deduping would destroy the counts.
    */
  def shingleHashesAll(c: Column, n: Int = 3): Column =
    ShingleHash.shingleHashesAllNative(c, n)

  /** Winnowed document fingerprints (MOSS-style): the distinct minima of
    * each `w`-window of consecutive gram hashes — ~1/w the density of the
    * full shingle set, with the guarantee that documents sharing a token
    * run of length >= w + n - 1 share a fingerprint. The positional
    * near-dup/plagiarism sketch; pairs join on these instead of the full
    * shingle stream.
    */
  def winnowHashes(c: Column, n: Int = 3, w: Int = 4): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ShingleHash(org.apache.spark.sql.GraftColumnBridge.expression(c), n,
        distinct = true, winnow = w))
}
