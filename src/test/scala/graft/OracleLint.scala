package graft

/** Oracle-SQL dtype lint — the DuckDB HUGEINT trap.
  *
  * DuckDB's `sum(BIGINT)` returns HUGEINT, which pandas fetches as
  * float64; the driver's hash compare is dtype-sensitive, so an oracle
  * column defined by an UNWRAPPED `sum(...)` that the Spark side types as
  * LONG hash-mismatches even when every value is identical (the round-12
  * defect: map_analytics `total`, variant_props `sum_k`,
  * source_concentration `n_chars`). `CAST(sum(...) AS BIGINT)` is the
  * fix, and this lint makes the omission a named test failure instead of
  * an unexplainable driver-red row.
  *
  * The check is textual (no DuckDB in this environment): for every
  * Spark-side LONG output column, every `AS <col>` alias site in the
  * oracle SQL is inspected — if the defining expression contains a
  * `sum(` aggregate and is not wrapped in a `CAST`, the column is
  * flagged. Alias sites inside CTEs count too: a bare passthrough in
  * the final SELECT inherits the CTE's HUGEINT.
  */
object OracleLint {

  /** The expression text immediately preceding position `asPos` (the start
    * of an `AS <alias>` token): scan backwards to the nearest `,`, `(`, or
    * statement keyword at paren depth zero.
    */
  private def exprBefore(sql: String, asPos: Int): String = {
    var i = asPos - 1
    var depth = 0
    var start = 0
    var found = false
    while (i >= 0 && !found) {
      val ch = sql.charAt(i)
      if (ch == ')') depth += 1
      else if (ch == '(') {
        if (depth == 0) { start = i + 1; found = true }
        else depth -= 1
      } else if (ch == ',' && depth == 0) { start = i + 1; found = true }
      i -= 1
    }
    val raw = sql.substring(start, asPos)
    // The backward scan can legitimately cross a whole balanced CTE body
    // (`..., s AS (SELECT sum(q) ... ) SELECT count(*) AS n`): nothing
    // before the final SELECT belongs to this alias's expression. Cut at
    // the LAST depth-zero statement keyword so a CTE's aggregates are
    // never attributed to a later alias.
    val depths = new Array[Int](raw.length)
    var d = 0
    var j = 0
    while (j < raw.length) {
      depths(j) = d
      val c = raw.charAt(j)
      if (c == '(') d += 1 else if (c == ')') d -= 1
      j += 1
    }
    val kw = "(?is)\\b(select|then|else|when)\\b".r
    val cut = kw.findAllMatchIn(raw)
      .filter(m => depths(m.start) == 0)
      .map(_.end).foldLeft(0)(math.max)
    raw.substring(cut).replaceAll("(?is)^\\s*(DISTINCT\\s+)", "").trim
  }

  /** `sum(` ONLY: DuckDB's count — plain or DISTINCT — returns BIGINT
    * and fetches as int64, so it is NOT the trap; the driver itself
    * proves this (mergeable_rollup's `count(DISTINCT user_id) AS
    * exact_users` was hash-green in CORRECTNESS_r12 uncast). Flagging
    * count(DISTINCT here would force no-op casts onto dozens of
    * driver-green oracles and teach readers the wrong failure model.
    */
  private val aggRe = "(?is)\\bsum\\s*\\(".r

  /** Balanced `CAST( ... )` spans within an expression: any aggregate
    * whose position falls inside one is typed by the CAST, not by
    * DuckDB's sum-widening (e.g. `least(t, CAST(floor(sum(t) OVER ())
    * AS BIGINT))` — driver-green in round 12 as token_budget_mix).
    */
  private def castSpans(expr: String): Seq[(Int, Int)] =
    "(?is)\\bcast\\s*\\(".r.findAllMatchIn(expr).map { m =>
      var depth = 1
      var i = m.end
      while (i < expr.length && depth > 0) {
        val ch = expr.charAt(i)
        if (ch == '(') depth += 1 else if (ch == ')') depth -= 1
        i += 1
      }
      (m.end - 1, i - 1)
    }.toSeq

  /** Spark LONG output columns whose oracle alias site contains a `sum(`
    * not enclosed by any CAST. Empty = clean.
    */
  def uncastAggAliases(sql: String, longCols: Set[String]): Seq[String] =
    longCols.toSeq.sorted.filter { col =>
      val asRe = ("(?is)\\bAS\\s+" + java.util.regex.Pattern.quote(col) +
        "\\b").r
      asRe.findAllMatchIn(sql).exists { m =>
        val expr = exprBefore(sql, m.start)
        val spans = castSpans(expr)
        aggRe.findAllMatchIn(expr).exists(a =>
          !spans.exists { case (o, c) => a.start > o && a.start < c })
      }
    }

  /** The TARGET type text of a `CAST( ... AS <type> )` span `(o, c)`:
    * everything after the last depth-zero `AS` token inside the span
    * (depth relative to the cast's own parens, so a nested CAST's `AS`
    * never wins).
    */
  private def castTarget(expr: String, o: Int, c: Int): String = {
    val body = expr.substring(o + 1, c)
    val depths = new Array[Int](body.length)
    var d = 0
    var i = 0
    while (i < body.length) {
      depths(i) = d
      val ch = body.charAt(i)
      if (ch == '(') d += 1 else if (ch == ')') d -= 1
      i += 1
    }
    "(?is)\\bAS\\b".r.findAllMatchIn(body)
      .filter(m => depths(m.start) == 0)
      .toSeq.lastOption.map(m => body.substring(m.end).trim).getOrElse("")
  }

  private val wideDecTargetRe = "(?is)^DECIMAL\\s*\\(\\s*(\\d+)".r
  private val postfixDecRe = "(?is)::\\s*DECIMAL\\s*\\(\\s*(\\d+)".r
  private val bareIdentRe = "(?is)[A-Za-z_][A-Za-z0-9_.]*"

  /** Whether one alias-site expression's FINAL type is a DECIMAL with
    * precision > 18: its outermost CAST targets one, or a top-level
    * DuckDB postfix `::DECIMAL(p>18)` applies outside every CAST span.
    */
  private def siteIsWide(expr: String): Boolean = {
    val spans = castSpans(expr)
    val outer = spans.filterNot { case (o, c) =>
      spans.exists { case (o2, c2) => o2 < o && c < c2 }
    }
    val outerWide = outer.exists { case (o, c) =>
      wideDecTargetRe.findFirstMatchIn(castTarget(expr, o, c))
        .exists(_.group(1).toInt > 18)
    }
    val postfixWide = postfixDecRe.findAllMatchIn(expr).exists { pm =>
      pm.group(1).toInt > 18 &&
        !spans.exists { case (o, c) => pm.start > o && pm.start < c }
    }
    outerWide || postfixWide
  }

  /** Output columns whose oracle SQL types them DECIMAL(p>18) — the
    * round-16 hash-red class the round-13 `uncastAggAliases` lint waved
    * through: DuckDB fetches a wide decimal as pandas float64 while the
    * driver reads Spark's parquet via pyarrow as exact Decimal objects,
    * so a value beyond 2⁵³ (e.g. state_inspect_lexical's ~10¹⁹ h_sum)
    * can NEVER hash-match even when every cell is numerically identical.
    * A wide decimal is fine as an INTERMEDIATE (bm25's exact integer
    * kernel lives in DECIMAL(38,0)) — what this flags is a final-type
    * wide decimal: the column's LAST `AS <col>` site whose outermost
    * CAST (or top-level `::`) targets DECIMAL(p>18), or a bare
    * passthrough at the last site inheriting a wide earlier site.
    * Re-cast the surface to VARCHAR (the table_checksum discipline) or
    * a ≤18-precision / integer / double type on BOTH sides. Empty =
    * clean.
    */
  def wideDecimalAliases(sql: String, outCols: Set[String]): Seq[String] =
    outCols.toSeq.sorted.filter { col =>
      val asRe = ("(?is)\\bAS\\s+" + java.util.regex.Pattern.quote(col) +
        "\\b").r
      val sites = asRe.findAllMatchIn(sql).toSeq
        .map(m => exprBefore(sql, m.start))
      sites.lastOption.exists { last =>
        if (last.matches(bareIdentRe))
          // final SELECT passes the column through — its type is
          // whatever the defining (earlier) site produced
          sites.init.exists(siteIsWide)
        else siteIsWide(last)
      }
    }
}
