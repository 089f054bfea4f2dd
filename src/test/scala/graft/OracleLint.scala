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
}
