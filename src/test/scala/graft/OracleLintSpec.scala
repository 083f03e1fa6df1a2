package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint over [[SparkEntry.oracleSql]] for the one failure class that has
  * produced every red CORRECTNESS row to date: a DuckDB integer `sum(...)`
  * exported without a cast. DuckDB types `sum` over integers as HUGEINT
  * while the Spark side emits BIGINT — rows and rounded values still match,
  * so the builder's local compare stays green and only the driver's
  * type-sensitive hash turns red. This spec makes the mistake a local test
  * failure instead of a driver surprise.
  *
  * The rule: an alias that the oracle's FINAL select exports, whose
  * defining expression (at any CTE level — an uncast inner definition
  * re-exported bare, the hist_quantiles shape, is exactly the bug) contains
  * a bare `sum(`, must be wrapped in `CAST(... AS <type>)` or `round(...)`
  * (round returns DOUBLE on both engines) or sum a DECIMAL operand (DuckDB
  * types decimal sums DECIMAL, not HUGEINT). Pure string analysis — no
  * Spark session, no DuckDB — so it runs in milliseconds with `sbt test`.
  */
class OracleLintSpec extends AnyFunSuite {

  private val TypeNames = Set(
    "BIGINT", "DOUBLE", "HUGEINT", "INT", "INTEGER", "VARCHAR", "DECIMAL",
    "BOOLEAN", "TINYINT", "SMALLINT", "FLOAT", "DATE", "TIMESTAMP", "STRING")

  // Clause keywords only — NOT expression-internal ones (OVER, CASE, END):
  // cutting at OVER would strip a window sum down to its frame clause and
  // hide exactly the hist_quantiles bug this lint exists for.
  private val Keywords = Seq(
    "SELECT", "WHERE", "FROM", "GROUP", "ORDER", "HAVING", "THEN", "ELSE",
    "WHEN", "AND", "OR", "ON", "JOIN", "BY", "UNION", "ALL", "DISTINCT",
    "WITH")

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Drop everything through the LAST depth-0 SQL keyword — repairs the
    * backward expression scan when it walks through a preceding clause. */
  private def topLevelCut(expr: String): String = {
    val up = expr.toUpperCase
    var depth = 0
    var last = -1
    var i = 0
    while (i < up.length) {
      up.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 && (i == 0 || !isWordChar(up.charAt(i - 1))) =>
          Keywords.find(kw => up.startsWith(kw, i) &&
              (i + kw.length >= up.length || !isWordChar(up.charAt(i + kw.length))))
            .foreach { kw => last = i + kw.length; i += kw.length - 1 }
        case _ =>
      }
      i += 1
    }
    (if (last >= 0) expr.substring(math.min(last + 1, expr.length)) else expr).trim
  }

  /** The expression a given `AS alias` aliases: scan backward from the AS,
    * balancing parens, to the enclosing depth-0 comma or open paren. */
  private def aliasedExpr(q: String, asPos: Int): String = {
    var i = asPos - 1
    var depth = 0
    var stop = -1
    while (i >= 0 && stop < 0) {
      q.charAt(i) match {
        case ')' => depth += 1
        case '(' => if (depth == 0) stop = i else depth -= 1
        case ',' => if (depth == 0) stop = i
        case _ =>
      }
      i -= 1
    }
    topLevelCut(q.substring(stop + 1, asPos).trim)
  }

  /** Column names the final (last depth-0) SELECT exports: trailing
    * `AS name` aliases plus bare identifier references. */
  private def finalSelectOutputs(q: String): Set[String] = {
    val up = q.toUpperCase
    var depth = 0
    var lastSel = -1
    for (i <- q.indices) {
      q.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && up.startsWith("SELECT", i) &&
            (i == 0 || !isWordChar(up.charAt(i - 1)))) lastSel = i
      }
    }
    if (lastSel < 0) return Set.empty
    val tail = q.substring(lastSel + 6)
    val tup = tail.toUpperCase
    depth = 0
    var end = tail.length
    var i = 0
    while (i < tail.length && end == tail.length) {
      tail.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => if (depth == 0 && tup.startsWith("FROM", i)) end = i
      }
      i += 1
    }
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    depth = 0
    var cur = 0
    val sl = tail.substring(0, end)
    for (j <- sl.indices) {
      sl.charAt(j) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => items += sl.substring(cur, j); cur = j + 1
        case _ =>
      }
    }
    items += sl.substring(cur)
    val asRe = "(?is).*\\bAS\\s+([A-Za-z_]\\w*)\\s*$".r
    val bareRe = "(?s)\\s*([A-Za-z_][\\w.]*)\\s*".r
    items.flatMap {
      case asRe(a)   => Some(a)
      case bareRe(b) => Some(b.split('.').last)
      case _         => None
    }.toSet
  }

  private val sumRe = "(?i)(?<![a-z_])sum\\s*\\(".r
  private val asRe = "(?is)\\bAS\\s+([A-Za-z_]\\w*)".r

  /** All (alias, expr) pairs that violate the rule in one oracle. */
  private[graft] def violations(q: String): Seq[(String, String)] = {
    val outs = finalSelectOutputs(q)
    asRe.findAllMatchIn(q).toSeq.flatMap { m =>
      val alias = m.group(1)
      if (TypeNames.contains(alias.toUpperCase) || !outs.contains(alias)) None
      else {
        val expr = aliasedExpr(q, m.start)
        val up = expr.toUpperCase
        val risky = sumRe.findFirstIn(expr).isDefined &&
          !up.startsWith("CAST(") && !up.startsWith("ROUND(") &&
          !up.contains("DECIMAL")
        if (risky) Some(alias -> expr.take(80).replace('\n', ' ')) else None
      }
    }
  }

  test("every exported integer-risk sum in oracleSql is CAST-wrapped") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      violations(q).map { case (a, e) => s"$name.$a = $e" }
    }
    assert(bad.isEmpty,
      s"\nuncast integer sums exported by oracles (DuckDB HUGEINT vs Spark " +
        s"BIGINT hash-fails at the driver):\n  ${bad.mkString("\n  ")}")
  }

  test("the linter itself flags the round-13 failure shapes (red-on-revert)") {
    // q12_priority_class pre-fix: bare CASE sum exported.
    val q12Bug =
      """SELECT l_linestatus,
        |  sum(CASE WHEN p IN ('1', '2') THEN 1 ELSE 0 END) AS high_line_count
        |FROM orders GROUP BY 1""".stripMargin
    assert(violations(q12Bug).map(_._1) == Seq("high_line_count"))
    // hist_quantiles pre-fix: uncast window sum in a CTE, re-exported bare.
    val histBug =
      """WITH cum AS (SELECT bk, sum(c) OVER (ORDER BY bk) AS cum,
        |                    sum(c) OVER () AS n FROM b)
        |SELECT n, max(cum) AS m FROM cum GROUP BY n""".stripMargin
    assert(violations(histBug).map(_._1) == Seq("n"))
    // The fixed forms pass.
    val fixed =
      """SELECT CAST(sum(CASE WHEN p = '1' THEN 1 ELSE 0 END) AS BIGINT)
        |  AS high_line_count FROM orders""".stripMargin
    assert(violations(fixed).isEmpty)
    // Decimal sums and round-wrapped sums are not integer-risk.
    val ok =
      """SELECT round(sum(l_quantity), 2) AS sum_qty,
        |       CAST(sum(CAST(v AS DECIMAL(30,10))) AS DOUBLE) AS sv
        |FROM lineitem""".stripMargin
    assert(violations(ok).isEmpty)
  }
}
