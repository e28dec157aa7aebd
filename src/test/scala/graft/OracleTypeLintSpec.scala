package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lints every oracle SQL for the DuckDB type-widening bug class that
  * produced round 10's only red gate row (lift_curve): DuckDB widens
  * `sum(BIGINT)` — plain or windowed — to HUGEINT, and HUGEINT
  * propagates through later arithmetic (`//` in lift_curve's case)
  * into an output column whose stringified value then hash-mismatches
  * the engine's BIGINT in the driver compare, even when every value is
  * numerically identical.
  *
  * The authoritative check is driver-shaped (tools/oracle_check.py
  * compares result dtypes through DuckDB itself); this spec is the
  * sbt-test tripwire that catches the PATTERN without DuckDB:
  *
  *  1. every window `sum(X) OVER` whose argument looks integer-valued
  *     (no float literal / AS DOUBLE in X) must either be wrapped in
  *     CAST(...) at the definition site — the house discipline every
  *     other window sum in the repo follows — or alias a name we then
  *     treat as TAINTED;
  *  2. a `//` (DuckDB integer floor-div) whose neighborhood references
  *     a tainted alias, or directly contains a window sum, must itself
  *     be inside a CAST(...) span.
  *
  * Queries where a tainted alias is provably harmless (consumed only
  * by float arithmetic or comparisons) go on the explicit whitelist
  * below with a one-line reason — the next red gate row should force a
  * conscious decision, not a silent pass.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  /** (query name, alias) pairs verified safe by running the oracle
    * through tools/oracle_check.py's dtype compare: the tainted alias
    * never reaches an output column with HUGEINT intact.
    */
  private val whitelist: Set[(String, String)] = Set()

  private def stripLiterals(sql: String): String =
    sql.replaceAll("'[^']*'", "''")

  /** Spans (openParenIdx, closeParenIdx) of calls to `name(...)`. */
  private def callSpans(sql: String, name: String): Seq[(Int, Int)] = {
    val lower = sql.toLowerCase
    val out = Seq.newBuilder[(Int, Int)]
    var idx = lower.indexOf(name + "(")
    while (idx >= 0) {
      val boundary = idx == 0 || !Character.isLetterOrDigit(lower(idx - 1))
      if (boundary) {
        var depth = 0
        var j = idx + name.length
        var end = -1
        while (j < sql.length && end < 0) {
          sql(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        if (end > 0) out += ((idx + name.length, end))
      }
      idx = lower.indexOf(name + "(", idx + 1)
    }
    out.result()
  }

  private def inside(spans: Seq[(Int, Int)], i: Int): Boolean =
    spans.exists { case (a, b) => i > a && i < b }

  /** Window sums whose argument looks integer-valued. Returns
    * (sumIdx, argText, aliasOpt, insideCast).
    */
  private def intWindowSums(sql: String, castSpans: Seq[(Int, Int)])
      : Seq[(Int, String, Option[String], Boolean)] = {
    val lower = sql.toLowerCase
    val out = Seq.newBuilder[(Int, String, Option[String], Boolean)]
    var idx = lower.indexOf("sum")
    while (idx >= 0) {
      val boundary = idx == 0 || !Character.isLetterOrDigit(lower(idx - 1))
      // allow whitespace between sum and (
      var p = idx + 3
      while (p < sql.length && sql(p).isWhitespace) p += 1
      if (boundary && p < sql.length && sql(p) == '(') {
        var depth = 0; var j = p; var end = -1
        while (j < sql.length && end < 0) {
          sql(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        if (end > 0) {
          var q = end + 1
          while (q < sql.length && sql(q).isWhitespace) q += 1
          if (lower.startsWith("over", q)) {
            val arg = sql.substring(p + 1, end).toLowerCase
            val floaty = arg.matches("(?s).*(\\d\\.\\d|\\.0|as double|::double).*")
            if (!floaty) {
              // skip OVER (...) window spec, then look for AS alias
              var r = q + 4
              while (r < sql.length && sql(r).isWhitespace) r += 1
              if (r < sql.length && sql(r) == '(') {
                var d2 = 0; var k = r; var wEnd = -1
                while (k < sql.length && wEnd < 0) {
                  sql(k) match {
                    case '(' => d2 += 1
                    case ')' => d2 -= 1; if (d2 == 0) wEnd = k
                    case _ =>
                  }
                  k += 1
                }
                r = if (wEnd > 0) wEnd + 1 else r
              } else {
                // named window `OVER w` — skip the name token
                while (r < sql.length &&
                  (Character.isLetterOrDigit(sql(r)) || sql(r) == '_')) r += 1
              }
              while (r < sql.length && sql(r).isWhitespace) r += 1
              val alias =
                if (lower.startsWith("as ", r)) {
                  var a0 = r + 3
                  while (a0 < sql.length && sql(a0).isWhitespace) a0 += 1
                  var a1 = a0
                  while (a1 < sql.length &&
                    (Character.isLetterOrDigit(sql(a1)) || sql(a1) == '_'))
                    a1 += 1
                  if (a1 > a0) Some(sql.substring(a0, a1)) else None
                } else None
              out += ((idx, arg, alias, inside(castSpans, idx)))
            }
          }
        }
      }
      idx = lower.indexOf("sum", idx + 1)
    }
    out.result()
  }

  test("oracle SQL: integer window sums are CAST or their aliases never feed uncast //") {
    val failures = Seq.newBuilder[String]
    for ((name, rawSql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      val sql = stripLiterals(rawSql)
      // a sum inside floor(...) rides the float-quantization idiom
      // (floor(x * 1e6 + 0.5) / 1e6): the float multiply collapses
      // HUGEINT to DOUBLE, so the widening can't reach an output
      val castSpans = callSpans(sql, "cast") ++ callSpans(sql, "floor")
      val sums = intWindowSums(sql, castSpans)
      val tainted = sums.collect {
        case (_, _, Some(a), false)
          if !whitelist((name, a)) => a.toLowerCase
      }.toSet
      for ((i, arg, alias, cast) <- sums if !cast && alias.isEmpty)
        failures += s"$name: anonymous uncast integer window sum over ($arg)"
      // every `//` with a tainted operand (or an inline window sum)
      // must sit inside a CAST span
      val lower = sql.toLowerCase
      var idx = lower.indexOf("//")
      while (idx >= 0) {
        if (!inside(castSpans, idx)) {
          val lo = math.max(0, idx - 160)
          val hi = math.min(sql.length, idx + 120)
          val hood = lower.substring(lo, hi)
          val words = hood.split("[^a-z0-9_]+").toSet
          val taintHit = tainted.intersect(words)
          if (taintHit.nonEmpty)
            failures += s"$name: uncast `//` over window-sum-derived " +
              s"column(s) ${taintHit.mkString(",")} — DuckDB HUGEINT " +
              "propagates to the output; wrap in CAST(... AS BIGINT)"
        }
        idx = lower.indexOf("//", idx + 1)
      }
    }
    val bad = failures.result()
    assert(bad.isEmpty, "\n" + bad.mkString("\n"))
  }
}
