package graft.kql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text front-end for the KQL dialect surface (SURVEY.md §2.D/§2.E):
  * parses the pipe-delimited query shapes the reference user actually
  * types (README.md:363-392 — `Orders | summarize <agg> by <col> |
  * sort by <col> | render <kind>`) plus the adjacent verbs the builder
  * ([[Kql.KqlOps]]) already implements, and desugars every stage to the
  * corresponding DataFrame call. The parser owns ONLY surface syntax —
  * planning stays 100% Catalyst, and each verb's semantics (desc-default
  * `sort`, `summarize ... by` grouping, `top` as TakeOrderedAndProject)
  * are the builder's, so text queries and builder queries are one code
  * path.
  *
  * Supported verbs: `where`, `project`, `project-away`, `extend`,
  * `summarize`, `sort by`/`order by`, `top N by`, `take`/`limit`,
  * `count`, `distinct`, `render`. Aggregates: avg, sum, min, max,
  * count, dcount, countif, arg_max, arg_min. Scalar expressions pass
  * through Spark SQL after translating the KQL operator spellings
  * (`==`, `!=`, `=~`, `contains`, `startswith`, `endswith`, `bin`).
  * Out of scope (documented, not silently wrong): `join`, `mv-expand`
  * with path args, `parse`, datatable literals, `let` — the builder
  * covers the first two natively.
  */
object KqlParser {

  /** A parsed query: the computed frame plus the `render` chart tag, if
    * any (presentation stays a client concern, SURVEY.md §2.F-K4..K6). */
  final case class Parsed(df: DataFrame, render: Option[String])

  /** Parse and desugar `query` against the given table registry. */
  def parse(query: String, tables: Map[String, DataFrame]): Parsed = {
    val stages = splitTopLevel(query, '|').map(_.trim).filter(_.nonEmpty)
    require(stages.nonEmpty, "empty KQL query")
    val tableName = stages.head
    var df = tables.getOrElse(tableName,
      throw new IllegalArgumentException(
        s"unknown table '$tableName' (known: ${tables.keys.mkString(", ")})"))
    var render: Option[String] = None
    import Kql.KqlOps
    stages.tail.foreach { stage =>
      val (verb, rest) = stage.span(c => !c.isWhitespace && c != '-') match {
        case ("project", r) if r.startsWith("-away") =>
          ("project-away", r.stripPrefix("-away").trim)
        case (v, r) => (v, r.trim)
      }
      verb match {
        case "where" => df = df.kqlWhere(expr(scalar(rest)))
        case "project" =>
          df = df.project(splitTopLevel(rest, ',').map(item => namedExpr(item.trim)): _*)
        case "project-away" =>
          df = df.projectAway(splitTopLevel(rest, ',').map(_.trim): _*)
        case "extend" =>
          splitTopLevel(rest, ',').map(_.trim).foreach { item =>
            val (name, e) = nameAndBody(item)
            df = df.extend(name.getOrElse(
              throw new IllegalArgumentException(s"extend needs 'name = expr': $item")), e)
          }
        case "summarize" => df = summarize(df, rest)
        case "sort" | "order" =>
          val body = stripLeadingBy(rest, verb)
          df = df.orderBy(splitTopLevel(body, ',').map(s => sortCol(s.trim)): _*)
        case "top" =>
          val m = "^(\\d+)\\s+by\\s+(.+)$".r
          rest match {
            case m(n, by) =>
              df = df.orderBy(splitTopLevel(by, ',').map(s => sortCol(s.trim)): _*)
                .limit(n.toInt)
            case _ => throw new IllegalArgumentException(s"top expects 'top N by col': $rest")
          }
        case "take" | "limit" => df = df.limit(rest.trim.toInt)
        case "count" => df = df.kqlCount
        case "distinct" =>
          df = if (rest.trim == "*") df.distinct()
               else df.kqlDistinct(splitTopLevel(rest, ',').map(s => expr(scalar(s.trim))): _*)
        case "render" => render = Some(rest.trim.split("\\s+").head)
        case other => throw new IllegalArgumentException(s"unsupported KQL verb '$other'")
      }
    }
    Parsed(df, render)
  }

  /** Parse and return just the frame. */
  def run(query: String, tables: Map[String, DataFrame]): DataFrame =
    parse(query, tables).df

  // ---- stage parsers ------------------------------------------------------

  /** `summarize a1 = agg(x), ... [by k1, k2]` */
  private def summarize(df: DataFrame, body: String): DataFrame = {
    import Kql.KqlOps
    val (aggPart, byPart) = splitOnTopLevelBy(body)
    val aggs = splitTopLevel(aggPart, ',').map(a => aggItem(a.trim))
    byPart match {
      case Some(by) =>
        df.summarize(aggs, splitTopLevel(by, ',').map(s => expr(scalar(s.trim))): _*)
      case None => df.summarize(aggs)
    }
  }

  /** One aggregate item: `[name =] fn(args)`; default names follow KQL
    * (`count_`, `avg_amount`, `dcount_user`, ...). */
  private def aggItem(item: String): (String, Column) = {
    val (nameOpt, body) = item match {
      case NamedRe(n, b) => (Some(n), b.trim)
      case _ => (None, item)
    }
    val FnRe = "^([A-Za-z_][A-Za-z0-9_]*)\\s*\\((.*)\\)$".r
    body match {
      case FnRe(fn, argsStr) =>
        val args = splitTopLevel(argsStr, ',').map(_.trim).filter(_.nonEmpty)
        def arg(i: Int) = expr(scalar(args(i)))
        def defName(suffix: String) =
          fn.toLowerCase + "_" + suffix.replaceAll("[^A-Za-z0-9]", "_")
        val (column, default) = fn.toLowerCase match {
          case "count"   => (count(lit(1)), "count_")
          case "avg"     => (avg(arg(0)), defName(args(0)))
          case "sum"     => (sum(arg(0)), defName(args(0)))
          case "min"     => (min(arg(0)), defName(args(0)))
          case "max"     => (max(arg(0)), defName(args(0)))
          case "dcount"  => (count_distinct(arg(0)), defName(args(0)))
          case "countif" => (Kql.countif(arg(0)), "countif_")
          case "arg_max" => (Kql.argMax(arg(0), arg(1)), defName(args(1)))
          case "arg_min" => (Kql.argMin(arg(0), arg(1)), defName(args(1)))
          case "make_list" => (Kql.makeList(arg(0)), defName(args(0)))
          case "make_set"  => (Kql.makeSet(arg(0)), defName(args(0)))
          case other =>
            throw new IllegalArgumentException(s"unsupported aggregate '$other'")
        }
        nameOpt.getOrElse(default) -> column
      case _ =>
        throw new IllegalArgumentException(s"expected aggregate call, got: $body")
    }
  }

  private val NamedRe = "^([A-Za-z_][A-Za-z0-9_]*)\\s*=\\s*(.+)$".r

  /** `name = expr` → aliased column; bare expr otherwise. */
  private def namedExpr(item: String): Column = {
    val (nameOpt, c) = nameAndBody(item)
    nameOpt.fold(c)(c.as)
  }

  private def nameAndBody(item: String): (Option[String], Column) = item match {
    case NamedRe(n, b) => (Some(n), expr(scalar(b.trim)))
    case _ => (None, expr(scalar(item)))
  }

  /** `col [asc|desc]` — KQL defaults to DESC (README.md:376). */
  private def sortCol(s: String): Column = {
    val lower = s.toLowerCase
    if (lower.endsWith(" asc")) expr(scalar(s.dropRight(4).trim)).asc
    else if (lower.endsWith(" desc")) expr(scalar(s.dropRight(5).trim)).desc
    else expr(scalar(s)).desc
  }

  private def stripLeadingBy(rest: String, verb: String): String = {
    require(rest.startsWith("by ") || rest.startsWith("by\t"),
      s"$verb expects '$verb by <cols>'")
    rest.stripPrefix("by").trim
  }

  // ---- scalar expression translation --------------------------------------

  /** Rewrite KQL operator spellings into Spark SQL; everything else
    * (identifiers, literals, arithmetic, shared function names) passes
    * through to `expr` untouched. String-literal contents are never
    * rewritten. */
  private[kql] def scalar(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' || c == '\'') { // copy string literal verbatim
        val quote = c
        out.append(quote); i += 1
        while (i < s.length && s.charAt(i) != quote) {
          out.append(s.charAt(i)); i += 1
        }
        if (i < s.length) { out.append(quote); i += 1 }
      } else if (s.startsWith("=~", i)) { out.append("ILIKE"); i += 2 } // ci equals → handled below
      else if (s.startsWith("==", i)) { out.append("="); i += 2 }
      else if (s.startsWith("!=", i)) { out.append("<>"); i += 2 }
      else {
        // word-level rewrites: contains/startswith/endswith (KQL is
        // case-insensitive; Spark's like/startswith is not — wrap lower())
        val word = "^[A-Za-z_][A-Za-z0-9_!]*".r.findFirstIn(s.substring(i))
        word match {
          case Some(w) =>
            val repl = w.toLowerCase match {
              case "contains"   => Some("ilike_contains") // marker, fixed up next
              case "startswith" => Some("ilike_starts")
              case "endswith"   => Some("ilike_ends")
              case "and" | "or" | "not" => Some(w.toLowerCase)
              case _ => None
            }
            out.append(repl.getOrElse(w)); i += w.length
          case None => out.append(c); i += 1
        }
      }
    }
    // infix markers → function form: `a ilike_contains "x"` is not valid
    // SQL, so rewrite `<lhs> marker <rhs-literal>` patterns
    var r = out.toString
    val Infix = "([A-Za-z_][A-Za-z0-9_.]*)\\s+ilike_(contains|starts|ends)\\s+('[^']*'|\"[^\"]*\")".r
    r = Infix.replaceAllIn(r, m => {
      val (lhs, kind, lit0) = (m.group(1), m.group(2), m.group(3))
      val lit = "'" + lit0.substring(1, lit0.length - 1).replace("'", "''") + "'"
      kind match {
        case "contains" => s"contains(lower($lhs), lower($lit))"
        case "starts"   => s"startswith(lower($lhs), lower($lit))"
        case "ends"     => s"endswith(lower($lhs), lower($lit))"
      }
    })
    // `a ILIKE b` from =~ : case-insensitive equality
    val Citext = "([A-Za-z_][A-Za-z0-9_.]*)\\s+ILIKE\\s+('[^']*'|\"[^\"]*\")".r
    r = Citext.replaceAllIn(r, m =>
      s"lower(${m.group(1)}) = lower('" +
        m.group(2).substring(1, m.group(2).length - 1).replace("'", "''") + "')")
    r
  }

  // ---- lexing helpers -----------------------------------------------------

  /** Split on `sep` at paren/quote depth zero. */
  private[kql] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur.append(c); if (c == quote) quote = 0 }
      else c match {
        case '"' | '\'' => quote = c; cur.append(c)
        case '(' | '[' => depth += 1; cur.append(c)
        case ')' | ']' => depth -= 1; cur.append(c)
        case `sep` if depth == 0 => parts += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
    }
    parts += cur.toString
    parts.toSeq
  }

  /** Split `... by ...` at the LAST top-level ` by ` keyword (aggregate
    * argument lists can't contain a bare `by` at depth 0). */
  private def splitOnTopLevelBy(s: String): (String, Option[String]) = {
    var depth = 0
    var quote: Char = 0
    var found = -1
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '"' | '\'' => quote = c
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case 'b' if depth == 0 &&
          i + 2 < s.length && s.charAt(i + 1) == 'y' &&
          (i == 0 || s.charAt(i - 1).isWhitespace) && s.charAt(i + 2).isWhitespace =>
          found = i
        case _ =>
      }
      i += 1
    }
    if (found < 0) (s.trim, None)
    else (s.substring(0, found).trim, Some(s.substring(found + 2).trim))
  }
}
