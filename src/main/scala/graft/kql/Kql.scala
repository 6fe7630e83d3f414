package graft.kql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Thin KQL-flavored surface over DataFrames (SURVEY.md §7.4): each verb
  * desugars to vanilla DataFrame ops, so Catalyst sees a plain declarative
  * plan — no parser, no custom logical nodes.
  *
  * Dialect defaults reproduced from the reference queries:
  *  - `sort by x` with no direction is DESCENDING (README.md:376,388);
  *  - `summarize agg by k` ≡ groupBy(k).agg (README.md:363-367);
  *  - `top n by x` ≡ desc sort + limit — Catalyst plans
  *    TakeOrderedAndProject (true distributed top-k, no full sort).
  */
object Kql {

  implicit class KqlOps(private val df: DataFrame) extends AnyVal {

    /** KQL `where` */
    def kqlWhere(cond: Column): DataFrame = df.filter(cond)

    /** KQL `project` */
    def project(cols: Column*): DataFrame = df.select(cols: _*)

    /** KQL `extend name = expr` */
    def extend(name: String, c: Column): DataFrame = df.withColumn(name, c)

    /** KQL `summarize a1 = agg1(...), ... by k1, k2` */
    def summarize(aggs: Seq[(String, Column)], by: Column*): DataFrame = {
      val named = aggs.map { case (n, c) => c.as(n) }
      if (by.isEmpty) df.agg(named.head, named.tail: _*)
      else df.groupBy(by: _*).agg(named.head, named.tail: _*)
    }

    /** KQL `sort by c1, c2` — DESC by default (README.md:376). */
    def kqlSort(cols: Column*): DataFrame = df.orderBy(cols.map(_.desc): _*)

    /** KQL `sort by c asc` escape hatch. */
    def kqlSortAsc(cols: Column*): DataFrame = df.orderBy(cols.map(_.asc): _*)

    /** KQL `top n by c` (desc, like `sort`). */
    def top(n: Int, by: Column*): DataFrame =
      df.orderBy(by.map(_.desc): _*).limit(n)

    /** KQL `take n` */
    def take(n: Int): DataFrame = df.limit(n)

    /** KQL `count` */
    def kqlCount: DataFrame = df.agg(count(lit(1)).as("Count"))

    /** KQL `distinct c1, c2` */
    def kqlDistinct(cols: Column*): DataFrame = df.select(cols: _*).distinct()

    /** KQL `project-away c1, c2` */
    def projectAway(cols: String*): DataFrame = df.drop(cols: _*)

    /** KQL `mv-expand c` — one row per array element. */
    def mvExpand(column: String): DataFrame =
      df.withColumn(column, explode(col(column)))

    /** KQL `mv-expand name = <array expr> [to typeof(t)]` — explode an
      * arbitrary array expression (e.g. a struct path) into `name`,
      * optionally element-casting via try_cast (ADX: non-conforming
      * elements become null, the query never aborts). The cast is a
      * second projection because Spark generators must sit at the top
      * of theirs — Catalyst collapses the two. */
    def mvExpand(name: String, arr: Column,
                 castTo: Option[String] = None): DataFrame = {
      val exploded = df.withColumn(name, explode(arr))
      castTo.fold(exploded)(t =>
        exploded.withColumn(name, expr(s"try_cast($name AS $t)")))
    }

    /** KQL `mv-expand with_itemindex=<ix> name = <array expr>` — like
      * [[mvExpand]] but also emits each element's 0-based position
      * (ADX's with_itemindex), via posexplode. */
    def mvExpandIndexed(ixName: String, name: String, arr: Column,
                        castTo: Option[String] = None): DataFrame = {
      // loud rejection (the parser's convention) instead of posexplode
      // emitting a duplicate column that fails later with an ambiguity
      // error far from the query text
      require(!df.columns.contains(ixName),
        s"mv-expand with_itemindex name '$ixName' collides with an existing column")
      // when expanding an existing column in place, the source column
      // is dropped from the carry-through list (posexplode re-emits it)
      val carried = df.columns.filterNot(_ == name).map(col)
      val exploded = df.select(carried :+ posexplode(arr).as(Seq(ixName, name)): _*)
      castTo.fold(exploded)(t =>
        exploded.withColumn(name, expr(s"try_cast(`$name` AS $t)")))
    }

    /** KQL `mv-expand bagexpansion=(bag|array) name = <bag expr>` —
      * one row per TOP-LEVEL property of a property bag, in CANONICAL
      * sorted-key order (the VARIANT encoding sorts object fields;
      * insertion order is not representable in a bag anywhere in this
      * engine — with_itemindex exposes the canonical position, and the
      * spec pins it). `bag` mode emits
      * single-property bags {"k": v} (ADX's default for dynamic
      * objects), `array` mode emits ["k", v] pairs; both stay VARIANT.
      * A non-object cell (array, scalar, null) casts to a null map
      * and the row drops — ADX's convention for expanding a non-bag
      * under bagexpansion. Map-side generator, no shuffle. */
    def mvExpandBag(name: String, bagSql: String, mode: String,
                    ixName: Option[String]): DataFrame = {
      ixName.foreach { ix =>
        require(!df.columns.contains(ix),
          s"mv-expand with_itemindex name '$ix' collides with an existing column")
      }
      val entries = expr(s"map_entries(try_cast(($bagSql) AS MAP<STRING, VARIANT>))")
      val carried = df.columns.filterNot(_ == name).map(col).toSeq
      val ec = "_graft_mv_bag"
      val exploded = ixName match {
        case Some(ix) => df.select(carried :+ posexplode(entries).as(Seq(ix, ec)): _*)
        case None => df.select(carried :+ explode(entries).as(ec): _*)
      }
      val rendered = mode match {
        case "bag" => s"parse_json(to_json(map($ec.key, $ec.value)))"
        case _ => s"parse_json(to_json(array(cast($ec.key AS VARIANT), $ec.value)))"
      }
      exploded.withColumn(name, expr(rendered)).drop(ec)
    }

    /** KQL `mv-expand a, b, …` — multi-column LOCKSTEP expansion. ADX
      * zips parallel arrays row-wise: the row expands to max(len(…))
      * rows, shorter arrays null-fill their column, a NULL array
      * behaves as empty (null on every emitted row — single-column
      * explode would have dropped the row, but a sibling array can
      * still force rows out), and a row where every array is
      * null/empty emits nothing. One `arrays_zip` + explode — a
      * map-side generator, no shuffle, no generated row ids; the
      * null-fill comes from arrays_zip's own max-length padding.
      * `ixName` adds ADX's with_itemindex lockstep position. */
    def mvExpandMulti(ixName: Option[String],
                      specs: Seq[(String, Column, Option[String])]): DataFrame = {
      require(specs.map(_._1).distinct.size == specs.size,
        s"mv-expand names collide: ${specs.map(_._1).mkString(", ")}")
      ixName.foreach { ix =>
        require(!df.columns.contains(ix) && !specs.exists(_._1 == ix),
          s"mv-expand with_itemindex name '$ix' collides with an existing column")
      }
      // coalesce(arr, array()) — arrays_zip is null-intolerant (one
      // NULL child nulls the whole zip, and explode would then drop
      // the row); an empty array participates as pure padding instead.
      val zipped = arrays_zip(specs.map { case (n, c, _) =>
        coalesce(c, array()).as(n)
      }: _*)
      val replaced = specs.map(_._1).toSet
      val carried = df.columns.filterNot(replaced).map(col).toSeq
      val zc = "_graft_mv_zip"
      val exploded = ixName match {
        case Some(ix) => df.select(carried :+ posexplode(zipped).as(Seq(ix, zc)): _*)
        case None => df.select(carried :+ explode(zipped).as(zc): _*)
      }
      val projected = specs.foldLeft(exploded) { case (d, (n, _, castTo)) =>
        val c = col(s"$zc.`$n`")
        d.withColumn(n, castTo.fold(c)(t => expr(s"try_cast($zc.`$n` AS $t)")))
      }
      projected.drop(zc)
    }

    /** KQL `parse ... with regex` flavor: extract one regex group. */
    def parseExtract(name: String, source: Column, regex: String,
                     group: Int = 1): DataFrame =
      df.withColumn(name, regexp_extract(source, regex, group))

    /** KQL `render <kind>` (README.md:366,377,389) — presentation is a
      * client concern (SURVEY.md §2.F-K4..K6); the chart kind rides as a
      * tag next to the computed frame. */
    def render(kind: String): RenderedQuery = RenderedQuery(df, kind)
  }

  /** A query result tagged with its requested chart kind. */
  final case class RenderedQuery(df: DataFrame, chartKind: String)

  // ---- KQL aggregation-function vocabulary → Spark built-ins -------------

  /** KQL `bin(x, size)` — left edge of x's bucket, as floor-mod
    * subtraction: integral operands stay in integer arithmetic (exact
    * past 2^53, where floor(x/size)*size's double division loses
    * ulps); fractional operands floor correctly for negatives too.
    * Size must be positive (the text front-end validates). */
  def bin(c: Column, size: Column): Column = c - ((c % size + size) % size)

  /** KQL `bin(timestamp, duration)` — left edge of the time bucket
    * (the `render timechart` x-axis). Duration in seconds. */
  def binTime(c: Column, seconds: Long): Column =
    timestamp_seconds(floor(unix_timestamp(c) / seconds) * seconds)

  /** KQL `dcount(c)` */
  def dcount(c: Column): Column = count_distinct(c)

  /** KQL `countif(pred)` */
  def countif(pred: Column): Column = sum(when(pred, 1L).otherwise(0L))

  /** KQL `make_list(c)` / `make_set(c)` */
  def makeList(c: Column): Column = collect_list(c)
  def makeSet(c: Column): Column = collect_set(c)

  /** KQL `arg_max(by, ret)` / `arg_min(by, ret)` */
  def argMax(by: Column, ret: Column): Column = max_by(ret, by)
  def argMin(by: Column, ret: Column): Column = min_by(ret, by)
}
