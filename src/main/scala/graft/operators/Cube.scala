package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Exprs._

/** Dynamic OLAP cube DSL — graft's re-expression of the reference's
  * HelixQuery builder (dash_app.py:272-1258). The reference assembles
  * SQL text from UI state: chosen dimensions (plain or array-typed
  * taxonomy attributes with per-value confidence thresholds,
  * dash_app.py:457-476/1198-1202), metrics (count / count-distinct /
  * sum, dash_app.py:384-409), nested boolean filter groups with
  * and/or/exclude (dash_app.py:1141-1159), a HAVING metric >= n clause
  * (dash_app.py:1238-1239), order-by-first-metric-desc and a limit
  * (dash_app.py:1227-1228).
  *
  * Here the same spec compiles to a Catalyst logical plan instead of a
  * SQL string: filters land before the aggregate (pushdown-able to the
  * scan), array dims explode AFTER row filters (so the row multiplier
  * applies to as few rows as possible), metrics aggregate with map-side
  * partials, and the limit compiles to TakeOrderedAndProject — no full
  * sort at 100 TB.
  */
object Cube {

  // ---- filter tree (dash_app.py:1141-1159 and/or/exclude groups) ----
  sealed trait Node
  final case class Pred(column: String, op: String, values: Seq[Any]) extends Node
  final case class Group(all: Boolean, exclude: Boolean, kids: Seq[Node]) extends Node

  def and(kids: Node*): Node = Group(all = true, exclude = false, kids)
  def or(kids: Node*): Node = Group(all = false, exclude = false, kids)
  def not(kids: Node*): Node = Group(all = true, exclude = true, kids)

  // ---- metrics (dash_app.py:384-409 metric_info calculations) ----
  sealed trait Metric { def name: String }
  final case class CountRows(name: String) extends Metric
  final case class CountDistinct(name: String, column: String) extends Metric
  final case class SumMetric(name: String, column: String) extends Metric
  final case class AvgMetric(name: String, column: String) extends Metric
  final case class MinMetric(name: String, column: String) extends Metric
  final case class MaxMetric(name: String, column: String) extends Metric

  /** Array-typed dimension backed by parallel CSV (values, confs)
    * columns; exploded pairwise, kept where conf >= minConf. */
  final case class ArrayDim(name: String, valuesCol: String, confsCol: String, minConf: Double)

  final case class Spec(
      dims: Seq[String],
      arrayDims: Seq[ArrayDim] = Nil,
      metrics: Seq[Metric],
      filter: Option[Node] = None,
      havingMin: Option[(String, Double)] = None,
      limit: Option[Int] = None)

  def compileFilter(n: Node): Column = n match {
    case Pred(c, "=", Seq(v))    => col(c) === lit(v)
    case Pred(c, "!=", Seq(v))   => col(c) =!= lit(v)
    case Pred(c, ">", Seq(v))    => col(c) > lit(v)
    case Pred(c, ">=", Seq(v))   => col(c) >= lit(v)
    case Pred(c, "<", Seq(v))    => col(c) < lit(v)
    case Pred(c, "<=", Seq(v))   => col(c) <= lit(v)
    case Pred(c, "like", Seq(v)) => col(c).like(v.toString)
    case Pred(c, "in", vs)       => col(c).isin(vs: _*)
    case Pred(c, op, vs) =>
      throw new IllegalArgumentException(s"unsupported predicate: $c $op $vs")
    case Group(all, exclude, kids) =>
      require(kids.nonEmpty, "empty filter group")
      val merged = kids.map(compileFilter).reduce((a, b) => if (all) a && b else a || b)
      if (exclude) !merged else merged
  }

  private def compileMetric(m: Metric): Column = m match {
    case CountRows(n)          => count(lit(1)).as(n)
    case CountDistinct(n, c)   => countDistinct(col(c)).as(n)
    case SumMetric(n, c)       => dsum(col(c)).as(n)
    // avg as exact decimal sum / count, partition-order independent
    case AvgMetric(n, c)       => (dsum(col(c)) / count(col(c))).as(n)
    case MinMetric(n, c)       => min(col(c)).as(n)
    case MaxMetric(n, c)       => max(col(c)).as(n)
  }

  /** Compile + run a cube spec against a base DataFrame. */
  def run(base: DataFrame, spec: Spec): DataFrame = {
    require(spec.metrics.nonEmpty, "cube needs at least one metric")
    // 1. row filters first — they push to the scan and shrink the
    //    explode multiplier.
    var df = spec.filter.map(f => base.filter(compileFilter(f))).getOrElse(base)
    // 2. array-dim explode: split parallel CSVs, zip to structs,
    //    explode, confidence-filter (dash_app.py:457-476).
    spec.arrayDims.foreach { ad =>
      val pair = explode(zip_with(
        split(col(ad.valuesCol), ","), split(col(ad.confsCol), ","),
        (v, c) => struct(v.as("v"), c.as("c"))))
      df = df
        .withColumn("__pair", pair)
        .withColumn(ad.name, col("__pair.v"))
        .withColumn(ad.name + "_conf", col("__pair.c").cast("double") / 10.0)
        .filter(col(ad.name + "_conf") >= ad.minConf)
        .drop("__pair")
    }
    // 3. aggregate with map-side partials.
    val dimCols = (spec.dims ++ spec.arrayDims.map(_.name)).map(col)
    val aggCols = spec.metrics.map(compileMetric)
    var out = df.groupBy(dimCols: _*).agg(aggCols.head, aggCols.tail: _*)
    // 4. HAVING metric >= n (dash_app.py:1238-1239).
    spec.havingMin.foreach { case (metric, min) => out = out.filter(col(metric) >= min) }
    // 5. order by first metric desc with dim tiebreak, then limit →
    //    TakeOrderedAndProject, never a global sort.
    spec.limit.foreach { k =>
      val ordering = col(spec.metrics.head.name).desc +: dimCols.map(_.asc)
      out = out.orderBy(ordering: _*).limit(k)
    }
    out
  }

  /** Representative cube instance for the driver's correctness gate:
    * events with a synthesized array taxonomy, one plain dim + one
    * array dim, three metrics, a nested and/or/exclude filter tree,
    * HAVING, and a top-k limit. */
  def q10DynamicCube(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .withColumn("tags_csv",
        concat_ws(",", concat(lit("t"), col("user_id") % 5), concat(lit("u"), col("user_id") % 3)))
      .withColumn("tag_confs_csv",
        concat_ws(",", col("event_id") % 10, (col("event_id") * 3) % 10))
    val spec = Spec(
      dims = Seq("event_type"),
      arrayDims = Seq(ArrayDim("tag", "tags_csv", "tag_confs_csv", minConf = 0.5)),
      metrics = Seq(
        CountDistinct("users", "user_id"),
        CountRows("events"),
        SumMetric("value_sum", "value")),
      filter = Some(and(
        Pred("value", ">=", Seq(1.0)),
        or(
          Pred("event_type", "in", Seq("click", "view", "purchase")),
          Pred("user_id", "<", Seq(100))),
        not(Pred("event_type", "=", Seq("error"))))),
      havingMin = Some(("users", 1.0)),
      limit = Some(100))
    run(base, spec)
  }
}
