package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class CubeSpec extends AnyFunSuite with SparkFixture {
  import Cube._

  private def base = {
    import spark.implicits._
    Seq(
      ("click", 1L, 5.0, "a,b", "9,2"),
      ("click", 2L, 3.0, "a,c", "7,8"),
      ("view", 1L, 2.0, "b,c", "1,9"),
      ("error", 3L, 9.0, "a,b", "9,9"))
      .toDF("event_type", "user_id", "value", "tags", "confs")
  }

  test("filter tree: and/or/exclude compile correctly") {
    val f = and(
      Pred("value", ">=", Seq(2.0)),
      or(Pred("event_type", "=", Seq("click")), Pred("user_id", "<", Seq(2L))),
      not(Pred("event_type", "=", Seq("error"))))
    val out = base.filter(compileFilter(f)).collect()
    // rows: click/1 (v5), click/2 (v3), view/1 (v2, user<2); error excluded
    assert(out.length === 3)
  }

  test("in and like predicates") {
    assert(base.filter(compileFilter(Pred("event_type", "in", Seq("click", "view")))).count() === 3)
    assert(base.filter(compileFilter(Pred("event_type", "like", Seq("cl%")))).count() === 2)
  }

  test("array dim explodes with confidence threshold") {
    val spec = Spec(
      dims = Seq("event_type"),
      arrayDims = Seq(ArrayDim("tag", "tags", "confs", minConf = 0.7)),
      metrics = Seq(CountRows("n")))
    val out = Cube.run(base, spec).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("tag")) -> r.getAs[Long]("n"))
      .toMap
    // conf >= 0.7: click(a@0.9), click(c@0.8), click(a@0.7), view(c@0.9),
    // error(a@0.9), error(b@0.9)
    assert(out(("click", "a")) === 2)
    assert(out(("click", "c")) === 1)
    assert(out(("view", "c")) === 1)
    assert(out(("error", "a")) === 1)
    assert(out.values.sum === 6)
  }

  test("having filters on metric; limit orders by first metric desc") {
    val spec = Spec(
      dims = Seq("event_type"),
      metrics = Seq(SumMetric("value_sum", "value"), CountRows("n")),
      havingMin = Some(("value_sum", 3.0)),
      limit = Some(2))
    val out = Cube.run(base, spec).collect()
    assert(out.length === 2)
    // error=9.0 first, click=8.0 second; view=2.0 dropped by HAVING
    assert(out(0).getAs[String]("event_type") === "error")
    assert(out(1).getAs[String]("event_type") === "click")
  }

  test("avg/min/max metrics aggregate exactly") {
    val spec = Spec(
      dims = Seq("event_type"),
      metrics = Seq(AvgMetric("v_avg", "value"), MinMetric("v_min", "value"),
        MaxMetric("v_max", "value")))
    val out = Cube.run(base, spec).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("v_avg"), r.getAs[Double]("v_min"), r.getAs[Double]("v_max"))).toMap
    assert(out("click") === ((4.0, 3.0, 5.0)))
    assert(out("view") === ((2.0, 2.0, 2.0)))
  }

  test("metrics-only cube is a global aggregate; bad specs fail loudly") {
    val out = Cube.run(base,
      Spec(dims = Nil, metrics = Seq(CountRows("n"), SumMetric("v", "value")))).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n") === 4)
    assert(out(0).getAs[Double]("v") === 19.0)
    intercept[IllegalArgumentException](
      Cube.run(base, Spec(dims = Seq("event_type"), metrics = Nil)))
    intercept[IllegalArgumentException](
      compileFilter(Pred("x", "between", Seq(1, 2))))
    intercept[IllegalArgumentException](
      compileFilter(Group(all = true, exclude = false, Nil)))
  }

  test("q10 runs end-to-end on test data with all clauses") {
    val rows = Cube.q10DynamicCube(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_.getAs[String]("event_type") == "error"))
    val users = rows.map(_.getAs[Long]("users"))
    assert(users.sameElements(users.sortBy(-_)) || users.distinct.length < users.length)
  }
}
