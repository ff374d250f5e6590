package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native extraction expressions: values, null semantics, codegen
  * participation, and SQL registration.
  */
class SqlExprSpec extends AnyFunSuite {

  import SparkFixture._

  private val html =
    """<html><head><title>N1</title></head><body><a href="l.html" id="x">link</a></body></html>"""

  test("css_text/css_attr/json_text values and null semantics") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val df = Seq((html, """{"a":{"b":"deep"}}"""), (null, null)).toDF("h", "j")
    val rows = df.select(
      css_text(col("h"), lit("title")).as("t"),
      css_text(col("h"), lit("h9")).as("missing"),
      css_attr(col("h"), lit("a"), lit("href")).as("href"),
      json_text(col("j"), lit("a.b")).as("jt")
    ).collect()
    assert(rows(0).getString(0) == "N1")
    assert(rows(0).isNullAt(1)) // no match => null
    assert(rows(0).getString(2) == "l.html")
    assert(rows(0).getString(3) == "deep")
    assert((0 to 3).forall(rows(1).isNullAt)) // null input => null out
  }

  test("native expressions stay inside WholeStageCodegen (no ScalaUDF)") {
    import graft.functions._
    // non-foldable input (built from range id) so the projection must run at
    // execution time, inside codegen
    val df = spark.range(3).select(concat(
        lit("<html><head><title>doc "), col("id"),
        lit("</title></head><body/></html>")).as("h"))
      .select(css_text(col("h"), lit("title")).as("t"))
    val plan = df.queryExecution.executedPlan
    assert(plan.find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]).isDefined)
    assert(!plan.toString.contains("ScalaUDF"))
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("doc 0", "doc 1", "doc 2"))
  }

  test("SQL registration: css_text callable from spark.sql") {
    val spark0 = spark
    import spark0.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    Seq(html).toDF("h").createOrReplaceTempView("pages")
    val out = spark.sql(
      "SELECT css_text(h, 'title') AS t, css_attr(h, 'a', 'id') AS i FROM pages")
      .collect().head
    assert(out.getString(0) == "N1")
    assert(out.getString(1) == "x")
  }

  test("per-thread parse cache: repeated extraction over one doc is cheap and correct") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val n = 2000
    val df = (1 to n).map(i =>
        s"""<html><head><title>doc $i</title></head><body><a href="$i.html">x</a></body></html>""")
      .toDF("h")
      .select(
        css_text(col("h"), lit("title")).as("t"),
        css_attr(col("h"), lit("a"), lit("href")).as("l"))
    val rows = df.collect()
    assert(rows.length == n)
    assert(rows.forall(r => r.getString(1) == r.getString(0).split(" ")(1) + ".html"))
  }
}
