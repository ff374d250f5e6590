package graft

import graft.api.Records
import graft.api.Records.MergePolicy._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Record-calculus semantics on DataFrames (reference linq/Foundation.scala
  * merge/cartesian matrices).
  */
class RecordsSpec extends AnyFunSuite {

  import SparkFixture._

  private val spark0 = spark

  test("withColumnsChecked: conflict is an error, clean add works") {
    import spark0.implicits._
    val df = Seq((1, "a")).toDF("id", "name")
    val ok = Records.withColumnsChecked(df, "extra" -> lit(7))
    assert(ok.columns.toSeq == Seq("id", "name", "extra"))
    intercept[IllegalArgumentException](
      Records.withColumnsChecked(df, "name" -> lit("clash")))
    intercept[IllegalArgumentException](
      Records.withColumnsChecked(df, "x" -> lit(1), "X" -> lit(2)))
  }

  test("mergeOn: right-bias, left-bias, error-on-conflict") {
    import spark0.implicits._
    val l = Seq((1, "L", 10)).toDF("id", "tag", "lonly")
    val r = Seq((1, "R", 20)).toDF("id", "tag", "ronly")
    val rb = Records.mergeOn(l, r, "id", RightWins).collect().head
    assert(rb.getAs[String]("tag") == "R")
    val lb = Records.mergeOn(l, r, "id", LeftWins).collect().head
    assert(lb.getAs[String]("tag") == "L")
    assert(lb.getAs[Int]("lonly") == 10 && lb.getAs[Int]("ronly") == 20)
    intercept[IllegalArgumentException](Records.mergeOn(l, r, "id", ErrorOnConflict))
  }

  test("cartesian >< family: cross product with field-merge policies") {
    import spark0.implicits._
    val l = Seq(("a", 1), ("b", 2)).toDF("k", "n")
    val r = Seq((true, 1.5), (false, 2.5)).toDF("flag", "n2")
    val x = Records.cartesian(l, r)
    assert(x.count() == 4)
    assert(x.columns.toSeq == Seq("k", "n", "flag", "n2"))

    val rc = Seq((true, 99)).toDF("flag", "n") // n conflicts
    intercept[IllegalArgumentException](Records.cartesian(l, rc, ErrorOnConflict))
    assert(Records.cartesian(l, rc, LeftWins).select("n").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    assert(Records.cartesian(l, rc, RightWins).select("n").collect()
      .map(_.getInt(0)).toSeq == Seq(99, 99))
  }
}
