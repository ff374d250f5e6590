package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Spark surface (same pattern the reference uses
  * for its in-namespace RDD at org/apache/spark/rdd/spookystuff/): builds
  * Columns from raw expressions and registers the graft extraction
  * expressions on a LIVE session (the extensions route,
  * `spark.sql.extensions=graft.sql.GraftExtensions`, only applies at session
  * construction).
  */
object GraftFunctions {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Make `css_text`/`css_attr`/`json_text` callable from `spark.sql(...)`
    * on an existing session.
    */
  def register(spark: SparkSession): Unit =
    graft.sql.GraftExtensions.all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
