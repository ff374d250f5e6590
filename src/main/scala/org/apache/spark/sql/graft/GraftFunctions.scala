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

  /** Make the graft expressions callable from `spark.sql(...)` on an
    * existing session. Idempotent: already-registered names are left alone
    * (register is called from library entry points on every query, and
    * re-replacement logs a warning per function per call).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    graft.sql.GraftExtensions.all.foreach { case (name, _, builder) =>
      if (!registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
