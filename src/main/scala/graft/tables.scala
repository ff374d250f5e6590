package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader for the driver-provided parquet testdata.
  *
  * All queries take `(SparkSession, sfDir)` and read via this helper so the
  * parquet scans benefit from Catalyst predicate pushdown / column pruning.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
