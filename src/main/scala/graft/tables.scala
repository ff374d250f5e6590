package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table loader for the driver-provided parquet testdata.
  *
  * All queries take `(SparkSession, sfDir)` and read via this helper so the
  * parquet scans benefit from Catalyst predicate pushdown / column pruning.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Canonical `events.ts`: epoch-nanos BIGINT, whatever the parquet physical
    * type. Generations of the testdata have shipped `ts` as nanosecond
    * timestamps (read as BIGINT nanos under
    * `spark.sql.legacy.parquet.nanosAsLong`) and as `timestamp[us]` (read as
    * TIMESTAMP_NTZ); downstream time arithmetic is exact integer math on the
    * nanos long in both cases, matching the DuckDB oracle's `epoch_us(ts)`
    * micros bit-for-bit. The cast runs under the UTC session timezone (set by
    * SparkEntry.tune), so NTZ→instant is the identity.
    */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df // nanos-as-long legacy read: already canonical
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000"))
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported type $other")
    }

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame   = normalizeTs(apply(spark, dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
