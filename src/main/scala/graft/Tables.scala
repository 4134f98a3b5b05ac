package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet corpus
  * (see /root/repo/TESTDATA.md). All queries take the sf directory as a
  * runtime parameter so the same plan runs at any scale factor.
  *
  * Scale notes: at 100 TB, `region`/`nation`/`supplier` stay broadcast-size;
  * `customer`/`orders`/`lineitem`/`events`/`documents`/`embeddings` are the
  * large fact-side tables and must never be collected or broadcast.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` is nanosecond-precision parquet, which Spark 4 rejects by
    * default; sessions set `spark.sql.legacy.parquet.nanosAsLong=true` and we
    * convert back to a (microsecond) timestamp here. Derived datasets (the
    * sf1 scale-up is written by DuckDB) store `ts` as TIMESTAMP_NTZ instead —
    * cast to TIMESTAMP so `unix_micros`-family functions accept it; sessions
    * pin UTC, so the cast is instant-preserving. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One named query: the Spark plan and (when SQL-expressible) the DuckDB
  * oracle SQL over the same tables. Column names/types must match exactly —
  * the driver sorts columns by name and hash-compares values. */
final case class QueryDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String])
