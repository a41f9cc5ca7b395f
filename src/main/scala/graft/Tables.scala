package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated star schema (TESTDATA.md / FIXTURES.md §B).
  *
  * Explicit-by-name parquet scans: Catalyst prunes columns and pushes
  * predicates into these scans automatically, so every query built on top
  * starts from a columnar, statistics-aware source — the scan layer the
  * reference lacks (its CSV loads with inferSchema are re-parsed per run,
  * see reference `ml-algorithms/regression.py:48-53`).
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects; read nanos as epoch-nano longs instead. Ordering and
    // lag/window semantics over the long are identical to the timestamp;
    // eventTs/eventDay (TimeSeriesQueries) convert where wall-clock
    // values are needed. Set here (not in the session builder) so
    // driver-created sessions that call queries directly also get it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
