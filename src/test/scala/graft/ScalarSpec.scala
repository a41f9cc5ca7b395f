package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

class ScalarSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct (HLL) lands within 5% of exact") {
    val li = Tables.lineitem(spark, TestSpark.Sf)
    val (exact, approx) = li.agg(
      countDistinct(col("l_partkey")).cast("double"),
      approx_count_distinct(col("l_partkey")).cast("double"))
      .as[(Double, Double)].head()
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("percentile of integral values interpolates on exact quarters") {
    val p = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
      .agg(expr("percentile(v, 0.5)")).as[Double].head()
    assert(p == 2.5)
  }

  test("parseMagnitude composes with aggregation (total market cap)") {
    val total = Seq("1K", "2K", "0.5M").toDF("s")
      .agg(sum(Sources.parseMagnitude($"s"))).as[Double].head()
    assert(total == 503000.0)
  }
}
