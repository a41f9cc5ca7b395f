package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WelfordAggregator
import graft.functions.WelfordAggregator.Moments

class WelfordSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("typed aggregator matches stddev_pop/avg on the events table") {
    val vals = Tables.events(spark, TestSpark.Sf).select($"value").as[Double]
    val m: Moments = vals.select(WelfordAggregator.moments.toColumn).head()
    val (mu, sigma) = Tables.events(spark, TestSpark.Sf)
      .agg(avg("value"), stddev_pop("value")).as[(Double, Double)].head()
    assert(math.abs(m.mean - mu) < 1e-9)
    assert(math.abs(m.stddevPop - sigma) < 1e-9)
  }

  test("merge is associative: sequential == partitioned merge") {
    val xs = (1 to 1000).map(i => (i * 37 % 101) / 7.0)
    val seq = xs.foldLeft(WelfordAggregator.zero)(WelfordAggregator.update)
    val (l, r) = xs.splitAt(313)
    val merged = WelfordAggregator.merge(
      l.foldLeft(WelfordAggregator.zero)(WelfordAggregator.update),
      r.foldLeft(WelfordAggregator.zero)(WelfordAggregator.update))
    assert(merged.n == seq.n)
    assert(math.abs(merged.mean - seq.mean) < 1e-9)
    assert(math.abs(merged.m2 - seq.m2) < 1e-6)
  }

  test("zscore from incremental state matches batch z-score") {
    val m = Seq(1.0, 2.0, 3.0, 4.0).foldLeft(WelfordAggregator.zero)(WelfordAggregator.update)
    assert(math.abs(m.zscore(4.0) - (4.0 - 2.5) / math.sqrt(1.25)) < 1e-12)
  }
}
