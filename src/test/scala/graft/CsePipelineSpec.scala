package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.CsePipeline
import graft.sources.ReferenceFixtures

/** Golden lifecycle test (SURVEY §5.3) on reference-shaped fixtures:
  * pins the reference's quirks (SMA-as-EMA, sample-std volatility,
  * RSI frame, ε guards) and the join/split/audit semantics. */
class CsePipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val panel = ReferenceFixtures.pricePanel(spark).cache()
  private lazy val featured = CsePipeline.features(panel).cache()

  test("fixtures satisfy FIXTURES.md §A coverage requirements") {
    val counts = panel.groupBy("symbol").count().as[(String, Long)].collect().toMap
    assert(counts("AAA.N0000") == 40 && counts("DDD.N0000") == 5)
    assert(panel.filter($"price".isNull).count() == 3)
  }

  test("lag features null for the first k rows of each symbol") {
    val r = featured.filter($"symbol" === "BBB.N0000").orderBy("date")
      .select("lag_7").limit(8).as[Option[Double]].collect()
    assert(r.take(7).forall(_.isEmpty) && r(7).nonEmpty)
  }

  test("the reference's 'EMA' is an SMA over [-12,0] — quirk preserved") {
    val row = featured.filter($"symbol" === "BBB.N0000").orderBy("date")
      .select("price", "ema12").limit(13).as[(Double, Double)].collect()
    val expected = row.map(_._1).sum / 13
    assert(math.abs(row.last._2 - expected) < 1e-9)
  }

  test("rsi14 bounded, short symbol (<14 rows) gets null-frame semantics") {
    val bounds = featured.filter($"rsi14".isNotNull)
      .agg(min("rsi14"), max("rsi14")).as[(Double, Double)].head()
    assert(bounds._1 >= 0.0 && bounds._2 <= 100.0)
    val short = featured.filter($"symbol" === "DDD.N0000" && $"rsi14".isNotNull)
    assert(short.count() == 4) // rows 2-5 have a 1-4 row trailing frame
  }

  test("forward fill bridges the AAA null run") {
    val r = featured.filter($"symbol" === "AAA.N0000").orderBy("date")
      .select("price", "price_ffill").as[(Option[Double], Option[Double])].collect()
    assert(r.slice(10, 13).forall(_._1.isEmpty))
    assert(r.slice(10, 13).forall(x => x._2 == r(9)._1))
  }

  test("fundamentals join: broadcast left join, nulls filled, eps guard") {
    val joined = CsePipeline.withFundamentals(featured, ReferenceFixtures.fundamentals(spark))
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    // CCC has no fundamentals row → filled zeros, guarded ratio finite
    val ccc = joined.filter($"symbol" === "CCC.N0000")
      .select("Total_Revenue", "profit_margin").as[(Double, Double)].head()
    assert(ccc._1 == 0.0 && !ccc._2.isNaN && !ccc._2.isInfinite)
    // zero-revenue BBB: ε keeps profit_margin finite (huge, not NaN)
    val bbb = joined.filter($"symbol" === "BBB.N0000")
      .select("profit_margin").as[Double].head()
    assert(!bbb.isNaN && !bbb.isInfinite)
    // whitelist side: panel symbols only — ZZZ never appears
    assert(joined.filter($"symbol" === "ZZZ.N0000").count() == 0)
  }

  test("null audit counts the injected null-price run") {
    val audit = CsePipeline.nullAudit(panel.select("symbol", "price")).head()
    assert(audit.getAs[Long]("price") == 3 && audit.getAs[Long]("symbol") == 0)
  }

  test("temporal split at max(date)-14d is leak-free and exhaustive") {
    val (train, test) = CsePipeline.temporalSplit14(CsePipeline.filterTrainable(featured))
    val maxTrain = train.agg(max("date")).as[java.sql.Date].head()
    val minTest = test.agg(min("date")).as[java.sql.Date].head()
    assert(maxTrain.before(minTest))
    assert(train.count() + test.count() == CsePipeline.filterTrainable(featured).count())
  }

  test("whole feature block remains one shuffle + one sort") {
    // AQE's toString repeats the tree under "== Initial Plan ==" — only
    // count the final plan section
    val p = featured.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("Sort \\[symbol".r.findAllIn(p).size == 1, p)
  }
}
