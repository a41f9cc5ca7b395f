package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TimeSeries._

/** Hand-computed window-feature edge cases (SURVEY §5.1): partition
  * boundaries produce nulls for the first k lags, short frames average the
  * available rows, forward fill crosses null runs, RSI stays in [0,100]. */
class TimeSeriesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val w = Window.partitionBy("g").orderBy("i")

  private def df = Seq(
    ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 15.0), ("a", 4, 25.0),
    ("b", 1, 5.0), ("b", 2, 5.0)
  ).toDF("g", "i", "v")

  test("withGlobalPrev equals the total-order lag across many chunk boundaries") {
    import graft.operators.ChunkedOrder
    val ev = Tables.events(spark, TestSpark.Sf).select("event_id", "ts", "value")
    // tiny span -> hundreds of chunks, every boundary a stitch; the
    // result must not depend on the span at all
    val spans = Seq(6L * 3600L * 1000000000L, 97L * 1000000000L * 60L)
    val global = ev.withColumn("p",
        lag($"value", 1).over(Window.orderBy("ts", "event_id")))
      .select($"event_id", $"p").orderBy("event_id")
      .as[(Long, Option[Double])].collect().toSeq
    for (span <- spans) {
      val chunked = ChunkedOrder.withGlobalPrev(ev, "ts", "event_id", "value", "p", span)
        .select($"event_id", $"p").orderBy("event_id")
        .as[(Long, Option[Double])].collect().toSeq
      assert(chunked == global, s"span=$span")
      val nChunks = ev.select((expr(s"ts div ${span}L")).as("c")).distinct().count()
      assert(nChunks > 10, s"span=$span must exercise many boundaries, got $nChunks chunks")
    }
  }

  test("withGlobalPrev: null values propagate as prev (not papered over by the carry)") {
    import graft.operators.ChunkedOrder
    // chunkSpan 10: chunk 0 = ts 0-9, chunk 1 = ts 10-19. A null value
    // mid-chunk must surface as the NEXT row's prev; a null value as a
    // chunk's LAST row must carry null into the next chunk's first row.
    val df = Seq(
      (0L, 1L, Some(10.0)), (5L, 2L, Option.empty[Double]), (7L, 3L, Some(7.0)),
      (9L, 4L, Option.empty[Double]), (12L, 5L, Some(3.0))
    ).toDF("ts", "id", "v")
    val out = ChunkedOrder.withGlobalPrev(df, "ts", "id", "v", "p", chunkSpan = 10L)
      .orderBy("ts").select("p").as[Option[Double]].collect().toSeq
    assert(out == Seq(None, Some(10.0), None, Some(7.0), None),
      s"got $out — mid-chunk null must not be replaced by the carry, " +
        "and a null chunk-last value must carry as null")
  }

  test("withGlobalRowNumber equals the total-order row_number, ties included") {
    import graft.operators.ChunkedOrder
    // tie-heavy frame: many equal v values (same chunk by construction)
    // and a distinct-id tiebreak, buckets of width 1 over a DESC order
    val df = (1 to 500).map(i => (i.toLong, (i % 13) + (i % 3) * 0.25)).toDF("id", "v")
    val global = df.withColumn("rn",
        row_number().over(Window.orderBy(desc("v"), $"id")))
      .select($"id", $"rn").orderBy("id").as[(Long, Int)].collect().toSeq
    val chunked = ChunkedOrder.withGlobalRowNumber(
        df, floor(-$"v"), Seq(desc("v"), $"id"), "rn")
      .select($"id", $"rn").orderBy("id").as[(Long, Int)].collect().toSeq
    assert(chunked == global)
    val nChunks = df.select(floor(-$"v")).distinct().count()
    assert(nChunks > 5, s"must exercise multiple chunks, got $nChunks")
  }

  test("withGlobalRowNumber: NULL order keys rank LAST, shifting no real row (hostile r18)") {
    // a NULL leading key maps to a NULL chunk; under Spark's
    // NULLS-FIRST asc default the offsets window counted it BEFORE
    // every real chunk (each page shifted by one) and the
    // null-rejecting offsets join left its own rank NULL
    import graft.operators.ChunkedOrder
    val df = Seq((1L, Some(9.0)), (2L, None: Option[Double]), (3L, Some(5.0)),
      (4L, Some(9.0))).toDF("id", "v")
    val r = ChunkedOrder.withGlobalRowNumber(
        df, floor(-$"v"), Seq(desc("v"), $"id"), "rn")
      .select($"id", $"rn").as[(Long, Int)].collect().toMap
    assert(r == Map(1L -> 1, 4L -> 2, 3L -> 3, 2L -> 4),
      s"NULL-key row must rank last with real rows unshifted, got $r")
  }

  test("lag is null at partition start and partition-local") {
    val r = df.withColumn("l", lagK($"v", 1, w)).orderBy("g", "i")
      .select("l").as[Option[Double]].collect()
    assert(r.toSeq == Seq(None, Some(10.0), Some(20.0), Some(15.0), None, Some(5.0)))
  }

  test("lead produces next value, null at partition end") {
    val r = df.withColumn("n", lead1($"v", w)).orderBy("g", "i")
      .select("n").as[Option[Double]].collect()
    assert(r.toSeq == Seq(Some(20.0), Some(15.0), Some(25.0), None, Some(5.0), None))
  }

  test("sma averages only available rows (min_periods=1 semantics)") {
    val r = df.withColumn("m", sma($"v", w, -2, -1)).orderBy("g", "i")
      .select("m").as[Option[Double]].collect()
    assert(r.toSeq == Seq(None, Some(10.0), Some(15.0), Some(17.5), None, Some(5.0)))
  }

  test("smaCents equals plain sma on 2-decimal data") {
    val a = df.withColumn("m", smaCents($"v", w, -2, -1)).orderBy("g", "i")
      .select("m").as[Option[Double]].collect()
    val b = df.withColumn("m", sma($"v", w, -2, -1)).orderBy("g", "i")
      .select("m").as[Option[Double]].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("forward fill carries last non-null within partition") {
    val d = Seq(("a", 1, Some(1.0)), ("a", 2, None), ("a", 3, None),
      ("a", 4, Some(4.0)), ("b", 1, None)).toDF("g", "i", "v")
    val r = d.withColumn("f", ffill($"v", w)).orderBy("g", "i")
      .select("f").as[Option[Double]].collect()
    assert(r.toSeq == Seq(Some(1.0), Some(1.0), Some(1.0), Some(4.0), None))
  }

  test("rsi bounded in [0, 100] and null while frame empty") {
    val d = Tables.events(spark, TestSpark.Sf)
    val w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val r = d.select(rsi($"value", 14, w2).as("r"))
      .agg(min("r"), max("r")).as[(Double, Double)].head()
    assert(r._1 >= 0.0 && r._2 <= 100.0)
  }

  test("spike flag is 0/1 only") {
    val vals = df.withColumn("s", spikeFlag($"v", 3, 1.5, w))
      .select("s").distinct().as[Int].collect().toSet
    assert(vals.subsetOf(Set(0, 1)))
  }

  test("zscore of constant series: stddev_pop is zero") {
    val d = Seq.fill(5)(3.14).toDF("v")
    assert(d.agg(stddev_pop($"v")).as[Double].head() == 0.0)
  }

  test("qRollingMedian equals an in-Scala sliding-window median for every user") {
    import graft.queries.TimeSeriesQueries
    val got = TimeSeriesQueries.qRollingMedian(spark, TestSpark.Sf)
      .select($"event_id", $"user_id", $"med14")
      .as[(Long, Long, Double)].collect().toSeq
    val raw = Tables.events(spark, TestSpark.Sf)
      .select($"user_id", $"ts", $"event_id", $"value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val expect = raw.groupBy(_._1).flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      ordered.zipWithIndex.map { case ((_, _, id, _), i) =>
        val frame = ordered.slice(math.max(0, i - 13), i + 1)
          .map(r => math.floor(r._4 * 100 + 0.5).toLong).sorted
        val k = frame.size
        val med = ((frame((k + 1) / 2 - 1) + frame(k / 2)) / 2.0) / 100.0
        id -> (math.floor(med * 1e4 + 0.5) / 1e4)
      }
    }
    assert(got.nonEmpty)
    got.foreach { case (id, _, m) =>
      assert(m == expect(id), s"event $id: $m vs ${expect(id)}")
    }
  }

  test("qLatencyBands: ordered bands, populations partition the table") {
    import graft.queries.TimeSeriesQueries
    val out = TimeSeriesQueries.qLatencyBands(spark, TestSpark.Sf).collect().toSeq
    assert(out.nonEmpty)
    assert(out.map(_.getLong(2)).sum == Tables.events(spark, TestSpark.Sf).count())
    out.foreach { r =>
      val (p50, p95, p99, mx) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(p50 <= p95 && p95 <= p99, s"bands out of order: $r")
      // rounded-up p99 may nominally exceed the raw max by the grain
      assert(p99 <= mx + 1e-4, s"p99 above max: $r")
    }
  }

  test("qInterpolate equals an in-Scala linear walk over the observed closes") {
    import graft.queries.TimeSeriesQueries
    val out = TimeSeriesQueries.qInterpolate(spark, TestSpark.Sf)
      .select($"event_type", $"bucket_hour", $"observed", $"value_interp")
      .as[(String, Long, Boolean, Double)].collect().toSeq
    assert(out.nonEmpty)
    val gaps = out.count(!_._3)
    assert(gaps > 0, "fixture must contain empty hours or the test is vacuous")
    out.groupBy(_._1).foreach { case (_, rows) =>
      val seq = rows.sortBy(_._2)
      // spine endpoints are observed by construction
      assert(seq.head._3 && seq.last._3)
      val obs = seq.zipWithIndex.filter(_._1._3).map { case (r, i) => (i, r._4) }
      // independent re-implementation: same fixed-order IEEE expression
      for (((i0, v0), (i1, v1)) <- obs.zip(obs.tail); i <- (i0 + 1) until i1) {
        val expect = v0 + (v1 - v0) * ((i - i0).toDouble / (i1 - i0).toDouble)
        val got = seq(i)._4
        assert(got == math.floor(expect * 1e4 + 0.5) / 1e4,
          s"row $i: got $got expect $expect")
      }
    }
  }

  test("qSeasonalBaseline: cells partition the events, anomalies bounded, one cell hand-checked") {
    import graft.queries.TimeSeriesQueries
    val out = TimeSeriesQueries.qSeasonalBaseline(spark, TestSpark.Sf)
      .select($"event_type", $"dow", $"hod", $"n", $"mean_value", $"std_value", $"n_anomalies")
      .collect().toSeq
    val total = Tables.events(spark, TestSpark.Sf).count()
    assert(out.map(_.getLong(3)).sum == total, "cells must partition the table")
    assert(out.forall(r => r.getLong(6) <= r.getLong(3)))
    assert(out.forall(r => (r.getLong(3) == 1) == r.isNullAt(5)),
      "std must be null exactly for singleton cells")
    // hand-check the largest cell against a direct Scala recomputation
    val top = out.maxBy(_.getLong(3))
    val (et, dow, hod) = (top.getString(0), top.getInt(1), top.getInt(2))
    val vals = Tables.events(spark, TestSpark.Sf)
      .select($"event_type", dayofweek(timestamp_micros(expr("ts div 1000"))).as("dow"),
        hour(timestamp_micros(expr("ts div 1000"))).as("hod"), $"value")
      .filter($"event_type" === et && $"dow" === dow && $"hod" === hod)
      .select("value").as[Double].collect().toSeq
    val cents = vals.map(v => math.floor(v * 100 + 0.5).toLong)
    val n = cents.size.toDouble
    val mean = cents.sum.toDouble / n / 100.0
    val varC = math.max(0.0,
      (n * cents.map(c => c * c).sum.toDouble - cents.sum.toDouble * cents.sum.toDouble)
        / (n * (n - 1.0)))
    val std = math.sqrt(varC) / 100.0
    assert(top.getLong(3) == vals.size)
    assert(top.getDouble(4) == math.floor(mean * 1e4 + 0.5) / 1e4)
    assert(top.getDouble(5) == math.floor(std * 1e4 + 0.5) / 1e4)
    assert(top.getLong(6) == vals.count(v => math.abs(v - mean) > 3.0 * std))
  }
}
