package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, Sessionize, SkewJoin}

/** Edge cases for the temporal-alignment and skew operators. */
class TemporalOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("asofBackward: equal-ts right row matches; no prior right → null") {
    val left = Seq(
      (1L, "u1", 100L, 1.0),  // before any right → null
      (2L, "u1", 200L, 2.0),  // equal ts → matched
      (3L, "u1", 350L, 3.0),  // between rights → latest before
      (4L, "u2", 500L, 4.0)   // other key, no rights at all → null
    ).toDF("event_id", "k", "ts", "v")
    val right = Seq(("u1", 200L, 20.0), ("u1", 300L, 30.0), ("u1", 400L, 40.0))
      .toDF("k", "ts", "rv")
    val got = AsOfJoin.asofBackward(left, right, "k", "ts", "rv")
      .orderBy("event_id").select("event_id", "asof_value")
      .as[(Long, Option[Double])].collect()
    assert(got.toSeq == Seq(
      (1L, None), (2L, Some(20.0)), (3L, Some(30.0)), (4L, None)))
  }

  test("asofBackward pre-aggregates duplicate right timestamps (max)") {
    val left = Seq((1L, "u1", 300L, 1.0)).toDF("event_id", "k", "ts", "v")
    val right = Seq(("u1", 200L, 5.0), ("u1", 200L, 9.0)).toDF("k", "ts", "rv")
    val got = AsOfJoin.asofBackward(left, right, "k", "ts", "rv")
      .select("asof_value").as[Double].head()
    assert(got == 9.0)
  }

  test("sessionize splits on gaps and counts durations exactly") {
    val NsPerS = 1000000000L
    val ev = Seq(
      (1L, "u1", 0L), (2L, "u1", 10 * NsPerS), (3L, "u1", 5000 * NsPerS),
      (4L, "u1", 5002 * NsPerS), (5L, "u2", 0L)
    ).toDF("event_id", "k", "ts")
    val got = Sessionize.sessionSummary(ev, "k", "ts", gapNanos = 60 * NsPerS, idCol = "event_id")
      .orderBy("k", "session_idx")
      .select("k", "session_idx", "n_events", "duration_s", "first_event")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      ("u1", 0L, 2L, 10L, 1L), ("u1", 1L, 2L, 2L, 3L), ("u2", 0L, 1L, 0L, 5L)))
  }

  test("saltedInnerJoin equals the plain inner join") {
    val left = Tables.events(spark, TestSpark.Sf).select("event_id", "user_id", "value")
    val right = Tables.events(spark, TestSpark.Sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val plain = left.join(right, "user_id")
      .select("event_id", "n").as[(Long, Long)].collect().toSet
    val salted = SkewJoin.saltedInnerJoin(left, right, "user_id", buckets = 7)
      .select("event_id", "n").as[(Long, Long)].collect().toSet
    assert(salted == plain)
  }
}
