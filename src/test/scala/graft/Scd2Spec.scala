package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd2

class Scd2Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def dim(rows: (Long, String, String, String, Boolean)*) =
    rows.toDF("k", "attr", "valid_from", "valid_to_s", "is_current")
      .select(col("k"), col("attr"),
        to_date(col("valid_from")).as("valid_from"),
        to_date(col("valid_to_s")).as("valid_to"),
        col("is_current"))

  private val batchDate = to_date(lit("2024-06-01"))

  test("scd2: changed key closes the old version and opens a new one") {
    val current = dim((1L, "a", "2024-01-01", null, true))
    val changes = Seq((1L, "b")).toDF("k", "attr")
    val out = Scd2.merge(current, changes, Seq("k"), batchDate)
      .orderBy("valid_from")
      .select($"k", $"attr", $"valid_from".cast("string"),
        $"valid_to".cast("string"), $"is_current")
      .as[(Long, String, String, String, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "a", "2024-01-01", "2024-06-01", false),
      (1L, "b", "2024-06-01", null, true)))
  }

  test("scd2: attribute-identical change is a no-op (null-safe compare)") {
    val current = dim((1L, "a", "2024-01-01", null, true))
    val changes = Seq((1L, "a")).toDF("k", "attr")
    val out = Scd2.merge(current, changes, Seq("k"), batchDate)
    assert(out.count() == 1)
    assert(out.filter($"is_current" && $"valid_to".isNull).count() == 1)
  }

  test("scd2: null-to-null attribute compares equal, null-to-value is a change") {
    val current = dim((1L, null, "2024-01-01", null, true), (2L, null, "2024-01-01", null, true))
    val changes = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "attr")
    val out = Scd2.merge(current, changes, Seq("k"), batchDate)
    assert(out.filter($"k" === 1L).count() == 1, "null == null is a no-op")
    assert(out.filter($"k" === 2L).count() == 2, "null -> value closes + reopens")
  }

  test("scd2: unseen key inserts an open row at the batch date") {
    val current = dim((1L, "a", "2024-01-01", null, true))
    val changes = Seq((9L, "new")).toDF("k", "attr")
    val out = Scd2.merge(current, changes, Seq("k"), batchDate)
    val ins = out.filter($"k" === 9L)
      .select($"valid_from".cast("string"), $"valid_to".isNull, $"is_current")
      .as[(String, Boolean, Boolean)].head()
    assert(ins == ("2024-06-01", true, true))
    assert(out.count() == 2)
  }

  test("scd2: already-closed history rows pass through untouched") {
    val current = dim(
      (1L, "v0", "2023-01-01", "2024-01-01", false),
      (1L, "v1", "2024-01-01", null, true))
    val changes = Seq((1L, "v2")).toDF("k", "attr")
    val out = Scd2.merge(current, changes, Seq("k"), batchDate)
    assert(out.count() == 3)
    assert(out.filter($"attr" === "v0" && !$"is_current").count() == 1)
    assert(out.filter($"is_current").count() == 1)
  }

  test("scd2: duplicate key in changes raises instead of corrupting history") {
    val current = dim((1L, "a", "2024-01-01", null, true))
    val changes = Seq((1L, "b"), (1L, "c")).toDF("k", "attr")
    val e = intercept[Exception] {
      Scd2.merge(current, changes, Seq("k"), batchDate).collect()
    }
    assert(e.getMessage.contains("one row per key"), e.getMessage)
  }

  test("scd2: a NULL is_current row passes through as history, not silent loss") {
    val current = dim((1L, "a", "2024-01-01", null, true))
      .unionByName(dim((2L, "z", "2023-01-01", "2023-06-01", true))
        .withColumn("is_current", lit(null).cast("boolean")))
    val changes = Seq((1L, "b")).toDF("k", "attr")
    val out = Scd2.merge(current, changes, Seq("k"), batchDate)
    assert(out.count() == 3, "the malformed-flag row must survive")
    assert(out.filter($"k" === 2L).count() == 1)
  }

  test("scd2: an attribute-free dimension merges as pure upsert (no crash)") {
    val current = Seq(1L).toDF("k")
      .select($"k", to_date(lit("2024-01-01")).as("valid_from"),
        expr("CAST(NULL AS DATE)").as("valid_to"), lit(true).as("is_current"))
    val changes = Seq(1L, 9L).toDF("k")
    val out = Scd2.merge(current, changes, Seq("k"), batchDate)
    // key 1: attr-identical by definition -> pass-through; key 9: insert
    assert(out.count() == 2)
    assert(out.filter($"k" === 9L && $"is_current").count() == 1)
  }

  test("pointInTimeJoin: picks the version valid at ts; gaps and unknown keys keep nulls") {
    import graft.operators.Scd2
    val hist = Seq(
      (1L, "v1", "2024-01-01", "2024-03-01"),
      (1L, "v2", "2024-06-01", null) // GAP between 03-01 and 06-01
    ).toDF("k", "attr", "f", "t")
      .select($"k", $"attr", to_date($"f").as("valid_from"), to_date($"t").as("valid_to"))
    val facts = Seq(
      (10L, 1L, "2024-02-15"), // inside v1
      (11L, 1L, "2024-03-01"), // exactly at v1's exclusive end -> gap
      (12L, 1L, "2024-04-01"), // in the gap
      (13L, 1L, "2024-06-01"), // inclusive start of v2
      (14L, 1L, "2030-01-01"), // open-ended v2
      (15L, 7L, "2024-02-15")  // unknown key
    ).toDF("fid", "k", "d").select($"fid", $"k", to_date($"d").as("d"))
    val out = Scd2.pointInTimeJoin(facts, hist, Seq("k"), "d")
      .orderBy("fid").select($"fid", $"attr").as[(Long, Option[String])].collect().toSeq
    assert(out == Seq(10L -> Some("v1"), 11L -> None, 12L -> None,
      13L -> Some("v2"), 14L -> Some("v2"), 15L -> None))
  }

  test("pointInTimeJoin over merge output resolves each fact to exactly one version") {
    import graft.operators.Scd2
    val current = dim((1L, "a", "2024-01-01", null, true))
    val changes = Seq((1L, "b")).toDF("k", "attr")
    val hist = Scd2.merge(current, changes, Seq("k"), batchDate)
    val facts = Seq((100L, 1L, "2024-03-01"), (101L, 1L, "2024-08-01"))
      .toDF("fid", "k", "d").select($"fid", $"k", to_date($"d").as("d"))
    val out = Scd2.pointInTimeJoin(facts, hist, Seq("k"), "d")
      .orderBy("fid").select($"attr").as[String].collect().toSeq
    assert(out == Seq("a", "b"), "pre-batch fact sees the closed version, post-batch the open one")
  }

  test("scd2: repeated merge of the same batch is idempotent on history depth") {
    val current = dim((1L, "a", "2024-01-01", null, true))
    val changes = Seq((1L, "b")).toDF("k", "attr")
    val once = Scd2.merge(current, changes, Seq("k"), batchDate)
    val twice = Scd2.merge(once, changes, Seq("k"), batchDate)
    // the second application sees attr already = b -> pure pass-through
    assert(twice.count() == once.count())
  }
}
