package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

class ScalarSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("tokens: empty and whitespace-only text yield ZERO tokens, not ['']") {
    // review r16: split(trim(text), "\\s+") returns [""] on empty input
    // in Spark and DuckDB alike, so every token-based statistic counted
    // a phantom token and admitted "" into vocabulary tables — with the
    // oracle mirroring the same bug. The shared tokens() (and the TOKS
    // twin in TextOracles) now drop empty strings in lockstep.
    import graft.functions.TextFunctions.{tokens, tokenCount}
    val df = Seq(("a", ""), ("b", "   "), ("c", " one  two ")).toDF("id", "text")
    val r = df.select(col("id"), tokenCount(col("text")).as("n"),
        tokens(col("text")).as("ts"))
      .collect().map(x => x.getString(0) -> (x.getInt(1), x.getSeq[String](2)))
      .toMap
    assert(r("a")._1 == 0 && r("a")._2.isEmpty)
    assert(r("b")._1 == 0 && r("b")._2.isEmpty)
    assert(r("c")._1 == 2 && r("c")._2 == Seq("one", "two"))
  }

  test("tokens: tab/newline-edged text yields no phantom empty token") {
    // ADVICE r17: Spark's trim strips SPACES only, so "\tfoo" survives
    // trim and split produces a leading "" — the r16 length-0 CASE
    // missed this class while the oracles' list_filter dropped it. The
    // array_remove form drops every empty token.
    import graft.functions.TextFunctions.{tokens, tokenCount}
    val df = Seq(
      ("a", "\tfoo"), ("b", "foo\n"), ("c", "\n\t "), ("d", "a\t\nb"),
      ("e", "x")).toDF("id", "text")
    val r = df.select(col("id"), tokenCount(col("text")).as("n"),
        tokens(col("text")).as("ts"))
      .collect().map(x => x.getString(0) -> (x.getInt(1), x.getSeq[String](2)))
      .toMap
    assert(r("a") == (1, Seq("foo")))
    assert(r("b") == (1, Seq("foo")))
    assert(r("c")._1 == 0 && r("c")._2.isEmpty)
    assert(r("d") == (2, Seq("a", "b")))
    assert(r("e") == ((1, Seq("x"))))
  }

  test("tokens + SubwordRe: U+000B vertical tab is whitespace in BOTH engines (WsRe pin)") {
    // hostile sweep r18: Java's \s includes U+000B, RE2's (DuckDB's)
    // does not — under the old `\s`-based regexes a vertical-tab doc
    // tokenized differently per engine (DuckDB kept the U+000B glued to the word
    // and counted the control char as a subword). The shared explicit
    // WsRe class closes it: U+000B splits tokens, is stripped from
    // char counts, and is NOT a subword match — identically on both
    // sides (the DuckDB half is pinned by the hostile-fixture board).
    import graft.functions.TextFunctions.{tokens, tokenCount, WsRe}
    import graft.queries.TextStats.SubwordRe
    val df = Seq(("a", "one\u000Btwo"), ("b", "\u000Bedge"), ("c", "x \u000B y"))
      .toDF("id", "text")
    val r = df.select(col("id"), tokenCount(col("text")).as("n"),
        tokens(col("text")).as("ts"),
        length(regexp_replace(col("text"), WsRe, "")).as("nch"),
        size(regexp_extract_all(col("text"), lit(SubwordRe), lit(0))).as("nsub"))
      .collect()
      .map(x => x.getString(0) ->
        ((x.getInt(1), x.getSeq[String](2), x.getInt(3), x.getInt(4))))
      .toMap
    assert(r("a") == ((2, Seq("one", "two"), 6, 2)))
    assert(r("b") == ((1, Seq("edge"), 4, 1)))
    assert(r("c") == ((2, Seq("x", "y"), 2, 2)))
  }

  test("modeValue: deterministic mode with count-desc, value-asc tiebreak") {
    import graft.queries.ScalarQueries
    val ev = Seq(("t", 3.0), ("t", 3.0), ("t", 1.0), ("t", 1.0), ("t", 2.0))
      .toDF("event_type", "value")
    val r = ScalarQueries.modeValue(ev, "event_type", "value").collect()
    // 1.0 and 3.0 both occur twice — the smaller value wins the tie
    assert(r.length == 1 && r(0).getDouble(1) == 1.0)
    assert(r(0).getLong(2) == 2L && r(0).getLong(3) == 5L)
    assert(r(0).getDouble(4) == 0.4)
  }

  test("temperatureMix: sqrt temperature flattens a 9:1 token mix to 3:1") {
    import graft.queries.TrainingDataQueries
    val docs = Seq(("en", "a b c d e f g h i"), ("de", "x"))
      .toDF("lang", "text")
    val r = TrainingDataQueries.temperatureMix(docs).orderBy("lang").collect()
    assert(r(0).getString(0) == "de" &&
      r(0).getDouble(2) == 0.1 && r(0).getDouble(3) == 0.25)
    assert(r(1).getString(0) == "en" &&
      r(1).getDouble(2) == 0.9 && r(1).getDouble(3) == 0.75)
  }

  test("curriculum: fixed quality bands partition the corpus, shares sum to 1") {
    import graft.queries.TextStats
    val docs = Tables.documents(spark, TestSpark.Sf)
    val r = TextStats.curriculum(docs).collect()
    assert(r.map(_.getLong(1)).sum == docs.count())
    assert(r.forall(x => x.getLong(0) >= 0L && x.getLong(0) <= 3L))
    assert(math.abs(r.map(_.getDouble(4)).sum - 1.0) < 1e-3)
    // each band's mean quality sits inside the band's score interval
    r.foreach { x =>
      val b = x.getLong(0)
      val mq = x.getDouble(3)
      assert(mq >= b * 0.25 - 1e-6 && mq <= (b + 1) * 0.25 + 1e-6,
        s"band $b mean_quality $mq outside its interval")
    }
  }

  test("tokenGini: hand-ranked concentration; uniform counts read 0") {
    import graft.queries.TextStats
    // counts {a:1, b:2}: ranks 1,2 -> 2*sum(r*x) = 10, G = (10-9)/6
    val skew = Seq((1L, "a b b")).toDF("doc_id", "text")
    val r1 = TextStats.tokenGiniDocs(skew).collect()(0)
    assert(r1.getLong(0) == 2L && r1.getLong(1) == 3L)
    assert(r1.getDouble(2) == 0.166667, s"gini = ${r1.getDouble(2)}")
    // equal counts -> perfectly even mass -> 0
    val even = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(TextStats.tokenGiniDocs(even).collect()(0).getDouble(2) == 0.0)
  }

  test("readability: hand-counted Flesch, sentence floor, band thresholds") {
    import graft.queries.TextStats
    // "go on. we do." -> words 4, sentences 2, vowel groups: o,o,e,o = 4
    // flesch = 206.835 - 1.015*2 - 84.6*1 = 120.205 -> easy
    // "xxxxxxxx" -> 1 word, 0 sentence runs floored to 1, 0 vowels
    // flesch = 206.835 - 1.015*1 - 0 = 205.82 -> easy (floor guard hit)
    val docs = Seq((1L, "go on. we do."), (2L, "xxxxxxxx"))
      .toDF("doc_id", "text")
    val r = TextStats.readability(docs).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 4L && r(0).getLong(2) == 2L && r(0).getLong(3) == 4L)
    assert(r(0).getDouble(4) == 120.21 && r(0).getString(5) == "easy",
      s"flesch = ${r(0).getDouble(4)}")
    assert(r(1).getLong(2) == 1L && r(1).getLong(3) == 0L)
    assert(r(1).getDouble(4) == 205.82)
  }

  test("zipfFit: an exact 1/rank frequency profile recovers alpha = 1, r2 = 1") {
    import graft.queries.TextStats
    // counts 12, 6, 4, 3 = 12/rank -> ln(freq) = ln 12 - 1·ln(rank)
    val text = ("a " * 12) + ("b " * 6) + ("c " * 4) + ("d " * 3)
    val docs = Seq((1L, text.trim)).toDF("doc_id", "text")
    val r = TextStats.zipfFit(docs).collect()(0)
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) - 1.0) <= 2e-4, s"alpha = ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 1.0) <= 2e-4, s"r2 = ${r.getDouble(2)}")
  }

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

  test("describeNumeric: one-pass profile matches closed-form stats incl. null accounting") {
    import graft.operators.Profile
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), None)
      .toDF("x").withColumn("y", lit(10.0))
    val p = Profile.describeNumeric(df, Seq("x", "y"))
      .orderBy("col_name")
      .as[(String, Long, Long, Double, Double, Double, Double, Double, Double, Double)]
      .collect().toSeq
    // x: n=4, 1 null, mean 2.5, std sqrt(5/3), quartiles 1.75/2.5/3.25
    val (name, n, nNull, mean, std, mn, mx, p25, p50, p75) = p.head
    assert(name == "x" && n == 4 && nNull == 1 && mean == 2.5 && mn == 1.0 && mx == 4.0)
    assert(math.abs(std - math.sqrt(5.0 / 3.0)) < 1e-12)
    assert((p25, p50, p75) == (1.75, 2.5, 3.25))
    // y: constant column — std 0, all quartiles the constant, no nulls
    assert(p(1) == ("y", 5L, 0L, 10.0, 0.0, 10.0, 10.0, 10.0, 10.0, 10.0))
  }

  test("cms_estimate: exact when sketch width far exceeds distinct keys, never undercounts") {
    import graft.functions.SketchFunctions
    val df = (1 to 500).map(i => i.toLong % 20).toDF("u")
    val sk = df.agg(expr(
      "count_min_sketch(u, cast(0.0005 as double), cast(0.99 as double), 42)").as("cms"))
    val est = (0L until 20L).toDF("u")
      .join(broadcast(sk))
      .select($"u", SketchFunctions.cmsEstimate($"cms", $"u").as("e"))
      .as[(Long, Long)].collect().toMap
    // 500 draws over 20 residues = exactly 25 each; width 2·⌈e/ε⌉ ≫ 20
    // distinct keys, so the CMS answer is collision-free and exact
    assert(est.values.forall(_ == 25L), est.toString)
  }

  test("cms_estimate: an absent key reads within the eps*N overcount bound") {
    import graft.functions.SketchFunctions
    val n = 1000
    val df = (1 to n).map(_.toLong % 50).toDF("u")
    val sk = df.agg(expr(
      "count_min_sketch(u, cast(0.0005 as double), cast(0.99 as double), 42)").as("cms"))
    val e = Seq(999999L).toDF("u")
      .join(broadcast(sk))
      .select(SketchFunctions.cmsEstimate($"cms", $"u")).as[Long].head()
    assert(e >= 0L && e <= math.ceil(0.0005 * n).toLong, s"absent-key estimate $e")
  }

  test("parseMagnitude composes with aggregation (total market cap)") {
    val total = Seq("1K", "2K", "0.5M").toDF("s")
      .agg(sum(Sources.parseMagnitude($"s"))).as[Double].head()
    assert(total == 503000.0)
  }

  test("parseMagnitude yields null (not an ANSI crash) on garbage input") {
    val r = Seq("N/A", "", "abcB").toDF("s")
      .select(Sources.parseMagnitude($"s")).as[Option[Double]].collect()
    assert(r.toSeq == Seq(None, None, None))
  }

  test("shingles on docs shorter than n yield empty arrays, not errors") {
    import graft.functions.TextFunctions
    val r = Seq("solo", "two words", "a b c").toDF("t")
      .select(size(TextFunctions.shingles($"t", 3)).as("n")).as[Int].collect()
    assert(r.toSeq == Seq(0, 0, 1))
  }

  test("frame sampling skips empty payloads") {
    import graft.operators.Multimodal
    val docs = Seq((1L, ""), (2L, "x" * 300)).toDF("doc_id", "text")
    val got = Multimodal.sampleFrameOffsets(Multimodal.packText(docs), 1)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("PartialAgg: merge over ANY fine grain equals the direct aggregate, and re-merge is associative") {
    import graft.operators.PartialAgg
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i =>
      (if (i % 3 == 0) "a" else "b", rnd.nextInt(97), rnd.nextInt(2001) - 1000L))
    val df = rows.toDF("k", "salt", "v")

    def snap(d: org.apache.spark.sql.DataFrame) =
      PartialAgg.derive(d)
        .select("k", "n", "s", "s2", "mn", "mx", "mean", "std")
        .orderBy("k").collect().toSeq

    // direct = one-cell-per-key "fine" grain (partials at the key grain)
    val direct = snap(PartialAgg.merge(
      PartialAgg.partials(df, Seq("k"), Seq.empty, col("v")), Seq("k")))
    // arbitrary 97-way hash split must merge to the identical moments
    val split = snap(PartialAgg.merge(
      PartialAgg.partials(df, Seq("k"), Seq(col("salt")), col("v")), Seq("k")))
    assert(split == direct)
    // associativity: salt -> coarser salt%7 -> key equals one merge
    val fine = PartialAgg.partials(df, Seq("k"), Seq(col("salt")), col("v"))
    val mid = PartialAgg.merge(
      fine.withColumn("bucket", pmod(col("salt"), lit(7))), Seq("k", "bucket"))
    assert(snap(PartialAgg.merge(mid, Seq("k"))) == direct)
    // derived stats agree with Spark's own aggregates (moment identity)
    val ref = df.groupBy("k")
      .agg(avg(col("v")).as("mean"), stddev_samp(col("v")).as("std"))
      .orderBy("k").as[(String, Double, Double)].collect()
    direct.zip(ref).foreach { case (row, (_, m, sd)) =>
      assert(math.abs(row.getDouble(6) - m) < 1e-9)
      assert(math.abs(row.getDouble(7) - sd) < 1e-9)
    }
    // NULL values: n counts present values only, so mean/std match
    // avg/stddev_samp semantics instead of diluting (review r10 find)
    val withNulls = Seq(("a", Some(10L)), ("a", None), ("a", Some(20L)), ("b", Some(7L)),
      ("b", None)).toDF("k", "v")
    val got = PartialAgg.derive(PartialAgg.merge(
      PartialAgg.partials(withNulls, Seq("k"), Seq.empty, col("v")), Seq("k")))
      .select("k", "n", "mean", "std").orderBy("k")
      .as[(String, Long, Double, Option[Double])].collect().toSeq
    assert(got.head == (("a", 2L, 15.0, Some(math.sqrt(50.0)))))
    assert(got(1)._1 == "b" && got(1)._2 == 1L && got(1)._3 == 7.0 &&
      got(1)._4.isEmpty, s"single present value: std must be NULL, got ${got(1)}")
  }

  test("PartialAgg incremental maintenance: yesterday's partials + the new day's == full recompute") {
    // the 100 TB deployment shape: the fine-grain partial table is
    // immutable state; a new day appends ITS partials only, and any
    // rollup merges the union — proven equal to rescanning everything
    import graft.operators.PartialAgg
    val ev = Tables.events(spark, TestSpark.Sf)
      .withColumn("day", Tables.eventDay)
      .withColumn("cents", floor(col("value") * 100 + 0.5))
    val lastDay = ev.agg(max(col("day"))).head.getDate(0)
    val history = ev.filter(col("day") < lit(lastDay))
    val newDay = ev.filter(col("day") === lit(lastDay))
    assert(history.count() > 0 && newDay.count() > 0, "fixture must span multiple days")
    val histPartials = PartialAgg.partials(
      history, Seq("event_type"), Seq(col("day")), col("cents"))
    val dayPartials = PartialAgg.partials(
      newDay, Seq("event_type"), Seq(col("day")), col("cents"))
    val incremental = PartialAgg.derive(PartialAgg.merge(
      histPartials.unionByName(dayPartials), Seq("event_type")))
      .orderBy("event_type").collect().toSeq
    val full = PartialAgg.derive(PartialAgg.merge(
      PartialAgg.partials(ev, Seq("event_type"), Seq(col("day")), col("cents")),
      Seq("event_type")))
      .orderBy("event_type").collect().toSeq
    assert(incremental.nonEmpty && incremental == full)
  }

  test("qHhiConcentration: theoretical bounds and a hand-checked type") {
    import graft.queries.ScalarQueries
    val out = ScalarQueries.qHhiConcentration(spark, TestSpark.Sf)
      .collect().toSeq
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nu, hhi, eff) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      // HHI of n equal shares is 1/n; concentration can only raise it
      assert(hhi >= 1.0 / nu - 1e-9 && hhi <= 1.0, s"bounds: $r")
      assert(eff <= nu + 1e-9, s"effective cannot exceed actual users: $r")
    }
    val et = out.head.getString(0)
    val counts = Tables.events(spark, TestSpark.Sf)
      .filter(col("event_type") === et)
      .groupBy("user_id").count().select("count").as[Long].collect().toSeq
    val n = counts.sum.toDouble
    val hhi = counts.map(c => c * c).sum.toDouble / (n * n)
    assert(out.head.getDouble(3) == math.floor(hhi * 1e6 + 0.5) / 1e6)
  }

  test("qSessionStats: histogram weights recover the event total") {
    import graft.queries.{ScalarQueries, TemporalJoinQueries}
    val out = TemporalJoinQueries.qSessionStats(spark, TestSpark.Sf)
      .collect().toSeq
    assert(out.nonEmpty)
    val total = Tables.events(spark, TestSpark.Sf).count()
    // Σ size·count over the histogram = every event in exactly one session
    assert(out.map(r => r.getLong(0) * r.getLong(1)).sum == total)
    out.foreach(r => assert(r.getDouble(2) <= r.getLong(3) + 1e-9,
      s"mean duration above max: $r"))
  }

  test("qMinhashPartials: signatures merge by elementwise min; estimate tracks exact") {
    import graft.queries.ScalarQueries
    import graft.functions.TextFunctions.hash32
    val du = Tables.events(spark, TestSpark.Sf)
      .select(Tables.eventDay.as("day"), col("user_id")).distinct()
    def sig(d: org.apache.spark.sql.DataFrame): Seq[Long] = {
      import graft.operators.Dedup
      val hv = hash32(col("user_id").cast("string"))
      d.agg(min(Dedup.minhashExpr(0, hv)), min(Dedup.minhashExpr(1, hv)))
        .head() match { case r => Seq(r.getLong(0), r.getLong(1)) }
    }
    // mergeability: the union range's signature equals the elementwise
    // min of the daily partials — the property that lets day partials
    // fold to any coarser grain without re-touching facts
    val days = du.select("day").distinct().orderBy("day").limit(2)
      .collect().map(_.getDate(0))
    val d1 = du.filter(col("day") === days(0))
    val d2 = du.filter(col("day") === days(1))
    val merged = sig(d1).zip(sig(d2)).map { case (x, y) => math.min(x, y) }
    assert(sig(d1.unionByName(d2)) == merged)
    // estimator sanity: K=16 components -> sigma ~ 0.125; 4 sigma bound
    val out = ScalarQueries.qMinhashPartials(spark, TestSpark.Sf)
      .select(col("jaccard_est"), col("jaccard_exact"))
      .as[(Double, Double)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (est, exact) =>
      assert(est >= 0.0 && est <= 1.0 && math.abs(est - exact) <= 0.5,
        s"est $est vs exact $exact")
    }
  }

  test("keySkew: hand-counted skew factor, uniform keys read 1.0") {
    import graft.queries.ScalarQueries
    // a:6 b:2 c:2 -> max_share 0.6, skew 6*3/10 = 1.8, top5 = all
    val skewed = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .toDF("user_id")
    val r1 = ScalarQueries.keySkew(skewed, "user_id").collect()(0)
    assert(r1.getLong(0) == 3L && r1.getLong(1) == 10L &&
      r1.getLong(2) == 6L)
    assert(r1.getDouble(3) == 0.6 && r1.getDouble(4) == 1.8 &&
      r1.getDouble(5) == 1.0 && !r1.getBoolean(6))
    val uniform = (Seq.fill(5)("a") ++ Seq.fill(5)("b")).toDF("user_id")
    val r2 = ScalarQueries.keySkew(uniform, "user_id").collect()(0)
    assert(r2.getDouble(4) == 1.0 && !r2.getBoolean(6))
  }

  test("vocabDrift: hand-counted type overlap and OOV token mass") {
    import graft.queries.TextStats
    // batch a (even ids): types {a,b,c}; batch b (odd): types {a,d,e}
    // shared {a}, new {d,e}, lost {b,c}, jaccard 1/5, oov mass 4/5
    val docs = Seq(
      (0L, "a b b"), (2L, "a c"),
      (1L, "a d"), (3L, "d d e")
    ).toDF("doc_id", "text")
    val r = TextStats.vocabDrift(docs, "doc_id", "text").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getLong(2) == 1L)
    assert(r.getLong(3) == 2L && r.getLong(4) == 2L)
    assert(r.getDouble(5) == 0.2 && r.getDouble(6) == 0.8)
  }

  test("qBootstrapCi: full reps, ordered brackets around the full-sample mean") {
    import graft.queries.ScalarQueries
    val out = ScalarQueries.qBootstrapCi(spark, TestSpark.Sf)
      .select(col("event_type"), col("n"), col("n_reps"),
        col("mean_value"), col("ci_lo"), col("ci_hi"))
      .collect().toSeq
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) == ScalarQueries.BootReps.toLong,
        s"every replica must survive (sw>0): $r")
      val (m, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo <= hi, s"inverted CI: $r")
      assert(lo <= m && m <= hi, s"CI must bracket the full mean here: $r")
    }
    // Poisson(1) thresholds are a valid CDF on the 10-bit draw range
    val t = ScalarQueries.PoisThresholds
    assert(t == t.sorted && t.last <= 1024L && t.head > 0)
    // weight 0 must stay achievable and the CDF must be near-complete
    assert(t.head < 1024L && t.last > 1021L)
  }

  test("Constraints.scalarAudit: completeness/range/set metrics are exact fractions") {
    import graft.operators.Constraints._
    val df = Seq(
      (Some("a"), 1.0, "X"), (Some("b"), 2.0, "Y"),
      (None, 3.0, "X"), (Some("d"), 11.0, "Z")
    ).toDF("s", "v", "tag")
    val rep = scalarAudit(df, "t", Seq(
      completeness("s", 1.0),
      fractionInRange("v", 0.0, 10.0, 1.0),
      fractionInSet("tag", Seq("X", "Y"), 0.5),
      minRowCount(3.0)))
      .orderBy("check", "column").collect()
    val byCheck = rep.map(r => (r.getString(1), r.getString(2)) ->
      (r.getDouble(3), r.getBoolean(5))).toMap
    assert(byCheck(("completeness", "s")) == (0.75, false))
    assert(byCheck(("in_range", "v")) == (0.75, false))
    assert(byCheck(("in_set", "tag")) == (0.75, true))
    assert(byCheck(("row_count", "*")) == (4.0, true))
  }

  test("Constraints.uniqueness: duplicate keys fail, distinct keys pass") {
    import graft.operators.Constraints._
    val dup = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "p")
    val r1 = uniqueness(dup, "t", Seq("k")).head()
    assert(r1.getDouble(3) == 2.0 / 3.0 && !r1.getBoolean(5))
    // the composite key IS unique even though k alone is not
    val r2 = uniqueness(dup, "t", Seq("k", "p")).head()
    assert(r2.getDouble(3) == 1.0 && r2.getBoolean(5))
    // a NULL key counts AGAINST the metric (never a 'unique' NULL
    // group): [1, 2, NULL] must NOT read as fully unique
    val withNull = Seq(Some(1), Some(2), None).toDF("k")
    val r3 = uniqueness(withNull, "t", Seq("k")).head()
    assert(r3.getDouble(3) == 2.0 / 3.0 && !r3.getBoolean(5))
  }

  test("Constraints.refIntegrity: orphans and NULL foreign keys both count against the metric") {
    import graft.operators.Constraints._
    val parent = Seq(1, 2, 3).toDF("pk")
    val child = Seq(Some(1), Some(2), Some(99), None).toDF("fk")
    val r = refIntegrity(child, "fk", "c", parent, "pk").head()
    assert(r.getDouble(3) == 0.5 && !r.getBoolean(5))
    val clean = refIntegrity(parent.select(col("pk").as("fk")), "fk", "c",
      parent, "pk").head()
    assert(clean.getDouble(3) == 1.0 && clean.getBoolean(5))
  }

  test("Constraints: a zero-row frame FAILS every check (fail closed, no /0)") {
    import graft.operators.Constraints._
    val empty = Seq.empty[(Option[String], Double)].toDF("s", "v")
    val rep = scalarAudit(empty, "t", Seq(
      completeness("s", 0.0),          // even threshold 0 must fail on empty
      fractionInRange("v", 0.0, 10.0, 0.0),
      fractionInSet("s", Seq("X"), 0.0),
      minRowCount(1.0))).collect()
    assert(rep.length == 4 && rep.forall(!_.getBoolean(5)))
    // fractional metrics are NULL (0/0 guarded), row_count metric is 0.0
    assert(rep.count(_.isNullAt(3)) == 3)
    val u = uniqueness(empty.toDF("k", "p"), "t", Seq("k")).head()
    assert(u.isNullAt(3) && !u.getBoolean(5))
    val parent = Seq(1).toDF("pk")
    val ri = refIntegrity(empty.select(col("v").cast("int").as("fk")),
      "fk", "c", parent, "pk").head()
    assert(ri.isNullAt(3) && !ri.getBoolean(5))
  }

  test("lexicalDiversity: hand-counted richness triple") {
    import graft.queries.TextStats
    // tokens: a:2, b:1, c:1 -> N=4, V=3, hapax=2,
    // ttr=0.75, hapax_share=0.666667, D = 2/(4*3) = 0.166666667
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val r = TextStats.lexicalDiversityDocs(docs).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.75 && r.getDouble(4) == 0.666667)
    assert(r.getDouble(5) == 0.166666667)
  }

  test("rankFractions: exact rationals over the unique (cents, id) order") {
    import graft.queries.ScalarQueries
    // values {10, 20, 20, 30} ids 1..4: ranks 1..4 (id tiebreak) ->
    // pct_rank (rn-1)/3, cume_dist rn/4 — exact rationals
    val ev = Seq((1L, 10.0), (2L, 20.0), (3L, 20.0), (4L, 30.0))
      .map { case (id, v) => ("t", id, v) }
      .toDF("event_type", "event_id", "value")
    val r = ScalarQueries.rankFractions(ev, "event_type", "value", "event_id")
      .orderBy("event_id").collect()
    assert(r.map(_.getDouble(3)).toSeq ==
      Seq(0.0, 0.333333, 0.666667, 1.0))
    assert(r.map(_.getDouble(4)).toSeq == Seq(0.25, 0.5, 0.75, 1.0))
  }

  test("trimmedMean: 5% cut drops exactly one row per tail") {
    import graft.queries.ScalarQueries
    // 20 rows: one 0.0, eighteen 10.0, one 100.0 -> cut = (20*5)//100 = 1
    // per side: trimmed mean 10.0 vs raw (0+180+100)/20 = 14.0
    val ev = ((1 to 18).map(i => ("t", i.toLong, 10.0)) ++
      Seq(("t", 19L, 0.0), ("t", 20L, 100.0)))
      .toDF("event_type", "event_id", "value")
    val r = ScalarQueries.trimmedMean(ev, "event_type", "value", "event_id")
      .collect()(0)
    assert(r.getLong(1) == 20L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 14.0 && r.getDouble(4) == 10.0)
  }
}
