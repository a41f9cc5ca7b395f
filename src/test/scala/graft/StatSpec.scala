package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.StatQueries

/** Closed-form hand checks for the round-12 statistics family — every
  * operator is verified on a frame small enough to compute by hand, so
  * an oracle-parity break can be localized to engine drift vs a wrong
  * formula. `ts` columns follow the engine invariant (epoch nanos). */
class StatSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def dayNs(d: Int): Long = d.toLong * 86400L * 1000000000L

  test("rocAuc: tie-corrected Mann-Whitney on a hand-ranked day") {
    // day 1: pos {3, 1}, neg {2, 1} -> pooled avg ranks 1.5,1.5,3,4
    // R+ = 1.5 + 4 = 5.5 -> AUC = (5.5 - 3) / 4 = 0.625
    // day 2: perfect separation -> 1.0; day 3: positives only -> NULL
    val ev = Seq(
      ("p", dayNs(1), 3.0), ("p", dayNs(1), 1.0),
      ("n", dayNs(1), 2.0), ("n", dayNs(1), 1.0),
      ("p", dayNs(2), 10.0), ("p", dayNs(2), 9.0),
      ("n", dayNs(2), 1.0), ("n", dayNs(2), 2.0),
      ("p", dayNs(3), 5.0)
    ).toDF("event_type", "ts", "value")
    val r = StatQueries.rocAuc(ev, "event_type", "ts", "value", "p", "n")
      .orderBy("day").collect()
    assert(r.length == 3)
    assert(r(0).getLong(1) == 2 && r(0).getLong(2) == 2 &&
      r(0).getDouble(3) == 0.625)
    assert(r(1).getDouble(3) == 1.0)
    assert(r(2).isNullAt(3), "a one-class day has no ranking to grade")
  }

  test("linregClosed: exact fit y = 2x + 1 recovers slope/intercept/r2") {
    val ev = Seq(
      ("t", 0L * 3600L * 1000000000L, 1.0),
      ("t", 1L * 3600L * 1000000000L, 3.0),
      ("t", 2L * 3600L * 1000000000L, 5.0),
      // degenerate group: single hour -> slope/intercept/r2 NULL
      ("u", 0L, 1.0), ("u", 1000L, 2.0)
    ).toDF("event_type", "ts", "value")
    val r = StatQueries.linregClosed(ev, "event_type", "ts", "value")
      .orderBy("event_type").collect()
    assert(r(0).getDouble(2) == 2.0 && r(0).getDouble(3) == 1.0 &&
      r(0).getDouble(4) == 1.0)
    assert(r(1).isNullAt(2) && r(1).isNullAt(3) && r(1).isNullAt(4))
  }

  test("ksTest: disjoint samples give D=1, identical samples give D=0") {
    val ev = Seq(
      // type a: first half {1,2}, second half {3,4} -> D = 1, drifted
      ("a", dayNs(1), 1.0), ("a", dayNs(2), 2.0),
      ("a", dayNs(20), 3.0), ("a", dayNs(21), 4.0),
      // type b: identical halves -> D = 0
      ("b", dayNs(1), 1.0), ("b", dayNs(2), 2.0),
      ("b", dayNs(20), 1.0), ("b", dayNs(21), 2.0)
    ).toDF("event_type", "ts", "value")
    val r = StatQueries.ksTest(ev, "event_type", "ts", "value", 15)
      .orderBy("event_type").collect()
    assert(r(0).getDouble(3) == 1.0 && r(0).getBoolean(4))
    assert(r(1).getDouble(3) == 0.0 && !r(1).getBoolean(4))
  }

  test("qKsTestDnum: the integer twin carries the exact d_stat numerator") {
    val ks = StatQueries.qKsTest(spark, TestSpark.Sf).collect()
    val tw = StatQueries.qKsTestDnum(spark, TestSpark.Sf).collect()
    assert(ks.length == tw.length && ks.nonEmpty)
    ks.zip(tw).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1) && a.getLong(2) == b.getLong(2))
      // d_stat is EXACTLY rnd(dnum / (n_a*n_b), 6) of the twin's integers
      val want = math.floor(
        b.getLong(3).toDouble / (b.getLong(1) * b.getLong(2)).toDouble * 1e6
          + 0.5) / 1e6
      assert(a.getDouble(3) == want, s"${a.getString(0)}: ${a.getDouble(3)} != $want")
      assert(a.getBoolean(4) == b.getBoolean(4))
    }
  }

  test("spearman: perfect monotone gives rho = ±1, a constant variable is NULL") {
    def hNs(d: Int, h: Int): Long = dayNs(d) + h.toLong * 3600L * 1000000000L
    val ev = Seq(
      ("dn", hNs(1, 1), 5.0), ("dn", hNs(1, 2), 2.0), ("dn", hNs(1, 3), 1.0),
      ("fl", hNs(1, 1), 2.0), ("fl", hNs(1, 2), 2.0), ("fl", hNs(1, 3), 2.0),
      ("up", hNs(1, 1), 1.0), ("up", hNs(1, 2), 2.0), ("up", hNs(1, 3), 5.0)
    ).toDF("event_type", "ts", "value")
    val r = StatQueries.spearman(ev, "event_type", "ts", "value")
      .orderBy("event_type").collect()
    assert(r(0).getString(0) == "dn" && r(0).getDouble(2) == -1.0)
    assert(r(1).getString(0) == "fl" && r(1).isNullAt(2))
    assert(r(2).getString(0) == "up" && r(2).getDouble(2) == 1.0)
  }

  test("mannKendall: increasing daily counts give S = pairs, all-ties give NULL z") {
    val inc = (1 to 3).flatMap(d => (1 to d).map(_ => ("i", dayNs(d))))
    val cst = (1 to 3).map(d => ("c", dayNs(d)))
    val ev = (inc ++ cst).toDF("event_type", "ts")
    val r = StatQueries.mannKendall(ev, "event_type", "ts")
      .orderBy("event_type").collect()
    // c: counts 1,1,1 — one tie group t=3 makes tie18 = n(n−1)(2n+5),
    // so var18 = 0 and z is NULL (no trend is decidable on all-ties)
    assert(r(0).getString(0) == "c" && r(0).getLong(1) == 3L &&
      r(0).getLong(2) == 0L && r(0).isNullAt(3))
    // i: counts 1,2,3 — all 3 pairs increasing, S = 3, z by hand
    assert(r(1).getString(0) == "i" && r(1).getLong(2) == 3L)
    val wantZ = (3.0 - 1.0) / math.sqrt(66.0 / 18.0)
    assert(math.abs(r(1).getDouble(3) - wantZ) < 1e-3)
    assert(!r(1).getBoolean(4))
  }

  test("kruskalWallis: separated groups by hand, identical groups 0, all-ties NULL") {
    import graft.queries.StatQueries
    // fully separated: ranks a = {1,2,3}, b = {4,5,6} -> H = 3.8571
    val sep = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)).toDF("event_type", "value")
    val r1 = StatQueries.kruskalWallis(sep, "event_type", "value").collect()(0)
    assert(r1.getLong(0) == 6L && r1.getLong(1) == 2L)
    assert(r1.getDouble(2) == 3.8571, s"H = ${r1.getDouble(2)}")
    // identical distributions -> H = 0 (tie-corrected)
    val same = Seq(("c", 1.0), ("c", 2.0), ("d", 1.0), ("d", 2.0))
      .toDF("event_type", "value")
    val r2 = StatQueries.kruskalWallis(same, "event_type", "value").collect()(0)
    assert(r2.getDouble(2) == 0.0)
    // every value tied -> tie correction 0 -> NULL H (undecidable)
    val allTied = Seq(("c", 7.0), ("c", 7.0), ("d", 7.0), ("d", 7.0))
      .toDF("event_type", "value")
    val r3 = StatQueries.kruskalWallis(allTied, "event_type", "value").collect()(0)
    assert(r3.isNullAt(2))
    // single non-null row: n=1 makes n³−n = 0 — the review-r16 case
    // where the old predicate computed tie3/(n³−n) = 0/0 eagerly; the
    // integer gate must yield NULL h without touching the division
    val one = Seq(("e", 7.0)).toDF("event_type", "value")
    val r4 = StatQueries.kruskalWallis(one, "event_type", "value").collect()(0)
    assert(r4.getLong(0) == 1L && r4.getLong(1) == 1L && r4.isNullAt(2))
  }

  test("theilSen: hand medians over pairwise day slopes, single-day NULL") {
    // up: counts 1,2,4,8 on days 1-4 -> slopes {1, 1.5, 7/3, 2, 3, 4},
    // even 6 pairs -> median = (2 + 7/3)/2 = 13/6 = 2.166667
    val up = Seq(1 -> 1, 2 -> 2, 3 -> 4, 4 -> 8)
      .flatMap { case (d, c) => (1 to c).map(_ => ("up", dayNs(d))) }
    // mx: counts 1,3,2 on days 1-3 -> slopes {2, 0.5, -1} -> median 0.5
    val mx = Seq(1 -> 1, 2 -> 3, 3 -> 2)
      .flatMap { case (d, c) => (1 to c).map(_ => ("mx", dayNs(d))) }
    val solo = Seq(("solo", dayNs(1)))
    val ev = (up ++ mx ++ solo).toDF("event_type", "ts")
    val r = StatQueries.theilSen(ev, "event_type", "ts")
      .orderBy("event_type").collect()
    assert(r(0).getString(0) == "mx" && r(0).getLong(2) == 3L &&
      r(0).getDouble(3) == 0.5)
    assert(r(1).getString(0) == "solo" && r(1).getLong(1) == 1L &&
      r(1).getLong(2) == 0L && r(1).isNullAt(3))
    assert(r(2).getString(0) == "up" && r(2).getLong(2) == 6L &&
      r(2).getDouble(3) == 2.166667)
  }

  test("cramersV: perfect 2x2 association reads V=1, independence reads 0") {
    // a only on day 1, b only on day 2 (distinct weekdays): chi2 = n,
    // V = sqrt(n/(n*1)) = 1
    val assoc = Seq(("a", dayNs(1)), ("a", dayNs(1)),
      ("b", dayNs(2)), ("b", dayNs(2))).toDF("event_type", "ts")
    val r1 = StatQueries.cramersV(assoc, "event_type", "ts").collect()(0)
    assert(r1.getLong(0) == 4L && r1.getLong(1) == 2L && r1.getLong(2) == 2L)
    assert(r1.getDouble(3) == 4.0 && r1.getDouble(4) == 1.0 &&
      r1.getString(5) == "large")
    // both types uniform over both days: chi2 = 0, V = 0
    val indep = Seq(("a", dayNs(1)), ("a", dayNs(2)),
      ("b", dayNs(1)), ("b", dayNs(2))).toDF("event_type", "ts")
    val r2 = StatQueries.cramersV(indep, "event_type", "ts").collect()(0)
    assert(r2.getDouble(3) == 0.0 && r2.getDouble(4) == 0.0 &&
      r2.getString(5) == "negligible")
    // one type only -> min(r-1, c-1) = 0 -> NULL V, NULL strength
    val degen = Seq(("a", dayNs(1)), ("a", dayNs(2)))
      .toDF("event_type", "ts")
    val r3 = StatQueries.cramersV(degen, "event_type", "ts").collect()(0)
    assert(r3.isNullAt(4) && r3.isNullAt(5))
  }

  test("mutualInfo: perfect 2x2 association reads MI = ln 2, NMI = 1") {
    val assoc = Seq(("a", dayNs(1)), ("a", dayNs(1)),
      ("b", dayNs(2)), ("b", dayNs(2))).toDF("event_type", "ts")
    val r1 = StatQueries.mutualInfo(assoc, "event_type", "ts").collect()(0)
    assert(r1.getLong(0) == 4L && r1.getLong(1) == 2L)
    assert(r1.getDouble(2) == 0.693147 && r1.getDouble(3) == 0.693147 &&
      r1.getDouble(4) == 0.693147 && r1.getDouble(5) == 1.0)
    val indep = Seq(("a", dayNs(1)), ("a", dayNs(2)),
      ("b", dayNs(1)), ("b", dayNs(2))).toDF("event_type", "ts")
    val r2 = StatQueries.mutualInfo(indep, "event_type", "ts").collect()(0)
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(5) == 0.0)
  }

  test("crossCorr: a one-day-shifted copy reads r=1 at lag 1, r=0 at lag 0") {
    // click counts 1,2,3,4 on days 1-4; purchase = same shifted to 2-5
    val clicks = (1 to 4).flatMap(d => (1 to d).map(_ => ("click", dayNs(d))))
    val buys = (2 to 5).flatMap(d => (1 to (d - 1)).map(_ => ("purchase", dayNs(d))))
    val ev = (clicks ++ buys).toDF("event_type", "ts")
    val r = StatQueries.crossCorr(ev, "event_type", "ts", "click", "purchase", 1)
      .orderBy("lag").collect()
    // lag 0 over the 5-day union spine: x=(1,2,3,4,0), y=(0,1,2,3,4) -> r=0
    assert(r(0).getInt(0) == 0 && r(0).getLong(1) == 5L && r(0).getDouble(2) == 0.0)
    // lag 1: pairs (1,1),(2,2),(3,3),(4,4) -> r=1
    assert(r(1).getInt(0) == 1 && r(1).getLong(1) == 4L && r(1).getDouble(2) == 1.0)
  }

  test("crossCorr: lag counts CALENDAR days — a day dark on both sides still counts") {
    // clicks on days {1,2,5}, purchases the same shifted one day to
    // {2,3,6}; day 4 has NO events of either type. The calendar spine
    // runs 1..6, so lag 0 sees 6 pairs (a row-based spine would see 5)
    // and the one-day shift still reads r=1 at lag 1 THROUGH the hole.
    val clicks = Seq((1, 1), (2, 2), (5, 5))
      .flatMap { case (d, n) => (1 to n).map(_ => ("click", dayNs(d))) }
    val buys = Seq((2, 1), (3, 2), (6, 5))
      .flatMap { case (d, n) => (1 to n).map(_ => ("purchase", dayNs(d))) }
    val ev = (clicks ++ buys).toDF("event_type", "ts")
    val r = StatQueries.crossCorr(ev, "event_type", "ts", "click", "purchase", 1)
      .orderBy("lag").collect()
    assert(r(0).getInt(0) == 0 && r(0).getLong(1) == 6L,
      s"lag-0 spine must be 6 calendar days, got ${r(0).getLong(1)}")
    assert(r(1).getInt(0) == 1 && r(1).getLong(1) == 5L &&
      r(1).getDouble(2) == 1.0, s"lag-1 r = ${r(1).getDouble(2)}")
  }

  test("valueEntropy: uniform hits ln(k), a point mass reads 0") {
    val ev = Seq(
      // u: four distinct values once each -> H = ln 4, norm = 1
      ("u", 1.0), ("u", 2.0), ("u", 3.0), ("u", 4.0),
      // p: a point mass -> H = 0, norm NULL (single cell)
      ("p", 7.0), ("p", 7.0), ("p", 7.0)
    ).toDF("event_type", "value")
    val r = StatQueries.valueEntropy(ev, "event_type", "value")
      .orderBy("event_type").collect()
    assert(r(0).getString(0) == "p" && r(0).getLong(1) == 1L &&
      r(0).getDouble(3) == 0.0 && r(0).isNullAt(4))
    assert(r(1).getString(0) == "u" && r(1).getLong(1) == 4L)
    assert(math.abs(r(1).getDouble(3) - math.log(4.0)) < 1e-6)
    assert(r(1).getDouble(4) == 1.0, s"norm = ${r(1).getDouble(4)}")
  }

  test("powerAnalysis: textbook n for a unit shift at unit variance; zero delta NULL") {
    import graft.queries.TrainingDataQueries
    // arm a: values {9, 11} (var 2.0, mean 10); arm b: {10, 12} (var
    // 2.0, mean 11): delta = -1, n = ceil(7.849 * 4.0 / 1) = 32
    val ev = Seq(
      ("s", dayNs(1), 9.0), ("s", dayNs(2), 11.0),
      ("s", dayNs(20), 10.0), ("s", dayNs(21), 12.0),
      // zero variance both arms, nonzero delta -> NULL (ceil(0)=0
      // would "recommend" a zero-sample experiment — review r13)
      ("v", dayNs(1), 5.0), ("v", dayNs(2), 5.0),
      ("v", dayNs(20), 7.0), ("v", dayNs(21), 7.0),
      // identical arms -> delta 0 -> NULL
      ("z", dayNs(1), 5.0), ("z", dayNs(2), 7.0),
      ("z", dayNs(20), 5.0), ("z", dayNs(21), 7.0)
    ).toDF("event_type", "ts", "value")
    val r = TrainingDataQueries.powerAnalysis(ev, "event_type", "ts", "value", 15)
      .orderBy("event_type").collect()
    assert(r(0).getString(0) == "s" && r(0).getDouble(3) == -1.0)
    val want = math.ceil(TrainingDataQueries.PowerZSum2 * 4.0).toLong
    assert(r(0).getLong(4) == want, s"n_per_arm = ${r(0).getLong(4)}")
    assert(r(1).getString(0) == "v" && r(1).getDouble(3) == -2.0 &&
      r(1).isNullAt(4))
    assert(r(2).getString(0) == "z" && r(2).getDouble(3) == 0.0 &&
      r(2).isNullAt(4))
  }

  test("abTest: a NULL-typed group with both arms populated emits NO row (oracle join semantics)") {
    import graft.queries.TrainingDataQueries
    // NULL event_type carries >= 2 rows in BOTH month halves — the
    // declared oracle SQL joins the period aggregates ON a.event_type =
    // b.event_type, which drops the NULL group (NULL = NULL is not
    // true); the single conditional aggregate must filter it explicitly
    // (r21 guard) or Spark emits a row DuckDB never produces
    val ev = Seq(
      (Option.empty[String], dayNs(1), 9.0), (Option.empty[String], dayNs(2), 11.0),
      (Option.empty[String], dayNs(20), 10.0), (Option.empty[String], dayNs(21), 12.0),
      (Some("s"), dayNs(1), 9.0), (Some("s"), dayNs(2), 11.0),
      (Some("s"), dayNs(20), 10.0), (Some("s"), dayNs(21), 12.0)
    ).toDF("event_type", "ts", "value")
    val ab = TrainingDataQueries.abTest(ev, "event_type", "ts", "value", 15).collect()
    assert(ab.length == 1 && ab(0).getString(0) == "s",
      s"expected only the 's' row, got ${ab.mkString("; ")}")
    val pw = TrainingDataQueries.powerAnalysis(ev, "event_type", "ts", "value", 15).collect()
    assert(pw.length == 1 && pw(0).getString(0) == "s",
      s"expected only the 's' row, got ${pw.mkString("; ")}")
  }

  test("quantileDrift: hand quartiles of shifted halves read the shift at every quartile") {
    import graft.queries.TrainingDataQueries
    val ev = Seq(
      ("s", dayNs(1), 1.0), ("s", dayNs(2), 2.0), ("s", dayNs(3), 3.0),
      ("s", dayNs(20), 11.0), ("s", dayNs(21), 12.0), ("s", dayNs(22), 13.0)
    ).toDF("event_type", "ts", "value")
    val r = TrainingDataQueries.quantileDrift(ev, "event_type", "ts", "value", 15)
      .collect()(0)
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 12.0)
    assert(r.getDouble(5) == 10.0 && r.getDouble(6) == 10.0 &&
      r.getDouble(7) == 10.0)
  }

  test("effectSize: dominated halves give delta -1, identical give 0") {
    val ev = Seq(
      // x: first half {1,2}, second half {3,4} — every a < b
      ("x", dayNs(1), 1.0), ("x", dayNs(2), 2.0),
      ("x", dayNs(20), 3.0), ("x", dayNs(21), 4.0),
      // y: identical halves
      ("y", dayNs(1), 1.0), ("y", dayNs(2), 2.0),
      ("y", dayNs(20), 1.0), ("y", dayNs(21), 2.0)
    ).toDF("event_type", "ts", "value")
    val r = StatQueries.effectSize(ev, "event_type", "ts", "value", 15)
      .orderBy("event_type").collect()
    assert(r(0).getString(0) == "x" && r(0).getDouble(3) == -1.0)
    assert(r(0).getString(5) == "large")
    // Cohen's d by hand: (1.5 − 3.5)/sqrt(0.5) = −2.8284
    assert(r(0).getDouble(4) == -2.8284, s"d = ${r(0).getDouble(4)}")
    assert(r(1).getString(0) == "y" && r(1).getDouble(3) == 0.0 &&
      r(1).getDouble(4) == 0.0 && r(1).getString(5) == "negligible")
  }

  test("jsdDrift: identical halves give exactly 0, disjoint halves dominate") {
    import graft.queries.TrainingDataQueries
    val ev = Seq(
      ("d", dayNs(1), 1.0), ("d", dayNs(2), 1.0),
      ("d", dayNs(20), 100.0), ("d", dayNs(21), 100.0),
      ("s", dayNs(1), 1.0), ("s", dayNs(2), 100.0),
      ("s", dayNs(20), 1.0), ("s", dayNs(21), 100.0)
    ).toDF("event_type", "ts", "value")
    val r = TrainingDataQueries.jsdDrift(ev, "event_type", "ts", "value", 15)
      .orderBy("event_type").collect()
    val jd = r(0).getDouble(3)
    val js = r(1).getDouble(3)
    // identical per-bin counts -> pa = pb everywhere -> every log is 0
    assert(js == 0.0 && !r(1).getBoolean(4))
    assert(jd > 0.0 && jd <= math.log(2.0) + 1e-9)
  }

  test("kaplanMeier: hand-walked two-step conversion with a censored tail") {
    // u1 converts at t=1, u2 at t=2; u3 never converts and is censored
    // at the horizon (day 5, its own last activity): t=4.
    // S(1) = 2/3 -> 0.6667, S(2) = (2/3)(1/2) = 1/3 -> 0.3333
    val ev = Seq(
      ("u1", 1, "click"), ("u1", 2, "purchase"),
      ("u2", 1, "click"), ("u2", 3, "purchase"),
      ("u3", 1, "click"), ("u3", 5, "click")
    ).map { case (u, d, t) => (u, dayNs(d), t) }
      .toDF("user_id", "ts", "event_type")
    val r = StatQueries
      .kaplanMeier(ev, "user_id", "ts", "event_type", "purchase")
      .orderBy("duration_days").collect()
    assert(r.length == 2)
    assert(r(0).getLong(0) == 1L && r(0).getLong(1) == 3L &&
      r(0).getLong(2) == 1L && r(0).getLong(3) == 0L &&
      r(0).getDouble(4) == 0.6667)
    assert(r(1).getLong(0) == 2L && r(1).getLong(1) == 2L &&
      r(1).getDouble(4) == 0.3333)
    // everyone at risk converts at the last step -> survival hits 0
    val all = Seq(("a", 1, "purchase"), ("b", 1, "purchase"))
      .map { case (u, d, t) => (u, dayNs(d), t) }
      .toDF("user_id", "ts", "event_type")
    val r2 = StatQueries
      .kaplanMeier(all, "user_id", "ts", "event_type", "purchase").collect()
    assert(r2.length == 1 && r2(0).getDouble(4) == 0.0)
  }

  test("brownForsythe: unequal spreads by hand, equal spreads clamp to 0") {
    import graft.queries.StatQueries
    // a = {0.00, 0.02, 0.10} cents {0,2,10}: 2·med = 4, z = {4,0,16}
    // b = {0.04, 0.06} cents {4,6}: 2·med = 10, z = {2,2}
    val uneq = Seq(("a", 0.0), ("a", 0.02), ("a", 0.10),
      ("b", 0.04), ("b", 0.06)).toDF("event_type", "value")
    val r1 = StatQueries.brownForsythe(uneq, "event_type", "value")
      .collect()(0)
    // the identical micro-rounded arithmetic, replayed in plain Scala
    val terms = (math.floor(400.0 / 3 * 1024 + 0.5) +
      math.floor(16.0 / 2 * 1024 + 0.5)) / 1024.0
    val between = math.max(0.0, terms - 24.0 * 24.0 / 5.0)
    val within = 280.0 - terms
    val want = math.floor((between / 1.0) / (within / 3.0) * 1e4 + 0.5) / 1e4
    assert(r1.getLong(0) == 5L && r1.getLong(1) == 2L)
    assert(r1.getDouble(2) == want, s"w = ${r1.getDouble(2)} want $want")
    assert(r1.isNullAt(5), "dof2 < 120 -> NULL flag, never a wrong one")
    // mirrored spreads: between lands 2^-11 negative -> clamped to 0
    val eq = Seq(("a", 0.01), ("a", 0.03), ("a", 0.05),
      ("b", 0.02), ("b", 0.04), ("b", 0.06)).toDF("event_type", "value")
    val r2 = StatQueries.brownForsythe(eq, "event_type", "value").collect()(0)
    assert(r2.getDouble(2) == 0.0)
  }

  test("outlierIqr: hand fences, IQR=0 collapses to the quartiles") {
    import graft.queries.StatQueries
    // o: cents {0, 10x6, 100} -> Q1 = Q3 = 10, fences collapse, one
    // outlier each side; u: {10,20,30,40} -> fences [-5, 55], none
    val o = (Seq(0.0) ++ Seq.fill(6)(0.10) ++ Seq(1.0)).map(("o", _))
    val u = Seq(0.10, 0.20, 0.30, 0.40).map(("u", _))
    val ev = (o ++ u).toDF("event_type", "value")
    val r = StatQueries.outlierIqr(ev, "event_type", "value")
      .orderBy("event_type").collect()
    assert(r(0).getString(0) == "o" && r(0).getLong(1) == 8L &&
      r(0).getDouble(2) == 0.1 && r(0).getDouble(3) == 0.1 &&
      r(0).getLong(4) == 1L && r(0).getLong(5) == 1L &&
      r(0).getDouble(6) == 0.25)
    assert(r(1).getString(0) == "u" && r(1).getLong(4) == 0L &&
      r(1).getLong(5) == 0L && r(1).getDouble(6) == 0.0)
  }

  test("dispersionIndex: spined zeros, constant 0, bursty >1, single-day NULL") {
    import graft.queries.StatQueries
    val p = (1 to 3).flatMap(d => Seq.fill(2)(("p", dayNs(d))))
    val b = Seq.fill(1)(("b", dayNs(1))) ++ Seq.fill(5)(("b", dayNs(2)))
    val s = Seq(("s", dayNs(1)))
    // g: 3 events on day 1 and day 5 only — the zero-TRUNCATED series
    // {3,3} would read variance 0 'under'; the calendar spine reads
    // {3,0,0,0,3}: var = 54/20 = 2.7, mean 1.2 -> D = 2.25 'over'
    val g = Seq.fill(3)(("g", dayNs(1))) ++ Seq.fill(3)(("g", dayNs(5)))
    val ev = (p ++ b ++ s ++ g).toDF("event_type", "ts")
    val r = StatQueries.dispersionIndex(ev, "event_type", "ts")
      .orderBy("event_type").collect()
    // b: counts {1,5} -> mean 3, var 8 -> D = 2.6667 'over'
    assert(r(0).getString(0) == "b" && r(0).getDouble(2) == 3.0 &&
      r(0).getDouble(3) == 2.6667 && r(0).getString(4) == "over")
    assert(r(1).getString(0) == "g" && r(1).getLong(1) == 5L &&
      r(1).getDouble(2) == 1.2 && r(1).getDouble(3) == 2.25 &&
      r(1).getString(4) == "over")
    assert(r(2).getString(0) == "p" && r(2).getDouble(3) == 0.0 &&
      r(2).getString(4) == "under")
    assert(r(3).getString(0) == "s" && r(3).isNullAt(3) && r(3).isNullAt(4))
  }

  test("hillTail: hand tail with one ln2 term, degenerate and short tails NULL") {
    import graft.queries.StatQueries
    // t: one 4.00 above 100x 2.00 and one 1.00 -> x_(101) = 2.00, the
    // only nonzero tail term is ln(400/200) = ln 2 -> alpha = k/ln 2
    val t = (Seq(4.0) ++ Seq.fill(100)(2.0) ++ Seq(1.0)).map(("t", _))
    // flat: 102 equal values -> sum of ln ratios 0 -> NULL alpha
    val flat = Seq.fill(102)(("flat", 3.0))
    // short: n <= k -> no (k+1)-th statistic -> NULL alpha and x_ref
    val short = Seq.fill(50)(("short", 2.0))
    val ev = (t ++ flat ++ short).toDF("event_type", "value")
    val r = StatQueries.hillTail(ev, "event_type", "value")
      .orderBy("event_type").collect()
    assert(r(0).getString(0) == "flat" && r(0).getDouble(2) == 3.0 &&
      r(0).isNullAt(3))
    assert(r(1).getString(0) == "short" && r(1).isNullAt(2) &&
      r(1).isNullAt(3))
    val want = math.floor(1e11 /
      math.floor(math.log(2.0) * 1e9 + 0.5) * 1e4 + 0.5) / 1e4
    assert(r(2).getString(0) == "t" && r(2).getLong(1) == 102L &&
      r(2).getDouble(2) == 2.0 && r(2).getDouble(3) == want)
  }

  test("changepoint: argmax |p| localizes the cusum shift, level series NULL") {
    // daily counts [1,1,1,1,6]: p = [-5,-10,-15,-20,0] -> argmax day 4,
    // dev 20/5 = 4, direction 'up' (early days ran below the mean)
    val shift = ((1 to 4).map(d => (d, 1)) :+ ((5, 6)))
      .flatMap { case (d, n) => (1 to n).map(_ => ("t", dayNs(d))) }
    val level = (1 to 3).map(d => ("c", dayNs(d)))
    val ev = (shift ++ level).toDF("event_type", "ts")
    val r = StatQueries.changepoint(ev, "event_type", "ts")
      .orderBy("event_type").collect()
    assert(r(0).getString(0) == "c" && r(0).isNullAt(2) &&
      r(0).getDouble(3) == 0.0 && r(0).isNullAt(4))
    assert(r(1).getString(0) == "t" && r(1).getLong(1) == 5L &&
      r(1).getDate(2).toString == "1970-01-05" &&
      r(1).getDouble(3) == 4.0 && r(1).getString(4) == "up")
  }

  test("runsTest: alternating series maxes runs, blocky halves minimize, ties NULL") {
    // alt: counts 1,5 alternating over 8 days -> R = 8, n+ = n- = 4,
    // mu = 5, var = 768/448; blocky: 1,1,1,5,5,5 -> R = 2; flat -> NULL
    val alt = (1 to 8).flatMap(d =>
      (1 to (if (d % 2 == 0) 5 else 1)).map(_ => ("alt", dayNs(d))))
    val blk = (1 to 6).flatMap(d =>
      (1 to (if (d <= 3) 1 else 5)).map(_ => ("blk", dayNs(d))))
    val flat = (1 to 4).map(d => ("flat", dayNs(d)))
    val ev = (alt ++ blk ++ flat).toDF("event_type", "ts")
    val r = StatQueries.runsTest(ev, "event_type", "ts")
      .orderBy("event_type").collect()
    val zAlt = math.floor((8.0 - 5.0) / math.sqrt(768.0 / 448.0) * 1e4 + 0.5) / 1e4
    assert(r(0).getString(0) == "alt" && r(0).getLong(2) == 4L &&
      r(0).getLong(3) == 4L && r(0).getLong(4) == 8L &&
      r(0).getDouble(5) == zAlt && r(0).getBoolean(6))
    val zBlk = math.floor((2.0 - 4.0) / math.sqrt(216.0 / 180.0) * 1e4 + 0.5) / 1e4
    assert(r(1).getString(0) == "blk" && r(1).getLong(4) == 2L &&
      r(1).getDouble(5) == zBlk)
    assert(r(2).getString(0) == "flat" && r(2).getLong(1) == 4L &&
      r(2).isNullAt(5), "an all-tied series has no runs to grade")
    // degenerate kept sets must NULL, not ANSI-crash (review r13 leg 2:
    // the variance denominator is 0 at n = 1 and an eager when()
    // predicate evaluated it): one survivor after tie-drop, and a
    // 2-day series whose variance is exactly 0
    val spike = Seq(1 -> 1, 2 -> 1, 3 -> 5)
      .flatMap { case (d, c) => (1 to c).map(_ => ("spike", dayNs(d))) }
    val pair2 = Seq(1 -> 1, 2 -> 5)
      .flatMap { case (d, c) => (1 to c).map(_ => ("pair", dayNs(d))) }
    val r2 = StatQueries.runsTest(
      (spike ++ pair2).toDF("event_type", "ts"), "event_type", "ts")
      .orderBy("event_type").collect()
    assert(r2(0).getString(0) == "pair" && r2(0).isNullAt(5))
    assert(r2(1).getString(0) == "spike" && r2(1).getLong(2) == 1L &&
      r2(1).getLong(3) == 0L && r2(1).isNullAt(5))
  }

  test("completeness: hand-counted span/missing/coverage/gap, single-day 100%") {
    import graft.queries.TimeSeriesQueries
    // g: active days {1,2,5,9} -> span 9, missing 5, coverage
    // floor(400/9) = 44, gaps {0,2,3} -> longest 3
    val g = Seq(1, 2, 5, 9).map(d => ("g", dayNs(d)))
    val solo = Seq(("solo", dayNs(3)), ("solo", dayNs(3)))
    val ev = (g ++ solo).toDF("event_type", "ts")
    val r = TimeSeriesQueries.completeness(ev, "event_type", "ts")
      .orderBy("event_type").collect()
    assert(r(0).getString(0) == "g" && r(0).getLong(1) == 4L)
    assert(r(0).getLong(4) == 9L && r(0).getLong(5) == 4L &&
      r(0).getLong(6) == 5L && r(0).getLong(7) == 44L &&
      r(0).getLong(8) == 3L)
    assert(r(1).getString(0) == "solo" && r(1).getLong(1) == 2L &&
      r(1).getLong(4) == 1L && r(1).getLong(6) == 0L &&
      r(1).getLong(7) == 100L && r(1).getLong(8) == 0L)
  }

  test("hellingerDrift: identical halves give BC=1 H=0, disjoint halves dominate") {
    import graft.queries.TrainingDataQueries
    val ev = Seq(
      ("d", dayNs(1), 1.0), ("d", dayNs(2), 1.0),
      ("d", dayNs(20), 100.0), ("d", dayNs(21), 100.0),
      ("s", dayNs(1), 1.0), ("s", dayNs(2), 100.0),
      ("s", dayNs(20), 1.0), ("s", dayNs(21), 100.0)
    ).toDF("event_type", "ts", "value")
    val r = TrainingDataQueries
      .hellingerDrift(ev, "event_type", "ts", "value", 15)
      .orderBy("event_type").collect()
    // identical per-bin counts -> pa = pb -> BC = Σ pa = 1, H = 0 (the
    // greatest() guard absorbs a float BC = 1 + ε)
    assert(r(1).getDouble(3) == 1.0 && r(1).getDouble(4) == 0.0 &&
      !r(1).getBoolean(5))
    val hd = r(0).getDouble(4)
    assert(hd > 0.0 && hd <= 1.0 && r(0).getBoolean(5) == (hd > 0.1))
  }

  test("cusumShift: prefix/running-extremum unrolling matches the recursion by hand") {
    // daily counts [1,1,1,1,6]: T=10, D=5, P = [-5,-10,-15,-20,0]
    // S_up = [0,0,0,0,20] -> cusum_up = [0,0,0,0,4], flag only day 5
    val rows = (1 to 4).map(d => (d, 1)) :+ ((5, 6))
    val ev = rows.flatMap { case (d, n) =>
      (1 to n).map(_ => ("t", dayNs(d)))
    }.toDF("event_type", "ts")
    val r = StatQueries.cusumShift(ev, "event_type", "ts")
      .orderBy("day").collect()
    assert(r.map(_.getDouble(3)).toSeq == Seq(0.0, 0.0, 0.0, 0.0, 4.0))
    assert(r.map(_.getBoolean(5)).toSeq ==
      Seq(false, false, false, false, true))
    // downward arm: S_dn = [5,10,15,20,0] -> cusum_dn = [1,2,3,4,0]
    assert(r.map(_.getDouble(4)).toSeq == Seq(1.0, 2.0, 3.0, 4.0, 0.0))
  }

  test("cusumShift: a dark stretch IS the downward shift (zero-filled spine)") {
    // observed days 1,2,3,10 at x=5; days 4-9 completely dark. On the
    // spine: x=[5,5,5,0,0,0,0,0,0,5], D=10, T=20, dev=10x-20, P prefix
    // [30,60,90,70,50,30,10,-10,-30,0], s_dn = runmax(P)-P =
    // [0,0,0,20,40,60,80,100,120,90] -> flags (5*s_dn>20) from day 4 on.
    // The pre-r16 zero-TRUNCATED series was [5,5,5,5]: dev=0 everywhere,
    // the outage invisible, no flag ever — the review-r16 scenario.
    val ev = (Seq(1, 2, 3, 10).flatMap(d => (1 to 5).map(_ => ("t", dayNs(d)))))
      .toDF("event_type", "ts")
    val r = StatQueries.cusumShift(ev, "event_type", "ts")
      .orderBy("day").collect()
    assert(r.length == 10, "spine must cover the dark days")
    assert(r.map(_.getLong(2)).toSeq ==
      Seq(5L, 5L, 5L, 0L, 0L, 0L, 0L, 0L, 0L, 5L))
    assert(r.map(_.getDouble(4)).toSeq ==
      Seq(0.0, 0.0, 0.0, 2.0, 4.0, 6.0, 8.0, 10.0, 12.0, 9.0))
    assert(r.map(_.getBoolean(6)).toSeq ==
      Seq(false, false, false, true, true, true, true, true, true, true))
  }

  test("changepoint: localizes at the edge of a dark stretch") {
    // same series as the cusum dark-stretch spec: argmax |P| = 90 at
    // day 3 (the last day before the outage), P > 0 there -> the early
    // level ran ABOVE the mean, direction "down"; max_dev = 90/10.
    val ev = (Seq(1, 2, 3, 10).flatMap(d => (1 to 5).map(_ => ("t", dayNs(d)))))
      .toDF("event_type", "ts")
    val r = StatQueries.changepoint(ev, "event_type", "ts").collect()(0)
    assert(r.getLong(1) == 10L)
    assert(r.getDate(2).toLocalDate.getDayOfMonth == 4, // epoch day 3 = Jan 4 1970
      s"change_day must be the outage boundary, got ${r.getDate(2)}")
    assert(r.getDouble(3) == 9.0 && r.getString(4) == "down")
  }

  test("runsTest: dark days enter as zero-count observations") {
    // observed days 1,3,5 at x=[1,5,1]; days 2,4 dark. Zero-filled
    // series [1,0,5,0,1], median 1: day1/day5 tie (dropped), days 2/4
    // below, day 3 above -> kept [0,1,0], R=3, n+=1, n-=2,
    // mu=1+4/3, var=4/18, z=(3-7/3)/sqrt(2/9)=sqrt(2)=1.4142. The
    // zero-truncated series kept only [1,5,1] -> one mark, z NULL.
    val ev = (Seq((1, 1), (3, 5), (5, 1)).flatMap { case (d, n) =>
      (1 to n).map(_ => ("t", dayNs(d)))
    }).toDF("event_type", "ts")
    val r = StatQueries.runsTest(ev, "event_type", "ts").collect()(0)
    assert(r.getLong(1) == 5L, "n_days counts the spine")
    assert(r.getLong(2) == 1L && r.getLong(3) == 2L && r.getLong(4) == 3L)
    assert(r.getDouble(5) == 1.4142 && !r.getBoolean(6))
  }

  test("autocorr: alternating daily counts give r=-1 at lag 1, r=1 at lag 2") {
    // counts [1,2,1,2,1,2]: lag-1 pairs are perfectly anti-linear
    // (y = 3 - x), lag-2 pairs identical (y = x)
    val ev = (1 to 6).flatMap { d =>
      val n = if (d % 2 == 0) 2 else 1
      (1 to n).map(_ => ("t", dayNs(d)))
    }.toDF("event_type", "ts")
    val r = StatQueries.autocorr(ev, "event_type", "ts", maxLag = 2)
      .orderBy("lag").collect()
    assert(r(0).getInt(1) == 1 && r(0).getDouble(3) == -1.0)
    assert(r(1).getInt(1) == 2 && r(1).getDouble(3) == 1.0)
  }

  test("autocorr: lag k means k DAYS, not k observed rows") {
    // observed days 1,2,4,5 at x=[1,2,1,2]; day 3 dark. Zero-filled
    // series [1,2,0,1,2]: lag-1 pairs (xp,y) = (1,2),(2,0),(0,1),(1,2)
    // -> n=4, six sums (4,5,4,6,9) give r = -4/sqrt(8*11) = -0.426401.
    // The pre-r16 row-based lag saw [1,2,1,2] and reported a perfect
    // -1.0 from 3 pairs, treating the 2-day gap as adjacent days.
    val ev = Seq((1, 1), (2, 2), (4, 1), (5, 2)).flatMap { case (d, n) =>
      (1 to n).map(_ => ("t", dayNs(d)))
    }.toDF("event_type", "ts")
    val r = StatQueries.autocorr(ev, "event_type", "ts", maxLag = 1)
      .collect()(0)
    assert(r.getLong(2) == 4L, "pairs span the dark day")
    assert(r.getDouble(3) == -0.426401)
  }

  test("benfordAudit: full digit grid, zero digits kept, deviation flags") {
    // every value leads with digit 1 -> share(1)=1 (flagged: dev .699),
    // shares 0 elsewhere (digit 9 dev .046 stays under the 0.05 flag)
    val ev = Seq(("t", 10.0), ("t", 1.5), ("t", 199.0), ("t", 0.5))
      .toDF("event_type", "value") // 0.5 < 1 is excluded
    val r = StatQueries.benfordAudit(ev, "event_type", "value")
      .orderBy("digit").collect()
    assert(r.length == 9, "all nine digits must be present")
    assert(r(0).getLong(2) == 3L && r(0).getDouble(3) == 1.0 &&
      r(0).getBoolean(6))
    assert(r(8).getLong(2) == 0L && r(8).getDouble(3) == 0.0 &&
      !r(8).getBoolean(6), "digit 9's Benford share is under the flag")
  }

  test("chiSquare: perfect 2x2 association gives chi2 = N, uniform grid gives 0") {
    // days 7/14 are Sun/Sun+7 -> two distinct dows; type A only on the
    // first, type B only on the second: O = [[10,0],[0,10]], chi2 = N = 20
    val depA = (1 to 10).map(_ => ("A", dayNs(7)))   // 1970-01-08? day 7
    val depB = (1 to 10).map(_ => ("B", dayNs(8)))
    val dep = (depA ++ depB).toDF("event_type", "ts")
    val r = StatQueries.chiSquare(dep, "event_type", "ts")
      .orderBy("event_type").collect()
    assert(r.forall(_.getLong(1) == 1L), "two dows -> dof 1")
    // per-type CONTRIBUTION: each row holds 10 of the table's chi2=N=20
    // — including the ZERO cell's full expected mass (the grid fill)
    assert(r.forall(_.getDouble(2) == 10.0), "contribution 10 per type")
    assert(r.map(_.getDouble(2)).sum == 20.0, "table statistic = N")
    assert(r.forall(!_.getBoolean(3)), "residual flag requires the full dof=6 grid")
    // identical per-dow shape for both types -> chi2 exactly 0
    val unif = (Seq(("A", dayNs(7)), ("A", dayNs(8)),
      ("B", dayNs(7)), ("B", dayNs(8)))).toDF("event_type", "ts")
    val u = StatQueries.chiSquare(unif, "event_type", "ts").collect()
    assert(u.forall(_.getDouble(2) == 0.0))
  }

  test("qUnpivot: the pivot->unpivot round trip equals the direct long-form rollup") {
    import graft.queries.ScalarQueries
    val got = ScalarQueries.qUnpivot(spark, TestSpark.Sf)
      .as[(java.sql.Date, String, Long)].collect().toSeq
    val want = Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"), Tables.eventDay.as("day"))
      .groupBy("day", "event_type").count()
      .as[(java.sql.Date, String, Long)].collect().toSeq
      .sortBy(r => (r._1.toString, r._2))
    assert(got == want)
  }

  test("EventTypes pins the fixture's distinct event_type set (pivot coverage)") {
    // the q_unpivot/q_pivot oracles aggregate every event_type present
    // while the Spark side pivots over the explicit EventTypes list — a
    // new fixture type would drop rows on the Spark side only, so the
    // coupling must fail HERE first (ADVICE r12)
    val got = Tables.events(spark, TestSpark.Sf)
      .select("event_type").distinct().as[String].collect().toSeq.sorted
    assert(got == graft.queries.ScalarQueries.EventTypes.sorted,
      s"fixture event types $got != pivot list ${graft.queries.ScalarQueries.EventTypes}")
  }

  test("frame-generic operators honor a tsCol not named 'ts' (review regression)") {
    val ev = Seq(("t", dayNs(1)), ("t", dayNs(2)), ("t", dayNs(2)))
      .toDF("event_type", "created_at")
    // each would throw (no 'ts' column) or mis-read before the fix
    assert(StatQueries.cusumShift(ev, "event_type", "created_at")
      .count() == 2)
    assert(StatQueries.autocorr(ev, "event_type", "created_at", 1)
      .count() == 1)
    assert(StatQueries.chiSquare(ev, "event_type", "created_at")
      .count() == 1)
    val ev2 = ev.withColumn("value", lit(2.0))
    assert(StatQueries.rocAuc(ev2.withColumn("event_type",
        when(col("created_at") === dayNs(1), "p").otherwise("n")),
      "event_type", "created_at", "value", "p", "n").count() == 2)
  }

  test("interarrival: metronome cv 0, bursty cv by hand, median on ties") {
    import graft.queries.TimeSeriesQueries
    def e(id: Long, tpe: String, tsNs: Long) = (tpe, tsNs, id)
    val ev = Seq(
      // metronome: gaps 1000 ms each
      e(1, "m", 0L), e(2, "m", 1000000000L), e(3, "m", 2000000000L),
      e(4, "m", 3000000000L),
      // bursty: gaps 0, 0, 3000 ms (ties ordered by event_id)
      e(5, "b", 0L), e(6, "b", 0L), e(7, "b", 0L), e(8, "b", 3000000000L)
    ).toDF("event_type", "ts", "event_id")
    val r = TimeSeriesQueries.interarrival(ev, "event_type", "ts", "event_id")
      .orderBy("event_type").collect()
    // b: mean (0+0+3000)/3 = 1000, median 0, cv = sqrt(3e6)/1000
    assert(r(0).getString(0) == "b" && r(0).getLong(1) == 3L)
    assert(r(0).getDouble(2) == 1000.0 && r(0).getDouble(3) == 0.0)
    assert(r(0).getDouble(4) == 1.7321, s"cv = ${r(0).getDouble(4)}")
    // m: constant gaps -> cv exactly 0
    assert(r(1).getString(0) == "m" && r(1).getLong(1) == 3L)
    assert(r(1).getDouble(2) == 1000.0 && r(1).getDouble(3) == 1000.0)
    assert(r(1).getDouble(4) == 0.0)
  }

  test("twap: holding-interval weights hand-checked, one-event day NULL") {
    import graft.queries.TimeSeriesQueries
    val ms = 1000000L // ns per ms
    val ev = Seq(
      // 1.0 held 1000ms, 3.0 held 2000ms, last drops:
      // (100*1000 + 300*2000) / 3000 / 100 = 2.3333
      ("t", 0L * ms, 1.0, 1L), ("t", 1000L * ms, 3.0, 2L),
      ("t", 3000L * ms, 9.0, 3L),
      // single-event day -> NULL
      ("u", 0L, 5.0, 4L)
    ).toDF("event_type", "ts", "value", "event_id")
    val r = TimeSeriesQueries.twap(ev, "event_type", "ts", "value", "event_id")
      .orderBy("event_type").collect()
    assert(r(0).getDouble(3) == 2.3333)
    assert(r(1).isNullAt(3))
  }

  test("streaks: gaps-and-islands hand check") {
    import graft.queries.TimeSeriesQueries
    val ev = (Seq(1, 2, 3, 5).map(d => (1L, dayNs(d))) ++
      Seq(1, 3, 5).map(d => (2L, dayNs(d))) ++
      Seq(1, 1, 1).map(d => (3L, dayNs(d)))) // dup days collapse
      .toDF("user_id", "ts")
    val r = TimeSeriesQueries.streaks(ev, "user_id", "ts")
      .orderBy("user").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((1L, 3L, 4L), (2L, 1L, 3L), (3L, 1L, 1L)))
  }

  test("funnelTimebound: gap window enforced, first-touch semantics") {
    import graft.queries.TimeSeriesQueries
    val ev = Seq(
      (1L, "signup", dayNs(1)), (1L, "click", dayNs(2)),
      (1L, "purchase", dayNs(3)),
      (2L, "signup", dayNs(1)), (2L, "click", dayNs(20)), // outside 7d
      (3L, "click", dayNs(1)) // never signed up
    ).toDF("user_id", "event_type", "ts")
    val r = TimeSeriesQueries.funnelTimebound(ev, "user_id", "event_type",
      "ts", Seq("signup", "click", "purchase"),
      TimeSeriesQueries.FunnelGapNs)
      .orderBy("stage").collect().map(_.getLong(2)).toSeq
    assert(r == Seq(2L, 1L, 1L))
  }

  test("rfm: five users with aligned orderings land one per quintile cell") {
    import graft.queries.TimeSeriesQueries
    // user i: i events on day i, each value i -> r=f=m=i for every i
    val ev = (1 to 5).flatMap { i =>
      (1 to i).map(_ => (i.toLong, dayNs(i), i.toDouble))
    }.toDF("user_id", "ts", "value")
    val r = TimeSeriesQueries.rfm(ev, "user_id", "ts", "value")
      .orderBy("r_score").collect()
    assert(r.length == 5)
    (0 until 5).foreach { k =>
      val i = k + 1
      assert(r(k).getInt(0) == i && r(k).getInt(1) == i && r(k).getInt(2) == i)
      assert(r(k).getLong(3) == 1L)
      assert(r(k).getDouble(4) == i.toDouble * i) // i events x value i
    }
  }

  test("vocabCoverage: OOV fraction against the top-k vocabulary, hand-checked") {
    import graft.queries.TextStats
    val docs = Seq((1L, "a a b"), (2L, "a a a")).toDF("doc_id", "text")
    val r = TextStats.vocabCoverage(docs, k = 1).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 3L && r(0).getLong(2) == 1L &&
      r(0).getDouble(3) == 0.3333)
    assert(r(1).getLong(2) == 0L && r(1).getDouble(3) == 0.0)
  }

  test("attribution: last prior touch credited, no-touch purchases land in none") {
    import graft.queries.TemporalJoinQueries
    val ms = 1000000L
    val ev = Seq(
      (1L, "click", 1L * ms, 1L, 0.0), (1L, "purchase", 2L * ms, 2L, 10.0),
      (1L, "view", 3L * ms, 3L, 0.0), (1L, "purchase", 4L * ms, 4L, 20.0),
      (2L, "purchase", 1L * ms, 5L, 5.0)
    ).toDF("user_id", "event_type", "ts", "event_id", "value")
    val r = TemporalJoinQueries.attribution(ev, "user_id", "event_type",
      "ts", "event_id", "value", "purchase")
      .orderBy("channel").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2))).toSeq
    assert(r == Seq(("click", 1L, 10.0), ("none", 1L, 5.0),
      ("view", 1L, 20.0)))
  }

  test("sessionPaths: first-3 path per gap session, hand-assembled") {
    import graft.queries.TemporalJoinQueries
    val hr = 3600L * 1000000000L
    val ev = Seq(
      // session 1: a b c d -> path a>b>c; session 2 (gap > 6h): e
      (1L, "a", 0L, 1L), (1L, "b", 1L * hr, 2L), (1L, "c", 2L * hr, 3L),
      (1L, "d", 3L * hr, 4L), (1L, "e", 20L * hr, 5L),
      // user 2: one session a b -> a>b
      (2L, "a", 0L, 6L), (2L, "b", 1L * hr, 7L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val r = TemporalJoinQueries.sessionPaths(ev, "user_id", "event_type",
      "ts", "event_id", gapNanos = 6L * hr)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq.sorted
    assert(r == Seq(("a>b", 1L), ("a>b>c", 1L), ("e", 1L)))
  }

  test("seasonalityStrength: dow-determined values give 1, flat profile gives ~0, constant NULL") {
    import graft.queries.StatQueries
    // days 7 and 8 are distinct dows; type A: value determined by dow
    val detA = Seq(("A", dayNs(7), 1.0), ("A", dayNs(7), 1.0),
      ("A", dayNs(8), 3.0), ("A", dayNs(8), 3.0))
    // type B: same {1,3} spread INSIDE each dow -> SSW = SST -> 0
    val flatB = Seq(("B", dayNs(7), 1.0), ("B", dayNs(7), 3.0),
      ("B", dayNs(8), 1.0), ("B", dayNs(8), 3.0))
    // type C: constant -> SST = 0 -> NULL
    val constC = Seq(("C", dayNs(7), 2.0), ("C", dayNs(8), 2.0))
    val ev = (detA ++ flatB ++ constC).toDF("event_type", "ts", "value")
    val r = StatQueries.seasonalityStrength(ev, "event_type", "ts", "value")
      .orderBy("event_type").collect()
    assert(r(0).getDouble(2) == 1.0)
    assert(r(1).getDouble(2) == 0.0)
    assert(r(2).isNullAt(2))
  }

  test("embeddingQuantize: on-grid vectors reconstruct exactly, flat vectors code 0") {
    import graft.queries.SimilarityQueries
    val rows = Seq(
      (1L, Seq(0.0f, 255.0f)),          // scale 1: codes {0,255}, mse 0
      (2L, Seq(2.0f, 2.0f, 2.0f))       // flat: degenerate, qsum 0, mse 0
    ).toDF("vec_id", "embedding")
    val r = SimilarityQueries.embeddingQuantize(rows)
      .orderBy("vec_id").collect()
    assert(r(0).getLong(3) == 255L && r(0).getDouble(4) == 0.0)
    assert(r(1).getLong(3) == 0L && r(1).getDouble(4) == 0.0)
    // fixture sanity: every code sum within [0, 255*64], mse bounded by
    // the half-step bound (scale/2)^2 scaled by 1e6
    val fx = SimilarityQueries.embeddingQuantize(
      Tables.embeddings(spark, TestSpark.Sf).filter(col("vec_id") < 50))
      .collect()
    fx.foreach { x =>
      val scale = (x.getDouble(2) - x.getDouble(1)) / 255.0
      assert(x.getLong(3) >= 0L && x.getLong(3) <= 255L * 64)
      assert(x.getDouble(4) <= (scale / 2) * (scale / 2) * 1e6 + 1e-9)
    }
  }

  test("cohortLtv: weekly cohorts, cumulative per-user spend hand-checked") {
    import graft.queries.TimeSeriesQueries
    val ev = Seq(
      (1L, dayNs(1), 1.0), (1L, dayNs(10), 2.0), // cohort 0, ages 0 and 1
      (2L, dayNs(9), 4.0)                        // first day 9 -> cohort 1
    ).toDF("user_id", "ts", "value")
    val r = TimeSeriesQueries.cohortLtv(ev, "user_id", "ts", "value")
      .orderBy("cohort_week", "age_week").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4))).toSeq
    assert(r == Seq(
      (0L, 0L, 1L, 1.0, 1.0), (0L, 1L, 1L, 2.0, 3.0),
      (1L, 0L, 1L, 4.0, 4.0)))
  }

  test("ngramNovelty: first-owner semantics, duplicate doc scores 0, short doc NULL") {
    import graft.queries.TextStats
    val docs = Seq(
      (1L, "a b c d e f"), // 2 distinct 5-grams, both first-owned
      (2L, "a b c d e f"), // same grams, owner is doc 1 -> novelty 0
      (3L, "x y")          // no 5-grams -> 0 grams, NULL novelty
    ).toDF("doc_id", "text")
    val r = TextStats.ngramNovelty(docs).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 2L && r(0).getLong(2) == 2L &&
      r(0).getDouble(3) == 1.0)
    assert(r(1).getLong(2) == 0L && r(1).getDouble(3) == 0.0)
    assert(r(2).getLong(1) == 0L && r(2).isNullAt(3))
  }

  test("jsonProfile: malformed JSON and non-integer k land in the NULL band") {
    import graft.queries.ScalarQueries
    val df = Seq(
      ("t", """{"k": 12}"""), ("t", """{"k": 17}"""),
      ("t", "{oops"), ("t", """{"k": "abc"}"""), ("t", null: String)
    ).toDF("event_type", "props")
    val r = ScalarQueries.jsonProfile(df, "event_type", "props")
      .orderBy("k_band").collect()
    // NULL band first under NULLS FIRST: 3 unparseable rows, then band 1
    assert(r.length == 2)
    assert(r(0).isNullAt(1) && r(0).getLong(2) == 3L && r(0).isNullAt(3))
    assert(r(1).getInt(1) == 1 && r(1).getLong(2) == 2L &&
      r(1).getInt(3) == 12 && r(1).getInt(4) == 17)
  }

  test("embeddingQuantize: NULL elements are dropped, not sum-poisoning") {
    import graft.queries.SimilarityQueries
    val rows = Seq((1L, Seq(Some(0.0f), None, Some(255.0f))))
      .toDF("vec_id", "embedding")
    val r = SimilarityQueries.embeddingQuantize(rows).head()
    assert(r.getLong(3) == 255L && r.getDouble(4) == 0.0,
      "codes computed over the two non-null elements")
  }

  test("anovaF: two separated groups hand-checked, single group NULL F") {
    // A = {1, 2, 3}, B = {5, 6, 7} (values -> cents x100): group means
    // 200/600 cents, grand 400; SSB = 3*200^2*2 = 240000 cents^2,
    // SSW = 2*(100^2+0+100^2) = 40000 -> F = (240000/1)/(40000/4) = 24,
    // eta2 = 240000/280000 = 0.857143 (large)
    val ev = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 6.0), ("b", 7.0)).toDF("event_type", "value")
    val r = StatQueries.anovaF(ev, "event_type", "value").collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 24.0, s"F: $r")
    assert(r.getDouble(3) == 0.857143 && r.getString(4) == "large")
    // one group: k = 1 -> F and eta2 NULL, no division reached
    val one = StatQueries.anovaF(
      Seq(("a", 1.0), ("a", 2.0)).toDF("event_type", "value"),
      "event_type", "value").collect()(0)
    assert(one.isNullAt(2) && one.isNullAt(3) && one.isNullAt(4))
  }

  test("momentProfile: symmetric grid, hand-checked skew, constant NULL") {
    // sym {1,2,3,4}: m2 = 12500 cents^2, m3 = 0, m4 = 256250000
    //   -> skew 0, excess kurtosis 1.64 - 3 = -1.36
    // skw {1,1,4}: m2 = 20000, m3 = 2e6 -> skew = 2e6/20000^1.5 = 0.7071
    // cst {2,2}: m2 = 0 -> NULL shape
    val ev = Seq(("sym", 1.0), ("sym", 2.0), ("sym", 3.0), ("sym", 4.0),
      ("skw", 1.0), ("skw", 1.0), ("skw", 4.0),
      ("cst", 2.0), ("cst", 2.0)).toDF("event_type", "value")
    val r = StatQueries.momentProfile(ev, "event_type", "value")
      .orderBy("event_type").collect()
    val bySym = r.map(x => x.getString(0) -> x).toMap
    assert(bySym("sym").getDouble(3) == 0.0)
    assert(bySym("sym").getDouble(4) == -1.36)
    assert(bySym("skw").getDouble(3) == 0.7071)
    assert(bySym("cst").isNullAt(3) && bySym("cst").isNullAt(4))
  }

  test("markovEntropy: branching state ln 2, deterministic state 0") {
    // one user walks A -> B -> A -> C: prev A sees {B, C} (H = ln 2,
    // perplexity 2), prev B sees {A} (H = 0, perplexity 1)
    val ev = Seq((1L, "A", dayNs(1), 1L), (1L, "B", dayNs(2), 2L),
      (1L, "A", dayNs(3), 3L), (1L, "C", dayNs(4), 4L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val r = StatQueries.markovEntropy(ev, "user_id", "event_type",
      "ts", "event_id").orderBy("prev").collect()
    assert(r.length == 2)
    assert(r(0).getString(0) == "A" && r(0).getLong(1) == 2L &&
      r(0).getLong(2) == 2L)
    assert(r(0).getDouble(3) == 0.693147 && r(0).getDouble(4) == 2.0)
    assert(r(1).getString(0) == "B" && r(1).getDouble(3) == 0.0 &&
      r(1).getDouble(4) == 1.0)
  }

  test("peakDetection: interior strict peak found, gap day zero-fills, endpoints excluded") {
    // daily counts on the CALENDAR spine: day1 1, day2 3, day3 1,
    // day4 ABSENT (zero-fills), day5 2 -> series 1,3,1,0,2: one peak
    // (day2); day5 is an endpoint and cannot peak
    def ev(day: Int, n: Int) = Seq.fill(n)(("t", dayNs(day)))
    val df = (ev(1, 1) ++ ev(2, 3) ++ ev(3, 1) ++ ev(5, 2))
      .toDF("event_type", "ts")
    val r = StatQueries.peakDetection(df, "event_type", "ts").collect()(0)
    assert(r.getLong(1) == 5L, s"spine must cover the gap day: $r")
    assert(r.getLong(2) == 1L && r.getLong(3) == 3L)
    assert(r.getDouble(4) == 0.2)
  }

  test("kendallTau: monotone series 1, tied pair hand-checked, all-equal NULL") {
    // inc: daily counts 1,2,3 -> S=3, 2n0=6, tx2=0 -> tau = 1
    // tie: counts 1,1,2 -> S=2, tx2=2 -> tau = 4/sqrt(4*6) = 0.8165
    // flt: counts 2,2 -> S=0, 2n0=2=tx2 -> NULL
    def ev(t: String, day: Int, n: Int) = Seq.fill(n)((t, dayNs(day)))
    val df = (ev("inc", 1, 1) ++ ev("inc", 2, 2) ++ ev("inc", 3, 3) ++
      ev("tie", 1, 1) ++ ev("tie", 2, 1) ++ ev("tie", 3, 2) ++
      ev("flt", 1, 2) ++ ev("flt", 2, 2)).toDF("event_type", "ts")
    val r = StatQueries.kendallTau(df, "event_type", "ts")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("inc").getDouble(3) == 1.0)
    assert(r("tie").getDouble(3) == 0.8165)
    assert(r("flt").isNullAt(3))
  }

  test("weeklyPower: 7-day spikes read centered share strong, flat series NULL") {
    // spk: 1 event on days 1, 8, 15 (all k=0), zero-filled n=15,
    //   sx=3, x̄=0.2. Raw projection Σx·cos = 3; the centering term:
    //   Σcos over the spine = two full weeks (exactly 0, even in micro
    //   units — the rounded coefficients cancel pairwise) + t=14 (k=0,
    //   cos=1) = 1, so a = 3 − 0.2·1 = 2.8; Σsin = 0 so b = 0.
    //   sse = 3 − 9/15 = 2.4, share = 2.8²·2/15/2.4 = 0.43555… →
    //   0.4356 strong (the UNcentered form read 0.5: the DC overlap
    //   from the 15-day span inflating a — review r16)
    // flt: identical count every day -> zero variance -> NULL share
    def ev(t: String, day: Int, n: Int) = Seq.fill(n)((t, dayNs(day)))
    val df = (ev("spk", 1, 1) ++ ev("spk", 8, 1) ++ ev("spk", 15, 1) ++
      (1 to 7).flatMap(d => ev("flt", d, 2))).toDF("event_type", "ts")
    val r = StatQueries.weeklyPower(df, "event_type", "ts")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("spk").getLong(1) == 15L)
    assert(r("spk").getDouble(2) == 2.8 && r("spk").getDouble(3) == 0.0)
    assert(r("spk").getDouble(4) == 0.4356 && r("spk").getString(5) == "strong")
    assert(r("flt").isNullAt(4) && r("flt").isNullAt(5))
  }

  test("weeklyPower: constant series on a non-multiple-of-7 span reads zero share") {
    // the review-r16 leakage case distilled: x = 2 every day for 10
    // days — no weekly structure whatsoever. The uncentered projection
    // leaked the mean through the partial-week overlap (Σcos ≠ 0 when
    // the span is not a multiple of 7) and reported a nonzero share;
    // centered, a = b = 0 exactly and sse = 0 gates share to NULL.
    def ev(day: Int, n: Int) = Seq.fill(n)(("c", dayNs(day)))
    val df = (1 to 10).flatMap(d => ev(d, 2)).toDF("event_type", "ts")
    val r = StatQueries.weeklyPower(df, "event_type", "ts").collect()(0)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("dayCorrMatrix: parallel series +1, mirrored series -1") {
    // a: 1,2,3  b: 2,4,6  c: 3,2,1 over the same three days
    def ev(t: String, day: Int, n: Int) = Seq.fill(n)((t, dayNs(day)))
    val df = (ev("a", 1, 1) ++ ev("a", 2, 2) ++ ev("a", 3, 3) ++
      ev("b", 1, 2) ++ ev("b", 2, 4) ++ ev("b", 3, 6) ++
      ev("c", 1, 3) ++ ev("c", 2, 2) ++ ev("c", 3, 1)).toDF("event_type", "ts")
    val r = StatQueries.dayCorrMatrix(df, "event_type", "ts")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(r(("a", "b")).getDouble(3) == 1.0)
    assert(r(("a", "c")).getDouble(3) == -1.0)
    assert(r(("b", "c")).getDouble(3) == -1.0)
    assert(r.values.forall(_.getLong(2) == 3L))
  }

  test("giniConcentration: equality gives 0, known split gives 0.25") {
    val ev = (
      // type eq: 3 users x 2 events -> G = 0
      Seq.fill(2)(("eq", 1L)) ++ Seq.fill(2)(("eq", 2L)) ++
        Seq.fill(2)(("eq", 3L)) ++
        // type sk: counts {1, 3} -> G = (2*7 - 3*4) / (2*4) = 0.25
        Seq(("sk", 1L)) ++ Seq.fill(3)(("sk", 2L))
      ).toDF("event_type", "user_id")
    val r = StatQueries.giniConcentration(ev, "event_type", "user_id")
      .orderBy("event_type").collect()
    assert(r(0).getDouble(3) == 0.0)
    assert(r(1).getDouble(3) == 0.25)
  }
}
