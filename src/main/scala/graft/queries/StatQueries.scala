package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Classical-statistics operators over the event stream — the model-eval /
  * monitoring toolbox a training pipeline runs beside its ETL: ranking
  * quality (tie-corrected ROC-AUC), closed-form OLS trend fits,
  * two-sample Kolmogorov–Smirnov drift, CUSUM changepoint detection,
  * Gini concentration, lag-k autocorrelation, the Benford first-digit
  * audit, and a chi-square independence decomposition. (Reference
  * analogue: the eval/monitoring notebooks around `ml-algorithms/` —
  * re-expressed as exact relational plans instead of driver-side scipy
  * loops.)
  *
  * Shared cross-engine discipline (the q_ab_test recipe): every statistic
  * is derived from EXACT integer partials — cent-scaled values, ranks,
  * counts — folded per group, with fixed-order double expressions at
  * the end and [[rnd]] on output. Where the fold spans a bounded set of
  * float terms (chi-square's 7 dows) it is a FIXED left-associated
  * expression, never an order-free aggregate. Where a flag gates on a
  * statistic it compares exact integers (cusum, ks) or the ROUNDED
  * double (auc, benford, chi2), so the boolean can never straddle an
  * engine-rounding boundary.
  *
  * Scale shape: every operator here aggregates to a bounded grain —
  * per-day, per-type, per-(type × cents-grid), per-(type × 7 dows),
  * per-(type × 9 digits) — with map-side-combinable partials; the only
  * windows are partitioned by those same bounded keys (AUC/Gini rank at
  * the day/user grain; CUSUM/autocorr lag at the DAY grain). None of
  * them carries the q_diff_global single-partition hazard; for a
  * monster partition the named swap is the chunk-stitched ranking of
  * q_pagination_chunked.
  */
object StatQueries {

  // dayOf/centsOf come from the graft.queries package object — ONE
  // definition of the nanos→day and cent-scaling rules (review r12)

  /** Tie-corrected ROC-AUC per day via the Mann–Whitney rank-sum
    * identity: AUC = (R⁺ − n₊(n₊+1)/2) / (n₊n₋) where R⁺ is the sum of
    * POOLED average ranks of the positives. Average ranks come from
    * exact integer window arithmetic — 2·avgRank = 2·minRank + ties − 1
    * (rank() + a tie count, no floats) — so the whole statistic is one
    * integer rational: AUC = (ΣR2 − n₊(n₊+1)) / (2n₊n₋), divided once.
    *
    * `posType` events are positives, `negType` negatives, everything
    * else is ignored; score = cent-scaled `valCol`. A day missing either
    * class yields NULL (no ranking to grade), never a /0.
    *
    * Scale: the rank window partitions by DAY (bounded by daily volume;
    * chunk-stitch for a monster day). Long-exactness: ΣR2 ≤ 2n² per
    * day, so BIGINT is exact up to ~2·10⁹ rows/day; past that widen to
    * decimal(38,0) as PartialAgg prescribes. */
  def rocAuc(df: DataFrame, typeCol: String, tsCol: String, valCol: String,
             posType: String, negType: String): DataFrame = {
    val ev = df
      .filter(col(typeCol).isin(posType, negType) && col(valCol).isNotNull)
      .select(dayOf(tsCol).as("day"),
        (col(typeCol) === posType).cast("long").as("pos"),
        centsOf(valCol).as("cents"))
    val wRank = Window.partitionBy("day").orderBy("cents")
    val wTie = Window.partitionBy("day", "cents")
    val ranked = ev
      .withColumn("r2",
        lit(2L) * rank().over(wRank).cast("long") +
          count(lit(1)).over(wTie) - lit(1L))
    ranked.groupBy("day")
      .agg(sum(col("pos")).as("n_pos"),
        sum(lit(1L) - col("pos")).as("n_neg"),
        sum(when(col("pos") === 1L, col("r2"))).as("sr2"))
      .select(col("day"), col("n_pos"), col("n_neg"),
        rnd(when(col("n_pos") > 0L && col("n_neg") > 0L,
          (col("sr2") - col("n_pos") * (col("n_pos") + lit(1L))).cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double")), 4)
          .as("auc"))
  }

  def qRocAuc(spark: SparkSession, dir: String): DataFrame =
    rocAuc(Tables.events(spark, dir), "event_type", "ts", "value",
      "purchase", "click")
      .orderBy("day")

  /** Closed-form simple OLS per group — `valCol` regressed on hour of
    * day, the normal equations folded into ONE aggregate of six exact
    * integer sums (n, Σx, Σx², Σxy, Σy, Σy² over hours × cents): slope,
    * intercept and r² are then three fixed-order double expressions.
    * The whole fit is a map-side-combinable groupBy — no iteration, no
    * driver loop, no feature matrix (reference fits sklearn per frame;
    * at 100 TB a closed-form fit IS the aggregate).
    *
    * r² is NULL for a degenerate group (all x equal or all y equal —
    * zero denominator); slope NULL when all x equal. Long-exactness:
    * Σ(x·cents) ≤ 23·10⁵·n and Σc² ≤ 10¹⁰·n keep BIGINT exact to
    * ~9·10⁸ rows/group (the varFromCents bound); widen to
    * decimal(38,0) past it. */
  def linregClosed(df: DataFrame, typeCol: String, tsCol: String,
                   valCol: String): DataFrame = {
    val ev = df.filter(col(valCol).isNotNull)
      .select(col(typeCol).as("event_type"),
        hourOf(tsCol).cast("long").as("x"),
        centsOf(valCol).as("c"))
    val g = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("c")).as("sxy"),
      sum(col("c")).as("sy"), sum(col("c") * col("c")).as("syy"))
    def d(s: String) = col(s).cast("double")
    val covNum = d("n") * d("sxy") - d("sx") * d("sy")
    val varX = d("n") * d("sxx") - d("sx") * d("sx")
    val varY = d("n") * d("syy") - d("sy") * d("sy")
    val slopeC = covNum / varX
    g.select(col("event_type"), col("n"),
      rnd(when(varX > 0.0, slopeC / 100.0), 6).as("slope"),
      rnd(when(varX > 0.0,
        ((d("sy") - slopeC * d("sx")) / d("n")) / 100.0), 4).as("intercept"),
      rnd(when(varX > 0.0 && varY > 0.0,
        (covNum * covNum) / (varX * varY)), 6).as("r2"))
  }

  def qLinregClosed(spark: SparkSession, dir: String): DataFrame =
    linregClosed(Tables.events(spark, dir), "event_type", "ts", "value")
      .orderBy("event_type")

  /** Two-sample Kolmogorov–Smirnov drift test per group: D = sup over
    * the value grid of |F_a − F_b| between the ≤`splitDay` and
    * >`splitDay` samples. The ECDFs live on the DISTINCT cent-value
    * grid — sup |F_a−F_b| is attained at a sample point, so the grid is
    * exhaustive — and the supremum is taken over the exact integer
    * cross-difference |cumA·n_b − cumB·n_a| (one double division at the
    * end). `drifted` compares integers: D > threshold ⇔
    * 100·maxDiff > thresholdPct·n_a·n_b — no rounding boundary.
    *
    * Scale: the grid is bounded by VALUE RESOLUTION (distinct cents ≤
    * range·100, here ~5·10⁴ rows/type regardless of row count), so the
    * cumulative window is over a bounded partition no matter how big
    * the fact table grows — the same resolution-bounded shape as
    * q_histogram. Long-exactness: cum·n ≤ n_a·n_b overflows BIGINT past
    * n_a·n_b ~ 9·10¹⁸ (≈3·10⁹ rows per side per type); widen to
    * decimal(38,0) past it. */
  def ksTest(df: DataFrame, typeCol: String, tsCol: String, valCol: String,
             splitDay: Int, thresholdPct: Int = 10): DataFrame =
    ksInts(df, typeCol, tsCol, valCol, splitDay, thresholdPct)
      .select(col("event_type"), col("n_a"), col("n_b"),
        rnd(when(col("n_a") > 0L && col("n_b") > 0L,
          col("dnum").cast("double") /
            (col("n_a") * col("n_b")).cast("double")), 6).as("d_stat"),
        col("drifted"))

  /** The exact-integer core of [[ksTest]] — per group the sample sizes,
    * the supremum numerator dnum = max|cumA·n_b − cumB·n_a| and the
    * integer-compared drift flag, with NO double column. This is the
    * localizing twin's surface (the q_span_dedup_rowhash playbook): a
    * gate trip on the INTEGER twin means value drift; a trip on
    * [[ksTest]] alone means rounding/canonicalization-surface drift. */
  private def ksInts(df: DataFrame, typeCol: String, tsCol: String,
                     valCol: String, splitDay: Int,
                     thresholdPct: Int): DataFrame = {
    val day = dayOf(tsCol)
    val grid = df
      .filter(col(valCol).isNotNull)
      .select(col(typeCol).as("event_type"),
        when(dayofmonth(day) <= splitDay, 1L).otherwise(0L).as("ina"),
        centsOf(valCol).as("cents"))
      .groupBy("event_type", "cents")
      .agg(sum(col("ina")).as("ca"), sum(lit(1L) - col("ina")).as("cb"))
    val wCum = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    grid
      .withColumn("fa", sum(col("ca")).over(wCum))
      .withColumn("fb", sum(col("cb")).over(wCum))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .groupBy("event_type")
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(abs(col("fa") * col("nb") - col("fb") * col("na"))).as("dnum"))
      .select(col("event_type"), col("n_a"), col("n_b"), col("dnum"),
        (lit(100L) * col("dnum") >
          lit(thresholdPct.toLong) * col("n_a") * col("n_b")).as("drifted"))
  }

  def qKsTest(spark: SparkSession, dir: String): DataFrame =
    ksTest(Tables.events(spark, dir), "event_type", "ts", "value", 15)
      .orderBy("event_type")

  /** Integer-only KS twin (VERDICT r12 ask #1): the exact dnum/n_a/n_b
    * the d_stat divides, registered beside [[qKsTest]] so a future
    * driver-gate trip discriminates value drift (twin red too) from
    * rounding-surface drift (twin green, d_stat row red). */
  def qKsTestDnum(spark: SparkSession, dir: String): DataFrame =
    ksInts(Tables.events(spark, dir), "event_type", "ts", "value", 15, 10)
      .orderBy("event_type")

  /** CUSUM changepoint detection over per-day event counts: the
    * recursive S_t = max(0, S_{t−1} + (x_t − μ)) unrolls to
    * S_t = P_t − min(0, min_{j≤t} P_j) with P the prefix sum of
    * deviations — two window functions, no recursion. Deviations are
    * held EXACT by scaling through the day count: dev_t = D·x_t − T
    * (D days, T total), so S is integer until the final /D. Both
    * directions are emitted (S⁺ upward shift, S⁻ downward) and the
    * shift flags compare integers — S > frac·μ·D ⇔ 5·S > T for
    * frac = 0.2 — so detection can never straddle a rounding boundary.
    *
    * Scale: the window partitions by type over the DAY grain — the
    * partition is #days, not #rows, so the sort is metadata-scale; the
    * fact-volume passes are the [[zeroFilledDaily]] documented pair
    * (bounds + fill — materialize the rollup once at corpus scale). */
  def cusumShift(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    // zero-FILLED spine (review r16): the observed-only series drops
    // dark days, so a total outage — the strongest possible downward
    // level shift — never enters the deviation prefix and s_dn stays
    // quiet; on the spine a dark day contributes dev = D·0 − T and
    // trips the flag immediately (the dispersionIndex r13 lesson,
    // applied to the changepoint family)
    val daily = zeroFilledDaily(df.filter(col(typeCol).isNotNull),
      typeCol, tsCol)
    val wAll = Window.partitionBy("event_type")
    val wCum = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("d", count(lit(1)).over(wAll))
      .withColumn("t", sum(col("x")).over(wAll))
      .withColumn("p", sum(col("d") * col("x") - col("t")).over(wCum))
      .withColumn("s_up", col("p") - least(lit(0L), min(col("p")).over(wCum)))
      .withColumn("s_dn", greatest(lit(0L), max(col("p")).over(wCum)) - col("p"))
      .select(col("event_type"), col("day"), col("x").as("n_events"),
        rnd(col("s_up").cast("double") / col("d").cast("double"), 4)
          .as("cusum_up"),
        rnd(col("s_dn").cast("double") / col("d").cast("double"), 4)
          .as("cusum_dn"),
        (lit(5L) * col("s_up") > col("t")).as("shift_up"),
        (lit(5L) * col("s_dn") > col("t")).as("shift_dn"))
  }

  def qCusumShift(spark: SparkSession, dir: String): DataFrame =
    cusumShift(Tables.events(spark, dir), "event_type", "ts")
      .orderBy("event_type", "day")

  /** CUSUM changepoint LOCALIZATION per group — [[cusumShift]] says a
    * level shift happened; this says WHEN: the day maximizing the
    * absolute scaled deviation prefix |p_t| = |Σ_{j≤t} (D·x_j − T)| is
    * the classical CUSUM changepoint estimate (the split where the
    * before/after means differ most). p is the same EXACT integer
    * prefix cusumShift unrolls, so argmax is an integer comparison
    * with the earliest-day tiebreak — fully deterministic; a
    * perfectly level series (max |p| = 0) reports a NULL day and
    * direction, never an arbitrary one. Direction reads the SIGN of p
    * at the argmax: a negative dip means the early days ran below the
    * overall mean, i.e. the level shifted UP there.
    *
    * Scale: identical to [[cusumShift]] — the [[zeroFilledDaily]]
    * documented scan pair; prefix and argmax windows at the DAY grain. */
  def changepoint(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    // zero-filled spine for the same reason as [[cusumShift]]: a dark
    // stretch IS the level shift, and dropping those days mislocalizes
    // the argmax (review r16)
    val daily = zeroFilledDaily(df.filter(col(typeCol).isNotNull),
      typeCol, tsCol)
    val wAll = Window.partitionBy("event_type")
    val wCum = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPick = Window.partitionBy("event_type")
      .orderBy(abs(col("p")).desc, col("day").asc)
    daily
      .withColumn("d", count(lit(1)).over(wAll))
      .withColumn("t", sum(col("x")).over(wAll))
      .withColumn("p", sum(col("d") * col("x") - col("t")).over(wCum))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("d").as("n_days"),
        when(abs(col("p")) > 0L, col("day")).as("change_day"),
        rnd(abs(col("p")).cast("double") / col("d").cast("double"), 4)
          .as("max_dev"),
        when(abs(col("p")) === 0L, lit(null).cast("string"))
          .when(col("p") < 0L, "up").otherwise("down").as("direction"))
  }

  def qChangepoint(spark: SparkSession, dir: String): DataFrame =
    changepoint(Tables.events(spark, dir), "event_type", "ts")
      .orderBy("event_type")

  /** Wald–Wolfowitz runs test per group over daily event counts — the
    * RANDOMNESS screen completing the day-series family ([[mannKendall]]
    * asks "monotone trend?", [[changepoint]] asks "where did the level
    * shift?", this asks "is the up/down sequence random at all" —
    * catching oscillation and clustering that both of those miss):
    * days are marked above/below the group's exact median (ties
    * dropped, the textbook convention), R = number of runs, and z
    * compares R against its exact null moments μ = 1 + 2n₊n₋/n,
    * σ² = 2n₊n₋(2n₊n₋ − n)/(n²(n−1)).
    *
    * Cross-engine discipline: the median interpolates integral daily
    * counts (exact halves — the q_percentile precedent; the doubled
    * comparison 2x vs 2·med stays on exactly-represented values), R
    * and the null-moment inputs are exact integers, z is one mirrored
    * fixed-order double and `nonrandom` compares the ROUNDED z. A
    * one-sided group (n₊ or n₋ = 0, σ = 0) reports NULL z.
    *
    * Scale: fact-volume passes are the [[zeroFilledDaily]] documented
    * pair (bounds + fill); the median window and the lag over kept
    * days run per group at the DAY grain (the percentile buffer holds
    * #days values — calendar-bounded). */
  def runsTest(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    // zero-filled spine (review r16): dark days are x = 0 observations
    // of the day series, and a randomness screen that silently skips
    // them reads a gappy weekday-only series as a clean run sequence
    val daily = zeroFilledDaily(df.filter(col(typeCol).isNotNull),
      typeCol, tsCol)
    val wAll = Window.partitionBy("event_type")
    val wDay = Window.partitionBy("event_type").orderBy("day")
    val marked = daily
      .withColumn("med2", expr("percentile(x, 0.5)").over(wAll) * 2.0)
      .withColumn("b",
        when(col("x") * 2L > col("med2"), 1L)
          .when(col("x") * 2L < col("med2"), 0L))
    val kept = marked.filter(col("b").isNotNull)
      .withColumn("chg",
        when(lag(col("b"), 1).over(wDay).isNotNull &&
          col("b") =!= lag(col("b"), 1).over(wDay), 1L).otherwise(0L))
      .groupBy("event_type")
      .agg(sum(col("b")).as("n_above"),
        sum(lit(1L) - col("b")).as("n_below"),
        (lit(1L) + sum(col("chg"))).as("n_runs"))
    def d(s: String) = col(s).cast("double")
    val n = d("n_above") + d("n_below")
    val two = lit(2.0) * d("n_above") * d("n_below")
    val mu = lit(1.0) + two / n
    val vr = (two * (two - n)) / (n * n * (n - 1.0))
    // the gate must be division-free: a when() PREDICATE is evaluated
    // eagerly, and vr's denominator is 0 at n = 1 (ANSI Spark throws on
    // /0 where DuckDB yields NaN — review r13 leg 2). two > n ⟺ vr > 0
    // given both marks present, and it also implies n > 1.
    val z = rnd(when(col("n_above") > 0L && col("n_below") > 0L && two > n,
      (d("n_runs") - mu) / sqrt(vr)), 4)
    val spine = daily.groupBy("event_type").agg(count(lit(1)).as("nd"))
    spine.join(kept, Seq("event_type"), "left")
      .select(col("event_type"), col("nd").as("n_days"),
        col("n_above"), col("n_below"), col("n_runs"), z.as("z"),
        (abs(z) > 1.96).as("nonrandom"))
  }

  def qRunsTest(spark: SparkSession, dir: String): DataFrame =
    runsTest(Tables.events(spark, dir), "event_type", "ts")
      .orderBy("event_type")

  /** Tail-order-statistics count for [[hillTail]] — interpolated into
    * BOTH engines so they cannot drift. */
  val HillK: Int = 100

  /** Hill tail-index estimator per group — HOW heavy the value tail is
    * (the per-value complement of [[benfordAudit]]'s digit audit and
    * zipf_fit's corpus decay: α ≤ 2 means infinite variance, and a
    * mean-based monitor on such a column is lying):
    * α̂ = k / Σ_{i≤k} ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top-k order statistics.
    * The order statistics come from the distinct-cents GRID, not a
    * row sort: a descending cumulative count locates x₍ₖ₊₁₎ as a
    * conditional window max and gives each grid row its exact tail
    * multiplicity least(t, k − cumBefore); each ln (an exact-integer
    * ratio) is nano-rounded to a long and multiplied by that exact
    * count, so the tail sum is an order-free exact long. A group with
    * n ≤ k has no (k+1)-th statistic and reports NULL; a degenerate
    * tail (top k+1 values all equal ⇒ Σ = 0) also NULLs, never /0.
    *
    * Scale: the KS/KW grid class — one fact-grain cell aggregate, then
    * windows over the value-RESOLUTION-bounded grid. */
  def hillTail(df: DataFrame, typeCol: String, valCol: String): DataFrame = {
    val k = lit(HillK.toLong)
    val ev = df.filter(col(valCol).isNotNull)
      .select(col(typeCol).as("event_type"), centsOf(valCol).as("cents"))
      .filter(col("cents") > 0L)
    val grid = ev.groupBy("event_type", "cents").agg(count(lit(1)).as("t"))
    val wDesc = Window.partitionBy("event_type").orderBy(desc("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("event_type")
    val g = grid
      .withColumn("cumbefore", coalesce(sum(col("t")).over(wDesc), lit(0L)))
      .withColumn("n_g", sum(col("t")).over(wAll))
      .withColumn("xref", max(when(col("cumbefore") < k + lit(1L) &&
        col("cumbefore") + col("t") >= k + lit(1L), col("cents"))).over(wAll))
    def dd(c: Column) = c.cast("double")
    val copies = least(col("t"), k - col("cumbefore"))
    val termN = when(col("cumbefore") < k && col("xref").isNotNull,
      copies * floor(log(dd(col("cents")) / dd(col("xref"))) * lit(1e9) +
        lit(0.5)).cast("long")).otherwise(lit(0L))
    g.select(col("event_type"), col("n_g"), col("xref"), termN.as("tn"))
      .groupBy("event_type")
      .agg(max(col("n_g")).as("n"), max(col("xref")).as("xref"),
        sum(col("tn")).as("snano"))
      .select(col("event_type"), col("n"),
        rnd(col("xref").cast("double") / 100.0, 2).as("x_ref"),
        rnd(when(col("snano") > 0L,
          lit(HillK.toDouble) * lit(1e9) / col("snano").cast("double")), 4)
          .as("alpha"))
  }

  def qHillTail(spark: SparkSession, dir: String): DataFrame =
    hillTail(Tables.events(spark, dir), "event_type", "value")
      .orderBy("event_type")

  /** Tukey IQR-fence outlier audit per group — the boxplot convention
    * beside [[hillTail]]'s tail index and outlier_mad's robust z (MAD
    * asks "how far in robust σ"; the fences ask the analyst's default
    * "outside 1.5×IQR?"): exact quartiles interpolate on integer cents
    * (quarter-valued doubles, exact on both engines — the
    * q_quantile_drift precedent), so the fences are eighth-valued
    * exact doubles and every count compares exactly. Degenerate
    * IQR = 0 still counts correctly (fences collapse to the quartiles).
    *
    * Scale: stats aggregate + broadcast join back for the conditional
    * counts — two fact scans (the key_skew two-consumer class); the
    * exact-percentile buffer holds a group's cents (the
    * latencyPercentiles hazard; percentile_approx is the swap). */
  def outlierIqr(df: DataFrame, typeCol: String, valCol: String): DataFrame = {
    val ev = df.filter(col(valCol).isNotNull)
      .select(col(typeCol).as("event_type"), centsOf(valCol).as("c"))
    val st = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      expr("percentile(c, 0.25)").as("q1"),
      expr("percentile(c, 0.75)").as("q3"))
    val lo = col("q1") - lit(1.5) * (col("q3") - col("q1"))
    val hi = col("q3") + lit(1.5) * (col("q3") - col("q1"))
    def d(c: Column) = c.cast("double")
    ev.join(broadcast(st), "event_type")
      .groupBy("event_type")
      .agg(max(col("n")).as("n"),
        rnd(max(col("q1")) / 100.0, 4).as("q1"),
        rnd(max(col("q3")) / 100.0, 4).as("q3"),
        sum(when(d(col("c")) < lo, 1L).otherwise(0L)).as("n_low"),
        sum(when(d(col("c")) > hi, 1L).otherwise(0L)).as("n_high"))
      .select(col("event_type"), col("n"), col("q1"), col("q3"),
        col("n_low"), col("n_high"),
        rnd((col("n_low") + col("n_high")).cast("double") /
          col("n").cast("double"), 4).as("outlier_frac"))
  }

  def qOutlierIqr(spark: SparkSession, dir: String): DataFrame =
    outlierIqr(Tables.events(spark, dir), "event_type", "value")
      .orderBy("event_type")

  /** Daily-count dispersion index per group — D = s²/x̄ over the day
    * series (Poisson reads 1; the burstiness QUANTIFIER beside
    * [[runsTest]]'s randomness verdict and [[interarrival]]'s cv):
    * exact integer day-count moments over the COMPLETE calendar spine
    * between the group's first and last active day — the observed-days
    * series is zero-TRUNCATED and reads a sparse burst as "under"
    * (review r13 leg 4; the q_crosscorr spine lesson) — then one
    * mirrored fixed-order double; regime bands label the ROUNDED D.
    * Single-day groups NULL. mean > 0 by construction (the spine ends
    * at ACTIVE days), so the one division needs no zero gate.
    *
    * Scale: the [[dailyCounts]] rollup is the only fact-volume pass;
    * the spine explode and moment fold run at calendar scale (#days
    * rows per group). */
  def dispersionIndex(df: DataFrame, typeCol: String,
                      tsCol: String): DataFrame = {
    // a NULL group key would zero-fill through the spine's non-null-safe
    // join (NULL = NULL never matches) and read NaN 'over' on BOTH
    // engines — the oracle-blind wrong-statistic class (review r13
    // leg 4); NULL-keyed rows are excluded explicitly, mirrored in SQL
    val full = zeroFilledDaily(df.filter(col(typeCol).isNotNull),
      typeCol, tsCol)
    val g = full.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    def d(s: String) = col(s).cast("double")
    val vr = (d("n") * d("sxx") - d("sx") * d("sx")) /
      (d("n") * (d("n") - 1.0))
    val mean = d("sx") / d("n")
    val di = rnd(when(col("n") > 1L, vr / mean), 4)
    g.select(col("event_type"), col("n").as("n_days"),
      rnd(mean, 4).as("mean_daily"), di.as("dispersion"),
      when(di.isNull, lit(null).cast("string"))
        .when(di < 0.9, "under").when(di <= 1.1, "poisson")
        .otherwise("over").as("regime"))
  }

  def qDispersionIndex(spark: SparkSession, dir: String): DataFrame =
    dispersionIndex(Tables.events(spark, dir), "event_type", "ts")
      .orderBy("event_type")

  /** Gini concentration of per-user activity within each group — the
    * inequality summary beside q_hhi_concentration's HHI: with user
    * counts c₍₁₎ ≤ … ≤ c₍ₙ₎ ranked ascending,
    * G = (2·Σ i·c₍ᵢ₎ − (n+1)·Σc) / (n·Σc) — one integer rational per
    * group (ties contribute Σranks·c identically under any tie order,
    * so the id tiebreak affects nothing), one double division, rnd 6.
    *
    * Scale: rank window partitions by type at the USER grain (the same
    * per-key aggregate a dedup pays); Σ i·cᵢ ≤ n·T overflows BIGINT
    * past n·T ~ 9·10¹⁸ — decimal(38,0) is the named swap. */
  def giniConcentration(df: DataFrame, typeCol: String,
                        userCol: String): DataFrame = {
    val per = df.groupBy(col(typeCol).as("event_type"),
        col(userCol).as("user")).agg(count(lit(1)).as("c"))
    val wRank = Window.partitionBy("event_type").orderBy("c", "user")
    per
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"), sum(col("c")).as("n_events"),
        sum(col("rn") * col("c")).as("src"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        rnd((lit(2L) * col("src") - (col("n_users") + lit(1L)) * col("n_events"))
          .cast("double") /
          (col("n_users") * col("n_events")).cast("double"), 6).as("gini"))
  }

  def qGini(spark: SparkSession, dir: String): DataFrame =
    giniConcentration(Tables.events(spark, dir), "event_type", "user_id")
      .orderBy("event_type")

  /** Lag-k autocorrelation of the per-day event-count series per group —
    * the seasonality probe behind every forecasting baseline: for each
    * lag 1..maxLag, Pearson r between (x_{t−lag}, x_t) from the same
    * six exact integer sums as [[linregClosed]] (counts are integers,
    * so every partial is exact; one fixed-order double expression with
    * a sqrt at the end, zero-variance pairs NULL-gated).
    *
    * Scale: the lag windows run on the DAY grain (metadata-scale
    * partitions, like cusumShift); fact-volume passes are the
    * [[zeroFilledDaily]] documented pair (bounds + fill). */
  def autocorr(df: DataFrame, typeCol: String, tsCol: String,
               maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, s"autocorr: maxLag must be >= 1 (got $maxLag)")
    // zero-filled spine (review r16): lag k must mean k DAYS, not k
    // observed rows — exactly the defect crossCorr's docstring names
    // and fixed for the cross-series case (r13); with dark days the
    // row-based lag pairs values 9-10 calendar days apart under the
    // lag-7 seasonality probe
    val daily = zeroFilledDaily(df.filter(col(typeCol).isNotNull),
      typeCol, tsCol)
    laggedPearson(daily.withColumn("y", col("x")),
      partCols = Seq("event_type"), ordCol = "day", lags = 1 to maxLag)
  }

  /** Shared lag-unroll + six-integer-sum Pearson fold for the
    * [[autocorr]]/[[crossCorr]] pair — given a frame with `x`, `y` and
    * an order column, emits (partCols…, lag, n_pairs, r) for each lag:
    * xp = lag(x, k), Pearson(xp, y) from exact integer sums in the
    * mirrored fixed-order expression. ONE definition (review r13:
    * crossCorr had grown a near-verbatim copy of autocorr's body —
    * the fold lives once or the two series tests diverge). */
  private def laggedPearson(series: DataFrame, partCols: Seq[String],
                            ordCol: String, lags: Range): DataFrame = {
    val w = {
      val base = Window.partitionBy(partCols.map(col): _*)
      base.orderBy(ordCol)
    }
    val lagCols = lags.map(l => lag(col("x"), l).over(w).as(s"x$l"))
    val keep = partCols.map(col) :+ col("y")
    val stacked = series
      .select(keep ++ lagCols: _*)
      .select(keep :+ explode(array(lags.map(l =>
        struct(lit(l).as("lag"), col(s"x$l").as("xp"))): _*)).as("e"): _*)
      .select(keep ++ Seq(col("e.lag").as("lag"), col("e.xp").as("xp")): _*)
      .filter(col("xp").isNotNull)
    val g = stacked.groupBy((partCols :+ "lag").map(col): _*).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("xp")).as("sx"), sum(col("y")).as("sy"),
      sum(col("xp") * col("y")).as("sxy"),
      sum(col("xp") * col("xp")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    def d(s: String) = col(s).cast("double")
    val varX = d("n_pairs") * d("sxx") - d("sx") * d("sx")
    val varY = d("n_pairs") * d("syy") - d("sy") * d("sy")
    g.select((partCols.map(col) ++ Seq(col("lag"), col("n_pairs"),
      rnd(when(varX > 0.0 && varY > 0.0,
        (d("n_pairs") * d("sxy") - d("sx") * d("sy")) /
          sqrt(varX * varY)), 6).as("r"))): _*)
  }

  def qAutocorr(spark: SparkSession, dir: String): DataFrame =
    autocorr(Tables.events(spark, dir), "event_type", "ts")
      .orderBy("event_type", "lag")

  /** Benford expected share of leading digit d, as the EXACT double the
    * Scala runtime computes — interpolated into the oracle as its
    * shortest round-trip decimal literal (CAST to DOUBLE, never a bare
    * DECIMAL literal), so both engines hold bit-identical constants. */
  private[queries] def benfordP(d: Int): Double = math.log10(1.0 + 1.0 / d)

  /** Benford first-digit audit per group — the classic fraud/data-entry
    * screen: observed leading-digit shares of `valCol` (values ≥ 1)
    * against the Benford expectation, one row per (group, digit) over
    * the FULL 1..9 grid (zero-observation digits kept via the sequence
    * cross join, so a missing digit reads as share 0, not a missing
    * row). Deviation is per-digit |share − p| — deliberately no
    * cross-digit float sum, so no accumulation-order hazard; the flag
    * compares the ROUNDED deviation.
    *
    * Scale: one conditional-count aggregate at the (group, digit ≤ 9)
    * grain — constant-size partials, map-side combined, the histogram
    * shape. */
  def benfordAudit(df: DataFrame, typeCol: String, valCol: String,
                   flagAt: Double = 0.05): DataFrame = {
    // ONE fact-scan: nine conditional counts per group (the full digit
    // grid by construction — no distinct/grid/count side frames for
    // ReuseExchange to miss), stacked to rows by a bounded explode
    val obs = df
      .filter(col(valCol) >= 1.0)
      .select(col(typeCol).as("event_type"),
        substring(expr(s"CAST(CAST(floor(`$valCol`) AS BIGINT) AS STRING)"),
          1, 1).cast("int").as("digit"))
      .groupBy("event_type")
      .agg(sum(when(col("digit") === 1, 1L).otherwise(0L)).as("d1"),
        (2 to 9).map(d =>
          sum(when(col("digit") === d, 1L).otherwise(0L)).as(s"d$d")): _*)
    val n = (1 to 9).map(d => col(s"d$d")).reduceLeft(_ + _)
    val rows = (1 to 9).map(d =>
      struct(lit(d).as("digit"), col(s"d$d").as("n_obs"),
        lit(benfordP(d)).as("p")))
    obs
      .withColumn("n", n)
      .select(col("event_type"), col("n"), explode(array(rows: _*)).as("r"))
      .select(col("event_type"), col("r.digit").as("digit"),
        col("r.n_obs").as("n_obs"),
        rnd(col("r.n_obs").cast("double") / col("n").cast("double"), 6)
          .as("share"),
        rnd(col("r.p"), 6).as("expected"),
        rnd(abs(col("r.n_obs").cast("double") / col("n").cast("double") -
          col("r.p")), 6).as("dev"))
      .withColumn("flagged", col("dev") > flagAt)
  }

  def qBenford(spark: SparkSession, dir: String): DataFrame =
    benfordAudit(Tables.events(spark, dir), "event_type", "value")
      .orderBy("event_type", "digit")

  /** χ²(0.95, 6) critical value — literal on both engines; the flag
    * compares the ROUNDED statistic. */
  val Chi2Crit6 = 12.5916

  /** Chi-square decomposition of the (group × day-of-week) independence
    * statistic — is traffic shape uniform across the week? Output is
    * each group's CONTRIBUTION (its row of the contingency table); the
    * table statistic is the sum of contributions, and the per-row
    * `flagged` is the residual screen against χ²(0.95, 6) on the full
    * 7-dow grid. Each cell's term is the exact-rational form
    * (O·N − R·C)² / (R·C·N): integer numerator (margins from two
    * bounded rollups + broadcast joins), ONE division per cell — and
    * the 7 per-dow terms fold in a FIXED left-associated expression
    * (t0 + t1 + … + t6, conditional max per dow), so there is no
    * aggregation-order float hazard anywhere (the hash-agg-order trap
    * a naive sum(term) would hit). ZERO cells are materialized by a
    * (groups × dows) grid fill before the fold — an absent cell still
    * contributes its full expected mass E (the spec's 2×2 perfect-
    * association walk is exactly the case a cells-only plan misses).
    *
    * Scale: the grid is (groups × 7) — resolution-bounded like ksTest;
    * margins are map-side-combinable rollups of the same grid.
    * Long-exactness: O·N ≤ N² overflows past N ~ 3·10⁹ events per
    * audited frame; decimal(38,0) is the named widen.
    *
    * dow is Spark's dayofweek − 1 (Sunday = 0), matching DuckDB's
    * dayofweek numbering exactly. */
  /** Shared (group × weekday) contingency frame — ONE fact-volume pass
    * folds the 7 per-dow observed counts per group (zero cells are
    * o_d = 0 by construction — no grid-completion join to multiply
    * scans), with the row margin `__r`, the column margins c0..c6 and
    * the grand total `n` as window sums over the bounded per-group
    * frame (one consumer — the dataset-card rule). ONE definition for
    * [[chiSquare]]/[[cramersV]]/[[mutualInfo]] (review r13 second leg:
    * three verbatim copies had grown — the contingency recipe lives
    * once or it drifts), mirrored by the DowContingencyCtes oracle
    * prefix. */
  private def dowContingency(df: DataFrame, typeCol: String,
                             tsCol: String): DataFrame = {
    val dowCol = (dayofweek(dayOf(tsCol)) - lit(1)).cast("long")
    val byType = df
      .select(col(typeCol).as("t"), dowCol.as("dow"))
      .groupBy("t")
      .agg(sum(when(col("dow") === 0L, 1L).otherwise(0L)).as("o0"),
        (1 to 6).map(d =>
          sum(when(col("dow") === d.toLong, 1L).otherwise(0L)).as(s"o$d")): _*)
    val wAll = Window.partitionBy(lit(1))
    (0 to 6).foldLeft(
      byType.withColumn("__r",
        (0 to 6).map(d => col(s"o$d")).reduceLeft(_ + _))) {
      case (f, d) => f.withColumn(s"c$d", sum(col(s"o$d")).over(wAll))
    }.withColumn("n", sum(col("__r")).over(wAll))
  }

  /** Per-cell χ² term over the [[dowContingency]] frame — a dow absent
    * from the WHOLE table (c_d = 0) contributes 0 and reduces dof, and
    * a ZERO-MASS group (__r = 0 — every timestamp NULL, so all seven
    * conditional counts are 0) contributes 0 too; both gates keep the
    * divisor strictly positive (ANSI Spark throws on the 0/0 an
    * ungated row would hit — review r13 leg 2). Shared by
    * [[chiSquare]] (per-group decomposition) and [[cramersV]]
    * (whole-table effect size). */
  private def dowChiTerm(d: Int): Column = {
    val numd = (col(s"o$d") * col("n") - col("__r") * col(s"c$d"))
      .cast("double")
    when(col("__r") > 0L && col(s"c$d") > 0L, (numd * numd) /
      ((col("__r") * col(s"c$d")).cast("double") * col("n").cast("double")))
      .otherwise(lit(0.0))
  }

  def chiSquare(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    val withM = dowContingency(df, typeCol, tsCol)
    val chi2 = (0 to 6).map(dowChiTerm).reduceLeft(_ + _)
    val nDows = (0 to 6).map(d =>
      when(col(s"c$d") > 0L, 1L).otherwise(0L)).reduceLeft(_ + _)
    withM
      .select(col("t").as("event_type"), (nDows - lit(1L)).as("dof"),
        rnd(chi2, 4).as("chi2"))
      .withColumn("flagged",
        col("dof") === 6L && col("chi2") > Chi2Crit6)
  }

  def qChiSquare(spark: SparkSession, dir: String): DataFrame =
    chiSquare(Tables.events(spark, dir), "event_type", "ts")
      .orderBy("event_type")

  /** Day-of-week seasonality strength per group — the variance
    * decomposition 1 − SSW/SST: how much of the value variance is
    * explained by which weekday it is. ONE fact scan folds 21
    * conditional integer partials (n_d, Σc_d, Σc²_d per dow) per
    * group; the grand moments are EXACT integer sums of those columns,
    * and the within-group sum of squares folds the 7 per-dow terms in
    * the chi-square FIXED left-associated expression (each term one
    * division of exact integers — no order-free float aggregate
    * anywhere). Degenerate groups (zero total variance) are NULL.
    *
    * A strength near 1 says weekday explains the value; near 0 says
    * the weekly profile is flat — the decision input behind
    * seasonal-baseline anomaly thresholds (q_seasonal_baseline). */
  def seasonalityStrength(df: DataFrame, typeCol: String,
                          tsCol: String, valCol: String): DataFrame = {
    val dowCol = (dayofweek(dayOf(tsCol)) - lit(1)).cast("long")
    val ev = df.filter(col(valCol).isNotNull)
      .select(col(typeCol).as("event_type"), dowCol.as("dow"),
        centsOf(valCol).as("c"))
    def cond(d: Int, e: Column) = sum(when(col("dow") === d.toLong, e)
      .otherwise(lit(0L)))
    val aggs = (0 to 6).flatMap { d =>
      Seq(cond(d, lit(1L)).as(s"n$d"), cond(d, col("c")).as(s"sc$d"),
        cond(d, col("c") * col("c")).as(s"sq$d"))
    }
    val g = ev.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
    def dd(c: Column) = c.cast("double")
    val n = (0 to 6).map(d => col(s"n$d")).reduceLeft(_ + _)
    val sc = (0 to 6).map(d => col(s"sc$d")).reduceLeft(_ + _)
    val sq = (0 to 6).map(d => col(s"sq$d")).reduceLeft(_ + _)
    def term(d: Int) =
      when(col(s"n$d") > 0L,
        dd(col(s"sq$d")) - dd(col(s"sc$d")) * dd(col(s"sc$d")) / dd(col(s"n$d")))
        .otherwise(lit(0.0))
    val ssw = (0 to 6).map(term).reduceLeft(_ + _)
    val sst = dd(sq) - dd(sc) * dd(sc) / dd(n)
    g.select(col("event_type"), n.as("n"),
      rnd(when(sst > 0.0, lit(1.0) - ssw / sst), 6).as("strength"))
  }

  def qSeasonalityStrength(spark: SparkSession, dir: String): DataFrame =
    seasonalityStrength(Tables.events(spark, dir), "event_type", "ts",
      "value")
      .orderBy("event_type")

  /** Spearman rank correlation per group between hour-of-day and the
    * cent-scaled value — the monotone-association complement of
    * [[linregClosed]] (OLS asks "is the hourly trend linear"; Spearman
    * asks "is it monotone at all", robust to outliers and any monotone
    * warp). Tie handling is the textbook average-rank convention, held
    * EXACT by the [[rocAuc]] identity 2·avgRank = 2·rank + ties − 1 —
    * both variables become exact integer 2r columns, and Pearson over
    * them (shift/scale-invariant, so ρ(2rx, 2ry) = ρ(rx, ry)) is the
    * [[autocorr]] six-integer-sum fold with one sqrt at the end.
    * Degenerate groups (all x or all y tied) are NULL.
    *
    * Scale: two rank windows partitioned by GROUP — bounded by group
    * volume (chunk-stitch per q_pagination_chunked for a monster
    * group); the moment fold is map-side-combinable. Long-exactness:
    * Σ(2rx·2ry) ≤ 4n³ keeps BIGINT exact to ~1.3·10⁶ rows/group; widen
    * to decimal(38,0) past it (PartialAgg's prescription). */
  def spearman(df: DataFrame, typeCol: String, tsCol: String,
               valCol: String): DataFrame = {
    val ev = df.filter(col(valCol).isNotNull)
      .select(col(typeCol).as("event_type"),
        hourOf(tsCol).cast("long").as("x"),
        centsOf(valCol).as("c"))
    val wx = Window.partitionBy("event_type").orderBy("x")
    val wxT = Window.partitionBy("event_type", "x")
    val wy = Window.partitionBy("event_type").orderBy("c")
    val wyT = Window.partitionBy("event_type", "c")
    val ranked = ev
      .withColumn("rx2", lit(2L) * rank().over(wx).cast("long") +
        count(lit(1)).over(wxT) - lit(1L))
      .withColumn("ry2", lit(2L) * rank().over(wy).cast("long") +
        count(lit(1)).over(wyT) - lit(1L))
    val g = ranked.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("rx2")).as("sx"), sum(col("ry2")).as("sy"),
      sum(col("rx2") * col("ry2")).as("sxy"),
      sum(col("rx2") * col("rx2")).as("sxx"),
      sum(col("ry2") * col("ry2")).as("syy"))
    def d(s: String) = col(s).cast("double")
    val varX = d("n") * d("sxx") - d("sx") * d("sx")
    val varY = d("n") * d("syy") - d("sy") * d("sy")
    g.select(col("event_type"), col("n"),
      rnd(when(varX > 0.0 && varY > 0.0,
        (d("n") * d("sxy") - d("sx") * d("sy")) /
          sqrt(varX * varY)), 6).as("rho"))
  }

  def qSpearman(spark: SparkSession, dir: String): DataFrame =
    spearman(Tables.events(spark, dir), "event_type", "ts", "value")
      .orderBy("event_type")

  /** Mann–Kendall trend test per group over daily event counts — the
    * nonparametric "is there a monotone trend" screen run before
    * fitting any slope: S = Σ_{i<j} sign(x_j − x_i) over day pairs in
    * time order, variance with the tie correction
    * 18·Var = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), z the continuity-
    * corrected normal statistic. S and 18·Var are EXACT integers; z is
    * one fixed-order double expression, and `trending` compares the
    * ROUNDED z against 1.96 (the chi-square flag discipline).
    *
    * Scale: everything happens at the DAY grain — the pair join is
    * (#days choose 2) rows per group and the tie rollup #distinct
    * counts, metadata scale no matter the row count. The self-join's
    * b-side reuses the a-side's daily exchange (ReusedExchange,
    * asserted in PlanSpec); the tie rollup's column-pruned scan
    * de-canonicalizes its subtree (the q_span_dedup reuse lesson), so
    * the plan carries TWO map-side daily rollups of the fact table —
    * the psi_drift scalar-join precedent, pinned at two scans in
    * PlanSpec so it cannot silently grow. */
  /** Time-ordered day-pair self-join shared by the trend family —
    * `(event_type, d1, x1, d2, x2)` for every i < j day pair of the
    * NULL-key-excluded daily series; ONE definition consumed by
    * [[mannKendall]], [[theilSen]] and [[kendallTau]] (review r14: a
    * third verbatim copy had grown — the transitionPairs rule one
    * operator family over; NULL keys are excluded here because the
    * non-null-safe self-join would silently report degenerate
    * statistics both engines agree on, advice r13). */
  private def dayPairs(df: DataFrame, typeCol: String,
                       tsCol: String): DataFrame = {
    val daily = dailyCounts(df.filter(col(typeCol).isNotNull),
      typeCol, tsCol)
    daily.select(col("event_type"), col("day").as("d1"), col("x").as("x1"))
      .join(daily.select(col("event_type"), col("day").as("d2"),
        col("x").as("x2")), Seq("event_type"))
      .filter(col("d1") < col("d2"))
  }

  def mannKendall(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    val daily = dailyCounts(df.filter(col(typeCol).isNotNull),
      typeCol, tsCol)
    val s = dayPairs(df, typeCol, tsCol)
      .groupBy("event_type")
      .agg(sum(signum(col("x2") - col("x1")).cast("long")).as("s"))
    // tie groups of equal daily counts: Σ t(t−1)(2t+5) per group
    val ties = daily.groupBy("event_type", "x")
      .agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(sum(col("t")).as("n_days"),
        sum(col("t") * (col("t") - lit(1L)) *
          (lit(2L) * col("t") + lit(5L))).as("tie18"))
    // ties is the spine (a single-day group has NO pair rows): s
    // coalesces to 0 so the group still reports, with z NULL via var18
    val j = ties.join(s, Seq("event_type"), "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
    val n = col("n_days")
    val var18 = n * (n - lit(1L)) * (lit(2L) * n + lit(5L)) - col("tie18")
    val zRaw = (col("s").cast("double") -
      signum(col("s")).cast("double")) /
      sqrt(var18.cast("double") / 18.0)
    val z = rnd(when(var18 > 0L, zRaw), 4)
    j.select(col("event_type"), col("n_days"), col("s"), z.as("z"),
      (abs(z) > 1.96).as("trending"))
  }

  def qMannKendall(spark: SparkSession, dir: String): DataFrame =
    mannKendall(Tables.events(spark, dir), "event_type", "ts")
      .orderBy("event_type")

  /** Theil–Sen robust trend slope per group over daily event counts —
    * the slope companion to [[mannKendall]] (MK answers "IS there a
    * monotone trend"; this answers "how steep", with the 29%-breakdown
    * robustness OLS lacks): the MEDIAN of all pairwise slopes
    * (x_j − x_i)/(d_j − d_i) over day pairs in time order. Every slope
    * is ONE IEEE division of exact integers (Δcount/Δdays) —
    * bit-identical across engines — and the median comes from PINNED
    * middle elements (rows where 2·rn ∈ [n, n+2] under a slope-ordered
    * row_number; 2·rn is even so an odd n admits exactly the single
    * middle 2·rn = n+1) averaged as (lo+hi)/2 — never an engine
    * median() whose interpolation/tie rules could differ. Tie order
    * among equal slopes cannot move the answer: positions select from
    * the sorted multiset of VALUES. A single-day group has no pairs
    * and reports NULL slope on the [[mannKendall]] spine convention.
    *
    * Scale: the MK shape verbatim — the daily rollup is the only
    * fact-volume pass; the pair join is (#days choose 2) rows per
    * group and the median window partitions by group over those day
    * pairs, both metadata-scale regardless of corpus size. */
  def theilSen(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    val daily = dailyCounts(df.filter(col(typeCol).isNotNull),
      typeCol, tsCol)
    val pairs = dayPairs(df, typeCol, tsCol)
      .select(col("event_type"),
        ((col("x2") - col("x1")).cast("double") /
          datediff(col("d2"), col("d1")).cast("double")).as("slope"))
    val wOrd = Window.partitionBy("event_type").orderBy("slope")
    val wAll = Window.partitionBy("event_type")
    val mids = pairs
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("np", count(lit(1)).over(wAll))
      .filter(col("rn") * lit(2L) >= col("np") &&
        col("rn") * lit(2L) <= col("np") + lit(2L))
      .groupBy("event_type")
      .agg(max(col("np")).as("n_pairs"),
        min(col("slope")).as("lo"), max(col("slope")).as("hi"))
    val spine = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"))
    spine.join(mids, Seq("event_type"), "left")
      .select(col("event_type"), col("n_days"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        rnd((col("lo") + col("hi")) / 2.0, 6).as("slope"))
  }

  def qTheilSen(spark: SparkSession, dir: String): DataFrame =
    theilSen(Tables.events(spark, dir), "event_type", "ts")
      .orderBy("event_type")

  /** Cramér's V for the (group × weekday) contingency table — the
    * effect size of [[chiSquare]] (χ² says whether the weekly profile
    * depends on the group; V says HOW MUCH, scale-free in [0,1] and
    * comparable across tables): V = √(χ²/(n·min(r−1, c−1))), with the
    * Cohen-convention strength band labelling the ROUNDED V (the flag
    * discipline). ONE fact-volume pass folds the 7 per-dow observed
    * counts per group ([[chiSquare]]'s zero-cells-by-construction
    * shape); the column margins and grand total are window sums over
    * that bounded per-group frame (one consumer — the dataset-card
    * rule, where chiSquare's broadcast scalar join was the pre-r13
    * precedent); each group's 7-term χ² contribution is a FIXED fold
    * of exact-integer rationals, nano-rounded to a long so the
    * cross-group total is an order-free exact sum.
    *
    * Long-exactness: o·n ≤ n² holds in BIGINT to n ~ 3·10⁹ rows, and
    * the nano-scaled contribution ≤ n·10⁹ to n ~ 9·10⁸; decimal(38,0)
    * is the named widen past either. */
  def cramersV(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    val withM = dowContingency(df, typeCol, tsCol)
    val contrib = (0 to 6).map(dowChiTerm).reduceLeft(_ + _)
    val g = withM
      .select(col("n"),
        (0 to 6).map(d => when(col(s"c$d") > 0L, 1L).otherwise(0L))
          .reduceLeft(_ + _).as("c_levels"),
        floor(contrib * lit(1e9) + lit(0.5)).cast("long").as("cn"))
      .agg(max(col("n")).as("n"), count(lit(1)).as("r_levels"),
        max(col("c_levels")).as("c_levels"), sum(col("cn")).as("snano"))
    def d(s: String) = col(s).cast("double")
    val minDof = least(col("r_levels") - lit(1L), col("c_levels") - lit(1L))
    val v = rnd(when(minDof >= 1L,
      sqrt((d("snano") / 1e9) / (d("n") * minDof.cast("double")))), 4)
    g.select(col("n"), col("r_levels"), col("c_levels"),
      rnd(d("snano") / 1e9, 4).as("chi2"), v.as("v"),
      when(v.isNull, lit(null).cast("string"))
        .when(v < 0.1, "negligible").when(v < 0.3, "small")
        .when(v < 0.5, "medium").otherwise("large").as("strength"))
  }

  def qCramersV(spark: SparkSession, dir: String): DataFrame =
    cramersV(Tables.events(spark, dir), "event_type", "ts")

  /** Mutual information (nats) between group and weekday on the same
    * contingency table — the information-theoretic complement of
    * [[cramersV]] (V measures departure from independence in χ² units;
    * MI measures it in shared-information units, the quantity a
    * feature-selection pass ranks by): MI = Σ p(t,d)·ln(p(t,d)/(p(t)
    * p(d))), with the marginal entropies H(row), H(col) and the
    * normalized NMI = MI/min(H_r, H_c). Same one-pass shape as
    * [[cramersV]]: 7 conditional counts per group, margins as windows
    * over the bounded frame; every ln term is nano-rounded to an exact
    * long (the [[valueEntropy]] recipe — ln is the one libm call that
    * may differ a ulp across engines, and the rounding absorbs it), so
    * all sums are order-free exact longs. Zero cells contribute 0 by
    * the o > 0 gate; a degenerate margin yields NULL nmi, never /0. */
  def mutualInfo(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    val withM = dowContingency(df, typeCol, tsCol)
    def dd(c: Column) = c.cast("double")
    def nano(c: Column) = floor(c * lit(1e9) + lit(0.5)).cast("long")
    // per-cell MI term (o/n)·ln(o·n/(r·c)), nano-rounded per dow so the
    // per-group 7-term sum and the cross-group sum are exact longs
    def miTerm(d: Int) =
      when(col(s"o$d") > 0L,
        nano((dd(col(s"o$d")) / dd(col("n"))) *
          log(dd(col(s"o$d")) * dd(col("n")) /
            (dd(col("__r")) * dd(col(s"c$d")))))).otherwise(lit(0L))
    val miNano = (0 to 6).map(miTerm).reduceLeft(_ + _)
    // a zero-mass group (__r = 0) contributes 0 entropy — ungated,
    // Spark's log(0) reads NULL while DuckDB's ln(0) reads -inf
    val hRowNano = when(col("__r") > 0L,
      nano(-(dd(col("__r")) / dd(col("n"))) *
        log(dd(col("__r")) / dd(col("n"))))).otherwise(lit(0L))
    def hColTerm(d: Int) =
      when(col(s"c$d") > 0L,
        nano(-(dd(col(s"c$d")) / dd(col("n"))) *
          log(dd(col(s"c$d")) / dd(col("n"))))).otherwise(lit(0L))
    val hColNano = (0 to 6).map(hColTerm).reduceLeft(_ + _)
    val g = withM
      .select(col("n"), miNano.as("mi_n"), hRowNano.as("hr_n"),
        hColNano.as("hc_n"))
      .agg(max(col("n")).as("n"), count(lit(1)).as("r_levels"),
        sum(col("mi_n")).as("mi_nano"), sum(col("hr_n")).as("hr_nano"),
        max(col("hc_n")).as("hc_nano"))
    def d(s: String) = col(s).cast("double")
    val hMin = least(col("hr_nano"), col("hc_nano"))
    g.select(col("n"), col("r_levels"),
      rnd(d("mi_nano") / 1e9, 6).as("mi"),
      rnd(d("hr_nano") / 1e9, 6).as("h_row"),
      rnd(d("hc_nano") / 1e9, 6).as("h_col"),
      rnd(when(hMin > 0L, d("mi_nano") / hMin.cast("double")), 4)
        .as("nmi"))
  }

  def qMutualInfo(spark: SparkSession, dir: String): DataFrame =
    mutualInfo(Tables.events(spark, dir), "event_type", "ts")

  /** Kaplan–Meier survival curve for time-to-first-`eventType` with
    * right censoring — THE conversion statistic naive averages get
    * wrong (users who haven't converted by the window end aren't
    * "never"; dropping them biases time-to-convert down, any finite
    * placeholder biases it up): entry = first activity of any type,
    * event = first `eventType` day (duration = event − entry),
    * censored at the horizon (global max day) otherwise. S(t) =
    * Π_{u ≤ t} (1 − d_u/n_u) over the duration grid — the survival
    * complement of q_funnel_timebound's fixed-window conversion. Swap
    * the event predicate for an inactivity test and the same plan is
    * the churn curve.
    *
    * Cross-engine discipline: d, c, n_risk are exact integers; each
    * factor's ln((n−d)/n) is a libm call on an identical double and is
    * nano-rounded to an exact long (the [[valueEntropy]] recipe), so
    * the cumulative log-survival is an exact long window sum; the one
    * remaining libm step is exp() on that identical double, whose
    * ≤ 1-ulp spread sits 10⁻¹² below the 1e-4 output round. A step
    * where everyone at risk converts (d = n) zeroes survival from that
    * duration on via the zcum counter, never an ln(0).
    *
    * Scale: the per-user entry/event rollup is the only fact-volume
    * pass; the duration grid is bounded by the CALENDAR (≤ span days),
    * so the risk/cumulative windows over it are metadata-scale. */
  def kaplanMeier(df: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, eventType: String): DataFrame = {
    val base = df.select(col(userCol).as("u"), dayOf(tsCol).as("day"),
      (col(typeCol) === eventType).cast("long").as("hit"))
    val users = base.groupBy("u").agg(
      min(col("day")).as("t0"),
      min(when(col("hit") === 1L, col("day"))).as("tp"),
      max(col("day")).as("dmax"))
    val hz = users.agg(max(col("dmax")).as("hz"))
    val timed = users.crossJoin(broadcast(hz))
      .select(col("u"),
        when(col("tp").isNotNull, 1L).otherwise(0L).as("ev"),
        when(col("tp").isNotNull, datediff(col("tp"), col("t0")))
          .otherwise(datediff(col("hz"), col("t0"))).cast("long").as("t"))
    val grid = timed.groupBy("t")
      .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c"))
    val wRisk = Window.orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risked = grid
      .withColumn("n_risk", sum(col("d") + col("c")).over(wRisk))
      .withColumn("tn",
        when(col("d") < col("n_risk"),
          floor(log((col("n_risk") - col("d")).cast("double") /
            col("n_risk").cast("double")) * lit(1e9) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("z", when(col("d") === col("n_risk"), 1L).otherwise(0L))
    risked
      .withColumn("snano", sum(col("tn")).over(wCum))
      .withColumn("zcum", sum(col("z")).over(wCum))
      .filter(col("d") > 0L)
      .select(col("t").as("duration_days"), col("n_risk"),
        col("d").as("d_churned"), col("c").as("c_censored"),
        when(col("zcum") > 0L, lit(0.0))
          .otherwise(rnd(exp(col("snano").cast("double") / 1e9), 4))
          .as("survival"))
  }

  /** Time-to-first-purchase conversion curve. The synthetic fixture
    * fully converts (every user purchases within the window), so
    * c_censored reads 0 here; the censoring path is exercised by the
    * StatSpec hand walk. */
  def qKaplanMeier(spark: SparkSession, dir: String): DataFrame =
    kaplanMeier(Tables.events(spark, dir), "user_id", "ts",
      "event_type", "purchase")
      .orderBy("duration_days")

  /** Brown–Forsythe variance-equality test across ALL groups — "do the
    * k groups differ in SPREAD" (the dispersion complement of
    * [[kruskalWallis]]'s location test, and the assumption check
    * before pooling variances): the Levene statistic with MEDIAN
    * centering, W = ((N−k)/(k−1)) · between/within over the absolute
    * deviations. Deviations are held EXACT by working on the DOUBLED
    * scale: 2·median of integer cents is lower+upper interpolant —
    * an exact integer off the distinct-cents grid (cumulative-count
    * positions (n+1) div 2 and n div 2 + 1) — so z = |2c − 2med| is an
    * exact integer and the scale factor cancels in the ratio. Per-group
    * (Σz)²/n terms are rounded to binary 2⁻¹⁰ units for an order-free
    * exact cross-group sum (the [[kruskalWallis]] recipe); `between`
    * is clamped at 0 (equal-spread groups can land 2⁻¹¹ negative).
    * `significant` compares the ROUNDED W against the asymptotic
    * F(k−1, ∞) = χ²(k−1)/(k−1) critical value from [[Chi2Crit05]],
    * gated on dof2 ≥ 120 where the asymptote holds to ~2% — outside
    * the table or the gate the flag is NULL, never wrong.
    *
    * Scale: everything lives on the value-RESOLUTION-bounded grid
    * (the KS/KW class); the cumulative and conditional-min windows
    * partition per group over that grid. Long-exactness: Σc·z² ≤
    * n·(2·maxcents)² and the 2⁻¹⁰-scaled (Σz)²/n ≤ 1024·n·(2·maxcents)²
    * — BIGINT-exact to ~2·10⁵ rows at cent range 10⁵; decimal(38,0)
    * is the named widen. */
  def brownForsythe(df: DataFrame, typeCol: String,
                    valCol: String): DataFrame = {
    val ev = df.filter(col(valCol).isNotNull)
      .select(col(typeCol).as("grp"), centsOf(valCol).as("cents"))
    val cell = ev.groupBy("grp", "cents").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("grp").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("grp")
    val g2 = cell
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n_g", sum(col("c")).over(wAll))
      .withColumn("lo", min(when(col("cum") >= expr("(n_g + 1) div 2"),
        col("cents"))).over(wAll))
      .withColumn("hi", min(when(col("cum") >= expr("n_g div 2 + 1"),
        col("cents"))).over(wAll))
      .withColumn("z", abs(lit(2L) * col("cents") - (col("lo") + col("hi"))))
    val per = g2.groupBy("grp").agg(
      max(col("n_g")).as("n_g"),
      sum(col("c") * col("z")).as("sz"),
      sum(col("c") * col("z") * col("z")).as("szz"))
    val termInt = floor(col("sz").cast("double") * col("sz").cast("double") /
      col("n_g").cast("double") * 1024.0 + 0.5).cast("long")
    val a = per
      .select(col("n_g"), col("sz"), col("szz"), termInt.as("term_i"))
      .agg(sum(col("n_g")).as("n"), count(lit(1)).as("k_groups"),
        sum(col("sz")).as("s_all"), sum(col("szz")).as("szz_all"),
        sum(col("term_i")).as("sum_terms"))
    def d(c: Column) = c.cast("double")
    val nD = d(col("n"))
    val kD = d(col("k_groups"))
    val terms = d(col("sum_terms")) / 1024.0
    val between = greatest(lit(0.0),
      terms - d(col("s_all")) * d(col("s_all")) / nD)
    val within = d(col("szz_all")) - terms
    val w = rnd(when(col("k_groups") >= 2L && col("n") > col("k_groups") &&
      within > 0.0,
      (between / (kD - 1.0)) / (within / (nD - kD))), 4)
    val dof1 = col("k_groups") - lit(1L)
    val dof2 = col("n") - col("k_groups")
    a.select(col("n"), col("k_groups"), w.as("w"),
      dof1.as("dof1"), dof2.as("dof2"),
      when(dof2 < 120L, lit(null).cast("boolean")).otherwise(
        (1 to 6).foldLeft(lit(null).cast("boolean")) { (acc, k) =>
          when(dof1 === k.toLong, w > lit(Chi2Crit05(k) / k)).otherwise(acc)
        }).as("significant"))
  }

  def qBrownForsythe(spark: SparkSession, dir: String): DataFrame =
    brownForsythe(Tables.events(spark, dir), "event_type", "value")

  /** χ² critical values at α = 0.05 for dof 1..6 — the Kruskal–Wallis
    * `significant` flag looks its dof up here (k is DATA-dependent,
    * unlike the structurally-fixed chi-square dow test — review r13:
    * a hardwired dof=4 silently reported FALSE for any other group
    * count); dof outside the table yields a NULL flag, never a wrong
    * one. */
  val Chi2Crit05: Map[Int, Double] = Map(
    1 -> 3.8415, 2 -> 5.9915, 3 -> 7.8147,
    4 -> 9.4877, 5 -> 11.0705, 6 -> 12.5916)

  /** Kruskal–Wallis one-way rank test across ALL groups — "do the k
    * value distributions differ anywhere" (the k-sample complement of
    * the two-sample KS): H from pooled average ranks with the tie
    * correction 1 − Σ(t³−t)/(N³−N). Ranks come from the VALUE GRID,
    * not a row window: on the distinct-cents grid with per-cell totals
    * t, 2·avgRank(cell) = 2·cumBefore + t + 1 — an exact integer — so
    * the per-group rank sums 2R_g are exact integer folds and no
    * row-grain ranking window exists at all. The one float step before
    * the final H expression is Σ_g R_g²/n_g, whose per-group terms are
    * rounded to 2⁻¹⁰ units (a POWER-OF-TWO scale, so the multiply is
    * IEEE-exact on both engines) before an order-free exact long sum —
    * per-group error ≤ 2⁻¹¹ against a statistic scaled by 12/N², far
    * below the 1e-4 output round for any N ≥ 30. `significant`
    * compares the ROUNDED H against the [[Chi2Crit05]] critical value
    * for the observed dof (NULL past the table — never a wrong flag;
    * the chi-square flag discipline).
    *
    * Scale: both aggregates live on the value-RESOLUTION-bounded grid
    * (distinct cents ≤ range·100 rows regardless of corpus size); the
    * cumulative window runs over that single bounded grid — metadata
    * scale, same class as the KS grid. Long-exactness: the scaled term
    * ≈ 256·n_g·N² holds in BIGINT to N ~ 2·10⁵ rows; decimal(38,0) is
    * the named widen (the term doubles themselves are fine — their
    * 1e-16 relative error is shared by both engines). All-tied input
    * ⇒ correction 0 ⇒ NULL H. */
  def kruskalWallis(df: DataFrame, typeCol: String,
                    valCol: String): DataFrame = {
    val ev = df.filter(col(valCol).isNotNull)
      .select(col(typeCol).as("grp"), centsOf(valCol).as("cents"))
    val cell = ev.groupBy("cents", "grp").agg(count(lit(1)).as("c"))
    val grid = cell.groupBy("cents").agg(sum(col("c")).as("t"))
    // exclusive prefix over the bounded grid: ranks strictly below cents
    val wCum = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    val g2 = grid.withColumn("cumbefore",
      coalesce(sum(col("t")).over(wCum), lit(0L)))
    val per = cell.join(g2, "cents")
      .select(col("grp"), col("c"),
        (lit(2L) * col("cumbefore") + col("t") + lit(1L)).as("r2"))
      .groupBy("grp")
      .agg(sum(col("c")).as("n_g"), sum(col("c") * col("r2")).as("r2sum"))
    // per-group double term R_g²/n_g = r2sum²/(4·n_g), rounded to
    // 2⁻¹⁰ units (binary-exact scaling) so the cross-group sum is an
    // order-free exact long sum
    val termInt = floor(col("r2sum").cast("double") * col("r2sum").cast("double") /
      (lit(4.0) * col("n_g").cast("double")) * 1024.0 + 0.5).cast("long")
    val agg = per
      .select(col("n_g"), termInt.as("term_i"))
      .agg(sum(col("n_g")).as("n"), count(lit(1)).as("k_groups"),
        sum(col("term_i")).as("sum_terms"))
    val ties = g2.agg(
      sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
    def d(c: Column) = c.cast("double")
    val hRaw = lit(12.0) * (d(col("sum_terms")) / 1024.0) /
      (d(col("n")) * (d(col("n")) + 1.0)) - lit(3.0) * (d(col("n")) + 1.0)
    // the gate must be division-free (the runsTest r13 rule, applied
    // here by review r16): corr > 0 ⟺ n³−n > tie3 as exact integers —
    // the old predicate computed tie3/(n³−n) eagerly, which is 0/0 at
    // n = 1 (single non-null row) where ANSI Spark throws and DuckDB
    // yields NaN. n³ stays long-exact to n ~ 2·10⁶; past that, widen
    // to decimal(38,0) (the gini Scaladoc's named swap).
    val n3n = col("n") * col("n") * col("n") - col("n")
    val corr = lit(1.0) - d(col("tie3")) / d(n3n)
    val h = rnd(when(n3n > col("tie3"), hRaw / corr), 4)
    val sig = (1 to 6).foldLeft(lit(null).cast("boolean")) { (acc, k) =>
      when(col("dof") === k.toLong, col("h") > Chi2Crit05(k)).otherwise(acc)
    }
    agg.crossJoin(broadcast(ties))
      .select(col("n"), col("k_groups"), h.as("h"),
        (col("k_groups") - lit(1L)).as("dof"))
      .withColumn("significant", sig)
  }

  def qKruskalWallis(spark: SparkSession, dir: String): DataFrame =
    kruskalWallis(Tables.events(spark, dir), "event_type", "value")

  /** Effect size between the month's halves per group — the "HOW BIG is
    * the shift" companion to the ks/psi/ab significance tests (at 100 TB
    * everything is significant; only effect size tells you whether to
    * care): Cliff's δ = (#(a>b) − #(a<b)) / (n_a·n_b) computed EXACTLY
    * on the distinct-cents grid — #(a>b) = Σ_v ca(v)·cumB_strictly_below(v)
    * is an exact integer fold, no pair join — plus Cohen's d from the
    * shared exact-cent moment helpers ([[meanFromCents]]/[[varFromCents]]).
    * `magnitude` labels |δ| by the Romano thresholds comparing the
    * ROUNDED δ (the chi-square flag discipline).
    *
    * Scale: the same value-RESOLUTION-bounded grid as [[ksTest]] — the
    * cumulative window runs over ≤ range·100 rows per group no matter
    * the corpus; one fact-grain pass. Long-exactness: the pair counts
    * are ≤ n_a·n_b — exact to ~3·10⁹ rows per side per group. */
  def effectSize(df: DataFrame, typeCol: String, tsCol: String,
                 valCol: String, splitDay: Int): DataFrame = {
    val grid = df
      .filter(col(valCol).isNotNull)
      .select(col(typeCol).as("event_type"),
        when(dayofmonth(dayOf(tsCol)) <= splitDay, 1L).otherwise(0L).as("ina"),
        centsOf(valCol).as("cents"))
      .groupBy("event_type", "cents")
      .agg(sum(col("ina")).as("ca"), sum(lit(1L) - col("ina")).as("cb"),
        sum(col("ina") * col("cents")).as("sca"),
        sum((lit(1L) - col("ina")) * col("cents")).as("scb"),
        sum(col("ina") * col("cents") * col("cents")).as("sqa"),
        sum((lit(1L) - col("ina")) * col("cents") * col("cents")).as("sqb"))
    val wBelow = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wUpto = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    val g = grid
      .withColumn("cb_below", coalesce(sum(col("cb")).over(wBelow), lit(0L)))
      .withColumn("cb_upto", sum(col("cb")).over(wUpto))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .groupBy("event_type")
      .agg(sum(col("ca")).as("n_a"), max(col("nb")).as("n_b"),
        sum(col("ca") * col("cb_below")).as("gt"),
        sum(col("ca") * (col("nb") - col("cb_upto"))).as("lt"),
        sum(col("sca")).as("sca"), sum(col("scb")).as("scb"),
        sum(col("sqa")).as("sqa"), sum(col("sqb")).as("sqb"))
    def d(s: String) = col(s).cast("double")
    val delta = rnd(when(col("n_a") > 0L && col("n_b") > 0L,
      (d("gt") - d("lt")) / (d("n_a") * d("n_b"))), 4)
    val varA = varFromCents(col("n_a"), col("sca"), col("sqa"))
    val varB = varFromCents(col("n_b"), col("scb"), col("sqb"))
    val sdPooled = sqrt(
      ((d("n_a") - 1.0) * varA + (d("n_b") - 1.0) * varB) /
        (d("n_a") + d("n_b") - 2.0))
    val cohensD = rnd(when(col("n_a") > 1L && col("n_b") > 1L && sdPooled > 0.0,
      (meanFromCents(col("n_a"), col("sca")) -
        meanFromCents(col("n_b"), col("scb"))) / sdPooled), 4)
    g.select(col("event_type"), col("n_a"), col("n_b"),
      delta.as("cliffs_delta"), cohensD.as("cohens_d"))
      .withColumn("magnitude",
        when(col("cliffs_delta").isNull, lit(null).cast("string"))
          .when(abs(col("cliffs_delta")) < 0.147, "negligible")
          .when(abs(col("cliffs_delta")) < 0.33, "small")
          .when(abs(col("cliffs_delta")) < 0.474, "medium")
          .otherwise("large"))
  }

  def qEffectSize(spark: SparkSession, dir: String): DataFrame =
    effectSize(Tables.events(spark, dir), "event_type", "ts", "value", 15)
      .orderBy("event_type")

  /** Lead–lag cross-correlation between two event series — "does series
    * A lead series B by k days": Pearson r of (x_{t−k}, y_t) over daily
    * counts for k = 0..maxLag, the cross-series member of the
    * [[autocorr]] family (the shared [[laggedPearson]] fold). The day
    * spine is the COMPLETE CALENDAR between the first and last active
    * day of either series (sequence over the min/max bounds) — a
    * row-based lag over only-active days would pair values k ROWS
    * apart, not k DAYS apart, and silently mis-answer the lead
    * question whenever both series go dark together (review r13);
    * absent days count 0 on both sides.
    *
    * Scale: two filtered branches of ONE daily rollup joined onto the
    * calendar spine at the DAY grain; the lag window runs over the
    * single day-grain series (#days rows — metadata scale; the one
    * unpartitioned window is bounded by the calendar, not the
    * corpus). Scan count is pinned in PlanSpec. */
  def crossCorr(df: DataFrame, typeCol: String, tsCol: String,
                typeA: String, typeB: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 0, s"crossCorr: maxLag must be >= 0 (got $maxLag)")
    val daily = df
      .filter(col(typeCol).isin(typeA, typeB))
      .select(col(typeCol).as("t"), dayOf(tsCol).as("day"))
      .groupBy("day", "t").agg(count(lit(1)).as("c"))
    val xa = daily.filter(col("t") === typeA).select(col("day"), col("c").as("x"))
    val yb = daily.filter(col("t") === typeB).select(col("day"), col("c").as("y"))
    val j = xa.join(yb, Seq("day"), "full_outer")
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val full = spine.join(j, Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
    laggedPearson(full, partCols = Seq(), ordCol = "day", lags = 0 to maxLag)
  }

  def qCrossCorr(spark: SparkSession, dir: String): DataFrame =
    crossCorr(Tables.events(spark, dir), "event_type", "ts",
      "click", "purchase")
      .orderBy("lag")

  /** One-way ANOVA F over the group means — the parametric sibling of
    * [[kruskalWallis]] (KW asks "do the DISTRIBUTIONS differ" rank-wise;
    * F asks "do the MEANS differ relative to within-group spread") with
    * the η² effect size ([[effectSize]]'s d is the two-group special
    * case). All sums are exact integer cents: per group (n, Σc, Σc²),
    * the between-groups term Σ_g (Σc_g)²/n_g folds each group's ONE
    * mirrored double computation rounded to an exact long at the
    * cent² unit (the valueEntropy order-free idiom — group iteration
    * order can never move a bit; the double s·s is exact only below
    * 2⁵³ but is the SAME IEEE value on both engines at any size, so
    * parity never depends on exactness), and F/η² are mirrored
    * fixed-order doubles. No significance flag:
    * the F critical value depends on the OBSERVED dof pair, and a
    * hardwired fixture dof reports silently-wrong booleans on other
    * inputs (the chi-square crit lesson) — η² carries the dof-free
    * Cohen band instead. NULL group keys and NULL values are excluded
    * explicitly, mirrored in SQL.
    *
    * Scale: one fact-volume pass onto the (group)-grain grid, then a
    * constant-width rollup — the chi-square shape. Overflow bound:
    * the long-rounded term needs (Σc_g)²/n_g < 2⁶³, i.e. group cent
    * sums under ~3·10⁹·√n_g — ~3·10⁷ uniform fixture-scale rows, far
    * more in practice since n grows with Σc; past that the term and
    * Σc² widen to decimal(38,0). The sub-cent² residue the rounding
    * drops is ≤ 0.5·k against SS magnitudes of n·Var — invisible at
    * the 4/6-dp output grain. */
  def anovaF(df: DataFrame, typeCol: String, valCol: String): DataFrame = {
    val grid = df.filter(col(valCol).isNotNull && col(typeCol).isNotNull)
      .select(col(typeCol).as("event_type"), centsOf(valCol).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("q"))
    def d(c: Column) = c.cast("double")
    val term = floor(d(col("s")) * d(col("s")) / d(col("n")) + 0.5)
      .cast("long")
    val g = grid
      .select(col("n"), col("s"), col("q"), term.as("t"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
        sum(col("s")).as("tt"), sum(col("q")).as("qq"),
        sum(col("t")).as("bsum"))
    val grand = d(col("tt")) * d(col("tt")) / d(col("nn"))
    val ssb = d(col("bsum")) - grand
    val sst = d(col("qq")) - grand
    val ssw = d(col("qq")) - d(col("bsum"))
    val f = when(col("k") > 1L && col("nn") > col("k") && ssw > 0.0,
      (ssb / (d(col("k")) - 1.0)) / (ssw / (d(col("nn")) - d(col("k")))))
    val eta2 = rnd(when(col("k") > 1L && sst > 0.0, ssb / sst), 6)
    g.select(col("k").as("k_groups"), col("nn").as("n"),
      rnd(f, 4).as("f_stat"), eta2.as("eta2"),
      when(eta2.isNull, lit(null).cast("string"))
        .when(eta2 < 0.01, "negligible").when(eta2 < 0.06, "small")
        .when(eta2 < 0.14, "medium").otherwise("large").as("strength"))
  }

  def qAnovaF(spark: SparkSession, dir: String): DataFrame =
    anovaF(Tables.events(spark, dir), "event_type", "value")

  /** Third/fourth standardized moments per group — skewness g₁ and
    * excess kurtosis g₂, the distribution-SHAPE profile beside the
    * location/spread pair every baseline tracks (a drifting tail shows
    * up here before the mean moves): raw power sums of exact integer
    * cents (Σc and Σc² as BIGINT; Σc³ and Σc⁴ as decimal(38,0) —
    * c⁴ ≤ 10²⁰ per row overflows BIGINT immediately), central moments
    * by the standard raw-moment expansion in ONE mirrored fixed-order
    * double expression each, then g₁ = m₃/m₂^1.5, g₂ = m₄/m₂² − 3.
    * Cross-engine: Spark's decimal(38,0)→double and DuckDB's
    * HUGEINT→double both round the SAME exact integer to
    * nearest-double, so the inputs to the float path are bit-identical.
    * Zero-variance groups report NULL shape (m₂ gate).
    *
    * Scale: one fact-volume aggregate of six constant-width partials —
    * the PartialAgg shape; decimal partials are mergeable exactly like
    * longs. Σc⁴ stays inside 38 digits to ~10¹⁷ rows per group. */
  def momentProfile(df: DataFrame, typeCol: String,
                    valCol: String): DataFrame = {
    val cd = centsOf(valCol).cast("decimal(38,0)")
    val g = df.filter(col(valCol).isNotNull && col(typeCol).isNotNull)
      .select(col(typeCol).as("event_type"), centsOf(valCol).as("c"),
        (cd * cd * cd).as("c3"), (cd * cd * cd * cd).as("c4"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"),
        sum(col("c3")).as("s3"), sum(col("c4")).as("s4"))
    def d(c: Column) = c.cast("double")
    val n = d(col("n"))
    val mu = d(col("s1")) / n
    val m2 = d(col("s2")) / n - mu * mu
    val m3 = d(col("s3")) / n - lit(3.0) * mu * (d(col("s2")) / n) +
      lit(2.0) * mu * mu * mu
    val m4 = d(col("s4")) / n - lit(4.0) * mu * (d(col("s3")) / n) +
      lit(6.0) * mu * mu * (d(col("s2")) / n) - lit(3.0) * mu * mu * mu * mu
    g.select(col("event_type"), col("n"),
      rnd(mu / 100.0, 4).as("mean_value"),
      rnd(when(m2 > 0.0, m3 / sqrt(m2 * m2 * m2)), 4).as("skewness"),
      rnd(when(m2 > 0.0, m4 / (m2 * m2) - 3.0), 4).as("excess_kurtosis"))
  }

  def qMomentProfile(spark: SparkSession, dir: String): DataFrame =
    momentProfile(Tables.events(spark, dir), "event_type", "value")
      .orderBy("event_type")

  /** Conditional entropy of the user-journey transition graph — for
    * each `prev` state, H(next | prev) over the SAME lag-1 transition
    * counts q_transition_matrix reports (one definition of "transition":
    * per-user (ts, id)-ordered lag): how PREDICTABLE is the next step
    * from here, with perplexity exp(H) as the branching-factor read a
    * curriculum/session model wants. Every term −p·ln p is nano-rounded
    * to an exact long on the bounded (prev, next) grid (the
    * valueEntropy idiom), so the per-prev fold is order-free; H and
    * exp(H) are one mirrored double expression each.
    *
    * Scale: the transition pairs are one per-user window at event
    * grain (the transition_matrix shape); everything after lives on
    * the (type × type)-bounded grid. */
  def markovEntropy(df: DataFrame, userCol: String, typeCol: String,
                    tsCol: String, idCol: String): DataFrame = {
    val pairs = transitionPairs(df, userCol, typeCol, tsCol, idCol)
    val wPrev = Window.partitionBy("prev")
    val p = col("n").cast("double") / col("tot").cast("double")
    val termNano = floor(-(p * log(p)) * 1e9 + 0.5).cast("long")
    pairs
      .withColumn("tot", sum(col("n")).over(wPrev))
      .select(col("prev"), col("tot"), termNano.as("t"))
      .groupBy("prev")
      .agg(max(col("tot")).as("n_transitions"),
        count(lit(1)).as("n_next_types"),
        sum(col("t")).as("snano"))
      .select(col("prev"), col("n_transitions"), col("n_next_types"),
        rnd(col("snano").cast("double") / 1e9, 6).as("entropy"),
        rnd(exp(col("snano").cast("double") / 1e9), 4).as("perplexity"))
  }

  def qMarkovEntropy(spark: SparkSession, dir: String): DataFrame =
    markovEntropy(Tables.events(spark, dir), "user_id", "event_type",
      "ts", "event_id")
      .orderBy("prev")

  /** Local-peak audit of the per-day count series — how many days are
    * strict local maxima (busier than BOTH neighbours), the burstiness
    * SHAPE read beside [[dispersionIndex]]'s magnitude (D says "over-
    * dispersed"; peaks say whether that is one campaign spike or a
    * sawtooth): computed over the COMPLETE calendar spine (observed-only
    * days would compare k ROWS apart, not adjacent days — the crosscorr
    * spine rule), zero-filled, endpoints excluded by the strict
    * two-sided test (a NULL neighbour comparison coalesces to false).
    * Exact integer comparisons throughout; NULL group keys excluded
    * (the spine-join rule).
    *
    * Scale: the [[dailyCounts]] rollup is the only fact-volume pass;
    * the spine windows run at calendar scale per group. */
  def peakDetection(df: DataFrame, typeCol: String,
                    tsCol: String): DataFrame = {
    val full = zeroFilledDaily(df.filter(col(typeCol).isNotNull),
      typeCol, tsCol)
    val w = Window.partitionBy("event_type").orderBy("day")
    val pk = coalesce(
      col("x") > lag(col("x"), 1).over(w) &&
        col("x") > lead(col("x"), 1).over(w), lit(false))
    full
      .withColumn("pk", pk)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("pk"), 1L).otherwise(0L)).as("n_peaks"),
        max(when(col("pk"), col("x"))).as("max_peak"))
      .select(col("event_type"), col("n_days"), col("n_peaks"),
        col("max_peak"),
        rnd(col("n_peaks").cast("double") / col("n_days").cast("double"), 4)
          .as("peak_share"))
  }

  def qPeakDetection(spark: SparkSession, dir: String): DataFrame =
    peakDetection(Tables.events(spark, dir), "event_type", "ts")
      .orderBy("event_type")

  /** Kendall τ-b of daily counts against time — the EFFECT SIZE
    * companion to [[mannKendall]] (MK's z says whether a monotone
    * trend exists; τ-b says HOW MONOTONE on [−1, 1], tie-adjusted):
    * τ-b = S / √((n₀ − t_x)·n₀) with S the MK pair statistic, n₀ =
    * n(n−1)/2 and t_x = Σ t(t−1)/2 over tied daily counts (days are
    * unique so the time-side tie term is zero). S, n₀, t_x are EXACT
    * integers off the same day-grain pair join as MK; τ is one
    * mirrored fixed-order double. All-tied series (n₀ = t_x) NULL.
    * NULL group keys excluded (the MK rule).
    *
    * Scale: the mannKendall shape verbatim — day-grain pair join and
    * tie rollup, metadata scale regardless of corpus size. */
  def kendallTau(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    val daily = dailyCounts(df.filter(col(typeCol).isNotNull),
      typeCol, tsCol)
    val s = dayPairs(df, typeCol, tsCol)
      .groupBy("event_type")
      .agg(sum(signum(col("x2") - col("x1")).cast("long")).as("s"))
    val ties = daily.groupBy("event_type", "x")
      .agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(sum(col("t")).as("n_days"),
        sum(col("t") * (col("t") - lit(1L))).as("tx2"))
    val j = ties.join(s, Seq("event_type"), "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
    val n = col("n_days")
    val n02 = n * (n - lit(1L)) // 2·n₀ — kept doubled so all terms stay integral
    def d(c: Column) = c.cast("double")
    val tau = rnd(when(n02 > col("tx2"),
      d(col("s")) * 2.0 / sqrt(d(n02 - col("tx2")) * d(n02))), 4)
    j.select(col("event_type"), col("n_days"), col("s"), tau.as("tau"))
  }

  def qKendallTau(spark: SparkSession, dir: String): DataFrame =
    kendallTau(Tables.events(spark, dir), "event_type", "ts")
      .orderBy("event_type")

  /** Weekly Fourier coefficients for [[weeklyPower]] — cos/sin of
    * 2πk/7 computed ONCE by the Scala runtime and interpolated into
    * BOTH engines as shortest-round-trip literals (the benfordP
    * precedent): zero trig calls at query time, so cross-engine libm
    * drift cannot exist. */
  private[queries] def weeklyCos(k: Int): Double = math.cos(2.0 * math.Pi * k / 7.0)
  private[queries] def weeklySin(k: Int): Double = math.sin(2.0 * math.Pi * k / 7.0)

  /** Spectral power at the weekly frequency per group — the
    * periodogram twin of q_seasonality_strength (that one fits dow
    * MEANS; this projects the day series onto the period-7 Fourier
    * pair, catching weekly structure even when the shape within the
    * week shifts): over the zero-filled calendar day series with
    * t = days since the group's first day, the MEAN-CENTERED
    * projections a = Σ (x−x̄)·cos(2πt/7) and b = Σ (x−x̄)·sin(2πt/7)
    * — computed one-pass via a = Σx·cos − x̄·Σcos (review r16: the
    * raw-count projection leaked the series mean through the
    * non-orthogonal DC component whenever the calendar span is not a
    * multiple of 7, inflating weekly_share 2-900× on the fixture and
    * labeling near-constant noise "strong"; centering removes the
    * leak exactly). Each product term is an exact integer count (or
    * the bare coefficient, for the Σcos/Σsin legs) times one of SEVEN
    * interpolated literal coefficients ([[weeklyCos]]), micro-rounded
    * to an exact long so the fold is order-free — and weekly_share =
    * 2·(a² + b²)/n against the series' total sum of squared
    * deviations, in [0, 1] up to spectral leakage. Flat series (zero
    * variance) NULL.
    *
    * Scale: dailyCounts is the only fact-volume pass; the projection
    * and moment fold run at calendar scale per group. */
  def weeklyPower(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    val full = zeroFilledDaily(df.filter(col(typeCol).isNotNull),
      typeCol, tsCol)
    val wT = Window.partitionBy("event_type")
    val t = datediff(col("day"), min(col("day")).over(wT))
    val k = pmod(t, lit(7))
    def coefSum(cf: Int => Double): Column = {
      // 7-branch when chain over the MATERIALIZED k column (the window
      // expression itself cannot appear inside the aggregate); k = t
      // mod 7 always matches exactly one branch
      val term = (1 to 6).foldLeft(
        when(col("k") === 0, col("x").cast("double") * lit(cf(0)))) {
        (acc, i) =>
          acc.when(col("k") === i, col("x").cast("double") * lit(cf(i)))
      }
      sum(floor(term * 1e6 + 0.5).cast("long"))
    }
    // the bare-coefficient sums Σcos / Σsin over the group's calendar
    // days — the exact DC-overlap terms the centering subtracts
    def coefConst(cf: Int => Double): Column = {
      val term = (1 to 6).foldLeft(
        when(col("k") === 0, lit(cf(0)))) {
        (acc, i) => acc.when(col("k") === i, lit(cf(i)))
      }
      sum(floor(term * 1e6 + 0.5).cast("long"))
    }
    val g = full
      .select(col("event_type"), col("x"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        coefSum(weeklyCos).as("amicro"), coefSum(weeklySin).as("bmicro"),
        coefConst(weeklyCos).as("cmicro"), coefConst(weeklySin).as("smicro"))
    def d(c: Column) = c.cast("double")
    val xbar = d(col("sx")) / d(col("n"))
    val a = d(col("amicro")) / 1e6 - xbar * (d(col("cmicro")) / 1e6)
    val b = d(col("bmicro")) / 1e6 - xbar * (d(col("smicro")) / 1e6)
    val sse = d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("n"))
    val share = rnd(when(sse > 0.0,
      (a * a + b * b) * 2.0 / d(col("n")) / sse), 4)
    g.select(col("event_type"), col("n").as("n_days"),
      rnd(a, 4).as("a7"), rnd(b, 4).as("b7"), share.as("weekly_share"),
      when(share.isNull, lit(null).cast("string"))
        .when(share >= 0.3, "strong").when(share >= 0.1, "moderate")
        .otherwise("weak").as("periodicity"))
  }

  def qWeeklyPower(spark: SparkSession, dir: String): DataFrame =
    weeklyPower(Tables.events(spark, dir), "event_type", "ts")
      .orderBy("event_type")

  /** Pearson correlation matrix of the per-type daily count series —
    * the portfolio view [[crossCorr]] gives one pair of: every
    * unordered type pair's co-movement on the GLOBAL calendar spine
    * (all series zero-filled over the same day range, so pairs align
    * even when one type goes dark). Six exact integer sums per pair
    * feed the same fixed-order Pearson fold as [[laggedPearson]];
    * zero-variance series NULL against every partner.
    *
    * Scale: one fact-volume rollup to the day grain; the spine
    * cross-join and the pair join both live at (types × days) /
    * (types² × days) metadata scale. */
  def dayCorrMatrix(df: DataFrame, typeCol: String,
                    tsCol: String): DataFrame = {
    val daily = dailyCounts(df.filter(col(typeCol).isNotNull),
      typeCol, tsCol)
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = bounds.select(explode(expr("sequence(d0, d1)")).as("day"))
    val types = daily.select(col("event_type")).distinct()
    val grid = types.crossJoin(spine)
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("x"), lit(0L)).as("x"))
    val pairs = grid.select(col("event_type").as("type_a"),
        col("day"), col("x").as("xa"))
      .join(grid.select(col("event_type").as("type_b"), col("day"),
        col("x").as("xb")), Seq("day"))
      .filter(col("type_a") < col("type_b"))
    val g = pairs.groupBy("type_a", "type_b").agg(
      count(lit(1)).as("n"),
      sum(col("xa")).as("sa"), sum(col("xb")).as("sb"),
      sum(col("xa") * col("xb")).as("sab"),
      sum(col("xa") * col("xa")).as("saa"),
      sum(col("xb") * col("xb")).as("sbb"))
    def d(s: String) = col(s).cast("double")
    val varA = d("n") * d("saa") - d("sa") * d("sa")
    val varB = d("n") * d("sbb") - d("sb") * d("sb")
    g.select(col("type_a"), col("type_b"), col("n").as("n_days"),
      rnd(when(varA > 0.0 && varB > 0.0,
        (d("n") * d("sab") - d("sa") * d("sb")) / sqrt(varA * varB)), 6)
        .as("r"))
  }

  def qDayCorrMatrix(spark: SparkSession, dir: String): DataFrame =
    dayCorrMatrix(Tables.events(spark, dir), "event_type", "ts")
      .orderBy("type_a", "type_b")

  /** Shannon entropy of the value distribution per group — the
    * dispersion-shape complement of variance (a two-spike and a
    * uniform distribution can share a variance; entropy tells them
    * apart — the drift dashboards' "has the distribution COLLAPSED"
    * read): H = −Σ p·ln p over the distinct-cents grid, normalized by
    * ln(#cells) to [0,1]. Each term is nano-rounded to an exact long
    * (the integer-micro idiom at 1e9 — terms are ≤ 1/e so the finer
    * unit costs nothing) making the sum order-free; the two output
    * divisions are mirrored fixed-order doubles.
    *
    * Scale: the same value-RESOLUTION-bounded grid as [[ksTest]]; the
    * per-type total is a window over that grid — one fact pass.
    * Long-exactness: Σ terms ≤ 0.37e9·cells — exact past 10¹⁰ grid
    * cells, far beyond any value resolution. */
  def valueEntropy(df: DataFrame, typeCol: String,
                   valCol: String): DataFrame = {
    val grid = df.filter(col(valCol).isNotNull)
      .select(col(typeCol).as("event_type"), centsOf(valCol).as("cents"))
      .groupBy("event_type", "cents").agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy("event_type")
    val p = col("n").cast("double") / col("tot").cast("double")
    val termNano = floor(-(p * log(p)) * 1e9 + 0.5).cast("long")
    val g = grid
      .withColumn("tot", sum(col("n")).over(wAll))
      .select(col("event_type"), col("tot"), termNano.as("t"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_values"), max(col("tot")).as("n_events"),
        sum(col("t")).as("snano"))
    def d(s: String) = col(s).cast("double")
    g.select(col("event_type"), col("n_values"), col("n_events"),
      rnd(d("snano") / 1e9, 6).as("entropy"),
      rnd(when(col("n_values") > 1L,
        (d("snano") / 1e9) / log(d("n_values"))), 4).as("norm_entropy"))
  }

  def qValueEntropy(spark: SparkSession, dir: String): DataFrame =
    valueEntropy(Tables.events(spark, dir), "event_type", "value")
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_anova_f" -> qAnovaF _,
    "q_moment_profile" -> qMomentProfile _,
    "q_markov_entropy" -> qMarkovEntropy _,
    "q_peak_detection" -> qPeakDetection _,
    "q_kendall_tau" -> qKendallTau _,
    "q_weekly_power" -> qWeeklyPower _,
    "q_day_corr_matrix" -> qDayCorrMatrix _,
    "q_value_entropy" -> qValueEntropy _,
    "q_seasonality_strength" -> qSeasonalityStrength _,
    "q_chi_square" -> qChiSquare _,
    "q_autocorr" -> qAutocorr _,
    "q_benford" -> qBenford _,
    "q_roc_auc" -> qRocAuc _,
    "q_linreg_closed" -> qLinregClosed _,
    "q_ks_test" -> qKsTest _,
    "q_ks_test_dnum" -> qKsTestDnum _,
    "q_cusum_shift" -> qCusumShift _,
    "q_changepoint" -> qChangepoint _,
    "q_runs_test" -> qRunsTest _,
    "q_hill_tail" -> qHillTail _,
    "q_outlier_iqr" -> qOutlierIqr _,
    "q_dispersion_index" -> qDispersionIndex _,
    "q_gini" -> qGini _,
    "q_spearman" -> qSpearman _,
    "q_mann_kendall" -> qMannKendall _,
    "q_theil_sen" -> qTheilSen _,
    "q_cramers_v" -> qCramersV _,
    "q_mutual_info" -> qMutualInfo _,
    "q_kaplan_meier" -> qKaplanMeier _,
    "q_brown_forsythe" -> qBrownForsythe _,
    "q_kruskal_wallis" -> qKruskalWallis _,
    "q_effect_size" -> qEffectSize _,
    "q_crosscorr" -> qCrossCorr _,
  )

  /** Shared CTE chain of the two KS oracles ([[qKsTest]] /
    * [[qKsTestDnum]]) up through the per-group integer frame `g` —
    * written once so the statistic and its localizing twin cannot
    * drift. */
  private val KsIntsSql: String =
    """WITH ev AS (
      |  SELECT event_type,
      |    CASE WHEN EXTRACT(day FROM ts) <= 15
      |      THEN 1 ELSE 0 END AS ina,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events WHERE value IS NOT NULL),
      |grid AS (
      |  SELECT event_type, cents, CAST(sum(ina) AS BIGINT) AS ca,
      |    CAST(sum(1 - ina) AS BIGINT) AS cb
      |  FROM ev GROUP BY event_type, cents),
      |c AS (
      |  SELECT event_type,
      |    sum(ca) OVER (PARTITION BY event_type ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
      |    sum(cb) OVER (PARTITION BY event_type ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb,
      |    sum(ca) OVER (PARTITION BY event_type) AS na,
      |    sum(cb) OVER (PARTITION BY event_type) AS nb
      |  FROM grid),
      |g AS (
      |  SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
      |    CAST(max(nb) AS BIGINT) AS n_b,
      |    CAST(max(abs(fa * nb - fb * na)) AS BIGINT) AS dnum
      |  FROM c GROUP BY event_type)""".stripMargin

  /** DuckDB twin of [[dowContingency]] — the shared CTE prefix ending
    * in `m(t, o0..o6, r, c0..c6, n)`, written once for the
    * q_cramers_v / q_mutual_info oracle pair. */
  private def DowContingencyCtes: String = {
    val aggSel = (0 to 6).map(d =>
      s"CAST(sum(CASE WHEN dow = $d THEN 1 ELSE 0 END) AS BIGINT) AS o$d")
      .mkString(",\n    ")
    val oCols = (0 to 6).map(d => s"o$d").mkString(", ")
    val rSum = (0 to 6).map(d => s"o$d").mkString(" + ")
    val cWins = (0 to 6).map(d =>
      s"CAST(sum(o$d) OVER () AS BIGINT) AS c$d").mkString(",\n    ")
    s"""WITH ev AS (
       |  SELECT event_type AS t,
       |    CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow
       |  FROM events),
       |bt AS (SELECT t, $aggSel FROM ev GROUP BY t),
       |m AS (
       |  SELECT t, $oCols, ($rSum) AS r,
       |    $cWins,
       |    CAST(sum($rSum) OVER () AS BIGINT) AS n
       |  FROM bt)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // the MK pair join + tie rollup; 2n₀ and the doubled tie term stay
    // integral, τ-b one mirrored fixed-order double
    "q_kendall_tau" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY event_type, CAST(ts AS DATE)),
        |s AS (
        |  SELECT a.event_type,
        |    CAST(sum(CAST(sign(b.x - a.x) AS BIGINT)) AS BIGINT) AS s
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY a.event_type),
        |t AS (
        |  SELECT event_type, x, CAST(count(*) AS BIGINT) AS t
        |  FROM daily GROUP BY event_type, x),
        |v AS (
        |  SELECT event_type, CAST(sum(t) AS BIGINT) AS n_days,
        |    CAST(sum(t * (t - 1)) AS BIGINT) AS tx2
        |  FROM t GROUP BY event_type),
        |j AS (
        |  SELECT v.event_type, v.n_days,
        |    coalesce(s.s, CAST(0 AS BIGINT)) AS s,
        |    v.n_days * (v.n_days - 1) AS n02, v.tx2
        |  FROM v LEFT JOIN s ON v.event_type = s.event_type)
        |SELECT event_type, n_days, s,
        |  CASE WHEN n02 > tx2 THEN
        |    floor((CAST(s AS DOUBLE) * 2.0
        |      / sqrt(CAST(n02 - tx2 AS DOUBLE) * CAST(n02 AS DOUBLE)))
        |      * 1e4 + 0.5) / 1e4 END AS tau
        |FROM j ORDER BY event_type""".stripMargin,
    // the dispersion_index calendar spine; each projection term is an
    // exact integer count times an interpolated literal coefficient,
    // micro-rounded to an exact long so the fold is order-free
    "q_weekly_power" -> {
      def chain(cf: Int => Double): String =
        "CASE " + (0 to 6).map(i =>
          s"WHEN k = $i THEN CAST(x AS DOUBLE) * CAST('${cf(i)}' AS DOUBLE)")
          .mkString(" ") + " END"
      // bare-coefficient chain for the Σcos/Σsin centering legs
      def chainC(cf: Int => Double): String =
        "CASE " + (0 to 6).map(i =>
          s"WHEN k = $i THEN CAST('${cf(i)}' AS DOUBLE)")
          .mkString(" ") + " END"
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(count(*) AS BIGINT) AS x
         |  FROM events WHERE event_type IS NOT NULL
         |  GROUP BY event_type, CAST(ts AS DATE)),
         |bounds AS (
         |  SELECT event_type, min(day) AS d0, max(day) AS d1
         |  FROM daily GROUP BY event_type),
         |spine AS (
         |  SELECT event_type, d0,
         |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
         |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
         |  FROM bounds),
         |full_ AS (
         |  SELECT spine.event_type,
         |    CAST(date_diff('day', spine.d0, spine.day) AS BIGINT) % 7 AS k,
         |    CAST(coalesce(x, 0) AS BIGINT) AS x
         |  FROM spine LEFT JOIN daily
         |    ON spine.event_type = daily.event_type
         |    AND spine.day = daily.day),
         |g AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(CAST(floor((${chain(weeklyCos)}) * 1e6 + 0.5) AS BIGINT))
         |      AS BIGINT) AS amicro,
         |    CAST(sum(CAST(floor((${chain(weeklySin)}) * 1e6 + 0.5) AS BIGINT))
         |      AS BIGINT) AS bmicro,
         |    CAST(sum(CAST(floor((${chainC(weeklyCos)}) * 1e6 + 0.5) AS BIGINT))
         |      AS BIGINT) AS cmicro,
         |    CAST(sum(CAST(floor((${chainC(weeklySin)}) * 1e6 + 0.5) AS BIGINT))
         |      AS BIGINT) AS smicro
         |  FROM full_ GROUP BY event_type),
         |f AS (
         |  SELECT event_type, n,
         |    CAST(amicro AS DOUBLE) / 1e6
         |      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         |        * (CAST(cmicro AS DOUBLE) / 1e6) AS a,
         |    CAST(bmicro AS DOUBLE) / 1e6
         |      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         |        * (CAST(smicro AS DOUBLE) / 1e6) AS b,
         |    CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
         |      AS sse
         |  FROM g),
         |z AS (
         |  SELECT event_type, n AS n_days,
         |    floor(a * 1e4 + 0.5) / 1e4 AS a7,
         |    floor(b * 1e4 + 0.5) / 1e4 AS b7,
         |    CASE WHEN sse > 0.0 THEN
         |      floor(((a * a + b * b) * 2.0 / CAST(n AS DOUBLE) / sse)
         |        * 1e4 + 0.5) / 1e4 END AS weekly_share
         |  FROM f)
         |SELECT event_type, n_days, a7, b7, weekly_share,
         |  CASE WHEN weekly_share IS NULL THEN NULL
         |    WHEN weekly_share >= 0.3 THEN 'strong'
         |    WHEN weekly_share >= 0.1 THEN 'moderate'
         |    ELSE 'weak' END AS periodicity
         |FROM z ORDER BY event_type""".stripMargin
    },
    // GLOBAL calendar spine × type grid, zero-filled; six exact sums
    // per unordered pair feed the laggedPearson fixed-order fold
    "q_day_corr_matrix" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY event_type, CAST(ts AS DATE)),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM daily),
        |grid AS (
        |  SELECT types.event_type, spine.day,
        |    CAST(coalesce(x, 0) AS BIGINT) AS x
        |  FROM types CROSS JOIN spine
        |  LEFT JOIN daily ON types.event_type = daily.event_type
        |    AND spine.day = daily.day),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.x AS xa, b.x AS xb
        |  FROM grid a JOIN grid b
        |    ON a.day = b.day AND a.event_type < b.event_type),
        |g AS (
        |  SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xa) AS BIGINT) AS sa, CAST(sum(xb) AS BIGINT) AS sb,
        |    CAST(sum(xa * xb) AS BIGINT) AS sab,
        |    CAST(sum(xa * xa) AS BIGINT) AS saa,
        |    CAST(sum(xb * xb) AS BIGINT) AS sbb
        |  FROM pairs GROUP BY type_a, type_b)
        |SELECT type_a, type_b, n AS n_days,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
        |      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) > 0.0
        |    AND CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
        |      - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0.0 THEN
        |    floor(((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
        |        - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |      / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
        |          - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
        |          - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))))
        |      * 1e6 + 0.5) / 1e6 END AS r
        |FROM g ORDER BY type_a, type_b""".stripMargin,
    // per-group (n, Σc, Σc²) exact; the between term rounded to an
    // exact long at the cent² unit per group so the cross-group sum
    // is order-free; F/η² the same fixed-order doubles
    "q_anova_f" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |grid AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
        |  FROM ev GROUP BY event_type),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(s) AS BIGINT) AS tt, CAST(sum(q) AS BIGINT) AS qq,
        |    CAST(sum(CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / CAST(n AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS bsum
        |  FROM grid),
        |f AS (
        |  SELECT k, nn,
        |    CAST(bsum AS DOUBLE)
        |      - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE) AS ssb,
        |    CAST(qq AS DOUBLE)
        |      - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE) AS sst,
        |    CAST(qq AS DOUBLE) - CAST(bsum AS DOUBLE) AS ssw
        |  FROM g),
        |z AS (
        |  SELECT k AS k_groups, nn AS n,
        |    CASE WHEN k > 1 AND nn > k AND ssw > 0.0 THEN
        |      floor(((ssb / (CAST(k AS DOUBLE) - 1.0))
        |        / (ssw / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))))
        |        * 1e4 + 0.5) / 1e4 END AS f_stat,
        |    CASE WHEN k > 1 AND sst > 0.0 THEN
        |      floor((ssb / sst) * 1e6 + 0.5) / 1e6 END AS eta2
        |  FROM f)
        |SELECT k_groups, n, f_stat, eta2,
        |  CASE WHEN eta2 IS NULL THEN NULL
        |    WHEN eta2 < 0.01 THEN 'negligible' WHEN eta2 < 0.06 THEN 'small'
        |    WHEN eta2 < 0.14 THEN 'medium' ELSE 'large' END AS strength
        |FROM z""".stripMargin,
    // raw power sums exact (HUGEINT mirrors Spark's decimal(38,0) —
    // both cast the same exact integer to nearest-double), central
    // moments the same fixed-order expansion
    "q_moment_profile" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s1,
        |    CAST(sum(c * c) AS BIGINT) AS s2,
        |    sum(c::HUGEINT * c * c) AS s3,
        |    sum(c::HUGEINT * c * c * c) AS s4
        |  FROM ev GROUP BY event_type),
        |m AS (
        |  SELECT event_type, n,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        |  FROM g),
        |c AS (
        |  SELECT event_type, n, mu,
        |    r2 - mu * mu AS m2,
        |    r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
        |    r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
        |      - 3.0 * mu * mu * mu * mu AS m4
        |  FROM m)
        |SELECT event_type, n,
        |  floor((mu / 100.0) * 1e4 + 0.5) / 1e4 AS mean_value,
        |  CASE WHEN m2 > 0.0 THEN
        |    floor((m3 / sqrt(m2 * m2 * m2)) * 1e4 + 0.5) / 1e4 END AS skewness,
        |  CASE WHEN m2 > 0.0 THEN
        |    floor((m4 / (m2 * m2) - 3.0) * 1e4 + 0.5) / 1e4
        |  END AS excess_kurtosis
        |FROM c ORDER BY event_type""".stripMargin,
    // the q_transition_matrix lag-1 pairs; every −p·ln p term
    // nano-rounded to an exact long on the bounded (prev, next) grid
    "q_markov_entropy" ->
      """WITH pairs AS (
        |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY epoch_ns(ts), event_id) AS prev,
        |    event_type AS next
        |  FROM events),
        |c AS (
        |  SELECT prev, next, CAST(count(*) AS BIGINT) AS n
        |  FROM pairs WHERE prev IS NOT NULL GROUP BY prev, next),
        |t AS (
        |  SELECT prev, CAST(sum(n) AS BIGINT) AS tot,
        |    CAST(count(*) AS BIGINT) AS n_next
        |  FROM c GROUP BY prev),
        |s AS (
        |  SELECT c.prev, max(t.tot) AS n_transitions,
        |    max(t.n_next) AS n_next_types,
        |    CAST(sum(CAST(floor(-((CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
        |      * ln(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))) * 1e9 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS snano
        |  FROM c JOIN t ON c.prev = t.prev GROUP BY c.prev)
        |SELECT prev, n_transitions, n_next_types,
        |  floor((CAST(snano AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6 AS entropy,
        |  floor(exp(CAST(snano AS DOUBLE) / 1e9) * 1e4 + 0.5) / 1e4 AS perplexity
        |FROM s ORDER BY prev""".stripMargin,
    // the dispersion_index calendar spine, strict two-sided integer
    // comparisons, endpoint NULL neighbours coalesce to false
    "q_peak_detection" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY event_type, CAST(ts AS DATE)),
        |bounds AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY event_type),
        |spine AS (
        |  SELECT event_type,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds),
        |full_ AS (
        |  SELECT spine.event_type, spine.day,
        |    CAST(coalesce(x, 0) AS BIGINT) AS x
        |  FROM spine LEFT JOIN daily
        |    ON spine.event_type = daily.event_type
        |    AND spine.day = daily.day),
        |w AS (
        |  SELECT event_type, x,
        |    coalesce(x > lag(x, 1) OVER (PARTITION BY event_type ORDER BY day)
        |      AND x > lead(x, 1) OVER (PARTITION BY event_type ORDER BY day),
        |      FALSE) AS pk
        |  FROM full_)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(CASE WHEN pk THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks,
        |  max(CASE WHEN pk THEN x END) AS max_peak,
        |  floor((CAST(sum(CASE WHEN pk THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS peak_share
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the same 21 conditional integer partials, grand moments as exact
    // integer sums of them, the same fixed left-associated SSW fold
    "q_seasonality_strength" -> {
      val aggSel = (0 to 6).flatMap { d =>
        Seq(
          s"CAST(sum(CASE WHEN dow = $d THEN 1 ELSE 0 END) AS BIGINT) AS n$d",
          s"CAST(sum(CASE WHEN dow = $d THEN c ELSE 0 END) AS BIGINT) AS sc$d",
          s"CAST(sum(CASE WHEN dow = $d THEN c * c ELSE 0 END) AS BIGINT) AS sq$d")
      }.mkString(",\n    ")
      def s7(p: String) = (0 to 6).map(d => s"$p$d").mkString(" + ")
      val term = (0 to 6).map(d =>
        s"(CASE WHEN n$d > 0 THEN CAST(sq$d AS DOUBLE) - CAST(sc$d AS DOUBLE)" +
          s" * CAST(sc$d AS DOUBLE) / CAST(n$d AS DOUBLE)" +
          " ELSE CAST(0.0 AS DOUBLE) END)").mkString(" + ")
      s"""WITH ev AS (
         |  SELECT event_type,
         |    CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
         |  FROM events WHERE value IS NOT NULL),
         |g AS (
         |  SELECT event_type,
         |    $aggSel
         |  FROM ev GROUP BY event_type),
         |d AS (
         |  SELECT event_type,
         |    ${s7("n")} AS n, ${s7("sc")} AS sc, ${s7("sq")} AS sq,
         |    $term AS ssw
         |  FROM g)
         |SELECT event_type, n,
         |  CASE WHEN CAST(sq AS DOUBLE)
         |      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)
         |      > 0.0 THEN
         |    floor((CAST(1.0 AS DOUBLE) - ssw / (CAST(sq AS DOUBLE)
         |      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)))
         |      * 1e6 + 0.5) / 1e6 END AS strength
         |FROM d ORDER BY event_type""".stripMargin
    },
    // exact-rational cell terms, margins from the same grid, and the
    // SAME fixed left-associated 7-term fold (no order-sensitive sum)
    // rebuilt on DowContingencyCtes (review r16): the old DISTINCT-grid
    // + equality-LEFT-JOIN oracle zeroed out NULL event_type groups
    // (g.event_type = raw.event_type never matches NULL) and counted a
    // NULL-ts dow row into n_dows/dof, while the Spark twin keeps NULL
    // groups' real counts and caps dows at 7 — latent on the null-free
    // fixture but a gate trip on any null-keyed input; the shared CTEs
    // ARE the twin, so the mirroring is now structural
    "q_chi_square" -> {
      val term = (0 to 6).map(d =>
        s"(CASE WHEN r > 0 AND c$d > 0 THEN (CAST(o$d * n - r * c$d AS DOUBLE)" +
          s" * CAST(o$d * n - r * c$d AS DOUBLE))" +
          s" / (CAST(r * c$d AS DOUBLE) * CAST(n AS DOUBLE))" +
          " ELSE CAST(0.0 AS DOUBLE) END)").mkString(" + ")
      val nDows = (0 to 6).map(d =>
        s"(CASE WHEN c$d > 0 THEN 1 ELSE 0 END)").mkString(" + ")
      DowContingencyCtes + s""",
         |f AS (
         |  SELECT t AS event_type,
         |    CAST(($nDows) - 1 AS BIGINT) AS dof,
         |    floor(($term) * 1e4 + 0.5) / 1e4 AS chi2
         |  FROM m)
         |SELECT event_type, dof, chi2,
         |  dof = 6 AND chi2 > $Chi2Crit6 AS flagged
         |FROM f ORDER BY event_type""".stripMargin
    },
    // per-lag Pearson r from the same six integer sums, lags unrolled
    // as a UNION ALL generated from the same 1..maxLag range
    "q_autocorr" -> {
      val lagSel = (1 to 3).map(l =>
        s"""SELECT event_type, $l AS lag,
           |  lag(x, $l) OVER (PARTITION BY event_type ORDER BY day) AS xp,
           |  x AS y FROM daily""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH daily0 AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(count(*) AS BIGINT) AS x
         |  FROM events WHERE event_type IS NOT NULL
         |  GROUP BY event_type, CAST(ts AS DATE)),
         |bounds AS (
         |  SELECT event_type, min(day) AS d0, max(day) AS d1
         |  FROM daily0 GROUP BY event_type),
         |spine AS (
         |  SELECT event_type,
         |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
         |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
         |  FROM bounds),
         |daily AS (
         |  SELECT spine.event_type, spine.day,
         |    CAST(coalesce(x, 0) AS BIGINT) AS x
         |  FROM spine LEFT JOIN daily0
         |    ON spine.event_type = daily0.event_type
         |    AND spine.day = daily0.day),
         |st AS ($lagSel),
         |f AS (SELECT * FROM st WHERE xp IS NOT NULL),
         |g AS (
         |  SELECT event_type, lag, count(*) AS n_pairs,
         |    CAST(sum(xp) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(xp * y) AS BIGINT) AS sxy,
         |    CAST(sum(xp * xp) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM f GROUP BY event_type, lag),
         |d AS (
         |  SELECT event_type, lag, n_pairs,
         |    CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covnum,
         |    CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
         |    CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
         |  FROM g)
         |SELECT event_type, lag, n_pairs,
         |  CASE WHEN varx > 0.0 AND vary > 0.0 THEN
         |    floor((covnum / sqrt(varx * vary)) * 1e6 + 0.5) / 1e6 END AS r
         |FROM d ORDER BY event_type, lag""".stripMargin
    },
    // expected shares as the Scala doubles' shortest round-trip decimal
    // literals CAST to DOUBLE (a bare literal would parse as DECIMAL)
    "q_benford" -> {
      val expVals = (1 to 9).map(d =>
        s"($d, CAST('${benfordP(d)}' AS DOUBLE))").mkString(", ")
      s"""WITH obs AS (
         |  SELECT event_type,
         |    CAST(substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1)
         |      AS INT) AS digit,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM events WHERE value >= 1.0 GROUP BY event_type, 2),
         |grid AS (
         |  SELECT t.event_type, d.digit
         |  FROM (SELECT DISTINCT event_type FROM obs) t,
         |    (SELECT unnest(generate_series(1, 9)) AS digit) d),
         |n AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
         |  FROM obs GROUP BY event_type),
         |e(digit, p) AS (VALUES $expVals),
         |r AS (
         |  SELECT grid.event_type, grid.digit,
         |    coalesce(obs.c, CAST(0 AS BIGINT)) AS n_obs,
         |    floor((CAST(coalesce(obs.c, CAST(0 AS BIGINT)) AS DOUBLE)
         |      / CAST(n.n AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS share,
         |    floor(e.p * 1e6 + 0.5) / 1e6 AS expected,
         |    floor(abs(CAST(coalesce(obs.c, CAST(0 AS BIGINT)) AS DOUBLE)
         |      / CAST(n.n AS DOUBLE) - e.p) * 1e6 + 0.5) / 1e6 AS dev
         |  FROM grid
         |  LEFT JOIN obs ON grid.event_type IS NOT DISTINCT FROM obs.event_type
         |    AND grid.digit = obs.digit
         |  JOIN n ON grid.event_type IS NOT DISTINCT FROM n.event_type
         |  JOIN e ON grid.digit = e.digit)
         |SELECT event_type, digit, n_obs, share, expected, dev,
         |  dev > 0.05 AS flagged
         |FROM r ORDER BY event_type, digit""".stripMargin
    },
    // pooled average ranks as exact integers (2·avg = 2·rank + ties − 1),
    // AUC as one integer rational — mirrored window shapes
    "q_roc_auc" ->
      """WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events
        |  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
        |r AS (
        |  SELECT day, pos,
        |    2 * rank() OVER (PARTITION BY day ORDER BY cents)
        |      + count(*) OVER (PARTITION BY day, cents) - 1 AS r2
        |  FROM ev),
        |g AS (
        |  SELECT day, CAST(sum(pos) AS BIGINT) AS n_pos,
        |    CAST(sum(1 - pos) AS BIGINT) AS n_neg,
        |    CAST(sum(CASE WHEN pos = 1 THEN r2 END) AS BIGINT) AS sr2
        |  FROM r GROUP BY day)
        |SELECT day, n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    floor((CAST(sr2 - n_pos * (n_pos + 1) AS DOUBLE)
        |      / CAST(2 * n_pos * n_neg AS DOUBLE)) * 1e4 + 0.5) / 1e4
        |  END AS auc
        |FROM g ORDER BY day""".stripMargin,
    // six exact integer sums, three mirrored fixed-order double
    // expressions (slope/intercept/r²)
    "q_linreg_closed" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |g AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * c) AS BIGINT) AS sxy,
        |    CAST(sum(c) AS BIGINT) AS sy, CAST(sum(c * c) AS BIGINT) AS syy
        |  FROM ev GROUP BY event_type),
        |d AS (
        |  SELECT event_type, n,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covnum,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM g)
        |SELECT event_type, n,
        |  CASE WHEN varx > 0.0 THEN
        |    floor(((covnum / varx) / 100.0) * 1e6 + 0.5) / 1e6 END AS slope,
        |  CASE WHEN varx > 0.0 THEN
        |    floor((((syd - (covnum / varx) * sxd) / CAST(n AS DOUBLE)) / 100.0)
        |      * 1e4 + 0.5) / 1e4 END AS intercept,
        |  CASE WHEN varx > 0.0 AND vary > 0.0 THEN
        |    floor(((covnum * covnum) / (varx * vary)) * 1e6 + 0.5) / 1e6
        |  END AS r2
        |FROM d ORDER BY event_type""".stripMargin,
    // sup over the distinct-cents grid of the exact integer
    // cross-difference; drifted compares integers on both engines.
    // Day extraction is EXTRACT(day FROM ts), never a format-pattern
    // function — the one format-pattern call in the oracle corpus was
    // the most engine-version-fragile expression in the round-12
    // board's single unreproduced gate trip (VERDICT r12 ask #1)
    "q_ks_test" -> (KsIntsSql +
      """
        |SELECT event_type, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    floor((CAST(dnum AS DOUBLE) / CAST(n_a * n_b AS DOUBLE))
        |      * 1e6 + 0.5) / 1e6 END AS d_stat,
        |  100 * dnum > 10 * n_a * n_b AS drifted
        |FROM g ORDER BY event_type""".stripMargin),
    // the localizing twin: the same integer core with no double column
    "q_ks_test_dnum" -> (KsIntsSql +
      """
        |SELECT event_type, n_a, n_b, dnum,
        |  100 * dnum > 10 * n_a * n_b AS drifted
        |FROM g ORDER BY event_type""".stripMargin),
    // prefix-sum/running-extremum unrolling of the CUSUM recursion;
    // integer until the final /D, flags compare integers
    "q_cusum_shift" ->
      """WITH daily0 AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY event_type, CAST(ts AS DATE)),
        |bounds AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily0 GROUP BY event_type),
        |spine AS (
        |  SELECT event_type,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds),
        |daily AS (
        |  SELECT spine.event_type, spine.day,
        |    CAST(coalesce(x, 0) AS BIGINT) AS x
        |  FROM spine LEFT JOIN daily0
        |    ON spine.event_type = daily0.event_type
        |    AND spine.day = daily0.day),
        |w AS (
        |  SELECT event_type, day, x,
        |    count(*) OVER (PARTITION BY event_type) AS d,
        |    sum(x) OVER (PARTITION BY event_type) AS t
        |  FROM daily),
        |p AS (
        |  SELECT event_type, day, x, d, t,
        |    sum(d * x - t) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
        |  FROM w),
        |s AS (
        |  SELECT event_type, day, x, d, t, pp,
        |    pp - least(CAST(0 AS BIGINT), min(pp) OVER (PARTITION BY event_type
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |      AS s_up,
        |    greatest(CAST(0 AS BIGINT), max(pp) OVER (PARTITION BY event_type
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |      - pp AS s_dn
        |  FROM p)
        |SELECT event_type, day, x AS n_events,
        |  floor((CAST(s_up AS DOUBLE) / CAST(d AS DOUBLE)) * 1e4 + 0.5) / 1e4
        |    AS cusum_up,
        |  floor((CAST(s_dn AS DOUBLE) / CAST(d AS DOUBLE)) * 1e4 + 0.5) / 1e4
        |    AS cusum_dn,
        |  5 * s_up > t AS shift_up,
        |  5 * s_dn > t AS shift_dn
        |FROM s ORDER BY event_type, day""".stripMargin,
    // both rank vectors as exact integer 2r columns (the q_roc_auc
    // identity), Pearson over them as the autocorr six-sum fold
    "q_spearman" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY x)
        |      + count(*) OVER (PARTITION BY event_type, x) - 1 AS rx2,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY c)
        |      + count(*) OVER (PARTITION BY event_type, c) - 1 AS ry2
        |  FROM ev),
        |g AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(rx2) AS BIGINT) AS sx, CAST(sum(ry2) AS BIGINT) AS sy,
        |    CAST(sum(rx2 * ry2) AS BIGINT) AS sxy,
        |    CAST(sum(rx2 * rx2) AS BIGINT) AS sxx,
        |    CAST(sum(ry2 * ry2) AS BIGINT) AS syy
        |  FROM r GROUP BY event_type),
        |d AS (
        |  SELECT event_type, n,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covnum,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
        |  FROM g)
        |SELECT event_type, n,
        |  CASE WHEN varx > 0.0 AND vary > 0.0 THEN
        |    floor((covnum / sqrt(varx * vary)) * 1e6 + 0.5) / 1e6 END AS rho
        |FROM d ORDER BY event_type""".stripMargin,
    // S and 18·Var as exact integers off the shared daily rollup; z one
    // mirrored fixed-order double; trending compares the ROUNDED z.
    // DuckDB sign() returns TINYINT — CAST to DOUBLE in mirrored order
    "q_mann_kendall" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY event_type, CAST(ts AS DATE)),
        |s AS (
        |  SELECT a.event_type,
        |    CAST(sum(CAST(sign(b.x - a.x) AS BIGINT)) AS BIGINT) AS s
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY a.event_type),
        |t AS (
        |  SELECT event_type, x, CAST(count(*) AS BIGINT) AS t
        |  FROM daily GROUP BY event_type, x),
        |v AS (
        |  SELECT event_type, CAST(sum(t) AS BIGINT) AS n_days,
        |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
        |  FROM t GROUP BY event_type),
        |j AS (
        |  SELECT v.event_type, v.n_days,
        |    coalesce(s.s, CAST(0 AS BIGINT)) AS s,
        |    v.n_days * (v.n_days - 1) * (2 * v.n_days + 5) - v.tie18 AS var18
        |  FROM v LEFT JOIN s ON v.event_type = s.event_type),
        |z AS (
        |  SELECT event_type, n_days, s,
        |    CASE WHEN var18 > 0 THEN
        |      floor(((CAST(s AS DOUBLE) - CAST(sign(s) AS DOUBLE))
        |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)) * 1e4 + 0.5) / 1e4
        |    END AS z
        |  FROM j)
        |SELECT event_type, n_days, s, z,
        |  abs(z) > CAST(1.96 AS DOUBLE) AS trending
        |FROM z ORDER BY event_type""".stripMargin,
    // the autocorr six-sum fold over the cross-series lag pairs; the
    // day spine is the COMPLETE CALENDAR between the series' bounds
    // (a row-based lag over active-only days would pair values k ROWS
    // apart, not k DAYS — review r13), absent days count 0 both sides
    "q_crosscorr" -> {
      val lagSel = (0 to 3).map(l =>
        s"""SELECT $l AS lag,
           |  lag(x, $l) OVER (ORDER BY day) AS xp,
           |  y FROM full_""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH daily AS (
         |  SELECT event_type AS t, CAST(ts AS DATE) AS day,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |  GROUP BY event_type, CAST(ts AS DATE)),
         |xa AS (SELECT day, c AS x FROM daily WHERE t = 'click'),
         |yb AS (SELECT day, c AS y FROM daily WHERE t = 'purchase'),
         |j AS (SELECT day, x, y FROM xa FULL JOIN yb USING (day)),
         |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         |spine AS (
         |  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
         |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
         |  FROM bounds),
         |full_ AS (
         |  SELECT spine.day, CAST(coalesce(x, 0) AS BIGINT) AS x,
         |    CAST(coalesce(y, 0) AS BIGINT) AS y
         |  FROM spine LEFT JOIN j USING (day)),
         |st AS ($lagSel),
         |f AS (SELECT * FROM st WHERE xp IS NOT NULL),
         |g AS (
         |  SELECT lag, count(*) AS n_pairs,
         |    CAST(sum(xp) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(xp * y) AS BIGINT) AS sxy,
         |    CAST(sum(xp * xp) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM f GROUP BY lag),
         |d AS (
         |  SELECT lag, n_pairs,
         |    CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covnum,
         |    CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
         |    CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary
         |  FROM g)
         |SELECT lag, n_pairs,
         |  CASE WHEN varx > 0.0 AND vary > 0.0 THEN
         |    floor((covnum / sqrt(varx * vary)) * 1e6 + 0.5) / 1e6 END AS r
         |FROM d ORDER BY lag""".stripMargin
    },
    // nano-rounded −p·ln p terms summed as exact longs over the cents
    // grid; the per-type total is a window over the same grid
    "q_value_entropy" ->
      """WITH grid AS (
        |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY event_type, 2),
        |w AS (
        |  SELECT event_type, n,
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        |  FROM grid),
        |t AS (
        |  SELECT event_type, tot,
        |    CAST(floor(-((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
        |      * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))) * 1e9 + 0.5)
        |      AS BIGINT) AS t
        |  FROM w),
        |g AS (
        |  SELECT event_type, count(*) AS n_values,
        |    CAST(max(tot) AS BIGINT) AS n_events,
        |    CAST(sum(t) AS BIGINT) AS snano
        |  FROM t GROUP BY event_type)
        |SELECT event_type, n_values, n_events,
        |  floor((CAST(snano AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6 AS entropy,
        |  CASE WHEN n_values > 1 THEN
        |    floor(((CAST(snano AS DOUBLE) / 1e9)
        |      / ln(CAST(n_values AS DOUBLE))) * 1e4 + 0.5) / 1e4
        |  END AS norm_entropy
        |FROM g ORDER BY event_type""".stripMargin,
    // exact pair counts off the cents grid (no pair join), shared
    // moment helpers for Cohen's d, magnitude labels the ROUNDED δ
    "q_effect_size" -> {
      val varA = varFromCentsSql("n_a", "sca", "sqa")
      val varB = varFromCentsSql("n_b", "scb", "sqb")
      val sdPooled =
        s"""sqrt(((CAST(n_a AS DOUBLE) - 1.0) * ($varA)
           |      + (CAST(n_b AS DOUBLE) - 1.0) * ($varB))
           |    / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0))""".stripMargin
      val meanDiff =
        s"(${meanFromCentsSql("n_a", "sca")} - ${meanFromCentsSql("n_b", "scb")})"
      s"""WITH ev AS (
         |  SELECT event_type,
         |    CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 1 ELSE 0 END AS ina,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
         |  FROM events WHERE value IS NOT NULL),
         |grid AS (
         |  SELECT event_type, cents,
         |    CAST(sum(ina) AS BIGINT) AS ca,
         |    CAST(sum(1 - ina) AS BIGINT) AS cb,
         |    CAST(sum(ina * cents) AS BIGINT) AS sca,
         |    CAST(sum((1 - ina) * cents) AS BIGINT) AS scb,
         |    CAST(sum(ina * cents * cents) AS BIGINT) AS sqa,
         |    CAST(sum((1 - ina) * cents * cents) AS BIGINT) AS sqb
         |  FROM ev GROUP BY event_type, cents),
         |c AS (
         |  SELECT event_type, ca, sca, scb, sqa, sqb,
         |    CAST(coalesce(sum(cb) OVER (PARTITION BY event_type ORDER BY cents
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS cb_below,
         |    CAST(sum(cb) OVER (PARTITION BY event_type ORDER BY cents
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cb_upto,
         |    CAST(sum(cb) OVER (PARTITION BY event_type) AS BIGINT) AS nb
         |  FROM grid),
         |g AS (
         |  SELECT event_type,
         |    CAST(sum(ca) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
         |    CAST(sum(ca * cb_below) AS BIGINT) AS gt,
         |    CAST(sum(ca * (nb - cb_upto)) AS BIGINT) AS lt,
         |    CAST(sum(sca) AS BIGINT) AS sca, CAST(sum(scb) AS BIGINT) AS scb,
         |    CAST(sum(sqa) AS BIGINT) AS sqa, CAST(sum(sqb) AS BIGINT) AS sqb
         |  FROM c GROUP BY event_type),
         |r AS (
         |  SELECT event_type, n_a, n_b,
         |    CASE WHEN n_a > 0 AND n_b > 0 THEN
         |      floor(((CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
         |        / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
         |        * 1e4 + 0.5) / 1e4
         |    END AS cliffs_delta,
         |    CASE WHEN n_a > 1 AND n_b > 1 AND $sdPooled > 0.0 THEN
         |      floor(($meanDiff / $sdPooled) * 1e4 + 0.5) / 1e4
         |    END AS cohens_d
         |  FROM g)
         |SELECT event_type, n_a, n_b, cliffs_delta, cohens_d,
         |  CASE WHEN cliffs_delta IS NULL THEN NULL
         |    WHEN abs(cliffs_delta) < 0.147 THEN 'negligible'
         |    WHEN abs(cliffs_delta) < 0.33 THEN 'small'
         |    WHEN abs(cliffs_delta) < 0.474 THEN 'medium'
         |    ELSE 'large' END AS magnitude
         |FROM r ORDER BY event_type""".stripMargin
    },
    // grid-ranked H: 2·avgRank = 2·cumBefore + t + 1 exact on the
    // distinct-cents grid, per-group terms rounded to integer units
    // before the order-free cross-group sum, mirrored final expression
    "q_kruskal_wallis" ->
      s"""WITH ev AS (
         |  SELECT event_type AS grp,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
         |  FROM events WHERE value IS NOT NULL),
         |cell AS (
         |  SELECT cents, grp, CAST(count(*) AS BIGINT) AS c
         |  FROM ev GROUP BY cents, grp),
         |grid AS (
         |  SELECT cents, CAST(sum(c) AS BIGINT) AS t FROM cell GROUP BY cents),
         |g2 AS (
         |  SELECT cents, t,
         |    CAST(coalesce(sum(t) OVER (ORDER BY cents
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cumbefore
         |  FROM grid),
         |per AS (
         |  SELECT grp, CAST(sum(c) AS BIGINT) AS n_g,
         |    CAST(sum(c * (2 * cumbefore + t + 1)) AS BIGINT) AS r2sum
         |  FROM cell JOIN g2 USING (cents) GROUP BY grp),
         |a AS (
         |  SELECT CAST(sum(n_g) AS BIGINT) AS n, count(*) AS k_groups,
         |    CAST(sum(CAST(floor(CAST(r2sum AS DOUBLE) * CAST(r2sum AS DOUBLE)
         |      / (4.0 * CAST(n_g AS DOUBLE)) * 1024.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS sum_terms
         |  FROM per),
         |tie AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie3 FROM g2),
         |hh AS (
         |  SELECT n, k_groups,
         |    CASE WHEN n * n * n - n > tie3
         |      THEN floor(((12.0 * (CAST(sum_terms AS DOUBLE) / 1024.0)
         |          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
         |          - 3.0 * (CAST(n AS DOUBLE) + 1.0))
         |        / (1.0 - CAST(tie3 AS DOUBLE)
         |          / CAST(n * n * n - n AS DOUBLE)))
         |        * 1e4 + 0.5) / 1e4
         |    END AS h
         |  FROM a, tie)
         |SELECT n, k_groups, h, CAST(k_groups - 1 AS BIGINT) AS dof,
         |  CASE CAST(k_groups - 1 AS BIGINT)
         |    ${(1 to 6).map(k => s"WHEN $k THEN h > ${Chi2Crit05(k)}").mkString(" ")}
         |    ELSE NULL END AS significant
         |FROM hh""".stripMargin,
    // slopes are IEEE divisions of exact integers; the median comes
    // from PINNED middle elements (2·rn ∈ [n, n+2]), never an engine
    // median() — tie order among equal slopes cannot move the values
    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY event_type, CAST(ts AS DATE)),
        |pairs AS (
        |  SELECT a.event_type,
        |    CAST(b.x - a.x AS DOUBLE)
        |      / CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day),
        |r AS (
        |  SELECT event_type, slope,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY slope)
        |      AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
        |  FROM pairs),
        |m AS (
        |  SELECT event_type, CAST(max(np) AS BIGINT) AS n_pairs,
        |    min(slope) AS lo, max(slope) AS hi
        |  FROM r WHERE rn * 2 >= np AND rn * 2 <= np + 2
        |  GROUP BY event_type),
        |spine AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY event_type)
        |SELECT spine.event_type, n_days,
        |  coalesce(n_pairs, CAST(0 AS BIGINT)) AS n_pairs,
        |  floor(((lo + hi) / CAST(2.0 AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS slope
        |FROM spine LEFT JOIN m ON spine.event_type = m.event_type
        |ORDER BY spine.event_type""".stripMargin,
    // margins as window sums over the bounded per-group frame, the
    // chi-square fixed 7-term fold nano-rounded per group so the
    // cross-group total is an order-free exact long sum
    "q_cramers_v" -> {
      val term = (0 to 6).map(d =>
        s"(CASE WHEN r > 0 AND c$d > 0 THEN (CAST(o$d * n - r * c$d AS DOUBLE)" +
          s" * CAST(o$d * n - r * c$d AS DOUBLE))" +
          s" / (CAST(r * c$d AS DOUBLE) * CAST(n AS DOUBLE))" +
          " ELSE CAST(0.0 AS DOUBLE) END)").mkString(" + ")
      val cLev = (0 to 6).map(d =>
        s"(CASE WHEN c$d > 0 THEN 1 ELSE 0 END)").mkString(" + ")
      DowContingencyCtes + s""",
         |g AS (
         |  SELECT CAST(max(n) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS r_levels,
         |    CAST(max($cLev) AS BIGINT) AS c_levels,
         |    CAST(sum(CAST(floor(($term) * 1e9 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS snano
         |  FROM m),
         |f AS (
         |  SELECT n, r_levels, c_levels,
         |    floor((CAST(snano AS DOUBLE) / 1e9) * 1e4 + 0.5) / 1e4 AS chi2,
         |    CASE WHEN least(r_levels - 1, c_levels - 1) >= 1 THEN
         |      floor(sqrt((CAST(snano AS DOUBLE) / 1e9)
         |        / (CAST(n AS DOUBLE)
         |          * CAST(least(r_levels - 1, c_levels - 1) AS DOUBLE)))
         |        * 1e4 + 0.5) / 1e4 END AS v
         |  FROM g)
         |SELECT n, r_levels, c_levels, chi2, v,
         |  CASE WHEN v IS NULL THEN NULL
         |    WHEN v < 0.1 THEN 'negligible' WHEN v < 0.3 THEN 'small'
         |    WHEN v < 0.5 THEN 'medium' ELSE 'large' END AS strength
         |FROM f""".stripMargin
    },
    // every ln term nano-rounded to an exact long (the value_entropy
    // recipe) so all folds and sums are order-free exact longs
    "q_mutual_info" -> {
      val miFold = (0 to 6).map(d =>
        s"(CASE WHEN o$d > 0 THEN CAST(floor(((CAST(o$d AS DOUBLE)" +
          s" / CAST(n AS DOUBLE)) * ln(CAST(o$d AS DOUBLE)" +
          s" * CAST(n AS DOUBLE) / (CAST(r AS DOUBLE)" +
          s" * CAST(c$d AS DOUBLE)))) * 1e9 + 0.5) AS BIGINT)" +
          " ELSE CAST(0 AS BIGINT) END)").mkString(" + ")
      val hcFold = (0 to 6).map(d =>
        s"(CASE WHEN c$d > 0 THEN CAST(floor((-(CAST(c$d AS DOUBLE)" +
          s" / CAST(n AS DOUBLE)) * ln(CAST(c$d AS DOUBLE)" +
          s" / CAST(n AS DOUBLE))) * 1e9 + 0.5) AS BIGINT)" +
          " ELSE CAST(0 AS BIGINT) END)").mkString(" + ")
      DowContingencyCtes + s""",
         |t2 AS (
         |  SELECT n,
         |    ($miFold) AS mi_n,
         |    CASE WHEN r > 0 THEN
         |      CAST(floor((-(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
         |        * ln(CAST(r AS DOUBLE) / CAST(n AS DOUBLE))) * 1e9 + 0.5)
         |        AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS hr_n,
         |    ($hcFold) AS hc_n
         |  FROM m),
         |g AS (
         |  SELECT CAST(max(n) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS r_levels,
         |    CAST(sum(mi_n) AS BIGINT) AS mi_nano,
         |    CAST(sum(hr_n) AS BIGINT) AS hr_nano,
         |    CAST(max(hc_n) AS BIGINT) AS hc_nano
         |  FROM t2)
         |SELECT n, r_levels,
         |  floor((CAST(mi_nano AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6 AS mi,
         |  floor((CAST(hr_nano AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6 AS h_row,
         |  floor((CAST(hc_nano AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6 AS h_col,
         |  CASE WHEN least(hr_nano, hc_nano) > 0 THEN
         |    floor((CAST(mi_nano AS DOUBLE)
         |      / CAST(least(hr_nano, hc_nano) AS DOUBLE)) * 1e4 + 0.5) / 1e4
         |  END AS nmi
         |FROM g""".stripMargin
    },
    // exact integer d/c/n_risk off the duration grid; each ln factor
    // nano-rounded so the cumulative log-survival is an exact long
    // window sum; exp of the identical double, rounded at 1e-4
    "q_kaplan_meier" ->
      """WITH base AS (
        |  SELECT user_id AS u, CAST(ts AS DATE) AS day,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
        |  FROM events),
        |users AS (
        |  SELECT u, min(day) AS t0,
        |    min(CASE WHEN hit = 1 THEN day END) AS tp,
        |    max(day) AS dmax
        |  FROM base GROUP BY u),
        |hz AS (SELECT max(dmax) AS hz FROM users),
        |timed AS (
        |  SELECT u,
        |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev,
        |    CAST(CASE WHEN tp IS NOT NULL THEN date_diff('day', t0, tp)
        |      ELSE date_diff('day', t0, hz) END AS BIGINT) AS t
        |  FROM users, hz),
         |grid AS (
         |  SELECT t, CAST(sum(ev) AS BIGINT) AS d,
         |    CAST(sum(1 - ev) AS BIGINT) AS c
         |  FROM timed GROUP BY t),
         |r AS (
         |  SELECT t, d, c,
         |    CAST(sum(d + c) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
         |      AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
         |  FROM grid),
         |r2 AS (
         |  SELECT t, d, c, n_risk,
         |    CASE WHEN d < n_risk THEN
         |      CAST(floor(ln(CAST(n_risk - d AS DOUBLE)
         |        / CAST(n_risk AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS tn,
         |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS z
         |  FROM r),
         |r3 AS (
         |  SELECT t, d, c, n_risk,
         |    CAST(sum(tn) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS BIGINT) AS snano,
         |    CAST(sum(z) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS BIGINT) AS zcum
         |  FROM r2)
         |SELECT t AS duration_days, n_risk, d AS d_churned, c AS c_censored,
         |  CASE WHEN zcum > 0 THEN CAST(0.0 AS DOUBLE)
         |    ELSE floor(exp(CAST(snano AS DOUBLE) / 1e9) * 1e4 + 0.5) / 1e4
         |  END AS survival
         |FROM r3 WHERE d > 0 ORDER BY duration_days""".stripMargin,
    // exact quarter-valued quartiles (the quantile_drift precedent),
    // eighth-valued fences, exact integer comparisons both engines
    "q_outlier_iqr" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    quantile_cont(c, 0.25) AS q1, quantile_cont(c, 0.75) AS q3
        |  FROM ev GROUP BY event_type),
        |g AS (
        |  SELECT ev.event_type, CAST(max(n) AS BIGINT) AS n,
        |    max(q1) AS q1r, max(q3) AS q3r,
        |    CAST(sum(CASE WHEN CAST(c AS DOUBLE) < q1 - 1.5 * (q3 - q1)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |    CAST(sum(CASE WHEN CAST(c AS DOUBLE) > q3 + 1.5 * (q3 - q1)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |  FROM ev JOIN st USING (event_type) GROUP BY ev.event_type)
        |SELECT event_type, n,
        |  floor((q1r / 100.0) * 1e4 + 0.5) / 1e4 AS q1,
        |  floor((q3r / 100.0) * 1e4 + 0.5) / 1e4 AS q3,
        |  n_low, n_high,
        |  floor((CAST(n_low + n_high AS DOUBLE) / CAST(n AS DOUBLE))
        |    * 1e4 + 0.5) / 1e4 AS outlier_frac
        |FROM g ORDER BY event_type""".stripMargin,
    // exact integer day-count moments over the COMPLETE calendar spine
    // (zero-filled dark days — the crosscorr spine recipe), one
    // mirrored fixed-order double; regime bands label the ROUNDED index
    "q_dispersion_index" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY event_type, CAST(ts AS DATE)),
        |bounds AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY event_type),
        |spine AS (
        |  SELECT event_type,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds),
        |full_ AS (
        |  SELECT spine.event_type, CAST(coalesce(x, 0) AS BIGINT) AS x
        |  FROM spine LEFT JOIN daily
        |    ON spine.event_type = daily.event_type
        |    AND spine.day = daily.day),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM full_ GROUP BY event_type),
        |f AS (
        |  SELECT event_type, n,
        |    floor((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * 1e4 + 0.5)
        |      / 1e4 AS mean_daily,
        |    CASE WHEN n > 1 THEN
        |      floor((((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |        / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
        |        * 1e4 + 0.5) / 1e4
        |    END AS dispersion
        |  FROM g)
        |SELECT event_type, n AS n_days, mean_daily, dispersion,
        |  CASE WHEN dispersion IS NULL THEN NULL
        |    WHEN dispersion < 0.9 THEN 'under'
        |    WHEN dispersion <= 1.1 THEN 'poisson'
        |    ELSE 'over' END AS regime
        |FROM f ORDER BY event_type""".stripMargin,
    // grid order statistics: descending cumulative locates x_(k+1),
    // exact tail multiplicities weight the nano-rounded ln ratios
    "q_hill_tail" ->
      s"""WITH ev AS (
         |  SELECT event_type,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
         |  FROM events WHERE value IS NOT NULL
         |    AND CAST(floor(value * 100 + 0.5) AS BIGINT) > 0),
         |grid AS (
         |  SELECT event_type, cents, CAST(count(*) AS BIGINT) AS t
         |  FROM ev GROUP BY event_type, cents),
         |g1 AS (
         |  SELECT event_type, cents, t,
         |    CAST(coalesce(sum(t) OVER (PARTITION BY event_type
         |      ORDER BY cents DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cumbefore,
         |    CAST(sum(t) OVER (PARTITION BY event_type) AS BIGINT) AS n_g
         |  FROM grid),
         |g2 AS (
         |  SELECT event_type, cents, t, cumbefore, n_g,
         |    CAST(max(CASE WHEN cumbefore < $HillK + 1
         |        AND cumbefore + t >= $HillK + 1 THEN cents END)
         |      OVER (PARTITION BY event_type) AS BIGINT) AS xref
         |  FROM g1),
         |per AS (
         |  SELECT event_type, CAST(max(n_g) AS BIGINT) AS n,
         |    CAST(max(xref) AS BIGINT) AS xref,
         |    CAST(sum(CASE WHEN cumbefore < $HillK AND xref IS NOT NULL
         |      THEN least(t, $HillK - cumbefore)
         |        * CAST(floor(ln(CAST(cents AS DOUBLE)
         |          / CAST(xref AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS snano
         |  FROM g2 GROUP BY event_type)
         |SELECT event_type, n,
         |  floor((CAST(xref AS DOUBLE) / 100.0) * 1e2 + 0.5) / 1e2 AS x_ref,
         |  CASE WHEN snano > 0 THEN
         |    floor(((CAST($HillK AS DOUBLE) * 1e9)
         |      / CAST(snano AS DOUBLE)) * 1e4 + 0.5) / 1e4
         |  END AS alpha
         |FROM per ORDER BY event_type""".stripMargin,
    // exact-half median marks, integer runs count, mirrored fixed-order
    // null moments; nonrandom compares the ROUNDED z
    "q_runs_test" -> {
      val na = "CAST(n_above AS DOUBLE)"
      val nb = "CAST(n_below AS DOUBLE)"
      val n = s"($na + $nb)"
      val two = s"(2.0 * $na * $nb)"
      val mu = s"(1.0 + $two / $n)"
      val vr = s"(($two * ($two - $n)) / ($n * $n * ($n - 1.0)))"
      s"""WITH daily0 AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(count(*) AS BIGINT) AS x
         |  FROM events WHERE event_type IS NOT NULL
         |  GROUP BY event_type, CAST(ts AS DATE)),
         |bounds AS (
         |  SELECT event_type, min(day) AS d0, max(day) AS d1
         |  FROM daily0 GROUP BY event_type),
         |cal AS (
         |  SELECT event_type,
         |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
         |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
         |  FROM bounds),
         |daily AS (
         |  SELECT cal.event_type, cal.day,
         |    CAST(coalesce(x, 0) AS BIGINT) AS x
         |  FROM cal LEFT JOIN daily0
         |    ON cal.event_type = daily0.event_type
         |    AND cal.day = daily0.day),
         |mk AS (
         |  SELECT event_type, day, x,
         |    quantile_cont(x, 0.5) OVER (PARTITION BY event_type) * 2.0
         |      AS med2
         |  FROM daily),
         |b AS (
         |  SELECT event_type, day,
         |    CASE WHEN x * 2 > med2 THEN 1
         |      WHEN x * 2 < med2 THEN 0 END AS b
         |  FROM mk),
         |k AS (SELECT * FROM b WHERE b IS NOT NULL),
         |c AS (
         |  SELECT event_type, b,
         |    CASE WHEN lag(b) OVER (PARTITION BY event_type ORDER BY day)
         |        IS NOT NULL
         |      AND b != lag(b) OVER (PARTITION BY event_type ORDER BY day)
         |      THEN 1 ELSE 0 END AS chg
         |  FROM k),
         |g AS (
         |  SELECT event_type, CAST(sum(b) AS BIGINT) AS n_above,
         |    CAST(sum(1 - b) AS BIGINT) AS n_below,
         |    CAST(1 + sum(chg) AS BIGINT) AS n_runs
         |  FROM c GROUP BY event_type),
         |spine AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
         |  FROM daily GROUP BY event_type),
         |f AS (
         |  SELECT spine.event_type, n_days, n_above, n_below, n_runs,
         |    CASE WHEN n_above > 0 AND n_below > 0 AND $two > $n THEN
         |      floor(((CAST(n_runs AS DOUBLE) - $mu) / sqrt($vr))
         |        * 1e4 + 0.5) / 1e4
         |    END AS z
         |  FROM spine LEFT JOIN g ON spine.event_type = g.event_type)
         |SELECT event_type, n_days, n_above, n_below, n_runs, z,
         |  abs(z) > 1.96 AS nonrandom
         |FROM f ORDER BY event_type""".stripMargin
    },
    // the cusum_shift integer prefix verbatim; argmax is an integer
    // comparison with the earliest-day tiebreak (QUALIFY row_number)
    "q_changepoint" ->
      """WITH daily0 AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type IS NOT NULL
        |  GROUP BY event_type, CAST(ts AS DATE)),
        |bounds AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily0 GROUP BY event_type),
        |spine AS (
        |  SELECT event_type,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds),
        |daily AS (
        |  SELECT spine.event_type, spine.day,
        |    CAST(coalesce(x, 0) AS BIGINT) AS x
        |  FROM spine LEFT JOIN daily0
        |    ON spine.event_type = daily0.event_type
        |    AND spine.day = daily0.day),
        |w AS (
        |  SELECT event_type, day, x,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS d,
        |    CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS t
        |  FROM daily),
        |p AS (
        |  SELECT event_type, day, d,
        |    CAST(sum(d * x - t) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS p
        |  FROM w),
        |pick AS (
        |  SELECT event_type, d, day, p,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(p) DESC, day) AS rn
        |  FROM p)
        |SELECT event_type, d AS n_days,
        |  CASE WHEN abs(p) > 0 THEN day END AS change_day,
        |  floor((CAST(abs(p) AS DOUBLE) / CAST(d AS DOUBLE)) * 1e4 + 0.5)
        |    / 1e4 AS max_dev,
        |  CASE WHEN abs(p) = 0 THEN NULL
        |    WHEN p < 0 THEN 'up' ELSE 'down' END AS direction
        |FROM pick WHERE rn = 1 ORDER BY event_type""".stripMargin,
    // exact 2·median interpolants off the cents grid; (Σz)²/n terms in
    // binary 2⁻¹⁰ units for the order-free cross-group sum; between
    // clamped at 0; the flag gates on the asymptotic F(k−1, ∞) table
    "q_brown_forsythe" -> {
      val critCase = (1 to 6).map(k =>
        s"WHEN $k THEN w > ${Chi2Crit05(k) / k}").mkString(" ")
      """WITH ev AS (
        |  SELECT event_type AS grp,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |cell AS (
        |  SELECT grp, cents, CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY grp, cents),
        |g1 AS (
        |  SELECT grp, cents, c,
        |    CAST(sum(c) OVER (PARTITION BY grp ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS n_g
        |  FROM cell),
        |g2 AS (
        |  SELECT grp, cents, c, n_g,
        |    CAST(min(CASE WHEN cum >= (n_g + 1) // 2 THEN cents END)
        |      OVER (PARTITION BY grp) AS BIGINT) AS lo,
        |    CAST(min(CASE WHEN cum >= n_g // 2 + 1 THEN cents END)
        |      OVER (PARTITION BY grp) AS BIGINT) AS hi
        |  FROM g1),
        |per AS (
        |  SELECT grp, CAST(max(n_g) AS BIGINT) AS n_g,
        |    CAST(sum(c * abs(2 * cents - (lo + hi))) AS BIGINT) AS sz,
        |    CAST(sum(c * abs(2 * cents - (lo + hi))
        |      * abs(2 * cents - (lo + hi))) AS BIGINT) AS szz
        |  FROM g2 GROUP BY grp),
        |a AS (
        |  SELECT CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k_groups,
        |    CAST(sum(sz) AS BIGINT) AS s_all,
        |    CAST(sum(szz) AS BIGINT) AS szz_all,
        |    CAST(sum(CAST(floor(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
        |      / CAST(n_g AS DOUBLE) * 1024.0 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sum_terms
        |  FROM per),
        |f AS (
        |  SELECT n, k_groups,
        |    CASE WHEN k_groups >= 2 AND n > k_groups
        |        AND CAST(szz_all AS DOUBLE)
        |          - CAST(sum_terms AS DOUBLE) / 1024.0 > 0.0 THEN
        |      floor(((greatest(CAST(0.0 AS DOUBLE),
        |          CAST(sum_terms AS DOUBLE) / 1024.0
        |            - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
        |              / CAST(n AS DOUBLE))
        |        / (CAST(k_groups AS DOUBLE) - 1.0))
        |        / ((CAST(szz_all AS DOUBLE)
        |            - CAST(sum_terms AS DOUBLE) / 1024.0)
        |          / (CAST(n AS DOUBLE) - CAST(k_groups AS DOUBLE))))
        |        * 1e4 + 0.5) / 1e4
        |    END AS w,
        |    CAST(k_groups - 1 AS BIGINT) AS dof1,
        |    CAST(n - k_groups AS BIGINT) AS dof2
        |  FROM a)
        |SELECT n, k_groups, w, dof1, dof2,
        |  CASE WHEN dof2 < 120 THEN NULL
        |    ELSE CASE dof1 """.stripMargin + critCase + """
        |    ELSE NULL END
        |  END AS significant
        |FROM f""".stripMargin
    },
    // ascending-rank Gini as one integer rational per group (tie order
    // provably cancels)
    "q_gini" ->
      """WITH per AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY event_type, user_id),
        |r AS (
        |  SELECT event_type, c,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY c, user_id) AS BIGINT) AS rn
        |  FROM per),
        |g AS (
        |  SELECT event_type, count(*) AS n_users,
        |    CAST(sum(c) AS BIGINT) AS n_events,
        |    CAST(sum(rn * c) AS BIGINT) AS src
        |  FROM r GROUP BY event_type)
        |SELECT event_type, n_users, n_events,
        |  floor((CAST(2 * src - (n_users + 1) * n_events AS DOUBLE)
        |    / CAST(n_users * n_events AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS gini
        |FROM g ORDER BY event_type""".stripMargin,
  )
}
