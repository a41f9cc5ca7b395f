package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator surface: scans, projections, filters, joins, sorts,
  * set ops, pagination (SURVEY.md §2.1-§2.3, §2.6-§2.7).
  *
  * Every query has a DuckDB-oracle twin in [[Relational.oracles]]; output
  * column names are aliased identically on both sides, doubles are rounded
  * at a scale where the exact rational value terminates (so the two engines
  * cannot disagree on a tie), and a total deterministic ORDER BY is applied.
  *
  * Scale notes (100 TB): all filters/projections here reach the parquet scan
  * (PushedFilters / ReadSchema — asserted in PlanSpec); dimension joins are
  * explicitly broadcast; the one fact-fact join (orders x lineitem in
  * q_join_star) shuffles on the join key with AQE handling skew.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: partial (map-side) aggregation then a
    * 6-group final — the canonical "agg that scales linearly" shape. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        rnd(sum("l_quantity"), 2).as("sum_qty"),
        rnd(sum("l_extendedprice"), 2).as("sum_base_price"),
        rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        rnd(avg("l_quantity"), 4).as("avg_qty"),
        rnd(sum(round(col("l_discount") * 100).cast("long")) / (count(col("l_discount")) * lit(100.0)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Column projection + pushed temporal predicate (P1/P7): the scan must
    * read only 4 columns and skip row groups past the cutoff. */
  def qProjection(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") < lit("1999-06-01"))
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** Derived-column arithmetic (P2/F12). Products of 2-dp inputs are exact
    * at 4/6 dp, so rounding there is tie-free across engines. */
  def qDerived(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 500)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        rnd(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
        rnd(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("charge"),
        rnd(col("l_quantity") * col("l_extendedprice"), 2).as("gross"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Cast + rename (P3/P4). floor() before int-cast: Spark truncates
    * double→int while DuckDB rounds, floor makes both exact. */
  def qCastRename(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 200)
      .select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").cast("long").as("line_no"),
        floor(col("l_quantity")).cast("int").as("qty_int"),
        col("l_returnflag").as("flag"))
      .orderBy("order_id", "line_no")

  /** Compound predicate (P6): conjunction of null-check, inequality,
    * BETWEEN — all pushed to the scan. */
  def qFilterCompound(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_quantity") > 45 && col("l_returnflag") =!= "N" &&
        col("l_discount").isNotNull &&
        col("l_shipdate").between(lit("1999-01-01"), lit("2000-01-01")))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")

  /** Membership filter (P8). */
  def qFilterIsin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") && col("c_acctbal") > 9000)
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** Null injection + imputation (P11/P12): nullif → fill, then grouped
    * count over the imputed key. */
  def qNullHandling(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("d", when(col("l_discount") === 0.0, lit(null)).otherwise(col("l_discount")))
      .na.fill(Map("d" -> -1.0))
      .groupBy("d").agg(count(lit(1)).as("cnt"))
      .orderBy("d")

  /** Left equi-join fact x dimension (J1/J2): customer is broadcast. */
  def qJoinLeft(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"), "left")
      .filter(col("o_totalprice") > 490000)
      .select(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("c_mktsegment"))
      .orderBy("o_orderkey")

  /** Broadcast equi-join + grouped rollup of revenue per brand (J1+A3). */
  def qJoinBroadcast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")

  /** Left-semi join (J3): customers having at least one big order. */
  def qJoinSemi(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Left-anti join: customers with no order above the threshold. */
  def qJoinAnti(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 450000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** 5-table star join: region ⋈ nation ⋈ customer (all broadcast) against
    * the orders ⋈ lineitem fact-fact shuffle join, then grouped revenue.
    * The canonical TPC-H Q5 shape; AQE coalesces the post-shuffle
    * partitions at small SF and skew-splits at large SF. */
  def qJoinStar(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        rnd(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Top-k by measure (O2/O3): TakeOrderedAndProject, no global sort. */
  def qTopk(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(10)

  /** Pagination (O5): row_number over a total order, page 3 (rows 21-30).
    * SCALE HAZARD: the unpartitioned row_number serializes the whole
    * relation through one task — kept as the reference's offset-paging
    * semantics; [[qKeysetPage]] is the scale-safe recommended form. */
  def qPagination(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(desc("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn").between(21, 30))
      .orderBy("rn")
  }

  /** [[qPagination]]'s SCALABLE twin: the same global row_number served
    * by [[graft.operators.ChunkedOrder.withGlobalRowNumber]] — chunked
    * by floor(-c_acctbal) (monotone along the DESC order, equal keys
    * share a chunk), offsets stitched from per-chunk counts. Shares
    * q_pagination's oracle verbatim: equality is the property. */
  def qPaginationChunked(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ChunkedOrder.withGlobalRowNumber(
        Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal")),
        floor(-col("c_acctbal")),
        Seq(desc("c_acctbal"), col("c_custkey")), "rn")
      .filter(col("rn").between(21, 30))
      .orderBy("rn")

  /** Keyset ("seek") pagination — the scale-safe twin of [[qPagination]]:
    * WHERE key > last-seen ORDER BY key LIMIT n. The predicate pushes
    * into the scan (partition/row-group pruning on the sort key) and the
    * limit plans as TakeOrderedAndProject — no global row numbering, no
    * single-partition window, O(page) state per request. */
  def qKeysetPage(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") > 1000)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
      .limit(20)

  /** Latest-row-per-key compaction (the CDC-upsert / merge-on-read
    * snapshot over the keyed landing table): ONE max_by aggregation with
    * map-side partials — no per-key sort, no window shuffle-then-filter;
    * (ts, event_id) is the deterministic recency tiebreak. */
  def qUpsertLatest(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(max_by(
        struct(col("event_id"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(col("user_id"),
        col("last.event_id").as("last_event_id"),
        col("last.value").as("last_value"))
      .orderBy("user_id")

  /** SCD2 merge ([[graft.operators.Scd2]] — the history-preserving twin
    * of q_upsert_latest's keep-latest collapse). The batch is derived
    * deterministically from the customer dim so both engines see the
    * same feed: every key ≡ 3 (mod 10) relocates segment and shifts
    * nation (a genuine attribute change → close + reopen), and every
    * key ≡ 7 (mod 100) spawns a brand-new key at +9,000,000 (an
    * insert). The DuckDB oracle states the expected history table
    * directly from the same residue classes, so the full-outer-join +
    * explode plan is checked cell-exact: pass-through rows keep the
    * original validity, closed rows get valid_to = batch date, opened
    * rows start there with an open end. */
  def qScd2Merge(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_nationkey"))
    val current = base
      .withColumn("valid_from", to_date(lit("2024-01-01")))
      .withColumn("valid_to", when(lit(false), to_date(lit("2024-01-01"))))
      .withColumn("is_current", lit(true))
    val updates = base.filter(col("c_custkey") % 10 === 3)
      .withColumn("c_mktsegment", lit("RELOCATED"))
      .withColumn("c_nationkey", ((col("c_nationkey") + 1) % 25).cast("int"))
    val inserts = base.filter(col("c_custkey") % 100 === 7)
      .select((col("c_custkey") + 9000000L).as("c_custkey"), col("c_name"),
        lit("FOUNDED").as("c_mktsegment"), col("c_nationkey"))
    graft.operators.Scd2.merge(current, updates.unionByName(inserts),
        Seq("c_custkey"), to_date(lit("2024-06-01")))
      .orderBy("c_custkey", "valid_from")
  }

  /** Point-in-time dimension join ([[graft.operators.Scd2
    * .pointInTimeJoin]]): every order looks up the customer segment
    * valid AT its order date against a two-version SCD2 history
    * (keys ≡ 3 mod 10 relocate on 1995-06-01, mid-fixture so both
    * versions match real facts). The leakage-free feature-store
    * lookup — the validity predicate rides the broadcast hash join as
    * a residual, never a nested loop (PlanSpec-pinned). */
  def qPitJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val v1 = c.select(col("c_custkey"), col("c_mktsegment"),
      to_date(lit("1992-01-01")).as("valid_from"),
      when(col("c_custkey") % 10 === 3, to_date(lit("1995-06-01"))).as("valid_to"))
    val v2 = c.filter(col("c_custkey") % 10 === 3)
      .select(col("c_custkey"), lit("RELOCATED").as("c_mktsegment"),
        to_date(lit("1995-06-01")).as("valid_from"),
        when(lit(false), to_date(lit("1995-06-01"))).as("valid_to"))
    val facts = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
        to_date(col("o_orderdate")).as("o_day"))
    graft.operators.Scd2.pointInTimeJoin(
        facts, broadcast(v1.unionByName(v2)), Seq("c_custkey"), "o_day")
      .select(col("o_orderkey"), col("c_custkey"), col("o_day"),
        col("c_mktsegment").as("seg_at_order"))
      .orderBy("o_orderkey")
  }

  /** Distinct (A7). */
  def qDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderstatus", "o_orderpriority")
      .distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  /** Grouped count (A3). */
  def qGroupCount(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")

  /** Rollup with subtotal rows (beyond-reference; Spark `rollup` ≡ SQL
    * GROUP BY ROLLUP). Grouping nulls are coalesced to 'ALL' on both
    * sides so the sort is engine-independent. */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(rnd(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("cnt"))
      .orderBy("flag", "status")

  /** UNION DISTINCT (§2.7). */
  def qUnion(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      .union(
        Tables.orders(spark, dir)
          .filter(col("o_totalprice") > 450000).select(col("o_custkey").as("c_custkey")))
      .distinct()
      .orderBy("c_custkey")

  /** INTERSECT (distinct semantics in both engines). */
  def qIntersect(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey"))
      .intersect(
        Tables.orders(spark, dir)
          .filter(col("o_totalprice") > 300000).select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** EXCEPT (distinct semantics in both engines). */
  def qExcept(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 9500).select(col("c_custkey"))
      .except(
        Tables.orders(spark, dir)
          .filter(col("o_totalprice") > 350000).select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** Schema-driven null audit (A1): one count(*)−count(col) per column,
    * generated from df.schema — the reference's dynamic-schema idiom
    * (regression.py:58-72) without a driver-side loop over data. */
  def qNullAudit(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.orders(spark, dir)
    val audits: Seq[Column] =
      df.schema.fields.toSeq.map(f => (count(lit(1)) - count(col(f.name))).as(f.name))
    df.agg(audits.head, audits.tail: _*)
  }

  /** Temporal train/test split stats (M13): the cutoff scalar stays
    * in-plan via a broadcast single-row cross join — no driver round-trip,
    * unlike the reference (regression.py:216-218). */
  def qTemporalSplit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val cutoff = o.agg((max(col("o_orderdate")) - expr("INTERVAL 14 DAYS")).as("cutoff"))
    o.crossJoin(broadcast(cutoff))
      .withColumn("split", when(col("o_orderdate") < col("cutoff"), lit("train")).otherwise(lit("test")))
      .groupBy("split")
      .agg(
        count(lit(1)).as("cnt"),
        to_date(min(col("o_orderdate"))).as("min_d"),
        to_date(max(col("o_orderdate"))).as("max_d"))
      .orderBy("split")
  }

  /** Skew-safe salted join (operators.SkewJoin, declared per VERDICT r3
    * item 5): purchases × per-user signup counts on the power-law
    * user_id. The salt spreads each hot key over 8 reducers; the right
    * side replicates 8×, and the shuffle_hash hint pins the shuffled
    * shape the salting exists for (a broadcast would bypass it — at
    * 100 TB the per-user dim does not broadcast). Result is exactly the
    * plain inner join (TemporalOpsSpec proves equality; the DuckDB
    * oracle IS the plain join). PlanSpec asserts the salted shape. */
  def qSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
    val signups = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(count(lit(1)).as("n_signups"))
    graft.operators.SkewJoin.saltedInnerJoin(
      purchases, signups.hint("shuffle_hash"), "user_id", buckets = 8)
      .select("event_id", "user_id", "value", "n_signups")
      .orderBy("event_id")
  }

  /** Exact integer revenue grain shared by [[q3ShippingPriority]] and
    * [[q5LocalSupplier]]: l_extendedprice and l_discount are 2-dp
    * decimals, so revenue = price·(1−discount) is exact in integer
    * ten-thousandths — cents(price) · (100 − hundredths(discount)) —
    * and the group sum is an order-free long (the q1 form sums raw
    * doubles under rnd; the multi-join queries carry the stronger
    * exactness so their top-k selection can never tie-break on noise).
    *
    * Long-exactness bound (the Σc² convention): each term is at most
    * ~10⁷ cents · 100 ≈ 10⁹, so a per-group BIGINT sum is exact up to
    * ~2⁶³/10⁹ ≈ 9·10⁹ rows per group — q5's per-nation grain at
    * ~100 TB (≈2.4·10¹⁰ lineitems/nation) crosses it. Beyond the
    * bound, widen the summand to `decimal(38,0)` (sum stays exact to
    * 10³⁸; same expression, one cast) before the aggregate. */
  private def revenue4(priceCol: String, discCol: String) =
    expr(s"CAST(floor(`$priceCol` * 100 + 0.5) AS BIGINT)") *
      (lit(100L) - expr(s"CAST(floor(`$discCol` * 100 + 0.5) AS BIGINT)"))

  /** TPC-H Q3 shape (shipping priority): segment-filtered customers ×
    * date-bounded orders × post-cutoff lineitems, revenue per order,
    * top 10. The join-planning showcase: the filtered customer key list
    * broadcasts onto orders, the fact scan carries both pushed filters,
    * and the final top-k plans as TakeOrderedAndProject (no global
    * sort). */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1997-01-01"))
      .select(col("l_orderkey"),
        revenue4("l_extendedprice", "l_discount").as("rev4"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"),
        col("o_orderpriority"))
      .agg(rnd(sum(col("rev4")).cast("double") / 10000.0, 2).as("revenue"))
      .orderBy(desc("revenue"), col("order_date"), col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape (local supplier volume): the six-way star —
    * lineitem × orders × supplier × customer × nation × region, with
    * the LOCAL constraint (customer and supplier share a nation) as a
    * join predicate, revenue per nation in one region-year. Every
    * dimension side broadcasts; the only shuffles key the two fact
    * joins (l_orderkey, then the residual group rollup is
    * nation-bounded). */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    // customer is the LARGEST dimension — no broadcast pin (AQE picks
    // BHJ at small SF; at 100 TB this correctly falls back to a
    // key-shuffled join on o_custkey)
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        revenue4("l_extendedprice", "l_discount").as("rev4"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(rnd(sum(col("rev4")).cast("double") / 10000.0, 2).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q3_shipping_priority" -> q3ShippingPriority _,
    "q5_local_supplier" -> q5LocalSupplier _,
    "q1_pricing_summary" -> q1PricingSummary _,
    "q_skew_join" -> qSkewJoin _,
    "q_projection" -> qProjection _,
    "q_derived" -> qDerived _,
    "q_cast_rename" -> qCastRename _,
    "q_filter_compound" -> qFilterCompound _,
    "q_filter_isin" -> qFilterIsin _,
    "q_null_handling" -> qNullHandling _,
    "q_join_left" -> qJoinLeft _,
    "q_join_broadcast" -> qJoinBroadcast _,
    "q_join_semi" -> qJoinSemi _,
    "q_join_anti" -> qJoinAnti _,
    "q_join_star" -> qJoinStar _,
    "q_topk" -> qTopk _,
    "q_pagination" -> qPagination _,
    "q_pagination_chunked" -> qPaginationChunked _,
    "q_keyset_page" -> qKeysetPage _,
    "q_upsert_latest" -> qUpsertLatest _,
    "q_scd2_merge" -> qScd2Merge _,
    "q_pit_join" -> qPitJoin _,
    "q_distinct" -> qDistinct _,
    "q_group_count" -> qGroupCount _,
    "q_rollup" -> qRollup _,
    "q_union" -> qUnion _,
    "q_intersect" -> qIntersect _,
    "q_except" -> qExcept _,
    "q_null_audit" -> qNullAudit _,
    "q_temporal_split" -> qTemporalSplit _,
  )

  private val PaginationSql =
    """SELECT c_custkey, c_name, c_acctbal, rn FROM (
      |  SELECT c_custkey, c_name, c_acctbal,
      |    row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer) WHERE rn BETWEEN 21 AND 30 ORDER BY rn""".stripMargin

  val oracles: Map[String, String] = Map(
    // revenue is the exact integer ten-thousandths product summed as
    // BIGINT on both sides; the top-10 set is deterministic because the
    // (revenue DESC, order_date, l_orderkey) order ends in a unique key
    "q3_shipping_priority" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev4
        |  FROM lineitem WHERE l_shipdate > TIMESTAMP '1997-01-01')
        |SELECT li.l_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
        |  o.o_orderpriority,
        |  floor((CAST(sum(li.rev4) AS BIGINT) / 10000.0) * 1e2 + 0.5) / 1e2 AS revenue
        |FROM li
        |JOIN orders o ON li.l_orderkey = o.o_orderkey
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |  AND c.c_mktsegment = 'BUILDING'
        |GROUP BY li.l_orderkey, order_date, o.o_orderpriority
        |ORDER BY revenue DESC, order_date, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n.n_name,
        |  floor((CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
        |    * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
        |    / 10000.0) * 1e2 + 0.5) / 1e2 AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |  AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n.n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    // the SCD2 oracle states the expected history from the same residue
    // classes the batch is derived from: non-updated keys pass through,
    // updated keys contribute a closed old version AND an opened new
    // one, inserted keys open at the batch date
    "q_scd2_merge" ->
      """WITH base AS (
        |  SELECT c_custkey, c_name, c_mktsegment, c_nationkey FROM customer)
        |SELECT c_custkey, c_name, c_mktsegment, c_nationkey,
        |  DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
        |  TRUE AS is_current
        |FROM base WHERE c_custkey % 10 <> 3
        |UNION ALL
        |SELECT c_custkey, c_name, c_mktsegment, c_nationkey,
        |  DATE '2024-01-01', DATE '2024-06-01', FALSE
        |FROM base WHERE c_custkey % 10 = 3
        |UNION ALL
        |SELECT c_custkey, c_name, 'RELOCATED', CAST((c_nationkey + 1) % 25 AS INTEGER),
        |  DATE '2024-06-01', NULL, TRUE
        |FROM base WHERE c_custkey % 10 = 3
        |UNION ALL
        |SELECT c_custkey + 9000000, c_name, 'FOUNDED', c_nationkey,
        |  DATE '2024-06-01', NULL, TRUE
        |FROM base WHERE c_custkey % 100 = 7
        |ORDER BY c_custkey, valid_from""".stripMargin,
    "q_pit_join" ->
      """WITH hist AS (
        |  SELECT c_custkey, c_mktsegment,
        |         DATE '1992-01-01' AS valid_from,
        |         CASE WHEN c_custkey % 10 = 3 THEN DATE '1995-06-01' END AS valid_to
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'RELOCATED', DATE '1995-06-01', NULL
        |  FROM customer WHERE c_custkey % 10 = 3)
        |SELECT o.o_orderkey, o.o_custkey AS c_custkey,
        |       CAST(o.o_orderdate AS DATE) AS o_day,
        |       h.c_mktsegment AS seg_at_order
        |FROM orders o LEFT JOIN hist h
        |  ON o.o_custkey = h.c_custkey
        | AND h.valid_from <= CAST(o.o_orderdate AS DATE)
        | AND (h.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < h.valid_to)
        |ORDER BY o_orderkey""".stripMargin,
    // the salted join's oracle is the PLAIN join — identical result by
    // construction is exactly the property being checked
    "q_skew_join" ->
      """SELECT e.event_id, e.user_id, e.value, s.n_signups
        |FROM events e
        |JOIN (SELECT user_id, count(*) AS n_signups FROM events
        |      WHERE event_type = 'signup' GROUP BY user_id) s USING (user_id)
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  floor((sum(l_quantity)) * 1e2 + 0.5) / 1e2 AS sum_qty,
        |  floor((sum(l_extendedprice)) * 1e2 + 0.5) / 1e2 AS sum_base_price,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS sum_disc_price,
        |  floor((avg(l_quantity)) * 1e4 + 0.5) / 1e4 AS avg_qty,
        |  floor((sum(CAST(round(l_discount * 100) AS BIGINT)) / (count(l_discount) * 100.0)) * 1e4 + 0.5) / 1e4 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_projection" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate < '1999-06-01' ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_derived" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor((l_extendedprice * (1 - l_discount)) * 1e4 + 0.5) / 1e4 AS revenue,
        |  floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1e6 + 0.5) / 1e6 AS charge,
        |  floor((l_quantity * l_extendedprice) * 1e2 + 0.5) / 1e2 AS gross
        |FROM lineitem WHERE l_orderkey < 500 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_cast_rename" ->
      """SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no,
        |  CAST(floor(l_quantity) AS INTEGER) AS qty_int, l_returnflag AS flag
        |FROM lineitem WHERE l_orderkey < 200 ORDER BY order_id, line_no""".stripMargin,
    "q_filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag != 'N' AND l_discount IS NOT NULL
        |  AND l_shipdate BETWEEN '1999-01-01' AND '2000-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_isin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AND c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin,
    "q_null_handling" ->
      """SELECT coalesce(nullif(l_discount, 0.0), -1.0) AS d, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY d""".stripMargin,
    "q_join_left" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 490000 ORDER BY o_orderkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT p_brand,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_star" ->
      """SELECT r_name, n_name,
        |  floor((sum(l_extendedprice * (1 - l_discount))) * 1e4 + 0.5) / 1e4 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_pagination" -> PaginationSql,
    // the chunk-stitched twin shares the oracle VERBATIM — equality
    // with the total-order row_number is exactly the property
    "q_pagination_chunked" -> PaginationSql,
    "q_keyset_page" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderkey > 1000
        |ORDER BY o_orderkey LIMIT 20""".stripMargin,
    "q_upsert_latest" ->
      """SELECT user_id, event_id AS last_event_id, value AS last_value
        |FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_group_count" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  floor((sum(l_quantity)) * 1e2 + 0.5) / 1e2 AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q_union" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
        |ORDER BY c_custkey""".stripMargin,
    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY c_custkey""".stripMargin,
    "q_except" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 9500
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 350000
        |ORDER BY c_custkey""".stripMargin,
    "q_null_audit" ->
      """SELECT
        |  count(*) - count(o_orderkey) AS o_orderkey,
        |  count(*) - count(o_custkey) AS o_custkey,
        |  count(*) - count(o_orderstatus) AS o_orderstatus,
        |  count(*) - count(o_totalprice) AS o_totalprice,
        |  count(*) - count(o_orderdate) AS o_orderdate,
        |  count(*) - count(o_orderpriority) AS o_orderpriority
        |FROM orders""".stripMargin,
    "q_temporal_split" ->
      """SELECT CASE WHEN o_orderdate < c.cutoff THEN 'train' ELSE 'test' END AS split,
        |  count(*) AS cnt,
        |  CAST(min(o_orderdate) AS DATE) AS min_d,
        |  CAST(max(o_orderdate) AS DATE) AS max_d
        |FROM orders,
        |  (SELECT max(o_orderdate) - INTERVAL 14 DAY AS cutoff FROM orders) c
        |GROUP BY 1 ORDER BY split""".stripMargin,
  )
}
