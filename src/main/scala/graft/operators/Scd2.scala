package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge — the warehouse-maintenance
  * half of the reference's ingest path (firebasedb.py's upsert-by-key
  * document writes keep only the LATEST version; SCD2 is the
  * history-preserving form a training-data warehouse needs when "what
  * did this dimension row say at cutoff date D" must stay answerable).
  *
  * Semantics, per dimension key in `current` ∪ `changes`:
  *  - key only in `current`, or the change is attribute-identical
  *    (null-safe): the current row passes through untouched;
  *  - key in both with any tracked attribute differing: the current
  *    row is CLOSED (`valid_to` = batchDate, `is_current` = false) and
  *    a new version opens (`valid_from` = batchDate, open `valid_to`,
  *    `is_current` = true);
  *  - key only in `changes`: a brand-new dimension row opens at
  *    batchDate.
  * Already-closed history rows (`is_current` = false) never touch the
  * merge — they are unioned back verbatim.
  *
  * Scale shape (the Delta/Iceberg MERGE pattern, expressed as one
  * relational plan): a SINGLE full-outer join on the key between the
  * current slice and the batch — broadcast when the batch is a daily
  * trickle, shuffle-on-key otherwise — then each joined row emits its
  * 1-or-2 output versions through one `explode` of a conditional
  * struct array. Neither input is read twice, there is no
  * union-of-three-projections re-scan, and the history slice is
  * separated by an `is_current` predicate a partitioned table would
  * prune at the scan. */
object Scd2 {

  private val MetaCols = Seq("valid_from", "valid_to", "is_current")

  /** Merge `changes` (key + tracked attributes, one row per key) into
    * the SCD2 table `current` (key + the same attributes + `valid_from`
    * / `valid_to` / `is_current`). `batchDate` must be a literal of the
    * same type as the validity columns. */
  def merge(current: DataFrame, changes: DataFrame, keyCols: Seq[String],
            batchDate: Column): DataFrame = {
    val attrs = current.columns.toSeq.filterNot(keyCols.contains).filterNot(MetaCols.contains)
    require(keyCols.nonEmpty, "scd2Merge: at least one key column")
    require(MetaCols.forall(current.columns.contains),
      s"scd2Merge: `current` must carry ${MetaCols.mkString(", ")}")
    require(changes.columns.toSet == (keyCols ++ attrs).toSet,
      s"scd2Merge: `changes` columns ${changes.columns.mkString(",")} must be " +
        s"exactly key ${keyCols.mkString(",")} + tracked ${attrs.mkString(",")}")

    // a NULL is_current routes to the history passthrough (review r10
    // find: `filter(!c)` and `filter(c)` BOTH exclude null, silently
    // dropping the row); the current slice is then non-null TRUE by
    // construction, which the post-join presence marker relies on
    val hist = current.filter(!coalesce(col("is_current"), lit(false)))
    val curr = current.filter(coalesce(col("is_current"), lit(false)))
    // one-row-per-key is a hard precondition (a duplicate fans the
    // full-outer join out into duplicate closes and two open versions
    // per key); enforce it in-plan on the batch side — the count rides
    // a window over the (small) changes frame and the raise fires
    // before a corrupted history can be emitted
    val chg = changes.select((keyCols ++ attrs).map(c => col(c).as(s"__chg_$c")): _*)
      .withColumn("__chg_present", lit(true))
      .withColumn("__chg_dup",
        count(lit(1)).over(Window.partitionBy(keyCols.map(c => col(s"__chg_$c")): _*)))

    // null-safe key equality: a null key component still pairs its two
    // sides instead of silently fanning into both unmatched branches
    val joined = curr.join(chg,
      keyCols.map(k => col(k) <=> col(s"__chg_$k")).reduce(_ && _), "full_outer")

    // presence markers survive the full outer join as non-null exactly
    // on matched rows (`is_current` is TRUE on every current-slice row
    // by construction; `__chg_present` is the explicit twin for the
    // change side, so a legitimately-null key component can't misread
    // as "unmatched")
    val matchedCurr = col("is_current").isNotNull
    val matchedChg = col("__chg_present").isNotNull
    // an attribute-free dimension can never "change" — reduceOption so
    // the degenerate schema is a pass-through/insert merge, not an
    // empty.reduce crash (review r10 find)
    val attrChanged = attrs.map(a => !(col(a) <=> col(s"__chg_$a")))
      .reduceOption(_ || _).getOrElse(lit(false))

    // the duplicate-key raise rides the first key field of every
    // emitted version (a standalone assertion column would be pruned
    // as unreferenced — the incrementalDedup guard precedent)
    def guardedKey(k: String): Column =
      when(col("__chg_dup") > 1,
        raise_error(concat(
          lit("scd2Merge: `changes` must have one row per key; duplicate " +
            s"$k value: "), col(s"__chg_$k").cast("string"))))
        .otherwise(coalesce(col(k), col(s"__chg_$k")))

    def version(useChg: Boolean, from: Column, to: Column, cur: Column): Column =
      struct(
        (guardedKey(keyCols.head).as(keyCols.head) +:
          keyCols.tail.map(k => coalesce(col(k), col(s"__chg_$k")).as(k))) ++
          attrs.map(a => (if (useChg) col(s"__chg_$a") else col(a)).as(a)) ++
          Seq(from.as("valid_from"), to.as("valid_to"), cur.as("is_current")): _*)

    val passthrough = version(useChg = false, col("valid_from"), col("valid_to"), col("is_current"))
    val closed = version(useChg = false, col("valid_from"), batchDate, lit(false))
    // `when(false, batchDate)` is NULL carrying batchDate's type — the
    // open-ended valid_to stays type-consistent without reaching into
    // the expression for the DataType
    val opened = version(useChg = true, batchDate, when(lit(false), batchDate), lit(true))

    val versions = when(!matchedChg, array(passthrough))
      .when(!matchedCurr, array(opened))
      .when(attrChanged, array(closed, opened))
      .otherwise(array(passthrough))

    joined.select(explode(versions).as("__v")).select(col("__v.*"))
      .unionByName(hist)
  }

  /** Point-in-time dimension join — the leakage-free feature lookup
    * over an SCD2 history ([[merge]]'s output, or any frame with
    * non-overlapping `valid_from`/`valid_to` windows per key): each
    * fact row pairs with the ONE version valid at its timestamp
    * (`valid_from ≤ ts < valid_to`, open-ended null `valid_to`). This
    * is the feature-store correctness join: training features joined
    * as-of the label's timestamp cannot leak post-event attribute
    * values (the q_temporal_split discipline, applied to dimensions).
    *
    * Scale shape: the equality on the key carries the join (broadcast
    * for a dim, shuffle-on-key otherwise — NEVER a
    * BroadcastNestedLoop: the validity predicate rides the hash join
    * as its residual condition); per-fact fan-out before the residual
    * is bounded by that key's version count, and non-overlapping
    * windows guarantee ≤ 1 surviving match, so the left semantics are
    * preserved exactly (a fact before its key's first version, or with
    * no key match at all, keeps null dimension columns). */
  def pointInTimeJoin(facts: DataFrame, history: DataFrame,
                      keyCols: Seq[String], tsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "pointInTimeJoin: at least one key column")
    require(Seq("valid_from", "valid_to").forall(history.columns.contains),
      "pointInTimeJoin: `history` must carry valid_from/valid_to")
    val dimCols = history.columns.toSeq.filterNot(_ == "is_current")
    val h = history.select(dimCols.map(c => col(c).as(s"__h_$c")): _*)
    val ts = col(tsCol)
    val cond = keyCols.map(k => col(k) <=> col(s"__h_$k")).reduce(_ && _) &&
      col("__h_valid_from") <= ts &&
      (col("__h_valid_to").isNull || ts < col("__h_valid_to"))
    facts.join(h, cond, "left")
      .select(facts.columns.map(col) ++
        dimCols.filterNot(keyCols.contains)
          .map(c => col(s"__h_$c").as(if (c.startsWith("valid_")) s"dim_$c" else c)): _*)
  }
}
