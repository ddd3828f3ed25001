package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2.2 [EXT]) in all three directions — the natural
  * tick-data lookup the reference's MySQL 5.7 surface could only emulate
  * with correlated subqueries:
  *
  *   - `backward` (default): latest right row with right.ts <= left.ts
  *   - `forward`:  earliest right row with right.ts >= left.ts
  *   - `nearest`:  whichever of the two is closer in time (ties → backward,
  *     matching pandas merge_asof's tie preference for the past)
  *
  * Spark has no built-in as-of join; this implements the scalable
  * union + windowed last()/first() formulation (SURVEY §7.3.3):
  *
  *   1. tag rows by side, union them on (keys, ts, side);
  *   2. one shuffle on the key columns, one sort per direction inside each
  *      partition — identical cost profile to a sort-merge join;
  *   3. running last(payload, ignoreNulls) over the preceding frame (or
  *      first() over the following frame) gives every left row the adjacent
  *      right row; the side tag breaks ts ties so the match is INCLUSIVE on
  *      equality in both directions;
  *   4. keep the left rows.
  *
  * At 100 TB this is ONE shuffle of left+right with no row amplification —
  * strictly better than the non-equi-join fallback Catalyst would pick
  * (BroadcastNestedLoopJoin) for the same predicate. `nearest` costs one
  * extra in-partition sort (both direction windows share the one exchange).
  *
  * Rows in `right` must be unique per (keys, ts) — pre-aggregate if not,
  * otherwise "the" match is ambiguous (the reference stack has the same
  * requirement, it just never documents it).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side, unique per (keys, tsCol)
    * @param keys       equality key column names (present on both sides)
    * @param tsCol      timestamp column name (present on both sides)
    * @param rightVals  right payload columns to carry; emitted as
    *                   `<prefix><name>` alongside `<prefix><tsCol>`
    * @param prefix     prefix for emitted right columns
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightVals: Seq[String], prefix: String = "asof_"): DataFrame =
    joined(left, right, keys, tsCol, rightVals, prefix, "backward")

  /** Earliest right row with right.ts >= left.ts (same contract as
    * `backward` otherwise).
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightVals: Seq[String], prefix: String = "asof_"): DataFrame =
    joined(left, right, keys, tsCol, rightVals, prefix, "forward")

  /** Closer of the backward/forward matches by |Δts|; exact ties take the
    * backward (past) match.
    */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightVals: Seq[String], prefix: String = "asof_"): DataFrame =
    joined(left, right, keys, tsCol, rightVals, prefix, "nearest")

  private def joined(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightVals: Seq[String], prefix: String, direction: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideCol = "_asof_side"

    // left payload columns ride along as nulls on the right side
    val extraLeft = leftCols.filterNot(c => keys.contains(c) || c == tsCol)

    // The right timestamp and ALL payload columns travel as ONE struct so a
    // single last/first(_, ignoreNulls) matches them atomically: every
    // emitted column comes from the SAME right row, and a right payload
    // value that is genuinely NULL survives (filling each column
    // independently would silently substitute it from another row).
    val payloadCol = "_r_payload"
    val payloadType = org.apache.spark.sql.types.StructType(
      right.schema(tsCol) +: rightVals.map(right.schema(_)))

    val rightUnion = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as(sideCol)) ++
        extraLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct((tsCol +: rightVals).map(col): _*).as(payloadCol)): _*)
    val leftUnion = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as(sideCol)) ++
        extraLeft.map(col) ++
        Seq(lit(null).cast(payloadType).as(payloadCol)): _*)

    // Inclusive equality via the side tag: backward sorts right(0) BEFORE
    // left(1) at equal ts so the preceding frame sees it; forward sorts
    // right AFTER left (side desc) so the following frame sees it. Both
    // windows share one hash exchange on the keys.
    def wB: WindowSpec = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def wF: WindowSpec = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(sideCol).desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val back = last(col(payloadCol), ignoreNulls = true).over(wB)
    val fwd = first(col(payloadCol), ignoreNulls = true).over(wF)
    val matched: Column = direction match {
      case "backward" => back
      case "forward"  => fwd
      case "nearest"  =>
        // distance works for TIMESTAMP and for numeric epoch ts columns
        // alike (backward/forward only compare ordinally, so nearest must
        // not narrow the shared contract to timestamps)
        val toLong: Column => Column =
          if (right.schema(tsCol).dataType == org.apache.spark.sql.types.TimestampType)
            unix_micros _
          else (c: Column) => c.cast("long")
        val db = toLong(col(tsCol)) - toLong(back.getField(tsCol))
        val df = toLong(fwd.getField(tsCol)) - toLong(col(tsCol))
        when(fwd.isNull, back).when(back.isNull, fwd)
          .when(db <= df, back).otherwise(fwd)
    }
    val matchedCols: Seq[Column] =
      matched.getField(tsCol).as(s"$prefix$tsCol") +:
        rightVals.map(c => matched.getField(c).as(s"$prefix$c"))

    rightUnion.unionByName(leftUnion)
      .select((keys.map(col) ++ Seq(col(tsCol), col(sideCol)) ++ extraLeft.map(col)) ++ matchedCols: _*)
      .filter(col(sideCol) === 1)
      .drop(sideCol)
  }

  /** Backward as-of join through the NATIVE Catalyst operator
    * (`plans.AsOfJoinPlan` → `plans.AsOfJoinExec`): same match semantics
    * and column SET as [[backward]] — left columns, then `<prefix><tsCol>`,
    * `<prefix><v>`… — but left columns keep `left.output` ORDER, whereas
    * the window formulation reorders them to (keys, ts, extras). Select by
    * name when swapping formulations. Planned as a first-class sort-merge
    * as-of — no union glue, no window frame, O(|L|+|R|) streaming merge per
    * partition after one shuffle+sort of each side. NativeAsOfSpec pins
    * row-set parity between the two formulations; q74 pins this one
    * against DuckDB's native ASOF JOIN.
    */
  def backwardNative(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightVals: Seq[String], prefix: String = "asof_"): DataFrame =
    native(left, right, keys, tsCol, rightVals, prefix, graft.plans.AsOfBackward)

  /** Forward as-of (earliest right with rTs >= lTs, inclusive) through the
    * native operator — same contract as [[forward]].
    */
  def forwardNative(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightVals: Seq[String], prefix: String = "asof_"): DataFrame =
    native(left, right, keys, tsCol, rightVals, prefix, graft.plans.AsOfForward)

  /** Nearest as-of (closer of backward/forward by |Δts|, ties → backward)
    * through the native operator — same contract as [[nearest]]. Requires a
    * timestamp or integral ts column (the distance needs a numeric).
    */
  def nearestNative(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightVals: Seq[String], prefix: String = "asof_"): DataFrame =
    native(left, right, keys, tsCol, rightVals, prefix, graft.plans.AsOfNearest)

  /** SKEW-PROOF backward as-of through the native operator. AQE's
    * OptimizeSkewedJoin rewrites only the stock shuffled joins
    * (SortMergeJoinExec / ShuffledHashJoinExec) — it does NOT know how to
    * split a custom exec node, so a pathologically hot key funnels into
    * one AsOfJoinExec partition no matter what AQE is configured to do
    * (SkewAsOfSpec pins exactly that). The structural fix is salting with
    * REFERENCE REPLICATION:
    *
    *   - every probe row gets a deterministic salt in [0, salts) hashed
    *     from `saltBy` (default: the ts column — any column that spreads
    *     the hot key's rows works);
    *   - every reference row is replicated to ALL salts;
    *   - the native as-of runs on keys :+ salt: each (key, salt) bucket
    *     holds the key's FULL reference history and ~1/salts of its
    *     probes, so per-bucket semantics are exact and the hot partition
    *     splits `salts` ways.
    *
    * Cost: salts× the reference side's shuffle volume — the right trade
    * whenever references are much smaller than probes (ticks vs quotes,
    * events vs dimension versions). Forward/nearest compose identically;
    * start from this method if they ever need the same treatment.
    */
  def backwardNativeSalted(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightVals: Seq[String], prefix: String = "asof_",
      salts: Int = 8, saltBy: Option[Column] = None): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    val saltCol = "_asof_salt"
    require(!left.columns.contains(saltCol) && !right.columns.contains(saltCol),
      s"column $saltCol already exists on an input")
    val saltedLeft = left.withColumn(saltCol,
      pmod(hash(saltBy.getOrElse(col(tsCol))), lit(salts)))
    val replicatedRight = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    native(saltedLeft, replicatedRight, keys :+ saltCol, tsCol, rightVals,
      prefix, graft.plans.AsOfBackward)
      .drop(saltCol)
  }

  private def native(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightVals: Seq[String], prefix: String,
      direction: graft.plans.AsOfDirection): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val spark = left.sparkSession
    GraftSqlBridge.addStrategy(spark, graft.plans.AsOfJoinStrategy)

    // Alias every kept right column: Alias mints fresh exprIds, so the two
    // sides can never carry colliding attribute ids (the analyzer dedups
    // ids for built-in Join nodes only — a custom node must self-insure
    // against e.g. a self-as-of on one scan).
    require(!keys.contains(tsCol),
      s"tsCol '$tsCol' must not also be an equality key — drop it from keys " +
        "(the as-of match already equates keys and orders on tsCol)")
    require(keys.distinct == keys,
      s"duplicate key column(s): ${keys.diff(keys.distinct).distinct.mkString(", ")}")
    require(!rightVals.contains(tsCol),
      s"rightVals must not include tsCol '$tsCol' — it is always emitted as " +
        s"'$prefix$tsCol'")
    require(rightVals.distinct == rightVals,
      s"duplicate rightVals column(s): ${rightVals.diff(rightVals.distinct).distinct.mkString(", ")}")
    val payNames = (tsCol +: rightVals).map(prefix + _)
    val clash = left.columns.toSet.intersect(payNames.toSet)
    require(clash.isEmpty,
      s"left side already has column(s) ${clash.mkString(", ")} that the as-of payload " +
        "would emit — pick a different prefix")
    val rightP = right.select(
      (keys :+ tsCol).map(c => col(c).as(c)) ++
        (tsCol +: rightVals).map(c => col(c).as(prefix + c)): _*)

    val lPlan = GraftSqlBridge.analyzed(left)
    val rPlan = GraftSqlBridge.analyzed(rightP)
    // exact name first, then case-insensitive (mirroring the analyzer's
    // default resolution); ambiguity is an error, not a silent first-match
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) = {
      val exact = plan.output.filter(_.name == name)
      val hits = if (exact.nonEmpty) exact else plan.output.filter(_.name.equalsIgnoreCase(name))
      hits match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"column $name is ambiguous among ${many.map(_.name)}")
      }
    }

    GraftSqlBridge.ofRows(spark, graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, tsCol), attr(rPlan, tsCol),
      payNames.map(attr(rPlan, _)), direction))
  }
}
