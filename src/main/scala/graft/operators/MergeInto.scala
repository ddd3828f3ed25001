package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQL:2003 `MERGE INTO` semantics over immutable snapshots — the batch
  * upsert every lakehouse table format exposes (Delta/Iceberg/Hudi `MERGE`),
  * expressed as one full-outer equi-join so Catalyst picks the join
  * strategy (broadcast for a small source batch, shuffle-hash/SMJ
  * otherwise) and AQE handles skew:
  *
  *   - WHEN MATCHED THEN UPDATE — target row rewritten through
  *     `setOnMatch` (expressions may reference both sides via the `t_`/`s_`
  *     prefixed column namespaces);
  *   - WHEN NOT MATCHED THEN INSERT — source row mapped onto the target
  *     schema through `insertOnUnmatched`;
  *   - target rows with no source match carry through unchanged.
  *
  * The SQL standard's cardinality violation ("a target row matched more
  * than one source row") is enforced eagerly when `checkCardinality` —
  * duplicate source keys would otherwise silently fan the target out. The
  * check is one agg over the source's key columns (cheap next to the
  * join); callers with an upstream uniqueness guarantee can skip it.
  *
  * 100 TB shape: output = |target| + |source inserts| rows through ONE
  * shuffle on the merge keys (or zero store-side shuffles when the target
  * is stored bucketed by the keys and the source is broadcast-sized — the
  * same layout argument as AnnIvf/LshIndex stores). This is the batch
  * CORE; the streaming continuous variant is
  * [[graft.streaming.VersionedView.mergeSink]] (latest-row-wins, a special
  * case of `setOnMatch = all source columns`).
  */
object MergeInto {

  /** Merge `source` into `target` on equality of `keys`.
    *
    * Inside `setOnMatch` / `insertOnUnmatched` / `deleteOnMatch`, reference
    * target columns as `t_<name>` and source columns as `s_<name>`;
    * `setOnMatch` lists only the target columns being updated (others carry
    * through), while `insertOnUnmatched` must cover every non-key target
    * column (missing ones insert as NULL — SQL's unlisted-column default).
    *
    * `deleteOnMatch` is SQL's `WHEN MATCHED AND <cond> THEN DELETE` branch:
    * matched rows satisfying the predicate are dropped (and `setOnMatch`
    * never applies to them — DELETE wins, matching the standard's
    * first-matching-clause rule when the delete clause is listed first).
    * A NULL predicate result means not-deleted (3VL). Source rows whose
    * key is UNMATCHED and that satisfy `deleteOnMatch` are discarded, not
    * inserted — a delete for a row that never arrived (the CDC replay
    * case) must be a no-op, not a resurrection.
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      setOnMatch: Map[String, Column],
      insertOnUnmatched: Map[String, Column],
      checkCardinality: Boolean = true,
      deleteOnMatch: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    if (checkCardinality) {
      // NULL-key source rows match no target row (3VL), so duplicates among
      // them are not a violation — only non-null key groups are checked
      val dup = source.na.drop("any", keys).groupBy(keys.map(col): _*).count()
        .filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"MERGE cardinality violation: duplicate source key ${dup.head.toSeq.init.mkString("(", ", ", ")")}")
    }
    val tcols = target.columns
    // presence flags, not key-nullability: a NULL key value in either input
    // must not masquerade as "row absent" after the outer join (NULL keys
    // never match — 3VL — so such rows always take the carry/insert branch)
    val t = target.select(target.columns.map(c => col(c).as(s"t_$c")) :+
      lit(1).as("_t_present"): _*)
    val s = source.select(source.columns.map(c => col(c).as(s"s_$c")) :+
      lit(1).as("_s_present"): _*)
    val cond = keys.map(k => t(s"t_$k") === s(s"s_$k")).reduce(_ && _)
    val joined0 = t.join(s, cond, "full_outer")
    val matched = col("_t_present").isNotNull && col("_s_present").isNotNull
    val joined = deleteOnMatch match {
      case None => joined0
      // DELETE branch: drop matched rows satisfying the predicate, and
      // discard unmatched-source delete rows instead of inserting them
      case Some(del) =>
        joined0.filter(
          !(coalesce(del, lit(false)) &&
            (matched || col("_t_present").isNull)))
    }
    val out = tcols.map { c =>
      val carried = col(s"t_$c")
      val updated = setOnMatch.getOrElse(c, carried)
      val inserted =
        if (keys.contains(c)) col(s"s_$c")
        else insertOnUnmatched.getOrElse(c, lit(null))
      when(matched, updated)
        .when(col("_t_present").isNull, inserted)
        .otherwise(carried)
        .as(c)
    }
    joined.select(out: _*)
  }
}
