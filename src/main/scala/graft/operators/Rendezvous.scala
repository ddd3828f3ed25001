package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) hashing — the shard-assignment rule a
  * 100 TB corpus store actually wants: each key independently scores every
  * shard with a keyed hash and lands on the argmax. Properties that matter
  * at scale (both pinned in IntervalSpec):
  *
  *   - BALANCE: md5 scores are uniform, so shard sizes concentrate around
  *     n/|shards|.
  *   - MINIMAL REMAP: removing a shard remaps ONLY the keys that lived on
  *     it (their runner-up becomes the winner; every other key's argmax is
  *     untouched) — vs mod-N hashing, where removing one shard reshuffles
  *     (N−1)/N of ALL keys. This is why HRW/consistent hashing is the
  *     standard for cache rings and shard maps (Thaler & Ravishankar 1996).
  *
  * Execution shape: ONE map-side expression — a `transform` over the shard
  * list builds (md5(key:shard), shard) structs, `array_max` picks the
  * lexicographic argmax (md5 first, then shard id — md5 ties are 2^-64
  * events). No explode, no shuffle, no window: assignment is pure
  * per-row codegen'd projection, so it composes with any downstream
  * partitioner for free (`df.repartition(col("shard"))` to co-locate).
  */
object Rendezvous {

  /** Appends `shard` (INT): the HRW winner among `shards` for `key`.
    * NULL keys would null every md5 score (argmax over all-null structs →
    * undefined shard), so the key is canonicalized through a sentinel
    * first: all NULL keys score identically and land together on one
    * well-defined shard. The sentinel `"\u0000null"` starts with a NUL
    * byte, outside the value space of every key column in play (ids,
    * numbers cast to string, parsed text); a caller whose keys can carry
    * NUL must pre-coalesce to its own sentinel. That caveat is ENFORCED,
    * not just documented: a non-null key starting with NUL raises at
    * runtime (one codegen'd startswith per row, negligible next to the
    * md5 work) instead of silently colliding with the sentinel's shard.
    */
  def assign(df: DataFrame, key: Column, shards: Seq[Int]): DataFrame = {
    require(shards.nonEmpty, "rendezvous over an empty shard list")
    val ks = key.cast("string")
    val guarded = when(ks.startsWith("\u0000"), raise_error(
      lit("Rendezvous.assign: key starts with NUL and would collide with " +
        "the NULL sentinel; pre-coalesce such keys to a caller-owned sentinel")))
      .otherwise(ks)
    val k = coalesce(guarded, lit("\u0000null"))
    val scored = transform(
      typedlit(shards),
      sh => struct(
        md5(concat(k, lit(":"), sh.cast("string"))).as("k"),
        sh.as("sh")))
    df.withColumn("shard", array_max(scored).getField("sh"))
  }
}
