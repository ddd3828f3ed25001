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
    * NUL must pre-coalesce to its own sentinel.
    */
  def assign(df: DataFrame, key: Column, shards: Seq[Int]): DataFrame = {
    require(shards.nonEmpty, "rendezvous over an empty shard list")
    val k = coalesce(key.cast("string"), lit("\u0000null"))
    val scored = transform(
      typedlit(shards),
      sh => struct(
        md5(concat(k, lit(":"), sh.cast("string"))).as("k"),
        sh.as("sh")))
    df.withColumn("shard", array_max(scored).getField("sh"))
  }
}
