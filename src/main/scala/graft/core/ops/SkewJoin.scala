package graft.core.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware join: salt the hot keys of the large side, replicate the small
  * side per salt, join on (key, salt). AQE's skew-join handles sort-merge
  * skew at runtime; explicit salting is for the cases AQE can't touch —
  * aggregation-feeding joins where one key dominates (the classic hot
  * `dataset_id` / null-key upload batches at 100 TB).
  *
  * Cost model: the small side grows `saltFactor`×; the large side's hot
  * partitions split `saltFactor` ways. Use on joins whose skew is KNOWN
  * (e.g. from `keyHistogram`); leave uniform joins to Catalyst.
  */
object SkewJoin {

  /** Top-k key frequencies of `key` — the cheap skew diagnostic. */
  def keyHistogram(df: DataFrame, key: String, k: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n")).orderBy(col("n").desc).limit(k)

  /** Inner equi-join `large ⋈ small` on `key`, salted `saltFactor` ways.
    * Result equals `large.join(small, key)` exactly; only the partitioning
    * of the shuffle changes.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    // Large side: random-but-deterministic salt per row (hash of all
    // columns mod saltFactor spreads hot keys; xxhash64 is codegen'd).
    val largeSalted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(c => col(s"`$c`")): _*), lit(saltFactor)))
    // Small side: replicate each row saltFactor times.
    val smallSalted = small
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    largeSalted.join(smallSalted,
        largeSalted("__salt") === smallSalted("__salt") &&
          largeSalted(key) === smallSalted(key))
      .drop("__salt")
      .drop(smallSalted(key))
  }

  /** Salted aggregation: two-phase groupBy for a hot grouping key — partial
    * aggregate on (key, salt), then final aggregate on key. For algebraic
    * aggregates Spark's map-side partial aggregation already does this; the
    * explicit form is for `collect_list`-style holistic aggregates whose
    * single reducer would otherwise OOM on the hot key.
    */
  def saltedCollect(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    df.withColumn("__salt", pmod(xxhash64(col(s"`$valueCol`")), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_list(col(s"`$valueCol`")).as("__partial"))
      .groupBy(col(key))
      .agg(sort_array(flatten(collect_list(col("__partial")))).as("values"))
  }
}
