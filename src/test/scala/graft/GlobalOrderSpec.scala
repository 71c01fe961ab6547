package graft

import graft.operators.GlobalOrder
import org.apache.spark.sql.functions._

class GlobalOrderSpec extends SparkSpecBase {

  import spark.implicits._

  test("dense index follows the total order exactly, from any input order") {
    val rows = Seq(("pear", 7L), ("apple", 3L), ("pear", 2L), ("fig", 9L),
      ("apple", 8L), ("fig", 1L), ("apple", 4L))
    val indexed = GlobalOrder.index(
        rows.toDF("k", "id").repartition(5), col("k"), col("id"))
      .collect().map(r => (r.getLong(2), r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val expected = rows.sortBy(identity).zipWithIndex
      .map { case ((k, id), i) => (i.toLong, k, id) }
    assert(indexed.toSeq === expected)
  }

  test("a 100%-hot key splits across multiple range tasks (the de-skew claim)") {
    // every row shares one key — the Zipf worst case. The unique
    // tiebreak column lets repartitionByRange split the key by COUNT,
    // so no task holds the whole run (what a key-partitioned window
    // could never do). AQE legitimately coalesces this KB-sized test
    // input into one partition (it is below the advisory size); turn
    // coalescing off so the spec observes the partitioner's boundary
    // mechanics, which is what carries the claim at real volume.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    val hot = spark.range(20000).select(lit("the").as("k"), col("id"))
    val sizes =
      try GlobalOrder.sorted(hot, col("k"), col("id"))
        .rdd.mapPartitions(it => Iterator.single(it.size)).collect()
      finally spark.conf.set(coalesceKey, prev)
    assert(sizes.sum === 20000)
    assert(sizes.count(_ > 0) > 1, s"hot key must span tasks: ${sizes.toSeq}")
    assert(sizes.max < 20000, "no single task may hold the whole key")
    // and the dense index over it is still exact
    val rns = GlobalOrder.index(hot, col("k"), col("id"))
      .agg(min("rn"), max("rn"), count(lit(1))).head()
    assert(rns.getLong(0) === 0L && rns.getLong(1) === 19999L && rns.getLong(2) === 20000L)
  }
}
