package graft

import graft.operators.Analytic
import graft.plans.IntervalJoin
import java.sql.Timestamp

class IntervalJoinSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("mismatched key/time types fail at analysis with a clear message") {
    import spark.implicits._
    val iv = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("r_key", "r_start", "r_end")
    val ptIntKey = Seq((1, ts("2024-01-01 10:15:00"))).toDF("p_key", "p_ts")
    val e1 = intercept[IllegalArgumentException](
      IntervalJoin.join(ptIntKey, iv, "p_key", "r_key", "p_ts", "r_start", "r_end"))
    assert(e1.getMessage.contains("key types differ"))
    val ptLongTime = Seq((1L, 42L)).toDF("p_key", "p_ts")
    val e2 = intercept[IllegalArgumentException](
      IntervalJoin.join(ptLongTime, iv, "p_key", "r_key", "p_ts", "r_start", "r_end"))
    assert(e2.getMessage.contains("time types differ"))
  }

  test("native interval join matches hand-computed matches on edge cases") {
    import spark.implicits._
    val intervals = Seq(
      // key, start, end, id — overlapping intervals for key 1
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 10),
      (1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00"), 11),
      (2L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:30:00"), 20),
      (3L, ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp], 30))
      .toDF("r_key", "r_start", "r_end", "r_id")
    val points = Seq(
      (1L, ts("2024-01-01 10:15:00"), 100), // → only interval 10
      (1L, ts("2024-01-01 10:45:00"), 101), // → both 10 and 11 (overlap)
      (1L, ts("2024-01-01 11:00:00"), 102), // → only 11 (end-exclusive for 10)
      (2L, ts("2024-01-01 09:30:00"), 200), // → none (end-exclusive)
      (2L, ts("2024-01-01 09:00:00"), 201), // → 20 (start-inclusive)
      (3L, ts("2024-01-01 23:00:00"), 300), // → 30 (null end = unbounded)
      (4L, ts("2024-01-01 10:00:00"), 400)) // key with no intervals
      .toDF("p_key", "p_ts", "p_id")
    val out = IntervalJoin.join(points, intervals,
        leftKey = "p_key", rightKey = "r_key",
        leftTime = "p_ts", rightStart = "r_start", rightEnd = "r_end")
      .select("p_id", "r_id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(out === Set(
      (100, 10), (101, 10), (101, 11), (102, 11), (201, 20), (300, 30)))
  }

  test("null keys and times on either side never match or block") {
    import spark.implicits._
    val intervals = Seq(
      (java.lang.Long.valueOf(1L), ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 10),
      (null.asInstanceOf[java.lang.Long], ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 99),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[Timestamp], ts("2024-01-01 11:00:00"), 98))
      .toDF("r_key", "r_start", "r_end", "r_id")
    val points = Seq(
      (java.lang.Long.valueOf(1L), ts("2024-01-01 10:30:00"), 100),
      (null.asInstanceOf[java.lang.Long], ts("2024-01-01 10:30:00"), 101),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[Timestamp], 102))
      .toDF("p_key", "p_ts", "p_id")
    val out = IntervalJoin.join(points, intervals,
        "p_key", "r_key", "p_ts", "r_start", "r_end")
      .select("p_id", "r_id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(out === Set((100, 10)))
  }

  test("native form agrees with the composed hour-bucket form on the corpus") {
    val composed = Analytic.qRangeJoinEventsOrders(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val native = Analytic.qRangeJoinNative(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(native === composed)
    assert(native.nonEmpty, "corpus parity check must not be vacuous")
  }

  test("string keys survive the left iterator's buffer reuse") {
    import spark.implicits._
    // Many rows per string key through the sort+exchange pipeline:
    // Spark's iterator contract says a row is only valid until the
    // next next(), so a UTF8String key held across iterations must be
    // defensively copied (IntervalJoinExec.stable). Parity with the
    // declarative join guards the whole string-key path.
    val tmp = java.nio.file.Files.createTempDirectory("graft_ij_str").toString
    val keys = Seq("alpha", "beta", "gamma", "delta")
    val intervals = keys.zipWithIndex.flatMap { case (k, i) =>
      (0 until 5).map(j => (k,
        ts(f"2024-01-01 ${8 + j}%02d:00:00"), ts(f"2024-01-01 ${9 + j}%02d:00:00"), i * 10 + j))
    }
    val points = keys.zipWithIndex.flatMap { case (k, i) =>
      (0 until 40).map(j => (k,
        ts(f"2024-01-01 ${8 + j % 6}%02d:${(j * 7) % 60}%02d:00"), i * 100 + j))
    }
    intervals.toDF("r_key", "r_start", "r_end", "r_id")
      .write.mode("overwrite").parquet(s"$tmp/iv.parquet")
    points.toDF("p_key", "p_ts", "p_id")
      .write.mode("overwrite").parquet(s"$tmp/pt.parquet")
    val iv = spark.read.parquet(s"$tmp/iv.parquet")
    val pt = spark.read.parquet(s"$tmp/pt.parquet")
    val native = IntervalJoin.join(pt, iv, "p_key", "r_key", "p_ts", "r_start", "r_end")
      .select("p_id", "r_id").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val reference = pt.join(iv,
        pt("p_key") === iv("r_key") && pt("p_ts") >= iv("r_start") && pt("p_ts") < iv("r_end"))
      .select("p_id", "r_id").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(native === reference)
    assert(native.nonEmpty)
  }

  test("interval join plans with hash-clustered exchange, not a cross product") {
    import spark.implicits._
    val intervals = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), 10))
      .toDF("r_key", "r_start", "r_end", "r_id")
    val points = Seq((1L, ts("2024-01-01 10:15:00"), 100)).toDF("p_key", "p_ts", "p_id")
    val plan = IntervalJoin.join(points, intervals,
        "p_key", "r_key", "p_ts", "r_start", "r_end")
      .queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), plan.take(500))
    assert(plan.contains("Exchange hashpartitioning"), plan.take(500))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      plan.take(500))
  }
}
