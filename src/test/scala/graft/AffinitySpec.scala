package graft

import graft.operators.{Affinity, Behavioral, Profiling}
import org.apache.spark.sql.functions._

class AffinitySpec extends SparkSpecBase {

  import spark.implicits._

  // ── B65 market-basket lift ──

  test("basket lift replays exactly on a crafted basket set") {
    // baskets: {A,B}, {A,B}, {A,C} → N=3, n_A=3, n_B=2, n_C=1
    // (A,B): n_ab=2, lift = 2·3·1e6 div (3·2) = 1_000_000
    // (A,C): n_ab=1, lift = 1·3·1e6 div (3·1) = 1_000_000
    val lines = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L), (3L, 30L)) // dup line collapses via distinct
      .toDF("l_orderkey", "l_partkey")
    val rows = Affinity.basketLift(lines)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSet == Set((10L, 20L, 2L, 1000000L), (10L, 30L, 1L, 1000000L)))
  }

  test("basket lift separates positive from negative association") {
    // A and B always together (lift > 1e6); A and C only when C rides
    // along in a 3-basket (lift < 1e6 once C also appears alone often)
    val lines = (
      (1 to 6).flatMap(o => Seq((o.toLong, 1L), (o.toLong, 2L))) ++ // {A,B} ×6
        Seq((7L, 1L), (7L, 3L)) ++                                  // {A,C}
        (8 to 12).map(o => (o.toLong, 3L))                          // {C} alone ×5
      ).toDF("l_orderkey", "l_partkey")
    val byPair = Affinity.basketLift(lines).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // N=12, n_A=7, n_B=6, n_AB=6 → 6·12e6/(42) ≈ 1.714e6
    assert(byPair((1L, 2L)) > 1000000L, s"positive pair: $byPair")
    // n_C=6, n_AC=1 → 1·12e6/(42) ≈ 0.285e6
    assert(byPair((1L, 3L)) < 1000000L, s"negative pair: $byPair")
  }

  test("basket pair join runs on the order key, never as a cross product") {
    val plan = Affinity.qBasketLift(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "pair generation must be an equi-join on l_orderkey:\n" + plan.take(1200))
    // the only nested-loop join is the single-row order-count broadcast
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnl <= 1, s"expected at most the scalar-count BNL join, got $bnl")
  }

  // ── C14 sorted-neighborhood linkage ──

  test("sorted neighborhood links a planted near-identical prefix pair") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val tweaked = base.replace("gamma", "gamme") // 1 edit inside 64 chars
    val far = "alpha zulu xray whiskey victor uniform tango sierra romeo quebec"
    val docs = Seq((1L, base), (2L, tweaked), (3L, far))
      .toDF("doc_id", "text")
    val rows = Affinity.sortedNeighborhoodOver(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.exists(t => t._1 == 1L && t._2 == 2L && t._3 <= 2L),
      s"planted pair must link: ${rows.toSeq}")
    assert(!rows.exists(t => t._2 == 3L || t._1 == 3L),
      s"distant doc must not link at threshold 16: ${rows.toSeq}")
  }

  test("sorted neighborhood compares each doc to at most w=3 neighbors") {
    val docs = (1L to 40L).map(i => (i, s"same first ${"x" * (i % 7).toInt} tail $i"))
      .toDF("doc_id", "text")
    // candidate count (pre-threshold) is bounded by n·w by construction:
    // replay the candidate generation with the distance gate removed
    val d = docs.select(col("doc_id"), substring(col("text"), 1, 64).as("pfx"))
      .withColumn("blk", substring_index(col("pfx"), " ", 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("blk").orderBy("pfx", "doc_id")
    val cands = d.withColumn("nbrs", array((1 to 3).map(i =>
        lead(struct(col("doc_id"), col("pfx")), i).over(w)): _*))
      .select(explode(col("nbrs")).as("nb")).where(col("nb").isNotNull).count()
    assert(cands <= 40L * 3, s"candidate set must be ≤ n·w, got $cands")
    assert(cands >= 37L * 3 - 3, "one block of 40 should yield close to n·w candidates")
  }

  // ── B63 Markov transitions ──

  test("markov transition probabilities are a floored partition of 1e6") {
    val rows = Behavioral.qMarkovTransitions(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byPrev = rows.groupBy(_.getString(0))
    byPrev.foreach { case (prev, ts) =>
      val pSum = ts.map(_.getLong(3)).sum
      val k = ts.length
      // Σ floor(n_i·1e6/tot) ∈ (1e6 − k, 1e6]
      assert(pSum <= 1000000L && pSum > 1000000L - k,
        s"$prev: micro probabilities must sum to 1e6 minus floor loss, got $pSum over $k rows")
    }
  }

  test("markov transition counts conserve the event log") {
    val ev = graft.streaming.Events.eventsTable(spark, sfDir)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    val nTrans = Behavioral.qMarkovTransitions(spark, sfDir)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(nTrans == nEvents - nUsers,
      s"each user contributes |events|−1 transitions: $nTrans vs $nEvents-$nUsers")
  }

  // ── B64 session paths ──

  test("session paths split on the 30-minute gap and truncate at 5 steps") {
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val events = (
      // user 1: two events 10 min apart, then a 40-min gap → 2 sessions
      Seq((1L, "view", ts(0), 1L), (1L, "click", ts(10), 2L),
        (1L, "purchase", ts(50), 3L)) ++
        // user 2: 7 events 1 min apart → ONE session, path truncated to 5
        (0 to 6).map(i => (2L, s"e$i", ts(100 + i), (10 + i).toLong))
      ).toDF("user_id", "event_type", "ts", "event_id")
    val paths = Behavioral.sessionPaths(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(paths == Map("view>click" -> 1L, "purchase" -> 1L,
      "e0>e1>e2>e3>e4" -> 1L), s"got $paths")
  }

  test("session paths and the markov window share one user_id exchange each") {
    val plan = Behavioral.qSessionPaths(spark, sfDir)
      .queryExecution.executedPlan.toString
    val userExchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    assert(userExchanges == 1,
      s"session assignment + step numbering + path fold must share ONE user_id exchange, got $userExchanges\n" + plan.take(1500))
  }

  // ── B67 Pearson correlation profile ──

  test("correlation profile replays exactly against a driver computation") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("CAST(CAST(l_quantity AS DECIMAL(28,2)) * 100 AS BIGINT) AS x1",
        "CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT) AS x2",
        "CAST(CAST(l_discount AS DECIMAL(28,2)) * 100 AS BIGINT) AS x3")
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    def corr(xs: Seq[BigInt], ys: Seq[BigInt]): Long = {
      val n = BigInt(xs.length)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(a => a * a).sum)
      math.floor((n * sxy - sx * sy).toDouble * 1e6 /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))).toLong
    }
    val expected = Map(
      ("l_quantity", "l_extendedprice") -> corr(li.map(_._1), li.map(_._2)),
      ("l_quantity", "l_discount") -> corr(li.map(_._1), li.map(_._3)),
      ("l_discount", "l_extendedprice") -> corr(li.map(_._3), li.map(_._2)))
    val got = Profiling.profileCorrelation(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"got $got expected $expected")
    // correlations are micro-scaled into [−1e6, 1e6]
    assert(got.values.forall(v => v >= -1000000L && v <= 1000000L))
  }

  test("correlation profile scans lineitem exactly once") {
    val plan = Profiling.profileCorrelation(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1,
      s"all ten moments must come from ONE scan, got $scans:\n" + plan.take(1200))
  }
}
