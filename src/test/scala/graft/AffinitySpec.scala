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

  test("sorted neighborhood compares each doc to exactly its w=3 global followers") {
    val docs = (1L to 40L).map(i => (i, s"same first ${"x" * (i % 7).toInt} tail $i"))
      .toDF("doc_id", "text")
    // with a GLOBAL index the candidate count is exact, not just
    // bounded: Σ_i min(w, n−1−i) = n·w − w(w+1)/2
    val cands = Affinity.neighborCandidates(docs, identity).count()
    assert(cands == 40L * 3 - 6, s"candidate set must be n·w − w(w+1)/2, got $cands")
  }

  test("sorted neighborhood range-partitions the run — no token hash key, no window") {
    val docs = (1L to 40L).map(i => (i, s"the same hot first token $i"))
      .toDF("doc_id", "text")
    val runPlan = Affinity.sortedRun(docs, identity)
      .queryExecution.executedPlan.toString
    assert(runPlan.toLowerCase.contains("rangepartitioning"),
      "sorted run must be a range repartition:\n" + runPlan.take(1200))
    assert(!runPlan.toLowerCase.contains("hashpartitioning"),
      "no hash partition on any text-derived key:\n" + runPlan.take(1200))
    val pairPlan = Affinity.sortedNeighborhoodOver(docs)
      .queryExecution.executedPlan.toString
    assert(!pairPlan.contains("Window"),
      "neighbor pairs are an equi-join on the dense index, not a window:\n" +
        pairPlan.take(1200))
  }

  test("multi-pass recovers a pair adjacent only under the rotated key") {
    val tail = "ender shares this exact long common suffix tail here okay"
    val a = s"alpha $tail"
    val b = s"omega $tail" // same length head → small edit distance to a
    // ≥ w+1 docs strictly between 'alpha…' and 'omega…' in forward
    // order, each with an unrelated tail (edit distance > 16 to all)
    val fill = Seq("bravo", "charlie", "delta", "echo").zipWithIndex.map {
      case (w0, i) => (10L + i, s"$w0 ${"qwerty jumble nothing alike " * 2}$i")
    }
    val docs = (Seq((1L, a), (2L, b)) ++ fill).toDF("doc_id", "text")
    val single = Affinity.sortedNeighborhoodOver(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Affinity.sortedNeighborhoodMultiOver(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!single.contains((1L, 2L)),
      s"forward pass alone must miss the scattered pair: $single")
    assert(multi.contains((1L, 2L)),
      s"reversed-key pass must recover the shared-suffix pair: $multi")
    assert(single.subsetOf(multi), "multi-pass is a superset of the forward pass")
  }

  // ── C15 entity resolution ──

  test("entity resolution clusters chained links and elects the longest record") {
    // A—B and B—C link (1 edit each); A—C may or may not link directly
    // but MUST land in one entity via the closure. D is unrelated.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = base.replace("gamma", "gamme")
    val c = base.replace("gamma", "gamme").replace("zeta", "zetz")
    val docs = Seq(
      (10L, base + " short", 100L),
      (11L, b + " much longer tail of text", 300L), // longest → survivor
      (12L, c + " medium tail", 200L),
      (99L, "totally unrelated content nothing alike whatsoever here", 999L))
      .toDF("doc_id", "text", "n_chars")
    val out = Affinity.entityResolutionOver(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length === 1, s"one multi-member entity expected: ${out.toSeq}")
    val (canonical, n, rep, repChars, total) = out.head
    assert(canonical === 10L, "canonical id is the cluster's min member")
    assert(n === 3L)
    assert(rep === 11L && repChars === 300L, "longest record must survive")
    assert(total === 600L)
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
