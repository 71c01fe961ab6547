package graft

import graft.operators.Mmr
import org.apache.spark.sql.functions._

class MmrSpec extends SparkSpecBase {

  test("mmr picks k distinct shortlist members; rank 1 is the pure-relevance argmax") {
    val dir = "/root/testdata/sf0.01"
    val out = Mmr.mmrTopk(spark, dir).collect()
    assert(out.length === Mmr.NQueries * Mmr.SelectK)
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.size === Mmr.NQueries)
    byQuery.foreach { case (qid, rows) =>
      val picks = rows.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(picks.distinct.length === Mmr.SelectK, s"query $qid repeats a pick")
      assert(!picks.contains(qid), s"query $qid retrieved itself")
    }
  }

  test("mmr diversification: a later pick can beat a higher-relevance redundant candidate") {
    // Replay the greedy on the engine's own shortlist and check that
    // the emitted scores satisfy the argmax property at every step:
    // no unselected candidate scores strictly higher (or equal with a
    // smaller id) than the pick at its step.
    val dir = "/root/testdata/sf0.01"
    import spark.implicits._
    val out = Mmr.mmrTopk(spark, dir).as[(Long, Long, Long, Long)].collect()
    val n = graft.operators.SemDedup.quantized(spark, dir)
      .withColumn("nrm", sqrt(graft.operators.SemDedup.dotL(col("em"), col("em")).cast("double")))
    val vecs = n.select("vec_id", "em", "nrm").collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1).toArray, r.getDouble(2))).toMap
    def cos(a: Long, b: Long): Long = {
      val (ea, na) = vecs(a); val (eb, nb) = vecs(b)
      val dot = ea.zip(eb).map { case (x, y) => x * y }.sum
      math.floor(dot.toDouble / (na * nb) * 1e6).toLong
    }
    out.groupBy(_._1).foreach { case (qid, rows) =>
      val shortlist = vecs.keys.filter(_ != qid).toArray
        .map(c => (c, cos(qid, c)))
        .sortBy { case (c, s) => (-s, c) }.take(Mmr.ShortlistM)
      val picksInOrder = rows.sortBy(_._2)
      var selected = List.empty[Long]
      picksInOrder.foreach { case (_, _, pick, score) =>
        val best = shortlist.filterNot(c => selected.contains(c._1)).map { case (c, rel) =>
          val red = if (selected.isEmpty) 0L else selected.map(cos(c, _)).max
          (7L * rel - 3L * red, c)
        }.minBy { case (sc, id) => (-sc, id) }
        assert(best === ((score, pick)), s"query $qid step broke the argmax")
        selected ::= pick
      }
    }
  }
}
