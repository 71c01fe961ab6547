package graft.functions

import graft.functions.{VectorFns => VF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._

/** SQL-reachable similarity search (the D-section's SQL surface):
  * table-valued functions registered through the session extensions,
  * so a SQL-only user can issue a top-k vector query at all —
  *
  *   SELECT * FROM graft_knn('<embeddings dir>', array(...), 10)
  *   SELECT * FROM graft_knn_ivf('<ivf index dir>', array(...), 10, 4)
  *
  * `graft_knn` is the exact brute-force baseline: one scan, per-row
  * cosine, tree-reduced top-k (TakeOrdered — never a global sort).
  * `graft_knn_ivf` probes a PERSISTED IVF index (the
  * `Similarity.buildIvfIndex` layout: corpus partitioned by
  * `centroid_id`, the trained centroids under `_centroids`): the k×dim
  * centroid artifact is read once driver-side, the nprobe nearest
  * lists are chosen there, and the scan reads ONLY those partitions —
  * at 100 TB a probe touches nprobe/nlist of the data, never the
  * corpus. Arguments must be literals (a TVF's table arguments are
  * resolved at analysis time).
  *
  * Output: (neighbor_id BIGINT, cos DOUBLE round 4), best-first,
  * deterministic ties by neighbor_id.
  */
object GraftKnnTvf {

  private def litString(e: Expression, what: String): String = {
    require(e.foldable, s"[GRAFT] $what must be a literal string, got ${e.sql}")
    String.valueOf(e.eval())
  }

  private def litIntArg(e: Expression, what: String): Int = {
    require(e.foldable, s"[GRAFT] $what must be an integer literal, got ${e.sql}")
    e.eval() match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long if l.longValue().isValidInt => l.intValue()
      case other => throw new IllegalArgumentException(
        s"[GRAFT] $what must be an integer literal, got $other")
    }
  }

  private def litVector(e: Expression, what: String): Seq[Double] = {
    require(e.foldable,
      s"[GRAFT] $what must be a literal array (e.g. array(0.1, ...)), got ${e.sql}")
    e.eval() match {
      case a: ArrayData =>
        e.dataType match {
          case org.apache.spark.sql.types.ArrayType(et, _) =>
            (0 until a.numElements()).map(i => a.get(i, et) match {
              case d: java.lang.Double => d.doubleValue()
              case f: java.lang.Float => f.doubleValue()
              case n: java.lang.Number => n.doubleValue()
              case v: Decimal => v.toDouble
              case other => throw new IllegalArgumentException(
                s"[GRAFT] $what element $i is not numeric: $other")
            })
          case other => throw new IllegalArgumentException(
            s"[GRAFT] $what must be an array, got ${other.simpleString}")
        }
      case other => throw new IllegalArgumentException(
        s"[GRAFT] $what must be a literal array, got $other")
    }
  }
  private type Decimal = org.apache.spark.sql.types.Decimal

  /** The shared top-k tail: per-row cosine against the literal query
    * vector, `orderBy.limit(k)` (planned as TakeOrderedAndProject — a
    * tree-reduced selection, not a global sort).
    */
  private def topkPlan(lists: org.apache.spark.sql.DataFrame, q: Seq[Double],
      k: Int): LogicalPlan = {
    val scored = lists
      .select(col("vec_id").cast("long").as("neighbor_id"),
        VF.cosine(col("emb"), typedlit(q)).as("cos_raw"))
      .orderBy(col("cos_raw").desc, col("neighbor_id")).limit(k)
      .select(col("neighbor_id"), round(col("cos_raw"), 4).as("cos"))
    scored.queryExecution.logical
  }

  /** `graft_knn(embeddings, queryVec, k)` — exact brute force.
    * `embeddings` is a parquet dir OR a catalog table name
    * (`graft.db.embeddings`) — no-slash strings resolve through the
    * session catalog, so the SQL-catalog user never handles paths.
    */
  def knn(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 3,
      "[GRAFT] graft_knn takes (embeddings STRING, queryVec ARRAY, k INT)")
    val src = litString(exprs(0), "graft_knn embeddings table/dir")
    val q = litVector(exprs(1), "graft_knn query vector")
    val k = litIntArg(exprs(2), "graft_knn k")
    val s = SparkSession.active
    // name resolution only when the string IS a resolvable table/view
    // (a single-segment relative dir must keep meaning a path); index
    // dirs of the _ivf/_hnsw forms are paths by nature and stay paths
    val e =
      if (src.contains("/")) graft.sources.GraftIO.readParquet(s, src)
      else if (s.catalog.tableExists(src)) s.table(src)
      else graft.sources.GraftIO.readParquet(s, src)
    val emb =
      if (e.schema.fieldNames.contains("emb")) e.select(col("vec_id"), col("emb"))
      else e.select(col("vec_id"), VF.toDoubleArray(col("embedding")).as("emb"))
    topkPlan(emb, q, k)
  }

  /** `graft_knn_ivf(indexDir, queryVec, k[, nprobe])` — probes the
    * persisted index, reading only the nprobe nearest centroid lists
    * (hive partition pruning on `centroid_id`).
    */
  def knnIvf(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 3 || exprs.length == 4,
      "[GRAFT] graft_knn_ivf takes (indexDir STRING, queryVec ARRAY, " +
        "k INT[, nprobe INT])")
    val idx = litString(exprs(0), "graft_knn_ivf index dir")
    val q = litVector(exprs(1), "graft_knn_ivf query vector")
    val k = litIntArg(exprs(2), "graft_knn_ivf k")
    val nprobe =
      if (exprs.length == 4) litIntArg(exprs(3), "graft_knn_ivf nprobe") else 4
    val s = SparkSession.active
    // the centroid artifact is k×dim — the bounded driver-side read
    // that makes probe selection free (no corpus job at analysis time)
    val cents = graft.sources.GraftIO.readParquet(s, s"$idx/_centroids")
      .select(col("centroid_id"), col("c_emb"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    require(cents.nonEmpty,
      s"[GRAFT] graft_knn_ivf: no _centroids artifact under $idx - build " +
        "the index with Similarity.buildIvfIndex first")
    // VectorFns.dcos matches CosineSimilarityExpr bit-for-bit, so
    // probe selection can never tie-break differently from the engine
    val qa = q.toArray
    // Double.compare is Spark's total order (NaN greatest): a zero-norm
    // centroid scores NaN and must rank exactly where the engine's
    // `ORDER BY c_cos DESC` would put it, or probe selection drifts
    // from the Scala serve path
    val probeIds = cents.map { case (id, c) => (VF.dcos(qa, c.toArray), id) }
      .sortWith { (x, y) =>
        val c = java.lang.Double.compare(x._1, y._1)
        if (c != 0) c > 0 else x._2 < y._2
      }.take(nprobe).map(_._2).sorted
    val lists = graft.sources.GraftIO.readParquet(s, idx)
      .where(col("centroid_id").isin(probeIds.toIndexedSeq.map(Int.box): _*))
    topkPlan(lists, q, k)
  }

  /** `graft_knn_pq(indexDir, queryVec, k[, shortlist])` — serves the
    * persisted PQ index (the `Similarity.buildPqIndex` layout): the
    * m×ksub codebook artifact reloads driver-side, ADC tables for the
    * literal query are computed there, the codes scan TakeOrders the
    * shortlist (reading only the ~16× narrower code table), and the
    * exact-cosine rerank broadcast-joins it against the source
    * embeddings. Wraps `Similarity.pqPersistedTopk`'s plan exactly —
    * value-identical by construction.
    */
  def knnPq(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 3 || exprs.length == 4,
      "[GRAFT] graft_knn_pq takes (indexDir STRING, queryVec ARRAY, " +
        "k INT[, shortlist INT])")
    val idx = litString(exprs(0), "graft_knn_pq index dir")
    val q = litVector(exprs(1), "graft_knn_pq query vector")
    val k = litIntArg(exprs(2), "graft_knn_pq k")
    val s = SparkSession.active
    val df =
      if (exprs.length == 4)
        graft.operators.Similarity.pqPersistedTopk(s, idx, q, k,
          litIntArg(exprs(3), "graft_knn_pq shortlist"))
      else graft.operators.Similarity.pqPersistedTopk(s, idx, q, k)
    df.queryExecution.logical
  }

  /** `graft_knn_hnsw(indexDir, queryVec, k[, ef])` — probes the
    * persisted HNSW index (the `Hnsw.buildHnswIndex` layout): the
    * bounded routing artifact reloads driver-side, the literal query
    * beam-searches the routing graph exactly as the Scala serve path
    * does, and the scan reads ONLY the beam's `entry_id=` shard
    * partitions — a probe touches ef/m of the corpus.
    */
  def knnHnsw(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 3 || exprs.length == 4,
      "[GRAFT] graft_knn_hnsw takes (indexDir STRING, queryVec ARRAY, " +
        "k INT[, ef INT])")
    val idx = litString(exprs(0), "graft_knn_hnsw index dir")
    val q = litVector(exprs(1), "graft_knn_hnsw query vector")
    val k = litIntArg(exprs(2), "graft_knn_hnsw k")
    val ef =
      if (exprs.length == 4) litIntArg(exprs(3), "graft_knn_hnsw ef")
      else graft.operators.Hnsw.EfSearch
    val s = SparkSession.active
    val routing = graft.operators.Hnsw.loadRouting(s, idx)
    require(routing.nonEmpty,
      s"[GRAFT] graft_knn_hnsw: no routing artifact under $idx - build " +
        "the index with Hnsw.buildHnswIndex first")
    val entries = graft.operators.Hnsw.beamSearch(
      graft.operators.Hnsw.buildGraph(routing), q.toArray, ef)
    val shards = graft.sources.GraftIO.readParquet(s, s"$idx/shards")
      .where(col("entry_id").isin(entries.toIndexedSeq.map(Long.box): _*))
      .dropDuplicates("vec_id") // R-way fan-out: a vector may sit in 2+ probed shards
    topkPlan(shards, q, k)
  }
}
