package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpecBase {

  test("payload dedup accounting is internally consistent per kind") {
    val rows = graft.operators.Multimodal.payloadDedup(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("audio", "image", "video"))
    rows.foreach { r =>
      val (n, distinct, dups, micro) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n === distinct + dups)
      assert(micro === dups * 1000000L / n)
      assert(distinct > 0L && distinct <= n)
    }
    val total = rows.map(_.getLong(1)).sum
    val docs = new graft.sources.GraftCatalog(spark, sfDir).table("documents").count()
    assert(total === docs, "every payload accounted for exactly once")
  }

  test("binary meta partitions every document into a kind") {
    val out = Multimodal.binaryMeta(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSet === Set("image", "audio", "video"))
    assert(out.map(_.getLong(1)).sum === 500L)
  }

  test("feature extraction is deterministic and byte-exact") {
    val a = Multimodal.featureExtract(spark, sfDir).collect()
    val b = Multimodal.featureExtract(spark, sfDir).collect()
    assert(a.length === 500)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // the 8 scalar histogram lanes sum to payload length
    a.foreach { r =>
      assert((4 to 11).map(r.getLong).sum === r.getLong(2), s"doc ${r.getLong(0)}")
    }
  }

  test("scalar histogram lanes match the array-form byte histogram") {
    import org.apache.spark.sql.functions._
    // the array form the decode stub stands in for: recompute the
    // 8-bin histogram from the raw payload bytes and compare lanes
    val payloads = Multimodal.mmTable(spark, sfDir)
      .select(col("doc_id"), col("payload"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val out = Multimodal.featureExtract(spark, sfDir).collect()
    out.foreach { r =>
      val hist = new Array[Long](8)
      payloads(r.getLong(0)).foreach(b => hist((b & 0xFF) >> 5) += 1)
      assert((4 to 11).map(r.getLong) === hist.toSeq, s"doc ${r.getLong(0)}")
    }
  }

  test("resize keeps every 4th byte with an exact hand-computed summary") {
    import org.apache.spark.sql.functions.col
    val payloads = Multimodal.mmTable(spark, sfDir)
      .select(col("doc_id"), col("payload"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val out = Multimodal.resize(spark, sfDir).collect()
    assert(out.length === payloads.size)
    out.foreach { r =>
      val bytes = payloads(r.getLong(0))
      val resized = bytes.indices.collect { case i if i % 4 == 0 => bytes(i) & 0xFF }
      assert(r.getLong(3) === resized.length.toLong, s"doc ${r.getLong(0)} count")
      val hex24 = resized.take(24).map(b => f"$b%02X").mkString
      assert(r.getString(4) === hex24, s"doc ${r.getLong(0)} hex")
      val mean = math.floor(resized.map(_.toLong).sum * 1e6 / resized.length).toLong
      assert(r.getLong(5) === mean, s"doc ${r.getLong(0)} mean")
    }
  }

  test("pair curation funnel: monotone gates, exact dedup accounting, bench docs excluded") {
    import org.apache.spark.sql.functions._
    val rows = Multimodal.curatePairs(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("audio", "image", "video"))
    rows.foreach { r =>
      val (np, nu, nq, nk) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(np >= nu && nu >= nq && nq >= nk, s"funnel must be monotone: $r")
      assert(nk > 0, s"gates must not drain a kind at sf0.001: $r")
      assert(r.getLong(5) > 0 && r.getLong(6) > 0)
    }
    // dedup accounting replay: n_pairs/n_unique equal the driver count
    // of non-bench docs / distinct md5 prefixes per kind
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(pmod(col("doc_id"), lit(97)) =!= 0)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        md5(encode(substring(col("text"), 1, 64), "UTF-8")).as("sig"))
    val exp = d.groupBy("kind")
      .agg(count(lit(1)).as("np"), count_distinct(col("sig")).as("nu"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) === exp(r.getString(0)), r.getString(0))
    }
  }

  test("F7 plan: ONE tokenize — totals and the keep-rate join both read the cached pair grain") {
    val df = Multimodal.multimodalTokenBudget(spark, sfDir)
    val nodes = allPlanNodes(df.queryExecution.executedPlan)
    assert(nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.isEmpty,
      "no direct file scan in the final plan: captions must be " +
        "regex-tokenized once into the cached per-pair token grain")
    assert(nodes.collect {
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => i }
      .nonEmpty, "expected InMemoryTableScan of the cached pair grain")
    assert(!graft.plans.GraftDoctor.lint(df)
      .exists(_.rule == "repeated-uncached-subtree"))
  }

  test("F6 plan: ONE documents scan — signature, token stats AND span hashes all project from the cached doc grain") {
    val df = Multimodal.curatePairs(spark, sfDir)
    val nodes = allPlanNodes(df.queryExecution.executedPlan)
    assert(nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.isEmpty,
      "no direct file scan in the final plan: every per-doc feature " +
        "family must derive from the single cached doc-grain pass")
    assert(nodes.collect {
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => i }
      .nonEmpty, "expected InMemoryTableScan of the cached doc grain")
    assert(!graft.plans.GraftDoctor.lint(df)
      .exists(_.rule == "repeated-uncached-subtree"))
  }

  test("F2 codec path: a real javax.imageio PNG round trip drives the same plumbing in both flag states") {
    val stub = Multimodal.featureExtract(spark, sfDir, codec = false)
    val real = Multimodal.featureExtract(spark, sfDir, codec = true)
    // the stub⇄codec swap point holds: same schema, same row set
    assert(stub.schema === real.schema)
    val rRows = real.collect()
    assert(rRows.length === stub.collect().length)
    // PNG is lossless → the codec path is deterministic run to run
    assert(Multimodal.featureExtract(spark, sfDir, codec = true)
      .collect().map(_.toString).toSeq === rRows.map(_.toString).toSeq)
    // decoded-pixel features: every 8x8 image decodes to exactly 64
    // pixels, so each histogram covers 64
    rRows.foreach { r =>
      assert((4 until 12).map(r.getLong).sum === 64L,
        s"decoded histogram must cover the 8x8 image: $r")
    }
    // losslessness, independently replayed PER MODALITY: audio routes
    // through the real WAV codec (javax.sound.sampled), image/video
    // through the real PNG codec (javax.imageio) — both lossless, and
    // both seed from the same byte tiling, so the decoded mean equals
    // the seed computed straight from the payload
    val pays = Multimodal.mmTable(spark, sfDir)
      .select("doc_id", "kind", "payload")
      .orderBy("doc_id").limit(9).collect()
    Seq("image", "audio", "video").foreach { k =>
      val pay = pays.find(_.getString(1) == k).get
      val bytes = pay.getAs[Array[Byte]](2)
      val vals = (0 until 64).map(p => bytes(p % bytes.length) & 0xFF)
      val expMean = math.floor(vals.sum.toDouble / 64 * 1e6).toLong
      val row = rRows.find(_.getLong(0) == pay.getLong(0)).get
      assert(row.getLong(3) === expMean,
        s"$k: the codec round trip must hand the feature pass the exact seeded values")
    }
  }

  test("frame sampling fans out 1..5 frames per video with bounded slices") {
    val out = Multimodal.frameSample(spark, sfDir).collect()
    val perDoc = out.groupBy(_.getLong(0))
    perDoc.foreach { case (_, frames) =>
      assert(frames.length >= 1 && frames.length <= 5)
      frames.foreach { f =>
        assert(f.getLong(4) <= 16)
        // frame_hex is the hex image of a payload byte slice
        assert(f.getString(2).length === 2 * f.getLong(4))
        assert(f.getString(2).forall(c => c.isDigit || ('A' to 'F').contains(c)))
      }
    }
  }

  test("F8: perceptual pairs catch what exact signatures cannot — perturbed payloads pair, unrelated ones do not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // controlled payloads: p0 alternates 0/200 (every pixel far from
    // the mean), p1 flips ONE byte to 255 (one pixel crosses the
    // threshold, the shifted mean moves no other pixel), p2 is p0
    // byte-identical, p3 is unrelated
    val p0 = Array.tabulate[Byte](64)(i => if (i % 2 == 0) 0.toByte else 200.toByte)
    val p1 = p0.clone(); p1(0) = 255.toByte
    val p3 = Array.tabulate[Byte](64)(i => (i * 37 % 251).toByte)
    val payloads = Seq(
      (0L, p0), (1L, p1), (2L, p0.clone()), (3L, p3)
    ).toDF("doc_id", "payload")
    // driver replay of the hashes through the SAME codec
    val h = Seq(p0, p1, p0, p3).map(Multimodal.perceptualHash)
    assert(h(0) === h(2), "byte-identical payloads hash identically")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0), h(1)) >= 1 && ham(h(0), h(1)) <= 4,
      s"one flipped byte moves a few bits, got ${ham(h(0), h(1))}")
    assert(ham(h(0), h(3)) > 7, "unrelated payloads are far apart")
    // md5 cannot pair the perturbed copy; the perceptual pass must
    val md5Sigs = payloads.select(md5(col("payload")).as("s"))
      .collect().map(_.getString(0))
    assert(md5Sigs(0) !== md5Sigs(1))
    val pairs = Multimodal.perceptualPairs(payloads)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.contains((0L, 2L, 0)), s"exact copies pair at distance 0: $pairs")
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 <= 4),
      s"the perturbed copy pairs within the distance bound: $pairs")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      s"unrelated payloads must not pair: $pairs")
    // distributed run is deterministic
    assert(Multimodal.perceptualPairs(payloads).collect().toSeq ===
      Multimodal.perceptualPairs(payloads).collect().toSeq)
    // corpus form runs map-side on the image lane
    assert(Multimodal.payloadPerceptualPairs(spark, sfDir).columns.toSeq ===
      Seq("doc_id_a", "doc_id_b", "hamming"))
  }
}
