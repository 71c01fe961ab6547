package graft.operators

import graft.GraftSession.GrainOps
import graft.sources.GraftCatalog
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.F multimodal columns: opaque `binary` payloads + typed metadata,
  * with decode/feature-extract/frame-sample plumbing.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub (byte-level statistics standing
  * in for pixel/sample decoding). Everything around it — schema,
  * batched per-partition processing, explode fan-out — is the real
  * Spark plumbing a codec-backed implementation would use (on PySpark
  * this layer is `mapInPandas`; the Scala-native equivalent is
  * `mapPartitions` over row batches).
  *
  * Output portability: every driver-checked column is a scalar
  * (longs / strings) — the histogram lanes are eight scalar columns
  * and frame slices are hex strings, so the result is hashable and
  * byte-identical across engines. The raw array/binary forms live in
  * MultimodalSpec.
  */
object Multimodal {

  /** Synthesize the multimodal table: payload bytes from the document
    * text (deterministic), kind from doc_id, plus typed metadata.
    */
  private[graft] def mmTable(s: SparkSession, dir: String): DataFrame =
    new GraftCatalog(s, dir).table("documents")
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"))
      .withColumn("meta", struct(
        length(col("payload")).cast("long").as("n_bytes"),
        col("kind").as("media_type")))

  /** F5: payload-level dedup — per-kind duplicate accounting over a
    * deterministic prefix signature (md5 of the payload's first 64
    * chars), the media twin of C1: a real build swaps the signature
    * for a perceptual hash after decode (pHash etc. — codec-bound, so
    * stubbed like F2's decode), while the signature layer, the
    * grouping, and the accounting are exactly what ships. Map-side
    * signature, one per-kind aggregate — at 100 TB the payload bytes
    * never shuffle, only 32-char signatures do. md5 is md5 in every
    * engine, so the whole result is value-exact.
    */
  def payloadDedup(s: SparkSession, dir: String): DataFrame =
    new GraftCatalog(s, dir).table("documents")
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        md5(encode(substring(col("text"), 1, 64), "UTF-8")).as("sig"))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        count_distinct(col("sig")).as("n_distinct"),
        (count(lit(1)) - count_distinct(col("sig"))).as("n_dups"),
        expr("((count(1) - count(DISTINCT sig)) * 1000000L) div count(1)")
          .as("dup_micro"))
      .orderBy("kind")

  /** F8 core: 64-bit AVERAGE HASH (aHash) of a payload through the
    * REAL PNG codec — the perceptual layer F5's signature dedup
    * documents as its swap point, implemented: the payload decodes to
    * an 8×8 gray raster via `javax.imageio` (the F2 codec path), each
    * pixel thresholds at the raster's integer mean, set bits form the
    * hash. Byte-level re-encodes and small perturbations move the
    * hash a few BITS where they move md5 completely — which is the
    * entire point of perceptual dedup.
    */
  private[graft] def perceptualHash(bytes: Array[Byte]): Long = {
    val gray = pngRoundTrip(bytes)
    val mean = gray.sum / 64
    var h = 0L
    var i = 0
    while (i < 64) {
      if (gray(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  /** F8: PERCEPTUAL near-dup pairs over binary payloads — C3's
    * SimHash discipline applied to the media lane: hashes compute
    * MAP-SIDE through the real codec (payload bytes never shuffle;
    * only 8-byte hashes and 1-byte band keys do), candidates come
    * from 8 × 8-bit band buckets (pigeonhole: any pair within Hamming
    * distance 7 shares at least one untouched band, so recall at the
    * default max distance 4 is EXACT, not probabilistic), and each
    * candidate pair verifies with one `bit_count(xor)`. Emits
    * (doc_id_a, doc_id_b, hamming) for every payload pair within
    * `maxHamming` — the pairs F5's exact-signature pass cannot see.
    */
  private[graft] def perceptualPairs(payloads: DataFrame,
      maxHamming: Int = 4): DataFrame = {
    require(maxHamming <= 7,
      "[GRAFT] 8x8-bit banding guarantees recall only to Hamming 7")
    val s = payloads.sparkSession
    import s.implicits._
    val hashed = payloads.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, perceptualHash(bytes)) })
      .toDF("doc_id", "phash")
    val bands = hashed.select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(7))).as("b"))
      .withColumn("key", expr("shiftrightunsigned(phash, b * 8) & 255L"))
    bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id_a"), col("y.doc_id").as("doc_id_b"),
        expr("bit_count(x.phash ^ y.phash)").cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy("doc_id_a", "doc_id_b")
  }

  /** F8 (corpus form): the image lane's perceptual pairs at this
    * table's synthetic payloads.
    */
  def payloadPerceptualPairs(s: SparkSession, dir: String,
      maxHamming: Int = 4): DataFrame =
    perceptualPairs(mmTable(s, dir).where(col("kind") === "image"), maxHamming)

  /** F1: binary payload + metadata aggregation (oracle-able). */
  def binaryMeta(s: SparkSession, dir: String): DataFrame =
    mmTable(s, dir)
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum(col("meta.n_bytes")).as("total_bytes"))
      .orderBy("kind")

  private val featureSchema = StructType(
    Seq(
      StructField("doc_id", LongType),
      StructField("kind", StringType),
      StructField("n_bytes", LongType),
      // floor(mean * 1e6): floor-based micro-units are bit-identical
      // across engines; round()/rint on a double ratio is not.
      StructField("byte_mean_micro", LongType)) ++
    (0 until 8).map(i => StructField(s"h$i", LongType)))

  /** The CODEC-backed decode for the F2 flag path: the payload bytes
    * deterministically seed an 8×8 RGB image, which round-trips
    * through a REAL image codec — `javax.imageio` PNG encode + decode
    * — before the feature pass runs on the DECODED pixels. PNG is
    * lossless, so the decoded statistics are deterministic and
    * spec-checkable; the swap point the stub documents (bytes → codec
    * → features, same batch shape, same output schema) is exercised
    * for real. Returns (decodedBytes, grayValues).
    */
  private def pngRoundTrip(bytes: Array[Byte]): Array[Int] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < 64) {
      val b =
        if (bytes.length == 0) 0
        else bytes(p % bytes.length) & 0xFF
      img.setRGB(p % 8, p / 8, (b << 16) | (b << 8) | b) // gray pixel
      p += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val decoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.toByteArray))
    val gray = new Array[Int](64)
    var q = 0
    while (q < 64) {
      gray(q) = decoded.getRGB(q % 8, q / 8) & 0xFF
      q += 1
    }
    gray
  }

  /** The audio twin of `pngRoundTrip`: the payload bytes seed 64
    * unsigned 8-bit PCM samples which round-trip through the REAL
    * javax.sound.sampled WAV codec (AudioSystem encode → decode)
    * before the feature pass runs on the DECODED samples. 8-bit PCM
    * WAV is lossless, so the decoded statistics are deterministic.
    */
  private def wavRoundTrip(bytes: Array[Byte]): Array[Int] = {
    val samples = new Array[Byte](64)
    var i = 0
    while (i < 64) {
      samples(i) = if (bytes.length == 0) 0 else bytes(i % bytes.length)
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 8, 1, false /* unsigned 8-bit PCM */, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val decoded = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(out.toByteArray))
    val back = decoded.readAllBytes()
    back.take(64).map(_ & 0xFF)
  }

  /** F2: batched per-partition "decode + feature extraction". The
    * decode stub computes byte statistics; with `codec = true` the
    * SAME plumbing routes every payload through a real codec PER
    * MODALITY — audio payloads through javax.sound.sampled's WAV
    * encode→decode (`wavRoundTrip`), image/video payloads through
    * javax.imageio's PNG encode→decode (`pngRoundTrip`) — and the
    * features are computed over the DECODED samples/pixels:
    * identical batch shape, identical output schema, so the
    * stub⇄codec swap point is demonstrated with two genuine
    * decoders, not only documented. The registered query keeps
    * `codec = false` (byte-stat stub, value-exact oracle); the codec
    * path is spec-driven. The 8 histogram lanes are emitted as
    * scalar columns (h0..h7) so the result is a flat, hashable table
    * either way.
    */
  def featureExtract(s: SparkSession, dir: String,
      codec: Boolean = false): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    val in = mmTable(s, dir).select("doc_id", "kind", "payload")
    val out = in.mapPartitions { rows =>
      // Process in fixed-size batches, mirroring a vectorized decode
      // (mapInPandas batch shape): the stub is per-batch so batch
      // boundaries are observable in a real codec swap-in.
      rows.grouped(64).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val kind = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val hist = new Array[Long](8)
          var sum = 0L
          var n = 0
          if (codec) {
            // REAL DECODE per modality: WAV samples for audio, PNG
            // pixels otherwise — features over the DECODED values
            val vals =
              if (kind == "audio") wavRoundTrip(bytes) else pngRoundTrip(bytes)
            var i = 0
            while (i < vals.length) {
              hist(vals(i) >> 5) += 1
              sum += vals(i)
              i += 1
            }
            n = vals.length
          } else {
            // STUB DECODE: byte-level statistics in place of a codec.
            var i = 0
            while (i < bytes.length) {
              val u = bytes(i) & 0xFF
              hist(u >> 5) += 1
              sum += u
              i += 1
            }
            n = bytes.length
          }
          val meanMicro =
            if (n == 0) 0L
            else math.floor(sum.toDouble / n * 1e6).toLong
          Row.fromSeq(Seq(id, kind, bytes.length.toLong, meanMicro) ++ hist)
        }
      }
    }(enc)
    out.orderBy("doc_id")
  }

  /** F4: resize plumbing — every 4th byte of the payload survives
    * (the byte-domain stand-in for image downsampling; a real build
    * swaps a codec into the same shape). Entirely declarative: the
    * positions are a codegen'd `sequence`, each surviving byte is
    * read with substr+hex+conv, and the summary (count, first-24-byte
    * hex prefix, floor-micro mean) is exactly reproducible in any
    * engine with blob→hex math — oracle-checked like F2/F3.
    */
  def resize(s: SparkSession, dir: String): DataFrame = {
    val nb = col("meta.n_bytes").cast("int")
    mmTable(s, dir)
      .where(col("meta.n_bytes") > 0)
      .withColumn("pos", sequence(lit(1), nb, lit(4)))
      .withColumn("rbytes", expr(
        "transform(pos, p -> cast(conv(hex(substring(payload, p, 1)), 16, 10) as bigint))"))
      .select(
        col("doc_id"), col("kind"), col("meta.n_bytes").as("n_bytes"),
        size(col("rbytes")).cast("long").as("n_resized"),
        expr("concat_ws('', transform(slice(pos, 1, 24), p -> hex(substring(payload, p, 1))))")
          .as("resized_hex24"),
        floor(expr("aggregate(rbytes, 0L, (acc, x) -> acc + x)") * 1000000.0 /
          size(col("rbytes"))).cast("long").as("resized_mean_micro"))
      .orderBy("doc_id")
  }

  /** F6: image-text PAIR CURATION — the CLIP-data composite: every
    * (payload, caption) pair runs the funnel dedup → caption quality →
    * benchmark decontamination, with per-MODALITY accounting in H3's
    * style (how many pairs entered, survived each gate, and how many
    * payload bytes / caption tokens the final kept set carries).
    * Composes three shipped layers verbatim:
    *   F5 payload dedup   — md5 prefix signature, min-doc_id survivor
    *                        per (kind, sig); the survivor's OWN flags
    *                        ride along via `min_by`, so no join-back
    *                        of the pair table (one sig-grain shuffle);
    *   E2 caption quality — integer-exact gate: ≥ 20 tokens and a
    *                        distinct-token ratio ≥ 1/2 (word-salad
    *                        and stutter captions drop);
    *   C9 decontamination — word-4-gram span overlap vs the doc_id%97
    *                        benchmark stand-in, contaminated when
    *                        ≥ 10% of spans match; bench docs are
    *                        excluded from the pair table entirely.
    * Scale shape: payload bytes never move — the funnel shuffles only
    * (kind, sig) triples and doc-grain span counts; the accounting is
    * |kinds| rows. Value-exact (md5, integer gates, span hashes all
    * engine-portable).
    */
  def curatePairs(s: SparkSession, dir: String): DataFrame = {
    val d = new GraftCatalog(s, dir).table("documents")
    val toksLower = graft.functions.TextFns.tokensLower(col("text"))
    val words = expr(
      "filter(split(trim(lower(text)), '\\\\s+'), w -> length(w) > 0)")
    // ONE cached doc-grain pass projects EVERY per-doc feature the
    // funnel needs — md5 signature, token stats, AND the span-hash
    // array (r10 scanned documents twice: once for the pair features,
    // once for the span grain). All three consumers below read the
    // cached grain; the corpus is read and featurized exactly once.
    val grain = d.select(
      col("doc_id"),
      Dedup.isBenchDoc.as("is_bench"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      md5(encode(substring(col("text"), 1, 64), "UTF-8")).as("sig"),
      col("n_chars"),
      size(toksLower).cast("long").as("n_tokens"),
      size(array_distinct(toksLower)).cast("long").as("n_distinct"),
      graft.functions.TextFns.wordSpanHashes(words, Dedup.SpanWords).as("ghs"))
      .grainCache()
    val pairs = grain.where(!col("is_bench"))
      .select("doc_id", "kind", "sig", "n_chars", "n_tokens", "n_distinct")
    // C9 flag at doc grain: spans vs the benchmark's broadcast span set
    val benchSpans = grain.where(col("is_bench"))
      .select(explode(col("ghs")).as("gh")).distinct()
    val spanStats = grain.where(!col("is_bench"))
      .select(col("doc_id"), explode(col("ghs")).as("gh"))
      .join(broadcast(benchSpans.withColumn("hit", lit(1))), Seq("gh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum(coalesce(col("hit"), lit(0))).as("n_overlap"))
    val flagged = pairs
      .join(spanStats, Seq("doc_id"), "left")
      .withColumn("contaminated",
        coalesce(col("n_spans") > 0L && col("n_overlap") * 10 >= col("n_spans"), lit(false)))
      .withColumn("quality_ok",
        col("n_tokens") >= 20L && col("n_distinct") * 2 >= col("n_tokens"))
    val perSig = flagged.groupBy("kind", "sig").agg(
      count(lit(1)).as("n_in"),
      min_by(struct(col("quality_ok"), col("contaminated"),
        col("n_chars"), col("n_tokens")), col("doc_id")).as("surv"))
    val kept = col("surv.quality_ok") && !col("surv.contaminated")
    perSig.groupBy("kind").agg(
      sum("n_in").as("n_pairs"),
      count(lit(1)).as("n_unique"),
      sum(when(col("surv.quality_ok"), 1L).otherwise(0L)).as("n_quality"),
      sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
      sum(when(kept, col("surv.n_chars")).otherwise(0L)).as("kept_payload_bytes"),
      sum(when(kept, col("surv.n_tokens")).otherwise(0L)).as("kept_caption_tokens"))
      .orderBy("kind")
  }

  /** F7: MULTIMODAL token budget — H3's budget-balanced sampling with
    * the accounting extended beyond text: a (payload, caption) pair's
    * training cost is caption tokens PLUS modality tokens derived
    * deterministically from payload metadata (image → patch tokens
    * ⌈bytes/256⌉, audio → frame tokens ⌈bytes/320⌉, video → F3's
    * frame count × 64 patch tokens per frame — the ViT/whisper-shaped
    * unit conversions a real pipeline runs on decode metadata; here
    * they run on the declared byte stand-ins, same shape). The budget
    * is the smallest kind's total (H3's min rule across KINDS), each
    * kind down-samples to it with the deterministic doc-hash keep,
    * and the per-kind accounting splits caption vs payload tokens so
    * a mixture designer sees where the budget actually goes. All
    * integer arithmetic; value-exact.
    */
  def multimodalTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val pairs = new GraftCatalog(s, dir).table("documents")
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")
          .as("cap_toks"),
        length(col("text")).cast("long").as("n_bytes"))
      .withColumn("pay_toks", expr(
        """CASE kind WHEN 'image' THEN (n_bytes + 255) div 256
                     WHEN 'audio' THEN (n_bytes + 319) div 320
                     ELSE (n_bytes % 5 + 1) * 64 END""").cast("long"))
      .withColumn("toks", col("cap_toks") + col("pay_toks"))
      // ONE tokenize (the H5/E14 rule): this per-pair token grain
      // feeds both the per-kind totals and the final keep-rate join;
      // uncached, the caption tokenize ran twice over the corpus
      .grainCache()
    val totals = pairs.groupBy("kind").agg(
      sum("toks").as("total_tokens"),
      sum("cap_toks").as("caption_tokens"),
      sum("pay_toks").as("payload_tokens"))
    val budget = totals.agg(min("total_tokens").as("budget"))
    val rates = totals.crossJoin(broadcast(budget))
      .select(col("kind"), col("total_tokens"), col("caption_tokens"),
        col("payload_tokens"), col("budget"),
        expr("(budget * 1000000L) div total_tokens").as("rate_micro"))
    pairs.join(broadcast(rates), Seq("kind"))
      .withColumn("kept",
        (pmod(col("doc_id") * 1048573L + 11L, lit(1000000L)) < col("rate_micro"))
          .cast("int"))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum("kept").cast("long").as("n_kept"),
        first("caption_tokens").as("caption_tokens"),
        first("payload_tokens").as("payload_tokens"),
        first("total_tokens").as("total_tokens"),
        first("budget").as("budget_tokens"),
        first("rate_micro").as("rate_micro"),
        sum(col("kept") * col("toks")).as("kept_tokens"))
      .orderBy("kind")
  }

  /** F3: frame sampling — one video payload fans out to N frame rows
    * (N deterministic from payload size), each frame a 16-byte slice
    * emitted as uppercase hex (portable; the binary form is spec'd).
    */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    val vids = mmTable(s, dir).where(col("kind") === "video")
    val nFrames = (col("meta.n_bytes") % 5 + 1).cast("int")
    vids
      .select(col("doc_id"), col("payload"), col("meta.n_bytes").as("n_bytes"),
        posexplode(sequence(lit(0), nFrames - 1)).as(Seq("frame_idx", "frame_no")))
      .select(
        col("doc_id"), col("frame_idx"),
        // STUB FRAME DECODE: a 16-byte slice stands in for a decoded frame.
        hex(col("payload").substr((col("frame_idx") * 16 + 1).cast("int"), lit(16))).as("frame_hex"),
        col("n_bytes"))
      .withColumn("frame_len", (length(col("frame_hex")) / 2).cast("long"))
      .orderBy("doc_id", "frame_idx")
  }
}
