package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** [extension] Multimodal columns: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The container has no real codec libraries, so the codec itself is a
  * STUB ([[Multimodal.StubDecoder]] — deterministic arithmetic over the
  * leading bytes). Everything AROUND the codec is the real design and is
  * tested: the schema (binary payload + metadata struct), the batched
  * per-partition decode (`mapPartitions` over a typed Dataset — decode
  * amortizes codec init per partition, the JVM analog of arrow-batched
  * Python UDFs), and the downstream relational stages. The seam is
  * PROVEN real, not asserted: [[ImageIoDecoder]] (pure-JVM
  * `javax.imageio`) decodes actual PNG pixels through the identical
  * `mapPartitions` boundary in ExtSpec — swapping in a JNI/ffmpeg
  * implementation changes no plumbing.
  *
  * Scale notes: media rows are large (MBs); the table would be stored
  * with a small row-group size and decoded features written to a narrow
  * sidecar table so analytics never re-scan the blobs. Decode is
  * map-side only — zero shuffles.
  */
object Multimodal {

  /** Synthetic media corpus derived deterministically from `documents`:
    * 32 pseudo-random bytes per row (md5-derived, so the DuckDB oracle
    * can reproduce every byte), kind round-robins image/audio/video. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      unhex(concat(md5(col("text")), md5(concat(col("text"), lit("x"))))).as("content"),
      struct(col("lang"), col("n_chars").as("source_chars")).as("meta"))

  /** Decoded per-media features (what a real codec would yield). */
  case class MediaFeatures(media_id: Long, kind: String, width: Int,
                           height: Int, n_frames: Int, duration_ms: Int,
                           n_bytes: Int)

  /** Codec boundary. Implementations must be deterministic per byte
    * array; they run inside executors, once per row, batched per
    * partition. */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Int)

    /** w×h grayscale thumbnail (row-major luma 0..255) — the downscale
      * step every perceptual hash (aHash/dHash/pHash) starts from. A
      * real codec decodes + resamples; the stub derives the grid from
      * the payload bytes deterministically. */
    def grayGrid(kind: String, bytes: Array[Byte], w: Int, h: Int): Array[Int]

    /** n pseudo-PCM samples (0..255) for AUDIO payloads — a real codec
      * decodes the compressed stream and resamples; the default derives
      * sample i from payload byte (i·31 + 7) mod len, the same
      * byte-spread convention as [[StubDecoder.grayGrid]], so the
      * DuckDB oracle replays every sample from the md5 hex. */
    def pcmSamples(kind: String, bytes: Array[Byte], n: Int): Array[Int] =
      Array.tabulate(n)(i => bytes((i * 31 + 7) % bytes.length) & 0xFF)
  }

  /** STUB codec — no real image/audio libs in this environment. Reads
    * "dimensions" from the leading bytes so results are deterministic
    * and oracle-checkable; replace with a real codec to productionize. */
  object StubDecoder extends MediaDecoder {
    override def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Int) = {
      def u(i: Int): Int = bytes(i) & 0xFF
      (u(0) * 256 + u(1), u(2) * 256 + u(3), u(4), u(5) * 1000)
    }
    /** Deterministic byte-spread "thumbnail": cell (x, y) reads payload
      * byte (x*31 + y*17) mod len — identical bytes give identical
      * grids (hamming 0), and the DuckDB oracle replays every cell from
      * the md5 hex. */
    override def grayGrid(kind: String, bytes: Array[Byte], w: Int, h: Int): Array[Int] =
      Array.tabulate(w * h) { i =>
        bytes(((i % w) * 31 + (i / w) * 17) % bytes.length) & 0xFF
      }
  }

  /** Real pure-JVM image codec behind the same boundary: PNG/JPEG via
    * `javax.imageio` (ships with the JDK — public API, no native libs).
    * Images decode to (width, height, 1 frame, 0 ms); audio/video have
    * no JDK codec and delegate to the stub. Exists to prove the
    * [[MediaDecoder]] seam carries a REAL codec unchanged (ExtSpec
    * round-trips a generated PNG through [[decodeFeatures]]); the
    * parquet corpus keeps the stub because its payloads are md5 bytes,
    * not image files. */
  object ImageIoDecoder extends MediaDecoder {
    override def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Int) =
      if (kind == "image") {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        require(img != null, "payload is not a decodable image")
        (img.getWidth, img.getHeight, 1, 0)
      } else StubDecoder.decode(kind, bytes)

    /** Real downscale: nearest-neighbor sample of the decoded pixels,
      * integer BT.601 luma — deterministic (no resampling filter, no
      * float rounding ambiguity), so a 1-pixel edit perturbs at most a
      * few cells and near-duplicate photos land at small hamming. */
    override def grayGrid(kind: String, bytes: Array[Byte], w: Int, h: Int): Array[Int] =
      if (kind == "image") {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        require(img != null, "payload is not a decodable image")
        Array.tabulate(w * h) { i =>
          val rgb = img.getRGB((i % w) * img.getWidth / w, (i / w) * img.getHeight / h)
          (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
        }
      } else StubDecoder.grayGrid(kind, bytes, w, h)
  }

  /** Batched decode: typed mapPartitions so a real decoder could hoist
    * per-partition codec initialization out of the row loop. */
  def decodeFeatures(media: DataFrame,
                     decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    val input = media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
    input.mapPartitions { it =>
      it.map { case (id, kind, bytes) =>
        val (w, h, frames, durMs) = decoder.decode(kind, bytes)
        MediaFeatures(id, kind, w, h, frames, durMs, bytes.length)
      }
    }(Encoders.product[MediaFeatures])
  }

  /** Feature table + relational post-stages: resize plan (bounded to
    * 224×224 preserving none of the aspect ratio — it's a stub) and
    * frame sampling for videos (≤4 evenly-spaced frame indices). */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(mediaTable(spark, sfDir)).toDF()
      .withColumn("resized_w", least(col("width"), lit(224)))
      .withColumn("resized_h", least(col("height"), lit(224)))
      .withColumn("frame_samples", when(col("kind") === "video",
        expr("sequence(0, n_frames - n_frames % greatest(int(n_frames / 4), 1), greatest(int(n_frames / 4), 1))"))
        .otherwise(lit(null).cast("array<int>")))

  /** Aggregate over decoded features — the narrow-sidecar analytics that
    * must never touch the blobs again. */
  def mediaStats(spark: SparkSession, sfDir: String): DataFrame =
    mediaFeatures(spark, sfDir)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        avg(col("width")).as("avg_w"),
        avg(col("height")).as("avg_h"),
        sum(col("n_bytes")).as("total_bytes"),
        avg(col("duration_ms")).as("avg_duration_ms"))

  /** Frame-sampling output: one row per sampled frame index per video —
    * the work list a frame-extraction stage would map over. */
  def mediaFrames(spark: SparkSession, sfDir: String): DataFrame =
    mediaFeatures(spark, sfDir)
      .filter(col("kind") === "video")
      .select(col("media_id"), explode(col("frame_samples")).as("frame_idx"))

  // ------------------------------------------------------------------
  // image near-dup tier (r10): aHash/dHash perceptual fingerprints
  // through the decoder seam, banded like Dedup.simhashPairs.

  /** The image sub-corpus for perceptual dedup. The synthetic corpus
    * has no byte-identical payloads, so every 48th document carries a
    * PLANTED constant payload — the real-world analog of a site banner
    * or logo recurring across pages, which is exactly what perceptual
    * dedup exists to catch. (48 is a multiple of 3, so the planted ids
    * are all image-kind rows of [[mediaTable]]'s round-robin.) */
  def imageTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("media_id"), lit("image").as("kind"),
        when(col("doc_id") % 48 === 0,
          unhex(concat(md5(lit("graft-banner")), md5(lit("graft-bannerx")))))
          .otherwise(unhex(concat(md5(col("text")), md5(concat(col("text"), lit("x"))))))
          .as("content"))

  // private[ext], not private: Scala-private nests compile to
  // JVM-private accessors, which Janino-generated encoder code cannot
  // call (codegen falls back to interpreted with an ERROR log per query)
  private[ext] case class GrayGrid(media_id: Long, g: Seq[Int])

  /** 9×8 grayscale thumbnails through the codec seam (same batched
    * mapPartitions boundary as [[decodeFeatures]]) — 9 wide so dHash
    * has its horizontal neighbor, aHash reads columns 0..7. */
  private def imageGrids(media: DataFrame, decoder: MediaDecoder): DataFrame = {
    val input = media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
    input.mapPartitions { it =>
      it.map { case (id, kind, bytes) =>
        GrayGrid(id, decoder.grayGrid(kind, bytes, 9, 8).toSeq)
      }
    }(Encoders.product[GrayGrid]).toDF()
  }

  // see GrayGrid's JVM-private note for why this is private[ext]
  private[ext] case class BandFp(media_id: Long, b0: Int, b1: Int, b2: Int,
                                 b3: Int, b4: Int, b5: Int, b6: Int, b7: Int)

  /** Per-image perceptual fingerprint as EIGHT 16-bit band ints:
    * b0..b3 = aHash (bit set iff cell ≥ grid mean — compared as
    * `cell*64 >= sum`, exact integer arithmetic, no float mean),
    * b4..b7 = dHash (bit set iff cell < right neighbor). The 16-bit
    * bands are simultaneously the LSH bucket keys (any equal band →
    * candidate pair) and the hamming operands (`bit_count(a ^ b)`
    * summed over bands) — no 64-bit value is ever materialized, which
    * sidesteps sign-bit trouble in both engines.
    *
    * r20 (guide §1.2 step 2 / §4): the bands are computed INSIDE the
    * decode mapPartitions as tight integer loops. The previous
    * relational form ran three interpreted higher-order aggregates per
    * image (64 + 2×(8×16) lambda steps, each with a boxed element_at
    * and a `pow(2, j)` double op — HOFs are CodegenFallback, so every
    * cell paid interpreted dispatch), and shipped the 72-cell grid
    * through the encoder as boxed Seq[Int]. The fused loop emits just
    * (media_id, 8 ints); arithmetic is bit-identical (`1 << j` =
    * `cast(pow(2, j) as int)` for j ≤ 15), and the DuckDB oracle
    * replays the same derivation from the md5 hex independently. */
  def imageFingerprintsOn(media: DataFrame,
                          decoder: MediaDecoder = StubDecoder): DataFrame = {
    val input = media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
    input.mapPartitions { it =>
      it.map { case (id, kind, bytes) =>
        val g = decoder.grayGrid(kind, bytes, 9, 8)
        // aHash cell i (0..63) lives at row i/8, col i%8 of the 9-wide grid
        @inline def apos(i: Int): Int = (i / 8) * 9 + (i % 8)
        var asum = 0
        var i = 0
        while (i < 64) { asum += g(apos(i)); i += 1 }
        val b = new Array[Int](8)
        var k = 0
        while (k < 4) {
          var av = 0
          var dv = 0
          var j = 0
          while (j < 16) {
            val p = apos(k * 16 + j)
            if (g(p) * 64 >= asum) av |= (1 << j)
            if (g(p) < g(p + 1)) dv |= (1 << j)
            j += 1
          }
          b(k) = av; b(k + 4) = dv; k += 1
        }
        BandFp(id, b(0), b(1), b(2), b(3), b(4), b(5), b(6), b(7))
      }
    }(Encoders.product[BandFp]).toDF()
  }

  /** Banded perceptual near-dup pairs — [[graft.ext.Dedup.simhashPairs]]'
    * shape on images: candidates share at least one 16-bit band,
    * verified by exact hamming over all 128 bits ≤ `maxHamming`.
    * Identical payloads land at hamming 0.
    *
    * Plan shape: the fingerprint relation (9 ints per image) is
    * materialized ONCE via localCheckpoint before the pair phase — the
    * blob-scanning decode subtree must not re-run per join branch (an
    * earlier 8-equi-join draft recomputed it up to 18×; this is the
    * same fingerprints-are-a-materialized-sidecar shape a 100 TB
    * deployment would use, where they'd be a written table). Banding is
    * ONE explode + ONE self-equi-join on (band_idx, band_value) — a
    * single shuffle of 8 narrow rows per image; a hot banner band is
    * AQE's skew-join case. */
  def imageNearDupsOn(media: DataFrame, decoder: MediaDecoder = StubDecoder,
                      maxHamming: Int = 10): DataFrame =
    bandedHammingPairs(imageFingerprintsOn(media, decoder), maxHamming)

  /** The band-LSH + hamming-verify pair phase over ANY
    * (media_id, b0..b7) 16-bit-band fingerprint relation — shared by
    * the image, video-frame, and audio dedup tiers (the r12 audio
    * fingerprints complete the triangle). The fingerprint relation is
    * materialized ONCE via localCheckpoint before the pair phase (the
    * decode subtree must not re-run per join branch — the
    * fingerprints-are-a-written-sidecar shape at 100 TB). */
  private[ext] def bandedHammingPairs(fp0: DataFrame,
                                      maxHamming: Int): DataFrame = {
    val bands = (0 until 8).map(i => s"b$i")
    val fp = fp0.localCheckpoint()
    val bl = fp.select(col("media_id"),
      posexplode(array(bands.map(col): _*)).as(Seq("bi", "bv")))
    val cand = bl.toDF("id_a", "bi", "bv")
      .join(bl.toDF("id_b", "bi", "bv"), Seq("bi", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val fa = fp.toDF(("id_a" +: bands.map(_ + "_a")): _*)
    val fb = fp.toDF(("id_b" +: bands.map(_ + "_b")): _*)
    cand.join(fa, "id_a").join(fb, "id_b")
      .withColumn("hamming",
        bands.map(b => expr(s"bit_count(${b}_a ^ ${b}_b)")).reduce(_ + _))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
  }

  def imageNearDups(spark: SparkSession, sfDir: String): DataFrame =
    imageNearDupsOn(imageTable(spark, sfDir))

  // ------------------------------------------------------------------
  // audio near-dup tier (r12): chromaprint-STYLE time-domain
  // fingerprints through the pcmSamples seam, banded like the image
  // tier — the third side of the image/video/audio dedup triangle.

  /** The audio sub-corpus. PLANTED dup: every doc_id % 48 == 1 row
    * (all audio-kind: 1 mod 48 ⇒ 1 mod 3) carries the same
    * 'graft-jingle' payload — the recurring intro/jingle/ad sting
    * audio dedup exists to catch. */
  def audioTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id").as("media_id"), lit("audio").as("kind"),
        when(col("doc_id") % 48 === 1,
          unhex(concat(md5(lit("graft-jingle")), md5(lit("graft-jinglex")))))
          .otherwise(unhex(concat(md5(col("text")), md5(concat(col("text"), lit("x"))))))
          .as("content"))

  /** Per-audio fingerprint as EIGHT 16-bit bands over the pcm stream
    * (chromaprint-STYLE, documented deviation: chromaprint hashes
    * sign-of-change across chroma FILTER outputs; this hashes
    * sign-of-change across the time-domain samples themselves —
    * bit m = pcm[m] < pcm[m+8], the energy-rise test at lag 8 — which
    * keeps the whole derivation integer-exact and oracle-replayable
    * with no FFT). Identical payloads land at hamming 0; the 16-bit
    * bands double as LSH bucket keys exactly like
    * [[imageFingerprintsOn]]. The decode runs through the
    * [[MediaDecoder.pcmSamples]] seam (batched mapPartitions) — a
    * real codec slots in unchanged. */
  def audioFingerprintsOn(media: DataFrame,
                          decoder: MediaDecoder = StubDecoder): DataFrame = {
    val input = media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
    // bands fused into the decode loop — same rewrite (and the same
    // bit-identical arithmetic argument) as imageFingerprintsOn r20:
    // the interpreted per-bit aggregate lambdas and the boxed 136-int
    // pcm Seq both leave the hot path
    input.mapPartitions { it =>
      it.map { case (id, kind, bytes) =>
        val s = decoder.pcmSamples(kind, bytes, 136)
        val b = new Array[Int](8)
        var k = 0
        while (k < 8) {
          var v = 0
          var j = 0
          while (j < 16) {
            if (s(k * 16 + j) < s(k * 16 + j + 8)) v |= (1 << j)
            j += 1
          }
          b(k) = v; k += 1
        }
        BandFp(id, b(0), b(1), b(2), b(3), b(4), b(5), b(6), b(7))
      }
    }(Encoders.product[BandFp]).toDF()
  }

  /** Banded audio near-dup pairs — [[bandedHammingPairs]] over the
    * audio fingerprints: candidates share a 16-bit band, verified by
    * exact hamming over all 128 bits. */
  def audioNearDups(spark: SparkSession, sfDir: String): DataFrame =
    bandedHammingPairs(audioFingerprintsOn(audioTable(spark, sfDir)), 10)

  /** Per-sampled-frame payload table for the VIDEO sub-corpus — the
    * input to frame-level perceptual dedup. Frame indices replicate
    * [[mediaFeatures]]' sampling relationally (n_frames is payload
    * byte 4 = md5(text) hex byte 4 — no decode needed to build the
    * work list); each (video, frame) carries a 32-byte deterministic
    * fake payload (the stub-decode seam — a real pipeline would slot
    * the codec's frame extractor here). PLANTED cross-video dup:
    * frame 0 of every video with media_id % 24 == 2 is the same intro
    * card — the channel-intro/outro reuse frame-level dedup exists to
    * catch. Frame key = media_id·1024 + frame_idx (frame_idx ≤ 255). */
  def videoFrameTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).filter(col("doc_id") % 3 === 2)
      .select(col("doc_id").as("media_id"), col("text"))
      .withColumn("nf", expr("cast(conv(substr(md5(text), 9, 2), 16, 10) as int)"))
      .withColumn("step", expr("greatest(int(nf / 4), 1)"))
      .withColumn("frame_idx", explode(expr("sequence(0, nf - nf % step, step)")))
      .select((col("media_id") * 1024 + col("frame_idx")).as("media_id"),
        lit("image").as("kind"),
        when(col("frame_idx") === 0 && col("media_id") % 24 === 2,
          unhex(concat(md5(lit("graft-intro")), md5(lit("graft-introx")))))
          .otherwise(unhex(concat(
            md5(concat(col("text"), lit("#"), col("frame_idx"))),
            md5(concat(col("text"), lit("#"), col("frame_idx"), lit("x"))))))
          .as("content"))

  /** Dense frame payloads with SCENE structure for cut detection:
    * every frame 0..(nf % 32) of each video, scene = frame DIV 8;
    * within a scene, payloads share the scene's 32 bytes except the
    * LAST byte, which drifts by (frame % 8) — a tiny luma jitter, so
    * within-scene fingerprints sit at small hamming while scene
    * boundaries jump to ~64 (independent md5s). The stub-decode seam
    * again: a real pipeline slots the codec's frame extractor here and
    * the detector below is unchanged. */
  def sceneFrameTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).filter(col("doc_id") % 3 === 2)
      .select(col("doc_id").as("vid"), col("text"))
      .withColumn("nf", expr("cast(conv(substr(md5(text), 9, 2), 16, 10) as int) % 32"))
      .filter(col("nf") >= 1)
      .withColumn("fi", explode(expr("sequence(0, nf)")))
      .withColumn("m1", expr("md5(concat(text, '#s', cast(fi div 8 as string)))"))
      .withColumn("m2", expr("md5(concat(text, '#s', cast(fi div 8 as string), 'x'))"))
      .select((col("vid") * 1024 + col("fi")).as("media_id"),
        lit("image").as("kind"),
        expr("unhex(concat(m1, substr(m2, 1, 30), " +
          "lpad(lower(hex((cast(conv(substr(m2, 31, 2), 16, 10) as int) + fi % 8) % 256)), 2, '0')))")
          .as("content"))

  /** Video scene-cut detection: a cut is a consecutive-frame pair
    * whose perceptual fingerprints ([[imageFingerprintsOn]] — the same
    * aHash/dHash sidecar the dedup tier materializes) differ by more
    * than `threshold` of 128 hamming bits. Shot-boundary detection is
    * the standard video-curation primitive (sample one frame per shot
    * instead of per second; drop static slideshows).
    *
    * Scale: fingerprints are map-side; the only stateful op is a lag
    * window PARTITIONED PER VIDEO (frame count bounded by the
    * sampler), so no global sort exists at any corpus size. Threshold
    * default 32: within-scene jitter measures ≤ ~16 bits (4 grid
    * cells touch the drifted byte, plus mean-crossing aHash flips),
    * scene boundaries ~64 (independent payloads). */
  def sceneCuts(spark: SparkSession, sfDir: String,
                threshold: Int = 32): DataFrame = {
    val bands = (0 until 8).map(i => s"b$i")
    val fp = imageFingerprintsOn(sceneFrameTable(spark, sfDir))
      .withColumn("video_id", expr("media_id DIV 1024"))
      .withColumn("frame_idx", expr("cast(media_id % 1024 as int)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("video_id")).orderBy(col("frame_idx"))
    val lagged = bands.foldLeft(fp) { (d, b) =>
      d.withColumn(b + "_p", lag(col(b), 1).over(w))
    }
    val hm = bands.map(b => expr(s"bit_count($b ^ ${b}_p)")).reduce(_ + _)
    lagged
      .withColumn("hm", when(col("b0_p").isNull, lit(null)).otherwise(hm))
      .groupBy(col("video_id"))
      .agg(count(lit(1)).as("n_frames"),
        count(when(col("hm") > threshold, 1)).as("n_cuts"),
        sort_array(collect_list(when(col("hm") > threshold, col("frame_idx"))))
          .as("__cf"))
      .selectExpr("video_id", "n_frames", "n_cuts",
        "concat_ws(',', transform(__cf, x -> cast(x as string))) as cut_frames")
  }

  /** Frame-level cross-VIDEO near-dup: [[imageNearDupsOn]] over the
    * sampled-frame payloads, aggregated back to video pairs — "these
    * two videos share n visually-identical frames". Same-video frame
    * matches are excluded (self-similarity is [[graft.ext.Dedup]]'s
    * span tier's business); a shared intro card is the hot-band skew
    * case, bounded by the planting rate here and by AQE skew-split at
    * scale. */
  def videoFrameNearDups(spark: SparkSession, sfDir: String): DataFrame =
    imageNearDupsOn(videoFrameTable(spark, sfDir))
      .select(expr("id_a DIV 1024").as("media_a"),
        expr("id_b DIV 1024").as("media_b"), col("hamming"))
      .filter(col("media_a") =!= col("media_b"))
      .groupBy(col("media_a"), col("media_b"))
      .agg(count(lit(1)).as("n_shared_frames"),
        min(col("hamming")).cast("int").as("min_hamming"))

  /** Per-image quality stats from the same thumbnail grid the hashes
    * use: brightness (mean luma), contrast (population stdev), and the
    * low-information flag an image-corpus filter drops on (flat ≈
    * single-color / blank frames). Outputs are exact-integer
    * micro-units, not round→DECIMAL (the r10 cross-engine hash-fail
    * class — DuckDB versions resolve decimal half-ties differently):
    * with luma ints, s = Σx and t = Σ(72x−s)² are exact BIGINTs, so
    * brightness_u = ⌊10⁶·s/72⌋ is pure integer floor-division,
    * contrast_u = ⌊10⁶·√(t/72³)⌋ is a chain of single correctly-
    * rounded IEEE ops on an exact t (bit-identical on any engine),
    * and flat ⇔ contrast < 10 ⇔ t < 100·72³ compares exactly. */
  def imageQualityOn(media: DataFrame,
                     decoder: MediaDecoder = StubDecoder): DataFrame = {
    imageGrids(media, decoder)
      .withColumn("s", expr("aggregate(g, CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .withColumn("t", expr(
        "aggregate(g, CAST(0 AS BIGINT), (acc, x) -> acc + (72 * x - s) * (72 * x - s))"))
      .select(col("media_id"),
        expr("CAST((1000000 * s) DIV 72 AS BIGINT)").as("brightness_u"),
        expr("CAST(floor(sqrt(t / 373248.0) * 1000000.0) AS BIGINT)").as("contrast_u"),
        expr("t < 37324800").as("flat"))
  }

  def imageQuality(spark: SparkSession, sfDir: String): DataFrame =
    imageQualityOn(imageTable(spark, sfDir))

  /** One fixed-duration audio chunk with its mean-sample energy — the
    * VAD/segmentation work unit of a speech pipeline. */
  case class AudioChunk(media_id: Long, chunk_idx: Int, start_ms: Int,
                        end_ms: Int, energy_milli: Long, is_silence: Boolean)

  /** Audio chunking + energy (the speech-pipeline front end: segment →
    * feature → silence-filter, all BEFORE any expensive ASR): each
    * audio payload decodes through the seam once, fans out to
    * ceil(duration/chunk) fixed-length chunks, and each chunk scores
    * the mean of its pseudo-PCM window (×1000, integer-floored — exact
    * on both engines). is_silence flags mean sample < 100. 100 TB
    * shape: one mapPartitions pass over the audio slice of the blob
    * scan, fan-out bounded by max-duration÷chunk, no shuffle at all —
    * downstream stages filter on is_silence relationally. */
  def audioChunksOn(media: DataFrame, decoder: MediaDecoder = StubDecoder,
                    chunkMs: Int = 30000, samplesPerChunk: Int = 16): DataFrame = {
    require(chunkMs > 0 && samplesPerChunk > 0,
      s"chunkMs/samplesPerChunk must be positive: $chunkMs/$samplesPerChunk")
    val input = media.filter(col("kind") === "audio")
      .select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
    input.mapPartitions { it =>
      it.flatMap { case (id, kind, bytes) =>
        val durMs = decoder.decode(kind, bytes)._4
        val nChunks = (durMs + chunkMs - 1) / chunkMs
        if (nChunks <= 0) Iterator.empty
        else {
          val pcm = decoder.pcmSamples(kind, bytes, nChunks * samplesPerChunk)
          (0 until nChunks).iterator.map { c =>
            val s = pcm.slice(c * samplesPerChunk, (c + 1) * samplesPerChunk)
              .foldLeft(0L)(_ + _)
            val e = s * 1000 / samplesPerChunk
            AudioChunk(id, c, c * chunkMs, math.min((c + 1) * chunkMs, durMs),
              e, e < 100000)
          }
        }
      }
    }(Encoders.product[AudioChunk]).toDF()
  }

  def audioChunks(spark: SparkSession, sfDir: String): DataFrame =
    audioChunksOn(mediaTable(spark, sfDir))

  /** Typed-metadata analytics: aggregate by a nested struct field
    * (meta.lang) without touching the binary payload — the struct
    * projection prunes to the two metadata columns at the scan. */
  def metaStats(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .groupBy(col("meta.lang").as("lang"), col("kind"))
      .agg(count(lit(1)).as("n"),
        avg(col("meta.source_chars")).as("avg_chars"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> ((s: SparkSession, d: String) =>
      mediaFeatures(s, d).drop("frame_samples")),
    "mm_stats" -> mediaStats _,
    "mm_frame_samples" -> mediaFrames _,
    "mm_meta_stats" -> metaStats _,
    "mm_phash_dupes" -> imageNearDups _,
    "mm_frame_phash_dupes" -> videoFrameNearDups _,
    "mm_scene_cuts" -> ((s: SparkSession, d: String) => sceneCuts(s, d)),
    "mm_image_quality" -> imageQuality _,
    "mm_audio_chunks" -> audioChunks _,
    "mm_audio_dupes" -> audioNearDups _,
  )

  /** Shared oracle CTE prefix: [[imageTable]] payload bytes replayed
    * from md5 hex into the 9×8 grid `gr(media_id, g)` — consumed by the
    * phash and image-quality oracles so grid derivation cannot drift. */
  private val imageGridCte: String =
    """imgs AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 48 = 0 THEN md5('graft-banner') ELSE md5(text) END AS h1,
      |    CASE WHEN doc_id % 48 = 0 THEN md5('graft-bannerx') ELSE md5(text || 'x') END AS h2
      |  FROM documents WHERE doc_id % 3 = 0),
      |bl AS (
      |  SELECT media_id, list_transform(range(0, 32), j ->
      |    CASE WHEN j < 16 THEN CAST(concat('0x', substr(h1, 2 * j + 1, 2)) AS INTEGER)
      |         ELSE CAST(concat('0x', substr(h2, 2 * (j - 16) + 1, 2)) AS INTEGER) END) AS b
      |  FROM imgs),
      |gr AS (
      |  SELECT media_id,
      |    list_transform(range(0, 72), i -> b[(i % 9 * 31 + i // 9 * 17) % 32 + 1]) AS g
      |  FROM bl)""".stripMargin

  /** Shared phash-pair CTE chain: given CTEs ending in an
    * `hx(media_id, h1, h2)` relation (two md5 hexes = the 32-byte
    * payload), emits grid → aHash/dHash bands → banded candidates →
    * `pairs(id_a, id_b, hamming ≤ 10)`. Band expressions are generated
    * (8 of them) so Spark and every oracle share one formula. */
  // g index for aHash cell i of the 9-wide grid (1-based list index) —
  // object-level so the pair chain AND the scene-cut oracle share one
  // band formula
  private def apos(i: String) = s"(($i) // 8) * 9 + (($i) % 8) + 1"
  private def aband(b: Int) =
    s"CAST(list_sum(list_transform(range(0, 16), j -> CASE WHEN " +
    s"g[${apos(s"$b * 16 + j")}] * 64 >= asum THEN CAST(2 ** j AS INTEGER) ELSE 0 END)) AS INTEGER) AS b$b"
  private def dband(b: Int) =
    s"CAST(list_sum(list_transform(range(0, 16), j -> CASE WHEN " +
    s"g[${apos(s"$b * 16 + j")}] < g[${apos(s"$b * 16 + j")} + 1] THEN CAST(2 ** j AS INTEGER) ELSE 0 END)) AS INTEGER) AS b${b + 4}"
  private def bandExprList: String =
    ((0 until 4).map(aband) ++ (0 until 4).map(dband)).mkString(",\n  ")

  /** The band-LSH candidate + hamming-verify CTE suffix over an `fp`
    * CTE with (media_id, b0..b7) — the oracle twin of
    * [[bandedHammingPairs]], shared by the image, frame, and audio
    * oracles. */
  private def candPairsSql: String = {
    val anyBand = (0 until 8).map(i => s"x.b$i = y.b$i").mkString(" OR ")
    val hamming = (0 until 8).map(i => s"bit_count(xor(fa.b$i, fb.b$i))").mkString(" + ")
    s"""cand AS (
       |  SELECT DISTINCT x.media_id AS id_a, y.media_id AS id_b
       |  FROM fp x JOIN fp y ON x.media_id < y.media_id AND ($anyBand)),
       |pairs AS (
       |  SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming FROM (
       |    SELECT c.id_a, c.id_b, $hamming AS hamming
       |    FROM cand c JOIN fp fa ON fa.media_id = c.id_a
       |    JOIN fp fb ON fb.media_id = c.id_b)
       |  WHERE hamming <= 10)""".stripMargin
  }

  private def phashPairsCtes(prefix: String): String = {
    val bandExprs = bandExprList
    s"""$prefix,
       |bl AS (
       |  SELECT media_id, list_transform(range(0, 32), j ->
       |    CASE WHEN j < 16 THEN CAST(concat('0x', substr(h1, 2 * j + 1, 2)) AS INTEGER)
       |         ELSE CAST(concat('0x', substr(h2, 2 * (j - 16) + 1, 2)) AS INTEGER) END) AS b
       |  FROM hx),
       |gr AS (
       |  SELECT media_id,
       |    list_transform(range(0, 72), i -> b[(i % 9 * 31 + i // 9 * 17) % 32 + 1]) AS g
       |  FROM bl),
       |ga AS (
       |  SELECT media_id, g,
       |    CAST(list_sum(list_transform(range(0, 64), i -> g[${apos("i")}])) AS INTEGER) AS asum
       |  FROM gr),
       |fp AS (
       |  SELECT media_id,
       |  $bandExprs
       |  FROM ga),
       |$candPairsSql""".stripMargin
  }

  /** The mm_audio_dupes oracle: payload bytes → pcm replay (sample i =
    * byte (i·31+7) mod 32, the [[MediaDecoder.pcmSamples]] default) →
    * lag-8 sign bands → the shared pair chain. */
  private def audioDupesOracle: String = {
    def band(k: Int) =
      s"CAST(list_sum(list_transform(range(0, 16), j -> CASE WHEN " +
      s"s[$k * 16 + j + 1] < s[$k * 16 + j + 9] THEN CAST(2 ** j AS INTEGER) ELSE 0 END)) " +
      s"AS INTEGER) AS b$k"
    s"""WITH hx AS (
       |  SELECT doc_id AS media_id,
       |    CASE WHEN doc_id % 48 = 1 THEN md5('graft-jingle') ELSE md5(text) END AS h1,
       |    CASE WHEN doc_id % 48 = 1 THEN md5('graft-jinglex') ELSE md5(text || 'x') END AS h2
       |  FROM documents WHERE doc_id % 3 = 1),
       |bl AS (
       |  SELECT media_id, list_transform(range(0, 32), j ->
       |    CASE WHEN j < 16 THEN CAST(concat('0x', substr(h1, 2 * j + 1, 2)) AS INTEGER)
       |         ELSE CAST(concat('0x', substr(h2, 2 * (j - 16) + 1, 2)) AS INTEGER) END) AS b
       |  FROM hx),
       |pcm AS (
       |  SELECT media_id,
       |    list_transform(range(0, 136), i -> b[(i * 31 + 7) % 32 + 1]) AS s
       |  FROM bl),
       |fp AS (
       |  SELECT media_id,
       |  ${(0 until 8).map(band).mkString(",\n  ")}
       |  FROM pcm),
       |$candPairsSql
       |SELECT id_a, id_b, hamming FROM pairs""".stripMargin
  }

  /** The mm_phash_dupes oracle: replay grid → bands → hamming verify. */
  private def phashOracle: String =
    s"""WITH ${phashPairsCtes(
         """hx AS (
           |  SELECT doc_id AS media_id,
           |    CASE WHEN doc_id % 48 = 0 THEN md5('graft-banner') ELSE md5(text) END AS h1,
           |    CASE WHEN doc_id % 48 = 0 THEN md5('graft-bannerx') ELSE md5(text || 'x') END AS h2
           |  FROM documents WHERE doc_id % 3 = 0)""".stripMargin)}
       |SELECT id_a, id_b, hamming FROM pairs""".stripMargin

  /** The mm_frame_phash_dupes oracle: frame sampling replayed from the
    * payload byte, frame payload hexes, the shared pair chain, then the
    * video-pair aggregate. */
  private def framePhashOracle: String =
    s"""WITH ${phashPairsCtes(
         """vids AS (
           |  SELECT doc_id AS vid, text,
           |    CAST(concat('0x', substr(md5(text), 9, 2)) AS INTEGER) AS nf
           |  FROM documents WHERE doc_id % 3 = 2),
           |fr AS (
           |  SELECT vid, text,
           |    CAST(unnest(range(0, nf - nf % greatest(nf // 4, 1) + 1,
           |                      greatest(nf // 4, 1))) AS INTEGER) AS fi
           |  FROM vids),
           |hx AS (
           |  SELECT vid * 1024 + fi AS media_id,
           |    CASE WHEN fi = 0 AND vid % 24 = 2 THEN md5('graft-intro')
           |         ELSE md5(text || '#' || CAST(fi AS VARCHAR)) END AS h1,
           |    CASE WHEN fi = 0 AND vid % 24 = 2 THEN md5('graft-introx')
           |         ELSE md5(text || '#' || CAST(fi AS VARCHAR) || 'x') END AS h2
           |  FROM fr)""".stripMargin)}
       |SELECT id_a // 1024 AS media_a, id_b // 1024 AS media_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_shared_frames,
       |  CAST(MIN(hamming) AS INTEGER) AS min_hamming
       |FROM pairs WHERE id_a // 1024 <> id_b // 1024
       |GROUP BY 1, 2""".stripMargin

  /** The mm_scene_cuts oracle: replay the scene-structured frame
    * payloads (byte 31 drifted by frame % 8 — applied directly on the
    * parsed INTS, no hex round-trip), grid → shared band formulas →
    * per-video lag hamming → cut report. */
  private def sceneCutsOracle: String =
    s"""WITH vids AS (
       |  SELECT doc_id AS vid, text,
       |    CAST(concat('0x', substr(md5(text), 9, 2)) AS INTEGER) % 32 AS nf
       |  FROM documents WHERE doc_id % 3 = 2),
       |fr AS (
       |  SELECT vid, text, CAST(unnest(range(0, nf + 1)) AS INTEGER) AS fi
       |  FROM vids WHERE nf >= 1),
       |hx AS (
       |  SELECT vid, fi,
       |    md5(text || '#s' || CAST(fi // 8 AS VARCHAR)) AS h1,
       |    md5(text || '#s' || CAST(fi // 8 AS VARCHAR) || 'x') AS h2
       |  FROM fr),
       |bl AS (
       |  SELECT vid, fi, list_transform(range(0, 32), j ->
       |    CASE WHEN j < 16 THEN CAST(concat('0x', substr(h1, 2 * j + 1, 2)) AS INTEGER)
       |         WHEN j < 31 THEN CAST(concat('0x', substr(h2, 2 * (j - 16) + 1, 2)) AS INTEGER)
       |         ELSE (CAST(concat('0x', substr(h2, 31, 2)) AS INTEGER) + fi % 8) % 256 END) AS b
       |  FROM hx),
       |gr AS (
       |  SELECT vid, fi,
       |    list_transform(range(0, 72), i -> b[(i % 9 * 31 + i // 9 * 17) % 32 + 1]) AS g
       |  FROM bl),
       |ga AS (
       |  SELECT vid, fi, g,
       |    CAST(list_sum(list_transform(range(0, 64), i -> g[${apos("i")}])) AS INTEGER) AS asum
       |  FROM gr),
       |fp AS (
       |  SELECT vid, fi,
       |  $bandExprList
       |  FROM ga),
       |lg AS (
       |  SELECT *,
       |    ${(0 until 8).map(i =>
            s"lag(b$i) OVER (PARTITION BY vid ORDER BY fi) AS p$i").mkString(",\n    ")}
       |  FROM fp),
       |hm AS (
       |  SELECT vid, fi,
       |    CASE WHEN p0 IS NULL THEN NULL ELSE
       |      ${(0 until 8).map(i => s"bit_count(xor(b$i, p$i))").mkString(" + ")} END AS h
       |  FROM lg)
       |SELECT vid AS video_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
       |  CAST(COUNT(*) FILTER (WHERE h > 32) AS BIGINT) AS n_cuts,
       |  COALESCE(string_agg(CAST(fi AS VARCHAR), ',' ORDER BY fi)
       |    FILTER (WHERE h > 32), '') AS cut_frames
       |FROM hm GROUP BY vid""".stripMargin

  /** byte i (0-based) of md5(text) as an int, in DuckDB. */
  private def mdByte(i: Int): String =
    s"CAST(concat('0x', substr(md5(text), ${2 * i + 1}, 2)) AS INTEGER)"

  val oracleSql: Map[String, String] = Map(
    "mm_phash_dupes" -> phashOracle,
    "mm_audio_dupes" -> audioDupesOracle,
    "mm_frame_phash_dupes" -> framePhashOracle,
    "mm_scene_cuts" -> sceneCutsOracle,
    // Exact-integer micro-units mirroring imageQualityOn: s and t are
    // exact BIGINTs, the contrast chain is single correctly-rounded
    // IEEE ops, flat is a pure integer compare — no round→DECIMAL
    // (the r10 cross-engine half-tie hash-fail class).
    "mm_image_quality" ->
      s"""WITH $imageGridCte,
         |m AS (SELECT media_id, g, CAST(list_sum(g) AS BIGINT) AS s FROM gr),
         |q AS (
         |  SELECT media_id, s,
         |    CAST(list_sum(list_transform(g, x -> (72 * x - s) * (72 * x - s))) AS BIGINT) AS t
         |  FROM m)
         |SELECT media_id,
         |  (1000000 * s) // 72 AS brightness_u,
         |  CAST(floor(sqrt(t / 373248.0) * 1000000.0) AS BIGINT) AS contrast_u,
         |  t < 37324800 AS flat
         |FROM q""".stripMargin,
    "mm_features" ->
      s"""SELECT doc_id AS media_id,
         |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  CAST(${mdByte(0)} * 256 + ${mdByte(1)} AS INTEGER) AS width,
         |  CAST(${mdByte(2)} * 256 + ${mdByte(3)} AS INTEGER) AS height,
         |  CAST(${mdByte(4)} AS INTEGER) AS n_frames,
         |  CAST(${mdByte(5)} * 1000 AS INTEGER) AS duration_ms,
         |  CAST(32 AS INTEGER) AS n_bytes,
         |  CAST(least(${mdByte(0)} * 256 + ${mdByte(1)}, 224) AS INTEGER) AS resized_w,
         |  CAST(least(${mdByte(2)} * 256 + ${mdByte(3)}, 224) AS INTEGER) AS resized_h
         |FROM documents""".stripMargin,
    "mm_stats" ->
      s"""SELECT kind, CAST(COUNT(*) AS BIGINT) AS n, AVG(width) AS avg_w,
         |  AVG(height) AS avg_h, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
         |  AVG(duration_ms) AS avg_duration_ms
         |FROM (
         |  SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |    ${mdByte(0)} * 256 + ${mdByte(1)} AS width,
         |    ${mdByte(2)} * 256 + ${mdByte(3)} AS height,
         |    ${mdByte(5)} * 1000 AS duration_ms, 32 AS n_bytes
         |  FROM documents)
         |GROUP BY kind""".stripMargin,
    "mm_meta_stats" ->
      """SELECT lang,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(COUNT(*) AS BIGINT) AS n, AVG(n_chars) AS avg_chars
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "mm_audio_chunks" ->
      s"""WITH au AS (
         |  SELECT doc_id AS media_id, md5(text) || md5(text || 'x') AS hx,
         |    ${mdByte(5)} * 1000 AS dur_ms
         |  FROM documents WHERE doc_id % 3 = 1),
         |ch AS (
         |  SELECT media_id, dur_ms, hx,
         |    CAST(unnest(range(0, (dur_ms + 29999) // 30000)) AS INTEGER) AS c
         |  FROM au),
         |sm AS (
         |  SELECT media_id, dur_ms, c, hx,
         |    CAST(unnest(range(0, 16)) AS INTEGER) AS i
         |  FROM ch),
         |en AS (
         |  SELECT media_id, dur_ms, c,
         |    SUM(CAST(concat('0x',
         |      substr(hx, (((c * 16 + i) * 31 + 7) % 32) * 2 + 1, 2)) AS INTEGER)) AS s
         |  FROM sm GROUP BY 1, 2, 3)
         |SELECT media_id, c AS chunk_idx,
         |  CAST(c * 30000 AS INTEGER) AS start_ms,
         |  CAST(LEAST((c + 1) * 30000, dur_ms) AS INTEGER) AS end_ms,
         |  CAST(s * 1000 // 16 AS BIGINT) AS energy_milli,
         |  s * 1000 // 16 < 100000 AS is_silence
         |FROM en""".stripMargin,
    "mm_frame_samples" ->
      s"""SELECT media_id, CAST(unnest(range(0, fend + 1, step)) AS INTEGER) AS frame_idx
         |FROM (
         |  SELECT media_id, nf - nf % step AS fend, step FROM (
         |    SELECT doc_id AS media_id, nf, greatest(nf // 4, 1) AS step FROM (
         |      SELECT doc_id, ${mdByte(4)} AS nf FROM documents WHERE doc_id % 3 = 2)))""".stripMargin,
  )
}
