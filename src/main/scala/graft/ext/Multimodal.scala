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
  }

  /** STUB codec — no real image/audio libs in this environment. Reads
    * "dimensions" from the leading bytes so results are deterministic
    * and oracle-checkable; replace with a real codec to productionize. */
  object StubDecoder extends MediaDecoder {
    override def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Int) = {
      def u(i: Int): Int = bytes(i) & 0xFF
      (u(0) * 256 + u(1), u(2) * 256 + u(3), u(4), u(5) * 1000)
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
  )

  /** byte i (0-based) of md5(text) as an int, in DuckDB. */
  private def mdByte(i: Int): String =
    s"CAST(concat('0x', substr(md5(text), ${2 * i + 1}, 2)) AS INTEGER)"

  val oracleSql: Map[String, String] = Map(
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
    "mm_frame_samples" ->
      s"""SELECT media_id, CAST(unnest(range(0, fend + 1, step)) AS INTEGER) AS frame_idx
         |FROM (
         |  SELECT media_id, nf - nf % step AS fend, step FROM (
         |    SELECT doc_id AS media_id, nf, greatest(nf // 4, 1) AS step FROM (
         |      SELECT doc_id, ${mdByte(4)} AS nf FROM documents WHERE doc_id % 3 = 2)))""".stripMargin,
  )
}
