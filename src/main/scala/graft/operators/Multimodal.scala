package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal column plumbing (builder brief): image/audio/video travel as
  * opaque BINARY payloads plus typed metadata; decode / feature-extract /
  * resize / frame-sample run as partition-local functions over the binary
  * column.
  *
  * The container has no media libraries, so the DECODE KERNEL IS A
  * DETERMINISTIC FAKE (clearly marked below): it derives metadata from the
  * payload bytes alone. Everything around it — the schema contract, the
  * batched per-partition execution, the partitioning behavior — is real
  * and tested (PipelineSpec: declarative/imperative agreement). Swapping `FakeDecoder` for a JNI/ffmpeg
  * binding changes one function, not the plan.
  *
  * Scale shape: `mapPartitions` keeps the decoder batched per partition
  * (amortizing any native-lib init), payloads never shuffle before the
  * decode, and the output is columnar metadata — the binary drops out of
  * the projection as soon as features are extracted.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Decoded-media metadata contract. */
  case class MediaMeta(
    doc_id: Long, n_bytes: Long, format: String,
    width: Int, height: Int, n_frames: Int)

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** DETERMINISTIC FAKE DECODER — stands in for the real image/audio
    * decode (no media libs in this container). Metadata is a pure
    * function of payload length and first byte, so tests and the oracle
    * can predict it. A real implementation would parse the container
    * format here and MUST keep the same signature. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
    MediaMeta(docId, n, fmt,
      width = (320 + n % 1600).toInt,
      height = (240 + (n * 7) % 840).toInt,
      n_frames = (1 + n % 240).toInt)
  }

  /** Partition-local batched decode: Dataset[(id, payload)] → metadata. */
  def decodePartitions(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.product[MediaMeta]
    payloads.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // Real decoders initialize their native context ONCE per
        // partition here, then stream the batch through it.
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }(enc)
      .toDF()
  }

  val queries: Map[String, Q] = Map(
    // Metadata extraction over a binary payload column. The text bytes
    // stand in for media bytes; the decode arithmetic matches FakeDecoder
    // so the declarative path and the mapPartitions path agree
    // (asserted in PipelineSpec).
    "q_mm_meta" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          length(col("payload")).cast("bigint").as("n_bytes"),
          sha2(col("payload"), 256).as("digest"),
          when(length(col("payload")) % 3 === 0, "png")
            .when(length(col("payload")) % 3 === 1, "jpeg")
            .otherwise("webp").as("format"),
          (lit(320) + length(col("payload")) % 1600).cast("int").as("width"),
          (lit(240) + (length(col("payload")).cast("bigint") * 7) % 840).cast("int").as("height"))
        .orderBy("doc_id")),

    // Resize plumbing: aspect-preserving fit into 640×480 — the target
    // geometry every thumbnailing stage computes before the (stubbed)
    // pixel work. Scale in double, output dims floored, never upscale.
    "q_mm_resize" -> ((s, dir) => {
      val w = (lit(320) + col("n_chars") % 1600).cast("double")
      val h = (lit(240) + (col("n_chars").cast("bigint") * 7) % 840).cast("double")
      val scale = least(lit(640.0) / w, lit(480.0) / h, lit(1.0))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          w.cast("int").as("src_w"), h.cast("int").as("src_h"),
          floor(w * scale).cast("int").as("out_w"),
          floor(h * scale).cast("int").as("out_h"))
        .orderBy("doc_id")
    }),

    // Frame sampling plumbing: every-Nth-frame index list per media row —
    // the explode shape a video pipeline uses, with frame count from the
    // (fake) decode.
    "q_mm_frames" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          (lit(1) + col("n_chars") % 240).cast("int").as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
          posexplode(expr("sequence(0, n_frames - 1, 30)")))
        .select(col("doc_id"), col("n_frames"),
          col("pos").as("sample_idx"), col("col").as("frame_no"))
        .orderBy("doc_id", "sample_idx")),
  )

  val oracle: Map[String, String] = Map(
    "q_mm_meta" -> """
      SELECT doc_id,
             CAST(n_chars AS BIGINT) AS n_bytes,
             sha256(text) AS digest,
             CASE WHEN n_chars % 3 = 0 THEN 'png'
                  WHEN n_chars % 3 = 1 THEN 'jpeg'
                  ELSE 'webp' END AS format,
             CAST(320 + n_chars % 1600 AS INTEGER) AS width,
             CAST(240 + (n_chars * 7) % 840 AS INTEGER) AS height
      FROM documents ORDER BY doc_id""",

    "q_mm_resize" -> """
      SELECT doc_id,
             CAST(w AS INTEGER) AS src_w, CAST(h AS INTEGER) AS src_h,
             CAST(floor(w * least(640.0 / w, 480.0 / h, 1.0)) AS INTEGER) AS out_w,
             CAST(floor(h * least(640.0 / w, 480.0 / h, 1.0)) AS INTEGER) AS out_h
      FROM (
        SELECT doc_id,
               CAST(320 + n_chars % 1600 AS DOUBLE) AS w,
               CAST(240 + (n_chars * 7) % 840 AS DOUBLE) AS h
        FROM documents)
      ORDER BY doc_id""",

    "q_mm_frames" -> """
      WITH t AS (
        SELECT doc_id, CAST(1 + n_chars % 240 AS INTEGER) AS n_frames
        FROM documents WHERE doc_id < 100)
      SELECT doc_id, n_frames,
             CAST(generate_subscripts(range(0, n_frames, 30), 1) - 1 AS INTEGER) AS sample_idx,
             CAST(unnest(range(0, n_frames, 30)) AS INTEGER) AS frame_no
      FROM t ORDER BY doc_id, sample_idx""",
  )
}
