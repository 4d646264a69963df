package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Multimodal column operators (driver mandate: decode / feature-extract /
  * resize / frame-sample over opaque binary columns). Image payloads decode
  * FOR REAL through `ImageKernel` (JDK javax.imageio — PNG/JPEG sniffed by
  * magic bytes); non-image payloads fall back to the deterministic stub
  * formulas (video/audio demuxers are not in this container). Everything
  * Spark-side is real either way: `binary` columns flow through typed
  * `mapPartitions` batch kernels (the JVM analog of `mapInPandas`: one
  * iterator per partition, no per-row UDF dispatch), output schemas are
  * typed, and results are oracle-checked.
  *
  * Scale posture (100 TB): all three are narrow per-row transforms — no
  * shuffle except the presentation sort; payloads never leave their input
  * partition, which is the property that matters when the binary column is
  * images (MBs/row) rather than text.
  */
object Multimodal {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Stub "container metadata" decode — same formulas as
    * multimodal_decode_stub so the ops compose as one pipeline.
    */
  private def stubDims(nBytes: Long): (Long, Long, Long) =
    (64L + nBytes % 577, 64L + (nBytes * 31) % 417, 1L + nBytes % 7)

  val defs: Seq[QueryDef] = Seq(
    // Frame sampling: decode frame count (stub), emit every 2nd frame with
    // a per-frame content signature. One row in → n_frames/2 rows out, all
    // inside the partition (flatMap, no explode/shuffle).
    QueryDef(
      "multimodal_frame_sample",
      Some(
        "WITH m AS (SELECT doc_id, text, 1 + octet_length(encode(text)) % 7 AS n_frames FROM documents) " +
          "SELECT doc_id, CAST(i AS BIGINT) AS frame_idx, md5(text || '#' || i) AS frame_sig " +
          "FROM m, unnest(generate_series(0, n_frames - 1, 2)) AS t(i) ORDER BY doc_id, frame_idx"),
      (s, d) => {
        val sp = s
        import sp.implicits._
        Tables.t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("text").cast("binary").as("payload"))
          .as[(Long, String, Array[Byte])]
          .mapPartitions { it =>
            it.flatMap { case (id, text, bytes) =>
              // ??? real demuxer goes here (e.g. jcodec/ffmpeg frame walk)
              val nFrames = (1L + bytes.length % 7).toInt
              (0 until nFrames by 2).iterator
                .map(i => (id, i.toLong, md5hex(s"$text#$i")))
            }
          }
          .toDF("doc_id", "frame_idx", "frame_sig")
          .orderBy("doc_id", "frame_idx")
      }),

    // Resize: decode dimensions (stub), fit into a 224×224 box preserving
    // aspect ratio in exact integer math (round-half-up on the scaled side).
    QueryDef(
      "multimodal_resize",
      Some(
        "WITH m AS (SELECT doc_id, 64 + octet_length(encode(text)) % 577 AS w, " +
          "64 + (octet_length(encode(text)) * 31) % 417 AS h FROM documents) " +
          "SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h, " +
          "CAST(CASE WHEN w >= h THEN 224 ELSE (w*224 + h//2) // h END AS BIGINT) AS new_w, " +
          "CAST(CASE WHEN w >= h THEN (h*224 + w//2) // w ELSE 224 END AS BIGINT) AS new_h " +
          "FROM m ORDER BY doc_id"),
      (s, d) => {
        val sp = s
        import sp.implicits._
        Tables.t(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            it.map { case (id, bytes) =>
              // real decode for PNG/JPEG payloads; stub dims otherwise
              // (test corpus payloads are text, so the oracle sees stubs)
              val (w, h) = ImageKernel.dims(bytes).getOrElse {
                val (sw, sh, _) = stubDims(bytes.length.toLong)
                (sw, sh)
              }
              val (nw, nh) =
                if (w >= h) (224L, (h * 224 + w / 2) / w)
                else ((w * 224 + h / 2) / h, 224L)
              (id, w, h, nw, nh)
            }
          }
          .toDF("doc_id", "w", "h", "new_w", "new_h")
          .orderBy("doc_id")
      }),

    // Feature extraction: fixed-length feature vector per payload (stub:
    // 8-bucket histogram of token-initial byte values). The shape — binary
    // in, array<numeric> out, batch kernel per partition — is the real
    // embedding-model plumbing.
    QueryDef(
      "multimodal_feature_extract",
      Some(
        "SELECT doc_id, array_to_string(list_transform(generate_series(0,7), b -> " +
          "CAST(len(list_filter(string_split(text,' '), t -> length(t) > 0 AND ascii(t[1:1]) % 8 = b)) AS BIGINT)), ',') AS feat " +
          "FROM documents ORDER BY doc_id"),
      (s, d) => {
        val sp = s
        import sp.implicits._
        Tables.t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("text").cast("binary").as("payload"))
          .as[(Long, String, Array[Byte])]
          .mapPartitions { it =>
            it.map { case (id, text, bytes) =>
              // image payloads get a REAL pixel-luminance histogram; text
              // payloads the deterministic token-initial stub (what the
              // oracle computes — the corpus has no image rows)
              val feat = ImageKernel.decode(bytes) match {
                case Some(img) => ImageKernel.lumaHistogram(img)
                case None =>
                  val f = new Array[Long](8)
                  text.split(" ").foreach { t =>
                    if (t.nonEmpty) f(t.charAt(0).toInt % 8) += 1
                  }
                  f
              }
              (id, feat.mkString(","))
            }
          }
          .toDF("doc_id", "feat")
          .orderBy("doc_id")
      })
  )
}
