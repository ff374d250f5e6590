package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** Multimodal column plumbing: media as opaque `binary` + typed metadata,
  * with decode/feature-extraction as a batched per-partition stage (the Scala
  * analog of a `mapInPandas` decode). The Spark-side contract — schema,
  * partition-level batching, feature row shape — is real and tested; the
  * codec itself is a SEAM: [[Codec.decode]] is a deterministic stand-in
  * (byte stats) because no image/audio library ships in this build. A real
  * deployment swaps in JPEG/PNG/audio decoding behind the same signature.
  *
  * Scale shape: decode runs inside `mapPartitions` (one codec init per
  * partition, streaming over rows — no per-row setup, no collect); binary
  * payloads never shuffle (features are extracted before any aggregation).
  */
object Multimodal {

  /** One media row: id + opaque payload + declared mime. */
  final case class MediaRow(id: Long, media: Array[Byte], mime: String)

  /** Extracted features — fixed, small, shuffle-friendly. */
  final case class MediaFeatures(
      id: Long,
      n_bytes: Long,
      head_byte: Int,
      checksum: Long,
      n_frames: Long
  )

  /** The codec seam. Deterministic byte-level "decode": size, first byte,
    * additive checksum, fake frame count (1 frame per 256-byte block).
    */
  object Codec {
    val FRAME_BYTES = 256L

    def decode(media: Array[Byte]): MediaFeatures = {
      var sum = 0L
      var i = 0
      while (i < media.length) { sum += media(i) & 0xff; i += 1 }
      MediaFeatures(
        id = -1L,
        n_bytes = media.length.toLong,
        head_byte = if (media.isEmpty) -1 else media(0) & 0xff,
        checksum = sum,
        n_frames = (media.length + FRAME_BYTES - 1) / FRAME_BYTES
      )
    }
  }

  /** Batched decode over a media dataset: one codec "session" per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition codec init would go here (native lib handles etc.)
      rows.map(r => Codec.decode(r.media).copy(id = r.id))
    }
  }

  /** DataFrame-friendly wrapper: (id: long, media: binary, mime: string). */
  def extractFeaturesDF(spark: SparkSession, df: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[MediaRow]
    extractFeatures(df.selectExpr("id", "media", "mime").as[MediaRow]).toDF()
  }
}
