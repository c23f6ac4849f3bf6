package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: media payloads
  * travel as opaque `binary` columns next to typed metadata, and
  * decode/feature-extract steps run per-partition so a real decoder (image
  * lib, ffmpeg binding) would amortize its init across a partition.
  *
  * The DECODE ITSELF IS A STUB — this container has no image/audio codecs —
  * implemented as a deterministic byte-statistics extractor, clearly marked
  * below. Everything around it is the real Spark shape you'd ship:
  *
  *  - schema: `payload binary` + `media_meta struct<format,width,height,
  *    n_frames>` columns;
  *  - partition-wise processing via `mapPartitions` over an explicit
  *    `Row` encoder (the Scala analogue of arrow-batched pandas UDFs:
  *    per-batch init, columnar in/out, no driver round-trip);
  *  - frame sampling = deterministic stride over the payload, emitting one
  *    row per sampled frame (a generator/explode shape);
  *  - all stages are narrow — media work never shuffles; only the final
  *    aggregate (if any) exchanges.
  *
  * At 100 TB the payloads dominate storage; the design keeps them in one
  * column that column pruning drops whenever a query touches only metadata.
  */
object Multimodal {

  val FrameSize = 64 // stub "frame" = 64 payload bytes
  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Synthesize a deterministic media corpus from `documents`: payload
    * bytes derived from the text (repeatable at any scale factor), metadata
    * derived from doc_id. Stands in for `spark.read.format("binaryFile")`. */
  def mediaCorpus(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      // payload: the md5 of the text repeated, truncated to a
      // doc-dependent length — an opaque, deterministic byte blob standing
      // in for real media
      to_binary(repeat(md5(col("text").cast("binary")), 8), lit("hex"))
        .substr(lit(1), (pmod(col("doc_id"), lit(97L)) + lit(32L)).cast("int"))
        .as("payload"),
      struct(
        when(pmod(col("doc_id"), lit(3)) === 0, "png")
          .when(pmod(col("doc_id"), lit(3)) === 1, "jpeg")
          .otherwise("wav").as("format"),
        (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
        (pmod(col("doc_id"), lit(4)) * 120 + 240).cast("int").as("height"),
        (pmod(col("doc_id"), lit(5)) + 1).cast("int").as("n_frames"))
        .as("media_meta"))

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("byte_len", LongType),
    StructField("mean_byte", DoubleType),
    StructField("feature_crc", LongType)))

  /** Partition-wise "decode"/feature-extract. Per-partition init happens
    * once (where a real codec context would be created), then each payload
    * is decoded to features.
    *
    * STUB: the real decoder is not available in this environment; the
    * deterministic fake below extracts byte statistics so the plumbing
    * (schema, batching, partition amortization) is fully exercised. Swap
    * `decodeOne` for a real codec call to productionize.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    media.select(col("doc_id"), col("payload"), col("media_meta.format"))
      .mapPartitions { rows =>
        // per-partition init — a real impl creates the codec context here
        val crc = new java.util.zip.CRC32()
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val fmt = r.getString(2)
          // --- deterministic fake decode (see scaladoc) ---
          var sum = 0L
          bytes.foreach(b => sum += (b & 0xff))
          crc.reset(); crc.update(bytes)
          Row(id, fmt, bytes.length.toLong,
            sum.toDouble / math.max(bytes.length, 1), crc.getValue)
        }
      }(enc)
  }

  /** Frame sampling: every `stride`-th FrameSize-byte window of the payload
    * becomes a row `(doc_id, frame_no, frame_bytes)` — the explode shape a
    * video pipeline uses before per-frame featurization. Pure columnar
    * (sequence + transform + explode), no UDF. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val nFrames = ((length(col("payload")) + lit(FrameSize - 1))
      .cast("long") / lit(FrameSize.toLong)).cast("long")
    media.select(col("doc_id"),
      explode(transform(
        sequence(lit(0L), nFrames - 1, lit(stride.toLong)),
        f => struct(f.as("frame_no"),
          col("payload").substr((f * FrameSize + 1).cast("int"),
            lit(FrameSize)).as("frame_bytes")))).as("fr"))
      .select(col("doc_id"), col("fr.frame_no").as("frame_no"),
        length(col("fr.frame_bytes")).cast("long").as("frame_len"),
        md5(col("fr.frame_bytes")).as("frame_md5"))
  }

  /** MM1 query: metadata + decoded features + frame counts, one row per
    * media object — exercises payload synthesis, partition-wise decode, and
    * metadata pruning in one plan. */
  def mediaSummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    val media = mediaCorpus(docs)
    val decoded = decodeFeatures(media)
    val frames = sampleFrames(media, stride = 2)
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("sampled_frames"),
        countDistinct(col("frame_md5")).as("distinct_frames"))
    decoded.join(frames, Seq("doc_id"))
      .join(media.select(col("doc_id"), col("media_meta.width").as("width"),
        col("media_meta.n_frames").as("meta_frames")), Seq("doc_id"))
      .select(col("doc_id"), col("format"), col("byte_len"),
        col("mean_byte"), col("width"), col("meta_frames"),
        col("sampled_frames"), col("distinct_frames"))
  }
}
