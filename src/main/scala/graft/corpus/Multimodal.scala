package graft.corpus

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * run per-partition over the binary batches.
  *
  * The decode step is a STUB — codec libraries are not available in this
  * environment — but everything Spark-side is real and tested: the binary
  * column schema, the per-partition batch iteration (one decoder instance
  * per partition, the same lifecycle a JNI codec handle would need), the
  * output metadata schema, and the partitioning contract (decode is a
  * narrow transform; heavy payloads should set
  * `spark.sql.files.maxPartitionBytes` low enough that a partition of
  * payloads fits executor memory).
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Attach a fake payload column (`binary`) derived from the text — the
    * stand-in for reading a real blob/fileref column.
    */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Stub decoder: deterministic pseudo-metadata from the payload bytes.
    * A real build replaces the body with the codec call (e.g. JNI image
    * decode); signature, batching and schema stay identical.
    */
  def decodeStub(payload: Array[Byte]): (String, Int, Int, Long) = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val fmt = (payload.length % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    (fmt, 64 + (b0 % 8) * 16, 64 + (payload.length % 8) * 16, payload.length.toLong)
  }

  /** Per-partition decode of the `payload` binary column → `meta` struct.
    * mapPartitions (not a per-row UDF) so a real decoder is constructed
    * once per partition and batches stay together.
    */
  def decode(df: DataFrame): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("meta", MetaSchema, nullable = false))
    val payloadIdx = inSchema.fieldIndex("payload")
    df.mapPartitions { it =>
      // real codecs initialize their (expensive, non-serializable) handle here
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val (fmt, w, h, n) = decodeStub(bytes)
        Row.fromSeq(row.toSeq :+ Row(fmt, w, h, n))
      }
    }(Encoders.row(outSchema))
  }

  /** Stub resize: re-encode the payload at a bounded target size and
    * update the meta struct — a real build swaps the body for the codec's
    * scale call. The Spark shape is the contract: narrow per-partition
    * transform, payload stays binary, meta width/height reflect the new
    * geometry, n_bytes shrinks with the target.
    */
  def resize(df: DataFrame, maxSide: Int): DataFrame = {
    val inSchema = df.schema
    require(inSchema.fieldNames.contains("meta"), "resize runs after decode()")
    val payloadIdx = inSchema.fieldIndex("payload")
    val metaIdx = inSchema.fieldIndex("meta")
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val meta = row.getStruct(metaIdx)
        val (w, h) = (meta.getInt(1), meta.getInt(2))
        val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
        val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        // codec scale call goes here; the stub truncates proportionally
        val nBytes =
          if (bytes.isEmpty) 0 else math.max(1, (bytes.length * scale * scale).toInt)
        val out = row.toSeq.updated(payloadIdx, bytes.take(nBytes))
          .updated(metaIdx, Row(meta.getString(0), nw, nh, nBytes.toLong))
        Row.fromSeq(out)
      }
    }(Encoders.row(inSchema))
  }

  /** Stub frame sampler: one output row per sampled frame of a video
    * payload — the flatMap shape (row explosion, frame index column,
    * per-frame payload slice) of a real `every-nth-frame` extractor.
    */
  def frameSample(df: DataFrame, everyNth: Int, maxFrames: Int = 16): DataFrame = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField("frame_idx", IntegerType, nullable = false))
      .add(StructField("frame", BinaryType, nullable = false))
    val payloadIdx = inSchema.fieldIndex("payload")
    df.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        // stub container parse: fixed-size "frames" of 64 bytes
        val frameSize = 64
        val nFrames = math.max(1, bytes.length / frameSize)
        (0 until nFrames by everyNth).take(maxFrames).map { f =>
          val frame = bytes.slice(f * frameSize, math.min(bytes.length, (f + 1) * frameSize))
          Row.fromSeq(row.toSeq :+ f :+ frame)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Stub feature extractor: fixed-dim float vector from payload bytes —
    * the plumbing of an embedding-model pass (dimension, batch shape,
    * column type all real; values deterministic fakes).
    */
  def features(df: DataFrame, dim: Int = 8): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false))
    val payloadIdx = inSchema.fieldIndex("payload")
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val v = Array.tabulate(dim) { i =>
          var acc = 0
          var j = i
          while (j < bytes.length) { acc = (acc + (bytes(j) & 0xff)) % 1000; j += dim }
          acc / 1000.0f
        }
        Row.fromSeq(row.toSeq :+ v.toSeq)
      }
    }(Encoders.row(outSchema))
  }
}
