package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X5 — multimodal column plumbing (SURVEY.md §2c).
  *
  * Media assets are opaque `binary` payloads plus a typed metadata
  * struct — the schema a `spark.read.format("binaryFile")` ingest
  * would produce, here synthesized from `documents.text` bytes so the
  * plumbing is testable in this container.
  *
  * IMAGE decode AND resize are REAL (rounds 5+7): [[ImageIoCodec]]
  * drives the JDK-builtin `javax.imageio` PNG codec inside
  * `mapPartitions`; the oracled `x5_decode_meta` query hash-verifies
  * an actual encode → decode roundtrip, and `x5_resize_meta`
  * hash-verifies decode → nearest-neighbor resample (lossless
  * grayscale ⇒ the oracle predicts decoded dimensions, pixel sums,
  * and every resampled pixel exactly). Audio/VIDEO decode stays
  * STUBBED behind [[FakeDecoder]] — the JDK ships no such codec and
  * the sandbox has no media libraries — with the same batch-iterator
  * shape a real vectorized decoder would have. Everything Spark-side
  * is real either way: schema, per-partition batching, feature column
  * layout.
  *
  * Scale notes: payloads never shuffle (decode happens before any
  * wide op); feature extraction is `mapPartitions` so per-batch
  * library state (a model handle, a codec context) is initialized once
  * per partition, not per row.
  */
object Multimodal {

  /** A media asset row: opaque bytes + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      payload: Array[Byte],
      mime: String,
      source: String,
      n_bytes: Long)

  case class PngRecord(media_id: Long, png: Array[Byte], src_bytes: Long)
  case class DecodedMeta(media_id: Long, width: Long, height: Long, px_sum: Long)

  /** REAL image codec (round 5): `javax.imageio` — JDK-builtin, zero
    * new dependencies. Grayscale PNG is lossless, so a decode returns
    * exactly the samples that were encoded; [[decodeMeta]] exploits
    * that to put an actual codec under the driver's hash-compare gate.
    * JPEG would decode lossy (not oracle-mirrorable bit-for-bit) and
    * video stays on [[FakeDecoder]] — the JDK genuinely ships no video
    * codec. */
  object ImageIoCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Pack `bytes` row-major into a w×h 8-bit grayscale PNG
      * (truncate past w·h, zero-pad short payloads). */
    def encodePng(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      val n = math.min(bytes.length, w * h)
      while (i < n) {
        raster.setSample(i % w, i / w, 0, bytes(i) & 0xff)
        i += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Decode via the real codec; (width, height) come from the PNG
      * header, px_sum from the decoded raster samples. */
    def decode(png: Array[Byte]): (Int, Int, Long) = {
      val img = ImageIO.read(new ByteArrayInputStream(png))
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      (w, h, sum)
    }

    /** REAL resize (round 7): nearest-neighbor resample of a decoded
      * grayscale raster to w×h. Source index per output pixel is pure
      * integer arithmetic — `src = (y·srcH div h, x·srcW div w)` — so
      * the whole pixel pipeline (encode → decode → resample) is
      * deterministic and mirrored exactly by [[resizeMetaSql]]'s
      * arithmetic model of it. Returns row-major samples. */
    def resizeNearest(png: Array[Byte], w: Int, h: Int): Array[Int] = {
      val img = ImageIO.read(new ByteArrayInputStream(png))
      val raster = img.getRaster
      val (sw, sh) = (img.getWidth, img.getHeight)
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val sy = y * sh / h
        var x = 0
        while (x < w) { out(y * w + x) = raster.getSample(x * sw / w, sy, 0); x += 1 }
        y += 1
      }
      out
    }

    /** Re-encode resampled samples as a grayscale PNG (the binary-out
      * half of a real resize operator). */
    def encodeGrayPng(px: Array[Int], w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      while (i < w * h) { raster.setSample(i % w, i / w, 0, px(i)); i += 1 }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      brightness: Double)

  /** Deterministic stand-in for an image decoder: "decodes" payload
    * bytes into (width, height, brightness). Real implementation would
    * wrap an image library here — the signature (batched iterator in,
    * iterator out, one init per partition) is the real contract. */
  object FakeDecoder {
    def decodeBatch(rows: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
      // per-partition init would go here (model/codec handle)
      rows.map { r =>
        val b = r.payload
        val w = 16 + (math.abs(b.headOption.getOrElse(0: Byte).toInt) % 64)
        val h = 16 + (math.abs(b.lastOption.getOrElse(0: Byte).toInt) % 64)
        val bright =
          if (b.isEmpty) 0.0
          else b.map(x => (x & 0xff).toDouble).sum / b.length / 255.0
        MediaFeatures(r.media_id, r.mime, r.n_bytes, w, h, bright)
      }
    }
  }

  case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  case class ResizedRecord(media_id: Long, png: Array[Byte], width: Long, height: Long)

  /** Frame-sample stub: treats the payload as a "video" of fixed-size
    * frames and emits every `stride`-th frame — the row-explosion
    * shape (1 asset → N frames) a real video sampler produces. */
  def frameSampleStub(rows: Iterator[MediaRecord], frameSize: Int, stride: Int): Iterator[Frame] =
    rows.flatMap { r =>
      r.payload.grouped(frameSize).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (bytes, i) => Frame(r.media_id, i, bytes) }
    }

  /** REAL resize pipeline (round 7, replacing the round-5 truncation
    * stub): decode each PNG asset with the actual `javax.imageio`
    * codec, nearest-neighbor resample to w×h, re-encode — binary in,
    * binary out, inside `mapPartitions` so payloads never shuffle and
    * codec state stays partition-local. */
  def resized(spark: SparkSession, sfDir: String, w: Int, h: Int): Dataset[ResizedRecord] = {
    import spark.implicits._
    pngTable(spark, sfDir).mapPartitions { it =>
      it.map { r =>
        val px = ImageIoCodec.resizeNearest(r.png, w, h)
        ResizedRecord(r.media_id, ImageIoCodec.encodeGrayPng(px, w, h), w.toLong, h.toLong)
      }
    }
  }

  /** Frame sampling pipeline (1 → N explosion via mapPartitions). */
  def frames(spark: SparkSession, sfDir: String,
      frameSize: Int = 64, stride: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    mediaTable(spark, sfDir).mapPartitions(it => frameSampleStub(it, frameSize, stride))
  }

  /** Synthesize a media table from documents (payload = utf8 bytes). */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"),
        concat(lit("text/plain;src="), col("source")).as("mime"),
        col("source"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** Feature extraction over the stubbed decoder (mapPartitions). */
  def extractFeatures(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, sfDir).mapPartitions(FakeDecoder.decodeBatch _)
  }

  /** Oracled query form: binary metadata that both engines can compute
    * exactly (length, md5, hex prefix) — the decode stub itself is
    * engine-side only and covered by unit tests. */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).toDF()
      .select(
        col("media_id"), col("mime"), col("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        hex(expr("substring(payload, 1, 8)")).as("prefix_hex"))
      .orderBy(col("media_id"))

  val mediaMetaSql: String =
    """SELECT doc_id AS media_id,
      |  'text/plain;src=' || source AS mime,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS payload_md5,
      |  substr(hex(encode(text)), 1, 16) AS prefix_hex
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** Oracled frame query: drives the REAL `mapPartitions` frame
    * sampler ([[frames]]) and emits per-frame metadata both engines
    * can compute — so the 1→N explosion shape itself is under the
    * hash-compare gate, not just unit tests. The DuckDB mirror slices
    * the text with the same fixed-width/stride arithmetic
    * (`grouped(64)` keeps the short remainder frame; ASCII testdata ⇒
    * byte and char offsets coincide, as documented at
    * [[mediaMetaSql]]). */
  def framesMeta(spark: SparkSession, sfDir: String): DataFrame =
    frames(spark, sfDir, frameSize = 64, stride = 4).toDF()
      .select(
        col("media_id"),
        col("frame_no").cast("long").as("frame_no"),
        octet_length(col("frame_bytes")).cast("long").as("n_frame_bytes"),
        md5(col("frame_bytes")).as("frame_md5"))
      .orderBy(col("media_id"), col("frame_no"))

  val framesMetaSql: String =
    """WITH f AS (
      |  SELECT doc_id AS media_id, text,
      |    unnest(range(0, CAST(ceil(length(text) / 64.0) AS INT))) AS i
      |  FROM documents)
      |SELECT media_id,
      |  CAST(i AS BIGINT) AS frame_no,
      |  CAST(length(substr(text, i * 64 + 1, 64)) AS BIGINT) AS n_frame_bytes,
      |  md5(substr(text, i * 64 + 1, 64)) AS frame_md5
      |FROM f
      |WHERE i % 4 = 0
      |ORDER BY media_id, frame_no""".stripMargin

  /** Synthesize REAL PNG assets (one per document): text bytes packed
    * into a w×h grayscale image with per-asset dimensions
    * w = 16 + media_id mod 17, h = 16 + len mod 13, encoded by the
    * real `javax.imageio` PNG writer inside `mapPartitions` (payloads
    * never shuffle; codec state is partition-local). */
  def pngTable(spark: SparkSession, sfDir: String): Dataset[PngRecord] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("bytes"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("src_bytes"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { it =>
        it.map { case (id, bytes, n) =>
          val w = (16 + id % 17).toInt
          val h = (16 + n % 13).toInt
          PngRecord(id, ImageIoCodec.encodePng(bytes, w, h), n)
        }
      }
  }

  /** Fourth oracled X5 query (round 5): a REAL codec under the hash
    * gate. The PNG roundtrip is lossless grayscale, so the DECODED
    * width/height (read from the PNG header by `ImageIO.read`) and the
    * decoded-raster pixel sum are exactly predictable from the source
    * text — the DuckDB mirror computes them arithmetically (ASCII
    * testdata ⇒ byte values = code points, as at [[mediaMetaSql]])
    * while Spark's values come out of an actual encode → decode
    * through `javax.imageio`. Any codec deviation (wrong dimensions,
    * sample corruption, dropped rows) breaks the hash match. */
  def decodeMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    pngTable(spark, sfDir)
      .mapPartitions { it =>
        // per-partition init point for codec state (ImageIO is static)
        it.map { r =>
          val (w, h, sum) = ImageIoCodec.decode(r.png)
          DecodedMeta(r.media_id, w.toLong, h.toLong, sum)
        }
      }
      .toDF()
      .orderBy(col("media_id"))
  }

  val decodeMetaSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(16 + (doc_id % 17) AS BIGINT) AS width,
      |  CAST(16 + (length(text) % 13) AS BIGINT) AS height,
      |  CAST(list_sum(list_transform(
      |    range(1, least((16 + (doc_id % 17)) * (16 + (length(text) % 13)), length(text)) + 1),
      |    i -> ascii(substr(text, i, 1)))) AS BIGINT) AS px_sum
      |FROM documents
      |ORDER BY media_id""".stripMargin

  /** Output raster for the oracled resize (nearest-neighbor target). */
  val ResizeW = 8
  val ResizeH = 8

  case class ResizedPx(media_id: Long, width: Long, height: Long,
      px_sum: Long, px_csv: String)

  /** Third oracled X5 query, upgraded in round 7 from the truncation
    * stub to REAL pixel compute: every asset runs
    * encode → `ImageIO.read` decode → nearest-neighbor resample to
    * [[ResizeW]]×[[ResizeH]] inside `mapPartitions`, and the resampled
    * raster is pinned under the driver hash gate as its pixel sum plus
    * an md5 over the canonical comma-joined sample string (raw binary
    * would need NUL bytes, which the oracle's VARCHAR md5 cannot
    * carry). The DuckDB mirror models the whole pixel chain
    * arithmetically — source raster = row-major text bytes
    * zero-padded, NN source index = integer `(y·srcH div H, x·srcW
    * div W)` — so any codec or resampler deviation (wrong sample,
    * wrong mapping, dropped row) breaks the hash match. */
  def resizeMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    pngTable(spark, sfDir)
      .mapPartitions { it =>
        it.map { r =>
          val px = ImageIoCodec.resizeNearest(r.png, ResizeW, ResizeH)
          ResizedPx(r.media_id, ResizeW.toLong, ResizeH.toLong,
            px.foldLeft(0L)(_ + _), px.mkString(","))
        }
      }
      .toDF()
      .select(col("media_id"), col("width"), col("height"), col("px_sum"),
        md5(col("px_csv")).as("px_md5"))
      .orderBy(col("media_id"))
  }

  case class Hashed(media_id: Long, dhash: Long)

  /** Fifth oracled X5 query (round 7): PERCEPTUAL-HASH image dedup —
    * the image-side analog of the text near-dup family, and the
    * standard first pass of an image-dedup pipeline (resize-normalize
    * → difference hash → bucket by hash): every asset runs the REAL
    * codec chain (encode → `ImageIO.read` → nearest-neighbor resample
    * to [[ResizeW]]×[[ResizeH]]) and folds a 56-bit dHash (per row,
    * bit k = 1 iff px[x] < px[x+1] — gradient signs survive uniform
    * brightness/contrast shifts, which is why dHash is a PERCEPTUAL
    * hash; 8×7 comparisons keep the fold clear of the BIGINT sign
    * bit). Assets sharing a dHash are duplicate candidates; the
    * canonical copy is the lowest media id. The DuckDB mirror re-
    * derives every bit from [[resizeMetaSql]]'s arithmetic pixel
    * model, so the driver gate verifies the hash itself.
    *
    * Scale shape: decode+hash is partition-local mapPartitions (no
    * payload shuffle); the dedup tail shuffles slim (id, hash) rows
    * keyed by hash — identical physics to `x1_exact_dedup`, with the
    * hash domain bounded by the raster, not the corpus. */
  def phashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val hashed = pngTable(spark, sfDir)
      .mapPartitions { it =>
        it.map { r =>
          val px = ImageIoCodec.resizeNearest(r.png, ResizeW, ResizeH)
          var hsh = 0L
          var k = 0
          while (k < 56) {
            val left = (k / 7) * ResizeW + (k % 7)
            if (px(left) < px(left + 1)) hsh |= 1L << (55 - k)
            k += 1
          }
          Hashed(r.media_id, hsh)
        }
      }
      .toDF()
    val g = Window.partitionBy(col("dhash"))
    hashed.select(col("media_id"), col("dhash"),
        count(lit(1)).over(g).as("group_size"),
        (min(col("media_id")).over(g) === col("media_id")).as("is_canonical"))
      .orderBy(col("media_id"))
  }

  /** Mirror: the 8×8 arithmetic raster of [[resizeMetaSql]], each of
    * the 56 gradient bits re-derived and folded with the same bit
    * positions, then the same hash-partitioned group stats. */
  val phashDedupSql: String = {
    val (rw, rh) = (ResizeW, ResizeH)
    s"""WITH d AS (
       |  SELECT doc_id AS media_id, text,
       |    16 + (doc_id % 17) AS sw,
       |    16 + (length(text) % 13) AS sh
       |  FROM documents),
       |px AS (
       |  SELECT media_id,
       |    [CASE WHEN ((i // $rw) * sh // $rh) * sw + ((i % $rw) * sw // $rw)
       |            < least(length(text), sw * sh)
       |          THEN ascii(substr(text,
       |            ((i // $rw) * sh // $rh) * sw + ((i % $rw) * sw // $rw) + 1, 1))
       |          ELSE 0 END
       |     FOR i IN range(0, ${rw * rh})] AS p
       |  FROM d),
       |hashes AS (
       |  SELECT media_id,
       |    CAST(list_sum(
       |      [CASE WHEN p[(k // 7) * $rw + (k % 7) + 1] < p[(k // 7) * $rw + (k % 7) + 2]
       |            THEN CAST(1 AS BIGINT) << (55 - k) ELSE CAST(0 AS BIGINT) END
       |       FOR k IN range(0, 56)]) AS BIGINT) AS dhash
       |  FROM px)
       |SELECT media_id, dhash,
       |  CAST(count(*) OVER (PARTITION BY dhash) AS BIGINT) AS group_size,
       |  media_id = min(media_id) OVER (PARTITION BY dhash) AS is_canonical
       |FROM hashes
       |ORDER BY media_id""".stripMargin
  }

  /** Arithmetic model of the real pixel pipeline: the source raster
    * packs text bytes row-major into w=16+id mod 17, h=16+len mod 13
    * (zero-padded, truncated past w·h — [[pngTable]]'s layout, decode
    * losslessness established by [[decodeMeta]]), and each output
    * pixel reads source index (Y·h div RH)·w + (X·w div RW). */
  val resizeMetaSql: String = {
    val (rw, rh) = (ResizeW, ResizeH)
    s"""WITH d AS (
       |  SELECT doc_id AS media_id, text,
       |    16 + (doc_id % 17) AS sw,
       |    16 + (length(text) % 13) AS sh
       |  FROM documents),
       |px AS (
       |  SELECT media_id,
       |    [CASE WHEN ((i // $rw) * sh // $rh) * sw + ((i % $rw) * sw // $rw)
       |            < least(length(text), sw * sh)
       |          THEN ascii(substr(text,
       |            ((i // $rw) * sh // $rh) * sw + ((i % $rw) * sw // $rw) + 1, 1))
       |          ELSE 0 END
       |     FOR i IN range(0, ${rw * rh})] AS p
       |  FROM d)
       |SELECT media_id,
       |  CAST($rw AS BIGINT) AS width,
       |  CAST($rh AS BIGINT) AS height,
       |  CAST(list_sum(p) AS BIGINT) AS px_sum,
       |  md5(array_to_string(p, ',')) AS px_md5
       |FROM px
       |ORDER BY media_id""".stripMargin
  }
}
