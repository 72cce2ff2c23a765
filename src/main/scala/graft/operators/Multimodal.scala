package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/**
 * Multimodal column plumbing: image/audio/video payloads ride through
 * the engine as opaque `binary` columns with a typed metadata struct;
 * feature extraction runs batched per partition so a real decoder
 * (JNI codec, GPU preprocessor) amortizes setup per batch, not per
 * row.
 *
 * Header decode is REAL: `parseImageHeader` reads the public PNG IHDR
 * and JPEG SOF0/SOF1/SOF2 byte formats (walking marker segments, so
 * APP0/JFIF prefixes are handled) to emit true width/height/channels
 * from the payload bytes. Only the PIXEL decode (entropy-coded scan
 * data) is out of scope — this container has no image codecs — and a
 * real codec slots into the same per-batch hook with no plumbing
 * change.
 */
object Multimodal {

  /** A media row: payload + typed metadata (what a manifest-backed
    * media lake scan would produce). */
  final case class MediaRow(doc_id: Long, media: Array[Byte], mime: String, n_bytes: Int)

  /** Extracted features for one media payload. `format`/`width`/
    * `height`/`channels` are parsed from the REAL container header
    * (PNG IHDR / JPEG SOFn); `data_sum` checksums the payload AFTER
    * the header (the "pixel section"); `thumb_md5` is the checksum of
    * the stub-resized data section (every 4th byte — the 1-D stand-in
    * for a thumbnail; a real resize slots into the same per-batch
    * decode hook). */
  final case class MediaFeature(
      doc_id: Long, n_bytes: Int, format: String, width: Int, height: Int,
      channels: Int, data_sum: Long, thumb_md5: String, batch_id: Int)

  /** Parsed container-header facts: `headerLen` is the byte offset
    * where pixel/entropy data begins (end of IHDR for PNG, end of the
    * SOF segment for JPEG). */
  final case class ImageHeader(
      format: String, width: Int, height: Int, channels: Int, headerLen: Int)

  /**
   * Real image-header parser over the PUBLIC byte formats:
   *
   *  - PNG: 8-byte signature, then the IHDR chunk (must be first per
   *    the spec): 4-byte length, "IHDR", width/height as big-endian
   *    u32, bit depth, color type. Channels derive from color type
   *    (0 gray=1, 2 rgb=3, 3 palette=1, 4 gray+alpha=2, 6 rgba=4).
   *  - JPEG: SOI (FFD8), then a walk over marker segments (each
   *    FF xx + big-endian u16 length that counts itself), skipping
   *    APPn/COM/DQT/... until a baseline (SOF0), extended-sequential
   *    (SOF1) or progressive (SOF2) frame header: precision u8,
   *    height u16, width u16, component count u8.
   *
   * Returns None for anything unparseable (truncated, wrong magic,
   * no SOF before EOF) — callers surface format="unknown" rather
   * than failing the scan.
   */
  def parseImageHeader(b: Array[Byte]): Option[ImageHeader] = {
    def u8(i: Int): Int = b(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (b.length >= 33 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a) {
      if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) None
      else {
        val w = u32(16); val h = u32(20)
        val ihdrLen = u32(8).toInt
        val channels = u8(25) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
          case _ => -1
        }
        // w/h in (2³¹, 2³²) would wrap negative at toInt — the PNG
        // spec caps dimensions at 2³¹−1, so larger is hostile input
        if (channels < 0 || w <= 0 || h <= 0 ||
            w > Int.MaxValue || h > Int.MaxValue || ihdrLen != 13) None
        // signature + (length + type + 13 data + CRC)
        else Some(ImageHeader("png", w.toInt, h.toInt, channels, 8 + 12 + ihdrLen))
      }
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var out: Option[ImageHeader] = None
      var bad = false
      while (out.isEmpty && !bad && i + 4 <= b.length) {
        if (u8(i) != 0xff) bad = true
        else {
          val marker = u8(i + 1)
          // EOI ends the image: scanning past it would parse appended
          // trailer bytes (crafted fake SOF) as the frame header
          if (marker == 0xd9) bad = true
          // standalone markers (no length field): TEM, RSTn, SOI
          else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i += 2
          else {
            val segLen = u16(i + 2)
            if (segLen < 2 || i + 2 + segLen > b.length) bad = true
            else if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
              if (segLen < 8) bad = true
              else {
                val h = u16(i + 5); val w = u16(i + 7); val nc = u8(i + 9)
                out = Some(ImageHeader("jpeg", w, h, nc, i + 2 + segLen))
              }
            } else i += 2 + segLen
          }
        }
      }
      out
    } else None
  }

  /** Parsed WAV facts: `dataBytes` is the data chunk's declared size,
    * `headerLen` the byte offset where sample data begins. */
  final case class WavHeader(
      channels: Int, sampleRate: Int, bitsPerSample: Int,
      dataBytes: Int, headerLen: Int)

  /**
   * Real RIFF/WAVE header parser (public byte format): "RIFF" +
   * u32le riff size + "WAVE", then a chunk walk — each chunk is a
   * 4-byte id + u32le size (+ pad byte when odd, per the spec) —
   * until both the "fmt " chunk (PCM: audio format u16le, channels
   * u16le, sample rate u32le, byte rate, block align, bits per
   * sample) and the "data" chunk header are seen. Unknown chunks
   * (LIST, cue, bext…) are skipped by their declared size.
   */
  def parseWavHeader(b: Array[Byte]): Option[WavHeader] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def tag(i: Int, s: String): Boolean =
      i + 4 <= b.length && (0 until 4).forall(j => b(i + j) == s.charAt(j).toByte)
    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    while (i + 8 <= b.length) {
      val size = u32(i + 4) // u32le as Long: a 2³¹-scale declared size
      // must not overflow the cursor into negative indexing
      if (tag(i, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return None
        fmt = Some((u16(i + 10), u32(i + 12).toInt, u16(i + 22)))
      } else if (tag(i, "data")) {
        return fmt.collect { case (ch, sr, bits) if size <= Int.MaxValue =>
          WavHeader(ch, sr, bits, size.toInt, i + 8)
        }
      }
      val advance = 8L + size + (size & 1L) // chunks pad to even length
      if (i + advance > b.length) return None // declared past EOF: corrupt
      i = (i + advance).toInt
    }
    None
  }

  /** Parsed MP4 facts from the moov/mvhd box: `duration` is in
    * `timescale` units; `headerLen` is where mdat payload begins. */
  final case class Mp4Header(
      timescale: Int, duration: Long, dataBytes: Int, headerLen: Int)

  /**
   * Real ISO-BMFF/MP4 box parser (public byte format): top-level
   * boxes are u32be size + 4cc type (size 1 → u64 largesize follows,
   * size 0 → box runs to EOF); the movie header lives at
   * moov > mvhd, where version 0 carries timescale u32 / duration
   * u32 and version 1 (64-bit times) carries them at +8 with a u64
   * duration. Unknown boxes (ftyp, free, …) skip by declared size;
   * mdat supplies the payload extent.
   */
  def parseMp4Header(b: Array[Byte]): Option[Mp4Header] = {
    def u32(i: Int): Long = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def tag(i: Int, s: String): Boolean =
      i + 4 <= b.length && (0 until 4).forall(j => b(i + j) == s.charAt(j).toByte)
    var i = 0
    var mvhd: Option[(Int, Long)] = None
    var data: Option[(Int, Int)] = None
    var bad = false
    while (!bad && (mvhd.isEmpty || data.isEmpty) && i + 8 <= b.length) {
      val size0 = u32(i)
      val hdr = if (size0 == 1) 16 else 8
      val size: Long =
        if (size0 == 0) b.length - i
        else if (size0 == 1) { if (i + 16 <= b.length) u64(i + 8) else -1 }
        else size0
      if (size < hdr || i + size > b.length) bad = true
      else {
        if (tag(i + 4, "moov")) {
          var j = i + hdr
          val end = i + size.toInt
          while (!bad && mvhd.isEmpty && j + 8 <= end) {
            val csz = u32(j)
            if (csz < 8 || j + csz > end) bad = true
            else {
              if (tag(j + 4, "mvhd")) {
                (b(j + 8) & 0xff) match {
                  case 0 if j + 28 <= end => mvhd = Some((u32(j + 20).toInt, u32(j + 24)))
                  case 1 if j + 40 <= end => mvhd = Some((u32(j + 28).toInt, u64(j + 32)))
                  case _ => bad = true
                }
              }
              j += csz.toInt
            }
          }
        } else if (tag(i + 4, "mdat")) {
          data = Some(((size - hdr).toInt, i + hdr))
        }
        i += size.toInt
      }
    }
    if (bad) None
    else for { (ts, dur) <- mvhd; (db, hl) <- data } yield Mp4Header(ts, dur, db, hl)
  }

  private def be64(v: Long): Array[Byte] =
    be32((v >>> 32).toInt) ++ be32((v & 0xffffffffL).toInt)

  /** Minimal REAL MP4 container: ftyp + moov(mvhd v0 or v1, with
    * genuine rate/volume/matrix fields) + mdat carrying `data`.
    * mvhd v0 is the canonical 108-byte box, v1 the 120-byte 64-bit
    * variant — building both exercises both parser arms. */
  def buildMp4(timescale: Int, duration: Long, v1: Boolean,
      data: Array[Byte]): Array[Byte] = {
    def t(s: String) = s.getBytes("US-ASCII")
    val ftyp = be32(20) ++ t("ftyp") ++ t("isom") ++ be32(0) ++ t("isom")
    val times =
      if (v1) be64(0L) ++ be64(0L) ++ be32(timescale) ++ be64(duration)
      else be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration.toInt)
    val mvhdBody = Array[Byte](if (v1) 1 else 0, 0, 0, 0) ++ times ++
      be32(0x00010000) ++ be16(0x0100) ++ Array.fill[Byte](10)(0) ++
      // identity transformation matrix (fixed-point per the spec)
      (be32(0x00010000) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000)) ++
      Array.fill[Byte](24)(0) ++ be32(1)
    val mvhd = be32(8 + mvhdBody.length) ++ t("mvhd") ++ mvhdBody
    val moov = be32(8 + mvhd.length) ++ t("moov") ++ mvhd
    val mdat = be32(8 + data.length) ++ t("mdat") ++ data
    ftyp ++ moov ++ mdat
  }

  /** Minimal REAL PCM WAV container: RIFF/WAVE + canonical 16-byte
    * fmt chunk + data chunk header, `data` standing in for samples.
    * Header is exactly 44 bytes (the classic canonical WAV layout). */
  def buildWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      data: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val byteRate = sampleRate * blockAlign
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++ le32(byteRate) ++
      le16(blockAlign) ++ le16(bitsPerSample) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Minimal REAL PNG container: signature + IHDR (with genuine CRC32
    * over type+data, per the spec) followed by `data` standing in for
    * the IDAT stream. Header is exactly 33 bytes. */
  def buildPng(width: Int, height: Int, colorType: Int, data: Array[Byte]): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val typeAndData = "IHDR".getBytes("US-ASCII") ++
      be32(width) ++ be32(height) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)
    val crc = new java.util.zip.CRC32()
    crc.update(typeAndData)
    sig ++ be32(13) ++ typeAndData ++ be32(crc.getValue.toInt) ++ data
  }

  /** Minimal REAL JPEG container: SOI + JFIF APP0 (so the parser's
    * marker-segment skip is exercised) + SOF0 (baseline) or SOF2
    * (progressive) frame header, followed by `data` standing in for
    * the entropy-coded scan. Header is exactly 30 + 3*nComp bytes. */
  def buildJpeg(width: Int, height: Int, nComp: Int, progressive: Boolean,
      data: Array[Byte]): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
      "JFIF\u0000".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 0, 0, 1, 0, 1, 0, 0) // v1.2, aspect-ratio units, 1:1, no thumb
    val comps = (1 to nComp).flatMap(c => Array[Byte](c.toByte, 0x11, 0)).toArray
    val sof = Array(0xff, if (progressive) 0xc2 else 0xc0).map(_.toByte) ++
      be16(8 + 3 * nComp) ++ Array[Byte](8) ++ be16(height) ++ be16(width) ++
      Array[Byte](nComp.toByte) ++ comps
    soi ++ app0 ++ sof ++ data
  }

  /** Parsed PPM facts: `headerLen` is where the binary RGB raster
    * begins. */
  final case class PpmHeader(width: Int, height: Int, maxval: Int, headerLen: Int)

  /**
   * Real binary-PPM (P6) header parser over the public netpbm format:
   * "P6", then width, height, maxval as ASCII decimals separated by
   * whitespace runs — each of which may carry `#` comments to end of
   * line — then exactly ONE whitespace byte before the raster of
   * 3·w·h channel-interleaved bytes (1 byte/sample while maxval
   * < 256). Returns None for anything unparseable (wrong magic,
   * missing fields, maxval > 255, dims ≤ 0 or overflowing).
   */
  def parsePpmHeader(b: Array[Byte]): Option[PpmHeader] = {
    def isWs(c: Byte): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0x0b || c == 0x0c
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var i = 2
    def skipWs(): Boolean = {
      var progressed = false
      var cont = true
      while (cont && i < b.length) {
        if (isWs(b(i))) { i += 1; progressed = true }
        else if (b(i) == '#') {
          while (i < b.length && b(i) != '\n') i += 1
          progressed = true
        } else cont = false
      }
      progressed
    }
    def readInt(): Int = {
      var v = -1
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (b(i) - '0')
        if (v > (1 << 30)) return -1 // decimal overflow: hostile input
        i += 1
      }
      v
    }
    if (!skipWs()) return None
    val w = readInt()
    if (w <= 0 || !skipWs()) return None
    val h = readInt()
    if (h <= 0 || !skipWs()) return None
    val mv = readInt()
    if (mv <= 0 || mv > 255) return None
    if (i >= b.length || !isWs(b(i))) return None // the single raster separator
    i += 1
    if (w.toLong * h > Int.MaxValue / 3) None // raster size must fit an Int
    else Some(PpmHeader(w, h, mv, i))
  }

  /** Minimal REAL P6 PPM: canonical "P6\nW H\n255\n" header + the
    * channel-interleaved RGB raster. */
  def buildPpm(width: Int, height: Int, raster: Array[Byte]): Array[Byte] =
    s"P6\n$width $height\n255\n".getBytes("US-ASCII") ++ raster

  /** Per-asset pixel statistics decoded from the real PPM raster —
    * the one modality whose PAYLOAD (not just container header) is an
    * open uncompressed format, so the per-batch decode hook runs
    * end-to-end on real pixels with no codec dependency. */
  final case class PpmFeature(
      doc_id: Long, format: String, width: Int, height: Int,
      n_pixels: Long, mean_r: Option[Double], mean_g: Option[Double],
      mean_b: Option[Double])

  private[graft] def ppmWidth(id: Long): Int = 4 + (id % 13).toInt
  private[graft] def ppmHeight(id: Long): Int = 3 + (id % 7).toInt

  /** PPM table synthesized from documents: doc_id-derived geometry,
    * raster bytes tiled from the doc's ASCII bytes — closed form on
    * BOTH sides, so the oracle checks the full build→decode
    * round-trip including every pixel byte. */
  def ppmTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        require(text.nonEmpty && text.forall(_ < 128),
          s"ppmTable: empty or non-ASCII text in doc_id=$id (m07 oracle tiles byte ords)")
        val data = text.getBytes("US-ASCII")
        val raster = Array.tabulate(3 * ppmWidth(id) * ppmHeight(id))(j => data(j % data.length))
        val bytes = buildPpm(ppmWidth(id), ppmHeight(id), raster)
        MediaRow(id, bytes, "image/x-portable-pixmap", bytes.length)
      }
  }

  /** Batched per-partition PPM decode (the m01 hook shape: one
    * decoder init per batch amortizes at scale): parse the header,
    * deinterleave the raster, per-channel means over the REAL pixel
    * bytes. Unparseable or truncated payloads degrade to
    * format="unknown" with null means. */
  def extractPpmFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[PpmFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
      parsePpmHeader(r.media) match {
        case Some(h) if r.media.length - h.headerLen >= 3L * h.width * h.height =>
          val n = h.width * h.height
          var sr = 0L; var sg = 0L; var sb = 0L
          var off = h.headerLen
          var j = 0
          while (j < n) {
            sr += r.media(off) & 0xff
            sg += r.media(off + 1) & 0xff
            sb += r.media(off + 2) & 0xff
            off += 3; j += 1
          }
          PpmFeature(r.doc_id, "ppm", h.width, h.height, n.toLong,
            Some(sr.toDouble / n), Some(sg.toDouble / n), Some(sb.toDouble / n))
        case _ => PpmFeature(r.doc_id, "unknown", 0, 0, 0L, None, None, None)
      }
    }))
  }

  final case class PpmChan(
      doc_id: Long, channel: String, n: Long, sum: Long, sumsq: Long,
      bmin: Int, bmax: Int, h0: Long, h1: Long, h2: Long, h3: Long)

  /**
   * Per-channel HISTOGRAM + dispersion over the real P6 raster — the
   * image-QC profile a multimodal pipeline computes before training
   * (dead channels, clipped exposure, low-variance synthetic frames
   * all show up here). One long-form row per (image, channel): pixel
   * count, byte sum, byte sum-of-squares, min/max, and a 4-bin
   * histogram (bin = byte div 64) — every gate column an EXACT
   * integer, so the cross-engine hash has no FP surface at all; the
   * only float (std) derives from the exact moments in one r4
   * projection. Same batched per-partition decode hook as m07;
   * unparseable payloads emit nothing. Cost: one pass over raster
   * bytes per image, a pure map — the aggregate output is 3 rows of
   * 10 integers per image regardless of resolution.
   */
  def extractPpmChannelStats(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[PpmChan] = {
    val spark = media.sparkSession
    import spark.implicits._
    val names = Array("r", "g", "b")
    media.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
      parsePpmHeader(r.media) match {
        case Some(h) if r.media.length - h.headerLen >= 3L * h.width * h.height =>
          val n = h.width * h.height
          (0 until 3).map { c =>
            var s = 0L; var ss = 0L; var mn = 255; var mx = 0
            val hist = Array.fill(4)(0L)
            var off = h.headerLen + c
            var j = 0
            while (j < n) {
              val v = r.media(off) & 0xff
              s += v; ss += v.toLong * v
              if (v < mn) mn = v
              if (v > mx) mx = v
              hist(v >> 6) += 1L
              off += 3; j += 1
            }
            PpmChan(r.doc_id, names(c), n.toLong, s, ss, mn, mx,
              hist(0), hist(1), hist(2), hist(3))
          }
        case _ => Seq.empty[PpmChan]
      }
    }))
  }

  /** Per-patch summary row for [[extractPpmPatches]]. */
  final case class PpmPatch(
      doc_id: Long, patch_row: Int, patch_col: Int, n_px: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /**
   * m16: PATCHIFY — the ViT preprocessing shape (an image model
   * consumes P×P patches, not rasters; the patch grid + per-patch
   * statistics are the multimodal pipeline's tokenization step):
   * each decoded raster splits into a ⌈h/P⌉×⌈w/P⌉ grid (edge patches
   * ragged, n_px says how ragged) with exact integer per-channel
   * sums — the downstream normalize/embed stage consumes these
   * directly. Pure per-row byte walk (the m07/m11 batching); output
   * is patches-per-image rows, bytes never shuffle.
   */
  def extractPpmPatches(media: Dataset[MediaRow], p: Int = 2,
      batchSize: Int = 64): Dataset[PpmPatch] = {
    require(p >= 1 && p <= 64, s"extractPpmPatches: p in [1,64], got $p")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
      parsePpmHeader(r.media) match {
        case Some(h) if r.media.length - h.headerLen >= 3L * h.width * h.height =>
          val pw = (h.width + p - 1) / p
          val ph = (h.height + p - 1) / p
          val nPatch = pw * ph
          val npx = new Array[Long](nPatch)
          val sums = Array.ofDim[Long](nPatch, 3)
          var y = 0
          var off = h.headerLen
          while (y < h.height) {
            val prBase = (y / p) * pw
            var x = 0
            while (x < h.width) {
              val pi = prBase + x / p
              npx(pi) += 1L
              sums(pi)(0) += r.media(off) & 0xff
              sums(pi)(1) += r.media(off + 1) & 0xff
              sums(pi)(2) += r.media(off + 2) & 0xff
              off += 3; x += 1
            }
            y += 1
          }
          (0 until nPatch).map(pi => PpmPatch(r.doc_id, pi / pw, pi % pw,
            npx(pi), sums(pi)(0), sums(pi)(1), sums(pi)(2)))
        case _ => Seq.empty[PpmPatch]
      }
    }))
  }

  /** m16: 2×2 patch grid over the real PPM corpus. */
  def m16PpmPatchify(spark: SparkSession, dir: String): DataFrame =
    extractPpmPatches(ppmTable(spark, dir)).toDF()
      .select(col("doc_id"), col("patch_row"), col("patch_col"), col("n_px"),
        col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy("doc_id", "patch_row", "patch_col")

  /** m11: per-channel raster QC profile under the hash gate —
    * integer-exact moments/extrema/histogram per (image, channel),
    * std from the exact moments. */
  def m11PpmChannelStats(spark: SparkSession, dir: String): DataFrame =
    extractPpmChannelStats(ppmTable(spark, dir)).toDF()
      .select(col("doc_id"), col("channel"), col("n"), col("sum"), col("sumsq"),
        col("bmin"), col("bmax"), col("h0"), col("h1"), col("h2"), col("h3"),
        // sum² as a double product: a Long sum*sum wraps silently past
        // ~12M bright pixels (sum > 3e9). sum ≤ 255·n < 2^53 for any
        // realistic raster, so the double square is exact where the
        // Long one overflows; the oracle mirrors the same cast.
        Norm.r4(sqrt((col("sumsq").cast("double") -
            col("sum").cast("double") * col("sum").cast("double") / col("n")) /
          col("n"))).as("std"))
      .orderBy("doc_id", "channel")

  final case class PpmOtsu(
      doc_id: Long, thr_bin: Int, n_bg: Long, n_px: Long, fg_frac: Double)

  /**
   * OTSU threshold per image over the real P6 raster — the classic
   * global binarization (foreground/background split maximizing
   * between-class variance), the CV-pipeline step that gates
   * blank/flat frames and feeds mask-based filtering. Luminance is
   * the integer byte sum r+g+b ∈ [0, 765], binned to 64 levels
   * (lum div 12); for threshold t the between-class variance is
   * maximized as score(t) = a²/d with a = S0·W − S·W0 and
   * d = W0·(W − W0) (W0/S0 cumulative count/level-sum at t, W/S the
   * totals) — a and d are EXACT Int64 values (|a| < 63·n·n fits well
   * inside Int64 for any raster Spark can hold in a row), and the
   * score is the double PRODUCT a.toDouble·a.toDouble/d.toDouble —
   * never a Long square, which would wrap past ~120×120 px — so both
   * engines run the identical IEEE op sequence and order candidates
   * identically at any image size; argmax ties to
   * the smallest t. Same batched decode hook as m07; flat images
   * (one occupied bin — no valid split) emit thr −1 with counts
   * intact. Output: threshold bin, background count, pixel count,
   * 4-dp foreground fraction.
   */
  def extractPpmOtsu(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[PpmOtsu] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
      parsePpmHeader(r.media) match {
        case Some(h) if r.media.length - h.headerLen >= 3L * h.width * h.height =>
          val n = h.width * h.height
          val hist = new Array[Long](64)
          var p = 0
          while (p < n) {
            val off = h.headerLen + 3 * p
            val lum = (r.media(off) & 0xff) + (r.media(off + 1) & 0xff) +
              (r.media(off + 2) & 0xff)
            hist(lum / 12) += 1L
            p += 1
          }
          var wTot = 0L; var sTot = 0L
          var b = 0
          while (b < 64) { wTot += hist(b); sTot += b.toLong * hist(b); b += 1 }
          var bestT = -1; var bestScore = -1.0; var bestW0 = 0L
          var w0 = 0L; var s0 = 0L
          var t = 0
          while (t < 63) {
            w0 += hist(t); s0 += t.toLong * hist(t)
            if (w0 > 0 && w0 < wTot) {
              val a = s0 * wTot - sTot * w0
              val d = w0 * (wTot - w0)
              // a² as a double PRODUCT (not a Long square): |a| grows
              // ~16·n² with pixel count, so a*a in Int64 silently wraps
              // beyond ~120×120 px. a.toDouble*a.toDouble/d.toDouble is
              // the same IEEE op sequence the oracle runs, preserving
              // cross-engine candidate ordering at any raster size.
              val score = a.toDouble * a.toDouble / d.toDouble
              if (score > bestScore) { bestScore = score; bestT = t; bestW0 = w0 }
            }
            t += 1
          }
          val fg = if (bestT >= 0) (wTot - bestW0).toDouble / wTot.toDouble else 0.0
          Iterator.single(PpmOtsu(r.doc_id, bestT, bestW0, wTot,
            math.floor(fg * 10000 + 0.5) / 10000.0))
        case _ => Iterator.empty
      }
    }))
  }

  /** m12: Otsu global threshold per image under the hash gate. */
  def m12PpmOtsu(spark: SparkSession, dir: String): DataFrame =
    extractPpmOtsu(ppmTable(spark, dir)).toDF()
      .select(col("doc_id"), col("thr_bin"), col("n_bg"), col("n_px"),
        (col("fg_frac") + lit(0.0)).as("fg_frac"))
      .orderBy("doc_id")

  final case class PpmThumb(
      doc_id: Long, width: Int, height: Int, tw: Int, th: Int,
      checksum: Long, mean_r: Option[Double], mean_g: Option[Double],
      mean_b: Option[Double])

  /**
   * REAL nearest-neighbor resize over the decoded P6 raster — the
   * image-pipeline step (thumbnailing for preview / perceptual
   * dedup / model input) run end-to-end on actual pixel bytes, not a
   * stub: target pixel (x, y, c) reads source byte
   * raster[3·(⌊y·H/th⌋·W + ⌊x·W/tw⌋) + c] (integer floor map — the
   * standard NN sampler, exact in both engines), emitting the
   * resized-raster CHECKSUM (integer byte sum — any wrong pixel
   * breaks the hash gate) and per-channel thumbnail means. Same
   * batched per-partition decode hook as m07 (one decoder init per
   * batch); unparseable payloads degrade to zeroed dims + null means.
   * Cost is a pure per-row map ∝ tw·th, independent of source size.
   */
  def resizePpm(media: Dataset[MediaRow], tw: Int, th: Int,
      batchSize: Int = 64): Dataset[PpmThumb] = {
    require(tw >= 1 && th >= 1, s"resizePpm: target dims must be >= 1, got ${tw}x$th")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
      parsePpmHeader(r.media) match {
        case Some(h) if r.media.length - h.headerLen >= 3L * h.width * h.height =>
          var cs = 0L; var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < th) {
            val sy = y * h.height / th
            var x = 0
            while (x < tw) {
              val sx = x * h.width / tw
              val off = h.headerLen + 3 * (sy * h.width + sx)
              val rr = r.media(off) & 0xff
              val gg = r.media(off + 1) & 0xff
              val bb = r.media(off + 2) & 0xff
              cs += rr + gg + bb; sr += rr; sg += gg; sb += bb
              x += 1
            }
            y += 1
          }
          val n = tw * th
          PpmThumb(r.doc_id, h.width, h.height, tw, th, cs,
            Some(sr.toDouble / n), Some(sg.toDouble / n), Some(sb.toDouble / n))
        case _ => PpmThumb(r.doc_id, 0, 0, 0, 0, 0L, None, None, None)
      }
    }))
  }

  /** m10: 4×3 thumbnails of the synthetic PPM assets under the gate —
    * the resize boundary proven per-byte (checksum) end-to-end. */
  def m10PpmResize(spark: SparkSession, dir: String): DataFrame =
    resizePpm(ppmTable(spark, dir), tw = 4, th = 3).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("tw"), col("th"),
        col("checksum"),
        Norm.r4(col("mean_r")).as("mean_r"),
        Norm.r4(col("mean_g")).as("mean_g"),
        Norm.r4(col("mean_b")).as("mean_b"))
      .orderBy("doc_id")

  /** m07: pixel-level decode under the gate — per-channel means over
    * the real P6 raster (the last declared decode boundary proven
    * end-to-end on an uncompressed public format). */
  def m07PpmPixels(spark: SparkSession, dir: String): DataFrame =
    extractPpmFeatures(ppmTable(spark, dir)).toDF()
      .select(col("doc_id"), col("format"), col("width"), col("height"), col("n_pixels"),
        Norm.r4(col("mean_r")).as("mean_r"),
        Norm.r4(col("mean_g")).as("mean_g"),
        Norm.r4(col("mean_b")).as("mean_b"))
      .orderBy("doc_id")

  // -------------------------------------------------------------- m14 tar

  /** One indexed tar member: POSIX ustar-style name, byte offset of
    * the member's DATA section within the archive, and declared size. */
  final case class TarMember(name: String, offset: Long, size: Long)

  /** Minimal REAL tar (ustar-flavored) writer: per member a 512-byte
    * header — name at 0 (NUL-padded, ≤100), mode/uid/gid as octal
    * ASCII, size as 11-digit octal at 124, mtime 0, the checksum at
    * 148 computed over the header with the checksum field as SPACES
    * (the tar rule), typeflag '0' — then the data padded to the next
    * 512 boundary; the archive ends with two zero blocks. */
  def buildTar(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, data) =>
      val h = new Array[Byte](512)
      val nb = name.getBytes("US-ASCII")
      require(nb.length <= 100, s"buildTar: name too long: $name")
      System.arraycopy(nb, 0, h, 0, nb.length)
      def octal(off: Int, len: Int, v: Long): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val padded = ("0" * (len - 1 - s.length)) + s
        System.arraycopy(padded.getBytes("US-ASCII"), 0, h, off, len - 1)
        h(off + len - 1) = 0
      }
      octal(100, 8, 420 /* 0644 */); octal(108, 8, 0); octal(116, 8, 0)
      octal(124, 12, data.length.toLong); octal(136, 12, 0)
      h(156) = '0'
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      var i = 0
      while (i < 512) { sum += (h(i) & 0xff); i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val csPad = ("0" * (6 - cs.length)) + cs
      System.arraycopy(csPad.getBytes("US-ASCII"), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      out.write(h)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /**
   * Real tar header walk — the WebDataset container contract: a
   * training shard IS a tar, and the (member → offset, size) index is
   * what makes random access into a 100 TB shard store possible
   * without unpacking. Walks 512-byte headers, parses the NUL-padded
   * name and the OCTAL size field, VERIFIES the header checksum
   * (sum of header bytes with the checksum field as spaces), skips
   * data padded to the 512 boundary, stops at the zero block.
   * Returns None on any malformed header (bad checksum, non-octal
   * size, truncation) — a corrupt shard degrades, never misindexes.
   */
  def parseTarIndex(b: Array[Byte]): Option[Seq[TarMember]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[TarMember]
    var off = 0
    while (off + 512 <= b.length) {
      var allZero = true
      var i = 0
      while (allZero && i < 512) { if (b(off + i) != 0) allZero = false; i += 1 }
      if (allZero) return Some(out.toSeq)
      var nameEnd = 0
      while (nameEnd < 100 && b(off + nameEnd) != 0) nameEnd += 1
      val name = new String(b, off, nameEnd, "US-ASCII")
      var size = 0L
      var j = 124
      var ok = true
      while (ok && j < 136 && b(off + j) != 0 && b(off + j) != ' ') {
        val c = b(off + j)
        if (c < '0' || c > '7') ok = false
        else { size = size * 8 + (c - '0'); j += 1 }
      }
      if (!ok || size < 0) return None
      var sum = 0L
      var k = 0
      while (k < 512) {
        sum += (if (k >= 148 && k < 156) ' '.toInt else (b(off + k) & 0xff))
        k += 1
      }
      var declared = 0L
      var m = 148
      var seen = false
      while (m < 156 && b(off + m) != 0 && b(off + m) != ' ') {
        val c = b(off + m)
        if (c >= '0' && c <= '7') { declared = declared * 8 + (c - '0'); seen = true }
        m += 1
      }
      if (!seen || declared != sum) return None
      out += TarMember(name, off + 512L, size)
      val dataBlocks = ((size + 511) / 512) * 512
      if (off + 512 + dataBlocks > b.length) return None
      off += 512 + dataBlocks.toInt
    }
    None // ran off the end without the terminator
  }

  /** Tar shard table: each doc packs a 3-member WebDataset-style
    * sample — `<id>/text.txt` (the doc bytes), `<id>/meta.json`
    * (closed-form JSON), `<id>/label.cls` (the lang code) — so every
    * member's offset/size/md5 is closed-form on the oracle side
    * while the engine walks the real archive bytes. */
  def tarTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        require(text.nonEmpty && text.forall(_ < 128),
          s"tarTable: empty or non-ASCII text in doc_id=$id (m14 oracle mirrors byte lengths)")
        val bytes = buildTar(Seq(
          (s"$id/text.txt", text.getBytes("US-ASCII")),
          (s"$id/meta.json", s"""{"id":$id}""".getBytes("US-ASCII")),
          (s"$id/label.cls", lang.getBytes("US-ASCII"))))
        MediaRow(id, bytes, "application/x-tar", bytes.length)
      }
  }

  /** m14: the member index + per-member content digest decoded from
    * real tar bytes (checksum-verified header walk). */
  def m14TarIndex(spark: SparkSession, dir: String): DataFrame = {
    val media = tarTable(spark, dir)
    val sess = media.sparkSession
    import sess.implicits._
    media.flatMap { r =>
      parseTarIndex(r.media) match {
        case Some(ms) => ms.map { m =>
          val data = java.util.Arrays.copyOfRange(
            r.media, m.offset.toInt, (m.offset + m.size).toInt)
          (r.doc_id, m.name, m.offset, m.size,
            java.security.MessageDigest.getInstance("MD5").digest(data)
              .map("%02x".format(_)).mkString)
        }
        case None => Seq((r.doc_id, "__corrupt__", -1L, -1L, ""))
      }
    }.toDF("doc_id", "member", "offset", "size", "data_md5")
      .orderBy("doc_id", "member")
  }

  /** Parsed BITMAPINFOHEADER facts needed to walk a 24-bpp
    * uncompressed BMP raster. `topDown` is the negative-height
    * variant; `dataOffset` comes from the file header (may skip a
    * palette). */
  final case class BmpHeader(width: Int, height: Int, dataOffset: Int, topDown: Boolean)

  /**
   * Real BMP (Windows DIB) header parser — the SECOND uncompressed
   * public raster format after PPM, and a genuinely different
   * container contract: multi-byte fields are LITTLE-endian, pixel
   * rows are stored BOTTOM-UP (unless height is negative) in BGR
   * channel order, and every stored row pads to a 4-byte boundary.
   * Accepts only the uncompressed 24-bpp single-plane form (BI_RGB);
   * anything else returns None and degrades like the other decoders.
   */
  def parseBmpHeader(b: Array[Byte]): Option[BmpHeader] = {
    def le32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOffset = le32(10)
    val dibSize = le32(14)
    if (dibSize < 40) return None // BITMAPCOREHEADER not supported
    val w = le32(18)
    val hRaw = le32(22)
    val planes = le16(26)
    val bpp = le16(28)
    val compression = le32(30)
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0 || planes != 1 || bpp != 24 || compression != 0) None
    else if (w.toLong * h > Int.MaxValue / 3 || dataOffset < 54) None
    else Some(BmpHeader(w, h, dataOffset, topDown = hRaw < 0))
  }

  /** Minimal REAL 24-bpp bottom-up BMP: 14-byte file header +
    * 40-byte BITMAPINFOHEADER + padded BGR rows. `pixelsStored` is
    * the raster in STORED (bottom-up) row order WITHOUT padding;
    * padding bytes are zero as the format prescribes. */
  def buildBmp(width: Int, height: Int, pixelsStored: Array[Byte]): Array[Byte] = {
    require(pixelsStored.length == 3 * width * height, "buildBmp: raster size")
    val stride = ((3 * width + 3) / 4) * 4
    val imgSize = stride * height
    val out = new Array[Byte](54 + imgSize)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, 54 + imgSize); le32(10, 54)
    le32(14, 40); le32(18, width); le32(22, height)
    le16(26, 1); le16(28, 24); le32(30, 0); le32(34, imgSize)
    le32(38, 2835); le32(42, 2835); le32(46, 0); le32(50, 0)
    var r = 0
    while (r < height) {
      System.arraycopy(pixelsStored, r * 3 * width, out, 54 + r * stride, 3 * width)
      r += 1
    }
    out
  }

  final case class BmpFeature(
      doc_id: Long, format: String, width: Int, height: Int,
      n_pixels: Long, mean_b: Option[Double], mean_g: Option[Double],
      mean_r: Option[Double], top_row_sum: Option[Long])

  private[graft] def bmpWidth(id: Long): Int = 3 + (id % 13).toInt
  private[graft] def bmpHeight(id: Long): Int = 3 + (id % 7).toInt

  /** BMP table synthesized from documents — doc_id-derived geometry,
    * stored-order raster bytes tiled from the doc's ASCII bytes
    * (closed form on both sides; padding is NOT part of the tiling,
    * so a decoder that walks rows without honoring the 4-byte stride
    * reads padding zeros as pixels and fails the hash gate). */
  def bmpTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        require(text.nonEmpty && text.forall(_ < 128),
          s"bmpTable: empty or non-ASCII text in doc_id=$id (m13 oracle tiles byte ords)")
        val data = text.getBytes("US-ASCII")
        val raster = Array.tabulate(3 * bmpWidth(id) * bmpHeight(id))(j => data(j % data.length))
        val bytes = buildBmp(bmpWidth(id), bmpHeight(id), raster)
        MediaRow(id, bytes, "image/bmp", bytes.length)
      }
  }

  /** Batched BMP decode: parse the little-endian headers, then walk
    * the raster honoring the row STRIDE (padding skipped) and the
    * bottom-up row order — `top_row_sum` checksums the IMAGE's top
    * row, which lives at stored row h−1, so a decoder ignoring the
    * flip fails the gate. Per-channel means over the real BGR bytes. */
  def extractBmpFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[BmpFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
      parseBmpHeader(r.media) match {
        case Some(h) if r.media.length - h.dataOffset >=
            (((3L * h.width + 3) / 4) * 4) * h.height =>
          val stride = ((3 * h.width + 3) / 4) * 4
          var sb = 0L; var sg = 0L; var sr = 0L; var top = 0L
          var y = 0
          while (y < h.height) { // y = IMAGE row (top-down)
            val storedRow = if (h.topDown) y else h.height - 1 - y
            var off = h.dataOffset + storedRow * stride
            var x = 0
            while (x < h.width) {
              val bb = r.media(off) & 0xff
              val gg = r.media(off + 1) & 0xff
              val rr = r.media(off + 2) & 0xff
              sb += bb; sg += gg; sr += rr
              if (y == 0) top += bb + gg + rr
              off += 3; x += 1
            }
            y += 1
          }
          val n = h.width.toLong * h.height
          BmpFeature(r.doc_id, "bmp", h.width, h.height, n,
            Some(sb.toDouble / n), Some(sg.toDouble / n), Some(sr.toDouble / n),
            Some(top))
        case _ => BmpFeature(r.doc_id, "unknown", 0, 0, 0L, None, None, None, None)
      }
    }))
  }

  /** m13: per-channel means + top-image-row checksum decoded from
    * real little-endian, bottom-up, stride-padded BMP bytes. */
  def m13BmpPixels(spark: SparkSession, dir: String): DataFrame =
    extractBmpFeatures(bmpTable(spark, dir)).toDF()
      .select(col("doc_id"), col("format"), col("width"), col("height"), col("n_pixels"),
        Norm.r4(col("mean_b")).as("mean_b"),
        Norm.r4(col("mean_g")).as("mean_g"),
        Norm.r4(col("mean_r")).as("mean_r"),
        col("top_row_sum"))
      .orderBy("doc_id")

  // -------------------------------------------------------------- m18 jpeg

  final case class JpegHeader(precision: Int, width: Int, height: Int,
      components: Int, sosEnd: Int)
  final case class JpegFeature(
      doc_id: Long, format: String, width: Int, height: Int,
      components: Int, precision: Int, entropy_sum: Option[Long])

  private[graft] def jpegWidth(id: Long): Int = 8 + (id % 17).toInt
  private[graft] def jpegHeight(id: Long): Int = 8 + (id % 11).toInt

  /**
   * Minimal structurally-valid JFIF stream — the THIRD real container
   * surface after PPM and BMP, and the first SEGMENTED one (big-endian
   * length-prefixed marker segments, the walk every real JPEG tool
   * does before any entropy decoding): SOI, APP0/JFIF, a DQT stub,
   * baseline SOF0 (8-bit, 3 components), SOS, the entropy payload,
   * EOI. Only headers are semantic for the m18 parse; the payload is
   * opaque bytes (ASCII-tiled here, so no 0xFF ever appears and no
   * byte-stuffing is needed — real streams escape FF as FF 00).
   */
  def buildJpeg(width: Int, height: Int, entropy: Array[Byte]): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff)
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(marker)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, (0 +: (1 to 64)).map(_.toByte).toArray) // DQT: id 0, table 1..64
    seg(0xc0, Array[Byte](8,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0))
    seg(0xda, Array[Byte](3, 1, 0, 2, 0x11, 3, 0x11, 0, 0x3f, 0))
    out.write(entropy, 0, entropy.length)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** JPEG segment walk: SOI, then length-prefixed segments to SOS;
    * dimensions from the first SOF0-SOF3 frame header. Returns None
    * on any structural violation (missing SOI, marker without 0xFF,
    * truncated length, SOS before SOF, zero dims). */
  def parseJpegHeader(b: Array[Byte]): Option[JpegHeader] = {
    def be16(off: Int): Int = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    var sof: Option[(Int, Int, Int, Int)] = None
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      val len = be16(i + 2)
      if (len < 2 || i + 2 + len > b.length) return None
      if (marker >= 0xc0 && marker <= 0xc3) {
        if (len < 8) return None
        sof = Some((b(i + 4) & 0xff, be16(i + 7), be16(i + 5), b(i + 9) & 0xff))
      }
      if (marker == 0xda) {
        return sof.collect { case (p, w, h, nc) if w > 0 && h > 0 =>
          JpegHeader(p, w, h, nc, i + 2 + len)
        }
      }
      i += 2 + len
    }
    None
  }

  /** JPEG table synthesized from documents: doc_id-derived geometry,
    * w·h entropy bytes tiled from the doc's ASCII bytes — closed form
    * on BOTH sides, so the oracle checks the full build→segment-walk
    * round-trip including the entropy checksum. */
  def jpegTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        require(text.nonEmpty && text.forall(_ < 128),
          s"jpegTable: empty or non-ASCII text in doc_id=$id (m18 oracle tiles byte ords)")
        val data = text.getBytes("US-ASCII")
        val entropy = Array.tabulate(jpegWidth(id) * jpegHeight(id))(j => data(j % data.length))
        val bytes = buildJpeg(jpegWidth(id), jpegHeight(id), entropy)
        MediaRow(id, bytes, "image/jpeg", bytes.length)
      }
  }

  /** Batched JPEG header extraction (the m01 hook shape): segment
    * walk to SOF/SOS, unsigned-byte checksum over the entropy payload
    * (bounded by the trailing EOI). Structural violations degrade to
    * format="unknown" with null checksum. */
  def extractJpegHeaders(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[JpegFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
      val b = r.media
      parseJpegHeader(b) match {
        case Some(h) if b.length >= h.sosEnd + 2 &&
            (b(b.length - 2) & 0xff) == 0xff && (b(b.length - 1) & 0xff) == 0xd9 =>
          var s = 0L
          var i = h.sosEnd
          while (i < b.length - 2) { s += (b(i) & 0xff); i += 1 }
          JpegFeature(r.doc_id, "jpeg", h.width, h.height, h.components,
            h.precision, Some(s))
        case _ =>
          JpegFeature(r.doc_id, "unknown", 0, 0, 0, 0, None)
      }
    }))
  }

  /** m18: JPEG/JFIF header surface over the synthesized table. */
  def m18JpegHeader(spark: SparkSession, dir: String): DataFrame =
    extractJpegHeaders(jpegTable(spark, dir)).toDF()
      .orderBy("doc_id")

  // -------------------------------------------------------------- m19 png

  final case class PngFeature(
      doc_id: Long, format: String, width: Int, height: Int,
      bit_depth: Int, color_type: Int, n_chunks: Int, idat_sum: Option[Long])

  private[graft] def pngWidth(id: Long): Int = 4 + (id % 19).toInt
  private[graft] def pngHeight(id: Long): Int = 4 + (id % 13).toInt
  private[graft] val PngIdatMax = 64

  /**
   * Structurally-complete PNG container (ISO/IEC 15948 chunk layout) —
   * the chunk-WALK companion to [[buildPng]]'s header-only stream and
   * m18's segmented JPEG: 8-byte signature, IHDR (bit depth 8,
   * truecolor), one ancillary tEXt chunk (so a walker must SKIP
   * unknown-to-it chunk types by length, the real-world case), the
   * payload split across ceil(n/64)-many IDAT chunks (multi-IDAT is
   * legal and common — encoders flush in buffer-sized chunks), and
   * IEND. Every chunk carries its genuine CRC32 over type+data, per
   * the spec. Payload bytes are opaque (ASCII-tiled, standing in for
   * the zlib stream exactly as m18's entropy payload does).
   */
  def buildPngChunked(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb)
      crc.update(data)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    chunk("IHDR", be32(width) ++ be32(height) ++ Array[Byte](8, 2, 0, 0, 0))
    chunk("tEXt", "Software\u0000graft".getBytes("US-ASCII"))
    payload.grouped(PngIdatMax).foreach(chunk("IDAT", _))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /**
   * Full PNG chunk walk — beyond [[parseImageHeader]]'s first-chunk
   * IHDR read, this validates the WHOLE container the way `pngcheck`
   * does: every chunk's length is bounds-checked, every CRC32 is
   * recomputed and verified, IHDR must be first and 13 bytes, IEND
   * must be last and empty, and no bytes may trail IEND. Accumulates
   * the chunk count and the byte checksum of the concatenated IDAT
   * payload. Returns None on any structural violation — callers
   * degrade to format="unknown" (the m18 rule).
   */
  def pngChunkWalk(b: Array[Byte]): Option[PngFeature] = {
    def u8(i: Int): Int = b(i) & 0xff
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length < 8 + 25 + 12) return None // sig + IHDR + IEND minimum
    var i = 0
    while (i < 8) { if (u8(i) != sig(i)) return None; i += 1 }
    var p = 8
    var w = 0; var h = 0; var bd = 0; var ct = 0
    var n = 0
    var sum = 0L
    var sawEnd = false
    while (p + 12 <= b.length && !sawEnd) {
      val len = u32(p)
      if (len > Int.MaxValue - 12 || p + 12 + len > b.length) return None
      val l = len.toInt
      val typ = new String(b, p + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(b, p + 4, 4 + l)
      if (crc.getValue != u32(p + 8 + l)) return None
      if (n == 0 && typ != "IHDR") return None
      typ match {
        case "IHDR" =>
          if (n != 0 || l != 13) return None
          val w32 = u32(p + 8); val h32 = u32(p + 12)
          if (w32 <= 0 || h32 <= 0 || w32 > Int.MaxValue || h32 > Int.MaxValue)
            return None
          w = w32.toInt; h = h32.toInt
          bd = u8(p + 16); ct = u8(p + 17)
        case "IDAT" =>
          var j = p + 8
          val e = p + 8 + l
          while (j < e) { sum += u8(j); j += 1 }
        case "IEND" =>
          if (l != 0) return None
          sawEnd = true
        case _ => () // ancillary chunks skip by length
      }
      n += 1
      p += 12 + l
    }
    if (!sawEnd || p != b.length) None
    else Some(PngFeature(0L, "png", w, h, bd, ct, n, Some(sum)))
  }

  /** PNG table synthesized from documents: doc_id-derived geometry,
    * w·h payload bytes tiled from the doc's ASCII bytes — closed form
    * on BOTH sides, so the oracle checks the full build→chunk-walk
    * round trip (chunk count AND payload checksum). */
  def pngTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        require(text.nonEmpty && text.forall(_ < 128),
          s"pngTable: empty or non-ASCII text in doc_id=$id (m19 oracle tiles byte ords)")
        val data = text.getBytes("US-ASCII")
        val payload = Array.tabulate(pngWidth(id) * pngHeight(id))(j => data(j % data.length))
        val bytes = buildPngChunked(pngWidth(id), pngHeight(id), payload)
        MediaRow(id, bytes, "image/png", bytes.length)
      }
  }

  /** Batched PNG chunk walk (the m01 hook shape). */
  def extractPngHeaders(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[PngFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
      pngChunkWalk(r.media) match {
        case Some(f) => f.copy(doc_id = r.doc_id)
        case None => PngFeature(r.doc_id, "unknown", 0, 0, 0, 0, 0, None)
      }
    }))
  }

  /** m19: full-container PNG surface over the synthesized table. */
  def m19PngHeader(spark: SparkSession, dir: String): DataFrame =
    extractPngHeaders(pngTable(spark, dir)).toDF()
      .orderBy("doc_id")

  // -------------------------------------------------------------- m20 gif

  final case class GifFeature(
      doc_id: Long, format: String, width: Int, height: Int,
      n_frames: Int, n_subblocks: Int, data_sum: Option[Long])

  private[graft] def gifWidth(id: Long): Int = 3 + (id % 17).toInt
  private[graft] def gifHeight(id: Long): Int = 3 + (id % 11).toInt
  private[graft] def gifFrames(id: Long): Int = 1 + (id % 3).toInt

  /**
   * Structurally-complete ANIMATED GIF89a container — the third image
   * container family (after PNG's CRC'd chunks and JPEG's
   * length-prefixed segments) and the one built on LENGTH-PREFIXED
   * SUB-BLOCK CHAINS, the layout every GIF reader must walk:
   * signature "GIF89a", the Logical Screen Descriptor with a REAL
   * Global Color Table (flag + size field in the packed byte — a
   * walker that doesn't decode the packed bits lands mid-palette),
   * one Comment Extension (label 0xFE — an extension the walker has
   * no semantics for and must skip purely by its sub-block chain,
   * the real-world unknown-extension case), then per FRAME a Graphic
   * Control Extension (0x21 0xF9), an Image Descriptor (0x2C, u16
   * little-endian geometry) and the payload as 255-byte-max data
   * sub-blocks after the LZW-minimum-code byte, each chain 0x00
   * terminated; trailer 0x3B ends the file. Payload bytes are opaque
   * ASCII (standing in for the LZW stream, exactly m18/m19's rule).
   */
  def buildGif(width: Int, height: Int, frames: Int, payload: Array[Byte]): Array[Byte] = {
    require(width > 0 && width < 65536 && height > 0 && height < 65536 && frames >= 1)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    // LSD: GCT present (bit 7), color resolution 8 (bits 6-4 = 7),
    // GCT size field 1 → 2^(1+1) = 4 entries
    w16(width); w16(height); w8(0x80 | 0x70 | 0x01); w8(0); w8(0)
    for (i <- 0 until 4) { w8(i * 11); w8(i * 23); w8(i * 37) } // GCT
    // comment extension: sub-block chain a walker must skip by length
    w8(0x21); w8(0xfe); w8(5); out.write("graft".getBytes("US-ASCII")); w8(0)
    for (_ <- 1 to frames) {
      w8(0x21); w8(0xf9); w8(4); w8(0); w16(0); w8(0); w8(0) // GCE
      w8(0x2c); w16(0); w16(0); w16(width); w16(height); w8(0) // descriptor, no LCT
      w8(8) // LZW minimum code size
      payload.grouped(255).foreach { s => w8(s.length); out.write(s, 0, s.length) }
      w8(0) // chain terminator
    }
    w8(0x3b)
    out.toByteArray
  }

  /**
   * Full GIF89a walk — validates the WHOLE container the way a
   * decoder's demux layer does: signature, LSD packed-bit decode
   * (GCT skipped by its decoded size), every extension skipped by
   * its sub-block chain, every frame's descriptor geometry checked
   * against the screen, every data sub-block bounds-checked, the
   * chain terminators and the 0x3B trailer mandatory with no bytes
   * trailing it. Accumulates frame count, payload sub-block count
   * and the byte checksum of the concatenated payload. Returns None
   * on any structural violation — callers degrade to
   * format="unknown" (the m18/m19 rule).
   */
  def gifWalk(b: Array[Byte]): Option[GifFeature] = {
    def u8(i: Int): Int = b(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (b.length < 14) return None
    if (new String(b, 0, 6, "US-ASCII") != "GIF89a") return None
    val w = u16(6); val h = u16(8)
    if (w <= 0 || h <= 0) return None
    val packed = u8(10)
    var p = 13
    if ((packed & 0x80) != 0) p += 3 * (1 << ((packed & 0x07) + 1)) // skip GCT
    var frames = 0
    var subBlocks = 0
    var sum = 0L
    var done = false
    // a sub-block chain from `q` to just past its 0 terminator
    def chain(q0: Int, count: Boolean): Int = {
      var q = q0
      while (q < b.length && u8(q) != 0) {
        val l = u8(q)
        if (q + 1 + l > b.length) return -1
        if (count) {
          subBlocks += 1
          var j = q + 1
          while (j <= q + l) { sum += u8(j); j += 1 }
        }
        q += 1 + l
      }
      if (q >= b.length) -1 else q + 1
    }
    while (!done) {
      if (p >= b.length) return None
      u8(p) match {
        case 0x21 => // extension: label + uncounted sub-block chain
          if (p + 2 > b.length) return None
          p = chain(p + 2, count = false)
          if (p < 0) return None
        case 0x2c => // image descriptor + optional LCT + LZW byte + data chain
          if (p + 10 > b.length) return None
          val fw = u16(p + 5); val fh = u16(p + 7)
          if (u16(p + 1) != 0 || u16(p + 3) != 0 || fw != w || fh != h) return None
          val fp = u8(p + 9)
          var q = p + 10
          if ((fp & 0x80) != 0) q += 3 * (1 << ((fp & 0x07) + 1))
          if (q + 1 > b.length) return None
          q += 1 // LZW minimum code size
          p = chain(q, count = true)
          if (p < 0) return None
          frames += 1
        case 0x3b =>
          if (p != b.length - 1) return None // trailing bytes
          done = true
        case _ => return None
      }
    }
    if (frames == 0) None
    else Some(GifFeature(0L, "gif", w, h, frames, subBlocks, Some(sum)))
  }

  /** GIF table synthesized from documents: doc_id-derived geometry
    * and frame count, every frame carrying the doc's FULL ASCII bytes
    * as its payload — so frame count, sub-block count (frames ·
    * ceil(len/255)) and payload checksum (frames · Σ byte) are closed
    * forms of (doc_id, text) on BOTH sides, and the oracle checks the
    * whole build→walk round trip. */
  def gifTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        require(text.nonEmpty && text.forall(_ < 128),
          s"gifTable: empty or non-ASCII text in doc_id=$id (m20 oracle sums byte ords)")
        val bytes = buildGif(gifWidth(id), gifHeight(id), gifFrames(id),
          text.getBytes("US-ASCII"))
        MediaRow(id, bytes, "image/gif", bytes.length)
      }
  }

  /** Batched GIF walk (the m01 hook shape). */
  def extractGifHeaders(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[GifFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
      gifWalk(r.media) match {
        case Some(f) => f.copy(doc_id = r.doc_id)
        case None => GifFeature(r.doc_id, "unknown", 0, 0, 0, 0, None)
      }
    }))
  }

  /** m20: full-container animated-GIF surface over the synthesized
    * table — a pure per-row byte kernel: no shuffle, embarrassingly
    * parallel at any scale (the final orderBy is presentation-only). */
  def m20GifHeader(spark: SparkSession, dir: String): DataFrame =
    extractGifHeaders(gifTable(spark, dir)).toDF()
      .orderBy("doc_id")

  // -------------------------------------------------------------- m21 zip

  /** One indexed ZIP member: stored name, byte offset of the member's
    * DATA (past its local header), declared size, and the MD5 of the
    * stored bytes (CRC32 is verified during the walk, not emitted —
    * the oracle can recompute md5, not crc32). */
  final case class ZipMember(name: String, offset: Long, size: Long, data_md5: String)

  /**
   * Minimal REAL ZIP (PKWARE APPNOTE layout) writer, STORED entries
   * only: per member a 30-byte local file header (PK\x03\x04,
   * little-endian fields, genuine CRC-32 of the data) + name + data;
   * then the central directory (PK\x01\x02 records pointing back at
   * each local header) and the End Of Central Directory record
   * (PK\x05\x06) carrying entry count, CD size and CD offset. This is
   * the OTHER shard container next to m14's tar: tar locates members
   * by walking headers front-to-back, zip by reading the EOCD + CD
   * index from the END — both walks matter at 100 TB shard scale.
   */
  def buildZip(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
    def w32(v: Long): Unit = { w8(v.toInt); w8((v >>> 8).toInt); w8((v >>> 16).toInt); w8((v >>> 24).toInt) }
    val recs = members.map { case (name, data) =>
      val nb = name.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      val lho = out.size().toLong
      w32(0x04034b50L); w16(20); w16(0); w16(0); w16(0); w16(0x21)
      w32(crc.getValue); w32(data.length.toLong); w32(data.length.toLong)
      w16(nb.length); w16(0)
      out.write(nb, 0, nb.length)
      out.write(data, 0, data.length)
      (nb, data.length.toLong, crc.getValue, lho)
    }
    val cdStart = out.size().toLong
    recs.foreach { case (nb, sz, crc, lho) =>
      w32(0x02014b50L); w16(20); w16(20); w16(0); w16(0); w16(0); w16(0x21)
      w32(crc); w32(sz); w32(sz)
      w16(nb.length); w16(0); w16(0); w16(0); w16(0); w32(0); w32(lho)
      out.write(nb, 0, nb.length)
    }
    val cdSize = out.size().toLong - cdStart
    w32(0x06054b50L); w16(0); w16(0); w16(recs.length); w16(recs.length)
    w32(cdSize); w32(cdStart); w16(0)
    out.toByteArray
  }

  /**
   * Real ZIP index walk, the way unzip does it: read the EOCD record
   * from the END of the file (fixed 22 bytes — this builder writes no
   * archive comment), follow its offset to the central directory,
   * walk each CD record, and for EVERY member cross-check its local
   * file header (signature, name, method, sizes must agree with the
   * CD — the classic zip-confusion attack surface), then VERIFY the
   * stored data's CRC-32 against the header field before digesting
   * it. Any disagreement, bounds violation, unsupported compression
   * method or trailing garbage returns None — a corrupt shard
   * degrades, never misindexes (the m14 rule).
   */
  def parseZipIndex(b: Array[Byte]): Option[Seq[ZipMember]] = {
    def u8(i: Int): Int = b(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    if (b.length < 22) return None
    val eo = b.length - 22
    if (u32(eo) != 0x06054b50L) return None
    if (u16(eo + 4) != 0 || u16(eo + 6) != 0) return None // multi-disk unsupported
    val n = u16(eo + 8)
    if (u16(eo + 10) != n || u16(eo + 20) != 0) return None
    val cdSize = u32(eo + 12); val cdOff = u32(eo + 16)
    if (cdOff + cdSize != eo) return None // CD must end AT the EOCD
    val out = scala.collection.mutable.ArrayBuffer.empty[ZipMember]
    var p = cdOff.toInt
    var i = 0
    while (i < n) {
      if (p + 46 > eo || u32(p) != 0x02014b50L) return None
      if (u16(p + 10) != 0) return None // STORED only
      val crc = u32(p + 16)
      val csize = u32(p + 20); val usize = u32(p + 24)
      if (csize != usize) return None
      val nl = u16(p + 28); val el = u16(p + 30); val cl = u16(p + 32)
      if (p + 46 + nl + el + cl > eo) return None
      val name = new String(b, p + 46, nl, "US-ASCII")
      val lho = u32(p + 42)
      // cross-check the local header the CD points at
      if (lho + 30 + nl > cdOff) return None
      val q = lho.toInt
      if (u32(q) != 0x04034b50L || u16(q + 8) != 0) return None
      if (u32(q + 14) != crc || u32(q + 18) != csize || u32(q + 22) != usize) return None
      if (u16(q + 26) != nl) return None
      if (new String(b, q + 30, nl, "US-ASCII") != name) return None
      val dataOff = lho + 30 + nl + u16(q + 28)
      if (dataOff + usize > cdOff) return None
      val data = java.util.Arrays.copyOfRange(b, dataOff.toInt, (dataOff + usize).toInt)
      val c = new java.util.zip.CRC32()
      c.update(data)
      if (c.getValue != crc) return None
      out += ZipMember(name, dataOff, usize,
        java.security.MessageDigest.getInstance("MD5").digest(data)
          .map("%02x".format(_)).mkString)
      p += 46 + nl + el + cl
      i += 1
    }
    if (p != cdOff + cdSize) return None
    Some(out.toSeq)
  }

  /** ZIP shard table: the SAME 3-member WebDataset-style sample as
    * [[tarTable]] (`<id>/text.txt`, `<id>/meta.json`,
    * `<id>/label.cls`) packed as a stored ZIP, so every member's
    * data offset is pure local-header arithmetic (30 + name bytes,
    * entries back to back) on the oracle side while the engine walks
    * the real EOCD → CD → local-header chain. */
  def zipTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        require(text.nonEmpty && text.forall(_ < 128),
          s"zipTable: empty or non-ASCII text in doc_id=$id (m21 oracle mirrors byte lengths)")
        val bytes = buildZip(Seq(
          (s"$id/text.txt", text.getBytes("US-ASCII")),
          (s"$id/meta.json", s"""{"id":$id}""".getBytes("US-ASCII")),
          (s"$id/label.cls", lang.getBytes("US-ASCII"))))
        MediaRow(id, bytes, "application/zip", bytes.length)
      }
  }

  /** m21: the member index + per-member content digest decoded from
    * real ZIP bytes (EOCD-anchored, CRC-verified central-directory
    * walk) — per-row byte kernel, no shuffle at any scale. */
  def m21ZipIndex(spark: SparkSession, dir: String): DataFrame = {
    val media = zipTable(spark, dir)
    val sess = media.sparkSession
    import sess.implicits._
    media.flatMap { r =>
      parseZipIndex(r.media) match {
        case Some(ms) => ms.map(m => (r.doc_id, m.name, m.offset, m.size, m.data_md5))
        case None => Seq((r.doc_id, "__corrupt__", -1L, -1L, ""))
      }
    }.toDF("doc_id", "member", "offset", "size", "data_md5")
      .orderBy("doc_id", "member")
  }

  // -------------------------------------------------------------- m22 srt

  final case class SrtFeature(
      doc_id: Long, n_cues: Int, speech_ms: Long, span_ms: Long, text_md5: String)

  private def srtTs(sb: StringBuilder, ms: Long): Unit = {
    // hand-rolled digits: String.format costs ~µs/call and a cue pays
    // two timestamps — at corpus scale the formatter IS the kernel
    def p2(v: Long): Unit = { sb.append(('0' + v / 10 % 10).toChar).append(('0' + v % 10).toChar) }
    p2(ms / 3600000); sb.append(':'); p2(ms / 60000 % 60); sb.append(':')
    p2(ms / 1000 % 60); sb.append(',')
    sb.append(('0' + ms / 100 % 10).toChar).append(('0' + ms / 10 % 10).toChar)
      .append(('0' + ms % 10).toChar)
  }

  /** SubRip (SRT) transcript for one doc: cue i (1-based index lines)
    * speaks word i over [500(i−1), 500(i−1)+400] ms — blocks separated
    * by blank lines, the de-facto subtitle interchange format. */
  def buildSrt(words: Seq[String]): String = {
    val sb = new StringBuilder
    words.zipWithIndex.foreach { case (w, i) =>
      sb.append(i + 1).append('\n')
      srtTs(sb, i * 500L); sb.append(" --> "); srtTs(sb, i * 500L + 400)
      sb.append('\n').append(w).append("\n\n")
    }
    sb.toString
  }

  /**
   * Real SRT cue walk — the video/audio-text ALIGNMENT format every
   * speech-training pipeline ingests (captions ARE the supervision
   * signal; a mis-parsed timestamp silently misaligns audio and
   * text): blocks of (index line, `HH:MM:SS,mmm --> HH:MM:SS,mmm`
   * timing line, ≥1 text lines) separated by blank lines. The walk
   * enforces what a strict demuxer does — cue indices must count
   * 1,2,3,… (a skip means a dropped cue), every timestamp field must
   * be digits in its exact position with `,` millis and the ` --> `
   * arrow, each cue must have start < end and start ≥ previous end
   * (cues are monotone, non-overlapping), and a cue must carry text.
   * Accumulates cue count, total speech ms, first→last span ms and
   * the MD5 of the space-joined cue text (the transcript the text
   * side of the pair trains on). Returns None on any violation —
   * corrupt captions degrade, never misalign (the m14/m21 rule).
   */
  def parseSrt(s: String): Option[SrtFeature] = {
    val lines = s.split("\n", -1)
    def ts(t: String): Option[Long] = {
      if (t.length != 12 || t(2) != ':' || t(5) != ':' || t(8) != ',') return None
      var v = 0L
      // per-FIELD range checks before accumulating — 60 minutes must
      // reject, not silently fold into an hour
      for ((from, to, mul, max) <- Seq((0, 2, 3600000L, 99L), (3, 5, 60000L, 59L),
          (6, 8, 1000L, 59L), (9, 12, 1L, 999L))) {
        var x = 0L
        var i = from
        while (i < to) {
          val ch = t(i)
          if (ch < '0' || ch > '9') return None
          x = x * 10 + (ch - '0')
          i += 1
        }
        if (x > max) return None
        v += x * mul
      }
      Some(v)
    }
    var i = 0
    var cue = 0
    var prevEnd = -1L
    var firstStart = -1L
    var speech = 0L
    val text = new StringBuilder
    while (i < lines.length) {
      if (lines(i).isEmpty) { i += 1 } // blank separators / trailing
      else {
        // index line: must be exactly the next counter value
        if (lines(i) != (cue + 1).toString) return None
        if (i + 1 >= lines.length) return None
        val tl = lines(i + 1)
        if (tl.length != 29 || tl.substring(12, 17) != " --> ") return None
        val st = ts(tl.substring(0, 12)); val en = ts(tl.substring(17, 29))
        if (st.isEmpty || en.isEmpty) return None
        if (st.get >= en.get || st.get < prevEnd) return None
        var j = i + 2
        var any = false
        while (j < lines.length && lines(j).nonEmpty) {
          if (cue > 0 || any) text.append(' ')
          text.append(lines(j))
          any = true
          j += 1
        }
        if (!any) return None // a cue must carry text
        if (firstStart < 0) firstStart = st.get
        speech += en.get - st.get
        prevEnd = en.get
        cue += 1
        i = j
      }
    }
    if (cue == 0) None
    else Some(SrtFeature(0L,
      cue, speech, prevEnd - firstStart,
      java.security.MessageDigest.getInstance("MD5")
        .digest(text.toString.getBytes("US-ASCII"))
        .map("%02x".format(_)).mkString))
  }

  /** SRT table synthesized from documents: one cue per normalized
    * word (the c06 whitespace-token convention), so cue count, speech
    * ms (400·n), span ((n−1)·500+400) and the joined-transcript md5
    * are closed forms of text on BOTH sides. */
  def srtTable(spark: SparkSession, dir: String): Dataset[(Long, String)] = {
    import spark.implicits._
    // the words ride as ONE normalized string (a primitive-encoder
    // column): a Seq[String] column pays a collection decode per row
    // (measured 2.9 s vs 0.6 at sf0.1) — the split is a cheap kernel
    Tables.documents(spark, dir).select(col("doc_id"),
        Dedup.normText(col("text")).as("norm"))
      .as[(Long, String)]
      .map { case (id, norm) =>
        val words = norm.split(' ').filter(_.nonEmpty).toSeq
        require(words.nonEmpty && words.forall(_.forall(_ < 128)),
          s"srtTable: empty or non-ASCII words in doc_id=$id (m22 oracle md5s ASCII)")
        (id, buildSrt(words))
      }
  }

  /** m22: cue index decoded from real SRT text — per-row string
    * kernel, no shuffle at any scale. Build and walk FUSE into one
    * typed pass (a second `.map` operator costs a full encoder
    * round-trip and its own codegen stage — measured ~2 s of pure
    * overhead at the 5k-doc sweep shape); [[srtTable]] stays the
    * spec's hook for exercising the stages separately. */
  def m22SrtCues(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"),
        Dedup.normText(col("text")).as("norm"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, norm) =>
        val words = norm.split(' ').filter(_.nonEmpty).toSeq
        require(words.nonEmpty && words.forall(_.forall(_ < 128)),
          s"srtTable: empty or non-ASCII words in doc_id=$id (m22 oracle md5s ASCII)")
        parseSrt(buildSrt(words)) match {
          case Some(f) => f.copy(doc_id = id)
          case None => SrtFeature(id, 0, -1L, -1L, "")
        }
      }).toDF().orderBy("doc_id")
  }

  /**
   * 12-bit block-luminance perceptual hash (aHash family) from a REAL
   * P6 raster: pixels map to a 3×4 cell grid (gr = 3y div h, gc = 4x
   * div w — every cell non-empty for the table's w≥4, h≥3), and a
   * cell's bit is set iff its luminance mean exceeds the image mean.
   * Both comparisons are EXACT integer cross-multiplications
   * (cell_sum·n_total > total_sum·n_cell) — no per-cell division, so
   * no float drift and the DuckDB replay is bit-identical. Images
   * whose hashes collide are perceptual near-duplicates even when
   * their byte payloads (and dimensions) differ — the image-space
   * analogue of d01's text classes.
   */
  private[graft] def ppmAHash(b: Array[Byte]): Option[Long] =
    parsePpmHeader(b) match {
      case Some(h) if b.length - h.headerLen >= 3L * h.width * h.height =>
        val cs = Array.fill(12)(0L); val cn = Array.fill(12)(0L)
        var p = 0
        val n = h.width * h.height
        while (p < n) {
          val y = p / h.width; val x = p % h.width
          val cell = (y * 3 / h.height) * 4 + (x * 4 / h.width)
          val off = h.headerLen + 3 * p
          cs(cell) += (b(off) & 0xff) + (b(off + 1) & 0xff) + (b(off + 2) & 0xff)
          cn(cell) += 1L
          p += 1
        }
        val ts = cs.sum; val tn = cn.sum
        var hash = 0L
        var c = 0
        while (c < 12) {
          if (cs(c) * tn > ts * cn(c)) hash |= (1L << c)
          c += 1
        }
        Some(hash)
      case _ => None
    }

  /** m08: perceptual-duplicate image classes — aHash every PPM via
    * the batched decode hook, group equal hashes (a shuffle of one
    * 12-bit key + doc id per image, never pixels), top-20 classes. */
  def m08PhashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ppmTable(spark, dir)
      .mapPartitions(_.grouped(64).flatMap(_.flatMap(r =>
        ppmAHash(r.media).map(h => (r.doc_id, h)))))
      .toDF("doc_id", "phash")
      .groupBy("phash")
      .agg(count(lit(1)).as("n_images"), min("doc_id").as("rep_doc"))
      .orderBy(col("n_images").desc, col("phash"))
      .limit(20)
  }

  /** Media table synthesized from documents: UTF-8 payload bytes +
    * metadata. A real pipeline reads (path, bytes, mime) from a
    * manifest; the schema and downstream plumbing are identical.
    *
    * The m02/m03 DuckDB oracles slice and checksum the VARCHAR by
    * CHARACTERS (DuckDB has no BLOB substring/md5), while Spark
    * slices the binary payload by BYTES — equivalent only while every
    * doc is pure ASCII. That assumption is load-bearing for the hash
    * gate, so it is asserted per row here: a non-ASCII doc fails the
    * job loudly instead of silently hash-diverging. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      when(octet_length(payload) === length(col("text")), payload)
        .otherwise(raise_error(concat(
          lit("mediaTable: non-ASCII text in doc_id="), col("doc_id"),
          lit(" (m02/m03 oracles assume byte==char slicing)")))).as("media"),
      lit("text/plain").as("mime"),
      octet_length(payload).as("n_bytes"))
  }

  /** Deterministic image geometry for the synthetic corpus — dims and
    * channel layout derive from doc_id in closed form so the DuckDB
    * oracle can recompute them WITHOUT parsing bytes, making the m01
    * hash gate a genuine build-then-parse round-trip check. */
  private[graft] def imgWidth(id: Long): Int = 16 + (id % 240).toInt
  private[graft] def imgHeight(id: Long): Int = 16 + ((id * 7) % 240).toInt
  private[graft] def pngColorType(id: Long): Int =
    Array(0, 2, 4, 6)(((id / 2) % 4).toInt) // gray, rgb, gray+alpha, rgba
  private[graft] def jpegComponents(id: Long): Int = if (id % 4 == 1) 3 else 1

  /** Image table synthesized from documents: each doc's text bytes
    * wrapped in a REAL encoded container header — even doc_ids get a
    * PNG (signature + IHDR with genuine CRC32), odd get a JPEG (SOI +
    * JFIF APP0 + SOF0/SOF2). A real pipeline reads (path, bytes,
    * mime) from a manifest; downstream plumbing is identical. Runs as
    * a typed map (header encode is per-row executor work, no
    * shuffle). */
  def imageTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"imageTable: non-ASCII text in doc_id=$id (m01 oracle sums bytes as ords)")
        val data = text.getBytes("US-ASCII")
        val bytes =
          if (id % 2 == 0) buildPng(imgWidth(id), imgHeight(id), pngColorType(id), data)
          else buildJpeg(imgWidth(id), imgHeight(id), jpegComponents(id),
            progressive = ((id - 1) / 2) % 2 == 1, data)
        MediaRow(id, bytes, if (id % 2 == 0) "image/png" else "image/jpeg", bytes.length)
      }
  }

  /** Per-asset audio features parsed from the real WAV header. */
  final case class WavFeature(
      doc_id: Long, channels: Int, sample_rate: Int, bits: Int,
      n_samples: Long, duration_ms: Long, data_sum: Long)

  /** Audio table synthesized from documents: text bytes standing in
    * for PCM samples behind a REAL canonical 44-byte WAV header whose
    * channel/rate layout derives from doc_id in closed form (the m01
    * imageTable pattern for audio). */
  def wavTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"wavTable: non-ASCII text in doc_id=$id (m05 oracle sums bytes as ords)")
        val bytes = buildWav(wavChannels(id), wavSampleRate(id), 16,
          text.getBytes("US-ASCII"))
        MediaRow(id, bytes, "audio/wav", bytes.length)
      }
  }

  private[graft] def wavChannels(id: Long): Int = 1 + (id % 2).toInt
  private[graft] def wavSampleRate(id: Long): Int =
    Array(8000, 16000, 22050, 44100)(((id / 2) % 4).toInt)

  /** Typed per-partition WAV decode: header facts + sample-section
    * checksum; unparseable payloads degrade to zeroed fields with a
    * whole-payload checksum (the m01 contract). */
  def extractWavFeatures(media: Dataset[MediaRow]): Dataset[WavFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val hdr = parseWavHeader(r.media)
      val off = hdr.map(_.headerLen).getOrElse(0)
      var sum = 0L
      var i = off
      while (i < r.media.length) { sum += (r.media(i) & 0xff); i += 1 }
      hdr match {
        case Some(h) =>
          val blockAlign = math.max(h.channels * h.bitsPerSample / 8, 1)
          val ns = h.dataBytes.toLong / blockAlign
          WavFeature(r.doc_id, h.channels, h.sampleRate, h.bitsPerSample,
            ns, ns * 1000L / math.max(h.sampleRate, 1), sum)
        case None => WavFeature(r.doc_id, 0, 0, 0, 0L, 0L, sum)
      }
    })
  }

  /** m05: WAV header decode — channel layout, sample rate, sample and
    * duration math all parsed from the real RIFF bytes; the oracle
    * recomputes the generator's closed form (build→parse round-trip,
    * the m01 gate applied to audio). */
  def m05WavHeader(spark: SparkSession, dir: String): DataFrame =
    extractWavFeatures(wavTable(spark, dir)).toDF().orderBy("doc_id")

  /** Per-asset PCM sample statistics decoded from real i16 frames. */
  final case class PcmFeature(
      doc_id: Long, channels: Int, sample_rate: Int, n_frames: Long,
      peak: Int, sum_sq: Long, zero_cross: Long, rms: Double)

  private[graft] def pcmFrames(id: Long): Int = 200 + (id % 300).toInt
  /** Closed-form i16 sample value for interleaved value index k —
    * integer arithmetic only, so the oracle replays it verbatim. */
  private[graft] def pcmVal(id: Long, k: Long): Int =
    ((id * 9176 + k * 31 + (k * k % 257) * 97) % 65536 - 32768).toInt

  /** Audio table with REAL little-endian 16-bit PCM payloads: sample
    * values derive from (doc_id, index) in closed form, serialized as
    * genuine two's-complement LE frames behind the m05 canonical
    * header — so the oracle checks byte-level encode→decode, not just
    * header fields (the m07 pixel pattern applied to audio). */
  def pcmWavTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val nVals = pcmFrames(id) * wavChannels(id)
        val data = new Array[Byte](2 * nVals)
        var k = 0
        while (k < nVals) {
          val v = pcmVal(id, k)
          data(2 * k) = (v & 0xff).toByte
          data(2 * k + 1) = ((v >> 8) & 0xff).toByte
          k += 1
        }
        val bytes = buildWav(wavChannels(id), wavSampleRate(id), 16, data)
        MediaRow(id, bytes, "audio/wav", bytes.length)
      }
  }

  /**
   * Batched per-partition PCM decode — the audio analogue of m07's
   * pixel path: parse the RIFF header, then walk the data section as
   * interleaved little-endian signed 16-bit frames computing peak
   * amplitude, exact integer energy (sum of squares), per-channel
   * zero crossings (sign changes between CONSECUTIVE frames of the
   * same channel — comparisons stride by blockAlign), and RMS. Only
   * per-asset stat rows leave the executor; payload bytes never
   * shuffle. Non-16-bit or unparseable payloads degrade to zeroed
   * stats (the m01 contract).
   */
  def extractPcmFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[PcmFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
      parseWavHeader(r.media) match {
        case Some(h) if h.bitsPerSample == 16 && h.channels >= 1 =>
          val avail = math.min(h.dataBytes.toLong, (r.media.length - h.headerLen).toLong)
          val nFrames = avail / (2L * h.channels)
          val nVals = nFrames * h.channels
          var peak = 0
          var sumSq = 0L
          var zc = 0L
          var prevNeg: Array[Boolean] = null
          var k = 0L
          while (k < nVals) {
            val off = h.headerLen + 2 * k.toInt
            val v = ((r.media(off + 1) << 8) | (r.media(off) & 0xff)).toShort.toInt
            val a = math.abs(v)
            if (a > peak) peak = a
            sumSq += v.toLong * v
            val ch = (k % h.channels).toInt
            val neg = v < 0
            if (prevNeg == null) prevNeg = new Array[Boolean](h.channels)
            if (k >= h.channels && prevNeg(ch) != neg) zc += 1
            prevNeg(ch) = neg
            k += 1
          }
          val rms = if (nVals > 0) math.sqrt(sumSq.toDouble / nVals) else 0.0
          PcmFeature(r.doc_id, h.channels, h.sampleRate, nFrames,
            peak, sumSq, zc, rms)
        case _ => PcmFeature(r.doc_id, 0, 0, 0L, 0, 0L, 0L, 0.0)
      }
    }))
  }

  /** Per-asset resample summary; *_q values are on the ×outRate
    * integer grid (see [[resamplePcm]]). */
  final case class PcmResample(
      doc_id: Long, sample_rate: Int, n_in: Long, n_out: Long,
      peak_q: Long, sum_q: Long, sum_abs_q: Long)

  /**
   * m15: SAMPLE-RATE NORMALIZATION — the audio pipeline's mandatory
   * preprocessing step (a training corpus mixes 8/16/22.05/44.1 kHz
   * assets; models want ONE rate): linear resample of channel 0 to
   * `outRate` on an EXACT integer grid. Output position j maps to
   * input position j·sr/outRate; with num = j·sr, i = num div
   * outRate, rem = num mod outRate the interpolated sample ×outRate
   * is the exact i64
   *   out_q = v[i]·(outRate − rem) + v[i+1]·rem
   * — no FP anywhere, so the resample is bit-identical in any
   * engine/partitioning (|out_q| ≤ 32768·8000 ≈ 2.6e8; per-asset
   * sums ≪ 2^63). Output frames stop at the last input sample
   * (n_out = (n_in−1)·outRate div sr + 1), so i+1 is always valid
   * when rem > 0. Decode+resample is a pure per-row byte map (the
   * m09 batching); only the summary row leaves the executor.
   */
  def resamplePcm(media: Dataset[MediaRow], outRate: Int = 8000,
      batchSize: Int = 64): Dataset[PcmResample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
      parseWavHeader(r.media) match {
        case Some(h) if h.bitsPerSample == 16 && h.channels >= 1 &&
            h.sampleRate >= 1 =>
          val avail = math.min(h.dataBytes.toLong,
            (r.media.length - h.headerLen).toLong)
          val nFrames = (avail / (2L * h.channels)).toInt
          if (nFrames >= 1) {
            val v = new Array[Int](nFrames)
            var f = 0
            while (f < nFrames) {
              val off = h.headerLen + 2 * (f * h.channels)
              v(f) = ((r.media(off + 1) << 8) | (r.media(off) & 0xff))
                .toShort.toInt
              f += 1
            }
            val nOut = ((nFrames - 1).toLong * outRate / h.sampleRate + 1).toInt
            var j = 0; var sum = 0L; var sumAbs = 0L; var peak = 0L
            while (j < nOut) {
              val num = j.toLong * h.sampleRate
              val i = (num / outRate).toInt
              val rem = num % outRate
              val q = v(i).toLong * (outRate - rem) +
                (if (rem > 0) v(i + 1).toLong * rem else 0L)
              sum += q
              val a = math.abs(q); sumAbs += a; if (a > peak) peak = a
              j += 1
            }
            PcmResample(r.doc_id, h.sampleRate, nFrames, nOut, peak, sum, sumAbs)
          } else PcmResample(r.doc_id, h.sampleRate, 0L, 0L, 0L, 0L, 0L)
        case _ => PcmResample(r.doc_id, 0, 0L, 0L, 0L, 0L, 0L)
      }
    }))
  }

  /** m15: 8 kHz normalization pass over the real PCM corpus. */
  def m15PcmResample(spark: SparkSession, dir: String): DataFrame =
    resamplePcm(pcmWavTable(spark, dir)).toDF()
      .select(col("doc_id"), col("sample_rate"), col("n_in"), col("n_out"),
        col("peak_q"), col("sum_q"), col("sum_abs_q"))
      .orderBy("doc_id")

  /** One amplitude run for [[segmentPcm]]. */
  final case class PcmSegment(
      doc_id: Long, seg_idx: Int, voiced: Int, start_frame: Long,
      n_frames: Long, peak: Int)

  /**
   * m17: AMPLITUDE SEGMENTATION — the VAD-style run-length split an
   * audio pipeline uses to cut assets at silence boundaries (and to
   * drop dead air before transcription): channel-0 frames classify
   * as voiced (|v| ≥ thr) or silence, and each MAXIMAL run becomes a
   * segment row (index, kind, start frame, length, in-run peak) —
   * all exact integers, so the segmentation is engine/partitioning
   * exact. Decode + walk is the m09 per-partition batching; only the
   * run rows leave the task. The oracle replays the generator closed
   * form and finds the same runs with the gaps-and-islands
   * row_number trick.
   */
  def segmentPcm(media: Dataset[MediaRow], thr: Int = 8192,
      batchSize: Int = 64): Dataset[PcmSegment] = {
    require(thr >= 1 && thr <= 32768, s"segmentPcm: thr in [1,32768], got $thr")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
      parseWavHeader(r.media) match {
        case Some(h) if h.bitsPerSample == 16 && h.channels >= 1 =>
          val avail = math.min(h.dataBytes.toLong,
            (r.media.length - h.headerLen).toLong)
          val nFrames = (avail / (2L * h.channels)).toInt
          val out = scala.collection.mutable.ArrayBuffer.empty[PcmSegment]
          var start = 0; var peak = 0; var kind = -1; var f = 0
          while (f < nFrames) {
            val off = h.headerLen + 2 * (f * h.channels)
            val v = ((r.media(off + 1) << 8) | (r.media(off) & 0xff))
              .toShort.toInt
            val a = math.abs(v)
            val k = if (a >= thr) 1 else 0
            if (k != kind) {
              if (kind >= 0) out += PcmSegment(r.doc_id, out.length, kind,
                start.toLong, (f - start).toLong, peak)
              kind = k; start = f; peak = a
            } else if (a > peak) peak = a
            f += 1
          }
          if (kind >= 0) out += PcmSegment(r.doc_id, out.length, kind,
            start.toLong, (nFrames - start).toLong, peak)
          out
        case _ => Seq.empty[PcmSegment]
      }
    }))
  }

  /** m17: quarter-full-scale segmentation over the real PCM corpus. */
  def m17PcmSegments(spark: SparkSession, dir: String): DataFrame =
    segmentPcm(pcmWavTable(spark, dir)).toDF()
      .select(col("doc_id"), col("seg_idx"), col("voiced"),
        col("start_frame"), col("n_frames"), col("peak"))
      .orderBy("doc_id", "seg_idx")

  /** m09: sample-level audio decode under the gate — peak / energy /
    * zero-crossing / RMS over real two's-complement PCM frames; the
    * oracle replays the closed-form generator, so any byte-order or
    * sign-extension mistake in EITHER direction breaks the hash. */
  def m09PcmStats(spark: SparkSession, dir: String): DataFrame =
    extractPcmFeatures(pcmWavTable(spark, dir)).toDF()
      .select(col("doc_id"), col("channels"), col("sample_rate"),
        col("n_frames"), col("peak"), col("sum_sq"), col("zero_cross"),
        Norm.r4(col("rms")).as("rms"))
      .orderBy("doc_id")

  /** Per-asset video features parsed from the real MP4 boxes. */
  final case class Mp4Feature(
      doc_id: Long, timescale: Int, duration: Long, duration_ms: Long,
      data_bytes: Int, data_sum: Long)

  private[graft] def mp4Timescale(id: Long): Int =
    Array(600, 1000, 90000, 48000)(((id / 2) % 4).toInt)
  private[graft] def mp4Duration(id: Long): Long = 100 + (id * 13) % 9000

  /** Video table synthesized from documents: text bytes standing in
    * for the encoded stream behind REAL ftyp/moov(mvhd)/mdat boxes;
    * odd doc_ids get the 64-bit mvhd v1 layout so both parser arms
    * run on the corpus. */
  def mp4Table(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        require(text.forall(_ < 128),
          s"mp4Table: non-ASCII text in doc_id=$id (m06 oracle sums bytes as ords)")
        val bytes = buildMp4(mp4Timescale(id), mp4Duration(id), v1 = id % 2 == 1,
          text.getBytes("US-ASCII"))
        MediaRow(id, bytes, "video/mp4", bytes.length)
      }
  }

  /** m06: MP4 movie-header decode — timescale/duration (and the ms
    * conversion a shard planner budgets with) parsed from the real
    * box structure; the m01 gate applied to video. */
  def m06Mp4Header(spark: SparkSession, dir: String): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    mp4Table(spark, dir).mapPartitions(_.map { r =>
      val hdr = parseMp4Header(r.media)
      val off = hdr.map(_.headerLen).getOrElse(0)
      var sum = 0L
      var i = off
      while (i < r.media.length) { sum += (r.media(i) & 0xff); i += 1 }
      hdr match {
        case Some(h) =>
          Mp4Feature(r.doc_id, h.timescale, h.duration,
            h.duration * 1000L / math.max(h.timescale, 1), h.dataBytes, sum)
        case None => Mp4Feature(r.doc_id, 0, 0L, 0L, 0, sum)
      }
    }).toDF().orderBy("doc_id")
  }

  /**
   * Decode one batch (one codec init per batch): parse the REAL
   * container header for format/dimensions/channels, checksum the
   * data section after it, and stub-resize it (every 4th byte) for
   * the thumbnail digest. Unparseable payloads surface
   * format="unknown" with zero dims and whole-payload stats.
   */
  private def decodeBatch(batch: Seq[MediaRow], batchId: Int): Seq[MediaFeature] =
    batch.map { r =>
      val hdr = parseImageHeader(r.media)
      val off = hdr.map(_.headerLen).getOrElse(0)
      var sum = 0L
      var i = off
      while (i < r.media.length) { sum += (r.media(i) & 0xff); i += 1 }
      val thumb = Array.tabulate((r.media.length - off + 3) / 4)(j => r.media(off + j * 4))
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(thumb)
        .map("%02x".format(_)).mkString
      MediaFeature(r.doc_id, r.media.length,
        hdr.map(_.format).getOrElse("unknown"),
        hdr.map(_.width).getOrElse(0), hdr.map(_.height).getOrElse(0),
        hdr.map(_.channels).getOrElse(0), sum, md5, batchId)
    }

  /** Batched per-partition feature extraction: groups the partition
    * iterator into fixed-size batches (bounded memory), decodes each
    * batch, streams features out. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).zipWithIndex.flatMap { case (batch, bi) =>
          decodeBatch(batch, bi)
        }
      }
  }

  /** m01: header-decoded image features — format/width/height/
    * channels parsed from the real PNG/JPEG bytes, n_bytes of the
    * full payload, data-section checksum. The oracle recomputes the
    * generator's closed form, so a bug in EITHER the header encode or
    * the parse breaks the hash. */
  def m01Multimodal(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(imageTable(spark, dir).toDF()).toDF()
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("channels"), col("n_bytes"), col("data_sum"))
      .orderBy("doc_id")

  /**
   * Per-modality catalog profile — the first query any multimodal
   * pipeline runs (size budgeting, shard planning, codec mix): one
   * map-side-combined aggregate over the catalog, |modalities| rows
   * out, no second pass. Modalities here are synthesized
   * deterministically from the id (the test corpus is text-only);
   * with a real mime column the plan is unchanged.
   */
  def mediaStats(media: DataFrame): DataFrame =
    media
      .groupBy("mime")
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        round(avg(col("n_bytes")), 4).as("avg_bytes"),
        max(col("n_bytes")).as("max_bytes"))

  /** m04: modality-profiled catalog (synthetic 4-way mime mix). */
  def m04MediaStats(spark: SparkSession, dir: String): DataFrame =
    mediaStats(mediaTable(spark, dir).withColumn("mime",
      element_at(array(lit("audio/wav"), lit("image/jpeg"), lit("text/plain"), lit("video/mp4")),
        (pmod(col("doc_id"), lit(4)) + 1).cast("int"))))
      .orderBy("mime")

  /**
   * Fixed-size chunking of a binary payload column — the media
   * counterpart of c02's shard packing: split each payload into
   * `chunkBytes`-sized pieces (training-window/codec-frame prep) as a
   * pure generate+projection plan. `substring` slices BinaryType by
   * BYTES; no decode, no shuffle — chunking 100 TB of media is one
   * scan.
   */
  def chunkMedia(media: DataFrame, chunkBytes: Int): DataFrame =
    media
      .withColumn("chunk_idx", explode(sequence(
        lit(0), greatest(ceil(col("n_bytes") / chunkBytes.toDouble).cast("int") - 1, lit(0)))))
      .select(col("doc_id"), col("chunk_idx"),
        expr(s"substring(media, chunk_idx * $chunkBytes + 1, $chunkBytes)").as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        octet_length(col("chunk")).as("chunk_bytes"),
        md5(col("chunk")).as("chunk_md5"))

  /**
   * Deterministic frame sampling — the video/audio keyframe-selection
   * shape: treat each `frameBytes` slice as a frame, keep every
   * `stride`-th frame PLUS the final one (so short payloads and
   * trailing content are always represented). The filter runs on the
   * generated index BEFORE the byte slice and checksum project, so
   * skipped frames cost nothing; like m02 this is scan → generate →
   * filter → project, no shuffle — sampling 100 TB of media is one
   * pass. A real decoder would replace the byte slicing behind the
   * same (doc, frame_idx) contract (the m01 stub boundary).
   */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0,
      s"sampleFrames: frameBytes and stride must be positive, got $frameBytes/$stride")
    media
      .withColumn("__nf", greatest(
        ceil(col("n_bytes") / frameBytes.toDouble).cast("int"), lit(1)))
      .withColumn("frame_idx", explode(sequence(lit(0), col("__nf") - 1)))
      .filter(col("frame_idx") % stride === 0 || col("frame_idx") === col("__nf") - 1)
      .select(col("doc_id"), col("frame_idx"),
        octet_length(expr(s"substring(media, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_bytes"),
        md5(expr(s"substring(media, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("frame_md5"))
  }

  /** m03: every 4th 256-byte frame of each payload, plus the last. */
  def m03FrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(spark, dir), frameBytes = 256, stride = 4)
      .orderBy("doc_id", "frame_idx")

  /** m02: 256-byte chunks of every media payload with per-chunk
    * checksums. */
  def m02Chunk(spark: SparkSession, dir: String): DataFrame =
    chunkMedia(mediaTable(spark, dir), 256)
      .orderBy("doc_id", "chunk_idx")

  /** Text is ASCII, so byte_sum ≡ codepoint sum in DuckDB (and string
    * substrings ≡ byte slices for m02). */
  val oracleSql: Map[String, String] = Map(
    // Recomputes the PPM generator's closed form over every tiled
    // pixel byte — Spark must build the raster AND decode it back
    // pixel-for-pixel for the channel means to match.
    // same px tiling as m07; cells by integer grid mapping, bits by
    // integer cross-multiplication, classes by hash
    "m08_phash_dedup" ->
      """WITH g AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS len,
        |    CAST(4 + doc_id % 13 AS INT) AS w,
        |    CAST(3 + doc_id % 7 AS INT) AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, w, h, CAST(i AS BIGINT) AS i,
        |    ord(substring(text, CAST((i % len) + 1 AS INT), 1)) AS b
        |  FROM g, unnest(range(0, 3 * w * h)) AS t(i)
        |), cells AS (
        |  SELECT doc_id,
        |    ((((i // 3) // w) * 3) // h) * 4 + (((i // 3) % w) * 4) // w AS cell,
        |    CAST(sum(b) AS BIGINT) AS cs, CAST(count(*) AS BIGINT) AS cn
        |  FROM px GROUP BY 1, 2
        |), tot AS (
        |  SELECT doc_id, sum(cs) AS ts, sum(cn) AS tn FROM cells GROUP BY doc_id
        |), ph AS (
        |  SELECT c.doc_id,
        |    CAST(sum(CASE WHEN c.cs * t.tn > t.ts * c.cn
        |      THEN 1 << CAST(c.cell AS INT) ELSE 0 END) AS BIGINT) AS phash
        |  FROM cells c JOIN tot t ON c.doc_id = t.doc_id
        |  GROUP BY c.doc_id
        |)
        |SELECT phash, CAST(count(*) AS BIGINT) AS n_images,
        |  min(doc_id) AS rep_doc
        |FROM ph GROUP BY phash
        |ORDER BY n_images DESC, phash LIMIT 20""".stripMargin,
    // m10: the NN index map replayed in SQL from the generator's
    // closed form — target sample i maps to source byte
    // j = 3*(((i//3)//4 * h // 3) * w + ((i//3) % 4) * w // 4) + i%3,
    // tiled from the doc's ASCII bytes; checksum = sum of all 36
    // resized bytes, so ANY wrong pixel breaks the hash
    "m10_ppm_resize" ->
      """WITH g AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS len,
        |    CAST(4 + doc_id % 13 AS INT) AS w,
        |    CAST(3 + doc_id % 7 AS INT) AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, w, h, CAST(i % 3 AS INT) AS c,
        |    ord(substring(text, CAST(
        |      (3 * (((((i // 3) // 4) * h) // 3) * w + ((((i // 3) % 4) * w) // 4))
        |        + (i % 3)) % len + 1 AS INT), 1)) AS b
        |  FROM g, unnest(range(0, 36)) AS t(i)
        |)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(4 AS INT) AS tw, CAST(3 AS INT) AS th,
        |  CAST(sum(b) AS BIGINT) AS checksum,
        |  round(avg(CASE WHEN c = 0 THEN b END), 4) + 0 AS mean_r,
        |  round(avg(CASE WHEN c = 1 THEN b END), 4) + 0 AS mean_g,
        |  round(avg(CASE WHEN c = 2 THEN b END), 4) + 0 AS mean_b
        |FROM px GROUP BY 1, 2, 3
        |ORDER BY doc_id""".stripMargin,
    // m11: the m07 generator-replay px CTE, aggregated per channel to
    // EXACT integers (count/sum/sumsq/min/max/4-bin hist); std derives
    // from the exact moments in the final projection with the
    // engine's operand order (double sum·sum — overflow-safe at any
    // raster size — then / n, −, / n, sqrt, round)
    // m16: the m11 px closed form with x/y recovered from the pixel
    // index, patch = integer division — all-i64 group keys and sums
    "m16_ppm_patchify" ->
      """WITH g AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS len,
        |    CAST(4 + doc_id % 13 AS INT) AS w,
        |    CAST(3 + doc_id % 7 AS INT) AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id,
        |    CAST(((i // 3) // w) // 2 AS INT) AS patch_row,
        |    CAST(((i // 3) % w) // 2 AS INT) AS patch_col,
        |    CAST(i % 3 AS INT) AS c,
        |    ord(substring(text, CAST((i % len) + 1 AS INT), 1)) AS b
        |  FROM g, unnest(range(0, 3 * w * h)) AS t(i)
        |)
        |SELECT doc_id, patch_row, patch_col,
        |  CAST(count(*) // 3 AS BIGINT) AS n_px,
        |  CAST(sum(CASE WHEN c = 0 THEN b ELSE 0 END) AS BIGINT) AS sum_r,
        |  CAST(sum(CASE WHEN c = 1 THEN b ELSE 0 END) AS BIGINT) AS sum_g,
        |  CAST(sum(CASE WHEN c = 2 THEN b ELSE 0 END) AS BIGINT) AS sum_b
        |FROM px GROUP BY 1, 2, 3
        |ORDER BY doc_id, patch_row, patch_col""".stripMargin,
    "m11_ppm_channel_stats" ->
      """WITH g AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS len,
        |    CAST(4 + doc_id % 13 AS INT) AS w,
        |    CAST(3 + doc_id % 7 AS INT) AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, w, h, CAST(i % 3 AS INT) AS c,
        |    ord(substring(text, CAST((i % len) + 1 AS INT), 1)) AS b
        |  FROM g, unnest(range(0, 3 * w * h)) AS t(i)
        |), agg AS (
        |  SELECT doc_id,
        |    CASE c WHEN 0 THEN 'r' WHEN 1 THEN 'g' ELSE 'b' END AS channel,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(b) AS BIGINT) AS sum,
        |    CAST(sum(b * b) AS BIGINT) AS sumsq,
        |    CAST(min(b) AS INT) AS bmin, CAST(max(b) AS INT) AS bmax,
        |    CAST(sum(CASE WHEN b // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
        |    CAST(sum(CASE WHEN b // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
        |    CAST(sum(CASE WHEN b // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
        |    CAST(sum(CASE WHEN b // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3
        |  FROM px GROUP BY 1, 2
        |)
        |SELECT doc_id, channel, n, sum, sumsq, bmin, bmax, h0, h1, h2, h3,
        |  round(sqrt((CAST(sumsq AS DOUBLE)
        |    - CAST(sum AS DOUBLE) * CAST(sum AS DOUBLE) / n) / n), 4) + 0 AS std
        |FROM agg ORDER BY doc_id, channel""".stripMargin,
    // m12: per-pixel luminance (byte sum) from the m07 px CTE, 64-bin
    // histogram, Otsu argmax over occupied bins — a/d exact integers,
    // the double score computed from exactly-representable operands
    // (identical ordering both engines), fg_frac on the engine's
    // floor(x*1e4+0.5) grid
    "m12_ppm_otsu" ->
      """WITH g AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS len,
        |    CAST(4 + doc_id % 13 AS INT) AS w,
        |    CAST(3 + doc_id % 7 AS INT) AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, CAST(i // 3 AS INT) AS p,
        |    ord(substring(text, CAST((i % len) + 1 AS INT), 1)) AS b
        |  FROM g, unnest(range(0, 3 * w * h)) AS t(i)
        |), lum AS (
        |  SELECT doc_id, p, CAST(sum(b) AS BIGINT) AS lv
        |  FROM px GROUP BY 1, 2
        |), hb AS (
        |  SELECT doc_id, CAST(lv // 12 AS INT) AS bin,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lum GROUP BY 1, 2
        |), cum AS (
        |  SELECT doc_id, bin, cnt,
        |    sum(cnt) OVER win AS w0,
        |    sum(bin * cnt) OVER win AS s0,
        |    sum(cnt) OVER (PARTITION BY doc_id) AS w,
        |    sum(bin * cnt) OVER (PARTITION BY doc_id) AS s
        |  FROM hb
        |  WINDOW win AS (PARTITION BY doc_id ORDER BY bin ROWS UNBOUNDED PRECEDING)
        |), cand AS (
        |  SELECT doc_id, bin, w0, w,
        |    s0 * w - s * w0 AS a, w0 * (w - w0) AS d
        |  FROM cum WHERE bin < 63 AND w0 > 0 AND w0 < w
        |), scored AS (
        |  SELECT doc_id, bin, w0, w,
        |    CAST(a AS DOUBLE) * CAST(a AS DOUBLE) / CAST(d AS DOUBLE) AS score
        |  FROM cand
        |), best AS (
        |  SELECT doc_id, bin, w0,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, bin) AS rn
        |  FROM scored
        |), ad AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_px FROM lum GROUP BY 1
        |)
        |SELECT ad.doc_id,
        |  CAST(coalesce(b.bin, -1) AS INT) AS thr_bin,
        |  CAST(coalesce(b.w0, 0) AS BIGINT) AS n_bg,
        |  ad.n_px,
        |  CASE WHEN b.bin IS NOT NULL THEN
        |    floor((CAST(ad.n_px - b.w0 AS DOUBLE) / CAST(ad.n_px AS DOUBLE))
        |      * 10000 + 0.5) / 10000.0 + 0
        |  ELSE 0.0 END AS fg_frac
        |FROM ad LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        |  ON ad.doc_id = b.doc_id
        |ORDER BY ad.doc_id""".stripMargin,
    // m14: closed-form ustar layout arithmetic — header at 512-block
    // boundaries, data offset = running sum of 512-padded members;
    // the engine walks the real checksum-verified archive bytes
    "m14_tar_index" ->
      """WITH d AS (
        |  SELECT doc_id, text, lang,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS s1,
        |    CAST(octet_length(encode('{"id":' || CAST(doc_id AS VARCHAR) || '}')) AS BIGINT) AS s2,
        |    CAST(octet_length(encode(lang)) AS BIGINT) AS s3
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) || '/text.txt' AS member,
        |    CAST(512 AS BIGINT) AS "offset", s1 AS size, md5(text) AS data_md5
        |  FROM d
        |  UNION ALL
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) || '/meta.json',
        |    512 + ((s1 + 511) // 512) * 512 + 512, s2,
        |    md5('{"id":' || CAST(doc_id AS VARCHAR) || '}')
        |  FROM d
        |  UNION ALL
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) || '/label.cls',
        |    512 + ((s1 + 511) // 512) * 512 + 512
        |      + ((s2 + 511) // 512) * 512 + 512, s3, md5(lang)
        |  FROM d
        |)
        |SELECT doc_id, member, "offset", size, data_md5
        |FROM idx ORDER BY doc_id, member""".stripMargin,
    // m13: closed-form stored-order tiling — byte p of the raster is
    // text[p % len]; the engine walks the REAL padded bottom-up BMP
    // bytes, so stride/flip mistakes fail this compare
    // m18: segment-walk round-trip — geometry AND the entropy-payload
    // checksum are closed forms of (doc_id, text), so a parser that
    // mis-walks any length-prefixed segment lands on wrong bytes
    "m18_jpeg_header" ->
      """WITH g AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS len,
        |    CAST(8 + doc_id % 17 AS INT) AS w,
        |    CAST(8 + doc_id % 11 AS INT) AS h
        |  FROM documents
        |), e AS (
        |  SELECT doc_id, w, h,
        |    ord(substring(text, CAST((i % len) + 1 AS INT), 1)) AS b
        |  FROM g, unnest(range(0, w * h)) AS t(i)
        |)
        |SELECT doc_id, 'jpeg' AS format, w AS width, h AS height,
        |  CAST(3 AS INT) AS components, CAST(8 AS INT) AS precision,
        |  CAST(sum(b) AS BIGINT) AS entropy_sum
        |FROM e GROUP BY doc_id, w, h
        |ORDER BY doc_id""".stripMargin,
    // m19: chunk-walk round-trip — geometry, the chunk COUNT (IHDR +
    // tEXt + ceil(w·h/64) IDATs + IEND) and the IDAT payload checksum
    // are closed forms of (doc_id, text); a walker that mis-reads any
    // length or CRC lands on wrong bytes and fails the compare
    "m19_png_header" ->
      """WITH g AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS len,
        |    CAST(4 + doc_id % 19 AS INT) AS w,
        |    CAST(4 + doc_id % 13 AS INT) AS h
        |  FROM documents
        |), e AS (
        |  SELECT doc_id, w, h,
        |    ord(substring(text, CAST((i % len) + 1 AS INT), 1)) AS b
        |  FROM g, unnest(range(0, w * h)) AS t(i)
        |)
        |SELECT doc_id, 'png' AS format, w AS width, h AS height,
        |  CAST(8 AS INT) AS bit_depth, CAST(2 AS INT) AS color_type,
        |  CAST(3 + (w * h + 63) // 64 AS INT) AS n_chunks,
        |  CAST(sum(b) AS BIGINT) AS idat_sum
        |FROM e GROUP BY doc_id, w, h
        |ORDER BY doc_id""".stripMargin,
    // m20: sub-block-chain round-trip — geometry, frame count,
    // sub-block count (frames · ceil(len/255)) and the payload
    // checksum (frames · Σ byte) are closed forms of (doc_id, text);
    // a walker that mis-chains any length-prefixed block or packed
    // color-table bit lands on wrong bytes and fails the compare
    "m20_gif_header" ->
      """WITH g AS (
        |  SELECT doc_id, octet_length(encode(text)) AS len,
        |    CAST(3 + doc_id % 17 AS INT) AS w,
        |    CAST(3 + doc_id % 11 AS INT) AS h,
        |    CAST(1 + doc_id % 3 AS INT) AS fr,
        |    list_sum(list_transform(string_split(text, ''), x -> ord(x))) AS ts
        |  FROM documents
        |)
        |SELECT doc_id, 'gif' AS format, w AS width, h AS height,
        |  fr AS n_frames,
        |  CAST(fr * ((len + 254) // 255) AS INT) AS n_subblocks,
        |  CAST(fr * ts AS BIGINT) AS data_sum
        |FROM g ORDER BY doc_id""".stripMargin,
    // m21: EOCD→CD→local-header arithmetic in closed form — a stored
    // entry's data sits at (running sum of 30 + name + data for prior
    // members) + 30 + its own name length; the engine walks the real
    // CRC-verified index from the END of the archive
    "m21_zip_index" ->
      """WITH d AS (
        |  SELECT doc_id, text, lang,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS s1,
        |    CAST(octet_length(encode('{"id":' || CAST(doc_id AS VARCHAR) || '}')) AS BIGINT) AS s2,
        |    CAST(octet_length(encode(lang)) AS BIGINT) AS s3,
        |    CAST(length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS dl
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) || '/text.txt' AS member,
        |    30 + dl + 9 AS "offset", s1 AS size, md5(text) AS data_md5
        |  FROM d
        |  UNION ALL
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) || '/meta.json',
        |    (30 + dl + 9 + s1) + 30 + dl + 10, s2,
        |    md5('{"id":' || CAST(doc_id AS VARCHAR) || '}')
        |  FROM d
        |  UNION ALL
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) || '/label.cls',
        |    (30 + dl + 9 + s1) + (30 + dl + 10 + s2) + 30 + dl + 10, s3,
        |    md5(lang)
        |  FROM d
        |)
        |SELECT doc_id, member, "offset", size, data_md5
        |FROM idx ORDER BY doc_id, member""".stripMargin,
    // m22: one cue per normalized word at 500 ms stride / 400 ms
    // duration — cue count, speech ms, span and the joined-transcript
    // md5 are closed forms of text; the engine walks real SRT blocks
    // (index continuity, strict timestamp grammar, monotone cues)
    "m22_srt_cues" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ' '),
        |      x -> length(x) > 0) AS ws
        |  FROM documents
        |)
        |SELECT doc_id, CAST(len(ws) AS INT) AS n_cues,
        |  CAST(400 * len(ws) AS BIGINT) AS speech_ms,
        |  CAST(500 * (len(ws) - 1) + 400 AS BIGINT) AS span_ms,
        |  md5(array_to_string(ws, ' ')) AS text_md5
        |FROM w ORDER BY doc_id""".stripMargin,
    "m13_bmp_pixels" ->
      """WITH g AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS len,
        |    CAST(3 + doc_id % 13 AS INT) AS w,
        |    CAST(3 + doc_id % 7 AS INT) AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, w, h, CAST(i % 3 AS INT) AS c, i,
        |    ord(substring(text, CAST((i % len) + 1 AS INT), 1)) AS b
        |  FROM g, unnest(range(0, 3 * w * h)) AS t(i)
        |)
        |SELECT doc_id, 'bmp' AS format, w AS width, h AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  round(avg(CASE WHEN c = 0 THEN b END), 4) + 0 AS mean_b,
        |  round(avg(CASE WHEN c = 1 THEN b END), 4) + 0 AS mean_g,
        |  round(avg(CASE WHEN c = 2 THEN b END), 4) + 0 AS mean_r,
        |  CAST(sum(CASE WHEN i >= (h - 1) * 3 * w THEN b ELSE 0 END) AS BIGINT)
        |    AS top_row_sum
        |FROM px GROUP BY doc_id, w, h
        |ORDER BY doc_id""".stripMargin,
    "m07_ppm_pixels" ->
      """WITH g AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS len,
        |    CAST(4 + doc_id % 13 AS INT) AS w,
        |    CAST(3 + doc_id % 7 AS INT) AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, w, h, CAST(i % 3 AS INT) AS c,
        |    ord(substring(text, CAST((i % len) + 1 AS INT), 1)) AS b
        |  FROM g, unnest(range(0, 3 * w * h)) AS t(i)
        |)
        |SELECT doc_id, 'ppm' AS format, w AS width, h AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  round(avg(CASE WHEN c = 0 THEN b END), 4) + 0 AS mean_r,
        |  round(avg(CASE WHEN c = 1 THEN b END), 4) + 0 AS mean_g,
        |  round(avg(CASE WHEN c = 2 THEN b END), 4) + 0 AS mean_b
        |FROM px GROUP BY 1, 3, 4
        |ORDER BY doc_id""".stripMargin,
    "m04_media_stats" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |    CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN 'audio/wav' WHEN 1 THEN 'image/jpeg'
        |      WHEN 2 THEN 'text/plain' ELSE 'video/mp4' END AS mime
        |  FROM documents
        |)
        |SELECT mime, count(*) AS n_assets,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  round(avg(n_bytes), 4) + 0 AS avg_bytes,
        |  CAST(max(n_bytes) AS INT) AS max_bytes
        |FROM m GROUP BY mime ORDER BY mime""".stripMargin,
    // Recomputes the MP4 generator's closed form — Spark must build
    // AND parse the box structure correctly for this to match.
    "m06_mp4_header" ->
      """WITH g AS (
        |  SELECT doc_id, text,
        |    CASE CAST((doc_id // 2) % 4 AS INT)
        |      WHEN 0 THEN 600 WHEN 1 THEN 1000 WHEN 2 THEN 90000
        |      ELSE 48000 END AS ts,
        |    100 + (doc_id * 13) % 9000 AS dur
        |  FROM documents
        |)
        |SELECT doc_id, CAST(ts AS INT) AS timescale,
        |  CAST(dur AS BIGINT) AS duration,
        |  CAST(dur * 1000 // ts AS BIGINT) AS duration_ms,
        |  CAST(octet_length(encode(text)) AS INT) AS data_bytes,
        |  CAST(list_sum(list_transform(string_split(text, ''), x -> ord(x))) AS BIGINT) AS data_sum
        |FROM g ORDER BY doc_id""".stripMargin,
    // Recomputes the WAV generator's closed form — Spark must build
    // AND parse the RIFF bytes correctly for this to match.
    // m09: replays the closed-form PCM generator — Spark must encode
    // AND decode genuine two's-complement LE frames for this to match
    // m17: generator closed form for channel-0 frames, runs via the
    // gaps-and-islands trick (f − row_number per kind), all-i64 keys
    "m17_pcm_segments" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(200 + doc_id % 300 AS BIGINT) AS n,
        |    CAST(1 + doc_id % 2 AS INT) AS ch
        |  FROM documents
        |), fr AS (
        |  SELECT doc_id, f,
        |    (doc_id * 9176 + (f * ch) * 31 + ((f * ch) * (f * ch) % 257) * 97)
        |      % 65536 - 32768 AS v
        |  FROM g, unnest(range(0, n)) AS t(f)
        |), k AS (
        |  SELECT doc_id, f, abs(v) AS a,
        |    CASE WHEN abs(v) >= 8192 THEN 1 ELSE 0 END AS kind
        |  FROM fr
        |), i AS (
        |  SELECT *, f - row_number() OVER (PARTITION BY doc_id, kind
        |    ORDER BY f) AS isl
        |  FROM k
        |), seg AS (
        |  SELECT doc_id, CAST(kind AS INT) AS voiced,
        |    CAST(min(f) AS BIGINT) AS start_frame,
        |    CAST(count(*) AS BIGINT) AS n_frames,
        |    CAST(max(a) AS INT) AS peak
        |  FROM i GROUP BY doc_id, kind, isl
        |)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_frame)
        |    - 1 AS INT) AS seg_idx,
        |  voiced, start_frame, n_frames, peak
        |FROM seg ORDER BY doc_id, seg_idx""".stripMargin,
    // m15: generator closed form for the channel-0 frames (value
    // index k = f·ch), then the identical integer interpolation grid
    // — i64 comparisons end to end, no FP in engine or oracle
    "m15_pcm_resample" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(200 + doc_id % 300 AS BIGINT) AS n,
        |    CAST(1 + doc_id % 2 AS INT) AS ch,
        |    CAST(CASE ((doc_id // 2) % 4) WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |      WHEN 2 THEN 22050 ELSE 44100 END AS INT) AS rate
        |  FROM documents
        |), vals AS (
        |  SELECT doc_id, f,
        |    (doc_id * 9176 + (f * ch) * 31 + ((f * ch) * (f * ch) % 257) * 97)
        |      % 65536 - 32768 AS v
        |  FROM g, unnest(range(0, n)) AS t(f)
        |), outs AS (
        |  SELECT doc_id, rate, n, j,
        |    (j * rate) // 8000 AS i, (j * rate) % 8000 AS rem
        |  FROM g, unnest(range(0, ((n - 1) * 8000) // rate + 1)) AS t(j)
        |), q AS (
        |  SELECT o.doc_id, o.rate, o.n,
        |    v0.v * (8000 - o.rem)
        |      + CASE WHEN o.rem > 0 THEN v1.v * o.rem ELSE 0 END AS out_q
        |  FROM outs o
        |  JOIN vals v0 ON v0.doc_id = o.doc_id AND v0.f = o.i
        |  LEFT JOIN vals v1 ON v1.doc_id = o.doc_id AND v1.f = o.i + 1
        |)
        |SELECT doc_id, CAST(rate AS INT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_in, CAST(count(*) AS BIGINT) AS n_out,
        |  CAST(max(abs(out_q)) AS BIGINT) AS peak_q,
        |  CAST(sum(out_q) AS BIGINT) AS sum_q,
        |  CAST(sum(abs(out_q)) AS BIGINT) AS sum_abs_q
        |FROM q GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,
    "m09_pcm_stats" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(200 + doc_id % 300 AS BIGINT) AS n,
        |    CAST(1 + doc_id % 2 AS INT) AS ch,
        |    CAST(CASE ((doc_id // 2) % 4) WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |      WHEN 2 THEN 22050 ELSE 44100 END AS INT) AS rate
        |  FROM documents
        |), vals AS (
        |  SELECT doc_id, n, ch, k,
        |    (doc_id * 9176 + k * 31 + (k * k % 257) * 97) % 65536 - 32768 AS v
        |  FROM g, unnest(range(0, n * ch)) AS t(k)
        |), w AS (
        |  SELECT *, lead(v) OVER (PARTITION BY doc_id, k % ch ORDER BY k) AS nv
        |  FROM vals
        |), per AS (
        |  SELECT doc_id,
        |    CAST(max(abs(v)) AS INT) AS peak,
        |    CAST(sum(v * v) AS BIGINT) AS sum_sq,
        |    CAST(count(*) FILTER (WHERE nv IS NOT NULL AND (v < 0) <> (nv < 0)) AS BIGINT) AS zero_cross
        |  FROM w GROUP BY doc_id
        |)
        |SELECT g.doc_id, g.ch AS channels, g.rate AS sample_rate,
        |  g.n AS n_frames, per.peak, per.sum_sq, per.zero_cross,
        |  round(sqrt(per.sum_sq * 1.0 / (g.n * g.ch)), 4) + 0 AS rms
        |FROM g JOIN per USING (doc_id) ORDER BY g.doc_id""".stripMargin,
    "m05_wav_header" ->
      """WITH g AS (
        |  SELECT doc_id, text, CAST(1 + doc_id % 2 AS INT) AS channels,
        |    CASE CAST((doc_id // 2) % 4 AS INT)
        |      WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
        |      ELSE 44100 END AS sr,
        |    octet_length(encode(text)) // (2 * (1 + doc_id % 2)) AS ns
        |  FROM documents
        |)
        |SELECT doc_id, channels, CAST(sr AS INT) AS sample_rate,
        |  CAST(16 AS INT) AS bits, CAST(ns AS BIGINT) AS n_samples,
        |  CAST(ns * 1000 // sr AS BIGINT) AS duration_ms,
        |  CAST(list_sum(list_transform(string_split(text, ''), x -> ord(x))) AS BIGINT) AS data_sum
        |FROM g ORDER BY doc_id""".stripMargin,
    // Recomputes the image generator's closed form (dims/channels from
    // doc_id, header length from format+components) — Spark must BUILD
    // the header bytes correctly AND PARSE them back for this to match.
    "m01_multimodal" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |  CAST(16 + doc_id % 240 AS INT) AS width,
        |  CAST(16 + (doc_id * 7) % 240 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN
        |      CASE CAST((doc_id // 2) % 4 AS INT)
        |        WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 2 ELSE 4 END
        |    ELSE CASE WHEN doc_id % 4 = 1 THEN 3 ELSE 1 END END AS INT) AS channels,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 33
        |    WHEN doc_id % 4 = 1 THEN 39 ELSE 33 END
        |    + octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(list_sum(list_transform(string_split(text, ''), x -> ord(x))) AS BIGINT) AS data_sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m02_chunk" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    greatest(CAST(ceil(octet_length(encode(text)) / 256.0) AS INT), 1) AS nch
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, text, unnest(range(0, nch)) AS chunk_idx FROM c
        |)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        |  CAST(octet_length(encode(substring(text, CAST(chunk_idx * 256 + 1 AS INT), 256))) AS INT) AS chunk_bytes,
        |  md5(substring(text, CAST(chunk_idx * 256 + 1 AS INT), 256)) AS chunk_md5
        |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin,
    "m03_frame_sample" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    greatest(CAST(ceil(octet_length(encode(text)) / 256.0) AS INT), 1) AS nf
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, text, nf, unnest(range(0, nf)) AS fi FROM c
        |)
        |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |  CAST(octet_length(encode(substring(text, CAST(fi * 256 + 1 AS INT), 256))) AS INT) AS frame_bytes,
        |  md5(substring(text, CAST(fi * 256 + 1 AS INT), 256)) AS frame_md5
        |FROM idx WHERE fi % 4 = 0 OR fi = nf - 1
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
