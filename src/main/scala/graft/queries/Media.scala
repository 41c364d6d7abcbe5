package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal pipeline queries (north-star): the binary-column plumbing of
  * [[graft.multimodal.Multimodal]] driven end-to-end — media table build,
  * per-partition batched decode, frame sampling — with the stub decoder's
  * deterministic arithmetic mirrored in the DuckDB oracle.
  */
object Media extends QueryPack {

  /** MAINTAINED media-lake table: the payload bytes PLUS the decoded
    * header metadata as sibling columns — the production layout where a
    * metadata query never touches the fat binary column (parquet column
    * pruning drops it at the scan; pinned in PersistedLayoutSpec).
    * SnapshotSink-published once per JVM per sf dir.
    */
  private def mediaLake(s: SparkSession, d: String): DataFrame =
    graft.sources.ArtifactStore.snapshot(s, d, "media_lake") {
      val media = Multimodal.mediaTable(s, Tables.documents(s, d))
      Multimodal.extractFeatures(media).toDF()
        .join(media.toDF().select(col("doc_id"), col("content")), Seq("doc_id"))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MM1: decode features per media row (mapPartitions, typed Dataset out).
    "mm1_media_features" -> { (s, d) =>
      Multimodal.extractFeatures(
        Multimodal.mediaTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM2: metadata-only summary per media type, over the PERSISTED media
    // lake — the scan's ReadSchema excludes the binary `content` column
    // entirely (parquet column pruning, pinned in PersistedLayoutSpec):
    // the query that made "pruning skips the payload at 100 TB" a comment
    // now exercises it.
    "mm2_type_summary" -> { (s, d) =>
      mediaLake(s, d)
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          countDistinct(col("fingerprint")).as("n_unique"))
        .orderBy("media_type")
    },

    // MM4: aspect-preserving resize metadata (integer micro-scale math,
    // never upscales) through the typed Dataset pipeline.
    "mm4_resize_meta" -> { (s, d) =>
      Multimodal.resizeMeta(
        Multimodal.extractFeatures(
          Multimodal.mediaTable(s, Tables.documents(s, d))),
        maxW = 128, maxH = 128)
        .toDF()
        .select("doc_id", "media_type", "width", "height")
        .orderBy("doc_id")
    },

    // MM3: deterministic frame sampling of video rows.
    "mm3_frame_sample" -> { (s, d) =>
      Multimodal.sampleFrames(
        Multimodal.extractFeatures(
          Multimodal.mediaTable(s, Tables.documents(s, d))))
        .toDF()
        .orderBy("doc_id", "frame_idx")
    },

    // MM5: audio deep decode — PCM stream parameters read out of REAL
    // RIFF/WAVE bytes (chunk walk, little-endian fields, byte-rate
    // consistency check; every 4th row carries an extra LIST chunk so a
    // fixed-offset "parser" would go red). The oracle predicts the fixture
    // formulas, so green means the engine recovered rate/channels/width
    // from the container itself. Same per-partition decoder batching as
    // mm1.
    "mm5_audio_meta" -> { (s, d) =>
      Multimodal.audioMeta(
        Multimodal.mediaTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM6: REAL PCM sample decode — the WAV data chunk re-interpreted as
    // 16-bit LE samples, reduced to integer sample-domain stats (energy,
    // peak, zero crossings — the silence/clipping filter a speech
    // pipeline runs). No codec involved: PCM decode is byte arithmetic,
    // so unlike image pixels this branch is NOT stubbed. The oracle
    // replays the identical math from the source bytes in SQL — hex() the
    // payload, strpos-nibble each byte, reassemble signed LE16 — so a
    // green hash proves the engine's decoder recovered every sample.
    "mm6_audio_pcm_stats" -> { (s, d) =>
      Multimodal.audioPcmStats(
        Multimodal.mediaTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM7: REAL PNG pixel decode — every 6th document rendered as a
    // complete spec-valid grayscale PNG (formula pixels, DEFLATE-
    // compressed IDAT, scanline filter cycling through all five PNG
    // filter types by row), decoded back via inflate + full filter
    // reconstruction, reduced to integer pixel stats (the brightness/
    // contrast screen an image-curation pipeline runs). The oracle knows
    // only the pixel FORMULA — a green hash proves the decoder recovered
    // every pixel through the real compressed container. Pixel decode is
    // NOT a stub for PNG: zlib ships with the JVM.
    "mm7_image_pixel_stats" -> { (s, d) =>
      Multimodal.imagePixelStats(
        Multimodal.realPngTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM8: REAL baseline JPEG pixel decode (ITU-T T.81) — every doc_id ≡ 3
    // (mod 6) document rendered as a complete spec-valid grayscale JPEG
    // whose quantized coefficients follow doc_id formulas chosen so the
    // lossy pipeline is EXACTLY invertible (flat DC base ± an AC(4,4)
    // checkerboard; see Multimodal.realJpegTable). The engine must run
    // marker walk, DQT/DHT parse, canonical Huffman decode (differential
    // DC, AC run-lengths incl. double-ZRL, EOB), byte destuffing, restart
    // markers (every 4th image), dequantization, de-zigzag and IDCT to
    // reproduce the oracle's formula stats — pixel decode for JPEG is no
    // longer a stub. Interop with the JDK's independent ImageIO codec is
    // pinned in MultimodalSpec in both encode and decode directions.
    "mm8_jpeg_pixel_stats" -> { (s, d) =>
      Multimodal.jpegPixelStats(
        Multimodal.realJpegTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM9: REAL baseline COLOR JPEG decode, 4:4:4 — every doc_id ≡ 5
    // (mod 6) document rendered as a 3-component YCbCr baseline JPEG
    // (two quant tables, Annex K luma + chroma Huffman pairs, interleaved
    // Y/Cb/Cr MCUs, three DC predictors, restarts on every 4th image).
    // Fixtures live in the quantized-coefficient domain so decoded YCbCr
    // is exact (mm8's v ± m luma construction; DC-only chroma constants
    // per block); the YCbCr→RGB step is the codec's floor(x+0.5) JFIF
    // matrix, which the oracle replays bit-identically in SQL (IEEE-754
    // doubles, identical literals and association — see
    // Multimodal.realColorJpegTable). Gated per-channel sums/squares.
    "mm9_jpeg_color_stats" -> { (s, d) =>
      Multimodal.jpegColorStats(
        Multimodal.realColorJpegTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM10: REAL 4:2:0 chroma-subsampled color JPEG decode — the MCU
    // layout virtually every real photo carries: four Y blocks + one
    // Cb + one Cr per MCU, chroma upsampled 2×2 by replication (exact
    // here because fixture chroma is constant per MCU). The oracle
    // replays the luma-block→MCU chroma mapping and the same RGB
    // formulas as mm9; a wrong interleave order, per-component predictor
    // mix-up, or upsampling offset shifts chroma between MCUs and goes
    // red at the hash gate.
    "mm10_jpeg420_color_stats" -> { (s, d) =>
      Multimodal.jpegColorStats(
        Multimodal.realSubsampledJpegTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM11: REAL PROGRESSIVE (SOF2) grayscale JPEG decode — mm8's
    // exactly-invertible coefficients delivered across three scans (DC,
    // AC band [1,5], AC band [6,63]) with end-of-band-run entropy coding.
    // The engine must merge spectral-selection scans into one coefficient
    // frame before IDCT; the oracle replays mm8's per-block formulas, so
    // a scan mis-merge (wrong band offsets, EOB-run miscounts, per-scan
    // DC predictor leaks) goes red at the hash gate. The successive-
    // approximation half of progressive decode is pinned in MultimodalSpec
    // against the JDK's own progressive writer.
    "mm11_jpeg_progressive_stats" -> { (s, d) =>
      Multimodal.jpegPixelStats(
        Multimodal.realProgressiveJpegTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM12: REAL PROGRESSIVE COLOR JPEG decode — mm9's construction over
    // SEVEN scans (interleaved 3-component DC + two AC bands × three
    // components), then the same floor(x+0.5) RGB transform. Exercises
    // per-component coefficient stores and the interleaved-DC/
    // non-interleaved-AC grid switch.
    "mm12_jpeg_progressive_color_stats" -> { (s, d) =>
      Multimodal.jpegColorStats(
        Multimodal.realProgressiveColorJpegTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM13: REAL VIDEO frame decode — every video-typed document rendered
    // as a complete MJPEG-in-AVI file (RIFF hdrl/strl/movi walk; the one
    // video format decodable pure-JVM because each '00dc' chunk is a
    // standalone JPEG) and decoded back to per-frame pixel stats. Frames
    // vary per index (v and m formulas take f), so a decoder that walked
    // the movi list wrong, dropped/duplicated a frame, or leaked DC
    // predictors across frames goes red. All other codec fourccs REJECT
    // (tested in MultimodalSpec) — the honest residue shrinks to real
    // inter-frame codecs, which need external libraries.
    "mm13_video_frame_stats" -> { (s, d) =>
      Multimodal.videoFrameStats(
        Multimodal.realMjpegAviTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id", "frame_idx")
    },

    // MM14: EXIF/JFIF metadata extraction — the mm8 JPEGs with a JFIF
    // APP0 and an EXIF APP1 (TIFF IFD0: Make/Model/Orientation/DateTime)
    // spliced in, byte order alternating II/MM by id parity. Real
    // curation pipelines filter on camera/orientation/timestamp BEFORE
    // paying for pixel decode; this is that pre-decode surface. The
    // oracle predicts every field from the generation formulas, so an
    // endian mix-up, a mis-walked IFD, or a wrong value-offset read goes
    // red at the hash gate. Malformed-TIFF fuzz (reject, never throw) is
    // pinned in MultimodalSpec.
    "mm14_image_exif_meta" -> { (s, d) =>
      Multimodal.imageMeta(
        Multimodal.realExifJpegTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM15: REAL animated GIF decode — GIF89a with genuine LSB-first
    // variable-width LZW, interlaced first frames (odd k), sub-rect
    // animation frames COMPOSED over the running canvas, and a non-gray
    // palette so index→RGB resolution is gated on all three channels.
    // GIF is lossless, so the oracle replays the composition formulas
    // exactly; ImageIO interop is pinned both directions in
    // MultimodalSpec. The last common web image format joins the decoded
    // set — the remaining rejects are genuinely library-bound codecs.
    "mm15_gif_frame_stats" -> { (s, d) =>
      Multimodal.gifFrameStats(
        Multimodal.realGifTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id", "frame_idx")
    },

    // MM16: REAL LOSSLESS (SOF3, T.81 Annex H) JPEG decode — the archival/
    // medical/raw-sensor JPEG process: no DCT, no quantization; each
    // sample Huffman-coded as a category + EXTEND difference from one of
    // the seven Annex H predictors, modulo 2^16. Fixtures vary the
    // predictor (all seven), the point transform (0..2), and line-aligned
    // restart markers per image, over odd non-block dims; the oracle
    // replays only the pixel formula and the point-transform floor —
    // every predictor/restart subtlety is engine-side, where any slip
    // breaks exact reconstruction and goes red at the hash gate.
    "mm16_jpeg_lossless_stats" -> { (s, d) =>
      Multimodal.jpegPixelStats(
        Multimodal.realLosslessJpegTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM17: REAL 12-bit extended-sequential (SOF1) JPEG decode — the
    // medical/scientific precision tier. mm8's exactly-invertible
    // construction lifted to the 12-bit domain (2048 level shift, DC
    // categories to 15), with the AC amplitude riding a deliberately
    // 16-bit quantization step (q₄₄ = 264, Pq = 1 table): a decoder that
    // truncated the 16-bit table read, kept the 8-bit category caps, or
    // clamped at 255 goes red at the hash gate.
    "mm17_jpeg12_pixel_stats" -> { (s, d) =>
      Multimodal.jpeg12PixelStats(
        Multimodal.realJpeg12Table(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM19: frame-energy / VAD census — the silence/activity segmentation
    // a speech-curation pipeline runs BEFORE transcription: 64-sample
    // frames over the decoded PCM stream, exact integer frame energy,
    // voiced gate at a fixture-calibrated threshold, LONGEST voiced run
    // (the segment a VAD extracts), voiced-energy mass, peak frame. The
    // oracle rebuilds every sample from the source bytes (mm6's
    // hex-nibble reassembly) and replays the framing, gate and
    // islands-style run length in SQL — a green hash proves the engine
    // scored every frame of every audio row identically.
    "mm19_audio_frame_stats" -> { (s, d) =>
      Multimodal.audioFrameStats(
        Multimodal.mediaTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM20: Adobe CMYK JPEG decode — the 4-component print/scan variant,
    // BOTH APP14 transforms side by side: even-k rows ColorTransform 0
    // (channels direct), odd-k rows ColorTransform 2 (YCCK — the common
    // Adobe print-scan encoding, whose inverted-CMY channels the decoder
    // must additionally pass through the mm9 inverse-YCbCr with the same
    // floor(x+0.5) literals); stored samples INVERTED per the Adobe
    // convention on both paths, K never transformed. The fixture
    // interleaves FOUR components per MCU with the AC checkerboard riding
    // the C (or Y) channel and restart markers resetting all four DC
    // predictors; the oracle replays the ink formulas in closed form per
    // block, so a decoder that missed the inversion, skipped the YCCK
    // step, dropped the 4th predictor, or bound the APP14 wrongly goes
    // red.
    "mm20_cmyk_pixel_stats" -> { (s, d) =>
      Multimodal.cmykPixelStats(
        Multimodal.realCmykJpegTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM18: REAL TIFF decode — the scanned-document/scientific format
    // completes the common-image set (PNG/JPEG/GIF/TIFF). TIFF is an
    // offset-based container of untrusted 32-bit pointers, so the gated
    // surface is structural: both byte orders, multi-strip layouts with
    // data-area offset arrays, PackBits decompression, and the
    // WhiteIsZero photometric (stored bytes inverted — a decoder that
    // skips the tag emits a negative and goes red). The oracle replays
    // only the pixel formula.
    "mm18_tiff_pixel_stats" -> { (s, d) =>
      Multimodal.tiffPixelStats(
        Multimodal.realTiffTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM21: REAL pixel-level resize — decode the mm7 PNGs (half of them
    // Adam7-interlaced as of round 13), box-filter downsample 2× (floor
    // mean over each 2×2 block, exact integer arithmetic), and gate stats
    // of the RESIZED image plus its dimensions. The oracle replays every
    // output pixel from the source formula, so a green hash proves both
    // the decode (through either interlace layout) AND the resample math
    // — the verb mm4's metadata-only resize stops short of, and the most
    // common multimodal-pipeline op after decode.
    "mm21_resize_pixels" -> { (s, d) =>
      Multimodal.resizePixelStats(
        Multimodal.realPngTable(s, Tables.documents(s, d)), f = 2)
        .toDF()
        .orderBy("doc_id")
    },

    // MM22: multi-format WAV decode + multi-channel downmix — real audio
    // lakes are not 16-bit mono (the only layout mm5/mm6 decode): the
    // fixture cycles 8/16/24-bit integer PCM AND 32/64-bit IEEE-float
    // (fmt tag 3, the speech-lake shapes) × 1/2/3 channels, and the gated
    // stats run over the channel-mean MONO mix (exact floor-division
    // semantics; floats quantize by the documented floor(f·32768) rule —
    // MediaCodec.pcmMonoMix — which recovers the fixture's m/32768
    // samples exactly). A decoder that missed the 8-bit unsigned
    // convention, botched 24-bit sign extension, misread the float tag,
    // or averaged with truncate-toward-zero goes red.
    "mm22_audio_mix_stats" -> { (s, d) =>
      Multimodal.audioMixStats(
        Multimodal.realMultiWavTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    },

    // MM23: FULL-COLOR PNG decode — truecolor/palette/RGBA/gray16/
    // truecolor16/gray+alpha (the color types real-web PNGs actually
    // use; mm7/mm21 cover gray-8 only), half the rows Adam7-interlaced,
    // filters cycling all five types. Gated: decoded color_type/
    // bit_depth (proves the parse dispatched right), full-resolution
    // Rec. 601 integer-luma stats (single-sample sensitivity), the
    // 2× box-resize sum over the color-decoded luma (the resize-over-
    // color path), and the ALPHA MASS (RGBA's 4th channel, gray+alpha's
    // 2nd, palette tRNS expansion — opaque 255 elsewhere), which the
    // luma ignores by design. The oracle replays every pixel from the
    // channel formulas — the engine must arrive at the same numbers THROUGH
    // inflate, the bpp-stride filters, PLTE expansion, big-endian
    // 16-bit samples, and de-interlacing.
    "mm23_color_png_stats" -> { (s, d) =>
      Multimodal.colorPngStats(
        Multimodal.realColorPngTable(s, Tables.documents(s, d)))
        .toDF()
        .orderBy("doc_id")
    }
  )

  // Image rows carry a REAL container header (33-byte PNG for doc_id≡0 mod
  // 6, 39-byte JPEG for ≡3) built with width 100+id%900 / height
  // 100+7·id%900 — the oracle predicts those dimensions from the formula,
  // so the green row proves the engine PARSED them out of the bytes.
  // Fingerprints cover the payload past the header (= the text for every
  // type), n_bytes the full content including it.
  private val featuresSql =
    """SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    CAST(octet_length(encode(text))
      |      + CASE WHEN doc_id % 6 = 0 THEN 33 WHEN doc_id % 6 = 3 THEN 39
      |             WHEN doc_id % 3 = 1 THEN 44 + CASE WHEN doc_id % 4 = 1 THEN 12 ELSE 0 END
      |             ELSE 0 END AS BIGINT) AS n_bytes,
      |    md5(text) AS fingerprint,
      |    CAST(CASE WHEN doc_id % 3 = 0 THEN 100 + doc_id % 900
      |              ELSE 64 + octet_length(encode(text)) % 1024 END AS INT) AS width,
      |    CAST(CASE WHEN doc_id % 3 = 0 THEN 100 + (doc_id * 7) % 900
      |              ELSE 64 + (octet_length(encode(text)) * 7) % 1024 END AS INT) AS height,
      |    CAST(CASE WHEN doc_id % 3 = 0 THEN 0
      |              WHEN doc_id % 3 = 1 THEN octet_length(encode(text)) * 1000
      |                // ((8000 + (doc_id % 8) * 1000) * (1 + doc_id % 2) * 2)
      |              ELSE octet_length(encode(text)) * 3 END AS BIGINT) AS duration_ms
      |  FROM documents""".stripMargin

  val oracle: Map[String, String] = Map(
    "mm1_media_features" ->
      s"""SELECT * FROM (
         |  $featuresSql
         |) ORDER BY doc_id""".stripMargin,

    "mm2_type_summary" ->
      s"""SELECT media_type, COUNT(*) AS n,
         |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
         |  COUNT(DISTINCT fingerprint) AS n_unique
         |FROM (
         |  $featuresSql
         |) GROUP BY media_type ORDER BY media_type""".stripMargin,

    "mm4_resize_meta" ->
      s"""SELECT doc_id, media_type,
         |  CAST(width * scale // 1000000 AS INT) AS width,
         |  CAST(height * scale // 1000000 AS INT) AS height
         |FROM (
         |  SELECT *, least(least(128000000 // width, 128000000 // height), 1000000) AS scale
         |  FROM ($featuresSql)
         |) ORDER BY doc_id""".stripMargin,

    "mm3_frame_sample" ->
      s"""WITH f AS (
         |  $featuresSql
         |)
         |SELECT doc_id, CAST(unnest(range(1 + n_bytes % 3)) AS INT) AS frame_idx,
         |  md5(fingerprint || '#' || CAST(unnest(range(1 + n_bytes % 3)) AS VARCHAR)) AS frame_hash
         |FROM f WHERE media_type = 'video'
         |ORDER BY doc_id, frame_idx""".stripMargin,

    // Audio rows only; every field the formula the builder wrote into the
    // RIFF header, so the hash proves a genuine chunk-walking parse.
    "mm5_audio_meta" ->
      """SELECT doc_id,
        |  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS INT) AS channels,
        |  CAST(16 AS INT) AS bits_per_sample,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS data_bytes,
        |  CAST(octet_length(encode(text)) * 1000
        |    // ((8000 + (doc_id % 8) * 1000) * (1 + doc_id % 2) * 2) AS BIGINT) AS duration_ms
        |FROM documents WHERE doc_id % 3 = 1
        |ORDER BY doc_id""".stripMargin,

    // The data chunk of an audio row is exactly encode(text): rebuild the
    // 16-bit LE signed samples byte-by-byte (hex + nibble strpos — DuckDB
    // blobs have no direct byte indexing) and aggregate the same integer
    // stats the engine's decoder computes. LAG gives the sign-change
    // census; docs with <2 bytes produce zero-sample rows via LEFT JOIN.
    "mm6_audio_pcm_stats" ->
      """WITH audio AS (
        |  SELECT doc_id, lower(hex(encode(text))) AS h FROM documents
        |  WHERE doc_id % 3 = 1
        |), samp AS (
        |  SELECT a.doc_id, u.i,
        |    CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
        |  FROM audio a,
        |    LATERAL (SELECT UNNEST(range(length(a.h) // 4)) AS i) u,
        |    LATERAL (SELECT
        |      (strpos('0123456789abcdef', substr(a.h, 4 * u.i + 1, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(a.h, 4 * u.i + 2, 1)) - 1)
        |      + 256 * ((strpos('0123456789abcdef', substr(a.h, 4 * u.i + 3, 1)) - 1) * 16
        |               + (strpos('0123456789abcdef', substr(a.h, 4 * u.i + 4, 1)) - 1))
        |      AS raw) r
        |), lagged AS (
        |  SELECT doc_id, i, v,
        |    LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM samp
        |), stats AS (
        |  SELECT doc_id,
        |    COUNT(*) AS n_samples,
        |    SUM(ABS(CAST(v AS BIGINT))) AS sum_abs,
        |    SUM(CAST(v AS BIGINT) * CAST(v AS BIGINT)) AS sum_sq,
        |    MAX(ABS(v)) AS peak_abs,
        |    SUM(CASE WHEN prev IS NOT NULL AND (v < 0) <> (prev < 0)
        |             THEN 1 ELSE 0 END) AS zero_crossings
        |  FROM lagged GROUP BY doc_id
        |)
        |SELECT a.doc_id,
        |  CAST(COALESCE(s.n_samples, 0) AS BIGINT) AS n_samples,
        |  CAST(COALESCE(s.sum_abs, 0) AS BIGINT) AS sum_abs,
        |  CAST(COALESCE(s.sum_sq, 0) AS BIGINT) AS sum_sq,
        |  CAST(COALESCE(s.peak_abs, 0) AS INT) AS peak_abs,
        |  CAST(COALESCE(s.zero_crossings, 0) AS BIGINT) AS zero_crossings
        |FROM audio a LEFT JOIN stats s USING (doc_id)
        |ORDER BY a.doc_id""".stripMargin,

    // Pixel truth from the formula alone: g(x,y) = (id + 7x + 13y) % 256
    // over w = 16 + id%16, h = 16 + 3·id%16 — the engine must arrive at
    // the same numbers THROUGH the deflated container.
    "mm7_image_pixel_stats" ->
      """WITH img AS (
        |  SELECT doc_id, CAST(16 + doc_id % 16 AS INT) AS w,
        |    CAST(16 + (doc_id * 3) % 16 AS INT) AS h
        |  FROM documents WHERE doc_id % 6 = 0
        |), px AS (
        |  SELECT i.doc_id,
        |    CAST((i.doc_id + 7 * xx.x + 13 * yy.y) % 256 AS BIGINT) AS g
        |  FROM img i,
        |    LATERAL (SELECT UNNEST(range(i.w)) AS x) xx,
        |    LATERAL (SELECT UNNEST(range(i.h)) AS y) yy
        |)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
        |  CAST(SUM(g) AS BIGINT) AS sum_lum,
        |  CAST(SUM(g * g) AS BIGINT) AS sum_sq,
        |  CAST(MIN(g) AS INT) AS min_lum,
        |  CAST(MAX(g) AS INT) AS max_lum
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Pixel truth from the per-block formulas alone: with k = id/3,
    // w = 16 + 8·(k%3), h = 16 + 8·(5k%3); block b (row-major MCU order)
    // holds 32 pixels of v+m and 32 of v−m where v = 28 + (id+11b) % 200,
    // m = (id+b) % 8 — so per block sum = 64v, sum_sq = 64v² + 64m²,
    // min = v−m, max = v+m. The engine must arrive at the same numbers
    // THROUGH the entropy-coded bitstream.
    "mm8_jpeg_pixel_stats" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id // 3 AS k FROM documents WHERE doc_id % 6 = 3
        |), dim AS (
        |  SELECT doc_id,
        |    CAST(16 + 8 * (k % 3) AS BIGINT) AS w,
        |    CAST(16 + 8 * ((k * 5) % 3) AS BIGINT) AS h
        |  FROM img
        |), blk AS (
        |  SELECT d.doc_id,
        |    28 + (d.doc_id + 11 * bb.b) % 200 AS v,
        |    (d.doc_id + bb.b) % 8 AS m
        |  FROM dim d,
        |    LATERAL (SELECT UNNEST(range((d.w // 8) * (d.h // 8))) AS b) bb
        |)
        |SELECT doc_id,
        |  CAST(COUNT(*) * 64 AS BIGINT) AS n_pixels,
        |  CAST(SUM(64 * v) AS BIGINT) AS sum_lum,
        |  CAST(SUM(64 * v * v + 64 * m * m) AS BIGINT) AS sum_sq,
        |  CAST(MIN(v - m) AS INT) AS min_lum,
        |  CAST(MAX(v + m) AS INT) AS max_lum
        |FROM blk GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Color truth from the per-block formulas: block b holds 32 px of
    // Y = v+m and 32 of v−m, all 64 with Cb′ = (id+3b)%8, Cr′ = (id+5b)%8.
    // The RGB replay is the decoder's EXACT arithmetic: floor(x + 0.5)
    // over IEEE-754 doubles with the same literals and left-to-right
    // association (int Y widened, then ± the chroma products) — so the
    // hash gate covers the color transform too, not just the YCbCr
    // decode. All channels stay in [0,255] by construction (Y ∈ [21,234],
    // chroma offsets ∈ [0,7]), so the decoder's clamp never fires and the
    // SQL needs no CASE.
    "mm9_jpeg_color_stats" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id // 6 AS k FROM documents WHERE doc_id % 6 = 5
        |), dim AS (
        |  SELECT doc_id,
        |    CAST(16 + 8 * (k % 3) AS BIGINT) AS w,
        |    CAST(16 + 8 * ((k * 5) % 3) AS BIGINT) AS h
        |  FROM img
        |), blk AS (
        |  SELECT d.doc_id,
        |    28 + (d.doc_id + 11 * bb.b) % 200 AS v,
        |    (d.doc_id + bb.b) % 8 AS m,
        |    (d.doc_id + 3 * bb.b) % 8 AS cb,
        |    (d.doc_id + 5 * bb.b) % 8 AS cr
        |  FROM dim d,
        |    LATERAL (SELECT UNNEST(range((d.w // 8) * (d.h // 8))) AS b) bb
        |), px AS (
        |  SELECT doc_id,
        |    CAST(floor((v + m) + 1.402 * cr + 0.5) AS BIGINT) AS r1,
        |    CAST(floor((v - m) + 1.402 * cr + 0.5) AS BIGINT) AS r2,
        |    CAST(floor((v + m) - 0.344136 * cb - 0.714136 * cr + 0.5) AS BIGINT) AS g1,
        |    CAST(floor((v - m) - 0.344136 * cb - 0.714136 * cr + 0.5) AS BIGINT) AS g2,
        |    CAST(floor((v + m) + 1.772 * cb + 0.5) AS BIGINT) AS b1,
        |    CAST(floor((v - m) + 1.772 * cb + 0.5) AS BIGINT) AS b2
        |  FROM blk
        |)
        |SELECT doc_id,
        |  CAST(COUNT(*) * 64 AS BIGINT) AS n_pixels,
        |  CAST(SUM(32 * (r1 + r2)) AS BIGINT) AS sum_r,
        |  CAST(SUM(32 * (g1 + g2)) AS BIGINT) AS sum_g,
        |  CAST(SUM(32 * (b1 + b2)) AS BIGINT) AS sum_b,
        |  CAST(SUM(32 * (r1 * r1 + r2 * r2)) AS BIGINT) AS sq_r,
        |  CAST(SUM(32 * (g1 * g1 + g2 * g2)) AS BIGINT) AS sq_g,
        |  CAST(SUM(32 * (b1 * b1 + b2 * b2)) AS BIGINT) AS sq_b
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // 4:2:0 truth: same per-luma-block y = v ± m split, but the chroma
    // pair comes from the MCU that CONTAINS the luma block —
    // mcu = (b / ybw / 2)·mcuW + (b mod ybw)/2 with ybw = w/8,
    // mcuW = w/16 (replication upsampling is exact because fixture
    // chroma is constant per MCU). A decoder that mis-mapped blocks to
    // MCUs or mixed the three DC predictors lands on different chroma
    // and fails the hash.
    "mm10_jpeg420_color_stats" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id // 6 AS k FROM documents WHERE doc_id % 6 = 1
        |), dim AS (
        |  SELECT doc_id,
        |    CAST(16 + 16 * (k % 2) AS BIGINT) AS w,
        |    CAST(16 + 16 * ((k // 2) % 2) AS BIGINT) AS h
        |  FROM img
        |), blk AS (
        |  SELECT d.doc_id,
        |    28 + (d.doc_id + 11 * bb.b) % 200 AS v,
        |    (d.doc_id + bb.b) % 8 AS m,
        |    ((bb.b // (d.w // 8)) // 2) * (d.w // 16)
        |      + ((bb.b % (d.w // 8)) // 2) AS mcu
        |  FROM dim d,
        |    LATERAL (SELECT UNNEST(range((d.w // 8) * (d.h // 8))) AS b) bb
        |), chr AS (
        |  SELECT doc_id, v, m,
        |    (doc_id + 3 * mcu) % 8 AS cb,
        |    (doc_id + 5 * mcu) % 8 AS cr
        |  FROM blk
        |), px AS (
        |  SELECT doc_id,
        |    CAST(floor((v + m) + 1.402 * cr + 0.5) AS BIGINT) AS r1,
        |    CAST(floor((v - m) + 1.402 * cr + 0.5) AS BIGINT) AS r2,
        |    CAST(floor((v + m) - 0.344136 * cb - 0.714136 * cr + 0.5) AS BIGINT) AS g1,
        |    CAST(floor((v - m) - 0.344136 * cb - 0.714136 * cr + 0.5) AS BIGINT) AS g2,
        |    CAST(floor((v + m) + 1.772 * cb + 0.5) AS BIGINT) AS b1,
        |    CAST(floor((v - m) + 1.772 * cb + 0.5) AS BIGINT) AS b2
        |  FROM chr
        |)
        |SELECT doc_id,
        |  CAST(COUNT(*) * 64 AS BIGINT) AS n_pixels,
        |  CAST(SUM(32 * (r1 + r2)) AS BIGINT) AS sum_r,
        |  CAST(SUM(32 * (g1 + g2)) AS BIGINT) AS sum_g,
        |  CAST(SUM(32 * (b1 + b2)) AS BIGINT) AS sum_b,
        |  CAST(SUM(32 * (r1 * r1 + r2 * r2)) AS BIGINT) AS sq_r,
        |  CAST(SUM(32 * (g1 * g1 + g2 * g2)) AS BIGINT) AS sq_g,
        |  CAST(SUM(32 * (b1 * b1 + b2 * b2)) AS BIGINT) AS sq_b
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Progressive gray truth: the same per-block v/m formulas as mm8 —
    // the coefficients are identical, only their delivery (three
    // spectral-selection scans with EOB runs) differs, so the pixel
    // stats must match the one-scan replay. Residue 2, k = id/6.
    "mm11_jpeg_progressive_stats" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id // 6 AS k FROM documents WHERE doc_id % 6 = 2
        |), dim AS (
        |  SELECT doc_id,
        |    CAST(16 + 8 * (k % 3) AS BIGINT) AS w,
        |    CAST(16 + 8 * ((k * 5) % 3) AS BIGINT) AS h
        |  FROM img
        |), blk AS (
        |  SELECT d.doc_id,
        |    28 + (d.doc_id + 11 * bb.b) % 200 AS v,
        |    (d.doc_id + bb.b) % 8 AS m
        |  FROM dim d,
        |    LATERAL (SELECT UNNEST(range((d.w // 8) * (d.h // 8))) AS b) bb
        |)
        |SELECT doc_id,
        |  CAST(COUNT(*) * 64 AS BIGINT) AS n_pixels,
        |  CAST(SUM(64 * v) AS BIGINT) AS sum_lum,
        |  CAST(SUM(64 * v * v + 64 * m * m) AS BIGINT) AS sum_sq,
        |  CAST(MIN(v - m) AS INT) AS min_lum,
        |  CAST(MAX(v + m) AS INT) AS max_lum
        |FROM blk GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Progressive color truth: mm9's replay verbatim at residue 4 — the
    // seven-scan delivery must reconstruct identical YCbCr planes before
    // the identical floor(x+0.5) RGB transform.
    "mm12_jpeg_progressive_color_stats" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id // 6 AS k FROM documents WHERE doc_id % 6 = 4
        |), dim AS (
        |  SELECT doc_id,
        |    CAST(16 + 8 * (k % 3) AS BIGINT) AS w,
        |    CAST(16 + 8 * ((k * 5) % 3) AS BIGINT) AS h
        |  FROM img
        |), blk AS (
        |  SELECT d.doc_id,
        |    28 + (d.doc_id + 11 * bb.b) % 200 AS v,
        |    (d.doc_id + bb.b) % 8 AS m,
        |    (d.doc_id + 3 * bb.b) % 8 AS cb,
        |    (d.doc_id + 5 * bb.b) % 8 AS cr
        |  FROM dim d,
        |    LATERAL (SELECT UNNEST(range((d.w // 8) * (d.h // 8))) AS b) bb
        |), px AS (
        |  SELECT doc_id,
        |    CAST(floor((v + m) + 1.402 * cr + 0.5) AS BIGINT) AS r1,
        |    CAST(floor((v - m) + 1.402 * cr + 0.5) AS BIGINT) AS r2,
        |    CAST(floor((v + m) - 0.344136 * cb - 0.714136 * cr + 0.5) AS BIGINT) AS g1,
        |    CAST(floor((v - m) - 0.344136 * cb - 0.714136 * cr + 0.5) AS BIGINT) AS g2,
        |    CAST(floor((v + m) + 1.772 * cb + 0.5) AS BIGINT) AS b1,
        |    CAST(floor((v - m) + 1.772 * cb + 0.5) AS BIGINT) AS b2
        |  FROM blk
        |)
        |SELECT doc_id,
        |  CAST(COUNT(*) * 64 AS BIGINT) AS n_pixels,
        |  CAST(SUM(32 * (r1 + r2)) AS BIGINT) AS sum_r,
        |  CAST(SUM(32 * (g1 + g2)) AS BIGINT) AS sum_g,
        |  CAST(SUM(32 * (b1 + b2)) AS BIGINT) AS sum_b,
        |  CAST(SUM(32 * (r1 * r1 + r2 * r2)) AS BIGINT) AS sq_r,
        |  CAST(SUM(32 * (g1 * g1 + g2 * g2)) AS BIGINT) AS sq_g,
        |  CAST(SUM(32 * (b1 * b1 + b2 * b2)) AS BIGINT) AS sq_b
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Video truth from the per-frame-per-block formulas: with k = id/3,
    // nf = 1 + k%3 frames of w = 16+8·(k%2) × h = 16+8·((k/2)%2); frame f
    // block b holds 32 px of v+m and 32 of v−m with
    // v = 28 + (id + 17f + 11b) % 200, m = (id + f + b) % 8. The engine
    // must arrive at the same numbers THROUGH the RIFF walk and each
    // frame's entropy-coded bitstream.
    "mm13_video_frame_stats" ->
      """WITH vid AS (
        |  SELECT doc_id, doc_id // 3 AS k FROM documents WHERE doc_id % 3 = 2
        |), dim AS (
        |  SELECT doc_id,
        |    CAST(16 + 8 * (k % 2) AS BIGINT) AS w,
        |    CAST(16 + 8 * ((k // 2) % 2) AS BIGINT) AS h,
        |    1 + k % 3 AS nf
        |  FROM vid
        |), frm AS (
        |  SELECT d.doc_id, d.w, d.h, CAST(ff.f AS INT) AS frame_idx
        |  FROM dim d, LATERAL (SELECT UNNEST(range(d.nf)) AS f) ff
        |), blk AS (
        |  SELECT f.doc_id, f.frame_idx,
        |    28 + (f.doc_id + 17 * f.frame_idx + 11 * bb.b) % 200 AS v,
        |    (f.doc_id + f.frame_idx + bb.b) % 8 AS m
        |  FROM frm f,
        |    LATERAL (SELECT UNNEST(range((f.w // 8) * (f.h // 8))) AS b) bb
        |)
        |SELECT doc_id, frame_idx,
        |  CAST(COUNT(*) * 64 AS BIGINT) AS n_pixels,
        |  CAST(SUM(64 * v) AS BIGINT) AS sum_lum,
        |  CAST(SUM(64 * v * v + 64 * m * m) AS BIGINT) AS sum_sq,
        |  CAST(MIN(v - m) AS INT) AS min_lum,
        |  CAST(MAX(v + m) AS INT) AS max_lum
        |FROM blk GROUP BY doc_id, frame_idx
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // Metadata truth from the generation formulas alone: the engine must
    // arrive at the same values THROUGH the APP0/APP1 segment walk and
    // the endian-alternating TIFF IFD parse.
    "mm14_image_exif_meta" ->
      """SELECT doc_id,
        |  CAST(16 + 8 * ((doc_id // 3) % 3) AS INT) AS width,
        |  CAST(16 + 8 * (((doc_id // 3) * 5) % 3) AS INT) AS height,
        |  CAST(doc_id % 3 AS INT) AS density_units,
        |  CAST(1 + doc_id % 300 AS INT) AS x_density,
        |  CAST(1 + (doc_id * 3) % 300 AS INT) AS y_density,
        |  'CAM' || CAST(doc_id % 5 AS VARCHAR) AS make,
        |  'MOD' || CAST(doc_id % 7 AS VARCHAR) AS model,
        |  CAST(1 + doc_id % 8 AS INT) AS orientation,
        |  printf('%04d:%02d:%02d %02d:%02d:%02d',
        |    2000 + doc_id % 26, 1 + doc_id % 12, 1 + doc_id % 28,
        |    doc_id % 24, doc_id % 60, (doc_id * 7) % 60) AS capture_ts
        |FROM documents WHERE doc_id % 6 = 3
        |ORDER BY doc_id""".stripMargin,

    // Composition truth from the formulas alone: the composed palette
    // INDEX at canvas (x,y) after frame f is the latest covering patch
    // (f ≥ 1 patches are 8×8 at (4f, 2f) with index id+17f+5x+3y mod
    // 256; frame 0 is the full-canvas id+7x+13y mod 256), and the
    // palette maps index c → RGB (c, (c+85) mod 256, (c+170) mod 256).
    // The engine must arrive at the same numbers THROUGH the LZW
    // bitstream, interlace reorder, and canvas composition.
    "mm15_gif_frame_stats" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id // 6 AS k,
        |    CAST(16 + doc_id % 16 AS BIGINT) AS w,
        |    CAST(16 + (doc_id * 3) % 16 AS BIGINT) AS h
        |  FROM documents WHERE doc_id % 6 = 0
        |), frm AS (
        |  SELECT doc_id, w, h, CAST(ff.f AS INT) AS frame_idx
        |  FROM img, LATERAL (SELECT UNNEST(range(1 + k % 3)) AS f) ff
        |), px AS (
        |  SELECT doc_id, frame_idx,
        |    CASE WHEN frame_idx >= 2 AND xx.x BETWEEN 8 AND 15
        |              AND yy.y BETWEEN 4 AND 11
        |           THEN (doc_id + 34 + 5 * xx.x + 3 * yy.y) % 256
        |         WHEN frame_idx >= 1 AND xx.x BETWEEN 4 AND 11
        |              AND yy.y BETWEEN 2 AND 9
        |           THEN (doc_id + 17 + 5 * xx.x + 3 * yy.y) % 256
        |         ELSE (doc_id + 7 * xx.x + 13 * yy.y) % 256 END AS c
        |  FROM frm,
        |    LATERAL (SELECT UNNEST(range(w)) AS x) xx,
        |    LATERAL (SELECT UNNEST(range(h)) AS y) yy
        |), rgb AS (
        |  SELECT doc_id, frame_idx, c AS r, (c + 85) % 256 AS g,
        |    (c + 170) % 256 AS b
        |  FROM px
        |)
        |SELECT doc_id, frame_idx,
        |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
        |  CAST(SUM(r) AS BIGINT) AS sum_r,
        |  CAST(SUM(g) AS BIGINT) AS sum_g,
        |  CAST(SUM(b) AS BIGINT) AS sum_b,
        |  CAST(SUM(r * r) AS BIGINT) AS sq_r,
        |  CAST(SUM(g * g) AS BIGINT) AS sq_g,
        |  CAST(SUM(b * b) AS BIGINT) AS sq_b
        |FROM rgb GROUP BY doc_id, frame_idx
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // Lossless truth from the formula + point transform alone: decoded
    // sample = ((id + 7x + 13y + (x·y mod 5)) mod 256 >> pt) << pt with
    // pt = k mod 3 — the engine must arrive at the same numbers THROUGH
    // the Annex H predictor chain (all seven selectors across images),
    // the mod-2^16 difference decode, and mid-image restart resets.
    "mm16_jpeg_lossless_stats" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id // 6 AS k FROM documents WHERE doc_id % 6 = 4
        |), dim AS (
        |  SELECT doc_id,
        |    CAST(13 + k % 17 AS BIGINT) AS w,
        |    CAST(11 + (3 * k) % 19 AS BIGINT) AS h,
        |    CAST(CASE WHEN k % 3 = 0 THEN 1 WHEN k % 3 = 1 THEN 2
        |              ELSE 4 END AS BIGINT) AS q
        |  FROM img
        |), px AS (
        |  SELECT d.doc_id,
        |    (((d.doc_id + 7 * xx.x + 13 * yy.y + (xx.x * yy.y) % 5) % 256)
        |      // d.q) * d.q AS g
        |  FROM dim d,
        |    LATERAL (SELECT UNNEST(range(d.w)) AS x) xx,
        |    LATERAL (SELECT UNNEST(range(d.h)) AS y) yy
        |)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
        |  CAST(SUM(g) AS BIGINT) AS sum_lum,
        |  CAST(SUM(g * g) AS BIGINT) AS sum_sq,
        |  CAST(MIN(g) AS INT) AS min_lum,
        |  CAST(MAX(g) AS INT) AS max_lum
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // 12-bit truth from the per-block formulas alone: block b holds 32
    // pixels of v + 33m and 32 of v − 33m with v = 520 + (id + 37b) mod
    // 3000 and m = (id + b) mod 16 — per block sum = 64v,
    // sum_sq = 64v² + 64·(33m)², min = v − 33m, max = v + 33m. The
    // engine must arrive at the same numbers THROUGH the Pq = 1 table
    // parse, the widened Huffman alphabet and the 2048-level-shift IDCT.
    "mm17_jpeg12_pixel_stats" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id // 6 AS k FROM documents WHERE doc_id % 6 = 3
        |), dim AS (
        |  SELECT doc_id,
        |    CAST(16 + 8 * (k % 3) AS BIGINT) AS w,
        |    CAST(16 + 8 * ((k * 5) % 3) AS BIGINT) AS h
        |  FROM img
        |), blk AS (
        |  SELECT d.doc_id,
        |    520 + (d.doc_id + 37 * bb.b) % 3000 AS v,
        |    33 * ((d.doc_id + bb.b) % 16) AS a
        |  FROM dim d,
        |    LATERAL (SELECT UNNEST(range((d.w // 8) * (d.h // 8))) AS b) bb
        |)
        |SELECT doc_id,
        |  CAST(COUNT(*) * 64 AS BIGINT) AS n_pixels,
        |  CAST(SUM(64 * v) AS BIGINT) AS sum_lum,
        |  CAST(SUM(64 * v * v + 64 * a * a) AS BIGINT) AS sum_sq,
        |  CAST(MIN(v - a) AS INT) AS min_lum,
        |  CAST(MAX(v + a) AS INT) AS max_lum
        |FROM blk GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // mm20 truth in closed form per block: the C plane stores v ± m
    // (32 pixels each; ink 255−v∓m — the ± cancels in sums and adds 64m²
    // in sum_sq), M/Y/K store per-block DC constants. A decoder that
    // skipped the Adobe inversion would emit sums of v instead of 255−v.
    // Even k: transform-0 ink directly from the block formulas. Odd k:
    // YCCK — the Y plane's two exact levels v ± m pass through the SAME
    // floor(x+0.5) inverse-YCbCr literals as mm9 (bit-identical IEEE
    // doubles on both engines), then invert to ink; K bypasses the
    // transform on both paths.
    "mm20_cmyk_pixel_stats" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id // 7 AS k FROM documents WHERE doc_id % 7 = 2
        |), dim AS (
        |  SELECT doc_id, k,
        |    CAST(16 + 8 * (k % 3) AS BIGINT) AS w,
        |    CAST(16 + 8 * ((k * 5) % 3) AS BIGINT) AS h
        |  FROM img
        |), blk AS (
        |  SELECT d.doc_id, d.k % 2 AS t2,
        |    28 + (d.doc_id + 11 * bb.b) % 200 AS v,
        |    (d.doc_id + bb.b) % 8 AS m_amp,
        |    (d.doc_id + 3 * bb.b) % 8 AS cbp,
        |    (d.doc_id + 5 * bb.b) % 8 AS crp,
        |    255 - (40 + (d.doc_id + 7 * bb.b) % 180) AS m0,
        |    255 - (60 + (d.doc_id + 13 * bb.b) % 160) AS y0,
        |    255 - (20 + (d.doc_id + 3 * bb.b) % 100) AS kk
        |  FROM dim d,
        |    LATERAL (SELECT UNNEST(range((d.w // 8) * (d.h // 8))) AS b) bb
        |), ink AS (
        |  SELECT doc_id, t2, m_amp, kk, m0, y0,
        |    255 - v AS c0,
        |    255 - CAST(floor((v + m_amp) + 1.402 * crp + 0.5) AS BIGINT) AS c1,
        |    255 - CAST(floor((v - m_amp) + 1.402 * crp + 0.5) AS BIGINT) AS c2,
        |    255 - CAST(floor((v + m_amp) - 0.344136 * cbp - 0.714136 * crp + 0.5) AS BIGINT) AS mm1,
        |    255 - CAST(floor((v - m_amp) - 0.344136 * cbp - 0.714136 * crp + 0.5) AS BIGINT) AS mm2,
        |    255 - CAST(floor((v + m_amp) + 1.772 * cbp + 0.5) AS BIGINT) AS yy1,
        |    255 - CAST(floor((v - m_amp) + 1.772 * cbp + 0.5) AS BIGINT) AS yy2
        |  FROM blk
        |)
        |SELECT doc_id,
        |  CAST(COUNT(*) * 64 AS BIGINT) AS n_pixels,
        |  CAST(SUM(CASE WHEN t2 = 0 THEN 64 * c0
        |    ELSE 32 * (c1 + c2) END) AS BIGINT) AS sum_c,
        |  CAST(SUM(CASE WHEN t2 = 0 THEN 64 * c0 * c0 + 64 * m_amp * m_amp
        |    ELSE 32 * (c1 * c1 + c2 * c2) END) AS BIGINT) AS sum_sq_c,
        |  CAST(SUM(CASE WHEN t2 = 0 THEN 64 * m0
        |    ELSE 32 * (mm1 + mm2) END) AS BIGINT) AS sum_m,
        |  CAST(SUM(CASE WHEN t2 = 0 THEN 64 * y0
        |    ELSE 32 * (yy1 + yy2) END) AS BIGINT) AS sum_y,
        |  CAST(SUM(64 * kk) AS BIGINT) AS sum_k,
        |  CAST(MIN(kk) AS INT) AS min_k,
        |  CAST(MAX(kk) AS INT) AS max_k
        |FROM ink GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // mm19 truth: mm6's hex-nibble sample reassembly, then the same
    // 64-sample framing (partial tail dropped via HAVING), the same
    // integer energy gate, and the voiced-run length via the islands
    // trick (frame_idx − ROW_NUMBER classifies consecutive voiced
    // frames). Zero-frame audio docs stay in the census via LEFT JOIN.
    "mm19_audio_frame_stats" ->
      s"""WITH audio AS (
         |  SELECT doc_id, lower(hex(encode(text))) AS h FROM documents
         |  WHERE doc_id % 3 = 1
         |), samp AS (
         |  SELECT a.doc_id, u.i,
         |    CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
         |  FROM audio a,
         |    LATERAL (SELECT UNNEST(range(length(a.h) // 4)) AS i) u,
         |    LATERAL (SELECT
         |      (strpos('0123456789abcdef', substr(a.h, 4 * u.i + 1, 1)) - 1) * 16
         |      + (strpos('0123456789abcdef', substr(a.h, 4 * u.i + 2, 1)) - 1)
         |      + 256 * ((strpos('0123456789abcdef', substr(a.h, 4 * u.i + 3, 1)) - 1) * 16
         |               + (strpos('0123456789abcdef', substr(a.h, 4 * u.i + 4, 1)) - 1))
         |      AS raw) r
         |), fr AS (
         |  SELECT doc_id, i // ${Multimodal.AudioFrameLen} AS f,
         |         SUM(CAST(v AS BIGINT) * CAST(v AS BIGINT)) AS e
         |  FROM samp GROUP BY doc_id, i // ${Multimodal.AudioFrameLen}
         |  HAVING COUNT(*) = ${Multimodal.AudioFrameLen}
         |), voiced AS (
         |  SELECT doc_id, f FROM fr WHERE e >= ${Multimodal.VoicedEnergyMin}
         |), runs AS (
         |  SELECT doc_id,
         |    f - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS grp
         |  FROM voiced
         |), runlen AS (
         |  SELECT doc_id, COUNT(*) AS len FROM runs GROUP BY doc_id, grp
         |), agg AS (
         |  SELECT doc_id, COUNT(*) AS n_frames,
         |    SUM(CASE WHEN e >= ${Multimodal.VoicedEnergyMin} THEN 1 ELSE 0 END) AS n_voiced,
         |    SUM(CASE WHEN e >= ${Multimodal.VoicedEnergyMin} THEN e ELSE 0 END) AS voiced_energy,
         |    MAX(e) AS max_frame_energy
         |  FROM fr GROUP BY doc_id
         |), lng AS (
         |  SELECT doc_id, MAX(len) AS longest FROM runlen GROUP BY doc_id
         |)
         |SELECT a.doc_id,
         |  CAST(COALESCE(g.n_frames, 0) AS BIGINT) AS n_frames,
         |  CAST(COALESCE(g.n_voiced, 0) AS BIGINT) AS n_voiced,
         |  CAST(COALESCE(l.longest, 0) AS BIGINT) AS longest_voiced_run,
         |  CAST(COALESCE(g.voiced_energy, 0) AS BIGINT) AS voiced_energy,
         |  CAST(COALESCE(g.max_frame_energy, 0) AS BIGINT) AS max_frame_energy
         |FROM audio a
         |LEFT JOIN agg g ON g.doc_id = a.doc_id
         |LEFT JOIN lng l ON l.doc_id = a.doc_id
         |ORDER BY a.doc_id""".stripMargin,

    // TIFF truth from the pixel formula alone — the engine must arrive
    // at the same numbers THROUGH the endian-dispatched IFD walk, the
    // strip assembly (multi-strip offset/count arrays), PackBits, and
    // the photometric normalization.
    "mm18_tiff_pixel_stats" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id // 6 AS k FROM documents WHERE doc_id % 6 = 5
        |), dim AS (
        |  SELECT doc_id,
        |    CAST(14 + k % 15 AS BIGINT) AS w,
        |    CAST(10 + (3 * k) % 13 AS BIGINT) AS h
        |  FROM img
        |), px AS (
        |  SELECT d.doc_id,
        |    (d.doc_id + 5 * xx.x + 11 * yy.y + (xx.x * yy.y) % 7) % 256 AS g
        |  FROM dim d,
        |    LATERAL (SELECT UNNEST(range(d.w)) AS x) xx,
        |    LATERAL (SELECT UNNEST(range(d.h)) AS y) yy
        |)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
        |  CAST(SUM(g) AS BIGINT) AS sum_lum,
        |  CAST(SUM(g * g) AS BIGINT) AS sum_sq,
        |  CAST(MIN(g) AS INT) AS min_lum,
        |  CAST(MAX(g) AS INT) AS max_lum
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Resize truth from the source-pixel formula alone: each 2× output
    // pixel is the floor mean of its 2×2 source block
    // g(x,y) = (id + 7x + 13y) % 256 — the engine must arrive at the
    // same numbers THROUGH the deflated (and, for half the rows,
    // Adam7-interlaced) container AND the box filter.
    "mm21_resize_pixels" ->
      """WITH img AS (
        |  SELECT doc_id, CAST(16 + doc_id % 16 AS INT) AS w,
        |    CAST(16 + (doc_id * 3) % 16 AS INT) AS h
        |  FROM documents WHERE doc_id % 6 = 0
        |), px AS (
        |  SELECT i.doc_id, i.w // 2 AS ow, i.h // 2 AS oh,
        |    ((i.doc_id + 7 * (2 * xx.x) + 13 * (2 * yy.y)) % 256
        |     + (i.doc_id + 7 * (2 * xx.x + 1) + 13 * (2 * yy.y)) % 256
        |     + (i.doc_id + 7 * (2 * xx.x) + 13 * (2 * yy.y + 1)) % 256
        |     + (i.doc_id + 7 * (2 * xx.x + 1) + 13 * (2 * yy.y + 1)) % 256) // 4 AS g
        |  FROM img i,
        |    LATERAL (SELECT UNNEST(range(i.w // 2)) AS x) xx,
        |    LATERAL (SELECT UNNEST(range(i.h // 2)) AS y) yy
        |)
        |SELECT doc_id,
        |  CAST(MIN(ow) AS INT) AS out_w,
        |  CAST(MIN(oh) AS INT) AS out_h,
        |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
        |  CAST(SUM(g) AS BIGINT) AS sum_lum,
        |  CAST(SUM(g * g) AS BIGINT) AS sum_sq,
        |  CAST(MIN(g) AS INT) AS min_lum,
        |  CAST(MAX(g) AS INT) AS max_lum
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Downmix truth from the per-channel sample formulas alone — the
    // engine must arrive at the same numbers THROUGH the RIFF walk, the
    // per-format byte decode (8-bit unsigned centering, 16/24-bit signed
    // LE, float32 with the documented floor(f·32768) quantization that
    // recovers m exactly) and the floor-mean downmix. floor(SUM/ch) in
    // DOUBLE is exact here (|sum| < 2^25 ≪ 2^53).
    "mm22_audio_mix_stats" ->
      """WITH audio AS (
        |  SELECT doc_id, doc_id // 3 AS k FROM documents WHERE doc_id % 3 = 1
        |), fmtc AS (
        |  SELECT doc_id,
        |    CAST(CASE k % 5 WHEN 0 THEN 8 WHEN 1 THEN 16 WHEN 2 THEN 24
        |      WHEN 3 THEN 32 ELSE 64 END AS INT) AS bits,
        |    CAST(1 + k % 3 AS INT) AS ch,
        |    CAST(40 + doc_id % 50 AS INT) AS nf
        |  FROM audio
        |), samp AS (
        |  SELECT f.doc_id, f.ch, f.bits, u.i, cc.c,
        |    CASE WHEN f.bits = 8 THEN (f.doc_id + 5 * u.i + 3 * cc.c) % 256 - 128
        |         WHEN f.bits = 16 THEN (7 * f.doc_id + 11 * u.i + 17 * cc.c) % 4001 - 2000
        |         WHEN f.bits = 24 THEN (13 * f.doc_id + 23 * u.i + 29 * cc.c) % 100001 - 50000
        |         WHEN f.bits = 32 THEN (31 * f.doc_id + 41 * u.i + 53 * cc.c) % 40001 - 20000
        |         ELSE (37 * f.doc_id + 43 * u.i + 61 * cc.c) % 40001 - 20000 END AS v
        |  FROM fmtc f,
        |    LATERAL (SELECT UNNEST(range(f.nf)) AS i) u,
        |    LATERAL (SELECT UNNEST(range(f.ch)) AS c) cc
        |), mono AS (
        |  SELECT doc_id, ch, bits, i,
        |    CAST(floor(SUM(v) / ch) AS BIGINT) AS m
        |  FROM samp GROUP BY doc_id, ch, bits, i
        |), lagged AS (
        |  SELECT doc_id, ch, bits, m,
        |    LAG(m) OVER (PARTITION BY doc_id ORDER BY i) AS pm
        |  FROM mono
        |)
        |SELECT doc_id,
        |  CAST(MIN(ch) AS INT) AS channels,
        |  CAST(MIN(bits) AS INT) AS bits,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(ABS(m)) AS BIGINT) AS sum_abs,
        |  CAST(SUM(m * m) AS BIGINT) AS sum_sq,
        |  CAST(MAX(ABS(m)) AS INT) AS peak_abs,
        |  CAST(SUM(CASE WHEN pm IS NOT NULL AND ((m < 0) != (pm < 0))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        |FROM lagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Color-PNG truth from the channel formulas alone: per-variant RGB
    // (or gray) → Rec. 601 integer luma L, full-res stats over L, and
    // the 2× resize sum as SUM over 2×2 blocks of floor(SUM(L)/4). The
    // engine must arrive THROUGH the real container (deflate, bpp-stride
    // filters, PLTE, 16-bit BE samples, Adam7 on odd k).
    "mm23_color_png_stats" ->
      """WITH img AS (
        |  SELECT doc_id, doc_id // 6 AS k,
        |    CAST(16 + doc_id % 16 AS INT) AS w,
        |    CAST(16 + (doc_id * 3) % 16 AS INT) AS h
        |  FROM documents WHERE doc_id % 6 = 0
        |), meta AS (
        |  SELECT doc_id, w, h, CAST(k % 10 AS INT) AS v FROM img
        |), px AS (
        |  SELECT m.doc_id, m.v, m.w, m.h, xx.x, yy.y,
        |    CASE
        |      WHEN m.v = 0 OR m.v = 2 THEN
        |        (299 * ((m.doc_id + 7*xx.x + 13*yy.y) % 256)
        |       + 587 * ((m.doc_id + 7*xx.x + 13*yy.y + 31) % 256)
        |       + 114 * ((m.doc_id + 7*xx.x + 13*yy.y + 62) % 256)) // 1000
        |      WHEN m.v = 1 THEN
        |        (299 * ((m.doc_id + (m.doc_id + 7*xx.x + 13*yy.y) % 256) % 256)
        |       + 587 * ((m.doc_id + 2*((m.doc_id + 7*xx.x + 13*yy.y) % 256) + 5) % 256)
        |       + 114 * ((m.doc_id + 3*((m.doc_id + 7*xx.x + 13*yy.y) % 256) + 11) % 256)) // 1000
        |      WHEN m.v = 3 THEN ((257*m.doc_id + 101*xx.x + 59*yy.y) % 65536) // 256
        |      WHEN m.v = 4 THEN
        |        (299 * (((257*m.doc_id + 101*xx.x + 59*yy.y) % 65536) // 256)
        |       + 587 * (((257*m.doc_id + 101*xx.x + 59*yy.y + 31) % 65536) // 256)
        |       + 114 * (((257*m.doc_id + 101*xx.x + 59*yy.y + 62) % 65536) // 256)) // 1000
        |      WHEN m.v = 6 THEN ((m.doc_id + 7*xx.x + 13*yy.y) % 16) * 17
        |      WHEN m.v = 7 THEN
        |        (299 * ((m.doc_id + (m.doc_id + 7*xx.x + 13*yy.y) % 16) % 256)
        |       + 587 * ((m.doc_id + 2*((m.doc_id + 7*xx.x + 13*yy.y) % 16) + 5) % 256)
        |       + 114 * ((m.doc_id + 3*((m.doc_id + 7*xx.x + 13*yy.y) % 16) + 11) % 256)) // 1000
        |      WHEN m.v = 8 THEN ((m.doc_id + 7*xx.x + 13*yy.y) % 2) * 255
        |      WHEN m.v = 9 THEN
        |        (299 * ((m.doc_id + (m.doc_id + 7*xx.x + 13*yy.y) % 256) % 256)
        |       + 587 * ((m.doc_id + 2*((m.doc_id + 7*xx.x + 13*yy.y) % 256) + 5) % 256)
        |       + 114 * ((m.doc_id + 3*((m.doc_id + 7*xx.x + 13*yy.y) % 256) + 11) % 256)) // 1000
        |      ELSE (m.doc_id + 7*xx.x + 13*yy.y) % 256
        |    END AS L,
        |    CASE
        |      WHEN m.v = 2 THEN (m.doc_id + 7*xx.x + 13*yy.y + 93) % 256
        |      WHEN m.v = 5 THEN (m.doc_id + 7*xx.x + 13*yy.y + 31) % 256
        |      WHEN m.v = 9 THEN (m.doc_id + 5*((m.doc_id + 7*xx.x + 13*yy.y) % 256) + 3) % 256
        |      ELSE 255
        |    END AS A
        |  FROM meta m,
        |    LATERAL (SELECT UNNEST(range(m.w)) AS x) xx,
        |    LATERAL (SELECT UNNEST(range(m.h)) AS y) yy
        |), blk AS (
        |  SELECT doc_id, x // 2 AS bx, y // 2 AS by, SUM(L) // 4 AS g
        |  FROM px WHERE x < (w // 2) * 2 AND y < (h // 2) * 2
        |  GROUP BY doc_id, x // 2, y // 2
        |), rs AS (
        |  SELECT doc_id, SUM(g) AS rs_sum FROM blk GROUP BY doc_id
        |), fullres AS (
        |  SELECT doc_id, COUNT(*) AS np, SUM(L) AS sl, SUM(L*L) AS sq,
        |    MIN(L) AS mn, MAX(L) AS mx, SUM(A) AS sa
        |  FROM px GROUP BY doc_id
        |)
        |SELECT m.doc_id,
        |  CAST(CASE m.v WHEN 0 THEN 2 WHEN 1 THEN 3 WHEN 2 THEN 6
        |    WHEN 3 THEN 0 WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 0
        |    WHEN 7 THEN 3 WHEN 9 THEN 3 ELSE 0 END AS INT) AS color_type,
        |  CAST(CASE WHEN m.v IN (3, 4) THEN 16 WHEN m.v IN (6, 7) THEN 4
        |    WHEN m.v = 8 THEN 1 ELSE 8 END AS INT) AS bit_depth,
        |  m.w, m.h,
        |  CAST(f.np AS BIGINT) AS n_pixels,
        |  CAST(f.sl AS BIGINT) AS sum_lum,
        |  CAST(f.sq AS BIGINT) AS sum_sq,
        |  CAST(f.mn AS INT) AS min_lum,
        |  CAST(f.mx AS INT) AS max_lum,
        |  CAST(m.w // 2 AS INT) AS rs_w,
        |  CAST(m.h // 2 AS INT) AS rs_h,
        |  CAST(r.rs_sum AS BIGINT) AS rs_sum_lum,
        |  CAST(f.sa AS BIGINT) AS sum_alpha
        |FROM meta m
        |JOIN fullres f ON f.doc_id = m.doc_id
        |JOIN rs r ON r.doc_id = m.doc_id
        |ORDER BY m.doc_id""".stripMargin
  )
}
