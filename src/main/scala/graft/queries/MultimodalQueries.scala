package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.scaleops.Multimodal
import graft.sources.Tables

/** Multimodal plumbing queries: the binary-column schema path is
  * oracle-checked (byte lengths / modality routing are pure SQL); the
  * decode/feature stages are rows-only (their stub values are pinned
  * by MultimodalSpec instead). */
object MultimodalQueries {

  private def media(s: SparkSession, d: String) =
    Multimodal.fromDocuments(Tables.load(s, d, "documents"), "doc_id", "text")

  def mediaBytes(s: SparkSession, d: String): DataFrame =
    media(s, d).select(
      col("media_id"), col("modality"),
      octet_length(col("payload")).as("byte_len"),
      ascii(substring(decode(col("payload"), "UTF-8"), 1, 1)).as("first_byte"))

  val mediaBytesOracle: String =
    """SELECT doc_id AS media_id,
      |  (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS modality,
      |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
      |  ascii(substr(text, 1, 1)) AS first_byte
      |FROM documents""".stripMargin

  /** Decode + feature-extract stages over the typed Dataset
    * boundary, aggregated per modality and CERTIFIED: row counts and
    * total payload bytes are recomputed by the oracle (byte_len must
    * survive the decode stage unchanged — octet_length(encode(text))
    * in SQL), while the engine witnesses the decode/feature
    * contracts the stub values must honor: positive dimensions,
    * entropy within [0, 8] bits/byte (real per-byte computation),
    * and single-frame images. Stub VALUES are pinned by
    * MultimodalSpec. */
  def mediaPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = media(s, d).as[Multimodal.MediaRow]
    val meta = Multimodal.decodeMeta(m).toDF()
    val feats = Multimodal.extractFeatures(m).toDF()
    meta.join(feats, Seq("media_id", "modality"))
      .groupBy("modality")
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        min(col("width") > 0 && col("height") > 0).as("dims_ok"),
        min(col("byte_entropy") >= 0 && col("byte_entropy") <= 8)
          .as("entropy_ok"),
        min(col("modality") =!= "image" || col("n_frames") === 1)
          .as("image_single_frame_ok"))
  }

  val mediaPipelineOracle: String =
    """SELECT (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS modality,
      |  COUNT(*) AS n,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  TRUE AS dims_ok, TRUE AS entropy_ok,
      |  TRUE AS image_single_frame_ok
      |FROM documents GROUP BY 1""".stripMargin

  /** REAL pixel-decode certification (no stub anywhere in this
    * query): the engine fabricates genuine BMP24 / binary-PGM
    * payloads — real headers, bottom-up rows, 4-byte BMP row padding
    * — whose pixel (x,y) carries (doc_id·31 + y·w + x) mod 256,
    * decodes them back through [[Multimodal.decodePixels]]'s
    * byte-layout decoders, and the oracle recomputes the channel sums
    * purely arithmetically. Any padding, row-order, or header-offset
    * bug shifts the sums and breaks the hash; `dims_match` pins the
    * parsed header against the generating dimensions. */
  def mediaDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val imgs = Tables.load(s, d, "documents")
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { i =>
          // doc_id mod 5 picks the container (gif joined the family
          // in r13); dims derive from i/5 so they VARY within each
          // residue class (an i%5 term would be constant per class —
          // the dead-variation bug r12 ADVICE caught on the jpeg
          // width). The entropy-coded fifths go through the real
          // codecs: JPEG fixtures are constant 8×8 blocks under a
          // unit quantization table (DC-only spectra round-trip
          // EXACTLY — see JpegCodec), PNG and GIF are lossless by
          // construction — so the oracle replays every decoded sum
          // from a pixel/block formula just like the raw-byte formats
          val v = (i / 5).toInt
          val payload = (i % 5) match {
            case 0 => Multimodal.makePgm(i, 4 + v % 5, 3 + v % 4)
            case 1 => Multimodal.makeBmp(i, 4 + v % 5, 3 + v % 4)
            case 2 =>
              // the jpeg fifth alternates BASELINE / PROGRESSIVE
              // (SOF2, r14) on v%2 — the two fixture encoders produce
              // pixel-identical images by construction (JpegSpec pins
              // it byte-for-byte), so the oracle's jpx formula covers
              // both; a progressive-decode failure drops rows /
              // shifts sums and flips the row red
              val jw = 8 * (1 + v % 2)
              val jf = (b: Int) => ((i * 31 + b * 7) % 256).toInt
              if (v % 2 == 0)
                graft.scaleops.JpegCodec.encodeGrayBlocks(jw, 16, jf)
              else
                graft.scaleops.JpegCodec.encodeGrayBlocksProgressive(
                  jw, 16, jf)
            case 3 => graft.scaleops.PngCodec.encodeGray(
              5 + v % 5, 4 + v % 3,
              (x, y) => ((i * 31 + y * (5 + v % 5) + x) % 256).toInt)
            case _ => graft.scaleops.GifCodec.encodeGray(
              6 + v % 4, 5 + v % 3,
              (x, y) => ((i * 31 + y * (6 + v % 4) + x) % 256).toInt)
          }
          Multimodal.MediaRow(i, "image", payload)
        }
      }
    val v5 = floor(col("media_id") / 5)
    Multimodal.decodePixels(imgs).toDF()
      .groupBy("fmt")
      .agg(count(lit(1)).as("n"),
        sum(col("n_pixels")).as("n_pixels"),
        sum(col("sum_r")).as("sum_gray"),
        min(col("sum_r") === col("sum_g") && col("sum_g") === col("sum_b"))
          .as("channels_equal"),
        min(when(col("fmt") === "jpeg",
          col("width") === lit(8) * (lit(1) + pmod(v5, lit(2))) &&
            col("height") === lit(16))
          .when(col("fmt") === "png",
            col("width") === lit(5) + pmod(v5, lit(5)) &&
              col("height") === lit(4) + pmod(v5, lit(3)))
          .when(col("fmt") === "gif",
            col("width") === lit(6) + pmod(v5, lit(4)) &&
              col("height") === lit(5) + pmod(v5, lit(3)))
          .otherwise(
            col("width") === lit(4) + pmod(v5, lit(5)) &&
              col("height") === lit(3) + pmod(v5, lit(4))))
          .as("dims_match"))
  }

  val mediaDecodeOracle: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id // 5 AS v FROM documents),
      |px AS (
      |  SELECT doc_id, (4 + v % 5) * (3 + v % 4) AS np,
      |    list_sum(list_transform(
      |      generate_series(0, (4 + v % 5) * (3 + v % 4) - 1),
      |      p -> (doc_id * 31 + p) % 256)) AS s
      |  FROM d WHERE doc_id % 5 < 2),
      |jpx AS (
      |  SELECT doc_id, 8 * (1 + v % 2) * 16 AS np,
      |    64 * list_sum(list_transform(
      |      generate_series(0, (1 + v % 2) * 2 - 1),
      |      b -> (doc_id * 31 + b * 7) % 256)) AS s
      |  FROM d WHERE doc_id % 5 = 2),
      |ppx AS (
      |  SELECT doc_id, (5 + v % 5) * (4 + v % 3) AS np,
      |    list_sum(list_transform(
      |      generate_series(0, (5 + v % 5) * (4 + v % 3) - 1),
      |      p -> (doc_id * 31 + p) % 256)) AS s
      |  FROM d WHERE doc_id % 5 = 3),
      |fpx AS (
      |  SELECT doc_id, (6 + v % 4) * (5 + v % 3) AS np,
      |    list_sum(list_transform(
      |      generate_series(0, (6 + v % 4) * (5 + v % 3) - 1),
      |      p -> (doc_id * 31 + p) % 256)) AS s
      |  FROM d WHERE doc_id % 5 = 4),
      |allpx AS (
      |  SELECT doc_id, np, s FROM px
      |  UNION ALL SELECT doc_id, np, s FROM jpx
      |  UNION ALL SELECT doc_id, np, s FROM ppx
      |  UNION ALL SELECT doc_id, np, s FROM fpx)
      |SELECT CASE WHEN doc_id % 5 = 0 THEN 'pnm'
      |  WHEN doc_id % 5 = 1 THEN 'bmp'
      |  WHEN doc_id % 5 = 2 THEN 'jpeg'
      |  WHEN doc_id % 5 = 3 THEN 'png' ELSE 'gif' END AS fmt,
      |  COUNT(*) AS n, CAST(SUM(np) AS BIGINT) AS n_pixels,
      |  CAST(SUM(s) AS BIGINT) AS sum_gray,
      |  TRUE AS channels_equal, TRUE AS dims_match
      |FROM allpx GROUP BY 1""".stripMargin

  /** Perceptual-hash near-duplicate detection over the binary image
    * column — the image-modality counterpart of the text dedup stack
    * (a 100 TB image corpus needs near-dup pruning as much as text
    * does). Corpus: one deterministic 32×32 gray image per doc
    * (mixed-phase pixel fabric so ids don't alias mod 256; BMP/PGM
    * containers alternate), plus a PLANTED brightness-patched twin
    * for every 10th id — in the OTHER container, so a found twin also
    * certifies cross-container hash equality. Operator:
    * [[Multimodal.perceptualHashes]] (real pixel decode → 8×8 block
    * downsample → 56-bit dHash) then [[Multimodal.nearDupByPHash]]
    * (Hamming-bucket LSH, `maxDist+1 = 4` bands of 14 bits — the
    * pigeonhole EXACTNESS guarantee, so the engine's pair set is the
    * exact distance-≤3 set and the oracle can replay it from the
    * pixel formula: hashes via LEAD over block sums, truth via the
    * all-pairs bit_count — oracle-side only; the ENGINE never goes
    * all-pairs). `n_planted_found` ≥ all twins witnesses the patch
    * stays within the radius; the band parameters are result columns
    * pinned against the pigeonhole arithmetic. */
  /** The deterministic image corpus shared by the near-dup rows: one
    * 32×32 gray image per doc (mixed-phase fabric, alternating
    * containers) + a brightness-patched cross-container twin for
    * every 10th id. */
  private def nearDupMedia(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    val W = 32
    val H = 32
    // multiplicative mix: per-image pixel step = (id+1) mod 65521, so
    // no two doc ids below 65521 share a wrap pattern — natural
    // near-collisions stay rare (an additive fabric measured ~28k
    // natural pairs at sf0.1, pushing the CC end-cap distributed at
    // the soak); the patch term perturbs only blocks (0,0)/(0,1)
    def pix(pixId: Long, patched: Boolean)(p: Int): Int =
      ((((pixId + 1) * (p + 7919)) % 65521 % 256 +
        (if (patched && p < 8) 60 else 0)) % 256).toInt
    // container rotates through pgm/bmp/png/gif quarters, and every
    // twin lands in a DIFFERENT container than its original — the
    // PNG quarter goes through the real DEFLATE decoder (r12) and
    // the GIF quarter through the real LZW decoder (r13); both are
    // LOSSLESS, so the dHash is identical to the raw-byte
    // containers' and the oracle (which replays hashes from the
    // pixel formula) is unchanged: the gate witnesses container
    // invariance across BOTH entropy-coded palette-free formats
    def enc(kind: Long, pixFn: Int => Int): Array[Byte] = kind match {
      case 0 => Multimodal.makeGrayPgm(W, H, pixFn)
      case 1 => Multimodal.makeGrayBmp(W, H, pixFn)
      case 2 => graft.scaleops.PngCodec.encodeGray(W, H,
        (x, y) => pixFn(y * W + x))
      case _ => graft.scaleops.GifCodec.encodeGray(W, H,
        (x, y) => pixFn(y * W + x))
    }
    Tables.load(s, d, "documents")
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { i =>
          val orig = Multimodal.MediaRow(i, "image",
            enc(i % 4, pix(i, patched = false)))
          if (i % 10 == 0)
            Iterator(orig, Multimodal.MediaRow(i + 10000000L, "image",
              enc((i + 1) % 4, pix(i, patched = true))))
          else Iterator(orig)
        }
      }
  }

  def mediaNearDup(s: SparkSession, d: String): DataFrame = {
    val maxDist = 3
    // hashes feed both sides of the band self-join; pairs feed the
    // total count and the planted-recall count
    val hashes = Multimodal.perceptualHashes(nearDupMedia(s, d))
      .localCheckpoint(eager = false)
    val pairs = Multimodal.nearDupByPHash(hashes, maxDist = maxDist)
      .localCheckpoint(eager = false)
    val planted = pairs.filter(col("b") === col("a") + lit(10000000L))
    hashes.agg(count(lit(1)).as("n_images"))
      .crossJoin(pairs.agg(count(lit(1)).as("n_pairs"),
        coalesce(max(col("dist")), lit(-1)).as("max_found_dist")))
      .crossJoin(planted.agg(count(lit(1)).as("n_planted_found")))
      .select(col("n_images"), col("n_pairs"), col("max_found_dist"),
        col("n_planted_found"),
        lit(maxDist + 1).as("n_bands"),
        lit(56 / (maxDist + 1)).as("band_bits"),
        lit(maxDist).as("max_dist"))
  }

  /** The hash/pair replay CTEs shared by both image near-dup
    * oracles: deterministic fabric → block sums → LEAD gradients →
    * 56-bit hashes → all-pairs distance-≤3 truth (oracle-side
    * only). */
  private val nearDupCtes: String =
    """ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
      |imgs AS (
      |  SELECT id, id AS pix_id, FALSE AS patched FROM ids
      |  UNION ALL
      |  SELECT id + 10000000, id, TRUE FROM ids WHERE id % 10 = 0),
      |bs AS (
      |  SELECT i.id, (g.p // 32) // 4 AS br, (g.p % 32) // 4 AS bc,
      |    SUM((((i.pix_id + 1) * (g.p + 7919)) % 65521 % 256
      |      + CASE WHEN i.patched AND g.p < 8 THEN 60 ELSE 0 END) % 256) AS s
      |  FROM imgs i, generate_series(0, 1023) AS g(p)
      |  GROUP BY 1, 2, 3),
      |grad AS (
      |  SELECT id, br, bc, s,
      |    LEAD(s) OVER (PARTITION BY id, br ORDER BY bc) AS s_next
      |  FROM bs),
      |hashes AS (
      |  SELECT id, CAST(SUM(CASE WHEN s_next > s
      |      THEN (CAST(1 AS BIGINT) << CAST(br * 7 + bc AS INT))
      |      ELSE 0 END) AS BIGINT) AS h
      |  FROM grad WHERE bc < 7 GROUP BY id),
      |pairs AS (
      |  SELECT a.id AS a, b.id AS b, bit_count(xor(a.h, b.h)) AS dist
      |  FROM hashes a JOIN hashes b ON a.id < b.id
      |  WHERE bit_count(xor(a.h, b.h)) <= 3)""".stripMargin

  val mediaNearDupOracle: String =
    s"""WITH $nearDupCtes
      |SELECT (SELECT COUNT(*) FROM imgs) AS n_images,
      |  (SELECT COUNT(*) FROM pairs) AS n_pairs,
      |  (SELECT COALESCE(MAX(dist), -1) FROM pairs) AS max_found_dist,
      |  (SELECT COUNT(*) FROM pairs WHERE b = a + 10000000)
      |    AS n_planted_found,
      |  4 AS n_bands, 14 AS band_bits, 3 AS max_dist""".stripMargin

  /** The image-dedup end-cap: connected components over the
    * perceptual-hash pairs, keep the min-id representative per
    * duplicate group (plus every unpaired image) — the image
    * counterpart of [[graft.scaleops.Similarity.semDedup]]'s keep
    * list. The whole keep SET is pinned, not just its size: the
    * exact sum of kept ids rides as a column (order-free integer
    * arithmetic), and `twins_all_dropped` witnesses that every
    * planted twin loses to its lower-id base through whatever
    * component it lands in. Engine CC is the size-adaptive
    * [[graft.operators.ConnectedComponents]]; the oracle replays it
    * as a recursive reach over the replayed pair set. */
  def mediaNearDupKeep(s: SparkSession, d: String): DataFrame = {
    val hashes = Multimodal.perceptualHashes(nearDupMedia(s, d))
      .localCheckpoint(eager = false)
    val pairs = Multimodal.nearDupByPHash(hashes, maxDist = 3)
    val comps = graft.operators.ConnectedComponents
      .components(pairs, "a", "b")
      .localCheckpoint(eager = false) // feeds dropped count + keep join
    val dropped = comps.filter(col("comp") =!= col("id"))
      .select(col("id").as("media_id"))
    val kept = hashes.select(col("media_id"))
      .join(dropped, Seq("media_id"), "left_anti")
      .localCheckpoint(eager = false) // feeds 3 aggregates below
    hashes.agg(count(lit(1)).as("n_images"))
      .crossJoin(dropped.agg(count(lit(1)).as("n_dropped")))
      .crossJoin(kept.agg(count(lit(1)).as("n_kept"),
        sum(col("media_id")).as("kept_id_sum")))
      .crossJoin(kept.filter(col("media_id") >= 10000000L)
        .agg((count(lit(1)) === 0).as("twins_all_dropped")))
      .select(col("n_images"), col("n_kept"), col("n_dropped"),
        col("kept_id_sum"), col("twins_all_dropped"))
  }

  val mediaNearDupKeepOracle: String =
    s"""WITH RECURSIVE $nearDupCtes,
      |edges AS (
      |  SELECT a, b FROM pairs
      |  UNION ALL SELECT b, a FROM pairs),
      |reach(id, comp) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.id),
      |cc AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
      |dropped AS (SELECT id FROM cc WHERE comp <> id),
      |kept AS (
      |  SELECT h.id FROM hashes h ANTI JOIN dropped d ON h.id = d.id)
      |SELECT (SELECT COUNT(*) FROM hashes) AS n_images,
      |  (SELECT COUNT(*) FROM kept) AS n_kept,
      |  (SELECT COUNT(*) FROM dropped) AS n_dropped,
      |  (SELECT CAST(SUM(id) AS BIGINT) FROM kept) AS kept_id_sum,
      |  (SELECT COUNT(*) FROM kept WHERE id >= 10000000) = 0
      |    AS twins_all_dropped""".stripMargin

  /** The deterministic audio corpus for the audio near-dup row: one
    * 912-sample (57 frames × 16) 8-bit mono PCM WAV per doc — the
    * same multiplicative-mix fabric as the image corpus so no two ids
    * below 65521 share a wrap pattern — plus an ONSET-PERTURBED twin
    * for every 10th id (deterministic sample edit confined to the
    * first two frames, t < 32: a click/fade-style local edit). A
    * local edit in frames 0–1 can flip only the two adjacent contour
    * gradients (bits 0 and 1), so every twin sits within Hamming
    * distance 2 ≤ maxDist BY CONSTRUCTION — the planted-recall
    * witness is a guarantee, not a tuning. */
  private def nearDupAudio(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    val N = 912 // 57 frames × 16 samples
    def samp(sampId: Long, patched: Boolean)(t: Int): Int =
      ((((sampId + 1) * (t + 7919)) % 65521 % 256 +
        (if (patched && t < 32) 60 else 0)) % 256).toInt
    Tables.load(s, d, "documents")
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { i =>
          val orig = Multimodal.MediaRow(i, "audio",
            Multimodal.makeWav8(N, samp(i, patched = false)))
          if (i % 10 == 0)
            Iterator(orig, Multimodal.MediaRow(i + 10000000L, "audio",
              Multimodal.makeWav8(N, samp(i, patched = true))))
          else Iterator(orig)
        }
      }
  }

  /** SPECTRAL audio near-dup tier (r12 verdict #3): the energy
    * contour is robust to volume but blind to PITCH — a repitched
    * re-render (octave-up master with its own loudness automation,
    * the real crawl's "same track, different rendition" case) lands
    * > 3 contour bits away and the contour tier provably misses it.
    * This row plants exactly that twin and certifies the FFT
    * ratio-constellation tier ([[Multimodal.spectralHash56]]:
    * radix-2 FFT → top-4 peak bins → quarter-octave quantized
    * consecutive log-ratios, thermometer-coded — peak RATIOS are
    * pitch-shift-invariant, the Wang-2003 relation-hash idea made
    * transposition-proof) catches it through the SAME pigeonhole
    * Hamming-band LSH. Witnesses: `contour_missed_all` is replayed
    * EXACTLY by the oracle (the clip is an integer square-wave
    * mixture — samples, frame energies, and both contour hashes
    * rebuild arithmetically in SQL); `spectral_found_all` is the
    * engine-witnessed boolean that every planted pair is in the
    * banded spectral pair set (a broken FFT/peak-picker/hash flips
    * it red). */
  def mediaAudioSpectral(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // TWO planted twin families, disjoint id classes: PITCH twins
    // (octave up, ids +10M, every 10th ≡ 0) and TIME-OFFSET twins
    // (same source captured 48 samples = 3 frames later, ids +20M,
    // every 10th ≡ 5 — r13 verdict #6). Both scramble/shift the
    // energy contour past the Hamming radius; both keep the
    // constellation hash inside it — pitch because peak RATIOS are
    // transposition-invariant, offset because the fundamentals (and
    // so the ratios) don't move when the capture window slides.
    val corpus = Tables.load(s, d, "documents")
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { i =>
          val orig = Multimodal.MediaRow(i, "audio",
            Multimodal.makeToneMixWav(i, twin = false))
          if (i % 10 == 0)
            Iterator(orig, Multimodal.MediaRow(i + 10000000L, "audio",
              Multimodal.makeToneMixWav(i, twin = true)))
          else if (i % 10 == 5)
            Iterator(orig, Multimodal.MediaRow(i + 20000000L, "audio",
              Multimodal.makeToneMixWav(i, twin = false,
                offsetSamples = 48)))
          else Iterator(orig)
        }
      }.localCheckpoint(eager = false) // feeds both fingerprint passes
    val spectral = Multimodal.spectralFingerprints(corpus)
      .localCheckpoint(eager = false)
    // Each planted family filters the LAZY pair frame with a SINGLE
    // equality (b = a + family base): Catalyst turns that two-sided
    // equality into a THIRD equi-join key of the banded self-join
    // (band, bval, media_id + base), so the certification never
    // enumerates the natural candidate set — which is enormous here
    // BY FIXTURE DESIGN (the 8-period menu yields 8 distinct ratio
    // hashes ⇒ ~8.5e9 band-bucket candidates at sf1). Measured at
    // sf1: 1.3 s per family this way; a disjunctive (OR) filter
    // cannot become a join key and scanned all candidates (42 s); an
    // r14 localCheckpoint on the full pair set was 15.5 s at sf0.1.
    // Keep the frame lazy — the specialized plan IS this row.
    val pairs = Multimodal.nearDupByPHash(spectral, maxDist = 3)
    val planted = pairs.filter(col("b") === col("a") + lit(10000000L))
    val plantedOff = pairs.filter(col("b") === col("a") + lit(20000000L))
    val contour = Multimodal.audioFingerprints(corpus)
      .localCheckpoint(eager = false)
    def twinDist(base: Long) = contour.filter(col("media_id") < 10000000L)
      .withColumnRenamed("phash", "h_orig")
      .join(contour.filter(col("media_id") >= base &&
        col("media_id") < base + 10000000L)
        .select((col("media_id") - base).as("media_id"),
          col("phash").as("h_twin")), "media_id")
      .select(bit_count(col("h_orig").bitwiseXOR(col("h_twin"))).as("cd"))
    corpus.toDF().agg(count(lit(1)).as("n_clips"),
        sum(when(col("media_id") >= 10000000L &&
          col("media_id") < 20000000L, 1L).otherwise(0L)).as("n_planted"),
        sum(when(col("media_id") >= 20000000L, 1L).otherwise(0L))
          .as("n_planted_offset"))
      .crossJoin(twinDist(10000000L)
        .agg(min(col("cd") > 3).as("contour_missed_all")))
      .crossJoin(twinDist(20000000L)
        .agg(min(col("cd") > 3).as("contour_missed_all_offset")))
      .crossJoin(planted.agg(count(lit(1)).as("n_spectral_planted")))
      .crossJoin(plantedOff.agg(count(lit(1)).as("n_spectral_off")))
      .select(col("n_clips"), col("n_planted"), col("n_planted_offset"),
        col("contour_missed_all"), col("contour_missed_all_offset"),
        (col("n_spectral_planted") === col("n_planted"))
          .as("spectral_found_all"),
        (col("n_spectral_off") === col("n_planted_offset"))
          .as("spectral_found_all_offset"),
        lit(4).as("n_bands"), lit(14).as("band_bits"),
        lit(3).as("max_dist"))
  }

  val mediaAudioSpectralOracle: String =
    """WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
      |pids AS (SELECT id FROM ids WHERE id % 10 = 0),
      |oids AS (SELECT id FROM ids WHERE id % 10 = 5),
      |clips AS (
      |  SELECT id, FALSE AS twin FROM pids
      |  UNION ALL SELECT id, TRUE FROM pids),
      |sp AS (
      |  SELECT c.id, c.twin, k.k,
      |    list_extract([12,16,20,24,28,32,40,48],
      |      ((id % 8 + k.k * (1 + 2 * (id % 4))) % 8) + 1)
      |      // (CASE WHEN c.twin THEN 2 ELSE 1 END) AS p
      |  FROM clips c, generate_series(0, 3) AS k(k)),
      |w AS (
      |  SELECT id, twin, t.t,
      |    SUM(CASE WHEN t.t % p < p // 2 THEN 30 ELSE -30 END) AS wv
      |  FROM sp, generate_series(0, 911) AS t(t)
      |  GROUP BY 1, 2, 3),
      |fe AS (
      |  SELECT id, twin, t // 16 AS f,
      |    SUM(ABS((140 + ((id + 1) *
      |        ((CASE WHEN twin THEN (2 * (t // 16) + 5) % 57
      |          ELSE t // 16 END) + 13)) % 97 % 8)
      |      * (wv + 121) // 140 - 128)) AS e
      |  FROM w GROUP BY 1, 2, 3),
      |grad AS (
      |  SELECT id, twin, f, e,
      |    LEAD(e) OVER (PARTITION BY id, twin ORDER BY f) AS e_next
      |  FROM fe),
      |hashes AS (
      |  SELECT id, twin, CAST(SUM(CASE WHEN e_next > e
      |      THEN (CAST(1 AS BIGINT) << CAST(f AS INT))
      |      ELSE 0 END) AS BIGINT) AS h
      |  FROM grad WHERE f < 56 GROUP BY id, twin),
      |missed AS (
      |  SELECT BOOL_AND(bit_count(xor(o.h, tw.h)) > 3) AS contour_missed_all
      |  FROM hashes o JOIN hashes tw
      |    ON o.id = tw.id AND NOT o.twin AND tw.twin),
      |-- TIME-OFFSET family (offset = 48 samples = 3 frames): the
      |-- twin's frame energy is EXACTLY e(f+3) of the original, so
      |-- ONE energy table over frames 0..59 (t to 959) yields both
      |-- hashes — orig bits from e(f+1)>e(f), twin bits from
      |-- e(f+4)>e(f+3)
      |osp AS (
      |  SELECT o.id, k.k,
      |    list_extract([12,16,20,24,28,32,40,48],
      |      ((id % 8 + k.k * (1 + 2 * (id % 4))) % 8) + 1) AS p
      |  FROM oids o, generate_series(0, 3) AS k(k)),
      |ow AS (
      |  SELECT id, t.t,
      |    SUM(CASE WHEN t.t % p < p // 2 THEN 30 ELSE -30 END) AS wv
      |  FROM osp, generate_series(0, 959) AS t(t)
      |  GROUP BY 1, 2),
      |ofe AS (
      |  SELECT id, t // 16 AS f,
      |    SUM(ABS((140 + ((id + 1) * (t // 16 + 13)) % 97 % 8)
      |      * (wv + 121) // 140 - 128)) AS e
      |  FROM ow GROUP BY 1, 2),
      |ograd AS (
      |  SELECT id, f, e,
      |    LEAD(e, 1) OVER (PARTITION BY id ORDER BY f) AS e1,
      |    LEAD(e, 3) OVER (PARTITION BY id ORDER BY f) AS e3,
      |    LEAD(e, 4) OVER (PARTITION BY id ORDER BY f) AS e4
      |  FROM ofe),
      |ohashes AS (
      |  SELECT id,
      |    CAST(SUM(CASE WHEN e1 > e
      |      THEN (CAST(1 AS BIGINT) << CAST(f AS INT)) ELSE 0 END)
      |      AS BIGINT) AS h_orig,
      |    CAST(SUM(CASE WHEN e4 > e3
      |      THEN (CAST(1 AS BIGINT) << CAST(f AS INT)) ELSE 0 END)
      |      AS BIGINT) AS h_off
      |  FROM ograd WHERE f < 56 GROUP BY id),
      |omissed AS (
      |  SELECT BOOL_AND(bit_count(xor(h_orig, h_off)) > 3)
      |      AS contour_missed_all_offset
      |  FROM ohashes)
      |SELECT (SELECT COUNT(*) FROM ids) + (SELECT COUNT(*) FROM pids)
      |    + (SELECT COUNT(*) FROM oids) AS n_clips,
      |  (SELECT COUNT(*) FROM pids) AS n_planted,
      |  (SELECT COUNT(*) FROM oids) AS n_planted_offset,
      |  contour_missed_all, contour_missed_all_offset,
      |  TRUE AS spectral_found_all, TRUE AS spectral_found_all_offset,
      |  4 AS n_bands, 14 AS band_bits, 3 AS max_dist
      |FROM missed, omissed""".stripMargin

  /** Audio near-duplicate detection — the audio-modality counterpart
    * of [[mediaNearDup]] (the r10 verdict's symmetric gap): REAL WAV
    * chunk-walk decode → per-frame |s−128| loudness → 56-bit
    * energy-contour fingerprint ([[Multimodal.audioFingerprint56]])
    * → the SAME Hamming-band LSH operator with the pigeonhole
    * exactness guarantee (4 bands of 14 bits, bands = maxDist+1 ⇒
    * banding loses nothing; the engine's pair set is the exact
    * distance-≤3 set). The oracle replays fingerprints from the
    * sample formula (frame sums + LEAD gradients) and truth via the
    * all-pairs bit_count — oracle-side only; the engine never goes
    * all-pairs. */
  def mediaAudioNearDup(s: SparkSession, d: String): DataFrame = {
    val maxDist = 3
    val hashes = Multimodal.audioFingerprints(nearDupAudio(s, d))
      .localCheckpoint(eager = false)
    val pairs = Multimodal.nearDupByPHash(hashes, maxDist = maxDist)
      .localCheckpoint(eager = false)
    val planted = pairs.filter(col("b") === col("a") + lit(10000000L))
    hashes.agg(count(lit(1)).as("n_clips"))
      .crossJoin(pairs.agg(count(lit(1)).as("n_pairs"),
        coalesce(max(col("dist")), lit(-1)).as("max_found_dist")))
      .crossJoin(planted.agg(count(lit(1)).as("n_planted_found")))
      .select(col("n_clips"), col("n_pairs"), col("max_found_dist"),
        col("n_planted_found"),
        lit(maxDist + 1).as("n_bands"),
        lit(56 / (maxDist + 1)).as("band_bits"),
        lit(maxDist).as("max_dist"))
  }

  val mediaAudioNearDupOracle: String =
    """WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
      |auds AS (
      |  SELECT id, id AS samp_id, FALSE AS patched FROM ids
      |  UNION ALL
      |  SELECT id + 10000000, id, TRUE FROM ids WHERE id % 10 = 0),
      |fe AS (
      |  SELECT a.id, g.t // 16 AS f,
      |    SUM(ABS((((a.samp_id + 1) * (g.t + 7919)) % 65521 % 256
      |      + CASE WHEN a.patched AND g.t < 32 THEN 60 ELSE 0 END) % 256
      |      - 128)) AS e
      |  FROM auds a, generate_series(0, 911) AS g(t)
      |  GROUP BY 1, 2),
      |grad AS (
      |  SELECT id, f, e, LEAD(e) OVER (PARTITION BY id ORDER BY f) AS e_next
      |  FROM fe),
      |hashes AS (
      |  SELECT id, CAST(SUM(CASE WHEN e_next > e
      |      THEN (CAST(1 AS BIGINT) << CAST(f AS INT))
      |      ELSE 0 END) AS BIGINT) AS h
      |  FROM grad WHERE f < 56 GROUP BY id),
      |pairs AS (
      |  SELECT a.id AS a, b.id AS b, bit_count(xor(a.h, b.h)) AS dist
      |  FROM hashes a JOIN hashes b ON a.id < b.id
      |  WHERE bit_count(xor(a.h, b.h)) <= 3)
      |SELECT (SELECT COUNT(*) FROM auds) AS n_clips,
      |  (SELECT COUNT(*) FROM pairs) AS n_pairs,
      |  (SELECT COALESCE(MAX(dist), -1) FROM pairs) AS max_found_dist,
      |  (SELECT COUNT(*) FROM pairs WHERE b = a + 10000000)
      |    AS n_planted_found,
      |  4 AS n_bands, 14 AS band_bits, 3 AS max_dist""".stripMargin

  /** The deterministic video corpus: one 4-frame clip of 32×32
    * concatenated binary PGMs per doc (per-frame phase mix so frames
    * differ), plus a FRAME-0-PATCHED twin for every 10th id — the
    * re-encoded-with-a-changed-title-card scenario. The patch is the
    * image fabric's own p<8 brightness edit (affects blocks
    * (0,0)/(0,1) only ⇒ ≤ 3 dHash bits), so the twin matches on all
    * 4 aligned frames BY CONSTRUCTION (3 identical + 1 within the
    * radius) and planted recall is a guarantee. */
  private def nearDupVideo(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    val W = 32
    val H = 32
    val F = 4
    def pix(pixId: Long, patched: Boolean)(f: Int, p: Int): Int =
      ((((pixId + 1) * (p + 7919 + f * 4099)) % 65521 % 256 +
        (if (patched && f == 0 && p < 8) 60 else 0)) % 256).toInt
    // container rotation (r14): every third clip ships as an ANIMATED
    // GIF instead of a concatenated-PGM stream, and each planted twin
    // ships in the OTHER container — a found twin therefore also
    // witnesses that identical frame pixels hash identically through
    // the GifCodec.decodeFrames walk and the raw PGM walk (the
    // image near-dup container-invariance rule, extended to video).
    // GIF is lossless for gray ≤256 values, so the oracle's
    // pixel-formula replay is container-blind.
    def clip(pixId: Long, patched: Boolean, gif: Boolean): Array[Byte] =
      if (gif)
        graft.scaleops.GifCodec.encodeGrayAnimation(W, H, F,
          fr => (x, y) => pix(pixId, patched)(fr, y * W + x))
      else Multimodal.makeMultiPgm(F, W, H, pix(pixId, patched))
    Tables.load(s, d, "documents")
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { i =>
          val origGif = i % 3 == 2
          val orig = Multimodal.MediaRow(i, "video",
            clip(i, patched = false, gif = origGif))
          if (i % 10 == 0)
            Iterator(orig, Multimodal.MediaRow(i + 10000000L, "video",
              clip(i, patched = true, gif = !origGif)))
          else Iterator(orig)
        }
      }
  }

  /** Video near-duplicate detection — the third modality of the
    * near-dup family ([[mediaNearDup]] images, [[mediaAudioNearDup]]
    * audio): a REAL sequential container walk decodes each clip's
    * concatenated PGM frames ([[Multimodal.multiPgmFrameHashes]] —
    * every frame self-describes via its header), per-frame 56-bit
    * dHashes feed a (frame_idx, band, bval)-keyed Hamming-band LSH
    * with the per-frame pigeonhole guarantee, and two clips pair when
    * ≥ 3 of 4 aligned frame positions agree within distance 3 — the
    * per-(pair, frame) match relation is exact, so the matched-frame
    * counts and the clip pair set are exact. The oracle replays
    * per-frame hashes from the pixel formula (block sums + LEAD
    * gradients over (id, frame)) and clip truth via the all-pairs
    * aligned-frame count — oracle-side only. */
  def mediaVideoNearDup(s: SparkSession, d: String): DataFrame = {
    val maxDist = 3
    val minMatch = 3
    val hashes = Multimodal.videoFrameHashes(nearDupVideo(s, d))
      .localCheckpoint(eager = false) // feeds both sides + counts
    val pairs = Multimodal.nearDupByFrameHashes(hashes, maxDist, minMatch)
      .localCheckpoint(eager = false)
    val planted = pairs.filter(col("b") === col("a") + lit(10000000L))
    hashes.agg(countDistinct(col("media_id")).as("n_clips"),
        count(lit(1)).as("n_frames"))
      .crossJoin(pairs.agg(count(lit(1)).as("n_pairs"),
        coalesce(min(col("n_matched_frames")), lit(-1)).as("min_matched")))
      .crossJoin(planted.agg(count(lit(1)).as("n_planted_found")))
      .select(col("n_clips"), col("n_frames"), col("n_pairs"),
        col("min_matched"), col("n_planted_found"),
        lit(maxDist + 1).as("n_bands"),
        lit(56 / (maxDist + 1)).as("band_bits"),
        lit(maxDist).as("max_dist"), lit(minMatch).as("min_match"))
  }

  val mediaVideoNearDupOracle: String =
    """WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
      |clips AS (
      |  SELECT id, id AS pix_id, FALSE AS patched FROM ids
      |  UNION ALL
      |  SELECT id + 10000000, id, TRUE FROM ids WHERE id % 10 = 0),
      |bs AS (
      |  SELECT c.id, gf.f, (gp.p // 32) // 4 AS br, (gp.p % 32) // 4 AS bc,
      |    SUM((((c.pix_id + 1) * (gp.p + 7919 + gf.f * 4099)) % 65521 % 256
      |      + CASE WHEN c.patched AND gf.f = 0 AND gp.p < 8
      |        THEN 60 ELSE 0 END) % 256) AS s
      |  FROM clips c, generate_series(0, 3) AS gf(f),
      |    generate_series(0, 1023) AS gp(p)
      |  GROUP BY 1, 2, 3, 4),
      |grad AS (
      |  SELECT id, f, br, bc, s,
      |    LEAD(s) OVER (PARTITION BY id, f, br ORDER BY bc) AS s_next
      |  FROM bs),
      |hashes AS (
      |  SELECT id, f, CAST(SUM(CASE WHEN s_next > s
      |      THEN (CAST(1 AS BIGINT) << CAST(br * 7 + bc AS INT))
      |      ELSE 0 END) AS BIGINT) AS h
      |  FROM grad WHERE bc < 7 GROUP BY id, f),
      |fmatch AS (
      |  SELECT a.id AS a, b.id AS b, a.f
      |  FROM hashes a JOIN hashes b ON a.id < b.id AND a.f = b.f
      |  WHERE bit_count(xor(a.h, b.h)) <= 3),
      |pairs AS (
      |  SELECT a, b, COUNT(*) AS nm FROM fmatch
      |  GROUP BY a, b HAVING COUNT(*) >= 3)
      |SELECT (SELECT COUNT(*) FROM clips) AS n_clips,
      |  (SELECT COUNT(*) FROM hashes) AS n_frames,
      |  (SELECT COUNT(*) FROM pairs) AS n_pairs,
      |  (SELECT COALESCE(MIN(nm), -1) FROM pairs) AS min_matched,
      |  (SELECT COUNT(*) FROM pairs WHERE b = a + 10000000)
      |    AS n_planted_found,
      |  4 AS n_bands, 14 AS band_bits, 3 AS max_dist, 3 AS min_match""".stripMargin

  val all: Seq[Q] = Seq(
    Q("multimodal_bytes", mediaBytes, Some(mediaBytesOracle)),
    Q("multimodal_pipeline", mediaPipeline, Some(mediaPipelineOracle)),
    Q("multimodal_decode", mediaDecode, Some(mediaDecodeOracle)),
    Q("multimodal_neardup", mediaNearDup, Some(mediaNearDupOracle)),
    Q("multimodal_neardup_keep", mediaNearDupKeep, Some(mediaNearDupKeepOracle)),
    Q("multimodal_audio_neardup", mediaAudioNearDup,
      Some(mediaAudioNearDupOracle)),
    Q("multimodal_audio_spectral", mediaAudioSpectral,
      Some(mediaAudioSpectralOracle)),
    Q("multimodal_video_neardup", mediaVideoNearDup,
      Some(mediaVideoNearDupOracle)))
}
