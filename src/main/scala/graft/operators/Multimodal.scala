package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column handling (SURVEY.md §2.3 L12).
  *
  * Media payloads are opaque `binary` columns + typed metadata. The
  * Spark-side plumbing — schema, batching, partition-parallel decode —
  * is real, and IMAGE payloads decode for real through the JDK's
  * built-in `javax.imageio` (PNG/BMP/GIF/JPEG; see [[decodeImage]],
  * pinned by MultimodalSpec on an in-memory PNG). Non-image payloads
  * fall back to the deterministic [[fakeDecode]] stub (no audio/video
  * codec ships in this environment); a real deployment swaps that for
  * JNI/javacpp codec calls without touching the plumbing.
  */
object Multimodal {

  // javax.imageio defaults to DISK-backed cache streams: every
  // ImageIO.read/write over an in-memory byte stream creates (and
  // deletes) a temp FILE via FileCacheImageInput/OutputStream. All
  // payloads here are in-memory byte arrays, so the file round-trip
  // is pure overhead — memory-cached streams are byte-identical
  // codec-wise. Process-wide, set once when the operator class loads
  // (executors load it with the task closure).
  javax.imageio.ImageIO.setUseCache(false)

  case class BlobRow(doc_id: Long, blob: Array[Byte])
  case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                           n_frames: Int, mean_byte: Double)

  /** REAL image decode via the JDK's built-in `javax.imageio` (PNG,
    * BMP, GIF, JPEG — no external codec library needed): returns
    * (width, height, 1, mean 8-bit luminance) for a payload that
    * parses as an image, None otherwise. Text payloads (the
    * testdata's stand-in blobs) can never decode — no image format's
    * full structure is valid UTF-8 — so [[decodeFeatures]] falls back
    * to the deterministic [[fakeDecode]] the oracle replicates.
    */
  /** The ONE codec entry point: every image operator (m02 decode, m05
    * roundtrip, m06 resize) decodes through here, so "the production
    * path" the specs certify is a single code path, not per-operator
    * ImageIO calls that could silently diverge.
    */
  private[graft] def decodeBuffered(blob: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob)))
    catch { case _: Throwable => None }

  private[graft] def decodeImage(blob: Array[Byte]): Option[(Int, Int, Int, Double)] =
    try {
      val img = decodeBuffered(blob).orNull
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        // integer Rec.601 luma; one long accumulator, no FP drift
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some((w, h, 1, if (n == 0) 0.0 else sum.toDouble / n))
      }
    } catch { case _: Throwable => None }

  /** STUB decoder: deterministic pseudo-metadata from the payload
    * bytes (stands in for codecs imageio lacks — audio/video).
    */
  private[graft] def fakeDecode(blob: Array[Byte]): (Int, Int, Int, Double) = {
    val b0 = if (blob.nonEmpty) blob(0) & 0xff else 0
    val b1 = if (blob.length > 1) blob(1) & 0xff else 0
    var sum = 0L
    var i = 0
    while (i < blob.length) { sum += blob(i) & 0xff; i += 1 }
    val mean = if (blob.isEmpty) 0.0 else sum.toDouble / blob.length
    (64 + (b0 % 64), 64 + (b1 % 64), 1 + (blob.length % 8), mean)
  }

  /** Batched partition-parallel decode: groups rows into fixed-size
    * batches inside each partition (the shape a GPU/codec library
    * wants), decodes each batch, emits typed features. No shuffle —
    * decode parallelism is the scan's partitioning, which at 100 TB
    * you control with maxPartitionBytes / repartition upstream.
    */
  def decodeFeatures(blobs: Dataset[BlobRow], batchSize: Int = 32): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // imageio handles real image payloads in-JVM; a GPU codec
        // would decode `batch` in one device call instead
        batch.map { row =>
          val (w, h, f, m) = decodeImage(row.blob).getOrElse(fakeDecode(row.blob))
          // floor(x+0.5), not rint: half-up is the same IEEE op
          // sequence in every engine, so the oracle can replicate it
          // (rint's half-to-even has no portable SQL equivalent).
          MediaFeatures(row.doc_id, w, h, f, math.floor(m * 10000 + 0.5) / 10000)
        }
      }
    }
  }

  /** L63 — REAL-codec roundtrip audit: per id, build a deterministic
    * `side`×`side` RGB image (pixel channels are integer formulas of
    * (id, x, y)), ENCODE it through the JDK's real PNG writer, then
    * run the bytes back through [[decodeImage]] — the production
    * decode path — and emit the decoded dimensions + integer-luma
    * mean. PNG is lossless 8-bit RGB, so the decoded stats equal the
    * formula's stats exactly; the DuckDB oracle replays the FORMULA
    * (no codec needed) and thereby certifies the whole encode→decode
    * plumbing value-for-value — the strongest oracle a binary codec
    * path can have. (Encoded byte length is encoder-dependent and
    * deliberately not exposed.)
    *
    * Scale shape: pure mapPartitions — zero shuffle; decode
    * parallelism is the scan's partitioning, as in [[decodeFeatures]].
    */
  /** Deterministic side×side RGB test image for id: pixel channels
    * are integer formulas of (sid, x, y). The id is bounded BEFORE
    * the channel products: id*31 would wrap silently in Long for
    * |id| ≳ 3e17, while the oracle's BIGINT multiplication raises
    * out-of-range instead of wrapping — the two engines would diverge
    * exactly when it matters. floorMod into [0, 2^31) keeps every
    * product < 2^36; the oracle mirrors the same pmod.
    */
  private[graft] def formulaPng(id: Long, side: Int): Array[Byte] = {
    val sid = Math.floorMod(id, 2147483648L)
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        val r = Math.floorMod(sid * 31 + x * 7 + y * 13, 256).toInt
        val g = Math.floorMod(sid * 17 + x * 3 + y * 5, 256).toInt
        val b = Math.floorMod(sid * 11 + x * 19 + y * 23, 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "png", baos))
      throw new IllegalStateException(s"no PNG writer for id $id")
    baos.toByteArray
  }

  /** [[formulaPng]] with CONTROLLED near-duplicates for the
    * perceptual-dedup path (m14): ids share an image GROUP
    * (id div 4) and differ only by a one-pixel red-channel bump per
    * VARIANT (id mod 4) — the deterministic stand-in for re-encoded
    * /lightly-edited copies of the same picture that flood crawled
    * image corpora. floorDiv/floorMod so the oracle's `//`/pmod
    * replay is exact for any id.
    */
  private[graft] def formulaPngVariant(id: Long, side: Int): Array[Byte] = {
    val sid = Math.floorMod(Math.floorDiv(id, 4L), 2147483648L)
    val variant = Math.floorMod(id, 4L).toInt
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        var r = Math.floorMod(sid * 31 + x * 7 + y * 13, 256).toInt
        if (variant > 0 && x == variant && y == 0) r = (r + 100) % 256
        val g = Math.floorMod(sid * 17 + x * 3 + y * 5, 256).toInt
        val b = Math.floorMod(sid * 11 + x * 19 + y * 23, 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "png", baos))
      throw new IllegalStateException(s"no PNG writer for id $id")
    baos.toByteArray
  }

  /** 8×8 integer luma grid of a decoded image, row-major (j = y·8+x)
    * — the shared front end of both perceptual hashes (m14 aHash, m15
    * pHash): Rec.601 integer luma per pixel, no FP.
    */
  private[graft] def lumaGrid(img: java.awt.image.BufferedImage,
                              side: Int): Array[Long] = {
    val lum = new Array[Long](side * side)
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        val rgb = img.getRGB(x, y)
        lum(y * side + x) = (((rgb >> 16) & 0xff) * 299 +
          ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        x += 1
      }
      y += 1
    }
    lum
  }

  /** aHash over a 64-pixel luma grid as 4×16-bit band values: bit j
    * set iff pixel j's luma exceeds the image mean — the comparison
    * is `luma·64 > Σluma`, all integer, no division.
    */
  private[graft] def aHashBands(lum: Array[Long]): Array[Long] = {
    var s = 0L
    var j = 0
    while (j < 64) { s += lum(j); j += 1 }
    val bands = new Array[Long](4)
    j = 0
    while (j < 64) {
      if (lum(j) * 64 > s) bands(j / 16) |= 1L << (j % 16)
      j += 1
    }
    bands
  }

  /** Fixed-point DCT-II basis, `dctK(u)(x) = round(10⁴·cos((2x+1)uπ/16))`
    * — an integer constant table, so the m15 pHash is EXACT integer
    * arithmetic end to end (the TextRank/LinkGraph discipline) and an
    * external SQL oracle replays it from the same 9 literals. Only
    * the SIGN of each DCT coefficient is consumed, and the DCT's
    * α(u)α(v) normalization factors are strictly positive, so
    * dropping them loses nothing.
    */
  private[graft] val dctK: Array[Array[Long]] = {
    val base = Array(10000L, 9808L, 9239L, 8315L, 7071L, 5556L, 3827L, 1951L, 0L)
    Array.tabulate(8, 8) { (u, x) =>
      val m = ((2 * x + 1) * u) % 32
      val r = math.min(m, 32 - m)
      if (r <= 8) base(r) else -base(16 - r)
    }
  }

  /** pHash over a 64-pixel luma grid as 4×16-bit band values: bit
    * j = u·8+v set iff the (u,v) DCT-II coefficient is positive,
    * computed by the separable two-pass row/column transform in
    * exact integer arithmetic (magnitudes ≤ 255·10⁴·10⁴·64 ≈ 1.6e12,
    * far inside Long).
    *
    * Why this beats aHash as the robust near-dup tier: for every
    * u ≠ 0 the basis row sums to ZERO exactly (the rounded table
    * keeps the ±symmetry), so a global brightness shift — adding c
    * to every pixel — changes no coefficient with u≠0 or v≠0, and a
    * contrast scale multiplies all coefficients by a positive
    * factor: the 63 non-DC sign bits are INVARIANT under both, by
    * integer identity, not approximately (PHashSpec pins it).
    * aHash's mean threshold, by contrast, flips en masse when a
    * nonlinear/rounded edit collapses pixels that straddle the mean
    * (the alternating-grid case in the spec: aHash Hamming 32, pHash
    * Hamming 0).
    */
  private[graft] def pHashBands(lum: Array[Long]): Array[Long] = {
    // row pass: t(u)(y) = Σ_x lum(y·8+x) · K(u,x)
    val t = Array.ofDim[Long](8, 8)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0L
        var x = 0
        while (x < 8) { acc += lum(y * 8 + x) * dctK(u)(x); x += 1 }
        t(u)(y) = acc
        y += 1
      }
      u += 1
    }
    // column pass + sign bits: S(u,v) = Σ_y t(u)(y) · K(v,y)
    val bands = new Array[Long](4)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var y = 0
        while (y < 8) { s += t(u)(y) * dctK(v)(y); y += 1 }
        if (s > 0) { val j = u * 8 + v; bands(j / 16) |= 1L << (j % 16) }
        v += 1
      }
      u += 1
    }
    bands
  }

  /** Shared multi-index-banding tail of m14/m15 (Norouzi 2012): the
    * 4 disjoint 16-bit bands make candidate generation pigeonhole-
    * exact at Hamming ≤ 3, the band self-join ships 4 longs per
    * image, and the exact xor+bit_count verify closes it. Persists
    * the hash relation for the join's two sides and RELEASES it
    * before returning (the pair result is localCheckpoint'd eagerly)
    * — the operator owns its cache entry, no caller clearCache
    * contract.
    */
  private def bandedHammingPairs(hashesIn: DataFrame, maxHamming: Int,
                                 cap: Option[Int]): DataFrame = {
    val hashes = hashesIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = hashes.select(col("doc_id"),
      col("v0"), col("v1"), col("v2"), col("v3"),
      posexplode(array(col("v0"), col("v1"), col("v2"), col("v3")))
        .as(Seq("bidx", "bv")))
    val capped = cap.fold(banded) { c =>
      val keep = banded.groupBy("bidx", "bv").agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= c).drop("__n")
      banded.join(keep, Seq("bidx", "bv"))
    }
    val a = capped.select(col("doc_id").as("id_a"), col("bidx"), col("bv"),
      col("v0").as("a0"), col("v1").as("a1"), col("v2").as("a2"), col("v3").as("a3"))
    val b = capped.select(col("doc_id").as("id_b"), col("bidx"), col("bv"),
      col("v0").as("b0"), col("v1").as("b1"), col("v2").as("b2"), col("v3").as("b3"))
    val pairs = a.join(b, Seq("bidx", "bv"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming",
        expr("bit_count(a0 ^ b0) + bit_count(a1 ^ b1) + " +
          "bit_count(a2 ^ b2) + bit_count(a3 ^ b3)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .distinct()
    val out = pairs.localCheckpoint(true)
    hashes.unpersist(false)
    out
  }

  /** L109 — perceptual-hash image near-dup pairs (the LAION-style
    * image-dedup pass: re-encoded or lightly-edited copies of one
    * picture collide, distinct pictures don't): REAL-codec decode of
    * [[formulaPngVariant]] → 64-bit aHash (average hash — bit j set
    * iff pixel j's integer luma exceeds the image mean; the
    * comparison is `luma·64 > Σluma`, all integer, no division) →
    * multi-index banding (Norouzi 2012: 4 disjoint 16-bit bands; by
    * pigeonhole any pair within Hamming ≤ 3 matches EXACTLY in at
    * least one band, so candidate generation is exact, never
    * recall-lossy) → exact Hamming verify via xor+bit_count ≤
    * `maxHamming`.
    *
    * Scale shape: hashing is a zero-shuffle map over the decode scan
    * (the 100 TB hash pass is embarrassingly parallel); the
    * candidate self-join shuffles 4 longs per image on (band,
    * value). `cap = None` here because the oracle hash-checks the
    * EXACT pair set; production passes a cap — a hot band bucket
    * (solid-color images) makes the self-join quadratic, the d26
    * governance rule — which drops only provably-hot buckets.
    * All-integer output → fully oracle-replayable from the pixel
    * formula (no codec in the oracle — the m05 certification
    * contract).
    */
  def imageNearDupPairs(ids: Dataset[java.lang.Long], side: Int = 8,
                        maxHamming: Int = 3,
                        cap: Option[Int] = None): DataFrame = {
    require(side * side == 64, "aHash banding is defined for 8x8 (64-bit) hashes")
    import ids.sparkSession.implicits._
    val hashes = ids.mapPartitions { it =>
      it.map { boxedId =>
        val id: Long = boxedId
        val img = decodeBuffered(formulaPngVariant(id, side)).getOrElse(
          throw new IllegalStateException(s"PNG decode failed for id $id"))
        val bands = aHashBands(lumaGrid(img, side))
        (id, bands(0), bands(1), bands(2), bands(3))
      }
    }.toDF("doc_id", "v0", "v1", "v2", "v3")
    bandedHammingPairs(hashes, maxHamming, cap)
  }

  /** L112 — DCT perceptual-hash (pHash) image near-dup pairs: the
    * robust tier above m14's aHash. Same REAL-codec decode of
    * [[formulaPngVariant]], same multi-index banding + exact verify
    * ([[bandedHammingPairs]]); the hash is [[pHashBands]] — sign of
    * each 8×8 DCT-II coefficient in exact fixed-point integer
    * arithmetic, so the 63 non-DC bits are invariant BY INTEGER
    * IDENTITY under global brightness shift and contrast scale,
    * where aHash's mean threshold flips en masse on rounded edits
    * (PHashSpec pins both directions). Fully oracle-replayable from
    * the pixel formula + the 9-literal cosine table — no codec, no
    * floating point in the oracle.
    *
    * Scale shape identical to m14: zero-shuffle hashing over the
    * decode scan, the self-join ships 4 longs per image, `cap` drops
    * provably-hot band buckets (d26 governance) in production.
    */
  def imagePHashNearDupPairs(ids: Dataset[java.lang.Long], side: Int = 8,
                             maxHamming: Int = 3,
                             cap: Option[Int] = None): DataFrame = {
    require(side == 8, "the pHash DCT is defined over the 8x8 luma grid")
    import ids.sparkSession.implicits._
    val hashes = ids.mapPartitions { it =>
      it.map { boxedId =>
        val id: Long = boxedId
        val img = decodeBuffered(formulaPngVariant(id, side)).getOrElse(
          throw new IllegalStateException(s"PNG decode failed for id $id"))
        val bands = pHashBands(lumaGrid(img, side))
        (id, bands(0), bands(1), bands(2), bands(3))
      }
    }.toDF("doc_id", "v0", "v1", "v2", "v3")
    bandedHammingPairs(hashes, maxHamming, cap)
  }

  def imageRoundtripStats(ids: Dataset[java.lang.Long],
                          side: Int = 8): DataFrame = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      it.map { boxedId =>
        val id: Long = boxedId
        val (w, h, _, m) = decodeImage(formulaPng(id, side)).getOrElse(
          throw new IllegalStateException(s"PNG roundtrip failed for id $id"))
        (id, w, h, math.floor(m * 10000 + 0.5) / 10000)
      }
    }.toDF("doc_id", "width", "height", "mean_luma")
  }

  /** L87 — ViT-style PATCHIFY over the real-codec decode: decode the
    * PNG through the production path and split it into non-
    * overlapping `patch`×`patch` tiles (the ViT/CLIP preprocessing
    * front end — every vision-tower pipeline's first op after
    * decode), emitting per-patch integer Rec.601 luma sum/min/max in
    * (patch_row, patch_col) grid order. All-integer features → the
    * oracle replays the pixel formula GROUPED BY patch coordinates,
    * so a decode bug OR a tiling off-by-one (the classic patchify
    * defect) is a hash mismatch. Computed inside the decode
    * mapPartitions pass — zero shuffle; patchifying 100 TB of images
    * is a map job whose parallelism is the blob scan's partitioning.
    * Production swaps the per-patch feature for the float
    * normalize-and-flatten ViT expects on the same plumbing.
    */
  def imagePatchStats(ids: Dataset[java.lang.Long], side: Int = 8,
                      patch: Int = 4): DataFrame = {
    require(patch >= 1 && side % patch == 0,
      s"side $side must be a multiple of patch $patch")
    import ids.sparkSession.implicits._
    val np = side / patch
    ids.flatMap { boxedId =>
      val id: Long = boxedId
      val img = decodeBuffered(formulaPng(id, side)).getOrElse(
        throw new IllegalStateException(s"PNG decode failed for id $id"))
      if (img.getWidth != side || img.getHeight != side)
        throw new IllegalStateException(
          s"decoded ${img.getWidth}x${img.getHeight}, expected ${side}x$side for id $id")
      for (py <- 0 until np; px <- 0 until np) yield {
        var sum = 0L; var mn = 255L; var mx = 0L
        var y = py * patch
        while (y < (py + 1) * patch) {
          var x = px * patch
          while (x < (px + 1) * patch) {
            val rgb = img.getRGB(x, y)
            val l = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              ((rgb & 0xff) * 114)) / 1000
            sum += l; if (l < mn) mn = l; if (l > mx) mx = l
            x += 1
          }
          y += 1
        }
        (id, py, px, sum, mn, mx)
      }
    }.toDF("doc_id", "patch_row", "patch_col", "sum_luma", "min_luma", "max_luma")
  }

  /** L91 — scene-cut detection over real-codec frame decodes (the
    * video keyframe-selection front end — the shot-boundary pass
    * every video curation pipeline runs before sampling frames for
    * captioning/embedding): each doc is a deterministic `nFrames`-
    * frame clip (frame f's image = the pixel formula at seed
    * sid₀·97+f, each frame encoded AND decoded through the real PNG
    * codec), per-frame integer luma sum, a cut wherever consecutive
    * frames differ by more than `threshold` — the classic
    * sum-of-absolute-differences detector in its integer form, so
    * the oracle replays frame sums + lag + threshold exactly. Emits
    * per-doc frame/cut counts and the first cut index (−1 = none).
    * The doc id is bounded BEFORE the frame-seed product (the m05
    * lesson: Long wraparound vs BIGINT overflow divergence). Zero
    * shuffle — decoding and differencing 100 TB of video is a map
    * job; production swaps the formula frames for codec
    * frame-extraction on the same per-doc loop.
    */
  def sceneCuts(ids: Dataset[java.lang.Long], side: Int = 8,
                nFrames: Int = 12, threshold: Long = 3000L): DataFrame = {
    require(nFrames >= 2)
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      it.map { boxedId =>
        val id: Long = boxedId
        val sid0 = Math.floorMod(id, 2147483648L)
        val sums = (0 until nFrames).map { f =>
          val img = decodeBuffered(formulaPng(sid0 * 97L + f, side)).getOrElse(
            throw new IllegalStateException(s"PNG decode failed for id $id frame $f"))
          if (img.getWidth != side || img.getHeight != side)
            throw new IllegalStateException(
              s"decoded ${img.getWidth}x${img.getHeight}, expected ${side}x$side for id $id frame $f")
          var sum = 0L
          var y = 0
          while (y < side) {
            var x = 0
            while (x < side) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                ((rgb & 0xff) * 114)) / 1000
              x += 1
            }
            y += 1
          }
          sum
        }
        var cuts = 0L
        var first = -1L
        var f = 1
        while (f < nFrames) {
          if (math.abs(sums(f) - sums(f - 1)) > threshold) {
            cuts += 1; if (first < 0) first = f
          }
          f += 1
        }
        (id, nFrames.toLong, cuts, first)
      }
    }.toDF("doc_id", "n_frames", "n_cuts", "first_cut")
  }

  /** L68 — real-codec RESIZE: decode the PNG through the production
    * path, nearest-neighbor downsample to `outSide`×`outSide` (source
    * pixel (x·side div outSide, y·side div outSide) — pure index
    * math, the one resampling kernel with NO float arithmetic, so the
    * resized pixels are bit-exact and the DuckDB oracle replays the
    * pixel formula AT THE SAMPLED coordinates only). Emits the
    * resized dimensions + integer-Rec.601 luma mean of the resized
    * image — certifying decode + resize end-to-end the same way m05
    * certifies encode + decode. Pure mapPartitions: zero shuffle,
    * decode/resize parallelism is the scan's partitioning. Production
    * swaps the kernel for an area/Lanczos resampler on the same
    * plumbing (those are float kernels, spec-pinned not oracle-replayed).
    */
  def imageResizeStats(ids: Dataset[java.lang.Long], side: Int = 8,
                       outSide: Int = 4): DataFrame = {
    require(outSide >= 1 && outSide <= side)
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      it.map { boxedId =>
        val id: Long = boxedId
        val img = decodeBuffered(formulaPng(id, side)).getOrElse(
          throw new IllegalStateException(s"PNG decode failed for id $id"))
        // A codec mismatch must fail loudly here, not surface as wrong
        // luma downstream of the index math.
        if (img.getWidth != side || img.getHeight != side)
          throw new IllegalStateException(
            s"decoded ${img.getWidth}x${img.getHeight}, expected ${side}x$side for id $id")
        var sum = 0L
        var y = 0
        while (y < outSide) {
          var x = 0
          while (x < outSide) {
            val rgb = img.getRGB(x * side / outSide, y * side / outSide)
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              ((rgb & 0xff) * 114)) / 1000
            x += 1
          }
          y += 1
        }
        val mean = sum.toDouble / (outSide * outSide)
        (id, outSide, outSide, math.floor(mean * 10000 + 0.5) / 10000)
      }
    }.toDF("doc_id", "out_w", "out_h", "mean_luma_resized")
  }

  /** Deterministic PCM16 mono test signal for id: s(i) =
    * floorMod(sid·7 + i·13, 65536) − 32768 — pure integer synthesis
    * (no float oscillator), so the oracle replays the exact samples.
    * The id is bounded first, same as [[formulaPng]].
    */
  private def formulaWav(id: Long, n: Int): Array[Byte] = {
    import javax.sound.sampled._
    val sid = Math.floorMod(id, 2147483648L)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (Math.floorMod(sid * 7 + i.toLong * 13, 65536L) - 32768L).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    if (AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos) <= 0)
      throw new IllegalStateException(s"no WAV writer for id $id")
    baos.toByteArray
  }

  /** L69 — real-codec AUDIO roundtrip: synthesize the deterministic
    * PCM16 signal, encode through the JDK's actual WAV codec
    * (javax.sound RIFF writer), decode through
    * `AudioSystem.getAudioInputStream` — the production entry point —
    * and emit integer sample stats (count, Σ|s|, peak). Because the
    * samples are an integer formula of (id, i), the DuckDB oracle
    * replays them value-for-value: any header/endianness/frame bug in
    * the codec path shows up as a hash mismatch, the m05 contract
    * applied to audio. Pure mapPartitions — zero shuffle; decode
    * parallelism is the scan's partitioning.
    */
  def audioRoundtripStats(ids: Dataset[java.lang.Long],
                          n: Int = 256): DataFrame = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
      it.map { boxedId =>
        val id: Long = boxedId
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(formulaWav(id, n)))
        val fmt = ais.getFormat
        // codec contract: anything but PCM16 mono little-endian at the
        // written frame count must fail loudly, not skew the stats
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.isBigEndian || ais.getFrameLength != n)
          throw new IllegalStateException(s"WAV roundtrip mangled id $id: $fmt")
        val bytes = ais.readAllBytes()
        var sumAbs = 0L
        var peak = 0L
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
          val a = math.abs(s)
          sumAbs += a
          if (a > peak) peak = a
          i += 1
        }
        (id, n.toLong, sumAbs, peak)
      }
    }.toDF("doc_id", "n_samples", "sum_abs", "peak")
  }

  /** L82 — windowed audio FEATURES over the real-codec decode: the
    * ASR/VAD preprocessing front end (frame the PCM stream into
    * win-sample windows every stride samples; per window emit energy,
    * zero-crossing count, and peak — the classic voice-activity /
    * silence-trim features). The signal synthesizes from the m07
    * integer formula, encodes through the JDK WAV codec and decodes
    * through `AudioSystem.getAudioInputStream` (the production entry
    * point, same contract checks as [[audioRoundtripStats]]), so the
    * whole decode→frame→feature chain is certified: a codec bug OR a
    * windowing off-by-one hash-differs against the oracle's formula
    * replay.
    *
    * Determinism: sum_sq/zero_crossings/peak are pure integers;
    * rms = sqrt(sum_sq/win) has an exactly-representable quotient for
    * power-of-two `win` (sum_sq ≤ win·2³⁰ ≪ 2⁵³), and IEEE sqrt is
    * correctly rounded on both engines — halfUp4 display rounding.
    *
    * Scale: features are computed inside the same mapPartitions pass
    * that decodes the bytes — zero shuffle, decode parallelism = scan
    * partitioning; featurizing 100 TB of audio is a map job.
    */
  def audioWindowFeatures(ids: Dataset[java.lang.Long], n: Int = 256,
                          win: Int = 64, stride: Int = 32): DataFrame = {
    require(Integer.bitCount(win) == 1, "win must be a power of two (exact rms quotient)")
    import ids.sparkSession.implicits._
    ids.flatMap { boxedId =>
      val id: Long = boxedId
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(formulaWav(id, n)))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.isBigEndian || ais.getFrameLength != n)
        throw new IllegalStateException(s"WAV roundtrip mangled id $id: $fmt")
      val bytes = ais.readAllBytes()
      val s = Array.tabulate(n)(i =>
        ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong)
      (0 to n - win by stride).zipWithIndex.map { case (start, winId) =>
        var sumSq = 0L
        var zc = 0L
        var peak = 0L
        var i = start
        while (i < start + win) {
          sumSq += s(i) * s(i)
          if (i > start && s(i - 1) * s(i) < 0) zc += 1
          val a = math.abs(s(i))
          if (a > peak) peak = a
          i += 1
        }
        val rms = math.floor(math.sqrt(sumSq.toDouble / win) * 10000 + 0.5) / 10000
        (id, winId.toLong, start.toLong, sumSq, zc, peak, rms)
      }
    }.toDF("doc_id", "win_id", "start_sample", "sum_sq", "zero_crossings",
      "peak", "rms")
  }

  /** Fixed-point 16-point DFT basis: `dftC(m) = round(10³·cos(mπ/8))`
    * for m in [0,16) — the m15 cosine-table discipline applied to the
    * audio tier. sin(mπ/8) = cos((m−4)π/8) indexes the SAME table at
    * (m+12) mod 16, so one 16-literal table replays both parts in an
    * external SQL oracle.
    */
  private[graft] val dftC: Array[Long] = Array(
    1000L, 924L, 707L, 383L, 0L, -383L, -707L, -924L,
    -1000L, -924L, -707L, -383L, 0L, 383L, 707L, 924L)

  /** L113 — windowed SPECTRAL features over the real-codec decode:
    * the dominant-frequency front end (pitch/tone tracking, whistle/
    * DTMF detection, the spectral half of VAD) — each `win`=16-sample
    * frame gets an integer 16-point DFT power spectrum over bins
    * k = 1..8 (DC excluded; 8 = Nyquist), P(k) = re² + im² with
    * re = Σ s_j·dftC[(k·j) mod 16], im = Σ s_j·dftC[(k·j+12) mod 16]
    * — EXACT integer arithmetic end to end (|re| ≤ 16·2¹⁵·10³ ≈
    * 5.3e8, P ≤ 5.5e17, ΣP ≤ 4.4e18, all inside Long), so the oracle
    * replays sample formula → the 16-literal cosine table → powers →
    * argmax bit-for-bit. Emits per frame the dominant bin (ties →
    * lowest k), its power, and total spectral power. Same real-WAV
    * decode + format contract as m07/m08; zero shuffle — 100 TB of
    * audio spectral profiling is a map job.
    */
  def audioSpectralFeatures(ids: Dataset[java.lang.Long], n: Int = 512,
                            stride: Int = 64): DataFrame = {
    val win = 16
    require(n >= win && stride >= 1)
    import ids.sparkSession.implicits._
    ids.flatMap { boxedId =>
      val id: Long = boxedId
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(formulaWav(id, n)))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.isBigEndian || ais.getFrameLength != n)
        throw new IllegalStateException(s"WAV roundtrip mangled id $id: $fmt")
      val bytes = ais.readAllBytes()
      val s = Array.tabulate(n)(i =>
        ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong)
      (0 to n - win by stride).zipWithIndex.map { case (start, winId) =>
        var domBin = 0L
        var domPower = -1L
        var totPower = 0L
        var k = 1
        while (k <= 8) {
          var re = 0L
          var im = 0L
          var j = 0
          while (j < win) {
            val m = (k * j) % 16
            re += s(start + j) * dftC(m)
            im += s(start + j) * dftC((m + 12) % 16)
            j += 1
          }
          val p = re * re + im * im
          totPower += p
          if (p > domPower) { domPower = p; domBin = k.toLong }
          k += 1
        }
        (id, winId.toLong, start.toLong, domBin, domPower, totPower)
      }
    }.toDF("doc_id", "win_id", "start_sample", "dom_bin", "dom_power", "tot_power")
  }

  /** L93 — energy-threshold VAD segmentation over the real-codec
    * decode (the voice-activity front end ASR pipelines run before
    * transcription — WebRTC-VAD's energy mode in its integer form):
    * the decoded PCM16 stream splits into NON-overlapping `win`-
    * sample windows, a window is ACTIVE iff its integer energy
    * Σs² exceeds `thresholdPerSample`·win (pure integer compare, no
    * float anywhere), and consecutive active windows merge into
    * segments — the gaps-and-islands pass, here a per-doc scalar loop
    * because a clip's window count is CLIP-bounded (duration/win),
    * never corpus-bounded. Emits per segment: ordinal, start/end
    * window, window count, integer energy sum. Decode runs through
    * the real WAV codec with m07/m08's format checks, so a codec bug
    * OR a segmentation off-by-one is a hash mismatch; the oracle
    * replays sample formula → window energies → threshold → islands.
    * Zero shuffle: segmenting 100 TB of audio is a map job.
    */
  def vadSegments(ids: Dataset[java.lang.Long], n: Int = 512, win: Int = 32,
                  thresholdPerSample: Long = 358000000L): DataFrame = {
    require(n % win == 0 && win > 0)
    import ids.sparkSession.implicits._
    ids.flatMap { boxedId =>
      val id: Long = boxedId
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(formulaWav(id, n)))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.isBigEndian || ais.getFrameLength != n)
        throw new IllegalStateException(s"WAV roundtrip mangled id $id: $fmt")
      val bytes = ais.readAllBytes()
      val s = Array.tabulate(n)(i =>
        ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong)
      val nw = n / win
      val sums = Array.tabulate(nw) { w =>
        var sq = 0L
        var i = w * win
        while (i < (w + 1) * win) { sq += s(i) * s(i); i += 1 }
        sq
      }
      val cut = thresholdPerSample * win
      val segs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
      var w = 0
      while (w < nw) {
        if (sums(w) > cut) {
          val start = w
          var energy = 0L
          while (w < nw && sums(w) > cut) { energy += sums(w); w += 1 }
          segs += ((segs.length.toLong, start.toLong, (w - 1).toLong,
            (w - start).toLong, energy))
        } else w += 1
      }
      segs.map { case (segId, st, en, nw2, e) => (id, segId, st, en, nw2, e) }
    }.toDF("doc_id", "seg_id", "start_win", "end_win", "n_wins", "energy_sum")
  }

  /** L48 — frame-sample manifest: treat each media payload as a fixed
    * frame grid (`frameBytes` bytes/frame) and emit every `stride`-th
    * frame's index, byte offset, and digest — the manifest a sampled
    * video-decode pass consumes (decode only the listed offsets, skip
    * the rest), and the video analogue of m03's multipart chunking.
    * Purely narrow: posexplode over the strided frame sequence +
    * substring/md5 per sampled frame — sampling 100 TB of video is a
    * map job; the real codec replaces the digest step, the manifest
    * plumbing stays.
    */
  def frameSampleManifest(blobs: DataFrame, idCol: String,
                          frameBytes: Int = 16, stride: Int = 4): DataFrame =
    blobs
      .withColumn("n_frames", expr(s"length(blob) div $frameBytes").cast("long"))
      .filter(col("n_frames") > 0)
      .select(col(idCol), col("blob"), col("n_frames"),
        posexplode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as(Seq("sample_id", "frame_id")))
      .select(col(idCol), col("sample_id").cast("long").as("sample_id"),
        col("frame_id"),
        (col("frame_id") * frameBytes).as("byte_offset"),
        // md5 of the frame's HEX string, not its raw bytes: byte-exact
        // in every engine (an arbitrary byte slice isn't valid UTF-8,
        // so VARCHAR-md5 oracles can't digest it; DuckDB has no BLOB
        // md5). Same content-addressing power, portable verification.
        md5(hex(expr(s"substring(blob, frame_id * $frameBytes + 1, $frameBytes)")))
          .as("frame_md5"),
        col("n_frames"))

  /** documents.text → binary payload stand-in (the testdata has no
    * real media; the blob column type and lineage are what matters).
    */
  def blobsFromDocuments(docs: DataFrame): Dataset[BlobRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("blob")).as[BlobRow]
  }
}
