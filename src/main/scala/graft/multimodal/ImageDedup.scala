package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Perceptual image near-duplication via difference hash (dHash —
  * the public aHash/dHash/pHash family, e.g. Krawetz's
  * kind-of-like-that writeup): decode → integer block-mean resample
  * to a 9×8 gray grid → 64 adjacent-comparison bits. Two images that
  * differ by small local edits land within a few Hamming bits, so the
  * LSH stance the TEXT dedup family runs on (band → bucket → verify)
  * applies verbatim to pixels: 4 × 16-bit bands, candidates share a
  * band, verify by exact Hamming distance. A ≤ 3-bit pair differs in
  * at most 3 bands, so it ALWAYS shares one — the banding is lossless
  * at the verify threshold (the q45 pigeonhole argument).
  *
  * Like q128, the registry query renders its own deterministic media
  * (seeded-LCG noise PNGs; every 4th doc also emits a one-pixel
  * jittered twin) because the testdata ships no physical media
  * column, and carries NO SQL oracle — DuckDB cannot decode PNG. The
  * exact-value verification lives in `ImageDedupSpec` (twin distance
  * bound, cross-seed separation, banding losslessness, block-mean
  * determinism); the driver records the rows-only check.
  *
  * Scale shape: render+decode+hash fuse into one mapPartitions stage;
  * the band join shuffles (band_idx, 16-bit chunk, doc_id) triples
  * only — never pixels; verify is a 64-bit XOR popcount.
  */
object ImageDedup {

  val Side = 32
  val HammingMax = 3
  private val Twin = 10000000L

  /** Seeded-noise PNG: pixel gray from a per-(seed, x, y) LCG mix —
    * seed-specific structure (a smooth gradient would dHash identical
    * for every seed). `flip` > 0 inverts ONE interior pixel (the
    * jittered twin: a local edit that can move at most the two dHash
    * comparisons its grid cell participates in — distance ≤ 2, inside
    * the verify threshold by construction).
    */
  def noisePng(seed: Long, flip: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      Side, Side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < Side) {
      var x = 0
      while (x < Side) {
        // splitmix64-style finalizer (Vigna, public domain): a LINEAR
        // mix shifts all pixels near-uniformly across seeds, which a
        // DIFFERENCE hash cancels out — avalanche is load-bearing here
        var z = seed * 0x9E3779B97F4A7C15L +
          (y.toLong * Side + x) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        var g = (z & 0xffL).toInt
        if (flip > 0 && x == 13 && y == 13) g = 255 - g
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** 64-bit dHash of an image payload: integer block-mean to a 9×8
    * gray grid (exact pixel-sum ÷ count — deterministic across JVMs,
    * unlike Graphics2D scaling), then bit (y·8+x) = grid[x+1][y] >
    * grid[x][y]. None for undecodable payloads.
    */
  def dhash(payload: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      if (w < 9 || h < 8) None
      else {
        val grid = Array.ofDim[Long](9, 8)
        var gx = 0
        while (gx < 9) {
          var gy = 0
          while (gy < 8) {
            val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
            val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
            var sum = 0L; var n = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                  114L * (rgb & 0xff)) / 1000L
                n += 1; x += 1
              }
              y += 1
            }
            grid(gx)(gy) = if (n == 0) 0L else sum / n
            gy += 1
          }
          gx += 1
        }
        var bits = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (grid(x + 1)(y) > grid(x)(y)) bits |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        Some(bits)
      }
    }
  }

  /** q179 — banded dHash near-dup over self-rendered media: every 4th
    * sampled doc emits a one-block-jittered twin; the band join must
    * recover exactly those pairs (plus any true hash collisions).
    */
  val q179 = Q(
    "q179_image_dhash_neardup",
    (s, dir) => {
      import s.implicits._
      val base = Tables.load(s, dir, "documents")
        .select($"doc_id", $"source")
        .orderBy($"doc_id").limit(200) // bounded media sample (q128)
        .as[(Long, String)]
      val hashes = graft.Barrier(base.mapPartitions(_.flatMap { case (id, src) =>
          val orig = (id, src, dhash(noisePng(id)))
          val twin =
            if (id % 4 == 0) Seq((id + Twin, src, dhash(noisePng(id, flip = 1))))
            else Seq.empty
          (orig +: twin).collect { case (i, sc, Some(hh)) => (i, sc, hh) }
        }).toDF("doc_id", "source", "h"))
      val bands = hashes.select($"doc_id", $"h",
        explode(expr(
          "transform(sequence(0, 3), b -> struct(b as band, shiftright(h, b * 16) & 65535 as chunk))"))
          .as("bc"))
        .select($"doc_id", $"h", $"bc.band".as("band"), $"bc.chunk".as("chunk"))
      val cand = bands.as("a").join(bands.as("b"),
          $"a.band" === $"b.band" && $"a.chunk" === $"b.chunk" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
          $"a.h".as("ha"), $"b.h".as("hb"))
        .distinct()
      val pairs = cand
        .withColumn("dist", expr("bit_count(ha ^ hb)"))
        .filter($"dist" <= HammingMax)
      val perSource = hashes.groupBy($"source").agg(count(lit(1)).as("n_images"))
      val pairLedger = pairs
        .join(hashes.select($"doc_id".as("ia"), $"source"), "ia")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_neardup_pairs"),
          count_if($"ib" - $"ia" === Twin).as("n_twin_pairs"))
      perSource.join(pairLedger, Seq("source"), "left_outer")
        .select($"source", $"n_images",
          coalesce($"n_neardup_pairs", lit(0L)).as("n_neardup_pairs"),
          coalesce($"n_twin_pairs", lit(0L)).as("n_twin_pairs"))
        .orderBy($"source")
    },
    None,
    doc = "multimodal: banded dHash image near-dup (LSH stance on pixels) — rows-only check + ImageDedupSpec exactness")

  val all: Seq[Q] = Seq(q179)
}
