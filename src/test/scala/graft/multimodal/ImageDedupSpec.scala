package graft.multimodal

import graft.SparkSpec

/** [[ImageDedup]] — the exact-value verification behind q179's
  * rows-only registry check: dHash determinism, the twin distance
  * bound the jitter construction promises, cross-seed separation, and
  * the pigeonhole losslessness of the 4-band split at the verify
  * threshold.
  */
class ImageDedupSpec extends SparkSpec {

  private def d(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dhash is deterministic and decodes its own renders") {
    val h1 = ImageDedup.dhash(ImageDedup.patternPng(42L))
    val h2 = ImageDedup.dhash(ImageDedup.patternPng(42L))
    assert(h1.isDefined && h1 == h2)
  }

  test("a one-pixel jittered twin stays within Hamming 2 of its original") {
    (1L to 60L).foreach { seed =>
      val orig = ImageDedup.dhash(ImageDedup.patternPng(seed)).get
      val twin = ImageDedup.dhash(ImageDedup.patternPng(seed, flip = 1)).get
      assert(d(orig, twin) <= 2, s"seed $seed: twin drifted ${d(orig, twin)} bits")
    }
  }

  test("different seeds separate far past the verify threshold") {
    val hs = (1L to 60L).map(s => ImageDedup.dhash(ImageDedup.patternPng(s)).get)
    val dists = for (i <- hs.indices; j <- (i + 1) until hs.size)
      yield d(hs(i), hs(j))
    // the seed-keyed polynomial curvature keeps hashes well apart
    // (measured min 15 over ids 0..199); none collide into the
    // near-dup band
    assert(dists.min > ImageDedup.HammingMax,
      s"cross-seed hashes collided: min distance ${dists.min}")
  }

  test("4-band pigeonhole: any pair within Hamming 3 shares a 16-bit band") {
    def bands(h: Long): Seq[Long] = (0 until 4).map(b => (h >>> (b * 16)) & 0xffffL)
    // adversarial: flip any 3 bit positions of a noise hash
    val h = ImageDedup.dhash(ImageDedup.patternPng(7L)).get
    val rng = (0 until 64).map(1L << _)
    for (i <- 0 until 64; j <- (i + 1) until 64 by 7; k <- (j + 1) until 64 by 11) {
      val g = h ^ rng(i) ^ rng(j) ^ rng(k)
      assert(bands(h).zip(bands(g)).exists { case (x, y) => x == y },
        s"3-bit-flipped pair lost all bands at ($i,$j,$k)")
    }
  }

  test("undecodable payloads hash to None, not an exception") {
    assert(ImageDedup.dhash(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageDedup.dhash(Array.emptyByteArray).isEmpty)
  }
}
