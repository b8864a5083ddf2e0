package graft.text

/** Tunables of the MinHash-LSH near-duplicate family — q45's inline
  * pipeline and the persisted [[graft.etl.BandIndex]] (which pins the
  * params it was created with on disk, so appends and classifies can
  * never drift from the stored signatures).
  *
  * The LSH S-curve: with k = `numHashes` min-hashes split into
  * b = `bands` bands of r = k/b rows, a pair with true Jaccard j
  * becomes a CANDIDATE with probability
  *
  *   P(j) = 1 − (1 − j^r)^b
  *
  * — an S-curve whose inflection sits near (1/b)^(1/r). More bands
  * (smaller r) shift the curve LEFT: candidate recall rises — strictly
  * so here, because band boundaries NEST (doubling b splits each band
  * in two, and a full-band match implies both halves match), making
  * the candidate set a superset; `PropertySpec`'s recall-monotonicity
  * property pins that — at the cost of more spurious candidates for
  * the exact-verify stage to discard. Fewer bands shift the curve
  * RIGHT: cheaper verification, but pairs just above `threshold` start
  * slipping past the candidate stage (lost recall that no later stage
  * recovers). Size (b, r) so the inflection sits just below the target
  * threshold.
  *
  * `threshold` is BOTH the final exact-Jaccard cut and the
  * PPJoin-style length-ratio prefilter (J ≥ t ⇒ t·|B| ≤ |A| —
  * lossless). Defaults (8 hashes, 2 bands of 4, t = 0.99) target the
  * exact-near-dup regime: j ≥ 0.99 collides per band with p ≈ 0.96,
  * across either of the 2 bands ≈ 0.998.
  */
final case class LshParams(numHashes: Int = 8, bands: Int = 2,
                           threshold: Double = 0.99) {
  require(numHashes >= 1 && bands >= 1 && numHashes % bands == 0,
    s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
  require(threshold > 0 && threshold <= 1,
    s"threshold must be in (0, 1], got $threshold")

  /** r in the S-curve. */
  def rowsPerBand: Int = numHashes / bands

  /** The min-hash column indices of band `b` (1-based). */
  def bandMembers(b: Int): Range =
    ((b - 1) * rowsPerBand + 1) to (b * rowsPerBand)

  /** One-line serialization for the on-disk index params file. */
  def encode: String = s"$numHashes|$bands|$threshold"
}

object LshParams {
  def decode(s: String): LshParams = s.trim.split('|') match {
    case Array(k, b, t) => LshParams(k.toInt, b.toInt, t.toDouble)
    case _ => throw new IllegalArgumentException(s"bad LshParams encoding: '$s'")
  }
}
