package graft.functions

/** Two-long exact accumulator arithmetic (hi·10¹⁸ + lo fixed-point
  * units) shared by the fixed-point aggregation paths
  * (Similarity.trainCodebookOn's per-dim sums; SumMicro keeps a
  * structurally-identical buffer-offset variant — see its addMicros).
  *
  * Invariant: |lo| < LIMB at rest; each add performs at most one
  * conditional carry, which is sound only because incoming lo parts
  * are pre-split below one limb. Hi-limb adds are overflow-CHECKED
  * (addExact): beyond the ±9.2·10³⁶-unit span the accumulate fails
  * loudly instead of wrapping into a silently wrong sum.
  */
object Limbs {

  val LIMB = 1000000000000000000L // 10^18

  /** Accumulate one fixed-point value (any long magnitude — limb-split
    * here) into slot `i`. */
  def addValue(hi: Array[Long], lo: Array[Long], i: Int, f: Long): Unit =
    addPair(hi, lo, i, f / LIMB, f % LIMB)

  /** Accumulate a pre-split (h2, l2) pair (|l2| < LIMB) into slot `i`. */
  def addPair(hi: Array[Long], lo: Array[Long], i: Int, h2: Long, l2: Long): Unit = {
    var h = Math.addExact(hi(i), h2)
    var l = lo(i) + l2 // |l| < 2·LIMB < Long.Max — exact
    if (l >= LIMB) { l -= LIMB; h = Math.addExact(h, 1L) }
    else if (l <= -LIMB) { l += LIMB; h = Math.subtractExact(h, 1L) }
    hi(i) = h
    lo(i) = l
  }
}
