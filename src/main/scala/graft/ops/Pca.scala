package graft.ops

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.functions.VecCodec.toFix12

/** PCA over an embedding corpus — the dimensionality-reduction tier of
  * the similarity family (project 64-dim vectors onto the top-k
  * principal directions before ANN: the classic recall/bandwidth trade
  * OPQ/IVF pipelines make; Jégou et al. use exactly this rotation
  * ahead of PQ).
  *
  * Distributed shape, stated: the data never leaves the executors —
  * ONE treeAggregate pass accumulates (n, per-dim sums, the d×d upper
  * triangle of Σ x·xᵀ, Σ‖x‖²); the d×d Gram matrix is BOUNDED MODEL
  * STATE (d=64 → 2080 doubles), the IVF-codebook collect discipline.
  * The eigensolve runs driver-side on that d×d matrix (cyclic Jacobi —
  * the dimensionality is the budget, never the corpus), and the
  * projection matrix broadcasts back for the verification pass. At
  * 100 TB this is two passes of map-side-combined aggregation and a
  * 16 KB broadcast — no shuffle carries vector data at all.
  *
  * Gate design (the approxDistinct *Verified convention, but with
  * CONTENT-BEARING exact columns): sketch-free quantities the oracle
  * can recompute — n, dim, the per-dim mean fingerprint and the total
  * energy — are produced from EXACT fixed-point sums (toFix12 limbs,
  * the dot_dec contract: bit-equal to summing DECIMAL(30,12) casts)
  * and hash-gate directly; the eigen side reduces to integer verdicts:
  *
  *  - orth_ok: max |WᵀW − I| ≤ 1e-9 (the returned basis is orthonormal)
  *  - eig_ok: max ‖C·wᵢ − λᵢ·wᵢ‖∞ ≤ 1e-9 and λ non-increasing, λᵢ ≥
  *    −1e-9 (they ARE eigenpairs of the covariance, in order)
  *  - recon_ok: the measured mean squared reconstruction error over
  *    the corpus equals trace(C) − Σλ_top within 1e-6·(1+trace) — the
  *    Eckart-Young identity, checked against the DATA, so a wrong
  *    eigensolve or a wrong projection both flip it.
  *
  * Fixed-point capacity: per-row |x_d| and x_d² sums ride Math.addExact
  * (a corpus big enough to overflow the 10¹²-scaled limbs fails loudly,
  * ~10⁶ unit-scale rows per 9.2·10¹⁸/dim — lift to hi/lo limbs as in
  * sum_micro if ever reached; the verdict side is double and unbounded).
  */
object Pca {

  /** Cyclic Jacobi eigendecomposition of a symmetric d×d matrix.
    * Returns (eigenvalues, eigenvectors as columns), unsorted. */
  private[ops] def jacobiEigen(a0: Array[Array[Double]],
      sweeps: Int = 64, tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > tol) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def roundAway(x: Double): Long =
    JBD.valueOf(x).setScale(0, RoundingMode.HALF_UP).longValue
  private def round6(x: Double): Double =
    JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue

  /** One-row verified PCA summary over `emb` (a column of equal-length
    * float vectors named `embedding`). Output:
    * (n, dim, k, mu_fp, ssq6, orth_ok, eig_ok, recon_ok). */
  def pcaVerified(emb: DataFrame, k: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    val rows = emb.select("embedding").rdd
    val dim = emb.select("embedding").head.getSeq[Float](0).length
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim=$dim, got $k")

    // pass 1: n, exact per-dim fixed-point sums + total energy, and
    // the double Gram upper triangle for the eigensolve
    final case class Acc(var n: Long, sumFix: Array[Long], var ssqFix: Long,
        gram: Array[Double])
    val nTri = dim * (dim + 1) / 2
    val zero = Acc(0L, new Array[Long](dim), 0L, new Array[Double](nTri))
    val acc = rows.treeAggregate(zero)(
      seqOp = { (a, row) =>
        val e = row.getSeq[Float](0)
        require(e.length == dim, s"ragged embedding: ${e.length} vs $dim")
        var i = 0
        while (i < dim) {
          val xi = e(i).toDouble
          a.sumFix(i) = Math.addExact(a.sumFix(i), toFix12(xi))
          a.ssqFix = Math.addExact(a.ssqFix, toFix12(xi * xi))
          var j = i
          // packed upper triangle: row i starts at i·dim − i(i−1)/2
          val rowStart = i * dim - i * (i - 1) / 2
          while (j < dim) {
            a.gram(rowStart + j - i) += xi * e(j).toDouble
            j += 1
          }
          i += 1
        }
        a.n += 1; a
      },
      combOp = { (a, b) =>
        var i = 0
        while (i < dim) {
          a.sumFix(i) = Math.addExact(a.sumFix(i), b.sumFix(i)); i += 1
        }
        i = 0
        while (i < nTri) { a.gram(i) += b.gram(i); i += 1 }
        a.ssqFix = Math.addExact(a.ssqFix, b.ssqFix)
        a.n += b.n; a
      })
    val n = acc.n
    require(n > 0, "empty embedding corpus")

    // exact, hash-gated summaries (identical IEEE chain as the oracle)
    val sumD = acc.sumFix.map(f => JBD.valueOf(f, 12).doubleValue())
    val mu6 = sumD.map(s => roundAway(s / n * 1000000))
    val muFp = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(mu6.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val ssq6 = round6(JBD.valueOf(acc.ssqFix, 12).doubleValue())

    // covariance C = Gram/n − μμᵀ (double — verdict side only)
    val mu = sumD.map(_ / n)
    val c = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      val rowStart = i * dim - i * (i - 1) / 2
      while (j < dim) {
        val v = acc.gram(rowStart + j - i) / n - mu(i) * mu(j)
        c(i)(j) = v; c(j)(i) = v
        j += 1
      }
      i += 1
    }
    val trace = (0 until dim).map(d => c(d)(d)).sum

    val (evalsRaw, evecs) = jacobiEigen(c)
    val order = evalsRaw.indices.sortBy(ix => -evalsRaw(ix))
    val top = order.take(k)
    val lambda = top.map(evalsRaw).toArray
    // W: dim×k, sign-fixed (largest-|component| positive) for
    // run-to-run determinism of the broadcast model
    val w = Array.tabulate(dim, k) { (d, c2) => evecs(d)(top(c2)) }
    (0 until k).foreach { c2 =>
      val dmax = (0 until dim).maxBy(d => math.abs(w(d)(c2)))
      if (w(dmax)(c2) < 0) (0 until dim).foreach(d => w(d)(c2) = -w(d)(c2))
    }

    // verdict 1: orthonormal basis
    val orthErr = (for (a2 <- 0 until k; b2 <- a2 until k) yield {
      val dot = (0 until dim).map(d => w(d)(a2) * w(d)(b2)).sum
      math.abs(dot - (if (a2 == b2) 1.0 else 0.0))
    }).max
    // verdict 2: eigenpairs of C, non-increasing, non-negative
    val eigErr = (0 until k).map { c2 =>
      (0 until dim).map { d =>
        val cw = (0 until dim).map(j2 => c(d)(j2) * w(j2)(c2)).sum
        math.abs(cw - lambda(c2) * w(d)(c2))
      }.max
    }.max
    val sortedOk = (1 until k).forall(c2 => lambda(c2) <= lambda(c2 - 1) + 1e-12) &&
      lambda.forall(_ >= -1e-9)

    // pass 2: measured reconstruction error vs the Eckart-Young value
    val bcW = spark.sparkContext.broadcast((mu, w))
    val resid = rows.treeAggregate(0.0)(
      seqOp = { (a, row) =>
        val e = row.getSeq[Float](0)
        val (muB, wB) = bcW.value
        val xc = Array.tabulate(dim)(d => e(d).toDouble - muB(d))
        var normSq = 0.0
        var d = 0
        while (d < dim) { normSq += xc(d) * xc(d); d += 1 }
        var projSq = 0.0
        var c2 = 0
        while (c2 < k) {
          var y = 0.0; d = 0
          while (d < dim) { y += wB(d)(c2) * xc(d); d += 1 }
          projSq += y * y; c2 += 1
        }
        a + (normSq - projSq)
      },
      combOp = _ + _) / n
    val expected = trace - lambda.sum
    val reconOk = math.abs(resid - expected) <= 1e-6 * (1.0 + math.abs(trace))

    val schema = StructType(Seq(
      StructField("n", LongType), StructField("dim", LongType),
      StructField("k", LongType), StructField("mu_fp", StringType),
      StructField("ssq6", DoubleType), StructField("orth_ok", LongType),
      StructField("eig_ok", LongType), StructField("recon_ok", LongType)))
    spark.createDataFrame(
      java.util.List.of(Row(n, dim.toLong, k.toLong, muFp, ssq6,
        if (orthErr <= 1e-9) 1L else 0L,
        if (eigErr <= 1e-9 && sortedOk) 1L else 0L,
        if (reconOk) 1L else 0L)),
      schema)
  }
}
