package graft.functions

/** Minimal iterative radix-2 complex FFT — the per-plane transform used
  * by make_image/make_psf/smooth (the reference uses dask.fft wrappers
  * around numpy FFT; planes here are small enough (<= ~4k^2) that an
  * in-task O(n log n) transform is the right shape — SURVEY.md §2.8).
  *
  * No normalization is applied in either direction: the reference
  * multiplies the numpy ifft2 result back by N (make_image.py:120), so
  * the unnormalized inverse is exactly what make_image needs.
  */
object Fft {

  /** In-place 1-D FFT over interleaved strided data. */
  private def transform(re: Array[Double], im: Array[Double],
                        offset: Int, stride: Int, n: Int,
                        invert: Boolean): Unit = {
    require((n & (n - 1)) == 0, s"FFT size must be a power of 2, got $n")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val ia = offset + i * stride; val ja = offset + j * stride
        val tr = re(ia); re(ia) = re(ja); re(ja) = tr
        val ti = im(ia); im(ia) = im(ja); im(ja) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = 2.0 * math.Pi / len * (if (invert) 1 else -1)
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cwr = 1.0; var cwi = 0.0
        var k = 0
        while (k < len / 2) {
          val ia = offset + (blk + k) * stride
          val ja = offset + (blk + k + len / 2) * stride
          val vr = re(ja) * cwr - im(ja) * cwi
          val vi = re(ja) * cwi + im(ja) * cwr
          re(ja) = re(ia) - vr; im(ja) = im(ia) - vi
          re(ia) += vr; im(ia) += vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr; cwr = nwr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** In-place unnormalized 2-D FFT of a row-major (nRows x nCols) plane. */
  def fft2(re: Array[Double], im: Array[Double], nRows: Int, nCols: Int,
           invert: Boolean): Unit = {
    var r = 0
    while (r < nRows) { transform(re, im, r * nCols, 1, nCols, invert); r += 1 }
    var c = 0
    while (c < nCols) { transform(re, im, c, nCols, nRows, invert); c += 1 }
  }

  /** fftshift (== ifftshift for even sizes) of a row-major plane:
    * swap quadrants so index 0 moves to the center.
    */
  def fftshift2(a: Array[Double], nRows: Int, nCols: Int): Array[Double] = {
    require(nRows % 2 == 0 && nCols % 2 == 0, "fftshift2 requires even dims")
    val out = new Array[Double](a.length)
    val hr = nRows / 2; val hc = nCols / 2
    var r = 0
    while (r < nRows) {
      val sr = (r + hr) % nRows
      var c = 0
      while (c < nCols) {
        out(sr * nCols + ((c + hc) % nCols)) = a(r * nCols + c)
        c += 1
      }
      r += 1
    }
    out
  }
}
