package graft.io

/** Grisu2 shortest-digit floating-point-to-decimal conversion, implemented
  * from the published algorithm (Florian Loitsch, "Printing Floating-Point
  * Numbers Quickly and Accurately with Integers", PLDI 2010) with the same
  * parameters the reference's vendored JSON library uses
  * (`/root/reference/lib/json/json.hpp:17931` — alpha=-60, gamma=-32,
  * cached powers 10^k for k in [-300, 324] step 8).
  *
  * Java 17's `Double.toString` is Ryu (always-shortest); Grisu2 is *almost*
  * always shortest but emits one extra digit for a small fraction of values,
  * so byte-exact envelope parity needs the digits to come from the same
  * algorithm the reference runs. The cached-powers table is generated at
  * class-init with exact BigInt arithmetic (round-half-up to 64-bit
  * significands) rather than transcribed.
  *
  * All u64 arithmetic is two's-complement `Long` with unsigned comparisons.
  */
object Grisu {

  private final val Alpha = -60

  /** (significand f, binary exponent e, decimal exponent k): f*2^e ~= 10^k,
    * 2^63 <= f < 2^64. */
  private val cachedF = new Array[Long](79)
  private val cachedE = new Array[Int](79)
  private val cachedK = new Array[Int](79)

  {
    var i = 0
    var k = -300
    while (k <= 324) {
      val (f, e) =
        if (k >= 0) {
          val p = BigInt(10).pow(k)
          val e0 = p.bitLength - 64
          if (e0 <= 0) ((p << -e0).longValue, e0)
          else {
            var f0 = (p + (BigInt(1) << (e0 - 1))) >> e0
            var e1 = e0
            if (f0.bitLength > 64) { f0 >>= 1; e1 += 1 }
            (f0.longValue, e1)
          }
        } else {
          val den = BigInt(10).pow(-k)
          // f = round(2^-e / den): search e so f lands in [2^63, 2^64)
          def fAt(e: Int): BigInt = ((BigInt(1) << (1 - e)) + den) / (den << 1)
          var e = -(den.bitLength + 64)
          var f0 = fAt(e)
          while (f0.bitLength > 64) { e += 1; f0 = fAt(e) }
          while (f0.bitLength < 64) { e -= 1; f0 = fAt(e) }
          (f0.longValue, e)
        }
      cachedF(i) = f; cachedE(i) = e; cachedK(i) = k
      i += 1; k += 8
    }
  }

  @inline private def ltU(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) < 0
  @inline private def leU(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) <= 0

  /** round((x * y) / 2^64), ties up — the DiyFp product. */
  private def mulHi(x: Long, y: Long): Long = {
    val uLo = x & 0xFFFFFFFFL; val uHi = x >>> 32
    val vLo = y & 0xFFFFFFFFL; val vHi = y >>> 32
    val p0 = uLo * vLo; val p1 = uLo * vHi; val p2 = uHi * vLo; val p3 = uHi * vHi
    var q = (p0 >>> 32) + (p1 & 0xFFFFFFFFL) + (p2 & 0xFFFFFFFFL)
    q += 1L << 31 // round, ties up
    p3 + (p2 >>> 32) + (p1 >>> 32) + (q >>> 32)
  }

  /** Shortest digits for a finite positive double: returns (digits,
    * decimalExponent) with value ~= digits * 10^decimalExponent. */
  def shortest(value: Double): (String, Int) = {
    require(value > 0 && !value.isInfinite, s"grisu needs finite positive input, got $value")
    val bits = java.lang.Double.doubleToRawLongBits(value)
    val biasedExp = (bits >>> 52).toInt & 0x7FF
    val fraction = bits & ((1L << 52) - 1)

    // v = f * 2^e
    var vf = if (biasedExp == 0) fraction else fraction | (1L << 52)
    var ve = if (biasedExp == 0) -1074 else biasedExp - 1075

    // boundaries m- / m+ (half-ulp neighbourhood)
    val lowerCloser = fraction == 0 && biasedExp > 1
    var mpF = (vf << 1) + 1; var mpE = ve - 1
    var mmF = if (lowerCloser) (vf << 2) - 1 else (vf << 1) - 1
    val mmE = if (lowerCloser) ve - 2 else ve - 1

    // normalize m+ ; shift m- to the same exponent
    val shift = java.lang.Long.numberOfLeadingZeros(mpF)
    mpF <<= shift; mpE -= shift
    mmF <<= (mmE - mpE)

    // normalize v
    val vShift = java.lang.Long.numberOfLeadingZeros(vf)
    vf <<= vShift; ve -= vShift

    // cached power c ~= 10^-k with alpha <= e(c*m+) <= gamma
    val fExp = Alpha - mpE - 1
    val k = (fExp * 78913) / (1 << 18) + (if (fExp > 0) 1 else 0)
    val index = (300 + k + 7) / 8
    val cF = cachedF(index); val cE = cachedE(index)
    val decExpBase = -cachedK(index)

    val e = mpE + cE + 64 // shared scaled exponent, in [alpha, gamma]
    val w = mulHi(vf, cF)
    val wMinus = mulHi(mmF, cF) + 1
    val wPlus = mulHi(mpF, cF) - 1

    digitGen(wMinus, w, wPlus, e, decExpBase)
  }

  /** Generates V = buffer * 10^decimalExponent with M- <= V <= M+
    * (json.hpp:18206 grisu2_digit_gen, same control flow). */
  private def digitGen(mMinus: Long, w: Long, mPlus: Long, e: Int, decExp0: Int): (String, Int) = {
    var delta = mPlus - mMinus
    var dist = mPlus - w
    val oneF = 1L << -e
    var p1 = mPlus >>> -e // integral part, < 2^32
    var p2 = mPlus & (oneF - 1)
    var decExp = decExp0

    val buf = new java.lang.StringBuilder(24)

    def grisuRound(distL: Long, deltaL: Long, rest0: Long, tenK: Long): Unit = {
      var rest = rest0
      while (ltU(rest, distL) && leU(tenK, deltaL - rest) &&
             (ltU(rest + tenK, distL) || ltU(rest + tenK - distL, distL - rest))) {
        buf.setCharAt(buf.length - 1, (buf.charAt(buf.length - 1) - 1).toChar)
        rest += tenK
      }
    }

    // part 1: digits of the integral part p1 (p1 < 2^32, so signed ops fit)
    var pow10 = 1L
    var n = 1
    while (p1 >= pow10 * 10) { pow10 *= 10; n += 1 }
    while (n > 0) {
      val d = p1 / pow10
      val r = p1 % pow10
      buf.append(('0' + d).toChar)
      p1 = r
      n -= 1
      val rest = (p1 << -e) + p2
      if (leU(rest, delta)) {
        decExp += n
        grisuRound(dist, delta, rest, pow10 << -e)
        return (buf.toString, decExp)
      }
      pow10 /= 10
    }

    // part 2: digits of the fractional part p2
    var m = 0
    while (true) {
      p2 *= 10
      val d = p2 >>> -e
      val r = p2 & (oneF - 1)
      buf.append(('0' + d).toChar)
      p2 = r
      m += 1
      delta *= 10
      dist *= 10
      if (leU(p2, delta)) {
        decExp -= m
        grisuRound(dist, delta, p2, oneF)
        return (buf.toString, decExp)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
