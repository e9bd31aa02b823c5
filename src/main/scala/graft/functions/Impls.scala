package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static implementations behind the graft Catalyst expressions.
  *
  * Kept as plain static methods (Scala object = static forwarders) so
  * generated code can call them directly from whole-stage codegen:
  * `graft.functions.Impls.crc16Modbus(...)`.
  *
  * Semantics follow the reference's documented behavior (SURVEY.md §2.5):
  * NMEA XOR checksum `/root/reference/src/util/math/MathUtils.java:1206-1235`,
  * CRC16-modbus / LRC / MD5 `MathUtils.java:1236-1297` +
  * `Calculations.java:425-437`, signed N-bit reinterpret
  * `MathUtils.java:1133-1205`, BCD `MathUtils.java:1405-1419` — all
  * reimplemented from the public algorithm definitions.
  */
object Impls {

  private val HEX = "0123456789ABCDEF".toCharArray

  /** XOR of all bytes between a leading '$' (exclusive) and the first '*'
    * (exclusive); whole string when the markers are absent. Returns the
    * two-char uppercase hex used in NMEA sentences.
    */
  def nmeaChecksum(s: UTF8String): UTF8String = {
    val b = s.getBytes
    var i = 0
    if (b.length > 0 && b(0) == '$') i = 1
    var x = 0
    while (i < b.length && b(i) != '*') { x ^= b(i) & 0xff; i += 1 }
    UTF8String.fromString(new String(Array(HEX((x >> 4) & 0xf), HEX(x & 0xf))))
  }

  /** True when the sentence carries a '*hh' suffix matching its checksum. */
  def nmeaValid(s: UTF8String): Boolean = {
    val str = s.toString
    val star = str.indexOf('*')
    if (star < 0 || star + 3 > str.length) return false
    val expect = str.substring(star + 1, star + 3)
    val got = nmeaChecksum(s).toString
    got.equalsIgnoreCase(expect)
  }

  /** CRC16/MODBUS over the UTF-8 bytes: init 0xFFFF, poly 0xA001 (reflected
    * 0x8005), no final xor. Check value: crc16Modbus("123456789") == 0x4B37.
    */
  def crc16Modbus(s: UTF8String): Int = {
    val b = s.getBytes
    var crc = 0xffff
    var i = 0
    while (i < b.length) {
      crc ^= b(i) & 0xff
      var j = 0
      while (j < 8) {
        crc = if ((crc & 1) != 0) (crc >>> 1) ^ 0xa001 else crc >>> 1
        j += 1
      }
      i += 1
    }
    crc
  }

  /** Longitudinal redundancy check: two's complement of the byte sum. */
  def lrc(s: UTF8String): Int = {
    val b = s.getBytes
    var sum = 0
    var i = 0
    while (i < b.length) { sum += b(i) & 0xff; i += 1 }
    (-sum) & 0xff
  }

  /** Reinterpret the low `bits` bits of v as a two's-complement signed int.
    * bits must be 1-64 (64 = identity): Java shifts wrap mod 64, so an
    * unguarded bits=0/64 silently returned 0 for EVERY input and a
    * negative bits computed a nonsense mask — from a registered SQL
    * function (round-13 review, confirmed by probe).
    */
  def signedNBit(v: Long, bits: Int): Long = {
    require(bits >= 1 && bits <= 64,
      s"signed_nbit: bits must be in [1,64], got $bits")
    if (bits == 64) v
    else {
      val masked = v & ((1L << bits) - 1)
      if ((masked & (1L << (bits - 1))) != 0) masked - (1L << bits) else masked
    }
  }

  /** Binary-coded-decimal decode: each hex nibble is one decimal digit. */
  def bcdDecode(v: Long): Long = {
    var x = v
    var mul = 1L
    var out = 0L
    while (x != 0) { out += (x & 0xf) * mul; mul *= 10; x >>>= 4 }
    out
  }

  /** Inverse of [[bcdDecode]]. */
  def bcdEncode(v: Long): Long = {
    var x = v
    var shift = 0
    var out = 0L
    while (x != 0) { out |= (x % 10) << shift; shift += 4; x /= 10 }
    out
  }

  private def md5Of(s: String): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))

  /** 64-bit SimHash over a token array: each token hashes to 64 bits (first
    * 8 bytes of its MD5); each bit position votes +1/-1; the sign vector is
    * the fingerprint. Standard Charikar construction (public algorithm).
    */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    // one digest per CALL, reset between tokens (the minhashSig pattern):
    // md5Of paid a JCA getInstance + allocation PER TOKEN in the hottest
    // per-document dedup projection (round-13 review)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val d = md.digest(
          tokens.getUTF8String(i).toString.getBytes(StandardCharsets.UTF_8))
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) != 0) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (votes(bit) > 0) out |= 1L << bit; bit += 1 }
    out
  }

  /** Polynomial rolling hash over the string's codepoints, mod 1e9+7 —
    * the document-fingerprinting primitive (deterministic, SQL-replicable
    * as list_reduce in the oracle dialect).
    */
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    val MOD = 1000000007L
    var acc = 0L
    var i = 0
    while (i < str.length) { acc = (acc * 31 + str.charAt(i)) % MOD; i += 1 }
    acc
  }

  // ---- GDC <-> UTM (WGS84, classic transverse-mercator series; public
  // formulas per Snyder, "Map Projections — A Working Manual", USGS 1987).
  // Reference behavior: /root/reference/src/util/gis/GisTools.java:214-352.

  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2 - F)
  private val EP2 = E2 / (1 - E2)
  private val K0 = 0.9996

  /** lat/lon degrees -> (easting, northing, zone, northHemisphere=1/0). */
  def gdcToUtm(latDeg: Double, lonDeg: Double): Array[Double] = {
    val zone = math.min(60, math.max(1, (math.floor((lonDeg + 180) / 6) + 1).toInt))
    val lam0 = math.toRadians(zone * 6 - 183)
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg)
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n = A / math.sqrt(1 - E2 * sinP * sinP)
    val t = tanP * tanP
    val c = EP2 * cosP * cosP
    val aa = (lam - lam0) * cosP
    val m = A * ((1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256) * phi
      - (3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024) * math.sin(2 * phi)
      + (15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024) * math.sin(4 * phi)
      - (35 * E2 * E2 * E2 / 3072) * math.sin(6 * phi))
    val e = K0 * n * (aa + (1 - t + c) * aa * aa * aa / 6
      + (5 - 18 * t + t * t + 72 * c - 58 * EP2) * math.pow(aa, 5) / 120) + 500000.0
    var nn = K0 * (m + n * tanP * (aa * aa / 2
      + (5 - t + 9 * c + 4 * c * c) * math.pow(aa, 4) / 24
      + (61 - 58 * t + t * t + 600 * c - 330 * EP2) * math.pow(aa, 6) / 720))
    val north = if (latDeg >= 0) 1.0 else 0.0
    if (north == 0.0) nn += 10000000.0
    Array(e, nn, zone.toDouble, north)
  }

  /** (easting, northing, zone, north) -> (latDeg, lonDeg). */
  def utmToGdc(easting: Double, northing: Double, zone: Int, north: Boolean): Array[Double] = {
    val x = easting - 500000.0
    val y = if (north) northing else northing - 10000000.0
    val m = y / K0
    val mu = m / (A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val phi1 = mu + (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
    val c1 = EP2 * cosP * cosP
    val t1 = tanP * tanP
    val n1 = A / math.sqrt(1 - E2 * sinP * sinP)
    val r1 = A * (1 - E2) / math.pow(1 - E2 * sinP * sinP, 1.5)
    val d = x / (n1 * K0)
    val lat = phi1 - (n1 * tanP / r1) * (d * d / 2
      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * EP2) * math.pow(d, 4) / 24
      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * EP2 - 3 * c1 * c1) * math.pow(d, 6) / 720)
    val lon = (d - (1 + 2 * t1 + c1) * d * d * d / 6
      + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * EP2 + 24 * t1 * t1) * math.pow(d, 5) / 120) / cosP
    Array(math.toDegrees(lat), math.toDegrees(lon) + (zone * 6 - 183))
  }

  /** Whitespace-split tokens, empties dropped — byte-level split on 0x20
    * (exact: a space byte never occurs inside a UTF-8 multibyte
    * sequence). Matches filter(split(text, " "), t -> t <> "").
    */
  def tokensWs(s: UTF8String): ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val bytes = s.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        if (i > start)
          out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, i))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct word n-grams joined by " ", first-occurrence order —
    * semantics identical to
    * array_distinct(transform(sequence(1, len-n+1), i ->
    * concat_ws(' ', slice(toks, i, n)))); empty array below n tokens.
    */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // SQL-registered: arbitrary n reaches here — fail clearly, not with
    // a NegativeArraySizeException from inside a task
    require(n > 0, s"shingles: n must be positive, got $n")
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      // null tokens via isNullAt, NOT getUTF8String: UnsafeArrayData
      // reads a null slot as an empty string while GenericArrayData
      // returns null — representation-dependent output. concatWs skips
      // null parts, which is exactly the documented concat_ws rendering.
      while (j < n) {
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Dynamic-time-warping distance between two integer series (full
    * window, |a_i - b_j| cost, symmetric step pattern) — the classic
    * O(n·m) DP (Sakoe & Chiba 1978), all-integer so the result is exact
    * and the DuckDB oracle's cell-by-cell recursive-CTE replay matches
    * bit for bit. Rolling single-row buffer: O(m) memory per call.
    * Empty input on either side, or a null element on either side,
    * yields -1 (no alignment). The function is registered as the
    * user-callable `dtw_dist`, so adversarial magnitudes must not wrap:
    * per-cell costs and the running sum saturate at Long.MaxValue/4
    * (far above any real alignment cost, never reached by the in-range
    * inputs the oracle replays) instead of silently overflowing.
    */
  def dtwDist(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return -1L
    var z = 0
    while (z < n) { if (a.isNullAt(z)) return -1L; z += 1 }
    z = 0
    while (z < m) { if (b.isNullAt(z)) return -1L; z += 1 }
    val SAT = Long.MaxValue / 4
    val INF = 1000000000000000L
    var prev = new Array[Long](m + 1)
    var curr = new Array[Long](m + 1)
    java.util.Arrays.fill(prev, INF)
    prev(0) = 0L
    var i = 1
    while (i <= n) {
      curr(0) = INF
      val ai = a.getLong(i - 1)
      var j = 1
      while (j <= m) {
        val bj = b.getLong(j - 1)
        val d = ai - bj
        // subtraction overflow (operands of opposite sign, result sign
        // flipped) or abs(Long.MinValue) -> saturate
        val cost =
          if (((ai ^ bj) & (ai ^ d)) < 0 || d == Long.MinValue) SAT
          else math.abs(d)
        var best = prev(j)
        if (prev(j - 1) < best) best = prev(j - 1)
        if (curr(j - 1) < best) best = curr(j - 1)
        curr(j) = if (best >= SAT - cost) SAT else cost + best
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  /** Dot product over double arrays, ascending index order (same
    * accumulation as aggregate(zip_with(a, b, *), 0.0, +) on
    * well-formed input). Ragged or null-element arrays RAISE instead of
    * silently truncating to the shorter side / reading null slots as
    * 0.0 — the lambda rendering nulls the whole sum there, so a silent
    * number would diverge from the documented equivalence; for an
    * embedding column, ragged rows are a data bug worth failing on.
    */
  def vecDot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"vec_dot: length mismatch ${n} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"vec_dot: null element at index $i")
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Squared L2 distance in ascending index order — bit-identical to the
    * aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0.0, _+_) lambda
    * rendering it replaces (same fold order, same 0.0 start).
    */
  def vecSqDist(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"vec_sqdist: length mismatch ${n} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"vec_sqdist: null element at index $i")
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  /** z-normalized Euclidean distance to a pattern; NaN when the window
    * std (population) is zero. Sums run in ascending index order — the
    * same accumulation as the lambda rendering
    * sqrt(aggregate(transform(win, (x,i) -> sq((x-mu)/sd - q_i)), 0, +)).
    */
  def znormDist(win: ArrayData, pattern: ArrayData): Double = {
    val n = win.numElements()
    if (n == 0) return Double.NaN
    var s = 0.0
    var i = 0
    while (i < n) { s += win.getDouble(i); i += 1 }
    val mu = s / n
    var v = 0.0
    i = 0
    while (i < n) {
      val d = win.getDouble(i) - mu
      v += d * d
      i += 1
    }
    val sd = math.sqrt(v / n)
    if (sd == 0.0) return Double.NaN
    // same policy as vecDot: a pattern/window length mismatch is a
    // caller bug — silently comparing only the overlapping prefix would
    // report a spuriously small distance
    require(pattern.numElements() == n,
      s"znorm_dist: length mismatch $n vs ${pattern.numElements()}")
    var acc = 0.0
    i = 0
    while (i < n) {
      val d = (win.getDouble(i) - mu) / sd - pattern.getDouble(i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  /** k-row MinHash signature over a shingle array: per seed, the
    * lexicographically smallest lowercase-hex md5 of "seed:shingle" —
    * exactly the rendering min(md5(concat(seed, ':', shingle))) the SQL
    * oracle recomputes, but in ONE codegen'd pass with no explode and no
    * (doc, seed) shuffle. Returns an empty array for an empty shingle set.
    */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // SQL-registered: same guard rail as the TopKAgg/KmvAgg aggregates —
    // k=0 would otherwise surface as an ArrayIndexOutOfBoundsException
    // from inside a task
    require(k > 0 && k <= (1 << 20),
      s"minhash_sig: k must be in [1, ${1 << 20}], got $k")
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    // hex strings compare like their unsigned digest bytes (each byte maps
    // to two monotonically-ordered hex digits), so the per-seed min runs
    // on raw byte arrays and only the k winners are hex-rendered —
    // the dominant cost is the k*n md5s, not allocation
    val prefixes = Array.tabulate(k)(s => (s.toString + ":").getBytes(StandardCharsets.UTF_8))
    val mins = new Array[Array[Byte]](k)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val sh = shingles.getUTF8String(i).getBytes
        var seed = 0
        while (seed < k) {
          md.reset()
          md.update(prefixes(seed))
          md.update(sh)
          val d = md.digest()
          if (mins(seed) == null ||
              java.util.Arrays.compareUnsigned(d, mins(seed)) < 0) mins(seed) = d
          seed += 1
        }
      }
      i += 1
    }
    // every element null leaves mins unset — same contract as empty input
    // (minhash_sig is SQL-registered, so arbitrary arrays reach here)
    if (mins(0) == null) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](k)
    var seed = 0
    while (seed < k) {
      val d = mins(seed)
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < d.length) {
        sb.append(Character.forDigit((d(j) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(d(j) & 0xf, 16))
        j += 1
      }
      out(seed) = UTF8String.fromString(sb.toString)
      seed += 1
    }
    new GenericArrayData(out)
  }

  /** Count of array elements contained in a (small, literal) string set —
    * the native twin of size(filter(toks, t -> t IN (...))), which renders
    * as a CodegenFallback lambda tree. Linear scan per token: stopword
    * sets are a handful of entries, so a hash set would cost more in
    * allocation than it saves in comparisons.
    */
  def countIn(toks: ArrayData, set: ArrayData): Int = {
    val n = toks.numElements()
    val m = set.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var j = 0
        var hit = false
        while (j < m && !hit) {
          if (!set.isNullAt(j) && t.equals(set.getUTF8String(j))) hit = true
          j += 1
        }
        if (hit) count += 1
      }
      i += 1
    }
    count
  }

  /** CRC16/MODBUS over raw bytes [0, len): same polynomial as
    * [[crc16Modbus]] (0xA001 reflected), for binary RTU frames.
    */
  def crc16ModbusBytes(b: Array[Byte], len: Int): Int = {
    var crc = 0xffff
    var i = 0
    while (i < len) {
      crc ^= b(i) & 0xff
      var j = 0
      while (j < 8) {
        crc = if ((crc & 1) != 0) (crc >>> 1) ^ 0xa001 else crc >>> 1
        j += 1
      }
      i += 1
    }
    crc
  }

  /** Decode a Modbus RTU frame: (slave, func, registers, crc_ok). The
    * CRC trails little-endian; registers decode for read responses
    * (func 3/4) and single-write echoes (func 5/6).
    */
  def modbusDecode(frame: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    if (frame.length < 4)
      return InternalRow(null, null, null, false)
    val n = frame.length
    val slave = frame(0) & 0xff
    val func = frame(1) & 0xff
    val crcStored = ((frame(n - 1) & 0xff) << 8) | (frame(n - 2) & 0xff)
    val crcOk = crc16ModbusBytes(frame, n - 2) == crcStored
    val regs: Array[Any] = func match {
      case 3 | 4 if n >= 5 =>
        val byteCount = math.min(frame(2) & 0xff, n - 5)
        (0 until byteCount / 2).map[Any] { i =>
          ((frame(3 + 2 * i) & 0xff) << 8) | (frame(4 + 2 * i) & 0xff)
        }.toArray
      case 5 | 6 if n >= 8 =>
        Array[Any](
          ((frame(2) & 0xff) << 8) | (frame(3) & 0xff),
          ((frame(4) & 0xff) << 8) | (frame(5) & 0xff))
      case _ => Array.empty[Any]
    }
    InternalRow(slave, func, new GenericArrayData(regs), crcOk)
  }

  /** Unicode NFC normalization (canonical composition). Already-normalized
    * strings (the overwhelmingly common case — Normalizer.isNormalized is a
    * cheap scan) return the input UTF8String without re-encoding.
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Jaro-Winkler similarity (Winkler 1990, the record-linkage standard):
    * Jaro base — matches within window floor(max(|a|,|b|)/2)-1, greedy
    * left-to-right; transpositions = floor(half/2) where `half` counts
    * out-of-order matched positions (INTEGER division, as in Winkler's
    * strcmp95 and Commons Text — an odd count floors; keeping the exact
    * half diverged from DuckDB on long low-similarity strings) — then
    * the Winkler prefix boost `j + l*0.1*(1-j)` for the common prefix
    * l <= 4, applied only when the Jaro base exceeds 0.7 (the classic
    * boost threshold; DuckDB's jaro_winkler_similarity agrees, which is
    * what lets the oracle hash-compare). Empty-vs-nonempty is 0; both
    * empty is 1. Operates on UTF-16 code units (fixture strings are
    * ASCII, where every convention coincides).
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    if (n == 0 && m == 0) return 1.0
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var k = 0
    var half = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) half += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - (half / 2).toDouble) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(n, m))
    while (l < maxL && s.charAt(l) == t.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
