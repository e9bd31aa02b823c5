package graft.functions

/** Shared-dialect SQL formula fragments.
  *
  * Each builder renders ONE expression string that both Spark SQL and the
  * DuckDB oracle parse. Both engines coerce the literals the same way and
  * evaluate +,-,*,/,sqrt as IEEE-754 doubles, so pure-polynomial formulas
  * (salinity, sound velocity) come out bit-identical in both engines — no
  * rounding fudge needed. Formulas using libm trig/ln (true wind,
  * haversine) can differ in the last ulp between Java and C math libs, so
  * queries round those to a few decimals on both sides.
  *
  * Reference semantics: UNESCO PSS-78 salinity and Chen&Millero sound
  * velocity as in `/root/reference/src/util/math/Calculations.java:20-197`,
  * true wind `Calculations.java:198-391` — reimplemented here from the
  * published UNESCO TR 44 / NOAA formulas, not from the reference code.
  */
object Formulas {

  /** PSS-78 practical salinity.
    * @param c conductivity in mS/cm  @param t temperature °C (IPTS-68)
    * @param p pressure in decibar
    */
  def salinitySql(c0: String, t0: String, p0: String): String = {
    // force double math: a BIGINT/DECIMAL input would otherwise take the
    // engines' decimal arithmetic paths, which round differently
    val c = s"CAST($c0 AS DOUBLE)"
    val t = s"CAST($t0 AS DOUBLE)"
    val p = s"CAST($p0 AS DOUBLE)"
    val r = s"(($c)/42.914)"
    val rt = s"(0.6766097 + 2.00564e-2*($t) + 1.104259e-4*($t)*($t) " +
      s"+ (-6.9698e-7)*($t)*($t)*($t) + 1.0031e-9*($t)*($t)*($t)*($t))"
    val rp = s"(1 + (($p)*(2.070e-5 + (-6.370e-10)*($p) + 3.989e-15*($p)*($p))) / " +
      s"(1 + 3.426e-2*($t) + 4.464e-4*($t)*($t) + (4.215e-1 + (-3.107e-3)*($t))*$r))"
    val x = s"($r/($rp*$rt))" // Rt
    val sq = s"sqrt($x)"
    val dS = s"(((($t)-15)/(1+0.0162*(($t)-15))) * " +
      s"(0.0005 + (-0.0056)*$sq + (-0.0066)*$x + (-0.0375)*$x*$sq " +
      s"+ 0.0636*$x*$x + (-0.0144)*$x*$x*$sq))"
    s"(0.0080 + (-0.1692)*$sq + 25.3851*$x + 14.0941*$x*$sq " +
      s"+ (-7.0261)*$x*$x + 2.7081*$x*$x*$sq + $dS)"
  }

  /** UNESCO (Chen & Millero 1977, per UNESCO TR 44 1983) sound speed, m/s.
    * @param s salinity PSU  @param t temperature °C  @param p pressure dbar
    */
  def soundVelocitySql(s0: String, t0: String, p0: String): String = {
    val s = s"CAST($s0 AS DOUBLE)"
    val T = s"(CAST($t0 AS DOUBLE))"
    val P = s"((CAST($p0 AS DOUBLE))/10.0)" // formula coefficients expect bar
    def tp(n: Int): String = Seq.fill(n)(T).mkString("*")
    val cw = s"((1402.388 + 5.03711*$T + (-5.80852e-2)*${tp(2)} + 3.3420e-4*${tp(3)} " +
      s"+ (-1.47800e-6)*${tp(4)} + 3.1464e-9*${tp(5)}) " +
      s"+ (0.153563 + 6.8982e-4*$T + (-8.1788e-6)*${tp(2)} + 1.3621e-7*${tp(3)} + (-6.1185e-10)*${tp(4)})*$P " +
      s"+ (3.1260e-5 + (-1.7107e-6)*$T + 2.5974e-8*${tp(2)} + (-2.5335e-10)*${tp(3)} + 1.0405e-12*${tp(4)})*$P*$P " +
      s"+ ((-9.7729e-9) + 3.8504e-10*$T + (-2.3643e-12)*${tp(2)})*$P*$P*$P)"
    val a = s"((1.389 + (-1.262e-2)*$T + 7.164e-5*${tp(2)} + 2.006e-6*${tp(3)} + (-3.21e-8)*${tp(4)}) " +
      s"+ (9.4742e-5 + (-1.2580e-5)*$T + (-6.4885e-8)*${tp(2)} + 1.0507e-8*${tp(3)} + (-2.0122e-10)*${tp(4)})*$P " +
      s"+ ((-3.9064e-7) + 9.1041e-9*$T + (-1.6002e-10)*${tp(2)} + 7.988e-12*${tp(3)})*$P*$P " +
      s"+ (1.100e-10 + 6.649e-12*$T + (-3.389e-13)*${tp(2)})*$P*$P*$P)"
    val b = s"((-1.922e-2) + (-4.42e-5)*$T + (7.3637e-5 + 1.7945e-7*$T)*$P)"
    val d = s"(1.727e-3 + (-7.9836e-6)*$P)"
    s"($cw + $a*($s) + $b*($s)*sqrt($s) + $d*($s)*($s))"
  }

  /** True wind speed (m/s) from apparent wind + ship motion.
    * @param aws apparent wind speed  @param awd apparent direction, deg
    *            relative to bow  @param hdg heading deg
    * @param sog speed over ground  @param cog course over ground deg
    */
  def trueWindU(aws: String, awd: String, hdg: String, sog: String, cog: String): String =
    s"((-($aws))*sin(radians(($hdg)+($awd))) + ($sog)*sin(radians($cog)))"
  def trueWindV(aws: String, awd: String, hdg: String, sog: String, cog: String): String =
    s"((-($aws))*cos(radians(($hdg)+($awd))) + ($sog)*cos(radians($cog)))"

  def trueWindSpeedSql(aws: String, awd: String, hdg: String, sog: String, cog: String): String = {
    val u = trueWindU(aws, awd, hdg, sog, cog)
    val v = trueWindV(aws, awd, hdg, sog, cog)
    s"sqrt($u*$u + $v*$v)"
  }

  /** Meteorological true wind direction, [0, 360) degrees FROM which;
    * calm (speed ~ 0) reports 0 by convention — at zero magnitude the
    * angle is numerically undefined (last-ulp trig noise picks the
    * quadrant), so engines would disagree. `+ 0.0` also normalizes IEEE
    * -0.0 (the engines' round() disagree on the zero sign). Both cases
    * surfaced only at sf0.1 row counts.
    *
    * The fold of a negative raw angle (`raw + 360`) can ROUND to exactly
    * 360.0 when |raw| is below half an ulp of 360 (~2.8e-14°) — a real
    * sf0.1 row (event 4860: awd=hdg=cog=180) produced raw = -1.3e-14 and
    * both engines emitted 360.0, violating the documented [0,360) range
    * hash-green (round-12 review finding, empirically confirmed). A
    * >= 360 result can only arise from that rounding, i.e. the true
    * direction is 0 — map it there explicitly.
    */
  def trueWindDirSql(aws: String, awd: String, hdg: String, sog: String, cog: String): String = {
    val u = trueWindU(aws, awd, hdg, sog, cog)
    val v = trueWindV(aws, awd, hdg, sog, cog)
    val speed = trueWindSpeedSql(aws, awd, hdg, sog, cog)
    val raw = s"degrees(atan2(-($u), -($v)))"
    val folded = s"(CASE WHEN $raw < 0 THEN $raw + 360 ELSE $raw + 0.0 END)"
    s"(CASE WHEN $speed < 1e-9 THEN 0.0 " +
      s"WHEN $folded >= 360.0 THEN 0.0 ELSE $folded END)"
  }

  /** Great-circle distance in meters (haversine, R=6371000). */
  def haversineSql(lat1: String, lon1: String, lat2: String, lon2: String): String = {
    val sdLat = s"sin(radians(($lat2)-($lat1))/2)"
    val sdLon = s"sin(radians(($lon2)-($lon1))/2)"
    s"(2*6371000.0*asin(sqrt($sdLat*$sdLat + " +
      s"cos(radians($lat1))*cos(radians($lat2))*$sdLon*$sdLon)))"
  }

  /** Francois-Garrison (1982) seawater sound absorption, dB/km.
    * Public formula; reference row `Calculations.java:392-424`.
    * @param f frequency kHz  @param t temp °C  @param s salinity PSU
    * @param d depth m  @param ph pH
    * Uses exp(ln10*x) for 10^x so both dialects take the same libm path;
    * round outputs to ~4dp when oracle-matching (exp/ln are last-ulp
    * engine-dependent).
    */
  def soundAbsorptionSql(f: String, t: String, s: String, d: String, ph: String): String = {
    val F = s"(CAST($f AS DOUBLE))"
    val T = s"(CAST($t AS DOUBLE))"
    val S = s"(CAST($s AS DOUBLE))"
    val D = s"(CAST($d AS DOUBLE))"
    val PH = s"(CAST($ph AS DOUBLE))"
    val ln10 = "2.302585092994046"
    val c = s"(1412.0 + 3.21*$T + 1.19*$S + 0.0167*$D)"
    // boric acid
    val a1 = s"((8.86/$c)*exp($ln10*(0.78*$PH - 5.0)))"
    val f1 = s"(2.8*sqrt($S/35.0)*exp($ln10*(4.0 - 1245.0/($T + 273.0))))"
    // magnesium sulphate
    val a2 = s"((21.44*$S/$c)*(1.0 + 0.025*$T))"
    val p2 = s"(1.0 + (-1.37e-4)*$D + 6.2e-9*$D*$D)"
    val f2 = s"((8.17*exp($ln10*(8.0 - 1990.0/($T + 273.0))))/(1.0 + 0.0018*($S - 35.0)))"
    // pure water
    val a3 = s"(CASE WHEN $T <= 20.0 THEN " +
      s"4.937e-4 + (-2.59e-5)*$T + 9.11e-7*$T*$T + (-1.50e-8)*$T*$T*$T " +
      s"ELSE 3.964e-4 + (-1.146e-5)*$T + 1.45e-7*$T*$T + (-6.5e-10)*$T*$T*$T END)"
    val p3 = s"(1.0 + (-3.83e-5)*$D + 4.9e-10*$D*$D)"
    s"($a1*$f1*$F*$F/($f1*$f1 + $F*$F) + $a2*$p2*$f2*$F*$F/($f2*$f2 + $F*$F) + $a3*$p3*$F*$F)"
  }

  /** 2nd-order calibration polynomial a*x^2 + b*x + c (SURVEY §2.5). */
  def calibrate2Sql(x: String, a: Double, b: Double, c: Double): String =
    s"(($a)*($x)*($x) + ($b)*($x) + ($c))"
}
