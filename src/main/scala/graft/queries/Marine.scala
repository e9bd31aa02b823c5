package graft.queries

import graft.{Q, Tables}
import graft.functions.{Formulas, GraftFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marine-science operators (SURVEY.md §2.5: Calculations.java rows):
  * PSS-78 salinity, UNESCO sound velocity, true wind, haversine, GDC->UTM.
  *
  * CTD/nav inputs are synthesized deterministically from `events` columns.
  * Salinity and sound velocity are pure polynomial+sqrt formulas rendered
  * from ONE shared SQL fragment ([[Formulas]]) parsed by both Spark and
  * DuckDB — bit-identical doubles, no rounding. True wind and haversine use
  * libm trig (last-ulp differences between Java and C), so both sides round
  * to 4 decimals.
  */
object Marine {

  // Deterministic CTD/nav synthesis over events columns (same text in both
  // dialects; value is double, user_id/event_id are bigint in both).
  private val cond = "(30.0 + value/50.0)"
  private val temp = "(5.0 + (user_id % 20))"
  private val press = "(value * 10.0)"
  private val aws = "(value / 20.0)"
  private val awd = "((event_id * 37) % 360)"
  private val hdg = "((user_id * 11) % 360)"
  private val sog = "(value / 100.0)"
  private val cog = "((event_id * 53) % 360)"

  def defs: Seq[Q] = Seq(

    Q("fn_salinity", {
      val psal = Formulas.salinitySql(cond, temp, press)
      val svel = Formulas.soundVelocitySql(psal, temp, press)
      s"SELECT event_id, $psal AS psal, $svel AS svel FROM events"
    }) { (s, dir) =>
      // compute psal once as a column: the svel fragment references S in
      // four terms, and textual substitution would inline (and codegen)
      // the whole salinity polynomial 4x
      val psal = Formulas.salinitySql(cond, temp, press)
      val svel = Formulas.soundVelocitySql("psal", temp, press)
      Tables.load(s, dir, "events")
        .selectExpr("event_id", "value", "user_id", s"$psal AS psal")
        .selectExpr("event_id", "psal", s"$svel AS svel")
    },

    Q("fn_truewind", {
      val tws = Formulas.trueWindSpeedSql(aws, awd, hdg, sog, cog)
      val twd = Formulas.trueWindDirSql(aws, awd, hdg, sog, cog)
      s"SELECT event_id, ROUND($tws, 4) AS tws, ROUND($twd, 4) AS twd FROM events"
    }) { (s, dir) =>
      val tws = Formulas.trueWindSpeedSql(aws, awd, hdg, sog, cog)
      val twd = Formulas.trueWindDirSql(aws, awd, hdg, sog, cog)
      Tables.load(s, dir, "events")
        .selectExpr("event_id", s"ROUND($tws, 4) AS tws", s"ROUND($twd, 4) AS twd")
    },

    Q("fn_haversine", {
      val d = Formulas.haversineSql("(51.0 + value/1000.0)", "(3.0 + user_id/100.0)", "51.0", "3.0")
      s"SELECT event_id, ROUND($d, 4) AS dist_m FROM events"
    }) { (s, dir) =>
      val d = Formulas.haversineSql("(51.0 + value/1000.0)", "(3.0 + user_id/100.0)", "51.0", "3.0")
      Tables.load(s, dir, "events")
        .selectExpr("event_id", s"ROUND($d, 4) AS dist_m")
    },

    Q("fn_absorption", {
      val a = Formulas.soundAbsorptionSql(
        "(1.0 + value/10.0)", temp, "35.0", "(value*2.0)", "8.0")
      s"SELECT event_id, ROUND($a, 4) AS absorption_dbkm FROM events"
    }) { (s, dir) =>
      val a = Formulas.soundAbsorptionSql(
        "(1.0 + value/10.0)", temp, "35.0", "(value*2.0)", "8.0")
      Tables.load(s, dir, "events")
        .selectExpr("event_id", s"ROUND($a, 4) AS absorption_dbkm")
    },

    // GDC -> UTM projection: the oracle re-derives the WGS84 Krüger
    // series independently in SQL (same published formulas, different
    // implementation + different libm), both sides rounded to 2 dp (cm) —
    // far above trig ulp noise, so this is a genuine cross-implementation
    // check of the projection UDF, not a copy of it.
    Q("fn_utm",
      """WITH t AS (SELECT event_id,
        |    CAST(45.0 + value/100.0 AS DOUBLE) AS lat,
        |    CAST(3.0 + CAST(user_id AS DOUBLE)/10.0 AS DOUBLE) AS lon FROM events),
        |k AS (SELECT CAST(1.0/298.257223563 AS DOUBLE) AS f),
        |k2 AS (SELECT f, f*(2-f) AS e2 FROM k),
        |k3 AS (SELECT f, e2, e2/(1-e2) AS ep2, 6378137.0 AS a, 0.9996 AS k0 FROM k2),
        |u AS (SELECT event_id, lat, lon, radians(lat) AS phi,
        |    CAST(least(60, greatest(1, floor((lon + 180)/6) + 1)) AS INT) AS zone
        |  FROM t),
        |v AS (SELECT *, radians(lon - (zone*6 - 183)) * cos(phi) AS aa,
        |    sin(phi) AS sp, cos(phi) AS cp, tan(phi) AS tp FROM u),
        |w AS (SELECT event_id, lat, zone, aa, sp, tp,
        |    a/sqrt(1 - e2*sp*sp) AS n, tp*tp AS tt, ep2*cp*cp AS c,
        |    a*((1 - e2/4 - 3*e2*e2/64 - 5*e2*e2*e2/256)*phi
        |      - (3*e2/8 + 3*e2*e2/32 + 45*e2*e2*e2/1024)*sin(2*phi)
        |      + (15*e2*e2/256 + 45*e2*e2*e2/1024)*sin(4*phi)
        |      - (35*e2*e2*e2/3072)*sin(6*phi)) AS m,
        |    ep2, k0
        |  FROM v, k3)
        |SELECT event_id,
        |  round(k0*n*(aa + (1-tt+c)*aa*aa*aa/6
        |    + (5 - 18*tt + tt*tt + 72*c - 58*ep2)*pow(aa, 5.0)/120) + 500000.0, 2) AS easting,
        |  round(k0*(m + n*tp*(aa*aa/2
        |    + (5 - tt + 9*c + 4*c*c)*pow(aa, 4.0)/24
        |    + (61 - 58*tt + tt*tt + 600*c - 330*ep2)*pow(aa, 6.0)/720))
        |    + CASE WHEN lat >= 0 THEN 0.0 ELSE 10000000.0 END, 2) AS northing,
        |  zone, (lat >= 0) AS north
        |FROM w""".stripMargin) { (s, dir) =>
      val utm = GraftFunctions.gdc_to_utm(
        lit(45.0) + col("value") / 100.0, lit(3.0) + col("user_id") / 10.0)
      Tables.load(s, dir, "events")
        .withColumn("utm", utm)
        .select(
          col("event_id"),
          round(col("utm.easting"), 2).as("easting"),
          round(col("utm.northing"), 2).as("northing"),
          col("utm.zone").as("zone"),
          col("utm.north").as("north"))
    },

    // Grid-bucketed spatial self-join — the geohash/S2 pattern every
    // fleet-track engine uses for "vessels within R of each other":
    // positions quantize to a lat 0.005° × lon 0.008° grid, one side
    // explodes to its 9-cell neighbourhood, the join is a plain
    // equi-join on the cell key (shuffle on bounded keys — NEVER an
    // all-pairs distance cross product), and candidates verify with the
    // real haversine at R=500 m. Losslessness requires cell width ≥ R
    // on BOTH axes: 0.005° lat is 556 m everywhere, but a longitude
    // degree shrinks by cos(lat) — at this fixture's lat envelope
    // [51.0, 51.57] (value ≤ 560.21), 0.005° lon is only ~349 m, and a
    // square 0.005° grid silently dropped true pairs with Δlon in
    // (0.005°, R/(111320·cosφ)] on BOTH engines (round-11 review
    // finding — identical formula, identically wrong, hash-green).
    // 0.008° lon = 111320·0.008·cos(51.57) ≈ 554 m ≥ R across the
    // envelope; a general engine derives the lon width per latitude
    // stripe the same way. Each cell
    // retains at most 64 points (lowest event_id — deterministic), the
    // density guard every production spatial join ships: the fixture's
    // exponential value distribution piles ~10k points into the lowest
    // latitude rows (measured), and pairs-within-R output is inherently
    // quadratic in cell density — the cap bounds any cell's
    // contribution at 9·64² candidates, making the whole join linear
    // in the number of cells however skewed the fleet. Both engines
    // evaluate the identical haversine expression text, but the trig
    // goes through Java Math vs C libm (last-ulp differences), so d is
    // ROUNDED to 6 dp before the threshold and banding — comparing raw
    // doubles at exact edges was fixture-luck (round-12 review).
    // Output is the per-band pair count plus an id-sum checksum (any
    // lost or phantom pair breaks it). Same shape at 100 TB:
    // density-bounded cells, no global sort.
    Q("j_geo_bucket", {
      val d = Formulas.haversineSql("a.lat", "a.lon", "b.lat", "b.lon")
      s"""WITH p AS (SELECT event_id, 51.0 + value/1000.0 AS lat,
         |    3.0 + CAST(user_id AS DOUBLE)/1000.0 AS lon
         |  FROM events),
         |c0 AS (SELECT event_id, lat, lon,
         |    CAST(floor(lat/0.005) AS BIGINT) AS cy,
         |    CAST(floor(lon/0.008) AS BIGINT) AS cx FROM p),
         |c AS (SELECT event_id, lat, lon, cy, cx FROM (
         |    SELECT *, row_number() OVER (PARTITION BY cy, cx ORDER BY event_id) AS rn
         |    FROM c0) WHERE rn <= 64),
         |n AS (SELECT c.event_id, lat, lon, cy + dy.dy AS ky, cx + dx.dx AS kx
         |  FROM c CROSS JOIN (SELECT unnest([-1,0,1]) AS dy) dy
         |         CROSS JOIN (SELECT unnest([-1,0,1]) AS dx) dx),
         |cand AS (SELECT a.event_id AS ea, b.event_id AS eb,
         |    a.lat AS alat, a.lon AS alon, b.lat AS blat, b.lon AS blon
         |  FROM n a JOIN c b ON a.ky = b.cy AND a.kx = b.cx
         |    AND a.event_id < b.event_id),
         |v AS (SELECT ea, eb,
         |    round(${Formulas.haversineSql("alat", "alon", "blat", "blon")}, 6) AS d
         |  FROM cand)
         |SELECT CAST(floor(d/100) AS INT) AS band_100m, count(*) AS n_pairs,
         |  CAST(sum(ea + eb) AS BIGINT) AS id_checksum
         |FROM v WHERE d <= 500.0 GROUP BY 1""".stripMargin
    }) { (s, dir) =>
      val p = Tables.load(s, dir, "events")
        .selectExpr("event_id", "51.0 + value/1000.0 AS lat",
          "3.0 + CAST(user_id AS DOUBLE)/1000.0 AS lon")
        .selectExpr("event_id", "lat", "lon",
          "CAST(floor(lat/0.005) AS BIGINT) AS cy",
          "CAST(floor(lon/0.008) AS BIGINT) AS cx")
        .withColumn("rn", row_number().over(
          Window.partitionBy("cy", "cx").orderBy("event_id")))
        .filter(col("rn") <= 64).drop("rn")
        .transform(graft.operators.TextOps.trackCache)
      // HALF-neighborhood enumeration (round-14 optimization, guide §3.3
      // "explode before a join multiplies the shuffle"): the oracle's
      // spec-shaped 9-offset explode generates every cross-cell pair
      // TWICE (x probes y's cell and y probes x's) and filters one copy
      // with ea<eb. Exactly one of each ±offset pair in {(0,1),(1,-1),
      // (1,0),(1,1)} covers every adjacent unordered cell pair once, so
      // probing only those + the home cell emits each candidate pair
      // exactly once — 5/9 the exploded shuffle rows and ~half the
      // haversine evaluations. The home cell keeps the ea<eb orientation;
      // cross-cell pairs emit in probe orientation, and the haversine is
      // IEEE-symmetric in its endpoints (deltas are squared), so d —
      // hence the band, count and id-sum — is identical either way.
      val offs = Seq((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
        .map { case (dy, dx) => struct(lit(dy).as("dy"), lit(dx).as("dx")) }
      val a = p.withColumn("o", explode(array(offs: _*)))
        .select(col("event_id").as("ea"), col("lat").as("alat"), col("lon").as("alon"),
          (col("cy") + col("o.dy")).as("ky"), (col("cx") + col("o.dx")).as("kx"),
          (col("o.dy") === 0 && col("o.dx") === 0).as("home"))
      val b = p.select(col("event_id").as("eb"), col("lat").as("blat"),
        col("lon").as("blon"), col("cy"), col("cx"))
      val cand = a.join(b,
        col("ky") === col("cy") && col("kx") === col("cx") &&
          (!col("home") || col("ea") < col("eb")))
      // d is ROUNDED to 6 dp before the <=500 gate and the 100 m banding
      // (matching the oracle text): sin/asin take Java-Math vs C-libm
      // paths, and comparing raw last-ulp-different doubles at exact
      // thresholds would let a pair on a band edge flip on one engine
      // only (round-12 review finding; every other trig row already
      // rounds for this reason). Micrometer rounding is far below the
      // grid's physical meaning.
      cand
        .selectExpr("ea", "eb",
          s"round(${Formulas.haversineSql("alat", "alon", "blat", "blon")}, 6) AS d")
        .filter(col("d") <= 500.0)
        .groupBy(floor(col("d") / 100).cast("int").as("band_100m"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("ea") + col("eb")).as("id_checksum"))
    },
  )
}
