package graft.queries

import graft.{Q, Tables}
import graft.functions.{Formulas, GraftFunctions}
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

    // GDC -> UTM projection: transcendental series, not SQL-replicable at
    // bit precision -> rows-only check here; correctness is covered by the
    // round-trip + hand-checked goldens in FunctionsSpec.
    Q.noOracle("fn_utm") { (s, dir) =>
      val utm = GraftFunctions.gdc_to_utm(
        lit(45.0) + col("value") / 100.0, lit(3.0) + col("user_id") / 10.0)
      Tables.load(s, dir, "events")
        .withColumn("utm", utm)
        .select(
          col("event_id"),
          col("utm.easting").as("easting"),
          col("utm.northing").as("northing"),
          col("utm.zone").as("zone"),
          col("utm.north").as("north"))
    },
  )
}
