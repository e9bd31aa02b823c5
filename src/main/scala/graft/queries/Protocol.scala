package graft.queries

import graft.{Q, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** Protocol/integrity operators (SURVEY.md §2.3 `nmea` rule, §2.5 checksum
  * rows): NMEA XOR checksum + validity, CRC16/MODBUS, LRC, signed N-bit
  * reinterpret, BCD — run through the native Catalyst expressions in
  * [[org.apache.spark.sql.graft]] so they stay inside whole-stage codegen.
  *
  * NMEA sentences are synthesized deterministically from `events` rows (the
  * fixtures carry no raw NMEA); the DuckDB oracle recomputes the checksum
  * with a list_reduce XOR lambda, so the whole path is cross-checked.
  */
object Protocol {

  private val bodySql =
    "concat('GPXTE,', event_type, ',', CAST(value AS VARCHAR), ',', CAST(user_id AS VARCHAR))"

  def defs: Seq[Q] = Seq(

    // The oracle replays the NMEA FRAMING, not just a whole-string XOR:
    // the checksum covers the text between a leading '$' and the first
    // '*' (the native nmea_checksum's contract) — a body containing '*'
    // (possible through props) or starting with '$' would otherwise
    // checksum differently in the two dialects (round-12 review; latent,
    // the synthesized body has neither today).
    Q("fn_nmea",
      s"""WITH b AS (SELECT event_id, $bodySql AS body FROM events),
         |fr AS (SELECT event_id, body,
         |  CASE WHEN starts_with(body, '$$') THEN substr(body, 2) ELSE body END AS b2
         |  FROM b),
         |fr2 AS (SELECT event_id, body,
         |  CASE WHEN strpos(b2, '*') > 0 THEN substr(b2, 1, strpos(b2, '*') - 1)
         |       ELSE b2 END AS bb
         |  FROM fr),
         |ck AS (SELECT event_id, body,
         |  upper(lpad(to_hex(list_reduce(
         |    list_transform(range(1, length(bb)+1), i -> ascii(substr(bb, i, 1))),
         |    (a, x) -> xor(a, x))), 2, '0')) AS checksum
         |  FROM fr2)
         |SELECT event_id, checksum,
         |  TRUE  AS valid_ok,
         |  FALSE AS tampered_ok
         |FROM ck""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("body", expr(bodySql.replace("VARCHAR", "STRING")))
        .withColumn("checksum", nmea_checksum(col("body")))
        .select(
          col("event_id"),
          col("checksum"),
          nmea_valid(concat(lit("$"), col("body"), lit("*"), col("checksum"))).as("valid_ok"),
          nmea_valid(concat(lit("$"), col("body"), lit("X*"), col("checksum"))).as("tampered_ok"))
    },

    // CRC16/MODBUS + LRC over the event_type string. The oracle pins the
    // expected codes per distinct value (precomputed with an independent
    // Python implementation of the public algorithms).
    Q("fn_crc",
      """SELECT event_id, event_type,
        |  CASE event_type WHEN 'click' THEN 23364 WHEN 'error' THEN 48766
        |    WHEN 'purchase' THEN 38661 WHEN 'signup' THEN 52238
        |    WHEN 'view' THEN 1697 END AS crc16,
        |  CASE event_type WHEN 'click' THEN 250 WHEN 'error' THEN 214
        |    WHEN 'purchase' THEN 165 WHEN 'signup' THEN 106
        |    WHEN 'view' THEN 69 END AS lrc
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(
          col("event_id"), col("event_type"),
          crc16_modbus(col("event_type")).as("crc16"),
          lrc8(col("event_type")).as("lrc"))
    },

    // Two's-complement reinterpretation + BCD decode of derived registers.
    Q("fn_signed_bcd",
      """SELECT event_id,
        |  CASE WHEN event_id % 4096 >= 2048 THEN event_id % 4096 - 4096
        |       ELSE event_id % 4096 END AS s12,
        |  CASE WHEN user_id % 256 >= 128 THEN user_id % 256 - 256
        |       ELSE user_id % 256 END AS s8,
        |  user_id % 100 AS bcd_roundtrip
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(
          col("event_id"),
          signed_nbit(col("event_id") % 4096, lit(12)).as("s12"),
          signed_nbit(col("user_id") % 256, lit(8)).as("s8"),
          bcd_decode(bcd_encode(col("user_id") % 100)).as("bcd_roundtrip"))
    },
  )
}
