package graft.queries

import graft.{Q, Tables}
import graft.operators.{Edits, FilterRules}
import graft.functions.Formulas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The dcafs line plane (SURVEY.md §2.3 filters, §2.4 edits, §2.5 math,
  * §2.6 parse) exercised end-to-end: a text "line" is synthesized from
  * events columns, pushed through the [[graft.operators]] combinators, and
  * every rule/edit is hash-checked against a DuckDB rendering of the same
  * semantics.
  */
object PipelineQueries {

  // Declared fixture-domain envelope for the whole line plane (round-12
  // review): (a) double->string rendering agrees between the engines only
  // for 1e-3 <= |value| < 1e7 (Spark switches to scientific notation at
  // 1e7, DuckDB doesn't) — the fixture's value stays under ~561 and the
  // write-back products under ~5e6; (b) the oracles assume NO NULL line
  // fields (concat_ws skips a NULL column, shortening the line; the
  // store-default replay on both sides assumes the 4-field shape). Both
  // are properties of the synthesized line, not of the operators; a
  // fixture change that breaks either shows up as a hash mismatch, not a
  // silent agreement.
  private val lineSqlDuck =
    "concat_ws(',', event_type, CAST(value AS VARCHAR), CAST(user_id AS VARCHAR), props)"
  private val lineSqlSpark =
    "concat_ws(',', event_type, CAST(value AS STRING), CAST(user_id AS STRING), props)"

  private def withLine(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").withColumn("line", expr(lineSqlSpark))

  def defs: Seq[Q] = Seq(

    // §2.3 string-shape rules as boolean columns.
    Q("op_filter_string",
      s"""WITH t AS (SELECT event_id, $lineSqlDuck AS line FROM events)
         |SELECT event_id,
         |  (line LIKE 's%' OR line LIKE 'c%') AS f_start,
         |  NOT line LIKE 'p%' AS f_nostart,
         |  line LIKE '%}' AS f_end,
         |  contains(line, 'ur') AS f_contain,
         |  substr(line, 3, 1) = 'i' AS f_cstart,
         |  substr(line, length(line)-1, 1) = '}' AS f_cend
         |FROM t""".stripMargin) { (s, dir) =>
      val df = withLine(s, dir)
      df.select(
        col("event_id"),
        FilterRules.start(col("line"), "s", "c").as("f_start"),
        FilterRules.nostart(col("line"), "p").as("f_nostart"),
        FilterRules.end(col("line"), "}").as("f_end"),
        FilterRules.contain(col("line"), "ur").as("f_contain"),
        FilterRules.cStart(col("line"), 3, "i").as("f_cstart"),
        FilterRules.cEnd(col("line"), 2, "}").as("f_cend"))
    },

    // §2.3 length/item-count/regex/math rules.
    Q("op_filter_shape",
      s"""WITH t AS (SELECT event_id, value, user_id, $lineSqlDuck AS line FROM events)
         |SELECT event_id,
         |  length(line) BETWEEN 20 AND 40 AS f_len,
         |  len(string_split(line, ',')) = 4 AS f_items,
         |  regexp_full_match(line, '[a-z]+,.*') AS f_regex,
         |  (value < 250 AND value > 10 AND user_id > 5) AS f_math
         |FROM t""".stripMargin) { (s, dir) =>
      val df = withLine(s, dir)
      df.select(
        col("event_id"),
        FilterRules.lengthBetween(col("line"), 20, 40).as("f_len"),
        FilterRules.itemsBetween(col("line"), ",", 4, 4).as("f_items"),
        FilterRules.regex(col("line"), "[a-z]+,.*").as("f_regex"),
        (col("value") < 250 && col("value") > 10 && col("user_id") > 5).as("f_math"))
    },

    // §2.3 pass/reverse branch routing (FilterForward reversed targets).
    Q("op_filter_branch",
      s"""WITH t AS (SELECT event_id, value, $lineSqlDuck AS line FROM events)
         |SELECT event_id,
         |  CASE WHEN length(line) > 25 AND value < 400 THEN 'pass'
         |       ELSE 'reject' END AS branch
         |FROM t""".stripMargin) { (s, dir) =>
      val df = withLine(s, dir)
      val rules = Seq(length(col("line")) > 25, col("value") < 400)
      val (pass, reject) = FilterRules.branch(df, rules)
      pass.select(col("event_id"), lit("pass").as("branch"))
        .unionAll(reject.select(col("event_id"), lit("reject").as("branch")))
    },

    // §2.3 ignores=N alarm suppression: among alarm rows per user (value
    // >= 100), keep every 3rd (ignores=2) in (ts, event_id) order.
    Q("op_filter_ignores",
      """SELECT event_id FROM (
        |  SELECT event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE value >= 100) t
        |WHERE rn % 3 = 1""".stripMargin) { (s, dir) =>
      graft.operators.FilterRules.withIgnores(
        Tables.load(s, dir, "events"),
        pass = col("value") >= 100,
        keyCol = col("user_id"),
        order = Seq(col("ts"), col("event_id")),
        ignores = 2)
        .select("event_id")
    },

    // §2.4 resplit leftover=append: fields beyond the template re-attach.
    Q("op_edit_leftover",
      s"""WITH t AS (SELECT event_id, $lineSqlDuck AS line FROM events)
         |SELECT event_id,
         |  concat(string_split(line, ',')[2], '|', string_split(line, ',')[1],
         |         CASE WHEN len(string_split(line, ',')) > 2
         |              THEN ',' || array_to_string(string_split(line, ',')[3:], ',')
         |              ELSE '' END) AS out
         |FROM t""".stripMargin) { (s, dir) =>
      // the oracle's leftover append is CONDITIONAL like the operator's
      // (Edits.resplit only re-attaches the delimiter when fields remain
      // beyond the template — an unconditional ',' gave short lines a
      // trailing delimiter in DuckDB only; round-12 review)
      withLine(s, dir)
        .select(
          col("event_id"),
          Edits.resplit(col("line"), ",", "i1|i0", leftoverAppend = true).as("out"))
    },

    // §2.4 affix/cut/replace edits chained into one projection.
    Q("op_edit_affix",
      s"""WITH t AS (SELECT event_id, $lineSqlDuck AS line FROM events)
         |SELECT event_id,
         |  substr(concat(substr(concat('<', line, '>'), 1, 5), '|',
         |                substr(concat('<', line, '>'), 6)),
         |         3, greatest(length(line), 0)) AS affixed,
         |  replace(line, 'a', '@') AS replaced,
         |  replace(line, 'e', '') AS removed,
         |  trim('  ' || line || ' ') AS trimmed
         |FROM t""".stripMargin) { (s, dir) =>
      val df = withLine(s, dir)
      val chained = Edits.cutend(
        Edits.cutstart(
          Edits.insert(Edits.append(Edits.prepend(col("line"), "<"), ">"), 5, "|"), 2), 1)
      df.select(
        col("event_id"),
        chained.as("affixed"),
        Edits.replaceLit(col("line"), "a", "@").as("replaced"),
        Edits.removeLit(col("line"), "e").as("removed"),
        Edits.trimEdit(concat(lit("  "), col("line"), lit(" "))).as("trimmed"))
    },

    // §2.4 resplit (i-template) + charsplit.
    Q("op_edit_resplit",
      s"""WITH t AS (SELECT event_id, $lineSqlDuck AS line FROM events)
         |SELECT event_id,
         |  concat(string_split(line, ',')[3], '-', string_split(line, ',')[1],
         |         ':', string_split(line, ',')[2], '!') AS resplit,
         |  concat_ws(':', substr(line, 1, 3), substr(line, 4, 4),
         |            substr(line, 8, 1000000)) AS charsplit
         |FROM t""".stripMargin) { (s, dir) =>
      val df = withLine(s, dir)
      df.select(
        col("event_id"),
        Edits.resplit(col("line"), ",", "i2-i0:i1!").as("resplit"),
        Edits.charsplit(col("line"), ":", 4, 8).as("charsplit"))
    },

    // §2.4 regex edits.
    Q("op_edit_regex",
      s"""WITH t AS (SELECT event_id, $lineSqlDuck AS line FROM events)
         |SELECT event_id,
         |  regexp_replace(line, '[0-9]+', 'N', 'g') AS rexreplace,
         |  regexp_replace(line, '[aeiou]', '', 'g') AS rexremove,
         |  array_to_string(regexp_extract_all(line, '[0-9]+'), '-') AS rexkeep
         |FROM t""".stripMargin) { (s, dir) =>
      val df = withLine(s, dir)
      df.select(
        col("event_id"),
        Edits.rexreplace(col("line"), "[0-9]+", "N").as("rexreplace"),
        Edits.rexremove(col("line"), "[aeiou]").as("rexremove"),
        Edits.rexkeep(col("line"), "[0-9]+", "-").as("rexkeep"))
    },

    // §2.4 date edits: redate / retime / millisdate.
    Q("op_edit_dates",
      """SELECT event_id,
        |  strftime(strptime(strftime(CAST(ts AS TIMESTAMP), '%Y%m%d'), '%Y%m%d'),
        |           '%d/%m/%Y') AS redate,
        |  strftime(strptime(strftime(CAST(ts AS TIMESTAMP), '%H%M%S'), '%H%M%S'),
        |           '%H:%M') AS retime,
        |  strftime(epoch_ms(epoch_ms(CAST(ts AS TIMESTAMP))), '%Y-%m-%d %H:%M:%S') AS millisdate
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(
          col("event_id"),
          Edits.redate(date_format(col("ts"), "yyyyMMdd"), "yyyyMMdd", "dd/MM/yyyy").as("redate"),
          Edits.redate(date_format(col("ts"), "HHmmss"), "HHmmss", "HH:mm").as("retime"),
          Edits.millisdate(unix_millis(col("ts")), "yyyy-MM-dd HH:mm:ss").as("millisdate"))
    },

    // §2.4 toascii + listreplace.
    Q("op_edit_misc",
      """SELECT event_id,
        |  chr(CAST(65 + user_id % 26 AS INT)) || chr(CAST(97 + event_id % 26 AS INT)) AS toascii,
        |  (['red','green','blue','amber'])[CAST(user_id % 4 AS INT) + 1] AS listreplace
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(
          col("event_id"),
          Edits.toascii(
            concat_ws(",", (lit(65) + col("user_id") % 26).cast("int"),
              (lit(97) + col("event_id") % 26).cast("int")), ",").as("toascii"),
          Edits.listreplace(col("user_id") % 4, 0,
            Seq("red", "green", "blue", "amber")).as("listreplace"))
    },

    // §2.5 arithmetic op set (MathUtils binary ops): row-level IEEE doubles
    // are deterministic and identical across engines; scale-8 HALF_UP
    // division == round() on positives.
    Q("op_math_arith",
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity + l_extendedprice AS add_,
        |  l_quantity - l_discount AS sub_,
        |  l_quantity * l_tax AS mul_,
        |  round(l_extendedprice / l_quantity, 8) AS div8,
        |  l_linenumber % 3 AS mod_,
        |  l_discount * l_discount AS pow2,
        |  sqrt(l_quantity) AS pow_half,
        |  abs(l_discount - 0.05) AS abs_,
        |  round(l_extendedprice / 7.0, 2) AS scaled
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") + col("l_extendedprice")).as("add_"),
          (col("l_quantity") - col("l_discount")).as("sub_"),
          (col("l_quantity") * col("l_tax")).as("mul_"),
          round(col("l_extendedprice") / col("l_quantity"), 8).as("div8"),
          (col("l_linenumber") % 3).as("mod_"),
          (col("l_discount") * col("l_discount")).as("pow2"),
          sqrt(col("l_quantity")).as("pow_half"),
          abs(col("l_discount") - 0.05).as("abs_"),
          round(col("l_extendedprice") / 7.0, 2).as("scaled"))
    },

    // §2.5 transcendental functions (libm differs in the last ulp between
    // JVM and C -> round to 4dp on both sides).
    Q("op_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  round(ln(l_extendedprice), 4) AS ln_,
        |  round(log10(l_extendedprice), 4) AS log10_,
        |  round(sin(radians(l_quantity)), 4) AS sind,
        |  round(cos(radians(l_quantity)), 4) AS cosd,
        |  round(sin(l_discount), 4) AS sinr,
        |  round(exp(l_discount), 4) AS exp_,
        |  round(atan2(l_quantity, l_extendedprice), 4) AS atan2_
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(log(col("l_extendedprice")), 4).as("ln_"),
          round(log10(col("l_extendedprice")), 4).as("log10_"),
          round(sin(radians(col("l_quantity"))), 4).as("sind"),
          round(cos(radians(col("l_quantity"))), 4).as("cosd"),
          round(sin(col("l_discount")), 4).as("sinr"),
          round(exp(col("l_discount")), 4).as("exp_"),
          round(atan2(col("l_quantity"), col("l_extendedprice")), 4).as("atan2_"))
    },

    // §2.5 calibration polynomials + hex conversion.
    Q("op_math_calibrate", {
      val c2 = Formulas.calibrate2Sql("l_quantity", 0.02, 1.1, -3.0)
      s"""SELECT l_orderkey, l_linenumber,
         |  $c2 AS cal2,
         |  (0.001*l_quantity*l_quantity*l_quantity + $c2) AS cal3,
         |  CAST(l_linenumber AS VARCHAR) AS hexconv
         |FROM lineitem""".stripMargin
    }) { (s, dir) =>
      val c2 = Formulas.calibrate2Sql("l_quantity", 0.02, 1.1, -3.0)
      Tables.load(s, dir, "lineitem")
        .selectExpr(
          "l_orderkey", "l_linenumber",
          s"$c2 AS cal2",
          s"(0.001*l_quantity*l_quantity*l_quantity + $c2) AS cal3",
          "conv(lpad(hex(l_linenumber), 4, '0'), 16, 10) AS hexconv")
    },

    // §2.6 Generic: split -> typed columns with defaults on parse failure.
    Q("op_parse_generic",
      s"""WITH t AS (SELECT event_id, $lineSqlDuck AS line FROM events),
         |p AS (SELECT event_id, string_split(line, ',') AS f FROM t)
         |SELECT event_id,
         |  f[1] AS macro_col,
         |  COALESCE(TRY_CAST(f[2] AS DOUBLE), -999.0) AS real_col,
         |  COALESCE(TRY_CAST(f[3] AS BIGINT), -1) AS int_col,
         |  COALESCE(TRY_CAST(f[1] AS DOUBLE), -999.0) AS failed_real
         |FROM p""".stripMargin) { (s, dir) =>
      withLine(s, dir)
        .withColumn("f", split(col("line"), ","))
        .select(
          col("event_id"),
          try_element_at(col("f"), lit(1)).as("macro_col"),
          coalesce(try_element_at(col("f"), lit(2)).try_cast("double"), lit(-999.0)).as("real_col"),
          coalesce(try_element_at(col("f"), lit(3)).try_cast("bigint"), lit(-1L)).as("int_col"),
          coalesce(try_element_at(col("f"), lit(1)).try_cast("double"), lit(-999.0)).as("failed_real"))
    },

    // §2.6 Generic `nrs` mode + storeInRealVal (whole-line double).
    Q("op_parse_nrs",
      """SELECT event_id,
        |  CAST(regexp_extract_all(props, '[0-9]+')[1] AS BIGINT) AS k_num,
        |  CAST(CAST(value AS VARCHAR) AS DOUBLE) AS store_real
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(
          col("event_id"),
          try_element_at(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)), lit(1))
            .cast("bigint").as("k_num"),
          col("value").cast("string").cast("double").as("store_real"))
    },

    // §2.6/§1.2 FlagVal parsing: "true/1/high/yes/on" are truthy.
    Q("op_parse_flag",
      """WITH t AS (SELECT event_id,
        |  (['true','0','HIGH','no','on','1','false',' yes ','off','low'])
        |    [CAST(event_id % 10 AS INT) + 1] AS raw FROM events)
        |SELECT event_id, raw,
        |  lower(trim(raw)) IN ('true','1','high','yes','on') AS flag
        |FROM t""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("raw", element_at(
          array(Seq("true", "0", "HIGH", "no", "on", "1", "false", " yes ", "off", "low")
            .map(lit): _*),
          (col("event_id") % 10).cast("int") + 1))
        .select(col("event_id"), col("raw"), graft.operators.Parse.flag(col("raw")).as("flag"))
    },

    // §2.6 ValMap: key=value lines, multi-record split, key routing.
    Q("op_parse_valmap",
      """WITH t AS (SELECT event_id,
        |    concat('temp=', CAST(value AS VARCHAR), ';user=', CAST(user_id AS VARCHAR),
        |           ';type=', event_type) AS kv FROM events),
        |x AS (SELECT event_id, unnest(string_split(kv, ';')) AS pair FROM t),
        |p AS (SELECT event_id, string_split(pair, '=')[1] AS key,
        |             string_split(pair, '=')[2] AS val FROM x)
        |SELECT event_id, key, val,
        |  CASE WHEN key = 'type' THEN
        |    CASE val WHEN 'purchase' THEN 'P' WHEN 'click' THEN 'C'
        |      WHEN 'error' THEN 'E' WHEN 'signup' THEN 'S'
        |      WHEN 'view' THEN 'V' ELSE '?' END
        |  ELSE val END AS val_mapped
        |FROM p""".stripMargin) { (s, dir) =>
      // value-translation dictionary for text keys (ValMap.java:117-154)
      val dict = Map("purchase" -> "P", "click" -> "C", "error" -> "E",
        "signup" -> "S", "view" -> "V")
      val translate = dict.foldLeft(when(lit(false), "")) {
        case (acc, (k, v)) => acc.when(col("val") === k, v)
      }.otherwise("?")
      Tables.load(s, dir, "events")
        .withColumn("kv", concat(
          lit("temp="), col("value").cast("string"),
          lit(";user="), col("user_id").cast("string"),
          lit(";type="), col("event_type")))
        .select(col("event_id"), explode(split(col("kv"), ";")).as("pair"))
        .select(
          col("event_id"),
          try_element_at(split(col("pair"), "="), lit(1)).as("key"),
          try_element_at(split(col("pair"), "="), lit(2)).as("val"))
        .withColumn("val_mapped",
          when(col("key") === "type", translate).otherwise(col("val")))
    },

    // SFT loss-mask construction — the per-token supervision map an
    // instruction-tuning pipeline emits alongside pl_pack's windows:
    // tokens segment into alternating 8-token user/assistant turns and
    // only assistant positions carry loss. Output per doc: token/turn
    // volumes, masked-token count, span count, and a position-weighted
    // mask checksum — any off-by-one in the turn boundaries or role
    // parity breaks the hash. Pure row-local positional arithmetic
    // (posexplode + integer div), no exchange before the per-doc agg;
    // at 100 TB this fuses into the same scan that tokenizes.
    Q("pl_loss_mask",
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |e AS (SELECT doc_id, len(w) AS n_tokens,
        |    unnest([{'p': i - 1} for i in range(1, len(w) + 1)]) AS s
        |  FROM t),
        |m AS (SELECT doc_id, n_tokens, s.p AS p, s.p // 8 AS turn,
        |    CASE WHEN (s.p // 8) % 2 = 1 THEN 1 ELSE 0 END AS masked
        |  FROM e)
        |SELECT doc_id, n_tokens,
        |  CAST(max(turn) + 1 AS BIGINT) AS n_turns,
        |  CAST(sum(masked) AS BIGINT) AS n_loss_tokens,
        |  CAST(count(DISTINCT CASE WHEN masked = 1 THEN turn END) AS BIGINT) AS n_spans,
        |  CAST(sum(masked * (p + 1)) AS BIGINT) AS mask_checksum
        |FROM m GROUP BY doc_id, n_tokens""".stripMargin) { (s, dir) =>
      // Contract: ZERO-token docs are absent from the output in BOTH
      // dialects (explode/unnest of an empty array emit no rows) — a
      // declared drop, not an accident; consumers needing the empty docs
      // join back from `documents`. n_tokens comes from the SAME
      // aggregation as the other stats (count of exploded rows) — the
      // earlier per-doc window computed it with an extra exchange before
      // the agg, contradicting the row's own one-scan design (round-12
      // review).
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.operators.TextOps.tokens(col("text"))).as(Seq("p", "wd")))
        .withColumn("turn", expr("p div 8"))
        .withColumn("masked", (col("turn") % 2 === 1).cast("int"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          (max(col("turn")) + 1).as("n_turns"),
          sum(col("masked")).as("n_loss_tokens"),
          countDistinct(when(col("masked") === 1, col("turn"))).as("n_spans"),
          sum(col("masked") * (col("p") + 1)).as("mask_checksum"))
        .select("doc_id", "n_tokens", "n_turns", "n_loss_tokens",
          "n_spans", "mask_checksum")
    },

    // The dcafs compatibility path END TO END (round-8 verdict task 6): a
    // reference-style settings.xml <path> — filter -> math -> editor ->
    // store, PathForward.java:115-263 — parsed by DcafsXml.parsePath and
    // compiled by PathCompiler into one fused Catalyst projection chain
    // over the events fixture, hash-matched against a DuckDB replay of
    // every stage (split, minlength filter, i2 write-back with the
    // double->string rejoin, string edit, typed store extraction). Math
    // stays integral (i2*3+7 on the bigint user_id field) so the
    // write-back rendering is "N.0" in both engines.
    Q("op_path_xml",
      s"""WITH t AS (SELECT $lineSqlDuck AS line FROM events),
         |f AS (SELECT line FROM t WHERE length(line) >= 22),
         |s1 AS (SELECT string_split(line, ',') AS p FROM f),
         |m AS (SELECT p[1:2]
         |    || [CAST(TRY_CAST(p[3] AS DOUBLE) * 3 + 7 AS VARCHAR)]
         |    || p[4:] AS p2 FROM s1),
         |e AS (SELECT replace(array_to_string(p2, ','), 'click', 'tap') AS line
         |  FROM m),
         |s2 AS (SELECT line, string_split(line, ',') AS p FROM e)
         |SELECT line, p[1] AS etype, TRY_CAST(p[2] AS DOUBLE) AS val,
         |  TRY_CAST(p[3] AS DOUBLE) AS uid3, p[4] AS props_t
         |FROM s2""".stripMargin) { (s, dir) =>
      val spec = graft.DcafsXml.parsePath(
        """<path id="compat" delimiter=",">
          |  <filter type="minlength">22</filter>
          |  <math><op>i2=i2*3+7</op></math>
          |  <editor type="replace" find="click">tap</editor>
          |  <store>
          |    <text index="0">etype</text>
          |    <real index="1">val</real>
          |    <real index="2">uid3</real>
          |    <text index="3">props_t</text>
          |  </store>
          |</path>""".stripMargin)
      graft.PathCompiler.compile(spec, withLine(s, dir))
    },

    // The reverse-branch path END TO END (round-9 verdict task 7): a
    // declared path whose SECOND filter consumes the first filter's
    // REJECTED rows (PathForward.java:203-208 addReverseTarget — dcafs's
    // if/elif routing), with rtvals READ in the math op ({r:gain}/
    // {r:offset} resolved from the broadcast state row), rtvals
    // WRITE-BACK rendered as the st_last state the surviving stream
    // feeds (last value per stored key, ordered by the written-back
    // monotone field), and the task-scheduler req guard ("value above
    // {r:limit}") counted per key as n_fired. Math stays integral on the
    // event_id field so the write-back rendering is "N.0" in both
    // engines.
    Q("op_path_xml_branch",
      """WITH t AS (SELECT concat_ws(',', event_type, CAST(value AS VARCHAR),
        |    CAST(event_id AS VARCHAR), props) AS line FROM events),
        |r1 AS (SELECT line FROM t WHERE NOT contains(line, 'purchase')),
        |f2 AS (SELECT line FROM r1 WHERE NOT starts_with(line, 'error')),
        |s1 AS (SELECT string_split(line, ',') AS p FROM f2),
        |m AS (SELECT p[1:2]
        |    || [CAST(TRY_CAST(p[3] AS DOUBLE) * 2 + 7 AS VARCHAR)]
        |    || p[4:] AS p2 FROM s1),
        |e AS (SELECT replace(array_to_string(p2, ','), 'click', 'tap') AS line
        |  FROM m),
        |s2 AS (SELECT string_split(line, ',') AS p FROM e),
        |st AS (SELECT p[1] AS etype, TRY_CAST(p[2] AS DOUBLE) AS val,
        |    TRY_CAST(p[3] AS DOUBLE) AS eid3 FROM s2)
        |SELECT etype, max_by(val, eid3) AS last_val, count(*) AS n_rows,
        |  CAST(count(CASE WHEN val > 0.75 THEN 1 END) AS BIGINT) AS n_fired
        |FROM st GROUP BY etype""".stripMargin) { (s, dir) =>
      import s.implicits._
      // the rtvals state plane: gain/offset interpolate into the math op,
      // limit guards the task req — 3 driver literals, the reference's
      // settings-scale state
      val rtvals = Seq(("gain", 2.0), ("offset", 7.0), ("limit", 0.75))
        .toDF("key", "value")
      val spec = graft.DcafsXml.parsePath(
        """<path id="branchy" delimiter=",">
          |  <filter type="contain">purchase</filter>
          |  <filter type="nostart">error</filter>
          |  <math><op>i2=i2*{r:gain}+{r:offset}</op></math>
          |  <editor type="replace" find="click">tap</editor>
          |  <store>
          |    <text index="0">etype</text>
          |    <real index="1">val</real>
          |    <real index="2">eid3</real>
          |  </store>
          |</path>""".stripMargin)
      val line = Tables.load(s, dir, "events").withColumn("line",
        expr("concat_ws(',', event_type, CAST(value AS STRING), " +
          "CAST(event_id AS STRING), props)"))
      val out = graft.PathCompiler.compileWithRtVals(spec, line, rtvals)
      // the req guard's threshold is the SAME settings-scale literal the
      // rtvals frame carries — read it from the source Seq rather than
      // running a driver-side Spark job at plan-build time (round-12
      // review; the rtvals-plane integration under test is the math op's
      // {r:gain}/{r:offset} broadcast, which compileWithRtVals exercises)
      val limit = 0.75
      out.groupBy("etype")
        .agg(max_by(col("val"), col("eid3")).as("last_val"),
          count(lit(1)).as("n_rows"),
          sum(when(col("val") > limit, 1L).otherwise(0L)).as("n_fired"))
    },
  )
}
