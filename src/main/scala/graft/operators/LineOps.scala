package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The dcafs line-transform plane re-expressed as Column combinators.
  *
  * A dcafs "path" is filter -> math -> editor chains over one text line
  * (SURVEY.md §2.3-2.5). Here each rule/edit is a pure `Column` function, so a
  * whole path composes into a single Catalyst projection/filter — one
  * codegen stage, no per-step materialization.
  */
object FilterRules {

  /** `start`: startsWith any of the given prefixes
    * (FilterForward.java:315-328). */
  def start(line: Column, prefixes: String*): Column =
    prefixes.map(p => line.startsWith(p)).reduce(_ || _)

  /** `nostart` (FilterForward.java:321-323). */
  def nostart(line: Column, prefix: String): Column = !line.startsWith(prefix)

  /** `end` (FilterForward.java:332-334). */
  def end(line: Column, suffix: String): Column = line.endsWith(suffix)

  /** `contain` (FilterForward.java:329-331). */
  def contain(line: Column, needle: String): Column = line.contains(needle)

  /** `c_start`: char at 1-based position k equals c (FilterForward.java:335-337). */
  def cStart(line: Column, k: Int, c: String): Column =
    substring(line, k, 1) === c

  /** `c_end`: char at position k from the end (FilterForward.java:338-340). */
  def cEnd(line: Column, k: Int, c: String): Column =
    substring(line, -k, 1) === c

  /** `minlength`/`maxlength` (FilterForward.java:341-342). */
  def lengthBetween(line: Column, lo: Int, hi: Int): Column =
    length(line).between(lo, hi)

  /** `minitems`/`maxitems`/`items`: split-count bounds (FilterForward.java:343-345). */
  def itemsBetween(line: Column, delim: String, lo: Int, hi: Int): Column =
    size(split(line, java.util.regex.Pattern.quote(delim))).between(lo, hi)

  /** `regex`: full match (FilterForward.java:318-320). The non-capturing
    * group keeps top-level alternation inside the anchors — bare
    * `^abc|def$` would match any line STARTING with abc or ENDING with
    * def, not the whole-line match the reference's matches() performs.
    * The end anchor is `\z` (absolute end of input), not `$`: Java's `$`
    * matches BEFORE a trailing newline, so a line ending in '\n' would
    * full-match here while DuckDB's RE2 regexp_full_match (which must
    * consume the whole string) rejects it — an engine-divergent boundary
    * the round-12 review found. `\z` and RE2 full-match agree.
    */
  def regex(line: Column, pattern: String): Column =
    line.rlike(s"^(?:$pattern)\\z")

  /** `nmea`: checksum validity (FilterForward.java:347). */
  def nmea(line: Column): Column = GraftFunctions.nmea_valid(line)

  /** `ignores=N` (FilterForward.java:28-29, 390-404): after a line passes,
    * suppress the next N passing lines (alarm dedup). Batch rendering:
    * among passing rows (ordered per key), keep positions 1, N+2, 2N+3...
    * i.e. row_number % (N+1) == 1.
    */
  def withIgnores(df: DataFrame, pass: Column, keyCol: Column,
      order: Seq[Column], ignores: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ignores >= 0, s"ignores must be >= 0, got $ignores")
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
    df.filter(pass)
      .withColumn("__rn", row_number().over(w))
      // the kept residue is 1 % (N+1), not a literal 1: with N=0 the
      // modulus is 1 and rn % 1 is always 0 — comparing against 1 would
      // silently drop EVERY passing row instead of suppressing none
      .filter((col("__rn") % (ignores + 1)) === lit(1 % (ignores + 1)))
      .drop("__rn")
  }

  /** All rules must pass; rejected rows route to the `reversed` branch
    * (FilterForward.java:385-406, 26,52,69-81). Both branches share one
    * cached/scanned upstream — Catalyst reuses the exchange.
    *
    * The predicate coalesces to FALSE: the reference routes every line
    * to exactly one branch, but raw filter(p)/filter(!p) drops a
    * NULL-predicate row (e.g. a NULL value in a numeric rule) from BOTH
    * branches — the oracle's CASE WHEN ... ELSE 'reject' routes it to
    * reject (round-12 review).
    */
  def branch(df: DataFrame, rules: Seq[Column]): (DataFrame, DataFrame) = {
    val all = coalesce(rules.reduce(_ && _), lit(false))
    (df.filter(all), df.filter(!all))
  }
}

/** EditorForward edits (SURVEY.md §2.4) as Column -> Column functions.
  * Ordered edits compose left-to-right; a whole edit chain stays one
  * projection.
  */
object Edits {

  /** `resplit`: split on delim, re-emit via an i0/i1 template
    * (EditorForward.java:466-523). Template refs `iN` select fields; other
    * text passes through literally.
    */
  def resplit(line: Column, delim: String, template: String,
      leftoverAppend: Boolean = false): Column = {
    val parts = split(line, java.util.regex.Pattern.quote(delim))
    // -1 limit keeps trailing empty segments: Pattern.split's default
    // drops them, so a template ENDING in field refs ("a-i0i1") would
    // lose refs beyond pieces.indices and emit only "a-"+field0
    val pieces = raw"i(\d+)".r.pattern.split(template, -1) // literal segments
    val refs = raw"i(\d+)".r.findAllMatchIn(template).map(_.group(1).toInt).toSeq
    // interleave literal / field pieces; an out-of-range field ref
    // renders as EMPTY (coalesce) — bare try_element_at is NULL, which
    // Spark's concat propagates to a NULL line while DuckDB's concat
    // skips it, an engine-divergent short-line boundary (round-12
    // review; the reference renders missing refs as empty too)
    val cols = scala.collection.mutable.ArrayBuffer.empty[Column]
    for (i <- pieces.indices) {
      if (pieces(i).nonEmpty) cols += lit(pieces(i))
      if (i < refs.length)
        cols += coalesce(try_element_at(parts, lit(refs(i) + 1)), lit(""))
    }
    val base = concat(cols.toSeq: _*)
    if (!leftoverAppend) base
    else {
      // `leftover=append` (EditorForward.java:466-523): fields beyond the
      // highest template ref re-attach after the emitted text
      val maxRef = if (refs.isEmpty) 0 else refs.max + 1
      val rest = array_join(
        slice(parts, lit(maxRef + 1),
          greatest(size(parts) - maxRef, lit(0))), delim)
      when(length(rest) > 0, concat(base, lit(delim), rest)).otherwise(base)
    }
  }

  /** `charsplit`: split at fixed 1-based char positions, re-join
    * (EditorForward.java:314-350). */
  def charsplit(line: Column, delim: String, positions: Int*): Column = {
    val bounds = (1 +: positions) :+ Int.MaxValue
    val segs = bounds.sliding(2).map {
      case Seq(a, b) =>
        if (b == Int.MaxValue) substring(line, a, 1000000)
        else substring(line, a, b - a)
    }.toSeq
    concat_ws(delim, segs: _*)
  }

  /** `redate`: reformat a date field (EditorForward.java:391-445). */
  def redate(field: Column, fromFmt: String, toFmt: String): Column =
    date_format(to_timestamp(field, fromFmt), toFmt)

  /** `millisdate`: epoch millis -> formatted (EditorForward.java:351-383). */
  def millisdate(field: Column, toFmt: String): Column =
    date_format(timestamp_millis(field.cast("long")), toFmt)

  /** `replace` / `remove` (EditorForward.java:551-554, 226-229). */
  def replaceLit(line: Column, find: String, repl: String): Column =
    replace(line, lit(find), lit(repl))
  def removeLit(line: Column, find: String): Column = replaceLit(line, find, "")

  /** `rexreplace` / `rexremove` (EditorForward.java:563-567, 559-562). */
  def rexreplace(line: Column, pattern: String, repl: String): Column =
    regexp_replace(line, pattern, repl)
  def rexremove(line: Column, pattern: String): Column =
    regexp_replace(line, pattern, "")

  /** `rexkeep`/`rexsplit`: keep all matches joined by delim
    * (EditorForward.java:446-460, 238-241). */
  def rexkeep(line: Column, pattern: String, delim: String): Column =
    array_join(regexp_extract_all(line, lit(pattern), lit(0)), delim)

  /** `trim` / `prepend` / `append` (EditorForward.java:529-558). */
  def trimEdit(line: Column): Column = trim(line)
  def prepend(line: Column, s: String): Column = concat(lit(s), line)
  def append(line: Column, s: String): Column = concat(line, lit(s))

  /** `insert` at 1-based position (EditorForward.java:543-550). */
  def insert(line: Column, pos: Int, s: String): Column =
    concat(substring(line, 1, pos), lit(s), substring(line, pos + 1, 1000000))

  /** `cutstart`/`cutend`: drop N chars (EditorForward.java:568-575). */
  def cutstart(line: Column, n: Int): Column = substring(line, n + 1, 1000000)
  def cutend(line: Column, n: Int): Column =
    substr(line, lit(1), greatest(length(line) - n, lit(0)))

  /** `toascii`: delimited codepoints -> chars (EditorForward.java:576-583). */
  def toascii(line: Column, delim: String): Column =
    array_join(transform(
      split(line, java.util.regex.Pattern.quote(delim)),
      c => char(c.cast("int"))), "")

  /** `listreplace`: index field -> lookup list, 0-based offset `first`
    * (EditorForward.java:289-313). Out-of-range indexes (including
    * below `first`) yield null: element_at raises on index 0 even in
    * the try_ variant, and a negative index would silently read from
    * the END of the list — neither is a no-match.
    */
  def listreplace(field: Column, first: Int, values: Seq[String]): Column = {
    val idx = field.cast("int") - first + 1
    when(idx >= 1, try_element_at(array(values.map(lit): _*), idx))
  }
}

/** Typed-parse helpers (SURVEY.md §1.2, §2.6). */
object Parse {

  /** FlagVal string parsing: "true/1/high/yes/on" (case-insensitive,
    * trimmed) are truthy (FlagVal.java semantics).
    */
  def flag(c: Column): Column =
    lower(trim(c)).isin("true", "1", "high", "yes", "on")
}
