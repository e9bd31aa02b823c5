package graft.operators

/** Compiler for the dcafs math/check expression sugar (SURVEY.md §2.5).
  *
  * dcafs compiles infix expressions referencing split fields (`i0`..`i99`),
  * rtvals (`{r:id}`, `{i:id}`, `{f:id}`) and word-form comparisons at config
  * time (MathFab.java:59-176, MathUtils.java:190-370, CheckBlock.java:73-150).
  * Here the "compiler" only rewrites the sugar to Spark SQL text — Catalyst
  * is the real expression compiler (parse once, whole-stage codegen).
  *
  * Rewrites:
  *  - `iN`        -> `CAST(__f[N+1] AS DOUBLE)` over the split-array column
  *  - `{r:id}`    -> `__rt_r_id` (a column joined in from the state table)
  *  - `x between 20 and 50` / `from 1 to 10` / `1 through 10` -> BETWEEN
  *  - `above` / `below` / `equals` / `not below` ... -> comparison ops
  *  - `^`         -> power: `x ^ 2` -> pow(x, 2)
  */
object MathDsl {

  private val iRef = raw"\bi(\d+)\b".r
  private val rtRef = raw"\{([rif]):([A-Za-z0-9_]+)\}".r
  private val fromTo = raw"(?i)\bfrom\s+(\S+)\s+to\s+(\S+)".r
  private val through = raw"(?i)(\S+)\s+through\s+(\S+)".r
  private val caret = raw"([A-Za-z0-9_\.\[\]]+|\([^()]*\))\s*\^\s*([A-Za-z0-9_\.]+|\([^()]*\))".r

  /** Name of the column a rtvals reference resolves to. */
  def rtColumn(kind: String, id: String): String = s"__rt_${kind}_$id"

  /** Rewrite a dcafs expression to Spark SQL over `arrayCol` (the split
    * line) and rt-value columns.
    */
  def compile(exprText: String, arrayCol: String = "__f"): String = {
    var s = exprText.trim
    // word-form ranges first (they contain comparison keywords)
    s = fromTo.replaceAllIn(s, m => s"BETWEEN ${m.group(1)} AND ${m.group(2)}")
    s = through.replaceAllIn(s, m => s"BETWEEN ${m.group(1)} AND ${m.group(2)}")
    // word-form comparisons (MathUtils.java:244-259)
    s = s.replaceAll("(?i)\\bnot\\s+below\\b", ">=")
      .replaceAll("(?i)\\bnot\\s+above\\b", "<=")
      .replaceAll("(?i)\\bbelow\\b", "<")
      .replaceAll("(?i)\\babove\\b", ">")
      .replaceAll("(?i)\\bequals\\b", "=")
      .replaceAll("(?i)\\bdiffers\\b", "!=")
    // power operator
    var prev: String = null
    while (prev != s) { prev = s; s = caret.replaceAllIn(s, m => s"pow(${m.group(1)}, ${m.group(2)})") }
    // rtvals references -> joined columns
    s = rtRef.replaceAllIn(s, m => rtColumn(m.group(1), m.group(2)))
    // field references -> array extraction (1-based element_at)
    s = iRef.replaceAllIn(s, m =>
      s"TRY_CAST(try_element_at($arrayCol, ${m.group(1).toInt + 1}) AS DOUBLE)")
    s
  }
}
