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
  /** Rewrite every `^` to pow(lhs, rhs), left-associative, with
    * balanced-paren operand scanning. The earlier regex fixpoint had two
    * failure modes a scanner doesn't: it could not match non-word
    * operands (so `__rt_i_x ^ 2` after the rtvals rewrite — or any
    * nested-paren operand — left a literal `^` that Spark parses as
    * integer XOR, a silent wrong number), and on chained powers it
    * re-matched an emitted pow's own argument list as a parenthesized
    * operand (`2 ^ 3 ^ 2` -> `powpow((2, 3), 2)`).
    */
  private def rewriteCaret(s0: String): String = {
    def isWord(c: Char) =
      c.isLetterOrDigit || c == '_' || c == '.' || c == '[' || c == ']'
    var s = s0
    var idx = s.indexOf('^')
    while (idx >= 0) {
      // left operand: word run, or balanced (...) with an optional
      // function name in front (an already-emitted pow(..) stays atomic)
      var l = idx - 1
      while (l >= 0 && s(l).isWhitespace) l -= 1
      val lEnd = l + 1
      var lStart = lEnd
      if (l >= 0 && s(l) == ')') {
        var depth = 0
        var i = l
        while (i >= 0 && { depth += (if (s(i) == ')') 1 else if (s(i) == '(') -1 else 0); depth != 0 }) i -= 1
        require(i >= 0, s"unbalanced parens in math expression: $s0")
        var f = i - 1
        while (f >= 0 && isWord(s(f))) f -= 1
        lStart = f + 1
      } else {
        var i = l
        while (i >= 0 && isWord(s(i))) i -= 1
        lStart = i + 1
      }
      require(lStart < lEnd, s"dangling '^' in math expression: $s0")
      // right operand: optional sign, word run, then a balanced (...)
      // if it turns out to be a call (or a bare parenthesized group)
      var r = idx + 1
      while (r < s.length && s(r).isWhitespace) r += 1
      val rStart = r
      var rEnd = r
      if (rEnd < s.length && (s(rEnd) == '-' || s(rEnd) == '+')) rEnd += 1
      while (rEnd < s.length && isWord(s(rEnd))) rEnd += 1
      if (rEnd < s.length && s(rEnd) == '(') {
        var depth = 0
        while (rEnd < s.length && { depth += (if (s(rEnd) == '(') 1 else if (s(rEnd) == ')') -1 else 0); depth != 0 }) rEnd += 1
        require(rEnd < s.length, s"unbalanced parens in math expression: $s0")
        rEnd += 1 // past the closing paren
      }
      require(rEnd > rStart, s"dangling '^' in math expression: $s0")
      val lhs = s.substring(lStart, lEnd)
      val rhs = s.substring(rStart, rEnd)
      s = s.substring(0, lStart) + s"pow($lhs, $rhs)" + s.substring(rEnd)
      idx = s.indexOf('^')
    }
    s
  }

  /** Name of the column a rtvals reference resolves to. */
  def rtColumn(kind: String, id: String): String = s"__rt_${kind}_$id"

  /** The rtvals columns an expression references — lets a compiler add
    * NULL columns for state keys with no row yet (startup-order safety).
    */
  def rtColumnsIn(exprText: String): Seq[String] =
    rtRef.findAllMatchIn(exprText)
      .map(m => rtColumn(m.group(1), m.group(2))).toSeq

  /** Rewrite a dcafs expression to Spark SQL over `arrayCol` (the split
    * line) and rt-value columns.
    */
  /** Replace every single-quoted SQL string literal ('' escapes
    * respected; an unterminated quote runs to end of string) with a
    * word-shaped placeholder token, returning the masked text and the
    * literals for [[unmask]]. The rewrites must never see user data —
    * a regex filter's `'^\\d+$'` is not a power operator, a contain
    * filter's `'above'` is not a comparison keyword — but they must
    * still see ONE contiguous expression: rewriting per between-quote
    * segment broke balanced-paren scanning for expressions like
    * `(i0 + length('a')) ^ 2`, whose left operand spans a literal.
    * Word-shaped tokens behave as atomic operands in every rewrite
    * (caret operand scan, BETWEEN operands) and match none of the
    * reference patterns.
    */
  private def maskQuotes(s: String): (String, Vector[String]) = {
    val out = new StringBuilder
    val lits = Vector.newBuilder[String]
    var i = 0
    var n = 0
    while (i < s.length) {
      if (s(i) == '\'') {
        var j = i + 1
        var closed = false
        while (j < s.length && !closed) {
          if (s(j) == '\'') {
            if (j + 1 < s.length && s(j + 1) == '\'') j += 2 // '' escape
            else closed = true
          } else j += 1
        }
        val end = if (closed) j + 1 else s.length
        lits += s.substring(i, end)
        out.append(s"__QLIT${n}__")
        n += 1
        i = end
      } else { out.append(s(i)); i += 1 }
    }
    (out.toString, lits.result())
  }

  // Single-pass restore: a sequential fold would rescan restored literal
  // content, corrupting a literal whose TEXT contains a later placeholder
  // token (e.g. the expression `'__QLIT1__' = 'x'`). replaceAllIn never
  // rescans replacement output, so embedded placeholder-shaped text
  // survives verbatim.
  //
  // Backslashes double on restore: the compiled text is parsed by Spark
  // SQL (expr/selectExpr), whose DEFAULT string-literal mode treats \ as
  // an escape character — a dcafs regex literal '^\d+$' would silently
  // parse as '^d+$' (found by MetamorphicSpec's literal-opacity fuzz;
  // DuckDB and the dcafs DSL both read the backslash literally, so the
  // divergence was invisible to the hash oracle until a fixture regex
  // carried one). The '' quote escape is shared by both dialects and
  // stays as-is. If spark.sql.parser.escapedStringLiterals were enabled
  // the doubling would be wrong — the sessions here never enable it.
  private val qlitRef = "__QLIT(\\d+)__".r
  private def unmask(s: String, lits: Vector[String]): String =
    qlitRef.replaceAllIn(s, m => {
      // placeholder-shaped text the USER wrote unquoted (no literal was
      // masked at that index) passes through verbatim — resolving it
      // against lits would throw on compile (review finding); Spark then
      // reports it as an unresolved column, the right error
      val idx = if (m.group(1).length <= 9) m.group(1).toInt else -1
      java.util.regex.Matcher.quoteReplacement(
        if (idx >= 0 && idx < lits.length) lits(idx).replace("\\", "\\\\")
        else m.matched)
    })

  def compile(exprText: String, arrayCol: String = "__f"): String = {
    val (masked, lits) = maskQuotes(exprText.trim)
    var s = masked
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
    // rtvals references FIRST (`{i:x} ^ 2` must see a word-shaped
    // operand), then the power operator via the balanced scanner
    s = rtRef.replaceAllIn(s, m => rtColumn(m.group(1), m.group(2)))
    s = rewriteCaret(s)
    // field references -> array extraction (1-based element_at)
    s = iRef.replaceAllIn(s, m =>
      s"TRY_CAST(try_element_at($arrayCol, ${m.group(1).toInt + 1}) AS DOUBLE)")
    unmask(s, lits)
  }
}
