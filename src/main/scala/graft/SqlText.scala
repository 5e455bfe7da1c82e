package graft

/** The ONE lexical span scanner for SQL script text.
  *
  * Every router-side transformation that must respect quoted strings,
  * comments, or dollar-quoted bodies iterates these spans instead of
  * hand-rolling its own state machine. Before this, four independent
  * scanners (the statement splitter, the head-comment stripper, the
  * MySQL literal normalizer, and the pg_dump schema-qualifier
  * stripper) each restated the span rules, and three review rounds
  * found divergence bugs in exactly that duplication — an apostrophe
  * inside a comment flipping quote state, a comment block hiding a
  * statement head from the router. The dialect DECISIONS stay at the
  * call sites (each documents its knob choices); the MECHANICS live
  * here once.
  *
  * Knobs:
  *  - `hashComments` — `#` starts a line comment (MySQL's third
  *    comment form). Keep OFF wherever Postgres text can flow
  *    through: PG spells JSON-path operators `#>` / `#>>`, and a
  *    comment reading would swallow the rest of the line.
  *  - `dollarQuotes` — `$tag$ ... $tag$` bodies are opaque spans (PG
  *    function bodies carry ';' and literal-looking text). Tags start
  *    with a letter/underscore so `$1` positional params never open a
  *    span.
  *  - `backslashInBacktick` — whether `\` escapes inside `` `...` ``
  *    spans. MySQL backtick identifiers escape a backtick by doubling
  *    it, not with backslashes, so the splitter ignores `\` there; the
  *    literal normalizer historically honored it and keeps doing so.
  *
  * Shared rules (what mysqldump/pg_dump actually emit):
  *  - `--` opens a line comment anywhere in code, through end-of-line
  *    (newline included in the span).
  *  - Block comments do NOT nest (MySQL rule; PG nests — dump output
  *    never does) and an unterminated one runs to end of input.
  *  - `\` escapes the next character inside `'...'` and `"..."`.
  *  - An unterminated quote runs to end of input.
  */
object SqlText {
  sealed trait Kind
  case object Code extends Kind
  /** A quoted span INCLUDING its delimiters: `'...'`, `"..."`, `` `...` ``. */
  case object Quoted extends Kind
  /** `--` (or `#`, when enabled) through end-of-line, newline included. */
  case object LineComment extends Kind
  /** A slash-star block, non-nesting; version conditionals included. */
  case object BlockComment extends Kind
  /** `$tag$ ... $tag$`, delimiters included. */
  case object Dollar extends Kind

  /** Half-open [start, end) into the scanned string. Spans partition
    * the input: concatenating them in order reproduces it exactly. */
  final case class Span(kind: Kind, start: Int, end: Int)

  def spans(s: String, hashComments: Boolean = false,
      dollarQuotes: Boolean = false,
      backslashInBacktick: Boolean = false): Seq[Span] = {
    val out = Vector.newBuilder[Span]
    var i = 0
    var codeStart = 0
    def flushCode(until: Int): Unit =
      if (until > codeStart) out += Span(Code, codeStart, until)
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        flushCode(i)
        val start = i
        i += 1
        var closed = false
        while (!closed && i < s.length) {
          val d = s.charAt(i)
          if (d == '\\' && (c != '`' || backslashInBacktick) &&
            i + 1 < s.length) i += 2
          else { if (d == c) closed = true; i += 1 }
        }
        out += Span(Quoted, start, i)
        codeStart = i
      } else if ((c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') ||
          (hashComments && c == '#')) {
        flushCode(i)
        val nl = s.indexOf('\n', i)
        val end = if (nl < 0) s.length else nl + 1
        out += Span(LineComment, i, end)
        i = end; codeStart = i
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        flushCode(i)
        val close = s.indexOf("*/", i + 2)
        val end = if (close < 0) s.length else close + 2
        out += Span(BlockComment, i, end)
        i = end; codeStart = i
      } else if (dollarQuotes && c == '$') {
        var j = i + 1
        while (j < s.length && (s.charAt(j).isLetterOrDigit ||
          s.charAt(j) == '_')) j += 1
        val validTag = j < s.length && s.charAt(j) == '$' &&
          (j == i + 1 || s.charAt(i + 1).isLetter || s.charAt(i + 1) == '_')
        if (validTag) {
          flushCode(i)
          val tag = s.substring(i, j + 1)
          val close = s.indexOf(tag, j + 1)
          val end = if (close < 0) s.length else close + tag.length
          out += Span(Dollar, i, end)
          i = end; codeStart = i
        } else i += 1
      } else i += 1
    }
    flushCode(s.length)
    out.result()
  }
}
