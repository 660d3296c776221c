package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2 X3;
  * north-star): language-ID features + heuristic classifier, quality
  * scoring, BPE-style token counting, content fingerprinting.
  *
  * Every function is a composition of codegen'd built-ins over one
  * row (no joins, no UDFs), so all of them pipeline into a single
  * whole-stage-codegen pass over the corpus — at 100 TB this is a
  * pure map, limited by scan bandwidth.
  *
  * All arithmetic is integer/exact so results hash-match the DuckDB
  * oracle regardless of partitioning.
  */
object TextAnalysis {

  /** Whitespace tokens (empty array for blank text).
    *
    * Equivalent to `filter(split(trim(text), "\\s+"), _ =!= "")`, in a
    * fully CODEGEN form (guide §4 / VERDICT r13 next #6): the array
    * `filter` is a higher-order function, which is a CodegenFallback —
    * it forced every tokenizing projection in the x3 family onto the
    * interpreted row path. `split` on `\\s+` only produces empty
    * tokens at the STRING BOUNDARIES (runs collapse, so never in the
    * interior); trimming both ends with the same `\\s` class (NOT
    * `trim`, which strips 0x20 only — a tab/newline edge would leave
    * boundary empties, caught by TextAnalysisSpec) leaves exactly one
    * empty-producing case, the all-whitespace string, handled by one
    * branch. TextAnalysisSpec pins equality with the HOF form on
    * blanks/tabs/newlines/edges. */
  def tokens(text: Column): Column = {
    val t = regexp_replace(text, "^\\s+|\\s+$", "")
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  // ---- language identification (n-gram/stopword heuristic) ----------

  /** Tiny per-language function-word lexicons — the classic heuristic:
    * function words are the highest-frequency, most language-specific
    * tokens. Deliberately small so the DuckDB oracle can embed the
    * same lists. */
  val stopEn: Seq[String] = Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")
  val stopEs: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "por")
  val stopDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein")

  /** Count of tokens present in a lexicon (with multiplicity). */
  def stopwordHits(toks: Column, lexicon: Seq[String]): Column = {
    val lex = array(lexicon.map(lit): _*)
    size(filter(toks, t => array_contains(lex, t))).cast("long")
  }

  /** Number of CJK (CJK Unified Ideographs block) characters. */
  def cjkCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\u4e00-\\u9fff]", ""))).cast("long")

  /** Heuristic language classifier. Deterministic tie-breaks: CJK
    * wins outright; then the lexicon with strictly more hits; 'en'
    * is the fallback. Mirror of the oracle's CASE expression. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = stopwordHits(t, stopEn)
    val es = stopwordHits(t, stopEs)
    val de = stopwordHits(t, stopDe)
    when(cjkCount(text) > 0, lit("zh"))
      .when(es > en && es >= de, lit("es"))
      .when(de > en && de > es, lit("de"))
      .otherwise(lit("en"))
  }

  // ---- quality scoring ----------------------------------------------

  /** Lowercase ASCII-alpha character count. */
  def alphaCount(text: Column): Column =
    length(regexp_replace(lower(text), "[^a-z]", "")).cast("long")

  /** Punctuation/symbol character count (non-alnum, non-space). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("long")

  /** Integer percentage of alpha chars: (alpha*100) div chars, 0 for
    * empty text. Integer division — exact in any engine. */
  def alphaPct(text: Column): Column =
    when(length(text) === 0, lit(0L))
      .otherwise(alphaCount(text) * 100 / length(text).cast("long")).cast("long")

  /** Boolean quality gate: mostly-alpha and long enough — the shape
    * of a C4/Gopher-style rule (thresholds are illustrative). */
  def isGoodDoc(text: Column, minTokens: Int = 20, minAlphaPct: Int = 70): Column =
    alphaPct(text) >= minAlphaPct && size(tokens(text)) >= minTokens

  // ---- BPE-style token counting -------------------------------------

  /** Pre-tokenizer pattern in the GPT-2 spirit, restricted to
    * constructs RE2 (DuckDB) and java.util.regex (Spark) treat
    * identically: letter runs, digit runs, single other-symbols. */
  val bpeishPattern: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Count of BPE-ish pre-tokens. */
  def bpeishCount(text: Column): Column = regexp_count(text, lit(bpeishPattern)).cast("long")

  // ---- PII redaction ------------------------------------------------

  /** Email pattern restricted to constructs RE2 (DuckDB) and
    * java.util.regex (Spark) treat identically: no backrefs, no
    * lookaround, greedy classes only. */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** 555-prefixed NANP phone fragment (the reserved fictional
    * exchange); `\b` is an ASCII word boundary in both engines. */
  val phonePattern: String = "\\b555-[0-9]{4}\\b"

  /** Count of email / phone matches (for audit columns). */
  def piiEmailCount(text: Column): Column =
    regexp_count(text, lit(emailPattern)).cast("long")
  def piiPhoneCount(text: Column): Column =
    regexp_count(text, lit(phonePattern)).cast("long")

  /** Redact emails then phones. Order is fixed (and mirrored in the
    * oracle) because replacement rewrites the string the next pattern
    * scans. Pure regexp_replace chain — codegen'd, scan-local, no
    * shuffle: at 100 TB this is a map over the corpus. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "[EMAIL]"),
      phonePattern, "[PHONE]")

  // ---- repetition / duplication signals (Gopher-style) --------------

  /** All word bigrams WITH multiplicity — unlike `Dedup.wordGrams`,
    * which deduplicates shingles, repetition scoring needs the
    * counts. Bound-lambda idiom (see `Dedup.wordGramsHof`): the token
    * array is bound once as a lambda variable, so Catalyst's lack of
    * CSE inside HOF lambdas can't re-run the split per element.
    * Empty array for docs with fewer than 2 tokens. */
  def wordBigramsAll(text: Column): Column =
    element_at(
      transform(array(tokens(text)), w =>
        when(size(w) >= 2,
          transform(sequence(lit(0), size(w) - 2),
            i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2))))
          .otherwise(array().cast("array<string>"))),
      1)

  /** Duplicate-word count: tokens minus distinct tokens. Integer —
    * exact in any engine (callers derive fractions downstream if they
    * want them; we keep numerator/denominator separate so the oracle
    * hash never depends on float rounding). */
  def dupWordCount(toks: Column): Column =
    (size(toks) - size(array_distinct(toks))).cast("long")

  // ---- Gopher rules (Rae et al. 2021, App. A) -----------------------
  // The published heuristic-quality gate large-scale pretraining
  // pipelines standardize on. Every rule is INTEGER arithmetic
  // (ratio thresholds become cross-multiplied comparisons), so the
  // rule bits hash-match any engine. All rules are row-local —
  // the whole report is one codegen'd map over the scan.

  /** The 8 "required words" of Gopher rule 7. */
  val gopherStops: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Lines of a document (split on \n; empty text is one empty line,
    * in both engines). */
  def lines(text: Column): Column = split(text, "\n", -1)

  /** Sum of token lengths (for the mean-word-length rule, kept as an
    * exact integer numerator). */
  def tokenCharSum(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t))

  /** Count of '#' characters plus non-overlapping '...' runs — the
    * numerator of Gopher's symbol-to-word ratio. */
  def symbolCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "#", ""))).cast("long") +
      regexp_count(text, lit("\\.\\.\\.")).cast("long")

  /** Lines that open with a bullet ('-' or '*' after indent). */
  def bulletLineCount(text: Column): Column =
    size(filter(lines(text), l => l.rlike("^\\s*[-*]"))).cast("long")

  /** Lines that close with an ellipsis. */
  def ellipsisLineCount(text: Column): Column =
    size(filter(lines(text), l => rtrim(l).endsWith("..."))).cast("long")

  /** Tokens containing at least one ASCII letter. */
  def alphaWordCount(toks: Column): Column =
    size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")

  /** Distinct required-stopword hits (iterate the 8-word lexicon, not
    * the document — order-free and duplicate-free by construction). */
  def gopherStopHits(toks: Column): Column =
    size(filter(array(gopherStops.map(lit): _*), w => array_contains(toks, w))).cast("long")

  // ---- content fingerprinting ---------------------------------------

  /** Whole-document fingerprint: md5 of the exact text (md5 exists in
    * both engines with identical output). */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Winnowing-style robust fingerprint: minimum md5 over the
    * document's word n-gram shingles — stable under small edits
    * outside the minimizing window. HOF is evaluated once per row. */
  def winnowFingerprint(text: Column, n: Int = 5): Column =
    array_min(transform(
      graft.operators.Dedup.wordGrams(text, n),
      g => md5(g.cast("binary"))))
}
