package graft.text

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.etl.Alerts

/** Text-cleaning pipelines (SURVEY §2.11 N1/N3/N4, §2.7 F1-F7).
  *
  * Everything is a reusable `Column => Column` built from codegen'd
  * built-ins or native graft expressions — zero UDFs:
  *  - `stopwordRemoveExact` (the reference's ORDER-SENSITIVE 732-word
  *    cascade, c35:26-37) — a 732-deep regexp_replace expression tree
  *    would break codegen, so the exact-parity form is the codegen'd
  *    [[graft.functions.StopwordCascade]] expression over precompiled
  *    patterns; `stopwordRemoveFast` is the codegen-friendly alternation
  *    applied to fixpoint (twice) for the scale path;
  *  - `asciiFold` (unidecode, F7) — NFD normalize + strip marks, the
  *    native [[graft.functions.AsciiFold]] expression.
  */
object TextClean {

  /** c27 pre-NER cleanup: literal/regex replaces (each trimmed like the
    * reference's replace_strings), printable filter, CVE/TTP removal,
    * minor-version collapse.
    *
    * Newline/tab become TWO spaces with no whitespace collapse — the
    * reference's own `("\n", " "*2)` (data_integration.ipynb c27), kept
    * verbatim even though it stops [[graft.er.HeuristicNerModel]]'s
    * single-space span regex at line breaks ("Federal\nBureau of
    * Investigation" → only "Bureau of Investigation"): the reference's
    * spaCy NER saw exactly this doubled-space text, so entity extraction
    * parity requires feeding ours the same.
    */
  def cleanForNer(c: Column): Column = {
    var t: Column = c
    // strings_to_replace list, in order; each step .strip()s
    t = trim(regexp_replace(t, "Summary", " "))
    t = trim(regexp_replace(t, "\n", "  "))
    t = trim(regexp_replace(t, "\t", "  "))
    t = trim(regexp_replace(t, "DISCLAIMER.*", " "))
    t = trim(regexp_replace(t, "INFORMATION REQUESTED.*", " "))
    // string.printable filter (F4)
    t = regexp_replace(t, "[^\\x20-\\x7E\\t\\n\\r\\x0B\\x0C]", "")
    // remove CVE ids and TTP refs
    t = regexp_replace(t, Alerts.cvePattern, "")
    t = regexp_replace(t, Alerts.ttpPattern, "")
    // minor-version collapse with backreference (F3)
    t = regexp_replace(t, "(v?[0-9]{1,2})\\.[0-9]{1,2}\\.?[0-9]*\\.?[0-9]*", "$1")
    t
  }

  /** neattext-equivalent normalization steps (c27 TextPipeline): emails,
    * phone numbers, emojis, punctuation, html tags, whitespace collapse +
    * lowercase. Approximation of the library's exact regexes, documented.
    */
  def normalizeText(c: Column): Column = {
    var t: Column = c
    t = regexp_replace(t, "[\\w.+-]+@[\\w-]+\\.[\\w.-]+", " ")
    t = regexp_replace(t, "[\\+\\(]?[1-9][0-9 .\\-\\(\\)]{8,}[0-9]", " ")
    t = regexp_replace(t, "[\\x{1F300}-\\x{1FAFF}\\x{2600}-\\x{27BF}]", "")
    t = regexp_replace(t, "<[^>]+>", " ")
    t = regexp_replace(t, "[!\"#$%&'()*+,\\-./:;<=>?@\\[\\]^_`{|}~]", "")
    t = lower(trim(regexp_replace(t, "\\s+", " ")))
    t
  }

  /** N3: NORP→GPE retype (American ≈ America, c35:19-22). */
  def normalizeNerType(t: Column): Column =
    when(t === "NORP", "GPE").otherwise(t)

  /** N4 scale path: one alternation `\s(w1|w2|...)\s → " "` iterated
    * twice (cascade fixpoint for the common cases), then whitespace
    * collapse — 3 codegen'd regexes instead of 732.
    */
  def stopwordRemoveFast(c: Column, words: Seq[String]): Column = {
    val alternation = "\\s(" + words.map(Pattern.quote).mkString("|") + ")\\s"
    val once = regexp_replace(c, alternation, " ")
    val twice = regexp_replace(once, alternation, " ")
    regexp_replace(twice, "  +", " ")
  }

  /** N4 exact-parity path: the reference's per-word cascade — for each
    * stopword: `\sWORD\s → " "` then `"  +" → " "` (order-sensitive since
    * replacements enable later matches, SURVEY §7.4 risk 6). Backed by
    * the codegen'd [[graft.functions.StopwordCascade]] expression: the
    * patterns compile once per plan, the per-row work stays inside
    * whole-stage codegen.
    */
  def stopwordRemoveExact(c: Column, words: Seq[String]): Column =
    graft.functions.GraftFunctions.stopwordCascade(c, words)

  /** c35 NER-label cleanup: parenthetical strip, company suffixes, open
    * paren/bracket tails, punctuation, trim.
    *
    * DELIBERATELY REFERENCE-FAITHFUL, quirks included (golden ER parity
    * depends on them — data_integration.ipynb c35 /
    * cpe_product.ipynb c5 use these literal regexes):
    *  - the parenthetical strip is GREEDY (`\s\(.*\)*\s*` deletes from
    *    the first " (" to end-of-label, so "apple (aapl) holdings" →
    *    "apple");
    *  - the suffix strip's `\s?` makes the whitespace optional, so
    *    "cisco" → "cis" and "anzac" → "anz" — the reference mutilates
    *    those names the same way, and ER clusters on the mutilated keys.
    */
  def cleanNerLabel(c: Column): Column = {
    var t: Column = c
    t = regexp_replace(t, "\\s\\(.*\\)*\\s*", "")
    for (co <- Seq("inc", "llc", "ac", "corp", "co", "ltd", "corporation"))
      t = regexp_replace(t, "\\s?" + co + "$", "")
    t = regexp_replace(t, "(\\(|\\[)[^\\)\\]]*$", "")
    t = trim(t)
    t = regexp_replace(t, "[!\"#$%&'()*+,\\-./:;<=>?@\\[\\]^_`{|}~]", "")
    t
  }

  /** F7: unicode → ascii fold (unidecode-lite): NFD decompose + strip
    * combining marks + lowercase. Backed by the native codegen'd
    * [[graft.functions.AsciiFold]] expression (no UDF boundary).
    */
  def asciiFold(c: Column): Column = graft.functions.GraftFunctions.asciiFold(c)
}
