package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text scalar functions: the reference's cleanup helpers (F8-F10) plus the
  * text-analysis layer a large-scale training-data pipeline needs (language ID,
  * quality scoring, token counting, fingerprinting). Pure Column expression
  * trees — codegen'd, no UDFs — so they vectorize over 100 TB of documents.
  *
  * Reference touchpoints: etl/transform/transform_game.py:8-25 (clean_array_string),
  * etl/extract/steam_crawl_info.py:41-61 (HTML strip via BS4 get_text).
  */
object TextFunctions {

  /** F9 HTML strip: tags -> space, collapse whitespace, trim (documented
    * approximation of BeautifulSoup get_text(separator=" ", strip=True)). */
  def stripHtml(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]+>", " "), "\\s+", " "))

  /** F8's array form: strip [ ] ' (and '*' for languages), split on ',',
    * trim parts, drop empties — the cleaned elements BEFORE the ", "
    * re-join, for consumers that explode (CsvWarehouseLoader): going
    * through the joined string and re-splitting would redo the trim/filter
    * per row. */
  def cleanArray(c: Column, isLanguage: Boolean = false): Column = {
    val stripped0 = regexp_replace(c, "[\\[\\]']", "")
    val stripped = if (isLanguage) regexp_replace(stripped0, "\\*", "") else stripped0
    filter(transform(split(stripped, ","), p => trim(p)), p => p =!= "")
  }

  /** F8 clean_array_string: strip [ ] ' (and '*' for languages), split on ',',
    * trim parts, drop empties, re-join ", " (transform_game.py:8-25). */
  def cleanArrayString(c: Column, isLanguage: Boolean = false): Column =
    array_join(cleanArray(c, isLanguage), ", ")

  /** Expression-level let-binding: evaluate `x` ONCE per row and use it
    * several times in `body`. Column trees have no sharing — every
    * reference re-embeds (and re-evaluates) the subtree, and Catalyst's
    * subexpression elimination does not hoist out of `when` branches — so
    * a cascade over an expensive subtree (a regex tokenization, say)
    * multiplies its cost by the reference count. Wrapping the value as the
    * element of a 1-element array and binding it as a `transform` lambda
    * variable pins it to one evaluation (lambda variables are true
    * bindings). Worth it only when `x` is expensive: `transform` itself is
    * interpreted (no codegen), so cheap `x` should stay inline. */
  def let1(x: Column)(body: Column => Column): Column =
    element_at(transform(array(x), body), 1)

  /** Whitespace tokenization of trimmed text; empty text -> empty array. */
  def tokens(c: Column): Column = {
    val t = trim(c)
    when(t.isNull || t === "", array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** Token count (whitespace tokenizer). */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish subword-unit count: words + digits + punctuation runs, the shape a
    * GPT-style pre-tokenizer produces. Counts matches of the pre-token regex. */
  def preTokenCount(c: Column): Column =
    coalesce(size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))), lit(0)).cast("long")

  /** Normalized form for fingerprinting: lowercase, strip non-alnum, collapse
    * whitespace, trim. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** Document fingerprint: md5 of the normalized text (stable across runs and
    * engines — md5 is bit-identical everywhere, unlike seeded hashes). */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** First 8 md5 hex digits as a non-negative 32-bit value in a long — the
    * shared deterministic bucket hash (simhash token hashes, split buckets,
    * pack shards). DuckDB equivalent: CAST(('0x' || substr(md5(x),1,8)) AS
    * BIGINT). */
  def md5Prefix32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Word n-gram shingles (n>=1) over whitespace tokens, as distinct set. */
  def shingles(c: Column, n: Int): Column = array_distinct(shinglesAll(c, n))

  /** Word n-gram shingles WITH duplicates (repetition analysis needs the
    * multiset; `shingles` wraps this in array_distinct for set-similarity
    * ops). Built with zip_with over shifted slices, NOT transform(idx, i ->
    * element_at(t, i)): in the latter the token array lives inside the lambda
    * body and Catalyst re-evaluates the split() per element (O(len·grams));
    * slice arguments are evaluated once per row. */
  def shinglesAll(c: Column, n: Int): Column = {
    require(n >= 1)
    val t = tokens(c)
    if (n == 1) t
    else {
      val m = greatest(size(t) - (n - 1), lit(0))
      var grams: Column = slice(t, lit(1), m)
      for (k <- 1 until n)
        grams = zip_with(grams, slice(t, lit(k + 1), m), (a, b) => concat(a, lit(" "), b))
      grams
    }
  }

  // ---- PII scanning (regex layer; patterns shared with the q65 oracle) ----

  /** Email / phone literal patterns — deliberately simple enough to behave
    * identically under Java regex (Spark) and RE2 (DuckDB). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "555-[0-9]{4}"

  /** Count of pattern matches in the text (0 for null). */
  def piiCount(c: Column, pattern: String): Column =
    coalesce(size(regexp_extract_all(c, lit(pattern), lit(0))), lit(0)).cast("long")

  /** Redaction: emails then phones replaced by bracket placeholders. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, emailPattern, "[EMAIL]"), phonePattern, "[PHONE]")

  // ---- Language ID (n-gram/stopword heuristic) ----

  /** Tiny per-language stopword lists for the heuristic classifier. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour", "que", "dans", "des"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "por", "como", "para", "del"))

  /** Count of tokens that appear in `words` (lowercased match). */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => lower(t).isInCollection(words))).cast("long")

  /** Heuristic language ID: highest stopword-hit language wins; deterministic
    * tie-break by fixed language order (en > de > fr > es); zero hits -> "und"
    * (undetermined). Word-level proxy for the usual char-n-gram model — same
    * plumbing, trivially swappable scoring table. */
  def langId(text: Column): Column = {
    // let-bindings via single-element transform scopes: a naive
    // best/cascade tree embeds the tokenize pipeline in every `when`
    // branch, and Catalyst's subexpression elimination does not hoist out
    // of conditional branches — the scan re-tokenized each row ~12x.
    // Binding the token array, then the 4 hit counts, as lambda variables
    // pins each to ONE evaluation per row; the cascade then compares plain
    // array elements. Semantics unchanged: highest hit count wins,
    // deterministic tie-break by fixed language order, zero hits -> "und".
    val langs = Seq("en", "de", "fr", "es")
    let1(transform(tokens(text), t => lower(t))) { toks =>
      let1(array(langs.map(l => stopwordHits(toks, stopwords(l))): _*)) { hs =>
        val best = array_max(hs)
        // foldRight builds en-first cascade: first match in order wins
        langs.zipWithIndex.foldRight(lit("und")) { case ((lang, i), acc) =>
          when(element_at(hs, i + 1) === best && best > 0, lit(lang))
            .otherwise(acc)
        }
      }
    }
  }

  // ---- Quality scoring ----

  /** Ratio of non-alphanumeric, non-space chars to total chars (0 if empty). */
  def punctRatio(c: Column): Column = {
    val n = length(c)
    when(n.isNull || n === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("double") / n)
  }

  /** Ratio of English stopwords among tokens (proxy for "natural prose").
    * The tokenization is let-bound: the zero-guard `when` would otherwise
    * re-split in both the condition and each branch reference. */
  def stopwordRatio(c: Column): Column =
    let1(tokens(c)) { toks =>
      when(size(toks) === 0, lit(0.0))
        .otherwise(stopwordHits(transform(toks, t => lower(t)), stopwords("en")).cast("double") / size(toks))
    }

  /** Mean token length in chars (0 if no tokens). */
  def meanTokenLen(c: Column): Column =
    let1(tokens(c)) { toks =>
      when(size(toks) === 0, lit(0.0))
        .otherwise(
          aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
    }

  /** Composite quality score in [0,1]: rewards prose-like length, stopword
    * presence, low punctuation noise. Deterministic, engine-independent. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(c) * 4.0, lit(1.0))
    val punctPenalty = least(punctRatio(c) * 4.0, lit(1.0))
    round(lenScore * 0.4 + stopScore * 0.4 + (lit(1.0) - punctPenalty) * 0.2, 6)
  }
}
