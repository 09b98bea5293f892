package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (SURVEY.md §7.1 item 8):
  * language-ID heuristics, quality scoring, token counting, and document
  * fingerprinting. All pure per-row column programs — narrow, codegen'd,
  * linear scale-out; the only shuffle anywhere is a presentation sort. */
object TextAnalysis {

  private val enMarkers = Seq("the", "a", "of", "and", "to", "is")

  /** n-gram/stopword language-ID heuristic: ratio of English marker words
    * among tokens (a real system adds per-language marker sets and argmax —
    * same plan, more columns). */
  def langId(text: Column): (Column, Column, Column) = {
    val toks = split(text, " ")
    val markers = size(filter(toks, t => t.isin(enMarkers: _*))).cast("long")
    val n = size(toks).cast("long")
    val predicted = when(markers * lit(1.0) / n >= 0.05, "en").otherwise("unk")
    (markers, n, predicted)
  }

  /** Composite quality score in [0,1]: token-diversity + non-stopword
    * density + length saturation. Deterministic double arithmetic. */
  def qualityScore(text: Column): Column = {
    val toks = split(text, " ")
    val n = size(toks).cast("double")
    val distinctRatio = size(array_distinct(toks)).cast("double") / n
    val stopRatio = size(filter(toks, t => t.isin(enMarkers: _*))).cast("double") / n
    round(lit(0.4) * distinctRatio + lit(0.4) * (lit(1.0) - stopRatio)
      + lit(0.2) * least(lit(1.0), n / 50.0), 6)
  }

  /** Token counts: whitespace tokens, regex word tokens, and a bytes/4
    * BPE-style token estimate. */
  def tokenCounts(text: Column): (Column, Column, Column) = (
    size(split(text, " ")).cast("long"),
    size(regexp_extract_all(text, lit("[a-z0-9]+"), lit(0))).cast("long"),
    ceil(length(text) / 4.0).cast("long"))

  /** Unicode/punctuation normalization: lowercase, strip non-alphanumerics,
    * collapse whitespace — the canonical pre-tokenization step. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), "\\s+", " "))

  /** All n-gram occurrences (non-distinct, for frequency counting;
    * TextDedup.shingles is the distinct-set variant for similarity).
    * Bigrams zip the array against its own shift — one slice per row;
    * the general case pays a slice per position. */
  def ngrams(text: Column, n: Int): Column = {
    val words = split(text, " ")
    if (n == 2)
      zip_with(
        slice(words, lit(1), greatest(size(words) - 1, lit(0))),
        slice(words, lit(2), greatest(size(words) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    else
      filter(
        transform(words, (_, i) =>
          when(i <= size(words) - n, array_join(slice(words, i + 1, lit(n)), " "))),
        s => s.isNotNull)
  }

  /** Rolling polynomial fingerprint over the token stream
    * (h = (h*31 + ascii(w) + len(w)) mod 1e9+7): order-sensitive, unlike
    * the canonical set fingerprint in TextDedup. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(split(text, " "), w => (ascii(w) + length(w)).cast("long")),
      lit(0L), (acc, x) => (acc * 31 + x) % 1000000007L)

  /** Sliding-window document chunking (the context-window prep step:
    * every LLM ingest chops documents into fixed-token chunks with
    * overlap). Chunk i covers tokens [i·stride, i·stride + chunkTokens);
    * windows start while i·stride < n, so every token lands in ≥1 chunk
    * and consecutive chunks overlap by chunkTokens - stride tokens.
    * Pure array program — no explode until the caller asks for rows. */
  def chunks(text: Column, chunkTokens: Int, stride: Int): Column = {
    require(stride > 0 && chunkTokens >= stride, "need 0 < stride <= chunkTokens")
    val words = split(text, " ")
    val n = size(words)
    val nChunks = floor((n - 1) / stride) + 1
    transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(words, i * stride + 1, lit(chunkTokens)), " "))
  }
}
