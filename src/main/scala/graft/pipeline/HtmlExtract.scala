package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic HTML main-content extraction — the jusText-shape
  * boilerplate filter (Pomikálek 2011, "Removing Boilerplate and Duplicate
  * Content from Web Corpora"; the same block-classification idea behind
  * trafilatura/CCNet's extraction stage). Every real pretraining corpus
  * starts from markup; this is the stage that turns a crawled page into
  * the text the rest of the engine (dedup, quality, tokenize) consumes.
  *
  * Pipeline, entirely per-row column expressions (NO shuffle, NO explode —
  * blocks live in an array within the row, so at 100 TB this is a pure
  * map-side scan that parallelizes with input splits and pushes the text
  * column read straight down to parquet):
  *
  *   1. segment: split the markup on block-level tags (p/div/nav/footer/
  *      header/section/li/h1-6/...) — inline tags (a/b/i/span) stay inside
  *      their block;
  *   2. feature: per block, strip remaining inline tags and whitespace-
  *      normalize; count tokens, ANCHOR-TEXT tokens (the `<a>…</a>` spans,
  *      extracted BEFORE stripping), and stopword tokens;
  *   3. classify — jusText's three rules with integer-only arithmetic so
  *      the DuckDB oracle mirrors exactly:
  *        - length:       n_tok ≥ 5             (short blocks are chrome)
  *        - link density: n_link·3 ≤ n_tok      (≤ ⅓ of tokens in anchors)
  *        - stopwords:    n_stop·40 ≥ n_tok     (≥ 2.5% stopword density —
  *          scaled to the fixture's ~6% corpus density; real jusText uses
  *          ~30% against a ~400-word list)
  *   4. reassemble: surviving blocks joined in document order.
  *
  * Approximation vs full jusText, documented: no context propagation (the
  * short-good/near-good smoothing pass) — each block is classified
  * independently, which keeps the operator a pure per-row expression.
  * Anchor-text extraction is case-insensitive (`(?i)`, matching the block
  * segmenter — so `<A HREF>` counts as link tokens, r19 advice #2) but
  * still misses anchors whose text contains nested inline tags
  * (`<a><b>x</b></a>` — the `[^<]*` body stops at the first tag); those
  * tokens count as content, slightly under-counting link density. A full
  * fix needs a recursive parse, which a single regex (and the mirrored
  * DuckDB oracle) cannot express.
  *
  * The x34 registry query synthesizes deterministic HTML around
  * `documents.text` executor-side (the m1 derive-fixture-deterministically
  * precedent: the container ships no crawl corpus, and synthesis keeps the
  * WHOLE pipeline — wrapping included — oracle-mirrorable in DuckDB). The
  * three boilerplate kinds each die by a DIFFERENT rule: nav (3 tokens,
  * 100% links) by length, the ads div (8 tokens, 4 in anchors) by link
  * density, the footer (7 tokens, 0 stopwords) by stopword density —
  * pinned in QualitySignalsSpec.
  */
object HtmlExtract {

  /** Block-level tag boundary (opening or closing). Inline tags (a, b, i,
    * em, span, strong, code) are deliberately absent: they stay inside
    * blocks so anchor text can be measured per block.
    */
  val blockTagRegex: String =
    "(?i)</?(?:p|div|nav|footer|header|section|article|aside|ul|ol|li" +
      "|h[1-6]|table|tr|td|br|title|head|body|html)[^>]*>"

  private def strip(b: Column): Column =
    trim(regexp_replace(regexp_replace(b, "<[^>]*>", " "), " +", " "))

  private def toks(txt: Column): Column =
    filter(split(txt, " "), t => t =!= "")

  /** Per-block features: array of (txt, nt, nl, ns) structs for every
    * non-empty block, in document order. Three transform stages so each
    * expensive derivation (tag strip, anchor extraction, tokenization)
    * is evaluated ONCE per block — higher-order functions run interpreted,
    * so a nt/ns pair that re-split the text would double the regex work
    * (measured 1.5× on the x34 bench before this shape).
    */
  def blockFeatures(html: Column): Column = {
    val withLink = filter(
      transform(split(html, blockTagRegex), seg =>
        struct(
          strip(seg).as("txt"),
          size(toks(array_join(
            regexp_extract_all(seg, lit("(?i)<a[^>]*>([^<]*)</a>"), lit(1)),
            " "))).as("nl"))),
      f => f.getField("txt") =!= "")
    val withToks = transform(withLink, f =>
      struct(
        f.getField("txt").as("txt"),
        toks(f.getField("txt")).as("tk"),
        f.getField("nl").as("nl")))
    transform(withToks, f =>
      struct(
        f.getField("txt").as("txt"),
        size(f.getField("tk")).as("nt"),
        f.getField("nl").as("nl"),
        size(filter(f.getField("tk"),
          t => t.isin(TextFunctions.stopwords: _*))).as("ns")))
  }

  /** The good-block predicate over a [[blockFeatures]] struct — integer
    * arithmetic only (mirrored verbatim in the x34 oracle).
    */
  def isGood(f: Column): Column =
    f.getField("nt") >= 5 &&
      f.getField("nl") * 3 <= f.getField("nt") &&
      f.getField("ns") * 40 >= f.getField("nt")

  /** Surviving blocks of an html column, in document order. */
  def goodBlocks(html: Column): Column =
    filter(blockFeatures(html), f => isGood(f))

  /** Extracted main content: good blocks joined with single spaces
    * ('' when nothing survives).
    */
  def mainContent(html: Column): Column =
    array_join(transform(goodBlocks(html), _.getField("txt")), " ")

  /** Deterministic fixture wrapper for the x34/x35 queries: wraps `text`
    * (split in token halves into two paragraphs) in nav/ads/footer chrome
    * chosen by `id % 3` — variant 0 has no ads block, variant 2 adds a
    * too-short paragraph BETWEEN the two real paragraphs (so the x35
    * context-propagation pass has a promotable case while x34's base
    * classification drops it — the good-block set is order-insensitive, so
    * x34's result is unaffected by where the chrome sits). Pure
    * string/array functions so DuckDB reproduces the bytes.
    */
  def htmlize(id: Column, text: Column): Column = {
    val t = TextFunctions.tokens(text)
    val half = floor((size(t) + lit(1)) / lit(2)).cast("int")
    val p1 = array_join(slice(t, lit(1), half), " ")
    val p2 = array_join(slice(t, half + lit(1), size(t) - half), " ")
    val nav = lit("""<nav><a href="/">home</a> <a href="/about">about</a> <a href="/login">login</a></nav>""")
    val ads = lit("""<div><a href="/buy">buy now</a> <a href="/sub">subscribe today</a> limited offer click here</div>""")
    val footer = lit("""<footer>copyright 2026 <a href="/terms">terms</a> <a href="/privacy">privacy</a> all rights reserved</footer>""")
    concat(
      lit("<html><body>"), nav,
      lit("<p>"), p1, lit("</p>"),
      when(pmod(id, lit(3)) === 2, lit("<p>ok</p>")).otherwise(lit("")),
      lit("<p>"), p2, lit("</p>"),
      when(pmod(id, lit(3)) >= 1, ads).otherwise(lit("")),
      footer, lit("</body></html>"))
  }

  /** jusText context propagation (the smoothing pass the base classifier
    * skips): a NEAR-GOOD block — too short for the length rule (1 ≤ nt < 5)
    * but with zero anchor tokens — is promoted to good when BOTH immediate
    * neighbors are base-good (headers and one-line connectors between real
    * paragraphs survive; short chrome wedged against boilerplate stays
    * dropped). Still a pure per-row expression: the neighbor lookups are
    * array indexing inside one transform.
    *
    * Returns the (txt, base, keep) struct array; [[mainContentSmoothed]]
    * reassembles keep=true blocks in order.
    */
  def smoothedBlocks(feats: Column): Column = {
    val g = transform(feats, f => isGood(f))
    transform(feats, (f, i) =>
      struct(
        f.getField("txt").as("txt"),
        isGood(f).as("base"),
        (isGood(f) ||
          (f.getField("nt") >= 1 && f.getField("nt") < 5 &&
            f.getField("nl") === 0 &&
            coalesce(get(g, i - 1), lit(false)) &&
            coalesce(get(g, i + 1), lit(false)))).as("keep")))
  }

  def mainContentSmoothed(feats: Column): Column =
    array_join(
      transform(filter(smoothedBlocks(feats), s => s.getField("keep")),
        _.getField("txt")),
      " ")
}
