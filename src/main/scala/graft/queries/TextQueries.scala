package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Text analysis — SURVEY.md §2.9 (T1-T6) plus the LLM-pipeline text ops
  * (quality scoring, regex token counting, fingerprinting). These are the
  * Elasticsearch full-text surface rebuilt relationally: tokenize with
  * codegen'd `split`, explode only (doc_id, term) pairs, aggregate.
  *
  * DuckDB mirrors: `string_split`+`unnest` ≙ `split`+`explode`;
  * `list_filter`/`list_transform` ≙ higher-order `filter`/`transform`.
  */
object TextQueries extends QueryGroup {

  private val tok =
    "list_filter(string_split(text, ' '), t -> t <> '')"

  def all: Seq[Q] = Seq(

    // T1 — tokenization; per-doc token counts.
    Q("t1_tokenize",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, len($tok) AS n_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // T2 — multi-substring search (the reference's wait_for OR-match,
    // irclogbot.py:145-157, as a data-path filter).
    Q("t2_term_search",
      (s, d) => Tables(s, d, "documents")
        .filter(col("text").contains("merge scan") || col("text").contains("hash join"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE contains(text, 'merge scan') OR contains(text, 'hash join')
             |ORDER BY doc_id""".stripMargin)),

    // T2 — regex (phrase-pattern) search: Spark rlike ≙ DuckDB
    // regexp_matches (both RE2-class engines).
    Q("t2_regex_search",
      (s, d) => Tables(s, d, "documents")
        .filter(col("text").rlike("merge (scan|sort)"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, source FROM documents
             |WHERE regexp_matches(text, 'merge (scan|sort)')
             |ORDER BY doc_id""".stripMargin)),

    // T3 — corpus term frequency, top 50.
    Q("t3_term_freq",
      (s, d) => Tables(s, d, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term"))
        .limit(50),
      Some(s"""SELECT term, count(*) AS cnt
              |FROM (SELECT unnest($tok) AS term FROM documents)
              |GROUP BY term ORDER BY cnt DESC, term LIMIT 50""".stripMargin)),

    // T3 — document frequency, top 50.
    Q("t3_doc_freq",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .orderBy(col("df").desc, col("term"))
        .limit(50),
      Some(s"""SELECT term, count(DISTINCT doc_id) AS df
              |FROM (SELECT doc_id, unnest($tok) AS term FROM documents)
              |GROUP BY term ORDER BY df DESC, term LIMIT 50""".stripMargin)),

    // T4 — TF-IDF relevance, top 100 (score = tf * ln(N/df), one double op
    // sequence on exact integers → deterministic).
    Q("t4_tfidf",
      (s, d) => {
        val toks = TextFunctions.postings(
          Tables(s, d, "documents"), col("doc_id"), col("text"))
        val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val df = toks.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
        val n = Tables(s, d, "documents").agg(count(lit(1)).as("n"))
        tf.join(df, "term").crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"),
            round(col("tf") * log(col("n") * lit(1.0) / col("df")), 6).as("score"))
          .orderBy(col("score").desc, col("doc_id"), col("term"))
          .limit(100)
      },
      Some(s"""WITH tokd AS (SELECT doc_id, unnest($tok) AS term FROM documents),
              |     tf AS (SELECT doc_id, term, count(*) AS tf FROM tokd GROUP BY 1, 2),
              |     df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokd GROUP BY 1),
              |     n AS (SELECT count(*) AS n FROM documents)
              |SELECT tf.doc_id, tf.term, round(tf * ln(n * 1.0 / df), 6) AS score
              |FROM tf JOIN df USING (term) CROSS JOIN n
              |ORDER BY score DESC, doc_id, term LIMIT 100""".stripMargin)),

    // T5 — facets over lang × source.
    Q("t5_facets",
      (s, d) => Tables(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"), col("source")),
      Some("""SELECT lang, source, count(*) AS n,
             |       CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin)),

    // T6 — bigram shingles, top 50.
    Q("t6_bigrams",
      (s, d) => Tables(s, d, "documents")
        .select(explode(TextFunctions.bigrams(col("text"))).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(50),
      Some(s"""WITH t AS (SELECT $tok AS toks FROM documents),
              |     b AS (SELECT unnest(CASE WHEN len(toks) >= 2
              |                   THEN list_transform(generate_series(1, len(toks) - 1),
              |                                       i -> toks[i] || ' ' || toks[i + 1])
              |                   ELSE [] END) AS bigram
              |           FROM t)
              |SELECT bigram, count(*) AS cnt FROM b
              |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 50""".stripMargin)),

    // X1 — quality scoring for training-data filtering. The token array is
    // materialized in its own projection (x34 precedent, r19 verdict #1):
    // higher-order `filter(split(...))` does NOT reliably CSE, so a single
    // projection that referenced tokens(text) in four output expressions
    // ran the split+filter four times per row. Stage 1 tokenizes once;
    // stage 2 derives the two counts; stage 3 is cheap arithmetic.
    // CollapseProject keeps the stages separate because __toks/__nsw are
    // non-cheap and multiply-referenced.
    Q("x1_quality_score",
      (s, d) =>
        Tables(s, d, "documents")
          .select(col("doc_id"), length(col("text")).as("__nc"),
            TextFunctions.tokens(col("text")).as("__toks"))
          .select(col("doc_id"), col("__nc"),
            size(col("__toks")).as("n_tokens"),
            TextFunctions.stopwordCount(col("__toks")).as("n_stopwords"))
          .select(col("doc_id"), col("n_tokens"),
            round(col("__nc").cast("double") / col("n_tokens"), 6).as("chars_per_token"),
            col("n_stopwords"),
            round(col("n_stopwords").cast("double") / col("n_tokens"), 6).as("stopword_ratio"))
          .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, length(text) AS n_chars, $tok AS toks FROM documents),
              |     q AS (SELECT doc_id, n_chars, len(toks) AS n_tokens,
              |                  len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','for','on','with'))) AS n_stopwords
              |           FROM t)
              |SELECT doc_id, n_tokens,
              |       round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS chars_per_token,
              |       n_stopwords,
              |       round(CAST(n_stopwords AS DOUBLE) / n_tokens, 6) AS stopword_ratio
              |FROM q ORDER BY doc_id""".stripMargin)),

    // x16 — character-entropy quality signal: Shannon entropy (nats) of
    // each doc's character distribution. Near-zero = repeated-character
    // garbage, natural text sits ~3-4 nats — the cheap complement to x7's
    // token-level repetition filter (it catches single-char floods that
    // tokenize to one "word"). Determinism: each character class's
    // cnt·ln(cnt/len) term is quantized to integer micros (one mirrored
    // IEEE sequence), the per-doc sum is exact integer arithmetic, and the
    // final divide is the only (mirrored) float op.
    //
    // Entirely MAP-SIDE (r11 verdict item #3 — the first version shuffled
    // one row per corpus character, twice): the native
    // [[graft.functions.CharEntropySum]] kernel run-lengths each row's
    // sorted code points in one JVM pass — no Exchange anywhere but the
    // final sort. The integer term sum is addition-order-free, so the
    // kernel equals the old groupBy bit-for-bit and the DuckDB oracle is
    // unchanged.
    Q("x16_char_entropy",
      (s, d) => {
        val e = call_function("char_entropy_sum", col("text"))
        Tables(s, d, "documents")
          .select(col("doc_id"), e.getField("n_chars").as("n_chars_text"),
            e.getField("s_micro").as("__s"))
          .select(col("doc_id"), col("n_chars_text"),
            (-col("__s")).as("ent_sum_micro"),
            round((-col("__s")) * lit(1.0)
              / (lit(1000000.0) * col("n_chars_text")), 6).as("entropy_nats"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
             |            FROM documents),
             |c AS (SELECT doc_id, ch, count(*) AS cnt FROM ch GROUP BY 1, 2),
             |l AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS len
             |      FROM c GROUP BY 1),
             |t AS (SELECT c.doc_id, len,
             |             CAST(floor((cnt * ln(cnt * 1.0 / len))
             |                  * 1000000.0 + 0.5) AS BIGINT) AS term_micro
             |      FROM c JOIN l USING (doc_id)),
             |a AS (SELECT doc_id, len, CAST(sum(term_micro) AS BIGINT) AS s
             |      FROM t GROUP BY 1, 2)
             |SELECT doc_id, len AS n_chars_text, -s AS ent_sum_micro,
             |       round((-s) * 1.0 / (1000000.0 * len), 6) AS entropy_nats
             |FROM a ORDER BY doc_id""".stripMargin)),

    // X2 — BPE-ish regex token counting.
    Q("x2_token_count_regex",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"), size(TextFunctions.tokensRegex(col("text"))).as("n_tokens"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |       len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), t -> t <> '')) AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // x20 — script/character-class ratio QC: per-doc counts of ASCII
    // letters, digits and spaces (explicit ASCII classes — identical
    // semantics in both regex engines) plus the alpha ratio. The signal
    // that catches code-as-text, digit floods, and non-target-script
    // contamination before tokenization. Entirely map-side: four
    // regexp_replace length deltas per row, no Exchange but the final
    // sort; at 100 TB this is a pure scan-projection.
    Q("x20_script_ratio",
      (s, d) => {
        val n = length(col("text"))
        def cnt(pat: String) =
          (n - length(regexp_replace(col("text"), pat, ""))).cast("long")
        Tables(s, d, "documents").select(
          col("doc_id"),
          n.cast("long").as("n_chars"),
          cnt("[a-zA-Z]").as("n_alpha"),
          cnt("[0-9]").as("n_digit"),
          cnt("[ ]").as("n_space"),
          (n.cast("long") - cnt("[a-zA-Z]") - cnt("[0-9]") - cnt("[ ]"))
            .as("n_other"),
          // empty text: Spark's x/0 is NaN but DuckDB's is NULL — guard the
          // divide on both sides so the ratio is NULL for n_chars = 0
          round(when(n > 0, cnt("[a-zA-Z]") * lit(1.0) / n), 6).as("alpha_ratio"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (
             |  SELECT doc_id, length(text) AS n_chars,
             |         length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS n_alpha,
             |         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
             |         length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS n_space
             |  FROM documents)
             |SELECT doc_id, n_chars, n_alpha, n_digit, n_space,
             |       n_chars - n_alpha - n_digit - n_space AS n_other,
             |       round(n_alpha * 1.0 / nullif(n_chars, 0), 6) AS alpha_ratio
             |FROM c ORDER BY doc_id""".stripMargin)),

    // X3 — document fingerprint (md5 of normalized text) + exact-dup groups.
    Q("x3_fingerprint",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // T2/T4 — the ES match-query analog: OR-of-terms BM25 search API.
    // Oracle-paired: per-term scores are pivoted and summed in sorted term
    // order (hash, merge, scan), one fixed IEEE op sequence on both engines.
    Q("t7_text_search",
      (s, d) => graft.search.IrcSearch.searchText(
        Tables(s, d, "documents"), "doc_id", "text", "merge scan hash", 20),
      Some(s"""WITH tok AS (SELECT doc_id,
              |                    unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS term
              |             FROM documents),
              |     qtok AS (SELECT * FROM tok WHERE term IN ('hash', 'merge', 'scan')),
              |     tf AS (SELECT doc_id, term, count(*) AS tf FROM qtok GROUP BY 1, 2),
              |     dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
              |     df AS (SELECT term, count(DISTINCT doc_id) AS df FROM qtok GROUP BY 1),
              |     st AS (SELECT (SELECT count(*) FROM documents) AS n,
              |                   (SELECT sum(dl) FROM dl) AS total_dl),
              |     sc AS (SELECT tf.doc_id, tf.term,
              |                   ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
              |                   (tf + 1.2 * (0.25 + 0.75 *
              |                    (dl * CAST(n AS DOUBLE) / total_dl))) AS term_score
              |            FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN st),
              |     piv AS (SELECT doc_id,
              |                    max(CASE WHEN term = 'hash' THEN term_score END) AS s_hash,
              |                    max(CASE WHEN term = 'merge' THEN term_score END) AS s_merge,
              |                    max(CASE WHEN term = 'scan' THEN term_score END) AS s_scan
              |             FROM sc GROUP BY doc_id)
              |SELECT doc_id,
              |       round(coalesce(s_hash, 0.0) + coalesce(s_merge, 0.0)
              |             + coalesce(s_scan, 0.0), 6) AS score,
              |       (CASE WHEN s_hash IS NOT NULL THEN 1 ELSE 0 END
              |        + CASE WHEN s_merge IS NOT NULL THEN 1 ELSE 0 END
              |        + CASE WHEN s_scan IS NOT NULL THEN 1 ELSE 0 END) AS n_terms_hit
              |FROM piv ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // X4 — heuristic language ID (rows-only: stopword-vote heuristic, no SQL
    // mirror; accuracy against the fixture lang column asserted in
    // TextFunctionsSpec).
    // x4 — heuristic lang-ID, now oracle-paired: DuckDB has no struct
    // greatest, so the argmax-with-tiebreak is encoded as
    // max(lpad(score)||lang) — identical (score, lang) ordering to Spark's
    // greatest(struct(score, lang)).getField("lang").
    Q("x4_lang_id",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          TextFunctions.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id")),
      Some {
        def votes(words: Seq[String], lang: String): String = {
          val lst = words.map(w => s"'$w'").mkString(",")
          s"lpad(CAST(len(list_filter(toks, x -> x IN ($lst))) AS VARCHAR), 6, '0') || '$lang'"
        }
        s"""WITH t AS (
           |  SELECT doc_id, lang, text,
           |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
           |  FROM documents)
           |SELECT doc_id, lang,
           |       CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           |            ELSE substr(greatest(
           |              ${votes(Seq("the", "and", "of", "to", "is", "with"), "en")},
           |              ${votes(Seq("der", "die", "das", "und", "ist", "mit"), "de")},
           |              ${votes(Seq("el", "la", "los", "que", "es", "con"), "es")},
           |              ${votes(Seq("le", "la", "les", "est", "avec", "dans"), "fr")}), 7)
           |       END AS lang_pred
           |FROM t ORDER BY doc_id""".stripMargin
      }),

    // T8 — PMI collocations: which adjacent word pairs co-occur far more
    // than their unigram frequencies predict. All counts are exact longs;
    // the PMI itself is ONE fixed IEEE op sequence (three multiplies, one
    // divide, ln, round 6) mirrored verbatim in the oracle. Both unigram
    // joins broadcast — the ≥5-count pair vocabulary is tiny next to the
    // token stream that produced it.
    Q("t8_collocations",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val uni = docs
          .select(explode(TextFunctions.tokens(col("text"))).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        val nu = uni.agg(sum(col("cnt")).as("nu"))
        val pairs = docs
          .select(explode(TextFunctions.bigrams(col("text"))).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("pcnt"))
        val nb = pairs.agg(sum(col("pcnt")).as("nb"))
        pairs
          .filter(col("pcnt") >= 5)
          .select(
            substring_index(col("bigram"), " ", 1).as("term_a"),
            substring_index(col("bigram"), " ", -1).as("term_b"),
            col("pcnt"))
          .join(broadcast(uni.select(col("term").as("term_a"), col("cnt").as("ca"))), "term_a")
          .join(broadcast(uni.select(col("term").as("term_b"), col("cnt").as("cb"))), "term_b")
          .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
          .select(col("term_a"), col("term_b"), col("pcnt"),
            round(log((col("pcnt") * lit(1.0) * col("nu") * col("nu"))
              / (col("nb") * lit(1.0) * col("ca") * col("cb"))), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("term_a"), col("term_b"))
          .limit(50)
      },
      Some(s"""WITH t AS (SELECT $tok AS toks FROM documents),
              |     u AS (SELECT unnest(toks) AS term FROM t),
              |     uni AS (SELECT term, count(*) AS cnt FROM u GROUP BY 1),
              |     nu AS (SELECT CAST(sum(cnt) AS BIGINT) AS nu FROM uni),
              |     bg AS (SELECT unnest(CASE WHEN len(toks) >= 2
              |                   THEN list_transform(generate_series(1, len(toks) - 1),
              |                                       i -> toks[i] || ' ' || toks[i + 1])
              |                   ELSE [] END) AS bigram
              |            FROM t),
              |     pairs AS (SELECT bigram, count(*) AS pcnt FROM bg GROUP BY 1),
              |     nb AS (SELECT CAST(sum(pcnt) AS BIGINT) AS nb FROM pairs),
              |     p AS (SELECT split_part(bigram, ' ', 1) AS term_a,
              |                  split_part(bigram, ' ', 2) AS term_b, pcnt
              |           FROM pairs WHERE pcnt >= 5)
              |SELECT term_a, term_b, pcnt,
              |       round(ln((pcnt * 1.0 * nu * nu) / (nb * 1.0 * ca.cnt * cb.cnt)), 6) AS pmi
              |FROM p
              |JOIN uni ca ON ca.term = p.term_a
              |JOIN uni cb ON cb.term = p.term_b
              |CROSS JOIN nu CROSS JOIN nb
              |ORDER BY pmi DESC, term_a, term_b LIMIT 50""".stripMargin)),

    // T10 — phrase query through a POSITIONAL inverted index (what ES
    // match_phrase actually executes, vs t2's substring scan): posexplode
    // tokens into (doc, term, pos) postings, probe the two term posting
    // lists, and require adjacency pos_b = pos_a + 1. The postings join is
    // keyed on doc_id after per-term filters — at scale the filters hit the
    // term-bucketed postings table instead of re-tokenizing the corpus.
    Q("t10_phrase_index",
      (s, d) => {
        val pos = Tables(s, d, "documents")
          .select(col("doc_id"),
            posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))
        val a = pos.filter(col("term") === "merge")
          .select(col("doc_id"), col("pos"))
        val b = pos.filter(col("term") === "scan")
          .select(col("doc_id").as("doc_b"), col("pos").as("pos_b"))
        a.join(b, col("doc_id") === col("doc_b") && col("pos_b") === col("pos") + 1)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_hits"), min(col("pos")).cast("long").as("first_pos"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH z AS (SELECT doc_id, $tok AS toks FROM documents),
              |     p AS (SELECT doc_id, i - 1 AS pos, toks[i] AS term
              |           FROM z, unnest(range(1, len(toks) + 1)) AS t(i))
              |SELECT a.doc_id, count(*) AS n_hits,
              |       CAST(min(a.pos) AS BIGINT) AS first_pos
              |FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
              |WHERE a.term = 'merge' AND b.term = 'scan'
              |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin)),

    // T19 — span_near (ES span queries): the two terms IN ORDER within a
    // slop of 2 — i.e. 0 < gap ≤ slop+1 positions apart — generalizing
    // t10's exact-adjacency phrase match. Same positional-postings shape:
    // the term filters push to the scan, the join is doc-keyed over the
    // two (tiny) filtered position sets, and the gap predicate is a
    // residual — per-doc position lists stay bounded however large the
    // corpus, because the join never touches unfiltered postings.
    Q("t19_span_near",
      (s, d) => {
        val pos = Tables(s, d, "documents")
          .select(col("doc_id"),
            posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))
        val a = pos.filter(col("term") === "merge")
          .select(col("doc_id"), col("pos"))
        val b = pos.filter(col("term") === "scan")
          .select(col("doc_id").as("doc_b"), col("pos").as("pos_b"))
        a.join(b, col("doc_id") === col("doc_b") &&
            col("pos_b") > col("pos") && col("pos_b") <= col("pos") + 3)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_spans"),
            min(col("pos")).cast("long").as("first_pos"),
            min(col("pos_b") - col("pos")).cast("long").as("min_gap"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH z AS (SELECT doc_id, $tok AS toks FROM documents),
              |     p AS (SELECT doc_id, i - 1 AS pos, toks[i] AS term
              |           FROM z, unnest(range(1, len(toks) + 1)) AS t(i))
              |SELECT a.doc_id, count(*) AS n_spans,
              |       CAST(min(a.pos) AS BIGINT) AS first_pos,
              |       CAST(min(b.pos - a.pos) AS BIGINT) AS min_gap
              |FROM p a JOIN p b ON a.doc_id = b.doc_id
              |                 AND b.pos > a.pos AND b.pos <= a.pos + 3
              |WHERE a.term = 'merge' AND b.term = 'scan'
              |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin)),

    // T20 — bool query with minimum_should_match (ES): docs matching at
    // least 2 of the 3 query terms, scored by total query-term frequency.
    // The IN-list term filter pushes to the postings scan, so the corpus
    // contribution is one filtered explode + one doc-keyed aggregate —
    // the should-clause cardinality never multiplies the scan.
    Q("t20_min_should_match",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
        .filter(col("term").isin("merge", "scan", "spark"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("term")).as("n_terms"),
          count(lit(1)).as("score"))
        .filter(col("n_terms") >= 2)
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, unnest($tok) AS term FROM documents)
              |SELECT doc_id,
              |       CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
              |       count(*) AS score
              |FROM t WHERE term IN ('merge', 'scan', 'spark')
              |GROUP BY doc_id
              |HAVING count(DISTINCT term) >= 2
              |ORDER BY doc_id""".stripMargin)),

    // T11 — fuzzy term search (ES match with fuzziness=1): expand the query
    // term against the TERM DICTIONARY at edit distance ≤ 1 (what ES's FST
    // automaton computes — the dictionary is tiny next to the corpus, so
    // the levenshtein scan is a broadcast-side map filter, the exact
    // relational rendering of that plan), then hit the postings with the
    // expanded term set. "merje" matches "merge"; hit counts per doc.
    Q("t11_fuzzy_search",
      (s, d) => {
        val toks = Tables(s, d, "documents")
          .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
        val expanded = toks.select(col("term")).distinct()
          .filter(levenshtein(col("term"), lit("merje")) <= 1)
        toks.join(broadcast(expanded), "term")
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("hits"))
          .orderBy(col("doc_id"), col("term"))
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest($tok) AS term FROM documents),
              |     x AS (SELECT DISTINCT term FROM t
              |           WHERE levenshtein(term, 'merje') <= 1)
              |SELECT doc_id, term, count(*) AS hits
              |FROM t JOIN x USING (term)
              |GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin)),

    // T12 — search-hit highlighting (ES highlight): a fixed-width snippet
    // window centered on the first occurrence of the query phrase — pure
    // strpos/substr integer arithmetic, mirrored exactly. Completes the
    // ES search surface: match (t2), phrase (t10), fuzzy (t11), facets
    // (t5), relevance (h8), highlight (here).
    Q("t12_highlight",
      (s, d) => Tables(s, d, "documents")
        .filter(col("text").contains("merge scan"))
        .select(col("doc_id"),
          (instr(col("text"), "merge scan") - 1).cast("long").as("hit_at"),
          substring(col("text"),
            greatest(lit(1), instr(col("text"), "merge scan") - 20), lit(60))
            .as("snippet"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |       CAST(strpos(text, 'merge scan') - 1 AS BIGINT) AS hit_at,
             |       substr(text, greatest(1, strpos(text, 'merge scan') - 20), 60)
             |         AS snippet
             |FROM documents WHERE contains(text, 'merge scan')
             |ORDER BY doc_id""".stripMargin)),

    // T13 — query-likelihood retrieval with Dirichlet smoothing (Zhai &
    // Lafferty): score(d,Q) = Σ_q ln((tf + μ·cf/N) / (len_d + μ)), μ=2000 —
    // the LM-based ranking model next to BM25 (h8). Smoothing means every
    // doc scores against every query term (tf=0 included), so the grid is
    // docs × the 2-term query (a broadcast), never docs × vocabulary.
    // Same determinism scheme as x12: per-term quantization to integer
    // micros, integer sum, ranked on the exact bigint.
    Q("t13_query_likelihood",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val toks = TextFunctions.postings(docs, col("doc_id"), col("text"))
        val docLen = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
        val tf = toks.filter(col("term").isin("merge", "scan"))
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val cf = toks.filter(col("term").isin("merge", "scan"))
          .groupBy(col("term")).agg(count(lit(1)).as("cf"))
        val n = toks.agg(count(lit(1)).cast("long").as("n"))
        docLen
          .crossJoin(broadcast(cf.crossJoin(n)))
          .join(tf, Seq("doc_id", "term"), "left_outer")
          .select(col("doc_id"),
            floor(log((coalesce(col("tf"), lit(0L)) * lit(1.0)
                + lit(2000.0) * col("cf") / col("n"))
              / (col("len") + lit(2000.0))) * lit(1000000.0) + lit(0.5))
              .cast("long").as("lp_micro"))
          .groupBy(col("doc_id"))
          .agg(sum(col("lp_micro")).as("score_micro"))
          .select(col("doc_id"), col("score_micro"),
            round(col("score_micro") * lit(1.0) / lit(1000000.0), 6).as("score"))
          .orderBy(col("score_micro").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest($tok) AS term FROM documents),
              |     dl AS (SELECT doc_id, count(*) AS len FROM t GROUP BY 1),
              |     tf AS (SELECT doc_id, term, count(*) AS tf FROM t
              |            WHERE term IN ('merge', 'scan') GROUP BY 1, 2),
              |     cf AS (SELECT term, count(*) AS cf FROM t
              |            WHERE term IN ('merge', 'scan') GROUP BY 1),
              |     n AS (SELECT count(*) AS n FROM t),
              |     lp AS (SELECT dl.doc_id,
              |                   CAST(floor(ln((coalesce(tf.tf, 0) * 1.0
              |                       + 2000.0 * cf.cf / n.n)
              |                     / (dl.len + 2000.0)) * 1000000.0 + 0.5) AS BIGINT)
              |                     AS lp_micro
              |            FROM dl CROSS JOIN cf CROSS JOIN n
              |            LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.term = cf.term),
              |     agg AS (SELECT doc_id,
              |                    CAST(sum(lp_micro) AS BIGINT) AS score_micro
              |             FROM lp GROUP BY 1)
              |SELECT doc_id, score_micro,
              |       round(score_micro * 1.0 / 1000000.0, 6) AS score
              |FROM agg ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin)),

    // x12 — corpus-LM quality scoring (the CCNet-style filter): score each
    // document by its mean token log-probability under the corpus's own
    // unigram model. Low scores = rare-token soup (mojibake, boilerplate
    // IDs); high scores = stopword-heavy filler — both ends are what a
    // training-data pipeline cuts. Determinism: the per-token log-prob is
    // quantized to integer MICROS with tie-free floor(x*1e6 + 0.5) (one
    // mirrored IEEE op sequence, the v10 rounding trick), so the per-doc
    // SUM is exact integer arithmetic — associative, partition-order-proof —
    // and only the final avg performs a (mirrored) float divide. The unigram
    // model is a tiny agg of the token stream → broadcast both joins.
    Q("x12_unigram_logprob",
      (s, d) => graft.pipeline.LmScore.unigramAvgLogProb(
        Tables(s, d, "documents"), col("doc_id"), col("text"))
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, unnest($tok) AS term FROM documents),
              |     uni AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
              |     n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM uni),
              |     lp AS (SELECT doc_id,
              |                   CAST(floor(ln(cnt * 1.0 / n) * 1000000.0 + 0.5) AS BIGINT)
              |                     AS lp_micro
              |            FROM t JOIN uni USING (term) CROSS JOIN n),
              |     agg AS (SELECT doc_id, count(*) AS n_toks,
              |                    CAST(sum(lp_micro) AS BIGINT) AS sum_lp_micro
              |             FROM lp GROUP BY 1)
              |SELECT doc_id, n_toks, sum_lp_micro,
              |       round((sum_lp_micro * 1.0 / 1000000.0) / n_toks, 6) AS avg_lp
              |FROM agg ORDER BY doc_id""".stripMargin)),

    // x14 — bigram-LM scoring (the x12 upgrade): mean log of the bigram
    // conditional P(t_i | t_{i-1}) = c(bigram) / c(prefix-position), the
    // order-sensitive fluency signal a unigram model can't see (scrambled
    // text keeps its x12 score but craters here). Prefix counts come from
    // the bigram stream itself so the conditionals sum to 1 per prefix.
    // Same determinism scheme as x12: per-bigram log quantized to integer
    // micros, exact integer sum, one mirrored divide at the end. Both count
    // tables are tiny aggregates of the token stream → broadcast.
    Q("x14_bigram_logprob",
      (s, d) => graft.pipeline.LmScore.bigramAvgLogProb(
        Tables(s, d, "documents"), col("doc_id"), col("text"))
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, $tok AS toks FROM documents),
              |     bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
              |              THEN list_transform(generate_series(1, len(toks) - 1),
              |                                  i -> toks[i] || ' ' || toks[i + 1])
              |              ELSE [] END) AS bigram
              |            FROM t),
              |     bgc AS (SELECT bigram, count(*) AS bc FROM bg GROUP BY 1),
              |     pc AS (SELECT split_part(bigram, ' ', 1) AS prefix, count(*) AS pcnt
              |            FROM bg GROUP BY 1),
              |     lp AS (SELECT doc_id,
              |                   CAST(floor(ln(bc * 1.0 / pcnt) * 1000000.0 + 0.5) AS BIGINT)
              |                     AS lp_micro
              |            FROM bg
              |            JOIN bgc USING (bigram)
              |            JOIN pc ON pc.prefix = split_part(bg.bigram, ' ', 1)),
              |     agg AS (SELECT doc_id, count(*) AS n_bigrams,
              |                    CAST(sum(lp_micro) AS BIGINT) AS sum_lp_micro
              |             FROM lp GROUP BY 1)
              |SELECT doc_id, n_bigrams, sum_lp_micro,
              |       round((sum_lp_micro * 1.0 / 1000000.0) / n_bigrams, 6) AS avg_lp
              |FROM agg ORDER BY doc_id""".stripMargin)),

    // T9 — per-doc keyword extraction: top-3 terms by TF-IDF within each
    // document (the per-doc complement of the corpus-wide t4 ranking).
    // Rank key is an exact BIGINT — tf × idf_micro, where idf_micro is the
    // floor(x*1e6 + 0.5) quantization of ln(N/df) — so the window ordering
    // never compares engine-specific doubles; score surfaces as a single
    // mirrored divide at the end.
    Q("t9_keyphrase",
      (s, d) => {
        val toks = TextFunctions.postings(
          Tables(s, d, "documents"), col("doc_id"), col("text"))
        val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val df = toks.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
        val n = Tables(s, d, "documents").agg(count(lit(1)).cast("long").as("n"))
        val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"), col("tf"),
            (col("tf") * floor(log(col("n") * lit(1.0) / col("df")) * lit(1000000.0) + lit(0.5))
              .cast("long")).as("score_micro"))
        scored
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("doc_id"))
              .orderBy(col("score_micro").desc, col("term"))))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("rn").cast("long").as("rn"), col("term"),
            col("tf"), round(col("score_micro") * lit(1.0) / lit(1000000.0), 6).as("score"))
          .orderBy(col("doc_id"), col("rn"))
      },
      Some(s"""WITH tokd AS (SELECT doc_id, unnest($tok) AS term FROM documents),
              |     tf AS (SELECT doc_id, term, count(*) AS tf FROM tokd GROUP BY 1, 2),
              |     df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokd GROUP BY 1),
              |     n AS (SELECT count(*) AS n FROM documents),
              |     sc AS (SELECT doc_id, term, tf,
              |                   tf * CAST(floor(ln(n * 1.0 / df) * 1000000.0 + 0.5) AS BIGINT)
              |                     AS score_micro
              |            FROM tf JOIN df USING (term) CROSS JOIN n),
              |     r AS (SELECT doc_id, term, tf, score_micro,
              |                  row_number() OVER (PARTITION BY doc_id
              |                                     ORDER BY score_micro DESC, term) AS rn
              |           FROM sc)
              |SELECT doc_id, CAST(rn AS BIGINT) AS rn, term, tf,
              |       round(score_micro * 1.0 / 1000000.0, 6) AS score
              |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin)),

    // T15 — more_like_this (the ES MLT query): extract the source doc's
    // top-5 terms by the exact BIGINT tf×idf_micro key (t9's technique),
    // then score every other doc by the sum of matched-term idf_micro —
    // presence×idf, each query term counted once, so the ENTIRE ranking is
    // integer arithmetic under the hash gate. Scale: the query-term set is
    // k-bounded (TakeOrdered 5) and broadcasts into the postings join; the
    // only corpus-scale shuffle is the per-doc sum. The idf table is built
    // once from the shared cached postings frame.
    Q("t15_more_like_this",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val toks = TextFunctions.postings(docs, col("doc_id"), col("text"))
        val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val dfr = toks.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
        val n = docs.agg(count(lit(1)).cast("long").as("n"))
        val idf = dfr.crossJoin(broadcast(n))
          .select(col("term"),
            floor(log(col("n") * lit(1.0) / col("df")) * lit(1000000.0) + lit(0.5))
              .cast("long").as("idf_micro"))
        val qterms = tf.filter(col("doc_id") === 0).join(idf, "term")
          .select(col("term"), col("idf_micro"),
            (col("tf") * col("idf_micro")).as("s"))
          .orderBy(col("s").desc, col("term")).limit(5)
          .select(col("term"), col("idf_micro"))
        tf.filter(col("doc_id") =!= 0)
          .join(broadcast(qterms), "term")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_matched"),
            sum(col("idf_micro")).cast("long").as("score_micro"))
          .select(col("doc_id"), col("n_matched"), col("score_micro"),
            round(col("score_micro") * lit(1.0) / lit(1000000.0), 6).as("score"))
          .orderBy(col("score_micro").desc, col("doc_id")).limit(20)
      },
      Some(s"""WITH tokd AS (SELECT doc_id, unnest($tok) AS term FROM documents),
              |     tf AS (SELECT doc_id, term, count(*) AS tf FROM tokd GROUP BY 1, 2),
              |     dfr AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokd GROUP BY 1),
              |     n AS (SELECT count(*) AS n FROM documents),
              |     idf AS (SELECT term,
              |                    CAST(floor(ln(n * 1.0 / df) * 1000000.0 + 0.5) AS BIGINT)
              |                      AS idf_micro
              |             FROM dfr CROSS JOIN n),
              |     q0 AS (SELECT term, idf_micro, tf * idf_micro AS s
              |            FROM tf JOIN idf USING (term)
              |            WHERE doc_id = 0
              |            ORDER BY s DESC, term LIMIT 5),
              |     c AS (SELECT tf.doc_id, count(*) AS n_matched,
              |                  CAST(sum(idf_micro) AS BIGINT) AS score_micro
              |           FROM tf JOIN q0 USING (term)
              |           WHERE tf.doc_id <> 0 GROUP BY 1)
              |SELECT doc_id, n_matched, score_micro,
              |       round(score_micro * 1.0 / 1000000.0, 6) AS score
              |FROM c ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin)),

    // T16 — significant_terms (the ES agg, JLH heuristic): terms whose
    // document frequency in a foreground slice (lang='de') is anomalously
    // high vs the whole corpus. JLH = (fg_rate − bg_rate) × (fg_rate /
    // bg_rate): absolute lift × relative lift, both rates from exact doc
    // counts, one mirrored IEEE sequence, term tie-break — the fused ORDER
    // is deterministic even under score ties. Scale: one distinct
    // (doc, term) explode → one term-keyed agg carrying two counters (the
    // fg counter rides the same shuffle as bg — not a second pass); the
    // corpus totals are a broadcast 1-row frame.
    Q("t16_significant_terms",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        // lang rides the token row from the scan (functionally dependent on
        // doc_id, so the distinct keeps (doc, term) cardinality) — no
        // corpus-side join back to the documents table at all: the naive
        // postings⋈docs formulation costs an extra full shuffle of the
        // postings stream at any scale where the doc table stops being
        // broadcastable.
        val td = docs
          .select(col("doc_id"), col("lang"),
            explode(TextFunctions.tokens(col("text"))).as("term"))
          .distinct()
        val stats = td
          .groupBy(col("term"))
          .agg(count(lit(1)).as("df_bg"),
            sum(when(col("lang") === "de", 1).otherwise(0)).cast("long").as("df_fg"))
        val nn = docs.agg(count(lit(1)).cast("long").as("n_bg"),
          sum(when(col("lang") === "de", 1).otherwise(0)).cast("long").as("n_fg"))
        stats.crossJoin(broadcast(nn))
          .filter(col("df_fg") >= 5)
          .withColumn("fr", col("df_fg") * lit(1.0) / col("n_fg"))
          .withColumn("br", col("df_bg") * lit(1.0) / col("n_bg"))
          .withColumn("jlh_raw", (col("fr") - col("br")) * (col("fr") / col("br")))
          .orderBy(col("jlh_raw").desc, col("term")).limit(25)
          .select(col("term"), col("df_fg"), col("df_bg"),
            round(col("jlh_raw"), 6).as("jlh"))
      },
      Some(s"""WITH tokd AS (SELECT doc_id, unnest($tok) AS term FROM documents),
              |     td AS (SELECT DISTINCT doc_id, term FROM tokd),
              |     tl AS (SELECT td.doc_id, term, lang
              |            FROM td JOIN documents USING (doc_id)),
              |     stx AS (SELECT term, count(*) AS df_bg,
              |                    CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)
              |                         AS BIGINT) AS df_fg
              |             FROM tl GROUP BY 1),
              |     nn AS (SELECT count(*) AS n_bg,
              |                   CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)
              |                        AS BIGINT) AS n_fg
              |            FROM documents),
              |     j AS (SELECT term, df_fg, df_bg,
              |                  (df_fg * 1.0 / n_fg - df_bg * 1.0 / n_bg) *
              |                  ((df_fg * 1.0 / n_fg) / (df_bg * 1.0 / n_bg)) AS jlh_raw
              |           FROM stx CROSS JOIN nn WHERE df_fg >= 5)
              |SELECT term, df_fg, df_bg, round(jlh_raw, 6) AS jlh
              |FROM j ORDER BY jlh_raw DESC, term LIMIT 25""".stripMargin)),

    // T17 — completion suggester (the ES suggest API): prefix-match the
    // term dictionary, rank by corpus frequency, top 10. The dictionary is
    // the one term-keyed aggregate every text query already shares; the
    // prefix probe is a LIKE pushed onto it and the page is a TakeOrdered.
    // At 100 TB the dictionary is the materialized artifact (vocab-scale,
    // not corpus-scale) — optionally range-partitioned by prefix so a
    // suggest probe touches one partition; the corpus pass happens once at
    // dictionary build, never per keystroke.
    Q("t17_prefix_suggest",
      (s, d) => Tables(s, d, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("freq"))
        .filter(col("term").startsWith("s"))
        .orderBy(col("freq").desc, col("term"))
        .limit(10),
      Some(s"""WITH tokd AS (SELECT unnest($tok) AS term FROM documents),
              |     v AS (SELECT term, count(*) AS freq FROM tokd GROUP BY 1)
              |SELECT term, freq FROM v
              |WHERE term LIKE 's%'
              |ORDER BY freq DESC, term LIMIT 10""".stripMargin)),

    // T18 — term suggester ("did you mean", the ES suggest API's other
    // half, completing t17's completion suggester): for each probe term,
    // the 3 closest dictionary terms within edit distance 2, ranked by
    // (distance, corpus frequency desc, term). The dictionary is the same
    // vocab-scale term aggregate as t17; the PROBES side (a keystroke's
    // worth of terms) broadcasts into a nested-loop join against it —
    // corpus touched once at dictionary build, never per suggestion. At
    // 100 TB the refinement is a deletion-neighborhood blocked join on the
    // dictionary (the j11_fuzzy_join operator, O(n·len) not O(n²)); at
    // vocab×3 the nested loop is already the cheaper plan.
    Q("t18_term_suggest",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe"))
          .orderBy(col("dist"), col("freq").desc, col("term"))
        val vocab = Tables(s, d, "documents")
          .select(explode(TextFunctions.tokens(col("text"))).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("freq"))
        val probes = s.range(1).select(explode(array(
          lit("spakr"), lit("windoww"), lit("bath"))).as("probe"))
        vocab.join(broadcast(probes),
            levenshtein(col("probe"), col("term")) <= 2)
          .withColumn("dist", levenshtein(col("probe"), col("term")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("probe"), col("term"), col("dist"), col("freq"),
            col("rn"))
          .orderBy(col("probe"), col("rn"))
      },
      Some(s"""WITH tokd AS (SELECT unnest($tok) AS term FROM documents),
              |     v AS (SELECT term, count(*) AS freq FROM tokd GROUP BY 1),
              |     p AS (SELECT unnest(['spakr', 'windoww', 'bath']) AS probe),
              |     c AS (SELECT probe, term, levenshtein(probe, term) AS dist, freq
              |           FROM v CROSS JOIN p
              |           WHERE levenshtein(probe, term) <= 2),
              |     r AS (SELECT *, row_number() OVER (PARTITION BY probe
              |                    ORDER BY dist, freq DESC, term) AS rn
              |           FROM c)
              |SELECT probe, term, dist, freq, rn FROM r
              |WHERE rn <= 3 ORDER BY probe, rn""".stripMargin)),

    // T21 — wildcard query (ES `wildcard`, pattern `s*a*` ≙ LIKE
    // 's%a%'): docs containing any vocabulary term matching the pattern,
    // with the matched terms. The pattern filter runs MAP-SIDE on the
    // exploded token stream (before any exchange — where ES walks the
    // term dictionary, the relational dual prunes the postings at the
    // scan), then one (doc_id, term) distinct. Matched terms are joined
    // to a string, not an array — the driver's compare sorts cell
    // values, and array cells are unhashable there.
    Q("t21_wildcard",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .filter(col("term").like("s%a%"))
        .distinct()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"),
          array_join(sort_array(collect_set(col("term"))), ",")
            .as("matched"))
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT DISTINCT doc_id, unnest($tok) AS term
              |           FROM documents),
              |m AS (SELECT doc_id, term FROM t WHERE term LIKE 's%a%')
              |SELECT doc_id, count(*) AS n_terms,
              |       array_to_string(list_sort(list(term)), ',') AS matched
              |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // T22 — function_score with recency decay (ES function_score:
    // filter + field_value_factor × linear `decay`): purchase events
    // scored value × max(0, 1 − age_days/30), top 50. The reference
    // timestamp is a one-row bounds reduce broadcast into the scan
    // (a20's technique — never a window over raw rows); age derives
    // from EXACT integer epoch-micros, and the decay × value product is
    // one mirrored IEEE sequence over (exact µs diff, exact cents).
    // TakeOrdered with an event_id tie-break — never a global sort.
    Q("t22_decay_relevance",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val ref = ev.agg(max(expr("unix_micros(ts)")).as("ref_us"))
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), expr("unix_micros(ts)").as("us"),
            round(col("value") * 100).cast("long").as("vc"))
          .crossJoin(broadcast(ref))
          .withColumn("age_days",
            (col("ref_us") - col("us")).cast("double")
              / lit(86400000000.0D))
          .withColumn("decay",
            greatest(lit(0.0D), lit(1.0D) - col("age_days") / lit(30.0D)))
          .select(col("event_id"),
            round(col("age_days"), 6).as("age_days"),
            round(col("decay") * col("vc").cast("double"), 6).as("score"))
          .orderBy(col("score").desc, col("event_id"))
          .limit(50)
      },
      Some("""WITH r AS (SELECT max(epoch_us(ts)) AS ref_us FROM events),
             |e AS (SELECT event_id, epoch_us(ts) AS us,
             |             CAST(round(value * 100) AS BIGINT) AS vc
             |      FROM events WHERE event_type = 'purchase'),
             |s AS (SELECT event_id,
             |             CAST(ref_us - us AS DOUBLE)
             |               / CAST(86400000000.0 AS DOUBLE) AS age_days,
             |             greatest(CAST(0.0 AS DOUBLE),
             |               CAST(1.0 AS DOUBLE)
             |                 - CAST(ref_us - us AS DOUBLE)
             |                   / CAST(86400000000.0 AS DOUBLE)
             |                   / CAST(30.0 AS DOUBLE)) AS decay,
             |             vc
             |      FROM e CROSS JOIN r)
             |SELECT event_id, round(age_days, 6) AS age_days,
             |       round(decay * CAST(vc AS DOUBLE), 6) AS score
             |FROM s ORDER BY score DESC, event_id LIMIT 50""".stripMargin)),

    // T23 — percolate (the ES reverse search: match DOCUMENTS against
    // STORED QUERIES). The query store is built deterministically from
    // the corpus: top-20 df terms (freq desc, term tie-break) paired
    // into 10 two-term AND queries. Matching inverts the usual flow —
    // the tiny query store broadcasts into the (doc_id, term) postings
    // stream, a (query_id, doc_id) count implements the AND (HAVING
    // count = clause count), and only per-query match stats come back.
    // At 100 TB the corpus never shuffles: postings filter + broadcast
    // join + partial-aggregated counts.
    Q("t23_percolate",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("term"))
        // floor() before the cast: Spark truncates double→long where
        // DuckDB rounds (the a23 fork class), so the pairing index must be
        // an exact-integer-valued double on both engines. The 20-row
        // query store is Caches-tracked — it feeds both the broadcast
        // match and the per-query term summary, and without the cache the
        // corpus-scale vocab aggregate would run twice.
        val queries = graft.Caches.track(Tables(s, d, "documents")
          .select(explode(TextFunctions.tokens(col("text"))).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("freq"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .withColumn("query_id",
            floor((col("rn") + 1) / lit(2.0D)).cast("long")))
        val postings = Tables(s, d, "documents")
          .select(col("doc_id"),
            explode(TextFunctions.tokens(col("text"))).as("term"))
          .distinct()
        postings.join(broadcast(queries.select(col("query_id"), col("term"))),
            "term")
          .groupBy(col("query_id"), col("doc_id"))
          .agg(count(lit(1)).as("hit"))
          .filter(col("hit") === 2)
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
          .join(queries.groupBy(col("query_id"))
            .agg(min(col("term")).as("term_a"), max(col("term")).as("term_b")),
            Seq("query_id"), "right")
          .select(col("query_id"), col("term_a"), col("term_b"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs"),
            col("first_doc"))
          .orderBy(col("query_id"))
      },
      Some(s"""WITH tokd AS (SELECT doc_id, unnest($tok) AS term
              |              FROM documents),
              |v AS (SELECT term, count(*) AS freq FROM tokd GROUP BY 1),
              |r AS (SELECT term, row_number() OVER (
              |        ORDER BY freq DESC, term) AS rn FROM v),
              |q AS (SELECT CAST(floor((rn + 1) / 2.0) AS BIGINT) AS query_id,
              |             term
              |      FROM r WHERE rn <= 20),
              |p AS (SELECT DISTINCT doc_id, term FROM tokd),
              |hits AS (SELECT query_id, doc_id
              |         FROM p JOIN q USING (term)
              |         GROUP BY 1, 2 HAVING count(*) = 2),
              |agg AS (SELECT query_id, count(*) AS n_docs,
              |               min(doc_id) AS first_doc
              |        FROM hits GROUP BY 1),
              |qq AS (SELECT query_id, min(term) AS term_a,
              |              max(term) AS term_b
              |       FROM q GROUP BY 1)
              |SELECT qq.query_id, term_a, term_b,
              |       COALESCE(n_docs, 0) AS n_docs, first_doc
              |FROM qq LEFT JOIN agg USING (query_id)
              |ORDER BY query_id""".stripMargin)),

    // T24 — match_phrase_prefix (ES: phrase whose LAST term is a prefix).
    // Phrase "the s*": anchor term at position p, any 's'-prefixed token at
    // p+1. Both legs are map-side filters on the positional postings (the
    // prefix LIKE prunes before the join, mirroring ES's term-dictionary
    // expansion), the join is doc-co-partitioned, and the expansion set
    // comes back as a sorted joined string (array cells are unhashable in
    // the driver compare — t21's convention).
    Q("t24_match_phrase_prefix",
      (s, d) => {
        val pos = Tables(s, d, "documents")
          .select(col("doc_id"),
            posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))
        val a = pos.filter(col("term") === "the")
          .select(col("doc_id"), col("pos"))
        val b = pos.filter(col("term").like("s%"))
          .select(col("doc_id").as("doc_b"), col("pos").as("pos_b"),
            col("term").as("cont"))
        a.join(b, col("doc_id") === col("doc_b") &&
            col("pos_b") === col("pos") + 1)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_matches"),
            min(col("pos")).cast("long").as("first_pos"),
            array_join(sort_array(collect_set(col("cont"))), ",")
              .as("expansions"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH z AS (SELECT doc_id, $tok AS toks FROM documents),
              |     p AS (SELECT doc_id, i - 1 AS pos, toks[i] AS term
              |           FROM z, unnest(range(1, len(toks) + 1)) AS t(i))
              |SELECT a.doc_id, count(*) AS n_matches,
              |       CAST(min(a.pos) AS BIGINT) AS first_pos,
              |       array_to_string(list_sort(list(DISTINCT b.term)), ',')
              |         AS expansions
              |FROM p a JOIN p b ON a.doc_id = b.doc_id
              |                 AND b.pos = a.pos + 1
              |WHERE a.term = 'the' AND b.term LIKE 's%'
              |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin)),

    // T25 — boosting query (ES `boosting`: positive clause scored, docs
    // matching the negative clause DEMOTED by negative_boost, not
    // excluded). Positive = tf('merge'), negative = presence of 'slow',
    // negative_boost = 0.5 — an exact binary fraction, so the demoted
    // score is exactly representable and the hash compare has no FP
    // surface. One filtered postings pass computes both clauses.
    Q("t25_boosting",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .filter(col("term").isin("merge", "slow"))
        .groupBy(col("doc_id"))
        .agg(sum((col("term") === "merge").cast("long")).as("tf_pos"),
          max((col("term") === "slow").cast("long")).as("has_neg"))
        .filter(col("tf_pos") > 0)
        .select(col("doc_id"), col("tf_pos"), col("has_neg"),
          (col("tf_pos").cast("double")
            * when(col("has_neg") === 1, lit(0.5D)).otherwise(lit(1.0D)))
            .as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(50),
      Some(s"""WITH t AS (SELECT doc_id, unnest($tok) AS term FROM documents),
              |m AS (SELECT doc_id,
              |             CAST(sum(CASE WHEN term = 'merge' THEN 1 ELSE 0 END)
              |                  AS BIGINT) AS tf_pos,
              |             CAST(max(CASE WHEN term = 'slow' THEN 1 ELSE 0 END)
              |                  AS BIGINT) AS has_neg
              |      FROM t WHERE term IN ('merge', 'slow')
              |      GROUP BY doc_id)
              |SELECT doc_id, tf_pos, has_neg,
              |       CAST(tf_pos AS DOUBLE)
              |         * (CASE WHEN has_neg = 1 THEN CAST(0.5 AS DOUBLE)
              |                 ELSE CAST(1.0 AS DOUBLE) END) AS score
              |FROM m WHERE tf_pos > 0
              |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin)),

    // T26 — dis_max (ES disjunction-max: score = best clause + tie_breaker
    // × the others). Clauses = tf('join') and tf('sort'), tie_breaker 0.3;
    // score = max + 0.3·min over exact integer tfs through one mirrored
    // IEEE product — deterministic on both engines, rounded for display.
    // Same single-postings-pass shape as t25.
    Q("t26_dis_max",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .filter(col("term").isin("join", "sort"))
        .groupBy(col("doc_id"))
        .agg(sum((col("term") === "join").cast("long")).as("s1"),
          sum((col("term") === "sort").cast("long")).as("s2"))
        .select(col("doc_id"), col("s1"), col("s2"),
          round(greatest(col("s1"), col("s2")).cast("double")
            + lit(0.3D) * least(col("s1"), col("s2")).cast("double"), 6)
            .as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(50),
      Some(s"""WITH t AS (SELECT doc_id, unnest($tok) AS term FROM documents),
              |m AS (SELECT doc_id,
              |             CAST(sum(CASE WHEN term = 'join' THEN 1 ELSE 0 END)
              |                  AS BIGINT) AS s1,
              |             CAST(sum(CASE WHEN term = 'sort' THEN 1 ELSE 0 END)
              |                  AS BIGINT) AS s2
              |      FROM t WHERE term IN ('join', 'sort')
              |      GROUP BY doc_id)
              |SELECT doc_id, s1, s2,
              |       round(CAST(greatest(s1, s2) AS DOUBLE)
              |         + CAST(0.3 AS DOUBLE)
              |           * CAST(least(s1, s2) AS DOUBLE), 6) AS score
              |FROM m ORDER BY score DESC, doc_id LIMIT 50""".stripMargin)),

    // T27 — search_after keyset pagination (ES search_after vs from/size):
    // page 3 of the (n_chars DESC, doc_id ASC) listing, fetched by CURSOR
    // PREDICATE, not offset. The cursor is the last key of page 2 (the
    // 40-row TakeOrdered prefix reduced to its minimal key — at serving
    // time it arrives with the request; recomputing it here keeps the
    // query self-contained). The page-3 fetch is the point: a pushable
    // range filter + TakeOrdered(20) — O(page) work per page where
    // from/size re-sorts the full prefix, the reason ES caps from at 10k.
    Q("t27_search_after",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val p40 = docs.select(col("n_chars"), col("doc_id"))
          .orderBy(col("n_chars").desc, col("doc_id")).limit(40)
        val cur = p40.groupBy(lit(1).as("g"))
          .agg(min(col("n_chars")).as("c_n"))
          .join(p40.withColumnRenamed("n_chars", "c_n2"), col("c_n") === col("c_n2"))
          .groupBy(col("c_n")).agg(max(col("doc_id")).as("c_id"))
        docs.crossJoin(broadcast(cur))
          .filter(col("n_chars") < col("c_n") or
            (col("n_chars") === col("c_n") and col("doc_id") > col("c_id")))
          .select(col("doc_id"), col("n_chars"), col("lang"))
          .orderBy(col("n_chars").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH p40 AS (SELECT n_chars, doc_id FROM documents
             |             ORDER BY n_chars DESC, doc_id LIMIT 40),
             |cn AS (SELECT min(n_chars) AS c_n FROM p40),
             |cur AS (SELECT c_n, max(doc_id) AS c_id
             |        FROM p40 JOIN cn ON n_chars = c_n
             |        GROUP BY c_n)
             |SELECT doc_id, n_chars, lang
             |FROM documents CROSS JOIN cur
             |WHERE n_chars < c_n OR (n_chars = c_n AND doc_id > c_id)
             |ORDER BY n_chars DESC, doc_id LIMIT 20""".stripMargin)),

    // T28 — rank_feature query (ES `rank_feature`, saturation function):
    // relevance = tf × sat(n_chars), sat(x) = x/(x + pivot), pivot 500 —
    // longer documents get a bounded boost that saturates instead of
    // growing linearly. The feature rides the SAME scan row as the text
    // (groupBy keys on (doc_id, n_chars) — functionally dependent, no
    // second corpus pass or join), and the score is integer tf × one
    // mirrored integer-derived divide.
    Q("t28_rank_feature",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .filter(col("term") === "data")
        .groupBy(col("doc_id"), col("n_chars"))
        .agg(count(lit(1)).as("tf"))
        .select(col("doc_id"), col("tf"), col("n_chars"),
          round(col("tf").cast("double") * col("n_chars").cast("double")
            / (col("n_chars") + 500).cast("double"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(50),
      Some(s"""WITH t AS (SELECT doc_id, n_chars, unnest($tok) AS term
              |           FROM documents),
              |m AS (SELECT doc_id, n_chars, count(*) AS tf
              |      FROM t WHERE term = 'data' GROUP BY 1, 2)
              |SELECT doc_id, tf, n_chars,
              |       round(CAST(tf AS DOUBLE) * CAST(n_chars AS DOUBLE)
              |         / CAST(n_chars + 500 AS DOUBLE), 6) AS score
              |FROM m ORDER BY score DESC, doc_id LIMIT 50""".stripMargin)),

    // T29 — pinned query (ES `pinned`: promoted ids surface FIRST in
    // their given order — matching or not — then the organic ranking).
    // Pin list {7, 3, 11}; organic = tf('spark') desc. The pin rank is a
    // literal CASE on both engines (no list machinery to diverge), the
    // organic arm is a left join so unmatched pinned docs survive with
    // tf 0, and the whole cut is TakeOrdered on the composite
    // (pin_rank, tf desc, doc_id) key.
    Q("t29_pinned",
      (s, d) => {
        val tf = Tables(s, d, "documents")
          .select(col("doc_id"),
            explode(TextFunctions.tokens(col("text"))).as("term"))
          .filter(col("term") === "spark")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
        Tables(s, d, "documents").select(col("doc_id"))
          .join(tf, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("tf"), lit(0L)).as("tf"),
            expr("CASE doc_id WHEN 7 THEN 1 WHEN 3 THEN 2 WHEN 11 THEN 3 " +
              "ELSE 999 END").as("pin_rank"))
          .filter(col("pin_rank") < 999 or col("tf") > 0)
          .orderBy(col("pin_rank"), col("tf").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest($tok) AS term
              |           FROM documents),
              |f AS (SELECT doc_id, count(*) AS tf FROM t
              |      WHERE term = 'spark' GROUP BY 1),
              |m AS (SELECT d.doc_id, COALESCE(f.tf, 0) AS tf,
              |             CASE d.doc_id WHEN 7 THEN 1 WHEN 3 THEN 2
              |                  WHEN 11 THEN 3 ELSE 999 END AS pin_rank
              |      FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id)
              |SELECT doc_id, tf, pin_rank FROM m
              |WHERE pin_rank < 999 OR tf > 0
              |ORDER BY pin_rank, tf DESC, doc_id LIMIT 20""".stripMargin)),

    // T30 — multi_match cross_fields (ES `multi_match`): one query string
    // scored across an ANALYZED field (text, per-term tf) and a KEYWORD
    // field (source, exact match), with per-field boosts 2× / 5×. The
    // keyword arm is a map-side flag on the same scan row; only the text
    // arm explodes — the boost combination is pure integer arithmetic.
    Q("t30_multi_match",
      (s, d) => {
        val tf = Tables(s, d, "documents")
          .select(col("doc_id"),
            explode(TextFunctions.tokens(col("text"))).as("term"))
          .filter(col("term") === "merge")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("tf_text"))
        Tables(s, d, "documents")
          .select(col("doc_id"), col("source"),
            (col("source") === "src3").cast("long").as("kw"))
          .join(tf, Seq("doc_id"), "left")
          .select(col("doc_id"), col("source"),
            coalesce(col("tf_text"), lit(0L)).as("tf_text"), col("kw"),
            (coalesce(col("tf_text"), lit(0L)) * 2 + col("kw") * 5)
              .as("score"))
          .filter(col("score") > 0)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(50)
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest($tok) AS term
              |           FROM documents),
              |f AS (SELECT doc_id, count(*) AS tf_text FROM t
              |      WHERE term = 'merge' GROUP BY 1),
              |m AS (SELECT d.doc_id, d.source,
              |             COALESCE(f.tf_text, 0) AS tf_text,
              |             CASE WHEN d.source = 'src3' THEN 1 ELSE 0 END AS kw
              |      FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id)
              |SELECT doc_id, source, tf_text, CAST(kw AS BIGINT) AS kw,
              |       CAST(tf_text * 2 + kw * 5 AS BIGINT) AS score
              |FROM m WHERE tf_text * 2 + kw * 5 > 0
              |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin)),

    // T31 — percolate, per-row form (the streaming-safe dual of t23's
    // postings join): each doc independently tests |q_terms ∩ tokens| =
    // |q_terms| against the broadcast store — stateless, no shuffle on the
    // doc side, the shape [[graft.streaming.Percolator]] runs on a live
    // stream. Emits the raw (query_id, doc_id) hit pairs; same
    // deterministic store as t23, so the two forms are cross-gated by the
    // same oracle family (agreement also pinned in StreamingSpec).
    Q("t31_percolate_row",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("term"))
        val store = graft.streaming.Percolator.compileStore(
          Tables(s, d, "documents")
            .select(explode(TextFunctions.tokens(col("text"))).as("term"))
            .groupBy(col("term")).agg(count(lit(1)).as("freq"))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= 20)
            .withColumn("query_id",
              floor((col("rn") + 1) / lit(2.0D)).cast("long"))
            .select(col("query_id"), col("term")))
        graft.streaming.Percolator
          .matchDocs(Tables(s, d, "documents"), store)
          .orderBy(col("query_id"), col("doc_id"))
      },
      Some(s"""WITH tokd AS (SELECT doc_id, unnest($tok) AS term
              |              FROM documents),
              |v AS (SELECT term, count(*) AS freq FROM tokd GROUP BY 1),
              |r AS (SELECT term, row_number() OVER (
              |        ORDER BY freq DESC, term) AS rn FROM v),
              |q AS (SELECT CAST(floor((rn + 1) / 2.0) AS BIGINT) AS query_id,
              |             term
              |      FROM r WHERE rn <= 20),
              |p AS (SELECT DISTINCT doc_id, term FROM tokd)
              |SELECT query_id, doc_id
              |FROM p JOIN q USING (term)
              |GROUP BY 1, 2 HAVING count(*) = 2
              |ORDER BY query_id, doc_id""".stripMargin)),

    // T31b — percolate, RAREST-TERM-ANCHORED form (the large-fleet scale
    // path the r20 dispatch selects past the store dial): each registered
    // query is tested only against documents containing its lowest-df
    // term — candidate volume Σ_q df(anchor_q), the ES percolator's own
    // pruning bound — then verified exactly. Same deterministic store and
    // the SAME oracle as t31_percolate_row, so the PRUNED path itself sits
    // under the differential hash gate (the d2_minhash_md5 pattern).
    Q("t31_percolate_selective",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("term"))
        val store = graft.streaming.Percolator.compileStore(
          Tables(s, d, "documents")
            .select(explode(TextFunctions.tokens(col("text"))).as("term"))
            .groupBy(col("term")).agg(count(lit(1)).as("freq"))
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= 20)
            .withColumn("query_id",
              floor((col("rn") + 1) / lit(2.0D)).cast("long"))
            .select(col("query_id"), col("term")))
        graft.streaming.Percolator
          .matchDocsSelective(Tables(s, d, "documents"), store)
          .orderBy(col("query_id"), col("doc_id"))
      },
      Some(s"""WITH tokd AS (SELECT doc_id, unnest($tok) AS term
              |              FROM documents),
              |v AS (SELECT term, count(*) AS freq FROM tokd GROUP BY 1),
              |r AS (SELECT term, row_number() OVER (
              |        ORDER BY freq DESC, term) AS rn FROM v),
              |q AS (SELECT CAST(floor((rn + 1) / 2.0) AS BIGINT) AS query_id,
              |             term
              |      FROM r WHERE rn <= 20),
              |p AS (SELECT DISTINCT doc_id, term FROM tokd)
              |SELECT query_id, doc_id
              |FROM p JOIN q USING (term)
              |GROUP BY 1, 2 HAVING count(*) = 2
              |ORDER BY query_id, doc_id""".stripMargin)),

    // A42 — rare_terms (ES's long-tail dual of `terms`: buckets for terms
    // with doc_count AT OR BELOW a ceiling, which a terms agg's size-N cut
    // can never surface). Keyed on TRIGRAM shingles — the fixture's ~30
    // unigram vocabulary has no tail (every token's df is in the hundreds;
    // a unigram rare_terms is provably empty here), while the trigram
    // space carries a genuine singleton tail. max_doc_count = 1 (ES's
    // default): uniquely-occurring shingles only. One term-keyed hash agg
    // + HAVING — the shuffle carries term partials, never raw postings. ES
    // implements this on a CuckooFilter and documents false positives;
    // the relational form is exact — strictly stronger, same surface.
    Q("a42_rare_terms",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.shingles(col("text"), 3)).as("term"))
        .distinct()
        .groupBy(col("term")).agg(count(lit(1)).as("doc_count"),
          min(col("doc_id")).as("only_doc"))
        .filter(col("doc_count") === 1)
        .orderBy(col("term")),
      Some(s"""WITH z AS (SELECT doc_id, $tok AS toks FROM documents),
              |t AS (SELECT DISTINCT doc_id, term
              |      FROM (SELECT doc_id,
              |              unnest(CASE WHEN len(toks) >= 3
              |                THEN list_transform(generate_series(1, len(toks) - 2),
              |                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |                ELSE [] END) AS term
              |            FROM z))
              |SELECT term, count(*) AS doc_count, min(doc_id) AS only_doc
              |FROM t GROUP BY term HAVING count(*) = 1
              |ORDER BY term""".stripMargin)),

    // T32 — rescore window (ES `rescore`: cheap first-phase ranking over
    // the corpus, expensive second phase over ONLY the top window): phase
    // 1 ranks by tf('merge') (the cheap proxy), phase 2 re-scores the
    // top-100 window with tf + 3×(adjacent "merge sort" phrase count) —
    // the v17 two-stage shape on text. Both cuts TakeOrdered with doc_id
    // tie-breaks; the phrase pass joins positional postings ONLY for the
    // 100 window docs (broadcast semi), never the corpus. All-integer
    // scores.
    Q("t32_rescore",
      (s, d) => {
        val pos = Tables(s, d, "documents")
          .select(col("doc_id"),
            posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))
        val phase1 = pos.filter(col("term") === "merge")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
          .orderBy(col("tf").desc, col("doc_id"))
          .limit(100)
        val win = graft.Caches.track(phase1)
        val a = pos.join(broadcast(win.select(col("doc_id"))), "doc_id")
          .filter(col("term") === "merge")
          .select(col("doc_id"), col("pos"))
        val b = pos.join(broadcast(win.select(col("doc_id"))), "doc_id")
          .filter(col("term") === "sort")
          .select(col("doc_id").as("db"), col("pos").as("pb"))
        val phrase = a.join(b, col("doc_id") === col("db") &&
            col("pb") === col("pos") + 1)
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_phrase"))
        win.join(phrase, Seq("doc_id"), "left")
          .select(col("doc_id"), col("tf"),
            coalesce(col("n_phrase"), lit(0L)).as("n_phrase"),
            (col("tf") + coalesce(col("n_phrase"), lit(0L)) * 3).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""WITH z AS (SELECT doc_id, $tok AS toks FROM documents),
              |p AS (SELECT doc_id, i - 1 AS pos, toks[i] AS term
              |      FROM z, unnest(range(1, len(toks) + 1)) AS t(i)),
              |w AS (SELECT doc_id, count(*) AS tf FROM p
              |      WHERE term = 'merge' GROUP BY 1
              |      ORDER BY tf DESC, doc_id LIMIT 100),
              |ph AS (SELECT a.doc_id, count(*) AS n_phrase
              |       FROM p a JOIN p b ON a.doc_id = b.doc_id
              |                        AND b.pos = a.pos + 1
              |       JOIN w ON w.doc_id = a.doc_id
              |       WHERE a.term = 'merge' AND b.term = 'sort'
              |       GROUP BY 1)
              |SELECT w.doc_id, tf, COALESCE(n_phrase, 0) AS n_phrase,
              |       tf + COALESCE(n_phrase, 0) * 3 AS score
              |FROM w LEFT JOIN ph USING (doc_id)
              |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // T33 — terms_set with a FIELD-DRIVEN threshold (ES `terms_set` +
    // `minimum_should_match_field`: the required match count varies PER
    // DOCUMENT, where t20's bool is one static constant). Query terms
    // {spark, merge, data}; long documents (n_chars > 400) must match all
    // 3, short ones any 2. The per-doc required count is a map-side CASE
    // on the same scan row (functionally-dependent groupBy key — no
    // second pass), matches are distinct-term counts, and the filter is
    // pure integers.
    Q("t33_terms_set",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .filter(col("term").isin("spark", "merge", "data"))
        .groupBy(col("doc_id"), col("n_chars"))
        .agg(countDistinct(col("term")).as("n_matched"))
        .withColumn("required",
          when(col("n_chars") > 400, 3L).otherwise(2L))
        .filter(col("n_matched") >= col("required"))
        .select(col("doc_id"), col("n_chars"), col("required"),
          col("n_matched"))
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, n_chars, unnest($tok) AS term
              |           FROM documents),
              |m AS (SELECT doc_id, n_chars,
              |             count(DISTINCT term) AS n_matched
              |      FROM t WHERE term IN ('spark', 'merge', 'data')
              |      GROUP BY 1, 2),
              |r AS (SELECT doc_id, n_chars,
              |             CASE WHEN n_chars > 400 THEN 3 ELSE 2 END
              |               AS required,
              |             n_matched
              |      FROM m)
              |SELECT doc_id, n_chars, CAST(required AS BIGINT) AS required,
              |       n_matched
              |FROM r WHERE n_matched >= required
              |ORDER BY doc_id""".stripMargin)),

    // T34 — ES `query_string` grammar (the reference's `q=` box,
    // irclogbot.py:50-51): one string parsed and lowered to the composable
    // predicates of t2/t20/t21/t25 by graft.search.QueryString. The
    // registered query exercises field terms (keyword equality), a quoted
    // phrase (token-boundary containment), parens, AND/OR precedence, a
    // `+`/`-` must/must_not group, and a token wildcard. Lowering:
    //   lang:en AND ("merge scan" OR +has* -probe) source:web
    //   ⇒ lang = 'en'
    //     AND ( phrase OR (∃tok LIKE 'has%' AND ¬ contains-token 'probe')
    //           OR source = 'web' )      -- adjacency group = should-OR
    // The whole predicate is one map-side filter on the scan (no shuffle,
    // no join): query_string compiles to a pushable/codegen'd boolean.
    Q("t34_query_string",
      (s, d) => Tables(s, d, "documents")
        .filter(graft.search.QueryString.predicate(
          """lang:en AND ("merge scan" OR +has* -probe) source:web""",
          "text", {
            case "text" => graft.search.QueryString.TextField
            case "lang" | "source" => graft.search.QueryString.KeywordField
            case f => throw graft.search.QueryString.ParseException(
              s"unknown field '$f'")
          }))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, lang, source FROM documents
              |WHERE lang = 'en' AND (
              |  contains(' ' || array_to_string($tok, ' ') || ' ',
              |           ' merge scan ')
              |  OR (len(list_filter($tok, t -> t LIKE 'has%')) > 0
              |      AND NOT list_contains($tok, 'probe'))
              |  OR source = 'web')
              |ORDER BY doc_id""".stripMargin)),

    // T36 — field collapsing with inner_hits (ES `collapse` + `inner_hits`:
    // one result per collapse-field value — the group's best hit — plus the
    // group's top-N as an attached list). Collapse on lang, best hit + top-3
    // inner hits by (n_chars desc, doc_id). One window pass prunes every
    // group to 3 rows (the o3 WindowGroupLimit shape — at corpus scale
    // Spark's InferWindowGroupLimit caps each group map-side before the
    // sort), then one lang-keyed agg assembles the winner and the list.
    // inner_hits are emitted as a ";"-joined "doc_id,n_chars" string (the
    // g4 convention — array cells are unhashable in the driver compare),
    // with the rank kept in a sort PREFIX and stripped after the last ':'
    // so it never leaks into the payload.
    Q("t36_collapse_inner_hits",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        Tables(s, d, "documents")
          .select(col("lang"), col("doc_id"), col("n_chars"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .groupBy(col("lang"))
          .agg(
            min(when(col("rn") === 1, col("doc_id"))).as("top_doc_id"),
            min(when(col("rn") === 1, col("n_chars"))).as("top_n_chars"),
            count(lit(1)).as("n_inner"),
            array_join(
              transform(
                sort_array(collect_list(
                  format_string("%d:%d,%d", col("rn"), col("doc_id"),
                    col("n_chars")))),
                e => substring_index(e, ":", -1)), ";").as("inner_hits"))
          .orderBy(col("lang"))
      },
      Some("""WITH r AS (
             |  SELECT lang, doc_id, n_chars,
             |         row_number() OVER (PARTITION BY lang
             |                            ORDER BY n_chars DESC, doc_id) AS rn
             |  FROM documents),
             |t AS (SELECT * FROM r WHERE rn <= 3)
             |SELECT lang,
             |       min(CASE WHEN rn = 1 THEN doc_id END) AS top_doc_id,
             |       min(CASE WHEN rn = 1 THEN n_chars END) AS top_n_chars,
             |       count(*) AS n_inner,
             |       array_to_string(
             |         list_transform(
             |           list_sort(list(rn || ':' || doc_id || ',' || n_chars)),
             |           e -> string_split(e, ':')[2]),
             |         ';') AS inner_hits
             |FROM t GROUP BY lang ORDER BY lang""".stripMargin)),

    // T37 — function_score (ES): base relevance × composed score
    // functions. Base = tf('data'); functions = field_value_factor
    // (ln1p modifier, factor 0.001 on n_chars) and a filter-scoped
    // constant weight (lang:en → 2), combined with score_mode=sum and
    // boost_mode=multiply — the canonical ES recipe shapes. Everything
    // is one filtered postings agg joined back to doc metadata (no
    // second corpus pass); the ln/multiply run map-side with a single
    // round(…,6) at the end (t8's log-determinism precedent).
    Q("t37_function_score",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val tf = docs
          .select(col("doc_id"),
            explode(TextFunctions.tokens(col("text"))).as("term"))
          .filter(col("term") === "data")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
        docs.select(col("doc_id"), col("lang"), col("n_chars"))
          .join(tf, "doc_id")
          .select(col("doc_id"), col("tf"),
            round(col("tf").cast("double") *
              (log(lit(1.0D) + lit(0.001D) * col("n_chars").cast("double"))
                + when(col("lang") === "en", lit(2.0D)).otherwise(lit(1.0D))),
              6).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH p AS (SELECT doc_id, unnest($tok) AS term FROM documents),
              |     tf AS (SELECT doc_id, count(*) AS tf FROM p
              |            WHERE term = 'data' GROUP BY doc_id)
              |SELECT d.doc_id, tf.tf,
              |       round(CAST(tf.tf AS DOUBLE)
              |         * (ln(CAST(1.0 AS DOUBLE)
              |               + CAST(0.001 AS DOUBLE)
              |                 * CAST(d.n_chars AS DOUBLE))
              |            + CASE WHEN d.lang = 'en'
              |                   THEN CAST(2.0 AS DOUBLE)
              |                   ELSE CAST(1.0 AS DOUBLE) END), 6) AS score
              |FROM documents d JOIN tf ON d.doc_id = tf.doc_id
              |ORDER BY score DESC, d.doc_id LIMIT 20""".stripMargin)),

    // T38 — span_first (ES): the term must occur within the first k=10
    // token positions. The tokens array is SLICED to 10 before the
    // positional explode, so the corpus contribution is O(10) per doc
    // regardless of document length — the span window bounds the scan,
    // not just the filter (the shape that matters at 100 TB).
    Q("t38_span_first",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
          posexplode(slice(TextFunctions.tokens(col("text")), 1, 10))
            .as(Seq("pos", "term")))
        .filter(col("term") === "vector")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_in_window"),
          min(col("pos")).cast("long").as("first_pos"))
        .orderBy(col("doc_id")),
      Some(s"""WITH z AS (SELECT doc_id, ($tok)[1:10] AS toks
              |           FROM documents),
              |     p AS (SELECT doc_id, i - 1 AS pos, toks[i] AS term
              |           FROM z, unnest(range(1, len(toks) + 1)) AS t(i))
              |SELECT doc_id, count(*) AS n_in_window,
              |       CAST(min(pos) AS BIGINT) AS first_pos
              |FROM p WHERE term = 'vector'
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // T39 — phrase suggester (ES suggest/phrase): for a 2-term query
    // whose second term is misspelled, generate candidates from the
    // corpus vocabulary within edit distance 1 and rank by the bigram
    // language model (count of "prev candidate" collocations, unigram
    // frequency as tie-break) — the ES candidate-generator + LM-rerank
    // pipeline. Query set = the top-20 bigrams with the tail term's last
    // character dropped (deterministic misspellings). Scale shape: the
    // vocabulary and query set are both bounded dictionary-side tables —
    // the edit-distance candidate join is broadcast × broadcast; the
    // corpus contributes only the two hash-agg count tables.
    Q("t39_phrase_suggest",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val uni = docs
          .select(explode(TextFunctions.tokens(col("text"))).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        val pairs = docs
          .select(explode(TextFunctions.bigrams(col("text"))).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("pcnt"))
          .select(substring_index(col("bigram"), " ", 1).as("term_a"),
            substring_index(col("bigram"), " ", -1).as("term_b"),
            col("pcnt"))
        val queries = pairs
          .filter(length(col("term_b")) >= 4)
          .orderBy(col("pcnt").desc, col("term_a"), col("term_b"))
          .limit(20)
          .select(col("term_a"),
            expr("substring(term_b, 1, length(term_b) - 1)").as("misspelled"))
        val cand = queries
          .join(broadcast(uni.select(col("term").as("cand"), col("cnt"))),
            levenshtein(col("misspelled"), col("cand")) <= 1)
          .join(broadcast(pairs.select(col("term_a").as("pa"),
            col("term_b").as("pb"), col("pcnt"))),
            col("term_a") === col("pa") && col("cand") === col("pb"),
            "left")
          .select(col("term_a"), col("misspelled"), col("cand"), col("cnt"),
            coalesce(col("pcnt"), lit(0L)).as("bg"))
        val w = Window.partitionBy(col("term_a"), col("misspelled"))
          .orderBy(col("bg").desc, col("cnt").desc, col("cand"))
        cand.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("term_a"), col("misspelled"),
            col("cand").as("suggestion"), col("bg").as("bigram_count"))
          .orderBy(col("term_a"), col("misspelled"))
      },
      Some(s"""WITH t AS (SELECT $tok AS toks FROM documents),
              |u AS (SELECT unnest(toks) AS term FROM t),
              |uni AS (SELECT term, count(*) AS cnt FROM u GROUP BY 1),
              |bg AS (SELECT unnest(CASE WHEN len(toks) >= 2
              |                     THEN [toks[i] || ' ' || toks[i+1]
              |                           for i in range(1, len(toks))]
              |                     ELSE [] END) AS b
              |       FROM t),
              |pairs AS (SELECT string_split(b, ' ')[1] AS term_a,
              |                 string_split(b, ' ')[2] AS term_b,
              |                 count(*) AS pcnt
              |          FROM bg GROUP BY b),
              |q AS (SELECT term_a,
              |             substring(term_b, 1, len(term_b) - 1) AS misspelled
              |      FROM pairs WHERE len(term_b) >= 4
              |      ORDER BY pcnt DESC, term_a, term_b LIMIT 20),
              |c AS (SELECT q.term_a, q.misspelled, uni.term AS cand, uni.cnt,
              |             COALESCE(p.pcnt, 0) AS bg
              |      FROM q JOIN uni ON levenshtein(q.misspelled, uni.term) <= 1
              |      LEFT JOIN pairs p ON p.term_a = q.term_a
              |                       AND p.term_b = uni.term),
              |r AS (SELECT *, row_number() OVER (
              |        PARTITION BY term_a, misspelled
              |        ORDER BY bg DESC, cnt DESC, cand) AS rn
              |      FROM c)
              |SELECT term_a, misspelled, cand AS suggestion,
              |       CAST(bg AS BIGINT) AS bigram_count
              |FROM r WHERE rn = 1 ORDER BY term_a, misspelled""".stripMargin))
  ) ++ Seq(

    // T40 — significant_text agg (ES 6.3's free-text sibling of t16's
    // significant_terms). Three behaviors distinguish it from t16:
    // (1) `filter_duplicate_text` — exact-duplicate documents are
    // collapsed FIRST (one representative per md5(text), min doc_id) so
    // boilerplate can't vote twice; (2) the foreground set is a SEARCH
    // MATCH (docs whose token set contains 'join'), not a metadata
    // field; (3) the score is ES's chi_square heuristic rather than JLH.
    // Plan shape: dedup is a per-hash window keep-first (hash-partitioned,
    // no join); token rows are deduped per doc MAP-SIDE via
    // array_distinct (t16 pays a (doc, term) distinct shuffle for the
    // same guarantee) and carry the foreground flag from the scan, so
    // the only corpus shuffle is the term-keyed partial agg. The totals
    // ride a 1-row broadcast. FP only in the final per-term score off
    // exact integer counts — identical literal order on both engines.
    Q("t40_significant_text",
      (s, d) => {
        val keep = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
        val uniq = Tables(s, d, "documents")
          .withColumn("rn", row_number().over(keep))
          .filter(col("rn") === 1)
        val toks = uniq.select(
          array_contains(TextFunctions.tokens(col("text")), "join").as("fg"),
          explode(array_distinct(TextFunctions.tokens(col("text"))))
            .as("term"))
        val nn = uniq.agg(count(lit(1)).cast("long").as("n_bg"),
          sum(when(array_contains(TextFunctions.tokens(col("text")), "join"),
            1L).otherwise(0L)).as("n_fg"))
        toks.groupBy(col("term"))
          .agg(count(lit(1)).as("df_bg"),
            sum(when(col("fg"), 1L).otherwise(0L)).as("df_fg"))
          .filter(col("df_fg") >= 5)
          .crossJoin(broadcast(nn))
          .withColumn("fr", col("df_fg").cast("double") / col("n_fg").cast("double"))
          .withColumn("br", col("df_bg").cast("double") / col("n_bg").cast("double"))
          .withColumn("chi2_raw",
            (col("fr") - col("br")) * (col("fr") - col("br"))
              / (col("fr") + col("br")))
          .orderBy(col("chi2_raw").desc, col("term")).limit(25)
          .select(col("term"), col("df_fg"), col("df_bg"),
            round(col("chi2_raw"), 6).as("chi2"))
      },
      Some(s"""WITH uniq AS (
              |  SELECT doc_id, text,
              |         row_number() OVER (PARTITION BY md5(text)
              |             ORDER BY doc_id) AS rn
              |  FROM documents QUALIFY rn = 1),
              |toks AS (SELECT list_contains($tok, 'join') AS fg,
              |                unnest(list_distinct($tok)) AS term
              |         FROM uniq),
              |nn AS (SELECT count(*) AS n_bg,
              |              CAST(sum(CASE WHEN list_contains($tok, 'join')
              |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_fg
              |       FROM uniq),
              |st AS (SELECT term, count(*) AS df_bg,
              |              CAST(sum(CASE WHEN fg THEN 1 ELSE 0 END)
              |                   AS BIGINT) AS df_fg
              |       FROM toks GROUP BY 1),
              |sc AS (SELECT term, df_fg, df_bg,
              |              (df_fg * 1.0 / n_fg - df_bg * 1.0 / n_bg)
              |              * (df_fg * 1.0 / n_fg - df_bg * 1.0 / n_bg)
              |              / (df_fg * 1.0 / n_fg + df_bg * 1.0 / n_bg)
              |                AS chi2_raw
              |       FROM st CROSS JOIN nn WHERE df_fg >= 5)
              |SELECT term, df_fg, df_bg, round(chi2_raw, 6) AS chi2
              |FROM sc ORDER BY chi2_raw DESC, term LIMIT 25""".stripMargin)),

    // T41 — sampler agg wrapping significant_terms (the ES cost-bounding
    // combo: `sampler{shard_size:N}` feeds its sub-agg only the TOP-N
    // scored docs, so significance runs on a bounded sample however large
    // the result set). Score = per-doc tf of 'join' (tie: doc_id) — the
    // sample is the 200 best matches, a TakeOrdered; foreground counts
    // then come from ONLY those 200 docs (the sample id set broadcasts —
    // at 100 TB the sub-agg's foreground cost is O(sample), by
    // construction, while the background df is the same corpus term agg
    // t3 already pays). JLH score like t16, exact integer counts, FP only
    // in the final per-term arithmetic with identical literal order.
    Q("t41_sampler_sigterms",
      (s, d) => {
        val docs = Tables(s, d, "documents")
        val scored = docs.select(col("doc_id"),
            size(filter(TextFunctions.tokens(col("text")),
              t => t === "join")).cast("long").as("score"))
          .filter(col("score") > 0)
          .orderBy(col("score").desc, col("doc_id")).limit(200)
        val td = docs
          .select(col("doc_id"),
            explode(array_distinct(TextFunctions.tokens(col("text"))))
              .as("term"))
        val stats = td
          .join(broadcast(scored.select(col("doc_id"),
            lit(1L).as("in_sample"))), Seq("doc_id"), "left")
          .groupBy(col("term"))
          .agg(count(lit(1)).as("df_bg"),
            sum(coalesce(col("in_sample"), lit(0L))).as("df_smp"))
          .filter(col("df_smp") >= 5)
        val nn = docs.agg(count(lit(1)).cast("long").as("n_bg"))
          .crossJoin(broadcast(scored.agg(
            count(lit(1)).cast("long").as("n_smp"))))
        stats.crossJoin(broadcast(nn))
          .withColumn("fr", col("df_smp").cast("double") / col("n_smp").cast("double"))
          .withColumn("br", col("df_bg").cast("double") / col("n_bg").cast("double"))
          .withColumn("jlh_raw", (col("fr") - col("br")) * (col("fr") / col("br")))
          .orderBy(col("jlh_raw").desc, col("term")).limit(15)
          .select(col("term"), col("df_smp"), col("df_bg"),
            round(col("jlh_raw"), 6).as("jlh"))
      },
      Some(s"""WITH sc AS (
              |  SELECT doc_id,
              |         CAST(len(list_filter($tok, t -> t = 'join'))
              |              AS BIGINT) AS score
              |  FROM documents),
              |smp AS (SELECT doc_id FROM sc WHERE score > 0
              |        ORDER BY score DESC, doc_id LIMIT 200),
              |td AS (SELECT doc_id, unnest(list_distinct($tok)) AS term
              |       FROM documents),
              |st AS (SELECT term, count(*) AS df_bg,
              |              CAST(sum(CASE WHEN smp.doc_id IS NOT NULL
              |                       THEN 1 ELSE 0 END) AS BIGINT) AS df_smp
              |       FROM td LEFT JOIN smp ON td.doc_id = smp.doc_id
              |       GROUP BY 1),
              |nn AS (SELECT (SELECT count(*) FROM documents) AS n_bg,
              |              (SELECT count(*) FROM smp) AS n_smp),
              |j AS (SELECT term, df_smp, df_bg,
              |             (df_smp * 1.0 / n_smp - df_bg * 1.0 / n_bg)
              |             * ((df_smp * 1.0 / n_smp) / (df_bg * 1.0 / n_bg))
              |               AS jlh_raw
              |      FROM st CROSS JOIN nn WHERE df_smp >= 5)
              |SELECT term, df_smp, df_bg, round(jlh_raw, 6) AS jlh
              |FROM j ORDER BY jlh_raw DESC, term LIMIT 15""".stripMargin))
  )
}
