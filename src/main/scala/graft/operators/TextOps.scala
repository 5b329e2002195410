package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-training-data curation (SURVEY.md
  * §2 C8-C11) over the `documents` table. Everything is built-in
  * column functions / higher-order array functions → whole-stage
  * codegen, zero shuffles except where a group/window is the
  * semantics. At 100 TB these all pipeline at scan speed.
  */
object TextOps {

  /** Distinct-word markers per language for the lang-ID heuristic. */
  val EnMarkers: Seq[String] = Seq("the", "a", "of", "and", "in", "is")
  val EsMarkers: Seq[String] = Seq("el", "la", "de", "los", "que", "y")
  val DeMarkers: Seq[String] = Seq("der", "die", "das", "und", "ist", "mit")

  private def sqlList(xs: Seq[String]): String = xs.map(s => s"'$s'").mkString("array(", ", ", ")")

  /** C8b: repetition flags (the Gopher/C4-style boilerplate rules):
    * fraction of the doc covered by its most frequent word bigram and
    * fraction of duplicated words. High values mark the template/spam
    * documents a curation pass drops.
    *
    * The bigram build reuses the lead-window pattern from
    * Dedup.shingledPostings (never explode a `transform` array); the
    * per-(doc, bigram) count and the per-doc rollup are two
    * partial-agg'd groupBys where the second reuses the first's doc_id
    * clustering — the whole operator is one wide shuffle at scale.
    */
  def repetition(t: Tables): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val bigramAgg = t.documents
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_words"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w"))
      )
      .withColumn("bg", concat_ws(" ", col("w"), lead("w", 1).over(byDoc)))
      .filter(col("pos") <= col("n_words") - 2)
      .groupBy("doc_id", "bg")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), max("c").as("top_bigram_count"))
    t.documents
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct")
      )
      .join(bigramAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_words"),
        col("n_distinct"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"),
        when(
          coalesce(col("n_bigrams"), lit(0L)) > 0,
          col("top_bigram_count").cast("double") / col("n_bigrams")
        ).otherwise(lit(0.0)).as("top_bigram_frac"),
        ((col("n_words") - col("n_distinct")).cast("double") / col("n_words")).as("dup_word_frac")
      )
      .orderBy("doc_id")
  }

  /** C8c: keyterm extraction — each doc's top-k terms by term
    * frequency with document frequency as the rarity tiebreak (the
    * integer-exact tf-idf analog: idf's log is monotone in 1/df, so
    * ranking by (tf DESC, df ASC) orders identically to tf·idf for
    * equal tf — and stays bit-deterministic cross-engine, where a
    * float log would drift ULPs between JVM and DuckDB).
    *
    * Plan: one shuffle to (doc, term) counts, one window over term for
    * df, then the per-doc top-k through the custom bounded-heap
    * TopKPerKey operator (plans/TopKPerKey.scala) — no per-doc sort
    * buffer at 100 TB.
    */
  def keyTerms(t: Tables, k: Int = 3): DataFrame = {
    val tf = t.documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
    graft.plans.TopK
      .perKey(withDf, Seq("doc_id"), Seq(col("tf").desc, col("df"), col("term")), k)
      .select("doc_id", "term", "tf", "df", "rnk")
      .orderBy("doc_id", "rnk")
  }

  /** C10: token counting — whitespace tokens plus a BPE-ish regex
    * tokenization (letter runs / digit runs / single non-alnum).
    */
  def tokenCounts(t: Tables): DataFrame =
    t.documents
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .cast("long")
          .as("n_re_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct_words")
      )
      .orderBy("doc_id")

  /** C9: quality scoring — length, punctuation ratio, stopword ratio,
    * average word length. Ratios are double divisions of identical
    * integer counts, so they are bit-deterministic cross-engine.
    */
  def qualityScores(t: Tables): DataFrame =
    t.documents
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        expr("array_distinct(split(text, ' '))").as("wsd"),
        (length(col("text")) - length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", "")))
          .cast("long")
          .as("n_punct")
      )
      .select(
        col("doc_id"),
        col("n_chars"),
        col("n_tokens"),
        size(col("wsd")).cast("long").as("n_distinct"),
        size(expr(s"array_intersect(wsd, ${sqlList(EnMarkers)})")).cast("long").as("n_stopwords"),
        col("n_punct"),
        (size(expr(s"array_intersect(wsd, ${sqlList(EnMarkers)})")).cast("double") / size(col("wsd")))
          .as("stopword_ratio"),
        (col("n_punct").cast("double") / col("n_chars")).as("punct_ratio"),
        ((col("n_chars") - (col("n_tokens") - lit(1L))).cast("double") / col("n_tokens"))
          .as("avg_word_len")
      )
      .orderBy("doc_id")

  /** C8: language-ID heuristic — distinct-marker-word overlap per
    * language, deterministic argmax (en ≥ es ≥ de precedence), 'und'
    * when nothing matches. A real deployment swaps the marker lists
    * for n-gram profiles; the plumbing (array intersect + case) is
    * identical.
    */
  def langId(t: Tables): DataFrame = langIdOn(t.documents)

  /** langId over any (doc_id, text) frame — split out so specs can
    * run it on constructed multilingual sentences (the test corpus's
    * lang labels are random metadata, uncorrelated with its synthetic
    * text).
    */
  def langIdOn(documents: DataFrame): DataFrame = {
    // distinct lowercase words are materialized ONCE — interpreted
    // array expressions don't participate in codegen subexpression
    // elimination, so repeating the split per language would triple it
    def hits(markers: Seq[String]) =
      size(expr(s"array_intersect(wsd, ${sqlList(markers)})")).cast("long")
    documents
      .select(col("doc_id"), expr("array_distinct(split(lower(text), ' '))").as("wsd"))
      .select(
        col("doc_id"),
        hits(EnMarkers).as("en_hits"),
        hits(EsMarkers).as("es_hits"),
        hits(DeMarkers).as("de_hits")
      )
      .withColumn(
        "lang_pred",
        when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits") && col("en_hits") > 0, "en")
          .when(col("es_hits") >= col("de_hits") && col("es_hits") > 0, "es")
          .when(col("de_hits") > 0, "de")
          .otherwise("und")
      )
      .orderBy("doc_id")
  }

  /** Canonical bag-of-words fingerprint: md5 over the sorted distinct
    * lowercase words. Detects permutation/duplication rewrites that
    * exact hashing misses.
    */
  def fingerprintCol = md5(concat_ws(" ", sort_array(array_distinct(split(lower(col("text")), " ")))))

  /** Corpus profile by (source, lang): the inventory pass every
    * curation run starts with. Pure partial-agg'd groupBy.
    */
  def corpusProfile(t: Tables): DataFrame =
    t.documents
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars")
      )
      .orderBy("source", "lang")

  /** C11b: winnowing fingerprints — rolling-hash k-gram minima per
    * window (functions/WinnowExpr). Local fingerprints survive
    * prepend/append edits that break whole-document hashing; overlap
    * of fingerprint sets estimates local similarity.
    */
  def winnowFingerprints(t: Tables): DataFrame = winnowOn(t.documents)

  def winnowOn(documents: DataFrame): DataFrame = {
    graft.functions.WinnowExpr.register(documents.sparkSession)
    documents
      .select(col("doc_id"), expr("winnow_fp(text)").as("fp"))
      .select(
        col("doc_id"),
        size(col("fp")).cast("long").as("n_fp"),
        md5(concat_ws(",", col("fp"))).as("fp_digest")
      )
      .orderBy("doc_id")
  }

  /** PII patterns shared with the oracle. Kept inside the Java-regex ∩
    * RE2 common subset — character classes, bounded/greedy quantifiers,
    * a single optional separator, NO alternation or lookaround — so a
    * backtracking engine (Spark) and a leftmost-longest engine (the
    * DuckDB oracle) produce identical matches. `[.]` instead of `\\.`
    * dodges double-escaping drift between the two string literals.
    */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val Ipv4Pat  = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  val PhonePat = "[+]?[0-9]{3}[- .]?[0-9]{3}[- .]?[0-9]{4}"

  /** C9b: PII scrubbing — the redaction pass every released training
    * corpus runs (emails, IPv4 addresses, phone-shaped numbers →
    * typed placeholders). Redaction applies email → IP → phone so IP
    * octets can never be re-matched as phone fragments, and each count
    * is measured on the text the corresponding stage actually sees
    * (emails on the original, IPs after email redaction, phones after
    * IP redaction) — so n_* equals the number of placeholders of that
    * type in the redacted output, with no over-reporting of overlapping
    * matches. Pure codegen'd regexp projections: no shuffle, scan
    * speed at 100 TB — and the per-doc counts feed the same curation
    * joins as the quality scores.
    */
  def piiRedact(t: Tables): DataFrame = piiRedactOn(t.documents)

  def piiRedactOn(documents: DataFrame): DataFrame =
    documents
      .select(
        col("doc_id"),
        col("text"),
        regexp_replace(col("text"), EmailPat, "<EMAIL>").as("t1")
      )
      .select(
        col("doc_id"),
        col("text"),
        col("t1"),
        regexp_replace(col("t1"), Ipv4Pat, "<IP>").as("t2")
      )
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailPat), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("t1"), lit(Ipv4Pat), lit(0))).cast("long").as("n_ips"),
        size(regexp_extract_all(col("t2"), lit(PhonePat), lit(0))).cast("long").as("n_phones"),
        md5(regexp_replace(col("t2"), PhonePat, "<PHONE>")).as("redacted_hash")
      )
      .orderBy("doc_id")

  /** Size of the corpus-derived common-word vocabulary. */
  val CommonVocab = 100

  /** C9c: corpus-relative quality — the fraction of each document's
    * tokens drawn from the corpus's own top-[[CommonVocab]] words.
    * This is the stopword-ratio signal WITHOUT a hardcoded stopword
    * list: the vocabulary is derived from the corpus itself, so it
    * works for any language mix (the same two-pass shape a unigram
    * LM / perplexity filter uses, kept integer-exact for the gate).
    *
    * Pass 1 builds the global word frequency table (one partial-agg'd
    * shuffle on the word; hot words are exactly what map-side combine
    * flattens) and takes the top K by (count desc, word asc) — a
    * TakeOrderedAndProject, never a full sort. Pass 2 re-scans the
    * corpus, probes the BROADCAST vocabulary (K rows — always fits),
    * and aggregates per doc on the doc_id key. Ranking is integer
    * (count, then word) and the only division is one int/int at the
    * end — no float drift for the oracle to disagree with.
    */
  def commonWordFrac(t: Tables): DataFrame = {
    val words = t.documents.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val top = words
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(CommonVocab)
      .select("w")
    val perDoc = words
      .join(broadcast(top), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_common"))
    t.documents
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") / col("n_tokens")).as("common_frac")
      )
      .orderBy("doc_id")
  }

  /** C11: document fingerprinting + dup-group resolution: every doc
    * with its fingerprint, its group's keeper (min doc_id) and group
    * size. One shuffle on the fingerprint.
    */
  def fingerprints(t: Tables): DataFrame = {
    val w = Window.partitionBy("fingerprint")
    t.documents
      .select(col("doc_id"), fingerprintCol.as("fingerprint"))
      .withColumn("keep_doc_id", min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", (col("doc_id") =!= col("keep_doc_id")).cast("boolean"))
      .orderBy("doc_id")
  }
}
