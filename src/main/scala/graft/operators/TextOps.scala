package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Whitespace token count — the per-row definition shared by
    * [[qualityScores]] and the curation gate, so compositions can
    * compute it inline in an existing corpus scan instead of joining
    * the standalone operator's output back on doc_id.
    */
  def nTokensCol: org.apache.spark.sql.Column = size(split(col("text"), " ")).cast("long")

  /** Distinct lowercase words — the lang-ID feature vector, bound to a
    * `text` column. Materialize it under one name before computing
    * marker hits: interpreted array expressions don't participate in
    * codegen subexpression elimination.
    */
  def wsdLowerCol: org.apache.spark.sql.Column = expr("array_distinct(split(lower(text), ' '))")

  /** Marker-hit count over a materialized `wsd` column. */
  private[operators] def hitsCol(markers: Seq[String]): org.apache.spark.sql.Column =
    size(expr(s"array_intersect(wsd, ${sqlList(markers)})")).cast("long")

  /** Deterministic language argmax over materialized `en_hits` /
    * `es_hits` / `de_hits` columns (en ≥ es ≥ de precedence, 'und'
    * when nothing matches) — shared by [[langIdOn]] and the fused
    * curation scan.
    */
  private[operators] def langPredFromHits: org.apache.spark.sql.Column =
    when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits") && col("en_hits") > 0, "en")
      .when(col("es_hits") >= col("de_hits") && col("es_hits") > 0, "es")
      .when(col("de_hits") > 0, "de")
      .otherwise("und")

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
    t.documents
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct")
      )
      .join(bigramAgg(t), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_words"),
        col("n_distinct"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"),
        topBigramFracCol.as("top_bigram_frac"),
        ((col("n_words") - col("n_distinct")).cast("double") / col("n_words")).as("dup_word_frac")
      )
      .orderBy("doc_id")
  }

  /** Per-doc bigram totals (n_bigrams, top_bigram_count) — the group
    * half of [[repetition]], split out so [[graft.operators.Curation]]
    * can join it directly (its per-row half is fused into the curation
    * scan; joining the full repetition output would re-scan the corpus
    * a second time just to throw the per-row columns away).
    */
  private[operators] def bigramAgg(t: Tables): DataFrame = {
    // compiled per-doc kernel (r21): total bigram occurrences and max
    // multiplicity in ONE map-only pass — replaces the posexplode +
    // lead-window + two-groupBy rollup, whose window shuffled every
    // word row of the corpus. Values are identical; docs under two
    // words now emit (0, 0) instead of no row, which every consumer
    // (left join + coalesce / topBigramFracCol) already maps to the
    // same result.
    graft.functions.ShingleExprs.register(t.spark)
    t.documents
      .select(col("doc_id"), expr("bigram_stats(split(text, ' '))").as("bs"))
      .select(
        col("doc_id"),
        col("bs.n_bigrams").as("n_bigrams"),
        col("bs.top_bigram_count").as("top_bigram_count")
      )
  }

  /** top-bigram coverage from (possibly null, post-left-join)
    * `n_bigrams` / `top_bigram_count` columns — 0.0 for docs too short
    * to have a bigram. Shared by [[repetition]] and the curation gate.
    */
  private[operators] def topBigramFracCol: org.apache.spark.sql.Column =
    when(
      coalesce(col("n_bigrams"), lit(0L)) > 0,
      col("top_bigram_count").cast("double") / col("n_bigrams")
    ).otherwise(lit(0.0))

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
        nTokensCol.as("n_tokens"),
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
  def langIdOn(documents: DataFrame): DataFrame =
    // distinct lowercase words are materialized ONCE — interpreted
    // array expressions don't participate in codegen subexpression
    // elimination, so repeating the split per language would triple it
    documents
      .select(col("doc_id"), wsdLowerCol.as("wsd"))
      .select(
        col("doc_id"),
        hitsCol(EnMarkers).as("en_hits"),
        hitsCol(EsMarkers).as("es_hits"),
        hitsCol(DeMarkers).as("de_hits")
      )
      .withColumn("lang_pred", langPredFromHits)
      .orderBy("doc_id")

  /** Language-label audit: the (source, claimed lang, predicted lang)
    * disagreement matrix — every web-scale corpus carries mislabeled
    * language metadata, and this is the audit that finds WHICH sources
    * lie (a source whose labels disagree with content predictions gets
    * its metadata distrusted pipeline-wide). One corpus scan (the
    * langid features fold into the same projection as the metadata
    * columns — no self-join against the standalone langid output), one
    * tiny partial-agg'd shuffle; output ≤ sources × langs².
    */
  def langMismatch(t: Tables): DataFrame =
    t.documents
      .select(col("source"), col("lang"), wsdLowerCol.as("wsd"))
      .select(
        col("source"),
        col("lang"),
        hitsCol(EnMarkers).as("en_hits"),
        hitsCol(EsMarkers).as("es_hits"),
        hitsCol(DeMarkers).as("de_hits")
      )
      .withColumn("lang_pred", langPredFromHits)
      .filter(col("lang") =!= col("lang_pred"))
      .groupBy("source", "lang", "lang_pred")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "lang", "lang_pred")

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
      .select(col("doc_id"), nTokensCol.as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") / col("n_tokens")).as("common_frac")
      )
      .orderBy("doc_id")
  }

  /** How many top merge candidates [[bpeMergeCandidates]] emits. */
  val BpeTopK = 50

  /** First BPE merge iteration: the top-K most frequent adjacent
    * character pairs, weighted by word frequency — the statistic a
    * tokenizer trainer computes (repeatedly) to pick its next merge.
    *
    * The classic BPE trick keeps this cheap at any corpus size: pair
    * counts are computed over the DISTINCT-WORD table weighted by word
    * counts, never over the raw token stream. Pass 1 is one
    * partial-agg'd shuffle to (word, count) — corpus-sized input,
    * vocab-sized output; pass 2 explodes character positions of the
    * VOCAB only (a codegen `sequence` generator, input already tiny)
    * and takes the top K via TakeOrdered. Integer counts, (count desc,
    * pair asc) ordering — bit-deterministic under the gate.
    */
  def bpeMergeCandidates(t: Tables, k: Int = BpeTopK): DataFrame = {
    val vocab = t.documents
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      .filter(length(col("w")) >= 2)
    vocab
      .select(col("w"), col("cnt"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substr(w, i, 2)").as("pair"), col("cnt"))
      .groupBy("pair")
      .agg(sum("cnt").as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair").asc)
      .limit(k)
  }

  /** C59: APPLY the learned BPE merge table — the other half of
    * tokenizer induction (C23 learns the merges; a tokenizer is only
    * real once the corpus is re-tokenized with them). For each merge
    * budget K ∈ {0, 10, 25, 50}: the corpus token count after applying
    * the first K merges in rank order, beside the raw char count — the
    * compression curve that says how many merges the tokenizer needs
    * (K=0 is char-level, so corpus_tokens == corpus_chars there;
    * token counts are provably non-increasing in K, spec-asserted).
    *
    * Application is UDF-free: each word encodes as separator-WRAPPED
    * tokens (`␟c₁␟␟c₂␟…` — every token delimited on BOTH sides, so a
    * literal `replace` of `␟a␟␟b␟` → `␟ab␟` matches exactly at token
    * boundaries: partial-token prefixes can't false-match and adjacent
    * pair occurrences don't overlap, reproducing BPE's leftmost
    * non-overlapping merge order), and the K-budget chains share
    * prefixes in ONE projection (s₁₀ extends s₀, s₂₅ extends s₁₀ …) —
    * all codegen'd string functions over the DISTINCT-WORD table
    * (C23's trick: corpus-sized shuffle to vocab once, then vocab-sized
    * map work), one tiny aggregate, stack to the 4-row curve. The
    * merge table is a bounded driver-side collect (50 rows — the IVF
    * centroid precedent); ranks are integer-exact (count desc, pair
    * asc), so the oracle's recursive-CTE application walks the
    * identical table.
    */
  /** Unit separator for the wrapped-token BPE encoding — never occurs
    * in corpus text.
    */
  private val BpeSep = "\u001f"

  /** Rank-ordered merge table (bounded 50-row driver collect — the IVF
    * centroid precedent). Shared by [[bpeApply]] and [[vocabCoverage]]
    * so both walk the identical table the C23 oracle ranks.
    */
  private def mergeTable(t: Tables, k: Int): Seq[String] = {
    val merges = bpeMergeCandidates(t, k).collect().map(_.getString(0)).toSeq
    require(merges.forall(p => p.length == 2 && !p.contains(BpeSep)), "malformed merge table")
    merges
  }

  /** One merge application on a wrapped-token string: both-side
    * delimiting makes the literal replace match exactly at token
    * boundaries (no partial-token false matches; adjacent pair
    * occurrences are non-overlapping = BPE's leftmost order).
    */
  private def bpeStep(s: Column, pair: String): Column = {
    val (a, b) = (pair.substring(0, 1), pair.substring(1, 2))
    call_function("replace", s,
      lit(s"$BpeSep$a$BpeSep$BpeSep$b$BpeSep"), lit(s"$BpeSep$pair$BpeSep"))
  }

  /** A word column encoded as separator-wrapped single-char tokens. */
  private def bpeEncoded: Column =
    concat(lit(BpeSep), array_join(split(col("w"), ""), BpeSep + BpeSep), lit(BpeSep))

  /** Non-empty corpus words with frequencies — the distinct-word table
    * all BPE work runs on (corpus-sized shuffle to vocab once).
    */
  private def wordCounts(t: Tables): DataFrame =
    t.documents
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))

  def bpeApply(t: Tables, k: Int = BpeTopK): DataFrame = {
    val sep     = BpeSep
    val merges  = mergeTable(t, k)
    val budgets = Seq(0, 10, 25, 50).filter(_ <= merges.length)
    // incremental chains: each budget's column extends the previous one,
    // so the 4 token counts share their replace prefixes in ONE projection
    val chains: Seq[(Int, Column)] = budgets.tail.scanLeft(budgets.head -> bpeEncoded) {
      case ((prevK, prevS), curK) => curK -> merges.slice(prevK, curK).foldLeft(prevS)(bpeStep)
    }
    def ntok(s: Column): Column =
      ((length(s) - length(call_function("replace", s, lit(sep), lit("")))) / 2).cast("long")
    val one = wordCounts(t)
      .select(
        col("cnt") +: length(col("w")).cast("long").as("nchar") +:
          chains.map { case (kk, s) => ntok(s).as(s"tok$kk") }: _*
      )
      .agg(
        sum(col("cnt") * col("nchar")).as("corpus_chars"),
        chains.map { case (kk, _) => sum(col("cnt") * col(s"tok$kk")).as(s"t$kk") }: _*
      )
    val stackArgs = chains.map { case (kk, _) => s"${kk}L, t$kk" }.mkString(", ")
    one
      .select(
        expr(s"stack(${chains.length}, $stackArgs) AS (n_merges, corpus_tokens)"),
        col("corpus_chars")
      )
      .orderBy("n_merges")
  }

  /** C60: token-frequency / OOV coverage curve over the post-merge
    * token inventory — the vocab-size knob beside [[bpeApply]]'s merge
    * budget: after the full merge table applies, how much of the
    * corpus do the top-V most frequent tokens cover, for V ∈
    * {4, 16, 64, 256}? The inventory is structurally bounded at
    * |alphabet| + |merge table| distinct tokens (every merge adds one
    * token), so the ranking, running coverage, and the final curve all
    * run on a ≤~120-row frame no matter the corpus size — the corpus
    * touches only the one word-count shuffle shared with bpeApply.
    * OOV is reported in exact integer ppm (the C48 Decimal(38,0)
    * floor-division discipline — covered·10⁶ overflows a Long past
    * ~9·10¹² tokens).
    */
  def vocabCoverage(t: Tables, k: Int = BpeTopK, vs: Seq[Int] = Seq(4, 16, 64, 256)): DataFrame = {
    val dec    = "decimal(38,0)"
    val merges = mergeTable(t, k)
    val full   = merges.foldLeft(bpeEncoded)(bpeStep)
    // explode the final token strings; inventory ≤ alphabet + merges
    val inv = wordCounts(t)
      .select(col("cnt"), full.as("s"))
      .select(col("cnt"),
        explode(split(expr("substring(s, 2, length(s) - 2)"), BpeSep + BpeSep)).as("token"))
      .groupBy("token")
      .agg(sum("cnt").as("c"))
      .localCheckpoint() // total + ranked coverage both read it
    val wRank = Window.orderBy(col("c").desc, col("token").asc)
    val total = inv.agg(sum("c").as("total"))
    inv
      .withColumn("rnk", row_number().over(wRank))
      .withColumn("v", explode(typedLit(vs.map(_.toLong))))
      .filter(col("rnk") <= col("v"))
      .groupBy("v")
      .agg(sum("c").as("tokens_covered"))
      .crossJoin(broadcast(total))
      .withColumn("num",
        ((col("total") - col("tokens_covered")).cast(dec) * lit(1000000L).cast(dec)).cast(dec))
      .withColumn("den", col("total").cast(dec))
      .select(
        col("v").as("vocab_size"),
        col("tokens_covered"),
        col("total").as("total_tokens"),
        ((col("num") - (col("num") % col("den"))) / col("den")).cast("long").as("oov_ppm")
      )
      .orderBy("vocab_size")
  }

  /** Corpus-relative length gate: keep documents at or above the q-th
    * percentile of `n_chars` — percentile_disc semantics computed
    * EXACTLY, with a plan that survives 100 TB: the per-value
    * histogram is one partial-agg'd shuffle (output = value domain,
    * tiny), the cumulative scan runs over that tiny table, and the
    * single-row threshold broadcasts back against the corpus. No
    * global sort of the data, no interpolated float percentile for
    * the oracle to disagree with.
    */
  def lengthPercentileGate(t: Tables, q: Double = 0.75): DataFrame = {
    val cum = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val threshold = t.documents
      .groupBy(col("n_chars"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(cum))
      .withColumn("n", sum("c").over(all))
      .filter(col("cum") >= ceil(lit(q) * col("n")))
      .agg(min("n_chars").as("len_threshold"))
    t.documents
      .join(broadcast(threshold))
      .filter(col("n_chars") >= col("len_threshold"))
      .select(
        col("doc_id"),
        col("n_chars").cast("long").as("n_chars"),
        col("len_threshold").cast("long").as("len_threshold")
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

  /** Frequency threshold divisor for [[frequentWords]]: report words
    * with count·k > N. Must stay ≤ FreqItemsAgg.Capacity + 1 or the
    * sketch's superset guarantee (and thus the operator's EXACTNESS)
    * breaks.
    */
  val FreqK = 32

  /** Heavy hitters, sketch-then-verify: words with global frequency
    * > N/k, computed EXACTLY without ever shuffling the vocabulary.
    *
    * The 100 TB problem with the obvious `groupBy(word).count` is the
    * shuffle: the full vocabulary (billions of keys for web text)
    * crosses the wire to be counted, then almost all of it is thrown
    * away. Here a Misra-Gries summary
    * ([[graft.functions.MisraGriesCandidates]]) partial-aggregates a
    * FIXED-SIZE counter map map-side, merging to one ≤ Capacity-entry
    * candidate list on the driver side of a single tiny aggregation —
    * the corpus never shuffles. The MG bound guarantees candidates ⊇
    * every truly-frequent word, so the broadcast-semi-join verification
    * pass (exact counts for ≤ Capacity words only, integer threshold
    * count·k > N) makes the composed output EQUAL to the brute-force
    * oracle: sketch for the shuffle shape, verify for exactness.
    */
  def frequentWords(t: Tables, k: Int = FreqK): DataFrame = {
    require(k <= graft.functions.FreqItemsAgg.Capacity + 1, "superset guarantee needs k <= cap+1")
    graft.functions.FreqItemsAgg.register(t.spark)
    val words = t.documents.select(explode(split(col("text"), " ")).as("word"))
    // the global token count rides in the SAME aggregation as the
    // sketch — a separate words.agg(count) would be a third full
    // corpus scan for one long
    val summary = words.agg(
      expr("mg_candidates(word)").as("cand"),
      count(lit(1)).as("n_words")
    )
    // one-row broadcast + array_contains over ≤ Capacity entries keeps
    // `summary` referenced exactly once (a separate exploded candidate
    // join + count crossJoin would re-run the corpus aggregate)
    words
      .crossJoin(broadcast(summary))
      .filter(array_contains(col("cand"), col("word")))
      .groupBy("word", "n_words")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > col("n_words"))
      .select(col("word"), col("cnt"), col("n_words"))
      .orderBy(col("cnt").desc, col("word"))
  }

  /** C33: collocation extraction — word bigrams whose observed count
    * exceeds `liftTenths`/10 × the independence expectation
    * c(w₁)·c(w₂)/N (a PMI > log(lift) cut), with a minimum support.
    * The lift test is the cross-multiplied INTEGER comparison
    * `c_xy·N·10 ≥ liftTenths·c₁·c₂` in Decimal(38,0) — no float
    * division anywhere, so the oracle matches bit-exactly and the
    * products can't overflow at petabyte token counts (38 digits ≫
    * 2·10¹⁴ tokens squared).
    *
    * Plan shape: ONE corpus scan builds sentinel-padded (w₁,w₂) pairs
    * shuffle-free (array transform + explode — no per-doc window, no
    * doc_id shuffle), ONE exchange on the pair key aggregates them,
    * and the aggregate — distinct-bigram-sized, orders of magnitude
    * below the corpus — is MATERIALIZED once (localCheckpoint, or a
    * reliable `checkpoint()` under `checkpointDir` for long-lived
    * jobs, the [[graft.operators.Dedup]] convention) so its four
    * consumers — unigram counts c(w) as sum-over-successors, the token
    * total N, and the surviving pair rows — never re-run the corpus
    * explode. The sentinel rows are what make first/second-element
    * marginals equal full word counts, so ONE pass feeds everything.
    * Unigram/total sides are vocabulary-sized → broadcast.
    */
  def collocations(
      t: Tables,
      minCount: Int = 5,
      liftTenths: Int = 14,
      checkpointDir: Option[String] = None
  ): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // Boundary sentinels — a token the corpus cannot contain — are
    // CONCATENATED into the string before one raw split, and adjacent
    // words pair up via slice+arrays_zip: every expression here is a
    // codegen'd array op, because exploding a lambda-built
    // `transform(...)` array re-evaluates the interpreted lambda per
    // OUTPUT row (the §5 Generate finding, ~15×). The sentinel rows
    // (∅,first)/(last,∅) are what make both marginals of this one
    // aggregate equal the true unigram counts.
    val S = "\u0001" // not producible by split(text, ' ') on any real text
    val pairsPlan = t.documents
      .withColumn("ws", split(concat_ws(" ", lit(S), col("text"), lit(S)), " "))
      .select(explode(expr(
        "arrays_zip(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1))"
      )).as("p"))
      .groupBy(nullif(col("p.0"), lit(S)).as("w1"), nullif(col("p.1"), lit(S)).as("w2"))
      .agg(count(lit(1)).as("c"))
    checkpointDir.foreach(t.spark.sparkContext.setCheckpointDir)
    val pairs = if (checkpointDir.isDefined) pairsPlan.checkpoint() else pairsPlan.localCheckpoint()
    val c1  = pairs.groupBy("w1").agg(sum("c").as("c_first")).filter(col("w1").isNotNull)
    val c2  = pairs.groupBy("w2").agg(sum("c").as("c_second")).filter(col("w2").isNotNull)
    val tot = pairs.filter(col("w1").isNotNull).agg(sum("c").as("n_tokens"))
    pairs
      .filter(col("w1").isNotNull && col("w2").isNotNull && col("c") >= minCount)
      .join(broadcast(c1), "w1")
      .join(broadcast(c2), "w2")
      .crossJoin(broadcast(tot))
      .filter(
        col("c").cast(dec) * col("n_tokens") * lit(10) >=
          lit(liftTenths) * col("c_first").cast(dec) * col("c_second")
      )
      .select(col("w1"), col("w2"), col("c").as("n_pair"),
        col("c_first").as("n_first"), col("c_second").as("n_second"))
      .orderBy(col("n_pair").desc, col("w1"), col("w2"))
  }

  /** C42: n-gram LM coverage — score every untrusted document by how
    * much of it a bigram "language model" trained on the trusted slice
    * (sources src0-src4) has seen: n_hit of n_bigrams occurrences fall
    * inside the reference vocabulary, plus the integer coverage decile
    * `(n_hit·10) div n_bigrams`. This is the cheap LM-perplexity proxy
    * curation pipelines use for both quality gating (low coverage =
    * gibberish / wrong register) and domain-shift detection — in
    * integer counts, so the gate hashes exactly where a float log-prob
    * never would cross-engine.
    *
    * Plan: both slices are disjoint filters of ONE corpus pass; each
    * side builds bigrams map-side via the codegen'd slice+arrays_zip
    * pairing (no per-doc window, no doc_id shuffle — the C33 finding).
    * The vocabulary is a distinct aggregate on the bigram key and the
    * membership join is hinted shuffle_hash on that same key: at
    * 100 TB the distinct-bigram vocabulary is far beyond any broadcast
    * threshold, and hash-partitioning both sides on `bg` is the only
    * shape that scales (ReusedExchange does not apply — the sides are
    * different slices). Per-doc rollup is one partial-agg'd shuffle.
    */
  def lmCoverage(t: Tables): DataFrame = {
    val trustedSources = (0 to 4).map("src" + _)
    def bigrams(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "arrays_zip(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1))")).as("p"))
      .select(col("doc_id"), concat_ws(" ", col("p.0"), col("p.1")).as("bg"))
    val vocab = bigrams(t.documents.filter(col("source").isin(trustedSources: _*)))
      .select("bg")
      .distinct()
      .withColumn("hit", lit(1))
    bigrams(t.documents.filter(!col("source").isin(trustedSources: _*)))
      .join(vocab.hint("shuffle_hash"), Seq("bg"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), count(col("hit")).as("n_hit"))
      .withColumn("cov_decile", expr("(n_hit * 10) div n_bigrams"))
      .orderBy("doc_id")
  }

  /** C36: per-source rank normalization of a quality signal — keep
    * each source's top half by distinct-word count. Heterogeneous
    * sources make absolute quality thresholds wrong (a "good" forum
    * post scores like a "bad" article); rank-normalizing WITHIN the
    * source and gating on the percentile is the standard fix, and this
    * is that gate as a first-class operator (B25's events-side rank
    * percentiles applied to curation).
    *
    * ONE shuffle on source for the window; `percent_rank` is the
    * integer ratio (rank−1)/(n−1) → bit-exact cross-engine; the
    * (signal, doc_id) ordering pins ties. At 100 TB the per-source
    * partitions are the only sort surface — no global order anywhere.
    */
  def qualityRankNorm(t: Tables, keep: Double = 0.5): DataFrame = {
    val scored = t.documents.select(
      col("doc_id"),
      col("source"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("n_distinct_words")
    )
    val w = Window.partitionBy("source").orderBy(col("n_distinct_words"), col("doc_id"))
    scored
      .withColumn("pct_rank", percent_rank().over(w))
      .filter(col("pct_rank") >= keep)
      .orderBy("doc_id")
  }

  /** C34: per-language character-trigram profile — the top-k char
    * n-grams by frequency for each language label. This is the
    * TRAINING side of the n-gram language-ID heuristic ([[langId]]
    * consumes exactly such profiles): run it over a labeled corpus,
    * ship the tiny (langs × k) table, and the classifier is a
    * broadcast probe.
    *
    * Plan: the n-gram explode is a codegen `sequence`/`substring`
    * transform (map-side, no per-doc window), counts partial-aggregate
    * into one (lang, gram) shuffle — the gram domain is bounded
    * (alphabet³), so the aggregate is small at any corpus size — and
    * the per-language top-k runs through the bounded-heap
    * [[graft.plans.TopK]] operator, never a per-group sort. Ranking is
    * integer-deterministic: (count desc, gram asc).
    */
  def chargramLangProfile(t: Tables, n: Int = 3, k: Int = 10): DataFrame = {
    // explode the codegen'd `sequence` of start offsets and slice the
    // gram AFTER the explode (once per output row) — exploding a
    // lambda-built transform(...) array would re-evaluate the
    // interpreted lambda per output row (the §5 Generate finding)
    val grams = t.documents
      .filter(length(col("text")) >= n)
      .select(col("lang"), col("text"),
        explode(expr(s"sequence(1, length(text) - ${n - 1})")).as("i"))
      .select(col("lang"), expr(s"substring(text, i, $n)").as("gram"))
      .groupBy("lang", "gram")
      .agg(count(lit(1)).as("cnt"))
    graft.plans.TopK
      .perKey(grams, Seq("lang"), Seq(col("cnt").desc, col("gram")), k)
      .select("lang", "gram", "cnt", "rnk")
      .orderBy("lang", "rnk")
  }

  /** C46: bigram next-word model — for every head word with at least
    * `minHead` bigram occurrences, the top-k continuations by count:
    * the count-based conditional LM table (the estimation side of
    * C42's coverage scorer, and the suggestion model behind every
    * "type-ahead" demo). All-integer output (pair and head counts,
    * dense rank) — the consumer's smoothing/normalization is their
    * one division, and integers are what hash-gates an LM estimate.
    *
    * Plan: adjacent pairs via the codegen'd slice+arrays_zip pairing
    * (C33's rule — no per-doc window, no interpreted lambda explode),
    * partial-agg'd into one (head, next) shuffle; head totals are a
    * partial-agg'd groupBy joined back on the head key (vocabulary-
    * sized, skew-safe — never a window over a hot head word); the
    * per-head top-k runs through the bounded-heap
    * [[graft.plans.TopK]] operator, never a per-group sort.
    */
  def nextWordModel(t: Tables, minHead: Int = 20, k: Int = 3): DataFrame = {
    val pairs = t.documents
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "arrays_zip(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1))"
      )).as("p"))
      .groupBy(col("p.0").as("head"), col("p.1").as("next_word"))
      .agg(count(lit(1)).as("n_pair"))
    // n_head counts bigram OCCURRENCES of the head (successor slots),
    // not unigram tokens: a document-final token heads no bigram
    val heads = pairs
      .groupBy("head")
      .agg(sum("n_pair").as("n_head"))
      .filter(col("n_head") >= minHead)
    graft.plans.TopK
      .perKey(
        pairs.join(heads.hint("shuffle_hash"), "head"),
        Seq("head"),
        Seq(col("n_pair").desc, col("next_word")),
        k
      )
      .select("head", "rnk", "next_word", "n_pair", "n_head")
      .orderBy("head", "rnk")
  }
}
