package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a 100 TB corpus
  * actually runs, as ONE declarative plan —
  *
  *   quality gate (token count) →
  *   language gate (en) →
  *   exact dedup (keep the min doc of each normalized-text group) →
  *   near-dup resolution (keep only each similarity component's min).
  *
  * Every stage reuses the standalone operators, so the whole pipeline
  * stays a single Catalyst plan: filters fuse, the doc_id joins all
  * broadcast or co-partition, and nothing materializes between stages.
  */
object Curation {

  val MinTokens = 30

  def curate(t: Tables): DataFrame = {
    val quality = TextOps.qualityScores(t).select(col("doc_id"), col("n_tokens"))
    val lang    = TextOps.langId(t).select(col("doc_id"), col("lang_pred"))
    val exact   = Dedup.exact(t).select(col("doc_id"), col("keep_doc_id"))
    val comps   = Dedup.nearDupComponents(t).withColumnRenamed("component", "near_dup_comp")
    t.documents
      .select(col("doc_id"))
      .join(quality, "doc_id")
      .join(lang, "doc_id")
      .join(exact, "doc_id")
      .join(comps, Seq("doc_id"), "left")
      .filter(
        col("n_tokens") >= MinTokens &&
          col("lang_pred") === "en" &&
          col("doc_id") === col("keep_doc_id") &&
          (col("near_dup_comp").isNull || col("near_dup_comp") === col("doc_id"))
      )
      .select(col("doc_id"), col("n_tokens"), col("lang_pred"))
      .orderBy("doc_id")
  }
}
