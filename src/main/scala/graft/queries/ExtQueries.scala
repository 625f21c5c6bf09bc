package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.{Dedup, Multimodal, Similarity, TextStats}

/** LLM-training-data-pipeline query inventory (the north star's second
  * half): dedup, similarity search, text analysis, multimodal metadata —
  * each an oracle-checked entry over the `documents` / `embeddings`
  * fixtures. See the `graft.ext` modules for operator design and the
  * 100 TB scale notes.
  */
object ExtQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_exact_dedup" -> ((s, d) => Dedup.exactDedup(docs(s, d))),
    "x2_minhash_neardup" -> ((s, d) => Dedup.minhashNeardup(docs(s, d))),
    "x3_cosine_topk" -> ((s, d) => Similarity.cosTopK(emb(s, d))),
    "x4_text_stats" -> ((s, d) => TextStats.textStats(docs(s, d))),
    "x5_simhash_neardup" -> ((s, d) => Dedup.simhashNeardup(docs(s, d))),
    "x6_ann_ivf" -> ((s, d) => Similarity.ivfTopK(emb(s, d))),
    "x7_lang_id" -> ((s, d) => TextStats.langId(docs(s, d))),
    "x8_quality_score" -> ((s, d) => TextStats.qualityScore(docs(s, d))),
    "x9_token_count" -> ((s, d) => TextStats.tokenCount(docs(s, d))),
    "x10_fingerprint" -> ((s, d) => TextStats.fingerprint(docs(s, d))),
    "x11_multimodal_meta" -> ((s, d) => Multimodal.mediaMeta(docs(s, d))))
}
