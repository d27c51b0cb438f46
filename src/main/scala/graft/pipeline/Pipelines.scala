package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composed end-to-end training-data pipelines. */
object Pipelines {

  /** Corpus cleaning: quality gate -> exact dedup (keep lowest id) ->
    * MinHash near-dup removal (drop the higher id of each near-dup pair).
    *
    * Every stage is one of the already-tested operators; the composition is
    * shuffle-minimal: the quality gate is a narrow map, exact dedup is one
    * digest shuffle, near-dup is the LSH band join over the survivors only.
    */
  def cleanCorpus(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      minQuality: Double = 0.5, jaccardThreshold: Double = 0.5,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val id = col(idCol)

    // 1. quality gate (annotate stages tokenization once)
    val annotated = TextAnalysis.annotate(docs, textCol)
    val qualified = annotated.filter(col("quality") >= minQuality)

    // 2. exact dedup: keep the lowest id per content digest
    val exactDeduped = Dedup.dropExactDuplicates(qualified, textCol, idCol)

    // 3. near-dup removal over the survivors: any doc that is the HIGHER id
    //    of a verified near-dup pair is dropped
    val pairs = Dedup.minhashNearDuplicates(exactDeduped, textCol, idCol,
      jaccardThreshold, numHashes, bands)
    val losers = pairs.select(col("id_b").as(idCol)).distinct()
    exactDeduped.join(losers, Seq(idCol), "left_anti")
      .select(id, col("n_tokens"), col("quality"))
  }
}
