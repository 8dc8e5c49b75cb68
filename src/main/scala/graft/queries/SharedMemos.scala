package graft.queries

import org.apache.spark.sql.SparkSession

/** One-stop materializer for every [[SessionMemo]]-backed shared
  * relation, with per-memo build timing.
  *
  * Why this exists (round 16): the session memos are deliberately
  * exempt from Bench's per-query cache drains — re-deriving the
  * shingle index or the purchase graph once per consuming query is
  * the anti-pattern the memos remove, and at 100 TB each memo is a
  * LANDED table built once offline. But that exemption means a
  * benchmark that times only queries never shows the memo build cost
  * anywhere: with min-of-3 reps the first rep pays the build and the
  * min reads the warm reps, so every per-query number is a warm-cache
  * read and the one-time cost is invisible (the round-15 advisor's
  * disclosure complaint). Bench now calls [[warm]] in its untimed
  * warmup phase and stamps each memo's build seconds in the artifact
  * — per-query numbers stay warm-read by design, and the artifact
  * says exactly what the warm phase paid, like the IVF/PQ/OPQ index
  * warmups already did.
  */
object SharedMemos {

  /** Materialize (build + persist + one count) every shared memo for
    * (session, dir); returns per-memo build seconds, −1 on failure.
    * Each memo fails independently and loudly — one broken builder
    * must not silently leave the rest cold (the Bench warmup
    * discipline). */
  def warm(s: SparkSession, d: String): Seq[(String, Double)] = {
    def t(name: String)(f: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      val ok =
        try { f; true }
        catch { case e: Throwable =>
          System.err.println(s"[memo-warm] $name failed: ${e.getMessage}")
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    Seq(
      t("text.docsWords")(TextQueries.docsWithWords(s, d).count()),
      t("text.shingleRows")(TextQueries.shingleRows(s, d).count()),
      t("text.shingleStringRows")(TextQueries.shingleStringRows(s, d).count()),
      // per-doc sizes + rare key set (round 17): corpus-wide shingle
      // aggregates the dedup family consumed per query; warmed before
      // ngramPairsShared, which now derives from them
      t("text.shingleSizes")(TextQueries.shingleSizes(s, d).count()),
      t("text.rareShingles")(TextQueries.rareShingles(s, d).count()),
      t("text.ngramPairsShared")(TextQueries.ngramPairsShared(s, d).count()),
      t("sim.embeddingLshPairs")(SimilarityQueries.embeddingLshPairs(s, d).count()),
      t("temporal.ordersDaily")(OrdersDaily.cents(s, d).count()),
      t("graph.edges")(GraphQueries.warmMemos(s, d)),
      t("insight.baskets")(InsightQueries.warmMemos(s, d)))
  }
}
