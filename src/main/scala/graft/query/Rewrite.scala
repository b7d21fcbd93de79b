package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, levenshtein, lit}

/** MultiTermQuery rewrite: lower every leaf to weighted term clauses
  * against a term dictionary (SCORING_BOOLEAN_QUERY_REWRITE semantics,
  * /root/reference/src/Lucene.Net/Search/MultiTermQuery.cs:121; fuzzy uses
  * the TopTermsRewrite boost heap, TopTermsRewrite.cs). Expansions under
  * MUST would need a nested disjunction — rejected in v0; under MUST_NOT
  * they are sound (excluding the union).
  *
  * Shared by the batch [[Searcher]] and the segmented snapshot reader —
  * `expand(pred, maxTerms)` resolves a `term`-column predicate against the
  * caller's dictionary (one parquet table, or the union across segments),
  * so expansions are identical wherever the terms live.
  */
private[graft] object Rewrite {

  def clauses(expand: (Column, Int) => Seq[String],
              clauses: Seq[(Query.Occur, Query)]): Seq[(String, Query.Occur, Float)] = {
    def expansion(q: Query): Seq[(String, Float)] = q match {
      case Query.Prefix(p, b) =>
        expand(col("term").startsWith(p), Query.MaxClauseCount).map(t => (t, b))
      case Query.Wildcard(pat, b) =>
        val sql = pat.replace("%", "\\%").replace("_", "\\_")
          .replace('*', '%').replace('?', '_')
        expand(col("term").like(sql), Query.MaxClauseCount).map(t => (t, b))
      case Query.Regexp(re, b) =>
        expand(col("term").rlike(re), Query.MaxClauseCount).map(t => (t, b))
      case Query.TermRange(lo, hi, il, ih, b) =>
        val lower = if (il) col("term") >= lo else col("term") > lo
        val upper = if (ih) col("term") <= hi else col("term") < hi
        expand(lower && upper, Query.MaxClauseCount).map(t => (t, b))
      case f: Query.Fuzzy =>
        // top-N by similarity = 1 - d/min(|candidate|,|query|) — the
        // reference's accept-path formula (FuzzyTermsEnum.cs:419), ties by
        // term; expanded term boost = clause boost * similarity. The
        // candidate enumeration is uncapped like the reference's terms-enum
        // walk — the top-N heap caps the CLAUSES, not the candidates.
        val cands = expand(levenshtein(col("term"), lit(f.term)) <= f.maxEdits,
          1 << 20)
        cands
          .map { t =>
            val d = org.apache.commons.text.similarity.LevenshteinDistance
              .getDefaultInstance.apply(t, f.term).intValue()
            (t, 1.0f - d.toFloat / math.min(t.length, f.term.length))
          }
          .sortBy { case (t, sim) => (-sim, t) }
          .take(f.maxExpansions)
          .map { case (t, sim) => (t, f.boost * sim) }
      case other =>
        throw new UnsupportedOperationException(s"clause not executable in a flat boolean: $other")
    }
    clauses.flatMap {
      case (occ, Query.Term(t, b)) => Seq((t, occ, b))
      case (Query.Must, q) if !q.isInstanceOf[Query.Term] =>
        throw new UnsupportedOperationException(
          s"multi-term expansion under MUST needs a nested disjunction (v0 unsupported): $q")
      case (occ, q) => expansion(q).map { case (t, b) => (t, occ, b) }
    }
  }
}
