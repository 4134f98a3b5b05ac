package graft.queries

import graft.QueryDef

/** Training-data pipeline operators as driver-checkable queries (SURVEY.md
  * §7.5, the beyond-reference tier), split per-domain for reviewability:
  *
  *  - [[DedupQueries]] — exact/Jaccard/MinHash-LSH/SimHash dedup, cluster
  *    assignment, decontamination;
  *  - [[SimilarityQueries]] — kNN, blocked cosine, LSH/Hamming/IVF ANN;
  *  - [[TextQueries]] — quality stats, language-ID, winnowing, repetition
  *    filters, PII redaction;
  *  - [[CorpusQueries]] — as-of join, sessionization, multimodal plumbing,
  *    the end-to-end clean pipeline, splits and shard packing.
  *
  * Queries with `oracle = Some(sql)` are hash-compared against DuckDB — the
  * SQL mirrors the Spark expression tree operation-for-operation (same fold
  * order for float work, same integer/decimal types, shared fragments in
  * [[QuerySql]]) so results are bit-identical. Approximate operators also
  * get exactness/recall ScalaTest specs against their exact counterparts.
  */
object PipelineQueries {
  val all: Seq[QueryDef] =
    DedupQueries.all ++ SimilarityQueries.all ++ TextQueries.all ++
      CorpusQueries.all
}
