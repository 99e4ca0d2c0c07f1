package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Ranking, Retrieval, Similarity}
import graft.sources.Tables

/** Retrieval/serving evaluation layer (round-3 widening): reciprocal-rank
  * fusion of lexical + vector rankings and graded NDCG/MRR ranking quality
  * — the measurement side of the retrieval stack (q71 BM25, q73
  * rerank, the ANN family), as the classifier-eval suite (q170/q171/q182)
  * is to the scoring stack.
  *
  * All ranked lists are top-k control-plane frames by contract; the only
  * full-corpus passes are the BM25 token scan (audited at q71) and one
  * relevance scan whose ideal top-k is TakeOrderedAndProject.
  */
object EvalQueries {
  import CorpusQueries.bm25CtesSql
  import LlmQueries.{quantSql, toksSql}

  private val termsLit = Seq("spark", "window", "table")

  // ---------------------------------------------------------------- q189
  // Reciprocal-rank fusion: BM25 top-50 and cosine-to-query-vec top-50
  // fused by quantized RRF (k0=60) — the standard zero-tuning hybrid
  // alternative to q73's score rerank (no score normalization needed
  // across incomparable scales). Contributions floor(1e12/(60+rank)) are
  // exact longs; missing-list docs contribute 0 but keep NULL provenance
  // ranks. Final order: fused score desc, doc_id.
  private def q189(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lex = Retrieval.bm25TopK(Tables.documents(s, d), termsLit, k = 50)
      .select($"id",
        row_number().over(Window.orderBy($"score".desc, $"id")).as("rank"))
    val emb = Tables.embeddings(s, d)
    val vec = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === 0), k = 50)
      .select($"eid".as("id"), $"rn".as("rank"))
    Ranking.rrfFuse(Seq("lex" -> lex, "vec" -> vec), k0 = 60)
      .withColumn("rn",
        row_number().over(Window.orderBy($"rrf_x12".desc, $"id")))
      .filter($"rn" <= 20)
      .select($"rn", $"id".as("doc_id"), $"lex_rank", $"vec_rank", $"rrf_x12")
      .orderBy($"rn")
  }
  private val q189Sql =
    s"""WITH $bm25CtesSql,
       |lex AS (SELECT doc_id, lex_rank FROM (
       |    SELECT doc_id, CAST(row_number() OVER (
       |      ORDER BY score_x9 DESC, doc_id) AS INT) AS lex_rank FROM agg)
       |  WHERE lex_rank <= 50),
       |qv AS (SELECT $quantSql AS qv FROM embeddings WHERE vec_id = 0),
       |ev AS (SELECT vec_id, $quantSql AS ev FROM embeddings WHERE vec_id <> 0),
       |sc AS (SELECT vec_id AS doc_id,
       |    CAST(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*ev[i])) AS DOUBLE)
       |      / (sqrt(CAST(list_sum(list_transform(qv, x->x*x)) AS DOUBLE))
       |         * sqrt(CAST(list_sum(list_transform(ev, x->x*x)) AS DOUBLE))) AS cos
       |  FROM ev, qv),
       |vec AS (SELECT doc_id, vec_rank FROM (
       |    SELECT doc_id, CAST(row_number() OVER (
       |      ORDER BY cos DESC, doc_id) AS INT) AS vec_rank FROM sc)
       |  WHERE vec_rank <= 50),
       |f AS (SELECT doc_id, lex_rank, vec_rank,
       |    COALESCE(CAST(floor(1e12 / (60 + lex_rank)) AS BIGINT), 0)
       |      + COALESCE(CAST(floor(1e12 / (60 + vec_rank)) AS BIGINT), 0)
       |      AS rrf_x12
       |  FROM lex FULL OUTER JOIN vec USING (doc_id))
       |SELECT rn, doc_id, lex_rank, vec_rank, rrf_x12 FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY rrf_x12 DESC, doc_id) AS INT)
       |      AS rn, doc_id, lex_rank, vec_rank, rrf_x12 FROM f)
       |WHERE rn <= 20 ORDER BY rn""".stripMargin

  // ---------------------------------------------------------------- q190
  // Graded NDCG@10 curve + MRR for the BM25 ranking: relevance grade =
  // number of distinct query terms present in the doc (0–3, derivable by
  // both engines from the shared normalization), ideal ranking = corpus
  // top-10 by (rel desc, doc_id) via TakeOrderedAndProject. DCG terms
  // (2^rel−1)·floor(1e6/log2(rn+1)) are exact longs; ndcg is one final
  // division; mrr_x6 = floor(1e6/first-relevant-rank).
  private def q190(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val rel = docs.select($"doc_id".as("id"),
      size(array_intersect(
        array_distinct(split(Dedup.normalized(coalesce($"text", lit(""))), " ")),
        array(termsLit.map(lit): _*))).as("rel"))
    val ranked = Retrieval.bm25TopK(docs, termsLit, k = 10)
      .select($"id",
        row_number().over(Window.orderBy($"score".desc, $"id")).as("rn"))
    Ranking.ndcgCurve(ranked, rel, k = 10)
      .select($"rn", $"id".as("doc_id"), $"rel", $"dcg_x6", $"idcg_x6",
        $"ndcg", $"mrr_x6")
      .orderBy($"rn")
  }
  private val q190Sql =
    s"""WITH $bm25CtesSql,
       |ranked AS (SELECT doc_id, rn FROM (
       |    SELECT doc_id, CAST(row_number() OVER (
       |      ORDER BY score_x9 DESC, doc_id) AS INT) AS rn FROM agg)
       |  WHERE rn <= 10),
       |rel AS (SELECT doc_id, CAST(len(list_intersect(list_distinct($toksSql),
       |    ['spark', 'window', 'table'])) AS INT) AS rel FROM documents),
       |g AS (SELECT rn, r.doc_id, COALESCE(rel, 0) AS rel,
       |    CAST(2 ** COALESCE(rel, 0) - 1 AS BIGINT)
       |      * CAST(floor(1e6 / log2(rn + 1)) AS BIGINT) AS term
       |  FROM ranked r LEFT JOIN rel USING (doc_id)),
       |dc AS (SELECT rn, doc_id, rel,
       |    CAST(sum(term) OVER (ORDER BY rn) AS BIGINT) AS dcg_x6 FROM g),
       |itop AS (SELECT rel, doc_id FROM rel ORDER BY rel DESC, doc_id LIMIT 10),
       |ig AS (SELECT irn, CAST(2 ** rel - 1 AS BIGINT)
       |      * CAST(floor(1e6 / log2(irn + 1)) AS BIGINT) AS iterm FROM (
       |    SELECT CAST(row_number() OVER (ORDER BY rel DESC, doc_id) AS INT)
       |        AS irn, rel FROM itop)),
       |ideal AS (SELECT irn AS rn,
       |    CAST(sum(iterm) OVER (ORDER BY irn) AS BIGINT) AS idcg_x6 FROM ig),
       |m AS (SELECT CAST(floor(1e6 / min(CASE WHEN rel > 0 THEN rn END))
       |    AS BIGINT) AS mrr_x6 FROM dc)
       |SELECT rn, doc_id, rel, dcg_x6, idcg_x6,
       |  CASE WHEN idcg_x6 > 0
       |    THEN CAST(dcg_x6 AS DOUBLE) / idcg_x6 END AS ndcg, mrr_x6
       |FROM dc JOIN ideal USING (rn) CROSS JOIN m ORDER BY rn""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q189_rrf_fusion", q189, Some(q189Sql)),
    QueryDef("q190_ndcg_curve", q190, Some(q190Sql)))
}
