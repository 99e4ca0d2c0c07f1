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

  // ---------------------------------------------------------------- q283
  // MMR diversification: the BM25 top-20 shortlist greedily re-ranked so
  // each of 8 picks balances relevance against redundancy with what is
  // already picked (λ = 0.7) — the context-assembly diversifier on top
  // of the retrieval stack (q189 fuses systems; this de-duplicates one
  // system's winners). Scoring is exact longs (λ in milli-units, the
  // q43-gated integer-quantized cosine floored to 1e-9), so the greedy
  // argmax replays exactly; the oracle unrolls all 8 rounds, each
  // re-deriving per-candidate max-sim-to-selected and taking the same
  // (score desc, id) argmax. Candidates without an embedding row drop on
  // both engines (inner join).
  private def q283(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cand = Retrieval.bm25TopK(Tables.documents(s, d), termsLit, k = 20)
      // exact reconstruction of the long score: |score·1e9 − score_x9| ≪ 0.5
      .select($"id", round($"score" * 1e9).cast("long").as("rel_x9"))
    Ranking.mmrDiversify(cand, Tables.embeddings(s, d), k = 8, lambdaMilli = 700)
      .select($"rn", $"id".as("doc_id"), $"rel_x9", $"max_sim_x9", $"mmr_x")
      .orderBy($"rn")
  }
  private val q283Sql: String = {
    // every reused CTE is MATERIALIZED: DuckDB inlines CTEs by default, and
    // the unrolled greedy rounds reference p1..p_{i-1} multiple times each —
    // inlining would re-expand the whole upstream chain EXPONENTIALLY
    // (observed as thousands of parquet opens before materialization)
    val head =
      s"""WITH $bm25CtesSql,
         |cand0 AS MATERIALIZED (SELECT doc_id AS id,
         |  CAST(score_x9 AS BIGINT) AS rel FROM agg
         |  ORDER BY score_x9 DESC, doc_id LIMIT 20),
         |v AS MATERIALIZED (SELECT e.vec_id AS id, $quantSql AS qv
         |  FROM embeddings e JOIN cand0 c ON e.vec_id = c.id),
         |cand AS MATERIALIZED (SELECT c.id, c.rel FROM cand0 c JOIN v ON v.id = c.id),
         |sims AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib,
         |    CASE WHEN list_sum(list_transform(a.qv, x->x*x)) = 0
         |           OR list_sum(list_transform(b.qv, x->x*x)) = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(floor(CAST(list_sum(list_transform(range(1, len(a.qv)+1),
         |        i -> a.qv[i]*b.qv[i])) AS DOUBLE)
         |      / (sqrt(CAST(list_sum(list_transform(a.qv, x->x*x)) AS DOUBLE))
         |         * sqrt(CAST(list_sum(list_transform(b.qv, x->x*x)) AS DOUBLE)))
         |      * 1e9) AS BIGINT) END AS s9
         |  FROM v a JOIN v b ON a.id <> b.id),
         |p1 AS MATERIALIZED (SELECT id, rel, CAST(0 AS BIGINT) AS ms, 700*rel AS mx
         |  FROM cand ORDER BY 700*rel DESC, id LIMIT 1)""".stripMargin
    val rounds = (2 to 8).map { i =>
      val sel = (1 until i).map(j => s"SELECT id FROM p$j").mkString(" UNION ALL ")
      s"""m$i AS MATERIALIZED (SELECT c.id, c.rel, MAX(s.s9) AS ms
         |  FROM cand c JOIN sims s ON s.ia = c.id
         |  WHERE s.ib IN ($sel) AND c.id NOT IN ($sel)
         |  GROUP BY c.id, c.rel),
         |p$i AS MATERIALIZED (SELECT id, rel, ms, 700*rel - 300*ms AS mx FROM m$i
         |  ORDER BY 700*rel - 300*ms DESC, id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val tail = (1 to 8).map { i =>
      s"SELECT CAST($i AS INTEGER) AS rn, id AS doc_id, " +
        s"CAST(rel AS BIGINT) AS rel_x9, CAST(ms AS BIGINT) AS max_sim_x9, " +
        s"CAST(mx AS BIGINT) AS mmr_x FROM p$i"
    }.mkString("\nUNION ALL ")
    s"$head,\n$rounds\n$tail\nORDER BY rn"
  }

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
    // slim (id, rel) relevance labels consumed twice inside ndcgCurve
    // (ranked join + ideal top-k): materialize so the corpus tokenization
    // runs once
    val rel = docs.select($"doc_id".as("id"),
      size(array_intersect(
        array_distinct(split(Dedup.normalized(coalesce($"text", lit(""))), " ")),
        array(termsLit.map(lit): _*))).as("rel"))
      .localCheckpoint()
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

  // ---------------------------------------------------------------- q211
  // MAP@10 for the BM25 ranking, binary relevance rel ≥ 2 (doc contains
  // ≥2 of the 3 query terms) — the set-retrieval companion to q190's
  // graded NDCG/MRR, closing the ranking-eval family. All integer:
  // running hit counts, BIGINT-division precision terms, AP one final
  // BIGINT division over min(n_rel, k).
  private def q211(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    // slim (id, rel) labels consumed twice inside apCurve (ranked join +
    // positives count): materialize so the corpus tokenization runs once
    val rel = docs.select($"doc_id".as("id"),
      size(array_intersect(
        array_distinct(split(Dedup.normalized(coalesce($"text", lit(""))), " ")),
        array(termsLit.map(lit): _*))).as("rel"))
      .localCheckpoint()
    val ranked = Retrieval.bm25TopK(docs, termsLit, k = 10)
      .select($"id",
        row_number().over(Window.orderBy($"score".desc, $"id")).as("rn"))
    Ranking.apCurve(ranked, rel, k = 10, relThreshold = 2)
      .select($"rn", $"id".as("doc_id"), $"is_rel", $"hits", $"p_x6",
        $"n_rel", $"ap_x6")
      .orderBy($"rn")
  }
  private val q211Sql =
    s"""WITH $bm25CtesSql,
       |ranked AS (SELECT doc_id, rn FROM (
       |    SELECT doc_id, CAST(row_number() OVER (
       |      ORDER BY score_x9 DESC, doc_id) AS INT) AS rn FROM agg)
       |  WHERE rn <= 10),
       |rel AS (SELECT doc_id, CAST(len(list_intersect(list_distinct($toksSql),
       |    ['spark', 'window', 'table'])) AS INT) AS rel FROM documents),
       |lab AS (SELECT rn, r.doc_id, COALESCE(rel, 0) >= 2 AS is_rel
       |  FROM ranked r LEFT JOIN rel USING (doc_id)),
       |cum AS (SELECT rn, doc_id, is_rel,
       |    CAST(SUM(CASE WHEN is_rel THEN 1 ELSE 0 END)
       |      OVER (ORDER BY rn) AS BIGINT) AS hits FROM lab),
       |pr AS (SELECT rn, doc_id, is_rel, hits,
       |    CASE WHEN is_rel
       |      THEN (hits * CAST(1000000 AS BIGINT)) // rn END AS p_x6 FROM cum),
       |tot AS (SELECT CAST(SUM(CASE WHEN rel >= 2 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_rel FROM rel),
       |aps AS (SELECT CAST(COALESCE(SUM(p_x6), 0) AS BIGINT) AS psum FROM pr)
       |SELECT rn, doc_id, is_rel, hits, CAST(p_x6 AS BIGINT) AS p_x6, n_rel,
       |  CASE WHEN LEAST(n_rel, 10) > 0 THEN psum // LEAST(n_rel, 10)
       |    ELSE 0 END AS ap_x6
       |FROM pr CROSS JOIN tot CROSS JOIN aps ORDER BY rn""".stripMargin

  // ---------------------------------------------------------------- q193
  // Forecast backtest: per event type, score the two zero-parameter
  // baselines every real forecaster must beat — naive (yesterday's value)
  // and seasonal-naive (same weekday last week) — over the daily
  // cents-quantized value series. Error sums are exact longs (sae);
  // per-day MAPE terms are BIGINT divisions floor(|err|·1e6/actual);
  // the means are one final double division each. Day pairing is an
  // equi-join on day−lag (gap-proof: missing days drop only their own
  // pairs — no positional lag over a gappy axis).
  private def q193(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .select($"event_type", expr("unix_micros(ts) div 86400000000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy($"event_type", $"day")
      .agg(sum($"cents").as("cents"))
      .localCheckpoint() // one slim (type, day, cents) frame feeds 3 joins
    def backtest(lag: Int, tag: String): DataFrame =
      daily.as("a")
        .join(daily.as("f"),
          expr(s"f.event_type = a.event_type AND f.day = a.day - $lag"))
        .select($"a.event_type".as("event_type"),
          abs($"a.cents" - $"f.cents").as("ae"),
          when($"a.cents" > 0,
            expr("(abs(a.cents - f.cents) * CAST(1000000 AS BIGINT)) div a.cents"))
            .as("ape_x6"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as(s"n_$tag"),
          sum($"ae").as(s"sae_$tag"),
          (sum($"ae").cast("double") / count(lit(1))).as(s"mae_$tag"),
          (sum($"ape_x6").cast("double") / count($"ape_x6") / 1e6)
            .as(s"mape_$tag"))
    backtest(1, "naive").join(backtest(7, "seasonal"), "event_type")
      .orderBy($"event_type")
  }
  private val q193Sql = {
    def bt(lag: Int, tag: String) =
      s"""SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n_$tag,
         |    CAST(SUM(abs(a.cents - f.cents)) AS BIGINT) AS sae_$tag,
         |    CAST(SUM(abs(a.cents - f.cents)) AS DOUBLE) / COUNT(*) AS mae_$tag,
         |    CAST(SUM(CASE WHEN a.cents > 0 THEN
         |        (abs(a.cents - f.cents) * CAST(1000000 AS BIGINT)) // a.cents
         |      END) AS DOUBLE)
         |      / COUNT(CASE WHEN a.cents > 0 THEN 1 END) / 1e6 AS mape_$tag
         |  FROM daily a JOIN daily f
         |    ON f.event_type = a.event_type AND f.day = a.day - $lag
         |  GROUP BY a.event_type""".stripMargin
    s"""WITH daily AS MATERIALIZED (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |      CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
       |        AS cents
       |    FROM events GROUP BY 1, 2),
       |n AS (${bt(1, "naive")}),
       |s AS (${bt(7, "seasonal")})
       |SELECT * FROM n JOIN s USING (event_type) ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------- q194
  // First-order Markov next-event prediction accuracy: the transition
  // counts (q103's matrix) become a predictor — argmax next per prev,
  // ties to the lexicographically smallest type — and are scored against
  // the same timeline (in-sample skill readout per prev type, with the
  // majority-class hit rate as the number to beat). Two aggregates and a
  // broadcast of the |types|² model; the timeline is scanned once.
  private def q194(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val trans = Tables.events(s, d)
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
        $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .select($"event_type".as("prev"), $"next_type".as("next"))
      .localCheckpoint() // feeds model fit + scoring
    val model = trans.groupBy($"prev", $"next").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"prev").orderBy($"n".desc, $"next")))
      .filter($"rk" === 1)
      .select($"prev", $"next".as("pred_next"), $"n".as("pred_n"))
    trans.join(broadcast(model), "prev")
      .groupBy($"prev", $"pred_next")
      .agg(count(lit(1)).as("n_trans"),
        sum(when($"next" === $"pred_next", 1L).otherwise(0L)).as("n_hits"))
      .withColumn("accuracy", $"n_hits".cast("double") / $"n_trans")
      .orderBy($"prev")
  }
  private val q194Sql =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
      |           FROM events),
      |t AS MATERIALIZED (SELECT event_type AS prev,
      |        lead(event_type) OVER (PARTITION BY user_id
      |          ORDER BY ts_us, event_id) AS next
      |      FROM e QUALIFY next IS NOT NULL),
      |m AS (SELECT prev, next AS pred_next FROM (
      |    SELECT prev, next, COUNT(*) AS n,
      |        row_number() OVER (PARTITION BY prev
      |          ORDER BY COUNT(*) DESC, next) AS rk
      |      FROM t GROUP BY prev, next)
      |  WHERE rk = 1)
      |SELECT prev, pred_next, CAST(COUNT(*) AS BIGINT) AS n_trans,
      |    CAST(SUM(CASE WHEN t.next = m.pred_next THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_hits,
      |    CAST(SUM(CASE WHEN t.next = m.pred_next THEN 1 ELSE 0 END)
      |        AS DOUBLE) / COUNT(*) AS accuracy
      |  FROM t JOIN m USING (prev)
      |  GROUP BY prev, pred_next ORDER BY prev""".stripMargin

  // ---------------------------------------------------------------- q219
  // Label-centroid silhouette of the embedding corpus: are the labeled
  // clusters actually separated in vector space? The O(n·k) simplified
  // silhouette (centroid distances, never pairwise) with integer-sum
  // centroids — cosine is scale-invariant, so the un-divided component
  // sums ARE the centroid directions and every dot/norm stays an exact
  // long. The geometric companion to q197's Davies-Bouldin (that one
  // scores a k-means fit; this scores the LABELS themselves).
  private def q219(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.ops.Embeddings.labelSilhouette(Tables.embeddings(s, d))
      .orderBy($"label")
  }
  private val q219Sql =
    s"""WITH q AS MATERIALIZED (
       |  SELECT CAST(vec_id AS BIGINT) AS id, CAST(label AS BIGINT) AS lbl,
       |    $quantSql AS qv
       |  FROM embeddings),
       |qn AS (SELECT id, lbl, qv,
       |    CAST(list_sum(list_transform(qv, v -> v*v)) AS BIGINT) AS xx
       |  FROM q),
       |qf AS (SELECT * FROM qn WHERE xx > 0),
       |comp AS (SELECT lbl, unnest(qv) AS x,
       |    generate_subscripts(qv, 1) AS i FROM qf),
       |cs AS (SELECT lbl AS clbl, i, CAST(SUM(x) AS BIGINT) AS s
       |  FROM comp GROUP BY 1, 2),
       |cent AS (SELECT clbl, list(s ORDER BY i) AS cv FROM cs GROUP BY 1),
       |cn AS (SELECT clbl, cv,
       |    CAST(list_sum(list_transform(cv, v -> CAST(v AS HUGEINT) * v))
       |      AS HUGEINT) AS cc
       |  FROM cent),
       |cf AS (SELECT * FROM cn WHERE cc > 0),
       |ab AS (SELECT id, lbl,
       |    MAX(CASE WHEN clbl = lbl THEN d END) AS a,
       |    MIN(CASE WHEN clbl <> lbl THEN d END) AS b
       |  FROM (SELECT qf.id, qf.lbl, cf.clbl,
       |      1 - CAST(list_sum(list_transform(range(1, len(qv)+1),
       |            i -> CAST(qv[i] AS HUGEINT) * cv[i])) AS DOUBLE)
       |          / (sqrt(CAST(xx AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE))) AS d
       |    FROM qf CROSS JOIN cf)
       |  GROUP BY 1, 2),
       |sx AS (SELECT lbl,
       |    CAST(floor((CASE WHEN greatest(a, b) > 0
       |        THEN (b - a) / greatest(a, b) ELSE 0 END) * 1e6)
       |      AS BIGINT) AS sxv
       |  FROM ab WHERE a IS NOT NULL AND b IS NOT NULL)
       |SELECT lbl AS label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       |  CAST(SUM(sxv) AS BIGINT) AS sil_sum_x6
       |FROM sx GROUP BY 1 ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- q248
  // Label-centroid cosine matrix: which labeled embedding groups point
  // the same way (merge candidates / label noise) and which are
  // orthogonal — the pairwise SEPARATION complement of q219's cohesion
  // silhouette, over the same integer-sum centroid machinery. One corpus
  // pass to k·dim component sums; the k×k upper triangle is a
  // control-plane cross of the checkpointed k-row centroid frame.
  private def q248(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.ops.Embeddings.labelCentroidMatrix(Tables.embeddings(s, d))
      .orderBy($"label_a", $"label_b")
  }
  private val q248Sql =
    s"""WITH q AS (SELECT CAST(label AS BIGINT) AS lbl, $quantSql AS qv
       |  FROM embeddings),
       |comp AS (SELECT lbl, unnest(qv) AS x,
       |    generate_subscripts(qv, 1) AS i FROM q),
       |cs AS (SELECT lbl, i, CAST(SUM(x) AS BIGINT) AS s
       |  FROM comp GROUP BY 1, 2),
       |cent AS (SELECT lbl, list(s ORDER BY i) AS cv FROM cs GROUP BY 1),
       |cn AS (SELECT lbl, cv,
       |    CAST(list_sum(list_transform(cv, v -> CAST(v AS HUGEINT) * v))
       |      AS HUGEINT) AS cc
       |  FROM cent),
       |cf AS (SELECT * FROM cn WHERE cc > 0)
       |SELECT a.lbl AS label_a, b.lbl AS label_b,
       |  CAST(floor(CAST(list_sum(list_transform(range(1, len(a.cv)+1),
       |        i -> CAST(a.cv[i] AS HUGEINT) * b.cv[i])) AS DOUBLE)
       |      / (sqrt(CAST(a.cc AS DOUBLE)) * sqrt(CAST(b.cc AS DOUBLE)))
       |      * 1e6) AS BIGINT) AS cos_x6
       |FROM cf a JOIN cf b ON a.lbl < b.lbl
       |ORDER BY label_a, label_b""".stripMargin

  // ---------------------------------------------------------------- q220
  // Per-state transition entropy of the user event chain, by even/odd-id
  // cohort: how predictable is the NEXT event after each event type? The
  // uncertainty companion to q194's Markov argmax accuracy (same
  // transition frame) — quantized −p·ln p terms over exact counts on the
  // state×state grid.
  private def q220(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trans = Tables.events(s, d)
      .select(pmod($"user_id", lit(2L)).as("cohort"), $"user_id", $"ts",
        $"event_id", $"event_type")
      .withColumn("nxt", lead($"event_type", 1).over(w))
      .filter($"nxt".isNotNull)
    graft.ops.Stats.transitionEntropy(trans, Seq("cohort"),
        $"event_type", $"nxt")
      .orderBy($"cohort", $"from_state")
  }
  private val q220Sql =
    """WITH e AS (SELECT user_id % 2 AS cohort, event_type,
      |        lead(event_type) OVER (PARTITION BY user_id
      |          ORDER BY ts, event_id) AS nxt
      |      FROM events),
      |c AS (SELECT cohort, event_type AS f, nxt AS j,
      |        CAST(COUNT(*) AS BIGINT) AS nij
      |      FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2, 3),
      |m AS (SELECT cohort, f, CAST(SUM(nij) AS BIGINT) AS ni
      |      FROM c GROUP BY 1, 2)
      |SELECT cohort, f AS from_state, MAX(ni) AS n_out,
      |  CAST(COUNT(*) AS BIGINT) AS n_next_states,
      |  CAST(SUM(CAST(floor(
      |      -((CAST(nij AS DOUBLE) / CAST(ni AS DOUBLE))
      |        * ln(CAST(nij AS DOUBLE) / CAST(ni AS DOUBLE))) * 1e9)
      |    AS BIGINT)) AS BIGINT) AS h_x9
      |FROM c JOIN m USING (cohort, f)
      |GROUP BY 1, 2 ORDER BY cohort, from_state""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q189_rrf_fusion", q189, Some(q189Sql)),
    QueryDef("q283_mmr_diversify", q283, Some(q283Sql)),
    QueryDef("q190_ndcg_curve", q190, Some(q190Sql)),
    QueryDef("q211_map_eval", q211, Some(q211Sql)),
    QueryDef("q193_forecast_backtest", q193, Some(q193Sql)),
    QueryDef("q194_markov_accuracy", q194, Some(q194Sql)),
    QueryDef("q219_silhouette", q219, Some(q219Sql)),
    QueryDef("q248_label_centroid_matrix", q248, Some(q248Sql)),
    QueryDef("q220_transition_entropy", q220, Some(q220Sql)))
}
