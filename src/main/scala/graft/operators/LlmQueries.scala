package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.{AnnIndex, Dedup, Multimodal, RecordLinkage, Regression, Sampling, Sessionize, Similarity, TextAnalysis}

/** Training-data pipeline operators under the correctness gate (north-star
  * EXT): dedup family, similarity search, text analysis, multimodal
  * metadata, sampling/split/sessionize. Every query here carries a DuckDB
  * oracle: where the approximation family is normally engine-specific, the
  * parameters are chosen to make the approximate output EQUAL an exactly
  * recomputable set (lossless LSH banding at the verified threshold;
  * cross-engine md5 token hashes; integer-quantized cosine), so the
  * distributed pipeline is pinned end-to-end, not just row-counted.
  */
object LlmQueries {

  private[operators] val normSql =
    "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private[operators] val toksSql = s"string_split($normSql, ' ')"
  private val allStopsSql = TextAnalysis.stopwords.values.flatten.toSeq
    .map(w => s"'$w'").mkString("[", ", ", "]")

  // ---------------------------------------------------------------- q40
  private def q40(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.exact(Tables.documents(s, d)).orderBy($"keep_id")
  }
  private val q40Sql =
    s"""SELECT min(doc_id) AS keep_id, COUNT(*) AS n_dups
       |FROM documents GROUP BY $normSql ORDER BY keep_id""".stripMargin

  // ---------------------------------------------------------------- q41
  // MinHash-LSH duplicate pairs WITH exact-Jaccard verification, against a
  // brute-force all-pairs oracle. LSH banding itself is engine-specific,
  // but the verified OUTPUT is a pure function of the corpus provided the
  // bands recall every pair above threshold: at k=64/b=16 (r=4) a pair at
  // j=0.9 is missed with p=(1-0.9^4)^16 ≈ 4e-8, and the synthetic corpus
  // has no pairs in (0.4, 0.9) — so candidate generation is exhaustive in
  // practice and the oracle gate pins the whole pipeline end-to-end.
  private def q41(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Dedup.minhashDuplicatePairs(Tables.documents(s, d), threshold = 0.5)
      .orderBy($"id_a", $"id_b")
  }
  // distinct word-3-gram set per doc; <3-token docs shingle to their whole
  // normalized text (list OOB indexing → NULL, which concat_ws skips)
  private[operators] def shSetSqlFrom(rel: String): String =
    s"""SELECT doc_id, list_distinct(list_transform(
       |    range(1, greatest(len($toksSql) - 2, 1) + 1),
       |    i -> concat_ws(' ', ($toksSql)[i], ($toksSql)[i+1], ($toksSql)[i+2]))) AS sh
       |  FROM $rel""".stripMargin
  private[operators] val shSetSql = shSetSqlFrom("documents")
  private val q41Sql =
    s"""WITH sh AS ($shSetSql)
       |SELECT id_a, id_b, jaccard FROM (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       |WHERE jaccard >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q42
  // Exact word-3-gram Jaccard on consecutive-id pairs — the verification
  // kernel of the dedup family, oracle-checked.
  private def q42(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sh = Tables.documents(s, d)
      .select($"doc_id", Dedup.shingles($"text").as("sh"))
    val a = sh.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
    val b = sh.select($"doc_id".as("id_b"), $"sh".as("sh_b"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select($"id_a", $"id_b", Dedup.jaccard($"sh_a", $"sh_b").as("j"))
      .orderBy($"id_a")
  }
  private val q42Sql =
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, greatest(len($toksSql) - 2, 1) + 1),
       |    i -> concat_ws(' ', ($toksSql)[i], ($toksSql)[i+1], ($toksSql)[i+2]))) AS sh
       |  FROM documents)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
       |       ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |            / len(list_distinct(list_concat(a.sh, b.sh))) END AS j
       |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
       |ORDER BY id_a""".stripMargin

  // ---------------------------------------------------------------- q43
  // Brute-force cosine top-10 for the first 10 vectors. Integer-quantized
  // arithmetic → exact cross-engine equality (see Similarity scaladoc).
  private def q43(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 10), k = 10)
      .orderBy($"qid", $"rn")
  }
  private[operators] val quantSql =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))"
  private val q43Sql =
    s"""WITH q AS (SELECT vec_id AS qid, $quantSql AS qv FROM embeddings WHERE vec_id < 10),
       |e AS (SELECT vec_id AS eid, $quantSql AS ev FROM embeddings),
       |sc AS (SELECT qid, eid,
       |    CAST(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*ev[i])) AS DOUBLE)
       |      / (sqrt(CAST(list_sum(list_transform(qv, x->x*x)) AS DOUBLE))
       |         * sqrt(CAST(list_sum(list_transform(ev, x->x*x)) AS DOUBLE))) AS cos
       |  FROM q, e WHERE qid <> eid)
       |SELECT qid, eid, cos, rn FROM (
       |  SELECT qid, eid, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, eid) AS INT) AS rn
       |  FROM sc) WHERE rn <= 10
       |ORDER BY qid, rn""".stripMargin

  // ---------------------------------------------------------------- q229
  // Hard-negative mining: top-5 most-similar DIFFERENT-label vectors per
  // probe — the contrastive-training negative sampler on top of q43's
  // machinery; the label exclusion runs inside the scoring kernel so
  // same-class twins never crowd out negatives. The probe panel is FIXED
  // (vec_id < 500 ∧ % 29): a modulo-only selection grows linearly with
  // the corpus and turns the |Q|·N kernel quadratic (measured 16 s at
  // 30× before pinning) — a probe set is an eval panel, not a sample.
  private def q229(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    Similarity.hardNegatives(emb,
        emb.filter($"vec_id" < 500 && $"vec_id" % 29 === 0), k = 5)
      .orderBy($"qid", $"rn")
  }
  private val q229Sql =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(label AS BIGINT) AS q_label,
       |    $quantSql AS qv FROM embeddings
       |    WHERE vec_id < 500 AND vec_id % 29 = 0),
       |e AS (SELECT vec_id AS eid, CAST(label AS BIGINT) AS e_label,
       |    $quantSql AS ev FROM embeddings),
       |sc AS (SELECT qid, q_label, eid, e_label,
       |    CAST(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*ev[i])) AS DOUBLE)
       |      / (sqrt(CAST(list_sum(list_transform(qv, x->x*x)) AS DOUBLE))
       |         * sqrt(CAST(list_sum(list_transform(ev, x->x*x)) AS DOUBLE))) AS cos
       |  FROM q, e WHERE q_label <> e_label)
       |SELECT qid, q_label, eid, e_label, cos, rn FROM (
       |  SELECT qid, q_label, eid, e_label, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, eid) AS INT) AS rn
       |  FROM sc) WHERE rn <= 5
       |ORDER BY qid, rn""".stripMargin

  // ---------------------------------------------------------------- q233
  // Two-NN intrinsic-dimension estimate (Facco et al. 2017): over the
  // q229 probe set, μ = d2/d1 of the two nearest cosine distances and
  // id ≈ n / Σ ln μ — "how many effective dimensions does the manifold
  // use", the capacity check before picking PQ/IVF parameters (q56/q53)
  // or a JL target dim (q192). Probes with an exact duplicate (d1 = 0)
  // are excluded, per the estimator's definition.
  private def q233(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val nn = Similarity.bruteForceTopK(emb,
        emb.filter($"vec_id" < 500 && $"vec_id" % 29 === 0), k = 2)
      .groupBy($"qid")
      .agg(max(when($"rn" === 1, $"cos")).as("c1"),
        max(when($"rn" === 2, $"cos")).as("c2"))
      // probe-panel-sized (≤18 rows) but its lineage is the FULL corpus
      // scoring scan — consumed twice below (probe count + valid sums),
      // so pin it or the corpus is scanned per consumer
      .localCheckpoint()
    val valid = nn.filter($"c1" < 1.0d)
      .select($"qid",
        floor(log((lit(1.0d) - $"c2") / (lit(1.0d) - $"c1")) * lit(1e9))
          .cast("long").as("lnmu_x9"))
    nn.agg(count(lit(1)).as("n_probes"))
      .crossJoin(valid.agg(count(lit(1)).as("n_valid"),
        sum($"lnmu_x9").as("sum_lnmu_x9")))
      .withColumn("id_x6",
        when($"sum_lnmu_x9" > 0L,
          floor($"n_valid".cast("double") /
            ($"sum_lnmu_x9".cast("double") / lit(1e9)) * lit(1e6))
            .cast("long")))
  }
  private val q233Sql =
    s"""WITH q AS (SELECT vec_id AS qid, $quantSql AS qv FROM embeddings
       |      WHERE vec_id < 500 AND vec_id % 29 = 0),
       |e AS (SELECT vec_id AS eid, $quantSql AS ev FROM embeddings),
       |sc AS (SELECT qid, eid,
       |    CAST(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*ev[i])) AS DOUBLE)
       |      / (sqrt(CAST(list_sum(list_transform(qv, x->x*x)) AS DOUBLE))
       |         * sqrt(CAST(list_sum(list_transform(ev, x->x*x)) AS DOUBLE))) AS cos
       |  FROM q, e WHERE qid <> eid),
       |r AS (SELECT qid, cos,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, eid) AS rn
       |  FROM sc),
       |nn AS (SELECT qid, MAX(CASE WHEN rn = 1 THEN cos END) AS c1,
       |    MAX(CASE WHEN rn = 2 THEN cos END) AS c2
       |  FROM r WHERE rn <= 2 GROUP BY qid),
       |v AS (SELECT qid,
       |    CAST(floor(ln((1 - c2) / (1 - c1)) * 1e9) AS BIGINT) AS lnmu_x9
       |  FROM nn WHERE c1 < 1),
       |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes FROM nn),
       |b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_valid,
       |    CAST(SUM(lnmu_x9) AS BIGINT) AS sum_lnmu_x9 FROM v)
       |SELECT n_probes, n_valid, sum_lnmu_x9,
       |  CASE WHEN sum_lnmu_x9 > 0 THEN
       |    CAST(floor(CAST(n_valid AS DOUBLE)
       |      / (CAST(sum_lnmu_x9 AS DOUBLE) / 1e9) * 1e6) AS BIGINT)
       |  END AS id_x6
       |FROM a CROSS JOIN b""".stripMargin

  // ---------------------------------------------------------------- q53
  // IVF-Flat at nprobe = nlist scans every list, so the ANN scale path's
  // whole machinery (sampled+Lloyd-refined quantizer, list assignment,
  // probe pruning, ranking) must reproduce the brute-force result exactly
  // — same oracle as q43 puts it under the hash gate.
  private def q53(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(emb, emb.filter($"vec_id" < 10), k = 10,
      nlist = 16, nprobe = 16, refineIters = 2)
      .orderBy($"qid", $"rn")
  }

  // ---------------------------------------------------------------- q44
  private def q44(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        TextAnalysis.tokenCount($"text").as("n_tokens"),
        TextAnalysis.subwordCountEstimate($"text").as("n_subwords"))
      .orderBy($"doc_id")
  }
  private val q44Sql =
    s"""SELECT doc_id,
       |  CASE WHEN trim(text) = '' OR text IS NULL THEN 0
       |       ELSE len($toksSql) END AS n_tokens,
       |  CASE WHEN trim(text) = '' OR text IS NULL THEN 0
       |       ELSE CAST(list_sum(list_transform($toksSql,
       |         t -> greatest(CAST(ceil(length(t)/6.0) AS BIGINT), 1))) AS BIGINT)
       |  END AS n_subwords
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q45
  private def q45(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val feats = TextAnalysis.qualityFeatures($"text")
    Tables.documents(s, d)
      .select(($"doc_id" +: feats.map { case (n, c) => c.as(n) } :+
        TextAnalysis.qualityScore($"text").as("quality")): _*)
      .orderBy($"doc_id")
  }
  private[operators] val qualitySql =
    s"""((CASE WHEN (CASE WHEN trim(text)='' OR text IS NULL THEN 0 ELSE len($toksSql) END) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END) * 0.3
       |  + (CASE WHEN CAST(length(replace($normSql, ' ', '')) AS DOUBLE) / greatest(CAST(CASE WHEN trim(text)='' OR text IS NULL THEN 0 ELSE len($toksSql) END AS DOUBLE), 1.0) BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END) * 0.3
       |  + least(CAST(len(list_filter($toksSql, t -> list_contains($allStopsSql, t))) AS DOUBLE) / greatest(CAST(CASE WHEN trim(text)='' OR text IS NULL THEN 0 ELSE len($toksSql) END AS DOUBLE), 1.0) * 5, 1.0) * 0.4)
       |  * (1.0 - least(
       |      CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0) * 5
       |      + CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0) * 5, 1.0))""".stripMargin
  private val q45Sql = {
    s"""SELECT doc_id,
       |  CAST(length(text) AS DOUBLE) AS n_chars,
       |  CAST(CASE WHEN trim(text)='' OR text IS NULL THEN 0 ELSE len($toksSql) END AS DOUBLE) AS n_tokens,
       |  CAST(length(replace($normSql, ' ', '')) AS DOUBLE)
       |    / greatest(CAST(CASE WHEN trim(text)='' OR text IS NULL THEN 0 ELSE len($toksSql) END AS DOUBLE), 1.0) AS avg_token_len,
       |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
       |    / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
       |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
       |    / greatest(CAST(length(text) AS DOUBLE), 1.0) AS digit_ratio,
       |  CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
       |    / greatest(CAST(length(text) AS DOUBLE), 1.0) AS upper_ratio,
       |  CAST(len(list_filter($toksSql, t -> list_contains($allStopsSql, t))) AS DOUBLE)
       |    / greatest(CAST(CASE WHEN trim(text)='' OR text IS NULL THEN 0 ELSE len($toksSql) END AS DOUBLE), 1.0) AS stopword_ratio,
  $qualitySql AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q46
  private def q46(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", TextAnalysis.langId($"text").as("pred_lang"))
      .orderBy($"doc_id")
  }
  private def hitsSql(lang: String): String = {
    val words = TextAnalysis.stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($toksSql, t -> list_contains($words, t)))"
  }
  private[operators] val predLangSql =
    s"""CASE WHEN greatest(${hitsSql("en")}, ${hitsSql("de")}, ${hitsSql("es")}, ${hitsSql("fr")}) = 0 THEN 'und'
       |     WHEN ${hitsSql("en")} >= ${hitsSql("de")} AND ${hitsSql("en")} >= ${hitsSql("es")} AND ${hitsSql("en")} >= ${hitsSql("fr")} THEN 'en'
       |     WHEN ${hitsSql("de")} >= ${hitsSql("es")} AND ${hitsSql("de")} >= ${hitsSql("fr")} THEN 'de'
       |     WHEN ${hitsSql("es")} >= ${hitsSql("fr")} THEN 'es'
       |     ELSE 'fr' END""".stripMargin
  private val q46Sql =
    s"""SELECT doc_id, $predLangSql AS pred_lang
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q231
  // Language-ID confusion matrix: declared label vs the q46 stopword-hit
  // classifier, with per-label share ppm — the "is the lang column
  // trustworthy / which languages does the heuristic confuse" audit
  // (e.g. zh has no stopword table, so it must land in 'und'). One
  // codegen projection + one grid-sized aggregate; shares are exact
  // integer ratios.
  private def q231(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cells = Tables.documents(s, d)
      .select($"lang", TextAnalysis.langId($"text").as("pred_lang"))
      .groupBy($"lang", $"pred_lang").agg(count(lit(1)).as("n"))
      .localCheckpoint() // grid-sized; feeds the marginal AND the output
    val tot = cells.groupBy($"lang").agg(sum($"n").as("tot"))
    cells.join(broadcast(tot), Seq("lang"))
      .select($"lang", $"pred_lang", $"n",
        expr("(n * 1000000L) div tot").as("share_ppm"))
      .orderBy($"lang", $"pred_lang")
  }
  private val q231Sql =
    s"""WITH p AS (SELECT lang, $predLangSql AS pred_lang FROM documents),
       |c AS (SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
       |      FROM p GROUP BY 1, 2),
       |t AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
       |SELECT lang, pred_lang, n, (n * 1000000) // tot AS share_ppm
       |FROM c JOIN t USING (lang) ORDER BY lang, pred_lang""".stripMargin

  // ---------------------------------------------------------------- q47
  private def q47(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .orderBy($"doc_id")
  }
  private val q47Sql =
    s"""SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split($normSql, ''), c -> CAST(ascii(c) AS BIGINT))),
       |    (acc, c) -> (acc*31 + c) % 9007199254740992) AS fp
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q48
  // SimHash near-dup pairs under a full all-pairs oracle: the md5 token
  // hash reproduces in DuckDB (md5_number_lower ≡ Dedup.md5Low64), and
  // 4 bands of 16 bits make banding lossless at hamming ≤ 3 (3 differing
  // bits touch ≤ 3 bands → every qualifying pair shares a band), so the
  // distributed LSH output EQUALS the quadratic all-pairs scan.
  private def q48(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // maxHamming=3 → 4 bands of 16 bits: the pigeonhole guarantee holds and
    // bands stay wide enough that bucket collisions don't explode (d=6
    // would need 8-bit bands — supported, but quadratically more candidates)
    Dedup.simhashDuplicatePairs(Tables.documents(s, d), maxHamming = 3,
        tokenHash = "md5")
      .orderBy($"id_a", $"id_b")
  }
  private val q48Sql =
    s"""WITH th AS (
       |  SELECT doc_id, md5_number_lower(unnest(string_split($normSql, ' '))) AS h
       |  FROM documents
       |), bits AS (
       |  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM th, range(64) r(b) GROUP BY doc_id, b
       |), sims AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN s > 0 THEN 1::UBIGINT << b ELSE 0::UBIGINT END) AS UBIGINT) AS sim
       |  FROM bits GROUP BY doc_id
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
       |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q49
  // Multimodal metadata over a binary column (media = utf8 bytes of text —
  // deterministic stand-in; see Multimodal scaladoc for the decode seam).
  private def q49(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select($"doc_id", encode($"text", "UTF-8").as("media"))
    Multimodal.withMediaMeta(media, "media")
      .select($"doc_id",
        $"media_meta.byte_len".as("byte_len"),
        $"media_meta.sha256".as("sha_hex"),
        $"media_meta.format".as("format"))
      .orderBy($"doc_id")
  }
  private val q49Sql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  sha256(text) AS sha_hex,
      |  'unknown' AS format
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q50
  // Embedding near-dup pairs, brute force on a bounded id range (the LSH
  // variant is the scale path; spec asserts recall agreement).
  private def q50(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sub = Tables.embeddings(s, d).filter($"vec_id" < 1000)
    Similarity.cosineNearDupPairs(sub, threshold = 0.3)
      .orderBy($"id_a", $"id_b")
  }
  private val q50Sql =
    s"""WITH v AS (SELECT vec_id, $quantSql AS qv FROM embeddings WHERE vec_id < 1000)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  CAST(list_sum(list_transform(range(1, len(a.qv)+1), i -> a.qv[i]*b.qv[i])) AS DOUBLE)
       |    / (sqrt(CAST(list_sum(list_transform(a.qv, x->x*x)) AS DOUBLE))
       |       * sqrt(CAST(list_sum(list_transform(b.qv, x->x*x)) AS DOUBLE))) AS cos
       |FROM v a JOIN v b ON a.vec_id < b.vec_id
       |WHERE CAST(list_sum(list_transform(range(1, len(a.qv)+1), i -> a.qv[i]*b.qv[i])) AS DOUBLE)
       |    / (sqrt(CAST(list_sum(list_transform(a.qv, x->x*x)) AS DOUBLE))
       |       * sqrt(CAST(list_sum(list_transform(b.qv, x->x*x)) AS DOUBLE))) >= 0.3
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q56
  // PQ-ADC with rerank ≥ |corpus| keeps every row as a candidate, so the
  // exact rerank must reproduce brute force bit-for-bit — codebook
  // training, encoding, ADC tables, heap selection and rerank all sit
  // under the same hash gate as q43/q53.
  private def q56(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    Similarity.pqTopK(emb, emb.filter($"vec_id" < 10), k = 10,
      m = 8, ksub = 16, trainIters = 2, rerank = Int.MaxValue)
      .orderBy($"qid", $"rn")
  }

  // ------------------------------------------------------------ q238/q239
  // ANN RECALL AUDITS at non-degenerate settings. q53/q56 hash-gate the
  // IVF/PQ kernels in exact regimes (nprobe=nlist, rerank≥|corpus|);
  // these two measure what the approximations actually cost: recall@10
  // of IVF at nprobe=4/16 (q238) and of PQ-ADC at rerank=40 with an
  // untrained (seeded-init) codebook (q239) against the brute-force
  // list. seedHash="md5" makes the centroid/codebook sample
  // relationally replayable (md5_number_lower order), so the ORACLE
  // re-derives the entire approximate pipeline — centroids, list
  // assignment, probes/codes, ADC tables, rerank — and recall is a
  // hash-gated integer per query, not a trust-me number.
  private def annRecallHits(s: SparkSession, emb: DataFrame,
      approx: DataFrame): DataFrame = {
    import s.implicits._
    val brute = Similarity
      .bruteForceTopK(emb, emb.filter($"vec_id" < 10), k = 10)
      .select($"qid", $"eid")
    val hits = brute.join(approx.select($"qid", $"eid"),
        Seq("qid", "eid"), "left_semi")
      .groupBy($"qid").agg(count(lit(1)).as("recall_hits_at_10"))
    emb.filter($"vec_id" < 10)
      .select($"vec_id".cast("long").as("qid"))
      .join(hits, Seq("qid"), "left")
      .select($"qid", coalesce($"recall_hits_at_10", lit(0L))
        .as("recall_hits_at_10"))
      .orderBy($"qid")
  }
  private def q238(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    annRecallHits(s, emb, Similarity.ivfTopK(emb,
      emb.filter($"vec_id" < 10), k = 10, nlist = 16, nprobe = 4,
      refineIters = 0, seedHash = "md5"))
  }
  /** Planted-cluster corpus derived BY SELECTION from the uniform
    * embeddings (no float arithmetic → bit-identical on both engines):
    * member v of cluster (vec_id % 16) = center's dims 1–56 ++ v's own
    * dims 57–64. Uniform-random embeddings are the worst case for
    * space-partitioning ANN (q238/q239's honest 0.31–0.52); real corpora
    * cluster, and this fixture measures the operators in that regime. */
  private def clusteredEmb(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // one parquet scan: centers + members both read the checkpoint, and
    // the derived table checkpoints once for its many audit consumers
    // (queries, corpus passes, seeds, brute force) — a |corpus|-row
    // fixture frame, the cheapest thing in the query
    val emb = Tables.embeddings(s, d).localCheckpoint()
    val centers = emb.filter($"vec_id" < 16)
      .select(($"vec_id" % 16).as("cl"), $"embedding".as("cv"))
    emb.select($"vec_id", ($"vec_id" % 16).as("cl"), $"embedding")
      .join(broadcast(centers), Seq("cl"))
      .select($"vec_id",
        concat(slice($"cv", 1, 56), slice($"embedding", 57, 8))
          .as("embedding"))
      .localCheckpoint()
  }
  // IVF recall on the clustered corpus, SAME settings as q238
  // (nlist=16, nprobe=4, seeded centroids): the regime where IVF is
  // supposed to work — recall measured and hash-gated
  private def q253(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = clusteredEmb(s, d)
    annRecallHits(s, emb, Similarity.ivfTopK(emb,
      emb.filter($"vec_id" < 10), k = 10, nlist = 16, nprobe = 4,
      refineIters = 0, seedHash = "md5"))
  }
  // TRAINED PQ recall on the clustered corpus, same rerank=40 as q239 —
  // one Lloyd iteration (replayed exactly by the oracle) vs q239's
  // seeded-init codebooks
  private def q254(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = clusteredEmb(s, d)
    annRecallHits(s, emb, Similarity.pqTopK(emb,
      emb.filter($"vec_id" < 10), k = 10, m = 8, ksub = 16,
      trainIters = 1, rerank = 40, seedHash = "md5"))
  }
  // SQ8 recall audit on the UNIFORM corpus: global per-dim extrema →
  // 8-bit affine codes → int-code dot scan → exact rerank at 40 (q239's
  // setting). Scalar quantization preserves geometry far better than
  // space partitioning on uniform data, so this audits the complementary
  // regime to q253/q254. The oracle replays extrema, coding, approx scan,
  // and rerank in the same integer arithmetic.
  private def q256(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    annRecallHits(s, emb, Similarity.sq8TopK(emb,
      emb.filter($"vec_id" < 10), k = 10, rerank = 40))
  }
  private def q239(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    annRecallHits(s, emb, Similarity.pqTopK(emb,
      emb.filter($"vec_id" < 10), k = 10, m = 8, ksub = 16,
      trainIters = 0, rerank = 40, seedHash = "md5"))
  }

  // ------------------------------------------------------------ q277/q278
  // PERSISTED-INDEX parity (the serving shape: index once, probe many).
  // Build the IVF/PQ artifact to parquet, then answer from the LOADED
  // index at exactly q238's/q239's settings — probe-of-loaded is
  // bit-identical to the fresh one-shot operator (AnnIndexSpec pins full
  // result equality; these gate recall THROUGH the store round-trip
  // against the SAME oracle replay as q238/q239, so a single lost or
  // re-quantized posting row flips the hash). The store dir is keyed on
  // the data dir and overwritten per call — re-runs are idempotent.
  private def annIndexDir(d: String, kind: String): String = {
    // String.hashCode is spec-pinned — the same data dir always maps to
    // the same store dir, so re-runs overwrite their own artifact
    val tag = java.lang.Integer.toHexString(d.hashCode)
    s"${System.getProperty("java.io.tmpdir")}/graft_annidx_$tag/$kind"
  }
  private def q277(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val dir = annIndexDir(d, "ivf")
    AnnIndex.ivfBuild(emb, dir, nlist = 16, refineIters = 0,
      seedHash = "md5")
    annRecallHits(s, emb, AnnIndex.ivfProbe(s, dir,
      emb.filter($"vec_id" < 10), k = 10, nprobe = 4))
  }
  private def q278(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val dir = annIndexDir(d, "pq")
    AnnIndex.pqBuild(emb, dir, m = 8, ksub = 16, trainIters = 0,
      seedHash = "md5")
    annRecallHits(s, emb, AnnIndex.pqProbe(s, dir, emb,
      emb.filter($"vec_id" < 10), k = 10, rerank = 40))
  }
  // ---------------------------------------------------------------- q280
  // INCREMENTAL-ADD gate for the persisted IVF index: build on the even
  // half, ivfAdd the odd half (frozen quantizer, batch-keyed store),
  // probe at nprobe = nlist — the exact regime (every posting scores),
  // where the result must be bit-identical to brute force over the
  // UNION (q43's oracle). One lost, duplicated, or re-quantized posting
  // row across the two batches flips the hash.
  private def q280(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val dir = annIndexDir(d, "ivf_inc")
    AnnIndex.ivfBuild(emb.filter($"vec_id" % 2 === 0), dir, nlist = 16,
      seedHash = "md5")
    AnnIndex.ivfAdd(emb.filter($"vec_id" % 2 === 1), dir, batchId = 1L)
    AnnIndex.ivfProbe(s, dir, emb.filter($"vec_id" < 10), k = 10,
      nprobe = 16)
      .orderBy($"qid", $"rn")
  }
  // shared oracle scaffolding: quantized corpus/queries + the 16
  // md5-ordered seed rows (cid = 0-based hash-order rank) + exact norms;
  // parameterized over the corpus CTE so the planted-cluster audits
  // (q253/q254) can run the identical pipeline on a derived table
  private def annAuditPreludeOn(tbl: String, pre: String = "",
      nseed: Int = 16): String =
    s"""WITH ${pre}q AS (SELECT vec_id AS qid, $quantSql AS qv FROM $tbl
       |  WHERE vec_id < 10),
       |e AS (SELECT vec_id AS eid, $quantSql AS ev FROM $tbl),
       |ini AS (SELECT row_number() OVER (
       |      ORDER BY md5_number_lower(CAST(vec_id AS VARCHAR))) - 1 AS cid,
       |    $quantSql AS iv
       |  FROM $tbl
       |  ORDER BY md5_number_lower(CAST(vec_id AS VARCHAR)) LIMIT $nseed),
       |en AS (SELECT eid, CAST(list_sum(list_transform(ev, x->x*x))
       |    AS DOUBLE) AS nrm FROM e),
       |qn AS (SELECT qid, CAST(list_sum(list_transform(qv, x->x*x))
       |    AS DOUBLE) AS nrm FROM q),
       |bt AS (SELECT qid, eid FROM (
       |    SELECT q.qid, e.eid, CAST(ROW_NUMBER() OVER (PARTITION BY q.qid
       |        ORDER BY CAST(list_sum(list_transform(range(1, len(qv)+1),
       |          i -> qv[i]*ev[i])) AS DOUBLE)
       |          / (sqrt(qn.nrm) * sqrt(en.nrm)) DESC, e.eid) AS INT) AS rn
       |    FROM q JOIN qn USING (qid), e JOIN en USING (eid)
       |    WHERE q.qid <> e.eid) WHERE rn <= 10)""".stripMargin
  private val annAuditPrelude = annAuditPreludeOn("embeddings")
  // planted-cluster corpus DERIVED BY SELECTION from the uniform table —
  // no float arithmetic, so both engines see bit-identical vectors:
  // member v of cluster (vec_id % 16) = the cluster center's dims 1..56
  // ++ v's own dims 57..64 (within-cluster cosine ≈ 56/64, cross ≈ 0)
  private val clusterCtes =
    """ce AS (SELECT vec_id % 16 AS cl, embedding AS cv
      |       FROM embeddings WHERE vec_id < 16),
      |emb2 AS (SELECT e0.vec_id,
      |    list_concat(ce.cv[1:56], e0.embedding[57:64]) AS embedding
      |  FROM embeddings e0 JOIN ce ON e0.vec_id % 16 = ce.cl),
      |""".stripMargin
  private val annAuditEpilogue =
    """SELECT bt.qid, CAST(COUNT(ap.eid) AS BIGINT) AS recall_hits_at_10
      |FROM bt LEFT JOIN ap ON ap.qid = bt.qid AND ap.eid = bt.eid
      |GROUP BY bt.qid ORDER BY bt.qid""".stripMargin
  // IVF audit body — references only prelude CTE names plus a caller-
  // supplied `cn AS (cid, iv, nrm)` centroid CTE, so it runs unchanged on
  // the uniform (q238), planted-cluster (q253) and Lloyd-refined (q266)
  // quantizers
  private val ivfSeedCn =
    """cn AS (SELECT cid, iv, CAST(list_sum(list_transform(iv, x->x*x))
      |    AS DOUBLE) AS nrm FROM ini)""".stripMargin
  // one exact Lloyd iteration cn{k-1} → cn{k} (Similarity.lloydRefine):
  // every corpus vector joins its nearest centroid by exact quantized
  // COSINE (zero norms rank last, ties → lower cid — nearestCentroids'
  // order), new component = floor(sum/count + 0.5) in milli-units, empty
  // centroids keep their previous vector
  private def ivfLloydIter(k: Int): String = {
    val prev = s"cn${k - 1}"
    s"""asgI_$k AS (SELECT eid, cid FROM (
       |    SELECT e.eid, c.cid, ROW_NUMBER() OVER (PARTITION BY e.eid
       |        ORDER BY CASE WHEN en.nrm = 0 OR c.nrm = 0 THEN 0.0
       |          ELSE CAST(list_sum(list_transform(range(1, len(ev)+1),
       |            i -> ev[i]*c.iv[i])) AS DOUBLE)
       |            / (sqrt(en.nrm) * sqrt(c.nrm)) END DESC, c.cid) AS rn
       |    FROM e JOIN en USING (eid), $prev c) WHERE rn = 1),
       |updI_$k AS (SELECT a.cid, t.i,
       |    CAST(floor(CAST(SUM(e.ev[t.i]) AS DOUBLE) / COUNT(*)
       |      + 0.5) AS BIGINT) AS comp
       |  FROM asgI_$k a JOIN e USING (eid), UNNEST(range(1, 65)) AS t(i)
       |  GROUP BY a.cid, t.i),
       |nvI_$k AS (SELECT cid, list(comp ORDER BY i) AS iv
       |       FROM updI_$k GROUP BY cid),
       |cn$k AS (SELECT c.cid, COALESCE(n.iv, c.iv) AS iv,
       |    CAST(list_sum(list_transform(COALESCE(n.iv, c.iv), x->x*x))
       |      AS DOUBLE) AS nrm
       |  FROM $prev c LEFT JOIN nvI_$k n USING (cid))""".stripMargin
  }
  private val ivfScanBody =
    """asg AS (SELECT eid, cid FROM (
      |    SELECT e.eid, cn.cid, ROW_NUMBER() OVER (PARTITION BY e.eid
      |        ORDER BY CASE WHEN en.nrm = 0 OR cn.nrm = 0 THEN 0.0
      |          ELSE CAST(list_sum(list_transform(range(1, len(ev)+1),
      |            i -> ev[i]*iv[i])) AS DOUBLE)
      |            / (sqrt(en.nrm) * sqrt(cn.nrm)) END DESC, cn.cid) AS rn
      |    FROM e JOIN en USING (eid), cn) WHERE rn = 1),
      |prb AS (SELECT qid, cid FROM (
      |    SELECT q.qid, cn.cid, ROW_NUMBER() OVER (PARTITION BY q.qid
      |        ORDER BY CASE WHEN qn.nrm = 0 OR cn.nrm = 0 THEN 0.0
      |          ELSE CAST(list_sum(list_transform(range(1, len(qv)+1),
      |            i -> qv[i]*iv[i])) AS DOUBLE)
      |            / (sqrt(qn.nrm) * sqrt(cn.nrm)) END DESC, cn.cid) AS rn
      |    FROM q JOIN qn USING (qid), cn) WHERE rn <= 4),
      |ap AS (SELECT qid, eid FROM (
      |    SELECT p.qid, e.eid, ROW_NUMBER() OVER (PARTITION BY p.qid
      |        ORDER BY CAST(list_sum(list_transform(range(1, len(qv)+1),
      |          i -> qv[i]*ev[i])) AS DOUBLE)
      |          / (sqrt(qn.nrm) * sqrt(en.nrm)) DESC, e.eid) AS rn
      |    FROM prb p JOIN asg a USING (cid)
      |      JOIN e ON e.eid = a.eid JOIN en ON en.eid = e.eid
      |      JOIN q ON q.qid = p.qid JOIN qn ON qn.qid = p.qid
      |    WHERE e.eid <> p.qid) WHERE rn <= 10)""".stripMargin
  private val ivfAuditBody =
    s"""$ivfSeedCn,
       |$ivfScanBody""".stripMargin
  private val q238Sql =
    s"""$annAuditPrelude,
       |$ivfAuditBody
       |$annAuditEpilogue""".stripMargin
  private val q253Sql =
    s"""${annAuditPreludeOn("emb2", clusterCtes)},
       |$ivfAuditBody
       |$annAuditEpilogue""".stripMargin
  // PQ audit body parameterized over the codebook CTE name (`bk` for the
  // untrained q239 path, `bk1` for q254's one-Lloyd-iteration codebooks)
  private def pqAuditBody(bk: String) =
    s"""cod AS (SELECT eid, s, cid AS code FROM (
       |    SELECT e.eid, $bk.s, $bk.cid, ROW_NUMBER() OVER (
       |        PARTITION BY e.eid, $bk.s ORDER BY
       |        list_sum(list_transform(range(1, 9),
       |          i -> (ev[$bk.s*8 + i] - bv[i])*(ev[$bk.s*8 + i] - bv[i]))),
       |        $bk.cid) AS rn
       |    FROM e, $bk) WHERE rn = 1),
       |tab AS (SELECT q.qid, $bk.s, $bk.cid,
       |    list_sum(list_transform(range(1, 9),
       |      i -> q.qv[$bk.s*8 + i] * bv[i])) AS d
       |  FROM q, $bk),
       |apx AS (SELECT t.qid, c.eid, SUM(t.d) AS approx
       |  FROM cod c JOIN tab t ON t.s = c.s AND t.cid = c.code
       |  GROUP BY t.qid, c.eid),
       |cand AS (SELECT qid, eid FROM (
       |    SELECT x.qid, x.eid, ROW_NUMBER() OVER (PARTITION BY x.qid
       |        ORDER BY CASE WHEN qn.nrm = 0 OR en.nrm = 0 THEN 0.0
       |          ELSE CAST(x.approx AS DOUBLE)
       |            / (sqrt(qn.nrm) * sqrt(en.nrm)) END DESC, x.eid) AS rn
       |    FROM apx x JOIN qn USING (qid) JOIN en USING (eid)
       |    WHERE x.eid <> x.qid) WHERE rn <= 40),
       |ap AS (SELECT qid, eid FROM (
       |    SELECT c.qid, c.eid, ROW_NUMBER() OVER (PARTITION BY c.qid
       |        ORDER BY CAST(list_sum(list_transform(range(1, len(qv)+1),
       |          i -> qv[i]*ev[i])) AS DOUBLE)
       |          / (sqrt(qn.nrm) * sqrt(en.nrm)) DESC, c.eid) AS rn
       |    FROM cand c JOIN q ON q.qid = c.qid JOIN qn ON qn.qid = c.qid
       |      JOIN e ON e.eid = c.eid JOIN en ON en.eid = c.eid) WHERE rn <= 10)""".stripMargin
  // seeded-init codebooks: 16 md5-ordered rows split into 8 subspaces
  private val pqInitBk = (name: String) =>
    s"""$name AS (SELECT cid, s, list_transform(range(1, 9),
       |      i -> iv[s*8 + i]) AS bv
       |    FROM ini, UNNEST(range(8)) AS t(s))""".stripMargin
  private val q239Sql =
    s"""$annAuditPrelude,
       |${pqInitBk("bk")},
       |${pqAuditBody("bk")}
       |$annAuditEpilogue""".stripMargin
  // SQ8 audit body: per-dim corpus extrema (zipped parallel unnest),
  // affine 8-bit coding + integer DEQUANTIZATION of corpus AND probes
  // against the same extrema (code = clamp((q−mn)·255 // (mx−mn));
  // recon = mn + (code·(mx−mn)) // 255 — the operator's exact integer
  // chain; clamp is identity for in-corpus probes but mirrored anyway),
  // reconstructed-cosine approx scan, exact-cosine rerank at 40
  private val sq8AuditBody =
    """u AS (SELECT i, CAST(MIN(v) AS BIGINT) AS mn,
      |    CAST(MAX(v) AS BIGINT) AS mx FROM
      |  (SELECT unnest(ev) AS v, unnest(range(1, len(ev)+1)) AS i FROM e)
      |  GROUP BY i),
      |b AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
      |  FROM u),
      |ec AS (SELECT eid, list_transform(range(1, len(ev)+1),
      |    i -> CASE WHEN b.mxs[i] <= b.mns[i] THEN b.mns[i]
      |         ELSE b.mns[i] + (GREATEST(0, LEAST(255,
      |             ((ev[i] - b.mns[i]) * 255) // (b.mxs[i] - b.mns[i])))
      |           * (b.mxs[i] - b.mns[i])) // 255 END)
      |    AS rv FROM e, b),
      |ecn AS (SELECT eid, CAST(list_sum(list_transform(rv, x->x*x))
      |    AS DOUBLE) AS nrm FROM ec),
      |qc AS (SELECT qid, list_transform(range(1, len(qv)+1),
      |    i -> CASE WHEN b.mxs[i] <= b.mns[i] THEN b.mns[i]
      |         ELSE b.mns[i] + (GREATEST(0, LEAST(255,
      |             ((qv[i] - b.mns[i]) * 255) // (b.mxs[i] - b.mns[i])))
      |           * (b.mxs[i] - b.mns[i])) // 255 END)
      |    AS qrv FROM q, b),
      |qcn AS (SELECT qid, CAST(list_sum(list_transform(qrv, x->x*x))
      |    AS DOUBLE) AS nrm FROM qc),
      |s8 AS (SELECT qc.qid, ec.eid,
      |    CASE WHEN qcn.nrm = 0 OR ecn.nrm = 0 THEN 0.0
      |      ELSE CAST(list_sum(list_transform(range(1, len(qrv)+1),
      |        i -> qrv[i]*rv[i])) AS DOUBLE)
      |        / (sqrt(qcn.nrm) * sqrt(ecn.nrm)) END AS approx
      |  FROM qc JOIN qcn USING (qid), ec JOIN ecn USING (eid)
      |  WHERE qc.qid <> ec.eid),
      |cand AS (SELECT qid, eid FROM (
      |    SELECT qid, eid, ROW_NUMBER() OVER (PARTITION BY qid
      |        ORDER BY approx DESC, eid) AS rn FROM s8) WHERE rn <= 40),
      |ap AS (SELECT qid, eid FROM (
      |    SELECT c.qid, c.eid, ROW_NUMBER() OVER (PARTITION BY c.qid
      |        ORDER BY CASE WHEN qn.nrm = 0 OR en.nrm = 0 THEN 0.0
      |          ELSE CAST(list_sum(list_transform(range(1, len(qv)+1),
      |            i -> qv[i]*ev[i])) AS DOUBLE)
      |            / (sqrt(qn.nrm) * sqrt(en.nrm)) END DESC, c.eid) AS rn
      |    FROM cand c JOIN q ON q.qid = c.qid JOIN qn ON qn.qid = c.qid
      |      JOIN e ON e.eid = c.eid JOIN en ON en.eid = c.eid)
      |  WHERE rn <= 10)""".stripMargin
  private val q256Sql =
    s"""$annAuditPrelude,
       |$sq8AuditBody
       |$annAuditEpilogue""".stripMargin
  // one exact Lloyd iteration bk{k-1} → bk{k} (Similarity.pqTrain, full
  // corpus — n ≤ trainSampleMax at every oracle SF, so no sampling CTE):
  // assign every corpus subvector to its nearest codeword (L2, ties →
  // lower cid, exactly nearestSub), then new centroid component =
  // floor(sum/count + 0.5); empty codewords keep their previous value
  // (the JVM fallback). Unrolled once by q254, three times by q265.
  private def pqLloydIter(k: Int): String = {
    val prev = s"bk${k - 1}"
    s"""asg_$k AS (SELECT eid, s, cid AS code FROM (
       |    SELECT e.eid, $prev.s, $prev.cid, ROW_NUMBER() OVER (
       |        PARTITION BY e.eid, $prev.s ORDER BY
       |        list_sum(list_transform(range(1, 9),
       |          i -> (ev[$prev.s*8 + i] - bv[i])*(ev[$prev.s*8 + i] - bv[i]))),
       |        $prev.cid) AS rn
       |    FROM e, $prev) WHERE rn = 1),
       |upd_$k AS (SELECT a.s, a.code AS cid, t.i,
       |    CAST(floor(CAST(SUM(e.ev[a.s*8 + t.i]) AS DOUBLE) / COUNT(*)
       |      + 0.5) AS BIGINT) AS comp
       |  FROM asg_$k a JOIN e USING (eid), UNNEST(range(1, 9)) AS t(i)
       |  GROUP BY a.s, a.code, t.i),
       |nv_$k AS (SELECT s, cid, list(comp ORDER BY i) AS bv
       |       FROM upd_$k GROUP BY s, cid),
       |bk$k AS (SELECT b.cid, b.s, COALESCE(n.bv, b.bv) AS bv
       |        FROM $prev b LEFT JOIN nv_$k n
       |          ON n.s = b.s AND n.cid = b.cid)""".stripMargin
  }
  private val q254Sql =
    s"""${annAuditPreludeOn("emb2", clusterCtes)},
       |${pqInitBk("bk0")},
       |${pqLloydIter(1)},
       |${pqAuditBody("bk1")}
       |$annAuditEpilogue""".stripMargin

  // ------------------------------------------------------------ q265/q266
  // ANN AT PRODUCTION TRAINING SETTINGS (the round-7 verdict's item #7):
  // q254 measured trained-PQ recall 0.82 at sf0.1 with ONE Lloyd
  // iteration; q265 runs the production trainIters=3 (all three
  // iterations unrolled in the oracle) at the same rerank=40. q266 runs
  // IVF with a Lloyd-REFINED quantizer (refineIters=2) at the same
  // nprobe=4 as q253. Both hash-gate per-query recall integers on the
  // planted-cluster corpus — the measured recall/cost table lives in
  // SCALE.md round-8.
  private def q265(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = clusteredEmb(s, d)
    annRecallHits(s, emb, Similarity.pqTopK(emb,
      emb.filter($"vec_id" < 10), k = 10, m = 8, ksub = 16,
      trainIters = 3, rerank = 40, seedHash = "md5"))
  }
  private val q265Sql =
    s"""${annAuditPreludeOn("emb2", clusterCtes)},
       |${pqInitBk("bk0")},
       |${pqLloydIter(1)},
       |${pqLloydIter(2)},
       |${pqLloydIter(3)},
       |${pqAuditBody("bk3")}
       |$annAuditEpilogue""".stripMargin
  // PQ at PRODUCTION RECALL, same rerank=40: the trainIters curve
  // saturates at 0.87–0.88 (SCALE.md round-8 table — iterations are not
  // the binding constraint), but CODEBOOK RESOLUTION is: ksub=32 at the
  // same rerank measures 0.94. Hash-gated like its siblings.
  private def q267(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = clusteredEmb(s, d)
    annRecallHits(s, emb, Similarity.pqTopK(emb,
      emb.filter($"vec_id" < 10), k = 10, m = 8, ksub = 32,
      trainIters = 3, rerank = 40, seedHash = "md5"))
  }
  private val q267Sql =
    s"""${annAuditPreludeOn("emb2", clusterCtes, nseed = 32)},
       |${pqInitBk("bk0")},
       |${pqLloydIter(1)},
       |${pqLloydIter(2)},
       |${pqLloydIter(3)},
       |${pqAuditBody("bk3")}
       |$annAuditEpilogue""".stripMargin
  private def q266(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = clusteredEmb(s, d)
    annRecallHits(s, emb, Similarity.ivfTopK(emb,
      emb.filter($"vec_id" < 10), k = 10, nlist = 16, nprobe = 4,
      refineIters = 2, seedHash = "md5"))
  }
  private val q266Sql =
    s"""${annAuditPreludeOn("emb2", clusterCtes)},
       |cn0 AS (SELECT cid, iv, CAST(list_sum(list_transform(iv, x->x*x))
       |    AS DOUBLE) AS nrm FROM ini),
       |${ivfLloydIter(1)},
       |${ivfLloydIter(2)},
       |cn AS (SELECT cid, iv, nrm FROM cn2),
       |$ivfScanBody
       |$annAuditEpilogue""".stripMargin

  // ---------------------------------------------------------------- q54
  // Repetition signals (Gopher-style quality filters).
  private def q54(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    TextAnalysis.repetitionSignals(Tables.documents(s, d)).orderBy($"doc_id")
  }
  private val q54Sql =
    s"""WITH t AS (SELECT doc_id, $toksSql AS l FROM documents),
       |tc AS (SELECT doc_id, tk, count(*) AS c
       |       FROM (SELECT doc_id, unnest(l) AS tk FROM t) GROUP BY doc_id, tk),
       |ts AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |         CAST(COUNT(*) AS BIGINT) AS n_types,
       |         CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_token_frac,
       |         1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_token_frac
       |       FROM tc GROUP BY doc_id),
       |bc AS (SELECT doc_id, g, count(*) AS c
       |       FROM (SELECT doc_id, unnest(list_transform(range(1, len(l)),
       |               i -> l[i] || ' ' || l[i+1])) AS g FROM t) GROUP BY doc_id, g),
       |bs AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_bigram_frac
       |       FROM bc GROUP BY doc_id)
       |SELECT ts.doc_id, n_tokens, n_types, top_token_frac, dup_token_frac,
       |  COALESCE(top_bigram_frac, 0.0) AS top_bigram_frac
       |FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
       |ORDER BY ts.doc_id""".stripMargin

  // ---------------------------------------------------------------- q55
  // Corpus-level boilerplate: fraction of each doc's distinct 3-grams with
  // document frequency ≥ 2.
  private def q55(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    TextAnalysis.commonNgramStats(Tables.documents(s, d), minDf = 2).orderBy($"doc_id")
  }
  private val q55Sql =
    s"""WITH sh AS ($shSetSql),
       |ids AS (SELECT doc_id, unnest(sh) AS g FROM sh),
       |df AS (SELECT g, count(*) AS df FROM ids GROUP BY g)
       |SELECT ids.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |  CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS common_frac
       |FROM ids JOIN df ON ids.g = df.g
       |GROUP BY ids.doc_id
       |ORDER BY ids.doc_id""".stripMargin

  // ---------------------------------------------------------------- q57
  // Content-keyed train/val/test split (80/10/10) — stable under
  // re-partitioning and ingestion order; oracle reuses q47's cross-engine
  // fingerprint parity.
  private def q57(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        TextAnalysis.splitBucket($"text").as("bucket"),
        TextAnalysis.splitLabel($"text").as("split"))
      .orderBy($"doc_id")
  }
  /** DuckDB replica of RollingFingerprint over an arbitrary string
    * expression: (acc*31 + codepoint) mod 2^53. */
  private[operators] def fpSqlOf(e: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))),
       |    (acc, c) -> (acc*31 + c) % 9007199254740992)""".stripMargin
  private[operators] val fpSql = fpSqlOf(normSql)
  private val q57Sql =
    s"""SELECT doc_id, $fpSql % 100 AS bucket,
       |  CASE WHEN $fpSql % 100 < 80 THEN 'train'
       |       WHEN $fpSql % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q58
  // Deterministic stratified sampling: downsample dominant event classes by
  // a content-keyed hash (reproducible under retries/repartitioning, unlike
  // rand()); the oracle replays the same fingerprint arithmetic.
  private def q58(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Sampling.stratifiedSample(Tables.events(s, d), $"event_type", $"event_id",
        rates = Map("view" -> 5, "click" -> 25, "error" -> 100), defaultPct = 50)
      .select($"event_id", $"event_type")
      .orderBy($"event_id")
  }
  private val q58Sql = {
    val fp = fpSqlOf("CAST(event_id AS VARCHAR)")
    s"""SELECT event_id, event_type FROM events
       |WHERE $fp % 100 <
       |  (CASE event_type WHEN 'view' THEN 5 WHEN 'click' THEN 25
       |                   WHEN 'error' THEN 100 ELSE 50 END)
       |ORDER BY event_id""".stripMargin
  }

  // ---------------------------------------------------------------- q59
  // Batch sessionization by 30-min inactivity gap: one shuffle on the user
  // key serves both the lag and the running session counter (µs grain —
  // the cross-engine parity grain for the ns-sourced timestamps).
  private def q59(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Sessionize.byGap(Tables.events(s, d), gapSeconds = 1800)
      .select($"user_id", $"event_id", $"session_idx")
      .orderBy($"user_id", $"event_id")
  }
  private val q59Sql =
    """SELECT user_id, event_id, CAST(session_idx AS BIGINT) AS session_idx FROM (
      |  SELECT user_id, event_id,
      |    SUM(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM (SELECT user_id, event_id, ts,
      |          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |        FROM events))
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q60
  // Exact dedup-cluster canonicalization: connected components by min-label
  // propagation over the verified minhash pair set (greedy pair-drop
  // over-deletes on chained clusters). The oracle recomputes components
  // with a recursive transitive-closure CTE over the all-pairs jaccard.
  private def q60(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // fused path: rep-graph components + member fan-back — identical to
    // connectedComponents(minhashDuplicatePairs(...)), never materializing
    // the clone-expanded pair cliques (DedupSpec pins the equivalence)
    Dedup.dedupClusters(Tables.documents(s, d), threshold = 0.5)
      .select($"id".as("doc_id"), $"component".as("component_id"))
      .orderBy($"doc_id")
  }
  private val q60Sql =
    s"""WITH RECURSIVE sh AS ($shSetSql),
       |pairs AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |        / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
       |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       |  WHERE jaccard >= 0.5),
       |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
       |          UNION SELECT id_b, id_a FROM pairs),
       |reach(id, lbl) AS (
       |  SELECT u, u FROM edges
       |  UNION
       |  SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.id)
       |SELECT id AS doc_id, MIN(lbl) AS component_id FROM reach GROUP BY id
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q61
  // PII scrub + counts: regexp chain in the RE2 ∩ java.util.regex common
  // subset, so both engines run the IDENTICAL patterns.
  private def q61(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pii = TextAnalysis.piiCounts($"text").map { case (n, c) => c.as(n) }
    Tables.documents(s, d)
      .select(col("doc_id") +: TextAnalysis.scrubPii($"text").as("scrubbed") +: pii: _*)
      .orderBy($"doc_id")
  }
  private val q61Sql = {
    val email = TextAnalysis.emailRe
    val url = TextAnalysis.urlRe
    val digits = TextAnalysis.longDigitsRe
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$email', '<EMAIL>', 'g'), '$url', '<URL>', 'g'), '$digits', '<ID>', 'g') AS scrubbed,
       |  CAST(len(regexp_extract_all(text, '$email')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$url')) AS INTEGER) AS n_urls,
       |  CAST(len(regexp_extract_all(text, '$digits')) AS INTEGER) AS n_long_digits
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q62
  // Multimodal frame sampling: every 4th 64-byte pseudo-frame off the
  // binary media column (distributed flatMap — the real demuxer drops into
  // the same seam). Media is utf8 bytes of ASCII text, so the oracle can
  // replay frames with character substring + md5 on the varchar side.
  private def q62(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select($"doc_id", encode($"text", "UTF-8").as("media"))
    Multimodal.sampleFrames(media, "doc_id", "media", frameBytes = 64, stride = 4)
      .select($"doc_id", $"frame_index",
        length($"frame_bytes").cast("int").as("n_bytes"),
        md5($"frame_bytes").as("frame_md5"))
      .orderBy($"doc_id", $"frame_index")
  }
  private val q62Sql =
    """SELECT doc_id, CAST(i AS INTEGER) AS frame_index,
      |  CAST(strlen(substring(text, CAST(i*64+1 AS BIGINT), 64)) AS INTEGER) AS n_bytes,
      |  md5(substring(text, CAST(i*64+1 AS BIGINT), 64)) AS frame_md5
      |FROM (SELECT doc_id, text,
      |        unnest(range(0, CAST(ceil(strlen(text)/64.0) AS BIGINT))) AS i
      |      FROM documents)
      |WHERE i % 4 = 0
      |ORDER BY doc_id, frame_index""".stripMargin

  // ---------------------------------------------------------------- q63
  // Per-doc top-3 distinctive terms by tf·idf-rank. Integer-exact ranking:
  // floor(tf·10^6 / df) keeps the score order cross-engine-identical (no
  // log(), whose last-ulp differs between libm builds). Plan shape: one
  // token explode feeds BOTH aggregations (tf partial-aggregates map-side;
  // df is (term, distinct-doc) — fixed-width rows, never text), then a
  // term-keyed join and a per-doc window.
  private def q63(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    TextAnalysis.distinctiveTerms(Tables.documents(s, d), topK = 3)
      .orderBy($"doc_id", $"rn")
  }
  private val q63Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
       |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term)
       |SELECT doc_id, term, tf, df, rn FROM (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
       |      ORDER BY floor(CAST(tf.tf*1000000 AS DOUBLE)/df.df) DESC, tf.term) AS INT) AS rn
       |  FROM tf JOIN df ON tf.term = df.term)
       |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin

  // ---------------------------------------------------------------- q206
  // Flesch reading-ease audit per document: vowel-run syllables,
  // sentence runs floored at 1, quantized fixed-tree score — the
  // readability gate beside the quality/repetition signals. Pure
  // projection: the whole audit rides the documents scan.
  private def q206(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cols = TextAnalysis.readability($"text")
    Tables.documents(s, d)
      .select($"doc_id" +: cols.map { case (n, c) => c.as(n) }: _*)
      .orderBy($"doc_id")
  }
  private val q206Sql =
    s"""SELECT doc_id,
       |  CAST(CASE WHEN trim(text) = '' OR text IS NULL THEN 0
       |       ELSE len($toksSql) END AS BIGINT) AS n_words,
       |  CAST(len(regexp_extract_all(lower(COALESCE(text, '')), '[aeiouy]+'))
       |    AS BIGINT) AS n_syllables,
       |  greatest(CAST(len(regexp_extract_all(COALESCE(text, ''), '[.!?]+'))
       |    AS BIGINT), 1) AS n_sentences,
       |  CASE WHEN (CASE WHEN trim(text) = '' OR text IS NULL THEN 0
       |       ELSE len($toksSql) END) > 0 THEN
       |    CAST(floor((206.835
       |      - 1.015 * (CAST(CASE WHEN trim(text) = '' OR text IS NULL THEN 0
       |          ELSE len($toksSql) END AS DOUBLE)
       |        / CAST(greatest(len(regexp_extract_all(COALESCE(text, ''),
       |            '[.!?]+')), 1) AS DOUBLE))
       |      - 84.6 * (CAST(len(regexp_extract_all(lower(COALESCE(text, '')),
       |            '[aeiouy]+')) AS DOUBLE)
       |        / CAST(CASE WHEN trim(text) = '' OR text IS NULL THEN 0
       |            ELSE len($toksSql) END AS DOUBLE))) * 1e3) AS BIGINT)
       |    END AS flesch_x3
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q234
  // ImageIO decode round-trip: synthesize a deterministic solid-color PNG
  // per sampled doc (dims and color are pure functions of doc_id), decode
  // it with the REAL JDK ImageIO reader (javax.imageio — no stub), and
  // report true dims, channel count and the exact pixel sum. PNG is
  // lossless, so every output is SQL-derivable: the oracle recomputes the
  // same arithmetic without touching a codec, which hash-gates the real
  // decoder end to end. Encode and decode both run in the
  // partition-batched mapPartitions seam (per-partition codec amortization
  // — the production contract for a native decoder).
  private def q234(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, d)
      .select($"doc_id".cast("long").as("doc_id"))
      .filter($"doc_id" % 10 === 0)
    val png = ids.as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (8 + id % 16).toInt
        val h = (8 + (id / 16) % 16).toInt
        val rgb = ((id % 256) << 16 | ((id * 7) % 256) << 8 |
          (id * 13) % 256).toInt
        (id, Multimodal.solidPng(w, h, rgb))
      }
    }.toDF("doc_id", "media")
    Multimodal.decodeDimensions(png, "doc_id", "media")
      .select($"doc_id", $"width".cast("long").as("width"),
        $"height".cast("long").as("height"),
        $"channels".cast("long").as("channels"), $"pixel_sum")
      .orderBy($"doc_id")
  }
  private val q234Sql =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(8 + doc_id % 16 AS BIGINT) AS width,
      |  CAST(8 + (doc_id // 16) % 16 AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS channels,
      |  CAST((8 + doc_id % 16) * (8 + (doc_id // 16) % 16)
      |    * (doc_id % 256 + (doc_id * 7) % 256 + (doc_id * 13) % 256)
      |    AS BIGINT) AS pixel_sum
      |FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q271
  // Perceptual image dedup end to end: synthesize a deterministic
  // gradient PNG per document (17 shared templates + a per-doc
  // perturbation column — every pixel a pure integer function of
  // doc_id), REAL-decode and dHash it, collapse exact fingerprint
  // clones, and mine near-duplicate pairs among the DISTINCT
  // fingerprints with the exact-recall Hamming pigeonhole join. The
  // distinct-fingerprint frame is template-structure-bound (the
  // perturbation can land on ≤9 sample-grid columns per template), NOT
  // corpus-bound — so the pair mine's cost is invariant in corpus size
  // while the clone counts it reports scale with it. The oracle replays
  // the raster → 9×8 floor-map downsample → 64 difference bits as
  // hi/lo 32-bit integers, then brute-forces pair distances with
  // bit_count(xor(...)), recall-1.0-checking the pigeonhole blocking.
  private def q271(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, d)
      .select($"doc_id".cast("long").as("doc_id"))
    val png = ids.as[Long].mapPartitions { it =>
      it.map { id =>
        val t = (id % 17).toInt
        val w = 40 + t % 7
        val h = 24 + t % 5
        (id, Multimodal.gradientPng(w, h, t * 11, (id % w).toInt))
      }
    }.toDF("doc_id", "media")
    val dh = Multimodal.dhashImages(png, "doc_id", "media")
      .filter($"decoded")
    val groups = dh.groupBy($"dbits")
      .agg(min($"doc_id").as("rep"), count(lit(1)).as("n_docs"))
      .localCheckpoint() // pair mine + both n_docs lookups read it
    RecordLinkage.hammingKeyJoin(
        groups.select($"rep".as("id"), $"dbits".as("key")),
        "id", "key", keyLen = 64, maxDist = 16)
      .join(groups.select($"rep".as("id_a"), $"n_docs".as("n_docs_a")), "id_a")
      .join(groups.select($"rep".as("id_b"), $"n_docs".as("n_docs_b")), "id_b")
      .select($"id_a", $"id_b", $"dist".cast("long").as("dist"),
        $"n_docs_a", $"n_docs_b")
      .orderBy($"id_a", $"id_b")
  }
  private val q271Sql =
    """WITH g AS (SELECT doc_id, CAST(doc_id % 17 AS BIGINT) AS t,
      |         CAST(40 + (doc_id % 17) % 7 AS BIGINT) AS w,
      |         CAST(24 + (doc_id % 17) % 5 AS BIGINT) AS h
      |       FROM documents),
      |bits AS (SELECT doc_id, y, x,
      |    CASE WHEN
      |      (((x + 1) * w // 9) * 7 + (y * h // 8) * 13 + t * 11
      |        + CASE WHEN ((x + 1) * w // 9) = doc_id % w THEN 7 ELSE 0 END)
      |        % 241
      |      >
      |      ((x * w // 9) * 7 + (y * h // 8) * 13 + t * 11
      |        + CASE WHEN (x * w // 9) = doc_id % w THEN 7 ELSE 0 END)
      |        % 241
      |    THEN 1 ELSE 0 END AS b
      |  FROM g, LATERAL unnest(range(8)) AS ys(y),
      |    LATERAL unnest(range(8)) AS xs(x)),
      |hashes AS (SELECT doc_id,
      |    SUM(CASE WHEN y * 8 + x < 32
      |        THEN b * (1::BIGINT << CAST(31 - y * 8 - x AS INTEGER))
      |        ELSE 0 END) AS hi,
      |    SUM(CASE WHEN y * 8 + x >= 32
      |        THEN b * (1::BIGINT << CAST(63 - y * 8 - x AS INTEGER))
      |        ELSE 0 END) AS lo
      |  FROM bits GROUP BY doc_id),
      |grp AS (SELECT hi, lo, MIN(doc_id) AS rep,
      |         CAST(COUNT(*) AS BIGINT) AS n_docs
      |       FROM hashes GROUP BY hi, lo)
      |SELECT a.rep AS id_a, b.rep AS id_b,
      |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
      |    AS BIGINT) AS dist,
      |  a.n_docs AS n_docs_a, b.n_docs AS n_docs_b
      |FROM grp a JOIN grp b ON a.rep < b.rep
      |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 16
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q240
  // WAV decode round-trip — the second REAL media modality (the q234
  // pattern): synthesize a deterministic PCM16 WAV per sampled doc
  // (sample rate, channel count, frame count and every sample value are
  // pure functions of doc_id), decode it with the REAL JDK parser
  // (javax.sound.sampled — no stub), and report true rate/channels/
  // frames plus the exact Σ|sample| amplitude fingerprint. PCM is
  // lossless, so the oracle recomputes everything arithmetically —
  // hash-gating the real decoder end to end. Compressed codecs fall to
  // the stub seam (fakeAudioDecode), where a native decoder plugs in.
  private def q240(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, d)
      .select($"doc_id".cast("long").as("doc_id"))
      .filter($"doc_id" % 10 === 3)
    val wav = ids.as[Long].mapPartitions { it =>
      it.map { id =>
        val sr = (8000 + (id % 4) * 4000).toInt
        val ch = (1 + id % 2).toInt
        val frames = (50 + id % 100).toInt
        val samples = Array.tabulate(frames * ch)(i =>
          ((id * 31 + i.toLong * 7) % 2048 - 1024).toShort)
        (id, Multimodal.pcm16Wav(sr, ch, samples))
      }
    }.toDF("doc_id", "media")
    Multimodal.decodeAudio(wav, "doc_id", "media")
      .select($"doc_id", $"sample_rate".cast("long").as("sample_rate"),
        $"channels".cast("long").as("channels"), $"n_frames",
        $"amplitude_sum", $"decoded")
      .orderBy($"doc_id")
  }
  private val q240Sql =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
      |  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
      |  CAST(50 + doc_id % 100 AS BIGINT) AS n_frames,
      |  CAST((SELECT SUM(abs((doc_id * 31 + i * 7) % 2048 - 1024))
      |        FROM unnest(range((50 + doc_id % 100) * (1 + doc_id % 2)))
      |          AS u(i)) AS BIGINT) AS amplitude_sum,
      |  TRUE AS decoded
      |FROM documents WHERE doc_id % 10 = 3 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q246
  // Image RESIZE round-trip — the TRANSFORM stage of the multimodal
  // pipeline, gated end to end: synthesize a solid PNG per sampled doc
  // (the q234 generator), nearest-neighbor-resize it to 16×12 with the
  // deterministic integer floor map, re-encode as lossless PNG, then
  // RE-DECODE the resized bytes with the real ImageIO reader — so one
  // plan exercises decode → resample → encode → decode, and the final
  // stats must equal the arithmetic the oracle computes (solid color
  // survives NN resampling: pixel_sum = 192·(r+g+b)).
  private def q246(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, d)
      .select($"doc_id".cast("long").as("doc_id"))
      .filter($"doc_id" % 10 === 4)
    val png = ids.as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (8 + id % 16).toInt
        val h = (8 + (id / 16) % 16).toInt
        val rgb = ((id % 256) << 16 | ((id * 7) % 256) << 8 |
          (id * 13) % 256).toInt
        (id, Multimodal.solidPng(w, h, rgb))
      }
    }.toDF("doc_id", "media")
    val resized = Multimodal.resizeImages(png, "doc_id", "media", 16, 12)
      .select($"doc_id", $"media")
    Multimodal.decodeDimensions(resized, "doc_id", "media")
      .select($"doc_id", $"width".cast("long").as("width"),
        $"height".cast("long").as("height"),
        $"channels".cast("long").as("channels"), $"pixel_sum")
      .orderBy($"doc_id")
  }
  private val q246Sql =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(16 AS BIGINT) AS width,
      |  CAST(12 AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS channels,
      |  CAST(192 * (doc_id % 256 + (doc_id * 7) % 256 + (doc_id * 13) % 256)
      |    AS BIGINT) AS pixel_sum
      |FROM documents WHERE doc_id % 10 = 4 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q247
  // Audio FEATURE EXTRACTION — per-window energy over real decoded PCM:
  // the q240 synthesizer feeds Multimodal.audioEnergyWindows (32-frame
  // windows, exact Σ sample² per window, last window partial), the VAD /
  // level-audit primitive. Every sample is a pure function of
  // (doc_id, index), so the oracle regenerates the windows and their
  // energies arithmetically — hash-gating the decode + windowing kernel.
  private def q247(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, d)
      .select($"doc_id".cast("long").as("doc_id"))
      .filter($"doc_id" % 10 === 7)
    val wav = ids.as[Long].mapPartitions { it =>
      it.map { id =>
        val sr = (8000 + (id % 4) * 4000).toInt
        val ch = (1 + id % 2).toInt
        val frames = (50 + id % 100).toInt
        val samples = Array.tabulate(frames * ch)(i =>
          ((id * 31 + i.toLong * 7) % 2048 - 1024).toShort)
        (id, Multimodal.pcm16Wav(sr, ch, samples))
      }
    }.toDF("doc_id", "media")
    Multimodal.audioEnergyWindows(wav, "doc_id", "media", windowFrames = 32)
      .orderBy($"doc_id", $"win_idx")
  }
  private val q247Sql =
    """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    CAST(1 + doc_id % 2 AS BIGINT) AS ch,
      |    CAST(50 + doc_id % 100 AS BIGINT) AS frames
      |  FROM documents WHERE doc_id % 10 = 7),
      |s AS (SELECT doc_id, ch,
      |    CAST(u.i // (32 * ch) AS BIGINT) AS win_idx,
      |    (doc_id * 31 + u.i * 7) % 2048 - 1024 AS smp
      |  FROM d, unnest(range(frames * ch)) AS u(i))
      |SELECT doc_id, win_idx,
      |  CAST(COUNT(*) // ch AS BIGINT) AS n_frames,
      |  CAST(SUM(smp * smp) AS BIGINT) AS energy
      |FROM s GROUP BY doc_id, ch, win_idx
      |ORDER BY doc_id, win_idx""".stripMargin

  // ---------------------------------------------------------------- q245
  // Model-based language filter TRAINED in the engine: a 3-round batch
  // perceptron separating en from the rest on four integer text features
  // (en-stopword hits, other-language stopword hits, token count, digit
  // count), then the confusion readout under the final weights — the
  // "train a cheap classifier on the corpus, gate the corpus with it"
  // loop with zero ML-runtime dependencies. The oracle unrolls the three
  // synchronous updates as chained 1-row CTEs over the same feature
  // frame (batch updates have no arrival-order dependence, so the SQL
  // replay is exact).
  //
  // Honest outcome on THIS corpus: the synthetic documents' text is the
  // same vocabulary soup in every declared lang (q231's finding), so no
  // text feature separates en — the trainer converges to the
  // majority-class prior (all-negative, accuracy = P(¬en) = 56.4% at
  // sf0.01). That IS the audit readout ("the lang column is
  // uncorrelated with the text"); the oracle gates the TRAINER's
  // round-for-round exactness, and RegressionSpec proves learning on a
  // separable fixture where learning is possible.
  private def q245(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Regression.perceptronTrain(
      Tables.documents(s, d),
      TextAnalysis.langFilterFeatures($"text"),
      when($"lang" === "en", 1L).otherwise(-1L),
      rounds = 3)
  }
  private val q245Sql = {
    val marginOf = (w: String) =>
      s"($w.b + $w.v1*x1 + $w.v2*x2 + $w.v3*x3 + $w.v4*x4)"
    val rounds = (1 to 3).map { i =>
      val prev = s"w${i - 1}r"
      val m = marginOf(prev)
      val deltas = (s"COALESCE(SUM(CASE WHEN y*$m <= 0 THEN y END), 0) AS db" +:
        (1 to 4).map(j =>
          s"COALESCE(SUM(CASE WHEN y*$m <= 0 THEN y*x$j END), 0) AS d$j"))
        .mkString(",\n    ")
      s"""u$i AS (SELECT
         |    $deltas
         |  FROM f CROSS JOIN $prev),
         |w${i}r AS (SELECT $prev.b + u$i.db AS b,
         |    $prev.v1 + u$i.d1 AS v1, $prev.v2 + u$i.d2 AS v2,
         |    $prev.v3 + u$i.d3 AS v3, $prev.v4 + u$i.d4 AS v4
         |  FROM $prev CROSS JOIN u$i)""".stripMargin
    }.mkString(",\n")
    val fm = marginOf("w3r")
    s"""WITH f AS (SELECT
       |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE -1 END AS y,
       |    CAST(${hitsSql("en")} AS BIGINT) AS x1,
       |    CAST(${hitsSql("de")} + ${hitsSql("es")} + ${hitsSql("fr")}
       |      AS BIGINT) AS x2,
       |    CAST(CASE WHEN trim(text) = '' OR text IS NULL THEN 0
       |         ELSE len($toksSql) END AS BIGINT) AS x3,
       |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
       |      AS BIGINT) AS x4
       |  FROM documents),
       |w0r AS (SELECT CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS v1,
       |  CAST(0 AS BIGINT) AS v2, CAST(0 AS BIGINT) AS v3,
       |  CAST(0 AS BIGINT) AS v4),
       |$rounds
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
       |  CAST(MIN(w3r.b) AS BIGINT) AS bias,
       |  CAST(MIN(w3r.v1) AS BIGINT) AS w1, CAST(MIN(w3r.v2) AS BIGINT) AS w2,
       |  CAST(MIN(w3r.v3) AS BIGINT) AS w3, CAST(MIN(w3r.v4) AS BIGINT) AS w4,
       |  CAST(COALESCE(SUM(CASE WHEN y = 1 AND $fm > 0 THEN 1 END), 0) AS BIGINT) AS tp,
       |  CAST(COALESCE(SUM(CASE WHEN y = -1 AND $fm > 0 THEN 1 END), 0) AS BIGINT) AS fp,
       |  CAST(COALESCE(SUM(CASE WHEN y = -1 AND $fm <= 0 THEN 1 END), 0) AS BIGINT) AS tn,
       |  CAST(COALESCE(SUM(CASE WHEN y = 1 AND $fm <= 0 THEN 1 END), 0) AS BIGINT) AS fn
       |FROM f CROSS JOIN w3r""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q206_readability", q206, Some(q206Sql)),
    QueryDef("q245_perceptron_langfilter", q245, Some(q245Sql)),
    QueryDef("q234_imageio_roundtrip", q234, Some(q234Sql)),
    QueryDef("q240_wav_roundtrip", q240, Some(q240Sql)),
    QueryDef("q246_image_resize", q246, Some(q246Sql)),
    QueryDef("q271_image_dhash", q271, Some(q271Sql)),
    QueryDef("q247_audio_energy", q247, Some(q247Sql)),
    QueryDef("q40_dedup_exact", q40, Some(q40Sql)),
    QueryDef("q41_minhash_pairs", q41, Some(q41Sql)),
    QueryDef("q42_ngram_jaccard", q42, Some(q42Sql)),
    QueryDef("q43_cosine_topk", q43, Some(q43Sql)),
    QueryDef("q229_hard_negatives", q229, Some(q229Sql)),
    QueryDef("q233_intrinsic_dim", q233, Some(q233Sql)),
    QueryDef("q44_token_count", q44, Some(q44Sql)),
    QueryDef("q45_quality_score", q45, Some(q45Sql)),
    QueryDef("q46_langid", q46, Some(q46Sql)),
    QueryDef("q231_langid_confusion", q231, Some(q231Sql)),
    QueryDef("q47_fingerprint", q47, Some(q47Sql)),
    QueryDef("q48_simhash_pairs", q48, Some(q48Sql)),
    QueryDef("q49_multimodal_meta", q49, Some(q49Sql)),
    QueryDef("q50_embed_neardup", q50, Some(q50Sql)),
    QueryDef("q53_ivf_topk", q53, Some(q43Sql)),
    QueryDef("q54_repetition", q54, Some(q54Sql)),
    QueryDef("q55_common_ngrams", q55, Some(q55Sql)),
    QueryDef("q56_pq_topk", q56, Some(q43Sql)),
    QueryDef("q238_ivf_recall", q238, Some(q238Sql)),
    QueryDef("q239_pq_recall", q239, Some(q239Sql)),
    // persisted-index faces: same settings, same oracle replays — the
    // store round-trip must not move a single recall hit
    QueryDef("q277_ivf_index_persist", q277, Some(q238Sql)),
    QueryDef("q278_pq_index_persist", q278, Some(q239Sql)),
    // incremental add at full probe ≡ brute force over the union
    QueryDef("q280_ivf_index_add", q280, Some(q43Sql)),
    QueryDef("q253_ivf_recall_clustered", q253, Some(q253Sql)),
    QueryDef("q254_pq_recall_trained", q254, Some(q254Sql)),
    QueryDef("q265_pq_recall_trained3", q265, Some(q265Sql)),
    QueryDef("q266_ivf_recall_refined", q266, Some(q266Sql)),
    QueryDef("q267_pq_recall_ksub32", q267, Some(q267Sql)),
    QueryDef("q256_sq8_recall", q256, Some(q256Sql)),
    QueryDef("q57_hash_split", q57, Some(q57Sql)),
    QueryDef("q58_stratified_sample", q58, Some(q58Sql)),
    QueryDef("q59_sessionize", q59, Some(q59Sql)),
    QueryDef("q60_dedup_components", q60, Some(q60Sql)),
    QueryDef("q61_pii_scrub", q61, Some(q61Sql)),
    QueryDef("q62_frame_sample", q62, Some(q62Sql)),
    QueryDef("q63_tfidf_terms", q63, Some(q63Sql)),
  )
}
