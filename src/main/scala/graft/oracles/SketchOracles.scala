package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Layout, Multimodal, Sampling, Similarity, Sketches, TextStats}

/** distributed sketch operators (sk*): this family's slice of [[SparkEntry.queries]] and
  * [[SparkEntry.oracleSql]] — the driver contract is unchanged, SparkEntry
  * concatenates the families. Shared pinned parameters and SQL fragments come
  * from [[OracleFragments]].
  */
private[graft] object SketchOracles extends OracleFragments {

  val queries: Map[String, Q] = Map[String, Q](
    // --- distributed sketches: HLL / count-min / bloom ---
    "sk01_hll_distinct" -> ((s: SparkSession, dir: String) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Sketches.hllDistinct(
        Dedup.shingles(d, "doc_id", "text")
          .join(d.select(col("doc_id"), col("source")), "doc_id")
          .select(col("source"), col("shingle")),
        "source", "shingle", b = 6)
    }),
    "sk02_countmin" -> ((s: SparkSession, dir: String) =>
      Sketches.countMin(
        Dedup.shingles(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"),
        "shingle", depth = 4, width = 256, topK = 100)),
    "sk03_bloom_contamination" -> ((s: SparkSession, dir: String) =>
      Sketches.bloomContamination(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "sk04_hll_overlap" -> ((s: SparkSession, dir: String) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Sketches.hllOverlap(
        Dedup.shingles(d, "doc_id", "text")
          .join(d.select(col("doc_id"), col("source")), "doc_id")
          .select(col("source"), col("shingle")),
        "source", "shingle", b = 6)
    }),
    "sk05_theta_diff" -> ((s: SparkSession, dir: String) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      Sketches.thetaDifference(
        Dedup.shingles(d, "doc_id", "text")
          .join(d.select(col("doc_id"), col("source")), "doc_id")
          .select(col("source"), col("shingle")),
        "source", "shingle", k = 64)
    }),
    "sk06_kmv_quantiles" -> ((s: SparkSession, dir: String) =>
      Sketches.kmvQuantiles(s.read.parquet(s"$dir/documents.parquet"),
        "source", "doc_id", "n_chars", k = KmvQuantK)),
    "sk07_hdr_quantiles" -> ((s: SparkSession, dir: String) =>
      Sketches.hdrQuantiles(s.read.parquet(s"$dir/documents.parquet"),
        "source", "n_chars")),
    "sk08_ams_f2" -> ((s: SparkSession, dir: String) =>
      Sketches.amsF2(s.read.parquet(s"$dir/events.parquet"), "user_id",
        width = AmsWidth)),
    "sk10_heavy_hitters" -> ((s: SparkSession, dir: String) =>
      Sketches.heavyHitters(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")),
    "sk09_moments" -> ((s: SparkSession, dir: String) =>
      Sketches.momentsSketch(s.read.parquet(s"$dir/documents.parquet"),
        "source", "n_chars")),
  )

  val oracleSql: Map[String, String] = Map(

    // per-source HyperLogLog distinct-shingle estimate — mirror of Sketches.hllDistinct
    // (b=6: idx = top 6 bits of the 32-bit md5 prefix, rho over the low 26 bits via the
    // same lpad(bin())+strpos arithmetic; register sum is exact-dyadic so aggregation
    // order cannot change the float result in either engine)
    "sk01_hll_distinct" -> {
      val m = 64
      val alphaMM = 0.7213 / (1.0 + 1.079 / m) * m * m // same expression as hllDistinct
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
         |sh AS (SELECT DISTINCT doc_id, source, array_to_string(ts[i:i+2], ' ') AS shingle
         |       FROM (SELECT doc_id, source, ts, unnest(generate_series(1, len(ts) - 2)) AS i
         |             FROM toks)),
         |hm AS (SELECT source, shingle, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
         |rg AS (SELECT source, h >> 26 AS idx,
         |         max(CASE WHEN (h & 67108863) = 0 THEN 27
         |                  ELSE strpos(lpad(bin(h & 67108863), 26, '0'), '1') END) AS rho
         |       FROM hm GROUP BY 1, 2),
         |sm AS (SELECT source,
         |         sum(1.0::DOUBLE / (1::BIGINT << rho)) + ($m - count(*))::DOUBLE AS ssum
         |       FROM rg GROUP BY 1),
         |ex AS (SELECT source, count(DISTINCT shingle) AS exact_distinct FROM hm GROUP BY 1),
         |est AS (SELECT source, round(CAST('$alphaMM' AS DOUBLE) / ssum, 3) AS hll_est,
         |               exact_distinct
         |        FROM sm JOIN ex USING (source))
         |SELECT source, hll_est, exact_distinct,
         |  round(abs(hll_est - exact_distinct::DOUBLE) / exact_distinct::DOUBLE, 4) AS rel_err
         |FROM est""".stripMargin
    },

    // pairwise source-overlap estimates by HLL register algebra (inclusion-exclusion
    // on rounded estimates, union = register max-merge) — mirror of Sketches.hllOverlap
    "sk04_hll_overlap" -> {
      val m = 64
      val alphaMM = 0.7213 / (1.0 + 1.079 / m) * m * m
      val fold = s"sum(1.0::DOUBLE / (1::BIGINT << rho)) + ($m - count(*))::DOUBLE"
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
         |sh AS (SELECT DISTINCT doc_id, source, array_to_string(ts[i:i+2], ' ') AS shingle
         |       FROM (SELECT doc_id, source, ts, unnest(generate_series(1, len(ts) - 2)) AS i
         |             FROM toks)),
         |hm AS (SELECT source, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
         |rg AS (SELECT source, h >> 26 AS idx,
         |         max(CASE WHEN (h & 67108863) = 0 THEN 27
         |                  ELSE strpos(lpad(bin(h & 67108863), 26, '0'), '1') END) AS rho
         |       FROM hm GROUP BY 1, 2),
         |es AS (SELECT source, round(CAST('$alphaMM' AS DOUBLE) / ($fold), 3) AS est
         |       FROM rg GROUP BY source),
         |ps AS (SELECT a.source AS key_a, b.source AS key_b
         |       FROM (SELECT DISTINCT source FROM rg) a
         |       JOIN (SELECT DISTINCT source FROM rg) b ON a.source < b.source),
         |ur AS (SELECT key_a, key_b, idx, MAX(rho) AS rho FROM (
         |         SELECT ps.key_a, ps.key_b, rg.idx, rg.rho FROM ps JOIN rg ON rg.source = ps.key_a
         |         UNION ALL
         |         SELECT ps.key_a, ps.key_b, rg.idx, rg.rho FROM ps JOIN rg ON rg.source = ps.key_b)
         |       GROUP BY 1, 2, 3),
         |uu AS (SELECT key_a, key_b, round(CAST('$alphaMM' AS DOUBLE) / ($fold), 3) AS est_union
         |       FROM ur GROUP BY 1, 2)
         |SELECT key_a, key_b, ea.est AS est_a, eb.est AS est_b, est_union,
         |  greatest(0.0::DOUBLE, round(ea.est + eb.est - est_union, 3)) AS overlap_est
         |FROM uu
         |JOIN es ea ON ea.source = key_a
         |JOIN es eb ON eb.source = key_b""".stripMargin
    },

    // count-min doc-frequency estimates for the top-100 shingles — mirror of
    // Sketches.countMin (depth 4, width 256; salt 'r:' prepended before the md5)
    // CMS-screened φ-heavy tokens: bucket totals over the raw token stream,
    // min-row estimate per DISTINCT token, candidates at cms ≥ ⌈φN⌉ (one-sided
    // error ⇒ no false negatives), exact verify on candidates only — mirror of
    // Sketches.heavyHitters defaults (φ = 2%, depth 4, width 256)
    "sk10_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tk),
         |bc AS (SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || token), 1, 8))::BIGINT % 256 AS bucket,
         |    CAST(count(*) AS BIGINT) AS bucket_n
         |  FROM (SELECT token, unnest(generate_series(0, 3)) AS r FROM tk) GROUP BY 1, 2),
         |es AS (SELECT token, CAST(min(bucket_n) AS BIGINT) AS cms_n
         |  FROM (SELECT d.token, rr.r,
         |      ('0x' || substr(md5(CAST(rr.r AS VARCHAR) || ':' || d.token), 1, 8))::BIGINT % 256 AS bucket
         |    FROM (SELECT DISTINCT token FROM tk) d
         |    CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) rr) p
         |  JOIN bc ON bc.r = p.r AND bc.bucket = p.bucket
         |  GROUP BY token),
         |cand AS (SELECT token, cms_n, n_total FROM es, tt
         |  WHERE cms_n >= (20000 * n_total + 999999) // 1000000),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM cand),
         |ex AS (SELECT tk.token, CAST(count(*) AS BIGINT) AS exact_n
         |  FROM tk JOIN (SELECT token FROM cand) c ON tk.token = c.token GROUP BY 1)
         |SELECT ex.token, exact_n, cms_n, n_total, n_candidates
         |FROM ex JOIN cand ON ex.token = cand.token, nc
         |WHERE exact_n >= (20000 * n_total + 999999) // 1000000""".stripMargin,

    "sk02_countmin" ->
      s"""WITH $shinglesCte,
         |ex AS (SELECT shingle, count(*) AS exact_n FROM sh GROUP BY 1),
         |ib AS (SELECT shingle, exact_n, r,
         |         ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || shingle), 1, 8))::BIGINT % 256 AS bucket
         |       FROM (SELECT shingle, exact_n, unnest(generate_series(0, 3)) AS r FROM ex)),
         |bc AS (SELECT r, bucket, CAST(sum(exact_n) AS BIGINT) AS bucket_n FROM ib GROUP BY 1, 2),
         |est AS (SELECT shingle, min(bucket_n) AS cms_n, max(exact_n) AS exact_n
         |        FROM ib JOIN bc USING (r, bucket) GROUP BY shingle)
         |SELECT shingle, exact_n, cms_n, cms_n - exact_n AS overcount
         |FROM est ORDER BY exact_n DESC, shingle LIMIT 100""".stripMargin,

    // bloom-filter contamination screen (k=3 positions from disjoint md5 fields,
    // m=2^18 bits, train split = hash bucket < 9000) — mirror of
    // Sketches.bloomContamination
    "sk03_bloom_contamination" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS shingle
         |       FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 2)) AS i FROM toks)),
         |sp AS (SELECT doc_id,
         |         CASE WHEN ${bucketSql("doc_id")} < 9000 THEN 'train'
         |              WHEN ${bucketSql("doc_id")} < 9500 THEN 'val'
         |              ELSE 'test' END AS split
         |       FROM documents),
         |ps AS (SELECT doc_id, split, shingle,
         |         unnest([('0x' || substr(md5(shingle), 1, 8))::BIGINT % 262144,
         |                 ('0x' || substr(md5(shingle), 9, 8))::BIGINT % 262144,
         |                 ('0x' || substr(md5(shingle), 17, 8))::BIGINT % 262144]) AS pos
         |       FROM sh JOIN sp USING (doc_id)),
         |bits AS (SELECT DISTINCT pos FROM ps WHERE split = 'train'),
         |probe AS (SELECT DISTINCT doc_id, split, shingle, pos FROM ps WHERE split <> 'train'),
         |probed AS (SELECT doc_id, split, shingle, count(*) AS n_pos
         |           FROM probe GROUP BY 1, 2, 3),
         |hits AS (SELECT doc_id, split, shingle, count(*) AS n_hit
         |         FROM probe JOIN bits USING (pos) GROUP BY 1, 2, 3)
         |SELECT doc_id, split, count(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN COALESCE(n_hit, 0) = n_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  round(CAST(SUM(CASE WHEN COALESCE(n_hit, 0) = n_pos THEN 1 ELSE 0 END) AS DOUBLE)
         |        / CAST(count(*) AS DOUBLE), 6) AS flag_rate
         |FROM probed LEFT JOIN hits USING (doc_id, split, shingle)
         |GROUP BY doc_id, split""".stripMargin,

    // Theta/KMV bottom-64 sketch set-difference estimates between sources over their
    // shingle sets: theta = 64th-smallest 32-bit md5 hash (2^32 when under-full =
    // exact regime), retained = a-samples < min(theta_a, theta_b) absent from b,
    // est = retained * 2^32 / theta — mirror of Sketches.thetaDifference
    "sk05_theta_diff" ->
      s"""WITH $shinglesCte,
         |hv AS (SELECT DISTINCT d.source AS key,
         |         ('0x' || substr(md5(sh.shingle), 1, 8))::BIGINT AS hv
         |       FROM sh JOIN documents d USING (doc_id)),
         |rk AS (SELECT key, hv, row_number() OVER (PARTITION BY key ORDER BY hv) AS rn
         |       FROM hv),
         |th AS (SELECT key,
         |         COALESCE(MAX(CASE WHEN rn = 64 THEN hv END), 4294967296) AS theta
         |       FROM rk GROUP BY key),
         |sm AS (SELECT r.key, r.hv FROM rk r JOIN th USING (key) WHERE r.hv < theta),
         |pa AS (SELECT a.key AS key_a, b.key AS key_b,
         |         CAST(least(a.theta, b.theta) AS BIGINT) AS theta_ab
         |       FROM th a JOIN th b ON a.key <> b.key),
         |rt AS (SELECT p.key_a, p.key_b, p.theta_ab, count(*) AS n_retained
         |       FROM pa p
         |       JOIN sm sa ON sa.key = p.key_a AND sa.hv < p.theta_ab
         |       WHERE NOT EXISTS (SELECT 1 FROM sm sb
         |                         WHERE sb.key = p.key_b AND sb.hv = sa.hv)
         |       GROUP BY 1, 2, 3)
         |SELECT p.key_a, p.key_b, p.theta_ab,
         |  CAST(COALESCE(rt.n_retained, 0) AS BIGINT) AS n_retained,
         |  round(CAST(COALESCE(rt.n_retained, 0) AS DOUBLE) * 4294967296.0
         |        / CAST(p.theta_ab AS DOUBLE), 3) AS diff_est
         |FROM pa p LEFT JOIN rt USING (key_a, key_b, theta_ab)""".stripMargin,

    // KMV bottom-k sample quantiles per source: deterministic md5 bottom-k sample,
    // nearest-rank quantiles of the sampled values — mirror of Sketches.kmvQuantiles
    // with the shared register size interpolated
    "sk06_kmv_quantiles" ->
      s"""WITH rows AS (SELECT source, doc_id, n_chars,
         |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
         |      FROM documents),
         |samp AS (SELECT source, n_chars FROM (
         |    SELECT *, row_number() OVER (PARTITION BY source ORDER BY hv, doc_id, n_chars) AS rk
         |    FROM rows) WHERE rk <= $KmvQuantK),
         |agg AS (SELECT source, COUNT(*) AS n_sample, list(n_chars ORDER BY n_chars) AS vs
         |        FROM samp GROUP BY 1)
         |SELECT source, CAST(n_sample AS BIGINT) AS n_sample,
         |  CAST(vs[CAST((50 * n_sample + 99) // 100 AS INT)] AS BIGINT) AS p50_est,
         |  CAST(vs[CAST((90 * n_sample + 99) // 100 AS INT)] AS BIGINT) AS p90_est,
         |  CAST(vs[CAST((99 * n_sample + 99) // 100 AS INT)] AS BIGINT) AS p99_est
         |FROM agg""".stripMargin,

    // AMS tug-of-war F2 (self-join size) sketch: per-key counts, ±1 md5 signs per
    // (register, key), register sums squared and averaged; exact F2 as diagnostic
    // — mirror of Sketches.amsF2
    "sk08_ams_f2" ->
      s"""WITH cnt AS (SELECT CAST(user_id AS VARCHAR) AS k, COUNT(*) AS n
         |             FROM events GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
         |               CAST(SUM(n * n) AS BIGINT) AS f2_exact
         |        FROM cnt),
         |reg AS (SELECT j, CAST(SUM(n * (1 - 2 * (('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || k), 1, 8))::BIGINT % 2))) AS BIGINT) AS c
         |        FROM (SELECT k, n, unnest(generate_series(0, ${AmsWidth - 1})) AS j FROM cnt)
         |        GROUP BY 1),
         |est AS (SELECT CAST(SUM(c * c) AS BIGINT) AS f2_sum FROM reg)
         |SELECT n_rows, CAST(n_keys AS BIGINT) AS n_keys, f2_exact, f2_sum,
         |       round(f2_sum::DOUBLE / ${AmsWidth}.0, 6) AS f2_est
         |FROM tot CROSS JOIN est""".stripMargin,

    // HDR-histogram quantiles: (binary exponent, top-2 mantissa bits) buckets from
    // pure INTEGER arithmetic (bit length, shifts — no float log2 at bucket
    // boundaries), cumulated-count nearest-rank, estimate = bucket lower bound —
    // mirror of Sketches.hdrQuantiles
    "sk07_hdr_quantiles" ->
      """WITH vals AS (SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
        |              WHERE n_chars > 0),
        |b AS (SELECT source,
        |        4 * e + (CASE WHEN e >= 2 THEN v >> (e - 2) ELSE v << (2 - e) END) - 4 AS bucket
        |      FROM (SELECT source, v, length(bin(v)) - 1 AS e FROM vals)),
        |bc AS (SELECT source, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2),
        |cum AS (SELECT source, bucket,
        |          SUM(c) OVER (PARTITION BY source ORDER BY bucket
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |          SUM(c) OVER (PARTITION BY source) AS n
        |        FROM bc),
        |lb AS (SELECT source, cum, n,
        |         CASE WHEN bucket // 4 >= 2
        |              THEN (bucket % 4 + 4) << (bucket // 4 - 2)
        |              ELSE (bucket % 4 + 4) >> (2 - bucket // 4) END AS lb
        |       FROM cum)
        |SELECT source, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN lb END) AS BIGINT) AS p50_est,
        |  CAST(MIN(CASE WHEN cum * 100 >= 90 * n THEN lb END) AS BIGINT) AS p90_est,
        |  CAST(MIN(CASE WHEN cum * 100 >= 99 * n THEN lb END) AS BIGINT) AS p99_est
        |FROM lb GROUP BY 1""".stripMargin,

    // moments sketch: EXACT integer power sums (DuckDB promotes per-row products to
    // HUGEINT so x^4 cannot overflow INT64; the Spark side sums decimal(12,0)-widened
    // products — both exact), then one fixed double-arithmetic sequence for the
    // population moments; pow(v,1.5) written v*sqrt(v) on BOTH sides because sqrt is
    // IEEE-correctly-rounded while pow is only ulp-accurate; zero-variance groups
    // report 0 skew/kurt by the same explicit guard as the Spark side — mirror of
    // Sketches.momentsSketch
    "sk09_moments" ->
      """WITH s AS (SELECT source, COUNT(*) AS n,
        |             SUM(n_chars::HUGEINT) AS s1,
        |             SUM(n_chars::HUGEINT * n_chars) AS s2,
        |             SUM(n_chars::HUGEINT * n_chars * n_chars) AS s3,
        |             SUM((n_chars::HUGEINT * n_chars) * (n_chars::HUGEINT * n_chars)) AS s4
        |           FROM documents GROUP BY 1),
        |m AS (SELECT source, n,
        |        s1::DOUBLE / n::DOUBLE AS m1, s2::DOUBLE / n::DOUBLE AS m2,
        |        s3::DOUBLE / n::DOUBLE AS m3, s4::DOUBLE / n::DOUBLE AS m4
        |      FROM s),
        |v AS (SELECT source, n, m1, m2, m3, m4, m2 - m1 * m1 AS var FROM m)
        |SELECT source, CAST(n AS BIGINT) AS n,
        |  CAST(floor(1000000.0 * m1 + 0.5) AS BIGINT) AS mean_micro,
        |  CAST(floor(1000000.0 * var + 0.5) AS BIGINT) AS var_micro,
        |  CASE WHEN var <= 0.0 THEN 0 ELSE
        |    CAST(floor(1000000.0 * ((m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)
        |                            / (var * sqrt(var))) + 0.5) AS BIGINT) END AS skew_micro,
        |  CASE WHEN var <= 0.0 THEN 0 ELSE
        |    CAST(floor(1000000.0 * ((m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2
        |                             - 3.0 * m1 * m1 * m1 * m1) / (var * var) - 3.0) + 0.5)
        |      AS BIGINT) END AS kurt_micro
        |FROM v""".stripMargin,
  )
}
