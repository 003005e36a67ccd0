package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Layout, Multimodal, Sampling, Similarity, Sketches, TextStats}
import graft.testgraph.TestGraph

/** the FlockDB graph-engine surface (g*) — SURVEY.md §2 semantics over the TestGraph edge log: this family's slice of [[SparkEntry.queries]] and
  * [[SparkEntry.oracleSql]] — the driver contract is unchanged, SparkEntry
  * concatenates the families. Shared pinned parameters and SQL fragments come
  * from [[OracleFragments]].
  */
private[graft] object GraphOracles extends OracleFragments {

  val queries: Map[String, Q] = Map[String, Q](

    // --- graph engine (FlockDB semantics over the TestGraph edge log) ---
    "g01_lww_snapshot"     -> (GraphQueries.lwwSnapshot _),
    "g02_adjacency_topk"   -> (GraphQueries.adjacencyTopK _),
    "g03_intersection"     -> (GraphQueries.intersection _),
    "g04_difference"       -> (GraphQueries.difference _),
    "g05_union"            -> (GraphQueries.union _),
    "g06_reciprocal"       -> (GraphQueries.reciprocal _),
    "g07_metadata"         -> (GraphQueries.metadata _),
    "g08_count2_estimates" -> (GraphQueries.count2Estimates _),
    "g09_cursor_page"      -> (GraphQueries.cursorPage _),
    "g10_contains"         -> (GraphQueries.containsSet _),
    "g11_where_in"         -> (GraphQueries.whereIn _),
    "g12_execute_lww"      -> (GraphQueries.executeLww _),
    "g13_bulk_archive"     -> (GraphQueries.bulkArchive _),
    "g14_copy_repair"      -> (GraphQueries.copyRepair _),
    "g15_nested_compound"  -> (GraphQueries.nestedCompound _),
    "g16_uuid_functions"   -> (GraphQueries.uuidFunctions _),
    "g17_pagerank"         -> (GraphQueries.pageRank _),
    "g18_vertex_domination" -> (GraphQueries.vertexDomination _),
    "g19_backward_ops"      -> (GraphQueries.backwardOps _),
    "g20_metadata_registers" -> (GraphQueries.metadataRegisters _),
    "g21_triangles"         -> (GraphQueries.triangleCounts _),
    "g22_label_propagation" -> (GraphQueries.labelPropagation _),
    "g23_two_hop"           -> (GraphQueries.twoHop _),
    "g24_degree_histogram"  -> (GraphQueries.degreeHistogram _),
    "g25_node_jaccard"      -> (GraphQueries.nodeJaccard _),
    "g26_metadata_patched"  -> (GraphQueries.metadataPatchedQuery _),
    "g27_kcore"             -> ((s: SparkSession, dir: String) =>
      GraphQueries.kCore(s, dir, k = 20, rounds = 3)),
    "g28_clustering_coeff"  -> (GraphQueries.clusteringCoefficient _),
    "g29_connected_components" -> ((s: SparkSession, dir: String) =>
      GraphQueries.connectedComponents(s, dir)),
    "g67_graph_card" -> ((s: SparkSession, dir: String) =>
      GraphQueries.graphCard(s, dir)),
    "g30_assortativity"     -> (GraphQueries.assortativity _),
    "g31_adamic_adar"       -> (GraphQueries.adamicAdar _),
    "g32_personalized_pagerank" -> (GraphQueries.personalizedPageRank _),
    "g33_hits"              -> (GraphQueries.hits _),
    "g34_bfs_distance"      -> ((s: SparkSession, dir: String) =>
      GraphQueries.bfsDistance(s, dir, maxHops = 3)),
    "g35_friend_recs"       -> ((s: SparkSession, dir: String) =>
      GraphQueries.friendRecs(s, dir, k = 5)),
    "g36_local_bridges"     -> (GraphQueries.localBridges _),
    "g37_decayed_pagerank"  -> (GraphQueries.decayedPageRank _),
    "g38_ktruss"            -> ((s: SparkSession, dir: String) =>
      GraphQueries.kTruss(s, dir, k = KTrussK, rounds = KTrussRounds)),
    "g39_sssp"              -> ((s: SparkSession, dir: String) =>
      GraphQueries.boundedSssp(s, dir, rounds = 3)),
    "g40_lpa_communities"   -> ((s: SparkSession, dir: String) =>
      GraphQueries.lpaCommunities(s, dir, rounds = LpaRounds)),
    "g41_snapshot_asof"     -> (GraphQueries.snapshotAsOf _),
    "g42_churn_between"     -> (GraphQueries.churnBetween _),
    "g43_salsa"             -> (GraphQueries.salsa _),
    "g44_harmonic"          -> ((s: SparkSession, dir: String) =>
      GraphQueries.harmonicCentrality(s, dir, maxHops = 3)),
    "g45_random_walks"      -> ((s: SparkSession, dir: String) =>
      GraphQueries.randomWalks(s, dir, steps = WalkSteps, seedMod = WalkSeedMod)),
    "g46_modularity" -> ((s: SparkSession, dir: String) =>
      GraphQueries.modularity(s, dir, rounds = LpaRounds)),
    "g65_modularity_refined" -> ((s: SparkSession, dir: String) =>
      GraphQueries.modularityRefined(s, dir, lpaRounds = LpaRounds, refineRounds = 1)),
    "g66_louvain_agg" -> ((s: SparkSession, dir: String) =>
      GraphQueries.louvainAggregated(s, dir, lpaRounds = LpaRounds)),
    "g47_katz" -> ((s: SparkSession, dir: String) =>
      GraphQueries.katzCentrality(s, dir, betaPct = KatzBetaPct)),
    "g48_betweenness" -> ((s: SparkSession, dir: String) =>
      GraphQueries.betweennessSampled(s, dir, seedMod = WalkSeedMod)),
    "g49_scc" -> ((s: SparkSession, dir: String) =>
      GraphQueries.sccComponents(s, dir)),
    "g50_condensation" -> ((s: SparkSession, dir: String) =>
      GraphQueries.sccCondensation(s, dir)),
    "g51_topo_levels" -> ((s: SparkSession, dir: String) =>
      GraphQueries.sccTopoLevels(s, dir)),
    "g52_scc_reachability" -> ((s: SparkSession, dir: String) =>
      GraphQueries.sccReachFromSet(s, dir, seedMod = SccReachSeedMod)),
    "g53_landmark_distances" -> ((s: SparkSession, dir: String) =>
      GraphQueries.landmarkDistances(s, dir, nLandmarks = LandmarkCount,
        maxHops = LandmarkHops, uMod = LandmarkUMod, vMod = LandmarkVMod)),
    "g54_hyperanf" -> ((s: SparkSession, dir: String) =>
      GraphQueries.hyperAnf(s, dir, rounds = HyperAnfRounds)),
    "g55_effective_diameter" -> ((s: SparkSession, dir: String) =>
      GraphQueries.effectiveDiameter(s, dir, rounds = HyperAnfRounds,
        fracPct = EffDiameterPct)),
    "g56_coreness" -> ((s: SparkSession, dir: String) =>
      GraphQueries.coreness(s, dir, rounds = CorenessRounds)),
    "g57_msf" -> ((s: SparkSession, dir: String) =>
      GraphQueries.minSpanningForest(s, dir,
        rounds = MsfRounds, propSteps = MsfPropSteps)),
    "g58_matching" -> ((s: SparkSession, dir: String) =>
      GraphQueries.maximalMatching(s, dir, rounds = MatchRounds)),
    "g59_weighted_sssp" -> ((s: SparkSession, dir: String) =>
      GraphQueries.weightedSssp(s, dir, nSeeds = SsspSeeds, maxHops = SsspHops,
        weightMod = SsspWeightMod)),
    "g60_weighted_landmarks" -> ((s: SparkSession, dir: String) =>
      GraphQueries.weightedLandmarks(s, dir, nLandmarks = LandmarkCount,
        maxHops = WLandmarkHops, uMod = LandmarkUMod, vMod = LandmarkVMod,
        weightMod = SsspWeightMod)),
    "g61_mis" -> ((s: SparkSession, dir: String) =>
      GraphQueries.maximalIndependentSet(s, dir, rounds = MisRounds)),
    "g62_assortativity" -> (GraphQueries.degreeAssortativity _),
    "g63_transitivity" -> (GraphQueries.transitivity _),
    "g64_rich_club" -> ((s: SparkSession, dir: String) =>
      GraphQueries.richClub(s, dir, ks = RichClubKs)),
  )

  /** The g54 HyperANF curve statement, shared verbatim by the g54 entry and the
    * g55 effective-diameter wrapper (the t42/t41 composition discipline: the
    * downstream oracle nests the upstream one so the two can never diverge).
    */
  private lazy val hyperAnfSql: String = {
    val m = 16
    val alphaMM = 0.673 * m * m
    val mask = (1L << 28) - 1
    def reg(t: Int) =
      s"""c$t AS (SELECT v, idx, MAX(rho) AS rho FROM (
           |         SELECT * FROM c${t - 1}
           |         UNION ALL
           |         SELECT e.src AS v, c.idx, c.rho FROM c${t - 1} c JOIN e ON c.v = e.dst)
           |       GROUP BY v, idx)""".stripMargin
      def nf(t: Int) =
        s"""n$t AS (SELECT $t AS t, CAST(SUM(micro) AS BIGINT) AS nf_micro FROM (
           |  SELECT CAST(floor(round(CASE
           |      WHEN CAST('$alphaMM' AS DOUBLE) / ssum <= ${2.5 * m} AND n_regs < $m
           |        THEN $m * ln($m::DOUBLE / ($m - n_regs)::DOUBLE)
           |      ELSE CAST('$alphaMM' AS DOUBLE) / ssum END, 3) * 1000 + 0.5) AS BIGINT) AS micro
           |  FROM (SELECT v, SUM(1.0::DOUBLE / (1::BIGINT << rho)) + ($m - COUNT(*))::DOUBLE AS ssum,
           |               COUNT(*) AS n_regs
           |        FROM c$t GROUP BY v)))""".stripMargin
      s"""$snap,
         |e AS (SELECT DISTINCT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |h0 AS (SELECT v, ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 8))::BIGINT AS h FROM vx),
         |c0 AS (SELECT v, h >> 28 AS idx,
         |         CASE WHEN (h & $mask) = 0 THEN 29
         |              ELSE strpos(lpad(bin(h & $mask), 28, '0'), '1') END AS rho
         |       FROM h0),
         |${(1 to HyperAnfRounds).map(reg).mkString(",\n")},
         |${(0 to HyperAnfRounds).map(nf).mkString(",\n")},
         |nfr AS (${(0 to HyperAnfRounds).map(t => s"SELECT * FROM n$t").mkString(" UNION ALL ")})
         |SELECT CAST(t AS INTEGER) AS t, nf_micro,
         |  CAST(floor(1000000.0 * nf_micro::DOUBLE / (MAX(nf_micro) OVER ())::DOUBLE + 0.5) AS BIGINT)
         |    AS frac_micro
         |FROM nfr""".stripMargin
  }

  /** One LPA majority-vote round (label-asc tie-break) over `adj`, CTE l(i-1) -> l(i)
    * — the g65/g66 shared rendition.
    */
  private def lpaMoveRoundCte(i: Int): String = {
    val prev = s"l${i - 1}"
    s"""n$i AS (SELECT adj.src AS v, l.label, COUNT(*) AS c
       |        FROM adj JOIN $prev l ON l.v = adj.dst
       |        GROUP BY 1, 2),
       |l$i AS MATERIALIZED (SELECT v, label FROM (
       |       SELECT v, label,
       |              row_number() OVER (PARTITION BY v ORDER BY c DESC, label) AS rk
       |       FROM n$i)
       |     WHERE rk = 1)""".stripMargin
  }

  /** g46's exact partition score (community, n_vertices, e_in, d_sum, q_part_micro)
    * of partition CTE `commCte`, emitted as rows$tag — the g65/g66 shared rendition.
    */
  private def partitionScoreCtes(tag: String, commCte: String): String =
    s"""ds$tag AS (SELECT community, COUNT(*) AS n_vertices, CAST(SUM(degree) AS BIGINT) AS d_sum
       |       FROM deg JOIN $commCte USING (v) GROUP BY 1),
       |ei$tag AS (SELECT a.community, COUNT(*) AS e_in
       |       FROM und JOIN $commCte a ON a.v = und.lo JOIN $commCte b ON b.v = und.hi
       |       WHERE a.community = b.community GROUP BY 1),
       |rows$tag AS MATERIALIZED (SELECT ds$tag.community, ds$tag.n_vertices,
       |    CAST(COALESCE(ei$tag.e_in, 0) AS BIGINT) AS e_in, ds$tag.d_sum,
       |    CAST(floor(1000000.0 * (COALESCE(ei$tag.e_in, 0)::DOUBLE / m::DOUBLE
       |      - (ds$tag.d_sum::DOUBLE / (2.0 * m::DOUBLE))
       |        * (ds$tag.d_sum::DOUBLE / (2.0 * m::DOUBLE)))
       |      + 0.5) AS BIGINT) AS q_part_micro
       |  FROM ds$tag LEFT JOIN ei$tag USING (community), mt)""".stripMargin

  /** The g65 refinement chain — undirected edges, LPA rounds, the exact-integer
    * 2m·k − d·Σ local-move round, both partition scores, and the acceptance gate
    * (CTEs comm0, comm1, rows0, rows1, acc) — shared VERBATIM by the g65 and g66
    * mirrors: one SQL rendition, not two hand-synced copies (the d05 lesson).
    */
  private lazy val refineChainCtes: String =
    s"""und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
       |                        GREATEST(source_id, destination_id) AS hi
       |        FROM edges
       |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
       |adj AS (SELECT lo AS src, hi AS dst FROM und UNION ALL SELECT hi, lo FROM und),
       |l0 AS (SELECT DISTINCT src AS v, src AS label FROM adj),
       |${(1 to LpaRounds).map(lpaMoveRoundCte).mkString(",\n")},
       |comm0 AS MATERIALIZED (SELECT v, label AS community FROM l$LpaRounds),
       |mt AS (SELECT COUNT(*) AS m FROM und),
       |deg AS MATERIALIZED (SELECT v, COUNT(*) AS degree
       |        FROM (SELECT lo AS v FROM und UNION ALL SELECT hi FROM und) GROUP BY 1),
       |${partitionScoreCtes("0", "comm0")},
       |dc0 AS MATERIALIZED (SELECT community, CAST(SUM(degree) AS BIGINT) AS d_c
       |        FROM deg JOIN comm0 USING (v) GROUP BY 1),
       |kk AS MATERIALIZED (SELECT adj.src AS v, c.community AS c, COUNT(*) AS k
       |       FROM adj JOIN comm0 c ON c.v = adj.dst GROUP BY 1, 2),
       |st AS (SELECT c0.v, c0.community AS a, deg.degree AS d,
       |          CAST(2 * mt.m * COALESCE(kk.k, 0)
       |               - deg.degree * (dc0.d_c - deg.degree) AS BIGINT) AS stay_score
       |       FROM comm0 c0
       |       JOIN deg ON deg.v = c0.v
       |       JOIN dc0 ON dc0.community = c0.community
       |       LEFT JOIN kk ON kk.v = c0.v AND kk.c = c0.community, mt),
       |mvc AS (SELECT kk.v, kk.c,
       |          CAST(2 * mt.m * kk.k - st.d * dc0.d_c AS BIGINT) AS score, st.stay_score
       |        FROM kk JOIN st ON st.v = kk.v AND kk.c <> st.a
       |        JOIN dc0 ON dc0.community = kk.c, mt),
       |mv AS (SELECT v, c FROM (
       |    SELECT v, c, row_number() OVER (PARTITION BY v ORDER BY score DESC, c) AS rk
       |    FROM mvc WHERE score > stay_score) WHERE rk = 1),
       |comm1 AS MATERIALIZED (SELECT c0.v, COALESCE(mv.c, c0.community) AS community
       |          FROM comm0 c0 LEFT JOIN mv ON mv.v = c0.v),
       |${partitionScoreCtes("1", "comm1")},
       |qq0 AS (SELECT CAST(SUM(q_part_micro) AS BIGINT) AS q FROM rows0),
       |qq1 AS (SELECT CAST(SUM(q_part_micro) AS BIGINT) AS q FROM rows1),
       |nm AS (SELECT COUNT(*) AS n FROM comm0 c0
       |       JOIN comm1 c1 ON c1.v = c0.v AND c1.community <> c0.community),
       |acc AS (SELECT ((SELECT n FROM nm) > 0
       |                AND (SELECT q FROM qq1) >= (SELECT q FROM qq0)) AS ok)""".stripMargin

  val oracleSql: Map[String, String] = Map(

    // strongly connected components as TRUE mutual reachability (label = min u
    // with v ⇝ u and u ⇝ v, including v itself), so a hash match proves the
    // Spark trim/color/sweep loop found the exact SCCs — mirror of
    // GraphQueries.sccComponents over the directed Normal graph-1 edges
    "g49_scc" ->
      s"""${snap.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |e AS (SELECT DISTINCT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |reach AS (SELECT v, v AS r FROM vx
         |          UNION
         |          SELECT e.dst AS v, reach.r FROM reach JOIN e ON e.src = reach.v)
         |SELECT f.v AS vertex_id, MIN(f.r) AS scc
         |FROM reach f JOIN reach b ON b.v = f.r AND b.r = f.v
         |GROUP BY f.v""".stripMargin,

    // the SCC contraction DAG: inter-SCC edge bundles over the g49 mutual-reach
    // labels — mirror of GraphQueries.sccCondensation
    "g50_condensation" ->
      s"""${snap.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |e AS (SELECT DISTINCT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |reach AS (SELECT v, v AS r FROM vx
         |          UNION
         |          SELECT e.dst AS v, reach.r FROM reach JOIN e ON e.src = reach.v),
         |scc AS (SELECT f.v, MIN(f.r) AS scc FROM reach f
         |        JOIN reach b ON b.v = f.r AND b.r = f.v GROUP BY f.v)
         |SELECT sa.scc AS scc_src, sb.scc AS scc_dst, COUNT(*) AS n_edges
         |FROM e JOIN scc sa ON sa.v = e.src JOIN scc sb ON sb.v = e.dst
         |WHERE sa.scc <> sb.scc GROUP BY 1, 2""".stripMargin,

    // longest-path layering of the condensation: every walk through the (acyclic)
    // contraction extends levels, MAX per SCC is the depth — mirror of
    // GraphQueries.sccTopoLevels
    "g51_topo_levels" ->
      s"""${snap.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |e AS (SELECT DISTINCT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |reach AS (SELECT v, v AS r FROM vx
         |          UNION
         |          SELECT e.dst AS v, reach.r FROM reach JOIN e ON e.src = reach.v),
         |scc AS (SELECT f.v, MIN(f.r) AS scc FROM reach f
         |        JOIN reach b ON b.v = f.r AND b.r = f.v GROUP BY f.v),
         |ce AS (SELECT DISTINCT sa.scc AS a, sb.scc AS b
         |       FROM e JOIN scc sa ON sa.v = e.src JOIN scc sb ON sb.v = e.dst
         |       WHERE sa.scc <> sb.scc),
         |walk AS (SELECT scc AS v, CAST(0 AS BIGINT) AS l FROM (SELECT DISTINCT scc FROM scc)
         |         UNION
         |         SELECT ce.b AS v, walk.l + 1 FROM walk JOIN ce ON ce.a = walk.v),
         |lvl AS (SELECT v AS scc, CAST(MAX(l) AS BIGINT) AS level FROM walk GROUP BY 1),
         |sz AS (SELECT scc, COUNT(*) AS n_members FROM scc GROUP BY 1)
         |SELECT scc, level, n_members FROM lvl JOIN sz USING (scc)""".stripMargin,

    // reach-from-set over the ORIGINAL edges (the recursive closure the Spark
    // side must equal): every (seed, vertex) the seed reaches, min seed per
    // vertex — proving the condensation-accelerated answer exactly; mirror of
    // GraphQueries.sccReachFromSet
    "g52_scc_reachability" ->
      s"""${snap.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |e AS (SELECT DISTINCT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |seeds AS (SELECT v AS seed FROM vx WHERE v % $SccReachSeedMod = 0),
         |r AS (SELECT seed, seed AS v FROM seeds
         |      UNION
         |      SELECT r.seed, e.dst AS v FROM r JOIN e ON e.src = r.v)
         |SELECT v AS vertex_id, MIN(seed) AS reachable_from FROM r GROUP BY v""".stripMargin,

    // fixed-L landmark table (md5-smallest selection) + bounded multi-landmark
    // BFS over the symmetrized edges, then the triangle-inequality argmin per
    // sampled pair — mirror of GraphQueries.landmarkDistances
    "g53_landmark_distances" -> {
      def round(h: Int) =
        s"""n$h AS (SELECT r${h - 1}.seed, und.dst AS v, CAST($h AS INTEGER) AS dist
           |       FROM r${h - 1} JOIN und ON r${h - 1}.v = und.src WHERE r${h - 1}.dist = ${h - 1}),
           |r$h AS (SELECT seed, v, MIN(dist) AS dist FROM (
           |         SELECT * FROM r${h - 1} UNION ALL SELECT * FROM n$h) GROUP BY 1, 2)""".stripMargin
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
         |vx AS (SELECT DISTINCT src AS v FROM und),
         |lm AS (SELECT v AS seed FROM vx ORDER BY md5(CAST(v AS VARCHAR)), v LIMIT $LandmarkCount),
         |r0 AS (SELECT seed, seed AS v, CAST(0 AS INTEGER) AS dist FROM lm),
         |${(1 to LandmarkHops).map(round).mkString(",\n")},
         |du AS (SELECT seed, v AS u, dist AS d_u FROM r$LandmarkHops WHERE v % $LandmarkUMod = 0),
         |dv AS (SELECT seed, v AS v2, dist AS d_v FROM r$LandmarkHops WHERE v % $LandmarkVMod = 0),
         |cand AS (SELECT u, v2 AS v, seed, d_u + d_v AS d_sum
         |         FROM du JOIN dv USING (seed) WHERE u <> v2)
         |SELECT u, v, CAST(d_sum AS INTEGER) AS d_est, seed AS via_landmark FROM (
         |  SELECT *, row_number() OVER (PARTITION BY u, v ORDER BY d_sum, seed) AS rk FROM cand)
         |WHERE rk = 1""".stripMargin
    },

    // φ(k) = 2·E_k / (N_k·(N_k−1)) among degree-> k vertices, per threshold,
    // half-up micro with the N_k < 2 degenerate zero — mirror of
    // GraphQueries.richClub
    "g64_rich_club" -> {
      val rows = RichClubKs.map { k =>
        s"""SELECT $k AS k,
           |  (SELECT COUNT(*) FROM deg WHERE d > $k) AS n_rich,
           |  (SELECT COUNT(*) FROM und
           |   WHERE lo IN (SELECT v FROM deg WHERE d > $k)
           |     AND hi IN (SELECT v FROM deg WHERE d > $k)) AS n_edges_within"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |deg AS (SELECT v, COUNT(*) AS d FROM (
         |          SELECT lo AS v FROM und UNION ALL SELECT hi FROM und)
         |        GROUP BY v),
         |r AS ($rows)
         |SELECT CAST(k AS INTEGER) AS k, CAST(n_rich AS BIGINT) AS n_rich,
         |  CAST(n_edges_within AS BIGINT) AS n_edges_within,
         |  CAST(CASE WHEN n_rich < 2 THEN 0
         |       ELSE (2 * 1000000 * 2 * n_edges_within + n_rich * (n_rich - 1))
         |            // (2 * n_rich * (n_rich - 1)) END AS BIGINT) AS phi_micro
         |FROM r""".stripMargin
    },

    // 3·triangles / Σ d(d−1)/2 off the g21 oriented closure, one half-up micro
    // division, wedge-free degenerate zero — mirror of GraphQueries.transitivity
    "g63_transitivity" ->
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |tri AS (SELECT COUNT(*) AS n_triangles
         |        FROM und e1
         |        JOIN und e2 ON e2.lo = e1.hi
         |        JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
         |wg AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM (
         |         SELECT COUNT(*) AS d FROM (
         |           SELECT lo AS v FROM und UNION ALL SELECT hi FROM und)
         |         GROUP BY v))
         |SELECT CAST(n_triangles AS BIGINT) AS n_triangles, n_wedges,
         |  CAST(CASE WHEN n_wedges = 0 THEN 0
         |       ELSE (2 * 1000000 * 3 * n_triangles + n_wedges) // (2 * n_wedges)
         |       END AS BIGINT) AS transitivity_micro
         |FROM tri CROSS JOIN wg""".stripMargin,

    // Pearson correlation of endpoint degrees over the directed-pair multiset,
    // exact integer sums + one fixed double sequence, degree-regular graphs
    // report the explicit degenerate zero — mirror of
    // GraphQueries.degreeAssortativity
    "g62_assortativity" ->
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
         |deg AS (SELECT src AS v, COUNT(*) AS d FROM und GROUP BY 1),
         |pr AS (SELECT da.d AS dx, db.d AS dy
         |       FROM und JOIN deg da ON da.v = und.src JOIN deg db ON db.v = und.dst),
         |s AS (SELECT COUNT(*) AS n,
         |        CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         |        CAST(SUM(dx * dy) AS BIGINT) AS sxy,
         |        CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         |        CAST(SUM(dy * dy) AS BIGINT) AS syy
         |      FROM pr)
         |SELECT CAST(n AS BIGINT) AS n_directed_pairs,
         |  CAST(CASE WHEN n = 0 OR n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
         |       THEN 1 ELSE 0 END AS INTEGER) AS degenerate,
         |  CAST(CASE WHEN n = 0 OR n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
         |       THEN 0
         |       ELSE floor(1000000.0 * ((n * sxy - sx * sy)::DOUBLE
         |              / sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE))
         |            + 0.5) END AS BIGINT) AS assortativity_micro
         |FROM s""".stripMargin,

    // deterministic Luby MIS: fixed md5 priorities, each unrolled round takes
    // the strict local minima of the arena and removes their neighborhoods;
    // the Spark side's early exit is output-identical (empty arena ⇒ empty
    // rounds) — mirror of GraphQueries.maximalIndependentSet.
    // COMPLETENESS PROBE (r14 ADVICE): the oracle unrolls exactly MisRounds
    // rounds, the same budget the Spark kernel raises past. So that the oracle
    // cannot silently return a PARTIAL (non-maximal) MIS on a graph needing
    // more rounds, the final UNION emits every vertex still in the residual
    // arena a{MisRounds} with round = -1: a non-converged graph makes the
    // oracle's output loudly non-MIS-shaped on the same inputs where the Spark
    // side raises — both engines fail, neither silently diverges.
    "g61_mis" -> {
      def round(r: Int) =
        s"""w$r AS MATERIALIZED (SELECT a.v FROM a${r - 1} a JOIN pv p USING (v)
           |  WHERE NOT EXISTS (
           |    SELECT 1 FROM und e JOIN a${r - 1} n ON n.v = e.dst
           |    JOIN pv pn ON pn.v = n.v
           |    WHERE e.src = a.v
           |      AND (pn.h < p.h OR (pn.h = p.h AND pn.v < p.v)))),
           |a$r AS MATERIALIZED (SELECT v FROM a${r - 1}
           |  WHERE v NOT IN (SELECT v FROM w$r)
           |    AND v NOT IN (SELECT e.dst FROM und e JOIN w$r w ON w.v = e.src))"""
          .stripMargin
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
         |vx AS (SELECT DISTINCT src AS v FROM und),
         |pv AS (SELECT v, ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT AS h
         |       FROM vx),
         |a0 AS (SELECT v FROM vx),
         |${(1 to MisRounds).map(round).mkString(",\n")}
         |${(1 to MisRounds).map(r =>
             s"SELECT v, CAST($r AS INTEGER) AS round FROM w$r").mkString("\nUNION ALL\n")}
         |UNION ALL
         |SELECT v, CAST(-1 AS INTEGER) AS round FROM a$MisRounds"""
        .stripMargin
    },

    // the g53 sketch in cost units: weighted per-seed relaxation tables
    // (undirected min-cost pairs), then the min landmark-sum estimate per
    // (u, v) — mirror of GraphQueries.weightedLandmarks
    "g60_weighted_landmarks" -> {
      def round(h: Int) =
        s"""x$h AS (SELECT r${h - 1}.seed, und.dst AS v, r${h - 1}.d + und.w AS d
           |       FROM r${h - 1} JOIN und ON r${h - 1}.v = und.src),
           |r$h AS MATERIALIZED (SELECT seed, v, MIN(d) AS d FROM (
           |         SELECT * FROM r${h - 1} UNION ALL SELECT * FROM x$h) GROUP BY 1, 2)"""
          .stripMargin
      s"""$snap,
         |e AS MATERIALIZED (SELECT least(source_id, destination_id) AS a,
         |         greatest(source_id, destination_id) AS b,
         |         CAST(1 + MIN(position) % $SsspWeightMod AS BIGINT) AS w
         |       FROM edges
         |       WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id
         |       GROUP BY 1, 2),
         |und AS (SELECT a AS src, b AS dst, w FROM e
         |        UNION ALL SELECT b, a, w FROM e),
         |vx AS (SELECT DISTINCT src AS v FROM und),
         |lm AS (SELECT v AS seed FROM vx ORDER BY md5(CAST(v AS VARCHAR)), v
         |       LIMIT $LandmarkCount),
         |r0 AS (SELECT seed, seed AS v, CAST(0 AS BIGINT) AS d FROM lm),
         |${(1 to WLandmarkHops).map(round).mkString(",\n")},
         |du AS (SELECT seed, v AS u, d AS d_u FROM r$WLandmarkHops
         |       WHERE v % $LandmarkUMod = 0),
         |dv AS (SELECT seed, v AS v2, d AS d_v FROM r$WLandmarkHops
         |       WHERE v % $LandmarkVMod = 0),
         |cand AS (SELECT u, v2 AS v, seed, d_u + d_v AS d_sum
         |         FROM du JOIN dv USING (seed) WHERE u <> v2)
         |SELECT u, v, CAST(d_sum AS BIGINT) AS d_est, seed AS via_landmark FROM (
         |  SELECT *, row_number() OVER (PARTITION BY u, v ORDER BY d_sum, seed) AS rk
         |  FROM cand)
         |WHERE rk = 1""".stripMargin
    },

    // hop-bounded weighted SSSP from the SsspSeeds smallest-md5 seed set:
    // dist = min total (1 + position % mod) weight over ≤SsspHops-edge
    // directed paths, rounds unrolled as chained MATERIALIZED CTEs (the
    // Spark side's early exit is output-identical by min-relax monotonicity)
    // — mirror of GraphQueries.weightedSssp
    "g59_weighted_sssp" -> {
      def round(h: Int) =
        s"""x$h AS (SELECT e.dst AS v, d.d + e.w AS d
           |       FROM d${h - 1} d JOIN e ON e.src = d.v),
           |d$h AS MATERIALIZED (SELECT v, MIN(d) AS d FROM (
           |         SELECT * FROM d${h - 1} UNION ALL SELECT * FROM x$h) GROUP BY 1)"""
          .stripMargin
      s"""$snap,
         |e AS MATERIALIZED (SELECT source_id AS src, destination_id AS dst,
         |         CAST(1 + MIN(position) % $SsspWeightMod AS BIGINT) AS w
         |       FROM edges
         |       WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id
         |       GROUP BY 1, 2),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION SELECT dst FROM e)),
         |sd AS (SELECT v FROM vx ORDER BY md5(CAST(v AS VARCHAR)), v LIMIT $SsspSeeds),
         |d0 AS (SELECT v, CAST(0 AS BIGINT) AS d FROM sd),
         |${(1 to SsspHops).map(round).mkString(",\n")}
         |SELECT v, CAST(d AS BIGINT) AS dist_w FROM d$SsspHops""".stripMargin
    },

    // HyperANF: per-vertex HLL counters (sk01's register recipe at b = 4)
    // advanced by register max-merge along out-edges, rounds unrolled as
    // chained CTEs; ball estimates linear-counted below 2.5m, micro-quantized
    // per vertex before the exact integer total — mirror of
    // GraphQueries.hyperAnf
    "g54_hyperanf" -> hyperAnfSql,

    // Borůvka MSF: per round every component's min incident cross edge under
    // the strict (w, a, b) order, contraction by `MsfPropSteps` symmetric
    // min-label propagation steps over the picked-edge graph, rounds unrolled
    // as chained MATERIALIZED CTEs (each l/pe is consumed several times — an
    // inlined replay would cascade exponentially) — mirror of
    // GraphQueries.minSpanningForest
    "g57_msf" -> {
      val sb = new StringBuilder
      sb ++= s"""$snap,
         |ue AS MATERIALIZED (SELECT least(source_id, destination_id) AS a,
         |              greatest(source_id, destination_id) AS b,
         |              CAST(MIN(position) AS BIGINT) AS w
         |       FROM edges
         |       WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id
         |       GROUP BY 1, 2),
         |l0 AS MATERIALIZED (SELECT v, v AS c FROM
         |       (SELECT DISTINCT a AS v FROM ue UNION SELECT b FROM ue))""".stripMargin
      for (r <- 1 to MsfRounds) {
        sb ++= s""",
           |x$r AS MATERIALIZED (SELECT e.a, e.b, e.w, la.c AS ca, lb.c AS cb
           |  FROM ue e JOIN l${r - 1} la ON la.v = e.a JOIN l${r - 1} lb ON lb.v = e.b
           |  WHERE la.c <> lb.c),
           |pe$r AS MATERIALIZED (SELECT DISTINCT w, a, b FROM (
           |    SELECT *, row_number() OVER (PARTITION BY c ORDER BY w, a, b) AS rk
           |    FROM (SELECT ca AS c, w, a, b FROM x$r
           |          UNION ALL SELECT cb, w, a, b FROM x$r))
           |  WHERE rk = 1),
           |pg$r AS MATERIALIZED (SELECT DISTINCT c1, c2 FROM (
           |    SELECT la.c AS c1, lb.c AS c2 FROM pe$r e
           |      JOIN l${r - 1} la ON la.v = e.a JOIN l${r - 1} lb ON lb.v = e.b
           |    UNION ALL
           |    SELECT lb.c, la.c FROM pe$r e
           |      JOIN l${r - 1} la ON la.v = e.a JOIN l${r - 1} lb ON lb.v = e.b)),
           |m${r}_0 AS MATERIALIZED (SELECT c, c AS m FROM (SELECT DISTINCT c FROM l${r - 1}))"""
          .stripMargin
        for (p <- 1 to MsfPropSteps) {
          sb ++= s""",
             |m${r}_$p AS MATERIALIZED (SELECT c, MIN(m) AS m FROM (
             |    SELECT c, m FROM m${r}_${p - 1}
             |    UNION ALL
             |    SELECT pg.c1 AS c, mm.m FROM pg$r pg
             |      JOIN m${r}_${p - 1} mm ON mm.c = pg.c2) GROUP BY c)""".stripMargin
        }
        sb ++= s""",
           |l$r AS MATERIALIZED (SELECT l.v, m.m AS c
           |  FROM l${r - 1} l JOIN m${r}_$MsfPropSteps m ON m.c = l.c)""".stripMargin
      }
      sb ++= s"""
         |SELECT DISTINCT a, b, w FROM (
         |  ${(1 to MsfRounds).map(r => s"SELECT * FROM pe$r").mkString(" UNION ALL ")})"""
        .stripMargin
      sb.toString
    },

    // greedy weighted matching by locally-dominant edges: per round every
    // unmatched vertex points at its min eligible incident edge under the
    // strict (w, a, b) order, mutual picks lock; rounds unrolled as chained
    // MATERIALIZED CTEs — mirror of GraphQueries.maximalMatching
    "g58_matching" -> {
      val sb = new StringBuilder
      sb ++= s"""$snap,
         |el0 AS MATERIALIZED (SELECT least(source_id, destination_id) AS a,
         |              greatest(source_id, destination_id) AS b,
         |              CAST(MIN(position) AS BIGINT) AS w
         |       FROM edges
         |       WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id
         |       GROUP BY 1, 2)""".stripMargin
      for (r <- 1 to MatchRounds) {
        sb ++= s""",
           |bp$r AS MATERIALIZED (SELECT v, w, a, b FROM (
           |    SELECT *, row_number() OVER (PARTITION BY v ORDER BY w, a, b) AS rk
           |    FROM (SELECT a AS v, w, a, b FROM el${r - 1}
           |          UNION ALL SELECT b, w, a, b FROM el${r - 1}))
           |  WHERE rk = 1),
           |lk$r AS MATERIALIZED (SELECT e.a, e.b, e.w FROM el${r - 1} e
           |  JOIN bp$r pa ON pa.v = e.a AND pa.w = e.w AND pa.a = e.a AND pa.b = e.b
           |  JOIN bp$r pb ON pb.v = e.b AND pb.w = e.w AND pb.a = e.a AND pb.b = e.b),
           |el$r AS MATERIALIZED (SELECT e.* FROM el${r - 1} e
           |  WHERE NOT EXISTS (SELECT 1 FROM lk$r l WHERE l.a = e.a OR l.b = e.a
           |                      OR l.a = e.b OR l.b = e.b))""".stripMargin
      }
      sb ++= s"""
         |SELECT a, b, w FROM (
         |  ${(1 to MatchRounds).map(r => s"SELECT * FROM lk$r").mkString(" UNION ALL ")})"""
        .stripMargin
      sb.toString
    },

    // coreness by h-index iteration: h0 = degree, each round the h-index of
    // neighbor values via the sorted-desc max(least(nh, rn)) identity, rounds
    // unrolled as chained window CTEs — mirror of GraphQueries.coreness
    "g56_coreness" -> {
      def round(t: Int) =
        s"""h$t AS (SELECT v, CAST(MAX(LEAST(nh, rn)) AS BIGINT) AS h FROM (
           |         SELECT e.src AS v, e.dst, h.h AS nh,
           |                row_number() OVER (PARTITION BY e.src ORDER BY h.h DESC, e.dst ASC)
           |                  AS rn
           |         FROM e JOIN h${t - 1} h ON h.v = e.dst) GROUP BY 1)""".stripMargin
      s"""$snap,
         |e0 AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |       WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |e AS (SELECT DISTINCT src, dst
         |      FROM (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
         |h0 AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS h FROM e GROUP BY 1),
         |${(1 to CorenessRounds).map(round).mkString(",\n")}
         |SELECT v AS vertex_id, h AS coreness FROM h$CorenessRounds""".stripMargin
    },

    // Effective diameter: the g54 curve reduced to its interpolated 90% point,
    // every intermediate a small exact integer because the interpolation reads
    // the already micro-quantized frac column; the raw curve is first replaced
    // by its monotone envelope (running max) because the HyperANF estimator can
    // dip across its linear-counting regime switch — mirror of
    // GraphQueries.effectiveDiameter
    "g55_effective_diameter" -> {
      val target = EffDiameterPct.toLong * 10000L
      s"""SELECT CAST(t AS INTEGER) AS t_hit,
         |  CAST(CASE WHEN prev_frac IS NULL THEN 0
         |       ELSE (t - 1) * 1000000 +
         |            (2 * 1000000 * ($target - prev_frac) + (frac_micro - prev_frac)) //
         |            (2 * (frac_micro - prev_frac)) END AS BIGINT) AS eff_diameter_micro,
         |  nf_max
         |FROM (
         |  SELECT t, frac_micro,
         |         lag(frac_micro) OVER (ORDER BY t) AS prev_frac,
         |         MAX(nf_micro) OVER () AS nf_max
         |  FROM (
         |    SELECT t, nf_micro,
         |           MAX(frac_micro) OVER (ORDER BY t
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS frac_micro
         |    FROM ($hyperAnfSql)))
         |WHERE frac_micro >= $target AND (prev_frac IS NULL OR prev_frac < $target)""".stripMargin
    },

    // Katz centrality, 3 unrolled attenuated-walk rounds in integer micro units
    // (x_t = (β_pct · in_sum) // 100, β = 50%) — mirror of
    // GraphQueries.katzCentrality
    "g47_katz" ->
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |x0 AS (SELECT v, CAST(1000000 AS BIGINT) AS x FROM vx),
         |c1 AS (SELECT e.dst AS v, CAST(SUM(x0.x) AS BIGINT) AS s
         |       FROM e JOIN x0 ON x0.v = e.src GROUP BY e.dst),
         |x1 AS (SELECT vx.v, (COALESCE(c1.s, 0) * $KatzBetaPct) // 100 AS x FROM vx LEFT JOIN c1 USING (v)),
         |c2 AS (SELECT e.dst AS v, CAST(SUM(x1.x) AS BIGINT) AS s
         |       FROM e JOIN x1 ON x1.v = e.src GROUP BY e.dst),
         |x2 AS (SELECT vx.v, (COALESCE(c2.s, 0) * $KatzBetaPct) // 100 AS x FROM vx LEFT JOIN c2 USING (v)),
         |c3 AS (SELECT e.dst AS v, CAST(SUM(x2.x) AS BIGINT) AS s
         |       FROM e JOIN x2 ON x2.v = e.src GROUP BY e.dst),
         |x3 AS (SELECT vx.v, (COALESCE(c3.s, 0) * $KatzBetaPct) // 100 AS x FROM vx LEFT JOIN c3 USING (v))
         |SELECT vx.v AS vertex_id, CAST(x1.x + x2.x + x3.x AS BIGINT) AS katz_fp
         |FROM vx JOIN x1 USING (v) JOIN x2 USING (v) JOIN x3 USING (v)""".stripMargin,

    // sampled-source bounded-depth Brandes: 3 unrolled BFS levels with exact
    // integer path counts, backward dependency fold with per-edge terms
    // floor(σv·(1e6 + δw)/σw + ½) — mirror of GraphQueries.betweennessSampled
    "g48_betweenness" ->
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |l0 AS (SELECT v AS s, v, CAST(1 AS BIGINT) AS sigma FROM vx WHERE v % $WalkSeedMod = 0),
         |r1 AS (SELECT l0.s, e.dst AS v, CAST(SUM(l0.sigma) AS BIGINT) AS sigma
         |       FROM l0 JOIN e ON e.src = l0.v GROUP BY 1, 2),
         |l1 AS (SELECT r1.* FROM r1
         |       WHERE NOT EXISTS (SELECT 1 FROM l0 WHERE l0.s = r1.s AND l0.v = r1.v)),
         |r2 AS (SELECT l1.s, e.dst AS v, CAST(SUM(l1.sigma) AS BIGINT) AS sigma
         |       FROM l1 JOIN e ON e.src = l1.v GROUP BY 1, 2),
         |l2 AS (SELECT r2.* FROM r2
         |       WHERE NOT EXISTS (SELECT 1 FROM l0 WHERE l0.s = r2.s AND l0.v = r2.v)
         |         AND NOT EXISTS (SELECT 1 FROM l1 WHERE l1.s = r2.s AND l1.v = r2.v)),
         |r3 AS (SELECT l2.s, e.dst AS v, CAST(SUM(l2.sigma) AS BIGINT) AS sigma
         |       FROM l2 JOIN e ON e.src = l2.v GROUP BY 1, 2),
         |l3 AS (SELECT r3.* FROM r3
         |       WHERE NOT EXISTS (SELECT 1 FROM l0 WHERE l0.s = r3.s AND l0.v = r3.v)
         |         AND NOT EXISTS (SELECT 1 FROM l1 WHERE l1.s = r3.s AND l1.v = r3.v)
         |         AND NOT EXISTS (SELECT 1 FROM l2 WHERE l2.s = r3.s AND l2.v = r3.v)),
         |d2 AS (SELECT l2.s, l2.v,
         |         CAST(SUM(CAST(floor((l2.sigma * 1000000)::DOUBLE / l3.sigma::DOUBLE + 0.5) AS BIGINT)) AS BIGINT) AS delta
         |       FROM l2 JOIN e ON e.src = l2.v
         |       JOIN l3 ON l3.s = l2.s AND l3.v = e.dst
         |       GROUP BY 1, 2),
         |d1 AS (SELECT l1.s, l1.v,
         |         CAST(SUM(CAST(floor((l1.sigma * (1000000 + COALESCE(d2.delta, 0)))::DOUBLE / l2.sigma::DOUBLE + 0.5) AS BIGINT)) AS BIGINT) AS delta
         |       FROM l1 JOIN e ON e.src = l1.v
         |       JOIN l2 ON l2.s = l1.s AND l2.v = e.dst
         |       LEFT JOIN d2 ON d2.s = l2.s AND d2.v = l2.v
         |       GROUP BY 1, 2)
         |SELECT v AS vertex_id, CAST(SUM(delta) AS BIGINT) AS btw_micro
         |FROM (SELECT s, v, delta FROM d1 UNION ALL SELECT s, v, delta FROM d2)
         |GROUP BY 1""".stripMargin,

    "g01_lww_snapshot" ->
      s"""$snap SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges""",
    "g02_adjacency_topk" ->
      s"""$snap SELECT graph_id, source_id, destination_id, position, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT graph_id, source_id, destination_id, position,
         |         row_number() OVER (PARTITION BY graph_id, source_id ORDER BY position DESC) AS rank
         |  FROM edges WHERE state = 0)
         |WHERE rank <= 3""".stripMargin,
    "g03_intersection" ->
      s"""$snap SELECT destination_id AS neighbor_id FROM edges
         |WHERE graph_id = 1 AND source_id = 1 AND state = 0
         |  AND destination_id IN (SELECT destination_id FROM edges
         |                         WHERE graph_id = 1 AND source_id = 2 AND state = 0)""".stripMargin,
    "g04_difference" ->
      s"""$snap SELECT destination_id AS neighbor_id FROM edges
         |WHERE graph_id = 1 AND source_id = 1 AND state = 0
         |  AND destination_id NOT IN (SELECT destination_id FROM edges
         |                             WHERE graph_id = 1 AND source_id = 2 AND state = 0)""".stripMargin,
    "g05_union" ->
      s"""$snap SELECT destination_id AS neighbor_id FROM edges
         |WHERE graph_id = 1 AND source_id = 1 AND state = 0
         |UNION
         |SELECT destination_id FROM edges WHERE graph_id = 1 AND source_id = 2 AND state = 0""".stripMargin,
    "g06_reciprocal" ->
      s"""$snap SELECT a.graph_id, a.source_id, a.destination_id FROM edges a
         |WHERE a.state = 0 AND EXISTS (
         |  SELECT 1 FROM edges b
         |  WHERE b.graph_id = a.graph_id AND b.source_id = a.destination_id
         |    AND b.destination_id = a.source_id AND b.state = 0)""".stripMargin,
    "g07_metadata" ->
      s"""$meta SELECT graph_id, source_id, state, c AS "count", mu AS updated_at FROM meta""",
    "g08_count2_estimates" ->
      s"""$meta,
         |g AS (SELECT DISTINCT graph_id FROM edges),
         |m1 AS (SELECT graph_id, c FROM meta WHERE source_id = 1 AND state = 0),
         |m2 AS (SELECT graph_id, c FROM meta WHERE source_id = 2 AND state = 0)
         |SELECT g.graph_id,
         |       CAST(FLOOR(LEAST(COALESCE(m1.c, 0), COALESCE(m2.c, 0)) * 0.1) AS BIGINT) AS est_intersection,
         |       CAST(GREATEST(COALESCE(m1.c, 0), COALESCE(m2.c, 0)) AS BIGINT) AS est_union,
         |       CAST(COALESCE(m1.c, 0) AS BIGINT) AS est_difference
         |FROM g LEFT JOIN m1 USING (graph_id) LEFT JOIN m2 USING (graph_id)""".stripMargin,
    "g09_cursor_page" ->
      s"""$snap,
         |adj AS (SELECT destination_id AS neighbor_id, position FROM edges
         |        WHERE graph_id = 1 AND source_id = 1 AND state = 0)
         |SELECT neighbor_id, position FROM adj
         |WHERE position < (SELECT (MIN(position) + MAX(position)) // 2 FROM adj)
         |ORDER BY position DESC LIMIT 5""".stripMargin,
    "g10_contains" ->
      s"""$snap SELECT source_id, destination_id, state FROM edges
         |WHERE graph_id = 1 AND state IN (0, 3)""".stripMargin,
    "g11_where_in" ->
      s"""$snap SELECT destination_id AS neighbor_id FROM edges
         |WHERE graph_id = 1 AND source_id = 1 AND state = 0 AND destination_id BETWEEN 1 AND 30""".stripMargin,
    "g12_execute_lww" ->
      s"""$snap,
         |ops AS (SELECT CAST(1 + event_id % 3 AS INTEGER) AS graph_id,
         |               user_id AS source_id,
         |               1 + (event_id * 7919) % 97 AS destination_id,
         |               CAST(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS INTEGER) AS state,
         |               CAST(2000000 + event_id % 100 AS INTEGER) AS updated_at
         |        FROM events WHERE event_id % 7 = 0),
         |ops_edges AS (
         |  SELECT o.graph_id, o.source_id, o.destination_id, e.position, o.updated_at, o.state
         |  FROM ops o JOIN edges e USING (graph_id, source_id, destination_id)),
         |combined AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges_raw
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM ops_edges)
         |SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY graph_id, source_id, destination_id
         |    ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |  FROM combined)
         |WHERE rn = 1""".stripMargin,
    "g13_bulk_archive" ->
      s"""$snap SELECT graph_id, source_id, destination_id, position,
         |  CAST(CASE WHEN graph_id = 2 AND source_id % 10 = 0 AND state <> 1
         |            THEN 3000000 ELSE updated_at END AS INTEGER) AS updated_at,
         |  CAST(CASE WHEN graph_id = 2 AND source_id % 10 = 0 AND state <> 1
         |            THEN 2 ELSE state END AS INTEGER) AS state
         |FROM edges""".stripMargin,
    "g14_copy_repair" ->
      s"""$snap SELECT graph_id, COUNT(*) AS n_edges,
         |  CAST(SUM(position) AS BIGINT) AS sum_pos,
         |  CAST(SUM(CAST(state AS BIGINT)) AS BIGINT) AS sum_state
         |FROM edges GROUP BY graph_id""".stripMargin,
    "g15_nested_compound" ->
      s"""$snap,
         |u AS (SELECT destination_id AS neighbor_id FROM edges
         |      WHERE graph_id = 1 AND source_id = 1 AND state = 0
         |      UNION
         |      SELECT destination_id FROM edges WHERE graph_id = 1 AND source_id = 2 AND state = 0)
         |SELECT neighbor_id FROM u
         |WHERE neighbor_id IN (SELECT destination_id FROM edges
         |                      WHERE graph_id = 1 AND source_id = 3 AND state = 0)""".stripMargin,
    "g16_uuid_functions" ->
      s"""$snap SELECT source_id, destination_id,
         |  (CAST(updated_at AS BIGINT) * 1000) << 20 AS uuid_position,
         |  ((CAST(updated_at AS BIGINT) * 1000) << 20) >> 20 AS millis_roundtrip,
         |  CAST(-graph_id AS INTEGER) AS backward_graph_id
         |FROM edges WHERE graph_id = 1 AND source_id = 1""".stripMargin,
    "g17_pagerank" ->
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |nn AS (SELECT COUNT(*) AS n FROM vx),
         |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT v, 1000000000000 // (SELECT n FROM nn) AS pr FROM vx),
         |c1 AS (SELECT e.dst AS v, CAST(SUM(r0.pr // deg.deg) AS BIGINT) AS in_sum
         |       FROM e JOIN deg USING (src) JOIN r0 ON r0.v = e.src GROUP BY e.dst),
         |r1 AS (SELECT vx.v, 150000000000 // (SELECT n FROM nn) + (COALESCE(c1.in_sum, 0) * 85) // 100 AS pr
         |       FROM vx LEFT JOIN c1 USING (v)),
         |c2 AS (SELECT e.dst AS v, CAST(SUM(r1.pr // deg.deg) AS BIGINT) AS in_sum
         |       FROM e JOIN deg USING (src) JOIN r1 ON r1.v = e.src GROUP BY e.dst),
         |r2 AS (SELECT vx.v, 150000000000 // (SELECT n FROM nn) + (COALESCE(c2.in_sum, 0) * 85) // 100 AS pr
         |       FROM vx LEFT JOIN c2 USING (v)),
         |c3 AS (SELECT e.dst AS v, CAST(SUM(r2.pr // deg.deg) AS BIGINT) AS in_sum
         |       FROM e JOIN deg USING (src) JOIN r2 ON r2.v = e.src GROUP BY e.dst),
         |r3 AS (SELECT vx.v, 150000000000 // (SELECT n FROM nn) + (COALESCE(c3.in_sum, 0) * 85) // 100 AS pr
         |       FROM vx LEFT JOIN c3 USING (v))
         |SELECT v AS vertex_id, CAST(pr AS BIGINT) AS pagerank_fp FROM r3""".stripMargin,

    // Recency-decayed PageRank: positions derive from updated_at via F1
    // ((u*1000)<<20, inverse >>20 — ms is therefore exactly updated_at*1000);
    // weight = 10000 // (1 + ageSec // 60) basis points, contribution
    // (pr*w) // wsum — all exact integer arithmetic, mirror of
    // GraphQueries.decayedPageRank
    "g37_decayed_pagerank" ->
      s"""$snap,
         |e0 AS (SELECT source_id AS src, destination_id AS dst,
         |              CAST(updated_at AS BIGINT) * 1000 AS ms
         |       FROM edges WHERE graph_id = 1 AND state = 0),
         |mx AS (SELECT MAX(ms) AS maxms FROM e0),
         |ew AS (SELECT src, dst,
         |              greatest(1, 10000 // (1 + (((SELECT maxms FROM mx) - ms) // 1000) // 60)) AS w
         |       FROM e0),
         |ws AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wsum FROM ew GROUP BY src),
         |e AS (SELECT ew.src, ew.dst, ew.w, ws.wsum FROM ew JOIN ws USING (src)),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |nn AS (SELECT COUNT(*) AS n FROM vx),
         |r0 AS (SELECT v, 1000000000000 // (SELECT n FROM nn) AS pr FROM vx),
         |c1 AS (SELECT e.dst AS v, CAST(SUM((r0.pr * e.w) // e.wsum) AS BIGINT) AS in_sum
         |       FROM e JOIN r0 ON r0.v = e.src GROUP BY e.dst),
         |r1 AS (SELECT vx.v, 150000000000 // (SELECT n FROM nn) + (COALESCE(c1.in_sum, 0) * 85) // 100 AS pr
         |       FROM vx LEFT JOIN c1 USING (v)),
         |c2 AS (SELECT e.dst AS v, CAST(SUM((r1.pr * e.w) // e.wsum) AS BIGINT) AS in_sum
         |       FROM e JOIN r1 ON r1.v = e.src GROUP BY e.dst),
         |r2 AS (SELECT vx.v, 150000000000 // (SELECT n FROM nn) + (COALESCE(c2.in_sum, 0) * 85) // 100 AS pr
         |       FROM vx LEFT JOIN c2 USING (v)),
         |c3 AS (SELECT e.dst AS v, CAST(SUM((r2.pr * e.w) // e.wsum) AS BIGINT) AS in_sum
         |       FROM e JOIN r2 ON r2.v = e.src GROUP BY e.dst),
         |r3 AS (SELECT vx.v, 150000000000 // (SELECT n FROM nn) + (COALESCE(c3.in_sum, 0) * 85) // 100 AS pr
         |       FROM vx LEFT JOIN c3 USING (v))
         |SELECT v AS vertex_id, CAST(pr AS BIGINT) AS dpr_fp FROM r3""".stripMargin,

    // Bounded k-truss peeling, rounds pinned: per round, per-edge triangle support
    // over the id-oriented closure, prune edges with support < k-2, then report
    // survivors with recomputed support — mirror of GraphQueries.kTruss, unrolled
    // from the SAME (KTrussK, KTrussRounds) constants the query registration uses
    "g38_ktruss" -> {
      // every tri() references its edge CTE 3x and each round chains on the last, so
      // un-materialized CTEs inline EXPONENTIALLY (3^rounds copies of the base scan —
      // measured: DuckDB never finishes); MATERIALIZED pins linear evaluation
      def tri(e: String, t: String): String =
        s"$t AS MATERIALIZED (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c FROM $e e1 " +
          s"JOIN $e e2 ON e2.lo = e1.hi JOIN $e e3 ON e3.lo = e1.lo AND e3.hi = e2.hi)"
      def sup(t: String, s: String): String =
        s"$s AS MATERIALIZED (SELECT lo, hi, count(*) AS sup FROM (SELECT a AS lo, b AS hi FROM $t " +
          s"UNION ALL SELECT a AS lo, c AS hi FROM $t " +
          s"UNION ALL SELECT b AS lo, c AS hi FROM $t) GROUP BY 1, 2)"
      def prune(e: String, s: String, out: String): String =
        s"$out AS MATERIALIZED (SELECT u.lo, u.hi FROM $e u JOIN $s USING (lo, hi) " +
          s"WHERE sup >= ${KTrussK - 2})"
      val roundCtes = (1 to KTrussRounds).map { i =>
        val prev = if (i == 1) "und" else s"p${i - 1}"
        s"${tri(prev, s"t$i")},\n${sup(s"t$i", s"s$i")},\n${prune(prev, s"s$i", s"p$i")}"
      }
      val last = s"p$KTrussRounds"
      val (tN, sN) = (s"t${KTrussRounds + 1}", s"s${KTrussRounds + 1}")
      s"""$snap,
         |und AS MATERIALIZED (SELECT DISTINCT least(source_id, destination_id) AS lo,
         |                        greatest(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |${roundCtes.mkString(",\n")},
         |${tri(last, tN)},
         |${sup(tN, sN)}
         |SELECT p.lo AS lo_id, p.hi AS hi_id,
         |  CAST(COALESCE($sN.sup, 0) AS BIGINT) AS support
         |FROM $last p LEFT JOIN $sN USING (lo, hi)""".stripMargin
    },

    // Bounded Bellman-Ford from the mod-100 seed set, weight 1 + dst % 7, 3 pinned
    // relaxation rounds — mirror of GraphQueries.boundedSssp
    "g39_sssp" ->
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst,
         |             1 + destination_id % 7 AS w
         |      FROM edges WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |d0 AS (SELECT v, CAST(0 AS BIGINT) AS d FROM vx WHERE v % 100 = 0),
         |r1 AS (SELECT v, CAST(MIN(d) AS BIGINT) AS d FROM (
         |         SELECT v, d FROM d0
         |         UNION ALL
         |         SELECT e.dst AS v, d0.d + e.w AS d FROM e JOIN d0 ON d0.v = e.src)
         |       GROUP BY v),
         |r2 AS (SELECT v, CAST(MIN(d) AS BIGINT) AS d FROM (
         |         SELECT v, d FROM r1
         |         UNION ALL
         |         SELECT e.dst AS v, r1.d + e.w AS d FROM e JOIN r1 ON r1.v = e.src)
         |       GROUP BY v),
         |r3 AS (SELECT v, CAST(MIN(d) AS BIGINT) AS d FROM (
         |         SELECT v, d FROM r2
         |         UNION ALL
         |         SELECT e.dst AS v, r2.d + e.w AS d FROM e JOIN r2 ON r2.v = e.src)
         |       GROUP BY v)
         |SELECT v AS vertex_id, d AS dist FROM r3""".stripMargin,

    // Bounded synchronous label propagation, LpaRounds pinned rounds: per round every
    // vertex adopts its neighbors' most frequent label, argmax tie-break
    // (count desc, label asc) — mirror of GraphQueries.lpaCommunities (g22 is the
    // different min-label CC kernel; this is community detection by majority vote)
    "g40_lpa_communities" -> {
      def roundCtes(i: Int): String = {
        val prev = s"l${i - 1}"
        s"""n$i AS (SELECT adj.src AS v, l.label, COUNT(*) AS c
           |        FROM adj JOIN $prev l ON l.v = adj.dst
           |        GROUP BY 1, 2),
           |l$i AS MATERIALIZED (SELECT v, label FROM (
           |       SELECT v, label,
           |              row_number() OVER (PARTITION BY v ORDER BY c DESC, label) AS rk
           |       FROM n$i)
           |     WHERE rk = 1)""".stripMargin
      }
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |adj AS (SELECT lo AS src, hi AS dst FROM und UNION ALL SELECT hi, lo FROM und),
         |l0 AS (SELECT DISTINCT src AS v, src AS label FROM adj),
         |${(1 to LpaRounds).map(roundCtes).mkString(",\n")}
         |SELECT v AS vertex_id, label AS community FROM l$LpaRounds""".stripMargin
    },

    // Newman modularity of the g40 LPA partition: per-community internal-edge
    // fraction minus the degree-mass expectation, exact integers until the one
    // final micro-quantized double sequence — mirror of GraphQueries.modularity
    "g46_modularity" -> {
      def roundCtes(i: Int): String = {
        val prev = s"l${i - 1}"
        s"""n$i AS (SELECT adj.src AS v, l.label, COUNT(*) AS c
           |        FROM adj JOIN $prev l ON l.v = adj.dst
           |        GROUP BY 1, 2),
           |l$i AS MATERIALIZED (SELECT v, label FROM (
           |       SELECT v, label,
           |              row_number() OVER (PARTITION BY v ORDER BY c DESC, label) AS rk
           |       FROM n$i)
           |     WHERE rk = 1)""".stripMargin
      }
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |adj AS (SELECT lo AS src, hi AS dst FROM und UNION ALL SELECT hi, lo FROM und),
         |l0 AS (SELECT DISTINCT src AS v, src AS label FROM adj),
         |${(1 to LpaRounds).map(roundCtes).mkString(",\n")},
         |comm AS (SELECT v, label AS community FROM l$LpaRounds),
         |mt AS (SELECT COUNT(*) AS m FROM und),
         |deg AS (SELECT v, COUNT(*) AS degree
         |        FROM (SELECT lo AS v FROM und UNION ALL SELECT hi FROM und) GROUP BY 1),
         |ds AS (SELECT community, COUNT(*) AS n_vertices, CAST(SUM(degree) AS BIGINT) AS d_sum
         |       FROM deg JOIN comm USING (v) GROUP BY 1),
         |ei AS (SELECT a.community, COUNT(*) AS e_in
         |       FROM und JOIN comm a ON a.v = und.lo JOIN comm b ON b.v = und.hi
         |       WHERE a.community = b.community GROUP BY 1)
         |SELECT ds.community, ds.n_vertices,
         |  CAST(COALESCE(ei.e_in, 0) AS BIGINT) AS e_in, ds.d_sum,
         |  CAST(floor(1000000.0 * (COALESCE(ei.e_in, 0)::DOUBLE / m::DOUBLE
         |    - (ds.d_sum::DOUBLE / (2.0 * m::DOUBLE)) * (ds.d_sum::DOUBLE / (2.0 * m::DOUBLE)))
         |    + 0.5) AS BIGINT) AS q_part_micro
         |FROM ds LEFT JOIN ei USING (community), mt""".stripMargin
    },

    // g46's partition refined by one modularity-guarded synchronous local-move
    // round — the shared refineChainCtes (see below) gated-UNIONed: only the
    // accepted branch emits rows, so a drifted Spark-side decision fails the
    // hash (the s31/d28 discipline). Mirror of GraphQueries.modularityRefined
    // at refineRounds = 1.
    "g65_modularity_refined" ->
      s"""$snap,
         |$refineChainCtes
         |SELECT * FROM rows1 WHERE (SELECT ok FROM acc)
         |UNION ALL
         |SELECT * FROM rows0 WHERE NOT (SELECT ok FROM acc)""".stripMargin,

    // g66 — Louvain level-2 on the ACCEPTED g65 partition: commA is the gated
    // branch pick, the super-graph is the inter-community edge rollup (a
    // community's own weighted degree is exactly its member-degree mass, so no
    // self-loop relation exists), one strict-improvement ORIENTED weighted
    // merge round (larger id into smaller — the anti-swap rule; 2m·w − d_C·d_L,
    // argmax score desc / target asc), projected back and
    // gated AGAIN against commA's exact micro-Q sum — two nested gated UNIONs,
    // every decision hash-checked. Mirror of GraphQueries.louvainAggregated.
    "g66_louvain_agg" ->
      s"""$snap,
         |$refineChainCtes,
         |commA AS MATERIALIZED (SELECT v, community FROM comm1 WHERE (SELECT ok FROM acc)
         |          UNION ALL
         |          SELECT v, community FROM comm0 WHERE NOT (SELECT ok FROM acc)),
         |${partitionScoreCtes("A", "commA")},
         |dA AS (SELECT community, CAST(SUM(degree) AS BIGINT) AS d_c
         |       FROM deg JOIN commA USING (v) GROUP BY 1),
         |e2 AS MATERIALIZED (SELECT LEAST(a.community, b.community) AS l2,
         |              GREATEST(a.community, b.community) AS h2, COUNT(*) AS w
         |       FROM und JOIN commA a ON a.v = und.lo JOIN commA b ON b.v = und.hi
         |       WHERE a.community <> b.community GROUP BY 1, 2),
         |prs AS (SELECT h2 AS c, l2 AS l, w FROM e2),
         |mg AS (SELECT c, l FROM (
         |    SELECT p.c, p.l,
         |           CAST(2 * mt.m * p.w - da.d_c * db.d_c AS BIGINT) AS score,
         |           row_number() OVER (PARTITION BY p.c
         |             ORDER BY (2 * mt.m * p.w - da.d_c * db.d_c) DESC, p.l) AS rk
         |    FROM prs p JOIN dA da ON da.community = p.c
         |    JOIN dA db ON db.community = p.l, mt)
         |  WHERE rk = 1 AND score > 0),
         |comm2 AS MATERIALIZED (SELECT commA.v, COALESCE(mg.l, commA.community) AS community
         |          FROM commA LEFT JOIN mg ON mg.c = commA.community),
         |${partitionScoreCtes("2", "comm2")},
         |qqA AS (SELECT CAST(SUM(q_part_micro) AS BIGINT) AS q FROM rowsA),
         |qq2 AS (SELECT CAST(SUM(q_part_micro) AS BIGINT) AS q FROM rows2),
         |nm2 AS (SELECT COUNT(*) AS n FROM commA ca
         |        JOIN comm2 c2 ON c2.v = ca.v AND c2.community <> ca.community),
         |acc2 AS (SELECT ((SELECT n FROM nm2) > 0
         |                 AND (SELECT q FROM qq2) >= (SELECT q FROM qqA)) AS ok)
         |SELECT * FROM rows2 WHERE (SELECT ok FROM acc2)
         |UNION ALL
         |SELECT * FROM rowsA WHERE NOT (SELECT ok FROM acc2)""".stripMargin,
    // TIME-TRAVEL snapshot: the LWW fold over the log prefix updated_at <= AsOfTs —
    // mirror of GraphQueries.snapshotAsOf / EdgeStore.asOf (the cut constant is shared
    // so a retune cannot diverge the mirror)
    "g41_snapshot_asof" ->
      s"""${TestGraph.snapshotAsOfCte(GraphQueries.AsOfTs)}
         |SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges""".stripMargin,

    // Time-travel churn diff: the LWW winner as of ts1 vs as of ts2, keeping keys
    // that appeared, changed state, or moved position (a pure updated_at refresh is
    // not churn; the log is append-only, so nothing disappears) — mirror of
    // EdgeStore.changedBetween / GraphQueries.churnBetween (cut constants shared)
    "g42_churn_between" -> {
      def winnerCte(name: String, ts: Int): String =
        s"""$name AS (
           |  SELECT graph_id, source_id, destination_id, position, state
           |  FROM (
           |    SELECT *, row_number() OVER (
           |      PARTITION BY graph_id, source_id, destination_id
           |      ORDER BY updated_at DESC, ${TestGraph.prioritySql} DESC, position DESC) AS rn
           |    FROM edges_raw WHERE updated_at <= $ts)
           |  WHERE rn = 1
           |)""".stripMargin
      s"""WITH edges_raw AS (${TestGraph.rawSql}),
         |${winnerCte("s1", GraphQueries.AsOfTs)},
         |s2 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state
         |  FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY graph_id, source_id, destination_id
         |      ORDER BY updated_at DESC, ${TestGraph.prioritySql} DESC, position DESC) AS rn
         |    FROM edges_raw WHERE updated_at <= ${GraphQueries.ChurnTs2})
         |  WHERE rn = 1
         |)
         |SELECT s2.graph_id, s2.source_id, s2.destination_id,
         |       s1.state AS old_state, s1.position AS old_position,
         |       s2.state AS new_state, s2.position AS new_position,
         |       s2.updated_at AS new_updated_at,
         |       CASE WHEN s1.state IS NULL THEN 'appeared'
         |            WHEN s1.state <> s2.state THEN 'state'
         |            ELSE 'position' END AS change
         |FROM s2 LEFT JOIN s1 USING (graph_id, source_id, destination_id)
         |WHERE s1.state IS NULL OR s1.state <> s2.state OR s1.position <> s2.position""".stripMargin
    },

    // Two sequential write batches, each an LWW fold: batch1 = wildcard archive of
    // graph-1 vertices ≡0 (mod 7) (register + fanout over live edges, positions kept);
    // batch2 = adds from vertices ≡0 (mod 3), whose effective state is Archived when the
    // source's register is archived (W2 domination). Position refreshes only on
    // Removed/Negative -> effective-Normal resurrection.
    "g18_vertex_domination" ->
      s"""$snap,
         |src AS (SELECT DISTINCT source_id FROM edges WHERE graph_id = 1),
         |b1 AS (SELECT e.graph_id, e.source_id, e.destination_id, e.position,
         |              CAST(2000000 AS INTEGER) AS updated_at, CAST(2 AS INTEGER) AS state
         |       FROM edges e
         |       WHERE e.graph_id = 1 AND e.source_id % 7 = 0 AND e.state <> 1),
         |log1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges_raw
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM b1),
         |snap1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY graph_id, source_id, destination_id
         |      ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |    FROM log1)
         |  WHERE rn = 1),
         |b2 AS (SELECT CAST(1 AS INTEGER) AS graph_id, s.source_id,
         |              1 + (s.source_id * 13) % 97 AS destination_id,
         |              CAST(CASE WHEN s.source_id % 7 = 0 THEN 2 ELSE 0 END AS INTEGER) AS state,
         |              CAST(2500000 AS INTEGER) AS updated_at
         |       FROM src s WHERE s.source_id % 3 = 0),
         |b2p AS (SELECT b2.graph_id, b2.source_id, b2.destination_id,
         |               CASE WHEN s1.position IS NULL OR (s1.state IN (1, 3) AND b2.state = 0)
         |                    THEN (CAST(2500000 AS BIGINT) * 1000) << 20
         |                    ELSE s1.position END AS position,
         |               b2.updated_at, b2.state
         |        FROM b2 LEFT JOIN snap1 s1 USING (graph_id, source_id, destination_id)),
         |log2 AS (
         |  SELECT * FROM log1
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM b2p)
         |SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY graph_id, source_id, destination_id
         |    ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |  FROM log2)
         |WHERE rn = 1 AND graph_id = 1""".stripMargin,

    // Backward-direction write pipeline: batch1 = backward wildcard archive of graph-2
    // vertices ≡0 (mod 5) (backward register + INCOMING-edge fanout); batch2 = backward
    // single adds, (source, destination) swapped per the normalization rule, dominated
    // by the target vertex's backward register.
    "g19_backward_ops" ->
      s"""$snap,
         |dv AS (SELECT DISTINCT destination_id AS v FROM edges WHERE graph_id = 2),
         |b1 AS (SELECT e.graph_id, e.source_id, e.destination_id, e.position,
         |              CAST(2100000 AS INTEGER) AS updated_at, CAST(2 AS INTEGER) AS state
         |       FROM edges e
         |       WHERE e.graph_id = 2 AND e.destination_id % 5 = 0 AND e.state <> 1),
         |log1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges_raw
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM b1),
         |snap1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY graph_id, source_id, destination_id
         |      ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |    FROM log1)
         |  WHERE rn = 1),
         |b2 AS (SELECT CAST(2 AS INTEGER) AS graph_id,
         |              1 + (v * 11) % 150 AS source_id,
         |              v AS destination_id,
         |              CAST(CASE WHEN v % 5 = 0 THEN 2 ELSE 0 END AS INTEGER) AS state,
         |              CAST(2600000 AS INTEGER) AS updated_at
         |       FROM dv WHERE v % 3 = 0),
         |b2p AS (SELECT b2.graph_id, b2.source_id, b2.destination_id,
         |               CASE WHEN s1.position IS NULL OR (s1.state IN (1, 3) AND b2.state = 0)
         |                    THEN (CAST(2600000 AS BIGINT) * 1000) << 20
         |                    ELSE s1.position END AS position,
         |               b2.updated_at, b2.state
         |        FROM b2 LEFT JOIN snap1 s1 USING (graph_id, source_id, destination_id)),
         |log2 AS (
         |  SELECT * FROM log1
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM b2p)
         |SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY graph_id, source_id, destination_id
         |    ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |  FROM log2)
         |WHERE rn = 1 AND graph_id = 2""".stripMargin,

    // Register-aware metadata: archived vertices (incl. two with no edges at all)
    // report the register's state/time + the count of edges in that state; vertices
    // without a register keep the derived dominant-state metadata.
    "g20_metadata_registers" ->
      s"""$snap,
         |tgt AS (SELECT DISTINCT source_id FROM edges WHERE graph_id = 3 AND source_id % 4 = 0
         |        UNION SELECT 1000001 UNION SELECT 1000002),
         |b1 AS (SELECT e.graph_id, e.source_id, e.destination_id, e.position,
         |              CAST(2200000 AS INTEGER) AS updated_at, CAST(2 AS INTEGER) AS state
         |       FROM edges e JOIN tgt USING (source_id)
         |       WHERE e.graph_id = 3 AND e.state <> 1),
         |log1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges_raw
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM b1),
         |snap1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY graph_id, source_id, destination_id
         |      ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |    FROM log1)
         |  WHERE rn = 1),
         |ps AS (SELECT source_id, state, COUNT(*) AS c, MAX(updated_at) AS mu
         |       FROM snap1 WHERE graph_id = 3 GROUP BY 1, 2),
         |derived AS (SELECT source_id, state, c, mu FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY source_id ORDER BY mu DESC, $prio DESC) AS rn
         |    FROM ps)
         |  WHERE rn = 1),
         |reg_meta AS (SELECT t.source_id, CAST(2 AS INTEGER) AS state,
         |                    CAST(COALESCE(ps.c, 0) AS BIGINT) AS c,
         |                    CAST(2200000 AS INTEGER) AS mu
         |             FROM tgt t LEFT JOIN ps ON ps.source_id = t.source_id AND ps.state = 2)
         |SELECT CAST(3 AS INTEGER) AS graph_id, source_id, state, c AS "count", mu AS updated_at
         |FROM (
         |  SELECT * FROM reg_meta
         |  UNION ALL
         |  SELECT * FROM derived WHERE source_id NOT IN (SELECT source_id FROM tgt))""".stripMargin,
    "g21_triangles" ->
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
         |        FROM und e1
         |        JOIN und e2 ON e2.lo = e1.hi
         |        JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi)
         |SELECT v AS vertex_id, COUNT(*) AS n_triangles FROM (
         |  SELECT a AS v FROM tri
         |  UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri)
         |GROUP BY v""".stripMargin,
    "g22_label_propagation" ->
      s"""$snap,
         |de AS (SELECT source_id AS a, destination_id AS b FROM edges
         |       WHERE graph_id = 1 AND state = 0),
         |und AS (SELECT a, b FROM de UNION ALL SELECT b, a FROM de),
         |v AS (SELECT DISTINCT a AS v FROM und),
         |l0 AS (SELECT v, v AS label FROM v),
         |n1 AS (SELECT u.a, MIN(l.label) AS m FROM und u JOIN l0 l ON l.v = u.b GROUP BY u.a),
         |l1 AS (SELECT l0.v, LEAST(l0.label, COALESCE(n1.m, l0.label)) AS label
         |       FROM l0 LEFT JOIN n1 ON n1.a = l0.v),
         |n2 AS (SELECT u.a, MIN(l.label) AS m FROM und u JOIN l1 l ON l.v = u.b GROUP BY u.a),
         |l2 AS (SELECT l1.v, LEAST(l1.label, COALESCE(n2.m, l1.label)) AS label
         |       FROM l1 LEFT JOIN n2 ON n2.a = l1.v),
         |n3 AS (SELECT u.a, MIN(l.label) AS m FROM und u JOIN l2 l ON l.v = u.b GROUP BY u.a),
         |l3 AS (SELECT l2.v, LEAST(l2.label, COALESCE(n3.m, l2.label)) AS label
         |       FROM l2 LEFT JOIN n3 ON n3.a = l2.v)
         |SELECT v AS vertex_id, label AS label_min3 FROM l3""".stripMargin,

    // 2-hop expansion: a→b→c wedges, minus self-returns and direct edges
    "g23_two_hop" ->
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |t AS (SELECT DISTINCT a.src AS src, b.dst AS dst
         |      FROM e a JOIN e b ON a.dst = b.src WHERE b.dst <> a.src),
         |tf AS (SELECT t.src, t.dst FROM t ANTI JOIN e ON e.src = t.src AND e.dst = t.dst)
         |SELECT src AS source_id, COUNT(*) AS n_two_hop FROM tf GROUP BY src""".stripMargin,

    // power-of-two degree buckets via an integer CASE ladder — mirror of
    // GraphQueries.degreeHistogram (floor(log2) is engine-divergent at exact powers)
    "g24_degree_histogram" -> {
      val ladder = (0 until 20)
        .map(b => s"WHEN degree < ${1L << (b + 1)} THEN $b")
        .mkString(" ")
      s"""$snap,
         |deg AS (SELECT graph_id, source_id, COUNT(*) AS degree
         |        FROM edges WHERE state = 0 GROUP BY 1, 2)
         |SELECT graph_id,
         |  CAST(CASE $ladder ELSE 20 END AS INTEGER) AS deg_bucket,
         |  COUNT(*) AS n_vertices, CAST(MAX(degree) AS BIGINT) AS max_degree
         |FROM deg GROUP BY 1, 2""".stripMargin
    },

    // FULL post-write metadata recompute — the engine answers via the INCREMENTAL
    // metadataPatched path, so the hash match proves incremental ≡ full (A2).
    // Position rule for the adds mirrors g18: new-or-resurrected Normal edges take
    // the deterministic uuid position (ms << 20), existing live edges keep theirs.
    "g26_metadata_patched" ->
      s"""$snap,
         |src AS (SELECT DISTINCT source_id FROM edges WHERE graph_id = 2),
         |b AS (SELECT CAST(2 AS INTEGER) AS graph_id, s.source_id,
         |             1 + (s.source_id * 17) % 97 AS destination_id,
         |             CAST(0 AS INTEGER) AS state, CAST(2600000 AS INTEGER) AS updated_at
         |      FROM src s WHERE s.source_id % 5 = 0),
         |bp AS (SELECT b.graph_id, b.source_id, b.destination_id,
         |              CASE WHEN e.position IS NULL OR (e.state IN (1, 3) AND b.state = 0)
         |                   THEN (CAST(2600000 AS BIGINT) * 1000) << 20
         |                   ELSE e.position END AS position,
         |              b.updated_at, b.state
         |       FROM b LEFT JOIN edges e USING (graph_id, source_id, destination_id)),
         |log1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM edges_raw
         |  UNION ALL
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM bp),
         |snap1 AS (
         |  SELECT graph_id, source_id, destination_id, position, updated_at, state FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY graph_id, source_id, destination_id
         |      ORDER BY updated_at DESC, $prio DESC, position DESC) AS rn
         |    FROM log1)
         |  WHERE rn = 1),
         |ps AS (SELECT source_id, state, COUNT(*) AS c, MAX(updated_at) AS mu
         |       FROM snap1 WHERE graph_id = 2 GROUP BY 1, 2)
         |SELECT CAST(2 AS INTEGER) AS graph_id, source_id, state, c AS "count", mu AS updated_at
         |FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY source_id ORDER BY mu DESC, $prio DESC) AS rn
         |  FROM ps)
         |WHERE rn = 1""".stripMargin,

    // 3-round k-core peeling (k = 20) on the undirected closure — mirror of
    // GraphQueries.kCore; survivors with residual degree
    "g27_kcore" ->
      s"""$snap,
         |und AS (SELECT DISTINCT source_id AS src, destination_id AS dst FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id
         |        UNION
         |        SELECT DISTINCT destination_id, source_id FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |k1 AS (SELECT src FROM und GROUP BY src HAVING COUNT(*) >= 20),
         |e1 AS (SELECT u.src, u.dst FROM und u JOIN k1 a ON a.src = u.src
         |       JOIN k1 b ON b.src = u.dst),
         |k2 AS (SELECT src FROM e1 GROUP BY src HAVING COUNT(*) >= 20),
         |e2 AS (SELECT u.src, u.dst FROM e1 u JOIN k2 a ON a.src = u.src
         |       JOIN k2 b ON b.src = u.dst),
         |k3 AS (SELECT src FROM e2 GROUP BY src HAVING COUNT(*) >= 20),
         |e3 AS (SELECT u.src, u.dst FROM e2 u JOIN k3 a ON a.src = u.src
         |       JOIN k3 b ON b.src = u.dst)
         |SELECT src AS source_id, COUNT(*) AS degree FROM e3 GROUP BY src""".stripMargin,

    // shared-neighbor Jaccard over graph-1 Normal adjacency sets — mirror of
    // GraphQueries.nodeJaccard (in-degree cap 10000 is a no-op at test scale but
    // stays in lockstep with the engine's skew guard)
    "g25_node_jaccard" ->
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |keep AS (SELECT dst FROM e GROUP BY dst HAVING COUNT(*) <= 10000),
         |c AS (SELECT e.src, e.dst FROM e JOIN keep USING (dst)),
         |sizes AS (SELECT src, COUNT(*) AS n FROM c GROUP BY src),
         |common AS (SELECT a.src AS src_a, b.src AS src_b, COUNT(*) AS n_common
         |           FROM c a JOIN c b ON a.dst = b.dst AND a.src < b.src
         |           GROUP BY 1, 2)
         |SELECT src_a, src_b, n_common, jaccard FROM (
         |  SELECT src_a, src_b, n_common,
         |         round(CAST(n_common AS DOUBLE) / CAST(na.n + nb.n - n_common AS DOUBLE), 6) AS jaccard
         |  FROM common
         |  JOIN sizes na ON na.src = src_a
         |  JOIN sizes nb ON nb.src = src_b)
         |WHERE jaccard >= 0.3""".stripMargin,

    // local clustering coefficient over the g21 undirected closure — mirror of
    // GraphQueries.clusteringCoefficient (2·tri/(deg·(deg−1)), degree-<2 pins 0)
    "g28_clustering_coeff" ->
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |deg AS (SELECT v AS vertex_id, COUNT(*) AS degree FROM (
         |          SELECT lo AS v FROM und UNION ALL SELECT hi FROM und)
         |        GROUP BY v),
         |tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
         |        FROM und e1
         |        JOIN und e2 ON e2.lo = e1.hi
         |        JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
         |tcnt AS (SELECT v AS vertex_id, COUNT(*) AS n_triangles FROM (
         |           SELECT a AS v FROM tri
         |           UNION ALL SELECT b FROM tri
         |           UNION ALL SELECT c FROM tri)
         |         GROUP BY v)
         |SELECT d.vertex_id, d.degree,
         |  COALESCE(t.n_triangles, 0) AS n_triangles,
         |  CASE WHEN d.degree < 2 THEN 0.0::DOUBLE
         |       ELSE round(2.0::DOUBLE * CAST(COALESCE(t.n_triangles, 0) AS DOUBLE)
         |                  / CAST(d.degree * (d.degree - 1) AS DOUBLE), 6) END AS clustering
         |FROM deg d LEFT JOIN tcnt t USING (vertex_id)""".stripMargin,

    // personalized PageRank — same unrolled integer-fixpoint shape as g17, teleport
    // mass restricted to the seed set (v ≡ 0 mod 100) — mirror of
    // GraphQueries.personalizedPageRank
    "g32_personalized_pagerank" -> {
      def r(prev: String, cur: String, contrib: String) =
        s"""$contrib AS (SELECT e.dst AS v, CAST(SUM($prev.pr // deg.deg) AS BIGINT) AS in_sum
           |       FROM e JOIN deg USING (src) JOIN $prev ON $prev.v = e.src GROUP BY e.dst),
           |$cur AS (SELECT vx.v,
           |         CASE WHEN vx.v % 100 = 0 THEN 150000000000 // (SELECT n FROM ns) ELSE 0 END
           |           + (COALESCE($contrib.in_sum, 0) * 85) // 100 AS pr
           |       FROM vx LEFT JOIN $contrib USING (v))""".stripMargin
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |ns AS (SELECT COUNT(*) AS n FROM vx WHERE v % 100 = 0),
         |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT v, CASE WHEN v % 100 = 0
         |                      THEN 1000000000000 // (SELECT n FROM ns) ELSE 0 END AS pr FROM vx),
         |${r("r0", "r1", "c1")},
         |${r("r1", "r2", "c2")},
         |${r("r2", "r3", "c3")}
         |SELECT v AS vertex_id, CAST(pr AS BIGINT) AS ppr_fp FROM r3""".stripMargin
    },

    // HITS hubs/authorities, 2 iterations, integer max-normalization after every
    // half-step — mirror of GraphQueries.hits
    "g33_hits" -> {
      def half(prev: String, cur: String, from: String, to: String) =
        s"""${cur}r AS (SELECT e.$to AS v, CAST(SUM($prev.s) AS BIGINT) AS raw
           |       FROM e JOIN $prev ON $prev.v = e.$from GROUP BY e.$to),
           |${cur}m AS (SELECT MAX(raw) AS mx FROM ${cur}r),
           |$cur AS (SELECT vx.v,
           |         CAST((COALESCE(${cur}r.raw, 0) * 1000000) // (SELECT mx FROM ${cur}m) AS BIGINT) AS s
           |       FROM vx LEFT JOIN ${cur}r USING (v))""".stripMargin
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |h0 AS (SELECT v, 1000000 AS s FROM vx),
         |${half("h0", "a1", "src", "dst")},
         |${half("a1", "h1", "dst", "src")},
         |${half("h1", "a2", "src", "dst")},
         |${half("a2", "h2", "dst", "src")}
         |SELECT vx.v AS vertex_id, a2.s AS auth_fp, h2.s AS hub_fp
         |FROM vx JOIN a2 USING (v) JOIN h2 USING (v)""".stripMargin
    },

    // SALSA: 4 unrolled degree-normalized half-steps with integer max-normalization
    // (`//` on non-negatives ≡ Spark's DIV) — mirror of GraphQueries.salsa
    "g43_salsa" -> {
      def half(prev: String, cur: String, from: String, to: String, deg: String) =
        s"""${cur}r AS (SELECT e.$to AS v, CAST(SUM($prev.s // e.$deg) AS BIGINT) AS raw
           |       FROM e JOIN $prev ON $prev.v = e.$from GROUP BY e.$to),
           |${cur}m AS (SELECT MAX(raw) AS mx FROM ${cur}r),
           |$cur AS (SELECT vx.v,
           |         CAST((COALESCE(${cur}r.raw, 0) * 1000000) // (SELECT mx FROM ${cur}m) AS BIGINT) AS s
           |       FROM vx LEFT JOIN ${cur}r USING (v))""".stripMargin
      s"""$snap,
         |e0 AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |       WHERE graph_id = 1 AND state = 0),
         |od AS (SELECT src, COUNT(*) AS dout FROM e0 GROUP BY src),
         |ind AS (SELECT dst, COUNT(*) AS din FROM e0 GROUP BY dst),
         |e AS (SELECT e0.src, e0.dst, od.dout, ind.din
         |      FROM e0 JOIN od USING (src) JOIN ind USING (dst)),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |h0 AS (SELECT v, 1000000 AS s FROM vx),
         |${half("h0", "a1", "src", "dst", "dout")},
         |${half("a1", "h1", "dst", "src", "din")},
         |${half("h1", "a2", "src", "dst", "dout")},
         |${half("a2", "h2", "dst", "src", "din")}
         |SELECT vx.v AS vertex_id, a2.s AS auth_fp, h2.s AS hub_fp
         |FROM vx JOIN a2 USING (v) JOIN h2 USING (v)""".stripMargin
    },

    // local bridges: undirected edges with no shared neighbor (no closing triangle)
    // — mirror of GraphQueries.localBridges
    "g36_local_bridges" ->
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |adj AS (SELECT lo AS v, hi AS w FROM und UNION ALL SELECT hi, lo FROM und),
         |wc AS (SELECT DISTINCT a.v AS lo, b.v AS hi
         |       FROM adj a JOIN adj b ON a.w = b.w AND a.v < b.v)
         |SELECT und.lo, und.hi FROM und
         |LEFT JOIN wc ON wc.lo = und.lo AND wc.hi = und.hi
         |WHERE wc.lo IS NULL""".stripMargin,

    // friend-of-friend top-5 per seed: 2-hop expansion, distinct bridge count,
    // anti-join on already-followed — mirror of GraphQueries.friendRecs
    "g35_friend_recs" ->
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |h AS (SELECT e1.src AS s, e1.dst AS b, e2.dst AS c
         |      FROM e e1 JOIN e e2 ON e2.src = e1.dst
         |      WHERE e1.src % 100 = 0 AND e2.dst <> e1.src),
         |cnt AS (SELECT s, c, COUNT(DISTINCT b) AS n_via FROM h GROUP BY 1, 2),
         |fil AS (SELECT cnt.s, cnt.c, cnt.n_via FROM cnt
         |        LEFT JOIN e ON e.src = cnt.s AND e.dst = cnt.c
         |        WHERE e.src IS NULL)
         |SELECT s AS seed_id, c AS rec_id, n_via, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY s ORDER BY n_via DESC, c) AS rank
         |  FROM fil)
         |WHERE rank <= 5""".stripMargin,

    // deterministic random walks: row_number-indexed adjacency, md5(walk:step) mod
    // outdeg choices, 3 unrolled steps — mirror of GraphQueries.randomWalks
    "g45_random_walks" -> {
      def step(t: Int) =
        s"""w$t AS (SELECT w${t - 1}.walk_id, CAST($t AS INTEGER) AS step, a.dst AS v
           |       FROM w${t - 1} JOIN a ON a.src = w${t - 1}.v
           |       WHERE a.idx = ('0x' || substr(md5(CAST(w${t - 1}.walk_id AS VARCHAR) || ':$t'), 1, 8))::BIGINT % a.dout)""".stripMargin
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |a AS (SELECT src, dst,
         |        row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
         |        COUNT(*) OVER (PARTITION BY src) AS dout
         |      FROM e),
         |w0 AS (SELECT src AS walk_id, CAST(0 AS INTEGER) AS step, src AS v
         |       FROM (SELECT DISTINCT src FROM a) WHERE src % $WalkSeedMod = 0),
         |${step(1)},
         |${step(2)},
         |${step(3)}
         |SELECT walk_id, step, v AS vertex_id FROM w0
         |UNION ALL SELECT walk_id, step, v FROM w1
         |UNION ALL SELECT walk_id, step, v FROM w2
         |UNION ALL SELECT walk_id, step, v FROM w3""".stripMargin
    },

    // sampled harmonic centrality: per-seed bounded BFS (3 unrolled rounds with
    // min folds on (seed, v)), then Σ 10^6 // d per vertex over d >= 1 — mirror of
    // GraphQueries.harmonicCentrality
    "g44_harmonic" -> {
      def round(h: Int) =
        s"""n$h AS (SELECT r${h - 1}.seed, e.dst AS v, CAST($h AS INTEGER) AS dist
           |       FROM r${h - 1} JOIN e ON r${h - 1}.v = e.src WHERE r${h - 1}.dist = ${h - 1}),
           |r$h AS (SELECT seed, v, MIN(dist) AS dist FROM (
           |         SELECT * FROM r${h - 1} UNION ALL SELECT * FROM n$h) GROUP BY seed, v)""".stripMargin
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |r0 AS (SELECT v AS seed, v, CAST(0 AS INTEGER) AS dist FROM vx WHERE v % 100 = 0),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT v AS vertex_id, COUNT(*) AS n_seeds,
         |       CAST(SUM(1000000 // dist) AS BIGINT) AS harmonic_micro
         |FROM r3 WHERE dist >= 1 GROUP BY v""".stripMargin
    },

    // bounded BFS from the seed set, 3 unrolled frontier expansions with min-label
    // folds — mirror of GraphQueries.bfsDistance
    "g34_bfs_distance" -> {
      def round(h: Int) =
        s"""n$h AS (SELECT e.dst AS v, CAST($h AS INTEGER) AS dist
           |       FROM r${h - 1} JOIN e ON r${h - 1}.v = e.src WHERE r${h - 1}.dist = ${h - 1}),
           |r$h AS (SELECT v, MIN(dist) AS dist FROM (
           |         SELECT * FROM r${h - 1} UNION ALL SELECT * FROM n$h) GROUP BY v)""".stripMargin
      s"""$snap,
         |e AS (SELECT source_id AS src, destination_id AS dst FROM edges
         |      WHERE graph_id = 1 AND state = 0),
         |vx AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |r0 AS (SELECT v, CAST(0 AS INTEGER) AS dist FROM vx WHERE v % 100 = 0),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT v AS vertex_id, CAST(dist AS INTEGER) AS dist FROM r3""".stripMargin
    },

    // connected components to fixpoint — the oracle computes TRUE reachability with a
    // recursive CTE (component = min reachable id), so a hash match proves the Spark
    // fixpoint loop converged, not merely that both ran the same number of rounds
    // one-row structural datasheet: sizes, reciprocity, degree posture, the
    // exact recursive component census, triangles + degree-fold wedges —
    // mirror of GraphQueries.graphCard (graph 1, Normal, no self-loops)
    "g67_graph_card" ->
      s"""${snap.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |de AS (SELECT DISTINCT source_id AS s, destination_id AS d FROM edges
         |       WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |und AS (SELECT DISTINCT LEAST(s, d) AS lo, GREATEST(s, d) AS hi FROM de),
         |deg AS (SELECT v, COUNT(*) AS dg FROM (
         |          SELECT lo AS v FROM und UNION ALL SELECT hi FROM und) GROUP BY v),
         |ds AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
         |         CAST(MAX(dg) AS BIGINT) AS max_degree,
         |         CAST(SUM(dg) AS BIGINT) AS sum_d,
         |         CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
         |ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges_directed FROM de),
         |eu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges_und FROM und),
         |rc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_recip FROM de a
         |       WHERE EXISTS (SELECT 1 FROM de b WHERE b.s = a.d AND b.d = a.s)),
         |adj AS (SELECT lo AS a, hi AS b FROM und UNION SELECT hi, lo FROM und),
         |verts AS (SELECT DISTINCT a AS v FROM adj),
         |reach AS (SELECT v, v AS r FROM verts
         |          UNION
         |          SELECT adj.b AS v, reach.r FROM reach JOIN adj ON adj.a = reach.v),
         |comp AS (SELECT v, MIN(r) AS c FROM reach GROUP BY v),
         |cs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_components,
         |         CAST(MAX(cnt) AS BIGINT) AS giant
         |       FROM (SELECT c, COUNT(*) AS cnt FROM comp GROUP BY c)),
         |tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
         |        FROM und e1
         |        JOIN und e2 ON e2.lo = e1.hi
         |        JOIN und e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
         |ts AS (SELECT CAST(3 * COUNT(*) AS BIGINT) AS tri3 FROM tri)
         |SELECT n_vertices, n_edges_directed, n_edges_und,
         |  CAST((2 * 1000000 * n_recip + n_edges_directed) // (2 * n_edges_directed)
         |    AS BIGINT) AS reciprocity_micro,
         |  max_degree,
         |  CAST((2 * 1000000 * sum_d + n_vertices) // (2 * n_vertices) AS BIGINT)
         |    AS avg_degree_micro,
         |  n_components,
         |  CAST((2 * 1000000 * giant + n_vertices) // (2 * n_vertices) AS BIGINT)
         |    AS giant_share_micro,
         |  CAST(tri3 // 3 AS BIGINT) AS n_triangles,
         |  n_wedges,
         |  CAST(CASE WHEN n_wedges = 0 THEN 0
         |       ELSE (2 * 1000000 * tri3 + n_wedges) // (2 * n_wedges) END AS BIGINT)
         |    AS transitivity_micro
         |FROM ds, ec, eu, rc, cs, ts""".stripMargin,

    "g29_connected_components" ->
      s"""${snap.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |adj AS (SELECT lo AS a, hi AS b FROM und UNION SELECT hi, lo FROM und),
         |verts AS (SELECT DISTINCT a AS v FROM adj),
         |reach AS (SELECT v, v AS r FROM verts
         |          UNION
         |          SELECT adj.b AS v, reach.r FROM reach JOIN adj ON adj.a = reach.v)
         |SELECT v AS vertex_id, min(r) AS component FROM reach GROUP BY v""".stripMargin,

    // degree assortativity (Pearson over endpoint degrees, exact integer sums,
    // variance-term product in double space) — mirror of GraphQueries.assortativity
    "g30_assortativity" ->
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |deg AS (SELECT v, COUNT(*) AS d FROM (
         |          SELECT lo AS v FROM und UNION ALL SELECT hi FROM und)
         |        GROUP BY v),
         |pairs AS (SELECT dx.d AS dx, dy.d AS dy
         |          FROM (SELECT lo, hi FROM und UNION ALL SELECT hi, lo FROM und) e
         |          JOIN deg dx ON dx.v = e.lo
         |          JOIN deg dy ON dy.v = e.hi),
         |a AS (SELECT COUNT(*) AS n,
         |        CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         |        CAST(SUM(dx * dy) AS BIGINT) AS sxy,
         |        CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         |        CAST(SUM(dy * dy) AS BIGINT) AS syy
         |      FROM pairs)
         |SELECT n AS n_endpoints,
         |  round((n * sxy - sx * sy)::DOUBLE
         |        / sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE), 6)
         |    AS assortativity
         |FROM a""".stripMargin,

    // Adamic-Adar link prediction over the undirected Normal closure of graph 1:
    // unlinked pairs with ≥2 common neighbors, score = Σ 1/ln(deg) in exact integer
    // micro-units — mirror of GraphQueries.adamicAdar
    "g31_adamic_adar" ->
      s"""$snap,
         |und AS (SELECT DISTINCT LEAST(source_id, destination_id) AS lo,
         |                        GREATEST(source_id, destination_id) AS hi
         |        FROM edges
         |        WHERE graph_id = 1 AND state = 0 AND source_id <> destination_id),
         |adj AS (SELECT lo AS v, hi AS w FROM und UNION ALL SELECT hi, lo FROM und),
         |deg AS (SELECT w, count(*) AS d FROM adj GROUP BY 1),
         |wt AS (SELECT adj.v, adj.w, CAST(round(1000000.0 / ln(d)) AS BIGINT) AS aa_micro
         |       FROM adj JOIN deg USING (w) WHERE d BETWEEN 2 AND 10000),
         |pairs AS (SELECT a.v AS src_a, b.v AS src_b,
         |                 count(*) AS n_common, CAST(sum(a.aa_micro) AS BIGINT) AS aa_micro
         |          FROM wt a JOIN wt b ON a.w = b.w AND a.v < b.v
         |          GROUP BY 1, 2 HAVING count(*) >= 2)
         |SELECT p.src_a, p.src_b, p.n_common, p.aa_micro
         |FROM pairs p LEFT JOIN und ON und.lo = p.src_a AND und.hi = p.src_b
         |WHERE und.lo IS NULL""".stripMargin,
  )
}
