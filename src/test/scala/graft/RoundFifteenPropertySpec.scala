package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean

/** Round-15 property mirrors. The Wilson test guards the ev24 cross-engine
  * float contract (see the CROSS-ENGINE FLOAT CONTRACT paragraph on
  * [[AnalyticsQueries.funnelWilson]]): it re-derives the interval in plain
  * Scala doubles with constants COMPOSED from the literal 1.96 — the same
  * composition both engines fold — so an edit that pre-folds a constant on
  * one side (e.g. 3.8416 for 1.96*1.96) breaks here first, at unit-test
  * speed, instead of at the driver's oracle gate.
  */
class RoundFifteenPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, cases: Int = 5): Unit = {
    val params = ScTest.Parameters.default.withMinSuccessfulTests(cases)
    val result = ScTest.check(params, prop)
    assert(result.passed, s"$name: $result")
  }

  /** The ev24 statistic re-derived in plain Scala doubles, constants written
    * as the SAME expressions both engines fold: z*z/2, z*z/4 from z = 1.96.
    */
  private def mirrorWilson(x: Long, n: Long): (Long, Long, Long) = {
    if (n == 0L) (0L, 0L, 0L)
    else {
      val rate = (2L * 1000000L * x + n) / (2L * n)
      val z = 1.96
      val xd = x.toDouble
      val nd = n.toDouble
      val denom = nd + z * z
      val center = (xd + z * z / 2.0) / denom
      val half = (z / denom) * math.sqrt(xd * (nd - xd) / nd + z * z / 4.0)
      def micro(v: Double) = math.floor(1000000.0 * v + 0.5).toLong
      (rate, micro(center - half), micro(center + half))
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The repo's 60-bit md5 integer convention, independently via java MD5. */
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  /** Sequential mirror of the d30 registry: per-position w-grams, cross-doc =
    * seen in ≥ 2 distinct docs, consecutive-position islands, min-length cut,
    * span re-hash, then the registry fold (distinct-doc census, min-doc
    * keeper, first-(doc, start)-occurrence keep) — a direct transcription of
    * the definition, no windows, no hashing shortcuts shared with the kernel.
    */
  private def mirrorRegistry(
      docs: List[(Long, String)],
      w: Int,
      minSpan: Int): Set[(Long, Long, Long, Long, Long, Long, Int)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toVector }
      .filter(_._2.length >= w)
    val anchors = toks.flatMap { case (id, ts) =>
      (0 to ts.length - w).map(i => (id, i + 1, ts.slice(i, i + w).mkString(" ")))
    }
    val crossDoc = anchors.groupBy(_._3)
      .filter { case (_, as) => as.map(_._1).distinct.size >= 2 }
      .keySet
    val spans = toks.flatMap { case (id, ts) =>
      val dupPos = anchors.collect { case (d, i, s) if d == id && crossDoc(s) => i }.sorted
      val runs = dupPos.foldLeft(List.empty[List[Int]]) {
        case ((run :: rest), i) if i == run.head + 1 => (i :: run) :: rest
        case (acc, i) => List(i) :: acc
      }
      runs.map { run =>
        val start = run.last // runs are built head-prepended: last = min
        val len = run.head - run.last + w
        (id, start.toLong, len.toLong,
          h60(ts.slice(start - 1, start - 1 + len).mkString(" ")))
      }.filter(_._3 >= minSpan)
    }
    spans.groupBy(_._4).flatMap { case (h, occ) =>
      val nDocs = occ.map(_._1).distinct.size.toLong
      val keepDoc = occ.map(_._1).min
      val first = occ.map(o => (o._1, o._2)).min
      occ.map { case (id, start, len, _) =>
        (id, start, len, h, nDocs, keepDoc, if ((id, start) == first) 0 else 1)
      }
    }.toSet
  }

  private def docsGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.choose(2, 5)
    docs <- Gen.sequence[List[(Long, String)], (Long, String)]((1 to nDocs).map { d =>
      for {
        len <- Gen.choose(5, 25)
        ts <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
      } yield (d.toLong, ts.mkString(" "))
    })
  } yield docs

  test("d30 repeatedSpanRegistry equals the sequential span-registry mirror on random docs") {
    check("d30-mirror", Prop.forAll(docsGen) { docs =>
      val got = graft.pipeline.Dedup.repeatedSpanRegistry(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        windowTokens = 3, minSpanTokens = 4)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
          r.getAs[Long]("span_tokens"), r.getAs[Long]("span_h"),
          r.getAs[Long]("n_docs_sharing"), r.getAs[Long]("keep_doc"),
          r.getAs[Int]("cut")))
        .toSet
      val want = mirrorRegistry(docs, w = 3, minSpan = 4)
      (got == want) :| s"got $got want $want docs $docs"
    }, cases = 8)
  }

  /** Sequential mirror of one g65 local-move round: exact-integer scores
    * 2m·k_{v,c} − d_v·Σ'_c, strict improvement over staying, argmax ties
    * (score desc, community asc) — a direct per-vertex transcription.
    */
  private def mirrorLocalMove(
      edges: List[(Long, Long)],
      lab: Map[Long, Long]): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct
    val m = und.size.toLong
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dsum = adj.toSeq.groupBy { case (v, _) => lab(v) }
      .view.mapValues(_.map(_._2.size.toLong).sum).toMap
    adj.map { case (v, nbrs) =>
      val dv = nbrs.size.toLong
      val a = lab(v)
      val k = nbrs.groupBy(lab).view.mapValues(_.size.toLong).toMap
      val stay = 2L * m * k.getOrElse(a, 0L) - dv * (dsum(a) - dv)
      val cands = k.keys.filter(_ != a).toSeq
        .map(c => (2L * m * k(c) - dv * dsum(c), c))
        .filter(_._1 > stay)
      v -> (if (cands.isEmpty) a else cands.minBy { case (s, c) => (-s, c) }._2)
    }
  }

  private def graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(4, 12)
    mEdges <- Gen.choose(4, 30)
    edges <- Gen.listOfN(mEdges, for {
      a <- Gen.choose(1L, n.toLong)
      b <- Gen.choose(1L, n.toLong) if b != a
    } yield (a, b))
  } yield edges

  test("g65 localMoveRound equals the sequential strict-improvement mirror on random graphs") {
    check("g65-move-mirror", Prop.forAll(graphGen) { edges =>
      edges.nonEmpty ==> {
        val undPairs = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
          .filter(e => e._1 != e._2).distinct
        undPairs.nonEmpty ==> {
          val und = undPairs.toDF("lo", "hi")
          val adj = und.select(col("lo").as("src"), col("hi").as("dst"))
            .unionByName(und.select(col("hi").as("src"), col("lo").as("dst")))
          val start = GraphQueries.plannedLpa(adj, rounds = 2)
            .select(col("vertex_id").as("v"), col("community"))
          val startMap = start.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val got = GraphQueries.localMoveRound(und, start)
            .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("community")).toMap
          val want = mirrorLocalMove(undPairs, startMap)
          (got == want) :| s"got $got want $want start $startMap edges $undPairs"
        }
      }
    }, cases = 6)
  }

  test("g65 refineByModularity never decreases the exact micro-Q sum (random graphs)") {
    check("g65-monotone", Prop.forAll(graphGen) { edges =>
      val undPairs = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(e => e._1 != e._2).distinct
      undPairs.nonEmpty ==> {
        val und = undPairs.toDF("lo", "hi")
        val adj = und.select(col("lo").as("src"), col("hi").as("dst"))
          .unionByName(und.select(col("hi").as("src"), col("lo").as("dst")))
        val start = GraphQueries.plannedLpa(adj, rounds = 2)
          .select(col("vertex_id").as("v"), col("community"))
        def q(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(_.getAs[Long]("q_part_micro")).sum
        val before = q(GraphQueries.modularityOf(und, start))
        val after = q(GraphQueries.refineByModularity(und, start, refineRounds = 2))
        (after >= before) :| s"q $before -> $after edges $undPairs"
      }
    }, cases = 6)
  }

  /** Spark's round(col, 6) semantics: HALF_UP over the canonical decimal rep. */
  private def r6(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Sequential mirror of the WHOLE d31 chain on dyadic vectors (sums exact,
    * so the distributed means are reproducible): kmeansRounds (k-lowest-id
    * seeds, rounded-cosine argmax assignment with cluster-asc ties, round-6
    * per-dim means, zero-norm centroids dropped), final-cell assignment of
    * every vector, within-cell micro-cosine pairs, min-label propagation, and
    * the keep-longest manifest.
    */
  private def mirrorSemanticDedup(
      vecs: List[(Long, Vector[Double])],
      toks: Map[Long, Long],
      kCells: Int,
      trainRounds: Int,
      thrMicro: Long,
      lpRounds: Int): Set[(Long, Long, Long, Long, Long)] = {
    def dot(a: Vector[Double], b: Vector[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Vector[Double], b: Vector[Double]) =
      r6(dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)))
    val nz = vecs.filter { case (_, v) => dot(v, v) > 0 }
    var cents: List[(Long, Vector[Double])] =
      nz.sortBy(_._1).take(kCells).map { case (id, v) => (id, v) }
        .filter { case (_, v) => dot(v, v) > 0 }
    for (_ <- 1 to trainRounds) {
      val assigned = nz.map { case (id, v) =>
        val best = cents.map { case (c, cv) => (cos(v, cv), c) }
          .minBy { case (s, c) => (-s, c) }._2
        (best, v)
      }
      cents = assigned.groupBy(_._1).toList.map { case (c, vs) =>
        val n = vs.size
        val mean = vs.map(_._2).transpose.map(ds => r6(ds.sum / n)).toVector
        (c, mean)
      }.filter { case (_, cv) => dot(cv, cv) > 0 }.sortBy(_._1)
    }
    val cells = vecs.map { case (id, v) =>
      val best = cents.map { case (c, cv) => (cos(v, cv), c) }
        .minBy { case (s, c) => (-s, c) }._2
      (id, best, v)
    }
    val pairs = for {
      (a, ca, va) <- cells
      (b, cb, vb) <- cells
      if a < b && ca == cb &&
        math.floor(1e6 * cos(va, vb) + 0.5).toLong >= thrMicro
    } yield (a, b)
    var labels = vecs.map(_._1).map(v => v -> v).toMap
    val und = pairs ++ pairs.map(_.swap)
    for (_ <- 1 to lpRounds) {
      val nbrMin = und.groupBy(_._1).view
        .mapValues(_.map { case (_, b) => labels(b) }.min).toMap
      labels = labels.map { case (v, l) => v -> math.min(l, nbrMin.getOrElse(v, l)) }
    }
    labels.groupBy(_._2).map { case (cl, members) =>
      val ms = members.keys.toSeq
      val kept = ms.maxBy(id => (toks(id), -id))
      (cl, kept, toks(kept), ms.size.toLong, ms.size.toLong - 1L)
    }.toSet
  }

  private def semGen: Gen[List[(Long, Vector[Double])]] = for {
    n <- Gen.choose(4, 9)
    vs <- Gen.sequence[List[(Long, Vector[Double])], (Long, Vector[Double])](
      (1 to n).map { i =>
        Gen.listOfN(4, Gen.oneOf(0.0, 0.25, 0.5, 0.75, 1.0))
          .retryUntil(_.exists(_ != 0.0))
          .map(ds => (i.toLong, ds.toVector))
      })
  } yield vs

  test("d31 semanticDedupClusters equals the sequential SemDeDup mirror on random vectors") {
    check("d31-mirror", Prop.forAll(semGen) { vecs =>
      val toks = vecs.map { case (id, _) => id -> (id % 5 + 1) }.toMap
      val docs = vecs.map { case (id, _) =>
        (id, Seq.fill(toks(id).toInt)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val emb = vecs.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
        .toDF("vec_id", "embedding")
      val got = graft.pipeline.Dedup.semanticDedupClusters(
        docs, emb, "doc_id", "text", "vec_id", "embedding",
        thresholdMicro = 900000L, kCells = 2, dims = 4, trainRounds = 2, rounds = 3)
        .collect()
        .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("kept_doc"),
          r.getAs[Long]("kept_tokens"), r.getAs[Long]("n_members"),
          r.getAs[Long]("n_dropped")))
        .toSet
      val want = mirrorSemanticDedup(vecs, toks, kCells = 2, trainRounds = 2,
        thrMicro = 900000L, lpRounds = 3)
      (got == want) :| s"got $got want $want vecs $vecs"
    }, cases = 6)
  }

  /** Sequential mirror of the s35 two-stage search: symmetric int8 clamp
    * against the raw maxabs/127 scale, coarse cosine on code×scale
    * reconstructions (round 6), k·overfetch shortlist (coarse desc, id asc),
    * exact-cosine rerank (round 6, same ties).
    */
  private def mirrorInt8TopK(
      vecs: List[(Long, Vector[Double])],
      queries: List[Long],
      k: Int,
      overfetch: Int): Set[(Long, Long, Double, Int)] = {
    def dotv(a: Vector[Double], b: Vector[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def cosv(a: Vector[Double], b: Vector[Double]) =
      r6(dotv(a, b) / math.sqrt(dotv(a, a) * dotv(b, b)))
    val recon = vecs.flatMap { case (id, v) =>
      val maxabs = v.map(math.abs).max
      if (maxabs <= 0) None
      else {
        val scale = maxabs / 127.0
        Some(id -> v.map(x =>
          math.max(-127.0, math.min(127.0, math.floor(x / scale + 0.5))) * scale))
      }
    }.toMap
    val byId = vecs.toMap
    queries.flatMap { q =>
      val qv = byId(q)
      val short = recon.toSeq.filter(_._1 != q)
        .map { case (id, rv) => (cosv(qv, rv), id) }
        .sortBy { case (s, id) => (-s, id) }
        .take(k * overfetch).map(_._2)
      short.map(id => (id, cosv(qv, byId(id))))
        .sortBy { case (id, s) => (-s, id) }
        .take(k).zipWithIndex
        .map { case ((id, s), i) => (q, id, s, i + 1) }
    }.toSet
  }

  test("s35 int8TopK equals the sequential quantize-shortlist-rerank mirror") {
    check("s35-mirror", Prop.forAll(semGen) { vecs =>
      (vecs.size >= 4) ==> {
        val emb = vecs.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
          .toDF("vec_id", "embedding")
        val queries = vecs.map(_._1).filter(_ % 2 == 0)
        queries.nonEmpty ==> {
          val got = graft.pipeline.Similarity.int8TopK(
            emb.filter(col("vec_id") % 2 === 0), emb, "vec_id", "embedding",
            k = 2, overfetch = 2)
            .collect()
            .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
              r.getAs[Double]("cos_sim"), r.getAs[Int]("rank")))
            .toSet
          val want = mirrorInt8TopK(vecs, queries, k = 2, overfetch = 2)
          (got == want) :| s"got $got want $want vecs $vecs"
        }
      }
    }, cases = 6)
  }

  private def funnelGen: Gen[(Int, Int, Int)] = for {
    nv <- Gen.choose(1, 40)
    nc <- Gen.choose(0, nv)
    nb <- Gen.choose(0, nc)
  } yield (nv, nc, nb)

  test("ev24 funnelWilson equals the plain-Scala-doubles Wilson mirror") {
    check("wilson-mirror", Prop.forAll(funnelGen) { case (nv, nc, nb) =>
      // user u views at 10u; the first nc users click at 10u+1; the first nb
      // purchase at 10u+2 — exact step counts (nv, nc, nb) by construction
      val events =
        (1 to nv).map(u => (u.toLong, "view", 10L * u)) ++
        (1 to nc).map(u => (u.toLong, "click", 10L * u + 1)) ++
        (1 to nb).map(u => (u.toLong, "purchase", 10L * u + 2))
      val got = AnalyticsQueries
        .funnelWilsonOf(events.toDF("user_id", "event_type", "tsu"))
        .collect()
        .map(r => r.getAs[String]("step") ->
          ((r.getAs[Long]("n_prev"), r.getAs[Long]("n_conv"),
            r.getAs[Long]("rate_micro"), r.getAs[Long]("wilson_low_micro"),
            r.getAs[Long]("wilson_high_micro"))))
        .toMap
      val (r1, l1, h1) = mirrorWilson(nc.toLong, nv.toLong)
      val (r2, l2, h2) = mirrorWilson(nb.toLong, nc.toLong)
      val want = Map(
        "view_to_click" -> ((nv.toLong, nc.toLong, r1, l1, h1)),
        "click_to_purchase" -> ((nc.toLong, nb.toLong, r2, l2, h2)))
      (got == want) :| s"got $got want $want (nv=$nv nc=$nc nb=$nb)"
    }, cases = 8)
  }

  /** The ev25 estimator re-derived sequentially in plain Scala — the same
    * per-row micro ln terms, exact Long cumsums, one final exp (the float
    * contract documented on [[AnalyticsQueries.survivalCurveOf]]).
    */
  private def mirrorKm(obs: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long, Long, Long)] = {
    val byT = obs.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
      (t, rows.count(_._2 == 0L).toLong, rows.count(_._2 == 1L).toLong)
    }
    val total = obs.size.toLong
    var seen = 0L
    var cumLn = 0L
    var cumHaz = 0L
    var dead = false
    byT.flatMap { case (t, d, c) =>
      val nRisk = total - seen
      seen += d + c
      if (d == 0L) None
      else {
        if (d == nRisk) dead = true
        else cumLn += math.floor(
          1000000.0 * math.log((nRisk - d).toDouble / nRisk.toDouble) + 0.5).toLong
        cumHaz += math.floor(1000000.0 * d.toDouble / nRisk.toDouble + 0.5).toLong
        val surv =
          if (dead) 0L
          else math.floor(1000000.0 * math.exp(cumLn.toDouble / 1000000.0) + 0.5).toLong
        Some((t, nRisk, d, c, surv, cumHaz))
      }
    }
  }

  test("ev25: the distributed Kaplan-Meier equals the sequential mirror on random censored cohorts") {
    val genObs = Gen.listOfN(40, Gen.zip(Gen.choose(0L, 12L), Gen.oneOf(0L, 1L)))
      .suchThat(_.nonEmpty)
    check("km-mirror", Prop.forAll(genObs) { obs =>
      val got = AnalyticsQueries.survivalCurveOf(obs.toDF("t", "censored"))
        .collect()
        .map(r => (r.getAs[Long]("duration_days"), r.getAs[Long]("n_risk"),
          r.getAs[Long]("n_events"), r.getAs[Long]("n_censored"),
          r.getAs[Long]("survival_micro"), r.getAs[Long]("cum_hazard_micro")))
        .sortBy(_._1).toSeq
      val want = mirrorKm(obs)
      (got == want) :| s"got $got\nwant $want\nobs $obs"
    }, cases = 6)
  }

  test("g66: the level-2 merge round always emits a valid partition over inherited labels") {
    val genGraph = for {
      n <- Gen.choose(6, 14)
      edges <- Gen.listOfN(2 * n,
        Gen.zip(Gen.choose(1L, n.toLong), Gen.choose(1L, n.toLong)))
    } yield edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    check("g66-partition", Prop.forAll(genGraph.suchThat(_.size >= 3)) { es =>
      val und = es.toDF("lo", "hi")
      val verts = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      // start: labels = v mod 3 buckets mapped to the minimum member id (a
      // deliberately bad partition so merges actually fire)
      val start = verts.map(v => (v, verts.filter(_ % 3 == v % 3).min)).toDF("v", "community")
      val out = GraphQueries.aggregateMoveRound(und, start).collect()
        .map(r => (r.getAs[Long]("v"), r.getAs[Long]("community")))
      val startLabels = verts.map(v => verts.filter(_ % 3 == v % 3).min).toSet
      val exactlyOnce = out.map(_._1).toSet == verts.toSet && out.length == verts.size
      val inherited = out.map(_._2).toSet.subsetOf(startLabels)
      (exactlyOnce && inherited) :| s"out ${out.toSeq} start labels $startLabels"
    }, cases = 6)
  }

  test("dc24: budget fill equals the sequential greedy knapsack on random corpora") {
    val word = Gen.oneOf(Gen.oneOf("the", "a", "of", "and"),
      Gen.choose(100, 999).map(n => s"w$n"))
    val doc = Gen.choose(3, 25).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val genCorpus = for {
      nDocs <- Gen.choose(4, 18)
      texts <- Gen.listOfN(nDocs, doc)
      srcs <- Gen.listOfN(nDocs, Gen.oneOf("cc", "web", "book"))
      budget <- Gen.choose(10L, 120L)
      bucket <- Gen.oneOf(1L, 7L, 100000L, 1000000000L)
    } yield (texts.zip(srcs).zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) },
      budget, bucket)
    check("dc24-mirror", Prop.forAll(genCorpus) { case (rows, budget, bucket) =>
      val df = rows.toDF("doc_id", "text", "source")
      // the measured per-doc inputs off the SAME column expressions the
      // operator uses — the mirror pins the fill logic, not the t02 formula
      val measured = df.select(col("doc_id"), col("source"),
          graft.pipeline.TextStats.qualityMicro(col("text")).as("q"),
          graft.pipeline.TextStats.tokenCount(col("text")).cast("long").as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val want = measured.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
        val ordered = ds.sortBy { case (id, _, q, _) => (-q, id) }
        val cums = ordered.scanLeft(0L)(_ + _._4).tail
        ordered.zip(cums).zipWithIndex
          .takeWhile { case (((_, _, _, _), cum), _) => cum <= budget }
          .map { case (((id, s, q, n), cum), i) => (id, s, q, n, cum, i + 1) }
      }.toSet
      val got = graft.pipeline.Curation.budgetFill(df, "doc_id", "text", "source",
          budgetTokens = budget, bucketMicro = bucket)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[Long]("quality_micro"), r.getAs[Long]("n_toks"),
          r.getAs[Long]("cum_tokens"), r.getAs[Int]("fill_rank").toLong))
        .map(t => (t._1, t._2, t._3, t._4, t._5, t._6.toInt))
        .toSet
      (got == want) :| s"budget=$budget bucket=$bucket got=$got want=$want"
    }, cases = 8)
  }

  test("d37: the bloom-screened probe equals the sequential mirror at any bloom width") {
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def positions(h: String, mBits: Long): Set[Long] =
      Set(0, 8, 16).map(o =>
        new java.math.BigInteger(h.substring(o, o + 8), 16).longValue() % mBits)
    val word = Gen.oneOf("red", "blue", "ox", "owl", "fig", "yam")
    val doc = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val genCase = for {
      nIx <- Gen.choose(2, 10)
      nBt <- Gen.choose(2, 12)
      ixTexts <- Gen.listOfN(nIx, doc)
      btTexts <- Gen.listOfN(nBt, doc) // tiny vocab → real dups occur often
      mBits <- Gen.oneOf(1, 2, 64, 1 << 18)
    } yield (ixTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      btTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }, mBits)
    check("d37-mirror", Prop.forAll(genCase) { case (ix, bt, mBits) =>
      val bits = ix.flatMap { case (_, t) => positions(md5hex(t), mBits.toLong) }.toSet
      val want = bt.map { case (id, t) =>
        val pos = positions(md5hex(t), mBits.toLong).subsetOf(bits)
        val copies = ix.filter(_._2 == t)
        val dupOf = if (copies.nonEmpty) copies.map(_._1).min else -1L
        (id, if (pos) 1 else 0, dupOf, copies.size.toLong)
      }.toSet
      val got = graft.pipeline.Dedup.bloomPrefilteredExactProbe(
          bt.toDF("doc_id", "text"), "doc_id", "text",
          graft.pipeline.Dedup.exactHashIndex(ix.toDF("doc_id", "text"), "doc_id", "text"),
          mBits)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("bloom_pos"),
          r.getAs[Long]("dup_of"), r.getAs[Long]("n_index_copies")))
        .toSet
      (got == want) :| s"mBits=$mBits got=$got want=$want"
    }, cases = 6)
  }

  test("m09: banded candidates + exact verify equal the brute-force hamming truth") {
    // hashes are a base with ≤5 random bit flips, so distances cluster around
    // the maxDist=3 boundary — the pigeonhole completeness claim does real work
    val genCase = for {
      base <- Gen.choose(0L, (1L << 60) - 1)
      n <- Gen.choose(3, 12)
      hs <- Gen.listOfN(n, Gen.choose(0, 5).flatMap(k =>
        Gen.listOfN(k, Gen.choose(0, 59)).map(_.foldLeft(base)((h, b) => h ^ (1L << b)))))
    } yield hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
    check("m09-mirror", Prop.forAll(genCase) { hs =>
      val want = (for {
        (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
      } yield (ia, ib, d)).toSet
      val got = graft.pipeline.Multimodal.phashNearDupOf(
          hs.toDF("asset_id", "phash"), bands = 4, maxDist = 3, maxAssetsPerBucket = 1000L)
        .collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("hamming")))
        .toSet
      (got == want) :| s"got=$got want=$want"
    }, cases = 6)
  }

  test("ev28: the histogram rank-sum Gini equals the sequential per-user formula") {
    val genEvents = for {
      n <- Gen.choose(5, 60)
      evs <- Gen.listOfN(n, Gen.zip(Gen.oneOf("view", "click", "buy"), Gen.choose(1L, 8L)))
    } yield evs
    check("ev28-mirror", Prop.forAll(genEvents) { evs =>
      val want = evs.groupBy(_._1).map { case (t, es) =>
        val counts = es.groupBy(_._2).values.map(_.size.toLong).toSeq.sorted
        val n = counts.size.toLong
        val tot = counts.sum
        val s = counts.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
        val g = math.floor(1e6 * (2 * s - (n + 1) * tot).toDouble / (n.toDouble * tot.toDouble) + 0.5).toLong
        t -> ((n, tot, g))
      }
      val got = AnalyticsQueries.giniConcentrationOf(evs.toDF("event_type", "user_id"))
        .collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("n_users"), r.getAs[Long]("total_events"), r.getAs[Long]("gini_micro"))))
        .toMap
      (got == want) :| s"got=$got want=$want"
    }, cases = 8)
  }

  test("dc25: the hb-cell split equals the plain per-stratum rank window; quotas land exactly") {
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val word = Gen.oneOf(Gen.oneOf("the", "a", "of", "and"),
      Gen.choose(100, 999).map(n => s"w$n"))
    val doc = Gen.choose(3, 20).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val genCorpus = for {
      nDocs <- Gen.choose(6, 30)
      texts <- Gen.listOfN(nDocs, doc)
      srcs <- Gen.listOfN(nDocs, Gen.oneOf("cc", "web"))
      pct <- Gen.choose(0, 100)
      salt <- Gen.oneOf("", "s1")
    } yield (texts.zip(srcs).zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }, pct, salt)
    check("dc25-mirror", Prop.forAll(genCorpus) { case (rows, pct, salt) =>
      val df = rows.toDF("doc_id", "text", "source")
      val measured = df.select(col("doc_id"), col("source"),
          graft.pipeline.TextStats.qualityMicro(col("text")).as("q"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2) / 100000L))
      val want = measured.groupBy { case (_, s, qb) => (s, qb) }.toSeq.flatMap {
        case ((s, qb), ds) =>
          val n = ds.length.toLong
          val quota = (n * pct + 50) / 100
          ds.sortBy { case (id, _, _) => (md5hex(salt + id.toString), id) }
            .zipWithIndex
            .map { case ((id, _, _), i) =>
              (id, s, qb, n, quota, if (i + 1 <= quota) "holdout" else "train") }
      }.toSet
      val got = graft.pipeline.Curation.stratifiedHoldout(df, "doc_id", "text", "source",
          holdoutPct = pct, bucketMicro = 100000L, salt = salt)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("qb"),
          r.getAs[Long]("n_stratum"), r.getAs[Long]("quota"), r.getAs[String]("split")))
        .toSet
      // exact-count law on top of the row-for-row mirror
      val exact = got.groupBy(t => (t._2, t._3)).forall { case (_, g) =>
        g.count(_._6 == "holdout") == g.head._5
      }
      (got == want && exact) :| s"pct=$pct salt=$salt got=$got want=$want"
    }, cases = 8)
  }

  test("ev30: the cumsum − running-min identity equals Page's sequential recursion") {
    val genSeries = for {
      nHours <- Gen.choose(4, 30)
      counts <- Gen.listOfN(nHours, Gen.frequency(
        (4, Gen.choose(0L, 3L)), (1, Gen.choose(10L, 40L))))
    } yield counts
    check("ev30-identity", Prop.forAll(genSeries.suchThat(_.sum > 0)) { counts =>
      val events = counts.zipWithIndex.flatMap { case (c, h) =>
        Seq.fill(c.toInt)(("t", h * 3600000000L)) }
      // the engine's grid spans OBSERVED hours only — trim the empty edges
      val lo = counts.indexWhere(_ > 0)
      val hi = counts.lastIndexWhere(_ > 0)
      val series = counts.slice(lo, hi + 1)
      val n = series.length.toLong
      val total = series.sum
      val mean = (2L * 1000000L * total + n) / (2L * n)
      val slack = mean / 2L
      // Page's recursion, literally
      var s = 0L; var best = 0L; var bestH = lo.toLong
      series.zipWithIndex.foreach { case (c, h) =>
        s = math.max(0L, s + (1000000L * c - mean - slack))
        if (s > best) { best = s; bestH = (lo + h).toLong }
      }
      val row = AnalyticsQueries.cusumChangepointOf(events.toDF("event_type", "tsu"))
        .collect().head
      val got = (row.getAs[Long]("mean_micro"), row.getAs[Long]("max_cusum_micro"),
        row.getAs[Long]("peak_hour_index"))
      (got == ((mean, best, bestH))) :| s"counts=$counts got=$got want=(${mean}, $best, $bestH)"
    }, cases = 8)
  }

  test("m10: the windowed scene labeling equals the sequential walk on random hash tracks") {
    val genTracks = for {
      nAssets <- Gen.choose(1, 4)
      tracks <- Gen.listOfN(nAssets, for {
        nFrames <- Gen.choose(1, 12)
        // base-walk hashes: mostly repeats with occasional jumps
        hs <- Gen.listOfN(nFrames, Gen.frequency(
          (3, Gen.const(-1L)), (1, Gen.choose(0L, 1L << 40))))
      } yield hs)
    } yield tracks.zipWithIndex.map { case (hs, a) =>
      // -1 sentinel = "repeat previous hash" (scan-carry), seeded at 7
      val resolved = hs.scanLeft(7L)((p, h) => if (h == -1L) p else h).tail
      (a.toLong, resolved)
    }
    check("m10-mirror", Prop.forAll(genTracks) { tracks =>
      val rows = tracks.flatMap { case (a, hs) =>
        hs.zipWithIndex.map { case (h, i) => (a, i * 2, i * 128L, h) } }
      val want = tracks.flatMap { case (a, hs) =>
        var scene = 0L
        hs.zipWithIndex.map { case (h, i) =>
          val prev = if (i == 0) None else Some(hs(i - 1))
          val ham = prev.map(p => java.lang.Long.bitCount(p ^ h)).getOrElse(-1)
          val cut = if (prev.isEmpty || ham >= 8) 1 else 0
          scene += cut
          (a, i * 2, ham, cut, scene)
        }
      }.toSet
      val got = graft.pipeline.Multimodal.sceneCutsOf(
          rows.toDF("asset_id", "frame_index", "frame_offset", "phash"), cutHamming = 8)
        .collect()
        .map(r => (r.getAs[Long]("asset_id"), r.getAs[Int]("frame_index"),
          r.getAs[Int]("hamming_prev"), r.getAs[Int]("is_cut"), r.getAs[Long]("scene_no")))
        .toSet
      (got == want) :| s"got=$got want=$want"
    }, cases = 6)
  }

  test("dc27: the bucket plan equals the sequential ledger on random corpora") {
    val word = Gen.choose(100, 999).map(n => s"w$n")
    val doc = Gen.choose(1, 600).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val genDocs = Gen.choose(3, 15).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    check("dc27-mirror", Prop.forAll(genDocs) { docs =>
      val widths = Seq(16L, 32L, 64L, 128L, 256L, 512L)
      val trunc = docs.map { case (_, t) => math.min(t.count(_ == ' ') + 1L, 512L) }
      val byBucket = trunc.groupBy(n => widths.find(n <= _).get)
      val allDocs = trunc.size.toLong
      val allReal = trunc.sum
      val naive = math.floor(1e6 * (allDocs * 512L - allReal).toDouble
        / (allDocs * 512L).toDouble + 0.5).toLong
      val want = byBucket.map { case (b, ns) =>
        val nd = ns.size.toLong
        val real = ns.sum
        (b, nd, (nd + 31L) / 32L, real, nd * b,
          math.floor(1e6 * (nd * b - real).toDouble / (nd * b).toDouble + 0.5).toLong, naive)
      }.toSet
      val got = graft.pipeline.Sampling.lengthBucketPlan(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect()
        .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_batches"),
          r.getAs[Long]("tokens_real"), r.getAs[Long]("tokens_padded"),
          r.getAs[Long]("waste_micro"), r.getAs[Long]("naive_waste_micro")))
        .toSet
      (got == want) :| s"got=$got want=$want"
    }, cases = 8)
  }
}
