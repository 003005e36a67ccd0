package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.propBoolean

/** Property mirror of the round-13 reachability kernel: the
  * condensation-accelerated answer must equal a brute-force breadth-first
  * closure over the ORIGINAL edges on random digraphs — the same independence
  * discipline as RoundTwelvePropertySpec's Tarjan mirror for sccOf.
  */
class RoundThirteenPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, cases: Int = 5): Unit = {
    val params = ScTest.Parameters.default.withMinSuccessfulTests(cases)
    val result = ScTest.check(params, prop)
    assert(result.passed, s"$name: $result")
  }

  private def edgeGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(3, 10)
    m <- Gen.choose(2, 24)
    edges <- Gen.listOfN(m, for {
      s <- Gen.choose(1L, n.toLong)
      d <- Gen.choose(1L, n.toLong) if d != s
    } yield (s, d))
  } yield edges.distinct

  /** Plain BFS closure from every seed; min seed per reached vertex. */
  private def bruteReach(edges: List[(Long, Long)], seedMod: Long): Map[Long, Long] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val seeds = verts.filter(_ % seedMod == 0)
    val best = scala.collection.mutable.Map.empty[Long, Long]
    for (seed <- seeds) {
      val seen = scala.collection.mutable.Set(seed)
      var frontier = List(seed)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Nil)).filterNot(seen)
        seen ++= frontier
      }
      seen.foreach(v => best(v) = math.min(best.getOrElse(v, Long.MaxValue), seed))
    }
    best.toMap
  }

  /** Sequential Kruskal with union-find — the independent MSF mirror. */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for ((w, a, b) <- edges.map { case (a, b, w) => (w, a, b) }.sorted) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; out += ((a, b, w)) }
    }
    out.toSet
  }

  test("msfOf equals sequential Kruskal on random weighted graphs") {
    check("boruvka-kruskal", Prop.forAll(edgeGen) { edges =>
      (edges.nonEmpty) ==> {
        // canonicalize to undirected (a < b) with a deterministic weight per pair
        val ue = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }.distinct
          .map { case (a, b) => (a, b, (a * 7919 + b * 104729) % 1000) }
        val got = GraphQueries.msfOf(ue.toDF("a", "b", "w"), rounds = 6, propSteps = 4)
          .collect()
          .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("w"))).toSet
        val want = kruskal(ue)
        (got == want) :| s"got $got want $want ue $ue"
      }
    })
  }

  test("msfOf refuses an uncertifiable result when labels outlast the unroll") {
    // a 5-chain with ascending weights: the WHOLE forest is picked in round 1,
    // but at propSteps=1 the label contraction lags — completeness cannot be
    // certified within rounds=1, so the kernel refuses (conservatively: every
    // pick is an MSF edge either way, the message says exactly that)
    val ue = (1L to 4L).map(i => (i, i + 1, i * 10L))
    val e = intercept[IllegalStateException] {
      GraphQueries.msfOf(ue.toDF("a", "b", "w"), rounds = 1, propSteps = 1).collect()
    }
    assert(e.getMessage.contains("cannot be certified"), e.getMessage)
  }

  /** Sequential mirror of the t47 battery: the seven Gopher quality rules
    * re-derived in plain Scala over the raw string.
    */
  private def mirrorGopherQuality(text: String): Long = {
    val words = text.split(" ", -1)
    val lines = text.split("\n", -1)
    val nWords = words.length.toLong
    val sumLen = words.map(_.length.toLong).sum
    def occ(s: String, needle: String): Long = {
      var i = 0; var n = 0L
      while ({ i = s.indexOf(needle, i); i >= 0 }) { n += 1; i += needle.length }
      n
    }
    val symbols = occ(text, "#") + occ(text, "...") + occ(text, "…")
    val bullets = lines.count(l => l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•"))
    val ellipsis = lines.count(l => l.endsWith("...") || l.endsWith("…"))
    val alpha = words.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
    val req = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .count(words.contains)
    (if (nWords < 50 || nWords > 100000) 1L else 0L) +
      (if (sumLen < 3 * nWords || sumLen > 10 * nWords) 2L else 0L) +
      (if (symbols * 10 > nWords) 4L else 0L) +
      (if (bullets * 10 > lines.length) 8L else 0L) +
      (if (ellipsis * 10 > lines.length * 3) 16L else 0L) +
      (if (alpha * 5 < nWords * 4) 32L else 0L) +
      (if (req < 2) 64L else 0L)
  }

  test("gopherQuality equals the sequential rule mirror on random documents") {
    val tokenGen = Gen.frequency(
      (6, Gen.oneOf("the", "be", "to", "of", "word", "ab#c", "1234", "x...", "…", "- y")),
      (2, Gen.alphaLowerStr.map(_.take(12))),
      (1, Gen.const("")))
    val docGen = for {
      n <- Gen.choose(1, 80)
      ts <- Gen.listOfN(n, tokenGen)
      nl <- Gen.choose(0, 3)
    } yield {
      // splice a few newlines between tokens so the line rules fire
      val s = ts.mkString(" ")
      if (nl == 0 || s.isEmpty) s
      else s.zipWithIndex.map { case (c, i) => if (c == ' ' && i % 17 == 0) '\n' else c }.mkString
    }
    check("gopher-quality-mirror", Prop.forAll(Gen.listOfN(4, docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.pipeline.TextStats.gopherQuality(docs, "doc_id", "text")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("reasons")).toMap
      val want = texts.zipWithIndex.map { case (t, i) => i.toLong -> mirrorGopherQuality(t) }.toMap
      (got == want) :| s"got $got want $want texts $texts"
    })
  }

  test("matchingOf equals the sequential greedy-by-weight matching on random graphs") {
    check("dominant-greedy", Prop.forAll(edgeGen) { edges =>
      (edges.nonEmpty) ==> {
        val ue = edges.map { case (s, d) => (math.min(s, d), math.max(s, d)) }.distinct
          .map { case (a, b) => (a, b, (a * 104729 + b * 7919) % 1000) }
        val got = GraphQueries.matchingOf(ue.toDF("a", "b", "w"), rounds = 12)
          .collect()
          .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("w"))).toSet
        // independent mirror: one sequential greedy scan in (w, a, b) order
        val taken = scala.collection.mutable.Set.empty[Long]
        val want = ue.map { case (a, b, w) => (w, a, b) }.sorted.flatMap { case (w, a, b) =>
          if (!taken(a) && !taken(b)) { taken += a; taken += b; Some((a, b, w)) } else None
        }.toSet
        // greedy equality implies validity AND maximality
        (got == want) :| s"got $got want $want ue $ue"
      }
    })
  }

  test("sccReachKernel equals a brute-force closure on random digraphs") {
    check("reach-from-set", Prop.forAll(edgeGen) { edges =>
      (edges.nonEmpty) ==> {
        val df = edges.toDF("src", "dst")
        val got = GraphQueries.sccReachKernel(df, seedMod = 2, maxRounds = 30)
          .collect()
          .map(r => r.getAs[Long]("vertex_id") -> r.getAs[Long]("reachable_from"))
          .toMap
        val want = bruteReach(edges, seedMod = 2L)
        (got == want) :| s"got $got want $want edges $edges"
      }
    })
  }

  test("sccReachKernel with an empty seed set reaches nothing (and terminates)") {
    val df = Seq((1L, 3L), (3L, 5L), (5L, 1L)).toDF("src", "dst") // no even vertex
    assert(GraphQueries.sccReachKernel(df, seedMod = 2, maxRounds = 10).count() == 0L)
  }

  test("landmarkKernel estimates are triangle-inequality upper bounds on random graphs") {
    // est(u, v) = min_l d(l,u) + d(l,v) must never UNDER-estimate the true
    // undirected hop distance, and must equal it whenever some landmark lies on
    // a shortest path (in particular when u or v IS a landmark within hops)
    def bfs(adj: Map[Long, Seq[Long]], s: Long, maxHops: Int): Map[Long, Int] = {
      var dist = Map(s -> 0)
      var frontier = List(s)
      var h = 0
      while (frontier.nonEmpty && h < maxHops) {
        h += 1
        val next = frontier.flatMap(v => adj.getOrElse(v, Nil)).filterNot(dist.contains).distinct
        dist ++= next.map(_ -> h)
        frontier = next
      }
      dist
    }
    check("landmark-upper-bound", Prop.forAll(edgeGen) { edges =>
      (edges.nonEmpty) ==> {
        val df = edges.toDF("src", "dst")
        val und = (edges ++ edges.map(e => (e._2, e._1))).distinct
        val adj = und.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
        val got = GraphQueries.landmarkKernel(df, nLandmarks = 4, maxHops = 3, uMod = 2, vMod = 3)
          .collect()
          .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")) ->
            (r.getAs[Int]("d_est"), r.getAs[Long]("via_landmark"))).toMap
        val verts = und.map(_._1).distinct
        val trueDist = verts.map(s => s -> bfs(adj, s, maxHops = 10)).toMap
        val sound = got.forall { case ((u, v), (est, via)) =>
          trueDist(u).get(v).forall(d => est >= d) &&
            // the witness is real: d(via,u) + d(via,v) within the hop bound
            bfs(adj, via, 3).get(u).nonEmpty && bfs(adj, via, 3).get(v).nonEmpty &&
            est == bfs(adj, via, 3)(u) + bfs(adj, via, 3)(v)
        }
        sound :| s"estimates $got edges $edges"
      }
    })
  }

  // ---- g54 HyperANF: exact register mirror ----------------------------------
  // The estimator math is published (Flajolet et al. 2007, Boldi-Vigna-Rosa
  // 2011); OUR risk is the distributed register fixpoint. So the mirror
  // computes each ball's TRUE register set via a sequential BFS closure and
  // applies the identical estimator — the outputs must match EXACTLY.

  private def mirrorHyperAnf(edges: List[(Long, Long)], rounds: Int): Seq[(Int, Long, Long)] = {
    val m = 16
    val alphaMM = 0.673 * m * m
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    def reg(v: Long): (Long, Int) = {
      val h = md5h32(v.toString)
      val w = h & ((1L << 28) - 1)
      val rho = if (w == 0L) 29 else 29 - java.lang.Long.toBinaryString(w).length
      (h >> 28, rho)
    }
    def ball(v: Long, t: Int): Set[Long] = {
      var seen = Set(v); var frontier = Set(v)
      for (_ <- 1 to t) {
        frontier = frontier.flatMap(x => adj.getOrElse(x, Nil)).diff(seen)
        seen ++= frontier
      }
      seen
    }
    def estMicro(members: Set[Long]): Long = {
      val regs = members.toSeq.map(reg).groupBy(_._1).map { case (i, rs) => i -> rs.map(_._2).max }
      val ssum = regs.values.map(r => 1.0 / (1L << r)).sum + (m - regs.size).toDouble
      val raw = alphaMM / ssum
      val est =
        if (raw <= 2.5 * m && regs.size < m) m * math.log(m.toDouble / (m - regs.size)) else raw
      val est3 = BigDecimal(est).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      math.floor(est3 * 1000 + 0.5).toLong
    }
    val nf = (0 to rounds).map(t => t -> verts.map(v => estMicro(ball(v, t))).sum)
    val nfMax = nf.map(_._2).max
    nf.map { case (t, n) =>
      (t, n, math.floor(1e6 * n.toDouble / nfMax.toDouble + 0.5).toLong)
    }
  }

  test("hyperAnfOf equals the sequential register mirror on random digraphs") {
    check("hyperanf-mirror", Prop.forAll(edgeGen) { edges =>
      (edges.nonEmpty) ==> {
        val df = edges.toDF("src", "dst")
        val got = GraphQueries.hyperAnfOf(df, rounds = 3)
          .collect()
          .map(r => (r.getAs[Int]("t"), r.getAs[Long]("nf_micro"), r.getAs[Long]("frac_micro")))
          .sortBy(_._1).toSeq
        val want = mirrorHyperAnf(edges, rounds = 3)
        (got == want) :| s"got $got want $want edges $edges"
      }
    })
  }

  test("hyperAnf t=0 law: every ball is a singleton, linear counting prices it 1033 micro") {
    // 16 * ln(16/15) = 1.0326... -> 1.033 -> 1033 per vertex, exactly
    val df = Seq((1L, 2L), (2L, 3L), (4L, 1L)).toDF("src", "dst")
    val rows = GraphQueries.hyperAnfOf(df, rounds = 2).collect()
      .map(r => r.getAs[Int]("t") -> r.getAs[Long]("nf_micro")).toMap
    assert(rows(0) == 4L * 1033L, rows.toString)
    // and the curve is monotone (registers only grow)
    assert(rows(0) <= rows(1) && rows(1) <= rows(2), rows.toString)
  }

  /** Sequential h-index iteration over the symmetric closure of random edges. */
  private def mirrorHIndex(edges: List[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val und = (edges ++ edges.map(_.swap)).distinct.filter(p => p._1 != p._2)
    val adj = und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var h: Map[Long, Long] = adj.map { case (v, ns) => v -> ns.size.toLong }
    for (_ <- 1 to rounds)
      h = adj.map { case (v, ns) =>
        val vals = ns.map(h).sortBy(-_)
        v -> vals.zipWithIndex.map { case (x, i) => math.min(x, i + 1L) }.max
      }
    h
  }

  /** Batagelj–Zaveršnik peeling: the exact core number of every vertex. */
  private def peelCoreness(edges: List[(Long, Long)]): Map[Long, Long] = {
    val und = (edges ++ edges.map(_.swap)).distinct.filter(p => p._1 != p._2)
    var adj = und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val core = scala.collection.mutable.Map.empty[Long, Long]
    var k = 0L
    while (adj.nonEmpty) {
      val peel = adj.collect { case (v, ns) if ns.size <= k => v }.toSet
      if (peel.isEmpty) k += 1
      else {
        peel.foreach(core(_) = k)
        adj = adj.collect { case (v, ns) if !peel(v) => v -> (ns -- peel) }
      }
    }
    core.toMap
  }

  test("corenessOf equals the sequential h-index mirror on random graphs") {
    check("coreness-mirror", Prop.forAll(edgeGen) { edges =>
      edges.nonEmpty ==> {
        val got = GraphQueries.corenessOf(
          edges.flatMap(e => Seq(e, e.swap)).distinct.toDF("src", "dst"), rounds = 3)
          .collect().map(r => r.getAs[Long]("vertex_id") -> r.getAs[Long]("coreness")).toMap
        val want = mirrorHIndex(edges, rounds = 3)
        (got == want) :| s"got $got want $want edges $edges"
      }
    })
  }

  test("h-index iteration converges to Batagelj–Zaveršnik peeling coreness and bounds it") {
    check("coreness-converges", Prop.forAll(edgeGen) { edges =>
      edges.nonEmpty ==> {
        val exact = peelCoreness(edges)
        val after3 = mirrorHIndex(edges, rounds = 3)
        // the potential Σh ≤ |V|·max-degree strictly decreases each non-fixed
        // round, so 100 rounds is a safe fixpoint bound for a ≤10-vertex graph
        val converged = mirrorHIndex(edges, rounds = 100)
        val bound = after3.forall { case (v, h) => h >= exact(v) }
        (converged == exact && bound) :|
          s"converged $converged exact $exact after3 $after3 edges $edges"
      }
    })
  }

  /** Sequential mirror of the t46 battery: brute-force n-gram maps per doc. */
  private def mirrorGopher(docs: Seq[(Long, String)]): Map[Long, (Long, Seq[Long], Long, Int)] =
    docs.map { case (id, text) =>
      val w = text.split(" ", -1)
      val nc = text.length.toLong
      def frac(a: Long): Long = (2L * 1000000L * a + math.max(nc, 1L)) / (2L * math.max(nc, 1L))
      val fracs = (2 to 10).map { n =>
        val grams = (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" "))
        val counts = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val charsIn =
          if (counts.isEmpty) 0L
          else if (n <= 4) {
            // deterministic tie-break: count desc, length desc, gram ASC
            val best = counts.toSeq.sortBy { case (g, c) => (-c, -g.length.toLong, g) }.head
            best._2 * best._1.length
          } else counts.collect { case (g, c) if c >= 2 => c * g.length }.sum
        frac(charsIn)
      }
      val thr = Seq(200000L, 180000L, 160000L, 150000L, 140000L, 130000L, 120000L, 110000L, 100000L)
      val reasons = fracs.zip(thr).zipWithIndex.collect {
        case ((f, t), i) if f > t => 1L << i
      }.sum
      id -> ((nc, fracs, reasons, if (reasons == 0) 1 else 0))
    }.toMap

  test("gopherRepetition equals the sequential n-gram mirror on random docs") {
    import graft.pipeline.TextStats
    val docGen: Gen[List[(Long, String)]] = for {
      nDocs <- Gen.choose(1, 6)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 18)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "ab", "xyz"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong + 1L) -> t }
    check("gopher-mirror", Prop.forAll(docGen) { docs =>
      docs.nonEmpty ==> {
        val got = TextStats.gopherRepetition(docs.toDF("doc_id", "text"), "doc_id", "text")
          .collect().map { r =>
            r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_chars"),
              (2 to 10).map(n => r.getAs[Long](
                if (n <= 4) s"top${n}_micro" else s"dup${n}_micro")).toSeq,
              r.getAs[Long]("reasons"), r.getAs[Int]("kept")))
          }.toMap
        val want = mirrorGopher(docs)
        (got == want) :| s"got $got want $want docs $docs"
      }
    })
  }

  test("gopherRepetition planted: triple-bigram loop trips the top battery, 5-gram echo the dup") {
    import graft.pipeline.TextStats
    val docs = Seq(
      (1L, "a b a b a b"),            // top2 "a b"x3 -> 9/11 chars; top3/top4 also trip
      (3L, "p q r s t p q r s t u")   // "p q r s t" twice -> dup5 trips (bit 3)
    ).toDF("doc_id", "text")
    val got = TextStats.gopherRepetition(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("top2_micro"), r.getAs[Long]("dup5_micro"),
          r.getAs[Long]("reasons"), r.getAs[Int]("kept")))).toMap
    assert(got(1L)._1 == 818182L, got.toString)       // (2e6*9+11) div 22
    assert((got(1L)._3 & 7L) == 7L && got(1L)._4 == 0, got.toString)
    assert(got(3L)._2 == 857143L, got.toString)       // 18 of 21 chars: (2e6*18+21) div 42
    assert((got(3L)._3 & 8L) == 8L, got.toString)
  }

  test("effectiveDiameterOf interpolates planted curves exactly") {
    def diam(curve: Seq[(Int, Long, Long)]): (Int, Long, Long) = {
      val row = GraphQueries
        .effectiveDiameterOf(curve.toDF("t", "nf_micro", "frac_micro"), fracPct = 90)
        .collect()
      assert(row.length == 1, row.toSeq.toString)
      (row(0).getAs[Int]("t_hit"), row(0).getAs[Long]("eff_diameter_micro"),
        row(0).getAs[Long]("nf_max"))
    }
    // hit at t = 0 (plateau already at radius 0): diameter 0 by definition
    assert(diam(Seq((0, 1000L, 1000000L), (1, 1000L, 1000000L))) == (0, 0L, 1000L))
    // exact hit: frac crosses 900000 exactly at t = 2 -> interp lands on 2.0
    assert(diam(Seq((0, 100L, 100000L), (1, 500L, 500000L), (2, 900L, 900000L),
      (3, 1000L, 1000000L))) == (2, 2000000L, 1000L))
    // interpolated midpoint: 500000 -> 1000000 brackets 900000 at 4/5 of the step
    assert(diam(Seq((0, 500L, 500000L), (1, 1000L, 1000000L))) == (1, 800000L, 1000L))
    // floor(x + 1/2) rounding of the fractional part: (900000-400000)/(999999-400000)
    // = 0.8333347... -> 833335 micro
    assert(diam(Seq((0, 400L, 400000L), (1, 999L, 999999L), (2, 1000L, 1000000L)))
      == (1, 833335L, 1000L))
    // NON-MONOTONE curve (estimator dip across the linear-counting regime
    // switch): raw frac crosses 900000 at t=1, dips below at t=2, re-crosses at
    // t=3 — the monotone envelope keeps the t=1 crossing as the ONLY row (diam
    // asserts row.length == 1) and interpolates the envelope, not the raw dip
    assert(diam(Seq((0, 500L, 500000L), (1, 950L, 950000L), (2, 880L, 880000L),
      (3, 1000L, 1000000L))) == (1, 888889L, 1000L))
    // dip BEFORE the crossing: envelope plateaus at 800000 through t=2, then
    // crosses — prev_frac reads the envelope (800000), not the raw dip (700000)
    assert(diam(Seq((0, 800L, 800000L), (1, 700L, 700000L), (2, 1000L, 1000000L)))
      == (2, 1500000L, 1000L))
  }

  test("effectiveDiameter end-to-end agrees with the interpolation applied to hyperAnfOf") {
    val df = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val curve = GraphQueries.hyperAnfOf(df, rounds = 3)
    val got = GraphQueries.effectiveDiameterOf(curve, fracPct = 90).collect()(0)
    val raw = curve.collect()
      .map(r => (r.getAs[Int]("t"), r.getAs[Long]("nf_micro"), r.getAs[Long]("frac_micro")))
      .sortBy(_._1)
    // mirror the kernel's monotone envelope (running max of frac over t)
    val rows = raw.scanLeft((0, 0L, Long.MinValue)) {
      case ((_, _, acc), (t, nf, f)) => (t, nf, math.max(acc, f))
    }.tail
    val (tHit, _, prevFrac) = rows.sliding(2).collectFirst {
      case Array((_, _, p), (t, _, f)) if f >= 900000L && p < 900000L => (t, f, p)
    }.getOrElse((0, 0L, 0L))
    val fHit = rows.find(_._1 == tHit).get._3
    val want =
      if (tHit == 0) 0L
      else (tHit - 1) * 1000000L +
        (2L * 1000000L * (900000L - prevFrac) + (fHit - prevFrac)) / (2L * (fHit - prevFrac))
    assert(got.getAs[Long]("eff_diameter_micro") == want, s"got $got want $want rows ${rows.toSeq}")
    assert(got.getAs[Long]("nf_max") == rows.map(_._2).max)
  }

  test("sccReachKernel on a planted core-plus-tail: the core's seed reaches the whole tail") {
    // 2 -> {1,3} cycle core... seed 2 inside a 3-cycle {1,2,3}, tail 3 -> 7 -> 9
    val df = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 7L), (7L, 9L)).toDF("src", "dst")
    val got = GraphQueries.sccReachKernel(df, seedMod = 2, maxRounds = 10)
      .collect().map(r => r.getAs[Long]("vertex_id") -> r.getAs[Long]("reachable_from")).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 7L -> 2L, 9L -> 2L), got.toString)
  }
}
