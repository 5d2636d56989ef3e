package graft

import org.scalacheck.{Prop, Test => SCTest}

/** Round-6 queries assert LAWS in their scaladocs; this spec machine-checks
  * them instead of leaving them as prose — the AqeSpec discipline:
  *  - q134: the sorted-starts interval-union identity equals a brute-force
  *    union for arbitrary duplicated positions (∀-property);
  *  - q135: the relational greedy rewrite (run-parity selection) equals a
  *    sequential leftmost non-overlapping fold (∀-property);
  *  - q137: Σ alloc ≡ budget and every source within 1 of its exact quota;
  *  - q138: the minimal-disruption law — moved docs land ONLY on the new
  *    shards, and stay rows dominate.
  */
class Round6LawsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("∀ duplicated-position sets: sorted-starts union identity ≡ brute-force interval union") {
    val W = 8
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.choose(1, 60))
      .map(_.distinct.sorted)
    val prop = Prop.forAll(gen) { starts =>
      // brute force: mark every covered token, count contiguous blocks
      val covered = starts.flatMap(s => s until (s + W)).toSet
      val sortedCov = covered.toList.sorted
      val regionsBrute =
        if (sortedCov.isEmpty) 0
        else 1 + sortedCov.sliding(2).count {
          case List(a, b) => b - a > 1
          case _          => false
        }
      // the q134 identities (sorted starts)
      val union =
        if (starts.isEmpty) 0
        else W + starts.sliding(2).map {
          case Seq(a, b) => math.min(W, b - a)
          case _         => 0
        }.sum
      val regions =
        if (starts.isEmpty) 0
        else 1 + starts.sliding(2).count {
          case Seq(a, b) => b - a > W
          case _         => false
        }
      union == covered.size && regions == regionsBrute
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("∀ symbol strings: run-parity greedy selection ≡ sequential leftmost fold") {
    // the q135 rewrite claim: within runs of consecutive candidate
    // positions, selecting every other from the run head equals the
    // sequential greedy scan ("select unless previous selected is p-1")
    val symGen = for {
      n <- org.scalacheck.Gen.choose(0, 24)
      syms <- org.scalacheck.Gen.listOfN(n, org.scalacheck.Gen.oneOf("a", "b"))
      l <- org.scalacheck.Gen.oneOf("a", "b")
      r <- org.scalacheck.Gen.oneOf("a", "b")
    } yield (syms, l, r)
    val prop = Prop.forAll(symGen) { case (syms, l, r) =>
      val cands = syms.indices.dropRight(1)
        .filter(i => syms(i) == l && syms(i + 1) == r).map(_ + 1) // 1-based
      // sequential greedy
      val seq = scala.collection.mutable.ArrayBuffer.empty[Int]
      cands.foreach { p =>
        if (seq.isEmpty || seq.last != p - 1) seq += p
      }
      // run-parity (the relational formulation)
      val parity = cands.zipWithIndex
        .groupBy { case (p, i) => p - i } // run key
        .values.flatMap { run =>
          run.sortBy(_._1).zipWithIndex.collect {
            case ((p, _), off) if off % 2 == 0 => p
          }
        }.toSeq.sorted
      seq.toSeq == parity
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("q137 law: allocations sum to the budget; every source within 1 of its exact quota") {
    val rows = SparkEntry.queries("q137_mixture_alloc")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(5))) // source, n_tokens, alloc
    assert(rows.nonEmpty)
    val budget = 100000L
    val total = rows.map(_._2).sum
    assert(rows.map(_._3).sum == budget, "Σ alloc must equal the budget exactly")
    rows.foreach { case (src, nt, alloc) =>
      val exact = budget.toDouble * nt / total
      assert(math.abs(alloc - exact) < 1.0 + 1e-9,
        s"$src: alloc $alloc vs exact quota $exact breaks the Hamilton bound")
    }
  }

  test("q138 law: moved docs land only on NEW shards; old shards keep a majority") {
    val rows = SparkEntry.queries("q138_reshard_audit")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (o, n, _, moved) =>
      assert((moved == 1L) == (o != n))
      if (moved == 1L)
        assert(n >= 8L, s"moved doc went $o→$n: HRW must only move TO new shards")
    }
    val total = rows.map(_._3).sum
    val movedDocs = rows.filter(_._4 == 1L).map(_._3).sum
    // E[moved] = 2/10; allow generous slack on the small fixture
    assert(movedDocs * 10 < total * 4,
      s"moved $movedDocs of $total — far above the 2/10 expectation")
    assert(movedDocs > 0, "fixture degenerate: nothing moved at all")
  }
}
