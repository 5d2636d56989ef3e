package graft

import graft.queries.{DedupQueries, PipelineQueries, RelationalQueries, ScaleQueries, SimilarityQueries}
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-6 operators (q115 leakage-safe split,
  * q116 token-budget cap, q117 quantile calibration, q118 range layout,
  * q119 stream-static enrichment, q120 centroid drift) beyond the DuckDB
  * hash oracle: from-scratch driver-side recomputes and cross-query
  * consistency laws at sf0.001, so a silent drift in a building block
  * fails even if both engines drift together.
  */
class Round6OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5Mod(s: String, m: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % m
  }
  private def md5Bucket(x: Long): Long = md5Mod(x.toString, 10)
  private def splitOf(b: Long): String =
    if (b <= 7) "train" else if (b == 8) "val" else "test"

  test("q115: no cluster ever spans two splits, and the split is the cluster hash") {
    val rows = DedupQueries.q115.spark(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getInt(4)))
    assert(rows.nonEmpty)
    // leakage-safety BY CONSTRUCTION: one split per cluster
    rows.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._4).distinct.length == 1, s"cluster $c leaks")
    }
    // the split is exactly md5(cluster) mod 10, and the audit flag is
    // exactly "a per-doc hash would have disagreed, in a real cluster"
    rows.foreach { case (doc, cluster, size, split, leak) =>
      assert(split == splitOf(md5Bucket(cluster)), s"doc $doc split")
      val expectLeak =
        size > 1 && splitOf(md5Bucket(doc)) != splitOf(md5Bucket(cluster))
      assert(leak == (if (expectLeak) 1 else 0), s"doc $doc leak flag")
    }
  }

  test("q115: cluster assignment is q24's components") {
    val split = DedupQueries.q115.spark(spark, sf)
      .select("doc_id", "cluster")
    val comps = DedupQueries.q24.spark(spark, sf)
      .select("doc_id", "cluster")
    assert(split.exceptAll(comps).isEmpty && comps.exceptAll(split).isEmpty)
  }

  private def docWords: Array[(Long, String, Array[String])] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split("\\s+").filter(_.nonEmpty)))

  test("q116: matches a from-scratch per-source budget recompute") {
    val got = PipelineQueries.q116.spark(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getInt(5)))).toMap

    val expect = docWords
      .map { case (id, src, ws) =>
        (id, src, ws.length.toLong, 1000L * ws.distinct.length / ws.length)
      }
      .groupBy(_._2).values.flatMap { docs =>
        var cum = 0L
        docs.sortBy(d => (-d._4, d._1)).map { case (id, _, toks, q) =>
          cum += toks
          id -> ((toks, q, cum, if (cum <= 3000L) 1 else 0))
        }
      }.toMap
    assert(got == expect)
  }

  test("q116: kept set is a prefix of the quality order and respects the cap") {
    val rows = PipelineQueries.q116.spark(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(0),
        r.getInt(5)))
    rows.groupBy(_._1).foreach { case (src, docs) =>
      val inOrder = docs.sortBy(d => (-d._3, d._4))
      val keptToks = inOrder.takeWhile(_._5 == 1).map(_._2).sum
      assert(keptToks <= 3000L, s"source $src busts the budget")
      // prefix property: once dropped, never kept again
      assert(!inOrder.dropWhile(_._5 == 1).exists(_._5 == 1), s"source $src")
    }
  }

  test("q117: percent_rank matches (rank-1)/(n-1) from scratch, gate keeps top half") {
    val got = PipelineQueries.q117.spark(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getInt(4)))).toMap

    val expect = docWords
      .map { case (id, src, ws) =>
        (id, src, 1000L * ws.distinct.length / ws.length)
      }
      .groupBy(_._2).values.flatMap { docs =>
        val inOrder = docs.sortBy(d => (d._3, d._1))
        val n = inOrder.length
        inOrder.zipWithIndex.map { case ((id, _, _), i) =>
          val pr = if (n == 1) 0.0 else i.toDouble / (n - 1)
          id -> ((pr, if (pr >= 0.5) 1 else 0))
        }
      }.toMap
    assert(got == expect)
  }

  test("q118: buckets are disjoint, exhaustive, and ordered") {
    val rows = ScaleQueriesAccess.q118(spark, sf)
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(rows.map(_._2).sum == total) // every row landed in a bucket
    assert(rows.map(_._1).toSeq == (0L until 8L)) // all 8 buckets non-empty
    rows.foreach { case (b, _, mn, mx, disjoint) =>
      assert(mn <= mx && disjoint == 1, s"bucket $b")
    }
    // extents strictly increase bucket to bucket (the data-skipping law)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 < hi._3, s"buckets ${lo._1}/${hi._1} overlap")
    }
  }

  test("q119: matches a from-scratch enrichment recompute") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nat = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val counts = graft.queries.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .flatMap { r =>
        cust.get(r.getLong(0)).flatMap(nat.get)
          .map(n => (n, r.getString(1)))
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

    val got = RelationalQueries.q119.spark(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == counts && got.nonEmpty)
  }

  test("q121: matches a from-scratch bucket/padding-waste recompute") {
    val toks = docWords.map { case (id, _, ws) => id -> ws.length.toLong }
    def lg2(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val gn = toks.length.toLong
    val gsum = toks.map(_._2).sum
    val gmax = toks.map(_._2).max
    val expect = toks.groupBy { case (_, t) => 1L << lg2(t) }.map {
      case (lo, ds) =>
        val n = ds.length.toLong
        val sum = ds.map(_._2).sum
        val mx = ds.map(_._2).max
        lo -> ((n, sum, mx, n * mx - sum, 1000000L * (n * mx - sum) / (n * mx),
          1000000L * (gn * gmax - gsum) / (gn * gmax)))
    }
    val got = PipelineQueries.q121.spark(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("q122: matches a from-scratch median/MAD recompute") {
    def medianX2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    val ev = graft.queries.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 1e6).toLong))
    val expect = ev.groupBy(_._1).map { case (t, rows) =>
      val vs = rows.map(_._2).toSeq
      val m2 = medianX2(vs)
      val ds = vs.map(v => math.abs(2 * v - m2))
      val m4 = medianX2(ds)
      t -> ((vs.length.toLong, m2 / 2.0, m4 / 4.0,
        ds.count(d => 2 * d > 3 * m4).toLong))
    }
    val got = RelationalQueries.q122.spark(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("q123: totals match the fact tables; fixture FKs are orphan-free") {
    val rows = ScaleQueries.q123.spark(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def cnt(t: String): Long = spark.read.parquet(s"$sf/$t.parquet").count()
    assert(rows("customer_nation")._1 == cnt("customer"))
    assert(rows("events_user")._1 == cnt("events"))
    assert(rows("lineitem_order")._1 == cnt("lineitem"))
    // the generated fixtures are referentially intact — all orphan counts 0
    rows.foreach { case (rel, (_, orphans, ppm)) =>
      assert(orphans == 0L && ppm == 0L, rel)
    }
  }

  test("q123: the left-join orphan count is the anti-join count") {
    // detection logic cross-check on frames WITH orphans: user_ids shifted
    // out of customer range must be flagged at the exact anti-join rate
    import spark.implicits._
    val fact = Seq(1L, 2L, 3L, 100L, 200L).toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val viaLeft = fact.join(dim, $"k" === $"dk", "left")
      .agg(org.apache.spark.sql.functions.sum(
        $"dk".isNull.cast("long"))).head.getLong(0)
    val viaAnti = fact.join(dim, $"k" === $"dk", "left_anti").count()
    assert(viaLeft == 2L && viaAnti == 2L)
  }

  test("q124: matches a from-scratch diversity recompute") {
    val expect = docWords.groupBy(_._2).map { case (src, ds) =>
      val unis = ds.flatMap(_._3)
      val tris = ds.flatMap { case (_, _, ws) =>
        if (ws.length < 3) Seq(ws.mkString(" "))
        else ws.sliding(3).map(_.mkString(" ")).toSeq
      }
      src -> ((unis.distinct.length.toLong, unis.length.toLong,
        1000000L * unis.distinct.length / unis.length,
        tris.distinct.length.toLong, tris.length.toLong,
        1000000L * tris.distinct.length / tris.length))
    }
    val got = TextQueriesAccess.q124(spark, sf)
    assert(got == expect && got.nonEmpty)
  }

  test("q125: IVM result equals a from-scratch post-state recompute") {
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), md5Mod(r.getString(2), 100)))
    // apply the changeset row-wise, then aggregate — the ground truth the
    // delta-merge must reproduce without rescanning
    val post = base.flatMap { case (src, ch, b) =>
      val kept = if (b < 10) Seq.empty
        else if (b < 20) Seq(src -> (ch + 7)) else Seq(src -> ch)
      val ins = if (b >= 20 && b < 25) Seq(src -> (ch + 3)) else Seq.empty
      kept ++ ins
    }
    val expect = post.groupBy(_._1).view
      .mapValues(vs => (vs.length.toLong, vs.map(_._2).sum)).toMap
    val got = ScaleQueries.q125.spark(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect && got.nonEmpty)
    // and the audit deltas reconcile base to post exactly
    val baseAgg = base.groupBy(_._1).view
      .mapValues(vs => (vs.length.toLong, vs.map(_._2).sum)).toMap
    ScaleQueries.q125.spark(spark, sf).collect().foreach { r =>
      val (bn, bch) = baseAgg(r.getString(0))
      assert(bn + r.getLong(3) == r.getLong(1))
      assert(bch + r.getLong(4) == r.getLong(2))
    }
  }

  test("q126: matches a from-scratch cross-modal gate recompute") {
    val norms = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val n2 = r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * 1e6).toLong)
          .map(v => v * v).sum
        r.getLong(0) -> n2
      }.toMap
    val expect = docWords.map { case (id, _, ws) =>
      val q = 1000L * ws.distinct.length / ws.length
      val n2 = norms.get(id)
      val keep = q >= 450 &&
        n2.forall(v => v >= 800000000000L && v <= 1200000000000L)
      id -> ((n2.isDefined, n2.getOrElse(-1L), q, keep))
    }.toMap
    val got = MultimodalQueriesAccess.q126(spark, sf)
    assert(got == expect && got.nonEmpty)
  }

  test("q127: grouped histogram-refine selection equals sorted order statistics") {
    val ev = graft.queries.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 1e6).toLong))
    val expect = ev.groupBy(_._1).map { case (g, rows) =>
      val s = rows.map(_._2).sorted
      val n = s.length.toLong
      g -> ((n, s(((n + 1) / 2 - 1).toInt), s(((9 * n + 9) / 10 - 1).toInt)))
    }
    val got = ScaleQueries.q127.spark(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expect && got.nonEmpty)
  }

  test("q127/q122 medians agree (selection vs percentile buffer, odd groups)") {
    // q122's interpolated median equals q127's lower order statistic
    // exactly when the group size is odd; for even groups it is the
    // midpoint of q127's k-th and (k+1)-th — either way q127's value
    // bounds it from below
    val sel = ScaleQueries.q127.spark(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    RelationalQueries.q122.spark(spark, sf).collect().foreach { r =>
      val (n, lowerMed) = sel(r.getString(0))
      val med = r.getDouble(2)
      if (n % 2 == 1) assert(med == lowerMed.toDouble, r.getString(0))
      else assert(med >= lowerMed.toDouble, r.getString(0))
    }
  }

  test("q128: checksums are partitioning- and order-invariant, content-sensitive") {
    import org.apache.spark.sql.functions._
    def sum128(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = {
      val (lo, hi) = graft.functions.GraftFunctions.md5_halves(
        concat_ws("|", col("doc_id").cast("string"), md5(col("text"))))
      df.select(lo.as("lo"), hi.as("hi"))
        .agg(expr("bit_xor(lo)"), expr("bit_xor(hi)"),
          expr("cast(sum(cast(lo as decimal(38,0))) % 4294967296 as bigint)"))
        .collect().map(_.toSeq).toSeq
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val base = sum128(docs)
    // same rows, different physical layout -> identical checksum
    assert(sum128(docs.repartition(13)) == base)
    assert(sum128(docs.orderBy(col("n_chars").desc)) == base)
    // one flipped byte -> different checksum
    val tweaked = docs.withColumn("text",
      when(col("doc_id") === 0L, concat(col("text"), lit("x")))
        .otherwise(col("text")))
    assert(sum128(tweaked) != base)
    // xor is blind to a row duplicated TWICE (even multiplicity); the
    // mod-2^32 sum is the component that catches it
    val one = docs.filter(col("doc_id") === 0L)
    val dup2 = docs.union(one).union(one)
    val d = sum128(dup2)
    assert(d.head.take(2) == base.head.take(2)) // xor halves unchanged
    assert(d.head(2) != base.head(2)) // sum component differs
  }

  test("q129: the resume manifest is the exact suffix of the full epoch order") {
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    def keyOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:epoch1".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val laid = ids.map(id => (id, keyOf(id)))
      .groupBy { case (_, k) => k % 8 }.view.mapValues { vs =>
        vs.sortBy { case (id, k) => (k, id) }.map(_._1).toSeq
      }.toMap
    val n = ids.length.toLong
    val s40 = n * 4 / 10
    val expect = laid.map { case (shard, order) =>
      val remaining = order.zipWithIndex.filter { case (_, i) =>
        i.toLong * 8 + shard >= s40 // gstep = (pos-1)*8 + shard, pos = i+1
      }.map(_._1)
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(remaining.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      shard -> ((remaining.length.toLong,
        (order.length - remaining.length + 1).toLong, digest))
    }
    val got = ScaleQueries.q129.spark(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("q130: matches a from-scratch two-round clamped label spread") {
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val docs = docWords.map { case (id, _, ws) =>
      (id, ws, {
        val b = java.lang.Long.parseLong(
          md5hex(ws.mkString(" ")).substring(0, 8), 16) % 100
        if (b < 10) 1 else if (b < 20) -1 else 0
      })
    }
    // NOTE: text reconstructed from words equals the original (single-space
    // word salad) — guarded below against the real text column
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, ws, _) => assert(ws.mkString(" ") == texts(id)) }

    val shingles = docs.map { case (id, ws, _) =>
      val sh =
        if (ws.length < 5) Set(ws.mkString(" "))
        else ws.sliding(5).map(_.mkString(" ")).toSet
      (id, sh)
    }.toMap
    val ids = docs.map(_._1)
    val edges = (for {
      a <- ids; b <- ids if a < b
      inter = (shingles(a) & shingles(b)).size
      if inter > 0 && inter * 20 >= (shingles(a).size + shingles(b).size - inter)
    } yield (a, b)).flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val seeds = docs.map { case (id, _, s) => id -> s }.toMap
    def spread(l: Map[Long, Int]): Map[Long, Int] = l.map { case (id, lbl) =>
      id -> (if (seeds(id) != 0) seeds(id)
      else {
        val vote = edges.getOrElse(id, Seq.empty[Long]).map(l).sum
        math.signum(lbl * 2 + vote)
      })
    }
    val expect = spread(spread(seeds))
    val got = DedupQueries.q130.spark(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == expect && got.nonEmpty)
    // clamp law: seeds always keep their verdict
    DedupQueries.q130.spark(spark, sf).collect().foreach { r =>
      if (r.getInt(1) != 0) assert(r.getInt(2) == r.getInt(1))
    }
  }

  test("q131: every released non-generalized cell satisfies k >= 5; totals reconcile") {
    val rows = PipelineQueries.q131.spark(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    rows.foreach { case (l, src, n, gen) =>
      if (gen == 0) assert(n >= 5L, s"($l, $src)")
      assert((l == "*") == (gen == 1) && (l == "*") == (src == "*"))
    }
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._3).sum == total)
  }

  test("q132: shard-merged histograms are lossless for every group") {
    val rows = graft.queries.SketchQueries.q132.spark(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, _, cellsEq, lossless) =>
      assert(cellsEq == 1 && lossless == 1, lang)
    }
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._2).sum == total)
  }

  test("q133: source-pair sketch comparisons are complete and bounded") {
    val k = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count()
    val rows = DedupQueries.q133.spark(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.length.toLong == k * (k - 1) / 2) // every unordered pair once
    rows.foreach { case (a, b, agree, jac) =>
      assert(a < b)
      assert(agree >= 0 && agree <= 64)
      assert(jac == agree * 10000 / 64)
    }
  }

  test("q120: matches an exact BigInt centroid-distance recompute") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val byLabel = vecs.groupBy(_._1).view.mapValues { vs =>
      val dim = vs.head._2.length
      val sums = Array.fill(dim)(BigInt(0))
      vs.foreach { case (_, v) =>
        var i = 0
        while (i < dim) {
          sums(i) += BigInt(math.floor(v(i).toDouble * 1e6).toLong); i += 1
        }
      }
      (sums, BigInt(vs.length))
    }.toMap

    val expect = (for {
      a <- byLabel.keys; b <- byLabel.keys if a < b
    } yield {
      val (sa, na) = byLabel(a); val (sb, nb) = byLabel(b)
      val s2 = sa.indices.map { i =>
        val d = sa(i) * nb - sb(i) * na; d * d
      }.sum
      val den = (na * nb * BigInt(1000000)).pow(2)
      (a, b) -> (s2 * 1000000 / den).toLong
    }).toMap

    val got = SimilarityQueries.q120.spark(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(4)).toMap
    assert(got == expect && got.nonEmpty)
  }
}

/** q118 row accessor shared by the invariants test (keeps the tuple
  * unpacking in one place). */
private object ScaleQueriesAccess {
  def q118(spark: org.apache.spark.sql.SparkSession, sf: String)
      : Array[(Long, Long, Long, Long, Int)] =
    ScaleQueries.q118.spark(spark, sf).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
}

private object MultimodalQueriesAccess {
  def q126(spark: org.apache.spark.sql.SparkSession, sf: String)
      : Map[Long, (Boolean, Long, Long, Boolean)] =
    graft.queries.MultimodalQueries.q126.spark(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1) == 1, r.getLong(2),
        r.getLong(3), r.getInt(4) == 1))).toMap
}

private object TextQueriesAccess {
  def q124(spark: org.apache.spark.sql.SparkSession, sf: String)
      : Map[String, (Long, Long, Long, Long, Long, Long)] =
    graft.queries.TextQueries.q124.spark(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
}
