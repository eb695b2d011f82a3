package graft

import graft.operators.Aggregates
import graft.functions.TypedAvg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatesSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("approx_count_distinct is within 2% of exact per group (D13 ε-bound)") {
    val exact = Aggregates.aggDistinct(spark, sfDir)
      .select("event_type", "n_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Aggregates.aggApproxDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e) <= math.max(1L, (0.02 * e).toLong),
        s"$k: approx=$a exact=$e out of 2% bound")
    }
  }

  test("agg_weighted matches a brute-force weighted average on collected rows (D21)") {
    val got = Aggregates.aggWeighted(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = graft.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val want = vs.map(v => v._2 * v._3).sum / vs.map(_._2).sum
      val (wavg, avg) = got(k)
      assert(math.abs(wavg - want) < 1e-6, s"$k: wavg $wavg vs brute $want")
      // weighting must be visible: the two averages differ on real data
      assert(wavg != avg, s"$k: weighted == unweighted — vacuous weighting")
    }
  }

  test("agg_percentile p50 equals agg_median per group; quartiles ordered (D16)") {
    val med = Aggregates.aggMedian(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val q = Aggregates.aggPercentile(spark, sfDir).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val (k, p25, p50, p75) =
        (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      // the 0.5 percentile IS the median — two independent code paths must
      // agree exactly (both interpolate over the same integer cents)
      assert(p50 == med(k), s"$k: p50=$p50 median=${med(k)}")
      assert(p25 <= p50 && p50 <= p75, s"$k: quartiles out of order $p25/$p50/$p75")
    }
  }

  test("agg_sketch_merge: shard-union == direct sketch per row; within HLL ε (D17)") {
    // merge correctness + accuracy now ride IN the gated output as computed
    // flags (laws-as-columns, round 13): the estimate served by unioning
    // stored (type, day) shard sketches AND the one-pass direct estimate
    // must each sit within 5σ of the published rsd of the exact distinct
    // count (estimate EQUALITY between the paths is not a law —
    // DataSketches switches HIP → composite estimators on union; see the
    // operator scaladoc). A cleared flag breaks both this spec AND the
    // DuckDB hash gate (the oracle emits literal 1s).
    val out = Aggregates.aggSketchMerge(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    out.foreach { case (t, _, mergeOk, boundOk) =>
      assert(mergeOk == 1, s"$t: shard-union estimate outside the 5σ HLL bound")
      assert(boundOk == 1, s"$t: direct estimate outside the 5σ HLL bound")
    }
    assert(out.length == 6, s"expected 5 types + ALL, got ${out.length}")
    // exact counts are monotone under union: each per-type exact ≤ ALL
    val rows = out.map(r => r._1 -> r._2).toMap
    rows.filter(_._1 != "ALL").foreach { case (k, v) =>
      assert(v <= rows("ALL"), s"$k=$v > ALL=${rows("ALL")}")
    }
  }

  test("agg_approx_distinct: estimate within the 5σ rsd bound per group (D13b)") {
    val out = Aggregates.aggApproxDistinct(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.nonEmpty)
    out.foreach { case (t, exact, boundOk) =>
      assert(exact > 0, s"$t: vacuous group")
      assert(boundOk == 1, s"$t: HLL++ estimate outside 5σ of rsd=${Aggregates.ApproxDistinctRsd}")
    }
  }

  test("agg_median matches a brute-force midpoint median (D11)") {
    import spark.implicits._
    val vals = Seq(("a", 1.0), ("a", 2.0), ("a", 10.0), ("b", 4.0), ("b", 8.0), ("b", 5.0), ("b", 7.0))
    val df = vals.toDF("k", "v")
    val got = df.groupBy("k").agg(median($"v").as("m")).orderBy("k")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def brute(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val expected = vals.groupBy(_._1).map { case (k, vs) => k -> brute(vs.map(_._2)) }
    assert(got == expected)
  }

  test("agg_mode tiebreak is deterministic: count desc then value asc (D12)") {
    import spark.implicits._
    // user_bucket 0: 'click' and 'view' tie at 2 — 'click' wins alphabetically
    val ev = Seq((0L, "view"), (0L, "view"), (0L, "click"), (0L, "click"))
      .toDF("user_id", "event_type")
    val counts = ev.groupBy((col("user_id") % 10).as("user_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_bucket").orderBy(desc("n"), asc("event_type"))
    val top = counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("event_type").collect().map(_.getString(0)).toSeq
    assert(top == Seq("click"))
  }

  test("TypedAvg equals the built-in avg on 2-decimal money") {
    import spark.implicits._
    val df = Seq(("x", 10.01), ("x", 10.02), ("y", 5.55)).toDF("k", "v")
    val typed = df.as[(String, Double)].groupByKey(_._1)
      .agg(TypedAvg.ofSecond.name("t")).toDF("k", "t")
    val builtin = df.groupBy("k").agg(avg("v").as("b"))
    val j = typed.join(builtin, "k").collect()
    j.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9, r.toString)
    }
  }

  test("TypedAvg cents buffer is exact where double summation drifts") {
    // 0.1 + 0.2 != 0.3 in float64; in cents it is exact.
    import spark.implicits._
    val df = Seq.fill(1000)(0.01).map(("k", _)).toDF("k", "v")
    val t = df.as[(String, Double)].groupByKey(_._1)
      .agg(TypedAvg.ofSecond.name("t")).collect().head._2
    assert(t == 0.01)
  }

  test("group_collect emits a scalar comma-joined id string (driver-hashable)") {
    val row = Aggregates.groupCollect(spark, sfDir).limit(1).collect().head
    val ids = row.getString(row.fieldIndex("doc_ids"))
    assert(ids.split(",").forall(_.forall(_.isDigit)), ids)
    assert(ids.split(",").map(_.toLong).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      s"ids must be sorted: $ids")
  }

  test("rollup adds the grand-total and per-flag subtotal rows (D14)") {
    val n = Aggregates.aggRollup(spark, sfDir).count()
    val base = Aggregates.aggAvg(spark, sfDir).count() // leaf grouping cardinality
    assert(n > base) // subtotals + grand total present
  }

  test("agg_pivot row sums equal per-source document counts (D15)") {
    val wide = Aggregates.aggPivot(spark, sfDir).collect()
      .map(r => r.getString(0) -> (1 to 5).map(r.getLong(_)).sum).toMap
    val tall = graft.Tables.documents(spark, sfDir).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == tall)
  }

  test("agg_groupingsets emits exactly the three requested sets (D16)") {
    val rows = Aggregates.aggGroupingSets(spark, sfDir).collect()
    val byFlags = rows.groupBy(r =>
      (r.getInt(r.fieldIndex("g_flag")), r.getInt(r.fieldIndex("g_status"))))
    // (0,1): per-flag marginal; (1,0): per-status marginal; (1,1): total
    assert(byFlags.keySet == Set((0, 1), (1, 0), (1, 1)))
    assert(byFlags((1, 1)).size == 1)
    val grand = byFlags((1, 1)).head.getLong(byFlags((1, 1)).head.fieldIndex("n"))
    val flagSum = byFlags((0, 1)).map(r => r.getLong(r.fieldIndex("n"))).sum
    val statusSum = byFlags((1, 0)).map(r => r.getLong(r.fieldIndex("n"))).sum
    assert(flagSum == statusSum && grand == flagSum,
      s"marginals must re-sum to the grand total: $flagSum/$statusSum/$grand")
  }

  test("agg_countmin flags all pass and estimates sit inside the eps bound (D22)") {
    val rows = Aggregates.aggCountmin(spark, sfDir).collect()
    assert(rows.nonEmpty, "lexicon tokens must occur in the corpus")
    rows.foreach { r =>
      assert(r.getInt(r.fieldIndex("over_ok")) == 1, s"underestimate at ${r.get(0)}")
      assert(r.getInt(r.fieldIndex("merge_ok")) == 1, s"merge drift at ${r.get(0)}")
      assert(r.getInt(r.fieldIndex("bound_ok")) == 1, s"bound blowout at ${r.get(0)}")
      assert(r.getLong(r.fieldIndex("exact_n")) > 0)
    }
    // the gate checks the LAWS; pin the estimate quality here: at this
    // corpus size the CMS width (e/eps counters) dwarfs the vocabulary, so
    // lexicon estimates should be EXACT, not merely bounded
    import graft.Tables
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
    val sk = toks.stat.countMinSketch("token", Aggregates.CmsEps, 0.99, 42)
    val exact = toks.where(col("token").isin(graft.operators.TextOps.lexicon: _*))
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(sk.estimateCount(t) == n,
        s"collision-free regime expected: $t est=${sk.estimateCount(t)} exact=$n")
    }
  }

  test("agg_corr moment formula matches built-in corr/covar_samp to 1e-6 (D17)") {
    import graft.Tables
    val got = Aggregates.aggCorr(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(r.fieldIndex("corr_qty_price")),
                                   r.getDouble(r.fieldIndex("covar_qty_price")))).toMap
    val ref = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(corr("l_quantity", "l_extendedprice").as("c"),
           covar_samp("l_quantity", "l_extendedprice").as("cv"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, (c, cv)) =>
      // outputs are rounded (6 digits corr, 4 covar) for cross-engine
      // determinism: allow half an output ulp plus builtin float noise
      assert(math.abs(c - ref(k)._1) < 6e-7, s"$k corr $c vs ${ref(k)._1}")
      assert(math.abs(cv - ref(k)._2) < math.abs(ref(k)._2) * 1e-9 + 6e-5,
        s"$k covar $cv vs ${ref(k)._2}")
    }
  }

  test("agg_regression matches the built-in regr_slope/regr_intercept to 1e-6 (D25)") {
    import graft.Tables
    val got = Aggregates.aggRegression(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(r.fieldIndex("slope")),
                                   r.getDouble(r.fieldIndex("intercept")),
                                   r.getDouble(r.fieldIndex("r2")))).toMap
    val ref = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(regr_slope(col("l_extendedprice"), col("l_quantity")).as("s"),
           regr_intercept(col("l_extendedprice"), col("l_quantity")).as("i"),
           regr_r2(col("l_extendedprice"), col("l_quantity")).as("r"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, (s, i, r2)) =>
      assert(math.abs(s - ref(k)._1) < math.abs(ref(k)._1) * 1e-9 + 6e-7, s"$k slope $s vs ${ref(k)._1}")
      assert(math.abs(i - ref(k)._2) < math.abs(ref(k)._2) * 1e-9 + 6e-5, s"$k intercept $i vs ${ref(k)._2}")
      assert(r2 >= 0.0 && r2 <= 1.0 && math.abs(r2 - ref(k)._3) < 1e-6, s"$k r2 $r2 vs ${ref(k)._3}")
    }
  }

  test("agg_entropy: 0 <= H <= ln(k); norm_entropy <= 1; doc counts partition the corpus (D26)") {
    val rows = Aggregates.aggEntropy(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      val (n, k) = (r.getLong(r.fieldIndex("n_docs")), r.getInt(r.fieldIndex("n_langs")))
      val (h, nh) = (r.getDouble(r.fieldIndex("entropy")), r.getDouble(r.fieldIndex("norm_entropy")))
      total += n
      assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-9, s"${r.getString(0)}: H=$h outside [0, ln $k]")
      assert(nh <= 1.0 + 1e-9, s"${r.getString(0)}: norm_entropy $nh > 1")
    }
    assert(total == graft.Tables.documents(spark, sfDir).count(),
      "per-source doc counts must partition the corpus")
  }

  test("stats_ks matches a brute-force two-sample KS statistic per type (D30)") {
    val got = Aggregates.statsKs(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("ks_d"))).toMap
    val rows = graft.Tables.events(spark, sfDir)
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1) % 2, math.round(r.getDouble(2) * 100)))
    rows.groupBy(_._1).foreach { case (t, vs) =>
      val a = vs.filter(_._2 == 0).map(_._3).sorted
      val b = vs.filter(_._2 == 1).map(_._3).sorted
      val xs = (a ++ b).distinct.sorted
      val d = xs.map { x =>
        math.abs(a.count(_ <= x).toDouble / a.length - b.count(_ <= x).toDouble / b.length)
      }.max
      assert(got(t) >= 0.0 && got(t) <= 1.0)
      assert(math.abs(got(t) - d) < 1e-6, s"$t: ks ${got(t)} vs brute $d")
    }
  }

  test("agg_argmax equals window_top1 row-for-row (the agg form of top-1-per-group, D29)") {
    val viaAgg = Aggregates.aggArgmax(spark, sfDir)
      .select("user_id", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val viaWindow = graft.operators.Windows.windowTop1(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(viaAgg == viaWindow)
  }

  test("agg_stringagg: cells are sorted, sized n_nations, and jointly carry all 25 nations (D27)") {
    val rows = Aggregates.aggStringagg(spark, sfDir).collect()
    val all = rows.flatMap { r =>
      val ns = r.getString(r.fieldIndex("nations")).split(",").toSeq
      assert(ns == ns.sorted, s"${r.getString(0)}: cell not sorted")
      assert(ns.size == r.getInt(r.fieldIndex("n_nations")), s"${r.getString(0)}: size mismatch")
      ns
    }
    assert(all.length == 25 && all.distinct.length == 25)
  }

  test("agg_kmv: KMV merge law, 5-sigma bound flags, and complete pair frame (D31)") {
    val rows = Aggregates.aggKmv(spark, sfDir).collect()
    // complete pair frame over the 5 langs, flags all 1 (the statistical
    // bounds genuinely hold on this data — the laws are not vacuous)
    assert(rows.length == 10, s"expected 10 lang pairs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getInt(r.fieldIndex("est_ok")) == 1 &&
             r.getInt(r.fieldIndex("jac_ok")) == 1,
        s"bound flag tripped: $r")
      val (nI, nU) = (r.getLong(r.fieldIndex("n_inter")), r.getLong(r.fieldIndex("n_union")))
      val (nA, nB) = (r.getLong(r.fieldIndex("n_a")), r.getLong(r.fieldIndex("n_b")))
      assert(nU == nA + nB - nI && nI > 0, s"exact-twin arithmetic broken: $r")
      assert(r.getLong(r.fieldIndex("n_common")) <= r.getInt(r.fieldIndex("kk")))
    }
    // the MERGE law that makes KMV a mergeable summary:
    // k-smallest(k-smallest(A) ∪ k-smallest(B)) == k-smallest(A ∪ B) —
    // recompute both sides from the raw hash sets for one pair
    import graft.operators.TextOps
    val hv = graft.Tables.documents(spark, sfDir)
      .select(col("lang"),
        explode(array_distinct(TextOps.shingles(col("text"), 3))).as("g"))
      .select(col("lang"),
        conv(substring(md5(col("g").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("hv"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val (a, b) = ("de", "en")
    def kmin(s: Set[Long]): Seq[Long] = s.toSeq.sorted.take(Aggregates.KmvK)
    val fromSketches = kmin(kmin(hv(a)).toSet ++ kmin(hv(b)).toSet)
    val fromUnion = kmin(hv(a) ++ hv(b))
    assert(fromSketches == fromUnion, "KMV merge law violated")
    // and the operator's published state for that pair matches the
    // reference recomputation: kk = |union sketch|, h_k its max
    val de = rows.find(r => r.getString(0) == a && r.getString(1) == b).get
    assert(de.getInt(de.fieldIndex("kk")) == fromUnion.size &&
           de.getLong(de.fieldIndex("h_k")) == fromUnion.max,
      s"sketch state drifted from reference: $de vs ${fromUnion.size}/${fromUnion.max}")
  }
}
