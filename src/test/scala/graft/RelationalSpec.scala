package graft

import graft.operators.Relational
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Scan/filter/projection specs, including the plan-shape assertions the
  * operator Scaladoc promises: filters and projected columns must reach the
  * parquet reader (`PushedFilters` / `ReadSchema`) — the properties that make
  * these queries viable at 100 TB.
  */
class RelationalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("filter_range pushes its predicates into the parquet scan") {
    // read PushedFilters from the scan node's metadata — the rendered plan
    // string elides long filter lists.
    import org.apache.spark.sql.execution.FileSourceScanExec
    // sparkPlan, not executedPlan: AQE's AdaptiveSparkPlanExec hides its
    // subtree from collect().
    val scan = Relational.filterRange(spark, sfDir).queryExecution.sparkPlan
      .collectFirst { case f: FileSourceScanExec => f }
    assert(scan.nonEmpty, "no FileSourceScanExec leaf found")
    val pushed = scan.get.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_quantity,10.0)"), pushed)
    assert(pushed.contains("LessThanOrEqual(l_quantity,20.0)"), pushed)
    assert(pushed.contains("LessThan(l_discount,0.05)"), pushed)
  }

  test("scan_schema prunes the read schema to the projected columns") {
    val plan = Relational.scanSchema(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), plan)
  }

  test("filter_eq pushes the equality predicate") {
    val plan = Relational.filterEq(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(event_type,purchase)"), plan)
  }

  test("lineitem programmatic schema matches the data (A3: no inference)") {
    val df = spark.read.schema(Relational.lineitemSchema).parquet(s"$sfDir/lineitem.parquet")
    assert(df.schema("l_orderkey").dataType == LongType)
    assert(df.schema("l_linenumber").dataType == IntegerType)
    assert(df.schema("l_shipdate").dataType == TimestampType)
    assert(df.count() > 0)
  }

  test("classifiedColumns partitions lineitem names into the three groups (B6)") {
    val names = Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag")
    val (money, rates, qty) = Relational.classifiedColumns(names)
    assert(money == Seq("l_extendedprice"))
    assert(rates == Seq("l_discount", "l_tax"))
    assert(qty == Seq("l_quantity"))
  }

  test("project_case buckets are total and correct on inline rows") {
    import spark.implicits._
    val rows = Seq((1L, 500.0), (2L, 1000.0), (3L, 4999.99), (4L, 5000.0))
      .toDF("o_orderkey", "o_totalprice")
    rows.createOrReplaceTempView("pc_in")
    // same when/otherwise expression as the operator, applied to inline data
    import org.apache.spark.sql.functions._
    val got = rows.select(col("o_orderkey"),
        when(col("o_totalprice") < 1000, "low")
          .when(col("o_totalprice") < 5000, "mid")
          .otherwise("high").as("b"))
      .orderBy("o_orderkey").collect().map(_.getString(1)).toSeq
    assert(got == Seq("low", "mid", "mid", "high"))
  }

  test("sample_hash is deterministic, keyed, and near the target rate") {
    val a = Relational.sampleHash(spark, sfDir).collect()
    val b = Relational.sampleHash(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "same rows must be kept on every run")
    val total = Tables.documents(spark, sfDir).count()
    val rate = a.length.toDouble / total
    // md5 buckets are uniform; 10% ± 5pp at sf0.001 (500 docs)
    assert(rate > 0.05 && rate < 0.15, s"rate $rate")
    assert(a.forall(_.getInt(3) < Relational.SamplePct))
  }

  test("sample_mix honors per-language rates, deterministically") {
    val a = Relational.sampleMix(spark, sfDir).collect()
    val b = Relational.sampleMix(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "same rows must be kept on every run")
    // every kept row respects its own configured rate
    val pct = Relational.MixPct.toMap
    assert(a.forall(r => r.getInt(3) < pct.getOrElse(r.getString(1), 100)))
    // measured per-lang keep rates track the configured percentages
    // (md5 buckets are uniform; ±15pp tolerance at sf0.001 group sizes)
    val totals = Tables.documents(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    for ((lang, p) <- Relational.MixPct) {
      val rate = kept.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(rate - p / 100.0) < 0.15, f"$lang rate $rate%.2f vs ${p}%%")
    }
    // the scarcest language is kept in full — rebalancing must not lose it
    assert(kept("zh") == totals("zh"))
    // unknown languages default to keep-all (inline frame, not testdata)
    import spark.implicits._
    val extra = Seq((1L, "tlh", "srcX", 999)).toDF("doc_id", "lang", "source", "n_chars")
    extra.write.mode("overwrite").parquet("/tmp/graft_test_mix/documents.parquet")
    assert(Relational.sampleMix(spark, "/tmp/graft_test_mix").count() == 1)
  }

  test("sample_temperature: data-derived sqrt(n_min/n_l) rates, rarest language kept whole, measured rates track alpha=0.5 (K23')") {
    val out = Relational.sampleTemperature(spark, sfDir).collect()
    assert(out.nonEmpty)
    val totals = Tables.documents(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = totals.values.min
    // every row's threshold is exactly the floor'd sqrt law of its counts
    out.foreach { r =>
      val (lang, bp, nl, kbp) = (r.getString(1), r.getInt(2), r.getLong(3), r.getInt(4))
      assert(nl == totals(lang))
      val want = math.floor(math.sqrt(nMin.toDouble / nl.toDouble) * Relational.TempBasis).toInt
      assert(kbp == want, s"$lang keep_bp $kbp != $want")
      assert(bp < kbp)
    }
    val kept = out.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    // rarest language(s) keep 100% (rate exactly 1.0 -> threshold = basis)
    totals.filter(_._2 == nMin).keys.foreach { l =>
      assert(kept(l) == totals(l), s"rarest lang $l must be kept whole")
    }
    // head language is genuinely downsampled (non-vacuity: en is ~3x fr in
    // the fixture) and measured rates track sqrt(n_min/n_l) (+-15pp)
    val (headLang, headN) = totals.maxBy(_._2)
    assert(kept(headLang) < headN, "head language must lose rows")
    for ((l, n) <- totals) {
      val rate = kept.getOrElse(l, 0L).toDouble / n
      val want = math.sqrt(nMin.toDouble / n.toDouble)
      assert(math.abs(rate - want) < 0.15, f"$l rate $rate%.2f vs $want%.2f")
    }
    // determinism
    assert(Relational.sampleTemperature(spark, sfDir).collect().toSeq == out.toSeq)
  }

  test("stats_profile matches hand-computed stats on inline data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq[(java.lang.Double, java.lang.Double, java.lang.Double, java.lang.Double)](
      (1.0, 10.0, 0.1, 0.02), (2.0, 20.0, 0.1, 0.02), (null, 20.0, 0.2, 0.02))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    df.write.mode("overwrite").parquet("/tmp/graft_test_profile/lineitem.parquet")
    val rows = Relational.statsProfile(spark, "/tmp/graft_test_profile")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(rows("l_quantity") == ((3L, 1L, 2L, 1.0, 2.0)))
    assert(rows("l_extendedprice") == ((3L, 0L, 2L, 10.0, 20.0)))
    assert(rows("l_discount") == ((3L, 0L, 2L, 0.1, 0.2)))
    assert(rows("l_tax") == ((3L, 0L, 1L, 0.02, 0.02)))
  }

  test("sample_split partitions the corpus: every doc exactly one label, ~90/5/5") {
    import org.apache.spark.sql.functions._
    val split = Relational.sampleSplit(spark, sfDir)
    val total = graft.Tables.documents(spark, sfDir).count()
    assert(split.count() == total) // a partition, not a sample: no doc dropped
    assert(split.select("doc_id").distinct().count() == total)
    val byLabel = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    // md5 buckets are uniform-ish: train within [80%, 98%] of corpus
    val frac = byLabel("train").toDouble / total
    assert(frac > 0.80 && frac < 0.98, s"train fraction $frac")
    // label is a pure function of doc_id: labeling a PRE-FILTERED frame
    // (a re-ingested subset) must agree with the full-corpus labels —
    // a corpus-dependent term (rank, window) would fail here
    val subset = Relational.splitLabeled(
        graft.Tables.documents(spark, sfDir).filter(col("doc_id") % 7 === 0))
      .select(col("doc_id"), col("split").as("s2"))
    val disagree = split.join(subset, "doc_id")
      .filter(col("split") =!= col("s2")).count()
    assert(subset.count() > 0 && disagree == 0)
  }

  test("stats_histogram partitions every order into an in-range bin with its floor") {
    import graft.operators.Relational
    val rows = Relational.statsHistogram(spark, sfDir).collect()
    val total = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == total, "histogram lost or duplicated rows")
    rows.foreach { r =>
      val bin = r.getInt(0)
      assert(bin >= 0 && bin <= Relational.HistMaxBin, s"bin $bin out of range")
      assert(r.getDouble(3) == bin.toDouble * Relational.HistBinWidth,
        s"bin $bin floor ${r.getDouble(3)} not derived from index")
    }
  }

  test("sample_reservoir: exactly k rows, ranks bijective, kept keys dominate every excluded key") {
    import org.apache.spark.sql.functions.col
    val out = Relational.sampleReservoir(spark, sfDir).collect()
    assert(out.length == Relational.ReservoirK)
    val ranks = out.map(_.getInt(out.head.fieldIndex("sample_rank"))).sorted
    assert(ranks.toSeq == (1 to Relational.ReservoirK), "ranks must be a bijection onto 1..k")
    // top-k property: max kept hash < min excluded hash (ties impossible —
    // 60-bit keys over distinct doc_ids)
    val kept = out.map(r => r.getLong(r.fieldIndex("hkey")))
    val keptIds = out.map(r => r.getLong(r.fieldIndex("doc_id"))).toSet
    val minExcluded = Tables.documents(spark, sfDir)
      .withColumn("hkey", Relational.saltedHash("res"))
      .filter(!col("doc_id").isin(keptIds.toSeq: _*))
      .agg(org.apache.spark.sql.functions.min("hkey")).collect()(0).getLong(0)
    assert(kept.max < minExcluded, "a kept key exceeds an excluded key — not the k smallest")
  }

  test("scalar_map: busy subset is proper and non-empty somewhere; entries sorted, doubled (H8)") {
    val rows = Relational.scalarMap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var anyBusy = false
    rows.foreach { r =>
      val (nd, nb) = (r.getInt(1), r.getInt(2))
      assert(nb >= 0 && nb < nd, s"${r.getString(0)}: busy $nb not a proper subset of $nd days")
      if (nb > 0) {
        anyBusy = true
        val entries = r.getString(3).split(",").toSeq
        assert(entries.size == nb)
        assert(entries == entries.sorted, "map entries must render in key order")
        entries.foreach { e =>
          val v = e.split(":")(1).toLong
          assert(v % 2 == 0, s"transform_values doubling lost: $e")
        }
      }
    }
    assert(anyBusy, "no group has any above-average day — map_filter untested")
  }

  test("drift_psi: terms non-negative, total is their sum, stationary fixture reads no-drift") {
    val rows = Relational.driftPsi(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val terms = rows.map(_.getDouble(rows.head.fieldIndex("psi_term")))
    val total = rows.head.getDouble(rows.head.fieldIndex("psi_total"))
    // (q-p)·ln(q/p) is non-negative for every bin — a negative term means
    // the formula (not the data) is wrong
    terms.foreach(t => assert(t >= -1e-12, s"negative PSI term $t"))
    assert(math.abs(terms.sum - total) < 1e-4, s"terms sum ${terms.sum} != total $total")
    // the order-total distribution is stationary across years by
    // construction, so PSI must read "no significant drift" (< 0.1 —
    // the standard alert threshold is 0.25); a large value here means
    // the proportions are computed against the wrong denominators
    assert(total >= 0.0 && total < 0.1, s"stationary fixture read as drifting: PSI $total")
  }

  test("sample_weighted: exact k, and length-weighting visibly overrepresents long docs") {
    val out = Relational.sampleWeighted(spark, sfDir).collect()
    assert(out.length == Relational.WeightedK)
    val sampleMean = out.map(_.getLong(out.head.fieldIndex("n_chars"))).sum.toDouble / out.length
    val corpus = Tables.documents(spark, sfDir).select("n_chars").collect().map(_.getLong(0))
    val corpusMean = corpus.sum.toDouble / corpus.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean — weighting invisible")
  }
}
