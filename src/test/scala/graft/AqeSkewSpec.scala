package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting — the engine's docs lean on "AQE handles skew"
  * for every shuffle-join shape that does NOT hand-salt (the salted forms
  * exist for windows and for deliberate demos); this spec makes that claim
  * mechanical: a planted hot key must make AQE split the skewed partition
  * (final plan shows `skew=true`) and the split join must return exactly
  * the unskewed join's rows. Thresholds are deployment-sized by default
  * (256 MB partitions) — conf'd down here to fire on test data, the same
  * pattern RuntimeFilterSpec uses for the bloom join.
  */
class AqeSkewSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("planted hot key: AQE splits the skewed partition and preserves the join result") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // deployment defaults are 256MB/factor-5 — lowered to fire on test data
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      // keep the join a shuffle join — a broadcast has no partitions to skew
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // fact: one key owns 90% of rows (real skew — partition-level, not
      // just key-level); dim: every key once
      val fact = spark.range(0, 100000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id") % 100).as("k"),
          col("id").as("v"))
      val dim = spark.range(0, 100).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = fact.join(dim, "k")
      // materialize THIS dataframe's own plan (count() would plan a separate
      // aggregate query and leave `joined`'s adaptive plan untouched)
      val n = joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(2000)}")
      // correctness under the split: same cardinality AND same content
      // checksum as the unskewed join (round-6 advice: a count alone would
      // miss a split bug that corrupts values while preserving cardinality)
      def checksum(df: org.apache.spark.sql.DataFrame): (Long, java.math.BigDecimal) = {
        // decimal sum: 100k longs summed as int64 would overflow ANSI add
        val r = df.agg(count(lit(1)),
          sum(xxhash64(col("k"), col("v"), col("w")).cast("decimal(38,0)"))).head()
        (r.getLong(0), r.getDecimal(1))
      }
      val split = checksum(joined)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val plain = checksum(fact.join(dim, "k"))
      assert(n == plain._1 && split == plain,
        s"skew split changed the result: split=$split plain=$plain")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salting spreads a planted 100x hot key: max-task share drops vs unsalted") {
    import spark.implicits._
    // AQE off: reducer partitions map 1:1 to tasks, so the per-partition
    // output row count IS the per-task join load (its deterministic
    // component — wall-clock would measure the same shape plus noise).
    // Broadcast off: a broadcast join has no reducers to skew.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // enough reducers that the S salted sub-keys land on distinct tasks
      // (the test session's default 4 would cap the measurable spread)
      "spark.sql.shuffle.partitions" -> "64")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val S = 8
      // hot key 0: 50k rows; 100 cold keys: 500 rows each → exactly 100×
      val fact = spark.range(0, 100000)
        .select(when(col("id") < 50000, 0L).otherwise(col("id") % 100 + 1).as("k"),
          col("id").as("v"))
      val dim = spark.range(0, 101).select(col("id").as("k"), (col("id") * 10).as("w"))

      def partitionLoads(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.queryExecution.toRdd
          .mapPartitions(it => Iterator.single(it.size.toLong))
          .collect().toSeq
      def maxShare(loads: Seq[Long]): Double =
        loads.max.toDouble / loads.sum

      val unsalted = partitionLoads(fact.join(dim, "k"))
      val saltedFact = fact.withColumn("salt", pmod(hash(col("v")), lit(S)))
      val saltedDim = dim.withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
      val salted = partitionLoads(saltedFact.join(saltedDim, Seq("k", "salt"))
        .drop("salt"))

      assert(unsalted.sum == salted.sum, "salting changed the join cardinality")
      // unsalted: one reducer owns the hot key's 50% of all output rows;
      // salted: the hot key spreads over S reducers (~6% each + cold noise)
      assert(maxShare(unsalted) >= 0.45,
        s"fixture lost its skew: unsalted max share ${maxShare(unsalted)}")
      assert(maxShare(salted) <= maxShare(unsalted) / 4,
        s"salting did not spread the hot key: salted max-task share " +
          s"${maxShare(salted)} vs unsalted ${maxShare(unsalted)} " +
          s"(loads salted=$salted unsalted=$unsalted)")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
