package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.VectorOps
import graft.functions.Vec

/** Semantic-dedup k-scaling measurement (round 9): runs the SAME
  * [[VectorOps.dedupSemanticWith]] core at two cluster counts on one
  * corpus — the registered query's k = |labels| = 10 (the oracle-
  * expressible toy) and a deployment-scale k = 2^bits from a sign-bucket
  * coarse quantizer (random-hyperplane IVF init: centroid = mean of each
  * bucket, CONTENT-keyed so exact near-dups co-locate) — demonstrating
  * the SemDeDup cost law Σ|cluster|² ≈ N²/k with a measured wall, not an
  * argument. Usage: `sbt "runMain graft.SemDedupScale <sfDir> [bits]"`;
  * one JSON line.
  */
object SemDedupScale {
  def main(args: Array[String]): Unit = {
    val dir =
      if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val bits = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = body; (n, (System.nanoTime() - t0) / 1e9)
    }
    def fmt(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)

    val emb = Tables.embeddings(spark, dir)
    val n = emb.count() // warms IO
    // SEMDEDUP_SKIP_TOY=1 skips the two argmin-based measurements (the
    // toy k=10 pays ~7 min at 100×; set it when only the lsh number is
    // wanted — the argmin over 2^16 centroid structs is itself quadratic
    // territory, which is exactly why the lsh form skips assignment)
    val skipToy = sys.env.get("SEMDEDUP_SKIP_TOY").contains("1")
    // toy shape: the registered query (label-mean centroids, k = 10)
    val (rows10, sec10) = if (skipToy) (0L, 0.0) else timed(
      VectorOps.dedupSemantic(spark, dir).queryExecution.toRdd.count())
    // deployment shape: k = 2^bits sign-bucket coarse quantizer
    val rel = emb.select(
      Vec.signBucket(col("embedding"), bits).cast("int").as("label"),
      col("embedding"))
    val cent = VectorOps.labelMeanCentroids(rel)
    val k = if (skipToy) 0L else cent.count()
    val (rowsK, secK) = if (skipToy) (0L, 0.0) else timed(
      VectorOps.dedupSemanticWith(emb, cent).queryExecution.toRdd.count())
    // the REGISTERED linear-scale form at deployment width (conf knob —
    // same bits as the ad-hoc quantizer above, but cluster = own bucket,
    // no argmin pass at all)
    spark.conf.set(VectorOps.SemLshBitsConf, bits.toString)
    val (rowsL, secL) = timed(
      VectorOps.dedupSemanticLsh(spark, dir).queryExecution.toRdd.count())
    spark.conf.unset(VectorOps.SemLshBitsConf)
    println(s"""{"metric":"semdedup_scale","sf":"$dir","n_corpus":$n,""" +
      s""""toy":{"k":10,"secs":${fmt(sec10)},"rows":$rows10},""" +
      s""""deploy":{"k":$k,"secs":${fmt(secK)},"rows":$rowsK},""" +
      s""""lsh":{"bits":$bits,"secs":${fmt(secL)},"rows":$rowsL}}""")
    spark.stop()
  }
}
