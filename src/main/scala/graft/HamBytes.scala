package graft

import org.apache.spark.sql.SparkSession
import graft.operators.VectorOps

/** Scan-bytes evidence for the `sim_hamming` signature column family —
  * the [[MrlBytes]] protocol applied to the binary-quantization mirror:
  * stage 1's storage claim is that ranking the corpus by Hamming distance
  * reads two BIGINT signature words per row instead of the `Dim`-float
  * embedding, so the evidence is the exact parquet column-chunk byte sum
  * each arm's scan schema obligates the reader to fetch (footer
  * arithmetic — see MrlBytes for why runtime IO counters cannot see
  * column pruning on a local filesystem):
  *  - `staged` — (vec_id, bits_lo, bits_hi) chunks of the staged mirror;
  *  - `inline` — (vec_id, embedding) chunks of the ORIGINAL table (the
  *    signature built on the fly forces the scan to fetch all `Dim`
  *    floats).
  *
  * Both arms also run the candidate count once and must agree — the
  * semantic-identity guard.
  *
  * Usage: `sbt "runMain graft.HamBytes <sfDir>"` — one JSON line.
  */
object HamBytes {

  def main(args: Array[String]): Unit = {
    val dir =
      if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // round-14 ADVICE: shut the session down even when the semantic-
    // identity require (or a read) throws
    try {

    val staged = VectorOps.hamStaged(spark, dir)
    val nStaged = VectorOps.hamCandidates(spark, staged).count()
    val nInline = VectorOps.hamCandidates(spark,
      VectorOps.hamBitsInline(spark, dir)).count()
    require(nStaged == nInline,
      s"arms disagree on candidate count: $nStaged vs $nInline")

    val mirrorDir =
      s"${operators.Relational.stagedRoot(VectorOps.HamStageDir)}/embeddings"
    val bStaged = MrlBytes.chunkBytes(mirrorDir, Set("vec_id", "bits_lo", "bits_hi"))
    // apples-to-apples denominator: the SAME mirror files' full-dim column
    // set — isolates the column-family cut from original-vs-mirror
    // encoding differences
    val bMirrorFull = MrlBytes.chunkBytes(mirrorDir, Set("vec_id", "embedding"))
    val bInline = MrlBytes.chunkBytes(s"$dir/embeddings.parquet",
      Set("vec_id", "embedding"))

    def ratio(num: Long, den: Long): BigDecimal =
      BigDecimal(num.toDouble / math.max(den, 1L))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"metric":"ham_scan_bytes","sf":"$dir",""" +
      s""""candidates":$nStaged,"staged_stage1_bytes":$bStaged,""" +
      s""""mirror_fulldim_bytes":$bMirrorFull,"inline_stage1_bytes":$bInline,""" +
      s""""pruning_cut":${ratio(bMirrorFull, bStaged)},""" +
      s""""inline_over_staged":${ratio(bInline, bStaged)}}""")

    } finally spark.stop()
  }
}
