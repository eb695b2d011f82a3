package graft

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import graft.operators.VectorOps

/** Scan-bytes evidence for the `sim_mrl` prefix column family (round-14
  * VERDICT next #1/#8): stage 1's claim is a STORAGE win — reading the
  * 16-float prefix column family instead of the 64-float embedding — so
  * the evidence is the exact number of parquet column-chunk bytes each
  * arm's scan schema obligates the reader to fetch.
  *
  * Why footer arithmetic and not a runtime IO counter: Spark's
  * `inputMetrics.bytesRead` on a local filesystem captures only the
  * footer/stream bookkeeping (measured: an all-column sum, a one-column
  * sum, and a count(*) over the same 36 MB table all report the identical
  * 88 KB), so it cannot see column pruning at all. Parquet, by contract,
  * reads exactly the compressed chunks of the columns in the scan schema
  * (`requiredSchema` — asserted to be `(vec_id, prefix)` for stage 1 in
  * SourcesSpec), so bytes-to-read per arm IS the footer sum over that
  * column set:
  *  - `staged`  — (vec_id, prefix) chunks of the staged mirror;
  *  - `inline`  — (vec_id, embedding) chunks of the ORIGINAL table (the
  *    round-13 shape sliced the prefix out of the full column, so its
  *    scan had to fetch all `Dim` floats).
  *
  * Both arms also run the candidate count once and must agree — the
  * semantic-identity guard that keeps the measurement about the same
  * query.
  *
  * Usage: `sbt "runMain graft.MrlBytes <sfDir>"` — one JSON line.
  */
object MrlBytes {

  /** Sum of compressed column-chunk bytes across all row groups of all
    * part files under `dir`, for leaf columns whose TOP-LEVEL field name
    * is in `fields` (array columns have leaves like `prefix.list.element`).
    */
  private[graft] def chunkBytes(dir: String, fields: Set[String]): Long = {
    val conf = new Configuration()
    val root = new java.io.File(dir)
    val files = (if (root.isDirectory) root.listFiles().toSeq else Seq(root))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    require(files.nonEmpty, s"no parquet files under $dir")
    files.map { f =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getPath), conf))
      try {
        r.getFooter.getBlocks.toArray.map {
          case b: org.apache.parquet.hadoop.metadata.BlockMetaData =>
            b.getColumns.toArray.map {
              case c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
                if fields(c.getPath.toArray.head) => c.getTotalSize
              case _ => 0L
            }.sum
        }.sum
      } finally r.close()
    }.sum
  }

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

    val staged = VectorOps.mrlStaged(spark, dir)
    val nStaged = VectorOps.mrlCandidates(spark, staged).count()
    val nInline = VectorOps.mrlCandidates(spark,
      VectorOps.mrlPrefixInline(spark, dir)).count()
    require(nStaged == nInline,
      s"arms disagree on candidate count: $nStaged vs $nInline")

    val mirrorDir =
      s"${operators.Relational.stagedRoot(VectorOps.MrlStageDir)}/embeddings"
    val bStaged = chunkBytes(mirrorDir, Set("vec_id", "prefix"))
    // apples-to-apples denominator: the SAME mirror files' full-dim column
    // set — isolates the column-family cut from original-vs-mirror
    // encoding differences
    val bMirrorFull = chunkBytes(mirrorDir, Set("vec_id", "embedding"))
    val bInline = chunkBytes(s"$dir/embeddings.parquet", Set("vec_id", "embedding"))

    def ratio(num: Long, den: Long): BigDecimal =
      BigDecimal(num.toDouble / math.max(den, 1L))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"metric":"mrl_scan_bytes","sf":"$dir",""" +
      s""""candidates":$nStaged,"staged_stage1_bytes":$bStaged,""" +
      s""""mirror_fulldim_bytes":$bMirrorFull,"inline_stage1_bytes":$bInline,""" +
      s""""pruning_cut":${ratio(bMirrorFull, bStaged)},""" +
      s""""inline_over_staged":${ratio(bInline, bStaged)}}""")
    spark.stop()
  }
}
