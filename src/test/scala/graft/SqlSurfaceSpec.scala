package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface sweep (round-8, VERDICT next-round #7): every oracle SQL
  * string is driven through `spark.sql` over `Tables.registerAll`'s temp
  * views and its rows compared 1:1 against the DataFrame form of the same
  * query — proving the engine's results are reachable from the SQL entry
  * point, not only the DataFrame API (the reference's own SQL surface
  * [ref: timeusage/…/TimeUsage.scala#timeUsageGroupedSql], generalized
  * from one query to the whole inventory).
  *
  * The oracle strings are authored in DuckDB's dialect, so the sweep first
  * applies a MECHANICAL dialect bridge (token/shape rewrites below — no
  * per-query hand-written SQL): function renames with identical semantics
  * (`string_split`→`split`, `arg_max`→`max_by`, …), DuckDB idioms with
  * exact Spark twins (1-based `x[a:b]` slices → `slice`/`substring`,
  * `{'k': v}` → `named_struct`, hex-string casts → `conv`), and two
  * Spark-4 SQL-defined shim functions (`sha256`, `list_sum`) that inline
  * into catalyst expressions. Float parity is EXACT (same fold order —
  * `zip_with` + sequential `aggregate` mirrors DuckDB's list fold), so the
  * comparison is bitwise row equality, not tolerance.
  *
  * Queries that canNOT be bridged are pinned in `nonPortable` with the
  * Spark limitation that blocks them; each gets a test asserting the
  * limitation still holds, so the allowlist cannot rot silently. The
  * portability floor (>= 100 parity-checked queries) is asserted at the
  * end — the registry growing must not erode the SQL surface.
  */
class SqlSurfaceSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  import SparkTestSession.{spark, sfDir}

  override def afterAll(): Unit =
    // suite-scoped parser mode (suites run sequentially — build.sbt pins
    // Test/parallelExecution=false); restore the default for later suites
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")

  /** Inherent non-portabilities, query -> blocking Spark limitation. */
  private val nonPortable: Map[String, String] = Map(
    // Spark 4.1 recursive CTEs reject UNION-distinct members
    "corpus_pipeline" -> "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE",
    "corpus_report" -> "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE",
    "dedup_cluster" -> "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE",
    "dedup_keepbest" -> "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE",
    "dedup_pipeline" -> "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE",
    // span-slice applied to an expression base — DuckDB's x[a:b] over a
    // non-identifier has no mechanical substring() bridge here
    "dedup_substring_clean" -> "PARSE_SYNTAX_ERROR",
    // DuckDB list slices x[a:b] over ARRAY columns — the mechanical bridge
    // maps slices to substring (the string case); an array-typed base has
    // no token-level rewrite to slice() without type inference
    "vec_pq" -> "DATATYPE_MISMATCH",
    "vec_pq_adc" -> "DATATYPE_MISMATCH",
    "sim_ivfpq" -> "DATATYPE_MISMATCH",
    "sim_mrl" -> "DATATYPE_MISMATCH",
    "graph_bfs" -> "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE",
    // ... and reject aggregation over the recursive reference
    "graph_pagerank" -> "INVALID_RECURSIVE_REFERENCE",
    "kmeans_int_trace" -> "INVALID_RECURSIVE_REFERENCE",
    // the float-loop replay (round 16) trips Spark's parser before the
    // recursive-aggregation check even runs: DuckDB's in-aggregate
    // `string_agg(x, ',' ORDER BY iter)` has no parse twin (Spark's
    // ordered string agg is listagg(...) WITHIN GROUP — a shape rewrite
    // the mechanical bridge deliberately doesn't attempt); past the
    // parser it would fail like kmeans_int_trace (aggregation over the
    // recursive reference)
    "kmeans_clusters" -> "PARSE_SYNTAX_ERROR",
    // init-less list fold: DuckDB list_reduce seeds the accumulator with
    // the first element; Spark SQL's aggregate() requires an explicit
    // init and no mechanical shape bridge exists (the DataFrame form uses
    // aggregate with an explicit empty-array init)
    "vocab_bpe" -> "list_reduce",
    // the 48-CTE Viterbi DP chain (3 rounds × 16 positions, fan-in 6)
    // exceeds Spark's analyzer resolution iteration cap — the bridge
    // parses it (MATERIALIZED stripped) but resolution cannot fixpoint
    "vocab_unigram" -> "Max iterations",
    "tokenize_unigram" -> "Max iterations",
    "tokenize_bpe" -> "list_reduce",
    "tokenize_bpe_encode" -> "list_reduce",
    // same init-less list_reduce fold (plus a window list() aggregate and
    // single-element list literals the bridge deliberately leaves alone);
    // the parser trips on `[0e0]` before resolution ever sees list_reduce
    "window_ewma" -> "PARSE_SYNTAX_ERROR",
    // no ASOF JOIN syntax in Spark SQL (the DataFrame form IS the op)
    "join_asof" -> "ASOF",
    "join_asof_salted" -> "ASOF",
    // DuckDB staged-file table-valued readers; Spark reads those staged
    // files through its own DataFrameReader (the query under test)
    "scan_csv" -> "'{'",
    "scan_json" -> "'{'",
    "scan_nested" -> "read_parquet",
  )

  // one/two/three-level-balanced "argument" fragments for the shape rewrites
  private val A1 = """(?:[^()]|\([^()]*\))*"""
  private val A2 = s"""(?:[^()]|\\((?:[^()]|\\([^()]*\\))*\\))*"""
  private val A3 = s"""(?:[^()]|\\($A2\\))*"""

  /** The mechanical DuckDB->Spark dialect bridge (see class doc). */
  private[graft] def bridge(sql0: String): String = {
    var sql = sql0
      // DuckDB CTE anti-inlining hint; Spark has no parse twin and
      // materializes CTEs by its own planning — semantics identical
      .replace(" AS MATERIALIZED (", " AS (")
      .replace("string_split(", "split(")
      // DuckDB x[a:b] slices are 1-based inclusive-inclusive
      .replaceAll("""\(split\(text, ' '\)\)\[([^\[\]:]+):([^\[\]:]+)\]""",
        "slice(split(text, ' '), $1, ($2) - ($1) + 1)")
      .replaceAll("""([a-z_][\w.]*)\[([^\[\]:]+):([^\[\]:]+)\]""",
        "substring($1, $2, ($3) - ($2) + 1)")
      .replaceAll("""\{'(\w+)': (.*?), '(\w+)': (.*?)\}""",
        "named_struct('$1', $2, '$3', $4)")
      // list_transform over list_zip => zip_with (same element order)
      .replaceAll("""list_transform\(list_zip\(([\w.]+), ([\w.]+)\), p ->""",
        "zip_with($1, $2, (p1, p2) ->")
      .replace("p[1]", "p1").replace("p[2]", "p2")
      .replaceAll(s"""\\('0x' \\|\\| (substr\\($A3\\))\\)""", "conv($1, 16, 10)")
      // DuckDB 2-arg regexp_extract_all returns full matches; Spark's
      // default group index is 1 => pin 0
      .replaceAll(s"""regexp_extract_all\\(($A1), ('[^']*')\\)""",
        "regexp_extract_all($1, $2, 0)")
      .replaceAll(s"""time_bucket\\(INTERVAL '1 hour', ($A1)\\)""",
        "date_trunc('hour', $1)")
      .replaceAll(s"""time_bucket\\(INTERVAL '15 minutes', ($A1)\\)""",
        "timestamp_micros(unix_micros($1) div 900000000 * 900000000)")
      .replaceAll(s"""encode\\(($A1)\\)""", "encode($1, 'UTF-8')")
      .replaceAll(s"""list\\(($A2) ORDER BY (\\w+)\\)""",
        "transform(array_sort(collect_list(struct($2 AS _k, $1 AS _v))), s -> s._v)")
      .replaceAll(s"""string_agg\\(($A2), ('[^']*') ORDER BY ([^)]+)\\)""",
        "listagg($1, $2) WITHIN GROUP (ORDER BY $3)")
      .replace("(list_sort(list(doc_id)))[1:20]",
        "slice(array_sort(collect_list(doc_id)), 1, 20)")
      .replace("list_aggregate(", "array_min(").replace(", 'min')", ")")
    sql
      .replace("array_to_string(", "array_join(")
      .replace("AS VARCHAR)", "AS STRING)")
      .replace(", 'g')", ")") // Spark regexp_replace is global by default
      .replace("date_diff('day', ", "date_diff(DAY, ")
      .replace("strftime(", "date_format(")
      .replace("'%Y-%m-%d'", "'yyyy-MM-dd'")
      .replaceAll("""xor\(([^(),]+), ([^()]+)\)""",
        "(CAST($1 AS BIGINT) ^ CAST($2 AS BIGINT))")
      // list literal => array(...): requires ", " so regex char classes
      // inside string literals ('[aeiou]') are never touched
      .replaceAll("""(?<![\w)\]])\[([^\[\]:]*, [^\[\]:]*)\]""", "array($1)")
      .replaceAll("""([\w.]+)\[([^\[\]:]+)\]""", "element_at($1, $2)")
      .replace("arg_max(", "max_by(")
      .replace("arg_min(", "min_by(")
      .replace("epoch_us(", "unix_micros(")
      .replace("quantile_cont(", "percentile(")
      .replace("list_contains(", "array_contains(")
      .replace("list_append(", "array_append(")
      .replace("list_value(", "array(")
      .replace("list_transform(", "transform(")
      .replace("list_filter(", "filter(")
      .replace("list_sort(", "array_sort(")
      .replace("list_concat(", "concat(")
      .replace("list_intersect(", "array_intersect(")
      .replace("list_min(", "array_min(")
      .replace("list_max(", "array_max(")
      .replace("list_distinct(", "array_distinct(")
      .replace("len(", "size(")
      .replace("unnest(", "explode(")
      .replace(" // ", " div ")
      .replace("AS HUGEINT", "AS DECIMAL(38,0)")
      .replaceAll(""" IGNORE NULLS\)""", ") IGNORE NULLS")
      .replaceAll("""\(SELECT explode\(generate_series\((\d+), (\d+)\)\) AS (\w+)\) (\w+)""",
        "explode(sequence($1, $2)) AS $4($3)")
      .replace("generate_series(", "sequence(")
  }

  private lazy val prepared: Unit = {
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    Tables.registerAll(spark, sfDir)
    // Spark-4 SQL-defined shims for two DuckDB names with no token twin;
    // SQL UDFs inline into catalyst expressions (no black-box UDF cliff)
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION sha256(x STRING) " +
      "RETURNS STRING RETURN sha2(x, 256)")
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION list_sum(x ARRAY<DOUBLE>) " +
      "RETURNS DOUBLE RETURN aggregate(x, 0D, (a, b) -> a + b)")
  }

  private val portableCount = new java.util.concurrent.atomic.AtomicInteger(0)

  SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
    nonPortable.get(name) match {
      case Some(blocker) =>
        test(s"sql-surface: $name is blocked by a pinned Spark limitation") {
          prepared
          val e = intercept[Throwable](spark.sql(bridge(sql)).collect())
          assert(String.valueOf(e.getMessage).contains(blocker),
            s"$name: expected blocker '$blocker' but got: ${e.getMessage}")
        }
      case None =>
        test(s"sql-surface: $name via spark.sql matches the DataFrame form") {
          prepared
          val viaSql = spark.sql(bridge(sql)).collect().map(_.toString).sorted.toSeq
          val viaDf = SparkEntry.queries(name)(spark, sfDir)
            .collect().map(_.toString).sorted.toSeq
          assert(viaSql == viaDf,
            s"$name: SQL surface diverges from DataFrame form " +
              s"(sql=${viaSql.size} rows, df=${viaDf.size} rows); first diff: " +
              viaSql.zip(viaDf).find(p => p._1 != p._2)
                .map(p => s"\n  sql=${p._1}\n  df =${p._2}").getOrElse("(row count)"))
          portableCount.incrementAndGet()
        }
    }
  }

  test("sql-surface: >= 100 queries are parity-checked through spark.sql") {
    // runs last (alphabetical registration order does not matter: scalatest
    // runs tests in registration order and this is registered after all
    // per-query tests above)
    assert(portableCount.get() >= 100,
      s"only ${portableCount.get()} queries passed the SQL surface sweep")
  }
}
