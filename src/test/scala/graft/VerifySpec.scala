package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract surface itself: Verify.run must produce a readable
  * parquet dump per query and an oracle_sql.json the driver's strict JSON
  * parser accepts — a regression here would silently zero a whole round's
  * correctness, so it gets its own spec.
  */
class VerifySpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("Verify.run dumps selected queries as parquet + parseable oracle_sql.json") {
    val out = "/tmp/graft_test_verify_out"
    Verify.run(spark, sfDir, out, Some(Set("filter_eq", "agg_avg")))

    val back = spark.read.parquet(s"$out/agg_avg")
    assert(back.count() > 0)
    assert(spark.read.parquet(s"$out/filter_eq").count() > 0)

    // parse with a strict JSON parser (Jackson, on Spark's classpath)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(new java.io.File(s"$out/oracle_sql.json"))
    assert(node.isObject)
    // EVERY query with an oracle is present and non-empty, keys match registry
    val keys = {
      val it = node.fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result()
    }
    assert(keys.toSet == SparkEntry.oracleSql.keySet)
    keys.foreach(k => assert(node.get(k).asText().nonEmpty, k))
    // every oracle key has a registered query (no orphan oracles)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every registered query has oracle SQL — the rows-only set is EMPTY " +
       "(round 16: kmeans_clusters, the last rows-only entry, gained its " +
       "recursive float-loop oracle)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"every query must carry oracle SQL since round 16; missing: $missing")
  }
}
