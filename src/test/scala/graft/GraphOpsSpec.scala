package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-side laws for the §2.I′ graph dataflows. Both queries are fully
  * hash-gated against recursive DuckDB oracles (integer arithmetic — see
  * GraphOps); these tests pin the STRUCTURAL invariants a refactor could
  * break while still agreeing with a co-edited oracle.
  */
class GraphOpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("graph_bfs: dist-0 set is exactly the present lexicon seeds") {
    val out = GraphOps.graphBfs(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val seeds = out.filter(_._2 == 0).keySet
    assert(seeds.nonEmpty && seeds.subsetOf(graft.operators.TextOps.lexicon.toSet))
    assert(out.values.forall(d => d >= 0 && d <= GraphOps.BfsMaxHops))
  }

  test("graph_bfs levels are BFS-consistent: d>=1 nodes have an in-neighbor at d-1") {
    val dist = GraphOps.graphBfs(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val edges = GraphOps.tokenPairs(GraphOps.tokenized(spark, sfDir))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val inN = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    dist.foreach { case (tok, d) =>
      if (d >= 1)
        assert(inN.getOrElse(tok, Array.empty[String]).exists(p => dist.get(p).contains(d - 1)),
          s"$tok at dist $d has no in-neighbor at ${d - 1}")
    }
    // no edge jumps a level forward: dist(v) <= dist(u) + 1 for settled u
    edges.foreach { case (u, v) =>
      (dist.get(u), dist.get(v)) match {
        case (Some(du), Some(dv)) => assert(dv <= du + 1, s"edge ($u,$v): $du -> $dv")
        case (Some(du), None) => assert(du == GraphOps.BfsMaxHops,
          s"$v unreached though $u settled at $du < max hops")
        case _ => ()
      }
    }
  }

  test("graph_triangles: counts equal an independent driver-side brute force, per-node bound holds") {
    // independent truth: collect the small undirected edge set and count
    // triangles naively in Scala (the vocabulary graph is tiny by
    // construction — 31 word types — so brute force is exact and cheap)
    val und = GraphOps.tokenPairs(
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), split(col("text"), " ").as("ts")))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val adj = und.flatMap(e => Seq(e, (e._2, e._1))).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val brute = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      if adj(nodes(i)).contains(nodes(j))
      k <- (j + 1) until nodes.size
      if adj(nodes(i)).contains(nodes(k)) && adj(nodes(j)).contains(nodes(k))
    } { brute(nodes(i)) += 1; brute(nodes(j)) += 1; brute(nodes(k)) += 1 }

    val got = GraphOps.graphTriangles(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == brute.toMap, s"degree-ordered count diverges from brute force")
    assert(got.values.sum % 3 == 0, "corner sum must be 3x the triangle total")
    assert(got.nonEmpty && got.values.exists(_ > 0), "no triangles — vacuous gate")
    // per-node ceiling: a node's triangles cannot exceed C(deg, 2)
    got.foreach { case (t, n) =>
      val d = adj(t).size.toLong
      assert(n <= d * (d - 1) / 2, s"$t: $n triangles > C($d,2)")
    }
  }

  test("graph_pagerank: every node ranked, teleport floor holds, rank follows mass") {
    val rows = GraphOps.graphPagerank(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val nNodes = GraphOps.tokenized(spark, sfDir)
      .select(explode(col("ts")).as("t")).distinct().count()
    assert(rows.length == nNodes, "a node dropped out of the fixed point")
    assert(rows.forall(_._2 >= GraphOps.PrBase), "teleport floor violated")
    val sorted = rows.sortBy(t => (-t._2, t._1))
    sorted.zipWithIndex.foreach { case ((tok, _, rnk), i) =>
      assert(rnk <= i + 1, s"$tok: rank $rnk inconsistent at position ${i + 1}")
    }
  }
}
