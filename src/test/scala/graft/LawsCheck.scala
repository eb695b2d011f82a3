package graft

import graft.functions.Vec
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property tests (SURVEY §5.2): algebraic laws over randomized
  * inputs, executed through the same Catalyst expressions the operators use.
  * Runs under sbt's native ScalaCheck framework (no scalatest bridge needed).
  */
object LawsCheck extends Properties("graft.laws") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-5.0f, 5.0f)).suchThat(v => v.exists(_ != 0.0f)).map(_.toSeq)

  property("cosine symmetry: cos(a,b) == cos(b,a)") =
    Prop.forAll(vecGen, vecGen) { (a, b) =>
      val r = Seq((a, b)).toDF("a", "b")
        .select(Vec.cosine(col("a"), col("b")).as("ab"), Vec.cosine(col("b"), col("a")).as("ba"))
        .collect().head
      math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12
    }

  property("l2 homogeneity: ||2x|| == 2||x|| (exact for power-of-two scale)") =
    Prop.forAll(vecGen) { a =>
      val r = Seq((a, a.map(_ * 2.0f))).toDF("a", "b")
        .select(Vec.l2(col("a")).as("n1"), Vec.l2(col("b")).as("n2"))
        .collect().head
      r.getDouble(1) == 2.0 * r.getDouble(0)
    }

  property("one-pass doc-frequency == per-token rescan count (D2 vs D5)") =
    Prop.forAll(Gen.listOfN(6, Gen.listOfN(8, Gen.oneOf(TextOps.lexicon))).map(_.map(_.mkString(" ")))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // one-pass: explode distinct tokens, count per token (the D5 shape)
      val onePass = docs
        .select(explode(array_distinct(split(col("text"), " "))).as("t"))
        .groupBy("t").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // naive rescan: one filter per lexicon entry (the D2 anti-pattern)
      val rescan = TextOps.lexicon.map { tok =>
        tok -> docs.filter(array_contains(split(col("text"), " "), tok)).count()
      }.filter(_._2 > 0).toMap
      onePass == rescan
    }

  property("jaccard bounds and reflexivity on shingle sets") =
    Prop.forAll(Gen.listOfN(10, Gen.oneOf("a", "b", "c", "d", "e"))) { toks =>
      val text = toks.mkString(" ")
      val r = Seq(text).toDF("text")
        .select(TextOps.shingles(col("text"), 3).as("sh"))
        .select((size(array_intersect(col("sh"), col("sh"))).cast("double") /
          size(array_distinct(concat(col("sh"), col("sh"))))).as("j"))
        .collect().head.getDouble(0)
      r == 1.0
    }

  // --- sessionizer fold laws (the batch == streaming property, driver-side) ---

  import graft.streaming.StatefulOps
  import graft.streaming.StatefulOps.SessionEvent

  private val eventGen: Gen[SessionEvent] = for {
    // timestamps within a few hours so both sides of the gap threshold occur
    t <- Gen.chooseNum(0L, 6L * 3600 * 1000)
    id <- Gen.chooseNum(1L, 1000000L)
    v <- Gen.chooseNum(0, 99999).map(_ / 100.0)
  } yield SessionEvent(1L, new java.sql.Timestamp(t), id, v)

  private val eventsGen: Gen[List[SessionEvent]] = Gen.listOfN(12, eventGen)

  property("sessionizer split law: fold(a ++ b) == fold(b over state of fold(a))") =
    Prop.forAll(eventsGen, Gen.chooseNum(0, 12)) { (evs, cut) =>
      // time-split (not arbitrary): streaming triggers deliver by arrival,
      // and the state contract assumes the open session is the LATEST one —
      // sort then cut, which is exactly what watermarked delivery guarantees
      val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
      val (a, b) = sorted.splitAt(cut min sorted.length)
      val whole = StatefulOps.foldSessions(sorted, None)
      val (closedA, openA) = StatefulOps.foldSessions(a, None)
      val (closedB, openB) = StatefulOps.foldSessions(b, openA)
      (closedA ++ closedB, openB) == whole
    }

  property("sessionizer sessions partition the events: counts and cents are conserved") =
    Prop.forAll(eventsGen) { evs =>
      val (closed, open) = StatefulOps.foldSessions(evs, None)
      val all = closed ++ open
      all.map(_.n_events).sum == evs.length &&
        all.map(_.sum_cents).sum == evs.map(e => math.round(e.value * 100)).sum &&
        all.forall(s => !s.start.after(s.last))
    }

  property("bloom probe never false-negative over random key sets (C10)") =
    Prop.forAll(Gen.listOfN(50, Gen.long), Gen.chooseNum(1, Int.MaxValue)) { (keys, seed) =>
      val ks = keys.distinct
      val df = ks.toDF("k")
      val bf = df.stat.bloomFilter("k", math.max(ks.size.toLong, 1L), 0.03)
      // probe via the codegen'd Expression path, not the sketch API
      val kept = df.where(graft.plans.BloomProbe.probe(col("k"), bf)).count()
      kept == ks.size.toLong
    }

  property("FastSS blocking covers the FULL levenshtein<=1 class on variable-length names (C11)") =
    Prop.forAll(Gen.listOfN(8,
      Gen.chooseNum(3, 7).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
        .map(_.mkString))) { names =>
      val uniq = names.distinct
      // textbook DP levenshtein — the brute-force truth
      def lev(x: String, y: String): Int = {
        val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
        for (i <- 1 to x.length; j <- 1 to y.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
        d(x.length)(y.length)
      }
      val brute = (for {
        a <- uniq; b <- uniq if a < b && lev(a, b) == 1
      } yield (a, b)).toSet
      // the three join routes, exactly as Joins.joinFuzzy blocks them:
      // shared (index, variant) / name == other's variant (both directions)
      def vs(x: String) = x.indices.map(i => (i, x.take(i) + x.drop(i + 1)))
      val blocked = (for {
        a <- uniq; b <- uniq if a < b
        if vs(a).intersect(vs(b)).nonEmpty ||
          vs(b).exists(_._2 == a) || vs(a).exists(_._2 == b)
        if lev(a, b) <= 1
      } yield (a, b)).toSet
      blocked == brute
    }

  property("BMP codec round-trip: decode(encode(raw)) fields match the container arithmetic") =
    Prop.forAll(Gen.chooseNum(1, 8192), Gen.long) { (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val raw = Array.fill(n)(rnd.nextInt(256).toByte)
      val md = java.security.MessageDigest.getInstance("MD5")
      val feats = graft.operators.VectorOps.decodeBmp(md,
        0L, graft.operators.VectorOps.encodeBmp(raw))
      val w = n % 60 + 4
      val stride = (w * 3 + 3) / 4 * 4
      val h = (n + stride - 1) / stride
      feats.width == w && feats.height == h &&
        feats.n_bytes == 54 + stride * h && feats.n_frames == 1 &&
        stride % 4 == 0 && stride * h >= n // valid container invariants
    }

  property("WAV codec round-trip: decode(encode(raw)) matches the container arithmetic (K4e)") =
    Prop.forAll(Gen.chooseNum(0, 8192), Gen.long) { (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val raw = Array.fill(n)(rnd.nextInt(256).toByte)
      val md = java.security.MessageDigest.getInstance("MD5")
      val f = graft.operators.VectorOps.decodeWav(md, 0L,
        graft.operators.VectorOps.encodeWav(raw))
      val ns = (n + 1) / 2
      val data = raw ++ Array.fill(ns * 2 - n)(' '.toByte)
      val sumAbs = (0 until ns).map { i =>
        math.abs((((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort).toLong)
      }.sum
      f.sample_rate == 8000 + n % 4000 && f.n_samples == ns &&
        f.duration_ms == (ns.toLong * 1000 / f.sample_rate).toInt &&
        f.sum_abs == sumAbs
    }

  // domain bound is part of the law: cents·10^12 overflows Long at
  // cents ≥ 9.2×10^6 (~$92k) — the documented packing precondition
  property("packed argmax ordinal orders exactly like (value asc, id desc) lex in-domain (D29)") =
    Prop.forAll(Gen.chooseNum(0L, 9200000L), Gen.chooseNum(0L, 999999999999L),
                Gen.chooseNum(0L, 9200000L), Gen.chooseNum(0L, 999999999999L)) {
      (c1, id1, c2, id2) =>
      def ord(c: Long, id: Long) = c * 1000000000000L + (999999999999L - id)
      val lex = if (c1 != c2) c1 < c2 else id1 > id2
      (ord(c1, id1) < ord(c2, id2)) == lex ||
        (c1 == c2 && id1 == id2) // equal pair: both sides false
    }


  // --- BPE merge-fold laws (round 8: TextOps.bpeMergeFold) ---
  private val symGen: Gen[List[String]] =
    Gen.listOfN(12, Gen.oneOf("a", "b", "c", "ab", "aa"))
  private val pairGen: Gen[(String, String)] =
    Gen.zip(Gen.oneOf("a", "b", "c", "ab", "aa"), Gen.oneOf("a", "b", "c", "ab", "aa"))

  property("bpe merge fold preserves concatenation: join(fold) == join(input)") =
    Prop.forAll(symGen, pairGen) { case (syms, (l, r)) =>
      val got = Seq(Tuple1(syms)).toDF("syms")
        .select(TextOps.bpeMergeFold(col("syms"), l, r).as("m"))
        .collect().head.getSeq[String](0)
      got.mkString == syms.mkString
    }

  property("bpe merge fold leaves no adjacent (l, r) pair (greedy completeness)") =
    Prop.forAll(symGen, pairGen) { case (syms, (l, r)) =>
      val got = Seq(Tuple1(syms)).toDF("syms")
        .select(TextOps.bpeMergeFold(col("syms"), l, r).as("m"))
        .collect().head.getSeq[String](0)
      !got.iterator.sliding(2).withPartial(false).exists(p => p(0) == l && p(1) == r)
    }
}
