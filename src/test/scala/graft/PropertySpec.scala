package graft

import java.sql.Timestamp
import java.time.ZoneId

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.run.RefreshJob
import graft.types.TypeMapper
import graft.xform.Normalizer

/** Property-based checks (SURVEY.md §5 item 4): explode⊕reassemble
  * identity, watermark format order-preservation and roundtrip, type
  * mapper totality. Raw ScalaCheck (no scalatest bridge in the offline
  * cache) driven through Test.check. */
class PropertySpec extends SparkSpec {

  private def check(label: String, p: Prop, min: Int = 50): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  private val tsGen: Gen[Timestamp] =
    Gen.choose(0L, 4102444800L).map(s => Timestamp.from(java.time.Instant.ofEpochSecond(s)))

  test("watermark format preserves order and roundtrips at second granularity") {
    val utc = ZoneId.of("UTC")
    check("order-preserving", Prop.forAll(tsGen, tsGen) { (a, b) =>
      val (fa, fb) = (RefreshJob.formatTs(a, utc), RefreshJob.formatTs(b, utc))
      (a.compareTo(b) <= 0) == (fa.compareTo(fb) <= 0)
    })
    check("roundtrip", Prop.forAll(tsGen) { t =>
      RefreshJob.parseTs(RefreshJob.formatTs(t, utc), utc) == t
    })
  }

  test("type mapper is total over the mapping table; strict mode rejects unknowns") {
    val known = Gen.oneOf(TypeMapper.defaultMappings)
    check("mapped", Prop.forAll(known) { m =>
      TypeMapper.default.sparkType(m.sourceSystem,
        graft.model.FieldMeta("f", m.sourceDataType)) != null
    })
    val unknown = Gen.alphaStr.suchThat(s =>
      s.nonEmpty && !TypeMapper.defaultMappings.exists(_.sourceDataType == s))
    check("unknown-strict-throws", Prop.forAll(unknown) { s =>
      Prop.throws(classOf[IllegalArgumentException]) {
        TypeMapper.default.sparkType("priority", graft.model.FieldMeta("f", s))
      }
    }, min = 20)
    check("unknown-lenient-varchar", Prop.forAll(unknown) { s =>
      TypeMapper(lenient = true).sparkType("priority",
        graft.model.FieldMeta("f", s)) == StringType
    }, min = 20)
  }

  test("asofBackward matches the per-row naive definition on generated data") {
    val rowsGen = for {
      nl <- Gen.choose(1, 12)
      nr <- Gen.choose(0, 12)
      ls <- Gen.listOfN(nl, Gen.zip(Gen.choose(1, 4), Gen.choose(0, 50)))
      rs <- Gen.listOfN(nr, Gen.zip(Gen.choose(1, 4), Gen.choose(0, 50)))
    } yield (ls, rs)

    def ts(d: Int) = Timestamp.valueOf(f"2024-01-${d / 2 + 1}%02d ${d % 2 * 12}%02d:00:00")

    check("asof-naive-equivalence", Prop.forAll(rowsGen) { case (ls, rs) =>
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      // unique right (key,time): keep max payload — mirrors the dedup
      // contract the operator documents
      val right = rs.map { case (k, d) => (k.toLong, ts(d), s"p$d") }
        .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
      val left = ls.zipWithIndex.map { case ((k, d), i) => (i.toLong, k.toLong, ts(d)) }

      val got = graft.ext.AsofJoin.asofBackward(
        left.toDF("id", "k", "t"), right.toDF("k2", "t2", "v"),
        "k", "k2", "t", "t2", Seq("v"))
        .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("v"))).toMap

      val expected = left.map { case (id, k, t) =>
        val m = right.filter(r => r._1 == k && !r._2.after(t))
        id -> (if (m.isEmpty) None else Some(m.maxBy(r => (r._2.getTime, r._3))._3))
      }.toMap
      got == expected
    }, min = 15)
  }

  test("simhash 4x16 banding: any pair within hamming 3 shares a band (all 2^64 corners)") {
    // pure-arithmetic mirror of Dedup.simhashBands's shift+mask keys —
    // the Spark-side pipeline equality is pinned on the fixture in
    // ExtSpec; this drives the pigeonhole across random signatures
    // including sign-bit corners (bit 63 set, negative longs)
    import graft.ext.Dedup.{SimhashBands, SimhashBandBits}
    def bands(sig: Long): Seq[Long] =
      (0 until SimhashBands).map(j => (sig >> (SimhashBandBits * j)) & 0xFFFFL)
    val sigGen = Gen.choose(Long.MinValue, Long.MaxValue)
    val flipsGen = Gen.choose(0, SimhashBands - 1)
      .flatMap(n => Gen.listOfN(n, Gen.choose(0, 63)))
    check("pigeonhole", Prop.forAll(sigGen, flipsGen) { (a, flips) =>
      val b = flips.foldLeft(a)((s, i) => s ^ (1L << i)) // hamming(a,b) <= 3
      bands(a).zip(bands(b)).exists { case (x, y) => x == y }
    }, min = 500)
    check("band-keys-cover-the-signature", Prop.forAll(sigGen) { a =>
      // reassembling the 4 band keys reproduces the signature exactly —
      // the blocking loses no bits (so banded candidates can verify with
      // the true hamming distance)
      bands(a).zipWithIndex.map { case (v, j) => v << (SimhashBandBits * j) }
        .reduce(_ | _) == a
    }, min = 200)
  }

  test("word_chunks / word_ngrams_all window contracts hold on arbitrary text") {
    import org.apache.spark.unsafe.types.UTF8String
    // tokens may be empty (consecutive spaces) and non-ASCII; they may
    // not contain the separator itself
    val tokenGen = Gen.oneOf(
      Gen.const(""), Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("的", "naïve", "a-b", "x!"))
    val textGen = Gen.choose(0, 40)
      .flatMap(k => Gen.listOfN(k, tokenGen)).map(_.mkString(" "))
    val nGen = Gen.choose(1, 50)

    def strings(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
      (0 until a.numElements()).map(a.getUTF8String(_).toString)

    check("chunks-partition-and-roundtrip", Prop.forAll(textGen, nGen) { (text, n) =>
      val toks = text.split(" ", -1)
      val chunks = strings(graft.functions.WordChunks.compute(UTF8String.fromString(text), n))
      chunks.mkString(" ") == text &&
        chunks.size == (toks.length - 1) / n + 1 &&
        chunks.dropRight(1).forall(_.split(" ", -1).length == n) &&
        chunks.last.split(" ", -1).length == toks.length - (chunks.size - 1) * n
    }, min = 300)

    check("ngrams-all-match-sliding", Prop.forAll(textGen, Gen.choose(1, 8)) { (text, n) =>
      val toks = text.split(" ", -1)
      val got = strings(graft.functions.WordNgramsAll.compute(UTF8String.fromString(text), n))
      val want = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
      got == want
    }, min = 300)

    check("ngrams-distinct-is-first-occurrence-order",
      Prop.forAll(textGen, Gen.choose(1, 8)) { (text, n) =>
        val all = strings(graft.functions.WordNgramsAll.compute(UTF8String.fromString(text), n))
        val got = strings(graft.functions.WordNgrams.compute(UTF8String.fromString(text), n))
        got == all.distinct
      }, min = 300)
  }

  test("zscoreNorm matches the naive per-group standardization on generated data") {
    val rowsGen = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 1000L)))
    } yield rows.zipWithIndex.map { case ((g, x), i) => (i.toLong, g, x) }

    check("naive-equivalence", Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      val got = graft.ext.Stats.zscoreNorm(rows.toDF("doc_id", "lang", "n_chars"))
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      val expected = rows.groupBy(_._2).values.flatMap { grp =>
        val n = grp.size.toDouble
        val mean = grp.map(_._3).sum / n
        val variance = grp.map(r => r._3.toDouble * r._3).sum / n - mean * mean
        grp.map { case (id, _, x) =>
          id -> (if (variance <= 0.0) 0.0 else (x - mean) / math.sqrt(variance))
        }
      }.toMap
      got.keySet == expected.keySet &&
        got.forall { case (id, z) => math.abs(z - expected(id)) < 1e-9 }
    }, min = 12)
  }

  test("explode then reassemble is the identity on nested frames") {
    val childGen = Gen.listOfN(3, Gen.choose(1, 999))
    val parentsGen: Gen[List[(String, List[Int])]] = for {
      n <- Gen.choose(1, 5)
      ps <- Gen.listOfN(n, for {
        pk <- Gen.identifier.map(_.take(8))
        kids <- Gen.choose(0, 4).flatMap(k => Gen.listOfN(k, Gen.choose(1, 999)))
      } yield (pk, kids))
      if ps.map(_._1).distinct.size == ps.size // unique PKs
    } yield ps

    val schema = StructType(Seq(
      StructField("PK", StringType),
      StructField("KIDS_SUBFORM", ArrayType(StructType(Seq(
        StructField("V", IntegerType)))))))

    check("identity", Prop.forAll(parentsGen) { parents =>
      val rows = parents.map { case (pk, kids) =>
        Row(pk, kids.map(Row(_)))
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val n = Normalizer.normalize("E", df, Seq("PK"), "r",
        Timestamp.valueOf("2026-01-01 00:00:00"))
      val reassembled = n.children.get("kids") match {
        case None => Map.empty[String, List[Int]] // no non-empty subforms
        case Some(child) => child.collect()
          .groupBy(_.getAs[String]("pk"))
          .view.mapValues(_.map(_.getAs[Int]("v")).toList.sorted).toMap
      }
      val expected = parents.filter(_._2.nonEmpty)
        .map { case (pk, kids) => pk -> kids.sorted }.toMap
      reassembled == expected
    }, min = 8)
  }

  test("closed-form ntile/crossing/gini arithmetic equals naive references") {
    // the decomposed-histogram operators (x70/x94/x103/x121/x132) all
    // rest on three pieces of pure integer arithmetic; exercise each
    // against a brute-force reference over random inputs
    // 1) ntile closed form: first n%b bands take q+1 rows
    def closedNtile(rnk: Long, n: Long, b: Long): Long = {
      val q = n / b; val r = n % b
      if (rnk <= r * (q + 1)) (rnk - 1) / (q + 1) + 1
      else r + (rnk - r * (q + 1) - 1) / q + 1
    }
    def naiveNtile(rnk: Long, n: Long, b: Long): Long = {
      // walk the bands exactly as SQL NTILE distributes rows
      val q = n / b; val r = n % b
      var band = 1L; var upto = 0L
      while ({ upto += (if (band <= r) q + 1 else q); upto < rnk }) band += 1
      band
    }
    val nb = Gen.zip(Gen.choose(1L, 500L), Gen.choose(1L, 20L))
    check("ntile-closed-form", Prop.forAll(nb) { case (n, b0) =>
      // b0 may exceed n — the q = 0 edge every band-assigner must survive
      (1L to n).forall(rnk => closedNtile(rnk, n, b0) == naiveNtile(rnk, n, b0))
    }, min = 100)
    // 2) Pareto crossing: k = users_before + ceil((target-events_before)/v)
    //    equals the naive ranked scan
    val histGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 50L), Gen.choose(1L, 5L))).map(_.take(12))
    check("pareto-crossing", Prop.forAll(histGen) { groups =>
      // groups: (value, users) — descending value order
      val desc = groups.groupBy(_._1).map { case (v, g) => v -> g.map(_._2).sum }
        .toSeq.sortBy(-_._1)
      val events = desc.map { case (v, m) => v * m }.sum
      val target = (4 * events + 4) / 5
      // closed form over the crossing group
      var ub = 0L; var eb = 0L; var closed = -1L
      desc.foreach { case (v, m) =>
        if (closed < 0 && eb < target && eb + v * m >= target)
          closed = ub + (target - eb + v - 1) / v
        ub += m; eb += v * m
      }
      // naive: expand users, running sum
      val flat = desc.flatMap { case (v, m) => Seq.fill(m.toInt)(v) }
      var cum = 0L
      val naive = flat.zipWithIndex.collectFirst {
        case (v, i) if { cum += v; cum >= target } => i + 1L
      }.get
      closed == naive
    }, min = 200)
    // 3) Gini closed form: Σ v·m·(2b+m−n) over ASC groups equals the
    //    textbook Σ(2i−n−1)x_i
    check("gini-closed-form", Prop.forAll(histGen) { groups =>
      val asc = groups.groupBy(_._1).map { case (v, g) => v -> g.map(_._2).sum }
        .toSeq.sortBy(_._1)
      val n = asc.map(_._2).sum
      var b = 0L
      var closed = BigInt(0)
      asc.foreach { case (v, m) =>
        closed += BigInt(v) * m * (2 * b + m - n); b += m
      }
      val flat = asc.flatMap { case (v, m) => Seq.fill(m.toInt)(v) }
      val naive = flat.zipWithIndex
        .map { case (x, i) => BigInt(2L * (i + 1) - n - 1) * x }.sum
      closed == naive
    }, min = 200)
  }

  test("temperature allocation: exact budget unless capped, per-source bounds, determinism") {
    val countsGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf(Gen.alphaStr.map(_.take(6)), Gen.const(null: String)),
      Gen.choose(1L, 10000L)))
      .map(_.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }.toSeq)
    val budgetGen = Gen.choose(1L, 20000L)
    check("allocation-invariants", Prop.forAll(countsGen, budgetGen) { (counts, budget) =>
      val alloc = graft.ext.Assemble.temperatureAllocation(counts, budget)
      val byKey = counts.toMap
      val total = alloc.map(_._2).sum
      val capped = alloc.exists { case (s, a) => a == byKey(s) }
      // every source appears once; never above its own size or below 0
      alloc.map(_._1).toSet == counts.map(_._1).toSet &&
        alloc.forall { case (s, a) => a >= 0 && a <= byKey(s) } &&
        // sums to the budget exactly unless a cap bound it (then ≤)
        (if (capped) total <= budget else total == budget) &&
        // purely a function of its inputs: order of counts is irrelevant
        graft.ext.Assemble.temperatureAllocation(counts.reverse, budget).toMap == alloc.toMap
    }, min = 200)
  }
}
