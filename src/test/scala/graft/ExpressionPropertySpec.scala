package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.HashExpressions._

/** Property-style checks of the native expressions against independent
  * in-JVM reference implementations, over ScalaCheck-generated inputs
  * (fixed seeds — deterministic CI). */
class ExpressionPropertySpec extends AnyFunSuite {
  import TestSpark._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val text: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const(" ")))
      .map(_.mkString(" ")).map(_.take(200))

  /** Reference rolling-shingle implementation: naive O(n·k) substring
    * polynomial hash, sorted distinct. */
  private def refShingles(s: String, k: Int): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.length < k) Seq.empty
    else (0 to bytes.length - k).map { i =>
      var h = 0L
      var j = i
      while (j < i + k) { h = h * 1000000007L + (bytes(j) & 0xffL); j += 1 }
      h
    }.distinct.sorted
  }

  test("RollingShingles equals the naive polynomial-hash reference") {
    import spark.implicits._
    val samples = (1L to 40L).map(s => sample(text, s)).toList
    val got = samples.toDF("t")
      .select(rollingShingles(col("t"), 5).as("s"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    val expected = samples.map(refShingles(_, 5))
    assert(got == expected)
  }

  test("simhash of permuted tokens is identical (order-free fingerprint)") {
    import spark.implicits._
    val tokenLists = (1L to 20L).map { s =>
      sample(Gen.listOfN(8, Gen.alphaNumStr.map(_.take(5)).suchThat(_.nonEmpty)), s)
    }
    val rng = new scala.util.Random(7)
    val pairs = tokenLists.map(ts => (ts.mkString(" "), rng.shuffle(ts).mkString(" ")))
    val rows = pairs.toDF("a", "b")
      .select(simhash64(col("a")).as("fa"), simhash64(col("b")).as("fb"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("minhash agreement tracks exact jaccard (monotone estimator)") {
    import spark.implicits._
    val agree = Seq(
      ("abcdefghij klmnopqrst", "abcdefghij klmnopqrst"),
      ("abcdefghij klmnopqrst", "zzzzyyyyxx wwwwvvvvuu"))
      .toDF("a", "b")
      .select(
        minhashSignature(rollingShingles(col("a"), 5), 32).as("sa"),
        minhashSignature(rollingShingles(col("b"), 5), 32).as("sb"))
      .select(expr(
        "aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
        .as("agree"))
      .collect().map(_.getInt(0))
    assert(agree(0) == 32, "identical sets must agree on every component")
    assert(agree(1) <= 2, "disjoint sets must essentially never agree")
  }

  test("minhash estimator accuracy: agreement tracks true jaccard ±0.25") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val universe = (0 until 60).map(i => f"w$i%02d")
    // pairs with controlled overlap: share `o` of 30 tokens each
    val pairs = Seq(5, 15, 25).map { o =>
      val shared = rng.shuffle(universe).take(o)
      val rest = universe.filterNot(shared.contains)
      val aTok = shared ++ rest.take(30 - o)
      val bTok = shared ++ rest.slice(30 - o, 60 - 2 * o)
      (aTok.mkString(" "), bTok.mkString(" "))
    }
    val rows = pairs.toDF("a", "b")
      .select(
        minhashSignature(rollingShingles(col("a"), 5), 32).as("sa"),
        minhashSignature(rollingShingles(col("b"), 5), 32).as("sb"),
        rollingShingles(col("a"), 5).as("ra"),
        rollingShingles(col("b"), 5).as("rb"))
      .select(
        expr("aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v) / CAST(32.0 AS DOUBLE)").as("est"),
        (size(array_intersect(col("ra"), col("rb"))).cast("double") /
          size(array_union(col("ra"), col("rb")))).as("truth"))
      .collect()
    rows.foreach { r =>
      val (est, truth) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(est - truth) <= 0.25,
        f"minhash estimate $est%.2f too far from true jaccard $truth%.2f")
    }
  }

  test("cosine similarity bounds and symmetry on random vectors") {
    import spark.implicits._
    val vec = Gen.listOfN(8, Gen.chooseNum(-5.0, 5.0))
    val pairs = (1L to 30L).map(s => (sample(vec, s), sample(vec, s + 1000)))
    val rows = pairs.toDF("a", "b")
      .select(cosineSimilarity(col("a"), col("b")).as("ab"),
        cosineSimilarity(col("b"), col("a")).as("ba"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "must be symmetric")
      assert(math.abs(r.getDouble(0)) <= 1.0000001, "must be in [-1,1]")
    }
  }

  test("jaro-winkler: textbook values, symmetry, bounds, boost threshold") {
    import spark.implicits._
    // canonical published examples (floor-the-half-transpositions
    // semantics, shared with DuckDB's jaro_winkler_similarity — the
    // cross-engine parity that puts JW on the oracle surface was
    // additionally measured bit-identical on all 1.12M customer pairs)
    val known = Seq(
      ("MARTHA", "MARHTA", 0.961111), ("DIXON", "DICKSONX", 0.813333),
      ("JELLYFISH", "SMELLYFISH", 0.896296), ("CRATE", "TRACE", 0.733333),
      ("TRATE", "TRACE", 0.906667), ("abc", "abc", 1.0), ("", "abc", 0.0),
      ("a", "b", 0.0),
      // low jaro + shared prefix: the 0.7 threshold must SUPPRESS the
      // Winkler boost (jw == jaro here)
      ("aBCDEFG", "aXYZWVU", 0.428571))
    val got = known.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b")).as("jw"),
        jaroWinkler(col("b"), col("a")).as("wj"))
      .collect()
    known.zip(got).foreach { case ((a, b, expect), r) =>
      assert(math.abs(r.getDouble(0) - expect) < 5e-7,
        s"jw($a,$b) = ${r.getDouble(0)}, expected $expect")
      assert(r.getDouble(0) == r.getDouble(1), s"jw($a,$b) must be symmetric")
    }
    // property sweep: bounds + identity over generated strings
    val s = Gen.alphaNumStr.map(_.take(20))
    val pairs = (1L to 40L).map(i => (sample(s, i), sample(s, i + 500)))
    pairs.toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b")).as("jw"),
        jaroWinkler(col("a"), col("a")).as("self"), col("a"))
      .collect().foreach { r =>
        val jw = r.getDouble(0)
        assert(jw >= 0.0 && jw <= 1.0, s"out of bounds: $jw")
        if (r.getString(2).nonEmpty)
          assert(r.getDouble(1) == 1.0, "self similarity must be 1")
      }
  }

  test("compress ratio: repetition compresses far below high-entropy " +
    "text, empty input is 1.0, and the SQL registration agrees with " +
    "the kernel") {
    val sp = spark
    import sp.implicits._
    val repetitive = "spam ham " * 400
    val varied = (1 to 800).map(i => s"w${i * 2654435761L % 99991}")
      .mkString(" ")
    val rows = Seq((1L, repetitive), (2L, varied), (3L, ""))
      .toDF("id", "text")
      .select(col("id"),
        graft.functions.HashExpressions.compressRatio(col("text"))
          .as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(1L) < 0.1, "pure template text must compress hard")
    assert(rows(2L) > 0.3, "high-entropy text must not")
    assert(rows(1L) < rows(2L) / 3.0)
    assert(rows(3L) == 1.0, "empty input is defined as 1.0")
    assert(rows.values.forall(v => v > 0.0 && v <= 1.5))
    // SQL-registered function evaluates through the same kernel
    graft.plans.GraftFunctionRegistry.registerAll(sp)
    val viaSql = sp.sql(
      s"SELECT compress_ratio('${"ab " * 100}') AS r").collect().head
      .getDouble(0)
    val viaKernel = graft.functions.ExprRuntime.compressRatio(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab " * 100))
    assert(viaSql == viaKernel)
  }

  test("phrase pack: overlap counting, packing layout, edge cases, " +
    "and codegen/declarative parity on generated text") {
    val sp = spark
    import sp.implicits._
    def pack(s: String, ph: Seq[String]): (Long, Long) = {
      val p = graft.functions.ExprRuntime.phrasePack(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), ph.toArray)
      (p >>> 32, p & 0xffffffffL)
    }
    assert(pack("x x x", Seq("x", "x")) === ((2L, 1L))) // overlaps count
    assert(pack("a table scan b table scan", Seq("table", "scan")) ===
      ((2L, 2L)))
    assert(pack("short", Seq("table", "scan")) === ((0L, 0L)))
    assert(pack("", Seq("x")) === ((0L, 0L)))
    assert(pack("  TABLE   SCAN  ", Seq("table", "scan")) === ((1L, 1L)))
    // SQL trim strips ONLY spaces: a tab-prefixed doc keeps its leading
    // empty token under split(lower(trim(text)), "\s+"), shifting
    // first_pos to 2 — the kernel must agree (Java String.trim would
    // eat the tab and report 1)
    assert(pack("\ttable scan", Seq("table", "scan")) === ((1L, 2L)))
    assert(pack("table scan\n", Seq("table", "scan")) === ((1L, 1L)))
    // parity with the declarative scan over generated token soup —
    // exercised THROUGH SQL so the codegen path compiles and runs
    val words = Seq("table", "scan", "a", "b")
    // every 4th doc gets non-space leading/trailing whitespace — SQL
    // trim keeps it, so the empty-token positions must match too
    val wraps = Seq(("", ""), ("\t", ""), ("", "\n"), ("\t ", " \r"))
    val docs = (0 until 200).map { i =>
      val r = new scala.util.Random(i.toLong)
      val (pre, post) = wraps(i % 4)
      (i.toLong, pre +
        Seq.fill(r.nextInt(30))(words(r.nextInt(4))).mkString(" ") + post)
    }.toDF("doc_id", "text")
    val viaNative = docs
      .withColumn("pack", phrasePack(col("text"), Seq("table", "scan")))
      .filter(col("pack") > 0L)
      .select(col("doc_id"), shiftright(col("pack"), 32).as("n_matches"),
        col("pack").bitwiseAND(lit(0xffffffffL)).as("first_pos"))
      .collect().map(_.toString).sorted.toSeq
    val viaDecl = graft.operators.Search
      .phraseMatchesOn(docs, Seq("table", "scan"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaNative === viaDecl)
  }

  /** Deterministic double arrays for the vector-kernel parity tests:
    * value magnitudes spread over several decades so accumulation-order
    * differences WOULD show up as last-ulp drift if the kernels ever
    * deviated from the declarative left-to-right fold. */
  private def vecRows(n: Int, dim: Int): Seq[(Long, Seq[Double], Seq[Double])] =
    (0 until n).map { i =>
      val r = new scala.util.Random(1000L + i)
      def v = Seq.fill(dim)((r.nextDouble() - 0.5) *
        math.pow(10.0, r.nextInt(7) - 3))
      (i.toLong, v, v)
    }

  test("SqEuclidean / SqNorm / L2Normalize are BIT-identical to the " +
    "declarative aggregate/zip_with/transform forms they replaced") {
    import spark.implicits._
    val rows = vecRows(120, 64) ++ Seq(
      (901L, Seq.empty[Double], Seq.empty[Double]), // empty arrays
      (902L, Seq(1e300, -1e300, 2.5), Seq(-1e300, 1e300, 0.5))) // overflow-ish
    val df = rows.toDF("id", "a", "b").localCheckpoint()
    val declared = df.select(col("id"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)").as("sq"),
      expr("aggregate(a, 0D, (acc, y) -> acc + y * y)").as("nrm"),
      expr("transform(a, x -> x / sqrt(aggregate(a, 0D, (acc, y) -> acc + y * y)))").as("un"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getSeq[Double](3).toSeq)).sortBy(_._1)
    val native = df.select(col("id"),
      sqEuclidean(col("a"), col("b")).as("sq"),
      sqNorm(col("a")).as("nrm"),
      l2Normalize(col("a")).as("un"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getSeq[Double](3).toSeq)).sortBy(_._1)
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    declared.zip(native).foreach { case ((di, ds, dn, du), (ni, ns, nn, nu)) =>
      assert(di == ni)
      assert(bits(ds) == bits(ns), s"sqEuclidean drift at id=$di: $ds vs $ns")
      assert(bits(dn) == bits(nn), s"sqNorm drift at id=$di: $dn vs $nn")
      assert(du.size == nu.size, s"l2Normalize size at id=$di")
      du.zip(nu).foreach { case (x, y) =>
        assert(bits(x) == bits(y) || (x.isNaN && y.isNaN),
          s"l2Normalize drift at id=$di: $x vs $y")
      }
    }
    // the one deliberate divergence in ERROR CLASS, not outcome: a zero
    // vector fails the query on BOTH paths (declarative = ANSI
    // DIVIDE_BY_ZERO, kernel = its own ArithmeticException)
    val zero = Seq((0L, Seq.fill(8)(0.0))).toDF("id", "a")
    intercept[Exception] {
      zero.select(expr(
        "transform(a, x -> x / sqrt(aggregate(a, 0D, (acc, y) -> acc + y * y)))"))
        .collect()
    }
    intercept[Exception] {
      zero.select(l2Normalize(col("a"))).collect()
    }
  }

  test("TokenGrams / GramDigests / WinnowMins equal their declarative " +
    "transform/sequence forms (full-window, cover, md5, sliding min)") {
    import spark.implicits._
    val words = Seq("alpha", "b", "γδ", "zz9", "m", "q_")
    val rows = (0 until 250).map { i =>
      val r = new scala.util.Random(42L + i)
      (i.toLong, Seq.fill(r.nextInt(25))(words(r.nextInt(6))))
    } ++ Seq((900L, Seq.empty[String]), (901L, Seq("solo")),
      (902L, Seq("a", "b", "c")))
    val df = rows.toDF("id", "toks").localCheckpoint()
    def collectArr(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0),
        Option(r.getSeq[String](1)).map(_.toSeq))).sortBy(_._1).toSeq
    // full windows, n = 3 (callers guard size >= n; the kernel's empty
    // result below n must match the when-guarded empty array)
    val declFull = collectArr(df.select(col("id"),
      when(size(col("toks")) >= 3, expr(
        "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))"))
        .otherwise(array().cast("array<string>")).as("g")))
    val natFull = collectArr(df.select(col("id"),
      tokenGrams(col("toks"), 3).as("g")))
    assert(natFull == declFull)
    // cover mode: segments (window == stride == 4) on non-empty docs
    val nonEmpty = df.filter(size(col("toks")) > 0)
    val declSeg = collectArr(nonEmpty.select(col("id"), expr(
      "transform(sequence(0, CAST(ceil(size(toks) / 4.0) AS INT) - 1), " +
        "i -> array_join(slice(toks, i * 4 + 1, 4), ' '))").as("g")))
    val natSeg = collectArr(nonEmpty.select(col("id"),
      tokenGrams(col("toks"), 4, 4, cover = true).as("g")))
    assert(natSeg == declSeg)
    // cover mode: overlapping chunks (window 6, stride 4)
    val declChunk = collectArr(nonEmpty.select(col("id"), expr(
      "transform(sequence(0, CAST(ceil(greatest(size(toks) - 6, 0) / 4.0) AS INT)), " +
        "i -> array_join(slice(toks, i * 4 + 1, 6), ' '))").as("g")))
    val natChunk = collectArr(nonEmpty.select(col("id"),
      tokenGrams(col("toks"), 6, 4, cover = true).as("g")))
    assert(natChunk == declChunk)
    // md5 digests at both hex lengths, guarded like the callers
    val okDocs = df.filter(size(col("toks")) >= 3)
    val declMd5 = collectArr(okDocs.select(col("id"), expr(
      "transform(sequence(0, size(toks) - 3), " +
        "i -> md5(array_join(slice(toks, i + 1, 3), ' ')))").as("g")))
    val natMd5 = collectArr(okDocs.select(col("id"),
      gramDigests(col("toks"), 3, 32).as("g")))
    assert(natMd5 == declMd5)
    val declMd5h = collectArr(okDocs.select(col("id"), expr(
      "transform(sequence(0, size(toks) - 3), " +
        "i -> substring(md5(array_join(slice(toks, i + 1, 3), ' ')), 1, 16))").as("g")))
    val natMd5h = collectArr(okDocs.select(col("id"),
      gramDigests(col("toks"), 3, 16).as("g")))
    assert(natMd5h == declMd5h)
    // winnow minima over the digest arrays (w = 5, includes docs whose
    // digest array is shorter than w); the hs input is materialized so
    // the declarative reference can't be perturbed by lambda inlining
    val hsDf = okDocs.select(col("id"),
      gramDigests(col("toks"), 3, 16).as("hs")).localCheckpoint()
    val declWin = collectArr(hsDf.select(col("id"),
      array_distinct(expr(
        "transform(sequence(0, greatest(size(hs) - 5, 0)), " +
          "i -> array_min(slice(hs, i + 1, 5)))")).as("g")))
    val natWin = collectArr(hsDf.select(col("id"),
      winnowMins(col("hs"), 5).as("g")))
    assert(natWin == declWin)
  }

  test("PairCombos equals the declarative nested-transform pair expansion") {
    import spark.implicits._
    val rows = (0 until 100).map { i =>
      val r = new scala.util.Random(7L + i)
      (i.toLong, Seq.fill(r.nextInt(9))(r.nextInt(50).toLong).distinct.sorted)
    } ++ Seq((900L, Seq.empty[Long]), (901L, Seq(5L)))
    val df = rows.toDF("id", "ps").localCheckpoint()
    def coll(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    val decl = coll(df.select(col("id"), explode(expr(
      "flatten(transform(ps, (x, i) -> " +
        "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"))
      .as("e")).select(col("id"), col("e.u"), col("e.v")))
    val nat = coll(df.select(col("id"),
      explode(pairCombos(col("ps"))).as("e"))
      .select(col("id"), col("e.u"), col("e.v")))
    assert(nat == decl)
  }

  test("PairMergeFold equals the declarative aggregate fold " +
    "(overlapping runs, pair-at-edges, empty arrays)") {
    import spark.implicits._
    val words = Seq("a", "b", "c", "a b")
    val rows = (0 until 300).map { i =>
      val r = new scala.util.Random(i.toLong)
      (i.toLong, Seq.fill(r.nextInt(20))(words(r.nextInt(4))))
    } ++ Seq(
      (900L, Seq("a", "b")), (901L, Seq("a", "a", "b", "b")),
      (902L, Seq("a", "a", "a", "b")), // overlap: merge must not chain
      (903L, Seq("b", "a")), (904L, Seq.empty[String]), (905L, Seq("a")))
    val df = rows.toDF("id", "t").localCheckpoint()
    val native = df.select(col("id"),
        pairMergeFold(col("t"), "a", "b").as("m"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).sortBy(_._1)
    val declared = df.select(col("id"),
        graft.operators.TextAnalysis.mergeFoldDeclarative("t", "a", "b").as("m"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).sortBy(_._1)
    assert(native.toSeq == declared.toSeq)
  }
}
