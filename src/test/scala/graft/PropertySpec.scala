package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import com.fasterxml.jackson.databind.ObjectMapper

import graft.fast.FastKayvee

/** Property tests for the invariants the reference's suite pins down
  * (SURVEY.md §5): coercion totality and route-explosion cardinality —
  * exercised through the fast lane (which is parity-locked to the
  * declarative chain by FastKayveeParitySpec, so these cover both).
  * Raw ScalaCheck generators with fixed seeds (scalatestplus isn't on the
  * offline classpath).
  */
class PropertySpec extends SparkSpec {

  private val mapper = new ObjectMapper

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("numeric dim coercion is total and matches Go %.0f goldens") {
    samples(Gen.chooseNum(-1e12, 1e12), 200).foreach { d =>
      assert(FastKayvee.coerceNum(d).matches("-?\\d+"), s"for $d")
    }
    // golden half-even cases (alerts_consumer_test.go:149-200 + Go fmt)
    assert(FastKayvee.coerceNum(3.2) === "3")
    assert(FastKayvee.coerceNum(2.5) === "2")
    assert(FastKayvee.coerceNum(3.5) === "4")
    assert(FastKayvee.coerceNum(-2.5) === "-2")
    assert(FastKayvee.coerceNum(0.0) === "0")
  }

  test("route explosion cardinality: N alert routes in → N series out (alerts_consumer_test.go:306-380)") {
    val routeGen = for {
      n <- Gen.chooseNum(1, 9999)
      statType <- Gen.oneOf("counter", "gauge")
      alerts <- Gen.oneOf(true, false)
    } yield (s"series$n", statType, alerts)

    samples(Gen.listOfN(5, routeGen), 100).foreach { routes =>
      val routesJson = routes.map { case (series, st, alerts) =>
        val tpe = if (alerts) "alerts" else "analytics"
        s"""{"type":"$tpe","series":"$series","dimensions":[],"stat_type":"$st","value_field":"value","rule":"r"}"""
      }.mkString(",")
      val line =
        s"""2017-08-15T18:39:07.000000+00:00 h production--app/arn[1]: {"_kvmeta":{"team":"t","routes":[$routesJson]}}"""
      val parsed = FastKayvee.parseLine(line, "test-env", mapper).get
      val expected = routes.count(_._3)
      assert(parsed.routes.length === expected)
      FastKayvee.encode(parsed) match {
        case Right(dd) =>
          assert(dd.length === expected)
          dd.foreach { r =>
            assert(r.metric.startsWith("kv."))
            assert(r.tags === Seq("Hostname:h", "env:test-env"))
            assert(r.point_ts === 1502822347L)
          }
        case Left(err) => fail(s"unexpected record error: $err")
      }
    }
  }

  test("fuzz: arbitrary input never throws — every line parses, errors, or skips") {
    // the executor hot path must dead-letter hostile input, never crash
    // (§7.4: Spark expressions/lanes may not throw per-record)
    val rnd = new scala.util.Random(20260812L)
    val printable = (' ' to '~') ++ "é中😀{}[]\":," // incl. multibyte
    def randomLine(): String =
      (0 until rnd.nextInt(200)).map(_ => printable(rnd.nextInt(printable.length))).mkString
    val structured = Seq(
      "2017-08-15T18:39:07.000000+00:00", "2017-08-15T18:39:07.000000+00:00 ",
      "\u0000\u0001\u0002", "{", "}{", "a b c[: {\"", "::::", "\n", ""
    )
    (structured ++ (1 to 500).map(_ => randomLine())).foreach { line =>
      FastKayvee.parseLine(line, "test-env", mapper).foreach { p =>
        FastKayvee.encode(p) // Left or Right, never a throw
      }
    }
    // the declarative lane dead-letters the same corpus without throwing
    import SharedSpark.spark.implicits._
    val raw = (structured.filter(_.nonEmpty) ++ (1 to 50).map(_ => randomLine()))
      .toDF("raw")
    val statused = graft.project.MetricProject.withStatus(
      graft.routes.RouteEngine.withRoutes(graft.parse.LogParse.parse(raw, "test-env")))
    statused.select("status").collect() // would throw here if any row did
  }

  test("value resolution: parseable floats pass through; defaults counter→1, gauge→0") {
    samples(Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.oneOf("counter", "gauge")), 100).foreach {
      case (v, st) =>
        val line =
          s"""2017-08-15T18:39:07.000000+00:00 h production--app/arn[1]: {"value":$v,"_kvmeta":{"team":"t","routes":[{"type":"alerts","series":"s","dimensions":[],"stat_type":"$st","value_field":"value","rule":"r"}]}}"""
        val parsed = FastKayvee.parseLine(line, "e", mapper).get
        val Right(dd) = FastKayvee.encode(parsed): @unchecked
        assert(math.abs(dd.head.point_value - v) < math.max(1e-9, math.abs(v) * 1e-12))
    }
    def defaultFor(st: String): Double = {
      val line =
        s"""2017-08-15T18:39:07.000000+00:00 h production--app/arn[1]: {"_kvmeta":{"team":"t","routes":[{"type":"alerts","series":"s","dimensions":[],"stat_type":"$st","value_field":"value","rule":"r"}]}}"""
      FastKayvee.encode(FastKayvee.parseLine(line, "e", mapper).get).toOption.get.head.point_value
    }
    assert(defaultFor("counter") === 1.0)
    assert(defaultFor("gauge") === 0.0)
  }

  test("pcmStats invariants hold over random PCM at both widths") {
    import graft.media.MediaCodec
    val gen = for {
      bits <- Gen.oneOf(8, 16)
      n <- Gen.chooseNum(0, 400)
      bytes <- Gen.listOfN(n, Gen.chooseNum(0, 255))
      ch <- Gen.chooseNum(1, 2)
      rate <- Gen.oneOf(8000, 16000, 44100)
    } yield (bits, bytes.map(_.toByte).toArray, ch, rate)
    samples(gen, 120).foreach { case (bits, data, ch, rate) =>
      val wav = MediaCodec.encodeWav(rate, ch, bits, data)
      val st = MediaCodec.pcmStats(wav, MediaCodec.decode(wav).get).get
      val full = (1 << (bits - 1)) - 1
      assert(st.nSamples === data.length / (bits / 8))
      assert(st.nFrames === st.nSamples / ch)
      assert(st.durationMs === st.nFrames * 1000 / rate)
      // run lengths live inside the sample count; an all-silent clip has
      // both runs equal to it, and a clip with any loud sample has
      // lead + trail <= n (the loud sample belongs to neither run)
      assert(st.leadSilence <= st.nSamples && st.trailSilence <= st.nSamples)
      if (st.peak > (full >> 6))
        // at least one loud sample exists and belongs to neither run
        assert(st.leadSilence + st.trailSilence < st.nSamples, s"runs exceed clip: $st")
      else if (st.nSamples > 0)
        assert(st.leadSilence === st.nSamples && st.trailSilence === st.nSamples)
      // energy bounds: peak² <= sumSq <= n × peak²; clips are samples
      assert(st.peak.toLong * st.peak <= math.max(st.sumSq, 0L) || st.nSamples === 0L)
      assert(st.sumSq <= st.nSamples * (full + 1L) * (full + 1L))
      assert(st.nClip <= st.nSamples)
    }
  }

  test("BPE fold invariants: symbols reconstruct the word, counts never grow") {
    import SharedSpark.spark.implicits._
    val wordGen = for {
      n <- Gen.chooseNum(1, 12)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val words = samples(wordGen, 150).distinct
    // one doc per word occurrence over a tiny alphabet — pair supply is
    // dense, so several rounds of real merges happen
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val (learned, vocab) = graft.queries.TextQueries.bpeTrainLoop(
      spark, docs, targetMerges = 16, rulesPerRound = 4)
    val rows = vocab.collect()
    graft.plans.Checkpoints.checkpointedRdd(vocab).foreach(_.unpersist(false))
    rows.foreach { r =>
      val word = r.getString(0)
      val syms = r.getSeq[String](2)
      assert(syms.mkString === word,
        s"symbols must reconstruct '$word', got ${syms.mkString("|")}")
      assert(syms.length <= word.length, "merging can only shrink the list")
      assert(syms.forall(_.nonEmpty))
    }
    // every learned rule's sides are whole symbols: single chars or
    // earlier merges (same closure law BpeConvergeSpec pins by hand)
    val known = scala.collection.mutable.Set[String]()
    learned.foreach { case (_, _, a, b, n, _) =>
      assert(n >= 2, "sub-threshold rule learned")
      Seq(a, b).foreach(side =>
        assert(side.length == 1 || known.contains(side), s"side '$side'"))
      known += (a + b)
    }
    Bench.cleanup(spark)
  }

  test("adaptive salting is join-invisible for arbitrary key distributions") {
    // SkewAutosaltSpec pins the planted 8/3/1 factor shape; this property
    // sweeps random distributions (uniform, square-skewed, constant-key)
    // and requires bit-identical per-key aggregates vs the plain join —
    // including keys straddling the budget boundary, where a factor
    // derivation off-by-one would double- or zero-count matched rows.
    import org.apache.spark.sql.functions._
    import SharedSpark.spark.implicits._
    val distGen = for {
      nKeys <- Gen.chooseNum(1, 12)
      rows <- Gen.chooseNum(1, 1500)
      shape <- Gen.oneOf("uniform", "square", "constant")
    } yield (nKeys, rows, shape)
    samples(distGen, 12).foreach { case (nKeys, rows, shape) =>
      val fact = spark.range(0, rows.toLong).select(
        (shape match {
          case "uniform"  => col("id") % nKeys
          case "square"   => (col("id") * col("id")) % nKeys
          case "constant" => lit(0L)
        }).as("l_suppkey"),
        col("id").as("l_orderkey"), (col("id") % 5).as("l_linenumber"),
        (col("id") % 97).cast("double").as("l_extendedprice"))
      val dim = spark.range(0, nKeys.toLong)
        .select(col("id").as("s_suppkey"), concat(lit("s"), col("id")).as("s_name"))
      def agg(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("sv"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      val plain = agg(fact.join(dim, col("l_suppkey") === col("s_suppkey")))
      val salted = agg(graft.queries.RelationalQueries.saltedAutoJoin(fact, dim,
        budget = 100L))
      assert(salted === plain, s"mismatch at nKeys=$nKeys rows=$rows shape=$shape")
    }
    Bench.cleanup(spark)
  }

  test("pcm dHash: gain invariance holds for ANY clip at ANY clip-safe gain (round 13)") {
    // the perceptual-audio contract as a property, not just the fixture:
    // for arbitrary 16-bit PCM whose amplitude leaves headroom, scaling
    // by any positive integer gain changes every nonzero sample byte but
    // not one hash bit — window sums scale together and the
    // cross-multiplied mean comparisons (ties included) are
    // scale-invariant by construction
    import graft.media.MediaCodec
    val lens = Gen.chooseNum(65, 400)
    val amps = Gen.chooseNum(1, 8000)
    samples(Gen.zip(lens, amps, Gen.chooseNum(1L, 1000000L)), 40).foreach {
      case (n, amp, seed) =>
        val rnd = new scala.util.Random(seed)
        val s0 = Array.fill(n)(rnd.nextInt(2 * amp + 1) - amp)
        def wav(g: Int): Array[Byte] = {
          val data = new Array[Byte](2 * n)
          s0.indices.foreach { i =>
            val v = s0(i) * g
            data(2 * i) = v.toByte; data(2 * i + 1) = (v >> 8).toByte
          }
          MediaCodec.encodeWav(16000, 1, 16, data)
        }
        val gains = Seq(2, 3, 4).filter(g => amp.toLong * g <= 32767L)
        val p1 = wav(1)
        val base = MediaCodec.pcmDhashBands(p1, MediaCodec.decode(p1).get).get.toSeq
        gains.foreach { g =>
          val pg = wav(g)
          val got = MediaCodec.pcmDhashBands(pg, MediaCodec.decode(pg).get).get.toSeq
          assert(got === base, s"gain x$g flipped a bit (n=$n amp=$amp seed=$seed)")
        }
    }
  }

  test("IvfProvision: derived K is bounded, √-shaped, and seed-exact at any corpus size (round 17)") {
    // the scale claim as arithmetic: the derived rule keeps K between
    // the floor and the cap at EVERY n (no corpus size can inflate the
    // centroid collect past maxCells), K·K·W covers n below the cap
    // (cells really are ~√(n/W)-many — neither failure mode of the two
    // historic bugs: K ∝ N rate, or fixed K with width ∝ N), and the
    // strided seeds stay multiples of 4 strictly inside the corpus
    import graft.queries.SimilarityQueries.IvfProvision
    val floor = IvfProvision.cells
    val w = IvfProvision.targetWidth.toLong
    samples(Gen.chooseNum(4L * floor, 2000000000000L), 200).foreach { n =>
      val k = IvfProvision.cellsFor(n)
      assert(k >= floor && k <= IvfProvision.maxCells, s"K out of bounds at n=$n")
      // ceilSqrt exactness: k is the SMALLEST count whose k²·W covers n
      // (whenever neither clamp is active)
      if (k > floor && k < IvfProvision.maxCells) {
        assert(k.toLong * k * w >= n, s"K²·W < n at n=$n (k=$k)")
        assert((k - 1L) * (k - 1L) * w < n + w, s"K not minimal at n=$n (k=$k)")
      }
      val s = IvfProvision.stride(n)
      assert(s % 4 === 0, s"stride not a multiple of 4 at n=$n")
      // seeds are s*{0..K-1}: count K, last one strictly inside the corpus
      assert((k - 1).toLong * s < n, s"last seed outside the corpus at n=$n")
      assert(s * k.toLong >= 0, s"stride overflow at n=$n")
    }
    // and the REAL predicate, executed (not re-derived arithmetic — a
    // regression in seedFilter itself, e.g. '<' flipping to '<=', must
    // fail here): exactly min(K, ceil(n/4)) seeds, all multiples of 4
    Seq(10L, 20L, 37L, 500L, 2000L, 99999L).foreach { n =>
      val k = IvfProvision.cellsFor(n)
      val seeds = spark.range(n).toDF("vec_id")
        .filter(IvfProvision.seedFilter(IvfProvision.stride(n), k))
        .collect().map(_.getLong(0))
      val expected = math.min(k.toLong, (n + 3) / 4)
      assert(seeds.length.toLong === expected,
        s"seedFilter yielded ${seeds.length} seeds at n=$n, expected $expected")
      assert(seeds.forall(_ % 4 == 0), s"a seed escaped the base slice at n=$n")
      assert(seeds.forall(_ < n), s"a seed landed outside the corpus at n=$n")
    }
    Bench.cleanup(spark)
  }
}
