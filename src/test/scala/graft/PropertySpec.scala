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
}
