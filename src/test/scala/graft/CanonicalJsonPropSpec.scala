package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.functions.CanonicalJson.canonicalize

/** Property-based invariants of the canonicalizer — the id-defining
  * function (SURVEY §7.4 risk 1). Generated JSON objects cover nesting,
  * arrays, nulls, empties, unicode, and floats.
  *
  * Note: like the reference (raw-value filtering), canonicalize is NOT
  * idempotent in general — `{"a":[null]}` -> `{"a": []}` -> `{}` — so the
  * invariants here are parseability, determinism, order-insensitivity,
  * and absence of raw-droppable values, not idempotence.
  */
class CanonicalJsonPropSpec extends AnyFunSuite {

  /** Minimal forAll: 200 deterministic samples per property (scalacheck's
    * scalatest bridge isn't in the offline cache; Gen is).
    */
  private def forAll[A](gen: Gen[A])(check: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    var seed = seed0
    (1 to 200).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
    }
  }

  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-1000000L, 1000000L).map(_.toString),
    // Locale.ROOT: the f-interpolator is locale-sensitive and a
    // comma-decimal default locale would generate invalid JSON
    Gen.chooseNum(-1000.0, 1000.0).map(d =>
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))),
    Gen.alphaNumStr.map(s => "\"" + s.take(12) + "\""),
    Gen.const("null"),
    Gen.const("\"\""),
    Gen.const("true"),
    Gen.const("\"ünï\""))

  private def objGen(depth: Int): Gen[String] =
    for {
      n <- Gen.chooseNum(0, 4)
      keys <- Gen.listOfN(n, Gen.identifier.map(_.take(8)))
      vals <- Gen.listOfN(n,
        if (depth <= 0) scalarGen
        else Gen.frequency((3, scalarGen), (1, objGen(depth - 1)),
          (1, arrGen(depth - 1))))
    } yield keys.distinct.zip(vals)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")

  private def arrGen(depth: Int): Gen[String] =
    Gen.chooseNum(0, 3).flatMap(n =>
      Gen.listOfN(n, if (depth <= 0) scalarGen else objGen(depth - 1))
        .map(_.mkString("[", ",", "]")))

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("output is valid JSON, deterministic, and pure ASCII") {
    forAll(objGen(3)) { json =>
      val c = canonicalize(json)
      assert(c != null)
      mapper.readTree(c) // throws if invalid
      assert(canonicalize(json) == c)
      assert(c.forall(ch => ch >= 0x20 && ch <= 0x7e))
    }
  }

  test("canonicalize is order-insensitive over key permutations") {
    forAll(Gen.listOfN(4, Gen.zip(Gen.identifier.map(_.take(6)),
        Gen.chooseNum(0, 999)))) { kvs =>
      val distinct = kvs.toMap.toSeq
      val a = distinct.map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
      val b = distinct.reverse.map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
      assert(canonicalize(a) == canonicalize(b))
    }
  }

  test("output never contains null or empty-string values") {
    forAll(objGen(3)) { json =>
      val c = canonicalize(json)
      assert(!c.contains(": null"))
      assert(!c.contains("[null"))
      assert(!c.contains(" null"))
      assert(!c.contains(": \"\""))
    }
  }

  test("second pass only drops newly-empty containers (reference parity)") {
    forAll(objGen(3)) { json =>
      val once = canonicalize(json)
      val twice = canonicalize(once)
      // twice is a sub-document of once: same or fewer entries, and the
      // third pass agrees with the second (cleaning reaches a fixpoint
      // once no raw-empty values remain... which pass 2 guarantees only
      // for arrays/strings; objects can cascade, so compare 3 vs 2 only
      // when equal — the real invariant is monotone shrinkage).
      assert(twice.length <= once.length)
    }
  }
}
