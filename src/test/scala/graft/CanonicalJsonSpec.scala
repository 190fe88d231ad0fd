package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CanonicalJson.{canonicalize, pyFloatRepr}

/** Golden vectors for the canonicalizer — every brick id is
  * md5(canonicalize(json)), so these bytes define identity (SURVEY §7.4
  * risk 1). The vectors in resources/canonical_golden.json were produced
  * by CPython's own `json` module (tools/gen_canonical_golden.py), so
  * passing them means byte-compatibility with the reference canonicalizer
  * (ref: src/helper/udf.py:18-37).
  */
class CanonicalJsonSpec extends AnyFunSuite {

  test("matches CPython json.dumps golden vectors byte-for-byte") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/canonical_golden.json"), "UTF-8")
    val text = try src.mkString finally src.close()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val vectors = mapper.readTree(text)
    assert(vectors.size > 50)
    var checked = 0
    vectors.forEach { v =>
      val in = v.get("in").asText
      val expected = v.get("out").asText
      assert(canonicalize(in) == expected,
        s"input $in: got ${canonicalize(in)}, want $expected")
      checked += 1
    }
    assert(checked == vectors.size)
  }

  test("filter is on RAW values: empty-after-cleaning survives") {
    assert(canonicalize("""{"a":{"b":null}}""") == """{"a": {}}""")
    assert(canonicalize("""{"a":[null],"b":1}""") == """{"a": [], "b": 1}""")
    assert(canonicalize("""{"a":null,"b":"","c":[],"d":{},"e":1}""")
      == """{"d": {}, "e": 1}""")
  }

  test("rounds floats to 4 decimal places, half-even, python repr") {
    assert(canonicalize("""{"x":0.123456}""") == """{"x": 0.1235}""")
    assert(canonicalize("""{"x":1.0}""") == """{"x": 1.0}""")
    // the double nearest 0.00025 sits ABOVE the half, so CPython (and
    // we) round up; 0.00035's sits below, so down — both land on 0.0003.
    assert(canonicalize("""{"x":0.00025}""") == """{"x": 0.0003}""")
    assert(canonicalize("""{"x":0.00035}""") == """{"x": 0.0003}""")
    assert(canonicalize("""{"x":2e-05}""") == """{"x": 0.0}""")
  }

  test("python float repr formatting thresholds") {
    assert(pyFloatRepr(1e15) == "1000000000000000.0")
    assert(pyFloatRepr(1e16) == "1e+16")
    assert(pyFloatRepr(1.5e16) == "1.5e+16")
    assert(pyFloatRepr(0.0001) == "0.0001")
    assert(pyFloatRepr(0.00001) == "1e-05")
    assert(pyFloatRepr(-2.5e-7) == "-2.5e-07")
    assert(pyFloatRepr(1e100) == "1e+100")
    assert(pyFloatRepr(0.1) == "0.1")
    assert(pyFloatRepr(-0.0) == "-0.0")
  }

  test("integers pass through untouched, including bigints") {
    assert(canonicalize("""{"x":12345678901234}""")
      == """{"x": 12345678901234}""")
    assert(canonicalize("""{"x":123456789012345678901234567890}""")
      == """{"x": 123456789012345678901234567890}""")
  }

  test("canonical form of adapter data (ensure_ascii, ': ' separator)") {
    assert(canonicalize("""{"user_id":123}""") == """{"user_id": 123}""")
    assert(canonicalize("""{"c_custkey":42,"c_name":"Customer#000000042"}""")
      == """{"c_custkey": 42, "c_name": "Customer#000000042"}""")
    // ensure_ascii: non-ASCII escapes to \uXXXX (lowercase hex)
    assert(canonicalize("""{"s":"ünï"}""") == "{\"s\": \"\\u00fcn\\u00ef\"}")
  }

  test("top-level scalars pass through like json.dumps") {
    assert(canonicalize("null") == "null")
    assert(canonicalize("\"\"") == "\"\"")
    assert(canonicalize("[]") == "[]")
    assert(canonicalize("{}") == "{}")
    assert(canonicalize("5") == "5")
  }

  test("invalid JSON yields null") {
    assert(canonicalize("{nope") == null)
    assert(canonicalize(null) == null)
    // trailing content after a valid first value is invalid too (the
    // reference's json.loads raises; an id from a prefix would be wrong)
    assert(canonicalize("""{"a":1} trailing""") == null)
    assert(canonicalize("""{"a":1}{"b":2}""") == null)
    // empty / whitespace-only parses to MissingNode, not an exception —
    // must still be null, not "" (md5("") would be a fabricated id)
    assert(canonicalize("") == null)
    assert(canonicalize("   ") == null)
  }
}
