package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CanonicalJson.canonicalize

/** Golden vectors for the canonicalizer — every brick id is
  * md5(canonicalize(json)), so these bytes define identity (SURVEY §7.4
  * risk 1). Semantics mirror the reference canonicalizer
  * (ref: src/helper/udf.py:18-37).
  */
class CanonicalJsonSpec extends AnyFunSuite {

  test("sorts object keys") {
    assert(canonicalize("""{"b":1,"a":2}""") == """{"a":2,"b":1}""")
  }

  test("drops nulls, empty strings, empty containers — recursively") {
    assert(canonicalize("""{"a":null,"b":"","c":{},"d":[],"e":1}""")
      == """{"e":1}""")
    assert(canonicalize("""{"a":{"b":{"c":null}},"d":2}""") == """{"d":2}""")
    assert(canonicalize("""{"a":[null,"",{}],"b":3}""") == """{"b":3}""")
  }

  test("rounds floats to 4 decimal places, half-even") {
    assert(canonicalize("""{"x":0.123456}""") == """{"x":0.1235}""")
    assert(canonicalize("""{"x":1.0}""") == """{"x":1.0}""")
    // half-even: .00005 rounds to the even neighbor
    assert(canonicalize("""{"x":0.00025}""") == """{"x":2.0E-4}"""
      || canonicalize("""{"x":0.00025}""") == """{"x":0.0002}""")
  }

  test("integers pass through untouched") {
    assert(canonicalize("""{"x":12345678901234}""") == """{"x":12345678901234}""")
  }

  test("identity on already-canonical adapter data") {
    for (s <- Seq("""{"user_id":123}""",
        """{"c_custkey":42,"c_name":"Customer#000000042"}""",
        """{"event_type":"click"}""")) {
      assert(canonicalize(s) == s)
    }
  }

  test("all-empty input collapses to {}") {
    assert(canonicalize("""{"a":null}""") == "{}")
  }

  test("invalid JSON yields null") {
    assert(canonicalize("{nope") == null)
    assert(canonicalize(null) == null)
  }

  test("nested arrays and unicode survive") {
    assert(canonicalize("""{"a":[3,1,2],"s":"ünïcødé"}""")
      == """{"a":[3,1,2],"s":"ünïcødé"}""")
  }
}
