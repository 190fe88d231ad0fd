package graft

import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampType}

/** The events reader's dual-generation contract (round-6 incident: the
  * driver regenerated the testdata and events.ts changed physical type
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS), silently breaking every
  * events-based query). Whatever the file carries, downstream code gets
  * the same two columns with the same meaning.
  */
class TablesSpec extends SparkSpec {

  test("events normalizes ts_ns/ts across physical timestamp generations") {
    val ev = Tables.events(spark, sf())
    assert(ev.schema("ts_ns").dataType == LongType)
    assert(ev.schema("ts").dataType == TimestampType)
    // the binding invariant both branches guarantee: ts is exactly the
    // microsecond truncation of ts_ns (on a micros-generation file the
    // sub-microsecond digits are zero, so this is an equality)
    assert(ev.filter(
      expr("ts <> timestamp_micros(ts_ns div 1000)")).isEmpty)
    // and ts_ns is plausible epoch-nanos (year 2001+), not micros that
    // skipped the ×1000 — a unit slip would land near 1970
    assert(ev.filter(expr("ts_ns < 1000000000000000000L")).isEmpty)
  }
}
