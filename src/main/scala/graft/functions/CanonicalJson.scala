package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import scala.jdk.CollectionConverters._

/** Canonical JSON — the reference's only correctness-critical custom
  * compute (ref: src/helper/udf.py:18-37, SURVEY §2.10 D1): every brick id
  * is `md5(canonicalize(json))`, so this function defines identity.
  *
  * Semantics (matching the reference):
  *   - drop null entries, empty strings, empty objects/arrays — recursively;
  *   - round floating-point numbers to 4 decimal places (HALF_EVEN, like
  *     Python's round());
  *   - sort object keys;
  *   - re-serialize compactly (no spaces).
  *
  * Runs as a Scala UDF — in-JVM, no pickle boundary (the reference pays a
  * Python-worker round trip per row here). Jackson ships with Spark. The
  * adapters construct `data` via codegen'd `to_json(struct(...))` with
  * sorted field order and clean values, so on the hot path this UDF is an
  * identity check, not a rewrite — and the DuckDB oracle can replay the
  * pipeline without it.
  */
object CanonicalJson {
  private val mapper = new ObjectMapper()

  def canonicalize(json: String): String = {
    if (json == null) return null
    try {
      val cleaned = clean(mapper.readTree(json))
      if (cleaned == null) "{}" else mapper.writeValueAsString(cleaned)
    } catch { case _: Exception => null }
  }

  private def clean(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = JsonNodeFactory.instance.objectNode()
      o.fieldNames().asScala.toSeq.sorted.foreach { k =>
        val v = clean(o.get(k))
        if (v != null) out.set[JsonNode](k, v)
      }
      if (out.isEmpty) null else out
    case a: ArrayNode =>
      val out = JsonNodeFactory.instance.arrayNode()
      a.asScala.foreach { e =>
        val v = clean(e)
        if (v != null) out.add(v)
      }
      if (out.isEmpty) null else out
    case v if v.isNull => null
    case v if v.isTextual =>
      if (v.asText().isEmpty) null else v
    case v if v.isFloatingPointNumber =>
      val r = BigDecimal(v.asDouble())
        .setScale(4, BigDecimal.RoundingMode.HALF_EVEN)
      JsonNodeFactory.instance.numberNode(r.doubleValue)
    case v => v
  }

  /** Column form for pipelines. */
  val canonicalizeJson: UserDefinedFunction = udf(canonicalize _)
}
