package graft.chem

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Chemistry structure conversion — the D2/D3 UDF surface
  * (ref: src/helper/udf.py:7-16 `inchi2smi`, :39-47 `smiles_to_inchi`;
  * consumed at src/80_harmonize.py:72-73 and src/13_integrate_BBBP.py:33-34).
  *
  * The reference wraps RDKit; no chemistry library exists in a zero-egress
  * JVM build (SURVEY §7.4 risk 4), so the engine isolates the conversion
  * behind this trait (SURVEY §7.1 module 4). `Stub` is the deterministic,
  * INVERTIBLE default every correctness test and oracle uses; a real
  * RDKit-JNI/CDK-backed implementation plugs in here without touching any
  * pipeline code.
  *
  * Contract (matches the reference UDFs): null in → null out; an input
  * that fails to parse → null, never an exception.
  */
trait StructureConverter extends Serializable {
  def inchiToSmiles(inchi: String): String
  def smilesToInchi(smiles: String): String

  /** Column forms as Scala UDFs — in-JVM, where the reference pays a
    * Python-worker pickle round trip per row. Harmonize applies them to
    * the DISTINCT structure set only (one call per structure, never per
    * activity row — src/80_harmonize.py:72's shape).
    */
  def inchiToSmilesCol(c: Column): Column =
    udf((s: String) => inchiToSmiles(s)).apply(c)
  def smilesToInchiCol(c: Column): Column =
    udf((s: String) => smilesToInchi(s)).apply(c)
}

object StructureConverter {
  private val InchiPrefix = "InChI=1S/"
  private val SmilesPrefix = "GS:"

  /** Deterministic passthrough codec: the InChI body is carried inside a
    * `GS:` marker and back. Invertible (`smilesToInchi ∘ inchiToSmiles`
    * is identity on valid InChI), expressible in ANSI SQL for the DuckDB
    * oracles (`'GS:' || substr(inchi, 10)`), and faithful to the
    * reference's failure mode (unparseable → null).
    */
  object Stub extends StructureConverter {
    def inchiToSmiles(inchi: String): String =
      if (inchi == null || !inchi.startsWith(InchiPrefix)) null
      else SmilesPrefix + inchi.substring(InchiPrefix.length)

    def smilesToInchi(smiles: String): String =
      if (smiles == null || !smiles.startsWith(SmilesPrefix)) null
      else InchiPrefix + smiles.substring(SmilesPrefix.length)
  }
}
