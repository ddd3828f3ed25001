package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PRODUCT QUANTIZATION (Jégou, Douze, Schmid 2011, "Product Quantization
  * for Nearest Neighbor Search") — the vector-compression half of the
  * faiss-style ANN stack next to the IVF lists (AnnIvf) and LSH buckets
  * (AnnLsh): split each d-dim vector into m subspaces, code each subspace
  * against a small codebook, and search by ASYMMETRIC DISTANCE COMPUTATION
  * (ADC) — the query stays exact, stored vectors are looked up code-wise,
  * so the scan touches m small ints per vector instead of d doubles
  * (16× compression at d=64, m=8, 16 codes).
  *
  * Codebook: the CLOSED-FORM signed-basis quantizer (the q255 discipline —
  * a trained codebook is merge-order-dependent and not oracle-reproducible;
  * the audit's job is the SEARCH mechanics, not k-means): per subspace the
  * 2·dsub codes are {+e_0..+e_{dsub−1}, −e_0..−e_{dsub−1}} and a vector's
  * code is the argmax of the signed components — i.e. its dominant
  * direction. First-max tie-break, so codes are a pure function of the
  * data in BOTH engines. ADC then reduces to a signed component pick per
  * subspace: exact, engine-identical double arithmetic with a fixed
  * summation order.
  *
  * 100 TB shape: coding is one in-row projection over the corpus (written
  * once next to — or instead of — the raw vectors); the ADC scan reads the
  * m-byte codes, broadcasts the query batch, and top-k merges partially.
  * No shuffle anywhere but groupedTopK's k·partitions merge.
  */
object ProductQuantizer {

  /** The 2·dsub signed components of subspace `j` (0-based), in code
    * order: +v[jd+1..jd+d], then −v[jd+1..jd+d].
    */
  private def signedComponents(v: Column, j: Int, dsub: Int): Seq[Column] =
    (0 until 2 * dsub).map(i =>
      if (i < dsub) element_at(v, j * dsub + i + 1)
      else -element_at(v, j * dsub + (i - dsub) + 1))

  /** Code (1..2·dsub) of subspace `j`: first-max argmax over the signed
    * basis directions.
    */
  def code(v: Column, j: Int, dsub: Int = 8): Column = {
    val l = array(signedComponents(v, j, dsub): _*)
    array_position(l, array_max(l)).cast("int")
  }

  /** All m subspace codes of a d = m·dsub vector — the compressed index
    * row (m small ints).
    */
  def codes(v: Column, m: Int = 8, dsub: Int = 8): Column =
    array((0 until m).map(j => code(v, j, dsub)): _*)

  /** ADC score of exact query `q` against stored `codes`: per subspace the
    * signed q-component in the coded direction, summed in fixed subspace
    * order (engine-identical double arithmetic). Monotone to the exact dot
    * product against the quantized reconstruction.
    */
  def adc(q: Column, codes: Column, m: Int = 8, dsub: Int = 8): Column =
    (0 until m).map { j =>
      val c = element_at(codes, j + 1)
      when(c <= dsub, element_at(q, lit(j * dsub) + c))
        .otherwise(-element_at(q, lit(j * dsub) + c - dsub))
    }.reduce(_ + _)
}
