package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.queries.VectorQueries.groupedTopK

/** Approximate nearest neighbour via random-hyperplane LSH (SURVEY §2.2
  * [EXT] "similarity search — scale path").
  *
  * Brute force is one scan per query batch — fine until |candidates| ×
  * |queries| dominates. This bucketizes both sides by sign-bit signatures
  * over `nPlanes` deterministic pseudo-random hyperplanes, bands the bits
  * (any shared band ⇒ candidate, multi-probe style), and runs EXACT cosine
  * top-k only inside the candidate set. All shuffles are equi-joins on
  * (band index, band bits); nothing is all-pairs.
  *
  * Hyperplanes are derived from md5("p:d") mapped to [-1, 1] — fully
  * deterministic across runs and engines, no RNG state to ship.
  */
object AnnLsh {

  /** nPlanes×dim hyperplane matrix, deterministic. */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dim) { (p, d) =>
      val h = md.digest(s"$p:$d".getBytes("UTF-8"))
      val v = java.nio.ByteBuffer.wrap(h).getInt(0) & 0x0FFFFFFF // 28 bits
      (v.toDouble / 0x0FFFFFFF.toDouble) * 2.0 - 1.0
    }
  }

  /** Sign-bit signature of `e` (array<double>) as a long. */
  def signature(e: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(VectorFunctions.dot(e, typedlit(p.toSeq)) > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** Explode rows into (band_idx, band_bits) per band. The signature is
    * materialized as its own projection BELOW the generate and the band bits
    * are derived from that single attribute: building an array of per-band
    * structs over the raw signature expression instead would duplicate the
    * whole 16-dot-product tree once per band reference (CollapseProject
    * re-inlines it), which both recomputes the dots 2·nBands times and blows
    * whole-stage codegen past janino's 64 KB method limit (observed: q40
    * falls back to interpreted eval).
    */
  private def banded(df: DataFrame, sig: Column, nBands: Int, bitsPerBand: Int): DataFrame =
    df.withColumn("_sig", sig)
      .withColumn("band_idx", explode(sequence(lit(0), lit(nBands - 1))))
      .withColumn("band_bits",
        call_function("shiftright", col("_sig"), col("band_idx") * bitsPerBand)
          .bitwiseAND((1L << bitsPerBand) - 1))

  /** Approximate top-k: candidates = same (band_idx, band_bits) bucket in
    * any band; exact cosine + grouped top-k within candidates.
    *
    * @param emb     (vecIdCol, eCol: array<double>)
    * @param queries (qidCol, qeCol: array<double>)
    */
  def topK(emb: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 16, nBands: Int = 4, dim: Int = 64): DataFrame = {
    require(nPlanes % nBands == 0, "nPlanes must divide into nBands")
    val bitsPerBand = nPlanes / nBands
    val planes = hyperplanes(nPlanes, dim)

    val cands = banded(emb, signature(col("e"), planes), nBands, bitsPerBand)
      .select(col("vec_id"), col("e"), col("band_idx"), col("band_bits"))
    val qs = banded(queries, signature(col("qe"), planes), nBands, bitsPerBand)
      .select(col("qid"), col("qe"), col("band_idx"), col("band_bits"))

    val scored = cands.join(qs, Seq("band_idx", "band_bits"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("e"), col("qe"))
      .dropDuplicates("qid", "vec_id")
      .withColumn("cos", VectorFunctions.cosine(col("e"), col("qe")))

    groupedTopK(scored, "qid", k, Seq(col("cos").desc, col("vec_id")))
      .select(col("qid"), col("rn"), col("vec_id"), col("cos"))
  }
}
