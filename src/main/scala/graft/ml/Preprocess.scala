package graft.ml

import org.apache.spark.ml.feature.{Binarizer, Normalizer, OneHotEncoder, StandardScaler, VectorAssembler}
import org.apache.spark.sql.DataFrame

/** The reference's imported-but-offloaded preprocessing surface
  * (SURVEY.md §2.9 E2/E3: OneHotEncoder considered at NB cell 62,
  * StandardScaler/Normalizer/Binarizer imported at cell 2 and used in
  * the missing model notebook per cell 61's markdown). Thin,
  * convention-bound constructors so every consumer gets the same
  * column names; all distributed MLlib transformers — fit statistics
  * are a single treeAggregate pass, transform is map-only.
  */
object Preprocess {

  def assembler(cols: Seq[String], out: String = "features_raw"): VectorAssembler =
    new VectorAssembler().setInputCols(cols.toArray).setOutputCol(out)

  /** E3: z-score standardization (mean 0 / std 1). */
  def standardScaler(in: String = "features_raw", out: String = "features"): StandardScaler =
    new StandardScaler().setInputCol(in).setOutputCol(out)
      .setWithMean(true).setWithStd(true)

  /** E3: per-row L^p normalization. */
  def normalizer(in: String = "features_raw", out: String = "features_norm",
      p: Double = 2.0): Normalizer =
    new Normalizer().setInputCol(in).setOutputCol(out).setP(p)

  /** E3: threshold binarization. */
  def binarizer(in: String, out: String, threshold: Double): Binarizer =
    new Binarizer().setInputCol(in).setOutputCol(out).setThreshold(threshold)

  /** E2: one-hot over an already label-encoded column (the reference
    * rejected OHE for dimensionality — NB cell 62 — but the engine
    * provides it). */
  def oneHot(in: String, out: String): OneHotEncoder =
    new OneHotEncoder().setInputCols(Array(in)).setOutputCols(Array(out))
      .setDropLast(false)

  /** Standardized feature frame in one call (assemble + scale). */
  def standardize(df: DataFrame, cols: Seq[String]): DataFrame = {
    val assembled = assembler(cols).transform(df)
    standardScaler().fit(assembled).transform(assembled)
  }
}
