package org.apache.spark.ml.clustering

import org.apache.spark.ml.util.Identifiable
import org.apache.spark.mllib.clustering.{KMeansModel => OldKMeansModel}
import org.apache.spark.mllib.linalg.{Vectors => OldVectors}

/** Builds an `ml.KMeansModel` from an explicit centroid set. The public
  * API offers no way to construct a model from centers (the constructor
  * is `private[ml]`), but graft's balanced IVF quantizer refines the
  * fitted centers (splitting over-full cells) and must hand back the
  * SAME model type the rest of the IVF surface consumes — transform,
  * MLWritable persistence, centroid extraction all keep working. This
  * is the entire reason this file sits in the Spark package namespace;
  * it touches nothing non-public beyond the constructor.
  */
object GraftKMeansBridge {
  def fromCenters(centers: Array[Array[Double]],
                  featuresCol: String, predictionCol: String): KMeansModel =
    new KMeansModel(Identifiable.randomUID("graft-kmeans"),
      new OldKMeansModel(centers.map(OldVectors.dense)))
      .setFeaturesCol(featuresCol)
      .setPredictionCol(predictionCol)
}
