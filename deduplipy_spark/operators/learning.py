"""Optional learned pair scorer — parity with the reference's classifier.

Reference: ``deduplipy/classifier_pipeline.py:21-52`` — sklearn
``StandardScaler -> LogisticRegression(class_weight='balanced')``; trained
by an interactive active-learning loop (``active_learning.py``). The
interactive loop is driver-side human-in-the-loop and not reproducible in a
batch engine (SURVEY §2.9); the classifier itself IS reproducible and is
re-expressed on ``pyspark.ml``:

    VectorAssembler(similarities) -> StandardScaler -> LogisticRegression
        (weightCol balances classes, mirroring class_weight='balanced')

The trained model scores pairs distributively (Spark ML transform is
JVM-side). The engine default remains the thresholded MinHash score — this
module exists for users migrating reference configs that relied on the
learned scorer. A no-op fit on single-class y mirrors
``classifier_pipeline.py`` (its pipeline skips fitting when y has one
class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PairClassifier:
    def __init__(self, interaction: bool = False) -> None:
        self.interaction = interaction
        self.model = None
        self._single_class_label: float | None = None

    def fit(self, pairs: DataFrame, features_col: str = "similarities",
            label_col: str = "y") -> "PairClassifier":
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.feature import StandardScaler
        from pyspark.ml.functions import array_to_vector
        from pyspark.ml import Pipeline

        classes = [r[0] for r in pairs.select(label_col).distinct().collect()]
        if len(classes) == 1:
            # reference: no-op fit on single-class y (classifier_pipeline.py)
            self._single_class_label = float(classes[0])
            return self

        df = pairs.withColumn("_vec", array_to_vector(F.col(features_col)))
        # class_weight='balanced': weight = n / (k * n_c)
        counts = {r[0]: r[1] for r in df.groupBy(label_col).count().collect()}
        n, k = sum(counts.values()), len(counts)
        mapping = F.create_map(
            *[x for c, cnt in counts.items()
              for x in (F.lit(c), F.lit(n / (k * cnt)))]
        )
        df = df.withColumn("_w", mapping[F.col(label_col)])
        scaler = StandardScaler(inputCol="_vec", outputCol="_scaled",
                                withMean=True, withStd=True)
        lr = LogisticRegression(
            featuresCol="_scaled", labelCol=label_col, weightCol="_w",
            elasticNetParam=1.0 if self.interaction else 0.0,
            regParam=0.01 if self.interaction else 0.0,
        )
        self.model = Pipeline(stages=[scaler, lr]).fit(df)
        return self

    def predict_proba(self, pairs: DataFrame,
                      features_col: str = "similarities") -> DataFrame:
        """Adds `score` = P(match)."""
        if self.model is None:
            lbl = self._single_class_label
            if lbl is None:
                raise RuntimeError("fit() first")
            return pairs.withColumn("score", F.lit(lbl))
        from pyspark.ml.functions import array_to_vector, vector_to_array

        df = pairs.withColumn("_vec", array_to_vector(F.col(features_col)))
        out = self.model.transform(df)
        return out.withColumn(
            "score", vector_to_array(F.col("probability"))[1]
        ).drop("_vec", "_scaled", "rawPrediction", "probability", "prediction")
