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


def _interaction_array(features_col: str, d: int):
    """Degree-2 interaction-only expansion as a pure Column expression:
    [x_1..x_d, x_i*x_j for i<j] — PolynomialFeatures(degree=2,
    interaction_only=True) minus the bias constant (the LR intercept covers
    it), applied to the ALREADY-STANDARDIZED features, matching the
    reference pipeline order (classifier_pipeline.py:22-27)."""
    xs = [F.element_at(F.col(features_col), i + 1) for i in range(d)]
    return F.array(*xs, *[xs[i] * xs[j]
                          for i in range(d) for j in range(i + 1, d)])


class PairClassifier:
    def __init__(self, interaction: bool = False) -> None:
        self.interaction = interaction
        self.model = None
        self._scaler = None
        self._dim: int | None = None
        self._single_class_label: float | None = None

    def _expanded(self, df: DataFrame, features_col: str) -> DataFrame:
        """scale -> (optional) interaction expansion -> `_feat` vector."""
        from pyspark.ml.functions import array_to_vector, vector_to_array

        df = df.withColumn("_vec", array_to_vector(F.col(features_col)))
        df = self._scaler.transform(df)
        if not self.interaction:
            return df.withColumn("_feat", F.col("_scaled"))
        return (
            df.withColumn("_scaled_arr", vector_to_array(F.col("_scaled")))
            .withColumn(
                "_feat",
                array_to_vector(_interaction_array("_scaled_arr", self._dim)),
            )
            .drop("_scaled_arr")
        )

    def fit(self, pairs: DataFrame, features_col: str = "similarities",
            label_col: str = "y",
            label_counts: dict | None = None) -> "PairClassifier":
        """``label_counts``: optional {label: count} when the caller already
        knows it (e.g. an active learner tracking its own labels) — skips
        the one fit-time aggregation job below (VERDICT r5 #6: the old
        shape ran TWO driver collects, a distinct for the classes and a
        groupBy for the weights; the groupBy alone provides both)."""
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.feature import StandardScaler
        from pyspark.ml.functions import array_to_vector

        counts = dict(label_counts) if label_counts else {
            r[0]: r[1] for r in pairs.groupBy(label_col).count().collect()}
        classes = list(counts)
        if len(classes) == 1:
            # reference: no-op fit on single-class y (classifier_pipeline.py)
            self._single_class_label = float(classes[0])
            return self

        self._dim = len(pairs.select(features_col).first()[0])
        df = pairs.withColumn("_vec", array_to_vector(F.col(features_col)))
        # class_weight='balanced': weight = n / (k * n_c)
        n, k = sum(counts.values()), len(counts)
        mapping = F.create_map(
            *[x for c, cnt in counts.items()
              for x in (F.lit(c), F.lit(n / (k * cnt)))]
        )
        self._scaler = StandardScaler(
            inputCol="_vec", outputCol="_scaled", withMean=True, withStd=True
        ).fit(df)
        df = self._expanded(pairs, features_col).withColumn(
            "_w", mapping[F.col(label_col)]
        )
        # interaction=True mirrors the reference's L1/saga variant
        # (classifier_pipeline.py:26): L1 on the expanded features
        lr = LogisticRegression(
            featuresCol="_feat", labelCol=label_col, weightCol="_w",
            elasticNetParam=1.0 if self.interaction else 0.0,
            regParam=0.01 if self.interaction else 0.0,
        )
        self.model = lr.fit(df)
        return self

    def predict_proba(self, pairs: DataFrame,
                      features_col: str = "similarities") -> DataFrame:
        """Adds `score` = P(match)."""
        if self.model is None:
            lbl = self._single_class_label
            if lbl is None:
                raise RuntimeError("fit() first")
            return pairs.withColumn("score", F.lit(lbl))
        from pyspark.ml.functions import vector_to_array

        df = self._expanded(pairs, features_col)
        out = self.model.transform(df)
        return out.withColumn(
            "score", vector_to_array(F.col("probability"))[1]
        ).drop("_vec", "_scaled", "_feat", "rawPrediction", "probability",
               "prediction")
