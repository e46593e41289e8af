"""Deterministic synthetic code-file corpus with planted duplicate clusters.

Re-expresses the reference's demo/test corpora (typo-ridden voters table,
``deduplipy/data/voter_names.csv``; blocking fixture names,
``tests/test_blocking/test_blocking.py:5``) over source-code rows per the
north rule: table (repo, path, commit, lang, content) + a golden truth table
(row_idx, truth_cluster) for recall measurement.

Determinism: every row's content is a pure function of (seed, row index) —
generation happens distributively with ``mapInPandas`` over ``spark.range``,
so output is identical at any parallelism (no wall clock, no partition-index
dependence).

Layout of row indices, for n_clusters planted clusters of size m:
  i in [0, n_clusters*m)          -> cluster j = i // m, member k = i % m
     k == 0: the original snippet
     k == 1: EXACT copy (different repo/path/commit) — must collapse via sha
     k >= 2: mutated near-duplicate (whitespace churn, identifier rename,
             comment insert/delete, line edit/reorder, truncation — the
             code-shaped analogue of the voters dataset's OCR typos)
  i >= n_clusters*m               -> singleton with unique content
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import pandas as pd

LANGS = ["py", "java", "js", "go", "c"]
_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega count total index "
    "value buffer stream parse token merge split batch chunk offset cursor"
).split()


def _base_snippet(rng: random.Random, n_lines: int, salt: str = "") -> str:
    """Seeded code-like text, 200-4000 chars (FIXTURES.md F1).

    `salt` is woven into identifiers, mimicking per-project naming: without
    it, templated snippets share most 7-char shingles ACROSS clusters and
    the candidate-pair volume goes quadratic (measured: 6.7M pairs from
    100k files), which no real code corpus exhibits.
    """
    lines = []
    for _ in range(n_lines):
        kind = rng.randrange(4)
        a, b, c = (f"{rng.choice(_WORDS)}{salt}", f"{rng.choice(_WORDS)}{salt}",
                   f"{rng.choice(_WORDS)}{salt}")
        k = rng.randrange(1000)
        if kind == 0:
            lines.append(f"def {a}_{b}(x, y={k}):")
            lines.append(f"    return x * {k} + {a}_{c}(y)")
        elif kind == 1:
            lines.append(f"{a} = [{b}(i) for i in range({k})]")
        elif kind == 2:
            lines.append(f"if {a} > {k}:")
            lines.append(f"    {b} = {c}.get('{a}', {k})")
        else:
            lines.append(f"# compute {a} over {b} window of {k}")
            lines.append(f"for {a} in {b}_{c}[:{k}]:")
            lines.append(f"    yield {a} + {k}")
    return "\n".join(lines)


def _mutate(rng: random.Random, content: str) -> str:
    """Apply 1-3 small mutations — near-duplicate, high Jaccard on 7-shingles."""
    lines = content.split("\n")
    for _ in range(rng.randrange(1, 4)):
        op = rng.randrange(6)
        if op == 0 and lines:          # whitespace / indent churn
            i = rng.randrange(len(lines))
            lines[i] = "  " + lines[i]
        elif op == 1:                  # identifier rename (one word, everywhere)
            old = rng.choice(_WORDS)
            lines = [ln.replace(old, old + "2") for ln in lines]
        elif op == 2:                  # comment insert
            i = rng.randrange(len(lines) + 1)
            lines.insert(i, f"# note {rng.randrange(10**6)}")
        elif op == 3 and len(lines) > 2:  # single-line edit
            i = rng.randrange(len(lines))
            lines[i] = lines[i] + f"  # {rng.randrange(100)}"
        elif op == 4 and len(lines) > 3:  # reorder two adjacent lines
            i = rng.randrange(len(lines) - 1)
            lines[i], lines[i + 1] = lines[i + 1], lines[i]
        elif op == 5 and len(lines) > 4:  # truncate tail line
            lines = lines[:-1]
    return "\n".join(lines)


def _row(i: int, seed: int, n_clusters: int, members: int) -> tuple:
    planted = n_clusters * members
    if i < planted:
        cluster, k = divmod(i, members)
        base_rng = random.Random(f"{seed}-base-{cluster}")
        content = _base_snippet(base_rng, base_rng.randrange(6, 60),
                                salt=f"_q{cluster % 9973}")
        if k == 1:
            pass                       # exact copy
        elif k >= 2:
            content = _mutate(random.Random(f"{seed}-mut-{i}"), content)
        truth = cluster
    else:
        rng = random.Random(f"{seed}-single-{i}")
        content = _base_snippet(rng, rng.randrange(6, 60),
                                salt=f"_s{i % 99991}")
        truth = n_clusters + (i - planted)   # unique truth id per singleton
    rng2 = random.Random(f"{seed}-meta-{i}")
    lang = LANGS[i % len(LANGS)]
    import hashlib

    commit = hashlib.sha256(f"c{seed}-{i}".encode()).hexdigest()[:40]
    return (
        f"org{i % 7}/repo{i % 23}",
        f"src/m{i % 11}/f{i}.{lang}",
        commit,
        lang,
        content,
        i,
        truth,
    )


_COLS = ["repo", "path", "commit", "lang", "content", "row_idx", "truth_cluster"]


def gen_pandas(n_files: int, n_clusters: int, members: int = 5, seed: int = 42) -> pd.DataFrame:
    """Driver-side generator (small fixtures + the pandas reference replica)."""
    rows = [_row(i, seed, n_clusters, members) for i in range(n_files)]
    return pd.DataFrame(rows, columns=_COLS)


def gen_files(spark, n_files: int, n_clusters: int, members: int = 5, seed: int = 42,
              partitions: int = 32):
    """Distributed generator: content is a pure function of (seed, row index)."""

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [_row(int(i), seed, n_clusters, members) for i in pdf["id"]]
            yield pd.DataFrame(out, columns=_COLS)

    schema = ("repo string, path string, commit string, lang string, "
              "content string, row_idx long, truth_cluster long")
    return spark.range(0, n_files, numPartitions=partitions).mapInPandas(make, schema)
