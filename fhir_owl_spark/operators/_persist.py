"""Per-operator persisted-frame rotation.

Several operators persist an intermediate (LSH signatures, token sets)
that feeds multiple subtrees of ONE returned plan. The frames must stay
cached while that plan may still run, but a long-lived session calling
the operator repeatedly (contract runs, the corpus CLI, benchmarks)
would otherwise accumulate cached blocks until eviction pressure
(round-5 ADVICE). Policy: one GENERATION of cached frames per operator
key — a new call unpersists the previous call's generation and
registers its own. A caller that executes a stale plan afterwards
recomputes; it never reads wrong data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_GENERATIONS: dict[str, list[DataFrame]] = {}


def rotate_persisted(key: str) -> None:
    """Unpersist every frame a previous call registered under ``key``
    and start a fresh generation. Call once at operator entry."""
    for df in _GENERATIONS.pop(key, []):
        try:
            df.unpersist()
        except Exception:
            pass  # the old frame's session may already be stopped
    _GENERATIONS[key] = []


def register_persisted(key: str, df: DataFrame) -> DataFrame:
    """Record a frame persisted by the CURRENT call under ``key``."""
    _GENERATIONS.setdefault(key, []).append(df)
    return df
