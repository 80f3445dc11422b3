"""Record linkage: blocked candidate generation + Fellegi-Sunter-style
field-agreement scoring.

The classic entity-resolution shape (Fellegi & Sunter 1969; Christen
2012): a cheap BLOCKING key bounds the quadratic candidate space (the
way LSH bands bound minhash dedup), then every within-block pair gets an
integer agreement score — the sum of per-field match weights (integer
log-odds surrogates) — and pairs at or above a threshold survive to a
downstream clustering/merge step (``stages/components.keep_canonical``).

Scale shape: ONE groupby shuffle on the block key (rows carry only id +
the compared fields, never full payloads), per-block pair generation and
scoring fully vectorized (triu index arrays + numpy equality over
factorized fields — no per-pair Python).  Blocks above ``max_block``
are truncated to their ``max_block`` smallest ids — the documented
recall cap shared with the dedup family (an oversize block means the
blocking key is too weak to be informative).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def linkage_score_pairs(ds: ray.data.Dataset, block_col: str,
                        id_col: str, field_weights: dict[str, int],
                        threshold: int, max_block: int = 1024
                        ) -> ray.data.Dataset:
    """All within-block pairs (id_a < id_b) whose summed field-agreement
    score reaches ``threshold``.  ``field_weights`` maps column name ->
    integer weight added when the two rows agree exactly on that column
    (nulls never agree, SQL ``=`` semantics).  Output: (id_a, id_b,
    score int64)."""
    fields = list(field_weights)
    proj = ds.map_batches(
        lambda t: pa.table({"_bk": t[block_col], id_col: t[id_col],
                            **{f: t[f] for f in fields}}),
        batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, ignore_index=True)
        if len(g) > max_block:
            g = g.iloc[:max_block]
        m = len(g)
        if m < 2:
            return pd.DataFrame({"id_a": np.array([], np.int64),
                                 "id_b": np.array([], np.int64),
                                 "score": np.array([], np.int64)})
        ai, bi = np.triu_indices(m, k=1)
        score = np.zeros(len(ai), np.int64)
        for f, w in field_weights.items():
            codes, _ = pd.factorize(g[f], use_na_sentinel=True)
            eq = (codes[ai] == codes[bi]) & (codes[ai] >= 0)
            score += np.int64(w) * eq
        keep = score >= threshold
        ids = g[id_col].to_numpy()
        return pd.DataFrame({"id_a": ids[ai[keep]],
                             "id_b": ids[bi[keep]],
                             "score": score[keep]})

    return proj.groupby("_bk").map_groups(pairs, batch_format="pandas")
