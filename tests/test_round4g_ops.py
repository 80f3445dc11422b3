"""Round-4g operator tests: bigram-LM quality scoring and the four
TPC-H closing shapes' kernels (packed argmin, exact share threshold)."""

import math

import numpy as np
import pandas as pd
import ray.data


def _brute_lm(texts):
    """Reference add-one bigram LM self-scoring (pure python)."""
    toks = [t.split(" ") for t in texts]
    vocab = {w for ws in toks for w in ws}
    from collections import Counter
    bi = Counter((ws[i], ws[i + 1]) for ws in toks
                 for i in range(len(ws) - 1))
    cp = Counter()
    for (w1, _), c in bi.items():
        cp[w1] += c
    nll = {g: round(math.log((cp[g[0]] + len(vocab)) / (c + 1)) * 1e6)
           for g, c in bi.items()}
    out = []
    for di, ws in enumerate(toks):
        grams = [(ws[i], ws[i + 1]) for i in range(len(ws) - 1)]
        if grams:
            out.append({"doc_id": di, "n_bigrams": len(grams),
                        "nll_sum_e6": sum(nll[g] for g in grams)})
    return pd.DataFrame(out)


def test_bigram_lm_matches_bruteforce():
    from dggrid4py_ray.stages.text import bigram_lm_score

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(words, rng.integers(2, 30)))
             for _ in range(200)]
    texts += ["solo"]          # 1-token doc: no bigram evidence, omitted
    texts += ["alpha alpha"]   # repeated-token bigram
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ).repartition(9)
    out = (bigram_lm_score(ds).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    ref = _brute_lm(texts)
    np.testing.assert_array_equal(out["doc_id"], ref["doc_id"])
    np.testing.assert_array_equal(out["n_bigrams"], ref["n_bigrams"])
    np.testing.assert_array_equal(out["nll_sum_e6"], ref["nll_sum_e6"])
    assert 200 not in set(out["doc_id"])  # the solo doc is omitted


def test_bigram_lm_parallelism_invariant():
    from dggrid4py_ray.stages.text import bigram_lm_score

    rng = np.random.default_rng(11)
    words = ["a", "b", "c", "d"]
    texts = [" ".join(rng.choice(words, rng.integers(2, 12)))
             for _ in range(300)]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    outs = []
    for parts in (1, 13):
        ds = ray.data.from_pandas(df).repartition(parts)
        outs.append(bigram_lm_score(ds).to_pandas()
                    .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
