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


def test_bigram_lm_nul_token_no_collision():
    """A literal \\x00 token must not collide with the unigram tag rows
    (review finding: the old in-band sentinel corrupted counts)."""
    from dggrid4py_ray.stages.text import bigram_lm_score

    texts = ["a \x00 b", "a b a b", "\x00 \x00"]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": texts}))
    out = (bigram_lm_score(ds).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    ref = _brute_lm(texts)
    np.testing.assert_array_equal(out["nll_sum_e6"], ref["nll_sum_e6"])


def test_pivot_counts_ignores_out_of_set_keys():
    from dggrid4py_ray.stages.relational import pivot_counts

    df = pd.DataFrame({"k": [1, 1, 2, 3], "c": ["x", "y", "y", "z"]})
    out = (pivot_counts(ray.data.from_pandas(df).repartition(2),
                        "k", "c", ["x", "y"], prefix="")
           .to_pandas().sort_values("k", ignore_index=True))
    # key 3 has only out-of-set rows -> no all-zero row
    assert list(out["k"]) == [1, 2]
    assert list(out["x"]) == [1, 0] and list(out["y"]) == [1, 1]


def test_grouped_reduce_presorted_matches_sorted():
    from dggrid4py_ray.stages.groupagg import grouped_reduce

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.integers(0, 50, 4000),
                       "v": rng.integers(0, 1000, 4000).astype(np.int64)})
    srt = df.sort_values(["g", "v"], ignore_index=True)
    ds = ray.data.from_pandas(srt).repartition(11)   # loses order
    # re-sort inside Ray so blocks tile the (g, v) order, then fold
    # presorted on the sorted dataset
    out = (grouped_reduce(ds.sort(["g", "v"]), "g",
                          {"v": "mx"}, how="max", presorted=True)
           .to_pandas().sort_values("g", ignore_index=True))
    ref = df.groupby("g")["v"].max().reset_index(name="mx")
    np.testing.assert_array_equal(out["g"], ref["g"])
    np.testing.assert_array_equal(out["mx"], ref["mx"])


def test_group_ewma_matches_sequential_scan():
    from dggrid4py_ray.stages.window import group_ewma

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame({"g": rng.integers(0, 80, n),
                       "o": np.arange(n),
                       "v": rng.normal(0, 10, n)})
    out = (group_ewma(ray.data.from_pandas(df).repartition(9),
                      "g", ["o"], "v", alpha=0.25)
           .to_pandas().sort_values("g", ignore_index=True))

    def seq(vals, a=0.25):
        y = vals[0]
        for v in vals[1:]:
            y = a * v + (1 - a) * y
        return y

    ref = (df.sort_values(["g", "o"]).groupby("g")["v"]
           .apply(lambda s: seq(s.to_numpy())).reset_index(name="ewma"))
    np.testing.assert_allclose(out["ewma"], ref["ewma"], rtol=1e-9)
