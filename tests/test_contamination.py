"""Contamination detection, repetition signals, document frequency
(stages/contamination.py, stages/text.py round-4 additions) vs pure
Python/pandas references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _py_grams(text, n):
    w = text.split(" ")
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(12)
    vocab = [f"w{i}" for i in range(40)]
    texts, ids = [], []
    for i in range(300):
        L = int(rng.integers(1, 80))
        texts.append(" ".join(rng.choice(vocab, L)))
        ids.append(i)
    # oddities: doubled space (empty token), short docs, repeated text
    texts[7] = "a  b c a  b"
    texts[11] = "x"
    texts[13] = "y z"
    texts[17] = texts[3]
    return pd.DataFrame({"doc_id": ids, "text": texts})


def test_gram_hashes_match_string_grams(corpus):
    from dggrid4py_ray.stages.contamination import (_gram_hashes,
                                                    _space_tokens)

    arr = pa.array(corpus["text"].tolist())
    th, off, _ = _space_tokens(arr)
    g, di, per_doc = _gram_hashes(th, off, 3)

    # per-doc counts match the string reference
    want_counts = [max(len(t.split(" ")) - 2, 0) for t in corpus["text"]]
    np.testing.assert_array_equal(per_doc, want_counts)
    # hash equality == string equality (across the whole corpus)
    all_strs = []
    for t in corpus["text"]:
        all_strs.extend(_py_grams(t, 3))
    s2h = {}
    for s, h in zip(all_strs, g.tolist()):
        assert s2h.setdefault(s, h) == h, "same gram, different hash"
    # distinct strings -> distinct hashes (no collisions at this scale)
    assert len(set(s2h.values())) == len(s2h)


def test_contamination_check(ray_session, corpus):
    from dggrid4py_ray.stages.contamination import (benchmark_gram_set,
                                                    contamination_check)

    bench_df = corpus[corpus.doc_id % 50 == 0]
    rest_df = corpus[corpus.doc_id % 50 != 0]
    bench = ray_session.data.from_pandas(bench_df).repartition(3)
    rest = ray_session.data.from_pandas(rest_df).repartition(5)

    grams = benchmark_gram_set(bench, n=3)
    got = (contamination_check(rest, grams, n=3).to_pandas()
           .sort_values("doc_id", ignore_index=True))

    bench_set = set()
    for t in bench_df["text"]:
        bench_set.update(_py_grams(t, 3))
    want = []
    for _, r in rest_df.iterrows():
        gs = _py_grams(r.text, 3)
        if gs:
            want.append((r.doc_id, len(gs),
                         sum(1 for s in gs if s in bench_set)))
    want = pd.DataFrame(want, columns=["doc_id", "n_grams", "n_hits"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # doc 17 duplicates doc 3's text: if 3 is in neither bench nor rest…
    assert (got["n_hits"] > 0).any()  # planted %50 overlap exists


def test_repetition_scorer(ray_session, corpus):
    from dggrid4py_ray.stages.text import RepetitionScorer

    ds = ray_session.data.from_pandas(corpus).repartition(4)
    got = (ds.map_batches(RepetitionScorer,
                          fn_constructor_args=("text", "doc_id", 2),
                          batch_format="pyarrow", concurrency=(1, 2))
           .to_pandas().sort_values("doc_id", ignore_index=True))

    want = []
    for _, r in corpus.iterrows():
        toks = r.text.split(" ")
        gs = _py_grams(r.text, 2)
        if not gs:
            continue
        from collections import Counter
        want.append((r.doc_id, len(toks), len(gs), len(gs) - len(set(gs)),
                     Counter(toks).most_common(1)[0][1]))
    want = pd.DataFrame(want, columns=["doc_id", "n_tokens", "n_grams",
                                       "n_dup_grams", "top_token_count"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_token_document_frequency(ray_session, corpus):
    from dggrid4py_ray.stages.text import token_document_frequency

    ds = ray_session.data.from_pandas(corpus).repartition(4)
    got = (token_document_frequency(ds).to_pandas()
           .sort_values("tok", ignore_index=True))

    rows = []
    for _, r in corpus.iterrows():
        for t in r.text.split(" "):
            rows.append((r.doc_id, t))
    flat = pd.DataFrame(rows, columns=["d", "tok"])
    want = (flat.groupby("tok")["d"].agg(df="nunique", cf="size")
            .reset_index().sort_values("tok", ignore_index=True))
    pd.testing.assert_frame_equal(got[["tok", "df", "cf"]],
                                  want[["tok", "df", "cf"]],
                                  check_dtype=False)
