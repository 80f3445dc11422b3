"""Round-4u additions: BM25 ranked retrieval, KMV bottom-k intersection
sketch, trigram sequence mining (driver queries bm25_docs /
kmv_intersect_users / trigram_paths_events)."""
import numpy as np
import pyarrow as pa
import pytest


class TestKMV:
    def test_exact_regime(self, ray_session):
        """With fewer than k distinct keys the sketch IS the hash set and
        every estimate is the exact cardinality."""
        import ray.data
        from dggrid4py_ray.stages.sampling import kmv_bottom_k, kmv_estimates

        a = ray.data.from_arrow(pa.table({"key": pa.array(
            list(range(30)) * 3)}))
        b = ray.data.from_arrow(pa.table({"key": pa.array(
            list(range(20, 50)))}))
        sa = kmv_bottom_k(a, "key", k=64)
        sb = kmv_bottom_k(b, "key", k=64)
        assert len(sa) == 30 and len(sb) == 30
        est = kmv_estimates(sa, sb, 64)
        assert est == {"est_a": 30, "est_b": 30, "est_union": 50,
                       "est_intersection": 10}

    def test_parallelism_invariance(self, ray_session):
        """The sketch is a function of the key SET: block layout, row
        order and duplication must not change a single hash."""
        import ray.data
        from dggrid4py_ray.stages.sampling import kmv_bottom_k

        keys = np.arange(5000, dtype=np.int64)
        one = ray.data.from_arrow(pa.table({"key": pa.array(keys)})) \
            .repartition(1)
        many = ray.data.from_arrow(
            pa.table({"key": pa.array(np.concatenate(
                [keys[::-1], keys[::7]]))})).repartition(13)
        s1 = kmv_bottom_k(one, "key", k=128)
        s2 = kmv_bottom_k(many, "key", k=128)
        assert np.array_equal(s1, s2)
        assert len(s1) == 128
        assert np.all(np.diff(s1.astype(np.uint64)) > 0)   # sorted distinct

    def test_estimate_accuracy(self, ray_session):
        """Approximate regime: the KMV estimate of 5k distinct keys at
        k=128 lands within the ~3/sqrt(k) band."""
        import ray.data
        from dggrid4py_ray.stages.sampling import (_kmv_estimate,
                                                   kmv_bottom_k)

        ds = ray.data.from_arrow(pa.table({"key": pa.array(
            np.arange(5000, dtype=np.int64))}))
        sk = kmv_bottom_k(ds, "key", k=128)
        est = _kmv_estimate(sk, 128)
        assert abs(est - 5000) / 5000 < 3.0 / np.sqrt(128)


class TestBM25:
    def _mk(self, ray_session, texts):
        import ray.data
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string())}))

    def test_ranking_laws(self, ray_session):
        """More query-term hits => higher score; absent terms => no row;
        longer documents with the same tf are penalized."""
        from dggrid4py_ray.stages.text import bm25_topk

        docs = self._mk(ray_session, [
            "hash join stream hash",            # 0: most hits
            "hash join filler filler",          # 1
            "hash filler filler filler",        # 2
            "filler filler filler filler",      # 3: no hit -> absent
            "hash filler filler filler filler filler filler filler",  # 4
        ])
        out = bm25_topk(docs, ["hash", "join", "stream"], k=10).to_pandas()
        assert set(out["doc_id"]) == {0, 1, 2, 4}
        ranked = out.sort_values("score_e4", ascending=False)[
            "doc_id"].tolist()
        assert ranked[0] == 0 and ranked[1] == 1
        s = dict(zip(out["doc_id"], out["score_e4"]))
        assert s[2] > s[4]                      # length normalization

    def test_topk_cut_and_tiebreak(self, ray_session):
        """Identical documents tie exactly; the top-k cut keeps the
        lowest doc_ids (score desc, id asc)."""
        from dggrid4py_ray.stages.text import bm25_topk

        docs = self._mk(ray_session, ["hash join"] * 7)
        out = bm25_topk(docs, ["hash", "join"], k=3).to_pandas()
        assert out["doc_id"].tolist() == [0, 1, 2]
        assert out["score_e4"].nunique() == 1

    def test_blockcount_invariance(self, ray_session):
        """df/N/sum_dl partials are integers, so the scores cannot drift
        with the block layout."""
        from dggrid4py_ray.stages.text import bm25_topk

        texts = [f"hash {'x ' * (i % 5)}join stream" for i in range(40)]
        a = bm25_topk(self._mk(ray_session, texts).repartition(1),
                      ["hash", "stream"], k=40).to_pandas()
        b = bm25_topk(self._mk(ray_session, texts).repartition(11),
                      ["hash", "stream"], k=40).to_pandas()
        assert a.values.tolist() == b.values.tolist()


class TestTrigram:
    def test_matches_pandas_reference(self, ray_session):
        """Cross-block trigram extraction equals the per-user pandas
        shift(1)/shift(2) reference on a skewed multi-user log."""
        import pandas as pd
        import ray.data
        from dggrid4py_ray.pipelines.queries import trigram_paths_events

        rng = np.random.default_rng(5)
        n = 4000
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 37, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10**6, n) * 10**6, unit="us"),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": np.zeros(n), "props": [""] * n})
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"), index=False)
            out = trigram_paths_events(d).to_pandas()
        ref = df.sort_values(["user_id", "ts", "event_id"])
        g = ref.groupby("user_id")["event_type"]
        ref = ref.assign(p1=g.shift(1), p2=g.shift(2)).dropna(
            subset=["p1", "p2"])
        exp = (ref.groupby(["p2", "p1", "event_type"]).size()
               .reset_index(name="n")
               .rename(columns={"p2": "t1", "p1": "t2", "event_type": "t3"})
               .sort_values(["n", "t1", "t2", "t3"],
                            ascending=[False, True, True, True])
               .head(10).reset_index(drop=True))
        got = out.reset_index(drop=True)
        assert got[["t1", "t2", "t3"]].values.tolist() == \
            exp[["t1", "t2", "t3"]].values.tolist()
        assert got["n"].tolist() == exp["n"].tolist()
