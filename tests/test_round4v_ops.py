"""Round-4v additions: KS two-sample scan, item-similarity Jaccard,
mutual information (driver queries ks_value_click_purchase /
item_jaccard_parts / mutual_info_lang_source)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _counts_ds(ray_session, values, na, nb, blocks=7):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "value": pa.array(np.asarray(values, np.float64)),
        "na": pa.array(np.asarray(na, np.int64)),
        "nb": pa.array(np.asarray(nb, np.int64))})).repartition(blocks)


class TestKS:
    def test_matches_scipy_style_reference(self, ray_session):
        """Distributed D equals the brute-force ECDF max on a random
        two-sample draw, independent of block layout."""
        from dggrid4py_ray.stages.relational import ks_two_sample

        rng = np.random.default_rng(3)
        a = rng.normal(0.0, 1.0, 4000)
        b = rng.normal(0.4, 1.3, 3000)
        vals = np.unique(np.concatenate([a, b]))
        na = np.array([np.sum(a == v) for v in vals], np.int64)
        nb = np.array([np.sum(b == v) for v in vals], np.int64)
        for blocks in (1, 11):
            d, ta, tb = ks_two_sample(
                _counts_ds(ray_session, vals, na, nb, blocks),
                "value", "na", "nb")
            assert (ta, tb) == (4000, 3000)
            ca = np.cumsum(na) / 4000.0
            cb = np.cumsum(nb) / 3000.0
            assert d == np.abs(ca - cb).max()

    def test_identical_samples_zero(self, ray_session):
        from dggrid4py_ray.stages.relational import ks_two_sample

        vals = np.arange(100, dtype=np.float64)
        n = np.ones(100, np.int64)
        d, _, _ = ks_two_sample(_counts_ds(ray_session, vals, n, n),
                                "value", "na", "nb")
        assert d == 0.0

    def test_disjoint_samples_one(self, ray_session):
        from dggrid4py_ray.stages.relational import ks_two_sample

        vals = np.arange(200, dtype=np.float64)
        na = (vals < 100).astype(np.int64)
        nb = (vals >= 100).astype(np.int64)
        d, _, _ = ks_two_sample(_counts_ds(ray_session, vals, na, nb),
                                "value", "na", "nb")
        assert d == 1.0

    def test_empty_sample_raises(self, ray_session):
        from dggrid4py_ray.stages.relational import ks_two_sample

        vals = np.arange(10, dtype=np.float64)
        na = np.ones(10, np.int64)
        with pytest.raises(ValueError, match="empty"):
            ks_two_sample(_counts_ds(ray_session, vals, na, 0 * na),
                          "value", "na", "nb")


class TestItemJaccard:
    def test_matches_bruteforce(self, ray_session, tmp_path):
        """Engine top-20 equals a pandas brute-force Jaccard over the
        capped customer universe on a small synthetic market."""
        from dggrid4py_ray.pipelines.queries import item_jaccard_parts

        rng = np.random.default_rng(9)
        n_orders, n_cust = 300, 40
        o_custkey = rng.integers(0, n_cust, n_orders).astype(np.int64)
        orders = pd.DataFrame({
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_custkey": o_custkey})
        rows = []
        for ok in range(n_orders):
            for p in rng.integers(0, 25, rng.integers(1, 5)):
                rows.append((ok, int(p)))
        li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
        orders.to_parquet(tmp_path / "orders.parquet", index=False)
        li.to_parquet(tmp_path / "lineitem.parquet", index=False)

        got = item_jaccard_parts(str(tmp_path)).to_pandas()

        cp = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        cp = cp[["o_custkey", "l_partkey"]].drop_duplicates()
        deg = cp.groupby("o_custkey").size()
        keep = deg[(deg >= 2) & (deg <= 50)].index
        cp = cp[cp["o_custkey"].isin(keep)]
        sets = cp.groupby("l_partkey")["o_custkey"].agg(set)
        parts = sorted(sets.index)
        recs = []
        for i, a in enumerate(parts):
            for b in parts[i + 1:]:
                nb_ = len(sets[a] & sets[b])
                if nb_:
                    jac = int(np.floor(
                        nb_ / (len(sets[a]) + len(sets[b]) - nb_)
                        * 1e6 + 0.5))
                    recs.append((a, b, nb_, jac))
        exp = pd.DataFrame(
            recs, columns=["part_a", "part_b", "n_both", "jaccard_e6"]) \
            .sort_values(["jaccard_e6", "part_a", "part_b"],
                         ascending=[False, True, True]).head(20)
        assert got.values.tolist() == exp.values.tolist()


class TestMutualInfo:
    def test_independent_vs_dependent(self, ray_session, tmp_path):
        """MI ~ 0 for an independent product grid; MI = H for a
        deterministic lang->source mapping."""
        from dggrid4py_ray.pipelines.queries import mutual_info_lang_source

        langs = ["en", "de", "fr"]
        rows = [(i, "x", langs[i % 3], f"s{(i // 3) % 4}", 1)
                for i in range(240)]
        pd.DataFrame(rows, columns=[
            "doc_id", "text", "lang", "source", "n_chars"]).to_parquet(
            tmp_path / "documents.parquet", index=False)
        out = mutual_info_lang_source(str(tmp_path)).to_pandas()
        assert out["mi_e6"][0] == 0                      # independent
        assert out["h_lang_e6"][0] == int(np.floor(
            np.log(3) * 1e6 + 0.5))

        rows = [(i, "x", langs[i % 3], f"s{i % 3}", 1) for i in range(240)]
        pd.DataFrame(rows, columns=[
            "doc_id", "text", "lang", "source", "n_chars"]).to_parquet(
            tmp_path / "documents.parquet", index=False)
        out = mutual_info_lang_source(str(tmp_path)).to_pandas()
        assert out["mi_e6"][0] == out["h_lang_e6"][0]    # MI = H(lang)
