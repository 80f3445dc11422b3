"""Round-4x additions: Ripley's K point-pattern statistic, integer-exact
model calibration curve."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestRipleyK:
    def test_clustered_exceeds_uniformish(self, ray_session, tmp_path):
        """K(r) through the engine equals the brute-force pair count, and
        the area normalization matches the closed form."""
        from dggrid4py_ray.pipelines.queries import ripley_k_events

        # event_id controls the point positions (the derived-coordinate
        # law); take ids divisible by 8 so the subsample is the whole set
        ids = np.arange(0, 2400, 8, dtype=np.int64)
        df = pd.DataFrame({
            "event_id": ids,
            "ts": pd.to_datetime(ids * 10**6, unit="us"),
            "user_id": ids % 7, "event_type": "x",
            "value": np.zeros(len(ids)), "props": [""] * len(ids)})
        df.to_parquet(tmp_path / "events.parquet", index=False)
        out = ripley_k_events(str(tmp_path)).to_pandas()
        assert out["r_km"].tolist() == [250, 500, 1000]
        assert (out["n_pairs"].diff().dropna() >= 0).all()  # cumulative

        lon = ((ids * 7919) % 36000) / 100.0 - 180.0
        lat = ((ids * 104729) % 18000) / 100.0 - 90.0
        la, lo = np.radians(lat), np.radians(lon)
        h = (np.sin((la[None, :] - la[:, None]) / 2) ** 2
             + np.cos(la[:, None]) * np.cos(la[None, :])
             * np.sin((lo[None, :] - lo[:, None]) / 2) ** 2)
        d = 2 * 6371.0 * np.arcsin(np.sqrt(np.clip(h, 0, 1)))
        np.fill_diagonal(d, np.inf)
        n = len(ids)
        for r, npairs, k in out.itertuples(index=False):
            exp = int((d <= r).sum())
            assert npairs == exp
            area = 4.0 * np.pi * 6371.0 ** 2
            assert k == int(np.floor(area * exp / (n * (n - 1)) + 0.5))


class TestCalibration:
    def test_integer_exactness_and_ntile_law(self, ray_session, tmp_path):
        """Per-decile sums equal the brute-force integer dot products;
        decile sizes follow the SQL NTILE remainder-first law."""
        from dggrid4py_ray.pipelines.queries import calibration_embs

        rng = np.random.default_rng(4)
        n, dim = 203, 64
        emb = rng.normal(size=(n, dim)).astype(np.float32)
        label = (rng.random(n) < 0.3).astype(np.int32)
        pa_tbl = pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(map(float, row)) for row in emb],
                                  pa.list_(pa.float32())),
            "label": pa.array(label, pa.int32())})
        import pyarrow.parquet as pq
        pq.write_table(pa_tbl, tmp_path / "embeddings.parquet")
        out = calibration_embs(str(tmp_path)).to_pandas()

        x = emb.astype(np.float64) * 1e6
        xi = (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)
        w = ((np.arange(dim) * 37) % 13 - 6).astype(np.int64)
        score = (xi * w[None, :]).sum(axis=1)
        order = np.lexsort((np.arange(n), score))
        # NTILE(10): first n%10 tiles get ceil(n/10)
        sizes = np.full(10, n // 10)
        sizes[: n % 10] += 1
        assert out["n"].tolist() == sizes.tolist()
        pos = 0
        for dec in range(10):
            idx = order[pos: pos + sizes[dec]]
            assert out["sum_score"][dec] == int(score[idx].sum())
            assert out["sum_label"][dec] == int(label[idx].sum())
            pos += sizes[dec]
        # low deciles hold the lowest scores
        assert out["sum_score"].is_monotonic_increasing
