"""Round-4t additions: slippy tiles, OD matrix, DBSCAN-style cell clustering."""
import math

import numpy as np
import pyarrow as pa
import pytest

from dggrid4py_ray.stages.tiles import (MERCATOR_LAT_LIMIT, quadkeys,
                                        slippy_encode)


def _ref_tile(lon: float, lat: float, z: int):
    """Scalar reference implementation (OSM wiki formula)."""
    lat = max(-MERCATOR_LAT_LIMIT, min(MERCATOR_LAT_LIMIT, lat))
    n = 2.0 ** z
    xt = math.floor((lon + 180.0) / 360.0 * n)
    lr = math.radians(lat)
    yt = math.floor((1.0 - math.log(math.tan(lr) + 1.0 / math.cos(lr))
                     / math.pi) / 2.0 * n)
    hi = 2 ** z - 1
    return min(max(xt, 0), hi), min(max(yt, 0), hi)


class TestSlippy:
    def test_matches_scalar_reference(self):
        rng = np.random.default_rng(7)
        lon = rng.uniform(-180, 180, 2000)
        lat = rng.uniform(-90, 90, 2000)
        for z in (0, 3, 8, 15):
            xt, yt = slippy_encode(lon, lat, z)
            for i in range(0, 2000, 97):
                assert (xt[i], yt[i]) == _ref_tile(lon[i], lat[i], z)

    def test_clamps(self):
        xt, yt = slippy_encode(np.array([-180.0, 179.999, 0.0]),
                               np.array([90.0, -90.0, 0.0]), 8)
        assert xt.min() >= 0 and xt.max() <= 255
        assert yt.min() >= 0 and yt.max() <= 255
        assert yt[0] == 0 and yt[1] == 255     # poles clamp to edge rows

    def test_zoom_prefix_law(self):
        """Quadkey at zoom z is a prefix of the quadkey at zoom z+1."""
        rng = np.random.default_rng(11)
        lon = rng.uniform(-180, 180, 500)
        lat = rng.uniform(-85, 85, 500)
        x8, y8 = slippy_encode(lon, lat, 8)
        x9, y9 = slippy_encode(lon, lat, 9)
        q8 = quadkeys(x8, y8, 8).to_pylist()
        q9 = quadkeys(x9, y9, 9).to_pylist()
        assert all(b.startswith(a) for a, b in zip(q8, q9))
        assert all(len(a) == 8 and set(a) <= set("0123") for a in q8)

    def test_quadkey_bing_example(self):
        # Bing documentation example: tile (3, 5) at level 3 -> "213"
        q = quadkeys(np.array([3]), np.array([5]), 3).to_pylist()
        assert q == ["213"]

    def test_quadkey_empty(self):
        assert quadkeys(np.array([], np.int64),
                        np.array([], np.int64), 8).to_pylist() == []

    def test_zoom_validation(self):
        with pytest.raises(ValueError):
            slippy_encode(np.array([0.0]), np.array([0.0]), 31)


class TestDbscanCells:
    def test_matches_union_find(self, ray_session):
        """Engine clusters on sf0.001 == driver-side union-find clusters."""
        import duckdb

        from dggrid4py_ray.pipelines.queries import dbscan_cells_events

        sf = "/root/testdata/sf0.01"
        got = dbscan_cells_events(sf).to_pandas().sort_values(
            "cell", ignore_index=True)

        df = duckdb.sql(f"""
            SELECT ((event_id*104729)%18000//1000)*36
                   + ((event_id*7919)%36000//1000) AS cell, COUNT(*) n
            FROM '{sf}/events.parquet' GROUP BY 1 HAVING COUNT(*) >= 16
        """).df()
        cells = set(df["cell"].astype(int))
        parent = {c: c for c in cells}

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for c in cells:
            x, y = c % 36, c // 36
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    nx, ny = x + dx, y + dy
                    if (dx or dy) and 0 <= nx < 36 and 0 <= ny < 18:
                        nb = ny * 36 + nx
                        if nb in cells:
                            ra, rb = find(c), find(nb)
                            if ra != rb:
                                parent[max(ra, rb)] = min(ra, rb)
        want = {c: min(m for m in cells if find(m) == find(c))
                for c in cells}
        assert len(got) == len(cells)
        got_map = dict(zip(got["cell"], got["cluster"]))
        assert got_map == want

    def test_empty_core_typed(self, ray_session, tmp_path):
        """No core cells -> typed empty result, no join crash."""
        import pyarrow.parquet as pq

        from dggrid4py_ray.pipelines.queries import dbscan_cells_events

        pq.write_table(pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([0, 0, 0], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_type": pa.array(["a"] * 3),
            "value": pa.array([1.0] * 3),
            "props": pa.array(["{}"] * 3)}),
            tmp_path / "events.parquet")
        out = dbscan_cells_events(str(tmp_path))
        assert out.count() == 0
        # NOTE: Dataset.to_pandas() drops columns on empty datasets (Ray
        # quirk); the schema itself is typed and complete.
        assert out.schema().names == ["cell", "x", "y", "n", "cluster"]


class TestGeohash:
    def test_published_vectors(self):
        from dggrid4py_ray.stages.tiles import geohash_encode
        assert geohash_encode(np.array([-5.60302734375]),
                              np.array([42.60498046875]), 5)[0] == "ezs42"
        assert geohash_encode(np.array([-74.0060]),
                              np.array([40.7128]), 7)[0] == "dr5regw"
        assert geohash_encode(np.array([13.361389]),
                              np.array([38.115556]), 8)[0] == "sqc8b49r"

    def test_prefix_law(self):
        from dggrid4py_ray.stages.tiles import geohash_encode
        rng = np.random.default_rng(3)
        lon = rng.uniform(-180, 180, 300)
        lat = rng.uniform(-90, 90, 300)
        g4 = geohash_encode(lon, lat, 4)
        g8 = geohash_encode(lon, lat, 8)
        # geohash truncation = spatial containment only when the shorter
        # hash uses a bit count that tiles the longer one's bisection
        # sequence — true for any prefix length (each char refines).
        assert all(b.startswith(a) for a, b in zip(g4, g8))

    def test_edges_and_validation(self):
        from dggrid4py_ray.stages.tiles import geohash_encode
        out = geohash_encode(np.array([-180.0, 180.0, 0.0]),
                             np.array([-90.0, 90.0, 0.0]), 6)
        assert len(out) == 3 and all(len(s) == 6 for s in out)
        assert geohash_encode(np.array([]), np.array([]), 6).size == 0
        with pytest.raises(ValueError):
            geohash_encode(np.array([0.0]), np.array([0.0]), 0)


class TestHeatmapSmooth:
    def test_interior_mass_conservation(self, ray_session):
        """Away from borders every point contributes exactly 16 units."""
        import duckdb

        from dggrid4py_ray.pipelines.queries import heatmap_smooth_events

        sf = "/root/testdata/sf0.001"
        got = heatmap_smooth_events(sf).to_pandas()
        n_border = duckdb.sql(f"""
            SELECT COUNT(*) FROM (
              SELECT ((event_id*7919)%36000//100) x,
                     ((event_id*104729)%18000//100) y
              FROM '{sf}/events.parquet')
            WHERE x IN (0, 359) OR y IN (0, 179)""").fetchone()[0]
        n_events = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf}/events.parquet'").fetchone()[0]
        total = got["wsum"].sum()
        assert total <= 16 * n_events
        assert total >= 16 * (n_events - n_border)  # only border cells clip
        if n_border == 0:
            assert total == 16 * n_events


class TestInheritMediaCells:
    def _mk(self, docs):
        """docs: list of list[(kind, text)] -> spans-table Dataset."""
        import ray

        spans = [[{"kind": k, "text": t, "media_ref": "", "offset": i}
                  for i, (k, t) in enumerate(d)] for d in docs]
        t = pa.table({
            "doc_id": pa.array([f"d{i}" for i in range(len(docs))]),
            "spans": pa.array(spans, pa.list_(pa.struct(
                [("kind", pa.string()), ("text", pa.string()),
                 ("media_ref", pa.string()), ("offset", pa.int32())])))})
        return ray.data.from_arrow(t)

    def test_inheritance_rule(self, ray_session):
        from dggrid4py_ray.stages.spans import inherit_media_cells

        ds = self._mk([
            [("geo", "10.0 50.0"), ("image", "x"), ("text", "hi"),
             ("geo", "-70.0 -30.0"), ("audio", "y")],
            [("image", "orphan"), ("geo", "0.0 0.0"), ("image", "z")],
            [("text", "no geo at all"), ("audio", "dropped")],
        ])
        out = inherit_media_cells(ds, resolution=1).to_pandas()
        out = out.sort_values(["doc_id", "span_idx"], ignore_index=True)
        # doc0: image@1 inherits geo@0; audio@4 inherits geo@3 (not geo@0)
        d0 = out[out.doc_id == "d0"]
        assert list(d0.span_idx) == [1, 4]
        from dggrid4py_ray.config import dgselect
        from dggrid4py_ray.stages.encode import grid_for
        import numpy as np
        g = grid_for(dgselect("IGEO7", resolution=1))
        c1 = int(g.encode(np.array([10.0]), np.array([50.0]), 1)[0])
        c2 = int(g.encode(np.array([-70.0]), np.array([-30.0]), 1)[0])
        assert list(d0.cell_id) == [c1, c2]
        # doc1: the orphan media BEFORE any geo span is dropped
        d1 = out[out.doc_id == "d1"]
        assert list(d1.span_idx) == [2]
        # doc2: no geo spans -> nothing emitted
        assert (out.doc_id == "d2").sum() == 0

    def test_zero_span_doc(self, ray_session):
        from dggrid4py_ray.stages.spans import inherit_media_cells

        ds = self._mk([[], [("geo", "1.0 2.0"), ("image", "i")]])
        out = inherit_media_cells(ds, resolution=1).to_pandas()
        assert list(out.doc_id) == ["d1"]


class TestBatchD:
    def test_markov_rows_normalize(self, ray_session):
        from dggrid4py_ray.pipelines.queries import markov_transitions_events
        df = markov_transitions_events("/root/testdata/sf0.001").to_pandas()
        sums = df.groupby("o_cell")["p_e6"].sum()
        # each origin's probabilities sum to 1e6 up to per-row rounding
        assert ((sums - 1000000).abs() <= df.groupby("o_cell").size()).all()

    def test_mean_location_dateline(self, ray_session, tmp_path):
        """Two pings straddling the dateline average to lon ~180, not 0."""
        import pyarrow.parquet as pq

        from dggrid4py_ray.pipelines.queries import mean_location_by_user

        # event_id e: lon = (e*7919)%36000/100-180.  Find ids mapping near
        # +179.5 and -179.5 at the same lat band is fiddly — instead check
        # the engine's math directly via the oracle formula equivalence on
        # real data, plus the unit-vector wrap law on a synthetic pair.
        eids = []
        for e in range(1, 200000):
            lon = ((e * 7919) % 36000) / 100.0 - 180.0
            if 179.0 < lon < 180.0 or -180.0 < lon < -179.0:
                eids.append((e, lon))
            if len(eids) >= 2 and eids[0][1] * eids[-1][1] < 0:
                break
        ids = [eids[0][0], eids[-1][0]]
        pq.write_table(pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array([0, 1], pa.timestamp("us")),
            "user_id": pa.array([7, 7], pa.int64()),
            "event_type": pa.array(["a", "a"]),
            "value": pa.array([1.0, 1.0]),
            "props": pa.array(["{}", "{}"])}),
            tmp_path / "events.parquet")
        df = mean_location_by_user(str(tmp_path)).to_pandas()
        assert abs(df["mean_lon_e6"].iloc[0]) > 178_000_000  # wraps to ±180

    def test_hotspot_hot_beats_cold(self, ray_session):
        from dggrid4py_ray.pipelines.queries import hotspot_gi_events
        df = hotspot_gi_events("/root/testdata/sf0.01").to_pandas()
        # densest window must be a significant hotspot; all-emitted mean > 0
        assert df["gi_z_e6"].max() > 1_000_000   # z > 1 somewhere
        assert len(df) == 53615                  # occupied set + halo


class TestBatchE:
    def test_colocation_synthetic(self, ray_session, tmp_path):
        """Two users sharing a region on 3 days -> one pair with n_co=3."""
        import pyarrow.parquet as pq

        from dggrid4py_ray.pipelines.queries import colocation_pairs_events

        # same event_id -> same region; vary day via ts
        US_DAY = 86400000000
        rows = []
        for day in range(3):
            for uid in (1, 2):
                rows.append((100, day * US_DAY + uid, uid))
        # a third user co-located only once -> filtered by n_co >= 2
        rows.append((100, 0 * US_DAY + 99, 3))
        eid, ts, uid = zip(*rows)
        pq.write_table(pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(["a"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows))}),
            tmp_path / "events.parquet")
        df = colocation_pairs_events(str(tmp_path)).to_pandas()
        assert len(df) == 1
        assert (df.user_a.iloc[0], df.user_b.iloc[0], df.n_co.iloc[0]) \
            == (1, 2, 3)

    def test_rog_single_location_is_zero(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from dggrid4py_ray.pipelines.queries import radius_of_gyration_users

        pq.write_table(pa.table({
            "event_id": pa.array([42, 42, 42], pa.int64()),
            "ts": pa.array([0, 1, 2], pa.timestamp("us")),
            "user_id": pa.array([5, 5, 5], pa.int64()),
            "event_type": pa.array(["a"] * 3),
            "value": pa.array([1.0] * 3),
            "props": pa.array(["{}"] * 3)}),
            tmp_path / "events.parquet")
        df = radius_of_gyration_users(str(tmp_path)).to_pandas()
        assert list(df.rog_km_e3) == [0] and list(df.n_events) == [3]


class TestBatchF:
    def test_readability_empty_text_guard(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from dggrid4py_ray.pipelines.queries import readability_docs

        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["", "the cat sat."]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([0, 12], pa.int64())}),
            tmp_path / "documents.parquet")
        df = readability_docs(str(tmp_path)).to_pandas()
        assert len(df) == 2 and np.isfinite(df.flesch_e6).all()
        assert df[df.doc_id == 1].n_words.iloc[0] == 0

    def test_burstiness_regular_vs_bursty(self, ray_session, tmp_path):
        """Perfectly regular gaps -> B = -1; bursty gaps -> B > -1."""
        import pyarrow.parquet as pq

        from dggrid4py_ray.pipelines.queries import burstiness_by_user

        reg = [(1, i * 1000000) for i in range(5)]          # equal gaps
        bur = [(2, t) for t in [0, 1, 2, 3, 50_000_000]]    # one huge gap
        rows = reg + bur
        pq.write_table(pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([t for _, t in rows], pa.timestamp("us")),
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "event_type": pa.array(["a"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows))}),
            tmp_path / "events.parquet")
        df = burstiness_by_user(str(tmp_path)).to_pandas() \
            .set_index("user_id")
        assert df.loc[1, "burstiness_e6"] == -1000000
        assert df.loc[2, "burstiness_e6"] > 0   # dominated by the outlier
