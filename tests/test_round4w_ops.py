"""Round-4w additions: Arrow-IPC source/sink, hive partition pruning,
feature hashing, SAX symbolic words."""
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestFeather:
    def test_roundtrip_preserves_types(self, ray_session, tmp_path):
        """Timestamps, lists and strings survive the IPC roundtrip
        exactly (the fidelity CSV/JSON cannot give)."""
        import ray.data
        from dggrid4py_ray.sources.feather import (read_feather_dir,
                                                   write_feather_dir)

        t = pa.table({
            "i": pa.array(np.arange(500, dtype=np.int64)),
            "ts": pa.array(np.arange(500, dtype=np.int64) * 10**6,
                           pa.timestamp("us")),
            "s": pa.array([f"row{i}" for i in range(500)], pa.string()),
            "v": pa.array([[float(i), float(i + 1)] for i in range(500)],
                          pa.list_(pa.float32()))})
        d = str(tmp_path / "ipc")
        n = write_feather_dir(
            ray.data.from_arrow(t).repartition(5), d)
        assert n == 500
        assert len([f for f in os.listdir(d) if f.endswith(".arrow")]) == 5
        back = read_feather_dir(d).to_pandas().sort_values("i",
                                                           ignore_index=True)
        assert back["i"].tolist() == list(range(500))
        assert back["ts"].tolist() == t["ts"].to_pylist()
        assert back["s"].tolist() == t["s"].to_pylist()
        assert [list(x) for x in back["v"]] == t["v"].to_pylist()

    def test_column_pruning(self, ray_session, tmp_path):
        import ray.data
        from dggrid4py_ray.sources.feather import (read_feather_dir,
                                                   write_feather_dir)

        t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                      "b": pa.array(["x", "y", "z"])})
        d = str(tmp_path / "ipc2")
        write_feather_dir(ray.data.from_arrow(t), d)
        out = read_feather_dir(d, columns=["a"]).to_pandas()
        assert list(out.columns) == ["a"]


class TestFeatureHash:
    def test_mass_conservation_and_layout_invariance(self, ray_session,
                                                     tmp_path):
        """Sum of total_tf equals the corpus token count; n_docs per dim
        is layout-invariant (each doc lives wholly in one batch)."""
        from dggrid4py_ray.pipelines.queries import feature_hash_docs

        rng = np.random.default_rng(2)
        vocab = [f"w{i}" for i in range(200)]
        texts = [" ".join(rng.choice(vocab, rng.integers(3, 30)))
                 for _ in range(300)]
        pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                      "text": texts, "lang": "en", "source": "s",
                      "n_chars": [len(t) for t in texts]}).to_parquet(
            tmp_path / "documents.parquet", index=False)
        out = feature_hash_docs(str(tmp_path)).to_pandas()
        n_tokens = sum(len(t.split(" ")) for t in texts)
        assert out["total_tf"].sum() == n_tokens
        assert (out["n_docs"] <= 300).all()
        assert out["dim"].between(0, 63).all()


class TestSAX:
    def test_monotone_user_gets_0123(self, ray_session, tmp_path):
        """A strictly increasing series with 4+ distinct segment means
        must read '0123'; constant users read '0000'."""
        from dggrid4py_ray.pipelines.queries import sax_words_users

        rows = []
        for i in range(16):                       # user 1: rising
            rows.append((i, 1, i, float(i * 10)))
        for i in range(8):                        # user 2: constant
            rows.append((100 + i, 2, i, 5.0))
        for i in range(12):                       # user 3: falling
            rows.append((200 + i, 3, i, float(-i * 7)))
        df = pd.DataFrame(rows, columns=["event_id", "user_id", "tsn",
                                         "value"])
        df["ts"] = pd.to_datetime(df.pop("tsn") * 10**6, unit="us")
        df["event_type"] = "x"
        df["props"] = ""
        df.to_parquet(tmp_path / "events.parquet", index=False)
        out = sax_words_users(str(tmp_path)).to_pandas()
        got = dict(zip(out["word"], out["n_users"]))
        assert got == {"0123": 1, "0000": 1, "3210": 1}

    def test_short_series_words(self, ray_session, tmp_path):
        """Users with fewer than 4 events produce left-aligned words
        (missing tiles contribute 0 positional weight) — same on both
        engines by construction."""
        from dggrid4py_ray.pipelines.queries import sax_words_users

        rows = [(0, 1, 0, 1.0), (1, 1, 1, 99.0),      # 2 events: tiles 1,2
                (10, 2, 0, 42.0)]                     # 1 event
        df = pd.DataFrame(rows, columns=["event_id", "user_id", "tsn",
                                         "value"])
        df["ts"] = pd.to_datetime(df.pop("tsn") * 10**6, unit="us")
        df["event_type"] = "x"
        df["props"] = ""
        df.to_parquet(tmp_path / "events.parquet", index=False)
        out = sax_words_users(str(tmp_path)).to_pandas()
        got = dict(zip(out["word"], out["n_users"]))
        # user1: lo=1.0 hi=99.0 -> symbols (0, 3) -> 0*1000+3*100 = 0300
        # user2: single segment, hi == lo -> 0000
        assert got == {"0300": 1, "0000": 1}
