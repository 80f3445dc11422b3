"""Multimodal (image/audio/video) stages.

Media payloads are opaque ``binary`` columns with typed metadata
(media_type, width/height or sample_rate/duration).  The image/audio codec
libraries are NOT available in this container, so the decode kernels are
STUBBED: ``decoder="null"`` raises NotImplementedError (the real-library
path), ``decoder="fake"`` produces deterministic synthetic arrays so the
Ray-side plumbing — schemas, batch sizing, actor signatures, output layout —
is real and tested end-to-end.

Batch-size discipline for byte-heavy rows (SURVEY §7.4): these stages are
meant to run with small ``batch_size`` (e.g. 16-64) and
``target_max_block_size`` tuned so batch x concurrency fits worker heap;
media bytes are never carried through shuffles — only refs/features.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def fake_media_blob(ref: str, kind: str = "image") -> bytes:
    """Deterministic pseudo-payload for a media_ref (test/bench stand-in)."""
    h = hashlib.blake2b(f"{kind}:{ref}".encode(), digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(h, "big"))
    n = 2048 + int(rng.integers(0, 2048))
    return rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()


class MediaFetcher:
    """map_batches actor: media_ref -> payload bytes + byte size.

    Real deployments would fetch from blob storage here (connection pool in
    __init__); the sandbox uses the deterministic fake store."""

    def __init__(self, ref_col: str = "media_ref", out_col: str = "media_bytes",
                 store: str = "fake"):
        self.ref_col = ref_col
        self.out_col = out_col
        self.store = store

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch[self.ref_col].to_numpy(zero_copy_only=False)
        if self.store == "null":
            raise NotImplementedError("no blob store in this environment")
        blobs = [fake_media_blob(r) if r else b"" for r in refs]
        sizes = np.array([len(b) for b in blobs], dtype=np.int64)
        return (batch.append_column(self.out_col, pa.array(blobs, type=pa.binary()))
                     .append_column("media_size", pa.array(sizes)))


class ImageDecoder:
    """map_batches actor: media_bytes -> (height, width, channels) +
    a small feature vector.

    decoder="pillow" is the real-library path (unavailable here -> raises);
    decoder="fake" derives a deterministic 8x8 luma thumbnail from the bytes
    so downstream feature/resize stages run for real."""

    def __init__(self, bytes_col: str = "media_bytes", decoder: str = "fake",
                 thumb: int = 8):
        if decoder not in ("fake", "pillow"):
            raise ValueError(decoder)
        if decoder == "pillow":
            raise NotImplementedError(
                "image codecs are not installed in this container; "
                "use decoder='fake' (deterministic stub) — the Ray plumbing "
                "(schema/batching/actor lifecycle) is identical")
        self.bytes_col = bytes_col
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_numpy(zero_copy_only=False)
        t = self.thumb
        n = len(blobs)
        thumbs = np.zeros((n, t * t), dtype=np.float32)
        widths = np.zeros(n, dtype=np.int32)
        heights = np.zeros(n, dtype=np.int32)
        for i, b in enumerate(blobs):
            if not b:
                continue
            arr = np.frombuffer(b, dtype=np.uint8)
            widths[i] = 32 + (len(arr) % 97)
            heights[i] = 32 + (len(arr) % 89)
            # deterministic "decode": fold bytes into a t*t grid
            pad = (-len(arr)) % (t * t)
            folded = np.pad(arr, (0, pad)).reshape(-1, t * t).mean(axis=0)
            thumbs[i] = folded.astype(np.float32) / 255.0
        feat = pa.FixedSizeListArray.from_arrays(pa.array(thumbs.reshape(-1)), t * t)
        return (batch.append_column("img_width", pa.array(widths))
                     .append_column("img_height", pa.array(heights))
                     .append_column("img_feature", feat))


class AudioFrameSampler:
    """map_batches actor: media_bytes -> fixed number of 'frame' energy
    samples (decoder stub, same contract as a real resample+frame stage)."""

    def __init__(self, bytes_col: str = "media_bytes", n_frames: int = 16):
        self.bytes_col = bytes_col
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_numpy(zero_copy_only=False)
        k = self.n_frames
        out = np.zeros((len(blobs), k), dtype=np.float32)
        for i, b in enumerate(blobs):
            if not b:
                continue
            arr = np.frombuffer(b, dtype=np.uint8).astype(np.float32)
            pad = (-len(arr)) % k
            out[i] = np.pad(arr, (0, pad)).reshape(k, -1).std(axis=1)
        frames = pa.FixedSizeListArray.from_arrays(pa.array(out.reshape(-1)), k)
        return batch.append_column("audio_frames", frames)


def media_feature_pipeline(ds, kind_col: str = "kind", ref_col: str = "media_ref",
                           batch_size: int = 64, concurrency=None):
    """Span rows -> media features for image/audio spans: fetch (actor pool,
    small batches) -> decode/featurize; media bytes live only inside this
    pipeline segment and are dropped before any shuffle."""
    import pyarrow.compute as pc
    media = ds.map_batches(
        lambda t: t.filter(pc.is_in(t[kind_col],
                                    value_set=pa.array(["image", "audio"]))),
        batch_format="pyarrow")
    fetched = media.map_batches(MediaFetcher, batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=concurrency or (1, 4))
    feat = fetched.map_batches(ImageDecoder, batch_format="pyarrow",
                               batch_size=batch_size,
                               concurrency=concurrency or (1, 4))
    return feat.drop_columns(["media_bytes"])
