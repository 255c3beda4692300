"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` Arrow columns with sidecar
metadata columns; the decode / feature-extract / resize / frame-sample
steps are actor-pool ``map_batches`` stages. The actual codec libraries
(PIL/ffmpeg/torchaudio) are NOT in this container, so the decode step is
STUBBED: with ``fake=True`` it produces a deterministic fake decode
(seeded by a content hash) so the Ray-side plumbing — schema, batch
sizing, actor signature, output layout — is real and tested; with
``fake=False`` it raises ``NotImplementedError`` at the exact seam where
a codec would plug in.

Batch-size note for the 100 TB regime: binary payload rows are wide —
these stages are meant to run with small ``batch_size`` (32–256) and
``DataContext.target_max_block_size`` raised so blocks are not split
absurdly small (ray_guide pitfalls).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raykg.util import hash_strings

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": np.arange(n, dtype=np.int64),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.integers(0, 256, size=int(rng.integers(64, 512))).astype(np.uint8).tobytes() for _ in range(n)],
        "mime": ["application/octet-stream"] * n,
        "width": np.where(np.arange(n) % 3 == 0, 64, -1).astype(np.int32),
        "height": np.where(np.arange(n) % 3 == 0, 48, -1).astype(np.int32),
        "duration_ms": np.where(np.arange(n) % 3 != 0, 1000, -1).astype(np.int32),
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeStage:
    """Actor-pool stage: payload -> decoded feature columns.

    ``fake=True``: deterministic pseudo-decode (feature vector = seeded
    projection of a payload hash). ``fake=False``: the seam where a real
    codec (PIL.Image.open / soundfile / av) would be called.
    """

    def __init__(self, fake: bool = True, feat_dim: int = 8):
        self.fake = fake
        self.feat_dim = feat_dim

    def _decode_one(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real media decoding requires codec libraries not present "
                "in this environment; run with fake=True for plumbing"
            )
        h = int(hash_strings([payload[:64].hex() + kind])[0])
        rng = np.random.default_rng(h % (1 << 32))
        return rng.standard_normal(self.feat_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        feats = np.stack(
            [self._decode_one(p, k) for p, k in zip(payloads, kinds)]
        )
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), self.feat_dim
        )
        return batch.drop_columns(["payload"]).append_column("features", col)


class ResizeStage:
    """Image resize plumbing: rewrites width/height metadata and (in a
    real deployment) the payload; fake mode keeps payload bytes."""

    def __init__(self, width: int = 32, height: int = 32, fake: bool = True):
        if not fake:
            raise NotImplementedError("real resize needs an image codec")
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        is_img = pa.compute.equal(batch.column("kind"), "image")
        w = np.where(is_img.to_numpy(zero_copy_only=False),
                     self.width, batch.column("width").to_numpy(zero_copy_only=False))
        h = np.where(is_img.to_numpy(zero_copy_only=False),
                     self.height, batch.column("height").to_numpy(zero_copy_only=False))
        batch = batch.drop_columns(["width", "height"])
        batch = batch.append_column("width", pa.array(w.astype(np.int32)))
        return batch.append_column("height", pa.array(h.astype(np.int32)))


class FrameSampleStage:
    """Video frame sampling plumbing: one output row per sampled frame
    (flat_map-shaped via map_batches), metadata carried through."""

    def __init__(self, every_ms: int = 250, fake: bool = True):
        if not fake:
            raise NotImplementedError("real frame sampling needs a video codec")
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_idx, ts_ms = [], [], []
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        for mid, kind, dur in zip(ids, kinds, durs):
            if kind != "video" or dur <= 0:
                continue
            for i, t in enumerate(range(0, dur, self.every_ms)):
                media_ids.append(mid)
                frame_idx.append(i)
                ts_ms.append(t)
        return pa.table(
            {
                "media_id": pa.array(media_ids, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "ts_ms": pa.array(ts_ms, type=pa.int32()),
            }
        )
