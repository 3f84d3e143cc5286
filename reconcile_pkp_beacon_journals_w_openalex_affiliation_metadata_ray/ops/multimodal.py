"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Mirrors the reference's stateful VLM OCR stage
(`utils/vlm_text_extractor/vlm_text_extractor.py:257-291` model load
once, `:402-549` per-item inference) as the canonical actor-pool
pattern: heavyweight state in ``__init__``, per-batch work in
``__call__``, small ``batch_size`` because payload rows are large.

The actual decoders (image/audio libs) are NOT available in this
container, so the decode kernel is probed at actor construction:
``decoder="fake"`` runs a deterministic byte-level feature extractor
(real plumbing, fake pixels — the oracle path); ``decoder="real"``
routes through PIL when it imports (grayscale resize to the feature
width, a real image decode) and raises NotImplementedError otherwise,
so the same pipeline code upgrades itself on a deps-present
deployment. Schema, batch sizing, actor signature and output layout
are the real, tested parts either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _probe_pil():
    """PIL.Image if importable, else None — called once per actor
    (import cost amortizes per the T1 once-per-actor-state pattern)."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


class MediaDecoder:
    """Actor-pool stage: binary media -> fixed-size feature vector +
    metadata columns."""

    def __init__(self, decoder: str = "fake", feature_dim: int = 16):
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.feature_dim = feature_dim
        # heavyweight setup happens here ONCE per actor (codec probe /
        # model weights / codec contexts) — T1 pattern
        self._pil = _probe_pil() if decoder == "real" else None

    def _decode_one(self, payload: bytes):
        if self.decoder == "real":
            if self._pil is None:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg, not present in this environment"
                )
            import io

            img = self._pil.open(io.BytesIO(payload or b""))
            # deterministic fixed-width feature: grayscale, resize to
            # (feature_dim x 1) with nearest-neighbor (no resample
            # kernel variation across PIL builds), scale to [0, 1]
            small = img.convert("L").resize((self.feature_dim, 1),
                                            self._pil.NEAREST)
            feat = (np.asarray(small, dtype=np.float32).reshape(-1)
                    / np.float32(255.0))
            return feat, len(payload or b"")
        # deterministic fake: blake2b-seeded byte statistics
        if payload is None:
            payload = b""
        digest = hashlib.blake2b(payload, digest_size=self.feature_dim).digest()
        feat = np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0
        return feat, len(payload)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats, sizes, status = [], [], []
        for payload in batch["payload"]:
            try:
                f, n = self._decode_one(payload)
                feats.append(f)
                sizes.append(n)
                status.append("ok")
            except NotImplementedError:
                raise
            except Exception as exc:  # record-level never fatal
                feats.append(np.zeros(self.feature_dim, dtype=np.float32))
                sizes.append(0)
                status.append(f"error: {exc}")
        out = batch[[c for c in batch.columns if c != "payload"]].copy()
        out["n_bytes"] = pd.Series(sizes, index=batch.index, dtype="int64")
        out["features"] = pd.Series(feats, index=batch.index)
        out["decode_status"] = pd.Series(status, index=batch.index)
        return out


def decode_media(ds, decoder: str = "fake", batch_size: int = 64, concurrency=(1, 4)):
    """Run the decode actor pool. Small batch_size: media rows are
    large, batch x concurrency must fit the worker heap."""
    return ds.map_batches(
        MediaDecoder,
        batch_format="pandas",
        batch_size=batch_size,
        fn_constructor_kwargs={"decoder": decoder},
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool stage: treat an opaque binary payload as a sequence of
    fixed-size frames and keep every ``stride``-th one — the plumbing
    shape of video frame sampling (codec-free stand-in: real ffmpeg
    frame extraction slots into ``_frames`` on a networked deployment;
    schema, batch sizing and actor signature are the real parts)."""

    def __init__(self, frame_bytes: int = 1024, stride: int = 4):
        if frame_bytes <= 0 or stride <= 0:
            raise ValueError("frame_bytes and stride must be positive")
        self.frame_bytes = frame_bytes
        self.stride = stride

    def _frames(self, payload: bytes):
        fb = self.frame_bytes
        return [payload[i : i + fb] for i in range(0, len(payload), fb)]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_frames, n_sampled, sampled_bytes, frames_out = [], [], [], []
        for payload in batch["payload"]:
            payload = payload or b""
            frames = self._frames(payload)
            sampled = frames[:: self.stride]
            n_frames.append(len(frames))
            n_sampled.append(len(sampled))
            sampled_bytes.append(sum(len(f) for f in sampled))
            frames_out.append(sampled)
        out = batch[[c for c in batch.columns if c != "payload"]].copy()
        out["n_frames"] = pd.Series(n_frames, index=batch.index, dtype="int64")
        out["n_sampled"] = pd.Series(n_sampled, index=batch.index, dtype="int64")
        out["sampled_bytes"] = pd.Series(sampled_bytes, index=batch.index, dtype="int64")
        out["frames"] = pd.Series(frames_out, index=batch.index)
        return out


def frame_sample(ds, frame_bytes: int = 1024, stride: int = 4,
                 batch_size: int = 32, concurrency=(1, 4)):
    """Run the frame-sampling actor pool (small batches: payload rows
    are large; batch x concurrency must fit the worker heap)."""
    return ds.map_batches(
        FrameSampler,
        batch_format="pandas",
        batch_size=batch_size,
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "stride": stride},
        concurrency=concurrency,
    )
