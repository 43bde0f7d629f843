"""Multimodal column plumbing: opaque binary payloads with typed
metadata, decoded by an actor-pool stage.

The container has no image/audio codecs, so the *codec* is a
deterministic fake (a 16-byte header + seeded payload derived from
doc_id) behind the same interface a real decoder would have — the
Ray-side plumbing (binary column, actor signature, batch sizing for
large rows, flat_map frame sampling, output layout) is real and tested.
A real deployment swaps `FakeImageCodec.decode` for PIL/ffmpeg and
nothing else changes (clearly-marked seam below).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .._env import pool_size, remote_args

_MAGIC = b"ERXI"
_HEADER = struct.Struct("<4sIII")  # magic, width, height, channels


def synth_payload(doc_id: int) -> bytes:
    """Deterministic fake image blob: header + doc_id-seeded bytes."""
    w = 64 + doc_id % 512
    h = 48 + (doc_id * 7) % 384
    c = 1 + doc_id % 3
    rng = np.random.RandomState(doc_id % (2 ** 31))
    body = rng.bytes(min(4096, w * c))
    return _HEADER.pack(_MAGIC, w, h, c) + body


class FakeImageCodec:
    """Actor-pool decoder: state (codec tables / models in real life)
    initialized once per actor; per-batch decode in __call__.

    REAL-CODEC SEAM: replace `decode` with e.g. PIL.Image.open when the
    imaging libraries are available; the pipeline shape is unchanged."""

    def __init__(self):
        self.header = _HEADER  # stands in for codec init / model load

    def decode(self, blob: bytes) -> tuple:
        if len(blob) < self.header.size:
            raise ValueError("truncated payload")
        magic, w, h, c = self.header.unpack_from(blob)
        if magic != _MAGIC:
            raise ValueError("bad magic")
        return w, h, c

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        blobs = t.column("payload").to_pylist()
        ws, hs, cs, nb = [], [], [], []
        for blob in blobs:
            w, h, c = self.decode(blob)
            ws.append(w)
            hs.append(h)
            cs.append(c)
            nb.append(len(blob))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "width": pa.array(ws, pa.int64()),
                         "height": pa.array(hs, pa.int64()),
                         "channels": pa.array(cs, pa.int64()),
                         "n_bytes": pa.array(nb, pa.int64())})


def _with_payloads(sf_dir: str) -> "rd.Dataset":
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def attach(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return pa.table({"doc_id": t.column("doc_id"),
                         "payload": pa.array(
                             [synth_payload(d) for d in ids], pa.binary())})
    # small batches: binary payload rows are wide (memory-aware sizing)
    return ds.map_batches(attach, batch_format="pyarrow", batch_size=256, **remote_args())


def image_meta(sf_dir: str) -> pd.DataFrame:
    """documents -> binary payload column -> actor-pool decode ->
    (doc_id, width, height, channels, n_bytes)."""
    ds = _with_payloads(sf_dir)
    out = ds.map_batches(FakeImageCodec, batch_format="pyarrow",
                         batch_size=256, concurrency=pool_size(),
                         **remote_args())
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def frame_sample(sf_dir: str, stride: int = 4) -> pd.DataFrame:
    """Treat each payload as a clip with n_frames = 8 + doc_id % 32;
    emit every `stride`-th frame index (flat_map-shaped fan-out)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        ids, frames = [], []
        for d in t.column("doc_id").to_pylist():
            n_frames = 8 + d % 32
            for fr in range(0, n_frames, stride):
                ids.append(d)
                frames.append(fr)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "frame_idx": pa.array(frames, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", **remote_args()).to_pandas()\
        .sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)


_AMAGIC = b"ERXA"
_AHEADER = struct.Struct("<4sIQ")  # magic, sample_rate, n_samples


def synth_audio_payload(doc_id: int) -> bytes:
    """Deterministic fake audio blob: header + tiny seeded body.
    sample_rate in {8k, 12k, 16k}; duration 1-6 s, non-integral."""
    sr = 8000 + (doc_id % 3) * 4000
    n = sr * (1 + doc_id % 5) + (doc_id * 37) % sr
    rng = np.random.RandomState((doc_id * 31 + 7) % (2 ** 31))
    return _AHEADER.pack(_AMAGIC, sr, n) + rng.bytes(64)


class FakeAudioCodec:
    """Actor-pool audio prober (REAL-CODEC SEAM: swap `probe` for
    soundfile/ffprobe; the pipeline shape is unchanged)."""

    def __init__(self):
        self.header = _AHEADER

    def probe(self, blob: bytes) -> tuple:
        if len(blob) < self.header.size:
            raise ValueError("truncated payload")
        magic, sr, n = self.header.unpack_from(blob)
        if magic != _AMAGIC:
            raise ValueError("bad magic")
        return sr, n

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, chunks, starts, lens = [], [], [], []
        for d, blob in zip(t.column("doc_id").to_pylist(),
                           t.column("payload").to_pylist()):
            sr, total = self.probe(blob)
            for ci, start in enumerate(range(0, total, sr)):
                ids.append(d)
                chunks.append(ci)
                starts.append(start)
                lens.append(min(sr, total - start))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "chunk_idx": pa.array(chunks, pa.int64()),
                         "start_sample": pa.array(starts, pa.int64()),
                         "n_samples": pa.array(lens, pa.int64())})


def audio_chunks(sf_dir: str) -> pd.DataFrame:
    """documents -> binary audio payload -> actor-pool probe ->
    1-second chunk windows (doc_id, chunk_idx, start_sample,
    n_samples) — the segmentation step ahead of any batched audio
    model. Chunk fan-out happens INSIDE the decode actor so payload
    bytes never cross a second stage boundary."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def attach(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return pa.table({"doc_id": t.column("doc_id"),
                         "payload": pa.array(
                             [synth_audio_payload(d) for d in ids],
                             pa.binary())})

    out = (ds.map_batches(attach, batch_format="pyarrow", batch_size=256,
                          **remote_args())
             .map_batches(FakeAudioCodec, batch_format="pyarrow",
                          batch_size=256, concurrency=pool_size(),
                          **remote_args()))
    return out.to_pandas()\
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
