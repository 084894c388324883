"""Multimodal column plumbing (decode stubbed — no image/audio libs here).

Pattern for 100 TB media pipelines: opaque ``binary`` payload column +
typed metadata, small batches (payload × batch_size × concurrency must
fit the worker heap), decode/feature stages as actor pools. The real
decoder would live in ``MediaDecode.__init__`` (model/codec load, once
per actor); this container has no imaging libraries, so ``decode`` is a
deterministic fake over the payload bytes — the Ray-side plumbing
(schema, actor signature, batch sizing, output layout) is real and
tested.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image/audio decode.

    A real implementation would raise NotImplementedError without the
    codec; the fake keeps the stage testable and oracle-checkable."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640,
        "height": (n * 7) % 480,
        "n_frames": n % 16,
    }


class MediaDecode:
    """Actor-pool decode stage: __init__ once per actor (codec load site),
    __call__ per small batch of binary payloads."""

    def __init__(self):
        self.decoder = _fake_decode  # real codec handle would load here

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        metas = [self.decoder(p) for p in payloads]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_bytes": pa.array([m["n_bytes"] for m in metas], pa.int64()),
                "width": pa.array([m["width"] for m in metas], pa.int64()),
                "height": pa.array([m["height"] for m in metas], pa.int64()),
                "n_frames": pa.array([m["n_frames"] for m in metas], pa.int64()),
            }
        )


def media_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Wrap documents.text as opaque binary payloads (media_id=doc_id)."""

    def wrap(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array([t.encode("utf-8") for t in texts], pa.binary()),
                "media_type": pa.array(["image/fake"] * len(ids), pa.string()),
            },
            schema=MEDIA_SCHEMA,
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(wrap, batch_format="pyarrow")


def _decode_pool_size() -> tuple[int, int]:
    """Actor-pool bounds derived from cluster CPUs — a fixed (1, 4) pool
    starves a 32-CPU node; at cluster scale the pool tracks node count."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:  # noqa: BLE001
        cpus = 4
    return (1, max(2, cpus))


def _decoded(sf_dir: str) -> ray.data.Dataset:
    """documents → binary payloads → actor-pool decode (shared by every
    media query so batch sizing / pool bounds live in one place).

    batch_size kept small: with real media each row is MBs and a batch ×
    pool must fit in the worker heap."""
    return media_from_documents(sf_dir).map_batches(
        MediaDecode, batch_format="pyarrow", batch_size=64,
        concurrency=_decode_pool_size(),
    )


def media_decode_meta(sf_dir: str) -> ray.data.Dataset:
    """documents → binary payloads → actor-pool decode → typed metadata."""
    return _decoded(sf_dir).sort("media_id")

def media_frame_sample(sf_dir: str, stride: int = 2) -> ray.data.Dataset:
    """Decode → frame-sample expansion: every ``stride``-th frame index
    becomes its own row with a deterministic per-frame feature digest
    (the real pipeline would emit a decoded frame tensor / embedding
    here). The expansion is the flat-map shape of video pipelines: row
    counts grow by the sample factor, so it runs AFTER the actor-pool
    decode and before any shuffle, letting the streaming executor
    pipeline the fan-out."""
    import hashlib

    def sample(batch: pa.Table) -> pa.Table:
        out_id: list[int] = []
        out_idx: list[int] = []
        out_md5: list[str] = []
        for mid, nb, nf in zip(
            batch["media_id"].to_pylist(),
            batch["n_bytes"].to_pylist(),
            batch["n_frames"].to_pylist(),
        ):
            for i in range(0, nf, stride):
                out_id.append(mid)
                out_idx.append(i)
                out_md5.append(
                    hashlib.md5(f"{mid}:{i}:{nb}".encode()).hexdigest()
                )
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "frame_md5": pa.array(out_md5, pa.string()),
            }
        )

    return (
        _decoded(sf_dir)
        .map_batches(sample, batch_format="pyarrow")
        .sort(["media_id", "frame_idx"])
    )
