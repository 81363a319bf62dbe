"""Artifact persistence: checkpoint/resume for every expensive build step.

The reference checkpoints at artifact level (SURVEY.md section 5): fitted
params in parameter_hnsw.json, ground-truth JSON cache, qd-tree pickles,
.faiss index files and a custom binary graph format (reference
pointer_hnsw_index.cpp:132-203). Equivalents here:

- world/plan/tree: pickle (save_pickle/load_pickle);
- HNSW graphs and IVF inverted files: npz state dicts (save_npz/load_npz)
  so a 1M-row graph build (~minutes native) is paid once;
- fitted cost-model params: JSON via CostModelParams.to_dict;
- ground truth: handled by bench.GroundTruthOracle's own cache.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict

import numpy as np


def _ensure_dir(path: str) -> None:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)


def save_pickle(obj: Any, path: str) -> None:
    _ensure_dir(path)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_npz(state: Dict[str, np.ndarray], path: str, **meta) -> None:
    _ensure_dir(path)
    np.savez_compressed(path, __meta__=json.dumps(meta), **state)


def load_npz(path: str):
    """Returns (state dict of arrays, meta dict)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"])) if "__meta__" in data else {}
    state = {k: data[k] for k in data.files if k != "__meta__"}
    return state, meta


def save_arena_snapshot(arena, path: str, with_mirror: bool = None) -> None:
    """COLD-START persistence of a built serving arena (VERDICT-r3 item 5;
    the pgvector analog is the disk-resident index the reference's ACORN
    suite re-reads per query, acorn_benchmark/src/acorn_search.cpp:144).

    Saves everything load_arena_snapshot needs to reconstruct the arena
    WITHOUT the corpus and WITHOUT re-quantizing: the int8 quant arrays,
    role bitsets, norms, ids, and quantization params. The full-precision
    mirror (rerank path) is stored as bf16 only when the quantization is
    lossy (`with_mirror=None` auto); for lossless corpora the mirror is
    rebuilt exactly from the int8 codes at load time (x = x_q/scale +
    center), so a SIFT-shaped 1M arena snapshot is ~290 MB instead of
    ~550 MB. Uncompressed npz: load time is dominated by disk read +
    device upload, and int8 codes barely compress."""
    _ensure_dir(path)
    q = arena.quant
    assert q is not None, "arena snapshots require the int8 serving arena"
    if with_mirror is None:
        with_mirror = not q.lossless
    hv = (q.host_vectors_q if q.host_vectors_q is not None
          else np.asarray(q.vectors_q))
    hn = (q.host_norms_q if q.host_norms_q is not None
          else np.asarray(q.norms_q))
    hr = (q.host_roles8 if q.host_roles8 is not None
          else np.asarray(q.roles8))
    bits = (arena.host_bits if arena.host_bits is not None
            else np.asarray(arena.role_bits))
    state = dict(
        vq=hv, nq=hn, roles8=hr, bits=bits,
        norms=(arena.host_norms if arena.host_norms is not None
               else np.asarray(arena.norms)).astype(np.float32),
        doc_ids=arena.doc_ids, block_ids=arena.block_ids,
        center=q.center.astype(np.float32),
    )
    if with_mirror:
        mirr = (arena.host_vectors if arena.host_vectors is not None
                else np.asarray(arena.vectors, dtype=np.float32))
        import jax.numpy as jnp

        state["mirror_bf16"] = np.asarray(
            jnp.asarray(mirr).astype(jnp.bfloat16)).view(np.uint16)
    np.savez(path, __meta__=json.dumps(dict(
        n=int(arena.n), metric=arena.metric, scale=float(q.scale),
        qclip=int(q.qclip), lossless=bool(q.lossless),
        with_mirror=bool(with_mirror))), **state)


def load_arena_snapshot(path: str, device=None):
    """Inverse of save_arena_snapshot: npz -> device-resident DeviceArena,
    skipping corpus generation AND quantization. The float mirror comes
    from the stored bf16 (lossy corpora) or an exact dequantization of the
    int8 codes (lossless).

    Precision note (ADVICE r4): for lossy corpora `host_vectors` is
    bf16-rounded f32 after a round-trip, while a freshly built arena keeps
    the original f32 host mirror. Device serving is unaffected (the device
    mirror is bf16 either way), but host-side consumers needing exact f32
    values (external ground-truth checks) should recompute from the source
    corpus rather than from a restored arena."""
    import jax
    import jax.numpy as jnp

    from ..core import ArenaQuant, DeviceArena

    state, meta = load_npz(path)
    put = (lambda x: jax.device_put(x, device)) if device is not None \
        else jax.device_put
    vq, nq_, roles8 = state["vq"], state["nq"], state["roles8"]
    center = state["center"]
    scale = float(meta["scale"])
    d = len(center)
    if meta.get("with_mirror"):
        mirr16 = state["mirror_bf16"]
        vec_d = put(jnp.asarray(mirr16).view(jnp.bfloat16))
        host_vec = np.asarray(jnp.asarray(mirr16).view(jnp.bfloat16),
                              dtype=np.float32)
    else:
        host_vec = (vq[:, :d].astype(np.float32) / scale + center[None, :])
        host_vec[int(meta["n"]):] = 0.0   # padding rows are zero, not center
        vec_d = put(jnp.asarray(host_vec).astype(jnp.bfloat16))
    quant = ArenaQuant(
        vectors_q=put(vq), norms_q=put(nq_), roles8=put(roles8),
        scale=scale, center=center, lossless=bool(meta["lossless"]),
        qclip=int(meta["qclip"]),
        host_vectors_q=vq, host_norms_q=nq_, host_roles8=roles8,
    )
    return DeviceArena(
        vectors=vec_d, norms=put(state["norms"]),
        role_bits=put(state["bits"]), n=int(meta["n"]),
        doc_ids=state["doc_ids"], block_ids=state["block_ids"],
        host_vectors=host_vec, host_norms=state["norms"],
        host_bits=state["bits"], vectors_aug=None, quant=quant,
        metric=meta.get("metric", "l2"),
    )


def save_params(params, path: str) -> None:
    """Fitted cost-model params (the parameter_hnsw.json analog). A
    `family` tag records which model class the numbers belong to so
    load_params reconstructs the right one (reference keeps separate
    parameter_<index>.json files per index, get_parameter.py)."""
    from ..models.cost import IVFCoverageParams, TPUCostParams

    _ensure_dir(path)
    d = params.to_dict()
    d["family"] = ("ivf_coverage" if isinstance(params, IVFCoverageParams)
                   else "tpu" if isinstance(params, TPUCostParams)
                   else "reference")
    with open(path, "w") as f:
        json.dump(d, f, indent=2)


def load_params(path: str):
    from ..models.cost import (
        CostModelParams, IVFCoverageParams, TPUCostParams,
    )

    with open(path) as f:
        d = json.load(f)
    fam = d.pop("family", "reference")
    cls = {"ivf_coverage": IVFCoverageParams,
           "tpu": TPUCostParams}.get(fam, CostModelParams)
    return cls.from_dict(d)
