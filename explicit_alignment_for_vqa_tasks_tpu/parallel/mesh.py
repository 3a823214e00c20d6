"""Device mesh construction and SPMD sharding helpers.

The reference has no real distribution (latent PL-DDP only, SURVEY §2.2);
here parallelism is first-class: a ``jax.sharding.Mesh`` with ``data`` and
``model`` axes from ``config.tpu.mesh``, batch sharded over ``data``,
params replicated (or sharded over ``model`` for large LMs — see
partition_lm_params). Collectives ride ICI via XLA; a mesh of size 1
degrades gracefully to single-chip.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def make_mesh(config: Optional[Any] = None,
              devices: Optional[list] = None) -> Mesh:
    """Build a (data, model) mesh from config.tpu.mesh sizes; -1 means
    "all remaining devices".

    With ``tpu.mesh.dcn_data > 1`` (multi-slice / multi-process runs) a
    HYBRID mesh is built instead: an outer ``dcn_data`` axis laid out
    over the slow DCN network (one granule per TPU slice, or per process
    where the platform doesn't expose ``slice_index``) wrapping the
    per-slice (data, model) ICI mesh —
    ``mesh_utils.create_hybrid_device_mesh``. Batch then shards over
    ``(dcn_data, data)`` (batch_sharding) so the only DCN collective is
    the gradient/metric all-reduce; tp collectives stay on ICI."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    sizes: Dict[str, int] = {"data": -1, "model": 1}
    if config is not None:
        sizes.update(dict(config.get("tpu", {}).get("mesh", {})))
    model = sizes.get("model", 1)
    if model in (-1, 0):
        model = 1
    data = sizes.get("data", -1)
    dcn_data = int(sizes.get("dcn_data", 1) or 1)
    pipe = int(sizes.get("pipe", 1) or 1)
    if dcn_data > 1:
        from jax.experimental import mesh_utils

        if pipe > 1:
            raise ValueError(
                "dcn_data composes with the 2-D (data, model) ICI mesh; "
                "pipe > 1 under DCN is not supported (the GPipe ppermute "
                "ring must stay on ICI)"
            )
        per_granule = n // dcn_data
        if data in (-1, 0):
            data = per_granule // model
        if dcn_data * data * model != n:
            raise ValueError(
                f"mesh sizes dcn_data={dcn_data} x data={data} x "
                f"model={model} != {n} devices"
            )
        # slices are the DCN granules where the platform exposes a
        # matching slice count; processes otherwise (CPU multi-process
        # tests report slice_index=0 on every virtual device, and some
        # runtimes omit the attribute entirely)
        slices = {getattr(d, "slice_index", 0) for d in devices}
        process_is_granule = len(slices) != dcn_data
        mesh_devices = mesh_utils.create_hybrid_device_mesh(
            (data, model), (dcn_data, 1), devices,
            process_is_granule=process_is_granule,
        ).reshape(dcn_data, data, model)
        return Mesh(mesh_devices, axis_names=("dcn_data", "data", "model"))
    if pipe > 1 and data not in (-1, 0) and data * pipe * model == n:
        # caller fell back from a 3-D (data, pipe, model) request (e.g.
        # unsupported eval mode): fold the pipe devices into data so the
        # sizes still multiply to the device count
        logger.info("folding pipe=%d into data for the 2-D mesh", pipe)
        data = data * pipe
    if data in (-1, 0):
        data = n // model
    if data * model != n:
        raise ValueError(
            f"mesh sizes data={data} x model={model} != {n} devices"
        )
    mesh_devices = np.asarray(devices).reshape(data, model)
    return Mesh(mesh_devices, axis_names=("data", "model"))


def make_data_mesh(data: int = -1) -> Optional[Mesh]:
    """1-D ``data`` mesh for the offline bulk tools' ``--mesh_data N``
    flag (CLIP extraction, RICES kNN): -1 = all local devices, 0/1 = no
    mesh (single-chip path). The multi-chip twin of the reference's
    FAISS-GPU / CUDA-CLIP stages, which scaled to one GPU only."""
    if data in (0, 1):
        return None
    devices = jax.devices()
    if data == -1:
        data = len(devices)
    if data > len(devices):
        raise ValueError(
            f"--mesh_data {data} > {len(devices)} available devices"
        )
    if data == 1:
        return None
    return Mesh(np.asarray(devices[:data]), ("data",))


def data_axes(mesh: Mesh) -> tuple:
    """The mesh axes the batch shards over (outer-to-inner)."""
    return ("dcn_data", "data") if "dcn_data" in mesh.axis_names \
        else ("data",)


def data_size(mesh: Mesh) -> int:
    """Total data-parallel ways (product over the batch-sharding axes)."""
    size = 1
    for ax in data_axes(mesh):
        size *= mesh.shape[ax]
    return size


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis split over the data axis (and the outer
    dcn_data axis on hybrid multi-slice meshes)."""
    return NamedSharding(mesh, P(data_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Device-put array leaves with the batch axis over `data`; non-array
    leaves (strings, lists of meta) pass through untouched."""
    sharding = batch_sharding(mesh)

    def put(x):
        if isinstance(x, (np.ndarray, jax.Array)) and np.ndim(x) >= 1:
            return jax.device_put(x, sharding)
        return x

    return {k: put(v) for k, v in batch.items()}


def spans_processes(mesh: Mesh) -> bool:
    """True when the mesh includes devices of other processes (a global
    multi-controller mesh): plain ``jax.device_put`` of host data cannot
    target it, the make_array_* constructors must be used instead."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def put_host_array(mesh: Mesh, spec: P, x: Any) -> Any:
    """Place a host-available value on the mesh under ``spec``.

    Single-process: plain device_put. Multi-process (global mesh): every
    process must hold the SAME host value (same seed / same checkpoint —
    the executors' invariant for params); each process supplies its
    addressable shards via ``jax.make_array_from_callback``, which is
    layout-agnostic (works for replicated AND model-sharded specs)."""
    sharding = NamedSharding(mesh, spec)
    if not spans_processes(mesh):
        return jax.device_put(x, sharding)
    host = np.asarray(x)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )


def replicate_params(mesh: Mesh, params: Any) -> Any:
    """Replicate a param pytree across the mesh."""
    return jax.tree.map(lambda x: put_host_array(mesh, P(), x), params)


# ---------------------------------------------------------------------------
# Model-parallel partition specs for the frozen LM (optional `model` axis)
# ---------------------------------------------------------------------------

def t5_param_specs(params: Any) -> Any:
    """PartitionSpecs for the stacked T5 pytree: attention/FFN weight
    matrices sharded over `model` on their contraction-friendly axis,
    embeddings sharded over vocab, everything else replicated.

    Layout follows the megatron recipe: q/k/v and wi_* split the OUTPUT
    (heads / ffn) dim, o and wo split the INPUT dim, so each block needs
    a single psum at its end (inserted automatically by XLA under jit).
    """

    def spec_for(path: tuple, leaf: Any) -> P:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        key = names[-1] if names else ""
        if "ffn_q8" in names or "self_attn_q8" in names \
                or "step_q8" in names:
            # int8 weights+scales feed opaque pallas_calls
            # (fused_t5_ffn_q8 / fused_t5_ln_qkv_q8) or the grouped
            # decode-step matmuls; keep the subtrees replicated so GSPMD
            # doesn't shard weights while their dequant scales replicate
            return P()
        stacked = leaf.ndim == 3  # (layers, in, out)
        if key in ("q", "k", "v", "wi_0", "wi_1"):
            return P(None, None, "model") if stacked else P(None, "model")
        if key in ("o", "wo"):
            return P(None, "model", None) if stacked else P("model", None)
        if key in ("shared", "lm_head"):
            # keep replicated: gathers on every embed/unembed usually cost
            # more than the memory saved at <= 3B params
            return P()
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_lm_params(mesh: Mesh, params: Any) -> Any:
    """Place LM params per t5_param_specs (no-op sharding on 1-dev mesh;
    make_array-based placement on global multi-process meshes)."""
    specs = t5_param_specs(params)
    return jax.tree.map(
        lambda x, s: put_host_array(mesh, s, x), params, specs
    )
