"""Pallas row-gather kernel: dynamic embedding-row fetch at DMA rate.

XLA lowers a random row gather on TPU TensorCore to a serialized
dynamic-slice loop (~0.15us/row regardless of row size). This kernel
replaces it with a pipeline of async HBM->VMEM copies with multiple
outstanding DMAs — the fused-embedding-lookup role of the reference's
CUDA kernels (tensorflow/core/kernels/fused_embedding/*,
docs/Fused-Embedding.md), built the TPU way.

TPU DMA operates on 128-lane tiles, so narrow rows (dim < 128) are
fetched at *group* granularity: the [R, D] table is viewed as
[R/g, g*D] with g = 128/D, one DMA fetches the 128-lane group row
containing the target, and a vectorized one-hot contraction selects the
D-lane sub-row afterwards (VPU work, no second gather).

Shapes: values [R, D] (HBM-resident), slots int32 [N] -> out [N, D].
Out-of-range slots are clamped to R-1 (callers keep a null row there).

Measured (v5e, 32k random rows): D=16 pallas 8.2ms vs XLA 6.5ms;
D=64 6.8 vs 4.6; D=128 4.9 vs 5.1 — XLA's gather on this chip is also
issue-bound (~0.15us/row), so per-row DMA only breaks even by D=128 and
the default paths keep XLA gathers. This kernel remains the substrate
for fused lookup+pool variants and for dims >= 128 where DMA stays
descriptor-bound while XLA's cost scales with bytes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# group rows gathered per grid program (one VMEM output block)
_CHUNK = 512
# outstanding DMAs
_PIPE = 8


def _gather_kernel(gslots_ref, values_ref, out_ref, sems):
    i = pl.program_id(0)
    base = i * _CHUNK

    def get_dma(k):
        gslot = gslots_ref[base + k]
        return pltpu.make_async_copy(
            values_ref.at[gslot], out_ref.at[k], sems.at[k % _PIPE])

    def warm(k, _):
        get_dma(k).start()
        return 0

    jax.lax.fori_loop(0, min(_PIPE, _CHUNK), warm, 0)

    def body(k, _):
        get_dma(k).wait()

        @pl.when(k + _PIPE < _CHUNK)
        def _():
            get_dma(k + _PIPE).start()

        return 0

    jax.lax.fori_loop(0, _CHUNK, body, 0)


def _group_factor(d: int, dtype) -> int:
    lane = 128
    if d >= lane:
        return 1
    if lane % d:
        return 1
    return lane // d


@functools.partial(jax.jit, static_argnames=())
def gather_rows(values: jax.Array, slots: jax.Array) -> jax.Array:
    """values [R, D], slots int32 [N] -> [N, D]. R must be divisible by the
    group factor 128//D (pad the table; EV capacities are powers of two)."""
    r, d = values.shape
    n = slots.shape[0]
    g = _group_factor(d, values.dtype)
    slots_c = jnp.clip(slots, 0, r - 1)
    gslots = slots_c // g if g > 1 else slots_c
    lane = jnp.zeros((n,), jnp.int32) if g == 1 else slots_c % g

    n_pad = -(-n // _CHUNK) * _CHUNK
    if n_pad != n:
        gslots = jnp.concatenate(
            [gslots, jnp.zeros((n_pad - n,), jnp.int32)])

    grouped = values.reshape(r // g, g * d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // _CHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (_CHUNK, g * d), lambda i, *_: (i, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_PIPE,))],
    )
    groups = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, g * d), values.dtype),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )(gslots, grouped)[:n]
    if g == 1:
        return groups
    # select the in-group sub-row: one-hot contraction on the VPU
    onehot = jax.nn.one_hot(lane, g, dtype=values.dtype)      # [N, g]
    return jnp.einsum("ng,ngd->nd", onehot, groups.reshape(n, g, d))
