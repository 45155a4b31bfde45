"""Fused embedding lookup+pool Pallas kernel.

The FusedEmbeddingSparsePostLookUp role of the reference's CUDA kernels
(tensorflow/core/kernels/fused_embedding/*.cu.cc, docs/Fused-Embedding.md):
gather each example's rows AND combine them (mean/sum) in one pass, so the
[B*w, D] gathered intermediate never round-trips through HBM — the pooled
[B, D] output is the only write.

Mechanics: grid over example chunks; per example, the w candidate rows
stream HBM->VMEM through a pipelined multi-DMA queue and accumulate in a
VMEM scratch; invalid slots (padding) are skipped at DMA-issue time, so
padding costs nothing (the reference's PreLookUp prune step).

Measured (v5e, B=4096, w=16, D=128, ~70% valid): fused kernel 8.0ms vs
XLA gather+mask+mean 3.9ms — XLA fuses the pooling into its gather loop
too, and both are bound by the TensorCore's sequential address-issue
rate, where XLA's specialized gather beats a generic DMA pipeline. The
default paths therefore keep XLA; this kernel documents the alternative
and is the substrate for hardware generations (or SparseCore offload)
where DMA-queue depth wins.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 128   # examples per grid program
_PIPE = 8      # outstanding DMAs


def _fused_kernel(slots_ref, nvalid_ref, values_ref, out_ref, acc, sems):
    """slots_ref: int32 [CHUNK, w] SMEM block (invalid left-packed out);
    nvalid_ref: int32 [CHUNK, 1] SMEM block; out [CHUNK, D] VMEM block."""
    w = slots_ref.shape[1]

    def example(b, _):
        n = nvalid_ref[b, 0]

        def get(k):
            slot = slots_ref[b, k]
            return pltpu.make_async_copy(
                values_ref.at[slot], acc.at[k % _PIPE],
                sems.at[k % _PIPE])

        # warm-up: fill the DMA pipeline
        def warm(k, _):
            @pl.when(k < n)
            def _():
                get(k).start()
            return 0

        jax.lax.fori_loop(0, min(_PIPE, w), warm, 0)

        def body(k, total):
            @pl.when(k < n)
            def _():
                get(k).wait()
            # read the buffer BEFORE reissuing into the same slot
            total = total + jnp.where(k < n, acc[k % _PIPE], 0.0)

            @pl.when(k + _PIPE < n)
            def _():
                get(k + _PIPE).start()

            return total

        total = jax.lax.fori_loop(
            0, w, body, jnp.zeros_like(out_ref[0]))
        out_ref[b] = total  # raw sum; combiner scaling happens outside
        return 0

    jax.lax.fori_loop(0, _CHUNK, example, 0)


@functools.partial(jax.jit, static_argnames=("combiner",))
def fused_pooled_lookup(values: jax.Array, slots: jax.Array,
                        valid: jax.Array, combiner: str = "mean") -> jax.Array:
    """values [R, D] (D a multiple of 128), slots int32 [B, w],
    valid bool [B, w] -> pooled [B, D] (combiner: sum | mean | sqrtn).

    ``valid`` may be arbitrary per example — slots are left-packed here so
    the kernel streams exactly ``n_valid`` rows per example.
    """
    if combiner not in ("sum", "mean", "sqrtn"):
        raise ValueError(f"unknown combiner {combiner!r}")
    r, d = values.shape
    if d % 128:
        raise ValueError("fused_pooled_lookup needs D % 128 == 0; use the "
                         "XLA gather path for narrow dims")
    b, w = slots.shape
    nvalid = jnp.sum(valid.astype(jnp.int32), axis=-1)
    # left-pack valid slots (stable): sort each row by ~valid
    order = jnp.argsort(~valid, axis=-1, stable=True)
    packed = jnp.take_along_axis(slots, order, axis=-1)
    packed = jnp.clip(packed, 0, r - 1)

    b_pad = -(-b // _CHUNK) * _CHUNK
    if b_pad != b:
        packed = jnp.concatenate(
            [packed, jnp.zeros((b_pad - b, w), jnp.int32)])
        nvalid = jnp.concatenate([nvalid, jnp.zeros((b_pad - b,), jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b_pad // _CHUNK,),
        in_specs=[
            pl.BlockSpec((_CHUNK, w), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_CHUNK, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((_CHUNK, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_PIPE, d), values.dtype),
            pltpu.SemaphoreType.DMA((_PIPE,)),
        ],
    )
    out = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, d), values.dtype),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
    )(packed, nvalid[:, None], values)[:b]
    if combiner == "sum":
        return out
    denom = jnp.maximum(nvalid[:b], 1).astype(out.dtype)
    if combiner == "sqrtn":
        denom = jnp.sqrt(denom)
    return out / denom[:, None]
