"""Measure the mechanisms available for the EV metadata writes.

VERDICT-r2 asked whether writing freq/version/create_step from *inside a
Pallas pass* (instead of XLA 1-column scatters) recovers the ~1.8ms the
"normal" ValuePtr layout costs per step. Any Pallas metadata write bottoms
out in one of two primitives, both measured here against the XLA scatter
the train step currently uses:

  a) XLA: three independent 1-column int32 scatters at U unique slots
     (the current mechanism; docs/Performance.md records that one packed
     [U,3] scatter LOSES to these — lane vectorization breaks).
  b) Pallas per-row DMA: a kernel that issues one async copy per touched
     slot (the only way to write arbitrary HBM offsets from Pallas —
     dynamic stores require VMEM refs; HBM needs make_async_copy). A
     probe-fused metadata write would issue exactly these DMAs.
  c) Pallas blocked read-modify-write: stream the whole [cap] plane
     through VMEM in blocks and merge the U updates — O(cap) bandwidth
     instead of O(U) random writes, profitable only when U ~ cap.

Run on the real chip:  python benchmarks/pallas_meta_bench.py

MEASURED (v5e, 2026-08-17, CAP=2M, U=17664) — the Pallas route is dead:
  a) XLA 3x 1-col scatters: 5.283 ms standalone (100 ns/elem/plane;
     inside the fused train step the same writes cost ~1.8 ms — XLA
     overlaps them with the gather/update DAG).
  b) Pallas per-slot DMA: NOT EXPRESSIBLE. Mosaic requires dynamic
     slices of an i32 plane to align to its (1024,) tiling — for both
     VMEM sources and ANY/HBM destinations ("Slice shape along dimension
     0 must be aligned to tiling (1024), but is 1"). The minimum HBM
     write granule is one tile (4 KiB of i32), so a probe-fused
     metadata write would move U x 4KiB = 72 MiB/step/plane — 40x the
     XLA scatter's traffic.
  c) Pallas blocked read-modify-write: NOT EXPRESSIBLE — no scatter
     lowering for TC kernels ("Unimplemented primitive ... scatter").
Conclusion: the XLA 1-column scatter IS the mechanism on this hardware;
the light-layout gating (skip the writes when no consumer) was the real
lever, already landed (+15.8%% bench).
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 1 << 21
U = 17664  # the bench's dedup width at B=4096 (26*4096/6, rounded)
SEMS = 8
INTERPRET = False  # --interpret: validate kernels on CPU before chip runs


def fence(x):
    """D2H scalar read — the only honest sync over the tunneled TPU."""
    return float(jnp.sum(x[:8].astype(jnp.float32)))


def timeit(fn, *args, iters=20):
    out = fn(*args)
    fence(out if isinstance(out, jax.Array) else out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out if isinstance(out, jax.Array) else out[0])
    return (time.perf_counter() - t0) / iters


# --- a) XLA 1-column scatters (the incumbent) ------------------------------
@jax.jit
def xla_three_scatters(versions, freqs, create_steps, slots, gs, inc):
    v = versions.at[slots].set(gs, mode="drop", unique_indices=True)
    f = freqs.at[slots].add(inc, mode="drop", unique_indices=True)
    c = create_steps.at[slots].set(gs, mode="drop", unique_indices=True)
    return v, f, c


# --- b) Pallas per-slot DMA stores ----------------------------------------
# Deliberately SERIALIZED (start; wait) — deadlock-free by construction.
# This measures the per-DMA issue+completion cost; a pipelined variant can
# only hide latency, not the issue cost, and the issue cost alone decides
# whether per-slot DMAs can beat the XLA scatter.
def _dma_kernel(n, slots_ref, val_ref, plane_ref, sem):
    def body(i, _):
        slot = slots_ref[i]
        # source is a STATIC single cell: a dynamic 1-elem slice of a 1-D
        # VMEM ref violates Mosaic's (1024,) tiling (measured failure kept
        # in docs). The real version/create_step writes broadcast ONE
        # scalar (the global step) to every touched slot, so a fixed
        # source cell is the true mechanism, not a simplification. The
        # destination is un-tiled HBM (memory_space=ANY) where dynamic
        # 1-row slices are legal.
        dma = pltpu.make_async_copy(
            val_ref.at[pl.ds(0, 1)],
            plane_ref.at[pl.ds(slot, 1)],
            sem,
        )
        dma.start()
        dma.wait()
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def pallas_dma_stores(plane, slots, vals):
    n = slots.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vals
            pl.BlockSpec(memory_space=pl.ANY),      # plane stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        lambda slots_ref, vals_ref, plane_in, plane_out, sem: _dma_kernel(
            n, slots_ref, vals_ref, plane_out, sem),
        out_shape=jax.ShapeDtypeStruct(plane.shape, jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},
        interpret=INTERPRET,
    )(slots, vals, plane)


# --- c) Pallas blocked read-modify-write ----------------------------------
BLK = 1 << 16


def _rmw_kernel(slots_ref, vals_ref, plane_ref, out_ref):
    b = pl.program_id(0)
    lo = b * BLK
    blk = plane_ref[:]
    # merge the updates that land in this block: route misses to a
    # scratch slot PAST the block (a miss scattered at a real slot could
    # clobber a hit there — scatter order with duplicate indices is
    # unspecified)
    sl = slots_ref[:] - lo
    hit = (sl >= 0) & (sl < BLK)
    idx = jnp.where(hit, sl, BLK)
    ext = jnp.concatenate([blk, jnp.zeros((1,), blk.dtype)])
    ext = ext.at[idx].set(jnp.where(hit, vals_ref[:], 0))
    out_ref[:] = ext[:BLK]


@jax.jit
def pallas_blocked_rmw(plane, slots, vals):
    grid_spec = pl.GridSpec(
        grid=(CAP // BLK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            # index_map returns BLOCK indices (units of the block shape)
            pl.BlockSpec((BLK,), lambda b: (b,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK,), lambda b: (b,),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _rmw_kernel,
        out_shape=jax.ShapeDtypeStruct((CAP,), jnp.int32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )(slots, vals, plane[:CAP])


def main():
    global INTERPRET, U
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpreter validation (correctness only)")
    ap.add_argument("--dma-n", type=int, default=2048,
                    help="slots for the per-slot-DMA variant (serialized; "
                         "scale the ns/slot rate to U)")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    INTERPRET = args.interpret
    if args.interpret:
        # correctness only: the interpreter executes python per element,
        # so shrink the plane (CAP) as well as the update set
        global CAP, BLK
        U, CAP, BLK = 512, 1 << 14, 1 << 12

    rng = np.random.default_rng(0)
    slots = jnp.asarray(rng.choice(CAP, size=U, replace=False).astype(np.int32))
    versions = jnp.full((CAP + 1,), -1, jnp.int32)
    freqs = jnp.zeros((CAP + 1,), jnp.int32)
    create_steps = jnp.full((CAP + 1,), -1, jnp.int32)
    vals = jnp.full((U,), 7, jnp.int32)
    inc = jnp.ones((U,), jnp.int32)

    if args.interpret:
        # correctness of the two Pallas variants vs the XLA scatter
        v1, _, _ = jax.jit(xla_three_scatters)(versions, freqs, create_steps,
                                               slots, jnp.int32(7), inc)
        v2 = pallas_dma_stores(versions, slots, vals)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        v3 = pallas_blocked_rmw(versions, slots, vals)
        np.testing.assert_array_equal(np.asarray(v1)[:CAP], np.asarray(v3))
        print("interpret-mode equivalence: OK (dma + rmw match XLA scatter)")
        return

    jfn = jax.jit(xla_three_scatters)
    t_xla = timeit(lambda: jfn(versions, freqs, create_steps,
                               slots, jnp.int32(7), inc), iters=args.iters)
    print(f"a) XLA 3x 1-col scatters (set+add+set): {t_xla*1e3:8.3f} ms "
          f"({t_xla/3/U*1e9:.0f} ns/elem/plane)")

    try:
        small = slots[: args.dma_n]
        svals = vals[: args.dma_n]
        jdma = jax.jit(pallas_dma_stores)
        t_dma = timeit(lambda: jdma(versions, small, svals), iters=5)
        per = t_dma / args.dma_n
        print(f"b) Pallas per-slot DMA ({args.dma_n} slots): "
              f"{t_dma*1e3:8.3f} ms ({per*1e9:.0f} ns/slot) -> "
              f"U x 3 planes ~{3*per*U*1e3:.3f} ms")
    except Exception as e:  # pragma: no cover - record the failure mode
        print(f"b) Pallas per-slot DMA failed: {type(e).__name__}: {e}")

    try:
        jrmw = jax.jit(pallas_blocked_rmw)
        t_rmw = timeit(lambda: jrmw(versions, slots, vals), iters=args.iters)
        print(f"c) Pallas blocked RMW, ONE plane:       {t_rmw*1e3:8.3f} ms "
              f"(streams {CAP*4/2**20:.0f} MiB)")
    except Exception as e:  # pragma: no cover
        print(f"c) Pallas blocked RMW failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
