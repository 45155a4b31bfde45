"""Fused lookup+pool kernel (interpret mode on CPU)."""
import numpy as np

import jax.numpy as jnp

from deeprec_tpu.ops.pallas_fused_lookup import fused_pooled_lookup


def test_fused_pooled_lookup_mean_and_sum(rng):
    # W=20 > the kernel's DMA pipeline depth (8): exercises the
    # steady-state reissue branch, not just the warm-up loop
    R, D, B, W = 512, 128, 96, 20
    vals = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
    slots = jnp.asarray(rng.integers(0, R, size=(B, W)), jnp.int32)
    valid = jnp.asarray(rng.random((B, W)) < 0.6)
    v, s, m = np.asarray(vals), np.asarray(slots), np.asarray(valid)
    rows = v[s] * m[..., None]
    ref_mean = rows.sum(1) / np.maximum(m.sum(1, keepdims=True), 1)
    out = fused_pooled_lookup(vals, slots, valid, combiner="mean")
    np.testing.assert_allclose(np.asarray(out), ref_mean, rtol=1e-5, atol=1e-5)
    out_sum = fused_pooled_lookup(vals, slots, valid, combiner="sum")
    np.testing.assert_allclose(np.asarray(out_sum), rows.sum(1),
                               rtol=1e-5, atol=1e-5)
    out_sq = fused_pooled_lookup(vals, slots, valid, combiner="sqrtn")
    ref_sq = rows.sum(1) / np.sqrt(np.maximum(m.sum(1, keepdims=True), 1))
    np.testing.assert_allclose(np.asarray(out_sq), ref_sq, rtol=1e-5, atol=1e-5)
    import pytest
    with pytest.raises(ValueError):
        fused_pooled_lookup(vals, slots, valid, combiner="Sum")


def test_fused_pooled_lookup_all_invalid_row(rng):
    R, D = 64, 128
    vals = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
    slots = jnp.zeros((4, 4), jnp.int32)
    valid = jnp.zeros((4, 4), bool)
    out = np.asarray(fused_pooled_lookup(vals, slots, valid))
    np.testing.assert_allclose(out, 0.0)
