"""Pallas gather kernel (interpret mode on the CPU mesh)."""
import numpy as np

import jax.numpy as jnp

from deeprec_tpu.ops.pallas_gather import gather_rows


def test_gather_rows_matches_xla(rng):
    vals = jnp.asarray(rng.normal(size=(1024, 16)), jnp.float32)
    slots = jnp.asarray(rng.integers(0, 1023, size=700), jnp.int32)
    out = gather_rows(vals, slots)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(vals)[np.asarray(slots)])


def test_gather_rows_clamps_oob(rng):
    vals = jnp.asarray(rng.normal(size=(512, 32)), jnp.float32)
    slots = jnp.asarray([-5, 0, 511, 9999], jnp.int32)
    out = np.asarray(gather_rows(vals, slots))
    np.testing.assert_allclose(out[0], np.asarray(vals)[0])
    np.testing.assert_allclose(out[3], np.asarray(vals)[511])


def test_gather_rows_wide_dim(rng):
    vals = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    slots = jnp.asarray(rng.integers(0, 255, size=300), jnp.int32)
    out = gather_rows(vals, slots)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(vals)[np.asarray(slots)])
