"""Dense building blocks for the CTR model zoo.

TPU-first counterparts of the reference modelzoo's graph snippets
(modelzoo/{WDL,DLRM,DeepFM,DCN,DSSM,DIN,DIEN}): MLP towers, DLRM dot
interaction, DCN-v2 cross layers, FM second-order interaction, Dice
activation and DIN attention pooling (modelzoo/DIN/script/{model.py,
utils.py}), and GRU/AUGRU cells for DIEN interest evolution
(modelzoo/DIEN/script/rnn.py) expressed as ``lax.scan`` recurrences.

Everything is flax.linen over jnp; matmuls stay large/batched for the MXU
and accept a ``param_dtype``/``compute_dtype`` policy — bf16 compute is the
analog of the reference's keep_weights(bf16) scopes
(modelzoo/WDL/train.py:249-268).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLPTower(nn.Module):
    """Stacked Dense+activation (the [1024, 512, 256] deep tower of WDL
    etc.). ``final_units``: extra linear head without activation."""

    units: Sequence[int]
    activation: Callable = nn.relu
    final_units: Optional[int] = None
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        for i, u in enumerate(self.units):
            x = nn.Dense(u, name=f"dense_{i}", dtype=self.compute_dtype)(x)
            x = self.activation(x)
        if self.final_units is not None:
            x = nn.Dense(self.final_units, name="head", dtype=self.compute_dtype)(x)
        return x.astype(jnp.float32)


class DotInteraction(nn.Module):
    """DLRM pairwise dot interaction (modelzoo/DLRM/train.py:151-161):
    takes [B, F, d] feature vectors, returns the strictly-lower-triangular
    entries of the [F, F] Gram matrix, flattened."""

    self_interaction: bool = False

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        B, F, d = feats.shape
        gram = jnp.einsum("bfd,bgd->bfg", feats, feats)  # MXU batched matmul
        rows, cols = jnp.tril_indices(F, 0 if self.self_interaction else -1)
        return gram[:, rows, cols]


class CrossNetV2(nn.Module):
    """DCN-v2 cross layers: x_{l+1} = x0 ⊙ (W x_l + b) + x_l. ``low_rank``
    uses the two-factor parameterisation (W = U V^T) for big widths."""

    num_layers: int = 3
    low_rank: Optional[int] = None
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0: jax.Array) -> jax.Array:
        x0 = x0.astype(self.compute_dtype)
        x = x0
        d = x0.shape[-1]
        for i in range(self.num_layers):
            if self.low_rank:
                v = nn.Dense(self.low_rank, use_bias=False, name=f"v_{i}",
                             dtype=self.compute_dtype)(x)
                w = nn.Dense(d, name=f"u_{i}", dtype=self.compute_dtype)(v)
            else:
                w = nn.Dense(d, name=f"w_{i}", dtype=self.compute_dtype)(x)
            x = x0 * w + x
        return x.astype(jnp.float32)


class FMInteraction(nn.Module):
    """Second-order FM pooling via the sum-square trick:
    0.5·((Σv)² − Σv²), summed over the latent dim -> [B, 1] (DeepFM)."""

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        s = jnp.sum(feats, axis=1)
        sum_sq = s * s
        sq_sum = jnp.sum(feats * feats, axis=1)
        return 0.5 * jnp.sum(sum_sq - sq_sum, axis=-1, keepdims=True)


class Dice(nn.Module):
    """Dice activation (DIN, modelzoo/DIN/script/utils.py): a data-adaptive
    PReLU where the gate is a sigmoid of the batch-normalised input.

    Training normalises with live batch statistics and folds them into
    running averages (the reference's tf.layers.batch_normalization inside
    dice); eval uses the RUNNING stats, so serving output is independent of
    eval-batch composition. The running stats live in the ``batch_stats``
    flax collection — the trainers thread it automatically."""

    epsilon: float = 1e-9
    momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train: bool = True):
        dim = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.zeros, (dim,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((dim,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((dim,), jnp.float32))
        if train:
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0)
            if self.is_mutable_collection("batch_stats") \
                    and not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * \
                    jax.lax.stop_gradient(mean.astype(jnp.float32))
                ra_var.value = m * ra_var.value + (1 - m) * \
                    jax.lax.stop_gradient(var.astype(jnp.float32))
        else:
            mean = ra_mean.value.astype(x.dtype)
            var = ra_var.value.astype(x.dtype)
        p = jax.nn.sigmoid((x - mean) * jax.lax.rsqrt(var + self.epsilon))
        return p * x + (1.0 - p) * alpha * x


class DINAttention(nn.Module):
    """DIN local activation unit (modelzoo/DIN/script/model.py attention):
    scores each behaviour-sequence item against the candidate via an MLP on
    [q, k, q-k, q*k], masked softmax, weighted-sum pooling -> [B, d]."""

    hidden_units: Sequence[int] = (80, 40)

    @nn.compact
    def __call__(self, query: jax.Array, keys: jax.Array, mask: jax.Array) -> jax.Array:
        B, L, d = keys.shape
        q = jnp.broadcast_to(query[:, None, :], (B, L, d))
        x = jnp.concatenate([q, keys, q - keys, q * keys], axis=-1)
        for i, u in enumerate(self.hidden_units):
            x = nn.Dense(u, name=f"att_{i}")(x)
            x = nn.sigmoid(x)
        logits = nn.Dense(1, name="att_out")(x)[..., 0]  # [B, L]
        logits = jnp.where(mask, logits, -1e9)
        w = jax.nn.softmax(logits / jnp.sqrt(float(d)), axis=-1)
        w = jnp.where(mask, w, 0.0)
        return jnp.einsum("bl,bld->bd", w, keys)


class GRUCellP(nn.Module):
    """Plain GRU cell (DIEN interest extraction, rnn.py GRUCell)."""

    features: int

    @nn.compact
    def __call__(self, h, x):
        zr = nn.Dense(2 * self.features, name="gates")(jnp.concatenate([x, h], -1))
        z, r = jnp.split(jax.nn.sigmoid(zr), 2, axis=-1)
        n = jnp.tanh(nn.Dense(self.features, name="cand")(jnp.concatenate([x, r * h], -1)))
        return (1.0 - z) * h + z * n


class AUGRUCell(nn.Module):
    """Attention-update GRU (DIEN interest evolution, rnn.py AUGRU): the
    update gate is scaled by the attention weight a_t."""

    features: int

    @nn.compact
    def __call__(self, h, x, a):
        zr = nn.Dense(2 * self.features, name="gates")(jnp.concatenate([x, h], -1))
        z, r = jnp.split(jax.nn.sigmoid(zr), 2, axis=-1)
        n = jnp.tanh(nn.Dense(self.features, name="cand")(jnp.concatenate([x, r * h], -1)))
        z = a[..., None] * z
        return (1.0 - z) * h + z * n


class GRU(nn.Module):
    """Unrolled GRU over [B, L, d] via lax.scan; returns all hidden states
    [B, L, features]. Padding steps hold the previous state."""

    features: int

    @nn.compact
    def __call__(self, xs: jax.Array, mask: jax.Array) -> jax.Array:
        B, L, d = xs.shape
        cell = nn.scan(
            GRUCellP, variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        h0 = jnp.zeros((B, self.features), xs.dtype)

        class Wrap(nn.Module):
            features: int

            @nn.compact
            def __call__(self, h, xm):
                x, m = xm
                h_new = GRUCellP(self.features)(h, x)
                h = jnp.where(m[..., None], h_new, h)
                return h, h

        scan = nn.scan(Wrap, variable_broadcast="params", split_rngs={"params": False},
                       in_axes=1, out_axes=1)
        _, hs = scan(self.features, name="gru")(h0, (xs, mask))
        return hs


class AUGRU(nn.Module):
    """AUGRU over [B, L, d] with attention weights [B, L]; returns final
    hidden state [B, features]."""

    features: int

    @nn.compact
    def __call__(self, xs: jax.Array, att: jax.Array, mask: jax.Array) -> jax.Array:
        B, L, d = xs.shape

        class Wrap(nn.Module):
            features: int

            @nn.compact
            def __call__(self, h, xam):
                x, a, m = xam
                h_new = AUGRUCell(self.features)(h, x, a)
                h = jnp.where(m[..., None], h_new, h)
                return h, h

        scan = nn.scan(Wrap, variable_broadcast="params", split_rngs={"params": False},
                       in_axes=1, out_axes=1)
        h0 = jnp.zeros((B, self.features), xs.dtype)
        h_last, _ = scan(self.features, name="augru")(h0, (xs, att, mask))
        return h_last
