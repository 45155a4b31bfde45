"""User-behaviour sequence dataset (Amazon/Taobao-style) for DIN/DIEN/DSSM.

The reference trains DIN/DIEN on Amazon Books review sequences
(modelzoo/DIN/README.md, modelzoo/DIEN/) and DSSM on Taobao user/item
pairs (modelzoo/DSSM/train.py): each example is (user profile, candidate
item, behaviour history, label). This module provides the same schema:

  * ``uid``       int64 [B]      user id
  * ``item``      int64 [B]      candidate item
  * ``cate``      int64 [B]      candidate category
  * ``hist_item`` int64 [B, L]   clicked-item history (-1 padded)
  * ``hist_cate`` int64 [B, L]   category history (-1 padded)
  * ``label``     f32 [B]

plus a synthetic generator with genuine structure. The label mixes three
signals of increasing subtlety:

  1. a per-item hidden bias (directly learnable id -> label effect, like
     SyntheticCriteo) — any CTR model lifts on this quickly;
  2. a **repeat-interest** indicator: the candidate's latent affinity with
     the single best-matching history item — exactly what DIN's local
     activation unit computes, so attention models lift further;
  3. a taste·candidate latent affinity (pure co-occurrence structure that
     needs long representation learning — the realistic slow tail).

Broken sequence masking/pooling shows up as a DIN/DSSM model that cannot
beat the bias-only AUC.
"""
from __future__ import annotations

import itertools
from typing import Dict, Iterator, Optional

import numpy as np

FEATURES = ["uid", "item", "cate", "hist_item", "hist_cate"]


class SyntheticBehavior:
    """Streaming synthetic behaviour-sequence batches."""

    def __init__(
        self,
        batch_size: int,
        max_len: int = 32,
        n_users: int = 10_000,
        n_items: int = 50_000,
        n_cates: int = 200,
        latent_dim: int = 8,
        seed: int = 0,
        noise: float = 0.5,
    ):
        self.batch_size = batch_size
        self.max_len = max_len
        self.n_users = n_users
        self.n_items = n_items
        self.n_cates = n_cates
        self.rng = np.random.default_rng(seed)
        wrng = np.random.default_rng(1234)  # label model shared across seeds
        self.item_vec = wrng.normal(size=(n_items, latent_dim)).astype(np.float32)
        self.item_cate = wrng.integers(0, n_cates, size=n_items)
        self.noise = noise

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        B, L = self.batch_size, self.max_len
        rng = self.rng
        uid = rng.integers(0, self.n_users, size=B)
        # history: a user's clicks cluster around a taste point in latent
        # space — draw a taste, pick items by affinity-biased sampling
        taste_items = rng.integers(0, self.n_items, size=B)
        taste = self.item_vec[taste_items]                    # [B, d]
        lens = rng.integers(4, L + 1, size=B)
        cand = rng.integers(0, self.n_items, size=B)
        hist_item = np.full((B, L), -1, np.int64)
        hist_cate = np.full((B, L), -1, np.int64)
        pool = rng.integers(0, self.n_items, size=(B, L, 4))
        aff = np.einsum("bd,blkd->blk", taste, self.item_vec[pool])
        pick = pool[np.arange(B)[:, None], np.arange(L)[None, :],
                    np.argmax(aff, axis=-1)]
        for b in range(B):
            hist_item[b, :lens[b]] = pick[b, :lens[b]]
            hist_cate[b, :lens[b]] = self.item_cate[pick[b, :lens[b]]]
        # label signal 1: per-item hidden bias (hash-derived, O(1) memory)
        h = (cand.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + np.uint64(77))
        h ^= h >> np.uint64(29)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        bias = ((h >> np.uint64(40)).astype(np.float64) / (1 << 24) - 0.5) * 2.0
        # label signal 2: best affinity between candidate and any history
        # item (the DIN-attention-shaped signal); padding excluded
        cand_aff = np.einsum("bd,bld->bl", self.item_vec[cand],
                             self.item_vec[np.maximum(hist_item, 0)])
        cand_aff = np.where(hist_item >= 0, cand_aff, -np.inf)
        repeat = np.tanh(np.max(cand_aff, axis=1) / 2.0)
        # label signal 3: latent taste affinity (slow co-occurrence tail)
        logit = (1.2 * bias + 1.2 * repeat
                 + 0.5 * np.einsum("bd,bd->b", taste, self.item_vec[cand]))
        logit += rng.normal(0, self.noise, size=B)
        p = 1.0 / (1.0 + np.exp(-logit))
        return {
            "uid": uid.astype(np.int64),
            "item": cand.astype(np.int64),
            "cate": self.item_cate[cand].astype(np.int64),
            "hist_item": hist_item,
            "hist_cate": hist_cate,
            "label": (rng.random(B) < p).astype(np.float32),
        }

    def take(self, n: int):
        return itertools.islice(self, n)
