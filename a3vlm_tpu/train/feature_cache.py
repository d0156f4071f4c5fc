"""Tower-feature cache: skip the frozen vision towers after epoch 0.

The A3VLM recipe freezes all four vision towers (reference
llama_ens5.py:345-352 no_train_prefix); only the projectors, image tags,
and the decoder train. The towers' pre-projection features are therefore
CONSTANT per image for the whole run — yet the reference recomputes them
every step. On this framework's multimodal train step they are ~50% of
the wall time at 12.8% MXU utilization (scripts/profile_train.py device
trace: towers fwd 363 ms of a 724 ms step).

``TowerFeatureCache`` computes ``ens5.encode_image_features`` (the frozen
half: BLIP-2 Q-Former queries + the CLIP++ConvNeXt++DINOv2 ensemble,
both pre-projection and stop_gradient'ed) once per dataset index and
replays it afterwards; ``FeatureCachingLoader`` wraps a DataLoader
(constructed with ``with_indices=True``) and swaps each batch's ``image``
for ``image_feat_q``/``image_feat_ens``, which ens5.forward accepts via
``image_features``. Epoch 0 pays the towers exactly once (computed at
full batch width on device); every later epoch runs tower-free.

Numerics: features are stored in their on-device dtype (bf16 under the
bf16 policy), so a cached-feature step is BIT-IDENTICAL to the uncached
step — pinned by tests/test_feature_cache.py.

Memory: one 448px image costs 5 crops x (32x768 + 257x5632) ~= 7.4M
values (~14.7 MB bf16). ``cache_dir`` spills per-index .npz files to disk
(bf16 stored as a uint16 view) instead of holding the epoch in RAM.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from a3vlm_tpu.models import ens5

_KEYS = ("q", "ens")


def _to_disk(path: str, per_img: dict) -> None:
    arrs = {}
    for k in _KEYS:
        a = per_img[k]
        if a.dtype == jnp.bfloat16:
            arrs[k] = a.view(np.uint16)
            arrs[k + "_bf16"] = np.asarray(True)
        else:
            arrs[k] = a
    np.savez(path, **arrs)


def _from_disk(path: str) -> dict:
    with np.load(path) as z:
        out = {}
        for k in _KEYS:
            a = z[k]
            if k + "_bf16" in z:
                a = a.view(jnp.bfloat16)
            out[k] = a
        return out


class TowerFeatureCache:
    """Per-dataset-index store of frozen tower features.

    ``params`` is the full ens5 param tree (tower subtrees are captured by
    reference — they are frozen, so they never go stale); ``cfg`` the
    Ens5Config. ``get_batch(indices, images)`` returns the
    encode_image_features dict for the batch, computing and storing any
    batch that contains a miss in ONE device call (a single jit shape:
    partial-miss batches recompute the whole batch rather than compiling
    per-miss-count shapes — remote TPU compiles cost 20-120 s each)."""

    def __init__(self, params, cfg, cache_dir: Optional[str] = None):
        self.cfg = cfg
        self._towers = {k: params[k] for k in ens5.FROZEN_PREFIXES}
        self._fn = jax.jit(
            lambda p, img: ens5.encode_image_features(p, cfg, img)
        )
        self._ram: dict[int, dict] = {}
        self._dir = cache_dir
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
        self.computed = 0  # batches that ran the towers (observability)

    # -- storage ----------------------------------------------------------
    def _path(self, idx: int) -> str:
        return os.path.join(self._dir, f"feat_{idx}.npz")

    def _have(self, idx: int) -> bool:
        if idx in self._ram:
            return True
        return bool(self._dir) and os.path.exists(self._path(idx))

    def _load(self, idx: int) -> dict:
        if idx in self._ram:
            return self._ram[idx]
        return _from_disk(self._path(idx))

    def _store(self, idx: int, per_img: dict) -> None:
        if self._dir:
            _to_disk(self._path(idx), per_img)
        else:
            self._ram[idx] = per_img

    # -- batch API ---------------------------------------------------------
    def get_batch(self, indices, images) -> dict:
        """indices: [B] ints; images: [B, H, W, 3] (only read on a miss).
        Returns {"q": [5B, nq, Dq], "ens": [5B, 257, De]} numpy, laid out
        exactly like encode_image_features (crop-major: row b + c*B is
        image b's crop c)."""
        indices = [int(i) for i in indices]
        B = len(indices)
        if all(self._have(i) for i in indices):
            per = [self._load(i) for i in indices]
            # per-image [5, T, D] -> crop-major [5B, T, D]
            return {
                k: np.stack([p[k] for p in per], axis=1).reshape(
                    5 * B, *per[0][k].shape[1:]
                )
                for k in _KEYS
            }
        feats = self._fn(self._towers, jnp.asarray(images))
        self.computed += 1
        out = {k: np.asarray(feats[k]) for k in _KEYS}
        for pos, idx in enumerate(indices):
            self._store(
                idx,
                {
                    k: out[k].reshape(5, B, *out[k].shape[1:])[:, pos]
                    for k in _KEYS
                },
            )
        return out


class FeatureCachingLoader:
    """Wrap a DataLoader (with_indices=True) so every multimodal batch
    carries ``image_feat_q``/``image_feat_ens`` instead of ``image`` —
    and, for the 2-images variant (``depth_cache`` given),
    ``depth_feat_q``/``depth_feat_ens`` instead of ``depth_image`` (both
    streams run the same frozen towers, llama_ens5_2images.py:479-500, so
    the cache win doubles). Handles grad-accum batches ([accum, bs, ...]
    leaves) by caching each micro-batch; text-only batches (no "image"
    key) pass through."""

    def __init__(self, loader, cache: TowerFeatureCache,
                 depth_cache: Optional[TowerFeatureCache] = None):
        self.loader = loader
        self.cache = cache
        self.depth_cache = depth_cache

    def __len__(self) -> int:
        return len(self.loader)

    def close(self):
        self.loader.close()

    def _swap(self, idx, img, stream="image") -> dict:
        cache = self.cache if stream == "image" else self.depth_cache
        f = cache.get_batch(idx, img)
        pre = "image_feat_" if stream == "image" else "depth_feat_"
        return {pre + "q": f["q"], pre + "ens": f["ens"]}

    def __iter__(self) -> Iterator[dict]:
        for batch in self.loader:
            idx = batch.pop("_indices", None)
            if "image" not in batch or idx is None:
                if idx is None and "image" in batch:
                    raise ValueError(
                        "FeatureCachingLoader needs DataLoader("
                        "with_indices=True)"
                    )
                yield batch
                continue
            if "depth_image" in batch and self.depth_cache is None:
                raise ValueError(
                    "depth batches need FeatureCachingLoader(depth_cache=...)"
                    " (2-images variant)"
                )
            streams = [("image", batch.pop("image"))]
            if "depth_image" in batch:
                streams.append(("depth_image", batch.pop("depth_image")))
            for key, img in streams:
                stream = "image" if key == "image" else "depth"
                if img.ndim == 5 and idx.ndim == 2:  # [accum, bs, H, W, 3]
                    per = [
                        self._swap(idx[a], img[a], stream)
                        for a in range(img.shape[0])
                    ]
                    for k in per[0]:
                        batch[k] = np.stack([p[k] for p in per])
                else:
                    batch.update(self._swap(idx, img, stream))
            yield batch
