"""Vector-quantized compression of SH features (LightGaussian VecTree).

Counterpart of LightGaussian/vectree/vectree.py + vq.py: EMA k-means
(decay 0.8) over the 48-dim [DC | rest] SH feature rows, importance-guided
exclusion of the top (1 - vq_ratio) Gaussians (kept uncompressed), storage
as packed codebook indices (log2(K) bits each) + fp16 codebook + packed
keep-mask + fp16 geometry — the "extreme_saving" format re-expressed as one
npz. TPU-native: the assignment/update steps are jitted matmuls (distance
computation on the MXU).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from fovsplat.models.gaussians import GaussianParams


@functools.partial(jax.jit, static_argnames=("k",))
def _assign(data, codebook, k):
    """Nearest-codeword ids via the ||a-b||^2 = |a|^2 - 2ab + |b|^2 trick."""
    d2 = (jnp.sum(data * data, 1, keepdims=True)
          - 2.0 * data @ codebook.T
          + jnp.sum(codebook * codebook, 1)[None, :])
    return jnp.argmin(d2, axis=1)


def ema_kmeans(data: jnp.ndarray, k: int, iters: int = 10, decay: float = 0.8,
               key=None, batch: int = 80_000):
    """EMA k-means (VectorQuantize semantics: decay 0.8, chunked updates)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n, d = data.shape
    init_idx = jax.random.choice(key, n, (k,), replace=n < k)
    codebook = data[init_idx]
    ema_count = jnp.ones(k)
    ema_sum = codebook * ema_count[:, None]

    @jax.jit
    def update(codebook, ema_count, ema_sum, chunk):
        ids = _assign(chunk, codebook, k)
        one_hot_count = jnp.zeros(k).at[ids].add(1.0)
        sums = jnp.zeros((k, d)).at[ids].add(chunk)
        ema_count = decay * ema_count + (1 - decay) * one_hot_count
        ema_sum = decay * ema_sum + (1 - decay) * sums
        codebook = ema_sum / jnp.maximum(ema_count[:, None], 1e-5)
        return codebook, ema_count, ema_sum

    steps = max(iters, 1)
    perm_key = key
    for it in range(steps):
        perm_key, sk = jax.random.split(perm_key)
        start = int(jax.random.randint(sk, (), 0, max(n - batch, 1)))
        chunk = data[start:start + batch]
        codebook, ema_count, ema_sum = update(codebook, ema_count, ema_sum,
                                              chunk)
    return codebook


def compress(params: GaussianParams, importance: np.ndarray,
             vq_ratio: float = 0.6, codebook_size: int = 8192,
             iters: int = 10, key=None) -> dict:
    """Returns the compressed representation as a dict of numpy arrays
    (write with np.savez_compressed)."""
    n = params.num_points
    feats = jnp.concatenate([params.features_dc.reshape(n, -1),
                             params.features_rest.reshape(n, -1)], axis=1)
    imp = np.asarray(importance)
    keep_n = int(n * (1 - vq_ratio))
    keep_idx = np.argsort(-imp)[:keep_n]
    keep_mask = np.zeros(n, bool)
    keep_mask[keep_idx] = True

    vq_rows = jnp.asarray(np.asarray(feats)[~keep_mask])
    codebook = ema_kmeans(vq_rows, codebook_size, iters=iters, key=key)
    ids = np.asarray(_assign(vq_rows, codebook, codebook_size))

    bits = int(math.log2(codebook_size))
    bin_idx = ((ids[:, None] >> np.arange(bits - 1, -1, -1)) & 1).astype(bool)
    return {
        "codebook": np.asarray(codebook, np.float16),
        "vq_indices_packed": np.packbits(bin_idx.reshape(-1)),
        "num_vq": np.int64(ids.shape[0]),
        "bits": np.int64(bits),
        "keep_mask_packed": np.packbits(keep_mask),
        "n_points": np.int64(n),
        "kept_feats": np.asarray(feats, np.float16)[keep_mask],
        "xyz": np.asarray(params.xyz, np.float16),
        "scaling": np.asarray(params.scaling, np.float16),
        "rotation": np.asarray(params.rotation, np.float16),
        "opacity": np.asarray(params.opacity, np.float16),
        "sh_dim": np.int64(feats.shape[1]),
    }


def decompress(z: dict) -> GaussianParams:
    n = int(z["n_points"])
    bits = int(z["bits"])
    num_vq = int(z["num_vq"])
    sh_dim = int(z["sh_dim"])
    keep_mask = np.unpackbits(z["keep_mask_packed"])[:n].astype(bool)
    raw_bits = np.unpackbits(z["vq_indices_packed"])[:num_vq * bits]
    ids = raw_bits.reshape(num_vq, bits) @ (1 << np.arange(bits - 1, -1, -1))
    codebook = np.asarray(z["codebook"], np.float32)
    feats = np.zeros((n, sh_dim), np.float32)
    feats[keep_mask] = np.asarray(z["kept_feats"], np.float32)
    feats[~keep_mask] = codebook[ids]
    k_rest = (sh_dim - 3) // 3
    return GaussianParams(
        xyz=jnp.asarray(z["xyz"], jnp.float32),
        features_dc=jnp.asarray(feats[:, :3]).reshape(n, 1, 3),
        features_rest=jnp.asarray(feats[:, 3:]).reshape(n, k_rest, 3),
        scaling=jnp.asarray(z["scaling"], jnp.float32),
        rotation=jnp.asarray(z["rotation"], jnp.float32),
        opacity=jnp.asarray(z["opacity"], jnp.float32),
    )


def compressed_size_bytes(comp: dict) -> int:
    return sum(v.nbytes if isinstance(v, np.ndarray) else 8
               for v in comp.values())
