"""Masked batched primitives for ragged MIL bags on TPU.

All MIL kernels in this framework consume fixed-shape, length-bucketed bags
``(x[B, N, D], mask[B, N])`` where ``mask`` marks valid instances.  The
reference framework instead runs batch=1 with dynamic bag lengths and
host-side set arithmetic (reference: modules/mhim_modules/masking.py:78-80),
which forces a device→host sync per step and a recompile per bag size.  Here
every op is a pure, statically-shaped XLA program: variable counts are traced
*values* (never shapes), selections are boolean masks, and "shrinking" a bag
is a stable-sort permutation that moves kept instances to the front.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# A large-but-finite negative fill. Using finfo.min instead of -inf keeps
# softmax of fully-masked rows NaN-free after the final `where`.
NEG_INF = -1e30


def einsum_f32(subscripts: str, *operands: jax.Array) -> jax.Array:
    """Einsum with fp32 accumulation and output from (possibly bf16) operands.

    On TPU this is the MXU's native mixed-precision dot
    (``preferred_element_type=float32`` — reads stay narrow, accumulator is
    fp32). The CPU dot thunk lacks BF16xBF16=F32 support, so other backends
    upcast the operands instead (tests run on CPU; perf paths run on TPU).
    """
    if jax.default_backend() == "tpu":
        return jnp.einsum(
            subscripts, *operands, preferred_element_type=jnp.float32
        )
    return jnp.einsum(subscripts, *(o.astype(jnp.float32) for o in operands))


def masked_softmax(logits: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax over ``axis`` restricted to positions where ``mask`` is True.

    Fully-masked rows return all zeros (not NaN). ``mask`` broadcasts against
    ``logits``.

    Statistics (max subtraction, exp, denominator sum) always run in fp32;
    the result is returned in the input dtype, so bf16 attention tensors stay
    bf16 in HBM (halving the dominant traffic of the Nystrom softmaxes) while
    the math stays stable.
    """
    out_dtype = logits.dtype
    logits = jnp.where(mask, logits.astype(jnp.float32), NEG_INF)
    # Subtract a finite max for stability even when everything is masked.
    m = jnp.max(logits, axis=axis, keepdims=True)
    # Cast the exp to the output dtype *before* the denominator sum so the
    # materialized intermediate is narrow; the sum still accumulates in fp32.
    unnorm = (jnp.exp(logits - jax.lax.stop_gradient(m)) * mask).astype(out_dtype)
    denom = jnp.sum(unnorm, axis=axis, keepdims=True, dtype=jnp.float32)
    return (unnorm / jnp.maximum(denom, 1e-30)).astype(out_dtype)


def masked_logsumexp(logits: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=axis, keepdims=True)
    s = jnp.sum(jnp.exp(logits - m) * mask, axis=axis)
    return jnp.squeeze(m, axis) + jnp.log(jnp.maximum(s, 1e-30))


def masked_mean(x: jax.Array, mask: jax.Array, axis: int = -2) -> jax.Array:
    """Mean of ``x`` over ``axis`` counting only masked-in positions.

    ``mask`` must broadcast to ``x``'s shape (typically ``mask[..., None]``
    against ``x[B, N, D]`` with axis=-2).
    """
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    num = jnp.sum(x * mask, axis=axis)
    den = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return num / den


def masked_max(x: jax.Array, mask: jax.Array, axis: int = -2) -> jax.Array:
    mask = jnp.broadcast_to(mask, x.shape)
    return jnp.max(jnp.where(mask, x, NEG_INF), axis=axis)


def rank_by_score(scores: jax.Array, valid: jax.Array, descending: bool = True) -> jax.Array:
    """Dense rank (0 = best) of each position by score among valid positions.

    Invalid positions always rank after every valid one. Ties are broken by
    position index (stable) — a deterministic replacement for the reference's
    ``torch.topk(sorted=False)`` nondeterminism (reference:
    modules/mhim_modules/masking.py:53-58; divergence documented in SURVEY.md §7).

    Works on the last axis; leading axes are batched.
    """
    s = jnp.asarray(scores, jnp.float32)
    fill = NEG_INF if descending else -NEG_INF
    s = jnp.where(valid, s, fill)
    key = -s if descending else s
    order = jnp.argsort(key, axis=-1, stable=True)
    ranks = jnp.argsort(order, axis=-1)
    return ranks


def topk_mask(
    scores: jax.Array,
    valid: jax.Array,
    k: jax.Array,
    largest: bool = True,
) -> jax.Array:
    """Boolean mask of the top-``k`` valid positions by score.

    ``k`` may be a traced per-batch integer (shape broadcastable to the
    leading axes of ``scores``): this replaces ``torch.topk`` with a
    statically-shaped threshold test so the instance count can depend on
    runtime bag sizes and cosine mask-ratio schedules without recompilation.

    Implementation: one value-sort finds the k-th score; positions strictly
    beyond it are in, and ties at the threshold are admitted in ascending
    index order via a cumulative count — the same deterministic tie-break as
    a stable rank, at roughly half the cost of the argsort-of-argsort ranking
    (sorts dominate the MHIM mining stage on TPU).
    """
    s = jnp.asarray(scores, jnp.float32)
    # key-space: best = smallest; invalid always sorts last (ascending).
    key = jnp.where(valid, -s if largest else s, -NEG_INF)
    skey = jnp.sort(key, axis=-1)  # ascending: best first
    k = jnp.asarray(k)
    if k.ndim < key.ndim - 1:
        k = k[..., None] if k.ndim else jnp.broadcast_to(k, key.shape[:-1])
    k = jnp.broadcast_to(k, key.shape[:-1])
    idx = jnp.clip(k - 1, 0, key.shape[-1] - 1)
    thr = jnp.take_along_axis(skey, idx[..., None], axis=-1)  # [..., 1]
    below = (key < thr) & valid
    ties = (key == thr) & valid
    n_below = jnp.sum(below, axis=-1, keepdims=True)
    tie_rank = jnp.cumsum(ties.astype(jnp.int32), axis=-1)  # 1-based
    sel = below | (ties & (tie_rank <= (k[..., None] - n_below)))
    return sel & (k[..., None] > 0)


def random_subset_mask(rng: jax.Array, pool: jax.Array, k: jax.Array) -> jax.Array:
    """Uniformly choose ``k`` elements from the True positions of ``pool``.

    ``k`` is a traced integer (broadcast over leading axes). Returns a boolean
    mask that is a subset of ``pool``.
    """
    u = jax.random.uniform(rng, pool.shape)
    return topk_mask(u, pool, k, largest=True)


def compact(x: jax.Array, keep: jax.Array, out_len: int | None = None):
    """Move kept instances to the front of the bag, preserving index order.

    Returns ``(x_sorted, new_valid, perm)`` where ``x_sorted[b, :n_keep_b]``
    are the kept instances of bag ``b`` in ascending original-index order and
    ``new_valid[b, i] = i < n_keep_b``.

    ``out_len`` truncates the result to a static prefix length: the gather
    then moves only ``out_len`` rows instead of the full bag. The caller must
    guarantee ``n_keep_b <= out_len`` for every bag (see MHIM's worst-case
    union bound) — kept rows beyond it would be silently dropped.

    This is the TPU equivalent of the reference's
    ``mask_ids = [keep_ids ‖ masked_ids]; gather(:len_keep)`` (reference:
    modules/mhim_modules/masking.py:78-88,91-110): the reference's kept-ids
    are also in ascending order (a Python set difference over ``range(ps)``),
    so the compacted prefix is identical — only the representation of the
    suffix differs (masked-out padding instead of a shorter tensor).
    """
    keep = keep.astype(bool)
    # Stable argsort of "not kept" puts kept indices first, ascending.
    perm = jnp.argsort(~keep, axis=-1, stable=True)
    if out_len is not None and out_len < keep.shape[-1]:
        perm = perm[..., :out_len]
    x_sorted = jnp.take_along_axis(x, perm[..., None], axis=-2)
    n_keep = jnp.sum(keep, axis=-1, keepdims=True)
    idx = jnp.arange(perm.shape[-1])[None, :]
    new_valid = idx < n_keep
    return x_sorted, new_valid, perm
