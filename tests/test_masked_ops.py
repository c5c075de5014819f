import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhim_mil_tpu.ops import (
    masked_softmax,
    masked_mean,
    masked_max,
    rank_by_score,
    topk_mask,
    random_subset_mask,
    compact,
    select_mask,
    layered_mask,
    MaskSchedule,
)


def test_masked_softmax_matches_dense_on_valid():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 10)).astype(np.float32)
    mask = np.array([[True] * 6 + [False] * 4, [True] * 10])
    out = masked_softmax(jnp.array(x), jnp.array(mask))
    ref0 = jax.nn.softmax(jnp.array(x[0, :6]))
    np.testing.assert_allclose(np.asarray(out)[0, :6], np.asarray(ref0), rtol=1e-5)
    assert np.all(np.asarray(out)[0, 6:] == 0)
    np.testing.assert_allclose(np.asarray(out).sum(-1), [1.0, 1.0], rtol=1e-5)


def test_masked_softmax_all_masked_is_zero_not_nan():
    x = jnp.ones((1, 4))
    out = masked_softmax(x, jnp.zeros((1, 4), bool))
    assert np.all(np.asarray(out) == 0)


def test_masked_mean_max():
    x = jnp.array([[[1.0], [2.0], [100.0]]])
    m = jnp.array([[True, True, False]])
    assert masked_mean(x, m[..., None])[0, 0] == 1.5
    assert masked_max(x, m[..., None])[0, 0] == 2.0


def test_rank_and_topk_mask():
    scores = jnp.array([[0.1, 0.9, 0.5, 0.7]])
    valid = jnp.array([[True, True, True, False]])
    ranks = rank_by_score(scores, valid, descending=True)
    # 0.9 -> rank 0, 0.5 -> rank 1, 0.1 -> rank 2; invalid last
    assert list(np.asarray(ranks)[0]) == [2, 0, 1, 3]
    sel = topk_mask(scores, valid, jnp.array([2]), largest=True)
    assert list(np.asarray(sel)[0]) == [False, True, True, False]
    sel_small = topk_mask(scores, valid, jnp.array([1]), largest=False)
    assert list(np.asarray(sel_small)[0]) == [True, False, False, False]


def test_random_subset_mask_count_and_subset():
    rng = jax.random.PRNGKey(0)
    pool = jnp.array([[True, True, False, True, True, False]])
    sel = random_subset_mask(rng, pool, jnp.array([2]))
    sel = np.asarray(sel)
    assert sel.sum() == 2
    assert not sel[0, 2] and not sel[0, 5]


def test_compact_moves_kept_to_front_in_order():
    x = jnp.arange(6.0).reshape(1, 6, 1)
    keep = jnp.array([[False, True, False, True, True, False]])
    xs, valid, _ = compact(x, keep)
    assert list(np.asarray(xs)[0, :3, 0]) == [1.0, 3.0, 4.0]
    assert list(np.asarray(valid)[0]) == [True, True, True, False, False, False]


def test_select_mask_high_attention_counts():
    rng = jax.random.PRNGKey(0)
    n = 20
    attn = jnp.linspace(0, 1, n)[None, :]
    valid = jnp.ones((1, n), bool)
    sel = select_mask(rng, attn, valid, 0.25, largest=True)
    sel = np.asarray(sel)
    assert sel.sum() == int(np.ceil(n * 0.25))
    # selected must be the highest-attention instances
    assert sel[0, -5:].all()


def test_select_mask_respects_padding():
    rng = jax.random.PRNGKey(0)
    attn = jnp.array([[0.1, 0.2, 0.3, 0.4, 100.0, 100.0]])
    valid = jnp.array([[True, True, True, True, False, False]])
    sel = np.asarray(select_mask(rng, attn, valid, 0.5, largest=True))
    assert not sel[0, 4] and not sel[0, 5]
    assert sel.sum() == 2  # ceil(4 * 0.5)
    # low-attention: padding must also never be selected
    sel_l = np.asarray(select_mask(rng, -attn, valid, 0.5, largest=False))
    assert not sel_l[0, 4] and not sel_l[0, 5]


def test_select_mask_vote_multihead():
    rng = jax.random.PRNGKey(1)
    n = 12
    base = jnp.linspace(0, 1, n)
    attn = jnp.stack([base, base, base[::-1]])[None]  # [1,3,N], 2/3 heads agree
    valid = jnp.ones((1, n), bool)
    sel = np.asarray(select_mask(rng, attn, valid, 0.25, largest=True, msa_fusion="vote"))
    assert sel.sum() == int(np.ceil(n * 0.25))
    # the majority (ascending) heads should dominate the vote
    assert sel[0, -1]


def test_select_mask_union_with_prev():
    rng = jax.random.PRNGKey(2)
    n = 10
    attn = jnp.linspace(0, 1, n)[None, :]
    valid = jnp.ones((1, n), bool)
    prev = jnp.zeros((1, n), bool).at[0, 0].set(True)
    sel = np.asarray(select_mask(rng, attn, valid, 0.2, largest=True, prev=prev))
    assert sel[0, 0]  # union keeps prev
    # ps_tmp = 9 -> ceil(9*0.2)=2 new selections
    assert sel.sum() == 3


def test_select_mask_random_ratio_pure_random():
    # reference trick: random_ratio=0.001 makes pool=all -> uniform random mask
    rng = jax.random.PRNGKey(3)
    n = 100
    attn = jnp.linspace(0, 1, n)[None, :]
    valid = jnp.ones((1, n), bool)
    sel = np.asarray(
        select_mask(rng, attn, valid, 0.3, largest=False, random_ratio=0.001)
    )
    assert sel.sum() == int(np.ceil(n * 0.3))
    # should NOT be simply the 30 lowest-attention instances
    assert not sel[0, :30].all()


def test_layered_mask_composition():
    rng = jax.random.PRNGKey(4)
    n = 40
    attn = jnp.linspace(0, 1, n)[None, :]
    valid = jnp.ones((1, n), bool)
    sched = MaskSchedule(mask_ratio=0.1, mask_ratio_l=0.1, mask_ratio_h=0.1)
    removed = np.asarray(layered_mask(rng, attn, valid, sched))
    # at least the high-attn stage count, at most the sum of stages
    assert 4 <= removed.sum() <= 12
    # highest-attention instance must be removed by stage 3
    assert removed[0, -1]


def test_layered_mask_jit_with_scheduled_ratio():
    sched = MaskSchedule(mask_ratio_h=0.5, mask_ratio_hr=1.0)

    @jax.jit
    def f(rng, attn, valid, mrh):
        return layered_mask(rng, attn, valid, sched, mask_ratio_h_now=mrh)

    rng = jax.random.PRNGKey(0)
    attn = jnp.linspace(0, 1, 16)[None, :]
    valid = jnp.ones((1, 16), bool)
    r1 = np.asarray(f(rng, attn, valid, jnp.float32(0.5))).sum()
    r2 = np.asarray(f(rng, attn, valid, jnp.float32(0.25))).sum()
    assert r1 == 8 and r2 == 4  # no recompile, schedule value is traced
