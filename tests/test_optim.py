"""Fused flat-vector optimizer vs the per-leaf optax chain (the oracle).

The fused update (one raveled [P] vector, make_fused_optimizer) must be
numerically equivalent to make_optimizer(fused=False) — same clip, same
direction (adam bias correction / adamw decoupled wd / LAMB per-leaf
trust ratios), same schedule and mutable-LR semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transformer_gan_tpu.train import optim as topt


def _tree(seed):
    rng = np.random.RandomState(seed)

    def arr(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32))

    return {
        "emb": arr(31, 8),
        "layers": [
            {"w": arr(8, 24), "b": arr(24), "ln": arr(8)}
            for _ in range(3)
        ],
        "bias": arr(31),
    }


@pytest.mark.parametrize("name,wd", [
    ("adam", 0.0), ("adam", 0.01), ("adamw", 0.01), ("lamb", 0.0),
    ("lamb", 0.004)])
def test_fused_matches_optax_chain(name, wd):
    params = _tree(0)
    sched = topt.make_schedule("inv_sqrt", 2e-3, 100, 1e-5, 5)
    ref_opt = topt.make_optimizer(name, 2e-3, sched, 0.25, wd, fused=False)
    fus_opt = topt.make_optimizer(name, 2e-3, sched, 0.25, wd, fused=True)

    p_ref = jax.tree.map(jnp.copy, params)
    p_fus = jax.tree.map(jnp.copy, params)
    s_ref = ref_opt.init(p_ref)
    s_fus = fus_opt.init(p_fus)

    for step in range(7):
        grads = jax.tree.map(
            lambda p: p * 0.1 + float(np.sin(step + 1)), _tree(step + 1))
        if step == 4:  # the mutable dev_perf slot must behave identically
            s_ref = topt.set_lr_multiplier(s_ref, 0.5)
            s_fus = topt.set_lr_multiplier(s_fus, 0.5)
        u_ref, s_ref = ref_opt.update(grads, s_ref, p_ref)
        u_fus, s_fus = fus_opt.update(grads, s_fus, p_fus)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_fus = optax.apply_updates(p_fus, u_fus)

    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fus)):
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-7)


def test_fused_lamb_trust_ratio_is_per_leaf():
    """A leaf with huge weights must get a different (clamped) trust
    ratio than a tiny leaf — catches any flat-global-norm shortcut."""
    params = {"big": jnp.full((64,), 100.0), "small": jnp.full((64,), 1e-4)}
    sched = topt.make_schedule("constant", 1.0, 10, 0.0, 0)
    ref = topt.make_optimizer("lamb", 1e-2, sched, 1e9, 0.0, fused=False)
    fus = topt.make_optimizer("lamb", 1e-2, sched, 1e9, 0.0, fused=True)
    grads = {"big": jnp.full((64,), 0.3), "small": jnp.full((64,), 0.3)}
    u_ref, _ = ref.update(grads, ref.init(params), params)
    u_fus, _ = fus.update(grads, fus.init(params), params)
    np.testing.assert_allclose(u_ref["big"], u_fus["big"], rtol=1e-6)
    np.testing.assert_allclose(u_ref["small"], u_fus["small"], rtol=1e-6)
    # and the ratios genuinely differ across leaves
    assert not np.allclose(u_fus["big"], u_fus["small"])
