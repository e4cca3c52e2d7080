"""A/B: segmented-scan vs wide-batched discriminator scoring + GP.

The dis phase runs scoring and the gradient penalty as bc*sc = 8 small
segment programs inside the micro-chunk scan (needed only for the
SAMPLING mems chain). This measures whether batching all rows into one
wide call lifts the matmul utilization enough to matter, before
restructuring the phase:

  floor_scan   scan of 8 x fwd+param-bwd on [2b, seg] rows  (current)
  floor_wide   ONE fwd+param-bwd on [8*2b, seg] rows
  gp_scan      scan of 8 x WGAN-GP double-backward on [b, seg, V]
  gp_wide      ONE WGAN-GP double-backward on [8b, seg, V]

Spanbert dis op-point: bsz 128, batch_chunk 4, sample_chunks_mem 2
-> seg 64, b (per chunk) 32. Run ALONE (one TPU process rule):
    python tools/wide_scoring_tpu.py [--quick]
"""
from __future__ import annotations

import jax

jax.devices()  # claim the TPU before heavy imports (grant expires)

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from transformer_gan_tpu.models import bert as bert_mod
from transformer_gan_tpu.train.losses import gradient_penalty


def main():
    quick = "--quick" in sys.argv
    iters = 2 if quick else 5
    dis_cfg = bert_mod.BertConfig(vocab_size=311,
                                  compute_dtype="bfloat16")
    V = 310
    nseg, b, seg = 8, 32, 64
    dis_params = bert_mod.init_bert_params(dis_cfg, seed=17)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(2, 310, (nseg, 2 * b, seg)))
    key = jax.random.key(7, impl="rbg")

    def timeit(name, fn, *args):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        print(f"{name} compile+first: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        dt = (time.time() - t0) / iters * 1000
        print(f"{name}: {dt:.1f} ms", flush=True)
        return dt

    # ---- scoring floor: fwd + param-bwd, dropout on (rbg keys) ----
    def bert_loss(dp, rows, r):
        emb = dp["word_embeddings"][rows]
        d = bert_mod.bert_discriminator_score(dp, dis_cfg, emb,
                                              train=True, rng=r)
        return jnp.sum(d)

    bgrad = jax.grad(bert_loss)

    @jax.jit
    def floor_scan(dp, rows, r):
        rngs = jax.random.split(r, nseg)

        def body(acc, xs):
            rr, rk = xs
            return jax.tree.map(jnp.add, acc, bgrad(dp, rr, rk)), None

        zero = jax.tree.map(jnp.zeros_like, dp)
        acc, _ = jax.lax.scan(body, zero, (rows, rngs))
        return acc

    @jax.jit
    def floor_wide(dp, rows, r):
        return bgrad(dp, rows.reshape(nseg * 2 * b, seg), r)

    @jax.jit
    def floor_vmap(dp, rows, r):
        # the production-restructure shape: vmap over segments with
        # per-segment dropout keys (rng consumption identical to the
        # scan path), one wide XLA program
        rngs = jax.random.split(r, nseg)
        grads_c = jax.vmap(bgrad, in_axes=(None, 0, 0))(dp, rows, rngs)
        return jax.tree.map(lambda g: g.sum(0), grads_c)

    timeit("floor_scan", floor_scan, dis_params, ids, key)
    timeit("floor_wide", floor_wide, dis_params, ids, key)
    timeit("floor_vmap", floor_vmap, dis_params, ids, key)

    # ---- GP double-backward ----
    onehot = jax.nn.one_hot(ids[:, :b], V + 1, dtype=jnp.float32)
    onehot2 = jax.nn.one_hot(ids[:, b:], V + 1, dtype=jnp.float32)

    def gp_term(dp, real, fake, r):
        emb_matrix = dp["word_embeddings"]

        def disc_fn(x):
            emb = jnp.einsum("ve,bcv->bce", emb_matrix, x)
            return bert_mod.bert_discriminator_score(dp, dis_cfg, emb)

        return gradient_penalty(disc_fn, real, fake, r)

    gp_grad = jax.grad(gp_term)

    @jax.jit
    def gp_scan(dp, real, fake, r):
        rngs = jax.random.split(r, nseg)

        def body(acc, xs):
            rr, ff, rk = xs
            return jax.tree.map(jnp.add, acc, gp_grad(dp, rr, ff, rk)), None

        zero = jax.tree.map(jnp.zeros_like, dp)
        acc, _ = jax.lax.scan(body, zero, (real, fake, rngs))
        return acc

    @jax.jit
    def gp_wide(dp, real, fake, r):
        return gp_grad(dp, real.reshape(nseg * b, seg, V + 1),
                       fake.reshape(nseg * b, seg, V + 1), r)

    @jax.jit
    def gp_vmap(dp, real, fake, r):
        rngs = jax.random.split(r, nseg)
        grads_c = jax.vmap(gp_grad, in_axes=(None, 0, 0, 0))(
            dp, real, fake, rngs)
        return jax.tree.map(lambda g: g.sum(0), grads_c)

    timeit("gp_scan", gp_scan, dis_params, onehot, onehot2, key)
    timeit("gp_wide", gp_wide, dis_params, onehot, onehot2, key)
    timeit("gp_vmap", gp_vmap, dis_params, onehot, onehot2, key)


if __name__ == "__main__":
    main()
