"""Sharding placement for training state and batches on a data mesh."""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import xl
from ..train import step as tstep


def _mems_batch_spec(hids, chunked: bool) -> P:
    """PartitionSpec splitting the memory's batch axis over 'data'.

    cache_kv layout [L, 2, h, bsz, M, dh] -> batch axis 3; raw layout
    [L+1, M, bsz, d] -> axis 2; chunk stacking prepends one axis."""
    ndim = hids.ndim
    batch_axis = (3 if ndim - (1 if chunked else 0) == 6 else 2) \
        + (1 if chunked else 0)
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return P(*spec)


def train_state_shardings(state: tstep.TrainState, mesh: Mesh):
    """Params/opt replicated; chunk-stacked memory sharded on its batch
    axis."""
    rep = NamedSharding(mesh, P())

    def rep_like(tree):
        return jax.tree.map(lambda _: rep, tree)

    mems_sh = xl.XLMems(
        hids=NamedSharding(
            mesh, _mems_batch_spec(state.mems.hids, chunked=True)),
        count=rep)
    return tstep.TrainState(
        params=rep_like(state.params),
        opt_state=rep_like(state.opt_state),
        mems=mems_sh,
        rng=rep,
        step=rep,
    )


def place_train_state(state: tstep.TrainState, mesh: Mesh
                      ) -> tstep.TrainState:
    sh = train_state_shardings(state, mesh)
    return jax.tree.map(jax.device_put, state, sh,
                        is_leaf=lambda x: x is None)


def place_batch(mesh: Mesh, data_c, target_c, reset_c):
    """Pre-chunked [C, tgt, bsz_c] batches: shard bsz_c over 'data'."""
    import jax.numpy as jnp
    d = jax.device_put(jnp.asarray(data_c),
                       NamedSharding(mesh, P(None, None, "data")))
    t = jax.device_put(jnp.asarray(target_c),
                       NamedSharding(mesh, P(None, None, "data")))
    r = jax.device_put(jnp.asarray(reset_c),
                       NamedSharding(mesh, P(None, "data")))
    return d, t, r


def place_replicated(mesh: Mesh, tree):
    """Replicate every leaf of a pytree (GAN discriminator params and the
    gen/dis/dis_D optimizer states — the reference DDP-broadcasts the whole
    TransformerGAN, model/train.py:649-655)."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def place_gan_batch(mesh: Mesh, data_c):
    """Pre-chunked dis batch [bc, dis_tgt, bsz_c]: shard bsz_c."""
    import jax.numpy as jnp
    return jax.device_put(jnp.asarray(data_c),
                          NamedSharding(mesh, P(None, None, "data")))


def place_rows(mesh: Mesh, x, shard: bool = True):
    """Per-batch-row vector [bsz] (e.g. the PPO P0 snapshot): sharded
    when the row count divides the mesh, else replicated."""
    import jax.numpy as jnp
    x = jnp.asarray(x)
    spec = P("data") if shard else P()
    return jax.device_put(x, NamedSharding(mesh, spec))


def place_eval_batch(mesh: Mesh, data, target, status_vec=None):
    """[tgt, bsz] eval windows: shard the batch axis (reference shards
    eval only across processes; on a mesh the local batch is split too
    so eval doesn't serialize on one device)."""
    import jax.numpy as jnp
    sh = NamedSharding(mesh, P(None, "data"))
    d = jax.device_put(jnp.asarray(data), sh)
    t = jax.device_put(jnp.asarray(target), sh)
    sv = (jax.device_put(jnp.asarray(status_vec), sh)
          if status_vec is not None else None)
    return d, t, sv


def place_eval_mems(mesh: Mesh, mems: xl.XLMems) -> xl.XLMems:
    """Un-chunked eval memory sharded on its batch axis."""
    hids = jax.device_put(
        mems.hids,
        NamedSharding(mesh, _mems_batch_spec(mems.hids, chunked=False)))
    count = jax.device_put(mems.count, NamedSharding(mesh, P()))
    return xl.XLMems(hids=hids, count=count)
