"""Sharding placement for training state and batches on a data mesh."""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import xl
from ..train import step as tstep


def train_state_shardings(state: tstep.TrainState, mesh: Mesh):
    """Params/opt replicated; chunk-stacked memory sharded on its batch
    axis ([C, L+1, M, bsz_c, d] -> axis 3)."""
    rep = NamedSharding(mesh, P())

    def rep_like(tree):
        return jax.tree.map(lambda _: rep, tree)

    mems_sh = xl.XLMems(
        hids=NamedSharding(mesh, P(None, None, None, "data")),
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
