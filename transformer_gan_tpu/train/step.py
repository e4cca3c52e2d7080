"""Jitted training and evaluation steps.

The reference's MLE micro-batch loop (train.py:874-921) — batch_chunk
forwards/backwards with per-chunk XL memory, pad-masked mean, grad clip,
optimizer step — compiles here into ONE XLA program: a ``lax.scan`` over
micro-chunks accumulating gradients, followed by the fused optimizer update.
Under a data mesh the batch axis is sharded and gradient all-reduce is
GSPMD-implicit.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import xl
from .optim import global_grad_norm


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    mems: xl.XLMems      # chunk-stacked: hids [C, *init_mems-shape], count [C]
    rng: jax.Array
    step: jnp.ndarray    # int32 scalar


def init_train_state(params, optimizer, xcfg: xl.XLConfig, batch_chunk: int,
                     mem_len: int, bsz_chunk: int, seed: int,
                     rng_impl: str = "threefry2x32") -> TrainState:
    mems1 = xl.init_mems(xcfg, mem_len, bsz_chunk)
    mems = xl.XLMems(
        hids=jnp.broadcast_to(
            mems1.hids[None], (batch_chunk,) + mems1.hids.shape).copy(),
        count=jnp.zeros((batch_chunk,), jnp.int32))
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        mems=mems,
        rng=jax.random.key(seed, impl=rng_impl),
        step=jnp.zeros((), jnp.int32),
    )


def chunk_batch(x, batch_chunk: int):
    """[tgt, bsz] -> [chunk, tgt, bsz/chunk] (contiguous split like
    torch.chunk along the batch axis; reference train.py:874-878).

    Done on HOST before device_put: the micro-chunk axis must be the outer
    axis so that each chunk's batch rows span every device of the data mesh
    (chunking a device-sharded batch axis inside the step would leave each
    chunk on a fraction of the devices)."""
    tgt, bsz = x.shape[0], x.shape[1]
    return x.reshape(tgt, batch_chunk, bsz // batch_chunk).swapaxes(0, 1)


def chunk_rows(x, batch_chunk: int):
    """[bsz] per-row flags -> [chunk, bsz/chunk]."""
    return x.reshape(batch_chunk, -1)


def _auto_layout_format():
    """The AUTO entry-layout marker across jax.experimental.layout API
    generations (Format(Layout.AUTO) on newer jax, Layout(DLL.AUTO) on
    older)."""
    try:
        from jax.experimental.layout import Format, Layout
        return Format(Layout.AUTO)
    except ImportError:
        from jax.experimental.layout import (DeviceLocalLayout,
                                             Layout)
        return Layout(DeviceLocalLayout.AUTO)


def make_mle_train_step(xcfg: xl.XLConfig, optimizer, batch_chunk: int,
                        pad_id: int, use_mle: bool = True,
                        remat: bool = False, donate: bool = True,
                        same_length: bool = False,
                        auto_mems_layout: bool = False):
    """Build the jitted MLE step.

    Returns fn(state, data [C,tgt,bsz_c], target [C,tgt,bsz_c],
    reset [C,bsz_c]) -> (new_state, metrics dict); inputs pre-chunked on
    host with ``chunk_batch``/``chunk_rows``. Loss semantics match reference
    train.py:888-904: per-chunk pad-masked mean scaled by 1/batch_chunk,
    gradients summed over chunks.

    ``auto_mems_layout``: let XLA choose the ENTRY layout of the donated
    mems carry (AUTO in/out layout on state.mems.hids) instead of the
    default-layout entry — targeting the ~3 GB/step of re-layout copies
    the layout assigner otherwise inserts around the ring update
    (PERF.md "Known residual overheads"). Call sites must then
    device_put the initial ``state.mems.hids`` with the compiled input
    format (``fn.lower(...).compile()``); the status_vec variant is not
    supported with this knob.
    """

    def chunk_loss(params, data_c, target_c, reset_c, mems_c, rng_c,
                   status_c):
        nll, new_mems = xl.forward_nll(
            params, xcfg, data_c, target_c, reset_c, mems_c,
            status_vec=status_c,
            train=True, rng=rng_c, remat=remat, same_length=same_length)
        mask = (target_c != pad_id)
        cnt = mask.sum()
        mean = jnp.where(cnt > 0,
                         jnp.where(mask, nll, 0.0).sum() / cnt, 0.0)
        return mean / batch_chunk, (new_mems, cnt, mean)

    grad_fn = jax.value_and_grad(chunk_loss, has_aux=True)

    # NOTE: opt_state is a separate, NON-donated argument. Donating the
    # fused optimizer's flat [P] mu/nu buffers together with the rest of
    # the state triggers an execution-time INVALID_ARGUMENT on the
    # tunnel-backed TPU runtime (every aliasing pattern involved passes in
    # isolation; the combination inside this step does not). The cost is
    # two extra [P] fp32 buffers (~110MB at the 13.7M-param op point).
    def train_step(rest: TrainState, opt_state, data_c, target_c, reset_c,
                   status_c=None):
        state = rest._replace(opt_state=opt_state)
        step_rng = jax.random.fold_in(state.rng, state.step)
        rngs = jax.random.split(step_rng, batch_chunk)

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        if status_c is None:
            # placeholder scanned alongside (append_note_status off)
            status_c = jnp.zeros((batch_chunk, 1), jnp.int8)

        def body(carry, xs):
            grads_acc, loss_w_sum, tok_sum = carry
            d, t, r, mems_h, mems_c, rng_c, sv = xs
            mems = xl.XLMems(hids=mems_h, count=mems_c)
            sv_in = sv if xcfg.append_note_status else None
            (_, (new_mems, cnt, mean)), grads = grad_fn(
                state.params, d, t, r, mems, rng_c, sv_in)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            loss_w_sum = loss_w_sum + mean * cnt
            tok_sum = tok_sum + cnt
            return (grads_acc, loss_w_sum, tok_sum), new_mems

        (grads, loss_w, tokens), new_mems = jax.lax.scan(
            body,
            (zero_grads, jnp.zeros((), jnp.float32),
             jnp.zeros((), jnp.int32)),
            (data_c, target_c, reset_c, state.mems.hids, state.mems.count,
             rngs, status_c))

        if use_mle:
            grad_norm = global_grad_norm(grads)
            updates, new_opt_state = optimizer.update(
                grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
        else:
            # keep the gradients LIVE through grad_norm: with grads fully
            # unused XLA dead-code-eliminates the entire backward pass and
            # a "no optimizer" ablation silently measures forward-only
            grad_norm = global_grad_norm(grads)
            new_params, new_opt_state = state.params, state.opt_state

        new_state = TrainState(
            params=new_params, opt_state=new_opt_state, mems=new_mems,
            rng=state.rng, step=state.step + 1)
        metrics = {
            "loss_weighted": loss_w,          # sum_c mean_c * cnt_c
            "tokens": tokens,
            "grad_norm": grad_norm,           # pre-clip global norm
        }
        return new_state, metrics

    if auto_mems_layout:
        fmt = _auto_layout_format()
        state_l = TrainState(params=None, opt_state=None,
                             mems=xl.XLMems(hids=fmt, count=None),
                             rng=None, step=None)
        in_l = (state_l, None, None, None, None)
        out_l = (state_l, None)
        jitted = jax.jit(train_step,
                         donate_argnums=(0,) if donate else (),
                         in_shardings=in_l, out_shardings=out_l)
    else:
        jitted = jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def call(state: TrainState, *args):
        return jitted(state._replace(opt_state=None), state.opt_state,
                      *args)

    call.lower = lambda state, *args: jitted.lower(
        state._replace(opt_state=None), state.opt_state, *args)
    return call


def make_eval_step(xcfg: xl.XLConfig, pad_id: int):
    """Jitted eval window: (params, data, target, mems) ->
    (nll_sum, token_count, new_mems) with same_length masking
    (reference evaluate(), train.py:747-779)."""

    @jax.jit
    def eval_step(params, data, target, mems, status_vec=None):
        nll, new_mems = xl.forward_nll(
            params, xcfg, data, target, None, mems, status_vec=status_vec,
            same_length=True, train=False)
        mask = (target != pad_id)
        nll_sum = jnp.where(mask, nll, 0.0).sum()
        return nll_sum, mask.sum(), new_mems

    return eval_step


def reset_eval_mems(mems: xl.XLMems) -> xl.XLMems:
    """Equivalent of mems=None at a new piece-batch (train.py:771-772):
    zero the valid count so every slot is masked."""
    return xl.XLMems(hids=mems.hids,
                     count=jnp.zeros_like(mems.count))
