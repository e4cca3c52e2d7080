"""Transformer-GAN composite: Gumbel-ST sampling + discriminator losses.

Counterpart of reference ``TransformerGAN.forward`` for the
gen/dis/classifier branches (model/transformer_gan.py:232-533). The
reference's per-token Python sampling loop with per-chunk ``.backward()``
becomes: a ``lax.scan`` over decode steps producing the straight-through
one-hot sequence (gradients flow through the chain of soft samples), one
loss per chunk, and ``jax.grad`` once per chunk — all inside a single
jitted phase step (built in train/gan_loop.py).

Reproduced semantics:
* context priming with no gradient (transformer_gan.py:279-290),
* chunk 0 embeds the real context one-hots at its head; later chunks seed
  from the argmax-detached last sample (:302-347,506-508),
* ``truncate_backprop`` detaches every step's input (:308-320),
* memory is detached across steps (the reference's _update_mems detaches
  unconditionally — see models/xl.py note),
* discriminator dispatch: BERT CLS-logit scoring over embedded one-hots
  with a zero [MASK] column (:391-426), or RelGAN-CNN over vocab
  distributions (:447-470),
* WGAN-GP on one-hot interpolates (:203-230), PPO ratio clipping with the
  auxiliary classifier D (:376-389,418-426).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..train.losses import get_losses, gradient_penalty
from . import bert as bert_mod
from . import discriminator as disc_mod
from . import xl


@dataclasses.dataclass(frozen=True)
class GanConfig:
    """Static GAN-phase parameters (from cfg.DISCRIMINATOR / cfg.PPO)."""

    dis_type: str = "cnn"            # "bert" | "cnn"
    loss_type: str = "rsgan"
    # sampling memory implementation: "auto" (and its explicit alias
    # "chunked") uses the two-level chunked decode cache under cache_kv
    # (the production path — the rolling scan's backward OOMs at real
    # op-points, see the note above sample_fake_chunks) and falls back
    # to the rolling path when cache_kv is off; "rolling" forces the
    # small-shape oracle path unconditionally
    decode_cache: str = "auto"
    tgt_len: int = 64
    mem_len: int = 64
    context_len: int = 5
    sample_chunks_mem: int = 1
    truncate_backprop: bool = False
    gen_loss_factor: float = 30.0
    dis_loss_factor: float = 1.0
    batch_chunk: int = 1
    ppo: bool = False
    ppo_dis_type: str = "bert"
    clip_param: float = 0.4
    n_token: int = 310
    # FULL-backprop-through-the-sample-chain gen phase (truncate_backprop
    # False): "off" runs the sequential scan (oracle); "jnp" routes
    # through the batched recompute + the jnp chain backward
    # (_chunk_st_fullchain — per-step dx-only VJPs, parameter gradients
    # from ONE batched window pullback); "kernel"/"auto" use the fused
    # residual-streaming chain-backward kernel when shapes qualify (auto
    # falls back to the sequential scan otherwise); "kernel_recompute"
    # forces the self-recomputing kernel variant (no window residuals —
    # debug/A/B switch, same oracle-tested gradients)
    chain_bwd: str = "auto"
    # fused sampling kernels (ops/pallas_decode.py): "auto" uses them
    # whenever the chunked path is active and shapes qualify; "on"
    # asserts the forward-only kernel is used; "off" is the full
    # debug/oracle switch — sequential jnp sampling scan in EVERY phase,
    # which also bypasses the gen phase's batched recompute + chain
    # backward (so chain_bwd="kernel" with "off" is contradictory)
    fused_sampler: str = "auto"

    def __post_init__(self):
        if (self.fused_sampler == "off"
                and self.chain_bwd in ("kernel", "kernel_recompute")):
            raise ValueError(
                "fused_sampler='off' forces the sequential sampling scan "
                "in every phase, so the chain-backward kernel that "
                "chain_bwd='kernel' asserts can never run; use "
                "chain_bwd='off' (sequential oracle) or drop "
                "fused_sampler='off'")

    @property
    def sample_len(self) -> int:
        return self.tgt_len // self.sample_chunks_mem

    @property
    def has_gp(self) -> bool:
        return "gp" in self.loss_type

    @classmethod
    def from_cfg(cls, cfg, n_token: int) -> "GanConfig":
        d = cfg.DISCRIMINATOR
        loss_type = (d.BERT.loss_type if d.type == "bert"
                     else d.CNN.loss_type)
        return cls(
            dis_type=d.type, loss_type=loss_type, tgt_len=d.tgt_len,
            mem_len=d.mem_len, context_len=d.context_len,
            sample_chunks_mem=d.sample_chunks_mem,
            truncate_backprop=d.truncate_backprop,
            gen_loss_factor=float(d.gen_loss_factor),
            dis_loss_factor=float(d.dis_loss_factor),
            batch_chunk=d.batch_chunk,
            ppo="ppo" in loss_type,
            ppo_dis_type=cfg.PPO.dis_D_type,
            clip_param=cfg.PPO.clip_param,
            n_token=n_token,
            decode_cache=str(getattr(cfg.TPU, "gan_decode_cache", "auto")),
            fused_sampler=str(getattr(cfg.TPU, "gan_fused_decode",
                                      "auto")),
            chain_bwd=str(getattr(cfg.TPU, "gan_chain_bwd", "auto")),
        )


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def prime_context(gen_params, xcfg: xl.XLConfig, gcfg: GanConfig, data):
    """No-grad context prime: fill sampling memory with the first
    context_len-1 real tokens (transformer_gan.py:279-290)."""
    bsz = data.shape[1]
    mems = xl.init_mems(xcfg, gcfg.mem_len, bsz)
    if gcfg.context_len > 1:
        context = data[:gcfg.context_len - 1]
        _, mems = xl.forward_generate(
            jax.lax.stop_gradient(gen_params), xcfg, context, mems)
        mems = jax.lax.stop_gradient(mems)
    return mems


def gen_scan(gen_params, xcfg: xl.XLConfig, gcfg: GanConfig, temperature,
             mems, prev_onehot, detach_flags, rng, noise=None):
    """Sequential gumbel-ST sampling of len(detach_flags) tokens.

    prev_onehot: [bsz, V] seed sample; detach_flags[t] True stops gradient
    through the input at step t (chunk starts / truncate_backprop).
    ``noise`` optionally injects the per-step uniform gumbel draws
    ([n_steps, bsz, V]; trajectory-parity harness), replacing ``rng``.
    Returns (samples [n, bsz, V], mems, last_onehot)."""
    n_steps = detach_flags.shape[0]
    rngs = jax.random.split(rng, n_steps)
    # hoist the per-layer positional projections (r @ r_w over klen =
    # mem_len+1 rows) out of the scan: constant across steps, and the
    # gradient to r_w through the single hoisted projection is identical
    r_heads = (xl.precompute_r_heads(gen_params, xcfg, gcfg.mem_len + 1)
               if xcfg.cache_kv else None)
    inject = noise is not None

    def body(carry, xs):
        prev, mems = carry
        if inject:
            detach, rng_t, u_t = xs
            u_t = u_t[None]   # [bsz, V] -> logits shape [1, bsz, V]
        else:
            detach, rng_t = xs
            u_t = None
        hard = jax.lax.stop_gradient(
            jax.nn.one_hot(jnp.argmax(prev, -1), gcfg.n_token,
                           dtype=prev.dtype))
        inp = jnp.where(detach, hard, prev)
        onehot, mems = xl.forward_generate_gumbel(
            gen_params, xcfg, inp[None], temperature, mems, rng_t,
            detach_mems=True, r_heads=r_heads, gumbel_u=u_t)
        return (onehot[0], mems), onehot[0]

    xs = (detach_flags, rngs, noise) if inject else (detach_flags, rngs)
    (last, mems), samples = jax.lax.scan(body, (prev_onehot, mems), xs)
    return samples, mems, last


# Inner-scan length of the chunked GAN sampling path: the big decode K/V
# cache is copied once per GEN_DECODE_CHUNK sampled tokens instead of every
# token (see the two-level cache note in models/xl.py).
GEN_DECODE_CHUNK = 32

# decode_cache="auto" resolves to the chunked path whenever cache_kv.
# The rolling path looks cheaper per step in isolation (one fused
# xl_forward), but its backward through the sampling scan must save the
# FULL K/V mems carry per step — ~49MB x 123 steps x batch_chunk at the
# spanbert op-point, a deterministic HBM OOM on v5e (15.77G needed of
# 15.75G).  The chunked cache's residuals are compact by construction
# (big buffer read-only within a 32-token chunk; only the staging buffer
# is a per-token carry), and its measured gen step (1.32s, b=32 mem 128)
# is within 4% of the fused-layout variant — both op-issue-latency
# bound, not FLOP bound.  "rolling" stays available as the small-shape
# debug/oracle option (equivalence-tested on CPU).


def gen_scan_chunked(gen_params, xcfg: xl.XLConfig, gcfg: GanConfig,
                     temperature, state: xl.DecodeState, prev_onehot,
                     detach_flags, rng):
    """``gen_scan`` on the two-level chunked decode cache (cache_kv layout).

    Same sampling semantics and gradient flow as ``gen_scan`` — identical
    per-step gumbel draws (same [1, bsz, V] key shapes), memory detached
    per step (K/V staged with stop_gradient; the current token's
    self-attention sees live projections) — but without the per-token
    full-buffer memory shift that dominates the rolling path
    (transformer_gan.py:299-334 is the reference hot loop #1).
    Returns (samples [n, bsz, V], new state, last_onehot)."""
    n_steps = detach_flags.shape[0]
    rngs = jax.random.split(rng, n_steps)
    bsz, V = prev_onehot.shape
    C = min(GEN_DECODE_CHUNK, n_steps)

    def run_chunk(state, prev, chunk_flags, chunk_rngs, n):
        stage0 = xl.init_decode_stage(xcfg, C, bsz,
                                      dtype=state.kv[0][1].dtype)

        def body(carry, xs):
            prev, stage = carry
            t, detach, rng_t = xs
            hard = jax.lax.stop_gradient(
                jax.nn.one_hot(jnp.argmax(prev, -1), V, dtype=prev.dtype))
            inp = jnp.where(detach, hard, prev)
            logits, stage = xl.decode_chunk_step(
                gen_params, xcfg, inp, state, stage, t,
                same_length=False, detach_kv_writes=True)
            onehot = xl.gumbel_softmax_st(logits[None], temperature,
                                          rng_t)[0]
            return (onehot, stage), onehot

        xs = (jnp.arange(n, dtype=jnp.int32), chunk_flags, chunk_rngs)
        (prev, stage), samples = jax.lax.scan(body, (prev, stage0), xs)
        return prev, stage, samples

    n_full, rem = divmod(n_steps, C)
    pieces = []
    prev = prev_onehot
    if n_full:
        def outer(carry, xs):
            prev, state = carry
            chunk_flags, chunk_rngs = xs
            prev, stage, samples = run_chunk(state, prev, chunk_flags,
                                             chunk_rngs, C)
            state = xl.merge_decode_state(xcfg, state, stage, C)
            return (prev, state), samples

        (prev, state), samples = jax.lax.scan(
            outer, (prev, state),
            (detach_flags[:n_full * C].reshape(n_full, C),
             rngs[:n_full * C].reshape(n_full, C, *rngs.shape[1:])))
        pieces.append(samples.reshape(n_full * C, bsz, V))
    if rem:
        prev, stage, samples = run_chunk(
            state, prev, detach_flags[n_full * C:], rngs[n_full * C:], rem)
        state = xl.merge_decode_state(xcfg, state, stage, rem)
        pieces.append(samples)
    samples = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
    return samples, state, prev


def gen_scan_chunked_fused(stacked, xcfg: xl.XLConfig, gcfg: GanConfig,
                           K, Vb, R, count, prev_ids, n_steps, rng):
    """Forward-only ``gen_scan_chunked`` on the fused all-layer decode
    kernel (ops/pallas_decode.py): the whole per-token forward — embed,
    every layer, logits, gumbel argmax — is ONE kernel launch, so the
    scan body has no small-op issue-latency tail.

    Sample-exact vs the jnp path: identical rng split structure, the
    gumbel noise is pre-transformed by XLA (g = -log(-log(u+eps)+eps)
    with the same per-step keys and [1, bsz, V] draw shape as
    gumbel_softmax_st), and the straight-through forward value IS the
    hard argmax one-hot, so sampled ids match id-for-id (temperature
    cancels in the argmax and is not needed).

    K/Vb [L, b, M, h*dh] stacked big cache; R [L, M+1, h*dh]; prev_ids
    [b, 1] int32. Returns (samples [n, b, V] fp32, K', Vb', count',
    last_ids).
    """
    from ..ops import pallas_decode as pdec
    L, bsz, M, hd = K.shape
    V = gcfg.n_token
    C = min(GEN_DECODE_CHUNK, n_steps)
    rngs = jax.random.split(rng, n_steps)
    eps = 1e-20

    def g_of(r):
        u = jax.random.uniform(r, (1, bsz, V), dtype=jnp.float32)[0]
        return -jnp.log(-jnp.log(u + eps) + eps)

    g_all = jax.vmap(g_of)(rngs)                        # [n, bsz, V]

    whole_chunk = pdec.supports_fused_decode_chunk(xcfg, bsz, M, C)

    def run_chunk(K, Vb, count, ids, g_c, n):
        if whole_chunk:
            # the whole n-token sequential loop is ONE kernel launch:
            # resident weights/K/V, staging ring + argmax feedback in
            # VMEM (ops/pallas_decode.py _decode_chunk_kernel)
            ids, oh, sk, sv = pdec.fused_decode_chunk(
                stacked, xcfg, K, Vb, R, ids, g_c, count, n)
            if sk.shape[2] < C:     # remainder staging is n-sized
                pad = jnp.zeros((L, bsz, C - sk.shape[2], hd), sk.dtype)
                sk = jnp.concatenate([sk, pad], axis=2)
                sv = jnp.concatenate([sv, pad], axis=2)
            return ids, sk, sv, oh
        sk0 = jnp.zeros((L, bsz, C, hd), K.dtype)
        sv0 = jnp.zeros_like(sk0)
        sc = jnp.stack(
            [jnp.arange(n, dtype=jnp.int32),
             jnp.full((n,), count.astype(jnp.int32))], axis=1)

        def body(carry, xs):
            ids, sk, sv = carry
            sc_t, g_t = xs
            ids, oh, sk, sv = pdec.fused_decode_step(
                stacked, xcfg, K, Vb, R, sk, sv, ids, g_t, sc_t)
            return (ids, sk, sv), oh

        (ids, sk, sv), oh = jax.lax.scan(body, (ids, sk0, sv0),
                                         (sc, g_c))
        return ids, sk, sv, oh

    n_full, rem = divmod(n_steps, C)
    pieces = []
    ids = prev_ids
    if n_full:
        def outer(carry, g_c):
            ids, K, Vb, count = carry
            ids, sk, sv, oh = run_chunk(K, Vb, count, ids, g_c, C)
            K = jnp.concatenate([K[:, :, C:], sk], axis=2)
            Vb = jnp.concatenate([Vb[:, :, C:], sv], axis=2)
            return (ids, K, Vb, jnp.minimum(count + C, M)), oh

        (ids, K, Vb, count), oh = jax.lax.scan(
            outer, (ids, K, Vb, count),
            g_all[:n_full * C].reshape(n_full, C, bsz, V))
        pieces.append(oh.reshape(n_full * C, bsz, V))
    if rem:
        ids, sk, sv, oh = run_chunk(K, Vb, count, ids,
                                    g_all[n_full * C:], rem)
        K = jnp.concatenate([K[:, :, rem:], sk[:, :, :rem]], axis=2)
        Vb = jnp.concatenate([Vb[:, :, rem:], sv[:, :, :rem]], axis=2)
        count = jnp.minimum(count + rem, M)
        pieces.append(oh)
    samples = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
    return samples, K, Vb, count, ids


def _sample_fake_chunks_fused(gen_params, xcfg: xl.XLConfig,
                              gcfg: GanConfig, data, rng):
    """``sample_fake_chunks`` on the fused decode kernel (forward-only
    callers: dis/clf phases detach the generator, so no gradients flow
    through sampling there). Chunk structure, seeds, and rng consumption
    mirror the jnp path exactly."""
    bsz = data.shape[1]
    V = gcfg.n_token
    from ..ops import pallas_decode as pdec
    state = prime_context_state(gen_params, xcfg, gcfg, data)
    K = jnp.stack([k for k, _ in state.kv])
    Vb = jnp.stack([v for _, v in state.kv])
    hd = xcfg.n_head * xcfg.d_head
    R = state.r_heads.reshape(xcfg.n_layer, gcfg.mem_len + 1, hd)
    count = state.count
    stacked = pdec.stack_decode_params(gen_params, xcfg)
    rngs = jax.random.split(rng, gcfg.sample_chunks_mem)

    chunks = []
    ctx = gcfg.context_len
    real_ctx = jax.nn.one_hot(data[:ctx], V, dtype=jnp.float32)
    ids = data[ctx - 1].astype(jnp.int32)[:, None]
    n_gen0 = gcfg.sample_len - ctx
    samples0, K, Vb, count, ids = gen_scan_chunked_fused(
        stacked, xcfg, gcfg, K, Vb, R, count, ids, n_gen0, rngs[0])
    chunks.append((jnp.concatenate([real_ctx, samples0], axis=0),
                   data[0:gcfg.sample_len]))
    for c in range(1, gcfg.sample_chunks_mem):
        samples, K, Vb, count, ids = gen_scan_chunked_fused(
            stacked, xcfg, gcfg, K, Vb, R, count, ids, gcfg.sample_len,
            rngs[c])
        start = c * gcfg.sample_len
        chunks.append((samples, data[start:start + gcfg.sample_len]))
    return chunks


def _zero_ct(x):
    """Zero cotangent matching JAX's tangent-type rules (float0 for
    integer primals — custom_vjp rejects plain zeros there)."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    import numpy as np
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _window_st(params, xcfg: xl.XLConfig, inputs, k_mem, v_mem, count, g,
               hard, temperature):
    """Batched window forward + straight-through rebuild for one chunk."""
    logits, kf, vf, nc = xl.decode_recompute_window(
        params, xcfg, inputs, k_mem, v_mem, count, same_length=False)
    y = jax.nn.softmax((logits.astype(jnp.float32) + g) / temperature,
                       axis=-1)
    st = jax.lax.stop_gradient(hard - y) + y
    return st, y, kf, vf, nc


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _chunk_st_fullchain(params, xcfg: xl.XLConfig, chain_impl, inputs,
                        k_mem, v_mem, count, g, hard, temperature):
    """One chunk of straight-through samples with FULL backprop through
    the sample chain (truncate_backprop=False), computed batched.

    The K/V cache is always detached (reference _update_mems,
    mem_transformer.py:461-482), so the only sequential gradient
    dependency is the straight-through one-hot chain
    input_{t+1} = hard_t + y_t - sg(y_t). The adjoint therefore
    decomposes (see _chunk_st_fullchain_bwd):

    * a reverse scan over steps carrying ONLY the input cotangent chi
      [b, V]: m_t = s_t + chi_t; softmax-backward gives the logits
      cotangent q_t; chi_{t-1} = J_t^T q_t where J_t is the SINGLE-
      position Jacobian d logits_t / d input_t — equal to the n=1
      batched window over lanes k_full[t:t+M] (slide algebra: original
      big lane j at distance M-j+t lands at slid lane j-t = distance
      M-(j-t); window lane M+s at distance t-s = M-((M+s)-t));
    * ALL parameter gradients from ONE batched window pullback with the
      collected per-step logits cotangents Q (the window Jacobian wrt
      inputs is block-diagonal and its theta-paths per position equal
      the sequential step's — tests/test_gan_recompute.py proves the
      window == decode-scan gradient contract).

    No per-step parameter-cotangent accumulation (the sequential scan
    backward adds a full ~P-sized gradient tree every token) and no
    per-token backward through the network for the theta terms.

    ``chain_impl`` (static): "jnp" forces the reverse-scan-of-VJPs
    oracle; "kernel" asserts the fused chain-backward kernel
    (ops/pallas_chain_bwd.py — the whole reverse recursion in ONE
    pallas_call per chunk); "auto" uses the kernel when shapes qualify.
    Oracle: gen_scan_chunked with detach flags False
    (tests/test_gan_fullchain.py)."""
    st, _, kf, vf, nc = _window_st(params, xcfg, inputs, k_mem, v_mem,
                                   count, g, hard, temperature)
    return st, kf, vf, nc


def _chunk_st_fullchain_fwd(params, xcfg: xl.XLConfig, chain_impl,
                            inputs, k_mem, v_mem, count, g, hard,
                            temperature):
    st, y, kf, vf, nc = _window_st(params, xcfg, inputs, k_mem, v_mem,
                                   count, g, hard, temperature)
    res = (params, inputs, k_mem, v_mem, count, g, hard, y, kf, vf,
           temperature)
    return (st, kf, vf, nc), res


def _chain_q_jnp(params, xcfg, inputs, kf, vf, count, y, dst,
                 temperature, M):
    """Reverse chain via a scan of single-position VJPs (oracle path)."""
    n, bsz, V = y.shape
    ldt = xcfg.cdtype                                 # logits dtype

    def body(chi, xs):
        s_t, y_t, inp_t, t = xs
        m = s_t + chi
        # y = softmax((logits + g)/T): dlogits = y*(m - <m,y>)/T
        q_t = (y_t * (m - jnp.sum(m * y_t, axis=-1, keepdims=True))
               ) / temperature
        k_t = tuple(jax.lax.dynamic_slice_in_dim(a, t, M, axis=2)
                    for a in kf)
        v_t = tuple(jax.lax.dynamic_slice_in_dim(a, t, M, axis=2)
                    for a in vf)
        count_t = jnp.minimum(count + t, M)

        def step_fn(x_oh):
            lg, _, _, _ = xl.decode_recompute_window(
                params, xcfg, x_oh[None], k_t, v_t, count_t,
                same_length=False)
            return lg[0]

        chi_prev = jax.vjp(step_fn, inp_t)[1](q_t.astype(ldt))[0]
        return chi_prev.astype(jnp.float32), q_t

    _, Q = jax.lax.scan(
        body, jnp.zeros((bsz, V), jnp.float32),
        (dst, y, inputs, jnp.arange(n, dtype=jnp.int32)), reverse=True)
    return Q


def _chain_q_kernel(params, xcfg, inputs, kf, vf, count, y, dst,
                    temperature, M, res=None):
    """Reverse chain on the fused kernel (one pallas_call per chunk).
    With ``res`` (window residuals from decode_recompute_window
    collect_residuals=True) the residual-streaming kernel runs —
    backward-only grid, no per-token forward recompute."""
    from ..ops import pallas_chain_bwd as pchain
    from ..ops import pallas_decode as pdec
    n, bsz, V = y.shape
    h, dh = xcfg.n_head, xcfg.d_head
    hd = h * dh

    def dense(a):  # [h, b, KL, dh] -> [b, KL, hd]
        return a.transpose(1, 2, 0, 3).reshape(bsz, a.shape[2], hd)

    kf_d = jnp.stack([dense(a) for a in kf])
    vf_d = jnp.stack([dense(a) for a in vf])
    r_heads = jax.lax.stop_gradient(
        xl.precompute_r_heads(params, xcfg, M + 1)).reshape(
            xcfg.n_layer, M + 1, hd)
    stacked = pdec.stack_decode_params(
        jax.lax.stop_gradient(params), xcfg)
    if res is not None:
        return pchain.chain_bwd_q_res(stacked, xcfg, kf_d, vf_d,
                                      r_heads, dst, y, count,
                                      temperature, res)
    ids = jnp.argmax(inputs, axis=-1).astype(jnp.int32)
    return pchain.chain_bwd_q(stacked, xcfg, kf_d, vf_d, r_heads, ids,
                              dst, y, count, temperature)


def _chunk_st_fullchain_bwd(xcfg: xl.XLConfig, chain_impl, res, cts):
    (params, inputs, k_mem, v_mem, count, g, hard, y, kf, vf,
     temperature) = res
    dst = cts[0].astype(jnp.float32)                  # d loss / d st
    n, bsz, V = y.shape
    M = k_mem[0].shape[2]
    ldt = xcfg.cdtype                                 # logits dtype

    from ..ops import pallas_chain_bwd as pchain
    kernel_ok = pchain.supports_chain_bwd(xcfg, bsz, M, n)
    if chain_impl in ("kernel", "kernel_recompute") and not kernel_ok:
        raise ValueError(
            f"chain_bwd='{chain_impl}' but the fused chain-backward "
            "kernel does not apply (needs cache_kv + use_pallas + "
            f"qualifying shapes; bsz={bsz}, M={M}, n={n})")
    use_kernel = kernel_ok and chain_impl in ("kernel", "auto",
                                              "kernel_recompute")
    if use_kernel and chain_impl != "kernel_recompute":
        # ONE window linearization supplies both the chain kernel's
        # residuals (aux) and the parameter pullback
        def win_logits_aux(p):
            lg, _, _, _, r = xl.decode_recompute_window(
                p, xcfg, inputs, k_mem, v_mem, count,
                same_length=False, collect_residuals=True)
            return lg, r

        _, vjp_fn, wres = jax.vjp(win_logits_aux, params, has_aux=True)
        Q = _chain_q_kernel(params, xcfg, inputs, kf, vf, count, y,
                            dst, temperature, M, res=wres)
        dparams = vjp_fn(Q.astype(ldt))[0]
    else:
        if use_kernel:
            Q = _chain_q_kernel(params, xcfg, inputs, kf, vf, count, y,
                                dst, temperature, M)
        else:
            Q = _chain_q_jnp(params, xcfg, inputs, kf, vf, count, y,
                             dst, temperature, M)

        def win_logits(p):
            lg, _, _, _ = xl.decode_recompute_window(
                p, xcfg, inputs, k_mem, v_mem, count, same_length=False)
            return lg

        dparams = jax.vjp(win_logits, params)[1](Q.astype(ldt))[0]
    zeros = jax.tree.map(_zero_ct,
                         (inputs, k_mem, v_mem, count, g, hard))
    # temperature's true cotangent is never consumed (it comes from the
    # annealing schedule, not from trained parameters)
    return (dparams,) + zeros + (jnp.zeros_like(
        jnp.asarray(temperature, jnp.float32)),)


_chunk_st_fullchain.defvjp(_chunk_st_fullchain_fwd, _chunk_st_fullchain_bwd)


def _sample_fake_chunks_recompute(gen_params, xcfg: xl.XLConfig,
                                  gcfg: GanConfig, data, temperature, rng):
    """Differentiable ``sample_fake_chunks`` without the per-token
    serialized backward: sample the trajectory forward-only (fused kernel
    when shapes qualify), then recompute logits for ALL positions in one
    batched pass per chunk (xl.decode_recompute_window) and rebuild the
    straight-through one-hots from the same gumbel draws.

    With truncate_backprop every step's input is detached (reference
    transformer_gan.py:308-320), so the sample chain carries no gradient
    and the batched recompute's loss AND gradients equal the sequential
    jnp scan's exactly (tests/test_gan_recompute.py). With full backprop
    through the chain (truncate_backprop=False), the chunk goes through
    _chunk_st_fullchain, whose custom backward adds the exact chain
    adjoint (a reverse scan carrying only the [b, V] input cotangent)
    on top of the same batched recompute.

    rng consumption mirrors the sampling paths id-for-id (same per-chunk
    split, same per-step (1, bsz, V) uniform draws), and the hard forward
    values are the SAMPLER's one-hots, so the trajectory is identical by
    construction (straight-through forward values equal the hard
    samples either way)."""
    bsz = data.shape[1]
    V = gcfg.n_token
    eps = 1e-20
    hard_chunks = sample_fake_chunks(
        jax.lax.stop_gradient(gen_params), xcfg, gcfg, data, temperature,
        rng, forward_only=True)

    state = prime_context_state(gen_params, xcfg, gcfg, data)
    M = gcfg.mem_len
    h, dh = xcfg.n_head, xcfg.d_head

    def hmajor(a):  # [b, M, h*dh] -> [h, b, M, dh]
        a = a[:, :M]          # fused-rows layout: drop positional rows
        return a.reshape(bsz, M, h, dh).transpose(2, 0, 1, 3)

    k_mem = tuple(jax.lax.stop_gradient(hmajor(k)) for k, _ in state.kv)
    v_mem = tuple(jax.lax.stop_gradient(hmajor(v)) for _, v in state.kv)
    count = state.count
    ctx = gcfg.context_len
    rngs = jax.random.split(rng, gcfg.sample_chunks_mem)

    chunks = []
    prev_hard = jax.nn.one_hot(data[ctx - 1], V, dtype=jnp.float32)
    for c in range(gcfg.sample_chunks_mem):
        if c == 0:
            n = gcfg.sample_len - ctx
            hard = hard_chunks[0][0][ctx:]
        else:
            n = gcfg.sample_len
            hard = hard_chunks[c][0]
        hard = jax.lax.stop_gradient(hard)                  # [n, b, V]
        inputs = jax.lax.stop_gradient(
            jnp.concatenate([prev_hard[None], hard[:-1]], axis=0))
        step_rngs = jax.random.split(rngs[c], n)
        u = jax.vmap(
            lambda r: jax.random.uniform(r, (1, bsz, V),
                                         dtype=jnp.float32)[0])(step_rngs)
        g = -jnp.log(-jnp.log(u + eps) + eps)
        if gcfg.truncate_backprop:
            st, _, kf, vf, count = _window_st(
                gen_params, xcfg, inputs, k_mem, v_mem, count, g, hard,
                temperature)
        else:
            st, kf, vf, count = _chunk_st_fullchain(
                gen_params, xcfg, gcfg.chain_bwd, inputs, k_mem, v_mem,
                count, g, hard, temperature)
        k_mem = tuple(a[:, :, -M:] for a in kf)
        v_mem = tuple(a[:, :, -M:] for a in vf)
        if c == 0:
            real_ctx = jax.nn.one_hot(data[:ctx], V, dtype=jnp.float32)
            fake = jnp.concatenate([real_ctx, st], axis=0)
        else:
            fake = st
        chunks.append((fake, hard_chunks[c][1]))
        prev_hard = hard[-1]
    return chunks


def prime_context_state(gen_params, xcfg: xl.XLConfig, gcfg: GanConfig,
                        data) -> xl.DecodeState:
    """``prime_context`` for the chunked path: no-grad context prime, then
    the decode-state conversion. The positional rows are built from the
    LIVE params so r_w gradients flow from every sampling step, matching
    the rolling path (which re-projects pos_emb @ r_w each step)."""
    mems = prime_context(gen_params, xcfg, gcfg, data)
    return xl.decode_state_from_mems(gen_params, xcfg, mems)


def sample_fake_chunks(gen_params, xcfg: xl.XLConfig, gcfg: GanConfig,
                       data, temperature, rng, noise=None,
                       forward_only: bool = False):
    """Produce the per-chunk fake sequences for one GAN batch.

    data: [tgt_len, bsz] real ids. Returns a list of
    (fake_chunk [sample_len, bsz, V], real_chunk_ids [sample_len, bsz]),
    chunk boundaries detached (transformer_gan.py:299-347,506-508).

    With ``cache_kv`` the sequential sampling runs on the two-level chunked
    decode cache (gen_scan_chunked); the rolling gen_scan is the oracle
    path (equivalence tested for samples, losses, and gradients).

    ``noise``: optional [tgt_len - context_len, bsz, V] uniform gumbel
    draws consumed in sampling order (trajectory-parity harness; rolling
    path only).

    ``forward_only``: the caller will not differentiate through the
    samples (dis/clf phases detach the generator). Routes the sampling
    scan onto the fused all-layer decode kernel when shapes qualify
    (sample-exact, ~10x fewer ops per token — see ops/pallas_decode.py).
    """
    bsz = data.shape[1]
    V = gcfg.n_token
    chunks = []
    rngs = jax.random.split(rng, gcfg.sample_chunks_mem)
    chunked = bool(xcfg.cache_kv) and gcfg.decode_cache != "rolling"
    if noise is not None and chunked:
        raise NotImplementedError(
            "gumbel-noise injection is supported on the rolling oracle "
            "path only (set decode_cache='rolling' / cache_kv=False)")
    if chunked and noise is None and gcfg.fused_sampler != "off":
        from ..ops import pallas_decode as pdec
        C = min(GEN_DECODE_CHUNK, gcfg.sample_len)
        ok = (forward_only and pdec.supports_fused_decode(
            xcfg, bsz, gcfg.mem_len, C))
        if gcfg.fused_sampler == "on" and forward_only and not ok:
            raise ValueError(
                "fused_sampler='on' but the fused decode path does not "
                "apply to this forward-only call (needs cache_kv + "
                "use_pallas + qualifying shapes)")
        if ok:
            return _sample_fake_chunks_fused(gen_params, xcfg, gcfg,
                                             data, rng)
        # differentiable caller: sample forward-only, then batched-
        # recompute the gradients (no per-token serialized backward).
        # Always exact for truncate_backprop (the sample chain carries
        # no gradient); with full backprop through the chain the
        # _chunk_st_fullchain custom adjoint adds the chain terms
        # (chain_bwd gates it: "off" keeps the sequential oracle scan).
        if (not forward_only
                and gcfg.sample_len <= gcfg.mem_len
                and gcfg.sample_len - gcfg.context_len >= 1
                and not xcfg.append_note_status
                and (gcfg.truncate_backprop
                     or gcfg.chain_bwd in ("jnp", "kernel", "auto",
                                           "kernel_recompute"))):
            return _sample_fake_chunks_recompute(
                gen_params, xcfg, gcfg, data, temperature, rng)
    if chunked:
        mems = prime_context_state(gen_params, xcfg, gcfg, data)
    else:
        mems = prime_context(gen_params, xcfg, gcfg, data)

    def scan(mems, seed, flags, rng_c, noise_c):
        if chunked:
            return gen_scan_chunked(gen_params, xcfg, gcfg, temperature,
                                    mems, seed, flags, rng_c)
        return gen_scan(gen_params, xcfg, gcfg, temperature, mems, seed,
                        flags, rng_c, noise=noise_c)

    # chunk 0: real context one-hots at the head, then generation
    ctx = gcfg.context_len
    real_ctx = jax.nn.one_hot(data[:ctx], V, dtype=jnp.float32)
    n_gen0 = gcfg.sample_len - ctx
    flags0 = jnp.full((n_gen0,), bool(gcfg.truncate_backprop))
    noise0 = noise[:n_gen0] if noise is not None else None
    samples0, mems, last = scan(mems, real_ctx[-1], flags0, rngs[0], noise0)
    fake0 = jnp.concatenate([real_ctx, samples0], axis=0)
    chunks.append((fake0, data[0:gcfg.sample_len]))

    for c in range(1, gcfg.sample_chunks_mem):
        if not chunked:
            # chunked-path K/V are already detached at write
            mems = jax.lax.stop_gradient(mems)
        flags = jnp.concatenate([
            jnp.array([True]),
            jnp.full((gcfg.sample_len - 1,), bool(gcfg.truncate_backprop))])
        noise_c = None
        if noise is not None:
            off = n_gen0 + (c - 1) * gcfg.sample_len
            noise_c = noise[off:off + gcfg.sample_len]
        samples, mems, last = scan(mems, jax.lax.stop_gradient(last),
                                   flags, rngs[c], noise_c)
        start = c * gcfg.sample_len
        chunks.append((samples, data[start:start + gcfg.sample_len]))
    return chunks


# ---------------------------------------------------------------------------
# Discriminator scoring
# ---------------------------------------------------------------------------

def score_chunk(dis_params, dis_cfg, gcfg: GanConfig, real_ids, fake_soft,
                *, train: bool = False, rng=None):
    """(d_out_real, d_out_fake) for one chunk.

    real_ids: [len, bsz] ids; fake_soft: [len, bsz, V] one-hot/soft.

    Real and fake are scored in ONE batched discriminator call ([2b]
    rows) — per-sample semantics are identical (no cross-batch ops in
    either discriminator) and it halves the serialized per-call op
    tail on TPU; only the dropout rng consumption differs from two
    separate calls (one draw over the concatenated batch)."""
    bsz = real_ids.shape[1]
    if gcfg.dis_type == "bert":
        emb_matrix = dis_params["word_embeddings"]  # [V+1, h]
        real_bt = real_ids.T                        # [bsz, len]
        fake_bt = fake_soft.transpose(1, 0, 2)      # [bsz, len, V]
        # zero column for [MASK] (transformer_gan.py:398-400)
        fake_bt = jnp.concatenate(
            [fake_bt, jnp.zeros(fake_bt.shape[:-1] + (1,),
                                fake_bt.dtype)], -1)
        emb_real = emb_matrix[real_bt]
        emb_fake = jnp.einsum("ve,bcv->bce", emb_matrix, fake_bt)
        both = jnp.concatenate(
            [emb_real.astype(emb_fake.dtype), emb_fake], axis=0)
        d_both = bert_mod.bert_discriminator_score(
            dis_params, dis_cfg, both, train=train, rng=rng)
        return d_both[:bsz], d_both[bsz:]
    elif gcfg.dis_type == "cnn":
        real_soft = jax.nn.one_hot(real_ids.T, gcfg.n_token,
                                   dtype=fake_soft.dtype)
        fake_bt = fake_soft.transpose(1, 0, 2)
        both = jnp.concatenate([real_soft, fake_bt], axis=0)
        d_both = disc_mod.relgan_logits(dis_params, dis_cfg, both,
                                        train=train, rng=rng)
        # RelGAN emits num_rep scores per row: [2b*rep] row-major
        return d_both[:d_both.shape[0] // 2], \
            d_both[d_both.shape[0] // 2:]
    raise NotImplementedError(gcfg.dis_type)


def chunk_gradient_penalty(dis_params, dis_cfg, gcfg: GanConfig, real_ids,
                           fake_soft, rng):
    """WGAN-GP on one-hot interpolates (transformer_gan.py:203-230,
    429-434)."""
    if gcfg.dis_type == "bert":
        real = jax.nn.one_hot(real_ids.T, gcfg.n_token + 1,
                              dtype=jnp.float32)
        fake = fake_soft.transpose(1, 0, 2)
        fake = jnp.concatenate(
            [fake, jnp.zeros(fake.shape[:-1] + (1,), fake.dtype)], -1)
        emb_matrix = dis_params["word_embeddings"]

        def disc_fn(x):
            emb = jnp.einsum("ve,bcv->bce", emb_matrix, x)
            return bert_mod.bert_discriminator_score(dis_params, dis_cfg,
                                                     emb)
    else:
        real = jax.nn.one_hot(real_ids.T, gcfg.n_token, dtype=jnp.float32)
        fake = fake_soft.transpose(1, 0, 2)

        def disc_fn(x):
            return disc_mod.relgan_logits(dis_params, dis_cfg, x)

    return gradient_penalty(disc_fn, real, jax.lax.stop_gradient(fake), rng)


# ---------------------------------------------------------------------------
# PPO auxiliary classifier (reference dis_D, transformer_gan.py:184-201)
# ---------------------------------------------------------------------------

def dis_D_forward(disD_params, disD_cfg, gcfg: GanConfig, chunk):
    """chunk: [len, bsz] ids or [len, bsz, V] soft -> scores [bsz]."""
    data = (chunk.T if chunk.ndim == 2
            else chunk.transpose(1, 0, 2))
    if gcfg.ppo_dis_type == "bert":
        emb_matrix = disD_params["word_embeddings"]
        if data.ndim == 3:
            data = jnp.argmax(data, axis=-1)
        emb = emb_matrix[data]
        return bert_mod.bert_discriminator_score(disD_params, disD_cfg, emb)
    elif gcfg.ppo_dis_type == "cnn":
        if data.ndim == 2:
            data = jax.nn.one_hot(data, gcfg.n_token, dtype=jnp.float32)
        return disc_mod.relgan_logits(disD_params, disD_cfg, data)
    raise NotImplementedError(gcfg.ppo_dis_type)


def ppo_surrogate(disD_params, disD_cfg, gcfg: GanConfig, fake_chunk,
                  d_out_fake, P0):
    """PPO-clipped surrogate replacing d_out_fake for the generator loss
    (transformer_gan.py:376-389,418-426)."""
    D1 = jax.nn.sigmoid(dis_D_forward(disD_params, disD_cfg, gcfg,
                                      fake_chunk))
    P1 = 1.0 - D1
    ratio = P1 / jnp.clip(D1 * P0, a_min=1e-7)
    ratio_clipped = jnp.clip(ratio, 1.0 - gcfg.clip_param,
                             1.0 + gcfg.clip_param)
    if d_out_fake.shape[0] != ratio.shape[0]:
        # Main D emits num_rep scores per row (RelGAN) while dis_D emits one:
        # tile the per-row ratio. (The reference would crash here —
        # ratio [bsz] * d_out_fake [bsz*num_rep]; PPO was only exercised
        # with the BERT main D.)
        rep = d_out_fake.shape[0] // ratio.shape[0]
        ratio = jnp.repeat(ratio, rep)
        ratio_clipped = jnp.repeat(ratio_clipped, rep)
    surr1 = ratio * d_out_fake
    surr2 = ratio_clipped * d_out_fake
    return jnp.where(d_out_fake > 0, jnp.minimum(surr1, surr2),
                     jnp.maximum(surr1, surr2))


def compute_P0(disD_params, disD_cfg, gcfg: GanConfig, fake_chunk):
    """P0 snapshot = (1 - D0)/D0 under no grad (transformer_gan.py:352-355,
    378-381)."""
    D0 = jax.nn.sigmoid(dis_D_forward(
        jax.lax.stop_gradient(disD_params), disD_cfg, gcfg,
        jax.lax.stop_gradient(fake_chunk)))
    return (1.0 - D0) / jnp.clip(D0, a_min=1e-7)


# ---------------------------------------------------------------------------
# Per-batch losses (one [tgt_len, bsz] GAN batch, all chunks)
# ---------------------------------------------------------------------------

def gan_losses_for_batch(gen_params, dis_params, dis_cfg, xcfg, gcfg,
                         data, temperature, rng, *, train_dis: bool,
                         disD_params=None, disD_cfg=None, P0=None,
                         update_P0: bool = False, sample_noise=None):
    """Sample fakes and score every chunk.

    Returns (dict with summed (over chunks) gen_loss, dis_loss, gp_loss,
    new P0). For the dis phase the fake is detached
    (transformer_gan.py:346-347). With ``update_P0`` (reference
    update_D0 / first call, :376-381), P0 is re-snapshotted from each
    chunk's fake before use. ``sample_noise`` feeds injected gumbel
    draws through to sample_fake_chunks (trajectory-parity harness).
    """
    rng, sample_rng = jax.random.split(rng)
    # train_dis: the fake is detached below, so sampling is forward-only
    # and can run on the fused decode kernel
    chunks = sample_fake_chunks(gen_params, xcfg, gcfg, data, temperature,
                                sample_rng, noise=sample_noise,
                                forward_only=train_dis)
    gen_loss = jnp.zeros((), jnp.float32)
    dis_loss = jnp.zeros((), jnp.float32)
    gp_loss = jnp.zeros((), jnp.float32)
    for fake_chunk, real_ids in chunks:
        if train_dis:
            fake_chunk = jax.lax.stop_gradient(fake_chunk)
        rng, score_rng, gp_rng = jax.random.split(rng, 3)
        d_real, d_fake = score_chunk(dis_params, dis_cfg, gcfg, real_ids,
                                     fake_chunk, train=train_dis,
                                     rng=score_rng if train_dis else None)
        if gcfg.ppo and not train_dis:
            if update_P0:
                P0 = compute_P0(disD_params, disD_cfg, gcfg, fake_chunk)
            target = ppo_surrogate(disD_params, disD_cfg, gcfg, fake_chunk,
                                   d_fake, P0)
            g, d = get_losses(d_real, target, gcfg.loss_type)
        else:
            g, d = get_losses(d_real, d_fake, gcfg.loss_type)
        gen_loss = gen_loss + g
        dis_loss = dis_loss + d
        if train_dis and gcfg.has_gp:
            gp_loss = gp_loss + chunk_gradient_penalty(
                dis_params, dis_cfg, gcfg, real_ids, fake_chunk, gp_rng)
    return ({"gen_loss": gen_loss, "dis_loss": dis_loss,
             "gp_loss": gp_loss}, P0)


def classifier_loss_for_batch(gen_params, disD_params, disD_cfg, xcfg, gcfg,
                              data, temperature, rng):
    """PPO classifier BCE: real->1, fake->0 (transformer_gan.py:351-373)."""
    rng, sample_rng = jax.random.split(rng)
    chunks = sample_fake_chunks(
        jax.lax.stop_gradient(gen_params), xcfg, gcfg, data, temperature,
        sample_rng, forward_only=True)
    total = jnp.zeros((), jnp.float32)
    for fake_chunk, real_ids in chunks:
        pr = jax.nn.sigmoid(dis_D_forward(disD_params, disD_cfg, gcfg,
                                          real_ids))
        pf = jax.nn.sigmoid(dis_D_forward(
            disD_params, disD_cfg, gcfg,
            jax.lax.stop_gradient(fake_chunk)))
        eps = 1e-7
        err_real = -jnp.mean(jnp.log(jnp.clip(pr, eps, 1 - eps)))
        err_fake = -jnp.mean(jnp.log(jnp.clip(1 - pf, eps, 1 - eps)))
        total = total + (err_real + err_fake)
    return total / (gcfg.batch_chunk * gcfg.sample_chunks_mem)
