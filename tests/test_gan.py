"""GAN stack tests: loss zoo vs torch reference, discriminator parity vs
torch RelGAN_D, BERT parity vs HuggingFace, sampling-scan gradient flow."""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_gan_tpu.models import bert as bert_mod  # noqa: E402
from transformer_gan_tpu.models import discriminator as disc_mod  # noqa: E402
from transformer_gan_tpu.models import gan as gan_mod  # noqa: E402
from transformer_gan_tpu.models import xl  # noqa: E402
from transformer_gan_tpu.train import losses as tl  # noqa: E402

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "model"))


@pytest.mark.skipif(not HAS_REF, reason="reference unavailable")
@pytest.mark.parametrize("loss_type",
                         ["standard", "JS", "KL", "wgan", "rsgan", "ppo"])
def test_loss_zoo_matches_reference(loss_type):
    import torch
    sys.path.insert(0, os.path.join(REF, "model"))
    sys.path.insert(0, os.path.join(REF, "model", "utils"))
    from helpers import get_losses as ref_get_losses

    rng = np.random.RandomState(0)
    dr = rng.randn(16).astype(np.float32)
    df = rng.randn(16).astype(np.float32)
    g_ref, d_ref = ref_get_losses(torch.from_numpy(dr),
                                  torch.from_numpy(df), loss_type)
    g, d = tl.get_losses(jnp.asarray(dr), jnp.asarray(df), loss_type)
    np.testing.assert_allclose(float(g), float(g_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(d), float(d_ref), rtol=1e-5, atol=1e-6)


def test_hinge_tv_work_here():
    # The reference's hinge/tv branches crash (helpers.py:110-125);
    # ours must produce the textbook values.
    dr = jnp.asarray([0.5, -2.0])
    df = jnp.asarray([1.5, -0.25])
    g, d = tl.get_losses(dr, df, "hinge")
    np.testing.assert_allclose(
        float(d), np.mean([0.5, 3.0]) + np.mean([2.5, 0.75]), rtol=1e-6)
    np.testing.assert_allclose(float(g), -float(df.mean()), rtol=1e-6)
    g, d = tl.get_losses(dr, df, "tv")
    np.testing.assert_allclose(
        float(d), float(jnp.mean(jnp.tanh(df) - jnp.tanh(dr))), rtol=1e-6)


@pytest.mark.skipif(not HAS_REF, reason="reference unavailable")
def test_relgan_discriminator_parity_with_torch():
    import torch
    import transformers
    if not hasattr(transformers, "AdamW"):
        # installed transformers dropped AdamW; the reference imports it
        transformers.AdamW = torch.optim.AdamW
    sys.path.insert(0, os.path.join(REF, "model"))
    sys.path.insert(0, os.path.join(REF, "model", "utils"))
    from transformer_gan import RelGAN_D

    from transformer_gan_tpu.config import get_default_cfg_training
    cfg = get_default_cfg_training()

    rcfg = disc_mod.RelganConfig(embed_dim=64, num_rep=64, vocab_size=310,
                                 init="uniform")
    params = disc_mod.init_relgan_params(rcfg, seed=3)

    ref = RelGAN_D(embed_dim=64, max_seq_len=16, num_rep=64, vocab_size=310,
                   padding_idx=1, gpu=False, cfg=cfg)
    ref.eval()
    sd = ref.state_dict()

    def t(x):
        return torch.from_numpy(np.asarray(x))

    sd["embeddings.weight"] = t(params["embeddings"]).T.contiguous()
    for i, conv in enumerate(params["convs"]):
        sd[f"convs.{i}.weight"] = t(conv["w"])
        sd[f"convs.{i}.bias"] = t(conv["b"])
    sd["highway.weight"] = t(params["highway_w"]).T.contiguous()
    sd["highway.bias"] = t(params["highway_b"])
    sd["feature2out.weight"] = t(params["feature2out_w"]).T.contiguous()
    sd["feature2out.bias"] = t(params["feature2out_b"])
    sd["out2logits.weight"] = t(params["out2logits_w"]).T.contiguous()
    sd["out2logits.bias"] = t(params["out2logits_b"])
    ref.load_state_dict(sd)

    rng = np.random.RandomState(1)
    inp = rng.dirichlet(np.ones(310), size=(4, 16)).astype(np.float32)
    ours = disc_mod.relgan_logits(params, rcfg, jnp.asarray(inp))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(inp))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_bert_parity_with_huggingface():
    transformers = pytest.importorskip("transformers")
    import torch

    cfg = bert_mod.BertConfig(vocab_size=311, hidden_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              intermediate_size=128)
    params = bert_mod.init_bert_params(cfg, seed=5)

    hf_cfg = transformers.BertConfig(
        vocab_size=311, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, num_labels=2)
    hf = transformers.BertForSequenceClassification(hf_cfg)
    hf.eval()

    def t(x):
        return torch.from_numpy(np.asarray(x))

    sd = hf.state_dict()
    sd["bert.embeddings.word_embeddings.weight"] = t(
        params["word_embeddings"])
    sd["bert.embeddings.position_embeddings.weight"] = t(
        params["position_embeddings"])
    sd["bert.embeddings.token_type_embeddings.weight"] = t(
        params["token_type_embeddings"])
    sd["bert.embeddings.LayerNorm.weight"] = t(params["emb_ln_scale"])
    sd["bert.embeddings.LayerNorm.bias"] = t(params["emb_ln_bias"])
    for i, lyr in enumerate(params["layers"]):
        p = f"bert.encoder.layer.{i}."
        sd[p + "attention.self.query.weight"] = t(lyr["q_w"]).T.contiguous()
        sd[p + "attention.self.query.bias"] = t(lyr["q_b"])
        sd[p + "attention.self.key.weight"] = t(lyr["k_w"]).T.contiguous()
        sd[p + "attention.self.key.bias"] = t(lyr["k_b"])
        sd[p + "attention.self.value.weight"] = t(lyr["v_w"]).T.contiguous()
        sd[p + "attention.self.value.bias"] = t(lyr["v_b"])
        sd[p + "attention.output.dense.weight"] = t(
            lyr["attn_out_w"]).T.contiguous()
        sd[p + "attention.output.dense.bias"] = t(lyr["attn_out_b"])
        sd[p + "attention.output.LayerNorm.weight"] = t(
            lyr["attn_ln_scale"])
        sd[p + "attention.output.LayerNorm.bias"] = t(lyr["attn_ln_bias"])
        sd[p + "intermediate.dense.weight"] = t(lyr["ffn_w1"]).T.contiguous()
        sd[p + "intermediate.dense.bias"] = t(lyr["ffn_b1"])
        sd[p + "output.dense.weight"] = t(lyr["ffn_w2"]).T.contiguous()
        sd[p + "output.dense.bias"] = t(lyr["ffn_b2"])
        sd[p + "output.LayerNorm.weight"] = t(lyr["ffn_ln_scale"])
        sd[p + "output.LayerNorm.bias"] = t(lyr["ffn_ln_bias"])
    sd["bert.pooler.dense.weight"] = t(params["pooler_w"]).T.contiguous()
    sd["bert.pooler.dense.bias"] = t(params["pooler_b"])
    sd["classifier.weight"] = t(params["classifier_w"]).T.contiguous()
    sd["classifier.bias"] = t(params["classifier_b"])
    hf.load_state_dict(sd)

    rng = np.random.RandomState(2)
    ids = rng.randint(0, 311, (3, 20))
    hidden = bert_mod.bert_encode(params, cfg, input_ids=jnp.asarray(ids))
    ours = bert_mod.bert_cls_logits(params, cfg, hidden)
    with torch.no_grad():
        theirs = hf(torch.from_numpy(ids)).logits
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=2e-4, atol=2e-5)


def _tiny_setup():
    xcfg = xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32,
                       dropout=0.0, dropatt=0.0, n_token=310)
    gen_params = xl.init_xl_params(xcfg, seed=0)
    gcfg = gan_mod.GanConfig(dis_type="cnn", loss_type="rsgan", tgt_len=12,
                             mem_len=12, context_len=3, sample_chunks_mem=2,
                             n_token=310)
    rcfg = disc_mod.RelganConfig(embed_dim=16, num_rep=4, vocab_size=310)
    dis_params = disc_mod.init_relgan_params(rcfg, seed=1)
    return xcfg, gen_params, gcfg, rcfg, dis_params


def test_sample_fake_chunks_shapes_and_context():
    xcfg, gen_params, gcfg, _, _ = _tiny_setup()
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(2, 310, (12, 3)))
    chunks = gan_mod.sample_fake_chunks(gen_params, xcfg, gcfg, data, 1.0,
                                        jax.random.PRNGKey(0))
    assert len(chunks) == 2
    for fake, real in chunks:
        assert fake.shape == (6, 3, 310)
        assert real.shape == (6, 3)
        arr = np.asarray(fake)
        np.testing.assert_allclose(arr.sum(-1), 1.0, rtol=1e-5)
    # chunk 0 head = real context one-hots
    fake0 = np.asarray(chunks[0][0])
    assert (fake0[:3].argmax(-1) == np.asarray(data[:3])).all()


def test_gen_gradients_flow_through_sampling():
    xcfg, gen_params, gcfg, rcfg, dis_params = _tiny_setup()
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(2, 310, (12, 3)))

    def loss_fn(gp):
        losses, _ = gan_mod.gan_losses_for_batch(
            gp, dis_params, rcfg, xcfg, gcfg, data, 1.0,
            jax.random.PRNGKey(1), train_dis=False)
        return losses["gen_loss"]

    grads = jax.jit(jax.grad(loss_fn))(gen_params)
    gnorm = float(sum(jnp.sum(jnp.abs(g))
                      for g in jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(gnorm) and gnorm > 0


def test_dis_gradients_do_not_touch_generator():
    xcfg, gen_params, gcfg, rcfg, dis_params = _tiny_setup()
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(2, 310, (12, 3)))

    def loss_fn(dp, gp):
        losses, _ = gan_mod.gan_losses_for_batch(
            gp, dp, rcfg, xcfg, gcfg, data, 1.0, jax.random.PRNGKey(1),
            train_dis=True)
        return losses["dis_loss"]

    gd, gg = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(dis_params,
                                                        gen_params)
    dnorm = float(sum(jnp.sum(jnp.abs(g))
                      for g in jax.tree_util.tree_leaves(gd)))
    gnorm = float(sum(jnp.sum(jnp.abs(g))
                      for g in jax.tree_util.tree_leaves(gg)))
    assert dnorm > 0
    assert gnorm == 0.0  # fake detached for the dis phase


def test_gradient_penalty_positive_and_finite():
    xcfg, gen_params, gcfg, rcfg, dis_params = _tiny_setup()
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randint(2, 310, (6, 3)))
    fake = jax.nn.one_hot(jnp.asarray(rng.randint(2, 310, (6, 3))), 310)
    gp = gan_mod.chunk_gradient_penalty(dis_params, rcfg, gcfg, real, fake,
                                        jax.random.PRNGKey(0))
    assert np.isfinite(float(gp)) and float(gp) >= 0


def test_temperature_schedules_match_reference():
    if not HAS_REF:
        pytest.skip("reference unavailable")
    sys.path.insert(0, os.path.join(REF, "model", "utils"))
    from helpers import get_fixed_temperature as ref_temp
    for adapt in ["no", "lin", "exp", "log", "sigmoid", "quad", "sqrt"]:
        for i in [0, 10, 99]:
            ours = tl.get_fixed_temperature(100.0, i, 100, adapt)
            theirs = ref_temp(100.0, i, 100, adapt)
            np.testing.assert_allclose(ours, theirs, rtol=1e-9)


# ---------------------------------------------------------------------------
# Chunked (two-level decode cache) GAN sampling vs the rolling oracle
# ---------------------------------------------------------------------------

def _chunked_setup(tgt_len, sample_chunks_mem, context_len=3,
                   decode_cache="chunked"):
    base = dict(n_layer=2, n_head=2, d_model=16, d_inner=32,
                dropout=0.0, dropatt=0.0, n_token=310)
    xcfg_roll = xl.XLConfig(cache_kv=False, **base)
    xcfg_chunk = xl.XLConfig(cache_kv=True, **base)
    gen_params = xl.init_xl_params(xcfg_roll, seed=0)
    # decode_cache="chunked" forces the two-level cache under cache_kv
    # (mem_len here is far below the auto threshold); the cache_kv=False
    # runs fall back to the rolling oracle regardless.
    gcfg = gan_mod.GanConfig(dis_type="cnn", loss_type="rsgan",
                             tgt_len=tgt_len, mem_len=tgt_len,
                             context_len=context_len,
                             sample_chunks_mem=sample_chunks_mem,
                             n_token=310, decode_cache=decode_cache)
    rcfg = disc_mod.RelganConfig(embed_dim=16, num_rep=4, vocab_size=310)
    dis_params = disc_mod.init_relgan_params(rcfg, seed=1)
    return xcfg_roll, xcfg_chunk, gen_params, gcfg, rcfg, dis_params


@pytest.mark.parametrize("tgt_len,chunks,cache", [
    (12, 2, "chunked"), (70, 1, "chunked"), (12, 2, "rolling")])
def test_chunked_gan_sampling_matches_rolling(tgt_len, chunks, cache):
    """sample_fake_chunks under cache_kv draws the SAME tokens as the
    raw-hiddens oracle — for the chunked decode cache (identical per-step
    gumbel key shapes; tgt_len=70 exercises the inner-chunk merge, C=32:
    2 full + rem 5) AND for the rolling cache_kv path with hoisted
    positional projections."""
    (xcfg_roll, xcfg_chunk, gen_params, gcfg, _,
     _) = _chunked_setup(tgt_len, chunks, decode_cache=cache)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(2, 310, (tgt_len, 3)))
    key = jax.random.PRNGKey(7)
    out_roll = gan_mod.sample_fake_chunks(gen_params, xcfg_roll, gcfg,
                                          data, 1.0, key)
    out_chunk = gan_mod.sample_fake_chunks(gen_params, xcfg_chunk, gcfg,
                                           data, 1.0, key)
    assert len(out_roll) == len(out_chunk) == chunks
    for (f_r, r_r), (f_c, r_c) in zip(out_roll, out_chunk):
        np.testing.assert_array_equal(np.asarray(f_r.argmax(-1)),
                                      np.asarray(f_c.argmax(-1)))
        np.testing.assert_array_equal(np.asarray(r_r), np.asarray(r_c))
        np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_c),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("tgt_len,chunks,bsz,cache",
                         [(12, 2, 3, "chunked"), (70, 1, 3, "chunked"),
                          (12, 2, 8, "chunked"), (12, 2, 3, "rolling")])
def test_chunked_gan_gen_gradients_match_rolling(tgt_len, chunks, bsz,
                                                 cache):
    """gen-phase loss AND all generator gradients agree between the
    cache_kv sampling paths (chunked decode cache / rolling with hoisted
    positional projections) and the raw-hiddens oracle (same detach
    semantics: K/V memory detached per step, live self-attention, r_w
    gradient from every step, chunk-boundary input detach)."""
    (xcfg_roll, xcfg_chunk, gen_params, gcfg, rcfg,
     dis_params) = _chunked_setup(tgt_len, chunks, decode_cache=cache)
    rng = np.random.RandomState(1)
    data = jnp.asarray(rng.randint(2, 310, (tgt_len, bsz)))
    key = jax.random.PRNGKey(3)

    def loss_fn(gp, xcfg):
        losses, _ = gan_mod.gan_losses_for_batch(
            gp, dis_params, rcfg, xcfg, gcfg, data, 1.0, key,
            train_dis=False)
        return losses["gen_loss"]

    l_r, g_r = jax.value_and_grad(lambda p: loss_fn(p, xcfg_roll))(
        gen_params)
    l_c, g_c = jax.value_and_grad(lambda p: loss_fn(p, xcfg_chunk))(
        gen_params)
    np.testing.assert_allclose(float(l_r), float(l_c), rtol=1e-4)
    flat_r = jax.tree_util.tree_leaves_with_path(g_r)
    flat_c = jax.tree_util.tree_leaves(g_c)
    assert len(flat_r) == len(flat_c)
    for (path, a), b in zip(flat_r, flat_c):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}")


def test_chunked_gan_dis_loss_matches_rolling():
    """dis-phase losses (incl. gradient penalty) agree across paths."""
    (xcfg_roll, xcfg_chunk, gen_params, gcfg, rcfg,
     dis_params) = _chunked_setup(12, 2)
    gcfg = gan_mod.GanConfig(**{**gcfg.__dict__, "loss_type": "rsgan-gp"})
    rng = np.random.RandomState(2)
    data = jnp.asarray(rng.randint(2, 310, (12, 3)))
    key = jax.random.PRNGKey(5)

    def loss_fn(dp, xcfg):
        losses, _ = gan_mod.gan_losses_for_batch(
            gen_params, dp, rcfg, xcfg, gcfg, data, 1.0, key,
            train_dis=True)
        return losses["dis_loss"] + losses["gp_loss"]

    l_r, g_r = jax.value_and_grad(lambda p: loss_fn(p, xcfg_roll))(
        dis_params)
    l_c, g_c = jax.value_and_grad(lambda p: loss_fn(p, xcfg_chunk))(
        dis_params)
    np.testing.assert_allclose(float(l_r), float(l_c), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_r),
                    jax.tree_util.tree_leaves(g_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_batched_scoring_matches_two_calls():
    """score_chunk's single [2b]-row discriminator call must produce the
    same (d_real, d_fake) as two separate calls (no cross-batch ops in
    either discriminator); dropout off where the rng consumption
    differs."""
    rng = np.random.RandomState(5)
    real_ids = jnp.asarray(rng.randint(2, 310, (12, 6)))
    fake = jax.nn.one_hot(
        jnp.asarray(rng.randint(2, 310, (12, 6))), 310,
        dtype=jnp.float32)
    # CNN / RelGAN
    gcfg = gan_mod.GanConfig(dis_type="cnn", loss_type="rsgan",
                             n_token=310)
    rcfg = disc_mod.RelganConfig(embed_dim=16, num_rep=4, vocab_size=310)
    dp = disc_mod.init_relgan_params(rcfg, seed=1)
    d_r, d_f = gan_mod.score_chunk(dp, rcfg, gcfg, real_ids, fake)
    ref_r = disc_mod.relgan_logits(
        dp, rcfg, jax.nn.one_hot(real_ids.T, 310, dtype=jnp.float32))
    ref_f = disc_mod.relgan_logits(dp, rcfg, fake.transpose(1, 0, 2))
    np.testing.assert_allclose(np.asarray(d_r), np.asarray(ref_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(ref_f),
                               rtol=1e-5, atol=1e-6)
    # BERT critic
    from transformer_gan_tpu.models import bert as bert_mod
    bcfg = bert_mod.BertConfig(vocab_size=311, hidden_size=32,
                               num_hidden_layers=2,
                               num_attention_heads=2,
                               intermediate_size=64)
    bp = bert_mod.init_bert_params(bcfg, seed=3)
    gcfg_b = gan_mod.GanConfig(dis_type="bert", loss_type="wgan-gp",
                               n_token=310)
    d_r, d_f = gan_mod.score_chunk(bp, bcfg, gcfg_b, real_ids, fake)
    emb = bp["word_embeddings"]
    ref_r = bert_mod.bert_discriminator_score(bp, bcfg, emb[real_ids.T])
    fake_bt = fake.transpose(1, 0, 2)
    fake_bt = jnp.concatenate(
        [fake_bt, jnp.zeros(fake_bt.shape[:-1] + (1,), fake_bt.dtype)],
        -1)
    ref_f = bert_mod.bert_discriminator_score(
        bp, bcfg, jnp.einsum("ve,bcv->bce", emb, fake_bt))
    np.testing.assert_allclose(np.asarray(d_r), np.asarray(ref_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(ref_f),
                               rtol=1e-5, atol=1e-6)


def test_ganconfig_rejects_contradictory_debug_knobs():
    """fused_sampler='off' forces the sequential scan in every phase,
    which makes the chain-backward kernel unreachable — asserting it via
    chain_bwd='kernel' must fail at construction, not silently train
    the 6x-slower sequential path with the assertion never firing."""
    import pytest as _pytest
    with _pytest.raises(ValueError, match="fused_sampler='off'"):
        gan_mod.GanConfig(fused_sampler="off", chain_bwd="kernel")
    # the documented oracle combination stays valid
    gan_mod.GanConfig(fused_sampler="off", chain_bwd="off")


def test_decode_cache_chunked_falls_back_to_rolling_without_cache_kv():
    """decode_cache='chunked' is an explicit alias of 'auto': without
    cache_kv (the projected-K/V storage the cache needs) sampling falls
    back to the rolling path and draws the exact tokens of
    decode_cache='rolling' (same rng stream)."""
    xcfg = xl.XLConfig(n_layer=1, n_head=2, d_model=16, d_inner=32,
                       n_token=310, dropout=0.0, dropatt=0.0,
                       cache_kv=False)
    params = xl.init_xl_params(xcfg, seed=0)
    gk = dict(tgt_len=8, mem_len=8, context_len=2, sample_chunks_mem=1,
              n_token=310)
    data = jnp.asarray(np.random.RandomState(0).randint(2, 310, (8, 2)))
    key = jax.random.PRNGKey(0)
    out_c = gan_mod.sample_fake_chunks(
        params, xcfg, gan_mod.GanConfig(decode_cache="chunked", **gk),
        data, 1.0, key)
    out_r = gan_mod.sample_fake_chunks(
        params, xcfg, gan_mod.GanConfig(decode_cache="rolling", **gk),
        data, 1.0, key)
    for (f_c, r_c), (f_r, r_r) in zip(out_c, out_r):
        np.testing.assert_array_equal(np.asarray(f_c.argmax(-1)),
                                      np.asarray(f_r.argmax(-1)))
        np.testing.assert_array_equal(np.asarray(r_c), np.asarray(r_r))
