#!/usr/bin/env python
"""Inference CLI — counterpart of reference model/generate.py.

Same YAML surface (utils/config_inference.py), same outputs: one token text
file per generated MIDI in OUTPUT.output_txt_directory, conditional "time
extension" priming from a token npy (count- or duration-selected prefix),
duration-based stop, and a debug mode asserting incremental == batch
memories (generate.py:309-327) plus prime NLL (generate.py:329-360).
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(
        description="TPU Transformer Inference")
    parser.add_argument(
        "--inference_config", type=str,
        default="inference_config/inference_unconditional.yml",
        help="path to the cfg file")
    return parser.parse_args()


def load_vocab(vocab_path):
    if (not os.path.exists(vocab_path)
            and os.path.basename(vocab_path) == "performance_vocab.txt"):
        # The reference default ("../data/performance_vocab.txt",
        # config.py EVENT.vocab_file_path) assumes its repo layout; fall
        # back to the byte-identical vocab shipped inside the package so
        # the CLI works from any cwd. A custom (differently named) vocab
        # path that is missing still fails loud below — silently
        # substituting the packaged vocab would corrupt the id mapping.
        packaged = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "transformer_gan_tpu", "data", "performance_vocab.txt")
        if os.path.exists(packaged):
            print(f"vocab {vocab_path} not found; using packaged "
                  f"{packaged}")
            vocab_path = packaged
    tokens_list = []
    with open(vocab_path, "r") as f:
        for line in f:
            tokens_list.append(line.strip())
    tokens_list = [t for t in tokens_list if t]
    token2index = {s: i for i, s in enumerate(tokens_list)}
    return tokens_list, token2index


def get_duration_from_token(event_representation, token_index, tokens_list):
    """TIME_SHIFT_k -> k * 10ms (reference generate.py:55-64)."""
    if event_representation == "magenta":
        tok = tokens_list[token_index]
        if tok.startswith("TIME_SHIFT"):
            return int(tok.split("_")[-1]) * 0.01
        return None
    raise NotImplementedError


def main(inference_cfg):
    import jax
    import jax.numpy as jnp
    from transformer_gan_tpu.config import get_default_cfg_training, is_null
    from transformer_gan_tpu.data.vocab import BaseVocab
    from transformer_gan_tpu.infer import sample as sampling
    from transformer_gan_tpu.models import xl
    from transformer_gan_tpu.train import checkpoint as ckpt

    if inference_cfg.EVENT.event_representation != "magenta":
        raise NotImplementedError(
            "Newevent representation generations are yet to be implemented")
    empty_bar_symbol = "TIME_SHIFT_100"

    model_fp = os.path.join(inference_cfg.MODEL.model_directory,
                            inference_cfg.MODEL.checkpoint_name)
    cfg_fp = os.path.join(inference_cfg.MODEL.model_directory, "config.yml")
    out_dir = inference_cfg.OUTPUT.output_txt_directory
    os.makedirs(out_dir, exist_ok=True)
    ext = ".txt"

    tokens_list, token2index = load_vocab(
        inference_cfg.EVENT.vocab_file_path)
    perform_vocab = BaseVocab(tokens_list)
    empty_bar_token = token2index[empty_bar_symbol]

    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.merge_from_file(cfg_fp)
    cfg.DISCRIMINATOR.type = "Null"
    cfg.MODEL.same_length = True
    cfg.freeze()
    if cfg.TRAIN.append_note_status:
        perform_vocab.notes_mapping()

    xcfg = xl.XLConfig.from_cfg(cfg, len(perform_vocab),
                                perform_vocab.vec_len)
    template = xl.init_xl_params(xcfg, seed=0)
    payload = ckpt.load_checkpoint(model_fp)
    params = jax.tree.map(
        jnp.asarray,
        payload["params"] if "params" in payload else payload)
    del template

    mem_len = int(inference_cfg.MODEL.memory_length)
    scfg = sampling.SamplingConfig.from_cfg(inference_cfg, empty_bar_token)
    decode_step = sampling.make_decode_step(xcfg, scfg)
    prime_step = sampling.make_prime_step(xcfg)
    rng = jax.random.key(int(cfg.TRAIN.seed),
                         impl=getattr(cfg.TPU, "rng_impl", "threefry2x32"))

    # conditional "time extension" prefix (reference generate.py:150-174)
    num_conditional_tokens = 0
    conditional_data = None
    if inference_cfg.INPUT.time_extension and not is_null(
            inference_cfg.INPUT.conditional_input_melody):
        conditional_data = np.load(
            inference_cfg.INPUT.conditional_input_melody).tolist()
        print("* Loaded conditional file {}".format(
            inference_cfg.INPUT.conditional_input_melody))
        num_conditional_tokens = inference_cfg.INPUT.num_conditional_tokens
        if inference_cfg.GENERATION.duration_based:
            duration = 0.0
            for num_conditional_tokens, cond_idx in enumerate(
                    conditional_data):
                token_duration = get_duration_from_token(
                    inference_cfg.EVENT.event_representation, cond_idx,
                    tokens_list)
                if token_duration:
                    duration += token_duration
                if duration >= inference_cfg.INPUT.conditional_duration:
                    break
            print("* Total number of tokens used for condition is {} for"
                  " duration {}".format(num_conditional_tokens, duration))
        else:
            num_conditional_tokens = min(num_conditional_tokens,
                                         len(conditional_data))
            print("* Total number of tokens used for condition is {}".format(
                num_conditional_tokens))

        with open(os.path.join(out_dir, "prefix" + ext), "w") as f:
            f.write("\n".join(
                tokens_list[t]
                for t in conditional_data[:num_conditional_tokens]))
        with open(os.path.join(out_dir, "full" + ext), "w") as f:
            f.write("\n".join(tokens_list[t] for t in conditional_data))

    start_id = (perform_vocab.pad_id if cfg.TRAIN.replace_start_with_pad
                else perform_vocab.bos_id)

    if (not inference_cfg.GENERATION.duration_based
            and not inference_cfg.MODEL.debug):
        # Fixed-length generation: batch independent files into waves of
        # lanes on one device. Prefer the LARGEST wave that keeps the
        # K/V cache RESIDENT in the fused kernel's VMEM (87 us/token
        # measured at mem 4146 — faster than ANY wider wave), then the
        # largest streamed fused wave (any fused wave out-aggregates
        # any jnp wave: fused 2-lane 9.8k / 1-lane-resident 11.6k
        # events/s vs jnp 8-lane 7.1k / 16-lane 8.0k — see PERF.md,
        # tools/gen_lanes_tpu.py); fall back to 8-lane jnp when no
        # fused wave applies (e.g. nucleus sampling).
        from transformer_gan_tpu.ops import pallas_generate as pgen
        n_files = inference_cfg.INPUT.num_midi_files
        generation_length = inference_cfg.GENERATION.generation_length
        max_lanes = 8
        chunk = min(sampling.DECODE_CHUNK, generation_length)
        for gate in (pgen.supports_kv_resident,
                     pgen.supports_fused_generate):
            cap = next((cand for cand in (8, 4, 2, 1)
                        if gate(xcfg, scfg, cand, mem_len, chunk)), None)
            if cap is not None:
                max_lanes = cap
                break
        done = 0
        while done < n_files:
            lanes = min(max_lanes, n_files - done)
            seq_prefix = [start_id]
            mems = xl.init_mems(xcfg, mem_len, lanes)
            if conditional_data is not None and num_conditional_tokens >= 1:
                context = np.array(
                    seq_prefix + conditional_data[:num_conditional_tokens - 1],
                    dtype=np.int32)[:, None]
                context = np.tile(context, (1, lanes))
                _, mems = prime_step(params, jnp.asarray(context), mems)
                seq_prefix = seq_prefix + conditional_data[
                    :num_conditional_tokens]
            first = jnp.full((lanes,), seq_prefix[-1], jnp.int32)
            rng, scan_rng = jax.random.split(rng)
            tokens, mems = sampling.sample_scan_jit(
                params, xcfg, scfg, first, mems, generation_length,
                scan_rng)
            tokens = np.asarray(tokens)
            for lane in range(lanes):
                print("Generating the Midi File Number: "
                      + str(done + lane + 1))
                seq = seq_prefix + [int(t) for t in tokens[:, lane]]
                out_fp = os.path.join(out_dir, str(done + lane) + ext)
                with open(out_fp, "w") as f:
                    f.write("\n".join(tokens_list[t] for t in seq[1:]))
            done += lanes
        return

    for midi_file in range(inference_cfg.INPUT.num_midi_files):
        out_fp = os.path.join(out_dir, str(midi_file) + ext)
        seq = [start_id]
        mems = xl.init_mems(xcfg, mem_len, 1)
        print("Generating the Midi File Number: " + str(midi_file + 1))

        if (conditional_data is not None and num_conditional_tokens >= 1):
            context = np.array(
                seq + conditional_data[:num_conditional_tokens - 1],
                dtype=np.int32)[:, None]
            _, mems = prime_step(params, jnp.asarray(context), mems)
            seq = seq + conditional_data[:num_conditional_tokens]

        if inference_cfg.GENERATION.duration_based:
            # data-dependent stop: host loop over the jitted single step
            duration = 0.0
            generation_length = inference_cfg.GENERATION.max_generation_length
            empty_run = jnp.zeros((1,), jnp.int32)
            token = jnp.asarray([seq[-1]], jnp.int32)
            for i in range(generation_length):
                token_duration = get_duration_from_token(
                    inference_cfg.EVENT.event_representation, seq[-1],
                    tokens_list)
                if token_duration:
                    duration += token_duration
                if duration >= inference_cfg.GENERATION.generation_duration:
                    break
                rng, step_rng = jax.random.split(rng)
                token, mems, empty_run = decode_step(
                    params, mems, token, empty_run, step_rng)
                seq.append(int(token[0]))
        else:
            # fixed length: whole generation as one on-device lax.scan
            # (~10x faster than the per-token host loop on the tunnel)
            generation_length = inference_cfg.GENERATION.generation_length
            rng, scan_rng = jax.random.split(rng)
            tokens, mems = sampling.sample_scan_jit(
                params, xcfg, scfg, jnp.asarray([seq[-1]], jnp.int32),
                mems, generation_length, scan_rng)
            seq.extend(int(t) for t in np.asarray(tokens)[:, 0])

        with open(out_fp, "w") as f:
            f.write("\n".join(tokens_list[t] for t in seq[1:]))

        if inference_cfg.MODEL.debug:
            # incremental mems == batch mems (generate.py:309-327)
            data = np.array(seq[:-1], dtype=np.int32)[:, None]
            _, batch_mems = prime_step(
                params, jnp.asarray(data), xl.init_mems(xcfg, mem_len, 1))
            # incremental memory rounds to the storage dtype every step;
            # the paths agree to a few ulps AT THE ACTIVATION SCALE, so
            # the bf16 tolerance must be scale-aware: triage on the real
            # chip at mem 4146 / 4146 tokens (tools/prime_debug_tpu.py)
            # measured max |mems| 14.9 with incremental-vs-batch max diff
            # 0.22 = 3.5 ulps (two independent batch formulations agreed
            # to 1 ulp of each other). 6 ulps of the measured max is the
            # bf16 analogue of the reference's fp32 atol=1e-4
            # (generate.py:309-327).
            batch_f32 = np.asarray(batch_mems.hids, np.float32)
            if mems.hids.dtype == jnp.bfloat16:
                # ulp from the exponent, not max|x| * 2^-8: the latter is
                # 0.5-1 true bf16 ulp depending on where the max sits in
                # its binade, so the intended 6-ulp budget could shrink to
                # ~3 effective ulps (below the 3.5-ulp divergence measured
                # on chip) whenever the max lands just above a power of
                # two (ADVICE r4). bf16 ulp(x) = 2^(floor(log2|x|) - 7).
                max_abs = float(np.abs(batch_f32).max())
                exp = math.floor(math.log2(max_abs)) if max_abs > 0 else 0
                atol = 6 * 2.0 ** (exp - 7)
            else:
                atol = 1e-2
            diff = np.abs(
                np.asarray(mems.hids, np.float32) - batch_f32).max()
            assert diff < atol, (
                f"incremental and batch memories diverged: {diff}")
            print("Mem same")

            if conditional_data is not None and num_conditional_tokens >= 1:
                # prime NLL over the conditional prefix (generate.py:329-360)
                input_index = start_id
                nll = 0.0
                dbg_mems = xl.init_mems(xcfg, mem_len, 1)
                for i in range(num_conditional_tokens):
                    target = conditional_data[i]
                    inp = jnp.asarray([[input_index]], jnp.int32)
                    logits, dbg_mems = prime_step(params, inp, dbg_mems)
                    probs = jax.nn.softmax(
                        logits[-1, 0].astype(jnp.float32))
                    nll += -float(jnp.log(probs[target]))
                    input_index = target
                print("Prime NLL: {}, Prime PPL: {}".format(
                    nll / num_conditional_tokens,
                    np.exp(nll / num_conditional_tokens)))

            with open(os.path.join(out_dir, "inference.yml"), "w") as f:
                f.write(str(inference_cfg))


if __name__ == "__main__":
    args = parse_args()
    from transformer_gan_tpu.config import get_default_cfg_inference
    inference_cfg = get_default_cfg_inference()
    inference_cfg.defrost()
    inference_cfg.merge_from_file(args.inference_config)
    inference_cfg.freeze()
    print(inference_cfg)
    main(inference_cfg)
