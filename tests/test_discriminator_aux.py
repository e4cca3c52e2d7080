"""Torch-parity tests for the auxiliary discriminators.

The reference keeps three non-RelGAN discriminator classes in
model/discriminator.py; only their math is salvageable upstream:

- ``CNNDiscriminator`` (discriminator.py:26-86) is constructible when a
  cfg is supplied — tested here with copied weights, id-for-id.
- ``GRUDiscriminator`` (discriminator.py:89-152) is dead code upstream:
  ``init_params`` reads a bare module-global ``cfg`` (NameError,
  discriminator.py:146) and ``get_feature`` embeds the *builtin*
  ``input`` instead of ``inp`` (discriminator.py:134). Parity is
  therefore proven against a torch model built from the same topology
  (nn.GRU 2-layer bidirectional + gru2hidden + tanh + feature2out) with
  copied weights — which is exactly what the class would compute with
  the two typos fixed.
- ``CNNClassifier`` (discriminator.py:156-209) crashes on construction
  (its super().__init__ runs CNNDiscriminator.init_params with
  cfg=None, discriminator.py:79-85); its vanilla branch is the
  CNNDiscriminator forward with k_label outputs, covered by the CNN
  parity test below via k_label=4.
"""

import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from transformer_gan_tpu.models import discriminator as disc_mod  # noqa: E402

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "model"))


def _cfg_stub(init="uniform"):
    cnn = types.SimpleNamespace(init=init)
    return types.SimpleNamespace(
        DISCRIMINATOR=types.SimpleNamespace(CNN=cnn))


@pytest.mark.skipif(not HAS_REF, reason="reference unavailable")
@pytest.mark.parametrize("k_label", [2, 4])
def test_cnn_discriminator_parity_with_torch(k_label):
    sys.path.insert(0, os.path.join(REF, "model"))
    sys.path.insert(0, os.path.join(REF, "model", "utils"))
    from discriminator import CNNDiscriminator

    cfg = disc_mod.CnnConfig(embed_dim=48, vocab_size=310, k_label=k_label,
                             filter_sizes=(2, 3, 4), num_filters=(8, 8, 16))
    params = disc_mod.init_cnn_params(cfg, seed=7)

    ref = CNNDiscriminator(embed_dim=48, vocab_size=310,
                           filter_sizes=[2, 3, 4], num_filters=[8, 8, 16],
                           padding_idx=1, gpu=False, cfg=_cfg_stub())
    if k_label != 2:
        # the reference head is hardwired to 2; rebuild it for the
        # classifier-sized comparison (CNNClassifier's vanilla branch)
        ref.feature2out = torch.nn.Linear(ref.feature_dim, k_label)
    ref.eval()

    def t(x):
        return torch.from_numpy(np.asarray(x))

    sd = ref.state_dict()
    sd["embeddings.weight"] = t(params["embeddings"])
    for i, conv in enumerate(params["convs"]):
        sd[f"convs.{i}.weight"] = t(conv["w"])
        sd[f"convs.{i}.bias"] = t(conv["b"])
    sd["highway.weight"] = t(params["highway_w"]).T.contiguous()
    sd["highway.bias"] = t(params["highway_b"])
    sd["feature2out.weight"] = t(params["feature2out_w"]).T.contiguous()
    sd["feature2out.bias"] = t(params["feature2out_b"])
    ref.load_state_dict(sd)

    rng = np.random.RandomState(2)
    ids = rng.randint(0, 310, size=(5, 24))
    ours = disc_mod.cnn_logits(params, cfg, jnp.asarray(ids))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(ids))
    assert ours.shape == (5, k_label)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_gru_discriminator_parity_with_torch():
    cfg = disc_mod.GruConfig(embedding_dim=20, vocab_size=310,
                             hidden_dim=24, feature_dim=32)
    params = disc_mod.init_gru_params(cfg, seed=11)

    class TorchGRUD(torch.nn.Module):
        # GRUDiscriminator topology (reference discriminator.py:96-142)
        # with its two dead-code typos fixed
        def __init__(self):
            super().__init__()
            self.embeddings = torch.nn.Embedding(310, 20, padding_idx=1)
            self.gru = torch.nn.GRU(20, 24, num_layers=2,
                                    bidirectional=True)
            self.gru2hidden = torch.nn.Linear(2 * 2 * 24, 32)
            self.feature2out = torch.nn.Linear(32, 2)

        def forward(self, inp):
            emb = self.embeddings(inp).permute(1, 0, 2)
            h0 = torch.zeros(4, inp.size(0), 24)
            _, hidden = self.gru(emb, h0)
            hidden = hidden.permute(1, 0, 2).contiguous()
            feature = torch.tanh(self.gru2hidden(hidden.view(-1, 4 * 24)))
            return self.feature2out(feature)

    ref = TorchGRUD()
    ref.eval()

    def t(x):
        return torch.from_numpy(np.asarray(x))

    sd = ref.state_dict()
    sd["embeddings.weight"] = t(params["embeddings"])
    # our layers list is [l0fwd, l0bwd, l1fwd, l1bwd]; torch names are
    # weight_ih_l{k}[_reverse] with the same (r, z, n) gate order
    names = ["l0", "l0_reverse", "l1", "l1_reverse"]
    for cell, name in zip(params["layers"], names):
        sd[f"gru.weight_ih_{name}"] = t(cell["w_ih"])
        sd[f"gru.weight_hh_{name}"] = t(cell["w_hh"])
        sd[f"gru.bias_ih_{name}"] = t(cell["b_ih"])
        sd[f"gru.bias_hh_{name}"] = t(cell["b_hh"])
    sd["gru2hidden.weight"] = t(params["gru2hidden_w"]).T.contiguous()
    sd["gru2hidden.bias"] = t(params["gru2hidden_b"])
    sd["feature2out.weight"] = t(params["feature2out_w"]).T.contiguous()
    sd["feature2out.bias"] = t(params["feature2out_b"])
    ref.load_state_dict(sd)

    rng = np.random.RandomState(3)
    ids = rng.randint(0, 310, size=(6, 17))
    ours = disc_mod.gru_logits(params, cfg, jnp.asarray(ids))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(ids))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-4, atol=1e-5)
