"""Golden test: flax Qwen2 text encoder vs transformers Qwen2 on a tiny
random-weight config -- exact hidden_states[-2] parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easyanimate_tpu.models.text import (
    TINY_QWEN,
    Qwen2TextEncoder,
    convert_qwen2_state_dict,
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import Qwen2Config as HFConfig
    from transformers import Qwen2Model

    cfg = HFConfig(
        vocab_size=TINY_QWEN.vocab_size,
        hidden_size=TINY_QWEN.hidden_size,
        intermediate_size=TINY_QWEN.intermediate_size,
        num_hidden_layers=TINY_QWEN.num_hidden_layers,
        num_attention_heads=TINY_QWEN.num_attention_heads,
        num_key_value_heads=TINY_QWEN.num_key_value_heads,
        rope_theta=TINY_QWEN.rope_theta,
        rms_norm_eps=TINY_QWEN.rms_norm_eps,
        max_position_embeddings=512,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen2Model(cfg).eval()
    return model


@pytest.mark.parametrize("scan", [True, False])
def test_hidden_states_minus2_parity(hf_model, scan):
    import dataclasses

    import torch

    ids = np.array([[1, 5, 9, 20, 7, 3, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 1, 0, 0]], np.int64)
    with torch.no_grad():
        out = hf_model(input_ids=torch.from_numpy(ids),
                       attention_mask=torch.from_numpy(mask),
                       output_hidden_states=True)
    want = out.hidden_states[-2].numpy()

    cfg = dataclasses.replace(TINY_QWEN, scan_layers=scan)
    sd = {("model." + k): v.numpy() for k, v in hf_model.state_dict().items()}
    variables = convert_qwen2_state_dict(sd, cfg)
    enc = Qwen2TextEncoder(cfg)
    got = enc.apply(variables, jnp.asarray(ids), jnp.asarray(mask))
    # valid positions must agree tightly
    np.testing.assert_allclose(np.asarray(got)[:, :6], want[:, :6],
                               atol=2e-4, rtol=2e-3)


def test_encoder_runs_without_mask(hf_model):
    sd = {("model." + k): v.numpy() for k, v in hf_model.state_dict().items()}
    variables = convert_qwen2_state_dict(sd, TINY_QWEN)
    enc = Qwen2TextEncoder(TINY_QWEN)
    ids = jnp.asarray(np.array([[2, 4, 6]], np.int64))
    out = enc.apply(variables, ids)
    assert out.shape == (1, 3, TINY_QWEN.hidden_size)
