"""Model store + config serialization tests (mirrors configs_test.cc)."""

import numpy as np

from gemma_tpu.compression import Type, compress_tensor
from gemma_tpu.io.blob_store import BlobReader
from gemma_tpu.io.fields import read_fields, write_fields
from gemma_tpu.io.model_store import ModelStore, write_model
from gemma_tpu.models.configs import (
    CONFIG_FACTORY,
    Model,
    ModelConfig,
    PromptWrapping,
    config_from_model,
    config_gemma2_2b,
)
from gemma_tpu.models.tensor_info import TensorInfoRegistry


def test_config_roundtrip_all_models():
    for model, factory in CONFIG_FACTORY.items():
        config = factory()
        config.weight = Type.SFP
        span = write_fields(config)
        out = ModelConfig()
        result = read_fields(out, span)
        assert result.pos == len(span), model
        assert out.model == config.model
        assert out.model_dim == config.model_dim
        assert out.num_layers == config.num_layers == len(out.layer_configs)
        assert out.attention_window_sizes == config.attention_window_sizes
        assert out.att_cap == config.att_cap
        assert out.eos_id == config.eos_id
        assert out.secondary_eos_id == config.secondary_eos_id
        assert len(out.vit_config.layer_configs) == len(
            config.vit_config.layer_configs
        )
        assert out.scale_base_names == config.scale_base_names
        lc, lc_out = config.layer_configs[0], out.layer_configs[0]
        for attr in ("model_dim", "ff_hidden_dim", "heads", "kv_heads",
                     "qkv_dim", "optimized_gating", "post_norm", "use_qk_norm"):
            assert getattr(lc_out, attr) == getattr(lc, attr), (model, attr)


def test_canonical_dims():
    """Spot-check canonical tables against configs.cc."""
    c = config_gemma2_2b()
    assert (c.model_dim, c.num_layers, c.vocab_size) == (2304, 26, 256000)
    lc = c.layer_configs[0]
    assert (lc.heads, lc.kv_heads, lc.qkv_dim, lc.ff_hidden_dim) == (8, 4, 256, 9216)
    assert c.attention_window_sizes[:2] == [4096, 8192]
    assert c.att_cap == 50.0 and c.final_cap == 30.0

    c27 = config_from_model(Model.GEMMA2_27B)
    assert c27.query_scale_value() == 1.0 / np.sqrt(4608 / 32)

    g3 = config_from_model(Model.GEMMA3_27B)
    assert g3.num_layers == 62
    assert g3.attention_window_sizes[:6] == [1024] * 5 + [32 * 1024]
    assert g3.layer_configs[0].use_qk_norm
    assert g3.vit_config.pool_dim == 4 and g3.vit_config.image_size == 896


def test_specifier():
    c = config_from_model(Model.GEMMA2_2B, Type.SFP, PromptWrapping.GEMMA_IT)
    assert c.specifier() == "gemma2-2b-sfp-it"
    g3 = config_from_model(Model.GEMMA3_4B, Type.NUQ)
    assert g3.specifier() == "gemma3-4b-nuq"


def test_tensor_registry_shapes():
    c = config_gemma2_2b()
    reg = TensorInfoRegistry(c)
    assert reg.find("c_embedding").extents == (256000, 2304)
    assert reg.find("qkv1_w_0").extents == (8 * 256, 2304)
    assert reg.find("qkv2_w_0").extents == (2 * 4 * 256, 2304)
    assert reg.find("gating_ein_25").extents == (2 * 9216, 2304)
    assert reg.find("linear_w_0").extents == (2304, 9216)
    assert reg.find("att_ein_0").extents == (8 * 2304, 256)
    assert reg.find("att_w_0").extents == (2304, 8 * 256)
    assert reg.find("pre_att_ns_0").extents == (1, 2304)
    assert reg.find("c_final_norm").extents == (1, 2304)
    assert reg.find("nonexistent") is None


def test_write_read_model(tmp_path):
    """Round-trip a tiny synthetic model through the single-file format."""
    rng = np.random.default_rng(0)
    config = config_gemma2_2b()
    config.weight = Type.SFP
    tensors = [
        compress_tensor(Type.SFP, "qkv1_w_0", rng.normal(0, 0.5, (64, 128))),
        compress_tensor(Type.BF16, "pre_att_ns_0", rng.normal(0, 0.5, (1, 128))),
        compress_tensor(Type.NUQ, "linear_w_0", rng.normal(0, 0.5, (16, 256))),
        compress_tensor(Type.I8, "gating1_w_0", rng.normal(0, 0.5, (16, 256))),
    ]
    originals = {t.name: t.to_f32().copy() for t in tensors}
    path = str(tmp_path / "model.sbs")
    write_model(path, config, tensors, tokenizer_proto=b"fake_proto")

    with BlobReader(path) as reader:
        store = ModelStore(reader)
        assert store.config.model == Model.GEMMA2_2B
        assert store.config.weight == Type.SFP
        assert store.tokenizer_bytes() == b"fake_proto"
        assert set(store.tensors) == {t.name for t in tensors}
        for t in tensors:
            got = store.read_tensor(t.name)
            assert got.type == t.type
            assert got.shape == t.shape
            assert got.scale == t.scale
            np.testing.assert_array_equal(got.to_f32(), originals[t.name])


def test_scaled_tensor_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    config = config_gemma2_2b()
    config.weight = Type.SFP
    big = rng.normal(0, 3.0, (32, 64)).astype(np.float32)
    t = compress_tensor(Type.SFP, "att_ein_0", big)
    assert t.scale > 1.0
    path = str(tmp_path / "scaled.sbs")
    write_model(path, config, [t])
    with BlobReader(path) as reader:
        store = ModelStore(reader)
        got = store.read_tensor("att_ein_0")
        rel = np.abs(got.to_f32() - big) / (np.abs(big) + 1e-2)
        assert np.median(rel) < 0.05
