"""End-to-end PaliGemma: tiny on-disk model with ViT tensors -> image QA."""

import numpy as np
import pytest

from gemma_tpu.compression import Type, compress_tensor
from gemma_tpu.gemma import Gemma
from gemma_tpu.io.model_store import write_model
from gemma_tpu.models.configs import (
    LayerAttentionType,
    LayerConfig,
    Model,
    ModelConfig,
    PostNormType,
    PromptWrapping,
    QueryScaleType,
)
from gemma_tpu.paligemma.helper import PaliGemmaHelper
from gemma_tpu.paligemma.image import Image

from tests.test_tokenizer import tiny_proto

VOCAB = 274
D = 32           # LLM model_dim
VD = 24          # vit model_dim
VH, VQ, VFF = 2, 8, 48
PATCH, IMG = 4, 8  # 2x2 = 4 patches


def tiny_pali_file(tmp_path) -> str:
    rng = np.random.default_rng(0)
    lc = LayerConfig(model_dim=D, ff_hidden_dim=64, heads=2, kv_heads=1,
                     qkv_dim=16, post_norm=PostNormType.SCALE)
    config = ModelConfig(
        model=Model.PALIGEMMA2_3B_224, model_dim=D, vocab_size=VOCAB,
        max_seq_len=64, num_layers=1, att_cap=50.0, final_cap=30.0,
        query_scale=QueryScaleType.SQRT_KEY_SIZE, weight=Type.SFP,
        wrapping=PromptWrapping.PALIGEMMA, display_name="tiny-pali",
    )
    config.layer_configs = [lc]
    config.attention_window_sizes = [64]
    config.vit_config.model_dim = VD
    config.vit_config.patch_width = PATCH
    config.vit_config.image_size = IMG
    config.vit_config.seq_len = (IMG // PATCH) ** 2
    config.vit_config.pool_dim = 1
    config.vit_config.layer_configs = [
        LayerConfig(model_dim=VD, ff_hidden_dim=VFF, heads=VH, kv_heads=VH,
                    qkv_dim=VQ, ff_biases=True, type=LayerAttentionType.VIT)
    ]

    def t(name, *shape, sigma=0.3):
        return compress_tensor(Type.SFP, name,
                               rng.normal(0, sigma, shape).astype(np.float32))

    def f32(name, *shape, sigma=0.1):
        return compress_tensor(Type.F32, name,
                               rng.normal(0, sigma, shape).astype(np.float32))

    tensors = [
        t("c_embedding", VOCAB, D, sigma=1.0),
        f32("c_final_norm", 1, D),
        t("qkv1_w_0", 2 * 16, D),
        t("qkv2_w_0", 2 * 1 * 16, D),
        t("att_w_0", D, 2 * 16),
        t("gating1_w_0", 64, D),
        t("gating2_w_0", 64, D),
        t("linear_w_0", D, 64),
        f32("pre_att_ns_0", 1, D),
        f32("pre_ff_ns_0", 1, D),
        f32("post_att_ns_0", 1, D),
        f32("post_ff_ns_0", 1, D),
        # ViT globals
        t("img_emb_kernel", VD, PATCH * PATCH * 3),
        f32("img_emb_bias", 1, VD),
        f32("img_pos_emb", config.vit_config.seq_len, VD),
        f32("enc_norm_scale", 1, VD),
        f32("enc_norm_bias", 1, VD),
        t("img_head_kernel", D, VD),
        f32("img_head_bias", 1, D),
        # ViT layer 0
        t("qkv_ein_w_0", VH * 3 * VQ, VD),
        f32("qkv_ein_b_0", 1, VH * 3 * VQ),
        t("attn_out_w_0", VD, VH * VQ),
        f32("attn_out_b_0", 1, VD),
        t("linear_0_w_0", VFF, VD),
        f32("linear_0_b_0", 1, VFF),
        t("linear_1_w_0", VD, VFF),
        f32("linear_1_b_0", 1, VD),
        f32("ln_0_scale_0", 1, VD),
        f32("ln_0_bias_0", 1, VD),
        f32("ln_1_scale_0", 1, VD),
        f32("ln_1_bias_0", 1, VD),
    ]
    path = str(tmp_path / "pali.sbs")
    write_model(path, config, tensors, tokenizer_proto=tiny_proto())
    return path


def test_paligemma_image_qa(tmp_path):
    rng = np.random.default_rng(1)
    g = Gemma.load(tiny_pali_file(tmp_path))
    g.runtime.seq_len = 64
    g.runtime.prefill_tbatch_size = 16
    assert g.params.vit is not None
    assert len(g.params.vit.layers) == 1

    helper = PaliGemmaHelper(g)
    image = Image.from_array(rng.integers(0, 256, (11, 13, 3)))
    tokens = helper.image_tokens(image)
    assert tokens.shape == (4, D)

    text = helper.query(image, "hello", max_generated_tokens=4)
    assert isinstance(text, str)


def test_prefix_spanning_chunks(tmp_path):
    """Prefix-LM prompts longer than prefill_tbatch must still see the
    whole prefix (the engine widens the chunk; gemma.cc:199-206)."""
    rng = np.random.default_rng(2)
    g = Gemma.load(tiny_pali_file(tmp_path))
    g.runtime.seq_len = 64
    prompt = [0] * 4 + [2] + list(rng.integers(5, 100, 25))  # 30 tokens
    prefix_end = len(prompt)
    img_emb = rng.normal(0, 0.3, (4, D)).astype(np.float32)

    def run(tbatch):
        g.runtime.prefill_tbatch_size = tbatch
        g.engine._prefill_fns.clear()
        return g.generate(prompt, max_generated_tokens=4,
                          prefix_end=prefix_end, image_embeddings=img_emb)

    want = run(len(prompt))  # single chunk covers the prefix
    got = run(8)             # would split the prefix without the fix
    assert got == want


def tiny_vlm_file(tmp_path) -> str:
    """Gemma3-VLM-style: pool_dim 4 (16 patches -> 1 image token),
    <start_of_image> wrapping with -2 placeholders."""
    rng = np.random.default_rng(3)
    lc = LayerConfig(model_dim=D, ff_hidden_dim=64, heads=2, kv_heads=1,
                     qkv_dim=16, post_norm=PostNormType.SCALE,
                     use_qk_norm=True)
    config = ModelConfig(
        model=Model.GEMMA3_4B, model_dim=D, vocab_size=VOCAB,
        max_seq_len=64, num_layers=1, att_cap=0.0, final_cap=0.0,
        query_scale=QueryScaleType.SQRT_KEY_SIZE, weight=Type.SFP,
        wrapping=PromptWrapping.GEMMA_VLM, display_name="tiny-vlm",
    )
    config.layer_configs = [lc]
    config.attention_window_sizes = [64]
    config.vit_config.model_dim = VD
    config.vit_config.patch_width = PATCH
    config.vit_config.image_size = 16          # 4x4 = 16 patches
    config.vit_config.seq_len = 16
    config.vit_config.pool_dim = 4             # AvgPool4x4 -> 1 token
    config.vit_config.layer_configs = [
        LayerConfig(model_dim=VD, ff_hidden_dim=VFF, heads=VH, kv_heads=VH,
                    qkv_dim=VQ, ff_biases=True, type=LayerAttentionType.VIT)
    ]

    def t(name, *shape, sigma=0.3):
        return compress_tensor(Type.SFP, name,
                               rng.normal(0, sigma, shape).astype(np.float32))

    def f32(name, *shape, sigma=0.1):
        return compress_tensor(Type.F32, name,
                               rng.normal(0, sigma, shape).astype(np.float32))

    tensors = [
        t("c_embedding", VOCAB, D, sigma=1.0),
        f32("c_final_norm", 1, D),
        t("qkv1_w_0", 2 * 16, D),
        t("qkv2_w_0", 2 * 1 * 16, D),
        t("att_w_0", D, 2 * 16),
        t("gating1_w_0", 64, D),
        t("gating2_w_0", 64, D),
        t("linear_w_0", D, 64),
        f32("pre_att_ns_0", 1, D),
        f32("pre_ff_ns_0", 1, D),
        f32("post_att_ns_0", 1, D),
        f32("post_ff_ns_0", 1, D),
        f32("key_norm_0", 1, 16),
        f32("query_norm_0", 1, 16),
        t("img_emb_kernel", VD, PATCH * PATCH * 3),
        f32("img_emb_bias", 1, VD),
        f32("img_pos_emb", 16, VD),
        f32("enc_norm_scale", 1, VD),
        f32("enc_norm_bias", 1, VD),
        f32("mm_embed_norm", 1, VD),
        t("img_head_kernel", D, VD),
        f32("img_head_bias", 1, D),
        t("qkv_ein_w_0", VH * 3 * VQ, VD),
        f32("qkv_ein_b_0", 1, VH * 3 * VQ),
        t("attn_out_w_0", VD, VH * VQ),
        f32("attn_out_b_0", 1, VD),
        t("linear_0_w_0", VFF, VD),
        f32("linear_0_b_0", 1, VFF),
        t("linear_1_w_0", VD, VFF),
        f32("linear_1_b_0", 1, VD),
        f32("ln_0_scale_0", 1, VD),
        f32("ln_0_bias_0", 1, VD),
        f32("ln_1_scale_0", 1, VD),
        f32("ln_1_bias_0", 1, VD),
    ]
    path = str(tmp_path / "vlm.sbs")
    write_model(path, config, tensors, tokenizer_proto=tiny_proto())
    return path


def test_gemma3_vlm_image_qa(tmp_path):
    rng = np.random.default_rng(4)
    g = Gemma.load(tiny_vlm_file(tmp_path))
    g.runtime.seq_len = 64
    g.runtime.prefill_tbatch_size = 16
    assert g.params.vit is not None
    assert g.params.vit.mm_embed_norm is not None

    helper = PaliGemmaHelper(g)
    image = Image.from_array(rng.integers(0, 256, (16, 16, 3)))
    tokens = helper.image_tokens(image)
    assert tokens.shape == (1, D)  # AvgPool4x4: 16 patches -> 1 token

    # VLM wrapping: -2 placeholders in the prompt get image rows.
    from gemma_tpu.models.tokenizer import wrap_and_tokenize

    ids = wrap_and_tokenize(g.tokenizer, g.chat_template, g.config.wrapping,
                            0, "hello", image_batch_size=1)
    assert ids.count(-2) == 1
    text = helper.query(image, "hello", max_generated_tokens=3)
    assert isinstance(text, str)
