"""End-to-end model forward vs the numpy oracle on a tiny config."""

import jax.numpy as jnp
import numpy as np
import pytest

from gemma_tpu.compression import Type
from gemma_tpu.models.configs import (
    LayerConfig,
    Model,
    ModelConfig,
    PostNormType,
    QueryScaleType,
)
from gemma_tpu.models.gemma import (
    LayerParams,
    Params,
    embed_tokens,
    forward,
)
from gemma_tpu.models.kv_cache import KVCache
from gemma_tpu.ops.matmul import QuantTensor

from tests.oracle import OracleModel


def tiny_config(num_layers=2, use_qk_norm=False, att_cap=50.0, final_cap=30.0,
                window=None):
    model_dim, heads, kv_heads, qkv_dim, ff = 64, 4, 2, 16, 128
    lc = LayerConfig(
        model_dim=model_dim,
        ff_hidden_dim=ff,
        heads=heads,
        kv_heads=kv_heads,
        qkv_dim=qkv_dim,
        post_norm=PostNormType.SCALE,
        use_qk_norm=use_qk_norm,
    )
    c = ModelConfig(
        model=Model.GEMMA2_2B,
        model_dim=model_dim,
        vocab_size=128,
        max_seq_len=64,
        num_layers=num_layers,
        att_cap=att_cap,
        final_cap=final_cap,
        query_scale=QueryScaleType.SQRT_KEY_SIZE,
        weight=Type.F32,
    )
    c.layer_configs = [lc for _ in range(num_layers)]
    c.attention_window_sizes = [window or c.max_seq_len] * num_layers
    return c


def random_weights(config, rng):
    """Dense f32 weight dict for the oracle + matching jax Params."""
    lc = config.layer_configs[0]
    d, h, kvh, q, ff = (config.model_dim, lc.heads, lc.kv_heads, lc.qkv_dim,
                        lc.ff_hidden_dim)

    def t(*shape, sigma=0.3):
        return rng.normal(0, sigma, shape).astype(np.float32)

    w = {
        "embedding": t(config.vocab_size, d, sigma=1.0),
        "final_norm": t(d, sigma=0.1),
        "layers": [],
    }
    for _ in config.layer_configs:
        w["layers"].append(
            {
                "qkv1": t(h * q, d),
                "qkv2": t(2 * kvh * q, d),
                "att_w": t(d, h * q),
                "gating1": t(ff, d),
                "gating2": t(ff, d),
                "linear": t(d, ff),
                "pre_att_norm": t(d, sigma=0.1),
                "pre_ffw_norm": t(d, sigma=0.1),
                "post_att_norm": t(d, sigma=0.1),
                "post_ffw_norm": t(d, sigma=0.1),
                "key_norm": t(q, sigma=0.1) if lc.use_qk_norm else None,
                "query_norm": t(q, sigma=0.1) if lc.use_qk_norm else None,
            }
        )
    return w


def to_params(w, config) -> Params:
    def qt(a):
        return QuantTensor("f32", a.shape, 1.0, {"w": jnp.asarray(a)})

    layers = []
    for lw in w["layers"]:
        layers.append(
            LayerParams(
                qkv1=qt(lw["qkv1"]),
                qkv2=qt(lw["qkv2"]),
                att_w=qt(lw["att_w"]),
                gating1=qt(lw["gating1"]),
                gating2=qt(lw["gating2"]),
                linear=qt(lw["linear"]),
                pre_att_norm=jnp.asarray(lw["pre_att_norm"]),
                pre_ffw_norm=jnp.asarray(lw["pre_ffw_norm"]),
                post_att_norm=jnp.asarray(lw["post_att_norm"]),
                post_ffw_norm=jnp.asarray(lw["post_ffw_norm"]),
                key_norm=None if lw["key_norm"] is None else jnp.asarray(lw["key_norm"]),
                query_norm=None if lw["query_norm"] is None else jnp.asarray(lw["query_norm"]),
            )
        )
    return Params(embedding=qt(w["embedding"]),
                  final_norm=jnp.asarray(w["final_norm"]), layers=layers)


def run_forward(params, config, tokens, chunks):
    """Run `forward` over token chunks (prefill-style), return last logits."""
    cache = KVCache.create(config, batch=1, seq_len=config.max_seq_len,
                           dtype=jnp.float32)
    logits_all = []
    pos = 0
    for chunk in chunks:
        tk = jnp.asarray(tokens[pos : pos + chunk], jnp.int32)[None, :]
        ps = jnp.arange(pos, pos + chunk, dtype=jnp.int32)[None, :]
        logits, cache = forward(params, tk, ps, cache, config,
                                return_logits="all")
        logits_all.append(np.asarray(logits)[0])
        pos += chunk
    return np.concatenate(logits_all, axis=0)


@pytest.mark.parametrize("use_qk_norm", [False, True])
def test_forward_matches_oracle(use_qk_norm):
    rng = np.random.default_rng(0)
    config = tiny_config(use_qk_norm=use_qk_norm)
    w = random_weights(config, rng)
    params = to_params(w, config)
    tokens = rng.integers(0, config.vocab_size, 12).tolist()

    oracle = OracleModel(config, w).forward_tokens(tokens)
    got = run_forward(params, config, tokens, chunks=[len(tokens)])
    np.testing.assert_allclose(got, oracle, rtol=2e-3, atol=2e-3)


def test_chunked_prefill_equals_full():
    """KV-cache correctness: chunked prefill == one-shot (gemma.cc:188-283)."""
    rng = np.random.default_rng(1)
    config = tiny_config()
    w = random_weights(config, rng)
    params = to_params(w, config)
    tokens = rng.integers(0, config.vocab_size, 13).tolist()

    full = run_forward(params, config, tokens, chunks=[13])
    chunked = run_forward(params, config, tokens, chunks=[4, 4, 4, 1])
    np.testing.assert_allclose(chunked, full, rtol=1e-4, atol=1e-4)


def test_sliding_window():
    """Window-limited attention matches the oracle's StartPos semantics."""
    rng = np.random.default_rng(2)
    config = tiny_config(num_layers=1, window=4)
    w = random_weights(config, rng)
    params = to_params(w, config)
    tokens = rng.integers(0, config.vocab_size, 10).tolist()

    oracle = OracleModel(config, w).forward_tokens(tokens)
    got = run_forward(params, config, tokens, chunks=[10])
    np.testing.assert_allclose(got, oracle, rtol=2e-3, atol=2e-3)


def test_ring_wraparound():
    """Sequence longer than cache seq_len: ring rows are masked correctly."""
    rng = np.random.default_rng(3)
    config = tiny_config(num_layers=1, window=4)
    w = random_weights(config, rng)
    params = to_params(w, config)
    tokens = rng.integers(0, config.vocab_size, 20).tolist()

    # Cache of only 8 slots (window 4 still fits).
    cache = KVCache.create(config, batch=1, seq_len=8, dtype=jnp.float32)
    pos = 0
    outs = []
    for t in tokens:
        tk = jnp.asarray([[t]], jnp.int32)
        ps = jnp.asarray([[pos]], jnp.int32)
        logits, cache = forward(params, tk, ps, cache, config,
                                return_logits="all")
        outs.append(np.asarray(logits)[0, 0])
        pos += 1
    got = np.stack(outs)
    oracle = OracleModel(config, w).forward_tokens(tokens)
    np.testing.assert_allclose(got, oracle, rtol=2e-3, atol=2e-3)


def test_embed_scaling():
    rng = np.random.default_rng(4)
    config = tiny_config()
    w = random_weights(config, rng)
    params = to_params(w, config)
    got = np.asarray(
        embed_tokens(params.embedding, jnp.asarray([[3]]), config.model_dim)
    )[0, 0]
    want = w["embedding"][3] * np.float32(8.0)  # bf16(sqrt(64)) == 8
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_prefix_lm_bidirectional():
    """With prefix_end > 0, prefix tokens attend to the whole prefix."""
    rng = np.random.default_rng(5)
    config = tiny_config(num_layers=1)
    w = random_weights(config, rng)
    params = to_params(w, config)
    tokens = rng.integers(0, config.vocab_size, 6).tolist()
    cache = KVCache.create(config, 1, 32, dtype=jnp.float32)
    tk = jnp.asarray([tokens], jnp.int32)
    ps = jnp.arange(6, dtype=jnp.int32)[None, :]
    logits_causal, _ = forward(params, tk, ps, cache, config)
    cache2 = KVCache.create(config, 1, 32, dtype=jnp.float32)
    logits_prefix, _ = forward(params, tk, ps, cache2, config,
                               prefix_end=jnp.asarray([4]))
    # Token 0 must differ (it now sees tokens 1-3); token 5 unchanged inputs
    # except through K/V of earlier tokens (which are the same K/V values).
    assert not np.allclose(np.asarray(logits_causal)[0, 0],
                           np.asarray(logits_prefix)[0, 0])


def test_absolute_pe_skips_image_rows():
    """ADVICE r1: image rows must get NO absolute positional embedding —
    EmbedMMToken returns before AddAbsolutePositionalEmbeddings for them
    (gemma.cc:144-157).  With every slot an image row, logits must be
    identical whether absolute_pe is on or off."""
    rng = np.random.default_rng(23)
    config = tiny_config(num_layers=1)
    params = to_params(random_weights(config, rng), config)
    b, t = 1, 4
    tokens = jnp.zeros((b, t), jnp.int32)
    positions = jnp.tile(jnp.arange(t, dtype=jnp.int32), (b, 1))
    img = jnp.asarray(rng.normal(0, 0.5, (b, t, config.model_dim)),
                      jnp.float32)
    mask = jnp.ones((b, t), bool)

    def run():
        cache = KVCache.create(config, b, 32)
        logits, _ = forward(params, tokens, positions, cache, config,
                            image_embeddings=img, image_slot_mask=mask)
        return np.asarray(logits)

    config.absolute_pe = False
    base = run()
    config.absolute_pe = True
    np.testing.assert_array_equal(run(), base)
