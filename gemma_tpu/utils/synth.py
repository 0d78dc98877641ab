"""Synthetic model parameters for benchmarks, compile checks and tests.

The reference generates deterministic pseudo-random tensors for its matmul
and flash-attention tests (`GenerateMat`, ops/matmul_test.cc) and measures
GEMM/engine throughput on real weights.  On TPU we benchmark with synthetic
weights of the exact production layout (same shapes, same quantized codecs,
same HBM traffic) so `bench.py` runs without a checkpoint download.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gemma_tpu.models.configs import LayerAttentionType, ModelConfig
from gemma_tpu.models.gemma import LayerParams, Params
from gemma_tpu.ops.matmul import QuantTensor


def synth_quant(
    rng: np.random.Generator | None,
    n: int,
    k: int,
    kind: str,
    scale: float = 1.0,
) -> QuantTensor:
    """Random (or zero, if rng is None) weights in the device layout.

    Every u8 byte is a valid SFP encoding and every i8 byte a valid int8
    code, so random codes exercise the real dequant path with bounded
    magnitudes (SFP max 1.875, compression/types.h:86).
    """

    def mk(shape, dtype, hi=None):
        if rng is None:
            return jnp.zeros(shape, dtype)
        if np.issubdtype(dtype, np.integer):
            info = np.iinfo(dtype)
            return jnp.asarray(
                rng.integers(info.min, hi or info.max, shape, dtype=dtype)
            )
        return jnp.asarray(rng.normal(0, 0.05, shape).astype(dtype))

    if kind in ("bf16", "f32"):
        dt = jnp.bfloat16 if kind == "bf16" else jnp.float32
        w = mk((n, k), np.float32).astype(dt)
        arrays = {"w": w}
    elif kind in ("sfp", "nuq"):
        arrays = {"codes": mk((n, k), np.uint8)}
    elif kind == "nuq4":
        # Nibble-packed codes + lane-padded sfp-byte tables
        # (ops/matmul.py layout).
        g = -(-k // 256)
        tl = -(-(g * 16) // 128) * 128
        arrays = {
            "codes": mk((n, g * 128), np.uint8),  # 2 codes/byte
            "tables": mk((n, tl), np.uint8, hi=128),
        }
    elif kind == "i4":
        # Nibble-packed codes + per-128-group affine (ops/matmul.py).
        blocks = -(-k // 256)
        arrays = {
            "codes": mk((n, blocks * 128), np.uint8),  # 2 codes/byte
            "scales": jnp.abs(mk((n, blocks * 2), np.float32)) + 0.01,
            "mins": mk((n, blocks * 2), np.float32),
        }
    elif kind == "i8":
        g = k // 128
        arrays = {
            "codes": mk((n, k), np.int8),
            "inv_scales": jnp.abs(mk((n, g), np.float32)) + 0.01,
            "zeropoints": mk((n, g), np.float32),
        }
    else:
        raise ValueError(kind)
    return QuantTensor(kind, (n, k), scale, arrays)


def synth_params(config: ModelConfig, kind: str = "sfp",
                 seed: int | None = 0, fuse_qkv: bool = True) -> Params:
    """Full Params pytree with synthetic weights in the given codec.

    fuse_qkv mirrors load_params: the q and kv projections live as one
    row-concatenated tensor (qkv_cat) so synthetic benches measure the
    same single-GEMM layout real checkpoints load into."""
    rng = None if seed is None else np.random.default_rng(seed)
    d = config.model_dim

    def norm(n_elems: int):
        if rng is None:
            return jnp.zeros((n_elems,), jnp.float32)
        return jnp.asarray(rng.normal(0, 0.05, (n_elems,)).astype(np.float32))

    layers = []
    for i, lc in enumerate(config.layer_configs):
        if lc.type != LayerAttentionType.GEMMA:
            continue
        h, kvh, q, ff = lc.heads, lc.kv_heads, lc.qkv_dim, lc.ff_hidden_dim
        q1 = synth_quant(rng, h * q, d, kind)
        q2 = synth_quant(rng, 2 * kvh * q, d, kind)
        cat = None
        if fuse_qkv:
            from gemma_tpu.ops.matmul import concat_rows

            cat = concat_rows(q1, q2)
            if cat is not None:
                q1 = q2 = None
        layers.append(
            LayerParams(
                qkv1=q1,
                qkv2=q2,
                qkv_cat=cat,
                att_w=synth_quant(rng, d, h * q, kind),
                gating1=synth_quant(rng, ff, d, kind),
                gating2=synth_quant(rng, ff, d, kind),
                linear=synth_quant(rng, d, ff, kind),
                pre_att_norm=norm(d),
                pre_ffw_norm=norm(d),
                post_att_norm=norm(d) if lc.post_norm else None,
                post_ffw_norm=norm(d) if lc.post_norm else None,
                key_norm=norm(q) if lc.use_qk_norm else None,
                query_norm=norm(q) if lc.use_qk_norm else None,
            )
        )
    emb_kind = kind
    return Params(
        embedding=synth_quant(rng, config.vocab_size, d, emb_kind),
        final_norm=norm(d),
        layers=layers,
    )
